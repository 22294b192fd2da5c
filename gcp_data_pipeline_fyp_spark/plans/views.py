"""Analytical view layer (reference E3 view indirection).

The DAX measures read `V_`-prefixed views over the `T_`-prefixed
tables (`DAX Measures Used.txt:5,11` — V_FACT_Event,
V_DIM_Seismic_Activity_Type). Spark rendering: temp views registered
over the warehouse parquet tables, so the measures are equally
answerable via `spark.sql` with the reference's own view names.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

VIEW_MAP = {
    "V_FACT_Event": "T_FACT_Events",
    "V_DIM_Network": "T_DIM_Network",
    "V_DIM_RegionCountry": "T_DIM_RegionCountry",
    "V_DIM_Seismic_Activity_Type": "T_DIM_Seismic_Activity_Type",
    "V_DIM_magCategory": "T_DIM_magCategory",
    "V_DIM_depthCategory": "T_DIM_depthCategory",
    "V_DIM_date": "T_DIM_date",
}


def register_views(spark: SparkSession, wh: Warehouse) -> list[str]:
    """Create the V_* temp views over existing warehouse tables."""
    created = []
    for view, table in VIEW_MAP.items():
        if wh.exists(table):
            wh.read(table).createOrReplaceTempView(view)
            created.append(view)
    return created
