"""DW full-load stage: T_ODS -> 6 dims + fact (reference dw_full_load2.py).

The reference reads ODS once and fans out to 7 sinks
(`dw_full_load2.py:97-238`); Beam shares the PCollection, Spark must
persist — the ODS frame is cached across the 7 actions. Surrogate keys
are dense `row_number` ids over the tiny post-distinct dim values
(operators/keys.py); fact enrichment is 5 broadcast left joins (J5) —
never a shuffle of the fact side — plus the derived yyyymmdd date FK.

Category-default quirk preserved: the fact's lookup key coalesces a
NULL band to 'Shallow' / 'Not Felt' (`dw_full_load2.py:195-218`), while
the dims themselves are built from raw distinct values.
"""

from __future__ import annotations

import datetime as _dt

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.functions.banding import (
    depth_band_description,
    mag_band_description,
)
from gcp_data_pipeline_fyp_spark.functions.cleaning import audit_columns
from gcp_data_pipeline_fyp_spark.functions.timeops import date_dim_columns
from gcp_data_pipeline_fyp_spark.operators.keys import assign_surrogate_keys
from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

# T_FACT_Events is stored hive-partitioned by month (ID_date_ID div 100,
# i.e. yyyymm). At 100 TB this gives date-scoped queries partition
# pruning at the scan and lets the delta MERGE rewrite only the months
# present in the delta instead of the whole fact. Monthly granularity
# caps the partition count (12/year) while a daily delta touches 1-2.
FACT_PARTITION_COL = "_PT_month"


def with_fact_partition(fact: DataFrame) -> DataFrame:
    """Derive the storage-partition column from the date FK.

    Valid because ID_Event is a content hash of (time, lat, lon) — an
    event's date, hence its month partition, can never change across
    loads, so a MERGE by ID_Event is always partition-local.
    """
    return fact.withColumn(FACT_PARTITION_COL, F.expr("ID_date_ID div 100").cast("int"))


DIM_SPECS = {
    # table -> (natural keys in ODS, surrogate id column)
    "T_DIM_Network": (["LB_net"], "ID_Network_ID"),
    "T_DIM_RegionCountry": (["LB_Region", "LB_Country"], "ID_RegionCountry_ID"),
    "T_DIM_Seismic_Activity_Type": (["LB_type"], "ID_type_ID"),
    "T_DIM_magCategory": (["LB_magCategory"], "ID_magCategory_ID"),
    "T_DIM_depthCategory": (["LB_depthCategory"], "ID_depthCategory_ID"),
}


def _finalize_dim(table: str, dim: DataFrame) -> DataFrame:
    """Rename natural keys to their DW names + add static descriptions (P17)."""
    if table == "T_DIM_Network":
        return dim.withColumnRenamed("LB_net", "LB_NetworkSymbol")
    if table == "T_DIM_magCategory":
        return dim.select(
            "ID_magCategory_ID",
            F.col("LB_magCategory").alias("LB_magCategoryName"),
            mag_band_description("LB_magCategory").alias("LB_magCategoryDescription"),
        )
    if table == "T_DIM_depthCategory":
        return dim.select(
            "ID_depthCategory_ID",
            F.col("LB_depthCategory").alias("LB_depthCategoryName"),
            depth_band_description("LB_depthCategory").alias(
                "LB_depthCategoryDescription"
            ),
        )
    return dim


def build_date_dim(ods: DataFrame, time_col: str = "DT_time") -> DataFrame:
    dates = ods.select(F.col(time_col).cast("date").alias("d")).distinct()
    cols = date_dim_columns("d")
    return dates.select(*[expr.alias(name) for name, expr in cols.items()]).where(
        F.col("ID_date_ID").isNotNull()
    )


def enrich_fact(ods: DataFrame, dims: dict[str, DataFrame]) -> DataFrame:
    """ODS + 5 broadcast dim joins + derived date FK -> fact rows (P18/J5)."""
    f = ods.withColumn(
        "__magCat_key", F.coalesce(F.col("LB_magCategory"), F.lit("Not Felt"))
    ).withColumn(
        "__depthCat_key", F.coalesce(F.col("LB_depthCategory"), F.lit("Shallow"))
    )
    net = dims["T_DIM_Network"].select(
        "ID_Network_ID", F.col("LB_NetworkSymbol").alias("__k_net")
    )
    f = f.join(F.broadcast(net), F.col("LB_net").eqNullSafe(F.col("__k_net")), "left")
    rc = dims["T_DIM_RegionCountry"].select(
        "ID_RegionCountry_ID",
        F.col("LB_Region").alias("__k_region"),
        F.col("LB_Country").alias("__k_country"),
    )
    f = f.join(
        F.broadcast(rc),
        F.col("LB_Region").eqNullSafe(F.col("__k_region"))
        & F.col("LB_Country").eqNullSafe(F.col("__k_country")),
        "left",
    )
    typ = dims["T_DIM_Seismic_Activity_Type"].select(
        "ID_type_ID", F.col("LB_type").alias("__k_type")
    )
    f = f.join(F.broadcast(typ), F.col("LB_type").eqNullSafe(F.col("__k_type")), "left")
    mc = dims["T_DIM_magCategory"].select(
        "ID_magCategory_ID", F.col("LB_magCategoryName").alias("__k_mag")
    )
    f = f.join(F.broadcast(mc), F.col("__magCat_key") == F.col("__k_mag"), "left")
    dc = dims["T_DIM_depthCategory"].select(
        "ID_depthCategory_ID", F.col("LB_depthCategoryName").alias("__k_depth")
    )
    f = f.join(F.broadcast(dc), F.col("__depthCat_key") == F.col("__k_depth"), "left")
    # fact column set mirrors dw_full_load2.py:195-218: degenerate
    # dimension LB_place rides the fact; LB_status does NOT
    return f.select(
        "ID_Event",
        "ID_Network_ID",
        "ID_RegionCountry_ID",
        "ID_type_ID",
        "ID_magCategory_ID",
        "ID_depthCategory_ID",
        F.date_format(F.col("DT_time").cast("date"), "yyyyMMdd")
        .cast("int")
        .alias("ID_date_ID"),
        "VL_n_mag",
        "VL_n_depth",
        "LB_place",
        "DT_time",
        "VL_latitude",
        "VL_longitude",
        "ID_nst",
        "ID_gap",
        "VL_dmin",
        "VL_horizontalError",
        "ID_magNst",
        "_DT_insertion_date",
        "_DT_updated_date",
        "_LB_job_execution_id",
        "_LB_data_source",
    )


def stage_dw_full(
    t_ods: DataFrame,
    wh: Warehouse,
    job_id: str,
    data_source: str,
    run_ts: _dt.datetime,
    clamp_writes: bool = False,
) -> dict[str, DataFrame]:
    from concurrent.futures import ThreadPoolExecutor

    ods = t_ods.persist(StorageLevel.MEMORY_AND_DISK)
    # populate the cache before fanning out: concurrent dim jobs would
    # otherwise race to compute the same partitions
    ods.count()
    audit = audit_columns(job_id, data_source, run_ts)

    def _build(table: str) -> tuple[str, DataFrame]:
        if table == "T_DIM_date":
            dim = build_date_dim(ods)
        else:
            nat_keys, id_col = DIM_SPECS[table]
            dim = _finalize_dim(table, assign_surrogate_keys(ods, nat_keys, id_col))
        wh.overwrite(dim, table)
        return table, wh.read(table)

    # the 6 dim builds touch disjoint tables and read only the cached
    # ODS frame — submit them as concurrent Spark jobs (driver-side
    # threads; the standard fan-out for many small independent sinks,
    # where each job alone underutilizes the cluster)
    tables = [*DIM_SPECS, "T_DIM_date"]
    with ThreadPoolExecutor(max_workers=len(tables)) as pool:
        dims = dict(pool.map(_build, tables))
    fact = with_fact_partition(
        enrich_fact(ods, dims).withColumns(
            {
                "_DT_insertion_date": audit["_DT_insertion_date"],
                "_LB_job_execution_id": audit["_LB_job_execution_id"],
            }
        )
    )
    # clamp_writes (guide §6, plans/pipeline.py): without it the fact's
    # partitionBy(month) write lands one file per CACHED-ODS partition
    # per month (cores-sized); rebalancing by the partition column
    # gives data-sized files per month directory at any scale
    if clamp_writes:
        fact = fact.hint("rebalance", FACT_PARTITION_COL)
    wh.overwrite(fact, "T_FACT_Events", partition_cols=[FACT_PARTITION_COL])
    ods.unpersist()
    out = dict(dims)
    out["T_FACT_Events"] = wh.read("T_FACT_Events")
    return out
