"""Geo stage: ODS place -> Region/Country (reference parse_country_ods_*_load2.py).

Full mode rewrites T_ODS wholesale; delta mode parses only rows not yet
in T_ODS (anti-join J3) and appends. The states lookup rides a
broadcast join (J1) — the fact-sized side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gcp_data_pipeline_fyp_spark.functions.geo import build_states_lookup, parse_place
from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse


def stage_geo(
    ods: DataFrame,
    states: DataFrame,
    wh: Warehouse,
    mode: str,
    table: str = "T_ODS_earthquake",
    clamp_writes: bool = False,
) -> DataFrame:
    lookup = build_states_lookup(states)
    parsed = parse_place(ods.drop("LB_Region", "LB_Country"), lookup)
    # restore the reference's ODS column order (Region/Country live
    # mid-row, ods_full_load2.py:116-117)
    cols = ods.columns
    parsed = parsed.select(*cols)
    # clamp_writes: REBALANCE on small inputs so the table's file count
    # follows data size, not the per-core split count (plans/pipeline.py)
    if mode == "full" or not wh.exists(table):
        wh.overwrite(
            parsed.hint("rebalance") if clamp_writes else parsed, table
        )
    else:
        existing_ids = wh.read(table).select("ID_Event")
        fresh = parsed.join(existing_ids, "ID_Event", "left_anti")
        wh.append(fresh.hint("rebalance") if clamp_writes else fresh, table)
    return wh.read(table)
