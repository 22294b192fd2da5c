"""DW delta-load stage (reference dw2_delta_load2.py, the most complex job).

Per dimension: snapshot MAX(id) (A4) -> distinct new values anti-joined
against the existing dim (J4) -> enumerate from max+1 (A3 offset) ->
append (S8) -> union existing∪new as the fact's lookup (A5). Fact rows
are enriched (P18/J5) into a transient staging frame, then MERGE-upserted
into T_FACT_Events by ID_Event (J6) — the reference's staging table +
post-pipeline MERGE + drop (`dw2_delta_load2.py:75-84,398-404`).

The MERGE is partition-scoped: the fact is stored hive-partitioned by
month (plans/dw.py FACT_PARTITION_COL), the base side is pruned to the
months present in the delta (broadcast semi join -> dynamic partition
pruning at the scan), and only those months are rewritten via a staged
write + per-partition-directory swap. A daily delta against a 100 TB
fact therefore shuffles and rewrites 1-2 monthly partitions, never the
full table. Safe because ID_Event hashes (time, lat, lon): a merge key
can never move between month partitions.
"""

from __future__ import annotations

import datetime as _dt

from pyspark import StorageLevel
from pyspark.sql import DataFrame

from gcp_data_pipeline_fyp_spark.functions.cleaning import audit_columns
from gcp_data_pipeline_fyp_spark.operators.keys import incremental_surrogate_keys
from gcp_data_pipeline_fyp_spark.operators.merge import merge_upsert_partitioned
from gcp_data_pipeline_fyp_spark.plans.dw import (
    DIM_SPECS,
    FACT_PARTITION_COL,
    _finalize_dim,
    build_date_dim,
    enrich_fact,
    with_fact_partition,
)
from gcp_data_pipeline_fyp_spark.sources.tables import Warehouse

_DIM_NATURAL_RENAMES = {
    "T_DIM_Network": {"LB_NetworkSymbol": "LB_net"},
    "T_DIM_magCategory": {"LB_magCategoryName": "LB_magCategory"},
    "T_DIM_depthCategory": {"LB_depthCategoryName": "LB_depthCategory"},
}


def stage_dw_delta(
    new_ods: DataFrame,
    wh: Warehouse,
    job_id: str,
    data_source: str,
    run_ts: _dt.datetime,
    clamp_writes: bool = False,
) -> dict[str, DataFrame]:
    from concurrent.futures import ThreadPoolExecutor

    ods = new_ods.persist(StorageLevel.MEMORY_AND_DISK)
    # populate the cache before the concurrent dim updates fan out
    ods.count()
    audit = audit_columns(job_id, data_source, run_ts)

    def _update_dim(table: str) -> tuple[str, DataFrame]:
        if table == "T_DIM_date":
            # date dim: append only dates not already present
            new_dates = build_date_dim(ods)
            existing_dates = wh.read("T_DIM_date").select("ID_date_ID")
            wh.append(
                new_dates.join(existing_dates, "ID_date_ID", "left_anti"),
                "T_DIM_date",
            )
            return table, wh.read("T_DIM_date")
        nat_keys, id_col = DIM_SPECS[table]
        existing = wh.read(table)
        for dw_name, ods_name in _DIM_NATURAL_RENAMES.get(table, {}).items():
            existing = existing.withColumnRenamed(dw_name, ods_name)
        existing = existing.select(id_col, *nat_keys)
        new_rows, _full = incremental_surrogate_keys(ods, existing, nat_keys, id_col)
        wh.append(_finalize_dim(table, new_rows), table)
        return table, wh.read(table)

    # each dim's snapshot->anti-join->append chain touches only its own
    # table; run the 6 chains as concurrent Spark jobs (driver threads)
    tables = [*DIM_SPECS, "T_DIM_date"]
    with ThreadPoolExecutor(max_workers=len(tables)) as pool:
        dims = dict(pool.map(_update_dim, tables))

    staged_fact = with_fact_partition(
        enrich_fact(ods, dims).withColumns(
            {
                "_DT_insertion_date": audit["_DT_insertion_date"],
                "_LB_job_execution_id": audit["_LB_job_execution_id"],
            }
        )
    )
    base_fact = wh.read("T_FACT_Events")
    if set(base_fact.columns) != set(staged_fact.columns):
        raise ValueError(
            "T_FACT_Events schema drift: warehouse has "
            f"{sorted(set(base_fact.columns) - set(staged_fact.columns))} extra / "
            f"{sorted(set(staged_fact.columns) - set(base_fact.columns))} missing "
            "vs this engine version — migrate the fact table (full reload or "
            "column migration) before delta-loading"
        )
    # partition-scoped MERGE: only the month partitions present in the
    # delta are joined and rewritten; the base scan prunes the rest.
    merged = merge_upsert_partitioned(
        base_fact, staged_fact.select(*base_fact.columns), ["ID_Event"], FACT_PARTITION_COL
    )
    # clamp_writes (guide §6, plans/pipeline.py): the merge output's
    # partition count otherwise inherits spark.sql.shuffle.partitions
    # (cores-sized) — rebalance by the partition column so the staged
    # months land data-sized files
    if clamp_writes:
        merged = merged.hint("rebalance", FACT_PARTITION_COL)
    # parquet has no in-place MERGE: land the affected partitions in a
    # staging table first (the reference's staging-table lifecycle, S12),
    # then promote each partition directory by rename — untouched
    # partitions' files are never read, shuffled, or rewritten.
    wh.overwrite(merged, "T_FACT_Events_staging", partition_cols=[FACT_PARTITION_COL])
    wh.swap_partitions("T_FACT_Events_staging", "T_FACT_Events", FACT_PARTITION_COL)
    ods.unpersist()
    out = dict(dims)
    out["T_FACT_Events"] = wh.read("T_FACT_Events")
    return out
