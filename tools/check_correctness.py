#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs every `queries()` entry on Spark and its `oracle_sql()` in DuckDB
over the same parquet tables, then compares row count, column names,
and order-insensitive values (rows sorted by all columns; floats
compared exactly after normalization — queries are expected to be
written deterministic, see queries_util.py).

Usage: [SF_DIR=/root/testdata/sf0.01] python3 tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif s.dtype == object:
            df[c] = s.map(_norm_cell)
        elif pd.api.types.is_float_dtype(s):
            # astype(object) first: .map on a float64 Series coerces the
            # returned None back to NaN, and NaN != NaN breaks compare
            df[c] = s.astype(object).map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else round(float(v), 9)
            )
        else:
            df[c] = s.astype(object).where(pd.notna(s), None)
    # column assignment can silently coerce back to float64 (NaN for
    # None) — force the whole frame to object and NaN -> None at the end
    df = df.astype(object)
    df = df.where(pd.notna(df), None)
    return df.sort_values(by=list(df.columns), key=lambda col: col.map(repr)).reset_index(drop=True)


def _norm_cell(v):
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_norm_cell(x) for x in v)
    return v


def render_risks(name: str, sdf: pd.DataFrame) -> list[str]:
    """Flag raw doubles the JVM renders in scientific notation.

    The driver hashes engine-native value rendering; Java's
    Double.toString switches to scientific notation for nonzero
    |v| < 1e-3 or >= 1e7 ("5.0E-4") where DuckDB prints "0.0005" —
    so a query can be value-exact here and still hash-red at the
    driver (star_schema_fact was red two rounds this way). Any float
    column containing such a value must be emitted as decimal instead.
    """
    out = []
    for c in sdf.columns:
        s = sdf[c]
        if not pd.api.types.is_float_dtype(s):
            continue
        vals = s.dropna().abs()
        risky = vals[(vals > 0) & ((vals < 1e-3) | (vals >= 1e7))]
        if len(risky):
            out.append(
                f"[RENDER-RISK] {name}.{c}: {len(risky)} double value(s) in JVM "
                f"scientific-notation range (e.g. {risky.iloc[0]!r}) — emit as decimal"
            )
    return out


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
    scols = sorted(c.lower() for c in sdf.columns)
    ocols = sorted(c.lower() for c in odf.columns)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
        return problems
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        neq = (s.values != o.values)
        if neq.any():
            idx = list(zip(*neq.nonzero()))[:5]
            for r, c in idx:
                problems.append(
                    f"value mismatch at row {r} col {s.columns[c]}: "
                    f"spark={s.iat[r, c]!r} oracle={o.iat[r, c]!r}"
                )
    return problems


def main() -> int:
    import __spark_entry__ as entry_mod
    from gcp_data_pipeline_fyp_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    ok = fail = skipped = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark query raised")
            traceback.print_exc(limit=4)
            fail += 1
            continue
        warns = render_risks(name, sdf)
        for w in warns:
            print(w)
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            skipped += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception:
            print(f"[FAIL] {name}: oracle SQL raised")
            traceback.print_exc(limit=2)
            fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"[FAIL] {name}:")
            for p in problems:
                print(f"    {p}")
            fail += 1
        else:
            print(f"[OK] {name} ({len(sdf)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
