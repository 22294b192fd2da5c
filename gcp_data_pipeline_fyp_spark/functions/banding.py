"""Derived-measure and banding expressions (reference P8-P10, P17).

- `null_fallback_adjust`: VL_n_depth / VL_n_mag arithmetic that does
  NOT propagate nulls the SQL way: `a + factor*b` only when BOTH are
  non-null, else `a` (`Full Load Scripts/ods_full_load2.py:75-76`).
  Deliberately not a bare `+`.
- `depth_band`: <=70 Shallow, (70,300] Intermediate, >300 Deep, NULL
  stays NULL (`ods_full_load2.py:79-86`).
- `mag_band`: 7 bands on [-inf,3),[3,4),[4,5),[5,6),[6,7),[7,8),[8,inf)
  (`ods_full_load2.py:88-103`).
- `*_description`: static category->text maps
  (`Full Load Scripts/dw_full_load2.py:59-75`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def null_fallback_adjust(base: Column | str, err: Column | str, factor: float = 0.5) -> Column:
    b, e = _c(base), _c(err)
    return F.when(b.isNotNull() & e.isNotNull(), b + F.lit(factor) * e).otherwise(b)


def depth_band(depth: Column | str) -> Column:
    d = _c(depth)
    return (
        F.when(d.isNull(), F.lit(None).cast("string"))
        .when(d <= 70, "Shallow")
        .when(d <= 300, "Intermediate")
        .otherwise("Deep")
    )


# exact reference texts (dw_full_load2.py:59-64); unknown/NULL categories
# fall back to the reference's f-string (Python renders None as 'None')
DEPTH_BAND_DESCRIPTIONS = {
    "Shallow": "less than 70km",
    "Intermediate": "between 70km and 300km",
    "Deep": "more than 300km",
}


def depth_band_description(cat: Column | str) -> Column:
    c = _c(cat)
    out = F.when(F.lit(False), F.lit(None).cast("string"))
    for k, v in DEPTH_BAND_DESCRIPTIONS.items():
        out = out.when(c == k, v)
    return out.otherwise(
        F.concat(F.lit("Depth category: "), F.coalesce(c, F.lit("None")))
    )


def mag_band(mag: Column | str) -> Column:
    m = _c(mag)
    return (
        F.when(m.isNull(), F.lit(None).cast("string"))
        .when(m < 3, "Not Felt")
        .when(m < 4, "Minor")
        .when(m < 5, "Light")
        .when(m < 6, "Moderate")
        .when(m < 7, "Strong")
        .when(m < 8, "Major")
        .otherwise("Great")
    )


# exact reference texts (dw_full_load2.py:66-75)
MAG_BAND_DESCRIPTIONS = {
    "Not Felt": "<3",
    "Minor": "3 <=mag < 4",
    "Light": "4 <=mag < 5",
    "Moderate": "5 <=mag < 6",
    "Strong": "6 <= mag < 7",
    "Major": "7 <=mag < 8",
    "Great": "8 <= mag",
}


def mag_band_description(cat: Column | str) -> Column:
    c = _c(cat)
    out = F.when(F.lit(False), F.lit(None).cast("string"))
    for k, v in MAG_BAND_DESCRIPTIONS.items():
        out = out.when(c == k, v)
    return out.otherwise(
        F.concat(F.lit("Magnitude category: "), F.coalesce(c, F.lit("None")))
    )
