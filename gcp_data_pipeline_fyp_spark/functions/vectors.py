"""Vector-similarity column builders (embedding columns, ANN support).

Native array-lambda expressions — `zip_with` + `aggregate` compile to
codegen'd loops over the array, no Python in the hot path. Folds run
in index order, so double results are bit-identical across engines
(DuckDB's list functions fold the same way); a final `round` makes the
hash-compare immune to any residual last-bit noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double_vec(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is 0 (try_divide)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def scale(a: Column, s: Column | float) -> Column:
    sc = F.lit(s) if isinstance(s, (int, float)) else s
    return F.transform(a, lambda x: x * sc)


def add(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


try:  # Arrow-vectorized fast path for the O(pairs) hot loop
    import numpy as _np
    import pandas as _pd
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    @_pandas_udf("double")
    def dot_vectorized(a: _pd.Series, b: _pd.Series) -> _pd.Series:
        """Row-wise dot product over two array<double> columns, numpy-batched.

        Spark's higher-order `aggregate`/`zip_with` are CodegenFallback
        (interpreted per element) — for a pair stage doing tens of
        millions of multiply-adds that interpretation dominates the
        query. One Arrow batch -> one einsum is ~20x faster. Summation
        order differs from the sequential fold by ~1e-15 relative,
        which the callers' round(·, 6) absorbs.
        """
        av, bv = a.to_numpy(), b.to_numpy()
        # NULL vectors (e.g. zero-norm inputs nulled by _unit) must yield
        # NULL, matching the native fold's semantics — np.stack would
        # crash on None entries
        mask = _np.array([x is None for x in av]) | _np.array(
            [x is None for x in bv]
        )
        if mask.any():
            out = _np.full(len(av), _np.nan)
            if (~mask).any():
                am = _np.stack(av[~mask])
                bm = _np.stack(bv[~mask])
                out[~mask] = _np.einsum("ij,ij->i", am, bm)
            return _pd.Series(out)
        am = _np.stack(av)
        bm = _np.stack(bv)
        return _pd.Series(_np.einsum("ij,ij->i", am, bm))

    @_pandas_udf("long")
    def dot_int_vectorized(a: _pd.Series, b: _pd.Series) -> _pd.Series:
        """Row-wise int64 dot product over two array<int> code columns
        (the SQ8 pair stage). Integer sums are exact in any order, so
        unlike the double variant this is bit-identical to the fold —
        no rounding tolerance needed."""
        av, bv = a.to_numpy(), b.to_numpy()
        mask = _np.array([x is None for x in av]) | _np.array(
            [x is None for x in bv]
        )
        out = _np.zeros(len(av), dtype="int64")
        if (~mask).any():
            am = _np.stack([_np.asarray(x, dtype="int64") for x in av[~mask]])
            bm = _np.stack([_np.asarray(x, dtype="int64") for x in bv[~mask]])
            out[~mask] = _np.einsum("ij,ij->i", am, bm)
        res = _pd.Series(out)
        if mask.any():
            res = res.astype("object")
            res[mask] = None
        return res

    HAVE_VECTORIZED = True
except Exception:  # pragma: no cover - numpy/pandas are baked into the env
    HAVE_VECTORIZED = False


def lsh_sign_bucket(a: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane.

    `planes` are driver-provided deterministic hyperplanes (see
    operators/similarity.py — derived from a seeded RNG, broadcast as
    literals into the plan).
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(a, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(d >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return bucket
