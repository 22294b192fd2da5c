"""Bloom-filter runtime join pruning: semi/anti joins where the build
side is too big to broadcast as a hash table but fits as BITS.

The gap this closes at 100 TB: a selective dimension of ~100M keys is
far past `autoBroadcastJoinThreshold` as a hash relation (~8 GB with
overhead), so Spark plans a shuffled SortMergeJoin and the FULL fact
side pays the shuffle. But 100M keys at 1% target false-positive rate
is only ~120 MB of Bloom BITS — broadcastable. Pruning the fact side
map-side against those bits BEFORE the shuffle cuts the shuffled
volume to (matching rows + FP·non-matching), i.e. by ~the join
selectivity, which for selective dims is 10-1000×.

Exactness contract: the Bloom filter has false positives but ZERO
false negatives, so

- `bloom_semi_join`  = bloom-prune, then exact semi join on the
  survivors — result row-for-row equal to the plain semi join; the
  exact join now runs on the pruned (small) side only.
- `bloom_anti_join`  = rows that FAIL the bloom are definitely absent
  from the build side and are emitted directly with no join at all;
  only the bloom-positive rows (true matches + FPs) go through the
  exact anti join. Result equals the plain anti join; the shuffled
  volume is the bloom-positive slice.

Everything is deterministic column expressions (xxhash64 double
hashing, bit_or aggregation) — rerun-stable, retry-safe, no RNG, no
Python UDFs. Spark's own runtime row-group filtering
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) targets scan-level
pruning inside AQE; this operator is the explicit, plan-visible
variant you can aim at any join and compose with the rest of the
engine (e.g. decontamination: bench-ngram digests as the build side).

Bit layout: `m_bits` bits packed into an array<long> of m_bits/64
words, one row. Word i holds bit positions [64i, 64i+63], bit p is
`(word[p div 64] >> (p mod 64)) & 1`. `k` positions per key come from
double hashing h1 + i*h2 (Kirsch-Mitzenmacher: two xxhash64 calls
give k independent-enough probes — the standard trick, avoids k full
hash passes over the key).

Sizing (`bloom_params`): m = ceil(-n ln(fpp) / ln(2)^2), k = max(1,
round(m/n * ln 2)). 100M keys @ 1% -> m ~ 959M bits = 120 MB, k = 7.
DEPLOY.md carries the arithmetic; the FP-rate property is pinned in
tests/test_bloomfilter.py against the analytic bound.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FRACTIONAL_TYPES = {"float", "double"}


def _hash_cast_type(probe_dtype: str, build_dtype: str) -> str | None:
    """Common type both join keys are cast to BEFORE hashing, or None
    when none is needed. xxhash64 is TYPE-sensitive (an int 7 and a
    bigint 7 hash to different values), so a probe/build dtype mismatch
    would set and test DIFFERENT bit positions for equal values —
    silent false negatives, violating the zero-false-negative contract
    that makes the semi/anti joins exact. Integral pairs widen to
    bigint and float/double pairs widen to double (both lossless,
    matching the equi-join's own coercion); any other mismatch (string
    vs int, decimal precision drift, integral vs fractional — where a
    bigint -> double cast loses exactness past 2^53) raises instead of
    guessing."""
    if probe_dtype == build_dtype:
        return None
    if probe_dtype in _INTEGRAL_TYPES and build_dtype in _INTEGRAL_TYPES:
        return "bigint"
    if probe_dtype in _FRACTIONAL_TYPES and build_dtype in _FRACTIONAL_TYPES:
        return "double"
    raise ValueError(
        f"bloom join key types differ ({probe_dtype} probe vs "
        f"{build_dtype} build) and have no lossless common hash type; "
        "cast the keys to a common type before the bloom join"
    )


def _key_expr(key_col: str, hash_cast: str | None) -> Column:
    c = F.col(key_col)
    return c.cast(hash_cast) if hash_cast else c


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate; m rounded up to a
    multiple of 64 so the word array is exact."""
    if n_keys <= 0:
        raise ValueError("n_keys must be positive")
    if not (0.0 < fpp < 1.0):
        raise ValueError("fpp must be in (0, 1)")
    m = math.ceil(-n_keys * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _position_list(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: double hashing base + i*stride
    (Kirsch-Mitzenmacher). Both terms are reduced mod m BEFORE the
    multiply-add so the arithmetic stays far from int64 overflow (ANSI
    mode throws on overflow rather than wrapping); the stride lands in
    [1, m-1] so it never degenerates to 0 (which would collapse all k
    probes onto one bit).

    Deliberately UNROLLED plain expressions, not transform/forall over
    a sequence: Catalyst's predicate pushdown mistracks outer column
    references inside higher-order-function lambdas, and a downstream
    `filter(__bloom_hit)` — the operator's whole point — gets pushed
    through the scalar crossJoin onto the bitmap side as an unbound
    `!Filter`, failing at execution with INTERNAL_ERROR_ATTRIBUTE_NOT_
    FOUND. k is <= ~20 for any sane fpp, so the unrolled tree is small.
    """
    base, stride = _hash_cols(key, m_bits)
    return [F.pmod(base + F.lit(i).cast("long") * stride, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    build: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    hash_cast: str | None = None,
) -> DataFrame:
    """One-row DataFrame (m_bits, k, bits: array<long>) — the Bloom
    bitmap of `build[key_col]`. `hash_cast` (a type name) casts the
    key before hashing — xxhash64 is type-sensitive, so when build and
    probe key dtypes differ BOTH sides must hash the same widened type
    (the joins derive it via `_hash_cast_type`; standalone callers
    pairing bloom_build with bloom_flag across dtypes must pass the
    same value to both). NULL keys are dropped BEFORE hashing
    (xxhash64 hashes NULL to the bare seed hash, so an unfiltered
    NULL would set k phantom bits and quietly inflate the FP rate
    past the bloom_params sizing; join semantics never match NULL
    anyway).

    Plan shape: keys -> explode k positions -> groupBy word index ->
    bit_or partial+final (map-side combine; at most m/64 groups
    survive) -> one-row dense array via a sequence/transform over a
    map of the non-zero words. The only single-row state is the
    bitmap itself — by construction the thing sized to broadcast.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    n_words = m_bits // 64
    words = (
        build.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(*_position_list(_key_expr(key_col, hash_cast), m_bits, k))
            ).alias("__pos")
        )
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            # call_function: pyspark's F.shiftleft only takes a Python
            # int shift amount; the SQL function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__b)").alias("__word"))
    )
    # densify: left-join the word frame [0, n_words) against the
    # non-zero words, then collect in word order. (A map + per-index
    # element_at would be O(n_words * occupied) linear probes inside
    # one task — measurably slow already at 4k words.)
    spark = build.sparkSession
    frame = spark.range(n_words).select(F.col("id").cast("int").alias("__w"))
    dense = frame.join(words, "__w", "left").select(
        "__w", F.coalesce(F.col("__word"), F.lit(0).cast("long")).alias("__word")
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__w", "__word"))),
            lambda s: s["__word"],
        ).alias("bits")
    ).select(
        F.lit(m_bits).alias("m_bits"),
        F.lit(k).alias("k"),
        "bits",
    )


def _hash_cols(key: Column, m_bits: int) -> tuple[Column, Column]:
    """(base, stride) for double hashing; see `_position_list`."""
    base = F.pmod(F.xxhash64(key), F.lit(m_bits))
    stride = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits - 1)) + 1
    return base, stride


def _might_contain_pre(
    base: Column, stride: Column, key: Column, bits: Column, m_bits: int, k: int
) -> Column:
    """TRUE if every probe bit is set (possible member), FALSE if any
    is clear (definitely absent), NULL for NULL keys. Unrolled AND
    chain — see `_position_list` for why no forall.

    Takes PRE-HASHED (base, stride) columns rather than hashing the
    key inline: Catalyst folds the downstream `filter(__bloom_hit)`
    into the scalar crossJoin as a BroadcastNestedLoopJoin CONDITION,
    which is evaluated interpreted (outside whole-stage codegen, no
    common-subexpression elimination) — inline hashing would re-run
    2k xxhash64 calls per row there. With the two hashes computed in
    the codegen'd Project below the join, the interpreted condition
    is k cheap element_at + bit tests."""
    checks = []
    for i in range(k):
        p = F.pmod(base + F.lit(i).cast("long") * stride, F.lit(m_bits))
        checks.append(
            F.element_at(bits, (p / 64).cast("int") + 1)
            .bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        )
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    # xxhash64 hashes a NULL input to the bare seed hash (it does not
    # propagate NULL), so gate explicitly: NULL key -> NULL verdict,
    # mirroring join semantics where NULL matches nothing.
    return F.when(key.isNull(), F.lit(None).cast("boolean")).otherwise(out)


def bloom_flag(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    flag_col: str = "__bloom_hit",
    m_bits: int | None = None,
    k: int | None = None,
    hash_cast: str | None = None,
) -> DataFrame:
    """`probe` + a boolean `flag_col` (NULL key -> NULL flag). The
    one-row bitmap rides in as a broadcast scalar crossJoin — the
    same 1-row-scalar shape PLANAUDIT whitelists everywhere else.
    Pass (m_bits, k) when known to skip the 1-row metadata fetch.
    `hash_cast` must match whatever `bloom_build` hashed when probe
    and build key dtypes differ (see bloom_build)."""
    # localCheckpoint truncates the bitmap's lineage: when probe and
    # build share a plan (self-referential prune), the un-truncated
    # crossJoin is a self-join whose attribute dedup miscompiles the
    # probe expressions over the bitmap column. The bitmap is one row —
    # checkpointing it is free and makes the scalar side plan-opaque.
    # Checkpoint BEFORE any metadata fetch: a bare bloom.first() would
    # run the whole build aggregation once for the fetch and again for
    # the checkpoint.
    cp = bloom.localCheckpoint(eager=True)
    if m_bits is None or k is None:
        row = cp.first()
        m_bits, k = int(row["m_bits"]), int(row["k"])
    b = F.broadcast(cp.select(F.col("bits").alias("__bloom_bits")))
    base, stride = _hash_cols(_key_expr(key_col, hash_cast), m_bits)
    hashed = probe.withColumn("__bf_base", base).withColumn("__bf_stride", stride)
    joined = hashed.crossJoin(b)
    return joined.select(
        *[joined[c] for c in probe.columns],
        _might_contain_pre(
            joined["__bf_base"],
            joined["__bf_stride"],
            joined[key_col],
            joined["__bloom_bits"],
            m_bits,
            k,
        ).alias(flag_col),
    )


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int | None = None,
    k: int | None = None,
    n_keys_hint: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact left-semi join, bloom-pruned: equals
    `probe.join(build, probe[probe_key]==build[build_key], 'left_semi')`
    but only bloom-positive probe rows (matches + ~fpp of the rest)
    reach the exact join's shuffle.

    Sizing: pass (m_bits, k) explicitly, or n_keys_hint (+ fpp) to let
    `bloom_params` size it. The hint path costs no extra job; an
    unhinted build falls back to a distinct-count job first — fine
    interactively, pass the hint in pipelines.

    Mismatched key dtypes hash through a lossless common type
    (`_hash_cast_type`), so an int probe against a bigint build keeps
    the zero-false-negative contract; incompatible pairs raise.
    """
    cast_t = _hash_cast_type(
        dict(probe.dtypes)[probe_key], dict(build.dtypes)[build_key]
    )
    m_bits, k = _resolve_size(build, build_key, m_bits, k, n_keys_hint, fpp)
    bloom = bloom_build(build, build_key, m_bits, k, hash_cast=cast_t)
    flagged = bloom_flag(probe, probe_key, bloom, m_bits=m_bits, k=k, hash_cast=cast_t)
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    return candidates.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        candidates[probe_key] == F.col("__bk"),
        "left_semi",
    )


def bloom_anti_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int | None = None,
    k: int | None = None,
    n_keys_hint: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Exact left-anti join, bloom-accelerated. Bloom-NEGATIVE rows are
    definitely absent from the build side and bypass the join entirely
    (for a selective build side that is ~all of the probe); NULL-key
    rows never match anything and also bypass (NOT-EXISTS semantics,
    same as Spark's left_anti); only bloom-positive rows pay the exact
    anti join. Output equals the plain left_anti join.

    The flagged frame feeds BOTH union branches and is deliberately
    NOT cached: at scale, materializing the whole probe (persist or
    checkpoint) costs more than re-running two pruned columnar scans
    plus k hashes per row, and a library-level persist with no
    unpersist accumulates CacheManager entries across calls (the r2
    dedupe_corpus lesson). The bitmap itself IS shared — bloom_flag
    localCheckpoints it eagerly, so the build aggregation runs once.
    Callers who prefer one probe scan can persist upstream and
    unpersist after their final action.

    Mismatched key dtypes hash through a lossless common type — see
    `bloom_semi_join`."""
    cast_t = _hash_cast_type(
        dict(probe.dtypes)[probe_key], dict(build.dtypes)[build_key]
    )
    m_bits, k = _resolve_size(build, build_key, m_bits, k, n_keys_hint, fpp)
    bloom = bloom_build(build, build_key, m_bits, k, hash_cast=cast_t)
    flagged = bloom_flag(probe, probe_key, bloom, m_bits=m_bits, k=k, hash_cast=cast_t)
    definite_absent = flagged.filter(
        ~F.col("__bloom_hit") | F.col("__bloom_hit").isNull()
    ).drop("__bloom_hit")
    candidates = flagged.filter(F.col("__bloom_hit")).drop("__bloom_hit")
    survivors = candidates.join(
        build.select(F.col(build_key).alias("__bk")).distinct(),
        candidates[probe_key] == F.col("__bk"),
        "left_anti",
    )
    return definite_absent.unionByName(survivors)


def _resolve_size(
    build: DataFrame,
    build_key: str,
    m_bits: int | None,
    k: int | None,
    n_keys_hint: int | None,
    fpp: float,
) -> tuple[int, int]:
    if m_bits is not None and k is not None:
        if m_bits % 64 != 0 or m_bits <= 0:
            raise ValueError("m_bits must be a positive multiple of 64")
        return m_bits, k
    n = n_keys_hint
    if n is None:
        n = build.select(build_key).distinct().count()
    return bloom_params(max(1, n), fpp)
