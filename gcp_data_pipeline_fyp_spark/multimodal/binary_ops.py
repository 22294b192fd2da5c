"""Opaque binary media columns with typed metadata + Pandas-UDF plumbing.

Design (per the training-data-pipeline brief): image/audio/video
payloads travel as `binary` columns beside a typed metadata struct;
decode/feature-extract run as Arrow-batched `mapInPandas` so the bytes
cross to Python once per batch, not once per row. The actual codec
step is STUBBED — this container ships no PIL/libav — behind an
import-try + `NotImplementedError`; everything Spark-side (schema,
batch iteration, partitioning, output shape) is real and tested via
the deterministic `byte_features` extractor.

At 100 TB: binary payloads dominate row size — keep them OUT of
shuffle keys, repartition by a small id before `mapInPandas`, and
project the binary column away as soon as features are extracted.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

_FEATURE_SCHEMA = (
    "media_id long, n_bytes long, n_space_bytes long, content_md5 string"
)


def with_media_column(
    df: DataFrame, text_col: str, id_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap a column's utf-8 bytes as a media payload (test/fixture path)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def byte_features(df: DataFrame) -> DataFrame:
    """Deterministic per-payload features via Arrow-batched mapInPandas.

    Stands in for a real decode+featurize stage: proves the batch
    plumbing (binary in, typed row out) with outputs an oracle can
    recompute (byte length, 0x20 count, md5).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads (e.g. NULL source text) yield NULL features,
            # matching SQL semantics — never crash the batch
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # no astype: map yields int64 for null-free batches
                    # (vectorized Arrow long) and object with NULLs —
                    # Arrow accepts both for the long output column
                    "n_bytes": payloads.map(
                        lambda b: None if b is None else len(b)
                    ),
                    "n_space_bytes": payloads.map(
                        lambda b: None if b is None else bytes(b).count(b" ")
                    ),
                    "content_md5": payloads.map(
                        lambda b: None if b is None else hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(extract, schema=_FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode) — requires PIL.

    The Spark plumbing is identical to `byte_features`; only the codec
    is environment-gated.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - PIL absent in this container
        raise NotImplementedError(
            "image decode needs pillow; this environment ships no codecs. "
            "The mapInPandas plumbing is exercised via byte_features()."
        ) from e

    import io

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from PIL import Image

        for pdf in batches:
            ims = pdf["payload"].map(lambda b: Image.open(io.BytesIO(bytes(b))))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ims.map(lambda i: i.width),
                    "height": ims.map(lambda i: i.height),
                    "mode": ims.map(lambda i: i.mode),
                }
            )

    return df.mapInPandas(decode, schema="media_id long, width int, height int, mode string")


def plan_frame_offsets(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling plan for video rows: offsets to decode, no codec needed.

    Pure column arithmetic (real, not stubbed): evenly spaced offsets
    within duration_ms, capped at max_frames.
    """
    n = F.least(
        F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: (i * F.col("duration_ms") / n).cast("int"),
        ).alias("frame_offsets_ms"),
    )


def plan_audio_chunks(
    df: DataFrame,
    chunk_ms: int = 30_000,
    overlap_ms: int = 1_000,
) -> DataFrame:
    """Chunking plan for audio rows: (start_ms, end_ms) windows with
    overlap — the audio analog of `plan_frame_offsets`. Pure column
    arithmetic over duration metadata (real, not stubbed); only the
    waveform decode inside each chunk is codec-dependent. Overlapping
    windows are the standard ASR/feature-extraction shape so no speech
    is lost at chunk boundaries.
    """
    stride = chunk_ms - overlap_ms
    n = F.greatest(
        F.ceil((F.col("duration_ms") - F.lit(overlap_ms)) / F.lit(stride)).cast(
            "int"
        ),
        F.lit(1),
    )
    return df.filter(F.col("media_type") == "audio").select(
        "media_id",
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.struct(
                (i * stride).cast("int").alias("start_ms"),
                F.least(
                    i * stride + chunk_ms, F.col("duration_ms")
                ).cast("int").alias("end_ms"),
            ),
        ).alias("chunks"),
    )


def resize_dims(
    df: DataFrame, max_dim: int = 256
) -> DataFrame:
    """Aspect-preserving resize targets — pure column arithmetic, no codec.

    The Spark-side half of a resize stage: given (width, height)
    metadata, compute the target box so the longer side is `max_dim`
    (never upscale). The pixel resample itself is the only
    codec-dependent step (`resize_image`); everything a planner or
    shard-size estimator needs is computable at scan speed here.
    """
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    tw = F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1))
    th = F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1))
    return df.select(
        "media_id",
        "width",
        "height",
        F.when(F.col("width").isNotNull() & F.col("height").isNotNull(), tw)
        .alias("target_width"),
        F.when(F.col("width").isNotNull() & F.col("height").isNotNull(), th)
        .alias("target_height"),
    )


def resize_image(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Decode + aspect-preserving resample to `max_dim` — requires PIL.

    Same Arrow-batched mapInPandas shape as `decode_image`; the
    environment gate covers only the codec."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - PIL absent in this container
        raise NotImplementedError(
            "image resize needs pillow; this environment ships no codecs. "
            "Target-box arithmetic is exercised codec-free via resize_dims()."
        ) from e

    import io

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from PIL import Image

        def one(b):
            im = Image.open(io.BytesIO(bytes(b)))
            im.thumbnail((max_dim, max_dim))  # aspect-preserving, no upscale
            out = io.BytesIO()
            im.save(out, format=im.format or "PNG")
            return out.getvalue()

        for pdf in batches:
            resized = pdf["payload"].map(lambda b: None if b is None else one(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "n_bytes": resized.map(lambda b: None if b is None else len(b)),
                }
            )

    return df.mapInPandas(resample, schema="media_id long, payload binary, n_bytes long")


_PHASH_SCHEMA = "media_id long, phash long"


def phash64(df: DataFrame) -> DataFrame:
    """64-bit perceptual-style hash per payload via Arrow-batched
    mapInPandas: the payload's bytes split into 64 equal chunks, a
    per-chunk byte-sum profile, bit d = profile[d] > median(profile).
    This is the DCT-free skeleton of a real pHash — identical batch
    plumbing, identical output shape; swap the chunk-sum profile for
    DCT coefficients of the decoded image when a codec is present
    (`decode_image`'s gate). Locality: a local byte edit perturbs one
    chunk, flipping at most a few bits, so near-identical payloads
    land within a small Hamming distance. NULL payloads yield NULL
    hashes. The hash lands in int64 with the sign bit used (bit 0 of
    the profile maps to the MSB) — compare with XOR/bit_count, never
    order.
    """
    import numpy as np

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf["payload"]:
                if b is None:
                    out.append(None)
                    continue
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    out.append(0)
                    continue
                pad = (-arr.size) % 64
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                profile = arr.reshape(64, -1).sum(axis=1, dtype=np.int64)
                bits = profile > np.median(profile)
                h = np.uint64(0)
                for bit in bits:
                    h = np.uint64(h << np.uint64(1)) | np.uint64(bool(bit))
                out.append(int(np.int64(h)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": out})

    return df.mapInPandas(hash_batches, schema=_PHASH_SCHEMA)


def media_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate payload pairs from 64-bit perceptual hashes:
    banded candidate generation + exact Hamming verify — the image
    counterpart of SimHash text dedup.

    The 64-bit hash splits into 4 disjoint 16-bit bands; by
    pigeonhole, any pair within Hamming distance 3 agrees EXACTLY on
    at least one band, so the candidate join is an equality join on
    (band_idx, band_value) — never an all-pairs scan — and the
    verify stage computes bit_count(a XOR b) on candidates only.
    Raising max_hamming above 3 needs more/narrower bands (k+1 bands
    guarantee recall at Hamming k); the default matches the 4-band
    layout. Scale: shuffle carries (id, 8-byte hash) pairs; bucket
    sizes follow band-value frequencies (salt pathological constants
    upstream if payload dedup wasn't run first).
    """
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit banding guarantees recall only to Hamming 3; "
            "use more bands for a looser threshold"
        )
    bands = F.array(
        *[
            (
                F.shiftrightunsigned(F.col(hash_col), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
            )
            for i in range(4)
        ]
    )
    banded = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col),
        F.col(hash_col),
        F.posexplode(bands).alias("band_idx", "band_val"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("__ha"),
            F.col(f"b.{hash_col}").alias("__hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
