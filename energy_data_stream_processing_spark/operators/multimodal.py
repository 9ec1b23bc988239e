"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a metadata
struct, processed by Arrow-batched Pandas functions over ``mapInPandas`` —
the right shape for decode / feature-extract / resize / frame-sample at
scale (vectorized batch transfer, per-partition parallelism, no row-at-a-time
Python).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
environment, so ``decode_media_batch`` uses a clearly-marked deterministic
FAKE decode (byte-derived pseudo dimensions/features); ``real_decode`` raises
NotImplementedError at the exact point a codec would plug in. Everything
around the stub — schema, batching, partitioning, UDF signature — is real
and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("byte_len", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> media rows: opaque binary content + typed metadata.

    Stands in for an image/audio table; at 100 TB the binary column lives in
    parquet with metadata columns for partition pruning (e.g. by format),
    so metadata-only queries never touch the payload bytes.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("n_chars").alias("n_chars"),
            F.col("source").alias("source"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def real_decode(content: bytes) -> dict:
    """Plug-in point for a real codec (PIL.Image.open / soundfile / ffmpeg).

    Not available in this environment by design.
    """
    raise NotImplementedError("media codecs are not installed in this environment")


def _fake_decode(content: bytes) -> tuple[str, int, int, list[float]]:
    """Deterministic stand-in for real_decode: byte-derived pseudo
    dimensions and a fixed-length feature vector (mean/spread of byte
    histogram quarters)."""
    b0 = content[0] if content else 0
    n = len(content)
    width = (b0 % 64) + 16
    height = ((n % 64) + 16) if n else 16
    quarters = [content[i::4] for i in range(4)]
    feats = [float(sum(q) % 1000) / 1000.0 if q else 0.0 for q in quarters]
    return (f"fake/{b0 % 4}", width, height, feats)


def decode_media(media: DataFrame) -> DataFrame:
    """Distributed decode/feature-extract over the binary column.

    The batch function is a closure (not a module-level reference) so
    cloudpickle ships it BY VALUE: Python workers never need this package on
    their import path — the engine stays importable from any driver cwd
    without addPyFile/PYTHONPATH choreography.
    """
    def fake_decode(content: bytes) -> tuple[str, int, int, list[float]]:
        # keep in sync with _fake_decode (duplicated into the closure so the
        # pickle carries no reference to this module)
        b0 = content[0] if content else 0
        n = len(content)
        quarters = [content[i::4] for i in range(4)]
        feats = [float(sum(q) % 1000) / 1000.0 if q else 0.0 for q in quarters]
        return (f"fake/{b0 % 4}", (b0 % 64) + 16, ((n % 64) + 16) if n else 16, feats)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            decoded = [fake_decode(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": pdf["content"].map(len).astype("int64"),
                    "format": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "features": [d[3] for d in decoded],
                }
            )

    return media.select("doc_id", "content").mapInPandas(batch, DECODED_SCHEMA)


def media_meta(docs: DataFrame) -> DataFrame:
    """Metadata-only projection (never touches payload bytes at scan time
    when the store is columnar): byte length + labeled char length."""
    m = media_table(docs)
    return m.select(
        "doc_id",
        F.length(F.col("content")).alias("byte_len"),
        F.col("meta.n_chars").alias("n_chars"),
        F.col("meta.source").alias("source"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("content", BinaryType(), False),
    ]
)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: binary in -> binary out at a target size.

    Real codec would decode, resample, re-encode; the deterministic stand-in
    truncates/tiles the byte payload to width*height bytes so output sizes
    (and therefore downstream batch shapes and memory budgets) are exactly
    what a real resize would produce.
    """
    target = width * height

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fit(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = (target + len(b) - 1) // len(b)
            return (b * reps)[:target]

        for pdf in it:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": width,
                    "height": height,
                    "content": pdf["content"].map(fit),
                }
            )

    return media.select("doc_id", "content").mapInPandas(batch, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("offset_bytes", LongType(), False),
        StructField("frame_feature", FloatType(), False),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: ONE binary row fans out to N frame rows.

    This is the UDF signature that matters for video at scale — mapInPandas
    output is not 1:1 with input, so the engine (not the caller) controls
    the fan-out, and downstream operators see ordinary rows they can
    repartition/aggregate. Frames sample at evenly-spaced byte offsets
    (deterministic stand-in for evenly-spaced timestamps).
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = len(content)
                for f in range(n_frames):
                    off = (n * f) // n_frames if n else 0
                    window = content[off : off + 16]
                    feat = (sum(window) % 1000) / 1000.0 if window else 0.0
                    rows.append((int(doc_id), f, off, feat))
            yield _pd.DataFrame(rows, columns=["doc_id", "frame_no", "offset_bytes", "frame_feature"])

    return media.select("doc_id", "content").mapInPandas(batch, FRAMES_SCHEMA)


def phash_media(media: DataFrame) -> DataFrame:
    """Per-item 64-bit perceptual-hash-style signature over the binary
    column — the image near-dup primitive (real pHash = decode -> 32x32
    grayscale -> DCT -> 8x8 low-frequency block -> median threshold; the
    codec-free stand-in here folds the bytes into 64 positional buckets and
    thresholds against their median, which preserves the property that
    matters for the plumbing AND the tests: identical payloads hash
    identically, and a small byte edit flips few bits).

    Arrow-batched pandas_udf (one numpy pass per batch); the hash is an
    int64 column, so everything downstream (banding, joins) is JVM-side.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def ph(content: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for b in content:
            if b is None or len(b) == 0:
                out.append(0)
                continue
            a = np.frombuffer(bytes(b), dtype=np.uint8)
            pad = (-len(a)) % 64
            if pad:
                a = np.concatenate([a, np.zeros(pad, dtype=np.uint8)])
            buckets = a.reshape(-1, 64).sum(axis=0, dtype=np.int64)
            med = np.median(buckets)
            bits = (buckets > med).astype(np.uint64)
            h = np.uint64(0)
            for i in range(64):
                h |= bits[i] << np.uint64(i)
            out.append(int(h.astype(np.int64)))
        return pd.Series(out)

    return media.select("doc_id", ph(F.col("content")).alias("phash"))


def phash_near_dup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate media pairs: band-blocked candidate generation over
    the 64-bit signature (4x16-bit bands — complete for Hamming <= 3,
    recall-heavy heuristic above), verified by exact ``bit_count(xor)``.
    Same shape as text SimHash (dedup.py::simhash_pairs): bucket groupBy +
    array-side pair-gen, candidate volume bounded by duplicate
    multiplicity, never all-pairs."""
    sig = phash_media(media)
    bands = sig.select(
        "doc_id",
        "phash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band, "
                "shiftright(phash, b * 16) & 65535 AS code))"
            )
        ).alias("bc"),
    ).select("doc_id", "phash", "bc.band", "bc.code")
    buckets = (
        bands.groupBy("band", "code")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "phash"))).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    pair_expr = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, greatest(0, size(ds) - i - 1)), "
        "y -> struct(x.doc_id AS doc_a, x.phash AS ha, "
        "y.doc_id AS doc_b, y.phash AS hb))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.ha", "p.hb")
        .distinct()
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
