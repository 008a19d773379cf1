"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Beyond the reference's surface (BASELINE.json north star).  The
decode step is STUBBED (no image/audio libraries in this container —
see ``_HAS_PIL``); everything Spark-side is real and tested: the
schema contract, Arrow batch shape through ``mapInPandas``, the
deterministic fallback used by tests, and the partitioning guidance
for skewed blob sizes.

Design for 100 TB:
- blobs stay in executors end-to-end (no driver collect);
- ``mapInPandas`` streams Arrow batches, so peak memory is one batch
  of blobs per core — tune ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` down for large media;
- decode is embarrassingly parallel; a pre-``repartition`` by
  ``octet_length(content)`` bucket balances skewed blob sizes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

# The media-table schema contract: binary payload + typed metadata.
MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def media_from_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fake media table from the documents table: payload = utf-8
    bytes of the text, metadata synthesized deterministically.  Lets
    the whole multimodal path run (and be benchmarked) without real
    media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("fake/text").alias("format"),
            (F.length(text_col) % 1024).cast("int").alias("width"),
            (F.length(text_col) % 768).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real image/audio encoder: expand
    the blob's sha256 into ``dim`` floats in [-1, 1).  Replace with a
    real model behind the same signature."""
    out = np.empty(dim, dtype=np.float32)
    h = content
    i = 0
    while i < dim:
        h = hashlib.sha256(h).digest()
        chunk = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        take = min(dim - i, len(chunk))
        out[i : i + take] = chunk[:take] / 128.0 - 1.0
        i += take
    return out


_HEX = "0123456789abcdef"


def sniff_format(content) -> F.Column:
    """Magic-byte container sniff as a pure binary projection: the
    first bytes of the blob, hex-compared against the classic
    signatures.  Codegen-friendly (hex + substring + when-chain), no
    UDF — run it on 100 TB of blobs before deciding what to decode."""
    content = F.col(content) if isinstance(content, str) else content
    head = F.lower(F.hex(F.substring(content, 1, 12)))
    return (
        F.when(head.startswith("89504e470d0a1a0a"), F.lit("png"))
        .when(head.startswith("ffd8ff"), F.lit("jpeg"))
        .when(head.startswith("474946383761"), F.lit("gif"))
        .when(head.startswith("474946383961"), F.lit("gif"))
        .when(
            head.startswith("52494646") & (F.substring(head, 17, 8) == "57415645"),
            F.lit("wav"),
        )
        .when(head.startswith("52494646"), F.lit("riff"))
        .when(F.substring(head, 9, 8) == "66747970", F.lit("mp4"))
        .when(head.startswith("25504446"), F.lit("pdf"))
        .when(head.startswith("1f8b"), F.lit("gzip"))
        .otherwise(F.lit("unknown"))
    )


def _be32(content, offset: int) -> F.Column:
    """Big-endian uint32 at 1-based byte ``offset`` of a binary column
    (hex + conv — the declarative header-parse primitive)."""
    return F.conv(F.hex(F.substring(content, offset, 4)), 16, 10).cast("long")


def _le16(content, offset: int) -> F.Column:
    lo = F.conv(F.hex(F.substring(content, offset, 1)), 16, 10).cast("long")
    hi = F.conv(F.hex(F.substring(content, offset + 1, 1)), 16, 10).cast("long")
    return lo + hi * 256


def header_dims(content) -> F.Column:
    """(width, height) parsed from the container header — PNG's IHDR
    big-endian pair at bytes 17..24, GIF's little-endian pair at
    7..10 — NULLs when the format carries no dims here.  Pure
    substring/conv projections (the ``sample_frames`` pattern)."""
    content = F.col(content) if isinstance(content, str) else content
    fmt = sniff_format(content)
    return F.struct(
        F.when(fmt == "png", _be32(content, 17))
        .when(fmt == "gif", _le16(content, 7))
        .cast("int")
        .alias("width"),
        F.when(fmt == "png", _be32(content, 21))
        .when(fmt == "gif", _le16(content, 9))
        .cast("int")
        .alias("height"),
    )


def media_features(df: DataFrame, dim: int = 16, id_col: str = "media_id") -> DataFrame:
    """The DECLARATIVE feature row — every member a binary Column
    projection, zero UDFs, whole-stage codegen:

    - ``n_bytes``: octet_length
    - ``format``: magic-byte sniff (``sniff_format``)
    - ``width``/``height``: header-parsed dims (``header_dims``)
    - ``feature``: the deterministic sha256 expansion (one F.sha2 per
      blob + dim byte decodes) — identical to ``_fake_feature``'s
      first digest round, hence dim <= 32

    This is the 100 TB default: only a real learned encoder needs the
    Arrow hatch (``extract_features``), and even then the cheap
    members should come from THIS path, not ride through Python."""
    if dim > 32:
        raise ValueError(
            "declarative sha256 expansion yields at most 32 bytes; "
            f"dim={dim} needs the extract_features Arrow path"
        )
    from flox_spark.plans import ensure_parallelism

    content = F.col("content")
    dims = header_dims(content)
    # the sha2 digest is STAGED in its own select and consumed by ONE
    # transform-over-sequence: 16 inline copies (a plain array() of
    # per-byte selects) get re-inlined by CollapseProject and the hash
    # re-runs per element — observed as 18 sha2 nodes in the plan.
    # The HOF consumer keeps the staged alias intact (the same
    # discipline as the shingle pipeline).  ensure_parallelism fans a
    # single-file scan out to all cores BEFORE the hashing — but only
    # past ~96 MB: one sha2 + a few byte decodes per blob is cheap
    # enough that below that the exchange costs more than the
    # single-task compute (measured crossover at sf0.1).
    staged = ensure_parallelism(df, min_bytes=96 << 20).select(
        F.col(id_col),
        F.octet_length(content).cast("long").alias("n_bytes"),
        sniff_format(content).alias("format"),
        dims["width"].alias("width"),
        dims["height"].alias("height"),
        # sha2 already emits lowercase hex — no F.lower copy per row
        F.sha2(content, 256).alias("__hx"),
    )
    hx = F.col("__hx")
    feature = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.conv(hx.substr(i * 2 + 1, F.lit(2)), 16, 10) / 128.0 - 1.0
        ).cast("float"),
    )
    return staged.select(
        F.col(id_col),
        "n_bytes",
        "format",
        "width",
        "height",
        feature.alias("feature"),
    )


def media_features_long(
    df: DataFrame, dim: int = 16, id_col: str = "media_id"
) -> DataFrame:
    """``media_features`` in long form: one row per (id, pos) with the
    feature VALUE instead of the packed array — the shape feature
    stores and eval harnesses usually want.

    Built directly off the staged sha2 hex with a CONSTANT index
    explode (``posexplode(sequence(0, dim-1))``): exploding the
    computed feature array instead trips Catalyst's
    InferFiltersFromGenerate, which prepends ``size(<array expr>) >
    0`` and pushes it into the file scan — re-running the whole
    digest-expansion expression (sha2 included) once more per row in
    the scan filter (observed in ``DataFilters``).  A constant
    sequence's size check folds away, and the hex decode runs once
    per OUTPUT row."""
    if dim > 32:
        raise ValueError(
            "declarative sha256 expansion yields at most 32 bytes; "
            f"dim={dim} needs the extract_features Arrow path"
        )
    from flox_spark.plans import ensure_parallelism

    content = F.col("content")
    staged = ensure_parallelism(df, min_bytes=96 << 20).select(
        F.col(id_col),
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.sha2(content, 256).alias("__hx"),
    )
    return staged.select(
        F.col(id_col),
        "n_bytes",
        "__hx",
        F.posexplode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("pos", "__i"),
    ).select(
        F.col(id_col),
        "n_bytes",
        F.col("pos").cast("long").alias("pos"),
        (
            F.conv(F.col("__hx").substr(F.col("__i") * 2 + 1, F.lit(2)), 16, 10)
            / 128.0
            - 1.0
        ).cast("double").alias("feat_value"),
    )


def extract_features(df: DataFrame, dim: int = 16, id_col: str = "media_id") -> DataFrame:
    """Feature-extract every blob via an Arrow-batched ``mapInPandas``
    pass — the real plumbing for any per-blob Python/C++ model.  The
    UDF sees pandas batches of (id, content) and yields (id, n_bytes,
    feature) batches; Spark handles distribution/recovery.

    NOTE: for the members that DON'T need a model (byte length,
    format sniff, header dims, the deterministic fake encoder) use
    ``media_features`` — a pure projection with no Arrow transfer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(c if isinstance(c, (bytes, bytearray)) else bytes(c), dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    from flox_spark.plans import ensure_parallelism

    return ensure_parallelism(df.select(F.col(id_col), "content")).mapInPandas(run, FEATURE_SCHEMA)


def decode_image(df: DataFrame, id_col: str = "media_id"):
    """Decode image blobs to (height, width, 3) pixel arrays.

    STUB: requires an image library not present in this container.
    The Spark-side contract (binary in, array<array<array<int>>> out
    via mapInPandas) is what ``extract_features`` exercises with the
    deterministic fake."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow; container has no image libs. "
            "Use extract_features() for the tested Arrow plumbing."
        )
    raise NotImplementedError("real decode path intentionally left to deployment")


def sample_frames(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
) -> DataFrame:
    """Sample every ``every_n``-th frame of each media blob.

    The "demux" here is byte-slicing the container into
    ``meta.n_frames`` equal chunks — a stand-in for a real video
    demuxer (no AV library in this container) — but the OPERATOR is
    the real thing and fully declarative: binary ``substring`` +
    ``sequence``/``explode``, zero UDFs, whole-stage codegen, and the
    identical SQL runs in the oracle.  A real demuxer slots in by
    replacing the offset arithmetic with an index column."""
    n = F.greatest(F.col("meta.n_frames"), F.lit(1))
    total = F.octet_length("content")
    fsize = F.greatest((total / n).cast("int"), F.lit(1))
    idx = F.explode(
        F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda i: i % every_n == 0,
        )
    ).alias("frame_idx")
    out = df.select(F.col(id_col), "content", fsize.alias("__fs"), idx)
    return out.select(
        id_col,
        F.col("frame_idx"),
        F.substring(F.col("content"), F.col("frame_idx") * F.col("__fs") + 1, F.col("__fs")).alias(
            "frame"
        ),
    ).withColumn("frame_bytes", F.octet_length("frame"))


def resize_media(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Resize each blob's pixel grid to (out_h, out_w) by block
    averaging (area interpolation).

    Decode is the deterministic fake (content bytes tiled into the
    meta-declared height x width grayscale grid — a real decoder
    slots in at the marked line); the RESIZE math and the Arrow
    ``mapInPandas`` plumbing are real: batches of blobs in, flattened
    float grids out, no driver involvement."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("out_h", IntegerType()),
            StructField("out_w", IntegerType()),
            StructField("pixels", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, h, w in zip(
                pdf[id_col], pdf["content"], pdf["h"], pdf["w"]
            ):
                h, w = max(int(h), 1), max(int(w), 1)
                raw = np.frombuffer(
                    content if isinstance(content, (bytes, bytearray)) else bytes(content),
                    dtype=np.uint8,
                )
                # fake decode: tile bytes into the (h, w) grid.  A real
                # decoder replaces THIS line only.
                img = np.resize(raw, (h, w)).astype(np.float64)
                # real area resize: mean over source blocks per target cell
                ys = (np.arange(out_h + 1) * h / out_h).astype(int)
                xs = (np.arange(out_w + 1) * w / out_w).astype(int)
                px = np.empty((out_h, out_w), dtype=np.float32)
                for yi in range(out_h):
                    y0, y1 = ys[yi], max(ys[yi + 1], ys[yi] + 1)
                    for xi in range(out_w):
                        x0, x1 = xs[xi], max(xs[xi + 1], xs[xi] + 1)
                        px[yi, xi] = img[y0:y1, x0:x1].mean()
                rows.append((int(mid), out_h, out_w, px.ravel().tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "out_h", "out_w", "pixels"])

    from flox_spark.plans import ensure_parallelism

    src = df.select(
        F.col(id_col),
        "content",
        F.greatest(F.col("meta.width"), F.lit(1)).alias("w"),
        F.greatest(F.col("meta.height"), F.lit(1)).alias("h"),
    )
    return ensure_parallelism(src).mapInPandas(run, out_schema)


def balance_by_size(df: DataFrame, partitions: int, content_col: str = "content") -> DataFrame:
    """Repartition media rows by a hash of (size-bucket, id) so a few
    giant blobs don't serialize one task: the skew guard to apply
    before decode at scale."""
    bucket = (F.octet_length(content_col) / F.lit(65536)).cast("int")
    return df.repartition(partitions, bucket, F.spark_partition_id())
