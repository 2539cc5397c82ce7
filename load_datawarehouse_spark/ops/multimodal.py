"""Multimodal (image/audio/video) column plumbing.

The reference has no media handling (it loads JSON rows —
`src/load_datawarehouse/bigquery/__init__.py:438`); this is the EXT
surface for a training-data pipeline: media as opaque ``binary``
columns with a typed metadata struct, processed by Arrow-batched
pandas functions over ``mapInPandas``.

The container ships no image/audio codecs, so the *real* decoders are
gated behind import-tries that raise ``NotImplementedError`` with a
clear marker (see ``decode_image_real``); every registered operator
instead runs a **deterministic fake decode** over the binary payload
(byte histograms, byte-grid thumbnails, fixed-width frame sampling).
The Spark-side plumbing — binary schema, metadata struct, mapInPandas
signature, Arrow batch shape, partition behavior — is real and
oracle-checked: the test corpus's payloads are ASCII, so byte semantics
can be replayed in DuckDB SQL character-wise.

Scale notes:

- ``mapInPandas`` is narrow (no shuffle): each parquet split is decoded
  where it is read. Batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for real media
  blobs (MBs each) lower it so a batch fits executor memory.
- Metadata lives in a struct column next to the payload, so filters on
  e.g. ``meta.width`` prune *before* any decode runs (predicate
  pushdown on the scan; the binary column is never read for
  metadata-only queries thanks to parquet column pruning).
- Frame sampling fans out rows (one per sampled frame) — done in the
  pandas function, so the fan-out never inflates the shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from load_datawarehouse_spark.session import load_tables

QUERIES: dict = {}
ORACLES: dict = {}

FRAME_BYTES = 64  #: fixed-width "video frame" size in the fake codec
FRAME_STRIDE = 4  #: sample every 4th frame
THUMB_PIXELS = 64  #: byte-grid "thumbnail" size (8x8)


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Media table: binary payload + typed metadata struct
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.LongType()),
                    T.StructField("height", T.LongType()),
                    T.StructField("channels", T.LongType()),
                    T.StructField("sample_rate", T.LongType()),
                    T.StructField("n_frames", T.LongType()),
                ]
            ),
        ),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents``: the text
    payload re-typed as an opaque binary blob plus a typed metadata
    struct — the canonical layout for media at scale (metadata queries
    never touch the payload; parquet prunes the binary column away).
    """
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    n_bytes = F.octet_length("text").cast("long")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            n_bytes.alias("n_bytes"),
            ((F.col("doc_id") % 16 + 1) * 8).cast("long").alias("width"),
            ((F.col("doc_id") % 9 + 1) * 8).cast("long").alias("height"),
            F.lit(3).cast("long").alias("channels"),
            F.lit(16000).cast("long").alias("sample_rate"),
            F.floor(n_bytes / FRAME_BYTES).cast("long").alias("n_frames"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real decoders: present but explicitly stubbed (no codecs in container)
# ---------------------------------------------------------------------------


def decode_image_real(content: bytes, meta: dict) -> "object":
    """STUB — real image decode.

    Would decode ``content`` (PNG/JPEG) to an HxWxC uint8 array via
    Pillow. The container has no imaging libraries, so this raises;
    the deterministic fake path (`_byte_histogram` et al.) carries the
    pipeline instead. Swap in the real body on a cluster image with
    codecs installed — the mapInPandas plumbing does not change.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, which is not available in "
            "this environment; the registered operators use the "
            "deterministic fake codec instead"
        ) from exc
    raise NotImplementedError("real decode path not exercised in tests")


def decode_audio_real(content: bytes, meta: dict) -> "object":
    """STUB — real audio decode (librosa/soundfile); see
    ``decode_image_real``."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa, not available "
            "in this environment"
        ) from exc
    raise NotImplementedError("real decode path not exercised in tests")


# ---------------------------------------------------------------------------
# multimodal_media_meta — metadata-only scan (payload never decoded)
# ---------------------------------------------------------------------------

_META_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
       CAST(LENGTH(text) AS BIGINT) AS n_bytes,
       CAST((doc_id % 16 + 1) * 8 AS BIGINT) AS width,
       CAST((doc_id % 9 + 1) * 8 AS BIGINT) AS height,
       CAST(LENGTH(text) // 64 AS BIGINT) AS n_frames
FROM documents
ORDER BY doc_id
"""


@_register("multimodal_media_meta", _META_ORACLE)
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection of the media table. The plan reads
    only ``doc_id`` + ``meta`` fields — the binary payload column is
    pruned at the scan (the point of the payload/metadata split)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal_feature_extract — fake decode -> byte-histogram features
# ---------------------------------------------------------------------------

_FEAT_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"hist_{i}", T.LongType()) for i in range(8)]
    + [T.StructField("mean_byte", T.DoubleType())]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decode: 8-bin byte histogram (bins of 32) +
    mean byte value per payload. Pure integer arithmetic -> exact."""
    for pdf in batches:
        rows = []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(content)
            hist = [0] * 8
            total = 0
            for v in b:
                hist[v // 32] += 1
                total += v
            rows.append([doc_id, *hist, total / len(b) if b else None])
        yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA.fields])


_FEAT_ORACLE = """
WITH codes AS (
    SELECT doc_id, unicode(c) AS code
    FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM documents)
    WHERE c != ''
)
SELECT doc_id,
       {bins},
       CAST(SUM(code) AS DOUBLE) / COUNT(*) AS mean_byte
FROM codes
GROUP BY doc_id
ORDER BY doc_id
""".format(
    bins=",\n       ".join(
        f"CAST(COALESCE(SUM(CASE WHEN code // 32 = {i} THEN 1 END), 0) AS BIGINT) AS hist_{i}"
        for i in range(8)
    )
)


@_register("multimodal_feature_extract", _FEAT_ORACLE)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Narrow plan: decode happens where the split is read, no shuffle;
    the Arrow batch is the unit of work. The fake codec's histogram
    stands in for a real embedding/feature network output."""
    m = media_table(spark, sf_dir).select("doc_id", "content")
    return m.mapInPandas(_feature_batches, schema=_FEAT_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal_frame_sample — fixed-width frame sampling (video path)
# ---------------------------------------------------------------------------

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Sample every FRAME_STRIDE-th full FRAME_BYTES-wide frame; emit
    one row per sampled frame (fan-out inside the pandas fn — the
    binary payload never enters a shuffle)."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(content)
            for f_idx in range(0, len(b) // FRAME_BYTES, FRAME_STRIDE):
                frame = b[f_idx * FRAME_BYTES : (f_idx + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(f_idx)
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


_FRAME_ORACLE = f"""
WITH frames AS (
    SELECT doc_id, unnest(range(0, LENGTH(text) // {FRAME_BYTES}, {FRAME_STRIDE})) AS frame_idx,
           text
    FROM documents
)
SELECT doc_id, frame_idx,
       md5(substr(text, 1 + frame_idx * {FRAME_BYTES}, {FRAME_BYTES})) AS frame_md5
FROM frames
ORDER BY doc_id, frame_idx
"""


@_register("multimodal_frame_sample", _FRAME_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary video payloads via ``mapInPandas``
    (fake codec: fixed 64-byte frames, every 4th sampled). The oracle
    replays the same byte windows with substr+md5 (ASCII corpus)."""
    m = media_table(spark, sf_dir).select("doc_id", "content")
    return m.mapInPandas(_frame_batches, schema=_FRAME_SCHEMA).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# multimodal_resize_thumbnail — byte-grid subsample ("resize")
# ---------------------------------------------------------------------------

_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("stride", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def _thumb_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fake resize: pick THUMB_PIXELS bytes at a uniform stride —
    the access pattern (strided gather + re-pack) of a real
    nearest-neighbor downscale, without a codec."""
    for pdf in batches:
        out = {"doc_id": [], "stride": [], "thumb_md5": []}
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            b = bytes(content)
            stride = max(1, len(b) // THUMB_PIXELS)
            thumb = bytes(b[i * stride] for i in range(THUMB_PIXELS) if i * stride < len(b))
            out["doc_id"].append(doc_id)
            out["stride"].append(stride)
            out["thumb_md5"].append(hashlib.md5(thumb).hexdigest())
        yield pd.DataFrame(out)


_THUMB_ORACLE = f"""
SELECT doc_id,
       CAST(GREATEST(1, LENGTH(text) // {THUMB_PIXELS}) AS BIGINT) AS stride,
       md5(array_to_string(
           list_transform(
               list_filter(range(0, {THUMB_PIXELS}),
                           i -> i * GREATEST(1, LENGTH(text) // {THUMB_PIXELS}) < LENGTH(text)),
               i -> substr(text, 1 + i * GREATEST(1, LENGTH(text) // {THUMB_PIXELS}), 1)),
           '')) AS thumb_md5
FROM documents
ORDER BY doc_id
"""


@_register("multimodal_resize_thumbnail", _THUMB_ORACLE)
def multimodal_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' of binary payloads to a fixed-size byte thumbnail via
    ``mapInPandas`` (strided gather, md5 fingerprint of the result)."""
    m = media_table(spark, sf_dir).select("doc_id", "content")
    return m.mapInPandas(_thumb_batches, schema=_THUMB_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal_modality_stats — per-modality storage accounting
# ---------------------------------------------------------------------------

_MODALITY_STATS_ORACLE = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS media_type,
       COUNT(*) AS n_items,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_bytes,
       ROUND(AVG(CAST((doc_id % 16 + 1) * 8 AS DOUBLE)), 6) AS avg_width,
       CAST(MAX((doc_id % 9 + 1) * 8) AS BIGINT) AS max_height
FROM documents
GROUP BY 1 ORDER BY 1
"""


@_register("multimodal_modality_stats", _MODALITY_STATS_ORACLE)
def multimodal_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality storage/shape accounting (dataset-curation query:
    how much of each modality, how big). Metadata-only aggregation —
    the binary payload is pruned at the scan, so at 100 TB this reads
    the (tiny) metadata columns, never the media bytes."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.round(F.avg(F.col("meta.width").cast("double")), 6).alias("avg_width"),
            F.max("meta.height").alias("max_height"),
        )
        .orderBy("media_type")
    )


# ---------------------------------------------------------------------------
# multimodal_shard_packing — webdataset-style size-bounded shards
# ---------------------------------------------------------------------------

SHARD_BYTES = 4096  #: target shard payload size in the test corpus

_SHARD_ORACLE = f"""
WITH m AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes
    FROM documents
)
SELECT doc_id, media_type, n_bytes,
       CAST((SUM(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - 1) // {SHARD_BYTES}
            AS BIGINT) AS shard_id
FROM m ORDER BY media_type, doc_id
"""


@_register("multimodal_shard_packing", _SHARD_ORACLE)
def multimodal_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webdataset-style shard assignment: samples packed in stable
    doc_id order into ~SHARD_BYTES shards, independently per modality
    (running byte cumsum // budget — same one-pass greedy form as
    ``data.with_chunk_ids`` / ``llm.pack_training_sequences``).

    Scale: metadata-only — the window reads ``meta.n_bytes``; the
    binary payload column is pruned at the scan and never moves. The
    window is partitioned by modality; for heavier parallelism,
    sub-shard by (modality, hash-prefix) first."""
    m = media_table(spark, sf_dir)
    w = (
        Window.partitionBy("media_type")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        m.select("doc_id", "media_type", F.col("meta.n_bytes").alias("n_bytes"))
        .withColumn(
            "shard_id",
            F.floor((F.sum("n_bytes").over(w) - 1) / SHARD_BYTES).cast("long"),
        )
        .orderBy("media_type", "doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_dedup_payload — exact media dedup by content digest
# ---------------------------------------------------------------------------

_PAYLOAD_DEDUP_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           md5(text) AS content_md5,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes
    FROM documents
)
SELECT content_md5, media_type, n_bytes,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keeper_doc_id
FROM m GROUP BY content_md5, media_type, n_bytes
ORDER BY content_md5
"""


@_register("multimodal_dedup_payload", _PAYLOAD_DEDUP_ORACLE)
def multimodal_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: group by (content digest, modality, size)
    and elect a deterministic keeper — the first dedup stage of any
    image/audio training pipeline (identical files re-crawled under
    different URLs).

    Scale: the md5 runs JVM-side over the binary column where the
    data lives; only the 16-byte digest + metadata enter the shuffle.
    Payload bytes never move — the same
    shuffle-carries-keys-not-bodies rule as the text dedups. (The
    test corpus's payloads are UTF-8 text, so DuckDB replays the
    digest with md5(text).)"""
    m = media_table(spark, sf_dir)
    return (
        m.select(
            "doc_id",
            "media_type",
            F.md5("content").alias("content_md5"),
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("content_md5", "media_type", "n_bytes")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .orderBy("content_md5")
    )


# ---------------------------------------------------------------------------
# multimodal_caption_pairs — cross-modal (media, caption) pairing
# ---------------------------------------------------------------------------

_CAPTION_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
           CAST(LENGTH(text) AS BIGINT) AS n_bytes
    FROM documents
), cap AS (
    SELECT doc_id AS cap_doc_id,
           len(string_split(text, ' ')) AS caption_words
    FROM documents
)
SELECT m.doc_id, m.media_type, m.n_bytes,
       CAST(cap.caption_words AS BIGINT) AS caption_words
FROM m JOIN cap ON cap.cap_doc_id = m.doc_id
WHERE m.media_type = 'image' AND cap.caption_words BETWEEN 5 AND 1000
ORDER BY m.doc_id
"""


@_register("multimodal_caption_pairs", _CAPTION_ORACLE)
def multimodal_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style (image, caption) pair assembly: media rows join
    their text captions on the document key, filtered to images with
    usable caption lengths.

    Scale: both sides are keyed by doc_id; when media and captions
    are stored co-bucketed on that key the join needs no shuffle at
    all (here the filter prunes modality and caption-length before
    the join). Payload pruning still applies — the pair table carries
    metadata + caption stats, not bytes."""
    m = media_table(spark, sf_dir).select(
        "doc_id", "media_type", F.col("meta.n_bytes").alias("n_bytes")
    ).filter(F.col("media_type") == "image")
    docs = load_tables(spark, sf_dir, register_views=False)["documents"]
    cap = docs.select(
        F.col("doc_id").alias("cap_doc_id"),
        F.size(F.split("text", " ", -1)).cast("long").alias("caption_words"),
    ).filter(F.col("caption_words").between(5, 1000))
    return (
        m.join(cap, m.doc_id == cap.cap_doc_id)
        .select("doc_id", "media_type", "n_bytes", "caption_words")
        .orderBy("doc_id")
    )
