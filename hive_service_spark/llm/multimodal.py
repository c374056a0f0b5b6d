"""LLM-pipeline extension — multimodal (binary payload) columns.

Images/audio/video are opaque `binary` columns with typed metadata; the
compute pattern is: cheap JVM-side metadata/slicing first (prune before
Python), then Arrow-batched Pandas UDFs (`mapInPandas`) for the decode/
feature step. The actual image/audio codecs are NOT in this container,
so the decode step is a clearly-marked deterministic stub behind an
import-try (`_try_real_decoder`) — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and oracle-tested.

Payloads here are the UTF-8 bytes of `documents.text` (ASCII corpus →
byte k == char code k), which lets DuckDB verify the byte-level math
the pandas stage computes — the oracle checks the Arrow round-trip and
the arithmetic, not just shapes.

Scale notes: binary columns ride Parquet like any other column —
column pruning means metadata queries never read the payload bytes;
`mapInPandas` streams Arrow batches (no per-row pickling, no driver
collect); fan-out (frame sampling) happens via posexplode BEFORE the
Python hop so Spark controls parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hive_service_spark.catalog import load
from hive_service_spark.registry import query


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload + typed metadata."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.col("source").alias("media_source"),
        F.col("lang").alias("media_lang"),
    )


# ---------------------------------------------------------------------------
# metadata pass — pure JVM, payload bytes pruned unless touched
# ---------------------------------------------------------------------------

_META_ORACLE = """
SELECT doc_id,
       length(text)                   AS n_bytes,
       md5(text)                      AS content_md5,
       upper(substr(text, 1, 4))      AS magic_ascii,
       CASE WHEN length(text) >= 512 THEN 'large' ELSE 'small' END AS size_class
FROM documents
"""


@query("mm_binary_metadata", oracle=_META_ORACLE)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: size, digest, magic bytes,
    size class — the prune-before-decode stage. All JVM expressions;
    at 100 TB this pass reads only the columns it needs."""
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.upper(F.substring("payload", 1, 4).cast("string")).alias("magic_ascii"),
        F.when(F.octet_length("payload") >= 512, "large")
        .otherwise("small")
        .alias("size_class"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract via mapInPandas (Arrow batches)
# ---------------------------------------------------------------------------

def _try_real_decoder():
    """The real decode path (PIL/cv2/librosa) — not installed in this
    container; the plumbing falls back to the deterministic byte-stat
    featurizer below."""
    try:  # pragma: no cover - codec libs absent by design
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_byte double, min_byte bigint, "
    "max_byte bigint, n_space bigint"
)


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode+featurize: byte statistics
    computed vectorized per Arrow batch. A real deployment swaps ONLY
    this function body for the codec call; signature/schema stay."""
    if _try_real_decoder():  # pragma: no cover
        raise NotImplementedError("real codec path not wired in v1")
    import math

    def round_half_up(x: float, nd: int) -> float:
        # SQL ROUND is half-away-from-zero; Python round() is banker's
        return math.floor(x * 10**nd + 0.5) / 10**nd

    for pdf in batches:
        feats = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            feats.append(
                (
                    doc_id,
                    len(b),
                    round_half_up(sum(b) / len(b), 4) if b else None,
                    min(b) if b else None,
                    max(b) if b else None,
                    b.count(b" "),
                )
            )
        yield pd.DataFrame(
            feats,
            columns=[
                "doc_id", "n_bytes", "mean_byte",
                "min_byte", "max_byte", "n_space",
            ],
        )


_FEATURE_ORACLE = """
SELECT doc_id,
       length(text) AS n_bytes,
       ROUND(list_sum(list_transform(string_split_regex(text, ''),
                                     c -> ascii(c))) * 1.0 / length(text), 4)
         AS mean_byte,
       list_min(list_transform(string_split_regex(text, ''), c -> ascii(c)))
         AS min_byte,
       list_max(list_transform(string_split_regex(text, ''), c -> ascii(c)))
         AS max_byte,
       length(text) - length(replace(text, ' ', '')) AS n_space
FROM documents
"""


@query("mm_feature_extract", oracle=_FEATURE_ORACLE)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas. The oracle recomputes the byte statistics from the
    (ASCII) source text in SQL, so the Arrow binary round-trip and the
    Python math are both verified."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_byte_features, schema=_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling (video-style fan-out) — slice JVM-side, hash per frame
# ---------------------------------------------------------------------------

_FRAME_ORACLE = """
SELECT doc_id, frame_idx,
       md5(substr(text, frame_idx * 64 + 1, 64)) AS frame_md5,
       length(substr(text, frame_idx * 64 + 1, 64)) AS frame_bytes
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // 64)) AS frame_idx
  FROM documents
)
WHERE frame_idx % 4 = 0
"""


@query("mm_frame_sample", oracle=_FRAME_ORACLE)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat the payload as fixed-size 64-byte frames,
    keep every 4th, fingerprint each. The explode happens JVM-side
    (posexplode over a sequence), so at scale Spark parallelizes frames
    across executors BEFORE any Python/codec step — the shape of video
    frame-sample + per-frame embed pipelines."""
    p = _payloads(spark, sf_dir)
    frames = p.select(
        "doc_id",
        "payload",
        F.posexplode(
            F.sequence(
                F.lit(0), F.floor((F.octet_length("payload") - 1) / 64)
            )
        ).alias("pos", "frame_idx"),
    ).where(F.col("frame_idx") % 4 == 0)
    frame = F.substring(
        F.col("payload").cast("string"), F.col("frame_idx") * 64 + 1, 64
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(frame).alias("frame_md5"),
        F.octet_length(frame).alias("frame_bytes"),
    )


# ---------------------------------------------------------------------------
# resize / downsample — payload in, smaller payload out through Arrow
# ---------------------------------------------------------------------------

_RESIZE_SCHEMA = "doc_id bigint, thumb_bytes bigint, thumb_md5 string"


def _stride_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for image resize: keep every 8th byte.
    Same dataflow as a real thumbnailer (binary in -> smaller binary
    out, per-item Python work, Arrow both ways); swap the body for
    PIL's `Image.resize` when codecs exist."""
    if _try_real_decoder():  # pragma: no cover
        raise NotImplementedError("real codec path not wired in v1")
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            thumb = bytes(payload)[::8]
            out.append((doc_id, len(thumb), hashlib.md5(thumb).hexdigest()))
        yield pd.DataFrame(out, columns=["doc_id", "thumb_bytes", "thumb_md5"])


_RESIZE_ORACLE = """
SELECT doc_id,
       COUNT(*) AS thumb_bytes,
       md5(string_agg(c, '' ORDER BY i)) AS thumb_md5
FROM (
  SELECT doc_id, i, substr(text, i, 1) AS c
  FROM documents, unnest(generate_series(1, length(text), 8)) AS t(i)
)
GROUP BY doc_id
"""


@query("mm_resize_thumbnail", oracle=_RESIZE_ORACLE)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: every-8th-byte downsample per payload through
    mapInPandas, fingerprinting the produced thumbnail. The oracle
    reconstructs the identical stride-slice in SQL, so the binary->
    binary Arrow round-trip is value-verified. At 100 TB the payload
    column is read once, shrunk 8x in the same stage, and never
    revisits the driver."""
    p = _payloads(spark, sf_dir).select("doc_id", "payload")
    return p.mapInPandas(_stride_resize, schema=_RESIZE_SCHEMA)
