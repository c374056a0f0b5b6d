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
from hive_service_spark.registry import persisted, query


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
    """Returns the best available REAL decoder, or None.

    Preference order: PIL (full codec suite — absent in this
    container) else the built-in numpy PGM (P5) parser below, which is
    a genuine decoder for a genuine public image format (netpbm):
    header parse + raster extraction, no external deps. Payloads that
    are not decodable images fall back to the raw-byte view, so the
    SAME featurizer body serves both paths."""
    try:  # pragma: no cover - PIL absent in this container by design
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return "pgm"


def _decode_pgm(b: bytes):
    """Decode a binary-netpbm P5 grayscale image: ``P5 <w> <h> <maxval>``
    whitespace-separated header, then w*h raw bytes. Returns
    (width, height, flat uint8 numpy raster). Raises ValueError on a
    malformed header — callers treat that as 'not an image'."""
    import numpy as np

    if b[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PGM header")
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace byte after maxval, then the raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    raster = np.frombuffer(b, dtype=np.uint8, count=w * h, offset=i)
    if raster.size != w * h:
        raise ValueError("truncated PGM raster")
    return w, h, raster


def _decode_payload(b: bytes, decode: bool):
    """One payload -> flat uint8 array. ``decode=True`` runs the real
    decoder (PGM parse via numpy; PIL when present); ``decode=False``
    is the raw byte view — decode is an explicit per-query choice, not
    a magic-bytes sniff, so a text payload that happens to start with
    'P5' is never silently misread as an image."""
    import numpy as np

    if decode:
        dec = _try_real_decoder()
        if dec == "pil":
            # PIL present: real image decode (round-13 review: this
            # branch previously fell through to the RAW view, so
            # installing PIL silently changed every decode-path
            # statistic instead of upgrading the decoder). PGM parse
            # stays the fallback for payloads PIL rejects.
            try:
                import io

                from PIL import Image

                return np.asarray(
                    Image.open(io.BytesIO(b)).convert("L"), dtype=np.uint8
                ).ravel()
            except Exception:
                return _decode_pgm(b)[2]
        if dec == "pgm":
            return _decode_pgm(b)[2]
    return np.frombuffer(b, dtype=np.uint8)


_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, mean_byte double, min_byte bigint, "
    "max_byte bigint, n_space bigint"
)


def _round_half_up(x: float, nd: int) -> float:
    # SQL ROUND is half-away-from-zero; Python round() is banker's
    import math

    return math.floor(x * 10**nd + 0.5) / 10**nd


def _featurizer(decode: bool):
    """Build the mapInPandas featurize function: each payload is
    decoded (real PGM parse when ``decode``, raw byte view otherwise)
    and reduced to exact-integer statistics — the int64 sum keeps the
    mean bit-identical to the SQL oracle regardless of summation
    order. A real PIL deployment swaps ONLY _decode_payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = _decode_payload(bytes(payload), decode)
                n = int(a.size)
                feats.append(
                    (
                        doc_id,
                        n,
                        _round_half_up(int(a.sum(dtype="int64")) / n, 4)
                        if n
                        else None,
                        int(a.min()) if n else None,
                        int(a.max()) if n else None,
                        int((a == 32).sum()),
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "doc_id", "n_bytes", "mean_byte",
                    "min_byte", "max_byte", "n_space",
                ],
            )

    return run


_byte_features = _featurizer(decode=False)


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
# REAL image decode: netpbm P5 payloads built JVM-side, decoded in Python
# ---------------------------------------------------------------------------

_PGM_SCHEMA = (
    "doc_id bigint, width int, height int, mean_pixel double, "
    "raster_md5 string"
)


def _pgm_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The real-decoder branch: every payload IS a valid P5 image, so
    this parses the header and extracts the raster — statistics are
    over DECODED PIXELS ONLY. If the decoder mis-parsed the header by
    even one byte, mean_pixel and raster_md5 would both diverge from
    the oracle (which computes them from the pre-encoding source)."""
    import hashlib

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, raster = _decode_pgm(bytes(payload))
            rows.append(
                (
                    doc_id,
                    w,
                    h,
                    _round_half_up(
                        int(raster.sum(dtype="int64")) / raster.size, 4
                    ),
                    hashlib.md5(raster.tobytes()).hexdigest(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "width", "height", "mean_pixel", "raster_md5"],
        )


_PGM_ORACLE = """
SELECT doc_id,
       64 AS width,
       CAST(length(text) // 64 AS INT) AS height,
       ROUND(list_sum(list_transform(
               string_split_regex(substr(text, 1, 64 * (length(text) // 64)), ''),
               c -> ascii(c))) * 1.0 / (64 * (length(text) // 64)), 4)
         AS mean_pixel,
       md5(substr(text, 1, 64 * (length(text) // 64))) AS raster_md5
FROM documents
WHERE length(text) >= 64
"""


@query("mm_pgm_decode", oracle=_PGM_ORACLE)
def mm_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the multimodal plumbing: each document
    payload is wrapped into a genuine binary-netpbm P5 grayscale image
    JVM-side (width 64, height len//64, '255' maxval header + raster),
    then mapInPandas runs the numpy PGM decoder — actual header parsing
    and raster extraction for a real public image format, not a byte
    stand-in. The oracle recomputes width/height/mean/md5 from the
    PRE-ENCODING source text, so a decode that misplaced the raster by
    one byte fails the value hash. At 100 TB: encode and decode live in
    the same stage (no extra shuffle), payloads never visit the driver,
    and the Python hop is Arrow-batched."""
    d = load(spark, sf_dir, "documents").where(F.length("text") >= 64)
    h = F.floor(F.length("text") / 64).cast("int")
    body = F.expr("substr(text, 1, 64 * (length(text) div 64))")
    payload = F.concat(
        F.lit("P5\n64 "), h.cast("string"), F.lit("\n255\n"), body
    ).cast("binary")
    return (
        d.select("doc_id", payload.alias("payload"))
        .mapInPandas(_pgm_decode_features, schema=_PGM_SCHEMA)
    )


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
  WHERE length(text) > 0
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
    # empty payloads are excluded on BOTH sides: Spark's sequence(0,-1)
    # yields a DESCENDING [0,-1] (frame 0 would survive) while DuckDB's
    # generate_series(0,-1) is empty — a latent engine divergence if a
    # regenerated corpus ever contains an empty document
    p = _payloads(spark, sf_dir).where(F.octet_length("payload") > 0)
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
    """Stride downsample: keep every 8th byte of the raw payload. Same
    dataflow as a real thumbnailer (binary in -> smaller binary out,
    per-item Python work, Arrow both ways); a PIL deployment swaps the
    slice for `Image.resize`. The PGM-decoded resize variant lives in
    mm_pgm_decode, which downsamples the DECODED raster."""
    import hashlib

    for pdf in batches:
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            if not len(payload):
                # the oracle's generate_series(1, 0) emits no rows for
                # an empty payload — omit the doc here too instead of
                # emitting a (0, md5('')) row it can't match
                # (round-13 review)
                continue
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


# ---------------------------------------------------------------------------
# audio: REAL PCM decode (no codec library needed) + windowed stats
# ---------------------------------------------------------------------------

_PCM_ORACLE = """
WITH samp AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, CAST(least(length(text), 512) // 2 AS INTEGER)),
           i -> ascii(substr(text, 2*i - 1, 1))
                + 256 * ascii(substr(text, 2*i, 1))) AS s
  FROM documents
)
SELECT doc_id,
       CAST(len(s) AS INTEGER)  AS n_samples,
       CAST(list_sum(s) AS BIGINT) AS sum_s,
       CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(list_max(s) AS INTEGER) AS peak,
       ROUND(sqrt(list_sum(list_transform(s, x -> x * x)) * 1.0 / len(s)), 4)
         AS rms
FROM samp
"""


@query("mm_audio_pcm_stats", oracle=_PCM_ORACLE)
def mm_audio_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode — 16-bit little-endian PCM needs no codec
    library, so unlike the image stubs this path runs actual sample
    decoding end-to-end: the first 512 payload bytes (the header
    analysis window) are reinterpreted as int16 samples with
    numpy.frombuffer inside an Arrow-batched mapInPandas, and per-clip
    loudness stats come out. The payload bytes are ASCII (<128), so
    every sample's high byte is < 128 and the signed/unsigned int16
    readings coincide — which is what lets DuckDB's oracle rebuild the
    identical samples from character codes. The sums are kept in EXACT
    int64 (sum, sum of squares, peak) so no float accumulation order
    can flap the hash; RMS is derived from the exact sums identically
    on both sides. Scale shape: slice JVM-side first (substring prunes
    the Arrow transfer to 512 bytes/row), then one Python hop, no
    per-row pickling."""
    import numpy as np

    src = _payloads(spark, sf_dir).select(
        "doc_id", F.expr("substring(payload, 1, 512)").alias("win")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["win"]):
                n = len(buf) // 2
                a = np.frombuffer(buf[: 2 * n], dtype="<i2").astype(np.int64)
                # n == 0 (payload < 2 bytes): a.max() raises on a
                # zero-size array; the oracle's list_sum([])/list_max([])
                # are NULL for the same doc, so emit the NULL-stats row
                # (round-13 review)
                rows.append(
                    (
                        int(doc_id),
                        n,
                        int(a.sum()) if n else None,
                        int((a * a).sum()) if n else None,
                        int(a.max()) if n else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "sum_s", "sum_sq", "peak"]
            )

    decoded = src.mapInPandas(
        decode,
        schema="doc_id long, n_samples int, sum_s long, sum_sq long, peak int",
    )
    return decoded.select(
        "doc_id",
        "n_samples",
        "sum_s",
        "sum_sq",
        "peak",
        F.round(
            F.sqrt(F.col("sum_sq") / F.col("n_samples")), 4
        ).alias("rms"),
    )


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup: aHash over DECODED rasters + band join
# ---------------------------------------------------------------------------

_AH_HAM = 6  # near-dup threshold (bits differing out of 64)

_AHASH_ORACLE = f"""
WITH img AS (
  SELECT doc_id, substr(text, 1, 64 * (length(text) // 64)) AS body,
         length(text) // 64 AS h
  FROM documents WHERE length(text) >= 512
),
px AS (
  SELECT doc_id, k,
         ascii(substr(body,
               ((((k // 8) * h) // 8) * 64) + ((k % 8) * 8) + 1, 1)) AS val
  FROM img, unnest(generate_series(0, 63)) AS t(k)
),
tot AS (SELECT doc_id, SUM(val) AS total FROM px GROUP BY doc_id),
bits AS (
  SELECT p.doc_id,
         string_agg(CASE WHEN p.val * 64 > t.total THEN '1' ELSE '0' END,
                    '' ORDER BY p.k) AS ahash
  FROM px p JOIN tot t ON p.doc_id = t.doc_id
  GROUP BY p.doc_id
),
bands AS (
  SELECT doc_id, ahash, b, substr(ahash, b * 16 + 1, 16) AS band
  FROM bits, unnest(generate_series(0, 3)) AS g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, c.doc_id AS dc,
         a.ahash AS ha, c.ahash AS hc
  FROM bands a JOIN bands c
    ON a.b = c.b AND a.band = c.band AND a.doc_id <> c.doc_id
),
pairs AS (
  SELECT da, dc,
         len(list_filter(generate_series(1, 64),
             i -> substr(ha, i, 1) <> substr(hc, i, 1))) AS hamming
  FROM cand
),
agg AS (
  SELECT da AS doc_id, COUNT(*) AS n_band_mates,
         COUNT(*) FILTER (WHERE hamming <= {_AH_HAM}) AS n_near_dups,
         MIN(hamming) AS min_hamming
  FROM pairs GROUP BY da
)
SELECT b.doc_id, b.ahash,
       CAST(COALESCE(a.n_band_mates, 0) AS BIGINT) AS n_band_mates,
       CAST(COALESCE(a.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       CAST(COALESCE(a.min_hamming, 64) AS INTEGER) AS min_hamming
FROM bits b LEFT JOIN agg a ON b.doc_id = a.doc_id
"""


def _ahash_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Average-hash over the DECODED raster: sample an 8x8 grid
    (row (i*h)//8, column j*8), threshold each sample against the
    integer grid mean (val*64 > total — exact, no float mean), emit
    the 64 bits as a '0'/'1' string. A decoder that misplaced the
    raster by one byte flips bits and fails the value hash."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, raster = _decode_pgm(bytes(payload))
            vals = [
                int(raster[((k // 8) * h) // 8 * w + (k % 8) * 8])
                for k in range(64)
            ]
            total = sum(vals)
            bits = "".join(
                "1" if v * 64 > total else "0" for v in vals
            )
            rows.append((int(doc_id), bits))
        yield pd.DataFrame(rows, columns=["doc_id", "ahash"])


@query("mm_image_ahash_neardup", oracle=_AHASH_ORACLE)
def mm_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection via perceptual average-hash
    (aHash): decode every P5 payload (REAL netpbm parse in Arrow-
    batched Python, as mm_pgm_decode), compute a 64-bit aHash from an
    8x8 grid of decoded pixels, then find near-dups by LSH-style
    banding — docs sharing any 16-bit hash band are candidates, exact
    Hamming distance <= 6 marks a duplicate. Output is a per-image
    summary (hash, band-mates, near-dups, closest distance), so every
    decoded image is value-checked even when no dups exist. The
    oracle recomputes hash, banding, and Hamming from the
    pre-encoding source text.

    This is the image half of the dedup stack: the same
    band-equi-join discipline as dedup_minhash_lsh (candidates are
    band collisions, never all pairs), with the decode confined to one
    Arrow map — at 100 TB the pair space is sum over band buckets of
    bucket^2, and the raster never leaves the executor."""
    d = load(spark, sf_dir, "documents").where(F.length("text") >= 512)
    h = F.floor(F.length("text") / 64).cast("int")
    body = F.expr("substr(text, 1, 64 * (length(text) div 64))")
    payload = F.concat(
        F.lit("P5\n64 "), h.cast("string"), F.lit("\n255\n"), body
    ).cast("binary")
    bits = persisted(
        d.select("doc_id", payload.alias("payload")).mapInPandas(
            _ahash_features, schema="doc_id bigint, ahash string"
        )
    )  # consumed by both sides of the band join + the summary
    bands = bits.select(
        "doc_id",
        "ahash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.cast("int").alias("b"),
                    F.substring("ahash", b * 16 + 1, 16).alias("band"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "ahash", "bb.b", "bb.band")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("c").hint("shuffle_hash"),
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.band") == F.col("c.band"))
            & (F.col("a.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("c.doc_id").alias("dc"),
            F.col("a.ahash").alias("ha"),
            F.col("c.ahash").alias("hc"),
        )
        .distinct()
    )
    ham = F.expr(
        "size(filter(sequence(1, 64),"
        " i -> substring(ha, i, 1) != substring(hc, i, 1)))"
    )
    agg = (
        cand.select("da", ham.alias("hamming"))
        .groupBy("da")
        .agg(
            F.count(F.lit(1)).alias("n_band_mates"),
            F.count(F.when(F.col("hamming") <= _AH_HAM, 1)).alias(
                "n_near_dups"
            ),
            F.min("hamming").alias("min_hamming"),
        )
    )
    return bits.join(agg, bits["doc_id"] == agg["da"], "left").select(
        bits["doc_id"],
        "ahash",
        F.coalesce("n_band_mates", F.lit(0)).cast("bigint").alias(
            "n_band_mates"
        ),
        F.coalesce("n_near_dups", F.lit(0)).cast("bigint").alias(
            "n_near_dups"
        ),
        F.coalesce("min_hamming", F.lit(64)).cast("int").alias("min_hamming"),
    )


# ---------------------------------------------------------------------------
# applyInArrow: pyarrow-native grouped aggregation (no pandas hop)
# ---------------------------------------------------------------------------

_ARROW_GROUP_ORACLE = """
SELECT source AS media_source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(list_sum(list_transform(string_split_regex(text, ''),
                                        c -> ascii(c)))) AS BIGINT)
         AS byte_checksum,
       CAST(MAX(length(text)) AS BIGINT) AS max_doc_bytes
FROM documents
GROUP BY source
ORDER BY media_source
"""


@query("mm_arrow_group_stats", oracle=_ARROW_GROUP_ORACLE)
def mm_arrow_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow — the zero-pandas Python interop path:
    each media_source group arrives as a pyarrow.Table, the stats are
    computed with pyarrow/numpy on the raw Arrow buffers (no
    DataFrame materialization, no pandas object boxing), and a
    one-row pyarrow.Table goes back. Completes the Python-interop
    matrix alongside mapInPandas (mm_pgm_decode), applyInPandas,
    applyInPandasWithState (streaming), the Python UDTF, and the
    Python DataSource. Exact integer outputs keep the oracle strict.

    At 100 TB: same shuffle as any groupBy (one exchange on the
    group key); Arrow batches stream through the Python worker
    without a pandas conversion — the cheapest possible Python hop
    for binary-payload analytics."""
    import pyarrow as pa

    def group_stats(table: "pa.Table") -> "pa.Table":
        import numpy as np

        payloads = table.column("payload").to_pylist()
        total = sum(len(p) for p in payloads)
        checksum = int(
            sum(int(np.frombuffer(p, dtype=np.uint8).sum()) for p in payloads)
        )
        return pa.table(
            {
                "media_source": [table.column("media_source")[0].as_py()],
                "n_docs": pa.array([len(payloads)], pa.int64()),
                "total_bytes": pa.array([total], pa.int64()),
                "byte_checksum": pa.array([checksum], pa.int64()),
                "max_doc_bytes": pa.array(
                    [max(len(p) for p in payloads)], pa.int64()
                ),
            }
        )

    p = _payloads(spark, sf_dir).select("media_source", "payload")
    return (
        p.groupBy("media_source")
        .applyInArrow(
            group_stats,
            schema=(
                "media_source string, n_docs bigint, total_bytes bigint, "
                "byte_checksum bigint, max_doc_bytes bigint"
            ),
        )
        .orderBy("media_source")
    )


# ---------------------------------------------------------------------------
# scene-cut detection over the frame stream
# ---------------------------------------------------------------------------

_CUT_JUMP = 512  # mean-luminance jump (per 64-byte frame) marking a cut

_SCENE_ORACLE = f"""
WITH frames AS (
  SELECT doc_id, i AS frame_idx,
         list_sum(list_transform(
           string_split_regex(substr(text, i * 64 + 1, 64), ''),
           c -> ascii(c))) AS fsum
  FROM documents,
       unnest(generate_series(0, (length(text) // 64) - 1)) AS t(i)
  WHERE length(text) >= 256
),
jumps AS (
  SELECT doc_id, frame_idx, fsum,
         abs(fsum - LAG(fsum) OVER (PARTITION BY doc_id
                                    ORDER BY frame_idx)) AS jump
  FROM frames
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(*) FILTER (WHERE jump > {_CUT_JUMP}) AS BIGINT) AS n_cuts,
       CAST(COALESCE(MIN(frame_idx) FILTER (WHERE jump > {_CUT_JUMP}), -1)
            AS BIGINT) AS first_cut_idx,
       CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump
FROM jumps
GROUP BY doc_id
"""


@query("mm_scene_cut_detect", oracle=_SCENE_ORACLE)
def mm_scene_cut_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the frame stream — the shot-boundary
    pass a video pipeline runs before sampling frames for captioning:
    per-frame mean-luminance proxy (exact integer byte sum over each
    64-byte frame), consecutive-frame jump via a lag window, cut
    where the jump exceeds the threshold. Everything is JVM
    expressions (frame slicing, char-code sums, windows) — the Python
    decode seam is only needed when a real codec enters; the temporal
    logic is engine-native and exactly replayable. Scale: frames
    explode map-side (posexplode over a sequence), the only shuffle
    is the per-document window partition — a clip's frames sort
    locally, never globally."""
    d = load(spark, sf_dir, "documents").where(F.length("text") >= 256)
    frames = d.select(
        "doc_id",
        F.posexplode(
            F.sequence(F.lit(0), F.floor(F.length("text") / 64) - 1)
        ).alias("pos", "frame_idx"),
        F.col("text"),
    ).select(
        "doc_id",
        "frame_idx",
        F.aggregate(
            F.transform(
                F.split(
                    F.expr("substr(text, frame_idx * 64 + 1, 64)"), ""
                ),
                lambda c: F.ascii(c),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("fsum"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    jumps = frames.withColumn(
        "jump", F.abs(F.col("fsum") - F.lag("fsum").over(w))
    )
    return jumps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.count(F.when(F.col("jump") > _CUT_JUMP, 1))
        .cast("bigint")
        .alias("n_cuts"),
        F.coalesce(
            F.min(F.when(F.col("jump") > _CUT_JUMP, F.col("frame_idx"))),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("first_cut_idx"),
        F.coalesce(F.max("jump"), F.lit(0)).cast("bigint").alias("max_jump"),
    )


# ---------------------------------------------------------------------------
# audio: energy-based voice-activity detection over decoded PCM frames
# ---------------------------------------------------------------------------

_VAD_FRAME = 32  # samples per VAD frame (64 bytes of int16 PCM)

_VAD_ORACLE = f"""
WITH samp AS (
  SELECT doc_id,
         list_transform(
           generate_series(1, CAST(least(length(text), 512) // 2 AS INTEGER)),
           i -> ascii(substr(text, 2*i - 1, 1))
                + 256 * ascii(substr(text, 2*i, 1))) AS s
  FROM documents
),
fr AS (
  SELECT doc_id,
         CAST(len(s) // {_VAD_FRAME} AS INTEGER) AS n_frames,
         f,
         CAST(list_sum(list_transform(
              s[{_VAD_FRAME}*f + 1 : {_VAD_FRAME}*f + {_VAD_FRAME}],
              x -> x * x)) AS BIGINT) AS e
  FROM samp,
       unnest(generate_series(0,
              CAST(len(s) // {_VAD_FRAME} AS INTEGER) - 1)) AS t(f)
  WHERE len(s) >= {_VAD_FRAME}
),
tot AS (
  SELECT doc_id, n_frames,
         CAST(SUM(e) AS BIGINT) AS total_e,
         CAST(MAX(e) AS BIGINT) AS peak_e
  FROM fr GROUP BY doc_id, n_frames
),
act AS (
  SELECT f.doc_id, f.f
  FROM fr f JOIN tot t ON f.doc_id = t.doc_id
  WHERE f.e * t.n_frames > t.total_e
),
isl AS (
  SELECT doc_id, f,
         f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS grp
  FROM act
),
seg AS (
  SELECT doc_id,
         COUNT(*) AS n_active,
         COUNT(DISTINCT grp) AS n_segments,
         MIN(f) AS first_active
  FROM isl GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_frames AS INTEGER) AS n_frames,
       CAST(COALESCE(s.n_active, 0) AS BIGINT) AS n_active,
       CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(s.first_active, -1) AS BIGINT) AS first_active,
       t.total_e AS total_energy,
       t.peak_e AS peak_energy,
       ROUND(COALESCE(s.n_active, 0) * 1.0 / t.n_frames, 4) AS speech_ratio
FROM tot t LEFT JOIN seg s ON t.doc_id = s.doc_id
"""


@query("mm_audio_vad_energy", oracle=_VAD_ORACLE)
def mm_audio_vad_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-based voice-activity detection — the classic first pass
    of every speech-data pipeline (segment before transcribe/filter):
    the clip's PCM samples are framed (32 samples/frame), per-frame
    energy = exact integer sum of squares, a frame is speech-active
    when its energy is strictly above the clip mean (adaptive
    threshold, no tuned constant), and consecutive active frames merge
    into segments via the gaps-and-islands grouping key. Extends
    mm_audio_pcm_stats (clip-level loudness) to frame-level
    SEGMENTATION — n_segments/first_active are what a trim/split step
    consumes downstream.

    Like pcm_stats, this is a REAL decode: int16 little-endian PCM via
    numpy.frombuffer inside Arrow-batched mapInPandas; the payload is
    sliced to the 512-byte analysis window JVM-side FIRST so only 512
    bytes/row cross into Python, and the Python hop emits per-frame
    ENERGIES (8 ints/clip), never samples. ASCII payloads keep the
    high byte < 128, so signed/unsigned int16 coincide and DuckDB can
    rebuild identical samples from character codes.

    Engine-exactness: energies are exact BIGINTs (sample^2 < 2^30,
    x32 < 2^35); the threshold compare is integer cross-multiplication
    (e * n_frames > total), so no division happens before the flag;
    speech_ratio divides two small exact ints identically on both
    sides (round 4).

    100 TB reading: one payload scan, fixed 512-byte Arrow transfer
    per clip, then every aggregate/window keys on doc_id with <= 8
    frames of state per clip — scan-bound and embarrassingly parallel;
    a full-clip deployment streams frames from the same mapInPandas
    with identical downstream shape (state stays bounded by clip
    length / frame size)."""
    import numpy as np

    src = _payloads(spark, sf_dir).select(
        "doc_id", F.expr("substring(payload, 1, 512)").alias("win")
    )

    def frame_energies(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["win"]):
                n = len(buf) // 2
                a = np.frombuffer(buf[: 2 * n], dtype="<i2").astype(
                    np.int64
                )
                n_frames = n // _VAD_FRAME
                for f in range(n_frames):
                    seg = a[f * _VAD_FRAME : (f + 1) * _VAD_FRAME]
                    rows.append(
                        (int(doc_id), n_frames, f, int((seg * seg).sum()))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "f", "e"]
            )

    fr = persisted(
        src.mapInPandas(
            frame_energies,
            schema="doc_id long, n_frames int, f int, e long",
        )
        # consumed three times (clip totals, threshold pass, final
        # join lineage) — uncached, the Python PCM decode would
        # physically re-execute per consumer
    )
    tot = fr.groupBy("doc_id", "n_frames").agg(
        F.sum("e").cast("bigint").alias("total_e"),
        F.max("e").cast("bigint").alias("peak_e"),
    )
    act = (
        fr.join(tot.select("doc_id", "total_e"), "doc_id")
        .where(F.col("e") * F.col("n_frames") > F.col("total_e"))
        .select("doc_id", "f")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("f")
    isl = act.withColumn("grp", F.col("f") - F.row_number().over(w))
    seg = isl.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count_distinct("grp").alias("n_segments"),
        F.min("f").alias("first_active"),
    )
    return tot.join(seg, "doc_id", "left").select(
        "doc_id",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.coalesce(F.col("n_active"), F.lit(0))
        .cast("bigint")
        .alias("n_active"),
        F.coalesce(F.col("n_segments"), F.lit(0))
        .cast("bigint")
        .alias("n_segments"),
        F.coalesce(F.col("first_active"), F.lit(-1))
        .cast("bigint")
        .alias("first_active"),
        F.col("total_e").alias("total_energy"),
        F.col("peak_e").alias("peak_energy"),
        F.round(
            F.coalesce(F.col("n_active"), F.lit(0)) * 1.0
            / F.col("n_frames"),
            4,
        ).alias("speech_ratio"),
    )
