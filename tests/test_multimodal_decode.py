"""The real-decoder branch of the multimodal plumbing.

`_decode_pgm` is an actual binary-netpbm (P5) parser; these tests feed
it hand-built images (known pixels) both directly and through the
Arrow `mapInPandas` feature path, so the decode branch — not the raw
byte fallback — is what's exercised. The registered `mm_pgm_decode`
query additionally value-checks the decoder against DuckDB at corpus
scale via the standard oracle gate.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_service_spark.llm.multimodal import (
    _decode_payload,
    _decode_pgm,
    _featurizer,
    _try_real_decoder,
)


def _pgm(w: int, h: int, pixels: bytes) -> bytes:
    assert len(pixels) == w * h
    return b"P5\n%d %d\n255\n" % (w, h) + pixels


def test_decoder_seam_reports_real_path():
    assert _try_real_decoder() in ("pil", "pgm")


def test_pgm_roundtrip_exact_pixels():
    pixels = bytes(range(12))
    w, h, raster = _decode_pgm(_pgm(4, 3, pixels))
    assert (w, h) == (4, 3)
    assert raster.tolist() == list(range(12))
    assert raster.dtype == np.uint8


def test_pgm_header_not_counted_as_pixels():
    # header contains a '2' and '5' etc. — if the parser misplaced the
    # raster offset, these would leak into the pixel stats
    pixels = bytes([200] * 6)
    _, _, raster = _decode_pgm(_pgm(2, 3, pixels))
    assert raster.min() == raster.max() == 200


def test_pgm_malformed_raises():
    with pytest.raises(ValueError):
        _decode_pgm(b"JFIF....")
    with pytest.raises(ValueError):
        _decode_pgm(b"P5\n4 4\n255\nxy")  # truncated raster
    with pytest.raises(ValueError):
        _decode_pgm(b"P5\n2 2\n65535\n\x00\x00\x00\x00")  # 16-bit


def test_decode_payload_branches():
    img = _pgm(2, 2, bytes([1, 2, 3, 4]))
    assert _decode_payload(img, decode=True).tolist() == [1, 2, 3, 4]
    # raw view keeps the header bytes; decode is never magic-sniffed
    raw = _decode_payload(img, decode=False)
    assert raw[:2].tobytes() == b"P5" and raw.size == len(img)


def test_featurizer_decode_branch_through_arrow_path():
    import pandas as pd

    img = _pgm(3, 2, bytes([10, 20, 30, 40, 50, 62]))
    batch = pd.DataFrame({"doc_id": [7], "payload": [img]})
    [out] = list(_featurizer(decode=True)([batch]))
    row = out.iloc[0]
    assert row["n_bytes"] == 6  # decoded raster, not payload+header
    assert row["mean_byte"] == 35.3333
    assert row["min_byte"] == 10 and row["max_byte"] == 62
    # raw path on the same payload sees the header too
    [raw] = list(_featurizer(decode=False)([batch]))
    assert raw.iloc[0]["n_bytes"] == len(img)


def test_mm_pgm_decode_query_runs(spark):
    from hive_service_spark.registry import load_all
    from tests.conftest import SF_DIR

    df = load_all()["mm_pgm_decode"].fn(spark, SF_DIR)
    rows = df.limit(5).collect()
    assert rows and all(r["width"] == 64 and r["height"] >= 1 for r in rows)
