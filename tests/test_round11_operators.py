"""Round-11 additions: advice-fix regressions + new operator value checks."""

from __future__ import annotations

import pytest

from jaffle_shop_classic_spark.operators.catalog import load_catalog


def test_decode_stub_degrades_gracefully_on_corrupt_png(spark):
    """Round-10 advice fix: a truncated/corrupt payload carrying a valid
    PNG signature must fall through to the deterministic fake branch
    instead of raising struct.error/zlib.error and failing the query."""
    from jaffle_shop_classic_spark.operators.multimodal import (
        DECODE_SCHEMA,
        decode_stub_batch,
        png_encode,
    )

    png = png_encode(5, 4, bytes(range(60)))
    truncated = png[:20]  # signature intact, IHDR/IDAT gone
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF  # garble the IDAT stream
    df = spark.createDataFrame(
        [(1, bytearray(truncated)), (2, bytes(corrupt)), (3, bytearray(png))],
        "doc_id long, payload binary",
    )
    rows = {
        r["doc_id"]: r
        for r in df.mapInPandas(decode_stub_batch, DECODE_SCHEMA).collect()
    }
    # 1 and 2 take the fake branch: geometry derives from byte length
    assert rows[1]["width"] == len(truncated) % 640
    assert rows[2]["width"] == len(corrupt) % 640
    # the intact payload still decodes for real
    assert (rows[3]["width"], rows[3]["height"]) == (5, 4)
