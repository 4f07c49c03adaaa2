"""sources/compressed: per-row mixed-container decode (gzip/zlib/deflate),
malformed-payload policy, and batch-shape preservation."""

from __future__ import annotations

import gzip
import zlib

from bioie_llm_spark.sources.compressed import (
    decode_compressed_text,
    decompress_bytes,
    sniff_compression,
)

def _deflate(data: bytes) -> bytes:
    c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    return c.compress(data) + c.flush()


def test_sniff():
    assert sniff_compression(gzip.compress(b"x")) == "gzip"
    assert sniff_compression(zlib.compress(b"x")) == "zlib"
    assert sniff_compression(_deflate(b"x")) == "deflate?"
    assert sniff_compression(None) == "empty"
    assert sniff_compression(b"") == "empty"


def test_decompress_bytes_roundtrips():
    payload = b"the quick brown fox" * 20
    assert decompress_bytes(gzip.compress(payload)) == (payload, "gzip")
    assert decompress_bytes(zlib.compress(payload)) == (payload, "zlib")
    assert decompress_bytes(_deflate(payload)) == (payload, "deflate")
    assert decompress_bytes(b"\x00\x01junk")[0] is None


def test_decode_compressed_text_mixed_batch(spark):
    rows = [
        (0, gzip.compress("hello gzip world".encode())),
        (1, zlib.compress("zlib packed doc".encode())),
        (2, _deflate("raw deflate text".encode())),
        (3, b"\x00\x01garbage not compressed"),
        (4, None),
        (5, gzip.compress(b"\xff\xfe not utf8 \x80\x81")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["text"], r["text_codec"])
        for r in decode_compressed_text(df).collect()
    }
    assert got[0] == ("hello gzip world", "gzip")
    assert got[1] == ("zlib packed doc", "zlib")
    assert got[2] == ("raw deflate text", "deflate")
    assert got[3] == (None, "undecodable")
    assert got[4] == (None, "empty")
    assert got[5] == (None, "baddecode")
    # original columns preserved
    assert set(decode_compressed_text(df).columns) == {
        "doc_id", "payload", "text", "text_codec",
    }


def test_partitioning_invariance(spark):
    rows = [(i, gzip.compress(f"doc {i}".encode())) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    a = sorted(tuple(r) for r in decode_compressed_text(df).drop("payload").collect())
    b = sorted(
        tuple(r)
        for r in decode_compressed_text(df.repartition(7)).drop("payload").collect()
    )
    assert a == b and len(a) == 40
