"""Compressed text-column ingestion: gzip / zlib / raw-deflate payloads
decoded Arrow-batch-side.

Web-scale corpora arrive compressed (WARC members are gzip; many
pipelines store zlib- or deflate-packed text columns). The adapter
keeps the container opaque in the DataFrame (a binary column) and
decodes inside mapInPandas — stdlib ``zlib`` only, one C call per
document, no per-character Python. Rows that fail to decode come back
NULL with a reason column instead of failing the job (the malformed-line
policy of the raw readers, readers.py:205).

Format sniff: gzip = 1f 8b; zlib = 0x78 second-nibble checkable header
(78 01 / 5e / 9c / da); anything else is tried as raw deflate before
reporting undecodable. Sniffing is per row — mixed-container corpora
decode in one pass.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["sniff_compression", "decompress_bytes", "decode_compressed_text"]

_ZLIB_SECOND = {0x01, 0x5E, 0x9C, 0xDA}


def sniff_compression(payload: bytes | None) -> str:
    if not payload or len(payload) < 2:
        return "empty"
    if payload[0] == 0x1F and payload[1] == 0x8B:
        return "gzip"
    if payload[0] == 0x78 and payload[1] in _ZLIB_SECOND:
        return "zlib"
    return "deflate?"


def decompress_bytes(payload: bytes | None) -> tuple[bytes | None, str]:
    """-> (decoded bytes | None, codec-or-reason). Never raises."""
    kind = sniff_compression(payload)
    if kind == "empty":
        return None, "empty"
    try:
        if kind == "gzip":
            return zlib.decompress(payload, wbits=16 + zlib.MAX_WBITS), "gzip"
        if kind == "zlib":
            return zlib.decompress(payload), "zlib"
        return zlib.decompress(payload, wbits=-zlib.MAX_WBITS), "deflate"
    except zlib.error:
        return None, "undecodable"


def decode_compressed_text(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "text",
    encoding: str = "utf-8",
) -> DataFrame:
    """Adds ``out_col`` (decoded string, NULL on failure) and
    ``<out_col>_codec`` (gzip | zlib | deflate | empty | undecodable |
    baddecode). One Arrow batch pass, no shuffle."""
    codec_col = f"{out_col}_codec"
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{fields}, `{out_col}` string, `{codec_col}` string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, codecs = [], []
            for p in pdf[payload_col]:
                raw, codec = decompress_bytes(None if p is None else bytes(p))
                if raw is None:
                    texts.append(None)
                else:
                    try:
                        texts.append(raw.decode(encoding))
                    except UnicodeDecodeError:
                        texts.append(None)
                        codec = "baddecode"
                codecs.append(codec)
            pdf = pdf.copy()
            pdf[out_col] = texts
            pdf[codec_col] = codecs
            yield pdf

    return df.mapInPandas(fn, schema)
