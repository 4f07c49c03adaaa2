"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media decode is STUBBED — this
container ships no PIL/ffmpeg — behind an import-try. With libraries absent
the operators run a deterministic fake decode (payload-hash-derived
features) so pipelines are testable end-to-end; with libraries present the
marked branch would do the real work.

Asset payloads are themselves deterministic (md5-chain bytes from the
asset id), so feature vectors and frame samples are reproducible at any
parallelism.
"""

from __future__ import annotations

import hashlib
import warnings
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _real_decode(op: str, *args):  # pragma: no cover - plug point
    """The real-media plug point: implement with PIL/ffmpeg and the
    operators below pick it up automatically (they try this first whenever
    PIL is importable). Until implemented it signals NotImplementedError
    and callers FALL BACK to the deterministic stub — installing Pillow
    must never turn a working pipeline into a hard failure (ADVICE r2)."""
    raise NotImplementedError(op)


def _stub_fallback(op: str):  # warn once per executor per operator
    if op not in _stub_fallback._warned:  # type: ignore[attr-defined]
        _stub_fallback._warned.add(op)  # type: ignore[attr-defined]
        warnings.warn(
            f"multimodal.{op}: real decode unimplemented; using deterministic stub"
        )


_stub_fallback._warned = set()  # type: ignore[attr-defined]

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)
FEATURE_DIM = 16

FEATURES_SCHEMA = f"asset_id long, kind string, n_bytes int, features array<float>"
FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_sha string"


def synth_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic opaque assets: payload = unhex(md5-chain of asset id),
    kind and metadata hash-assigned. Pure expressions."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    kind = F.element_at(kinds, F.pmod(F.xxhash64("id", F.lit(1)), F.lit(3)).cast("int") + 1)
    payload = F.unhex(
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5(F.concat(F.lit("p2|"), F.col("id").cast("string"))),
            F.md5(F.concat(F.lit("p3|"), F.col("id").cast("string"))),
        )
    )
    meta = F.struct(
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(512)) + 16).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(30)) + 1).cast("int").alias("n_frames"),
    )
    return spark.range(n).select(
        F.col("id").alias("asset_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoded' feature vector: md5-expanded bytes of the
    payload mapped to [-1, 1]. Stands in for a real image/audio encoder."""
    out: list[float] = []
    seed = payload or b""
    i = 0
    while len(out) < dim:
        h = hashlib.md5(seed + i.to_bytes(2, "big")).digest()
        out.extend(b / 127.5 - 1.0 for b in h[:4])
        i += 1
    return out[:dim]


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. Tries the real
    decode (_real_decode) when PIL is importable; falls back to the
    deterministic fake with a one-time warning while that plug point is
    unimplemented."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = None
            if _HAS_PIL:  # pragma: no cover - real decode path, not in container
                try:
                    feats = [_real_decode("extract_features", p) for p in pdf["payload"]]
                except NotImplementedError:
                    _stub_fallback("extract_features")
            if feats is None:
                feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(fn, FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id long, kind string, width int, height int, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)


def resize_images(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize as an Arrow-batched map: images get a new payload sized
    for the target box and updated metadata; non-image assets pass through
    untouched (payload and meta preserved). Real resampling is gated on PIL
    like the other decode steps; the deterministic stand-in derives the
    resized payload from sha256(payload | WxH) truncated/cycled to
    width*height bytes — byte-per-pixel, so downstream size accounting and
    schema handling are exercised for real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_PIL:  # pragma: no cover - real resample path, not in container
                try:
                    yield _real_decode("resize_images", pdf, width, height)
                    continue
                except NotImplementedError:
                    _stub_fallback("resize_images")
            payloads, widths, heights = [], [], []
            for kind, payload, mw, mh in zip(
                pdf["kind"], pdf["payload"], pdf["meta_width"], pdf["meta_height"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    widths.append(mw)
                    heights.append(mh)
                    continue
                n = width * height
                seed = hashlib.sha256(
                    (payload or b"") + f"|{width}x{height}".encode()
                ).digest()
                buf = bytearray()
                i = 0
                while len(buf) < n:
                    buf.extend(
                        hashlib.sha256(seed + i.to_bytes(4, "big")).digest()
                    )
                    i += 1
                payloads.append(bytes(buf[:n]))
                widths.append(width)
                heights.append(height)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "width": widths,
                    "height": heights,
                    "payload": payloads,
                }
            )

    flat = assets.select(
        "asset_id", "kind", "payload",
        F.col("meta.width").alias("meta_width"),
        F.col("meta.height").alias("meta_height"),
    )
    resized = flat.mapInPandas(
        fn, "asset_id long, kind string, width int, height int, payload binary"
    )
    # re-attach full typed metadata with the new dimensions (JVM-side)
    return resized.join(
        assets.select("asset_id", F.col("meta").alias("orig_meta")), "asset_id"
    ).select(
        "asset_id", "kind", "width", "height", "payload",
        F.struct(
            F.col("width").alias("width"),
            F.col("height").alias("height"),
            F.col("orig_meta.sample_rate").alias("sample_rate"),
            F.col("orig_meta.n_frames").alias("n_frames"),
        ).alias("meta"),
    )


def sample_frames(assets: DataFrame, every: int = 5) -> DataFrame:
    """Video frame sampling as a flat-map: one output row per sampled frame
    index (0, every, 2*every, ... < n_frames); frame content stubbed as the
    sha of (payload, frame_idx)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload, n_frames in zip(
                pdf["asset_id"], pdf["payload"], pdf["n_frames"]
            ):
                for idx in range(0, int(n_frames), every):
                    sha = hashlib.sha256(
                        (payload or b"") + idx.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append((aid, idx, sha))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_sha"])

    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.mapInPandas(fn, FRAMES_SCHEMA)
