"""Multimodal plumbing: asset synthesis, feature extraction, frame sampling."""

from pyspark.sql import functions as F

from bioie_llm_spark.multimodal.binary_ops import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synth_assets,
)


def test_synth_assets_shape(spark):
    a = synth_assets(spark, 30)
    assert a.count() == 30
    row = a.first()
    assert isinstance(row["payload"], (bytes, bytearray)) and len(row["payload"]) == 48
    kinds = {r["kind"] for r in a.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_extract_features(spark):
    feats = extract_features(synth_assets(spark, 20))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(-1.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] == 48


def test_features_deterministic(spark):
    f1 = {r["asset_id"]: tuple(r["features"]) for r in extract_features(synth_assets(spark, 10)).collect()}
    f2 = {r["asset_id"]: tuple(r["features"]) for r in extract_features(synth_assets(spark, 10).repartition(5)).collect()}
    assert f1 == f2


def test_sample_frames(spark):
    assets = synth_assets(spark, 40)
    frames = sample_frames(assets, every=5)
    vids = assets.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta.n_frames").alias("n")
    )
    expect = {r["asset_id"]: (r["n"] + 4) // 5 for r in vids.collect()}
    got = {
        r["asset_id"]: r["cnt"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == expect
    idxs = [r["frame_idx"] for r in frames.filter(F.col("asset_id") == list(expect)[0]).collect()]
    assert all(i % 5 == 0 for i in idxs)


def test_resize_images(spark):
    from bioie_llm_spark.multimodal.binary_ops import resize_images, synth_assets

    assets = synth_assets(spark, 48)
    out = resize_images(assets, width=32, height=16)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 48
    for r in rows.values():
        if r["kind"] == "image":
            assert r["width"] == 32 and r["height"] == 16
            assert len(r["payload"]) == 32 * 16  # byte-per-pixel stand-in
            assert r["meta"]["width"] == 32 and r["meta"]["height"] == 16
        else:
            # non-images pass through untouched
            assert len(r["payload"]) == 48  # 3 md5 digests
            assert r["meta"]["width"] == r["width"]
    # deterministic at any parallelism
    again = {
        r["asset_id"]: r["payload"]
        for r in resize_images(assets.repartition(7), width=32, height=16).collect()
    }
    assert all(again[k] == v["payload"] for k, v in rows.items())
