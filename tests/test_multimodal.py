"""Multimodal plumbing: schema, batch shape, determinism of the stubbed
decode (the Spark-side contract is real even though the codec is fake)."""

from __future__ import annotations

from detecting_and_addressing_change_spark.multimodal.binary_ops import (
    extract_features,
    synth_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["feat_dim"] == 16 and len(r["feature"]) == 16 for r in rows)
    # deterministic: same payload -> same feature
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(
        synth_media(spark, n=30), dim=16).collect()}
    for r in rows:
        assert rows2[r["media_id"]] == r["feature"]


def test_metadata_only_ops_never_touch_bytes(spark):
    media = synth_media(spark, n=64)
    wide = media.filter("meta.width is not null and meta.width > 100")
    # column pruning: the binary column must not appear in the read schema
    assert wide.select("media_id", "meta.width").count() > 0
