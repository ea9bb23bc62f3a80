"""Multimodal plumbing: schemas, Arrow batch shapes, determinism, and
the stubbed codec seam."""

import numpy as np
import pytest

from information_extraction_for_chinese_nlp_spark.operators.multimodal import (
    extract_features,
    sample_frames,
    synth_assets,
)


def test_feature_extraction_shape_and_determinism(spark):
    assets = synth_assets(spark, n=60).cache()
    feats = extract_features(assets, dim=16).toPandas()
    assert len(feats) == 60
    assert feats.feature.map(len).eq(16).all()
    # unit norm, deterministic across runs
    norms = feats.feature.map(lambda v: float(np.linalg.norm(v)))
    assert np.allclose(norms, 1.0, atol=1e-5)
    again = extract_features(assets, dim=16).toPandas()
    a = feats.sort_values("asset_id").reset_index(drop=True)
    b = again.sort_values("asset_id").reset_index(drop=True)
    assert (a.content_sha == b.content_sha).all()
    assert all(list(x) == list(y) for x, y in zip(a.feature, b.feature))


def test_frame_sampling_counts(spark):
    assets = synth_assets(spark, n=60)
    frames = sample_frames(assets, every_ms=1000).toPandas()
    vids = assets.filter("modality = 'video'").toPandas()
    expected = sum((d + 999) // 1000 for d in vids.duration_ms)
    assert len(frames) == expected
    # frame ids dense from 0 per asset
    for _, grp in frames.groupby("asset_id"):
        assert sorted(grp.frame_idx) == list(range(len(grp)))


def test_real_codec_raises_cleanly(spark):
    assets = synth_assets(spark, n=5)
    with pytest.raises(Exception) as ei:
        extract_features(assets, dim=8, codec="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
