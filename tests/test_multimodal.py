"""Multimodal binary-column plumbing: schema, determinism, quarantine."""

from __future__ import annotations

import numpy as np

from vectrain_spark.operators.multimodal import (
    audio_frame_sample,
    fake_image,
    gen_media,
    image_features,
)


def test_image_features(spark):
    media = gen_media(spark, 100, kind="image")
    out = image_features(media).toPandas()
    assert len(out) == 100
    bad = out[out["error"].notna()]
    good = out[out["error"].isna()]
    # every 13th row is corrupt by construction
    assert set(bad["media_id"]) == {i for i in range(100) if i % 13 == 5}
    assert (good["width"] >= 16).all() and (good["height"] >= 16).all()
    # features are unit-norm 64-d
    feats = np.stack(good["feature"].values)
    assert feats.shape[1] == 64
    assert np.allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-5)


def test_image_features_deterministic_across_partitioning(spark):
    a = image_features(gen_media(spark, 50).repartition(1)).toPandas()
    b = image_features(gen_media(spark, 50).repartition(7)).toPandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert a.drop(columns=["feature"]).equals(b.drop(columns=["feature"]))
    for x, y in zip(a["feature"], b["feature"]):
        if x is None or y is None:
            assert x is None and y is None
        else:
            assert list(x) == list(y)


def test_audio_frame_sample(spark):
    media = gen_media(spark, 60, kind="audio")
    out = audio_frame_sample(media, n_frames=8).toPandas()
    good = out[out["error"].isna()]
    assert (good["sample_rate"] == 16000).all()
    assert all(len(f) == 8 for f in good["frames"])
    assert set(out.loc[out["error"].notna(), "media_id"]) == {
        i for i in range(60) if i % 13 == 5
    }


def test_fake_image_roundtrip_unit():
    from vectrain_spark.operators.multimodal import _decode_image

    blob = fake_image(7, 32, 48)
    w, h, px = _decode_image(blob)
    assert (w, h) == (32, 48)
    assert len(px) == min(32 * 48, 4096)
    try:
        _decode_image(b"nope")
        raise AssertionError("should have raised")
    except ValueError:
        pass
