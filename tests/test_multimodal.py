"""Multimodal binary-column plumbing: schema, determinism, quarantine."""

from __future__ import annotations

import numpy as np

from vectrain_spark.operators.multimodal import (
    audio_frame_sample,
    encode_bmp,
    encode_wav,
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


def test_bmp_codec_roundtrip_unit():
    """Real-format codec (VERDICT r2 ask #4): the BMP encoder's bytes must
    decode with the stdlib parser AND the parser must handle padding (w=31
    forces a 3-byte row pad), truncation, and garbage."""
    from vectrain_spark.operators.multimodal import _decode_image

    for w, h in ((32, 48), (31, 7), (16, 16)):
        blob = encode_bmp(7, w, h)
        got_w, got_h, px = _decode_image(blob)
        assert (got_w, got_h) == (w, h)
        assert len(px) == w * 3 * h  # padding stripped
        assert len(blob) == 54 + ((w * 3 + 3) // 4 * 4) * h
    import pytest

    with pytest.raises(ValueError):
        _decode_image(b"nope")
    with pytest.raises(ValueError):
        _decode_image(encode_bmp(7, 32, 48)[:-10])  # truncated payload


def test_wav_codec_roundtrip_unit():
    from vectrain_spark.operators.multimodal import _decode_audio

    blob = encode_wav(3, 16000, 1234)
    sr, n, samples = _decode_audio(blob)
    assert (sr, n) == (16000, 1234)
    assert samples.dtype.str == "<i2" and len(samples) == 1234
    assert len(blob) == 44 + 2 * 1234
    import pytest

    with pytest.raises(ValueError):
        _decode_audio(b"RIFFxxxxNOPE")
    # non-PCM format tag rejected
    bad = bytearray(blob)
    bad[20] = 3  # fmt = IEEE float
    with pytest.raises(ValueError):
        _decode_audio(bytes(bad))
