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


def test_png_codec_roundtrip_unit():
    import struct
    import zlib

    from vectrain_spark.operators.multimodal import (
        PNG_MAGIC, _decode_image, _decode_png, encode_png,
    )

    blob = encode_png(7, 5, 4)
    w, h, px = _decode_png(blob)
    assert (w, h) == (5, 4)
    want = (7 * 31 + np.arange(5 * 4 * 3, dtype=np.int64) * 7) % 256
    np.testing.assert_array_equal(px.astype(np.int64), want)
    # the sniffing decoder dispatches PNG by magic
    assert _decode_image(blob)[0] == 5

    # flipped payload bit -> CRC failure -> quarantine error
    bad = bytearray(blob)
    bad[50] ^= 0x01
    try:
        _decode_png(bytes(bad))
        raise AssertionError("corrupt PNG decoded")
    except ValueError:
        pass
    # truncated and non-PNG inputs
    for junk in (blob[:20], b"", b"\x00corrupt"):
        try:
            _decode_png(junk)
            raise AssertionError("junk decoded")
        except ValueError:
            pass

    # hand-built image exercising every filter type (Sub/Up/Avg/Paeth):
    # encode 4 rows with filters 1..4 and check reconstruction matches a
    # straightforward reference implementation
    width, height = 4, 4
    stride = width * 3
    rng = (np.arange(height * stride, dtype=np.int64) * 37 + 11) % 256
    pixels = rng.astype(np.uint8).reshape(height, stride)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y, f in enumerate([1, 2, 3, 4]):
        cur = pixels[y].astype(np.int32)
        line = np.empty(stride, np.int32)
        for i in range(stride):
            a = int(cur[i - 3]) if i >= 3 else 0
            b = int(prev[i])
            c = int(prev[i - 3]) if i >= 3 else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 255
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    filtered_blob = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w2, h2, px2 = _decode_png(filtered_blob)
    assert (w2, h2) == (width, height)
    np.testing.assert_array_equal(px2.reshape(height, stride), pixels)


def test_image_pixel_stats_operator(spark):
    from vectrain_spark.operators.multimodal import gen_media, image_pixel_stats

    out = image_pixel_stats(gen_media(spark, 30, "png")).toPandas()
    assert len(out) == 30
    ok = out[out.error.isna()]
    bad = out[out.error.notna()]
    assert set(bad.media_id) == {5, 18}  # k % 13 == 5
    row = ok[ok.media_id == 0].iloc[0]
    n = int(row.width) * int(row.height) * 3
    want = int(((0 * 31 + np.arange(n, dtype=np.int64) * 7) % 256).sum())
    assert int(row.px_sum) == want
