"""Multimodal plumbing: container round-trips, probe/feature/resize/sample stages,
stubbed real codecs."""
import numpy as np
import pyarrow as pa
import pytest

from janet_ray.stages import media


def _img(w, h, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w)).astype(np.uint8)


def test_jimg_roundtrip():
    img = _img(17, 9)
    assert np.array_equal(media.decode_jimg(media.encode_jimg(img)), img)


def test_jaud_roundtrip():
    s = (np.sin(np.linspace(0, 20, 500)) * 10000).astype(np.int16)
    assert np.array_equal(media.decode_jaud(media.encode_jaud(s)), s)


def test_jvid_roundtrip():
    frames = [_img(8, 6, i) for i in range(5)]
    back = media.decode_jvid(media.encode_jvid(frames))
    assert len(back) == 5
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))


def test_truncated_payloads_raise():
    with pytest.raises(media.MediaFormatError):
        media.decode_jimg(media.encode_jimg(_img(4, 4))[:-3])
    with pytest.raises(media.MediaFormatError):
        media.decode_jaud(b"JAUD\xff\xff\xff\xff")
    with pytest.raises(media.MediaFormatError):
        media.decode_jvid(b"JVID\x02\x00junk")


def test_standard_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        media._decode_standard(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(media.MediaFormatError):
        media._decode_standard(b"\x00\x00garbage")


def _media_table():
    return pa.table({
        "id": [0, 1, 2, 3, 4],
        "media": [
            media.encode_jimg(_img(16, 12)),
            media.encode_jaud(np.arange(-50, 50).astype(np.int16)),
            media.encode_jvid([_img(6, 6, i) for i in range(4)]),
            b"\x89PNG\r\n\x1a\nxxxx",   # real format → stubbed
            b"",                         # empty → error row
        ],
    })


def test_probe_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_table())
    out = ds.map_batches(media.MediaProbeStage, batch_format="pyarrow",
                         concurrency=1).take_all()
    by_id = {r["id"]: r["media_meta"] for r in out}
    assert by_id[0] == dict(format="jimg", width=16, height=12, n_frames=1,
                            n_samples=0, ok=True, error="")
    assert by_id[1]["format"] == "jaud" and by_id[1]["n_samples"] == 100
    assert by_id[2]["format"] == "jvid" and by_id[2]["n_frames"] == 4
    assert not by_id[3]["ok"] and by_id[3]["error"].startswith("stub:")
    assert not by_id[4]["ok"] and by_id[4]["error"] == "empty payload"


def test_feature_resize_sample_audio_stages(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_table())
    feat = ds.map_batches(media.ImageFeatureStage, batch_format="pyarrow",
                          concurrency=1).take_all()
    f0 = next(r for r in feat if r["id"] == 0)["features"]
    assert len(f0) == 18 and abs(sum(f0[:16]) - 1.0) < 1e-9

    rs = ds.map_batches(media.ImageResizeStage, batch_format="pyarrow",
                        concurrency=1).take_all()
    r0 = next(r for r in rs if r["id"] == 0)["media_resized"]
    assert media.decode_jimg(r0).shape == (32, 32)
    assert next(r for r in rs if r["id"] == 4)["media_resized"] is None

    fs = ds.map_batches(media.FrameSampleStage, batch_format="pyarrow",
                        concurrency=1).take_all()
    assert len(next(r for r in fs if r["id"] == 2)["frames"]) == 2  # stride 2 of 4

    au = ds.map_batches(media.AudioFeatureStage, batch_format="pyarrow",
                        concurrency=1).take_all()
    a1 = next(r for r in au if r["id"] == 1)
    assert a1["n_samples"] == 100 and a1["zero_crossings"] == 1 and a1["rms"] > 0
