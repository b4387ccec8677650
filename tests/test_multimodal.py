"""Multimodal column plumbing: schemas, mapInPandas batch shape, and
the REAL netpbm decode kernel (pure-numpy P5/P6 codec) replayed
driver-side against the closed-form pixel generator."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from agensgraph_spark.loader import read_table
from agensgraph_spark.pipeline import multimodal as MM

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return MM.synthesize_media(read_table(spark, SF, "documents")).cache()


def test_media_schema(media):
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    exp = [(f.name, f.dataType.simpleString()) for f in MM.MEDIA_SCHEMA.fields]
    assert got == exp
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_netpbm_codec_roundtrip():
    """encode -> decode is the identity for both P6 (rgb) and P5
    (gray), and the encoded header is the canonical public format."""
    rng = np.random.default_rng(7)
    for c in (3, 1):
        px = rng.integers(0, 256, size=(5, 9, c), dtype=np.uint8)
        payload = MM.encode_netpbm(px)
        magic = b"P6" if c == 3 else b"P5"
        assert payload.startswith(magic + b"\n9 5\n255\n")
        assert np.array_equal(MM.decode_netpbm(payload), px)
    # comment lines in the header are legal netpbm
    with_comment = b"P5\n# a comment\n2 2\n255\n\x01\x02\x03\x04"
    assert MM.decode_netpbm(with_comment).ravel().tolist() == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="netpbm"):
        MM.decode_netpbm(b"\x89PNG....")


def test_image_payloads_are_real_netpbm(media):
    """Every synthetic image payload is a decodable P6 whose dimensions
    match the metadata — the payload is self-describing; nothing in the
    decode path reads the meta struct."""
    for r in media.filter("kind = 'image'").limit(10).collect():
        px = MM.decode_netpbm(bytes(r["payload"]))
        m = r["meta"]
        assert px.shape == (m["height"], m["width"], m["channels"])
        assert m["format"] == "ppm"


def test_image_stats_deterministic(media):
    a = {r["media_id"]: (r["mean_value"], r["n_pixels"]) for r in MM.image_stats(media).collect()}
    b = {r["media_id"]: (r["mean_value"], r["n_pixels"]) for r in MM.image_stats(media).collect()}
    assert a == b and len(a) > 0
    metas = {r["media_id"]: r["meta"] for r in media.filter("kind = 'image'").collect()}
    for mid, (_, n_px) in a.items():
        m = metas[mid]
        assert n_px == m["width"] * m["height"] * m["channels"]


def test_resize_rewrites_meta_and_payload(media):
    out = MM.resize_images(media, 32, 24)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'image'").count()
    for r in rows[:5]:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24
        # the resized payload is itself a decodable netpbm image
        px = MM.decode_netpbm(bytes(r["payload"]))
        assert px.shape == (24, 32, r["meta"]["channels"])


def test_frame_index_counts(media):
    out = MM.frame_index(media, every_n=10)
    got = {r["media_id"]: r["cnt"] for r in
           out.groupBy("media_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    exp = {r["media_id"]: (r["meta"]["n_frames"] + 9) // 10 for r in
           media.filter("kind = 'video'").collect()}
    assert got == exp


def test_extract_features_shape(media):
    out = MM.extract_features(media.limit(20), dim=16).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_extract_features_images_are_content_exact(media):
    """Image features come from the REAL decode: replay the pooling
    driver-side from the closed-form pixels and match exactly."""
    rows = media.filter("kind = 'image'").limit(5).collect()
    got = {r["media_id"]: r["feature"] for r in
           MM.extract_features(media.filter("kind = 'image'").limit(5), dim=16).collect()}
    for r in rows:
        m = r["meta"]
        flat = MM._image_pixels(r["media_id"], m["width"], m["height"]) \
            .astype(np.float64).ravel()
        exp = [float(c.mean()) / 255.0 for c in np.array_split(flat, 16)]
        assert got[r["media_id"]] == pytest.approx(exp, abs=1e-12)


def test_real_decode_dispatch():
    """decode_real: netpbm decodes natively; compressed formats fail
    loudly when PIL is absent (never a silent fake)."""
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    assert np.array_equal(MM.decode_real(MM.encode_netpbm(px)), px)
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(RuntimeError, match="PIL"):
            MM.decode_real(b"\x89PNG....", "png")


def test_image_stats_match_driverside_replay(media):
    """Full-value replay: regenerate every image's pixels from the
    closed form driver-side and match ALL five statistics exactly —
    the mapInPandas result must route every payload to the right
    output row and the decode must read back exactly what the encoder
    wrote. Catches batch-boundary / column-order bugs plus any codec
    asymmetry."""
    metas = media.filter("kind = 'image'").select("media_id", "meta.width", "meta.height").collect()
    exp = {}
    for r in metas:
        px = MM._image_pixels(r["media_id"], r["width"], r["height"])
        exp[r["media_id"]] = (int(px.size), float(px.mean()), float(px.std()),
                              int(px.min()), int(px.max()))
    got = {r["media_id"]: (r["n_pixels"], r["mean_value"], r["std_value"],
                           r["min_value"], r["max_value"])
           for r in MM.image_stats(media).collect()}
    assert len(got) == len(exp) > 0
    for mid, e in exp.items():
        g = got[mid]
        assert g[0] == e[0] and g[3] == e[3] and g[4] == e[4], mid
        assert g[1] == pytest.approx(e[1], abs=1e-12)
        assert g[2] == pytest.approx(e[2], abs=1e-9)


def test_wav_codec_roundtrip():
    """encode_wav -> decode_wav is the identity for mono and stereo
    int16 PCM, and the header is canonical RIFF/WAVE."""
    rng = np.random.default_rng(11)
    for shape in ((64,), (33, 2)):
        s = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        payload = MM.encode_wav(s, 8000)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        dec, rate = MM.decode_wav(payload)
        assert rate == 8000
        assert np.array_equal(dec.reshape(s.shape if s.ndim == 2 else (-1, 1)),
                              s.reshape(-1, 1) if s.ndim == 1 else s)
    with pytest.raises(ValueError, match="RIFF"):
        MM.decode_wav(b"ID3\x04not a wav")
    # non-PCM encodings fail loudly, never silently fake samples
    bad = bytearray(MM.encode_wav(np.zeros(4, dtype=np.int16), 8000))
    bad[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError, match="PCM"):
        MM.decode_wav(bytes(bad))


def test_audio_payloads_are_real_wav(media):
    """Every synthetic audio payload is a decodable RIFF/WAV whose
    sample count and rate match the metadata, and whose samples equal
    the closed-form generator — the payload is self-describing; the
    decode path never reads the meta struct."""
    for r in media.filter("kind = 'audio'").limit(10).collect():
        samples, rate = MM.decode_wav(bytes(r["payload"]))
        m = r["meta"]
        assert rate == m["sample_rate"] == 16000
        assert samples.shape == (m["n_frames"], 1)
        exp = MM._audio_samples(r["media_id"], m["n_frames"])
        assert np.array_equal(samples.ravel(), exp)


def test_audio_stats_content_exact(media):
    """audio_stats comes from the REAL WAV decode: replay the
    statistics driver-side from the closed-form samples and match
    exactly."""
    got = {r["media_id"]: r for r in MM.audio_stats(media).collect()}
    clips = media.filter("kind = 'audio'").select("media_id").collect()
    assert len(got) == len(clips) > 0
    for r in clips[:8]:
        mid = r["media_id"]
        s = MM._audio_samples(mid, MM._audio_n_samples(mid)).astype(np.int64)
        g = got[mid]
        assert g["n_samples"] == s.size and g["sample_rate"] == 16000
        assert g["min_value"] == s.min() and g["max_value"] == s.max()
        assert g["mean_value"] == pytest.approx(s.mean(), abs=1e-9)


def test_extract_features_audio_content_exact(media):
    """Audio features come from the REAL WAV decode: replay the pooled
    amplitude means driver-side and match exactly."""
    rows = media.filter("kind = 'audio'").limit(5).collect()
    got = {r["media_id"]: r["feature"] for r in
           MM.extract_features(media.filter("kind = 'audio'").limit(5), dim=16).collect()}
    for r in rows:
        flat = MM._audio_samples(r["media_id"], r["meta"]["n_frames"]) \
            .astype(np.float64) + 32768.0
        exp = [float(c.mean()) / 65535.0 for c in np.array_split(flat, 16)]
        assert got[r["media_id"]] == pytest.approx(exp, abs=1e-12)


def test_y4m_codec_roundtrip():
    """encode_y4m -> decode_y4m is the identity and the header is
    canonical YUV4MPEG2; non-C444 colorspaces fail loudly."""
    rng = np.random.default_rng(23)
    frames = rng.integers(0, 256, size=(4, 6, 8, 3), dtype=np.uint8)
    payload = MM.encode_y4m(frames, fps=30)
    assert payload.startswith(b"YUV4MPEG2 W8 H6 F30:1 Ip A1:1 C444\n")
    dec, fps = MM.decode_y4m(payload)
    assert fps == 30 and np.array_equal(dec, frames)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        MM.decode_y4m(b"RIFF....not video")
    with pytest.raises(ValueError, match="C444"):
        MM.decode_y4m(b"YUV4MPEG2 W8 H6 F25:1 C420\nFRAME\n" + b"\0" * 72)


def test_video_payloads_are_real_y4m(media):
    """Every synthetic video payload is a decodable YUV4MPEG2 whose
    frame count and dimensions match the metadata, and whose pixels
    equal the closed-form generator — self-describing payloads; the
    decode path never reads the meta struct."""
    for r in media.filter("kind = 'video'").limit(10).collect():
        frames, fps = MM.decode_y4m(bytes(r["payload"]))
        m = r["meta"]
        assert fps == 25
        assert frames.shape == (m["n_frames"], m["height"], m["width"], 3)
        nf, h, w = MM._video_dims(r["media_id"])
        assert (nf, h, w) == (m["n_frames"], m["height"], m["width"])
        assert np.array_equal(frames, MM._video_frames(r["media_id"], nf, h, w))


def test_video_stats_content_exact(media):
    """video_stats comes from the REAL y4m decode: replay the
    statistics driver-side from the closed-form pixels and match
    exactly."""
    got = {r["media_id"]: r for r in MM.video_stats(media).collect()}
    vids = media.filter("kind = 'video'").select("media_id").collect()
    assert len(got) == len(vids) > 0
    for r in vids[:8]:
        mid = r["media_id"]
        nf, h, w = MM._video_dims(mid)
        px = MM._video_frames(mid, nf, h, w).astype(np.int64)
        g = got[mid]
        assert (g["n_frames"], g["frame_h"], g["frame_w"]) == (nf, h, w)
        assert g["min_value"] == px.min() and g["max_value"] == px.max()
        assert g["mean_value"] == pytest.approx(px.mean(), abs=1e-9)


def test_extract_features_video_content_exact(media):
    """Video features come from the REAL y4m decode: replay the pooled
    plane means driver-side and match exactly."""
    rows = media.filter("kind = 'video'").limit(5).collect()
    got = {r["media_id"]: r["feature"] for r in
           MM.extract_features(media.filter("kind = 'video'").limit(5), dim=16).collect()}
    for r in rows:
        nf, h, w = MM._video_dims(r["media_id"])
        flat = MM._video_frames(r["media_id"], nf, h, w).astype(np.float64).ravel()
        exp = [float(c.mean()) / 255.0 for c in np.array_split(flat, 16)]
        assert got[r["media_id"]] == pytest.approx(exp, abs=1e-12)
