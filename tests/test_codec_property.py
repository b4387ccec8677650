"""Property-based round-trips for the pure-numpy media codecs
(netpbm, RIFF/WAV, YUV4MPEG2) — random shapes/contents via hypothesis,
plus hand-built container edge cases the fixtures never produce
(extra RIFF chunks, odd-size chunk padding, y4m FRAME parameters)."""

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from agensgraph_spark.pipeline import multimodal as MM


@settings(max_examples=60, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), c=st.sampled_from([1, 3]),
       seed=st.integers(0, 2**31))
def test_netpbm_roundtrip_property(h, w, c, seed):
    px = np.random.default_rng(seed).integers(0, 256, size=(h, w, c),
                                              dtype=np.uint8)
    assert np.array_equal(MM.decode_netpbm(MM.encode_netpbm(px)), px)


@settings(max_examples=60, deadline=None)
@given(n=st.integers(1, 500), ch=st.sampled_from([1, 2]),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, ch, rate, seed):
    s = np.random.default_rng(seed).integers(-32768, 32768, size=(n, ch),
                                             dtype=np.int16)
    dec, got_rate = MM.decode_wav(MM.encode_wav(s, rate))
    assert got_rate == rate and np.array_equal(dec, s)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 6), h=st.integers(1, 12), w=st.integers(1, 12),
       fps=st.sampled_from([24, 25, 30]), seed=st.integers(0, 2**31))
def test_y4m_roundtrip_property(n, h, w, fps, seed):
    frames = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8)
    dec, got_fps = MM.decode_y4m(MM.encode_y4m(frames, fps=fps))
    assert got_fps == fps and dec.shape == frames.shape
    assert np.array_equal(dec, frames)


def test_wav_chunk_walk_handles_extra_and_odd_chunks():
    """The RIFF chunk walk must skip unknown chunks and honor the
    word-alignment pad byte after odd-size chunks — real WAV files
    carry LIST/INFO chunks the canonical encoder never emits."""
    s = np.arange(-8, 8, dtype=np.int16)[:, None]
    canonical = MM.encode_wav(s, 8000)
    fmt_chunk = canonical[12:36]          # "fmt " + size + 16 bytes
    data_chunk = canonical[36:]           # "data" + size + payload
    odd = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # 5 bytes + pad
    body = fmt_chunk + odd + data_chunk
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    dec, rate = MM.decode_wav(payload)
    assert rate == 8000 and np.array_equal(dec, s)
    # chunk order must not matter either: data before fmt
    body2 = data_chunk + fmt_chunk
    payload2 = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"WAVE" + body2
    dec2, _ = MM.decode_wav(payload2)
    assert np.array_equal(dec2, s)


def test_y4m_frame_params_fall_back_to_loop():
    """FRAME lines may carry parameters (e.g. 'FRAME Ixyz\\n'): the
    vectorized fixed-record fast path must detect the size mismatch and
    the loop parser must still decode every frame."""
    frames = np.random.default_rng(3).integers(
        0, 256, size=(2, 2, 3, 3), dtype=np.uint8)
    canonical = MM.encode_y4m(frames, fps=25)
    parts = canonical.split(b"FRAME\n")
    assert len(parts) == 3
    with_params = parts[0] + b"FRAME\n" + parts[1] + b"FRAME Ixyz\n" + parts[2]
    dec, _ = MM.decode_y4m(with_params)
    assert np.array_equal(dec, frames)
