"""Pure-stdlib PNG/BMP codec tests: encoder/decoder round-trips over
every supported color type and scanline filter, plus hand-built golden
pixels so the decode stage's real path is verified without any image
library in the container."""
from __future__ import annotations

import numpy as np
import pytest

from hyparquet_writer_ray.functions._imagecodec import (
    decode_bmp,
    decode_png,
    decode_to_thumbnail,
    encode_bmp,
    encode_png,
    resize_nearest,
    sniff_format,
    to_gray,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4), (1, 1), (16, 3)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(shape, filter_type):
    src = _rng(sum(shape) + filter_type).integers(0, 256, shape, dtype=np.uint8)
    data = encode_png(src, filter_type=filter_type)
    assert sniff_format(data) == "png"
    out = decode_png(data)
    assert out.shape == src.shape
    assert (out == src).all()


def test_png_golden_tiny():
    """2x2 gray image through the codec, pixels asserted literally —
    independent of the encoder being self-consistent."""
    src = np.array([[0, 255], [17, 128]], np.uint8)
    out = decode_png(encode_png(src))
    assert out.tolist() == [[0, 255], [17, 128]]


def test_png_decoder_rejects_bad_inputs():
    with pytest.raises(ValueError):
        decode_png(b"JUNK")
    src = np.zeros((2, 2), np.uint8)
    data = bytearray(encode_png(src))
    data[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(data))


@pytest.mark.parametrize("shape", [(4, 6), (4, 6, 3), (3, 3), (2, 5)])
def test_bmp_roundtrip(shape):
    src = _rng(sum(shape)).integers(0, 256, shape, dtype=np.uint8)
    data = encode_bmp(src)
    assert sniff_format(data) == "bmp"
    out = decode_bmp(data)
    if src.ndim == 2:
        # encoder expands gray to RGB; decoder folds the gray palette
        # case only for 8-bit — 24-bit comes back as identical channels
        assert (out[:, :, 0] == src).all()
        assert (out[:, :, 1] == src).all()
    else:
        assert (out == src).all()


def test_bmp_row_padding_nontrivial():
    # width 3 x 24-bit = 9 bytes/row -> padded to 12; values must survive
    src = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_bmp(encode_bmp(src)) == src).all()


def test_to_gray_and_resize():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (0, 255, 0)
    rgb[1, 0] = (0, 0, 255)
    rgb[1, 1] = (100, 100, 100)
    g = to_gray(rgb)
    # ITU-R 601-2 integer luma
    assert g.tolist() == [[76, 149], [29, 100]]
    big = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(big, 4)
    assert (small == big[1::2, 1::2]).all()
    assert resize_nearest(big, 8).tolist() == big.tolist()


def test_decode_to_thumbnail_end_to_end():
    src = _rng(3).integers(0, 256, (10, 12, 3), dtype=np.uint8)
    for data in (encode_png(src), encode_bmp(src)):
        thumb = decode_to_thumbnail(data, 6)
        expect = resize_nearest(to_gray(src), 6)
        assert (thumb == expect).all()
    with pytest.raises(ValueError):
        decode_to_thumbnail(b"nope", 6)


def test_png_palette_decode():
    """Hand-built palette PNG (color type 3): decoder expands PLTE."""
    import struct
    import zlib

    from hyparquet_writer_ray.functions._imagecodec import PNG_MAGIC, _chunk

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in idx)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert out.shape == (2, 2, 3)
    assert (out == pal[idx]).all()


def test_apng_roundtrip_and_frame_sampling():
    from hyparquet_writer_ray.functions._imagecodec import (
        apng_frame_count,
        decode_apng_frames,
        encode_apng,
    )

    frames = [
        _rng(i).integers(0, 256, (6, 8, 3), dtype=np.uint8) for i in range(5)
    ]
    data = encode_apng(frames, filter_type=2)
    assert apng_frame_count(data) == 5
    got = decode_apng_frames(data, [0, 2, 4])
    for g, want in zip(got, [frames[0], frames[2], frames[4]]):
        assert (g == want).all()
    # gray frames too
    gdata = encode_apng([f[:, :, 0] for f in frames])
    assert (decode_apng_frames(gdata, [3])[0] == frames[3][:, :, 0]).all()
    # a plain PNG is a 1-frame video
    single = encode_png(frames[0])
    assert apng_frame_count(single) == 1
    assert (decode_apng_frames(single, [0, 0])[1] == frames[0]).all()
    with pytest.raises(IndexError):
        decode_apng_frames(single, [1])
    with pytest.raises(IndexError):
        decode_apng_frames(data, [5])


def test_wav_roundtrip_and_features():
    from hyparquet_writer_ray.functions.audio import (
        decode_wav,
        encode_wav,
        wav_features,
    )

    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = encode_wav(sig, rate=16000)
    rate, back = decode_wav(data)
    assert rate == 16000
    assert len(back) == 1600
    assert np.abs(back - sig).max() < 1e-3  # 16-bit quantization only
    f = wav_features(rate, back)
    assert abs(f["duration_s"] - 0.1) < 1e-9
    assert abs(f["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 0.5) < 1e-3
    # 440 Hz -> 2*440 crossings/sec -> zcr ~ 880/16000
    assert abs(f["zcr"] - 880 / 16000) < 0.01
    with pytest.raises(ValueError):
        decode_wav(b"not audio")


def test_wav_stereo_and_8bit():
    import struct

    from hyparquet_writer_ray.functions.audio import decode_wav, encode_wav

    # stereo: interleave two channels manually on top of the mono encoder
    left = np.full(100, 0.5)
    right = np.full(100, -0.5)
    inter = np.empty(200)
    inter[0::2] = left
    inter[1::2] = right
    mono = encode_wav(inter, rate=8000)
    # patch n_channels=2 in the fmt chunk (offset 22) and rate fields
    b = bytearray(mono)
    struct.pack_into("<H", b, 22, 2)
    rate, x = decode_wav(bytes(b))
    assert np.abs(x).max() < 1e-2  # L+R average to ~0


# ---------------------------------------------------------------------------
# hypothesis fuzz: any uint8 image round-trips through both codecs
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    ch = draw(st.sampled_from([None, 3, 4]))
    shape = (h, w) if ch is None else (h, w, ch)
    seed = draw(st.integers(0, 2**32 - 1))
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@settings(max_examples=60, deadline=None)
@given(img=_images(), filter_type=st.integers(0, 4))
def test_fuzz_png_roundtrip(img, filter_type):
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(max_examples=40, deadline=None)
@given(img=_images())
def test_fuzz_bmp_roundtrip(img):
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[:, :, :3]
    out = decode_bmp(encode_bmp(img))
    want = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    assert (out == want).all()


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_fuzz_apng_frames(data):
    from hyparquet_writer_ray.functions._imagecodec import (
        decode_apng_frames, encode_apng,
    )

    n = data.draw(st.integers(1, 6))
    h = data.draw(st.integers(1, 12))
    w = data.draw(st.integers(1, 12))
    seed = data.draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    ft = data.draw(st.integers(0, 4))
    payload = encode_apng(frames, filter_type=ft)
    idx = data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=4))
    got = decode_apng_frames(payload, idx)
    for g, i in zip(got, idx):
        assert (g == frames[i]).all()
