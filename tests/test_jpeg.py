"""Unit tests for the pure numpy/stdlib baseline JPEG codec and the
MJPEG-in-AVI container (functions/jpeg.py).

Ground-truth strategy (no third-party JPEG library exists in this
container to compare against): every spec-derived table is re-derived
independently inside the tests (zigzag from the diagonal-walk rule, DCT
matrix orthonormality, Huffman canonical-code prefix property), and the
transform path is pinned by DC-exactness — constant blocks with even
offsets from 128 must survive encode→decode BIT-EXACTLY at quality 50,
which exercises entropy coding, zigzag, quantization, and IDCT with zero
tolerance. Lossy paths are bounded on smooth images where quantization
error is analyzable.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bi_gcp_stitch_repl_spark.functions import jpeg


def test_dct_matrix_is_orthonormal():
    a = jpeg._A
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)
    # perfect inversion: IDCT(DCT(x)) == x
    x = np.random.default_rng(3).uniform(-128, 127, (8, 8))
    assert np.allclose(a.T @ (a @ x @ a.T) @ a, x, atol=1e-9)


def test_zigzag_matches_diagonal_walk_rule():
    """T.81 Figure A.6: odd diagonals run top-right→bottom-left (row
    ascending), even diagonals the reverse — derived independently."""
    order = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda p: (p[0] + p[1], p[0] if (p[0] + p[1]) % 2 else p[1]),
    )
    assert jpeg.ZIGZAG == [i * 8 + j for i, j in order]


def test_huffman_codes_are_prefix_free_and_canonical():
    for table in (
        jpeg.HUFF_DC_LUMA, jpeg.HUFF_DC_CHROMA,
        jpeg.HUFF_AC_LUMA, jpeg.HUFF_AC_CHROMA,
    ):
        codes = jpeg._build_codes(*table)
        assert len(codes) == sum(table[0])
        seen = set()
        for sym, (code, length) in codes.items():
            bits = format(code, f"0{length}b")
            for p in seen:
                assert not bits.startswith(p) and not p.startswith(bits)
            seen.add(bits)


def test_bitreader_inverts_bitwriter_with_stuffing():
    rng = np.random.default_rng(11)
    w = jpeg._BitWriter()
    vals = [(int(rng.integers(0, 1 << n)), n) for n in rng.integers(1, 17, 100)]
    for v, n in vals:
        w.write(v, n)
    r = jpeg._BitReader(w.flush())
    for v, n in vals:
        assert r.read_bits(n) == v


def test_constant_gray_roundtrip_exact_at_q50():
    """Even offsets from 128 make the DC quantization exact at Q00=16 —
    the whole entropy/zigzag/dequant/IDCT chain must be bit-exact."""
    for v in (78, 128, 130, 176):
        img = np.full((16, 24), v, np.uint8)
        out, mode = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=50))
        assert mode == "L" and out.shape == (16, 24, 1)
        assert (out[:, :, 0] == v).all()


def test_nonaligned_dims_pad_and_crop_exactly():
    img = np.full((13, 19), 130, np.uint8)  # not multiples of 8
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=50))
    assert out.shape == (13, 19, 1) and (out[:, :, 0] == 130).all()


def test_smooth_gradient_error_bounded():
    x = np.linspace(0, 255, 32)
    img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 6


def test_rgb_444_and_420_roundtrip_bounded():
    rgb = np.zeros((24, 16, 3), np.uint8)
    rgb[:, :, 0] = np.linspace(20, 230, 16)[None, :]
    rgb[:, :, 1] = np.linspace(230, 20, 24)[:, None]
    rgb[:, :, 2] = 90
    out, mode = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=90))
    assert mode == "RGB"
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12
    out, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=90, subsample=True))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 40


@settings(max_examples=20, deadline=None)
@given(
    v=st.integers(0, 63),
    h=st.integers(1, 3),
    w=st.integers(1, 3),
    nf=st.integers(1, 4),
)
def test_avi_mjpeg_container_roundtrip_property(v, h, w, nf):
    """Any stack of DC-exact constant frames survives AVI mux → demux →
    JPEG decode bit-exactly, at any block-multiple dims / frame count."""
    fill = 128 + 2 * (v - 32)  # even offset, in [64, 190]
    frames = [
        np.full((8 * h, 8 * w), (fill + 2 * f) % 250, np.uint8)
        for f in range(nf)
    ]
    avi = jpeg.encode_avi_mjpeg(
        [jpeg.encode_jpeg(f, quality=50) for f in frames], 8 * w, 8 * h
    )
    dec = list(jpeg.iter_avi_mjpeg_frames(avi))
    assert len(dec) == nf
    for d, f in zip(dec, frames):
        assert d.shape == (8 * h, 8 * w, 1) and np.array_equal(d[:, :, 0], f)


def test_sniff_video_frames_dispatches_both_containers():
    from bi_gcp_stitch_repl_spark.functions import codecs

    y4m = codecs.encode_y4m([np.full((4, 4), 9, np.uint8)])
    assert len(list(jpeg.sniff_video_frames(y4m))) == 1
    avi = jpeg.encode_avi_mjpeg(
        [jpeg.encode_jpeg(np.full((8, 8), 130, np.uint8), quality=50)], 8, 8
    )
    assert len(list(jpeg.sniff_video_frames(avi))) == 1
    with pytest.raises(ValueError):
        list(jpeg.sniff_video_frames(b"\x00\x01\x02"))


def test_decode_rejects_progressive_and_garbage():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x89PNG\r\n")
    # forge an SOF2 (progressive) header: SOI + minimal SOF2 segment
    bad = b"\xff\xd8" + b"\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bad)


def test_jpeg_reaches_image_seam_via_sniff():
    from bi_gcp_stitch_repl_spark.functions import codecs

    img = np.full((16, 16), 130, np.uint8)
    arr, mode = codecs.sniff_decode_image(jpeg.encode_jpeg(img, quality=50))
    assert mode == "L" and (arr[:, :, 0] == 130).all()
    meta = codecs.image_meta(jpeg.encode_jpeg(img, quality=50))
    assert (meta["width"], meta["height"], meta["mode"]) == (16, 16, "L")


def test_stride_pushdown_yields_none_without_decoding():
    """every_n in both iterators skips decode work: skipped positions
    yield None and kept positions decode exactly as before."""
    from bi_gcp_stitch_repl_spark.functions import codecs

    frames = [np.full((8, 8), 80 + 2 * f, np.uint8) for f in range(5)]
    y4m = codecs.encode_y4m(frames)
    got = list(codecs.iter_y4m_frames(y4m, every_n=2))
    assert [g is None for g in got] == [False, True, False, True, False]
    assert (got[2][:, :, 0] == 84).all()

    avi = jpeg.encode_avi_mjpeg(
        [jpeg.encode_jpeg(f, quality=50) for f in frames], 8, 8
    )
    got = list(jpeg.iter_avi_mjpeg_frames(avi, every_n=2))
    assert [g is None for g in got] == [False, True, False, True, False]
    assert (got[4][:, :, 0] == 88).all()


def test_sniff_normalizes_y4m_color_to_rgb():
    """The seam's channel contract: Y4M color frames come back RGB
    (BT.601), not raw YUV — so channel 0 means the same thing for every
    container and a PNG re-encode renders correctly."""
    from bi_gcp_stitch_repl_spark.functions import codecs

    yuv = np.zeros((4, 4, 3), np.uint8)
    yuv[:, :, 0] = 120  # Y
    yuv[:, :, 1] = 128  # U neutral
    yuv[:, :, 2] = 200  # V: strong red push
    clip = codecs.encode_y4m([yuv], colorspace="444")
    (frame,) = list(jpeg.sniff_video_frames(clip))
    expect = codecs.yuv_to_rgb(yuv)
    assert np.array_equal(frame, expect)
    assert frame[0, 0, 0] > frame[0, 0, 2]  # red-shifted, not raw YUV
