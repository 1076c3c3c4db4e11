"""Real-pixel BMP path: decoder, 2-D nearest-neighbor resize, luma
aHash, and the concatenated-frame container walk.

Every expectation is computed independently here (pure Python over the
crafting function's pixel grid), never by re-running the kernel — the
tests pin padding arithmetic, BGR channel order, bottom-up/top-down
orientation, truncation handling, and the exact integer luma/resize
index math the SQL oracles mirror.
"""

import struct

import numpy as np
import pytest

from streaming_demos_spark.operators import multimodal as MM


def make_bmp(w, h, pixel_fn, top_down=False, bpp=24, compression=0):
    """Craft an uncompressed 24bpp BMP. ``pixel_fn(x, y) -> (r, g, b)``
    addresses the logical top-down grid regardless of storage order."""
    row_size = (3 * w + 3) & ~3
    pix = bytearray()
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        for x in range(w):
            r, g, b = pixel_fn(x, y)
            pix += bytes([b, g, r])  # BMP stores BGR
        pix += b"\x00" * (row_size - 3 * w)
    fsize = 54 + len(pix)
    header = b"BM" + struct.pack("<IHHI", fsize, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, compression,
        row_size * h, 2835, 2835, 0, 0,
    )
    return bytes(header + info + pix)


def grad(x, y):
    v = (3 * x + 7 * y) % 256
    return ((v + 170) % 256, (v + 85) % 256, v)


def test_decode_bmp_bottom_up_and_top_down_agree():
    for w, h in [(1, 1), (4, 4), (5, 3), (7, 2), (6, 5)]:
        bu = MM.decode_bmp(make_bmp(w, h, grad, top_down=False))
        td = MM.decode_bmp(make_bmp(w, h, grad, top_down=True))
        assert bu is not None and td is not None
        assert bu[0] == td[0] == w and bu[1] == td[1] == h
        assert np.array_equal(bu[2], td[2])
        # independent pixel check: RGB order on the logical grid
        for x, y in [(0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1)]:
            assert tuple(bu[2][y, x]) == grad(x, y)


def test_decode_bmp_row_padding_widths():
    # 3*w % 4 cycles 0,3,2,1 for w % 4 = 0,1,2,3 — all four pad sizes
    for w in (4, 5, 6, 7):
        out = MM.decode_bmp(make_bmp(w, 3, grad))
        assert out is not None and out[0] == w
        assert tuple(out[2][2, w - 1]) == grad(w - 1, 2)


def test_decode_bmp_rejects_malformed():
    good = make_bmp(4, 4, grad)
    assert MM.decode_bmp(None) is None
    assert MM.decode_bmp(b"") is None
    assert MM.decode_bmp(b"XX" + good[2:]) is None          # wrong magic
    assert MM.decode_bmp(good[:-1]) is None                 # truncated pixels
    assert MM.decode_bmp(make_bmp(4, 4, grad, bpp=8)) is None
    assert MM.decode_bmp(make_bmp(4, 4, grad, compression=1)) is None


def test_parse_media_header_reports_bmp():
    p = MM.parse_media_header(make_bmp(12, 9, grad))
    assert (p["format"], p["width"], p["height"], p["bit_depth"]) == (
        "bmp", 12, 9, 24)
    t = MM.parse_media_header(make_bmp(12, 9, grad, top_down=True))
    assert (t["format"], t["width"], t["height"]) == ("bmp", 12, 9)


def test_luma_plane_integer_formula():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]]],
                   dtype=np.uint8)
    luma = MM._luma_plane(rgb)
    assert luma.tolist() == [[
        299 * 255 // 1000, 587 * 255 // 1000, 114 * 255 // 1000,
        (299 * 10 + 587 * 20 + 114 * 30) // 1000]]


def test_nn_resize_index_math():
    g = np.arange(12).reshape(3, 4)
    out = MM._nn_resize(g, 2, 2)
    # src = (out_idx * in) // out: rows 0,1 -> 0,1; cols 0,1 -> 0,2
    assert out.tolist() == [[0, 2], [4, 6]]
    up = MM._nn_resize(np.array([[1, 2]]), 4, 2)
    assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2]]


def test_ahash_pixels_strictly_above_mean():
    # 2x2 image, luma values 10,10,10,250 -> mean 70 -> only the hot
    # cell's replicated 8x8 block is 1 (16 ones in the 4x4 corner)
    vals = {(0, 0): 10, (1, 0): 10, (0, 1): 10, (1, 1): 250}
    bmp = make_bmp(2, 2, lambda x, y: (vals[(x, y)],) * 3)
    h = MM._ahash_pixels(bmp)
    assert h is not None and len(h) == 64
    bits = np.array([int(c) for c in h]).reshape(8, 8)
    assert bits.sum() == 16
    assert bits[4:, 4:].all() and not bits[:4, :].any()
    assert MM._ahash_pixels(b"not a bmp") is None


def test_iter_bmp_frames_walks_declared_sizes():
    frames = [make_bmp(3, 2, lambda x, y, f=f: ((f * 40 + x) % 256,) * 3)
              for f in range(4)]
    blob = b"".join(frames)
    got = list(MM.iter_bmp_frames(blob))
    assert got == frames
    # trailing junk stops the walk cleanly; truncated last frame dropped
    assert list(MM.iter_bmp_frames(blob + b"junk")) == frames
    assert list(MM.iter_bmp_frames(blob[:-10])) == frames[:3]
    assert list(MM.iter_bmp_frames(None)) == []


@pytest.fixture()
def media_df(spark):
    rows = [
        (0, make_bmp(4, 3, grad)),
        (1, make_bmp(5, 4, grad, top_down=True)),
        (2, b"not a bitmap"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    return MM.as_media(df, "doc_id", "payload", kind="image")


def test_resize_images_bmp_real_pixels(spark, media_df):
    out = {r["media_id"]: r for r in
           MM.resize_images(media_df, 2, 2, decoder="bmp").collect()}
    # media 0: 4x3 grid -> src rows (0*3//2, 1*3//2) = (0, 1),
    # src cols (0*4//2, 1*4//2) = (0, 2)
    expect = b"".join(bytes(grad(x, y)) for y in (0, 1) for x in (0, 2))
    assert bytes(out[0]["payload"]) == expect
    assert out[0]["meta"]["mime"] == "image/x-raw-rgb24;w=2;h=2"
    assert out[0]["meta"]["n_bytes"] == 12
    assert bytes(out[1]["payload"]) == b"".join(
        bytes(grad(x, y)) for y in (0, 2) for x in (0, 2))
    assert out[2]["payload"] is None


def test_perceptual_hash_bmp_vs_fake(spark, media_df):
    real = {r["media_id"]: r["ahash"]
            for r in MM.perceptual_hash(media_df, decoder="bmp").collect()}
    assert real[2] is None
    for mid, (w, h) in [(0, (4, 3)), (1, (5, 4))]:
        cells = [
            (299 * grad((x * w) // 8, (y * h) // 8)[0]
             + 587 * grad((x * w) // 8, (y * h) // 8)[1]
             + 114 * grad((x * w) // 8, (y * h) // 8)[2]) // 1000
            for y in range(8) for x in range(8)
        ]
        mean = sum(cells) / 64
        assert real[mid] == "".join("1" if c > mean else "0" for c in cells)


def test_sample_frames_bmp_container(spark):
    def pix(f):
        return lambda x, y: ((f * 31 + 3 * x + 7 * y) % 256,) * 3

    blob = b"".join(make_bmp(3, 2, pix(f), top_down=bool(f % 2))
                    for f in range(5))
    df = spark.createDataFrame([(7, blob)], "doc_id long, payload binary")
    media = MM.as_media(df, "doc_id", "payload", kind="video")
    got = {r["frame_idx"]: bytes(r["frame"])
           for r in MM.sample_frames(media, every_n=2, decoder="bmp").collect()}
    assert sorted(got) == [0, 2, 4]
    for f in (0, 2, 4):
        expect = bytes(
            (f * 31 + 3 * x + 7 * y) % 256 for y in range(2) for x in range(3))
        assert got[f] == expect


def test_ahash_integer_threshold_exact_ties():
    # all-equal luma: every cell EQUALS the mean -> strictly-above rule
    # gives all zeros; the pure-integer comparison (n*c > sum) must
    # agree with the float-mean formulation on exact-tie cells
    flat = make_bmp(4, 4, lambda x, y: (90, 90, 90))
    assert MM._ahash_pixels(flat) == "0" * 64
    assert MM._ahash_bytes(bytes([7]) * 100) == "0" * MM.AHASH_BITS


def test_phash_pairs_packing_guards(spark, media_df, monkeypatch):
    hashes = MM.perceptual_hash(media_df, decoder="bmp")
    # odd width cannot split into two equal halves
    monkeypatch.setattr(MM, "AHASH_BITS", 65)
    with pytest.raises(ValueError, match="not packable"):
        MM.phash_near_dup_pairs(hashes)
    # 128-bit halves (64 bits) overflow a signed long through F.conv
    monkeypatch.setattr(MM, "AHASH_BITS", 128)
    with pytest.raises(ValueError, match="not packable"):
        MM.phash_near_dup_pairs(hashes)
    # band width must tile the hash exactly
    monkeypatch.setattr(MM, "AHASH_BITS", 64)
    with pytest.raises(ValueError, match="does not divide"):
        MM.phash_near_dup_pairs(hashes, band_count=3)


def test_sample_frames_emits_null_row_for_undecodable_frame(spark):
    def pix(f):
        return lambda x, y: ((f * 31 + 3 * x + 7 * y) % 256,) * 3

    # frame 1 has a valid declared size (the walk yields it) but 8bpp,
    # so decode rejects it: the row must still appear, with a NULL
    # frame, and later frame_idx values must keep counting the WALK
    blob = (make_bmp(3, 2, pix(0))
            + make_bmp(3, 2, pix(1), bpp=8)
            + make_bmp(3, 2, pix(2)))
    df = spark.createDataFrame([(9, blob)], "doc_id long, payload binary")
    media = MM.as_media(df, "doc_id", "payload", kind="video")
    got = {r["frame_idx"]: r["frame"]
           for r in MM.sample_frames(media, every_n=1, decoder="bmp").collect()}
    assert sorted(got) == [0, 1, 2]
    assert got[1] is None
    assert bytes(got[2]) == bytes(
        (2 * 31 + 3 * x + 7 * y) % 256 for y in range(2) for x in range(3))


def test_unknown_decoder_still_raises(spark, media_df):
    with pytest.raises(NotImplementedError):
        MM.resize_images(media_df, 2, 2, decoder="pil")
    with pytest.raises(NotImplementedError):
        MM.perceptual_hash(media_df, decoder="opencv")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media_df, every_n=2, decoder="pyav")
