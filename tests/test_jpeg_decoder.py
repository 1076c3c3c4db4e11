"""Baseline-JPEG decoder (multimodal.decode_jpeg): every expectation
is computed independently of the decoder — a test-side encoder built
from the T.81 definition (inverse of the decoder's basis matrix,
standard Annex K Huffman tables), analytic DC-only constructions, and
a canonical-decoder pin through the container's gdk-pixbuf accessor
API (libjpeg-backed), the same pinning strategy the GIF LZW path uses
against giflib.
"""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from streaming_demos_spark.operators import multimodal as MM

# ---------------------------------------------------------------------------
# Test-side encoder (independent direction: forward DCT via the
# INVERSE of the decoder's IDCT basis, standard Annex K tables)
# ---------------------------------------------------------------------------

# T.81 Annex K.3.3: standard luminance DC/AC Huffman tables.
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canon_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, ln):
        self.acc = (self.acc << ln) | code
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-bits padding per B.1.1.5


def _category(v):
    return 0 if v == 0 else abs(v).bit_length()


def _enc_bits(v, t):
    return v if v >= 0 else v + (1 << t) - 1


_A_INV = np.linalg.inv(MM._JPEG_IDCT_A)


def _fdct(block):  # exact inverse of the decoder's IDCT contract
    return _A_INV @ block @ _A_INV.T


def encode_jpeg(img, quant=None, subsample=False, restart=0):
    """Baseline encoder: grayscale (h, w) or RGB (h, w, 3) numpy ->
    JPEG bytes. Standard Annex K luminance tables for every component;
    ``subsample=True`` uses 2x2 chroma subsampling (top-left sample);
    ``restart`` emits DRI + RSTn every that many MCUs."""
    q = list(quant) if quant is not None else [1] * 64
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cb, cr = cb[::2, ::2], cr[::2, ::2]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hi, vi) in zip(planes, samp):
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        pp = np.zeros((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        # edge replication keeps pad blocks tame
        pp[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)

    dc_codes = _canon_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _canon_codes(_STD_AC_BITS, _STD_AC_VALS)
    wtr = _BitWriter()
    preds = [0] * len(planes)
    zz = MM._JPEG_ZIGZAG
    rst_n = 0
    body_marks = []  # (offset in wtr.out, rst index) for RSTn splices
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart and mcu_idx and mcu_idx % restart == 0:
                wtr.flush()
                body_marks.append((len(wtr.out), rst_n))
                rst_n = (rst_n + 1) % 8
                preds = [0] * len(planes)
            for ci, (p, (hi, vi)) in enumerate(zip(padded, samp)):
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        F = _fdct(p[y0 : y0 + 8, x0 : x0 + 8])
                        coefs = [
                            int(round(F.flat[zz[k]] / q[k]))
                            for k in range(64)
                        ]
                        d = coefs[0] - preds[ci]
                        preds[ci] = coefs[0]
                        t = _category(d)
                        c, ln = dc_codes[t]
                        wtr.put(c, ln)
                        if t:
                            wtr.put(_enc_bits(d, t), t)
                        run = 0
                        last_nz = max(
                            (k for k in range(1, 64) if coefs[k]), default=0
                        )
                        for k in range(1, last_nz + 1):
                            if coefs[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]
                                wtr.put(c, ln)
                                run -= 16
                            s = _category(coefs[k])
                            c, ln = ac_codes[(run << 4) | s]
                            wtr.put(c, ln)
                            wtr.put(_enc_bits(coefs[k], s), s)
                            run = 0
                        if last_nz < 63:
                            c, ln = ac_codes[0x00]
                            wtr.put(c, ln)
    wtr.flush()
    body = bytearray(wtr.out)
    for off, ridx in reversed(body_marks):
        body[off:off] = bytes([0xFF, 0xD0 + ridx])

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(q)
    for tc, bits, vals in (
        (0, _STD_DC_BITS, _STD_DC_VALS),
        (1, _STD_AC_BITS, _STD_AC_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(vals))
        out += bytes([tc << 4]) + bytes(bits) + bytes(vals)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"
    out += bytes(body)
    out += b"\xff\xd9"
    return bytes(out)


def grad(x, y):
    v = (3 * x + 7 * y) % 256
    return ((v + 170) % 256, (v + 85) % 256, v)


def gray_img(w, h, fn=lambda x, y: (3 * x + 7 * y) % 256):
    return np.array(
        [[fn(x, y) for x in range(w)] for y in range(h)], dtype=np.uint8
    )


def rgb_img(w, h, fn=grad):
    return np.array(
        [[fn(x, y) for x in range(w)] for y in range(h)], dtype=np.uint8
    )


# ---------------------------------------------------------------------------
# gdk-pixbuf canonical decode (ctypes over the ACCESSOR api — no
# struct layouts, so no ABI fragility)
# ---------------------------------------------------------------------------


def _pixbuf_decode(path):
    g = ctypes.CDLL("libgdk_pixbuf-2.0.so.0")
    g.gdk_pixbuf_new_from_file.restype = ctypes.c_void_p
    g.gdk_pixbuf_new_from_file.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
    for fn, res in (
        ("gdk_pixbuf_get_width", ctypes.c_int),
        ("gdk_pixbuf_get_height", ctypes.c_int),
        ("gdk_pixbuf_get_rowstride", ctypes.c_int),
        ("gdk_pixbuf_get_n_channels", ctypes.c_int),
        ("gdk_pixbuf_get_pixels", ctypes.POINTER(ctypes.c_ubyte)),
    ):
        getattr(g, fn).restype = res
        getattr(g, fn).argtypes = [ctypes.c_void_p]
    pb = g.gdk_pixbuf_new_from_file(str(path).encode(), None)
    if not pb:
        return None
    w = g.gdk_pixbuf_get_width(pb)
    h = g.gdk_pixbuf_get_height(pb)
    stride = g.gdk_pixbuf_get_rowstride(pb)
    nch = g.gdk_pixbuf_get_n_channels(pb)
    buf = ctypes.cast(
        g.gdk_pixbuf_get_pixels(pb), ctypes.POINTER(ctypes.c_ubyte * (stride * h))
    ).contents
    arr = np.frombuffer(bytes(buf), np.uint8).reshape(h, stride // 1)[
        :, : w * nch
    ].reshape(h, w, nch)[:, :, :3].copy()
    return w, h, arr


def _have_pixbuf_jpeg():
    try:
        ctypes.CDLL("libgdk_pixbuf-2.0.so.0")
        return True
    except OSError:
        return False


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_decode_jpeg_flat_blocks_exact():
    # flat 8x8 blocks survive quant (AC exactly 0) and, with q_dc = 8,
    # decode EXACTLY: stored_dc = v - 128, idct flat = stored * 8 / 8
    q = [8] + [1] * 63
    img = np.zeros((16, 16), np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 31, 99, 167, 235
    out = MM.decode_jpeg(encode_jpeg(img, quant=q))
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (16, 16)
    assert np.array_equal(rgb[..., 0], img)
    assert np.array_equal(rgb[..., 1], img)
    assert np.array_equal(rgb[..., 2], img)


def test_decode_jpeg_gray_roundtrip_q1():
    # quant all-ones: reconstruction error bounded by coefficient
    # rounding (|err per coef| <= 0.5 -> max pixel err small)
    for w, h in [(8, 8), (16, 8), (12, 10), (17, 9)]:
        img = gray_img(w, h)
        out = MM.decode_jpeg(encode_jpeg(img))
        assert out is not None, (w, h)
        gw, gh, rgb = out
        assert (gw, gh) == (w, h)
        err = np.abs(rgb[..., 0].astype(int) - img.astype(int)).max()
        assert err <= 2, (w, h, err)


def test_decode_jpeg_rgb_roundtrip_q1():
    img = rgb_img(14, 11)
    out = MM.decode_jpeg(encode_jpeg(img))
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (14, 11)
    # color conversion does two float roundtrips; stay within 3
    assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 3


def test_decode_jpeg_subsampled_constant_chroma():
    # 2x2 subsampling with CONSTANT chroma: the replication upsample is
    # exact whatever the upsample filter, so error stays at the q1
    # roundtrip bound
    img = rgb_img(16, 16, lambda x, y: (200, 80, 120))
    out = MM.decode_jpeg(encode_jpeg(img, subsample=True))
    assert out is not None
    w, h, rgb = out
    assert (w, h) == (16, 16)
    assert np.abs(rgb.astype(int) - img.astype(int)).max() <= 3


def test_decode_jpeg_restart_intervals():
    img = gray_img(32, 8)  # 4 MCUs; restart every 2 -> one RST marker
    blob = encode_jpeg(img, restart=2)
    assert b"\xff\xd0" in blob
    out = MM.decode_jpeg(blob)
    assert out is not None
    assert np.abs(out[2][..., 0].astype(int) - img.astype(int)).max() <= 2


def test_decode_jpeg_rejects_malformed():
    good = encode_jpeg(gray_img(8, 8))
    assert MM.decode_jpeg(None) is None
    assert MM.decode_jpeg(b"\xff\xd8\xff\xd9") is None  # no frame
    assert MM.decode_jpeg(good[:-20]) is None  # truncated entropy data
    assert MM.decode_jpeg(good[: len(good) // 3]) is None
    prog = bytearray(good)
    sof_at = bytes(prog).index(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2  # progressive
    assert MM.decode_jpeg(bytes(prog)) is None
    bad12 = bytearray(good)
    bad12[sof_at + 4] = 12  # 12-bit precision
    assert MM.decode_jpeg(bytes(bad12)) is None
    # oversized IHDR-equivalent: absurd declared dims rejected upfront
    bigdim = bytearray(good)
    struct.pack_into(">HH", bigdim, sof_at + 5, 65500, 65500)
    assert MM.decode_jpeg(bytes(bigdim)) is None


def test_decode_jpeg_rejects_nonbaseline_scan_header():
    # review r11: SOF0 + a nonconforming SOS progression header
    # (Ss/Se/Ah/Al not 0/63/0/0) must be None, not entropy-decoded as
    # baseline into garbage pixels
    good = encode_jpeg(gray_img(8, 8))
    sos_at = good.index(b"\xff\xda")
    # 1-component SOS: Ss at +7, Se at +8, AhAl at +9
    for off, val in [(7, 1), (8, 62), (9, 0x20), (9, 0x02)]:
        bad = bytearray(good)
        bad[sos_at + off] = val
        assert MM.decode_jpeg(bytes(bad)) is None, (off, val)
    assert MM.decode_jpeg(good) is not None  # control


def test_decode_jpeg_decode_cost_caps():
    # review r11: (a) absolute pixel cap well below the PNG bound;
    # (b) >256 pixels per payload byte is unreachable (min 2 bits per
    # block) — a few-hundred-byte header declaring a huge frame is
    # rejected BEFORE any plane allocation
    good = encode_jpeg(gray_img(8, 8))
    sof_at = good.index(b"\xff\xc0")
    big = bytearray(good)
    struct.pack_into(">HH", big, sof_at + 5, 4000, 4000)  # 16MP > 8MP
    assert MM.decode_jpeg(bytes(big)) is None
    mid = bytearray(good)
    struct.pack_into(">HH", mid, sof_at + 5, 2000, 2000)  # 4MP, <8MP
    # 4MP from a ~200-byte payload violates the 256 px/byte bound
    assert 2000 * 2000 > 256 * len(mid)
    assert MM.decode_jpeg(bytes(mid)) is None
    assert MM._JPEG_MAX_PIXELS < MM._PNG_MAX_PIXELS


def test_decode_jpeg_fill_bytes_between_segments():
    good = encode_jpeg(gray_img(8, 8))
    sof_at = good.index(b"\xff\xc0")
    padded = good[:sof_at] + b"\xff\xff\xff" + good[sof_at:]
    out = MM.decode_jpeg(padded)
    assert out is not None and out[:2] == (8, 8)


def test_jpeg_end_steps_over_entropy_and_rst():
    a = encode_jpeg(gray_img(16, 8), restart=1)
    b = encode_jpeg(gray_img(8, 8))
    blob = a + b
    end = MM._jpeg_end(blob, 0)
    assert end == len(a)
    assert MM._jpeg_end(blob, end) == len(blob)
    assert MM._jpeg_end(a[:-1], 0) is None  # truncated: EOI cut


def test_decode_pixels_sniffs_jpeg_and_mixed_walk():
    j = encode_jpeg(gray_img(8, 8), quant=[8] + [1] * 63)
    out = MM.decode_pixels(j)
    assert out is not None and out[:2] == (8, 8)
    frames = list(MM.iter_pixel_frames(j + j))
    assert len(frames) == 2 and frames[0] == j


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover - hypothesis is baked in
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=2**31),
        restart=st.integers(min_value=0, max_value=3),
    )
    def test_decode_jpeg_roundtrip_fuzz(w, h, seed, restart):
        # arbitrary pixels through the full encode (standard Annex K
        # tables, real Huffman bitstream, optional restart markers)
        # must come back within the q=1 coefficient-rounding bound —
        # no reliance on the DC-only patterns the crafted corpus uses
        def pix(x, y):
            return (seed + 2654435761 * (x + 31 * y)) & 0xFF

        img = gray_img(w, h, pix)
        out = MM.decode_jpeg(encode_jpeg(img, restart=restart))
        assert out is not None and out[0] == w and out[1] == h
        err = np.abs(out[2][..., 0].astype(int) - img.astype(int)).max()
        # analytic worst case for q=1 coefficient rounding is ~2.65
        # (0.5 * (sum|A| per row)^2); 3 keeps the bound non-flaky
        assert err <= 3, err


@pytest.mark.skipif(not _have_pixbuf_jpeg(), reason="gdk-pixbuf absent")
def test_decode_jpeg_pinned_against_gdk_pixbuf(tmp_path):
    # canonical pin: the container's libjpeg (through the gdk-pixbuf
    # accessor API) and decode_jpeg must agree within the spec's
    # decoder tolerance on full-resolution images, and exactly on
    # DC-only flat-block streams
    cases = [
        ("gray", encode_jpeg(gray_img(24, 17)), 1),
        ("rgb444", encode_jpeg(rgb_img(16, 13)), 2),
        ("flat", encode_jpeg(
            np.full((16, 8), 77, np.uint8), quant=[8] + [1] * 63), 0),
        ("restart", encode_jpeg(gray_img(32, 8), restart=2), 1),
    ]
    for name, blob, tol in cases:
        f = tmp_path / f"{name}.jpg"
        f.write_bytes(blob)
        pix = _pixbuf_decode(f)
        assert pix is not None, name
        mine = MM.decode_jpeg(blob)
        assert mine is not None, name
        assert (pix[0], pix[1]) == (mine[0], mine[1]), name
        diff = np.abs(
            pix[2].astype(int) - mine[2].astype(int)
        ).max()
        assert diff <= tol, (name, diff)
