"""Real stdlib decode kernels: PCM WAV and 24-bit BMP.

The gates (wav_decode / bmp_decode) pin the distributed plumbing —
fixture planting → binaryFile → executor-side decode — against oracles
computed from the sample lists / pixel grids. These tests pin what a
shared encode+decode pair could hide: the ABSOLUTE byte layout (a
hand-constructed BMP hex literal, a wave-module-written WAV), the error
branches, and the kernel-selection routing."""

import io
import struct
import wave

import pytest

from jobinsight_data_pipeline_spark.operators.multimodal import (
    bmp_stats_py,
    build_image_feature_fn,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    fake_decode_features,
    png_stats_py,
    real_decode,
    wav_stats_py,
)

# 2x2 24-bit bottom-up BMP, hand-assembled byte by byte:
#   top row    = red (255,0,0), green (0,255,0)
#   bottom row = blue (0,0,255), white (255,255,255)
# stride = (2*3 + 3) & ~3 = 8 → 2 pad bytes per row; bottom row stored
# FIRST in the file; channels stored B,G,R.
HAND_BMP = (
    struct.pack("<2sIHHI", b"BM", 70, 0, 0, 54)
    + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
    + bytes(
        [255, 0, 0]  # blue  (B,G,R)
        + [255, 255, 255]  # white
        + [0, 0]  # pad
        + [0, 0, 255]  # red
        + [0, 255, 0]  # green
        + [0, 0]  # pad
    )
)
HAND_PIXELS = [
    [(255, 0, 0), (0, 255, 0)],
    [(0, 0, 255), (255, 255, 255)],
]


def test_decode_bmp_hand_constructed_layout():
    w, h, rows = decode_bmp(HAND_BMP)
    assert (w, h) == (2, 2)
    assert rows == HAND_PIXELS


def test_encode_bmp_matches_hand_layout():
    # the writer must reproduce the hand-assembled file byte for byte
    assert encode_bmp(HAND_PIXELS) == HAND_BMP


def test_bmp_roundtrip_orientations_and_padding():
    for width in (1, 2, 3, 4, 5, 6):
        rows = [
            [
                ((r * 31 + c * 7) % 256, (r * 5 + c * 97) % 256, (r * c + 13) % 256)
                for c in range(width)
            ]
            for r in range(3)
        ]
        for td in (False, True):
            assert decode_bmp(encode_bmp(rows, top_down=td)) == (width, 3, rows)


def test_bmp_stats_orientation_sensitivity():
    # flipping the grid changes pos_weighted but not the channel sums —
    # the checksum exists precisely to catch a silent row flip
    rows = [[(10, 0, 0), (0, 0, 0)], [(0, 0, 0), (0, 0, 0)]]
    flipped = list(reversed(rows))
    a = bmp_stats_py(encode_bmp(rows))
    b = bmp_stats_py(encode_bmp(flipped))
    assert a["sum_r"] == b["sum_r"] == 10
    assert a["pos_weighted"] != b["pos_weighted"]


def test_bmp_error_branches():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"XX" + HAND_BMP[2:])
    bad_bpp = bytearray(HAND_BMP)
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(HAND_BMP[:-4])
    assert bmp_stats_py(None) is None


def _make_wav(nch: int, sw: int, fr: int, samples: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sw)
        w.setframerate(fr)
        if sw == 1:
            w.writeframes(bytes(v + 128 for v in samples))
        else:
            w.writeframes(
                b"".join(v.to_bytes(2, "little", signed=True) for v in samples)
            )
    return buf.getvalue()


# 2x2 8-bit RGB PNG, hand-assembled chunk by chunk: signature, IHDR
# (w=2, h=2, depth=8, color type 2, non-interlaced), one IDAT whose
# DECOMPRESSED stream is pinned byte-for-byte (filter byte 0 + RGB
# triples per row), CRC32 over type+data on every chunk.
HAND_PNG_RAW = bytes(
    [0, 255, 0, 0, 0, 255, 0]  # row0: filter None, red, green
    + [0, 0, 0, 255, 255, 255, 255]  # row1: filter None, blue, white
)
HAND_PNG_PIXELS = [
    [(255, 0, 0), (0, 255, 0)],
    [(0, 0, 255), (255, 255, 255)],
]


def _hand_png() -> bytes:
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    comp = zlib.compress(HAND_PNG_RAW)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )


def test_decode_png_hand_constructed_layout():
    w, h, ch, rows = decode_png(_hand_png())
    assert (w, h, ch) == (2, 2, 3)
    assert rows == HAND_PNG_PIXELS


def test_encode_png_matches_hand_layout():
    # the writer must reproduce the hand-assembled file byte for byte
    # (same chunk framing, same CRCs, same filter stream)
    assert encode_png(HAND_PNG_PIXELS, color_type=2, filters=[0, 0]) == _hand_png()


def test_png_roundtrip_all_filters_and_types():
    rgb = [
        [((r * 37 + c * 11) % 256, (r * 5 + c * 73) % 256, (r * 17 + c) % 256)
         for c in range(7)]
        for r in range(6)
    ]
    for ft in range(5):
        b = encode_png(rgb, color_type=2, filters=[ft] * 6)
        assert decode_png(b)[3] == rgb, f"filter {ft}"
    # cycled filters + multi-IDAT concat
    b = encode_png(rgb, color_type=2, idat_split=11)
    assert b.count(b"IDAT") > 1
    assert decode_png(b)[3] == rgb
    # RGBA keeps alpha; gray keeps single channel
    rgba = [[(r, c, (r + c) % 256, (255 - r) % 256) for c in range(3)] for r in range(4)]
    assert decode_png(encode_png(rgba, color_type=6))[2:] == (4, rgba)
    gray = [[(r * 101 + c * 53) % 256 for c in range(3)] for r in range(2)]
    w, h, ch, rows = decode_png(encode_png(gray, color_type=0))
    assert ch == 1 and [[p[0] for p in row] for row in rows] == gray


def test_png_palette_roundtrip_and_errors():
    """PLTE support (r12): indices filter like a 1-channel stream
    (incl. Paeth), resolve through the palette to RGB triples, and the
    malformed paths (oversized palette, out-of-range index) fail
    loudly instead of wrapping."""
    pal = [(i * 16 % 256, (i * 7 + 3) % 256, (255 - i * 9) % 256)
           for i in range(11)]
    idx = [[(r * 5 + c) % 11 for c in range(6)] for r in range(5)]
    for ft in range(5):
        b = encode_png(idx, color_type=3, filters=[ft] * 5, palette=pal)
        w, h, ch, rows = decode_png(b)
        assert (w, h, ch) == (6, 5, 3)
        assert rows == [[pal[i] for i in row] for row in idx], f"filter {ft}"
    st = png_stats_py(encode_png(idx, color_type=3, palette=pal))
    assert st["channels"] == 3 and st["sum_a"] is None
    with pytest.raises(ValueError, match="palette"):
        encode_png(idx, color_type=3)  # no palette supplied
    with pytest.raises(ValueError, match="palette"):
        encode_png(idx, color_type=3, palette=[(0, 0, 0)] * 257)
    bad = encode_png([[3]], color_type=3, palette=pal[:2])
    with pytest.raises(ValueError, match="out of range"):
        decode_png(bad)


def test_png_stats_channels_and_orientation():
    st = png_stats_py(_hand_png())
    assert st["width"] == 2 and st["height"] == 2 and st["channels"] == 3
    assert (st["sum_r"], st["sum_g"], st["sum_b"]) == (510, 510, 510)
    assert st["sum_a"] is None
    # pos_weighted pins orientation: flipping rows must change it
    flipped = png_stats_py(
        encode_png(list(reversed(HAND_PNG_PIXELS)), color_type=2)
    )
    assert st["pos_weighted"] != flipped["pos_weighted"]
    assert png_stats_py(None) is None


def test_png_error_branches():
    good = _hand_png()
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    # corrupt a CRC byte
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth punts honestly; a palette image WITHOUT its PLTE
    # chunk is malformed (r12: color type 3 itself now decodes)
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    f = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        decode_png(f)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    f = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(f)
    # palette transparency (tRNS) punts honestly
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    f = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"PLTE", b"\x01\x02\x03"
    ) + chunk(b"tRNS", b"\x80") + chunk(
        b"IDAT", zlib.compress(b"\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="tRNS"):
        decode_png(f)
    # ...but a gray/RGB color-key tRNS is just skipped, exactly as
    # before PLTE support landed (r12 review: the raise must not
    # regress non-palette images)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    f = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"tRNS", b"\x00\x80"
    ) + chunk(
        b"IDAT", zlib.compress(b"\x00\x07")
    ) + chunk(b"IEND", b"")
    assert decode_png(f) == (1, 1, 1, [[(7,)]])
    # Adam7 interlace punts honestly
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    f = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00\x00\x00\x00")
    ) + chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(f)


def test_real_decode_routes_png():
    w, h, ch, rows = real_decode(_hand_png(), "image/png")
    assert rows == HAND_PNG_PIXELS
    # magic-sniffed route for a generic image/* mime
    w, h, ch, rows = real_decode(_hand_png(), "image/unknown")
    assert rows == HAND_PNG_PIXELS


def test_decode_wav_8bit_rebias_and_16bit_sign():
    s8 = [-128, -1, 0, 1, 127]
    assert decode_wav(_make_wav(1, 1, 8000, s8))["samples"] == s8
    s16 = [-32768, -1, 0, 1, 32767, -12345]
    d = decode_wav(_make_wav(2, 2, 44100, s16))
    assert d["samples"] == s16
    assert d["n_channels"] == 2 and d["n_frames"] == 3


def test_wav_stats_zero_cross_and_empty():
    # crossings: -1→1, 1→-2, 0 breaks the run (product 0, not < 0)
    s = [-1, 1, -2, 0, 3, 4]
    st = wav_stats_py(_make_wav(1, 2, 8000, s))
    assert st["zero_cross"] == 2
    assert st["sum_s"] == 5 and st["abs_sum"] == 11
    empty = wav_stats_py(_make_wav(1, 2, 8000, []))
    assert empty["n_samples"] == 0
    assert empty["min_s"] is None and empty["max_s"] is None
    assert wav_stats_py(None) is None


def test_decode_wav_rejects_wide_pcm():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 8)
    with pytest.raises(NotImplementedError, match="32-bit"):
        decode_wav(buf.getvalue())


def test_real_decode_routes_stdlib_kernels():
    wav = _make_wav(1, 2, 8000, [5, -5])
    assert real_decode(wav, "audio/wav")["samples"] == [5, -5]
    assert real_decode(HAND_BMP, "image/bmp")[2] == HAND_PIXELS
    # generic image/* with BMP magic also hits the stdlib kernel
    assert real_decode(HAND_BMP, "image/unknown")[0] == 2
    with pytest.raises(NotImplementedError):
        real_decode(b"\x00\x01", "video/mp4")


def test_image_feature_fn_bmp_is_real_not_fake():
    fn = build_image_feature_fn(dim=8)
    feats = fn(HAND_BMP)
    # the stdlib branch reports true dimensions and 3 channels —
    # categorically different from the sha1-byte fake
    assert feats[0] == pytest.approx(2 / 4096.0)
    assert feats[1] == pytest.approx(2 / 4096.0)
    assert feats[2] == pytest.approx(0.75)
    assert feats != fake_decode_features(HAND_BMP, 8)
    # PNG also decodes for real via the stdlib kernel (same luminance
    # scale as the BMP branch: sum over ≤3 color channels, ×3 for gray)
    pf = fn(_hand_png())
    assert pf[0] == pytest.approx(2 / 4096.0)
    assert pf[2] == pytest.approx(0.75)
    assert pf[3] == feats[3]  # same pixels → same mean luminance
    gray = encode_png([[10, 20], [30, 40]], color_type=0)
    gf = fn(gray)
    assert gf[2] == pytest.approx(0.25)
    assert gf[3] == pytest.approx((10 + 20 + 30 + 40) * 3 / (4 * 765.0))
    # undecodable bytes still degrade to the deterministic fake
    junk = b"\x89PNG not really"
    assert fn(junk) == fake_decode_features(junk, 8)


def test_bmp_downsample2x_known_answer_and_errors():
    from jobinsight_data_pipeline_spark.operators.multimodal import (
        bmp_downsample2x_py,
    )

    # 2x2 -> 1x1: per-channel round-half-up mean of the four pixels
    # (r: (255+0+0+255+2)//4 = 128, same for g and b by symmetry)
    small = decode_bmp(bmp_downsample2x_py(HAND_BMP))
    assert small == (1, 1, [[(128, 128, 128)]])
    # odd trailing row/col drops: 5x3 -> 2x1
    rows = [[(c * 10, r * 20, 7) for c in range(5)] for r in range(3)]
    w, h, out = decode_bmp(bmp_downsample2x_py(encode_bmp(rows)))
    assert (w, h) == (2, 1)
    # block (0,0): r mean of {0,10,0,10} -> 5; g mean of {0,0,20,20} -> 10
    assert out[0][0] == (5, 10, 7)
    assert out[0][1] == (25, 10, 7)
    with pytest.raises(ValueError, match="smaller than 2x2"):
        bmp_downsample2x_py(encode_bmp([[(1, 2, 3)]]))


def test_wav_chunk_energy_matches_bruteforce(spark):
    """The covering-range explode must reproduce the brute-force chunk
    grid — partial tails, the cap, multi-channel, window == hop (no
    overlap) and window > hop (overlap) — over real decoded bytes."""
    from jobinsight_data_pipeline_spark.operators.multimodal import (
        extract_wav_frames,
        wav_chunk_energy,
    )

    fixtures = {
        1: (1, [((i * 13) % 41) - 20 for i in range(23)]),   # odd tail
        2: (2, [((i * 7) % 29) - 14 for i in range(60)]),    # stereo
        3: (1, [5]),                                          # single frame
    }
    media = spark.createDataFrame(
        [
            (mid, _make_wav(nch, 2, 8000, s))
            for mid, (nch, s) in fixtures.items()
        ],
        "media_id long, content binary",
    )
    frames = extract_wav_frames(media)
    for window, hop, cap in ((8, 4, 4), (6, 6, 99), (5, 2, 3)):
        got = sorted(
            (r["media_id"], r["chunk_idx"], r["start_frame"],
             r["end_frame"], r["abs_energy"])
            for r in wav_chunk_energy(
                frames, window_frames=window, hop_frames=hop,
                max_chunks=cap,
            ).collect()
        )
        want = []
        for mid, (nch, s) in fixtures.items():
            nf = len(s) // nch
            for c in range(min((nf + hop - 1) // hop, cap)):
                start, end = c * hop, min(c * hop + window, nf)
                e = sum(
                    abs(s[f * nch + ch])
                    for f in range(start, end)
                    for ch in range(nch)
                )
                want.append((mid, c, start, end, e))
        assert got == sorted(want), (window, hop, cap)


def test_transform_bmp_null_passthrough(spark):
    from jobinsight_data_pipeline_spark.operators.multimodal import (
        transform_bmp,
    )

    media = spark.createDataFrame(
        [(1, HAND_BMP), (2, None)], "media_id long, content binary"
    )
    out = {r["media_id"]: r["content"] for r in transform_bmp(media).collect()}
    assert out[2] is None
    assert decode_bmp(bytes(out[1]))[0] == 1


def test_dhash_cross_format_and_invariances():
    """The perceptual-hash dedup claims: the same pixels through PNG
    and BMP hash identically (format-sniffing route), a uniform
    brightness shift is invariant (dHash is gradient-sign based), a
    strong local tweak moves only a few bits, unrelated patterns sit
    near half the bits apart, and sub-9x8 sources raise."""
    from jobinsight_data_pipeline_spark.catalog.textml import DHASH_FIXTURE
    from jobinsight_data_pipeline_spark.operators.multimodal import (
        dhash_from_rows,
        encode_bmp,
        encode_png,
        image_dhash_py,
    )

    base = DHASH_FIXTURE["a_base.png"][1]
    hb = dhash_from_rows(base, 3)
    assert image_dhash_py(encode_png(base, color_type=2))[2] == hb
    assert image_dhash_py(encode_bmp(base))[2] == hb

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    bright = [
        [tuple(min(255, v + 9) for v in p) for p in row] for row in base
    ]
    assert ham(hb, dhash_from_rows(bright, 3)) == 0
    assert ham(hb, dhash_from_rows(DHASH_FIXTURE["b_tweak.png"][1], 3)) == 1
    assert ham(hb, dhash_from_rows(DHASH_FIXTURE["d_far.png"][1], 3)) > 20
    with pytest.raises(ValueError, match="smaller"):
        dhash_from_rows([[(1, 2, 3)] * 8] * 8, 3)  # 8 wide < 9
    with pytest.raises(ValueError, match="unrecognized"):
        image_dhash_py(b"GIF89a...")


def test_hamming_near_pairs_banding_complete(spark):
    """The generic banded pigeonhole join equals the all-pairs form on
    a random 64-bit hash column — recall 1.0 by construction at every
    radius tested (the simhash banding guarantee, generalized)."""
    import random

    from pyspark.sql import functions as F

    from jobinsight_data_pipeline_spark.operators.dedup import (
        hamming_near_pairs,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(40):
        v = rnd.getrandbits(64)
        rows.append((i, v - (1 << 64) if v >= 1 << 63 else v))
        # plant near-copies of the first few: flip <=4 random bits
        if i < 6:
            w = rows[i][1] ^ (1 << rnd.randrange(64)) ^ (
                1 << rnd.randrange(64)
            )
            rows.append((100 + i, w))
    df = spark.createDataFrame(rows, "id long, h long")
    for radius in (0, 2, 4):
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_near_pairs(df, "id", "h", radius).collect()
        }
        want = set()
        for ia, ha in rows:
            for ib, hb in rows:
                if ia < ib:
                    d = bin((ha ^ hb) & (2**64 - 1)).count("1")
                    if d <= radius:
                        want.add((ia, ib, d))
        assert got == want, f"radius {radius}"


def test_hamming_near_join_cross_frame_complete(spark):
    """The cross-frame banded join (day-N vs history) equals the
    all-cross-pairs form on random hashes — pigeonhole completeness
    holds across frames exactly as within one."""
    import random

    from jobinsight_data_pipeline_spark.operators.dedup import (
        hamming_near_join,
    )

    rnd = random.Random(13)

    def mk(n, offset):
        rows = []
        for i in range(n):
            v = rnd.getrandbits(64)
            rows.append((offset + i, v - (1 << 64) if v >= 1 << 63 else v))
        return rows

    hist = mk(25, 0)
    # plant near-copies of history entries into the new batch
    new = mk(10, 100) + [
        (200 + i, h ^ (1 << rnd.randrange(64))) for i, (_, h) in
        enumerate(hist[:5])
    ]
    ndf = spark.createDataFrame(new, "id long, h long")
    hdf = spark.createDataFrame(hist, "id long, h long")
    for radius in (0, 1, 3):
        got = {
            (r["id_new"], r["id_hist"], r["hamming"])
            for r in hamming_near_join(
                ndf, hdf, "id", "h", radius
            ).collect()
        }
        want = {
            (ia, ib, bin((ha ^ hb) & (2**64 - 1)).count("1"))
            for ia, ha in new
            for ib, hb in hist
            if bin((ha ^ hb) & (2**64 - 1)).count("1") <= radius
        }
        assert got == want, f"radius {radius}"
