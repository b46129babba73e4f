"""Pure-Python PPM/BMP codecs + the multimodal pipeline on REAL bytes
(no injected decoder) — VERDICT r7 item 6."""

import struct

import pytest

from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.codecs import (
    decode_bmp,
    decode_ppm,
    encode_ppm,
    media_decoder,
    resize_rgb,
)


def _make_bmp(width, height, rgb_topdown, bottom_up=True):
    """Hand-build an uncompressed 24-bit BMP (the layout every real writer
    emits: BGR, rows padded to 4 bytes, bottom-up unless height < 0)."""
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    pix = bytearray()
    rows = range(height - 1, -1, -1) if bottom_up else range(height)
    for row in rows:
        line = bytearray()
        for x in range(width):
            r, g, b = rgb_topdown[(row * width + x) * 3 : (row * width + x) * 3 + 3]
            line += bytes((b, g, r))
        line += b"\x00" * (stride - row_bytes)
        pix += line
    h_field = height if bottom_up else -height
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, width, h_field, 1, 24, 0, len(pix), 0, 0, 0, 0)
    return bytes(header) + bytes(pix)


RGB_3x2 = bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255,   # row 0: red green blue
     10, 20, 30, 40, 50, 60, 70, 80, 90]  # row 1
)


def test_ppm_roundtrip_and_header_grammar():
    p = encode_ppm(3, 2, RGB_3x2)
    assert decode_ppm(p) == (3, 2, RGB_3x2)
    # comments and arbitrary whitespace in the header
    with_comment = b"P6\n# a comment\n 3\t2\n# more\n255\n" + RGB_3x2
    assert decode_ppm(with_comment) == (3, 2, RGB_3x2)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(p[:-1])
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n3 2\n255\n" + RGB_3x2)


def test_bmp_decode_bottom_up_and_top_down():
    assert decode_bmp(_make_bmp(3, 2, RGB_3x2, bottom_up=True)) == (3, 2, RGB_3x2)
    assert decode_bmp(_make_bmp(3, 2, RGB_3x2, bottom_up=False)) == (3, 2, RGB_3x2)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)


def test_media_decoder_contract_and_histogram():
    p = encode_ppm(3, 2, RGB_3x2)
    m = media_decoder(p)
    assert (m["mime"], m["codec"], m["width"], m["height"]) == (
        "image/x-portable-pixmap", "ppm", 3, 2,
    )
    # grays: 85,85,85 (bin 5), 20 (1), 50 (3), 80 (5)
    counts = [round(f * 6) for f in m["features"]]
    assert sum(counts) == 6
    assert counts[5] == 4 and counts[1] == 1 and counts[3] == 1
    # BMP of the same pixels must featurize identically
    mb = media_decoder(_make_bmp(3, 2, RGB_3x2))
    assert mb["features"] == m["features"] and mb["codec"] == "bmp"
    with pytest.raises(ValueError, match="unrecognized"):
        media_decoder(b"\x89PNG....")


def test_resize_nearest_neighbor_exact():
    p = encode_ppm(2, 2, bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]))
    up = resize_rgb(p, 4, 4)
    w, h, rgb = decode_ppm(up)
    assert (w, h) == (4, 4)
    # each source pixel becomes a 2x2 block
    px = [rgb[i] for i in range(0, len(rgb), 3)]
    assert px == [1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4]
    # downsize back recovers the original corners
    down = resize_rgb(up, 2, 2)
    assert decode_ppm(down)[2] == bytes([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4])


def test_multimodal_pipeline_on_real_bytes(spark):
    """extract_media_metadata / extract_media_features / resize_images run
    the REAL codec — no injected decoder anywhere."""
    from aleph2_contrib_spark.operators import multimodal as mm
    from aleph2_contrib_spark.operators.codecs import media_decoder as dec

    payloads = [
        ("a", encode_ppm(3, 2, RGB_3x2)),
        ("b", _make_bmp(3, 2, RGB_3x2)),
    ]
    df = spark.createDataFrame(payloads, "__source_file string, content binary")
    meta = {r["__source_file"]: r for r in mm.extract_media_metadata(df, decoder=dec).collect()}
    assert meta["a"]["codec"] == "ppm" and meta["b"]["codec"] == "bmp"
    assert all(meta[k]["width"] == 3 and meta[k]["height"] == 2 for k in "ab")

    feats = {r["__source_file"]: r["embedding"] for r in mm.extract_media_features(df, decoder=dec).collect()}
    assert feats["a"] == feats["b"]  # same pixels, same histogram

    resized = mm.resize_images(df, 6, 4, resizer=resize_rgb).collect()
    for r in resized:
        w, h, _ = decode_ppm(bytes(r["content"]))
        assert (w, h) == (6, 4) and (r["width"], r["height"]) == (6, 4)


def test_wav_roundtrip_and_chunk_walk():
    from aleph2_contrib_spark.operators.codecs import decode_wav, encode_wav

    samples = [0, 100, -100, 32767, -32768, 7]
    p = encode_wav(8000, samples)
    assert decode_wav(p) == (8000, 1, samples)
    # stereo interleaved
    st = encode_wav(44100, samples, channels=2)
    assert decode_wav(st) == (44100, 2, samples)
    # a LIST chunk between fmt and data must be skipped (word-aligned walk)
    import struct as _s

    fmt_pos = p.index(b"fmt ")
    data_pos = p.index(b"data")
    extra = b"LIST" + _s.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    patched = p[:data_pos] + extra + p[data_pos:]
    patched = patched[:4] + _s.pack("<I", len(patched) - 8) + patched[8:]
    assert decode_wav(patched) == (8000, 1, samples)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + bytes(40))


def test_media_decoder_wav_contract():
    from aleph2_contrib_spark.operators.codecs import encode_wav, media_decoder

    samples = [-32768, -1, 0, 4095, 4096, 32767]
    m = media_decoder(encode_wav(16000, samples))
    assert (m["mime"], m["codec"], m["n_frames"]) == ("audio/wav", "pcm_s16le", 6)
    assert m["duration_s"] == 6 / 16000
    counts = [round(f * 6) for f in m["features"]]
    # bins: -32768->0, -1->7, 0->8, 4095->8, 4096->9, 32767->15
    assert counts[0] == 1 and counts[7] == 1 and counts[8] == 2
    assert counts[9] == 1 and counts[15] == 1 and sum(counts) == 6


# -- A2MJ motion-PPM container ------------------------------------------------


def test_mjppm_roundtrip_and_sampling():
    from aleph2_contrib_spark.operators.codecs import (
        decode_mjppm,
        encode_mjppm,
        encode_ppm,
        mjppm_frame_extractor,
    )

    frames = [encode_ppm(2, 1, bytes([i] * 6)) for i in range(7)]
    payload = encode_mjppm(frames)
    assert payload[:4] == b"A2MJ"
    assert decode_mjppm(payload) == frames
    assert mjppm_frame_extractor(payload, 3) == [frames[0], frames[3], frames[6]]
    assert mjppm_frame_extractor(payload, 1) == frames


def test_mjppm_strict_bounds():
    import pytest

    from aleph2_contrib_spark.operators.codecs import (
        decode_mjppm,
        encode_mjppm,
        encode_ppm,
        mjppm_frame_extractor,
    )

    payload = encode_mjppm([encode_ppm(1, 1, b"abc")])
    with pytest.raises(ValueError, match="magic"):
        decode_mjppm(b"XXXX" + payload[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_mjppm(payload[:-1])
    # valid magic but the u32 frame-count header itself is cut short:
    # must be the documented fail-fast ValueError, not struct.error
    with pytest.raises(ValueError, match="truncated mjppm header"):
        decode_mjppm(payload[:6])
    with pytest.raises(ValueError, match="trailing"):
        decode_mjppm(payload + b"z")
    with pytest.raises(ValueError, match="non-empty"):
        encode_mjppm([])
    with pytest.raises(ValueError, match="every_n"):
        mjppm_frame_extractor(payload, 0)


# -- PNG (real compressed format, stdlib zlib) --------------------------------


def _png_raw_chunks(w, h, color_type, raw):
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    from aleph2_contrib_spark.operators.codecs import PNG_MAGIC

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return PNG_MAGIC, chunk, ihdr, zlib.compress(raw)


def test_png_roundtrip_and_decoder_contract():
    from aleph2_contrib_spark.operators.codecs import (
        decode_png,
        encode_png,
        media_decoder,
        resize_rgb,
    )

    rgb = bytes((i * 7) % 256 for i in range(5 * 8 * 3))
    p = encode_png(5, 8, rgb)
    assert decode_png(p) == (5, 8, rgb)
    d = media_decoder(p)
    assert (d["mime"], d["codec"], d["width"], d["height"]) == (
        "image/png", "png", 5, 8,
    )
    assert abs(sum(d["features"]) - 1.0) < 1e-9
    out = resize_rgb(p, 3, 3)
    assert out[:2] == b"P6"


def test_png_all_filter_types_multi_idat_and_ancillary():
    """Decode a PNG whose five scanlines use the five filter types, whose
    IDAT is split across two chunks, and which carries an ancillary tEXt
    chunk — the real-world shapes an own encoder never produces."""
    import random

    from aleph2_contrib_spark.operators.codecs import decode_png

    W, H, bpp = 4, 5, 3
    stride = W * bpp
    rnd = random.Random(7)
    px = [bytes(rnd.randrange(256) for _ in range(stride)) for _ in range(H)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, ft in enumerate([0, 1, 2, 3, 4]):
        line = px[y]
        raw.append(ft)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b_, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
            v = {
                0: line[i],
                1: line[i] - a,
                2: line[i] - b_,
                3: line[i] - ((a + b_) >> 1),
                4: line[i] - paeth(a, b_, c),
            }[ft] & 0xFF
            raw.append(v)
        prev = line
    magic, chunk, ihdr, z = _png_raw_chunks(W, H, 2, bytes(raw))
    payload = (
        magic + chunk(b"IHDR", ihdr) + chunk(b"tEXt", b"k\x00v")
        + chunk(b"IDAT", z[:20]) + chunk(b"IDAT", z[20:]) + chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (W, H, b"".join(px))


def test_png_grayscale_expands_to_rgb():
    from aleph2_contrib_spark.operators.codecs import decode_png

    raw = bytearray()
    for y in range(3):
        raw += bytes([0]) + bytes(((y * 4 + x) * 13) % 256 for x in range(4))
    magic, chunk, ihdr, z = _png_raw_chunks(4, 3, 0, bytes(raw))
    payload = magic + chunk(b"IHDR", ihdr) + chunk(b"IDAT", z) + chunk(b"IEND", b"")
    w, h, rgb = decode_png(payload)
    assert (w, h) == (4, 3)
    assert all(rgb[3 * i] == rgb[3 * i + 1] == rgb[3 * i + 2] for i in range(12))


def test_png_fail_fast():
    import pytest

    from aleph2_contrib_spark.operators.codecs import decode_png, encode_png

    p = encode_png(2, 2, bytes(12))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + p[4:])
    bad = bytearray(p)
    bad[20] ^= 0xFF  # flip a byte inside IHDR data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(p[:-4])
    with pytest.raises(ValueError, match="IEND"):
        decode_png(p[: len(p) - 12])
    # unsupported variants fail fast, never garbage pixels
    import struct
    import zlib

    magic, chunk, _, z = _png_raw_chunks(2, 2, 2, bytes([0, 0, 0]))
    pal_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    with pytest.raises(ValueError, match="color_type"):
        decode_png(magic + chunk(b"IHDR", pal_ihdr) + chunk(b"IEND", b""))
    il_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(magic + chunk(b"IHDR", il_ihdr) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="bytes"):
        # IDAT inflates to the wrong length
        short = zlib.compress(b"\x00\x01")
        ih = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        decode_png(magic + chunk(b"IHDR", ih) + chunk(b"IDAT", short) + chunk(b"IEND", b""))


# -- GIF (second real compressed format; LZW implemented in-repo) --------------


def test_gif_roundtrip_and_decoder_contract():
    from aleph2_contrib_spark.operators.codecs import (
        decode_gif,
        encode_gif,
        media_decoder,
        resize_rgb,
    )

    w, h = 6, 4
    rgb = b"".join(bytes([(k * 13) % 256] * 3) for k in range(w * h))
    g = encode_gif(w, h, rgb)
    assert g[:6] == b"GIF87a" and g[-1:] == b"\x3B"
    assert decode_gif(g) == (w, h, rgb)
    d = media_decoder(g)
    assert (d["mime"], d["codec"], d["width"], d["height"]) == (
        "image/gif", "gif", w, h,
    )
    assert resize_rgb(g, 3, 2)[:2] == b"P6"


def test_gif_lzw_table_growth_clear_and_kwkwk():
    import random

    from aleph2_contrib_spark.operators.codecs import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    # long low-entropy stream: grows the table past several code sizes
    # and (at 20k symbols over a 4-entry alphabet) past the 12-bit cap,
    # forcing a mid-stream CLEAR + table reset
    rnd = random.Random(3)
    idx = bytes(rnd.randrange(4) for _ in range(20000))
    enc = _lzw_encode(idx, 2)
    assert _lzw_decode(enc, 2, len(idx)) == idx
    # KwKwK special case: "aaaa" emits a code equal to next_code
    assert _lzw_decode(_lzw_encode(b"\x00\x00\x00\x00", 2), 2, 4) == b"\x00\x00\x00\x00"
    # a 40x35 image with 200 gray levels round-trips through the full
    # container (sub-block splitting at 255 bytes included)
    W, H = 40, 35
    px = b"".join(bytes([rnd.randrange(200)] * 3) for _ in range(W * H))
    assert decode_gif(encode_gif(W, H, px)) == (W, H, px)


def test_gif_fail_fast():
    import pytest

    from aleph2_contrib_spark.operators.codecs import decode_gif, encode_gif

    w, h = 4, 3
    rgb = b"".join(bytes([(k * 29) % 256] * 3) for k in range(w * h))
    g = encode_gif(w, h, rgb)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JIF87a" + g[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(g[:9])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(g[:-6])
    # interlace flag on the image descriptor fails fast
    gct_n = 2 << (g[10] & 7)
    desc = 13 + 3 * gct_n
    assert g[desc] == 0x2C
    bad = bytearray(g)
    bad[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(bad))
    # >256 distinct colors is an encoder error, not silent palette loss
    over = b"".join(bytes((k % 256, k // 256, 0)) for k in range(257))
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(257, 1, over)


# -- property-based roundtrips (hypothesis) ------------------------------------


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        data=st.data(),
    )
    def test_png_gif_roundtrip_property(w, h, data):
        """Any RGB image round-trips bit-exactly through PNG; any image
        with ≤256 distinct colors round-trips through GIF; and
        media_decoder featurizes the same pixels identically regardless
        of which container carried them."""
        from aleph2_contrib_spark.operators.codecs import (
            decode_gif,
            decode_png,
            encode_gif,
            encode_png,
            media_decoder,
        )

        n = w * h
        # ≤16 distinct colors keeps GIF in range and mixes palette sizes
        palette = data.draw(
            st.lists(
                st.tuples(
                    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
                ),
                min_size=1,
                max_size=16,
                unique=True,
            )
        )
        pix = data.draw(
            st.lists(st.integers(0, len(palette) - 1), min_size=n, max_size=n)
        )
        rgb = b"".join(bytes(palette[i]) for i in pix)

        p = encode_png(w, h, rgb)
        assert decode_png(p) == (w, h, rgb)
        g = encode_gif(w, h, rgb)
        assert decode_gif(g) == (w, h, rgb)
        mp, mg = media_decoder(p), media_decoder(g)
        assert mp["features"] == mg["features"]
        assert (mp["width"], mp["height"]) == (mg["width"], mg["height"]) == (w, h)


# -- JPEG (baseline JFIF, operators/jpeg.py) -----------------------------------


def test_jpeg_exact_roundtrip_block_constant():
    """A block-constant image with DC quant step 8 round-trips EXACTLY —
    the property the multimodal_jpeg_codec differential gate leans on
    (the DC of a constant block is 8·(c−128), quantized losslessly by
    step 8; every AC is 0; the fixed-point color transforms are exact
    identities on gray pixels)."""
    from aleph2_contrib_spark.operators.jpeg import (
        QUANT_CHROMA,
        QUANT_LUMA,
        dc_exact_quant,
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 13, 10  # 2x2 MCUs, non-multiple-of-8 dims (edge replication)
    bw = (w + 7) // 8
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            bi = (y // 8) * bw + (x // 8)
            g = (37 + bi * 29) % 256
            rgb += bytes((g, g, g))
    payload = encode_jpeg(
        w, h, bytes(rgb), dc_exact_quant(QUANT_LUMA), dc_exact_quant(QUANT_CHROMA)
    )
    assert decode_jpeg(payload) == (w, h, bytes(rgb))


def test_jpeg_media_decoder_contract_and_resize():
    from aleph2_contrib_spark.operators.codecs import media_decoder, resize_rgb
    from aleph2_contrib_spark.operators.jpeg import (
        QUANT_CHROMA,
        QUANT_LUMA,
        dc_exact_quant,
        encode_jpeg,
    )

    w, h = 8, 8
    rgb = bytes(200 for _ in range(w * h * 3))
    payload = encode_jpeg(
        w, h, rgb, dc_exact_quant(QUANT_LUMA), dc_exact_quant(QUANT_CHROMA)
    )
    m = media_decoder(payload)
    assert m["mime"] == "image/jpeg" and m["codec"] == "jpeg"
    assert (m["width"], m["height"]) == (w, h)
    # all 64 pixels land in gray bin 200 // 16 = 12
    assert m["features"][12] == 1.0 and sum(m["features"]) == 1.0
    out = resize_rgb(payload, 4, 4)
    assert out[:2] == b"P6"


def test_jpeg_grayscale_single_component():
    from aleph2_contrib_spark.operators.jpeg import decode_jpeg, encode_jpeg

    w, h = 9, 5
    g = [(11 * k) % 256 for k in range(w * h)]
    rgb = b"".join(bytes((v, v, v)) for v in g)
    ones = [1] * 64
    payload = encode_jpeg(w, h, rgb, ones, ones, grayscale=True)
    w2, h2, rgb2 = decode_jpeg(payload)
    assert (w2, h2) == (w, h)
    # single-component path expands to RGB; unit tables bound the DCT
    # roundtrip error at 8.5 per pixel (see module docstring)
    assert max(abs(a - b) for a, b in zip(rgb, rgb2)) <= 9


def test_jpeg_fail_fast():
    import pytest

    from aleph2_contrib_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rgb = bytes(128 for _ in range(8 * 8 * 3))
    payload = encode_jpeg(8, 8, rgb)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + payload)
    with pytest.raises(ValueError):  # header truncation (boundary-dependent msg)
        decode_jpeg(payload[:20])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(payload[:30])  # cuts inside the DQT segment
    # flip SOF0 -> SOF2 (progressive): must fail fast, not mis-decode
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # entropy truncation: chop mid-scan (before EOI)
    with pytest.raises(ValueError):
        decode_jpeg(payload[:-20])
    with pytest.raises(ValueError, match="dimensions"):
        encode_jpeg(0, 8, b"")
    with pytest.raises(ValueError, match="quant"):
        encode_jpeg(8, 8, rgb, [0] * 64, [1] * 64)


if _HAS_HYPOTHESIS:

    @settings(max_examples=30, deadline=None)
    @given(
        bw=st.integers(1, 3),
        bh=st.integers(1, 3),
        crop_x=st.integers(0, 7),
        crop_y=st.integers(0, 7),
        data=st.data(),
    )
    def test_jpeg_block_constant_exact_roundtrip_property(
        bw, bh, crop_x, crop_y, data
    ):
        """Property behind the oracle gate: ANY block-constant gray image
        (any block values, any non-multiple-of-8 crop) round-trips
        exactly with DC step 8 — the full Huffman DC-prediction path
        (all magnitude categories, byte stuffing) on real bytes."""
        from aleph2_contrib_spark.operators.jpeg import (
            QUANT_CHROMA,
            QUANT_LUMA,
            dc_exact_quant,
            decode_jpeg,
            encode_jpeg,
        )

        w, h = bw * 8 - crop_x, bh * 8 - crop_y
        if w < 1 or h < 1:
            return
        vals = data.draw(
            st.lists(st.integers(0, 255), min_size=bw * bh, max_size=bw * bh)
        )
        rgb = bytearray()
        for y in range(h):
            for x in range(w):
                g = vals[(y // 8) * bw + (x // 8)]
                rgb += bytes((g, g, g))
        payload = encode_jpeg(
            w, h, bytes(rgb),
            dc_exact_quant(QUANT_LUMA), dc_exact_quant(QUANT_CHROMA),
        )
        assert decode_jpeg(payload) == (w, h, bytes(rgb))

    @settings(max_examples=15, deadline=None)
    @given(w=st.integers(1, 10), h=st.integers(1, 10), data=st.data())
    def test_jpeg_arbitrary_image_bounded_error_property(w, h, data):
        """Arbitrary COLOR images with unit quant tables decode within the
        provable bound: ≤0.5 rounding per coefficient × 64 basis terms of
        magnitude ≤1/4 → ≤8 per sample, plus fixed-point chroma rounding
        (±0.5 into weights summing ≤2.02) and the final pixel rounding —
        ≤12 per channel end-to-end."""
        from aleph2_contrib_spark.operators.jpeg import decode_jpeg, encode_jpeg

        n = w * h * 3
        rgb = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        )
        ones = [1] * 64
        payload = encode_jpeg(w, h, rgb, ones, ones)
        w2, h2, rgb2 = decode_jpeg(payload)
        assert (w2, h2) == (w, h)
        assert max(abs(a - b) for a, b in zip(rgb, rgb2)) <= 12


# -- G.711 mu-law WAV (compressed audio) ----------------------------------------


def test_mulaw_companding_hand_worked_and_fixed_point():
    from aleph2_contrib_spark.operators.codecs import (
        mulaw_decode_sample,
        mulaw_encode_sample,
    )

    # spec anchors: 0 -> code 0xFF (all-ones complement), decode(0xFF) = 0
    assert mulaw_encode_sample(0) == 0xFF
    assert mulaw_decode_sample(0xFF) == 0
    # max positive clips to 32635: seg 7, mantissa 15 -> code 0x80
    assert mulaw_encode_sample(32767) == 0x80
    assert mulaw_decode_sample(0x80) == 32124
    # sign symmetry
    assert mulaw_decode_sample(mulaw_encode_sample(-500)) == -mulaw_decode_sample(
        mulaw_encode_sample(500)
    )
    # companding is a projection: decode∘encode is idempotent on its image
    for x in range(-32768, 32768, 97):
        c = mulaw_encode_sample(x)
        y = mulaw_decode_sample(c)
        assert mulaw_encode_sample(y) == c
        # error bounded by segment step (≤ |x|/16 + bias rounding)
        assert abs(y - max(-32767, min(32767, x))) <= (abs(x) >> 4) + 132


def test_mulaw_wav_container_and_media_decoder():
    from aleph2_contrib_spark.operators.codecs import (
        decode_wav_full,
        encode_wav,
        encode_wav_mulaw,
        media_decoder,
        mulaw_decode_sample,
        mulaw_encode_sample,
    )

    samples = [((k * 517) % 65536) - 32768 for k in range(33)]
    payload = encode_wav_mulaw(8000, samples)
    rate, ch, out, codec = decode_wav_full(payload)
    assert (rate, ch, codec) == (8000, 1, "pcm_mulaw")
    assert out == [mulaw_decode_sample(mulaw_encode_sample(s)) for s in samples]
    m = media_decoder(payload)
    assert m["codec"] == "pcm_mulaw" and m["mime"] == "audio/wav"
    assert m["n_frames"] == 33 and abs(m["duration_s"] - 33 / 8000) < 1e-12
    # histogram counts recover exactly and describe the DECODED samples
    counts = [round(f * 33) for f in m["features"]]
    assert sum(counts) == 33
    # PCM containers still report pcm_s16le through the same walk
    assert media_decoder(encode_wav(8000, samples))["codec"] == "pcm_s16le"


if _HAS_HYPOTHESIS:

    @settings(max_examples=40, deadline=None)
    @given(
        rate=st.integers(1, 48000),
        samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64),
    )
    def test_mulaw_wav_roundtrip_property(rate, samples):
        """Any int16 stream survives the full encode→container→decode walk
        with per-sample values equal to the canonical companded value, and
        re-encoding the decoded stream is bit-identical (fixed point)."""
        from aleph2_contrib_spark.operators.codecs import (
            decode_wav_full,
            encode_wav_mulaw,
            mulaw_decode_sample,
            mulaw_encode_sample,
        )

        payload = encode_wav_mulaw(rate, samples)
        r2, ch, out, codec = decode_wav_full(payload)
        assert (r2, ch, codec) == (rate, 1, "pcm_mulaw")
        want = [mulaw_decode_sample(mulaw_encode_sample(s)) for s in samples]
        assert out == want
        assert encode_wav_mulaw(rate, out) == encode_wav_mulaw(rate, want)


# -- AVI (real RIFF video container) --------------------------------------------


def test_avi_roundtrip_and_demux_walk():
    from aleph2_contrib_spark.operators.codecs import (
        avi_frame_extractor,
        decode_avi,
        decode_ppm,
        encode_avi,
    )

    w, h = 5, 3
    frames = [
        bytes(((f * 53 + k * 7) % 256) for k in range(w * h * 3)) for f in range(4)
    ]
    payload = encode_avi(w, h, 10, frames)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert decode_avi(payload) == (w, h, 10, frames)
    # frame sampling re-encodes to PPM
    samp = avi_frame_extractor(payload, 2)
    assert len(samp) == 2 and decode_ppm(samp[1]) == (w, h, frames[2])


def test_avi_media_decoder_contract():
    from aleph2_contrib_spark.operators.codecs import encode_avi, media_decoder

    w, h = 4, 3
    gray = [(k * 11) % 256 for k in range(w * h)]
    frame0 = b"".join(bytes((g, g, g)) for g in gray)
    frame1 = bytes(w * h * 3)
    m = media_decoder(encode_avi(w, h, 8, [frame0, frame1]))
    assert (m["mime"], m["codec"]) == ("video/x-msvideo", "rawvideo")
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 2)
    assert m["duration_s"] == 2 / 8
    counts = [round(f * w * h) for f in m["features"]]
    want = [0] * 16
    for g in gray:
        want[g >> 4] += 1
    assert counts == want  # features describe the FIRST frame


def test_avi_fail_fast():
    import pytest

    from aleph2_contrib_spark.operators.codecs import decode_avi, encode_avi

    frames = [bytes(4 * 3 * 3)]
    payload = encode_avi(4, 3, 10, frames)
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(payload[:-6])
    # compressed fourcc must fail fast, not mis-decode
    bad = payload.replace(b"vidsDIB ", b"vidsH264", 1)
    with pytest.raises(ValueError, match="DIB"):
        decode_avi(bad)
    with pytest.raises(ValueError, match="non-empty"):
        encode_avi(4, 3, 10, [])
    with pytest.raises(ValueError, match="frame size"):
        encode_avi(4, 3, 10, [b"xx"])


if _HAS_HYPOTHESIS:

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 8),
        h=st.integers(1, 6),
        fps=st.integers(1, 60),
        n=st.integers(1, 6),
        data=st.data(),
    )
    def test_avi_roundtrip_property(w, h, fps, n, data):
        """Any RGB frame stack round-trips bit-exactly through the AVI
        container (DIB row padding, word-aligned chunks, odd sizes)."""
        from aleph2_contrib_spark.operators.codecs import decode_avi, encode_avi

        sz = w * h * 3
        frames = [
            bytes(
                data.draw(
                    st.lists(st.integers(0, 255), min_size=sz, max_size=sz)
                )
            )
            for _ in range(n)
        ]
        assert decode_avi(encode_avi(w, h, fps, frames)) == (w, h, fps, frames)
