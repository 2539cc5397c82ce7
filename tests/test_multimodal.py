"""Multimodal plumbing: binary schema, stub gates, pruning behavior.

Oracle equivalence for the registered multimodal_* operators is covered
by test_queries_oracle.py; this file checks the module-specific
properties.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

from load_datawarehouse_spark.ops import multimodal as mm


def test_media_table_schema(spark):
    m = mm.media_table(spark, SF_DIR)
    # shape (names + types) — nullability flags differ for literals
    assert m.schema.simpleString() == mm.MEDIA_SCHEMA.simpleString()
    row = m.orderBy("doc_id").first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["n_bytes"] == len(row["content"])


def test_non_png_without_pillow_and_non_wav_without_soundfile_raise():
    # JPEG bytes need Pillow, MP3 bytes need soundfile (both absent in
    # this container); the availability gates must say which library
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="Pillow"):
            mm.decode_image_real(b"\xff\xd8\xff\xe0 not a png", {})
    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="soundfile"):
            mm.decode_audio_real(b"ID3\x04 not a wav", {})


def test_wav_codec_round_trip_mono_and_stereo():
    import numpy as np

    rng = np.random.RandomState(11)
    for channels, n_frames, rate in [(1, 1, 8000), (1, 37, 16000), (2, 24, 44100)]:
        sig = rng.randint(-32768, 32768, size=n_frames * channels).astype(np.int16)
        dec, r = mm.decode_audio_real(mm.encode_wav(sig, rate, channels))
        assert r == rate and dec.shape == (n_frames, channels)
        assert np.array_equal(dec.reshape(-1), sig)


def test_wav_decoder_8bit_and_word_alignment():
    """Hand-build an 8-bit mono WAV with an odd-length data chunk
    followed by a LIST chunk (our encoder only emits 16-bit) so the
    unsigned-center-128 path and RIFF word alignment are exercised."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255])
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    dec, rate = mm.decode_audio_real(wav)
    assert rate == 8000 and dec.reshape(-1).tolist() == [-128, 0, 127]


def test_wav_decoder_rejects_corrupt_chunks():
    """Advisor r5: a corrupted data-chunk length must raise, not
    silently truncate; odd 16-bit data and frame-misaligned stereo
    data must surface as ValueError, not a raw numpy error; and a
    duplicate trailing fmt chunk must NOT override the first pair."""
    import struct

    import numpy as np

    try:
        import soundfile  # noqa: F401

        pytest.skip("stdlib WAV fallback not reachable with soundfile present")
    except ImportError:
        pass

    def wav(chunks: bytes) -> bytes:
        body = b"WAVE" + chunks
        return b"RIFF" + struct.pack("<I", len(body)) + body

    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunk = lambda tag, payload: tag + struct.pack("<I", len(payload)) + payload

    # declared data length overruns the buffer
    overrun = wav(chunk(b"fmt ", fmt16) + b"data" + struct.pack("<I", 1000) + b"\x01\x02")
    with pytest.raises(ValueError, match="declares 1000 bytes"):
        mm.decode_audio_real(overrun)

    # odd-length 16-bit data
    odd = wav(chunk(b"fmt ", fmt16) + chunk(b"data", b"\x01\x02\x03"))
    with pytest.raises(ValueError, match="odd"):
        mm.decode_audio_real(odd)

    # stereo data not frame-aligned (3 samples, 2 channels)
    fmt_st = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    misaligned = wav(chunk(b"fmt ", fmt_st) + chunk(b"data", b"\x01\x00\x02\x00\x03\x00"))
    with pytest.raises(ValueError, match="frame-aligned"):
        mm.decode_audio_real(misaligned)

    # truncated fmt chunk
    short_fmt = wav(chunk(b"fmt ", fmt16[:10]) + chunk(b"data", b"\x01\x00"))
    with pytest.raises(ValueError, match="fmt chunk too short"):
        mm.decode_audio_real(short_fmt)

    # duplicate fmt AFTER the first fmt/data pair is ignored (first wins)
    fmt_dup = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    dup = wav(chunk(b"fmt ", fmt16) + chunk(b"data", b"\x07\x00") + chunk(b"fmt ", fmt_dup))
    dec, rate = mm.decode_audio_real(dup)
    assert rate == 8000 and np.array_equal(dec.reshape(-1), [7])


def test_png_codec_round_trip_all_shapes():
    # decode contract (round-8 ADVICE #3): ALWAYS HxWx3, matching the
    # Pillow path's .convert("RGB") — grayscale replicates luma, RGBA
    # drops alpha (no compositing), so the shape no longer depends on
    # whether Pillow happens to be installed
    import numpy as np

    rng = np.random.RandomState(7)
    for shape in [(2, 2, 3), (5, 9, 3), (4, 3, 1), (6, 6, 4)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        dec = mm.decode_image_real(mm.encode_png(a))
        h, w, c = shape
        assert dec.shape == (h, w, 3)
        if c == 1:
            assert np.array_equal(dec, np.repeat(a, 3, axis=2))
        elif c == 4:
            assert np.array_equal(dec, a[:, :, :3])
        else:
            assert np.array_equal(dec, a)


def test_png_gray_alpha_decode_is_rgb():
    # 2-channel gray+alpha: luma replicated, alpha dropped — Pillow
    # LA->RGB semantics
    import numpy as np

    a = np.dstack(
        [
            np.arange(12, dtype=np.uint8).reshape(3, 4),
            np.full((3, 4), 77, dtype=np.uint8),
        ]
    )
    dec = mm.decode_image_real(mm.encode_png(a))
    assert dec.shape == (3, 4, 3)
    assert np.array_equal(dec, np.repeat(a[:, :, :1], 3, axis=2))


def test_png_unfilter_handles_all_filter_types():
    """Hand-build a PNG whose scanlines use filters 1-4 (our encoder
    only emits 0) so the Sub/Up/Average/Paeth reversal is exercised."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(11)
    h, w, c = 4, 5, 3
    a = rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)
    stride = w * c
    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y, ftype in zip(range(h), [1, 2, 3, 4]):
        cur = a[y].reshape(-1)
        filt = np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            left = int(cur[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc_ else up if pb <= pc_ else ul
            filt[x] = (int(cur[x]) - pred) & 0xFF
        rows.append(bytes([ftype]) + filt.tobytes())
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image_real(png), a)


def test_png_16bit_round_trip_downscales_to_8bit():
    """16-bit PNG decodes through the same filter code (bpp=2*c byte
    offsets) and lands on the 8-bit output contract via >> 8."""
    import numpy as np

    def to_rgb(a8):
        c = a8.shape[2]
        if c == 1:
            return np.repeat(a8, 3, axis=2)
        if c == 2:
            return np.repeat(a8[:, :, :1], 3, axis=2)
        if c == 4:
            return a8[:, :, :3]
        return a8

    rng = np.random.RandomState(13)
    for shape in [(3, 4, 1), (5, 7, 3), (4, 4, 4), (2, 6, 2)]:
        a16 = rng.randint(0, 65536, size=shape).astype(np.uint16)
        dec = mm.decode_image_real(mm.encode_png(a16))
        assert dec.shape == (shape[0], shape[1], 3) and dec.dtype == np.uint8
        assert np.array_equal(dec, to_rgb((a16 >> 8).astype(np.uint8)))


def test_png_adam7_interlaced_round_trip():
    """Adam7 passes are independently filtered sub-images; odd sizes
    exercise empty and single-pixel passes."""
    import numpy as np

    def to_rgb(a8):
        c = a8.shape[2]
        if c == 1:
            return np.repeat(a8, 3, axis=2)
        if c == 4:
            return a8[:, :, :3]
        return a8

    rng = np.random.RandomState(17)
    for shape in [(1, 1, 3), (2, 3, 1), (7, 5, 3), (9, 9, 4), (8, 8, 3), (3, 13, 1)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        dec = mm.decode_image_real(mm.encode_png(a, interlace=True))
        assert np.array_equal(dec, to_rgb(a)), shape
    a16 = rng.randint(0, 65536, size=(6, 7, 3)).astype(np.uint16)
    dec = mm.decode_image_real(mm.encode_png(a16, interlace=True))
    assert np.array_equal(dec, (a16 >> 8).astype(np.uint8))


def test_png_palette_decode():
    """8-bit palette (color type 3) indices resolve through PLTE."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(19)
    h, w = 4, 6
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(h, w)).astype(np.uint8)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image_real(png), pal[idx])


def test_png_16bit_filtered_scanlines():
    """Filters on 16-bit data must predict from bpp = 2*channels bytes
    left (PNG spec §9) — an off-by-channels bpp would corrupt every
    Sub/Average/Paeth line. Hand-filter lines with types 1-4."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(23)
    h, w, c = 4, 5, 3
    a = rng.randint(0, 65536, size=(h, w, c)).astype(np.uint16)
    raw_rows = a.astype(">u2").reshape(h, -1).view(np.uint8)  # (h, w*c*2) bytes
    bpp = c * 2
    stride = w * c * 2
    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y, ftype in zip(range(h), [1, 2, 3, 4]):
        cur = raw_rows[y]
        filt = np.zeros(stride, dtype=np.uint8)
        for x in range(stride):
            left = int(cur[x - bpp]) if x >= bpp else 0
            up = int(prev[x])
            ul = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc_ else up if pb <= pc_ else ul
            filt[x] = (int(cur[x]) - pred) & 0xFF
        rows.append(bytes([ftype]) + filt.tobytes())
        prev = cur

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        mm._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_image_real(png), (a >> 8).astype(np.uint8))


def test_metadata_scan_prunes_binary_payload(spark):
    # The metadata projection must not read the payload column: the
    # optimized plan's schema should not mention `content`.
    plan = mm.multimodal_media_meta(spark, SF_DIR)._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan


def test_feature_extract_is_narrow(spark):
    # mapInPandas must not introduce a key shuffle before the decode.
    # The scan-spread round-robin (session._spread_small_scan) is
    # tolerated: it parallelizes the decode kernels at test scale and
    # its partition-count guard makes it vanish on a real many-file
    # corpus, so the payload still never key-shuffles at scale.
    df = mm.media_table(spark, SF_DIR).select("doc_id", "content").mapInPandas(
        mm._feature_batches, schema=mm._FEAT_SCHEMA
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


# --- FLAC codec (round-9 verdict item 6: the soundfile gate closed) ---


def _flac_stream(channels, rate, total, frames_bits):
    """Assemble a FLAC stream from hand-built frame payloads."""
    w = mm._BitWriter()
    w.write(4096, 16); w.write(4096, 16)
    w.write(0, 24); w.write(0, 24)
    w.write(rate, 20); w.write(channels - 1, 3); w.write(15, 5)
    w.write(total, 36); w.write(0, 64); w.write(0, 64)
    sinfo = w.bytes()
    out = bytearray(mm._FLAC_SIG) + bytes([0x80]) + len(sinfo).to_bytes(3, "big") + sinfo
    for fb in frames_bits:
        out += fb
    return bytes(out)


def _flac_frame(chan_code, n_sub_writer, bs, fi=0):
    """Frame header (+CRC8) + subframes via callback + CRC16."""
    w = mm._BitWriter()
    w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
    w.write(7, 4)       # 16-bit blocksize at end
    w.write(0, 4)       # rate from STREAMINFO
    w.write(chan_code, 4)
    w.write(4, 3)       # 16-bit samples
    w.write(0, 1)
    for b in mm._flac_utf8(fi):
        w.write(b, 8)
    w.write(bs - 1, 16)
    assert w.nbits == 0
    w.write(mm._crc8(bytes(w.buf)), 8)
    n_sub_writer(w)
    w.align()
    frame = bytes(w.buf)
    return frame + mm._crc16(frame).to_bytes(2, "big")


def _verbatim_sub(w, samples, bps):
    w.write(0, 1); w.write(1, 6); w.write(0, 1)
    for s in samples:
        w.write(s & ((1 << bps) - 1), bps)


def test_flac_stereo_decorrelation_modes():
    """left/side, right/side and mid/side frames must reconstruct the
    original stereo signal; the side channel carries bps+1 bits."""
    import numpy as np

    rng = np.random.RandomState(5)
    l = rng.randint(-32768, 32768, size=12).tolist()
    r = rng.randint(-32768, 32768, size=12).tolist()
    side = [a - b for a, b in zip(l, r)]
    mid = [(a + b) >> 1 for a, b in zip(l, r)]

    def ls(w):
        _verbatim_sub(w, l, 16)
        _verbatim_sub(w, side, 17)

    def rs(w):
        _verbatim_sub(w, side, 17)
        _verbatim_sub(w, r, 16)

    def ms(w):
        _verbatim_sub(w, mid, 16)
        _verbatim_sub(w, side, 17)

    for chan_code, sub in [(8, ls), (9, rs), (10, ms)]:
        blob = _flac_stream(2, 8000, 12, [_flac_frame(chan_code, sub, 12)])
        dec, rate = mm.decode_flac(blob)
        assert rate == 8000
        assert dec[:, 0].tolist() == l and dec[:, 1].tolist() == r, chan_code


def test_flac_constant_lpc_escape_and_wasted_bits():
    import numpy as np

    # CONSTANT subframe
    def const(w):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write((-123) & 0xFFFF, 16)

    blob = _flac_stream(1, 16000, 8, [_flac_frame(0, const, 8)])
    dec, _ = mm.decode_flac(blob)
    assert dec.reshape(-1).tolist() == [-123] * 8

    # LPC order 1, coeff [1], shift 0 == running sum of residuals
    x = [100, 90, 95, 95, -40, -40, -41, 7]

    def lpc(w):
        w.write(0, 1); w.write(32, 6); w.write(0, 1)  # LPC order 1
        w.write(x[0] & 0xFFFF, 16)  # warmup
        w.write(3, 4)   # precision 4
        w.write(0, 5)   # shift 0
        w.write(1, 4)   # coeff = +1
        # residual: escape partition (param 0xF), raw 16-bit
        w.write(0, 2); w.write(0, 4)
        w.write(0xF, 4); w.write(16, 5)
        for i in range(1, len(x)):
            w.write((x[i] - x[i - 1]) & 0xFFFF, 16)

    blob = _flac_stream(1, 16000, 8, [_flac_frame(0, lpc, 8)])
    dec, _ = mm.decode_flac(blob)
    assert dec.reshape(-1).tolist() == x

    # wasted bits: all samples share a low zero bit
    y = [2 * v for v in (-5, 3, 0, 8)]

    def wasted(w):
        w.write(0, 1); w.write(1, 6)
        w.write(1, 1)   # wasted-bits flag
        w.write(1, 1)   # unary 0 -> wasted = 1
        for v in y:
            w.write((v >> 1) & 0x7FFF, 15)  # bps reduced to 15

    blob = _flac_stream(1, 16000, 4, [_flac_frame(0, wasted, 4)])
    dec, _ = mm.decode_flac(blob)
    assert dec.reshape(-1).tolist() == y


def test_flac_crc_violations_raise():
    import numpy as np
    import pytest as pt

    sig = np.arange(-50, 50, dtype=np.int16)
    blob = bytearray(mm.encode_flac(sig, 8000, 1))
    blob[-1] ^= 0xFF  # corrupt the final frame CRC-16
    with pt.raises(ValueError, match="CRC-16"):
        mm.decode_flac(bytes(blob))


def test_flac_multiframe_and_via_decode_audio_real():
    import io

    import numpy as np

    rng = np.random.RandomState(9)
    sig = rng.randint(-32768, 32768, size=(10000, 2)).astype(np.int16)
    blob = mm.encode_flac(sig, 44100, 2, block_size=4096, fixed=True)
    # decode_audio_real takes the soundfile path when importable and
    # the stdlib decoder otherwise — equality must hold either way
    dec, rate = mm.decode_audio_real(blob)
    assert rate == 44100 and np.array_equal(dec, sig)
    try:
        import soundfile
    except ImportError:
        return
    # soundfile present: ALSO assert libsndfile itself accepts the
    # minimal encoder's stream (a strict libFLAC rejection would
    # otherwise surface only as amp_sum=-1 oracle failures in
    # soundfile-equipped environments)
    sf_dec, sf_rate = soundfile.read(io.BytesIO(blob), dtype="int16")
    assert sf_rate == 44100 and np.array_equal(
        np.asarray(sf_dec).reshape(-1, 2), sig
    )


def test_flac_round11_guards():
    # the three round-11 ADVICE hardenings: encoder channel range,
    # reserved sample-rate code 15, frame/STREAMINFO sample-size
    # mismatch (the int16 rescale would silently mis-scale)
    import numpy as np
    import pytest as pt

    with pt.raises(ValueError, match="channels"):
        mm.encode_flac(np.zeros(18, dtype=np.int16), 8000, channels=9)

    def frame(sr_code=0, ss_code=4):
        w = mm._BitWriter()
        w.write(0x3FFE, 14); w.write(0, 1); w.write(0, 1)
        w.write(7, 4)         # 16-bit blocksize at end
        w.write(sr_code, 4)
        w.write(0, 4)         # mono
        w.write(ss_code, 3)
        w.write(0, 1)
        for b in mm._flac_utf8(0):
            w.write(b, 8)
        w.write(4 - 1, 16)
        if sr_code == 12:
            w.write(77, 8)
        assert w.nbits == 0
        w.write(mm._crc8(bytes(w.buf)), 8)
        _verbatim_sub(w, [1, -2, 3, -4], mm._FLAC_SS.get(ss_code, 16))
        w.align()
        f = bytes(w.buf)
        return f + mm._crc16(f).to_bytes(2, "big")

    with pt.raises(ValueError, match="sample-rate code"):
        mm.decode_flac(_flac_stream(1, 16000, 4, [frame(sr_code=15)]))
    with pt.raises(ValueError, match="sample size"):
        # 8-bit frame declaration vs the 16-bit STREAMINFO
        mm.decode_flac(_flac_stream(1, 16000, 4, [frame(ss_code=1)]))
    # a matching explicit declaration (ss_code 4 = 16-bit) still decodes
    dec, rate = mm.decode_flac(_flac_stream(1, 16000, 4, [frame()]))
    assert rate == 16000 and dec.reshape(-1).tolist() == [1, -2, 3, -4]
