"""Real-codec path for the multimodal operators (VERDICT r07 #4).

The committed fixtures under tests/fixtures/media/ hold REAL media bytes
(PNG/BMP/WAV produced by scripts/make_media_fixtures.py from explicit
pixel/sample formulas). These tests decode those real bytes through the
SAME mapInPandas operators the stub path uses (``impl="native"``), verify
the decoded content against independent recomputations of the formulas,
and pin the clear-error contract for the optional pillow/soundfile
bindings in environments (like this one) where those libs are absent.
"""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from tranquility_spark.operators import codecs as cx
from tranquility_spark.operators import multimodal as mm

MEDIA = os.path.join(os.path.dirname(__file__), "fixtures", "media")


def _read(name: str) -> bytes:
    with open(os.path.join(MEDIA, name), "rb") as f:
        return f.read()


# independent recomputation of the generator's formulas (duplicated on
# purpose — the test must not trust scripts/make_media_fixtures.py)
def _gradient_rgb() -> bytes:
    return bytes(
        v
        for y in range(12)
        for x in range(16)
        for v in ((x * 16) % 256, (y * 21) % 256, (x * y * 7) % 256)
    )


def _gray() -> bytes:
    return bytes((x * 31 + y * 17) % 256 for y in range(8) for x in range(8))


def _bmp_px() -> bytes:
    return bytes(
        v
        for y in range(5)
        for x in range(7)
        for v in ((x * 36) % 256, (y * 50) % 256, (x + y * 13) % 256)
    )


def test_png_codec_all_filter_types_roundtrip():
    """Every PNG filter type (None/Sub/Up/Average/Paeth) encodes and
    unfilters back to the exact source pixels, and the committed fixture
    (which cycles all five) decodes to the independently recomputed
    gradient — plus the header fields parse straight out of the bytes."""
    px = _gradient_rgb()
    for ftype in range(5):
        data = cx.png_encode(px, 16, 12, 3, filters=[ftype] * 12)
        assert cx.png_decode(data) == (16, 12, 3, px), f"filter {ftype}"
    fixture = _read("gradient_rgb.png")
    # IHDR width/height parsed independently of the codec under test
    assert struct.unpack(">II", fixture[16:24]) == (16, 12)
    assert cx.png_decode(fixture) == (16, 12, 3, px)
    assert cx.png_decode(_read("gray.png")) == (8, 8, 1, _gray())


def test_bmp_codec_roundtrip_with_padding():
    """Odd-width BMP (7px -> 3-byte row padding) round-trips; the committed
    fixture decodes to the recomputed pixels; width/height parse straight
    from the header bytes."""
    px = _bmp_px()
    assert cx.bmp_decode(cx.bmp_encode(px, 7, 5)) == (7, 5, 3, px)
    fixture = _read("gradient.bmp")
    assert struct.unpack_from("<ii", fixture, 18) == (7, 5)
    assert cx.bmp_decode(fixture) == (7, 5, 3, px)


def test_wav_decode_centering_and_channel_extraction():
    """8-bit PCM centers at -128; 16-bit stereo takes channel 0 (the
    triangle wave, not the constant junk channel)."""
    rate, s8 = cx.wav_decode(_read("tone8.wav"))
    assert rate == 8000 and len(s8) == 1024
    assert list(s8[:512]) == [0] * 512  # silence section
    assert set(s8[512:]) == {100, -100}  # square wave +/-100
    rate, s16 = cx.wav_decode(_read("tone16.wav"))
    assert rate == 16000 and len(s16) == 800
    expected = [
        ((i % 64) if (i % 64) < 32 else 64 - (i % 64)) * (9000 // 32) - 4500
        for i in range(800)
    ]
    assert list(s16) == expected
    assert 1234 not in set(s16)  # channel 1 junk never leaks


def test_native_image_decode_through_operator(spark):
    """REAL bytes through the mm1 operator: true dimensions and a checksum
    over decoded PIXELS (not payload bytes), PNG and BMP in one frame."""
    rows = [
        (1, bytearray(_read("gradient_rgb.png")), ("image/png",)),
        (2, bytearray(_read("gray.png")), ("image/png",)),
        (3, bytearray(_read("gradient.bmp")), ("image/bmp",)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = {r["doc_id"]: r for r in mm.decode_image_features(df, impl="native").collect()}
    assert (got[1]["width"], got[1]["height"]) == (16, 12)
    assert got[1]["checksum"] == sum(_gradient_rgb()) % 1000000007
    assert (got[2]["width"], got[2]["height"]) == (8, 8)
    assert got[2]["checksum"] == sum(_gray()) % 1000000007
    assert (got[3]["width"], got[3]["height"]) == (7, 5)
    assert got[3]["checksum"] == sum(_bmp_px()) % 1000000007
    assert got[3]["media_type"] == "image/bmp"
    assert got[1]["n_bytes"] == len(_read("gradient_rgb.png"))


def test_native_resize_through_operator(spark):
    """mm3 with impl='native': decode -> nearest-neighbor -> PNG re-encode.
    The output payload is a real PNG whose pixels equal an independent
    numpy nearest-neighbor gather of the source gradient."""
    df = spark.createDataFrame(
        [(1, bytearray(_read("gradient_rgb.png")), ("image/png",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    out = mm.resize_images(df, target_width=8, target_height=6, impl="native").collect()[0]
    assert (out["width"], out["height"]) == (8, 6)
    w, h, ch, px = cx.png_decode(bytes(out["payload"]))
    assert (w, h, ch) == (8, 6, 3)
    src = np.frombuffer(_gradient_rgb(), dtype=np.uint8).reshape(12, 16, 3)
    expected = src[(np.arange(6) * 12) // 6][:, (np.arange(8) * 16) // 8]
    assert px == expected.tobytes()


def test_native_wav_audio_energy_through_operator(spark):
    """mm4 with impl='native': a real 8-bit WAV frames through the SAME DSP
    as the stub — silent frames flag is_silence=1, square-wave frames have
    exact energy frame*100^2 — and the whole output equals an independent
    numpy replay of the framing over the known samples."""
    payload = bytearray(_read("tone8.wav"))
    df = spark.createDataFrame(
        [(1, payload, ("audio/wav",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = sorted(
        map(tuple, mm.audio_frame_energy(df, impl="native").collect())
    )
    _rate, samples = cx.wav_decode(bytes(payload))
    expect = []
    for fid in range((len(samples) - mm.FRAME) // mm.HOP + 1):
        w = samples[fid * mm.HOP : fid * mm.HOP + mm.FRAME]
        energy = int(np.dot(w, w))
        expect.append(
            (
                1,
                fid,
                mm.FRAME,
                energy,
                int(np.abs(w).max()),
                1 if energy < mm.SILENCE_MS * mm.FRAME else 0,
            )
        )
    assert got == sorted(expect)
    flags = {fid: sil for (_d, fid, _n, _e, _p, sil) in got}
    assert flags[0] == 1  # pure silence
    assert flags[len(flags) - 1] == 0  # pure square wave: energy = 100^2 * frame
    energies = {fid: e for (_d, fid, _n, e, _p, _s) in got}
    assert energies[len(energies) - 1] == 100 * 100 * mm.FRAME


def test_wav16_stereo_through_operator_with_scaled_threshold(spark):
    """16-bit stereo WAV: channel-0 triangle wave frames with a threshold
    matched to the 16-bit amplitude scale; every full-wave frame is loud."""
    df = spark.createDataFrame(
        [(7, bytearray(_read("tone16.wav")), ("audio/wav",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    rows = mm.audio_frame_energy(df, impl="native", silence_ms=1_000_000).collect()
    assert len(rows) == (800 - mm.FRAME) // mm.HOP + 1
    # mean square of the +/-4500 triangle is ~6.7e6 >> 1e6 threshold
    assert all(r["is_silence"] == 0 for r in rows)
    assert all(r["peak"] == 4500 for r in rows)


def test_optional_lib_impls_fail_clearly_when_absent(spark):
    """The pil/soundfile bindings must fail on the DRIVER with a message
    naming the package and the fallbacks — not inside executors. (Skipped
    if the lib is actually installed.)"""
    df = spark.createDataFrame(
        [(1, bytearray(b"x"), ("t",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed — error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="pillow.*impl='native'"):
        mm.decode_image_features(df, impl="pil")
    with pytest.raises(RuntimeError, match="pillow"):
        mm.resize_images(df, impl="pil")
    try:
        import soundfile  # noqa: F401

        pytest.skip("soundfile installed — error path not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="soundfile"):
        mm.audio_frame_energy(df, impl="soundfile")
    with pytest.raises(ValueError, match="impl must be one of"):
        mm.decode_image_features(df, impl="bogus")


def test_native_decode_rejects_unknown_format_clearly(spark):
    """A non-PNG/BMP payload through impl='native' raises with the sniffed
    magic and a pointer to impl='pil' (surfaced via the Python worker)."""
    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a notreally"), ("image/gif",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    with pytest.raises(Exception, match="impl='native' decodes PNG/BMP"):
        mm.decode_image_features(df, impl="native").collect()


def test_native_image_dhash_through_operator(spark):
    """mm6 with impl='native': REAL PNG/BMP bytes -> 9x8 nearest resample ->
    integer channel-mean grayscale -> gradient bits, checked against an
    independent numpy replay; and the perceptual property — a resized
    variant of the same image hashes CLOSE (small hamming), a different
    image hashes FAR."""
    import io

    rows = [
        (1, bytearray(_read("gradient_rgb.png")), ("image/png",)),
        (2, bytearray(_read("gray.png")), ("image/png",)),
        (3, bytearray(_read("gradient.bmp")), ("image/bmp",)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = {r["doc_id"]: r["dhash"] for r in mm.image_dhash(df, impl="native").collect()}

    def replay(raw):
        w, h, ch, px = cx.decode_image(raw)
        a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch)
        small = a[(np.arange(8) * h) // 8][:, (np.arange(9) * w) // 9]
        gray = small.astype(np.int64).sum(axis=2) // ch
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                if gray[r, c + 1] > gray[r, c]:
                    byte |= 1 << c
            out.append(byte)
        return "".join(f"{v:02x}" for v in out)

    for did, raw in ((1, _read("gradient_rgb.png")), (2, _read("gray.png")),
                     (3, _read("gradient.bmp"))):
        assert got[did] == replay(raw), did

    # perceptual property: the 16x12 gradient resized to 32x24 (same
    # visual content) hashes within a few bits; gray.png hashes far
    src = np.frombuffer(_gradient_rgb(), dtype=np.uint8).reshape(12, 16, 3)
    big = src[(np.arange(24) * 12) // 24][:, (np.arange(32) * 16) // 32]
    big_png = cx.png_encode(big.tobytes(), 32, 24, 3)
    df2 = spark.createDataFrame(
        [(10, bytearray(big_png), ("image/png",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got_big = mm.image_dhash(df2, impl="native").collect()[0]["dhash"]

    def ham(a, b):
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    assert ham(got_big, got[1]) <= 8          # same content, other size
    assert ham(got[2], got[1]) > 8            # different content


def test_audio_energy_fingerprint_stub_reference_and_dead_letter(spark):
    """mm7's stub fingerprint equals an independent pure-python replay of
    the recipe (tile to 520, 65 segment energies, adjacent-comparison
    bits), an empty payload dead-letters to NULL, and a small byte edit
    moves the digest only a few hamming bits (the near-dup signal dd25
    bands on)."""
    base = bytes((x * 37 + 11) % 256 for x in range(300))
    edited = bytearray(base)
    edited[7] = (edited[7] + 90) % 256  # one loud sample
    rows = [
        (1, bytearray(base), ("audio/fake",)),
        (2, bytearray(edited), ("audio/fake",)),
        (3, bytearray(b""), ("audio/fake",)),
        (4, bytearray(b"\x05"), ("audio/fake",)),  # 1 byte, tiles to 520
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = {
        r["doc_id"]: r["afp"]
        for r in mm.audio_energy_fingerprint(df).collect()
    }

    def replay(data: bytes) -> str:
        t = (data * (520 // len(data) + 1))[:520]
        dev = [b - 128 for b in t]
        e = [sum(d * d for d in dev[i * 8 : (i + 1) * 8]) for i in range(65)]
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                if e[r * 8 + c + 1] > e[r * 8 + c]:
                    byte |= 1 << c
            out.append(byte)
        return "".join(f"{v:02x}" for v in out)

    assert got[1] == replay(base)
    assert got[2] == replay(bytes(edited))
    assert got[3] is None  # empty payload dead-letters, no exception
    # a constant signal has constant segment energies -> no strict >
    assert got[4] == "00" * 8
    ham = bin(int(got[1], 16) ^ int(got[2], 16)).count("1")
    assert 1 <= ham <= 8  # localized edit moves few bits


def test_native_wav_audio_fingerprint_through_operator(spark):
    """mm7 with impl='native': a real 8-bit WAV demuxes through the SAME
    fingerprint DSP as the stub — digest equals an independent replay
    over wav_decode's centered samples — and amplitude scaling (the
    16-bit re-encode analogy) preserves the digest exactly, because
    energy ORDER is scale-invariant."""
    payload = bytearray(_read("tone8.wav"))
    df = spark.createDataFrame(
        [(1, payload, ("audio/wav",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = mm.audio_energy_fingerprint(df, impl="native").collect()[0]["afp"]

    _rate, samples = cx.wav_decode(bytes(payload))

    def replay(sam) -> str:
        t = np.tile(sam, 520 // len(sam) + 1)[:520]
        e = (t * t).reshape(65, 8).sum(axis=1)
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                if e[r * 8 + c + 1] > e[r * 8 + c]:
                    byte |= 1 << c
            out.append(byte)
        return "".join(f"{v:02x}" for v in out)

    assert got == replay(samples)
    # scale-invariance: 4x the amplitude (8->16-bit style) -> same digest
    assert replay(samples * 4) == got
    # corrupt WAV bytes dead-letter to NULL through the operator
    df_bad = spark.createDataFrame(
        [(2, bytearray(b"RIFFnotawav0"), ("audio/wav",))],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    assert (
        mm.audio_energy_fingerprint(df_bad, impl="native").collect()[0]["afp"]
        is None
    )


def test_video_frame_hashes_stub_reference_and_pinning(spark):
    """mm8's fused demux+digest pass equals (a) an independent
    pure-python replay, (b) mm3's sample_frames demux formula (hashing
    sample_frames' own slices yields the same digests — the inlined
    copy can't drift silently), and (c) mm6's image_dhash digest recipe
    (a frame slice fed to image_dhash as a payload hashes identically).
    Empty payloads dead-letter to one NULL-fhash row."""
    base = bytes((x * 53 + 19) % 256 for x in range(400))
    rows = [
        (1, bytearray(base), ("video/fake",)),
        (2, bytearray(b""), ("video/fake",)),
        (3, None, ("video/fake",)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    got = {
        (r["doc_id"], r["frame_idx"]): r["fhash"]
        for r in mm.video_frame_hashes(df).collect()
    }

    def dhash72(b: bytes):
        if len(b) == 0:
            return None
        px = list((b * (72 // max(len(b), 1) + 1))[:72])
        out = []
        for r in range(8):
            byte = 0
            for c in range(8):
                if px[r * 9 + c + 1] > px[r * 9 + c]:
                    byte |= 1 << c
            out.append(byte)
        return "".join(f"{v:02x}" for v in out)

    # (a) independent replay of the demux + digest; NULL and empty
    # payloads each dead-letter to one NULL-fhash row (the r15b
    # self-review fix: None used to TypeError in the worker)
    want = {(3, 0): None}
    for doc_id, payload in ((1, base), (2, b"")):
        duration_ms = (100 * len(payload)) % 60000
        n = min(max(duration_ms // 1000, 1), 8)
        for i in range(int(n)):
            lo = (i * 13000) % max(len(payload) - 16, 1)
            want[(doc_id, i)] = dhash72(payload[lo : lo + 16])
    assert got == want
    assert got[(2, 0)] is None  # empty payload dead-letters

    # (b) the demux formula matches mm3's sample_frames byte-for-byte
    frames = mm.sample_frames(
        df.filter(F.col("doc_id") == 1), every_ms=1000, max_frames=8
    ).collect()
    assert {
        (1, r["frame_idx"]): dhash72(bytes(r["payload"])) for r in frames
    } == {k: v for k, v in got.items() if k[0] == 1}

    # (c) the digest recipe matches mm6's image_dhash stub on the slices
    slice_df = spark.createDataFrame(
        [
            (r["frame_idx"], bytearray(bytes(r["payload"])), ("image/fake",))
            for r in frames
        ],
        "doc_id bigint, payload binary, media_meta struct<media_type:string>",
    )
    via_dhash = {
        r["doc_id"]: r["dhash"] for r in mm.image_dhash(slice_df).collect()
    }
    assert via_dhash == {k[1]: v for k, v in got.items() if k[0] == 1}
