"""Generate the tiny committed media fixtures for the real-codec tests
(tests/fixtures/media/) — deterministic, run-anywhere, stdlib only.

Pixel/sample values come from explicit formulas that the tests recompute
independently, so the fixtures are verifiable content, not opaque blobs:

- gradient_rgb.png : 16x12 RGB, per-row filters cycling 0..4 (exercises
                     every PNG unfilter path against known pixels)
- gray.png         : 8x8 grayscale, filter 0
- gradient.bmp     : 7x5 24-bit BMP (odd width exercises row padding)
- tone8.wav        : 8-bit PCM mono, 512 silence samples + 512 square-wave
- tone16.wav       : 16-bit PCM STEREO (channel-0 extraction), triangle wave

Re-run after any intentional change: python scripts/make_media_fixtures.py
"""

from __future__ import annotations

import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tranquility_spark.operators.codecs import bmp_encode, png_encode

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "media")


def gradient_rgb_pixels(w: int = 16, h: int = 12) -> bytes:
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 16) % 256, (y * 21) % 256, (x * y * 7) % 256)
    )


def gray_pixels(w: int = 8, h: int = 8) -> bytes:
    return bytes((x * 31 + y * 17) % 256 for y in range(h) for x in range(w))


def bmp_pixels(w: int = 7, h: int = 5) -> bytes:
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 36) % 256, (y * 50) % 256, (x + y * 13) % 256)
    )


def tone8_samples() -> bytes:
    # 512 silence (center 128) then 512 square wave +/-100
    return bytes([128] * 512 + [228 if i % 32 < 16 else 28 for i in range(512)])


def tone16_frames() -> bytes:
    # stereo: ch0 triangle wave amplitude 9000 period 64; ch1 constant junk
    out = bytearray()
    for i in range(800):
        phase = i % 64
        tri = (phase if phase < 32 else 64 - phase) * (9000 // 32) - 4500
        out += int(tri).to_bytes(2, "little", signed=True)
        out += int(1234).to_bytes(2, "little", signed=True)
    return bytes(out)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "gradient_rgb.png"), "wb") as f:
        f.write(
            png_encode(
                gradient_rgb_pixels(), 16, 12, 3, filters=[r % 5 for r in range(12)]
            )
        )
    with open(os.path.join(OUT, "gray.png"), "wb") as f:
        f.write(png_encode(gray_pixels(), 8, 8, 1))
    with open(os.path.join(OUT, "gradient.bmp"), "wb") as f:
        f.write(bmp_encode(bmp_pixels(), 7, 5))
    with wave.open(os.path.join(OUT, "tone8.wav"), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(tone8_samples())
    with wave.open(os.path.join(OUT, "tone16.wav"), "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(tone16_frames())
    print(f"wrote 5 media fixtures to {OUT}")


if __name__ == "__main__":
    main()
