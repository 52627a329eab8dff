#!/usr/bin/env python3
"""(Re)generate fixtures/audio/*.wav — deterministic PCM audio for the
real audio-decode path (graft.ops.Multimodal.decodeAudio via JDK
javax.sound.sampled). Pure stdlib (wave + struct); every expected
feature below is exact by construction and the audio_decode_features
oracle states them as literals.

Run from the repo root: python3 tools/make_wav_fixtures.py
"""
import os
import struct
import wave

OUT_DIR = "fixtures/audio"


def write_wav(path, rate, channels, samples):
    """samples: list of per-frame tuples (len == channels), 16-bit PCM."""
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            struct.pack("<" + "h" * channels, *f) for f in samples))
    print(f"wrote {path}: {rate} Hz, {channels} ch, {len(samples)} frames")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    # constant +1000 mono, 8000 Hz, 800 frames (100 ms) -> mean_abs 1000
    write_wav(f"{OUT_DIR}/const_mono_8k.wav", 8000, 1,
              [(1000,)] * 800)
    # square wave mono, 4000 Hz, 400 frames alternating ±2000 -> mean_abs 2000
    write_wav(f"{OUT_DIR}/square_mono_4k.wav", 4000, 1,
              [((-2000) if i % 2 else 2000,) for i in range(400)])
    # stereo 8000 Hz, 160 frames (20 ms): L=+500, R=-1500 -> mean_abs 1000
    write_wav(f"{OUT_DIR}/stereo_8k.wav", 8000, 2,
              [(500, -1500)] * 160)


if __name__ == "__main__":
    main()
