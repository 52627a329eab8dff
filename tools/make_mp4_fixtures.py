#!/usr/bin/env python3
"""(Re)generate fixtures/video/*.mp4 — minimal ISO-BMFF containers for
the video CONTAINER-metadata path (graft.ops.Multimodal.probeVideo).
Pure struct packing: ftyp + moov(mvhd + N empty trak/tkhd). No media
samples — frame decode needs a codec this environment doesn't have and
stays stubbed; the container walk (brand, timescale, duration, track
count) is real and these fixtures pin it.

Run from the repo root: python3 tools/make_mp4_fixtures.py
"""
import os
import struct

OUT_DIR = "fixtures/video"


def box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def ftyp(brand: bytes) -> bytes:
    return box(b"ftyp", brand + struct.pack(">I", 0) + brand)


def mvhd(timescale: int, duration: int) -> bytes:
    payload = (b"\x00" + b"\x00\x00\x00"          # version 0 + flags
               + struct.pack(">II", 0, 0)          # ctime, mtime
               + struct.pack(">II", timescale, duration)
               + struct.pack(">I", 0x00010000)     # rate 1.0
               + struct.pack(">H", 0x0100)         # volume 1.0
               + b"\x00" * 10                      # reserved
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + b"\x00" * 24                      # pre_defined
               + struct.pack(">I", 2))             # next_track_ID
    return box(b"mvhd", payload)


def tkhd(track_id: int) -> bytes:
    payload = (b"\x00" + b"\x00\x00\x07"
               + struct.pack(">II", 0, 0)
               + struct.pack(">I", track_id)
               + b"\x00" * 4
               + struct.pack(">I", 0)              # duration
               + b"\x00" * 8
               + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
               + struct.pack(">II", 0, 0))         # width, height (16.16)
    return box(b"trak", box(b"tkhd", payload))


def write_mp4(path: str, brand: bytes, timescale: int, duration: int,
              n_tracks: int) -> None:
    moov = box(b"moov", mvhd(timescale, duration)
               + b"".join(tkhd(i + 1) for i in range(n_tracks)))
    data = ftyp(brand) + moov
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path}: {len(data)} bytes, {n_tracks} tracks, "
          f"{duration * 1000 // timescale} ms")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    # timescale 1000 -> duration field IS milliseconds (exact)
    write_mp4(f"{OUT_DIR}/clip_av.mp4", b"isom", 1000, 2500, 2)
    write_mp4(f"{OUT_DIR}/clip_v.mp4", b"mp42", 600, 1200, 1)  # 2000 ms


if __name__ == "__main__":
    main()
