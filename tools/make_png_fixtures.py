#!/usr/bin/env python3
"""(Re)generate fixtures/img/*.png — deterministic RGB images for the
real image-decode path (graft.ops.Multimodal.decodeImages via JDK
ImageIO). Written byte-by-byte with zlib only, so the fixtures are
reproducible without any imaging library.

Every image's channel means are exact by construction; the
image_decode_features oracle states them as literals.

Run from the repo root: python3 tools/make_png_fixtures.py
"""
import os
import struct
import zlib

OUT_DIR = "fixtures/img"


def chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def write_png(path: str, width: int, height: int, pixel) -> None:
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(
        b"\x00" + b"".join(bytes(pixel(x, y)) for x in range(width))
        for y in range(height))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)
    print(f"wrote {path}: {width}x{height}, {len(png)} bytes")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    # solid red 8x6 -> means (255, 0, 0)
    write_png(f"{OUT_DIR}/solid_red_8x6.png", 8, 6, lambda x, y: (255, 0, 0))
    # solid mid-gray 4x4 -> means (128, 128, 128)
    write_png(f"{OUT_DIR}/solid_gray_4x4.png", 4, 4, lambda x, y: (128, 128, 128))
    # horizontal gradient 16x2, v = 17*x in 0..255 -> mean 127.5 each channel
    write_png(f"{OUT_DIR}/gradient_16x2.png", 16, 2,
              lambda x, y: (17 * x, 17 * x, 17 * x))
    # 2x2 checkerboard black/white -> mean 127.5 each channel
    write_png(f"{OUT_DIR}/checker_2x2.png", 2, 2,
              lambda x, y: (255, 255, 255) if (x + y) % 2 else (0, 0, 0))


if __name__ == "__main__":
    main()
