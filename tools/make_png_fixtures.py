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


def average_hash(width: int, height: int, pixel) -> int:
    """Reference average-hash — the executable spec for
    graft.ops.Multimodal.averageHash (same integer arithmetic, same bit
    order): 8x8 floor-boundary blocks over the integer grayscale
    (r+g+b)//3, bit_i(by*8+bx) set iff blockSum*nTotal > totalSum*nBlock
    (cross-multiplied exact comparison against the global mean), packed
    MSB-first (block (0,0) is bit 63). Returned as a SIGNED 64-bit value
    to match Spark's LongType."""
    gray = [[sum(pixel(x, y)) // 3 for x in range(width)]
            for y in range(height)]
    total = sum(map(sum, gray))
    n_total = width * height
    h = 0
    for by in range(8):
        y0, y1 = by * height // 8, (by + 1) * height // 8
        for bx in range(8):
            x0, x1 = bx * width // 8, (bx + 1) * width // 8
            bs = sum(gray[y][x] for y in range(y0, y1) for x in range(x0, x1))
            nb = (y1 - y0) * (x1 - x0)
            bit = 1 if bs * n_total > total * nb else 0
            h = (h << 1) | bit
    return h - (1 << 64) if h >= (1 << 63) else h


def ahash_pixel_base(x: int, y: int):
    # block-structured 16x16 pattern: alternating dark/bright 2x2 blocks
    # with a mild per-pixel texture, so the 64 hash bits are a clean
    # checkerboard and single-pixel edits cannot flip a bit
    v = 200 if ((x // 2) + (y // 2)) % 2 else 40
    v += (x + y) % 3  # texture well inside the dark/bright margin
    return (v, v, v)


def ahash_pixel_neardup(x: int, y: int):
    # base + a small blemish confined to one bright block: the block
    # mean moves but stays above the global mean -> SAME 64-bit hash
    if (x, y) in ((4, 0), (5, 1)):
        return (160, 160, 160)
    return ahash_pixel_base(x, y)


def ahash_pixel_variant(x: int, y: int):
    # three bright 2x2 blocks (bx+by odd) dimmed BELOW the global mean
    # -> exactly those three bits flip (Hamming distance 3 from base)
    if (x // 2, y // 2) in ((2, 1), (5, 4), (0, 7)):
        return (60, 60, 60)
    return ahash_pixel_base(x, y)


def ahash_pixel_distinct(x: int, y: int):
    # inverted checkerboard phase -> all 64 bits differ from base
    v = 40 if ((x // 2) + (y // 2)) % 2 else 200
    v += (x + y) % 3
    return (v, v, v)


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
    # average-hash dedup family (16x16 -> every hash block is 2x2):
    # near-dup has hash == base, variant is Hamming 3, distinct is
    # Hamming 64 -- the image_ahash_dedup oracle states the pairs as
    # literals and MultimodalSpec pins the hash values printed here
    fam = [("ahash_base_16x16.png", ahash_pixel_base),
           ("ahash_neardup_16x16.png", ahash_pixel_neardup),
           ("ahash_variant_16x16.png", ahash_pixel_variant),
           ("ahash_distinct_16x16.png", ahash_pixel_distinct)]
    hashes = {}
    for name, px in fam:
        write_png(f"{OUT_DIR}/{name}", 16, 16, px)
        hashes[name] = average_hash(16, 16, px)
        print(f"  ahash({name}) = {hashes[name]}")
    for i in range(len(fam)):
        for j in range(i + 1, len(fam)):
            a, b = fam[i][0], fam[j][0]
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            print(f"  hamming({a}, {b}) = {d}")


if __name__ == "__main__":
    main()
