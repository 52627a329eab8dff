#!/usr/bin/env python3
"""Generate an N-times PNG corpus for the image-query scale soak.

The committed fixtures (fixtures/img, 13 files) are pinned by oracle
literals and cannot grow; this writes `copies` clones of each fixture
family into a fresh directory that graft's image queries read when
SPARK_GRAFT_IMG_DIR points at it. Growth means MORE distinct images:
every clone's pixels mix the clone index into a per-pixel LCG-ish
formula, so aHash/dHash/pHash values are effectively uniform across
clones — banded Hamming-LSH joins see realistic bucket sparsity, not a
copies-sized exact-duplicate clique (the trap the embedding soak data
documents in BENCH_SOAK's note).

File names keep each family's glob-matching prefix (ahash_*, phash_*,
solid_*) so every query scans its own corpus slice, exactly as at 1x.

Usage: python3 tools/make_soak_images.py <outdir> <copies>
"""
import os
import struct
import sys
import zlib


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


# (family prefix, width, height) mirroring the committed fixture set —
# same dimensions so per-image decode cost matches the 1x base and the
# soak ratio isolates CORPUS growth.
FAMILIES = [
    ("ahash_base_16x16", 16, 16),
    ("ahash_distinct_16x16", 16, 16),
    ("ahash_neardup_16x16", 16, 16),
    ("ahash_variant_16x16", 16, 16),
    ("checker_2x2", 2, 2),
    ("gradient_16x2", 16, 2),
    ("hash_uneven_48x40", 48, 40),
    ("phash_base_32x32", 32, 32),
    ("phash_distinct_32x32", 32, 32),
    ("phash_neardup_32x32", 32, 32),
    ("phash_variant_32x32", 32, 32),
    ("solid_gray_4x4", 4, 4),
    ("solid_red_8x6", 8, 6),
]


def main() -> None:
    outdir, copies = sys.argv[1], int(sys.argv[2])
    os.makedirs(outdir, exist_ok=True)
    n = 0
    for c in range(copies):
        for fi, (stem, w, h) in enumerate(FAMILIES):
            seed = c * 131 + fi * 17

            def pixel(x, y, s=seed):
                # deterministic pseudo-random RGB: distinct per clone,
                # structured enough to compress, no two clones share a
                # perceptual hash in practice
                v = (x * 37 + y * 61 + x * y * 7 + s * 97) & 0xFF
                return (v, (v * 3 + s) & 0xFF, (v * 5 + 2 * s) & 0xFF)

            write_png(os.path.join(outdir, f"{stem}_c{c}.png"), w, h, pixel)
            n += 1
    print(f"wrote {n} PNGs to {outdir}")


if __name__ == "__main__":
    main()
