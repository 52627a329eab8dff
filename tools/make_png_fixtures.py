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


def dhash(width: int, height: int, pixel) -> int:
    """Reference difference-hash — the executable spec for the dhash
    column of graft.ops.Multimodal.perceptualHashes: an 8-row x 9-col
    floor-boundary block grid over the integer grayscale, bit (r*8+c)
    set iff block (r,c) mean < block (r,c+1) mean (exact
    cross-multiplied comparison), packed MSB-first (bit 63 = (0,0) vs
    (0,1)). Requires width >= 9 and height >= 8."""
    gray = [[sum(pixel(x, y)) // 3 for x in range(width)]
            for y in range(height)]
    bs, nb = {}, {}
    for r in range(8):
        y0, y1 = r * height // 8, (r + 1) * height // 8
        for c in range(9):
            x0, x1 = c * width // 9, (c + 1) * width // 9
            bs[(r, c)] = sum(gray[y][x]
                             for y in range(y0, y1) for x in range(x0, x1))
            nb[(r, c)] = (y1 - y0) * (x1 - x0)
    h = 0
    for r in range(8):
        for c in range(8):
            bit = 1 if bs[(r, c)] * nb[(r, c + 1)] < bs[(r, c + 1)] * nb[(r, c)] else 0
            h = (h << 1) | bit
    return h - (1 << 64) if h >= (1 << 63) else h


def _rdiv(a: int, b: int) -> int:
    # round-half-up division (half toward +inf), exact for negatives:
    # floor((2a + b) / (2b)) — mirrors Math.floorDiv in the Scala kernel
    return (2 * a + b) // (2 * b)


def _ctab():
    """Integer DCT-II cosine table ctab[k][n] = round(cos(pi*(2n+1)*k/64)
    * 1e6), k in 0..7, n in 0..31. The margin assert makes the table
    immune to last-ulp cos() differences between libm implementations:
    a 1-ulp wobble (~1e-10 after scaling) cannot cross a rounding
    boundary that is > 1e-3 away."""
    import math
    tab = []
    for k in range(8):
        row = []
        for n in range(32):
            t = math.cos(math.pi * (2 * n + 1) * k / 64.0) * 1e6
            assert abs(t - math.floor(t) - 0.5) > 1e-3, (k, n, t)
            row.append(math.floor(t + 0.5))
        tab.append(row)
    return tab


def phash(width: int, height: int, pixel) -> int:
    """Reference perceptual DCT hash — the executable spec for the phash
    column of graft.ops.Multimodal.perceptualHashes, integer-exact end
    to end (no float ever compared):
      1. 32x32 floor-boundary block means of the integer grayscale, in
         micro-units: bm = round_half_up(blockSum * 1e6 / nBlock);
      2. two-stage integer DCT-II with the 1e6-scaled cosine table,
         rescaled by round-half-up 1e6 division between stages (peak
         magnitudes 8.2e15 / 2.7e17 — Long-safe);
      3. the 63 AC coefficients of the top-left 8x8 (row-major, DC
         skipped), thresholded at their exact median (32nd smallest);
      4. bit 62 - idx set iff coef > median (packed MSB-first; bit 63
         unused, so the value is always a non-negative 63-bit Long).
    Requires width >= 32 and height >= 32."""
    gray = [[sum(pixel(x, y)) // 3 for x in range(width)]
            for y in range(height)]
    bm = [[0] * 32 for _ in range(32)]
    for by in range(32):
        y0, y1 = by * height // 32, (by + 1) * height // 32
        for bx in range(32):
            x0, x1 = bx * width // 32, (bx + 1) * width // 32
            s = sum(gray[y][x] for y in range(y0, y1) for x in range(x0, x1))
            bm[by][bx] = _rdiv(s * 1000000, (y1 - y0) * (x1 - x0))
    tab = _ctab()
    # stage 1: column-wise DCT over y -> R'[k][x] (rescaled to ~1e9)
    rp = [[_rdiv(sum(bm[y][x] * tab[k][y] for y in range(32)), 1000000)
           for x in range(32)] for k in range(8)]
    # stage 2: row-wise DCT over x -> F[k][l]
    ac = []
    for k in range(8):
        for l in range(8):
            if k == 0 and l == 0:
                continue
            ac.append(sum(rp[k][x] * tab[l][x] for x in range(32)))
    med = sorted(ac)[31]
    h = 0
    for v in ac:
        h = (h << 1) | (1 if v > med else 0)
    return h  # 63 bits -> always fits a signed 64-bit Long


def _phash_base_v(x: int, y: int) -> int:
    # rich-spectrum pseudo-pattern: the 63 AC coefficients spread over a
    # continuum, so the median's nearest neighbors sit ~1e13 away (a
    # block-checkerboard clusters its tiny ACs AT the median, where any
    # pixel edit reorders 20 bits — measured before choosing this)
    return (x * 37 + y * 23 + ((x * y) % 13) * 5) % 200 + 28


def phash_pixel_base(x: int, y: int):
    v = _phash_base_v(x, y)
    return (v, v, v)


def phash_pixel_neardup(x: int, y: int):
    # three +4 pixel blemishes: the worst-case DCT shift stays under the
    # base pattern's median gap -> SAME 63-bit phash (asserted below)
    if (x, y) in ((3, 3), (20, 9), (28, 30)):
        v = min(255, _phash_base_v(x, y) + 4)
        return (v, v, v)
    return phash_pixel_base(x, y)


def phash_pixel_variant(x: int, y: int):
    # one 8-px vertical band brightened: a moderate low-frequency change
    # -> Hamming 2 (asserted <= 3 below so the banded Hamming-LSH query
    # finds the pair at the same threshold as ahash)
    v = min(255, _phash_base_v(x, y) + (10 if x // 8 == 1 else 0))
    return (v, v, v)


def phash_pixel_distinct(x: int, y: int):
    # an unrelated pseudo-pattern -> Hamming 36 (asserted >= 20 below)
    v = (x * 53 + y * 41 + ((x + y) % 11) * 7) % 200 + 28
    return (v, v, v)


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
    # dhash values of the ahash family (same 16x16 images, 9x8 grid)
    for name, px in fam:
        print(f"  dhash({name}) = {dhash(16, 16, px)}")
    # perceptual-DCT family (32x32 -> every phash block is 1 pixel)
    pfam = [("phash_base_32x32.png", phash_pixel_base),
            ("phash_neardup_32x32.png", phash_pixel_neardup),
            ("phash_variant_32x32.png", phash_pixel_variant),
            ("phash_distinct_32x32.png", phash_pixel_distinct)]
    ph = {}
    for name, px in pfam:
        write_png(f"{OUT_DIR}/{name}", 32, 32, px)
        ph[name] = phash(32, 32, px)
        print(f"  phash({name}) = {ph[name]}")
        print(f"  dhash({name}) = {dhash(32, 32, px)}")
        print(f"  ahash({name}) = {average_hash(32, 32, px)}")
    ham = lambda a, b: bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1")
    for i in range(len(pfam)):
        for j in range(i + 1, len(pfam)):
            print(f"  phash hamming({pfam[i][0]}, {pfam[j][0]}) = "
                  f"{ham(pfam[i][0], pfam[j][0])}")
    assert ham("phash_base_32x32.png", "phash_neardup_32x32.png") == 0
    assert 1 <= ham("phash_base_32x32.png", "phash_variant_32x32.png") <= 3
    assert ham("phash_base_32x32.png", "phash_distinct_32x32.png") >= 20
    # uneven-block fixture (48x40: 32 does not divide either side) pins
    # the fractional block-mean path of both kernels in MultimodalSpec
    uneven = lambda x, y: (_phash_base_v(x, y),) * 3  # fractional blocks
    write_png(f"{OUT_DIR}/hash_uneven_48x40.png", 48, 40, uneven)
    print(f"  phash(hash_uneven_48x40.png) = {phash(48, 40, uneven)}")
    print(f"  dhash(hash_uneven_48x40.png) = {dhash(48, 40, uneven)}")
    print(f"  ahash(hash_uneven_48x40.png) = {average_hash(48, 40, uneven)}")


if __name__ == "__main__":
    main()
