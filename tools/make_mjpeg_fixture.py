#!/usr/bin/env python3
"""(Re)generate fixtures/video/mjpeg_clip.mp4 — an ISO-BMFF container
whose single video track is Motion-JPEG: every sample is an independent
baseline JPEG, so the JDK's ImageIO can decode real FRAMES with no
external codec (graft.ops.Multimodal.decodeVideoFrames). The three
16x16 frames (solid red, gray gradient, solid blue) were encoded once
with the JDK's own JPEG writer and are embedded below as hex so this
tool is self-contained and the fixture is bit-reproducible.

Layout: ftyp + mdat(3 jpeg samples) + moov(mvhd + trak(tkhd + mdia(
mdhd + hdlr(vide) + minf(stbl(stsd 'jpeg' + stts + stsc + stsz +
stco))))) — offsets in stco point into mdat, one chunk holding all
three samples.

Run from the repo root: python3 tools/make_mjpeg_fixture.py
"""
import struct

FRAMES = [bytes.fromhex(h) for h in (
    'ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080010001003012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00e2e8a28af993f713ffd9',
    'ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080010001003012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00f3af05ff00cb3afa27c17ff2cebe76f05ffcb3afa27c17ff002ce803ffd9',
    'ffd8ffe000104a46494600010200000100010000ffdb004300080606070605080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ffdb0043010909090c0b0c180d0d1832211c213232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232323232ffc00011080010001003012200021101031101ffc4001f0000010501010101010100000000000000000102030405060708090a0bffc400b5100002010303020403050504040000017d01020300041105122131410613516107227114328191a1082342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445464748494a535455565758595a636465666768696a737475767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffc4001f0100030101010101010101010000000000000102030405060708090a0bffc400b51100020102040403040705040400010277000102031104052131061241510761711322328108144291a1b1c109233352f0156272d10a162434e125f11718191a262728292a35363738393a434445464748494a535455565758595a636465666768696a737475767778797a82838485868788898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9faffda000c03010002110311003f00f1ca28a2bf713cc3ffd9',
)]


def box(tag, payload):
    return struct.pack(">I", 8 + len(payload)) + tag + payload


def full(tag, payload, version=0, flags=0):
    return box(tag, bytes([version]) + flags.to_bytes(3, "big") + payload)


def main():
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat_payload = b"".join(FRAMES)
    mdat = box(b"mdat", mdat_payload)
    # sample offsets inside the FILE: ftyp, then mdat header (8), then frames
    base = len(ftyp) + 8
    offs = [base]  # one chunk: first sample's offset only
    # ----- stbl
    # stsd: one 'jpeg' VisualSampleEntry (86 bytes, all-default fields)
    vse = (b"\x00" * 6 + struct.pack(">H", 1)        # reserved + data_ref_idx
           + b"\x00" * 16                             # predefineds/reserved
           + struct.pack(">HH", 16, 16)               # width, height
           + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
           + struct.pack(">I", 0) + struct.pack(">H", 1)  # reserved, frame_count
           + b"\x00" * 32                             # compressorname
           + struct.pack(">H", 24)                    # depth
           + struct.pack(">h", -1))                   # pre_defined
    stsd = full(b"stsd", struct.pack(">I", 1) + box(b"jpeg", vse))
    stts = full(b"stts", struct.pack(">III", 1, len(FRAMES), 500))  # 500/ts each
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, len(FRAMES), 1))
    stsz = full(b"stsz", struct.pack(">II", 0, len(FRAMES))
                + b"".join(struct.pack(">I", len(f)) for f in FRAMES))
    stco = full(b"stco", struct.pack(">I", len(offs))
                + b"".join(struct.pack(">I", o) for o in offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = full(b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1))
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 1500)
                + struct.pack(">HH", 0x55C4, 0))      # und language
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12
                + b"mjpeg\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", struct.pack(">III", 0, 0, 1)  # ctime mtime track_id
                + struct.pack(">II", 0, 1500)          # reserved, duration
                + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", 16 << 16, 16 << 16), flags=7)
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 1500)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + b"\x00" * 10
                + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + b"\x00" * 24 + struct.pack(">I", 2))
    moov = box(b"moov", mvhd + trak)
    with open("fixtures/video/mjpeg_clip.mp4", "wb") as f:
        f.write(ftyp + mdat + moov)
    print("wrote fixtures/video/mjpeg_clip.mp4",
          len(ftyp + mdat + moov), "bytes,", len(FRAMES), "jpeg samples")


if __name__ == "__main__":
    main()
