#!/usr/bin/env python3
"""(Re)generate fixtures/bin/calk_notes_cid_aesv2.pdf — the fixture that
combines BOTH real-world hard parts in one document:

  - MODERN layout: cross-reference STREAM, an object stream holding the
    catalog/page/font dicts, a subsetted Type0/CID font readable only
    through its /ToUnicode CMap, an indirect /Length (same document
    definition as tools/make_pdf_cid_fixture.py → calk_notes_cid.pdf);
  - AESV2 ENCRYPTION (V=4 R=4, empty user password), reusing the
    independent encryptor from tools/make_pdf_encrypted_fixtures.py.

This is the actual shape of a current-generation audited report: every
stream (object stream, CMap, both content streams) is AES-128-CBC
ciphertext under a per-object key, while the xref stream and the
strings INSIDE the object stream stay plaintext per spec. A reader must
get the decrypt→ObjStm→CMap→content chain right end to end; expected
text is identical to calk_notes_cid.pdf's.

Run from the repo root: python3 tools/make_pdf_enc_modern_fixture.py
"""
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_pdf_encrypted_fixtures import (  # noqa: E402
    aes_cbc, compute_o, compute_u, det_iv, file_key, hexstr, obj_key, pkcs5,
    DOC_ID)

OUT = "fixtures/bin/calk_notes_cid_aesv2.pdf"

# ----------------------------------------------------- glyph map (CID)

bfchar = {}


def gid(ch: str) -> int:
    if "a" <= ch <= "z":
        return 0x30 + (ord(ch) - ord("a"))
    if "0" <= ch <= "9":
        return 0x200 + (9 - int(ch))
    if ch not in bfchar:
        bfchar[ch] = 0x101 + (len(bfchar) * 7) % 251
    return bfchar[ch]


def enc_text(s: str) -> str:
    return "<" + "".join(f"{gid(c):04X}" for c in s) + ">"


PAGE1 = [
    "PT Subset CID Tbk",
    "Catatan Atas Laporan Keuangan",
    "1. Umum",
    "Entitas didirikan tahun 2001 dengan fon CID subset.",
]


def page1_content() -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for j, ln in enumerate(PAGE1):
        if j > 0:
            ops.append("0 -16 Td")
        ops.append(f"{enc_text(ln)} Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def page2_content() -> bytes:
    ops = [
        "BT", "/F1 12 Tf", "72 720 Td",
        f"[{enc_text('2. Ikhtisar ')} -20 {enc_text('Kebijakan')}] TJ",
        "0 -16 Td /F2 12 Tf (Laporan disusun sesuai SAK.) Tj",
        f"0 -16 Td /F1 12 Tf {enc_text('2.a. Instrumen Keuangan')} Tj",
        f"0 -16 Td {enc_text('Nilai wajar diukur per 31 Desember 2023.')} Tj",
        f"0 -16 Td {enc_text('3. Kas')} Tj",
        "0 -16 Td /F2 12 Tf (Saldo akhir 9.876.) Tj",
        "ET",
    ]
    return "\n".join(ops).encode("latin-1")


def tounicode_cmap() -> bytes:
    chars = "".join(
        f"<{g:04X}> <{ord(c):04X}>\n"
        for c, g in sorted(bfchar.items(), key=lambda kv: kv[1]))
    digits = " ".join(f"<{ord(str(9 - i)):04X}>" for i in range(10))
    cmap = f"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) /Supplement 0 >> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
{len(bfchar)} beginbfchar
{chars}endbfchar
1 beginbfrange
<0030> <0049> <0061>
endbfrange
1 beginbfrange
<0200> <0209> [{digits}]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
    return cmap.encode("latin-1")


def main() -> None:
    c1 = page1_content()
    c2 = page2_content()

    # ---- encryption setup: AESV2, empty user password (V=4 R=4)
    p = -3904
    r, key_len = 4, 16
    o = compute_o(b"", b"", r, key_len)
    key = file_key(b"", o, p, r, key_len)
    u = compute_u(key, r)

    def enc_stream(num: int, data: bytes) -> bytes:
        iv = det_iv(num)
        return iv + aes_cbc(obj_key(key, num, 0, aes=True), iv,
                            pkcs5(data), True)

    cmap_ct = enc_stream(9, zlib.compress(tounicode_cmap()))
    c1_ct = enc_stream(5, zlib.compress(c1))
    c2_ct = enc_stream(6, c2)  # raw body, indirect /Length

    inner = {
        1: "<< /Type /Catalog /Pages 2 0 R >>",
        2: ("<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 "
            "/Resources << /Font << /F1 7 0 R /F2 10 0 R >> >> >>"),
        3: "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >>",
        4: "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>",
        7: ("<< /Type /Font /Subtype /Type0 /BaseFont /GRAFTX+NotoSans "
            "/Encoding /Identity-H /DescendantFonts [8 0 R] /ToUnicode 9 0 R >>"),
        8: ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFTX+NotoSans "
            "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>"),
        10: "<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
    }
    nums = sorted(inner)
    offs, body = [], ""
    for n in nums:
        offs.append((n, len(body)))
        body += inner[n] + "\n"
    header = " ".join(f"{n} {o_}" for n, o_ in offs) + "\n"
    # object stream: flate first, then encrypted under ITS object key
    # (member strings like (Adobe) are plaintext inside — per spec they
    # are covered by the container's encryption, never doubly encrypted)
    objstm_ct = enc_stream(11, zlib.compress((header + body).encode("latin-1")))

    buf = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def emit(num: int, payload: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(payload)

    emit(5, (f"5 0 obj\n<< /Length {len(c1_ct)} /Filter /FlateDecode >>\nstream\n"
             .encode("latin-1") + c1_ct + b"\nendstream\nendobj\n"))
    emit(6, (b"6 0 obj\n<< /Length 13 0 R >>\nstream\n"
             + c2_ct + b"\nendstream\nendobj\n"))
    emit(9, (f"9 0 obj\n<< /Length {len(cmap_ct)} /Filter /FlateDecode >>\nstream\n"
             .encode("latin-1") + cmap_ct + b"\nendstream\nendobj\n"))
    emit(11, (f"11 0 obj\n<< /Type /ObjStm /N {len(nums)} /First {len(header)} "
              f"/Length {len(objstm_ct)} /Filter /FlateDecode >>\nstream\n"
              .encode("latin-1") + objstm_ct + b"\nendstream\nendobj\n"))
    emit(13, f"13 0 obj\n{len(c2_ct)}\nendobj\n".encode("latin-1"))
    # the encryption dict lives at a byte offset (never in an ObjStm)
    enc_dict = (f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
                f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                f"/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                f"/O {hexstr(o)} /U {hexstr(u)} >>")
    emit(14, f"14 0 obj\n{enc_dict}\nendobj\n".encode("latin-1"))

    # xref STREAM (object 12) — never encrypted
    size = 15
    xref_at = len(buf)
    offsets[12] = xref_at
    rows = []
    idx_of = {n: i for i, (n, _) in enumerate(offs)}
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in idx_of:
            rows.append((2, 11, idx_of[num]))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        else:
            raise AssertionError(f"object {num} unplaced")
    raw = b""
    prev = bytes(5)
    for t, a, b in rows:
        row = bytes([t]) + a.to_bytes(2, "big") + b.to_bytes(2, "big")
        raw += bytes([2]) + bytes((row[i] - prev[i]) % 256 for i in range(5))
        prev = row
    xdata = zlib.compress(raw)
    idhex = DOC_ID.hex().upper()
    buf.extend(
        (f"12 0 obj\n<< /Type /XRef /Size {size} /W [1 2 2] /Index [0 {size}] "
         f"/Root 1 0 R /Encrypt 14 0 R /ID [<{idhex}> <{idhex}>] "
         f"/Filter /FlateDecode "
         f"/DecodeParms << /Predictor 12 /Columns 5 >> "
         f"/Length {len(xdata)} >>\nstream\n").encode("latin-1")
        + xdata + b"\nendstream\nendobj\n")
    buf.extend(f"startxref\n{xref_at}\n%%EOF\n".encode("latin-1"))

    with open(OUT, "wb") as f:
        f.write(bytes(buf))
    print(f"wrote {OUT}: {len(buf)} bytes, {len(bfchar)} bfchar glyphs")


if __name__ == "__main__":
    main()
