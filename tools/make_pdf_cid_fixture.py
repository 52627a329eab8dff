#!/usr/bin/env python3
"""(Re)generate fixtures/bin/calk_notes_cid.pdf — the MODERN-layout PDF
fixture: cross-reference STREAM (FlateDecode + PNG Up predictor),
object streams holding the catalog/page/font dicts, and a subsetted
Type0/CID font whose show strings are 2-byte glyph indices that only
decode through the embedded /ToUnicode CMap (bfchar with scrambled
glyph ids, a scalar bfrange, and an array-form bfrange). One content
stream carries an INDIRECT /Length. This is the layout current-gen
report writers emit — the shape graft.sources.PdfDoc exists for.

Mapping scheme (deliberately non-identity so a raw-bytes reader emits
garbage): lowercase a-z at gid 0x30+i via a scalar bfrange, digits at
gid 0x200+i mapping to str(9-i) via an array bfrange (reversed!), and
everything else at scrambled gids from 0x101 via bfchar.

Run from the repo root: python3 tools/make_pdf_cid_fixture.py
"""
import zlib

OUT = "fixtures/bin/calk_notes_cid.pdf"

# ----------------------------------------------------------- glyph map

bfchar = {}  # char -> gid (scrambled, order of first use from 0x101)


def gid(ch: str) -> int:
    if "a" <= ch <= "z":
        return 0x30 + (ord(ch) - ord("a"))
    if "0" <= ch <= "9":
        return 0x200 + (9 - int(ch))  # array bfrange, REVERSED on purpose
    if ch not in bfchar:
        # scrambled: stride-7 walk over a 256-slot window keeps ids
        # unique and visibly non-monotonic vs. char order
        bfchar[ch] = 0x101 + (len(bfchar) * 7) % 251
    return bfchar[ch]


def enc(s: str) -> str:
    """Text -> CID hex string (2-byte big-endian gids)."""
    return "<" + "".join(f"{gid(c):04X}" for c in s) + ">"


# ------------------------------------------------------------ contents

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
        ops.append(f"{enc(ln)} Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def page2_content() -> bytes:
    ops = [
        "BT", "/F1 12 Tf", "72 720 Td",
        f"[{enc('2. Ikhtisar ')} -20 {enc('Kebijakan')}] TJ",
        "0 -16 Td /F2 12 Tf (Laporan disusun sesuai SAK.) Tj",
        f"0 -16 Td /F1 12 Tf {enc('2.a. Instrumen Keuangan')} Tj",
        f"0 -16 Td {enc('Nilai wajar diukur per 31 Desember 2023.')} Tj",
        f"0 -16 Td {enc('3. Kas')} Tj",
        "0 -16 Td /F2 12 Tf (Saldo akhir 9.876.) Tj",
        "ET",
    ]
    return "\n".join(ops).encode("latin-1")


def tounicode_cmap() -> bytes:
    # bfchar lines (scrambled singles), scalar bfrange (a-z), array
    # bfrange (digits, reversed)
    chars = "".join(
        f"<{g:04X}> <{ord(c):04X}>\n" for c, g in sorted(bfchar.items(), key=lambda kv: kv[1]))
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


# --------------------------------------------------------------- build

def main() -> None:
    # force the full glyph map before serializing the CMap
    c1 = page1_content()
    c2 = page2_content()
    cmap = zlib.compress(tounicode_cmap())
    c1z = zlib.compress(c1)

    # objects 1-4,7,8,10 live inside object stream 11
    inner = {
        1: "<< /Type /Catalog /Pages 2 0 R >>",
        # /Resources on the PAGES node: kids inherit it (exercises the
        # inheritance path in PdfDoc.pages)
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
    header = " ".join(f"{n} {o}" for n, o in offs) + "\n"
    objstm_plain = (header + body).encode("latin-1")
    objstm = zlib.compress(objstm_plain)

    buf = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}

    def emit(num: int, payload: bytes) -> None:
        offsets[num] = len(buf)
        buf.extend(payload)

    emit(5, (f"5 0 obj\n<< /Length {len(c1z)} /Filter /FlateDecode >>\nstream\n"
             .encode("latin-1") + c1z + b"\nendstream\nendobj\n"))
    # content 6: RAW body with an INDIRECT /Length (object 13)
    emit(6, (b"6 0 obj\n<< /Length 13 0 R >>\nstream\n"
             + c2 + b"\nendstream\nendobj\n"))
    emit(9, (f"9 0 obj\n<< /Length {len(cmap)} /Filter /FlateDecode >>\nstream\n"
             .encode("latin-1") + cmap + b"\nendstream\nendobj\n"))
    emit(11, (f"11 0 obj\n<< /Type /ObjStm /N {len(nums)} /First {len(header)} "
              f"/Length {len(objstm)} /Filter /FlateDecode >>\nstream\n"
              .encode("latin-1") + objstm + b"\nendstream\nendobj\n"))
    emit(13, f"13 0 obj\n{len(c2)}\nendobj\n".encode("latin-1"))

    # xref STREAM (object 12): W [1 2 2], PNG Up predictor
    size = 14
    xref_at = len(buf)
    offsets[12] = xref_at
    rows = []
    idx_of = {n: i for i, (n, _) in enumerate(offs)}
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in idx_of:
            rows.append((2, 11, idx_of[num]))  # in object stream 11
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
    buf.extend(
        (f"12 0 obj\n<< /Type /XRef /Size {size} /W [1 2 2] /Index [0 {size}] "
         f"/Root 1 0 R /Filter /FlateDecode "
         f"/DecodeParms << /Predictor 12 /Columns 5 >> "
         f"/Length {len(xdata)} >>\nstream\n").encode("latin-1")
        + xdata + b"\nendstream\nendobj\n")
    buf.extend(f"startxref\n{xref_at}\n%%EOF\n".encode("latin-1"))

    with open(OUT, "wb") as f:
        f.write(bytes(buf))
    print(f"wrote {OUT}: {len(buf)} bytes, {len(bfchar)} bfchar glyphs")


if __name__ == "__main__":
    main()
