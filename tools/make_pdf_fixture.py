#!/usr/bin/env python3
"""(Re)generate fixtures/bin/calk_notes.pdf — the PDF-text-source fixture.

A deliberately classic PDF 1.4 layout (no object streams, no encryption):
- page 1's content stream is FlateDecode-compressed,
- page 2's is raw,
so both decode paths of graft.sources.PdfTextSource are exercised. Page 2
also uses TJ arrays (kerning), a hex string, the ' (move-and-show)
operator, and escaped parentheses — the text-op surface the extractor
claims to support.

Run from the repo root: python3 tools/make_pdf_fixture.py
"""
import zlib

OUT = "fixtures/bin/calk_notes.pdf"


def esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


PAGE1_LINES = [
    "PT Contoh Sejahtera Tbk",
    "Laporan Tahunan 2024",
    "Catatan Atas Laporan Keuangan",
    "1. Umum",
    "Entitas didirikan di Jakarta pada tahun 1995.",
    "Kantor pusat beralamat di Jalan Sudirman.",
]


def page1_content() -> bytes:
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for j, ln in enumerate(PAGE1_LINES):
        if j > 0:
            ops.append("0 -16 Td")
        ops.append(f"({esc(ln)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def page2_content() -> bytes:
    hex_heading = "2.a. Pernyataan Kepatuhan".encode("latin-1").hex().upper()
    ops = [
        "BT", "/F1 12 Tf", "72 720 Td",
        "[(2. Ikhtisar ) -20 (Kebijakan Akuntansi)] TJ",
        "0 -16 Td (Dasar penyusunan laporan keuangan adalah biaya historis.) Tj",
        f"0 -16 Td <{hex_heading}> Tj",
        "(Laporan keuangan disusun sesuai SAK.) '",
        "0 -16 Td (3. Kas dan Setara Kas) Tj",
        r"0 -16 Td [(Saldo kas ) -10 (\(lihat catatan 5\) )] TJ (adalah 1.234.) Tj",
        "ET",
    ]
    return "\n".join(ops).encode("latin-1")


def stream_obj(num: int, data: bytes, flate: bool) -> bytes:
    if flate:
        data = zlib.compress(data)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>"
    else:
        head = f"<< /Length {len(data)} >>"
    return (f"{num} 0 obj\n{head}\nstream\n".encode("latin-1")
            + data + b"\nendstream\nendobj\n")


def main() -> None:
    objs = {
        1: b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        2: b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n",
        3: (b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 5 0 R /Resources << /Font << /F1 7 0 R >> >> >>\nendobj\n"),
        4: (b"4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 6 0 R /Resources << /Font << /F1 7 0 R >> >> >>\nendobj\n"),
        5: stream_obj(5, page1_content(), flate=True),
        6: stream_obj(6, page2_content(), flate=False),
        7: (b"7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
            b"\nendobj\n"),
    }
    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += objs[num]
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode("latin-1")
    buf += b"0000000000 65535 f \n"
    for num in sorted(objs):
        buf += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
    with open(OUT, "wb") as f:
        f.write(bytes(buf))
    print(f"wrote {OUT}: {len(buf)} bytes")


if __name__ == "__main__":
    main()
