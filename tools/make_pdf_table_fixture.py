#!/usr/bin/env python3
"""(Re)generate fixtures/bin/annual_table.pdf — the POSITIONED-text
fixture behind graft.ops.PdfTable (layout-aware table reconstruction).

Two pages, each carrying a 3-column financial table, laid out the two
ways real generators emit tables:

- page 1 (FlateDecode): every cell positioned ABSOLUTELY with its own
  `1 0 0 1 x y Tm`. One row's cells are written out of x-order (value
  columns before the label) so reconstruction must sort by x, and one
  row has sub-point baseline jitter (600.5 / 600 / 599.6) so
  reconstruction must band y, not group it exactly.
- page 2 (raw stream): cells positioned RELATIVELY with Td deltas from
  the text-line matrix, one TJ-array cell (kerned), and a trailing
  TL + ' (move-and-show) footnote — the Td/TD/T*/TL/quote state the
  run extractor claims to track.

The expected (x, y, text) runs — and the tables PdfTable reconstructs
from them — are hand-derivable from the operator streams below; the
pdf_table_* oracles state exactly those literals.

Run from the repo root: python3 tools/make_pdf_table_fixture.py
"""
import zlib

OUT = "fixtures/bin/annual_table.pdf"


def esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


# (x, y, text) — written in this order; row 3 deliberately x-shuffled,
# row 4 deliberately y-jittered.
PAGE1_CELLS = [
    (72, 720, "PT Contoh Sejahtera Tbk"),
    (72, 704, "Laporan Posisi Keuangan"),
    (72, 660, "Keterangan"), (300, 660, "2024"), (400, 660, "2023"),
    (72, 640, "Kas dan setara kas"), (300, 640, "1.234"), (400, 640, "987"),
    (300, 620, "5.678"), (72, 620, "Piutang usaha"), (400, 620, "4.321"),
    (72, 600.5, "Persediaan"), (300, 600, "2.468"), (400, 599.6, "2.400"),
]


def page1_content() -> bytes:
    ops = ["BT", "/F1 12 Tf"]
    for x, y, text in PAGE1_CELLS:
        ops.append(f"1 0 0 1 {x:g} {y:g} Tm ({esc(text)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def page2_content() -> bytes:
    ops = [
        "BT", "/F1 12 Tf",
        "72 720 Td (Laporan Laba Rugi) Tj",
        # table rows: label at x=72, values at x=300 / x=400; each row
        # returns via Td(-328, -20) from the previous line matrix
        "0 -40 Td (Keterangan) Tj",
        "228 0 Td (2024) Tj",
        "100 0 Td (2023) Tj",
        "-328 -20 Td (Pendapatan) Tj",
        "228 0 Td (9.000) Tj",
        "100 0 Td (8.500) Tj",
        "-328 -20 Td (Beban pokok) Tj",
        "228 0 Td (3.000) Tj",
        "100 0 Td (2.800) Tj",
        "-328 -20 Td (Laba kotor) Tj",
        "228 0 Td [(6.) -10 (000)] TJ",
        "100 0 Td (5.700) Tj",
        # footnote: TD-style return, then TL + ' (next-line-and-show)
        "-328 -24 Td (Catatan:) Tj",
        "16 TL",
        "(Angka dalam jutaan rupiah) '",
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
