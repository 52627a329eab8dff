#!/usr/bin/env python3
"""(Re)generate the encrypted-PDF fixtures under fixtures/bin/.

Same document content as fixtures/bin/calk_notes.pdf (tools/
make_pdf_fixture.py) — so a decrypting reader must produce EXACTLY the
plaintext fixture's lines — encrypted four ways with the PDF standard
security handler and an empty user password:

  calk_notes_rc4.pdf     V=2 R=3, RC4 128-bit
  calk_notes_aesv2.pdf   V=4 R=4, /CF /StdCF /CFM /AESV2 (AES-128-CBC)
  calk_notes_aesv3.pdf   V=5 R=6, AESV3 (AES-256-CBC, hardened hash)
  calk_notes_locked.pdf  V=2 R=3 with a REAL user password ("hunter2")
                         — a reader without the password must yield
                         zero lines, not ciphertext garbage.

This is an INDEPENDENT implementation of the encryption side (ISO
32000-1 Algorithms 2/3/4/5, ISO 32000-2 2.A/2.B/8/9/10) in Python —
hashlib + a from-scratch RC4 + the `cryptography` package's AES — so the
Scala decryptor in src/main/scala/graft/sources/PdfCrypt.scala is tested
against a second, unrelated codebase, not against itself.

Run from the repo root: python3 tools/make_pdf_encrypted_fixtures.py
"""
import hashlib
import struct
import zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])

# deterministic fixtures: fixed doc ID and fixed AES IVs derived per object
DOC_ID = hashlib.md5(b"graft-encrypted-fixture").digest()


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for ch in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(ch ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def pad32(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


# ---------------------------------------------------------------- R3/R4

def compute_o(owner_pw: bytes, user_pw: bytes, r: int, key_len: int) -> bytes:
    """Algorithm 3: /O from the owner (or user) password."""
    h = hashlib.md5(pad32(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:key_len]
    x = pad32(user_pw)
    if r == 2:
        return rc4(okey, x)
    for i in range(20):
        x = rc4(bytes(b ^ i for b in okey), x)
    return x


def file_key(user_pw: bytes, o: bytes, p: int, r: int, key_len: int,
             encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2."""
    m = hashlib.md5()
    m.update(pad32(user_pw))
    m.update(o[:32])
    m.update(struct.pack("<i", p))
    m.update(DOC_ID)
    if r >= 4 and not encrypt_metadata:
        m.update(b"\xff\xff\xff\xff")
    key = m.digest()[:key_len]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:key_len]
    return key


def compute_u(key: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3)."""
    if r == 2:
        return rc4(key, PAD)
    x = rc4(key, hashlib.md5(PAD + DOC_ID).digest())
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16  # 16 defined bytes + 16 arbitrary


def obj_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    m = hashlib.md5()
    m.update(key)
    m.update(struct.pack("<i", num)[:3])
    m.update(struct.pack("<i", gen)[:2])
    if aes:
        m.update(b"sAlT")
    return m.digest()[: min(len(key) + 5, 16)]


# ------------------------------------------------------------------ R6

def hash_r6(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


# ------------------------------------------------------------- document

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


def write_pdf(out: str, encrypt_dict: bytes, enc_stream) -> None:
    """Assemble the two-page doc; enc_stream(num, gen, plaintext)->bytes
    encrypts a stream body (applied AFTER flate, i.e. encryption wraps
    the filtered data, matching the spec's order)."""

    def stream_obj(num: int, data: bytes, flate: bool) -> bytes:
        filt = ""
        if flate:
            data = zlib.compress(data)
            filt = " /Filter /FlateDecode"
        data = enc_stream(num, 0, data)
        head = f"<< /Length {len(data)}{filt} >>"
        return (f"{num} 0 obj\n{head}\nstream\n".encode("latin-1")
                + data + b"\nendstream\nendobj\n")

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
        8: b"8 0 obj\n" + encrypt_dict + b"\nendobj\n",
    }
    buf = bytearray(b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += objs[num]
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode("latin-1")
    buf += b"0000000000 65535 f \n"
    for num in sorted(objs):
        buf += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    idhex = DOC_ID.hex().upper()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Encrypt 8 0 R "
            f"/ID [<{idhex}> <{idhex}>] >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
    with open(out, "wb") as f:
        f.write(bytes(buf))
    print(f"wrote {out}: {len(buf)} bytes")


def hexstr(b: bytes) -> str:
    return "<" + b.hex().upper() + ">"


def det_iv(num: int) -> bytes:
    """Deterministic per-object IV (fixtures must be reproducible)."""
    return hashlib.md5(b"iv" + struct.pack("<i", num)).digest()


def pkcs5(data: bytes) -> bytes:
    n = 16 - len(data) % 16
    return data + bytes([n]) * n


def make_rc4(out: str, user_pw: bytes) -> None:
    p = -3904  # typical permission bits
    r, key_len = 3, 16
    o = compute_o(b"", user_pw, r, key_len)
    key = file_key(user_pw, o, p, r, key_len)
    u = compute_u(key, r)
    enc = (f"<< /Filter /Standard /V 2 /R 3 /Length 128 /P {p} "
           f"/O {hexstr(o)} /U {hexstr(u)} >>").encode("latin-1")
    write_pdf(out, enc,
              lambda n, g, d: rc4(obj_key(key, n, g, aes=False), d))


def make_aesv2(out: str) -> None:
    p = -3904
    r, key_len = 4, 16
    o = compute_o(b"", b"", r, key_len)
    key = file_key(b"", o, p, r, key_len)
    u = compute_u(key, r)
    enc = (f"<< /Filter /Standard /V 4 /R 4 /Length 128 /P {p} "
           f"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
           f"/StmF /StdCF /StrF /StdCF "
           f"/O {hexstr(o)} /U {hexstr(u)} >>").encode("latin-1")

    def enc_stream(n, g, d):
        iv = det_iv(n)
        return iv + aes_cbc(obj_key(key, n, g, aes=True), iv, pkcs5(d), True)

    write_pdf(out, enc, enc_stream)


def make_aesv3(out: str) -> None:
    p = -3904
    fkey = hashlib.sha256(b"graft-aesv3-file-key").digest()  # deterministic
    uvs, uks = b"UVALSALT", b"UKEYSALT"  # 8 bytes each
    u = hash_r6(b"", uvs) + uvs + uks
    ue = aes_cbc(hash_r6(b"", uks), b"\x00" * 16, fkey, True)
    ovs, oks = b"OVALSALT", b"OKEYSALT"
    o = hash_r6(b"", ovs, u) + ovs + oks
    oe = aes_cbc(hash_r6(b"", oks, u), b"\x00" * 16, fkey, True)
    # /Perms: AES-ECB(fkey, P || ff ff ff ff || 'T' adb 'nick'...) — spec
    # Algorithm 10; readers may verify, ours doesn't. Build it correctly.
    perms_plain = (struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T"
                   + b"adb" + b"grft")
    perms = aes_cbc(fkey, b"\x00" * 16, perms_plain[:16], True)
    enc = (f"<< /Filter /Standard /V 5 /R 6 /Length 256 /P {p} "
           f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
           f"/StmF /StdCF /StrF /StdCF "
           f"/O {hexstr(o)} /U {hexstr(u)} /OE {hexstr(oe)} /UE {hexstr(ue)} "
           f"/Perms {hexstr(perms)} >>").encode("latin-1")

    def enc_stream(n, g, d):
        iv = det_iv(n)
        return iv + aes_cbc(fkey, iv, pkcs5(d), True)

    write_pdf(out, enc, enc_stream)


def main() -> None:
    make_rc4("fixtures/bin/calk_notes_rc4.pdf", b"")
    make_aesv2("fixtures/bin/calk_notes_aesv2.pdf")
    make_aesv3("fixtures/bin/calk_notes_aesv3.pdf")
    make_rc4("fixtures/bin/calk_notes_locked.pdf", b"hunter2")


if __name__ == "__main__":
    main()
