package graft.sources

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (ISO 32000-1 §7.6 / PDF 1.7 Algorithms
  * 2–7, plus the ISO 32000-2 hardened R6 hash) — enough to read the
  * empty-user-password documents that dominate real-world financial
  * reports. The reference's pdfplumber opens these transparently
  * (dask-with-dataframe-[2].py:102-104 / detail_notes.py:30-38), so a
  * "no password" PDF that is nonetheless RC4/AES-encrypted must yield
  * its text here too, not zero lines.
  *
  * Supported: V=1/2 (RC4, 40–128 bit), V=4 with /CFM V2 (RC4) or AESV2
  * (AES-128-CBC), V=5 R=5/6 (AESV3, AES-256-CBC). Both the empty USER
  * password and the empty OWNER password are tried (Algorithm 7 recovers
  * the user password from /O when only the owner password is empty).
  * Anything else — a real password, a /Filter other than /Standard, an
  * unknown /V — builds no decryptor and the caller keeps its documented
  * zero-lines behavior.
  *
  * Primitives: MD5/SHA-2 via `java.security.MessageDigest`, AES-CBC via
  * `javax.crypto` (both in every JDK); RC4 is implemented inline (the
  * JDK's ARCFOUR cipher is not guaranteed present in stripped images).
  */
private[graft] object PdfCrypt {

  /** The 32-byte password pad of Algorithm 2 (ISO 32000-1 Table 7.8). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** RC4 (symmetric: encrypt == decrypt). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbc(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** How streams/strings of one class are transformed. */
  private[sources] sealed trait Scheme
  private[sources] case object SchemeIdentity extends Scheme
  private[sources] case object SchemeRc4 extends Scheme
  private[sources] case object SchemeAesV2 extends Scheme
  private[sources] case object SchemeAesV3 extends Scheme

  /** "sAlT" — the AESV2 addition to the per-object key digest. */
  private val AesSalt = Array[Byte](0x73, 0x41, 0x6C, 0x54)

  /** Holds the file key; derives per-object keys and decrypts. */
  private[sources] final class Decryptor(fileKey: Array[Byte],
      stmScheme: Scheme, strScheme: Scheme) {

    /** Algorithm 1 step (a)–(c): per-object key for RC4/AESV2; AESV3
      * uses the file key unchanged.
      */
    private def objectKey(num: Int, gen: Int, aes: Boolean): Array[Byte] = {
      val tail = Array[Byte](
        (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val digest =
        if (aes) md5(fileKey, tail, AesSalt) else md5(fileKey, tail)
      digest.take(math.min(fileKey.length + 5, 16))
    }

    /** AES-CBC: leading 16 bytes are the IV; PKCS#5 padding stripped
      * defensively (a corrupt pad yields the raw block rather than an
      * exception — the caller's parse either survives or the stream is
      * skipped by the usual failure isolation).
      */
    private def aesDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      if (data.length < 32 || (data.length - 16) % 16 != 0)
        return Array.emptyByteArray
      val plain = aesCbc(Cipher.DECRYPT_MODE, key, data.take(16), data.drop(16))
      val padLen = plain.last & 0xff
      if (padLen >= 1 && padLen <= 16 && padLen <= plain.length &&
          plain.takeRight(padLen).forall(b => (b & 0xff) == padLen))
        plain.dropRight(padLen)
      else plain
    }

    private def apply(scheme: Scheme, num: Int, gen: Int,
        data: Array[Byte]): Array[Byte] = scheme match {
      case SchemeIdentity => data
      case SchemeRc4 => rc4(objectKey(num, gen, aes = false), data)
      case SchemeAesV2 => aesDecrypt(objectKey(num, gen, aes = true), data)
      case SchemeAesV3 => aesDecrypt(fileKey, data)
    }

    def decryptStream(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      apply(stmScheme, num, gen, data)

    /** Strings travel byte-preserving as ISO-8859-1 chars (see
      * [[Pdf.PStr]]); decrypt in that representation.
      */
    def decryptString(num: Int, gen: Int, str: String): String = {
      val bytes = new Array[Byte](str.length)
      var i = 0
      while (i < bytes.length) { bytes(i) = str.charAt(i).toByte; i += 1 }
      new String(apply(strScheme, num, gen, bytes),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  /** 32-byte padded password (Algorithm 2 step a). */
  private def pad32(pw: Array[Byte]): Array[Byte] =
    (pw.take(32) ++ Pad).take(32)

  private def intLE(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: file key from a PADDED 32-byte user password. */
  private def fileKeyR234(paddedUserPw: Array[Byte], o: Array[Byte], p: Int,
      docId: Array[Byte], r: Int, keyLen: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val extra =
      if (r >= 4 && !encryptMetadata) Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var key = md5(paddedUserPw, o.take(32), intLE(p), docId, extra).take(keyLen)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key).take(keyLen); i += 1 }
    }
    key
  }

  /** Algorithm 4 (R=2) / 5 (R≥3): the /U value this key would produce. */
  private def computeU(key: Array[Byte], docId: Array[Byte],
      r: Int): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, docId))
      var i = 1
      while (i <= 19) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i += 1
      }
      x
    }
  }

  /** U comparison: R≥3 only defines the first 16 bytes. */
  private def uMatches(computed: Array[Byte], u: Array[Byte], r: Int): Boolean =
    if (r == 2) java.util.Arrays.equals(computed.take(32), u.take(32))
    else java.util.Arrays.equals(computed.take(16), u.take(16))

  /** Algorithm 7 (decrypt side of 3): padded user password out of /O
    * given an owner password.
    */
  private def userPwFromOwner(ownerPw: Array[Byte], o: Array[Byte], r: Int,
      keyLen: Int): Array[Byte] = {
    var okey = md5(pad32(ownerPw))
    if (r >= 3) {
      var i = 0
      while (i < 50) { okey = md5(okey); i += 1 }
    }
    val key = okey.take(keyLen)
    if (r == 2) rc4(key, o.take(32))
    else {
      var x = o.take(32)
      var i = 19
      while (i >= 0) {
        x = rc4(key.map(b => (b ^ i).toByte), x)
        i -= 1
      }
      x
    }
  }

  /** The R=6 hardened hash (ISO 32000-2 §7.6.4.3.4 Algorithm 2.B);
    * R=5 (the deprecated Adobe extension) is a single SHA-256.
    */
  private[graft] def hashR56(r: Int, pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha(256, pw, salt, udata)
    if (r == 5) return k
    var round = 0
    var done = false
    while (!done) {
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesCbc(Cipher.ENCRYPT_MODE, k.take(16),
        k.slice(16, 32), k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = sum % 3 match {
        case 0 => sha(256, e)
        case 1 => sha(384, e)
        case _ => sha(512, e)
      }
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) done = true
    }
    k.take(32)
  }

  /** V=5: file key via the empty user or empty owner password
    * (Algorithms 2.A / 8 / 9). U/O are 48 bytes: 32 hash + 8 validation
    * salt + 8 key salt; UE/OE hold the AES-wrapped file key.
    */
  private def fileKeyV5(r: Int, u: Array[Byte], o: Array[Byte],
      ue: Array[Byte], oe: Array[Byte]): Option[Array[Byte]] = {
    if (u.length < 48 || o.length < 48) return None
    val empty = Array.emptyByteArray
    val zeroIv = new Array[Byte](16)
    // user-password route: hash(pw, validationSalt) == U[0..32)
    val uHash = hashR56(r, empty, u.slice(32, 40), empty)
    if (java.util.Arrays.equals(uHash, u.take(32)) && ue.length >= 32) {
      val ik = hashR56(r, empty, u.slice(40, 48), empty)
      return Some(aesCbc(Cipher.DECRYPT_MODE, ik, zeroIv, ue.take(32)))
    }
    // owner-password route: udata is the full 48-byte /U
    val oHash = hashR56(r, empty, o.slice(32, 40), u.take(48))
    if (java.util.Arrays.equals(oHash, o.take(32)) && oe.length >= 32) {
      val ik = hashR56(r, empty, o.slice(40, 48), u.take(48))
      return Some(aesCbc(Cipher.DECRYPT_MODE, ik, zeroIv, oe.take(32)))
    }
    None
  }

  /** Build a decryptor from the /Encrypt dictionary values and the first
    * /ID element, trying the empty user then the empty owner password.
    * None → the document needs a real password or an unsupported scheme;
    * the caller keeps its zero-lines contract.
    */
  private[graft] def build(filter: String, v: Int, r: Int, lengthBits: Int,
      o: Array[Byte], u: Array[Byte], ue: Array[Byte], oe: Array[Byte],
      p: Int, docId: Array[Byte], encryptMetadata: Boolean,
      stmCfm: String, strCfm: String): Option[Decryptor] = {
    if (filter != "Standard") return None
    def scheme(cfm: String): Option[Scheme] = cfm match {
      case "Identity" => Some(SchemeIdentity)
      case "V2" => Some(SchemeRc4)
      case "AESV2" => Some(SchemeAesV2)
      case "AESV3" => Some(SchemeAesV3)
      case _ => None
    }
    v match {
      case 1 | 2 =>
        // V=1 is 40-bit by definition; /Length only applies to V=2
        val keyLen =
          if (r == 2 || v == 1) 5 else math.max(5, math.min(16, lengthBits / 8))
        if (r != 2 && r != 3 && r != 4) return None
        fileKeyR234Verified(o, u, p, docId, r, keyLen, encryptMetadata)
          .map(key => new Decryptor(key, SchemeRc4, SchemeRc4))
      case 4 =>
        if (r != 4 && r != 3) return None
        val keyLen = math.max(5, math.min(16, lengthBits / 8))
        for {
          stm <- scheme(stmCfm)
          str <- scheme(strCfm)
          key <- fileKeyR234Verified(o, u, p, docId, r, keyLen, encryptMetadata)
        } yield new Decryptor(key, stm, str)
      case 5 =>
        if (r != 5 && r != 6) return None
        for {
          stm <- scheme(stmCfm)
          str <- scheme(strCfm)
          key <- fileKeyV5(r, u, o, ue, oe)
        } yield new Decryptor(key, stm, str)
      case _ => None
    }
  }

  /** R2–4 key: empty user password first, then the user password
    * recovered from /O with an empty owner password — accepting only a
    * key whose Algorithm 4/5 output reproduces /U.
    */
  private def fileKeyR234Verified(o: Array[Byte], u: Array[Byte], p: Int,
      docId: Array[Byte], r: Int, keyLen: Int,
      encryptMetadata: Boolean): Option[Array[Byte]] = {
    val candidates = Iterator(
      pad32(Array.emptyByteArray),
      userPwFromOwner(Array.emptyByteArray, o, r, keyLen))
    candidates
      .map(pw => fileKeyR234(pw, o, p, docId, r, keyLen, encryptMetadata))
      .find(key => uMatches(computeU(key, docId, r), u, r))
  }
}
