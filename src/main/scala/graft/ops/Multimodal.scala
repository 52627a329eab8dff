package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct. The Spark-side
  * machinery (schema, batching, partitioning, explode-based frame
  * sampling) is real and tested. IMAGE decode/resize and AUDIO decode
  * are REAL — [[decodeImages]]/[[resizeImages]] run JDK ImageIO
  * (PNG/JPEG/BMP/GIF) and [[decodeAudio]] runs javax.sound.sampled
  * (WAV/AIFF/AU PCM) inside the executors at the mapPartitions batch
  * boundary, no external library. VIDEO frame decode is REAL for
  * intra-frame codecs — [[decodeVideoFrames]] walks the ISO-BMFF
  * sample tables and decodes Motion-JPEG samples with the same JDK
  * ImageIO — while inter-frame codecs (H.264 etc.), which genuinely
  * need a codec this environment lacks, stay behind the deterministic
  * stub ([[decodeBytesStub]]) at the same seam.
  */
object Multimodal {

  /** Canonical media-row schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Build a media table from a text corpus (UTF-8 bytes as the opaque
    * payload) — a deterministic stand-in for real image/audio bytes with
    * fake-but-stable metadata derived from the content hash. Columns
    * other than id/text pass through, so callers keep their dimensions
    * without re-joining the source.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bin = encode(col(textCol), "UTF-8")
    val h = TextOps.portableHash64(col(textCol), 7)
    val passthrough = df.columns
      .filterNot(c => c == idCol || c == textCol).map(col)
    df.select(
      (col(idCol).cast("long").as("media_id") +:
        bin.as("media") +:
        struct(
          lit("fake/raw").as("format"),
          (pmod(h, lit(512)) + 1).cast("int").as("width"),
          (pmod(h, lit(384)) + 1).cast("int").as("height"),
          (pmod(h, lit(5)) + 1).cast("int").as("n_frames")).as("meta") +:
        passthrough): _*)
  }

  /** STUB decode for the modalities whose codecs are absent here
    * (audio/video): deterministic per-payload "features" (byte length,
    * content digest, crc). Images go through [[decodeImages]], which is
    * a real decoder; everything downstream (columns, grouping, joins)
    * is identical across the two.
    */
  def decodeBytesStub(media: Column): Column =
    struct(
      length(media).as("n_bytes"),
      md5(media).as("digest"),
      crc32(media).as("crc"))

  /** REAL image decode: JDK ImageIO executed per partition inside the
    * executors. Input: (idCol string, bytesCol binary); output one row
    * per image — width, height, n_pixels, per-channel means (rounded to
    * 4 dp for engine-portable comparisons), or NULL dims for bytes that
    * don't decode (the per-source failure-isolation contract: corrupt
    * media must not kill the job).
    *
    * Scale shape: mapPartitions is the codec batch boundary — ImageIO's
    * reader registry is JVM-static (initialized once per executor); a
    * native decoder with per-thread contexts would init in the same
    * place. Feature extraction is one pass over getRGB per pixel; no
    * row leaves the executor carrying pixel data, only the fixed-width
    * feature struct — the property that keeps a 100 TB image corpus
    * shuffle-light.
    */
  def decodeImages(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("avg_r", DoubleType),
      StructField("avg_g", DoubleType),
      StructField("avg_b", DoubleType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          val img = readImage(bytes)
          if (img == null) {
            org.apache.spark.sql.Row(key, null, null, null, null, null, null)
          } else {
            val w = img.getWidth
            val h = img.getHeight
            // one bulk RGB fetch per row stripe — per-pixel getRGB pays a
            // ColorModel conversion + bounds check per CALL, several times
            // slower on the corpus-scale hot loop this kernel is
            val row = new Array[Int](w)
            var r = 0L; var g = 0L; var b = 0L
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, row, 0, w)
              var x = 0
              while (x < w) {
                val p = row(x)
                r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            def avg(sum: Long) =
              BigDecimal(sum.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
            org.apache.spark.sql.Row(key, w, h, n, avg(r), avg(g), avg(b))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Decoded image or null — NULL payloads and undecodable/corrupt bytes
    * must isolate, never throw (the failure-isolation contract all the
    * media kernels share).
    */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }

  /** Perceptual average-hash over REAL decoded pixels: 8×8
    * floor-boundary blocks of the integer grayscale `(r+g+b) div 3`,
    * bit (by·8+bx) set iff the block mean exceeds the global mean —
    * compared exactly by cross-multiplication
    * (`blockSum·nTotal > totalSum·nBlock`, no division; exact in Long
    * up to ~4.8 gigapixels — far past any decodable image) — packed
    * MSB-first (block (0,0) is bit 63). The executable spec lives in
    * tools/make_png_fixtures.py (`average_hash`), which also prints
    * the expected hashes the oracle/spec literals pin.
    *
    * Output: (media_key, width, height, ahash) — NULL hash for bytes
    * that don't decode or images under 8×8 (a block would be empty).
    * Same mapPartitions codec boundary and fixed-width-output contract
    * as [[decodeImages]]: no pixel data survives past the executor, so
    * a 100 TB image corpus ships 8 bytes per image into the dedup
    * join.
    */
  def averageHash(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("ahash", LongType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          val img = readImage(bytes)
          if (img == null)
            org.apache.spark.sql.Row(key, null, null, null)
          else {
            val gray = grayMatrix(img)
            org.apache.spark.sql.Row(key, img.getWidth, img.getHeight,
              ahashOf(gray))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** All three standard perceptual hashes in ONE decode pass —
    * (media_key, width, height, ahash, dhash, phash). Each hash is NULL
    * when the image is too small for its grid (ahash 8×8, dhash 9×8,
    * phash 32×32); all are NULL when the bytes don't decode. Executable
    * specs and pinned fixture values: tools/make_png_fixtures.py
    * (`average_hash` / `dhash` / `phash`).
    *
    *  - ahash: [[averageHash]]'s kernel (global-mean threshold).
    *  - dhash: 8×9 block grid, bit (r·8+c) set iff block (r,c) mean <
    *    block (r,c+1) mean — exact cross-multiplied comparison, packed
    *    MSB-first. Gradient sign survives global brightness shifts that
    *    flip ahash bits.
    *  - phash: integer-exact DCT-II — 32×32 block means in micro-units
    *    (round-half-up), two-stage transform against a 1e6-scaled
    *    cosine table with a half-up 1e6 rescale between stages (peak
    *    magnitudes 8.2e15 / 2.7e17, Long-safe), the 63 top-left AC
    *    coefficients thresholded at their exact median (32nd smallest
    *    — an order statistic, never a float), packed MSB-first into
    *    bits 62..0. No float is ever compared, so the Scala and Python
    *    kernels agree bit-for-bit; the generator asserts every cosine
    *    table entry sits > 1e-3 from its rounding boundary, so a
    *    last-ulp libm difference cannot flip a table cell.
    *
    * Scale: 24 bytes/image leave the executor regardless of pixel
    * count; every downstream near-dup pass (banded Hamming-LSH,
    * [[graft.queries.MultimodalQueries]]) joins on these, never on
    * pixels.
    */
  def perceptualHashes(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("ahash", LongType),
      StructField("dhash", LongType),
      StructField("phash", LongType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          val img = readImage(bytes)
          if (img == null)
            org.apache.spark.sql.Row(key, null, null, null, null, null)
          else {
            val gray = grayMatrix(img)
            org.apache.spark.sql.Row(key, img.getWidth, img.getHeight,
              ahashOf(gray), dhashOf(gray), phashOf(gray))
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Integer grayscale matrix `(r+g+b) div 3` of a decoded image — the
    * shared front half of every perceptual-hash kernel (one bulk getRGB
    * per row stripe, same rationale as [[decodeImages]]).
    */
  private def grayMatrix(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val w = img.getWidth; val h = img.getHeight
    val gray = Array.ofDim[Int](h, w)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        gray(y)(x) = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        x += 1
      }
      y += 1
    }
    gray
  }

  private def blockSum(gray: Array[Array[Int]],
      y0: Int, y1: Int, x0: Int, x1: Int): Long = {
    var s = 0L
    var y = y0
    while (y < y1) {
      var x = x0
      while (x < x1) { s += gray(y)(x); x += 1 }
      y += 1
    }
    s
  }

  /** Boxed Long or null — the hash kernels return null (not a sentinel)
    * for images under their grid size.
    */
  private def ahashOf(gray: Array[Array[Int]]): java.lang.Long = {
    val h = gray.length; val w = if (h == 0) 0 else gray(0).length
    if (w < 8 || h < 8) return null
    var total = 0L
    var y = 0
    while (y < h) { var x = 0; while (x < w) { total += gray(y)(x); x += 1 }; y += 1 }
    val nTotal = w.toLong * h
    var hash = 0L
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        val bs = blockSum(gray, y0, y1, x0, x1)
        val nb = (y1 - y0).toLong * (x1 - x0)
        hash = (hash << 1) | (if (bs * nTotal > total * nb) 1L else 0L)
        bx += 1
      }
      by += 1
    }
    hash
  }

  private def dhashOf(gray: Array[Array[Int]]): java.lang.Long = {
    val h = gray.length; val w = if (h == 0) 0 else gray(0).length
    if (w < 9 || h < 8) return null
    val bs = Array.ofDim[Long](8, 9)
    val nb = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8; val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9; val x1 = (c + 1) * w / 9
        bs(r)(c) = blockSum(gray, y0, y1, x0, x1)
        nb(r)(c) = (y1 - y0).toLong * (x1 - x0)
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        hash = (hash << 1) |
          (if (bs(r)(c) * nb(r)(c + 1) < bs(r)(c + 1) * nb(r)(c)) 1L else 0L)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** round-half-up division (half toward +∞), exact for negatives —
    * mirrors `_rdiv` in the Python spec.
    */
  private def rdiv(a: Long, b: Long): Long = Math.floorDiv(2 * a + b, 2 * b)

  /** DCT-II cosine table, 1e6-scaled integers: ctab(k)(n) =
    * round(cos(π(2n+1)k/64)·1e6). The fixture generator asserts every
    * entry is > 1e-3 from its rounding boundary, so this table is
    * libm-portable despite the float cos call.
    */
  private lazy val phashCos: Array[Array[Long]] =
    Array.tabulate(8, 32) { (k, n) =>
      math.floor(math.cos(math.Pi * (2 * n + 1) * k / 64.0) * 1e6 + 0.5).toLong
    }

  private def phashOf(gray: Array[Array[Int]]): java.lang.Long = {
    val h = gray.length; val w = if (h == 0) 0 else gray(0).length
    if (w < 32 || h < 32) return null
    val bm = Array.ofDim[Long](32, 32)
    var by = 0
    while (by < 32) {
      val y0 = by * h / 32; val y1 = (by + 1) * h / 32
      var bx = 0
      while (bx < 32) {
        val x0 = bx * w / 32; val x1 = (bx + 1) * w / 32
        bm(by)(bx) = rdiv(blockSum(gray, y0, y1, x0, x1) * 1000000L,
          (y1 - y0).toLong * (x1 - x0))
        bx += 1
      }
      by += 1
    }
    // stage 1: column-wise DCT over y, rescaled to ~1e9
    val rp = Array.ofDim[Long](8, 32)
    var k = 0
    while (k < 8) {
      var x = 0
      while (x < 32) {
        var s = 0L
        var y = 0
        while (y < 32) { s += bm(y)(x) * phashCos(k)(y); y += 1 }
        rp(k)(x) = rdiv(s, 1000000L)
        x += 1
      }
      k += 1
    }
    // stage 2: row-wise DCT over x; 63 ACs of the top-left 8×8
    val ac = new Array[Long](63)
    var i = 0
    k = 0
    while (k < 8) {
      var l = 0
      while (l < 8) {
        if (k != 0 || l != 0) {
          var s = 0L
          var x = 0
          while (x < 32) { s += rp(k)(x) * phashCos(l)(x); x += 1 }
          ac(i) = s
          i += 1
        }
        l += 1
      }
      k += 1
    }
    val sorted = ac.clone(); java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var hash = 0L
    i = 0
    while (i < 63) {
      hash = (hash << 1) | (if (ac(i) > med) 1L else 0L)
      i += 1
    }
    hash
  }

  /** REAL audio decode: JDK javax.sound.sampled parses WAV/AIFF/AU
    * (PCM) executor-side at the same mapPartitions batch boundary as
    * [[decodeImages]]. Output per clip: sample rate, channels, bits,
    * frame count, duration, and mean absolute 16-bit amplitude across
    * all channels (exact integer arithmetic until the final division,
    * rounded to 4 dp). Undecodable bytes isolate as NULLs.
    */
  def decodeAudio(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits", IntegerType),
      StructField("n_frames", LongType),
      StructField("duration_ms", LongType),
      StructField("mean_abs", DoubleType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          val in =
            if (bytes == null) null
            else
              try javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.BufferedInputStream(
                  new java.io.ByteArrayInputStream(bytes)))
              catch {
                case _: javax.sound.sampled.UnsupportedAudioFileException => null
                case _: java.io.IOException => null
              }
          val f = if (in == null) null else in.getFormat
          // a header with no positive rate / frame size cannot be
          // interpreted — isolate it like undecodable bytes. The rate
          // gate is on the TRUNCATED int (a float rate in (0,1) would
          // pass `> 0` yet divide by zero below)
          if (f == null || f.getSampleRate.toInt <= 0 || f.getFrameSize <= 0) {
            if (in != null) in.close()
            org.apache.spark.sql.Row(key, null, null, null, null, null, null)
          } else {
            val pcm = in.readAllBytes(); in.close()
            // frame accounting from the FORMAT's frame size — never a
            // hardcoded width (8/24/32-bit PCM frames are not 2 bytes)
            val frames = pcm.length.toLong / f.getFrameSize
            val rate = f.getSampleRate.toInt
            // mean |amplitude| is defined for 16-bit integer PCM only;
            // other widths report NULL rather than a garbage number
            val sixteen =
              f.getSampleSizeInBits == 16 &&
                (f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            val mean: Any =
              if (!sixteen) null
              else {
                val little = !f.isBigEndian
                var sum = 0L
                var i = 0
                while (i + 1 < pcm.length) {
                  val lo = pcm(i) & 0xFF; val hi = pcm(i + 1) & 0xFF
                  val v = (if (little) (hi << 8) | lo else (lo << 8) | hi).toShort
                  sum += math.abs(v.toLong)
                  i += 2
                }
                val nSamples = pcm.length / 2
                if (nSamples == 0) 0.0
                else BigDecimal(sum.toDouble / nSamples)
                  .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
              }
            org.apache.spark.sql.Row(key, rate, f.getChannels,
              f.getSampleSizeInBits, frames, frames * 1000L / rate, mean)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL video CONTAINER metadata: a box walk over ISO-BMFF (MP4/MOV)
    * bytes — big-endian (size, tag) pairs, `moov/mvhd` for timescale +
    * duration, `moov/trak` children counted. Executor-side at the same
    * batch boundary as the other decoders; no codec involved (frame
    * decode stays behind [[decodeBytesStub]] — no video codec exists in
    * this environment, and container metadata is what a 100 TB curation
    * pass filters on anyway: duration caps, track presence, brand).
    * Non-BMFF bytes isolate as NULLs.
    */
  def probeVideo(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("brand", StringType),
      StructField("timescale", LongType),
      StructField("duration_ms", LongType),
      StructField("n_tracks", IntegerType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          probeBmff(bytes) match {
            case Some((brand, ts, durMs, tracks)) =>
              org.apache.spark.sql.Row(key, brand, ts, durMs, tracks)
            case None =>
              org.apache.spark.sql.Row(key, null, null, null, null)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** (brand, timescale, duration_ms, n_tracks) of ISO-BMFF bytes, or
    * None when the bytes aren't a box structure with ftyp + moov/mvhd.
    * Handles both mvhd versions (v1 widens ctime/mtime/duration to 64
    * bits) and the spec's irregular sizes: size==1 (64-bit largesize)
    * and size==0 (box runs to the end of its container). A malformed
    * TRAILING box does not discard the boxes already parsed — a valid
    * ftyp+moov prefix stays probeable.
    */
  /** Shared ISO-BMFF walker: big-endian reads and the irregular-size
    * box scan ([[probeBmff]]'s rules — size 1 = 64-bit largesize,
    * size 0 = to-end-of-container, malformed trailing box keeps the
    * parsed prefix), reusable by the metadata probe AND the MJPEG
    * frame extractor.
    */
  private[graft] final class Bmff(val bytes: Array[Byte]) {
    def u16(off: Int): Int =
      if (off < 0 || off + 2 > bytes.length) -1
      else ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    def u32(off: Int): Long =
      if (off < 0 || off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xFFL) << 24) | ((bytes(off + 1) & 0xFFL) << 16) |
        ((bytes(off + 2) & 0xFFL) << 8) | (bytes(off + 3) & 0xFFL)
    def u64(off: Int): Long =
      if (off < 0 || off + 8 > bytes.length) -1L
      else (u32(off) << 32) | u32(off + 4)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // children of [from, until): Seq of (tag, payloadStart, payloadEnd);
    // stops at the first irregularity but KEEPS what parsed before it
    def boxes(from: Int, until: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = from
      var ok = true
      while (ok && off + 8 <= until) {
        u32(off) match {
          case 0 => // box extends to the end of the container (last box)
            out += ((tag(off + 4), off + 8, until)); off = until
          case 1 => // 64-bit largesize follows the tag
            val size = u64(off + 8)
            if (size < 16 || off + size > until) ok = false
            else { out += ((tag(off + 4), off + 16, off + size.toInt)); off += size.toInt }
          case size =>
            if (size < 8 || off + size > until) ok = false
            else { out += ((tag(off + 4), off + 8, off + size.toInt)); off += size.toInt }
        }
      }
      out.result()
    }
    /** First child with `t` under [from, until). */
    def child(t: String, from: Int, until: Int): Option[(Int, Int)] =
      boxes(from, until).find(_._1 == t).map(b => (b._2, b._3))
  }

  private[graft] def probeBmff(bytes: Array[Byte]): Option[(String, Long, Long, Int)] = {
    if (bytes == null) return None
    val b = new Bmff(bytes)
    import b.{boxes, u32, u64}
    val top = boxes(0, bytes.length)
    for {
      ftyp <- top.find(_._1 == "ftyp")
      if ftyp._3 - ftyp._2 >= 4 // brand needs 4 payload bytes
      moov <- top.find(_._1 == "moov")
      kids = boxes(moov._2, moov._3)
      mvhd <- kids.find(_._1 == "mvhd")
      if mvhd._3 > mvhd._2 // need at least the version byte
      v = bytes(mvhd._2) & 0xFF
      // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
      // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
      ts = if (v == 1) u32(mvhd._2 + 20) else u32(mvhd._2 + 12)
      if ts > 0
      dur = if (v == 1) u64(mvhd._2 + 24) else u32(mvhd._2 + 16)
      if dur >= 0
    } yield (
      new String(bytes, ftyp._2, 4, java.nio.charset.StandardCharsets.US_ASCII),
      ts, dur * 1000L / ts, kids.count(_._1 == "trak"))
  }

  /** Sample byte ranges of the first Motion-JPEG video track: walk
    * moov/trak/mdia/minf/stbl, accept a track whose `stsd` entry is
    * `jpeg`/`mjpa`/`MJPG` (every sample an independent baseline JPEG),
    * then map samples to file offsets through the full stsc/stsz/stco
    * machinery (chunk runs, per-sample sizes, 32- or 64-bit chunk
    * offsets). Non-BMFF bytes, tracks of any other codec, or a sample
    * range outside the file yield an empty Seq — isolation, never
    * garbage bytes handed to the decoder.
    */
  private[graft] def mjpegSamples(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Seq.empty
    val b = new Bmff(bytes)
    val jpegTags = Set("jpeg", "mjpa", "MJPG")
    val stbls = for {
      moov <- b.child("moov", 0, bytes.length).toSeq
      trak <- b.boxes(moov._1, moov._2).filter(_._1 == "trak")
      mdia <- b.child("mdia", trak._2, trak._3).toSeq
      minf <- b.child("minf", mdia._1, mdia._2).toSeq
      stbl <- b.child("stbl", minf._1, minf._2).toSeq
      stsd <- b.child("stsd", stbl._1, stbl._2).toSeq
      // stsd payload: ver/flags(4) entry_count(4) entry{size(4) fourcc(4)}
      if b.u32(stsd._1 + 4) >= 1 && jpegTags(b.tag(stsd._1 + 12))
    } yield stbl
    stbls.headOption.toSeq.flatMap { case (sFrom, sUntil) =>
      val out = for {
        stsz <- b.child("stsz", sFrom, sUntil)
        stscO <- b.child("stsc", sFrom, sUntil)
        stcoB = b.child("stco", sFrom, sUntil)
        co64B = b.child("co64", sFrom, sUntil)
        if stcoB.isDefined || co64B.isDefined
      } yield {
        val fixedSize = b.u32(stsz._1 + 4)
        val nSamples = b.u32(stsz._1 + 8).toInt
        def sampleSize(i: Int): Long =
          if (fixedSize > 0) fixedSize else b.u32(stsz._1 + 12 + 4 * i)
        val (chunkOff, wide) = stcoB.map((_, false)).getOrElse((co64B.get, true))
        val nChunks = b.u32(chunkOff._1 + 4).toInt
        def chunkStart(c: Int): Long = // c is 0-based
          if (wide) b.u64(chunkOff._1 + 8 + 8 * c) else b.u32(chunkOff._1 + 8 + 4 * c)
        // stsc runs: (first_chunk 1-based, samples_per_chunk, desc)
        val nRuns = b.u32(stscO._1 + 4).toInt
        val runs = (0 until nRuns).map { r =>
          (b.u32(stscO._1 + 8 + 12 * r).toInt, b.u32(stscO._1 + 12 + 12 * r).toInt)
        }
        def samplesInChunk(c1: Int): Int = // c1 is 1-based
          runs.takeWhile(_._1 <= c1).lastOption.map(_._2).getOrElse(0)
        val slices = Seq.newBuilder[Array[Byte]]
        var sample = 0
        var chunk = 1
        while (sample < nSamples && chunk <= nChunks) {
          var off = chunkStart(chunk - 1)
          var inChunk = 0
          val per = samplesInChunk(chunk)
          var chunkOk = true
          while (chunkOk && sample < nSamples && inChunk < per) {
            val sz = sampleSize(sample)
            // a failed size read (u32 -> -1) or an out-of-range slice is
            // TERMINAL for the chunk: advancing off by a bogus size
            // would desynchronize every later sample offset in it,
            // silently garbling frames that are individually intact.
            // Later chunks restart from their own stco offset and are
            // unaffected — partial corruption stays partial.
            if (off < 0 || sz <= 0 || off + sz > bytes.length) chunkOk = false
            else {
              slices += java.util.Arrays.copyOfRange(bytes, off.toInt, (off + sz).toInt)
              off += sz
              inChunk += 1
              sample += 1
            }
          }
          // skip past the rest of a corrupt chunk's samples so the next
          // chunk's first sample index stays aligned with stsc
          if (!chunkOk) sample += per - inChunk
          chunk += 1
        }
        slices.result()
      }
      out.getOrElse(Seq.empty)
    }
  }

  /** REAL video FRAME decode for intra-frame-coded video: Motion-JPEG
    * samples extracted by the [[mjpegSamples]] sample-table walk and
    * decoded by the JDK's own JPEG reader — no external codec, the same
    * ImageIO boundary as [[decodeImages]]. Inter-frame codecs (H.264
    * etc.) genuinely need a codec this environment lacks and stay
    * behind [[decodeBytesStub]]; files that aren't MJPEG contribute
    * ZERO rows here (isolation), which the gate pins by globbing the
    * probe-only fixtures alongside. Output: one row per frame —
    * (media_key, frame_idx, width, height, avg_luma), avg_luma the
    * integer-exact mean of (r+g+b) over 3·pixels, rounded half-up to
    * 4 dp. Executor-side at the mapPartitions batch boundary: frames
    * never ride a shuffle; at 100 TB this flatMap is the whole design.
    */
  def decodeVideoFrames(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("avg_luma", DoubleType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (key, bytes) =>
          mjpegSamples(bytes).zipWithIndex.flatMap { case (jpeg, i) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) None
            else {
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                  x += 1
                }
                y += 1
              }
              val n = 3L * img.getWidth * img.getHeight
              // integer half-up 4-dp rounding, same discipline as Exact
              val luma = ((sum * 20000L / n + 1) / 2).toDouble / 10000
              Some(org.apache.spark.sql.Row(
                key, i, img.getWidth, img.getHeight, luma))
            }
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** REAL image resize: decode → scale onto a w×h RGB canvas → re-encode
    * PNG, all executor-side at the same mapPartitions batch boundary as
    * [[decodeImages]]. Output: (media_key, png binary or NULL for
    * undecodable input). The payload stays inside the executor between
    * decode and re-encode — at 100 TB the only thing that matters about
    * a media transform is that pixels never ride a shuffle.
    */
  def resizeImages(df: DataFrame, idCol: String, bytesCol: String,
      w: Int, h: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("media_key", StringType),
      StructField("png", BinaryType)))
    df.select(col(idCol).cast("string"), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (key, bytes) =>
          val img = readImage(bytes)
          if (img == null) org.apache.spark.sql.Row(key, null)
          else {
            val dst = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", out)
            org.apache.spark.sql.Row(key, out.toByteArray)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. Pure explode(sequence(...)) — a codegen'd Generator, no
    * UDTF, parallelizes row-wise.
    */
  def sampleFrames(df: DataFrame, every: Int = 1): DataFrame = {
    val keep = df.columns.filterNot(_ == "media").map(col) // payload stays put
    // n_frames <= 0 (legal under mediaSchema) contributes zero rows:
    // sequence(0, -1, +1) would throw, so gate it — explode of NULL
    // drops the row, which is the correct zero-frame semantics
    val frames = when(col("meta.n_frames") >= 1,
      sequence(lit(0), col("meta.n_frames") - 1, lit(every)))
    df.select(keep :+ explode(frames).as("frame_idx"): _*)
      .withColumn("frame_key",
        md5(concat(col("media_id").cast("string"), lit("#"),
          col("frame_idx").cast("string"))))
  }

  /** Batched "decode" over partitions — the shape a vectorized/native
    * decoder plugs into (one call per batch of rows, not per row).
    * Returns (media_id, n_bytes, head_byte). Stub logic, real plumbing.
    */
  def decodeBatched(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col("media_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // batch-at-a-time boundary: a real codec would init once here;
        // NULL payloads isolate like empty ones (never an executor NPE)
        batch.map { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) (id, 0L, -1)
          else (id, bytes.length.toLong, bytes(0).toInt)
        }
      }
    out.toDF("media_id", "n_bytes", "head_byte")
  }
}
