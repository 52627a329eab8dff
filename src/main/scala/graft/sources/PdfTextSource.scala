package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** S3/S4 — offline PDF text source (the reference reads audited
  * reports with pdfplumber: dask-with-dataframe-[2].py:102-104,
  * detail_notes.py:30-38; no PDF library exists in this environment, so
  * this parses the format directly with nothing beyond the JDK).
  *
  * Two extraction paths, tried in order:
  *
  *  1. STRUCTURAL ([[PdfDoc]]): walk the cross-reference chain (classic
  *     tables AND compressed xref streams, /Prev + hybrid /XRefStm),
  *     load objects out of object streams, walk the page tree in order,
  *     and decode show strings per font — Type0/CID fonts (the subsetted
  *     fonts every modern financial-report generator embeds, where show
  *     strings are glyph indices) decode through their embedded
  *     /ToUnicode CMap. This is the path real-world 2023-era reports
  *     take (the reference's actual input per dask-with-dataframe-[2]
  *     .py:102-104).
  *  2. ORDER-OF-APPEARANCE fallback: when the document is structurally
  *     broken (damaged xref, truncated trailer), scan raw streams in
  *     file order and run the text ops with simple-font semantics — the
  *     classic single-pass-writer shape, and better than nothing on a
  *     damaged file.
  *
  * Line model (both paths): within a BT..ET text block, the positioning
  * operators (Td, TD, T-star, quote) start a new line and the show
  * operators (Tj, TJ, quote forms) append their string — the same line
  * model pdfplumber's extract_text produces for single-column text.
  * Filters on the structural path: Flate (+PNG predictors), LZW,
  * ASCIIHex, ASCII85. Encryption: the standard security handler with an
  * empty user/owner password decrypts on the structural path (RC4,
  * AES-128, AES-256 — [[PdfCrypt]]); a password-protected or
  * unknown-scheme document yields zero lines, never garbage. Not in
  * scope: DCT/JBIG2 image codecs, layout-aware column reconstruction.
  */
object PdfTextSource {

  /** All text lines of the document: page-tree order via the structural
    * path, stream order via the fallback. A stream that errors mid-parse
    * is skipped, never fatal (the per-source failure-isolation contract).
    */
  def extractLines(bytes: Array[Byte]): Vector[String] =
    extractPageLines(bytes).flatten

  /** Per-PAGE text lines — the pdfplumber unit (`pdf.pages[i]
    * .extract_text()`, detail_notes.py:30-38). Structural path: one
    * element per page in page-tree order; fallback path: one element per
    * content stream in file order (a classic single-pass writer emits
    * pages in file order, so the grouping still approximates pages).
    */
  def extractPageLines(bytes: Array[Byte]): Vector[Vector[String]] = {
    val doc =
      try Some(new PdfDoc(bytes))
      catch { case scala.util.control.NonFatal(_) => None }
    // encrypted documents: streams are RC4/AES ciphertext. The standard
    // security handler with an empty user/owner password (the dominant
    // real-world shape — "no password" financial reports) decrypts on
    // the structural path ([[PdfCrypt]]); a REAL password or an unknown
    // scheme still gets zero lines — never ciphertext garbage. The
    // order-of-appearance fallback can never run on encrypted bytes,
    // including when the xref chain is too broken to parse at all.
    if (doc.exists(d => d.isEncrypted && !d.canDecrypt)) return Vector.empty
    // for UNPARSEABLE documents, detect encryption by the trailer-entry
    // shape `/Encrypt N G R` (or a direct dict) — a bare substring match
    // would also hit a content-stream string that merely mentions
    // "/Encrypt" and wrongly suppress the fallback on a plain document
    val encrypted = doc.exists(_.isEncrypted) ||
      (doc.isEmpty && EncryptEntryRe.findFirstIn(
        new String(bytes, ISO_8859_1)).isDefined)
    if (doc.isEmpty && encrypted) return Vector.empty
    val structural = doc.flatMap { d =>
      try {
        Some(d.pages.map { p =>
          try textLines(p.content, p.cid).toVector
          catch { case _: RuntimeException => Vector.empty[String] }
        })
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    // an empty structural result on a non-empty file usually means the
    // xref chain lied (hand-edited or truncated file) — give the
    // order-of-appearance scan its chance rather than returning nothing.
    // Not on encrypted documents: the raw scan has no object identities,
    // so it would tokenize ciphertext.
    structural.filter(_.exists(_.nonEmpty)).getOrElse(
      if (encrypted) Vector.empty
      else contentStreams(bytes).map { data =>
        try textLines(data, Map.empty).toVector
        catch { case _: RuntimeException => Vector.empty[String] }
      }.toVector)
  }

  /** One PDF → (line_no, line), the same shape as Ingest.textWithLineNo —
    * DetailNotes runs unchanged on it. Driver-side parse (one report is
    * small); see [[readMany]] for the many-files path.
    */
  def toLinesDataFrame(spark: SparkSession, path: String): DataFrame = {
    val lines = extractLines(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val schema = StructType(Seq(
      StructField("line_no", LongType, nullable = false),
      StructField("line", StringType)))
    // LocalRelation, not parallelize: a driver-parsed document should
    // enter the plan as a LocalTableScan, not a Scan ExistingRDD bridge
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      lines.zipWithIndex
        .map { case (l, i) => Row(i.toLong, l): Row }.asJava,
      schema)
  }

  /** One PDF → (page_no, line_no, line): the page-wise shape of the
    * reference's `for page in pdf.pages` loop (detail_notes.py:30-38).
    * page_no is 0-based page-tree order; line_no restarts per page.
    */
  def toPagedLinesDataFrame(spark: SparkSession, path: String): DataFrame = {
    val pages = extractPageLines(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val schema = StructType(Seq(
      StructField("page_no", LongType, nullable = false),
      StructField("line_no", LongType, nullable = false),
      StructField("line", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pages.zipWithIndex.flatMap { case (lines, p) =>
        lines.zipWithIndex.map { case (l, i) => Row(p.toLong, i.toLong, l): Row }
      }.asJava,
      schema)
  }

  /** Distributed ingest of MANY PDFs: binaryFile scan over a glob,
    * per-file parse inside the executors (one PDF = one unsplittable
    * file = one task's unit, same grain as [[XlsxSource.readMany]]).
    * Output: (src_file, line_no, line) with line_no 0-based per file;
    * src_file is the FULL path — same-named files in different
    * subdirectories of the glob must stay distinct.
    */
  def readMany(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("src_file", StringType, nullable = false),
      StructField("line_no", LongType, nullable = false),
      StructField("line", StringType)))
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        extractLines(bytes).zipWithIndex.map { case (l, i) =>
          Row(path, i.toLong, l)
        }
      }(Encoders.row(schema))
  }

  /** Per-page POSITIONED text runs — (x, y, text) at the text-line
    * origin of each show operator — the unit layout-aware consumers
    * (table reconstruction, [[graft.ops.PdfTable]]) need and the plain
    * line model deliberately discards. Structural path only: positions
    * come from tracking the positioning operators (Td, TD, Tm, T-star,
    * TL), which requires per-page content in page-tree order; the
    * damaged-file fallback has no trustworthy geometry to offer.
    */
  def extractPageRuns(bytes: Array[Byte]): Vector[Vector[(Double, Double, String)]] = {
    val doc =
      try Some(new PdfDoc(bytes))
      catch { case scala.util.control.NonFatal(_) => None }
    if (doc.exists(d => d.isEncrypted && !d.canDecrypt)) return Vector.empty
    doc.map { d =>
      d.pages.map { p =>
        try textRuns(p.content, p.cid).toVector
        catch { case _: RuntimeException => Vector.empty[(Double, Double, String)] }
      }
    }.getOrElse(Vector.empty)
  }

  /** One PDF → (page_no, x, y, run): the positioned-run surface as a
    * LocalTableScan (driver-side parse, same contract as
    * [[toLinesDataFrame]]).
    */
  def toRunsDataFrame(spark: SparkSession, path: String): DataFrame = {
    val pages = extractPageRuns(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val schema = StructType(Seq(
      StructField("page_no", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("run", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      pages.zipWithIndex.flatMap { case (runs, p) =>
        runs.map { case (x, y, t) => Row(p.toLong, x, y, t): Row }
      }.asJava,
      schema)
  }

  /** Distributed ingest of MANY PDFs' POSITIONED runs: binaryFile scan
    * over a glob, per-file parse inside the executors (same grain as
    * [[readMany]]). Output: (src_file, page_no, x, y, run) — feed
    * [[graft.ops.PdfTable.rows]] with `extraKeys = Seq("src_file")` so
    * reconstruction stays per document-page.
    */
  def readManyRuns(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("src_file", StringType, nullable = false),
      StructField("page_no", LongType, nullable = false),
      StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false),
      StructField("run", StringType)))
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        extractPageRuns(bytes).iterator.zipWithIndex.flatMap { case (runs, p) =>
          runs.map { case (x, y, t) => Row(path, p.toLong, x, y, t) }
        }
      }(Encoders.row(schema))
  }

  /** A trailer-style /Encrypt entry: indirect ref or inline dict. */
  private val EncryptEntryRe = """/Encrypt\s+(\d+\s+\d+\s+R|<<)""".r

  // ------------------------------------------------------------ streams

  /** Dict types whose streams are never page text: embedded fonts,
    * images, metadata, compressed-object/xref containers.
    */
  private val NonContentMarkers = Seq(
    "/FontFile", "/Subtype /Image", "/Subtype/Image",
    "/Type /Metadata", "/Type/Metadata", "/Type /ObjStm", "/Type/ObjStm",
    "/Type /XRef", "/Type/XRef")

  /** Decoded bytes of every candidate content stream, in file order.
    * The stream extent comes from the dict's direct /Length when
    * present (`\d++` is possessive: an indirect `/Length 12 0 R` must
    * NOT backtrack into matching the "1" — it falls through to the
    * endstream scan); /FlateDecode bodies are inflated with JDK zlib.
    */
  private def contentStreams(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val s = new String(bytes, ISO_8859_1)
    val out = Vector.newBuilder[Array[Byte]]
    // the lookahead excludes indirect refs with ANY generation number
    // (`/Length 12 1 R` is legal, not just gen 0); `\d++` is possessive
    // so the ref case cannot backtrack into a partial digit match; the
    // value parses as Long (a hostile 11-digit length must fall through
    // to the endstream scan, not throw)
    val lengthRe = """/Length\s+(\d++)(?!\s+\d+\s+R)""".r
    var idx = 0
    var next = s.indexOf("stream", idx)
    while (next >= 0) {
      val objPos = s.lastIndexOf("obj", next)
      val dict = if (objPos >= 0) s.substring(objPos, next) else ""
      var dataStart = next + "stream".length
      if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
      if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
      val declaredLen = lengthRe.findFirstMatchIn(dict)
        .flatMap(m => m.group(1).toLongOption)
      val dataEnd = declaredLen match {
        case Some(len) if len <= Int.MaxValue && dataStart + len <= s.length =>
          dataStart + len.toInt
        case _ =>
          val e = s.indexOf("endstream", dataStart)
          var de = if (e < 0) s.length else e
          if (de > dataStart && s.charAt(de - 1) == '\n') de -= 1
          if (de > dataStart && s.charAt(de - 1) == '\r') de -= 1
          de
      }
      if (!NonContentMarkers.exists(dict.contains)) {
        val raw = bytes.slice(dataStart, dataEnd)
        // corrupt deflate data yields an empty stream, never an error
        val data =
          if (dict.contains("/FlateDecode"))
            try inflate(raw)
            catch { case _: java.util.zip.DataFormatException => Array.emptyByteArray }
          else raw
        // cheap content-stream gate: page text lives in BT..ET blocks;
        // anything without both markers has no text to offer and is
        // skipped rather than run through the tokenizer
        val ds = new String(data, ISO_8859_1)
        if (ds.contains("BT") && ds.contains("ET")) out += data
      }
      val esIdx = s.indexOf("endstream", dataEnd)
      idx = if (esIdx >= 0) esIdx + "endstream".length else dataEnd
      next = s.indexOf("stream", idx)
    }
    out.result()
  }

  /** Inflated output is capped: a crafted high-ratio deflate stream (zip
    * bomb) must bound at the cap and yield nothing, not OOM an executor.
    */
  private[sources] val MaxInflatedBytes = 256 * 1024 * 1024

  private[sources] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream()
    var going = true
    while (going && !inf.finished()) {
      val n = inf.inflate(buf)
      if (n > 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxInflatedBytes) { inf.end(); return Array.emptyByteArray }
      } else going = false
    }
    inf.end()
    out.toByteArray
  }

  // ----------------------------------------------------------- text ops

  private val Delims = "()<>[]{}/%"

  /** Lines shown by the text operators of one decoded content stream.
    *
    * `fonts` maps a resource font name (what a `/F1 12 Tf` selects) to
    * Some(cmap) for Type0/CID fonts — show strings are then 2-byte
    * codes decoded through the ToUnicode cmap (codes the subsetter left
    * unmapped contribute nothing, never raw glyph-index garbage) — or
    * None/absent for simple fonts, whose bytes pass through unchanged
    * (the classic path; also what the fallback scan uses for
    * everything, with `fonts` empty).
    */
  private def textLines(content: Array[Byte],
      fonts: Map[String, Option[Map[Int, String]]]): Seq[String] = {
    val s = new String(content, ISO_8859_1)
    val n = s.length
    val lines = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      val t = cur.toString.trim
      if (t.nonEmpty) lines += t
      cur.clear()
    }
    // current font's CID cmap (None = simple font). Tf switches it; the
    // graphics state survives BT/ET like a real interpreter's.
    var curCid: Option[Map[Int, String]] = None
    var lastName: String = null
    def decode(raw: String): String = curCid match {
      case Some(cmap) =>
        val sb = new StringBuilder
        var k = 0
        while (k + 1 < raw.length) {
          val code = ((raw.charAt(k) & 0xff) << 8) | (raw.charAt(k + 1) & 0xff)
          cmap.get(code).foreach(sb.append)
          k += 2
        }
        sb.toString
      case None => raw
    }
    var lastString: String = null
    var arrayBuf: StringBuilder = null
    def emit(str: String): Unit =
      if (arrayBuf != null) arrayBuf.append(decode(str)) else lastString = decode(str)
    var inText = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, ni) = literalString(s, i); emit(str); i = ni
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        i += 2 // inline dict (e.g. BDC properties) — no strings to show
      } else if (c == '<') {
        val (str, ni) = hexString(s, i); emit(str); i = ni
      } else if (c == '[') {
        arrayBuf = new StringBuilder; i += 1
      } else if (c == ']') {
        lastString = if (arrayBuf != null) arrayBuf.toString else null
        arrayBuf = null; i += 1
      } else if (c == '%') {
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '/') {
        i += 1
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !Delims.contains(s.charAt(i))) i += 1
        lastName = s.substring(start, i)
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !Delims.contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "BT" => inText = true; flush(); lastString = null
          case "ET" => inText = false; flush(); lastString = null
          case "Tf" => // font select: operands were `/Name size`
            if (lastName != null) curCid = fonts.getOrElse(lastName, None)
            lastString = null
          case "Tj" | "TJ" =>
            if (inText && lastString != null) cur.append(lastString)
            lastString = null
          case "'" | "\"" => // move to next line, then show
            if (inText) { flush(); if (lastString != null) cur.append(lastString) }
            lastString = null
          case "Td" | "TD" | "T*" =>
            if (inText) flush()
            lastString = null
          case _ => lastString = null // any operator consumes its operands
        }
      } else i += 1
    }
    flush()
    lines.toSeq
  }

  /** Positioned runs of one decoded content stream: one (x, y, text)
    * per show operator with non-empty decoded text, at the text-LINE
    * origin current when the show executes (the translation components
    * of the text matrix). Glyph-width advances are NOT modeled — every
    * generator that lays out a table positions each cell with its own
    * Td/Tm, which is the shape this consumes; consecutive shows without
    * repositioning share a coordinate and concatenate downstream.
    *
    * Tracked state: text matrix and text-line matrix (set by Tm, and by
    * the line-translate operators Td / TD / T-star), leading (TL, and
    * TD's side effect), font (Tf, for CID decode — `fonts` as in
    * [[textLines]]). BT resets both matrices to identity per spec. The
    * CTM (`cm`) is not modeled: coordinates are text-space, which IS
    * page-space for the untransformed pages report generators emit.
    */
  private def textRuns(content: Array[Byte],
      fonts: Map[String, Option[Map[Int, String]]]): Seq[(Double, Double, String)] = {
    val s = new String(content, ISO_8859_1)
    val n = s.length
    val runs = mutable.ArrayBuffer.empty[(Double, Double, String)]
    var curCid: Option[Map[Int, String]] = None
    var lastName: String = null
    def decode(raw: String): String = curCid match {
      case Some(cmap) =>
        val sb = new StringBuilder
        var k = 0
        while (k + 1 < raw.length) {
          val code = ((raw.charAt(k) & 0xff) << 8) | (raw.charAt(k + 1) & 0xff)
          cmap.get(code).foreach(sb.append)
          k += 2
        }
        sb.toString
      case None => raw
    }
    var lastString: String = null
    var arrayBuf: StringBuilder = null
    def emit(str: String): Unit =
      if (arrayBuf != null) arrayBuf.append(decode(str)) else lastString = decode(str)
    // numeric operand stack; every operator consumes (clears) it
    val nums = mutable.ArrayBuffer.empty[Double]
    // text matrix (t*) and text-line matrix (l*), row-major (a b c d e f)
    var ta = 1.0; var tb = 0.0; var tc = 0.0; var td = 1.0; var te = 0.0; var tf = 0.0
    var la = 1.0; var lb = 0.0; var lc = 0.0; var ld = 1.0; var le = 0.0; var lf = 0.0
    var leading = 0.0
    var inText = false
    def tmFromTlm(): Unit = { ta = la; tb = lb; tc = lc; td = ld; te = le; tf = lf }
    // Tlm' = translate(tx, ty) x Tlm  (PDF 32000 §9.4.2, Td)
    def lineTranslate(tx: Double, ty: Double): Unit = {
      le = tx * la + ty * lc + le
      lf = tx * lb + ty * ld + lf
      tmFromTlm()
    }
    def show(decoded: String): Unit = {
      val t = decoded.trim
      if (inText && t.nonEmpty) runs += ((te, tf, t))
    }
    def op(): Unit = { lastString = null; nums.clear() }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') {
        val (str, ni) = literalString(s, i); emit(str); i = ni
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        i += 2
      } else if (c == '<') {
        val (str, ni) = hexString(s, i); emit(str); i = ni
      } else if (c == '[') {
        arrayBuf = new StringBuilder; i += 1
      } else if (c == ']') {
        lastString = if (arrayBuf != null) arrayBuf.toString else null
        arrayBuf = null; i += 1
      } else if (c == '%') {
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '/') {
        i += 1
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !Delims.contains(s.charAt(i))) i += 1
        lastName = s.substring(start, i)
      } else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        s.substring(start, i).toDoubleOption.foreach(nums += _)
      } else if (c.isLetter || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < n && !s.charAt(i).isWhitespace && !Delims.contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "BT" =>
            inText = true
            ta = 1; tb = 0; tc = 0; td = 1; te = 0; tf = 0
            la = 1; lb = 0; lc = 0; ld = 1; le = 0; lf = 0
            op()
          case "ET" => inText = false; op()
          case "Tf" =>
            if (lastName != null) curCid = fonts.getOrElse(lastName, None)
            op()
          case "TL" =>
            if (nums.nonEmpty) leading = nums.last
            op()
          case "Td" =>
            if (nums.length >= 2) lineTranslate(nums(nums.length - 2), nums.last)
            op()
          case "TD" => // like Td, but also sets leading to -ty
            if (nums.length >= 2) {
              leading = -nums.last
              lineTranslate(nums(nums.length - 2), nums.last)
            }
            op()
          case "Tm" =>
            if (nums.length >= 6) {
              val m = nums.takeRight(6)
              la = m(0); lb = m(1); lc = m(2); ld = m(3); le = m(4); lf = m(5)
              tmFromTlm()
            }
            op()
          case "T*" => lineTranslate(0, -leading); op()
          case "Tj" | "TJ" =>
            if (lastString != null) show(lastString)
            op()
          case "'" | "\"" => // next line, then show (operands of " are aw ac)
            lineTranslate(0, -leading)
            if (lastString != null) show(lastString)
            op()
          case _ => op()
        }
      } else i += 1
    }
    runs.toSeq
  }

  /** `(...)` literal string: nested parens, \-escapes, octal, line
    * continuations. Returns (decoded, index-after-`)`).
    */
  private[sources] def literalString(s: String, start: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = start + 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out += '\n'; i += 2
            case 'r' => out += '\r'; i += 2
            case 't' => out += '\t'; i += 2
            case 'b' => out += '\b'; i += 2
            case 'f' => out += '\f'; i += 2
            case '(' => out += '('; i += 2
            case ')' => out += ')'; i += 2
            case '\\' => out += '\\'; i += 2
            case '\r' => // continuation: swallow EOL
              i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var code = 0; var k = 0; i += 1
              while (k < 3 && i < s.length
                  && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                code = code * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              out += code.toChar
            case other => out += other; i += 2
          }
        case '(' => depth += 1; out += '('; i += 1
        case ')' =>
          depth -= 1; if (depth > 0) out += ')'
          i += 1
        case ch => out += ch; i += 1
      }
    }
    (out.toString, i)
  }

  /** `<...>` hex string (whitespace-tolerant, odd digit padded with 0).
    * Non-hex bytes mean this is binary data that happened to parse as a
    * string opener, not a PDF hex string — yield nothing rather than
    * throw (the tokenizer must survive arbitrary bytes).
    */
  private[sources] def hexString(s: String, start: Int): (String, Int) = {
    val hex = new StringBuilder
    var valid = true
    var i = start + 1
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) {
        if (Character.digit(c, 16) >= 0) hex += c else valid = false
      }
      i += 1
    }
    val end = if (i < s.length) i + 1 else i
    if (!valid) return ("", end)
    if (hex.length % 2 == 1) hex += '0'
    val out = new StringBuilder
    var j = 0
    while (j + 2 <= hex.length) {
      out += Integer.parseInt(hex.substring(j, j + 2), 16).toChar
      j += 2
    }
    (out.toString, end)
  }
}
