package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}

/** WARC (Web ARChive, ISO 28500) reader/writer — the container format
  * web crawls ship in (Common Crawl stores the public web as `.warc.gz`
  * with ONE GZIP MEMBER PER RECORD, so any record is decodable without
  * its predecessors). A training-data pipeline's very first step is
  * usually "read the crawl", so the engine carries the format natively,
  * JDK-only like the xlsx/PDF/Avro siblings.
  *
  * Format essentials (public spec): a record is a CRLF-line header
  * block — `WARC/1.0`, then `Name: value` fields (continuation lines
  * start with SP/HT), then an empty line — followed by exactly
  * `Content-Length` payload bytes and a `\r\n\r\n` separator. Response
  * records carry `Content-Type: application/http; msgtype=response`,
  * whose payload is an HTTP message: this reader splits status + body
  * out of such payloads so downstream text ops start from the page
  * body, not the protocol envelope.
  *
  * Scale shape: `read` uses `binaryFile` ONLY for its distributed glob
  * listing (selecting just `path` — the content column is pruned and
  * never read), then each task streams its files off the FileSystem
  * through a bounded strict multi-member gzip decoder — one
  * compressed record in memory at a time, so a 1 GB Common-Crawl
  * segment reads in constant memory. One (unsplittable) file = one
  * task, the correct grain for member-per-record gzip.
  */
object WarcSource {

  /** One parsed WARC record. `http_status`/`body` are the HTTP split
    * for `application/http` payloads; for every other record `body`
    * IS the payload and `http_status` is null.
    */
  final case class WarcRow(
      src_file: String,
      rec_seq: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      body: Array[Byte])

  // ------------------------------------------------------------ parse

  /** CRLF line off a raw stream, or null at EOF. WARC headers are
    * ASCII-safe per spec; bytes are decoded as UTF-8 for tolerance.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(96)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val s = buf.toByteArray
    val n = if (s.nonEmpty && s(s.length - 1) == '\r') s.length - 1 else s.length
    new String(s, 0, n, UTF_8)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(out, off, n - off)
      if (k < 0) throw new EOFException(
        s"WARC payload truncated: expected $n bytes, got $off")
      off += k
    }
    out
  }

  /** Parse records off an open (already de-gzipped) stream. Strict: a
    * malformed header is an error, not a skip — the format is
    * machine-written, and silently dropping records is how a corpus
    * loses documents without anyone noticing.
    */
  private[graft] def parseStream(in: InputStream, srcFile: String)
      : Iterator[WarcRow] = new Iterator[WarcRow] {
    private var counter = 0L
    private var nextRow: WarcRow = advance()

    private def advance(): WarcRow = {
      var line = readLine(in)
      while (line != null && line.isEmpty) line = readLine(in) // record gap
      if (line == null) return null
      if (!line.startsWith("WARC/"))
        throw new IllegalArgumentException(
          s"$srcFile: expected WARC/x.y version line, got '${line.take(40)}'")
      val headers = mutable.LinkedHashMap.empty[String, String]
      var last: String = null
      var h = readLine(in)
      while (h != null && h.nonEmpty) {
        if (h.head == ' ' || h.head == '\t') {
          // continuation line — invalid before any field (strict: a
          // leading-space first header would otherwise be silently
          // absorbed as a bogus 'name: value')
          if (last == null) throw new IllegalArgumentException(
            s"$srcFile: continuation line before any header field")
          headers(last) = headers(last) + " " + h.trim
        } else h.indexOf(':') match {
          case -1 => throw new IllegalArgumentException(
            s"$srcFile: malformed WARC header line '${h.take(40)}'")
          case i =>
            last = h.substring(0, i).trim.toLowerCase
            headers(last) = h.substring(i + 1).trim
        }
        h = readLine(in)
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"$srcFile: record without Content-Length")).toInt
      val payload = readFully(in, len)
      val ctype = headers.getOrElse("content-type", "")
      val (status, body) =
        if (ctype.startsWith("application/http")) splitHttp(payload)
        else (None, payload)
      val row = WarcRow(
        src_file = srcFile,
        rec_seq = { val s0 = counter; counter += 1; s0 },
        warc_type = headers.getOrElse("warc-type", ""),
        record_id = headers.getOrElse("warc-record-id", ""),
        target_uri = headers.getOrElse("warc-target-uri", ""),
        warc_date = headers.getOrElse("warc-date", ""),
        content_type = ctype,
        content_length = len.toLong,
        http_status = status,
        body = body)
      row
    }

    override def hasNext: Boolean = nextRow != null
    override def next(): WarcRow = {
      val r = nextRow; nextRow = advance(); r
    }
  }

  /** Split an `application/http` payload into (status, body): body
    * starts after the first CRLFCRLF; status is the integer of the
    * `HTTP/1.x NNN ...` start line. A payload without either yields
    * (None, whole payload) — surface, don't guess.
    */
  private[graft] def splitHttp(payload: Array[Byte]): (Option[Int], Array[Byte]) = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n'
        && payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (None, payload)
    val head = new String(payload, 0, split, UTF_8)
    val status = head.split("\r\n").headOption
      .flatMap { l =>
        val p = l.split(" ")
        if (p.length >= 2 && p(0).startsWith("HTTP/")) p(1).toIntOption else None
      }
    (status, java.util.Arrays.copyOfRange(payload, split + 4, payload.length))
  }

  /** Concatenated-gzip decoder with the STRICT failure contract JDK's
    * `GZIPInputStream` lacks: at a member boundary, anything other than
    * clean EOF or a well-formed next member header is an ERROR —
    * `GZIPInputStream.readTrailer` swallows a corrupt next-member
    * header as ordinary EOF, which for member-per-record WARC means
    * every record after the corruption silently vanishes from the
    * corpus. Every member's CRC32 and ISIZE trailer is verified too.
    * Construction does no I/O, so wiring cleanup before the first read
    * is race-free.
    */
  private[graft] final class StrictGzipInputStream(raw: InputStream)
      extends InputStream {
    private val inflater = new java.util.zip.Inflater(true) // raw deflate
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](1 << 16)
    private var pos, lim = 0
    private var memberOpen = false
    private var eof = false
    private val one = new Array[Byte](1)

    private def fill(): Boolean = {
      if (pos < lim) return true
      lim = raw.read(buf); pos = 0
      lim > 0
    }
    private def nextByte(): Int = if (!fill()) -1 else { val b = buf(pos) & 0xFF; pos += 1; b }
    private def expectByte(what: String): Int = {
      val b = nextByte()
      if (b < 0) throw new EOFException(s"gzip: truncated $what")
      b
    }
    private def readShortLE(what: String): Int =
      expectByte(what) | (expectByte(what) << 8)
    private def readIntLE(what: String): Long =
      readShortLE(what).toLong | (readShortLE(what).toLong << 16)

    /** Position on the next member's deflate data, or set `eof` on a
      * clean end-of-stream. Garbage where a member should start throws.
      */
    private def openMember(): Unit = {
      val b0 = nextByte()
      if (b0 < 0) { eof = true; return }
      val b1 = nextByte()
      if (b0 != 0x1F || b1 != 0x8B)
        throw new java.util.zip.ZipException(
          f"gzip: corrupt member boundary (magic 0x$b0%02x" +
            (if (b1 < 0) "<EOF>" else f"0x$b1%02x") + ")")
      val cm = expectByte("header")
      if (cm != 8)
        throw new java.util.zip.ZipException(s"gzip: unsupported method $cm")
      val flg = expectByte("header")
      var i = 0
      while (i < 6) { expectByte("header"); i += 1 } // MTIME, XFL, OS
      if ((flg & 4) != 0) {
        var n = readShortLE("FEXTRA")
        while (n > 0) { expectByte("FEXTRA"); n -= 1 }
      }
      if ((flg & 8) != 0) while (expectByte("FNAME") != 0) ()
      if ((flg & 16) != 0) while (expectByte("FCOMMENT") != 0) ()
      if ((flg & 2) != 0) { expectByte("FHCRC"); expectByte("FHCRC") }
      inflater.reset(); crc.reset(); memberOpen = true
    }

    private def verifyTrailer(): Unit = {
      val expCrc = readIntLE("trailer")
      val expIsize = readIntLE("trailer")
      if (expCrc != crc.getValue)
        throw new java.util.zip.ZipException(
          f"gzip: member CRC mismatch (stored 0x$expCrc%08x, computed 0x${crc.getValue}%08x)")
      if (expIsize != (inflater.getBytesWritten & 0xFFFFFFFFL))
        throw new java.util.zip.ZipException(
          s"gzip: member ISIZE mismatch (stored $expIsize, " +
            s"inflated ${inflater.getBytesWritten & 0xFFFFFFFFL})")
    }

    override def read(): Int =
      if (read(one, 0, 1) < 0) -1 else one(0) & 0xFF

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (!memberOpen) {
          if (eof) return -1
          openMember()
          if (eof) return -1
        }
        val n = inflater.inflate(b, off, len)
        if (n > 0) { crc.update(b, off, n); return n }
        if (inflater.finished()) {
          pos = lim - inflater.getRemaining // reclaim unconsumed tail
          verifyTrailer()
          memberOpen = false // loop: next member or clean EOF
        } else if (inflater.needsInput()) {
          if (!fill())
            throw new EOFException("gzip: truncated deflate stream")
          inflater.setInput(buf, pos, lim - pos)
          pos = lim // unconsumed bytes reclaimed via getRemaining at finish
        }
      }
      -1 // unreachable
    }

    override def close(): Unit = { inflater.end(); raw.close() }
  }

  /** Bytes entry point (unit tests, small sidecars). Gzip is detected
    * by magic; member-per-record concatenations decode strictly
    * ([[StrictGzipInputStream]]).
    */
  private[graft] def parseBytes(bytes: Array[Byte], srcFile: String)
      : Iterator[WarcRow] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B)
        new StrictGzipInputStream(raw)
      else raw
    parseStream(in, srcFile)
  }

  // ------------------------------------------------------------- read

  /** Distributed scan of a WARC glob: binaryFile supplies listing +
    * partitioning (content column pruned away — never read), each task
    * streams its files off the FileSystem in bounded memory.
    */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val paths = spark.read.format("binaryFile").load(glob).select("path")
    val bconf = PdfDataSource.broadcastSessionConf(spark)
    val rows = paths.as(Encoders.STRING).mapPartitions { it =>
      it.flatMap { p =>
        val path = new Path(new java.net.URI(p))
        val fs = path.getFileSystem(bconf.value.value)
        val raw = fs.open(path)
        // neither wrapper constructor does I/O, so the stream cannot
        // leak between open and listener registration below
        val in: InputStream =
          if (p.endsWith(".gz")) new StrictGzipInputStream(raw)
          else new BufferedInputStream(raw, 1 << 16)
        // flatMap drains one file's iterator before opening the next, so
        // eager close on exhaustion is the normal path; the
        // task-completion listener covers task failure mid-file (a
        // parse error must not leak the FS stream)
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; in.close() }
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => closeOnce()))
        val recs = parseStream(in, p)
        new Iterator[WarcRow] {
          override def hasNext: Boolean = {
            val h = recs.hasNext
            if (!h) closeOnce()
            h
          }
          override def next(): WarcRow = recs.next()
        }
      }
    }(Encoders.product[WarcRow])
    rows.toDF()
  }

  // ------------------------------------------------------------ write

  /** Write (url, date, text) rows as `.warc.gz` response records — one
    * gzip member per record (the Common Crawl layout), one part file
    * per partition. Record ids are deterministic (`urn:md5:` of the
    * target URI) so round-trips are reproducible. The same legitimate
    * `foreachPartition` codec edge as the Avro writer.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sessionConf = df.sparkSession.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(sessionConf)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val bconf = PdfDataSource.broadcastSessionConf(df.sparkSession)
    df.select("url", "date", "text").foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val part = TaskContext.getPartitionId()
        val out = new Path(path, f"part-$part%05d.warc.gz")
        val stream = out.getFileSystem(bconf.value.value).create(out, true)
        try it.foreach { row =>
          val (url, date, text) = (row.getString(0), row.getString(1), row.getString(2))
          val body = text.getBytes(UTF_8)
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; " +
            s"charset=utf-8\r\nContent-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
          val payloadLen = http.length + body.length
          val id = java.security.MessageDigest.getInstance("MD5")
            .digest(url.getBytes(UTF_8)).map("%02x".format(_)).mkString
          val header = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
            s"WARC-Record-ID: <urn:md5:$id>\r\nWARC-Date: $date\r\n" +
            s"WARC-Target-URI: $url\r\n" +
            s"Content-Type: application/http; msgtype=response\r\n" +
            s"Content-Length: $payloadLen\r\n\r\n").getBytes(UTF_8)
          val member = new ByteArrayOutputStream(
            header.length + payloadLen + 64)
          val gz = new GZIPOutputStream(member, 1 << 16)
          gz.write(header); gz.write(http); gz.write(body)
          gz.write("\r\n\r\n".getBytes(UTF_8))
          gz.close()
          stream.write(member.toByteArray)
        } finally stream.close()
      }
    }
  }
}
