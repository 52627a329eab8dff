package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/** WARC parser semantics on hand-built records — the cases the
  * round-trip gate (warc_ingest, which only sees the engine's own
  * writer output) cannot reach: foreign record types, header
  * continuation lines, non-HTTP payloads, truncation, and the
  * member-per-record gzip layout built by a DIFFERENT gzip path than
  * the writer's.
  */
class WarcSpec extends SparkSpec {

  private def record(typ: String, uri: String, payload: Array[Byte],
      ctype: String = "application/http; msgtype=response",
      extraHeader: String = ""): Array[Byte] = {
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:test:$typ>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      extraHeader +
      s"Content-Type: $ctype\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private val httpPayload =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>hello crawl</html>").getBytes(UTF_8)

  test("parses mixed record types; splits HTTP payloads; keeps raw ones") {
    val warcinfo = record("warcinfo", "",
      "software: graft-test\r\n".getBytes(UTF_8), ctype = "application/warc-fields")
    val request = record("request", "https://x.test/a",
      "GET /a HTTP/1.1\r\nHost: x.test\r\n\r\n".getBytes(UTF_8),
      ctype = "application/http; msgtype=request")
    val response = record("response", "https://x.test/a", httpPayload)
    val rows = WarcSource.parseBytes(warcinfo ++ request ++ response, "t.warc").toSeq
    assert(rows.map(_.warc_type) == Seq("warcinfo", "request", "response"))
    assert(rows.map(_.rec_seq) == Seq(0L, 1L, 2L))
    val resp = rows.last
    assert(resp.http_status.contains(200))
    assert(new String(resp.body, UTF_8) == "<html>hello crawl</html>")
    assert(resp.target_uri == "https://x.test/a")
    // warc-fields payload is NOT http: body is the raw payload, no status
    assert(rows.head.http_status.isEmpty)
    assert(new String(rows.head.body, UTF_8).startsWith("software:"))
  }

  test("header continuation lines fold into the previous field") {
    val r = record("response", "https://x.test/b", httpPayload,
      extraHeader = "WARC-Concurrent-To: <urn:one>\r\n <urn:two>\r\n")
    val row = WarcSource.parseBytes(r, "t.warc").next()
    assert(row.warc_type == "response") // later headers still parsed
    assert(row.content_length == httpPayload.length.toLong)
  }

  test("member-per-record gzip concatenation decodes transparently") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(out)
      gz.write(b); gz.close()
      out.toByteArray
    }
    val members =
      gzMember(record("response", "https://x.test/1", httpPayload)) ++
        gzMember(record("response", "https://x.test/2", httpPayload))
    val rows = WarcSource.parseBytes(members, "t.warc.gz").toSeq
    assert(rows.map(_.target_uri) == Seq("https://x.test/1", "https://x.test/2"))
  }

  test("corrupt gzip member boundaries fail loudly, never silently EOF") {
    def gzMember(b: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(out)
      gz.write(b); gz.close()
      out.toByteArray
    }
    val m1 = gzMember(record("response", "https://x.test/1", httpPayload))
    val m2 = gzMember(record("response", "https://x.test/2", httpPayload))
    // JDK GZIPInputStream would stop after member 1 and report clean
    // EOF for each of these — silently dropping record 2.
    val corruptMagic = m1 ++ m2.updated(0, 'X'.toByte)
    intercept[java.util.zip.ZipException] {
      WarcSource.parseBytes(corruptMagic, "t.warc.gz").toSeq
    }
    val trailingGarbage = m1 ++ "leftover bytes".getBytes(UTF_8)
    intercept[java.util.zip.ZipException] {
      WarcSource.parseBytes(trailingGarbage, "t.warc.gz").toSeq
    }
    // flipped payload byte inside member 2: CRC must catch it
    val body2 = java.util.Arrays.copyOf(m2, m2.length)
    body2(m2.length / 2) = (body2(m2.length / 2) ^ 0x01).toByte
    intercept[Exception] { // ZipException (CRC/ISIZE) or inflate DataFormatException
      WarcSource.parseBytes(m1 ++ body2, "t.warc.gz").toSeq
    }
  }

  test("truncated payload and malformed version line fail loudly") {
    val good = record("response", "https://x.test/c", httpPayload)
    intercept[java.io.EOFException] {
      WarcSource.parseBytes(good.dropRight(10), "t.warc").toSeq
    }
    intercept[IllegalArgumentException] {
      WarcSource.parseBytes("NOT-A-WARC\r\n".getBytes(UTF_8), "t.warc").toSeq
    }
  }

  test("http payload without a blank line surfaces whole payload, no status") {
    val (st, body) = WarcSource.splitHttp("HTTP/1.1 200 OK".getBytes(UTF_8))
    assert(st.isEmpty && new String(body, UTF_8) == "HTTP/1.1 200 OK")
  }

  test("writer round-trip through the distributed reader") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_spec").toString
    val docs = Seq(
      ("https://c.test/s/1", "2024-01-01T00:00:00Z", "alpha beta"),
      ("https://c.test/s/2", "2024-01-01T00:00:00Z", "déjà-vu — non-ASCII ✓"))
      .toDF("url", "date", "text")
    WarcSource.write(docs.repartition(2), s"$dir/w")
    val back = WarcSource.read(spark, s"$dir/w/*.warc.gz")
      .select($"target_uri", decode($"body", "UTF-8").as("text"),
        $"http_status")
      .orderBy($"target_uri")
      .as[(String, String, Option[Int])].collect().toSeq
    assert(back == Seq(
      ("https://c.test/s/1", "alpha beta", Some(200)),
      ("https://c.test/s/2", "déjà-vu — non-ASCII ✓", Some(200))))
  }
}
