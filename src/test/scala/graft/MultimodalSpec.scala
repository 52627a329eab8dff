package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("id", "text")

  test("fromText builds the canonical media schema") {
    val m = Multimodal.fromText(docs, "id", "text")
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "media", "meta"))
    val row = m.filter($"media_id" === 1L).first()
    assert(new String(row.getAs[Array[Byte]]("media"), "UTF-8") == "hello world")
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Int]("n_frames") >= 1 && meta.getAs[Int]("n_frames") <= 5)
  }

  test("decodeBytesStub yields stable features") {
    val f = Multimodal.fromText(docs, "id", "text")
      .select($"media_id", Multimodal.decodeBytesStub($"media").as("f"))
      .filter($"media_id" === 2L)
      .select($"f.n_bytes", $"f.digest").first()
    assert(f.getInt(0) == 3)
    assert(f.getString(1) == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("sampleFrames explodes n_frames rows per media") {
    val m = Multimodal.fromText(docs, "id", "text")
    val frames = Multimodal.sampleFrames(m)
    val counts = frames.groupBy($"media_id").count()
      .as[(Long, Long)].collect().toMap
    val nf = m.select($"media_id", $"meta.n_frames").as[(Long, Int)].collect().toMap
    assert(counts.forall { case (id, n) => n == nf(id).toLong })
    assert(frames.select($"frame_key").distinct().count() == frames.count())
  }

  test("decodeBatched runs partition-wise and preserves ids") {
    val m = Multimodal.fromText(docs, "id", "text").repartition(2)
    val byId = Multimodal.decodeBatched(m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(byId(1L) == (11L, 'h'.toInt))
    assert(byId(2L) == (3L, 'a'.toInt))
  }

  test("decodeImages: real ImageIO decode, corrupt bytes isolate as NULLs") {
    val red = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/img/solid_red_8x6.png"))
    val rows = Multimodal.decodeImages(
        Seq(("ok", red), ("bad", "not a png".getBytes("UTF-8")))
          .toDF("k", "bytes").repartition(2),
        "k", "bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = rows("ok")
    assert(ok.getInt(1) == 8 && ok.getInt(2) == 6 && ok.getLong(3) == 48L)
    assert(ok.getDouble(4) == 255.0 && ok.getDouble(5) == 0.0 && ok.getDouble(6) == 0.0)
    // corrupt media must not kill the job — dims come back NULL
    val bad = rows("bad")
    assert((1 to 6).forall(bad.isNullAt))
  }

  test("probeVideo: real BMFF box walk, non-container bytes isolate as NULLs") {
    val mp4 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/video/clip_av.mp4"))
    val rows = Multimodal.probeVideo(
        Seq(("ok", mp4), ("bad", "mpeg? no".getBytes("UTF-8")))
          .toDF("k", "bytes").repartition(2),
        "k", "bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = rows("ok")
    assert(ok.getString(1) == "isom" && ok.getLong(2) == 1000L)
    assert(ok.getLong(3) == 2500L && ok.getInt(4) == 2)
    val bad = rows("bad")
    assert((1 to 4).forall(bad.isNullAt))
  }

  test("sampleFrames: n_frames = 0 contributes zero rows, not a crash") {
    val m = Seq((1L, Array[Byte](1), "x", 10, 10, 0),
        (2L, Array[Byte](2), "x", 10, 10, 2))
      .toDF("media_id", "media", "fmt", "w", "h", "nf")
      .select($"media_id", $"media",
        struct($"fmt".as("format"), $"w".as("width"),
          $"h".as("height"), $"nf".as("n_frames")).as("meta"))
    val frames = Multimodal.sampleFrames(m)
      .select($"media_id").as[Long].collect().toSeq.sorted
    assert(frames == Seq(2L, 2L)) // two frames for id 2, none for id 1
  }

  test("media kernels isolate NULL payloads (resize→decode chaining)") {
    val nullRow = Seq(("k", null: Array[Byte])).toDF("k", "bytes")
    assert((1 to 6).forall(
      Multimodal.decodeImages(nullRow, "k", "bytes").first().isNullAt))
    assert(Multimodal.resizeImages(nullRow, "k", "bytes", 4, 3).first().isNullAt(1))
    assert((1 to 6).forall(
      Multimodal.decodeAudio(nullRow, "k", "bytes").first().isNullAt))
    assert((1 to 4).forall(
      Multimodal.probeVideo(nullRow, "k", "bytes").first().isNullAt))
    // the chain that produces NULLs in practice: resize of junk → decode
    val junk = Seq(("k", "junk".getBytes("UTF-8"))).toDF("k", "bytes")
    val chained = Multimodal.decodeImages(
      Multimodal.resizeImages(junk, "k", "bytes", 4, 3), "media_key", "png")
    assert((1 to 6).forall(chained.first().isNullAt))
  }

  test("probeBmff: mvhd version 1 and size-0/largesize boxes parse") {
    import java.nio.ByteBuffer
    def box(tag: String, payload: Array[Byte], sizeOverride: Option[Long] = None): Array[Byte] = {
      sizeOverride match {
        case Some(0L) => // to-end-of-container box
          ByteBuffer.allocate(8 + payload.length)
            .putInt(0).put(tag.getBytes("US-ASCII")).put(payload).array()
        case Some(1L) => // largesize
          ByteBuffer.allocate(16 + payload.length)
            .putInt(1).put(tag.getBytes("US-ASCII"))
            .putLong(16L + payload.length).put(payload).array()
        case _ =>
          ByteBuffer.allocate(8 + payload.length)
            .putInt(8 + payload.length).put(tag.getBytes("US-ASCII"))
            .put(payload).array()
      }
    }
    // mvhd v1: ver/flags(4) ctime(8) mtime(8) timescale(4) duration(8)
    val mvhdV1 = ByteBuffer.allocate(32)
      .put(1.toByte).put(Array[Byte](0, 0, 0))
      .putLong(0L).putLong(0L).putInt(90000).putLong(270000L).array()
    val moov = box("moov", box("mvhd", mvhdV1) ++ box("trak", Array[Byte]()))
    val ftyp = box("ftyp", "isomxxxx".getBytes("US-ASCII"))
    // moov written with largesize, trailing mdat with size 0 (to-EOF)
    val full = ftyp ++ box("moov", box("mvhd", mvhdV1) ++ box("trak", Array[Byte]()),
      Some(1L)) ++ box("mdat", Array[Byte](1, 2, 3), Some(0L))
    assert(Multimodal.probeBmff(ftyp ++ moov)
      .contains(("isom", 90000L, 3000L, 1)))
    assert(Multimodal.probeBmff(full).contains(("isom", 90000L, 3000L, 1)))
  }

  test("decodeAudio: real WAV decode, corrupt bytes isolate as NULLs") {
    val wav = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/audio/stereo_8k.wav"))
    val rows = Multimodal.decodeAudio(
        Seq(("ok", wav), ("bad", Array[Byte](1, 2, 3)))
          .toDF("k", "bytes").repartition(2),
        "k", "bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    val ok = rows("ok")
    assert(ok.getInt(1) == 8000 && ok.getInt(2) == 2 && ok.getInt(3) == 16)
    assert(ok.getLong(4) == 160L && ok.getLong(5) == 20L)
    assert(ok.getDouble(6) == 1000.0) // |+500| and |-1500| average to 1000
    val bad = rows("bad")
    assert((1 to 6).forall(bad.isNullAt))
  }

  test("averageHash: exact hashes pinned by the fixture generator") {
    // expected values printed by tools/make_png_fixtures.py, whose
    // average_hash() is the executable spec of the Scala kernel
    val expected = Map(
      "ahash_base_16x16.png" -> 6172840429334713770L,
      "ahash_neardup_16x16.png" -> 6172840429334713770L,
      "ahash_variant_16x16.png" -> 6163833230012863786L,
      "ahash_distinct_16x16.png" -> -6172840429334713771L)
    val files = spark.read.format("binaryFile")
      .load("/root/repo/fixtures/img/ahash_*.png")
      .select(element_at(split($"path", "/"), -1).as("k"), $"content")
    val got = Multimodal.averageHash(files, "k", "content")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == expected)
  }

  test("averageHash: undecodable bytes and sub-8x8 images yield NULL") {
    val gray = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/img/solid_gray_4x4.png"))
    val rows = Multimodal.averageHash(
        Seq(("small", gray), ("bad", Array[Byte](9, 9, 9)))
          .toDF("k", "bytes"), "k", "bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("small").getInt(1) == 4 && rows("small").isNullAt(3))
    assert(rows("bad").isNullAt(1) && rows("bad").isNullAt(3))
  }

  test("perceptualHashes: all three kernels pinned by the fixture generator") {
    // expected values printed by tools/make_png_fixtures.py (dhash/phash
    // reference implementations are the executable specs)
    val expected = Map(
      "phash_base_32x32.png" ->
        (6869277392412143965L, -4921068366117366999L, 5382022396421639600L),
      "phash_neardup_32x32.png" ->
        (6869277392412143965L, -4921068366117366999L, 5382022396421639600L),
      "phash_variant_32x32.png" ->
        (2122518569537778009L, -4925571965744721111L, 5670252772556574128L),
      "phash_distinct_32x32.png" ->
        (9072229087654252723L, -3797710225816574394L, 9044080021237168732L),
      "hash_uneven_48x40.png" ->
        (3785095825684013580L, -1523988864288698699L, 6583157265028601898L))
    val files = spark.read.format("binaryFile")
      .load("/root/repo/fixtures/img/phash_*.png",
        "/root/repo/fixtures/img/hash_uneven_*.png")
      .select(element_at(split($"path", "/"), -1).as("k"), $"content")
    val got = Multimodal.perceptualHashes(files, "k", "content")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected)
  }

  test("perceptualHashes: per-kernel NULL rules by grid size") {
    // 8x6: too short for every grid; 16x16: ahash+dhash only
    val red = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/img/solid_red_8x6.png"))
    val a16 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/img/ahash_base_16x16.png"))
    val rows = Multimodal.perceptualHashes(
        Seq(("red", red), ("a16", a16), ("bad", Array[Byte](1, 2)))
          .toDF("k", "bytes"), "k", "bytes")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("red").getInt(1) == 8
      && (3 to 5).forall(rows("red").isNullAt))
    assert(rows("a16").getLong(3) == 6172840429334713770L
      && rows("a16").getLong(4) == -7698106371068488406L
      && rows("a16").isNullAt(5))
    assert((1 to 5).forall(rows("bad").isNullAt))
  }

  test("mjpegSamples: sample-table walk recovers the embedded JPEGs") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/video/mjpeg_clip.mp4"))
    val samples = Multimodal.mjpegSamples(bytes)
    assert(samples.size == 3)
    // every sample is a standalone JPEG: SOI marker first, EOI last
    samples.foreach { s =>
      assert((s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xD8, "missing SOI")
      assert((s(s.length - 2) & 0xFF) == 0xFF && (s.last & 0xFF) == 0xD9,
        "missing EOI")
    }
    // probe-only fixtures (no samples / no MJPEG track) must isolate
    for (f <- Seq("clip_av.mp4", "clip_v.mp4")) {
      val b2 = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"fixtures/video/$f"))
      assert(Multimodal.mjpegSamples(b2).isEmpty, s"$f should have no samples")
    }
    // CORRUPT size table: a bogus per-sample size must be TERMINAL for
    // its chunk, not silently advanced past — advancing by a wrong
    // size desynchronizes every later offset in the chunk and yields
    // mis-sliced garbage "frames". Zero sample 1's stsz entry (all 3
    // samples share one chunk here, per stsc): only sample 0 may
    // survive, and it must still be an intact JPEG.
    val corrupt = bytes.clone()
    val stszEntry1 = {
      val i = corrupt.indexOfSlice("stsz".getBytes) // tag index
      i + 4 /*ver/flags*/ + 4 /*sample_size*/ + 4 /*count*/ + 4 /*entry 0*/ + 4
    }
    java.util.Arrays.fill(corrupt, stszEntry1, stszEntry1 + 4, 0.toByte)
    val survivors = Multimodal.mjpegSamples(corrupt)
    assert(survivors.size == 1, s"expected 1 survivor, got ${survivors.size}")
    assert((survivors.head(0) & 0xFF) == 0xFF &&
      (survivors.head(1) & 0xFF) == 0xD8 &&
      (survivors.head.last & 0xFF) == 0xD9, "survivor frame intact")
  }

  test("decodeVideoFrames: real per-frame decode of the MJPEG fixture") {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/video/mjpeg_clip.mp4"))
    val df = Seq(("mjpeg_clip.mp4", bytes)).toDF("f", "content")
    val rows = Multimodal.decodeVideoFrames(df, "f", "content")
      .orderBy($"frame_idx").collect()
    info("frames: " + rows.mkString(" | "))
    assert(rows.length == 3)
    assert(rows.forall(r => r.getInt(2) == 16 && r.getInt(3) == 16))
    // frame 0 = solid red, frame 2 = solid blue: mean of (r+g+b)/3 for a
    // single saturated channel decodes near 255/3 = 85; frame 1 is a
    // gray gradient near 127. JPEG is lossy, so bound, don't pin, here -
    // the oracle gate pins the exact post-codec values.
    assert(math.abs(rows(0).getDouble(4) - 85) < 10, rows(0).toString)
    assert(math.abs(rows(1).getDouble(4) - 127) < 10, rows(1).toString)
    assert(math.abs(rows(2).getDouble(4) - 85) < 10, rows(2).toString)
  }
}
