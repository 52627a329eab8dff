package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Tables}

/** Multimodal plumbing exercised over the harness data: documents' UTF-8
  * bytes stand in for opaque media payloads (no codec libs in this
  * environment — decode is a deterministic stub; the schema/partition/
  * explode machinery is the real thing).
  */
object MultimodalQueries {

  /** Image corpus root. Env-overridable so the scale soak can point the
    * image queries at a GENERATED N× PNG corpus
    * (tools/make_soak_images.py — per-clone pseudo-random pixels keep
    * every hash distinct, so banded joins see realistic bucket
    * sparsity, not a copies-sized clique). Correctness always runs at
    * the committed fixtures (the driver sets no override), where the
    * oracles' pinned literal values hold.
    */
  private val ImgDir =
    sys.env.getOrElse("SPARK_GRAFT_IMG_DIR", "/root/repo/fixtures/img")

  /** Per-source feature rollup over "decoded" media: byte volume and
    * distinct-content counts. Map-side feature extraction, one small
    * shuffle for the rollup.
    */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.fromText(
      Tables.fanOut(Tables.documents(s, dir).select($"doc_id", $"source", $"text")),
      "doc_id", "text") // source passes through; no re-join, one scan
    media
      .withColumn("f", Multimodal.decodeBytesStub($"media"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"f.n_bytes").as("total_bytes"),
        countDistinct($"f.digest").as("n_distinct"),
        max($"meta.n_frames").as("max_frames"))
      .orderBy($"source")
  }

  private val mediaFeaturesOracle =
    """SELECT source,
      |  count(*) AS n_media,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
      |  CAST(max((('0x' || substr(md5('7|' || text), 1, 15))::BIGINT % 5) + 1) AS INTEGER) AS max_frames
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Frame sampling: explode each media row into its sampled frame
    * indices (generator, no UDTF), count frames per source.
    */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.fromText(
      Tables.fanOut(Tables.documents(s, dir).select($"doc_id", $"source", $"text")),
      "doc_id", "text")
    Multimodal.sampleFrames(media)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_frames_sampled"),
        countDistinct($"frame_key").as("n_distinct_frames"))
      .orderBy($"source")
  }

  private val frameSampleOracle =
    """WITH media AS (
      |  SELECT doc_id, source,
      |    (('0x' || substr(md5('7|' || text), 1, 15))::BIGINT % 5) + 1 AS n_frames
      |  FROM documents),
      |frames AS (
      |  SELECT doc_id, source,
      |    unnest(generate_series(0, n_frames - 1)) AS frame_idx
      |  FROM media)
      |SELECT source,
      |  count(*) AS n_frames_sampled,
      |  CAST(count(DISTINCT md5(CAST(doc_id AS VARCHAR) || '#' || CAST(frame_idx AS VARCHAR))) AS BIGINT) AS n_distinct_frames
      |FROM frames
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** True binary-file ingestion: a directory of opaque files read with
    * Spark's `binaryFile` source — (path, length, content, modTime) per
    * file, executor-side, splittable across files — feeding the decode
    * stub. This is the ingest edge for real media AND for binary PDFs
    * (SURVEY.md §2.1 S3): bytes land in a DataFrame with per-file
    * metadata, a parser hook away from pages/frames. Fixtures are
    * committed under fixtures/bin (deterministic full-byte-range
    * content); the digest is md5 over the HEX encoding because the
    * oracle's md5 only accepts text — both engines hash the same string.
    */
  private def binaryIngest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").load("/root/repo/fixtures/bin/*.bin")
      .select(
        element_at(split($"path", "/"), -1).as("file_name"),
        Multimodal.decodeBytesStub($"content").as("f"),
        md5(hex($"content")).as("digest"))
      .select($"file_name", $"f.n_bytes".cast("long").as("n_bytes"), $"digest")
      .orderBy($"file_name")
  }

  private val binaryIngestOracle =
    """SELECT parse_filename(filename) AS file_name,
      |  size AS n_bytes,
      |  md5(hex(content)) AS digest
      |FROM read_blob('/root/repo/fixtures/bin/*.bin')
      |ORDER BY file_name""".stripMargin

  /** REAL image decode end-to-end: binaryFile scan over the committed
    * PNG fixtures → JDK ImageIO decode inside the executors
    * (Multimodal.decodeImages) → per-image dimensions and channel
    * means. The fixtures are written byte-by-byte with zlib only
    * (tools/make_png_fixtures.py), so every expected value below is
    * exact by construction and the oracle states them as literals —
    * the decoder is pinned against ground truth, not against itself.
    */
  private def imageDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile").load(s"$ImgDir/*.png")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    Multimodal.decodeImages(files, "file_name", "content")
      .select($"media_key".as("file_name"), $"width", $"height",
        $"n_pixels", $"avg_r", $"avg_g", $"avg_b")
      .orderBy($"file_name")
  }

  private val imageDecodeOracle =
    """SELECT * FROM (VALUES
      |  ('ahash_base_16x16.png',    16, 16, CAST(256 AS BIGINT), CAST(120.9961 AS DOUBLE), CAST(120.9961 AS DOUBLE), CAST(120.9961 AS DOUBLE)),
      |  ('ahash_distinct_16x16.png',16, 16, CAST(256 AS BIGINT), CAST(120.9961 AS DOUBLE), CAST(120.9961 AS DOUBLE), CAST(120.9961 AS DOUBLE)),
      |  ('ahash_neardup_16x16.png', 16, 16, CAST(256 AS BIGINT), CAST(121.9297 AS DOUBLE), CAST(121.9297 AS DOUBLE), CAST(121.9297 AS DOUBLE)),
      |  ('ahash_variant_16x16.png', 16, 16, CAST(256 AS BIGINT), CAST(114.3906 AS DOUBLE), CAST(114.3906 AS DOUBLE), CAST(114.3906 AS DOUBLE)),
      |  ('checker_2x2.png',   2,  2, CAST(4  AS BIGINT), CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE)),
      |  ('hash_uneven_48x40.png', 48, 40, CAST(1920 AS BIGINT), CAST(125.8333 AS DOUBLE), CAST(125.8333 AS DOUBLE), CAST(125.8333 AS DOUBLE)),
      |  ('phash_base_32x32.png', 32, 32, CAST(1024 AS BIGINT), CAST(126.4131 AS DOUBLE), CAST(126.4131 AS DOUBLE), CAST(126.4131 AS DOUBLE)),
      |  ('phash_distinct_32x32.png', 32, 32, CAST(1024 AS BIGINT), CAST(127.8398 AS DOUBLE), CAST(127.8398 AS DOUBLE), CAST(127.8398 AS DOUBLE)),
      |  ('phash_neardup_32x32.png', 32, 32, CAST(1024 AS BIGINT), CAST(126.4248 AS DOUBLE), CAST(126.4248 AS DOUBLE), CAST(126.4248 AS DOUBLE)),
      |  ('phash_variant_32x32.png', 32, 32, CAST(1024 AS BIGINT), CAST(128.9131 AS DOUBLE), CAST(128.9131 AS DOUBLE), CAST(128.9131 AS DOUBLE)),
      |  ('gradient_16x2.png', 16, 2, CAST(32 AS BIGINT), CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE)),
      |  ('solid_gray_4x4.png', 4, 4, CAST(16 AS BIGINT), CAST(128.0 AS DOUBLE), CAST(128.0 AS DOUBLE), CAST(128.0 AS DOUBLE)),
      |  ('solid_red_8x6.png',  8, 6, CAST(48 AS BIGINT), CAST(255.0 AS DOUBLE), CAST(0.0 AS DOUBLE),   CAST(0.0 AS DOUBLE))
      |) AS t(file_name, width, height, n_pixels, avg_r, avg_g, avg_b)
      |ORDER BY file_name""".stripMargin

  /** Resize → re-decode round trip on the SOLID fixtures (whose channel
    * means are invariant under any interpolation, so the expected values
    * stay exact literals regardless of the scaler's kernel): proves the
    * executor-side decode→scale→re-encode chain produces images with the
    * requested geometry and unchanged color content.
    */
  private def imageResizeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile")
      .load(s"$ImgDir/solid_*.png")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    val resized = Multimodal.resizeImages(files, "file_name", "content", 4, 3)
    Multimodal.decodeImages(resized, "media_key", "png")
      .select($"media_key".as("file_name"), $"width", $"height",
        $"n_pixels", $"avg_r", $"avg_g", $"avg_b")
      .orderBy($"file_name")
  }

  private val imageResizeOracle =
    """SELECT * FROM (VALUES
      |  ('solid_gray_4x4.png', 4, 3, CAST(12 AS BIGINT), CAST(128.0 AS DOUBLE), CAST(128.0 AS DOUBLE), CAST(128.0 AS DOUBLE)),
      |  ('solid_red_8x6.png',  4, 3, CAST(12 AS BIGINT), CAST(255.0 AS DOUBLE), CAST(0.0 AS DOUBLE),   CAST(0.0 AS DOUBLE))
      |) AS t(file_name, width, height, n_pixels, avg_r, avg_g, avg_b)
      |ORDER BY file_name""".stripMargin

  /** REAL audio decode end-to-end: binaryFile over the committed WAV
    * fixtures → javax.sound.sampled parse inside the executors
    * (Multimodal.decodeAudio) → rate/channels/frames/duration and the
    * exact mean |amplitude| each fixture was constructed to have
    * (tools/make_wav_fixtures.py, stdlib-only writer).
    */
  private def audioDecodeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile").load("/root/repo/fixtures/audio/*.wav")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    Multimodal.decodeAudio(files, "file_name", "content")
      .select($"media_key".as("file_name"), $"sample_rate", $"channels",
        $"bits", $"n_frames", $"duration_ms", $"mean_abs")
      .orderBy($"file_name")
  }

  private val audioDecodeOracle =
    """SELECT * FROM (VALUES
      |  ('const_mono_8k.wav',  8000, 1, 16, CAST(800 AS BIGINT), CAST(100 AS BIGINT), CAST(1000.0 AS DOUBLE)),
      |  ('square_mono_4k.wav', 4000, 1, 16, CAST(400 AS BIGINT), CAST(100 AS BIGINT), CAST(2000.0 AS DOUBLE)),
      |  ('stereo_8k.wav',      8000, 2, 16, CAST(160 AS BIGINT), CAST(20  AS BIGINT), CAST(1000.0 AS DOUBLE))
      |) AS t(file_name, sample_rate, channels, bits, n_frames, duration_ms, mean_abs)
      |ORDER BY file_name""".stripMargin

  /** Video container metadata end-to-end: binaryFile over the committed
    * minimal MP4s → ISO-BMFF box walk inside the executors
    * (Multimodal.probeVideo) → brand/timescale/duration/track-count,
    * every value exact by fixture construction
    * (tools/make_mp4_fixtures.py).
    */
  private def videoProbeFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile").load("/root/repo/fixtures/video/*.mp4")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    Multimodal.probeVideo(files, "file_name", "content")
      .select($"media_key".as("file_name"), $"brand", $"timescale",
        $"duration_ms", $"n_tracks")
      .orderBy($"file_name")
  }

  private val videoProbeOracle =
    """SELECT * FROM (VALUES
      |  ('clip_av.mp4', 'isom', CAST(1000 AS BIGINT), CAST(2500 AS BIGINT), 2),
      |  ('clip_v.mp4',  'mp42', CAST(600  AS BIGINT), CAST(2000 AS BIGINT), 1),
      |  ('mjpeg_clip.mp4', 'isom', CAST(1000 AS BIGINT), CAST(1500 AS BIGINT), 1)
      |) AS t(file_name, brand, timescale, duration_ms, n_tracks)
      |ORDER BY file_name""".stripMargin

  /** REAL frame decode for intra-frame video
    * ([[Multimodal.decodeVideoFrames]]): the MJPEG fixture's three
    * samples come out of the stsc/stsz/stco sample-table walk and
    * through the JDK's own JPEG decoder — width, height, and the
    * integer-exact mean luma per frame, pinned as literals. The glob
    * deliberately includes the two probe-only fixtures (no samples /
    * no MJPEG track): they must contribute ZERO rows, so the oracle's
    * row count is also the isolation proof. Inter-frame codecs stay
    * behind the documented stub — the boundary is now "needs a real
    * codec", not "video".
    */
  private def videoFramesMjpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile").load("/root/repo/fixtures/video/*.mp4")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    Multimodal.decodeVideoFrames(files, "file_name", "content")
      .select($"media_key".as("file_name"), $"frame_idx",
        $"width", $"height", $"avg_luma")
      .orderBy($"file_name", $"frame_idx")
  }

  private val videoFramesOracle =
    """SELECT * FROM (VALUES
      |  ('mjpeg_clip.mp4', 0, 16, 16, CAST(84.6667 AS DOUBLE)),
      |  ('mjpeg_clip.mp4', 1, 16, 16, CAST(127.5 AS DOUBLE)),
      |  ('mjpeg_clip.mp4', 2, 16, 16, CAST(84.6667 AS DOUBLE))
      |) AS t(file_name, frame_idx, width, height, avg_luma)
      |ORDER BY file_name, frame_idx""".stripMargin

  // --------------------------------------------- image near-dup dedup

  private val AHashBands = 4
  private val AHashMaxHamming = 3

  /** Image near-duplicate detection over REAL decoded pixels: the
    * perceptual average-hash ([[Multimodal.averageHash]], 64-bit) of
    * each committed aHash fixture, then the banded Hamming-LSH shape —
    * each hash splits into [[AHashBands]] 16-bit band keys, candidates
    * are pairs sharing ≥1 band (an equi-join on (band, bits), never
    * all-pairs), and candidates verify with `bit_count(xor)` ≤
    * [[AHashMaxHamming]]. Bands = MaxHamming + 1, so the pigeonhole
    * guarantees NO false negatives at the threshold: a pair within
    * Hamming 3 cannot differ in all 4 bands.
    *
    * The fixture family is constructed (tools/make_png_fixtures.py)
    * with known hashes: neardup ≡ base (a blemish confined inside one
    * bright block), variant at exactly Hamming 3 (three dimmed
    * blocks), distinct at Hamming 64 (inverted phase) — the oracle
    * states the surviving pairs as literals, pinning decoder, hash
    * kernel, banding, and verify in one gate.
    *
    * Scale shape: hashes are 8 bytes/image leaving the executors; the
    * band join shuffles band keys only; the bucket-occupancy story is
    * the same as minhash-LSH banding (DedupQueries) — hot buckets mean
    * genuinely similar images, and the verify is a codegen'd bit op.
    */
  private def imageAhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile")
      .load(s"$ImgDir/ahash_*.png")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    val hashed = Multimodal.averageHash(files, "file_name", "content")
      .filter($"ahash".isNotNull)
      .select($"media_key".as("file_name"), $"ahash")
    val banded = hashed.select($"file_name", $"ahash",
      explode(array((0 until AHashBands).map(b => struct(
        lit(b).as("band"),
        expr(s"shiftright(ahash, ${b * 16}) & 65535").as("bits"))): _*))
        .as("bk"))
      .select($"file_name", $"ahash", $"bk.band", $"bk.bits")
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits"
          && $"a.file_name" < $"b.file_name")
      .select($"a.file_name".as("file_a"), $"b.file_name".as("file_b"),
        $"a.ahash".as("ha"), $"b.ahash".as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter($"hamming" <= AHashMaxHamming)
      .select($"file_a", $"file_b", $"hamming")
      .orderBy($"file_a", $"file_b")
  }

  private val imageAhashOracle =
    """SELECT * FROM (VALUES
      |  ('ahash_base_16x16.png',    'ahash_neardup_16x16.png', 0),
      |  ('ahash_base_16x16.png',    'ahash_variant_16x16.png', 3),
      |  ('ahash_neardup_16x16.png', 'ahash_variant_16x16.png', 3)
      |) AS t(file_a, file_b, hamming)
      |ORDER BY file_a, file_b""".stripMargin

  // --------------------------------------- perceptual hash features

  /** Every committed image fixture through ONE decode pass of all three
    * perceptual hashes ([[Multimodal.perceptualHashes]]): the literal
    * oracle pins the aHash, dHash, and integer-DCT pHash kernels —
    * including each kernel's NULL rule (ahash < 8×8, dhash < 9×8,
    * phash < 32×32) and the fractional-block path (48×40 is divisible
    * by none of the grids). Values printed by
    * tools/make_png_fixtures.py, whose `average_hash`/`dhash`/`phash`
    * are the executable specs.
    */
  private def imageHashFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile")
      .load(s"$ImgDir/*.png")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    Multimodal.perceptualHashes(files, "file_name", "content")
      .withColumnRenamed("media_key", "file_name")
      .orderBy($"file_name")
  }

  private val imageHashOracle =
    """SELECT * FROM (VALUES
      |  ('ahash_base_16x16.png',     16, 16, 6172840429334713770,  -7698106371068488406, CAST(NULL AS BIGINT)),
      |  ('ahash_distinct_16x16.png', 16, 16, -6172840429334713771, 771604915693095605,   CAST(NULL AS BIGINT)),
      |  ('ahash_neardup_16x16.png',  16, 16, 6172840429334713770,  -3086420352641100502, CAST(NULL AS BIGINT)),
      |  ('ahash_variant_16x16.png',  16, 16, 6163833230012863786,  -7707113570323229334, CAST(NULL AS BIGINT)),
      |  ('checker_2x2.png',           2,  2, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
      |  ('gradient_16x2.png',        16,  2, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
      |  ('hash_uneven_48x40.png',    48, 40, 3785095825684013580,  -1523988864288698699, 6583157265028601898),
      |  ('phash_base_32x32.png',     32, 32, 6869277392412143965,  -4921068366117366999, 5382022396421639600),
      |  ('phash_distinct_32x32.png', 32, 32, 9072229087654252723,  -3797710225816574394, 9044080021237168732),
      |  ('phash_neardup_32x32.png',  32, 32, 6869277392412143965,  -4921068366117366999, 5382022396421639600),
      |  ('phash_variant_32x32.png',  32, 32, 2122518569537778009,  -4925571965744721111, 5670252772556574128),
      |  ('solid_gray_4x4.png',        4,  4, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
      |  ('solid_red_8x6.png',         8,  6, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT))
      |) AS t(file_name, width, height, ahash, dhash, phash)
      |ORDER BY file_name""".stripMargin

  // ------------------------------------------ pHash near-dup dedup

  /** [[imageAhashDedup]]'s banded Hamming-LSH shape over the DCT pHash
    * — the production-grade perceptual hash (robust to brightness and
    * blemish edits that flip aHash bits). The 63-bit hash splits into
    * three 16-bit bands plus one 15-bit band (bits 48..62); bands =
    * MaxHamming + 1, so the pigeonhole no-false-negative guarantee at
    * Hamming ≤ 3 is unchanged. Fixture family constructed with known
    * distances (neardup ≡ base, variant at Hamming 2, distinct at 36).
    */
  private def imagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = s.read.format("binaryFile")
      .load(s"$ImgDir/phash_*.png")
      .select(element_at(split($"path", "/"), -1).as("file_name"), $"content")
    val hashed = Multimodal.perceptualHashes(files, "file_name", "content")
      .filter($"phash".isNotNull)
      .select($"media_key".as("file_name"), $"phash")
    val banded = hashed.select($"file_name", $"phash",
      explode(array((0 until AHashBands).map(b => struct(
        lit(b).as("band"),
        expr(s"shiftright(phash, ${b * 16}) & ${if (b == 3) 32767 else 65535}")
          .as("bits"))): _*))
        .as("bk"))
      .select($"file_name", $"phash", $"bk.band", $"bk.bits")
    banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits"
          && $"a.file_name" < $"b.file_name")
      .select($"a.file_name".as("file_a"), $"b.file_name".as("file_b"),
        $"a.phash".as("ha"), $"b.phash".as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter($"hamming" <= AHashMaxHamming)
      .select($"file_a", $"file_b", $"hamming")
      .orderBy($"file_a", $"file_b")
  }

  private val imagePhashOracle =
    """SELECT * FROM (VALUES
      |  ('phash_base_32x32.png',    'phash_neardup_32x32.png', 0),
      |  ('phash_base_32x32.png',    'phash_variant_32x32.png', 2),
      |  ('phash_neardup_32x32.png', 'phash_variant_32x32.png', 2)
      |) AS t(file_a, file_b, hamming)
      |ORDER BY file_a, file_b""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("image_ahash_dedup", imageAhashDedup, Some(imageAhashOracle)),
    Q("image_phash_dedup", imagePhashDedup, Some(imagePhashOracle)),
    Q("image_hash_features", imageHashFeatures, Some(imageHashOracle)),
    Q("multimodal_features", mediaFeatures, Some(mediaFeaturesOracle)),
    Q("multimodal_frames", frameSample, Some(frameSampleOracle)),
    Q("image_decode_features", imageDecodeFeatures, Some(imageDecodeOracle)),
    Q("image_resize_roundtrip", imageResizeRoundtrip, Some(imageResizeOracle)),
    Q("audio_decode_features", audioDecodeFeatures, Some(audioDecodeOracle)),
    Q("video_probe_features", videoProbeFeatures, Some(videoProbeOracle)),
    Q("video_frames_mjpeg", videoFramesMjpeg, Some(videoFramesOracle)),
    Q("binary_ingest", binaryIngest, Some(binaryIngestOracle)))
}
