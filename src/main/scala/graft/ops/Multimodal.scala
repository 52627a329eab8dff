package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with a typed metadata struct. The Spark-side
  * machinery (schema, batching, partitioning, explode-based frame
  * sampling) is real and tested; the actual codec work is STUBBED with
  * deterministic fakes — the decode libraries are not in this
  * environment. Swap [[decodeBytesStub]] for a real codec to productionize.
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

  /** STUB decode: deterministic per-payload "features" (byte length,
    * content digest, crc). A real implementation would decode pixels /
    * PCM here; everything downstream (columns, grouping, joins) is
    * unchanged when that swap happens.
    */
  def decodeBytesStub(media: Column): Column =
    struct(
      length(media).as("n_bytes"),
      md5(media).as("digest"),
      crc32(media).as("crc"))

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. Pure explode(sequence(...)) — a codegen'd Generator, no
    * UDTF, parallelizes row-wise.
    */
  def sampleFrames(df: DataFrame, every: Int = 1): DataFrame = {
    val keep = df.columns.filterNot(_ == "media").map(col) // payload stays put
    df.select(
        keep :+ explode(sequence(lit(0), col("meta.n_frames") - 1, lit(every)))
          .as("frame_idx"): _*)
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
        // batch-at-a-time boundary: a real codec would init once here
        batch.map { case (id, bytes) =>
          (id, bytes.length.toLong, if (bytes.nonEmpty) bytes(0).toInt else -1)
        }
      }
    out.toDF("media_id", "n_bytes", "head_byte")
  }
}
