package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Hashing

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * binary columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The Spark-side machinery here is real and tested — schema, batch
  * iteration via mapPartitions over a typed row shape, deterministic
  * partitioning — but the media DECODE step is a clearly-marked
  * deterministic FAKE: the container has no image/audio codecs, so
  * `fakeDecode` derives plausible metadata (width/height/frames) from a
  * content hash instead of parsing the bytes. Swapping in a real decoder
  * changes only that one function; everything around it (the part the
  * engine owns) is exercised end-to-end.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_md5", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false)))

  /** Wrap the documents table as a media table: the text bytes stand in
    * for an opaque payload (deterministic; no external data).
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      concat(lit("fake/"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
        .as("media_type"))

  /** STUB decoder — deterministic fake in place of a real codec.
    * Real decode would parse `media`; here metadata is derived from the
    * byte content so results are stable and checkable.
    */
  def fakeDecode(media: Array[Byte]): (Int, Int, Int) = {
    val h = Hashing.fnv1a64(media)
    val width = 64 + ((h >>> 8) % 1024).toInt
    val height = 64 + ((h >>> 24) % 1024).toInt
    val frames = 1 + (media.length % 30)
    (width, height, frames)
  }

  /** Batch "decode": mapPartitions so a real decoder could amortize codec
    * setup per partition (the shape a Pandas-UDF/mapInPandas pipeline has
    * in PySpark). Null media rows are dropped, like undecodable files.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select(col("doc_id"), col("media"), col("media_type"))
      .mapPartitions { rows =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("media")
          if (bytes == null) Iterator.empty
          else {
            md5.reset()
            val digest = md5.digest(bytes).map(b => f"${b & 0xff}%02x").mkString
            val (w, h, f) = fakeDecode(bytes)
            Iterator(Row(r.getAs[Long]("doc_id"),
              r.getAs[String]("media_type"), bytes.length, digest, w, h, f))
          }
        }
      }(enc)
  }

  /** Deterministic frame sampling for "video" rows: pick every k-th frame
    * index — shows the explode-side plumbing for per-frame features.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame =
    decoded.filter(col("media_type") === "fake/video")
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride)))
          .as("frame_idx"))
}
