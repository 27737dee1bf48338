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
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame = {
    // fail at the API boundary, not with a codegen-deep sequence() error
    // at action time
    require(stride > 0, s"stride must be positive, got $stride")
    decoded.filter(col("media_type") === "fake/video")
      .select(col("doc_id"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(stride)))
          .as("frame_idx"))
  }

  /** Resize planning: output dims fitting maxDim with aspect preserved —
    * pure column arithmetic (the metadata half of a resize; the byte
    * half is the decoder's job and stubbed with it).
    */
  def resizedDims(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    decoded
      .withColumn("out_width",
        greatest(lit(1), floor(col("width") * scale)).cast("int"))
      .withColumn("out_height",
        greatest(lit(1), floor(col("height") * scale)).cast("int"))
  }

  /** STUB feature extractor: deterministic embedding derived from
    * (doc_id, frame_idx) — stands in for a real per-frame vision encoder
    * (no models in the sandbox). Unit-normalized so cosine ANN over the
    * output behaves like real embeddings.
    */
  def fakeEmbedding(docId: Long, frameIdx: Int, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var norm = 0.0
    var d = 0
    while (d < dim) {
      // nested mixing, NOT docId*31+frameIdx: the linear form collides
      // ((doc,31) == (doc+1,0)), yielding byte-identical embeddings for
      // distinct frames once frame_idx reaches 31
      val v = Hashing.toUnitDouble(
        Hashing.at(Hashing.at(docId, frameIdx), d)) - 0.5
      out(d) = v.toFloat
      norm += v * v
      d += 1
    }
    val inv = if (norm == 0) 1.0f else (1.0 / math.sqrt(norm)).toFloat
    d = 0
    while (d < dim) { out(d) *= inv; d += 1 }
    out
  }

  private val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Per-frame feature extraction over sampled frames, batched per
    * partition (the mapInPandas shape: a real encoder would run one
    * batched forward pass per partition).
    */
  def frameFeatures(frames: DataFrame, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    frames.select(col("doc_id"), col("frame_idx"))
      .mapPartitions { rows =>
        // per-partition "model setup" would happen here
        rows.map { r =>
          val id = r.getAs[Long]("doc_id")
          val fi = r.getAs[Int]("frame_idx")
          Row(id, fi, fakeEmbedding(id, fi, dim).toSeq)
        }
      }(enc)
  }
}
