package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, processed in
  * per-partition batches.
  *
  * The Spark-side machinery (schema contracts, batched partition
  * processing, deterministic partitioning, feature schema) is real and
  * tested; the actual media DECODING is stubbed behind `decodeStub` —
  * the image/audio codecs are not available in this environment, and a
  * production deployment swaps `decodeStub` for a real decoder with the
  * SAME signature (bytes => features), leaving every plan unchanged.
  */
object Multimodal {

  /** Feature schema produced per media item. */
  val featureSchema: StructType = StructType(Seq(
    StructField("feature_vec", ArrayType(FloatType), nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB decoder: deterministic pseudo-features from the payload bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) in
    * production — signature and batch shape stay identical.
    */
  private[pipeline] def decodeStub(bytes: Array[Byte], dim: Int = 16)
    : (Array[Float], Int, Int, String) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val vec = Array.tabulate(dim) { d =>
      val x = h ^ (d.toLong * 0x9E3779B97F4A7C15L)
      ((x % 1000L).toFloat / 1000.0f)
    }
    val width = 16 + math.abs(h % 1024).toInt
    val height = 16 + math.abs((h >> 10) % 1024).toInt
    (vec, width, height, "stub")
  }

  /** Adds decoded features for a binary media column. Processing happens
    * per partition in batches (the same shape a vectorized/Arrow UDF would
    * see), so swapping in a real batched decoder keeps the plan identical.
    */
  def withMediaFeatures(df: DataFrame, binaryColumn: String, dim: Int = 16): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ featureSchema.fields)
    val binIdx = inputSchema.fieldIndex(binaryColumn)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      // per-partition pass: a real codec initializes once here, before the
      // row loop, and decodes row payloads with that shared context
      rows.map { row =>
        val payload = row.get(binIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
          case other => other.toString.getBytes("UTF-8")
        }
        val (vec, w, h, fmt) = decodeStub(payload, dim)
        Row.fromSeq(row.toSeq ++ Seq(vec.toSeq, w, h, fmt, payload.length.toLong))
      }
    }(enc)
  }

  /** Deterministic frame sampling plan for video payloads: emits one row
    * per sampled frame index (the decode itself is the stub). At scale the
    * explode keeps frame work colocated with the source partition — no
    * shuffle until a downstream aggregation.
    */
  def sampleFrames(df: DataFrame, binaryColumn: String, everyNth: Int = 30,
      maxFrames: Int = 8): DataFrame = {
    val frameCount = greatest(
      least((length(col(binaryColumn)) / lit(1024)).cast(IntegerType), lit(maxFrames * everyNth)),
      lit(1))
    // null payloads yield NO frames: least/greatest SKIP nulls (they do not
    // propagate), so without the guard a null video would explode into the
    // maximum frame count
    val indices = when(col(binaryColumn).isNull, array().cast(ArrayType(IntegerType)))
      .otherwise(sequence(lit(0), frameCount - 1, lit(everyNth)))
    df
      .withColumn("graft_frame_idx", explode(indices))
      .withColumn("graft_frame_ref",
        xxhash64(col(binaryColumn), col("graft_frame_idx")))
  }

  /** Resize contract: records intended output dims; real resize goes where
    * the stub multiplication is.
    */
  def withResizePlan(df: DataFrame, widthCol: String, heightCol: String,
      targetWidth: Int, targetHeight: Int): DataFrame =
    df
      .withColumn("target_width", lit(targetWidth))
      .withColumn("target_height", lit(targetHeight))
      .withColumn("scale_x", lit(targetWidth) / col(widthCol).cast(DoubleType))
      .withColumn("scale_y", lit(targetHeight) / col(heightCol).cast(DoubleType))
}
