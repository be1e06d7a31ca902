package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, processed in
  * per-partition batches.
  *
  * IMAGE payloads (PNG/JPEG/GIF/BMP — whatever the JDK's `javax.imageio`
  * registry reads) are decoded for REAL: true dimensions, format name, and
  * a grayscale-thumbnail feature vector. Audio/video payloads fall back to
  * `decodeStub` — those codecs are not in-JDK; a production deployment
  * swaps the stub for a real decoder with the SAME signature
  * (bytes => features), leaving every plan unchanged.
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

  /** Upper bound on declared pixels before the full decode is attempted:
    * a few-hundred-byte "bomb" payload can declare a 60000x60000 image
    * whose BufferedImage would allocate ~14 GB and kill the executor with
    * an OutOfMemoryError no catch handler sees. Dimensions are available
    * header-only, so oversized payloads are rejected without decoding.
    */
  val MaxDecodedPixels: Long = 64L * 1024 * 1024 // 64 MP ~ 256 MB ARGB

  /** REAL image decode via the JDK's ImageIO registry: true width/height,
    * the reader's format name, and a `dim`-point grayscale thumbnail
    * (row-major over a ~square grid) as the feature vector. Returns None
    * for payloads no registered reader accepts (audio, video, garbage)
    * and for declared dimensions beyond [[MaxDecodedPixels]].
    */
  private[pipeline] def decodeImage(bytes: Array[Byte], dim: Int = 16)
    : Option[(Array[Float], Int, Int, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
          // header-only dimension check BEFORE allocating the pixel raster
          val declared = reader.getWidth(0).toLong * reader.getHeight(0).toLong
          if (declared <= 0 || declared > MaxDecodedPixels) return None
          val img = reader.read(0)
          val w = img.getWidth
          val h = img.getHeight
          val gw = math.max(math.sqrt(dim.toDouble).toInt, 1)
          val gh = math.max((dim + gw - 1) / gw, 1)
          val vec = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            val gx = i % gw
            val gy = i / gw
            val px = gx * (w - 1) / math.max(gw - 1, 1)
            val py = math.min(gy, gh - 1) * (h - 1) / math.max(gh - 1, 1)
            val rgb = img.getRGB(math.min(px, w - 1), math.min(py, h - 1))
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            vec(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
            i += 1
          }
          Some((vec, w, h, fmt))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Feature schema produced per audio item by [[withAudioFeatures]]. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("feature_vec", ArrayType(FloatType), nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("audio_format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/RIFF, AU,
    * AIFF — whatever the installed providers read): true sample rate,
    * channel count, frame count, duration, and a `dim`-point RMS loudness
    * envelope over the PCM samples as the feature vector. Handles signed
    * PCM at 8/16/24/32 bits, unsigned 8-bit, and 32/64-bit float PCM,
    * both endiannesses. Returns None for payloads no provider accepts
    * (video, garbage) or compressed encodings (a-law/mu-law) — only video
    * remains on the stub path. Memory is bounded by the payload itself
    * (the PCM read never exceeds the in-memory byte array).
    */
  private[pipeline] def decodeAudio(bytes: Array[Byte], dim: Int = 16)
    : Option[(Array[Float], Float, Int, Long, Double, String)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes == null || bytes.length < 12) return None
    try {
      val fileFormat = AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val typeName = fileFormat.getType.toString.toLowerCase(java.util.Locale.ROOT)
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val bits = fmt.getSampleSizeInBits
        val big = fmt.isBigEndian
        val pcmSigned = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val pcmUnsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val pcmFloat = fmt.getEncoding == AudioFormat.Encoding.PCM_FLOAT
        val supported =
          (pcmSigned && (bits == 8 || bits == 16 || bits == 24 || bits == 32)) ||
            (pcmUnsigned && bits == 8) ||
            (pcmFloat && (bits == 32 || bits == 64))
        if (frames <= 0 || fmt.getFrameRate <= 0 || !supported) return None
        val durationMs = frames.toDouble / fmt.getFrameRate * 1000.0
        val data = in.readAllBytes()
        val bytesPerSample = bits / 8
        val sampleCount = data.length / bytesPerSample
        if (sampleCount == 0) return None
        // assemble a sample's bytes into an int/long respecting endianness
        def word(off: Int, n: Int): Long = {
          var w = 0L
          var j = 0
          while (j < n) {
            val b = data(off + (if (big) j else n - 1 - j)) & 0xFFL
            w = (w << 8) | b
            j += 1
          }
          w
        }
        val sumSq = new Array[Double](dim)
        val cnt = new Array[Long](dim)
        var i = 0
        while (i < sampleCount) {
          val off = i * bytesPerSample
          val s =
            if (pcmFloat && bits == 32) java.lang.Float.intBitsToFloat(word(off, 4).toInt).toDouble
            else if (pcmFloat) java.lang.Double.longBitsToDouble(word(off, 8))
            else if (pcmUnsigned) ((data(i) & 0xFF) - 128) / 128.0
            else bits match { // signed PCM: sign-extend then normalize
              case 8  => data(i) / 128.0
              case 16 => word(off, 2).toShort / 32768.0
              case 24 => ((word(off, 3).toInt << 8) >> 8) / 8388608.0
              case _  => word(off, 4).toInt / 2147483648.0
            }
          val b = (i.toLong * dim / sampleCount).toInt
          sumSq(b) += s * s
          cnt(b) += 1
          i += 1
        }
        val envelope = Array.tabulate(dim)(b =>
          if (cnt(b) == 0) 0.0f else math.sqrt(sumSq(b) / cnt(b)).toFloat)
        Some((envelope, fmt.getSampleRate, fmt.getChannels, frames, durationMs, typeName))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Adds decoded audio features for a binary audio column, one row per
    * input row, per-partition batches ([[audioFeatureSchema]] fields
    * appended). Undecodable payloads get an empty envelope and -1
    * rate/channels so downstream filters can drop them without a join.
    */
  def withAudioFeatures(df: DataFrame, binaryColumn: String, dim: Int = 16): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ audioFeatureSchema.fields)
    val binIdx = inputSchema.fieldIndex(binaryColumn)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload = row.get(binIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
          case other => other.toString.getBytes("UTF-8")
        }
        val (vec, rate, ch, frames, durMs, fmt) =
          decodeAudio(payload, dim).getOrElse(
            (Array.empty[Float], -1.0f, -1, -1L, -1.0, "undecoded"))
        Row.fromSeq(row.toSeq ++ Seq(vec.toSeq, rate.toInt, ch, frames, durMs,
          fmt, payload.length.toLong))
      }
    }(enc)
  }

  /** Adds decoded features for a binary media column. Processing happens
    * per partition in batches (the same shape a vectorized/Arrow UDF would
    * see). Image payloads decode for real through [[decodeImage]]; audio
    * payloads through [[decodeAudio]] (mapped into the generic schema as
    * width := sample rate, height := channels, format := "audio/<type>" —
    * use [[withAudioFeatures]] for the full audio schema); only video
    * remains on the deterministic stub.
    */
  def withMediaFeatures(df: DataFrame, binaryColumn: String, dim: Int = 16): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ featureSchema.fields)
    val binIdx = inputSchema.fieldIndex(binaryColumn)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      // per-partition pass: codec state (the ImageIO registry) initializes
      // once per JVM; rows decode with that shared context
      rows.map { row =>
        val payload = row.get(binIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
          case other => other.toString.getBytes("UTF-8")
        }
        val (vec, w, h, fmt) =
          decodeImage(payload, dim)
            .orElse(decodeAudio(payload, dim).map { case (env, rate, ch, _, _, t) =>
              // decodeAudio's envelope is always exactly `dim` long
              (env, rate.toInt, ch, s"audio/$t")
            })
            .getOrElse(decodeStub(payload, dim))
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
