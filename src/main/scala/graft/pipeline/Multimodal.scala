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
  * a grayscale-thumbnail feature vector. AUDIO payloads (WAV/AU/AIFF)
  * decode for real through `javax.sound.sampled`. VIDEO payloads get REAL
  * container metadata — MP4/ISO-BMFF box walk, WebM/Matroska EBML walk,
  * AVI/RIFF chunk walk — and AVI frame payloads also decode for REAL:
  * MJPEG (standalone-JPEG frames) and PNG-in-AVI via ImageIO, raw
  * BI_RGB DIB frames via direct grid sampling. MP4/WebM frame decode
  * remains metadata-only (no in-JDK codec for H.264/VP8/VP9); a
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

  /** Upper bound on declared pixels before the full decode is attempted:
    * a few-hundred-byte "bomb" payload can declare a 60000x60000 image
    * whose BufferedImage would allocate ~14 GB and kill the executor with
    * an OutOfMemoryError no catch handler sees. Dimensions are available
    * header-only, so oversized payloads are rejected without decoding.
    */
  val MaxDecodedPixels: Long = 64L * 1024 * 1024 // 64 MP ~ 256 MB ARGB

  /** O(dim) grayscale thumbnail over a ~square grid: samples only the grid
    * points (NOT every pixel), so the cost is independent of frame size —
    * the property that keeps per-frame featurization cheap at 100 TB.
    */
  private def gridLuma(rgbAt: (Int, Int) => Int, w: Int, h: Int, dim: Int)
    : Array[Float] = {
    val gw = math.max(math.sqrt(dim.toDouble).toInt, 1)
    val gh = math.max((dim + gw - 1) / gw, 1)
    val vec = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val gx = i % gw
      val gy = i / gw
      val px = gx * (w - 1) / math.max(gw - 1, 1)
      val py = math.min(gy, gh - 1) * (h - 1) / math.max(gh - 1, 1)
      val rgb = rgbAt(math.min(px, w - 1), math.min(py, h - 1))
      val r = (rgb >> 16) & 0xFF
      val g = (rgb >> 8) & 0xFF
      val b = rgb & 0xFF
      vec(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
      i += 1
    }
    vec
  }

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
          Some((gridLuma((x, y) => img.getRGB(x, y), w, h, dim), w, h, fmt))
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
            .orElse(parseVideoMetadata(payload).map { case (cont, codec, vw, vh, _) =>
              // real container metadata; feature vec stays the stub (no
              // in-JDK video codec). Only a container WITH a video track
              // (nonzero tkhd/PixelWidth dims) is labeled video/* — an
              // audio-only .m4a or a moov-less fragment is still an
              // ISO-BMFF/Matroska payload, labeled media/* so downstream
              // `format LIKE 'video/%'` filters don't misclassify it
              val kind = if (vw > 0 && vh > 0) "video" else "media"
              (decodeStub(payload, dim)._1, vw, vh, s"$kind/$cont:$codec")
            })
            .getOrElse(decodeStub(payload, dim))
        Row.fromSeq(row.toSeq ++ Seq(vec.toSeq, w, h, fmt, payload.length.toLong))
      }
    }(enc)
  }

  // -------------------------------------------------------------------------
  // Video container metadata (pure byte-walking, in-JDK)
  // -------------------------------------------------------------------------

  /** Metadata schema produced per video item by [[withVideoMetadata]]. */
  val videoMetadataSchema: StructType = StructType(Seq(
    StructField("container", StringType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", DoubleType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** MP4 / ISO-BMFF header sniff: walks the box tree (size+fourcc headers,
    * 64-bit largesize and to-EOF sizes handled) and reads `mvhd`
    * (timescale+duration), per-`trak` `tkhd` (16.16 fixed-point dims) and
    * `stsd` (sample-entry fourcc). The frame payloads in `mdat` are never
    * touched — no codec needed. Returns (brand, codec, w, h, durationMs);
    * dims come from the first track with nonzero tkhd dimensions (audio
    * tracks carry 0x0). Malformed trees stop cleanly at the last
    * well-formed box.
    */
  private[graft] def parseMp4(bytes: Array[Byte])
    : Option[(String, String, Int, Int, Double)] = {
    if (bytes == null || bytes.length < 16) return None
    val topLevel = Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pdin")
    if (!topLevel.contains(fourcc(bytes, 4))) return None
    var brand = "mp4"; var codec = "unknown"
    var w = 0; var h = 0; var durMs = -1.0

    // walk boxes in [start, end); handle(type, bodyStart, boxEnd)
    def walk(start: Long, end: Long)(handle: (String, Long, Long) => Unit): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        var size = be32(bytes, off.toInt)
        val typ = fourcc(bytes, off.toInt + 4)
        var hdr = 8L
        if (size == 1 && off + 16 <= end) { size = be64(bytes, off.toInt + 8); hdr = 16 }
        else if (size == 0) size = end - off // box extends to end of enclosing space
        if (size < hdr || off + size > end) ok = false
        else { handle(typ, off + hdr, off + size); off += size }
      }
    }

    walk(0, bytes.length) { (typ, s, e) =>
      if (typ == "ftyp" && e - s >= 4)
        brand = fourcc(bytes, s.toInt).trim.toLowerCase(java.util.Locale.ROOT)
      if (typ == "moov") walk(s, e) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 20) {
          val v = bytes(s2.toInt) & 0xFF
          // v0: ver/flags(4) created(4) modified(4) timescale(4) duration(4)
          // v1: ver/flags(4) created(8) modified(8) timescale(4) duration(8)
          val (ts, dur) =
            if (v == 1 && e2 - s2 >= 32) (be32(bytes, s2.toInt + 20), be64(bytes, s2.toInt + 24))
            else (be32(bytes, s2.toInt + 12), be32(bytes, s2.toInt + 16))
          if (ts > 0 && dur >= 0) durMs = dur.toDouble / ts * 1000.0
        }
        if (t2 == "trak") {
          var tw = 0; var th = 0; var tCodec = "unknown"
          walk(s2, e2) { (t3, s3, e3) =>
            if (t3 == "tkhd") {
              val v = bytes(s3.toInt) & 0xFF
              // dims trail the fixed tkhd layout as 16.16 fixed point
              val dimOff = s3 + (if (v == 1) 88L else 76L)
              if (dimOff + 8 <= e3) {
                tw = (be32(bytes, dimOff.toInt) >> 16).toInt
                th = (be32(bytes, dimOff.toInt + 4) >> 16).toInt
              }
            }
            if (t3 == "mdia") walk(s3, e3) { (t4, s4, e4) =>
              if (t4 == "minf") walk(s4, e4) { (t5, s5, e5) =>
                if (t5 == "stbl") walk(s5, e5) { (t6, s6, e6) =>
                  // stsd body: ver/flags(4) entry_count(4) entry{size(4) fourcc(4)}
                  if (t6 == "stsd" && e6 - s6 >= 16)
                    tCodec = fourcc(bytes, s6.toInt + 12).trim
                      .toLowerCase(java.util.Locale.ROOT)
                }
              }
            }
          }
          if (tw > 0 && th > 0) { w = tw; h = th; codec = tCodec }
          else if (codec == "unknown" && tCodec != "unknown" && w == 0) codec = tCodec
        }
      }
    }
    Some((brand, codec, w, h, durMs))
  }

  /** WebM / Matroska (EBML) header sniff: walks the element tree (vint
    * IDs/sizes, unknown-size elements extend to the parent) and reads
    * DocType, Segment→Info (TimecodeScale + Duration) and
    * Segment→Tracks→TrackEntry (CodecID + Video PixelWidth/PixelHeight).
    * Cluster payloads are never touched.
    */
  private[graft] def parseEbml(bytes: Array[Byte])
    : Option[(String, String, Int, Int, Double)] = {
    if (bytes == null || bytes.length < 8 || be32(bytes, 0) != 0x1A45DFA3L) return None
    var docType = "matroska"; var codec = "unknown"
    var w = 0; var h = 0
    var timescaleNs = 1000000L // EBML default: 1 ms per timecode tick
    var durTicks = -1.0

    // vint: leading-zero count of the first byte encodes total length
    def vintLen(first: Int): Int = {
      var mask = 0x80; var n = 1
      while (n <= 8 && (first & mask) == 0) { mask >>= 1; n += 1 }
      n
    }
    // element ID keeps its marker bit; size clears it
    def readId(off: Long): (Long, Int) = {
      val n = vintLen(bytes(off.toInt) & 0xFF)
      if (n > 4 || off + n > bytes.length) return (-1L, 0)
      var v = 0L
      (0 until n).foreach(i => v = (v << 8) | (bytes(off.toInt + i) & 0xFFL))
      (v, n)
    }
    def readSize(off: Long): (Long, Int) = {
      val first = bytes(off.toInt) & 0xFF
      val n = vintLen(first)
      if (n > 8 || off + n > bytes.length) return (-1L, 0)
      var v = (first & (0xFF >> n)).toLong
      var allOnes = v == (0xFF >> n).toLong
      (1 until n).foreach { i =>
        val b = bytes(off.toInt + i) & 0xFFL
        allOnes &&= b == 0xFFL
        v = (v << 8) | b
      }
      (if (allOnes) -2L else v, n) // -2: unknown size (extends to parent end)
    }
    def uintAt(s: Long, e: Long): Long = {
      var v = 0L
      (s until e).foreach(i => v = (v << 8) | (bytes(i.toInt) & 0xFFL))
      v
    }
    def floatAt(s: Long, e: Long): Double = (e - s) match {
      case 4 => java.lang.Float.intBitsToFloat(uintAt(s, e).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(s, e))
      case _ => -1.0
    }
    def strAt(s: Long, e: Long): String =
      new String(bytes, s.toInt, (e - s).toInt, "UTF-8").trim

    def walk(start: Long, end: Long)(handle: (Long, Long, Long) => Unit): Unit = {
      var off = start
      var ok = true
      while (ok && off + 2 <= end) {
        val (id, idLen) = readId(off)
        if (idLen == 0) ok = false
        else {
          val (size0, szLen) = readSize(off + idLen)
          if (szLen == 0) ok = false
          else {
            val bodyStart = off + idLen + szLen
            val size = if (size0 == -2L) end - bodyStart else size0
            if (size < 0 || bodyStart + size > end) ok = false
            else { handle(id, bodyStart, bodyStart + size); off = bodyStart + size }
          }
        }
      }
    }

    walk(0, bytes.length) { (id, s, e) =>
      if (id == 0x1A45DFA3L) walk(s, e) { (i2, s2, e2) =>
        if (i2 == 0x4282L) docType = strAt(s2, e2).toLowerCase(java.util.Locale.ROOT)
      }
      if (id == 0x18538067L) walk(s, e) { (i2, s2, e2) => // Segment
        if (i2 == 0x1549A966L) walk(s2, e2) { (i3, s3, e3) => // Info
          if (i3 == 0x2AD7B1L) timescaleNs = uintAt(s3, e3)
          if (i3 == 0x4489L) durTicks = floatAt(s3, e3)
        }
        if (i2 == 0x1654AE6BL) walk(s2, e2) { (i3, s3, e3) => // Tracks
          if (i3 == 0xAEL) { // TrackEntry
            var tCodec = "unknown"; var tw = 0; var th = 0
            walk(s3, e3) { (i4, s4, e4) =>
              if (i4 == 0x86L) tCodec = strAt(s4, e4)
              if (i4 == 0xE0L) walk(s4, e4) { (i5, s5, e5) => // Video
                if (i5 == 0xB0L) tw = uintAt(s5, e5).toInt
                if (i5 == 0xBAL) th = uintAt(s5, e5).toInt
              }
            }
            if (tw > 0 && th > 0) { w = tw; h = th; codec = tCodec }
          }
        }
      }
    }
    val durMs = if (durTicks >= 0) durTicks * timescaleNs / 1e6 else -1.0
    Some((docType, codec, w, h, durMs))
  }

  // ---- AVI / RIFF ----------------------------------------------------------

  /** Parsed AVI structure: the `vids` stream's codec handler, declared
    * dims/frame timing from `avih`, the uncompressed-DIB pixel layout from
    * `strf` (when the stream is raw), and the (offset, length) of every
    * video-stream frame chunk inside `LIST movi` (recursing into `rec `
    * groups). Frame PAYLOADS are not touched by the walk itself.
    */
  private[pipeline] final case class AviInfo(
      codec: String, width: Int, height: Int, usPerFrame: Long,
      totalFrames: Long, bitCount: Int, biCompression: Long,
      frameChunks: Vector[(Int, Int)])

  /** RIFF/AVI walk (chunks are fourcc + u32le size, padded to even; LIST
    * chunks nest). Malformed trees stop cleanly at the last well-formed
    * chunk, same contract as [[parseMp4]]/[[parseEbml]].
    */
  private[pipeline] def parseAviInfo(bytes: Array[Byte]): Option[AviInfo] = {
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    var codec = "unknown"
    var w = 0; var h = 0; var usPerFrame = 0L; var totalFrames = 0L
    var bitCount = 0; var biCompression = -1L
    var strlOrdinal = -1; var vidsStream = -1
    var inVidsStrl = false
    val chunks = Vector.newBuilder[(Int, Int)]

    // walk chunks in [start, end); handle(id, listType, bodyStart, bodyEnd)
    def walk(start: Long, end: Long)(handle: (String, String, Long, Long) => Unit): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = fourcc(bytes, off.toInt)
        val size = le32(bytes, off.toInt + 4)
        val body = off + 8
        if (size < 0 || body + size > end) ok = false
        else {
          val listType =
            if ((id == "LIST" || id == "RIFF") && size >= 4) fourcc(bytes, body.toInt)
            else ""
          handle(id, listType, body, body + size)
          off = body + size + (size & 1) // chunk bodies pad to even offsets
        }
      }
    }

    def collectMovi(start: Long, end: Long): Unit = walk(start, end) { (id, lt, s, e) =>
      if (id == "LIST" && lt == "rec ") collectMovi(s + 4, e)
      else if (id.length == 4 && vidsStream >= 0 &&
        id.startsWith(f"$vidsStream%02d") &&
        (id.endsWith("dc") || id.endsWith("db")) && e > s)
        chunks += ((s.toInt, (e - s).toInt))
    }

    walk(12, bytes.length) { (id, lt, s, e) =>
      if (id == "LIST" && lt == "hdrl") walk(s + 4, e) { (id2, lt2, s2, e2) =>
        if (id2 == "avih" && e2 - s2 >= 40) {
          usPerFrame = le32(bytes, s2.toInt)
          totalFrames = le32(bytes, s2.toInt + 16)
          w = le32(bytes, s2.toInt + 32).toInt
          h = le32(bytes, s2.toInt + 36).toInt
        }
        if (id2 == "LIST" && lt2 == "strl") {
          strlOrdinal += 1
          inVidsStrl = false
          walk(s2 + 4, e2) { (id3, _, s3, e3) =>
            if (id3 == "strh" && e3 - s3 >= 8 && fourcc(bytes, s3.toInt) == "vids" &&
              vidsStream < 0) {
              vidsStream = strlOrdinal
              inVidsStrl = true
              codec = fourcc(bytes, s3.toInt + 4).trim.toLowerCase(java.util.Locale.ROOT)
              if (codec.isEmpty) codec = "dib" // raw streams leave handler blank/0
            }
            // BITMAPINFOHEADER: biSize biWidth biHeight biPlanes(16) biBitCount(16) biCompression
            if (id3 == "strf" && inVidsStrl && e3 - s3 >= 20) {
              bitCount = le16(bytes, s3.toInt + 14)
              biCompression = le32(bytes, s3.toInt + 16)
            }
          }
        }
      }
      if (id == "LIST" && lt == "movi") collectMovi(s + 4, e)
    }
    Some(AviInfo(codec, w, h, usPerFrame, totalFrames, bitCount, biCompression,
      chunks.result()))
  }

  /** AVI metadata in the common (container, codec, w, h, durationMs) shape. */
  private[graft] def parseAvi(bytes: Array[Byte])
    : Option[(String, String, Int, Int, Double)] =
    parseAviInfo(bytes).map { info =>
      val durMs =
        if (info.usPerFrame > 0 && info.totalFrames > 0)
          info.totalFrames * info.usPerFrame / 1000.0
        else -1.0
      ("avi", info.codec, info.width, info.height, durMs)
    }

  /** REAL decode of one AVI frame chunk. Two in-JDK codec paths, tried in
    * cost order:
    *  - uncompressed DIB chunks (BI_RGB 24/32-bit, the `##db` raw path)
    *    are grid-sampled DIRECTLY from the bottom-up BGR rows — O(dim)
    *    per frame, zero-copy, no BufferedImage allocation. Tried FIRST
    *    when the stream declares BI_RGB: ImageIO can never decode a bare
    *    DIB chunk, so routing it there would copy every frame for nothing;
    *  - compressed chunks (`##dc`) go through the ImageIO registry — this
    *    covers MJPEG (each frame is a standalone JPEG) and PNG-in-AVI.
    *    LIMITATION: MJPEG streams that omit the Huffman tables (decoders
    *    are expected to substitute the standard DHT) fail ImageIO and fall
    *    through to the sentinel row — only self-contained JPEG frames
    *    decode.
    * Returns None for codecs with no in-JDK decoder (H.264 etc.), for
    * declared dimensions beyond [[MaxDecodedPixels]], and for chunks whose
    * declared geometry does not fit the payload. All arithmetic on
    * declared dims is done in Long so hostile `avih`/`strf` headers cannot
    * wrap the bounds check into an out-of-range read.
    */
  private[pipeline] def decodeAviFrame(bytes: Array[Byte], off: Int, len: Int,
      info: AviInfo, dim: Int): Option[(Array[Float], Int, Int, String)] = {
    if (len <= 0) return None
    // raw DIB: bottom-up rows, 4-byte-aligned stride, BGR(A) byte order
    val bpp = info.bitCount / 8
    val w = info.width; val h = info.height
    if (info.biCompression == 0L && (bpp == 3 || bpp == 4) && w > 0 && h > 0 &&
      w.toLong * h <= MaxDecodedPixels) {
      val stride = (w.toLong * bpp + 3) / 4 * 4 // Long: w near 2^31 must not wrap
      if (stride * h <= len) {
        val strideI = stride.toInt // <= len <= Int.MaxValue after the guard
        def rgbAt(x: Int, y: Int): Int = {
          val p = off + (h - 1 - y) * strideI + x * bpp
          ((bytes(p + 2) & 0xFF) << 16) | ((bytes(p + 1) & 0xFF) << 8) | (bytes(p) & 0xFF)
        }
        return Some((gridLuma(rgbAt, w, h, dim), w, h, "dib"))
      }
    }
    decodeImage(java.util.Arrays.copyOfRange(bytes, off, off + len), dim)
  }

  /** Container metadata for a video payload — REAL header parsing
    * (MP4/ISO-BMFF box walk, WebM/Matroska EBML walk, AVI/RIFF chunk
    * walk), no frame decode. Returns None when the payload is none of the
    * three containers.
    */
  private[graft] def parseVideoMetadata(bytes: Array[Byte])
    : Option[(String, String, Int, Int, Double)] =
    try parseMp4(bytes).orElse(parseEbml(bytes)).orElse(parseAvi(bytes))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Adds container/codec/dims/duration for a binary video column, one row
    * per input row, per-partition batches ([[videoMetadataSchema]] fields
    * appended). Unparseable payloads get "unknown"/-1 so downstream
    * filters can drop them without a join. Frame DECODE stays stubbed
    * (no in-JDK codec); everything schema- and plan-level is real.
    */
  def withVideoMetadata(df: DataFrame, binaryColumn: String): DataFrame = {
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ videoMetadataSchema.fields)
    val binIdx = inputSchema.fieldIndex(binaryColumn)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload = row.get(binIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
          case other => other.toString.getBytes("UTF-8")
        }
        val (container, codec, w, h, durMs) =
          parseVideoMetadata(payload).getOrElse(("unknown", "unknown", -1, -1, -1.0))
        Row.fromSeq(row.toSeq ++ Seq(container, codec, w, h, durMs,
          payload.length.toLong))
      }
    }(enc)
  }

  /** Schema appended per decoded frame by [[withVideoFrameFeatures]]. */
  val videoFrameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("feature_vec", ArrayType(FloatType), nullable = false),
    StructField("frame_width", IntegerType, nullable = false),
    StructField("frame_height", IntegerType, nullable = false),
    StructField("frame_format", StringType, nullable = false),
    StructField("n_frames_total", IntegerType, nullable = false)))

  /** REAL video frame decode + sampling: emits one row per decoded frame
    * (every `everyNth`-th frame chunk, at most `maxFrames` per video) with
    * a [[gridLuma]] feature vector and true pixel dims. In-JDK codec
    * paths: AVI/MJPEG and PNG-in-AVI (per-frame ImageIO decode) and
    * AVI/raw-DIB (direct grid sampling, no image allocation). Payloads
    * with no decodable frames emit ONE sentinel row (`frame_idx = -1`,
    * empty vector) so failures are countable without a join, matching
    * [[withAudioFeatures]]'s sentinel contract — and the sentinel keeps
    * what IS known: a parsed AVI container with an undecodable codec
    * (H.264-in-AVI etc.) reports `frame_format = "avi/<codec>:undecoded"`
    * and its TRUE chunk count in `n_frames_total`, distinguishable from
    * non-video bytes (`"undecoded"`, 0). Per-frame decode failures on
    * malformed chunks are swallowed (NonFatal => sentinel), never a task
    * failure.
    *
    * Scale shape: the flatMap is map-side only (frame rows stay colocated
    * with their source partition, no shuffle), per-frame featurization is
    * O(dim) after the codec, and a video contributes at most `maxFrames`
    * output rows regardless of its length — bounded fan-out.
    */
  def withVideoFrameFeatures(df: DataFrame, binaryColumn: String,
      everyNth: Int = 30, maxFrames: Int = 8, dim: Int = 16): DataFrame = {
    require(everyNth > 0, "everyNth must be positive")
    require(maxFrames > 0, "maxFrames must be positive")
    val inputSchema = df.schema
    val outSchema = StructType(inputSchema.fields ++ videoFrameSchema.fields)
    val binIdx = inputSchema.fieldIndex(binaryColumn)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val payload = row.get(binIdx) match {
          case b: Array[Byte] => b
          case null => Array.empty[Byte]
          case other => other.toString.getBytes("UTF-8")
        }
        val parsed =
          try parseAviInfo(payload)
          catch { case scala.util.control.NonFatal(_) => None }
        val decoded: Seq[Row] = parsed.toSeq.flatMap { info =>
          val n = info.frameChunks.length
          Iterator.range(0, n, everyNth).take(maxFrames).flatMap { idx =>
            val (off, len) = info.frameChunks(idx)
            // a corrupt chunk must cost one frame, not the whole task
            (try decodeAviFrame(payload, off, len, info, dim)
             catch { case scala.util.control.NonFatal(_) => None }).map {
              case (vec, w, h, fmt) =>
                Row.fromSeq(row.toSeq ++
                  Seq(idx, vec.toSeq, w, h, s"avi/${info.codec}:$fmt", n))
            }
          }.toSeq
        }
        if (decoded.nonEmpty) decoded
        else parsed match {
          case Some(info) => // container parsed, codec undecodable: keep the facts
            Seq(Row.fromSeq(row.toSeq ++ Seq(-1, Seq.empty[Float], -1, -1,
              s"avi/${info.codec}:undecoded", info.frameChunks.length)))
          case None =>
            Seq(Row.fromSeq(row.toSeq ++
              Seq(-1, Seq.empty[Float], -1, -1, "undecoded", 0)))
        }
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
