package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers
import org.scalatest.wordspec.AnyWordSpec

import graft.applicability.Applicability
import graft.checks.{Check, CheckLevel, CheckStatus}
import graft.core._
import graft.pipeline.Multimodal
import graft.schema._
import graft.streaming.{StreamingOps, StreamingVerifier}

/** Specs for the round-1 tail surfaces: row-level schema validation,
  * applicability dry-runs, streaming incremental verification, and
  * multimodal binary-column plumbing.
  */
class PipelineSurfacesSpec extends AnyWordSpec with Matchers with SparkSpec {

  "RowLevelSchemaValidator" should {
    "split valid and invalid rows with typed output" in {
      val s = spark
      import s.implicits._
      val raw = Seq(
        ("1", "alice", "12.50", "2024-01-01 10:00:00"),
        ("x", "bob", "3.00", "2024-01-02 11:00:00"),   // bad int
        ("3", null, "9.99", "2024-01-03 12:00:00"),    // null name (not nullable)
        ("4", "carol", "notanum", "2024-01-04 13:00:00"), // bad decimal
        ("5", "dave", "1.25", "bad-ts")                // bad timestamp
      ).toDF("id", "name", "amount", "ts")

      val schema = RowLevelSchema()
        .withIntColumn("id", isNullable = false, minValue = Some(0))
        .withStringColumn("name", isNullable = false, minLength = Some(1))
        .withDecimalColumn("amount", precision = 10, scale = 2, isNullable = false)
        .withTimestampColumn("ts", mask = "yyyy-MM-dd HH:mm:ss", isNullable = false)

      val result = RowLevelSchemaValidator.validate(raw, schema)
      result.numValidRows shouldBe 1L
      result.numInvalidRows shouldBe 4L
      val validRow = result.validRows.collect().head
      result.validRows.schema("id").dataType shouldBe IntegerType
      result.validRows.schema("amount").dataType shouldBe DecimalType(10, 2)
      result.validRows.schema("ts").dataType shouldBe TimestampType
      validRow.getInt(0) shouldBe 1
    }

    "enforce string constraints (length, regex)" in {
      val s = spark
      import s.implicits._
      val raw = Seq("a@x.com", "bad", "cc@y.org").toDF("email")
      val schema = RowLevelSchema()
        .withStringColumn("email", isNullable = false,
          matches = Some("^[^@]+@[^@]+\\.[a-z]+$"))
      val result = RowLevelSchemaValidator.validate(raw, schema)
      result.numValidRows shouldBe 2L
      result.numInvalidRows shouldBe 1L
    }

    "release the marked cache after both splits are consumed" in {
      val s = spark
      import s.implicits._
      val raw = (1 to 100).map(_.toString).toDF("id")
      val schema = RowLevelSchema().withIntColumn("id", isNullable = false)
      val before = s.sparkContext.getPersistentRDDs.size
      val result = RowLevelSchemaValidator.validate(raw, schema)
      s.sparkContext.getPersistentRDDs.size should be > before
      result.validRows.count() shouldBe 100L
      result.invalidRows.count() shouldBe 0L
      // listener delivery is async — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (s.sparkContext.getPersistentRDDs.size > before &&
          System.nanoTime() < deadline) Thread.sleep(100)
      s.sparkContext.getPersistentRDDs.size shouldBe before
    }

    "release the marked cache when ONE action consumes both splits" in {
      val s = spark
      import s.implicits._
      val raw = (1 to 50).map(_.toString).toDF("id")
      val schema = RowLevelSchema().withIntColumn("id", isNullable = false)
      val before = s.sparkContext.getPersistentRDDs.size
      val result = RowLevelSchemaValidator.validate(raw, schema)
      // a single plan carrying BOTH observe tags counts one consumption
      // per tag — full consumption in one action
      result.validRows.select("id").unionByName(
        result.invalidRows.selectExpr("cast(id as int) as id")).count() shouldBe 50L
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (s.sparkContext.getPersistentRDDs.size > before &&
          System.nanoTime() < deadline) Thread.sleep(100)
      s.sparkContext.getPersistentRDDs.size shouldBe before
    }
  }

  "Applicability" should {
    "accept a check that matches the schema" in {
      val schema = StructType(Seq(
        StructField("item", StringType, nullable = true),
        StructField("price", DoubleType, nullable = true)))
      val check = Check(CheckLevel.Error, "applicability")
        .isComplete("item")
        .hasMin("price", _ => true)
      val report = new Applicability(spark).isApplicable(check, schema)
      report.isApplicable shouldBe true
    }

    "reject analyzers referencing missing or non-numeric columns" in {
      val schema = StructType(Seq(
        StructField("item", StringType, nullable = true)))
      val report = new Applicability(spark).isApplicable(
        Seq[AnyAnalyzer](operators.Minimum("nope"), operators.Mean("item")), schema)
      report.isApplicable shouldBe false
      report.failures.size shouldBe 2
    }
  }

  "StreamingVerifier" should {
    "accumulate state across micro-batches (cumulative metrics)" in {
      val s = spark
      import s.implicits._
      val check = Check(CheckLevel.Error, "stream")
        .hasSize(_ == 6)
        .isComplete("v")
      val verifier = new StreamingVerifier(
        Seq[AnyAnalyzer](operators.Mean("v")), Seq(check))

      val b1 = Seq(1.0, 2.0, 3.0).toDF("v")
      val b2 = Seq(4.0, 5.0, 6.0).toDF("v")

      val r1 = verifier.processBatch(b1)
      r1.status shouldBe CheckStatus.Error // size 3 != 6 yet

      val r2 = verifier.processBatch(b2)
      r2.status shouldBe CheckStatus.Success // cumulative size 6
      val mean = r2.metrics.collectFirst {
        case (a: operators.Mean, m) if a.column == "v" => m.value.get.asInstanceOf[Double]
      }
      mean shouldBe Some(3.5)
    }

    "not double-merge a replayed batchId (at-least-once foreachBatch)" in {
      val s = spark
      import s.implicits._
      val verifier = new StreamingVerifier(Seq[AnyAnalyzer](operators.Size()))
      val b = Seq(1.0, 2.0).toDF("v")
      verifier.processBatch(b, batchId = 0L)
      verifier.processBatch(b, batchId = 0L) // replay must be a no-op
      val size = verifier.latestResult.get.metrics.collectFirst {
        case (_: operators.Size, m) => m.value.get.asInstanceOf[Double]
      }
      size shouldBe Some(2.0)
    }

    "accumulate grouping states across many batches with bounded lineage" in {
      val s = spark
      import s.implicits._
      val verifier = new StreamingVerifier(Seq[AnyAnalyzer](
        operators.Uniqueness(Seq("k"))))
      // 6 batches; key 0 repeats across all, others unique
      (0 until 6).foreach { i =>
        verifier.processBatch(Seq(0, 100 + i).toDF("k"), batchId = i.toLong)
      }
      val uniq = verifier.latestResult.get.metrics.collectFirst {
        case (_: operators.Uniqueness, m) => m.value.get.asInstanceOf[Double]
      }
      // 12 rows, 6 unique singletons (100..105); key 0 appears 6 times
      uniq shouldBe Some(6.0 / 12.0)
    }

    "compute windowed and session aggregations on batch data" in {
      val s = spark
      import s.implicits._
      val events = Seq(
        ("2024-01-01 00:00:10", "a", 1.0),
        ("2024-01-01 00:00:50", "a", 2.0),
        ("2024-01-01 00:01:10", "b", 3.0),
        ("2024-01-01 00:05:00", "a", 4.0)
      ).toDF("ts_raw", "key", "value")
        .withColumn("ts", to_timestamp(col("ts_raw")))

      val windowed = StreamingOps.windowedAgg(
        events, "ts", "1 minute",
        aggregations = Seq(sum(col("value")).as("total")))
      windowed.count() shouldBe 3L
      windowed.agg(sum("total")).collect().head.getDouble(0) shouldBe 10.0

      val sessions = StreamingOps.sessionized(
        events, "ts", "2 minutes", Seq("key"),
        aggregations = Seq(count(lit(1)).as("n")))
      // key a: rows at 0:10/0:50 chain into one session; 5:00 a second one; key b: one
      sessions.count() shouldBe 3L
    }

    "compute freshness ratio" in {
      val s = spark
      import s.implicits._
      val now = 1700000000L
      val df = Seq(now - 10, now - 100, now - 10000).map { epoch =>
        new java.sql.Timestamp(epoch * 1000L)
      }.toDF("ts")
      StreamingOps.freshnessRatio(df, "ts", maxAgeSeconds = 300, nowEpoch = now) shouldBe (2.0 / 3.0)
    }
  }

  "Multimodal" should {
    val payloadSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))

    def mediaDf = {
      val rows = Seq(
        Row(1L, Array.fill[Byte](2048)(7)),
        Row(2L, Array.fill[Byte](4096)(9)),
        Row(3L, null)
      )
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        payloadSchema)
    }

    "attach deterministic features with the declared schema" in {
      val out = Multimodal.withMediaFeatures(mediaDf, "payload", dim = 8)
      out.schema.fieldNames should contain allOf ("feature_vec", "width", "height", "format", "n_bytes")
      val rows = out.orderBy("media_id").collect()
      rows.length shouldBe 3
      rows(0).getAs[scala.collection.Seq[Float]]("feature_vec").length shouldBe 8
      rows(0).getAs[Long]("n_bytes") shouldBe 2048L
      rows(2).getAs[Long]("n_bytes") shouldBe 0L
      // determinism: same payload -> same features
      val again = Multimodal.withMediaFeatures(mediaDf, "payload", dim = 8)
        .orderBy("media_id").collect()
      again(1).getAs[scala.collection.Seq[Float]]("feature_vec") shouldBe
        rows(1).getAs[scala.collection.Seq[Float]]("feature_vec")
    }

    "decode REAL PNG and JPEG payloads to true dimensions via ImageIO" in {
      import java.awt.image.BufferedImage
      def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        (0 until w).foreach(x => (0 until h).foreach { y =>
          img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8))
        })
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, format, out)
        out.toByteArray
      }
      val rows = Seq(
        Row(1L, imageBytes(37, 21, "png")),
        Row(2L, imageBytes(64, 48, "jpg")),
        Row(3L, "not an image".getBytes("UTF-8")))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        payloadSchema)
      val out = Multimodal.withMediaFeatures(df, "payload").orderBy("media_id").collect()
      out(0).getAs[Int]("width") shouldBe 37
      out(0).getAs[Int]("height") shouldBe 21
      out(0).getAs[String]("format") shouldBe "png"
      val vec = out(0).getAs[scala.collection.Seq[Float]]("feature_vec")
      vec.length shouldBe 16
      all(vec) should (be >= 0.0f and be <= 1.0f)
      out(1).getAs[Int]("width") shouldBe 64
      out(1).getAs[Int]("height") shouldBe 48
      out(1).getAs[String]("format") should include("jpeg")
      // non-image payloads keep the deterministic stub path
      out(2).getAs[String]("format") shouldBe "stub"
    }

    "decode REAL WAV payloads to sample rate, duration and RMS envelope" in {
      import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
      // 0.5 s of a 440 Hz sine at 8 kHz mono 16-bit little-endian PCM
      def wavBytes(rate: Float, seconds: Double, amplitude: Double): Array[Byte] = {
        val n = (rate * seconds).toInt
        val pcm = new Array[Byte](n * 2)
        (0 until n).foreach { i =>
          val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * amplitude * 32767).toInt
          pcm(2 * i) = (s & 0xFF).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        }
        val fmt = new AudioFormat(rate, 16, 1, true, false)
        val stream = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
        out.toByteArray
      }
      // 24-bit studio-export WAV: same sine, packed 3 bytes/sample LE
      def wav24Bytes(rate: Float, seconds: Double, amplitude: Double): Array[Byte] = {
        val n = (rate * seconds).toInt
        val pcm = new Array[Byte](n * 3)
        (0 until n).foreach { i =>
          val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * amplitude * 8388607).toInt
          pcm(3 * i) = (s & 0xFF).toByte
          pcm(3 * i + 1) = ((s >> 8) & 0xFF).toByte
          pcm(3 * i + 2) = ((s >> 16) & 0xFF).toByte
        }
        val fmt = new AudioFormat(rate, 24, 1, true, false)
        val stream = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val out = new java.io.ByteArrayOutputStream()
        AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
        out.toByteArray
      }
      val rows = Seq(
        Row(1L, wavBytes(8000.0f, 0.5, 0.5)),
        Row(2L, "not audio either".getBytes("UTF-8")),
        Row(3L, wav24Bytes(8000.0f, 0.25, 0.5)))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        payloadSchema)
      val out = Multimodal.withAudioFeatures(df, "payload", dim = 8)
        .orderBy("media_id").collect()
      out(0).getAs[Int]("sample_rate") shouldBe 8000
      out(0).getAs[Int]("channels") shouldBe 1
      out(0).getAs[Long]("frames") shouldBe 4000L
      out(0).getAs[Double]("duration_ms") shouldBe 500.0 +- 1.0
      out(0).getAs[String]("audio_format") should include("wav")
      val env = out(0).getAs[scala.collection.Seq[Float]]("feature_vec")
      env.length shouldBe 8
      // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.354 in every bucket
      all(env) should (be >= 0.30f and be <= 0.40f)
      out(1).getAs[String]("audio_format") shouldBe "undecoded"
      out(1).getAs[Int]("sample_rate") shouldBe -1
      // 24-bit PCM decodes for real too (same RMS, half the duration)
      out(2).getAs[Int]("sample_rate") shouldBe 8000
      out(2).getAs[Double]("duration_ms") shouldBe 250.0 +- 1.0
      val env24 = out(2).getAs[scala.collection.Seq[Float]]("feature_vec")
      all(env24) should (be >= 0.30f and be <= 0.40f)

      // the generic media path now routes audio for real: width carries the
      // sample rate, format the audio type; only video remains stubbed
      val generic = Multimodal.withMediaFeatures(df, "payload", dim = 8)
        .orderBy("media_id").collect()
      generic(0).getAs[Int]("width") shouldBe 8000
      generic(0).getAs[String]("format") should startWith("audio/")
      generic(1).getAs[String]("format") shouldBe "stub"
    }

    "parse REAL MP4 and WebM container headers to codec/dims/duration" in {
      // --- minimal-but-valid ISO-BMFF tree built byte-for-byte ---
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def box(typ: String, body: Array[Byte]): Array[Byte] =
        be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
      val mvhd = { // v0: timescale 600, duration 3000 ticks = 5000 ms
        val b = new Array[Byte](100)
        be32(600L).copyToArray(b, 12)
        be32(3000L).copyToArray(b, 16)
        box("mvhd", b)
      }
      val tkhd = { // v0: 640x360 as 16.16 fixed point at offset 76
        val b = new Array[Byte](84)
        be32(640L << 16).copyToArray(b, 76)
        be32(360L << 16).copyToArray(b, 80)
        box("tkhd", b)
      }
      val stsd = box("stsd",
        be32(0L) ++ be32(1L) ++ be32(16L) ++ "avc1".getBytes("ISO-8859-1") ++
          new Array[Byte](8))
      val trak = box("trak",
        tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
      val ftyp = box("ftyp",
        "isom".getBytes("ISO-8859-1") ++ be32(512L) ++ "isom".getBytes("ISO-8859-1"))
      val mp4 = ftyp ++ box("moov", mvhd ++ trak) ++
        box("mdat", Array.fill[Byte](64)(3))

      // --- minimal WebM (EBML) tree ---
      def ebmlId(id: Long): Array[Byte] = {
        val n = (63 - java.lang.Long.numberOfLeadingZeros(id)) / 8 + 1
        Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xFF).toByte)
      }
      def el(id: Long, body: Array[Byte]): Array[Byte] = {
        require(body.length < 127)
        ebmlId(id) ++ Array((0x80 | body.length).toByte) ++ body
      }
      def uintBytes(v: Long): Array[Byte] = {
        val n = math.max((63 - java.lang.Long.numberOfLeadingZeros(v)) / 8 + 1, 1)
        Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
      }
      val header = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes("UTF-8")))
      val info = el(0x1549A966L,
        el(0x2AD7B1L, uintBytes(1000000L)) ++ // 1 ms ticks
          el(0x4489L, be32(java.lang.Float.floatToIntBits(12345.0f) & 0xFFFFFFFFL)))
      val tracks = el(0x1654AE6BL, el(0xAEL,
        el(0x86L, "V_VP9".getBytes("UTF-8")) ++
          el(0xE0L, el(0xB0L, uintBytes(1920L)) ++ el(0xBAL, uintBytes(1080L)))))
      val webm = header ++ el(0x18538067L, info ++ tracks)

      // audio-only ISO-BMFF (.m4a): no tkhd dims, stsd carries mp4a
      val stsdAudio = box("stsd",
        be32(0L) ++ be32(1L) ++ be32(16L) ++ "mp4a".getBytes("ISO-8859-1") ++
          new Array[Byte](8))
      val trakAudio = box("trak",
        box("tkhd", new Array[Byte](84)) ++
          box("mdia", box("minf", box("stbl", stsdAudio))))
      val m4a = box("ftyp",
        "M4A ".getBytes("ISO-8859-1") ++ be32(0L) ++ "M4A ".getBytes("ISO-8859-1")) ++
        box("moov", mvhd ++ trakAudio)

      Multimodal.parseMp4(mp4) shouldBe Some(("isom", "avc1", 640, 360, 5000.0))
      Multimodal.parseMp4(m4a) shouldBe Some(("m4a", "mp4a", 0, 0, 5000.0))
      Multimodal.parseEbml(webm).get shouldBe ("webm", "V_VP9", 1920, 1080, 12345.0)
      // neither parser claims foreign payloads
      Multimodal.parseVideoMetadata("garbage that is not a container".getBytes) shouldBe None
      Multimodal.parseMp4(webm) shouldBe None
      Multimodal.parseEbml(mp4) shouldBe None
      // truncated payloads fail cleanly, keeping whatever parsed before the cut
      Multimodal.parseVideoMetadata(mp4.take(40)) should not be null

      val rows = Seq(Row(1L, mp4), Row(2L, webm), Row(3L, "junk".getBytes("UTF-8")),
        Row(4L, m4a))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        payloadSchema)
      val out = Multimodal.withVideoMetadata(df, "payload").orderBy("media_id").collect()
      out(0).getAs[String]("container") shouldBe "isom"
      out(0).getAs[String]("codec") shouldBe "avc1"
      out(0).getAs[Int]("width") shouldBe 640
      out(0).getAs[Double]("duration_ms") shouldBe 5000.0 +- 1e-9
      out(1).getAs[String]("container") shouldBe "webm"
      out(1).getAs[Int]("height") shouldBe 1080
      out(2).getAs[String]("container") shouldBe "unknown"
      out(2).getAs[Int]("width") shouldBe -1

      // the generic media path surfaces video container metadata too
      val generic = Multimodal.withMediaFeatures(df, "payload", dim = 8)
        .orderBy("media_id").collect()
      generic(0).getAs[String]("format") shouldBe "video/isom:avc1"
      generic(0).getAs[Int]("width") shouldBe 640
      generic(1).getAs[String]("format") shouldBe "video/webm:V_VP9"
      generic(2).getAs[String]("format") shouldBe "stub"
      // audio-only container: real metadata, but NOT labeled video/*
      generic(3).getAs[String]("format") shouldBe "media/m4a:mp4a"

      // fuzz: byte-walking parsers must never throw — random payloads,
      // every truncation of the valid fixtures, and seeded single-byte
      // corruptions (the classic OOB territory for header parsers)
      val rnd = new scala.util.Random(1234)
      (0 until 200).foreach { _ =>
        val garbage = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt().toByte)
        noException should be thrownBy Multimodal.parseVideoMetadata(garbage)
      }
      Seq(mp4, webm).foreach { fixture =>
        (0 to fixture.length).foreach { cut =>
          noException should be thrownBy Multimodal.parseVideoMetadata(fixture.take(cut))
        }
        (0 until 200).foreach { _ =>
          val corrupted = fixture.clone()
          corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt().toByte
          noException should be thrownBy Multimodal.parseVideoMetadata(corrupted)
        }
      }
    }

    "parse and frame-decode REAL AVI containers (MJPEG, PNG-in-AVI, raw DIB)" in {
      // --- minimal-but-valid RIFF/AVI tree built byte-for-byte ---
      def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      def chunk(id: String, body: Array[Byte]): Array[Byte] = {
        val padded = if (body.length % 2 == 1) body :+ 0.toByte else body
        id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ padded
      }
      def list(typ: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
      def aviBytes(codec: String, w: Int, h: Int, usPerFrame: Long,
          bitCount: Int, biCompression: Long,
          frames: Seq[(String, Array[Byte])]): Array[Byte] = {
        val avihBody = new Array[Byte](56)
        le32(usPerFrame).copyToArray(avihBody, 0)
        le32(frames.length.toLong).copyToArray(avihBody, 16)
        le32(w.toLong).copyToArray(avihBody, 32)
        le32(h.toLong).copyToArray(avihBody, 36)
        val strhBody = "vids".getBytes("ISO-8859-1") ++
          codec.getBytes("ISO-8859-1") ++ new Array[Byte](48)
        val strfBody = new Array[Byte](40)
        le32(40L).copyToArray(strfBody, 0)
        le32(w.toLong).copyToArray(strfBody, 4)
        le32(h.toLong).copyToArray(strfBody, 8)
        le16(1).copyToArray(strfBody, 12)
        le16(bitCount).copyToArray(strfBody, 14)
        le32(biCompression).copyToArray(strfBody, 16)
        val hdrl = list("hdrl", chunk("avih", avihBody) ++
          list("strl", chunk("strh", strhBody) ++ chunk("strf", strfBody)))
        val movi = list("movi",
          frames.toArray.flatMap { case (id, b) => chunk(id, b) })
        val riffBody = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
        "RIFF".getBytes("ISO-8859-1") ++ le32(riffBody.length.toLong) ++ riffBody
      }

      // compressed frames: real JPEG and PNG bytes written via ImageIO
      def imageFrame(fmt: String, rgb: Int, w: Int, h: Int): Array[Byte] = {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        bos.toByteArray
      }
      // raw DIB frame: bottom-up, 4-byte-aligned stride, BGR order
      def dibFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
        val stride = (w * 3 + 3) / 4 * 4
        val body = new Array[Byte](stride * h)
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            val p = y * stride + x * 3
            body(p) = b.toByte; body(p + 1) = g.toByte; body(p + 2) = r.toByte
          }
        }
        body
      }

      val mjpegAvi = aviBytes("MJPG", 8, 6, 40000L, 24, 0x47504A4DL,
        (0 until 3).map(_ => "00dc" -> imageFrame("jpg", 0x808080, 8, 6)))
      val pngAvi = aviBytes("MJPG", 8, 6, 40000L, 24, 0x47504A4DL,
        Seq("00dc" -> imageFrame("png", 0xFF0000, 8, 6)))
      val dibAvi = aviBytes("DIB ", 6, 4, 33333L, 24, 0L,
        (0 until 2).map(_ => "00db" -> dibFrame(6, 4, 10, 20, 30)))
      val h264Avi = aviBytes("H264", 320, 240, 33333L, 0, 0x34363248L,
        (0 until 5).map(i => "00dc" -> Array.fill[Byte](32)((i + 1).toByte)))

      // container metadata round-trips (duration = nFrames * usPerFrame)
      Multimodal.parseAvi(mjpegAvi) shouldBe Some(("avi", "mjpg", 8, 6, 120.0))
      Multimodal.parseAvi(dibAvi) shouldBe Some(("avi", "dib", 6, 4, 66.666))
      Multimodal.parseVideoMetadata(h264Avi) shouldBe
        Some(("avi", "h264", 320, 240, 166.665))

      val rows = Seq(Row(1L, mjpegAvi), Row(2L, pngAvi), Row(3L, dibAvi),
        Row(4L, h264Avi), Row(5L, "not a video at all".getBytes("UTF-8")))
      val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        payloadSchema)
      val frames = Multimodal.withVideoFrameFeatures(df, "payload",
          everyNth = 1, maxFrames = 8, dim = 4)
        .orderBy("media_id", "frame_idx").collect()

      val mj = frames.filter(_.getLong(0) == 1L)
      mj.map(_.getAs[Int]("frame_idx")).toSeq shouldBe Seq(0, 1, 2)
      mj.foreach { r =>
        r.getAs[String]("frame_format") shouldBe "avi/mjpg:jpeg"
        r.getAs[Int]("frame_width") shouldBe 8
        r.getAs[Int]("frame_height") shouldBe 6
        r.getAs[Int]("n_frames_total") shouldBe 3
        // solid mid-gray frame -> every luma sample ~0.5 (JPEG is lossy)
        r.getAs[Seq[Float]]("feature_vec").foreach(_ shouldBe 0.502f +- 0.05f)
      }
      val pngRows = frames.filter(_.getLong(0) == 2L)
      pngRows should have length 1
      pngRows.head.getAs[String]("frame_format") shouldBe "avi/mjpg:png"
      // PNG is lossless: solid red -> luma exactly 0.299
      pngRows.head.getAs[Seq[Float]]("feature_vec")
        .foreach(_ shouldBe 0.299f +- 1e-4f)
      val dib = frames.filter(_.getLong(0) == 3L)
      dib.map(_.getAs[Int]("frame_idx")).toSeq shouldBe Seq(0, 1)
      dib.foreach { r =>
        r.getAs[String]("frame_format") shouldBe "avi/dib:dib"
        r.getAs[Int]("frame_width") shouldBe 6
        r.getAs[Int]("frame_height") shouldBe 4
        val expected = (0.299f * 10 + 0.587f * 20 + 0.114f * 30) / 255.0f
        r.getAs[Seq[Float]]("feature_vec").foreach(_ shouldBe expected +- 1e-6f)
      }
      // parsed container + undecodable codec: sentinel keeps codec + count
      val h264 = frames.filter(_.getLong(0) == 4L)
      h264 should have length 1
      h264.head.getAs[Int]("frame_idx") shouldBe -1
      h264.head.getAs[String]("frame_format") shouldBe "avi/h264:undecoded"
      h264.head.getAs[Int]("n_frames_total") shouldBe 5
      // non-video bytes: generic sentinel
      val junk = frames.filter(_.getLong(0) == 5L)
      junk.head.getAs[String]("frame_format") shouldBe "undecoded"
      junk.head.getAs[Int]("n_frames_total") shouldBe 0

      // hostile headers must not wrap the DIB bounds check into OOB reads:
      // w=0x20000001 at 32bpp wraps Int w*bpp to 4, so the old Int stride
      // was tiny and the bounds check passed while rgbAt read far OOB
      val bombAvi = aviBytes("DIB ", 0x20000001, 2, 33333L, 32, 0L,
        Seq("00db" -> Array.fill[Byte](64)(1)))
      val bombOut = Multimodal.withVideoFrameFeatures(
        spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(Seq(Row(9L, bombAvi)).toList).asJava),
          payloadSchema), "payload", everyNth = 1, maxFrames = 2, dim = 4)
        .collect()
      bombOut should have length 1
      bombOut.head.getAs[Int]("frame_idx") shouldBe -1

      // fuzz: the same truncation + corruption sweep the MP4/WebM fixtures
      // get — the AVI walker and frame decoder must never throw
      val rnd = new scala.util.Random(4321)
      Seq(mjpegAvi, dibAvi).foreach { fixture =>
        (0 to fixture.length).foreach { cut =>
          noException should be thrownBy Multimodal.parseVideoMetadata(fixture.take(cut))
        }
        (0 until 200).foreach { _ =>
          val corrupted = fixture.clone()
          corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt().toByte
          noException should be thrownBy Multimodal.parseVideoMetadata(corrupted)
        }
      }
      // frame-decode path under corruption: batch every mutant through ONE
      // Spark job — any decode escape fails the collect
      val mutants =
        Seq(mjpegAvi, dibAvi).zipWithIndex.flatMap { case (fixture, fi) =>
          (0 to fixture.length by 7).map(cut =>
            Row((fi * 10000 + cut).toLong, fixture.take(cut))) ++
            (0 until 100).map { i =>
              val corrupted = fixture.clone()
              corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt().toByte
              Row((fi * 10000 + 5000 + i).toLong, corrupted)
            }
        }
      val mutantDf = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(mutants.toList).asJava),
        payloadSchema)
      noException should be thrownBy
        Multimodal.withVideoFrameFeatures(mutantDf, "payload",
          everyNth = 1, maxFrames = 4, dim = 4).count()
    }

    "sample frames deterministically" in {
      val sampled = Multimodal.sampleFrames(mediaDf.filter(col("payload").isNotNull),
        "payload", everyNth = 1, maxFrames = 4)
      // 2048B -> 2 "frames", 4096B -> 4 "frames"
      sampled.count() shouldBe 6L
      sampled.schema.fieldNames should contain allOf ("graft_frame_idx", "graft_frame_ref")
    }

    "record resize plan columns" in {
      val df = Multimodal.withMediaFeatures(mediaDf, "payload")
      val planned = Multimodal.withResizePlan(df, "width", "height", 224, 224)
      val r = planned.filter(col("media_id") === 1L).collect().head
      r.getAs[Int]("target_width") shouldBe 224
      r.getAs[Double]("scale_x") shouldBe (224.0 / r.getAs[Int]("width"))
    }
  }
}
