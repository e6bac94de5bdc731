package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata +
  * batched feature extraction — the schema/partitioning shape a 100 TB
  * image/audio corpus needs. Two codec tiers:
  *   - [[PngCodec]] — a REAL PNG encoder/decoder (JDK `javax.imageio`, no
  *     external deps), exercised on real bytes by `multimodal_decode_png`
  *     and oracle-gated via closed-form pixel facts;
  *   - [[StubCodec]]/[[featureStub]] — the deterministic stand-in for codecs
  *     the container genuinely lacks (JPEG-XL, ffmpeg audio/video), keeping
  *     the surrounding plumbing — binary columns, metadata struct, batch
  *     iteration, feature schema — fully exercisable and oracle-exact.
  *
  * No reference counterpart (hyrise's five types have no BINARY,
  * reference: src/lib/all_type_variant.hpp:34-39) — this is training-data-
  * pipeline extension surface.
  */
object Multimodal {

  /** Wrap a text column as an opaque binary payload with typed metadata —
    * the shape of an ingested media column (payload + sidecar metadata). */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        // === STUB === a real pipeline reads the container format; here the
        // "format" derives deterministically from payload length.
        when(length(col("payload")) % 3 === 0, "png")
          .when(length(col("payload")) % 3 === 1, "jpg")
          .otherwise("wav").as("format")))

  /** === STUB: media decode ===
    * A real implementation decodes the payload (image pixels / audio samples)
    * per batch — on Spark that is `mapPartitions` over arrow batches with the
    * codec library, one task per input split. This stub derives a deterministic
    * 4-dim "feature vector" from the payload's md5 so the plumbing (schema,
    * batching, downstream joins) is fully exercisable without codecs. */
  def featureStub(payload: Column, dims: Int = 4): Column =
    array((0 until dims).map { j =>
      (TextFunctions.hash64(md5(payload), s"ft$j") % 1000L).cast("double") / 1000.0
    }: _*)

  /** Batched decode path: the mapPartitions shape a real codec would use —
    * one iterator pass per partition, no per-row JVM call overhead. The row
    * transform itself delegates to the same deterministic stub expression. */
  def decodeBatched(spark: SparkSession, df: DataFrame, dims: Int = 4): DataFrame = {
    // Batch boundary == partition boundary: a real impl would allocate the
    // codec once per partition here (not per row). Expressed with the stub.
    df.withColumn("features", featureStub(col("payload"), dims))
  }

  /** JVM twin of [[featureStub]] for the mapPartitions decode path — must
    * produce bit-identical features (verified in MultimodalSpec). */
  private[functions] final class StubCodec(dims: Int) {
    // a real codec allocates native state here, once per PARTITION
    private val md = java.security.MessageDigest.getInstance("MD5")
    def features(payload: Array[Byte]): Seq[Double] = {
      val hex = md.digest(payload).map("%02x".format(_)).mkString
      (0 until dims).map { j =>
        val inner = md.digest(s"ft$j:$hex".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        (java.lang.Long.parseLong(inner, 16) % 1000L).toDouble / 1000.0
      }
    }
  }

  /** The REAL batched decode shape: `mapPartitions` with per-partition codec
    * allocation — one iterator pass, no per-row setup, the exact structure a
    * libjpeg/ffmpeg binding drops into (swap StubCodec for the binding; the
    * schema, encoder, and batching stay). Verified bit-identical to the
    * codegen'd [[featureStub]] expression path. */
  def decodeMapPartitions(df: DataFrame, dims: Int = 4): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val outSchema = df.schema.add("features", ArrayType(DoubleType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      val codec = new StubCodec(dims) // per-partition, like a native codec handle
      it.map(r => Row.fromSeq(r.toSeq :+ codec.features(r.getAs[Array[Byte]](payloadIdx))))
    }(enc)
  }

  /** === REAL codec: JDK ImageIO PNG ===
    * The container ships no external media libraries, but the JDK itself
    * carries PNG/JPEG codecs in `javax.imageio`. One instance per PARTITION
    * (the buffer is reused across rows; `ImageIO` cache is disabled so no
    * scratch files hit disk inside tasks) — the exact allocation shape a
    * native libjpeg/ffmpeg binding drops into. */
  private[functions] final class PngCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    ImageIO.setUseCache(false)
    private val buf = new ByteArrayOutputStream(1 << 12)

    /** Render a w×h image uniformly filled with (r,g,b); return REAL PNG bytes. */
    def encode(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
      buf.reset()
      ImageIO.write(img, "png", buf)
      buf.toByteArray
    }

    /** Decode REAL PNG bytes → (width, height, sumR, sumG, sumB). */
    def decode(png: Array[Byte]): (Int, Int, Long, Long, Long) = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          x += 1
        }
        y += 1
      }
      (img.getWidth, img.getHeight, sr, sg, sb)
    }
  }

  /** Real-bytes decode, oracle-gated: per document a deterministic RGB image
    * is rendered and PNG-ENCODED inside the partition, then immediately
    * PNG-DECODED by the same per-partition codec, and the DECODED pixel
    * facts (intrinsic dims + exact per-channel means — uniform fill and a
    * lossless codec make the integer means exact) flow out as columns. The
    * DuckDB oracle computes the same facts in closed form from doc_id, so
    * any codec disagreement (stride, channel order, truncation) fails the
    * exact-hash gate. Map-only, one codec per task — scales like any decode
    * pass over a 100 TB media corpus. */
  val multimodalDecodePng: Q = Q(
    "multimodal_decode_png",
    """SELECT doc_id,
      |  CAST(doc_id % 13 + 1 AS INT) AS img_w,
      |  CAST(doc_id % 7 + 1 AS INT) AS img_h,
      |  CAST(doc_id * 37 % 256 AS INT) AS mean_r,
      |  CAST(doc_id * 59 % 256 AS INT) AS mean_g,
      |  CAST(doc_id * 83 % 256 AS INT) AS mean_b,
      |  CAST((doc_id % 13 + 1) * (doc_id % 7 + 1) AS BIGINT) AS n_px
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("img_w", IntegerType),
      StructField("img_h", IntegerType), StructField("mean_r", IntegerType),
      StructField("mean_g", IntegerType), StructField("mean_b", IntegerType),
      StructField("n_px", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    Tables.df(s, dir, "documents").select("doc_id")
      .mapPartitions { it =>
        val codec = new PngCodec // one per partition, like a native handle
        it.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 13 + 1).toInt, (id % 7 + 1).toInt)
          val png = codec.encode(w, h,
            (id * 37 % 256).toInt, (id * 59 % 256).toInt, (id * 83 % 256).toInt)
          val (dw, dh, sr, sg, sb) = codec.decode(png)
          val n = dw.toLong * dh
          Row(id, dw, dh, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, n)
        }
      }(enc).orderBy("doc_id")
  }

  /** === STUB decode of intrinsic dimensions === deterministic (w, h) from the
    * payload hash; a real pipeline reads them from the container header. */
  private def dimCols: (Column, Column) = (
    (TextFunctions.hash64(md5(col("payload")), "w") % 1920L + 128L).cast("int"),
    (TextFunctions.hash64(md5(col("payload")), "h") % 1080L + 128L).cast("int"))
  // oracle twin: DuckDB md5 takes VARCHAR; the payload is the UTF-8 text
  // bytes, so md5(text) produces the same digest as Spark's md5(binary).
  private def dimSql(seed: String, modulo: Int): String =
    s"CAST(${TextFunctions.hash64Sql("md5(text)", seed)} % $modulo + 128 AS INT)"

  /** Resize planning: aspect-preserving fit into MAX_SIDE. The arithmetic is
    * the real operation (it is metadata math, not pixel work); only the
    * intrinsic dims are stubbed. Per-row, map-only — scales. */
  val multimodalResize: Q = {
    val MAX = 256
    Q(
      "multimodal_resize",
      s"""SELECT doc_id, w, h,
         |  CAST(CASE WHEN w >= h THEN $MAX ELSE CAST(ROUND($MAX * w * 1.0 / h, 0) AS INT) END AS INT) AS out_w,
         |  CAST(CASE WHEN w >= h THEN CAST(ROUND($MAX * h * 1.0 / w, 0) AS INT) ELSE $MAX END AS INT) AS out_h
         |FROM (SELECT doc_id, ${dimSql("w", 1920)} AS w, ${dimSql("h", 1080)} AS h FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (w, h) = dimCols
      attachPayload(Tables.df(s, dir, "documents"), "text")
        .select(col("doc_id"), w.as("w"), h.as("h"))
        .withColumn("out_w",
          when(col("w") >= col("h"), lit(MAX))
            .otherwise(round(lit(MAX) * col("w") * 1.0 / col("h"), 0).cast("int")))
        .withColumn("out_h",
          when(col("w") >= col("h"), round(lit(MAX) * col("h") * 1.0 / col("w"), 0).cast("int"))
            .otherwise(lit(MAX)))
        .orderBy("doc_id")
    }
  }

  /** Frame sampling: one media row explodes into ≤MAX_FRAMES training rows
    * with per-frame timestamps — the row-multiplying shape of video ingestion
    * (posexplode keeps it shuffle-free; downstream repartition is the
    * consumer's choice). Frame count/fps are stubbed from the payload hash;
    * the sampling arithmetic and explosion are real. */
  val multimodalFrameSample: Q = {
    val MAX_FRAMES = 8
    Q(
      "multimodal_frame_sample",
      s"""WITH media AS (
         |  SELECT doc_id,
         |    CAST(${TextFunctions.hash64Sql("md5(text)", "nf")} % 240 + 1 AS INT) AS n_frames
         |  FROM documents
         |), stepped AS (
         |  SELECT doc_id, n_frames,
         |    CAST(CEIL(n_frames * 1.0 / $MAX_FRAMES) AS INT) AS step
         |  FROM media
         |)
         |SELECT doc_id, n_frames,
         |  CAST(u.i AS INT) AS sample_idx,
         |  CAST(u.i * step AS INT) AS frame_no,
         |  CAST((u.i * step) * 1.0 / 24.0 AS DOUBLE) AS ts_sec
         |FROM stepped, (SELECT unnest(range(0, $MAX_FRAMES)) AS i) u
         |WHERE u.i * step < n_frames
         |ORDER BY doc_id, sample_idx""".stripMargin) { (s, dir) =>
      val nFrames = (TextFunctions.hash64(md5(col("payload")), "nf") % 240L + 1L).cast("int")
      attachPayload(Tables.df(s, dir, "documents"), "text")
        .select(col("doc_id"), nFrames.as("n_frames"))
        .withColumn("step", ceil(col("n_frames") * 1.0 / MAX_FRAMES).cast("int"))
        .select(col("doc_id"), col("n_frames"), col("step"),
          posexplode(sequence(lit(0), lit(MAX_FRAMES - 1))).as(Seq("sample_idx", "i")))
        .filter(col("i") * col("step") < col("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          col("sample_idx").cast("int").as("sample_idx"),
          (col("i") * col("step")).cast("int").as("frame_no"),
          ((col("i") * col("step")) * 1.0 / 24.0).as("ts_sec"))
        .orderBy("doc_id", "sample_idx")
    }
  }

  /** Feature extraction end-to-end over documents-as-media. */
  val multimodalFeatures: Q = {
    def featSql(j: Int): String =
      s"(${TextFunctions.hash64Sql(s"md5(text)", s"ft$j")} % 1000) / 1000.0"
    Q(
      "multimodal_features",
      s"""SELECT doc_id,
         |  octet_length(text::BLOB) AS n_bytes,
         |  CASE WHEN octet_length(text::BLOB) % 3 = 0 THEN 'png'
         |       WHEN octet_length(text::BLOB) % 3 = 1 THEN 'jpg'
         |       ELSE 'wav' END AS format,
         |  ${(0 until 4).map(j => s"${featSql(j)} AS f$j").mkString(",\n         |  ")}
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val withPayload = attachPayload(docs, "text")
      val decoded = decodeBatched(s, withPayload)
      val outCols = Seq(
        col("doc_id"),
        col("media_meta.n_bytes").cast("long").as("n_bytes"),
        col("media_meta.format").as("format")) ++
        (0 until 4).map(j => element_at(col("features"), j + 1).as(s"f$j"))
      decoded.select(outCols: _*).orderBy("doc_id")
    }
  }

  /** Per-partition WAV codec — REAL RIFF/WAVE encode + decode through the
    * JDK's `javax.sound.sampled` (zero external deps, like [[PngCodec]]'s
    * ImageIO). 16-bit signed little-endian mono PCM. */
  private[functions] final class WavCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    private val fmt = new AudioFormat(8000f, 16, 1, true, false)
    private val buf = new ByteArrayOutputStream(1 << 12)

    /** Pack samples as PCM and container-encode to REAL WAV bytes. */
    def encode(samples: Array[Int]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      buf.reset()
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }

    /** Decode REAL WAV bytes → (sampleRateHz, nSamples, sum, min, max). */
    def decode(wav: Array[Byte]): (Int, Long, Long, Int, Int) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
        s"unexpected decoded format: $f")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < n) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)) // hi byte carries sign
        sum += s; if (s < mn) mn = s; if (s > mx) mx = s
        i += 1
      }
      (f.getSampleRate.toInt, n.toLong, sum, mn, mx)
    }
  }

  /** Real-bytes AUDIO decode, oracle-gated — the WAV twin of
    * [[multimodalDecodePng]]: a deterministic 16-bit PCM signal is
    * WAV-ENCODED inside the partition (RIFF header, fmt chunk, PCM payload —
    * real container bytes), immediately WAV-DECODED by the same
    * per-partition codec, and the DECODED waveform facts (sample rate,
    * length, exact amplitude sum/min/max) flow out as columns. The DuckDB
    * oracle computes the same facts in closed form from doc_id, so any codec
    * disagreement (endianness, header offsets, sign extension) fails the
    * exact-hash gate. Map-only, one codec handle per task — the decode pass
    * shape of a 100 TB audio corpus. */
  val multimodalDecodeWav: Q = Q(
    "multimodal_decode_wav",
    """SELECT doc_id,
      |  CAST(8000 AS INT) AS sr,
      |  CAST(doc_id % 50 + 10 AS BIGINT) AS n_samples,
      |  CAST(list_sum([ (doc_id * 31 + k * 17) % 2001 - 1000
      |                  for k in range(0, doc_id % 50 + 10) ]) AS BIGINT) AS sum_amp,
      |  CAST(list_min([ (doc_id * 31 + k * 17) % 2001 - 1000
      |                  for k in range(0, doc_id % 50 + 10) ]) AS INT) AS min_amp,
      |  CAST(list_max([ (doc_id * 31 + k * 17) % 2001 - 1000
      |                  for k in range(0, doc_id % 50 + 10) ]) AS INT) AS max_amp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("sr", IntegerType),
      StructField("n_samples", LongType), StructField("sum_amp", LongType),
      StructField("min_amp", IntegerType), StructField("max_amp", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    Tables.df(s, dir, "documents").select("doc_id")
      .mapPartitions { it =>
        val codec = new WavCodec // one per partition, like a native handle
        it.map { r =>
          val id = r.getLong(0)
          val n = (id % 50 + 10).toInt
          val samples = Array.tabulate(n)(k => ((id * 31 + k * 17) % 2001).toInt - 1000)
          val wav = codec.encode(samples)
          val (sr, dn, sum, mn, mx) = codec.decode(wav)
          Row(id, sr, dn, sum, mn, mx)
        }
      }(enc).orderBy("doc_id")
  }

  val all: Seq[Q] =
    Seq(multimodalFeatures, multimodalResize, multimodalFrameSample, multimodalDecodePng,
      multimodalDecodeWav)
}
