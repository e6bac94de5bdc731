package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** QUARANTINE: deterministic stand-ins for media codecs the container
  * genuinely lacks (JPEG-XL, ffmpeg audio/video). Nothing here is part of the
  * gated query surface — the REAL, oracle-gated codecs live in [[Multimodal]]
  * (JDK ImageIO PNG/JPEG/GIF, WAV PCM). This object exists only so the
  * mapPartitions decode SHAPE — binary payload column, metadata struct,
  * per-partition codec allocation, batch iteration, feature schema — stays
  * exercisable and bit-exact-testable for formats with no in-container codec;
  * swap [[StubCodec]] for a native binding and the schema/batching stand.
  *
  * No reference counterpart (hyrise's five types have no BINARY,
  * reference: src/lib/all_type_variant.hpp:34-39).
  */
object CodecStubs {

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
    * per batch — see [[Multimodal]] for the real PNG/JPEG/GIF/WAV paths. This
    * stub derives a deterministic 4-dim "feature vector" from the payload's
    * md5 so the plumbing (schema, batching, downstream joins) is fully
    * exercisable without codecs. */
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

  /** The batched decode shape with per-partition codec allocation — one
    * iterator pass, no per-row setup, the exact structure a libjpeg/ffmpeg
    * binding drops into (swap StubCodec for the binding; the schema, encoder,
    * and batching stay). Verified bit-identical to the codegen'd
    * [[featureStub]] expression path. */
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
}
