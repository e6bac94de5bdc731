package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata +
  * batched feature extraction — the schema/partitioning shape a 100 TB
  * image/audio corpus needs. The container has no image/audio codecs, so the
  * DECODE STEP IS A DETERMINISTIC STUB (clearly marked below); everything
  * around it — binary columns, metadata struct, batch iteration, feature
  * schema — is real and tested.
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

  val all: Seq[Q] = Seq(multimodalFeatures)
}
