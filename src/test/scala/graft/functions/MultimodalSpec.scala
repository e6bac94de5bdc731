package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: the mapPartitions decode path (per-partition codec
  * allocation) must be bit-identical to the codegen'd expression stub, and
  * frame sampling must respect its bounds. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("mapPartitions decode == expression decode, bit for bit") {
    val docs = Multimodal.attachPayload(
      Tables.df(spark, SparkTestBase.sf, "documents").limit(100), "text")
    val viaExpr = Multimodal.decodeBatched(spark, docs)
      .select(col("doc_id"), col("features"))
    val viaPartitions = Multimodal.decodeMapPartitions(docs)
      .select(col("doc_id"), col("features"))
    assert(viaExpr.join(viaPartitions, Seq("doc_id", "features"), "left_anti").count() === 0)
    assert(viaPartitions.count() === 100)
  }

  test("frame sampling stays within bounds and starts at frame 0") {
    val df = Multimodal.multimodalFrameSample.run(spark, SparkTestBase.sf)
    val bad = df.filter(col("frame_no") >= col("n_frames") || col("sample_idx") >= 8).count()
    assert(bad === 0)
    val firstSamples = df.filter(col("sample_idx") === 0)
    assert(firstSamples.filter(col("frame_no") =!= 0).count() === 0)
    // every document yields at least one frame
    assert(firstSamples.count() === Tables.df(spark, SparkTestBase.sf, "documents").count())
  }

  test("resize output fits max side and preserves aspect ordering") {
    val df = Multimodal.multimodalResize.run(spark, SparkTestBase.sf)
    assert(df.filter(col("out_w") > 256 || col("out_h") > 256).count() === 0)
    assert(df.filter((col("w") >= col("h")) =!= (col("out_w") >= col("out_h"))).count() === 0)
  }
}
