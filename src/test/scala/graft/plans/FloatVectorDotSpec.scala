package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the native dot-product kernel against the portable
  * `aggregate(zip_with(...))` formulation it replaced (semantics must be
  * identical so oracle hashes keep matching) and its null/edge contract. */
class FloatVectorDotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def referenceDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("matches aggregate/zip_with bit-for-bit on real embeddings") {
    val e = graft.Tables.df(spark, SparkTestBase.sf, "embeddings").limit(200)
    val both = e.select(
      call_function("graft_vec_dot", col("embedding"), col("embedding")).as("native"),
      referenceDot(col("embedding"), col("embedding")).as("portable"))
    val bad = both.filter(not(col("native") <=> col("portable"))).count()
    assert(bad === 0)
  }

  test("null element, null array, length mismatch → NULL; plain arrays → value") {
    val df = Seq(
      (1, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),   // 11.0
      (2, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),  // null elem
      (3, null, Seq[java.lang.Double](3.0, 4.0)),                              // null array
      (4, Seq[java.lang.Double](1.0), Seq[java.lang.Double](3.0, 4.0))         // len mismatch
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), call_function("graft_vec_dot", col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out(0) === Row(1, 11.0))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1) && out(3).isNullAt(1))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -1.0f, 2.0f))).toDF("a", "b")
    def run(codegen: String): Double = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try df.select(call_function("graft_vec_dot", col("a"), col("b"))).head().getDouble(0)
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(run("CODEGEN_ONLY") === run("NO_CODEGEN"))
    assert(run("CODEGEN_ONLY") === (1.0 * 0.5 - 2.0 + 6.0))
  }

  test("rejects non-array input at analysis time") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] {
      df.select(call_function("graft_vec_dot", col("a"), col("b"))).head()
    }
  }
}
