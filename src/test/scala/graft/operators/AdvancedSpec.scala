package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the approximate sketches (no SQL oracle — sketch
  * internals are engine-specific; correctness here means bounded error vs the
  * exact aggregates). */
class AdvancedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("approx sketches stay within error bounds of the exact answers") {
    val approx = AdvancedQueries.aggApproxSketches.run(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.df(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("nd"),
        expr("percentile(l_extendedprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (nd, med)) =>
      val (ndA, medA) = approx(flag)
      assert(math.abs(ndA - nd).toDouble / nd <= 0.05,
        s"$flag: HLL distinct $ndA vs exact $nd exceeds 5%")
      // GK sketch with accuracy 10000 on ~2k values per group is near-exact;
      // allow 1% of the exact median
      assert(math.abs(medA - med) / med <= 0.01,
        s"$flag: approx median $medA vs exact $med exceeds 1%")
    }
  }
}
