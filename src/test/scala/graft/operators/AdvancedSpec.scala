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

  test("GROUPS frame rewrite matches hand-computed SQL:2011 GROUPS semantics") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one partition, peer groups on v: {1,1}, {2}, {5}. GROUPS BETWEEN
    // 1 PRECEDING AND 1 FOLLOWING sums the current, previous and next PEER
    // GROUP (not rows): v=1 -> groups{1,2}=60; v=2 -> all=100; v=5 -> {2,3}=70
    val df = Seq((1L, 1, 10.0), (2L, 1, 20.0), (3L, 2, 30.0), (4L, 5, 40.0))
      .toDF("id", "v", "x")
    val peers = Window.orderBy("v")
    val groups = Window.orderBy("g").rangeBetween(-1, 1)
    val got = df.withColumn("g", dense_rank().over(peers))
      .withColumn("s", sum("x").over(groups))
      .orderBy("id").select("id", "s")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 60.0, 2L -> 60.0, 3L -> 100.0, 4L -> 70.0),
      "dense_rank+RANGE must reproduce GROUPS frame semantics exactly")
  }

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
