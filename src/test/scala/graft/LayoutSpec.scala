package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout scale patterns: bucketed tables must join with no shuffle
  * exchange; salted joins must be answer-identical to plain joins while
  * spreading a hot key across salt partitions. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("same-bucket tables join with zero shuffle on either side") {
    val l = Tables.df(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.df(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(l, "b_lineitem", 8, "l_orderkey")
    Layout.writeBucketed(o, "b_orders", 8, "o_orderkey")
    try {
      // bucketed joins need the SMJ path: disable broadcast for this probe
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucket co-location must eliminate both shuffles:\n$plan")
      assert(joined.count() === l.count(), "inner join on FK: every line matches its order")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("salted join equals the plain join and spreads the hot key") {
    val l = Tables.df(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.df(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
    val salted = Layout.saltedEquiJoin(l, o, "l_orderkey", "o_orderkey", factor = 4)
    assert(salted.count() === plain.count())
    assert(salted.join(plain, plain.columns.toSeq, "left_anti").count() === 0)
    // the salt actually spreads rows of one key across partitions-by-salt
    val spread = l.withColumn("__salt",
      pmod(xxhash64(struct(l.columns.map(col).toIndexedSeq: _*)), lit(4)))
      .groupBy("__salt").count().count()
    assert(spread === 4, "deterministic salt must populate every bucket")
  }
}
