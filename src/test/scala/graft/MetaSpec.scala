package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-table surface: footer-derived storage facts match ground truth, and
  * the session/exec/log tables answer through Pipeline.sql. */
class MetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def freshPipe(): Pipeline = {
    val cat = new Catalog(spark)
    Seq("region", "nation", "orders").foreach(t => cat.registerParquet(t, s"$sf/$t.parquet"))
    new Pipeline(cat)
  }

  test("meta_chunks row counts sum to table counts") {
    val p = freshPipe()
    val chunkSum = p.sql(
      "SELECT table_name, SUM(row_count) AS n FROM meta_chunks GROUP BY table_name")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(chunkSum("orders") == Tables.df(spark, sf, "orders").count())
    assert(chunkSum("nation") == Tables.df(spark, sf, "nation").count())
  }

  test("meta_segments footer min/max match data min/max") {
    val p = freshPipe()
    val seg = p.sql(
      """SELECT MIN(CAST(min_value AS BIGINT)), MAX(CAST(max_value AS BIGINT))
        |FROM meta_segments WHERE table_name='orders' AND column_name='o_orderkey'""".stripMargin)
      .collect().head
    val data = Tables.df(spark, sf, "orders")
      .selectExpr("MIN(o_orderkey)", "MAX(o_orderkey)").collect().head
    assert(seg.getLong(0) == data.getLong(0) && seg.getLong(1) == data.getLong(1))
  }

  test("meta_segments null_count is exact for a nullable-free key") {
    val p = freshPipe()
    val nulls = p.sql(
      """SELECT SUM(null_count) FROM meta_segments
        |WHERE table_name='orders' AND column_name='o_orderkey'""".stripMargin)
      .collect().head.getLong(0)
    assert(nulls == 0)
  }

  test("meta_segments_accurate distinct counts are exact (scan), unlike meta_segments") {
    val p = freshPipe()
    val acc = p.sql(
      """SELECT column_name, distinct_value_count FROM meta_segments_accurate
        |WHERE table_name='nation'""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nation = Tables.df(spark, sf, "nation")
    val truth = nation.columns.map(c =>
      c -> nation.select(c).distinct().count()).toMap
    assert(acc == truth, s"accurate=$acc truth=$truth")
    // schema parity with the reference's segments_accurate columns
    val cols = p.sql("SELECT * FROM meta_segments_accurate LIMIT 1").columns.toSeq
    assert(cols.containsSlice(Seq("table_name", "chunk_id", "column_id", "column_name",
      "column_data_type", "distinct_value_count")))
  }

  test("meta_settings, meta_system_*, meta_plugins, meta_chunk_sort_orders answer") {
    val p = freshPipe()
    assert(p.sql("SELECT value FROM meta_settings WHERE name='spark.sql.session.timeZone'")
      .collect().head.getString(0) == "UTC")
    assert(p.sql("SELECT cpu_count FROM meta_system_information").collect().head.getInt(0) > 0)
    assert(p.sql("SELECT * FROM meta_system_utilization").count() == 1)
    assert(p.sql("SELECT * FROM meta_plugins").count() == 0)
    assert(p.sql("SELECT * FROM meta_chunk_sort_orders").count() == 0)
  }

  test("UPDATE meta_settings rewrites the session conf (ChangeMetaTable)") {
    val p = freshPipe()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      p.sql("UPDATE meta_settings SET value = '1048576' " +
        "WHERE name = 'spark.sql.autoBroadcastJoinThreshold'")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "1048576")
      val visible = p.sql("SELECT value FROM meta_settings " +
        "WHERE name = 'spark.sql.autoBroadcastJoinThreshold'").collect().head.getString(0)
      assert(visible == "1048576")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plugin loading via meta_plugins is rejected with a documented reason") {
    val p = freshPipe()
    val r = p.run("INSERT INTO meta_plugins VALUES ('libFoo.so')")
    assert(r.head.status != p.Ok)
  }

  test("meta_exec logs statements in order with status; meta_log records catalog events") {
    val p = freshPipe()
    p.run("SELECT COUNT(*) FROM region; SELECT * FROM no_such_table")
    val log = p.sql("SELECT seq, status FROM meta_exec ORDER BY seq").collect()
    assert(log.map(_.getString(1)).toSeq == Seq("Success", "Failed"))
    val events = p.sql("SELECT message FROM meta_log").collect().map(_.getString(0))
    assert(events.exists(_.contains("register table region")))
  }
}
