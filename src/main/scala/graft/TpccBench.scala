package graft

import org.apache.spark.sql.SparkSession

/** TPC-C throughput runner — the OLTP counterpart of [[Bench]] (reference:
  * src/benchmark/tpcc_benchmark.cpp runs the 5-procedure mix and reports
  * throughput; src/benchmarklib/tpcc/tpcc_benchmark_item_runner.cpp:35-60
  * draws procedures with the spec's 45/43/4/4/4 weights). Prints ONE JSON
  * line with committed-transactions/sec.
  *
  * Each client runs its own [[Catalog]]+[[Pipeline]] over per-client working
  * tables (the TPC-C warehouse axis — clients are home-warehouse-disjoint by
  * construction, like the spec's 85%+ home-warehouse traffic), sharing one
  * SparkSession. The mix is the spec's ratio at small scale: per 25-txn
  * block, 11 NewOrder, 11 Payment, 1 OrderStatus, 1 Delivery, 1 StockLevel.
  *
  * Because every committed write swaps an immutable DataFrame binding, plan
  * lineage deepens with each transaction; the runner compacts each working
  * table with `localCheckpoint` every [[CompactEvery]] blocks — the Spark
  * counterpart of the reference's MVCC cleanup (reference:
  * src/lib/concurrency/commit_context.hpp + chunk compression jobs), and the
  * knob a long-running OLTP deployment of this engine would tune.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_TPCC_TXNS
  * (mix transactions per client, default 25), SPARK_GRAFT_TPCC_CLIENTS
  * (default 1). */
object TpccBench {
  private val CompactEvery = 10 // committed txns between lineage compactions

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val nTxns = sys.env.getOrElse("SPARK_GRAFT_TPCC_TXNS", "25").toInt
    val nClients = sys.env.getOrElse("SPARK_GRAFT_TPCC_CLIENTS", "1").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("graft-tpcc")
        .config("spark.scheduler.mode", if (nClients > 1) "FAIR" else "FIFO"),
      shufflePartitions = 8) // point reads/writes: wide shuffles never help here
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic 25-txn mix block at the spec's 45/43/4/4/4 weights
    val block: Seq[String] =
      Seq.fill(11)("new_order") ++ Seq.fill(11)("payment") ++
        Seq("order_status", "delivery", "stock_level")

    def runClient(c: Int): (Long, Long) = {
      val cat = new Catalog(spark)
      cat.register(s"src_ord_$c", Tables.df(spark, sfDir, "orders"))
      cat.register(s"src_cust_$c", Tables.df(spark, sfDir, "customer"))
      val p = new Pipeline(cat)
      def ok(sql: String) = p.sql(sql)
      ok(s"CREATE TABLE ord_$c AS SELECT o_orderkey, o_custkey, o_orderstatus FROM src_ord_$c WHERE o_custkey < 200")
      ok(s"CREATE TABLE cust_$c AS SELECT c_custkey, c_acctbal FROM src_cust_$c WHERE c_custkey < 200")
      ok(s"CREATE TABLE hist_$c AS SELECT CAST(0 AS BIGINT) AS h_custkey, CAST(0.0 AS DOUBLE) AS h_amount WHERE false")
      var committed = 0L
      var sinceCompact = 0L
      var i = 0
      while (committed < nTxns) {
        val proc = block(i % block.size); i += 1
        val k = 7 + (i * 13) % 190 // deterministic "random" customer
        proc match {
          case "new_order" =>
            ok("BEGIN")
            ok(s"INSERT INTO ord_$c SELECT MAX(o_orderkey) + 1, $k, 'O' FROM ord_$c")
            // read-your-writes: the line rows key on the STAGED max orderkey
            ok(s"INSERT INTO hist_$c SELECT MAX(o_orderkey), 61.0 FROM ord_$c")
            ok("COMMIT")
            committed += 1
          case "payment" =>
            ok("BEGIN")
            ok(s"UPDATE cust_$c SET c_acctbal = c_acctbal - 15.0 WHERE c_custkey = $k")
            ok(s"INSERT INTO hist_$c VALUES ($k, 15.0)")
            ok("COMMIT")
            committed += 1
          case "order_status" =>
            ok(s"SELECT MAX(o_orderkey) AS latest FROM ord_$c WHERE o_custkey = $k").collect()
            committed += 1
          case "delivery" =>
            ok("BEGIN")
            var d = 0
            while (d < 3) { // 3 districts of the 10-district loop (bench-scaled)
              val m = ok(s"SELECT MIN(o_orderkey) AS m FROM ord_$c WHERE o_orderstatus = 'O' AND o_custkey % 10 = $d").collect()(0)
              if (!m.isNullAt(0)) {
                val oid = m.getLong(0)
                ok(s"UPDATE ord_$c SET o_orderstatus = 'F' WHERE o_orderkey = $oid")
                val ck = ok(s"SELECT o_custkey FROM ord_$c WHERE o_orderkey = $oid").collect()(0).getLong(0)
                ok(s"UPDATE cust_$c SET c_acctbal = c_acctbal + 10.0 WHERE c_custkey = $ck")
              }
              d += 1
            }
            ok("COMMIT")
            committed += 1
          case "stock_level" =>
            ok(s"SELECT COUNT(DISTINCT o_custkey) AS n FROM ord_$c WHERE o_orderstatus = 'O' AND o_custkey % 10 < 2").collect()
            committed += 1
        }
        sinceCompact += 1
        if (sinceCompact >= CompactEvery) {
          sinceCompact = 0
          Seq(s"ord_$c", s"cust_$c", s"hist_$c").foreach { n =>
            cat.register(n, cat.table(n).localCheckpoint())
          }
        }
      }
      (committed, i.toLong)
    }

    // one untimed warmup client exercises JIT + parquet footers
    runClient(99)

    val t0 = System.nanoTime()
    val results =
      if (nClients == 1) Seq(runClient(0))
      else {
        import java.util.concurrent.Executors
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        val pool = Executors.newFixedThreadPool(nClients)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        val fs = (0 until nClients).map(c => Future(runClient(c)))
        val rs = fs.map(Await.result(_, Duration.Inf))
        pool.shutdown()
        rs
      }
    val wall = (System.nanoTime() - t0) / 1e9
    val total = results.map(_._1).sum
    println(s"""{"metric":"tpcc_tx_per_sec","value":${total / wall},"unit":"tx/sec","committed":$total,"wall_sec":$wall,"clients":$nClients,"txns_per_client":$nTxns,"sf":"$sfDir"}""")
    spark.stop()
  }
}
