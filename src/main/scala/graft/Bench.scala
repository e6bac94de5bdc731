package graft

import org.apache.spark.sql.SparkSession

/** Benchmark runner (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Mirrors the reference's
  * benchmark runner shape — named items, per-item runtimes and items/s, JSON
  * report, ordered and shuffled execution modes (reference:
  * src/benchmarklib/benchmark_runner.hpp:37-46,71-80 and the mode flags in
  * src/benchmarklib/cli_config_parser.cpp:54-68).
  *
  * Env knobs (all optional):
  *  - SPARK_GRAFT_SF_DIR   dataset dir (default sf0.1)
  *  - SPARK_GRAFT_CPUS     local[] threads = shuffle partitions (default 32)
  *  - SPARK_GRAFT_BENCH_MODE  "ordered" (default) | "shuffled" — shuffled
  *    permutes query order per round with a fixed seed, the reference's
  *    shuffled mode that defeats cross-query cache ordering effects
  *  - SPARK_GRAFT_BENCH_RUNS  timed runs per query (default 2, best-of)
  *  - SPARK_GRAFT_BENCH_CLIENTS  concurrent query streams (default 1) — the
  *    reference's --clients multi-stream mode (cli_config_parser.cpp:54-68):
  *    N threads each run the full headline set (per-client shuffled order)
  *    against the shared session; reported as aggregate queries/sec. Spark's
  *    FAIR scheduler pool shares the cluster between streams the way the
  *    reference's scheduler shares its workers between clients.
  *
  * Each query gets one untimed warmup (JIT + parquet footer cache, like the
  * reference's --warmup); the reported time is the best of the timed runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "ordered")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val nClients = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLIENTS", "1").toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench")
        // FAIR round-robins stage slots between concurrent client streams
        // (default FIFO would serialize the multi-stream phase head-of-line)
        .config("spark.scheduler.mode", if (nClients > 1) "FAIR" else "FIFO"),
      shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // SPARK_GRAFT_BENCH_GC=1|0: per-item hygiene OUTSIDE the timed window.
    // Spark's ContextCleaner only deletes finished queries' shuffle files and
    // broadcasts when their references get collected — on a large heap GC may
    // not run for the whole suite, so a long sequence ACCUMULATES every
    // item's shuffle scratch on disk (the 1000×-corpus ENOSPC) and its
    // old-gen debt in the heap (SF100 shuffled: q18 240 s mid-suite vs
    // 91.9 s ordered on IDENTICAL plans — the r12 verdict's 2.6×
    // degradation). Two GC passes with a short gap let the first collection
    // enqueue reference-tracked cleanups and the ContextCleaner drain them
    // before the second pass returns the heap. Default ON for shuffled mode
    // (that is where adjacency stacks the heavy items); default OFF for
    // ordered so official numbers stay comparable with prior rounds.
    val gcEachItem = sys.env.get("SPARK_GRAFT_BENCH_GC")
      .map(_ == "1").getOrElse(mode == "shuffled")
    def hygiene(): Unit = {
      System.gc()
      Thread.sleep(200) // let ContextCleaner process the reference queue
      System.gc()
      // r14: drain WRITEBACK outside the timed window too. A heavy item's
      // shuffle scratch sits as dirty page cache (vm.dirty_ratio on a big-RAM
      // box admits tens of GB) and the kernel flushes it lazily DURING the
      // next item's timed run — measured: q12 in-suite 50.6 s vs 17.3 s solo
      // with GC hygiene alone (vmstat: zero reads, 170 MB/s writeback bursts
      // at 90 % kernel CPU inside the neighbor's window). The 300 ms gap
      // first lets ContextCleaner finish DELETING the previous item's files
      // (deleted-before-flush dirty pages are simply dropped), then sync
      // flushes whatever legitimately remains.
      Thread.sleep(300)
      try new ProcessBuilder("sync").start().waitFor()
      catch { case _: Throwable => () }
    }
    val queries = SparkEntry.queries
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (gcEachItem) hygiene()
      dt
    }

    // SPARK_GRAFT_BENCH_NAMES: comma-separated item override — the
    // reference CLI's item filter (cli_config_parser.cpp lets a run pick
    // single benchmark items); default = the headline set.
    val names = sys.env.get("SPARK_GRAFT_BENCH_NAMES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.benchNames)
    // warmup pass, in declared order (SPARK_GRAFT_BENCH_WARMUP=0 skips it —
    // for single-shot evidence runs of heavy items where a warmup execution
    // would double the run's cost without changing the reported best-of)
    if (!sys.env.get("SPARK_GRAFT_BENCH_WARMUP").contains("0"))
      names.foreach(n => try once(n) catch { case _: Throwable => () })

    // timed rounds; shuffled mode permutes each round deterministically
    val rng = new scala.util.Random(42)
    val times = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to nRuns).foreach { _ =>
      val order = if (mode == "shuffled") rng.shuffle(names) else names
      order.foreach { n =>
        val t = try once(n) catch { case _: Throwable => -1.0 }
        times(n) = t :: times(n)
      }
    }

    val results = names.map { n =>
      val ok = times(n).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ips = results.map { case (k, v) =>
      "\"" + k + "\":" + (if (v > 0) 1.0 / v else 0.0)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // multi-stream phase: N clients run the whole set concurrently; the
    // metric is aggregate throughput, not per-query latency
    val multi = if (nClients <= 1) "" else {
      val t0 = System.nanoTime()
      val threads = (0 until nClients).map { c =>
        val th = new Thread(() => {
          val order = new scala.util.Random(c).shuffle(names)
          order.foreach(n => try once(n) catch { case _: Throwable => () })
        }, s"bench-client-$c")
        th.start(); th
      }
      threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val qps = nClients * names.size / wall
      s""","clients":$nClients,"multi_stream_wall_sec":$wall,"multi_stream_queries_per_sec":$qps"""
    }
    // like-for-like subtotal vs the round-1 BASELINE.md number (7.27 s):
    // the full-set total grows every round as more queries are benched, so
    // cross-round comparison uses the fixed 11-query subset
    val base11 = results.collect {
      case (n, v) if v >= 0 && SparkEntry.baseline11.contains(n) => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","baseline11_sec":$base11,"queries":$qs,"items_per_sec":$ips,"mode":"$mode","runs":$nRuns,"sf":"$sfDir"$multi}""")
    spark.stop()
  }
}
