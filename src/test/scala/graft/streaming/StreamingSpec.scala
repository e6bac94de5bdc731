package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming over events: windowed aggregation must agree with the
  * equivalent batch plan, and keyed state must see every row. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("streamed hourly counts == batch hourly counts") {
    val stream = EventStreams.source(spark, sf)
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.hourlyCounts(stream), "hourly_out")
      .select("window_start", "event_type", "n")

    val batch = Tables.df(spark, sf, "events")
      .withColumn("event_ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("event_ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream and batch window aggregations must produce identical rows")
  }

  test("streaming dedup == batch distinct on the key") {
    val stream = EventStreams.source(spark, sf)
    val deduped = EventStreams.runToMemory(
      spark, EventStreams.dedupedEvents(stream), "dedup_out", OutputMode.Append())
    val streamCount = deduped.select("event_id").distinct().count()
    val batchCount = Tables.df(spark, sf, "events").select("event_id").distinct().count()
    assert(deduped.count() == streamCount, "no duplicate key may survive")
    assert(streamCount == batchCount, "dedup must keep exactly one row per key")
  }

  test("streaming curation == batch curation (same expressions, same rows)") {
    val streamed = EventStreams.runToMemory(
      spark, DocStreams.curated(DocStreams.source(spark, sf)), "curated_out",
      OutputMode.Append())
    val batch = Tables.df(spark, sf, "documents").select(
      col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
      graft.functions.CurationQueries.keepReason(col("text")).as("reason"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream and batch curation must produce identical rows")
  }

  test("streaming fingerprint dedup keeps one row per normalized text") {
    val deduped = EventStreams.runToMemory(
      spark, DocStreams.dedupedByFingerprint(DocStreams.source(spark, sf)),
      "doc_dedup_out", OutputMode.Append())
    val batchFps = Tables.df(spark, sf, "documents")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(deduped.count() == batchFps, "one survivor per distinct fingerprint")
  }

  test("bounded-state dedup (dropDuplicatesWithinWatermark) == batch distinct") {
    val deduped = EventStreams.runToMemory(
      spark, DocStreams.dedupedByFingerprintBounded(DocStreams.source(spark, sf)),
      "doc_dedup_bounded_out", OutputMode.Append())
    val batchFps = Tables.df(spark, sf, "documents")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct().count()
    assert(deduped.count() == batchFps,
      "horizon exceeds the fixture's time spread, so bounded == exact dedup")
    assert(deduped.select("fp").distinct().count() == deduped.count(),
      "no duplicate fingerprint may survive")
  }

  test("foreachBatch landing sink: every curated document reaches the catalog") {
    val cat = new graft.Catalog(spark)
    val q = DocStreams.landToCatalog(DocStreams.source(spark, sf), cat, "landed_docs")
    try q.processAllAvailable() finally q.stop()
    val landed = cat.table("landed_docs")
    val nDocs = Tables.df(spark, sf, "documents").count()
    assert(landed.count() == nDocs, "all documents must land")
    assert(landed.select("doc_id").distinct().count() == nDocs, "no duplicates")
    // and the landed decisions equal the batch decisions
    val batchReasons = Tables.df(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.CurationQueries.keepReason(col("text")).as("reason"))
    assert(landed.select("doc_id", "reason").exceptAll(batchReasons).isEmpty)
  }

  test("stream-static near-dup screen finds exactly the batch LSH pairs") {
    val corpus = Tables.df(spark, sf, "documents")
    val screened = EventStreams.runToMemory(
      spark, DocStreams.nearDupScreen(DocStreams.source(spark, sf), corpus),
      "screen_out", OutputMode.Append())
      .select("doc_id", "corpus_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the stream replays the same corpus, so the screen must flag the batch
    // LSH candidate pairs in both directions and nothing else
    val batchPairs = graft.functions.DedupQueries.dedupMinhashLsh.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val symmetric = batchPairs ++ batchPairs.map(_.swap)
    assert(screened == symmetric,
      s"screen flagged ${screened.size} pairs, batch has ${symmetric.size}")
  }

  test("streaming funnel state folds to the batch funnel counts") {
    val states = EventStreams.runToMemory(
      spark, EventStreams.userFunnel(spark, EventStreams.source(spark, sf)),
      "funnel_out", OutputMode.Append())
    // keep each user's LAST emitted state (one per micro-batch per user)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("userId")
    // the final state has the most stages set and the smallest minima
    val nn = Seq("tView", "tClick", "tBuy")
      .map(c => when(col(c).isNotNull, 1).otherwise(0)).reduce(_ + _)
    val latest = states
      .withColumn("rn", row_number().over(w.orderBy(nn.desc,
        coalesce(col("tView"), lit(Long.MaxValue)).asc,
        coalesce(col("tClick"), lit(Long.MaxValue)).asc,
        coalesce(col("tBuy"), lit(Long.MaxValue)).asc)))
      .filter(col("rn") === 1)
    val folded = latest.agg(
      count(when(col("tView").isNotNull, 1)).as("n_view"),
      count(when(col("tClick") > col("tView"), 1)).as("n_view_click"),
      count(when(col("tClick") > col("tView") && col("tBuy") > col("tClick"), 1))
        .as("n_full")).collect().head
    val batch = graft.operators.EventsQueries.eventsFunnel.run(spark, sf).collect().head
    assert((folded.getLong(0), folded.getLong(1), folded.getLong(2)) ==
      (batch.getLong(0), batch.getLong(1), batch.getLong(2)),
      s"stream-folded funnel $folded != batch $batch")
  }

  test("streaming CEP pattern flags fold to the batch events_pattern_match") {
    val out = EventStreams.runToMemory(
      spark, EventStreams.patternFlags(spark, EventStreams.source(spark, sf)),
      "pattern_out", OutputMode.Append())
    // flags are monotone across micro-batches: max() recovers the final state
    val folded = out.groupBy("userId")
      .agg(max("convNoError").as("conv"), max("doubleError").as("dbl"))
      .filter(col("userId") < 50)
    val batch = graft.operators.EventsQueries.eventsPatternMatch.run(spark, sf)
      .select(col("user_id").as("userId"), col("conv_no_error").as("b_conv"),
        col("double_error").as("b_dbl"))
    val joined = folded.join(batch, "userId")
    assert(joined.count() === batch.count(), "every batch user emitted by the stream")
    val mismatches = joined
      .filter(col("conv") =!= col("b_conv") || col("dbl") =!= col("b_dbl")).count()
    assert(mismatches === 0, "stream DFA == batch regex on every user")
  }

  test("stream-stream interval join == batch interval join") {
    val streamed = EventStreams.runToMemory(
      spark, EventStreams.clickViewJoin(EventStreams.source(spark, sf)),
      "cv_join_out", OutputMode.Append())
    val ev = Tables.df(spark, sf, "events")
      .withColumn("event_ts", expr("timestamp_micros(ts DIV 1000)"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_ts").as("view_ts"),
        col("event_id").as("view_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = clicks.join(views,
      expr("c_user = v_user AND click_ts >= view_ts AND click_ts <= view_ts + INTERVAL 10 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"))
    assert(streamed.count() == batch.count(), "stream and batch joins must agree on cardinality")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "stream and batch interval joins must produce identical pairs")
  }

  test("keyed session state sees every event exactly once") {
    val stream = EventStreams.source(spark, sf)
    val sessions = EventStreams.runToMemory(
      spark, EventStreams.userSessions(spark, stream), "sessions_out",
      OutputMode.Append())
    val totalEvents = sessions.agg(sum("nEvents")).collect().head.getLong(0)
    assert(totalEvents == Tables.df(spark, sf, "events").count())
    val users = sessions.select("userId").distinct().count()
    assert(users == Tables.df(spark, sf, "events").select("user_id").distinct().count())
  }

  test("streaming IVM: per-micro-batch view maintenance converges to the batch aggregate") {
    val docs = Tables.df(spark, sf, "documents")
    val cat = new graft.Catalog(spark)
    // seed the base with a slice, define the rollup view over it, then stream
    // the complement in ~6 micro-batches through the catalog's INSERT path —
    // each batch is one O(delta) summary-delta merge, never a base rescan
    val seed = docs.filter(col("doc_id") % 10 === 0).localCheckpoint(true)
    cat.register("docs_live", seed)
    cat.createMatView("mv_docs_by_source",
      "SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars " +
        "FROM docs_live GROUP BY source")
    val rest = docs.filter(col("doc_id") % 10 =!= 0)
    val q = DocStreams.maintainViews(
      DocStreams.sourceChunked(spark, rest, nFiles = 6), cat, "docs_live")
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "maintenance must have run over MULTIPLE non-empty micro-batches")
    // the stream-maintained view equals the one-shot batch aggregate
    val expected = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    val got = cat.table("mv_docs_by_source")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "stream-maintained view must equal the batch aggregate over all rows")
    // and the base saw every row exactly once
    assert(cat.table("docs_live").count() == docs.count())
  }
}
