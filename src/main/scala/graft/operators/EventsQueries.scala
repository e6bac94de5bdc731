package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch analytics over the `events` stream-shaped table. The reference has no
  * streaming/time-series module (SURVEY §2.11) — these are beyond-parity, and the
  * same plans re-run under Structured Streaming in graft.streaming.
  *
  * Timestamp convention: events.ts is parquet TIMESTAMP(NANOS), which Spark reads
  * as a nanosecond-epoch long (Tables.df sets nanosAsLong) and DuckDB truncates to
  * microseconds. All time math therefore happens on integer epochs:
  * Spark `ts DIV 1000` == DuckDB `epoch_us(ts)`.
  */
object EventsQueries {
  import Det._

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.df(s, dir, "events")

  /** Hash aggregation by event type with exact decimal value sums. */
  val eventsByType: Q = Q(
    "events_by_type",
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    ev(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        asDouble(sum(dec(col("value")))).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  /** Tumbling-window (hourly) counts — the batch shape of a streaming windowed
    * aggregation; buckets are integer epoch-hours so both engines agree exactly. */
  val eventsHourly: Q = Q(
    "events_hourly",
    """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
      |  event_type, COUNT(*) AS n
      |FROM events
      |GROUP BY hour_bucket, event_type
      |HAVING COUNT(*) > 5
      |ORDER BY hour_bucket, event_type""".stripMargin) { (s, dir) =>
    ev(s, dir)
      .withColumn("hour_bucket", expr("(ts DIV 1000) DIV 3600000000"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 5)
      .orderBy("hour_bucket", "event_type")
  }

  /** Per-user event sequencing via window function over event time (the batch
    * equivalent of a keyed stateful stream). */
  val eventsUserSeq: Q = Q(
    "events_user_seq",
    """SELECT user_id, event_id, seq FROM (
      |  SELECT user_id, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS seq
      |  FROM events)
      |WHERE user_id < 20 AND seq <= 3
      |ORDER BY user_id, seq""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(expr("ts DIV 1000"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), row_number().over(w).as("seq"))
      .filter(col("user_id") < 20 && col("seq") <= 3)
      .orderBy("user_id", "seq")
  }

  val all: Seq[Q] = Seq(eventsByType, eventsHourly, eventsUserSeq)
}
