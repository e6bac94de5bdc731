package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * The reference engine (hyrise) schedules work on NUMA-aware task queues with one
  * worker per core (reference: src/lib/scheduler/node_queue_scheduler.hpp:76-93); our
  * counterpart is Spark's DAG scheduler, so "tuning" here means Catalyst/AQE knobs,
  * not a scheduler. All settings are chosen for the 1000-executor / 100 TB design
  * point and merely *also* work on local[32]:
  *
  *  - AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  *    replaces the reference's static per-chunk job sizing.
  *  - CBO + join reorder replaces the reference's DPccp/greedy join ordering
  *    (reference: src/lib/optimizer/strategy/join_ordering_rule.cpp:59-71).
  *  - Runtime bloom-filter joins replace the reference's semi-join reduction rule
  *    (reference: src/lib/optimizer/strategy/semi_join_reduction_rule.cpp) and the
  *    bloom filter inside its hash join (reference: src/lib/operators/join_hash_steps.hpp).
  *  - Dynamic partition pruning replaces GetTable's dynamic chunk pruning
  *    (reference: src/lib/operators/get_table.hpp:30-36).
  */
object GraftSession {

  /** Conf shared by every entry point (Verify, Bench, tests, user sessions). */
  def tuned(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = tuned(SparkSession.builder().master(master).appName("graft"), shufflePartitions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
