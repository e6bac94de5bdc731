package graft.functions

import graft.Q

/** Oracle-gated probe-path queries over the persisted ANN indexes
  * ([[AnnIndex]]): each builds the index on first touch (`ensure`) and then
  * answers probe-only. Training is deterministic and the build stages are the
  * same code the inline queries run, so every probe result is row-identical
  * to its inline twin — each entry REUSES that twin's DuckDB oracle (which
  * recomputes the training in SQL), making "the stored index answers exactly
  * what retraining would" itself the gated property. */
object AnnIndexQueries {

  private def ensured[A](f: (org.apache.spark.sql.SparkSession, String) => A)
      : (org.apache.spark.sql.SparkSession, String) => A = { (s, dir) =>
    AnnIndex.ensure(s, dir, AnnIndex.defaultDir(dir))
    f(s, dir)
  }

  /** Probe-only IVF k-means (stored centroids + cell-partitioned store;
    * reads NPROBE/NLIST of the corpus files). */
  val annIvfProbe: Q = Q(
    "ann_ivf_probe_topk",
    SimilarityQueries.annIvfKmeans.oracle.get)(
    ensured((s, dir) => AnnIndex.probeIvf(s, dir, AnnIndex.defaultDir(dir))))

  /** Probe-only IVFPQ ADC (stored codebook + cell-partitioned code table). */
  val annIvfPqProbe: Q = Q(
    "ann_ivfpq_probe_topk",
    SimilarityQueries.annIvfPq.oracle.get)(
    ensured((s, dir) => AnnIndex.probeIvfPq(s, dir, AnnIndex.defaultDir(dir))))

  /** Probe-only SQ8 (stored reconstructions; skips the quantile train and
    * corpus encode). */
  val embSq8Probe: Q = Q(
    "emb_sq8_probe_topk",
    SimilarityQueries.embSq8.oracle.get)(
    ensured((s, dir) => AnnIndex.probeSq8(s, dir, AnnIndex.defaultDir(dir))))

  val all: Seq[Q] = Seq(annIvfProbe, annIvfPqProbe, embSq8Probe)
}
