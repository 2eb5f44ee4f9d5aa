package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for heavy per-row map stages.
  *
  * Operators like segment-blocked fuzzy join and minhash signatures do
  * orders of magnitude more work per input row than a scan (candidate
  * expansion, 64 hash passes): their wall-clock is bounded by the
  * parallelism of the INPUT, and a small table read from a single
  * parquet file arrives as ONE partition — the entire expansion chain
  * then executes on one task while every other core idles. (Observed on
  * q82 at sf0.1: 3.6M candidate expansions + bounded-levenshtein evals
  * on a single task, ~4s; the same work spread over 32 tasks is a few
  * hundred ms.)
  *
  * [[ensure]] round-robin-repartitions the input up to the session's
  * default parallelism ONLY when it has fewer partitions — the
  * repartition shuffles just the (small, pre-expansion) input rows. At
  * cluster scale a 100 TB input already arrives in thousands of splits,
  * so the guard is an identity there; it never *reduces* partitioning.
  */
private[graft] object Par {

  /** Pin a corpus-grain join input to the SHUFFLE regime (a sort-merge
    * hint — AQE's skew split still applies; the hint only forbids the
    * broadcast strategy for the join directly above).
    *
    * Why forbid rather than trust AQE: a join whose BOTH sides grow with
    * the corpus (candidate pairs × per-doc signatures, postings ×
    * set-size lookups) must never broadcast — at scale the build side
    * exceeds the driver's result cap long before the 8 GB broadcast
    * limit, and AQE's size signal is the COMPRESSED map output, which
    * under-prices highly-compressible id/hash frames by 20×+. Observed
    * live: q27's candidate frame at the 100× fixture benched fine at 10×
    * (AQE broadcast it from a ~60 MB shuffle estimate) then died at 100×
    * collecting 1.4 GiB of task results into BroadcastExchange. These
    * joins are documented pair-grain shuffles; the hint makes the
    * documented plan the actual plan at every scale.
    *
    * shuffle_hash, not merge: the hinted side builds a per-PARTITION
    * hash map (fine-grained keys spread it thin — at 10k partitions a
    * 5B-doc signature side is ~megabytes per task), no sort of either
    * side, and AQE's skew split still applies. A same-box family A/B
    * priced merge at ~+38% over the old (broadcast) plans at sf0.1;
    * shuffle_hash keeps the no-broadcast guarantee without the sorts.
    */
  def shuffleJoin(df: DataFrame): DataFrame = df.hint("shuffle_hash")

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Probe partitioning via the planned internal RDD (lazy — builds the
    // DAG, runs no job). `df.rdd` would additionally stack a
    // row-deserialization RDD conversion on top just to ask the same
    // question.
    if (df.queryExecution.toRdd.getNumPartitions < target)
      df.repartition(target)
    else df
  }
}
