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
