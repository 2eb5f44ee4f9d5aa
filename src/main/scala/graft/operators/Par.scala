package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col, count, lit, sum, when}

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

  /** Pin a corpus-grain join input to the SHUFFLE regime (a shuffle-hash
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

  /** [[shuffleJoin]]'s sibling for corpus-grain join sides whose ROWS
    * are FAT — per-doc shingle/embedding arrays, span strings, cleaned
    * text. Same no-broadcast guarantee, but via sort-merge: a
    * ShuffledHashJoin build map CANNOT spill, so a fat build side at a
    * static partition width eventually exceeds the task's
    * execution-memory share and kills the query outright — observed
    * live at the 100× fixture under 8 GiB executors (round-15
    * local-cluster soak): q90's pair-frame build died in
    * `LongToUnsafeRowMap.grow` ("Can't acquire 33554432 bytes memory to
    * build hash relation") building the shingle-array side of the
    * verification join, with no retry able to succeed because the
    * pressure is structural, not transient. Sort-merge spills both
    * sides gracefully at any scale; the sort cost is noise next to the
    * pipelines these joins sit in (banding/aggregation dominate). Thin
    * id/count/fingerprint sides (≤ ~16 B rows) stay on [[shuffleJoin]]
    * — their builds are bounded small and the per-partition hash map
    * beats the sort.
    */
  def mergeJoin(df: DataFrame): DataFrame = df.hint("merge")

  /** Partition width for a PAIR-EXPANDING postings self-join, sized to
    * the FORECAST output — Σ df·(df−1)/2 over kept keys — instead of to
    * the input or the core count.
    *
    * Why the input-proportional default fails: the self-join's output
    * (candidate pairs) grows with the square of per-key df while its
    * inputs stay postings-sized, so at `spark.sql.shuffle.partitions` =
    * cores each join task emits output/cores pair rows regardless of
    * scale. The map-side partial aggregate over those rows then holds a
    * hash map far beyond its execution-memory share, spills hundreds of
    * sort files, and `finishAggregate`'s merge allocates a reader
    * buffer PER spill file — observed live as a raw
    * `java.lang.OutOfMemoryError` in `UnsafeSorterSpillReader.<init>`
    * that killed an 8 GiB executor (local-cluster[4,8,8g] soak, q292 at
    * the 10× saturated fixture, round 15) and took its localCheckpoint
    * blocks with it. A 32 GiB single-JVM heap hides this completely —
    * it is an executor-heap failure mode, the cluster-realistic one.
    *
    * The forecast costs one tiny job over the caller's per-key df
    * counts frame — which every postings pipeline already computes for
    * its maxDf keep-list, so callers STAGE that frame once and this
    * reads the checkpointed blocks (a vocab-sized 1-row aggregate; the
    * expensive postings groupBy shuffle is never paid twice). It makes
    * the width track the workload: ~cores at fixture scale, thousands
    * of partitions at the 100 TB point, exactly what a cluster
    * deployment would hand-tune `spark.sql.shuffle.partitions` to. Both self-join
    * inputs AND the pair-grain aggregation should repartition to this
    * width with an explicit count (an explicit count is NOT
    * AQE-coalescible — AQE cannot see the expansion in the map-stage
    * stats and would coalesce the small byte-size back to one task, the
    * q82 lesson). Tunables: `spark.graft.pairsPerPartition` (default
    * 1e6 pair rows per task — a ~100 MB aggregate map, inside a
    * busy executor's per-task share even with storage-pinned memo
    * blocks squeezing the execution pool) and `spark.graft.maxPairWidth` (default
    * 4096, the local-mode task-overhead cap; raise it on a real
    * cluster).
    *
    * The forecast is sized to the DISTINCT pair mass Σ C(df,2), while
    * the self-join physically emits ~2× that (df² rows per key before
    * the `doc_a < doc_b` filter). That is deliberate: the join's extra
    * rows STREAM through the filter without buffering, and the
    * structure the width protects — the pair-grain aggregate's map-side
    * hash map — holds one entry per distinct pair, so C(df,2) is its
    * true working set and `pairsPerPartition` is calibrated to it. The
    * transient 2× row flow is headroom the target already absorbs.
    *
    * PRECONDITION (asserted): `dfCounts` must be a STAGED frame
    * (`Scratch.stage`/`staged` — a checkpointed LogicalRDD — or a
    * driver-local relation in tests). The forecast runs an EAGER
    * aggregate over it at plan-construction time; an unstaged postings
    * groupBy would be silently re-paid in full here and then again by
    * the caller's keep-list join.
    */
  def pairExpansionWidth(dfCounts: DataFrame, dfCol: String,
      maxDf: Int): Int =
    widthFromTwiceMass(dfCounts, dfCounts
      .filter(col(dfCol) <= maxDf)
      .agg(coalesce(sum(col(dfCol) * (col(dfCol) - lit(1L))), lit(0L))))

  /** [[pairExpansionWidth]] for STAR-degrading bucket expansions
    * ([[Dedup.bucketPairs]]): a bucket over `cap` is not DROPPED from
    * the output — it emits a linear star of (size − 1) pairs — so its
    * mass is counted linearly instead of excluded. Same knobs, same
    * staged-frame precondition, same explicit-count contract (pass the
    * result as `repartition(width, …)` — AQE cannot see the in-bucket
    * expansion in the map-stage byte stats and would otherwise coalesce
    * the bucket frame to a handful of tasks, serializing the explode
    * and the pair-distinct's map-side aggregate; observed live as q27's
    * 219M-record, 10.6 GB-spill, 10-task stage at the 100× fixture).
    */
  def starPairWidth(dfCounts: DataFrame, dfCol: String, cap: Int): Int =
    widthFromTwiceMass(dfCounts, dfCounts
      .agg(coalesce(sum(
        when(col(dfCol) <= cap, col(dfCol) * (col(dfCol) - lit(1L)))
          .otherwise((col(dfCol) - lit(1L)) * lit(2L))), lit(0L))))

  /** Common tail of the pair-width forecasts: assert the staged-frame
    * precondition, run the 1-row eager mass aggregate (`massAgg` must
    * produce 2× the distinct-pair mass — the C(df,2) sums are written
    * un-divided as df·(df−1) to stay integer-exact), and clamp to
    * [defaultParallelism, spark.graft.maxPairWidth] at
    * `spark.graft.pairsPerPartition` pairs per task.
    */
  private def widthFromTwiceMass(dfCounts: DataFrame,
      massAgg: DataFrame): Int = {
    val staged = dfCounts.queryExecution.analyzed.collectLeaves().forall {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
    require(staged,
      "pair-width forecasts need a staged df-counts frame " +
        "(Scratch.stage/staged): the forecast aggregate is eager, and " +
        "an unstaged frame would re-pay its postings groupBy shuffle " +
        "here and again at the caller's keep-list join")
    val sp = dfCounts.sparkSession
    val target =
      sp.conf.get("spark.graft.pairsPerPartition", "1000000").toLong
    val maxW = sp.conf.get("spark.graft.maxPairWidth", "4096").toInt
    val twiceMass = massAgg.head().getLong(0)
    val par = sp.sparkContext.defaultParallelism
    math.min(maxW,
      math.max(par, math.ceil(twiceMass / 2.0 / target).toInt))
  }

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
