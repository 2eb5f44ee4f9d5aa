package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cube.Engine

/** Relational operators beyond the cube query surface: top-k, window
  * ranking, semi/anti joins, set ops, rollup (SURVEY §2.5-2.7 — absent in
  * the reference, provided as first-class engine ops).
  *
  * Scale notes: every operator here is a declarative plan — top-k is
  * `ORDER BY ... LIMIT k` which Spark executes as per-partition top-k
  * (TakeOrderedAndProject) with no full sort; semi/anti joins shuffle only
  * the join keys; rollup is a single pass with grouping-set expansion.
  */
object Relational {

  private def e(spark: SparkSession, dir: String) = new Engine(spark, dir)

  /** Top-10 customers by revenue — TakeOrderedAndProject, not a full sort.
    * Deterministic tiebreak on customer key.
    */
  def topCustomers(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("lineitem")
      .join(en.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) " +
          "* 100, 0) AS BIGINT)")).cast("double") / 100.0, 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Rank nations by revenue within region (window function over the
    * aggregated star — the window runs on 25 rows, not the fact).
    */
  def nationRankInRegion(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val agg = en.table("lineitem")
      .join(en.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(en.table("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(en.table("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
    val w = Window.partitionBy(col("r_name")).orderBy(col("revenue").desc, col("n_name"))
    agg.withColumn("rank_in_region", rank().over(w))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("revenue"), col("rank_in_region"))
      .orderBy(col("region"), col("rank_in_region"), col("nation"))
  }

  /** Orders having at least one heavy lineitem — left-semi join (EXISTS). */
  def ordersWithHeavyItems(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val heavy = en.table("lineitem").filter(col("l_quantity") >= 45)
      .select(col("l_orderkey"))
    en.table("orders")
      .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Customers with no orders — left-anti join (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("customer")
      .join(en.table("orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customer_count"))
      .orderBy(col("c_mktsegment"))
  }

  /** Nations that appear via customers UNION via suppliers — set op. */
  def activeNations(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val nation = en.table("nation")
    val viaCust = en.table("customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    val viaSupp = en.table("supplier")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"))
    viaCust.union(viaSupp).distinct()
      .withColumnRenamed("n_name", "nation").orderBy(col("nation"))
  }

  /** Full CUBE over (mkt segment, order priority): all 4 grouping sets in
    * one pass (expanded map-side, aggregated once).
    */
  def segmentPriorityCube(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("orders")
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        grouping_id().as("lvl"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
  }

  /** Approximate distinct customers per nation (HyperLogLog++ sketch —
    * one pass, constant memory per group; rsd 5% default). The scale
    * answer to COUNT(DISTINCT) at 100 TB.
    */
  def approxCustomerCounts(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("orders")
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(en.table("nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(approx_count_distinct(col("o_custkey")).as("approx_customers"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      .withColumnRenamed("n_name", "nation")
      .orderBy(col("nation"))
  }

  /** Equi-DEPTH histogram: `buckets` bins each holding ~n/buckets rows,
    * with observed [lo, hi] bounds and exact counts — the optimizer-
    * statistics / data-profiling artifact (q67 is the equi-WIDTH twin;
    * equi-depth is what range-partition planners and NDV estimators
    * consume, because it adapts bin edges to skew). Bucket = floor of
    * ((rank−1)·buckets / n) over the distributed global rank
    * ([[Ranks.globalRowNumber]] — positional ids, one exchange, never a
    * single-partition sort); integer `div` on BOTH engines (a double
    * divide then int cast would diverge: Spark truncates, DuckDB
    * rounds). Exactly balanced bucket sizes regardless of value skew;
    * duplicate values may span adjacent buckets (rank order inside a
    * tie is the deterministic key tie-break).
    */
  def equiDepthHistogram(spark: SparkSession, dir: String,
      buckets: Int = 10): DataFrame = {
    val vals = e(spark, dir).table("orders")
      .select(col("o_totalprice").as("v"), col("o_orderkey").as("k"))
    graft.operators.Ranks
      .globalRowNumber(vals, Seq(col("v"), col("k")), "rank", Some("n"))
      .withColumn("bucket", expr(s"((rank - 1) * $buckets) div n").cast("int"))
      .groupBy(col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("bucket"))
  }

  /** Metastore-bucketed co-located join on the data path: both fact and
    * dim are written `bucketBy` their join key into the session catalog,
    * re-read, joined, and rolled up — the write→read→join ROUNDTRIP of
    * the bucketed layout (q91/q93 cover the partitioned and z-ordered
    * sinks; this puts the bucketed one on the oracle surface). With
    * matching bucket counts the join needs NO exchange on either side —
    * the layout is the shuffle, paid once at write time and amortized
    * over every subsequent join on that key; the exchange-free plan
    * shape is asserted in SkewSinkSpec/PlanShapeSpec with broadcast
    * disabled (at fixture scale Spark rightly prefers broadcasting the
    * dim — both plans read the same bucketed data).
    */
  def bucketedSegmentRollup(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    // clear catalog entry AND any orphaned location from a prior JVM
    // (the warehouse dir outlives the in-memory catalog)
    graft.sources.Sink.dropManaged(spark, "graft_bkt_orders")
    graft.sources.Sink.dropManaged(spark, "graft_bkt_customer")
    graft.sources.Sink.writeBucketed(
      en.table("orders").select(col("o_custkey"), col("o_totalprice")),
      "graft_bkt_orders", "o_custkey", 8)
    graft.sources.Sink.writeBucketed(
      en.table("customer").select(col("c_custkey"), col("c_mktsegment")),
      "graft_bkt_customer", "c_custkey", 8)
    spark.table("graft_bkt_orders")
      .join(spark.table("graft_bkt_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("segment"))
  }

  /** Mergeable-sketch pre-aggregation: per-(type, day) HLL user sketches
    * built once, then UNIONED per type — re-aggregating the small sketch
    * table instead of rescanning events. At 100 TB this is the pattern
    * that makes "distinct users for any date range" a cheap query over a
    * materialized daily-sketch cube; `hll_union_agg` merges sketches
    * without touching the fact table. Returns approx and exact side by
    * side (exact is affordable at fixture scale; the tolerance gate lives
    * in EventAnalyticsSpec).
    */
  def dailySketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val events = e(spark, dir).table("events")
    val dailySketches = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sketch"))
    val merged = dailySketches
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("approx_users"),
        count(lit(1)).as("n_days"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, "event_type").orderBy(col("event_type"))
  }

  /** Semi-structured properties via the VARIANT type (Spark 4): parse
    * once into a binary variant, extract typed fields with shredded
    * `variant_get` access — the schema-flexible path for property bags
    * whose keys drift over time, without a fixed `from_json` schema or
    * per-row regex. Rolls the extracted int up into deciles.
    */
  def variantPropDeciles(spark: SparkSession, dir: String): DataFrame = {
    e(spark, dir).table("events")
      .select(parse_json(col("props")).as("v"), col("value"))
      .select(variant_get(col("v"), "$.k", "int").as("k"), col("value"))
      .groupBy(floor(col("k") / 10).cast("int").as("k_decile"))
      .agg(count(lit(1)).as("event_count"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("k_decile"))
  }

  /** Per-group z-score outlier detection: events whose value sits more
    * than `sigmas` standard deviations from their type's mean. The
    * moments come from one grouped aggregate joined back by type (a
    * broadcast of #groups rows) — not a window over the fact table, so
    * the big side is scanned once and never shuffled or sorted.
    */
  def valueOutliers(spark: SparkSession, dir: String, sigmas: Double = 3.0): DataFrame = {
    val events = e(spark, dir).table("events")
    val moments = events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
    events.join(broadcast(moments), "event_type")
      .filter(abs(col("value") - col("mu")) > lit(sigmas) * col("sd"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sd"), 4).as("z"))
      .orderBy(col("event_id"))
  }

  /** Corpus term frequencies: tokenize -> explode -> count, the canonical
    * map-side-combinable word count; top 20 by document frequency with
    * deterministic tie-break.
    */
  def termFrequencies(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("documents")
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("tf").desc, col("token"))
      .limit(20)
  }

  /** Year x order-status rollup with subtotals (grouping sets). Single
    * pass; NULL marks the rolled-up slots, `lvl` = grouping level.
    */
  def yearStatusRollup(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("orders")
      .select(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"),
        col("o_totalprice"))
      .rollup(col("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("order_count"),
        round(sum(col("o_totalprice")), 2).as("total_price"),
        grouping_id().as("lvl"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Approximate percentiles (KLL-style sketch under percentile_approx):
    * the single-pass, mergeable, bounded-memory path for quantiles at
    * 100 TB — exact percentile materializes per-group value arrays, the
    * sketch shuffles fixed-size summaries. Accuracy 1000 ≈ 0.1% rank
    * error (tolerance-tested against the exact percentile in
    * RangeJoinSpec).
    */
  def approxPricePercentiles(spark: SparkSession, dir: String): DataFrame =
    e(spark, dir).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .as("approx_p"))
      .select(col("l_returnflag"),
        col("approx_p").getItem(0).as("p50"),
        col("approx_p").getItem(1).as("p95"))
      .orderBy(col("l_returnflag"))

  /** Percentile audit — the oracle-gated split of [[approxPricePercentiles]]:
    * exact p50/p95 (interpolating percentile — portable), plus data-path
    * assertions that each sketch estimate lands within its guaranteed
    * rank window. approx_percentile(accuracy=1000) bounds rank error at
    * ~0.1%; the audit brackets each estimate between the exact values at
    * rank ±0.5% (a 5x margin), so the booleans are deterministically TRUE
    * unless the sketch breaks its contract — which makes them (and the
    * exact columns) hash-checkable by an ANSI oracle while the sketch
    * still runs on the data path.
    */
  def pricePercentilesAudit(spark: SparkSession, dir: String): DataFrame =
    e(spark, dir).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .as("ap"),
        expr("percentile(l_extendedprice, array(0.5, 0.95, 0.495, 0.505, 0.945, 0.955))")
          .as("ep"))
      .select(col("l_returnflag"),
        round(col("ep").getItem(0), 4).as("p50"),
        round(col("ep").getItem(1), 4).as("p95"),
        col("ap").getItem(0).between(col("ep").getItem(2), col("ep").getItem(3))
          .as("approx_p50_ok"),
        col("ap").getItem(1).between(col("ep").getItem(4), col("ep").getItem(5))
          .as("approx_p95_ok"))
      .orderBy(col("l_returnflag"))

  /** Bivariate stats over the star: Pearson correlation and sample
    * covariance of quantity vs line price per return flag — single-pass
    * moment aggregates (no per-group materialization).
    */
  def priceQuantityStats(spark: SparkSession, dir: String): DataFrame =
    e(spark, dir).table("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("price_covar"),
        round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"))
      .orderBy(col("l_returnflag"))

  /** Ship-year x return-flag pivot (wide OLAP cross-tab). The pivot
    * values are declared explicitly, so Spark skips the extra
    * values-discovery aggregation it would otherwise run first — at
    * 100 TB that discovery pass is a full scan you don't want. Quantity
    * is an integer-valued double: sums are exact, no rounding needed.
    */
  def returnFlagPivot(spark: SparkSession, dir: String): DataFrame =
    e(spark, dir).table("lineitem")
      .select(year(col("l_shipdate")).cast("int").as("year"),
        col("l_returnflag"), col("l_quantity"))
      .groupBy(col("year"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity")))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy(col("year"))

  /** Fixed-width histogram of document sizes: explicit arithmetic binning
    * (bucket = min(n_chars div width, nbins-1)) rather than an
    * engine-specific histogram aggregate, so the binning is portable and
    * the plan is a plain single-pass hash aggregate over at most `nbins`
    * groups — histogramming 100 TB is one map-side-combined scan.
    */
  def charsHistogram(spark: SparkSession, dir: String,
      width: Int = 100, nbins: Int = 10): DataFrame =
    e(spark, dir).table("documents")
      .select(least(floor(col("n_chars") / lit(width)), lit(nbins - 1L))
        .as("bucket"), col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .withColumn("bucket_lo", col("bucket") * width)
      .select(col("bucket"), col("bucket_lo"), col("n_docs"),
        col("min_chars"), col("max_chars"))
      .orderBy(col("bucket"))

  /** CDC compaction / latest-per-key snapshot: keep each user's most
    * recent event (ts desc, event_id desc tie-break) — the "apply the
    * changelog, latest wins" step of every incremental ETL load.
    *
    * Scale shape: the rank-1 filter compiles to WindowGroupLimit, so
    * each map partition forwards at most one row per user before the
    * shuffle — compaction of a 100 TB changelog moves ~one row per key,
    * not the full history.
    */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e(spark, dir).table("events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("user_id"))
  }

  /** SCD2 (slowly-changing-dimension type 2) build: collapse each user's
    * event-type changelog into validity intervals — a row per state
    * CHANGE carrying [valid_from, valid_to) and a current-row flag, the
    * standard warehouse dimension-history shape.
    *
    * Single shuffle: both windows (lag to detect changes, lead to close
    * intervals) share the (user_id) partitioning, and the change filter
    * runs between them so the lead only scans change rows.
    */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    e(spark, dir).table("events")
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Point-in-time (PIT) enrichment: each purchase joined to the SCD2
    * state version valid AT its event time — the temporally-correct
    * feature join (training a model on "state at purchase" with a plain
    * latest-snapshot join leaks the future; the PIT join is how feature
    * stores serve historical features). Composition, not new machinery:
    * [[scd2]]'s version starts feed [[AsOf.asofJoin]] keyed by user —
    * the single-shuffle union+window carry-forward — so there is no
    * interval theta-join anywhere in the plan, and an event at exactly
    * `valid_from` lands in the NEW version (the as-of window sorts the
    * right side first on ties), matching the [valid_from, valid_to)
    * interval contract the oracle checks.
    */
  def pointInTimeEnrichment(spark: SparkSession, dir: String): DataFrame = {
    val versions = scd2(spark, dir)
      .select(col("user_id"), col("valid_from").as("ts"), col("state"))
    val purchases = e(spark, dir).table("events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOf.asofJoin(purchases, versions, "user_id", "ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("r_state").as("state"), col("r_ts").as("valid_from"))
      .orderBy(col("event_id"))
  }

  /** Day-over-day purchase deltas: daily rollup + lag analytics. The
    * delta and pct_change are deliberately UNROUNDED — both operands are
    * already rounded daily sums, and identical FP op order keeps the
    * derived doubles bit-identical across ANSI engines, whereas
    * re-rounding a subtraction diverges on .xx5 boundaries.
    *
    * The lag is a [[Ranks.globalRowNumber]] rank plus an equi-join on
    * adjacent ranks, NOT an unpartitioned `lag` window: same
    * previous-PRESENT-row semantics (a calendar gap still lags to the
    * last observed day, matching SQL `lag`), no single-partition sort —
    * so the identical plan serves a lag over an unbounded grain.
    */
  def dailyDeltas(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("events")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("day_value"))
    val ranked = Ranks.globalRowNumber(daily, Seq(col("day")), "__rn")
    val prev = ranked.select((col("__rn") + 1).as("__rn"),
      col("day_value").as("prev_value"))
    ranked.join(prev, Seq("__rn"), "left_outer")
      .withColumn("delta", col("day_value") - col("prev_value"))
      .withColumn("pct_change",
        (col("day_value") - col("prev_value")) / col("prev_value") * 100.0)
      .select(col("day"), col("n_purchases"), col("day_value"),
        col("prev_value"), col("delta"), col("pct_change"))
      .orderBy(col("day"))
  }

  /** Trailing 7-day moving average of daily value per event type — a
    * RANGE-frame window over the day number, so calendar gaps shorten the
    * frame (the semantic difference from a 7-ROW frame). The window runs
    * over the pre-aggregated daily frame (~types × days rows), not the
    * fact table; the sum inside the frame is of already-rounded daily
    * values, keeping the average bit-identical across engines.
    */
  def movingAverage7d(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts"))
          .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(round(sum(col("value")), 2).as("day_value"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .withColumn("avg_7d", round(sum(col("day_value")).over(w) /
        count(lit(1)).over(w), 4))
      .select(col("event_type"), col("day"), col("day_value"), col("avg_7d"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Revenue distribution analytics: quartile bucket (ntile semantics)
    * and exact percentile position (percent_rank) per customer — computed
    * with the DISTRIBUTED global-rank machinery ([[Ranks.globalRowNumber]];
    * see its scaladoc for why a global `Window.orderBy` cannot run at
    * 100 TB), then ntile/percent_rank derived arithmetically from the
    * global rank. Identical results to the window functions under the
    * deterministic total order (oracle-gated, q75; plan-asserted in
    * PlanShapeSpec).
    */
  def revenueQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val rev = en.table("lineitem")
      .join(en.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"))
      .agg(round(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) " +
          "* 100, 0) AS BIGINT)")).cast("double") / 100.0, 2)
        .as("revenue"))
    Ranks.globalRowNumber(rev, Seq(col("revenue").desc, col("c_custkey")),
        "__rank", totalCol = Some("__n"))
      // ntile(4) semantics: the first (n % 4) buckets hold ceil(n/4) rows
      .withColumn("quartile", expr(
        """CASE WHEN __rank <= (__n % 4) * (__n div 4 + 1)
          |     THEN (__rank - 1) div (__n div 4 + 1) + 1
          |     ELSE (__n % 4) + (__rank - (__n % 4) * (__n div 4 + 1) - 1)
          |            div (__n div 4) + 1 END""".stripMargin).cast("int"))
      // percent_rank = (rank - 1) / (n - 1); 0 for a single-row frame
      .withColumn("pct_rank",
        when(col("__n") === 1L, lit(0.0d))
          .otherwise((col("__rank") - lit(1L)).cast("double") /
            (col("__n") - lit(1L)).cast("double")))
      .select(col("c_custkey"), col("revenue"), col("quartile"), col("pct_rank"))
      .orderBy(col("c_custkey"))
  }

  /** Heavy hitters via the mergeable Datasketches frequent-items sketch
    * (Spark 4 `approx_top_k_accumulate` / `_combine` / `_estimate`):
    * per-day sketches built in one pass over the fact, combined WITHOUT
    * rescanning it — the companion to the q76 HLL rollup for "top items
    * over any date range" on a 100 TB log. Capacity (`maxItemsTracked`)
    * exceeds the column's cardinality here, so estimates are exact and
    * the query is oracle-gated; the under-capacity approximate regime is
    * tolerance-gated in EventAnalyticsSpec.
    */
  def approxTopEventTypes(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val daily = e(spark, dir).table("events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(expr("approx_top_k_accumulate(event_type, 16)").as("sk"))
    daily
      .agg(expr(s"approx_top_k_estimate(approx_top_k_combine(sk, 16), $k)").as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item").as("event_type"),
        col("e.count").as("est_count"))
      .orderBy(col("est_count").desc, col("event_type"))
  }

  /** Incremental aggregate maintenance: a materialized per-customer
    * order rollup is maintained by aggregating only the NEW partition
    * (orders on/after the cutoff) and merging partials with the existing
    * base — count adds, sum adds — never rescanning history. The oracle
    * recomputes from the full table, proving merged partials ≡ full
    * recompute; at 100 TB this is the difference between touching one
    * day and touching seven years.
    */
  def incrementalOrderStats(spark: SparkSession, dir: String,
      cutoff: String = "1999-01-01"): DataFrame = {
    val orders = e(spark, dir).table("orders")
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("total"))
    val base = partial(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp_ntz")))
    val delta = partial(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp_ntz")))
    base.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        round(sum(col("total")), 2).as("total_spend"))
      .orderBy(col("o_custkey"))
  }

  /** Incremental maintenance of a JOINED rollup ([[incrementalOrderStats]]
    * covers the agg-only case): the per-nation revenue view is updated by
    * joining ONLY the delta partition (orders on/after the cutoff)
    * against the dims and merging partials with the base — history is
    * never rescanned and never re-joined. At 100 TB the delta ⋈ dim join
    * touches one day of fact rows; the oracle recomputes the view from
    * the full table, proving merged partials ≡ full recompute.
    */
  def incrementalNationRevenue(spark: SparkSession, dir: String,
      cutoff: String = "1999-01-01"): DataFrame = {
    val en = e(spark, dir)
    val orders = en.table("orders")
    val cust = en.table("customer").select(col("c_custkey"), col("c_nationkey"))
    def partial(df: DataFrame): DataFrame =
      df.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("total"))
    val base = partial(orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp_ntz")))
    val delta = partial(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp_ntz")))
    base.unionByName(delta)
      .groupBy(col("c_nationkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        round(sum(col("total")), 2).as("total_revenue"))
      .orderBy(col("c_nationkey"))
  }

  /** Right-to-erasure (GDPR) purge audit: given a forget-set of
    * customers, report per table how many rows the cascade would purge
    * and retain — events by user key, orders by customer key, lineitem
    * transitively through its purged orders, and the customer rows
    * themselves. The compliance dry-run every data platform runs before
    * the actual delete job.
    *
    * Scale shape: the forget KEY SET (tiny — keys only, no payload)
    * broadcasts into semi-join counts against each fact; the lineitem
    * cascade semi-joins against the purged ORDER KEYS (still key-only).
    * Nothing wide shuffles; each table is scanned once, and at 100 TB
    * each count is a metadata-light scan the actual delete (an anti-join
    * rewrite, `Merge`-style) would then mirror.
    */
  def purgeAudit(spark: SparkSession, dir: String, modulus: Int = 97): DataFrame = {
    val en = e(spark, dir)
    val forget = en.table("customer")
      .filter(col("c_custkey") % modulus === 0)
      .select(col("c_custkey").as("__fk"))
    // one scan per table: broadcast left join against the (unique) key
    // set, flag-count both sides of the verdict in a single aggregation
    def audit(name: String, df: DataFrame, key: Column,
        keys: DataFrame): DataFrame =
      df.join(broadcast(keys), key === col("__fk"), "left")
        .agg(count(col("__fk")).as("n_purged"),
          (count(lit(1)) - count(col("__fk"))).as("n_retained"))
        .select(lit(name).as("table_name"), col("n_purged"),
          col("n_retained"))
    val purgedOrders = en.table("orders")
      .join(broadcast(forget), col("o_custkey") === col("__fk"), "left_semi")
      .select(col("o_orderkey").as("__fk"))
    audit("customer", en.table("customer"), col("c_custkey"), forget)
      .unionByName(audit("events", en.table("events"), col("user_id"), forget))
      .unionByName(audit("orders", en.table("orders"), col("o_custkey"), forget))
      .unionByName(audit("lineitem", en.table("lineitem"), col("l_orderkey"),
        purgedOrders))
      .orderBy(col("table_name"))
  }

  /** Pre-join cardinality / skew forecast: for a planned events ⋈ orders
    * join on user = customer key, the top-k hottest keys by OUTPUT
    * fanout (n_events × n_orders) — the join-explosion detector run
    * BEFORE the join, from per-side key histograms that are each a
    * map-side-combined aggregation orders of magnitude smaller than the
    * join output they forecast. The figure that decides between plain
    * shuffle join, broadcast, and [[graft.operators.Skew]] salting.
    */
  def joinFanoutReport(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val en = e(spark, dir)
    val le = en.table("events").groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"))
    val ri = en.table("orders").groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_orders"))
    le.join(ri, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .withColumn("fanout", col("n_events") * col("n_orders"))
      .orderBy(col("fanout").desc, col("key"))
      .limit(k)
  }

  /** RFM segmentation: every customer scored into quartiles of recency
    * (days since last order, lower = better), frequency (order count),
    * and monetary (total spend), then rolled up to segment cells — the
    * classic CRM cut. Each quartile runs under a fully deterministic
    * ordering (metric + custkey tiebreak), so boundaries are stable
    * across engines and runs.
    *
    * Scale shape: one aggregation collapses orders to a per-customer
    * triple; each quartile is a [[Ranks.globalNtile]] — the distributed
    * rank + SQL-standard tile arithmetic, NOT an unpartitioned `ntile`
    * window, because customer grain grows with the fact and a
    * single-partition sort over it is the first thing to die at 100×;
    * the final rollup is 64 cells.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val orders = e(spark, dir).table("orders")
    val asOf = orders.agg(max(col("o_orderdate")).as("as_of"))
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
      .crossJoin(broadcast(asOf))
      .withColumn("recency_days", datediff(col("as_of"), col("last_order")))
    val tiled = Seq(
      (Seq(col("recency_days"), col("o_custkey")), "r"),
      (Seq(col("frequency").desc, col("o_custkey")), "f"),
      (Seq(col("monetary").desc, col("o_custkey")), "m"))
      .foldLeft(perCust) { case (df, (order, c)) =>
        Ranks.globalNtile(df, order, 4, c)
      }
    tiled
      .groupBy(col("r"), col("f"), col("m"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary")), 2).as("segment_value"))
      .orderBy(col("r"), col("f"), col("m"))
  }

  /** Inter-arrival gap statistics: per-customer days between consecutive
    * orders (lag over the customer's order history), then the population
    * p50/p90/max and repeat-customer count — the replenishment-cycle /
    * churn-horizon estimate. One shuffle on the customer key; the gap
    * math is integer days.
    */
  def orderGapStats(spark: SparkSession, dir: String): DataFrame = {
    val orders = e(spark, dir).table("orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = orders
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("o_orderdate"), col("prev"))
        .cast("long").as("gap_days"))
    gaps.agg(count(lit(1)).as("n_gaps"),
      round(expr("percentile(gap_days, 0.5)"), 4).as("p50_days"),
      round(expr("percentile(gap_days, 0.9)"), 4).as("p90_days"),
      max(col("gap_days")).as("max_days"))
  }

  /** Market-basket mining: co-purchased part pairs within an order with
    * support and lift — the a-priori association primitive. Pair
    * emission is GROUPED, not joined: one collect_set per order builds
    * the (sorted, distinct) basket, and an in-row combination walk
    * emits each part_a < part_b pair exactly once — fanout per order is
    * C(lines-per-order, 2), bounded by basket size, never by catalog
    * size; the quadratic pairs-of-parts space is never formed and the
    * fact is exchanged ONCE (the old self-join exchanged it twice more
    * and sorted both sides). Lift stays integer-derived
    * (support·N / (nₐ·n_b)) so both engines divide the same exact
    * numerators.
    *
    * Scale shape (the q292/q137 postings discipline applied to baskets):
    * the (part_a, part_b) support aggregate runs at the
    * FORECAST-proportional width — Σ C(basket, 2) over the staged
    * per-order basket sizes — because pair mass grows with the corpus
    * while a session-static width does not: at the 100× fixture the
    * 32-wide support aggregate's spill-merge killed an executor-sized
    * heap outright (java.lang.OutOfMemoryError in
    * UnsafeSorterSpillReader.<init> inside finishAggregate — the exact
    * round-15 q292 signature, caught by the round-16 local-cluster
    * soak). The per-part count lookups join a CATALOG-growing frame on
    * both sides, so they are pinned to the shuffle regime
    * (Par.shuffleJoin — thin 16-byte rows; a forced broadcast dies
    * collecting a 100×-catalog side); only the 1-row order-count frame
    * still broadcasts.
    */
  def marketBasket(spark: SparkSession, dir: String, minSupport: Int = 3,
      k: Int = 15): DataFrame = {
    // ONE fact-grain exchange for the whole query: the grouped
    // collect_set BOTH dedupes (orderkey, partkey) — so the separate
    // distinct's exchange disappears — and assembles the basket array
    // the pair emission needs. Baskets are business-bounded (≤
    // lines-per-order parts, ≤ C(7,2)=21 pairs at this schema), so the
    // order-grain basket frame is safe to stage, and staging it lets
    // the part counts, the order count, the width forecast AND the pair
    // emission all read the checkpointed blocks instead of re-running
    // the fact aggregate. This replaces the fact-grain sort-merge
    // self-join (two extra exchanges + sorts of (long, long) fact rows,
    // and a 2× transient row flow through the part_a < part_b filter)
    // with an in-row combination walk over the sorted basket: pairs are
    // emitted exactly once, where the data already sits.
    val baskets = Scratch.staged(e(spark, dir).table("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts")))
    val partN = baskets.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    val orders = baskets.agg(count(lit(1)).as("n_orders"))
    val width = Par.pairExpansionWidth(
      baskets.select(size(col("parts")).cast("long").as("__df")),
      "__df", Int.MaxValue)
    // parts is sorted ascending and distinct, so pairing element i with
    // every later element enumerates exactly the part_a < part_b pairs
    // the old self-join kept. The higher-order transform/slice builds
    // the ≤21-entry pair array per order in-row (interpreted
    // expressions, but over business-bounded arrays — the fact-grain
    // join it replaces shuffled the whole corpus twice); the support
    // aggregate still runs at the forecast-proportional width (an
    // explicit count repartition — AQE cannot see the in-row expansion
    // in the map-stage byte stats, the q27/q292 lesson).
    val pairs = baskets
      .select(explode(expr(
        """flatten(transform(parts, (x, i) ->
          |  transform(slice(parts, i + 2, size(parts) - i - 1),
          |    y -> named_struct('part_a', x, 'part_b', y))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.part_a").as("part_a"), col("pr.part_b").as("part_b"))
      .repartition(width, col("part_a"), col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(Par.shuffleJoin(partN.select(col("l_partkey").as("part_a"),
        col("n").as("n_a"))), "part_a")
      .join(Par.shuffleJoin(partN.select(col("l_partkey").as("part_b"),
        col("n").as("n_b"))), "part_b")
      .crossJoin(broadcast(orders))
      .select(col("part_a"), col("part_b"), col("support"),
        round((col("support") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")), 4).as("lift"))
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Supplier concentration per part rolled up to brand (Herfindahl
    * index over lineitem share-of-supplier): HHI = Σ nₛ² / n², computed
    * from INTEGER lineitem counts so the per-part index is one exact
    * division. A brand whose parts average a high HHI is single-sourced —
    * the supply-chain-risk report.
    */
  def supplierConcentration(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perPs = en.table("lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    val perPart = perPs.groupBy(col("l_partkey"))
      .agg((sum(col("n") * col("n")).cast("double") /
        (sum(col("n")) * sum(col("n")))).as("hhi"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
    perPart
      .join(en.table("part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("hhi")), 4).as("avg_hhi"),
        round(avg(col("n_suppliers")), 4).as("avg_suppliers"))
      .orderBy(col("p_brand"))
  }

  /** Fulfillment latency: days from order date to each lineitem's ship
    * date, summarized per order priority (count, exact p50/p90, max) —
    * the SLA report. Integer day math, one join keyed on the order key.
    */
  def shipDelayByPriority(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
          .as("delay_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lineitems"),
        round(expr("percentile(delay_days, 0.5)"), 4).as("p50_days"),
        round(expr("percentile(delay_days, 0.9)"), 4).as("p90_days"),
        max(col("delay_days")).as("max_days"))
      .orderBy(col("o_orderpriority"))
  }

  /** Day-of-week seasonality with per-day chi-square contributions
    * against the uniform expectation — "is volume really flat across the
    * week?". The weekday is PORTABLE integer arithmetic
    * ((epoch_days + 4) mod 7, 0 = Sunday) rather than an engine dow()
    * whose numbering conventions differ (Spark 1=Sunday, DuckDB
    * 0=Sunday).
    */
  def dowProfile(spark: SparkSession, dir: String): DataFrame = {
    val orders = e(spark, dir).table("orders")
      .select((pmod(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")) + 4, lit(7))).cast("long").as("dow"))
    val counts = orders.groupBy(col("dow")).agg(count(lit(1)).as("n_orders"))
    val tot = counts.agg(sum(col("n_orders")).as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_orders"),
        round((col("n_orders") - col("total") / 7.0) *
          (col("n_orders") - col("total") / 7.0) / (col("total") / 7.0), 6)
          .as("chi2_term"))
      .orderBy(col("dow"))
  }

  /** Activity heatmap: event volume by (weekday, hour) — the capacity-
    * planning / on-call staffing matrix. Weekday is the q187 portable
    * (epoch+4) mod 7 integer; at most 7 x 24 output rows from one
    * map-side-combined aggregation.
    */
  def activityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val ev = e(spark, dir).table("events")
    ev.select(
      pmod(datediff(col("ts").cast("date"),
        lit("1970-01-01").cast("date")) + 4, lit(7)).cast("long").as("dow"),
      hour(col("ts")).cast("long").as("hr"),
      col("value"))
      .groupBy(col("dow"), col("hr"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("dow"), col("hr"))
  }

  /** Robust outlier report via MAD (median absolute deviation) — the
    * q79 z-score's robust sibling: a fat-tailed value column inflates the
    * stddev until real outliers hide inside 3 sigma, while the median and
    * MAD are 50%-breakdown estimators. Per event type: median, MAD,
    * outlier count at |v - med| > k * 1.4826 * MAD (1.4826 scales MAD to
    * sigma under normality).
    *
    * Scale shape: MAD is inherently two-pass (the deviation needs the
    * median first); each pass is one hash aggregation over events with
    * the per-type medians/MADs broadcast back — the fact shuffles ZERO
    * times (percentile partials combine map-side... they do not: exact
    * percentile shuffles per-group values; at 100 TB swap both
    * `percentile` calls for approx_percentile's KLL-style sketch, which
    * DOES combine map-side — same code shape, tolerance-gated like q59).
    */
  def madOutliers(spark: SparkSession, dir: String, k: Double = 3.0): DataFrame = {
    val ev = e(spark, dir).table("events")
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(max(col("med")).as("med"),
        expr("percentile(absdev, 0.5)").as("mad"))
    dev.join(broadcast(mad.select(col("event_type"), col("mad"))), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("absdev") > lit(k) * lit(1.4826) * col("mad"), lit(1)))
          .as("n_outliers"))
      .join(broadcast(mad), "event_type")
      .select(col("event_type"), round(col("med"), 4).as("med"),
        round(col("mad"), 4).as("mad"), col("n_events"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** 2-D skyline (pareto front) of customers: maximize total spend while
    * minimizing order count ("big spenders with few orders"). A point is
    * on the front iff no other point has >= spend AND <= orders with at
    * least one strict. The naive formulation is an all-pairs dominance
    * anti-join (quadratic — dead at corpus scale); for two dimensions the
    * front is instead a SINGLE SORTED SCAN: order by (spend desc, orders
    * asc) and keep a row iff its order count is strictly below the
    * running minimum of every earlier row — an earlier row has >= spend
    * by the sort, so "not strictly fewer orders than all of them" is
    * exactly dominance. Duplicate (spend, orders) points are collapsed
    * first (neither dominates the other; the window trick would
    * arbitrarily keep one), so the scan runs on distinct points with a
    * customer count carried along.
    *
    * Scale shape: TWO-STAGE. Stage 1 computes a LOCAL front per hash
    * bucket (window partitioned by the bucket — a parallel sorted scan;
    * dominance within a bucket implies global dominance, so survivors are
    * a superset of the true front but orders of magnitude smaller than
    * the point set). Stage 2 runs the same scan globally over only the
    * survivors, whose count is bounded by buckets x front-size — the
    * single-partition window never sees the raw point set. This is the
    * standard partition/merge skyline; the quadratic dominance anti-join
    * never appears.
    */
  def paretoCustomers(spark: SparkSession, dir: String, buckets: Int = 32): DataFrame = {
    val perCust = e(spark, dir).table("orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("total_spend"),
        count(lit(1)).as("n_orders"))
    val points = perCust.groupBy(col("total_spend"), col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
    def front(df: DataFrame, parts: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(col("total_spend").desc, col("n_orders"))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__minprev", min(col("n_orders")).over(w))
        .filter(col("__minprev").isNull || col("n_orders") < col("__minprev"))
        .drop("__minprev")
    }
    val local = front(
      points.withColumn("__b", pmod(hash(col("total_spend"), col("n_orders")), lit(buckets))),
      Seq(col("__b"))).drop("__b")
    front(local, Seq.empty)
      .select(col("total_spend"), col("n_orders"), col("n_customers"))
      .orderBy(col("total_spend").desc)
  }

  /** Interval coalescing (gaps-and-islands): each order opens a 7-day
    * activity window [orderdate, orderdate+7d); overlapping/touching
    * windows of one customer merge into maximal contiguous "activity
    * islands". Classic streaming-compaction shape for entitlement
    * periods, session stitching, uptime intervals.
    *
    * Plan: one shuffle on the partition key, then two window passes over
    * the SAME ordering (running max of prior interval ends -> island
    * break flag -> running sum = island id) and a final group-by that
    * reuses the customer-hash partitioning. No self-join: the quadratic
    * "overlap EXISTS" formulation is replaced by the sorted scan, which
    * is the only shape that survives a per-key history of millions of
    * intervals.
    */
  def orderIslands(spark: SparkSession, dir: String): DataFrame = {
    val iv = e(spark, dir).table("orders")
      .select(col("o_custkey"), col("o_orderdate").as("start_ts"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("end_ts"))
    val wOrd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("start_ts"), col("end_ts"))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    iv
      .withColumn("__maxend", max(col("end_ts")).over(wPrev))
      .withColumn("__newisl",
        when(col("__maxend").isNull || col("start_ts") > col("__maxend"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__newisl")).over(wOrd))
      .groupBy(col("o_custkey"), col("island"))
      .agg(min(col("start_ts")).as("island_start"),
        max(col("end_ts")).as("island_end"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"), col("island"))
  }

  /** Per-nation best customer via ARGMAX AS AN AGGREGATE (`max_by` over a
    * lexicographic (spend, key) struct) rather than a window row_number.
    * Same answer, different physics: the window plan must shuffle EVERY
    * per-customer row to its nation partition and sort it; the max_by
    * plan folds to a single struct per nation in the map-side partial
    * combine, so the exchange carries 25 structs instead of the whole
    * customer rollup. The struct's trailing custkey makes ties
    * deterministic (max key wins among equal spends).
    */
  def nationTopCustomer(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val spend = en.table("orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    spend
      .join(en.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(max_by(struct(col("spend"), col("c_custkey")),
        struct(col("spend"), col("c_custkey"))).as("best"))
      .join(broadcast(en.table("nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        col("best.c_custkey").as("best_custkey"),
        col("best.spend").as("best_spend"))
      .orderBy(col("nation"))
  }

  /** Wide-to-long melt of the lineitem measure columns (`Dataset.unpivot`,
    * Spark's native UNPIVOT plan) followed by a per-measure summary — the
    * "profile every measure in one pass" report shape that BI layers emit.
    * The unpivot is a zero-shuffle projection (each input row fans out to
    * 4 rows map-side); the only exchange is the final 12-group aggregate.
    * Sums stay hash-stable because every measure is an exact 2-decimal
    * quantity (quantities are integral doubles).
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val li = e(spark, dir).table("lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
    li.unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "measure", "val")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("val")), 2).as("total"),
        round(min(col("val")), 2).as("min_val"),
        round(max(col("val")), 2).as("max_val"))
      .orderBy(col("l_returnflag"), col("measure"))
  }

  /** Quarter-over-quarter revenue growth per region — the board-deck
    * trend line. The quarter index is PORTABLE integer math
    * (year*4 + (month-1) div 3) rather than an engine quarter() whose
    * return types differ. One star rollup (all three dims broadcast),
    * then a lag window over the ~regions x quarters aggregate (tiny);
    * the delta is a subtraction of exact 2-decimal sums, so no division
    * rounding can break hash parity.
    */
  def qoqGrowth(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val rolled = en.table("orders")
      .select(col("o_custkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 4 +
          expr("(month(o_orderdate) - 1) div 3")).cast("long").as("qidx"))
      .join(broadcast(en.table("customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(en.table("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(en.table("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("qidx"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
    val w = Window.partitionBy(col("region")).orderBy(col("qidx"))
    rolled
      .withColumn("qoq_delta",
        round(col("revenue") - lag(col("revenue"), 1).over(w), 2))
      .orderBy(col("region"), col("qidx"))
  }

  /** Pearson correlation of quantity vs discount per return flag, computed
    * from the five raw power sums with the textbook formula on BOTH
    * engines (never the built-in corr(), whose internal accumulation
    * order differs). Every sum is EXACT in a double: quantities are small
    * integers, discounts 2-decimal, their products 2-decimal, squares
    * 4-decimal — all far under 2^53 when scaled. Identical exact inputs
    * plus an identical IEEE expression tree give bit-identical output,
    * which the trailing round(, 6) then insures against ulp drift.
    * One map-side-combined aggregate; the fact never shuffles rows.
    */
  def qtyDiscountCorr(spark: SparkSession, dir: String): DataFrame = {
    val li = e(spark, dir).table("lineitem")
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        col("l_discount").as("y"))
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_qty_discount"))
      .orderBy(col("l_returnflag"))
  }

  /** ABC (Pareto) inventory classification of brands by revenue:
    * cumulative-share class A (top 80% of revenue), B (next 15%), C
    * (tail). The class boundary test runs in EXACT INTEGER CENTS
    * (5*cum <= 4*total for the 80% line, 20*cum <= 19*total for 95%) —
    * a float cum/total share could sit on the boundary and round
    * differently per engine, a scaled-integer comparison cannot. The
    * windows run over the ~25-row brand rollup (driver-scale), never the
    * fact; ordering ties break on brand name.
    */
  def abcClasses(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val brandRev = en.table("lineitem")
      .join(broadcast(en.table("part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_extendedprice")) * 100, 0).cast("long")
        .as("cents"))
    val wCum = Window.orderBy(col("cents").desc, col("p_brand"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    brandRev
      .withColumn("cum", sum(col("cents")).over(wCum))
      .withColumn("total", sum(col("cents")).over(wAll))
      .withColumn("abc_class",
        when(col("cum") * 5 <= col("total") * 4, "A")
          .when(col("cum") * 20 <= col("total") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_brands"),
        round(sum(col("cents")) / 100.0, 2).as("class_revenue"))
      .orderBy(col("abc_class"))
  }

  /** Top-k parts per brand by revenue with TIES KEPT (dense_rank, not
    * row_number) — the "best sellers per category" report where two
    * equal-revenue parts must both appear or the report lies. The window
    * runs over the (brand, part) rollup, never the fact; ranking on the
    * exact 2-decimal revenue makes tie membership engine-stable.
    */
  def topPartsPerBrand(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val en = e(spark, dir)
    val rev = en.table("lineitem")
      .join(broadcast(en.table("part").select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc)
    rev.withColumn("rnk", dense_rank().over(w))
      .filter(col("rnk") <= k)
      .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
  }

  /** Open-order backlog time series: for each month, how many orders are
    * in flight (placed, not yet fully shipped) and how much value they
    * carry — the working-capital curve. The order's open interval
    * [order month, last-ship month] is EXPLODED to its covered months
    * (`sequence` + `explode`) rather than range-joined against a spine:
    * order lifetimes are bounded (months, not years), so the fan-out is a
    * small constant per order and the whole operator is one map-side
    * expansion plus one ~80-group aggregate. At 100 TB the same plan
    * holds — the explode multiplies rows by avg-months-open (~4), which
    * beats shuffling the fact against a spine by orders of magnitude.
    */
  def openOrderBacklog(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val parallelism = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val lastShip = en.table("lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
      // The orderkey rollup's partial output is tiny in BYTES (thin
      // (key, date) rows), so AQE coalesces its exchange to ~1 partition
      // — and the broadcast join + month explode + month rollup that sit
      // ABOVE it then run on that one task (measured: 1.44 s single-task
      // stage at sf0.1, the whole query's dominant cost), because the
      // map-side stats cannot see the ~4× downstream expansion — the
      // documented q82 blind spot. The pin must be an explicit-count
      // repartition (not AQE-coalescible), and it must hash on MORE than
      // the aggregate key: a same-key repartition above the aggregate is
      // elided by the planner in favor of the (coalescible) ENSURE
      // exchange, and moving it below the aggregate would forfeit the
      // map-side combine (raw fact rows through the exchange — 4× the
      // bytes at this schema). Keyed on (orderkey, last_ship) it is
      // deterministic under retry, keeps the combine, and costs one
      // order-grain THIN exchange — at deployment scale the rollup's
      // output is big enough that AQE keeps it wide anyway, but any
      // mid-size tenant (partials under the advisory size, explode
      // output far over it) hits exactly the fixture's stall without it.
      .repartition(parallelism, col("l_orderkey"), col("last_ship"))
    en.table("orders")
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_totalprice"),
        // a handful of fixture rows ship before the order date — clamp so
        // the open interval is never negative (such orders count only in
        // their order month)
        explode(sequence(date_trunc("month", col("o_orderdate")),
          greatest(date_trunc("month", col("o_orderdate")),
            date_trunc("month", col("last_ship"))),
          expr("interval 1 month"))).as("__m"))
      .select(col("o_totalprice"),
        col("__m").cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("month"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("open_orders"),
        round(sum(col("o_totalprice")), 2).as("open_value"))
      .orderBy(col("month"))
  }

  /** Monthly revenue vs its trailing-12-month mean — the seasonality /
    * trend-deviation report. The trailing mean is an avg over a ROWS
    * frame of exact 2-decimal monthly sums: at most 12 exact doubles
    * whose sum is exact, so the quotient is engine-identical; it is
    * rounded to 6dp (finer than any exact decimal the quotient can be,
    * per the n-in-{1,2,4,8} half-grid trap). Window over ~80 month rows.
    */
  def revenueTrend(spark: SparkSession, dir: String): DataFrame = {
    val monthly = e(spark, dir).table("orders")
      .groupBy(date_trunc("month", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val w = Window.orderBy(col("month")).rowsBetween(-11, Window.currentRow)
    monthly
      .withColumn("trailing_12m", round(avg(col("revenue")).over(w), 6))
      .withColumn("dev", round(col("revenue") - col("trailing_12m"), 6))
      .orderBy(col("month"))
  }

  /** "Important suppliers" (TPC-H Q11 shape): suppliers whose revenue
    * share exceeds 1.05x the mean supplier share (the TPC-H generator
    * spreads supplier revenue tightly, so the interesting tail is just
    * above the mean). The cross-aggregate HAVING is the point — a
    * per-group aggregate compared against a global aggregate of the SAME
    * frame. The predicate runs in exact integer cents scaled by the
    * supplier count (`cents * n_sup * 100 > 105 * total`), so no float
    * share can sit on the boundary; the global total is one row,
    * broadcast back over the per-supplier rollup (never a second fact
    * scan — the rollup is reused for both sides).
    */
  def importantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perSup = en.table("lineitem")
      .join(broadcast(en.table("supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(round(sum(col("l_extendedprice")) * 100, 0).cast("long")
        .as("cents"))
    val total = perSup.agg(sum(col("cents")).as("total_cents"),
      count(lit(1)).as("n_sup"))
    perSup.crossJoin(broadcast(total))
      .filter(col("cents") * col("n_sup") * lit(100L) >
        lit(105L) * col("total_cents"))
      .select(col("s_suppkey"), col("s_name"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("cents").cast("double") / col("total_cents").cast("double"),
          6).as("share"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
  }

  /** Small-quantity revenue by brand (TPC-H Q17 shape): lineitems whose
    * quantity is below half the part's average quantity, summed per
    * brand. The correlated-average comparison runs as an exact integer
    * cross-multiplication (`2 * qty * cnt < sum_qty` — quantities are
    * integer-valued, so the products are exact in doubles), never a float
    * `avg`. The per-part rollup joins back on partkey (co-partitioned
    * shuffle, no broadcast of the fact); the brand dim is broadcast.
    */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val li = en.table("lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt_qty"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") * lit(2) * col("cnt_qty") < col("sum_qty"))
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("small_qty_revenue"))
      .orderBy(col("p_brand"))
  }

  /** Quantity-weighted median lineitem price per brand: cumulative weight
    * over the price-sorted run, first price where twice the running
    * weight reaches the total. Weights are integer-valued quantities so
    * every cumulative sum and the `2*cw >= W` crossing test are exact.
    *
    * Scale shape: the fact rows collapse to (brand, price) grain FIRST —
    * a fully parallel hash aggregate — and only that frame enters the
    * brand-partitioned cumulative window. The crossing price is
    * invariant under the pre-aggregation (summing a price run's weights
    * moves the cumulative total to the run's end without moving which
    * price first satisfies `2*cw >= W`), and per-price weight sums need
    * no row tiebreaker to be deterministic. Without the collapse the
    * window sorts the WHOLE fact at brand-count parallelism — measured
    * at the 100× fixture as one 27.7 s stage of 18 tasks each sorting
    * ~3.3M rows, and at 100 TB each of ~25 brand partitions would
    * serially sort billions of rows; price-grain rows grow with the
    * catalog's price space instead, and the window's per-partition input
    * stays bounded by distinct prices per brand. (The DuckDB oracle
    * keeps the row-grain window formulation — two independent spellings
    * of the same statistic is the stronger check.)
    */
  def weightedMedianPrice(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val li = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_extendedprice").as("price"),
        col("l_quantity").as("w"))
    val byPrice = li.groupBy(col("p_brand"), col("price"))
      .agg(sum(col("w")).as("pw"))
    val wCum = Window.partitionBy(col("p_brand"))
      .orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("p_brand"))
    byPrice.withColumn("cw", sum(col("pw")).over(wCum))
      .withColumn("tw", sum(col("pw")).over(wAll))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("p_brand"))
      .agg(min(col("price")).as("w_median_price"),
        min(col("tw")).cast("long").as("total_weight"))
      .orderBy(col("p_brand"))
  }

  /** Benford first-digit audit of order totals: observed first-digit
    * distribution vs the Benford expectation log10(1 + 1/d). The first
    * digit comes from the INTEGER-cents string (integer formatting is
    * portable; double formatting and log-based digit extraction are not).
    * One scan, 9 groups, total broadcast back.
    */
  def benfordOrders(spark: SparkSession, dir: String): DataFrame = {
    val d = e(spark, dir).table("orders")
      .withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
      .withColumn("digit",
        substring(col("cents").cast("string"), 1, 1).cast("int"))
    val byDigit = d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = byDigit.agg(sum(col("n")).as("total"))
    byDigit.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("observed_pct"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
          .as("benford_pct"))
      .orderBy(col("digit"))
  }

  /** Lag-k autocorrelation of the daily-revenue series (k = 1 and 7).
    * Daily revenue is aggregated to exact integer cents then floored to
    * whole DOLLARS (integer `div` — portable, and it keeps the BIGINT
    * power sums in range: daily dollars ~1e7, squared ~1e14, summed over
    * thousands of days stays far under 2^63, where cents-squared would
    * overflow). The lag pairs come from a self-join on `day = day + k`
    * (driver-scale after the fact rollup); the power sums accumulate as
    * BIGINTs so partial-agg order cannot perturb them; only the final
    * closed-form division runs in doubles on identical exact inputs.
    */
  def dailyAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
    val lags = Seq(1, 7).map { k =>
      val lagged = daily.select(col("day").as("lday"),
        col("dollars").as("ldollars"))
      daily.join(lagged,
          col("day") === expr(s"lday + INTERVAL $k DAYS"))
        .select(lit(k).as("lag"), col("dollars").as("x"),
          col("ldollars").as("y"))
    }.reduce(_.unionAll(_))
    lags.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n"),
        round((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("autocorr"))
      .orderBy(col("lag"))
  }

  /** Mutual information between market segment and order priority — the
    * categorical-dependence audit. All probabilities derive from one
    * contingency rollup (25 cells) plus its margins; the MI sum runs per
    * segment so the output is a per-segment dependence profile, not one
    * scalar. Counts are exact; only the final log-ratio arithmetic is
    * floating point.
    */
  def segmentPriorityMi(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val joined = en.table("orders")
      .join(en.table("customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
    val cells = joined.groupBy(col("seg"), col("prio"))
      .agg(count(lit(1)).as("nxy"))
    val segM = cells.groupBy(col("seg")).agg(sum(col("nxy")).as("nx"))
    val prioM = cells.groupBy(col("prio")).agg(sum(col("nxy")).as("ny"))
    val total = cells.agg(sum(col("nxy")).as("nn"))
    cells.join(broadcast(segM), "seg")
      .join(broadcast(prioM), "prio")
      .crossJoin(broadcast(total))
      .withColumn("term",
        (col("nxy").cast("double") / col("nn").cast("double")) *
          log((col("nxy").cast("double") * col("nn").cast("double")) /
            (col("nx").cast("double") * col("ny").cast("double"))))
      .groupBy(col("seg"))
      .agg(sum(col("nxy")).as("n_orders"),
        round(sum(col("term")), 6).as("mi_contrib"))
      .orderBy(col("seg"))
  }

  /** Kaplan-Meier survival of customer reorder intervals: for each
    * distinct gap length t (days between consecutive orders of one
    * customer), the risk set, event count, and the product-limit
    * survivor estimate exp(sum(ln(1 - d/n))). The gaps come from one
    * lag window per customer (keys shuffle once); everything after is a
    * rollup over distinct gap values (bounded by the date range, ~1000s
    * of rows), so the cumulative windows never see the fact.
    */
  def reorderSurvival(spark: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val gaps = e(spark, dir).table("orders")
      .withColumn("prev", lag(col("o_orderdate"), 1).over(wLag))
      .filter(col("prev").isNotNull)
      .select(datediff(col("o_orderdate"), col("prev")).as("t_days"))
    val byT = gaps.groupBy(col("t_days")).agg(count(lit(1)).as("d"))
    val wBefore = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.orderBy(col("t_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byT.agg(sum(col("d")).as("n_total"))
    byT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d")).over(wBefore), lit(0L)))
      .withColumn("lnterm",
        when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double"))))
      .select(col("t_days"), col("n_risk"), col("d").as("n_events"),
        // terminal t (risk set fully exhausted) pins survival to exactly
        // 0 rather than ln(0) — Spark's log yields NULL there, DuckDB's
        // -inf; the explicit branch is the only portable form
        when(col("d") >= col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(col("lnterm")).over(wUpTo)), 6))
          .as("survival"))
      .orderBy(col("t_days"))
  }

  /** Exponentially weighted moving average of daily revenue (7-day
    * window, decay 0.8), normalized over the weights actually present.
    * The band is realized as an EXPLODE + EQUI-JOIN (each day emits its
    * 7 (day, offset) probes and joins back on the exact day), never an
    * inequality join — at any scale this stays a hash join on the day
    * key instead of a broadcast-nested-loop. The series is exact whole
    * dollars; only the 7-term weighted sum is floating point.
    */
  def dailyEwma(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
    val probes = daily.select(col("day"), explode(
        sequence(lit(0), lit(6))).as("k"))
      .select(col("day"), col("k"),
        expr("day - make_interval(0, 0, 0, k)").as("src_day"),
        pow(lit(0.8), col("k")).as("wt"))
    val contrib = probes.join(
      daily.select(col("day").as("src_day"), col("dollars")), "src_day")
    contrib.groupBy(col("day"))
      .agg(round(sum(col("dollars") * col("wt")) / sum(col("wt")), 6)
        .as("ewma"),
        max(when(col("k") === 0, col("dollars"))).as("dollars"))
      .select(col("day"), col("dollars"), col("ewma"))
      .orderBy(col("day"))
  }

  /** Chi-square cell residuals for market segment x order priority: each
    * cell's observed count, independence-expected count, and chi-square
    * contribution. One contingency rollup (25 cells) feeds everything;
    * margins broadcast back. Counts are exact integers; expected/contrib
    * are closed-form doubles over identical exact inputs.
    */
  def segmentPriorityChisq(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val cells = en.table("orders")
      .join(en.table("customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("observed"))
    val segM = cells.groupBy(col("seg")).agg(sum(col("observed")).as("nx"))
    val prioM = cells.groupBy(col("prio")).agg(sum(col("observed")).as("ny"))
    val total = cells.agg(sum(col("observed")).as("nn"))
    cells.join(broadcast(segM), "seg")
      .join(broadcast(prioM), "prio")
      .crossJoin(broadcast(total))
      .withColumn("expected",
        col("nx").cast("double") * col("ny").cast("double") /
          col("nn").cast("double"))
      .select(col("seg"), col("prio"), col("observed"),
        round(col("expected"), 6).as("expected"),
        round((col("observed").cast("double") - col("expected")) *
          (col("observed").cast("double") - col("expected")) /
          col("expected"), 6).as("chi2_contrib"))
      .orderBy(col("seg"), col("prio"))
  }

  /** Histogram of overlapping order-interval pairs per customer: each
    * order spans [orderdate, last shipdate]; two orders of the same
    * customer overlap when the intervals intersect. The self-join is an
    * EQUI-join on custkey (per-customer order counts are bounded, so the
    * pair fan-out is quadratic only in a ~10-row group, never global),
    * followed by a two-level rollup to the distribution.
    */
  def orderOverlapHistogram(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val spans = en.table("orders")
      .join(en.table("lineitem").groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
        col("o_orderdate").as("start"), col("last_ship").as("end"))
    // Pair counting per customer via one collect + an in-row
    // higher-order aggregate instead of the customer-keyed self-join
    // (the q184/q289 restructure family): the per-customer order list
    // is business-bounded, the interpreted aggregate/filter lambdas
    // count qualifying pairs without ever materializing them (HOF
    // expressions are not whole-stage-codegen'd, but they run over
    // ≤~30-element arrays — noise next to the two fact exchanges they
    // replace), and the plan drops from two exchanges of the span frame
    // (both self-join sides) plus a customer-grain aggregate to ONE
    // exchange plus the bounded histogram rollup. Same O(orders²)
    // per-customer comparison mass, done where the data already sits.
    // The isNotNull filter pins the old inner-self-join semantics (an
    // equi-join never matches NULL keys; groupBy would keep a NULL
    // group) — o_custkey is never null in this schema, so it is a
    // no-op on results, asserted by the oracle hash.
    val perCust = spans
      .filter(col("cust").isNotNull)
      .groupBy(col("cust"))
      .agg(collect_list(struct(col("okey"), col("start"), col("end")))
        .as("__os"))
      .select(expr(
        """aggregate(__os, 0L, (acc, x) -> acc +
          |  size(filter(__os, y -> y.okey > x.okey AND
          |    x.start <= y.end AND y.start <= x.end)))""".stripMargin)
        .as("n_overlap_pairs"))
      .filter(col("n_overlap_pairs") > 0)
    perCust.groupBy(col("n_overlap_pairs"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_overlap_pairs"))
  }

  /** Log-log price elasticity per brand: OLS slope of ln(quantity) on
    * ln(extended price) across the brand's lineitems. Power sums
    * accumulate as doubles in one pass (the q196 pattern); the slope and
    * intercept are closed-form. Brands are a broadcast dim; the fact
    * aggregates in one shuffle on brand.
    */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val li = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), log(col("l_extendedprice")).as("x"),
        log(col("l_quantity")).as("y"))
    li.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n").cast("long").as("n_rows"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6)
          .as("elasticity"))
      .orderBy(col("p_brand"))
  }

  /** Blocking suppliers (TPC-H Q21 shape, adapted to this schema's
    * columns): in multi-supplier orders, the unique supplier whose last
    * shipment is the order's last shipment — the one holding the order
    * open. One rollup to (order, supplier) grain, three windows over
    * that rollup (never the fact), exact date comparisons, top-20 with
    * a key tiebreak so the cut is deterministic.
    */
  def blockingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perSupOrder = en.table("lineitem")
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("smax"))
    val wo = Window.partitionBy(col("l_orderkey"))
    val blocked = perSupOrder
      .withColumn("omax", max(col("smax")).over(wo))
      .withColumn("nsup", count(lit(1)).over(wo))
      .withColumn("nmax",
        sum(when(col("smax") === col("omax"), 1).otherwise(0)).over(wo))
      .filter(col("nsup") >= 2 && col("nmax") === 1 &&
        col("smax") === col("omax"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_blocked"))
    blocked.join(broadcast(en.table("supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_blocked"))
      .orderBy(col("n_blocked").desc, col("s_suppkey"))
      .limit(20)
  }

  /** Lapsed rich customers (TPC-H Q22 shape, adapted — this generator
    * gives virtually every customer at least one order, so "never
    * ordered" is vacuous; "no order in the data's final year" is the
    * live churn question): positive-balance customers with no order in
    * the last year whose balance exceeds their segment's positive-
    * balance average. The above-average predicate runs as an exact
    * integer cross-multiplication (`cents * n > total_cents`) — a float
    * average is a boundary a real balance can sit on. Anti-join against
    * the recent-order keys; the cutoff is one broadcast scalar; segment
    * averages broadcast.
    */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val cust = en.table("customer").filter(col("c_acctbal") > 0)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"))
    val segAvg = cust.groupBy(col("c_mktsegment"))
      .agg(sum(col("bal_cents")).as("seg_cents"),
        count(lit(1)).as("seg_n"))
    val cutoff = en.table("orders")
      .agg(expr("max(o_orderdate) - INTERVAL 1 YEAR").as("cut"))
    val recent = en.table("orders").crossJoin(broadcast(cutoff))
      .filter(col("o_orderdate") >= col("cut"))
      .select(col("o_custkey"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(segAvg), "c_mktsegment")
      .filter(col("bal_cents") * col("seg_n") > col("seg_cents"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("bal_cents")) / 100.0, 2).as("total_balance"))
      .orderBy(col("c_mktsegment"))
  }

  /** Hash-partition balance audit: row counts per `orderkey mod 32`
    * bucket with uniformity chi-square contributions — the "will this
    * key distribute" preflight a partitioning choice needs before a
    * 1000-executor shuffle commits to it. Modulo (not engine hash) so
    * the bucket assignment is portable; one scan, 32 groups.
    */
  def partitionBalance(spark: SparkSession, dir: String,
      buckets: Int = 32): DataFrame = {
    val byBucket = e(spark, dir).table("lineitem")
      .groupBy(pmod(col("l_orderkey"), lit(buckets.toLong)).cast("int")
        .as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    val total = byBucket.agg(sum(col("n_rows")).as("total"))
    byBucket.crossJoin(broadcast(total))
      .withColumn("expected",
        col("total").cast("double") / lit(buckets.toDouble))
      .select(col("bucket"), col("n_rows"),
        round(col("n_rows").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        round((col("n_rows").cast("double") - col("expected")) *
          (col("n_rows").cast("double") - col("expected")) /
          col("expected"), 6).as("chi2_contrib"))
      .orderBy(col("bucket"))
  }

  /** Realized-price ratio per brand: quantity-weighted revenue against
    * quantity-weighted retail value. Both numerator and denominator are
    * EXACT integer cents (retail is 2dp, quantities integral), so the
    * only float is the final ratio. The per-brand rollup shuffles once;
    * the part dim broadcasts.
    */
  def realizedDiscount(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"),
          round(col("p_retailprice") * 100, 0).cast("long")
            .as("retail_cents"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")) * 100, 0).cast("long")
          .as("rev_cents"),
        sum(col("l_quantity").cast("long") * col("retail_cents"))
          .as("retail_value_cents"))
      .select(col("p_brand"), col("n_items"),
        round(col("rev_cents") / 100.0, 2).as("revenue"),
        round(col("retail_value_cents") / 100.0, 2).as("retail_value"),
        round(col("rev_cents").cast("double") /
          col("retail_value_cents").cast("double"), 6)
          .as("realized_ratio"))
      .orderBy(col("p_brand"))
  }

  /** Median-of-three smoothing of the daily revenue series with spike
    * flags: the classic robust filter, computed entirely in exact whole
    * dollars (`max(min(a,b), min(max(a,b), c))` on integers), spike =
    * |raw - smooth| exceeding 10% of smooth by exact integer
    * cross-multiplication. Interior days only (the filter needs both
    * neighbors), so the frame is deterministic on both engines.
    */
  def median3Smoothing(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
    val w = Window.orderBy(col("day"))
    val a = col("prev"); val b = col("dollars"); val c = col("nxt")
    daily
      .withColumn("prev", lag(col("dollars"), 1).over(w))
      .withColumn("nxt", lead(col("dollars"), 1).over(w))
      .filter(a.isNotNull && c.isNotNull)
      .withColumn("smooth",
        greatest(least(a, b), least(greatest(a, b), c)))
      .select(col("day"), col("dollars"), col("smooth"),
        (abs(col("dollars") - col("smooth")) * 10 > col("smooth"))
          .cast("int").as("is_spike"))
      .orderBy(col("day"))
  }

  /** Order-priority mix shift by quarter: each priority's share of the
    * quarter's orders and its delta against the previous quarter — the
    * composition-drift view. The quarter key is a portable integer
    * (year*4 + quarter), shares are integer ratios rounded once, and the
    * delta subtracts the ROUNDED shares so it is exact 6dp arithmetic.
    */
  def priorityMixShift(spark: SparkSession, dir: String): DataFrame = {
    val cells = e(spark, dir).table("orders")
      .groupBy((year(col("o_orderdate")) * 4 +
          quarter(col("o_orderdate")) - 1).cast("int").as("qidx"),
        col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("qidx")).agg(sum(col("n")).as("qn"))
    val wLag = Window.partitionBy(col("priority")).orderBy(col("qidx"))
    cells.join(broadcast(totals), "qidx")
      .withColumn("share",
        round(col("n").cast("double") / col("qn").cast("double"), 6))
      .withColumn("delta",
        round(col("share") - lag(col("share"), 1).over(wLag), 6))
      .select(col("qidx"), col("priority"), col("n"), col("share"),
        col("delta"))
      .orderBy(col("qidx"), col("priority"))
  }

  /** Supplier lead-time consistency: mean and sample standard deviation
    * of ship delay (days from order to line shipment) per supplier, from
    * exact BIGINT power sums — the "who ships erratically" vendor audit.
    * One fact shuffle keyed by orderkey for the date join, one supplier
    * rollup; the closed-form std runs on identical exact integers.
    */
  def supplierConsistency(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val delays = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("d"))
    delays.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("s"),
        sum(col("d") * col("d")).as("ss"))
      .filter(col("n") >= 2)
      .select(col("l_suppkey").as("s_suppkey"), col("n").as("n_lineitems"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("mean_delay"),
        round(sqrt((col("n").cast("double") * col("ss").cast("double") -
            col("s").cast("double") * col("s").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - 1.0))), 6)
          .as("std_delay"))
      .orderBy(col("s_suppkey"))
  }

  /** Cross-nation trade matrix (TPC-H Q7 shape): revenue flows from
    * supplier nation to customer nation. Two independent broadcast dim
    * chains hang off one fact scan (supplier side keyed l_suppkey,
    * customer side through orders — the orders join is the only
    * fact-sized shuffle); the 25x25 matrix rolls up exactly in cents.
    */
  def tradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val supNation = broadcast(en.table("supplier")
      .join(broadcast(en.table("nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custNation = en.table("customer")
      .join(broadcast(en.table("nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .join(supNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("supp_nation"), col("cust_nation"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) " +
            "* 100, 0) AS BIGINT)")).cast("double") / 100.0, 2)
          .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"))
  }

  /** Trend-sign census of customer order values: per customer, the OLS
    * slope of order total against order sequence — computed ONLY as its
    * integer numerator `n*sxy - sx*sy` over (sequence, exact cents), so
    * the rising/flat/falling classification is exact integer arithmetic
    * end to end (a float slope near zero would classify differently per
    * engine). Censused per segment. One window for the sequence, two
    * bounded rollups.
    */
  def valueTrajectoryCensus(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val seqd = en.table("orders")
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderdate"), col("o_orderkey"))
      .withColumn("seq", row_number().over(w).cast("long"))
    val perCust = seqd.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("seq")).as("sx"),
        sum(col("cents")).as("sy"),
        sum(col("seq") * col("cents")).as("sxy"))
      .filter(col("n") >= 2)
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
    perCust.join(en.table("customer")
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("num") > 0, 1L).otherwise(0L)).as("n_rising"),
        sum(when(col("num") === 0, 1L).otherwise(0L)).as("n_flat"),
        sum(when(col("num") < 0, 1L).otherwise(0L)).as("n_falling"))
      .withColumn("rising_share", round(col("n_rising").cast("double") /
        col("n_customers").cast("double"), 6))
      .orderBy(col("c_mktsegment"))
  }

  /** Sampling calibration audit: deterministic hash samples of orders at
    * 10/25/50%, each row reporting the achieved rate and how well the
    * rate-corrected revenue estimate reproduces the full total — the
    * preflight that says whether hash sampling is safe for a metric
    * before a 100 TB scan commits to it. Membership uses the same
    * multiplicative hash as the corpus split machinery (portable integer
    * arithmetic); totals are exact cents; only the final calibration
    * ratios are floating point.
    */
  def samplingCalibration(spark: SparkSession, dir: String): DataFrame = {
    val orders = e(spark, dir).table("orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .withColumn("h",
        pmod(col("o_orderkey").bitwiseAND(lit(0x7FFFFFFFL)) *
          lit(2654435761L), lit(1000L)))
    val total = orders.agg(sum(col("cents")).as("full_cents"),
      count(lit(1)).as("full_n"))
    val perRate = Seq(100, 250, 500).map { r =>
      orders.filter(col("h") < r)
        .agg(lit(r).as("rate_permille"), count(lit(1)).as("n_sampled"),
          sum(col("cents")).as("cents_sampled"))
    }.reduce(_.unionAll(_))
    perRate.crossJoin(broadcast(total))
      .select(col("rate_permille"), col("n_sampled"),
        round(col("n_sampled").cast("double") * 1000.0 /
          (col("rate_permille").cast("double") *
            col("full_n").cast("double")), 6).as("count_calibration"),
        round(col("cents_sampled").cast("double") * 1000.0 /
          (col("rate_permille").cast("double") *
            col("full_cents").cast("double")), 6)
          .as("revenue_calibration"))
      .orderBy(col("rate_permille"))
  }

  /** Revenue concentration (Lorenz) curve: each customer decile's exact
    * revenue share and the cumulative share — "the top 10% of customers
    * carry X% of revenue". A thin projection over [[revenueDeciles]],
    * the same distributed-rank decile plan [[whaleCurve]] uses (one
    * implementation, two reports) — no single-partition sort anywhere;
    * shares divide exact cents over 10 decile rows.
    */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame =
    revenueDeciles(spark, dir)
      .select(col("decile"), col("n_customers"),
        round(col("c").cast("double") / col("tot").cast("double"), 6)
          .as("share"),
        round(col("cum").cast("double") / col("tot").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("decile"))

  /** Peak-hour detection: for each event type, the hour of day carrying
    * the most events (ties to the earliest hour) and its share of the
    * type's traffic. One 24 x types rollup; the argmax is a window over
    * that rollup with an exact integer tiebreak.
    */
  def peakHours(spark: SparkSession, dir: String): DataFrame = {
    val byHour = e(spark, dir).table("events")
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val tot = byHour.groupBy(col("event_type")).agg(sum(col("n")).as("tn"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("hr"))
    byHour.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .join(broadcast(tot), "event_type")
      .select(col("event_type"), col("hr").as("peak_hour"),
        col("n").as("n_events"),
        round(col("n").cast("double") / col("tn").cast("double"), 6)
          .as("share"))
      .orderBy(col("event_type"))
  }

  /** Fulfillment SLA attainment by priority: share of orders fully
    * shipped within 30 / 60 / 90 days. Day counts are exact integers
    * against the last line shipment; the three bands are cumulative by
    * construction. One orderkey-co-partitioned join, one bounded rollup.
    */
  def slaAttainment(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val lastShip = en.table("lineitem").groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"))
    en.table("orders")
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("days",
        datediff(col("last_ship"), col("o_orderdate")))
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("days") <= 30, 1L).otherwise(0L)).as("in_30"),
        sum(when(col("days") <= 60, 1L).otherwise(0L)).as("in_60"),
        sum(when(col("days") <= 90, 1L).otherwise(0L)).as("in_90"))
      .select(col("priority"), col("n_orders"),
        round(col("in_30").cast("double") / col("n_orders").cast("double"),
          6).as("sla_30"),
        round(col("in_60").cast("double") / col("n_orders").cast("double"),
          6).as("sla_60"),
        round(col("in_90").cast("double") / col("n_orders").cast("double"),
          6).as("sla_90"))
      .orderBy(col("priority"))
  }

  /** Burstiness audit: each user's maximum event count inside any
    * 1-hour window anchored at one of their events, as a distribution.
    * The window census is a per-user EQUI self-join (user keys bound the
    * quadratic locally — the global plan is one hash join, never a
    * cartesian), the anchor-max is exact integers, and the histogram
    * bands by integer division.
    */
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = e(spark, dir).table("events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"))
    val b = ev.select(col("user_id"), col("us").as("us2"))
    // anchors key on event_id — two events sharing a timestamp must stay
    // separate anchors or their window counts double
    val perUser = ev.join(b, "user_id")
      .filter(col("us2") >= col("us") &&
        col("us2") < col("us") + lit(3600000000L))
      .groupBy(col("user_id"), col("event_id"))
      .agg(count(lit(1)).as("in_window"))
      .groupBy(col("user_id"))
      .agg(max(col("in_window")).as("peak_burst"))
    perUser.groupBy(col("peak_burst"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("peak_burst"))
  }

  /** Exact GLOBAL percentiles of line price (p50/p90/p99,
    * percentile_disc semantics: the value at rank ceil(p·n)) — computed
    * by distributed rank over the full fact, not an approx sketch and
    * not a single-partition window: [[Ranks.globalRowNumber]] range-
    * partitions on the order key, ranks within partitions, and offsets
    * by broadcast partial counts. The rank targets are exact integer
    * arithmetic; the order carries (orderkey, linenumber) so the picked
    * row is unique on both engines.
    */
  def globalPricePercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = e(spark, dir).table("lineitem")
      .select(col("l_extendedprice").as("v"), col("l_orderkey"),
        col("l_linenumber"))
    val ranked = Ranks.globalRowNumber(li,
      Seq(col("v"), col("l_orderkey"), col("l_linenumber")),
      rankCol = "__rank", totalCol = Some("__n"))
    def target(p: Int) = expr(s"(($p * __n) + 99) div 100")
    ranked
      .filter(col("__rank") === target(50) ||
        col("__rank") === target(90) || col("__rank") === target(99))
      .select(
        when(col("__rank") === target(50), "p50")
          .when(col("__rank") === target(90), "p90")
          .otherwise("p99").as("pctl"),
        col("__rank").as("rank"), col("v").as("value"))
      .orderBy(col("pctl"))
  }

  /** Month-of-year seasonal index: each calendar month's mean monthly
    * revenue against the overall monthly mean — the classical seasonal
    * decomposition companion to the day-of-week profile. Monthly cents
    * are exact; the index divides exact integers scaled by month counts
    * (cross-multiplied, no float mean feeds another float mean).
    */
  def monthlySeasonality(spark: SparkSession, dir: String): DataFrame = {
    val monthly = e(spark, dir).table("orders")
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val perM = monthly.groupBy(col("m"))
      .agg(count(lit(1)).as("n_months"), sum(col("cents")).as("m_cents"))
    val tot = perM.agg(sum(col("n_months")).as("all_months"),
      sum(col("m_cents")).as("all_cents"))
    perM.crossJoin(broadcast(tot))
      .select(col("m").as("month_of_year"), col("n_months"),
        // 6dp, not 2: cents/n_months can terminate at 3dp and sit ON the
        // 2dp half-grid — rounding finer than the exact decimal is safe
        round(col("m_cents") / lit(100.0) / col("n_months").cast("double"),
          6).as("mean_monthly_revenue"),
        round((col("m_cents").cast("double") *
            col("all_months").cast("double")) /
          (col("n_months").cast("double") * col("all_cents").cast("double")),
          6).as("seasonal_index"))
      .orderBy(col("month_of_year"))
  }

  /** New-vs-returning revenue mix by month: each order classified by
    * whether it is its customer's first-ever order (first = minimal
    * (date, orderkey) — deterministic under same-day ties), rolled up
    * to monthly counts, exact-cents revenue, and the new-revenue share.
    * One window at customer grain, one bounded month rollup.
    */
  def acquisitionMix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val classified = e(spark, dir).table("orders")
      .withColumn("rk", row_number().over(w))
      .withColumn("is_new", (col("rk") === 1).cast("int"))
      .withColumn("cents",
        round(col("o_totalprice") * 100, 0).cast("long"))
    classified
      .groupBy(date_trunc("month", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("month"))
      .agg(sum(col("is_new")).cast("long").as("n_new"),
        sum(lit(1) - col("is_new")).cast("long").as("n_returning"),
        sum(when(col("is_new") === 1, col("cents")).otherwise(0L))
          .as("new_cents"),
        sum(col("cents")).as("all_cents"))
      .select(col("month"), col("n_new"), col("n_returning"),
        round(col("new_cents") / 100.0, 2).as("new_revenue"),
        round(col("all_cents") / 100.0, 2).as("total_revenue"),
        round(col("new_cents").cast("double") /
          col("all_cents").cast("double"), 6).as("new_share"))
      .orderBy(col("month"))
  }

  /** Return rate by brand: share of lineitems flagged returned, with
    * the deviation from the global rate — the product-quality lens.
    * Exact integer counts; the part dim broadcasts.
    */
  def returnRates(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val byBrand = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
    val tot = byBrand.agg(sum(col("n_items")).as("tn"),
      sum(col("n_returned")).as("tr"))
    byBrand.crossJoin(broadcast(tot))
      .select(col("p_brand"), col("n_items"), col("n_returned"),
        round(col("n_returned").cast("double") /
          col("n_items").cast("double"), 6).as("return_rate"),
        round(col("n_returned").cast("double") /
            col("n_items").cast("double") -
          col("tr").cast("double") / col("tn").cast("double"), 6)
          .as("vs_global"))
      .orderBy(col("p_brand"))
  }

  /** Catalog shape matrix: part counts and mean retail price by size
    * band x leading type word — the assortment profile over the two
    * catalog attributes nothing else reads. Mean rounds finer than its
    * possible exact decimal (cents over a small count can terminate on
    * the coarse half-grid).
    */
  def sizeTypeMatrix(spark: SparkSession, dir: String): DataFrame = {
    e(spark, dir).table("part")
      .select(expr("p_size div 10").cast("int").as("size_band"),
        split(col("p_type"), " ").getItem(0).as("type_head"),
        round(col("p_retailprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("size_band"), col("type_head"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("cents")).cast("double") /
          (count(lit(1)).cast("double") * 100.0), 6).as("mean_retail"))
      .orderBy(col("size_band"), col("type_head"))
  }

  /** Correlation between the semi-structured prop `k` (VARIANT-extracted)
    * and the event value, per event type — the "does this property drive
    * the metric" probe over the schema-flexible column. k is an exact
    * integer; value sums are floating but one-pass (the q196 power-sum
    * shape).
    */
  def propValueCorr(spark: SparkSession, dir: String): DataFrame = {
    val ev = e(spark, dir).table("events")
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "int")
          .cast("double").as("x"),
        col("value").as("y"))
      .filter(col("x").isNotNull)
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n").cast("long").as("n_events"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_k_value"))
      .orderBy(col("event_type"))
  }

  /** Top-decile brand-mix contrast: each brand's revenue share among the
    * top-10%-by-value orders versus its overall share — which brands
    * over-index in big orders. Membership in the top decile is an exact
    * integer rank cut via [[Ranks.globalRowNumber]] — the rank runs over
    * ORDER grain, which grows with the fact, so an unpartitioned
    * `row_number` window here would be a single-partition sort of every
    * order at scale. Shares divide exact cents. All 25 brands emit
    * unranked (ordering by a float diff is not a portable contract).
    */
  def topDecileBrandMix(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perOrder = en.table("orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("ocents"))
    val topOrders = Ranks.globalRowNumber(perOrder,
        Seq(col("ocents").desc, col("o_orderkey")), "rk", Some("n_orders"))
      .filter(col("rk") * 10 <= col("n_orders"))
      .select(col("o_orderkey"))
    val li = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val flagged = li.join(topOrders.withColumn("__top", lit(1)),
      col("l_orderkey") === col("o_orderkey"), "left")
    val byBrand = flagged.groupBy(col("p_brand"))
      .agg(sum(col("cents")).as("all_cents"),
        sum(when(col("__top").isNotNull, col("cents")).otherwise(0L))
          .as("top_cents"))
    val tot = byBrand.agg(sum(col("all_cents")).as("ta"),
      sum(col("top_cents")).as("tt"))
    byBrand.crossJoin(broadcast(tot))
      .select(col("p_brand"),
        round(col("all_cents").cast("double") / col("ta").cast("double"),
          6).as("overall_share"),
        round(col("top_cents").cast("double") / col("tt").cast("double"),
          6).as("top_decile_share"),
        round(col("top_cents").cast("double") / col("tt").cast("double") -
          col("all_cents").cast("double") / col("ta").cast("double"), 6)
          .as("over_index"))
      .orderBy(col("p_brand"))
  }

  /** Percent-of-parent hierarchy shares: nation revenue as a share of
    * its region, region as a share of the total — the drill-path
    * context columns an OLAP UI shows next to every node. Two window
    * sums over the 25-row nation rollup (never the fact); shares divide
    * exact cents.
    */
  def percentOfParent(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val byNation = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(en.table("customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(en.table("nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(en.table("region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(round(sum(col("l_extendedprice")) * 100, 0).cast("long")
        .as("cents"))
    val wRegion = Window.partitionBy(col("region"))
    val wAll = Window.partitionBy()
    byNation
      .withColumn("region_cents", sum(col("cents")).over(wRegion))
      .withColumn("total_cents", sum(col("cents")).over(wAll))
      .select(col("region"), col("nation"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("cents").cast("double") /
          col("region_cents").cast("double"), 6).as("pct_of_region"),
        round(col("region_cents").cast("double") /
          col("total_cents").cast("double"), 6).as("region_pct_of_total"))
      .orderBy(col("region"), col("nation"))
  }

  /** Maximum drawdown of daily revenue per quarter: the largest relative
    * drop from a running intra-quarter peak — the volatility metric on
    * the revenue series. Running peaks are exact integer windows; the
    * per-day drawdown ratio divides exact integers, and the quarterly
    * max is order-independent.
    */
  def revenueDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy((year(col("o_orderdate")) * 4 +
          quarter(col("o_orderdate")) - 1).cast("int").as("qidx"),
        date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val wPeak = Window.partitionBy(col("qidx")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak", max(col("cents")).over(wPeak))
      .withColumn("dd", (col("peak") - col("cents")).cast("double") /
        col("peak").cast("double"))
      .groupBy(col("qidx"))
      .agg(count(lit(1)).as("n_days"),
        round(max(col("dd")), 6).as("max_drawdown"))
      .orderBy(col("qidx"))
  }

  /** Brand-pair monthly revenue correlation matrix — substitution and
    * complementarity screening (negative correlation suggests
    * cannibalization). Monthly brand revenue is exact cents; the pair
    * frame self-joins the bounded (brand, month) rollup on month, and
    * Pearson runs from BIGINT power sums. Emits every pair unranked.
    */
  def brandCorrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val monthly = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(round(sum(col("l_extendedprice")) * 100, 0).cast("long")
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
    val b = monthly.select(col("month"), col("p_brand").as("brand_b"),
      col("dollars").as("db"))
    monthly.join(b, "month")
      .filter(col("p_brand") < col("brand_b"))
      .groupBy(col("p_brand").as("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("dollars")).as("sx"), sum(col("db")).as("sy"),
        sum(col("dollars") * col("db")).as("sxy"),
        sum(col("dollars") * col("dollars")).as("sxx"),
        sum(col("db") * col("db")).as("syy"))
      .select(col("brand_a"), col("brand_b"), col("n_months"),
        round((col("n_months").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          sqrt((col("n_months").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
            (col("n_months").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("corr"))
      .orderBy(col("brand_a"), col("brand_b"))
  }

  /** Join-skew diagnosis for the orderkey fan: the distribution of
    * lineitems per order (the join multiplicity) — count of keys per
    * fan size plus the global skew factor (max/mean, in exact
    * cross-multiplied integer terms before the one rounded ratio). The
    * preflight that decides whether a join needs salting.
    */
  def joinSkewDiagnosis(spark: SparkSession, dir: String): DataFrame = {
    val fans = e(spark, dir).table("lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("fan"))
    val stats = fans.agg(count(lit(1)).as("n_keys"),
      sum(col("fan")).as("n_rows"), max(col("fan")).as("max_fan"))
    fans.groupBy(col("fan")).agg(count(lit(1)).as("n_keys_at_fan"))
      .crossJoin(broadcast(stats))
      .select(col("fan"), col("n_keys_at_fan"),
        round(col("max_fan").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"), 6).as("skew_factor"))
      .orderBy(col("fan"))
  }

  /** Intra-order price-spread histogram: max minus min line price per
    * order, banded into $5000 buckets by integer division — the order
    * heterogeneity profile. Two bounded rollups; cents are exact and the
    * banding is integer `div` (portable; double-divide + cast is not).
    */
  def orderPriceSpread(spark: SparkSession, dir: String): DataFrame = {
    e(spark, dir).table("lineitem")
      .groupBy(col("l_orderkey"))
      .agg((round(max(col("l_extendedprice")) * 100, 0).cast("long") -
        round(min(col("l_extendedprice")) * 100, 0).cast("long"))
        .as("spread_cents"))
      .withColumn("band", expr("spread_cents div 500000"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("band"))
  }

  /** Spearman rank correlation between part size and retail price per
    * part type — the monotone-association twin of the Pearson q196: rank
    * correlation survives outliers and nonlinear (but monotone) pricing
    * curves. Ties get AVERAGE ranks (the textbook treatment):
    * `rank() + (tie_count − 1)/2`, both computable as windows over the
    * per-type partition, so ranks are exact k/2 decimals and the Pearson
    * power sums over them stay reproducible across engines (final
    * division is the only inexact op — the q196 discipline). Groups with
    * zero variance in either variable are excluded (a 0/0 would produce
    * NaN in Spark, ±inf/NULL in DuckDB — not a portable value).
    */
  def spearmanSizePrice(spark: SparkSession, dir: String): DataFrame =
    spearmanOf(e(spark, dir).table("part")
      .select(col("p_type"), col("p_size"), col("p_retailprice")))

  /** df-based core of [[spearmanSizePrice]] — needs
    * (p_type, p_size, p_retailprice).
    */
  def spearmanOf(parts: DataFrame): DataFrame = {
    def avgRank(v: Column): Column =
      rank().over(Window.partitionBy(col("p_type")).orderBy(v)) +
        (count(lit(1)).over(Window.partitionBy(col("p_type"), v)) - 1) / 2.0
    val ranked = parts
      .withColumn("rx", avgRank(col("p_size")))
      .withColumn("ry", avgRank(col("p_retailprice")))
    ranked.groupBy(col("p_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
        col("n") * col("syy") - col("sy") * col("sy") > 0)
      .select(col("p_type"), col("n").cast("long").as("n_parts"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("spearman"))
      .orderBy(col("p_type"))
  }

  /** Per-nation trade balance over the supplier→customer flow matrix:
    * exports (revenue where the nation supplies), imports (where its
    * customers buy), and the net balance — the one-row-per-nation
    * closing view of the q234 gross matrix, in the reference's own
    * domain (`oec.py` is a trade OLAP client). Cents-exact sums; the
    * two directional rollups come from ONE fact pass (conditional
    * aggregation over the unioned role tag), then a bounded per-nation
    * combine.
    */
  def tradeBalance(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val li = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(en.table("supplier")
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(en.table("customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("s_nationkey"), col("c_nationkey"),
        expr("CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) " +
          "AS BIGINT)").as("cents"))
    // one pass: each line contributes to its supplier nation's exports
    // and its customer nation's imports via a 2-row role explode
    val flows = li.select(explode(array(
        struct(col("s_nationkey").as("nk"), lit("x").as("role"),
          col("cents")),
        struct(col("c_nationkey").as("nk"), lit("m").as("role"),
          col("cents")))).as("f"))
      .select(col("f.nk").as("nk"), col("f.role").as("role"),
        col("f.cents").as("cents"))
      .groupBy(col("nk"))
      .agg(sum(when(col("role") === "x", col("cents")).otherwise(0L))
        .as("exp_c"),
        sum(when(col("role") === "m", col("cents")).otherwise(0L))
          .as("imp_c"))
    flows.join(broadcast(en.table("nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("nk") === col("n_nationkey"))
      .select(col("n_name"),
        round(col("exp_c").cast("double") / 100.0, 2).as("exports_usd"),
        round(col("imp_c").cast("double") / 100.0, 2).as("imports_usd"),
        round((col("exp_c") - col("imp_c")).cast("double") / 100.0, 2)
          .as("balance_usd"))
      .orderBy(col("n_name"))
  }

  /** Top-5 brands by revenue with the tail collapsed into 'OTHER' — the
    * dashboard presentation rollup (a pie chart's data contract). The
    * top set is deterministic ((revenue desc, brand) tiebreak, exact
    * cents); 'OTHER' aggregates the rest so the output total always
    * equals the fact total (share column sums to 1).
    */
  def topBrandsWithOther(spark: SparkSession, dir: String,
      k: Int = 5): DataFrame = {
    val en = e(spark, dir)
    val byBrand = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val w = Window.orderBy(col("cents").desc, col("p_brand"))
    val tagged = byBrand // bounded frame (#brands) — window is fine here
      .withColumn("rk", row_number().over(w))
      .withColumn("bucket",
        when(col("rk") <= k, col("p_brand")).otherwise(lit("OTHER")))
    val total = byBrand.agg(sum(col("cents")).as("tot"))
    tagged.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_brands"), sum(col("cents")).as("c"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_brands"),
        round(col("c").cast("double") / 100.0, 2).as("revenue_usd"),
        round(col("c").cast("double") / col("tot").cast("double"), 6)
          .as("revenue_share"))
      .orderBy(col("revenue_usd").desc, col("bucket"))
  }

  /** Brand league-table movers: each brand's revenue rank per year and
    * its year-over-year rank delta (positive = climbed). Ranks are
    * row_number with a (revenue desc, brand) tiebreak inside per-year
    * window partitions (bounded by the brand count); the adjacent-year
    * self-join runs on the tiny (year, brand) rollup. The "who moved"
    * complement of the static ABC classes (q197).
    */
  def brandRankMovers(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val byYear = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), col("p_brand"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val w = Window.partitionBy(col("yr"))
      .orderBy(col("cents").desc, col("p_brand"))
    val ranked = byYear.withColumn("rk", row_number().over(w).cast("long"))
    ranked.select(col("yr").as("prev_yr"), col("p_brand").as("b2"),
        col("rk").as("prev_rank"))
      .join(ranked, col("yr") === col("prev_yr") + 1 &&
        col("p_brand") === col("b2"))
      .select(col("p_brand"), col("yr"), col("prev_rank"), col("rk")
        .as("rank"), (col("prev_rank") - col("rk")).as("rank_delta"))
      .orderBy(col("p_brand"), col("yr"))
  }

  /** Customer value-migration matrix: spend tercile in the first half of
    * the calendar (T1 = top third) versus the second half, with 'none'
    * for customers absent from a half — the CRM churn/upgrade picture
    * ("how many T1s fell to T3, who arrived new"). Terciles are RANK
    * thirds per half via [[Ranks.globalRowNumber]] (distributed
    * positional ids, deterministic (spend, custkey) order — no ntile, no
    * single-partition sort), assignment is integer math. The halves
    * full-outer-join on the customer key — one key-only shuffle each.
    */
  def valueMigration(spark: SparkSession, dir: String,
      splitDate: String = "1998-05-01"): DataFrame = {
    val orders = e(spark, dir).table("orders")
    def half(cond: Column, name: String): DataFrame = {
      val pc = orders.filter(cond)
        .groupBy(col("o_custkey"))
        .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
          .as("cents"))
      Ranks.globalRowNumber(pc,
        Seq(col("cents").desc, col("o_custkey")), "rk", Some("n"))
        .select(col("o_custkey").as(s"ck_$name"),
          concat(lit("T"),
            (expr("CAST((rk - 1) * 3 div n AS INT)") + 1).cast("string"))
            .as(s"t_$name"))
    }
    val h1 = half(expr(s"o_orderdate < TIMESTAMP '$splitDate'"), "h1")
    val h2 = half(expr(s"o_orderdate >= TIMESTAMP '$splitDate'"), "h2")
    h1.join(h2, col("ck_h1") === col("ck_h2"), "full")
      .select(coalesce(col("t_h1"), lit("none")).as("tier_h1"),
        coalesce(col("t_h2"), lit("none")).as("tier_h2"))
      .groupBy(col("tier_h1"), col("tier_h2"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("tier_h1"), col("tier_h2"))
  }

  /** Repeat-purchase rate by first-order size band: does a big first
    * basket predict retention? Each customer's FIRST order (min by
    * (date, orderkey) — unique tiebreak) is banded into $50k buckets by
    * integer cents division; per band: customers, share who ordered
    * again, and the mean number of follow-up orders. One customer-keyed
    * rollup; the band rollup is bounded.
    */
  def repeatRateByFirstOrder(spark: SparkSession, dir: String): DataFrame = {
    val perCust = e(spark, dir).table("orders")
      .select(col("o_custkey"),
        struct(col("o_orderdate"), col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
          .as("o"))
      .groupBy(col("o_custkey"))
      .agg(min(col("o")).getField("cents").as("first_cents"),
        count(lit(1)).as("n_orders"))
    perCust
      .withColumn("band", expr("first_cents div 5000000"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(when(col("n_orders") > 1, 1.0).otherwise(0.0)) /
          count(lit(1)), 6).as("repeat_rate"),
        round(avg(col("n_orders") - 1), 6).as("avg_followups"))
      .orderBy(col("band"))
  }

  /** Exact Gini coefficient of part revenue per brand — the per-group
    * concentration twin of the global Lorenz table (q243): is a brand's
    * revenue spread across its parts or carried by one SKU. Closed-form
    * rank formula `(2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)` over cents-exact
    * revenues with a deterministic (revenue, partkey) tiebreak; every
    * term is BIGINT until the final division. Ranks are per-brand
    * windows (bounded partitions), never a global sort.
    */
  def brandGini(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perPart = en.table("lineitem")
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("cents"), col("p_partkey"))
    perPart
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("cents")).as("sx"), sum(col("i") * col("cents")).as("six"))
      .select(col("p_brand"), col("n_parts"),
        round((lit(2.0) * col("six").cast("double") -
          (col("n_parts") + 1).cast("double") * col("sx").cast("double")) /
          (col("n_parts").cast("double") * col("sx").cast("double")), 6)
          .as("gini"))
      .orderBy(col("p_brand"))
  }

  /** Neyman optimal sampling allocation across order-priority strata:
    * share ∝ N_h·σ_h (big AND volatile strata get the samples), with the
    * concrete allocation for a 1000-row audit budget — the
    * survey-statistics complement of the √-count allocation (q218).
    * Moments come from cents-exact BIGINT power sums; σ is population
    * std. One bounded rollup, one broadcast-back of the denominator.
    */
  def neymanAllocation(spark: SparkSession, dir: String,
      budget: Int = 1000): DataFrame = {
    // first moment stays BIGINT-exact; the SECOND moment must be double —
    // cents² sums cross 2⁶³ past ~50k rows (and the outputs that depend
    // on it are rounded coarsely enough that ulp drift cannot show)
    val strata = e(spark, dir).table("orders")
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_h"), sum(col("cents")).as("sx"),
        sum(col("cents").cast("double") * col("cents").cast("double"))
          .as("sxx"))
      .withColumn("sigma", sqrt(col("sxx").cast("double") / col("n_h") -
        (col("sx").cast("double") / col("n_h")) *
          (col("sx").cast("double") / col("n_h"))))
      .withColumn("nh_sigma", col("n_h").cast("double") * col("sigma"))
    val denom = strata.agg(sum(col("nh_sigma")).as("d"))
    strata.crossJoin(broadcast(denom))
      .select(col("o_orderpriority"), col("n_h"),
        round(col("sigma") / 100.0, 2).as("sigma_usd"),
        round(col("nh_sigma") / col("d"), 6).as("neyman_share"),
        expr(s"CAST(round($budget * (nh_sigma / d), 0) AS BIGINT)")
          .as("alloc_rows"))
      .orderBy(col("o_orderpriority"))
  }

  /** Shared customer-revenue decile frame: customers ranked by revenue
    * (exact cents) via [[Ranks.globalRowNumber]] (range-partitioned
    * positional ids — no single-partition sort of the customer frame),
    * cut into deciles by integer math on non-negative operands
    * (`(rk−1)·10 div n` — portable where a float divide is not), with
    * per-decile cents `c`, cumulative cents `cum`, and total `tot`. The
    * only unpartitioned windows run over the 10 decile rows. One decile
    * implementation backs both [[whaleCurve]] and
    * [[revenueConcentration]] — two reports, one plan.
    */
  private def revenueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val perCust = e(spark, dir).table("orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val ranked = Ranks.globalRowNumber(perCust,
      Seq(col("cents").desc, col("o_custkey")), "rk", Some("n_cust"))
    val deciles = ranked
      .withColumn("decile",
        expr("CAST((rk - 1) * 10 div n_cust AS INT)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("c"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    deciles
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
  }

  /** Whale curve: each customer-revenue decile's dollar revenue, revenue
    * share, and cumulative share — "the top 10% of customers carry X% of
    * revenue" in one table. A thin projection over [[revenueDeciles]].
    */
  def whaleCurve(spark: SparkSession, dir: String): DataFrame =
    revenueDeciles(spark, dir)
      .select(col("decile"), col("n_customers"),
        round(col("c").cast("double") / 100.0, 2).as("revenue_usd"),
        round(col("c").cast("double") / col("tot").cast("double"), 6)
          .as("revenue_share"),
        round(col("cum").cast("double") / col("tot").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("decile"))

  /** Laspeyres price index per year: realized unit prices
    * (Σ extendedprice / Σ quantity per part-year) weighted by the BASE
    * year's (1995) quantity basket — "what would 1995's purchases cost
    * at year y's prices", the standard fixed-basket inflation measure.
    * Only parts traded in both the base year and year y enter (the
    * matched basket). Two bounded rollups at (year, part) grain and a
    * base-side broadcast-scale join; the fact scans once. Price and
    * quantity sums follow the cents-exact BIGINT discipline (partial
    * aggregation order cannot perturb them); the only float ops are the
    * per-part unit price and the final index ratio, computed from
    * identical exact integers on both engines.
    */
  def laspeyresPriceIndex(spark: SparkSession, dir: String,
      baseYear: Int = 1995): DataFrame = {
    val en = e(spark, dir)
    val py = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), col("l_partkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
          .as("cents"),
        sum(expr("CAST(round(l_quantity, 0) AS BIGINT)")).as("sq"))
      .withColumn("unit",
        col("cents").cast("double") / 100.0 / col("sq").cast("double"))
    val base = py.filter(col("yr") === baseYear)
      .select(col("l_partkey").as("bpart"), col("unit").as("unit0"),
        col("sq").as("q0"))
    py.join(base, col("l_partkey") === col("bpart"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("unit") * col("q0")).as("num"),
        sum(col("unit0") * col("q0")).as("den"))
      .select(col("yr"), col("n_parts"),
        round(col("num") / col("den"), 6).as("laspeyres_idx"))
      .orderBy(col("yr"))
  }

  /** Theil-T inequality decomposition of customer order revenue by
    * nation: within-nation Theil `T_g = (1/n_g) Σ (x/μ_g)·ln(x/μ_g)`
    * and the between-nation term `s_g·ln(μ_g/μ)` — additive, so
    * `Σ s_g·T_g + Σ between = T_total` (pinned by spec). The
    * concentration complement to Lorenz/Gini (q243): Theil decomposes
    * BY GROUP, answering "is revenue inequality inside nations or
    * across them". Revenue is summed in exact integer cents before any
    * float op; only customers with revenue participate (ln(0) is an
    * engine-divergent boundary — see the q211 lesson). Group stats
    * broadcast back onto the per-customer frame (nations are bounded),
    * so the fact shuffles once at customer grain.
    */
  def theilByNation(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val perCust = en.table("orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .filter(col("cents") > 0)
      .join(en.table("customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(en.table("nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("cents"))
    val perNation = perCust.groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_g"), sum(col("cents")).as("s_g"))
    val global = perNation.agg(sum(col("n_g")).as("n_all"),
      sum(col("s_g")).as("s_all"))
    perCust
      .join(broadcast(perNation), Seq("n_name"))
      .crossJoin(broadcast(global))
      .withColumn("mu_g", col("s_g").cast("double") / col("n_g"))
      .withColumn("t_term", (col("cents").cast("double") / col("mu_g")) *
        log(col("cents").cast("double") / col("mu_g")))
      .groupBy(col("n_name"))
      .agg(max(col("n_g")).as("n_customers"),
        round(max(col("s_g")).cast("double") /
          max(col("s_all")).cast("double"), 6).as("revenue_share"),
        round(sum(col("t_term")) / max(col("n_g")).cast("double"), 6)
          .as("theil_within"),
        round((max(col("s_g")).cast("double") / max(col("s_all"))) *
          log((max(col("s_g")).cast("double") / max(col("n_g"))) /
            (max(col("s_all")).cast("double") / max(col("n_all")))), 6)
          .as("between_term"))
      .orderBy(col("n_name"))
  }

  /** Brown's double exponential smoothing (linear-trend forecast) over
    * the daily revenue series: `s1` = truncated-window EWMA of daily
    * dollars (the q212 form — 7-day lag join with `0.8^k` weights,
    * renormalized over the lags present), `s2` = the same EWMA applied
    * to `s1`, and the one-step-ahead forecast
    * `2·s1 − s2 + (α/(1−α))·(s1 − s2)` with α = 0.2. The recursive
    * textbook form is a sequential scan; the truncated-window form is
    * the same statistic to < 0.8⁷ ≈ 5% tail mass and is embarrassingly
    * parallel — two lag joins over the CALENDAR-grain frame (bounded by
    * span days, not fact rows), which is why it survives 100 TB while a
    * driver-side recursion would not.
    *
    * Portability: at 8-digit daily dollars a 6dp-rounded weighted MEAN
    * needs ~14 exact significant digits — past what an order-dependent
    * double sum guarantees (observed live: a last-ulp flip at sf0.1).
    * So the weights are the EXACT integers `0.8^k·5⁶ = 4^k·5^(6−k)`,
    * both smoothing passes sum pure BIGINTs (order-independent), `s1`
    * requantizes to the integer cents grid before feeding pass two, and
    * the only float ops are the final num/den divisions — the
    * semanticOutliers/q284 exact-sum discipline.
    */
  def brownForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
      .withColumn("dollars", expr("cents div 100"))
      .select(col("day"), col("dollars"))
    // (day, src_day, integer weight 4^k·5^(6-k)) lag probes
    def probes(src: DataFrame): DataFrame = src
      .select(col("day"), explode(sequence(lit(0), lit(6))).as("k"))
      .select(col("day"),
        expr("day - make_interval(0, 0, 0, k)").as("src_day"),
        expr("CAST(round(pow(4, k) * pow(5, 6 - k), 0) AS BIGINT)")
          .as("w"))
    val s1 = probes(daily)
      .join(daily.select(col("day").as("src_day"), col("dollars")),
        "src_day")
      .groupBy(col("day"))
      .agg(sum(col("dollars") * col("w")).as("n1"), sum(col("w")).as("d1"))
      // cents-grid requantization: pass 2 consumes an exact integer
      .withColumn("s1c",
        expr("CAST(round(CAST(n1 AS DOUBLE) / d1 * 100, 0) AS BIGINT)"))
    val s2 = probes(s1)
      .join(s1.select(col("day").as("src_day"), col("s1c")), "src_day")
      .groupBy(col("day"))
      .agg(sum(col("s1c") * col("w")).as("n2"), sum(col("w")).as("d2"))
      .withColumn("s2c",
        expr("CAST(round(CAST(n2 AS DOUBLE) / d2, 0) AS BIGINT)"))
    // every reported value divides an exact integer by a power of 2·5
    // (100, 400) — terminating decimals, so no 6dp round-boundary a
    // half-ulp can flip (2·s1−s2+¼(s1−s2) = (9·s1c−5·s2c)/400 on the
    // cents grid)
    daily.join(s1, "day").join(s2, "day")
      .select(col("day"), col("dollars"),
        (col("s1c").cast("double") / 100).as("s1"),
        (col("s2c").cast("double") / 100).as("s2"),
        ((col("s1c") * 9 - col("s2c") * 5).cast("double") / 400)
          .as("forecast_next"))
      .orderBy(col("day"))
  }

  /** Count-min-sketch frequency contract over brand line counts — the
    * CMS twin of the q38 HLL contract. The registered columns are the
    * EXACT per-brand line counts plus `cms_ok`, a deterministically-true
    * bound check over the LIVE sketch estimate (`est ≥ exact` — CMS
    * never undercounts — and `est ≤ exact + max(2, 3·ε·N)`), so an ANSI
    * oracle hash-checks the whole row while the sketch genuinely runs on
    * the data path. The sketch aggregates map-side into one ~KB binary
    * (width 2/ε × depth ln(1/(1−conf)) counters) — the exact-counts
    * rollup shuffles 25 brand rows, the sketch shuffles ONE — and at
    * 100 TB the sketch is the only side that still fits a dashboard
    * latency budget; the contract is how its error stays audited. The
    * driver-side reads are the sketch itself and the ≤ 25-brand key
    * list: model-state-sized by construction.
    */
  def cmsBrandContract(spark: SparkSession, dir: String,
      eps: Double = 1e-4, conf: Double = 0.99): DataFrame = {
    val en = e(spark, dir)
    val fact = en.table("lineitem").select(col("l_partkey"))
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"))
    val exact = fact.groupBy(col("brand")).agg(count(lit(1)).as("exact_cnt"))
    val skBytes = fact
      .agg(expr(s"count_min_sketch(brand, CAST($eps AS DOUBLE), " +
        s"CAST($conf AS DOUBLE), 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sk = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes))
    val slack = math.max(2L, math.ceil(3 * eps * sk.totalCount()).toLong)
    val brands = exact.select(col("brand")).collect().map(_.getString(0))
    val estimates = {
      val s = spark
      import s.implicits._
      // the SQL aggregate feeds the sketch UTF-8 BYTES (addBinary), so
      // the probe must too — estimateCount(String) hashes differently
      brands.toSeq.map(b => (b, sk.estimateCount(
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        .toDF("brand", "est")
    }
    exact.join(broadcast(estimates), "brand")
      .select(col("brand"), col("exact_cnt"),
        (col("est") >= col("exact_cnt") &&
          col("est") <= col("exact_cnt") + lit(slack)).as("cms_ok"))
      .orderBy(col("brand"))
  }

  /** k-anonymity census over the customer quasi-identifier triple
    * (nation, market segment, account-balance band): the size
    * distribution of QI equivalence classes, plus the re-identification
    * flag (`at_risk` = class smaller than k) — the privacy audit a
    * training-data release pipeline runs before shipping user-derived
    * tables. Balance bands floor exact integer cents (floor-division via
    * `floor(x/…)`, identical on negatives in both engines — truncating
    * int division is NOT). One QI-grain shuffle builds the classes; the
    * census rollup then groups ≤ distinct-class-size rows. At 100 TB the
    * QI rollup is an ordinary combiner-friendly aggregation; nothing
    * here is quadratic in rows.
    */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val classes = e(spark, dir).table("customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)") /
          lit(200000.0)).cast("long").as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("class_size"))
    classes.groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_customers"),
        (col("class_size") < k).as("at_risk"))
      .orderBy(col("class_size"))
  }

  /** Optimizer-stats cardinality audit: the textbook join-size estimate
    * `|A|·|B| / max(ndv(a), ndv(b))` (the uniform-frequency formula a
    * cost-based optimizer computes from table stats) versus the ACTUAL
    * join cardinality, for the two fact joins. On a CLEAN PK–FK join the
    * formula is exact — ndv(pk) = |A| cancels and the estimate collapses
    * to |B| — so ratio = 1.0 is the certificate that (a) the stats the
    * CBO would use are healthy and (b) the FK has no orphans (an orphaned
    * fact key pushes actual below |B| and the ratio above 1); on non-key
    * joins the same ratio exposes the uniformity assumption's
    * skew-blindness (actual/est = 1 + CV² of key frequencies). Inputs
    * are three exact aggregates per audited join (counts, distinct keys,
    * join count) — each a combiner-friendly single pass; the 1-row
    * results cross-join broadcast-free of cost.
    */
  def joinCardinalityAudit(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    def audit(name: String, a: DataFrame, ak: String,
        b: DataFrame, bk: String): DataFrame = {
      val sa = a.agg(count(lit(1)).as("n_a"),
        count_distinct(col(ak)).as("ndv_a"))
      val sb = b.agg(count(lit(1)).as("n_b"),
        count_distinct(col(bk)).as("ndv_b"))
      val actual = a.join(b, col(ak) === col(bk))
        .agg(count(lit(1)).as("actual"))
      sa.crossJoin(broadcast(sb)).crossJoin(broadcast(actual))
        .select(lit(name).as("join_name"), col("n_a"), col("ndv_a"),
          col("n_b"), col("ndv_b"),
          expr("(n_a * n_b) div greatest(ndv_a, ndv_b)").as("estimated"),
          col("actual"),
          round(expr("(n_a * n_b) div greatest(ndv_a, ndv_b)")
            .cast("double") / col("actual").cast("double"), 4).as("ratio"))
    }
    val li = en.table("lineitem")
    audit("orders_lineitem", en.table("orders"), "o_orderkey",
        li, "l_orderkey")
      .unionByName(audit("part_lineitem", en.table("part"), "p_partkey",
        li, "l_partkey"))
      .orderBy(col("join_name"))
  }

  /** Bloom-filter membership contract over the has-orders customer set —
    * the bloom twin of the q38 HLL and q301 CMS contracts. The LIVE
    * bloom (the same `bloom_filter_agg` expression pair q65's runtime
    * filter plants) is built over distinct ordering customers and probed
    * by EVERY customer; the registered columns are the exact partition
    * counts (semi/anti-join ground truth) plus `bloom_ok`, true iff no
    * member probed negative (false negatives are impossible by
    * construction — this is the structural half) and the observed
    * false-positive rate among true negatives stayed under 1% (the
    * filter carries ~33.5 bits per design-point item — 2^25 bits for
    * 1e6 expected keys — so Spark picks k = round(33.5·ln2) = 23 hash
    * functions and the nominal FPP at the FULL design load is ~1e-7;
    * any fixture at or under the design point probes an even emptier
    * filter, so the 1% gate holds with orders-of-magnitude margin at
    * every scale factor up to sf10). At 100 TB the exact counts are
    * two combiner-friendly aggregates and the bloom is ONE ~4 MB row
    * broadcast to the probe side — the contract audits the same filter
    * the join pruning path trusts.
    */
  def bloomMembershipContract(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    val custKeys = en.table("customer").select(col("c_custkey"))
    val orderCust = en.table("orders").select(col("o_custkey")).distinct()
    val bloom = orderCust
      .agg(org.apache.spark.sql.graftbridge.Bridge
        .bloomFilterAgg(col("o_custkey"), 1000000L, 1L << 25).as("__bloom"))
      .scalar()
    val probed = custKeys
      .join(orderCust.withColumnRenamed("o_custkey", "c_custkey")
        .withColumn("__m", lit(1)), Seq("c_custkey"), "left_outer")
      .select(
        coalesce(col("__m"), lit(0)).as("is_member"),
        org.apache.spark.sql.graftbridge.Bridge
          .bloomMightContain(bloom, col("c_custkey")).cast("int").as("hit"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("is_member")).as("n_with_orders"),
        sum(lit(1) - col("is_member")).as("n_without_orders"),
        sum(col("is_member") * col("hit")).as("member_hits"),
        sum((lit(1) - col("is_member")) * col("hit")).as("fp_hits"))
    probed.select(col("n_customers"), col("n_with_orders"),
      col("n_without_orders"),
      (col("member_hits") === col("n_with_orders") &&
        col("fp_hits").cast("double") <=
          greatest(col("n_without_orders").cast("double") * 0.01, lit(1.0)))
        .as("bloom_ok"))
  }

  /** Seasonal-naive forecast accuracy (MASE discipline) over the daily
    * revenue series: per weekday, the lag-7 (same-weekday) forecast's
    * absolute error against the lag-1 naive forecast's — the standard
    * "is there weekly seasonality worth modeling?" audit that gates
    * whether q300's trend smoother needs a seasonal term. Errors are
    * exact integer cents (daily cents are BIGINT sums; lag joins are
    * calendar-grain equi-joins on `day − interval`, never a
    * single-partition window), so both MAE numerators are
    * order-independent; the only float ops are the two final divisions
    * of exact < 2⁵³ integers — bit-identical in any engine — and `mase`
    * < 1 means the seasonal forecast beats the naive one. Calendar
    * grain is bounded by span days at any corpus scale.
    */
  def seasonalMase(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    def lagged(k: Int, as: String): DataFrame = daily.select(
      expr(s"day + make_interval(0, 0, 0, $k)").as("day"),
      col("cents").as(as))
    daily
      .join(lagged(7, "cents_w"), "day")
      .join(lagged(1, "cents_d"), "day")
      .groupBy(pmod(datediff(col("day").cast("date"),
        lit("1970-01-01").cast("date")) + 4, lit(7)).cast("long")
        .as("weekday"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("cents") - col("cents_w"))).as("abs_err_seasonal_cents"),
        sum(abs(col("cents") - col("cents_d"))).as("abs_err_naive_cents"))
      .select(col("weekday"), col("n_days"),
        col("abs_err_seasonal_cents"), col("abs_err_naive_cents"),
        // a constant series makes the naive MAE 0 — pin the boundary
        // (NaN/Inf render engine-specifically, the q270 lesson)
        when(col("abs_err_naive_cents") > 0,
          round(col("abs_err_seasonal_cents").cast("double") /
            col("abs_err_naive_cents").cast("double"), 6)).as("mase"))
      .orderBy(col("weekday"))
  }

  /** Classical-decomposition seasonal profile (STL-lite) of the daily
    * revenue series: trend = CENTERED 7-day moving average (the
    * textbook first step of STL/classical decomposition — symmetric,
    * unlike q300's trailing forecast smoother), seasonal = per-weekday
    * mean of the detrended series, residual = what's left. The output
    * is the weekday seasonal index plus each weekday's mean absolute
    * residual — "how big is the weekly cycle, and how noisy is each
    * day once trend and season are removed".
    *
    * Exactness: the centered window keeps INTEGER cents (`det7 =
    * 7·cents − Σ₇cents` is the detrended value scaled by 7, exact
    * BIGINT), the seasonal index is one division of exact sums, and
    * only the residual pass sums doubles (rounded 2dp, the repo-wide
    * float-sum contract). The global window is CALENDAR-grain — ≤ span
    * days at any corpus scale (allowlisted with its bound); the fact
    * table shuffles once into the daily rollup.
    */
  def stlWeekdayDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val daily = e(spark, dir).table("orders")
      .groupBy(date_trunc("day", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val det = daily
      .withColumn("t7", sum(col("cents")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .filter(col("n7") === 7)
      .withColumn("det7", col("cents") * 7 - col("t7"))
      .withColumn("weekday", pmod(datediff(col("day").cast("date"),
        lit("1970-01-01").cast("date")) + 4, lit(7)).cast("long"))
    val seasonal = det.groupBy(col("weekday"))
      .agg(count(lit(1)).as("n_days"), sum(col("det7")).as("s_det7"))
      .withColumn("seasonal_d",
        col("s_det7").cast("double") / 7 / col("n_days") / 100)
    det.join(broadcast(seasonal), "weekday")
      .groupBy(col("weekday"))
      .agg(count(lit(1)).as("n_days"),
        // 6dp: the exact decimal of s/(700·n) terminates well before
        // 6 digits whenever it terminates at all, so the rounded value
        // sits ON the grid, never the half-grid (the q164 lesson)
        round(max(col("seasonal_d")), 6).as("seasonal"),
        round(sum(abs(col("det7").cast("double") / 700 -
          col("seasonal_d"))) / count(lit(1)), 2).as("mean_abs_residual"))
      .orderBy(col("weekday"))
  }

  /** Fulfillment-latency trend by order month: mean and p95 days from
    * order to ship plus the share of lines shipping past a 30-day SLA —
    * the monthly operations trend a supply-chain review reads, where
    * q186 gives the per-priority SNAPSHOT percentiles. Day deltas are
    * exact non-negative integers, the sum is BIGINT, the mean is one
    * division of exact integers, and p95 uses the engine-shared exact
    * interpolated percentile (the q45 contract). One fact pass,
    * calendar-month output.
    */
  def orderCycleByMonth(spark: SparkSession, dir: String): DataFrame = {
    val en = e(spark, dir)
    en.table("lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("d", datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")).cast("long"))
      .groupBy(date_trunc("month", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("d")).as("ship_days"),
        round(expr("percentile(d, 0.95)"), 4).as("p95_days_to_ship"),
        sum(when(col("d") > 30, 1L).otherwise(0L)).as("n_late30"))
      .select(col("month"), col("n_lines"),
        round(col("ship_days").cast("double") / col("n_lines"), 6)
          .as("mean_days_to_ship"),
        col("p95_days_to_ship"),
        round(col("n_late30").cast("double") / col("n_lines"), 6)
          .as("late30_rate"))
      .orderBy(col("month"))
  }

  /** Price–volume bridge (PVM decomposition) of per-brand revenue
    * between two years: `Δrevenue = price_effect + volume_effect` with
    * `price_effect = (unit₁ − unit₀)·q₁` and `volume_effect =
    * unit₀·(q₁ − q₀)` — the management-accounting twin of q284's
    * Laspeyres index (which answers "what did prices do"; the bridge
    * answers "which brands' revenue moved because of price vs because
    * of volume", and the two effects reconcile to the exact delta by
    * construction). Revenue and quantity aggregate as exact BIGINTs at
    * (brand, year) grain — one combiner-friendly fact pass, 25-brand
    * output — and each effect is a product/difference of the SAME
    * exact-integer-derived doubles in both engines, so the 2dp rounding
    * cannot diverge. Brands are bounded; the dim broadcasts.
    */
  def priceVolumeMix(spark: SparkSession, dir: String,
      baseYear: Int = 1995): DataFrame = {
    val en = e(spark, dir)
    val by = en.table("lineitem")
      .join(en.table("orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(en.table("part")
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .filter(year(col("o_orderdate")).isin(baseYear, baseYear + 1))
      .groupBy(col("p_brand"),
        (year(col("o_orderdate")) === baseYear).as("is_base"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)"))
          .as("cents"),
        sum(expr("CAST(round(l_quantity, 0) AS BIGINT)")).as("qty"))
    val b0 = by.filter(col("is_base"))
      .select(col("p_brand"), col("cents").as("r0"), col("qty").as("q0"))
    val b1 = by.filter(!col("is_base"))
      .select(col("p_brand"), col("cents").as("r1"), col("qty").as("q1"))
    b0.join(b1, "p_brand")
      .select(col("p_brand"),
        round(col("r0").cast("double") / 100, 2).as("rev0"),
        round(col("r1").cast("double") / 100, 2).as("rev1"),
        round((col("r1") - col("r0")).cast("double") / 100, 2).as("delta"),
        round((col("r1").cast("double") / col("q1") -
          col("r0").cast("double") / col("q0")) * col("q1") / 100, 2)
          .as("price_effect"),
        round(col("r0").cast("double") / col("q0") *
          (col("q1") - col("q0")) / 100, 2).as("volume_effect"))
      .orderBy(col("p_brand"))
  }
}
