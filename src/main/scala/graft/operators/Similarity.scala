package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over an embedding column
  * (`array<float>`), plus embedding-cosine near-duplicate detection.
  *
  * Scale design:
  *   - cosine/dot/norm are zip_with + aggregate higher-order functions —
  *     codegen'd per-row math, no UDF;
  *   - brute-force top-k is score -> TakeOrderedAndProject (per-partition
  *     heap of k, merged on the driver): the baseline, exact, one scan;
  *   - the scale path is random-hyperplane LSH: a per-row bucket key from
  *     sign bits of dot products with deterministic pseudo-random +-1
  *     planes; kNN/near-dup work is then confined to bucket-local joins
  *     (shuffle keyed by bucket, never a cross join);
  *   - multi-probe: querying with all Hamming-1 neighbors of the query's
  *     bucket key trades b extra lookups for recall;
  *   - probe queries go through STORAGE-PARTITIONED index layouts
  *     ([[lshIndex]]/[[ivfIndex]]): the corpus is written Hive-partitioned
  *     by bucket/cell id, so a probe's IN-filter prunes partitions and
  *     reads only the probed directories — at 100 TB the other
  *     nlist - nprobe cells are never listed, let alone scanned.
  */
object Similarity {

  /** Default LSH table count shared by [[lshIndex]]/[[lshTopK]] and the
    * q106 build-manifest completeness check (total rows = tables × corpus).
    */
  val DefaultLshTables = 4

  /** Dot product composed from built-in HOFs (element-wise in double — a
    * float multiply would diverge from ANSI engines' low bits). Reference
    * implementation: the native expressions below are the hot path (the
    * HOF form evaluates interpreted per element — measured 100x slower on
    * a 4M-pair scan).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** Dot product — native fused Catalyst expression. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotNative(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity composed from built-in HOFs (reference impl;
    * bit-identical to the native expression — see VectorSpec).
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = sqrt(dotHof(a, a)) * sqrt(dotHof(b, b))
    when(d === 0.0d, lit(0.0d)).otherwise(dotHof(a, b) / d)
  }

  /** Cosine similarity (0 where either vector is all-zero) — native fused
    * Catalyst expression with whole-stage codegen.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineNative(a, b)

  /** Exact brute-force top-k by cosine against one query vector (taken
    * from the corpus itself by id). Single scan + TakeOrderedAndProject.
    */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      cosineFn: (Column, Column) => Column = cosine): DataFrame = {
    val q = broadcast(emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb")))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(q)
      .select(col("vec_id"), col("label"),
        round(cosineFn(col("embedding"), col("q_emb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact kNN join: for every query row (small, broadcast), the top-k
    * corpus neighbors — window row_number over the scored cross product.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Hard-negative mining — the contrastive-training data primitive: for
    * every query vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label (similar-but-wrong examples are what a contrastive
    * or reranker objective needs; random negatives are too easy).
    * Same plan shape as [[knnJoin]] — broadcast queries, one scored scan,
    * per-query window top-k — with the label-inequality predicate applied
    * before scoring so mismatched pairs never reach the ranker. This
    * exact form is the oracle-gated baseline; [[ivfHardNegatives]] is the
    * indexed scale path (same output in its exhaustive regime, q114).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries.select(col("vec_id").as("q_id"),
        col("label").as("q_label"), col("embedding").as("q_emb"))))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"), col("label").as("neg_label"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("neg_label"),
        col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Deterministic pseudo-random +-1 hyperplane component for (plane p,
    * dim d): the low bit of md5("p,d") — reproducible across sessions
    * AND across engines (the portable-hash discipline of
    * [[graft.functions.TextAnalysis.portableHash60]]): any ANSI engine
    * derives the identical plane family as
    * `CAST('0x' || substr(md5(p || ',' || d), 1, 16) AS UBIGINT) & 1`,
    * which is what puts the LSH bucket keys — and with them q29's probe
    * and q30's candidate generation — on the cross-engine oracle surface.
    * An engine-private hash would leave them rows-only checkable.
    */
  private def planeComponent(p: Int, d: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p,$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // low bit of the big-endian first word = low bit of digest byte 7
    if ((dig(7) & 1) == 1) 1.0 else -1.0
  }

  /** LSH bucket key: `planes` sign bits from dot products with the +-1
    * hyperplanes. Pure per-row expression over literal plane vectors.
    */
  def lshKey(emb: Column, planes: Int, dim: Int): Column =
    lshKeyOffset(emb, 0, planes, dim)

  /** As [[lshKey]] but starting at plane index `offset` — gives each LSH
    * table an independent plane family.
    */
  def lshKeyOffset(emb: Column, offset: Int, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(d => lit(planeComponent(offset + p, d))): _*)
      when(dot(emb, plane) >= 0.0d, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Sign-bit count that keeps expected LSH bucket occupancy near
    * `targetOccupancy` for an `n`-vector corpus: `ceil(log2(n/occ))`,
    * floored at 6 (the fixture/oracle regime — corpora ≤ ~1000 vectors
    * keep the exact 6-bit keys the q30/q118 SQL oracles hard-code) and
    * capped at 20 (1M buckets/table; past that, per-bucket work is
    * already O(occ²) ≈ constant and more bits only cost recall). This is
    * THE near-dup-mining scale lever: with FIXED bits the bucket space
    * is bounded, occupancy grows linearly with the corpus, and
    * within-bucket pair candidates grow quadratically (the round-12 soak
    * measured q30 at 15.7× wall for 10× vectors on fixed 6-bit tables);
    * occupancy-targeted bits keep candidates ~linear in the corpus.
    */
  def autoLshBits(n: Long, targetOccupancy: Int = 16): Int = {
    val auto = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) /
        math.log(2.0)).toInt
    math.min(20, math.max(6, auto))
  }

  /** Approximate near-dup pairs via multi-table random-hyperplane LSH:
    * `tables` independent hash tables of `bitsPerTable` sign bits each; a
    * pair is a candidate if it collides in ANY table (recall
    * 1-(1-p^bits)^tables with p = 1-theta/pi), then exact-cosine verified
    * against `threshold`. Shuffle carries (table_id, bucket, vec_id) —
    * never a cross join; `maxBucketSize` caps degenerate buckets, and
    * `bitsPerTable = 0` (the default) sizes the tables to the corpus via
    * [[autoLshBits]] so occupancy — and with it candidate volume per
    * vector — stays constant as the corpus grows. NOTE the auto path
    * runs a `count()` ACTION at plan-construction time (bits shape the
    * plan, so laziness is impossible); it is one cheap scan next to the
    * bucketing+verify pipeline, and the memoized [[lshNearDupPairsShared]]
    * entry points were already construction-eager (localCheckpoint).
    * Callers that know the corpus size can pass explicit bits to stay
    * lazy.
    *
    * Oracle caveat (q30): the md5-bit planes make the bucket keys and
    * candidate join exactly reproducible in SQL — UNLESS a bucket exceeds
    * `maxBucketSize`, where [[Dedup.bucketPairs]] degrades to its linear
    * star pattern while the all-pairs oracle does not (same caveat as
    * q27; see [[Dedup.simhashPairs]]). The auto-sized bit count is 6 at
    * every oracle fixture (≤1000 vectors), so the hard-coded 6-bit SQL
    * stays exact there.
    */
  def lshNearDupPairs(
      emb: DataFrame,
      threshold: Double = 0.3,
      tables: Int = 4,
      bitsPerTable: Int = 0,
      dim: Int = 64,
      maxBucketSize: Int = 2000): DataFrame = {
    val bits =
      if (bitsPerTable > 0) bitsPerTable else autoLshBits(emb.count())
    val keys = array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshKeyOffset(col("embedding"), t * bits, bits, dim).as("bucket"))
    }: _*)
    // Par.ensure: the hyperplane keying (tables × bits dot products per
    // vector) is the pipeline's hot map kernel and would otherwise run
    // at the SCAN's width — the embeddings table arrives as 1-2 parquet
    // row groups even at the 100× fixture (49 MB, 2 row groups → 2
    // working tasks behind 13 byte-splits; measured 66.6 s of q118's
    // 105 s x100 cold pass in that one stage). The q309 guard, same as
    // every text pipeline's shingle kernel (Dedup.scala).
    val keyed = Par.ensure(emb.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), explode(keys).as("k"))
      .select(col("vec_id"), col("k.tbl").as("tbl"), col("k.bucket").as("bucket"))
    // one aggregation per bucket (see Dedup.bucketPairs): sigs computed
    // once, single shuffle, size-filter cap — no self-join, no window
    val cand = Dedup.bucketPairs(keyed, Seq("tbl", "bucket"), "vec_id", maxBucketSize)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b")), "vec_b")
      // threshold the UNROUNDED cosine; round only for display (the same
      // boundary-correctness fix as Dedup.verifyJaccard)
      .withColumn("__c", cosine(col("e_a"), col("e_b")))
      .filter(col("__c") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("__c"), 4).as("cos_sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ------------- storage-partitioned ANN index layouts -------------
  //
  // The POINT of an inverted-file / bucketed ANN index at 100 TB is that
  // a probe does NOT read the other nlist-1 cells. A filter over an
  // in-memory bucket column still scans the whole corpus; writing the
  // keyed corpus Hive-partitioned by cell/bucket id turns the probe's
  // id filter into PartitionFilters — Spark lists and reads ONLY the
  // nprobe matching directories (plan-asserted in IvfSpec).

  /** One IVF index layout: the corpus written cid-partitioned, plus its
    * trained coarse quantizer (model state: nlist x dim doubles).
    */
  final case class IvfIndex(path: String, centroids: Array[(Int, Array[Double])])

  // Index layouts are session-lifetime, one per (session, dataset,
  // index parameters) like Dedup.pairsMemo: build once (a full-corpus
  // write — the expensive, amortized step), probe many. The parameters
  // MUST be part of the key: two queries over the same dataset with
  // different nlist/planes are different physical layouts, and silently
  // sharing one turns an exhaustive probe into a partial one. The
  // caller-supplied dataset key is trusted; invalidateIndexes drops all
  // entries (e.g. after a dataset rewrite, or per bench pass so timings
  // include the build).
  private val ivfMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int, Int), IvfIndex]
  private val lshMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Int, Int, Int), LshLayout]

  def invalidateIndexes(spark: org.apache.spark.sql.SparkSession): Unit = {
    ivfMemo.keys.filter(_._1 eq spark).foreach(ivfMemo.remove)
    lshMemo.keys.filter(_._1 eq spark).foreach(lshMemo.remove)
    embPairsMemo.keys.filter(_._1 eq spark).foreach { k =>
      embPairsMemo.remove(k).foreach { df =>
        df.queryExecution.logical.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Session-lifetime memo for the verified embedding near-dup pair
    * frame — the embedding-space twin of [[Dedup.minhashPairsShared]]:
    * both the pair query (q30) and the semantic keep-list (q118) consume
    * the same frame, and recomputing it means re-bucketing and re-scoring
    * the whole embedding store per consumer. The frame is one row per
    * verified pair (tiny next to the corpus), so it is localCheckpoint'ed;
    * [[invalidateIndexes]] releases the blocks deterministically. Only
    * the default-parameter pipeline is memoized (key = session, dataset,
    * threshold); custom bandings call [[lshNearDupPairs]] directly.
    */
  private val embPairsMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, Double), DataFrame]

  def lshNearDupPairsShared(emb: DataFrame, datasetKey: String,
      threshold: Double = 0.3): DataFrame =
    embPairsMemo.getOrElseUpdate((emb.sparkSession, datasetKey, threshold),
      lshNearDupPairs(emb, threshold).transform(Scratch.stageShared))

  /** Root directory for index layouts: `spark.graft.indexDir` if set
    * (on a cluster, point it at the shared filesystem — HDFS/S3 — so
    * probes from any executor see the layout), else the local tmpdir.
    * All path handling below goes through the Hadoop FileSystem API, so
    * whatever filesystem the root resolves to is the one probed.
    */
  private def indexRoot(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.get("spark.graft.indexDir",
      System.getProperty("java.io.tmpdir"))

  private def indexPath(spark: org.apache.spark.sql.SparkSession,
      kind: String, datasetKey: String): String = {
    // basename of the dataset key by pure string ops (the key is an
    // opaque identifier, often a path — never touch the local FS for it)
    val base = datasetKey.split('/').filter(_.nonEmpty).lastOption.getOrElse("ds")
    s"${indexRoot(spark)}/graft_${kind}_idx_" +
      s"${spark.sparkContext.applicationId}_$base"
  }

  /** An LSH layout on disk plus the directory-granularity shift its
    * partition keys were written with (probes must shift identically).
    */
  final case class LshLayout(path: String, shift: Int)

  /** Directory-granularity shift for an LSH layout over an `n`-vector
    * corpus: partition directories key on `bucket >> shift`, sized so a
    * directory holds ~`dirOccupancy` rows per table instead of a fixed
    * `2^planes` fan-out. The EXACT bucket stays a data column, so probe
    * semantics (and the q29/q151 oracles) are untouched — only the
    * physical pruning granularity coarsens, and only at SMALL corpora:
    * at `n ≥ dirOccupancy · 2^planes` the shift is 0 and every bucket
    * gets its own directory, the 100 TB shape. This is the layout twin
    * of [[autoLshBits]]: fixed fan-out made q106/q154 pay ~1024
    * file-commit round-trips for a 2000-vector fixture (measured ~5-6 s,
    * pure metadata) while a real corpus amortizes the same directories
    * over millions of rows.
    */
  def lshDirShift(n: Long, planes: Int, dirOccupancy: Int = 64): Int = {
    val dirBits = math.ceil(
      math.log(math.max(1.0, n.toDouble / dirOccupancy)) /
        math.log(2.0)).toInt
    math.max(0, planes - math.max(0, math.min(planes, dirBits)))
  }

  /** Build (once per session+dataset+params) the MULTI-TABLE bucket-
    * partitioned LSH index: `tables` independent plane families (the same
    * per-table offsets [[lshNearDupPairs]] uses), the corpus written once
    * per table, Hive-partitioned by (tbl, bucket-prefix) with the
    * occupancy-sized [[lshDirShift]] granularity (exact bucket kept as a
    * data column for the probe's residual filter). A single-table probe's
    * recall is capped by one family's S-curve; independent tables multiply
    * the miss probabilities, so a probe reading at most tables×(planes+1)
    * directories — still O(1) of the corpus — recovers what one table at
    * the same read bound cannot. The layout is `tables`× the corpus: the
    * standard LSH trade, paid once at build, amortized over probes. The
    * sizing `count()` is a construction-time action over the corpus —
    * one cheap scan next to the layout write, the [[lshNearDupPairs]]
    * auto-bits discipline.
    */
  def lshIndex(emb: DataFrame, datasetKey: String,
      planes: Int = 8, dim: Int = 64, tables: Int = DefaultLshTables): LshLayout =
    lshMemo.getOrElseUpdate((emb.sparkSession, datasetKey, tables, planes, dim), {
      val path = indexPath(emb.sparkSession, s"lsh${tables}t${planes}x$dim", datasetKey)
      val shift = lshDirShift(emb.count(), planes)
      graft.sources.Sink.writePartitioned(
        lshLayoutRows(emb, planes, dim, tables, shift), path, Seq("tbl", "bpfx"))
      LshLayout(path, shift)
    })

  /** The banded layout relation both the build and the incremental
    * append write: every vector exploded into its `tables` (tbl, bucket)
    * keys, repartitioned by the partition columns — without that, every
    * task writes one file per directory it happens to hold
    * (tasks × tables × buckets tiny files); with it each directory gets
    * one writer set and AQE coalesces the small shuffle.
    */
  private def lshLayoutRows(emb: DataFrame, planes: Int, dim: Int,
      tables: Int, shift: Int): DataFrame = {
    val keys = array((0 until tables).map { t =>
      struct(lit(t).as("tbl"),
        lshKeyOffset(col("embedding"), t * planes, planes, dim).as("bucket"))
    }: _*)
    emb.select(col("vec_id"), col("label"), col("embedding"),
      explode(keys).as("k"))
      // bucket is a DATA column (the probe's exact residual filter,
      // parquet-pushed); bpfx is the occupancy-sized partition key
      .select(col("vec_id"), col("label"), col("embedding"),
        col("k.tbl").as("tbl"), col("k.bucket").as("bucket"),
        shiftright(col("k.bucket"), shift).as("bpfx"))
      // EXPLICIT partition count: a column-only repartition is an
      // AQE-coalescible shuffle, and the layout frame is small in BYTES
      // while fanning out to tables × 2^planes directories — AQE merges
      // it to ~one partition and a single task then writes every
      // directory's file serially (measured 9.5s -> 3.4s at sf0.1 for
      // the delta append when pinned). The count pins one writer SET per
      // directory (hash clustering is by the partition cols either way);
      // file count is unchanged.
      .repartition(layoutParallelism(emb), col("tbl"), col("bpfx"))
  }

  /** Writer parallelism for layout builds: the session's shuffle
    * parallelism — partition dirs spread across that many concurrent
    * writer tasks instead of whatever AQE coalesces a small-byte shuffle
    * down to.
    */
  private def layoutParallelism(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt

  /** Incremental LSH index maintenance — the bucketed-layout twin of
    * [[ivfIndexIncremental]], and the EASIER of the two: LSH keys are
    * pure functions of the vector (no trained model to freeze or drift),
    * so an append is definitionally exact — the appended layout is
    * byte-for-byte the layout a full rebuild over base ∪ delta would
    * produce, and probe recall is untouched (no quantizer staleness
    * caveat at all). Delta rows band with the SAME key expressions and
    * append into their (tbl, bucket) directories; memoized under a
    * derived key, converging across memo/file interleavings exactly as
    * the IVF form does.
    *
    * Cost shape: the layout root holds two SUBTREES — `gen=base` (the
    * 80% base, written once per JVM and disk-memoized behind its
    * `_SUCCESS` marker) and `gen=delta` (Overwrite-rewritten on every
    * cold call, so re-calls and post-invalidation calls converge
    * idempotently — the delta can never double-append). The split
    * means the STEADY-STATE incremental cost — what an append onto an
    * existing index costs, the number that matters for index
    * maintenance at scale — is the only thing a warm-JVM rebuild pays:
    * the in-memory memo is cleared per bench pass (timing policy), but
    * the base subtree survives on disk, so q154's per-pass cost is the
    * delta append alone while q106 keeps pricing the full build. The
    * disk memo is applicationId-scoped (fresh per JVM) and keyed by
    * `datasetKey`, which identifies dataset CONTENT — rewriting a
    * dataset in-place under a live key is out of contract here exactly
    * as it is for the in-memory memos.
    */
  def lshIndexIncremental(base: DataFrame, delta: DataFrame,
      datasetKey: String, planes: Int = 8, dim: Int = 64,
      tables: Int = DefaultLshTables): LshLayout =
    lshMemo.getOrElseUpdate(
      (base.sparkSession, s"${datasetKey}_incr", tables, planes, dim), {
        val spark = base.sparkSession
        val path = indexPath(spark, s"lsh${tables}t${planes}x$dim",
          s"${datasetKey}_incr")
        // Shift is sized on the BASE corpus (the 80% bulk) so a
        // post-invalidation warm call — where only the delta re-writes —
        // recomputes the SAME granularity the disk-memoized base subtree
        // was laid out with (the base count is stable per JVM by the
        // same dataset-content contract the memo key carries).
        val shift = lshDirShift(base.count(), planes)
        val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val baseDone =
          new org.apache.hadoop.fs.Path(s"$path/gen=base/_SUCCESS")
        if (!fs.exists(baseDone))
          graft.sources.Sink.writePartitioned(
            lshLayoutRows(base, planes, dim, tables, shift),
            s"$path/gen=base", Seq("tbl", "bpfx"))
        graft.sources.Sink.writePartitioned(
          lshLayoutRows(delta, planes, dim, tables, shift),
          s"$path/gen=delta", Seq("tbl", "bpfx"))
        LshLayout(path, shift)
      })

  /** Top-k probe through the incrementally-appended LSH layout: exactly
    * [[lshTopK]]'s multi-probe read against the appended path. Because
    * the appended layout equals the rebuilt one, this is q29's relation
    * over base ∪ delta — the same oracle gates both (q151).
    */
  def lshIncrementalTopK(base: DataFrame, delta: DataFrame, queryId: Long,
      k: Int, planes: Int = 8, dim: Int = 64,
      tables: Int = DefaultLshTables, datasetKey: String): DataFrame =
    lshProbeTopK(
      lshIndexIncremental(base, delta, datasetKey, planes, dim, tables),
      base.unionByName(delta), queryId, k, planes, dim, tables)

  /** Bucketed ANN top-k through the multi-table LSH index: in EACH table
    * the query's bucket plus all Hamming-1 neighbors (multi-probe) become
    * a partition-pruning filter on the layout — the scan reads at most
    * tables × (planes + 1) bucket directories, never the corpus.
    * Candidates found by several tables are deduped by vec_id before
    * scoring. Approximate; recall grows with both probes and tables.
    */
  def lshTopK(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      planes: Int = 8,
      dim: Int = 64,
      tables: Int = DefaultLshTables,
      datasetKey: String): DataFrame =
    lshProbeTopK(lshIndex(emb, datasetKey, planes, dim, tables),
      emb, queryId, k, planes, dim, tables)

  /** Multi-probe read against an already-built LSH layout — the shared
    * probe path of [[lshTopK]] and [[lshIncrementalTopK]]. `lookup` only
    * supplies the query vector and its buckets (1-row driver fetch).
    */
  private def lshProbeTopK(layout: LshLayout, lookup: DataFrame, queryId: Long,
      k: Int, planes: Int, dim: Int, tables: Int): DataFrame = {
    val path = layout.path
    val emb = lookup
    // 1-row driver fetch: the query vector and its per-table buckets
    // (computed by the SAME column expressions the index used)
    val keyCols = (0 until tables).map(t =>
      lshKeyOffset(col("embedding"), t * planes, planes, dim).as(s"b$t"))
    val q = emb.filter(col("vec_id") === queryId)
      .select((col("embedding") +: keyCols): _*)
      .collect()
    require(q.nonEmpty, s"lshTopK: query vec_id=$queryId not found")
    val admitted = (0 until tables).flatMap { t =>
      val b = q.head.getLong(1 + t)
      (b +: (0 until planes).map(p => b ^ (1L << p))).distinct.map(t -> _)
    }
    val probeFilter = admitted.groupBy(_._1).map { case (t, bs) =>
      col("tbl") === t && col("bucket").isInCollection(bs.map(_._2))
    }.reduce(_ || _)
    // List ONLY the probed directories (basePath keeps the partition
    // columns): the layout has tables × 2^planes directories, and a
    // full read.parquet(path) pays partition DISCOVERY over all of them
    // before pruning drops the rest — at scale that listing, not the
    // read, is the probe's cost. Missing dirs = empty buckets, skipped.
    // Existence goes through the Hadoop FileSystem API: the index root
    // may live on HDFS/S3 (spark.graft.indexDir) — a local-only check
    // there would see nothing and silently return an empty probe.
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      emb.sparkSession.sparkContext.hadoopConfiguration)
    // Incremental layouts hold gen=base/gen=delta subtrees (see
    // lshIndexIncremental); plain layouts put tbl=… at the root. ONE
    // root listing discovers which shape this is — the probed-dir count
    // stays tables × (planes + 1) × generations, still O(1) of corpus.
    val genDirs = {
      val root = new org.apache.hadoop.fs.Path(path)
      if (fs.exists(root))
        fs.listStatus(root).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("gen="))
      else Seq.empty
    }
    val subRoots = if (genDirs.isEmpty) Seq("") else genDirs.map(g => s"$g/")
    // Directory keys are the occupancy-sized bucket PREFIXES the layout
    // was written with (lshDirShift); Hamming-1 siblings on the shifted
    // low bits collapse into one directory, so the listed-dir count is
    // AT MOST tables × (planes + 1) × generations. The exact-bucket
    // residual stays in probeFilter as a parquet-pushed data filter.
    val probeDirs = admitted
      .map { case (t, b) => (t, b >> layout.shift) }.distinct
      .flatMap { case (t, p) =>
        subRoots.map(g => s"$path/${g}tbl=$t/bpfx=$p") }
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val qLit = array(embAsDoubles(q.head, 0).map(lit).toIndexedSeq: _*)
    val indexed =
      if (probeDirs.isEmpty) emb.sparkSession.read.parquet(path).filter(lit(false))
      else emb.sparkSession.read.option("basePath", path).parquet(probeDirs: _*)
    indexed
      .filter(probeFilter && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"), col("embedding"))
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), qLit), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Driver-side embedding fetch tolerant of BOTH physical encodings —
    * list<float> and list<double> — the events-ts dual-encoding lesson
    * applied to every collected query vector / training sample: a fixture
    * generation that widens the element type must not ClassCastException
    * the probe path. Widening is exact either way.
    */
  private def embAsDoubles(r: org.apache.spark.sql.Row, field: Int): Array[Double] =
    r.getSeq[Any](field).map {
      case f: Float => f.toDouble
      case d: Double => d
      case x => throw new IllegalArgumentException(
        s"embedding element is ${if (x == null) "null" else x.getClass.getName}, " +
          "expected float/double")
    }.toArray

  /** K-means coarse quantizer for [[ivfTopK]], trained on a bounded
    * deterministic sample (hash order on vec_id) collected to the
    * driver. This is the scale-correct shape: at 100 TB you never Lloyd-
    * iterate the full corpus to build a coarse quantizer — you train on
    * a few thousand sampled vectors (model state, k × dim doubles) and
    * spend the distributed work on the single full-corpus assignment
    * pass in [[ivfTopK]]. Init = farthest-point traversal (k-means++
    * without the randomness) seeded at the first sample vector, so
    * cluster spread is guaranteed; then `iters` Lloyd iterations, empty
    * clusters keeping their previous centroid.
    * Returns the final centroids as (cid, centroid array<double>).
    */
  def kmeans(emb: DataFrame, k: Int = 16, iters: Int = 5,
      maxSample: Int = 2048): DataFrame = {
    import org.apache.spark.sql.Row
    val spark = emb.sparkSession
    val sample: Array[Array[Double]] =
      emb.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(maxSample)
        .select(col("embedding")).collect()
        .map(embAsDoubles(_, 0))
    require(sample.nonEmpty, "kmeans needs a non-empty embedding table")
    val dim = sample(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // farthest-point init; ties keep the earliest sample index
    val init = scala.collection.mutable.ArrayBuffer(sample(0))
    val minD = sample.map(d2(_, sample(0)))
    while (init.length < math.min(k, sample.length)) {
      var best = 0
      var i = 1
      while (i < sample.length) { if (minD(i) > minD(best)) best = i; i += 1 }
      val c = sample(best)
      init += c
      i = 0
      while (i < sample.length) {
        val d = d2(sample(i), c); if (d < minD(i)) minD(i) = d; i += 1
      }
    }
    var cents: Array[Array[Double]] = init.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var bi = 0; var bd = Double.MaxValue; var i = 0
        while (i < cents.length) {
          val d = d2(v, cents(i)); if (d < bd) { bd = d; bi = i }; i += 1
        }
        counts(bi) += 1
        var j = 0
        while (j < dim) { sums(bi)(j) += v(j); j += 1 }
      }
      cents = cents.indices.map { i =>
        if (counts(i) == 0) cents(i) else sums(i).map(_ / counts(i))
      }.toArray
    }
    val centroids = cents.zipWithIndex.map { case (c, i) => i -> c }
    val rows = centroids.map { case (cid, c) => Row(cid, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
  }

  /** Nearest-centroid assignment: per-row argmin of squared L2 distance
    * (min over (c.c - 2 x.c) — the ||x||^2 term is constant per row);
    * ties break to the lowest cid.
    */
  private def assignToCentroids(
      emb: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame = {
    val scored = centroids.map { case (cid, c) =>
      val cLit = array(c.map(lit).toIndexedSeq: _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(col("embedding"), cLit)).as("score"),
        lit(cid).as("cid"))
    }
    emb.withColumn("cid", array_min(array(scored.toIndexedSeq: _*)).getField("cid"))
  }

  /** Build (once per session+dataset) the IVF index: train the coarse
    * quantizer on a bounded sample ([[kmeans]]), assign every vector to
    * its nearest cell (pure map — k dot products per row), and write the
    * corpus Hive-partitioned by cell id. The one full-corpus pass, paid
    * at build time, never at probe time.
    */
  def ivfIndex(emb: DataFrame, datasetKey: String,
      nlist: Int = 16, iters: Int = 5): IvfIndex =
    ivfMemo.getOrElseUpdate((emb.sparkSession, datasetKey, nlist, iters), {
      val centroids = kmeans(emb, nlist, iters).collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      val path = indexPath(emb.sparkSession, s"ivf${nlist}i$iters", datasetKey)
      // repartition by cell: one writer set per cell directory (see
      // lshIndex) instead of tasks × cells tiny files; explicit count so
      // AQE cannot coalesce the writers serial (see lshLayoutRows)
      graft.sources.Sink.writePartitioned(
        assignToCentroids(emb, centroids)
          .repartition(layoutParallelism(emb), col("cid")),
        path, Seq("cid"))
      IvfIndex(path, centroids)
    })

  /** IVF (inverted-file) approximate top-k through the cid-partitioned
    * index: the query's `nprobe` nearest cells (chosen driver-side
    * against the nlist x dim centroid model) become a partition-pruning
    * IN-filter — the scan lists and reads ONLY those cell directories,
    * bounding probe I/O to ~nprobe/nlist of the corpus instead of
    * filtering a full scan.
    */
  def ivfTopK(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 5,
      datasetKey: String): DataFrame =
    ivfProbeTopK(ivfIndex(emb, datasetKey, nlist, iters), emb, queryId, k, nprobe)

  /** Single-query probe against an already-built [[IvfIndex]] — the
    * shared probe path of [[ivfTopK]] and [[ivfIncrementalTopK]]. The
    * `lookup` frame only supplies the query vector (one filtered
    * collect); all scored data comes off the cid-partitioned layout.
    */
  private def ivfProbeTopK(idx: IvfIndex, lookup: DataFrame,
      queryId: Long, k: Int, nprobe: Int): DataFrame = {
    val qRows = lookup.filter(col("vec_id") === queryId).collect()
    require(qRows.nonEmpty, s"ivfTopK: query vec_id=$queryId not found")
    val q = qRows.head
    val qv = embAsDoubles(q, q.fieldIndex("embedding"))
    val probes = idx.centroids.map { case (cid, c) =>
      val d2 = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      cid -> d2
    }.sortBy(_._2).take(nprobe).map(_._1).toSet
    val qLit = array(qv.map(lit).toIndexedSeq: _*)
    lookup.sparkSession.read.parquet(idx.path)
      .filter(col("cid").isInCollection(probes) && col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), qLit), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** INCREMENTAL index maintenance: fold a delta of new vectors into an
    * existing IVF layout without retraining or rewriting it. At 100 TB an
    * index rebuild is a full-corpus write; a daily ingest delta is not a
    * rebuild-sized event. The coarse quantizer is FROZEN — delta vectors
    * are assigned to the nearest EXISTING centroid (pure map, k dot
    * products per row) and appended into that cell's directory; probes
    * see base ∪ delta through the unchanged partition-pruned read path,
    * and the centroid model (the driver-side state) is byte-identical.
    *
    * The trade — the standard IVF one (Faiss `add` vs `train`) — is that
    * cells drift as the delta's distribution diverges from the base's:
    * appended mass lands in cells whose centroids were not trained on
    * it, degrading probe recall at nprobe < nlist, never correctness of
    * the exhaustive regime. Re-train on the quantizer's own schedule
    * (e.g. when [[embeddingHealth]]-style drift audits trip), not per
    * ingest.
    *
    * Memoized like [[ivfIndex]] under a derived dataset key, so a
    * session appends the delta exactly once; after
    * [[invalidateIndexes]] the base build's Overwrite write clears the
    * layout before the append re-runs — the on-disk state converges to
    * base ∪ delta no matter how the memo and the files interleave.
    * (That truncation relies on the default STATIC
    * `spark.sql.sources.partitionOverwriteMode`; a session flipped to
    * dynamic would only overwrite cells the rebuild touches — which is
    * all of them for a full base rebuild, so the contract degrades only
    * if a cell goes EMPTY between generations, a vanishing edge at any
    * real corpus size. Idempotence is spec-pinned either way.)
    */
  def ivfIndexIncremental(base: DataFrame, delta: DataFrame,
      datasetKey: String, nlist: Int = 16, iters: Int = 5): IvfIndex =
    // derived keys use '_' (never '#'/':' — dataset keys feed path
    // basenames, and URI-fragment parsing would silently collide the
    // base layout with the plain index of the same dataset)
    ivfMemo.getOrElseUpdate((base.sparkSession, s"${datasetKey}_incr", nlist, iters), {
      val idx = ivfIndex(base, s"${datasetKey}_incrbase", nlist, iters)
      assignToCentroids(delta, idx.centroids)
        .repartition(layoutParallelism(delta), col("cid"))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .partitionBy("cid").parquet(idx.path)
      idx
    })

  /** Top-k probe through the incrementally-appended layout
    * ([[ivfIndexIncremental]]). At nprobe = nlist this is provably the
    * exact top-k over base ∪ delta — the append machinery sits on the
    * oracle surface (q140) exactly as q113 gates the probe machinery.
    */
  def ivfIncrementalTopK(base: DataFrame, delta: DataFrame,
      queryId: Long, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 5, datasetKey: String): DataFrame =
    ivfProbeTopK(ivfIndexIncremental(base, delta, datasetKey, nlist, iters),
      base.unionByName(delta), queryId, k, nprobe)

  /** Pick the query-side join regime for the indexed ANN joins. A
    * mining/retrieval BATCH of queries broadcasts (each corpus partition
    * scores its local cells against every probing query — no corpus
    * shuffle at all); but when the query side is ITSELF corpus-scale
    * (all-pairs hard-negative mining, corpus-vs-corpus retrieval) the
    * broadcast exceeds Spark's 8 GB cap and the right plan is a SHUFFLE
    * join on cid — both sides hash-partition on cell id, so each task
    * joins one cell's corpus slice with that cell's probes. Parallelism
    * is then bounded by nlist: size nlist to the cluster (thousands of
    * cells at web scale), exactly how IVF shards are laid out anyway.
    *
    * `regime`: Some(true) forces broadcast, Some(false) forces shuffle,
    * None auto-selects by comparing the query plan's size estimate to
    * `spark.sql.autoBroadcastJoinThreshold` — the same bar Spark itself
    * uses, so the auto choice degrades exactly when Spark's would.
    */
  private[operators] def queryRegime(qProbes: DataFrame,
      regime: Option[Boolean]): DataFrame =
    if (wantsBroadcast(qProbes, regime)) broadcast(qProbes) else qProbes

  /** [[queryRegime]]'s decision alone — for callers that pick a whole
    * PLAN SHAPE by regime (e.g. the bm25 single-scan in-row term prune,
    * which only exists in the broadcast regime) rather than just a join
    * hint.
    */
  private[operators] def wantsBroadcast(qProbes: DataFrame,
      regime: Option[Boolean]): Boolean =
    regime.getOrElse {
      val raw = qProbes.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val thr =
        try raw.toLong
        catch { case _: NumberFormatException =>
          org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        }
      thr > 0 &&
        qProbes.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
    }

  /** Batch ANN join through the IVF index — the scale path of [[knnJoin]]:
    * every query row probes only its `nprobe` nearest cells. The probe
    * cells are a pure row expression against the centroid model (nlist
    * distance scores → sort → slice), exploded to (q_id, cid) pairs and
    * equi-joined with the cid-partitioned index — a bucket join keyed on
    * cid, never a cross join against the whole corpus. At nprobe = nlist
    * the result is exactly the exhaustive [[knnJoin]] (the oracle-gated
    * regime, q101); nprobe < nlist recall is gated in IvfSpec.
    * `broadcastQueries` selects the query-side regime ([[queryRegime]]):
    * broadcast for mining batches, cid-keyed shuffle when the query side
    * is corpus-scale; the shuffle regime's exhaustive form is
    * oracle-gated as q128.
    */
  def ivfKnnJoin(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      datasetKey: String,
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    val idx = ivfIndex(corpus, datasetKey, nlist, iters)
    val qProbes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cid", explode(probeCids(idx.centroids, nprobe, col("q_emb"))))
    val indexed = corpus.sparkSession.read.parquet(idx.path)
    val scored = indexed.join(queryRegime(qProbes, broadcastQueries), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** A query row's `nprobe` nearest cells as a pure column expression
    * against the centroid model: squared-L2 to each centroid in its
    * cheapest form ||c||² − 2·q·c (the ||q||² term is constant per row
    * and cannot change the argsort), sort, slice — nlist scores per row,
    * no shuffle, no driver round-trip.
    */
  private def probeCids(centroids: Array[(Int, Array[Double])],
      nprobe: Int, qEmb: Column): Column = {
    val cellScores = centroids.map { case (cid, c) =>
      val cLit = array(c.map(lit).toIndexedSeq: _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(qEmb, cLit)).as("score"),
        lit(cid).as("cid"))
    }
    transform(
      slice(sort_array(array(cellScores.toIndexedSeq: _*)), 1, nprobe),
      p => p.getField("cid"))
  }

  /** Hard-negative mining through the IVF layout — the indexed scale path
    * of [[hardNegatives]]: each query probes only its `nprobe` nearest
    * cells (the [[ivfKnnJoin]] plan shape — cid equi-join against the
    * partitioned index, never a full-corpus scan per query), with the
    * label-inequality predicate applied before scoring. At nprobe = nlist
    * the probe covers every cell and the result provably equals the exact
    * miner — the oracle-gated regime (q114, the q101/q113 device); the
    * probed regime is recall-gated in IvfSpec. `broadcastQueries` selects
    * the query-side regime ([[queryRegime]]): hard-negative mining over
    * the WHOLE corpus as the query set is the canonical corpus-scale
    * case, and it must shuffle on cid, not broadcast.
    */
  def ivfHardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
      datasetKey: String,
      broadcastQueries: Option[Boolean] = None): DataFrame = {
    val idx = ivfIndex(corpus, datasetKey, nlist, iters)
    val qProbes = queries
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
      .withColumn("cid", explode(probeCids(idx.centroids, nprobe, col("q_emb"))))
    val indexed = corpus.sparkSession.read.parquet(idx.path)
    val scored = indexed.join(queryRegime(qProbes, broadcastQueries), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
      .select(col("q_id"), col("vec_id"), col("label").as("neg_label"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos_sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), col("neg_label"),
        col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Per-label centroids (mean embedding) + intra-cluster cohesion (mean
    * cosine of members to a unit-normalized sum — computed with array
    * aggregates, no UDAF: sum-vector via element-wise aggregation over
    * posexploded components).
    */
  /** [[labelCentroids]] via the typed [[graft.functions.VectorAvg]]
    * Aggregator — one pass, one buffer per (label, map task) in the
    * shuffle, no posexplode blow-up of the row count. Same output.
    */
  def labelCentroidsAgg(emb: DataFrame): DataFrame =
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        graft.functions.VectorAvg.column(col("embedding")).as("centroid"))
      .select(col("label"), col("n_members"),
        round(norm(col("centroid")), 6).as("centroid_norm"))
      .orderBy(col("label"))

  def labelCentroids(emb: DataFrame): DataFrame = {
    val exploded = emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
    val sums = exploded.groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    sums.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), (col("s") / col("n")).as("m"))))
        .as("pairs"), first(col("n")).as("n_members"))
      .select(col("label"), col("n_members"),
        round(norm(transform(col("pairs"), p => p.getField("m"))), 6).as("centroid_norm"))
      .orderBy(col("label"))
  }

  /** Per-label semantic outlier census: each member's cosine to its OWN
    * label centroid, rolled up to (n_members, mean cosine, count below
    * 0.5) — the mislabeled-point estimate that triages a labeled
    * embedding set before training on it. The centroid table is bounded
    * (labels × dim) and broadcasts; the member dot products come from a
    * map-side posexplode whose (vec_id, label) re-combine is map-side
    * partial-aggregated (components of one vector are adjacent), so the
    * shuffle carries one row per vector. Cosines are rounded to 6dp
    * BEFORE the threshold test so both engines compare the same
    * quantized value (similarity cutoffs on raw doubles are not
    * portable), and the label MEAN sums exact micro-unit BIGINTs
    * (round(cos·10⁶)) rather than doubles — a float sum of rounded
    * cosines is partial-aggregation-order-dependent and flipped a
    * 6dp boundary row live between engines; the integer sum is
    * order-free, so both engines divide the same exact numerator.
    */
  def semanticOutliers(emb: DataFrame): DataFrame = {
    val exploded = emb.select(col("label"), col("vec_id"),
      posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "v")))
    val cent = exploded.groupBy(col("label"), col("pos"))
      .agg((sum(col("v")) / count(lit(1))).as("m"))
    val cnorm = cent.groupBy(col("label"))
      .agg(sum(col("m") * col("m")).as("c2"))
    val perVec = exploded
      .join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("v") * col("m")).as("dot"),
        sum(col("v") * col("v")).as("v2"))
      .join(broadcast(cnorm), Seq("label"))
      .withColumn("cos", round(col("dot") /
        (sqrt(col("v2")) * sqrt(col("c2"))), 6))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("cos") * 1e6).cast("long")).as("__sum_micro"),
        sum(when(col("cos") < 0.5, 1L).otherwise(0L)).as("n_outliers"))
      .select(col("label"), col("n_members"),
        (round(col("__sum_micro").cast("double") / col("n_members")) / 1e6)
          .as("mean_cos"),
        col("n_outliers"))
      .orderBy(col("label"))
  }

  /** Label-pair centroid cosine matrix (upper triangle): which classes
    * sit close in embedding space — the confusion-structure audit that
    * explains a classifier's error matrix before training one. The
    * per-(label, pos) component means come from one posexplode rollup
    * bounded by labels × dim, the pair frame from a self-join on pos
    * bounded by labels² × dim — never corpus-sized. Complements q204
    * (which aggregates separation into one number per label, losing the
    * WHICH-pair structure) and q220 (temporal drift, not cross-label).
    */
  def centroidSimilarityMatrix(emb: DataFrame): DataFrame = {
    val means = emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast("double")) / count(lit(1))).as("m"))
    val a = means.select(col("label").as("label_a"), col("pos"),
      col("m").as("ma"))
    val b = means.select(col("label").as("label_b"), col("pos").as("p2"),
      col("m").as("mb"))
    a.join(b, col("pos") === col("p2") && col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(round(sum(col("ma") * col("mb")) /
        (sqrt(sum(col("ma") * col("ma"))) *
          sqrt(sum(col("mb") * col("mb")))), 6).as("centroid_cos"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** Split-half centroid drift per label: cosine between the mean
    * embedding of even vec_ids and odd vec_ids — the embedding-stability
    * audit (a healthy label's two random halves should agree; low cosine
    * flags a label whose members scatter). Component means come from one
    * posexplode rollup keyed (label, half, pos) — bounded by labels x
    * dim, never the corpus — and the cosine is a ~dim-row dot product
    * per label.
    */
  def centroidDrift(emb: DataFrame): DataFrame = {
    val means = emb.select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("half"), col("pos"))
      .agg((sum(col("v").cast("double")) / count(lit(1))).as("m"),
        count(lit(1)).as("n"))
    val ev = means.filter(col("half") === 0)
      .select(col("label"), col("pos"), col("m").as("me"), col("n").as("ne"))
    val od = means.filter(col("half") === 1)
      .select(col("label").as("l2"), col("pos").as("p2"),
        col("m").as("mo"), col("n").as("no"))
    ev.join(od, col("label") === col("l2") && col("pos") === col("p2"))
      .groupBy(col("label"))
      .agg(max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
        sum(col("me") * col("mo")).as("dot"),
        sum(col("me") * col("me")).as("se"),
        sum(col("mo") * col("mo")).as("so"))
      .select(col("label"), col("n_even"), col("n_odd"),
        round(col("dot") / (sqrt(col("se")) * sqrt(col("so"))), 6)
          .as("drift_cosine"))
      .orderBy(col("label"))
  }

  /** Label balance: Shannon entropy of the label distribution and the
    * effective number of classes (2^H) — one row saying whether the
    * labeled set is balanced enough to train on. Counts are exact; the
    * entropy identity is the sum-friendly H = log2(N) - sum(n log2 n)/N
    * form, so no per-class probability division happens before the
    * aggregate.
    */
  def labelBalance(emb: DataFrame): DataFrame = {
    val counts = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
    counts.agg(sum(col("n")).as("n_vecs"), count(lit(1)).as("n_labels"),
        sum(col("n").cast("double") * log2(col("n").cast("double")))
          .as("snl"))
      .select(col("n_vecs"), col("n_labels"),
        round(log2(col("n_vecs").cast("double")) -
          col("snl") / col("n_vecs").cast("double"), 6)
          .as("entropy_bits"),
        round(pow(lit(2.0), log2(col("n_vecs").cast("double")) -
          col("snl") / col("n_vecs").cast("double")), 6)
          .as("effective_classes"))
  }

  /** Leave-one-out 1-NN label confusion over a bounded evaluation slice:
    * each vector's nearest OTHER vector votes a predicted label; the
    * (true, predicted) matrix is the standard embedding-quality eval
    * (diagonal mass = 1-NN accuracy, off-diagonal cells name the label
    * pairs the space confuses). Same deterministic ranking contract as
    * [[knnJoin]] — cosine rounded to 4dp, vec_id tiebreak — and the
    * slice bound keeps the all-pairs eval driver-scale by design (the
    * production path for full-corpus evals is the IVF family).
    */
  def knnConfusion(emb: DataFrame, maxId: Long = 256L): DataFrame = {
    val sub = emb.filter(col("vec_id") < maxId)
    val scored = sub
      .select(col("vec_id"), col("embedding"), col("label").as("nlabel"))
      .crossJoin(broadcast(sub.select(col("vec_id").as("q_id"),
        col("embedding").as("q_emb"), col("label").as("q_label"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id"), col("nlabel"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("c"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("c").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .groupBy(col("q_label").as("label"), col("nlabel").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("predicted"))
  }

  /** Per-label precision / recall / F1 from the [[knnConfusion]] matrix —
    * the eval-metrics rollup a model card quotes. Unrounded precision
    * and recall feed the F1 closed form (rounding inside a formula is
    * how cross-engine hashes die); labels the 1-NN never predicts carry
    * NULL precision/F1 honestly, zero-TP labels pin F1 to exactly 0.
    */
  def knnPrf(emb: DataFrame, maxId: Long = 256L): DataFrame = {
    val cm = knnConfusion(emb, maxId)
    val byTrue = cm.groupBy(col("label")).agg(sum(col("n")).as("support"))
    val byPred = cm.groupBy(col("predicted").as("plabel"))
      .agg(sum(col("n")).as("pred_n"))
    val diag = cm.filter(col("label") === col("predicted"))
      .select(col("label"), col("n").as("tp0"))
    val tp = coalesce(col("tp0"), lit(0L))
    val pRaw = tp.cast("double") / col("pred_n").cast("double")
    val rRaw = tp.cast("double") / col("support").cast("double")
    byTrue.join(diag, Seq("label"), "left")
      .join(byPred, col("label") === col("plabel"), "left")
      .select(col("label"), col("support"), tp.as("tp"),
        when(col("pred_n").isNull, lit(null).cast("double"))
          .otherwise(round(pRaw, 6)).as("prec"),
        round(rRaw, 6).as("rec"),
        when(col("pred_n").isNull, lit(null).cast("double"))
          .when(tp === 0L, lit(0.0))
          .otherwise(round(lit(2.0) * pRaw * rRaw / (pRaw + rRaw), 6))
          .as("f1"))
      .orderBy(col("label"))
  }

  /** Per-dimension label discrimination: one-way eta-squared of each
    * embedding coordinate across labels — the feature-selection audit
    * ("which dimensions carry the label signal"). The rollup is keyed
    * (dim, label) then (dim) — bounded by dim x labels, never the
    * corpus — and the output is every dimension unranked (ranking by a
    * continuous score is not a portable cross-engine contract; the
    * consumer sorts).
    */
  def dimDiscrimination(emb: DataFrame): DataFrame = {
    val ex = emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), (col("pos") + 1).as("dim"),
        col("v").cast("double").as("v"))
    val perLab = ex.groupBy(col("dim"), col("label"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
    perLab.groupBy(col("dim"))
      .agg(sum(col("n")).as("nn"), sum(col("s")).as("stot"),
        sum(col("ss")).as("sstot"),
        sum(col("s") * col("s") / col("n")).as("grp"))
      .select(col("dim"),
        round((col("grp") - col("stot") * col("stot") / col("nn")) /
          (col("sstot") - col("stot") * col("stot") / col("nn")), 6)
          .as("eta2"))
      .orderBy(col("dim"))
  }

  /** Symmetric int8 quantization of the embedding column: per-vector
    * scale = max|x| / 127, q_i = round(x_i / scale) ∈ [-127, 127] — the
    * standard memory-scale ANN layout (4x smaller vectors, SIMD int8
    * dot products on the serving side). Returns the quantized vector
    * plus the audit columns a quantization job must publish: the scale,
    * the worst-case reconstruction error (order-independent max, safe
    * for cross-engine parity), and the saturated-lane count.
    *
    * All math is element-wise in double (floats widened first — float
    * arithmetic diverges across engines) and per-row: one narrow
    * projection over the scan, no shuffle, fully parallel. On a 100 TB
    * embedding store this runs as a single map stage feeding the shard
    * writer.
    */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    emb
      .withColumn("__v", v)
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))) / 127d)
      .withColumn("q", transform(col("__v"),
        x => round(x / col("scale")).cast("int")))
      .withColumn("max_abs_err", array_max(zip_with(col("__v"), col("q"),
        (x, qi) => abs(qi.cast("double") * col("scale") - x))))
      .withColumn("n_saturated", size(filter(col("q"), qi => abs(qi) === 127)))
      .drop("__v")
  }

  /** Two-stage quantized ANN: int8 prefilter, full-precision re-rank —
    * the standard memory-bound serving shape (a 100 TB embedding store
    * is scanned 4x cheaper as int8; only `rerankWidth` survivors pay the
    * float read). Stage 1 scores candidates with the COSINE OF THE
    * QUANTIZED VECTOR against the query: for symmetric per-vector
    * scaling the scale cancels out of the cosine
    * (cos(scale·q, v) = cos(q, v)), so the approximate score needs no
    * dequantization — integer dot products on the serving side, and
    * exactly reproducible cross-engine because [[quantizeInt8]] already
    * hash-matches (q84). Stage 2 re-ranks the top `rerankWidth` by exact
    * full-precision cosine and emits top-k with both scores (the
    * approx-vs-exact gap per row is the quantization-quality audit).
    *
    * Both stage cuts order on ROUNDED scores (4 dp) with vec_id
    * tie-breaks — the same values an ANSI oracle ranks — so the whole
    * two-stage path is hash-comparable at nprobe = nlist (q130, the
    * q113 exhaustive device); probed regimes inherit ivfTopK's pruning.
    */
  def ivfQuantizedTopK(
      emb: DataFrame,
      queryId: Long,
      k: Int,
      rerankWidth: Int = 50,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 5,
      datasetKey: String): DataFrame = {
    val idx = ivfIndex(emb, datasetKey, nlist, iters)
    val qRows = emb.filter(col("vec_id") === queryId).collect()
    require(qRows.nonEmpty, s"ivfQuantizedTopK: query vec_id=$queryId not found")
    val q = qRows.head
    val qv = embAsDoubles(q, q.fieldIndex("embedding"))
    val probes = idx.centroids.map { case (cid, c) =>
      cid -> c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy(_._2).take(nprobe).map(_._1).toSet
    val qLit = array(qv.map(lit).toIndexedSeq: _*)
    val candidates = quantizeInt8(
      emb.sparkSession.read.parquet(idx.path)
        .filter(col("cid").isInCollection(probes) && col("vec_id") =!= queryId))
      .withColumn("approx_cos",
        round(cosine(col("q").cast("array<double>"), qLit), 4))
      .orderBy(col("approx_cos").desc, col("vec_id"))
      .limit(rerankWidth)
    candidates
      .select(col("vec_id"), col("label"), col("approx_cos"),
        round(cosine(col("embedding"), qLit), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Fixture wiring (q84): quantization audit per vector. */
  def quantizationReport(emb: DataFrame): DataFrame =
    quantizeInt8(emb)
      .select(col("vec_id"), col("scale"), col("max_abs_err"),
        col("n_saturated"))
      .orderBy(col("vec_id"))

  /** Per-label embedding diversity report: member count, mean vector
    * norm, and SPREAD — the sum of per-dimension population variances
    * (= mean squared distance to the label centroid). A label whose
    * spread collapses toward 0 has near-identical embeddings (mode
    * collapse in the encoder, or a label made of duplicates); comparing
    * spread across labels is the embedding-space twin of the quality
    * tier report. Two aggregations over the exploded (label, dim)
    * relation plus a label-keyed stats pass — skew-free keys, map-side
    * partials, no pairwise work (the naive "mean pairwise distance"
    * needs O(n²); the variance identity gives the same signal in O(n)).
    */
  def embeddingDiversity(emb: DataFrame): DataFrame = {
    val ex = Par.ensure(emb).select(col("label"),
      posexplode(col("embedding").cast("array<double>")))
    val spread = ex.groupBy(col("label"), col("pos"))
      .agg(var_pop(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(round(sum(col("v")), 4).as("spread"))
    Par.ensure(emb).groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        round(avg(norm(col("embedding").cast("array<double>"))), 4)
          .as("avg_norm"))
      .join(spread, "label")
      .orderBy(col("label"))
  }

  /** SemDeDup-style semantic dedup keep list: cluster near-duplicate
    * embeddings (the portable-plane LSH candidate pairs of
    * [[lshNearDupPairs]], closed into connected components by
    * [[Dedup.clusters]]), then keep ONE semantic representative per
    * cluster — the member whose embedding is closest by cosine to the
    * cluster centroid — and mark the rest for removal. This is the
    * embedding-space analogue of the text keep-list (q42): text near-dup
    * picks the min-id member, but semantically the right survivor is the
    * most CENTRAL one, not an id accident. Singleton vectors (in no
    * pair) are trivially kept and not emitted.
    *
    * Scale shape: pairs and closure are the q30/q41 machinery (bucketed
    * candidates, label propagation — no all-pairs work); the centroid is
    * ONE aggregation per cluster ([[graft.functions.VectorAvg]], element
    * sums widened to double); members then join the centroid frame on
    * cluster_id and rank within the cluster — the join and the window
    * share the cluster_id partitioning, so the whole tail is one
    * shuffle. Ranking uses the UNROUNDED cosine (ulp-ties are
    * measure-zero for continuous embeddings; same FP-boundary contract
    * as the q29/q30 oracles), rounded only for display.
    */
  def semanticKeepList(emb: DataFrame, threshold: Double = 0.3,
      datasetKey: String = null): DataFrame = {
    val pairFrame =
      if (datasetKey == null) lshNearDupPairs(emb, threshold)
      else lshNearDupPairsShared(emb, datasetKey, threshold)
    val pairs = pairFrame
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val cl = Dedup.clusters(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val members = emb.select(col("vec_id"), col("embedding")).join(cl, "vec_id")
    val cents = members.groupBy(col("cluster_id"))
      .agg(graft.functions.VectorAvg.column(col("embedding")).as("centroid"),
        count(lit(1)).cast("int").as("n_members"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__c").desc, col("vec_id"))
    members.join(cents, "cluster_id")
      .withColumn("__c", cosine(col("embedding").cast("array<double>"),
        col("centroid")))
      .withColumn("rk", row_number().over(w))
      .select(col("cluster_id"), col("vec_id"), (col("rk") === 1).as("keep"),
        col("n_members"), round(col("__c"), 4).as("cos_centroid"))
      .orderBy(col("cluster_id"), col("vec_id"))
  }

  /** Embedding-column health audit: per-dimension mean / std / min / max
    * and the near-zero fraction — the cheap detector for collapsed or
    * dead dimensions (std ≈ 0 means the dim carries no information; a
    * mean drifting from 0 skews every cosine downstream) and for zeroed
    * vectors from failed encoder batches. Run it before building any
    * index over a fresh embedding drop; a bad dim here invalidates all
    * of them.
    *
    * Scale shape: posexplode is map-side (dim rows per vector) and the
    * aggregation partial-aggs on the dimension index — at most `dim`
    * groups, so the shuffle is partitions × dim tiny rows regardless of
    * corpus size. No joins, no vector materialization on the driver.
    */
  def embeddingHealth(emb: DataFrame, zeroEps: Double = 1e-6): DataFrame =
    emb.select(posexplode(col("embedding")))
      .select((col("pos") + 1).cast("long").as("dim"),
        col("col").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("dim_mean"),
        round(stddev_samp(col("v")), 4).as("dim_std"),
        round(min(col("v")), 6).as("dim_min"),
        round(max(col("v")), 6).as("dim_max"),
        round(avg(when(abs(col("v")) < zeroEps, 1.0).otherwise(0.0)), 4)
          .as("near_zero_frac"))
      .orderBy(col("dim"))

  /** Mutual-kNN and label-homophily audit over a bounded evaluation slice
    * of the embedding table: build the exact cosine k-nearest-neighbor
    * edge list (rank by the ROUNDED cosine with an id tiebreak — the
    * q28/q29 determinism contract), then measure (a) the mutual-edge rate
    * (A in kNN(B) and B in kNN(A) — low mutuality flags hubness, the
    * classic curse-of-dimensionality failure that silently degrades ANN
    * recall) and (b) label homophily (the fraction of neighbors sharing
    * the anchor's label — the cheap proxy for "do these embeddings encode
    * the classes at all").
    *
    * Scale shape: the quadratic pass is bounded to `maxId` anchors (an
    * EVALUATION SAMPLE — hubness/homophily are corpus statistics and
    * estimate fine from a slice); the small side broadcasts, so the pairs
    * never shuffle. At full-corpus scale swap the candidate generator for
    * the LSH-bucketed pair frame ([[lshNearDupPairs]]-style) and
    * keep the identical mutual/homophily tail, which only ever sees
    * k*n edges.
    */
  def mutualKnn(emb: DataFrame, k: Int = 5, maxId: Long = 256L): DataFrame = {
    val sub = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"), col("label"))
    val pairs = sub.toDF("a_id", "e_a", "a_label")
      .join(broadcast(sub.toDF("b_id", "e_b", "b_label")),
        col("a_id") =!= col("b_id"))
      .withColumn("c", round(cosine(col("e_a"), col("e_b")), 4))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("c").desc, col("b_id"))
    val knn = pairs
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col("a_id"), col("a_label"), col("b_id"), col("b_label"))
    val rev = knn.select(col("a_id").as("r_b"), col("b_id").as("r_a"))
    knn
      .join(rev, col("a_id") === col("r_a") && col("b_id") === col("r_b"),
        "left_outer")
      .select(col("a_label").as("label"), col("a_id"),
        when(col("r_a").isNotNull, 1L).otherwise(0L).as("mut"),
        when(col("a_label") === col("b_label"), 1L).otherwise(0L).as("same"))
      .groupBy(col("label"))
      .agg(countDistinct(col("a_id")).as("n_vecs"),
        count(lit(1)).as("n_edges"),
        sum(col("mut")).as("n_mutual"),
        round(sum(col("mut")).cast("double") / count(lit(1)), 6)
          .as("mutual_rate"),
        sum(col("same")).as("n_same_label"),
        round(sum(col("same")).cast("double") / count(lit(1)), 6)
          .as("homophily"))
      .orderBy(col("label"))
  }

  /** Label-separation audit over a bounded evaluation slice: per label,
    * the mean intra-label pairwise cosine vs the mean cosine to every
    * other label, and their gap — the scalar answer to "are the classes
    * linearly separated in embedding space?" (a silhouette-style score
    * without the per-point machinery). Pair cosines are ROUNDED to 4dp
    * before averaging, so the sums are sums of exact decimals (hash-
    * stable); each pair feeds BOTH endpoints' statistics via a two-sided
    * projection union, not a second join.
    *
    * Scale shape: like [[mutualKnn]], the quadratic pass is bounded to a
    * `maxId` sample slice and the broadcast side is tiny; the full-corpus
    * version would sample per label and reuse the identical tail.
    */
  def labelSeparation(emb: DataFrame, maxId: Long = 256L): DataFrame = {
    val sub = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id"), col("embedding"), col("label"))
    val pairs = sub.toDF("a_id", "e_a", "a_label")
      .join(broadcast(sub.toDF("b_id", "e_b", "b_label")),
        col("a_id") < col("b_id"))
      .select(col("a_label"), col("b_label"),
        round(cosine(col("e_a"), col("e_b")), 4).as("c"))
    val ends = pairs.select(col("a_label").as("label"),
        col("b_label").as("other"), col("c"))
      .union(pairs.select(col("b_label").as("label"),
        col("a_label").as("other"), col("c")))
    // Portability: the 4dp cosines are DOUBLES, and a double sum is
    // partial-aggregation-order-dependent — at one fixture scale the
    // intra mean landed a half-ulp either side of the 6dp grid across
    // engines. So the sums are exact scaled BIGINTs, and the 6dp mean is
    // integer HALF_UP on non-negative operands (abs + re-sign — signed
    // integer div truncates in Spark but floors in DuckDB, the q236
    // lesson), with the final /1e6 the only float op on both engines.
    ends
      .withColumn("c4", expr("CAST(round(c * 10000, 0) AS BIGINT)"))
      .groupBy(col("label"))
      .agg(count(when(col("label") === col("other"), 1)).as("n_intra"),
        count(when(col("label") =!= col("other"), 1)).as("n_inter"),
        sum(when(col("label") === col("other"), col("c4"))).as("s4i"),
        sum(when(col("label") =!= col("other"), col("c4"))).as("s4o"))
      .withColumn("mi6", expr("CAST(sign(s4i) AS BIGINT) * " +
        "((2 * abs(s4i) * 100 + n_intra) div (2 * n_intra))"))
      .withColumn("mo6", expr("CAST(sign(s4o) AS BIGINT) * " +
        "((2 * abs(s4o) * 100 + n_inter) div (2 * n_inter))"))
      .select(col("label"), col("n_intra"), col("n_inter"),
        (col("mi6").cast("double") / 1e6).as("mean_intra"),
        (col("mo6").cast("double") / 1e6).as("mean_inter"),
        ((col("mi6") - col("mo6")).cast("double") / 1e6).as("separation"))
      .orderBy(col("label"))
  }

  /** Product-quantization ANN with exact rerank: train one `codeK`-way
    * codebook per `subspaces` subvector slice (on [[kmeans]]'s bounded
    * sample — driver-sized model state), encode every vector to
    * `subspaces` small codes in ONE map pass (argmin over
    * `||c||² − 2·x_j·c`, the per-row `||x_j||²` constant dropped), and
    * score candidates by asymmetric distance (ADC): the query
    * precomputes a `codeK`-entry lookup table per subspace, so a
    * candidate costs `subspaces` array lookups instead of a `dim`-wide
    * dot product — the memory-bandwidth shape that serves a 100 TB
    * embedding store from 8 bytes/vector. The top `rerankWidth` by ADC
    * pay the exact full-precision cosine; top-k of that is emitted.
    *
    * Correctness gate uses the q113 exhaustive device: codebooks are
    * driver-trained model state no ANSI oracle can replay, so the
    * REGISTERED regime sets `rerankWidth = Int.MaxValue`, where the ADC
    * prune would pass everything and the result is exactly
    * [[bruteForceTopK]]'s relation (embeddings are unit-norm, so ADC's
    * L2² = 2 − 2·cos is monotone in the rerank key) — so that regime
    * SKIPS codebook training and the stage-1 sort entirely instead of
    * emitting a degenerate full-table global sort + single-partition
    * limit of the whole store. Production sets `rerankWidth` ~10·k;
    * PqSpec pins both regimes.
    */
  def pqRerankTopK(emb: DataFrame, queryId: Long, k: Int = 10,
      subspaces: Int = 8, codeK: Int = 16,
      rerankWidth: Int = 10000): DataFrame = {
    val qRows = emb.filter(col("vec_id") === queryId).collect()
    require(qRows.nonEmpty, s"pqRerankTopK: query vec_id=$queryId not found")
    val qv = embAsDoubles(qRows.head, qRows.head.fieldIndex("embedding"))
    val dim = qv.length
    require(dim % subspaces == 0,
      s"pqRerankTopK: dim $dim not divisible into $subspaces subspaces")
    val dsub = dim / subspaces
    val qLit = array(qv.map(lit).toIndexedSeq: _*)
    val base = emb.filter(col("vec_id") =!= queryId)
    // Exhaustive regime: the ADC prune is an identity, so training
    // codebooks and globally sorting the whole store by __adc only to
    // keep every row would be a degenerate full-table sort + a
    // single-partition GlobalLimit shuffle. Feed all candidates
    // straight to the exact rerank — same relation, no stage 1.
    val candidates = if (rerankWidth == Int.MaxValue) base else {
      // per-subspace codebooks: kmeans over the subvector slice (the
      // sample inside kmeans is bounded; the returned codebook is
      // codeK x dsub — model state)
      val books: Seq[Array[(Int, Array[Double])]] =
        (0 until subspaces).map { j =>
          kmeans(emb.select(col("vec_id"),
              slice(col("embedding"), j * dsub + 1, dsub).as("embedding")),
            k = codeK)
            .collect()
            .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
            .sortBy(_._1)
        }
      // fused encode + ADC: per subspace, code = argmin_c(||c||²−2·x_j·c)
      // (ties to lowest cid — array_min on (d, cid) structs), then the
      // query-side lookup table prices that code
      val adc = (0 until subspaces).map { j =>
        val sub = slice(col("embedding"), j * dsub + 1, dsub)
        val qj = qv.slice(j * dsub, (j + 1) * dsub)
        val code = array_min(array(books(j).map { case (cid, c) =>
          val cLit = array(c.map(lit).toIndexedSeq: _*)
          struct((lit(c.map(x => x * x).sum) - lit(2.0) * dot(sub, cLit))
            .as("d"), lit(cid).as("cid"))
        }.toIndexedSeq: _*)).getField("cid")
        val lut = books(j).map { case (_, c) =>
          c.zip(qj).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        element_at(array(lut.map(lit).toIndexedSeq: _*), code + 1)
      }.reduce(_ + _)
      base.withColumn("__adc", adc)
        .orderBy(col("__adc").asc, col("vec_id"))
        .limit(rerankWidth)
    }
    candidates
      .select(col("vec_id"), col("label"),
        round(cosine(col("embedding"), qLit), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Matryoshka truncation audit: recall@k of PREFIX-truncated cosine
    * search against full-dimension cosine search, as an overlap
    * histogram (`n_common` of the two top-k lists → anchor count +
    * recall). The operational question behind MRL-style embeddings:
    * "can the ANN tier run on the first `truncDim` dims (4× less memory
    * and bandwidth at `truncDim` = 16 of 64) and keep acceptable
    * recall before the full-dim rerank?" — measured, not assumed, the
    * same way q130's int8 rerank prices quantization.
    *
    * Shape: anchors are a bounded evaluation slice (`vec_id < maxId` —
    * recall is a corpus statistic and estimates fine from a slice);
    * the anchor side BROADCASTS, the corpus streams past it, and the
    * per-anchor top-k window partitions on the anchor id. The pair
    * frame is |corpus|·|anchors| rows of (id, id, two cosines) — at
    * full corpus scale feed a corpus sample or the LSH-bucketed
    * candidate frame ([[lshNearDupPairs]]-style) as `emb`; the
    * ranking/overlap tail only ever sees 2·k·|anchors| rows. Cosines
    * round to 4dp with an id tiebreak before ranking (the q28/q29
    * determinism contract), so both engines rank identically.
    */
  def matryoshkaRecall(emb: DataFrame, k: Int = 10, truncDim: Int = 16,
      maxId: Long = 128L): DataFrame = {
    val anchors = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("a_id"), col("embedding").as("e_a"))
    // Par.ensure: the ×|anchors| broadcast pair kernel (two cosines per
    // pair) runs ON the corpus scan's splits, and the embeddings table
    // arrives as ONE split at fixture scale (single row group) — the
    // whole expansion then computes on one core (measured: 0.9 s
    // single-task stage emitting 256 k pair rows at sf0.1 — the q309
    // lesson). The guard is a no-op whenever the scan is already wide.
    val pairs = Par.ensure(emb.select(col("vec_id").as("b_id"),
        col("embedding").as("e_b")))
      .join(broadcast(anchors), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("e_a"), col("e_b")), 4).as("c_full"),
        round(cosine(slice(col("e_a"), 1, truncDim),
          slice(col("e_b"), 1, truncDim)), 4).as("c_trunc"))
    def topK(c: String): DataFrame = pairs
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col(c).desc, col("b_id"))))
      .filter(col("__r") <= k)
      .select(col("a_id"), col("b_id"))
    val overlap = topK("c_full").join(topK("c_trunc"), Seq("a_id", "b_id"))
      .groupBy(col("a_id")).agg(count(lit(1)).as("n_common"))
    anchors.select(col("a_id"))
      .join(overlap, Seq("a_id"), "left_outer")
      .na.fill(0L, Seq("n_common"))
      .groupBy(col("n_common"))
      .agg(count(lit(1)).as("n_anchors"))
      .select(col("n_common"), col("n_anchors"),
        round(col("n_common").cast("double") / k, 4).as("recall_at_k"))
      .orderBy(col("n_common"))
  }

  /** Embedding-space decontamination census: for every corpus vector
    * outside the eval suite, the maximum cosine to ANY eval-suite vector
    * (here: the `label == evalLabel` slice — the held-out benchmark a
    * release must not train on), reported as a similarity-bin histogram.
    * The n-gram decontamination (q61/q119) catches verbatim leakage;
    * this catches PARAPHRASED leakage the lexical pass misses —
    * SemDeDup's observation applied across the train/eval boundary. No
    * similarity threshold is baked in (cutoffs are not portable
    * contracts): the census gives the release reviewer the full
    * max-similarity distribution, binned at 0.05.
    *
    * Scale: the eval suite is bounded (benchmarks are thousands of rows,
    * not corpus-scale — enforced) → held as driver model state and
    * broadcast whole; the corpus streams past it in ONE mapPartitions
    * pass computing each vector's max cosine in a tight primitive-array
    * loop. A broadcast JOIN has the same shuffle shape but materializes
    * corpus×evals ROWS through the expression evaluator — measured
    * 1,333 s at the 100× fixture (~3.6e9 pairs) vs seconds for the
    * kernel, which does the identical flops without per-pair row
    * overhead; this is the one operator shape where mapPartitions beats
    * every declarative spelling. Exactness: per-accumulator double adds
    * run in the same index order as [[graft.functions.CosineSimilarity]]
    * (independent accumulators — fusing or splitting the loops is
    * bit-identical), and rounding to the 1e-4 grid is monotone, so
    * max-then-round equals the old round-then-max; the bin census then
    * groups ≤ 41 bins.
    */
  def semanticDecontam(emb: DataFrame, evalLabel: Int = 0): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    // driver-sized model state by contract: a benchmark suite, not a
    // corpus slice. The guard turns a silent driver OOM at absurd eval
    // sizes into a named contract violation.
    val evalRows = emb.filter(col("label") === evalLabel)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    require(evalRows.length <= 1000000,
      s"eval suite has ${evalRows.length} vectors; semanticDecontam " +
        "broadcasts it as a bounded benchmark set (<= 1e6). A larger " +
        "'eval suite' is a corpus split, not a benchmark — decontaminate " +
        "against its ANN index instead.")
    val bc = sp.sparkContext.broadcast {
      val ids = evalRows.map(_._1)
      val vecs = evalRows.map(_._2)
      val norms = vecs.map { e =>
        var s = 0.0; var i = 0
        while (i < e.length) { val y = e(i).toDouble; s += y * y; i += 1 }
        math.sqrt(s)
      }
      (ids, vecs, norms)
    }
    // the kernel does evals x dim work PER ROW — wall-clock is bounded
    // by input parallelism, and a ~50 MB embeddings file arrives as one
    // scan split (shuffle-free input: the Par probe runs no job)
    val cmaxPerVec = emb.filter(col("label") =!= evalLabel)
      .select(col("vec_id"), col("embedding"))
      .transform(Par.ensure)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (eids, evecs, enorms) = bc.value
        it.flatMap { case (id, v) =>
          val n = v.length
          var nv = 0.0
          var i = 0
          while (i < n) { val x = v(i).toDouble; nv += x * x; i += 1 }
          val vnorm = math.sqrt(nv)
          var best = Double.NegativeInfinity
          var any = false
          var j = 0
          while (j < evecs.length) {
            if (eids(j) != id) { // mirrors the old vec_id =!= e_id join
              any = true
              val e = evecs(j)
              val c = if (e.length == n) {
                var dot = 0.0; var k = 0
                while (k < n) { dot += v(k).toDouble * e(k).toDouble; k += 1 }
                val denom = vnorm * enorms(j)
                if (denom == 0.0) 0.0 else dot / denom
              } else { // ragged dims: per-pair norms over min(len), the
                // exact CosineSimilarity recurrence
                val m = math.min(n, e.length)
                var dot = 0.0; var na = 0.0; var nb = 0.0; var k = 0
                while (k < m) {
                  val x = v(k).toDouble; val y = e(k).toDouble
                  dot += x * y; na += x * x; nb += y * y; k += 1
                }
                val denom = math.sqrt(na) * math.sqrt(nb)
                if (denom == 0.0) 0.0 else dot / denom
              }
              if (c > best) best = c
            }
            j += 1
          }
          if (!any) Iterator.empty
          else {
            // Spark round(x, 0): BigDecimal-of-double HALF_UP; CAST to
            // BIGINT is then exact — longValue() of the scaled value
            val cmax = java.math.BigDecimal.valueOf(best * 10000.0)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            Iterator.single((id, cmax))
          }
        }
      }
    cmaxPerVec.toDF("vec_id", "cmax")
      // +10000 keeps the dividend non-negative: Spark `div` truncates,
      // ANSI `//` floors — identical only for non-negative operands
      .groupBy(expr("(cmax + 10000) div 500").as("bin"))
      .agg(count(lit(1)).as("n_vecs"), max(col("cmax")).as("cm"))
      .select(col("bin"), col("n_vecs"),
        round(col("cm").cast("double") / 10000, 4).as("max_in_bin"))
      .orderBy(col("bin"))
  }

  /** Rank-aware twin of [[matryoshkaRecall]]: NDCG@k of the
    * prefix-truncated cosine ranking, using graded relevance from the
    * full-dimension ranking (`rel = k+1 − full_rank` for the true top-k,
    * 0 beyond — so swapping positions 1↔2 costs more than 9↔10, which
    * set-overlap recall cannot see). Reported as an NDCG-band census
    * over the anchor slice plus each band's exact mean.
    *
    * Portability: relevances are INTEGERS, positions are integers, and
    * IDCG is the same closed-form constant in both engines, so every
    * DCG term is `int / log2(int + 1)` — identical operands. Per-anchor
    * NDCG quantizes to the 1e-6 integer grid before the band census;
    * band means divide exact BIGINT sums (< 2⁵³) once. Scale shape is
    * the q302 frame: bounded anchor slice broadcast, corpus streamed,
    * per-anchor windows partitioned by anchor id.
    */
  /** Ideal DCG@k for the graded relevances `k..1` — ONE shared double
    * literal: [[truncationNdcg]] divides by it and the q311 oracle SQL
    * interpolates the identical `Double.toString` round-trip literal, so
    * neither engine recomputes the log sum (whose summation order and
    * libm could differ in the last ulp).
    */
  def ndcgIdcg(k: Int): Double =
    (1 to k).map(i => (k + 1 - i) / (math.log(i + 1) / math.log(2))).sum

  def truncationNdcg(emb: DataFrame, k: Int = 10, truncDim: Int = 16,
      maxId: Long = 128L): DataFrame = {
    val anchors = emb.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("a_id"), col("embedding").as("e_a"))
    // same width guard as [[matryoshkaRecall]] — the pair kernel must
    // not inherit a 1-split fixture scan (q309 lesson)
    val pairs = Par.ensure(emb.select(col("vec_id").as("b_id"),
        col("embedding").as("e_b")))
      .join(broadcast(anchors), col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("e_a"), col("e_b")), 4).as("c_full"),
        round(cosine(slice(col("e_a"), 1, truncDim),
          slice(col("e_b"), 1, truncDim)), 4).as("c_trunc"))
    val ranked = pairs
      .withColumn("full_rank", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("c_full").desc,
          col("b_id"))))
      .withColumn("trunc_rank", row_number().over(
        Window.partitionBy(col("a_id")).orderBy(col("c_trunc").desc,
          col("b_id"))))
      .filter(col("trunc_rank") <= k)
      .withColumn("rel",
        greatest(lit(0), lit(k + 1) - col("full_rank")).cast("double"))
    ranked.groupBy(col("a_id"))
      .agg(expr(
        "CAST(round(sum(rel / log2(CAST(trunc_rank AS DOUBLE) + 1)) / " +
          s"${ndcgIdcg(k)} * 1e6, 0) AS BIGINT)").as("ndcg6"))
      .groupBy(expr("ndcg6 div 100000").as("band"))
      .agg(count(lit(1)).as("n_anchors"),
        sum(col("ndcg6")).as("s6"))
      .select(col("band"), col("n_anchors"),
        round(col("s6").cast("double") / col("n_anchors") / 1e6, 6)
          .as("mean_ndcg"))
      .orderBy(col("band"))
  }
}
