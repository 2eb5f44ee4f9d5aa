package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Write-path utilities (the reference has no sink — results return
  * in-memory, `oec.py:25`/`oec.py:66`; SURVEY §2.1 S5 — these are the
  * [EXT] pipeline sinks a 100 TB deployment needs).
  */
object Sink {

  /** Hive-style partitioned parquet: one directory per partition value.
    * At scale this is what makes downstream cut-by-partition-column
    * queries prune I/O (dynamic partition pruning reads only matching
    * directories). Sorts within partitions for row-group locality.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Seq.empty): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.sortWithinPartitions(sortCols.map(col): _*)
    sorted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Pre-shuffled ("bucketed-shape") parquet: repartition by the join/agg
    * key into a fixed bucket count and sort within buckets, so a consumer
    * that re-reads and joins on `keyCol` shuffles co-located data (and
    * parquet row groups arrive key-clustered for min/max skipping).
    * True metastore bucketing needs saveAsTable + a warehouse; this is
    * the table-less equivalent shape.
    */
  def writeKeyClustered(
      df: DataFrame,
      path: String,
      keyCol: String,
      buckets: Int): Unit =
    df.repartition(buckets, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** True metastore bucketing: `bucketBy` + `saveAsTable`, so the
    * catalog records the hash distribution and two tables bucketed into
    * the SAME count on their join keys sort-merge-join with NO shuffle
    * exchange on either side (asserted in SkewSinkSpec). This is the
    * co-location contract for repeatedly-joined 100 TB fact tables —
    * shuffle once at write time, never again at read time.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keyCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)

  /** Drop a managed table AND clear an orphaned warehouse location. The
    * two can disagree: a managed table written by another JVM leaves its
    * directory under the (shared) warehouse while THIS session's
    * in-memory catalog has no entry for it — `DROP TABLE IF EXISTS` is
    * then a no-op and the next `saveAsTable` fails with
    * LOCATION_ALREADY_EXISTS. Callers that rewrite a managed table from
    * a fresh session (Verify/Bench run one JVM per invocation) clear
    * both sides first. Hadoop FileSystem API, same discipline as the
    * index layouts.
    */
  def dropManaged(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  /** Training-shard writer: exactly `shards` equal-weight output files,
    * membership decided by the deterministic multiplicative hash of
    * `idCol` (reproducible across runs and cluster sizes — a re-run
    * produces byte-identical shard membership, which checkpointed
    * training loaders depend on), rows sorted by `idCol` within each
    * shard, and `maxRecordsPerFile` bounding any one file so a single
    * loader task never gets an unbounded read. This is the terminal
    * stage of the curation pipeline: `Corpus.curate` → shards.
    *
    * The hash is [[shardOf]] — the id is masked to its low 31 bits
    * BEFORE the Knuth multiply, so the product is bounded by
    * 2^31 * 2654435761 < 2^63: no silent long wrap in Spark (non-ANSI
    * wraps; ANSI engines trap), and the membership formula stays
    * byte-identical on any engine for the FULL long domain, negative
    * ids included.
    */
  def writeTrainingShards(
      df: DataFrame,
      path: String,
      idCol: String,
      shards: Int,
      maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(shards, shardOf(col(idCol), shards))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Shard membership of an id: `((id & 0x7FFFFFFF) * 2654435761) % shards`
    * — overflow-free (see [[writeTrainingShards]]), so readers/oracles can
    * recompute it portably.
    */
  def shardOf(id: Column, shards: Int): Column =
    pmod(id.bitwiseAND(lit(0x7FFFFFFFL)) * lit(2654435761L), lit(shards))

  /** Spread the low 16 bits of `c` to even bit positions (Morton
    * "Part1By1"): pure built-in bit ops, so the whole z-value computation
    * stays inside whole-stage codegen.
    */
  private def spreadBits(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Z-value (Morton code) of two numeric columns, each linearly bucketed
    * into 16 bits over its global [min, max]. Exposed so readers/tests can
    * recompute the clustering key.
    */
  def zValue(df: DataFrame, c1: String, c2: String): Column = {
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def bucket(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0))
        .cast("long")
    spreadBits(bucket(c1, r.getDouble(0), r.getDouble(1)))
      .bitwiseOR(shiftleft(spreadBits(bucket(c2, r.getDouble(2), r.getDouble(3))), 1))
  }

  /** Z-order-clustered parquet: rows range-partitioned and sorted by the
    * Morton interleave of TWO key columns, so every output file covers a
    * compact rectangle in (c1, c2) space and parquet footer min/max
    * statistics prune files for selective predicates on EITHER column —
    * the multi-dimensional data-skipping layout a single-column sort
    * cannot give (sorting by c1 leaves c2's per-file span at ~100% of its
    * range; z-ordering shrinks both to ~sqrt(files) blocks; asserted on
    * real footer spans in SkewSinkSpec). The min/max pre-pass is one
    * cheap agg; the write itself is one range shuffle, same cost as a
    * plain global sort.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      c1: String,
      c2: String,
      files: Int): Unit =
    df.withColumn("__z", zValue(df, c1, c2))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetBytes) files — the operational answer to the
    * small-files problem (a streaming sink or over-parallel writer
    * leaves thousands of KB-sized files; every later scan then pays a
    * task and an open per file, and the NameNode/listing pays the
    * metadata). Sizing is by OBSERVED on-disk bytes via the Hadoop
    * FileSystem API (works on HDFS/S3 roots too), not file count — a
    * directory of many tiny files and one of few big files both land on
    * the byte-targeted layout. The rewrite is a plain scan →
    * round-robin repartition → write: one pass, no shuffle key, rows
    * preserved exactly (roundtrip identity is q153's oracle). Returns
    * (files_before, bytes_total, files_after).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): (Int, Long, Int) = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(p).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet"))
    val bytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, bytes, after)
  }
}
