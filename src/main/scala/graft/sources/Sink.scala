package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
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

  /** Training-shard writer: exactly `shards` equal-weight output files,
    * membership decided by the deterministic multiplicative hash of
    * `idCol` (reproducible across runs and cluster sizes — a re-run
    * produces byte-identical shard membership, which checkpointed
    * training loaders depend on), rows sorted by `idCol` within each
    * shard, and `maxRecordsPerFile` bounding any one file so a single
    * loader task never gets an unbounded read. This is the terminal
    * stage of the curation pipeline: `Corpus.curate` → shards.
    */
  def writeTrainingShards(
      df: DataFrame,
      path: String,
      idCol: String,
      shards: Int,
      maxRecordsPerFile: Long = 0L): Unit =
    df.repartition(shards, pmod(col(idCol) * lit(2654435761L), lit(shards)))
      .sortWithinPartitions(col(idCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
