package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the machinery behind every "rank the
  * whole frame" operator ([[Relational.revenueQuartiles]]'s customer
  * quartiles, [[Corpus.zipfReport]]'s vocabulary rank). A
  * `Window.orderBy` with no partitioning plans as a single-partition
  * sort of the ENTIRE frame — fine at fixture scale, a
  * straggler-then-OOM when the frame is 10^8+ rows (every customer; a
  * web-scale token vocabulary with its typo/URL/code tail). Instead:
  * range-partition on the total order, `row_number` locally per
  * partition, then add broadcast per-partition row-count offsets — the
  * same prefix-sum shape [[Corpus.packSequences]] proves. The only
  * un-partitioned window left runs over ONE ROW PER PARTITION, bounded
  * by cluster size, not data size.
  */
object Ranks {

  /** Append a 1-based global `row_number` column to `df` under the total
    * order `order` (which must be deterministic — include a tie-break
    * key). Optionally also append the frame's total row count
    * (`totalCol`), computed on the same tiny offsets frame so rank
    * consumers like percent_rank/ntile pay no extra pass.
    *
    * The range-partitioned frame is localCheckpoint'ed (and
    * Scratch-registered): range boundaries are sampled per
    * materialization, and the row frame and the offset frame must
    * observe the SAME cut.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankCol: String,
      totalCol: Option[String] = None): DataFrame = {
    val ranged = Scratch.register(df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint())
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val wPrev = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pn"))
      .withColumn("__poff", coalesce(sum(col("__pn")).over(wPrev), lit(0L)))
    val offsets = totalCol match {
      case Some(t) => offsets0.withColumn(t, sum(col("__pn")).over(wAll))
        .select(col("__pid"), col("__poff"), col(t))
      case None => offsets0.select(col("__pid"), col("__poff"))
    }
    ranged
      .withColumn("__local", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn(rankCol, col("__local") + col("__poff"))
      .drop("__pid", "__local", "__poff")
  }
}
