package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cube.Engine

/** Fuzzy string-match (edit-distance) join — entity resolution for dirty
  * catalog data. A `levenshtein(a, b) <= d` predicate has no equi key, so
  * naive Spark executes it as a broadcast nested-loop join: O(n·m)
  * distance computations — hopeless when both sides are large.
  *
  * The banded form exploits `|len(a) - len(b)| <= d` (an edit changes the
  * length by at most 1): quantize string length into buckets of width d,
  * replicate the PROBE side to bucket ± 1 (same guarantee as
  * `RangeJoin`: any pair within d shares exactly one replicated bucket),
  * shuffle equi-join on the bucket, and apply the exact distance
  * predicate only to co-bucketed candidates. Cost is bounded by the
  * length histogram, not n·m, and recall is exact — length banding can
  * only discard pairs the predicate would reject anyway.
  */
object Fuzzy {

  /** Edit-distance join: pairs from `left` × `right` with
    * `levenshtein(left(leftCol), right(rightCol)) <= maxDist`. Output
    * keeps all left/right columns plus `dist`. Exact (full recall).
    */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      leftCol: String, rightCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val w = lit(maxDist)
    val lb = floor(length(col(leftCol)) / w)
    val rb = floor(length(col(rightCol)) / w)
    val l = left.withColumn("__band", explode(array(lb - 1, lb, lb + 1)))
    val r = right.withColumn("__band", rb)
    l.join(r, Seq("__band"))
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("dist") <= maxDist)
      .drop("__band")
  }

  /** Fixture wiring (q82): resolve typo'd probe names back to the part
    * catalog. Probes are a deterministic corruption (every 23rd part,
    * 3rd character deleted) so both engines derive the identical probe
    * set; each probe must re-find its source (distance 1) and may match
    * other catalog rows within distance 2 (the part namespace is dense).
    */
  def partNameResolution(spark: SparkSession, dir: String,
      maxDist: Int = 2): DataFrame = {
    val part = new Engine(spark, dir).table("part")
    val probes = part
      .filter(pmod(col("p_partkey"), lit(23)) === 5)
      .select(col("p_partkey").as("probe_key"),
        concat(substring(col("p_name"), 1, 2),
          substring(col("p_name"), 4, 10000)).as("probe_name"))
    val catalog = part.select(col("p_partkey").as("match_key"),
      col("p_name").as("match_name"))
    editDistanceJoin(probes, catalog, "probe_name", "match_name", maxDist)
      .select(col("probe_key"), col("probe_name"), col("match_key"),
        col("match_name"), col("dist"))
      .orderBy(col("probe_key"), col("match_key"))
  }
}
