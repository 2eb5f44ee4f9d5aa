package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins and aggregations whose key
  * distribution is pathological (one viral key = one straggler partition).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense and needs no code. These
  * utilities are the explicit fallback for cases AQE cannot split — e.g.
  * a shuffle HASH join whose single hot key exceeds a partition, or a
  * two-phase aggregation where partial aggregation alone doesn't help
  * because the grouping key itself is hot.
  */
object Skew {

  /** The salt expression: a per-partition counter (the low bits of
    * monotonically_increasing_id) mod saltFactor — round-robin within
    * each input partition. Deterministic per task attempt (the counter
    * replays identically for a deterministic input split), and — unlike
    * a hash of the row — it spreads FULLY IDENTICAL duplicate rows, the
    * most common hot-key degenerate case, evenly over all salts.
    */
  private[operators] def salt(saltFactor: Int): org.apache.spark.sql.Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Salted equi-join of a skewed `big` side against a smaller `right`
    * side: big rows get a deterministic salt in [0, saltFactor); `right`
    * is replicated saltFactor times (explode of a literal range — cheap
    * when `right` is the small side); the join key becomes (key, salt),
    * spreading each hot key over saltFactor partitions.
    *
    * Semantics: exactly an inner equi-join on `key` — verified in
    * SkewSpec against the plain join.
    */
  def saltedJoin(
      big: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = big.withColumn("__salt", salt(saltFactor))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(key) === replicated(key))
      .drop("__salt").drop(replicated(key))
  }

  /** Two-phase aggregation for hot grouping keys: first aggregate on
    * (keys, salt), then re-aggregate on keys. `partials` maps each output
    * column to its phase-1 aggregate; `finals` re-combines phase-1 results
    * (e.g. sum -> sum, count -> sum, min -> min).
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      partials: Map[String, org.apache.spark.sql.Column],
      finals: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val salted = df.withColumn("__salt", salt(saltFactor))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }
}
