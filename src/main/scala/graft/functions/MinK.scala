package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF: the `k` SMALLEST values of a long column per group, as a
  * sorted array — the deterministic per-key cap primitive (SURVEY §2.10
  * surface, same family as [[VectorAvg]]).
  *
  * Why not `row_number() OVER (PARTITION BY key ORDER BY v) <= k`: a
  * rank window ships EVERY row of a group to one task before any row
  * can be ranked, so a hot key (a blocking key whose membership grows
  * with the table — the q221 lesson) becomes a single-reducer sort of
  * the whole group. This aggregate is map-side bounded instead: the
  * buffer never exceeds `2k` entries between compactions, partial
  * aggregation runs in every map task, and the shuffle carries one
  * ≤`k`-entry buffer per (group, map task) — per-group cost is O(k),
  * independent of group size, exactly like a built-in `min`.
  *
  * Buffer mechanics: `(slots, used)` with `slots` preallocated to `2k`
  * on first use; appends are O(1) in-place writes (typed Aggregators
  * may mutate and return the buffer — the [[VectorAvg]] discipline),
  * and a full buffer compacts in place (sort the prefix, keep the `k`
  * smallest) so per-row amortized cost stays O(k) worst-case with no
  * per-row allocation. Determinism: the k-smallest SET of a column is
  * order-free; ties are whole values, so duplicates are kept by
  * multiplicity and the finished array is unique given the input
  * multiset regardless of partitioning (pinned in MinKSpec).
  */
class MinK(k: Int) extends Aggregator[Long, (Array[Long], Int), Array[Long]]
    with Serializable {
  require(k >= 1, s"MinK: k must be >= 1, got $k")

  private def compact(slots: Array[Long], used: Int): Int =
    if (used <= k) used
    else {
      java.util.Arrays.sort(slots, 0, used)
      k
    }

  override def zero: (Array[Long], Int) = (Array.emptyLongArray, 0)

  override def reduce(b: (Array[Long], Int), v: Long): (Array[Long], Int) = {
    val slots = if (b._1.isEmpty) new Array[Long](2 * k) else b._1
    var used = b._2
    if (used == slots.length) used = compact(slots, used)
    slots(used) = v
    (slots, used + 1)
  }

  override def merge(x: (Array[Long], Int), y: (Array[Long], Int)): (Array[Long], Int) = {
    if (y._2 == 0) x
    else if (x._2 == 0) y
    else {
      val xu = compact(x._1, x._2)
      val yu = compact(y._1, y._2)
      val slots = if (x._1.length >= xu + yu) x._1 else new Array[Long](2 * k)
      if (!(slots eq x._1)) System.arraycopy(x._1, 0, slots, 0, xu)
      System.arraycopy(y._1, 0, slots, xu, yu)
      (slots, compact(slots, xu + yu))
    }
  }

  override def finish(b: (Array[Long], Int)): Array[Long] = {
    val used = compact(b._1, b._2)
    val out = java.util.Arrays.copyOf(b._1, used)
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[(Array[Long], Int)] =
    ExpressionEncoder[(Array[Long], Int)]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object MinK {
  /** Column function: `min_k(c, k)` — the k smallest values of `c` per
    * group, sorted ascending.
    */
  def column(c: Column, k: Int): Column = udaf(new MinK(k)).apply(c)
}
