package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`): element-wise mean of a vector
  * column — the custom-aggregate surface of the engine (SURVEY §2.10).
  *
  * Scale: the buffer is one (dim-length double array, count) pair per
  * group per partition; partial aggregation means the shuffle carries one
  * buffer per (group, map task), exactly like a built-in avg. Dimension is
  * discovered from the first row; a mismatched vector anywhere in the
  * group fails loudly rather than silently truncating the centroid.
  *
  * The input type is `Seq[Double]` with [[column]] widening the argument
  * explicitly: embedding stores ship either list<float> or list<double>
  * between fixture generations (the events-ts lesson), and an IN encoder
  * typed to Seq[Float] would make Spark silently NARROW a double column
  * to float at the aggregate boundary — precision loss no correctness
  * gate would catch. float→double widening is exact, so both encodings
  * produce bit-identical centroids (pinned in VectorSpec).
  */
object VectorAvg extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    val s = if (b._1.isEmpty) new Array[Double](v.size) else b._1
    require(v.size == s.length,
      s"VectorAvg: dimension mismatch within group (${v.size} vs ${s.length})")
    var i = 0
    while (i < s.length) { s(i) += v(i); i += 1 }
    (s, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) =
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      require(x._1.length == y._1.length,
        s"VectorAvg: dimension mismatch across partials (${x._1.length} vs ${y._1.length})")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.toSeq.map(_ / b._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Column function: vec_avg(embedding). The explicit widening cast is
    * the whole dual-encoding contract: float input widens losslessly,
    * double input passes through, and nothing ever narrows.
    */
  def column(c: Column): Column = {
    implicit val in: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
    udaf(this).apply(c.cast("array<double>"))
  }
}
