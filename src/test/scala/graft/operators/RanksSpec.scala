package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ranks

/** Pins the distributed-rank machinery to the window functions it
  * replaces: [[Ranks.globalRowNumber]] must equal `row_number()` over an
  * unpartitioned window, and [[Ranks.globalNtile]] must be BIT-IDENTICAL
  * to `ntile(k)` — including the SQL-standard remainder rule (the first
  * `n % k` tiles get one extra row), the `n < k` degenerate case, and
  * exact-division sizes, and [[Ranks.globalPrefixSum]] must equal an
  * unpartitioned running-sum window on integer values. Every
  * scale-sensitive operator that swapped a global window for this
  * machinery (q68, q75, q124, q180, q243, q248, q252, q259, q262,
  * q286, q290) inherits its correctness from these equivalences.
  */
class RanksSpec extends SparkFunSuite {

  import graft.SparkTestBase.spark.implicits._

  private def frame(n: Int) = {
    // deterministic scrambled values with ties, spread over partitions
    (1 to n).map(i => ((i * 37) % 11, i.toLong))
      .toDF("v", "id").repartition(7)
  }

  test("globalRowNumber equals an unpartitioned row_number window") {
    for (n <- Seq(1, 2, 7, 100)) {
      val df = frame(n)
      val expect = df.withColumn("rk",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select(col("id"), col("rk"))
      val got = Ranks.globalRowNumber(df, Seq(col("v"), col("id")), "rk")
        .select(col("id"), col("rk"))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        s"rank mismatch at n=$n")
    }
  }

  test("globalRowNumber totalCol carries the exact frame count") {
    val got = Ranks.globalRowNumber(frame(23), Seq(col("v"), col("id")),
        "rk", Some("n"))
      .select(col("n")).distinct().collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(23L))
  }

  test("globalNtile is bit-identical to the ntile window across sizes and bucket counts") {
    // n < k (every row its own tile), n == k, exact division, and the
    // remainder rule (first n % k tiles one row larger)
    for (n <- Seq(1, 3, 4, 8, 10, 97); k <- Seq(2, 4, 5)) {
      val df = frame(n)
      val expect = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select(col("id"), col("t"))
      val got = Ranks.globalNtile(df, Seq(col("v"), col("id")), k, "t")
        .select(col("id"), col("t"))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
        s"ntile mismatch at n=$n k=$k")
    }
  }

  test("globalNtile rejects non-positive bucket counts") {
    intercept[IllegalArgumentException] {
      Ranks.globalNtile(frame(4), Seq(col("id")), 0, "t")
    }
  }

  test("globalPrefixSum equals an unpartitioned running-sum window") {
    for (n <- Seq(1, 2, 7, 100)) {
      val df = (1 to n).map(i => (i.toLong, ((i * 37) % 11).toLong))
        .toDF("id", "x").repartition(7)
      val expect = df.withColumn("cum",
        sum(col("x")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
      val full = Ranks.globalPrefixSum(df, Seq(col("id")), "x", "cum")
      // schema contract: input columns + outCol, NO scratch leakage —
      // consumers feed this straight to oracle-hashed outputs (q259)
      assert(full.columns.toSeq == df.columns.toSeq :+ "cum")
      val got = full
        .select("id", "cum").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expect, s"n=$n")
      graft.operators.Scratch.releaseAll(graft.SparkTestBase.spark)
    }
  }

  test("globalPrefixSum refuses clashing columns") {
    intercept[IllegalArgumentException] {
      Ranks.globalPrefixSum(frame(4).withColumn("cum", lit(1L)),
        Seq(col("id")), "v", "cum")
    }
  }

  test("globalPrefixSum enforces the integer-value contract") {
    // a double value column would make the two-level sum depend on the
    // range-partition boundaries (ulp drift) — must fail fast
    val dbl = frame(4).withColumn("x", col("v").cast("double"))
    intercept[IllegalArgumentException] {
      Ranks.globalPrefixSum(dbl, Seq(col("id")), "x", "cum")
    }
    // and a misspelled column fails with a named reason, not a plan error
    intercept[IllegalArgumentException] {
      Ranks.globalPrefixSum(frame(4), Seq(col("id")), "nope", "cum")
    }
  }

  test("globalRowNumber refuses inputs that already carry its output or scratch columns") {
    val clash = frame(4).withColumn("rk", lit(1L))
    intercept[IllegalArgumentException] {
      Ranks.globalRowNumber(clash, Seq(col("id")), "rk")
    }
    val scratch = frame(4).withColumn("__pid", lit(0))
    intercept[IllegalArgumentException] {
      Ranks.globalRowNumber(scratch, Seq(col("id")), "rk2")
    }
  }
}
