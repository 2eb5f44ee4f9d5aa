package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Pins [[JaroWinkler]] to the exact values DuckDB's
  * `jaro_winkler_similarity` produces (probed directly against DuckDB):
  * the match-window floor, INTEGER transposition halving (a 3-cycle
  * counts 1, not 1.5), the strict 0.7 boost gate, and the 4-char prefix
  * cap. These cases each discriminate one semantic choice — a
  * "reasonable" alternative implementation fails at least one.
  */
class JaroWinklerSpec extends SparkFunSuite {

  private val eps = 1e-12

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(a, b)

  test("classic textbook pairs match DuckDB bit-for-bit") {
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < eps)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < eps)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < eps)
  }

  test("window floor: adjacent transposition in 2-char strings scores 0") {
    assert(jw("ab", "ba") == 0.0)
    assert(jw("a", "a") == 1.0)
  }

  test("window excludes out-of-range matches (CRATE/TRACE loses C and T)") {
    // m = 3 of 5, t = 0 — NOT the all-match m=5 t=1 a wider window gives
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < eps)
  }

  test("3-cycle transpositions halve by integer division") {
    // trans = 3 -> t = 1 (not 1.5): jaro = (1 + 1 + 7/8) / 3
    assert(math.abs(jw("abcdxyzw", "bcadxyzw") - 0.9583333333333334) < eps)
  }

  test("prefix bonus caps at 4 shared characters") {
    assert(math.abs(jw("aaaaab", "aaaaac") - 0.9333333333333333) < eps)
  }

  test("boost applies only above 0.7 jaro") {
    // jaro 0.5556 with a 2-char common prefix: no boost
    assert(math.abs(jw("abcdef", "abzzzz") - 0.5555555555555555) < eps)
    assert(math.abs(jw("abcdefgh", "abcdxxxx") - 0.6666666666666666) < eps)
  }

  test("empty-string edge cases") {
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
  }

  test("column wrapper and SQL registration evaluate the same expression") {
    import graft.SparkTestBase.spark.implicits._
    val df = Seq(("DWAYNE", "DUANE")).toDF("a", "b")
    val viaColumn = df.select(
      TextExpressions.jaroWinkler(col("a"), col("b"))).head.getDouble(0)
    TextExpressions.register(spark)
    val viaSql = df.selectExpr("jaro_winkler(a, b)").head.getDouble(0)
    assert(viaColumn == viaSql)
    assert(math.abs(viaColumn - 0.8400000000000001) < eps)
  }
}
