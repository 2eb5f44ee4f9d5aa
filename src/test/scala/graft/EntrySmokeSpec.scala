package graft

/** The driver's t1 smoke gate in-suite: `SparkEntry.entry` must return
  * rows > 0 on the sf0.001 fixture. Everything else in the registry is
  * oracle-gated per query; `entry` alone was only ever exercised by the
  * driver, so a refactor breaking just the flagship path would surface
  * in the round artifacts instead of here — this pins it locally.
  */
class EntrySmokeSpec extends SparkFunSuite {
  test("entry returns rows on the sf0.001 fixture (driver t1 gate)") {
    val n = SparkEntry.entry(SparkTestBase.spark).count()
    assert(n > 0, s"entry must return rows, got $n")
  }
}
