package graft.operators

import graft.SparkFunSuite

/** Triangle-census semantics on crafted graphs (the q102 oracle proves
  * parity at fixture scale; these pin the edge cases — hub stars, shared
  * edges — and the exactly-once enumeration the degree-ordering is for).
  */
class GraphSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def pairsOf(es: (Long, Long)*) = es.toDF("doc_a", "doc_b")

  test("one triangle plus a pendant edge counts each corner once") {
    val out = Graph.triangleCounts(pairsOf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // node 4 closes no triangle and must be absent, not zero
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("a star has no triangles regardless of hub degree") {
    val star = pairsOf((1L to 20L).map(i => (0L, i)): _*)
    assert(Graph.triangleCounts(star).collect().isEmpty)
  }

  test("K4 gives three triangles per node, exactly-once enumeration") {
    val k4 = pairsOf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val out = Graph.triangleCounts(k4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // C(4,3) = 4 triangles; each node sits on C(3,2) = 3 of them
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("two triangles sharing an edge double-count only the shared endpoints") {
    val out = Graph.triangleCounts(
      pairsOf((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }
}
