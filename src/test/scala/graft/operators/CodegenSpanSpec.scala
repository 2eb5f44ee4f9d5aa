package graft

/** Whole-stage-codegen span assertions for the hot paths: the
  * scan→filter→project→partial-aggregate pipeline of the flagship cube
  * query and the native vector expression in the similarity scan must
  * run INSIDE WholeStageCodegen (operators prefixed `*(n)` in the
  * executed plan). A custom expression that silently falls out of
  * codegen (a signature change breaking `doGenCode`, an interpreted
  * fallback) triples scan cost without failing any correctness gate —
  * this is the regression these assertions catch.
  */
class CodegenSpanSpec extends SparkFunSuite {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    graft.operators.Scratch.releaseAll(spark)
    plan
  }

  test("flagship cube query aggregates inside whole-stage codegen") {
    // executedPlan.toString marks codegen'd operators with a `*(stage)`
    // prefix (the word WholeStageCodegen only appears in formatted mode)
    val plan = executedPlan("q01_year_nation").split("== Initial Plan ==").head
    val partialAgg = plan.linesIterator
      .find(l => l.contains("HashAggregate") && l.contains("partial_"))
    assert(partialAgg.exists(_.contains("*(")),
      s"partial aggregate fell out of codegen: $partialAgg")
    // the scan-side project feeding it is in the same codegen stage
    val proj = plan.linesIterator
      .find(l => l.contains("Project") && l.contains("l_extendedprice"))
    assert(proj.exists(_.contains("*(")),
      s"scan-side project fell out of codegen: $proj")
  }

  test("native cosine expression stays inside the codegen'd scan stage") {
    val plan = executedPlan("q28_embed_knn").split("== Initial Plan ==").head
    val cosLine = plan.linesIterator.find(_.toLowerCase.contains("cosine"))
    assert(cosLine.isDefined, s"cosine expression not in plan:\n${plan.take(800)}")
    assert(cosLine.exists(_.contains("*(")),
      s"CosineSimilarity fell out of whole-stage codegen " +
        s"(doGenCode no longer engaging?): $cosLine")
  }
}
