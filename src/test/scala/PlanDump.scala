/** Dev tool (test sourceset — excluded from the main artifact): dump .explain("formatted") for
  * the named queries to <outDir>/<query>_<tag>.txt. When the tag ends in
  * "final", the query is additionally EXECUTED first and the AQE-final
  * executed plan (with ReusedExchange / AQEShuffleRead nodes resolved) is
  * appended — the formatted pre-execution dump alone cannot show stage
  * reuse.
  * Usage: sbt "Test/runMain PlanDump <sfDir> <outDir> <tag> <q1,q2,...>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1); val tag = args(2)
    val names = args(3).split(',').toSeq
    val spark = graft.GraftSession.local(32)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val txt =
        if (tag.endsWith("final")) {
          df.collect() // materialize so AQE finalizes every stage
          formatted + "\n\n== AQE Final Executed Plan ==\n" +
            df.queryExecution.executedPlan.toString
        } else formatted
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/${n}_$tag.txt"), txt)
      println(s"PLANDUMP wrote $out/${n}_$tag.txt")
      graft.operators.Scratch.releaseAll(spark)
    }
    spark.stop()
  }
}
