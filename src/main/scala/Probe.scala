import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = new graft.cube.Engine(spark, d).table("embeddings")
      val probed = graft.operators.Similarity.ivfTopK(emb, 0L, 10, datasetKey = d)
        .collect().map(_.getLong(0)).toSet
      val exact = graft.operators.Similarity.ivfTopK(emb, 0L, 10,
        nlist = 16, nprobe = 16, datasetKey = d)
        .collect().map(_.getLong(0)).toSet
      println(s"PROBE_RESULT $d hits=${(probed intersect exact).size} of ${exact.size}")
    }
    spark.stop()
  }
}
