package graft.operators

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkFunSuite

/** The one-flag checkpoint-durability contract (`Scratch.stage`):
  * `spark.graft.reliableCheckpoint=false` (default) cuts lineage with
  * executor-local blocks; `=true` swaps every site in the engine to a
  * durable reliable `checkpoint()` for executor-churn clusters
  * (preemptible/spot fleets) — same plan shape, same results. A source
  * lint pins `stage` as the ONLY raw `localCheckpoint()` call site in
  * src/main, so the flag provably reaches every lineage cut: a new raw
  * call anywhere fails here and must route through the helper.
  */
class CheckpointModeSpec extends SparkFunSuite {

  test("raw localCheckpoint() is confined to Scratch.stage (lint)") {
    val root = Paths.get("src/main/scala")
    val hits = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => root.relativize(p).toString ->
        """\.localCheckpoint\(\)""".r.findAllIn(Files.readString(p)).size)
      .filter(_._2 > 0).toMap
    assert(hits == Map("graft/operators/Scratch.scala" -> 1),
      s"localCheckpoint() outside Scratch.stage: $hits — route new " +
        "lineage cuts through Scratch.stage so the durability flag " +
        "reaches them")
  }

  test("reliable mode without a checkpoint dir fails fast with a pointer") {
    val s2 = spark.newSession()
    import s2.implicits._
    s2.conf.set("spark.graft.reliableCheckpoint", "true")
    // the shared context has no checkpoint dir unless a test set one;
    // guard so this test is meaningful regardless of suite order
    assume(s2.sparkContext.getCheckpointDir.isEmpty)
    val e = intercept[IllegalArgumentException] {
      Scratch.stage(Seq(1, 2, 3).toDF("x"))
    }
    assert(e.getMessage.contains("setCheckpointDir"))
  }

  test("both modes produce identical results through a staged pipeline") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val sLocal = spark.newSession()
    val sReliable = spark.newSession()
    sReliable.conf.set("spark.graft.reliableCheckpoint", "true")
    spark.sparkContext.setCheckpointDir(dir)
    try {
      def run(s: org.apache.spark.sql.SparkSession): Set[(Long, Long)] = {
        import s.implicits._
        // triangle + pendant: pageRank iterates through stage barriers
        val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
          .toDF("src", "dst")
        Graph.pageRank(edges, iters = 6)
          .select($"node", ($"rank" * 1e6).cast("long"))
          .as[(Long, Long)].collect().toSet
      }
      val viaLocal = run(sLocal)
      val viaReliable = run(sReliable)
      assert(viaLocal == viaReliable)
      assert(viaLocal.nonEmpty)
      // the reliable run must have actually written durable state
      val wrote = Files.walk(Paths.get(dir)).iterator().asScala
        .exists(p => Files.isRegularFile(p))
      assert(wrote, "reliable mode left no files in the checkpoint dir")
      Scratch.releaseAll(sLocal); Scratch.releaseAll(sReliable)
    } finally {
      // the shared context outlives this suite: leave no dir behind
      spark.sparkContext.setCheckpointDir(null)
      val tmp = Paths.get(dir)
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
