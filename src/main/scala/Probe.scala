import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-loop probe (delete before round close): decompose per-query wall
  * time into plan-build / planning / execution, with listener-side job,
  * task-time and GC sums. Usage:
  *   sbt "runMain Probe <sfDir> <cpus> <name1,name2,...>"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = args(1).toInt
    val names = args(2).split(',').toSeq
    val spark = graft.GraftSession.local(cpus)

    val nJobs = new AtomicInteger
    val nStages = new AtomicInteger
    val nTasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val cpuNs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { nJobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { nStages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        }
        ()
      }
    })

    // warmup at smallest sf
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.operators.Scratch.releaseAll(spark)
    }

    (1 to 3).foreach { pass =>
      graft.operators.Dedup.invalidateSharedPairs(spark)
      graft.operators.Similarity.invalidateIndexes(spark)
      graft.operators.Corpus.invalidateSharedCounts(spark)
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        nJobs.set(0); nStages.set(0); nTasks.set(0)
        taskMs.set(0); gcMs.set(0); cpuNs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        val _ = df.queryExecution.executedPlan // analysis+optimization+physical
        val t2 = System.nanoTime()
        val cnt = df.count()
        val t3 = System.nanoTime()
        Thread.sleep(200) // let listener events drain
        println(f"PROBE pass=$pass q=$n rows=$cnt total=${(t3-t0)/1e9}%.3f " +
          f"build=${(t1-t0)/1e9}%.3f plan=${(t2-t1)/1e9}%.3f exec=${(t3-t2)/1e9}%.3f " +
          f"jobs=${nJobs.get} stages=${nStages.get} tasks=${nTasks.get} " +
          f"taskTime=${taskMs.get/1000.0}%.3f cpu=${cpuNs.get/1e9}%.3f gc=${gcMs.get/1000.0}%.3f")
        graft.operators.Scratch.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
