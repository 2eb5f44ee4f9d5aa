package graft

/** Scale-soak runner: times a named subset of `SparkEntry.queries`
  * against an arbitrary fixture directory and dumps raw per-pass
  * seconds as JSON. The empirical half of the 100-TB argument: the
  * same queries timed at sf0.1 and at the 10x `tools/scaleup.py`
  * fixture give measured scale ratios (`tools/scale_report.py` joins
  * the two dumps into SCALE_r{N}.json), replacing "the plan shape
  * looks right" with numbers. Two passes per query with the session
  * memos cleared between them — pass 1 prices the cold pipeline
  * (index builds included), pass 2 the warm one — and a loadavg stamp
  * per pass makes host contention self-diagnosing, the Bench
  * discipline.
  *
  * Usage: runMain graft.Soak <sfDir> <name,name,...> <out.json>
  */
object Soak {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Soak <sfDir> <names-csv> <out.json>")
    val (sfDir, out) = (args(0), args(2))
    val names = args(1).split(',').toSeq.filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt)
    // untimed warmup at the smallest sf: JVM/codegen/parquet-footer
    // one-off costs stay out of pass 1
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      graft.operators.Scratch.releaseAll(spark)
    }
    def loadAvg1m(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loads = scala.collection.mutable.ArrayBuffer.empty[Double]
    val samples = (1 to 2).flatMap { _ =>
      loads += loadAvg1m()
      graft.operators.Dedup.invalidateSharedPairs(spark)
      graft.operators.Similarity.invalidateIndexes(spark)
      names.map { name =>
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[soak] $name failed: ${e.getMessage}"); false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Scratch.releaseAll(spark)
        name -> (if (ok) dt else -1.0)
      }
    }
    val qs = names.map { n =>
      val xs = samples.collect { case (`n`, t) => t }
      "\"" + n + "\":" + xs.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val line = s"""{"sf":"$sfDir","load_1m":${loads.mkString("[", ",", "]")},""" +
      s""""samples":$qs}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
    println(s"[soak] wrote $out")
  }
}
