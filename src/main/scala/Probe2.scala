/** Dev probe: cost of parquet schema inference per read (delete before
  * round close). Compares spark.read.parquet vs spark.read.schema(...).
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    val tables = Seq("lineitem", "orders", "customer", "nation", "region",
      "events", "documents", "embeddings", "part", "supplier")
    // warm
    tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").schema)
    val t0 = System.nanoTime()
    (1 to 20).foreach { _ =>
      tables.foreach(t => spark.read.parquet(s"$dir/$t.parquet").schema)
    }
    val t1 = System.nanoTime()
    val schemas = tables.map(t => t -> spark.read.parquet(s"$dir/$t.parquet").schema).toMap
    val t2 = System.nanoTime()
    (1 to 20).foreach { _ =>
      tables.foreach(t => spark.read.schema(schemas(t)).parquet(s"$dir/$t.parquet").schema)
    }
    val t3 = System.nanoTime()
    println(f"PROBE2 infer_per_read=${(t1-t0)/1e9/200}%.4f s  with_schema_per_read=${(t3-t2)/1e9/200}%.4f s")
    // also: does .count() on a pre-schema'd read still work identically
    val a = spark.read.parquet(s"$dir/lineitem.parquet").count()
    val b = spark.read.schema(schemas("lineitem")).parquet(s"$dir/lineitem.parquet").count()
    println(s"PROBE2 counts $a $b")
    spark.stop()
  }
}
