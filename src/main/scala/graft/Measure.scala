package graft

/** Dev tool: stable per-query timing for optimization work — runs each
  * named query `SPARK_GRAFT_MEASURE_REPS` times (default 3) in one warm
  * JVM and reports min/median, so a ±20% machine-noise swing cannot be
  * mistaken for a code effect. The bench contract is untouched: this is
  * a separate main with the same session shape as [[Bench]].
  */
object Measure {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MEASURE_REPS", "3").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val wanted = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted.isEmpty || wanted.exists(q._1.startsWith))
    selected.foreach { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          System.err.println(s"[measure] $name FAILED: ${e.getMessage}") }
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        t
      }.sorted
      println(f"[measure] $name%-32s min=${ts.head}%6.2f med=${ts(ts.size / 2)}%6.2f max=${ts.last}%6.2f")
    }
    spark.stop()
  }
}
