package graft

import org.apache.spark.sql.SparkSession

/** Shared setup for the beyond-bench-SF harness mains ([[Stress]],
  * [[DedupStress]], [[AnnStress]]): one session recipe and one stopwatch,
  * so the numbers the harnesses print stay comparable with each other —
  * a config drift between them would silently skew a cross-harness
  * comparison.
  */
object Harness {

  /** local[SPARK_GRAFT_CPUS] session with the bench conf set. */
  def session(name: String, defaultCpus: String = "8"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (4 * 1024 * 1024).toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }
}
