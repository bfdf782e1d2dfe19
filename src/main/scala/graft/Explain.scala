package graft

/** Dev tool: print the formatted physical plan of registered queries
  * without executing them — the `.explain("formatted")` audit loop from
  * SURVEY §4, one command per query family.
  *
  * Run: `sbt "runMain graft.Explain q95 q31"` (args are query-name
  * prefixes; `SPARK_GRAFT_SF_DIR` overrides the default sf0.01 dir).
  * Queries whose construction is eager (kernel materialization) will run
  * those jobs; the final frame itself is only planned, never executed.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Harness.session("graft-explain")
    val wanted = if (args.isEmpty) Seq("") else args.toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        println(s"===== $name")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain] $name failed: $e") }
      }
    spark.stop()
  }
}
