package graft

import org.apache.spark.sql.functions._

/** Dev micro-probe: time a lineitem scan+agg pipeline under different
  * file-split settings, to separate split-count effects from query shape.
  * Run: `sbt "runMain graft.ScanProbe"`.
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.session("graft-scanprobe", defaultCpus = "32")
    import spark.implicits._
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    val li = s"$sfDir/lineitem.parquet"
    // q74's shape: bloom build + one-row broadcast + probe + exact join
    graft.functions.GraftFunctions.register(spark)
    for (oc <- Seq(4L << 20, 128L << 10); rep <- 1 to 2) {
      spark.conf.set("spark.sql.files.openCostInBytes", oc.toString)
      timed(s"q74-shape oc=$oc rep=$rep") {
        val df = operators.ScaleOps.q74BloomPruneJoin(spark, sfDir)
        if (rep == 2 && oc == (128L << 10)) df.explain("formatted")
        df.count()
      }
    }
    for (oc <- Seq(4L << 20, 1L << 20, 128L << 10); rep <- 1 to 2) {
      spark.conf.set("spark.sql.files.openCostInBytes", oc.toString)
      timed(s"count oc=$oc rep=$rep") {
        spark.read.parquet(li).count()
      }
      timed(s"sum(price*disc) oc=$oc rep=$rep") {
        spark.read.parquet(li)
          .agg(sum($"l_extendedprice" * $"l_discount")).count()
      }
      timed(s"groupBy(orderkey%1000) oc=$oc rep=$rep") {
        spark.read.parquet(li)
          .groupBy(pmod($"l_orderkey", lit(1000))).agg(sum($"l_quantity"))
          .count()
      }
      timed(s"noop-write full oc=$oc rep=$rep") {
        spark.read.parquet(li).write.format("noop").mode("overwrite").save(); 0L
      }
    }
    spark.stop()
  }
}
