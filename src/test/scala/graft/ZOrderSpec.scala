package graft

import org.apache.spark.sql.functions._

import graft.plans.ZOrder

/** Z-order clustering must (a) compute the Morton interleave exactly and
  * (b) actually produce the pruning-enabling layout: tight per-file
  * min/max ranges on BOTH dimensions, where a single-column sort only
  * bounds one.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits exactly (reference implementation on longs)") {
    def ref(xs: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits; (x, i) <- xs.zipWithIndex)
        z |= ((x >> b) & 1L) << (b * xs.size + i)
      z
    }
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 16).as("z"))
      .as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => ref(Seq(x, y), 16) })
    // 3-dimensional variant
    val g3 = Seq((3L, 5L, 6L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .as[Long].collect()(0)
    assert(g3 == ref(Seq(3L, 5L, 6L), 4))
  }

  test("z-clustered files bound BOTH dimensions; a linear sort bounds only one") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(pmod(col("l_partkey"), lit(1 << 10)).as("x"),
        pmod(col("l_orderkey"), lit(1 << 10)).as("y"))
    val nFiles = 8

    def meanRanges(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .collect()
      assert(perFile.length >= nFiles - 1, s"expected ~$nFiles files")
      (perFile.map(_.getAs[Number]("rx").doubleValue()).sum / perFile.length,
        perFile.map(_.getAs[Number]("ry").doubleValue()).sum / perFile.length)
    }

    val zDir = tmpDir("zorder")
    ZOrder.writeClustered(li, Seq(col("x"), col("y")), s"$zDir/z", nFiles, bits = 10)
    val (zx, zy) = meanRanges(s"$zDir/z")

    // baseline: linear sort on x only
    li.repartitionByRange(nFiles, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$zDir/linear")
    val (lx, ly) = meanRanges(s"$zDir/linear")

    // linear layout: x tightly bounded, y unbounded (~full 1024 range)
    assert(lx < 200, s"sanity: linear layout bounds x (got $lx)")
    assert(ly > 800, s"sanity: linear layout cannot bound y (got $ly)")
    // z layout: BOTH dims bounded well below the full range
    assert(zx < 0.7 * ly, s"z layout must bound x: $zx")
    assert(zy < 0.7 * ly, s"z layout must bound y: $zy vs linear's $ly")
  }
}
