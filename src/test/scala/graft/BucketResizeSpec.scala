package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.plans.MorMirror
import graft.sources.Tables.Warehouse

/** Bucket-spec evolution on the merge-on-read mirror (round-11 verdict
  * stretch item): resizing the bucket modulus through LIVE appends —
  * old base readable under its own recorded spec, new deltas under the
  * new spec, fold byte-equal at every step, and the next compaction
  * migrating the base as a side effect of its normal rewrite.
  */
class BucketResizeSpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = CdcConfig("id", "ts")

  private def df(rows: (Long, String, String, String)*) =
    rows.toDF("id", "name", "op", "ts").localCheckpoint(true)

  private def visible(wh: Warehouse): Set[(Long, String)] =
    MorMirror.read(spark, wh, "m").select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  private def baseKbDirs(wh: Warehouse): Set[Int] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(s"${wh.tablePath("m")}/base")
    val resolved =
      if (Files.isSymbolicLink(p)) p.getParent.resolve(Files.readSymbolicLink(p))
      else p
    val s = Files.list(resolved)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("_kb=")).map(_.drop(4).toInt).toSet
    finally s.close()
  }

  test("double the buckets through live appends: fold byte-equal at each step, compact migrates the base") {
    val wh = Warehouse(tmpDir("resize-x2"))
    MorMirror.initialize(wh, "m",
      df((1L, "a", "U", "t01"), (2L, "b", "U", "t02"), (3L, "c", "U", "t03"),
        (4L, "d", "U", "t04"), (5L, "e", "U", "t05")), cfg, 4)
    assert(MorMirror.baseBuckets(wh, "m") == 4)
    MorMirror.appendDelta(wh, "m",
      df((1L, "a2", "U", "t06"), (6L, "f", "I", "t07")), 1L)
    val s1 = visible(wh)
    assert(s1 == Set((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (6L, "f")))

    // the RESIZE: write spec flips to 8, base stays (and reads) under 4
    MorMirror.resize(spark, wh, "m", 8)
    assert(MorMirror.storedConfig(wh, "m").map(_._2).contains(8))
    assert(MorMirror.baseBuckets(wh, "m") == 4,
      "the base keeps its own spec until a compaction rebuilds it")
    assert(visible(wh) == s1, "resize itself must not change the state")

    // LIVE appends under the new spec fold exactly against the old base
    MorMirror.appendDelta(wh, "m",
      df((2L, "b2", "U", "t08"), (5L, "e", "D", "t09"),
        (7L, "g", "I", "t10")), 2L)
    val deltaDir = Paths.get(s"${wh.tablePath("m")}/deltas/batch_2")
    assert(Files.readString(deltaDir.resolve("_spec")).trim == "8",
      "a delta declares the spec it was written under")
    val s2 = Set((1L, "a2"), (2L, "b2"), (3L, "c"), (4L, "d"), (6L, "f"),
      (7L, "g"))
    assert(visible(wh) == s2, "mixed-spec fold (base@4, delta@8) must be exact")
    // the IVM before-state is exact mid-transition too
    val incoming = df((2L, "x", "U", "t11"), (7L, "x", "U", "t11"))
    val before = MorMirror.touchedBefore(spark, wh, "m", incoming)
      .filter(col("id").isin(2L, 7L)).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before == Set((2L, "b2"), (7L, "g")))

    // next compaction = the background spec rewrite, for free
    MorMirror.compact(spark, wh, "m")
    assert(MorMirror.baseBuckets(wh, "m") == 8)
    assert(baseKbDirs(wh).exists(_ >= 4),
      s"the rebuilt base must use the new modulus: ${baseKbDirs(wh)}")
    assert(visible(wh) == s2, "the migration must not change the state")

    // appends keep folding against the migrated base
    MorMirror.appendDelta(wh, "m", df((3L, "c2", "U", "t12")), 3L)
    assert(visible(wh) == s2 - ((3L, "c")) + ((3L, "c2")))
  }

  test("shrink (divisor) and odd (non-divides) resizes stay exact through the conservative path") {
    val wh = Warehouse(tmpDir("resize-odd"))
    MorMirror.initialize(wh, "m",
      df((1L, "a", "U", "t01"), (2L, "b", "U", "t02"), (3L, "c", "U", "t03"),
        (4L, "d", "U", "t04"), (5L, "e", "U", "t05"), (6L, "f", "U", "t06"),
        (7L, "g", "U", "t07"), (8L, "h", "U", "t08")), cfg, 8)
    // shrink 8 -> 4: the divisor mapping expands each touched bucket
    MorMirror.resize(spark, wh, "m", 4)
    MorMirror.appendDelta(wh, "m",
      df((1L, "a2", "U", "t09"), (8L, "h", "D", "t10")), 1L)
    val s1 = Set((1L, "a2"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (6L, "f"), (7L, "g"))
    assert(visible(wh) == s1, "base@8 + delta@4 (divisor) must fold exact")
    MorMirror.compact(spark, wh, "m")
    assert(MorMirror.baseBuckets(wh, "m") == 4)
    // odd resize 4 -> 6: no divides relation — the whole base contests,
    // un-pruned but exact
    MorMirror.resize(spark, wh, "m", 6)
    MorMirror.appendDelta(wh, "m",
      df((2L, "b2", "U", "t11"), (9L, "i", "I", "t12")), 2L)
    assert(visible(wh) == s1 - ((2L, "b")) + ((2L, "b2")) + ((9L, "i")),
      "base@4 + delta@6 (no divides relation) must still fold exact")
    MorMirror.compact(spark, wh, "m")
    assert(MorMirror.baseBuckets(wh, "m") == 6)
    // a same-modulus resize is a declared no-op
    MorMirror.resize(spark, wh, "m", 6)
    assert(MorMirror.storedConfig(wh, "m").map(_._2).contains(6))
  }

  test("tombstone expiry mid-transition carries the base's spec (empty-tail resize window)") {
    val wh = Warehouse(tmpDir("resize-expire"))
    MorMirror.initialize(wh, "m",
      df((1L, "a", "U", "t01"), (2L, "b", "U", "t02"), (3L, "c", "U", "t03"),
        (4L, "d", "U", "t04"), (5L, "e", "U", "t05")), cfg, 4)
    // a folded-in delete leaves a tombstone in the base
    MorMirror.appendDelta(wh, "m", df((2L, "b", "D", "t06")), 1L)
    MorMirror.compact(spark, wh, "m")
    val want = Set((1L, "a"), (3L, "c"), (4L, "d"), (5L, "e"))
    assert(visible(wh) == want)
    // resize with an EMPTY delta tail: compact no-ops, the base stays
    // under spec 4 while the write props flip to 8
    MorMirror.resize(spark, wh, "m", 8)
    assert(MorMirror.baseBuckets(wh, "m") == 4)
    assert(MorMirror.storedConfig(wh, "m").map(_._2).contains(8))
    // expiry rewrites the base in place (layout preserved) - the new
    // base version must keep DECLARING spec 4, or the fold would map
    // buckets under the props spec 8 and silently miss base rows
    MorMirror.expireTombstones(spark, wh, "m", horizon = "t99")
    assert(MorMirror.baseBuckets(wh, "m") == 4,
      "expiry dropped the base's spec marker mid-transition")
    assert(visible(wh) == want, "rows lost to a mis-specced fold")
    assert(baseKbDirs(wh).forall(_ < 4), "physical layout must stay spec-4")
    // appends under the new spec still fold exactly against the old base
    MorMirror.appendDelta(wh, "m", df((6L, "f", "I", "t07")), 2L)
    assert(visible(wh) == want + ((6L, "f")))
    // and the next compaction completes the migration
    MorMirror.compact(spark, wh, "m")
    assert(MorMirror.baseBuckets(wh, "m") == 8)
    assert(visible(wh) == want + ((6L, "f")))
  }
}
