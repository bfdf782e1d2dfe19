package graft

import scala.util.Random

import graft.operators.Cdc

/** Randomized model check (SURVEY §5.3): for arbitrary I/U/D op sequences,
  * the Spark fold must equal a trivial in-memory latest-wins fold — applied
  * all-at-once, batch-by-batch, batch-by-batch in shuffled batch order
  * (distinct ts), and re-applying the last batch (idempotence). Seeded, so
  * deterministic.
  */
final case class CdcOp(id: Long, name: String, op: String, ts: Long, seq: Long)

class CdcPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val cfg = CdcConfig("id", "ts")
  private type Op = CdcOp
  private def Op(id: Long, name: String, op: String, ts: Long, seq: Long) =
    CdcOp(id, name, op, ts, seq)

  /** Reference model: latest (ts, seq) record per key wins; D hides the key. */
  private def model(ops: Seq[Op]): Map[Long, String] =
    ops.groupBy(_.id).flatMap { case (id, ks) =>
      val latest = ks.maxBy(o => (o.ts, o.seq))
      if (latest.op == "D") None else Some(id -> latest.name)
    }

  private def sparkState(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("id", "name").as[(Long, String)].collect().toMap

  private def genOps(rnd: Random, n: Int, keys: Int, distinctTs: Boolean): Seq[Op] = {
    val tss = if (distinctTs) rnd.shuffle((1L to n).toList) else List.fill(n)(rnd.nextInt(20).toLong)
    (0 until n).map { i =>
      val op = rnd.nextInt(10) match {
        case x if x < 4 => "I"
        case x if x < 8 => "U"
        case _ => "D"
      }
      Op(rnd.nextInt(keys).toLong, s"v$i", op, tss(i), i.toLong)
    }
  }

  test("applyAll == in-memory fold over 30 random scenarios (incl. ts ties)") {
    val rnd = new Random(1234)
    (1 to 30).foreach { _ =>
      val ops = genOps(rnd, n = 60, keys = 12, distinctTs = rnd.nextBoolean())
      val df = ops.toDF().withColumn("_ingest_seq", org.apache.spark.sql.functions.col("seq"))
      val got = sparkState(Cdc.applyAll(df, cfg))
      assert(got == model(ops), s"scenario ops=$ops")
    }
  }

  test("randomized schema evolution: batches with differing column sets fold to the union") {
    import org.apache.spark.sql.functions.{col, lit}
    val rnd = new Random(4242)
    (1 to 10).foreach { _ =>
      val ops = genOps(rnd, n = 40, keys = 8, distinctTs = true)
      val batches = ops.grouped(10).toList
      // every batch randomly carries or lacks an `extra` column; the model
      // tracks (name, extra-or-None) per key with latest-wins
      val withExtra = batches.map(_ => rnd.nextBoolean())
      var mirror: org.apache.spark.sql.DataFrame = null
      batches.zip(withExtra).foreach { case (b, hasExtra) =>
        val df0 = b.toDF().withColumn("_ingest_seq", col("seq"))
        val df = if (hasExtra)
          df0.withColumn("extra", org.apache.spark.sql.functions.concat(lit("x"), col("name")))
        else df0
        mirror = if (mirror == null) Cdc.fold(df, cfg) else Cdc.applyBatch(mirror, df, cfg)
      }
      val modelState: Map[Long, (String, Option[String])] =
        batches.zip(withExtra).flatMap { case (b, he) => b.map(o => (o, he)) }
          .groupBy(_._1.id).flatMap { case (id, ks) =>
            val (latest, he) = ks.maxBy { case (o, _) => (o.ts, o.seq) }
            if (latest.op == "D") None
            else Some(id -> (latest.name, if (he) Some("x" + latest.name) else None))
          }
      val out = Cdc.currentState(mirror)
      if (withExtra.exists(identity)) {
        assert(out.columns.contains("extra"),
          "union schema must retain the evolved column once any batch carries it")
        val got = out.select("id", "name", "extra").collect()
          .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
        assert(got == modelState, s"evolution scenario mismatch")
      } else {
        val got = out.select("id", "name").collect()
          .map(r => r.getLong(0) -> (r.getString(1), None: Option[String])).toMap
        assert(got == modelState, s"no-evolution scenario mismatch")
      }
    }
  }

  test("incremental applyBatch over shuffled batches == applyAll (distinct ts)") {
    val rnd = new Random(99)
    (1 to 10).foreach { _ =>
      val ops = genOps(rnd, n = 60, keys = 10, distinctTs = true)
      val batches = rnd.shuffle(ops.grouped(15).toList)
      var mirror = Cdc.fold(
        batches.head.toDF().withColumn("_ingest_seq", org.apache.spark.sql.functions.col("seq")),
        cfg)
      batches.tail.foreach { b =>
        mirror = Cdc.applyBatch(mirror,
          b.toDF().withColumn("_ingest_seq", org.apache.spark.sql.functions.col("seq")), cfg)
      }
      assert(sparkState(Cdc.currentState(mirror)) == model(ops))
      // idempotence: re-applying the last batch changes nothing
      val again = Cdc.applyBatch(mirror,
        batches.last.toDF().withColumn("_ingest_seq", org.apache.spark.sql.functions.col("seq")), cfg)
      assert(sparkState(Cdc.currentState(again)) == model(ops))
    }
  }

  test("merge-on-read over random batched histories == in-memory model == sequential COW") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(6301)
    (1 to 8).foreach { trial =>
      // ts ties allowed in half the trials: the (ts, seq) ordering must
      // resolve them identically across all three evaluations
      val ops = genOps(rnd, n = 50, keys = 10, distinctTs = rnd.nextBoolean())
      val sizes = Iterator.continually(1 + rnd.nextInt(20))
      val batches = {
        var rest = ops; val out = Seq.newBuilder[Seq[Op]]
        while (rest.nonEmpty) { val k = sizes.next(); out += rest.take(k); rest = rest.drop(k) }
        out.result()
      }
      def bdf(b: Seq[Op]) = b.toDF().withColumn("_ingest_seq", col("seq"))

      val wh = graft.sources.Tables.Warehouse(tmpDir(s"mor-prop-$trial"))
      graft.plans.MorMirror.initialize(wh, "m",
        Cdc.fold(bdf(batches.head), cfg), cfg, nBuckets = 8)
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        graft.plans.MorMirror.appendDelta(wh, "m", bdf(b), batchId = i + 1L)
      }
      // compact a random prefix of trials mid-history equivalence is
      // separately proven; here compaction must not change the answer
      if (rnd.nextBoolean()) graft.plans.MorMirror.compact(spark, wh, "m")

      val morState = sparkState(graft.plans.MorMirror.read(spark, wh, "m"))
      val cow = batches.tail.foldLeft(Cdc.fold(bdf(batches.head), cfg)) {
        (m, b) => Cdc.applyBatch(m, bdf(b), cfg)
      }
      assert(morState == model(ops), s"trial $trial: MOR != model")
      assert(morState == sparkState(Cdc.currentState(cow)),
        s"trial $trial: MOR != sequential COW")
    }
  }
}
