package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** The q132 video path: real container parse, strided frame sampling, and
  * corrupt-media degradation — the invariants the DuckDB hash gate can't
  * see (it never touches the binary container, only the replayed pixels).
  */
class MultimodalVideoSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q132 decode == in-memory reference from text bytes (full fixture corpus)") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > 0)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = Multimodal.q132VideoFrames(spark, dir).collect()
    assert(out.length == texts.size, "one row per non-empty doc")
    out.foreach { r =>
      val text = texts(r.getLong(0))
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val nFrames = (bytes.length + 63) / 64
      val sampledFrames = (0 until nFrames).filter(_ % 2 == 0)
      val px = sampledFrames.flatMap(f =>
        (0 until 64).map(i => bytes((f * 64 + i) % bytes.length) & 0xff))
      assert(r.getLong(1) == nFrames.toLong, s"n_frames doc ${r.getLong(0)}")
      assert(r.getLong(2) == sampledFrames.size.toLong, "n_sampled")
      assert(r.getLong(3) == nFrames.toLong * 1000L / 4L, "duration_ms")
      assert(r.getLong(4) == px.map(_.toLong).sum / px.size, "mean_luma")
      assert(r.getLong(5) == px.max.toLong, "peak")
    }
  }

  test("q132 header is genuinely parsed: corrupt containers degrade to error rows, never kill the job") {
    import spark.implicits._
    val good = Multimodal.videoTable(spark, dir).limit(1)
      .collect().head.getAs[Array[Byte]]("media")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = good.take(20) // header promises more frames than exist
    val media = Seq(
      (1L, good), (2L, badMagic), (3L, truncated),
      (4L, "tiny".getBytes("UTF-8"))).toDF("doc_id", "media")
    val out = Multimodal.decodeVideo(spark, media).collect()
      .map(m => m.docId -> m).toMap
    assert(out(1L).ok && out(1L).width == 8 && out(1L).height == 8 &&
      out(1L).fps == 4, s"good container must parse: ${out(1L)}")
    Seq(2L, 3L, 4L).foreach { id =>
      assert(!out(id).ok && out(id).error.nonEmpty,
        s"container $id must degrade, got ${out(id)}")
    }
  }

  test("q132 strided sampling touches ceil(n_frames/2) frames exactly") {
    val out = Multimodal.q132VideoFrames(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(2) == (r.getLong(1) + 1) / 2,
        s"doc ${r.getLong(0)}: sampled ${r.getLong(2)} of ${r.getLong(1)}")
    }
  }
}
