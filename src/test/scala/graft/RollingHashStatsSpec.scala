package graft

import org.apache.spark.sql.functions._

/** [[graft.functions.RollingHashStats]] must compute EXACTLY what the SQL
  * formulation it replaced computed (the oracle keeps that formulation):
  * whole-document polynomial hash, minimum 8-codepoint-gram rolling hash,
  * code-point count. The fixture covers every boundary the native loop
  * has to get right: empty, NULL, below/at/above the gram width, ASCII,
  * multi-byte code points, and a surrogate pair (one CODE POINT, two
  * Java chars — `length`/`substring`/`ascii` all count code points).
  */
class RollingHashStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def sqlFormulation(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("codes", expr(
      """CASE WHEN length(text) > 0 THEN
        |  transform(sequence(1, length(text)),
        |            i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))
        |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
    .withColumn("full_hash",
      expr("aggregate(codes, 0L, (acc, x) -> (acc * 31 + x) % 1000000007)"))
    .withColumn("min_gram_hash", expr(
      """CASE WHEN size(codes) >= 8 THEN
        |  array_min(transform(sequence(1, size(codes) - 7),
        |    i -> aggregate(slice(codes, i, 8), 0L,
        |         (acc, x) -> (acc * 31 + x) % 1000000007)))
        |ELSE NULL END""".stripMargin))
    .select(col("doc_id"), col("full_hash"), col("min_gram_hash"),
      size(col("codes")).cast("long").as("n_chars"))

  test("native rolling_hash_stats equals the SQL fold on all boundary shapes") {
    graft.functions.GraftFunctions.register(spark)
    val fixtures = Seq[(Long, String)](
      (1L, ""),
      (3L, "a"),
      (4L, "abcdefg"), // 7 chars: below the gram width
      (5L, "abcdefgh"), // exactly 8
      (6L, "abcdefghi"), // one slide
      (7L, "the quick brown fox jumps over the lazy dog"),
      (8L, "aaaaaaaaaaaaaaaa"), // degenerate equal grams
      (9L, "café naïve résumé 中文文本"),
      (10L, "emoji 😀 pair 😀😁 tail"),
      (11L, (1 to 500).map(i => ('a' + i % 26).toChar).mkString))
      .toDF("doc_id", "text")
      // a NULL text row (SQL shape yields (0, NULL, 0), never a NULL row)
      .unionByName(Seq(Tuple1(2L)).toDF("doc_id")
        .withColumn("text", lit(null).cast("string")))
    val expected = sqlFormulation(fixtures).orderBy("doc_id").collect()
    val actual = fixtures
      .select(col("doc_id"), expr("inline(array(rolling_hash_stats(text)))"))
      .orderBy("doc_id").collect()
    assert(actual.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
    // schema parity: names, types, and column order
    val exp = sqlFormulation(fixtures)
    val act = fixtures.select(col("doc_id"),
      expr("inline(array(rolling_hash_stats(text)))"))
    assert(act.schema.map(f => (f.name, f.dataType)) ==
      exp.schema.map(f => (f.name, f.dataType)))
  }
}
