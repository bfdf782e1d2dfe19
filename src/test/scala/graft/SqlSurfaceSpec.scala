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

  test("bloom join, heavy-hitters rollup, KMV estimate, and a stored-index ANN probe as plain SQL") {
    graft.functions.GraftFunctions.register(spark)
    view("documents"); view("embeddings")
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")

    // q74's bloom-pruned join: same sizing rule, same hash count
    val dimCount = spark.sql(
      """SELECT count(1) FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'""".stripMargin)
      .head().getLong(0)
    val bits = graft.operators.ScaleOps.sizedBloomBits(dimCount)
    val hashes = graft.operators.ScaleOps.BloomHashes
    val sqlBloom = spark.sql(
      s"""WITH dim AS (SELECT o_orderkey, o_orderdate FROM orders
         |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'),
         |bf AS (SELECT bloom_build(xxhash64(o_orderkey), $bits, $hashes) AS bf FROM dim),
         |pruned AS (SELECT l_orderkey, l_extendedprice, l_discount
         |  FROM lineitem CROSS JOIN bf
         |  WHERE bloom_might_contain(bf.bf, xxhash64(l_orderkey), $hashes))
         |SELECT date_format(o_orderdate, 'yyyy-MM') AS month, count(1) AS n_items,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
         |    AS DOUBLE) AS revenue
         |FROM pruned JOIN dim ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin).collect().map(_.toString).toSeq
    val dfBloom = graft.operators.ScaleOps.q74BloomPruneJoin(spark, dir)
      .collect().map(_.toString).toSeq
    assert(sqlBloom == dfBloom)

    // q79's bounded Misra-Gries rollup, SQL-only
    val sqlHh = spark.sql(
      """WITH toks AS (SELECT explode(split(text, ' ')) AS tok FROM documents),
        |hh AS (SELECT heavy_hitters(tok, 64) AS hh FROM toks),
        |x AS (SELECT posexplode(hh) AS (pos, e) FROM hh)
        |SELECT CAST(pos + 1 AS BIGINT) AS rank, e.item AS token, e.cnt AS cnt
        |FROM x WHERE pos < 10 ORDER BY rank""".stripMargin)
      .collect().map(_.toString).toSeq
    val dfHh = graft.operators.TextAnalysis.q79HeavyHitters(spark, dir)
      .collect().map(_.toString).toSeq
    assert(sqlHh == dfHh)

    // q41's KMV distinct estimate through kmv_sketch + md5_prefix64
    graft.operators.Queries.events(spark, dir).createOrReplaceTempView("events")
    val sqlKmv = spark.sql(
      """WITH h AS (SELECT DISTINCT event_type,
        |    md5_prefix64(CAST(user_id AS STRING)) AS h FROM events),
        |s AS (SELECT event_type, count(1) AS nu, kmv_sketch(h, 64) AS sk
        |      FROM h GROUP BY event_type)
        |SELECT event_type, nu AS exact_users,
        |  CASE WHEN nu <= 64 THEN CAST(nu AS DOUBLE)
        |       ELSE round(63.0 * 1152921504606846976.0 /
        |                  CAST(element_at(sk, 64) AS DOUBLE), 4) END AS approx_users
        |FROM s ORDER BY event_type""".stripMargin)
      .collect().map(_.toString).toSeq
    val dfKmv = graft.operators.Queries.q41ApproxDistinct(spark, dir)
      .collect().map(_.toString).toSeq
    assert(sqlKmv == dfKmv)

    // q128's ANN probe served from the STORED index, entirely in SQL:
    // views over the persisted centroids/codebook/codes tables, the ADC
    // lookup as a join — byte-identical top-10 to the DataFrame server
    val root = graft.operators.EmbedOps.buildStoredIndex(spark, dir)
    spark.read.parquet(s"$root/centroids").createOrReplaceTempView("ivf_centroids")
    spark.read.parquet(s"$root/codebook").createOrReplaceTempView("pq_codebook")
    spark.read.parquet(s"$root/codes").createOrReplaceTempView("pq_codes")
    def cosSql(dot: String, na: String, nb: String): String =
      s"""CASE WHEN $na = 0 OR $nb = 0 THEN CAST(0.0 AS DOUBLE)
         |ELSE CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE))) END""".stripMargin
    val sqlAnn = spark.sql(
      s"""WITH e AS (SELECT vec_id,
         |    transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS q
         |  FROM embeddings),
         |en AS (SELECT vec_id, q, long_dot(q, q) AS nq FROM e),
         |qv AS (SELECT q AS qq, nq AS qn FROM en WHERE vec_id = 0),
         |probed AS (SELECT cid FROM ivf_centroids CROSS JOIN qv
         |  ORDER BY ${cosSql("long_dot(csum, qq)", "nc", "qn")} DESC, cid LIMIT 2),
         |qs AS (SELECT s, slice(qq, s * 8 + 1, 8) AS q0s FROM qv
         |  LATERAL VIEW explode(sequence(0, 7)) t AS s),
         |lut AS (SELECT cb.s, cb.code, long_dot(qs.q0s, cb.cs) AS ldot, cb.ncs
         |  FROM pq_codebook cb JOIN qs ON cb.s = qs.s),
         |adc AS (SELECT c.vec_id, CAST(c.cid AS BIGINT) AS cid,
         |    sum(l.ldot) AS adot, sum(l.ncs) AS nrec
         |  FROM pq_codes c JOIN lut l ON c.s = l.s AND c.code = l.code
         |  WHERE c.cid IN (SELECT cid FROM probed) AND c.vec_id <> 0
         |  GROUP BY 1, 2),
         |scored AS (SELECT a.vec_id, a.cid,
         |    ${cosSql("adot", "qn", "nrec")} AS cos_pq,
         |    ${cosSql("long_dot(en.q, qq)", "en.nq", "qn")} AS cos_exact
         |  FROM adc a JOIN en ON a.vec_id = en.vec_id CROSS JOIN qv)
         |SELECT vec_id, cid, cos_pq, cos_exact, abs(cos_pq - cos_exact) AS abs_err
         |FROM scored ORDER BY cos_pq DESC, vec_id LIMIT 10""".stripMargin)
      .collect().map(_.toString).toSeq
    val dfAnn = graft.operators.EmbedOps.q128IvfPqServed(spark, dir)
      .collect().map(_.toString).toSeq
    assert(sqlAnn == dfAnn)
  }

  test("the Aho-Corasick marker counter runs as plain SQL, counts == replace formulation") {
    graft.functions.GraftFunctions.register(spark)
    view("documents")
    val markers = graft.operators.TextAnalysis.CharLangMarkers.flatMap(_._2)
    val arr = markers.map(m => s"'${m.replace("'", "''")}'")
      .mkString("array(", ", ", ")")
    val viaReplace = markers.zipWithIndex.map { case (m, i) =>
      val esc = m.replace("'", "''")
      s"CAST((length(text) - length(replace(text, '$esc', ''))) div ${m.length} AS BIGINT) AS r$i"
    }.mkString(", ")
    val rows = spark.sql(
      s"SELECT multi_substr_count(text, $arr) AS mc, $viaReplace FROM documents")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ac = r.getSeq[Long](0)
      markers.indices.foreach { i =>
        assert(ac(i) == r.getLong(i + 1),
          s"SQL-surface AC count diverged from replace for '${markers(i)}'")
      }
    }
  }
}
