package graft

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.plans.Bootstrapper
import graft.sources.Tables.Warehouse
import graft.sources.RestCatalogClient

/** The REST catalog + OAuth2 connector (SURVEY C1/S8) against an in-JVM
  * stub server: token exchange wire format, bearer auth on every catalog
  * call, Iceberg-REST table probes and set-properties commits — and the
  * whole Bootstrapper flow driven through it. No egress: the stub binds
  * 127.0.0.1 inside the test JVM.
  */
class RestCatalogSpec extends SparkTestBase {

  /** Minimal scripted catalog server capturing requests for assertion. */
  private class StubCatalog {
    val tokenRequests = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val authHeaders = scala.collection.mutable.ArrayBuffer.empty[String]
    val commits = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val creates = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // tables the catalog "knows", with properties
    val tables = scala.collection.mutable.Map.empty[String, Map[String, String]]
    // current schema JSON per table, as registered via create / add-schema
    val schemas = scala.collection.mutable.Map.empty[String, String]

    /** The `{...}` object following `"<key>": ` in `json`, brace-matched. */
    private def objAfter(json: String, key: String): Option[String] =
      (s""""$key"\\s*:\\s*\\{""").r.findFirstMatchIn(json).map(_.end - 1).map { start =>
        var depth = 0; var i = start; var inStr = false; var end = -1
        while (i < json.length && end < 0) {
          val c = json.charAt(i)
          if (inStr) { if (c == '\\') i += 1 else if (c == '"') inStr = false }
          else c match {
            case '"' => inStr = true
            case '{' => depth += 1
            case '}' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        json.substring(start, end + 1)
      }

    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => handle(x))
    server.start()
    val baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)

    private def body(x: HttpExchange): String = {
      val out = new ByteArrayOutputStream()
      x.getRequestBody.transferTo(out)
      out.toString("UTF-8")
    }
    private def respond(x: HttpExchange, code: Int, payload: String): Unit = {
      val bytes = payload.getBytes("UTF-8")
      // HEAD responses must not carry a body; -1 = no content
      if (x.getRequestMethod == "HEAD") x.sendResponseHeaders(code, -1)
      else { x.sendResponseHeaders(code, bytes.length); x.getResponseBody.write(bytes) }
      x.close()
    }
    private def handle(x: HttpExchange): Unit = {
      val path = x.getRequestURI.getPath
      if (path == "/ws/v1/oauth/tokens") {
        tokenRequests += ((x.getRequestHeaders.getFirst("Content-Type"), body(x)))
        respond(x, 200, """{"access_token": "tok-123", "token_type": "bearer"}""")
      } else if (path == "/v1/namespaces/db/tables" && x.getRequestMethod == "POST") {
        // Iceberg REST create-table: register by name from the payload
        authHeaders += x.getRequestHeaders.getFirst("Authorization")
        val b = body(x)
        val name = RestCatalogClient.stringField(b, "name").get
        creates += ((name, b))
        if (tables.contains(name)) respond(x, 409, """{"error": "exists"}""")
        else {
          tables(name) = Map.empty
          objAfter(b, "schema").foreach(schemas(name) = _)
          respond(x, 200, """{"metadata": {}}""")
        }
      } else if (path.startsWith("/v1/namespaces/db/tables/")) {
        authHeaders += x.getRequestHeaders.getFirst("Authorization")
        val table = path.stripPrefix("/v1/namespaces/db/tables/")
        x.getRequestMethod match {
          case "HEAD" =>
            respond(x, if (tables.contains(table)) 200 else 404, "")
          case "GET" =>
            if (!tables.contains(table)) respond(x, 404, """{"error": "no such table"}""")
            else {
              val props = tables(table).toSeq.sorted
                .map { case (k, v) => s""""$k": "$v"""" }.mkString("{", ", ", "}")
              // location/schemas are siblings the parser must not bleed
              // into; the schemas list carries the registered current
              // schema like a real catalog (canned fallback otherwise)
              val schemaJson = schemas.getOrElse(table,
                """{"type": "struct", "schema-id": 0, "fields": [{"id": 1, "name": "id", "required": false, "type": "long"}]}""")
              respond(x, 200,
                s"""{"metadata": {"location": "s3://x/$table", "properties": $props,
                   |  "current-schema-id": 0,
                   |  "schemas": [$schemaJson]}}""".stripMargin)
            }
          case "POST" =>
            // STRICT like a real catalog: commits to unknown tables fail —
            // this is what forces the control plane to register creations
            if (!tables.contains(table)) respond(x, 404, """{"error": "no such table"}""")
            else {
              val b = body(x)
              commits += ((table, b))
              val updates = RestCatalogClient.objectFields(b, "updates")
              tables(table) = tables(table) ++ updates
              if (b.contains("\"add-schema\""))
                objAfter(b, "schema").foreach(schemas(table) = _)
              respond(x, 200, """{"metadata": {}}""")
            }
          case m => respond(x, 405, s"""{"error": "$m"}""")
        }
      } else respond(x, 404, """{"error": "unknown path"}""")
    }
  }

  test("token exchange sends the reference's wire format and parses access_token") {
    val stub = new StubCatalog
    try {
      val cat = new RestCatalogClient(stub.baseUrl, "db", "my-id:my-secret")
      assert(!cat.tableExists("t1")) // triggers the lazy token fetch
      val (ctype, form) = stub.tokenRequests.head
      assert(ctype == "application/x-www-form-urlencoded")
      assert(form.split("&").toSet ==
        Set("grant_type=client_credentials", "client_id=my-id", "client_secret=my-secret"))
      assert(stub.tokenRequests.size == 1, "one exchange per client, then reuse")
      assert(stub.authHeaders.forall(_ == "Bearer tok-123"),
        "every catalog call must carry the exchanged bearer token")
    } finally stub.stop()
  }

  test("properties round-trip through the Iceberg REST shapes") {
    val stub = new StubCatalog
    try {
      val cat = new RestCatalogClient(stub.baseUrl, "db", "id:sec")
      // strict catalog: commits need a registered table; 409 re-register is benign
      intercept[RuntimeException](cat.setProperties("t1", Map("x" -> "y")))
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType)))
      cat.tableCreated("t1", sch)
      cat.tableCreated("t1", sch) // concurrent/duplicate registration: no error
      cat.setProperties("t1", Map("cdc.key-column" -> "id", "cdc.ts-column" -> "ts"))
      assert(cat.tableExists("t1"))
      val props = cat.properties("t1")
      assert(props("cdc.key-column") == "id" && props("cdc.ts-column") == "ts")
      // registration stamps the schema fingerprint alongside
      assert(props.contains(RestCatalogClient.SchemaFpProp))
      assert(cat.properties("absent") == Map.empty)
      val (_, commitBody) = stub.commits.head
      assert(commitBody.contains(""""action": "set-properties""""),
        "commit must use the Iceberg REST update action")
      // merge, not replace: a second commit keeps earlier keys
      cat.setProperties("t1", Map("etl.job-type" -> "cdc"))
      assert(cat.properties("t1")("cdc.key-column") == "id")
    } finally stub.stop()
  }

  test("schema evolution: widened re-registration commits add-schema exactly once") {
    import org.apache.spark.sql.types._
    val stub = new StubCatalog
    try {
      val cat = new RestCatalogClient(stub.baseUrl, "db", "id:sec")
      val s1 = StructType(Seq(StructField("id", LongType)))
      cat.tableCreated("tev", s1)
      def evoCommits = stub.commits.filter { case (t, b) =>
        t == "tev" && b.contains("add-schema")
      }
      // same shape again (a restart with no upstream change): no evolution
      cat.tableCreated("tev", s1)
      assert(evoCommits.isEmpty, s"unchanged schema must not evolve: $evoCommits")
      // upstream added a column: the 409 path must commit the Iceberg
      // evolution (add-schema + set-current-schema) with the new field
      val s2 = s1.add(StructField("email", StringType))
      cat.tableCreated("tev", s2)
      assert(evoCommits.size == 1, s"expected one evolution commit: $evoCommits")
      val body = evoCommits.head._2
      assert(body.contains("email") && body.contains(""""action": "set-current-schema""""),
        s"evolution commit must carry the new field and activate it:\n$body")
      // idempotent from here: the fingerprint now matches
      cat.tableCreated("tev", s2)
      assert(evoCommits.size == 1, "re-registering the evolved shape must be a no-op")
    } finally stub.stop()
  }

  test("create race: identical schema with missing fingerprint stamps without re-evolving") {
    import org.apache.spark.sql.types._
    val stub = new StubCatalog
    try {
      val cat = new RestCatalogClient(stub.baseUrl, "db", "id:sec")
      val s1 = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("v", StringType),
        StructField("vec", ArrayType(FloatType, containsNull = false))))
      // the WINNER of a concurrent create registered this exact schema but
      // has not stamped the fingerprint property yet (round-5 advice race)
      cat.tableCreated("race", s1)
      stub.tables("race") = stub.tables("race") - RestCatalogClient.SchemaFpProp
      def evoCommits = stub.commits.filter { case (t, b) =>
        t == "race" && b.contains("add-schema")
      }
      // the LOSER sees 409 + no fingerprint, but the catalog's current
      // schema matches structurally -> stamp only, no redundant evolution
      cat.tableCreated("race", s1)
      assert(evoCommits.isEmpty,
        s"identical-schema race must not commit add-schema: $evoCommits")
      assert(cat.properties("race").contains(RestCatalogClient.SchemaFpProp),
        "the loser must stamp the fingerprint it verified")
      // a GENUINELY different shape from a writer with no fingerprint
      // still evolves (the pre-existing behavior the shortcut must not eat)
      stub.tables("race") = stub.tables("race") - RestCatalogClient.SchemaFpProp
      cat.tableCreated("race", s1.add(StructField("extra", StringType)))
      assert(evoCommits.size == 1, s"real widening must evolve: $evoCommits")
      // shape comparison ignores server-assigned field ids
      val json = RestCatalogClient.icebergSchemaJson(s1)
      val reIdd = """"(id|element-id|key-id|value-id)": \d+""".r
        .replaceAllIn(json, m => s""""${m.group(1)}": ${900 + m.start % 7}""")
      assert(RestCatalogClient.schemaShape(json) == RestCatalogClient.schemaShape(reIdd),
        "field ids must not affect the canonical shape")
      assert(RestCatalogClient.schemaShape(json) !=
        RestCatalogClient.schemaShape(RestCatalogClient.icebergSchemaJson(
          s1.add(StructField("extra", StringType)))))
    } finally stub.stop()
  }

  test("malformed credential and failed exchange fail loudly") {
    val stub = new StubCatalog
    try {
      intercept[IllegalArgumentException](
        new RestCatalogClient(stub.baseUrl, "db", "no-colon").tableExists("t"))
      val bad = new RestCatalogClient(s"${stub.baseUrl}/missing", "db", "a:b")
      intercept[RuntimeException](bad.tableExists("t"))
    } finally stub.stop()
  }

  test("create-table registers the table's ACTUAL schema, not an empty field list") {
    import org.apache.spark.sql.types._
    val stub = new StubCatalog
    try {
      val cat = new RestCatalogClient(stub.baseUrl, "db", "id:sec")
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType),
        StructField("price", DecimalType(18, 2)),
        StructField("ts", TimestampType),
        StructField("vec", ArrayType(FloatType, containsNull = false)),
        StructField("meta", StructType(Seq(StructField("k", StringType))))))
      cat.tableCreated("t9", schema)
      val (_, body) = stub.creates.head
      // every column lands in the payload with its Iceberg type
      for (want <- Seq(
          """"name": "id", "required": true, "type": "long"""",
          """"name": "name", "required": false, "type": "string"""",
          """"type": "decimal(18, 2)"""",
          """"type": "timestamptz"""",
          """"element": "float", "element-required": true""",
          """"name": "meta", "required": false, "type": {"type": "struct""""))
        assert(body.contains(want), s"create body missing [$want]:\n$body")
      // field ids are unique and dense (Iceberg spec requirement)
      val ids = """"(?:id|element-id|key-id|value-id)": (\d+)""".r
        .findAllMatchIn(body).map(_.group(1).toInt).toSeq
      assert(ids.sorted == (1 to ids.size).toList, s"field ids not unique/dense: $ids")
    } finally stub.stop()
  }

  test("Bootstrapper runs end-to-end against the REST catalog") {
    import spark.implicits._
    val stub = new StubCatalog
    try {
      val g = DmsGenerator.generate(19L)
      val src = tmpDir("src-rest")
      g.batches.flatten.toSeq.toDF()
        .withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/dms_logs_1.parquet")
      val wh = Warehouse(tmpDir("wh-rest"))
      val spec = PipelineSpec(src, "rt_changelog", "rt", CdcConfig("id", "ts"))
      val cat = new RestCatalogClient(stub.baseUrl, "db", "id:sec")
      val r1 = Bootstrapper.bootstrap(spark, wh, spec, Some(cat))
      assert(r1.error.isEmpty && r1.createdChangelog && r1.createdMirror)
      // the CDC wiring landed in the REMOTE catalog via set-properties
      assert(stub.tables("rt")("cdc.key-column") == "id")
      assert(stub.tables("rt_changelog")("dependent-tables") == "rt")
      assert(Bootstrapper.readCdcConfig(wh, "rt", Some(cat))
        .contains(CdcConfig("id", "ts")))
      // existence probes answered by the catalog: it knows both tables now,
      // so the second run is a no-op even though it never lists local dirs
      val r2 = Bootstrapper.bootstrap(spark, wh, spec, Some(cat))
      assert(r2.error.isEmpty && !r2.createdChangelog && !r2.createdMirror)
      // registration carried the real changelog schema, not "fields": []
      val (_, createBody) = stub.creates.find(_._1 == "rt_changelog").get
      assert(createBody.contains(""""name": "id"""") && !createBody.contains(""""fields": []"""),
        s"create must carry the as-written columns:\n$createBody")
    } finally stub.stop()
  }

  test("env-selected REST catalog: fromEnv wires the C1 seam; Bootstrapper.run drives it") {
    import spark.implicits._
    val stub = new StubCatalog
    try {
      val cfg = PipelineConfig.fromEnv(Map(
        "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh",
        "GRAFT_SOURCES" -> "/data/a,/data/b",
        "GRAFT_CATALOG_URL" -> stub.baseUrl,
        "GRAFT_CATALOG_NAMESPACE" -> "db",
        "GRAFT_CATALOG_CREDENTIAL" -> "id:sec"))
      assert(cfg.catalog.contains((stub.baseUrl, "db", "id:sec")))
      // offline default unchanged: no URL -> warehouse catalog
      assert(PipelineConfig.fromEnv(Map(
        "GRAFT_WAREHOUSE_DIR" -> "/tmp/wh", "GRAFT_SOURCES" -> "/x")).catalog.isEmpty)
      // the env-built client drives the multi-target control loop (T5
      // isolation: the broken prefix must not halt the healthy one)
      val cat = cfg.catalog.map { case (u, ns, cr) => new RestCatalogClient(u, ns, cr) }
      val g = DmsGenerator.generate(23L)
      val src = tmpDir("src-run-rest")
      g.batches.flatten.toSeq.toDF()
        .withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/dms_logs_1.parquet")
      val wh = Warehouse(tmpDir("wh-run-rest"))
      val specs = Seq(
        PipelineSpec(src, "ra_changelog", "ra", CdcConfig("id", "ts")),
        PipelineSpec("/nonexistent-prefix", "rb_changelog", "rb", CdcConfig("id", "ts")))
      val rs = Bootstrapper.run(spark, wh, specs, cat)
      assert(rs.size == 2)
      assert(rs.head.error.isEmpty && rs.head.createdChangelog && rs.head.createdMirror)
      assert(stub.tables.contains("ra") && stub.tables.contains("ra_changelog"))
      val (_, createBody) = stub.creates.find(_._1 == "ra_changelog").get
      assert(createBody.contains(""""name": "id""""), createBody)
    } finally stub.stop()
  }

  test("PipelineMain.run registers changelog AND mirror with materialized schemas") {
    import spark.implicits._
    val stub = new StubCatalog
    try {
      val g = DmsGenerator.generate(31L)
      val src = tmpDir("pmsrc")
      g.batches.flatten.toSeq.toDF()
        .withColumnRenamed("modificationDate", "modification_date")
        .coalesce(1).write.mode("overwrite").parquet(s"$src/dms_logs_1.parquet")
      val cfg = PipelineConfig.fromEnv(Map(
        "GRAFT_WAREHOUSE_DIR" -> tmpDir("pmwh"),
        "GRAFT_SOURCES" -> src,
        "GRAFT_CDC_KEY" -> "id",
        "GRAFT_CDC_TS" -> "ts",
        "GRAFT_CATALOG_URL" -> stub.baseUrl,
        "GRAFT_CATALOG_NAMESPACE" -> "db",
        "GRAFT_CATALOG_CREDENTIAL" -> "id:sec"))
      // the SHIPPED control loop, not a test twin — this is the path that
      // registered "fields": [] in round 4
      PipelineMain.run(spark, cfg)
      val mirror = src.stripSuffix("/").split('/').last
      for (t <- Seq(s"${mirror}_changelog", mirror)) {
        val (_, body) = stub.creates.find(_._1 == t)
          .getOrElse(fail(s"no create-table call for $t; got ${stub.creates.map(_._1)}"))
        assert(!body.contains(""""fields": []"""), s"$t registered an empty schema:\n$body")
        for (c <- Seq("id", "name", "modification_date"))
          assert(body.contains(s""""name": "$c""""), s"$t create body missing column $c:\n$body")
      }
      // the changelog keeps the CDC envelope; the mirror folds it away
      val (_, clBody) = stub.creates.find(_._1 == s"${mirror}_changelog").get
      assert(clBody.contains(""""name": "op""""), clBody)
    } finally stub.stop()
  }
}
