package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8

/** REST catalog connector with OAuth2 client-credentials auth — the online
  * implementation of the [[CatalogClient]] seam, covering the one reference
  * behavior the offline warehouse stand-in could not (SURVEY C1/S8):
  *
  *  - token exchange (tabular.py:14-37): POST `{base}/ws/v1/oauth/tokens`,
  *    form-encoded `grant_type=client_credentials` with client id/secret
  *    split from a `id:secret` credential string, bearer token from the
  *    JSON `access_token` field (RFC 6749 §4.4);
  *  - table existence / properties / property commits against the Iceberg
  *    REST catalog API (`/v1/namespaces/{ns}/tables/{t}`; property commits
  *    as a `set-properties` update, the REST form of the reference's
  *    `update_properties().set(...).commit()` at tabular.py:66-75).
  *
  * Deliberately control-plane only: data reads/writes stay on the engine's
  * warehouse (the reference likewise delegates data to its managed
  * service). No external HTTP library — java.net.http ships with the JDK.
  * Behavior is spec-tested against an in-JVM stub server
  * (RestCatalogSpec); this container has no egress, so no live endpoint is
  * ever contacted in CI.
  *
  * @param baseUrl    catalog root, e.g. `https://api.example.com`
  * @param namespace  catalog namespace holding the pipeline's tables
  * @param credential `client_id:client_secret` (the reference's
  *                   TABULAR_CREDENTIAL shape, batch_bootstrapper.py:43)
  */
final class RestCatalogClient(
    baseUrl: String,
    namespace: String,
    credential: String,
    http: HttpClient = RestCatalogClient.defaultHttp) extends CatalogClient {

  private val base = baseUrl.stripSuffix("/")

  /** Bearer token, fetched once per client (reference fetches per run,
    * batch_bootstrapper.py:44); a 401-triggered refresh would hook here.
    */
  private lazy val token: String = RestCatalogClient.fetchToken(base, credential, http)

  private def tableUri(name: String): URI =
    URI.create(s"$base/v1/namespaces/${enc(namespace)}/tables/${enc(name)}")
  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  private def send(req: HttpRequest.Builder): HttpResponse[String] =
    http.send(
      req.timeout(RestCatalogClient.RequestTimeout)
        .header("Authorization", s"Bearer $token").build(),
      HttpResponse.BodyHandlers.ofString())

  override def tableExists(name: String): Boolean = {
    val resp = send(HttpRequest.newBuilder(tableUri(name))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()))
    resp.statusCode() match {
      case 200 | 204 => true
      case 404 => false
      case s => throw new RuntimeException(
        s"catalog HEAD ${tableUri(name)} failed: HTTP $s")
    }
  }

  override def properties(name: String): Map[String, String] = {
    val resp = send(HttpRequest.newBuilder(tableUri(name)).GET())
    resp.statusCode() match {
      case 200 => RestCatalogClient.objectFields(resp.body(), "properties")
      case 404 => Map.empty
      case s => throw new RuntimeException(
        s"catalog GET ${tableUri(name)} failed: HTTP $s")
    }
  }

  /** Register an engine-created table (Iceberg REST create-table),
    * converting the table's Spark schema to Iceberg-REST fields so
    * external readers resolving the table through the catalog see its
    * actual columns (the reference's create path carries no schema at all,
    * tabular.py:130-139 — bucket/prefix/format only). 409 = someone
    * registered it concurrently — the desired end state, not an error.
    */
  override def tableCreated(name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val fp = RestCatalogClient.schemaFingerprint(schema)
    val body =
      s"""{"name": "${esc(name)}", "schema": ${RestCatalogClient.icebergSchemaJson(schema)}}"""
    val resp = send(HttpRequest.newBuilder(
        URI.create(s"$base/v1/namespaces/${enc(namespace)}/tables"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)))
    resp.statusCode() match {
      case ok if ok / 100 == 2 =>
        // stamp the registered shape so later runs can detect evolution
        setProperties(name, Map(RestCatalogClient.SchemaFpProp -> fp))
      case 409 =>
        // already registered (this run or a concurrent one). If the
        // MATERIALIZED schema no longer matches what the catalog knows
        // (an upstream column arrived mid-stream and the restart widened
        // the tables — CdcStreamSpec's evolution path), follow the
        // Iceberg-REST evolution protocol: commit add-schema +
        // set-current-schema(-1 = the schema just added). The fingerprint
        // property is the cheap detector, but it is stamped AFTER the
        // create commit, so the loser of a concurrent create race can see
        // it missing while the winner registered this exact shape — the
        // catalog's CURRENT schema is compared structurally (field ids
        // ignored) before committing, so identical-schema races are a
        // no-op stamp, never a redundant add-schema (round-5 advice).
        if (!properties(name).get(RestCatalogClient.SchemaFpProp).contains(fp)) {
          val wantShape =
            RestCatalogClient.schemaShape(RestCatalogClient.icebergSchemaJson(schema))
          if (!currentSchemaShape(name).exists(wantShape.contains)) {
            val commit =
              s"""{"requirements": [], "updates": [
                 |  {"action": "add-schema", "schema": ${RestCatalogClient.icebergSchemaJson(schema)}},
                 |  {"action": "set-current-schema", "schema-id": -1}]}""".stripMargin
            val r = send(HttpRequest.newBuilder(tableUri(name))
              .header("Content-Type", "application/json")
              .POST(HttpRequest.BodyPublishers.ofString(commit)))
            if (r.statusCode() / 100 != 2)
              throw new RuntimeException(
                s"catalog schema evolution for $name failed: HTTP ${r.statusCode()} ${r.body()}")
          }
          setProperties(name, Map(RestCatalogClient.SchemaFpProp -> fp))
        }
      case s => throw new RuntimeException(
        s"catalog create-table $name failed: HTTP $s ${resp.body()}")
    }
  }

  override def setProperties(name: String, props: Map[String, String]): Unit = {
    val updates = props.toSeq.sorted
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    val body =
      s"""{"requirements": [], "updates": [{"action": "set-properties", "updates": $updates}]}"""
    val resp = send(HttpRequest.newBuilder(tableUri(name))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)))
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"catalog commit ${tableUri(name)} failed: HTTP ${resp.statusCode()} ${resp.body()}")
  }

  /** Canonical shape of the catalog's CURRENT schema for `name`, if the
    * load-table response carries one: `metadata.current-schema-id`
    * resolved against `metadata.schemas` (falling back to a lone schema,
    * or the v1 `metadata.schema`). None when the table is missing or the
    * response has no parseable schema — callers treat unknown as
    * "assume different".
    */
  private def currentSchemaShape(name: String): Option[String] = {
    val resp = send(HttpRequest.newBuilder(tableUri(name)).GET())
    if (resp.statusCode() != 200) return None
    try {
      val meta = RestCatalogClient.parseJson(resp.body()) match {
        case m: Map[String @unchecked, Any @unchecked] =>
          m.get("metadata") match {
            case Some(mm: Map[String @unchecked, Any @unchecked]) => mm
            case _ => return None
          }
        case _ => return None
      }
      val fromList = meta.get("schemas") match {
        case Some(ss: List[Any @unchecked]) =>
          val byId = for {
            want <- meta.get("current-schema-id").collect { case n: BigDecimal => n }
            s <- ss.collectFirst {
              case sm: Map[String @unchecked, Any @unchecked]
                if sm.get("schema-id").contains(want) => sm
            }
          } yield s
          byId.orElse(ss.lastOption.collect {
            case sm: Map[String @unchecked, Any @unchecked] => sm
          })
        case _ => None
      }
      fromList
        .orElse(meta.get("schema").collect {
          case sm: Map[String @unchecked, Any @unchecked] => sm
        })
        .map(RestCatalogClient.shapeOf)
    } catch { case _: Exception => None }
  }

  private def esc(s: String): String = RestCatalogClient.esc(s)
}

object RestCatalogClient {

  /** Both connect and per-request deadline: an unresponsive catalog must
    * surface as an exception the per-target fault isolation can catch, not
    * wedge the control plane forever (java.net.http blocks indefinitely by
    * default).
    */
  private val RequestTimeout = java.time.Duration.ofSeconds(30)

  private[sources] def defaultHttp: HttpClient =
    HttpClient.newBuilder().connectTimeout(RequestTimeout).build()

  /** JSON string escape — quotes, backslashes, and ALL control chars
    * (a newline smuggled in via an env-sourced property value must become
    * \n in the payload, not an invalid raw byte a spec-compliant server
    * rejects with an opaque 400).
    */
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** OAuth2 client-credentials exchange (tabular.py:25-37): form-encoded
    * POST, token read from the response's `access_token`.
    */
  def fetchToken(baseUrl: String, credential: String, http: HttpClient): String = {
    val (id, secret) = credential.split(":", 2) match {
      case Array(i, s) => (i, s)
      case _ => throw new IllegalArgumentException(
        "credential must be 'client_id:client_secret'")
    }
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> id,
      "client_secret" -> secret)
      .map { case (k, v) => s"$k=${URLEncoder.encode(v, UTF_8)}" }
      .mkString("&")
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"${baseUrl.stripSuffix("/")}/ws/v1/oauth/tokens"))
        .timeout(RequestTimeout)
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(s"token exchange failed: HTTP ${resp.statusCode()} ${resp.body()}")
    stringField(resp.body(), "access_token").getOrElse(
      throw new RuntimeException(s"token response carries no access_token: ${resp.body()}"))
  }

  /** Spark schema → Iceberg-REST schema JSON (Iceberg table spec: a
    * `struct` type whose every field and nested collection element carries
    * a unique field id — allocated here by a pre-order walk). Covers the
    * types the engine's tables use: all scalars, decimals,
    * timestamps (tz and ntz), arrays (embeddings), maps, and nested
    * structs. Anything unmappable fails loudly rather than registering a
    * lying schema.
    */
  /** Property key stamping the last schema shape this engine registered —
    * the cheap evolution detector [[RestCatalogClient.tableCreated]] uses.
    */
  private[graft] val SchemaFpProp = "graft.schema-fingerprint"

  /** Order-sensitive fingerprint of (name, type, nullability) triples —
    * any widening/retyping changes it.
    */
  private[graft] def schemaFingerprint(
      schema: org.apache.spark.sql.types.StructType): String = {
    val repr = schema.fields
      .map(f => s"${f.name}:${f.dataType.sql}:${f.nullable}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(repr.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  private[graft] def icebergSchemaJson(
      schema: org.apache.spark.sql.types.StructType): String = {
    import org.apache.spark.sql.types._
    var nextId = 0
    def id(): Int = { nextId += 1; nextId }
    def typ(dt: DataType): String = dt match {
      case BooleanType => "\"boolean\""
      case ByteType | ShortType | IntegerType => "\"int\""
      case LongType => "\"long\""
      case FloatType => "\"float\""
      case DoubleType => "\"double\""
      case StringType => "\"string\""
      case BinaryType => "\"binary\""
      case DateType => "\"date\""
      case TimestampType => "\"timestamptz\""
      case TimestampNTZType => "\"timestamp\""
      case d: DecimalType => s""""decimal(${d.precision}, ${d.scale})""""
      case a: ArrayType =>
        s"""{"type": "list", "element-id": ${id()}, "element": ${typ(a.elementType)}, "element-required": ${!a.containsNull}}"""
      case m: MapType =>
        s"""{"type": "map", "key-id": ${id()}, "key": ${typ(m.keyType)}, "value-id": ${id()}, "value": ${typ(m.valueType)}, "value-required": ${!m.valueContainsNull}}"""
      case s: StructType =>
        s"""{"type": "struct", "fields": ${fields(s)}}"""
      case other => throw new IllegalArgumentException(
        s"no Iceberg type mapping for ${other.sql}")
    }
    def fields(s: StructType): String =
      s.fields.map { f =>
        s"""{"id": ${id()}, "name": "${esc(f.name)}", "required": ${!f.nullable}, "type": ${typ(f.dataType)}}"""
      }.mkString("[", ", ", "]")
    s"""{"type": "struct", "schema-id": 0, "fields": ${fields(schema)}}"""
  }

  /** First string-valued `"field": "..."` in a JSON document. */
  private[graft] def stringField(json: String, field: String): Option[String] =
    (s""""${java.util.regex.Pattern.quote(field)}"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r
      .findFirstMatchIn(json).map(m => unesc(m.group(1)))

  /** Flat string->string fields of the named object in a JSON document —
    * enough for Iceberg's `properties` map (always flat strings). Scans to
    * the object's matching close brace so sibling objects don't bleed in.
    */
  private[graft] def objectFields(json: String, name: String): Map[String, String] = {
    val start = (s""""${java.util.regex.Pattern.quote(name)}"\\s*:\\s*\\{""").r
      .findFirstMatchIn(json).map(_.end - 1).getOrElse(return Map.empty)
    var depth = 0
    var i = start
    var inStr = false
    var end = -1
    while (i < json.length && end < 0) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return Map.empty
    val body = json.substring(start + 1, end)
    """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(body)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Minimal recursive-descent JSON parser — objects as `Map[String, Any]`,
    * arrays as `List[Any]`, numbers as `BigDecimal`, plus String / Boolean
    * / null. Exists so schema comparison works against ANY spec-compliant
    * catalog response (field order, whitespace, id assignment all vary by
    * server); the regex helpers above remain for the flat fast paths.
    */
  private[graft] def parseJson(s: String): Any = {
    var i = 0
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad JSON at $i: $msg")
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'"); i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("dangling escape")
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              if (i + 4 >= s.length) err("short \\u")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case other => err(s"bad escape \\$other")
          }
        } else sb += c
        i += 1
      }
      expect('"')
      sb.toString
    }
    def value(): Any = {
      ws()
      if (i >= s.length) err("eof")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); val k = str(); ws(); expect(':')
              m(k) = value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect('}'); more = false }
            }
          }
          m.toMap
        case '[' =>
          i += 1; ws()
          val b = List.newBuilder[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              b += value(); ws()
              if (i < s.length && s.charAt(i) == ',') i += 1
              else { expect(']'); more = false }
            }
          }
          b.result()
        case '"' => str()
        case 't' => if (s.startsWith("true", i)) { i += 4; true } else err("t?")
        case 'f' => if (s.startsWith("false", i)) { i += 5; false } else err("f?")
        case 'n' => if (s.startsWith("null", i)) { i += 4; null } else err("n?")
        case _ =>
          val start = i
          while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          if (i == start) err("unexpected char")
          BigDecimal(s.substring(start, i))
      }
    }
    val v = value(); ws()
    if (i != s.length) err("trailing content")
    v
  }

  /** Canonical shape string of a parsed Iceberg type: (name, required,
    * type) per field in order, field IDS IGNORED — two registrations of
    * the same Spark schema get different server-assigned ids but the same
    * shape.
    */
  private[graft] def shapeOf(t: Any): String = t match {
    case m: Map[String @unchecked, Any @unchecked] =>
      m.get("type") match {
        case Some("struct") =>
          val fs = m.get("fields").collect { case l: List[Any @unchecked] => l }
            .getOrElse(Nil)
          fs.map {
            case f: Map[String @unchecked, Any @unchecked] =>
              val req = f.get("required").contains(true)
              s"${f.getOrElse("name", "?")}:${if (req) "req" else "opt"}:" +
                shapeOf(f.getOrElse("type", "?"))
            case other => s"?$other"
          }.mkString("struct<", ",", ">")
        case Some("list") =>
          val req = m.get("element-required").contains(true)
          s"list<${shapeOf(m.getOrElse("element", "?"))},${if (req) "req" else "opt"}>"
        case Some("map") =>
          val req = m.get("value-required").contains(true)
          s"map<${shapeOf(m.getOrElse("key", "?"))},${shapeOf(m.getOrElse("value", "?"))},${if (req) "req" else "opt"}>"
        case other => s"?$other"
      }
    case s: String => s
    case other => s"?$other"
  }

  /** [[shapeOf]] from schema JSON text; None when unparseable. */
  private[graft] def schemaShape(json: String): Option[String] =
    try Some(shapeOf(parseJson(json))) catch { case _: Exception => None }
}
