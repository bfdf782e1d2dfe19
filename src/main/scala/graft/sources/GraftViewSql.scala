package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** SQL-surface wiring for [[GraftCatalog]]'s views (round 20).
  *
  * Stock Spark 4.1 ships the `ViewCatalog` SPI but NO analyzer or
  * execution support for it: `ResolveSessionCatalog` unconditionally
  * refuses `CREATE VIEW` on a non-session catalog
  * (`MISSING_CATALOG_ABILITY.VIEWS`), and no V2 view exec nodes exist.
  * Engines wire the surface themselves through session extensions —
  * Iceberg's `IcebergSparkSessionExtensions` does exactly this for its
  * `ViewCatalog` — so graft does the same, Spark-first:
  *
  *  - [[GraftViewParser]] (injected by [[graft.GraftExtensions]])
  *    delegates all parsing to Spark and rewrites the parsed VIEW DDL
  *    plans (`CreateView` / `DropView` / `ShowViews` / `ALTER VIEW`)
  *    that target a [[GraftCatalog]] into runnable commands calling the
  *    catalog's `ViewCatalog` face. Interception must happen at PARSE
  *    time: by the analyzer's first Resolution pass the identifier is
  *    resolved and `ResolveSessionCatalog` throws before any injected
  *    resolution rule could run.
  *  - [[ResolveGraftViews]] (injected resolution rule) substitutes a
  *    `SELECT ... FROM <cat>.<view>` relation with the stored SQL
  *    text re-parsed as a subquery — a view always serves the CURRENT
  *    snapshots of the tables inside it. References inside the view
  *    SQL resolve as written (qualify table names in the view body —
  *    the stored text is the contract, like Iceberg's view SQL).
  *
  * Sessions without the extension keep the programmatic `ViewCatalog`
  * API (and every non-view surface); the SQL face needs the standard
  * `spark.sql.extensions=graft.GraftExtensions` wiring.
  */
class GraftViewParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewSql.rewriteDdl(session, delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Analyzer substitution: a relation naming a graft view becomes the
  * stored SQL re-parsed under the view's name. Runs in the extended
  * Resolution batch — unknown relations stay unresolved (no throw)
  * until CheckAnalysis, so the substitution always gets its pass.
  */
case class ResolveGraftViews(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, false) =>
        GraftViewSql.storedViewSql(session, parts) match {
          case Some((viewName, sql)) =>
            SubqueryAlias(org.apache.spark.sql.catalyst.AliasIdentifier(viewName),
              session.sessionState.sqlParser.parseQuery(sql))
          case None => u
        }
    }
}

object GraftViewSql {

  /** (catalog, ident) when `parts` names something inside a registered
    * [[GraftCatalog]]: `cat.v` or `cat.default.v`. Anything else —
    * single-part names, other catalogs, unknown catalogs — is left to
    * Spark untouched.
    */
  private def graftTarget(session: SparkSession,
      parts: Seq[String]): Option[(GraftCatalog, Identifier)] = {
    if (parts.size < 2 || parts.size > 3) return None
    val cat =
      try session.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None }
    cat match {
      case g: GraftCatalog =>
        Some((g, Identifier.of(parts.tail.init.toArray, parts.last)))
      case _ => None
    }
  }

  /** The stored SQL of `parts` when it names an existing graft view. */
  private[sources] def storedViewSql(session: SparkSession,
      parts: Seq[String]): Option[(String, String)] =
    graftTarget(session, parts).flatMap { case (g, ident) =>
      if (g.viewExists(ident)) Some((ident.name, g.loadView(ident).query()))
      else None
    }

  private def viewParts(child: LogicalPlan): Option[Seq[String]] =
    child match {
      case UnresolvedIdentifier(parts, _) => Some(parts)
      case u: UnresolvedView => Some(u.multipartIdentifier)
      case u: UnresolvedTableOrView => Some(u.multipartIdentifier)
      case _ => None
    }

  /** Parse-time DDL rewrite (see class doc for why parse-time). Only
    * rewrites commands whose target provably lives in a GraftCatalog;
    * everything else keeps Spark's own path byte-for-byte.
    */
  private[graft] def rewriteDdl(session: SparkSession,
      plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(child, userCols, comment, _, props, originalText,
        query, allowExisting, replace, _) =>
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) =>
          require(userCols.isEmpty,
            s"graft views do not support a declared column list — alias " +
              "the columns inside the SELECT instead")
          val sql = originalText.getOrElse(throw new IllegalArgumentException(
            "CREATE VIEW without original SQL text cannot be stored"))
          GraftCreateViewCommand(g, ident, sql, query, comment,
            props, allowExisting, replace)
        case None => cv
      }
    case dv @ DropView(child, ifExists) =>
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) => GraftDropViewCommand(g, ident, ifExists)
        case None => dv
      }
    case sv @ ShowViews(child, pattern, output) =>
      child match {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(parts, _)
            if parts.nonEmpty && graftTarget(session, parts :+ "x").isDefined =>
          val (g, _) = graftTarget(session, parts :+ "x").get
          GraftShowViewsCommand(g, parts.tail, pattern, output)
        case _ => sv
      }
    case sp @ SetViewProperties(child, props) =>
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) =>
          GraftAlterViewCommand(g, ident,
            props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
        case None => sp
      }
    case up @ UnsetViewProperties(child, keys, _) =>
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) =>
          GraftAlterViewCommand(g, ident,
            keys.map(ViewChange.removeProperty))
        case None => up
      }
    case st @ ShowTableProperties(child, key, output) =>
      // SHOW TBLPROPERTIES on a graft VIEW serves the ViewCatalog
      // properties; table targets keep Spark's own path
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) if g.viewExists(ident) =>
          GraftShowViewPropsCommand(g, ident, key, output)
        case _ => st
      }
    case rt @ RenameTable(child, newName, true) =>
      viewParts(child).flatMap(graftTarget(session, _)) match {
        case Some((g, ident)) =>
          // RENAME TO takes a name in the SAME catalog: accept either
          // the bare view name or one re-qualified with this catalog
          val target = newName match {
            case Seq(one) => Identifier.of(ident.namespace, one)
            case head +: rest if head == g.name() && rest.nonEmpty =>
              Identifier.of(rest.init.toArray, rest.last)
            case other => throw new IllegalArgumentException(
              s"RENAME target ${other.mkString(".")} is outside catalog " +
                s"'${g.name()}' — views rename within their catalog")
          }
          GraftRenameViewCommand(g, ident, target)
        case None => rt
      }
    case other => other
  }
}

case class GraftCreateViewCommand(catalog: GraftCatalog, ident: Identifier,
    sql: String, query: LogicalPlan, comment: Option[String],
    props: Map[String, String], allowExisting: Boolean, replace: Boolean)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (catalog.viewExists(ident)) {
      if (allowExisting) return Nil // IF NOT EXISTS
      if (replace) catalog.dropView(ident) // OR REPLACE: swap the DDL
    }
    // analyze the AS query now: the stored schema is the view's declared
    // face (advisory — resolution re-parses the SQL text)
    val analyzed = org.apache.spark.sql.GraftSqlBridge.ofRows(session, query)
    val cm = session.sessionState.catalogManager
    catalog.createView(new ViewInfo(ident, sql,
      cm.currentCatalog.name(), cm.currentNamespace,
      analyzed.schema, analyzed.schema.fieldNames,
      Array.empty[String], Array.empty[String],
      (props ++ comment.map("comment" -> _)).asJava))
    Nil
  }
  private implicit class MapToJava(m: Map[String, String]) {
    def asJava: java.util.Map[String, String] = {
      val j = new java.util.HashMap[String, String]()
      m.foreach { case (k, v) => j.put(k, v) }
      j
    }
  }
}

case class GraftDropViewCommand(catalog: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (!catalog.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident)
    Nil
  }
}

case class GraftAlterViewCommand(catalog: GraftCatalog, ident: Identifier,
    changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftRenameViewCommand(catalog: GraftCatalog, from: Identifier,
    to: Identifier) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    catalog.renameView(from, to)
    Nil
  }
}

case class GraftShowViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, key: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import scala.jdk.CollectionConverters._
    val props = catalog.loadView(ident).properties().asScala
    key match {
      case Some(k) =>
        Seq(Row(k, props.getOrElse(k,
          s"View ${ident.name} does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

case class GraftShowViewsCommand(catalog: GraftCatalog, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val views = catalog.listViews(ns: _*)
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(
        p.replace("*", ".*").replace("|", "|"), // SHOW-style glob
        java.util.regex.Pattern.CASE_INSENSITIVE))
    views.toSeq
      .filter(v => re.forall(_.matcher(v.name).matches()))
      .map(v => Row(v.namespace.mkString("."), v.name, false))
  }
}
