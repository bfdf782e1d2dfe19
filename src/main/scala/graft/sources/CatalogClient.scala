package graft.sources

import graft.sources.Tables.Warehouse

/** The catalog surface the control plane talks to — the seam where the
  * reference's Iceberg REST catalog + OAuth2 client-credentials connector
  * (tabular.py:14-37, credential wiring batch_bootstrapper.py:42-47) plugs
  * in. The data plane (parquet reads/writes, snapshot commits) stays on
  * [[Tables.Warehouse]]; everything CONTROL-plane shaped — existence
  * probes and table-property commits, the two operations the reference's
  * bootstrap performs against its catalog (tabular.py:91-99 probe,
  * :66-75 property updates) — goes through this trait. A REST
  * implementation (exists = `GET /v1/{prefix}/namespaces/{ns}/tables/{t}`,
  * properties = commit-table updates, auth = bearer token from the
  * client-credentials grant) slots in without touching
  * [[graft.plans.Bootstrapper]] or the stream.
  */
trait CatalogClient {
  def tableExists(name: String): Boolean
  def properties(name: String): Map[String, String]
  /** Merge `props` into the table's properties (create-if-absent). */
  def setProperties(name: String, props: Map[String, String]): Unit
  /** Notify the catalog that the engine just created `name`, carrying the
    * table's schema so external readers resolving the table through the
    * catalog see its actual columns. A no-op where creation is implicit
    * (the warehouse directory IS the registration); a REST catalog
    * registers the table here so later probes and property commits
    * resolve. Called by the control plane right after each successful
    * table bootstrap. The schema parameter deliberately has NO default:
    * round 4 shipped a caller that silently registered `"fields": []`
    * because the default empty StructType compiled — every caller must
    * now say what columns it is registering.
    */
  def tableCreated(name: String,
      schema: org.apache.spark.sql.types.StructType): Unit = ()
}

/** Offline default: table existence = warehouse directory probe, properties
  * = the durable `_metadata/<table>.json` store ([[Tables.TableProps]]).
  * This is the catalog stand-in SURVEY §7.1 scopes the offline build to.
  */
final class WarehouseCatalog(wh: Warehouse) extends CatalogClient {
  override def tableExists(name: String): Boolean = wh.exists(name)
  override def properties(name: String): Map[String, String] =
    Tables.TableProps.read(wh, name)
  override def setProperties(name: String, props: Map[String, String]): Unit =
    Tables.TableProps.write(wh, name, Tables.TableProps.read(wh, name) ++ props)
}
