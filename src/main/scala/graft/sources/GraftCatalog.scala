package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TableManifest

/** A path-addressed [[TableCatalog]] for graft tables — the Delta-style
  * catalog surface, registered once per session:
  *
  *   spark.sql.catalog.graft = graft.sources.GraftCatalog
  *
  * and then the manifest layer is plain multi-part SQL, INCLUDING native
  * time-travel syntax (the analyzer routes `VERSION AS OF` to
  * `loadTable(ident, version)` — no reader options needed):
  *
  *   SELECT * FROM graft.`/data/events`
  *   SELECT * FROM graft.`/data/events` VERSION AS OF 3
  *   INSERT INTO graft.`/data/events` SELECT ...
  *   CREATE TABLE graft.`/data/new` (id BIGINT, v DOUBLE)
  *   DROP TABLE graft.`/data/new`
  *
  * Identifiers ARE paths (one backticked part, or namespace parts joined
  * with `/`): the catalog holds no state of its own — existence checks,
  * schemas, and every read/write resolve against the table's manifest on
  * storage, so there is nothing to keep consistent between a metastore
  * and the table (the path-catalog property that makes this safe under
  * concurrent writers on shared storage).
  *
  * CREATE TABLE seeds a zero-row schema snapshot (version 0) so the
  * first INSERT lands as a normal keyed append; DROP TABLE removes the
  * table directory (the path-table meaning of drop); `TIMESTAMP AS OF`
  * resolves against marker commit times ([[TableManifest.versionAtTime]];
  * version pins remain the exact time axis).
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = "graft"

  /** SQL `CALL graft.<proc>(...)` — the maintenance runbook surface
    * (optimize / vacuum / maintain / history), see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.all.getOrElse(ident.name(),
      throw new RuntimeException(
        s"unknown graft procedure '${ident.name()}' " +
          s"(have: ${GraftProcedures.all.keys.toSeq.sorted.mkString(", ")})"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.identifiers

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // paths are the identifiers; there is no namespace to list

  override def tableExists(ident: Identifier): Boolean =
    TableManifest.exists(spark, pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) throw new NoSuchTableException(ident)
    // serve the MERGED schema: an evolved table's late-added columns are
    // visible to SQL (null-padded over legacy batches — the manifest's
    // documented evolved-read contract) instead of silently absent
    // until the next compaction; identical to the plain schema on
    // non-evolved tables, memoized per (path, version)
    new GraftTable(p, None,
      Some(GraftTableSource.tableSchema(spark, p, None, mergeSchema = true)))
  }

  /** `VERSION AS OF <v>` — the analyzer's time-travel hook. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft versions are numbers (committed manifest versions); " +
          s"got '$version'")
    }
    require(TableManifest.versions(spark, p).contains(v),
      s"version $v of $p was never committed or has been vacuumed " +
        s"(retained: ${TableManifest.versions(spark, p).mkString(", ")})")
    new GraftTable(p, Some(v), Some(
      GraftTableSource.tableSchema(spark, p, Some(v), mergeSchema = true)))
  }

  /** `TIMESTAMP AS OF <t>` — resolved to the newest version committed
    * at-or-before `t` from the marker files' modification times (the
    * Delta convention; `timestamp` arrives in MICROseconds). Version
    * pins remain the exact time axis — a restored/copied table re-stamps
    * mtimes — so the error on a miss points at VERSION AS OF. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) throw new NoSuchTableException(ident)
    val tsMillis = timestamp / 1000L
    val v = TableManifest.versionAtTime(spark, p, tsMillis).getOrElse(
      throw new IllegalArgumentException(
        s"no version of $p was committed at-or-before " +
          s"${java.time.Instant.ofEpochMilli(tsMillis)} (earliest " +
          "retained commit is newer, or the table did not exist yet) — " +
          "pin an exact version with VERSION AS OF " +
          s"(retained: ${TableManifest.versions(spark, p).mkString(", ")})"))
    new GraftTable(p, Some(v), Some(
      GraftTableSource.tableSchema(spark, p, Some(v), mergeSchema = true)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val p = pathOf(ident)
    if (TableManifest.exists(spark, p))
      throw new TableAlreadyExistsException(ident)
    require(partitions.isEmpty,
      "graft tables manage their own layout (__batch partitions, " +
        "OPTIMIZE/CLUSTER BY) — PARTITIONED BY is not a table option")
    // seed version 0: a zero-row schema-bearing snapshot, so the first
    // INSERT is a normal keyed append and the path is self-describing
    TableManifest.createEmpty(spark, p, schema)
    new GraftTable(p, None, Some(schema))
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft schemas evolve through appends (mergeSchema/null-pad read " +
        "semantics), not ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) return false
    // a table re-created at this path restarts version numbering, so
    // the (path, version) schema-cache keys of the dropped table would
    // collide with the new one's and serve the stale schema (REPLACE
    // TABLE = drop + create hits exactly this)
    GraftTableSource.invalidateSchema(p)
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hp, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft tables are path-addressed; rename the directory")
}
