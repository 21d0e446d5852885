package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, StagingTableCatalog, Table, TableCapability, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
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
class GraftCatalog extends TableCatalog with StagingTableCatalog
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

  /** CHECK constraints are first-class: `CREATE TABLE ... CHECK (...)`,
    * `ALTER TABLE ... ADD/DROP CONSTRAINT`. The engine enforces them on
    * every catalog write (ResolveTableConstraints wraps the write plan
    * in CheckInvariant from [[GraftTable.constraints]]), and the
    * manifest layer enforces them AGAIN at its own write funnels — so
    * direct-API appenders and the MoR UPDATE/MERGE post-images are
    * gated too, not just SQL INSERTs. */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog
        .TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

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

  /** `VERSION AS OF <v>` / `VERSION AS OF '<tag>'` — the analyzer's
    * time-travel hook; a non-numeric version resolves as a named tag
    * ([[TableManifest.tag]] — the vacuum-protected ref). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) throw new NoSuchTableException(ident)
    val v = version.toLongOption
      .orElse(TableManifest.tagVersion(spark, p, version))
      .getOrElse(throw new IllegalArgumentException(
        s"'$version' is neither a committed version number nor a tag " +
          s"of $p (tags: ${TableManifest.tags(spark, p)
            .map(_._1).mkString(", ")})"))
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
    val hint = clusterColsOf(partitions, schema)
    // seed version 0: a zero-row schema-bearing snapshot, so the first
    // INSERT is a normal keyed append and the path is self-describing;
    // `col NOT NULL` column syntax registers its constraint atomically
    // with the seed
    val nn = notNullConstraints(schema)
    TableManifest.createEmpty(spark, p, schema,
      if (nn.nonEmpty) Some(nn) else None)
    if (hint.nonEmpty) TableManifest.setLayoutHint(spark, p, hint)
    new GraftTable(p, None, Some(schema))
  }

  /** `PARTITIONED BY (c, ...)` translated to the clustered layout:
    * graft tables own their physical layout (`__batch` partitions +
    * OPTIMIZE/CLUSTER BY + zone maps), so a migrated Hive/Delta/Iceberg
    * DDL's partition spec becomes the table's LAYOUT HINT —
    * `CALL graft.optimize`/`maintain` default their cluster/stats
    * columns to it, and the refreshed zone maps give range probes on
    * those columns the pruned read that partition pruning was buying.
    * Layout ADVICE, not a partition contract (documented as such).
    *
    * Transform specs translate to their SOURCE column:
    *
    *  - `days(ts)` / `months(ts)` / `hours(ts)` / `years(ts)` — the
    *    Iceberg event-table idiom — cluster on `ts` itself: an
    *    identity range-cluster on the timestamp is STRICTLY FINER than
    *    the transform's granularity (same-day rows co-locate, and the
    *    zone maps prune any day/month/hour range probe at least as
    *    well as the directory layout would), with none of the
    *    small-files blowup a literal per-day directory tree brings at
    *    100 TB;
    *  - `bucket(n, c)` clusters on `c`: the hash-bucket CONTRACT
    *    (co-partitioned storage joins) is not kept — that is
    *    [[graft.operators.Bucketing]]'s job, declared there — but the
    *    point/range probes bucketed DDL usually wants are served by
    *    the zone maps on `c`.
    *
    * Anything else still refuses honestly. */
  private def clusterColsOf(partitions: Array[Transform],
      schema: StructType): Seq[String] = {
    def sourceCol(t: Transform): String = {
      require(t.references.length == 1,
        s"PARTITIONED BY transform '${t.describe()}' must reference " +
          "exactly one column")
      val ref = t.references.head.fieldNames
      require(ref.length == 1,
        s"PARTITIONED BY supports top-level columns only, got " +
          s"${ref.mkString(".")}")
      require(schema.fieldNames.exists(_.equalsIgnoreCase(ref.head)),
        s"PARTITIONED BY column '${ref.head}' is not in the schema")
      ref.head
    }
    val translated = Set("days", "months", "hours", "years", "bucket",
      "day", "month", "hour", "year")
    partitions.toSeq.map {
      case t if t.name == "identity" => sourceCol(t)
      case t if translated.contains(
          t.name.toLowerCase(java.util.Locale.ROOT)) => sourceCol(t)
      case other => throw new UnsupportedOperationException(
        s"graft maps PARTITIONED BY (col | days/months/hours/years(col)" +
          s" | bucket(n, col)) onto its clustered layout " +
          s"(OPTIMIZE/CLUSTER BY + zone-map pruning); transform " +
          s"'${other.describe()}' promises a directory layout this " +
          "format does not keep — partition by plain columns or drop " +
          "the clause")
    }.distinct
  }

  private def notNullConstraints(schema: StructType) =
    GraftCatalog.notNullConstraints(schema)

  /** `ALTER TABLE ... ADD COLUMN(S)` — schema evolution as DDL. The
    * manifest already evolves through wider appends (merged-schema
    * reads null-pad legacy batches), so ADD COLUMN is exactly one
    * zero-row append carrying the WIDENED schema: a normal versioned
    * commit (O(1) data — one footer-only parquet file), atomic under
    * the marker protocol, time-travel-correct (pins before the ALTER
    * keep the narrow schema), and immediately visible to every SQL
    * read and DML path through the merged-schema catalog surface.
    * Everything else (DROP/RENAME/retype) is refused: those need a
    * rewrite or column-id mapping the footer-merged layout does not
    * carry, and silently dropping a column from the MERGED schema
    * would resurrect on the next merge. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val p = pathOf(ident)
    if (!TableManifest.exists(spark, p)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val renames = changes.collect {
      case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val retypes = changes.collect {
      case t: TableChange.UpdateColumnType => t }
    changes.foreach {
      case _: TableChange.AddColumn =>
      case _: TableChange.RenameColumn =>
      case _: TableChange.DeleteColumn =>
      case _: TableChange.UpdateColumnType =>
      case a: TableChange.AddConstraint => addConstraint(p, a)
      case d: TableChange.DropConstraint => dropConstraint(p, d)
      case n: TableChange.UpdateColumnNullability => setNullability(p, n)
      case other => throw new UnsupportedOperationException(
        s"graft ALTER TABLE supports ADD/RENAME/DROP COLUMN, ALTER " +
          s"COLUMN TYPE (safe widenings), ADD/DROP CONSTRAINT, and " +
          s"SET/DROP NOT NULL; got ${other.getClass.getSimpleName}")
    }
    if (renames.nonEmpty || drops.nonEmpty || retypes.nonEmpty)
      applyColumnDdl(p, renames, drops, retypes)
    if (adds.isEmpty)
      return new GraftTable(p, None, Some(
        GraftTableSource.tableSchema(spark, p, None, mergeSchema = true)))
    val base = GraftTableSource.tableSchema(spark, p, None,
      mergeSchema = true)
    val existing = base.fieldNames
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    // a NEW column may never reuse a historical physical name or a
    // dropped column's name: the old bytes would resurrect under it
    // (the field-id hazard) — a compaction clears the history first
    val historical = TableManifest.columnMapOf(spark, p)
      .flatMap(m => m.logical +: m.physical)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val widened = adds.foldLeft(base) { (s, a) =>
      require(a.fieldNames.length == 1,
        s"graft ADD COLUMN is top-level only; got nested field " +
          s"'${a.fieldNames.mkString(".")}'")
      val n = a.fieldNames.head
      require(!existing.contains(n.toLowerCase(java.util.Locale.ROOT)) &&
          !s.fieldNames.exists(_.equalsIgnoreCase(n)),
        s"column '$n' already exists in graft table $p")
      require(!historical.contains(n.toLowerCase(java.util.Locale.ROOT)),
        s"column name '$n' is a historical name of a renamed/dropped " +
          s"column of $p — run maintain (compaction) to clear the " +
          "mapping before reusing it")
      require(a.isNullable,
        s"added column '$n' must be nullable — every pre-ALTER row " +
          "reads it as NULL (null-padded evolution)")
      require(a.position() == null,
        s"graft ADD COLUMN appends at the end of the schema (footer " +
          s"merge order); FIRST/AFTER positions are not supported")
      s.add(n, a.dataType(), nullable = true,
        Option(a.comment()).getOrElse(""))
    }
    // one zero-row unkeyed append under the widened schema: the footer
    // carries the new columns into every merged read from this version on
    TableManifest.append(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened), p)
    new GraftTable(p, None, Some(
      GraftTableSource.tableSchema(spark, p, None, mergeSchema = true)))
  }

  /** `ALTER TABLE ... RENAME COLUMN` / `DROP COLUMN` as METADATA-ONLY
    * commits: one column-mapping artifact ([[TableManifest
    * .setColumnMapping]], kind `colmap`) that the merged read path
    * consults — old parquet columns resolve under the new name (or
    * disappear, for DROP) without any rewrite, and time-travel pins
    * keep serving their era's names. A rename additionally lands a
    * zero-row append whose footer carries the new name (schema
    * stability; correctness holds either way — the mapping application
    * is present-tolerant). Refused: renaming onto any live or
    * historical name (the resurrection ambiguity a compaction clears),
    * touching a column a CHECK constraint references (the stored
    * predicate would silently stop resolving), dropping a column a
    * PENDING tombstone still masks by, and dropping the last column. */
  private def applyColumnDdl(p: String,
      renames: Seq[TableChange.RenameColumn],
      drops: Seq[TableChange.DeleteColumn],
      retypes: Seq[TableChange.UpdateColumnType] = Nil): Unit = {
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      require(attempt <= 10,
        s"column DDL on $p lost the commit race $attempt times — " +
          "retry under quieter DDL traffic")
      val v0 = TableManifest.versions(spark, p).last
      val logical = GraftTableSource.tableSchema(spark, p, None,
        mergeSchema = true)
      var names = logical.fieldNames.toSeq
      var mapping = TableManifest.columnMapOf(spark, p, Some(v0))
      val physAll = TableManifest.physicalColumns(spark, p)
        .map(lower).toSet
      val chain = mapping.flatMap(m => m.logical +: m.physical)
        .map(lower).toSet
      // HEAD of each reference: `point.x` pins the top-level column
      // `point` — the name a rename/drop would take away (last would
      // both miss the container and false-positive on unrelated
      // columns named like a leaf field)
      val consCols = TableManifest.constraintsOf(spark, p).flatMap(c =>
        spark.sessionState.sqlParser.parseExpression(c.sql).collect {
          case u: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute => lower(u.nameParts.head)
        }).toSet
      renames.foreach { r =>
        require(r.fieldNames.length == 1,
          "graft RENAME COLUMN is top-level only")
        val from = r.fieldNames.head
        val to = r.newName
        require(names.exists(_.equalsIgnoreCase(from)),
          s"no column '$from' in graft table $p " +
            s"(have: ${names.mkString(", ")})")
        require(!names.exists(_.equalsIgnoreCase(to)),
          s"column '$to' already exists in graft table $p")
        require(!physAll.contains(lower(to)) && !chain.contains(lower(to)),
          s"'$to' is (or was) a physical column name of $p — the old " +
            "bytes would resurrect under it; run maintain (compaction) " +
            "to clear the name history first")
        require(!consCols.contains(lower(from)),
          s"column '$from' is referenced by a CHECK constraint of $p — " +
            "drop the constraint first (its stored predicate would " +
            "silently stop resolving)")
        def typeOf(name: String): String =
          logical.fields.find(_.name.equalsIgnoreCase(name))
            .map(_.dataType.catalogString).getOrElse("string")
        mapping = mapping.find(_.logical.equalsIgnoreCase(from)) match {
          case Some(m) =>
            val ts =
              if (m.ptypes.size == m.physical.size) m.ptypes
              else m.physical.map(_ => typeOf(from))
            mapping.filterNot(_ eq m) :+
              TableManifest.ColumnMapping(to, to +: m.physical,
                dropped = false,
                ts.headOption.getOrElse(typeOf(from)) +: ts)
          case None =>
            mapping :+ TableManifest.ColumnMapping(to, Seq(to, from),
              dropped = false, Seq(typeOf(from), typeOf(from)))
        }
        names = names.map(n => if (n.equalsIgnoreCase(from)) to else n)
      }
      if (drops.nonEmpty) {
        val pendingCols = TableManifest.pendingSegmentColumns(spark, p)
        drops.foreach { d =>
          require(d.fieldNames.length == 1,
            "graft DROP COLUMN is top-level only")
          val from = d.fieldNames.head
          require(names.exists(_.equalsIgnoreCase(from)),
            s"no column '$from' in graft table $p " +
              s"(have: ${names.mkString(", ")})")
          require(names.length > 1,
            s"cannot DROP the last column of graft table $p")
          require(!consCols.contains(lower(from)),
            s"column '$from' is referenced by a CHECK constraint of " +
              s"$p — drop the constraint first")
          val eraNames = mapping
            .find(_.logical.equalsIgnoreCase(from))
            .map(m => (m.logical +: m.physical).map(lower))
            .getOrElse(Seq(lower(from)))
          require(!eraNames.exists(pendingCols.contains),
            s"column '$from' still drives a pending MoR tombstone of " +
              s"$p — run maintain (fold) before dropping it")
          mapping = mapping.find(_.logical.equalsIgnoreCase(from)) match {
            case Some(m) =>
              mapping.filterNot(_ eq m) :+ m.copy(dropped = true)
            case None =>
              mapping :+ TableManifest.ColumnMapping(from, Seq(from),
                dropped = true)
          }
          names = names.filterNot(_.equalsIgnoreCase(from))
        }
      }
      // ALTER COLUMN TYPE as a METADATA-ONLY widening: the column gains
      // a new-era storage name (`<col>__w<version>`) typed wide — new
      // writes physicalize onto it, old batches keep their era's bytes,
      // and the logical view casts every era to the wide type at read
      // ([[TableManifest.physExprOf]]). Only provably-lossless
      // widenings are accepted; anything else keeps the CTAS refusal.
      retypes.foreach { t =>
        // nested struct-field paths (`a.b`) widen the CONTAINER's era
        // type — the same colmap machinery, no new moving parts
        val cn = t.fieldNames.head
        require(names.exists(_.equalsIgnoreCase(cn)),
          s"no column '$cn' in graft table $p " +
            s"(have: ${names.mkString(", ")})")
        val entry = mapping.find(m => !m.dropped &&
          m.logical.equalsIgnoreCase(cn))
        val curT = entry.flatMap(_.ptypes.headOption)
          .map(org.apache.spark.sql.types.DataType.fromDDL)
          .orElse(logical.fields.find(_.name.equalsIgnoreCase(cn))
            .map(_.dataType))
          .getOrElse(throw new IllegalStateException(
            s"cannot resolve the current type of '$cn'"))
        val newT = GraftCatalog.widenNested(curT,
          t.fieldNames.toSeq.tail, t.newDataType(),
          t.fieldNames.mkString("."))
        require(!consCols.contains(lower(cn)),
          s"column '$cn' is referenced by a constraint of $p — drop " +
            "the constraint first (its stored predicate was analyzed " +
            "under the old type)")
        val eraName = s"${cn}__w$v0"
        require(!physAll.contains(lower(eraName)) &&
            !chain.contains(lower(eraName)) &&
            !names.exists(_.equalsIgnoreCase(eraName)),
          s"era name '$eraName' is taken — run maintain (compaction) " +
            "to clear the name history first")
        mapping = entry match {
          case Some(m) =>
            val ts =
              if (m.ptypes.size == m.physical.size) m.ptypes
              else m.physical.map(_ => curT.catalogString)
            mapping.filterNot(_ eq m) :+ m.copy(
              physical = eraName +: m.physical,
              ptypes = newT.catalogString +: ts)
          case None =>
            mapping :+ TableManifest.ColumnMapping(cn,
              Seq(eraName, cn), dropped = false,
              Seq(newT.catalogString, curT.catalogString))
        }
      }
      try {
        TableManifest.setColumnMapping(spark, p, mapping, Some(v0))
        committed = true
      } catch {
        case _: java.util.ConcurrentModificationException => // re-derive
      }
    }
    // schema-stability footer for renames and widenings: a zero-row
    // append whose footer carries the post-DDL schema (append
    // physicalizes it onto the era names; after the mapping commit, so
    // a crash in between leaves a correct — merely footer-less — state)
    if (renames.nonEmpty || retypes.nonEmpty) {
      val renamed = GraftTableSource.tableSchema(spark, p, None,
        mergeSchema = true)
      TableManifest.append(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          renamed), p)
    }
    ()
  }

  /** `ALTER TABLE ... ADD CONSTRAINT name CHECK (...)` — Spark has
    * already scanned for violations (AddCheckConstraintExec throws
    * before reaching us when the constraint is ENFORCED and data
    * violates); this persists the definition as one metadata-only
    * manifest commit. Only CHECK is accepted: PRIMARY KEY / UNIQUE /
    * FOREIGN KEY would need an enforcement index the layout does not
    * carry. */
  private def addConstraint(p: String,
      a: TableChange.AddConstraint): Unit = {
    val c = a.constraint() match {
      case chk: org.apache.spark.sql.connector.catalog.constraints.Check
        => chk
      case other => throw new UnsupportedOperationException(
        s"graft supports CHECK constraints only; got " +
          s"${other.getClass.getSimpleName} (PRIMARY KEY/UNIQUE/FOREIGN " +
          "KEY are not enforceable against this layout)")
    }
    val sql = Option(c.predicateSql()).filter(_.nonEmpty).getOrElse(
      throw new UnsupportedOperationException(
        s"CHECK constraint '${c.name}' carries no predicate SQL"))
    val status =
      if (a.validatedTableVersion() != null) "VALID"
      else c.validationStatus().name()
    retryConstraintDdl(p) { cur =>
      require(!cur.exists(_.name.equalsIgnoreCase(c.name)),
        s"constraint '${c.name}' already exists on graft table $p")
      Some(cur :+ TableManifest.TableConstraint(c.name, sql,
        c.enforced(), c.rely(), status))
    }
  }

  /** `ALTER TABLE ... ALTER COLUMN c SET/DROP NOT NULL` — the other
    * half of constraint DDL, persisted as a kind-tagged
    * [[TableManifest.TableConstraint]] (`notnull:<col>`,
    * predicate `col IS NOT NULL`) riding the same versioned artifact
    * and the same write-funnel enforcement as CHECK (every funnel:
    * appends, snapshots, UPDATE/MERGE post-images, the streaming
    * sink) — PLUS the stricter absence rule (a frame omitting the
    * column refuses instead of NULL-passing). SET validates existing
    * data first: one pruned scan; any NULL already present refuses the
    * DDL. */
  private def setNullability(p: String,
      n: TableChange.UpdateColumnNullability): Unit = {
    require(n.fieldNames().length == 1,
      "graft SET/DROP NOT NULL is top-level only")
    // SET arrives through GraftSetNotNullRule (CheckAnalysis refuses it
    // on any nullable-reported v2 column before the catalog is reached);
    // only DROP normally lands here — but handle both for API callers.
    if (!n.nullable()) GraftNotNull.set(spark, p, n.fieldNames().head)
    else GraftNotNull.drop(spark, p, n.fieldNames().head)
  }

  private def dropConstraint(p: String,
      d: TableChange.DropConstraint): Unit =
    retryConstraintDdl(p) { cur =>
      val (hit, kept) = cur.partition(_.name.equalsIgnoreCase(d.name()))
      if (hit.isEmpty) {
        if (!d.ifExists()) throw new IllegalArgumentException(
          s"no constraint '${d.name()}' on graft table $p " +
            s"(have: ${cur.map(_.name).mkString(", ")})")
        None // IF EXISTS on a missing name: nothing to commit
      } else Some(kept)
    }

  /** Read-modify-write of the constraint set under the optimistic
    * guard: `derive` sees the set AT a pinned version and the commit
    * refuses if anything landed since (two concurrent constraint DDLs
    * would otherwise serialize on version numbers while the second's
    * full-set write silently dropped the first's change). */
  private def retryConstraintDdl(p: String)(
      derive: Seq[TableManifest.TableConstraint]
        => Option[Seq[TableManifest.TableConstraint]]): Unit = {
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 10,
        s"constraint DDL on $p lost the commit race $attempt times — " +
          "retry under quieter DDL traffic")
      val v0 = TableManifest.versions(spark, p).last
      val next = derive(TableManifest.constraintsOf(spark, p, Some(v0)))
      if (next.isEmpty) return
      try {
        TableManifest.setConstraints(spark, p, next.get, Some(v0))
        return
      } catch {
        case _: java.util.ConcurrentModificationException => // re-derive
      }
    }
  }

  /** CREATE TABLE with inline constraints (the TableInfo route Spark's
    * DDL uses when the catalog declares SUPPORT_TABLE_CONSTRAINT). The
    * constraint artifact commits UNDER THE SAME MARKER as the seed
    * snapshot — one atomic version, no window where the table exists
    * unconstrained. */
  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val p = pathOf(ident)
    if (TableManifest.exists(spark, p))
      throw new TableAlreadyExistsException(ident)
    val hint = clusterColsOf(info.partitions(), info.schema())
    val cs = info.constraints().toSeq.map(toTableConstraint(p, _)) ++
      notNullConstraints(info.schema())
    TableManifest.createEmpty(spark, p, info.schema(),
      if (cs.nonEmpty) Some(cs) else None)
    if (hint.nonEmpty) TableManifest.setLayoutHint(spark, p, hint)
    new GraftTable(p, None, Some(info.schema()))
  }

  private[sources] def toTableConstraint(p: String,
      c: org.apache.spark.sql.connector.catalog.constraints.Constraint)
      : TableManifest.TableConstraint = c match {
    case chk: org.apache.spark.sql.connector.catalog.constraints.Check =>
      TableManifest.TableConstraint(chk.name,
        Option(chk.predicateSql()).filter(_.nonEmpty).getOrElse(
          throw new UnsupportedOperationException(
            s"CHECK constraint '${chk.name}' carries no predicate SQL")),
        chk.enforced(), chk.rely(), chk.validationStatus().name())
    case other => throw new UnsupportedOperationException(
      s"graft supports CHECK constraints only; got " +
        s"${other.getClass.getSimpleName} on table $p")
  }

  // ---- StagingTableCatalog: atomic CTAS / RTAS ---------------------------
  //
  // The manifest's stage-then-flip protocol IS a staging catalog: the
  // query's full result lands in a hidden `.data_pending_*` dir (no
  // marker, nothing visible), and commitStagedChanges publishes it with
  // ONE marker commit. So CREATE TABLE ... AS SELECT is crash-atomic (a
  // failed query leaves no half-written table, only an orphan dir the
  // maintenance sweep ages out), and REPLACE TABLE ... AS SELECT
  // PRESERVES HISTORY: the replacement is the next version of the SAME
  // manifest — `VERSION AS OF` pins from before the replace keep
  // serving until vacuum — instead of the non-staging drop+create
  // fallback that erases the version chain.

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    val hint = clusterColsOf(partitions, schema)
    if (TableManifest.exists(spark, pathOf(ident)))
      throw new TableAlreadyExistsException(ident)
    new GraftStagedTable(pathOf(ident), ident, schema, replace = false,
      orCreate = true, Nil, hint)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    val hint = clusterColsOf(partitions, schema)
    if (!TableManifest.exists(spark, pathOf(ident)))
      throw new NoSuchTableException(ident)
    new GraftStagedTable(pathOf(ident), ident, schema, replace = true,
      orCreate = false, Nil, hint)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): StagedTable = {
    val hint = clusterColsOf(partitions, schema)
    new GraftStagedTable(pathOf(ident), ident, schema, replace = true,
      orCreate = true, Nil, hint)
  }

  private def withConstraints(staged: StagedTable,
      ident: Identifier, info: TableInfo): StagedTable = {
    val cs = info.constraints().toSeq
      .map(toTableConstraint(pathOf(ident), _))
    staged.asInstanceOf[GraftStagedTable].setStagedConstraints(cs)
    staged
  }

  override def stageCreate(ident: Identifier,
      info: TableInfo): StagedTable =
    withConstraints(stageCreate(ident, info.schema(), info.partitions(),
      info.properties()), ident, info)

  override def stageReplace(ident: Identifier,
      info: TableInfo): StagedTable =
    withConstraints(stageReplace(ident, info.schema(), info.partitions(),
      info.properties()), ident, info)

  override def stageCreateOrReplace(ident: Identifier,
      info: TableInfo): StagedTable =
    withConstraints(stageCreateOrReplace(ident, info.schema(),
      info.partitions(), info.properties()), ident, info)

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

object GraftCatalog {
  import org.apache.spark.sql.types._

  /** Provably-lossless type widenings — the set ALTER COLUMN TYPE
    * accepts as metadata-only (every value of `from` round-trips
    * through `to` exactly): integer up-casts, FLOAT→DOUBLE (every
    * float is exactly representable as a double), and decimal
    * precision growth at the SAME scale. Everything else — narrowing,
    * scale changes, int→double (longs past 2^53 would silently round),
    * string/binary coercions — keeps the rewrite refusal. */
  private[sources] def safeWidening(from: DataType,
      to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) =>
      t.scale == f.scale && t.precision > f.precision &&
        t.precision <= DecimalType.MAX_PRECISION
    case _ => false
  }

  /** The container type with the STRUCT-FIELD `path` widened to
    * `leaf` — `ALTER COLUMN a.b TYPE BIGINT` rides the SAME era
    * machinery as a top-level widening: the container column gets the
    * new era storage name typed with this widened struct, old batches
    * keep their bytes, and the per-era read cast (struct-to-struct
    * up-cast) serves one type across eras. Refuses missing fields,
    * paths through non-structs, and any non-widening leaf change
    * (same rules as [[safeWidening]]). */
  private[sources] def widenNested(cur: DataType, path: Seq[String],
      leaf: DataType, fullName: String): DataType =
    if (path.isEmpty) {
      require(safeWidening(cur, leaf),
        s"graft ALTER COLUMN TYPE accepts METADATA-ONLY widenings " +
          "only (TINYINT/SMALLINT/INT to a wider integer, FLOAT to " +
          "DOUBLE, DECIMAL(p,s) to DECIMAL(p+k,s)); " +
          s"'$fullName' ${cur.catalogString} -> ${leaf.catalogString} " +
          "would narrow or need a rewrite (use CREATE TABLE ... AS " +
          "SELECT)")
      leaf
    } else cur match {
      case s: StructType =>
        val idx = s.fields.indexWhere(_.name.equalsIgnoreCase(path.head))
        require(idx >= 0,
          s"no field '${path.head}' under '$fullName' " +
            s"(have: ${s.fieldNames.mkString(", ")})")
        val f = s.fields(idx)
        StructType(s.fields.updated(idx,
          f.copy(dataType = widenNested(f.dataType, path.tail, leaf,
            fullName))))
      case other =>
        throw new IllegalArgumentException(
          s"graft ALTER COLUMN TYPE: '$fullName' traverses " +
            s"non-struct type ${other.catalogString}")
    }

  /** `CREATE/REPLACE TABLE (c T NOT NULL, ...)` arrives as schema
    * nullability — register each non-nullable column as a kind-tagged
    * NOT NULL constraint so the write funnels enforce what the DDL
    * declared. Only user-authored column DDL takes this path (plain
    * CREATE/REPLACE with a column list); CTAS/RTAS schemas
    * (query-derived nullability) deliberately do not. */
  private[sources] def notNullConstraints(
      schema: StructType): Seq[TableManifest.TableConstraint] =
    schema.fields.toSeq.filterNot(_.nullable).map(f =>
      TableManifest.TableConstraint(s"${f.name}_not_null",
        s"`${f.name}` IS NOT NULL", enforced = true, rely = false,
        status = "VALID", kind = s"notnull:${f.name}"))
}

/** The in-flight table of an atomic CTAS/RTAS: accepts exactly one
  * staged write (the query's result, landed UNPUBLISHED in a hidden
  * payload dir), then either publishes it as one marker commit or
  * erases it. A plain `REPLACE TABLE` (no AS SELECT) commits with no
  * staged write — the staged SCHEMA becomes a zero-row snapshot, the
  * empty-but-readable contract CREATE TABLE already keeps. */
private[sources] class GraftStagedTable(path: String, ident: Identifier,
    stagedSchema: StructType, replace: Boolean, orCreate: Boolean,
    initialConstraints: Seq[TableManifest.TableConstraint],
    layoutHint: Seq[String] = Nil)
    extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private val staged =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  @volatile private var stagedConstraints: Seq[TableManifest
    .TableConstraint] = initialConstraints

  private[sources] def setStagedConstraints(
      cs: Seq[TableManifest.TableConstraint]): Unit =
    stagedConstraints = cs

  private def spark: SparkSession = SparkSession.active

  override def name(): String = s"graft:$path (staged)"

  override def schema(): StructType = stagedSchema

  // constraints() deliberately not overridden — see the note on
  // GraftTable: the commit path below validates the staged payload
  // against the enforced set itself, so a violating row never publishes

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // RTAS plans its write as truncate-then-append
      // (OverwriteByExpression(true)); for a staged table the payload
      // IS the full replacement content, so truncate is the no-op
      // acknowledgment that lets the plan through
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                overwrite: Boolean): Unit = {
              // the one heavy step — the query executes and its full
              // result lands hidden; re-staging (never in practice:
              // one write per exec) discards the previous attempt
              val prev = staged.getAndSet(
                TableManifest.stageSnapshot(data, path))
              if (prev != null)
                TableManifest.discardStagedSnapshot(spark, path, prev)
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = {
    val exists = TableManifest.exists(spark, path)
    // the create/replace contract is re-checked at the COMMIT instant —
    // the staging window is long (the query runs inside it), so the
    // stage-time check alone would let a racing creator be silently
    // replaced by a CTAS that started earlier
    if (!replace && exists) {
      abortStagedChanges()
      throw new TableAlreadyExistsException(ident)
    }
    if (replace && !orCreate && !exists) {
      abortStagedChanges()
      throw new NoSuchTableException(ident)
    }
    // data AND constraint set flip under ONE marker: a crash or racing
    // writer can never leave the REPLACE'd data served/gated by the OLD
    // constraint definitions (which may not even resolve against the
    // new schema). The artifact is written whenever the staged
    // definition carries constraints OR an existing table's set must be
    // cleared by the replace (an empty artifact is the readable
    // constraint-free state).
    def atomicConstraints(
        defs: Seq[TableManifest.TableConstraint])
        : Option[Seq[TableManifest.TableConstraint]] =
      if (defs.nonEmpty) Some(defs)
      else if (replace && exists &&
          TableManifest.constraintsOf(spark, path).nonEmpty) Some(Nil)
      else None
    staged.get() match {
      case null =>
        // plain REPLACE TABLE / CREATE TABLE via staging: no query to
        // stage — the schema itself is the content (zero-row snapshot,
        // next version of the same manifest), and the COLUMN LIST is
        // user-authored, so `c T NOT NULL` column syntax registers its
        // constraints exactly like the non-staged CREATE path
        TableManifest.createEmpty(spark, path, stagedSchema,
          atomicConstraints(stagedConstraints ++
            GraftCatalog.notNullConstraints(stagedSchema)))
      case dir =>
        // validate the staged content against the NEW definition's
        // enforced CHECK constraints BEFORE the marker flips: a
        // violating CTAS/RTAS publishes nothing (one pruned re-read of
        // the staged parquet — only the constraint columns). ONLY the
        // analysis failure passes (a constraint column absent from the
        // staged shape reads NULL, and NULL satisfies CHECK) — a
        // runtime failure (ANSI cast error, corrupt staged parquet,
        // transient IO) means the scan could not PROVE zero violations,
        // so it aborts the staged commit instead of publishing unchecked
        stagedConstraints.filter(_.enforced).foreach { c =>
          import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
          val bad =
            try spark.read.parquet(dir)
              .filter(not(coalesce(expr(c.sql), lit(true))))
              .limit(1).count()
            catch {
              case _: org.apache.spark.sql.AnalysisException => 0L
              case e: Throwable => abortStagedChanges(); throw e
            }
          if (bad > 0) {
            abortStagedChanges()
            throw new IllegalArgumentException(
              s"CHECK constraint ${c.name} (${c.sql}) is violated by " +
                s"the staged CREATE/REPLACE content for $path — " +
                "nothing was published")
          }
        }
        TableManifest.publishStagedSnapshot(spark, path, dir,
          atomicConstraints(stagedConstraints))
    }
    // PARTITIONED BY → layout hint, placed after the one-marker publish
    // (metadata advice: a crash in between loses only the hint)
    if (layoutHint.nonEmpty)
      TableManifest.setLayoutHint(spark, path, layoutHint)
    ()
  }

  override def abortStagedChanges(): Unit = {
    val dir = staged.getAndSet(null)
    if (dir != null) TableManifest.discardStagedSnapshot(spark, path, dir)
  }
}
