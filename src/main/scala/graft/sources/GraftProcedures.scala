package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TableManifest

/** The maintenance surface as SQL stored procedures (Spark 4's DSv2
  * procedure API — the Iceberg `CALL` shape), served by [[GraftCatalog]]:
  *
  *   CALL graft.optimize(path => '/p', cluster_by => 'id', files => 16)
  *   CALL graft.vacuum(path => '/p', keep => 2, retain_ms => 86400000)
  *   CALL graft.maintain(path => '/p', max_batches => 16)
  *   CALL graft.history(path => '/p')
  *
  * Each returns its result as rows (committed version, retained
  * versions, the maintenance report, the audit view), so an operator
  * runbook is plain SQL end to end — create, ingest, query, optimize,
  * vacuum, audit — with no library imports. The procedures delegate to
  * the [[TableManifest]] maintenance entry points unchanged; everything
  * those guarantee (one-marker atomicity, retention horizons, pruning-
  * artifact refresh, conservative fallbacks) holds verbatim here.
  */
private[sources] object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  private def cols(r: InternalRow, i: Int): Seq[String] = {
    val s = str(r, i).trim
    if (s.isEmpty) Nil else s.split(",").map(_.trim).toSeq
  }

  private def toInternal(schema: StructType,
      rows: Seq[org.apache.spark.sql.Row]): Seq[InternalRow] =
    rows.map(r => InternalRow.fromSeq(
      schema.fields.indices.map { i =>
        val v = if (r.isNullAt(i)) null else r.get(i)
        v match {
          case s: String => UTF8String.fromString(s)
          case other     => other
        }
      }))

  private abstract class P(procName: String, desc: String,
      params: Seq[ProcedureParameter], resultSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    protected def run(args: InternalRow): Seq[InternalRow]
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = run(input).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = out
        override def readSchema(): StructType = resultSchema
        override def description(): String = s"graft.$procName result"
      }).iterator()
    }
  }

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inD(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()

  private val optimize = new P("optimize",
    "rewrite the live table range-/Z-order-clustered (CLUSTER BY); " +
      "cluster_by and stats_cols default to the table's PARTITIONED BY " +
      "layout hint when omitted; target_file_bytes > 0 derives the " +
      "file count from the payload's bytes (the small-file policy as a " +
      "size), else `files` is used verbatim; returns the committed " +
      "version",
    Seq(in("path", StringType), inD("cluster_by", StringType, "''"),
      inD("files", IntegerType, "16"),
      inD("stats_cols", StringType, "''"),
      inD("target_file_bytes", LongType, "0")),
    new StructType().add("version", LongType, nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val hint = TableManifest.layoutHint(spark, p)
      val clusterBy = Some(cols(a, 1)).filter(_.nonEmpty).getOrElse(hint)
      require(clusterBy.nonEmpty,
        s"optimize needs cluster_by (no PARTITIONED BY layout hint is " +
          s"recorded for $p)")
      val stats = Some(cols(a, 3)).filter(_.nonEmpty).getOrElse(hint)
      val v =
        if (a.getLong(4) > 0L)
          TableManifest.optimizeToSize(spark, p, clusterBy,
            a.getLong(4), stats)
        else TableManifest.optimize(spark, p, clusterBy,
          a.getInt(2), stats)
      Seq(InternalRow(v))
    }
  }

  private val vacuum = new P("vacuum",
    "reclaim versions past `keep`, never inside `retain_ms` (RETAIN " +
      "rule) or pinned by a tag; `dry_run => true` only REPORTS what " +
      "would be reclaimed (same cutoff/pin arithmetic, zero deletion); " +
      "returns the reclaimed (or reclaimable) versions and those still " +
      "resolvable",
    Seq(in("path", StringType), inD("keep", IntegerType, "2"),
      inD("retain_ms", LongType, "0"),
      inD("dry_run", BooleanType, "false")),
    new StructType()
      .add("reclaimed_versions", StringType, nullable = false)
      .add("retained_versions", StringType, nullable = false)
      .add("dry_run", BooleanType, nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val dry = a.getBoolean(3)
      val (reclaimed, retained) =
        if (dry) {
          val r = TableManifest.vacuumDryRun(spark, p, a.getInt(1),
            a.getLong(2))
          (r, TableManifest.versions(spark, p).filterNot(r.toSet))
        } else {
          val r = TableManifest.vacuum(spark, p, a.getInt(1),
            a.getLong(2))
          (r, TableManifest.versions(spark, p).filterNot(r.toSet))
        }
      Seq(InternalRow(
        UTF8String.fromString(reclaimed.mkString(",")),
        UTF8String.fromString(retained.mkString(",")), dry))
    }
  }

  private val maintainSchema = new StructType()
    .add("batches_before", IntegerType, nullable = false)
    .add("compacted", BooleanType, nullable = false)
    .add("batches_after", IntegerType, nullable = false)
    .add("deletes_before", IntegerType, nullable = false)
    .add("deletes_after", IntegerType, nullable = false)

  private val maintain = new P("maintain",
    "one-call policy maintenance: fold the append log / pending MoR " +
      "deletes past their thresholds, refresh pruning artifacts, expire " +
      "old versions; returns the maintenance report",
    Seq(in("path", StringType), inD("max_batches", IntegerType, "16"),
      inD("max_deletes", IntegerType, "8"),
      inD("stats_cols", StringType, "''"),
      inD("bloom_cols", StringType, "''"),
      inD("keep_versions", IntegerType, "2"),
      inD("retain_ms", LongType, "0")),
    maintainSchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      // stats_cols default to the PARTITIONED BY layout hint: the
      // migrated DDL's partition columns keep their pruned range reads
      // through the zone maps maintenance refreshes
      val stats = Some(cols(a, 3)).filter(_.nonEmpty)
        .getOrElse(TableManifest.layoutHint(spark, p))
      val report = TableManifest.maintain(spark, p,
        maxBatches = a.getInt(1), maxDeletes = a.getInt(2),
        statsCols = stats, bloomCols = cols(a, 4),
        keepVersions = a.getInt(5), retainMs = a.getLong(6))
      toInternal(maintainSchema, report.collect().toIndexedSeq)
    }
  }

  private val historySchema = new StructType()
    .add("version", LongType).add("is_current", BooleanType)
    .add("readable", BooleanType).add("n_rows", LongType)
    .add("payload_bytes", LongType).add("kind", StringType)
    .add("tags", StringType)

  private val history = new P("history",
    "one row per retained version: readable?, rows, payload bytes, the " +
      "committing mutation kind (append/snapshot/delete/update/" +
      "constraints), and the tag names pinning it — the retention " +
      "audit view",
    Seq(in("path", StringType)), historySchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] =
      toInternal(historySchema, TableManifest.history(spark, str(a, 0))
        .orderBy("version").collect().toIndexedSeq)
  }

  /** SET clause text → assignments: `a = expr1, b = expr2` split on
    * TOP-LEVEL commas only (commas inside parens/quotes belong to the
    * expression — `greatest(a, b)`, `'x,y'`). Inside a string literal a
    * backslash-prefixed character (Spark's default
    * `escapedStringLiterals=false` syntax: `'it\'s'`) and a DOUBLED
    * closing quote (`'it''s'`, the ANSI escape) are part of the literal
    * — without this, the escaped apostrophe closed the quote early and
    * a comma later in the same literal split the clause into a
    * malformed second assignment. Backticked identifiers escape only by
    * doubling (no backslash syntax), matching the parser. */
  private[sources] def parseSet(set: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < set.length) {
      val ch = set.charAt(i)
      if (quote != 0) {
        sb += ch
        if (ch == '\\' && quote != '`' && i + 1 < set.length) {
          sb += set.charAt(i + 1); i += 1 // escaped char stays literal
        } else if (ch == quote) {
          if (i + 1 < set.length && set.charAt(i + 1) == quote) {
            sb += quote; i += 1 // doubled quote: still inside the literal
          } else quote = 0
        }
      } else ch match {
        case '\'' | '"' | '`' => quote = ch; sb += ch
        case '(' => depth += 1; sb += ch
        case ')' => depth -= 1; sb += ch
        case ',' if depth == 0 => parts += sb.result(); sb.clear()
        case c => sb += c
      }
      i += 1
    }
    if (sb.nonEmpty) parts += sb.result()
    parts.toSeq.map(_.trim).filter(_.nonEmpty).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"malformed SET assignment '$a' — want col = expr")
      (a.take(i).trim.stripPrefix("`").stripSuffix("`"),
        a.drop(i + 1).trim)
    }
  }

  private val update = new P("update",
    "UPDATE ... SET ... WHERE as one atomic merge-on-read commit: " +
      "matched rows re-written with the assignments applied, old rows " +
      "tombstoned, one marker — match-proportional, never a table " +
      "rewrite; returns the committed version and rows updated",
    Seq(in("path", StringType), in("set", StringType),
      inD("where", StringType, "'true'")),
    new StructType().add("version", LongType, nullable = false)
      .add("rows_updated", LongType, nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val before = TableManifest.versions(spark, p).last
      // merged schema: SET on a late-added column reaches null-padded
      // legacy batches, like the analyzer-route UPDATE
      val v = TableManifest.updateWhere(spark, p, str(a, 2),
        parseSet(str(a, 1)),
        Some(GraftTableSource.tableSchema(spark, p, None,
          mergeSchema = true)))
      val n = if (v == before) 0L // no-match: nothing committed
        else TableManifest.updatedRowCount(spark, p, v)
      Seq(InternalRow(v, n))
    }
  }

  private val constraintsSchema = new StructType()
    .add("name", StringType).add("sql", StringType)
    .add("enforced", BooleanType).add("rely", BooleanType)
    .add("status", StringType).add("kind", StringType)

  private val constraints = new P("constraints",
    "the table's constraints (name, predicate SQL, enforced, rely, " +
      "validation status, kind = check | notnull:<col>) — the DESCRIBE " +
      "view for a surface the table object cannot report (see " +
      "GraftTable's constraints note); pass a version to see the " +
      "constraints of a pinned era",
    Seq(in("path", StringType), inD("version", LongType, "-1")),
    constraintsSchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val v = a.getLong(1)
      TableManifest.constraintsOf(spark, str(a, 0),
          if (v < 0) None else Some(v))
        .map(c => InternalRow(UTF8String.fromString(c.name),
          UTF8String.fromString(c.sql), c.enforced, c.rely,
          UTF8String.fromString(c.status),
          UTF8String.fromString(c.kind)))
    }
  }

  private val tagSchema = new StructType()
    .add("name", StringType, nullable = false)
    .add("version", LongType, nullable = false)

  private val tagP = new P("tag",
    "pin a name to a version (default: current) — O(1) metadata, " +
      "readable as VERSION AS OF '<name>', protected from vacuum " +
      "until untagged; re-tagging moves the name",
    Seq(in("path", StringType), in("name", StringType),
      inD("version", LongType, "-1")), tagSchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val v = a.getLong(2)
      val pinned = TableManifest.tag(spark, str(a, 0), str(a, 1),
        if (v < 0) None else Some(v))
      Seq(InternalRow(UTF8String.fromString(str(a, 1)), pinned))
    }
  }

  private val untagP = new P("untag",
    "remove a tag; the version it pinned becomes reclaimable by the " +
      "next vacuum",
    Seq(in("path", StringType), in("name", StringType)),
    new StructType().add("removed", BooleanType, nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] =
      Seq(InternalRow(
        TableManifest.untag(spark, str(a, 0), str(a, 1))))
  }

  private val tagsP = new P("tags",
    "all tags of a table, name-sorted",
    Seq(in("path", StringType)), tagSchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] =
      TableManifest.tags(spark, str(a, 0)).map { case (n, v) =>
        InternalRow(UTF8String.fromString(n), v) }
  }

  private val restore = new P("restore",
    "make the table's next version serve an older version's content " +
      "(by number or tag) — a forward commit, history never rewritten; " +
      "cost is one snapshot write of the restored content",
    Seq(in("path", StringType), in("to", StringType)),
    new StructType().add("version", LongType, nullable = false)
      .add("restored_from", LongType, nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val to = str(a, 1)
      val from = to.toLongOption
        .orElse(TableManifest.tagVersion(spark, p, to))
        .getOrElse(throw new IllegalArgumentException(
          s"'$to' is neither a committed version number nor a tag of " +
            s"$p (tags: ${TableManifest.tags(spark, p)
              .map(_._1).mkString(", ")})"))
      Seq(InternalRow(TableManifest.restore(spark, p, from), from))
    }
  }

  private val detailSchema = new StructType()
    .add("version", LongType, nullable = false)
    .add("payload_bytes", LongType)
    .add("batch_dirs", IntegerType, nullable = false)
    .add("pending_tombstones", IntegerType, nullable = false)
    .add("constraints", IntegerType, nullable = false)
    .add("renamed_or_dropped_columns", IntegerType, nullable = false)
    .add("tags", StringType, nullable = false)
    .add("retained_versions", IntegerType, nullable = false)
    .add("checkpoint_head", LongType)
    .add("commit_store", StringType, nullable = false)

  private val detail = new P("detail",
    "one-row operational summary (DESCRIBE DETAIL): current version, " +
      "payload bytes, batch-partition count (the append-log depth " +
      "maintain folds), pending MoR tombstones (the read-tax the depth " +
      "guard pages about), constraint count, live renamed/dropped " +
      "column mappings (stats-pruned reads bypass until a fold clears " +
      "them), tags, and retained version count",
    Seq(in("path", StringType)), detailSchema) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val versions = TableManifest.versions(spark, p)
      require(versions.nonEmpty, s"no committed table at $p")
      val hp = new org.apache.hadoop.fs.Path(p)
      val f = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val payloads = f.listStatus(hp).map(_.getPath.getName)
        .flatMap(n => if (n.startsWith("data_v"))
          n.stripPrefix("data_v").toLongOption else None)
      val batchDirs =
        if (payloads.isEmpty) 0
        else f.listStatus(new org.apache.hadoop.fs.Path(
            s"$p/data_v${payloads.max}"))
          .count(_.getPath.getName.startsWith("__batch="))
      // protocol observability: the manifest checkpoint head (NULL =
      // never checkpointed — reads pay the listing path) and the
      // commit store governing this path's claims
      val ckptHead = f.listStatus(
          new org.apache.hadoop.fs.Path(s"$p/manifest"))
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("ckpt_v") &&
            n.stripPrefix("ckpt_v").forall(_.isDigit) =>
          n.stripPrefix("ckpt_v").toLong }
        .sorted.lastOption
      val store = graft.operators.CommitStore.of(f,
        new org.apache.hadoop.fs.Path(s"$p/manifest")).name
      Seq(InternalRow(versions.last,
        TableManifest.payloadBytes(spark, p).map(Long.box).orNull,
        batchDirs,
        TableManifest.pendingDeletes(spark, p),
        TableManifest.constraintsOf(spark, p).size,
        TableManifest.columnMapOf(spark, p).size,
        UTF8String.fromString(TableManifest.tags(spark, p)
          .map { case (n, v) => s"$n=$v" }.mkString(",")),
        versions.size,
        ckptHead.map(Long.box).orNull,
        UTF8String.fromString(store)))
    }
  }

  private val checkpointP = new P("checkpoint",
    "write the manifest-log checkpoint at the current head (normally " +
      "amortized: every spark.graft.manifest.checkpointInterval-th " +
      "commit writes one, and maintain refreshes it) — reads then " +
      "resolve every marker body from ONE file instead of per-marker " +
      "opens; returns the checkpointed head version",
    Seq(in("path", StringType)),
    new StructType().add("checkpointed_version", LongType,
      nullable = false)) {
    override protected def run(a: InternalRow): Seq[InternalRow] = {
      val p = str(a, 0)
      val head = TableManifest.checkpointManifest(spark, p)
        .getOrElse(throw new IllegalArgumentException(
          s"no committed table at $p"))
      Seq(InternalRow(head))
    }
  }

  val all: Map[String, UnboundProcedure] = Seq(
    optimize, vacuum, maintain, history, update, constraints,
    tagP, untagP, tagsP, restore, detail, checkpointP)
    .map(p => p.name() -> p).toMap

  def identifiers: Array[Identifier] =
    all.keys.toArray.sorted.map(Identifier.of(Array.empty[String], _))
}
