package graft.sources

import java.util.OptionalLong

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TableManifest

/** `format("graft")` — the [[TableManifest]] lakehouse layer as a
  * first-class Spark data source, so the table protocol (one-marker
  * atomic commits, VERSION AS OF, MoR deletes, zone maps, Bloom point
  * pruning) is reachable from plain SQL and the DataFrame reader/writer,
  * not only the library API:
  *
  *   spark.read.format("graft").load(path)                    — current version
  *   spark.read.format("graft").option("versionAsOf", 3).load(path)
  *   df.write.format("graft").mode("append"/"overwrite").save(path)
  *   CREATE TABLE t USING graft OPTIONS (path '...');  INSERT INTO t ...
  *   CREATE TEMPORARY VIEW v USING graft OPTIONS (path '...')
  *
  * Architecture: a DataSource V2 [[TableProvider]] whose scan implements
  * the [[V1Scan]] bridge (the pattern Spark's own JDBC v2 connector
  * uses) — pushdown and statistics live in the v2 planning surface,
  * execution delegates to the TableManifest read paths, which already
  * carry the scale machinery. What the planner gets:
  *
  *  - FILTER PUSHDOWN ([[SupportsPushDownFilters]]): every convertible
  *    filter is evaluated by the source (it lands in the inner parquet
  *    scan's codegen, and `PushedFilters` shows in explain); conjunctive
  *    range/equality bounds on integral columns route the scan through
  *    [[TableManifest.readRange]] — zone-map pruning decides the batch
  *    dirs BEFORE any file listing — and point predicates on
  *    Bloom-covered columns route through [[TableManifest.readPoint]]/
  *    [[readPointString]]. Pruning is a necessary-condition filter only:
  *    the exact predicate is always re-applied, so connector results are
  *    identical to read-then-filter by construction.
  *  - COLUMN PRUNING ([[SupportsPushDownRequiredColumns]]): the required
  *    schema becomes a projection on the inner read, reaching the
  *    parquet scan's ReadSchema.
  *  - STATISTICS ([[SupportsReportStatistics]]): sizeInBytes from one
  *    payload content-summary RPC and rowCount from the zone-stats
  *    artifact when provable ([[TableManifest.metaRowCount]] — never a
  *    planning-time scan), so Catalyst sizes joins over graft tables
  *    correctly and broadcasts small ones.
  *  - WRITES: v2 append/truncate bridge to [[V1Write]] —
  *    `INSERT INTO` appends a `__batch` partition (multi-writer-safe
  *    claim), `INSERT OVERWRITE`/mode("overwrite") commits a snapshot;
  *    both one-marker atomic. A first append into a fresh path
  *    bootstraps via commitSnapshot.
  *
  * The v1 [[RelationProvider]] surface is also implemented so
  * `CREATE TEMPORARY VIEW ... USING graft` (which resolves through the
  * v1 path) works; it shares the same planner, pushdown included.
  */
object GraftTableSource {

  /** Pruning route the most recent scan planning chose — observable
    * proof for specs that pushdown reached the manifest layer (the
    * [[SyntheticSource.lastPlannedPartitions]] pattern). */
  val lastPruning = new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Schema inference memoized per (path, committed version): footer
    * inference walks the payload listing — O(#batches) per call, ~0.7 s
    * at 256 batches measured (`Stress connector`) — so pay it once per
    * table VERSION, not per query. The version key makes the cache
    * evolution-correct by construction: an append or replacement that
    * changed the schema lands under a new version and re-infers; a
    * catalog/user schema bypasses this entirely (the production shape). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), StructType]

  private[sources] def tableSchema(spark: SparkSession, path: String,
      versionAsOf: Option[Long], mergeSchema: Boolean = false): StructType = {
    val v = versionAsOf.getOrElse(TableManifest.versions(spark, path).last)
    // bounded: a long-lived session over many short-lived tables must
    // not grow the cache forever (entries are tiny; the bound is
    // generous and a clear just re-infers)
    if (schemaCache.size > 4096) schemaCache.clear()
    val key = (if (mergeSchema) path + "\u0000merged" else path, v)
    schemaCache.computeIfAbsent(key,
      _ => TableManifest.readAt(spark, path, v, mergeSchema = mergeSchema)
        .schema)
  }

  /** Drop every cached schema for `path` — DROP TABLE (and REPLACE
    * TABLE, which is drop + create on a non-staging catalog) restarts
    * the version numbering at the same path, so the (path, version) key
    * of the OLD table collides with the new table's and would serve the
    * pre-drop schema forever. [[GraftCatalog.dropTable]] calls this. */
  private[sources] def invalidateSchema(path: String): Unit = {
    val it = schemaCache.keySet.iterator
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == path || k._1 == path + "\u0000merged") it.remove()
    }
  }

  /** option("mergeSchema", "true") — evolved tables read under the UNION
    * of their batch schemas. Resolved at the entry points into an
    * EXPLICIT schema (the manifest's documented evolved-read contract:
    * absent columns null-pad), so every downstream path — pruned reads
    * included — serves the merged shape. */
  private[sources] def mergeOf(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("mergeSchema")).exists(_.toBoolean)

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft source requires a path (load(path) or OPTIONS (path '...'))")
    p
  }

  /** option("versionAsOf", ...) — a version NUMBER or a named TAG
    * ([[TableManifest.tag]]), the same resolution the catalog's
    * `VERSION AS OF` gives SQL. Tag resolution needs the table path,
    * so every call site passes it. */
  private[sources] def versionOf(options: CaseInsensitiveStringMap,
      path: String): Option[Long] =
    Option(options.get("versionAsOf")).map(resolveRef(_, path,
      "versionAsOf"))

  private def resolveRef(v: String, path: String, what: String): Long =
    v.toLongOption
      .orElse(TableManifest.tagVersion(SparkSession.active, path, v))
      .getOrElse(throw new IllegalArgumentException(
        s"$what '$v' is neither a committed version number " +
          s"nor a tag of $path (tags: ${TableManifest
            .tags(SparkSession.active, path).map(_._1)
            .mkString(", ")})"))

  /** option("readChangeFeed", "true") — the SQL/DataFrame surface of
    * [[TableManifest.readChanges]]: the version-window change feed
    * (`_change_type` ∈ insert|delete) a downstream consumer reads
    * instead of re-scanning the table. `startingVersion` is required
    * (a number or a named tag — the consumer's last-processed
    * checkpoint); `endingVersion` defaults to the current version.
    * Reachable from plain SQL via
    * `CREATE TEMPORARY VIEW ... USING graft OPTIONS (path ...,
    * readChangeFeed 'true', startingVersion '3')`. */
  private[sources] def cdfOf(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("readChangeFeed")).exists(_.toBoolean)

  /** option("rawPairs", "true") — serve every physical delete/insert
    * pair UNCANCELLED (the churn-audit contract): by default the feed
    * is a CONTENT DELTA and byte-identical pairs cancel (a MoR MERGE's
    * key-group pass-through rows, an UPDATE writing its existing
    * value); consumers counting touched rows opt into the raw view. */
  private[sources] def rawPairsOf(
      options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("rawPairs")).exists(_.toBoolean)

  private[sources] def cdfRange(options: CaseInsensitiveStringMap,
      path: String): (Long, Long) = {
    val spark = SparkSession.active
    // timestamp-addressed window bounds resolve to versions via marker
    // commit times (the TIMESTAMP AS OF convention — epoch millis or a
    // 'yyyy-MM-dd HH:mm:ss' wall-clock string): the start is the
    // newest version committed AT-OR-BEFORE the instant, so the feed
    // carries everything after it
    def tsVersion(v: String, what: String): Long = {
      val millis = v.toLongOption.getOrElse(
        java.sql.Timestamp.valueOf(v).getTime)
      TableManifest.versionAtTime(spark, path, millis).getOrElse(
        throw new IllegalArgumentException(
          s"$what '$v' predates every retained commit of $path — " +
            "pin an exact version with startingVersion instead"))
    }
    val from = Option(options.get("startingVersion"))
      .map(resolveRef(_, path, "startingVersion"))
      .orElse(Option(options.get("startingTimestamp"))
        .map(tsVersion(_, "startingTimestamp")))
      .getOrElse(throw new IllegalArgumentException(
        "readChangeFeed requires startingVersion (a committed version " +
          "number or tag) or startingTimestamp — the consumer's " +
          "last-processed checkpoint"))
    val to = Option(options.get("endingVersion"))
      .map(resolveRef(_, path, "endingVersion"))
      .orElse(Option(options.get("endingTimestamp"))
        .map(tsVersion(_, "endingTimestamp")))
      .getOrElse(TableManifest.versions(spark, path).last)
    (from, to)
  }

  /** The change feed as a DataFrame — table columns (merged schema at
    * the window's end) + `_change_type`, straight off
    * [[TableManifest.readChanges]] (same-payload windows are
    * batch-listing-proportional, replacement windows an honest content
    * diff). */
  private[sources] def cdfFrame(spark: SparkSession, path: String,
      from: Long, to: Long, rawPairs: Boolean = false): DataFrame =
    TableManifest.readChanges(spark, path, from, to,
      Some(tableSchema(spark, path, Some(to), mergeSchema = true)),
      rawPairs = rawPairs)

  private[sources] def cdfSchema(spark: SparkSession, path: String,
      to: Long): StructType =
    tableSchema(spark, path, Some(to), mergeSchema = true)
      .add("_change_type", StringType)

  /** Append-or-bootstrap / overwrite — the one write shape every write
    * surface (v2 bridge, v1 insert, save modes) funnels through. The
    * table advertises ACCEPT_ANY_SCHEMA (the Delta pattern: the manifest
    * layer's schema-evolution read path null-pads evolved appends by
    * design), so alignment happens here: an append whose columns are the
    * table's as a SET is realigned by NAME; one whose names are FULLY
    * disjoint from the table's (the `INSERT ... VALUES` col1..colN
    * shape) realigns by POSITION; an equal-arity PARTIAL name overlap is
    * ambiguous — positional would silently cross-load renamed columns,
    * evolution would null-pad half the row — so it errors (the Delta
    * behavior) instead of coercing; a genuinely evolved schema
    * (different arity) passes through for the mergeSchema/null-pad read
    * path. */
  private[sources] def write(data: DataFrame, path: String,
      overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    if (overwrite || !TableManifest.exists(spark, path)) {
      TableManifest.commitSnapshot(data, path)
    } else {
      // align against the MERGED schema: on an evolved table the plain
      // read's schema is whichever batch footer parquet sampled — an
      // unstable target that could flip an append between by-name,
      // by-position, and accidental "evolution" run to run. The merged
      // schema is the one SQL serves (and is version-cached, so this
      // costs one lookup)
      val tgt = tableSchema(spark, path, None, mergeSchema = true)
      // name matching honors spark.sql.caseSensitive (default FALSE —
      // Spark analysis is case-insensitive): an equal-arity frame whose
      // names differ from the table's only by case must realign by
      // NAME, not fall through the empty case-sensitive overlap into
      // the positional branch (exactly the cross-load of reordered
      // columns the ambiguity guard refuses)
      val caseSensitive = spark.conf
        .getOption("spark.sql.caseSensitive").exists(_.toBoolean)
      def norm(n: String) =
        if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
      val dataNames = data.columns.map(norm).toSet
      val tgtNames = tgt.fieldNames.map(norm).toSet
      val overlap = dataNames.intersect(tgtNames)
      val aligned =
        if (dataNames == tgtNames)
          // by NAME (possibly reordered), coerced to the table's types —
          // a no-op cast folds away, a real one is the INSERT coercion
          // Spark's resolver would have added
          data.select(tgt.fields.map(f =>
            col(quote(f.name)).cast(f.dataType).as(f.name))
            .toIndexedSeq: _*)
        else if (data.columns.length == tgt.fields.length &&
            overlap.isEmpty)
          // by POSITION, only when NO name matches the table's (the
          // INSERT ... VALUES col1..colN shape): rename to the table's
          // columns, then coerce
          data.toDF(tgt.fieldNames.toIndexedSeq: _*)
            .select(tgt.fields.map(f =>
              col(quote(f.name)).cast(f.dataType).as(f.name))
              .toIndexedSeq: _*)
        else if (data.columns.length == tgt.fields.length)
          throw new IllegalArgumentException(
            s"ambiguous append into graft table $path: incoming columns " +
              s"(${data.columns.mkString(", ")}) partially overlap the " +
              s"table's (${tgt.fieldNames.mkString(", ")}) at equal " +
              "arity — positional realignment could cross-load renamed " +
              "columns. Rename the DataFrame columns to the table's " +
              "exactly, or change arity to evolve the schema explicitly")
        else data // true evolution: the mergeSchema/null-pad read path
      TableManifest.append(aligned, path)
    }
    ()
  }

  // ---- filter → Column (exact translation or not pushed at all) ----------

  private[sources] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(quote(a)) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(quote(a)) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(quote(a)) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(quote(a)) >= lit(v))
    case LessThan(a, v)           => Some(col(quote(a)) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(quote(a)) <= lit(v))
    case In(a, vs)                => Some(col(quote(a)).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(quote(a)).isNull)
    case IsNotNull(a)             => Some(col(quote(a)).isNotNull)
    case StringStartsWith(a, v)   => Some(col(quote(a)).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(quote(a)).endsWith(v))
    case StringContains(a, v)     => Some(col(quote(a)).contains(v))
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c)        => toColumn(c).map(!_)
    case _: AlwaysTrue  => Some(lit(true))
    case _: AlwaysFalse => Some(lit(false))
    case _              => None
  }

  /** The filter conjunction as predicate SQL — [[TableManifest.deleteWhere]]
    * stores predicate TEXT in the tombstone segment, so the SQL `DELETE`
    * surface renders its pushed filters back to SQL. Rendering is
    * conservative: a literal or node with no exact SQL form returns None
    * and the DELETE is refused at analysis — never under- or
    * over-deleted. */
  private[sources] def toPredicateSql(filters: Seq[Filter]): Option[String] =
    if (filters.isEmpty) Some("true")
    else {
      val parts = filters.map(predSql)
      if (parts.exists(_.isEmpty)) None
      else Some(parts.flatten.mkString(" AND "))
    }

  private def litSql(v: Any): Option[String] = v match {
    case null                    => Some("NULL")
    case s: String               => Some("'" + s.replace("'", "''") + "'")
    case b: Boolean              => Some(b.toString)
    case n: Byte                 => Some(n.toString)
    case n: Short                => Some(n.toString)
    case n: Int                  => Some(n.toString)
    case n: Long                 => Some(n.toString + "L")
    case f: Float                => Some(s"CAST('$f' AS FLOAT)")
    case d: Double               => Some(s"CAST('$d' AS DOUBLE)")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal           => Some(d.bigDecimal.toPlainString)
    case d: java.sql.Date        => Some(s"DATE '$d'")
    // timestamps render from EPOCH MICROS, never toString: a Timestamp's
    // toString is JVM-default-timezone wall clock, but the stored DELETE
    // predicate is re-parsed under spark.sql.session.timeZone — a zone
    // mismatch would shift which rows the tombstone masks, forever
    case t: java.sql.Timestamp   => Some(microsSql(t.toInstant))
    case d: java.time.LocalDate  => Some(s"DATE '$d'")
    case t: java.time.Instant    => Some(microsSql(t))
    case _                       => None
  }

  /** Instant → `timestamp_micros(<n>)` — zone-independent on both the
    * render and the re-parse side. */
  private def microsSql(i: java.time.Instant): String = {
    val micros = Math.addExact(
      Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    s"timestamp_micros(${micros}L)"
  }

  private def predSql(f: Filter): Option[String] = {
    def bin(a: String, op: String, v: Any): Option[String] =
      litSql(v).map(l => s"(${quote(a)} $op $l)")
    f match {
      case EqualTo(a, v)            => bin(a, "=", v)
      case EqualNullSafe(a, v)      => bin(a, "<=>", v)
      case GreaterThan(a, v)        => bin(a, ">", v)
      case GreaterThanOrEqual(a, v) => bin(a, ">=", v)
      case LessThan(a, v)           => bin(a, "<", v)
      case LessThanOrEqual(a, v)    => bin(a, "<=", v)
      case In(a, vs) if vs.nonEmpty =>
        val ls = vs.toSeq.map(litSql)
        if (ls.exists(_.isEmpty)) None
        else Some(s"(${quote(a)} IN (${ls.flatten.mkString(", ")}))")
      case IsNull(a)    => Some(s"(${quote(a)} IS NULL)")
      case IsNotNull(a) => Some(s"(${quote(a)} IS NOT NULL)")
      case StringStartsWith(a, v) =>
        litSql(v).map(l => s"startswith(${quote(a)}, $l)")
      case StringEndsWith(a, v) =>
        litSql(v).map(l => s"endswith(${quote(a)}, $l)")
      case StringContains(a, v) =>
        litSql(v).map(l => s"contains(${quote(a)}, $l)")
      case And(l, r) =>
        for { ls <- predSql(l); rs <- predSql(r) } yield s"($ls AND $rs)"
      case Or(l, r) =>
        for { ls <- predSql(l); rs <- predSql(r) } yield s"($ls OR $rs)"
      case Not(c)         => predSql(c).map(s => s"(NOT $s)")
      case _: AlwaysTrue  => Some("true")
      case _: AlwaysFalse => Some("false")
      case _              => None
    }
  }

  private def quote(a: String): String = s"`${a.replace("`", "``")}`"

  private[sources] def convertible(f: Filter): Boolean = toColumn(f).isDefined

  // ---- pruning-route derivation from the pushed conjuncts ----------------

  private def conjuncts(f: Filter): Seq[Filter] = f match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o         => Seq(o)
  }

  private def longOf(v: Any): Option[Long] = v match {
    case b: Byte  => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int   => Some(i.toLong)
    case l: Long  => Some(l)
    case _        => None
  }

  // saturating neighbors: an open bound at Long's edge must not wrap —
  // wrapping would prune batches the predicate matches
  private def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1L
  private def pred(v: Long): Long = if (v == Long.MinValue) v else v - 1L

  /** Conjunctive inclusive bounds on INTEGRAL columns — the
    * [[TableManifest.readRange]] input. Open bounds saturate to Long's
    * edges (readRange's predicate is necessary-only; the exact filter is
    * re-applied). Only integral columns: `col > v` on a double column has
    * no exact long bound. */
  private[sources] def zoneRanges(pushed: Seq[Filter],
      schema: StructType): Seq[(String, Long, Long)] = {
    val integral = schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(f.dataType) => f.name
    }.toSet
    val bounds = scala.collection.mutable.Map.empty[String, (Long, Long)]
    def tighten(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = bounds.getOrElse(c, (Long.MinValue, Long.MaxValue))
      bounds(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    pushed.flatMap(conjuncts).foreach {
      case EqualTo(a, v) if integral(a) =>
        longOf(v).foreach(l => tighten(a, l, l))
      case GreaterThan(a, v) if integral(a) =>
        longOf(v).foreach(l => tighten(a, succ(l), Long.MaxValue))
      case GreaterThanOrEqual(a, v) if integral(a) =>
        longOf(v).foreach(l => tighten(a, l, Long.MaxValue))
      case LessThan(a, v) if integral(a) =>
        longOf(v).foreach(l => tighten(a, Long.MinValue, pred(l)))
      case LessThanOrEqual(a, v) if integral(a) =>
        longOf(v).foreach(l => tighten(a, Long.MinValue, l))
      case In(a, vs) if integral(a) && vs.nonEmpty =>
        val ls = vs.flatMap(longOf)
        if (ls.length == vs.length) tighten(a, ls.min, ls.max)
      case _ => ()
    }
    bounds.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
      .filter { case (_, lo, hi) =>
        lo > Long.MinValue || hi < Long.MaxValue }
      .sortBy(_._1)
  }

  /** A Bloom-probeable point predicate: the first conjunct that pins one
    * column to a finite value set. */
  private[sources] def pointValues(pushed: Seq[Filter])
      : Option[(String, Seq[Any])] =
    pushed.flatMap(conjuncts).collectFirst {
      case EqualTo(a, v)           => (a, Seq(v))
      case In(a, vs) if vs.nonEmpty => (a, vs.toSeq)
    }

  /** The pruned, filtered, projected DataFrame behind every read surface.
    * Route choice: a Bloom-covered point predicate probes
    * readPoint/readPointString (sharpest for point lookups); otherwise
    * integral range bounds go through readRange (zone maps); otherwise
    * the plain manifest read. Every pushed filter is then re-applied
    * EXACTLY, and the projection lands on the inner plan so parquet
    * reads only the required columns. */
  def plan(spark: SparkSession, path: String,
      versionAsOf: Option[Long], userSchema: Option[StructType],
      pushed: Seq[Filter], required: Option[Seq[String]]): DataFrame = {
    val base = versionAsOf match {
      case Some(v) =>
        lastPruning.set("versionAsOf")
        TableManifest.readAt(spark, path, v, userSchema)
      case None =>
        val points = pointValues(pushed)
        val longPoint = points.collect {
          case (c, vs) if vs.forall(longOf(_).isDefined) =>
            (c, vs.map(longOf(_).get))
        }
        val stringPoint = points.collect {
          case (c, vs) if vs.forall(_.isInstanceOf[String]) =>
            (c, vs.map(_.asInstanceOf[String]))
        }
        lazy val bloom = TableManifest.hasBloomFilters(spark, path)
        lazy val ranges = zoneRanges(pushed,
          userSchema.getOrElse(tableSchema(spark, path, None)))
        if (longPoint.isDefined && bloom) {
          lastPruning.set(s"bloom-point:${longPoint.get._1}")
          TableManifest.readPoint(spark, path, longPoint.get._1,
            longPoint.get._2, userSchema)
        } else if (stringPoint.isDefined && bloom) {
          lastPruning.set(s"bloom-point:${stringPoint.get._1}")
          TableManifest.readPointString(spark, path, stringPoint.get._1,
            stringPoint.get._2, userSchema)
        } else if (ranges.nonEmpty) {
          lastPruning.set(ranges.map { case (c, lo, hi) =>
            s"zone-range:$c[$lo,$hi]" }.mkString(","))
          TableManifest.readRange(spark, path, ranges, userSchema)
        } else {
          lastPruning.set("none")
          TableManifest.read(spark, path, userSchema)
        }
    }
    val filtered = pushed.flatMap(toColumn).foldLeft(base)(_.filter(_))
    required.fold(filtered)(cols =>
      filtered.select(cols.map(c => col(quote(c))): _*))
  }
}

class GraftTableSource extends TableProvider with DataSourceRegister
    with RelationProvider with SchemaRelationProvider
    with CreatableRelationProvider with GraftStreamSourceProvider {
  import GraftTableSource._

  override def shortName(): String = "graft"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val path = pathOf(options)
    // a FRESH path infers empty: the writer surfaces (whose getTable
    // flows through here with no user schema) must be able to bootstrap
    // a first commit; a read on the empty schema fails later with the
    // manifest's own "no committed table" error
    if (!TableManifest.exists(spark, path)) return new StructType()
    if (cdfOf(options))
      return cdfSchema(spark, path, cdfRange(options, path)._2)
    tableSchema(spark, path, versionOf(options, path), mergeOf(options))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = pathOf(opts)
    if (cdfOf(opts)) {
      val (from, to) = cdfRange(opts, path)
      new GraftCdfTable(path, from, to, rawPairsOf(opts))
    } else new GraftTable(path, versionOf(opts, path),
      Option(schema).filter(_.fields.nonEmpty))
  }

  // ---- v1 surface: CREATE TEMPORARY VIEW ... USING graft -----------------

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    relation(sqlContext, parameters, None)

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String], schema: StructType): BaseRelation =
    relation(sqlContext, parameters, Some(schema))

  /** v1 save-mode fallback (`.write.format("graft").mode(...)` for
    * ErrorIfExists/Ignore — Append and Overwrite take the v2 path). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      sys.error("graft source requires a path"))
    val present = TableManifest.exists(spark, path)
    mode match {
      case SaveMode.Overwrite => write(data, path, overwrite = true)
      case SaveMode.Append    => write(data, path, overwrite = false)
      case SaveMode.ErrorIfExists =>
        require(!present, s"graft table already exists at $path " +
          "(mode ErrorIfExists)")
        write(data, path, overwrite = true)
      case SaveMode.Ignore =>
        if (!present) write(data, path, overwrite = true)
    }
    relation(sqlContext, parameters, None)
  }

  private def relation(sqlContext: SQLContext,
      parameters: Map[String, String],
      schema: Option[StructType]): BaseRelation = {
    import scala.jdk.CollectionConverters._
    val opts = new CaseInsensitiveStringMap(parameters.asJava)
    val spark = sqlContext.sparkSession
    if (cdfOf(opts)) {
      val path = pathOf(opts)
      val (from, to) = cdfRange(opts, path)
      return GraftCdfRelation(path, from, to, rawPairsOf(opts))(spark)
    }
    val resolved = schema.orElse(
      if (mergeOf(opts) && TableManifest.exists(spark, pathOf(opts)))
        Some(tableSchema(spark, pathOf(opts), versionOf(opts, pathOf(opts)),
          mergeSchema = true))
      else None)
    GraftRelation(pathOf(opts), versionOf(opts, pathOf(opts)),
      resolved)(spark)
  }
}

/** The change feed as a DSv2 table —
  * `spark.read.format("graft").option("readChangeFeed", "true")
  * .option("startingVersion", v).load(path)`. Read-only by
  * construction (a feed is not a table to write into); filters/
  * projection are Spark's to evaluate on top — the feed itself is
  * already window-proportional. */
private[sources] class GraftCdfTable(path: String, from: Long, to: Long,
    rawPairs: Boolean = false)
    extends Table with SupportsRead {
  import GraftTableSource._

  override def name(): String = s"graft-cdf:$path@[$from,$to]"

  override def schema(): StructType =
    cdfSchema(SparkSession.active, path, to)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema()
        override def description(): String = name()
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T = {
          val rel = new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = readSchema()
            override def needConversion: Boolean = false
            override def buildScan(): RDD[Row] =
              cdfFrame(context.sparkSession, path, from, to, rawPairs)
                .queryExecution.toRdd.asInstanceOf[RDD[Row]]
          }
          rel.asInstanceOf[T]
        }
      }
    }
}

/** The change feed on the v1 surface — what
  * `CREATE TEMPORARY VIEW ... USING graft OPTIONS (path ...,
  * readChangeFeed 'true', startingVersion '<v-or-tag>')` resolves to,
  * making the feed reachable from PLAIN SQL. */
private[sources] case class GraftCdfRelation(path: String, from: Long,
    to: Long, rawPairs: Boolean = false)(
    @transient val sparkSession: SparkSession)
    extends BaseRelation with TableScan {
  import GraftTableSource._

  override def sqlContext: SQLContext = sparkSession.sqlContext

  override val schema: StructType = cdfSchema(sparkSession, path, to)

  override def needConversion: Boolean = false

  override def buildScan(): RDD[Row] =
    cdfFrame(sparkSession, path, from, to, rawPairs)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

private[sources] class GraftTable(path: String, versionAsOf: Option[Long],
    userSchema: Option[StructType]) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  import GraftTableSource._

  /** The manifest path — [[GraftUpdateRule]] routes a resolved SQL
    * UPDATE on this table into [[TableManifest.updateWhere]] here. */
  private[sources] def tablePath: String = path

  /** Non-empty when this relation serves a pinned VERSION AS OF read —
    * mutations through it must refuse. */
  private[sources] def pinnedVersion: Option[Long] = versionAsOf

  /** SQL `DELETE FROM` lands as the manifest's merge-on-read predicate
    * tombstone — one O(1) segment commit, match-count- and
    * table-size-independent (`Stress mordelete`), folded by maintain,
    * erased by vacuum. Only fully-translatable predicates are accepted
    * (canDeleteWhere), so a DELETE can never silently under- or
    * over-delete. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    versionAsOf.isEmpty && toPredicateSql(filters.toSeq).isDefined

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(versionAsOf.isEmpty, "cannot DELETE from a pinned version")
    val pred = toPredicateSql(filters.toSeq).getOrElse(
      sys.error("unsupported DELETE predicate reached deleteWhere — " +
        "canDeleteWhere should have refused it"))
    TableManifest.deleteWhere(SparkSession.active, path, pred)
    ()
  }

  override def name(): String = s"graft:$path"

  // NOTE on Table.constraints(): deliberately NOT overridden. Spark's
  // ResolveTableConstraints wraps EVERY reported Check (enforced or
  // not) in a CheckInvariant resolved against the WRITE QUERY's output
  // — which under ACCEPT_ANY_SCHEMA (the evolution/bootstrap write
  // contract) is still positional (`col1..colN` for INSERT VALUES) and
  // fails analysis. Enforcement instead lives ONE LAYER DOWN, in the
  // manifest's write funnels (TableManifest.enforceConstraints: append,
  // snapshot/merge/fold staging, UPDATE post-image) — gating EVERY
  // writer, SQL or direct API, AFTER alignment; the definitions are
  // served by `CALL graft.constraints(...)`.

  override def schema(): StructType = userSchema.getOrElse {
    val spark = SparkSession.active
    if (!TableManifest.exists(spark, path)) return new StructType()
    tableSchema(spark, path, versionAsOf)
  }

  // ACCEPT_ANY_SCHEMA: analysis-time output resolution is skipped (the
  // fresh-path bootstrap write has no table schema to resolve against,
  // and evolved appends are a manifest-layer FEATURE); the write path
  // itself realigns positional drift by name — see GraftTableSource.write
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path,
      versionOf(options, path).orElse(versionAsOf), userSchema, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path)
}

private[sources] class GraftScanBuilder(path: String,
    versionAsOf: Option[Long], userSchema: Option[StructType],
    fullSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import GraftTableSource._

  private var required: StructType = fullSchema
  private var pushed = Array.empty[Filter]

  /** Keep every filter we can translate EXACTLY; the remainder is
    * Spark's to evaluate. A kept filter is fully evaluated by the inner
    * plan (same null semantics, same codegen), so it is NOT returned as
    * residual. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(convertible)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** TOP-LEVEL pruning only: Spark may hand a NESTED-pruned schema
    * (`loc STRUCT<y>` when only `loc.y` is referenced), but the inner
    * plan serves full top-level columns and the v1 bridge's rows are
    * consumed POSITIONALLY against the declared schema — declaring the
    * pruned struct while serving the full one would silently read the
    * wrong field (loc.y coming back with loc.x's values). Widening
    * each required column back to its full definition keeps the
    * declared and served shapes identical; column-level pruning (the
    * scan-cost lever) is preserved. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = StructType(requiredSchema.fields.map(f =>
      fullSchema.fields.find(_.name.equalsIgnoreCase(f.name))
        .getOrElse(f)))

  override def build(): Scan =
    new GraftScan(path, versionAsOf, userSchema, required, pushed)
}

private[sources] class GraftScan(path: String, versionAsOf: Option[Long],
    userSchema: Option[StructType], required: StructType,
    pushed: Array[Filter]) extends V1Scan with SupportsReportStatistics {
  import GraftTableSource._

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft path=$path" +
      versionAsOf.map(v => s" versionAsOf=$v").getOrElse("") +
      s" pushed=[${pushed.mkString(", ")}]" +
      s" cols=${required.fieldNames.mkString(",")}"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val rel = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      // the inner plan's InternalRows pass through untranslated; each is
      // consumed (projected) before the iterator advances, the v1-bridge
      // contract Spark's own JDBC connector relies on
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        plan(context.sparkSession, path, versionAsOf, userSchema,
          pushed.toSeq, Some(required.fieldNames.toSeq))
          .queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }
    rel.asInstanceOf[T]
  }

  /** Planning-time stats from metadata only: one content-summary RPC for
    * bytes, the zone-stats artifact for the row count (exact or absent —
    * [[TableManifest.metaRowCount]] never scans). Rows are reported only
    * for an unfiltered current-version scan; a filtered scan's bytes are
    * an upper bound, which is the conservative direction for join
    * sizing. KNOWN SPARK LIMITATION: after pushdown the optimizer wraps
    * a [[V1Scan]] in `V1ScanWrapper`, which implements only `Scan` — so
    * `DataSourceV2ScanRelation.computeStats` (an instanceof check on
    * `SupportsReportStatistics`, verified against the 4.1.2 bytecode)
    * falls back to defaults on the v2 read path. These stats are still
    * implemented (they light up the moment the wrapper forwards them);
    * the surface that consumes metadata stats TODAY is the v1 relation —
    * [[GraftRelation.sizeInBytes]] feeds `LogicalRelation` stats, which
    * is what lets Catalyst broadcast a small graft table joined through
    * `CREATE TEMPORARY VIEW ... USING graft`. */
  override def estimateStatistics(): Statistics = {
    val spark = SparkSession.active
    val bytes: Option[Long] =
      if (versionAsOf.isEmpty) TableManifest.payloadBytes(spark, path)
      else None
    val rows: Option[Long] =
      if (pushed.isEmpty && versionAsOf.isEmpty)
        TableManifest.metaRowCount(spark, path)
      else None
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        bytes.map(OptionalLong.of).getOrElse(OptionalLong.empty)
      override def numRows(): OptionalLong =
        rows.map(OptionalLong.of).getOrElse(OptionalLong.empty)
    }
  }
}

private[sources] class GraftWriteBuilder(path: String)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
          GraftTableSource.write(data, path,
            overwrite || overwriteFlag)
      }
  }
}

/** The v1 relation behind `CREATE TEMPORARY VIEW ... USING graft` — same
  * planner, same pushdown; `unhandledFilters` tells Spark exactly which
  * predicates the scan fully evaluates (they show as PushedFilters in
  * explain and are not re-applied). */
private[sources] case class GraftRelation(path: String,
    versionAsOf: Option[Long], userSchema: Option[StructType])(
    @transient val sparkSession: SparkSession)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {
  import GraftTableSource._

  override def sqlContext: SQLContext = sparkSession.sqlContext

  override val schema: StructType = userSchema.getOrElse(
    tableSchema(sparkSession, path, versionAsOf))

  /** Metadata-derived table bytes (one content-summary RPC) —
    * `LogicalRelation` turns this into plan statistics, so a small graft
    * table on the v1 surface broadcasts without hints. */
  override def sizeInBytes: Long =
    TableManifest.payloadBytes(sparkSession, path)
      .getOrElse(super.sizeInBytes)

  override def needConversion: Boolean = false

  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters.filterNot(convertible)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    plan(sparkSession, path, versionAsOf, userSchema,
      filters.filter(convertible).toSeq, Some(requiredColumns.toSeq))
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]

  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    write(data, path, overwrite)
}
