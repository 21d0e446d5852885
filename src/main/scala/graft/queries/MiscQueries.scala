package graft.queries

import graft.{Q, Tables}
import graft.operators.Sketches
import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.functions._

/** Set operations, pivots, lateral explode, conditional aggregation, and
  * string functions — rounding out the relational surface beyond the
  * reference (SURVEY §2.8 notes the reference has none of these).
  */
object MiscQueries {

  val all: Seq[Q] = Seq(

    // ---- table-level time travel on the manifest layer --------------------
    // operators.TableManifest gives DATA tables the index layer's commit
    // protocol: a snapshot commit (v0, half the events), an append commit
    // (v1, the other half as a __batch partition + watermark), and a
    // snapshot REPLACEMENT (v2, the latest-per-user MERGE — the upsert
    // sink's shape). All three states are then read AT THE END, after
    // every mutation: the v0 pin must show only the first half (later
    // appends land above its watermark, later snapshots under higher
    // payload versions), v1 both halves, v2 the merged table — three
    // immutable VERSION AS OF states in one hash, each replayed in SQL.
    Q("q_table_time_travel",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_tt").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val v0 = TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0), path)
        val v1 = TableManifest.append(
          e.filter(col("event_id") % 2 === 1), path)
        val v2 = TableManifest.commitSnapshot(
          TableManifest.read(s, path)
            .groupBy(col("user_id"))
            .agg(max_by(struct(col("event_id"), col("ts"), col("value")),
              struct(col("ts"), col("event_id"))).as("__r"))
            .select(col("__r.event_id").as("event_id"), col("user_id"),
              col("__r.ts").as("ts"), col("__r.value").as("value")),
          path)
        def state(v: Long, name: String) =
          TableManifest.readAt(s, path, v)
            .groupBy(col("user_id"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(name))
        state(v0, "v0_snapshot")
          .unionByName(state(v1, "v1_appended"))
          .unionByName(state(v2, "v2_merged"))
          .select(col("stage"), col("user_id"), col("n"), col("sum_value"))
          .orderBy(col("stage"), col("user_id"))
      },
      Some("""WITH half0 AS (
             |  SELECT * FROM events WHERE event_id % 2 = 0),
             |merged AS (
             |  SELECT user_id, event_id, ts, value FROM (
             |    SELECT user_id, event_id, ts, value,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn
             |    FROM events) t WHERE rn = 1)
             |SELECT 'v0_snapshot' AS stage, user_id, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM half0 GROUP BY user_id
             |UNION ALL
             |SELECT 'v1_appended', user_id, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM events GROUP BY user_id
             |UNION ALL
             |SELECT 'v2_merged', user_id, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM merged GROUP BY user_id
             |ORDER BY stage, user_id""".stripMargin)),

    // ---- change data feed between table versions -------------------------
    // operators.TableManifest.readChanges — what incremental consumers
    // read instead of re-scanning the table. Two cost regimes in one
    // hash: the APPEND feed (same payload) serves exactly the __batch
    // partitions between the two watermarks — the scan is built from
    // those dirs alone, O(changed batches) at any table size, inserts
    // only; the REPLACEMENT feed (a commitSnapshot upsert: drops
    // event_id % 3 = 0, re-adds them with a rewritten event_type) is a
    // multiset content diff (exceptAll both ways), the honest O(table)
    // price of replacement commits without row-level logs. Applying
    // feed2 to v2 must reproduce v3 as a multiset — which is what the
    // SQL replay's EXCEPT ALL mirror proves.
    Q("q_table_cdf",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_cdf").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val maxId = e.agg(max(col("event_id"))).head().getLong(0)
        val (t1, t2) = (maxId / 3, 2 * maxId / 3)
        val v0 = TableManifest.commitSnapshot(
          e.filter(col("event_id") <= t1), path)
        TableManifest.append(
          e.filter(col("event_id") > t1 && col("event_id") <= t2), path)
        val v2 = TableManifest.append(e.filter(col("event_id") > t2), path)
        val v3 = TableManifest.commitSnapshot(
          e.filter(col("event_id") % 3 =!= 0)
            .unionByName(e.filter(col("event_id") % 3 === 0)
              .withColumn("event_type", lit("cdf_new"))), path)
        TableManifest.readChanges(s, path, v0, v2)
          .withColumn("stage", lit("append_feed"))
          .unionByName(TableManifest.readChanges(s, path, v2, v3)
            .withColumn("stage", lit("replace_feed")))
          .orderBy(col("stage"), col("_change_type"), col("event_id"),
            col("event_type"))
      },
      Some("""WITH e AS (SELECT event_id, event_type, value FROM events),
             |mx AS (SELECT max(event_id) AS m FROM e),
             |f1 AS (SELECT *, 'insert' AS _change_type FROM e, mx
             |       WHERE event_id > m // 3),
             |v2s AS (SELECT event_id, event_type, value FROM e),
             |v3s AS (SELECT event_id, event_type, value FROM e
             |        WHERE event_id % 3 <> 0
             |        UNION ALL
             |        SELECT event_id, 'cdf_new', value FROM e
             |        WHERE event_id % 3 = 0),
             |ins AS (SELECT *, 'insert' AS _change_type FROM
             |          (SELECT * FROM v3s EXCEPT ALL SELECT * FROM v2s) x),
             |del AS (SELECT *, 'delete' AS _change_type FROM
             |          (SELECT * FROM v2s EXCEPT ALL SELECT * FROM v3s) y)
             |SELECT 'append_feed' AS stage, event_id, event_type, value,
             |       _change_type
             |FROM f1
             |UNION ALL
             |SELECT 'replace_feed', event_id, event_type, value,
             |       _change_type FROM ins
             |UNION ALL
             |SELECT 'replace_feed', event_id, event_type, value,
             |       _change_type FROM del
             |ORDER BY stage, _change_type, event_id, event_type""".stripMargin)),

    // ---- table DML: DELETE WHERE + MERGE INTO as snapshot commits ---------
    // The named DML surface over the manifest (Delta's DELETE/MERGE):
    // deleteWhere republishes survivors atomically (null predicate rows
    // survive — SQL DELETE semantics); mergeInto gives matched keys to
    // the SOURCE unconditionally (WHEN MATCHED THEN UPDATE via a
    // source-priority tiebreak — even a source row "older" than the
    // current one wins, which a pure recency upsert would get wrong) and
    // inserts unmatched keys, one max_by aggregate, no window. Both
    // stages read AFTER both mutations through their pins, so the
    // delete-state pin must also prove immune to the later merge.
    Q("q_table_dml",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_dml").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e, path)
        val vDel = TableManifest.deleteWhere(s, path,
          "event_type = 'error' AND value > 0.5")
        // source: rewrites for surviving purchase rows (value zeroed,
        // marked) + brand-new rows under shifted ids
        val src = TableManifest.read(s, path)
          .filter(col("event_type") === "purchase")
          .withColumn("value", lit(0.0))
          .withColumn("event_type", lit("purchase_v2"))
          .unionByName(e.filter(col("event_id") % 997 === 0)
            .withColumn("event_id", col("event_id") + 5000000L))
        val vMerge = TableManifest.mergeInto(s, path, src,
          Seq("event_id"), Seq("event_type"))
        def agg(v: Long, tag: String) =
          TableManifest.readAt(s, path, v)
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(tag))
        agg(vDel, "deleted").unionByName(agg(vMerge, "merged"))
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH d AS (
             |  SELECT * FROM events
             |  WHERE NOT coalesce(event_type = 'error' AND value > 0.5,
             |                     false)),
             |src AS (
             |  SELECT event_id, user_id, 'purchase_v2' AS event_type,
             |         0.0 AS value
             |  FROM d WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT event_id + 5000000, user_id, event_type, value
             |  FROM events WHERE event_id % 997 = 0),
             |m AS (
             |  SELECT event_id, user_id, event_type, value FROM d
             |  WHERE event_id NOT IN (SELECT event_id FROM src)
             |  UNION ALL
             |  SELECT * FROM src),
             |a1 AS (SELECT 'deleted' AS stage, event_type,
             |         count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_value
             |       FROM d GROUP BY event_type),
             |a2 AS (SELECT 'merged', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM m GROUP BY event_type)
             |SELECT * FROM a1 UNION ALL SELECT * FROM a2
             |ORDER BY stage, event_type""".stripMargin)),

    // ---- merge-on-read UPDATE WHERE ----------------------------------------
    // TableManifest.updateWhere as one atomic commit: matched rows are
    // re-written ONCE with the SET expressions applied (each reading the
    // PRE-update row — event_type is both read and assigned, value mixes
    // in another column), a predicate tombstone masks the old rows, and
    // both flip visible in the same marker. The hash pins three states
    // at once, read AFTER the update: the pre-update version (immutable
    // — updates land in their own `__batch` keyspace above the pin), the
    // post-update table, and the CDF window rendering the update as
    // delete(old) + insert(new). The update spans a snapshot AND an
    // append batch, so the replacement covers both keyspaces. Scale:
    // cost is one scan + a write of the MATCHED rows + an O(1) segment —
    // never a table rewrite (SCALE.md `Stress morupdate`).
    Q("q_table_update",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_upd").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 2 === 0),
          path)
        TableManifest.append(e.filter(col("event_id") % 2 === 1), path)
        val v0 = TableManifest.versions(s, path).last
        val vu = TableManifest.updateWhere(s, path,
          "event_type = 'purchase' AND value < 0.5",
          Seq(
            "value" -> "greatest(value, 0.25) + CAST(user_id % 3 AS DOUBLE)",
            "event_type" -> "concat(event_type, '_u')"))
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(tag))
        val cdf = TableManifest.readChanges(s, path, v0, vu)
          .groupBy(col("_change_type"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("stage", concat(lit("cdf_"), col("_change_type")))
          .drop("_change_type")
        agg(TableManifest.readAt(s, path, v0), "pre_pin")
          .unionByName(agg(TableManifest.read(s, path), "post"))
          .unionByName(cdf)
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, event_type, value,
             |    coalesce(event_type = 'purchase' AND value < 0.5, false)
             |      AS m
             |  FROM events),
             |upd AS (
             |  SELECT event_id, user_id, event_type || '_u' AS event_type,
             |    greatest(value, 0.25) + CAST(user_id % 3 AS DOUBLE)
             |      AS value
             |  FROM p WHERE m),
             |post AS (
             |  SELECT event_id, user_id, event_type, value FROM p
             |  WHERE NOT m
             |  UNION ALL SELECT * FROM upd),
             |a0 AS (SELECT 'pre_pin' AS stage, event_type, count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_value
             |       FROM events GROUP BY event_type),
             |a1 AS (SELECT 'post', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM post GROUP BY event_type),
             |a2 AS (SELECT 'cdf_delete', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM p WHERE m GROUP BY event_type),
             |a3 AS (SELECT 'cdf_insert', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM upd GROUP BY event_type)
             |SELECT * FROM a0 UNION ALL SELECT * FROM a1
             |UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3
             |ORDER BY stage, event_type""".stripMargin)),

    // The same UPDATE through the SQL surface: `CALL graft.update` with
    // a SET clause whose top-level split must survive a comma inside a
    // function call (`greatest(value, 0.5)`) AND a comma inside a string
    // literal (`',v2'`) — the parseSet quote/paren tracking, driver-
    // gated. The procedure's rows_updated return rides in the hash too.
    Q("q_call_update",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_call_upd").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        TableManifest.commitSnapshot(e, path)
        val r = s.sql(s"CALL graft.update(path => '$path', " +
          "set => 'value = greatest(value, 0.5), " +
          "event_type = concat(event_type, \\',v2\\')', " +
          "where => 'value < 0.75')").head()
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type""".stripMargin)
          .withColumn("rows_updated", lit(r.getLong(1)))
          .orderBy(col("event_type"))
      },
      Some("""WITH p AS (
             |  SELECT event_type, value,
             |    coalesce(value < 0.75, false) AS m
             |  FROM events),
             |post AS (
             |  SELECT CASE WHEN m THEN event_type || ',v2'
             |              ELSE event_type END AS event_type,
             |         CASE WHEN m THEN greatest(value, 0.5)
             |              ELSE value END AS value
             |  FROM p)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  (SELECT count(*) FROM p WHERE m) AS rows_updated
             |FROM post GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- Bloom point lookups on a STRING key -------------------------------
    // readPointString over a type-partitioned landing (each batch holds
    // one event_type group — the layout a routed ingest produces): a
    // categorical probe `event_type IN (...)` prunes to the matching
    // groups' batches via per-batch string Blooms (putString /
    // mightContainString — the hashed representation matches the
    // refresh path by construction). Probing a present type, a pair
    // spanning two batches, and an ABSENT value (provably-empty read)
    // in one hash, all identical to the plain IN filter.
    Q("q_table_point_str",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_ps").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        TableManifest.commitSnapshot(
          e.filter(col("event_type").isin("click", "view")), path)
        TableManifest.append(
          e.filter(col("event_type").isin("error", "signup")), path)
        TableManifest.append(e.filter(col("event_type") === "purchase"),
          path)
        TableManifest.refreshBloomFilters(s, path, Seq("event_type"),
          expectedPerBatch = 100000L)
        def probe(vals: Seq[String], tag: String) =
          TableManifest.readPointString(s, path, "event_type", vals)
            .withColumn("stage", lit(tag))
        probe(Seq("purchase"), "one_type")
          .unionByName(probe(Seq("click", "signup"), "two_batches"))
          .unionByName(probe(Seq("nosuchtype"), "absent"))
          .orderBy(col("stage"), col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, event_type, value FROM events)
             |SELECT 'one_type' AS stage, * FROM e
             |WHERE event_type = 'purchase'
             |UNION ALL
             |SELECT 'two_batches', * FROM e
             |WHERE event_type IN ('click', 'signup')
             |UNION ALL
             |SELECT 'absent', * FROM e WHERE event_type = 'nosuchtype'
             |ORDER BY stage, event_id""".stripMargin)),

    // ---- metadata-only count from the stats artifact ----------------------
    // TableManifest.countRows — count(*) answered from the zone-stats
    // rows (O(#batches) catalog read, zero data files touched): the
    // Delta/Iceberg metadata-only trick, at 100 TB a catalog read vs a
    // full scan. Exactness is the contract: a batch the artifact does
    // not cover forces the real scan (stage 2 appends WITHOUT a stats
    // upsert — the fallback must count it, not silently report the
    // covered subtotal), and a refresh restores the metadata path.
    Q("q_table_metacount",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_mc").toString
        val e = Tables.events(s, dir).select(col("event_id"), col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 2 === 0),
          path)
        TableManifest.refreshZoneMaps(s, path, Seq("event_id"))
        val covered = TableManifest.countRows(s, path)
        TableManifest.append(e.filter(col("event_id") % 2 === 1), path)
        val uncovered = TableManifest.countRows(s, path) // fallback scan
        TableManifest.refreshZoneMaps(s, path, Seq("event_id"))
        val refreshed = TableManifest.countRows(s, path)
        s.sql(s"""SELECT 'covered' AS stage, ${covered}L AS n
                 |UNION ALL
                 |SELECT 'uncovered_append', ${uncovered}L
                 |UNION ALL
                 |SELECT 'refreshed', ${refreshed}L
                 |ORDER BY stage""".stripMargin)
      },
      Some("""SELECT 'covered' AS stage,
             |  (SELECT count(*) FROM events WHERE event_id % 2 = 0) AS n
             |UNION ALL
             |SELECT 'uncovered_append', (SELECT count(*) FROM events)
             |UNION ALL
             |SELECT 'refreshed', (SELECT count(*) FROM events)
             |ORDER BY stage""".stripMargin)),

    // ---- schema evolution through the manifest read path ------------------
    // A year of evolving ingest: the table starts narrow, later appends
    // carry a NEW column. One explicit read schema serves the whole
    // history (absent columns null-pad — the scale path, no footer
    // sweep); zone maps refreshed over the late-added column prove the
    // legacy batch away EXACTLY on a range probe (its bounds are null,
    // and null never matches a range), and the Bloom point probe
    // composes the same way (the legacy batch has no filter row for the
    // column — conservatively read, exact re-filter). Three stages in
    // one hash: the unified read (count(user_id) vs count(*) proves the
    // null-padding), the pruned range probe ≡ the plain filter, and a
    // point probe over the evolved column.
    Q("q_table_evolution",
      (s, dir) => {
        import graft.operators.TableManifest
        import org.apache.spark.sql.types._
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_evo").toString
        val e = Tables.events(s, dir)
        TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0)
            .select(col("event_id"), col("event_type"), col("value")), path)
        TableManifest.append(
          e.filter(col("event_id") % 2 === 1)
            .select(col("event_id"), col("event_type"), col("value"),
              col("user_id")), path)
        val full = new StructType().add("event_id", LongType)
          .add("event_type", StringType).add("value", DoubleType)
          .add("user_id", LongType)
        TableManifest.refreshZoneMaps(s, path, Seq("user_id"), Some(full))
        TableManifest.refreshBloomFilters(s, path, Seq("user_id"),
          expectedPerBatch = 100000L, schema = Some(full))
        def agg(d: org.apache.spark.sql.DataFrame, tag: String) =
          d.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_rows"),
              count(col("user_id")).as("n_evolved"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(tag))
        agg(TableManifest.read(s, path, Some(full)), "unified")
          .unionByName(agg(TableManifest.readRange(s, path,
            Seq(("user_id", 100L, 400L)), Some(full)), "range_probe"))
          .unionByName(agg(TableManifest.readPoint(s, path, "user_id",
            Seq(42L), Some(full)), "point_probe"))
          .select(col("stage"), col("event_type"), col("n_rows"),
            col("n_evolved"), col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH evo AS (
             |  SELECT event_id, event_type, value,
             |         CAST(NULL AS BIGINT) AS user_id
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT event_id, event_type, value, user_id
             |  FROM events WHERE event_id % 2 = 1),
             |u AS (SELECT 'unified' AS stage, event_type,
             |        count(*) AS n_rows, count(user_id) AS n_evolved,
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |          AS sum_value
             |      FROM evo GROUP BY event_type),
             |r AS (SELECT 'range_probe', event_type, count(*),
             |        count(user_id),
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      FROM evo WHERE user_id BETWEEN 100 AND 400
             |      GROUP BY event_type),
             |p AS (SELECT 'point_probe', event_type, count(*),
             |        count(user_id),
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      FROM evo WHERE user_id = 42
             |      GROUP BY event_type)
             |SELECT * FROM u UNION ALL SELECT * FROM r
             |UNION ALL SELECT * FROM p
             |ORDER BY stage, event_type""".stripMargin)),

    // Schema evolution × MoR UPDATE: SET on the LATE-ADDED column must
    // reach the legacy batches (whose parquet never heard of it — the
    // read path null-pads, the SET expression sees the null, the
    // replacement batch materializes the full schema), while rows
    // outside the predicate keep their null padding. Zone maps + Blooms
    // refreshed over the evolved column AFTER the update stay exact:
    // the range and point probes below must equal the plain filters —
    // legacy batches carry null bounds / no filter row (conservatively
    // read + re-filtered), the update-keyspace batch serves the rest.
    Q("q_table_evolution_update",
      (s, dir) => {
        import graft.operators.TableManifest
        import org.apache.spark.sql.types._
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_evoupd").toString
        val e = Tables.events(s, dir)
        TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0)
            .select(col("event_id"), col("event_type"), col("value")), path)
        TableManifest.append(
          e.filter(col("event_id") % 2 === 1)
            .select(col("event_id"), col("event_type"), col("value"),
              col("user_id")), path)
        val full = new StructType().add("event_id", LongType)
          .add("event_type", StringType).add("value", DoubleType)
          .add("user_id", LongType)
        TableManifest.updateWhere(s, path, "event_id % 3 = 0",
          Seq("user_id" -> "coalesce(user_id, -1) + 1000000"), Some(full))
        TableManifest.refreshZoneMaps(s, path, Seq("user_id"), Some(full))
        TableManifest.refreshBloomFilters(s, path, Seq("user_id"),
          expectedPerBatch = 100000L, schema = Some(full))
        def agg(d: org.apache.spark.sql.DataFrame, tag: String) =
          d.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_rows"),
              count(col("user_id")).as("n_evolved"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(tag))
        agg(TableManifest.read(s, path, Some(full)), "unified")
          .unionByName(agg(TableManifest.readRange(s, path,
            Seq(("user_id", 999000L, 1100000L)), Some(full)),
            "range_probe"))
          .unionByName(agg(TableManifest.readPoint(s, path, "user_id",
            Seq(999999L), Some(full)), "point_probe"))
          .select(col("stage"), col("event_type"), col("n_rows"),
            col("n_evolved"), col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH evo AS (
             |  SELECT event_id, event_type, value,
             |         CAST(NULL AS BIGINT) AS user_id
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT event_id, event_type, value, user_id
             |  FROM events WHERE event_id % 2 = 1),
             |upd AS (
             |  SELECT event_id, event_type, value,
             |    CASE WHEN event_id % 3 = 0
             |         THEN coalesce(user_id, -1) + 1000000
             |         ELSE user_id END AS user_id
             |  FROM evo),
             |u AS (SELECT 'unified' AS stage, event_type,
             |        count(*) AS n_rows, count(user_id) AS n_evolved,
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |          AS sum_value
             |      FROM upd GROUP BY event_type),
             |r AS (SELECT 'range_probe', event_type, count(*),
             |        count(user_id),
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      FROM upd WHERE user_id BETWEEN 999000 AND 1100000
             |      GROUP BY event_type),
             |p AS (SELECT 'point_probe', event_type, count(*),
             |        count(user_id),
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      FROM upd WHERE user_id = 999999
             |      GROUP BY event_type)
             |SELECT * FROM u UNION ALL SELECT * FROM r
             |UNION ALL SELECT * FROM p
             |ORDER BY stage, event_type""".stripMargin)),

    // ---- data-quality expectation suite (Deequ-shaped gate) --------------
    // operators.Expectations: a declarative constraint suite whose
    // row-level checks ALL fold in one aggregate pass (violation counts,
    // map-side combinable — at 100 TB the audit is one scan, not one per
    // check), plus one aggregate per uniqueness key and one anti-join
    // per referential check. Checks are chosen to exercise both verdicts
    // — passing constraints AND a failing range constraint plus a
    // deliberately-broken FK (lineitem joined against a customer-keyed
    // "parent" it does not reference) — because a gate that can only say
    // yes proves nothing. Null semantics pinned: a null comparison is a
    // violation, an FK pointing nowhere is a violation.
    Q("q_expectations",
      (s, dir) => {
        import graft.operators.Expectations
        val o = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        val c = Tables.customer(s, dir)
        Expectations.rowChecks(o, Seq(
            "orders_price_positive" -> (col("o_totalprice") > 0),
            "orders_status_domain" ->
              col("o_orderstatus").isin("O", "F", "P"),
            "orders_price_under_100k" -> (col("o_totalprice") < 100000.0),
            "orders_date_present" -> col("o_orderdate").isNotNull))
          .unionByName(Expectations.uniqueness(o, Seq("o_orderkey"),
            "orders_key_unique"))
          .unionByName(Expectations.uniqueness(li,
            Seq("l_orderkey", "l_linenumber"), "lineitem_line_unique"))
          .unionByName(Expectations.referential(o, "o_custkey", c,
            "c_custkey", "orders_fk_customer"))
          .unionByName(Expectations.referential(li, "l_orderkey", o,
            "o_orderkey", "lineitem_fk_orders"))
          .unionByName(Expectations.referential(li, "l_suppkey", c,
            "c_custkey", "lineitem_fk_broken"))
          .orderBy(col("check_name"))
      },
      Some("""WITH rc AS (
             |  SELECT 'orders_price_positive' AS check_name,
             |    sum(CASE WHEN coalesce(o_totalprice > 0, false)
             |        THEN 0 ELSE 1 END) AS violations FROM orders
             |  UNION ALL
             |  SELECT 'orders_status_domain',
             |    sum(CASE WHEN coalesce(o_orderstatus IN ('O','F','P'),
             |        false) THEN 0 ELSE 1 END) FROM orders
             |  UNION ALL
             |  SELECT 'orders_price_under_100k',
             |    sum(CASE WHEN coalesce(o_totalprice < 100000, false)
             |        THEN 0 ELSE 1 END) FROM orders
             |  UNION ALL
             |  SELECT 'orders_date_present',
             |    sum(CASE WHEN o_orderdate IS NOT NULL THEN 0 ELSE 1 END)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'orders_key_unique', coalesce((
             |    SELECT sum(k) FROM (SELECT count(*) AS k FROM orders
             |      GROUP BY o_orderkey HAVING count(*) > 1) t), 0)
             |  UNION ALL
             |  SELECT 'lineitem_line_unique', coalesce((
             |    SELECT sum(k) FROM (SELECT count(*) AS k FROM lineitem
             |      GROUP BY l_orderkey, l_linenumber
             |      HAVING count(*) > 1) t), 0)
             |  UNION ALL
             |  SELECT 'orders_fk_customer', (
             |    SELECT count(*) FROM orders WHERE o_custkey NOT IN
             |      (SELECT c_custkey FROM customer WHERE c_custkey
             |       IS NOT NULL) OR o_custkey IS NULL)
             |  UNION ALL
             |  SELECT 'lineitem_fk_orders', (
             |    SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
             |      (SELECT o_orderkey FROM orders WHERE o_orderkey
             |       IS NOT NULL) OR l_orderkey IS NULL)
             |  UNION ALL
             |  SELECT 'lineitem_fk_broken', (
             |    SELECT count(*) FROM lineitem WHERE l_suppkey NOT IN
             |      (SELECT c_custkey FROM customer WHERE c_custkey
             |       IS NOT NULL) OR l_suppkey IS NULL))
             |SELECT check_name, CAST(violations AS BIGINT) AS violations,
             |       violations = 0 AS passed
             |FROM rc ORDER BY check_name""".stripMargin)),

    // ---- l-diversity audit (privacy governance) ---------------------------
    // The attribute-disclosure complement of q_k_anonymity (which counts
    // re-identifiable quasi-identifier combos): rows grouped by
    // their quasi-identifier tuple (lang, source) — k-anonymity requires
    // every group ≥ k (a small group re-identifies its members by the
    // QI alone), l-diversity requires ≥ l distinct sensitive values per
    // group (a k-large group whose sensitive attribute is constant still
    // leaks it). One map-side-combinable aggregate (count + distinct
    // sensitive per group); at 100 TB the audit output is
    // QI-cardinality-sized. Sensitive attribute here: the n_chars
    // length decile.
    Q("q_l_diversity",
      (s, dir) => {
        val k = 5L
        val l = 2L
        Tables.documents(s, dir)
          .select(col("lang"), col("source"),
            expr("n_chars DIV 100").as("len_decile"))
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("len_decile")).as("l_distinct"))
          .withColumn("k_anonymous", col("n") >= k)
          .withColumn("l_diverse", col("l_distinct") >= l)
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS n,
             |  count(DISTINCT n_chars // 100) AS l_distinct,
             |  count(*) >= 5 AS k_anonymous,
             |  count(DISTINCT n_chars // 100) >= 2 AS l_diverse
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // ---- Bloom-pruned point lookups on the manifest layer -----------------
    // TableManifest.readPoint + per-batch Bloom filters: the point-lookup
    // complement of the zone maps. The table lands in batches keyed by
    // event_id % 3 — every batch's min-max spans the whole domain, so
    // zone maps prove NOTHING for a point probe, while each batch's
    // Bloom filter proves the two non-matching batches away (ZoneMapSpec
    // asserts the file-count drop; this oracle proves the pruned read is
    // EXACTLY the plain IN filter — membership is a necessary condition
    // with false positives, the exact predicate always re-applies).
    // Stage 2 appends an uncovered clone batch: the conservative
    // fall-through must still be exact; a refresh then re-covers it.
    Q("q_table_pointlookup",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_pt").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 3 === 0),
          path)
        TableManifest.append(e.filter(col("event_id") % 3 === 1), path)
        TableManifest.append(e.filter(col("event_id") % 3 === 2), path)
        TableManifest.refreshBloomFilters(s, path, Seq("event_id"),
          expectedPerBatch = 100000L)
        val probe1 = Seq(7L, 42L, 1001L, 2026L, 9998L)
        def point(vals: Seq[Long], tag: String) =
          TableManifest.readPoint(s, path, "event_id", vals)
            .withColumn("stage", lit(tag))
        val bloomed = point(probe1, "bloomed").localCheckpoint(true)
        TableManifest.append(
          e.filter(col("event_id") % 7 === 0)
            .withColumn("event_id", col("event_id") + 10000000L), path)
        val probe2 = probe1 :+ 10000007L
        val uncovered = point(probe2, "uncovered_batch")
          .localCheckpoint(true)
        TableManifest.refreshBloomFilters(s, path, Seq("event_id"),
          expectedPerBatch = 100000L)
        bloomed.unionByName(uncovered)
          .unionByName(point(probe2, "re_bloomed"))
          .orderBy(col("stage"), col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type, value
             |           FROM events),
             |e2 AS (SELECT * FROM e
             |       UNION ALL
             |       SELECT event_id + 10000000, user_id, event_type, value
             |       FROM e WHERE event_id % 7 = 0),
             |p1 AS (SELECT * FROM e
             |       WHERE event_id IN (7, 42, 1001, 2026, 9998)),
             |p2 AS (SELECT * FROM e2
             |       WHERE event_id IN (7, 42, 1001, 2026, 9998, 10000007))
             |SELECT 'bloomed' AS stage, * FROM p1
             |UNION ALL
             |SELECT 'uncovered_batch', * FROM p2
             |UNION ALL
             |SELECT 're_bloomed', * FROM p2
             |ORDER BY stage, event_id""".stripMargin)),

    // ---- incremental view maintenance from the change feed ---------------
    // operators.IncrementalAgg over TableManifest.readChanges: a standing
    // (key, count, sum) view folds FORWARD with each feed — O(state +
    // changes) per step, never a re-aggregation of the base table (the
    // IVM payoff at 100 TB: the view is key-cardinality-sized, the fact
    // table is not). Sums carry as DECIMAL because incremental
    // maintenance REQUIRES exact arithmetic — a float state that adds
    // and later subtracts the same value drifts permanently. Two steps
    // in one hash: an append feed, then a replacement feed with deletes
    // AND value rewrites (delete+insert pairs that must net the value
    // difference); each maintained state must equal recomputation.
    Q("q_incremental_agg",
      (s, dir) => {
        import graft.operators.{IncrementalAgg, TableManifest}
        val path = java.nio.file.Files
          .createTempDirectory("graft_ivm").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val v0 = TableManifest.commitSnapshot(e, path)
        val state0 = IncrementalAgg.initialize(
          TableManifest.readAt(s, path, v0), Seq("event_type"), "value")
          .localCheckpoint(true)
        val v1 = TableManifest.append(
          e.filter(col("event_id") % 10 === 0)
            .withColumn("event_id", col("event_id") + 1000000L), path)
        val state1 = IncrementalAgg.maintain(state0,
          TableManifest.readChanges(s, path, v0, v1),
          Seq("event_type"), "value").localCheckpoint(true)
        val v2 = TableManifest.commitSnapshot(
          TableManifest.read(s, path)
            .filter(col("event_id") % 5 =!= 0)
            .withColumn("value",
              when(col("event_id") % 7 === 0, col("value") * 2)
                .otherwise(col("value"))), path)
        val state2 = IncrementalAgg.maintain(state1,
          TableManifest.readChanges(s, path, v1, v2),
          Seq("event_type"), "value").localCheckpoint(true)
        def shape(st: org.apache.spark.sql.DataFrame, tag: String) =
          st.select(col("event_type"), col("n"),
            col("sum_v").cast("double").as("sum_v"))
            .withColumn("stage", lit(tag))
        shape(state1, "after_append")
          .unionByName(shape(state2, "after_replace"))
          .select(col("stage"), col("event_type"), col("n"), col("sum_v"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH e AS (SELECT event_id, event_type, value FROM events),
             |v1 AS (SELECT * FROM e
             |       UNION ALL
             |       SELECT event_id + 1000000, event_type, value FROM e
             |       WHERE event_id % 10 = 0),
             |v2 AS (SELECT event_id, event_type,
             |         CASE WHEN event_id % 7 = 0 THEN value * 2
             |              ELSE value END AS value
             |       FROM v1 WHERE event_id % 5 <> 0),
             |a1 AS (SELECT event_type, count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             |           AS sum_v
             |       FROM v1 GROUP BY event_type),
             |a2 AS (SELECT event_type, count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             |           AS sum_v
             |       FROM v2 GROUP BY event_type)
             |SELECT 'after_append' AS stage, * FROM a1
             |UNION ALL
             |SELECT 'after_replace', * FROM a2
             |ORDER BY stage, event_type""".stripMargin)),

    // ---- OPTIMIZE: range / Z-order clustering as a snapshot commit -------
    // TableManifest.optimize — the Delta OPTIMIZE/CLUSTER BY surface:
    // rewrite the live table range-clustered (one column) or Z-ordered
    // (two, width_bucket ranks interleaved), each range partition landing
    // as its OWN __batch dir so readRange's zone maps prune at LISTING
    // level. Rows are unchanged as a multiset — that is the hash: the
    // same range probes answered identically in the shuffled layout,
    // after a 1-D optimize, and after a 2-D Z-order rewrite (the probes
    // run through readRange, so every stage exercises prune-then-refilter
    // on its own layout). Clustering EFFECTIVENESS (batch disjointness,
    // files touched) is spec/Stress-measured — content invariance is the
    // only thing a result can prove.
    Q("q_table_optimize",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_opt").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val maxId = e.agg(max(col("event_id"))).head().getLong(0)
        // a deliberately interleaved layout: round-robin by id
        TableManifest.commitSnapshot(e.repartition(8, col("event_id") % 8),
          path)
        TableManifest.refreshZoneMaps(s, path, Seq("event_id", "user_id"))
        def probe(tag: String) = TableManifest.readRange(s, path,
            Seq(("event_id", maxId / 4, maxId / 2)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("stage", lit(tag))
        val shuffled = probe("shuffled").localCheckpoint(true)
        TableManifest.optimize(s, path, Seq("event_id"), files = 8,
          statsCols = Seq("event_id", "user_id"))
        val ranged = probe("range_clustered").localCheckpoint(true)
        TableManifest.optimize(s, path, Seq("user_id", "event_id"),
          files = 8, statsCols = Seq("event_id", "user_id"))
        shuffled.unionByName(ranged)
          .unionByName(probe("zordered"))
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH mx AS (SELECT max(event_id) AS m FROM events),
             |p AS (SELECT event_type, count(*) AS n,
             |        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |          AS sum_value
             |      FROM events, mx
             |      WHERE event_id >= m // 4 AND event_id <= m // 2
             |      GROUP BY event_type)
             |SELECT 'shuffled' AS stage, * FROM p
             |UNION ALL
             |SELECT 'range_clustered', * FROM p
             |UNION ALL
             |SELECT 'zordered', * FROM p
             |ORDER BY stage, event_type""".stripMargin)),

    // ---- zone-map data skipping on the manifest layer -------------------
    // Per-batch min/max stats persisted beside the payload let a range
    // read prune `__batch` partition dirs at PLANNING time — at 100 TB an
    // append-log table is thousands of batch dirs and the listing/footer
    // RPCs are the query's floor cost before a byte is read (parquet
    // row-group stats only help after the file is open). The batches here
    // are event_id-disjoint thirds, so the probed quarter range proves
    // most of them away (ZoneMapSpec asserts the numFiles drop; this
    // oracle proves the pruned read returns EXACTLY the full-scan rows —
    // zone maps are a necessary-condition accelerator, never a filter).
    Q("q_table_zonemap",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_table_zm").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val maxId = e.agg(max(col("event_id"))).head().getLong(0)
        val (t1, t2) = (maxId / 3, 2 * maxId / 3)
        TableManifest.commitSnapshot(e.filter(col("event_id") <= t1), path)
        TableManifest.refreshZoneMaps(s, path, Seq("event_id"))
        TableManifest.append(
          e.filter(col("event_id") > t1 && col("event_id") <= t2),
          path, batchId = Some(0L))
        TableManifest.appendZoneMaps(s, path, 0L, Seq("event_id"))
        TableManifest.append(e.filter(col("event_id") > t2),
          path, batchId = Some(1L))
        TableManifest.appendZoneMaps(s, path, 1L, Seq("event_id"))
        TableManifest.readRange(s, path,
            Seq(("event_id", maxId / 4, maxId / 2)))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"),
            min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
          .orderBy(col("event_type"))
      },
      Some("""WITH b AS (
             |  SELECT max(event_id) // 4 AS lo, max(event_id) // 2 AS hi
             |  FROM events)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |  min(event_id) AS min_id, max(event_id) AS max_id
             |FROM events, b
             |WHERE event_id >= b.lo AND event_id <= b.hi
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- INTERSECT / EXCEPT over key sets -------------------------------
    Q("q_set_ops",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val buyers = e.filter(col("event_type") === "purchase")
          .select(col("user_id")).distinct()
        val errorers = e.filter(col("event_type") === "error")
          .select(col("user_id")).distinct()
        val both = buyers.intersect(errorers)
          .withColumn("set_kind", lit("both"))
        val buyOnly = buyers.except(errorers)
          .withColumn("set_kind", lit("purchase_only"))
        both.unionByName(buyOnly).orderBy(col("set_kind"), col("user_id"))
      },
      Some("""WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             |errs AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
             |SELECT user_id, 'both' AS set_kind FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errs) t
             |UNION ALL
             |SELECT user_id, 'purchase_only' AS set_kind FROM (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM errs) t
             |ORDER BY set_kind, user_id""".stripMargin)),

    // ---- pivot: per-user counts by event type (portable CASE form) ------
    Q("q_pivot_counts",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === types.head, 1)).as(s"n_${types.head}"),
            types.tail.map(t =>
              count(when(col("event_type") === t, 1)).as(s"n_$t")): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
             |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
             |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
             |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
             |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- unpivot/melt: the wide pivot back to long form -----------------
    // Dataset.unpivot is the Spark-native melt (one narrow projection per
    // value column, no shuffle beyond the source aggregate); DuckDB runs
    // the standard UNPIVOT clause over the identical wide CTE. count(*)
    // sums are cast BIGINT on the oracle side (HUGEINT→float64 trap).
    Q("q_unpivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(
            count(when(col("event_type") === types.head, 1)).as(types.head),
            types.tail.map(t =>
              count(when(col("event_type") === t, 1)).as(t)): _*)
        wide.unpivot(Array(col("user_id")), types.map(col).toArray,
            "metric", "n")
          .orderBy(col("user_id"), col("metric"))
      },
      Some("""WITH wide AS (
             |  SELECT user_id,
             |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |    CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             |    CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |    CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             |  FROM events GROUP BY user_id)
             |SELECT user_id, metric, n
             |FROM wide UNPIVOT (n FOR metric IN (click, error, purchase, signup, view))
             |ORDER BY user_id, metric""".stripMargin)),

    // ---- lateral explode: global token frequencies ----------------------
    Q("q_token_frequencies",
      (s, dir) => Tables.documents(s, dir)
        .select(explode(
          graft.functions.Text.unicodeTokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50),
      Some(s"""SELECT token, count(*) AS n
             |FROM (SELECT unnest(${graft.functions.Text.unicodeTokensSql("text")}) AS token FROM documents) t
             |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin)),

    // ---- conditional aggregation (FILTER clause semantics) --------------
    Q("q_conditional_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("value") > 250, 1)).as("n_big"),
          sum(when(col("value") > 250, col("value").cast("decimal(18,6)")))
            .cast("double").as("sum_big"),
          max(when(col("event_type") === "purchase", col("value"))).as("max_purchase"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE value > 250) AS n_big,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (WHERE value > 250) AS DOUBLE) AS sum_big,
             |  max(value) FILTER (WHERE event_type = 'purchase') AS max_purchase
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- string function suite ------------------------------------------
    Q("q_string_funcs",
      (s, dir) => Tables.part(s, dir)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          concat_ws("-", col("p_type"), col("p_brand")).as("type_brand"),
          translate(col("p_name"), "aeiou", "_____").as("consonant_mask"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substr(p_name, 1, 5) AS name5, len(p_name) AS name_len,
             |  coalesce(regexp_extract(p_brand, '([0-9]+)', 1), '') AS brand_num,
             |  concat_ws('-', p_type, p_brand) AS type_brand,
             |  translate(p_name, 'aeiou', '_____') AS consonant_mask
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ---- explicit GROUPING SETS (beyond CUBE/ROLLUP) --------------------
    Q("q_grouping_sets",
      (s, dir) => {
        Tables.events(s, dir)
          .select(col("event_type"), (col("user_id") % 10).as("cohort"), col("value"))
          .createOrReplaceTempView("__gs_events")
        s.sql("""SELECT event_type, cohort, count(*) AS n,
                |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
                |  CAST(grouping(event_type) AS INT) AS gb_type,
                |  CAST(grouping(cohort) AS INT) AS gb_cohort
                |FROM __gs_events
                |GROUP BY GROUPING SETS ((event_type), (cohort), ())
                |ORDER BY gb_type, gb_cohort, event_type, cohort""".stripMargin)
      },
      Some("""SELECT event_type, cohort, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |  CAST(grouping(event_type) AS INT) AS gb_type,
             |  CAST(grouping(cohort) AS INT) AS gb_cohort
             |FROM (SELECT event_type, user_id % 10 AS cohort, value FROM events) t
             |GROUP BY GROUPING SETS ((event_type), (cohort), ())
             |ORDER BY gb_type, gb_cohort, event_type NULLS FIRST, cohort NULLS FIRST""".stripMargin)),

    // ---- approximate sketches vs exact, tolerance-checked ---------------
    // Sketch estimates differ across engines by design; the portable,
    // hash-matchable output is the exact value plus a boolean asserting
    // the engine's own estimate landed within tolerance.
    Q("q_approx_sketches",
      (s, dir) => Tables.events(s, dir)
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          // rsd explicit and ≥4σ inside the asserted tolerance: the
          // default 5% rsd made the 5%-band check a coin flip (observed
          // failing at sf0.1 — a 1σ band is not a tolerance)
          approx_count_distinct(col("user_id"), 0.01).as("__au"),
          countDistinct(col("event_id")).as("exact_events"),
          approx_count_distinct(col("event_id"), 0.02).as("__ae"),
          expr("percentile(value, 0.5)").as("__exact_med"),
          expr("approx_percentile(value, 0.5, 10000)").as("__am"))
        .select(
          col("exact_users"),
          (abs(col("__au") - col("exact_users")) <=
            col("exact_users") * 0.05).as("users_within_5pct"),
          col("exact_events"),
          (abs(col("__ae") - col("exact_events")) <=
            col("exact_events") * 0.08).as("events_within_8pct"),
          (abs(col("__am") - col("__exact_med")) <=
            abs(col("__exact_med")) * 0.05).as("median_within_5pct")),
      Some("""SELECT count(DISTINCT user_id) AS exact_users,
             |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
             |    <= count(DISTINCT user_id) * 0.05 AS users_within_5pct,
             |  count(DISTINCT event_id) AS exact_events,
             |  abs(approx_count_distinct(event_id) - count(DISTINCT event_id))
             |    <= count(DISTINCT event_id) * 0.08 AS events_within_8pct,
             |  abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
             |    <= abs(quantile_cont(value, 0.5)) * 0.05 AS median_within_5pct
             |FROM events""".stripMargin)),

    // ---- JSON-lines source: write → schema'd read → aggregate -----------
    // The oracle aggregates the ORIGINAL parquet table, so a hash match
    // proves the JSON write+read roundtrip is lossless (doubles survive
    // via shortest-round-trip serialization).
    Q("q_json_roundtrip",
      (s, dir) => {
        // path unique per (input dir, session): concurrent harness runs on
        // the same sfdir get distinct Spark applicationIds, so they can't
        // clobber each other's files mid-read
        val path = s"/tmp/graft_json_roundtrip_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").json(path)
        s.read
          .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
          .json(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- mergeable HLL sketches (incremental distinct counting) -----------
    // The 100 TB distinct-count discipline: persist one HLL sketch per
    // day (Datasketches binary, a few KB) and UNION them at query time —
    // no rescan of history. Union-of-daily and the direct whole-range
    // sketch must BOTH land within tolerance of the exact count (they
    // are equal in sparse mode but may diverge by a register encoding
    // once dense, so estimate equality is not the portable claim —
    // tolerance vs exact is, same discipline as q_approx_sketches).
    Q("q_hll_mergeable",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val daily = ev.groupBy(to_date(col("ts")).as("d"))
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val merged = daily.agg(
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("__m"))
        ev.agg(
            countDistinct(col("user_id")).as("exact_users"),
            expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("__w"))
          .crossJoin(broadcast(merged))
          .select(col("exact_users"),
            (abs(col("__m") - col("exact_users")) <=
              col("exact_users") * 0.05).as("merged_within_5pct"),
            (abs(col("__w") - col("exact_users")) <=
              col("exact_users") * 0.05).as("whole_within_5pct"))
      },
      Some("""SELECT count(DISTINCT user_id) AS exact_users,
             |  true AS merged_within_5pct, true AS whole_within_5pct
             |FROM events""".stripMargin)),

    // ---- Count-Min heavy hitters (frequency sketch) -----------------------
    // The streaming-friendly frequency sketch next to HLL (distinct) and
    // t-digest (quantiles): CMS construction is a distributed mergeable
    // aggregate; estimates are served from the broadcast sketch. CMS
    // NEVER underestimates, and with eps=0.001 the overestimate bound is
    // ⌈eps·N⌉ counts — the oracle asserts that guarantee holds for the
    // exact top-10 keys (estimates themselves are engine-specific, same
    // discipline as q_approx_sketches).
    Q("q_heavy_hitters",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val n = ev.count()
        val cms = ev.stat.countMinSketch(
          col("user_id"), eps = 0.001, confidence = 0.99, seed = 42)
        val est = udf((u: Long) => cms.estimateCount(u))
        ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
          .orderBy(col("n_events").desc, col("user_id"))
          .limit(10)
          .withColumn("__est", est(col("user_id")))
          .select(col("user_id"), col("n_events"),
            (col("__est") >= col("n_events") &&
              col("__est") <= col("n_events") + math.ceil(0.001 * n).toLong)
              .as("cms_within_bound"))
      },
      Some("""SELECT user_id, count(*) AS n_events, true AS cms_within_bound
             |FROM events GROUP BY user_id
             |ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin)),

    // ---- mergeable KLL quantile sketches (incremental percentiles) --------
    // The quantile member of the sketch family (HLL = distinct, CMS =
    // frequency): persist one KLL sketch per day — KBs — and MERGE them at
    // query time for any-date-range percentiles with no rescan of history.
    // KLL compaction is randomized, so the portable claim is the library's
    // GUARANTEE, not the estimate: the true rank of each estimated
    // quantile must lie within ±2·eps of the target rank (eps = published
    // single-quantile normalized rank error for k; doubled for a
    // multi-sigma band, same discipline as q_approx_sketches). Checked for
    // BOTH the merged-daily sketch and a whole-corpus direct sketch —
    // proving the merge path loses nothing beyond the published bound.
    // Day keys are epoch-day integers (portable: floor(epoch) // 86400).
    Q("q_kll_mergeable",
      (s, dir) => {
        val k = 200
        val eps = KllSketch.getNormalizedRankError(k, false)
        val tol = 2 * eps
        val ranks = Seq(0.5, 0.9, 0.99)
        val ev = Tables.events(s, dir)
          .select((unix_timestamp(col("ts")).cast("long") / 86400L)
              .cast("long").cast("string").as("d"),
            col("value"), lit("all").as("w"))
        def quantiles(keyCol: String): Array[Double] = {
          val parts = Sketches
            .kllMergeByKey(Sketches.kllPartials(ev, keyCol, "value", k), keyCol, k)
            .select(col("kll")).collect()
          val acc = KllDoublesSketch.newHeapInstance(k)
          parts.foreach(r => acc.merge(Sketches.kllFromBytes(r.getAs[Array[Byte]](0))))
          ranks.map(p => acc.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)).toArray
        }
        val merged = quantiles("d")   // one sketch per day, merged
        val whole = quantiles("w")    // single direct sketch
        def ok(prefix: String, est: Array[Double]) =
          ranks.zipWithIndex.map { case (p, i) =>
            // exact inclusive rank of the estimate vs target rank p
            (sum(when(col("value") <= est(i), 1L).otherwise(0L)) / count(col("value"))
              between (p - tol, p + tol)).as(s"${prefix}_p${(p * 100).toInt}_ok")
          }
        val outCols = Seq(count(col("value")).as("n_values"),
          countDistinct(col("d")).as("n_days")) ++
          ok("merged", merged) ++ ok("whole", whole)
        ev.agg(outCols.head, outCols.tail: _*)
      },
      Some("""SELECT count(value) AS n_values,
             |  count(DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS n_days,
             |  true AS merged_p50_ok, true AS merged_p90_ok,
             |  true AS merged_p99_ok, true AS whole_p50_ok,
             |  true AS whole_p90_ok, true AS whole_p99_ok
             |FROM events""".stripMargin)),

    // ---- Theta-sketch audience overlap (set INTERSECTION) -----------------
    // The set-operation member of the sketch family: Theta sketches
    // estimate |A ∩ B| — which HLL structurally cannot — so per-segment
    // distinct-user sketches (KBs each) answer pairwise audience-overlap
    // questions without re-scanning events. Per-type sketches are built
    // distributed (partials per partition, union per key); the pairwise
    // intersections run on the driver over the collected KB-scale
    // sketches (|types|² tiny rows — the KMeans-centroid pattern). The
    // exact pairwise overlap via the distinct self-join is the
    // verification harness; the asserted portable claim is the sketch's
    // published confidence interval: exact ∈ [lb(3σ), ub(3σ)].
    Q("q_theta_overlap",
      (s, dir) => {
        val lgK = 12
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"))
          .where(col("event_type").isNotNull)
        val perType = Sketches.thetaMergeByKey(
          Sketches.thetaPartials(ev, "event_type", "user_id", lgK),
          "event_type", lgK)
        val sk = perType.collect()
          .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
          .sortBy(_._1)
        val bounds = for {
          i <- sk.indices; j <- (i + 1) until sk.length
        } yield {
          val inter = Sketches.thetaIntersect(sk(i)._2, sk(j)._2)
          (sk(i)._1, sk(j)._1, inter.getLowerBound(3), inter.getUpperBound(3))
        }
        val boundsDf = s.createDataFrame(bounds)
          .toDF("type_a", "type_b", "lb", "ub")
        val u = ev.distinct()
        val exact = u.as("a")
          .join(u.as("b"), col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("exact_both"))
        exact.join(broadcast(boundsDf), Seq("type_a", "type_b"))
          .select(col("type_a"), col("type_b"), col("exact_both"),
            (col("exact_both") >= col("lb") &&
              col("exact_both") <= col("ub")).as("within_bounds"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH u AS (SELECT DISTINCT event_type, user_id FROM events
             |          WHERE event_type IS NOT NULL)
             |SELECT a.event_type AS type_a, b.event_type AS type_b,
             |  count(*) AS exact_both, true AS within_bounds
             |FROM u a JOIN u b
             |  ON a.user_id = b.user_id AND a.event_type < b.event_type
             |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin)),

    // ---- CSV round-trip (the reference's ingest format) -------------------
    // Write → schema'd read-back → aggregate, proving CSV serialization
    // is lossless for the pipeline's types (Spark prints doubles with
    // round-trip precision). Same uniqueness discipline as the JSON
    // round-trip: path keyed by (input dir, applicationId).
    Q("q_csv_roundtrip",
      (s, dir) => {
        val path = s"/tmp/graft_csv_roundtrip_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").option("header", "true").csv(path)
        s.read
          .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
          .option("header", "true")
          .csv(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- ORC round-trip (columnar interchange beyond parquet) -------------
    // Spark ships the ORC source natively; same lossless write → read-back
    // → aggregate contract as the CSV/JSON round-trips.
    Q("q_orc_roundtrip",
      (s, dir) => {
        val path = s"/tmp/graft_orc_roundtrip_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- XML source/sink round-trip ---------------------------------------
    // Spark 4's native XML data source (the spark-xml connector merged
    // into core): write events as row-tagged XML, read back with an
    // explicit schema (no inference pass at scale), prove losslessness by
    // aggregating the round-tripped rows against the original table.
    // Same discipline as the ORC/JSON round-trips: distributed
    // splittable read, decimal-exact sum.
    Q("q_xml_roundtrip",
      (s, dir) => {
        val path = s"/tmp/graft_xml_roundtrip_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .write.mode("overwrite").option("rowTag", "event")
          .format("xml").save(path)
        s.read.format("xml").option("rowTag", "event")
          .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
          .load(path)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY event_type
             |ORDER BY event_type NULLS FIRST""".stripMargin)),

    // ---- custom DataSource V2 scan, oracle-checked ------------------------
    // graft.sources.SyntheticSource is this repo's DSv2 table (column
    // pruning + event_id partition pruning at planning time — see the
    // source scaladoc and SyntheticSourceSpec). Its generator is pure
    // integer modular arithmetic, so DuckDB reproduces the TABLE ITSELF
    // from range(N) and the whole custom-source read path — pruning,
    // residual filters, row generation — is hash-checked, not just
    // spec-tested. The event_id predicate drops ~40% of input partitions
    // before any task runs.
    Q("q_synthetic_source",
      (s, dir) => s.read.format("graft.sources.SyntheticSource")
        .option("rows", "1000000").option("partitions", "32").load()
        .filter(col("event_id") < 600000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("cents")).as("sum_cents"),
          max(col("ts_epoch")).as("max_ts"))
        .orderBy(col("event_type")),
      Some("""WITH t AS (
             |  SELECT range AS id, 1704067200 + range AS ts_epoch,
             |         range % 1000 AS user_id,
             |         'type' || CAST(range % 5 AS VARCHAR) AS event_type,
             |         (range * 2654435761) % 1000000 AS cents
             |  FROM range(1000000) WHERE range < 600000)
             |SELECT event_type, count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents, max(ts_epoch) AS max_ts
             |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- custom DataSource V2 SINK: the batch commit protocol -------------
    // graft.sources.DigestSink exercises the V2 write path end to end:
    // per-task DataWriters fold their partition into (count, XOR digest)
    // commit messages, and the driver's BatchWrite.commit aggregates only
    // successful attempts — the exactly-once machinery every distributed
    // sink rides on. The same events are committed through two DIFFERENT
    // partitionings; the XOR fold makes the digest partition-invariant,
    // so agreement proves the commit aggregation saw every row exactly
    // once both times. Row counts are oracle-checked; digest equality is
    // the engine-side exactly-once claim.
    Q("q_digest_sink",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        val runId = s.sparkContext.applicationId
        ev.repartition(32).write.format("graft.sources.DigestSink")
          .option("id", s"${runId}_a").mode("append").save()
        ev.repartition(7, col("user_id")).write.format("graft.sources.DigestSink")
          .option("id", s"${runId}_b").mode("append").save()
        val a = graft.sources.DigestSink.committed.get(s"${runId}_a")
        val b = graft.sources.DigestSink.committed.get(s"${runId}_b")
        import s.implicits._
        Seq((a._1, b._1, a._2 == b._2))
          .toDF("n_rows_a", "n_rows_b", "digests_agree")
      },
      Some("""SELECT count(*) AS n_rows_a, count(*) AS n_rows_b,
             |  true AS digests_agree
             |FROM events""".stripMargin)),

    // ---- format("graft"): the lakehouse layer as a first-class source -----
    // graft.sources.GraftTableSource exposes TableManifest through the
    // DataSource API. This query drives the WHOLE connector lifecycle
    // through public Spark surfaces only — no library calls: bootstrap
    // via .write.format("graft"), append via SQL INSERT INTO a catalog
    // table USING graft, serve via a temporary view USING graft with the
    // WHERE pushed into the source (PushedFilters in the plan,
    // pushdown-exactness spec-locked in GraftTableSourceSpec). The hash
    // proves the commit/read protocol preserved every row across three
    // distinct write/read surfaces.
    Q("q_graft_source_sql",
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft_conn_sql").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        e.filter(col("event_id") % 2 === 0)
          .write.format("graft").mode("overwrite").save(path)
        val t = "gsrc_" +
          java.util.UUID.randomUUID.toString.replace("-", "").take(12)
        s.sql(s"CREATE TABLE $t USING graft OPTIONS (path '$path')")
        try {
          e.filter(col("event_id") % 2 === 1)
            .createOrReplaceTempView(s"${t}_drop")
          s.sql(s"INSERT INTO $t SELECT * FROM ${t}_drop")
        } finally s.sql(s"DROP TABLE IF EXISTS $t")
        s.sql(s"CREATE OR REPLACE TEMPORARY VIEW ${t}_v USING graft " +
          s"OPTIONS (path '$path')")
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  max(event_id) AS max_id
             |FROM ${t}_v WHERE user_id BETWEEN 10 AND 60
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  max(event_id) AS max_id
             |FROM events WHERE user_id BETWEEN 10 AND 60
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Pushdown routing through the connector: an event_id range predicate
    // reaches TableManifest.readRange (zone maps decide the batch dirs
    // before listing) and an event_type point predicate reaches
    // readPointString (executor-side Bloom probes) — both through plain
    // DataFrame filters on format("graft") reads of a 4-batch append-log
    // layout. Pruning is necessary-condition-only and the exact predicate
    // re-applies, so one hash gates BOTH routes against the unpruned SQL
    // replay; the pruning/cost side is spec- and Stress-measured.
    Q("q_graft_source_pushdown",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_conn_push").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        val maxId = e.agg(max(col("event_id"))).head().getLong(0)
        val q = maxId / 4
        TableManifest.commitSnapshot(e.filter(col("event_id") <= q), path)
        (1 to 3).foreach(i => TableManifest.append(
          e.filter(col("event_id") > i * q &&
            (if (i == 3) lit(true) else col("event_id") <= (i + 1) * q)),
          path))
        TableManifest.refreshZoneMaps(s, path, Seq("event_id"))
        TableManifest.refreshBloomFilters(s, path, Seq("event_type"),
          expectedPerBatch = math.max(1024L, maxId / 4 + 1))
        val et = e.agg(min(col("event_type"))).head().getString(0)
        val ranged = s.read.format("graft").load(path)
          .filter(col("event_id") >= q && col("event_id") <= 2 * q)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("probe", lit("range"))
        val point = s.read.format("graft").load(path)
          .filter(col("event_type") === et)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("probe", lit("point"))
        ranged.unionByName(point)
          .select(col("probe"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("probe"), col("event_type"))
      },
      Some("""WITH mx AS (SELECT max(event_id) // 4 AS q FROM events)
             |SELECT 'range' AS probe, event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events, mx
             |WHERE event_id >= q AND event_id <= 2 * q
             |GROUP BY event_type
             |UNION ALL
             |SELECT 'point', event_type, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM events
             |WHERE event_type = (SELECT min(event_type) FROM events)
             |GROUP BY event_type
             |ORDER BY probe, event_type""".stripMargin)),

    // The path-addressed catalog (spark.sql.catalog.graft): identifiers
    // ARE paths, existence/schema resolve against the manifest alone,
    // and time travel is the analyzer's NATIVE `VERSION AS OF` syntax —
    // loadTable(ident, version) — not a reader option. One hash gates
    // catalog SELECT, catalog INSERT INTO (a keyed manifest append), and
    // a pinned-version read that must exclude that insert.
    Q("q_graft_catalog_sql",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_cat_sql").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 2 === 0),
          path)
        e.filter(col("event_id") % 2 === 1)
          .createOrReplaceTempView("gcat_odd")
        s.sql(s"INSERT INTO graft.`$path` SELECT * FROM gcat_odd")
        val v0 = TableManifest.versions(s, path).head
        s.sql(
          s"""SELECT 'v0_pinned' AS stage, count(*) AS n,
             |  max(event_id) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path` VERSION AS OF $v0
             |UNION ALL
             |SELECT 'current', count(*), max(event_id),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM graft.`$path`
             |ORDER BY stage""".stripMargin)
      },
      Some("""SELECT 'v0_pinned' AS stage, count(*) AS n,
             |  max(event_id) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events WHERE event_id % 2 = 0
             |UNION ALL
             |SELECT 'current', count(*), max(event_id),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM events
             |ORDER BY stage""".stripMargin)),

    // SQL DELETE through the catalog: the analyzer pushes the WHERE as
    // source filters, the table renders them back to predicate SQL, and
    // the delete lands as ONE MoR tombstone segment (match-count- and
    // table-size-independent — `Stress mordelete`), masked at read. The
    // hash gates the Filter→SQL round trip: a quoting or 3VL slip in the
    // rendering would surface as a row diff against the batch replay.
    Q("q_graft_catalog_delete",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_cat_del").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e, path)
        val et = e.agg(min(col("event_type"))).head().getString(0)
        s.sql(s"DELETE FROM graft.`$path` WHERE " +
          s"(user_id >= 10 AND user_id <= 40) OR event_type = '$et'")
        // a predicate BEYOND the DSv2 Filter vocabulary (modulo): the
        // analyzer rule renders it into the tombstone — used to refuse
        s.sql(s"DELETE FROM graft.`$path` WHERE event_id % 13 = 0")
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH et AS (SELECT min(event_type) AS m FROM events)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events, et
             |WHERE NOT coalesce(
             |  (user_id >= 10 AND user_id <= 40) OR event_type = m,
             |  false)
             |AND NOT coalesce(event_id % 13 = 0, false)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Analyzer-native SQL UPDATE (GraftUpdateRule via GraftExtensions):
    // plain `UPDATE graft.t SET ... WHERE ...` — no CALL detour — lands
    // as the match-proportional MoR commit. The rule renders the
    // resolved condition/SET expressions back to SQL with the DELETE
    // path's refuse-untranslatable discipline: the query also proves a
    // subquery assignment FAILS AT ANALYSIS and leaves the table
    // untouched (the post-refusal aggregate rides in the same hash).
    Q("q_graft_sql_update",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_sql_upd").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e, path)
        s.sql(s"UPDATE graft.`$path` " +
          "SET value = least(value * 2, CAST(1 AS DOUBLE)), " +
          "event_type = upper(event_type) " +
          "WHERE event_type IN ('click', 'view') AND user_id % 2 = 0")
        // untranslatable (subquery) assignment: refused at analysis,
        // nothing committed — the aggregate below must not see it
        val refused =
          try {
            s.sql(s"UPDATE graft.`$path` SET value = " +
              s"(SELECT max(value) FROM graft.`$path`)")
            false
          } catch { case scala.util.control.NonFatal(_) => true }
        require(refused, "subquery UPDATE must be refused at analysis")
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH p AS (
             |  SELECT event_type, value,
             |    coalesce(event_type IN ('click', 'view')
             |             AND user_id % 2 = 0, false) AS m
             |  FROM events),
             |post AS (
             |  SELECT CASE WHEN m THEN upper(event_type)
             |              ELSE event_type END AS event_type,
             |         CASE WHEN m THEN least(value * 2, 1.0)
             |              ELSE value END AS value
             |  FROM p)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM post GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    // The evolved-table SQL surface end to end: the catalog serves the
    // MERGED schema, so a late-added column is SQL-visible (null-padded
    // over legacy batches) and both analyzer-route DML commands reach
    // it — the UPDATE's SET expression reads the padded null, the
    // DELETE's predicate filters on post-update values of the evolved
    // column. DuckDB mirrors the whole lifecycle with CTEs.
    Q("q_graft_evolved_sql",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_evo_sql").toString
        val e = Tables.events(s, dir)
        TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0)
            .select(col("event_id"), col("event_type"), col("value")), path)
        TableManifest.append(
          e.filter(col("event_id") % 2 === 1)
            .select(col("event_id"), col("event_type"), col("value"),
              col("user_id")), path)
        s.sql(s"UPDATE graft.`$path` " +
          "SET user_id = coalesce(user_id, -1) + 1000000 " +
          "WHERE event_id % 3 = 0")
        s.sql(s"DELETE FROM graft.`$path` " +
          "WHERE user_id = 999999 AND event_id % 6 = 0")
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  count(user_id) AS n_evolved,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH evo AS (
             |  SELECT event_id, event_type, value,
             |         CAST(NULL AS BIGINT) AS user_id
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT event_id, event_type, value, user_id
             |  FROM events WHERE event_id % 2 = 1),
             |upd AS (
             |  SELECT event_id, event_type, value,
             |    CASE WHEN event_id % 3 = 0
             |         THEN coalesce(user_id, -1) + 1000000
             |         ELSE user_id END AS user_id
             |  FROM evo),
             |del AS (
             |  SELECT * FROM upd WHERE NOT coalesce(
             |    user_id = 999999 AND event_id % 6 = 0, false))
             |SELECT event_type, count(*) AS n,
             |  count(user_id) AS n_evolved,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM del GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    // ALTER TABLE ADD COLUMNS as DDL (GraftCatalog.alterTable): one
    // ZERO-ROW widening commit — O(1) data, a footer-only parquet file
    // carrying the new columns into every merged read. The new columns
    // are immediately SQL-visible (null over every pre-ALTER row),
    // become the INSERT target schema, and are reachable by the
    // analyzer-native UPDATE on legacy rows. DuckDB mirrors the widen +
    // wider insert + conditional update with CTEs.
    Q("q_graft_sql_alter",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_sql_alt").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0), path)
        s.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS " +
          "(priority BIGINT, tag STRING)")
        Tables.events(s, dir)
          .filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("event_type"), col("value"),
            (col("event_id") % 7).as("priority"),
            upper(col("event_type")).as("tag"))
          .createOrReplaceTempView("gsa_new")
        s.sql(s"INSERT INTO graft.`$path` SELECT * FROM gsa_new")
        s.sql(s"UPDATE graft.`$path` " +
          "SET priority = coalesce(priority, -1) * 10, " +
          "tag = coalesce(tag, 'legacy') WHERE event_id % 5 = 0")
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  count(priority) AS n_pri,
             |  CAST(sum(priority) AS BIGINT) AS sum_pri,
             |  count(tag) AS n_tag, count(DISTINCT tag) AS d_tag
             |FROM graft.`$path`
             |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      Some("""WITH evo AS (
             |  SELECT event_id, event_type,
             |         CAST(NULL AS BIGINT) AS priority,
             |         CAST(NULL AS VARCHAR) AS tag
             |  FROM events WHERE event_id % 2 = 0
             |  UNION ALL
             |  SELECT event_id, event_type, event_id % 7,
             |         upper(event_type)
             |  FROM events WHERE event_id % 2 = 1),
             |upd AS (
             |  SELECT event_id, event_type,
             |    CASE WHEN event_id % 5 = 0
             |         THEN coalesce(priority, -1) * 10
             |         ELSE priority END AS priority,
             |    CASE WHEN event_id % 5 = 0
             |         THEN coalesce(tag, 'legacy')
             |         ELSE tag END AS tag
             |  FROM evo)
             |SELECT event_type, count(*) AS n,
             |  count(priority) AS n_pri,
             |  CAST(sum(priority) AS BIGINT) AS sum_pri,
             |  count(tag) AS n_tag, count(DISTINCT tag) AS d_tag
             |FROM upd GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    // Atomic CTAS/RTAS (StagingTableCatalog): CREATE TABLE AS SELECT
    // stages the query's FULL result hidden (no marker, nothing
    // visible) and publishes it with one marker flip; REPLACE TABLE AS
    // SELECT is the next version of the SAME manifest — history
    // preserved, the pre-replace pin keeps serving. The query proves
    // the atomicity contract in the hash: a failing RTAS
    // (assert_true mid-query) commits NOTHING (the pre state rides in
    // the 'pre' stage), then a self-referential RTAS rolls the table
    // up in place (the staged write reads the version it replaces).
    Q("q_graft_rtas",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_rtas").toString + "/t"
        Tables.events(s, dir).createOrReplaceTempView("grt_events")
        s.sql(s"CREATE TABLE graft.`$path` AS " +
          "SELECT event_id, event_type, value FROM grt_events " +
          "WHERE event_id % 2 = 0")
        val v0 = TableManifest.versions(s, path).last
        // a failing RTAS: the staged payload is discarded, no version
        // commits, the old contents keep serving
        val refused =
          try {
            s.sql(s"REPLACE TABLE graft.`$path` AS " +
              "SELECT assert_true(value < 0) AS chk FROM grt_events")
            false
          } catch { case scala.util.control.NonFatal(_) => true }
        require(refused, "the failing RTAS must throw")
        require(TableManifest.versions(s, path).last == v0,
          "a failed RTAS must not commit any version")
        // self-referential RTAS: roll the table up IN PLACE — the
        // staged query reads v0 while staging, the commit lands above
        s.sql(
          s"""REPLACE TABLE graft.`$path` AS
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path` GROUP BY event_type""".stripMargin)
        val pre = s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path` VERSION AS OF $v0
             |GROUP BY event_type""".stripMargin)
          .withColumn("stage", lit("pre"))
        val post = s.sql(
          s"SELECT event_type, n, sum_value FROM graft.`$path`")
          .withColumn("stage", lit("post"))
        pre.unionByName(post)
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH agg AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      AS sum_value
             |  FROM events WHERE event_id % 2 = 0
             |  GROUP BY event_type)
             |SELECT 'pre' AS stage, event_type, n, sum_value FROM agg
             |UNION ALL
             |SELECT 'post', event_type, n, sum_value FROM agg
             |ORDER BY stage, event_type""".stripMargin)),

    // Named tags + RESTORE: `CALL graft.tag` pins a name to a version
    // (O(1) metadata, vacuum-protected), `VERSION AS OF '<name>'` reads
    // it by name, and `CALL graft.restore(to => '<name>')` moves the
    // table back as a FORWARD commit — history never rewritten. The
    // hash carries the tagged read, the post-DELETE head (version-
    // pinned so laziness can't see past the restore), and the restored
    // head, which must equal the tagged stage row for row.
    Q("q_graft_tags",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_tags").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        TableManifest.commitSnapshot(
          e.filter(col("event_id") % 2 === 0), path)
        s.sql(s"CALL graft.tag(path => '$path', name => 'raw')")
        s.sql(s"DELETE FROM graft.`$path` WHERE event_id % 4 = 0")
        val vHead = TableManifest.versions(s, path).last
        s.sql(s"CALL graft.restore(path => '$path', to => 'raw')")
        def agg(from: String, tag: String) = s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM $from GROUP BY event_type""".stripMargin)
          .withColumn("stage", lit(tag))
        agg(s"graft.`$path` VERSION AS OF 'raw'", "tagged")
          .unionByName(agg(s"graft.`$path` VERSION AS OF $vHead",
            "head"))
          .unionByName(agg(s"graft.`$path`", "restored"))
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH even AS (
             |  SELECT event_id, event_type, value FROM events
             |  WHERE event_id % 2 = 0),
             |tagged AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      AS sum_value
             |  FROM even GROUP BY event_type),
             |headv AS (
             |  SELECT event_type, count(*) AS n,
             |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |      AS sum_value
             |  FROM even
             |  WHERE NOT coalesce(event_id % 4 = 0, false)
             |  GROUP BY event_type)
             |SELECT 'tagged' AS stage, event_type, n, sum_value
             |FROM tagged
             |UNION ALL
             |SELECT 'head', event_type, n, sum_value FROM headv
             |UNION ALL
             |SELECT 'restored', event_type, n, sum_value FROM tagged
             |ORDER BY stage, event_type""".stripMargin)),

    // CHECK constraints end to end: declared in CREATE TABLE, enforced
    // at the manifest's write funnels (INSERT refused, UPDATE
    // post-image refused — both PROVEN in the hash by the surviving
    // state), versioned like every other table metadata (the pinned
    // CALL graft.constraints still shows the dropped constraint), and
    // lifted by DROP CONSTRAINT (the same UPDATE then commits). DuckDB
    // replays the lifecycle: only the post-drop update ever lands.
    Q("q_graft_constraints",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_cons").toString + "/t"
        s.sql(s"CREATE TABLE graft.`$path` (event_id BIGINT, " +
          "event_type STRING, value DOUBLE, " +
          "CONSTRAINT id_nonneg CHECK (event_id >= 0))")
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
          .createOrReplaceTempView("gcn_src")
        s.sql(s"INSERT INTO graft.`$path` SELECT * FROM gcn_src")
        // a violating INSERT commits nothing
        val refusedIns =
          try { s.sql(s"INSERT INTO graft.`$path` VALUES " +
            "(-1, 'bad', 0.5)"); false }
          catch { case scala.util.control.NonFatal(_) => true }
        require(refusedIns, "violating INSERT must be refused")
        // a violating UPDATE post-image commits nothing either
        val minType = s.sql(s"SELECT min(event_type) FROM graft.`$path`")
          .head().getString(0)
        val flip = s"UPDATE graft.`$path` " +
          s"SET event_id = event_id * -1 - 1 " +
          s"WHERE event_type = '$minType'"
        val refusedUpd =
          try { s.sql(flip); false }
          catch { case scala.util.control.NonFatal(_) => true }
        require(refusedUpd, "violating UPDATE must be refused")
        val vPin = TableManifest.versions(s, path).last
        s.sql(s"ALTER TABLE graft.`$path` DROP CONSTRAINT id_nonneg")
        s.sql(flip) // the same UPDATE commits once the constraint is gone
        val defsPin = s
          .sql(s"CALL graft.constraints(path => '$path', " +
            s"version => $vPin)")
          .select(lit("check_pin").as("stage"), col("name").as("k"),
            when(col("enforced"), lit(1L)).otherwise(lit(0L)).as("n"),
            lit(0L).as("m"))
        val defsNow = s.range(1).select(lit("check_now").as("stage"),
          lit("n_live").as("k"),
          lit(s.sql(s"CALL graft.constraints(path => '$path')").count())
            .as("n"), lit(0L).as("m"))
        val data = s.sql(
          s"""SELECT event_type AS k, count(*) AS n,
             |  CAST(sum(event_id) AS BIGINT) AS m
             |FROM graft.`$path` GROUP BY event_type""".stripMargin)
          .select(lit("data").as("stage"), col("k"), col("n"), col("m"))
        defsPin.unionByName(defsNow).unionByName(data)
          .orderBy(col("stage"), col("k"))
      },
      Some("""WITH upd AS (
             |  SELECT CASE WHEN event_type =
             |           (SELECT min(event_type) FROM events)
             |         THEN event_id * -1 - 1 ELSE event_id END
             |           AS event_id,
             |         event_type
             |  FROM events),
             |data AS (
             |  SELECT 'data' AS stage, event_type AS k,
             |    count(*) AS n, CAST(sum(event_id) AS BIGINT) AS m
             |  FROM upd GROUP BY event_type)
             |SELECT 'check_pin' AS stage, 'id_nonneg' AS k,
             |       CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS m
             |UNION ALL
             |SELECT 'check_now', 'n_live', CAST(0 AS BIGINT),
             |       CAST(0 AS BIGINT)
             |UNION ALL
             |SELECT stage, k, n, m FROM data
             |ORDER BY stage, k""".stripMargin)),

    // Analyzer-native SQL MERGE INTO (GraftMergeRule): the canonical
    // upsert — WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    // INSERT * over a key-equality ON — lands as one snapshot commit of
    // kept ∪ updated ∪ inserted (anti/inner/anti joins on the key; AQE
    // broadcasts the small source). The command's returned
    // (rows_matched, rows_inserted) ride in the hash beside the merged
    // table's aggregate.
    Q("q_graft_sql_merge",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_sql_mrg").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e, path)
        e.filter(col("event_id") % 7 === 0)
          .withColumn("event_type", concat(lit("m_"), col("event_type")))
          .unionByName(e.filter(col("event_id") % 997 === 0)
            .withColumn("event_id", col("event_id") + 9000000L))
          .createOrReplaceTempView("gsm_src")
        val r = s.sql(
          s"""MERGE INTO graft.`$path` AS t USING gsm_src AS s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
        // stage 2: WHEN MATCHED THEN DELETE — key-list deletion
        e.filter(col("event_id") % 11 === 0)
          .createOrReplaceTempView("gsm_del")
        val r2 = s.sql(
          s"""MERGE INTO graft.`$path` AS t USING gsm_del AS s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN DELETE""".stripMargin).head()
        // stage 3: WHEN NOT MATCHED THEN INSERT * — insert-if-absent:
        // only the key-deleted %11 rows among %13 re-enter, renamed
        e.filter(col("event_id") % 13 === 0)
          .withColumn("event_type", concat(lit("ins_"), col("event_type")))
          .createOrReplaceTempView("gsm_ins")
        s.sql(
          s"""MERGE INTO graft.`$path` AS t USING gsm_ins AS s
             |ON t.event_id = s.event_id
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
        def agg(fromSql: String, tag: String) = s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM $fromSql GROUP BY event_type""".stripMargin)
          .withColumn("stage", lit(tag))
        agg(s"graft.`$path` VERSION AS OF ${r.getLong(0)}", "upsert")
          .withColumn("rows_matched", lit(r.getLong(1)))
          .withColumn("rows_inserted", lit(r.getLong(2)))
          .unionByName(
            agg(s"graft.`$path` VERSION AS OF ${r2.getLong(0)}", "keydel")
              .withColumn("rows_matched", lit(r2.getLong(1)))
              .withColumn("rows_inserted", lit(r2.getLong(2))))
          .unionByName(agg(s"graft.`$path`", "insabs")
            .withColumn("rows_matched", lit(-1L))
            .withColumn("rows_inserted", lit(-1L)))
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"), col("rows_matched"), col("rows_inserted"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH src AS (
             |  SELECT event_id, user_id, 'm_' || event_type AS event_type,
             |         value
             |  FROM events WHERE event_id % 7 = 0
             |  UNION ALL
             |  SELECT event_id + 9000000, user_id, event_type, value
             |  FROM events WHERE event_id % 997 = 0),
             |m AS (
             |  SELECT event_id, user_id, event_type, value FROM events
             |  WHERE event_id NOT IN (SELECT event_id FROM src)
             |  UNION ALL SELECT * FROM src),
             |m2 AS (
             |  SELECT * FROM m WHERE event_id NOT IN
             |    (SELECT event_id FROM events WHERE event_id % 11 = 0)),
             |m3 AS (
             |  SELECT * FROM m2
             |  UNION ALL
             |  SELECT event_id, user_id, 'ins_' || event_type, value
             |  FROM events WHERE event_id % 13 = 0
             |    AND event_id NOT IN (SELECT event_id FROM m2)),
             |a1 AS (SELECT 'upsert' AS stage, event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  (SELECT count(*) FROM events WHERE event_id % 7 = 0)
             |    AS rows_matched,
             |  (SELECT count(*) FROM events WHERE event_id % 997 = 0)
             |    AS rows_inserted
             |  FROM m GROUP BY event_type),
             |a2 AS (SELECT 'keydel', event_type, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
             |  (SELECT count(*) FROM m WHERE event_id IN
             |    (SELECT event_id FROM events WHERE event_id % 11 = 0)),
             |  0
             |  FROM m2 GROUP BY event_type),
             |a3 AS (SELECT 'insabs', event_type, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
             |  -1, -1
             |  FROM m3 GROUP BY event_type)
             |SELECT * FROM a1 UNION ALL SELECT * FROM a2
             |UNION ALL SELECT * FROM a3
             |ORDER BY stage, event_type""".stripMargin)),

    // The SAME canonical upsert through the MATCH-PROPORTIONAL path,
    // structurally pinned: GraftMergeRule now routes every SQL MERGE
    // into TableManifest.mergeWhere — an EQUALITY tombstone
    // (deletes_v/eqdeletes_v key file) + an update-keyspace replacement
    // batch, flipped by ONE kind=merge marker — never the old
    // commitDerivedSnapshot full-table rewrite. The hash pins FOUR
    // things at once, read after the merge: the pre-merge pin
    // (immutable), the post-merge table, the CDF window rendering the
    // merge as delete(old) + insert(new), and `mor_shape` — a literal
    // proving NO new data_v payload dir appeared (a CoW rewrite would
    // have created one; the MoR commit only adds a batch to the
    // existing payload). Scale: cost is the matched+inserted rows, not
    // the table (SCALE.md `Stress mormerge`).
    Q("q_graft_merge_mor",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_mrg_mor").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 2 === 0),
          path)
        TableManifest.append(e.filter(col("event_id") % 2 === 1), path)
        val v0 = TableManifest.versions(s, path).last
        def payloadDirs: Long = {
          val hp = new org.apache.hadoop.fs.Path(path)
          hp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .listStatus(hp)
            .count(_.getPath.getName.startsWith("data_v")).toLong
        }
        val dirsBefore = payloadDirs
        e.filter(col("event_id") % 7 === 0)
          .select(col("event_id"), col("user_id"),
            (col("value") * 2).as("delta"))
          .unionByName(e.filter(col("event_id") % 997 === 0)
            .select((col("event_id") + 9000000L).as("event_id"),
              col("user_id"), col("value").as("delta")))
          .createOrReplaceTempView("gmm_src")
        val r = s.sql(
          s"""MERGE INTO graft.`$path` AS t USING gmm_src AS s
             |ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET
             |  value = t.value + s.delta,
             |  event_type = concat(t.event_type, '_m')
             |WHEN NOT MATCHED THEN INSERT
             |  (event_id, user_id, event_type, value)
             |  VALUES (s.event_id, s.user_id, 'fresh', s.delta)"""
            .stripMargin).head()
        val vm = r.getLong(0)
        val morShape = payloadDirs == dirsBefore
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(tag))
        val cdf = TableManifest.readChanges(s, path, v0, vm)
          .groupBy(col("_change_type"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("stage", concat(lit("cdf_"), col("_change_type")))
          .drop("_change_type")
        agg(TableManifest.readAt(s, path, v0), "pre_pin")
          .unionByName(agg(TableManifest.read(s, path), "post"))
          .unionByName(cdf)
          .withColumn("mor_shape", lit(morShape))
          .withColumn("rows_matched", lit(r.getLong(1)))
          .withColumn("rows_inserted", lit(r.getLong(2)))
          .select(col("stage"), col("event_type"), col("n"),
            col("sum_value"), col("mor_shape"), col("rows_matched"),
            col("rows_inserted"))
          .orderBy(col("stage"), col("event_type"))
      },
      Some("""WITH src AS (
             |  SELECT event_id, user_id, value * 2 AS delta
             |  FROM events WHERE event_id % 7 = 0
             |  UNION ALL
             |  SELECT event_id + 9000000, user_id, value
             |  FROM events WHERE event_id % 997 = 0),
             |p AS (
             |  SELECT e.event_id, e.user_id, e.event_type, e.value,
             |         s.delta, s.event_id IS NOT NULL AS m
             |  FROM events e LEFT JOIN src s ON e.event_id = s.event_id),
             |upd AS (
             |  SELECT event_id, user_id, event_type || '_m' AS event_type,
             |         value + delta AS value
             |  FROM p WHERE m),
             |ins AS (
             |  SELECT s.event_id, s.user_id, 'fresh' AS event_type,
             |         s.delta AS value
             |  FROM src s
             |  WHERE s.event_id NOT IN (SELECT event_id FROM events)),
             |post AS (
             |  SELECT event_id, user_id, event_type, value FROM p
             |  WHERE NOT m
             |  UNION ALL SELECT * FROM upd
             |  UNION ALL SELECT * FROM ins),
             |nums AS (
             |  SELECT
             |    (SELECT count(*) FROM events WHERE event_id % 7 = 0)
             |      AS rows_matched,
             |    (SELECT count(*) FROM events WHERE event_id % 997 = 0)
             |      AS rows_inserted),
             |a0 AS (SELECT 'pre_pin' AS stage, event_type, count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_value
             |       FROM events GROUP BY event_type),
             |a1 AS (SELECT 'post', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM post GROUP BY event_type),
             |a2 AS (SELECT 'cdf_delete', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM p WHERE m GROUP BY event_type),
             |a3 AS (SELECT 'cdf_insert', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM (SELECT * FROM upd UNION ALL SELECT * FROM ins)
             |       GROUP BY event_type)
             |SELECT u.*, true AS mor_shape, nums.rows_matched,
             |       nums.rows_inserted
             |FROM (SELECT * FROM a0 UNION ALL SELECT * FROM a1
             |      UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3)
             |  u(stage, event_type, n, sum_value), nums
             |ORDER BY stage, event_type""".stripMargin)),

    // The FULL clause surface in one statement, on a NON-UNIQUE merge
    // key (user_id — target-side multiplicity): conditional matched
    // UPDATE with EXPLICIT assignments reading both pre-images
    // (t.value + s.delta), conditional matched DELETE, the SCD-2
    // `WHEN NOT MATCHED BY SOURCE THEN UPDATE` close-out, and an
    // explicit-column INSERT. Exercises the key-GROUP rewrite: a
    // matched user's rows split per-row across update/delete/no-clause,
    // and the no-clause rows must survive byte-identical even though
    // the whole key group is tombstoned and rewritten (the machinery
    // that keeps per-ROW clause conditions exact under key-level
    // masking). DuckDB mirrors it as per-row CASE-WHEN.
    Q("q_graft_sql_merge_assign",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_mrg_asg").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        TableManifest.commitSnapshot(e, path)
        e.select(col("user_id")).distinct()
          .filter(col("user_id") % 5 === 0)
          .select(col("user_id"),
            ((col("user_id") % 7).cast("double") * 0.1).as("delta"))
          .unionByName(e.select(col("user_id")).distinct()
            .filter(col("user_id") % 13 === 0)
            .select((col("user_id") + 1000000L).as("user_id"),
              lit(0.5).as("delta")))
          .createOrReplaceTempView("gma_src")
        val r = s.sql(
          s"""MERGE INTO graft.`$path` AS t USING gma_src AS s
             |ON t.user_id = s.user_id
             |WHEN MATCHED AND t.value < 0.3 THEN UPDATE SET
             |  value = t.value + s.delta,
             |  event_type = concat(t.event_type, '_lo')
             |WHEN MATCHED AND t.value > 0.9 THEN DELETE
             |WHEN NOT MATCHED THEN INSERT
             |  (event_id, user_id, event_type, value)
             |  VALUES (s.user_id * 1000, s.user_id, 'seed', s.delta)
             |WHEN NOT MATCHED BY SOURCE AND t.event_type = 'error'
             |  THEN UPDATE SET event_type = 'error_closed'"""
            .stripMargin).head()
        s.sql(
          s"""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type""".stripMargin)
          .withColumn("rows_matched", lit(r.getLong(1)))
          .withColumn("rows_inserted", lit(r.getLong(2)))
          .orderBy(col("event_type"))
      },
      Some("""WITH src AS (
             |  SELECT user_id, CAST(user_id % 7 AS DOUBLE) * 0.1 AS delta
             |  FROM (SELECT DISTINCT user_id FROM events
             |        WHERE user_id % 5 = 0)
             |  UNION ALL
             |  SELECT user_id + 1000000, 0.5
             |  FROM (SELECT DISTINCT user_id FROM events
             |        WHERE user_id % 13 = 0)),
             |p AS (
             |  SELECT e.event_id, e.user_id, e.event_type, e.value,
             |         s.delta, s.user_id IS NOT NULL AS m
             |  FROM events e LEFT JOIN src s ON e.user_id = s.user_id),
             |post AS (
             |  SELECT event_id, user_id,
             |    CASE WHEN m AND value < 0.3 THEN event_type || '_lo'
             |         WHEN NOT m AND event_type = 'error'
             |           THEN 'error_closed'
             |         ELSE event_type END AS event_type,
             |    CASE WHEN m AND value < 0.3 THEN value + delta
             |         ELSE value END AS value
             |  FROM p
             |  WHERE NOT (m AND NOT coalesce(value < 0.3, false)
             |             AND coalesce(value > 0.9, false))
             |  UNION ALL
             |  SELECT s.user_id * 1000, s.user_id, 'seed', s.delta
             |  FROM src s
             |  WHERE s.user_id NOT IN (SELECT user_id FROM events)),
             |nums AS (
             |  SELECT
             |    (SELECT count(*) FROM events WHERE user_id % 5 = 0)
             |      AS rows_matched,
             |    (SELECT count(DISTINCT user_id) FROM events
             |     WHERE user_id % 13 = 0) AS rows_inserted)
             |SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  nums.rows_matched, nums.rows_inserted
             |FROM post, nums
             |GROUP BY event_type, nums.rows_matched, nums.rows_inserted
             |ORDER BY event_type""".stripMargin)),

    // MERGE WITH SCHEMA EVOLUTION: source-only columns widen the
    // target (one zero-row footer commit, the ADD COLUMN machinery)
    // before the match-proportional merge — matched rows take the new
    // column's source values via SET *, inserts carry it, and every
    // legacy row reads NULL (the Delta semantics). DuckDB mirrors the
    // widening with a left join.
    Q("q_graft_merge_evolve",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_mrg_evo").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("value"))
        TableManifest.commitSnapshot(e, path)
        Tables.events(s, dir).filter(col("event_id") % 7 === 0)
          .select(col("event_id"), col("value"),
            concat(lit("t_"), col("event_type")).as("tag"))
          .unionByName(Tables.events(s, dir)
            .filter(col("event_id") % 997 === 0)
            .select((col("event_id") + 9000000L).as("event_id"),
              col("value"), lit("fresh").as("tag")))
          .createOrReplaceTempView("gme_src")
        val r = s.sql(
          s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$path` AS t
             |USING gme_src AS s ON t.event_id = s.event_id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
        s.sql(
          s"""SELECT coalesce(tag, 'none') AS tag, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY coalesce(tag, 'none')""".stripMargin)
          .withColumn("rows_matched", lit(r.getLong(1)))
          .withColumn("rows_inserted", lit(r.getLong(2)))
          .orderBy(col("tag"))
      },
      Some("""WITH src AS (
             |  SELECT event_id, value, 't_' || event_type AS tag
             |  FROM events WHERE event_id % 7 = 0
             |  UNION ALL
             |  SELECT event_id + 9000000, value, 'fresh'
             |  FROM events WHERE event_id % 997 = 0),
             |post AS (
             |  SELECT e.event_id,
             |    CASE WHEN s.event_id IS NOT NULL THEN s.value
             |         ELSE e.value END AS value,
             |    s.tag
             |  FROM events e LEFT JOIN src s ON e.event_id = s.event_id
             |  UNION ALL
             |  SELECT event_id, value, tag FROM src
             |  WHERE event_id NOT IN (SELECT event_id FROM events)),
             |nums AS (
             |  SELECT
             |    (SELECT count(*) FROM events WHERE event_id % 7 = 0)
             |      AS rows_matched,
             |    (SELECT count(*) FROM events WHERE event_id % 997 = 0)
             |      AS rows_inserted)
             |SELECT coalesce(tag, 'none') AS tag, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  nums.rows_matched, nums.rows_inserted
             |FROM post, nums
             |GROUP BY coalesce(tag, 'none'), nums.rows_matched,
             |  nums.rows_inserted
             |ORDER BY tag""".stripMargin)),

    // RENAME COLUMN as a METADATA-ONLY commit: the column-mapping
    // artifact resolves old parquet bytes under the new name (no
    // rewrite), the pre-rename pin serves the OLD name, and DML issued
    // AGAINST THE NEW NAME — a MoR UPDATE and DELETE whose tombstones
    // are stored physical-tolerant — must hit the old-name batches
    // exactly. The hash carries both eras' column-name lists, the
    // post-DML content, and the untouched pinned aggregate; DuckDB
    // replays the DML as per-row CASE-WHEN over the original table.
    Q("q_graft_sql_rename",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_sql_ren").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        TableManifest.commitSnapshot(e, path)
        val pre = TableManifest.versions(s, path).last
        s.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN value TO score")
        s.sql(s"UPDATE graft.`$path` SET score = score * 2 " +
          "WHERE score < 0.25")
        s.sql(s"DELETE FROM graft.`$path` WHERE score > 0.9")
        s.sql(s"INSERT INTO graft.`$path` VALUES (9000001, 1, 0.123)")
        val postCols = s.sql(s"SELECT * FROM graft.`$path`")
          .columns.mkString(",")
        val pinCols = s.sql(
            s"SELECT * FROM graft.`$path` VERSION AS OF $pre")
          .columns.mkString(",")
        val post = s.sql(
          s"""SELECT 'post' AS stage, count(*) AS n,
             |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path`""".stripMargin)
        val pin = s.sql(
          s"""SELECT 'pre_pin' AS stage, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path` VERSION AS OF $pre""".stripMargin)
        post.unionByName(pin)
          .withColumn("post_cols", lit(postCols))
          .withColumn("pin_cols", lit(pinCols))
          .orderBy(col("stage"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, value FROM events),
             |u AS (SELECT event_id, user_id,
             |        CASE WHEN value < 0.25 THEN value * 2
             |             ELSE value END AS score
             |      FROM e),
             |post AS (
             |  SELECT * FROM u
             |  WHERE NOT coalesce(score > 0.9, false)
             |  UNION ALL SELECT 9000001, 1, 0.123),
             |a1 AS (SELECT 'post' AS stage, count(*) AS n,
             |         CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_v
             |       FROM post),
             |a2 AS (SELECT 'pre_pin', count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |       FROM e)
             |SELECT u.*, 'event_id,user_id,score' AS post_cols,
             |       'event_id,user_id,value' AS pin_cols
             |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2) u
             |ORDER BY stage""".stripMargin)),

    // NOT NULL as first-class constraint DDL: `CREATE TABLE (c T NOT
    // NULL)` and `ALTER TABLE ... ALTER COLUMN c SET/DROP NOT NULL`
    // persist kind-tagged constraints enforced on EVERY write funnel
    // (the CHECK machinery) plus the stricter absence rule. The hash
    // pins five behaviors at once: a NULL insert refuses without
    // committing, SET NOT NULL refuses while existing rows hold NULL
    // (null-padded evolution rows count), a MoR UPDATE backfill makes
    // it succeed, the constraint then rejects NULLs until DROP NOT
    // NULL lifts it, and the CALL graft.constraints listing carries
    // the kind column.
    Q("q_graft_notnull",
      (s, dir) => {
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_notnull").toString
        s.sql(s"CREATE TABLE graft.`$path` (event_id BIGINT NOT NULL, " +
          "event_type STRING, value DOUBLE)")
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
          .createOrReplaceTempView("gnn_src")
        s.sql(s"INSERT INTO graft.`$path` SELECT * FROM gnn_src")
        def refuses(sql: String): Boolean =
          try { s.sql(sql).collect(); false }
          catch { case scala.util.control.NonFatal(_) => true }
        val nullKeyRefused = refuses(
          s"INSERT INTO graft.`$path` VALUES (NULL, 'x', 1.0)")
        // a late-added column is NULL on every legacy row: SET NOT NULL
        // must refuse until backfilled
        s.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (w DOUBLE)")
        val nullsBlockSet = refuses(
          s"ALTER TABLE graft.`$path` ALTER COLUMN w SET NOT NULL")
        s.sql(s"UPDATE graft.`$path` SET value = -1.0 " +
          "WHERE value IS NULL")
        s.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN value SET NOT NULL")
        val nullValueRefused = refuses(
          s"INSERT INTO graft.`$path` VALUES (1, 'x', NULL, 0.5)")
        s.sql(s"ALTER TABLE graft.`$path` ALTER COLUMN value DROP NOT NULL")
        s.sql(s"INSERT INTO graft.`$path` " +
          "VALUES (999000001, 'nulled', NULL, 0.5)")
        val defs = s.sql(s"CALL graft.constraints(path => '$path')")
          .collect().map(r => r.getString(0) + "=" + r.getString(5))
          .sorted.mkString(";")
        s.sql(
          s"""SELECT event_type, count(*) AS n, count(value) AS nv,
             |  CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)))
             |    AS DOUBLE) AS sum_value
             |FROM graft.`$path`
             |GROUP BY event_type""".stripMargin)
          .withColumn("null_key_refused", lit(nullKeyRefused))
          .withColumn("nulls_block_set", lit(nullsBlockSet))
          .withColumn("null_value_refused", lit(nullValueRefused))
          .withColumn("constraints", lit(defs))
          .orderBy(col("event_type"))
      },
      Some("""WITH base AS (
             |  SELECT event_type, coalesce(value, -1.0) AS value
             |  FROM events
             |  UNION ALL SELECT 'nulled', NULL),
             |agg AS (
             |  SELECT event_type, count(*) AS n, count(value) AS nv,
             |    CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,6)))
             |      AS DOUBLE) AS sum_value
             |  FROM base GROUP BY event_type)
             |SELECT event_type, n, nv, sum_value,
             |  true AS null_key_refused, true AS nulls_block_set,
             |  true AS null_value_refused,
             |  'event_id_not_null=notnull:event_id' AS constraints
             |FROM agg ORDER BY event_type""".stripMargin)),

    // ALTER COLUMN TYPE as a METADATA-ONLY widening: INT -> BIGINT
    // commits one column-mapping artifact (no payload rewrite — the
    // new era gets its own storage name, old batches keep their bytes
    // and CAST at read), a value past INT range then lands through the
    // widened column, MoR UPDATE/DELETE cross the era boundary, and
    // the pre-widen pin serves the era's INT type. The hash carries
    // the post content, the pinned aggregate, and both dtype strings;
    // DuckDB mirrors the DML as CASE-WHEN over the original table.
    Q("q_graft_sql_widen",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_sql_widen").toString
        val e = Tables.events(s, dir).select(
          col("event_id").cast("int").as("event_id"),
          col("user_id"), col("value"))
        TableManifest.commitSnapshot(e, path)
        val pre = TableManifest.versions(s, path).last
        def payloads: Long = {
          val hp = new org.apache.hadoop.fs.Path(path)
          hp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .listStatus(hp)
            .count(_.getPath.getName.startsWith("data_v")).toLong
        }
        val dirsBefore = payloads
        s.sql(
          s"ALTER TABLE graft.`$path` ALTER COLUMN event_id TYPE BIGINT")
        val metadataOnly = payloads == dirsBefore
        s.sql(s"INSERT INTO graft.`$path` VALUES (4294967338, 1, 0.25)")
        s.sql(s"UPDATE graft.`$path` SET value = value * 2 " +
          "WHERE event_id % 7 = 0")
        s.sql(s"DELETE FROM graft.`$path` WHERE event_id % 997 = 0")
        val narrowingRefused =
          try {
            s.sql(s"ALTER TABLE graft.`$path` " +
              "ALTER COLUMN event_id TYPE INT").collect(); false
          } catch { case scala.util.control.NonFatal(_) => true }
        val postT = s.sql(s"SELECT * FROM graft.`$path`")
          .schema("event_id").dataType.catalogString
        val pinT = s.sql(s"SELECT * FROM graft.`$path` VERSION AS OF $pre")
          .schema("event_id").dataType.catalogString
        val post = s.sql(
          s"""SELECT 'post' AS stage, count(*) AS n,
             |  max(event_id) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path`""".stripMargin)
        val pin = s.sql(
          s"""SELECT 'pre_pin' AS stage, count(*) AS n,
             |  CAST(max(event_id) AS BIGINT) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path` VERSION AS OF $pre""".stripMargin)
        val topArm = post.unionByName(pin)
          .withColumn("post_type", lit(postT))
          .withColumn("pin_type", lit(pinT))
          .withColumn("metadata_only", lit(metadataOnly))
          .withColumn("narrowing_refused", lit(narrowingRefused))
        // --- NESTED-FIELD widening: ALTER COLUMN m.cnt TYPE BIGINT
        // rides the same era machinery (the CONTAINER gets the new era
        // storage name typed with the widened struct; the per-era read
        // cast is a struct-to-struct up-cast). Metadata-only, nested
        // DML across the era boundary, era-pinned struct type, nested
        // narrowing refused.
        val path2 = java.nio.file.Files
          .createTempDirectory("graft_sql_widen_nested").toString
        val e2 = Tables.events(s, dir).select(
          col("user_id").as("id"),
          struct(col("event_id").cast("int").as("cnt"),
            col("event_type").as("tag")).as("m"))
        TableManifest.commitSnapshot(e2, path2)
        val pre2 = TableManifest.versions(s, path2).last
        def payloads2: Long = {
          val hp = new org.apache.hadoop.fs.Path(path2)
          hp.getFileSystem(s.sparkContext.hadoopConfiguration)
            .listStatus(hp)
            .count(_.getPath.getName.startsWith("data_v")).toLong
        }
        val dirsBefore2 = payloads2
        s.sql(s"ALTER TABLE graft.`$path2` ALTER COLUMN m.cnt TYPE BIGINT")
        val metadataOnly2 = payloads2 == dirsBefore2
        s.sql(s"INSERT INTO graft.`$path2` VALUES (1, " +
          "named_struct('cnt', CAST(4294967338 AS BIGINT), 'tag', 'wide'))")
        s.sql(s"DELETE FROM graft.`$path2` WHERE m.cnt % 997 = 0")
        val nestedNarrowRefused =
          try {
            s.sql(s"ALTER TABLE graft.`$path2` " +
              "ALTER COLUMN m.cnt TYPE INT").collect(); false
          } catch { case scala.util.control.NonFatal(_) => true }
        val postT2 = s.sql(s"SELECT * FROM graft.`$path2`")
          .schema("m").dataType.catalogString
        val pinT2 = s.sql(
            s"SELECT * FROM graft.`$path2` VERSION AS OF $pre2")
          .schema("m").dataType.catalogString
        val post2 = s.sql(
          s"""SELECT 'nested_post' AS stage, count(*) AS n,
             |  max(m.cnt) AS max_id,
             |  CAST(sum(CAST(m.cnt AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path2`""".stripMargin)
        val pin2 = s.sql(
          s"""SELECT 'nested_pre_pin' AS stage, count(*) AS n,
             |  CAST(max(m.cnt) AS BIGINT) AS max_id,
             |  CAST(sum(CAST(m.cnt AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_v
             |FROM graft.`$path2` VERSION AS OF $pre2""".stripMargin)
        val nestedArm = post2.unionByName(pin2)
          .withColumn("post_type", lit(postT2))
          .withColumn("pin_type", lit(pinT2))
          .withColumn("metadata_only", lit(metadataOnly2))
          .withColumn("narrowing_refused", lit(nestedNarrowRefused))
        topArm.unionByName(nestedArm).orderBy(col("stage"))
      },
      Some("""WITH e AS (SELECT CAST(event_id AS INT) AS event_id,
             |             user_id, value FROM events),
             |post0 AS (
             |  SELECT CAST(event_id AS BIGINT) AS event_id, user_id,
             |    CASE WHEN event_id % 7 = 0 THEN value * 2
             |         ELSE value END AS value
             |  FROM e
             |  UNION ALL SELECT 4294967338, 1, 0.25),
             |post AS (SELECT * FROM post0
             |         WHERE NOT coalesce(event_id % 997 = 0, false)),
             |a0 AS (SELECT 'post' AS stage, count(*) AS n,
             |         max(event_id) AS max_id,
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_v,
             |         'bigint' AS post_type, 'int' AS pin_type
             |       FROM post),
             |a1 AS (SELECT 'pre_pin', count(*),
             |         CAST(max(event_id) AS BIGINT),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
             |         'bigint', 'int'
             |       FROM e),
             |e2 AS (SELECT CAST(event_id AS INT) AS cnt FROM events),
             |npost0 AS (SELECT CAST(cnt AS BIGINT) AS cnt FROM e2
             |           UNION ALL SELECT 4294967338),
             |npost AS (SELECT * FROM npost0
             |          WHERE NOT coalesce(cnt % 997 = 0, false)),
             |b0 AS (SELECT 'nested_post' AS stage, count(*) AS n,
             |         max(cnt) AS max_id,
             |         CAST(sum(CAST(cnt AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_v,
             |         'struct<cnt:bigint,tag:string>' AS post_type,
             |         'struct<cnt:int,tag:string>' AS pin_type
             |       FROM npost),
             |b1 AS (SELECT 'nested_pre_pin', count(*),
             |         CAST(max(cnt) AS BIGINT),
             |         CAST(sum(CAST(cnt AS DECIMAL(18,6))) AS DOUBLE),
             |         'struct<cnt:bigint,tag:string>',
             |         'struct<cnt:int,tag:string>'
             |       FROM e2)
             |SELECT u.*, true AS metadata_only, true AS narrowing_refused
             |FROM (SELECT * FROM a0 UNION ALL SELECT * FROM a1
             |      UNION ALL SELECT * FROM b0 UNION ALL SELECT * FROM b1)
             |  u(stage, n, max_id, sum_v, post_type, pin_type)
             |ORDER BY stage""".stripMargin)),

    // CREATE TABLE ... PARTITIONED BY (c) accepted as CLUSTERING
    // advice: migrated Hive/Delta DDL works on first contact — the
    // clause becomes the table's layout hint, `CALL graft.optimize`
    // (with NO cluster_by argument) clusters + zone-maps on it, and a
    // range probe on the declared column scans FEWER FILES than the
    // unpruned plan (the pruning that directory partitioning was
    // buying, via zone maps instead of a partition contract). The hash
    // carries the pruned probe's content, the recorded hint, and the
    // structural fewer-files proof off the scan metrics.
    Q("q_graft_partitioned_ddl",
      (s, dir) => {
        import graft.operators.TableManifest
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_part_ddl").toString
        s.sql(s"CREATE TABLE graft.`$path` (event_id BIGINT, " +
          "user_id BIGINT, value DOUBLE) PARTITIONED BY (event_id)")
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
          .createOrReplaceTempView("gpd_src")
        s.sql(s"INSERT INTO graft.`$path` " +
          "SELECT * FROM gpd_src WHERE event_id % 2 = 0")
        s.sql(s"INSERT INTO graft.`$path` " +
          "SELECT * FROM gpd_src WHERE event_id % 2 = 1")
        // no cluster_by: the PARTITIONED BY hint drives the clustering
        // and the zone-map refresh
        s.sql(s"CALL graft.optimize(path => '$path', files => 8)")
        val maxId = s.table("gpd_src")
          .agg(max(col("event_id"))).head().getLong(0)
        val (lo, hi) = (maxId / 4, maxId / 2)
        def filesOf(df: org.apache.spark.sql.DataFrame): Long = {
          df.queryExecution.toRdd.count()
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        val fPruned = filesOf(
          TableManifest.readRange(s, path, Seq(("event_id", lo, hi))))
        val fFull = filesOf(TableManifest.read(s, path)
          .filter(col("event_id") >= lo && col("event_id") <= hi))
        val identityArm =
          TableManifest.readRange(s, path, Seq(("event_id", lo, hi)))
            .groupBy((col("user_id") % 10).as("ub"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("arm", lit("identity"))
            .withColumn("hint",
              lit(TableManifest.layoutHint(s, path).mkString(",")))
            .withColumn("pruned_scan", lit(fPruned < fFull))
        // --- days(ts) arm: the Iceberg event-table idiom. The
        // transform translates to clustering advice on ts itself
        // (identity range-clustering is strictly finer than per-day
        // dirs, zone maps prune the same probes), and a TIME-WINDOW
        // readRange (epoch-second bounds on the TIMESTAMP column)
        // must scan fewer files than the unpruned plan.
        val path2 = java.nio.file.Files
          .createTempDirectory("graft_part_ddl_days").toString
        s.sql(s"CREATE TABLE graft.`$path2` (ts TIMESTAMP, " +
          "user_id BIGINT, value DOUBLE) PARTITIONED BY (days(ts))")
        Tables.events(s, dir)
          .select(col("ts"), col("user_id"), col("value"))
          .createOrReplaceTempView("gpd_src_ts")
        s.sql(s"INSERT INTO graft.`$path2` " +
          "SELECT * FROM gpd_src_ts WHERE user_id % 2 = 0")
        s.sql(s"INSERT INTO graft.`$path2` " +
          "SELECT * FROM gpd_src_ts WHERE user_id % 2 = 1")
        s.sql(s"CALL graft.optimize(path => '$path2', files => 8)")
        val eps = s.table("gpd_src_ts")
          .agg(min(unix_timestamp(col("ts"))),
            max(unix_timestamp(col("ts")))).head()
        val (mnE, mxE) = (eps.getLong(0), eps.getLong(1))
        val (tlo, thi) = (mnE + (mxE - mnE) / 4, mnE + (mxE - mnE) / 2)
        val fP2 = filesOf(
          TableManifest.readRange(s, path2, Seq(("ts", tlo, thi))))
        val fF2 = filesOf(TableManifest.read(s, path2)
          .filter(col("ts") >= timestamp_seconds(lit(tlo)) &&
            col("ts") <= timestamp_seconds(lit(thi))))
        val daysArm =
          TableManifest.readRange(s, path2, Seq(("ts", tlo, thi)))
            .groupBy((col("user_id") % 10).as("ub"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("arm", lit("days"))
            .withColumn("hint",
              lit(TableManifest.layoutHint(s, path2).mkString(",")))
            .withColumn("pruned_scan", lit(fP2 < fF2))
        identityArm.unionByName(daysArm)
          .orderBy(col("arm"), col("ub"))
      },
      Some("""WITH m AS (SELECT max(event_id) AS mx FROM events),
             |  t AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS mn,
             |               CAST(floor(epoch(max(ts))) AS BIGINT) AS mx
             |        FROM events),
             |  b AS (SELECT mn + (mx - mn) // 4 AS tlo,
             |               mn + (mx - mn) // 2 AS thi FROM t)
             |SELECT 'identity' AS arm, user_id % 10 AS ub, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  'event_id' AS hint, true AS pruned_scan
             |FROM events, m
             |WHERE event_id >= mx // 4 AND event_id <= mx // 2
             |GROUP BY user_id % 10
             |UNION ALL
             |SELECT 'days' AS arm, user_id % 10 AS ub, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  'ts' AS hint, true AS pruned_scan
             |FROM events, b
             |WHERE epoch(ts) >= tlo AND epoch(ts) <= thi
             |GROUP BY user_id % 10
             |ORDER BY arm, ub""".stripMargin)),

    // The object-store commit seam, driver-gated end-to-end: the whole
    // snapshot → racing appends → DELETE lifecycle runs with
    // spark.graft.commit.store=coordinated AND the JDBC coordinator
    // (Derby embedded standing in for the shared RDBMS a multi-driver
    // S3 deployment points at — the Delta S3DynamoDBLogStore shape as
    // a PRIMARY KEY insert). The hash carries the read-back content
    // plus three structural proofs: the resolved store really is the
    // coordinated one, version history is exactly-once, and the
    // database actually registered the commits (no silent fallback to
    // in-JVM coordination).
    Q("q_graft_commit_coordinated",
      (s, dir) => {
        import graft.operators.{CommitStore, TableManifest}
        val url = "jdbc:derby:memory:gate_commit_coord;create=true"
        // store resolution reads the ACTIVE session's conf (thread-
        // local): pin it here and in every worker thread — the Spark
        // idiom for custom thread pools — so the coordinated settings
        // set on THIS session govern, even under Verify's pooled
        // per-query sessions
        val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
        org.apache.spark.sql.SparkSession.setActiveSession(s)
        s.conf.set("spark.graft.commit.store", "coordinated")
        s.conf.set("spark.graft.commit.coordinator", "jdbc")
        s.conf.set("spark.graft.commit.jdbc.url", url)
        try {
          val path = java.nio.file.Files
            .createTempDirectory("graft_commit_coord").toString
          TableManifest.commitSnapshot(
            Tables.events(s, dir)
              .select(col("event_id"), col("user_id"), col("value")),
            path)
          // two RACING appenders of disjoint literal rows: both must
          // land exactly once through the coordinator (content is
          // order-independent, so the hash is deterministic)
          def rows(ids: Seq[Long]): org.apache.spark.sql.DataFrame = {
            import s.implicits._
            ids.map(i => (i, i % 7, 0.25 * (i % 4 + 1)))
              .toDF("event_id", "user_id", "value")
          }
          val errs = new java.util.concurrent
            .ConcurrentLinkedQueue[Throwable]()
          val appenders = Seq(
            Seq(9000000001L, 9000000002L, 9000000003L, 9000000004L),
            Seq(9000000006L, 9000000007L, 9000000008L, 9000000009L))
            .map(ids => new Thread(() =>
              try {
                org.apache.spark.sql.SparkSession.setActiveSession(s)
                TableManifest.append(rows(ids), path)
              } catch { case t: Throwable => errs.add(t) }))
          appenders.foreach(_.start()); appenders.foreach(_.join())
          if (!errs.isEmpty) throw errs.peek()
          TableManifest.deleteWhere(s, path, "event_id % 5 = 0")
          // structural proofs for the hash
          val hp = new org.apache.hadoop.fs.Path(path)
          val storeName = CommitStore.of(
            hp.getFileSystem(s.sparkContext.hadoopConfiguration),
            new org.apache.hadoop.fs.Path(s"$path/manifest/v0")).name
          val vs = TableManifest.versions(s, path)
          val exactlyOnce = vs == vs.distinct.sorted
          val registered = {
            val c = java.sql.DriverManager.getConnection(url)
            try {
              val rs = c.createStatement().executeQuery(
                "SELECT count(*) FROM GRAFT_COMMITS")
              rs.next()
              rs.getLong(1) >= vs.size
            } finally c.close()
          }
          TableManifest.read(s, path)
            .groupBy((col("user_id") % 10).as("ub"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("store", lit(storeName))
            .withColumn("versions_exactly_once", lit(exactlyOnce))
            .withColumn("jdbc_registered", lit(registered))
            .orderBy(col("ub"))
        } finally {
          s.conf.unset("spark.graft.commit.store")
          s.conf.unset("spark.graft.commit.coordinator")
          s.conf.unset("spark.graft.commit.jdbc.url")
          prevActive match {
            case Some(p) =>
              org.apache.spark.sql.SparkSession.setActiveSession(p)
            case None =>
              org.apache.spark.sql.SparkSession.clearActiveSession()
          }
        }
      },
      Some("""WITH appended(event_id, user_id, value) AS (
             |  SELECT i, i % 7, 0.25 * (i % 4 + 1)
             |  FROM (VALUES (9000000001), (9000000002), (9000000003),
             |               (9000000004), (9000000006), (9000000007),
             |               (9000000008), (9000000009)) v(i)),
             |t AS (SELECT event_id, user_id, value FROM events
             |      UNION ALL SELECT * FROM appended)
             |SELECT user_id % 10 AS ub, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  'coordinated' AS store, true AS versions_exactly_once,
             |  true AS jdbc_registered
             |FROM t
             |WHERE NOT coalesce(event_id % 5 = 0, false)
             |GROUP BY user_id % 10
             |ORDER BY ub""".stripMargin)),

    // The change feed from PLAIN SQL: option("readChangeFeed") on the
    // graft source routes readChanges through both reader surfaces — a
    // `CREATE TEMPORARY VIEW ... USING graft` (the v1 path: SQL-only
    // consumers subscribe with zero library imports) and the DataFrame
    // reader (v2, explicit endingVersion) — with `startingVersion`
    // accepting a NAMED TAG, so the consumer checkpoint is the same
    // vacuum-protected ref the operator surface pins. Window: an append
    // + a MoR DELETE after a tagged baseline; the feed must show the
    // appended rows minus the deleted-within-window ones as inserts and
    // the baseline's deleted rows as deletes. Both surfaces hash
    // identically or the query breaks.
    Q("q_graft_cdf_sql",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_cdf_sql").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
        val maxId = e.agg(max(col("event_id"))).head().getLong(0)
        val (t1, t2) = (maxId / 3, 2 * maxId / 3)
        TableManifest.commitSnapshot(e.filter(col("event_id") <= t1),
          path)
        TableManifest.tag(s, path, "checkpoint")
        TableManifest.append(
          e.filter(col("event_id") > t1 && col("event_id") <= t2), path)
        s.sql(s"DELETE FROM graft.`$path` WHERE event_type = 'error'")
        s.sql(
          s"""CREATE OR REPLACE TEMPORARY VIEW gcdf_view
             |USING graft OPTIONS (
             |  path '$path', readChangeFeed 'true',
             |  startingVersion 'checkpoint')""".stripMargin)
        def agg(df: org.apache.spark.sql.DataFrame, tag: String) =
          df.groupBy(col("_change_type"), col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("surface", lit(tag))
        val cur = TableManifest.versions(s, path).last
        agg(s.table("gcdf_view"), "sql_view")
          .unionByName(agg(s.read.format("graft")
            .option("readChangeFeed", "true")
            .option("startingVersion", "checkpoint")
            .option("endingVersion", cur).load(path), "reader"))
          .select(col("surface"), col("_change_type"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy(col("surface"), col("_change_type"), col("event_type"))
      },
      Some("""WITH e AS (SELECT event_id, event_type, value FROM events),
             |mx AS (SELECT max(event_id) AS m FROM e),
             |ins AS (SELECT * FROM e, mx
             |        WHERE event_id > m // 3 AND event_id <= 2 * m // 3
             |          AND event_type <> 'error'),
             |del AS (SELECT * FROM e, mx
             |        WHERE event_id <= m // 3 AND event_type = 'error'),
             |feed AS (
             |  SELECT 'insert' AS _change_type, event_type,
             |         count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |           AS sum_value
             |  FROM ins GROUP BY event_type
             |  UNION ALL
             |  SELECT 'delete', event_type, count(*),
             |         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |  FROM del GROUP BY event_type)
             |SELECT 'sql_view' AS surface, * FROM feed
             |UNION ALL
             |SELECT 'reader', * FROM feed
             |ORDER BY surface, _change_type, event_type""".stripMargin)),

    // The full operator runbook as plain SQL: an append-log table takes a
    // MoR DELETE, `CALL graft.maintain` folds the log and physically
    // erases the masked rows (refreshing zone maps), `CALL
    // graft.optimize` re-clusters the table — and the final read must
    // still equal the batch replay. One hash over every maintenance
    // mutation the SQL surface can issue: content invariance of
    // fold/optimize and the 3VL-correct delete mask survive together or
    // the hash breaks.
    Q("q_graft_catalog_runbook",
      (s, dir) => {
        import graft.operators.TableManifest
        s.conf.set("spark.sql.catalog.graft",
          "graft.sources.GraftCatalog")
        val path = java.nio.file.Files
          .createTempDirectory("graft_cat_run").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        TableManifest.commitSnapshot(e.filter(col("event_id") % 4 === 0),
          path)
        (1 to 3).foreach(i => TableManifest.append(
          e.filter(col("event_id") % 4 === i), path))
        s.sql(s"DELETE FROM graft.`$path` WHERE user_id = 7")
        s.sql(s"CALL graft.maintain(path => '$path', max_batches => 2, " +
          "max_deletes => 1, stats_cols => 'event_id')")
        s.sql(s"CALL graft.optimize(path => '$path', " +
          "cluster_by => 'event_id', files => 4, stats_cols => 'event_id')")
        s.sql(
          s"""SELECT user_id, count(*) AS n, max(event_id) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM graft.`$path`
             |GROUP BY user_id ORDER BY user_id""".stripMargin)
      },
      Some("""SELECT user_id, count(*) AS n, max(event_id) AS max_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events WHERE NOT coalesce(user_id = 7, false)
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // VERSION AS OF through the reader option: the connector writes both
    // commits itself (overwrite bootstrap, append), then serves the
    // pinned v0 and the current version side by side from
    // option("versionAsOf") — time travel reachable without a library
    // import, both states replayed in one SQL hash.
    Q("q_graft_source_time_travel",
      (s, dir) => {
        import graft.operators.TableManifest
        val path = java.nio.file.Files
          .createTempDirectory("graft_conn_tt").toString
        val e = Tables.events(s, dir)
          .select(col("event_id"), col("user_id"), col("value"))
        e.filter(col("event_id") % 2 === 0)
          .write.format("graft").mode("overwrite").save(path)
        e.filter(col("event_id") % 2 === 1)
          .write.format("graft").mode("append").save(path)
        val v0 = TableManifest.versions(s, path).head
        def state(df: org.apache.spark.sql.DataFrame, name: String) =
          df.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,6)")).cast("double")
                .as("sum_value"))
            .withColumn("stage", lit(name))
        state(s.read.format("graft")
            .option("versionAsOf", v0.toString).load(path), "v0_pinned")
          .unionByName(state(s.read.format("graft").load(path), "current"))
          .select(col("stage"), col("user_id"), col("n"), col("sum_value"))
          .orderBy(col("stage"), col("user_id"))
      },
      Some("""SELECT 'v0_pinned' AS stage, user_id, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value
             |FROM events WHERE event_id % 2 = 0 GROUP BY user_id
             |UNION ALL
             |SELECT 'current', user_id, count(*),
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |FROM events GROUP BY user_id
             |ORDER BY stage, user_id""".stripMargin)),

    // ---- incremental materialized-view maintenance ------------------------
    // The 100 TB rollup discipline: never recompute an aggregate from
    // scratch — keep per-key PARTIALS (count/sum/min/max are all
    // combinable) and fold each new batch in. Here the "standing" rollup
    // (events before Jan 15) and the "delta" batch (after) are aggregated
    // independently and combined; the oracle is the from-scratch
    // aggregate over everything, so the hash match proves the combine
    // algebra exactly. Scale: the standing side is rollup-sized (one row
    // per key), only the delta is scanned per refresh; avg/stddev derive
    // from (n, sum, sum²) the same way.
    Q("q_incremental_rollup",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__c", floor(col("value") * 100).cast("long"))
          .withColumn("__ep", unix_timestamp(col("ts")))
        def partial(f: org.apache.spark.sql.Column) = ev.filter(f)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("__n"), sum(col("__c")).as("__s"),
            min(col("__c")).as("__mn"), max(col("__c")).as("__mx"))
        val split = 1705276800L // 2024-01-15T00:00:00Z
        partial(col("__ep") < split)
          .unionAll(partial(col("__ep") >= split))
          .groupBy(col("user_id"))
          .agg(sum(col("__n")).as("n_events"), sum(col("__s")).as("sum_cents"),
            min(col("__mn")).as("min_cents"), max(col("__mx")).as("max_cents"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             |    AS sum_cents,
             |  min(CAST(floor(value * 100) AS BIGINT)) AS min_cents,
             |  max(CAST(floor(value * 100) AS BIGINT)) AS max_cents
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- deterministic hash-based sampling ------------------------------
    // Multiplicative hash on the key → ~10.3% Bernoulli sample that is
    // reproducible across runs, engines, and cluster sizes (no RNG state,
    // no per-partition seed dependence — the property rand(seed) lacks).
    // Knuth multiplier stays within long range for any realistic id.
    Q("q_hash_sample",
      (s, dir) => Tables.events(s, dir)
        .filter(pmod(col("event_id") * 2654435761L, lit(97)) < 10)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n_sampled,
             |  count(DISTINCT user_id) AS n_users
             |FROM events WHERE (event_id * 2654435761) % 97 < 10
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- recency-weighted trending (exponential decay, integer-exact) ----
    // "What's hot": event counts where each occurrence is worth
    // 2^30 >> age_days — a half-life of one day as pure bit-shift
    // arithmetic (exp(-λt) ranks identically but isn't bit-portable).
    // One scan + one hash aggregate; the max-timestamp anchor is a
    // broadcast scalar.
    Q("q_trending",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__ep", unix_timestamp(col("ts")))
        val mx = ev.agg(max(col("__ep")).as("__mx"))
        ev.crossJoin(broadcast(mx))
          // cap the shift: JVM shifts wrap at 64 (x >> 64 == x) while
          // DuckDB saturates to 0 — ages past 62 days must mean weight 0
          // on BOTH engines
          .withColumn("__age", expr("least((__mx - __ep) div 86400L, 62L)"))
          .withColumn("__w", expr("shiftright(1073741824L, cast(__age AS INT))"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("__w")).as("trend_score"))
          .orderBy(col("trend_score").desc, col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
             |m AS (SELECT max(ep) AS mx FROM e)
             |SELECT event_type, count(*) AS n_events,
             |  CAST(sum(1073741824::BIGINT
             |    >> CAST(least((mx - ep) // 86400, 62) AS INTEGER))
             |    AS BIGINT) AS trend_score
             |FROM e, m GROUP BY event_type
             |ORDER BY trend_score DESC, event_type""".stripMargin)),

    // ---- deterministic weighted sampling without replacement -------------
    // The integer A-ES idiom: every document gets priority
    // hash(id)·1e6 div weight (weight = n_chars, so longer documents are
    // proportionally likelier), and the k smallest priorities win. No RNG
    // state to coordinate — the same k rows come back on any engine,
    // partitioning, or rerun, and appends only perturb the selection at
    // the priority boundary. Scale: priorities are a narrow per-row map
    // and the global top-k is TakeOrderedAndProject (per-partition heaps,
    // k rows to the driver) — never a global sort.
    Q("q_weighted_sample",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("priority",
          expr("pmod(doc_id * 2654435761L, 1000000007L) * 1000000L div n_chars"))
        .select(col("doc_id"), col("n_chars").as("weight"), col("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(25),
      Some("""SELECT doc_id, n_chars AS weight,
             |  (doc_id * 2654435761) % 1000000007 * 1000000 // n_chars AS priority
             |FROM documents
             |ORDER BY priority, doc_id LIMIT 25""".stripMargin)),

    // ---- data profiling: one row of per-column stats per column ---------
    // The standard pre-ingest profiling report (null counts, cardinality,
    // numeric range) as a single scan: per-column aggregates computed
    // together, unpivoted to one row per column.
    Q("q_profile_events",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val total = count(lit(1))
        e.agg(
            total.as("__t"),
            sum(col("user_id").isNull.cast("long")).as("n_user"),
            countDistinct(col("user_id")).as("d_user"),
            sum(col("event_type").isNull.cast("long")).as("n_type"),
            countDistinct(col("event_type")).as("d_type"),
            sum(col("value").isNull.cast("long")).as("n_value"),
            countDistinct(col("value")).as("d_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .selectExpr(
            """stack(3,
              |  'user_id',    __t, n_user,  d_user,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
              |  'event_type', __t, n_type,  d_type,  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
              |  'value',      __t, n_value, d_value, min_value, max_value)
              |AS (column_name, n_rows, n_nulls, n_distinct, min_d, max_d)""".stripMargin)
          .orderBy(col("column_name"))
      },
      Some("""WITH a AS (SELECT count(*) AS t,
             |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
             |  count(DISTINCT user_id) AS d_user,
             |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_type,
             |  count(DISTINCT event_type) AS d_type,
             |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_value,
             |  count(DISTINCT value) AS d_value,
             |  min(value) AS min_value, max(value) AS max_value
             |FROM events)
             |SELECT 'user_id' AS column_name, t AS n_rows, n_user AS n_nulls,
             |       d_user AS n_distinct, CAST(NULL AS DOUBLE) AS min_d,
             |       CAST(NULL AS DOUBLE) AS max_d FROM a
             |UNION ALL
             |SELECT 'event_type', t, n_type, d_type, NULL, NULL FROM a
             |UNION ALL
             |SELECT 'value', t, n_value, d_value, min_value, max_value FROM a
             |ORDER BY column_name""".stripMargin)),

    // ---- correlated scalar subqueries (decorrelated by Catalyst to
    //      joins). Predicate "price > 2 × customer average" evaluated in
    //      integer cents: price·n > 2·sum — exact, no float-avg order
    //      sensitivity.
    Q("q_correlated_scalar",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("__cs_orders")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                |FROM __cs_orders o
                |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
                |      * (SELECT count(*) FROM __cs_orders o2
                |         WHERE o2.o_custkey = o.o_custkey)
                |      > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
                |             FROM __cs_orders o2
                |             WHERE o2.o_custkey = o.o_custkey)
                |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
             |FROM orders o
             |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
             |      * (SELECT count(*) FROM orders o2
             |         WHERE o2.o_custkey = o.o_custkey)
             |      > 2 * (SELECT sum(CAST(round(o2.o_totalprice * 100) AS BIGINT))
             |             FROM orders o2
             |             WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
