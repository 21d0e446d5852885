package graft.queries

import graft.{Q, Tables}
import graft.operators.{BloomPrune, Merge, SaltedJoin}
import org.apache.spark.sql.functions._

/** Warehouse-maintenance data operations: batch merge/upsert, explicit
  * skew-salted joins, CDC changelog apply, and GDPR cascade deletion.
  * All oracle-checked against the semantically-plain SQL form — the
  * operators change the PLAN (partitioning, straggler behavior), never
  * the result.
  */
object DataOpsQueries {

  val all: Seq[Q] = Seq(

    // ---- CDC changelog apply ----------------------------------------------
    // Collapse an insert/update/delete change stream into the current
    // snapshot: events is read as a CDC log keyed by user_id ('error'
    // rows are tombstones, everything else an upsert carrying `value`);
    // a key whose LATEST op is a delete is absent from the snapshot.
    // Shape: ONE map-side-combinable hash aggregate — `max_by` keeps the
    // newest (ts, event_id) change per key, so only one partial row per
    // (key × map task) crosses the shuffle, never the full log. The
    // window/row_number formulation (the oracle) would shuffle and sort
    // every row; at 100 TB of changelog the aggregate form is the only
    // one that survives.
    Q("q_cdc_apply",
      (s, dir) => {
        val log = Tables.events(s, dir)
          .withColumn("__op",
            when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
          .withColumn("__cents", floor(col("value") * 100).cast("long"))
          .withColumn("__ep", unix_timestamp(col("ts")))
        log.groupBy(col("user_id"))
          .agg(
            max_by(struct(col("__op"), col("__cents"), col("__ep")),
              struct(col("ts"), col("event_id"))).as("__last"),
            count(lit(1)).as("n_ops"))
          .filter(col("__last.__op") === "U")
          .select(col("user_id"),
            col("__last.__cents").as("value_cents"),
            col("__last.__ep").as("last_epoch"),
            col("n_ops"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id,
             |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             |    CAST(floor(value * 100) AS BIGINT) AS cents,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS ep,
             |    row_number() OVER (PARTITION BY user_id
             |                       ORDER BY ts DESC, event_id DESC) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n_ops
             |  FROM events)
             |SELECT user_id, cents AS value_cents, ep AS last_epoch, n_ops
             |FROM c WHERE rn = 1 AND op = 'U'
             |ORDER BY user_id""".stripMargin)),

    // ---- GDPR cascade delete audit -----------------------------------------
    // Right-to-be-forgotten: a forget-set of customer keys cascades
    // through orders to lineitem; the audit reports per-table
    // before/deleted/after counts. Shape: the forget-set is tiny by
    // nature (individual erasure requests) → broadcast semi joins against
    // customer and orders; lineitem reaches its deleted set through a
    // key equi-join on o_orderkey (a plain shuffle join at scale — the
    // forgotten-order set grows with the forget-set, so it is NOT
    // broadcast). Nothing scans any table more than once per count.
    Q("q_gdpr_delete",
      (s, dir) => {
        val forget = Tables.customer(s, dir)
          .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
        val ordGone = Tables.orders(s, dir)
          .join(broadcast(forget), col("o_custkey") === col("c_custkey"), "left_semi")
        val liGone = Tables.lineitem(s, dir)
          .join(ordGone.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
        def audit(name: String, total: org.apache.spark.sql.DataFrame,
                  deleted: org.apache.spark.sql.DataFrame) =
          total.agg(count(lit(1)).as("__t"))
            .crossJoin(deleted.agg(count(lit(1)).as("__d")))
            .select(lit(name).as("tbl"), col("__t").as("n_before"),
              col("__d").as("n_deleted"), (col("__t") - col("__d")).as("n_after"))
        audit("customer", Tables.customer(s, dir), forget)
          .unionAll(audit("lineitem", Tables.lineitem(s, dir), liGone))
          .unionAll(audit("orders", Tables.orders(s, dir), ordGone))
          .orderBy(col("tbl"))
      },
      Some("""WITH f  AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
             |fo AS (SELECT o_orderkey FROM orders
             |       WHERE o_custkey IN (SELECT c_custkey FROM f))
             |SELECT 'customer' AS tbl,
             |  (SELECT count(*) FROM customer) AS n_before,
             |  (SELECT count(*) FROM f) AS n_deleted,
             |  (SELECT count(*) FROM customer) - (SELECT count(*) FROM f) AS n_after
             |UNION ALL
             |SELECT 'lineitem',
             |  (SELECT count(*) FROM lineitem),
             |  (SELECT count(*) FROM lineitem
             |   WHERE l_orderkey IN (SELECT o_orderkey FROM fo)),
             |  (SELECT count(*) FROM lineitem)
             |    - (SELECT count(*) FROM lineitem
             |       WHERE l_orderkey IN (SELECT o_orderkey FROM fo))
             |UNION ALL
             |SELECT 'orders',
             |  (SELECT count(*) FROM orders),
             |  (SELECT count(*) FROM fo),
             |  (SELECT count(*) FROM orders) - (SELECT count(*) FROM fo)
             |ORDER BY tbl""".stripMargin)),

    // ---- batch MERGE / SCD1 upsert ---------------------------------------
    // A change set (every 7th order re-priced +100.00) folded into the
    // snapshot via Merge.upsert (left-anti + union: one key shuffle per
    // side, no in-place rewrite). The oracle is the per-row CASE form —
    // same result, different plan; money compared as exact integer cents.
    Q("q_merge_upsert",
      (s, dir) => {
        val base = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .withColumn("was_updated", lit(false))
        val updates = base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100.0)
          .withColumn("was_updated", lit(true))
        Merge.upsert(base, updates, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("price_cents"),
            col("was_updated"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(floor((CASE WHEN o_orderkey % 7 = 0
             |              THEN o_totalprice + 100.0
             |              ELSE o_totalprice END) * 100) AS BIGINT) AS price_cents,
             |  o_orderkey % 7 = 0 AS was_updated
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ---- skew-salted fact-dim join ---------------------------------------
    // events (hot users own outsized row counts) joined to a per-user dim
    // through SaltedJoin: the dim replicates ×16, each event picks a salt
    // from a multiplicative hash of its unique event_id, and a hot user's
    // rows spread over 16 reducer partitions instead of one straggler.
    // The oracle is the plain unsalted join — identical result by
    // construction, which is exactly what the hash compare proves.
    Q("q_skew_salted_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val dim = ev.groupBy(col("user_id")).agg(count(lit(1)).as("u_events"))
        SaltedJoin.join(
            ev.select(col("user_id"), col("event_type"), col("event_id")),
            dim, Seq("user_id"),
            probeSalt = col("event_id") * 2654435761L, salts = 16)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"), sum(col("u_events")).as("sum_u_events"))
          .orderBy(col("event_type"))
      },
      Some("""WITH dim AS (
             |  SELECT user_id, count(*) AS u_events FROM events GROUP BY user_id)
             |SELECT event_type, count(*) AS n_rows,
             |       CAST(sum(u_events) AS BIGINT) AS sum_u_events
             |FROM events e JOIN dim USING (user_id)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- Bloom-pruned semi join ------------------------------------------
    // lineitem restricted to high-value orders via BloomPrune: the
    // build-side key set becomes a broadcast Bloom filter that drops
    // non-matching lineitem rows AT THE SCAN, before any exchange; the
    // exact semi join then only touches survivors. The oracle is the
    // plain IN-subquery semi join — the Bloom filter is result-neutral
    // (false positives are re-checked, false negatives impossible),
    // which is precisely what the hash compare proves.
    Q("q_bloom_join",
      (s, dir) => {
        val highValue = Tables.orders(s, dir)
          .filter(col("o_totalprice") > 400000.0)
        BloomPrune.semiJoin(
            Tables.lineitem(s, dir), "l_orderkey",
            highValue, "o_orderkey", expectedKeys = 4096)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(floor(col("l_quantity") * 100)).as("qty_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_rows,
             |  CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
             |    AS qty_cents
             |FROM lineitem
             |WHERE l_orderkey IN (
             |  SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ---- SCD Type-2 dimension build --------------------------------------
    // Collapse an append-only change log (events as per-user state
    // changes: event_type is "the attribute") into validity intervals:
    // one row per consecutive run of the same state, [valid_from,
    // valid_to) epochs, open-ended current row. Gaps-and-islands via
    // lag → change flag → running sum, then lead() for the interval end.
    // Scale: two windows, both partitioned by the dimension key — per-key
    // state is bounded by that key's history, the corpus shuffles once on
    // user_id and every window reuses that partitioning.
    Q("q_scd2_build",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byTs = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val runs = Tables.events(s, dir)
          .withColumn("__chg",
            when(lag(col("event_type"), 1).over(byTs).isNull ||
              lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L)
              .otherwise(0L))
          .withColumn("version", sum(col("__chg")).over(
            byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("version"))
          .agg(first(col("event_type")).as("state"),
            min(unix_timestamp(col("ts"))).as("valid_from"),
            count(lit(1)).as("n_events"))
        val byVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
        runs
          .withColumn("valid_to", lead(col("valid_from"), 1).over(byVer))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("user_id"), col("version"), col("state"),
            col("valid_from"), col("valid_to"), col("n_events"),
            col("is_current"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH chg AS (
             |  SELECT user_id, event_type, ts, event_id,
             |    CASE WHEN lag(event_type) OVER w IS NULL
             |           OR lag(event_type) OVER w <> event_type
             |         THEN 1 ELSE 0 END AS c
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |runs AS (
             |  SELECT user_id, event_type, ts,
             |    CAST(sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |      AS version
             |  FROM chg),
             |dim AS (
             |  SELECT user_id, version, min(event_type) AS state,
             |    CAST(min(floor(epoch(ts))) AS BIGINT) AS valid_from,
             |    count(*) AS n_events
             |  FROM runs GROUP BY user_id, version)
             |SELECT user_id, version, state, valid_from,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             |    AS valid_to,
             |  n_events,
             |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
             |    IS NULL AS is_current
             |FROM dim ORDER BY user_id, version""".stripMargin)),

    // ---- data-quality constraint audit -------------------------------------
    // The ingest-time expectations check: row rules (not-null, range,
    // domain) fold into ONE scan as conditional sums; key uniqueness and
    // referential integrity contribute one aggregate each. The range rule
    // genuinely fires on this data (one event with value > 400) — the
    // audit is not vacuously green.
    Q("q_dq_checks",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val rows = graft.operators.Quality.rowRules(ev, Seq(
          "user_not_null" -> col("user_id").isNull,
          "value_in_range" -> (col("value") <= 0 || col("value") > 400),
          "known_event_type" -> !col("event_type")
            .isin("click", "error", "purchase", "signup", "view")))
        val uniq = graft.operators.Quality.uniqueKey(
          ev, "event_id_unique", Seq("event_id"))
        val ref = graft.operators.Quality.refIntegrity(
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey", "orders_have_customer")
        rows.unionAll(uniq).unionAll(ref)
          .withColumn("pass", col("n_violations") === 0L)
          .orderBy(col("rule"))
      },
      Some("""SELECT rule, n_violations, n_violations = 0 AS pass FROM (
             |  SELECT 'user_not_null' AS rule,
             |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_violations FROM events
             |  UNION ALL
             |  SELECT 'value_in_range',
             |    CAST(sum(CASE WHEN value <= 0 OR value > 400 THEN 1 ELSE 0 END)
             |      AS BIGINT) FROM events
             |  UNION ALL
             |  SELECT 'known_event_type',
             |    CAST(sum(CASE WHEN event_type NOT IN
             |      ('click','error','purchase','signup','view')
             |      THEN 1 ELSE 0 END) AS BIGINT) FROM events
             |  UNION ALL
             |  SELECT 'event_id_unique',
             |    count(*) - count(DISTINCT event_id) FROM events
             |  UNION ALL
             |  SELECT 'orders_have_customer',
             |    (SELECT count(*) FROM orders o
             |     WHERE o.o_custkey IS NOT NULL
             |       AND o.o_custkey NOT IN (SELECT c_custkey FROM customer))
             |) ORDER BY rule""".stripMargin)),

    // ---- snapshot diff (CDC extraction) ------------------------------------
    // The inverse of q_cdc_apply: given yesterday's and today's snapshots,
    // emit the minimal change feed (I/U/D per key) a downstream consumer
    // replays. Snapshots are per-user rollups of events before/including
    // vs after a split date; the diff is ONE full-outer join on the key
    // with null-side classification — inserts have no old row, deletes no
    // new row, updates differ in payload. Scale: both sides are
    // rollup-sized; the join shuffles each side once on the key and
    // nothing else moves.
    Q("q_snapshot_diff",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("__ep", unix_timestamp(col("ts")))
        // snapshots = per-(user, type) activity rollups over two windows
        // (before Jan 10 vs after Jan 20) — sparse enough that all three
        // op kinds genuinely occur
        def snap(f: org.apache.spark.sql.Column) = ev.filter(f)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val old = snap(col("__ep") < 1704844800L)
          .withColumnRenamed("n", "__no")
        val neu = snap(col("__ep") >= 1705708800L)
          .withColumnRenamed("n", "__nn")
        old.join(neu, Seq("user_id", "event_type"), "full_outer")
          .withColumn("op",
            when(col("__no").isNull, "I")
              .when(col("__nn").isNull, "D")
              .when(col("__no") =!= col("__nn"), "U"))
          .filter(col("op").isNotNull)
          .select(col("user_id"), col("event_type"), col("op"),
            coalesce(col("__nn"), lit(0L)).as("new_n"))
          .orderBy(col("user_id"), col("event_type"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |         CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
             |old AS (
             |  SELECT user_id, event_type, count(*) AS no
             |  FROM e WHERE ep < 1704844800 GROUP BY 1, 2),
             |new AS (
             |  SELECT user_id, event_type, count(*) AS nn
             |  FROM e WHERE ep >= 1705708800 GROUP BY 1, 2),
             |d AS (
             |  SELECT coalesce(old.user_id, new.user_id) AS user_id,
             |    coalesce(old.event_type, new.event_type) AS event_type,
             |    CASE WHEN old.user_id IS NULL THEN 'I'
             |         WHEN new.user_id IS NULL THEN 'D'
             |         WHEN old.no <> new.nn THEN 'U'
             |    END AS op,
             |    coalesce(new.nn, 0) AS new_n
             |  FROM old FULL OUTER JOIN new
             |    ON old.user_id = new.user_id
             |   AND old.event_type = new.event_type)
             |SELECT user_id, event_type, op, new_n
             |FROM d WHERE op IS NOT NULL
             |ORDER BY user_id, event_type""".stripMargin)),

    // ---- record linkage (blocked entity resolution) ------------------------
    // Match a "dirty" feed (every customer name with one digit among the
    // last four cyclically bumped — a deterministic typo both engines can
    // reproduce) back to the master table. All-pairs edit distance is
    // O(N²); the classic fix is multi-index exact blocking: split the
    // varying suffix into two 2-char blocks — one substitution can only
    // corrupt ONE of them (pigeonhole), so the union of the two
    // block-equality joins provably contains every true match. Edit
    // distance verifies candidates only; best match = (min distance,
    // min key). Same (k,L) multi-table trick as the embedding LSH
    // operators, on strings. Scale: two equi-joins on short keys + a
    // candidate-bounded verify — never N².
    Q("q_record_linkage",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
        val dirty = base.select(
          col("c_custkey").as("dirty_id"),
          expr("""concat(
                 |  substring(c_name, 1, CAST(14 + c_custkey % 4 AS INT)),
                 |  char(48 + (ascii(substring(c_name, CAST(15 + c_custkey % 4 AS INT), 1)) - 48 + 1) % 10),
                 |  substring(c_name, CAST(16 + c_custkey % 4 AS INT)))""".stripMargin)
            .as("dirty_name"))
        def block(from: Int) = dirty
          .withColumn("__bk", expr(s"substring(dirty_name, $from, 2)"))
          .join(base.withColumn("__bk", expr(s"substring(c_name, $from, 2)")), Seq("__bk"))
          .select(col("dirty_id"), col("dirty_name"), col("c_custkey"), col("c_name"))
        val cand = block(15).unionAll(block(17)).distinct()
        val wN = Window.partitionBy(col("dirty_id"))
        val wBest = Window.partitionBy(col("dirty_id"))
          .orderBy(col("edit_dist"), col("c_custkey"))
        cand
          .withColumn("edit_dist",
            levenshtein(col("dirty_name"), col("c_name")).cast("long"))
          .withColumn("n_candidates", count(lit(1)).over(wN))
          .filter(col("edit_dist") <= 1)
          .withColumn("__rn", row_number().over(wBest))
          .filter(col("__rn") === 1)
          .select(col("dirty_id"), col("c_custkey").as("matched_custkey"),
            col("edit_dist"), col("n_candidates"))
          .orderBy(col("dirty_id"))
      },
      Some("""WITH dirty AS (
             |  SELECT c_custkey AS dirty_id,
             |    substring(c_name, 1, CAST(14 + c_custkey % 4 AS INT))
             |      || chr(48 + (ascii(substring(c_name,
             |           CAST(15 + c_custkey % 4 AS INT), 1)) - 48 + 1) % 10)
             |      || substring(c_name, CAST(16 + c_custkey % 4 AS INT))
             |      AS dirty_name
             |  FROM customer),
             |cand AS (
             |  SELECT DISTINCT d.dirty_id, d.dirty_name, b.c_custkey, b.c_name
             |  FROM dirty d JOIN customer b
             |    ON substring(d.dirty_name, 15, 2) = substring(b.c_name, 15, 2)
             |  UNION
             |  SELECT DISTINCT d.dirty_id, d.dirty_name, b.c_custkey, b.c_name
             |  FROM dirty d JOIN customer b
             |    ON substring(d.dirty_name, 17, 2) = substring(b.c_name, 17, 2)),
             |scored AS (
             |  SELECT dirty_id, c_custkey,
             |    CAST(levenshtein(dirty_name, c_name) AS BIGINT) AS edit_dist,
             |    count(*) OVER (PARTITION BY dirty_id) AS n_candidates
             |  FROM cand),
             |best AS (
             |  SELECT dirty_id, c_custkey AS matched_custkey, edit_dist,
             |         n_candidates,
             |         row_number() OVER (PARTITION BY dirty_id
             |                            ORDER BY edit_dist, c_custkey) AS rn
             |  FROM scored WHERE edit_dist <= 1)
             |SELECT dirty_id, matched_custkey, edit_dist, n_candidates
             |FROM best WHERE rn = 1 ORDER BY dirty_id""".stripMargin)),

    // ---- Z-order layout: multi-dimensional data skipping ------------------
    // Morton-interleave (user_id low byte, coarse time bucket) into a
    // 16-bit z-value and summarize the 16 z-range "files" the clustered
    // write would produce: each file's min/max span on BOTH dimensions
    // stays narrow simultaneously — the property that lets per-file
    // min/max stats prune scans filtered on either column. A 1-D sort
    // would bound one dimension and leave the other spanning the whole
    // domain. Pure integer shift/mask arithmetic on both engines.
    // ---- Benford's-law leading-digit audit --------------------------------
    // The classic fabricated-numbers screen: naturally-occurring money
    // amounts follow Benford's leading-digit distribution; a synthetic or
    // tampered feed drifts from it. All-integer plan: leading digit via
    // BIGINT-cents string head (bigint formatting is identical across
    // engines — double formatting is NOT), observed share in exact ppm,
    // expected shares as the hardcoded Benford constants (log10 itself
    // is not bit-portable). One hash aggregate to 9 rows + a broadcast
    // total; deviation left to the caller's threshold.
    Q("q_benford_audit",
      (s, dir) => {
        val exp = array((Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)).map(lit): _*)
        val d = Tables.orders(s, dir)
          .select(floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .filter(col("cents") > 0)
          .select(substring(col("cents").cast("string"), 1, 1)
            .cast("int").as("digit"))
        val tot = d.agg(count(lit(1)).as("__n"))
        d.groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            expr("n * 1000000L div __n").as("obs_ppm"),
            element_at(exp, col("digit")).as("exp_ppm"),
            abs(expr("n * 1000000L div __n") - element_at(exp, col("digit")))
              .as("dev_ppm"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(left(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
             |                      AS VARCHAR), 1) AS INT) AS digit
             |  FROM orders WHERE floor(o_totalprice * 100) > 0),
             |t AS (SELECT count(*) AS tn FROM d),
             |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             |        (4, 96910), (5, 79181), (6, 66947), (7, 57992),
             |        (8, 51153), (9, 45757)) v(digit, exp_ppm))
             |SELECT d.digit, count(*) AS n,
             |  count(*) * 1000000 // tn AS obs_ppm,
             |  CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
             |  abs(count(*) * 1000000 // tn - e.exp_ppm) AS dev_ppm
             |FROM d, t JOIN e ON e.digit = d.digit
             |GROUP BY d.digit, tn, e.exp_ppm
             |ORDER BY d.digit""".stripMargin)),

    // ---- corrupt-record quarantine at ingest ------------------------------
    // Real feeds carry malformed rows; at 100 TB an ingest that dies on
    // the first bad record (FAILFAST) or silently drops rows (DROPMALFORMED)
    // is wrong — PERMISSIVE + columnNameOfCorruptRecord quarantines bad
    // rows into a side column in the SAME single pass, no pre-validation
    // scan. The query writes events as JSON lines, plants 5 deterministic
    // MALFORMED lines, reads the mixed directory back schema'd, and
    // proves every planted line is quarantined (_corrupt carries the raw
    // line for replay) while the good rows aggregate exactly — nothing
    // dropped, nothing leaked into the aggregates. (Mis-TYPED fields in
    // well-formed JSON are deliberately not asserted: their PERMISSIVE
    // classification flips with column pruning — corrupt only if the
    // offending field is in the pruned read schema — so any claim about
    // them would encode a plan detail, not a data contract.)
    Q("q_corrupt_records",
      (s, dir) => {
        val path = s"/tmp/graft_corrupt_${math.abs(dir.hashCode)}_" +
          s.sparkContext.applicationId
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("value"))
          .write.mode("overwrite").json(path)
        import s.implicits._
        Seq("{broken", "not json at all", "\"unterminated", "[1,2,", "}{")
          .toDF("value").coalesce(1).write.mode("append").text(path)
        s.read
          .schema("event_id LONG, event_type STRING, value DOUBLE, _corrupt STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path)
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
            sum(when(col("_corrupt").isNull && col("event_id").isNull, 1L)
              .otherwise(0L)).as("n_good_null_id"),
            sum(when(col("_corrupt").isNull, col("value").cast("decimal(18,6)")))
              .cast("double").as("sum_value_good"))
      },
      Some("""SELECT count(*) + 5 AS n_total, CAST(5 AS BIGINT) AS n_corrupt,
             |  CAST(0 AS BIGINT) AS n_good_null_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value_good
             |FROM events""".stripMargin)),

    Q("q_zorder_layout",
      (s, dir) => {
        val xb = pmod(col("user_id"), lit(256L))
        val yb = pmod(expr("unix_timestamp(ts) div 10000L"), lit(256L))
        Tables.events(s, dir)
          .withColumn("__x", xb).withColumn("__y", yb)
          .withColumn("__z", graft.operators.ZOrder.interleave(
            col("__x"), col("__y"), bits = 8))
          .withColumn("file_id", expr("__z div 4096L"))
          .groupBy(col("file_id"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("__x")).as("min_user"), max(col("__x")).as("max_user"),
            min(col("__y")).as("min_tb"), max(col("__y")).as("max_tb"),
            min(col("__z")).as("min_z"), max(col("__z")).as("max_z"))
          .orderBy(col("file_id"))
      },
      Some {
        val z = (0 until 8).flatMap(b => Seq(
          s"(((x >> $b) & 1) << ${2 * b})",
          s"(((y >> $b) & 1) << ${2 * b + 1})")).mkString(" | ")
        s"""WITH d AS (
           |  SELECT user_id % 256 AS x,
           |         (CAST(floor(epoch(ts)) AS BIGINT) // 10000) % 256 AS y
           |  FROM events),
           |z AS (SELECT x, y, $z AS zv FROM d)
           |SELECT zv // 4096 AS file_id, count(*) AS n_rows,
           |  min(x) AS min_user, max(x) AS max_user,
           |  min(y) AS min_tb, max(y) AS max_tb,
           |  min(zv) AS min_z, max(zv) AS max_z
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    // N-way Z-order: optimize clusters on THREE columns (the Iceberg
    // `ZORDER BY (a, b, c)` shape generalized past the 2-axis Morton
    // code) and a range probe on EACH axis reads FEWER FILES than the
    // unpruned plan — per-file min/max bounds hold on every clustered
    // dimension at once. The hash carries the probe's content plus the
    // three structural pruning proofs off the scan metrics.
    Q("q_zorder3_pruning",
      (s, dir) => {
        import graft.operators.TableManifest
        import org.apache.spark.sql.execution.FileSourceScanExec
        import org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec
        val path = java.nio.file.Files
          .createTempDirectory("graft_zorder3").toString
        val e = Tables.events(s, dir).select(
          col("user_id"), col("event_id"), col("value"),
          unix_timestamp(col("ts")).as("ts_epoch"))
        TableManifest.commitSnapshot(e, path)
        val dims = Seq("user_id", "ts_epoch", "event_id")
        TableManifest.optimize(s, path, dims, files = 16,
          statsCols = dims)
        def filesOf(df: org.apache.spark.sql.DataFrame): Long = {
          df.queryExecution.toRdd.count()
          val plan = df.queryExecution.executedPlan
          (plan +: plan.collect { case a: AdaptiveSparkPlanExec =>
            a.executedPlan })
            .flatMap(_.collect { case f: FileSourceScanExec => f })
            .map(_.metrics("numFiles").value).sum
        }
        val b = e.agg(
          min(col("user_id")), max(col("user_id")),
          min(col("ts_epoch")), max(col("ts_epoch")),
          min(col("event_id")), max(col("event_id"))).head()
        def window(i: Int): (Long, Long) = {
          val (mn, mx) = (b.getLong(2 * i), b.getLong(2 * i + 1))
          (mn + (mx - mn) / 4, mn + (mx - mn) / 2)
        }
        val pruned = dims.zipWithIndex.map { case (c, i) =>
          val (lo, hi) = window(i)
          val fP = filesOf(
            TableManifest.readRange(s, path, Seq((c, lo, hi))))
          val fF = filesOf(TableManifest.read(s, path)
            .filter(col(c) >= lo && col(c) <= hi))
          fP < fF
        }
        val (elo, ehi) = window(2)
        TableManifest.readRange(s, path, Seq(("event_id", elo, ehi)))
          .groupBy((col("user_id") % 8).as("ub"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double")
              .as("sum_value"))
          .withColumn("pruned_user", lit(pruned(0)))
          .withColumn("pruned_ts", lit(pruned(1)))
          .withColumn("pruned_event", lit(pruned(2)))
          .orderBy(col("ub"))
      },
      Some("""WITH b AS (SELECT min(event_id) AS mn, max(event_id) AS mx
             |           FROM events),
             |w AS (SELECT mn + (mx - mn) // 4 AS lo,
             |             mn + (mx - mn) // 2 AS hi FROM b)
             |SELECT user_id % 8 AS ub, count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             |    AS sum_value,
             |  true AS pruned_user, true AS pruned_ts,
             |  true AS pruned_event
             |FROM events, w
             |WHERE event_id >= lo AND event_id <= hi
             |GROUP BY user_id % 8
             |ORDER BY ub""".stripMargin))
  )
}
