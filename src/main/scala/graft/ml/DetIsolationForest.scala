package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic-split isolation forest — the oracle-checkable sibling of
  * [[IsolationForest]] (reference capability: pyod IForest scoring,
  * models/best_anomaly_detector_v18.pkl; SURVEY.md §2.9 M5).
  *
  * The classic Liu/Ting/Zhou forest draws split features and thresholds
  * from a PRNG and from the per-node SAMPLE min/max, which makes the tree
  * structure data-recursive — impossible to mirror in a SQL oracle
  * (recursive CTEs cannot aggregate per node). This variant keeps the
  * isolation-forest MATH (random axis-parallel cuts; a row's anomaly score
  * is how shallowly it isolates, with a multiplicity adjustment for
  * unresolved leaves) but derives every split deterministically:
  *
  *  - split feature and threshold fraction at tree `t`, depth `d`, node
  *    `nid` come from the portable integer hash
  *    `(t·a1 + d·a2 + nid·a3 + c) mod 1000003` (the
  *    [[graft.functions.SignBucketExpr]] weight construction), and
  *  - the threshold interpolates the NODE's current interval
  *    `[lo_f, hi_f]`, which starts at the global feature min/max and
  *    narrows along the path — a function of the path alone, so every row
  *    can replay its own walk independently: no per-node recursion, one
  *    codegen'd walk expression per (row, tree).
  *
  * Scoring is integer-exact end to end so the DuckDB mirror hash-matches
  * bit for bit: per (row, tree) the contribution is
  * `isoDepth·1e6 + floor((leafCnt−1)·2e6 / leafCnt)` where `isoDepth` is
  * the first depth at which the row's node holds exactly one row (else
  * `maxDepth`) and `leafCnt` the terminal occupancy. The leaf adjustment is
  * a RATIONAL surrogate for the paper's `c(n) = 2(ln(n−1)+γ) − 2(n−1)/n`
  * (monotone in `n`, bounded by 2) — chosen over `ln` because JVM
  * `Math.log` and libm are not guaranteed to round identically, and one
  * flipped ulp would break the hash gate. Lower score = more anomalous.
  *
  * Scale shape: the walk is one whole-stage-codegen expression over an
  * `nTrees`-way explode (no UDF); occupancy tables are ≤ nTrees·2^d rows
  * per depth and broadcast back, so the corpus never shuffles. At 100 TB
  * the only multiplier is the explode (nTrees ≈ 8), each exploded row a
  * handful of longs.
  */
object DetIsolationForest {

  val Mod = 1000003L
  // h1 → split-feature pick; h2 → threshold fraction. Distinct constant
  // orderings decorrelate the two streams.
  val A1 = 1315423911L; val A2 = 2654435761L; val A3 = 97531L; val C1 = 17L
  val B1 = 2654435761L; val B2 = 97531L; val B3 = 1315423911L; val C2 = 7919L

  /** Per-(row, tree) terminal node id after `maxDepth` deterministic
    * splits: columns `idCols… , t, nid`. The walk itself is one native
    * codegen'd expression ([[graft.functions.DetIForestLeafExpr]] — a
    * Column unrolling of depth·features projections blew up the optimizer);
    * global min/max arrive via a 1-row broadcast cross join, so the plan is
    * scan → explode → project at any depth. */
  def leafPaths(df: DataFrame, idCols: Seq[String], featCols: Seq[String],
      nTrees: Int, maxDepth: Int): DataFrame = {
    require(nTrees >= 1 && nTrees <= 64, s"nTrees in [1,64], got $nTrees")
    require(maxDepth >= 1 && maxDepth <= 16, s"maxDepth in [1,16], got $maxDepth")
    val nf = featCols.size
    val aggs = featCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c).cast("double")).as(s"__gmin$i"),
        max(col(c).cast("double")).as(s"__gmax$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)

    df.select(idCols.map(col) ++ featCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"__x$i")
      }: _*)
      .crossJoin(broadcast(stats))
      .withColumn("t", explode(array((0 until nTrees).map(i => lit(i.toLong)): _*)))
      .withColumn("nid", graft.functions.DetIForestLeafExpr(
        array((0 until nf).map(i => col(s"__x$i")): _*),
        array((0 until nf).map(i => col(s"__gmin$i")): _*),
        array((0 until nf).map(i => col(s"__gmax$i")): _*),
        col("t"), maxDepth))
      .select(idCols.map(col) :+ col("t") :+ col("nid"): _*)
  }

  /** Un-materialized scoring plan — exposed so specs can assert the
    * physical shape (broadcast occupancy joins, no sort-merge) BEFORE the
    * lineage-cutting checkpoint hides it. */
  private[graft] def scorePlan(leaf: DataFrame, idCols: Seq[String],
      nTrees: Int, maxDepth: Int): DataFrame = {
    var joined = leaf
    for (d <- 1 to maxDepth) {
      val c = leaf
        .select(col("t").as("__ct"), shiftright(col("nid"), maxDepth - d).as("__p"))
        .groupBy("__ct", "__p").agg(count(lit(1)).as(s"__c$d"))
      joined = joined
        .join(broadcast(c),
          col("t") === col("__ct") &&
            shiftright(col("nid"), maxDepth - d) === col("__p"))
        .drop("__ct", "__p")
    }
    // first depth whose node holds exactly this row; deeper counts can only
    // shrink, so an early 1 implies __c{maxDepth} == 1 (adjustment → 0)
    val iso = (1 to maxDepth).foldRight(lit(maxDepth.toLong)) { (d, els) =>
      when(col(s"__c$d") === 1, lit(d.toLong)).otherwise(els)
    }
    val cD = col(s"__c$maxDepth")
    joined
      .withColumn("__contrib",
        iso * lit(1000000L) +
          floor((cD - lit(1L)) * lit(2000000L) / cD).cast("long"))
      .groupBy(idCols.map(col): _*)
      .agg(sum(col("__contrib")).as("iso_score"))
  }

  /** Score every row: `idCols… , iso_score` (BIGINT; LOWER = more
    * anomalous — shallow isolation and sparse leaves shrink the sum). */
  def score(df: DataFrame, idCols: Seq[String], featCols: Seq[String],
      nTrees: Int = 8, maxDepth: Int = 8): DataFrame = {
    val leaf = leafPaths(df, idCols, featCols, nTrees, maxDepth).cache()
    val out = scorePlan(leaf, idCols, nTrees, maxDepth).localCheckpoint(true)
    leaf.unpersist()
    out
  }

  /** DuckDB mirror of `score` + top-`limit` ascending: the same unrolled
    * walk (one CTE per depth, identical op tree — every `%`, CASE pick,
    * `lo + u·(hi−lo)` interpolation and `>>` prefix matches the Column
    * code above), the same per-depth occupancy joins, the same
    * integer-exact contribution. `featSql(i)` must evaluate to DOUBLE on
    * the oracle side exactly as `featCols(i)` does on the Spark side. */
  def oracleSql(table: String, idCols: Seq[String], featSql: Seq[String],
      nTrees: Int = 8, maxDepth: Int = 8, limit: Int = 100): String = {
    val nf = featSql.size
    val ids = idCols.mkString(", ")
    val xs = (0 until nf).map(i => s"x$i").mkString(", ")
    val statsSel = featSql.zipWithIndex.map { case (f, i) =>
      s"min(CAST($f AS DOUBLE)) AS gmin$i, max(CAST($f AS DOUBLE)) AS gmax$i"
    }.mkString(",\n         ")
    val baseSel = featSql.zipWithIndex.map { case (f, i) =>
      s"CAST($f AS DOUBLE) AS x$i"
    }.mkString(", ")
    val l0Init = (0 until nf).map(i =>
      s"gmin$i AS lo$i, gmax$i AS hi$i").mkString(", ")
    def casePick(pre: String): String =
      "CASE " + (0 until nf).map(i => s"WHEN f = $i THEN $pre$i").mkString(" ") + " END"
    val levels = (0 until maxDepth).map { d =>
      val updates = (0 until nf).map { i =>
        s"""CASE WHEN f = $i AND b = 1 THEN thr ELSE lo$i END AS lo$i,
           |         CASE WHEN f = $i AND b = 0 THEN thr ELSE hi$i END AS hi$i""".stripMargin
      }.mkString(",\n         ")
      s"""l${d + 1} AS (
         |  SELECT $ids, $xs, t, nid * 2 + b AS nid,
         |         $updates
         |  FROM (
         |    SELECT *, CASE WHEN xsel >= thr THEN 1 ELSE 0 END AS b
         |    FROM (
         |      SELECT *, losel + u * (hisel - losel) AS thr
         |      FROM (
         |        SELECT *, ${casePick("lo")} AS losel,
         |               ${casePick("hi")} AS hisel,
         |               ${casePick("x")} AS xsel
         |        FROM (
         |          SELECT *,
         |            (((t * $A1 + $d * $A2 + nid * $A3 + $C1) % $Mod) % $nf) AS f,
         |            ((t * $B1 + $d * $B2 + nid * $B3 + $C2) % $Mod)::DOUBLE / $Mod.0 AS u
         |          FROM l$d) s1) s2) s3) s4)""".stripMargin
    }.mkString(",\n")
    val cnts = (1 to maxDepth).map { d =>
      s"""cnt$d AS (SELECT t AS ct$d, nid >> ${maxDepth - d} AS p$d, count(*) AS c$d
         |  FROM l$maxDepth GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val joins = (1 to maxDepth).map { d =>
      s"JOIN cnt$d ON l$maxDepth.t = ct$d AND (l$maxDepth.nid >> ${maxDepth - d}) = p$d"
    }.mkString("\n    ")
    val isoCase = "CASE " + (1 to maxDepth).map(d =>
      s"WHEN c$d = 1 THEN $d").mkString(" ") + s" ELSE $maxDepth END"
    s"""WITH g AS (
       |  SELECT $statsSel
       |  FROM $table),
       |l0 AS (
       |  SELECT $ids, $baseSel, tr.t AS t, 0::BIGINT AS nid, $l0Init
       |  FROM $table CROSS JOIN g CROSS JOIN range(0, $nTrees) tr(t)),
       |$levels,
       |$cnts,
       |scored AS (
       |  SELECT $ids,
       |         ($isoCase)::BIGINT * 1000000
       |         + CAST(floor((c$maxDepth - 1) * 2000000 / c$maxDepth) AS BIGINT) AS contrib
       |  FROM l$maxDepth
       |    $joins)
       |SELECT $ids, CAST(sum(contrib) AS BIGINT) AS iso_score
       |FROM scored GROUP BY $ids
       |ORDER BY iso_score, ${idCols.head} LIMIT $limit""".stripMargin
  }
}
