package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection: shingle → minhash signature →
  * band → bucket-join. The classic Broder scheme, shaped for Spark scale:
  *
  *   1. one narrow pass computes the k-perm signature per doc (no shuffle);
  *   2. docs explode to `bands` rows keyed by (band, hash of the band's
  *      signature slice) — a shuffle of b×|docs| SMALL rows (id + 16 bytes),
  *      never the documents themselves;
  *   3. an equi-join on the bucket key yields candidate pairs — skew-safe
  *      because a bucket only collects true near-dups plus rare collisions;
  *   4. candidates re-join the signature table to estimate Jaccard as
  *      matching-perms/k; pairs under `minEst` are dropped.
  *
  * At 100 TB the only wide ops are the bucket-key shuffle (tiny rows) and
  * the two signature joins (pre-filtered to candidates). No N² anywhere.
  *
  * Estimated similarity is exact integer ppm (matching·1e6/k with k | 1e6),
  * so results are engine-portable for the DuckDB oracle.
  */
object MinHashLSH {

  /** @param df       input
    * @param idCol    unique doc id (orderable)
    * @param textCol  text column to shingle
    * @param k        permutations (must divide 1e6 for exact ppm)
    * @param bands    LSH bands (k % bands == 0); rows-per-band = k/bands
    * @param minEstPpm drop candidate pairs with estimated Jaccard below this
    * @param shingleFn custom shingle hasher for scale variants (e.g.
    *   `c => Text.shingleHashesWith(c, 3, Text.fastHash)`); null (the
    *   default) selects the fused native signature path
    * @return (id_a, id_b, est_ppm) with id_a < id_b
    */
  def candidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 64,
      bands: Int = 16,
      minEstPpm: Long = 500000L,
      shingleFn: Column => Column = null,
      unicodeNormalize: Boolean = false): DataFrame = {
    val (out, sig) =
      candidatePairsPlan(df, idCol, textCol, k, bands, minEstPpm, shingleFn,
        unicodeNormalize)
    // Bound the signature cache's lifetime to this call: materialize the
    // (tiny) pair set eagerly — all three sig consumers run in this one
    // job — then release the cache. The checkpoint blocks are cleaned by
    // the ContextCleaner when the result is dropped, unlike .cache()
    // entries which live for the session.
    val materialized = out.localCheckpoint(true)
    sig.unpersist()
    materialized
  }

  /** The un-materialized pair plan + its cached signature table —
    * package-visible so PlanShapeSpec can assert the banded equi-join
    * shape BEFORE the lineage-cutting localCheckpoint erases it from the
    * executed plan. Callers outside tests use [[candidatePairs]]. */
  private[graft] def candidatePairsPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      bands: Int,
      minEstPpm: Long,
      shingleFn: Column => Column,
      unicodeNormalize: Boolean = false): (DataFrame, DataFrame) = {
    require(k % bands == 0 && 1000000 % k == 0)
    require(!(unicodeNormalize && shingleFn != null),
      "unicodeNormalize fuses tokenization into the native signature " +
        "expression — a custom shingleFn supplies its own tokenization")
    val r = k / bands

    // Signature computation, two paths (bit-identical — spec-proven):
    //  - default: ONE fused native expression (MinHashSigExpr) computes
    //    the whole k-perm signature per row — a narrow pass with NO
    //    shuffle; docs with no shingles yield empty arrays and are
    //    dropped, matching the explode form which emitted no rows.
    //  - custom shingleFn: explode + k codegen'd min() aggregates with
    //    map-side partials (a k-wide Column array expression would hit
    //    CollapseProject's per-branch re-inlining, a measured 30×+
    //    regression; the inner pmod folds full-range 64-bit hashes
    //    (fastHash) into [0, P) so the ANSI multiply cannot overflow).
    // The signature table (id + k longs, tiny relative to the corpus) is
    // cached because the bucket self-join and the estimation join both
    // consume it; lifetime bounded below via localCheckpoint+unpersist.
    val sig = (if (shingleFn == null) {
      // unicodeNormalize fuses lowercase + \p{L}\p{N} tokenization into
      // the signature pass (UnicodeMinHashSigExpr ≡ MinHashSigExpr over
      // Text.normalizeForDedup, property-proven) — no normalized copy of
      // the text ever materializes
      val sigExpr =
        if (unicodeNormalize)
          graft.functions.UnicodeMinHashSigExpr(col(textCol), k, 3)
        else graft.functions.MinHashSigExpr(col(textCol), k, 3)
      df.select(col(idCol).as("__id"), sigExpr.as("__sig"))
        .filter(size(col("__sig")) > 0)
    } else {
      df.select(col(idCol).as("__id"),
          explode(shingleFn(col(textCol))).as("__h"))
        .groupBy(col("__id"))
        .agg(array((0 until k).map(i =>
          min(pmod(pmod(col("__h"), lit(Text.P)) * (2 * i + 3) + 7 * i + 1,
            lit(Text.P)))): _*).as("__sig"))
    }).cache()

    val buckets = sig
      .select(col("__id"), col("__sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bkey",
        md5(concat_ws(",", transform(
          slice(col("__sig"), col("__band") * r + 1, lit(r)),
          x => x.cast("string")))))
      .select(col("__id"), col("__band"), col("__bkey"))

    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__bkey") === col("b.__bkey") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()

    val withEst = cand
      .join(sig.withColumnRenamed("__id", "id_a").withColumnRenamed("__sig", "__sa"), "id_a")
      .join(sig.withColumnRenamed("__id", "id_b").withColumnRenamed("__sig", "__sb"), "id_b")
      .withColumn("__match",
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y), b => b)))
      // multiply BEFORE the integer division: (1000000/k) truncates when
      // k doesn't divide 1e6 (k=48 would cap estimates at 999984 ppm and
      // shift the minEstPpm threshold); this form is exact for every k
      .withColumn("est_ppm", expr(s"cast(__match AS bigint) * 1000000 div $k"))

    val out = withEst
      .filter(col("est_ppm") >= minEstPpm)
      .select(col("id_a"), col("id_b"), col("est_ppm"))
    (out, sig)
  }

  /** Exact n-gram Jaccard pairs ≥ threshold via distinct-shingle explode +
    * equi-join on shingle hash. Exact counterpart to [[candidatePairs]];
    * integer-ppm arithmetic throughout. The shingle join is the wide op —
    * fine when shingles are near-unique (natural text), skew-prone on
    * degenerate corpora (use candidatePairs there). */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccardPpm: Long = 500000L): DataFrame = {
    val sh = df
      .select(col(idCol).as("__id"),
        explode(Text.shingleHashes(col(textCol))).as("__h"))
      .cache() // consumed three times: both join sides + set sizes
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))

    val out = sh.as("a").join(sh.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__inter"))
      .join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("__n", "__na"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("__n", "__nb"), "id_b")
      .withColumn("jaccard_ppm",
        expr("__inter * 1000000L div (__na + __nb - __inter)"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("id_a"), col("id_b"), col("jaccard_ppm"))

    // same cache-lifetime bounding as candidatePairs
    val materialized = out.localCheckpoint(true)
    sh.unpersist()
    materialized
  }

  /** [[jaccardPairs]] restricted to pairs with AT LEAST ONE endpoint in
    * `probeIds` — the ingest-fold shape: instead of the full shingle
    * self-join (Σ_h df(h)² work, re-paying the standing corpus every
    * batch) the PROBE docs' shingles probe the corpus
    * (Σ_h df_probe(h)·df(h)), exactly the asymmetric rule the streaming
    * phash/minhash/audio dedup paths already follow. Output is
    * bit-identical to `jaccardPairs(df).where(id_a ∈ probe ∨ id_b ∈
    * probe)` (gate-proven): two directed probe joins cover both
    * orientations, with the probe-probe overlap excluded from the
    * second, so every qualifying pair is counted exactly once. */
  def jaccardPairsTouching(
      df: DataFrame,
      idCol: String,
      textCol: String,
      probeIds: DataFrame,
      minJaccardPpm: Long = 500000L): DataFrame = {
    val sh = df
      .select(col(idCol).as("__id"),
        explode(Text.shingleHashes(col(textCol))).as("__h"))
      .cache() // consumed four times: two directed joins + sizes
    val pid = probeIds
      .select(col(probeIds.columns.head).cast("long").as("__pid"))
    val shP = sh.join(pid, col("__id") === col("__pid"), "left_semi")
    val shNonP = sh.join(pid, col("__id") === col("__pid"), "left_anti")
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    // probe-smaller orientation (covers probe-probe pairs once) plus
    // probe-larger-vs-NON-probe (the anti-join side keeps probe-probe
    // pairs from being joined a second time in the other orientation)
    val j1 = shP.as("a").join(sh.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
    val j2 = shP.as("a").join(shNonP.as("b"),
        col("a.__h") === col("b.__h") && col("a.__id") > col("b.__id"))
      .select(col("b.__id").as("id_a"), col("a.__id").as("id_b"))
    val out = j1.unionByName(j2)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__inter"))
      .join(sizes.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__n", "__na"), "id_a")
      .join(sizes.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__n", "__nb"), "id_b")
      .withColumn("jaccard_ppm",
        expr("__inter * 1000000L div (__na + __nb - __inter)"))
      .filter(col("jaccard_ppm") >= minJaccardPpm)
      .select(col("id_a"), col("id_b"), col("jaccard_ppm"))
    val materialized = out.localCheckpoint(true)
    sh.unpersist()
    materialized
  }

  /** SimHash near-dup pairs via banded LSH — the scale-safe form of the
    * hamming-distance self-join. The `bits`-bit simhash is split into
    * ceil(bits/bandBits) bands; recall is EXACTLY 1.0 at any legal
    * config, same mechanism as [[hammingBandPairs]]: with s =
    * ⌊maxHamming/bands⌋, some band of a qualifying pair sits at band
    * distance ≤ s, and the probe side enumerates every key within s
    * flips ([[flipMasks]] — multi-index hashing), so the output is
    * bit-identical to the quadratic form; s = 0 (maxHamming < bands) is
    * the plain exact-key join. `bandBits = 0` (the default) derives the
    * width from count(*) via [[simhashBandBitsFor]]. Cost: one shuffle
    * of bands×N tiny reference rows (+ the probe expansion) and
    * Σ bucket² work inside 2^bandBits-wide buckets — no cross join
    * anywhere.
    *
    * @param sh       (id, simhash) input — simhash a long of `bits` bits
    * @param probePred optional extra predicate on the probe (smaller-id)
    *                  side's id, e.g. sampling — applied to the LEFT of the
    *                  join, before the shuffle
    */
  def simhashBandPairs(
      sh: DataFrame,
      idCol: String,
      shCol: String,
      maxHamming: Int,
      bits: Int = 30,
      bandBits: Int = 0,
      probePred: Column => Column = _ => lit(true),
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val b =
      if (bandBits > 0) bandBits
      else simhashBandBitsFor(sh.count(), bits, maxHamming)
    val bandCount = (bits + b - 1) / b
    val s = maxHamming / bandCount
    val mask = (1L << b) - 1
    def banded(flips: Seq[Long]): DataFrame = {
      val base = sh.select(
          col(idCol).as("__id"), col(shCol).as("__sh"),
          explode(sequence(lit(0), lit(bandCount - 1))).as("__band"))
        .withColumn("__key0",
          expr(s"shiftright(__sh, __band * $b)").bitwiseAND(lit(mask)))
      val keyed =
        if (flips == Seq(0L)) base.withColumn("__key", col("__key0"))
        else base.withColumn("__key",
          explode(array(flips.map(m => col("__key0").bitwiseXOR(lit(m))): _*)))
      keyed.select(col("__id"), col("__sh"), col("__band"), col("__key"))
    }
    // same partitioning rule as hammingBandPairs: without a (band, key)
    // repartition the explode inherits the scan's (often single-file,
    // single-task) partitioning and the whole Σ bucket² evaluation
    // serializes on one core. With maxBucket, hot buckets additionally
    // tile (see [[tileHot]] — exact output, no straggler task).
    //
    // top band may be narrower than b (bits not a multiple): flips of
    // its phantom high bits produce keys no exact key carries — wasted
    // probe rows, never wrong pairs; pigeonhole still holds because the
    // real differing bits are always within the enumerated positions
    val exactRaw = banded(Seq(0L))
    val probeRaw = if (s == 0) exactRaw else banded(flipMasks(b, s))
    val (probe, exact, tileCond) =
      if (maxBucket == Int.MaxValue)
        (probeRaw.repartition(col("__band"), col("__key")),
          exactRaw.repartition(col("__band"), col("__key")),
          lit(true))
      else {
        val hot = exactRaw.groupBy(col("__band"), col("__key"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucket)
        (tileHot(probeRaw, hot, maxBucket, probeSide = true),
          tileHot(exactRaw, hot, maxBucket, probeSide = false),
          col("a.__tile") === col("b.__tile"))
      }

    probe.as("a").filter(probePred(col("a.__id")))
      .join(exact.as("b"),
        col("a.__band") === col("b.__band") &&
          col("a.__key") === col("b.__key") && tileCond &&
          col("a.__id") < col("b.__id") &&
          bit_count(col("a.__sh").bitwiseXOR(col("b.__sh"))) <= maxHamming)
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        bit_count(col("a.__sh").bitwiseXOR(col("b.__sh"))).cast("long").as("hamming"))
      .distinct()
  }

  /** [[bandBitsFor]] for a single-long `bits`-wide simhash: same measured
    * cost model over widths sensible for a ≤32-bit hash (bandCount =
    * ⌈bits/b⌉ — no divisibility requirement; a narrower top band only
    * wastes a few probe rows, see [[simhashBandPairs]]). */
  def simhashBandBitsFor(n: Long, bits: Int, maxHamming: Int): Int =
    bestBandBits(n, bits, maxHamming,
      Seq(4, 6, 10, 15).filter(_ <= bits))

  /** Band width for the two-half 64-bit Hamming join, derived from corpus
    * size — the [[graft.operators.Knn.planesFor]] pattern applied to
    * dedup, so the SHIPPED DEFAULT is never quadratic past the scale it
    * was tuned at. Picks bandBits ∈ {4, 8, 16} minimizing the estimated
    * join cost
    *
    *   SHUFFLE_WEIGHT · n·bands·probes  +  n²·bands·probes / 2^bandBits
    *
    * where `bands = 64/bandBits`, `probesPerBand = Σ_{k≤s} C(bandBits,k)`
    * is the probe-side key-enumeration factor at sub-radius
    * `s = ⌊maxHamming/bands⌋`, the first term is the shuffled-probe-row
    * (linear) cost and the second the in-bucket candidate-check
    * (quadratic) cost at expected bucket width n/2^bandBits.
    * SHUFFLE_WEIGHT = 128 is MEASURED, not guessed (SCALE.md, `Stress
    * phashauto` at 100k items): emitting one (band,key) probe row through
    * explode+exchange costs ~two orders of magnitude more than one
    * codegen'd in-bucket popcount check — an unweighted model picks
    * 16-bit bands with 697-key enumeration at 100k and measures 214 s
    * where weighted 8-bit/9-key runs in seconds. With the weight,
    * maxHamming=12 picks 4-bit exact bands for small corpora, 8-bit with
    * 9-key probes past ~10k, and 16-bit with 697-key probes only past
    * ~1.5M items, where the n²/2^b term genuinely dominates the
    * expansion. All integer arithmetic (BigInt — no float whose rounding
    * could flip a boundary), so the choice is reproducible from count(*)
    * alone. Recall does NOT depend on the choice (see
    * [[hammingBandPairs]]) — this knob is cost-only. */
  def bandBitsFor(n: Long, maxHamming: Int): Int =
    bestBandBits(n, 64, maxHamming, Seq(4, 8, 16))

  /** [[bandBitsFor]] generalized to the optimizer rule's banding domain
    * ([[graft.plans.HammingJoinRule]] bands the low 32 bits of each LONG
    * operand, so `bits` = 32·columns and widths must divide 32): the
    * identical measured cost model, only the bit budget and the
    * candidate set differ — the rule pre-filters `cands` to widths whose
    * probe expansion fits its `maxProbes` cap, so the chosen width is
    * always one the rewrite can actually ship. */
  def rewriteBandBitsFor(n: Long, bits: Int, maxHamming: Int,
      cands: Seq[Int] = Seq(4, 8, 16)): Int =
    bestBandBits(n, bits, maxHamming, cands)

  /** Shared width chooser: minimize SHUFFLE_WEIGHT·n·bands·probes +
    * n²·bands·probes/2^b over the candidate widths, bands = ⌈bits/b⌉. */
  private def bestBandBits(n: Long, bits: Int, maxHamming: Int,
      cands: Seq[Int]): Int = {
    require(n >= 0 && maxHamming >= 0 && cands.nonEmpty)
    // n == 0: every candidate costs zero and the join below is empty
    // anyway — return the narrowest width instead of failing, so a
    // modality-split pipeline with an empty side (no audio items, say)
    // degrades to zero pairs rather than crashing the whole run
    if (n == 0) return cands.min
    // Re-measured round 15 (idle box, 5k-item phash corpus, mh=12): one
    // shuffled probe row costs ~1.8 µs, one in-bucket joined candidate
    // check ~50 ns — ratio ≈36, not the 128 the round-12 Stress phashauto
    // calibration (which only had to separate 8- from 16-bit at 100k)
    // implied. At 128 the model held 4-bit bands to ~10k items, where the
    // 25M-candidate quadratic term measures 1.35 s vs 8-bit's 0.64 s
    // (bit-identical output). 32 moves the 4→8 crossover to ~2.5k and the
    // 8→16 crossover to ~370k; the 100k regime still picks 8-bit (Stress
    // phashauto re-run green, SCALE.md r15 row).
    val shuffleWeight = 32
    def cost(b: Int): BigInt = {
      val bands = (bits + b - 1) / b
      val s = maxHamming / bands
      val probes = (0 to s).map(k => binom(b, k)).sum
      BigInt(n) * bands * probes * shuffleWeight +
        BigInt(n) * n * bands * probes / (BigInt(1) << b)
    }
    cands.minBy(cost)
  }

  private def binom(n: Int, k: Int): BigInt =
    (1 to k).foldLeft(BigInt(1))((acc, i) => acc * (n - i + 1) / i)

  /** All `bandBits`-wide masks with ≤ s bits set — the probe-side key
    * flips of multi-index Hamming hashing (Norouzi, Punjani & Fleet,
    * "Fast Search in Hamming Space with Multi-Index Hashing", CVPR 2012).
    * Σ_{k≤s} C(bandBits,k) masks, built combinatorially (never 2^bandBits
    * enumeration). */
  private[graft] def flipMasks(bandBits: Int, s: Int): Seq[Long] = {
    def choose(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start to bandBits - left).flatMap(p =>
        choose(p + 1, left - 1).map(_ | (1L << p)))
    (0 to s).flatMap(k => choose(0, k))
  }

  /** [[simhashBandPairs]] for a 64-bit hash carried as two non-negative
    * 32-bit halves (`hiCol` bits 32–63, `loCol` bits 0–31) — the portable
    * representation perceptual hashes use so SQL mirrors never build a
    * sign-bit literal.
    *
    * Bands split each half into 32/bandBits keys. Recall is EXACTLY 1.0
    * for any legal config — the output is bit-identical to the quadratic
    * Hamming self-join, which is why the DuckDB oracles need no banding
    * mirror: with m = 64/bandBits bands and s = ⌊maxHamming/m⌋, a pair
    * within maxHamming has some band at Hamming ≤ s (else total ≥
    * m·(s+1) > maxHamming), and the probe side enumerates every key
    * within s flips of its own ([[flipMasks]] — multi-index hashing,
    * Norouzi et al. CVPR'12), so the pair collides in that band. s = 0
    * (maxHamming < bands) degenerates to the plain exact-key band join.
    *
    * `bandBits = 0` (the default) derives the width from count(*) via
    * [[bandBitsFor]] — one count job over the 2-longs-per-item hash
    * table, the price of a default that stays non-quadratic at any
    * corpus size. Scale shape: bands×N tiny reference rows plus
    * bands×probes×N probe rows shuffle; Σ bucket² candidate work inside
    * 2^bandBits-wide buckets; payloads never move; no cross join.
    */
  def hammingBandPairs(
      df: DataFrame,
      idCol: String,
      hiCol: String,
      loCol: String,
      maxHamming: Int,
      bandBits: Int = 0,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val b = resolveBandBits(df, maxHamming, bandBits)
    val s = maxHamming / (64 / b)
    if (maxBucket == Int.MaxValue) {
      val exact = bandTwoHalves(df, idCol, hiCol, loCol, b, Seq(0L))
      val probe =
        if (s == 0) exact
        else bandTwoHalves(df, idCol, hiCol, loCol, b, flipMasks(b, s))
      probe.as("a")
        .join(exact.as("b"),
          col("a.__band") === col("b.__band") &&
            col("a.__key") === col("b.__key") &&
            col("a.__id") < col("b.__id") &&
            twoHalfHamming <= maxHamming)
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          twoHalfHamming.cast("long").as("hamming"))
        .distinct()
    } else {
      // skew guard: a degenerate (band, key) bucket — e.g. a flood of
      // near-constant hashes from blank media — serializes its quadratic
      // candidate work on ONE task under the plain (band, key)
      // partitioning. Tile the hot buckets (see [[tileHot]]): output is
      // bit-identical, the hot bucket's work spreads over its tiles.
      val exactRaw = bandTwoHalves(df, idCol, hiCol, loCol, b, Seq(0L),
        repartitionKeys = false)
      val probeRaw =
        if (s == 0) exactRaw
        else bandTwoHalves(df, idCol, hiCol, loCol, b, flipMasks(b, s),
          repartitionKeys = false)
      val hot = exactRaw.groupBy(col("__band"), col("__key"))
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucket)
      tileHot(probeRaw, hot, maxBucket, probeSide = true).as("a")
        .join(tileHot(exactRaw, hot, maxBucket, probeSide = false).as("b"),
          col("a.__band") === col("b.__band") &&
            col("a.__key") === col("b.__key") &&
            col("a.__tile") === col("b.__tile") &&
            col("a.__id") < col("b.__id") &&
            twoHalfHamming <= maxHamming)
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          twoHalfHamming.cast("long").as("hamming"))
        .distinct()
    }
  }

  /** Sub-split the HOT (band, key) buckets of a banded join into
    * `g = ⌈width/maxBucket⌉` TILES without losing a single pair: the
    * exact (reference) side maps each row to its own tile (deterministic
    * id hash mod g), the probe side replicates each row to EVERY tile of
    * its bucket — a pair therefore meets exactly once, in the reference
    * row's tile, so the join output is bit-identical to the untiled one
    * while a degenerate bucket's quadratic work spreads over g tasks
    * instead of one straggler. Buckets absent from the (broadcast,
    * skew-small by definition) `hot` width table keep tile 0 on both
    * sides — zero replication on the non-skewed corpus. Probe replication
    * inside a hot bucket is g× = width/maxBucket — the n²/maxBucket row
    * budget an EXACT quadratic output cannot avoid (contrast
    * [[Knn.nnWithinBucket]]'s maxBucket, which trades recall instead:
    * that is the right call for ANN, never for an exact dedup join). */
  private def tileHot(banded: DataFrame, hot: DataFrame, maxBucket: Int,
      probeSide: Boolean): DataFrame = {
    val joined = banded.join(broadcast(hot), Seq("__band", "__key"), "left")
      .withColumn("__g", when(col("__bn").isNull, lit(1L))
        .otherwise(ceil(col("__bn").cast("double") / maxBucket).cast("long")))
    val tiled =
      if (probeSide)
        joined.withColumn("__tile", explode(sequence(lit(0L), col("__g") - 1)))
      else
        joined.withColumn("__tile", pmod(xxhash64(col("__id")), col("__g")))
    tiled.drop("__bn", "__g")
      // the hot bucket's tiles must land on DIFFERENT tasks — that is the
      // whole point; tiny rows, same budget as the plain repartition
      .repartition(col("__band"), col("__key"), col("__tile"))
  }

  /** Asymmetric [[hammingBandPairs]]: match a PROBE set (an incoming
    * drop/stream batch) against a REFERENCE set (the standing corpus) —
    * the ingest-time dedup shape, where new items must never pairwise-join
    * each other, only the index. Emits distinct `(id_p, id_r, hamming)`
    * with no id-order constraint; same recall-1.0 guarantee (probe side
    * enumerates sub-radius flips, reference keys stay exact — the true
    * multi-index-hashing query shape) and the same tiny-row shuffle bound
    * on BOTH inputs. `bandBits = 0` derives the width from the REFERENCE
    * side's count(*) — the standing corpus is what sizes the buckets. */
  def hammingBandJoin(
      probe: DataFrame,
      ref: DataFrame,
      idCol: String,
      hiCol: String,
      loCol: String,
      maxHamming: Int,
      bandBits: Int = 0,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val b = resolveBandBits(ref, maxHamming, bandBits)
    val s = maxHamming / (64 / b)
    val probeFlips = if (s == 0) Seq(0L) else flipMasks(b, s)
    if (maxBucket == Int.MaxValue)
      bandTwoHalves(probe, idCol, hiCol, loCol, b, probeFlips).as("a")
        .join(bandTwoHalves(ref, idCol, hiCol, loCol, b, Seq(0L)).as("b"),
          col("a.__band") === col("b.__band") &&
            col("a.__key") === col("b.__key") &&
            twoHalfHamming <= maxHamming)
        .select(col("a.__id").as("id_p"), col("b.__id").as("id_r"),
          twoHalfHamming.cast("long").as("hamming"))
        .distinct()
    else {
      // same tiled skew guard as [[hammingBandPairs]]: hot REFERENCE
      // buckets sub-split; each probe row replicates over the bucket's
      // tiles, each reference row sits in its own — every (probe, ref)
      // pair meets exactly once, no straggler task
      val refRaw = bandTwoHalves(ref, idCol, hiCol, loCol, b, Seq(0L),
        repartitionKeys = false)
      val probeRaw = bandTwoHalves(probe, idCol, hiCol, loCol, b, probeFlips,
        repartitionKeys = false)
      val hot = refRaw.groupBy(col("__band"), col("__key"))
        .agg(count(lit(1)).as("__bn")).filter(col("__bn") > maxBucket)
      tileHot(probeRaw, hot, maxBucket, probeSide = true).as("a")
        .join(tileHot(refRaw, hot, maxBucket, probeSide = false).as("b"),
          col("a.__band") === col("b.__band") &&
            col("a.__key") === col("b.__key") &&
            col("a.__tile") === col("b.__tile") &&
            twoHalfHamming <= maxHamming)
        .select(col("a.__id").as("id_p"), col("b.__id").as("id_r"),
          twoHalfHamming.cast("long").as("hamming"))
        .distinct()
    }
  }

  private def resolveBandBits(sized: DataFrame, maxHamming: Int,
      bandBits: Int): Int =
    if (bandBits > 0) {
      require(32 % bandBits == 0, s"bandBits must divide 32, got $bandBits")
      bandBits
    } else bandBitsFor(sized.count(), maxHamming)

  private def twoHalfHamming: Column =
    bit_count(col("a.__hi").bitwiseXOR(col("b.__hi"))) +
      bit_count(col("a.__lo").bitwiseXOR(col("b.__lo")))

  /** Band a (id, hi, lo) two-half hash frame: one row per (item, band,
    * flip) with the band's bandBits-bit key XOR the flip mask. `flips =
    * Seq(0L)` is the exact-key (reference) side; a sub-radius flip set
    * makes the probe side of the multi-index join. Shared by the
    * symmetric pair join and the probe-vs-reference join. */
  private def bandTwoHalves(df: DataFrame, idCol: String, hiCol: String,
      loCol: String, bandBits: Int, flips: Seq[Long],
      repartitionKeys: Boolean = true): DataFrame = {
    require(32 % bandBits == 0, s"bandBits must divide 32, got $bandBits")
    val perHalf = 32 / bandBits
    val bandCount = 2 * perHalf
    val mask = (1L << bandBits) - 1
    val exact = df.select(
        col(idCol).as("__id"), col(hiCol).as("__hi"), col(loCol).as("__lo"),
        explode(sequence(lit(0), lit(bandCount - 1))).as("__band"))
      .withColumn("__key0",
        when(col("__band") < perHalf,
          expr(s"shiftright(__lo, __band * $bandBits)").bitwiseAND(lit(mask)))
          .otherwise(
            expr(s"shiftright(__hi, (__band - $perHalf) * $bandBits)")
              .bitwiseAND(lit(mask))))
    val keyed =
      if (flips == Seq(0L)) exact.withColumn("__key", col("__key0"))
      else exact.withColumn("__key",
        explode(array(flips.map(m => col("__key0").bitwiseXOR(lit(m))): _*)))
    val out = keyed
      .select(col("__id"), col("__hi"), col("__lo"), col("__band"), col("__key"))
    // hash-partition on the band key: the explode inherits the scan's
    // partitioning (often ONE task for a small file), and without this
    // every Σ bucket² candidate evaluation lands on that one task. The
    // shuffle moves only tiny rows — the design's stated cost — and
    // parallelizes the bucket work across the cluster. Callers applying
    // the tiled skew guard repartition on (band, key, tile) themselves.
    if (repartitionKeys) out.repartition(col("__band"), col("__key")) else out
  }
}
