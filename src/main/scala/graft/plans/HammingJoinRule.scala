package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a NON-EQUI join whose condition bounds a
  * Hamming distance,
  *
  * {{{
  *   SELECT ... FROM a JOIN b
  *     ON bit_count(a.h ^ b.h) <= 12 AND <anything else>
  *   -- or the two-half 64-bit form the perceptual hashes use:
  *     ON bit_count(a.hi ^ b.hi) + bit_count(a.lo ^ b.lo) <= 12 AND ...
  * }}}
  *
  * into the banded multi-index equi-join ([[graft.operators.MinHashLSH
  * .hammingBandPairs]] as a PLAN TRANSFORM): both sides explode into
  * (band, key) entries, the probe side enumerating every key within
  * `s = ⌊tau/bands⌋` bit-flips of its own (multi-index hashing — Norouzi,
  * Punjani & Fleet, CVPR'12), and the join gains `band = band AND
  * key = key` equi-keys, so Catalyst plans a hash/sort-merge join on
  * bucket keys instead of the O(n²) BroadcastNestedLoopJoin the naive
  * predicate forces. The pigeonhole argument makes the rewrite EXACT:
  * a pair within `tau` total bits has some band within `s` (else total
  * ≥ bands·(s+1) > tau), and banding even a SUBSET of the value bits
  * preserves that bound (banded differences ≤ total differences), so
  * false negatives are impossible and false positives die on the
  * original predicate, which is kept verbatim as a residual.
  *
  * Row MULTIPLICITY is preserved exactly — no Distinct is inserted.
  * A pair can collide in several bands, so the join condition adds a
  * first-band guard: the pair is emitted only in the FIRST band whose
  * band-Hamming is ≤ s (a CASE over the band index testing the earlier
  * bands' popcounts on the original columns). Within one band a pair
  * collides at most once (the reference key is a single point in the
  * probe's flip enumeration), so each qualifying row pair appears
  * exactly once, exactly as the nested-loop join would emit it.
  *
  * Fires only when ALL hold:
  *  - inner join with a condition, and NO equi conjunct already present
  *    (if the user has an equality, Spark already hash-joins on it; the
  *    rewrite targets the otherwise-quadratic case — this guard also
  *    makes the rule idempotent, since the rewritten join is equi)
  *  - a conjunct matches the one- or two-column popcount-of-XOR bound
  *    with a literal threshold, each XOR operand deterministic, LONG,
  *    and referencing exactly one side
  *  - the probe-side key enumeration stays bounded (≤ `maxProbes`
  *    entries per band) — a huge radius would explode the expansion,
  *    and past tau ≥ 64 the predicate is vacuous anyway
  *
  * Band width is derived from the PLAN'S OWN STATISTICS at rewrite
  * time — the corpus-adaptive choice the DataFrame operator makes from
  * count(*), without running a scan: `n` is the larger child's
  * `stats.rowCount` (exact under CBO/ANALYZE), falling back to
  * `sizeInBytes / row-width` (always available — Spark's own join-side
  * estimation basis), fed to the measured cost model
  * ([[graft.operators.MinHashLSH.rewriteBandBitsFor]] — the
  * SHUFFLE_WEIGHT=128 model of `bandBitsFor`, bits = 32·columns). A
  * small corpus thus gets cheap 4-bit exact bands instead of paying a
  * fixed width's probe expansion, and a 100M-row corpus gets the wide
  * bands its n²/2^b term demands. `spark.graft.hammingRewrite.bandBits`
  * OVERRIDES the derivation when set (must divide 32); an unknown-size
  * plan (sizeInBytes defaults to the max) derives the widest band —
  * conservative against the quadratic term, never against correctness
  * (recall is width-invariant by the pigeonhole argument above).
  * `spark.graft.hammingRewrite.enabled=false` turns the rule off.
  */
object HammingJoinRule extends Rule[LogicalPlan] {

  /** One matched Hamming bound: column-expression pairs (left side,
    * right side) — one pair for the single-long form, two for the
    * two-half form — and the inclusive radius. */
  private case class HammingBound(pairs: Seq[(Expression, Expression)],
      tau: Int, conjunct: Expression)

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.hammingRewrite.enabled", "true")
        .toBoolean) return plan
    val maxProbes = conf
      .getConfString("spark.graft.hammingRewrite.maxProbes", "512").toInt

    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        val conjuncts = splitAnd(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) => straddles(a, b, left, right)
          case EqualNullSafe(a, b) => straddles(a, b, left, right)
          case _ => false
        }
        if (hasEqui) j
        else findBound(conjuncts, left, right) match {
          case Some(bound) if bound.tau >= 0 =>
            chooseBandBits(bound, left, right, maxProbes) match {
              case Some(bandBits) =>
                val bandsPerCol = 32 / bandBits
                val bands = bound.pairs.length * bandsPerCol
                val s = bound.tau / bands
                val flips = graft.operators.MinHashLSH.flipMasks(bandBits, s)
                if (flips.length > maxProbes) j // explicit-override overflow
                else rewrite(j, left, right, cond, bound, bandBits,
                  bandsPerCol, s, flips)
              case None => j // no width fits the probe cap at this radius
            }
          case _ => j
        }
    }
  }

  /** Probe-expansion factor of width `b` at sub-radius `s`:
    * Σ_{k≤s} C(b,k) — counted without materializing the masks. */
  private def probeCount(b: Int, s: Int): Long =
    (0 to math.min(s, b)).map { k =>
      (1 to k).foldLeft(1L)((acc, i) => acc * (b - i + 1) / i)
    }.sum

  /** Band width: the conf override when set, else the measured cost
    * model over the larger join side's statistics-estimated row count —
    * restricted to widths whose probe expansion fits `maxProbes`, so the
    * derivation can never pick a width the cap then rejects (which would
    * silently fall back to the nested-loop plan at exactly the scale
    * where the quadratic hurts most). None = no width fits. */
  private def chooseBandBits(bound: HammingBound, left: LogicalPlan,
      right: LogicalPlan, maxProbes: Int): Option[Int] =
    conf.getConfString("spark.graft.hammingRewrite.bandBits", "") match {
      case "" =>
        val feasible = Seq(4, 8, 16).filter { b =>
          val bands = bound.pairs.length * (32 / b)
          probeCount(b, bound.tau / bands) <= maxProbes
        }
        if (feasible.isEmpty) None
        else {
          val n = math.max(estimatedRows(left), estimatedRows(right))
          Some(graft.operators.MinHashLSH.rewriteBandBitsFor(n,
            bound.pairs.length * 32, bound.tau, feasible))
        }
      case set =>
        val b = set.toInt
        require(b > 0 && 32 % b == 0,
          s"spark.graft.hammingRewrite.bandBits must divide 32, got $b")
        Some(b)
    }

  /** Statistics-estimated row count: exact `rowCount` when the plan has
    * one (CBO/ANALYZE), else `sizeInBytes` over the output row width —
    * the same basis Spark's own join-side estimation uses. An
    * unknown-size plan (sizeInBytes = defaultSizeInBytes = Long.Max)
    * estimates huge, deriving the widest band — safe: width never
    * affects the result set, only cost. */
  private def estimatedRows(p: LogicalPlan): Long = {
    val st = p.stats
    st.rowCount.map(_.min(BigInt(Long.MaxValue)).toLong).getOrElse {
      val width = math.max(8, p.output.map(_.dataType.defaultSize).sum + 8)
      (st.sizeInBytes / width).min(BigInt(Long.MaxValue)).toLong.max(1L)
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** a references only one side, b only the other (either orientation).
    * BOTH sides must reference something: an empty reference set is a
    * subset of anything, so without the symmetric nonEmpty guard a
    * literal-first conjunct like `5 = b.flag` would classify as an
    * equi-join KEY and suppress the rewrite, leaving the O(n²) plan. */
  private def straddles(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
      b.references.nonEmpty && b.references.subsetOf(right.outputSet)) ||
    (a.references.nonEmpty && a.references.subsetOf(right.outputSet) &&
      b.references.nonEmpty && b.references.subsetOf(left.outputSet))

  /** Orient (x, y) of one XOR so ._1 is the LEFT side's expression. */
  private def orient(x: Expression, y: Expression,
      left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression)] =
    if (!x.deterministic || !y.deterministic) None
    else if (x.dataType != LongType || y.dataType != LongType) None
    else if (x.references.nonEmpty && x.references.subsetOf(left.outputSet) &&
      y.references.nonEmpty && y.references.subsetOf(right.outputSet))
      Some((x, y))
    else if (x.references.nonEmpty && x.references.subsetOf(right.outputSet) &&
      y.references.nonEmpty && y.references.subsetOf(left.outputSet))
      Some((y, x))
    else None

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case Cast(IntLit(v), _, _, _) => Some(v)
      case _ => None
    }
  }

  private def findBound(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[HammingBound] = {
    def popXor(e: Expression): Option[(Expression, Expression)] = e match {
      case BitwiseCount(BitwiseXor(x, y)) => orient(x, y, left, right)
      case _ => None
    }
    def ham(e: Expression): Option[Seq[(Expression, Expression)]] = e match {
      case Add(a, b, _) => for (p <- popXor(a); q <- popXor(b)) yield Seq(p, q)
      case other => popXor(other).map(Seq(_))
    }
    conjuncts.iterator.flatMap { c =>
      val m = c match {
        case LessThanOrEqual(h, IntLit(t)) => ham(h).map((_, t))
        case LessThan(h, IntLit(t)) => ham(h).map((_, t - 1))
        case GreaterThanOrEqual(IntLit(t), h) => ham(h).map((_, t))
        case GreaterThan(IntLit(t), h) => ham(h).map((_, t - 1))
        // the exact-duplicate spelling: bit_count(a.h ^ b.h) = 0
        case EqualTo(h, IntLit(0)) => ham(h).map((_, 0))
        case EqualTo(IntLit(0), h) => ham(h).map((_, 0))
        case _ => None
      }
      m.map { case (pairs, tau) => HammingBound(pairs, tau, c) }
    }.toSeq.headOption
  }

  /** popcount of band `j`'s bits of the pair's XOR — evaluated on the
    * ORIGINAL columns, post-join (the first-band dedup guard). */
  private def bandHamming(bound: HammingBound, j: Int, bandBits: Int,
      bandsPerCol: Int): Expression = {
    val (l, r) = bound.pairs(j / bandsPerCol)
    val shift = (j % bandsPerCol) * bandBits
    val mask = (1L << bandBits) - 1
    BitwiseCount(BitwiseAnd(
      ShiftRightUnsigned(BitwiseXor(l, r), Literal(shift)), Literal(mask)))
  }

  /** Band key of band `j` computed on ONE side's expression. */
  private def bandKey(side: Expression, j: Int, bandBits: Int,
      bandsPerCol: Int): Expression = {
    val shift = (j % bandsPerCol) * bandBits
    val mask = (1L << bandBits) - 1
    BitwiseAnd(ShiftRightUnsigned(side, Literal(shift)), Literal(mask))
  }

  /** Explode `child` into (band, key) struct entries — the probe side
    * passes the flip enumeration, the reference side Seq(0L). */
  private def banded(child: LogicalPlan, sides: Seq[Expression],
      bands: Int, bandBits: Int, bandsPerCol: Int, flips: Seq[Long],
      name: String): (LogicalPlan, Attribute) = {
    val entries = for (j <- 0 until bands; f <- flips) yield {
      val key = bandKey(sides(j / bandsPerCol), j, bandBits, bandsPerCol)
      CreateStruct(Seq(Literal(j),
        if (f == 0L) key else BitwiseXor(key, Literal(f))))
    }
    val arr = CreateArray(entries)
    val elemT = arr.dataType.asInstanceOf[ArrayType]
    val attr = AttributeReference(name, elemT.elementType, elemT.containsNull)()
    (Generate(Explode(arr), Nil, outer = false, None, Seq(attr), child), attr)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, bound: HammingBound, bandBits: Int, bandsPerCol: Int,
      s: Int, flips: Seq[Long]): LogicalPlan = {
    val bands = bound.pairs.length * bandsPerCol
    val (probeGen, aBk) = banded(left, bound.pairs.map(_._1), bands, bandBits,
      bandsPerCol, flips, "__graft_bk_a")
    // hash-cluster the probe entries on the join's (band, key) — exactly
    // the repartition the DataFrame operator applies (bandTwoHalves'
    // repartitionKeys) and the shuffle its measured cost model prices
    // (SHUFFLE_WEIGHT · n·bands·probes tiny rows). Without it the probe
    // stream keeps the INPUT's partitioning, and when the reference side
    // broadcasts, the in-bucket candidate checks run at input parallelism
    // (a checkpointed 2-partition hash table measured the whole join ~2×
    // the operator's); when the reference side is big, the same exchange
    // satisfies the sort-merge join's own clustering requirement, so no
    // second shuffle appears.
    val probe = RepartitionByExpression(
      Seq(GetStructField(aBk, 0), GetStructField(aBk, 1)), probeGen, None)
    val (exact, bBk) = banded(right, bound.pairs.map(_._2), bands, bandBits,
      bandsPerCol, Seq(0L), "__graft_bk_b")
    val bandOf = GetStructField(aBk, 0)
    val equi = And(
      EqualTo(bandOf, GetStructField(bBk, 0)),
      EqualTo(GetStructField(aBk, 1), GetStructField(bBk, 1)))
    // first-band guard: emit only in the first band with band-ham ≤ s
    val firstBand =
      if (bands == 1) Literal.TrueLiteral
      else CaseWhen(
        (1 until bands).map { b =>
          val earlierMiss = (0 until b)
            .map(e => GreaterThan(bandHamming(bound, e, bandBits, bandsPerCol),
              Literal(s)))
            .reduce[Expression](And)
          (EqualTo(bandOf, Literal(b)), earlierMiss)
        },
        Some(Literal.TrueLiteral)) // band 0 has no earlier bands
    // residual order matters for cost, not semantics: the ORIGINAL
    // condition (id inequality + the 2-popcount Hamming bound) is cheap
    // and rejects almost every in-bucket candidate, while the first-band
    // guard's CASE evaluates up to bands-1 band popcounts — so the guard
    // runs LAST, only on pairs that already qualified (measured on the
    // 5k-item phash fixture: guard-first evaluated the CASE on every
    // candidate and cost ~2× the operator's banded join)
    val newJoin = Join(probe, exact, Inner,
      Some(And(And(equi, cond), firstBand)), JoinHint.NONE)
    Project(j.output, newJoin)
  }
}
