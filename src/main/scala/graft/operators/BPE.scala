package graft.operators

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Distributed byte-pair-encoding merge learning — the tokenizer-training
  * step of a pretraining-data pipeline, shaped the way industrial BPE
  * trainers shape it: the corpus collapses to a WORD-FREQUENCY table
  * first (one map-side-combinable hash aggregate — the only corpus-wide
  * scan), and every merge round then runs over the vocabulary table,
  * which Zipf keeps orders of magnitude smaller than the corpus.
  *
  * Per round: explode each vocab word's symbol sequence into adjacent
  * pairs weighted by word count (one hash aggregate over vocab), take the
  * argmax pair (count desc, then lexicographic — fully deterministic),
  * and apply the merge to every word. Merge application is the standard
  * greedy first-occurrence semantics; the regex ` x y(?= )` with a
  * non-consuming trailing-space lookahead reproduces it exactly in one
  * left-to-right pass (consuming the trailing space would skip
  * every other pair in an odd-aligned run like `a a a a a a`).
  *
  * Driver-side state is O(1) per round — one (pair, count) row and one
  * symbol-count scalar — the same bounded-collect pattern as
  * [[KMeans.lloyd]]'s centroid updates. At 100 TB the corpus scan
  * happens once; rounds touch only the vocab table (cached, lifetime
  * bounded to the call).
  */
object BPE {

  /** One learned merge: `left_sym`+`right_sym` fused at `step`;
    * `pair_count` is the corpus-weighted adjacency count that won the
    * round, `n_symbols_after` the distinct symbol inventory after
    * applying it. */
  final case class Merge(step: Int, left_sym: String, right_sym: String,
      pair_count: Long, n_symbols_after: Long)

  private def spaced(wordCol: String) =
    concat(lit(" "), array_join(split(col(wordCol), ""), " "), lit(" "))

  private def mergeOne(e: org.apache.spark.sql.Column, x: String, y: String) =
    regexp_replace(e,
      " " + Pattern.quote(x) + " " + Pattern.quote(y) + "(?= )",
      Matcher.quoteReplacement(" " + x + y))

  /** Tokenize: apply an ordered merge list to a word table, adding
    * `bpe_syms` (the symbol array after all merges). One narrow
    * pass — the encode side of the tokenizer is shuffle-free. */
  def applyMerges(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val reprN = merges.foldLeft(spaced(wordCol)) {
      case (e, (x, y)) => mergeOne(e, x, y)
    }
    words.withColumn("bpe_syms", split(trim(reprN), " "))
  }

  /** Winning pair of one round: max corpus-weighted adjacency count, ties
    * broken lexicographically on (x, y) — collected as min(struct(-cnt,
    * x, y)), whose struct ordering (cnt desc, then binary-UTF8 x asc,
    * y asc) is exactly the orderBy the original formulation sorted with. */
  private def argmaxPair(repr: DataFrame): Option[(String, String, Long)] =
    repr
      .select(explode(Text.shingles(trim(col("s")), 2)).as("bg"), col("c"))
      .select(substring_index(col("bg"), " ", 1).as("x"),
        substring_index(col("bg"), " ", -1).as("y"), col("c"))
      .groupBy(col("x"), col("y")).agg(sum(col("c")).as("cnt"))
      .groupBy()
      .agg(min(struct((-col("cnt")).as("nc"), col("x"), col("y"))).as("b"))
      .collect().toSeq
      .flatMap(r => Option(r.getStruct(0)).map(b =>
        (b.getString(1), b.getString(2), -b.getLong(0))))
      .headOption

  /** One pass over a merged representation producing BOTH per-round
    * aggregates: the symbol-inventory size after the merge just applied
    * AND the next round's argmax pair. Bigrams and unigrams ride one
    * explode (tagged structs), so each round is ONE job where the
    * original loop ran two (argmax, then distinct-count) — the per-round
    * driver hop stays a 2-row collect. */
  private def roundAgg(next: DataFrame)
      : (Option[(String, String, Long)], Long) = {
    val rows = next
      .select(explode(concat(
          transform(Text.shingles(trim(col("s")), 2),
            b => struct(lit(0).as("t"), b.as("g"))),
          transform(split(trim(col("s")), " "),
            u => struct(lit(1).as("t"), u.as("g"))))).as("e"),
        col("c"))
      .select(col("e.t").as("t"), col("e.g").as("g"), col("c"))
      .groupBy(col("t"), col("g")).agg(sum(col("c")).as("cnt"))
      .select(col("t"),
        substring_index(col("g"), " ", 1).as("x"),
        substring_index(col("g"), " ", -1).as("y"), col("cnt"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"),
        min(struct((-col("cnt")).as("nc"), col("x"), col("y"))).as("b"))
      .collect()
    val best = rows.find(_.getInt(0) == 0).map { r =>
      val b = r.getStruct(2); (b.getString(1), b.getString(2), -b.getLong(0))
    }
    val nSym = rows.find(_.getInt(0) == 1).map(_.getLong(1)).getOrElse(0L)
    (best, nSym)
  }

  /** Learn up to `nMerges` merges from a (word, count) table. Stops early
    * if no adjacent pair remains (every word fused to one symbol). */
  def learnMerges(words: DataFrame, wordCol: String, countCol: String,
      nMerges: Int): Seq[Merge] = {
    // " h e l l o " — space-delimited symbol sequence, padded so every
    // adjacency (including the last) has a trailing-space boundary
    var repr = words.select(spaced(wordCol).as("s"),
      col(countCol).cast("long").as("c"))
      .cache()
    val out = Seq.newBuilder[Merge]
    // seed argmax over the initial representation; every later round's
    // argmax rides the SAME job as that round's symbol count (roundAgg),
    // so the loop runs 1 + rounds jobs instead of 2×rounds
    var pending = argmaxPair(repr)
    var step = 1
    while (step <= nMerges && pending.nonEmpty) {
      val (x, y, cnt) = pending.get
      val next = repr.withColumn("s", mergeOne(col("s"), x, y)).cache()
      val (nextBest, nSym) = roundAgg(next)
      out += Merge(step, x, y, cnt, nSym)
      repr.unpersist()
      repr = next
      step += 1
      pending = nextBest
    }
    repr.unpersist()
    out.result()
  }
}
