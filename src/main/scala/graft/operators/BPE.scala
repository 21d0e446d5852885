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
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = repr
        .select(explode(Text.shingles(trim(col("s")), 2)).as("bg"), col("c"))
        .select(substring_index(col("bg"), " ", 1).as("x"),
          substring_index(col("bg"), " ", -1).as("y"), col("c"))
        .groupBy(col("x"), col("y")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top.head
        val (x, y, cnt) = (r.getString(0), r.getString(1), r.getLong(2))
        val next = repr.withColumn("s", mergeOne(col("s"), x, y)).cache()
        val nSym = next
          .select(explode(split(trim(col("s")), " ")).as("sym"))
          .distinct().count()
        out += Merge(step, x, y, cnt, nSym)
        repr.unpersist()
        repr = next
        step += 1
      }
    }
    repr.unpersist()
    out.result()
  }
}
