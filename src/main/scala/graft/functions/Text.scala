package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline operators:
  * tokenization, portable hashing, shingling, minhash signatures, simhash.
  *
  * Two hash families:
  *  - `polyHash`: a base-31 polynomial over code points mod 1e9+7. Slower
  *    (per-char lambda) but expressible identically in DuckDB SQL, so every
  *    operator built on it is oracle-checkable bit-for-bit.
  *  - `fastHash`: xxhash64 — codegen'd, the 100 TB path. Same operator
  *    shapes, not oracle-portable (DuckDB lacks xxhash64), used by the
  *    `*_fast` bench variants.
  *
  * All ratio outputs are integer parts-per-million (`x * 1e6 div n`) —
  * integer arithmetic end-to-end, so engine comparison is exact.
  */
object Text {

  /** 1e9+7 — fits 64-bit intermediate products for all uses here
    * (max multiplier 129 ⇒ h*129 < 2^37.5 · no overflow). */
  val P = 1000000007L

  def tokens(c: Column): Column = split(c, " ")

  /** Split pattern of [[unicodeTokens]]: runs of anything that is not a
    * Unicode letter or digit. `\p{L}`/`\p{N}` are Unicode general
    * categories in BOTH Java regex (Spark) and RE2 (DuckDB), which is
    * what keeps the two engines token-identical — measured on
    * punctuation, tabs, NBSP/thin/ideographic spaces, accents, CJK, and
    * mixed case (the q_unicode_* oracles gate it). */
  val TokenSplitRegex = "[^\\p{L}\\p{N}]+"

  /** Canonical UNICODE tokenizer for the search/analysis family (BM25 +
    * phrase indexes, token counting, quality, language-ID, TF-IDF, BPE
    * vocabulary): lowercase, split on [[TokenSplitRegex]], drop empties.
    * Production-true on real web text where the fixed single-space
    * [[tokens]] is not. All codegen'd builtins — no UDF.
    *
    * The SHINGLE/fingerprint family ([[shingles]], [[shingleHashes]],
    * simhash, winnowing, CDC chunking) deliberately stays on the
    * byte-faithful single-space split: its native expressions
    * ([[ShingleHashExpr]], [[MinHashSigExpr]]) pin that contract in
    * codegen, and near-dup fingerprints should see the text as-is —
    * case-folding there would alias genuinely different documents. */
  def unicodeTokens(c: Column): Column =
    filter(split(lower(c), TokenSplitRegex), t => length(t) > 0)

  /** SQL fragment mirroring [[unicodeTokens]] for the DuckDB oracle. */
  def unicodeTokensSql(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($textExpr), " +
      "'[^\\p{L}\\p{N}]+'), t -> len(t) > 0)"

  /** Canonical NEAR-DUP normalization: the [[unicodeTokens]] stream
    * re-joined on single spaces. The semantic near-dup family (MinHash
    * shingles, SimHash token votes) runs its byte-faithful fingerprint
    * machinery over THIS — so `«Gráft», the end!` and `gráft the end`
    * fingerprint identically, while the fingerprint expressions
    * themselves keep their pinned single-space contract (the fused
    * codegen exprs never change). Exact-substring/CDC fingerprints stay
    * on the raw text — their contract IS byte fidelity. */
  def normalizeForDedup(c: Column): Column =
    concat_ws(" ", unicodeTokens(c))

  /** SQL fragment mirroring [[normalizeForDedup]]. */
  def normalizeForDedupSql(textExpr: String): String =
    s"array_to_string(${unicodeTokensSql(textExpr)}, ' ')"

  /** Deterministic HARD-TEXT decorator — one SQL expression over
    * documents(doc_id, text) valid verbatim in BOTH Spark SQL and DuckDB:
    * wraps the synthetic space-separated fixture with punctuation
    * (guillemets, em-dash, comma/semicolon around 'the', ellipsis, bang),
    * MIXED CASE (upper() on even doc_ids), an accented token and digits,
    * and Unicode whitespace (NBSP chr(160), thin space chr(8201), tab
    * chr(9)). The q_*_unicode oracles run the search/analysis family over
    * this fixture, proving engine-identical tokenization on text the raw
    * fixture never exercises. */
  val DecoratedTextSql: String =
    "'«Gráft»—' || chr(160) || replace(" +
      "CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END, " +
      "' the ', ',the;' || chr(8201)) || chr(9) || 'Tail…42!'"

  /** Portable polynomial hash over code points: fold(h*31 + cp) mod P.
    * Backed by the codegen'd [[PolyHashExpr]]; the DuckDB mirror is
    * [[polyHashSql]]. */
  def polyHash(c: Column): Column = PolyHashExpr(c)

  /** Codegen-friendly 64-bit hash for the scale path. */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Content-defined chunk spans: `array<struct<s,e>>` of 1-based
    * inclusive [s, e] char ranges. A boundary falls after position i when
    * polyHash(chars [i−7, i]) ≡ 0 (mod 16) — boundaries depend only on an
    * 8-char local window, so an edit shifts just the chunks it touches
    * and later boundaries RE-SYNC (the dedup-friendly property fixed-width
    * chunking lacks; cf. FastCDC. Simplified: no min/max chunk clamp).
    * Pure per-row expression — no shuffle, no UDF. */
  def cdcSpans(t: Column): Column = {
    val bounds = when(length(t) >= 8,
      filter(
        transform(sequence(lit(8), length(t)),
          i => when(pmod(polyHash(t.substr(i - lit(7), lit(8))),
            lit(16)) === 0, i.cast("long"))),
        x => x.isNotNull))
      .otherwise(array().cast("array<bigint>"))
    filter(
      zip_with(
        concat(array(lit(1L)), transform(bounds, b => b + 1L)),
        concat(bounds, array(length(t).cast("long"))),
        (st, en) => struct(st.as("s"), en.as("e"))),
      p => p.getField("e") >= p.getField("s"))
  }

  /** Word n-gram shingles ("a b c" 3-grams) as an array column.
    *
    * Built by zipping n shifted slices of the token array rather than
    * indexing `element_at(split(text), j+o)` per shingle — expression
    * trees re-evaluate their subtrees on every reference, so the indexed
    * form re-splits the text 3× PER SHINGLE (measured dominant cost of
    * minhash at 100k docs); the slice form splits 3× per ROW. */
  def shingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    val len = greatest(size(t) - (n - 1), lit(0))
    val shifted = (0 until n).map(o => slice(t, lit(o + 1), len))
    shifted.reduceLeft((acc, s) =>
      zip_with(acc, s, (x, y) => concat(x, lit(" "), y)))
  }

  /** Distinct shingle hashes (portable hash) — fused native expression,
    * one pass, no intermediate arrays (see [[ShingleHashExpr]]). */
  def shingleHashes(c: Column, n: Int = 3): Column = ShingleHashExpr(c, n)

  /** Interpreted-HOF formulation — kept as the spec oracle for
    * [[shingleHashes]]. */
  def shingleHashesHof(c: Column, n: Int = 3): Column =
    shingleHashesWith(c, n, polyHash)

  /** Distinct shingle hashes under a caller-chosen hash (e.g. [[fastHash]]
    * for the non-oracle scale path). */
  def shingleHashesWith(c: Column, n: Int, hashFn: Column => Column): Column =
    array_distinct(transform(shingles(c, n), s => hashFn(s)))

  /** k-permutation minhash from a PRECOMPUTED shingle-hash array column.
    * Permutation i: h ↦ (h·(2i+3) + 7i + 1) mod P.
    *
    * Take an attribute reference, not the shingleHashes expression itself:
    * inlining the base-hash tree here would recompute the per-char fold k
    * times per row (a measured 500× slowdown). Callers materialize the
    * hash array in its own projection first — Catalyst's CollapseProject
    * keeps a multiply-referenced expensive expression from being re-inlined. */
  def minhashFromHashes(hs: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hs, h => pmod(h * (i * 2 + 3) + i * 7 + 1, lit(P)))))

  /** Convenience: signature straight from text (single-use contexts only —
    * see [[minhashFromHashes]] for why hot paths pre-materialize). */
  def minhashSig(c: Column, k: Int): Column = minhashFromHashes(shingleHashes(c), k)

  /** 30-bit simhash over token hashes (bit j set iff the +1/−1 vote of all
    * token-hash bits j sums positive). Takes the NAME of a precomputed
    * array<long> token-hash column (SQL-expression form because Spark's
    * Scala `shiftright` only accepts literal shift amounts). */
  def simhash30(tokHashCol: String): Column = expr(
    s"""aggregate(sequence(0, 29), 0L, (acc, j) ->
       |  acc + IF(aggregate($tokHashCol, 0L,
       |             (sm, h) -> sm + IF(CAST(shiftright(h, j) AS BIGINT) % 2 = 1, 1L, -1L)) > 0,
       |           shiftleft(1L, j), 0L))""".stripMargin)

  /** Tokens of `c` that appear in `dict`, counted. */
  def dictHits(c: Column, dict: Seq[String]): Column =
    size(filter(tokens(c), t => array_contains(array(dict.map(lit): _*), t)))

  /** [[dictHits]] over [[unicodeTokens]] — the quality/language-ID
    * scorers match stopwords on normalized tokens, so `The,` counts. */
  def unicodeDictHits(c: Column, dict: Seq[String]): Column =
    size(filter(unicodeTokens(c),
      t => array_contains(array(dict.map(lit): _*), t)))

  /** SQL fragment mirroring [[unicodeDictHits]]. */
  def unicodeDictHitsSql(textExpr: String, dict: Seq[String]): String = {
    val lits = dict.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(${unicodeTokensSql(textExpr)}, " +
      s"t -> list_contains([$lits], t)))"
  }

  /** Stopword list used by quality scoring + language ID (English). */
  val StopEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "a", "for")
  val StopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu")
  val StopFr = Seq("le", "la", "les", "et", "est", "dans", "une", "pour")
  val StopEs = Seq("el", "los", "las", "y", "es", "en", "un", "por")
  val StopZh = Seq("的", "是", "不", "了", "在")

  /** SQL fragment mirroring [[dictHits]] for the DuckDB oracle. */
  def dictHitsSql(textExpr: String, dict: Seq[String]): String = {
    val lits = dict.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split($textExpr, ' '), t -> list_contains([$lits], t)))"
  }

  /** SQL fragment mirroring [[polyHash]] for the DuckDB oracle. */
  def polyHashSql(strExpr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(len($strExpr)), " +
      s"k -> unicode(($strExpr)[k+1])::BIGINT)), (acc, c) -> (acc*31 + c) % $P)"

  /** SQL fragment mirroring [[shingleHashes]] (distinct 3-gram hashes).
    * The token list binds ONCE through the single-element-list lambda
    * idiom (`list_transform([X], v -> body)[1]`) — inlining it raw costs
    * 3 evaluations per shingle, which turns an expensive `textExpr` (the
    * decorated-Unicode dedup fixture: regex tokenize + normalize) into a
    * per-shingle re-tokenization; at sf0.1 that made the minhash oracles
    * effectively non-terminating in DuckDB. Results are identical — only
    * the evaluation count changes. */
  def shingleHashesSql(textExpr: String): String =
    s"list_transform([string_split($textExpr, ' ')], __tok -> " +
      "list_distinct(list_transform(list_transform(" +
      "range(len(__tok) - 2), " +
      "j -> __tok[j+1] || ' ' || __tok[j+2] || ' ' || __tok[j+3]), " +
      s"s -> ${polyHashSql("s")})))[1]"

  /** SQL fragment mirroring [[minhashSig]]. The shingle-hash list binds
    * ONCE (same idiom as [[shingleHashesSql]]) — inlined raw it would
    * re-shingle the document per permutation, k=64 times per row. */
  def minhashSigSql(textExpr: String, k: Int): String =
    s"list_transform([${shingleHashesSql(textExpr)}], __hs -> " +
      s"list_transform(range($k), i -> list_min(list_transform(" +
      s"__hs, h -> (h*(2*i+3) + i*7 + 1) % $P))))[1]"
}
