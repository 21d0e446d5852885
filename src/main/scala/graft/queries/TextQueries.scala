package graft.queries

import graft.{Q, Tables}
import graft.functions.{NormalizeExpr, Text}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token stats, quality
  * scoring, language-ID heuristic, fingerprinting, simhash. All ratios are
  * integer ppm (exact across engines); every query is oracle-checked.
  *
  * These are narrow, shuffle-free per-row transforms — at 100 TB they
  * pipeline inside whole-stage codegen (modulo the HOF lambdas) with no
  * data movement; only the final ORDER BY (for the oracle) is wide, and a
  * production caller would drop it.
  */
object TextQueries {

  private val langDicts: Seq[(String, Seq[String])] = Seq(
    "en" -> Text.StopEn, "es" -> Text.StopEs, "de" -> Text.StopDe,
    "fr" -> Text.StopFr, "zh" -> Text.StopZh)

  val all: Seq[Q] = Seq(

    // ---- token counting --------------------------------------------------
    Q("q_doc_tokens",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(Text.unicodeTokens(col("text"))).cast("long").as("n_tokens"),
          size(array_distinct(Text.unicodeTokens(col("text")))).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars_m"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
             |  len(${Text.unicodeTokensSql("text")}) AS n_tokens,
             |  len(list_distinct(${Text.unicodeTokensSql("text")})) AS n_distinct,
             |  len(text) AS n_chars_m
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- Unicode tokenizer parity on HARD text ---------------------------
    // Token statistics over the DECORATED fixture (Text.DecoratedTextSql:
    // punctuation, mixed case, accents, digits, NBSP/thin-space/tab) —
    // all counts are collation-free integers (sizes, equality-filtered
    // counts, summed code-point lengths), so the hash compares the two
    // engines' TOKENIZERS and nothing else.
    Q("q_unicode_tokenize",
      (s, dir) => {
        val toks = Text.unicodeTokens(expr(Text.DecoratedTextSql))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_distinct"),
            size(filter(toks, t => t === "gráft")).cast("long").as("n_accent"),
            size(filter(toks, t => t === "the")).cast("long").as("n_the"),
            size(filter(toks, t => t === "42")).cast("long").as("n_digit"),
            aggregate(toks, lit(0L), (a, t) => a + length(t)).as("sum_len"))
          .orderBy(col("doc_id"))
      },
      Some {
        val tok = Text.unicodeTokensSql("t")
        s"""WITH d AS (
           |  SELECT doc_id, ${Text.DecoratedTextSql} AS t FROM documents)
           |SELECT doc_id,
           |  len($tok) AS n_tokens,
           |  len(list_distinct($tok)) AS n_distinct,
           |  len(list_filter($tok, x -> x = 'gráft')) AS n_accent,
           |  len(list_filter($tok, x -> x = 'the')) AS n_the,
           |  len(list_filter($tok, x -> x = '42')) AS n_digit,
           |  list_reduce(list_prepend(0::BIGINT,
           |    list_transform($tok, w -> len(w)::BIGINT)), (a, x) -> a + x)
           |    AS sum_len
           |FROM d ORDER BY doc_id""".stripMargin
      }),

    // TF-IDF over the decorated fixture: per-doc top-2 terms — the
    // ranked-retrieval surface of the tokenizer-parity proof (term
    // frequencies, document frequencies, and the binary-collation
    // tie-break all flow through the Unicode tokenizer).
    Q("q_tfidf_unicode",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), expr(Text.DecoratedTextSql).as("text"))
        val nDocs = docs.agg(count(lit(1)).as("__n"))
        val tf = docs
          .select(col("doc_id"),
            explode(Text.unicodeTokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("__score").desc, col("term"))
        tf.join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("__score",
            col("tf").cast("double") * (col("__n") - col("df")) / col("df"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= 2)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            floor(col("__score") * 1000).cast("long").as("score_ppk"),
            col("__rn").cast("int").as("rank"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, ${Text.DecoratedTextSql} AS text FROM documents),
             |tok AS (
             |  SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS term
             |  FROM d),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
             |df AS (
             |  SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n FROM d),
             |scored AS (
             |  SELECT doc_id, term, tf, df,
             |    CAST(tf AS DOUBLE) * (n - df) / df AS score,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY CAST(tf AS DOUBLE) * (n - df) / df DESC, term) AS rn
             |  FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, df,
             |       CAST(floor(score * 1000) AS BIGINT) AS score_ppk,
             |       CAST(rn AS INTEGER) AS rank
             |FROM scored WHERE rn <= 2 ORDER BY doc_id, rank""".stripMargin)),

    // ---- quality scoring: type-token ratio, mean word length, stopword
    //      ratio, punctuation count — integer ppm everywhere ---------------
    Q("q_doc_quality",
      (s, dir) => {
        val t = Text.unicodeTokens(col("text"))
        Tables.documents(s, dir)
          .withColumn("__n", size(t).cast("long"))
          .withColumn("__nd", size(array_distinct(t)).cast("long"))
          .withColumn("__sumlen",
            aggregate(t, lit(0L), (a, w) => a + length(w)))
          .withColumn("__stop", Text.unicodeDictHits(col("text"), Text.StopEn).cast("long"))
          .withColumn("__punct",
            length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("long"))
          .select(
            col("doc_id"), col("__n").as("n_tokens"),
            expr("__nd * 1000000L div __n").as("ttr_ppm"),
            expr("__sumlen * 1000000L div __n").as("mean_len_ppm"),
            expr("__stop * 1000000L div __n").as("stop_ppm"),
            col("__punct").as("n_punct"))
          .orderBy(col("doc_id"))
      },
      Some {
        val tok = Text.unicodeTokensSql("text")
        s"""SELECT doc_id, len($tok) AS n_tokens,
           |  len(list_distinct($tok)) * 1000000 // len($tok) AS ttr_ppm,
           |  list_reduce(list_prepend(0::BIGINT, list_transform($tok, w -> len(w)::BIGINT)), (a, x) -> a + x)
           |    * 1000000 // len($tok) AS mean_len_ppm,
           |  ${Text.unicodeDictHitsSql("text", Text.StopEn)} * 1000000 // len($tok) AS stop_ppm,
           |  len(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // ---- language-ID heuristic: stopword-dictionary voting ---------------
    Q("q_doc_lang_guess",
      (s, dir) => {
        val scored = langDicts.foldLeft(Tables.documents(s, dir)) {
          case (d, (l, dict)) =>
            d.withColumn(s"s_$l",
              Text.unicodeDictHits(col("text"), dict).cast("long"))
        }
        val guess =
          when(col("s_en") > 0 &&
            col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr"), col("s_zh")), "en")
          .when(col("s_es") > 0 &&
            col("s_es") >= greatest(col("s_de"), col("s_fr"), col("s_zh")), "es")
          .when(col("s_de") > 0 && col("s_de") >= greatest(col("s_fr"), col("s_zh")), "de")
          .when(col("s_fr") > 0 && col("s_fr") >= col("s_zh"), "fr")
          .when(col("s_zh") > 0, "zh")
          .otherwise("und")
        scored
          .select(col("doc_id"), col("lang"),
            col("s_en"), col("s_es"), col("s_de"), col("s_fr"), col("s_zh"),
            guess.as("lang_guess"))
          .orderBy(col("doc_id"))
      },
      Some {
        val hits = langDicts.map { case (l, d) =>
          s"${Text.unicodeDictHitsSql("text", d)} AS s_$l"
        }.mkString(",\n  ")
        s"""WITH scored AS (SELECT doc_id, lang, $hits FROM documents)
           |SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
           |  CASE
           |    WHEN s_en > 0 AND s_en >= greatest(s_es, s_de, s_fr, s_zh) THEN 'en'
           |    WHEN s_es > 0 AND s_es >= greatest(s_de, s_fr, s_zh) THEN 'es'
           |    WHEN s_de > 0 AND s_de >= greatest(s_fr, s_zh) THEN 'de'
           |    WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
           |    WHEN s_zh > 0 THEN 'zh'
           |    ELSE 'und' END AS lang_guess
           |FROM scored ORDER BY doc_id""".stripMargin
      }),

    // ---- document fingerprinting: whole-text polynomial hash + minimum
    //      rolling 8-gram hash (winnowing-style sketch) --------------------
    Q("q_doc_fingerprint",
      (s, dir) => Tables.documents(s, dir)
        .select(
          col("doc_id"),
          Text.polyHash(col("text")).as("fp_full"),
          when(length(col("text")) >= 8,
            array_min(transform(sequence(lit(0), length(col("text")) - 8),
              i => Text.polyHash(col("text").substr(i + 1, lit(8))))))
            .otherwise(lit(null)).as("fp_min8"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  ${Text.polyHashSql("text")} AS fp_full,
              |  CASE WHEN len(text) >= 8 THEN
              |    list_min(list_transform(range(len(text) - 7),
              |      i -> ${Text.polyHashSql("substr(text, i + 1, 8)")}))
              |  ELSE NULL END AS fp_min8
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- 30-bit simhash per document ------------------------------------
    // Token votes come from the UNICODE tokenizer over the decorated
    // fixture (near-dup fingerprints converge with the search/analysis
    // family's tokenization — punctuation/case/Unicode whitespace no
    // longer split semantically identical docs apart).
    Q("q_doc_simhash",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("__tokh",
          transform(Text.unicodeTokens(expr(Text.DecoratedTextSql)),
            t => Text.polyHash(t)))
        .select(col("doc_id"), Text.simhash30("__tokh").as("simhash"))
        .orderBy(col("doc_id")),
      Some(s"""WITH th AS (SELECT doc_id,
              |  list_transform(${Text.unicodeTokensSql(Text.DecoratedTextSql)}, t -> ${Text.polyHashSql("t")}) AS h
              |  FROM documents)
              |SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT, range(30)), (acc, j) ->
              |    acc + CASE WHEN list_reduce(list_prepend(0::BIGINT, h),
              |                 (sm, x) -> sm + CASE WHEN (x >> j::INT) & 1 = 1 THEN 1 ELSE -1 END) > 0
              |               THEN (1::BIGINT << j::INT) ELSE 0 END) AS simhash
              |FROM th ORDER BY doc_id""".stripMargin)),

    // ---- within-document repetition ratio (Gopher-style quality rule):
    //      fraction of duplicated 3-gram shingles, exact integer ppm ------
    Q("q_doc_repetition",
      (s, dir) => Tables.documents(s, dir)
        .withColumn("n_shingles", (size(Text.tokens(col("text"))) - 2).cast("long"))
        .withColumn("n_distinct", size(Text.shingleHashes(col("text"))).cast("long"))
        .select(col("doc_id"), col("n_shingles"), col("n_distinct"),
          when(col("n_shingles") >= 1,
            expr("(n_shingles - n_distinct) * 1000000L div n_shingles"))
            .otherwise(lit(null)).cast("long").as("rep_ppm"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id,
              |  len(string_split(text, ' ')) - 2 AS n_shingles,
              |  len(${Text.shingleHashesSql("text")}) AS n_distinct,
              |  CASE WHEN len(string_split(text, ' ')) - 2 >= 1 THEN
              |    ((len(string_split(text, ' ')) - 2 - len(${Text.shingleHashesSql("text")}))::BIGINT
              |     * 1000000) // (len(string_split(text, ' ')) - 2)
              |  ELSE NULL END AS rep_ppm
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- PII scrubbing: email/URL masking + numeric-run census ----------
    // Java regex and DuckDB RE2 agree on this dialect subset (character
    // classes, bounded repetition, alternation-free) — parity prototyped.
    Q("q_pii_scrub",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          regexp_replace(
            regexp_replace(col("text"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "https?://[^ ]+", "<URL>").as("scrubbed"),
          regexp_count(col("text"), lit("[0-9]+")).cast("long").as("n_numbers"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    'https?://[^ ]+', '<URL>', 'g') AS scrubbed,
             |  len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---- composite quality gate: keep docs above their source's median
    //      type-token ratio (score → per-source threshold → filter) ------
    Q("q_quality_filter",
      (s, dir) => {
        val t = Text.tokens(col("text"))
        val scored = Tables.documents(s, dir)
          .withColumn("__n", size(t).cast("long"))
          .withColumn("__nd", size(array_distinct(t)).cast("long"))
          .withColumn("ttr_ppm", expr("__nd * 1000000L div __n"))
        val med = scored.groupBy(col("source"))
          .agg(expr("percentile(ttr_ppm, 0.5)").as("med_ttr"))
        scored.join(broadcast(med), Seq("source"))
          .filter(col("ttr_ppm") > col("med_ttr"))
          .select(col("doc_id"), col("source"), col("ttr_ppm"), col("med_ttr"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
             |  SELECT doc_id, source,
             |    len(list_distinct(string_split(text, ' '))) * 1000000
             |      // len(string_split(text, ' ')) AS ttr_ppm
             |  FROM documents),
             |med AS (SELECT source, quantile_cont(ttr_ppm, 0.5) AS med_ttr
             |        FROM scored GROUP BY source)
             |SELECT doc_id, s.source, ttr_ppm, med_ttr
             |FROM scored s JOIN med m ON s.source = m.source
             |WHERE ttr_ppm > med_ttr ORDER BY doc_id""".stripMargin)),

    // ---- TF-IDF: top-3 terms per document -------------------------------
    // idf is the LOG-FREE probabilistic form (N − df)/df: same monotone
    // ranking family, but the score stays inside exact-rounded IEEE
    // +,·,/ — ln() is libm-dependent and NOT bit-portable across engines,
    // so a log idf could rank ties differently under the hash compare.
    // Plan: one explode → (doc,term) hash agg; df is a second agg over the
    // (doc,term) pairs whose result (the vocabulary) broadcasts back; the
    // only wide ops over data volume are the tf aggregate and the per-doc
    // top-k window on candidates.
    Q("q_tfidf_top_terms",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val nDocs = docs.agg(count(lit(1)).as("__n"))
        val tf = docs
          .select(col("doc_id"),
            explode(Text.unicodeTokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("__score").desc, col("term"))
        tf.join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(nDocs))
          .withColumn("__score",
            col("tf").cast("double") * (col("__n") - col("df")) / col("df"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            floor(col("__score") * 1000).cast("long").as("score_ppk"),
            col("__rn").cast("int").as("rank"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(${Text.unicodeTokensSql("text")}) AS term
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
             |df AS (
             |  SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n FROM documents),
             |scored AS (
             |  SELECT doc_id, term, tf, df,
             |    CAST(tf AS DOUBLE) * (n - df) / df AS score,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY CAST(tf AS DOUBLE) * (n - df) / df DESC, term) AS rn
             |  FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, df,
             |       CAST(floor(score * 1000) AS BIGINT) AS score_ppk,
             |       CAST(rn AS INTEGER) AS rank
             |FROM scored WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // ---- concat-and-chunk sequence packing (LLM pretraining batching) ---
    // Maps each document to its slot in the packed fixed-length token
    // stream via a DISTRIBUTED prefix sum (per-bucket cumsum + prefix
    // over the tiny bucket-totals table — never a global single-partition
    // window). bucketSize=100 forces ~5 buckets at the driver's 500-doc
    // verify corpus, so cross-bucket offset continuation is what the
    // hash-match proves; the oracle is the plain global running sum.
    Q("q_pack_sequences",
      (s, dir) => graft.operators.Packing.packSequences(
          Tables.documents(s, dir), "doc_id",
          size(Text.tokens(col("text"))), seqLen = 2048L, bucketSize = 100L)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tokens,
             |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM t)
             |SELECT doc_id, n_tokens,
             |  (cum - n_tokens) // 2048 AS start_seq,
             |  (cum - 1) // 2048 AS end_seq,
             |  (cum - n_tokens) % 2048 AS start_off
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ---- Unicode normalization (native NormalizeExpr) --------------------
    // The ASCII corpus is first given deterministic diacritics two ways —
    // precomposed (translate a→á, e→é) and decomposed (o followed by
    // U+0301 combining acute) — then NFC-normalized (composing the o+mark
    // into ó) and accent-stripped back to ASCII. Both engines implement
    // UAX #15 (JDK Normalizer ↔ DuckDB nfc_normalize/strip_accents), so
    // the strings hash-compare exactly. Narrow per-row codegen'd work —
    // zero shuffle; the ORDER BY exists for the oracle.
    Q("q_text_normalize",
      (s, dir) => {
        val acc = translate(col("text"), "ae", "\u00e1\u00e9")
        val decomp = regexp_replace(acc, "o", "o\u0301")
        Tables.documents(s, dir)
          .withColumn("__d", decomp)
          .select(col("doc_id"),
            NormalizeExpr(col("__d"), "nfc").as("nfc_text"),
            NormalizeExpr(NormalizeExpr(col("__d"), "nfc"), "strip_accents")
              .as("ascii_text"),
            length(NormalizeExpr(col("__d"), "nfc")).cast("long").as("n_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    replace(translate(text, 'ae', chr(225) || chr(233)),
             |            'o', 'o' || chr(769)) AS dt
             |  FROM documents)
             |SELECT doc_id,
             |  nfc_normalize(dt) AS nfc_text,
             |  strip_accents(nfc_normalize(dt)) AS ascii_text,
             |  length(nfc_normalize(dt)) AS n_chars
             |FROM d ORDER BY doc_id""".stripMargin)),

    // ---- k-anonymity audit (re-identification risk) ----------------------
    // Before a dataset ships, count how many quasi-identifier
    // combinations are rarer than k=5 — each such combo re-identifies
    // its members. Quasi-identifiers here: (user cohort, event type,
    // hour-of-day). Output is the per-type risk rollup: distinct combos,
    // combos under k, and rows exposed by them. Two hash aggregates —
    // the second is over combo-count rows, not events.
    Q("q_k_anonymity",
      (s, dir) => {
        val combos = Tables.events(s, dir)
          .groupBy((col("user_id") % 20).as("cohort"), col("event_type"),
            hour(col("ts")).cast("long").as("hr"))
          .agg(count(lit(1)).as("__n"))
        combos.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_combos"),
            sum((col("__n") < 5).cast("long")).as("n_under_k"),
            sum(when(col("__n") < 5, col("__n")).otherwise(0L))
              .as("rows_exposed"),
            min(col("__n")).as("min_combo_size"))
          .orderBy(col("event_type"))
      },
      Some("""WITH c AS (
             |  SELECT user_id % 20 AS cohort, event_type,
             |         CAST(hour(ts) AS BIGINT) AS hr, count(*) AS n
             |  FROM events GROUP BY 1, 2, 3)
             |SELECT event_type, count(*) AS n_combos,
             |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_under_k,
             |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             |    AS rows_exposed,
             |  min(n) AS min_combo_size
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---- model-based quality classifier (hashed linear scorer) -----------
    // The fastText-style complement to the heuristic quality score: each
    // token hashes into one of 64 weight buckets; the document's score is
    // the mean bucket weight. Weights here are a deterministic function
    // of the bucket id (production swaps in trained weights as a 64-row
    // broadcast — identical plan); weights live in [0, 2000] with 1000
    // neutral so every quantity stays non-negative BIGINT (Spark `div`
    // truncates toward zero, DuckDB `//` floors — they only agree ≥ 0).
    // Scale: narrow per-row fold over the token array, zero shuffle,
    // nothing leaves the row until the final ORDER BY (oracle-only).
    Q("q_quality_classifier",
      (s, dir) => {
        val weight = (t: org.apache.spark.sql.Column) =>
          pmod(pmod(Text.polyHash(t), lit(64L)) * 2654435761L, lit(2001L))
        Tables.documents(s, dir)
          .withColumn("__toks", Text.tokens(col("text")))
          .withColumn("__n", size(col("__toks")).cast("long"))
          .withColumn("raw_score",
            aggregate(transform(col("__toks"), weight), lit(0L), (a, x) => a + x))
          .withColumn("score_milli", expr("raw_score * 1000L div __n"))
          .select(col("doc_id"), col("__n").as("n_tokens"), col("raw_score"),
            col("score_milli"), (col("score_milli") >= 1000000L).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
              |sc AS (
              |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n,
              |    list_reduce(list_prepend(0::BIGINT, list_transform(toks,
              |      tok -> ((${Text.polyHashSql("tok")}) % 64 * 2654435761) % 2001)),
              |      (a, x) -> a + x) AS sw
              |  FROM t)
              |SELECT doc_id, n AS n_tokens, sw AS raw_score,
              |       sw * 1000 // n AS score_milli,
              |       sw * 1000 // n >= 1000000 AS keep
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // ---- winnowing fingerprints (Schleimer et al., the MOSS algorithm) --
    // k=8 char k-grams, window w=4: every window of 4 consecutive k-gram
    // hashes contributes its RIGHTMOST minimum, so any two documents
    // sharing a substring of length >= k+w-1 = 11 are guaranteed to share
    // a fingerprint, at ~2/(w+1) sampling density — the position-robust
    // sibling of q_doc_fingerprint's global min-hash. The (hash, position)
    // pair is packed into one BIGINT — hash < 1e9+7 < 2^30 shifted left 20
    // bits, position INVERTED in the low 20 bits — so "minimum hash,
    // rightmost tie-break" is a plain array_min in both engines: no custom
    // comparator, exact parity. (Positions must fit 20 bits: documents are
    // capped at ~1M chars; longer docs would chunk first.)
    // Scale: narrow per-row array pipeline, zero shuffle; O(n·w) per doc
    // like any vectorized winnowing. Fingerprints stay aggregated here
    // (count / sum / min / max — all exact integers); the dedup consumer
    // would explode the selected set and group by hash, which is the same
    // bounded-fanout explode the MinHash band join already demonstrates.
    Q("q_winnow_fingerprint",
      (s, dir) => {
        val k = 8
        val w = 4
        val mb = 1048576L // 2^20 position packing
        Tables.documents(s, dir)
          .withColumn("__h",
            when(length(col("text")) >= k,
              transform(sequence(lit(0), length(col("text")) - k),
                i => Text.polyHash(col("text").substr(i + 1, lit(k))))))
          .withColumn("__enc",
            transform(col("__h"), (x, i) => x * mb + (lit(mb - 1) - i)))
          .withColumn("__sel",
            when(size(col("__enc")) >= w,
              array_distinct(transform(
                sequence(lit(0), size(col("__enc")) - w),
                p => array_min(slice(col("__enc"), p + 1, lit(w)))))))
          .withColumn("__fp", expr("transform(__sel, e -> e div 1048576L)"))
          .select(col("doc_id"),
            size(col("__h")).cast("long").as("n_grams"),
            size(col("__sel")).cast("long").as("n_fp"),
            expr("aggregate(__fp, 0L, (a, x) -> a + x)").as("fp_sum"),
            array_min(col("__fp")).as("fp_min"),
            array_max(col("__fp")).as("fp_max"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH h AS (
              |  SELECT doc_id,
              |    CASE WHEN len(text) >= 8 THEN
              |      list_transform(range(len(text) - 7),
              |        i -> ${Text.polyHashSql("substr(text, i + 1, 8)")})
              |    END AS hs
              |  FROM documents),
              |e AS (
              |  SELECT doc_id, hs,
              |    list_transform(range(len(hs)),
              |      i -> hs[i + 1] * 1048576 + (1048575 - i)) AS enc
              |  FROM h),
              |sel AS (
              |  SELECT doc_id, hs,
              |    CASE WHEN len(enc) >= 4 THEN
              |      list_transform(
              |        list_distinct(list_transform(range(len(enc) - 3),
              |          p -> list_min(list_slice(enc, p + 1, p + 4)))),
              |        x -> x // 1048576)
              |    END AS fp
              |  FROM e)
              |SELECT doc_id,
              |  len(hs) AS n_grams,
              |  len(fp) AS n_fp,
              |  CAST(list_sum(fp) AS BIGINT) AS fp_sum,
              |  list_min(fp) AS fp_min,
              |  list_max(fp) AS fp_max
              |FROM sel ORDER BY doc_id""".stripMargin)),

    // ---- collocation extraction: bigram lift, exact integer ppm ---------
    // PMI-style collocation mining for LM corpus analysis, with the log
    // dropped: lift = P(xy) / (P(x)·P(y)) is the same ranking (log is
    // monotone) and — unlike log — is computable EXACTLY as integer ppm:
    // lift_ppm = n_xy·N² · 1e6 div (M·n_x·n_y), evaluated in DECIMAL(38,0)
    // (Spark) / HUGEINT (DuckDB) so the product can't overflow at benched
    // scales (at ≥ ~1e13 tokens the 1e6 factor must drop a digit or N be
    // pre-scaled — the ranking is unchanged).
    // Scale: two hash aggregates (unigrams, bigrams) with map-side
    // partials; the unigram table is vocabulary-sized, so both count
    // lookups broadcast — the big bigram table never shuffles again. The
    // 1-row totals cross-join is a broadcast of literals.
    Q("q_collocations",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(Text.tokens(col("text"))).as("w"))
        val uni = toks.groupBy("w").agg(count(lit(1)).as("n_w"))
        val bi = Tables.documents(s, dir)
          .select(explode(Text.shingles(col("text"), 2)).as("sh"))
          .select(
            substring_index(col("sh"), " ", 1).as("w1"),
            substring_index(col("sh"), " ", -1).as("w2"))
        val bic = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
        bic.filter(col("n_xy") >= 10)
          .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), "w2")
          .crossJoin(broadcast(uni.agg(sum("n_w").as("n_total"))))
          .crossJoin(broadcast(bic.agg(sum("n_xy").as("m_total"))))
          .withColumn("lift_ppm", expr(
            """CAST(CAST(n_xy AS DECIMAL(38,0)) * n_total * n_total * 1000000
              |  div (CAST(m_total AS DECIMAL(38,0)) * n_w1 * n_w2) AS BIGINT)"""
              .stripMargin))
          .select(col("w1"), col("w2"), col("n_xy"), col("n_w1"), col("n_w2"),
            col("lift_ppm"))
          .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
          .limit(100)
      },
      Some("""WITH toks AS (
             |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |uni AS (SELECT w, count(*)::BIGINT AS n_w FROM toks GROUP BY w),
             |tl AS (SELECT string_split(text, ' ') AS ts FROM documents),
             |big AS (
             |  SELECT unnest(ts[1:len(ts)-1]) AS w1, unnest(ts[2:len(ts)]) AS w2
             |  FROM tl),
             |bic AS (
             |  SELECT w1, w2, count(*)::BIGINT AS n_xy FROM big GROUP BY w1, w2),
             |tot AS (SELECT sum(n_w)::BIGINT AS n_total FROM uni),
             |m AS (SELECT sum(n_xy)::BIGINT AS m_total FROM bic)
             |SELECT b.w1, b.w2, b.n_xy, u1.n_w AS n_w1, u2.n_w AS n_w2,
             |  CAST(b.n_xy::HUGEINT * n_total * n_total * 1000000
             |       // (m_total::HUGEINT * u1.n_w * u2.n_w) AS BIGINT) AS lift_ppm
             |FROM bic b
             |JOIN uni u1 ON b.w1 = u1.w
             |JOIN uni u2 ON b.w2 = u2.w
             |CROSS JOIN tot CROSS JOIN m
             |WHERE b.n_xy >= 10
             |ORDER BY lift_ppm DESC, b.w1, b.w2 LIMIT 100""".stripMargin))
  )
}
