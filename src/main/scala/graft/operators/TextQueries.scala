package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextHash._

/** Text-analysis operators for LLM training-data pipelines (north star,
  * BASELINE.json): token frequency, token counting, language-ID heuristic,
  * quality scoring, and document fingerprinting — all over `documents`.
  *
  * Scale notes: every query is scan → narrow per-row expressions (or one
  * explode) → a single aggregation shuffle. Nothing is quadratic in corpus
  * size; per-doc work is linear in document length. All expressions are
  * Spark built-ins (codegen'd higher-order functions — no UDFs), so the
  * hot path stays inside WholeStageCodegen.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  def queries: Map[String, Q] = Map(
    "q_text_tokens" -> ((s, d) =>
      // Token frequency top-20: the canonical explode → count — partial
      // aggregation shrinks the shuffle to |vocab| per partition.
      documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(length(col("token")) > 2)
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)),

    "q_text_tokencount" -> ((s, d) =>
      // Whitespace tokens vs regex word-ish tokens (BPE-style pre-tokenizer
      // shape: runs of letters or digits) vs raw chars.
      documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
            .cast("long").as("re_tokens"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")),

    "q_text_langid" -> ((s, d) => {
      // Heuristic language-ID. The fixture vocabulary is shared across the
      // synthetic lang labels, so no heuristic can recover them — the
      // operator contract is a deterministic stopword/charclass profile
      // score with an argmax, the standard cheap lang-ID shape.
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      val hits = (w: String) =>
        size(filter(toks, t => t === lit(w))).cast("double")
      val stopRatio = (hits("the") + hits("a") + hits("of")) / nTok
      val avgLen = length(col("text")).cast("double") / nTok
      documents(s, d)
        .select(
          col("doc_id"), col("lang"),
          floor(stopRatio * 1e6).cast("long").as("stop_score"),
          floor(avgLen * 1e6).cast("long").as("len_score"))
        .withColumn("pred_lang",
          when(col("stop_score") > 80000, "en")
            .when(col("len_score") > 5200000, "de")
            .when(col("stop_score") > 40000, "fr")
            .when(col("len_score") > 4800000, "es")
            .otherwise("zh"))
        .orderBy("doc_id")
    }),

    "q_text_quality" -> ((s, d) => {
      // Quality scoring: length, mean token length, stopword ratio, type/
      // token ratio → single blended score (integer-scaled via floor so the
      // cross-engine comparison is exact; Parity rationale).
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      val nUniq = size(array_distinct(toks)).cast("double")
      val stopHits = size(filter(toks, t =>
        stopwords.foldLeft(lit(false))((acc, w) => acc || (t === lit(w)))))
        .cast("double")
      val avgTokLen =
        (length(col("text")).cast("double") - (nTok - 1)) / nTok
      val score =
        least(nTok / 400, lit(1.0)) * 0.25 +
        (nUniq / nTok) * 0.35 +
        (lit(1.0) - stopHits / nTok) * 0.2 +
        least(avgTokLen / 8, lit(1.0)) * 0.2
      documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          floor((nUniq / nTok) * 1e6).cast("long").as("uniq_ratio_e6"),
          floor(score * 1e6).cast("long").as("quality_e6"))
        .orderBy("doc_id")
    }),

    "q_text_fingerprint" -> ((s, d) => {
      // Document fingerprints: exact content hash (md5) + an
      // order-insensitive token fingerprint (sum of per-token hashes mod p,
      // catches token permutations — the fixture's planted near-dups).
      val tokenFp = aggregate(
        transform(split(col("text"), " "), t => pmod(md5long(t), lit(FpPrime))),
        lit(0L),
        (acc, h) => pmod(acc + h, lit(FpPrime)))
      documents(s, d)
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("content_md5"),
          tokenFp.as("token_fp"))
        .orderBy("doc_id")
    })
  )

  private val duckTokFp = {
    val h = duckMd5Long("t")
    s"CAST(list_aggregate(list_transform(string_split(text, ' '), t -> ($h) % 1000000007), 'sum') % 1000000007 AS BIGINT)"
  }

  def oracles: Map[String, String] = Map(
    "q_text_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
        |WHERE length(token) > 2
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,

    "q_text_tokencount" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> x IN ('the', 'a', 'of'))) AS DOUBLE) AS stop_hits,
        |         CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents)
        |SELECT doc_id, lang,
        |       CAST(floor(stop_hits / n_tok * 1e6) AS BIGINT) AS stop_score,
        |       CAST(floor(n_chars / n_tok * 1e6) AS BIGINT) AS len_score,
        |       CASE WHEN floor(stop_hits / n_tok * 1e6) > 80000 THEN 'en'
        |            WHEN floor(n_chars / n_tok * 1e6) > 5200000 THEN 'de'
        |            WHEN floor(stop_hits / n_tok * 1e6) > 40000 THEN 'fr'
        |            WHEN floor(n_chars / n_tok * 1e6) > 4800000 THEN 'es'
        |            ELSE 'zh' END AS pred_lang
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
        |         CAST(len(list_filter(string_split(text, ' '),
        |              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) AS stop_hits,
        |         CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |       CAST(floor(n_uniq / n_tok * 1e6) AS BIGINT) AS uniq_ratio_e6,
        |       CAST(floor((least(n_tok / 400, 1.0) * 0.25
        |                   + (n_uniq / n_tok) * 0.35
        |                   + (1.0 - stop_hits / n_tok) * 0.2
        |                   + least((n_chars - (n_tok - 1)) / n_tok / 8, 1.0) * 0.2)
        |                  * 1e6) AS BIGINT) AS quality_e6
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS content_md5,
         |       $duckTokFp AS token_fp
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
