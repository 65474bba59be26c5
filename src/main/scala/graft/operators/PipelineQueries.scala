package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextHash._

/** The composed training-corpus pipeline (north star): the individually
  * oracle-checked stages chained into ONE deterministic query — what a
  * user of this engine actually runs to turn a raw document lake into a
  * training corpus.
  *
  *   raw documents
  *     → exact-dedup keeper   (lowest doc_id per content md5 — digest
  *                             aggregation + id-keyed semi-join,
  *                             q_dedup_content rule)
  *     → near-dup removal     (MinHash+LSH pairs ≥ 0.7 Jaccard from the
  *                             shared shingle index; the HIGHER id of each
  *                             pair drops, so each near-dup cluster keeps
  *                             its lowest-id canonical — anti-join against
  *                             the pair list, which is survivor-of-pairs
  *                             sized, so AQE broadcasts it at any corpus
  *                             size where dedup is sane)
  *     → quality gate         (token-count floor — map-side filter)
  *     → train/test label     (stable hash split, q_split_train_test
  *                             arithmetic — map-side, never rand())
  *
  * Scale shape: the only NEW work over the component queries is one
  * digest aggregation + id-keyed semi-join (exact keeper, both skew-safe)
  * and one anti-join on doc_id; everything
  * expensive (shingle index, banded candidate join, Jaccard verify) is
  * the same sub-quadratic machinery q_dedup_minhash already runs, reused
  * via the session shingle-index cache. The DuckDB oracle composes the
  * same stage SQL (the minhash oracle nests as a CTE), so the whole
  * pipeline is hash-compared end-to-end, not just its parts.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Quality gate: minimum whitespace tokens (bites on ~20% of fixture). */
  private val MinTokens = 30L

  def queries: Map[String, Q] = Map(
    "q_pipeline_corpus" -> ((s, d) => {
      val toks = size(split(col("text"), " ")).cast("long")
      val nearDupDrops = DedupQueries.queries("q_dedup_minhash")(s, d)
        .select(col("db").as("doc_id")).distinct()
      val bucket = pmod(md5long(col("doc_id").cast("string")), lit(100L))
      // fanOut (r18, guide §2.5): the md5 digest + tokenize projections
      // below run once in the keeper rollup and once on the join's left
      // side — both over the one-row-group fixture's single split, i.e.
      // serially. Gated identity at data scale.
      val withMd5 = fanOut(documents(s, d)
        .select(col("doc_id"), col("text")))
        .withColumn("content_md5", md5(col("text").cast("binary")))
      // exact keeper via digest aggregation + id-keyed semi-join, not a
      // window over the digest: a mega dup-group would serialize in one
      // window task, and the semi-join keys on the UNIFORM doc_id (cf.
      // q_dedup_content's group stats)
      val keepers = withMd5.groupBy("content_md5")
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      withMd5
        .join(keepers, Seq("doc_id"), "left_semi")
        .join(nearDupDrops, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", toks)
        .filter(col("n_tokens") >= MinTokens)
        .select(col("doc_id"), col("n_tokens"),
          when(bucket < 80, lit("train")).otherwise(lit("test")).as("split"))
        .orderBy("doc_id")
    }),

    "q_pipeline_funnel" -> ((s, d) => {
      // The curation ATTRITION funnel — the dashboard row above
      // q_pipeline_corpus: how many documents each stage removes, with
      // per-stage drop shares in exact ppm. Stages are EXACTLY
      // q_pipeline_corpus's composition (exact keepers via digest
      // aggregation + semi-join, near-dup drop = the later side of a
      // verified minhash pair, min-token gate), so the funnel's final
      // count restates the corpus query's cardinality (spec-pinned).
      // Shape: the stage frames share the pipeline subtrees; the five
      // counts attach as scalar subqueries on the 1-row spine (no join
      // node). ppm denominators are the corpus size — stages sum to the
      // total drop.
      import org.apache.spark.sql.GraftSqlBridge.scalarSubquery
      val toks = size(split(col("text"), " ")).cast("long")
      val withMd5 = documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("content_md5", md5(col("text").cast("binary")))
      val keepers = withMd5.groupBy("content_md5")
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val s1 = withMd5.join(keepers, Seq("doc_id"), "left_semi")
      val nearDrops = DedupQueries.queries("q_dedup_minhash")(s, d)
        .select(col("db").as("doc_id")).distinct()
      val s2 = s1.join(nearDrops, Seq("doc_id"), "left_anti")
      val s3 = s2.filter(toks >= MinTokens)
      documents(s, d).agg(count(lit(1)).as("n_docs"))
        .withColumn("n_exact", scalarSubquery(s1.agg(count(lit(1)))))
        .withColumn("n_near", scalarSubquery(s2.agg(count(lit(1)))))
        .withColumn("n_final", scalarSubquery(s3.agg(count(lit(1)))))
        .withColumn("exact_drop_ppm",
          expr("(n_docs - n_exact) * 1000000 DIV n_docs"))
        .withColumn("near_drop_ppm",
          expr("(n_exact - n_near) * 1000000 DIV n_docs"))
        .withColumn("gate_drop_ppm",
          expr("(n_near - n_final) * 1000000 DIV n_docs"))
    }),

    "q_pipeline_eval" -> ((s, d) => {
      // EVAL-SET assembly — the OTHER composed pipeline a training run
      // needs: a fixed-size human-eval/regression subset that is (a)
      // DECONTAMINATED (zero 3-gram shingle overlap with the held-out
      // benchmark — the q_text_contamination probe over the shared
      // uncapped index; a doc that leaks benchmark text must never be
      // scored), (b) quality-gated (qualityE6Col ≥ 0.45 — map-side), and
      // (c) EXACTLY k docs, stable across runs and engines (the
      // q_sample_fixed lowest-md5-hash rule). Scale shape: benchmark
      // shingle set AQE-broadcasts into a map-side probe, one per-doc
      // aggregation, then TakeOrderedAndProject — no stage beyond what
      // the component queries already run.
      // the ONE contamination definition (TextQueries.contaminationStats)
      // gates the pool — the eval set can never drift from the probe
      val cleanIds = TextQueries.contaminationStats(s, d)
        .filter(col("n_contaminated") === 0).select("doc_id")
      // fanOut (r18, guide §2.5): the quality projection (4 tokenization
      // passes/doc) ran on the fixture file's single split; identity at
      // data scale
      fanOut(documents(s, d))
        .join(cleanIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), TextQueries.qualityE6Col.as("quality_e6"),
                md5long(col("doc_id").cast("string")).as("hk"))
        .filter(col("quality_e6") >= 450000L)
        .orderBy(col("hk"), col("doc_id"))
        .limit(50)
    })
  )

  def oracles: Map[String, String] = Map(
    "q_pipeline_funnel" ->
      s"""WITH pairs AS (${DedupQueries.oracles("q_dedup_minhash")}),
         |exact AS (
         |  SELECT doc_id, text FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |near AS (
         |  SELECT doc_id, text FROM exact
         |  WHERE doc_id NOT IN (SELECT db FROM pairs)),
         |fin AS (
         |  SELECT doc_id FROM near
         |  WHERE len(string_split(text, ' ')) >= $MinTokens),
         |c AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
         |             (SELECT count(*) FROM exact) AS n_exact,
         |             (SELECT count(*) FROM near) AS n_near,
         |             (SELECT count(*) FROM fin) AS n_final)
         |SELECT n_docs, n_exact, n_near, n_final,
         |       CAST((n_docs - n_exact) * 1000000 // n_docs AS BIGINT)
         |         AS exact_drop_ppm,
         |       CAST((n_exact - n_near) * 1000000 // n_docs AS BIGINT)
         |         AS near_drop_ppm,
         |       CAST((n_near - n_final) * 1000000 // n_docs AS BIGINT)
         |         AS gate_drop_ppm
         |FROM c""".stripMargin,

    "q_pipeline_corpus" -> {
      val key = duckMd5Long("CAST(doc_id AS VARCHAR)")
      s"""WITH pairs AS (${DedupQueries.oracles("q_dedup_minhash")}),
         |exact AS (
         |  SELECT doc_id, text FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |kept AS (
         |  SELECT * FROM exact
         |  WHERE doc_id NOT IN (SELECT db FROM pairs))
         |SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |       CASE WHEN $key % 100 < 80 THEN 'train' ELSE 'test' END AS split
         |FROM kept
         |WHERE len(string_split(text, ' ')) >= $MinTokens
         |ORDER BY doc_id""".stripMargin
    },

    "q_pipeline_eval" -> {
      val key = duckMd5Long("CAST(d.doc_id AS VARCHAR)")
      s"""WITH contam AS (${TextQueries.oracles("q_text_contamination")}),
         |clean AS (SELECT doc_id FROM contam WHERE n_contaminated = 0),
         |qt AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
         |         CAST(len(list_filter(string_split(text, ' '),
         |              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) AS stop_hits,
         |         CAST(length(text) AS DOUBLE) AS n_chars
         |  FROM documents),
         |ql AS (
         |  SELECT doc_id,
         |         CAST(floor((least(n_tok / 400, 1.0) * 0.25
         |                     + (n_uniq / n_tok) * 0.35
         |                     + (1.0 - stop_hits / n_tok) * 0.2
         |                     + least((n_chars - (n_tok - 1)) / n_tok / 8, 1.0) * 0.2)
         |                    * 1e6) AS BIGINT) AS quality_e6
         |  FROM qt)
         |SELECT d.doc_id, ql.quality_e6, $key AS hk
         |FROM documents d
         |JOIN clean ON d.doc_id = clean.doc_id
         |JOIN ql ON d.doc_id = ql.doc_id
         |WHERE ql.quality_e6 >= 450000
         |ORDER BY hk, d.doc_id LIMIT 50""".stripMargin
    }
  )
}
