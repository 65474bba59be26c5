package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextHash._

/** Deterministic sampling for training-data pipelines (north star): at
  * 100 TB, sampling must be (a) reproducible across runs and engines — so
  * never `rand()` — and (b) map-side — no shuffle to decide membership.
  * All three operators hash a stable key (md5-derived, identical in DuckDB)
  * and decide from the hash alone:
  *
  *  - q_sample_hash: Bernoulli p=10% — `bucket(key) < 100 of 1000`. Pure
  *    filter; composes with any downstream op; pushdown-friendly.
  *  - q_sample_stratified: k-per-group (balanced classes) — hash-ordered
  *    row_number within each stratum. One shuffle on the stratum key, the
  *    minimum possible for per-group quotas.
  *  - q_split_train_test: disjoint 80/20 split labels from the same
  *    hash — a row's split never changes as the corpus grows (stable
  *    holdout), unlike randomSplit.
  *
  * Plus corpus assembly:
  *  - q_pack_docs: context-window sequence packing — docs chunked into
  *    fixed subword-budget packs per source shard. The cumulative sum runs
  *    INSIDE each shard's window partition (never a global order), so
  *    packing parallelizes across shards — the only shape that survives
  *    100 TB; a corpus-global running sum would serialize on one task.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Tokenizer-faithful subword count of a token column: the REAL greedy
    * longest-match subword tokenizer over the fixture piece vocabulary
    * ([[graft.functions.SubwordTokenizer]] — WordPiece matching rule,
    * codegen'd native expression), replacing the old ceil(len/4)
    * estimate. Real context windows budget by SUBWORDS, not whitespace
    * words; the pieces a word actually splits into depend on the merge
    * table, and the oracle recomputes the identical tokenization from the
    * same vocabulary (recursive greedy scan), so the budget columns stay
    * hash-checked. Tokens are re-joined with the same single-space
    * separator split() removed — spaces are piece boundaries and cost
    * nothing, so count(join(ts)) ≡ Σ count(t).
    */
  private def subwords(toks: org.apache.spark.sql.Column) =
    graft.functions.expressions.SubwordFunctions.subword_count(
      concat_ws(" ", toks))

  /** Deterministic numeric suffix of `source` (0 when no trailing
    * digits): a bare ''-to-BIGINT cast diverges between engines (Spark
    * ANSI errors, DuckDB conversion-errors), so both spellings guard
    * explicitly. The fixture's sources are always srcN; the guard is for
    * reuse over corpora beyond it. [[DuckSrcNum]] is the one DuckDB
    * spelling, shared by both mixing oracles.
    */
  private[operators] def srcNum: org.apache.spark.sql.Column =
    // the EXACT DuckDB spelling: TRY_CAST nulls the no-digits case AND a
    // >19-digit suffix, COALESCE floors both (and a NULL source) to 0 —
    // the previous when-guard left NULL for a NULL source where the
    // oracle said 0, silently diverging the mixing cuts
    // (r18 self-review)
    coalesce(
      expr("TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT)"),
      lit(0L))
  private[operators] val DuckSrcNum =
    "COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT), 0)"

  /** Whole-relation window frame for corpus scalars over BOUNDED
    * (sources-sized) rollups — a deliberate single partition, the
    * q_mix_alpha / cdfAttach bounded-block rule. Stacked uses plan as
    * consecutive Window operators on ONE exchange (r18, guide §2.4),
    * where the scalar-subquery form they replace ran one query execution
    * per scalar. */
  private val wWhole = Window.rowsBetween(
    Window.unboundedPreceding, Window.unboundedFollowing)

  /** q_mix_epochs core over (source, t) per-doc token rows: temperature
    * weights (sqrt, e3-quantized — the q_mix_temperature arithmetic),
    * per-source targets at T = 3× unique tokens, epochs capped at 4.0
    * (e3-scaled). Factored so specs can drive crafted token counts
    * through the exact integer math.
    */
  private[graft] def epochSchedule(tok: DataFrame): DataFrame = {
    // the corpus scalars (wraw, then wsum + ntot) stack as single-
    // partition windows on the sources-sized rollup (the q_mix_sources
    // note — r18, guide §2.4) instead of two nested scalar-subquery
    // executions; values identical, same sum domains.
    val srcs = tok.groupBy("source").agg(sum("t").as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double")) * 1000).cast("long"))
    val q = srcs.withColumn("wraw", sum("w").over(wWhole))
      .withColumn("w_e3", greatest(expr("w * 1000 DIV wraw"), lit(1L)))
    // budget products run in DECIMAL(38,0): 3·ntot·w_e3 outgrows Long at
    // ~3e15 corpus tokens and n_tokens·epochs_e3 at ~2e15 per source —
    // the envelope swap the r10 prose promised, now in code (VERDICT r10
    // #5). Quotients re-enter BIGINT via explicit casts (they are ≤
    // 3·ntot by construction); the oracle mirrors with HUGEINT.
    // PropertySpec pins the envelope edge.
    q.withColumn("wsum", sum("w_e3").over(wWhole))
      .withColumn("ntot", sum("n_tokens").over(wWhole))
      .withColumn("target_tokens",
        expr("CAST(CAST(3 AS DECIMAL(38,0)) * ntot * w_e3" +
             " DIV wsum AS BIGINT)"))
      .withColumn("epochs_e3",
        least(expr("CAST(CAST(target_tokens AS DECIMAL(38,0)) * 1000" +
                   " DIV n_tokens AS BIGINT)"), lit(4000L)))
      .withColumn("alloc_tokens",
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * epochs_e3" +
             " DIV 1000 AS BIGINT)"))
      .withColumn("capped", col("epochs_e3") === 4000L)
      .select("source", "n_tokens", "w_e3", "target_tokens",
              "epochs_e3", "alloc_tokens", "capped")
      .orderBy("source")
  }

  /** Docs-per-shard for q_curriculum (the loader's unit of work). */
  private[graft] val CurriculumShard = 64L

  /** q_curriculum core over (doc_id, text) rows — factored so the spec
    * can pin the prefix-sum ordinal against the brute-force
    * single-window form on crafted corpora. See the query entry for the
    * shape rationale. */
  private[graft] def curriculumPlan(docs: DataFrame): DataFrame = {
    val base = docs
      .withColumn("qe", TextQueries.qualityE6Col)
      .select(col("doc_id"),
        expr("9L - least(9L, qe * 10 DIV 1000000)").as("stage"),
        md5long(col("doc_id").cast("string")).as("h"))
      .withColumn("hb", expr("h DIV " + (1L << 52)))
    val wBuckets = Window.orderBy("stage", "hb")
      .rowsBetween(Window.unboundedPreceding, -1)
    // exclusive prefix over the BOUNDED bucket rollup (≤ 10 stages ×
    // 256 high-bytes rows) — the cdfAttach bounded-single-partition rule
    val offs = base.groupBy("stage", "hb").agg(count(lit(1)).as("c"))
      .select(col("stage"), col("hb"),
        coalesce(sum("c").over(wBuckets), lit(0L)).as("off"))
    val wIn = Window.partitionBy("stage", "hb").orderBy("h", "doc_id")
    base.join(broadcast(offs), Seq("stage", "hb"))
      .withColumn("ord",
        row_number().over(wIn).cast("long") + col("off") - 1)
      .select(col("doc_id"), col("stage"), col("ord"),
        expr(s"ord DIV $CurriculumShard").as("shard"))
      .orderBy("ord")
  }

  def queries: Map[String, Q] = Map(
    "q_sample_hash" -> ((s, d) => {
      // deterministic 10% Bernoulli sample: membership is a pure function
      // of the key — map-side filter, no shuffle, engine-portable.
      val bucket = pmod(md5long(col("doc_id").cast("string")), lit(1000L))
      documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"))
        .filter(col("bucket") < 100)
        .orderBy("doc_id")
    }),

    "q_sample_stratified" -> ((s, d) => {
      // balanced per-stratum sample: exactly 10 customers per market
      // segment, chosen by hash order (reproducible "random" without
      // rand()); c_custkey breaks hash ties deterministically.
      val h = md5long(col("c_custkey").cast("string"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(h.asc, col("c_custkey").asc)
      customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 10)
        .orderBy("c_mktsegment", "rn")
    }),

    "q_split_train_test" -> ((s, d) => {
      // stable 80/20 split: a document's split is fixed by its key, so
      // the holdout never leaks as the corpus grows or repartitions.
      val bucket = pmod(md5long(col("doc_id").cast("string")), lit(100L))
      documents(s, d)
        .select(when(bucket < 80, lit("train")).otherwise(lit("test")).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n"))
        .orderBy("split")
    }),

    "q_curriculum" -> ((s, d) =>
      // Deterministic TRAINING-ORDER assignment — the step between
      // curation and the data loader: every doc gets a curriculum stage
      // (descending quality decile of the shared qualityE6Col — the
      // quality-annealing read: best decile streams first), a
      // deterministic within-stage shuffle (the md5 hash — never
      // rand()), an exact GLOBAL ordinal over (stage, h, doc_id), and
      // its 64-doc shard. THE SHAPE: a global ordinal is the textbook
      // single-partition row_number over the corpus — a scale-killer.
      // The engine computes it with the two-level prefix-sum pattern
      // instead (the q_stats_ks machinery as an ORDINAL, not a CDF):
      // one keyed count over bounded (stage, hb) buckets (hb = the
      // hash's high byte), an exclusive cumsum on the 2560-row bucket
      // rollup (deliberate bounded single-partition window), PARTITIONED
      // within-bucket row_numbers, broadcast offset re-attach. More hb
      // bits is the 100 TB knob (per-bucket rows stay ~n/buckets by hash
      // uniformity). Oracle deliberately takes the textbook
      // single-window form — the two must agree exactly.
      // fanOut (r18, guide §2.5): the quality projection (4 tokenization
      // passes/doc) runs once in the bucket rollup and once on the join
      // probe side — both over the one-row-group fixture's single split,
      // i.e. serially, ~2× the query's whole cost. Gated identity at
      // data scale.
      curriculumPlan(fanOut(documents(s, d)))),

    "q_chunk_docs" -> ((s, d) => {
      // The complement of packing: SPLIT long docs into overlapping
      // context windows (W=50 tokens, stride S=40 → 10-token overlap, the
      // standard long-document prep before sequence packing). Pure
      // map-side generator — each doc explodes into ceil-ish chunk
      // starts, each chunk re-joins its token slice and fingerprints it;
      // no shuffle before the presentation sort, linear at any corpus
      // size. Chunk identity is (doc_id, chunk_id) with the chunk md5 so
      // the cross-engine compare covers the exact chunk CONTENT, not
      // just counts.
      val W = 50
      val S = 40
      val ts = split(col("text"), " ")
      documents(s, d)
        .select(col("doc_id"), ts.as("ts"), size(ts).as("len"))
        .select(col("doc_id"), col("ts"), col("len"),
          explode(sequence(lit(0),
            ((col("len") - 1) / lit(S)).cast("int"))).as("i"))
        .select(
          col("doc_id"),
          col("i").cast("long").as("chunk_id"),
          size(slice(col("ts"), col("i") * S + 1, lit(W))).cast("long")
            .as("n_chunk_tokens"),
          // context-window budgets a consumer actually packs by: bytes and
          // the deterministic subword estimate (see `subwords`) — a chunk
          // of 50 short words and one of 50 long words fill a window very
          // differently
          octet_length(concat_ws(" ", slice(col("ts"), col("i") * S + 1, lit(W))))
            .cast("long").as("n_chunk_bytes"),
          subwords(slice(col("ts"), col("i") * S + 1, lit(W)))
            .as("n_chunk_subwords"),
          md5(concat_ws(" ", slice(col("ts"), col("i") * S + 1, lit(W)))
            .cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    }),

    "q_sample_quality" -> ((s, d) => {
      // Quality-WEIGHTED sampling (the DCLM-style soft filter): instead
      // of a hard quality cutoff, keep each doc with probability equal
      // to its quality score — better docs survive proportionally more
      // often, low-quality text still contributes a diversity tail.
      // Membership = hash-bucket < quality_e6, so it is deterministic,
      // engine-portable, and MAP-SIDE (zero shuffles before the
      // presentation sort) — the quality score reuses q_text_quality's
      // exact integer-scaled arithmetic, so the oracle mirrors it
      // bit-for-bit (TextQueries.qualityE6Col is the ONE definition).
      documents(s, d)
        .select(col("doc_id"),
          TextQueries.qualityE6Col.as("quality_e6"),
          pmod(md5long(col("doc_id").cast("string")), lit(1000000L)).as("bucket"))
        .filter(col("bucket") < col("quality_e6"))
        .orderBy("doc_id")
    }),

    "q_mix_sources" -> ((s, d) => {
      // Data MIXING — the pretraining mixture operator: re-weight a
      // multi-source corpus to a target composition (web 60% / books 30%
      // / …) by downsampling over-represented sources. Target weights
      // here derive deterministically from the source id (idx%4 + 1, so
      // the fixture's uniform sources get a non-trivial 1:2:3:4 target).
      // B = the largest total budget every source can supply at its
      // target share (exact integer arithmetic: min over sources of
      // n_s*W DIV w_s); each source then samples at rate w_s·B/(W·n_s).
      //
      // Scale shape: membership is RATE-based (hash-bucket Bernoulli,
      // map-side like q_sample_hash) rather than exact-count — an exact
      // take_s would need a per-source top-k whose final rank pass lands
      // each source in ONE task, and at 100 TB a source is most of the
      // corpus. The per-source stats table is sources-sized (tiny): its
      // aggregation is one partial-agg shuffle, the two corpus-wide
      // scalars attach as scalar subqueries (no join node), and the
      // per-doc membership join is an AQE-broadcast of the stats table.
      // Long arithmetic bound: w*B*1e6 stays under 2^63 up to ~1.8e11
      // docs per source at W=50 — two orders past a 100 TB corpus.
      val wgt = (srcNum % 4) + 1
      val docs = documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("w", wgt)
      // NB "wsum", not "W": resolution is case-insensitive in BOTH engines
      // (a column literally named W would collide with w)
      val srcs = docs.groupBy("source", "w").agg(count(lit(1)).as("n"))
      // wsum and B ride single-partition WINDOWS over the sources-sized
      // rollup (the q_mix_alpha device) instead of chained scalar
      // subqueries (r18, guide §2.4): each subquery level was its own
      // query execution — separate jobs re-running the rollup subtree —
      // where the windows stack on ONE bounded-block exchange. Values
      // identical: same per-row expressions, same min/sum domains.
      val thresh = srcs
        .withColumn("wsum", sum("w").over(wWhole))
        .withColumn("B", min(expr("n * wsum DIV w")).over(wWhole))
        .select(col("source"), col("w"), col("n"),
          expr("w * B * 1000000 DIV (wsum * n)").as("thresh_e6"))
      docs
        .withColumn("bucket", pmod(md5long(col("doc_id").cast("string")), lit(1000000L)))
        .join(thresh.drop("w"), Seq("source"))
        .groupBy("source", "w", "n", "thresh_e6")
        .agg(sum(when(col("bucket") < col("thresh_e6"), 1L).otherwise(0L))
          .as("n_sampled"))
        .orderBy("source")
    }),

    "q_mix_temperature" -> ((s, d) => {
      // TEMPERATURE-resampled source mixing (public: Conneau et al. 2019,
      // XLM-R §3.1; also mT5): target share p_s ∝ n_s^α with α < 1 flattens
      // a skewed source-size distribution toward uniform — the standard
      // multilingual/multi-source rebalancing rule, where q_mix_sources
      // takes EXPLICIT target weights this derives them from the corpus
      // itself. α = 1/2 here because IEEE-754 sqrt is correctly rounded in
      // both engines (bit-exact cross-engine, unlike pow()); a production α
      // is a swap of the one weight expression. The fixture's sources are
      // uniform, so stage 1 first induces a deterministic 1:2:3:4 size skew
      // (hash-bucket membership, the q_sample_hash rule) and stage 2
      // temperature-flattens exactly that skewed corpus.
      //
      // Scale shape: identical to q_mix_sources — the stats table is
      // sources-sized, corpus scalars attach as scalar subqueries, and
      // per-doc membership is a second, INDEPENDENT hash (seeded — reusing
      // the stage-1 bucket would correlate the two Bernoulli draws and bias
      // the realized rate to thresh/cut instead of thresh/1e6). Raw sqrt
      // weights are quantized to e3 proportions (±0.5/1000 per share,
      // clamp-up to 1 — the mixCorpus rule) so the exact-Long envelope is
      // q_mix_sources': w_e3·B·1e6 ≤ wsum·n·1e6 ≈ n·1e9, safe past 9·10⁹
      // docs per source.
      val idx = srcNum % 4 + 1
      val docs = documents(s, d).select(col("doc_id"), col("source"))
        .withColumn("cut", idx * 250000L)
        .withColumn("b1", pmod(md5long(col("doc_id").cast("string")), lit(1000000L)))
        .filter(col("b1") < col("cut"))
        .select(col("doc_id"), col("source"),
          pmod(md5longSeeded(col("doc_id").cast("string"), lit("t")),
               lit(1000000L)).as("bucket"))
      val srcs = docs.groupBy("source").agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt(col("n").cast("double")) * 1000).cast("long"))
      // the three corpus scalars (wraw, wsum, B) stack as single-partition
      // windows on the sources-sized rollup (the q_mix_sources note —
      // r18, guide §2.4): the scalar-subquery chain was three nested query
      // executions, each its own jobs
      val thresh = srcs
        .withColumn("wraw", sum("w").over(wWhole))
        .withColumn("w_e3", greatest(expr("w * 1000 DIV wraw"), lit(1L)))
        .withColumn("wsum", sum("w_e3").over(wWhole))
        .withColumn("B", min(expr("n * wsum DIV w_e3")).over(wWhole))
        .select(col("source"), col("n"), col("w_e3"),
          expr("w_e3 * B * 1000000 DIV (wsum * n)").as("thresh_e6"))
      docs.join(thresh, Seq("source"))
        .groupBy("source", "n", "w_e3", "thresh_e6")
        .agg(sum(when(col("bucket") < col("thresh_e6"), 1L).otherwise(0L))
          .as("n_sampled"))
        .orderBy("source")
    }),

    "q_sample_fixed" -> ((s, d) =>
      // Fixed-SIZE deterministic sample — the reproducible eval-subset
      // selector (rate-based q_sample_hash cannot hit an exact count;
      // human-eval and regression suites need exactly k docs that never
      // shift run-to-run or engine-to-engine): the k lowest md5-hash
      // keys, i.e. a uniform k-subset that is a pure function of the
      // corpus ids. Shape: global top-k = TakeOrderedAndProject
      // (per-partition top-k partials, k·P rows to the final merge —
      // never a full sort); hash ties cannot occur at md5 width but
      // doc_id tie-breaks anyway (determinism is contractual, not
      // probabilistic).
      documents(s, d)
        .select(col("doc_id"),
          md5long(col("doc_id").cast("string")).as("hk"))
        .orderBy(col("hk"), col("doc_id"))
        .limit(100)),

    "q_mix_epochs" -> ((s, d) => {
      // Data-constrained EPOCH schedule (public: Muennighoff et al. 2023,
      // "Scaling Data-Constrained Language Models", NeurIPS): when the
      // token budget T exceeds the unique corpus, sources must REPEAT —
      // and repeating beyond ~4 epochs returns rapidly diminishing value,
      // so per-source epochs cap at 4. This operator derives the schedule:
      // temperature target shares (the q_mix_temperature sqrt rule —
      // correctly-rounded IEEE sqrt, e3 quantization, same Long envelope),
      // per-source target_tokens = T·w_s/W with T = 3× unique tokens (a
      // data-constrained overtrain), epochs_e3 = min(target·10³ DIV n_s,
      // 4000), and the realized allocation n_s·epochs_e3 DIV 10³ — the
      // capped sources are exactly the paper's bottleneck: their shortfall
      // is what a curation team goes and crawls more of.
      //
      // Scale shape: one corpus-scan source-keyed token aggregation
      // (map-side partial → sources-sized table); BOTH corpus totals
      // (quantized weight sum + unique-token total) ride ONE struct
      // scalar subquery (the bm25 rule — no join node, no second corpus
      // pass); everything downstream is arithmetic on the sources-sized
      // table. Long envelope: 2·T·w_e3 ≤ 6·ntot·10³ < 2⁶³ to ~1.5e15
      // unique tokens (≈ 7 PB of text) — DECIMAL(38) swap is shape-free
      // past it. Stage-1 skew induction (the q_mix_temperature fixture
      // rule) makes the 4-epoch cap non-vacuous on the uniform fixture:
      // the smallest source's flattened target overshoots 4 epochs.
      val idx = srcNum % 4 + 1
      val docs = documents(s, d)
        .withColumn("cut", idx * 250000L)
        .withColumn("b1", pmod(md5long(col("doc_id").cast("string")), lit(1000000L)))
        .filter(col("b1") < col("cut"))
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("t"))
      epochSchedule(docs)
    }),

    "q_mix_unique" -> ((s, d) => {
      // DEDUP-AWARE epoch schedule — the composition production mixing
      // actually runs: budgets must count UNIQUE tokens (a source that is
      // 80% internal duplicates supplies far less signal than its raw
      // size claims; Muennighoff et al.'s repeat math presumes unique
      // data), so the exact-dedup keeper (lowest doc_id per content md5 —
      // the q_dedup_content / q_pipeline_corpus rule: digest aggregation
      // + id-keyed semi-join, never a window over the digest) gates the
      // token count, and the SAME epochSchedule core derives the
      // temperature targets and 4-epoch caps from what survives. One
      // more digest aggregation + semi-join over q_mix_epochs' shape.
      val withMd5 = documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .withColumn("m", md5(col("text").cast("binary")))
      val keepers = withMd5.groupBy("m")
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val tok = withMd5.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("t"))
      epochSchedule(tok)
    }),

    "q_pack_docs" -> ((s, d) => {
      // fixed-budget packing: doc i's pack = exclusive-prefix-SUBWORDS/2048
      // within its source shard, in stable doc_id order — the budget is
      // the deterministic subword estimate (see `subwords`), because a
      // context window holds tokenizer pieces, not whitespace words
      // (whitespace packing overfills windows of long-word text). Output
      // is the per-pack fill profile (doc count + token + subword sums).
      val ts = split(col("text"), " ")
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      documents(s, d)
        .select(col("doc_id"), col("source"),
          size(ts).cast("long").as("n_tokens"),
          subwords(ts).as("n_subwords"))
        .withColumn("cum_prev", coalesce(sum(col("n_subwords")).over(w), lit(0L)))
        .withColumn("pack_id", floor(col("cum_prev") / lit(2048L)).cast("long"))
        .groupBy("source", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"),
             sum(col("n_subwords")).as("pack_subwords"))
        .orderBy("source", "pack_id")
    }),

    "q_mix_alpha" -> ((s, d) => {
      // Temperature-EXPONENT sweep — the analysis before committing to
      // q_mix_temperature's α = 1/2: per-source target shares at α ∈
      // {1, 1/2, 1/4}, the three exponents with EXACT cross-engine
      // arithmetic (α = 1 is the identity; IEEE sqrt is correctly
      // rounded, so sqrt and sqrt∘sqrt are bit-identical in both
      // engines — any other α needs pow, which is not). Raw weights
      // quantize to e6 integers BEFORE the share division (integer sums
      // are order-independent where a double Σ over sources depends on
      // accumulation order); the share window rides the sources-sized
      // block (×3 alphas). The share product runs in DECIMAL(38)/HUGEINT
      // on the two engines: the α=1 branch's q is the RAW token count,
      // so a Long q·10⁶ bound at ~9.2e12 tokens/source — an order below
      // the sqrt branches' √n·10¹² envelope and inside the 100 TB north
      // star (r18 self-review). Output ≤ |sources|×3 rows.
      val src = documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("t"))
        .groupBy("source").agg(sum("t").as("n"))
      src.select(col("source"), col("n"),
          explode(array(
            struct(lit(100).as("alpha_pct"), col("n").as("q")),
            struct(lit(50).as("alpha_pct"),
              floor(sqrt(col("n").cast("double")) * 1e6)
                .cast("long").as("q")),
            struct(lit(25).as("alpha_pct"),
              floor(sqrt(sqrt(col("n").cast("double"))) * 1e6)
                .cast("long").as("q")))).as("aq"))
        .select(col("source"), col("n"),
          col("aq.alpha_pct").as("alpha_pct"), col("aq.q").as("q"))
        .withColumn("tot", sum("q").over(Window.partitionBy("alpha_pct")))
        .withColumn("share_ppm",
          expr("CAST(q AS DECIMAL(38,0)) * 1000000 DIV tot"))
        .select("alpha_pct", "source", "n", "share_ppm")
        .orderBy("alpha_pct", "source")
    }),

    "q_mix_gini" -> ((s, d) => {
      // Source-imbalance KPI: the Gini coefficient of per-source token
      // mass — the one-number answer to "how skewed is this mixture?"
      // that motivates q_mix_temperature's flattening (G = 0 balanced,
      // → 1 one source dominates). Exact integer form over the
      // ascending-sorted source table: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) DIV
      // (n·Σx), numerator non-negative by Chebyshev's sum inequality so
      // floor division agrees cross-engine. The rank window rides the
      // SOURCES-sized rollup (≤ |sources| rows — the bounded-block rule
      // from q_text_zipf), never the corpus; the corpus contributes one
      // keyed aggregation. Final arithmetic runs in DECIMAL(38) so the
      // Long token envelope never binds (2·n·Σx·10⁶ overflows Long past
      // ~4.6e11 tokens at 20 sources; the decimal form is shape-free).
      gini(documents(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("t"))
        .groupBy("source").agg(sum("t").as("toks")))
    })
  )

  /** q_mix_gini core over a (source, toks) rollup — factored so specs
    * can pin the exact-integer Gini on crafted masses. */
  private[graft] def gini(src: DataFrame): DataFrame = {
    val w = Window.orderBy(col("toks"), col("source"))
    src.withColumn("i", row_number().over(w))
      .agg(count(lit(1)).as("n_sources"), sum("toks").as("tokens_total"),
           // the i·toks product AND its sum accumulate in DECIMAL(38):
           // a Long sum bound the envelope at ~4.6e17 total tokens while
           // the oracle's HUGEINT sum sailed past — the decimal claim
           // below only held downstream of the sum (r18 self-review)
           sum(expr("CAST(i AS DECIMAL(38,0)) * toks")).as("iw"))
      .withColumn("gini_e6", expr(
        """CAST((2 * CAST(iw AS DECIMAL(38,0))
          |       - (n_sources + 1) * CAST(tokens_total AS DECIMAL(38,0)))
          |      * 1000000
          |      DIV (CAST(n_sources AS DECIMAL(38,0)) * tokens_total)
          |     AS BIGINT)""".stripMargin))
      .select("n_sources", "tokens_total", "gini_e6")
      .orderBy("n_sources")
  }

  private val duckKey = (e: String) => duckMd5Long(s"CAST($e AS VARCHAR)")

  def oracles: Map[String, String] = Map(
    "q_mix_alpha" ->
      """WITH src AS (
        |  SELECT source,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |a AS (
        |  SELECT source, n, 100 AS alpha_pct, n AS q FROM src
        |  UNION ALL
        |  SELECT source, n, 50,
        |         CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
        |  FROM src
        |  UNION ALL
        |  SELECT source, n, 25,
        |         CAST(floor(sqrt(sqrt(CAST(n AS DOUBLE))) * 1e6) AS BIGINT)
        |  FROM src)
        |SELECT CAST(alpha_pct AS INTEGER) AS alpha_pct, source, n,
        |       CAST(CAST(q AS HUGEINT) * 1000000
        |            // sum(q) OVER (PARTITION BY alpha_pct)
        |            AS BIGINT) AS share_ppm
        |FROM a ORDER BY alpha_pct, source""".stripMargin,

    "q_mix_gini" ->
      """WITH src AS (
        |  SELECT source,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, toks,
        |             row_number() OVER (ORDER BY toks, source) AS i
        |      FROM src),
        |a AS (SELECT count(*) AS n_sources,
        |             CAST(sum(toks) AS BIGINT) AS tokens_total,
        |             CAST(sum(i * toks) AS HUGEINT) AS iw
        |      FROM r)
        |SELECT n_sources, tokens_total,
        |       CAST((2 * iw - (n_sources + 1) * tokens_total) * 1000000
        |            // (n_sources * tokens_total) AS BIGINT) AS gini_e6
        |FROM a ORDER BY n_sources""".stripMargin,

    "q_sample_hash" ->
      s"""SELECT doc_id, ${duckKey("doc_id")} % 1000 AS bucket
         |FROM documents
         |WHERE ${duckKey("doc_id")} % 1000 < 100
         |ORDER BY doc_id""".stripMargin,

    "q_sample_stratified" ->
      s"""SELECT c_custkey, c_mktsegment,
         |       CAST(row_number() OVER (PARTITION BY c_mktsegment
         |            ORDER BY ${duckKey("c_custkey")} ASC, c_custkey ASC)
         |            AS BIGINT) AS rn
         |FROM customer
         |QUALIFY rn <= 10
         |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_split_train_test" ->
      s"""SELECT CASE WHEN ${duckKey("doc_id")} % 100 < 80
         |            THEN 'train' ELSE 'test' END AS split,
         |       count(*) AS n
         |FROM documents
         |GROUP BY 1 ORDER BY split""".stripMargin,

    // the subword budget is the REAL greedy tokenization: distinct words →
    // recursive greedy scan against the shared piece vocabulary
    // (SubwordTokenizer.duckWordTokens — ONE definition with the engine) →
    // per-chunk sums joined back. Empty words scan to 0 pieces.
    "q_chunk_docs" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts,
         |         len(string_split(text, ' ')) AS len
         |  FROM documents),
         |wd AS (SELECT DISTINCT unnest(ts) AS w FROM t),
         |${graft.functions.SubwordTokenizer.duckWordTokens},
         |x AS (
         |  SELECT doc_id, ts, len,
         |         unnest(range(0, (len - 1) // 40 + 1)) AS i
         |  FROM t),
         |xt AS (
         |  SELECT doc_id, i,
         |         unnest(list_slice(ts, i * 40 + 1, least(i * 40 + 50, len))) AS w
         |  FROM x),
         |cs AS (
         |  SELECT doc_id, i,
         |         CAST(coalesce(sum(wtoks), 0) AS BIGINT) AS n_chunk_subwords
         |  FROM xt LEFT JOIN wc USING (w) GROUP BY doc_id, i)
         |SELECT x.doc_id,
         |       CAST(x.i AS BIGINT) AS chunk_id,
         |       CAST(len(list_slice(ts, x.i * 40 + 1, least(x.i * 40 + 50, len)))
         |            AS BIGINT) AS n_chunk_tokens,
         |       CAST(strlen(array_to_string(
         |             list_slice(ts, x.i * 40 + 1, least(x.i * 40 + 50, len)), ' '))
         |            AS BIGINT) AS n_chunk_bytes,
         |       cs.n_chunk_subwords,
         |       md5(array_to_string(
         |             list_slice(ts, x.i * 40 + 1, least(x.i * 40 + 50, len)), ' '))
         |         AS chunk_md5
         |FROM x JOIN cs ON x.doc_id = cs.doc_id AND x.i = cs.i
         |ORDER BY x.doc_id, chunk_id""".stripMargin,

    "q_sample_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
         |         CAST(len(list_filter(string_split(text, ' '),
         |              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) AS stop_hits,
         |         CAST(length(text) AS DOUBLE) AS n_chars
         |  FROM documents),
         |q AS (
         |  SELECT doc_id,
         |         CAST(floor((least(n_tok / 400, 1.0) * 0.25
         |                     + (n_uniq / n_tok) * 0.35
         |                     + (1.0 - stop_hits / n_tok) * 0.2
         |                     + least((n_chars - (n_tok - 1)) / n_tok / 8, 1.0) * 0.2)
         |                    * 1e6) AS BIGINT) AS quality_e6,
         |         ${duckKey("doc_id")} % 1000000 AS bucket
         |  FROM t)
         |SELECT doc_id, quality_e6, bucket FROM q
         |WHERE bucket < quality_e6 ORDER BY doc_id""".stripMargin,

    // textbook single-window global ordinal — the engine's bucket
    // prefix-sum must agree exactly; quality CTE restates qualityE6Col
    "q_curriculum" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
         |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
         |         CAST(len(list_filter(string_split(text, ' '),
         |              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) AS stop_hits,
         |         CAST(length(text) AS DOUBLE) AS n_chars
         |  FROM documents),
         |q AS (
         |  SELECT doc_id,
         |         CAST(floor((least(n_tok / 400, 1.0) * 0.25
         |                     + (n_uniq / n_tok) * 0.35
         |                     + (1.0 - stop_hits / n_tok) * 0.2
         |                     + least((n_chars - (n_tok - 1)) / n_tok / 8, 1.0) * 0.2)
         |                    * 1e6) AS BIGINT) AS qe
         |  FROM t),
         |s AS (
         |  SELECT doc_id, 9 - least(9, qe * 10 // 1000000) AS stage,
         |         ${duckKey("doc_id")} AS h
         |  FROM q),
         |o AS (
         |  SELECT doc_id, stage,
         |         CAST(row_number() OVER (ORDER BY stage, h, doc_id) - 1
         |              AS BIGINT) AS ord
         |  FROM s)
         |SELECT doc_id, CAST(stage AS BIGINT) AS stage, ord,
         |       CAST(ord // 64 AS BIGINT) AS shard
         |FROM o ORDER BY ord""".stripMargin,

    "q_mix_sources" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |         ($DuckSrcNum % 4) + 1 AS w
         |  FROM documents),
         |s AS (SELECT source, w, count(*) AS n FROM d GROUP BY source, w),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM s),
         |lim AS (SELECT CAST(min(n * wsum // w) AS BIGINT) AS B FROM s, tot),
         |t AS (SELECT s.source, s.w, s.n,
         |             CAST((s.w * B * 1000000) // (wsum * s.n) AS BIGINT) AS thresh_e6
         |      FROM s, tot, lim)
         |SELECT t.source, t.w, t.n, t.thresh_e6,
         |       CAST(sum(CASE WHEN ${duckKey("d.doc_id")} % 1000000 < t.thresh_e6
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM t JOIN d ON t.source = d.source
         |GROUP BY t.source, t.w, t.n, t.thresh_e6
         |ORDER BY t.source""".stripMargin,

    "q_mix_temperature" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source,
         |         (($DuckSrcNum % 4) + 1)
         |           * 250000 AS cut,
         |         ${duckKey("doc_id")} % 1000000 AS b1
         |  FROM documents),
         |d AS (
         |  SELECT doc_id, source,
         |         ${duckMd5LongSeeded(s"CAST(doc_id AS VARCHAR)", "'t'")} % 1000000
         |           AS bucket
         |  FROM d0 WHERE b1 < cut),
         |s AS (SELECT source, count(*) AS n FROM d GROUP BY source),
         |s2 AS (SELECT source, n,
         |              CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS w
         |       FROM s),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wraw FROM s2),
         |q AS (SELECT source, n, greatest(w * 1000 // wraw, 1) AS w_e3
         |      FROM s2, tot),
         |tq AS (SELECT CAST(sum(w_e3) AS BIGINT) AS wsum FROM q),
         |lim AS (SELECT CAST(min(n * wsum // w_e3) AS BIGINT) AS B FROM q, tq),
         |t AS (SELECT q.source, q.n, q.w_e3,
         |             CAST((q.w_e3 * B * 1000000) // (wsum * q.n) AS BIGINT)
         |               AS thresh_e6
         |      FROM q, tq, lim)
         |SELECT t.source, t.n, t.w_e3, t.thresh_e6,
         |       CAST(sum(CASE WHEN d.bucket < t.thresh_e6 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_sampled
         |FROM t JOIN d USING (source)
         |GROUP BY t.source, t.n, t.w_e3, t.thresh_e6
         |ORDER BY t.source""".stripMargin,

    "q_sample_fixed" ->
      s"""SELECT doc_id, ${duckKey("doc_id")} AS hk
         |FROM documents
         |ORDER BY hk, doc_id LIMIT 100""".stripMargin,

    "q_mix_epochs" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, source, text,
         |         (($DuckSrcNum % 4) + 1) * 250000 AS cut,
         |         ${duckKey("doc_id")} % 1000000 AS b1
         |  FROM documents),
         |d AS (SELECT source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
         |      FROM d0 WHERE b1 < cut),
         |s AS (SELECT source, CAST(sum(t) AS BIGINT) AS n_tokens
         |      FROM d GROUP BY source),
         |s2 AS (SELECT source, n_tokens,
         |              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000)
         |                   AS BIGINT) AS w
         |       FROM s),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wraw FROM s2),
         |q AS (SELECT source, n_tokens, greatest(w * 1000 // wraw, 1) AS w_e3
         |      FROM s2, tot),
         |tq AS (SELECT CAST(sum(w_e3) AS BIGINT) AS wsum,
         |              CAST(sum(n_tokens) AS BIGINT) AS ntot FROM q),
         |e AS (SELECT q.source, q.n_tokens, q.w_e3,
         |             CAST(3 AS HUGEINT) * ntot * q.w_e3 // wsum AS target_tokens
         |      FROM q, tq),
         |f AS (SELECT *, least(CAST(target_tokens AS HUGEINT) * 1000 // n_tokens, 4000)
         |               AS epochs_e3
         |      FROM e)
         |SELECT source, n_tokens, w_e3,
         |       CAST(target_tokens AS BIGINT) AS target_tokens,
         |       CAST(epochs_e3 AS BIGINT) AS epochs_e3,
         |       CAST(CAST(n_tokens AS HUGEINT) * epochs_e3 // 1000 AS BIGINT) AS alloc_tokens,
         |       epochs_e3 = 4000 AS capped
         |FROM f ORDER BY source""".stripMargin,

    "q_mix_unique" ->
      s"""WITH k AS (
         |  SELECT doc_id, source, text FROM documents
         |  QUALIFY row_number() OVER (PARTITION BY md5(text)
         |                             ORDER BY doc_id) = 1),
         |d AS (SELECT source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS t
         |      FROM k),
         |s AS (SELECT source, CAST(sum(t) AS BIGINT) AS n_tokens
         |      FROM d GROUP BY source),
         |s2 AS (SELECT source, n_tokens,
         |              CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000)
         |                   AS BIGINT) AS w
         |       FROM s),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wraw FROM s2),
         |q AS (SELECT source, n_tokens, greatest(w * 1000 // wraw, 1) AS w_e3
         |      FROM s2, tot),
         |tq AS (SELECT CAST(sum(w_e3) AS BIGINT) AS wsum,
         |              CAST(sum(n_tokens) AS BIGINT) AS ntot FROM q),
         |e AS (SELECT q.source, q.n_tokens, q.w_e3,
         |             CAST(3 AS HUGEINT) * ntot * q.w_e3 // wsum AS target_tokens
         |      FROM q, tq),
         |f AS (SELECT *, least(CAST(target_tokens AS HUGEINT) * 1000 // n_tokens, 4000)
         |               AS epochs_e3
         |      FROM e)
         |SELECT source, n_tokens, w_e3,
         |       CAST(target_tokens AS BIGINT) AS target_tokens,
         |       CAST(epochs_e3 AS BIGINT) AS epochs_e3,
         |       CAST(CAST(n_tokens AS HUGEINT) * epochs_e3 // 1000 AS BIGINT) AS alloc_tokens,
         |       epochs_e3 = 4000 AS capped
         |FROM f ORDER BY source""".stripMargin,

    // same tokenizer-faithful budget as q_chunk_docs: per-doc subwords are
    // the summed greedy piece counts of the doc's words
    "q_pack_docs" ->
      s"""WITH RECURSIVE dw AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         |wd AS (SELECT DISTINCT w FROM dw),
         |${graft.functions.SubwordTokenizer.duckWordTokens},
         |ds AS (
         |  SELECT doc_id, CAST(coalesce(sum(wtoks), 0) AS BIGINT) AS n_subwords
         |  FROM dw LEFT JOIN wc USING (w) GROUP BY doc_id),
         |t AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
         |         ds.n_subwords
         |  FROM documents d JOIN ds USING (doc_id)),
         |c AS (
         |  SELECT doc_id, source, n_tokens, n_subwords,
         |         COALESCE(sum(n_subwords) OVER (
         |           PARTITION BY source ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS cum_prev
         |  FROM t)
         |SELECT source, CAST(floor(cum_prev / 2048) AS BIGINT) AS pack_id,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |       CAST(sum(n_subwords) AS BIGINT) AS pack_subwords
         |FROM c GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin
  )
}
