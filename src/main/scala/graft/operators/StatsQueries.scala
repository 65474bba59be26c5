package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Statistical + collection aggregates (inventory extension): exact
  * percentiles/median, sample stddev/variance, correlation, and array
  * collection — the remaining aggregate categories a reference user would
  * reach for.
  *
  * Parity: percentile/median interpolate over sorted exact values with the
  * same linear formula in both engines — deterministic. stddev/corr are
  * floating accumulations (order-dependent), so they surface through
  * floor at 1e-6 — the grid is 10⁴× the worst-case cross-engine delta.
  * Collected arrays are sorted and joined to strings so ordering is pinned
  * and the compared value is a scalar.
  */
object StatsQueries {

  /** Memoized + artifact-served per-group QUARTILE MODEL for the outlier
    * profile (r16): (l_returnflag, p, value) from the Quantiles
    * refinement — GROUPS·2 driver-bounded rows, fit once per corpus and
    * served like any trained model (fingerprint on lineitem.parquet).
    * Every bench run of q_stats_outliers was re-running the whole
    * multi-pass refinement (~1.25 s at sf0.1) because the result is
    * driver-assembled at plan-construction time and no run could reuse
    * the previous one's work.
    */
  private val quartileMemo = new graft.api.SessionMemo[DataFrame]()

  private[graft] def outlierQuartiles(s: SparkSession,
                                      d: String): DataFrame =
    quartileMemo.get(s, "oquart", d) {
      // digested fingerprint (r16 review): quartiles of an in-place
      // rewritten corpus must refit, not serve stale fences
      val fp = graft.api.IndexArtifacts.fileFingerprintDigest(
        s"$d/lineitem.parquet") + ":oquart-v1:p25-75"
      val slug = d.replaceAll("[^A-Za-z0-9]+", "_")
      val table = s"g_model_oquart_$slug"
      graft.api.IndexArtifacts.readModel(s, table, fp) match {
        case Some(m) =>
          DedupQueries.noteDerivedSource(s, "stats_quartiles", "artifact")
          m
        case None =>
          DedupQueries.noteDerivedSource(s, "stats_quartiles", "fit")
          val qs = graft.api.Quantiles.exactQuantiles(
            lineitem(s, d).select("l_returnflag", "l_extendedprice"),
            "l_returnflag", "l_extendedprice", Seq(0.25, 0.75))
          graft.api.IndexArtifacts.persistModel(s, qs, table, fp)
          graft.api.IndexArtifacts.readModel(s, table, fp).getOrElse(qs)
      }
    }

  private[graft] def releaseQuartiles(s: SparkSession): Unit =
    quartileMemo.release(s)

  /** The one-time quartile fit as a NAMED bench phase (the trainPhases
    * convention), so q_stats_outliers' per-run numbers are query-only. */
  private[graft] def statsPhases(s: SparkSession, d: String)
      : Seq[(String, () => Long, () => String)] = Seq(
    ("stats_quartiles", () => outlierQuartiles(s, d).count(),
      () => DedupQueries.derivedSourceOf(s, "stats_quartiles")))

  type Q = (SparkSession, String) => DataFrame

  private def floor6(c: org.apache.spark.sql.Column) = floor(c * 1e6) / 1e6

  def queries: Map[String, Q] = Map(
    "q_agg_stats" -> ((s, d) =>
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          median(col("o_totalprice")).as("med_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"),
          floor6(stddev_samp(col("o_totalprice"))).as("sd_price"),
          floor6(corr(col("o_totalprice"), col("o_custkey"))).as("corr_pk"))
        .orderBy("o_orderstatus")),

    "q_agg_collect" -> ((s, d) =>
      // array_agg with pinned ordering, emitted as a scalar string
      nation(s, d)
        .groupBy("n_regionkey")
        .agg(
          concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
          count(lit(1)).as("n"))
        .orderBy("n_regionkey")),

    "q_stats_covariance" -> ((s, d) => {
      // Exact-integer covariance matrix over lineitem's four price-model
      // columns — the numeric-profiling lens beside q_agg_stats' float
      // corr (which surfaces through floor6; THIS op's compare surface is
      // exact): cents-quantize floor(x·100) map-side, then ONE aggregation
      // computes n, Σx, and every pairwise Σxy in DECIMAL(38,0) — 15
      // cells of O(1) state at any scale, no per-pair passes. Cells
      // unfold to the 6 (col_a, col_b) rows with exact numerators
      // n·Σxy − Σx·Σy (covariance) and n·Σx² − (Σx)² (variances, so a
      // reader can form corr² without another pass), try_cast BIGINT
      // outputs (overflow surfaces as null past the DECIMAL envelope,
      // never a wrapped Long). q_emb_covariance is this op's wide-column
      // sibling — there d²-state rides a typed Aggregator; here 4
      // columns fit ordinary aggregate expressions.
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val idx = cs.indices
      val q = lineitem(s, d).select(cs.zipWithIndex.map { case (c, i) =>
        floor(col(c) * 100).cast("long").as(s"x$i") }: _*)
      // products multiply in LONG, accumulate in DECIMAL(38,0) (r18,
      // guide §1.2 per-task work): the old cast-then-multiply form ran 10
      // BigDecimal multiplies per row — measured 1.3 s of single-core
      // task time, the query's whole cost. The Long product is exact
      // under a PER-ROW VALUE envelope (|xᵢ| ≤ ~3·10⁹, i.e. ~3·10⁷
      // dollars per cents cell — 100× the TPC-H money domain), which
      // unlike the SUM does not grow with the corpus; ANSI overflow is
      // loud past it (the q_emb_dims documented-envelope rule). The SUM
      // stays DECIMAL(38,0) — scale-safe as before, and the decimal adds
      // ride the compact fast path. Values bit-identical to the oracle's
      // HUGEINT products wherever the envelope holds.
      // ADVICE r18: the Long product's exactness past the documented
      // envelope depends on ANSI making overflow LOUD — under
      // spark.sql.ansi.enabled=false a wrapped Long would silently
      // corrupt the statistic. A non-ANSI session therefore falls back
      // to the decimal multiply (the pre-r18 form: slower, never wrong);
      // every engine entry point runs ANSI-on, so the fast path is what
      // the bench and driver measure.
      val ansiOn =
        try s.conf.get("spark.sql.ansi.enabled", "true").toBoolean
        catch { case _: Exception => false }
      val prodExpr: (Int, Int) => String =
        if (ansiOn) (i, j) => s"cast(x$i * x$j AS DECIMAL(38,0))"
        else (i, j) => s"cast(x$i AS DECIMAL(38,0)) * x$j"
      val sums =
        (count(lit(1)).as("n") +:
         idx.map(i => sum(expr(s"cast(x$i AS DECIMAL(38,0))")).as(s"s$i"))) ++
        (for { i <- idx; j <- idx if j >= i } yield
          sum(expr(prodExpr(i, j))).as(s"p${i}_$j"))
      val pairs = for { i <- idx; j <- idx if j > i } yield (i, j)
      q.agg(sums.head, sums.tail: _*)
        .select(explode(array(pairs.map { case (i, j) =>
          struct(lit(cs(i)).as("col_a"), lit(cs(j)).as("col_b"), col("n"),
            (col("n") * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j"))
              .as("cov_d"),
            (col("n") * col(s"p${i}_$i") - col(s"s$i") * col(s"s$i"))
              .as("vara_d"),
            (col("n") * col(s"p${j}_$j") - col(s"s$j") * col(s"s$j"))
              .as("varb_d")) }: _*)).as("c"))
        .select(col("c.col_a").as("col_a"), col("c.col_b").as("col_b"),
          col("c.n").as("n"),
          expr("try_cast(c.cov_d AS BIGINT)").as("cov_num"),
          expr("try_cast(c.vara_d AS BIGINT)").as("var_a_num"),
          expr("try_cast(c.varb_d AS BIGINT)").as("var_b_num"))
        .orderBy("col_a", "col_b")
    }),

    "q_stats_ks" -> ((s, d) =>
      // Exact two-sample Kolmogorov–Smirnov drift (public: Kolmogorov
      // 1933 / Smirnov 1948) between the even- and odd-orderkey halves
      // of lineitem's price column — the distribution-drift gate a
      // pipeline runs between two crawls/shards/time slices where the
      // frequency-based drift ops (q_text_drift, q_emb_drift) compare
      // discrete masses: KS compares the full CDFs and catches a pure
      // location/scale shift no top-k frequency diff sees. Values
      // cents-quantized map-side (the q_stats_covariance device) so the
      // whole statistic is exact integers — see [[ksStat]] for the
      // distributed two-level prefix-sum shape.
      // examined r18: a fanOut before cohortCounts was tried and REVERTED
      // — the price column is ~97% distinct at the fixture scale, so the
      // map-side partial agg compresses nothing and the added round-robin
      // exchange (plus its sortBeforeRepartition local sort) cost more
      // than the serial partial agg it parallelized (micro-measured
      // 0.66 s → 1.1 s on the agg alone). The two-level prefix-sum shape
      // stands as audited in r9.
      ksStat(lineitem(s, d).select(
        floor(col("l_extendedprice") * 100).cast("long").as("v"),
        (col("l_orderkey") % 2 === 0).as("in_a")))),

    "q_stats_mwu" -> ((s, d) =>
      // Exact Mann–Whitney U / ROC-AUC drift between the same even/odd
      // orderkey halves q_stats_ks compares — the rank-based dominance
      // reading beside KS's CDF-gap reading (a null split: auc_e6 should
      // sit near 500000; a sustained deviation on a production split is
      // the "new crawl skews larger" gate). See [[mwuStat]].
      // examined r18: fanOut tried and reverted — see the q_stats_ks note
      mwuStat(lineitem(s, d).select(
        floor(col("l_extendedprice") * 100).cast("long").as("v"),
        (col("l_orderkey") % 2 === 0).as("in_a")))),

    "q_stats_outliers" -> ((s, d) => {
      // Tukey-fence outlier profile (public: Tukey 1977 — the boxplot
      // rule): per-group exact quartiles → fences [q1−1.5·IQR,
      // q3+1.5·IQR], rows outside are counted. The quartiles come from
      // graft.api.Quantiles — iterative histogram refinement with
      // BOUNDED executor state (bins·targets cells, never a values
      // buffer), replacing Spark's exact `percentile`, whose per-group
      // O(group size) ImperativeAggregate buffer is an executor-memory
      // killer at 3 groups × 10⁹ rows (VERDICT r10 #2). Identical
      // doubles: same order statistics, same lo + (hi−lo)·frac
      // interpolation — the DuckDB quantile_cont oracle stays hash-exact
      // (doubles round-trip the model parquet bit-exactly, the ivfpq
      // precedent). The refinement is a MULTI-PASS corpus scan whose
      // result is a GROUPS-sized table → the KMeans/funnel_lags doctrine
      // (r16): fit once per (session, dir), artifact-served keyed by the
      // lineitem fingerprint, attributed as the `stats_quartiles` bench
      // phase — the query itself measures fence-join cost only.
      // Shape at 100 TB: GROUPS-sized quartile table broadcast into the
      // fence join-back; output is the per-group rollup, not flagged rows.
      val qs = outlierQuartiles(s, d)
      val q = qs.groupBy("l_returnflag").agg(
        max(when(col("p") === 0.25, col("value"))).as("q1"),
        max(when(col("p") === 0.75, col("value"))).as("q3"))
      tukeyProfile(lineitem(s, d), q)
    }),

    "q_stats_outliers_approx" -> ((s, d) => {
      // The sketch twin (the q_corpus_profile/_approx precedent): same
      // Tukey fences over percentile_approx quartiles — per-group state
      // is the KLL-style sketch (accuracy-bounded, map-side combinable),
      // the high-cardinality-groups production path where even
      // Quantiles' per-group targets would crowd the driver. No DuckDB
      // oracle (sketch internals are engine-specific); EngineSpec pins
      // the fence counts against the exact twin within tolerance.
      // examined r18: fanOut before the sketch build tried and reverted —
      // the added exchange cost more than the serialized sketch updates
      // it spread (the q_stats_ks finding); shape unchanged
      val q = lineitem(s, d).select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag").agg(
        percentile_approx(col("l_extendedprice"), lit(0.25), lit(10000)).as("q1"),
        percentile_approx(col("l_extendedprice"), lit(0.75), lit(10000)).as("q3"))
      tukeyProfile(lineitem(s, d), q)
    }),

    "q_agg_histogram" -> ((s, d) =>
      // Fixed-width histogram: the bucket id is a map-side floor division
      // (no distinct-values pass, no sort), then one count/sum/min/max
      // aggregation — the profile-a-column shape at any scale. min/max of
      // doubles are order-independent; the sum is exact decimal (Parity).
      lineitem(s, d)
        .select(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"),
                col("l_extendedprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             graft.functions.Parity.sumMoney(col("l_extendedprice")).as("sum_price"),
             min(col("l_extendedprice")).as("min_price"),
             max(col("l_extendedprice")).as("max_price"))
        .orderBy("bucket")),

    "q_corpus_profile" -> ((s, d) =>
      // Per-source corpus profile — the first query run on a new corpus:
      // volume, token totals, length distribution, mean quality. One
      // source-keyed aggregation over map-side per-doc projections (the
      // quality score is TextQueries.qualityE6Col — the one definition).
      // Median is the exact sorted-agg variant (q_agg_stats precedent) —
      // it is the t2 oracle path; q_corpus_profile_approx below is the
      // 100 TB production variant. Mean quality stays in exact BIGINT
      // floor division, never a double average of corpus-scale sums.
      corpusProfile(documents(s, d), median(col("n_tokens")))),

    "q_corpus_profile_approx" -> ((s, d) =>
      // q_corpus_profile's declared 100 TB swap, made real: exact median
      // is a sorted full-value aggregation — on a fresh 100 TB corpus the
      // profile would sort every document length — while
      // percentile_approx's mergeable sketch combines map-side partials
      // in one small shuffle (q_approx_quantile precedent). Same schema
      // as the exact profile; t2-excluded like the other sketch ops
      // (sketch internals are engine-specific), accuracy pinned by
      // EngineSpec at ±2% of the exact median per source.
      corpusProfile(documents(s, d),
        percentile_approx(col("n_tokens"), lit(0.5), lit(10000))
          .cast("double"))),

    "q_stats_benford" -> ((s, d) => {
      // First-significant-digit distribution vs Benford's law (public:
      // Newcomb 1881 / Benford 1938) — the data-quality / fraud screen a
      // pipeline runs over any money or measurement column: natural
      // multiplicative data follows P(d) = log10(1 + 1/d); fabricated or
      // truncated feeds don't. Exact parity: the digit comes from the
      // decimal string of the exact BIGINT cents value (never log10 of a
      // double at runtime), the expected ppm per digit is a baked literal
      // table (floor(log10(1+1/d)·10⁶) — computed once, identical bytes
      // in both engines), and shares are exact Long floor divisions.
      // Shape: map-side digit projection → 9-row aggregation; the corpus
      // total attaches as a scalar subquery on the digit rollup (no join
      // node). At 100 TB this is one partial-combining pass.
      benford(orders(s, d), "o_totalprice")
    }),

    "q_approx_quantile" -> ((s, d) =>
      // Approximate quantiles via the mergeable percentile sketch — the
      // 100 TB path for p50/p90/p99: map-side partial sketches merge in
      // one small shuffle, where the exact percentile above must ship
      // every group value to a sorted aggregation. t2-excluded like
      // q_approx_distinct (sketch internals are engine-specific);
      // accuracy pinned by EngineSpec at ±2% vs the exact percentiles.
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"),
               array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("q"))
        .select(col("o_orderstatus"),
          element_at(col("q"), 1).as("p50"),
          element_at(col("q"), 2).as("p90"),
          element_at(col("q"), 3).as("p99"))
        .orderBy("o_orderstatus"))
  )

  /** q_stats_benford core over any 2-decimal money column: digit =
    * first char of the exact BIGINT cents string; expected ppm from the
    * baked floor(log10(1+1/d)·10⁶) table. Factored for crafted specs. */
  private[graft] def benford(df: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expect = array(lit(301029L), lit(176091L), lit(124938L),
      lit(96910L), lit(79181L), lit(66946L), lit(57991L), lit(51152L),
      lit(45757L))
    // abs() first: a negative amount's cents string would lead with '-'
    // (null digit); Benford's law reads the magnitude. Zero amounts have
    // no first significant digit — filtered AFTER the rollup here (r18,
    // guide §2.4): grouping ALL rows (null/zero digits form their own ≤2
    // extra groups) makes the corpus total a single-partition window SUM
    // over the ≤11-row digit rollup — a bounded block, the q_mix_alpha
    // device — where the scalar-subquery form re-scanned the corpus for
    // count(*). One scan instead of two; t is identical (every input row
    // lands in exactly one digit group). The digit≥1 filter still runs
    // BEFORE the expectation lookup (element_at at index 0 throws under
    // Spark's 1-based array indexing where DuckDB's [0] reads NULL).
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(substring(
        expr(s"CAST(CAST(round(abs($c) * 100) AS BIGINT) AS STRING)"),
        1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("t", sum("n").over(wAll))
      .filter(col("digit") >= 1)
      .withColumn("share_ppm", expr("n * 1000000 DIV t"))
      .withColumn("benford_ppm", element_at(expect, col("digit")))
      .withColumn("delta_ppm", abs(col("share_ppm") - col("benford_ppm")))
      .select("digit", "n", "share_ppm", "benford_ppm", "delta_ppm")
      .orderBy("digit")
  }

  /** Per-distinct-value cohort counts (v, c1, c2) — stage (1) of the
    * two-level prefix sum, shared by [[ksStat]] and [[mwuStat]]. */
  private def cohortCounts(obs: DataFrame): DataFrame =
    obs.groupBy("v").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("in_a"), 0L).otherwise(1L)).as("c2"))

  /** Stages (2)–(4) of the distributed prefix sum over [[cohortCounts]]
    * output: (v, c1, c2, k1, k2, n1, n2) with k = INCLUSIVE cumulative
    * counts in value order and n = the COHORT TOTALS. Shared by
    * [[ksStat]] and [[mwuStat]] — see [[ksStat]] for the shape rationale
    * (bounded bin table, bin-partitioned in-bin windows, broadcast
    * offset re-attach).
    *
    * r19 (VERDICT r18 #7): two structural changes, both
    * corpus-agg-evaluation removers with IDENTICAL semantics —
    *   1. the totals ride the bin rollup's own bounded window
    *      (n = Σ_bins b ≡ Σ_v c exactly: every vals row lands in one
    *      bin group, the null bin included) instead of a THIRD
    *      evaluation of `vals` crossJoined back as a broadcast;
    *   2. the offset re-attach is a LEFT join: the inner form's
    *      constraint inference pushed isnotnull(bin)→isnotnull(v) into
    *      ONE branch's scan, de-canonicalizing the two `vals` subtrees
    *      so ReuseExchange could not share the corpus aggregation (the
    *      r18 examined-and-left finding, now closed). Every non-null
    *      bin exists on both sides by construction, so left ≡ inner
    *      there; a null-v row (null bin) was DROPPED by the inner join
    *      and now survives with null o/k — and a null k makes its
    *      ks/mwu term null, which max()/sum() skip: contributes
    *      nothing, exactly as the drop did.
    */
  private def cdfAttach(vals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binned = vals.withColumn("bin", expr("v DIV 65536"))
    // exclusive prefix over the bounded bin table: rows here are one per
    // bin, so the unpartitioned window is a deliberate bounded-state
    // single partition (the Quantiles GROUPS-table precedent); the
    // full-frame totals ride the same bounded table
    val wBins = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = binned.groupBy("bin")
      .agg(sum("c1").as("b1"), sum("c2").as("b2"))
      .select(col("bin"),
        coalesce(sum("b1").over(wBins), lit(0L)).as("o1"),
        coalesce(sum("b2").over(wBins), lit(0L)).as("o2"),
        sum("b1").over(wAll).as("n1"),
        sum("b2").over(wAll).as("n2"))
    val wIn = Window.partitionBy("bin").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    binned.join(broadcast(offs), Seq("bin"), "left")
      .select(col("v"), col("c1"), col("c2"),
        (col("o1") + sum("c1").over(wIn)).as("k1"),
        (col("o2") + sum("c2").over(wIn)).as("k2"),
        col("n1"), col("n2"))
  }

  /** Exact two-sample KS statistic over integer-quantized observations:
    * input (v: BIGINT, in_a: BOOLEAN) rows, output ONE row (n1, n2,
    * d_num, ks_e6) where d_num = max over values of |k1·n2 − k2·n1|
    * (k = cumulative counts — the CDF difference cleared of both
    * denominators) and ks_e6 = d_num·10⁶ DIV (n1·n2), the KS D in exact
    * millionths. Requires both cohorts non-empty (D is undefined
    * otherwise — the DIV is ANSI-loud, never a silent zero).
    *
    * Shape at 100 TB: the textbook exact form is one GLOBAL ordered
    * cumulative sum — a single-partition window over every distinct
    * value, the classic scale-killer. This rides the distributed
    * two-level prefix sum instead ([[cohortCounts]] stage 1,
    * [[cdfAttach]] stages 2–4): (1) per-value counts, one keyed exchange
    * with map-side partials; (2) per-BIN totals (bin = v DIV 2¹⁶ — the
    * value RANGE div 2¹⁶, a bounded table) cumsum'd on a window that
    * only ever sees bin-rows; (3) within-bin cumsums under a
    * (bin)-PARTITIONED window — parallel, each partition bounded by one
    * bin's distinct-value count; (4) bin offsets broadcast back, final
    * cumulative = offset + in-bin. No stage holds more than one bin of
    * values in a single window partition. Products ride DECIMAL(38,0)
    * (k·n ≈ n² wraps Long past ~3·10⁹ rows per cohort) with try_cast
    * BIGINT outputs — the repo's exact-integer envelope convention.
    */
  private[graft] def ksStat(obs: DataFrame): DataFrame =
    // n1/n2 ride cdfAttach's bounded bin rollup (r19 — see its doc);
    // the old tot branch was a third full evaluation of the cohort
    // aggregation, crossJoined back as a 1-row broadcast
    cdfAttach(cohortCounts(obs))
      .select(col("n1"), col("n2"),
        abs(expr("CAST(k1 AS DECIMAL(38,0)) * n2" +
                 " - CAST(k2 AS DECIMAL(38,0)) * n1")).as("dd"))
      .groupBy("n1", "n2")
      .agg(max("dd").as("d_dec"))
      // the degenerate every-value-null input used to yield ZERO rows
      // (its lone cdf row dropped at the inner bin join); the left join
      // keeps that row with a null dd, so the all-null group filters
      // out AFTER the rollup — a post-agg filter, nothing to push down
      .filter(col("d_dec").isNotNull)
      .select(col("n1"), col("n2"),
        expr("try_cast(d_dec AS BIGINT)").as("d_num"),
        expr("try_cast(d_dec * 1000000 DIV" +
             " (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("ks_e6"))

  /** Exact two-sample Mann–Whitney U over integer-quantized observations
    * (public: Wilcoxon 1945; Mann & Whitney 1947) — the rank-based drift
    * test beside [[ksStat]]'s CDF-gap: KS reads the largest LOCAL
    * distribution gap, U reads GLOBAL stochastic dominance (is cohort A
    * systematically larger?), and U/(n1·n2) IS the ROC-AUC of "A > B" —
    * the standard A/B effect size, robust to outliers in a way mean-based
    * drift is not. Input (v: BIGINT, in_a: BOOLEAN) rows; output ONE row
    * (n1, n2, u2x, auc_e6) where
    *
    *   u2x = 2·U = Σ over values c1(v)·(2·k2(v) − c2(v))
    *
    * — U counts (a∈A, b∈B) pairs with a > b plus HALF of every tie
    * (c1·k2excl pairs strictly greater with k2excl = k2 − c2, plus
    * c1·c2/2 tie pairs; doubling clears the tie halves so the statistic
    * is exact integers end-to-end), and auc_e6 = u2x·10⁶ DIV (2·n1·n2)
    * is the AUC in exact millionths (500000 = no drift). Tie-aware via
    * per-value counts — no per-row ranks, no midrank floats.
    *
    * Shape at 100 TB: identical to [[ksStat]] — the textbook rank-sum is
    * a global sort; this rides the same [[cdfAttach]] two-level prefix
    * sum, then ONE partial-combining aggregation of c1·(2k2−c2) terms.
    * Products in DECIMAL(38,0) before any arithmetic (c1·k2 ≈ n² wraps
    * Long past ~3·10⁹ rows/cohort; 2·k2 is cast into the decimal domain
    * BEFORE the multiply — the ADVICE r11 subterm rule), try_cast BIGINT
    * outputs. Requires both cohorts non-empty (AUC undefined otherwise —
    * the DIV is ANSI-loud, never a silent zero).
    */
  private[graft] def mwuStat(obs: DataFrame): DataFrame =
    // n1/n2 from cdfAttach's bin rollup — the ksStat r19 note; the
    // (n1, n2) groupBy (never a keyless .agg) keeps EMPTY input at zero
    // rows like the oracle's GROUP BY (r18 self-review), and the
    // post-agg null filter keeps the degenerate all-null-value input at
    // zero rows exactly as the old inner bin join did
    cdfAttach(cohortCounts(obs))
      .select(col("n1"), col("n2"),
        expr("CAST(c1 AS DECIMAL(38,0)) *" +
        " (2 * CAST(k2 AS DECIMAL(38,0)) - c2)").as("t"))
      .groupBy("n1", "n2")
      .agg(sum("t").as("u_dec"))
      .filter(col("u_dec").isNotNull)
      .select(col("n1"), col("n2"),
        expr("try_cast(u_dec AS BIGINT)").as("u2x"),
        expr("try_cast(u_dec * 1000000 DIV" +
             " (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
          .as("auc_e6"))

  /** Tukey-fence rollup shared by q_stats_outliers and its sketch twin
    * (r18 self-review): per-group (q1, q3) → 1.5·IQR fences → flagged
    * counts. ONE definition, so a fence-rule or output change cannot
    * drift between the exact op and the twin EngineSpec compares. */
  private def tukeyProfile(li: DataFrame,
                           q: DataFrame): DataFrame = {
    val lo = col("q1") - (col("q3") - col("q1")) * 1.5
    val hi = col("q3") + (col("q3") - col("q1")) * 1.5
    val out = col("l_extendedprice") < lo || col("l_extendedprice") > hi
    li.join(broadcast(q), Seq("l_returnflag"))
      .groupBy("l_returnflag", "q1", "q3")
      .agg(count(lit(1)).as("n"),
           sum(when(out, 1L).otherwise(0L)).as("n_outliers"))
      .select("l_returnflag", "n", "n_outliers", "q1", "q3")
      .orderBy("l_returnflag")
  }

  /** Per-source profile shared by q_corpus_profile and its sketch twin —
    * only the median aggregate differs, passed in so the shared columns
    * stay structurally identical for the ±2% EngineSpec compare
    * (r18 self-review). */
  private def corpusProfile(docs: DataFrame,
                            med: org.apache.spark.sql.Column): DataFrame =
    docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        TextQueries.qualityE6Col.as("q_e6"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("tokens_total"),
           med.as("tokens_median"),
           expr("sum(q_e6) DIV count(1)").as("quality_mean_e6"))
      .orderBy("source")

  def oracles: Map[String, String] = Map(
    // generated from the SAME column/pair lists as the engine, HUGEINT
    // internals mirroring the DECIMAL(38,0) products, same TRY_CASTs
    "q_stats_covariance" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val idx = cs.indices
      val sums =
        (idx.map(i => s"sum(x$i::HUGEINT) AS s$i") ++
         (for { i <- idx; j <- idx if j >= i } yield
           s"sum(x$i::HUGEINT * x$j) AS p${i}_$j")).mkString(",\n|         ")
      val arms = (for { i <- idx; j <- idx if j > i } yield
        s"""SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, n,
           |       TRY_CAST(n * p${i}_$j - s$i * s$j AS BIGINT) AS cov_num,
           |       TRY_CAST(n * p${i}_$i - s$i * s$i AS BIGINT) AS var_a_num,
           |       TRY_CAST(n * p${j}_$j - s$j * s$j AS BIGINT) AS var_b_num
           |FROM s""").mkString("\n|UNION ALL\n|")
      s"""WITH q AS (
         |  SELECT ${cs.zipWithIndex.map { case (c, i) =>
                      s"CAST(floor($c * 100) AS BIGINT) AS x$i" }
                      .mkString(",\n|         ")}
         |  FROM lineitem),
         |s AS (
         |  SELECT count(*) AS n,
         |         $sums
         |  FROM q)
         |$arms
         |ORDER BY col_a, col_b""".stripMargin
    },

    // the oracle takes the textbook single-window form the engine's
    // two-level prefix sum replaces — same k's, same HUGEINT products
    "q_stats_ks" ->
      """WITH vals AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS c2
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT sum(c1) OVER (ORDER BY v) AS k1,
        |         sum(c2) OVER (ORDER BY v) AS k2
        |  FROM vals),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2 FROM vals)
        |SELECT n1, n2,
        |       CAST(max(abs(k1 * n2 - k2 * n1)) AS BIGINT) AS d_num,
        |       CAST(max(abs(k1 * n2 - k2 * n1)) * 1000000 // (n1::HUGEINT * n2)
        |            AS BIGINT) AS ks_e6
        |FROM cum, tot GROUP BY n1, n2""".stripMargin,

    // the oracle takes the textbook single-window rank form the engine's
    // prefix sum replaces — same per-value counts, same HUGEINT products
    "q_stats_mwu" ->
      """WITH vals AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS c1,
        |         sum(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END) AS c2
        |  FROM lineitem GROUP BY 1),
        |cum AS (
        |  SELECT c1, c2, sum(c2) OVER (ORDER BY v) AS k2
        |  FROM vals),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |               CAST(sum(c2) AS BIGINT) AS n2 FROM vals)
        |SELECT n1, n2,
        |       CAST(sum(c1 * (2 * k2 - c2)) AS BIGINT) AS u2x,
        |       CAST(sum(c1 * (2 * k2 - c2)) * 1000000
        |            // (2 * n1::HUGEINT * n2) AS BIGINT) AS auc_e6
        |FROM cum, tot GROUP BY n1, n2""".stripMargin,

    "q_stats_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(abs(o_totalprice) * 100) AS BIGINT)
        |                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM d
        |      WHERE digit >= 1 GROUP BY digit)
        |SELECT digit, n,
        |       CAST(n * 1000000 // (SELECT count(*) FROM orders) AS BIGINT)
        |         AS share_ppm,
        |       ([301029, 176091, 124938, 96910, 79181, 66946, 57991,
        |         51152, 45757])[digit] AS benford_ppm,
        |       abs(CAST(n * 1000000 // (SELECT count(*) FROM orders) AS BIGINT)
        |           - ([301029, 176091, 124938, 96910, 79181, 66946, 57991,
        |              51152, 45757])[digit]) AS delta_ppm
        |FROM g ORDER BY digit""".stripMargin,

    "q_stats_outliers" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.25) AS q1,
        |         quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n,
        |       CAST(sum(CASE WHEN l_extendedprice < q1 - (q3 - q1) * 1.5
        |                       OR l_extendedprice > q3 + (q3 - q1) * 1.5
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       q1, q3
        |FROM lineitem l JOIN q USING (l_returnflag)
        |GROUP BY l.l_returnflag, q1, q3
        |ORDER BY l_returnflag""".stripMargin,

    "q_corpus_profile" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
        |         CAST(len(list_filter(string_split(text, ' '),
        |              x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) AS stop_hits,
        |         CAST(length(text) AS DOUBLE) AS n_chars
        |  FROM documents),
        |q AS (
        |  SELECT source, n_tokens,
        |         CAST(floor((least(n_tok / 400, 1.0) * 0.25
        |                     + (n_uniq / n_tok) * 0.35
        |                     + (1.0 - stop_hits / n_tok) * 0.2
        |                     + least((n_chars - (n_tok - 1)) / n_tok / 8, 1.0) * 0.2)
        |                    * 1e6) AS BIGINT) AS q_e6
        |  FROM t)
        |SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
        |       CAST(median(n_tokens) AS DOUBLE) AS tokens_median,
        |       CAST(sum(q_e6) // count(*) AS BIGINT) AS quality_mean_e6
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    "q_agg_stats" ->
      """SELECT o_orderstatus, count(*) AS n,
        |       median(o_totalprice) AS med_price,
        |       quantile_cont(o_totalprice, 0.9) AS p90_price,
        |       floor(stddev_samp(o_totalprice) * 1e6) / 1e6 AS sd_price,
        |       floor(corr(o_totalprice, o_custkey) * 1e6) / 1e6 AS corr_pk
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_agg_collect" ->
      """SELECT n_regionkey,
        |       array_to_string(list_sort(list(n_name)), ',') AS nations,
        |       count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin
  )
}
