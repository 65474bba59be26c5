package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextHash._
import graft.functions.expressions.VectorFunctions.dot_product

/** The engine's user-facing operator library: every north-star operator as
  * a composable DataFrame transform, independent of the t2 harness.
  * `import graft.api.implicits._` gives postfix syntax.
  *
  * These are the same plans the verified `operators.*Queries` run — generic
  * over column names so a reference user can point them at their own
  * tables. All scale rules (single shuffle per keyed op, candidate joins
  * instead of O(n²) products, broadcast dims) carry over.
  */
object GraftOps {

  /** Deterministic first-row-per-key dedup (never dropDuplicates: that is
    * order-nondeterministic under parallelism).
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** As-of join: for each left row, the latest right row with the same key
    * and rightTs <= leftTs — union + running last(), one shuffle, linear
    * (never a range-join explosion on hot keys).
    *
    * Right observations travel as a (ts, v) STRUCT, so a right row whose
    * value is genuinely NULL is still "the latest observation" (the struct
    * is non-null) rather than being skipped for an older non-null value.
    * Determinism without a unique right key: equal-(ts) right rows are
    * ordered by the struct itself, so the greatest (ts, value) wins the
    * tie under any parallelism (NULL values sort first and lose ties).
    *
    * Returns the left rows with an added `asof_<valueCol>` column.
    */
  def asOfJoinPrior(left: DataFrame, right: DataFrame, key: String,
                    leftTs: String, rightTs: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__ts", col(leftTs))
    // a NULL-ts right row would sort FIRST under the ascending window
    // (nulls-first) with a NON-null struct, fabricating a "prior
    // observation" for left rows that precede every real one — an
    // observation with no timestamp can never be "the latest ≤ ts",
    // so it is dropped before the union (r18 self-review)
    val r = right.filter(col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("__ts"),
        struct(col(rightTs).as("ts"), col(valueCol).as("v")).as("__s"))
      .withColumn("__tag", lit(0))
    val together = l.select((col(key) +: l.columns.filterNot(_ == key).map(col)): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__tag"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    together
      .withColumn(s"asof_$valueCol",
        last("__s", ignoreNulls = true).over(w).getField("v"))
      .filter(col("__tag") === 1)
      .drop("__tag", "__ts", "__s")
  }

  /** Gap-based sessionization: (rows + session_id column), one shuffle. */
  def sessionize(df: DataFrame, key: String, tsMs: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsMs)
    val newSession = when(
      tsMs - lag(tsMs, 1).over(w) >= gapMs || lag(tsMs, 1).over(w).isNull, 1
    ).otherwise(0)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Distinct n-token shingles (doc exploded), the dedup building block. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val ts = split(col(textCol), " ")
    val grams = transform(sequence(lit(0), size(ts) - n),
      j => concat_ws(" ", (0 until n).map(k => element_at(ts, j + k + 1)): _*))
    df.select(col(idCol),
      explode(array_distinct(when(size(ts) >= n, grams)
        .otherwise(array().cast("array<string>")))).as("shingle"))
  }

  /** Banded MinHash signatures over a hashed-shingle frame: 8 affine
    * minhashes per key (one aggregate slot each — no explode), 4 two-row
    * band strings. `keyCols`' values ride through, so callers can key by
    * id alone ([[minhashPairs]]) or (id, side) ([[minhashJoin]]) — one
    * definition of the band arithmetic for both forms.
    */
  private def affineBands(sh: DataFrame, keyCols: Seq[String]): DataFrame = {
    val sig = sh.groupBy(keyCols.map(col): _*).agg(
      min(affine(col("h"), 0)).as("mh0"),
      (1 until 8).map(i => min(affine(col("h"), i)).as(s"mh$i")): _*)
    val bandSigs = array((0 until 4).map(b =>
      concat_ws(":", lit(b), col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))): _*)
    sig.select(keyCols.map(col) :+ explode(bandSigs).as("sig"): _*)
  }

  /** Winnowed-fingerprint near-dup pairs (MOSS — Schleimer, Wilkerson &
    * Aiken, SIGMOD 2003): window-min fingerprint selection per document
    * (~2/(W+1) the volume of the full shingle index at the same
    * match-guarantee floor), then exact Jaccard over the pick sets via
    * the df-capped (h)-keyed bucket expansion — the same plan the
    * verified q_dedup_winnow runs. Returns (id_a, id_b, shared, jac_e6 ≥
    * minJacE6).
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  minJacE6: Long = 500000L): DataFrame =
    graft.operators.DedupQueries.winnowPairsPlan(
        graft.operators.TextQueries.winnowPicks(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
          // one materializing exchange both consumers reuse — the pick
          // pipeline must not run once per plan branch (q_dedup_winnow's
          // comment; PlanSpec pins it)
          .select("doc_id", "h").repartition(col("h")),
        minJacE6)
      .select(col("da").as("id_a"), col("db").as("id_b"),
              col("shared"), col("jac_e6"))

  /** Bounded sliding-window MEMBERSHIP fan-out — the shared core of
    * q_win_sliding (1h windows sliding 30 min) and q_event_dau's
    * trailing-7-day WAU (VERDICT r10 #7): a row at unit position
    * `posCol` belongs to exactly width/slide windows, so it EXPANDS
    * map-side into one row per enclosing window (a bounded ×k Expand —
    * never a self-join, never a window function over the corpus), and
    * whatever per-window aggregate follows — count, count_distinct —
    * runs as ONE keyed aggregation. This is the only shape that
    * distributes for sliding DISTINCT aggregates, which cannot roll up
    * from tumbling pre-aggregates.
    *
    * Emits the input row once per enclosing window with `outCol` = that
    * window's epoch-aligned START (floor(pos/slide)·slide − i·slide for
    * i in 0 until width/slide) — label by window END with
    * `outCol + (width − slide)` at the call site. `width` must be a
    * multiple of `slide`; both are in `posCol`'s units.
    */
  def slidingMembership(df: DataFrame, posCol: String, width: Long,
                        slide: Long, outCol: String = "w_start"): DataFrame = {
    require(width > 0 && slide > 0 && width % slide == 0,
      s"width $width must be a positive multiple of slide $slide")
    val k = (width / slide).toInt
    // a null position belongs to no window — the built-in window()
    // expression this replaces inserts the same is-not-null filter, and
    // without it the explode would emit k null-keyed window rows
    // (ADVICE r11)
    df.filter(col(posCol).isNotNull)
      .withColumn("__w_off", explode(sequence(lit(0), lit(k - 1))))
      .withColumn(outCol,
        (floor(col(posCol) / slide) - col("__w_off")) * slide)
      .drop("__w_off")
  }

  /** Exact heavy hitters — every item with frequency > n/(K+1), K =
    * [[graft.functions.FrequentItems.K]] — via the two-pass Misra-Gries
    * pattern: a ≤K-counter typed-Aggregator summary (k rows per partition
    * on the exchange, never a vocab-sized hash map), then an exact
    * re-count of only the ≤K candidates. The MG no-false-negative
    * guarantee makes the output order-independent and exact. Returns
    * (itemCol, cnt), heaviest first.
    */
  def heavyHitters(items: DataFrame, itemCol: String): DataFrame = {
    import graft.functions.FrequentItems
    val spark = items.sparkSession
    import spark.implicits._
    // nulls are excluded like any SQL aggregate key — without the filter
    // a null-heavy corpus would sketch nulls but lose them at the
    // re-count join (null never equi-joins), silently
    val it = items.select(col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull)
    val cands = it.as[String]
      .select(FrequentItems.toColumn)
      .toDF("cands", "n")
      .select(explode(col("cands")).as("__item"), col("n"))
    it.join(broadcast(cands), Seq("__item"))
      .groupBy("__item", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (FrequentItems.K + 1) > col("n"))
      .select(col("__item").as(itemCol), col("cnt"))
      .orderBy(col("cnt").desc, col(itemCol).asc)
  }

  /** PER-GROUP exact heavy hitters — [[heavyHitters]] keyed by a group
    * column: each group's items summarize through their OWN ≤K-counter
    * Misra-Gries partials (typed Aggregator under groupByKey, so the
    * exchange moves k rows per (partition, group) — never a per-group
    * vocab), then pass 2 re-counts only the ≤K·|groups| candidates
    * (broadcast join) and keeps exact count > n_g/(K+1). The per-group MG
    * guarantee makes each group's final set order-independent. Returns
    * (groupCol, itemCol, cnt), per-group heaviest first.
    */
  def heavyHittersBy(items: DataFrame, groupCol: String,
                     itemCol: String): DataFrame = {
    import graft.functions.FrequentItems
    val spark = items.sparkSession
    import spark.implicits._
    val it = items.select(col(groupCol).cast("string").as("__grp"),
                          col(itemCol).cast("string").as("__item"))
      .filter(col("__item").isNotNull && col("__grp").isNotNull)
    val cands = it.as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(FrequentItems.toColumn)
      .toDF("__grp", "mg")
      .select(col("__grp"), explode(col("mg._1")).as("__item"),
              col("mg._2").as("n"))
    // no broadcast hint: cands is ≤ K·|groups| rows, which a
    // high-cardinality group column can push past the broadcast/driver
    // envelope (ADVICE r10) — AQE picks broadcast itself whenever the
    // candidate table is actually small, and degrades to a shuffle join
    // instead of an OOM when it is not
    it.join(cands, Seq("__grp", "__item"))
      .groupBy("__grp", "__item", "n").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (FrequentItems.K + 1) > col("n"))
      .select(col("__grp").as(groupCol), col("__item").as(itemCol),
              col("cnt"))
      .orderBy(col(groupCol).asc, col("cnt").desc, col(itemCol).asc)
  }

  /** [[heavyHitters]] over a PRE-AGGREGATED (item, weight) relation —
    * the shared-token-layer entry: the sketch pass consumes vocab-sized
    * weighted rows (graft.functions.FrequentItemsW — same guarantee, n
    * = total weight) instead of one row per occurrence, and the exact
    * recount is a sum of weights. Output is IDENTICAL to the
    * per-occurrence form on the same underlying corpus (both equal the
    * true > n/(K+1) set after the recount).
    */
  def heavyHittersWeighted(items: DataFrame, itemCol: String,
                           weightCol: String): DataFrame = {
    import graft.functions.{FrequentItems, FrequentItemsW}
    val spark = items.sparkSession
    import spark.implicits._
    val it = items.select(col(itemCol).cast("string").as("__item"),
                          col(weightCol).cast("long").as("__w"))
      .filter(col("__item").isNotNull)
    val cands = it.as[(String, Long)]
      .select(FrequentItemsW.toColumn)
      .toDF("cands", "n")
      .select(explode(col("cands")).as("__item"), col("n"))
    it.join(broadcast(cands), Seq("__item"))
      .groupBy("__item", "n").agg(sum("__w").as("cnt"))
      .filter(col("cnt") * (FrequentItems.K + 1) > col("n"))
      .select(col("__item").as(itemCol), col("cnt"))
      .orderBy(col("cnt").desc, col(itemCol).asc)
  }

  /** [[heavyHittersBy]] over a pre-aggregated (group, item, weight)
    * relation — see [[heavyHittersWeighted]]. */
  def heavyHittersByWeighted(items: DataFrame, groupCol: String,
                             itemCol: String, weightCol: String): DataFrame = {
    import graft.functions.{FrequentItems, FrequentItemsW}
    val spark = items.sparkSession
    import spark.implicits._
    val it = items.select(col(groupCol).cast("string").as("__grp"),
                          col(itemCol).cast("string").as("__item"),
                          col(weightCol).cast("long").as("__w"))
      .filter(col("__item").isNotNull && col("__grp").isNotNull)
    val cands = it.as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(FrequentItemsW.toColumn)
      .toDF("__grp", "mg")
      .select(col("__grp"), explode(col("mg._1")).as("__item"),
              col("mg._2").as("n"))
    // no broadcast hint — the heavyHittersBy rationale (ADVICE r10)
    it.join(cands, Seq("__grp", "__item"))
      .groupBy("__grp", "__item", "n").agg(sum("__w").as("cnt"))
      .filter(col("cnt") * (FrequentItems.K + 1) > col("n"))
      .select(col("__grp").as(groupCol), col("__item").as(itemCol),
              col("cnt"))
      .orderBy(col(groupCol).asc, col("cnt").desc, col(itemCol).asc)
  }

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jac_e6). Candidates come from band-signature
    * equality joins — no all-pairs product at any corpus size.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   jaccardThreshold: Double = 0.7): DataFrame = {
    val sh = shingles(df, idCol, textCol)
      .select(col(idCol), pmod(md5long(col("shingle")), lit(FpPrime)).as("h"))
    val bands = affineBands(sh, Seq(idCol))
    val cand = bands.as("a").join(bands.as("b"), Seq("sig"))
      .filter(col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n"))
    cand
      .join(sh.as("sa"), col("id_a") === col(s"sa.$idCol"))
      .join(sh.as("sb"), col("id_b") === col(s"sb.$idCol") &&
                         col("sa.h") === col("sb.h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.as("na"), col("id_a") === col(s"na.$idCol"))
      .join(sizes.as("nb"), col("id_b") === col(s"nb.$idCol"))
      .select(col("id_a"), col("id_b"),
              floor(col("inter") / (col("na.n") + col("nb.n") - col("inter")) * 1e6)
                .cast("long").as("jac_e6"))
      .filter(col("jac_e6") >= (jaccardThreshold * 1e6).toLong)
  }

  /** Cross-corpus MinHash-LSH similarity JOIN (the R×S twin of
    * [[minhashPairs]], and the library form of q_dedup_train_test): near-
    * dup pairs BETWEEN two document sets — dedup a training corpus
    * against a held-out benchmark, match a fresh crawl against the
    * existing lake. Returns (left idCol, right idCol, jac_e6).
    *
    * Scale shape: shingles + signatures build once over the UNION (so
    * both sides share one hash pass and identical band arithmetic), the
    * band join is side-split equality (when the right side is small —
    * the benchmark case — AQE broadcasts it and the left corpus never
    * shuffles), and exact Jaccard verifies candidates only.
    */
  def minhashJoin(left: DataFrame, right: DataFrame, idCol: String,
                  textCol: String, jaccardThreshold: Double = 0.5): DataFrame = {
    // the working key is the (side, id) STRUCT, not the bare id: the two
    // inputs are independent id spaces that may collide (two 0-based
    // corpora), and keying shingles by id alone would attach both sides'
    // shingles to both rows of a shared id — corrupting signatures, sizes,
    // and intersections silently
    val tagged = left.select(col(idCol), col(textCol)).withColumn("__side", lit(0))
      .unionByName(right.select(col(idCol), col(textCol)).withColumn("__side", lit(1)))
      .select(struct(col("__side").as("s"), col(idCol).as("i")).as("__uid"),
              col(textCol))
    val sh = shingles(tagged, "__uid", textCol)
      .select(col("__uid"), pmod(md5long(col("shingle")), lit(FpPrime)).as("h"))
    val bands = affineBands(sh, Seq("__uid"))
    val cand = bands.filter(col("__uid.s") === 0).as("a")
      .join(bands.filter(col("__uid.s") === 1).as("b"), Seq("sig"))
      .select(col("a.__uid").as("ua"), col("b.__uid").as("ub"))
      .distinct()
    val sizes = sh.groupBy("__uid").agg(count(lit(1)).as("n"))
    cand
      .join(sh.as("sa"), col("ua") === col("sa.__uid"))
      .join(sh.as("sb"), col("ub") === col("sb.__uid") &&
                         col("sa.h") === col("sb.h"))
      .groupBy("ua", "ub").agg(count(lit(1)).as("inter"))
      .join(sizes.as("na"), col("ua") === col("na.__uid"))
      .join(sizes.as("nb"), col("ub") === col("nb.__uid"))
      .select(col("ua.i").as("id_a"), col("ub.i").as("id_b"),
              floor(col("inter") / (col("na.n") + col("nb.n") - col("inter")) * 1e6)
                .cast("long").as("jac_e6"))
      .filter(col("jac_e6") >= (jaccardThreshold * 1e6).toLong)
  }

  /** The composed training-corpus pipeline (the library twin of the
    * oracle-checked q_pipeline_corpus): exact-dedup keeper (lowest id per
    * content digest) → MinHash near-dup removal (≥ `jaccardThreshold`
    * pairs; each cluster keeps its lowest-id canonical) → token-count
    * quality gate → stable hash train/test label (a row's split never
    * changes as the corpus grows). Returns (idCol, n_tokens, split).
    *
    * Scale shape: the exact keeper is one digest aggregation (map-side
    * partial aggregation absorbs mega dup-groups) plus a semi-join keyed
    * on the UNIFORM id column — never a window over the digest, which
    * would serialize a mega dup-group in one task (cf. q_dedup_content);
    * the sub-quadratic banded-LSH machinery of [[minhashPairs]] supplies
    * the pair list (near-dup-sized, so AQE broadcasts the anti-join
    * side); map-side filters for everything else.
    */
  def corpusPipeline(docs: DataFrame, idCol: String, textCol: String,
                     minTokens: Int = 30, jaccardThreshold: Double = 0.7,
                     trainPct: Int = 80): DataFrame = {
    val toks = size(split(col(textCol), " ")).cast("long")
    val drops = minhashPairs(docs, idCol, textCol, jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val bucket = pmod(md5long(col(idCol).cast("string")), lit(100L))
    val withMd5 = docs.select(col(idCol), col(textCol))
      .withColumn("__md5", md5(col(textCol).cast("binary")))
    // keeper ids = each digest group's minimum id; membership is then a
    // semi-join on the id (uniform keys — the digest hot key never
    // appears as a join key)
    val keepers = withMd5.groupBy("__md5").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    withMd5
      .join(keepers, Seq(idCol), "left_semi")
      .join(drops, Seq(idCol), "left_anti")
      .withColumn("n_tokens", toks)
      .filter(col("n_tokens") >= minTokens)
      .select(col(idCol), col("n_tokens"),
        when(bucket < trainPct, lit("train")).otherwise(lit("test")).as("split"))
  }

  /** Benchmark decontamination (library twin of q_text_contamination):
    * per corpus doc, the count and fraction of its n-token shingles
    * present in `benchmark`'s DISTINCT shingle set. Returns
    * (idCol, n_shingles, n_contaminated, contam_e6) for docs with ≥ 1
    * shingle. The distinct benchmark set is tiny next to any corpus —
    * AQE broadcasts it, the probe is map-side, and per-shingle join
    * fan-out is ≤ 1 by construction (no df cap needed).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, n: Int = 3): DataFrame = {
    def hashed(df: DataFrame) = shingles(df, idCol, textCol, n)
      .select(col(idCol), pmod(md5long(col("shingle")), lit(FpPrime)).as("h"))
    val bench = hashed(benchmark).select("h").distinct()
      .withColumn("__hit", lit(1L))
    hashed(corpus).join(bench, Seq("h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
           coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .withColumn("contam_e6",
        floor(col("n_contaminated").cast("double") /
              col("n_shingles").cast("double") * 1e6).cast("long"))
  }

  /** Context-window sequence packing (library twin of q_pack_docs): adds
    * a `pack_id` column chunking rows into fixed token budgets — an
    * exclusive prefix sum in `orderCol` order INSIDE each shard's window
    * partition, so packing parallelizes across shards (never a
    * corpus-global running sum).
    */
  def packDocs(docs: DataFrame, shardCol: String, orderCol: String,
               tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.withColumn("__tok", tokens)
      .withColumn("__cum", coalesce(sum(col("__tok")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__cum") / lit(budget)).cast("long"))
      .drop("__cum", "__tok")
  }

  /** Source-weighted mixture sampling (library twin of q_mix_sources):
    * downsample a multi-source corpus to a target composition. `weights`
    * maps source → relative target weight (unlisted sources are excluded);
    * the realized budget is the largest total every listed source can
    * supply at its share (B = min over sources of n_s·W DIV w_s, exact
    * integer arithmetic), and each source keeps rows at rate
    * w_s·B/(W·n_s) decided by a deterministic hash of `idCol` — map-side
    * membership (the 100 TB shape: an exact per-source take would need a
    * per-source top-k whose final rank pass lands each source in ONE
    * task). Returns the sampled rows with a `mix_rate_e6` column.
    *
    * Rate-based sampling realizes the mixture in expectation (exact
    * cross-engine determinism per ROW, binomial variation per source) —
    * the standard trade for scale-out mixing.
    *
    * A listed source ABSENT from `docs` can supply nothing at any
    * positive share, so per the budget definition B = 0 and the result
    * is EMPTY — the mixture degrades loudly-by-emptiness rather than
    * silently returning a "mixture" with a whole component missing while
    * its weight still dilutes every other source's rate.
    *
    * Long-overflow envelope: with B = min over sources of n_s·W DIV w_s,
    * every intermediate product is bounded by n_s·W·10⁶ (w_s·B ≤ n_s·W
    * follows from B being that min), so exact Long arithmetic needs
    * W·n_s ≤ 2⁶³/10⁶ ≈ 9.2·10¹². Byte-count-scale user weights
    * (W ~ 10¹⁴ for a 100 TB corpus) would blow that silently — so
    * weight maps summing past [[MixWeightScale]] are first rescaled to
    * proportions over it (±0.5/[[MixWeightScale]] of total weight per
    * share; shares under 1/[[MixWeightScale]] clamp UP to the floor of
    * 1 rather than dropping the source — more than [[MaxSilentClamps]]
    * such clamps logs a warning, because a long clamped tail inflates
    * collectively past the rounding bound). Post-rescale W ≤
    * [[MixWeightScale]] + #sources, which keeps the math exact past
    * 9·10⁹ docs in any one source — a uniform 10 KB-doc corpus reaches
    * that only with ~90 TB in a single mixture component; shrink
    * [[MixWeightScale]] before raising it if you get there.
    */
  def mixCorpus(docs: DataFrame, sourceCol: String, idCol: String,
                weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // BigInt: the raw sum itself can overflow Long for byte-count weights
    val wsumRaw = weights.values.map(BigInt(_)).sum
    val scaled: Map[String, Long] =
      if (wsumRaw <= MixWeightScale) weights
      else {
        val rounded = weights.map { case (s, w) =>
          s -> ((BigInt(w) * MixWeightScale + wsumRaw / 2) / wsumRaw).toLong }
        // a handful of clamp-ups sit inside the documented ±0.5/scale
        // rounding bound, but a LONG tail of sub-floor sources (thousands
        // of per-domain byte counts) each grabs a full 1/scale share it
        // wasn't owed — collectively well past the bound. That distortion
        // must be visible, not silent.
        val clamped = rounded.count(_._2 < 1L)
        if (clamped > MaxSilentClamps)
          log.warn(s"mixCorpus: $clamped of ${weights.size} sources fall " +
            s"under 1/$MixWeightScale of total weight and were clamped up " +
            s"to the floor — the tail's collective share is inflated by up " +
            s"to ~$clamped/$MixWeightScale of the mixture. Group tail " +
            s"sources (or pre-drop them) for exact proportions.")
        rounded.map { case (s, w) => s -> w.max(1L) }
      }
    val wTab = scaled.toSeq.toDF(sourceCol, "__w")
    val wsum = scaled.values.sum
    // per-source counts over the listed sources only (sources-sized,
    // tiny); the LEFT join from the weights table keeps absent sources
    // as __n = 0 so they participate in the budget min
    val present = docs
      .join(broadcast(wTab.select(sourceCol)), Seq(sourceCol), "left_semi")
      .groupBy(sourceCol).agg(count(lit(1)).as("__n"))
    val srcs = wTab.join(present, Seq(sourceCol), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
    val lim = srcs.select(min(expr("__n * " + wsum + " DIV __w")).as("B"))
    val rates = srcs
      .withColumn("B", org.apache.spark.sql.GraftSqlBridge.scalarSubquery(lim))
      .select(col(sourceCol),
        // the __n > 0 guard keeps an absent source (and, with it, B = 0)
        // from tripping ANSI division-by-zero — its rate is simply 0
        when(col("__n") > 0,
          expr(s"__w * B * 1000000 DIV (${wsum}L * __n)"))
          .otherwise(lit(0L)).as("mix_rate_e6"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(pmod(md5long(col(idCol).cast("string")), lit(1000000L))
        < col("mix_rate_e6"))
  }

  /** Cap on the sum of mixCorpus weights used in exact Long rate math;
    * larger weight maps rescale to proportions over this (see mixCorpus's
    * overflow-envelope scaladoc for the precision/scale trade).
    */
  private[graft] val MixWeightScale = 1000L

  /** How many clamped-up tail sources mixCorpus tolerates silently; past
    * this the collective inflation (≈ clamped/[[MixWeightScale]]) exceeds
    * the per-share rounding bound and a warning is logged.
    */
  private[graft] val MaxSilentClamps = 4

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Materialize `df` into the cache and read a convergence signature off
    * the SAME action: the metric rides the caching `count()` as an
    * `observe()` side-channel instead of a second full-pass aggregation —
    * ONE Spark job per CC round where the previous design paid two (the
    * round-5 driver bench showed the extra job dominating under load).
    * Returns (cached df, lineage-cut view, row count, signature).
    *
    * The lineage-cut view is what iterative callers MUST compose the next
    * round from: each round's plan otherwise nests the previous round's
    * full logical plan more than once, so plan SIZE grows exponentially
    * with rounds — caching truncates execution but not analysis, and on
    * chain-shaped graphs (deep round counts) the analyzer + AQE
    * plan-string work OOMs the driver before any task runs. The cut
    * rebuilds the round as a LogicalRDD scan over the cached result:
    * constant-size plans at any depth. (Not localCheckpoint: the cut's
    * parent stays an ordinary cache, so a recompute after block eviction
    * is still possible.)
    */
  private def cacheWithSig(df: DataFrame,
                           metric: Column): (DataFrame, DataFrame, Long, java.math.BigDecimal) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, sum(metric.cast("decimal(38,0)")).as("sig")).cache()
    val rows = observed.count()
    val sig = obs.get("sig") match {
      case null                      => java.math.BigDecimal.ZERO
      case d: java.math.BigDecimal   => d
      case other                     => new java.math.BigDecimal(other.toString)
    }
    val cut = df.sparkSession.createDataFrame(observed.rdd, observed.schema)
    (observed, cut, rows, sig)
  }

  /** Edge-count bound for the single-task union-find fast path. Sizing is
    * node-bound, not edge-bound: worst case every edge introduces two new
    * nodes, so ≤2×edges nodes in the primitive open-addressed parent
    * table (two Array[Long] at ≤50% load ≈ 64 B/node) → ≈4M edges ≈ 8M
    * nodes ≈ 512 MB worst-case, a few MB in the common near-dup case
    * (dense clusters, nodes ≪ edges). Below the bound the whole component
    * structure fits one executor core and iterating distributed rounds
    * would pay ~5–10 scheduler round-trips for nothing; above it the
    * distributed tiers take over.
    */
  private val SmallGraphEdges = 4L << 20

  /** Propagation rounds to attempt before escalating to star contraction
    * — near-dup graphs converge in 1–3 rounds after pre-contraction, so a
    * graph still moving after this many rounds has a long-chain shape that
    * propagation would grind through in O(diameter).
    */
  private val EscalateAfterRounds = 6

  /** Connected components over an undirected edge list — the cluster step
    * of near-dup canonicalization (every doc in a dup cluster maps to the
    * cluster's minimum id, so "keep one per cluster" is a filter, not a
    * pairwise fixpoint). Returns (id, label=component minimum) for every
    * node appearing in an edge, CACHED (the convergence checks
    * materialized it) — long-lived callers unpersist when done.
    *
    * Three-tier strategy, picked from the materialized edge count:
    *  1. **Small graphs** (≤ [[SmallGraphEdges]], long ids): single-task
    *     union-find over the edge list repartitioned to ONE partition —
    *     the data stays on an executor (never `collect()`ed), and the
    *     whole clustering is one job instead of one job per round. Near-
    *     dup graphs are near-dup-SIZED (edges exist only for verified
    *     ≥0.8-Jaccard pairs), so at any corpus scale this path handles
    *     the common case where dup clusters are rare-to-moderate.
    *  2. **Large graphs**: iterative min-label propagation — each round
    *     one equi-join of the cached adjacency against current labels
    *     plus one min-aggregation (keyed shuffles only, nothing pair-
    *     quadratic). Round 0 is pre-contracted off the adjacency; the
    *     convergence scalar (sum of labels — monotone under min-
    *     propagation) rides the materializing count() as an observe()
    *     metric: one job, one scalar per round, the label table never on
    *     the driver. Dense dup clusters converge in 1–3 rounds.
    *  3. **Escalation**: a graph still unconverged after
    *     [[EscalateAfterRounds]] propagation rounds has a long-chain
    *     shape; switch to [[connectedComponentsStar]] (O(log n) rounds)
    *     rather than grinding O(diameter).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    val bothLong =
      edges.schema(aCol).dataType == org.apache.spark.sql.types.LongType &&
      edges.schema(bCol).dataType == org.apache.spark.sql.types.LongType
    val e = edges.select(col(aCol).as("u"), col(bCol).as("v")).cache()
    val n = e.count()
    val result =
      if (bothLong && n <= SmallGraphEdges) ccUnionFind(e)
      else ccPropagate(e, math.min(EscalateAfterRounds, maxIter)).getOrElse {
        log.info(s"connectedComponents: unconverged after " +
          s"$EscalateAfterRounds propagation rounds (long-chain graph); " +
          "escalating to star contraction")
        connectedComponentsStar(e, "u", "v", maxIter)
      }
    e.unpersist()
    result
  }

  /** Tier 1: union-find (path compression + union-by-min, so the final
    * root IS the component minimum) inside one `mapPartitions` task. The
    * edge list is shuffled to a single partition, not collected — driver
    * memory never holds it.
    */
  private def ccUnionFind(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val labels = e.select(col("u").as("_1"), col("v").as("_2"))
      .as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        // primitive open-addressed parent table (parallel Array[Long]s,
        // linear probing, grow-at-50%-load): a boxed HashMap[Long, Long]
        // costs ~10× the memory per node, which is the difference between
        // this path fitting one task or OOMing it at the SmallGraphEdges
        // bound
        val uf = new LongLongUnionFind(1 << 16)
        it.foreach { case (a, b) => uf.union(a, b) }
        uf.entries.map { case (k, _) => k -> uf.find(k) }
      }
      .toDF("id", "label")
      .cache()
    labels.count()
    labels
  }

  /** Union-find over long ids: path compression + union-by-min (the root
    * IS the component minimum). Open addressing with linear probing over
    * parallel key/parent arrays; capacity doubles at 50% load.
    */
  private final class LongLongUnionFind(initialCapacity: Int) extends Serializable {
    private var mask = initialCapacity - 1
    private var keys = new Array[Long](initialCapacity)
    private var parents = new Array[Long](initialCapacity)
    private var used = new Array[Boolean](initialCapacity)
    private var size = 0

    private def slot(k: Long): Int = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & mask
      while (used(i) && keys(i) != k) i = (i + 1) & mask
      i
    }
    private def grow(): Unit = {
      val (ok, op, ou) = (keys, parents, used)
      mask = mask * 2 + 1
      keys = new Array[Long](mask + 1)
      parents = new Array[Long](mask + 1)
      used = new Array[Boolean](mask + 1)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) { val s = slot(ok(i)); keys(s) = ok(i); parents(s) = op(i); used(s) = true }
        i += 1
      }
    }
    private def getOrInsert(k: Long): Int = {
      val i = slot(k)
      if (!used(i)) {
        keys(i) = k; parents(i) = k; used(i) = true; size += 1
        if (size * 2 > mask) { grow(); return slot(k) }
      }
      i
    }
    private def parentOf(k: Long): Long = parents(slot(k))
    private def setParent(k: Long, p: Long): Unit = parents(slot(k)) = p

    def find(x: Long): Long = {
      var r = x
      while (parentOf(r) != r) r = parentOf(r)
      var c = x
      while (c != r) { val nx = parentOf(c); setParent(c, r); c = nx }
      r
    }
    def union(a: Long, b: Long): Unit = {
      getOrInsert(a)
      getOrInsert(b)
      val ra = find(a)
      val rb = find(b)
      if (ra < rb) setParent(rb, ra)
      else if (rb < ra) setParent(ra, rb)
    }
    def entries: Iterator[(Long, Long)] =
      keys.indices.iterator.filter(used(_)).map(i => (keys(i), parents(i)))
  }

  /** Tier 2: min-label propagation over (u, v) edges; Some(labels) once
    * the label sum reaches its fixed point within `maxRounds`, None (all
    * intermediate state released) if still moving — the caller escalates.
    */
  private def ccPropagate(e: DataFrame, maxRounds: Int): Option[DataFrame] = {
    // both directions via ONE explode — a union of two selects would
    // evaluate the (possibly expensive) edge plan twice when the cache
    // materializes. repartition(dst) without a number lets AQE size the
    // cached layout from the data AND hash-partitions on the per-round
    // join key, so each round shuffles only the label side.
    val adj = e.select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .cache()
    // convergence signature: numeric labels sum directly — monotone under
    // min-propagation, so signature equality is an EXACT fixed-point
    // certificate. Non-numeric ids (string doc keys) can't sum: hash each
    // label first, which makes the certificate PROBABILISTIC — a
    // signature collision (changed nodes' 64-bit hash deltas cancelling
    // exactly in a 38-digit sum, vanishingly unlikely but possible)
    // declares convergence early and this tier returns silently wrong
    // labels. The star tier behind it only backstops NON-convergence
    // (`None` after maxRounds); it never re-checks a claimed fixed point,
    // so for string ids this fast path is the sole authority on false
    // convergence and its guarantee is probabilistic, not exact.
    // raw-sum only for INTEGRAL ids: the signature sums after a
    // decimal(38,0) cast, so a fractional Float/Double/scaled-Decimal
    // label could change within its rounding cell (2.9 → 2.6) without
    // moving the sum — a FALSE fixed point the star tier never re-checks.
    // Fractional ids take the hash path (probabilistic certificate, like
    // strings); the exact certificate holds where the cast is lossless
    // (r18 self-review)
    val integral = e.schema("u").dataType match {
      case _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val labelSig = (l: Column) => if (integral) l else xxhash64(l)
    var (labels, labelsCut, rows, cur) = cacheWithSig(
      adj.groupBy(col("src").as("id"))
        .agg(min(least(col("dst"), col("src"))).as("label")),
      labelSig(col("label")))
    var converged = rows == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      // compose from the lineage-CUT view: labels appears twice here, so
      // building on the cached df directly would double the logical plan
      // every round (see cacheWithSig)
      val prop = adj.join(labelsCut, col("dst") === col("id"))
        .select(col("src").as("id"), col("label"))
        .union(labelsCut)
        .groupBy("id").agg(min("label").as("label"))
      val (next, nextCut, _, nextSig) = cacheWithSig(prop, labelSig(col("label")))
      converged = nextSig.compareTo(cur) == 0
      labels.unpersist()
      labels = next
      labelsCut = nextCut
      cur = nextSig
      round += 1
    }
    adj.unpersist()
    if (converged) Some(labels)
    else { labels.unpersist(); None }
  }

  /** Connected components via alternating large-star / small-star
    * contraction — the O(log n)-round algorithm for graphs whose diameter
    * makes [[connectedComponents]]' O(diameter) propagation the bottleneck
    * (adversarial chained near-dup corpora: template docs A~B~C~…).
    * Public algorithm: Kiveris et al., "Connected Components in MapReduce
    * and Beyond" (ACM SoCC 2014). Same contract as
    * [[connectedComponents]]: returns (id, label=component minimum) for
    * every node appearing in an edge, CACHED.
    *
    * Scale shape: each phase is one neighbourhood-min aggregation plus one
    * keyed equi-join plus a distinct — all shuffles keyed on node id,
    * never pair-quadratic; the edge set monotonically contracts toward
    * disjoint stars (child → component-min root). Convergence compares an
    * order-insensitive xxhash64 sum of the edge set PLUS its row count,
    * both observed on the same count() that materializes each round — one
    * job per round. The check is probabilistic in principle (two different
    * consecutive edge sets could collide on BOTH scalars — unlike the
    * propagation variant's label sum, which is monotone and therefore an
    * exact fixed-point certificate), but a simultaneous 64-bit-sum AND
    * count collision between consecutive rounds of a contracting edge set
    * is vanishingly unlikely. Pick this over propagation when the diameter
    * is unknown or large; for dense small-diameter dup clusters
    * propagation's cheaper rounds win.
    */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 50): DataFrame = {
    val nodes = edges.select(explode(array(col(aCol), col(bCol))).as("id"))
      .distinct().cache()
    def edgeSig(df: DataFrame) =
      cacheWithSig(df, xxhash64(col("u"), col("v")))
    // canonical undirected edges u > v; self-loops carry no connectivity
    var (e, eCut, rows, cur) = edgeSig(
      edges.filter(col(aCol) =!= col(bCol))
        .select(greatest(col(aCol), col(bCol)).as("u"),
                least(col(aCol), col(bCol)).as("v"))
        .distinct())
    var converged = rows == 0L
    var round = 0
    while (!converged && round < maxIter) {
      // every stage below composes from the lineage-CUT view of the
      // round's edge set — the raw cached df appears ~4× per round, which
      // would grow the logical plan exponentially in round count (OOMs
      // the analyzer on long chains; see cacheWithSig)
      // large-star: every node attaches its strictly LARGER neighbours to
      // the minimum of its closed neighbourhood. Result stays canonical:
      // emitted (y, m) has y > x >= m.
      val nbrs = eCut.select(explode(array(
          struct(col("u").as("x"), col("v").as("y")),
          struct(col("v").as("x"), col("u").as("y")))).as("p"))
        .select(col("p.x").as("x"), col("p.y").as("y"))
      val lmins = nbrs.groupBy("x").agg(min(least(col("y"), col("x"))).as("m"))
      val ls = nbrs.join(lmins, "x")
        .filter(col("y") > col("x") && col("y") =!= col("m"))
        .select(col("y").as("u"), col("m").as("v"))
        .distinct()
      // small-star: every node attaches its SMALLER neighbours (and
      // itself) to the minimum of that smaller neighbourhood. ls is
      // canonical (u > v), so the smaller neighbours of u are exactly its
      // v-side rows; emitted (n, m) has n > m.
      val smins = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(smins, Seq("u"))
        .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .distinct()
      val (next, nextCut, nextRows, nextSig) = edgeSig(ss)
      converged = nextSig.compareTo(cur) == 0 && nextRows == rows
      e.unpersist()
      e = next
      eCut = nextCut
      rows = nextRows
      cur = nextSig
      round += 1
    }
    if (!converged)
      log.warn(s"connectedComponentsStar: maxIter=$maxIter exhausted before " +
        "convergence — labels may split a component; raise maxIter")
    // the converged edge set is a disjoint union of stars: every non-root
    // points at its component's minimum. Roots and self-loop-only nodes
    // label themselves. (min-agg guards determinism if maxIter truncated.)
    val roots = e.groupBy(col("u").as("id")).agg(min("v").as("lbl"))
    val labels = nodes.join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("label"))
      .cache()
    labels.count()
    e.unpersist()
    nodes.unpersist()
    labels
  }

  /** Top-k cosine neighbours of a single query vector (inlined as a scalar
    * subquery — no join node; map-only scoring via the native codegen'd
    * dot product).
    */
  def knn(df: DataFrame, idCol: String, vecCol: String,
          query: DataFrame, k: Int): DataFrame = {
    val qv = query.select(col(vecCol).as("__qv"))
    df.withColumn("__qv", org.apache.spark.sql.GraftSqlBridge.scalarSubquery(qv))
      // the assign() zero-norm guard: a zero-norm vector (either side)
      // makes the cosine 0/0 — a DIVIDE_BY_ZERO *error* under ANSI (it
      // would kill the query), NaN otherwise (NaN orders ABOVE every
      // double and would displace true neighbours at the top of the k).
      // The when-guard skips the division on a zero denominator; -2 is
      // below any cosine, so the degenerate vector ranks last
      // (r18 self-review)
      .withColumn("__nn", sqrt(dot_product(col(vecCol), col(vecCol))) *
                          sqrt(dot_product(col("__qv"), col("__qv"))))
      .select(col(idCol),
        nanvl(when(col("__nn") > 0,
                dot_product(col(vecCol), col("__qv")) / col("__nn"))
              .otherwise(lit(-2d)), lit(-2d)).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Salted equi-join for skewed keys: the hot left side is salted into
    * `salts` sub-keys and the right side replicated across them — the
    * standard remedy when one key would swamp a single reducer. (AQE's
    * skew-join handles moderate skew automatically; explicit salting is
    * for the pathological keys you know about.)
    */
  /** The left-side salting: each row lands in one of `salts` sub-keys of
    * its join key, spreading a hot key across `salts` reducers. Exposed
    * within the project so specs can measure the spread directly.
    */
  private[graft] def salted(left: DataFrame, key: String, salts: Int): DataFrame =
    left.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val l = salted(left, key, salts)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r.withColumnRenamed(key, s"__r_$key"),
           l("__salt") === r("__salt") && l(key) === col(s"__r_$key"))
      .drop("__salt", s"__r_$key")
  }

  /** Per-group argmax selection with a deterministic lowest-id tie-break —
    * the q_dedup_keeper policy as a generic library op: ONE
    * max(struct(score, -id)) aggregation (map-side partial-combining, so a
    * mega-group costs its aggregation and nothing else — never a window
    * over the group key). Returns (groupCol, n_members, keeper_<idCol>,
    * keeper_<scoreCol>).
    */
  def keepBest(df: DataFrame, groupCol: String, idCol: String,
               scoreCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_members"),
           max(struct(col(scoreCol), (-col(idCol)).as("__nid"))).as("__mx"))
      .select(col(groupCol), col("n_members"),
              (-col("__mx.__nid")).as(s"keeper_$idCol"),
              col(s"__mx.$scoreCol").as(s"keeper_$scoreCol"))

  /** Data-constrained epoch schedule (Muennighoff et al. 2023) over
    * (source, tokens) rows — the q_mix_epochs core as a library entry
    * point: temperature target shares (sqrt, e3-quantized), per-source
    * targets at T = 3× unique tokens, epochs capped at 4.0 (e3-scaled).
    * Returns (source, n_tokens, w_e3, target_tokens, epochs_e3,
    * alloc_tokens, capped).
    */
  def epochSchedule(tok: DataFrame, sourceCol: String = "source",
                    tokensCol: String = "t"): DataFrame =
    graft.operators.SamplingQueries.epochSchedule(
      tok.select(col(sourceCol).as("source"), col(tokensCol).as("t")))

  /** Traffic-concentration KPI: 1-row (n_keys, n_rows, top_keys,
    * top_rows, share_e6) for the k highest-count keys — the Pareto/bot
    * screen. One definition with q_event_concentration (top block via
    * TakeOrderedAndProject, never a keys-wide rank window). */
  def concentration(df: DataFrame, keyCol: String, k: Int = 50): DataFrame =
    graft.operators.EventTimeQueries.concentration(
      df.select(col(keyCol).as("user_id")), k)
      .toDF("n_keys", "n_rows", "top_keys", "top_rows", "share_e6")

  /** Gini-Simpson diversity (1 − Σnᵢ²/N², exact ppm) per key, rolled into
    * the fixed decile histogram — one definition with q_event_diversity. */
  def diversityHistogram(df: DataFrame, keyCol: String,
                         itemCol: String): DataFrame =
    graft.operators.EventTimeQueries.diversityHistogram(
      df.select(col(keyCol).as("user_id"), col(itemCol).as("event_type")))

  /** Exact-integer Gini coefficient over per-group masses: 1-row
    * (n_sources, tokens_total, gini_e6) — one definition with
    * q_mix_gini (bounded-block rank window, DECIMAL(38) arithmetic). */
  def gini(df: DataFrame, groupCol: String, massCol: String): DataFrame =
    graft.operators.SamplingQueries.gini(
      df.select(col(groupCol).as("source"), col(massCol).as("toks")))

  /** Benford first-digit screen over any money/measurement column —
    * one definition with q_stats_benford (exact cents-string digits,
    * baked log-table, scalar-subquery total). */
  def benford(df: DataFrame, valueCol: String): DataFrame =
    graft.operators.StatsQueries.benford(df, valueCol)
}

object implicits {
  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {
    def dedupFirst(keys: Seq[String], order: Seq[Column]): DataFrame =
      GraftOps.dedupFirst(df, keys, order)
    def sessionize(key: String, tsMs: Column, gapMs: Long): DataFrame =
      GraftOps.sessionize(df, key, tsMs, gapMs)
    def minhashPairs(idCol: String, textCol: String, threshold: Double = 0.7): DataFrame =
      GraftOps.minhashPairs(df, idCol, textCol, threshold)
    def winnowPairs(idCol: String, textCol: String,
                    minJacE6: Long = 500000L): DataFrame =
      GraftOps.winnowPairs(df, idCol, textCol, minJacE6)
    def heavyHitters(itemCol: String): DataFrame =
      GraftOps.heavyHitters(df, itemCol)
    def heavyHittersBy(groupCol: String, itemCol: String): DataFrame =
      GraftOps.heavyHittersBy(df, groupCol, itemCol)
    def concentration(keyCol: String, k: Int = 50): DataFrame =
      GraftOps.concentration(df, keyCol, k)
    def diversityHistogram(keyCol: String, itemCol: String): DataFrame =
      GraftOps.diversityHistogram(df, keyCol, itemCol)
    def gini(groupCol: String, massCol: String): DataFrame =
      GraftOps.gini(df, groupCol, massCol)
    def benford(valueCol: String): DataFrame =
      GraftOps.benford(df, valueCol)
    def minhashJoin(right: DataFrame, idCol: String, textCol: String,
                    threshold: Double = 0.5): DataFrame =
      GraftOps.minhashJoin(df, right, idCol, textCol, threshold)
    def knn(idCol: String, vecCol: String, query: DataFrame, k: Int): DataFrame =
      GraftOps.knn(df, idCol, vecCol, query, k)
    def asOfJoinPrior(right: DataFrame, key: String, leftTs: String,
                      rightTs: String, valueCol: String): DataFrame =
      GraftOps.asOfJoinPrior(df, right, key, leftTs, rightTs, valueCol)
    def saltedJoin(right: DataFrame, key: String, salts: Int): DataFrame =
      GraftOps.saltedJoin(df, right, key, salts)
    def corpusPipeline(idCol: String, textCol: String, minTokens: Int = 30,
                       jaccardThreshold: Double = 0.7,
                       trainPct: Int = 80): DataFrame =
      GraftOps.corpusPipeline(df, idCol, textCol, minTokens,
        jaccardThreshold, trainPct)
    def contamination(benchmark: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
      GraftOps.contamination(df, benchmark, idCol, textCol, n)
    def packDocs(shardCol: String, orderCol: String, tokens: Column,
                 budget: Long): DataFrame =
      GraftOps.packDocs(df, shardCol, orderCol, tokens, budget)
    def mixCorpus(sourceCol: String, idCol: String,
                  weights: Map[String, Long]): DataFrame =
      GraftOps.mixCorpus(df, sourceCol, idCol, weights)
    def connectedComponents(aCol: String, bCol: String,
                            maxIter: Int = 50): DataFrame =
      GraftOps.connectedComponents(df, aCol, bCol, maxIter)
    def connectedComponentsStar(aCol: String, bCol: String,
                                maxIter: Int = 50): DataFrame =
      GraftOps.connectedComponentsStar(df, aCol, bCol, maxIter)
    def keepBest(groupCol: String, idCol: String, scoreCol: String): DataFrame =
      GraftOps.keepBest(df, groupCol, idCol, scoreCol)
    def epochSchedule(sourceCol: String = "source",
                      tokensCol: String = "t"): DataFrame =
      GraftOps.epochSchedule(df, sourceCol, tokensCol)
  }
}
