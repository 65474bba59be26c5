package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Exact interpolated quantiles (Spark `percentile` / DuckDB
  * `quantile_cont` semantics) with BOUNDED executor state at any scale.
  *
  * Spark's built-in exact `percentile` is a values-buffering
  * ImperativeAggregate: per-group state is O(group size), which at a few
  * groups over 10⁹+ rows concentrates the whole corpus in a handful of
  * aggregation buffers (VERDICT r10 — the one scale-killer left in the
  * suite). This module computes the SAME doubles — the k-th and (k+1)-th
  * order statistics joined by the standard `lo + (hi − lo)·frac`
  * interpolation at rank h = p·(n−1) — by iterative histogram refinement
  * (the distributed selection classic: Munro–Paterson lineage, the
  * two-pass fixed-width histogram iterated to exactness):
  *
  *   1. one pass for per-group (count, min, max);
  *   2. per iteration, ONE linear scan builds a fixed-width histogram
  *      over each still-active target's candidate set (`bins` cells,
  *      map-side partial aggregation — executor state is bins·targets,
  *      never values); the driver walks the cumulative counts to find
  *      the cell holding the target rank and narrows to it;
  *   3. when a target's candidate count ≤ `leaf`, one final scan
  *      extracts the exact order statistic with a per-target window sort
  *      (≤ `leaf` rows per target partition; a degenerate
  *      point-mass remainder sorts with spill, it never OOMs an
  *      aggregation buffer).
  *
  * Driver state is GROUPS-sized model state (group stats, target
  * descriptors, histograms of bins·targets cells), the same contract as
  * KMeans' k×dim centroids — the corpus is never collected. Intended for
  * LOW-CARDINALITY group columns (the boxplot/profile shape); for
  * high-cardinality groups use percentile_approx, whose sketch state is
  * per-group-bounded.
  *
  * Candidate-set bookkeeping is ulp-exact: a row's membership in a
  * narrowed candidate set is decided by replaying the SAME clamped
  * floor((v − lo)/width) == b tests that binned it (the conjunct chain),
  * never by recomputed algebraic interval edges — boundary rounding can
  * therefore never drift a rank. Bin ids clamp to [0, bins−1], so the
  * cells exactly partition each candidate set.
  *
  * Returns (group, p, value) — GROUPS·|ps| rows. Nulls in the value
  * column are ignored (percentile semantics); a group with only nulls
  * never appears in the group stats and so yields no rows, matching a
  * groupBy over the non-null projection. A null GROUP KEY is its own
  * group, exactly like SQL GROUP BY (the histogram and leaf joins use
  * null-safe equality — ADVICE r11).
  *
  * `maxGroups` guards the intended-use envelope: targets and histogram
  * state scale with groups·|ps|, so a high-cardinality group column
  * (the per-user/per-document shape) must route to `percentile_approx`
  * — the sketch twin whose per-group state is accuracy-bounded (the
  * q_stats_outliers / q_stats_outliers_approx split). The guard throws
  * a directed error instead of quietly collecting an unbounded group
  * array to the driver.
  */
object Quantiles {

  private case class Conj(lo: Double, width: Double, b: Long)

  private case class Target(
      tid: Long, gval: Any, gmn: Double, gmx: Double, k: Long,
      var lo: Double, var hi: Double, var r: Long, var cnt: Long,
      var conjs: List[Conj] = Nil, var forced: Boolean = false,
      var value: Double = Double.NaN)

  def exactQuantiles(
      df: DataFrame, group: String, value: String, ps: Seq[Double],
      bins: Int = 4096, leaf: Int = 65536, maxIters: Int = 64,
      maxGroups: Int = 4096): DataFrame =
    exactQuantilesAndCounts(df, group, value, ps, bins, leaf, maxIters,
      maxGroups).drop("n")

  /** (group, n, p, value) — [[exactQuantiles]] plus the per-group
    * non-null count from the stats pass the engine runs anyway.
    * Consumers that need count + quantiles together
    * (q_event_funnel_time's converting-user count) read n here instead
    * of re-executing their input lineage for a separate count rollup —
    * the quantile result is driver-assembled, so that second execution
    * would re-pay the full upstream pipeline.
    */
  def exactQuantilesAndCounts(
      df: DataFrame, group: String, value: String, ps: Seq[Double],
      // leaf trades one more histogram round-trip (scan + bins·targets
      // collect) against the final sort's shuffle volume (every target
      // ships its whole candidate set through the row_number window —
      // ~|ps|·2 × the group's rows while candidate sets are still whole
      // groups). 65536 measured faster than a 2²⁰ direct-sort cut at
      // sf0.1 (1.37 s vs 1.87 s): the histogram pass collects KBs where
      // the early sort shuffles millions of rows.
      bins: Int = 4096, leaf: Int = 65536, maxIters: Int = 64,
      maxGroups: Int = 4096): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val spark = df.sparkSession

    // The refinement makes 2+iters passes over the SAME 2-column
    // projection — persist it for the call (MEMORY_AND_DISK: spills, the
    // KMeans cached-corpus precedent) and release before returning; the
    // driver-double result needs no lineage back to it. r19: when the
    // INPUT is already cached (q_event_funnel_time's memoized lag layer),
    // re-persisting the trivial projection just pays a second cache
    // write + unpersist bookkeeping per call — each pass recomputes the
    // projection from the cached parent instead.
    val proj = df.select(col(group), col(value).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
    val inputCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val base =
      if (inputCached) proj
      else proj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      exactOverBase(spark, df, base, group, ps, bins, leaf, maxIters,
        maxGroups)
    }
    finally { if (!inputCached) base.unpersist(blocking = false) }
  }

  private def exactOverBase(
      spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      base: DataFrame, group: String, ps: Seq[Double],
      bins: Int, leaf: Int, maxIters: Int, maxGroups: Int): DataFrame = {
    val groupField = df.schema(group)
    // limit BEFORE collect: the guard must bound the driver array it is
    // guarding — the aggregation runs distributed either way, but a
    // high-cardinality group column collects at most maxGroups+1 rows
    // before the directed error fires
    val gstats = base.groupBy(group)
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .limit(maxGroups + 1)
      .collect() // GROUPS-sized model state
    require(gstats.length <= maxGroups,
      s"exactQuantiles: more than $maxGroups distinct '$group' groups — " +
      "target/histogram state scales with groups*|ps|; route " +
      "high-cardinality groups to percentile_approx (the sketch twin, " +
      "cf. q_stats_outliers_approx), or raise maxGroups deliberately")

    // One target per distinct needed order statistic: floor/ceil of each
    // rank h = p·(n−1), deduped (an integral h needs one, not two).
    var nextTid = 0L
    val targets = gstats.flatMap { gr =>
      val n = gr.getLong(1)
      val (mn, mx) = (gr.getDouble(2), gr.getDouble(3))
      ps.flatMap { p =>
        val h = p * (n - 1)
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }.distinct.map { k =>
        nextTid += 1
        Target(nextTid, gr.get(0), mn, mx, k, mn, mx, k, n)
      }
    }

    def clampedBin(v: Column, lo: Column, width: Column): Column =
      least(lit((bins - 1).toLong),
        greatest(lit(0L), floor((v - lo) / width).cast(LongType)))
    // Membership = the group's full range ∧ the replayed bin tests; the
    // mutable lo/hi are width bookkeeping only, never membership.
    def memberOf(t: Target): Column =
      t.conjs.foldLeft(col("v") >= t.gmn && col("v") <= t.gmx) { (acc, c) =>
        acc && clampedBin(col("v"), lit(c.lo), lit(c.width)) === c.b
      }

    def targetDf(ts: Array[Target], extras: Seq[(String, Target => Any)]): DataFrame = {
      val schema = StructType(
        StructField("tid", LongType) +: groupField.copy(name = "__qt_g") +:
          extras.map { case (n, _) => StructField(n, DoubleType) })
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        ts.map(t => Row.fromSeq(t.tid +: t.gval +: extras.map(_._2(t)))): _*)
      spark.createDataFrame(rows, schema)
    }

    var iter = 0
    def active = targets.filter(t => !t.forced && t.cnt > leaf && t.lo < t.hi)
    while (active.nonEmpty && iter < maxIters) {
      iter += 1
      val act = active
      val widths = act.map(t => t.tid -> ((t.hi - t.lo) / bins)).toMap
      val tdf = targetDf(act, Seq(
        "__qt_lo" -> (t => t.lo), "__qt_width" -> (t => widths(t.tid))))
      val member = act.map(t => col("tid") === t.tid && memberOf(t)).reduce(_ || _)
      val hist = base
        // null-safe equality: a null group key is its own group (SQL
        // GROUP BY semantics) — plain === would orphan its targets and
        // the rank walk below would throw (ADVICE r11)
        .join(broadcast(tdf), col(group) <=> col("__qt_g"))
        .filter(member)
        .select(col("tid"),
          clampedBin(col("v"), col("__qt_lo"), col("__qt_width")).as("b"))
        .groupBy("tid", "b").agg(count(lit(1)).as("c"))
        .collect() // ≤ targets·bins cells of model state
        .groupBy(_.getLong(0))
      act.foreach { t =>
        val cells = hist(t.tid)
          .map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
        var r = t.r
        var chosen = -1L
        var chosenCnt = 0L
        cells.foreach { case (b, c) =>
          if (chosen < 0) {
            if (r < c) { chosen = b; chosenCnt = c } else r -= c
          }
        }
        val w = widths(t.tid)
        val newLo = t.lo + chosen * w
        val newHi = math.min(t.hi, t.lo + (chosen + 1) * w)
        t.conjs ::= Conj(t.lo, w, chosen)
        if (chosenCnt == t.cnt && newLo <= t.lo && newHi >= t.hi) {
          t.forced = true // width underflow: no further shrink possible
        } else {
          t.lo = newLo; t.hi = newHi
        }
        t.r = r; t.cnt = chosenCnt
      }
    }

    // Leaf extraction: one scan, per-target window sort of the remaining
    // candidates (≤ leaf rows per target unless degenerate — then the
    // sort spills instead of buffering).
    if (targets.nonEmpty) {
      val tdf = targetDf(targets, Nil)
      val member = targets.map(t => col("tid") === t.tid && memberOf(t)).reduce(_ || _)
      val rankOf = targets.map(t => (col("tid") === t.tid, lit(t.r + 1)))
        .foldRight(lit(-1L): Column) { case ((c, v), acc) => when(c, v).otherwise(acc) }
      val w = Window.partitionBy("tid").orderBy("v")
      val vals = base
        .join(broadcast(tdf), col(group) <=> col("__qt_g")) // see hist join
        .filter(member)
        .select(col("tid"), col("v"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn").cast(LongType) === rankOf)
        .select("tid", "v")
        .collect() // TARGETS-sized
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      targets.foreach(t => t.value = vals(t.tid))
    }

    // Assemble: q = lo + (hi − lo)·frac at h = p·(n−1) — the identical
    // IEEE expression Spark's percentile and DuckDB's quantile_cont
    // evaluate, once per (group, p) on driver doubles.
    val byKey = targets.map(t => (t.gval, t.k) -> t.value).toMap
    val outSchema = StructType(Seq(
      groupField, StructField("n", LongType),
      StructField("p", DoubleType), StructField("value", DoubleType)))
    val rows = gstats.flatMap { gr =>
      val n = gr.getLong(1)
      ps.map { p =>
        val h = p * (n - 1)
        val kf = math.floor(h).toLong
        val kc = math.ceil(h).toLong
        val vlo = byKey((gr.get(0), kf))
        // Spark Percentile's exact expression — the weighted two-product
        // form (kc−h)·lo + (h−kf)·hi, NOT lo + (hi−lo)·frac: the two
        // differ in the last ulp and the builtin is the parity anchor
        // (DuckDB's quantile_cont sits within the oracle's 10-sig-digit
        // compare either way).
        val q = if (kf == kc) vlo
                else (kc - h) * vlo + (h - kf) * byKey((gr.get(0), kc))
        Row(gr.get(0), n, p, q)
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), outSchema)
  }
}
