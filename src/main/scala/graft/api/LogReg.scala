package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed binary logistic regression over SPARSE hashed count
  * features — the trainer behind the model-based quality gate
  * (q_text_quality_model_trained), the learned stage DCLM/FineWeb-class
  * curation pipelines run beside the hand-weighted heuristics.
  *
  * Plain full-batch gradient descent, deliberately: the model is a
  * D-dim linear scorer (D = a few hundred hash buckets), so per
  * iteration the corpus contributes ONE feature-keyed aggregation —
  * compute cost is a linear scan, model state is D+1 driver doubles
  * (the KMeans.fit contract; the corpus is never collected).
  *
  * Deterministic BY CONSTRUCTION, like [[KMeans.fit]]: zero init, fixed
  * iteration count and learning rate, and every distributed sum
  * accumulates in DECIMAL(30,15) — double addition is non-associative
  * and shuffle-partial merge order is arbitrary, so a double sum could
  * differ in ULPs between runs of the SAME fit; decimal sums are exact
  * and order-independent, and the per-row double math (sigmoid, w·x)
  * is a pure function of driver-resident weights. Two fits on the same
  * input produce BIT-IDENTICAL weights under any partitioning
  * (LogRegSpec pins it).
  *
  * Scale shape per iteration: margins = one broadcast join of the
  * (D+1)-row weight table onto the cached feature triples + one id-keyed
  * aggregation; gradient = one id-keyed join-back + one b-keyed
  * aggregation collecting D+1 cells. No corpus-sized driver state, no
  * window functions, no cartesians; iters × 2 keyed shuffles total.
  */
object LogReg {

  /** Fit weights over `feats` (id, b, c) — b ∈ [0, dim) hashed feature
    * buckets, c the integer count — against `labels` (id, y ∈ {0,1}).
    * Ids absent from `labels` (an unlabeled holdout) are dropped from
    * the gradient by the inner join, so callers can train on a split of
    * the same feature table they score.
    *
    * Returns dim+1 doubles: weights(b) for b < dim, intercept at
    * weights(dim).
    */
  def fit(feats: DataFrame, labels: DataFrame, dim: Int, iters: Int,
          lr: Double): Array[Double] = {
    val spark = feats.sparkSession
    require(dim >= 1 && iters >= 0 && lr > 0)
    // the per-iteration aggregations grind ONLY ids the gradient can
    // use: holdout ids are discarded by the inner join every pass, so
    // they are dropped once up front instead (r18 self-review)
    val f = feats.select(col("id"), col("b").cast("int"),
      col("c").cast("double").as("c"))
      .join(labels.select("id").distinct(), Seq("id"), "left_semi")
    // ... and symmetrically, a labeled id with NO feature rows
    // contributes no gradient anywhere — counting it in n (the 1/n step
    // scale) and the base-rate intercept init silently deviated from
    // full-batch GD over the set actually fitted (r18 self-review)
    val lab = labels.select(col("id"), col("y").cast("double").as("y"))
      .join(feats.select("id").distinct(), Seq("id"), "left_semi")
    // iters passes re-read both inputs — cache the projections for the
    // fit and release on exit (the KMeans cached-corpus rule)
    f.cache(); lab.cache()
    try {
      val counts = lab.agg(count(lit(1)), sum("y")).head
      val n = counts.getLong(0).toDouble
      require(n > 0, "cannot fit logistic regression on zero labeled rows")
      val nPos = counts.getDouble(1)
      val w = new Array[Double](dim + 1)
      // intercept starts at the base-rate log-odds — the intercept-only
      // MLE. Without it, an imbalanced label (say 17% positive) spends
      // most of a short full-batch schedule dragging w0 toward the base
      // rate while the feature weights lag, and the natural margin>=0
      // gate stays uncalibrated. Deterministic: an exact count ratio.
      if (nPos > 0 && nPos < n)
        w(dim) = math.log(nPos / (n - nPos))
      for (_ <- 1 to iters) {
        // weights attach as a CONSTANT-FOLDED literal array (element_at
        // on a foldable CreateArray → one Literal after ConstantFolding)
        // — the model is driver state, so there is nothing to join: no
        // broadcast, no join node, one aggregation per pass, and the
        // per-iteration Catalyst planning cost of a fresh join subtree
        // disappears (the cold fit was plan-compile-bound, not
        // compute-bound, at fixture scale)
        val warr = array((0 until dim).map(b => lit(w(b))): _*)
        val w0 = w(dim)
        // margins per id (decimal sum → order-independent), then the
        // per-row residual err = sigmoid(margin) − y
        val err = f
          .groupBy("id")
          .agg(sum((col("c") * element_at(warr, col("b") + 1))
            .cast("decimal(30,15)"))
            .cast("double").as("m"))
          .join(lab, Seq("id"))
          .select(col("id"), (sigmoidCol(col("m") + lit(w0)) - col("y")).as("e"))
        // the residual frame feeds two sums — cache it for the iteration
        // so the margin aggregation runs once, not once per consumer;
        // try/finally so a failed collect can't leak the cached frame
        // (the outer finally releases only f and lab)
        err.cache()
        val (cells, g0) =
          try {
            // gradient feature cells: err joins back onto the feature
            // triples (id-keyed), aggregates per bucket — D cells of
            // model state
            val c = err.join(f, Seq("id"))
              .groupBy("b")
              .agg(sum((col("e") * col("c")).cast("decimal(30,15)"))
                .cast("double").as("g"))
              .collect()
            // intercept gradient: Σe once per ID (from err directly —
            // summing via the feature join would count each id once per
            // feature row)
            val g = err.agg(sum(col("e").cast("decimal(30,15)"))
              .cast("double")).head.getDouble(0)
            (c, g)
          } finally err.unpersist(blocking = false)
        val grad = new Array[Double](dim + 1)
        cells.foreach(r => grad(r.getInt(0)) = r.getDouble(1))
        grad(dim) = g0
        var j = 0
        while (j <= dim) { w(j) -= lr / n * grad(j); j += 1 }
      }
      w
    } finally { f.unpersist(blocking = false); lab.unpersist(blocking = false) }
  }

  /** Column-level sigmoid with a saturation guard (exp overflows double
    * at |m| ≳ 710, and the probability is exactly 0/1 at double
    * precision long before that) — per-row double math, deterministic
    * given driver-resident weights. */
  def sigmoidCol(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(m >= 40, 1.0).when(m <= -40, 0.0)
      .otherwise(lit(1.0) / (lit(1.0) + exp(-m)))
}
