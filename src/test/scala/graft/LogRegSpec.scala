package graft

import org.apache.spark.sql.functions._

/** Contract for the learned quality gate (graft.api.LogReg +
  * TextQueries.q_text_quality_model_trained — the no_oracle trained twin
  * of the hash-checked q_text_quality_model):
  *
  *  - the FIT is bit-deterministic under different partitionings (the
  *    KMeans.fit decimal-accumulation doctrine);
  *  - the trainer actually learns: a linearly separable crafted problem
  *    fits to zero training error, and the production model's holdout
  *    AUC against the heuristic labels clears 0.80 (fifth of doc_ids
  *    the fit never saw);
  *  - the trained operating point is calibrated: the gate's keep rate
  *    tracks the label base rate (the threshold = (1−p) train-margin
  *    quantile contract);
  *  - the apply path (scoreWithWeights) is exact against a hand-built
  *    model.
  */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  private def feats(rows: Seq[(Long, Int, Double)]) =
    rows.toDF("id", "b", "c")
  private def labels(rows: Seq[(Long, Int)]) =
    rows.toDF("id", "y")

  // 40 docs: positives carry bucket 0, negatives bucket 1 — separable
  private val sepF = (0L until 40L).map(id =>
    (id, if (id % 2 == 0) 0 else 1, 1.0))
  private val sepL = (0L until 40L).map(id => (id, if (id % 2 == 0) 1 else 0))

  test("fit is bit-deterministic across partitionings") {
    val w1 = graft.api.LogReg.fit(
      feats(sepF).repartition(3), labels(sepL).repartition(2),
      dim = 2, iters = 8, lr = 5.0)
    val w2 = graft.api.LogReg.fit(
      feats(sepF).repartition(7), labels(sepL).repartition(5),
      dim = 2, iters = 8, lr = 5.0)
    assert(w1.toSeq == w2.toSeq) // exact double equality, not tolerance
  }

  test("fit separates a linearly separable problem (w0 > w1, perfect " +
       "train ranking)") {
    val w = graft.api.LogReg.fit(feats(sepF), labels(sepL),
      dim = 2, iters = 20, lr = 5.0)
    assert(w(0) > w(1),
      s"positive-class bucket weight must dominate: ${w.toSeq}")
    // margins: every positive (bucket 0) outranks every negative
    assert(w(0) + w(2) > w(1) + w(2))
  }

  test("fit drops unlabeled ids (holdout) from the gradient") {
    // identical labeled rows, one extra unlabeled id with a huge count:
    // if it leaked into the gradient the weights would differ
    val extra = feats(sepF ++ Seq((999L, 0, 50.0)))
    val w1 = graft.api.LogReg.fit(feats(sepF), labels(sepL), 2, 8, 5.0)
    val w2 = graft.api.LogReg.fit(extra, labels(sepL), 2, 8, 5.0)
    assert(w1.toSeq == w2.toSeq)
  }

  test("production model: holdout AUC >= 0.80, keep rate tracks the " +
       "label base rate, repeat apply is identical") {
    val auc = operators.TextQueries.trainedQualityHoldoutAuc(spark, sf)
    assert(auc >= 0.80, s"holdout AUC $auc below the 0.80 gate")
    val scored = operators.TextQueries.queries(
      "q_text_quality_model_trained")(spark, sf)
    val n = scored.count().toDouble
    val kept = scored.filter("keep").count().toDouble
    // base rate at sf0.001 is ~0.17; the trained threshold pins the
    // keep rate to the train-split base rate — allow the holdout drift
    assert(kept / n > 0.05 && kept / n < 0.40,
      s"keep rate ${kept / n} not tracking the base rate")
    // determinism of the full apply path (artifact-served model)
    val a = scored.orderBy("doc_id").collect().toSeq
    val b = operators.TextQueries.queries(
      "q_text_quality_model_trained")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("s_quality_gate's per-row scorer is BIT-EQUAL to the batch gate " +
       "(sorted-run decimal fold == bucket aggregation, same doubles)") {
    val batch = operators.TextQueries.queries(
      "q_text_quality_model_trained")(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = operators.TextQueries.queries("s_quality_gate")(spark, sf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(perRow == batch) // exact equality incl. every score_e6 double-floor
  }

  test("scoreWithWeights is exact against a hand-built model") {
    // model: w = [2.0, -1.0], intercept 0.5, threshold 1.0
    val model = Array(2.0, -1.0, 0.5, 1.0)
    val f = feats(Seq((1L, 0, 1.0), (1L, 1, 2.0), (2L, 0, 1.5)))
    val got = operators.TextQueries.scoreWithWeights(f, model)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    // doc 1: m = 2 - 2 + 0.5 = 0.5  → floor(0.5e6) = 500000, keep false
    // doc 2: m = 3 + 0.5 = 3.5      → 3500000, keep true (>= 1.0)
    assert(got == Seq((1L, 500000L, false), (2L, 3500000L, true)))
  }
}
