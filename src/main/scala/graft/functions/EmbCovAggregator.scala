package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF base: exact integer co-moment state for the embedding
  * dimension-covariance family (q_emb_covariance, the trained-PCA fit) —
  * Σxᵢ per dimension and Σxᵢxⱼ per pair over milli-quantized codes
  * (floor(x·1000), so every sum is integer arithmetic and the DuckDB
  * oracle replays it bit-for-bit).
  *
  * Aggregator gives partial aggregation for free: each executor folds its
  * rows into ONE (n, sx[d], sxy[d·d]) buffer (d=64 → ~33 KB), and the
  * exchange carries one buffer per partition — never raw vectors and
  * never the d²-per-row pair fan-out the naive explode-join shape would
  * shuffle. That is the whole 100 TB story: state is O(d²) regardless of
  * corpus size, identical to CentroidAggregator's O(d) pattern.
  *
  * finish emits the pair cells (i, j, n, Σxᵢ, Σxⱼ, Σxᵢxⱼ); the caller
  * forms the covariance numerator n·Σxᵢxⱼ − Σxᵢ·Σxⱼ in DECIMAL(38,0)
  * (the engine-wide envelope doctrine — codes are ≤~2¹¹, so Σ products
  * stay in Long to ~2⁴⁰ rows, and the final cross-products are where
  * Long would first overflow).
  *
  * `jFrom(i)` picks the emitted/accumulated column range per row i:
  * [[EmbCovAggregator]] keeps the strict upper triangle (i < j — the
  * q_emb_covariance audit's hash-pinned shape), [[EmbCovDiagAggregator]]
  * includes the diagonal (i ≤ j — the full symmetric matrix the PCA fit
  * needs; Σxᵢ² rides sxy(i,i)).
  */
sealed abstract class EmbMomentsAggregator(jFrom: Int => Int)
    extends Aggregator[Seq[Long], (Long, Array[Long], Array[Long]),
                       Seq[(Int, Int, Long, Long, Long, Long)]] {

  val Dim = 64

  override def zero: (Long, Array[Long], Array[Long]) =
    (0L, Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: (Long, Array[Long], Array[Long]),
                      v: Seq[Long]): (Long, Array[Long], Array[Long]) = {
    val (n, sx0, sxy0) = b
    val (sx, sxy) =
      if (sx0.isEmpty) (new Array[Long](Dim), new Array[Long](Dim * Dim))
      else (sx0, sxy0)
    val arr = v.toArray
    // the engine is ANSI-loud about shape errors: silently truncating a
    // wider export (or zero-filling a narrower one) would emit wrong
    // covariances that LOOK valid — surface the mismatch instead
    require(arr.length == Dim,
      s"EmbMomentsAggregator expects $Dim-dim vectors, got ${arr.length}")
    var i = 0
    while (i < Dim) {
      val vi = arr(i)
      sx(i) += vi
      var j = jFrom(i)
      while (j < Dim) { sxy(i * Dim + j) += vi * arr(j); j += 1 }
      i += 1
    }
    (n + 1, sx, sxy)
  }

  override def merge(a: (Long, Array[Long], Array[Long]),
                     b: (Long, Array[Long], Array[Long])): (Long, Array[Long], Array[Long]) =
    if (a._1 == 0) b
    else if (b._1 == 0) a
    else {
      var i = 0
      while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }

  override def finish(r: (Long, Array[Long], Array[Long])): Seq[(Int, Int, Long, Long, Long, Long)] =
    if (r._1 == 0) Seq.empty
    else (for {
      i <- 0 until Dim
      j <- jFrom(i) until Dim
    } yield (i, j, r._1, r._2(i), r._2(j), r._3(i * Dim + j))).toSeq

  override def bufferEncoder: Encoder[(Long, Array[Long], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Array[Long], Array[Long])]()

  override def outputEncoder: Encoder[Seq[(Int, Int, Long, Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Int, Int, Long, Long, Long, Long)]]()
}

/** Strict upper triangle (i < j) — q_emb_covariance's hash-pinned shape. */
object EmbCovAggregator extends EmbMomentsAggregator(i => i + 1)

/** Diagonal-inclusive (i ≤ j) — the full symmetric co-moment matrix for
  * [[graft.api.Pca.fitBasis]] (one corpus pass, O(d²) state). */
object EmbCovDiagAggregator extends EmbMomentsAggregator(i => i)
