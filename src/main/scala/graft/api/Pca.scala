package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic power-iteration PCA over the exact integer co-moments —
  * the PRODUCTION half of q_emb_project's fixture-basis split (VERDICT
  * r13 #3): q_emb_covariance already folds the corpus into an O(d²)
  * co-moment buffer; this refines that same state into the top-k
  * eigenbasis every real embedding-curation pipeline projects onto.
  *
  * Shape at 100 TB: the ONLY corpus-sized work is one pass through
  * [[graft.functions.EmbCovDiagAggregator]] (map-side partial buffers,
  * one ~33 KB (n, Σx, Σxx) state per partition on the exchange — the
  * q_emb_covariance scan with the diagonal included). Everything after —
  * the d×d covariance assembly and the power iteration with deflation
  * (public: the classic von Mises iteration; Golub & Van Loan, "Matrix
  * Computations") — is driver arithmetic over a 64×64 matrix: bounded
  * model state by the KMeans.fit doctrine, never corpus data.
  *
  * Determinism contract (the `_trained` family rule): the co-moments are
  * exact integers (order-independent sums), so the assembled covariance
  * doubles are identical under any partitioning; the driver iteration is
  * fixed-init (the basis vector of the largest remaining diagonal entry,
  * lowest index on ties), fixed-count, and sequential — same doubles in,
  * same doubles out, on every run and every cluster layout. The emitted
  * basis milli-quantizes (floor(v·1000), the q_emb_covariance device) so
  * downstream projection is EXACT integer arithmetic.
  *
  * A component whose deflated matrix is numerically zero (rank-deficient
  * corpus) emits its init axis unrotated — deterministic, and flagged by
  * a zero eigenvalue rather than a NaN basis.
  *
  * Returns (k: long, i: long, b: long, lambda_e6: long) rows: component,
  * dimension, milli-quantized coefficient, and the component's eigenvalue
  * in 1e-6 covariance units (for the variance-ordering spec; projection
  * consumers read only (k, i, b)).
  */
object Pca {

  /** Power-iteration sweeps per component: the dominant-eigenvector error
    * shrinks as (λ₂/λ₁)^t, so 96 sweeps resolve even a 0.9 ratio to ~4e-5
    * — far below the 1e-3 milli-quantization the basis ships at. Part of
    * the model artifact's version tag (changing it must refit). */
  private[graft] val Iters = 96

  def fitBasis(e: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val dim = graft.functions.EmbCovDiagAggregator.Dim
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")

    // ONE corpus pass: milli-quantize, fold into the diagonal-inclusive
    // co-moment buffer, land ≤ d(d+1)/2 cells on the driver
    val cells = e
      .select(transform(col(vecCol), x => floor(x * 1000).cast("long")).as("q"))
      .as[Seq[Long]]
      .select(graft.functions.EmbCovDiagAggregator.toColumn)
      .head()
    require(cells.nonEmpty,
      "cannot fit PCA on an empty corpus (no vectors reached the " +
      "co-moment aggregation — check upstream filters)")

    // symmetric covariance NUMERATOR matrix n·Σxᵢxⱼ − Σxᵢ·Σxⱼ: the same
    // integers q_emb_covariance surfaces, assembled in BigInt (exact at
    // any corpus size) and converted to double ONCE — eigenvectors are
    // scale-invariant, so the 1/n² normalization is skipped entirely
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { case (i, j, n, sxi, sxj, sxy) =>
      val num = (BigInt(n) * BigInt(sxy) - BigInt(sxi) * BigInt(sxj)).toDouble
      c(i)(j) = num
      c(j)(i) = num
    }
    val n = cells.head._3

    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (comp <- 0 until k) {
      // fixed init: the axis of the largest remaining diagonal entry
      // (strict > keeps the lowest index on exact ties), plus a dense
      // DETERMINISTIC hash-derived perturbation — a pure axis init can
      // be an EXACT eigenvector of C (off-diagonal column identically
      // zero) with a non-maximal eigenvalue, and power iteration would
      // then never acquire a component of the true dominant direction
      // (eigenvalues out of descending order — r18 self-review). The
      // ~1e-6 components make exact orthogonality to the dominant
      // eigenvector practically impossible while leaving a convergent
      // run's fixed point (and its milli-quantized output) unchanged.
      var best = 0
      var i = 1
      while (i < dim) { if (c(i)(i) > c(best)(best)) best = i; i += 1 }
      var v = Array.tabulate(dim)(d =>
        (if (d == best) 1.0 else 0.0) +
          1e-6 * (((d * 2654435761L + comp * 40503L) & 1023L) + 1L) / 1024.0)
      var it = 0
      var degenerate = false
      while (it < Iters && !degenerate) {
        val w = new Array[Double](dim)
        var r = 0
        while (r < dim) {
          var s = 0.0; var d2 = 0
          while (d2 < dim) { s += c(r)(d2) * v(d2); d2 += 1 }
          w(r) = s; r += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        if (nrm == 0.0) degenerate = true // zero matrix: keep the init axis
        else v = w.map(_ / nrm)
        it += 1
      }
      // Rayleigh quotient λ = vᵀCv (v is unit), then deflate C −= λ·v·vᵀ
      var lambda = 0.0
      var r = 0
      while (r < dim) {
        var s = 0.0; var d2 = 0
        while (d2 < dim) { s += c(r)(d2) * v(d2); d2 += 1 }
        lambda += v(r) * s; r += 1
      }
      r = 0
      while (r < dim) {
        var d2 = 0
        while (d2 < dim) { c(r)(d2) -= lambda * v(r) * v(d2); d2 += 1 }
        r += 1
      }
      // sign rule: the largest-|coefficient| entry (lowest index on ties)
      // points positive — eigenvectors are sign-ambiguous, outputs not
      var sIdx = 0
      i = 1
      while (i < dim) { if (math.abs(v(i)) > math.abs(v(sIdx))) sIdx = i; i += 1 }
      if (v(sIdx) < 0) v = v.map(-_)
      // eigenvalue reported in per-row covariance units: λ is in NUMERATOR
      // units (n² × covariance) — undo n² and e-6-quantize for the spec.
      // Clamped at 0: deflation of a rank-deficient corpus can leave a
      // tiny NEGATIVE Rayleigh quotient (float residue of a mathematically
      // zero eigenvalue), and floor() would emit -1 where the documented
      // degenerate-component flag is 0 (ADVICE r14)
      val lambdaE6 =
        math.floor(math.max(lambda, 0.0) / (n.toDouble * n.toDouble) * 1e6)
          .toLong
      var d3 = 0
      while (d3 < dim) {
        out += ((comp.toLong, d3.toLong,
                 math.floor(v(d3) * 1000).toLong, lambdaE6))
        d3 += 1
      }
    }
    out.result().toDF("k", "i", "b", "lambda_e6")
  }
}
