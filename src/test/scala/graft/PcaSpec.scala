package graft

import org.apache.spark.sql.functions._
import graft.api.Pca

/** Contract specs for the trained-PCA half of the projection family
  * (q_emb_project_trained, VERDICT r13 #3): the fit is no_oracle by
  * design (a trained float eigenbasis has no SQL mirror), so these pins
  * ARE the correctness surface — determinism, known-axis recovery,
  * variance ordering, and rank-k reconstruction, plus the production
  * query path over the fixture corpus.
  */
class PcaSpec extends SparkSpec {

  private val dim = graft.functions.EmbCovDiagAggregator.Dim

  /** Crafted corpus with a KNOWN eigenstructure: mean-zero points along
    * axis 0 with spread ±9 and axis 1 with spread ±2 (exact milli-unit
    * integers after the fit's floor(x·1000) quantization), zeros
    * elsewhere — covariance is diagonal with λ0 ≫ λ1 ≫ rest = 0. */
  private def crafted = {
    import spark.implicits._
    def v(i: Int, x: Double) =
      Seq.tabulate(dim)(d => if (d == i) x else 0.0)
    Seq(
      (0L, v(0, 9.0)), (1L, v(0, -9.0)),
      (2L, v(1, 2.0)), (3L, v(1, -2.0)),
      (4L, v(0, 3.0)), (5L, v(0, -3.0))
    ).toDF("vec_id", "v")
  }

  test("fitBasis recovers a known principal axis with the sign rule") {
    val basis = Pca.fitBasis(crafted, "v", k = 2).collect()
    val b0 = basis.filter(_.getLong(0) == 0L)
      .sortBy(_.getLong(1)).map(_.getLong(2))
    val b1 = basis.filter(_.getLong(0) == 1L)
      .sortBy(_.getLong(1)).map(_.getLong(2))
    // component 0 = +axis0 exactly (unit vector milli-quantizes to 1000;
    // the sign rule forces the dominant coefficient positive)
    assert(b0(0) == 1000L, s"expected +1000 on dim 0, got ${b0(0)}")
    assert(b0.drop(1).forall(x => math.abs(x) <= 1),
      "component 0 must be the pure axis-0 vector")
    // component 1 = +axis1 after deflation removed axis 0
    assert(b1(1) == 1000L, s"expected +1000 on dim 1, got ${b1(1)}")
    assert((b1.take(1) ++ b1.drop(2)).forall(x => math.abs(x) <= 1),
      "component 1 must be the pure axis-1 vector")
    // eigenvalues strictly ordered: var(axis0) > var(axis1)
    val l0 = basis.filter(_.getLong(0) == 0L).head.getLong(3)
    val l1 = basis.filter(_.getLong(0) == 1L).head.getLong(3)
    assert(l0 > l1 && l1 > 0, s"eigenvalue order violated: $l0 vs $l1")
  }

  test("fitBasis is deterministic across fits and partitionings") {
    val a = Pca.fitBasis(crafted, "v", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val b = Pca.fitBasis(crafted.repartition(7), "v", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(a == b, "integer co-moments must make the fit layout-invariant")
  }

  test("rank-k reconstruction of a rank-k corpus is near-exact") {
    // the crafted corpus is rank 2, so projecting onto the top-2 trained
    // components and reconstructing must recover every vector to within
    // the 1e-3 basis quantization (residual per coordinate ≤ ~x·1e-3·2)
    val basis = Pca.fitBasis(crafted, "v", k = 2).collect()
    val bs = (0 until 2).map { k =>
      val arr = new Array[Double](dim)
      basis.filter(_.getLong(0) == k.toLong)
        .foreach(r => arr(r.getLong(1).toInt) = r.getLong(2) / 1000.0)
      arr
    }
    crafted.collect().foreach { row =>
      val x = row.getSeq[Double](1).toArray
      val recon = new Array[Double](dim)
      bs.foreach { b =>
        val p = x.zip(b).map { case (a, c) => a * c }.sum
        var i = 0
        while (i < dim) { recon(i) += p * b(i); i += 1 }
      }
      val err = x.zip(recon).map { case (a, r) => (a - r) * (a - r) }.sum
      assert(err < 1e-3, s"vec ${row.getLong(0)} reconstruction err $err")
    }
  }

  test("q_emb_project_trained runs the production path deterministically") {
    val q = SparkEntry.queries("q_emb_project_trained")
    val a = q(spark, sf).collect().map(_.toSeq).toSeq
    val b = q(spark, sf).collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
    // schema contract matches the fixture twin (vec_id, p0..p{ProjK-1})
    val cols = q(spark, sf).columns.toSeq
    assert(cols == Seq("vec_id", "p0", "p1", "p2", "p3"))
  }

  test("degenerate (zero-variance) corpus emits a deterministic basis") {
    import spark.implicits._
    val z = Seq((0L, Seq.fill(dim)(0.5)), (1L, Seq.fill(dim)(0.5)))
      .toDF("vec_id", "v")
    val basis = Pca.fitBasis(z, "v", k = 1).collect()
    // zero covariance: the init axis (dim 0) survives unrotated, λ = 0
    val b0 = basis.sortBy(_.getLong(1)).map(_.getLong(2))
    assert(b0(0) == 1000L && b0.drop(1).forall(_ == 0L))
    assert(basis.head.getLong(3) == 0L)
  }
}
