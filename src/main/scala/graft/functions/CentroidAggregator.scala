package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.5 S3): elementwise centroid of an embedding
  * column — the k-means building block for the IVF index at scale.
  *
  * Aggregator gives partial aggregation for free (reduce on executors,
  * merge on the exchange), so the shuffle carries one (sum[dim], count)
  * buffer per partition per group, never raw vectors. Float sums are
  * order-dependent, so centroid outputs are spec-tested (CentroidSpec),
  * not oracle-hashed (SURVEY.md §7.6).
  */
object CentroidAggregator
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  // ragged input is DATA CORRUPTION, not a shape to adapt to: silently
  // min-length-truncating would emit a wrong centroid that looks valid
  // (the EmbMomentsAggregator require precedent) — fail with a shape
  // diagnostic instead (r18 self-review). The dimension is pinned by the
  // first row each partition reduces; merge cross-checks partitions.
  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    require(v != null, "CentroidAggregator: null embedding row")
    val (sums, n) = b
    if (n == 0L) (v.toArray, 1L)
    else {
      require(v.length == sums.length,
        s"CentroidAggregator: ragged embedding — dim ${sums.length} " +
        s"established, row has ${v.length}")
      var i = 0
      while (i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._2 == 0) b
    else if (b._2 == 0) a
    else {
      require(a._1.length == b._1.length,
        s"CentroidAggregator: ragged partitions — dims ${a._1.length} " +
        s"vs ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
