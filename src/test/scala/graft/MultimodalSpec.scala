package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalQueries
import graft.functions.CentroidAggregator

/** Multimodal plumbing + typed UDAF specs (north star). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table: binary payloads with typed metadata") {
    val m = MultimodalQueries.media(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.select("meta.n_bytes").filter(col("n_bytes") <= 0).count() == 0)
    assert(m.select("media_type").distinct().count() == 3)
  }

  test("stub decode: fixed-width deterministic features per media row") {
    val feats = MultimodalQueries.stubDecodeFeatures(
      MultimodalQueries.media(spark, sf))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Seq[Double]]("features").length == 8))
    // deterministic: running twice gives identical features
    val again = MultimodalQueries.stubDecodeFeatures(
      MultimodalQueries.media(spark, sf)).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // mean byte value of lowercase text lands in a sane band
    val f0 = rows.head.getAs[Seq[Double]]("features").head
    assert(f0 > 32 && f0 < 127)
  }

  test("centroid Aggregator: per-label elementwise mean of embeddings") {
    val e = Tables.embeddings(spark, sf)
      .select(col("label"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Int, Seq[Double])]
    val cents = e.groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("centroid"))
      .collect()
    // hand-check one label against a driver-side computation
    val (lbl, got) = {
      val c = cents.head
      (c._1, c._2)
    }
    val vecs = e.filter(_._1 == lbl).map(_._2).collect().map(_.toVector).toVector
    val want = vecs.transpose.map(xs => xs.sum / xs.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    assert(got.length == 64)
  }
}
