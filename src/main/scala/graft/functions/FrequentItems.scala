package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary as a typed UDAF (SURVEY.md §2.5 S3
  * family; public: Misra & Gries, "Finding repeated elements", Science of
  * Computer Programming 1982; the counter-subtraction merge rule from
  * Agarwal et al., "Mergeable summaries", PODS 2012).
  *
  * State is AT MOST [[K]] (item, counter) pairs plus the exact item total
  * n, regardless of input size or vocabulary — the point at 100 TB: each
  * partition's partial aggregation holds k counters instead of a
  * vocab-sized hash map, and the exchange moves k rows per partition.
  * The summary guarantees, for n total items:
  *
  *   - every item with true count > n/(K+1) HAS a counter (no false
  *     negatives among heavy hitters), and
  *   - each surviving counter undercounts its item's true count by at
  *     most n/(K+1).
  *
  * The surviving candidate SET beyond the guaranteed heavy hitters
  * depends on reduce/merge order (as with every MG implementation), so
  * consumers needing deterministic output re-count candidates exactly
  * and threshold — the classic two-pass heavy-hitter pattern
  * (q_text_heavyhitters): pass 2 is a tiny ≤K-key aggregation, and the
  * final thresholded set is ORDER-INDEPENDENT because it equals exactly
  * the true > n/(K+1) items whatever extra candidates survived. n rides
  * the buffer so the threshold needs no separate corpus scan.
  */
object FrequentItems
    extends Aggregator[String, (Map[String, Long], Long), (Array[String], Long)] {

  /** Counter budget; the guarantee floor is n/(K+1) = n/50. */
  val K = 49

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  override def reduce(b: (Map[String, Long], Long),
                      a: String): (Map[String, Long], Long) = {
    val (m, n) = b
    val m2 = m.get(a) match {
      case Some(c) => m.updated(a, c + 1)
      case None if m.size < K => m.updated(a, 1L)
      // all K counters taken: decrement every counter, drop zeros, and
      // the arriving item is NOT inserted — the classic MG step
      case None => m.flatMap { case (k, c) =>
        if (c > 1) Some(k -> (c - 1)) else None }
    }
    (m2, n + 1)
  }

  override def merge(b1: (Map[String, Long], Long),
                     b2: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val sum = b2._1.foldLeft(b1._1) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c) }
    val trimmed =
      if (sum.size <= K) sum
      else {
        // subtract the (K+1)-th largest counter from all, drop
        // non-positive — the mergeable-summaries rule; total error stays
        // ≤ n/(K+1)
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(K)
        sum.flatMap { case (k, c) =>
          if (c > cut) Some(k -> (c - cut)) else None }
      }
    (trimmed, b1._2 + b2._2)
  }

  /** (candidate items sorted for stable presentation, exact total n).
    * Counter values are order-dependent UNDERestimates and deliberately
    * not exposed — consumers re-count candidates exactly. */
  override def finish(r: (Map[String, Long], Long)): (Array[String], Long) =
    (r._1.keys.toArray.sorted, r._2)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Map[String, Long], Long)]()

  override def outputEncoder: Encoder[(Array[String], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Long)]()
}

/** WEIGHTED Misra-Gries: consumes (item, weight) rows — a PRE-AGGREGATED
  * count relation like the shared token layer — instead of one row per
  * occurrence. Each arriving pair is treated as a singleton summary
  * {item → w, n = w} and folded with [[FrequentItems.merge]]'s
  * counter-subtraction rule, so the mergeable-summaries error bound
  * (≤ n/(K+1), n = TOTAL WEIGHT) holds by the same argument as the
  * unweighted form — and therefore so does the no-false-negative
  * guarantee the deterministic two-pass recount rests on. A corpus fed
  * as (token, c) rows yields EXACTLY the heavy-hitter set of the same
  * corpus fed one row per occurrence (both equal the true
  * count > n/(K+1) items after the exact recount).
  */
object FrequentItemsW
    extends Aggregator[(String, Long), (Map[String, Long], Long),
                       (Array[String], Long)] {

  override def zero: (Map[String, Long], Long) = FrequentItems.zero

  override def reduce(b: (Map[String, Long], Long),
                      a: (String, Long)): (Map[String, Long], Long) =
    FrequentItems.merge(b, (Map(a._1 -> a._2), a._2))

  override def merge(b1: (Map[String, Long], Long),
                     b2: (Map[String, Long], Long)): (Map[String, Long], Long) =
    FrequentItems.merge(b1, b2)

  override def finish(r: (Map[String, Long], Long)): (Array[String], Long) =
    FrequentItems.finish(r)

  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    FrequentItems.bufferEncoder

  override def outputEncoder: Encoder[(Array[String], Long)] =
    FrequentItems.outputEncoder
}
