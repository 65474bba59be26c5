package graft.functions

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass whitespace-token statistics over a document's UTF-8
  * bytes, with EXACTLY the semantics of Spark's `split(text, ' ')`
  * (limit -1): fields are the maximal byte runs between single 0x20
  * separators, empty fields included, and the field count is
  * separators + 1 (the empty string has one empty field).
  *
  * Byte-level scanning is Unicode-safe here because 0x20 never occurs
  * inside a multi-byte UTF-8 sequence (continuation bytes are ≥ 0x80),
  * so a space byte is always a real separator.
  *
  * These kernels exist to keep BM25-style corpus statistics per-row:
  * `dl` (document length in tokens) and `tf` (occurrences of a fixed
  * query term) come out of one fused codegen scan of each document,
  * instead of exploding the corpus into token rows and shuffling them
  * through two groupBys — at data scale the explode materializes T
  * token rows (billions) where the per-row form shuffles nothing.
  */
object TokenStats {

  /** Tokens per document = separator count + 1 (split-with-limit=-1
    * parity, trailing empties kept). */
  def tokenCount(text: UTF8String): Long = {
    val n = text.numBytes()
    var spaces = 0L
    var i = 0
    while (i < n) {
      if (text.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    spaces + 1L
  }

  /** Occurrences of `term` among the document's whitespace tokens —
    * `size(filter(split(text,' '), t -> t = term))` without the array. */
  def termCount(text: UTF8String, term: UTF8String): Long = {
    val n = text.numBytes()
    val m = term.numBytes()
    var count = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == 0x20) {
        if (i - start == m) {
          var j = 0
          var eq = true
          while (eq && j < m) {
            if (text.getByte(start + j) != term.getByte(j)) eq = false
            j += 1
          }
          if (eq) count += 1L
        }
        start = i + 1
      }
      i += 1
    }
    count
  }

  /** Per-document BIGRAM hash counts in one fused scan: for each
    * adjacent token pair (w1, w2) of `split(text, ' ')` (limit -1 —
    * empties kept), the pair key (h1, h2) with
    *
    *   h1 = xxhash64(w1)      = XXH64(w1 bytes, seed 42)
    *   h2 = xxhash64(w1, w2)  = XXH64(w2 bytes, seed h1)
    *
    * — BIT-IDENTICAL to Spark's `xxhash64` over the same columns (the
    * multi-arg form chains each argument's hash as the next seed), so
    * this kernel is a drop-in for the relational fan-out it replaces
    * (split → slice ×2 → arrays_zip → explode → xxhash64 per row)
    * without changing a single downstream join key. Counts aggregate
    * per document INSIDE the kernel (hash map over the pair keys), so
    * the explode that follows emits per-doc DISTINCT bigram rows, not
    * per-position rows — the map-side combine the relational shape paid
    * a hash-aggregate for happens here in one tight loop over the
    * document's bytes, with zero token strings, zip structs, or
    * per-position rows materialized.
    *
    * Output rows are (h1, h2, c) structs in first-appearance order
    * (LinkedHashMap — deterministic across retries of the same row,
    * though every consumer aggregates so order is semantically inert).
    */
  def bigramHashCounts(text: UTF8String): ArrayData = {
    val n = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val counts = new java.util.LinkedHashMap[(Long, Long), Array[Long]]()
    var havePrev = false
    var prevHash = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == 0x20) {
        val len = i - start
        val h = XXH64.hashUnsafeBytes(base, off + start, len, 42L)
        if (havePrev) {
          val h2 = XXH64.hashUnsafeBytes(base, off + start, len, prevHash)
          val key = (prevHash, h2)
          val slot = counts.get(key)
          if (slot == null) counts.put(key, Array(1L)) else slot(0) += 1L
        }
        havePrev = true
        prevHash = h
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      out(j) = new GenericInternalRow(Array[Any](k._1, k._2, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
