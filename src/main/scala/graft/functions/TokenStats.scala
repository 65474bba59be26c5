package graft.functions

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
}
