package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Exact integer string-distance metrics for the entity-resolution /
  * typo-dedup family.
  *
  * [[damerau]] is the UNRESTRICTED Damerau-Levenshtein distance
  * (Lowrance & Wagner 1975: insert, delete, substitute, and transpose —
  * where a transposed block may be edited again later), NOT the cheaper
  * optimal-string-alignment variant. The choice is pinned to the oracle:
  * DuckDB's `damerau_levenshtein` returns 2 for 'ca' → 'abc' (OSA would
  * say 3) — verified against DuckDB 1.0.0, and the spec pins the same
  * distinguishing cases here. Distances are exact integers, so there is
  * no float-parity surface at all.
  *
  * Operates on Unicode code points (one edit = one code point), matching
  * DuckDB's treatment of multibyte characters.
  */
object StringMetrics {

  /** Static forwarder for codegen ([[expressions.DamerauLevenshtein]]). */
  def damerau(a: UTF8String, b: UTF8String): Int =
    damerau(a.toString, b.toString)

  def damerau(sa: String, sb: String): Int = {
    val a = sa.codePoints().toArray
    val b = sb.codePoints().toArray
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    // (la+2) × (lb+2) DP with the -1 sentinel row/col at index 0
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxd
    var i = 0
    while (i <= la) { d(i + 1)(0) = maxd; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = maxd; d(1)(j + 1) = j; j += 1 }
    // da: for each code point, the last row of `a` where it occurred.
    // ASCII inputs (every blocked-join hot path here) take a flat-array
    // fast path — the boxed HashMap costs ~3× the whole DP on short
    // strings; the map only backs the general Unicode case.
    var ascii = true
    i = 0
    while (ascii && i < la) { ascii = a(i) < 128; i += 1 }
    j = 0
    while (ascii && j < lb) { ascii = b(j) < 128; j += 1 }
    val daArr = if (ascii) new Array[Int](128) else null
    val daMap =
      if (ascii) null else new java.util.HashMap[Integer, Integer]()
    i = 1
    while (i <= la) {
      var db = 0 // last column of `b` matched in this row
      j = 1
      while (j <= lb) {
        val k =
          if (ascii) daArr(b(j - 1))
          else daMap.getOrDefault(b(j - 1), 0).intValue()
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      if (ascii) daArr(a(i - 1)) = i else daMap.put(a(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
