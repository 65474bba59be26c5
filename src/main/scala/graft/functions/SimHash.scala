package graft.functions

import java.security.MessageDigest
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 60-bit SimHash (Charikar, STOC 2002) over a document's
  * whitespace-token MULTISET — the per-row kernel behind
  * `q_dedup_simhash`, bit-identical to the relational definition it
  * replaced (explode → per-token [[TextHash.md5long]] → 60 signed bit
  * sums → majority): each DISTINCT token contributes ±count to every
  * bit position of its 60-bit md5 prefix, and the fingerprint sets the
  * bits with a positive sum.
  *
  * Token semantics are `split(text, ' ')` with limit -1 (empty tokens
  * kept — see [[TokenStats]]); the per-token hash is the first 15 hex
  * chars of the UTF-8 md5 digest read as a 60-bit big-endian integer,
  * exactly `conv(substring(md5(t), 1, 15), 16, 10)`.
  *
  * The relational form shuffled the corpus twice as token rows (the
  * (doc, token) distinct + the 60-slot bit aggregation); this kernel
  * keeps the whole fingerprint inside one codegen'd projection — the
  * corpus never becomes token rows, which at 100 TB is the entire cost
  * of the operator. Distinct-token counting stays (natural text repeats
  * tokens ~2.3×, so hashing per distinct token cuts the md5 work by
  * that factor — the same argument the relational shape documented).
  */
object SimHash {

  private val mdHolder = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  def simhash60(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    // distinct-token counts (token = maximal run between single 0x20s,
    // empties included — split-with-limit=-1 parity). Keys are RAW BYTE
    // slices (ByteBuffer content equality over the shared backing
    // array), never a String decode: md5long digests the UTF8String's
    // bytes verbatim (`md5(c.cast("binary"))`), and a String round-trip
    // would substitute U+FFFD into invalid UTF-8 — a silent parity
    // break for any corpus whose string column carries undecodable
    // bytes (UTF8String never validates).
    val counts = new java.util.HashMap[java.nio.ByteBuffer, Array[Long]]()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val tok = java.nio.ByteBuffer.wrap(bytes, start, i - start)
        val slot = counts.get(tok)
        if (slot == null) counts.put(tok, Array(1L)) else slot(0) += 1L
        start = i + 1
      }
      i += 1
    }
    val md = mdHolder.get()
    val sums = new Array[Long](60)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      val buf = e.getKey
      md.update(bytes, buf.position(), buf.remaining())
      val d = md.digest()
      // first 15 hex chars = the digest's leading 60 bits, big-endian
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) >> 4) & 0xfL)
      val c = e.getValue()(0)
      var j = 0
      while (j < 60) {
        sums(j) += (if (((h >>> j) & 1L) == 1L) c else -c)
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < 60) { if (sums(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}
