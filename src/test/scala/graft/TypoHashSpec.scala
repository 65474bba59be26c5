package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TypoHash

/** The fused deletion-variant kernel (graft.functions.TypoHash) against a
  * straightforward STRING-LEVEL reference: build the distinct ≤2-deletion
  * variant set with actual substrings and check the hash-level view keeps
  * exactly the properties the SymSpell candidate scheme relies on.
  */
class TypoHashSpec extends AnyFunSuite {

  private def hashes(s: String, seed: Long = 42L): Set[Long] =
    TypoHash.deletionVariantHashes(UTF8String.fromString(s), seed)
      .toLongArray().toSet

  /** Reference: the distinct variant STRINGS of the ≤2-deletion
    * neighborhood (del0 ∪ del1 ∪ del2), built by actual deletion. */
  private def variantStrings(s: String): Set[String] = {
    val del1 = (0 until s.length).map(i => s.take(i) + s.drop(i + 1))
    val del2 = for {
      i <- 0 until s.length; j <- (i + 1) until s.length
    } yield s.take(i) + s.slice(i + 1, j) + s.drop(j + 1)
    (Seq(s) ++ del1 ++ del2).toSet
  }

  test("hash count equals the DISTINCT variant-string count (the " +
       "list_distinct parity — coincident deletions collapse)") {
    for (s <- Seq("", "a", "ab", "aab", "banana", "aaaa",
                  "goldenrod lavender spring chocolate lace", "mississippi"))
      assert(hashes(s).size == variantStrings(s).size, s"name=$s")
  }

  test("hash sets are the image of the string sets: shared variant " +
       "string <=> shared hash, across 200 perturbed pairs") {
    val rnd = new scala.util.Random(7)
    def mutate(s: String, edits: Int): String = {
      var r = s
      (1 to edits).foreach { _ =>
        val op = rnd.nextInt(4)
        if (r.isEmpty) r = "x"
        else {
          val i = rnd.nextInt(r.length)
          op match {
            case 0 => r = r.take(i) + r.drop(i + 1)                   // del
            case 1 => r = r.take(i) + ('a' + rnd.nextInt(26)).toChar + r.drop(i) // ins
            case 2 => r = r.take(i) + ('a' + rnd.nextInt(26)).toChar + r.drop(i + 1) // sub
            case 3 => if (i + 1 < r.length)                            // transpose
              r = r.take(i) + r(i + 1) + r(i) + r.drop(i + 2)
          }
        }
      }
      r
    }
    (1 to 200).foreach { _ =>
      val a = (1 to (3 + rnd.nextInt(20)))
        .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val b = mutate(a, 1 + rnd.nextInt(2))
      val shareString = variantStrings(a).intersect(variantStrings(b)).nonEmpty
      val shareHash = hashes(a).intersect(hashes(b)).nonEmpty
      assert(shareString == shareHash, s"a=$a b=$b")
    }
  }

  test("SymSpell completeness at the hash level: every Damerau edit " +
       "type at distance <= 2 shares a variant hash") {
    val base = "promise electric cornsilk"
    val perturbed = Seq(
      base.drop(1),                       // deletion
      "x" + base,                         // insertion
      base.updated(4, 'z'),               // substitution
      base.take(2) + base(3) + base(2) + base.drop(4), // transposition
      base.drop(1).updated(7, 'q'),       // del + sub
      ("y" + base).updated(12, 'k'))      // ins + sub
    perturbed.foreach { p =>
      assert(hashes(base).intersect(hashes(p)).nonEmpty, s"p=$p")
    }
  }

  test("the seed partitions the space: same name under different seeds " +
       "(different blocking attributes) shares nothing") {
    assert(hashes("banana", 1L).intersect(hashes("banana", 2L)).isEmpty)
  }

  test("hashes are sorted-unique (the oracle's list_distinct mirror and " +
       "a stable explode order)") {
    val arr = TypoHash.deletionVariantHashes(
      UTF8String.fromString("aabbccdd"), 9L).toLongArray()
    assert(arr.toSeq == arr.toSeq.sorted)
    assert(arr.toSet.size == arr.length)
  }
}
