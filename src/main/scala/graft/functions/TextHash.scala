package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for the dedup/fingerprint
  * operators (MinHash, SimHash, rolling fingerprints).
  *
  * Spark's `hash`/`xxhash64` and DuckDB's `hash` are different algorithms,
  * so every hash that must agree with the DuckDB oracle is derived from
  * md5 (identical hex in both engines): take the first 15 hex chars
  * (60 bits, fits a signed 64-bit int) and parse as an integer.
  *
  *   Spark : conv(substring(md5(x), 1, 15), 16, 10)::long
  *   DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT
  *
  * At 100 TB one would swap this for xxhash64 (no oracle to match); the
  * operator shapes are hash-agnostic.
  */
object TextHash {

  val FpPrime = 1000000007L

  /** 60-bit non-negative hash of a string column, identical across engines. */
  def md5long(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i (for MinHash). */
  def md5longSeeded(c: Column, i: Column): Column =
    md5long(concat(i.cast("string"), lit("_"), c))

  /** DuckDB SQL fragment mirroring md5long. */
  def duckMd5Long(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  def duckMd5LongSeeded(expr: String, iExpr: String): String =
    duckMd5Long(s"CAST($iExpr AS VARCHAR) || '_' || $expr")

  /** Rabin-Karp polynomial base for positional n-gram hashing over
    * PER-TOKEN hashes: each token is md5long'd ONCE and an n-gram's hash is
    * the modular polynomial over its n consecutive token hashes — O(tokens)
    * md5 calls per document instead of O(positions) md5 calls over n-token
    * CONCATENATED strings (n× the bytes hashed plus a materialized string
    * per position). Overflow-safe: token hashes are < FpPrime ≈ 2^30 and
    * PolyB < 2^31, so acc*PolyB + h < 2^61 stays inside a signed 64-bit
    * int in both engines.
    */
  val PolyB = 1315423911L

  /** Array of per-token hashes (each reduced mod FpPrime) of a text col. */
  def tokenHashes(textCol: Column): Column =
    transform(split(textCol, " "), t => pmod(md5long(t), lit(FpPrime)))

  /** Polynomial hash of the n-gram starting at 0-based position j of the
    * token-hash array `ha` (element_at is 1-based).
    */
  def polyWindow(ha: Column, j: Column, n: Int): Column =
    (1 until n).foldLeft(element_at(ha, j + 1))(
      (acc, k) => pmod(acc * PolyB + element_at(ha, j + k + 1), lit(FpPrime)))

  /** DuckDB mirror of [[tokenHashes]] (list named `ha` by convention). */
  def duckTokenHashes: String =
    s"[${duckMd5Long("t")} % $FpPrime for t in string_split(text, ' ')]"

  /** DuckDB mirror of [[polyWindow]] over list `ha` at 1-based index i. */
  def duckPoly(n: Int): String =
    (1 until n).foldLeft("ha[i]")((acc, k) =>
      s"(($acc * $PolyB + ha[i+$k]) % $FpPrime)")

  /** Affine MinHash family over an already-reduced base hash h ∈ [0, p):
    * h_i = (A_i·h + B_i) mod p. One md5 per shingle instead of k — the
    * standard universal-hash construction; A_i·h stays < 2^63 because both
    * operands are < p ≈ 2^30. Constants are arbitrary fixed odd values.
    */
  val AffineA: Seq[Long] = Seq(769121449L, 329914351L, 572926777L, 881914487L,
                               122949829L, 633085829L, 477970787L, 965519981L)
  val AffineB: Seq[Long] = Seq(834567811L, 94234417L, 715559219L, 2347561L,
                               515216911L, 340078571L, 129571601L, 775412383L)

  /** Spark: affine family member i over base-hash column h (< FpPrime). */
  def affine(h: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.pmod(
      h * AffineA(i) + AffineB(i), org.apache.spark.sql.functions.lit(FpPrime))

  /** DuckDB mirror of `affine` given per-row columns h and i. */
  def duckAffineCase(hExpr: String, iExpr: String): String =
    AffineA.indices.map { i =>
      s"WHEN $iExpr = $i THEN ($hExpr * ${AffineA(i)} + ${AffineB(i)}) % $FpPrime"
    }.mkString("CASE ", " ", " END")
}
