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
}
