package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric parity helpers (SURVEY.md §7.6).
  *
  * `round(double, 2)` is NOT portable: Spark rounds the exact binary
  * expansion via BigDecimal HALF_UP while DuckDB uses a different algorithm,
  * and they disagree on the half-cent ties that are dense in 2-decimal money
  * data (observed: round(19570.815…, 2) → 19570.82 Spark vs 19570.81 DuckDB).
  *
  * Bit-exact alternatives used by every t2 query:
  *  - scalar money: `floor2` = floor(x*100)/100 — multiply, IEEE floor,
  *    divide: each step bit-identical across engines;
  *  - aggregated money: sum in DECIMAL(18,2) (exact, order-independent),
  *    cast the final value to DOUBLE;
  *  - averages: exact decimal sum cast to double, divided by the count —
  *    a single IEEE division is bit-identical everywhere.
  */
object Parity {

  /** Exact cents: doubles holding 2-decimal money fit DECIMAL(18,2). */
  val Money: DecimalType = DecimalType(18, 2)

  /** Truncate to cents, bit-identically across engines. */
  def floor2(c: Column): Column = floor(c * 100) / 100

  /** Truncate to 1e-9, for similarity scores. */
  def floor9(c: Column): Column = floor(c * 1e9) / 1e9

  /** Exact money sum, emitted as double (DuckDB: CAST(sum(CAST(x AS
    * DECIMAL(18,2))) AS DOUBLE)). Order-independent, so safe under any
    * shuffle/partitioning.
    */
  def sumMoney(c: Column): Column = sum(c.cast(Money)).cast("double")
}
