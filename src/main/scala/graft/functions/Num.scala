package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers that make aggregate results deterministic across engines.
  *
  * Money arithmetic is done in `DECIMAL(18,4)` (exact, order-independent
  * under summation) and only converted to `DOUBLE` in the final projection.
  * This mirrors the reference's `NUMERIC` columns + float-at-the-boundary
  * behavior (reference `src/models.py:22-29`, `src/api.py:256-257`) while
  * guaranteeing that a DuckDB oracle computing the same expressions produces
  * bit-identical doubles: decimal sums are exact in both engines, and a
  * single exact-decimal -> IEEE-double conversion is deterministic.
  *
  * At 100 TB scale this also matters operationally: double summation order
  * varies with partitioning/AQE, so exact decimal aggregation is the only way
  * to get run-to-run reproducible money totals on a real cluster.
  */
object Num {
  /** Exact money type used for all additive measures. */
  val Money: DecimalType = DecimalType(18, 4)

  /** Cast to exact money decimal (round-trip through the same literal rule
    * DuckDB uses: values in the test data carry <= 4 decimal digits). */
  def dec(c: Column): Column = c.cast(Money)

  /** Final-projection cast to double (reference `src/api.py:256-257`). */
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Null-guarded division in double space (reference `src/api.py:41-42`
    * `taxes/gross if gross else None`). ANSI-safe: never divides by zero. */
  def ratio(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)
}
