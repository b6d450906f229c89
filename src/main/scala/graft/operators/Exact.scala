package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent aggregates over double columns.
  *
  * Why: a double `sum`/`avg` depends on summation order, and Spark's
  * partial aggregation order depends on partitioning — so the last
  * ulp differs run-to-run and engine-to-engine, and `round(x, 4)`
  * flips when x sits on a rounding boundary (measured: 3 of 3600
  * hourly-mart groups at sf0.1 disagreed with the DuckDB oracle by
  * one ulp at the 4th decimal). At cluster scale this also means a
  * re-run of the same job on different partitioning emits different
  * marts — a reproducibility bug, not just an oracle nuisance.
  *
  * Fix: quantize each value to DECIMAL(20,6) (exact superset of the
  * 2/4-dp money columns; 1e-6 resolution for sensor readings), sum
  * exactly (decimal addition is associative — any partitioning/merge
  * order yields the identical sum), and perform at most ONE double
  * operation at the end. Both engines then compute bit-identical
  * results by construction. The DuckDB mirror of each helper is
  * documented inline.
  */
object Exact {
  private val D = DecimalType(20, 6)

  /** exact-sum / n at FULL double precision — mirror:
    * `CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE) / count(x)`
    * (== `count(*)` on a null-free column).
    *
    * Denominator is `count(c)` — NON-NULL values only — so the mean
    * has skipna semantics, matching standard `avg()` and the
    * reference's masked-cell spatial mean
    * (/root/reference/dask_jobs/aggregate_hourly.py:71-76,
    * `mean(skipna=True)`): null cells contribute to neither the sum
    * nor the divisor.
    *
    * No rounding, deliberately: the two engines cast the SAME exact
    * decimal sum to the same double and divide by the same integer —
    * IEEE makes the quotient bit-identical, so rounding adds nothing
    * and only creates a new failure mode (a quotient landing exactly
    * on a .5 midpoint is rounded half-up by Spark's decimal-aware
    * `round(double)` but float-rounded by DuckDB's — measured: 4 of
    * 3600 hourly groups flipped at the 4th decimal at sf0.1).
    */
  def avgD(c: Column): Column =
    sum(c.cast(D)).cast("double") / count(c)

  /** round(exact-sum, digits) as double — mirror:
    * `CAST(round(sum(CAST(x AS DECIMAL(20,6))), d) AS DOUBLE)`.
    * The round happens IN DECIMAL (half-away-from-zero in both
    * engines — verified), then one exact cast.
    */
  def sumD(c: Column, digits: Int = 4): Column =
    round(sum(c.cast(D)), digits).cast("double")
}
