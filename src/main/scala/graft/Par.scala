package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine-stable rounding (SURVEY.md §5.3).
  *
  * Spark's `round(double, n)` rounds the *shortest decimal representation*
  * (via BigDecimal.valueOf) while DuckDB rounds the exact binary value — the
  * two disagree whenever the shortest repr lands exactly on a .5 boundary
  * (observed: 1222.745 → Spark 1222.75, DuckDB 1222.74).
  *
  * `floor(x*scale + 0.5)/scale` is pure IEEE-754 double arithmetic, so both
  * engines produce bit-identical results when the oracle SQL uses the same
  * formula. Rounding convention (half-toward-+inf for negatives) is
  * irrelevant — parity is what matters.
  */
object Par {
  def r2(c: Column): Column = floor(c * 100 + 0.5) / 100
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
  def r6(c: Column): Column = floor(c * 1000000 + 0.5) / 1000000
  def r8(c: Column): Column = floor(c * 100000000L + 0.5) / 100000000L

  /** The matching SQL fragment for oracle queries. */
  def sql(expr: String, scale: Long): String =
    s"floor(($expr) * $scale + 0.5) / $scale.0"

  /** Scalar twins of r2/r6 for driver-side census folds (round 9) —
    * the SAME pure-IEEE formula, so a fold that replays a query's
    * arithmetic on the collected census pins at identical doubles.
    * One definition here, not a per-key copy: a drifted local copy
    * would silently break engine parity for just that key. */
  def r2d(x: Double): Double = math.floor(x * 100 + 0.5) / 100
  def r6d(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
}
