package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared column helpers.
  *
  * Oracle-parity rule: any aggregate over doubles must be computed with
  * exact (order-independent) arithmetic, because Spark and DuckDB sum
  * floating point in different orders and the driver hash-compares
  * values bit-for-bit. We cast inputs to DECIMAL, aggregate exactly,
  * and cast the final result back to DOUBLE — both engines then derive
  * the same rational number and therefore the same double.
  *
  * The matching DuckDB SQL shape is
  * `CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)`.
  */
object Ops {
  /** DECIMAL(12,2) — 10 integer digits — is deliberate, not an
    * oversight: (12,2)·(12,2) products (q1's disc-price terms) stay
    * within DECIMAL(25,4), exact in both engines, whereas (38,2)
    * operands would hit Spark's precision-overflow ROUNDING on
    * multiply and could diverge from DuckDB. The narrowness is safe
    * because this codebase runs ANSI mode (Spark 4 default, never
    * disabled here): a value outside ±1e10 fails the cast LOUDLY
    * instead of silently nulling out of the sum.
    */
  private val Dec = DecimalType(12, 2)

  /** Exact sum of a 2-dp double column, returned as double. */
  def decSum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact mean of a 2-dp double column, returned as double.
    * Division is performed once, in double, identically in both engines:
    * CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE) / COUNT(x).
    */
  def decAvg(c: Column): Column = decSum(c) / count(c)

  /** Exact revenue-style product sum: SUM(price * (1 - disc)) with both
    * operands at 2 dp. Decimal multiply is exact in both engines.
    * DuckDB shape: CAST(SUM(CAST(p AS DECIMAL(12,2)) *
    * (1 - CAST(d AS DECIMAL(12,2)))) AS DOUBLE).
    */
  def decRevenue(price: Column, disc: Column): Column =
    sum(price.cast(Dec) * (lit(1).cast(Dec) - disc.cast(Dec))).cast(DoubleType)

  /** [[decRevenue]] without the final double cast — for
    * pre-aggregate-then-reaggregate plans (partial per-key revenue,
    * summed again after a 1:1 join). Decimal sums are associative and
    * exact, so re-summing the partials and casting to double ONCE at
    * the end derives the same rational — and therefore the same double
    * — as the single flat sum the oracle computes.
    */
  def decRevenuePartial(price: Column, disc: Column): Column =
    sum(price.cast(Dec) * (lit(1).cast(Dec) - disc.cast(Dec)))

  /** m:ss formatting of a millisecond duration (reference new.py:170). */
  def msToMinSec(ms: Column): Column =
    format_string("%d:%02d", (ms / 60000).cast(LongType), ((ms % 60000) / 1000).cast(LongType))

  /** URL-encode a query term matching `requests.utils.quote` semantics
    * (reference spotify_etl.py:108; SURVEY.md P11/F11): RFC-3986
    * percent-encoding with safe chars `/` + unreserved (`-._~`).
    * Built-in `url_encode` is application/x-www-form-urlencoded, which
    * differs in exactly four places — space → `+` (quote: `%20`),
    * `/` → `%2F` (quote keeps it, safe default), `~` → `%7E` (quote
    * keeps it, unreserved), `*` kept (quote: `%2A`). Each rewrite is
    * unambiguous on the encoded alphabet: a literal `+`/`*` in the
    * encoded string can only denote the source space/`*` (input `+`
    * becomes `%2B`), and `%2F`/`%7E` only the escapes. The whole chain
    * is codegen'd string ops — no UDF.
    */
  def urlEncode(c: Column): Column =
    replace(
      replace(
        replace(
          replace(url_encode(c), lit("+"), lit("%20")),
          lit("%2F"), lit("/")),
        lit("%7E"), lit("~")),
      lit("*"), lit("%2A"))
}
