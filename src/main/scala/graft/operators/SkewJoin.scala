package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by salting (the join counterpart of
  * [[SkewAgg]]): when one join key carries a disproportionate share of
  * the big side's rows, a plain shuffle join lands the entire hot key
  * on one reducer. Salting spreads it: the big side gets a
  * deterministic salt in [0, buckets) derived from a caller-supplied
  * unique column (never `rand()` — failed-task re-execution must land
  * rows in the same bucket), the small side is replicated once per
  * salt value, and the join runs on (key, salt) — every reducer sees
  * ~1/buckets of the hot key.
  *
  * Result is row-identical to the plain equi-join (asserted in tests):
  * salting only refines the partitioning, never the match set. Use
  * when the small side is too big to broadcast but the key histogram
  * is skewed; with a broadcastable small side, `broadcast()` is
  * strictly better (no shuffle at all), and AQE's skew-join handles
  * sort-merge cases — this operator covers the gap (shuffle hash join
  * with a replicable-but-not-broadcastable build side).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: Column,
      buckets: Int): DataFrame = {
    // buckets < 1 would silently break the row-identical guarantee:
    // the replicated side explodes over (0 until buckets) = EMPTY, so
    // the join matches nothing (negative) or ANSI-divides-by-zero (0)
    require(buckets >= 1, s"salting needs buckets >= 1 (got $buckets)")
    val saltedBig = big.withColumn("_salt", pmod(hash(saltSource), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until buckets).map(b => lit(b)): _*)))
    saltedBig.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
