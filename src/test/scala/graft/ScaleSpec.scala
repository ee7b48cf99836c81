package graft

import graft.operators.ApproxDistinct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path mechanics: bucketed co-located joins must eliminate the
  * shuffle, and mergeable HLL sketches must land within tolerance of
  * the exact distinct — including when merged from persisted per-day
  * partials.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables sort-merge join with NO exchange on either side") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // a previous session may have left the managed-table locations behind
    Seq("orders_bkt", "lineitem_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    try {
      Tables.load(spark, sf, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_bkt")
      Tables.load(spark, sf, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_bkt")
      val j = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // bucketing provides both distribution and order: the join itself
      // needs no shuffle (the only exchange allowed is the final groupBy's)
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(!joinPart.contains("ShuffleExchange"),
        s"join sides were shuffled despite bucketing:\n$plan")
      // sanity: same result as the unbucketed join
      val direct = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(j.exceptAll(direct).isEmpty && direct.exceptAll(j).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("merged per-day HLL sketches estimate global distinct within 5%") {
    val ev = Tables.load(spark, sf, "events")
    val exact = ev.agg(countDistinct($"user_id")).head().getLong(0).toDouble
    val daily = ApproxDistinct.dailySketches(ev, "user_id")
    assert(daily.count() > 1) // genuinely merging multiple partials
    val merged = ApproxDistinct.mergedEstimate(daily).head().getLong(0).toDouble
    assert(math.abs(merged - exact) / exact < 0.05, s"merged=$merged exact=$exact")
    val oneShot = ApproxDistinct.estimate(ev, "user_id").head().getLong(0).toDouble
    assert(math.abs(oneShot - exact) / exact < 0.05)
  }
}
