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

  test("corpus-derived planes bound LSH candidate volume on 10x/20x staged corpora") {
    import graft.operators.Similarity
    val base = Tables.load(spark, sf, "embeddings")
    val baseN = base.count()
    def staged(mult: Int) =
      (0 until mult).map(i => base.withColumn("vec_id", $"vec_id" + lit(i * 10000000L)))
        .reduce(_ unionAll _)
    for (mult <- Seq(10, 20)) {
      val e = staged(mult).cache()
      val n = e.count()
      val planes = Similarity.derivePlanes(n)
      // the defining bound: enough buckets that the MEAN bucket holds
      // at most 125 vectors — so expected candidate volume is linear
      assert((1L << planes) * 125 >= n)
      assert(planes == 2 || (1L << (planes - 1)) * 125 < n) // and no overshoot
      def candVolume(p: Int): Long =
        Similarity.signLshBuckets(e, p, 64)
          .groupBy($"bucket").agg(count(lit(1)).as("nb"))
          .agg(expr("sum(nb * (nb - 1) DIV 2)")).as[Long].head()
      val derived = candVolume(planes)
      val frozen = candVolume(2) // the old fixed catalog operating point
      // staging by exact copies is the LSH worst case (identical
      // vectors always share a bucket), yet the derived plane count
      // still cuts candidate volume far below the frozen-planes
      // quadratic — the scale guard this derivation exists for
      assert(derived * 2 <= frozen, s"mult=$mult derived=$derived frozen=$frozen")
      // sanity floor: the mult-sized identical-copy cliques are
      // irreducible candidates, so the measurement is really counting
      assert(derived >= baseN * mult * (mult - 1) / 2)
      e.unpersist()
    }
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

  test("KMV sketch: per-day and merged estimates inside the 3/sqrt(k-2) bound, exact when n < k") {
    val k = 64
    val ev = Tables.load(spark, sf, "events")
    val rows = ApproxDistinct.kmvDaily(ev, "user_id", k)
      .select($"day_label", $"n_kept", $"approx_distinct", $"exact_distinct")
      .as[(String, Long, Double, Long)].collect()
    val bound = 3.0 / math.sqrt(k - 2.0) // 3 sigma of the KMV estimator
    rows.foreach { case (day, nKept, approx, exact) =>
      if (nKept < k) // sketch holds the whole distinct set -> exact
        assert(approx == exact.toDouble, s"$day: n<k must be exact, got $approx vs $exact")
      else
        assert(math.abs(approx - exact) / exact <= bound,
          s"$day: approx=$approx exact=$exact outside ${bound * 100}%")
    }
    // the ALL row exists and was computed from the sketch union
    assert(rows.count(_._1 == "ALL") == 1)
  }

  test("KMV null-day contract: null-ts rows are excluded from the whole tier, rows reconcile") {
    // without the shared dayHashes filter a null-ts row survived into
    // kept/exact but vanished at the null-rejecting day equi-join —
    // gone from the daily rows yet still counted in the ALL row
    val ev = Seq(
      (Some("2024-01-01 10:00:00"), 1L), (Some("2024-01-01 11:00:00"), 2L),
      (None, 2L), (None, 99L)).toDF("ts_s", "user_id")
      .select(to_timestamp($"ts_s").as("ts"), $"user_id")
    val rows = ApproxDistinct.kmvDaily(ev, "user_id", 64)
      .select($"day_label", $"exact_distinct").as[(String, Long)].collect().toSeq
    assert(rows.map(_._1).sorted == Seq("2024-01-01", "ALL"))
    // user 99 exists ONLY on the null day: excluded from ALL too
    assert(rows.toMap == Map("2024-01-01" -> 2L, "ALL" -> 2L))
    val cum = ApproxDistinct.kmvCumulative(ev, "user_id", 64)
      .select($"day", $"exact_distinct").as[(String, Long)].collect().toSeq
    assert(cum == Seq(("2024-01-01", 2L)))
  }

  test("KMV merge from retained hashes equals the sketch of the full data (lossless union)") {
    val k = 64
    val ev = Tables.load(spark, sf, "events")
    val all = ApproxDistinct.kmvDaily(ev, "user_id", k)
      .filter($"day_label" === "ALL")
      .select($"kth_hash", $"approx_distinct").as[(Long, Double)].head()
    // ground truth: k smallest hashes over ALL distinct keys directly
    val direct = ev.select(graft.functions.PortableHash.hash32($"user_id".cast("string")).as("h"))
      .distinct().orderBy($"h").limit(k)
      .agg(max($"h")).as[Long].head()
    // union-of-day-sketches keeps every hash that is globally among the
    // k smallest (each is in its own day's k smallest), so the merged
    // kth hash — and hence the estimate — matches the direct sketch
    assert(all._1 == direct, s"merged kth=${all._1} direct kth=$direct")
  }

  test("partitioned sink: a partition-column predicate prunes at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", to_date($"ts").cast("string"))
    graft.sources.Sinks.appendPartitioned(ev, dir, "day")
    val read = spark.read.parquet(dir)
    val days = read.select($"day").distinct().as[String].collect().sorted
    assert(days.length > 1)
    val q = read.filter($"day" === days.head)
    val scan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory pruning), not
    // in the data filter — only one partition's files are ever listed
    assert(scan.contains("PartitionFilters: [isnotnull(day"))
    assert(q.count() == ev.filter($"day" === days.head).count())
  }

  test("sorted write: range predicate is pushed to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted").toString + "/t"
    val ev = Tables.load(spark, sf, "events").select($"event_id", $"user_id", $"value")
    graft.sources.Sinks.writeSorted(ev, dir, "event_id", partitions = 8)
    val read = spark.read.parquet(dir)
    val q = read.filter($"event_id" >= 100 && $"event_id" < 200)
    val scan = q.queryExecution.executedPlan.toString
    // pushed filters reach the reader, where the sorted layout's tight
    // row-group min/max stats make them effective skips
    assert(scan.contains("PushedFilters: [") && scan.contains("GreaterThanOrEqual(event_id,100)"))
    assert(q.count() == ev.filter($"event_id" >= 100 && $"event_id" < 200).count())
    // the range partitioning put each key range in few files: the
    // matching rows live in at most 2 of the 8 files
    val hit = read.filter($"event_id" >= 100 && $"event_id" < 200)
      .select(input_file_name()).distinct().count()
    assert(hit <= 2, s"expected <=2 files, got $hit")
  }

  test("ORC sink round-trips with partitioning intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", to_date($"ts").cast("string"))
      .select($"event_id", $"user_id", $"value", $"day")
    graft.sources.Sinks.appendPartitionedOrc(ev, dir, "day")
    val read = spark.read.orc(dir)
    assert(read.count() == ev.count())
    assert(read.filter($"day" === ev.select(min($"day")).as[String].head()).count() ==
      ev.filter($"day" === ev.select(min($"day")).as[String].head()).count())
  }
}
