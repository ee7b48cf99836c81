package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft_vsum — the native element-wise array<bigint> sum aggregate
  * behind every centroid/lane-sum fold (embeddingOutliers,
  * labelCentroidDrift, k-means Lloyd updates, PQ codebooks). Pinned
  * here: equality with the posexplode form it replaced, NULL-skip,
  * empty-group NULL, the ragged-input refusal, and partial-merge
  * correctness across many partitions.
  */
class VectorSumAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def registered() = { graft.functions.VectorExprs.register(spark); spark }

  test("equals the posexplode -> groupBy(pos) -> sum form, lane for lane") {
    registered()
    val df = Seq(
      (0L, Seq(1L, 2L, 3L)), (0L, Seq(10L, 20L, 30L)),
      (1L, Seq(-5L, 0L, 5L)), (1L, Seq(7L, 7L, 7L)), (1L, Seq(1L, 1L, 1L))
    ).toDF("g", "qa")
    val vsum = df.groupBy($"g").agg(expr("graft_vsum(qa)").as("s")).orderBy($"g")
    val exploded = df.select($"g", posexplode($"qa").as(Seq("pos", "x")))
      .groupBy($"g", $"pos").agg(sum($"x").as("sx"))
      .groupBy($"g").agg(expr("transform(array_sort(collect_list(struct(pos, sx))), p -> p.sx)").as("s"))
      .orderBy($"g")
    assert(vsum.collect().toSeq === exploded.collect().toSeq)
  }

  test("partial merge across many partitions is exact (associative i64)") {
    registered()
    val df = spark.range(0, 10000).select(
      (col("id") % 7).as("g"),
      expr("array(id, id * 2, -id)").as("qa"))
      .repartition(32)
    val got = df.groupBy($"g").agg(expr("graft_vsum(qa)").as("s"))
      .select($"g", element_at($"s", 1).as("a"), element_at($"s", 2).as("b"),
        element_at($"s", 3).as("c"))
    val want = df.select($"g", element_at($"qa", 1).as("a"),
        element_at($"qa", 2).as("b"), element_at($"qa", 3).as("c"))
      .groupBy($"g").agg(sum($"a").as("a"), sum($"b").as("b"), sum($"c").as("c"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("NULL arrays are skipped; an all-NULL / empty group evaluates to NULL") {
    registered()
    val df = Seq(
      (0L, Some(Seq(1L, 2L))), (0L, None), (1L, None)
    ).toDF("g", "qa")
    val out = df.groupBy($"g").agg(expr("graft_vsum(qa)").as("s")).orderBy($"g").collect()
    assert(out(0).getSeq[Long](1) === Seq(1L, 2L))
    assert(out(1).isNullAt(1))
  }

  test("ragged input inside one group raises instead of silently part-summing") {
    registered()
    val df = Seq((0L, Seq(1L, 2L)), (0L, Seq(1L, 2L, 3L))).toDF("g", "qa")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(expr("graft_vsum(qa)").as("s")).collect()
    }
    assert(e.getMessage.contains("ragged") || e.getMessage.contains("share dim"),
      e.getMessage)
  }

  test("a group of genuinely empty (dim-0) arrays survives the partial exchange as an empty array, not NULL") {
    registered()
    // 32 partitions force serialized partial buffers through the
    // shuffle: the presence byte keeps the zero-length buffer distinct
    // from the null "no rows" buffer, so the result cannot depend on
    // whether the plan inserted an exchange
    val df = spark.range(0, 64).select((col("id") % 2).as("g"),
      expr("cast(array() as array<bigint>)").as("qa")).repartition(32)
    val out = df.groupBy($"g").agg(expr("graft_vsum(qa)").as("s")).orderBy($"g").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(!r.isNullAt(1), "empty-array group flipped to NULL through the exchange")
      assert(r.getSeq[Long](1).isEmpty)
    }
  }

  test("wrong arity gets the clean analysis-time error") {
    registered()
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq(1L))).toDF("g", "qa").select(expr("graft_vsum(qa, qa)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("parameter"), e.getMessage)
  }
}
