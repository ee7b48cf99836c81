package graft

import graft.operators.{AsOfJoin, Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q61–q63 operators: incremental Bloom dedup, Gopher repetition
  * gate, point-in-time as-of join.
  */
class AsOfIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def events = Tables.load(spark, sf, "events")

  // ---- incremental dedup -------------------------------------------------

  private def splitDocs = {
    val bucket = Sampling.hashBucket(col("doc_id").cast("string"))
    (docs.filter(bucket >= 80), docs.filter(bucket < 80))
  }

  test("bloom-prefiltered incremental dedup is bit-identical to the plain anti-join") {
    val (batch, corpus) = splitDocs
    val plain = Dedup.incrementalExact(batch, corpus)
    val bloom = Dedup.incrementalExactBloom(batch, corpus, expectedItems = 100000L, fpp = 0.01)
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  test("incremental dedup keeps batch rows whose text is absent from the corpus") {
    val (batch, corpus) = splitDocs
    val out = Dedup.incrementalExact(batch, corpus)
    val batchN = batch.count()
    val dupN = batch.select(md5($"text").as("fp"))
      .join(corpus.select(md5($"text").as("fp")).distinct(), Seq("fp"), "left_semi")
      .count()
    assert(out.count() == batchN - dupN)
  }

  test("a tiny bloom filter (high fpp) still yields exact results") {
    val (batch, corpus) = splitDocs
    val plain = Dedup.incrementalExact(batch, corpus)
    // 0.5 fpp: half the definitely-new rows take the verify path — result unchanged
    val bloom = Dedup.incrementalExactBloom(batch, corpus, expectedItems = 10L, fpp = 0.5)
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  // ---- repetition stats --------------------------------------------------

  test("repetition stats: fractions bounded, distinct <= tokens, bigram frac 0 for 1-token docs") {
    val out = TextAnalysis.repetitionStats(docs).cache()
    assert(out.count() == docs.count())
    val bad = out.filter(
      $"n_distinct" > $"n_tokens" ||
        $"top_token_frac" < $"n_distinct".cast("double") * 0 || $"top_token_frac" > 1.0 ||
        $"dup_token_frac" < 0.0 || $"dup_token_frac" > 1.0 ||
        $"top_bigram_frac" < 0.0 || $"top_bigram_frac" > 1.0)
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("repetition stats flags a degenerate repeated-token document") {
    val d = Seq((1L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
                (2L, "a genuinely varied sentence with twelve distinct useful meaningful informative different words"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(6)) // keep=false: one token dominates
    assert(out(2L).getBoolean(6))
    assert(out(1L).getDouble(3) == 1.0) // top_token_frac
  }

  // ---- as-of join --------------------------------------------------------

  private def asOfResult = AsOfJoin.asOf(
    left = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id", $"value"),
    right = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value"),
    keyCol = "user_id", tsCol = "ts", idCol = "event_id", valueCol = "value")

  test("as-of join matches a correlated max-ts lookup on real events") {
    val clicks = events.filter($"event_type" === "click").as("l")
    val purchases = events.filter($"event_type" === "purchase").as("r")
    // oracle shape: theta join + window — fine on 0.001, not the scale plan
    val oracle = clicks
      .join(purchases, $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts", "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"l.event_id")
          .orderBy($"r.ts".desc_nulls_last, $"r.event_id".desc_nulls_last)))
      .filter($"rk" === 1)
      .select($"l.user_id", $"l.ts", $"l.event_id", $"l.value",
        $"r.ts".as("asof_ts"), $"r.value".as("asof_value"))
    val got = asOfResult
    assert(got.exceptAll(oracle).isEmpty && oracle.exceptAll(got).isEmpty)
    assert(got.count() == clicks.count()) // left-outer semantics
  }

  test("as-of join plans a single window sweep, no nested-loop join") {
    val plan = asOfResult.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a nested-loop theta join")
    assert(plan.contains("Window"))
  }

  test("as-of tie policy: same-instant right row matches; larger id wins on right ties") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 100L, 1.0))
      .toDF("k", "ts", "id", "v")
    val r = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 7L, 70.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 9L, 90.0),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 09:00:00"), 8L, 80.0))
      .toDF("k", "ts", "id", "v")
    val out = AsOfJoin.asOf(l, r, "k", "ts", "id", "v").collect()
    assert(out.length == 1 && out(0).getDouble(out(0).fieldIndex("asof_value")) == 90.0)
  }

  test("as-of join yields nulls when no right row precedes") {
    val l = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 1L, 1.0))
      .toDF("k", "ts", "id", "v")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2026-01-02 10:00:00"), 2L, 2.0))
      .toDF("k", "ts", "id", "v")
    val out = AsOfJoin.asOf(l, r, "k", "ts", "id", "v").collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("asof_value")))
  }
}
