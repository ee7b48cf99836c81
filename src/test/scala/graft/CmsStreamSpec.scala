package graft

import java.nio.file.Files

import graft.operators.FreqSketch
import graft.streaming.{CmsStream, EventStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CMS cells (`CmsStream`): the drained transformWithState
  * state must equal the batch daily-cells partial exactly — including
  * when ingestion is split across many micro-batches, where the
  * max-per-cell reduction over re-emissions carries the exactness
  * argument (counters are monotone non-decreasing).
  */
class CmsStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def sortedCells(df: org.apache.spark.sql.DataFrame) =
    df.select(coalesce($"day".cast("string"), lit("NULL")), $"j", $"bucket", $"c")
      .as[(String, Int, Long, Long)].collect().toSeq.sorted

  test("drained streaming cells equal the batch partial on the events fixture") {
    val streamed = EventStream.withStatePartitions(spark, 4) {
      CmsStream.drainedCells(spark,
        EventStream.source(spark, s"$sf/events.parquet"), "user_id", depth = 4, width = 512)
    }
    val batch = FreqSketch.cmsDailyCells(
      Tables.load(spark, sf, "events"), "user_id", depth = 4, width = 512)
    assert(sortedCells(streamed) === sortedCells(batch))
  }

  test("multi-batch ingestion: max over re-emissions reconstructs the final counters") {
    // one file per micro-batch (maxFilesPerTrigger=1), so every day's
    // cells are emitted repeatedly at intermediate counts; the drain's
    // max-per-cell must land on the final value, not an intermediate
    val dir = Files.createTempDirectory("graft-cms-stream").toString
    Tables.load(spark, sf, "events")
      .select($"ts", $"user_id").repartition(5)
      .write.parquet(s"$dir/feed")
    val src = spark.readStream
      .schema("ts TIMESTAMP, user_id LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/feed")
    val streamed = EventStream.withStatePartitions(spark, 4) {
      CmsStream.drainedCells(spark, src, "user_id", depth = 4, width = 512)
    }
    val batch = FreqSketch.cmsDailyCells(
      Tables.load(spark, sf, "events"), "user_id", depth = 4, width = 512)
    assert(sortedCells(streamed) === sortedCells(batch))
  }

  test("null-ts rows keep counting: drained cells equal the batch partial's NULL day") {
    // the sketch counts the KEY multiset; a null event time lands in
    // the batch partial under a NULL day, and the stream must agree
    // (it routes them via the sentinel state key, mapped back on drain)
    val dir = Files.createTempDirectory("graft-cms-nullts").toString
    Seq((Some("2024-01-01 10:00:00"), 7L), (None, 7L), (None, 8L), (None, 7L))
      .toDF("ts_s", "user_id")
      .select(to_timestamp($"ts_s").as("ts"), $"user_id")
      .write.parquet(s"$dir/feed")
    val src = spark.readStream
      .schema("ts TIMESTAMP, user_id LONG").parquet(s"$dir/feed")
    val streamed = EventStream.withStatePartitions(spark, 4) {
      CmsStream.drainedCells(spark, src, "user_id", depth = 2, width = 32)
    }
    val batch = graft.operators.FreqSketch.cmsDailyCells(
      spark.read.parquet(s"$dir/feed"), "user_id", depth = 2, width = 32)
    assert(sortedCells(streamed) === sortedCells(batch))
    assert(streamed.filter($"day".isNull).count() > 0)
  }

  test("heavy hitters from drained cells match the one-shot batch query") {
    val cells = EventStream.withStatePartitions(spark, 4) {
      CmsStream.drainedCells(spark,
        EventStream.source(spark, s"$sf/events.parquet"), "user_id", depth = 4, width = 512)
    }
    val ev = Tables.load(spark, sf, "events")
    val fromStream = FreqSketch.heavyHittersFromCells(
        ev, FreqSketch.cmsMerge(cells), "user_id", depth = 4, width = 512, topN = 20)
      .as[(String, Long, Long, Long)].collect().toSeq
    val oneShot = FreqSketch.cmsHeavyHitters(ev, "user_id", depth = 4, width = 512, topN = 20)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(fromStream === oneShot)
    // CMS guarantee: estimate never undercounts
    assert(fromStream.forall { case (_, _, _, over) => over >= 0L })
  }
}
