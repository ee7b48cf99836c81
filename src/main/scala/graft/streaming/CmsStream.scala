package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.PortableHash
import graft.streaming.KmvStream.DayHash

/** Streaming maintainer for the per-day Count-Min cells — the
  * live-ingest form of [[graft.operators.FreqSketch.cmsDailyCells]],
  * completing the sketch-state family: KMV distincts have a batch
  * persisted form (q139) and a streaming twin (q143); CMS frequencies
  * have the batch daily-cells partial (q128) and this.
  *
  * State per day is ONE array of depth·width longs (≈16 KiB at the
  * 4×512 defaults) whatever the day's event volume — the same bounded-
  * state contract as the batch partial. Each micro-batch that touches
  * a day re-emits the day's current NONZERO cells; the reader reduces
  * emissions with `max` per (day, j, bucket)
  * ([[drainedCells]]), which is exact because CMS cells are monotone
  * non-decreasing counters: the last (largest) emission of a cell IS
  * its final value, and a sink-side duplicate emission can never
  * exceed it. Unlike the k-min sketch, the counters themselves are
  * NOT duplicate-delivery-proof — they count the delivered multiset
  * exactly as the batch builder does; source-side exactly-once (file
  * sources, or [[EventStream.dedupped]] upstream) is the delivery
  * contract, and the state itself is exactly-once under
  * transformWithState's checkpointing.
  *
  * Scale shape: emissions per batch are bounded by
  * touched_days · depth·width rows regardless of input volume, and
  * the drained frame is ≤ days · depth·width rows — the persistable
  * partial that [[graft.operators.FreqSketch.cmsMerge]] folds without
  * ever rescanning events.
  */
object CmsStream {

  /** One nonzero cell of one day's sketch — the emission row. */
  final case class DayCell(day: String, j: Int, bucket: Long, c: Long)

  /** State key standing in for a NULL event time. The batch partial
    * ([[graft.operators.FreqSketch.cmsDailyCells]]) keeps null-ts rows
    * under a NULL day — the sketch counts the key multiset, the day is
    * only the mergeability axis — but a typed groupByKey cannot carry
    * a null key, so the stream routes them through this sentinel and
    * [[drainedCells]] maps it back to a NULL day. Real days render as
    * yyyy-MM-dd, so the sentinel cannot collide.
    */
  val NullDayKey = "null-ts"

  implicit val dayCellEnc: Encoder[DayCell] = Encoders.product[DayCell]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  final class CmsProcessor(depth: Int, width: Int)
      extends StatefulProcessor[String, DayHash, DayCell] {
    @transient private var cells: ValueState[Array[Long]] = _
    // same fixed hash family as the batch builder (FreqSketch.bucketCols)
    private val params = PortableHash.minhashParams(depth)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cells = getHandle.getValueState[Array[Long]](
        "cells", Encoders.javaSerialization[Array[Long]], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DayHash],
                                 timerValues: TimerValues): Iterator[DayCell] = {
      val cur = if (cells.exists()) cells.get() else new Array[Long](depth * width)
      var touched = false
      rows.foreach { r =>
        touched = true
        params.foreach { case (j, a, b) =>
          val bucket = (((a * r.h + b) % PortableHash.P) % width).toInt
          cur(j * width + bucket) += 1L
        }
      }
      if (!touched) Iterator.empty
      else {
        cells.update(cur)
        Iterator.range(0, depth * width)
          .filter(cur(_) > 0L)
          .map(i => DayCell(key, i / width, (i % width).toLong, cur(i)))
      }
    }
  }

  /** The live cell stream: current nonzero (day, j, bucket, c) cells,
    * re-emitted per touched day per micro-batch. Requires the RocksDB
    * state store provider (the transformWithState contract).
    */
  def dailyCells(src: DataFrame, keyCol: String,
                 depth: Int = 4, width: Int = 512): Dataset[DayCell] = {
    require(depth >= 1, s"depth must be >= 1 (got $depth)")
    require(width >= 2, s"width must be >= 2 (got $width)")
    src
      .select(coalesce(to_date(col("ts")).cast("string"), lit(NullDayKey)).as("day"),
        PortableHash.hash32(col(keyCol).cast("string")).as("h"))
      .filter(col("h").isNotNull)
      .as[DayHash](KmvStream.dayHashEnc)
      .groupByKey(_.day)
      .transformWithState(new CmsProcessor(depth, width), TimeMode.None(), OutputMode.Append())
  }

  /** Drain the stream's emissions into the SAME frame shape the batch
    * partial holds — (day DATE, j, bucket, c) — ready for
    * [[graft.operators.FreqSketch.cmsMerge]]. `max` per cell is exact
    * by counter monotonicity (see object doc).
    */
  def drainedCells(spark: SparkSession, src: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 512): DataFrame =
    EventStream.withStateStore(spark, EventStream.RocksDbProvider) {
      EventStream.runAppendToMemory(spark, dailyCells(src, keyCol, depth, width).toDF())
        .groupBy(
          when(col("day") === NullDayKey, lit(null).cast("date"))
            .otherwise(to_date(col("day"))).as("day"),
          col("j"), col("bucket"))
        .agg(max(col("c")).as("c"))
    }
}
