package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming maintainer for the per-day KMV distinct sketch — the
  * ingestion side of [[graft.operators.Retention]]'s rolling-WAU state
  * (q139 persists partials from a batch; this keeps them live as
  * events arrive, via Spark 4's `transformWithState`).
  *
  * State per day is ONE array of at most k longs (the k smallest
  * portable hashes seen), so total state is days*k longs whatever the
  * corpus — the sketch contract carried into the stream. Each
  * micro-batch that touches a day re-emits the day's current retained
  * set; the reader dedups emissions and re-sketches
  * ([[graft.operators.Retention.mergeRollingKmv]]), which is exact
  * BY CONSTRUCTION: a hash in the final k-min entered state in some
  * batch and appears in that batch's emission, and any later-evicted
  * hash is larger than all k survivors, so the k smallest of the
  * union of emissions equal the k smallest of the day — under ANY
  * batching, restart, or duplicate delivery (k-min of a multiset
  * ignores repeats). No watermark needed: the sketch absorbs late
  * data the same way the batch top-up append does.
  */
object KmvStream {

  /** One retained (day, hash) pair — the emission row. */
  final case class DayHash(day: String, h: Long)

  implicit val dayHashEnc: Encoder[DayHash] = Encoders.product[DayHash]
  implicit val stringEnc: Encoder[String] = Encoders.STRING

  final class KmvProcessor(k: Int) extends StatefulProcessor[String, DayHash, DayHash] {
    @transient private var kept: ValueState[Array[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      kept = getHandle.getValueState[Array[Long]](
        "kept", Encoders.javaSerialization[Array[Long]], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DayHash],
                                 timerValues: TimerValues): Iterator[DayHash] = {
      val incoming = rows.map(_.h).toArray
      if (incoming.isEmpty) return Iterator.empty
      val prev = if (kept.exists()) kept.get() else Array.empty[Long]
      val next = (prev ++ incoming).distinct.sorted.take(k)
      kept.update(next)
      next.iterator.map(h => DayHash(key, h))
    }
  }

  /** The live sketch stream: (day, h) retained pairs, re-emitted per
    * touched day per micro-batch. Requires the RocksDB state store
    * provider (the transformWithState contract).
    */
  def dailyKmv(src: DataFrame, k: Int): Dataset[DayHash] = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    src
      .select(to_date(col("ts")).cast("string").as("day"),
        graft.functions.PortableHash.hash32(col("user_id").cast("string")).as("h"))
      .filter(col("h").isNotNull && col("day").isNotNull)
      .as[DayHash]
      .groupByKey(_.day)
      .transformWithState(new KmvProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  /** Drain the stream's emissions into the SAME frame shape the
    * persisted state table holds: distinct (day DATE, h) — ready for
    * [[graft.operators.Retention.mergeRollingKmv]].
    */
  def drainedPartials(spark: org.apache.spark.sql.SparkSession, src: DataFrame, k: Int): DataFrame =
    EventStream.withStateStore(spark, EventStream.RocksDbProvider) {
      EventStream.runAppendToMemory(spark, dailyKmv(src, k).toDF())
        .select(to_date(col("day")).as("day"), col("h")).distinct()
    }
}
