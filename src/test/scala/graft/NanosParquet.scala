package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-only writer for the one events layout Spark itself cannot
  * produce: `ts` as INT64 annotated `TIMESTAMP(isAdjustedToUTC=true,
  * NANOS)` — the footer a nanos producer (e.g. pyarrow `timestamp[ns]`)
  * actually writes. Spark 4 has no nanos timestamp type, so staging
  * this layout through a Spark write of a long column yields an
  * UN-annotated int64 — which the hardened loader rightly rejects.
  * parquet-java's example writer gets the annotation into the footer
  * for real, making TsLayoutSpec's nanos case faithful to a real
  * producer instead of to the old assume-the-unit loader.
  */
object TsTestFixtures {

  private val eventsNanosSchema: MessageType = Types.buildMessage()
    .optional(INT64).named("event_id")
    .optional(INT64)
    .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
    .named("ts")
    .optional(INT64).named("user_id")
    .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
    .optional(DOUBLE).named("value")
    .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
    .named("events")

  /** Write `df` (canonical events columns, ts TimestampType) to a
    * single NANOS-annotated parquet file at `file`. Driver-side
    * collect — test fixtures only.
    */
  def writeEventsNanos(df: DataFrame, file: String): Unit = {
    val rows = df.select(
      col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts_ns"),
      col("user_id"), col("event_type"), col("value"), col("props")).collect()
    val conf = new org.apache.hadoop.conf.Configuration()
    val writer = ExampleParquetWriter.builder(new Path(file))
      .withConf(conf).withType(eventsNanosSchema).build()
    val f = new SimpleGroupFactory(eventsNanosSchema)
    try rows.foreach { r =>
      val g = f.newGroup()
      if (!r.isNullAt(0)) g.append("event_id", r.getLong(0))
      if (!r.isNullAt(1)) g.append("ts", r.getLong(1))
      if (!r.isNullAt(2)) g.append("user_id", r.getLong(2))
      if (!r.isNullAt(3)) g.append("event_type", r.getString(3))
      if (!r.isNullAt(4)) g.append("value", r.getDouble(4))
      if (!r.isNullAt(5)) g.append("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
  }
}
