package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The engine's assumptions about the driver-generated fixtures,
  * stated ONCE with pointed failure messages — the round-8 lesson
  * (the driver regenerated `events.ts` with a different storage unit
  * and 83 tests failed with the same cryptic cast error) turned into
  * an early tripwire. If a regeneration changes a schema again, THIS
  * spec names the table, column and expectation instead of scattering
  * the breakage across the suite.
  *
  * `events.ts` is deliberately asserted POST-normalization: the
  * loader's contract is "session-zone TimestampType whatever the
  * producer wrote" (Tables.normalizeTs), so any new storage unit that
  * normalizes cleanly is NOT a failure here — only a unit the loader
  * can't identify is.
  */
class FixtureContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private def fieldType(sf: String, table: String, column: String): DataType =
    Tables.load(spark, sf, table).schema(column).dataType

  test("events: ts normalizes to TimestampType; keys/values keep engine-assumed types") {
    for (sf <- sfDirs) {
      assert(fieldType(sf, "events", "ts") === TimestampType,
        s"$sf/events.parquet: ts did not normalize — extend Tables.normalizeTs for the new unit")
      assert(fieldType(sf, "events", "event_id") === LongType, s"$sf events.event_id")
      assert(fieldType(sf, "events", "user_id") === LongType, s"$sf events.user_id")
      assert(fieldType(sf, "events", "event_type") === StringType, s"$sf events.event_type")
      assert(fieldType(sf, "events", "value") === DoubleType,
        s"$sf events.value: decimal-exact aggregates (Ops) assume DOUBLE input")
    }
  }

  test("streaming fallback schema matches the live events layout post-normalization") {
    // EventStream.source declares CanonicalEventsSchema when a drop
    // directory has no footers yet; if a fixture regen changes the
    // events layout, the fallback must follow or pre-drop streams
    // will declare a schema the first real file contradicts
    for (sf <- sfDirs) {
      val live = Tables.load(spark, sf, "events").schema
      val fallback = graft.streaming.EventStream.CanonicalEventsSchema
      assert(fallback.fieldNames.toSeq === live.fieldNames.toSeq,
        s"$sf/events.parquet: column set drifted from EventStream.CanonicalEventsSchema")
      fallback.fields.zip(live.fields).foreach { case (f, l) =>
        assert(f.dataType === l.dataType,
          s"$sf events.${f.name}: fallback ${f.dataType} vs live ${l.dataType} — " +
            "update EventStream.CanonicalEventsSchema")
      }
    }
  }

  test("documents/embeddings: the text & vector tiers' assumed shapes") {
    for (sf <- sfDirs) {
      assert(fieldType(sf, "documents", "doc_id") === LongType, s"$sf documents.doc_id")
      assert(fieldType(sf, "documents", "text") === StringType, s"$sf documents.text")
      assert(fieldType(sf, "documents", "n_chars") === LongType, s"$sf documents.n_chars")
      assert(fieldType(sf, "embeddings", "vec_id") === LongType, s"$sf embeddings.vec_id")
      assert(fieldType(sf, "embeddings", "embedding") === ArrayType(FloatType),
        s"$sf embeddings.embedding: the dot-product kernels and int8/PQ quantizers " +
          "assume float32 elements — a double regeneration needs a normalization step " +
          "AND an oracle-parity review (float->double is not lossless both ways)")
      assert(fieldType(sf, "embeddings", "label") === IntegerType, s"$sf embeddings.label")
    }
  }

  test("relational tier: the join/agg keys the catalog's plans hash on") {
    for (sf <- sfDirs) {
      assert(fieldType(sf, "lineitem", "l_orderkey") === LongType, s"$sf lineitem.l_orderkey")
      assert(fieldType(sf, "lineitem", "l_quantity") === DoubleType, s"$sf lineitem.l_quantity")
      assert(fieldType(sf, "orders", "o_custkey") === LongType, s"$sf orders.o_custkey")
      assert(fieldType(sf, "customer", "c_custkey") === LongType, s"$sf customer.c_custkey")
      assert(fieldType(sf, "part", "p_retailprice") === DoubleType, s"$sf part.p_retailprice")
    }
  }
}
