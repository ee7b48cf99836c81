package graft

import java.nio.file.Files

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake schema evolution: daily appends gain columns over time (the
  * reference's flatten grew columns across spotify_etl.py versions —
  * 10-col vs 13-col). The partitioned-parquet sink must accept the
  * widened batch, old files must stay readable, and readers opt into
  * the union schema with mergeSchema (nulls for the missing column in
  * old batches) — the standard lake contract, pinned here so a
  * writer-side change can't silently break it.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ORC sink honors the same ''->unknown sentinel contract as the parquet sink") {
    // __HIVE_DEFAULT_PARTITION__'s null-on-read trap is format-
    // independent: an empty-string partition value must come back as
    // the visible sentinel, not NULL, from the ORC sink too
    val dir = Files.createTempDirectory("graft_orcsent").toString + "/t"
    val batch = Seq((1L, "a", ""), (2L, "b", "2026-01-02")).toDF("id", "name", "timestamp")
    Sinks.appendPartitionedOrc(batch, dir)
    val back = spark.read.orc(dir)
    assert(back.filter($"timestamp".isNull).count() === 0)
    assert(back.filter($"timestamp" === "unknown").select($"id").as[Long].collect() === Array(1L))
  }

  test("appendPartitioned resolves a mixed-case partition column like Spark's resolver") {
    val dir = Files.createTempDirectory("graft_casepart").toString + "/t"
    val batch = Seq((1L, ""), (2L, "x")).toDF("id", "timestamp")
    Sinks.appendPartitioned(batch, dir, "Timestamp") // resolver-insensitive
    val back = spark.read.parquet(dir)
    assert(back.filter(col("Timestamp") === "unknown").count() === 1)
  }

  test("an existing table's partition-directory spelling beats a differently-cased df schema") {
    // append #1 seeds `timestamp=` dirs; append #2's DATAFRAME spells
    // the column `Timestamp` — the on-disk layout is authoritative, so
    // the second write must land in the same directory family
    val dir = Files.createTempDirectory("graft_casepart3").toString + "/t"
    Sinks.appendPartitioned(Seq((1L, "a")).toDF("id", "timestamp"), dir)
    Sinks.appendPartitioned(Seq((2L, "a")).toDF("id", "Timestamp"), dir, "Timestamp")
    val back = spark.read.parquet(dir) // conflicting names would throw
    assert(back.columns.map(_.toLowerCase).contains("timestamp"))
    assert(back.filter(col("timestamp") === "a").count() === 2)
  }

  test("a differently-cased second append lands in the SAME partition directories") {
    // the sink must write under the SCHEMA's spelling, not the
    // caller's: `Timestamp=` directories appearing beside `timestamp=`
    // fail every subsequent read with conflicting-partition-columns
    val dir = Files.createTempDirectory("graft_casepart2").toString + "/t"
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "timestamp")
    Sinks.appendPartitioned(batch, dir, "timestamp")
    Sinks.appendPartitioned(Seq((3L, "a")).toDF("id", "timestamp"), dir, "Timestamp")
    val back = spark.read.parquet(dir) // would throw on a forked layout
    assert(back.count() === 3)
    assert(back.filter($"timestamp" === "a").select($"id").as[Long].collect().sorted
      === Array(1L, 3L))
  }

  test("appendPartitioned with a NON-string partition column writes without the sentinel rewrite") {
    // the ''->"unknown" rewrite is a string-column contract; on an
    // integer partition column the old `col === ""` coercion could
    // throw under ANSI for values a plain write stores fine
    val dir = Files.createTempDirectory("graft_intpart").toString + "/t"
    val batch = Seq((1L, 20260101L), (2L, 20260102L)).toDF("id", "daykey")
    Sinks.appendPartitioned(batch, dir, "daykey")
    val back = spark.read.parquet(dir)
    assert(back.select($"daykey").distinct().as[Long].collect().sorted
      === Array(20260101L, 20260102L))
  }

  test("appendPartitioned accepts a widened batch; mergeSchema unions; old readers still work") {
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    val day1 = Seq((1L, "a", "2026-01-01"), (2L, "b", "2026-01-01"))
      .toDF("id", "name", "timestamp")
    val day2 = Seq((3L, "c", 0.75, "2026-01-02"))
      .toDF("id", "name", "score", "timestamp") // new column: score
    Sinks.appendPartitioned(day1, dir)
    Sinks.appendPartitioned(day2, dir)

    // merged read: union schema, nulls where day1 lacked the column
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "timestamp"))
    assert(merged.count() == 3)
    assert(merged.filter($"score".isNull).count() == 2)
    assert(merged.filter($"score" === 0.75).select($"id").as[Long].head() == 3L)

    // partition pruning still applies across heterogenous batches
    val pruned = spark.read.option("mergeSchema", "true").parquet(dir)
      .filter($"timestamp" === "2026-01-02")
    assert(pruned.count() == 1)

    // a narrow reader projecting only the original columns never
    // notices the evolution (column pruning reads just what it asks)
    val narrow = spark.read.option("mergeSchema", "true").parquet(dir)
      .select($"id", $"name")
    assert(narrow.count() == 3 && narrow.columns.toSeq == Seq("id", "name"))
  }
}
