package graft

import java.sql.DriverManager

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end test of the K2 RDBMS path (reference spotify_etl2.py:220
  * `to_sql(..., if_exists="append")`): Spark's JDBC writer against
  * Apache Derby in embedded mode — the one JDBC engine that ships in
  * /opt/spark/jars, so the test needs no vendored driver and runs
  * fully offline. Covers the reference sink's two semantics: appends
  * accumulate (two batches → both visible) and the table survives
  * across connections (durable file store, not :memory:).
  */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dbPath = s"/tmp/graft_derby_${System.nanoTime()}"
  private val url = s"jdbc:derby:$dbPath;create=true"

  test("appendJdbc round-trips rows through a real JDBC database and appends across batches") {
    val batch1 = Seq((1L, "alpha", 3.5), (2L, "beta", 0.25)).toDF("id", "name", "score")
    val batch2 = Seq((3L, "gamma", -1.0)).toDF("id", "name", "score")
    Sinks.appendJdbc(batch1, url, "plays")
    Sinks.appendJdbc(batch2, url, "plays")

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "plays").load()
      .orderBy($"id")
    assert(back.columns.map(_.toLowerCase).toSeq == Seq("id", "name", "score"))
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "alpha", 3.5), (2L, "beta", 0.25), (3L, "gamma", -1.0)))

    // durability: the rows are visible to a fresh plain-JDBC connection
    // (the reference's sqlite file outlives the task run)
    val conn = DriverManager.getConnection(s"jdbc:derby:$dbPath")
    try {
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM plays")
      rs.next()
      assert(rs.getLong(1) == 3L)
    } finally conn.close()
  }

  test("JDBC read path: filters push into the remote WHERE clause and partitioned reads fan out") {
    val rows = (1L to 200L).map(i => (i, s"track_$i", (i % 7).toDouble)).toDF("id", "name", "score")
    Sinks.appendJdbc(rows, url, "pushdown_plays")

    // pushdown: the predicate must reach the database, not Spark's filter
    val filtered = graft.sources.JdbcSource.read(spark, url, "pushdown_plays")
      .filter($"id" > 150L && $"score" === 3.0)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head
    val pushed = scan.toString
    assert(pushed.contains("PushedFilters: [") && pushed.contains("GreaterThan(")
      && !pushed.contains("PushedFilters: []"),
      s"expected pushed JDBC filters in scan:\n$pushed")
    assert(filtered.count() ==
      rows.filter($"id" > 150L && $"score" === 3.0).count())

    // partitioned read: 4 range slices, one connection each; union of
    // slices = whole table even with deliberately loose bounds
    val par = graft.sources.JdbcSource.readPartitioned(
      spark, url, "pushdown_plays", "id", lower = 50L, upper = 120L, numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4)
    assert(par.count() == 200L)
    assert(par.exceptAll(rows).isEmpty && rows.exceptAll(par).isEmpty)
  }

  test("appendJdbc preserves nulls and timestamps through the JDBC type mapping") {
    val df = Seq((10L, Some("x"), Some(java.sql.Timestamp.valueOf("2026-08-13 01:02:03"))),
        (11L, None, None))
      .toDF("id", "label", "played_at")
    Sinks.appendJdbc(df, url, "typed_plays")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "typed_plays").load()
      .orderBy($"id")
      .as[(Long, Option[String], Option[java.sql.Timestamp])].collect().toSeq
    assert(back == Seq(
      (10L, Some("x"), Some(java.sql.Timestamp.valueOf("2026-08-13 01:02:03"))),
      (11L, None, None)))
  }
}
