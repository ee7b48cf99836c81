package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the scheduler (SURVEY.md §2.12: Airflow
  * stays the orchestrator and submits Spark jobs; a
  * SparkSubmitOperator captures the one-line JSON summary this main
  * prints — the XCom analog).
  *
  * Usage:
  *   spark-submit --class graft.Jobs <jar> ep1 <payloads.jsonl> <csvOut>
  *   spark-submit --class graft.Jobs <jar> ep2 <payloads.jsonl> <tablePath> [asOfDate]
  *   spark-submit --class graft.Jobs <jar> ep3 <payloads.jsonl> <csvOut>
  *
  * Payload files are JSON-lines of raw API payloads (the HTTP fetch is
  * the connector's job; zero egress here). Exit code is non-zero on
  * validation failure, so scheduler retries fire exactly like the
  * reference's Airflow task retries — but on an idempotent pipeline.
  */
object Jobs {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Jobs <ep1|ep2|ep3> <payloadPath> <outPath> [asOfDate]")
    val Array(job, payloadPath, outPath) = args.take(3)
    val spark = SparkSession.builder()
      // spark-submit injects spark.master; bare JVM runs fall back local
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val payloads = spark.read.textFile(payloadPath)
    val summary = job match {
      case "ep1" => Pipelines.topTracksEtl(spark, payloads, outPath)
      case "ep2" =>
        // default "today" in UTC, the session timezone — java.sql.Date
        // from currentTimeMillis renders in the JVM default zone, which
        // near midnight names the wrong calendar day vs the UTC event
        // timestamps Validation compares against
        val asOf = if (args.length > 3) java.sql.Date.valueOf(args(3))
          else java.sql.Date.valueOf(java.time.LocalDate.now(java.time.ZoneOffset.UTC))
        Pipelines.recentlyPlayedEtl(spark, payloads, outPath, asOf)
      case "ep3" => Pipelines.recentlyPlayedAnalysis(spark, payloads, outPath)
      case other => throw new IllegalArgumentException(s"unknown job: $other")
    }
    println(summary) // the line the orchestrator captures
    spark.stop()
  }
}
