package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw text-line ingestion — the log-file source family, completing
  * the input formats next to parquet (Tables), declared-schema JSON
  * (SpotifySchemas.read) and CSV (readSongsCsv): `spark.read.text`
  * gives one `value` row per line, and a single regexp with capture
  * groups lifts it into typed columns. Lines that do not match the
  * pattern get null groups and are either kept (for quarantine
  * counting) or dropped, mirroring the PERMISSIVE-JSON malformed-row
  * contract (P5).
  *
  * Scale shape: text files split by line ranges exactly like any
  * other file source, so the parse is an embarrassingly parallel
  * narrow map — one codegen regexp per line, no shuffle. At 100 TB
  * the pattern compiles once per task via Spark's regexp expression
  * cache, not per row.
  */
object TextLog {

  /** Parse lines into (ts, level, message); non-matching lines become
    * all-null rows when keepMalformed, else are dropped.
    * Expected shape: `2026-01-02T03:04:05 LEVEL free text...`
    */
  def read(spark: SparkSession, path: String, keepMalformed: Boolean = false): DataFrame = {
    val pat = "^(\\S+)\\s+(ERROR|WARN|INFO|DEBUG)\\s+(.*)$"
    // ONE regex evaluation per line — three regexp_extract calls would
    // each re-run the full pattern match, tripling the hot-path parse
    // cost at log scale. The anchored replace rewrites a MATCHING line
    // to its three groups joined by  (a byte no textual log line
    // legitimately carries); a non-matching line passes through
    // unchanged and splits to one part. A raw line that does contain
    //  is conservatively quarantined (the split would be
    // ambiguous), which is the malformed bucket's job anyway.
    val Sep = ""
    val parsed = spark.read.text(path)
      .select(col("value"),
        split(regexp_replace(col("value"), pat, s"$$1$Sep$$2$Sep$$3"), Sep).as("p"))
      .select(
        (size(col("p")) === 3 && !col("value").contains(Sep)).as("ok"),
        col("p"), col("value"))
      .select(
        when(col("ok"), to_timestamp(element_at(col("p"), 1))).as("ts"),
        when(col("ok"), element_at(col("p"), 2)).as("level"),
        when(col("ok"), element_at(col("p"), 3)).as("message"),
        col("value").as("raw"))
    if (keepMalformed) parsed else parsed.filter(col("level").isNotNull).drop("raw")
  }

  /** Quarantine report: matched vs malformed line counts in one pass. */
  def parseReport(spark: SparkSession, path: String): DataFrame =
    read(spark, path, keepMalformed = true)
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("level")).as("n_parsed"),
        (count(lit(1)) - count(col("level"))).as("n_malformed"))
}
