package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (test scope, not shipped): print the physical plan of the
  * near-dup pair-generation SUBTREE — the part of
  * [[graft.operators.Dedup.jaccardPairsCapped]] that executes inside
  * `materialize`'s own SQL execution and is therefore invisible in any
  * consumer query's final plan (which shows only the checkpoint's
  * `Scan ExistingRDD`). The round-21 claim this documents: the capped
  * shingle frame's dedup + df-cap now ride ONE shingle-keyed exchange
  * (repartition → dropDuplicates → count window) where the previous
  * shape paid a (doc_id, shingle)-keyed exchange for the distinct and
  * a second shingle-keyed one for the window.
  *
  * Usage: sbt "Test/runMain graft.PairGenPlanProbe [sfDir]"
  */
object PairGenPlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkTestSession.spark
    val docs = Tables.load(spark, sf, "documents")
    val n = 3
    val maxDf = 20
    val raw = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= n)
      .select(col("doc_id"), explode(
        expr(s"transform(sequence(0, size(w)-$n), i -> array_join(slice(w, i+1, $n), ' '))")
      ).as("shingle"))
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    // the pre-round-21 shape: distinct (its own exchange), then the df
    // window re-exchanges by shingle
    show("capped shingles BEFORE (distinct + window: 2 exchanges)",
      raw.distinct()
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("df") <= maxDf)
        .drop("df"))
    // the round-21 shape: one shingle-keyed exchange serves dedup + cap
    show("capped shingles AFTER (repartition + dropDuplicates + window: 1 exchange)",
      raw.repartition(col("shingle"))
        .dropDuplicates(Seq("doc_id", "shingle"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("df") <= maxDf)
        .drop("df"))
    spark.stop()
  }
}
