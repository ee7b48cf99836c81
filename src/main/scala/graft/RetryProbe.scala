package graft

import java.util.concurrent.ConcurrentHashMap

import graft.operators.{Dedup, Sampling, SkewJoin}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: PROVE the determinism-under-retry claims instead of
  * asserting them in prose. Spark re-executes failed tasks (and, on
  * fetch failure, whole map stages); any operator whose output
  * depends on nondeterministic per-row state (rand(), wall clock,
  * partition-local counters) silently corrupts results under retry —
  * the classic 1000-executor bug that never shows on a clean laptop
  * run. Every salt/sample/shuffle here derives from column HASHES,
  * so a re-executed task must rebuild byte-identical output.
  *
  * Method: master = local[8, 4] (maxFailures=4 — plain local[8]
  * fails the job on first error), and a flaky barrier stage that
  * throws on every task's FIRST attempt (tracked per stage+partition
  * in a JVM-global map), forcing Spark to retry every partition.
  * Each operator's flaky-run output must equal its clean run.
  *
  * Usage: runMain graft.RetryProbe [sfDir]
  */
object RetryProbe {
  val attempted: ConcurrentHashMap[String, Boolean] = new ConcurrentHashMap()

  /** Identity pass-through that throws on each task's first attempt. */
  private def flaky(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      val key = s"${tc.stageId()}_${tc.partitionId()}"
      if (tc.attemptNumber() == 0 && attempted.putIfAbsent(key, true) == null)
        throw new RuntimeException(s"injected failure for retry probe at $key")
      it
    }(enc)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8, 4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val events = Tables.load(spark, sfDir, "events")
    val docs = Tables.load(spark, sfDir, "documents")

    def probe(name: String, build: DataFrame => DataFrame, src: DataFrame): Unit = {
      val clean = build(src).collect().toSeq
      attempted.clear()
      val retried = build(flaky(src)).collect().toSeq
      val ok = clean == retried
      println(s"""{"probe":"$name","rows":${clean.size},"identical_under_retry":$ok}""")
      if (!ok) sys.error(s"$name diverged under task retry")
    }

    probe("salted_skew_join", src => {
      val dim = src.groupBy($"event_type")
        .agg((Ops.decSum($"value") / count($"value")).as("ta"))
      SkewJoin.saltedEquiJoin(src, dim, "event_type", $"event_id", buckets = 16)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), count(when($"value" > $"ta", 1)).as("n_above"))
        .orderBy($"event_type")
    }, events)

    probe("hash_bucket_split", src =>
      src.groupBy(Sampling.hashBucket($"doc_id".cast("string")).as("b"))
        .agg(count(lit(1)).as("n")).orderBy($"b"),
      docs)

    probe("epoch_shuffle", src =>
      Sampling.epochShuffle(src, "doc_id", "epoch0", 8), docs)

    probe("temperature_mixture", src =>
      Sampling.temperatureMixture(src, "lang", "doc_id", 0.5, 0.5), docs)

    probe("exact_dedup", src => Dedup.exact(src), docs)

    probe("weighted_sample", src =>
      Sampling.weightedSample(
        src.select($"doc_id", ($"n_chars" % 100).cast("double").as("w")),
        weightCol = "w", keyCol = "doc_id"), docs)

    println("""{"retry_probe":"all identical under injected task retries"}""")
    spark.stop()
  }
}
