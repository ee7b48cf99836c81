package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: times the q68 stream-stream interval join (the
  * slowest catalog query, flat ~8-10 s across rounds) under the
  * default HDFSBackedStateStoreProvider vs RocksDB, to settle whether
  * the cost is the state-store implementation or the join itself.
  * Evidence lands in SCALING.md. Not part of the driver contract.
  *
  * Usage: runMain graft.StateStoreProbe <sfDir> [reps]
  */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def run(): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = streaming.EventStream.runAppendToMemory(spark,
        streaming.EventStream.intervalJoined(
          streaming.EventStream.source(spark, s"$sfDir/events.parquet"),
          streaming.EventStream.source(spark, s"$sfDir/events.parquet"),
          windowMinutes = 60))
      val n = out.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    for (provider <- Seq("hdfs-backed (default)", "rocksdb")) {
      if (provider == "rocksdb")
        spark.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      else spark.conf.unset(providerKey)
      val runs = (1 to reps).map(_ => run())
      val secs = runs.map(_._1)
      require(runs.map(_._2).distinct.size == 1, s"row counts diverged: $runs")
      println(f"""{"provider":"$provider","min_sec":${secs.min}%.2f,"rows":${runs.head._2},"runs":[${secs.map(s => f"$s%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
