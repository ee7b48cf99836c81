package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for scale extrapolation: stages an N× copy of the
  * documents/embeddings tables (ids remapped so copies are genuine
  * near-duplicate clusters) and times the quadratic-risk operators —
  * the evidence behind SCALING.md. Not part of the driver contract.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <multiplier>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def staged(name: String, idCol: String): DataFrame = {
      val base = Tables.load(spark, sfDir, name)
      (0 until mult).map(i => base.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_ unionAll _)
    }
    val docs = staged("documents", "doc_id").cache()
    val embs = staged("embeddings", "vec_id").cache()
    println(s"""{"docs":${docs.count()},"embeddings":${embs.count()},"mult":$mult}""")

    def time(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"""{"op":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
    }

    time("dedup_exact", Dedup.exact(docs))
    time("jaccard_capped", Dedup.jaccardPairsCapped(docs, 3, 0.5, 20))
    time("minhash_lsh", Dedup.minhashLsh(docs, 3, 16, 4, 0.5))
    time("simhash_banded", Dedup.simhashPairs(docs, 2))
    time("cosine_topk_brute", Similarity.cosineTopK(embs, 10, 5))
    time("cosine_topk_lsh", Similarity.cosineTopKLsh(embs, 10, 5, 8, 64))
    time("neardups_lsh", Similarity.embeddingNearDupsLsh(embs, 0.45, 4, 64))
    time("toppairs_lsh", Similarity.topPairsLsh(embs, 20, 4, 64))
    spark.stop()
  }
}
