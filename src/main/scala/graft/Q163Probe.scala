package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split q163_daily_dsir_loop's turn cost into its parts —
  * the heal, the incremental dedup, the DSIR tier, the post-turn
  * maintenance gates, and the final scoring read — to adjudicate the
  * r13 creep (7.73s → 10.98s in the driver sweep) against the pieces
  * round 13 added (maintain gates, derived run identity).
  *
  * Usage: runMain graft.Q163Probe [reps]
  */
object Q163Probe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q163probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to reps).foreach { rep =>
      println(s"[q163probe] ---- rep $rep ----")
      val docs = Tables.load(spark, sfDir, "documents")
      val emb = Tables.load(spark, sfDir, "embeddings")
      val changedDocs = docs.filter(col("doc_id") % 35 === 7)
      val day1Docs = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 35 =!= 7)
        .unionByName(changedDocs.withColumn("text", concat(col("text"), lit(" stale draft"))))
        .unionByName(docs.filter(col("doc_id") < 30)
          .withColumn("doc_id", col("doc_id") + 1000000))
      val st = Scratch.dir(s"graft_probe_q163_$rep")
      t("stage: persistMinhashSignatures") {
        operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st + "/mh") }
      t("stage: buildIvfIndex") {
        operators.Similarity.buildIvfIndex(emb, nlist = 16, path = st + "/ivf") }
      t("stage: persistDsirState") {
        operators.TextAnalysis.persistDsirState(day1Docs, "src0", st + "/dsir") }
      // the turn, default args (maintain = true, runId-less)
      t("turn: dailyIncremental (maintain=true)") {
        Pipelines.dailyIncremental(spark, day1Docs, docs, emb, emb,
          st + "/mh", st + "/ivf", healEdits = true,
          dsirStatePath = Some(st + "/dsir"), healVia = "tombstone") }
      t("read: dsirWeightsFromState") {
        operators.TextAnalysis.dsirWeightsFromState(docs, spark, st + "/dsir", "src0")
          .write.format("noop").mode("overwrite").save() }
      // A/B: same staging, maintain = false
      val st2 = Scratch.dir(s"graft_probe_q163_nm_$rep")
      operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st2 + "/mh")
      operators.Similarity.buildIvfIndex(emb, nlist = 16, path = st2 + "/ivf")
      operators.TextAnalysis.persistDsirState(day1Docs, "src0", st2 + "/dsir")
      t("turn: dailyIncremental (maintain=false)") {
        Pipelines.dailyIncremental(spark, day1Docs, docs, emb, emb,
          st2 + "/mh", st2 + "/ivf", healEdits = true,
          dsirStatePath = Some(st2 + "/dsir"), healVia = "tombstone",
          maintain = false) }
      // A/B: explicit runId (no derived-stamp jobs)
      val st3 = Scratch.dir(s"graft_probe_q163_rid_$rep")
      operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st3 + "/mh")
      operators.Similarity.buildIvfIndex(emb, nlist = 16, path = st3 + "/ivf")
      operators.TextAnalysis.persistDsirState(day1Docs, "src0", st3 + "/dsir")
      t("turn: dailyIncremental (maintain=false, explicit runId)") {
        Pipelines.dailyIncremental(spark, day1Docs, docs, emb, emb,
          st3 + "/mh", st3 + "/ivf", healEdits = true,
          dsirStatePath = Some(st3 + "/dsir"), healVia = "tombstone",
          maintain = false, runId = Some("probe-day-1")) }
      // A/B: no DSIR tier at all (q164's shape on the doc side)
      val st4 = Scratch.dir(s"graft_probe_q163_nodsir_$rep")
      operators.Dedup.persistMinhashSignatures(day1Docs, 3, 16, 4, st4 + "/mh")
      operators.Similarity.buildIvfIndex(emb, nlist = 16, path = st4 + "/ivf")
      t("turn: dailyIncremental (maintain=false, no dsir)") {
        Pipelines.dailyIncremental(spark, day1Docs, docs, emb, emb,
          st4 + "/mh", st4 + "/ivf", healEdits = true,
          healVia = "tombstone", maintain = false) }
    }
    spark.stop()
  }
}
