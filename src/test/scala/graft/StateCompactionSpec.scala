package graft

import java.nio.file.Files

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stale-key compaction for the persisted state tier — the maintenance
  * half the daily loop's append-only contract defers: compaction must
  * leave state EQUAL to a fresh full build over the current corpus
  * (the equality the q151 oracle defines, here asserted table-level),
  * heal removed keys without a worklist, and refuse to run over a
  * previous crash's debris instead of cascading into data loss.
  */
class StateCompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def embs = Tables.load(spark, sf, "embeddings")

  private def sigRows(path: String): Set[Seq[Any]] =
    spark.read.parquet(path + "/sigs").collect().toSet[org.apache.spark.sql.Row]
      .map(r => r.toSeq)

  test("signature compaction heals edits, removals and lost appends to a fresh-build state") {
    val state = Files.createTempDirectory("graft_sig_compact").toString
    val fresh = Files.createTempDirectory("graft_sig_fresh").toString
    // tampered day-0 corpus: stale drafts for doc_id % 7 = 0, ghost
    // docs that get deleted before day 1, and one doc (max id) whose
    // append was "lost" (absent from state despite being current)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val changed = docs.filter(col("doc_id") % 7 === 0 && col("doc_id") =!= maxId)
    val day0 = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") =!= maxId)
      .unionByName(changed.withColumn("text", concat(col("text"), lit(" stale draft"))))
      .unionByName(docs.filter(col("doc_id") < 10)
        .withColumn("doc_id", col("doc_id") + 1000000))
    Dedup.persistMinhashSignatures(day0, 3, 16, 4, state)
    // duplicate-append: an identical batch re-delivered (staged via a
    // temp table so the append never races its own scan)
    val dupBatch = docs.filter(col("doc_id") % 7 === 1)
    val dupTmp = Files.createTempDirectory("graft_sig_dup").toString + "/d"
    spark.read.parquet(state + "/sigs")
      .join(dupBatch.select("doc_id"), Seq("doc_id"), "left_semi")
      .write.parquet(dupTmp)
    spark.read.parquet(dupTmp).write.mode("append").parquet(state + "/sigs")

    Dedup.compactSignatures(docs, 3, 16, 4, state, changed.select("doc_id"))
    Dedup.persistMinhashSignatures(docs, 3, 16, 4, fresh)
    assert(sigRows(state) === sigRows(fresh))
    // the ghosts are gone even though the worklist never named them
    assert(spark.read.parquet(state + "/sigs")
      .filter(col("doc_id") >= 1000000).count() === 0)
  }

  test("compacted signature state keeps serving the incremental path") {
    val state = Files.createTempDirectory("graft_sig_serve").toString
    val freshState = Files.createTempDirectory("graft_sig_serve_fresh").toString
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    // history state carries stale text for % 10 = 5 docs; compact heals
    val changed = hist.filter(col("doc_id") % 10 === 5)
    val tampered = hist.filter(col("doc_id") % 10 =!= 5)
      .unionByName(changed.withColumn("text", concat(col("text"), lit(" v2 draft"))))
    Dedup.persistMinhashSignatures(tampered, 3, 16, 4, state)
    Dedup.compactSignatures(hist, 3, 16, 4, state, changed.select("doc_id"))
    Dedup.persistMinhashSignatures(hist, 3, 16, 4, freshState)
    val viaCompacted = Dedup.incrementalMinhashEstimated(batch, 3, 16, 4, 0.5, state)
    val viaFresh = Dedup.incrementalMinhashEstimated(batch, 3, 16, 4, 0.5, freshState)
    assert(viaCompacted.collect().toSeq === viaFresh.collect().toSeq)
  }

  test("IVF compaction + re-append equals a fresh build over the current corpus") {
    val idx = Files.createTempDirectory("graft_ivf_compact").toString + "/idx"
    val full = Files.createTempDirectory("graft_ivf_compact_full").toString + "/idx"
    val stale = embs.filter(col("vec_id") >= 16 && col("vec_id") % 9 === 0)
    val ghosts = embs.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 1000000)
    val day0 = embs.join(stale.select("vec_id"), Seq("vec_id"), "left_anti")
      .unionByName(stale.withColumn("embedding", reverse(col("embedding"))))
      .unionByName(ghosts)
    Similarity.buildIvfIndex(day0, nlist = 16, path = idx)
    Similarity.compactIvfIndex(spark, idx,
      stale.select("vec_id").unionByName(ghosts.select("vec_id")))
    Similarity.appendToIvfIndex(stale, spark, idx)
    Similarity.buildIvfIndex(embs, nlist = 16, path = full)
    // table-level: assignments identical as (vec_id, cell, u) sets
    def rows(p: String) = spark.read.parquet(p + "/assignments")
      .select(col("vec_id"), col("cell").cast("long"),
        col("u").cast("array<double>"))
      .collect().toSet[org.apache.spark.sql.Row].map(_.toSeq)
    assert(rows(idx) === rows(full))
    // and query-level, through the probe path
    val healed = Similarity.cosineTopKIvfIndexed(spark, idx, nQueries = 8, k = 6, nprobe = 3)
    val rebuilt = Similarity.cosineTopKIvfIndexed(spark, full, nQueries = 8, k = 6, nprobe = 3)
    assert(healed.collect().toSeq === rebuilt.collect().toSeq)
  }

  test("compaction refuses to run over a previous crash's debris") {
    val state = Files.createTempDirectory("graft_sig_debris").toString
    Dedup.persistMinhashSignatures(docs.limit(50), 3, 16, 4, state)
    // simulate a swap that died between the two renames
    Files.createDirectory(java.nio.file.Paths.get(state + "/sigs_precompact"))
    val e = intercept[IllegalArgumentException] {
      Dedup.compactSignatures(docs, 3, 16, 4, state,
        docs.limit(0).select("doc_id"))
    }
    assert(e.getMessage.contains("_precompact"))
  }
}
