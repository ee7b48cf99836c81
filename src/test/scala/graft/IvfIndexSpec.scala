package graft

import java.nio.file.Files

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistable ANN index: build-once/query-many must equal the inline
  * path exactly, and the assignments table must be laid out so a
  * probe reads only its cells (partition pruning), because at 100 TB
  * the index is built once and the corpus is never rescanned per
  * query run.
  */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def embs = Tables.load(spark, sf, "embeddings")

  test("persisted IVF index query equals the inline IVF query bit-for-bit") {
    val dir = Files.createTempDirectory("graft_ivf_idx").toString + "/idx"
    Similarity.buildIvfIndex(embs, nlist = 16, path = dir)

    val inline = Similarity.cosineTopKIvf(embs, nQueries = 10, k = 5, nlist = 16, nprobe = 4)
    val indexed = Similarity.cosineTopKIvfIndexed(spark, dir, nQueries = 10, k = 5, nprobe = 4)
    assert(indexed.collect().toSeq === inline.collect().toSeq)

    // query-many: different parameters against the SAME build
    val inline2 = Similarity.cosineTopKIvf(embs, nQueries = 7, k = 3, nlist = 16, nprobe = 2)
    val indexed2 = Similarity.cosineTopKIvfIndexed(spark, dir, nQueries = 7, k = 3, nprobe = 2)
    assert(indexed2.collect().toSeq === inline2.collect().toSeq)
  }

  test("incremental append equals a full rebuild when the build held the centroid vectors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_inc").toString + "/idx"
    val full = Files.createTempDirectory("graft_ivf_full").toString + "/idx"
    // day 0: first 60% of the corpus (contains all 16 centroid ids)
    val ids = embs.select($"vec_id").as[Long].collect().sorted
    val cut = ids(ids.length * 3 / 5)
    Similarity.buildIvfIndex(embs.filter($"vec_id" <= cut), nlist = 16, path = dir)
    // day 1: append the rest — only the new batch is assigned
    Similarity.appendToIvfIndex(embs.filter($"vec_id" > cut), spark, dir)
    // reference: one-shot build over everything
    Similarity.buildIvfIndex(embs, nlist = 16, path = full)

    val incremental = Similarity.cosineTopKIvfIndexed(spark, dir, nQueries = 10, k = 5, nprobe = 4)
    val rebuilt = Similarity.cosineTopKIvfIndexed(spark, full, nQueries = 10, k = 5, nprobe = 4)
    assert(incremental.collect().toSeq === rebuilt.collect().toSeq)
    // and the appended index matches the inline path too
    val inline = Similarity.cosineTopKIvf(embs, nQueries = 10, k = 5, nlist = 16, nprobe = 4)
    assert(incremental.collect().toSeq === inline.collect().toSeq)
  }

  test("indexed query dynamically prunes assignment partitions to the probed cells") {
    val dir = Files.createTempDirectory("graft_ivf_dpp").toString + "/idx"
    Similarity.buildIvfIndex(embs, nlist = 16, path = dir)
    val q = Similarity.cosineTopKIvfIndexed(spark, dir, nQueries = 12, k = 4, nprobe = 3)
    q.collect()
    // the probed cells are data-dependent (computed from the broadcast
    // qprobe side), so static pruning can't apply — the nprobe/nlist
    // read contract rests on DYNAMIC partition pruning firing against
    // the cell-partitioned table
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the assignments scan:\n${plan.take(2000)}")
  }

  test("assignments are partitioned by cell and a cell probe prunes the rest") {
    val dir = Files.createTempDirectory("graft_ivf_prune").toString + "/idx"
    Similarity.buildIvfIndex(embs, nlist = 16, path = dir)

    val (_, assign) = Similarity.loadIvfIndex(spark, dir)
    val probed = assign.filter(col("cell").isin(0L, 3L))
    probed.collect()
    val scan = probed.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters: [") && !scan.contains("PartitionFilters: []"),
      s"expected partition filters on cell in scan:\n$scan")
    // the probe touches only files under the probed cells' directories
    val files = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f => f.contains("cell=0") || f.contains("cell=3")),
      s"probe read outside its cells: ${files.mkString(", ")}")
  }
}
