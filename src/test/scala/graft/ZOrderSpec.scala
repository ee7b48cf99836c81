package graft

import java.nio.file.Files

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order lake layout: per-file min/max spans must be bounded in
  * BOTH dimensions (each file covers a rectangle), where the 1-D
  * sorted layout leaves the unsorted dimension at full span in every
  * file. Span fraction = avg over files of (max-min)/domain — the
  * share of the domain a point predicate on that column cannot skip.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def events = Tables.load(spark, sf, "events")
    .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")

  /** Average per-file span fraction of `c` across the written files. */
  private def spanFrac(path: String, c: String): Double = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"), max(col(c)).cast("double").as("hi"))
    val Array(gLo, gHi) = spark.read.parquet(path)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val fracs = perFile.select((($"hi" - $"lo") / (gHi - gLo)).as("fr"))
      .as[Double].collect()
    fracs.sum / fracs.length
  }

  test("z-order bounds BOTH dimensions; 1-D sort leaves the other at full span") {
    val zDir = Files.createTempDirectory("graft_zorder").toString + "/t"
    val sDir = Files.createTempDirectory("graft_sorted").toString + "/t"
    Sinks.writeZOrdered(events, zDir, "ts_us", "user_id", partitions = 16)
    Sinks.writeSorted(events, sDir, "ts_us", partitions = 16)

    val zTs = spanFrac(zDir, "ts_us")
    val zUser = spanFrac(zDir, "user_id")
    val sTs = spanFrac(sDir, "ts_us")
    val sUser = spanFrac(sDir, "user_id")
    info(f"z-order: ts span $zTs%.3f, user span $zUser%.3f; sorted: ts $sTs%.3f, user $sUser%.3f")

    // 16 files on a 2-D Z-curve: each dimension's span shrinks well
    // below half the domain on average
    assert(zTs < 0.5, s"z-order ts span $zTs should be < 0.5")
    assert(zUser < 0.5, s"z-order user span $zUser should be < 0.5")
    // the 1-D layout cannot skip on the unsorted column: every file
    // spans (nearly) the whole user domain
    assert(sUser > 0.8, s"sorted-by-ts user span $sUser expected near 1")
    // and z-order's sorted-dimension span stays comparable-or-better
    // than 4x the 1-D layout's (the price of covering two dimensions)
    assert(zTs <= math.max(4 * sTs, 0.5))
  }

  test("reader-level proof: row-group pruning fires on BOTH dimensions of the z-ordered layout") {
    val zDir = Files.createTempDirectory("graft_zorder_rg").toString + "/t"
    val sDir = Files.createTempDirectory("graft_sorted_rg").toString + "/t"
    Sinks.writeZOrdered(events, zDir, "ts_us", "user_id", partitions = 16)
    Sinks.writeSorted(events, sDir, "ts_us", partitions = 16)
    val total = events.count()

    // rows the parquet reader actually materializes under a point-ish
    // predicate = rows of the row groups whose stats overlap it
    def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect() // execute to populate metrics
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val Array(uLo, uHi) = spark.read.parquet(zDir)
      .agg(min($"user_id"), max($"user_id")).head().toSeq.map(_.asInstanceOf[Long]).toArray
    val mid = (uLo + uHi) / 2
    val narrow = $"user_id".between(mid, mid + (uHi - uLo) / 20)

    val zScanned = scannedRows(zDir, narrow)
    val sScanned = scannedRows(sDir, narrow)
    info(s"user-range predicate: z-ordered scans $zScanned rows, 1-D-sorted scans $sScanned of $total")
    // the 1-D layout cannot prune on the unsorted column: it reads everything
    assert(sScanned == total)
    // the z-ordered layout skips whole row groups on the SECOND dimension
    assert(zScanned < total * 3 / 4,
      s"expected z-order to prune row groups on user_id: scanned $zScanned of $total")
  }

  test("skew mode: rank quantization prunes in the dense region where linear degenerates") {
    // zipfian skew key: ~94% of rows land in [1, 100] while the max is
    // ~1e9 — linear quantization maps the entire dense mass to
    // quantized cell 0, so z carries NO information about the skew
    // column there and a dense-region predicate must scan every file
    val n = 60000
    val skewed = spark.range(n).select(
      $"id".as("event_id"),
      (lit(1e9) / pow($"id" % 1000 + 1, 2.0)).cast("long").as("skew_key"),
      ($"id" * 37 % 100000).as("ts_us"))
    val linDir = Files.createTempDirectory("graft_zorder_lin").toString + "/t"
    val rnkDir = Files.createTempDirectory("graft_zorder_rnk").toString + "/t"
    Sinks.writeZOrdered(skewed, linDir, "ts_us", "skew_key", partitions = 16)
    Sinks.writeZOrderedRank(skewed, rnkDir, "ts_us", "skew_key", partitions = 16)

    def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    // a narrow predicate INSIDE the dense mass: [1000, 1100] covers
    // ~5% of the rows but sits ENTIRELY inside linear-quantization
    // bucket 0 (1100 << domain/2^16), so the linear layout has zero
    // information about it while equi-depth buckets resolve it
    val densePred = $"skew_key".between(1000L, 1100L)
    val linScanned = scannedRows(linDir, densePred)
    val rnkScanned = scannedRows(rnkDir, densePred)
    info(s"dense-region predicate: linear z-order scans $linScanned, rank z-order scans $rnkScanned of $n")
    // linear: the dense mass shares one z-cell -> no pruning power
    assert(linScanned > n * 3 / 4,
      s"expected linear quantization to degenerate under skew (scanned $linScanned of $n)")
    // rank: equi-depth buckets keep resolution inside the dense mass
    assert(rnkScanned < n / 2,
      s"expected rank quantization to prune in the dense region (scanned $rnkScanned of $n)")
    // and the rank layout is still a pure permutation of the input
    val back = spark.read.parquet(rnkDir)
    assert(back.count() == n)
    assert(back.exceptAll(skewed).isEmpty && skewed.exceptAll(back).isEmpty)
  }

  test("z-order write preserves every row and column (the layout is only a permutation)") {
    val dir = Files.createTempDirectory("graft_zorder_rt").toString + "/t"
    Sinks.writeZOrdered(events, dir, "ts_us", "user_id", partitions = 8)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted.toSeq == events.columns.sorted.toSeq)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }
}
