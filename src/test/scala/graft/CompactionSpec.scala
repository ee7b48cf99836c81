package graft

import java.nio.file.Files

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lake compaction: many small append files collapse into few
  * right-sized ones with identical content, and the swap is safe
  * (no intermediate state where the data is missing).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compact collapses per-batch small files into few, content identical") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate 20 daily appends -> at least 20 small files
    (0 until 20).foreach { day =>
      spark.range(day * 100L, day * 100L + 100L)
        .select($"id", ($"id" % 7).as("v"))
        .write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().toSet
    def fileCount = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    val filesBefore = fileCount
    assert(filesBefore >= 20, s"expected >=20 pre-compaction files, got $filesBefore")

    Sinks.compact(spark, dir, targetFileMb = 256)

    val after = spark.read.parquet(dir)
    assert(after.collect().toSet === beforeRows)
    val filesAfter = fileCount
    assert(filesAfter < filesBefore / 4,
      s"expected compaction to collapse files: $filesBefore -> $filesAfter")
    // no leftover temp/backup directories
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "_compacting")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + "_precompact")))
  }

  test("compact preserves a hive-partitioned layout; refuses to flatten it blind") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/t"
    (0 until 6).foreach { day =>
      Seq.tabulate(50)(i => (day.toLong * 100 + i, s"d$day"))
        .toDF("id", "day").repartition(4)
        .write.partitionBy("day").mode("append").parquet(dir)
    }
    // blind compaction would rewrite 'day' as a data column: pruning
    // gone and the next append creates a mixed layout — must refuse
    val e = intercept[IllegalArgumentException](Sinks.compact(spark, dir))
    assert(e.getMessage.contains("hive-partitioned"))
    val before = spark.read.parquet(dir).orderBy($"id").collect()
    Sinks.compact(spark, dir, partitionCols = Seq("day"))
    val after = spark.read.parquet(dir)
    assert(after.orderBy($"id").collect() === before)
    // layout survived: partition directories still exist and prune
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("day=")) == 6)
    // appends keep working against the compacted table
    Seq((9999L, "d9")).toDF("id", "day")
      .write.partitionBy("day").mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == before.length + 1)
  }

  test("compact refuses to run over an interrupted predecessor's backup") {
    val dir = Files.createTempDirectory("graft_compact_refuse").toString + "/t"
    spark.range(10).write.parquet(dir)
    // simulate a crash between the two swap renames
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir + "_precompact"))
    val e = intercept[IllegalArgumentException](Sinks.compact(spark, dir))
    assert(e.getMessage.contains("_precompact"))
    // live data untouched by the refusal
    assert(spark.read.parquet(dir).count() == 10)
  }
}
