package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * North-star extension (BASELINE.json). At 100 TB, `rand()`-based
  * splits are a liability: they change under retry/re-partitioning and
  * can't be reproduced across engines. Everything here keys off the
  * portable content hash instead — any engine (or the DuckDB oracle)
  * recomputes the identical split, and a document keeps its assignment
  * for life, no split-table join needed.
  */
object Sampling {

  /** Percent bucket in [0, 100) for a key column — the split primitive. */
  def hashBucket(key: Column): Column =
    pmod(PortableHash.hash32(key.cast("string")), lit(100L))

  /** Assign train/test by hash bucket: bucket < trainPct → "train".
    * Output: input columns + split.
    */
  def trainTestSplit(df: DataFrame, keyCol: String, trainPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol)) < trainPct, lit("train")).otherwise(lit("test")))

  /** Deterministic k-per-group sample: rows ranked by content-hash
    * order within each group (a fixed pseudo-random order), first k
    * kept. Reproducible alternative to per-group reservoir sampling.
    */
  def samplePerGroup(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(PortableHash.hash32(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
