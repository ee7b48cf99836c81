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

  /** LEAKAGE-FREE split: hash the near-dup CLUSTER id, not the doc id,
    * so every member of a duplicate family lands in the same split.
    * Per-doc splitting silently leaks eval data — a test document's
    * near-copy (mirror, paraphrase, boilerplate variant) trains the
    * model on the answer; at crawl scale this is the norm, not the
    * edge case, which is why real pretraining stacks split AFTER
    * clustering. `pairs` is any near-dup pair frame (jaccard, minhash,
    * simhash tiers all qualify); docs outside every pair are their own
    * singleton cluster. Same one-column hash determinism as
    * [[trainTestSplit]]: re-runs reproduce the split exactly.
    * Output: (doc_id, cluster_id, split) ordered by doc_id.
    */
  def leakFreeSplit(docs: DataFrame, pairs: DataFrame, trainPct: Int): DataFrame = {
    val labels = graft.operators.Dedup.duplicateClusters(pairs)
    docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(hashBucket(col("cluster_id")) < trainPct, lit("train"))
          .otherwise(lit("test")))
      .orderBy(col("doc_id"))
  }

  /** Temperature-scaled mixture subsample: group g keeps a
    * deterministic hash slice of its rows sized so group shares follow
    * `n_g^alpha` (alpha < 1 flattens the mixture toward uniform — the
    * multilingual-pretraining rebalancing rule), with the total draw
    * targeting `targetFrac` of the corpus. Rates are quantized to
    * integer percent so the keep decision is an exact integer compare
    * in any engine (no float-boundary flakiness), and capped at 100
    * (a filter cannot upsample; document groups needing >1× get rate
    * 100).
    *
    * Scale shape: group counts are one map-side-combinable shuffle
    * over a handful of groups; the resulting rate table is a few rows,
    * so AQE broadcasts it back onto the corpus and the keep filter is
    * a codegen'd hash-compare — the corpus itself never shuffles.
    * Output: input columns + rate_pct, kept rows only.
    */
  def temperatureMixture(df: DataFrame, groupCol: String, keyCol: String,
                         alpha: Double, targetFrac: Double): DataFrame = {
    // null-group rows are EXCLUDED up front (declared in the q73
    // oracle the same way): they could never survive the null-unsafe
    // rate join below anyway, but counted in the totals they would
    // inflate pow_total and silently deflate every real group's rate
    val nonNull = df.filter(col(groupCol).isNotNull)
    val counts = nonNull.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
    val totals = counts.agg(
      sum(col("n_g")).as("n_total"),
      sum(pow(col("n_g").cast("double"), lit(alpha))).as("pow_total"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(groupCol),
        least(lit(100L), floor(
          lit(100.0 * targetFrac) * col("n_total")
            * pow(col("n_g").cast("double"), lit(alpha))
            / (col("pow_total") * col("n_g")) + lit(0.5)).cast("long"))
          .as("rate_pct"))
    nonNull.join(broadcast(rates), Seq(groupCol))
      .filter(hashBucket(col(keyCol).cast("string")) < col("rate_pct"))
  }

  /** Weighted deterministic sample: each row survives with probability
    * `weightCol` (a double in [0,1] — e.g. a quality score), decided
    * by its hash bucket against the integer-percent-quantized weight.
    * The reproducible form of "sample proportional to quality": a row
    * keeps or loses its slot for life, under any partitioning, retry,
    * or engine. Pure codegen filter — no shuffle at all.
    * Output: input columns + rate_pct, kept rows only.
    */
  def weightedSample(df: DataFrame, weightCol: String, keyCol: String): DataFrame =
    df.withColumn("rate_pct",
        floor(col(weightCol) * 100.0 + lit(0.5)).cast("long"))
      .filter(hashBucket(col(keyCol).cast("string")) < col("rate_pct"))

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

  /** Deterministic sharded epoch shuffle: the training-order
    * materializer. Each row gets a seed-keyed hash; the hash's modulus
    * picks one of `nShards` output shards and its value orders rows
    * WITHIN the shard. Changing the seed string ("epoch0", "epoch1",
    * …) produces an independent permutation, and any engine — or a
    * retried task — reproduces the identical order, which `rand()`
    * cannot promise.
    *
    * Scale shape: a global `row_number` would funnel 100 TB through
    * one window partition; sharding makes every window partition a
    * shard (nShards in the tens of thousands at real scale, so each
    * shard is a bounded trainer-file-sized slice), i.e. one hash-
    * partitioned exchange and fully parallel sorts — the same layout
    * trainers consume (one file per shard, read in shard_pos order).
    * Output: input keyCol + (shard, shard_pos), ordered by (shard, shard_pos).
    */
  def epochShuffle(df: DataFrame, keyCol: String, seed: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val h = PortableHash.hash32(concat_ws(":", lit(seed), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    df.select(col(keyCol), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("shard_pos"), col(keyCol))
      .orderBy(col("shard"), col("shard_pos"))
  }
}
