package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - [[cosineTopK]]   — brute-force cosine top-k: the correctness
  *                      baseline. Query side is broadcast; candidate
  *                      side streams, so at 100 TB this is one scan of
  *                      the corpus per query batch, no shuffle.
  * - [[topPairs]]     — highest-cosine pairs corpus-wide (near-dup
  *                      ranking view of the same kernel).
  * - [[signLshBuckets]] / [[cosineTopKLsh]] — random-hyperplane sign-LSH:
  *                      the scale path. Hyperplane coefficients derive
  *                      from the portable hash (no RNG state to ship);
  *                      vectors sharing a bucket are compared exactly.
  *
  * All kernels cast float→double before arithmetic and fold
  * sequentially (functions.aggregate), so the result is a deterministic
  * double reproducible by the DuckDB oracle.
  */
object Similarity {

  /** cosine(qv, v) as a SQL expression over two array<double> columns. */
  private def cosExpr(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  private def asDouble(df: DataFrame): DataFrame =
    df.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  /** Top-k nearest neighbours (cosine) for vec_id < nQueries.
    * Output: (qid, rnk, nid, cosine) ordered by (qid, rnk).
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val e = asDouble(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), expr(cosExpr("qv", "v")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Top-n most similar pairs corpus-wide (vec_a < vec_b).
    * Output: (rnk, vec_a, vec_b, cosine) ordered by rnk.
    */
  def topPairs(embeddings: DataFrame, n: Int): DataFrame = {
    val e = asDouble(embeddings)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr(cosExpr("a.v", "b.v")).as("cosine"))
    pairs
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))))
      .filter(col("rnk") <= n)
      .select(col("rnk").cast("long").as("rnk"), col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("rnk"))
  }

  /** Sign-LSH bucket id per vector: `planes` random hyperplanes, bit p
    * set iff dot(v, c_p) > 0. Coefficients c_p[d] are derived from
    * hash32("p_d") mapped to [-0.5, 0.5) — deterministic, no RNG.
    */
  def signLshBuckets(embeddings: DataFrame, planes: Int): DataFrame = {
    val e = asDouble(embeddings)
    // coefficient expression for plane p, dim d (0-based): portable hash -> [-0.5, 0.5)
    def coef(p: Int, d: String) =
      s"(CAST(conv(substring(md5(concat('$p', '_', CAST($d AS STRING))),1,8),16,10) AS BIGINT) % 1000) / 1000.0 - 0.5"
    val bitExprs = (0 until planes).map { p =>
      val dot = s"aggregate(zip_with(v, transform(sequence(0, size(v)-1), d -> ${coef(p, "d")}), (x, c) -> x * c), CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
      s"CASE WHEN $dot > 0 THEN shiftleft(CAST(1 AS BIGINT), $p) ELSE CAST(0 AS BIGINT) END"
    }
    e.select(col("vec_id"), col("v"), expr(bitExprs.mkString("(", " + ", ")")).as("bucket"))
  }

  /** LSH-accelerated top-k: exact cosine computed only against vectors
    * in the query's bucket. Recall < 1 by construction; the 100 TB
    * trade. Output: (qid, rnk, nid, cosine) ordered by (qid, rnk).
    */
  def cosineTopKLsh(embeddings: DataFrame, nQueries: Int, k: Int, planes: Int): DataFrame = {
    val b = signLshBuckets(embeddings, planes)
    val q = b.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
    val scored = b.join(broadcast(q), col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), expr(cosExpr("qv", "v")).as("cosine"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"), col("nid"), col("cosine"))
      .orderBy(col("qid"), col("rnk"))
  }
}
