package graft

import graft.plans.RewriteHofDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-rule surface: the HOF dot-product pattern rewrites to the
  * native graft_dot/graft_dotl kernels with identical results.
  */
class PlanRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (p, q) -> p * q), 0D, (acc, z) -> acc + z)"

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDot
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDot)
  }

  // plan-content assertions need a non-local source: ConvertToLocal-
  // Relation pre-evaluates literal frames before user rules ever run
  private def embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    .withColumn("b", reverse($"a"))

  private val df = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(0.5, -1.0, 2.0), Array(2.0, 2.0, 2.0))).toDF("a", "b")

  test("double HOF dot rewrites to graft_dot and result is unchanged") {
    withRule {
      val q = embs.select(expr(hofDot).as("dot"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.select(expr(hofDot).as("dot")).as[Double].collect().toSeq == Seq(32.0, 3.0))
    }
    // without the rule the plan keeps the interpreted HOF form
    val plain = embs.select(expr(hofDot).as("dot"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("long HOF dot rewrites to graft_dotl") {
    val hofDotL = "aggregate(zip_with(qa, qb, (p, q) -> p * q), 0L, (acc, z) -> acc + z)"
    val ql = embs.select(
      expr("transform(a, x -> cast(floor(x * 127D) as bigint))").as("qa"),
      expr("transform(b, x -> cast(floor(x * 127D) as bigint))").as("qb"))
    withRule {
      val q = ql.select(expr(hofDotL).as("dot"))
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_dotl"))
      val dl = Seq((Array(2L, 3L), Array(10L, 100L))).toDF("qa", "qb")
      assert(dl.select(expr(hofDotL).as("dot")).as[Long].collect().toSeq == Seq(320L))
    }
  }

  test("non-dot aggregates are left alone") {
    withRule {
      // plain sum-aggregate (no zip_with product): must not rewrite
      val q1 = df.select(expr("aggregate(a, 0D, (acc, z) -> acc + z)").as("s"))
      assert(!q1.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(q1.as[Double].collect().toSeq == Seq(6.0, 1.5))
      // zip_with with a non-product lambda: must not rewrite
      val q2 = df.select(
        expr("aggregate(zip_with(a, b, (p, q) -> p + q), 0D, (acc, z) -> acc + z)").as("s"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(q2.as[Double].collect().toSeq == Seq(21.0, 7.5))
    }
  }

  test("rewritten kernel agrees with the HOF form on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
      .withColumn("b", reverse($"a"))
    val hof = e.select($"vec_id", expr(hofDot).as("dot")).orderBy($"vec_id")
    val plainRows = hof.as[(Long, Double)].collect().toSeq
    val rewrittenRows = withRule {
      hof.as[(Long, Double)].collect().toSeq
    }
    assert(plainRows == rewrittenRows) // bit-identical sequential fold
  }
}
