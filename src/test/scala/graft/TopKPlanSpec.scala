package graft

import graft.plans.{TopK, TopKPerGroupExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator plan (q81): logical node → strategy →
  * two-stage physical top-k-per-group.
  */
class TopKPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    .select($"user_id", $"event_id", $"value")

  test("perGroup matches the window row_number encoding exactly") {
    val custom = TopK.perGroup(events, Seq($"user_id"),
        Seq($"value".desc, $"event_id".asc), k = 3)
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    val windowed = events.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .as[(Long, Long, Double)].collect().toSet
    assert(custom == windowed && custom.nonEmpty)
  }

  test("physical plan is partial + final TopKPerGroupExec around one exchange") {
    val df = TopK.perGroup(events, Seq($"user_id"), Seq($"value".desc), k = 2)
    // sparkPlan (pre-AQE, pre-EnsureRequirements): both stages present
    val execs = df.queryExecution.sparkPlan.collect {
      case e: TopKPerGroupExec => e.finalStage
    }
    assert(execs.sorted == Seq(false, true)) // one partial, one final
    // executedPlan string (AQE wrapper renders the real plan): the
    // required hash exchange sits between the stages, and no sort
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroup"))
    assert(s.contains("Exchange hashpartitioning(user_id"))
    assert(!s.contains("Sort ")) // no per-group full sort anywhere
  }

  test("partial stage caps shuffle rows at k per (partition, group)") {
    // 1 group, 1000 rows over 8 partitions, k=2: the exchange carries
    // at most 16 rows instead of 1000
    val df = (1 to 1000).map(i => (1L, i.toLong)).toDF("g", "v").repartition(8)
    val top = TopK.perGroup(df, Seq($"g"), Seq($"v".desc), k = 2)
    assert(top.as[(Long, Long)].collect().toSet == Set((1L, 1000L), (1L, 999L)))
    val partialOut = top.queryExecution.sparkPlan.collect {
      case e: TopKPerGroupExec if !e.finalStage => e
    }.head.execute().count()
    assert(partialOut <= 16)
  }

  test("k larger than every group passes all rows through") {
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
    val top = TopK.perGroup(df, Seq($"g"), Seq($"v".asc), k = 100)
    assert(top.as[(Long, Long)].collect().toSet == Set((1L, 10L), (1L, 20L), (2L, 5L)))
  }

  test("k < 1 is rejected at construction, not deep inside a task") {
    val df = Seq((1L, 10L)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq($"g"), Seq($"v".asc), k = 0)
    }
    assert(e.getMessage.contains("k >= 1"))
  }

  test("column binding follows the session resolver (case-insensitive by default)") {
    val df = Seq((1L, 10L), (1L, 20L)).toDF("g", "v")
    assert(!spark.sessionState.conf.caseSensitiveAnalysis)
    val top = TopK.perGroup(df, Seq(col("G")), Seq(col("V").asc), k = 1)
    assert(top.as[(Long, Long)].collect().toSeq == Seq((1L, 10L)))
  }
}
