package graft

import graft.streaming.UserState
import graft.streaming.UserState.{UserEvent, UserProfile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Custom per-user streaming state (flatMapGroupsWithState): profiles
  * accumulate across microbatches and one updated row is emitted per
  * user per batch.
  */
class UserStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** With the 7-day inactivity eviction, the engine schedules a
    * timer-check batch EVERY trigger — `processAllAvailable` can
    * starve behind the continuous batch stream, so tests await the
    * sink contents directly instead.
    */
  private def awaitRows(table: String, n: Int): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (spark.table(table).count() < n) {
      assert(System.nanoTime() < deadline, s"timed out waiting for $n rows in $table")
      Thread.sleep(200)
    }
  }

  test("profiles accumulate across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[UserEvent]
    val query = UserState.profiles(input.toDS())
      .writeStream.format("memory").queryName("graft_profiles")
      .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()

    input.addData(UserEvent(1L, 100L, 2.0), UserEvent(1L, 200L, 3.0), UserEvent(2L, 50L, 1.0))
    awaitRows("graft_profiles", 2)
    input.addData(UserEvent(1L, 300L, 5.0))
    awaitRows("graft_profiles", 3)
    val rows = spark.table("graft_profiles").as[UserProfile].collect()
    query.stop()

    // batch 1 emissions
    assert(rows.contains(UserProfile(1L, 2L, 100L, 200L, 5.0)))
    assert(rows.contains(UserProfile(2L, 1L, 50L, 50L, 1.0)))
    // batch 2: user 1 updated from persisted state
    assert(rows.contains(UserProfile(1L, 3L, 100L, 300L, 10.0)))
    assert(rows.length == 3)
  }

  test("transformWithState (v2 API) produces the identical profile stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // the v2 arbitrary-state API requires the RocksDB provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserEvent]
      val query = graft.streaming.UserStateV2.profiles(input.toDS())
        .writeStream.format("memory").queryName("graft_profiles_v2")
        .outputMode("append").trigger(Trigger.ProcessingTime(100)).start()
      input.addData(UserEvent(1L, 100L, 2.0), UserEvent(1L, 200L, 3.0), UserEvent(2L, 50L, 1.0))
      awaitRows("graft_profiles_v2", 2)
      input.addData(UserEvent(1L, 300L, 5.0))
      awaitRows("graft_profiles_v2", 3)
      val rows = spark.table("graft_profiles_v2").as[UserProfile].collect()
      query.stop()
      assert(rows.toSet == Set(
        UserProfile(1L, 2L, 100L, 200L, 5.0),
        UserProfile(2L, 1L, 50L, 50L, 1.0),
        UserProfile(1L, 3L, 100L, 300L, 10.0)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("graft_dot resolves in SQL after registration; extensions hook applies cleanly") {
    // spark.sql.extensions is a STATIC conf — it cannot be exercised on
    // the suite's shared context, so the deployment wiring is applied
    // directly and the session-registry path is asserted end-to-end.
    new graft.functions.GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    graft.functions.VectorExprs.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }
}
