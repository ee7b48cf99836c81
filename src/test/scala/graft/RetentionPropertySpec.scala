package graft

import graft.operators.{Retention, Sessionize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws for the retention/funnel tier: on arbitrary
  * event feeds (random users, timestamps, types — including same-ts
  * ties and single-event users) the operators must satisfy their
  * algebraic contracts against brute-force recomputation. Fixed seeds
  * so failures reproduce.
  */
class RetentionPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Random feed: n events over ~10 users, ~12 days, 3 types. */
  private def feed(seed: Long, n: Int): DataFrame = {
    val gen = Gen.listOfN(n, for {
      u <- Gen.chooseNum(1L, 10L)
      dayOff <- Gen.chooseNum(0, 11)
      secs <- Gen.chooseNum(0L, 86399L)
      t <- Gen.oneOf("view", "click", "purchase")
      v <- Gen.chooseNum(1, 9999)
    } yield (u, dayOff, secs, t, v / 100.0))
    sample(gen, seed).zipWithIndex.map { case ((u, d, sec, t, v), i) =>
      (i.toLong, f"2024-01-${d + 1}%02d", sec, u, t, v)
    }.toDF("event_id", "day", "secs", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"day") + expr("make_interval(0,0,0,0,0,0,secs)"))
      .drop("day", "secs")
  }

  test("rollingActiveUsers equals brute-force windowed distinct on random feeds") {
    for (seed <- 1L to 8L) {
      val e = feed(seed, 400)
      val pairs = e.select(to_date($"ts").as("day"), $"user_id").distinct()
        .as[(java.sql.Date, Long)].collect().toSeq
      val days = pairs.map(_._1).distinct.sorted(Ordering.by((d: java.sql.Date) => d.getTime))
      val expected = days.map { d =>
        val win = pairs.filter { case (p, _) =>
          !p.after(d) && p.toLocalDate.plusDays(6).compareTo(d.toLocalDate) >= 0 }
        val dau = pairs.count(_._1 == d).toLong
        val wau = win.map(_._2).distinct.size.toLong
        (d.toString, dau, wau, dau * 10000L / wau)
      }
      val got = Retention.rollingActiveUsers(e, 7)
        .select($"day".cast("string"), $"dau", $"wau", $"stickiness_bp")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got === expected, s"seed=$seed")
    }
  }

  test("rolling cent-CDF quantiles equal brute-force windowed rank-picks on random feeds") {
    for (seed <- 1L to 6L) {
      val e = feed(seed, 300)
      val got = operators.Profile.rollingQuantilesFromPartials(
          operators.Profile.dailyCentCounts(e, "purchase", "value"),
          windowDays = 7, percents = Seq(50, 90))
        .select($"day".cast("string"), $"p", $"q_cents")
        .as[(String, Long, Long)].collect().toSeq
      val cents = e.filter($"event_type" === "purchase" && $"value".isNotNull)
        .select(to_date($"ts").cast("string"),
          expr("cast(floor(value * 100.0D + 0.5D) as bigint)"))
        .as[(String, Long)].collect().toSeq
      val expected = cents.map(_._1).distinct.sorted.flatMap { d =>
        val lo = java.time.LocalDate.parse(d).minusDays(6).toString
        val xs = cents.collect { case (cd, c) if cd >= lo && cd <= d => c }.sorted
        Seq(50L, 90L).map(p => (d, p, xs(math.ceil(p * xs.length / 100.0).toInt - 1)))
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("KMV rolling estimate: n_kept<k days are exact on random feeds") {
    for (seed <- 1L to 4L) {
      val e = feed(seed, 300)
      val est = Retention.rollingWauKmvEstimate(e, 7, 64)
      val exact = Retention.rollingActiveUsers(e, 7).select($"day", $"wau")
      // 10 users max -> always under k=64 -> sketch IS the distinct set
      val joined = est.join(exact, Seq("day"))
      assert(joined.filter($"approx_wau" =!= $"wau".cast("double")).isEmpty, s"seed=$seed")
    }
  }

  test("sessionFunnel counts are monotone and bounded by total sessions on random feeds") {
    for (seed <- 1L to 8L) {
      val e = feed(seed, 300)
      val sessions = Sessionize.assignSessions(e, 45)
        .select($"user_id", $"session_id").distinct().count()
      val rows = Sessionize.sessionFunnel(e, 45, Seq("view", "click", "purchase"))
        .as[(Long, String, Long, Long)].collect().toSeq
      val counts = rows.map(_._3)
      assert(counts === counts.sorted.reverse, s"seed=$seed")
      assert(counts.head <= sessions, s"seed=$seed")
      assert(rows.forall(_._4 <= 10000L), s"seed=$seed")
    }
  }

  test("transitionMatrix edge count equals event count; row probabilities bounded") {
    for (seed <- 1L to 8L) {
      val e = feed(seed, 300)
      val m = Sessionize.transitionMatrix(e, 45)
      assert(m.agg(sum($"n")).as[Long].head() === 300L, s"seed=$seed")
      val rowSums = m.groupBy($"from_type").agg(sum($"n").as("t"))
      val evCounts = e.groupBy($"event_type".as("from_type")).agg(count(lit(1)).as("c"))
      // every event emits exactly one outgoing edge
      assert(rowSums.join(evCounts, Seq("from_type"))
        .filter($"t" =!= $"c").isEmpty, s"seed=$seed")
    }
  }

  test("cohortRetention: n_active never exceeds cohort_size; offsets bounded by grid") {
    for (seed <- 1L to 8L) {
      val e = feed(seed, 300)
      val m = Retention.cohortRetention(e, 7)
      assert(m.filter($"n_active" > $"cohort_size").isEmpty, s"seed=$seed")
      // 12-day grid, 7-day buckets -> offsets in {0, 1}
      assert(m.filter($"week_offset" > 1 || $"week_offset" < 0).isEmpty, s"seed=$seed")
    }
  }
}
