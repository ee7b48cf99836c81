package graft

/** Dev probe (test scope, not shipped): count Spark jobs launched by
  * one catalog query — the measurement behind the loop-query job-wave
  * work (VERDICT r16 item 4: their sf0.1 wall time is dominated by
  * per-micro-batch job-launch constants, so the fix target is the JOB
  * COUNT, not bytes).
  *
  * Usage: sbt "Test/runMain graft.JobCountProbe q184_stream_daily_turn [sfDir]"
  */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCountProbe <queryName>... [sfDir last]")
    val (names, sf) =
      if (args.last.startsWith("/")) (args.init.toSeq, args.last)
      else (args.toSeq, "/root/testdata/sf0.001")
    val spark = SparkTestSession.spark
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val execStart = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()
    val execMs = new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description)
          execStart.put(s.executionId, s.time); ()
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
          Option(execStart.get(s.executionId)).foreach(t0 =>
            execMs.put(s.executionId, s.time - t0)); ()
        case _ => ()
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet()
        // one entry per SQL execution id = one driver-side action; the
        // job-to-execution ratio is AQE stage fan-out
        val site = Option(j.properties).flatMap(p =>
          Option(p.getProperty("spark.sql.execution.id")).map("exec " + _)
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        sites.merge(site, 1, (a, b) => a + b)
        ()
      }
    })
    val showSites = sys.env.get("JOBCOUNT_SITES").exists(_.nonEmpty)
    for (name <- names) {
      counter.set(0)
      sites.clear()
      execDesc.clear()
      execStart.clear()
      execMs.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[jobcount] $name jobs=${counter.get} sec=$sec%.2f")
      if (showSites) {
        import scala.jdk.CollectionConverters._
        val tallies = sites.asScala.toSeq
        val execs = tallies.count(_._1.startsWith("exec "))
        println(s"[jobcount]   $execs sql executions (driver actions); " +
          s"top job fan-outs: " + tallies.sortBy(-_._2).take(5)
            .map { case (s, n) => s"$s=$n" }.mkString(", "))
        // name the heavy executions: the SQLExecutionStart description
        // says WHICH driver action fanned out (AQE stage count) —
        // "exec 33=11" alone doesn't
        tallies.filter(_._1.startsWith("exec ")).sortBy(-_._2).take(5)
          .foreach { case (s, n) =>
            val id = s.stripPrefix("exec ").toLong
            execDesc.asScala.get(id).foreach(d =>
              println(s"[jobcount]     $s ($n jobs): ${d.linesIterator.next().take(140)}"))
          }
        // JOBCOUNT_ALL: every SQL execution in id order with its
        // description — the full action-wave ledger of a loop query
        // (which tier launched each driver action), not just the five
        // biggest AQE fan-outs
        if (sys.env.get("JOBCOUNT_ALL").exists(_.nonEmpty))
          execDesc.asScala.toSeq.sortBy(_._1).foreach { case (id, d) =>
            val jobs = sites.getOrDefault(s"exec $id", 0)
            val ms = execMs.getOrDefault(id, -1L)
            println(s"[jobcount]   exec $id jobs=$jobs ms=$ms ${d.linesIterator.next().take(120)}")
          }
      }
    }
  }
}
