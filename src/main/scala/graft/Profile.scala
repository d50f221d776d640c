package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run one SparkEntry query and attribute its wall
  * time to the Spark JOBS it launches (multi-action bodies — store
  * builds, funnels — run many jobs whose cost `Explain` can't split).
  * Per job: wall seconds, executor task-time seconds (sum), shuffle
  * bytes written, and the job's call-site description — enough to see
  * which phase of a build dominates and whether it is compute- or
  * shuffle-bound (guide §1/§2). Planning-only gaps (driver time with
  * no job running) show up as the difference between the job-sum and
  * the total.
  *
  * Usage: Profile <queryName> [sfDir]   (defaults sf0.1, CPUS env)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warm-up surface as Bench so the first job isn't JIT noise
    spark.range(1000000L).selectExpr("sum(id)").collect()
    MediaFixtures.ensureFor(spark, sfDir, Seq(name))
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }

    final case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = 0L,
                            var taskTimeMs: Long = 0L,
                            var shuffleWrite: Long = 0L,
                            var input: Long = 0L)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, JobRec]
    val stageToJob = new scala.collection.mutable.HashMap[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(e.jobId) = JobRec(e.jobId, desc, e.time)
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageInfo.stageId); j <- jobs.get(jid)) {
            val m = e.stageInfo.taskMetrics
            if (m != null) {
              j.taskTimeMs += m.executorRunTime
              j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
              j.input += m.inputMetrics.bytesRead
            }
          }
        }
    }

    // one untimed pass (bench's warm-plan discipline for the heavies)
    locally {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count(); df.unpersist(blocking = true)
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val n = df.count()
    val total = (System.nanoTime() - t0) / 1e9
    df.unpersist(blocking = true)
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain

    println(f"== $name rows=$n total=$total%.3f s (warm 2nd run)")
    val recs = jobs.values.toSeq
    val jobSum = recs.map(j => (j.end - j.start) / 1e3).sum
    println(f"jobs=${recs.size} jobWallSum=$jobSum%.3f s driverGap=${total - jobSum}%.3f s")
    recs.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
      println(f"  job=${j.id}%4d wall=${(j.end - j.start) / 1e3}%7.3f s " +
        f"taskSum=${j.taskTimeMs / 1e3}%8.2f s shufW=${j.shuffleWrite / 1e6}%8.1f MB " +
        f"in=${j.input / 1e6}%8.1f MB  ${j.desc.take(110)}")
    }
    spark.stop()
  }
}
