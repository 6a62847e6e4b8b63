package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job breakdown of one bench query — where a multi-commit /
  * multi-action gate actually spends its wall-clock. Prints every
  * Spark job (duration, description, first stage name) plus the
  * between-jobs driver time, which is where commit IO, planning and
  * manifest work hide.
  *
  * {{{
  * sbt "runMain graft.tools.ProfileQuery /root/testdata/sf0.1 q_ingest_e2e 2"
  * }}}
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <dir> <query> [reps]")
    val dir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = 0L,
                   var desc: String = "", var stages: Int = 0,
                   var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Int]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, e.time,
          desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse(""), stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum)
        jobs.put(e.jobId, j); order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    })

    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // let listener events drain (the bus is private; a short sleep
      // suffices for a profiling tool)
      Thread.sleep(300)
      val js = order.toArray(Array.empty[Integer]).toSeq
        .map(i => jobs.get(i.intValue())).filter(_ != null)
      val jobTime = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"== rep $r: wall=$wall%.2fs jobs=${js.size} " +
        f"in-job=${jobTime}%.2fs driver-gap=${wall - jobTime}%.2fs")
      var prevEnd = -1L
      js.foreach { j =>
        val gap = if (prevEnd < 0) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = math.max(prevEnd, j.end)
        val d = (j.end - j.start) / 1e3
        val desc = j.desc.take(90)
        println(f"  job ${j.id}%4d ${d}%7.3fs gap=${gap}%6.3fs " +
          f"stages=${j.stages}%2d tasks=${j.tasks}%4d  $desc")
      }
      try spark.catalog.clearCache() catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
