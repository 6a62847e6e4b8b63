package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Repartition
import org.apache.spark.sql.functions._

/** Focused specs for the static (job-free) parallelism probe behind
  * [[Par.spread]]. The round-19 probe asked
  * `queryExecution.toRdd.getNumPartitions`, which under AQE eagerly
  * materializes shuffle stages of exchange-bearing inputs — a real
  * job ran at probe time (ADVICE r19). These tests pin the new
  * contract: same spread decisions, zero jobs.
  */
class ParSpec extends SparkSpec {

  private lazy val singleFileDir: String = {
    val dir = SparkSpec.tmpDir("parspec")
    spark.range(1000).toDF("id")
      .withColumn("s", concat(lit("row-"), col("id")))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def jobsDuring[T](f: => T): (T, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      Thread.sleep(300) // let listener events drain
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private def hasRepartition(df: DataFrame): Boolean =
    df.queryExecution.logical.exists {
      case r: Repartition => r.shuffle
      case _              => false
    }

  test("spread fires on a single-file scan, rows unchanged") {
    val df = spark.read.parquet(singleFileDir)
    val out = Par.spread(df)
    assert(hasRepartition(out), "single-file scan should spread")
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(out.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq === (0L until 1000L))
  }

  test("spread fires through narrow project/filter, not through agg") {
    val df = spark.read.parquet(singleFileDir)
    assert(hasRepartition(Par.spread(df.select("id").where("id > 10"))))
    assert(!hasRepartition(Par.spread(df.groupBy("id").count())))
  }

  test("spread passes an exchange-bearing input through WITHOUT a job") {
    val pre = spark.read.parquet(singleFileDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val (out, jobs) = jobsDuring(Par.spread(pre))
    assert(out eq pre, "already-spread input must pass through")
    assert(jobs === 0,
      s"probe ran $jobs job(s) — must be job-free under AQE")
  }

  test("spread is job-free on a bare scan too") {
    val df = spark.read.parquet(singleFileDir)
    val (out, jobs) = jobsDuring(Par.spread(df))
    assert(hasRepartition(out))
    assert(jobs === 0)
  }

  test("spread passes streaming plans through") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Long]
    val df = ms.toDF()
    assert(Par.spread(df) eq df)
  }

  test("spreadIfLarge skips tiny inputs, spreads large ones") {
    val df = spark.read.parquet(singleFileDir)
    // the written file is well under 1 MB — tiny gate skips
    assert(Par.spreadIfLarge(df) eq df)
    assert(hasRepartition(Par.spreadIfLarge(df, minBytes = 1L)))
  }
}
