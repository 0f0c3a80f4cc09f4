package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for individual SparkEntry queries under the SAME
  * session shape as graft.Bench (local[32], shuffle=32, big codegen cache).
  * For each named query: one untimed warm pass, then a timed pass with a
  * listener recording every job's wall time, stage count and task count —
  * the evidence trail for "where does this gate's time actually go".
  */
object QProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("QPROF_PASSES", "2").toInt

    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L, var tasks: Int = 0) {
      // distinct completed stage ids: a fetch-failure RETRY fires
      // onStageCompleted once per attempt — counting attempts would
      // inflate the stg/tsk evidence columns
      val stageIds = scala.collection.mutable.HashSet.empty[Int]
      def stages: Int = stageIds.size
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    // stageId → jobId, recorded at job start so completed stages (and
    // their task counts) attribute to the right job record (TrieMap: a
    // juc.ConcurrentHashMap[Int, Int] unboxes an absent null to 0 and
    // would silently attribute stray stages to job 0). putIfAbsent: a
    // stage can appear in several jobs' stageIds when result stages are
    // shared — the FIRST job to claim it runs it; a later overwrite
    // would credit its completion to the wrong job.
    val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val stg = e.stageInfos.map(si => si.name.take(40)).mkString(" | ")
        e.stageIds.foreach(sid => stageToJob.putIfAbsent(sid, e.jobId))
        jobs.put(e.jobId, JobRec(e.jobId, d + " :: " + stg.take(160), e.time))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageToJob.get(e.stageInfo.stageId)
          .flatMap(jid => Option(jobs.get(jid)))
          .foreach { r =>
            r.synchronized {
              if (r.stageIds.add(e.stageInfo.stageId))
                r.tasks += e.stageInfo.numTasks
            }
          }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm passes (codegen, caches)
      for (_ <- 1 until passes) {
        try fn(spark, dir).count()
        catch { case e: Throwable =>
          println(s"== $name WARM FAILED: ${e.getMessage}") }
        try {
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        } catch { case _: Throwable => () }
      }
      jobs.clear()
      stageToJob.clear()
      val t0 = System.nanoTime()
      val n = try fn(spark, dir).count()
              catch { case e: Throwable =>
                println(s"== $name FAILED: ${e.getMessage}"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // let listener events drain
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toVector.sortBy(_.id)
      val tot = recs.map(r => (r.end - r.start).max(0L)).sum / 1e3
      println(f"==== $name rows=$n wall=$dt%.3f s, ${recs.size} jobs, " +
        f"job-time sum=$tot%.3f s (gaps = driver work)")
      recs.foreach { r =>
        val ms = (r.end - r.start).max(0L)
        if (ms >= 20)
          println(f"  job ${r.id}%4d ${ms / 1e3}%7.3f s " +
            f"${r.stages}%3d stg ${r.tasks}%5d tsk  ${r.desc.take(200)}")
      }
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
