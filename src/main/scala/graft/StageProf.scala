package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Stage-level profiler (QProf's finer-grained sibling): runs ONE named
  * query through the noop sink and prints, per completed stage, wall
  * time, task count, input/shuffle bytes, and total executor run / GC /
  * CPU time. Usage: StageProf <sf_dir> <query>. The CPU column is what
  * exposed value-dependent expression costs (e.g. the decimal zero-sum
  * slow path found in r17's PPR investigation) that job-level
  * profiling attributes to the wrong place. */
object StageProf {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: StageProf <sf_dir> <query>  (env GRAFT_STAGEPROF_WARM=1 " +
        "runs the query once unprofiled first)")
    require(new java.io.File(args(0)).isDirectory,
      s"first arg must be the sf data directory, got: ${args(0)}")
    val q = args(1)
    require(SparkEntry.queries.contains(q),
      s"unknown query '$q' — see SparkEntry.queries")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.registerAll(spark)
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        println(f"STAGE ${si.stageId}%4d ${ms/1e3}%8.3f s ${si.numTasks}%4d tsk " +
          f"in=${m.inputMetrics.bytesRead/1e6}%8.1f MB sh_r=${m.shuffleReadMetrics.totalBytesRead/1e6}%8.1f MB " +
          f"sh_w=${m.shuffleWriteMetrics.bytesWritten/1e6}%8.1f MB " +
          f"run=${m.executorRunTime/1e3}%7.2f gc=${m.jvmGCTime/1e3}%6.2f " +
          f"cpu=${m.executorCpuTime/1e9}%7.2f  ${si.name.take(80)}")
      }
    }
    val fn = SparkEntry.queries(q)
    // GRAFT_STAGEPROF_WARM=1: run the query once BEFORE attaching the
    // listener, so the profiled pass measures steady state (cold runs
    // are dominated by codegen-compile lock contention — tasks show
    // multi-second run times at near-zero CPU)
    if (sys.env.contains("GRAFT_STAGEPROF_WARM"))
      fn(spark, args(0)).write.format("noop").mode("overwrite").save()
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, args(0)).write.format("noop").mode("overwrite").save()
    println(f"WALL ${(System.nanoTime()-t0)/1e9}%.3f s")
    Thread.sleep(500)
  }
}
