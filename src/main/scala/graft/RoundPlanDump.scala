package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dump the formatted plan of ONE connectedComponentsStar round (the
  * per-round localCheckpoint hides it from the full gate's explain) —
  * the plans/r16 before/after evidence for the exchange-sharing change. */
object RoundPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = spark.range(100).select(
      (col("id") + 1).as("a"), (col("id") / 2).cast("long").as("b"))
      .filter(col("a") > col("b"))
    val df = graft.ops.Dedup.starRound(pairs)
    println(df.queryExecution
      .explainString(ExplainMode.fromString("formatted")))
    // the sharing claim lives in the RUNTIME adaptive plan (equal
    // canonical exchanges collapse into one materialized
    // ShuffleQueryStage; the copies surface as ReusedExchange), so
    // execute and print the final plan too
    df.collect()
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec =>
        println("========= EXECUTED ADAPTIVE PLAN =========")
        println(a.executedPlan.treeString)
      case p => println(p.treeString)
    }
    spark.stop()
  }
}
