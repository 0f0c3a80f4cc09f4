package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // first arg is the data dir; a query name there (invocation without a
    // dir) would silently dump nothing, so validate it is a directory
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    require(new java.io.File(dir).isDirectory,
      s"first arg must be the sf data directory, got: $dir")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"========= $name")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
