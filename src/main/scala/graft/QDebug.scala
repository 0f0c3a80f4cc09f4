package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for debugging individual SparkEntry queries. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        println(s"== $name rows=${df.count()}")
        df.show(5, false)
      } catch {
        case e: Throwable =>
          println(s"== $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
