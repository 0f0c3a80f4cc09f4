package graft
import org.apache.spark.sql.SparkSession
object ExtProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT int_hash_64(42L) ih, sip_hash_64('hello') sh, char_ngrams('abcd', 2) ng, minhash_signature('a b c d e', 4, 3) mh").show(false)
    spark.stop()
  }
}
