package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev fixture tool (the ScaleProbe/ExtProbe family): synthesize an
  * up-scaled copy of an sf directory by unioning `factor` key-shifted
  * replicas of each table — a TIMING fixture for scaling receipts
  * (s/q vs data size), not an oracle fixture (replicated text skews
  * dedup selectivity; correctness gates stay on the driver's sf dirs).
  * Key columns shift by `replica * span` so joins keep their fan-out;
  * non-key payloads repeat verbatim. Deterministic: no randomness.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-table key columns to shift (everything else repeats verbatim)
    val keyCols: Map[String, Seq[String]] = Map(
      "region" -> Seq("r_regionkey"),
      "nation" -> Seq("n_nationkey"),        // keep n_regionkey (FK fan-out)
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    keyCols.foreach { case (t, keys) =>
      val in = s"$src/$t.parquet"
      if (new java.io.File(in).exists) {
        val df = spark.read.parquet(in)
        val spans: Map[String, Long] = keys.map { k =>
          val r = df.agg(max(col(k)), min(col(k))).head()
          // span = max+1 separates replica ranges ONLY from a
          // non-negative floor: with min < 0, replica r's range
          // [min + r*span, max + r*span] overlaps replica r+1's and
          // shifted keys collide silently — fail loudly instead
          require(r.getAs[Number](1).longValue >= 0L,
            s"ScaleUp: $t.$k has negative values (min " +
              s"${r.getAs[Number](1)}) — the replica shift assumes a " +
              "non-negative key floor; offset the column first")
          k -> (r.getAs[Number](0).longValue + 1L)
        }.toMap
        // overflow guard: the shift casts back to the key's narrow dtype,
        // and under non-ANSI SQL an int/short overflow WRAPS silently —
        // replicas would collide on wrapped keys and corrupt the
        // fixture's join fan-out. Largest shifted value is
        // factor*span - 1 (span = max+1); require it fits, loudly.
        keys.foreach { k =>
          val dtMax: BigInt = df.schema(k).dataType match {
            case org.apache.spark.sql.types.ByteType => BigInt(Byte.MaxValue)
            case org.apache.spark.sql.types.ShortType => BigInt(Short.MaxValue)
            case org.apache.spark.sql.types.IntegerType => BigInt(Int.MaxValue)
            case _ => BigInt(Long.MaxValue)
          }
          val top = BigInt(factor) * spans(k) - 1
          require(top <= dtMax,
            s"ScaleUp: $t.$k at factor $factor tops out at $top, past its " +
              s"${df.schema(k).dataType.simpleString} max $dtMax — keys " +
              "would wrap and collide; widen the column or lower the factor")
        }
        val reps: Seq[DataFrame] = (0 until factor).map { r =>
          keys.foldLeft(df) { (d, k) =>
            val dt = df.schema(k).dataType // shift, keep the exact dtype
            d.withColumn(k, (col(k) + lit(r.toLong * spans(k))).cast(dt))
          }
        }
        reps.reduce(_.unionAll(_))
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
        println(s"[scaleup] $t x$factor done")
      }
    }
    spark.stop()
  }
}
