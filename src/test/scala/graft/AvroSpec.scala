package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.files.AvroIO

/** Avro container round-trips: every mapped type crosses write+read
  * value-faithfully, nulls ride [null,T] unions, multi-file layouts
  * fan out, and unsupported shapes fail loudly. */
class AvroSpec extends SparkSpec {
  import spark.implicits._

  test("typed round-trip: primitives, datetimes, binary, array, map, struct") {
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("name", StringType, true),
      StructField("ok", BooleanType, true),
      StructField("f", FloatType, true),
      StructField("d", DoubleType, true),
      StructField("i", IntegerType, true),
      StructField("bin", BinaryType, true),
      StructField("day", DateType, true),
      StructField("ts", TimestampType, true),
      StructField("tags", ArrayType(StringType, true), true),
      StructField("attrs", MapType(StringType, LongType, true), true),
      StructField("pos", StructType(Seq(
        StructField("x", DoubleType, true),
        StructField("y", DoubleType, false))), true)))
    val rows = Seq(
      Row(1L, "a", true, 1.5f, 2.5, 7, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2020-02-29"),
        java.sql.Timestamp.valueOf("2021-03-04 05:06:07.123456"),
        Seq("x", null, "y"), Map("k" -> 9L), Row(0.5, 1.5)),
      Row(2L, null, null, null, null, null, null, null, null,
        null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro_rt").toString + "/t"
    AvroIO.toAvro(df, dir)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a.length === b.length)
    // binary compares by value, not reference
    a.zip(b).foreach { case (x, y) =>
      (0 until schema.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.sameElements(q))
          case (p, q) => assert(p === q, s"col ${schema(i).name}")
        }
      }
    }
  }

  test("multi-file layout: one container per partition, parallel read") {
    val df = spark.range(1000).select(col("id"),
      concat(lit("n"), col("id")).as("name")).repartition(4)
    val dir = Files.createTempDirectory("avro_mf").toString + "/t"
    AvroIO.toAvro(df, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.length === 4)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.count() === 1000L)
    assert(back.agg(sum("id")).head().getLong(0) === 499500L)
  }

  test("ntz timestamps keep their local-timestamp logical type") {
    val df = Seq(Tuple1(java.time.LocalDateTime.of(2021, 1, 2, 3, 4, 5)))
      .toDF("lts")
    assert(df.schema("lts").dataType === TimestampNTZType)
    val dir = Files.createTempDirectory("avro_ntz").toString + "/t"
    AvroIO.toAvro(df, dir)
    val back = AvroIO.readAvro(spark, dir)
    assert(back.schema("lts").dataType === TimestampNTZType)
    assert(back.head().getAs[java.time.LocalDateTime](0) ===
      java.time.LocalDateTime.of(2021, 1, 2, 3, 4, 5))
  }

  test("loud failures: existing dir, empty glob, unsupported type") {
    val df = Seq((1L, "a")).toDF("id", "n")
    val dir = Files.createTempDirectory("avro_err").toString + "/t"
    AvroIO.toAvro(df, dir)
    intercept[IllegalArgumentException](AvroIO.toAvro(df, dir))
    intercept[IllegalArgumentException](
      AvroIO.readAvro(spark, dir + "_missing"))
    intercept[IllegalArgumentException](AvroIO.toAvro(
      Seq(Tuple1(BigDecimal(1))).toDF("dec"),
      dir + "_dec"))
  }
}
