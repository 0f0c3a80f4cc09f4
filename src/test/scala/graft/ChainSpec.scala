package graft

import org.apache.spark.sql.functions._
import graft.core.{Chain, Sys}
import graft.schema.SignalSchema

case class Person(first_name: String, age: Long, city: String)

/** Per-operator tests mirroring the reference's unit expectations
  * (reference: tests/unit/lib/test_datachain.py DF_DATA fixtures). */
class ChainSpec extends SparkSpec {
  import spark.implicits._

  private def people = Chain.readValues(spark, Seq(
    Person("Alice", 25, "NYC"), Person("Bob", 30, "LA"),
    Person("Charlie", 35, "NYC"), Person("David", 40, "SF"),
    Person("Eva", 28, "LA")))

  test("toRecords / toValues consumption surface") {
    import spark.implicits._
    val c = Chain(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(c.toRecords() === Seq(Map("id" -> 1L, "v" -> "a"),
      Map("id" -> 2L, "v" -> "b")))
    assert(c.toValues("v") === Seq("a", "b"))
  }

  test("select / select_except / mutate / rename") {
    assert(people.select("first_name", "age").toDF.columns.toSeq ===
      Seq("first_name", "age"))
    assert(people.selectExcept("city").toDF.columns.toSeq ===
      Seq("first_name", "age"))
    val m = people.mutate("age2" -> (col("age") * 2)).toDF
    assert(m.filter(col("first_name") === "Alice").select("age2")
      .as[Long].head() === 50)
    assert(people.rename("city", "town").toDF.columns.contains("town"))
  }

  test("select_except drops nested struct fields by dotted path") {
    val nested = Chain(people.toDF.select(
      struct(col("first_name").as("name"), col("city").as("loc")).as("who"),
      col("age")))
    val out = nested.selectExcept("who.loc", "age")
    assert(out.toDF.columns.toSeq === Seq("who"))
    assert(out.schema("who").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq === Seq("name"))
  }

  test("column DSL: C(), glob, regexp, in_") {
    import graft.dsl._
    val files = Chain.readValues(spark, Seq(
      Person("cats/cat1.jpg", 1, "x"), Person("dogs/d/deep.jpg", 2, "x"),
      Person("cats/readme.txt", 3, "x")))
    assert(files.filter(C("first_name").glob("cats/*.jpg")).count() === 1)
    assert(files.filter(C("first_name").glob("**.jpg")).count() === 2)
    assert(files.filter(C("first_name").regexp("\\.txt$")).count() === 1)
    assert(files.filter(C("age").in_(1, 3)).count() === 2)
  }

  test("filter merges predicates (AND)") {
    val f = people.filter(col("age") > 26, col("city") === "LA").toDF
    assert(f.select("first_name").as[String].collect().toSet === Set("Bob", "Eva"))
  }

  test("order_by / limit / offset") {
    val names = people.orderBy(col("age").desc).limit(2).toDF
      .select("first_name").as[String].collect().toSeq
    assert(names === Seq("David", "Charlie"))
    val off = people.orderBy(col("age").asc).offset(3).limit(2).toDF
      .select("first_name").as[String].collect().toSeq
    assert(off === Seq("Charlie", "David"))
  }

  test("distinct_on keeps one row per key") {
    val d = people.distinctOn("city").toDF
    assert(d.count() === 3)
  }

  test("union validates schemas and lists missing columns") {
    val u = people.union(people)
    assert(u.count() === 10)
    val bad = people.select("first_name", "age")
    val err = intercept[IllegalArgumentException](people.union(bad))
    assert(err.getMessage.contains("city"))
  }

  test("subtract is a null-safe anti-join") {
    val other = Chain.readValues(spark, Seq(
      Person("Alice", 0, ""), Person("Eva", 0, "")))
    val left = people.subtract(other, on = Seq("first_name"))
    assert(left.toDF.select("first_name").as[String].collect().toSet ===
      Set("Bob", "Charlie", "David"))
  }

  test("semiJoin is null-safe: NULL keys match NULL keys") {
    val withNull = Chain(people.toDF
      .withColumn("first_name",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("first_name") === "Alice",
          org.apache.spark.sql.functions.lit(null: String))
          .otherwise(org.apache.spark.sql.functions.col("first_name"))))
    val probe = Chain.readValues(spark, Seq(Person(null, 0, ""), Person("Bob", 0, "")))
    val hit = withNull.semiJoin(probe, on = Seq("first_name"))
    // <=> matches the NULL-keyed row (Alice's) as well as Bob's
    assert(hit.count() === 2)
    assert(hit.toDF.select("age").as[Long].collect().toSet ===
      people.toDF.filter("first_name in ('Alice','Bob')")
        .select("age").as[Long].collect().toSet)
  }

  test("merge: left default, collision rname, full outer") {
    val teams = Chain.readValues(spark, Seq(
      Person("Alice", 99, "team-x"), Person("Zed", 1, "team-y")))
    // collision on age & city → right side renamed with prefix
    val j = people.merge(teams, on = Seq("first_name"))
    val cols = j.toDF.columns.toSeq
    assert(cols.contains("right_age") && cols.contains("right_city"))
    assert(j.count() === 5) // left outer keeps all left rows
    val full = people.merge(teams, on = Seq("first_name"), how = "full_outer")
    assert(full.count() === 6)
    val inner = people.merge(teams, on = Seq("first_name"), how = "inner")
    assert(inner.count() === 1)
  }

  test("merge root mapping avoids cascading collisions") {
    val m = SignalSchema.mergeRootMapping(
      Seq("a", "right_a"), Seq("a", "b"), "right_")
    assert(m("a") === "right_right_a")
    assert(m("b") === "b")
  }

  test("merge rename never lands on a live right column") {
    // right already HAS right_name (non-colliding): the rename of the
    // colliding `name` must escalate past it, not duplicate it
    val l = Seq((1L, "l")).toDF("id", "name")
    val r = Seq((1L, "r", "rn")).toDF("id", "name", "right_name")
    val m = Chain(l).merge(Chain(r), on = Seq("id")).toDF
    assert(m.columns.count(_ == "right_name") === 1, m.columns.toSeq)
    assert(m.columns.contains("right_right_name"), m.columns.toSeq)
    assert(m.select("right_right_name").head().getString(0) === "r")
    assert(m.select("right_name").head().getString(0) === "rn")
    // mapping-level guarantee for the other arms: a non-colliding right
    // root claims its name FIRST, so the rename can't take it
    val mp = SignalSchema.mergeRootMapping(
      Seq("id", "name"), Seq("name", "right_name"), "right_")
    assert(mp("name") === "right_right_name" && mp("right_name") === "right_name")
  }

  test("diff classifies unmatched all-null-key rows as A/D, not M/S") {
    val dl = Seq((Option(1L), "x"), (Option.empty[Long], "y")).toDF("k", "v")
    val dr = Seq((Option(1L), "x")).toDF("k", "v")
    val d = Chain(dl).diff(Chain(dr), on = Seq("k"),
      statusCol = Some("st")).toDF
    assert(d.filter(col("k").isNull).select("st").head().getString(0)
      === "A", d.collect().toSeq)
    // and symmetric: right-only all-null-key row reads as D
    val d2 = Chain(dr).diff(Chain(dl), on = Seq("k"),
      statusCol = Some("st")).toDF
    assert(d2.filter(col("k").isNull).select("st").head().getString(0)
      === "D", d2.collect().toSeq)
    // matching all-null keys still pair up null-safely (S)
    val d3 = Chain(dl).diff(Chain(dl), on = Seq("k"), statusCol = Some("st"))
      .toDF
    assert(d3.filter(col("k").isNull).select("st").head().getString(0)
      === "S")
  }

  test("group_by with nested-free keys and aggregates") {
    val g = people.groupByAgg(Seq("city"),
      "n" -> count(lit(1)), "avg_age" -> avg(col("age")))
    val nyc = g.toDF.filter(col("city") === "NYC").head()
    assert(nyc.getAs[Long]("n") === 2)
    assert(nyc.getAs[Double]("avg_age") === 30.0)
  }

  test("group_by on a complex signal expands leaves and re-packs partials") {
    val nested = Chain(people.toDF.select(
      struct(col("city").as("name"),
        struct(col("city").substr(0, 1).as("initial")).as("geo")).as("place"),
      col("age")))
    val g = nested.groupByAgg(Seq("place"),
      "n" -> count(lit(1)), "max_age" -> max(col("age")))
    // the struct key survives as a (nested) struct column
    val schema = g.toDF.schema
    assert(schema("place").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
    val rows = g.toDF
      .select(col("place.name"), col("place.geo.initial"), col("n"), col("max_age"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(rows === Set(("NYC", "N", 2L, 35L), ("LA", "L", 2L, 30L),
      ("SF", "S", 1L, 40L)))
  }

  test("diff statuses A/D/M/S") {
    val oldV = Chain.readValues(spark, Seq(
      Person("Alice", 25, "NYC"), Person("Bob", 30, "LA"),
      Person("Gone", 1, "X")))
    val newV = Chain.readValues(spark, Seq(
      Person("Alice", 26, "NYC"),   // modified
      Person("Bob", 30, "LA"),      // same
      Person("New", 5, "Y")))       // added
    val d = newV.diff(oldV, on = Seq("first_name"), compare = Seq("age"),
      statusCol = Some("status"))
    val statuses = d.toDF.select("first_name", "status").as[(String, String)]
      .collect().toMap
    assert(statuses === Map("Alice" -> "M", "Bob" -> "S", "New" -> "A",
      "Gone" -> "D"))
    // deleted row carries the right side's values
    val gone = d.toDF.filter(col("first_name") === "Gone").head()
    assert(gone.getAs[Long]("age") === 1)
  }

  test("chunk partitions the row set deterministically and completely") {
    val c = Chain(spark.read.parquet(s"$sf/orders.parquet"))
    val total = c.count()
    val chunks = (0 until 4).map(i => c.chunk(i, 4).count())
    assert(chunks.sum === total)
    // deterministic: same chunk twice → same rows
    val a = c.chunk(0, 4).toDF.select("o_orderkey").as[Long].collect().toSet
    val b = c.chunk(0, 4).toDF.select("o_orderkey").as[Long].collect().toSet
    assert(a === b)
  }

  test("shuffle preserves the row multiset") {
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    val shuffled = c.shuffle(seed = 3)
    assert(shuffled.toDF.drop("sys").collect().toSet ===
      c.toDF.collect().toSet)
  }

  test("typed map / gen / agg UDFs") {
    val mapped = people.mapTyped[Person, Person](p =>
      p.copy(first_name = p.first_name.toUpperCase))
    assert(mapped.toDF.select("first_name").as[String].collect().toSet
      .contains("ALICE"))
    val gen = people.genTyped[Person, (String, Long)](p =>
      Seq((p.first_name, p.age), (p.first_name + "!", p.age + 1)))
    assert(gen.count() === 10)
    val agged = people.aggTyped[Person, String, (String, Long)](_.city) {
      (city, it) => Seq((city, it.map(_.age).max))
    }
    val m = agged.toDF.as[(String, Long)].collect().toMap
    assert(m === Map("NYC" -> 35L, "LA" -> 30L, "SF" -> 40L))
  }

  test("mapTypedSafe captures per-row failures in the error column") {
    val out = people.mapTypedSafe[Person, Person]({ p =>
      if (p.age > 30) throw new IllegalStateException(s"too old: ${p.first_name}")
      p.copy(city = p.city.toLowerCase)
    }).toDF
    assert(out.columns.toSeq ===
      Seq("first_name", "age", "city", "error"))
    assert(out.filter(col("error").isNotNull).count() === 2) // Charlie, David
    assert(out.filter(col("error").isNull).count() === 3)
    assert(out.filter(col("first_name") === "Alice")
      .select("city").as[String].head() === "nyc")
    val err = out.filter(col("error").isNotNull)
      .select("error").as[String].head()
    assert(err.contains("IllegalStateException") && err.contains("too old"))
    // the failed rows feed Delta retryOn: next incremental run re-processes
    // exactly the error-flagged keys
  }

  test("op-tree hash is stable and order-sensitive") {
    val a = people.filter(col("age") > 26).select("first_name")
    val b = people.filter(col("age") > 26).select("first_name")
    val c = people.select("first_name")
    assert(a.hash === b.hash)
    assert(a.hash !== c.hash)
  }

  test("sys stamping is deterministic per materialized data") {
    val df = Sys.stamp(spark.read.parquet(s"$sf/nation.parquet"))
    assert(df.columns.contains("sys"))
    val rands = df.select("sys.rand").as[Long].collect()
    assert(rands.forall(_ >= 0))
  }

  test("flatten / unflatten round-trips nested structs") {
    val nested = people.toDF.select(struct(col("first_name"), col("age")).as("who"),
      col("city"))
    val flat = SignalSchema.flatten(nested)
    assert(flat.columns.toSeq === Seq("who__first_name", "who__age", "city"))
    val back = SignalSchema.unflatten(flat)
    assert(back.schema === nested.schema)
    assert(back.collect().toSet === nested.collect().toSet)
  }
}
