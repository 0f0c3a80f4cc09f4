package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.core.Chain
import graft.delta.{MatView, MvAgg}

/** Incremental materialized views: additive and recompute maintenance,
  * group birth/death, null-sum semantics, no-op refresh, vacuumed-cursor
  * rebuild. Every refresh result is checked against a from-scratch
  * groupBy over the source's current rows. */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** The view read must equal a fresh groupBy over the CURRENT source. */
  private def assertMatches(cat: Catalog, mv: String, src: String): Unit = {
    val cur = graft.core.Sys.drop(cat.readDataset(src).toDF)
    val expect = cur.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("chars"),
      avg(col("n_chars")).as("avg_chars"))
    val got = MatView.read(cat, mv).toDF
      .select(col("lang"), col("n_docs"), col("chars"),
        col("avg_chars"))
    val diff = got.except(
        expect.select(col("lang"), col("n_docs").cast("long"),
          col("chars").cast("long"), col("avg_chars")))
      .union(expect.select(col("lang"), col("n_docs").cast("long"),
          col("chars").cast("long"), col("avg_chars")).except(got))
    assert(diff.isEmpty, s"view drifted from source groupBy")
  }

  test("additive view: create, mutate, refresh equals recompute") {
    val root = Files.createTempDirectory("mv_add").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs()), "d")
    MatView.create(cat, "d_by_lang", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n_docs", "count", "*"), MvAgg("chars", "sum", "n_chars"),
        MvAgg("avg_chars", "avg", "n_chars")))
    assertMatches(cat, "d_by_lang", "d")

    // in-sync refresh is a no-op and writes nothing
    val vs0 = cat.versions("d_by_lang")
    val r0 = MatView.refresh(cat, "d_by_lang")
    assert(r0.mode === "noop" && cat.versions("d_by_lang") === vs0)

    // delete + update + insert (incl. brand-new groups), one refresh
    cat.deleteWhere("d", col("doc_id") % 7 === 0)
    cat.updateWhere("d", col("doc_id") % 5 === 0,
      Map("n_chars" -> (col("n_chars") + lit(1000L))))
    val ins = docs().filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("x_"), col("lang")).as("lang"), col("source"),
        col("n_chars"))
    cat.mergeInto("d", ins, Seq("doc_id"))
    val r1 = MatView.refresh(cat, "d_by_lang")
    assert(r1.mode === "additive")
    assert(r1.dirtyGroups > 0 && r1.upserted > 0)
    assertMatches(cat, "d_by_lang", "d")

    // kill one whole group: its view row must disappear
    cat.deleteWhere("d", col("lang") === "en")
    val r2 = MatView.refresh(cat, "d_by_lang")
    assert(r2.deleted >= 1L)
    assert(MatView.read(cat, "d_by_lang").toDF
      .filter(col("lang") === "en").isEmpty)
    assertMatches(cat, "d_by_lang", "d")
    assert(MatView.refresh(cat, "d_by_lang").mode === "noop")
  }

  test("sum over an all-null group reads NULL, not 0") {
    val root = Files.createTempDirectory("mv_null").toString
    val cat = new Catalog(root, spark)
    val src = Seq((1L, "a", Some(10L)), (2L, "a", Some(20L)),
      (3L, "b", None), (4L, "b", None))
      .toDF("id", "g", "x")
    cat.save(Chain(src), "t")
    MatView.create(cat, "t_mv", "t", Seq("id"), Seq("g"),
      Seq(MvAgg("sx", "sum", "x"), MvAgg("ax", "avg", "x"),
        MvAgg("nx", "count", "x")))
    val m0 = MatView.read(cat, "t_mv").toDF.collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(m0("a") === ((30L, 15.0, 2L)))
    assert(m0("b") === ((null, null, 0L)))
    // deleting one null row keeps the group all-null; inserting a value
    // flips sum/avg non-null — both through the additive path
    cat.deleteWhere("t", col("id") === 3L)
    cat.mergeInto("t", Seq((5L, "b", Some(7L))).toDF("id", "g", "x"),
      Seq("id"))
    val r = MatView.refresh(cat, "t_mv")
    assert(r.mode === "additive")
    val m1 = MatView.read(cat, "t_mv").toDF.collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2), r.get(3))).toMap
    assert(m1("b") === ((7L, 7.0, 1L)))
  }

  test("double sums accumulate exactly (decimal state)") {
    val root = Files.createTempDirectory("mv_dec").toString
    val cat = new Catalog(root, spark)
    val src = (1 to 100).map(i => (i.toLong, "g", i * 0.1))
      .toDF("id", "g", "x")
    cat.save(Chain(src), "t")
    MatView.create(cat, "t_mv", "t", Seq("id"), Seq("g"),
      Seq(MvAgg("sx", "sum", "x")))
    // delete 99 rows one version at a time worth of float subtraction
    cat.deleteWhere("t", col("id") > 1L)
    MatView.refresh(cat, "t_mv")
    val got = MatView.read(cat, "t_mv").toDF.head().getDouble(1)
    // float-additive state would carry (sum - parts) rounding noise;
    // decimal state lands exactly on the remaining row's value
    assert(got === 0.1)
  }

  test("additive deltas keep all 10 decimal digits (no (38,6) product)") {
    // values with digits past 1e-6: a sign cast to Decimal(28,10) sizes
    // the signed product at (38,6) and a (38,10) state rounds every add
    // at 9 dp — either would drift this sum off the exact recompute
    val root = Files.createTempDirectory("mv_dec2").toString
    val cat = new Catalog(root, spark)
    val src = (1 to 50).map(i => (i.toLong, "g", 0.3333333333 * i))
      .toDF("id", "g", "x")
    cat.save(Chain(src), "t")
    MatView.create(cat, "t_mv", "t", Seq("id"), Seq("g"),
      Seq(MvAgg("sx", "sum", "x"), MvAgg("ax", "avg", "x")))
    cat.deleteWhere("t", col("id") % 2 === 0L)
    cat.mergeInto("t",
      Seq((60L, "g", 0.1234567891)).toDF("id", "g", "x"), Seq("id"))
    val r = MatView.refresh(cat, "t_mv")
    assert(r.mode === "additive")
    // exact expectation: decimal(28,10) per-value quantization summed —
    // identical to what create() would compute from scratch
    val expect = graft.core.Sys.drop(cat.readDataset("t").toDF)
      .agg(sum(col("x").cast("decimal(28,10)")).cast("decimal(37,10)")
          .cast("double").as("sx"),
        (sum(col("x").cast("decimal(28,10)")).cast("decimal(37,10)")
          .cast("double") / count(col("x"))).as("ax")).head()
    val got = MatView.read(cat, "t_mv").toDF.head()
    assert(got.getDouble(1) === expect.getDouble(0),
      s"sum drifted: ${got.getDouble(1)} vs ${expect.getDouble(0)}")
    assert(got.getDouble(2) === expect.getDouble(1),
      s"avg drifted: ${got.getDouble(2)} vs ${expect.getDouble(1)}")
  }

  test("crash recovery: a dangling pending mark forces an exact rebuild") {
    val root = Files.createTempDirectory("mv_crash").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs().filter(col("doc_id") < 50)), "d")
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n", "count", "*")))
    cat.deleteWhere("d", col("doc_id") % 2 === 0)
    MatView.refresh(cat, "mv")
    val vs = cat.versions("mv")
    // simulate a refresh that died AFTER its merges but BEFORE the
    // cursor landed: pending mark on a non-latest version
    val (_, a0) = cat.annotationsOf("mv", vs.head)
    cat.updateDataset("mv", Some(vs.head),
      attrs = Some(a0 :+ "mv:pending=9.9.9"))
    cat.deleteWhere("d", col("doc_id") % 3 === 0)
    val r = MatView.refresh(cat, "mv")
    assert(r.mode === "recover", s"half-applied state must rebuild: $r")
    val expect = graft.core.Sys.drop(cat.readDataset("d").toDF)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val got = MatView.read(cat, "mv").toDF
    assert(got.except(expect).union(expect.except(got)).isEmpty)
    // the mark is consumed: the next refresh is a clean no-op
    assert(MatView.refresh(cat, "mv").mode === "noop")
    // a mark on the LATEST version (crash before any merge) just clears
    val latest = cat.latestVersion("mv").get
    val (_, a1) = cat.annotationsOf("mv", latest)
    cat.updateDataset("mv", Some(latest),
      attrs = Some(a1 :+ "mv:pending=9.9.9"))
    assert(MatView.refresh(cat, "mv").mode === "noop")
    assert(!cat.annotationsOf("mv", latest)._2
      .exists(_.startsWith("mv:pending=")))
  }

  test("refresh cursor is a lineage dep: vacuum keeps the synced version") {
    val root = Files.createTempDirectory("mv_dep").toString
    val cat = new Catalog(root, spark)
    // save-created source versions (no cow chain protecting them)
    cat.save(Chain(docs().filter(col("doc_id") < 40)), "d")
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n", "count", "*")))
    cat.save(Chain(docs().filter(col("doc_id") < 30)), "d") // 1.1.0
    MatView.refresh(cat, "mv")                              // cursor 1.1.0
    cat.save(Chain(docs().filter(col("doc_id") < 20)), "d") // 1.2.0
    cat.vacuum(keepLast = 1)
    // 1.1.0 must SURVIVE (the cursor dep), so the next refresh stays
    // incremental instead of degrading to a rebuild
    assert(cat.versions("d").contains(graft.catalog.SemVer(1, 1, 0)))
    assert(MatView.refresh(cat, "mv").mode === "additive")
  }

  test("updates to columns the view never reads are not dirty") {
    val root = Files.createTempDirectory("mv_irrel").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs()), "d")
    // every view input (doc_id) sits inside the row key: the feed must
    // not fall back to compare-everything
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("doc_id"),
      Seq(MvAgg("n", "count", "*")))
    cat.updateWhere("d", col("doc_id") % 2 === 0,
      Map("n_chars" -> (col("n_chars") + lit(1L))))
    val vs = cat.versions("mv")
    val r = MatView.refresh(cat, "mv")
    assert(r.dirtyGroups === 0L && cat.versions("mv") === vs,
      s"irrelevant update must not dirty groups: $r")
    assert(MatView.refresh(cat, "mv").mode === "noop")
  }

  test("min/max view recomputes dirty groups from the source") {
    val root = Files.createTempDirectory("mv_mm").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs()), "d")
    MatView.create(cat, "mm", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("lo", "min", "n_chars"), MvAgg("hi", "max", "n_chars"),
        MvAgg("n", "count", "*")))
    def expectNow() = graft.core.Sys.drop(cat.readDataset("d").toDF)
      .groupBy("lang").agg(min("n_chars").as("lo"), max("n_chars").as("hi"),
        count(lit(1)).as("n"))
    // strip each group's current minimum: only a recompute can repair lo
    val cuts = expectNow().select(col("lang").as("l"), col("lo"))
    val pred = col("n_chars") <= lit(
      cuts.agg(max(col("lo"))).head().getLong(0))
    cat.deleteWhere("d", pred)
    val r = MatView.refresh(cat, "mm")
    assert(r.mode === "recompute")
    val diff = MatView.read(cat, "mm").toDF.except(expectNow())
      .union(expectNow().except(MatView.read(cat, "mm").toDF))
    assert(diff.isEmpty)
    assert(MatView.refresh(cat, "mm").mode === "noop")
  }

  test("a lost cursor falls back to a full rebuild") {
    val root = Files.createTempDirectory("mv_rb").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs().filter(col("doc_id") < 40)), "d")
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n", "count", "*")))
    cat.save(Chain(docs().filter(col("doc_id") < 30)), "d")  // 1.1.0
    MatView.refresh(cat, "mv")                               // cursor -> 1.1.0
    cat.save(Chain(docs().filter(col("doc_id") < 20)), "d")  // 1.2.0
    // routine vacuums can't lose the cursor anymore (it's a lineage
    // dep) — simulate out-of-band retention deleting the synced-from
    // version by pointing the cursor at a version that never existed
    val latest = cat.latestVersion("mv").get
    val (_, a) = cat.annotationsOf("mv", latest)
    cat.updateDataset("mv", Some(latest), attrs = Some(
      a.filterNot(_.startsWith("mv:synced=")) :+ "mv:synced=0.9.9"))
    val r = MatView.refresh(cat, "mv")
    assert(r.mode === "rebuild")
    val expect = graft.core.Sys.drop(cat.readDataset("d").toDF)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val got = MatView.read(cat, "mv").toDF
    assert(got.except(expect).union(expect.except(got)).isEmpty)
  }

  test("a live ingest stream feeds an incremental view refresh") {
    val root = Files.createTempDirectory("mv_stream").toString
    val cat = new Catalog(root, spark)
    val cols = Seq("doc_id", "lang", "n_chars")
    cat.save(Chain(docs().filter(col("doc_id") < 60)
      .select(cols.map(col): _*)), "d")
    // the min agg stays ADDITIVE here: an append-only stream never
    // removes rows, so least() against the batch extreme is exact
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n", "count", "*"), MvAgg("chars", "sum", "n_chars"),
        MvAgg("lo", "min", "n_chars")))
    // new rows arrive over a stream and land as an exactly-once append
    val stage = Files.createTempDirectory("mv_stream_in").toString + "/b"
    docs().filter(col("doc_id") >= 60 && col("doc_id") < 90)
      .select(cols.map(col): _*).coalesce(1).write.parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val q = graft.streaming.EventStream.appendToDataset(
      spark.readStream.schema(schema).parquet(stage), cat, "d",
      Files.createTempDirectory("mv_stream_ck").toString)
    q.awaitTermination()
    // the file-level CDF sees exactly the appended files; the additive
    // refresh folds them in without rescanning the base
    val r = MatView.refresh(cat, "mv")
    assert(r.mode === "additive" && r.upserted > 0)
    def check(): Unit = {
      val expect = graft.core.Sys.drop(cat.readDataset("d").toDF)
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("n_chars").as("chars"), min("n_chars").as("lo"))
      val got = MatView.read(cat, "mv").toDF
      assert(got.except(expect).union(expect.except(got)).isEmpty)
    }
    check()
    // a destructive change flips the same view to the recompute path
    cat.deleteWhere("d", col("n_chars") % 3 === 0)
    assert(MatView.refresh(cat, "mv").mode === "recompute")
    check()
  }

  test("approx_distinct views: sketch union on inserts, recompute on deletes") {
    val root = Files.createTempDirectory("mv_hll").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs().select(col("doc_id"), col("lang"),
      col("source"))), "d")
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("nd", "approx_distinct", "source")))
    def exact() = graft.core.Sys.drop(cat.readDataset("d").toDF)
      .groupBy("lang").agg(count_distinct(col("source")).as("nd"))
    def check(): Unit = {
      val got = MatView.read(cat, "mv").toDF
      val e = exact()
      assert(got.except(e).union(e.except(got)).isEmpty)
    }
    check()
    // inserts (incl. brand-new sources) union sketches — additive
    val ins = docs().filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("lang"),
        concat(lit("new-"), col("source")).as("source"))
    cat.mergeInto("d", ins, Seq("doc_id"))
    assert(MatView.refresh(cat, "mv").mode === "additive")
    check()
    // a delete can remove a source's last row — sketches can't subtract
    cat.deleteWhere("d", col("source").startsWith("new-"))
    assert(MatView.refresh(cat, "mv").mode === "recompute")
    check()
  }

  test("definition survives refreshes; non-view dataset rejected") {
    val root = Files.createTempDirectory("mv_def").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(docs()), "d")
    intercept[IllegalArgumentException](MatView.read(cat, "d"))
    MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
      Seq(MvAgg("n", "count", "*")))
    cat.deleteWhere("d", col("doc_id") % 2 === 0)
    MatView.refresh(cat, "mv")
    val (src, rk, gb, aggs, _) = MatView.definitionOf(cat, "mv")
    assert(src === "d" && rk === Seq("doc_id") && gb === Seq("lang"))
    assert(aggs === Seq(MvAgg("n", "count", "*")))
    // duplicate create and reserved names rejected
    intercept[IllegalArgumentException](
      MatView.create(cat, "mv", "d", Seq("doc_id"), Seq("lang"),
        Seq(MvAgg("n", "count", "*"))))
    intercept[IllegalArgumentException](
      MatView.create(cat, "mv2", "d", Seq("doc_id"), Seq("lang"),
        Seq(MvAgg("__x", "count", "*"))))
  }
}
