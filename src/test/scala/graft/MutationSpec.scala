package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, SemVer}
import graft.core.Chain

/** Copy-on-write row mutations: DELETE / UPDATE / MERGE INTO as new
  * immutable versions that rewrite only stats-touched files and
  * hard-link the rest. */
class MutationSpec extends SparkSpec {

  /** PHYSICAL parquet files under the version's own data dir — for a
    * manifest version, exactly its rewrite output. */
  private def dataFiles(root: String, name: String, v: SemVer) = {
    import scala.jdk.CollectionConverters._
    val d = Paths.get(root, "datasets", name, s"v$v", "data")
    val w = Files.walk(d)
    try w.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toList
    finally w.close()
  }

  /** Pins the zero-copy carry: every carried (non-physical) file of
    * `name@v` resolves to the SAME physical file the base version
    * reads — zero data bytes were written for it. Returns the carried
    * count. */
  private def assertCarried(cat: Catalog, root: String, name: String,
                            v: SemVer, baseName: String,
                            baseV: SemVer): Int = {
    val own = dataFiles(root, name, v).map(_.getFileName.toString).toSet
    val census = cat.versionDataFiles(name, v).keys.toSeq.sorted
    val carried = census.filterNot(r =>
      own(Paths.get(r).getFileName.toString))
    carried.foreach { rel =>
      val got = cat.resolveDataFile(name, v, rel)
      val base = cat.resolveDataFile(baseName, baseV, rel)
      assert(Files.isSameFile(got, base),
        s"carried $rel must resolve to the base's physical file")
    }
    carried.size
  }

  /** orders saved as 8 range-partitioned files → narrow o_orderkey
    * envelopes per file, so a key-range mutation touches few files. */
  private def saveOrders(cat: Catalog, name: String,
                         bloomCols: Seq[String] = Nil): Unit = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), name, bloomCols = bloomCols)
  }

  test("deleteWhere rewrites only touched files, links the rest, equals filter") {
    val root = Files.createTempDirectory("mut_del").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    val v1 = cat.latestVersion("ord").get
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    val pred = col("o_orderkey") <= mx / 16 // first file(s) only
    val r = cat.deleteWhere("ord", pred)
    assert(r.filesReused > 0 && r.filesRewritten >= 1 &&
      r.filesRewritten + r.filesReused >= 8,
      s"expected mostly reuse, got $r")
    // result == old.filter(NOT(pred IS TRUE))
    val expect = before.filter(not(coalesce(pred, lit(false))))
    val got = cat.readDataset("ord").toDF
    assert(got.count() === r.rowsAfter)
    assert(expect.exceptAll(got.select(expect.columns.map(col): _*)).isEmpty &&
      got.select(expect.columns.map(col): _*).exceptAll(expect).isEmpty)
    // surviving rows keep their sys identity
    val oldIds = expect.select("sys.id").collect().map(_.getLong(0)).toSet
    val newIds = got.select("sys.id").collect().map(_.getLong(0)).toSet
    assert(newIds === oldIds)
    // carried files cross by manifest reference: the new version's own
    // data dir holds ONLY the rewrite output (zero bytes written for
    // the reused files), and every carried rel resolves to the base's
    // physical file
    val v2 = cat.latestVersion("ord").get
    assert(dataFiles(root, "ord", v2).size === r.filesRewritten)
    assert(assertCarried(cat, root, "ord", v2, "ord", v1) === r.filesReused)
    // lineage dep on the mutated version
    assert(cat.depsOf("ord", v2) === Seq(("ord", v1)))
  }

  test("chained mutations resolve one hop; clone carries zero-copy") {
    val root = Files.createTempDirectory("mut_chain").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    val v1 = cat.latestVersion("ord").get
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    val r2 = cat.deleteWhere("ord", col("o_orderkey") <= mx / 16)
    // second mutation on TOP of a manifest version: carried entries
    // must resolve to their PHYSICAL owners (v1 for files untouched by
    // both, r2 for its rewrite output) — never chain through r2's
    // manifest
    val r3 = cat.deleteWhere("ord", col("o_orderkey") > mx - mx / 16)
    val v3 = cat.latestVersion("ord").get
    assert(r3.filesReused > 0)
    assert(dataFiles(root, "ord", v3).size === r3.filesRewritten)
    assert(assertCarried(cat, root, "ord", v3, "ord", r2.version)
      === r3.filesReused)
    // every carried entry's owner is a PHYSICAL file holder
    cat.manifestOf("ord", v3).get.entries.foreach { e =>
      val p = Paths.get(root, "datasets", e.ds, s"v${e.v}", "data", e.rel)
      assert(Files.exists(p), s"manifest owner of ${e.rel} must be physical")
    }
    val expect = before
      .filter(col("o_orderkey") > mx / 16 && col("o_orderkey") <= mx - mx / 16)
    val got = cat.readDataset("ord").toDF
    assert(got.count() === r3.rowsAfter)
    assert(expect.exceptAll(got.select(expect.columns.map(col): _*))
      .isEmpty)
    // clone of the twice-mutated table: zero physical files, full read
    val cv = cat.cloneDataset("ord", "ord2")
    assert(dataFiles(root, "ord2", cv).isEmpty,
      "clone must not materialize any data file")
    assert(cat.readDataset("ord2").toDF.count() === r3.rowsAfter)
    assert(assertCarried(cat, root, "ord2", cv, "ord", v3)
      === cat.versionDataFiles("ord2", cv).size)
  }

  test("deleteWhere keeps NULL-predicate rows (SQL DELETE semantics)") {
    val root = Files.createTempDirectory("mut_null").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("k", "x")
    cat.save(Chain(df), "t")
    val r = cat.deleteWhere("t", col("x") > 15L)
    // x=30 deleted; x=10 (false) and x=null (null) stay
    val got = cat.readDataset("t").toDF.select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
    assert(r.rowsBefore === 3 && r.rowsAfter === 2)
  }

  test("deleteWhere: new version's stats cover every file; pruned reads stay exact") {
    val root = Files.createTempDirectory("mut_stats").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord", bloomCols = Seq("o_orderkey"))
    val mx = cat.readDataset("ord").toDF.agg(max("o_orderkey"))
      .head().getLong(0)
    cat.deleteWhere("ord", col("o_orderkey") <= mx / 16)
    val v2 = cat.latestVersion("ord").get
    // stats cover the full manifest census (carried + rewritten alike)
    val files = cat.versionDataFiles("ord", v2)
    assert(cat.fileStats("ord", v2).size === files.size)
    // the carried + rebuilt index still prunes, and pruned == full filter
    val pred = col("o_orderkey") > mx / 2
    val (kept, total) = cat.pruneCount("ord", pred)
    assert(kept < total, s"stats must still prune: $kept/$total")
    val full = cat.readDataset("ord").toDF.filter(pred)
    val pruned = cat.readDatasetWhere("ord", pred).toDF
    assert(pruned.count() === full.count())
    // blooms carried for linked files + built for new ones
    assert(cat.fileBlooms("ord", v2).size === files.size)
  }

  test("updateWhere: simultaneous assignment over OLD values, sys kept") {
    val root = Files.createTempDirectory("mut_upd").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("k", "a", "b")
    cat.save(Chain(df), "t")
    val sysBefore = cat.readDataset("t").toDF
      .select(col("k"), col("sys.id")).as[(Long, Long)].collect().toMap
    // swap a and b where k <= 2: both RHS see the old row
    val r = cat.updateWhere("t", col("k") <= 2L,
      Map("a" -> col("b"), "b" -> col("a")))
    val got = cat.readDataset("t").toDF
      .select("k", "a", "b").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 100L, 10L), (2L, 200L, 20L), (3L, 30L, 300L)))
    assert(r.rowsBefore === 3 && r.rowsAfter === 3)
    val sysAfter = cat.readDataset("t").toDF
      .select(col("k"), col("sys.id")).as[(Long, Long)].collect().toMap
    assert(sysAfter === sysBefore, "updated rows must keep sys identity")
    intercept[IllegalArgumentException](
      cat.updateWhere("t", lit(true), Map.empty))
    intercept[IllegalArgumentException](
      cat.updateWhere("t", lit(true), Map("nope" -> lit(1))))
  }

  test("mergeInto: upsert updates matched (sys kept), inserts unmatched (fresh ids)") {
    val root = Files.createTempDirectory("mut_merge").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "x")
    cat.save(Chain(df), "t")
    val oldIds = cat.readDataset("t").toDF
      .select(col("k"), col("sys.id")).as[(Long, Long)].collect().toMap
    val src = Seq((2L, "B", 20.0), (4L, "d", 4.0)).toDF("k", "s", "x")
    val r = cat.mergeInto("t", src, Seq("k"))
    assert(r.rowsMatched === 1 && r.rowsInserted === 1)
    assert(r.rowsBefore === 3 && r.rowsAfter === 4)
    val got = cat.readDataset("t").toDF
      .select("k", "s", "x").as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 1.0), (2L, "B", 20.0),
      (3L, "c", 3.0), (4L, "d", 4.0)))
    val ids = cat.readDataset("t").toDF
      .select(col("k"), col("sys.id")).as[(Long, Long)].collect().toMap
    // matched + unmatched target rows keep their ids
    assert(ids(1L) === oldIds(1L) && ids(2L) === oldIds(2L) &&
      ids(3L) === oldIds(3L))
    // the insert's id is fresh: past every carried id
    assert(ids(4L) > oldIds.values.max)
    assert(ids.values.toSeq.distinct.size === 4, "ids must stay unique")
  }

  test("mergeInto enforces Delta's cardinality rule and schema equality") {
    val root = Files.createTempDirectory("mut_card").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain(Seq((1L, "a")).toDF("k", "s")), "t")
    intercept[IllegalArgumentException](cat.mergeInto("t",
      Seq((1L, "x"), (1L, "y")).toDF("k", "s"), Seq("k")))
    intercept[IllegalArgumentException](cat.mergeInto("t",
      Seq((Option.empty[Long], "x")).toDF("k", "s"), Seq("k")))
    intercept[IllegalArgumentException](cat.mergeInto("t",
      Seq((1L, 2L)).toDF("k", "other"), Seq("k")))
  }

  test("mergeInto on a range layout rewrites only key-overlapping files") {
    val root = Files.createTempDirectory("mut_prune").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    // source: a handful of keys from the low end + one brand-new key
    val keys = before.filter(col("o_orderkey") <= mx / 16)
      .select("o_orderkey").limit(5)
      .collect().map(_.getLong(0))
    val src = before.filter(col("o_orderkey").isin(keys.toSeq: _*))
      .drop("sys")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .union(before.drop("sys").limit(1)
        .withColumn("o_orderkey", lit(mx + 1000000L)))
    val r = cat.mergeInto("ord", src, Seq("o_orderkey"))
    assert(r.filesReused > 0,
      s"low-end keys must not touch high-range files: $r")
    assert(r.rowsMatched === keys.length && r.rowsInserted === 1)
    assert(r.rowsAfter === r.rowsBefore + 1)
  }

  test("mergeInto large source: envelope probe skips the uncovered middle") {
    val root = Files.createTempDirectory("mut_rset").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    // low-band updates + far-high inserts, forced down the large path
    // (keyCollectMax=0): a [min,max] box over the source would touch
    // every file; the envelope probe touches only the low-band files
    val updates = before.drop("sys").filter(col("o_orderkey") <= mx / 16)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = before.drop("sys").limit(3)
      .withColumn("o_orderkey", col("o_orderkey") + lit(mx + 1000000L))
    val r = cat.mergeInto("ord", updates.union(inserts), Seq("o_orderkey"),
      keyCollectMax = 0)
    assert(r.filesReused > 0,
      s"range-set must leave middle files hard-linked: $r")
    assert(r.rowsInserted === 3)
    assert(r.rowsAfter === r.rowsBefore + 3)
    // and the result is still exact
    val got = cat.readDataset("ord").toDF.drop("sys")
    val expect = before.drop("sys")
      .filter(col("o_orderkey") > mx / 16)
      .union(updates).union(inserts)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("binned string envelopes: codegen rank ≡ driver rank; string merge stays file-local") {
    // 1. rank parity through the CODEGEN path — a divergent bin would
    // MISS a matching file (lost update): evaluate the same
    // StringBoundsRank object driver-side and as a column over
    // multi-byte, astral, short, and empty keys
    import spark.implicits._
    val samples = Seq("", "a", "abc", "s3://b/k/000001", "é", "😀x",
      "中文键", "zz￿", "pre", "prefix-with-more", "pre😀")
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val bounds = Seq("a", "pre", "s3://b/k/0", "中")
      .sortWith((a, b) => u(a).compareTo(u(b)) < 0).toArray
    val ranker = org.apache.spark.sql.graft.StringBoundsRank(
      org.apache.spark.sql.catalyst.expressions.Literal(u(""),
        org.apache.spark.sql.types.StringType), bounds)
    val got = samples.toDF("s")
      .withColumn("r", org.apache.spark.sql.graft.bridge.column(
        ranker.withNewChildren(Seq(
          org.apache.spark.sql.graft.bridge.expression(col("s"))))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach { s =>
      assert(got(s) === ranker.rank(u(s)), s"rank split on '$s'") }
    // 2. end-to-end: a string-keyed upsert FORCED down the binned arm
    // (cap=0) with a long shared prefix (the lcp pathology) must keep
    // the uncovered middle hard-linked and stay row-exact
    val prev = sys.props.get("graft.env.stringNestedLoopMax")
    sys.props("graft.env.stringNestedLoopMax") = "0"
    try {
      val root = Files.createTempDirectory("mut_sbin").toString
      val cat = new Catalog(root, spark)
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .select(concat(lit("s3://bucket/key/"),
          format_string("%09d", col("o_orderkey"))).as("okey"),
          col("o_totalprice"))
        .repartitionByRange(8, col("okey"))
        .sortWithinPartitions("okey")
      cat.save(Chain(o), "ords")
      val before = cat.readDataset("ords").toDF
      val mx = spark.read.parquet(s"$sf/orders.parquet")
        .agg(max("o_orderkey")).head().getLong(0)
      val low = f"s3://bucket/key/${mx / 16}%09d"
      val updates = before.drop("sys").filter(col("okey") <= low)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = before.drop("sys").limit(3)
        .withColumn("okey", concat(lit("s3://bucket/key/z"), col("okey")))
      val r = cat.mergeInto("ords", updates.union(inserts), Seq("okey"),
        keyCollectMax = 0)
      assert(r.filesReused > 0,
        s"binned string probe must leave middle files hard-linked: $r")
      assert(r.rowsInserted === 3)
      val got = cat.readDataset("ords").toDF.drop("sys")
      val expect = before.drop("sys").filter(col("okey") > low)
        .union(updates).union(inserts)
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.env.stringNestedLoopMax") = v
        case None => sys.props.remove("graft.env.stringNestedLoopMax")
      }
    }
  }

  test("mergeInto matchedAction=delete: delete-by-key-list with file reuse") {
    val root = Files.createTempDirectory("mut_delkeys").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    val keys = before.filter(col("o_orderkey") <= mx / 16)
      .select("o_orderkey").limit(7).collect().map(_.getLong(0))
    val src = before.drop("sys")
      .filter(col("o_orderkey").isin(keys.toSeq: _*))
    val r = cat.mergeInto("ord", src, Seq("o_orderkey"),
      matchedAction = "delete", insertNotMatched = false)
    assert(r.rowsMatched === keys.length && r.rowsInserted === 0)
    assert(r.rowsAfter === r.rowsBefore - keys.length)
    assert(r.filesReused > 0, s"low-band keys must reuse high files: $r")
    val got = cat.readDataset("ord").toDF
    assert(got.filter(col("o_orderkey").isin(keys.toSeq: _*)).count() === 0)
    assert(got.count() === r.rowsAfter)
  }

  test("expectations: fail aborts unclaimed, drop filters, quarantine audits") {
    val root = Files.createTempDirectory("mut_expect").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    import graft.catalog.{Expect, ExpectFailed}
    val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(-3.0)),
      (4L, Some(40.0))).toDF("k", "x")
    // fail mode: NULL counts as a violation; nothing is committed
    val ex = intercept[ExpectFailed](cat.save(Chain(df), "t",
      expect = Seq(Expect("x_present", col("x").isNotNull))))
    assert(ex.violations === 1)
    // nothing committed: no reader-visible version (the empty dataset
    // parent dir is the tmp protocol's footprint, same as any failed save)
    assert(cat.versions("t").isEmpty)
    // drop + quarantine in one save, fail-mode checked on KEPT rows
    cat.save(Chain(df), "t", expect = Seq(
      Expect("x_nonneg", col("x") >= 0.0, mode = "drop"),      // kills 3 and NULL 2
      Expect("k_small", col("k") <= 3L, mode = "quarantine"),  // kills 4
      Expect("k_positive", col("k") > 0L)))                    // passes on kept
    val kept = cat.readDataset("t").toDF.select("k")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
    // quarantine holds EVERY row violating its expectation (pre-drop)
    val q = cat.readDataset("t__quarantine").toDF.select("k")
      .collect().map(_.getLong(0)).toSet
    assert(q === Set(4L))
    // outcome attrs on the version: counts + quarantine pointer
    val meta = cat.readMeta("t", cat.latestVersion("t").get)
    assert(meta.contains("expect:x_nonneg=dropped:2"), meta)
    assert(meta.contains("expect:k_small=dropped:1"), meta)
    assert(meta.contains("expect:k_positive=pass"), meta)
    assert(meta.contains("expect:quarantine=t__quarantine@v1.0.0"), meta)
    // PRIMARY KEY constraint: same observation pass, transactional
    val dup = Seq((1L, Some(1.0)), (1L, Some(2.0)), (2L, Some(3.0)))
      .toDF("k", "x")
    val exu = intercept[ExpectFailed](cat.save(Chain(dup), "pk",
      unique = Seq("k")))
    assert(exu.violations === 1 && cat.versions("pk").isEmpty)
    cat.save(Chain(dup.dropDuplicates("k")), "pk", unique = Seq("k"))
    assert(cat.readDataset("pk").toDF.count() === 2)
    // clean data: no quarantine version is written
    val root2 = Files.createTempDirectory("mut_expect2").toString
    val cat2 = new Catalog(root2, spark)
    cat2.save(Chain(df.na.drop()), "c", expect = Seq(
      Expect("x_present", col("x").isNotNull, mode = "quarantine")))
    assert(cat2.datasets() === Seq("c"))
  }

  test("readChanges: Delta CDF vocabulary over a mutation trail") {
    val root = Files.createTempDirectory("mut_cdf").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "s")
    cat.save(Chain(df), "t")
    val v1 = cat.latestVersion("t").get
    cat.deleteWhere("t", col("k") === 2L)
    cat.updateWhere("t", col("k") === 3L, Map("s" -> lit("C")))
    cat.mergeInto("t", Seq((5L, "e")).toDF("k", "s"), Seq("k"))
    val v4 = cat.latestVersion("t").get
    val got = graft.delta.Delta.readChanges(cat, "t", v1, v4, Seq("k"))
      .toDF.select("k", "s", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(got === Set(
      (2L, "b", "delete"),
      (3L, "c", "update_preimage"),
      (3L, "C", "update_postimage"),
      (5L, "e", "insert")))
    // unchanged k=1/k=4 never surface; adjacent versions diff too
    val step = graft.delta.Delta.readChanges(cat, "t", v1,
      cat.versions("t")(1), Seq("k")).toDF
      .select("_change_type").as[String].collect().toSeq
    assert(step === Seq("delete"))
  }

  test("readChangesRange: per-commit granularity with _commit_version") {
    val root = Files.createTempDirectory("mut_cdfr").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain(Seq((1L, "a"), (2L, "b")).toDF("k", "s")), "t") // v1.0.0
    cat.updateWhere("t", col("k") === 1L, Map("s" -> lit("A")))    // v1.1.0
    cat.deleteWhere("t", col("k") === 1L)                          // v1.2.0
    val got = graft.delta.Delta.readChangesRange(cat, "t",
      SemVer(1, 0, 0), SemVer(1, 2, 0), Seq("k"))
      .toDF.select("k", "s", "_change_type", "_commit_version")
      .as[(Long, String, String, String)].collect().toSet
    // per-commit: the update IS visible (the net two-version feed would
    // collapse k=1 to a plain delete)
    assert(got === Set(
      (1L, "a", "update_preimage", "1.1.0"),
      (1L, "A", "update_postimage", "1.1.0"),
      (1L, "A", "delete", "1.2.0")))
    intercept[IllegalArgumentException](graft.delta.Delta.readChangesRange(
      cat, "t", SemVer(1, 0, 0), SemVer(9, 0, 0), Seq("k")))
  }

  test("catalog sql: names + time-travel views, lazily registered") {
    val root = Files.createTempDirectory("mut_sql").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")), "t")
    cat.save(Chain(Seq((9L, "z")).toDF("k", "s")), "unrelated")
    cat.deleteWhere("t", col("k") === 2L)
    // SQL time travel recovers what the mutation deleted
    val gone = cat.sql(
      """SELECT b.k FROM t_v1_0_0 b LEFT ANTI JOIN t a ON a.k = b.k""")
      .as[Long].collect().toSeq
    assert(gone === Seq(2L))
    // lazy: the unreferenced dataset never became a view
    assert(!spark.catalog.tableExists("unrelated"))
  }

  test("optimizeWhere compacts only matching files, row-identical") {
    val root = Files.createTempDirectory("mut_ow").toString
    val cat = new Catalog(root, spark)
    // 32 range files: the low quarter is the small-file-riddled hot band
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(32, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "ord")
    val v1 = cat.latestVersion("ord").get
    val before = cat.readDataset("ord").toDF
    val mx = before.agg(max("o_orderkey")).head().getLong(0)
    val r = cat.optimizeWhere("ord", col("o_orderkey") <= mx / 4, nFiles = 2)
    assert(r.rowsBefore === r.rowsAfter, "OPTIMIZE is layout-only")
    assert(r.filesReused > 16, s"cold files must link, not rewrite: $r")
    assert(r.filesRewritten < 8, s"hot band must compact: $r")
    val v2 = cat.latestVersion("ord").get
    assert(cat.versionDataFiles("ord", v2).size <
      cat.versionDataFiles("ord", v1).size, "file count must drop")
    // identical rows, sys included (layout-only rewrite carries sys)
    val after = cat.readDataset("ord").toDF
    assert(after.exceptAll(before).isEmpty && before.exceptAll(after).isEmpty)
    // stats stay complete over the manifest census: pruning still exact
    assert(cat.fileStats("ord", v2).size ===
      cat.versionDataFiles("ord", v2).size)
  }

  test("mergeInto evolveSchema: new column lands, old rows read null") {
    val root = Files.createTempDirectory("mut_evolve").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = (1L to 40L).map(k => (k, s"s$k")).toDF("k", "s")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    cat.save(Chain(df), "t")
    // low-band updates + one insert, all carrying a NEW column
    val src = Seq((1L, "S1", 0.5), (2L, "S2", 0.7), (99L, "new", 0.9))
      .toDF("k", "s", "score")
    val r = cat.mergeInto("t", src, Seq("k"), evolveSchema = true)
    assert(r.rowsMatched === 2 && r.rowsInserted === 1)
    assert(r.filesReused > 0, s"evolution must still reuse cold files: $r")
    val got = cat.readDataset("t").toDF
    assert(got.columns.toSeq === Seq("k", "s", "score", "sys"))
    val m = got.select(col("k"), col("score")).as[(Long, Option[Double])]
      .collect().toMap
    assert(m(1L) === Some(0.5) && m(2L) === Some(0.7) &&
      m(99L) === Some(0.9))
    assert(m(3L).isEmpty && m(40L).isEmpty,
      "pre-evolution rows must read null in the new column")
    // a CHAINED plain mutation keeps the column and the evolved read
    cat.deleteWhere("t", col("k") === 40L)
    val got2 = cat.readDataset("t").toDF
    assert(got2.columns.toSeq === Seq("k", "s", "score", "sys"))
    assert(got2.count() === 40)
    // pruned reads on the new column stay exact (old files are
    // conservatively kept — they lack stats for it)
    val full = got2.filter(col("score") > 0.6).select("k")
      .as[Long].collect().toSet
    val pruned = cat.readDatasetWhere("t", col("score") > 0.6)
      .toDF.select("k").as[Long].collect().toSet
    assert(pruned === full && full === Set(2L, 99L))
    // a non-evolving merge on the evolved table now requires the column
    intercept[IllegalArgumentException](cat.mergeInto("t",
      Seq((5L, "x")).toDF("k", "s"), Seq("k")))
  }

  test("restore rolls back zero-copy; clone forks zero-copy") {
    val root = Files.createTempDirectory("mut_restore").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = (1L to 50L).map(k => (k, s"s$k")).toDF("k", "s")
    cat.save(Chain(df), "t")
    val v1 = cat.latestVersion("t").get
    cat.deleteWhere("t", col("k") <= 25L) // the "bad" mutation
    assert(cat.readDataset("t").toDF.count() === 25)
    // RESTORE: new latest identical to v1, zero data bytes written —
    // the restored version's own data dir is empty and every file
    // resolves to v1's physical bytes
    val v3 = cat.restore("t", v1)
    assert(cat.latestVersion("t").get === v3)
    assert(cat.readDataset("t").toDF.count() === 50)
    assert(dataFiles(root, "t", v3).isEmpty,
      "restore must reference, not copy")
    assert(assertCarried(cat, root, "t", v3, "t", v1)
      === cat.versionDataFiles("t", v3).size)
    // history intact; dep protects v1 from vacuum
    assert(cat.depsOf("t", v3) === Seq(("t", v1)))
    // CLONE: independent fork, source untouched by clone's mutations
    val cv = cat.cloneDataset("t", "t2")
    assert(cv === SemVer(1, 0, 0))
    cat.deleteWhere("t2", col("k") > 10L)
    assert(cat.readDataset("t2").toDF.count() === 10)
    assert(cat.readDataset("t").toDF.count() === 50)
    assert(cat.depsOf("t2", cv) === Seq(("t", v3)))
    // stats carried verbatim: pruned reads work on the restored version
    val full = cat.readDataset("t").toDF.filter(col("k") <= 5L).count()
    assert(cat.readDatasetWhere("t", col("k") <= 5L).toDF.count() === full)
    intercept[IllegalArgumentException](cat.restore("t", SemVer(9, 9, 9)))
  }

  test("review fixes: PK under partition inference, CDF across evolution, sql collisions") {
    import spark.implicits._
    import graft.catalog.Expect
    // (a) unique check must not collapse string partition values "01"/"1"
    val root = Files.createTempDirectory("mut_fix_pk").toString
    val cat = new Catalog(root, spark)
    val part = Seq(("01", 1L), ("1", 2L)).toDF("code", "id")
    cat.save(Chain(part), "p", partitionBy = Seq("code"),
      unique = Seq("code"))
    assert(cat.readDataset("p").toDF.count() === 2)
    // (b) readChanges/readChangesRange across a schema-evolution commit
    cat.save(Chain(Seq((1L, "a"), (2L, "b")).toDF("k", "s")), "t")
    val v1 = cat.latestVersion("t").get
    cat.mergeInto("t", Seq((1L, "a", 0.5)).toDF("k", "s", "score"),
      Seq("k"), evolveSchema = true)
    val v2 = cat.latestVersion("t").get
    cat.deleteWhere("t", col("k") === 2L)
    val v3 = cat.latestVersion("t").get
    val feed = graft.delta.Delta.readChanges(cat, "t", v1, v2, Seq("k"))
      .toDF.select("k", "_change_type", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    // k=1 gained a score → update pair (old side null); k=2 unchanged
    assert(feed === Set((1L, "update_preimage", None),
      (1L, "update_postimage", Some(0.5))))
    val range = graft.delta.Delta.readChangesRange(cat, "t", v1, v3,
      Seq("k")).toDF.select("_change_type", "_commit_version")
      .as[(String, String)].collect().toSet
    assert(range === Set(("update_preimage", v2.toString),
      ("update_postimage", v2.toString), ("delete", v3.toString)))
    // (c) null-keyed insert reads as insert, not a phantom update
    cat.save(Chain(Seq(Some(1L)).toDF("k")), "n")
    val nv1 = cat.latestVersion("n").get
    cat.save(Chain(Seq(Some(1L), Option.empty[Long]).toDF("k")), "n")
    val nv2 = cat.latestVersion("n").get
    val nf = graft.delta.Delta.readChanges(cat, "n", nv1, nv2, Seq("k"))
      .toDF.select("_change_type").as[String].collect().toSeq
    assert(nf === Seq("insert"))
    // (d) ambiguous sql view names fail loudly
    cat.save(Chain(Seq(1L).toDF("x")), "a.b")
    cat.save(Chain(Seq(2L).toDF("x")), "a_b")
    val ex = intercept[IllegalArgumentException](
      cat.sql("SELECT * FROM a_b"))
    assert(ex.getMessage.contains("ambiguous view name"), ex.getMessage)
    // (e) bracketed expectation names and dataset names are rejected
    intercept[IllegalArgumentException](cat.save(Chain(part), "q",
      expect = Seq(Expect("x]y", col("id") > 0))))
    intercept[IllegalArgumentException](cat.save(Chain(part), "d[0]"))
  }

  test("review fixes: control-char descriptions round-trip; partitioned blooms hash strings") {
    import spark.implicits._
    val root = Files.createTempDirectory("mut_fix2").toString
    val cat = new Catalog(root, spark)
    // \t escapes as 	 in meta.json — annotationsOf must decode it,
    // and a later annotation patch must not persist corruption
    cat.save(Chain(Seq(1L).toDF("x")), "d", description = "a\tb\nc")
    val v = cat.latestVersion("d").get
    assert(cat.annotationsOf("d", v)._1 === "a\tb\nc")
    cat.updateDataset("d", Some(v), attrs = Some(Seq("tag")))
    assert(cat.annotationsOf("d", v) === ("a\tb\nc", Seq("tag")))
    // bloom over a string PARTITION key with numeric-looking values:
    // build must hash the string "00", not an inferred int 0 — a
    // mismatch silently prunes every file
    val part = Seq(("00", 1L), ("00", 2L), ("7", 3L)).toDF("shard", "id")
    cat.save(Chain(part), "p", partitionBy = Seq("shard"),
      bloomCols = Seq("shard"))
    val got = cat.readDatasetWhere("p", col("shard") === "00")
      .toDF.select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }

  test("envelope probe boundary drill: negative keys, exact bounds, far inserts") {
    val root = Files.createTempDirectory("mut_env").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    // negative..positive key domain in 8 range files
    val df = (-100L to 100L).map(k => (k, s"s$k")).toDF("k", "s")
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    cat.save(Chain(df), "t")
    val v1 = cat.latestVersion("t").get
    // source keys sit EXACTLY on every file's envelope min and max (the
    // off-by-one-bin failure mode), plus inserts far outside both ends
    val bounds = cat.fileStats("t", v1)
      .flatMap(f => f.cols.get("k").toSeq.flatMap(c => Seq(c.minL, c.maxL)))
      .distinct.sorted
    assert(bounds.size >= 8, s"fixture needs real envelopes: $bounds")
    val updates = bounds.map(k => (k, s"hit$k"))
    val inserts = Seq((Long.MaxValue - 5, "hi"), (Long.MinValue + 5, "lo"))
    val src = (updates ++ inserts).toDF("k", "s")
    val r = cat.mergeInto("t", src, Seq("k"), keyCollectMax = 0)
    assert(r.rowsMatched === bounds.size,
      s"every boundary key must match: $r vs ${bounds.size}")
    assert(r.rowsInserted === 2)
    // exact result: boundary rows updated, others untouched, extremes in
    val got = cat.readDataset("t").toDF.select("k", "s")
      .as[(Long, String)].collect().toMap
    bounds.foreach(k => assert(got(k) === s"hit$k", s"boundary $k"))
    assert(got(Long.MaxValue - 5) === "hi" && got(Long.MinValue + 5) === "lo")
    assert(got(0L) === (if (bounds.contains(0L)) "hit0" else "s0"))
    assert(got.size === 201 + 2)
  }

  test("racing same-base mutations can't lose an update (optimistic concurrency)") {
    // the lake-layer write-write story: two read-modify-write mutations
    // racing from the same base must NOT both commit as siblings (the
    // second latest would silently lack the first's change — a lost
    // update). Legal outcomes: they serialize (the later one resolved
    // the earlier's commit as its base → latest carries BOTH changes),
    // or the loser aborts with ConcurrentMutationException and latest
    // carries exactly the winner's change.
    val root = Files.createTempDirectory("mut_race").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = (1L to 100L).map(k => (k, s"s$k")).toDF("k", "s")
    cat.save(Chain(df), "t")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val (ta, tb) = Await.result(
      Future(scala.util.Try(cat.deleteWhere("t", col("k") <= 10L)))
        .zip(Future(scala.util.Try(cat.updateWhere("t", col("k") > 90L,
          Map("s" -> lit("hot")))))), 120.seconds)
    Seq(ta, tb).foreach {
      case scala.util.Failure(e) =>
        assert(e.isInstanceOf[graft.catalog.ConcurrentMutationException],
          s"only CME aborts are legal: $e")
      case _ =>
    }
    val latest = cat.readDataset("t").toDF.cache()
    try {
      (ta.isSuccess, tb.isSuccess) match {
        case (true, true) => // serialized: latest includes BOTH changes
          assert(latest.count() === 90)
          assert(latest.filter(col("s") === "hot").count() === 10)
        case (true, false) => // delete won
          assert(latest.count() === 90)
          assert(latest.filter(col("s") === "hot").count() === 0)
        case (false, true) => // update won
          assert(latest.count() === 100)
          assert(latest.filter(col("s") === "hot").count() === 10)
        case (false, false) => fail("both mutations aborted")
      }
    } finally latest.unpersist()
    // the commit lock is released either way: a follow-up mutation works
    val r = cat.deleteWhere("t", col("k") === 50L)
    assert(cat.readDataset("t").toDF.count() === r.rowsAfter)
  }

  test("guardLatest: stale-base commits abort, explicit-version forks don't") {
    val root = Files.createTempDirectory("mut_guard").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = (1L to 40L).map(k => (k, k * 2)).toDF("k", "v")
    val v1 = cat.save(Chain(df), "g")
    val v2 = cat.deleteWhere("g", col("k") <= 5L).version
    // a maintenance pass that watched v1 must abort once v2 committed
    intercept[graft.catalog.ConcurrentMutationException] {
      cat.save(Chain(df), "g", guardLatest = Some(v1))
    }
    // ...and the abort released the commit lock + left no claimed debris
    assert(cat.versions("g") === Seq(v1, v2))
    assert(cat.save(Chain(df), "g", guardLatest = Some(v2)) > v2)
    // explicitly pinning an OLD version is the documented FORK escape
    // hatch — no guard, commits a sibling from v1
    val fork = cat.deleteWhere("g", col("k") > 35L, version = Some(v1))
    assert(cat.readDataset("g", Some(fork.version)).toDF.count() === 35)
  }

  test("6 concurrent appends with retryOnConflict all land, none lost") {
    // the whole-protocol invariant: guarded appends + the retry helper
    // give serializable ingest — every writer eventually commits on top
    // of SOME latest, so the final table holds every row exactly once
    val root = Files.createTempDirectory("mut_stress").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain((1L to 100L).map(k => (k, s"base$k")).toDF("k", "s")), "t")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val rs = Await.result(Future.sequence((1 to 6).map { i =>
      Future(graft.catalog.Catalog.retryOnConflict(16) {
        cat.append("t",
          (1L to 10L).map(k => (1000L * i + k, s"w$i-$k")).toDF("k", "s"))
      })
    }), 300.seconds)
    assert(rs.map(_.version).distinct.size === 6)
    val fin = cat.readDataset("t").toDF
    assert(fin.count() === 160)
    assert(fin.select("k").distinct().count() === 160, "no duplicated rows")
    assert(cat.versions("t").size === 7, "six appends = six new versions")
    // sys row ids stay collision-free across the racing stamps
    assert(fin.select("sys.id").distinct().count() === 160)
  }

  test("commit lock: stale holders break, live holders serialize, retry helper") {
    val root = Files.createTempDirectory("mut_lock").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = (1L to 20L).map(k => (k, k)).toDF("k", "v")
    cat.save(Chain(df), "l")
    // a crashed writer's lock file (old mtime) must NOT wedge the table
    val lockP = java.nio.file.Paths.get(root, "datasets", "l", ".commit.lock")
    Files.createFile(lockP)
    Files.setLastModifiedTime(lockP,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000))
    val r = cat.deleteWhere("l", col("k") === 1L) // stale-breaks, commits
    assert(r.rowsAfter === 19)
    assert(!Files.exists(lockP), "the lock must be released after commit")
    // a LIVE holder blocks the commit until released — then it proceeds
    Files.createFile(lockP)
    val t0 = System.nanoTime()
    val fut = scala.concurrent.Future {
      cat.deleteWhere("l", col("k") === 2L)
    }(scala.concurrent.ExecutionContext.global)
    Thread.sleep(700)
    Files.deleteIfExists(lockP)
    val r2 = scala.concurrent.Await.result(fut,
      scala.concurrent.duration.Duration(60, "s"))
    assert(r2.rowsAfter === 18)
    assert((System.nanoTime() - t0) / 1e6 >= 650,
      "the commit must have waited for the live lock")
    // the retry helper re-runs a conflicted mutation to success
    val v = cat.latestVersion("l").get
    var first = true
    val r3 = graft.catalog.Catalog.retryOnConflict(3) {
      if (first) { first = false
        throw new graft.catalog.ConcurrentMutationException("synthetic")
      }
      cat.deleteWhere("l", col("k") === 3L)
    }
    assert(r3.rowsAfter === 17 && cat.latestVersion("l").get > v)
  }

  test("slow lock holder heartbeats past the stale period; waiter serializes behind it") {
    val prev = sys.props.get("graft.lock.staleMs")
    sys.props("graft.lock.staleMs") = "250"
    try {
      val root = Files.createTempDirectory("mut_lease").toString
      val cat = new Catalog(root, spark)
      import spark.implicits._
      cat.save(Chain((1L to 20L).map(k => (k, k)).toDF("k", "v")), "l")
      // the holder's body outlives the stale period 4x — without the
      // heartbeat the waiter would judge the lock stale, steal it, and
      // run its commit section concurrently (the exact two-writer race
      // the lock exists to prevent)
      @volatile var holderDone = 0L
      val holder = scala.concurrent.Future {
        cat.withCommitLockForTest("l") {
          Thread.sleep(1000)
          holderDone = System.nanoTime()
          "held"
        }
      }(scala.concurrent.ExecutionContext.global)
      // wait for the HOLDER to actually acquire before racing the
      // waiter — a bare sleep lets a starved scheduler run the waiter
      // first and fail the ordering assertion spuriously
      val lockFile = Paths.get(root, "datasets", "l", ".commit.lock")
      val acquireDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!Files.exists(lockFile) && System.nanoTime() < acquireDeadline)
        Thread.sleep(5)
      assert(Files.exists(lockFile), "holder failed to acquire in 10s")
      val waiter = scala.concurrent.Future {
        val r = cat.deleteWhere("l", col("k") === 1L)
        (System.nanoTime(), r)
      }(scala.concurrent.ExecutionContext.global)
      assert(scala.concurrent.Await.result(holder,
        scala.concurrent.duration.Duration(30, "s")) === "held")
      val (waiterCommitted, r) = scala.concurrent.Await.result(waiter,
        scala.concurrent.duration.Duration(30, "s"))
      assert(r.rowsAfter === 19)
      assert(holderDone != 0L && waiterCommitted > holderDone,
        "the waiter must have committed only AFTER the slow holder " +
          "released — a stale-steal mid-body would have interleaved")
      // sanity: a genuinely dead holder's lock still ages out fast
      val lockP = Paths.get(root, "datasets", "l", ".commit.lock")
      Files.createFile(lockP)
      Files.setLastModifiedTime(lockP,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 1000))
      val r2 = cat.deleteWhere("l", col("k") === 2L)
      assert(r2.rowsAfter === 18)
    } finally {
      prev match {
        case Some(v) => sys.props("graft.lock.staleMs") = v
        case None => sys.props.remove("graft.lock.staleMs")
      }
    }
  }

  test("commit fence: a mid-body steal aborts before meta lands, retry commits") {
    import graft.catalog.ConcurrentMutationException
    val root = Files.createTempDirectory("mut_fence").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain((1L to 9L).map(k => (k, k)).toDF("k", "v")), "l")
    val before = cat.versions("l")
    val lockP = Paths.get(root, "datasets", "l", ".commit.lock")
    // the frozen-holder interleave, body delayed past a forced steal:
    // while we hold the lock, a breaker's fresh lock replaces ours
    // (thief token). The fence — called exactly where save/cowRewrite/
    // linkVersion call it, immediately before the meta.json write —
    // must abort as the retryable conflict instead of committing over
    // the thief.
    val ex = intercept[ConcurrentMutationException] {
      cat.withCommitLockForTest("l") {
        Thread.sleep(50) // the delayed body
        Files.write(lockP, "thief-token".getBytes("UTF-8")) // the steal
        cat.commitFenceForTest("l") // the pre-meta fence
        fail("fence must abort a stolen commit")
      }
    }
    assert(ex.getMessage.contains("stolen"))
    // no meta damage: the version list is untouched and readable
    assert(cat.versions("l") === before)
    assert(cat.readDataset("l").toDF.count() === 9)
    Files.deleteIfExists(lockP) // drop the simulated thief's lock
    // an un-stolen commit passes the fence (the every-writer path) and
    // retryOnConflict composes over the fenced abort shape
    val r = graft.catalog.Catalog.retryOnConflict(3) {
      cat.deleteWhere("l", col("k") === 1L)
    }
    assert(r.rowsAfter === 8 && cat.versions("l").size === before.size + 1)
  }

  test("lock release leaves a foreign (stolen-and-recreated) lock in place") {
    val root = Files.createTempDirectory("mut_rel").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    cat.save(Chain(Seq((1L, 1L)).toDF("k", "v")), "l")
    val lockP = Paths.get(root, "datasets", "l", ".commit.lock")
    cat.withCommitLockForTest("l") {
      // simulate the frozen-holder steal: the lock now carries a
      // THIEF's token — the release's atomic disposal must detect the
      // foreign owner and put the lock straight back, never delete it
      Files.write(lockP, "thief-token".getBytes("UTF-8"))
      "held"
    }
    assert(Files.exists(lockP), "foreign lock must survive our release")
    assert(new String(Files.readAllBytes(lockP), "UTF-8") === "thief-token")
    val lockish = {
      import scala.jdk.CollectionConverters._
      val st = Files.list(lockP.getParent)
      try st.iterator().asScala
        .count(_.getFileName.toString.startsWith(".commit.lock"))
      finally st.close()
    }
    assert(lockish === 1, "no grave debris on the restore path")
    Files.deleteIfExists(lockP)
  }

  test("claimVersion rejects sub-1.0.0 explicit versions (guard sentinel stays unclaimable)") {
    val root = Files.createTempDirectory("mut_v0").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      cat.save(Chain(df), "z", version = Some(SemVer(0, 0, 0)))
    }
    intercept[IllegalArgumentException] {
      cat.save(Chain(df), "z", version = Some(SemVer(0, 9, 1)))
    }
    cat.save(Chain(df), "z", version = Some(SemVer(1, 0, 0)))
    assert(cat.latestVersion("z").contains(SemVer(1, 0, 0)))
  }

  test("mutating a parquet-bloom-indexed version carries the index: parity with rebuild") {
    val root = Files.createTempDirectory("mut_pbloom").toString
    val cat = new Catalog(root, spark)
    // >32 files forces the executor-written parquet bloom index
    spark.conf.set("graft.bloom.inlineMaxFiles", "8")
    try {
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .withColumn("okey", concat(lit("k"), col("o_orderkey")))
      cat.save(Chain(o), "ord", bloomCols = Seq("okey"))
      val v1 = cat.latestVersion("ord").get
      assert(Files.isDirectory(Paths.get(root, "datasets", "ord",
        s"v$v1", "blooms")), "fixture must take the parquet-index path")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      cat.deleteWhere("ord", col("o_orderkey") <= mx / 16)
      val v2 = cat.latestVersion("ord").get
      // the rebuilt index covers every surviving file and still prunes
      assert(Files.isDirectory(Paths.get(root, "datasets", "ord",
        s"v$v2", "blooms")), "mutation must rebuild the parquet index")
      val probe = "k" + (mx / 2)
      val (kept, total) = cat.pruneCount("ord", col("okey") === probe)
      assert(kept < total, s"rebuilt bloom must prune: $kept/$total")
      val full = cat.readDataset("ord").toDF.filter(col("okey") === probe)
      assert(cat.readDatasetWhere("ord", col("okey") === probe)
        .toDF.count() === full.count())
      // PARITY PIN: the carried index (untouched rows verbatim + the
      // rewrite's partial build) must equal a from-scratch rebuild of
      // the new version, row for row — blooms are order-insensitive
      // bitsets, so byte equality holds whichever path built them
      def idxRows(dir: String) = spark.read.parquet(dir).collect()
        .map(r => (r.getString(r.fieldIndex("file")),
          r.getString(r.fieldIndex("col")),
          java.util.Base64.getEncoder.encodeToString(
            r.getAs[Array[Byte]]("bloom")))).toSet
      val carried = idxRows(
        Paths.get(root, "datasets", "ord", s"v$v2", "blooms").toString)
      // rebuild comparator over the manifest-RESOLVED census (v2's own
      // dir holds only the rewrite output now)
      val v2census = cat.versionDataFiles("ord", v2).keys.toSeq.sorted
      val rebuiltDir = Files.createTempDirectory("pbloom_rebuild")
      graft.catalog.FileStats.writeBloomIndex(spark,
        Paths.get(root, "datasets", "ord", s"v$v2", "data").toString,
        Seq("okey"), 100000L, rebuiltDir.resolve("idx").toString,
        listed = Some(v2census.map(r =>
          cat.resolveDataFile("ord", v2, r).toString)))
      val rebuilt = idxRows(rebuiltDir.resolve("idx").toString)
      assert(carried === rebuilt,
        s"carried index diverges from rebuild: ${carried.size} vs " +
          s"${rebuilt.size} rows, " +
          s"onlyCarried=${(carried -- rebuilt).take(2)}, " +
          s"onlyRebuilt=${(rebuilt -- carried).take(2)}")
      // and the carried rows really ARE the old version's rows for
      // untouched files (verbatim carry, not a coincidental rebuild)
      val v1Rows = idxRows(
        Paths.get(root, "datasets", "ord", s"v$v1", "blooms").toString)
      val ownNames = dataFiles(root, "ord", v2)
        .map(_.getFileName.toString).toSet
      val untouchedNames = v2census.filterNot(r =>
        ownNames(Paths.get(r).getFileName.toString)).toSet
      assert(untouchedNames.nonEmpty, "fixture must carry files")
      assert(carried.filter(r => untouchedNames(r._1))
        .subsetOf(v1Rows), "untouched files' bloom rows must carry verbatim")
    } finally spark.conf.set("graft.bloom.inlineMaxFiles", "32")
  }

  test("mutating a parquet-stats-tier version carries the stats index: parity with rebuild") {
    val sKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(sKey)
    try {
      spark.conf.set(sKey, "4") // 16 files > 4 → parquet stats tier
      val root = Files.createTempDirectory("mut_pstats").toString
      val cat = new Catalog(root, spark)
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord16")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val r = cat.deleteWhere("ord16", col("o_orderkey") <= mx / 16)
      assert(r.filesReused > 0, s"fixture must carry files: $r")
      val v2 = cat.latestVersion("ord16").get
      def idxRows(dir: String) = spark.read.parquet(dir).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSet
      val carried = idxRows(
        Paths.get(root, "datasets", "ord16", s"v$v2", "stats").toString)
      val rebuiltDir = Files.createTempDirectory("pstats_rebuild")
      graft.catalog.FileStats.writeStatsIndex(spark,
        Paths.get(root, "datasets", "ord16", s"v$v2", "data").toString,
        rebuiltDir.resolve("idx").toString,
        listed = Some(cat.versionDataFiles("ord16", v2).keys.toSeq.sorted
          .map(r => cat.resolveDataFile("ord16", v2, r).toString)))
      val rebuilt = idxRows(rebuiltDir.resolve("idx").toString)
      assert(carried === rebuilt,
        s"carried stats index diverges: ${carried.size} vs " +
          s"${rebuilt.size} rows, " +
          s"onlyCarried=${(carried -- rebuilt).take(2)}, " +
          s"onlyRebuilt=${(rebuilt -- carried).take(2)}")
      // pruned reads through the carried index stay exact
      val pred = col("o_orderkey") > mx / 2
      val full = cat.readDataset("ord16").toDF.filter(pred).count()
      assert(cat.readDatasetWhere("ord16", pred).toDF.count() === full)
      val (kept, total) = cat.pruneCount("ord16", pred)
      assert(kept < total, s"carried stats must prune: $kept/$total")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(sKey, v)
        case None => spark.conf.set(sKey, "512")
      }
    }
  }

  test("stats-carry failure rebuilds a FULL index over the manifest census") {
    // the degraded arm of the parquet-tier carry: when the verbatim
    // carry fails, the fallback must index the manifest-RESOLVED census
    // (carried files live in ancestor dirs), never just the rewrite
    // output — a partial stats index makes pruned reads silently drop
    // every row of the unindexed files
    val sKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(sKey)
    try {
      spark.conf.set(sKey, "4")
      val root = Files.createTempDirectory("mut_carryfail").toString
      val cat = new Catalog(root, spark)
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord16")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      sys.props("graft.test.failStatsCarry") = "1"
      val r =
        try cat.deleteWhere("ord16", col("o_orderkey") <= mx / 16)
        finally sys.props -= "graft.test.failStatsCarry"
      assert(r.filesReused > 0, s"fixture must carry files: $r")
      val v2 = cat.latestVersion("ord16").get
      // the rebuilt index covers EVERY file of the manifest census
      // (all-or-nothing invariant) with owner-aware rel keys
      val idxFiles = spark.read.parquet(
          Paths.get(root, "datasets", "ord16", s"v$v2", "stats").toString)
        .select("file").distinct().collect().map(_.getString(0)).toSet
      val census = cat.versionDataFiles("ord16", v2).keys.toSet
      assert(idxFiles === census,
        s"rebuilt index census diverges: onlyIdx=" +
          s"${(idxFiles -- census).take(2)}, onlyCensus=" +
          s"${(census -- idxFiles).take(2)}")
      // pruned reads stay exact AND still prune
      val pred = col("o_orderkey") > mx / 2
      val full = cat.readDataset("ord16").toDF.filter(pred).count()
      assert(cat.readDatasetWhere("ord16", pred).toDF.count() === full)
      val (kept, total) = cat.pruneCount("ord16", pred)
      assert(total === census.size, s"census must cover all: $kept/$total")
      assert(kept < total, s"rebuilt stats must prune: $kept/$total")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(sKey, v)
        case None => spark.conf.set(sKey, "512")
      }
    }
  }

  test("double stats failure commits an index-LESS version, never partial") {
    val sKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(sKey)
    try {
      spark.conf.set(sKey, "4")
      val root = Files.createTempDirectory("mut_idxless").toString
      val cat = new Catalog(root, spark)
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(16, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord16")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      sys.props("graft.test.failStatsCarry") = "1"
      sys.props("graft.test.failStatsRebuild") = "1"
      val r =
        try cat.deleteWhere("ord16", col("o_orderkey") <= mx / 16)
        finally {
          sys.props -= "graft.test.failStatsCarry"
          sys.props -= "graft.test.failStatsRebuild"
        }
      assert(r.filesReused > 0, s"fixture must carry files: $r")
      val v2 = cat.latestVersion("ord16").get
      assert(!Files.isDirectory(
        Paths.get(root, "datasets", "ord16", s"v$v2", "stats")),
        "no partial index may commit — index-less is the only degradation")
      // reads are correct, just unpruned
      val pred = col("o_orderkey") > mx / 2
      val full = cat.readDataset("ord16").toDF.filter(pred).count()
      assert(cat.readDatasetWhere("ord16", pred).toDF.count() === full)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(sKey, v)
        case None => spark.conf.set(sKey, "512")
      }
    }
  }

  test("mutation chains: unpartitioned reads plan ONE scan at any depth; flatten resets owners") {
    def scanCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.size
    val root = Files.createTempDirectory("mut_chain").toString
    val cat = new Catalog(root, spark)
    saveOrders(cat, "ord")
    // 6 sequential point deletes on keys SPREAD across the range-laid
    // files → a 6-deep mutation chain whose manifest names many
    // distinct physical owners (clustered keys would rewrite the same
    // file's descendant every time)
    val all = cat.readDataset("ord").toDF.select("o_orderkey")
      .distinct().orderBy(col("o_orderkey")).collect().map(_.getLong(0))
    val keys = (1 to 6).map(i => all((all.length - 1) * i / 7))
    keys.foreach(k => cat.deleteWhere("ord", col("o_orderkey") === k))
    val vN = cat.latestVersion("ord").get
    val owners = cat.dataFilesOf("ord", vN)
      .map(e => (e.ds, e.v)).distinct.size
    assert(owners >= 3, s"fixture must build a real chain: $owners owners")
    // the read-side guarantee: owner count never reaches the plan —
    // an unpartitioned manifest read is ONE relation at any depth
    assert(scanCount(cat.readDataset("ord").toDF) === 1,
      "unpartitioned chain read must plan exactly one scan node")
    val expect = cat.readDataset("ord").toDF.count()
    // FLATTEN: row-identical, self-contained, layout-only, index intact
    val fv = cat.flattenVersion("ord")
    assert(cat.latestVersion("ord").get === fv)
    assert(cat.dataFilesOf("ord", fv).forall(e => e.ds == "ord" && e.v == fv),
      "flattened version owns every file")
    assert(!Files.exists(java.nio.file.Paths.get(root, "datasets", "ord",
      s"v$fv", "manifest.json")), "flattened version is self-contained")
    assert(cat.readDataset("ord").toDF.count() === expect)
    assert(cat.cowOpOf("ord", fv) === Some("flatten"),
      "streams must see flatten as layout-only")
    // footer-stats skipping carried through the byte copy
    val mx = cat.readDataset("ord").toDF
      .agg(max("o_orderkey")).head().getLong(0)
    val (kept, total) = cat.pruneCount("ord", col("o_orderkey") > mx / 2)
    assert(kept < total, s"flattened version must still prune: $kept/$total")
    // flattening an already self-contained version is a no-op
    assert(cat.flattenVersion("ord") === fv)
  }

  test("auto-flatten: graft.manifest.maxOwners bounds the chain at commit") {
    val key = "graft.manifest.maxOwners"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "3")
      val root = Files.createTempDirectory("mut_autoflat").toString
      val cat = new Catalog(root, spark)
      saveOrders(cat, "ord")
      val before = cat.readDataset("ord").toDF
      val all = before.select("o_orderkey").distinct()
        .orderBy(col("o_orderkey")).collect().map(_.getLong(0))
      val keys = (1 to 10).map(i => all((all.length - 1) * i / 11))
      val expect = before
        .filter(!col("o_orderkey").isin(keys: _*)).count()
      keys.foreach { k =>
        cat.deleteWhere("ord", col("o_orderkey") === k)
        val v = cat.latestVersion("ord").get
        val owners = cat.dataFilesOf("ord", v)
          .map(e => (e.ds, e.v)).distinct.size
        assert(owners <= 3,
          s"commit left $owners owners past the bound at v$v")
      }
      // rows survived ten mutations + interleaved auto-flattens
      assert(cat.readDataset("ord").toDF.count() === expect)
    } finally prev match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }
  }

  test("restore of a hive-partitioned version keeps the layout") {
    val root = Files.createTempDirectory("mut_restpart").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
    cat.save(Chain(n), "nat", partitionBy = Seq("n_regionkey"))
    val v1 = cat.latestVersion("nat").get
    cat.deleteWhere("nat", col("n_regionkey") === 0)
    cat.restore("nat", v1)
    val v3 = cat.latestVersion("nat").get
    assert(dataFiles(root, "nat", v3).forall(p =>
      p.getParent.getFileName.toString.startsWith("n_regionkey=")),
      "restore must preserve key=value dirs")
    val got = cat.readDataset("nat").toDF
    assert(got.count() === n.count())
    assert(got.schema("n_regionkey").dataType ===
      n.schema("n_regionkey").dataType)
  }

  test("mutations on a hive-partitioned version keep the layout") {
    val root = Files.createTempDirectory("mut_part").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
    cat.save(Chain(n), "nat", partitionBy = Seq("n_regionkey"))
    val r = cat.deleteWhere("nat", col("n_nationkey") % 2 === 0)
    val v2 = cat.latestVersion("nat").get
    // rewritten files landed back under key=value dirs
    assert(dataFiles(root, "nat", v2).forall(p =>
      p.getParent.getFileName.toString.startsWith("n_regionkey=")))
    val got = cat.readDataset("nat").toDF
    assert(got.schema("n_regionkey").dataType ===
      n.schema("n_regionkey").dataType)
    assert(got.count() === r.rowsAfter)
    assert(got.filter(col("n_nationkey") % 2 === 0).count() === 0)
  }
}
