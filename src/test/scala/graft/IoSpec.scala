package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode
import graft.core.Chain
import graft.io.Writers
import graft.udf.{Prefetcher, SetupRegistry}
import graft.schema.SignalSchema

class IoSpec extends SparkSpec {
  import spark.implicits._

  test("parquet export embeds and restores the signal schema sidecar") {
    val tmp = Files.createTempDirectory("wp").toString + "/out"
    val df = spark.read.parquet(s"$sf/region.parquet")
    Writers.toParquet(df, tmp)
    val sidecar = Writers.readSchemaSidecar(df, tmp)
    assert(sidecar.exists(_.contains("r_regionkey")))
    assert(spark.read.parquet(tmp).collect().toSet === df.collect().toSet)
  }

  test("csv export flattens nested signals at the boundary") {
    val tmp = Files.createTempDirectory("wc").toString + "/out"
    val nested = Seq(("a", 1L)).toDF("x", "y")
      .select(struct(col("x"), col("y")).as("s"), col("x").as("top"))
    Writers.toCsv(nested, tmp)
    val back = spark.read.option("header", "true").csv(tmp)
    assert(back.columns.toSeq === Seq("s__x", "s__y", "top"))
    assert(SignalSchema.unflatten(back).columns.toSeq === Seq("s", "top"))
  }

  test("csv export serializes array columns as JSON strings") {
    val tmp = Files.createTempDirectory("wa").toString + "/out"
    val df = Seq((1L, Seq(1, 2, 3))).toDF("id", "xs")
    Writers.toCsv(df, tmp)
    val back = spark.read.option("header", "true").csv(tmp).head()
    assert(back.getString(1) === "[1,2,3]")
  }

  test("json array export produces one valid document") {
    val tmp = Files.createTempDirectory("wj").toString + "/out.json"
    Writers.toJsonArray(spark.read.parquet(s"$sf/region.parquet"), tmp)
    val content = new String(Files.readAllBytes(java.nio.file.Paths.get(tmp)))
    assert(content.trim.startsWith("[") && content.trim.endsWith("]"))
    assert(content.contains("r_regionkey"))
  }

  test("explodeJson surfaces JSON fields as columns") {
    val df = Seq((1L, """{"k": 7, "v": "x"}""")).toDF("id", "props")
    val out = Chain(df).explodeJson("props",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val r = out.toDF.head()
    assert(out.toDF.columns.toSeq === Seq("id", "k", "v"))
    assert(r.getAs[Long]("k") === 7L)
  }

  test("prefetcher preserves order and propagates errors") {
    val xs = (1 to 100).iterator
    assert(Prefetcher.ahead(xs, 4).toSeq === (1 to 100))
    val failing = Iterator(1, 2) ++ Iterator.continually[Int](
      throw new RuntimeException("boom")).take(1)
    val wrapped = Prefetcher.ahead(failing, 2)
    intercept[RuntimeException] { wrapped.toList }
  }

  test("setup registry initializes once per JVM") {
    SetupRegistry.clear()
    var inits = 0
    (1 to 10).foreach { _ =>
      SetupRegistry.get("client") { inits += 1; new Object }
    }
    assert(inits === 1)
  }

  test("catalog meta-chain lists dataset versions") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new graft.catalog.Catalog(root, spark)
    cat.save(Chain(spark.read.parquet(s"$sf/region.parquet")), "r")
    cat.save(Chain(spark.read.parquet(s"$sf/region.parquet")), "r")
    val meta = cat.datasetsDF()
      .select("name", "version", "rows", "created_at")
      .as[(String, String, Long, String)]
      .collect().toSet
    assert(meta.map(m => (m._1, m._2)) === Set(("r", "1.0.0"), ("r", "1.1.0")))
    assert(meta.forall(_._3 === 5L))      // region row count from meta
    assert(meta.forall(_._4.nonEmpty))    // created_at recorded
  }

  test("bucketed tables join with zero exchange (co-located join)") {
    import org.apache.spark.sql.functions._
    graft.io.Writers.saveBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "b_orders",
      Seq("o_custkey"), buckets = 4)
    graft.io.Writers.saveBucketed(
      spark.read.parquet(s"$sf/customer.parquet"), "b_customer",
      Seq("c_custkey"), buckets = 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket-aligned SMJ: both sides pre-partitioned + pre-sorted on the
      // key, so the plan has NO shuffle at all
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() ===
        spark.read.parquet(s"$sf/orders.parquet")
          .join(spark.read.parquet(s"$sf/customer.parquet"),
            col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("z-ordered layout prunes files on BOTH dimensions; sorted layout can't") {
    import org.apache.spark.sql.functions._
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    // 64 files = 2^6 top z-cells = a balanced 8x8 grid (odd bits go to x,
    // even to y — a non-square file count splits one dimension coarser)
    graft.io.Layout.writeZOrdered(orders, s"$root/z", "o_custkey",
      "o_totalprice", nFiles = 64)
    // baseline: the same table range-sorted on o_custkey alone
    orders.repartitionByRange(64, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$root/sorted")
    // per-file min/max envelopes — what parquet footer stats give a scan
    def envelopes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("xlo"), max("o_custkey").as("xhi"),
        min("o_totalprice").as("ylo"), max("o_totalprice").as("yhi"))
      .collect()
    val (zEnv, sEnv) = (envelopes(s"$root/z"), envelopes(s"$root/sorted"))
    // cell-aligned range boundaries are sampled: a merged pair of cells
    // costs a file or two, never correctness
    assert(zEnv.length >= 56 && zEnv.length <= 64, zEnv.length.toString)
    assert(sEnv.length === 64)
    // a window holding ~12.5% of ROWS on each dimension (quantile-based —
    // domain-width windows would conflate data density with layout
    // quality on the skewed o_totalprice distribution)
    val Array(qx1, qx2) = orders
      .selectExpr("CAST(o_custkey AS DOUBLE) AS x")
      .stat.approxQuantile("x", Array(0.40, 0.525), 0.001)
    val Array(qy1, qy2) =
      orders.stat.approxQuantile("o_totalprice", Array(0.40, 0.525), 0.001)
    def hitsX(env: Array[org.apache.spark.sql.Row]) = env.count(e =>
      e.getLong(2) >= qx1 && e.getLong(1) <= qx2)
    def hitsY(env: Array[org.apache.spark.sql.Row]) = env.count(e =>
      e.getDouble(4) >= qy1 && e.getDouble(3) <= qy2)
    // z-order: both dimensions prune — each file covers ~1/8 of the row
    // mass on each dimension, so a 1/8-mass window touches 1-2 strips
    // (8-16 files) plus boundary spill; well under half either way
    assert(hitsX(zEnv) <= 24, s"z x-hits ${hitsX(zEnv)}")
    assert(hitsY(zEnv) <= 24, s"z y-hits ${hitsY(zEnv)}")
    // single-column sort: its own column prunes hard, the OTHER dimension
    // reads essentially everything — the property z-order trades away
    assert(hitsX(sEnv) <= 12, s"sorted x-hits ${hitsX(sEnv)}")
    assert(hitsY(sEnv) >= 56, s"sorted y-hits ${hitsY(sEnv)}")
    assert(hitsY(zEnv) * 2 < hitsY(sEnv), s"${hitsY(zEnv)} vs ${hitsY(sEnv)}")
    // content preserved by the rewrite
    val back = spark.read.parquet(s"$root/z")
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_orderkey")).head().getLong(0) ===
      orders.agg(sum("o_orderkey")).head().getLong(0))
    assert(back.columns.sorted === orders.columns.sorted)
  }

  test("hilbert layout: expression parity, locality vs morton, pruning write") {
    import org.apache.spark.sql.functions._
    import graft.io.Hilbert
    import graft.functions.GraftFunctions
    // (a) the codegen'd expressions match the kernels row-for-row, and
    // the full 64x64 grid maps bijectively onto [0, 4096) THROUGH the
    // expression (codegen path included)
    val g = spark.range(0, 4096).select(
      (col("id") % 64).cast("long").as("x"),
      (col("id") / 64).cast("long").as("y"))
    val hv2 = g.select(col("x"), col("y"),
        GraftFunctions.hilbert_2(col("x"), col("y"), 6).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hv2.forall { case (x, y, h) => Hilbert.index2(x, y, 6) == h })
    assert(hv2.map(_._3).toSet === (0L until 4096L).toSet)
    val hvN = g.select(col("x"), col("y"),
        GraftFunctions.hilbert_n(array(
          (col("x") / 8).cast("long"), pmod(col("x"), lit(8)).cast("long"),
          (col("y") / 8).cast("long")), 3).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hvN.forall { case (x, y, h) =>
      Hilbert.indexN(Array(x / 8, x % 8, y / 8), 3) == h })

    // (b) the locality claim, measured: split each curve's index domain
    // into 10 EQUAL ranges (10 is not a power of two, so every boundary
    // cuts mid-cell — exactly what sampled range partitioning does) and
    // sum the per-block (x, y) envelope widths. Hilbert blocks are
    // contiguous curve runs of grid-adjacent cells; Morton runs jump at
    // quadrant seams, so their bounding boxes come out wider on the
    // same uniform grid.
    def blockEnvSum(df: org.apache.spark.sql.DataFrame, v: String): Long = {
      val width = math.ceil(math.pow(2.0, 32) / 10.0).toLong
      df.groupBy((col(v) / width).cast("long").as("blk"))
        .agg((max("x") - min("x") + max("y") - min("y")).as("w"))
        .agg(sum("w")).head().getLong(0)
    }
    val zSum = blockEnvSum(graft.io.Layout.zorderFrame(g, "x", "y"), "zval")
    val hSum = blockEnvSum(graft.io.Layout.hilbertFrame(g, "x", "y"), "hval")
    assert(hSum < zSum, s"hilbert envelope sum $hSum vs morton $zSum")

    // (c) the write path: curve-prefix-aligned files prune a 12.5%-mass
    // window on BOTH dimensions (same bar as the z-order test above)
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val root = java.nio.file.Files.createTempDirectory("hilb").toString
    graft.io.Layout.writeHilbertOrdered(orders, s"$root/h",
      Seq("o_custkey", "o_totalprice"), nFiles = 64)
    val env = spark.read.parquet(s"$root/h")
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("xlo"), max("o_custkey").as("xhi"),
        min("o_totalprice").as("ylo"), max("o_totalprice").as("yhi"))
      .collect()
    assert(env.length >= 56 && env.length <= 64, env.length.toString)
    val Array(qx1, qx2) = orders
      .selectExpr("CAST(o_custkey AS DOUBLE) AS x")
      .stat.approxQuantile("x", Array(0.40, 0.525), 0.001)
    val Array(qy1, qy2) =
      orders.stat.approxQuantile("o_totalprice", Array(0.40, 0.525), 0.001)
    val hx = env.count(e => e.getLong(2) >= qx1 && e.getLong(1) <= qx2)
    val hy = env.count(e => e.getDouble(4) >= qy1 && e.getDouble(3) <= qy2)
    assert(hx <= 24, s"hilbert x-hits $hx")
    assert(hy <= 24, s"hilbert y-hits $hy")
    val back = spark.read.parquet(s"$root/h")
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_orderkey")).head().getLong(0) ===
      orders.agg(sum("o_orderkey")).head().getLong(0))
  }

  test("writePartitioned: per-directory file cap, lossless read-back") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "event_type")
    val root = java.nio.file.Files.createTempDirectory("partw").toString
    graft.io.Layout.writePartitioned(ev, root, "event_type",
      maxFilesPerPartition = 3)
    val dirs = new java.io.File(root).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("event_type="))
    assert(dirs.length === 5, dirs.map(_.getName).mkString(","))
    // the salt caps the per-directory writer fan-out: a naive
    // partitionBy write from a 32-partition frame could leave up to 32
    // files in EVERY directory
    dirs.foreach { d =>
      val n = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= 3, s"${d.getName}: $n files")
    }
    val back = spark.read.parquet(root)
    assert(back.count() === ev.count())
    assert(back.agg(sum("event_id")).head().getLong(0) ===
      ev.agg(sum("event_id")).head().getLong(0))
  }

  test("compaction bin-packs small files without a shuffle") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    // simulate micro-batch debris: 64 tiny files
    orders.repartition(64).write.parquet(s"$root/small")
    val small = new java.io.File(s"$root/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(small === 64)
    val perFile = new java.io.File(s"$root/small").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 8
    val (before, after, _) = graft.io.Layout.compactTo(
      spark, s"$root/small", s"$root/packed", targetBytes = perFile)
    assert(before === 64)
    assert(after >= 6 && after <= 10, after.toString) // ~8 target-size files
    // content preserved
    val back = spark.read.parquet(s"$root/packed")
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_orderkey")).head().getLong(0) ===
      orders.agg(sum("o_orderkey")).head().getLong(0))
    // and the rewrite plan is shuffle-free: coalesce, never an exchange
    val p = spark.read.parquet(s"$root/small").coalesce(8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("JDBC round-trip through embedded Derby, partitioned read") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val db = Files.createTempDirectory("derby_io").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val src = Seq((1L, "alpha", 10.5), (2L, "beta", -3.25), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
    Writers.toDatabase(src, url, "vals")
    val whole = Chain.readDatabase(spark, url,
      """SELECT "id", "name", "score" FROM vals""").toDF
    assert(whole.collect().toSet === src.collect().toSet)
    val parted = Chain.readDatabasePartitioned(spark, url,
      """SELECT "id", "name", "score" FROM vals""",
      partitionColumn = "id", lowerBound = 0L, upperBound = 4L,
      numPartitions = 3)
    assert(parted.toDF.rdd.getNumPartitions === 3)
    assert(parted.toDF.collect().toSet === src.collect().toSet)
  }

  test("FileRef.open streams blobs larger than the byte-bounded LRU cache") {
    import graft.files.{FileCache, FileRef}
    val dir = Files.createTempDirectory("blobs")
    def mk(name: String, size: Int, fill: Byte): FileRef = {
      val bytes = Array.fill[Byte](size)(fill)
      Files.write(dir.resolve(name), bytes)
      FileRef(s"file://$dir", name, size.toLong, "", s"etag-$name", true,
        new java.sql.Timestamp(0L), "")
    }
    FileCache.clear()
    FileCache.setMaxBytes(4096L)
    try {
      // a blob 16x the cache bound streams through open() in constant
      // memory and never touches the cache
      val big = mk("big.bin", 64 * 1024, 1)
      val in = big.open()
      try {
        val buf = new Array[Byte](1024)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        assert(total === 64L * 1024)
      } finally in.close()
      assert(FileCache.currentBytes === 0L)
      // readBytes on an oversized blob (> bound/8) serves but never caches
      big.readBytes()
      assert(FileCache.currentBytes === 0L)
      // small blobs cache with LRU eviction under the byte bound
      val a = mk("a.bin", 400, 2); val b = mk("b.bin", 400, 3)
      val more = (0 until 12).map(i => mk(s"c$i.bin", 400, 4))
      a.readBytes(); b.readBytes()
      assert(FileCache.currentBytes === 800L)
      more.foreach(_.readBytes())   // 12 * 400 > 4096 forces eviction
      assert(FileCache.currentBytes <= 4096L)
      // single-file export round-trips bytes under each placement
      val out = Files.createTempDirectory("export")
      val uri = a.export(s"file://$out", placement = "filename")
      assert(uri.endsWith("a.bin"))
      assert(Files.readAllBytes(out.resolve("a.bin")).forall(_ == 2))
    } finally {
      FileCache.setMaxBytes(256L * 1024 * 1024)
      FileCache.clear()
    }
  }

  test("readHf: split discovery, split column, limit, name normalization") {
    val root = Files.createTempDirectory("hf").toString
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("Doc ID", "Text-Body")
      .write.parquet(s"$root/train")
    Seq((9, "z")).toDF("Doc ID", "Text-Body")
      .write.parquet(s"$root/test")
    // multi-split: split column prepended, names normalized
    val all = Chain.readHf(spark, root).toDF
    assert(all.columns.toSeq === Seq("split", "doc_id", "text_body"))
    assert(all.groupBy("split").count().as[(String, Long)].collect().toSet
      === Set(("train", 3L), ("test", 1L)))
    // single split selected: no split column
    val one = Chain.readHf(spark, root, split = "train").toDF
    assert(one.columns.toSeq === Seq("doc_id", "text_body"))
    assert(one.count() === 3)
    // limit caps rows per split
    assert(Chain.readHf(spark, root, limit = 1).toDF.count() === 2)
  }

  test("normalizeColNames matches reference collision and identifier rules") {
    // collision after normalization → counter prefix; leading digit → not
    // an identifier → counter prefix; reserved existing name "split" claims
    // its slot first (reference normalize_col_names, utils.py:55)
    val m = Chain.normalizeColNames(Seq("split"),
      Seq("A B", "a_b", "9lives", "Split", "")).toMap
    // "A B" normalizes to "a_b" but that IS another original column → c0_;
    // "a_b" itself keeps its name (gen == org skips the original-name rule)
    assert(m("A B") === "c0_a_b")
    assert(m("a_b") === "a_b")
    assert(m("9lives") === "c1_9lives")
    assert(m("Split") === "c2_split") // "split" taken by the existing column
    assert(m("") === "c3")
  }

  test("readJsonInferred: sample inference + jmespath array descent") {
    val dir = Files.createTempDirectory("jsonl")
    val lines = Seq(
      """{"batch":"b1","items":[{"id":1,"tag":"x"},{"id":2,"tag":"y"}]}""",
      """{"batch":"b2","items":[{"id":3,"tag":"z"}]}""")
    Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val rows = Chain.readJsonInferred(spark, dir.toString,
        jmespath = Some("items[*]"))
      .toDF.as[(Long, String)].collect().toSet
    assert(rows === Set((1L, "x"), (2L, "y"), (3L, "z")))
    // explodeJsonInferred: same inference applied to a JSON string column
    val tbl = Seq("""{"a":5,"b":"p"}""", """{"a":6,"b":"q"}""").toDF("js")
    val exploded = Chain(tbl).explodeJsonInferred("js").toDF
      .as[(Long, String)].collect().toSet
    assert(exploded === Set((5L, "p"), (6L, "q")))
  }

  test("jmespath grammar: index, slice, filter, composed ops") {
    val dir = Files.createTempDirectory("jsonl2")
    val lines = Seq(
      """{"p":{"items":[{"id":1,"tag":"x","v":10},{"id":2,"tag":"y","v":20},{"id":3,"tag":"x","v":30}],"xs":[7,8,9,10]}}""",
      """{"p":{"items":[{"id":4,"tag":"y","v":40}],"xs":[1,2]}}""")
    Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    def run(jp: String) = Chain.readJsonInferred(spark, dir.toString,
      jmespath = Some(jp)).toDF
    // index into the array, then struct re-root
    assert(run("p.items[0]").select("id").as[Long].collect().toSet
      === Set(1L, 4L))
    // negative index = from the end
    assert(run("p.items[-1]").select("id").as[Long].collect().toSet
      === Set(3L, 4L))
    // filter on an element field, then explode — only tag=='x' rows
    assert(run("p.items[?tag == 'x'][*]").select("id").as[Long]
      .collect().toSet === Set(1L, 3L))
    // numeric filter
    assert(run("p.items[?v >= 30][*]").select("id").as[Long]
      .collect().toSet === Set(3L, 4L))
    // slice then explode (scalar array keeps its field name)
    assert(run("p.xs[1:3][*]").select("xs").as[Long].collect().toSeq.sorted
      === Seq(2L, 8L, 9L))
    // open-ended slice
    assert(run("p.xs[2:][*]").select("xs").as[Long].collect().toSeq.sorted
      === Seq(9L, 10L))
    // unsupported op fails loudly, not silently
    intercept[IllegalArgumentException] {
      run("p.items[?nope~3]")
    }
    // multiselect hash after an explode: reshape each element row
    assert(run("p.items[*].{key: id, label: tag}").as[(Long, String)]
      .collect().toSet ===
      Set((1L, "x"), (2L, "y"), (3L, "x"), (4L, "y")))
    // multiselect with a dotted path after an index step
    assert(run("p.items[0].{key: id, label: tag}")
      .as[(Long, String)].collect().toSet === Set((1L, "x"), (4L, "y")))
    // bracket ops inside multiselect paths are rejected loudly
    intercept[IllegalArgumentException] {
      run("p.{t: items[0].tag}")
    }
  }

  test("jmespath functions and pipes compile to Catalyst HOFs") {
    val dir = Files.createTempDirectory("jsonl3")
    val lines = Seq(
      """{"p":{"items":[{"id":1,"tag":"x","v":30,"m":{"s":5}},{"id":2,"tag":"y","v":10,"m":{"s":9}},{"id":3,"tag":"x","v":20,"m":{"s":1}}],"xs":[7,10,9,8],"names":["b","a","c"],"neg":-2.5,"nest":[[1,2],[3]]}}""",
      """{"p":{"items":[{"id":4,"tag":"y","v":40,"m":{"s":4}}],"xs":[2,1],"names":["z"],"neg":-2.5,"nest":[[4]]}}""")
    Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    def run(jp: String) = Chain.readJsonInferred(spark, dir.toString,
      jmespath = Some(jp)).toDF
    // length() on arrays — the pipe re-roots, @ is the piped value
    assert(run("p.items | length(@)").as[Long].collect().toSet
      === Set(3L, 1L))
    // length() on a string field
    assert(run("p.names[0] | length(@)").as[Long].collect().toSet
      === Set(1L))
    // min/max over the piped array
    assert(run("p.xs | max(@)").as[Long].collect().toSet === Set(10L, 2L))
    assert(run("p.xs | min(@)").as[Long].collect().toSet === Set(7L, 1L))
    // reverse + index: last element
    assert(run("p.xs | reverse(@)[0]").as[Long].collect().toSet
      === Set(8L, 1L))
    // join over a string array
    assert(run("p.names | join('-', @)").as[String].collect().toSet
      === Set("b-a-c", "z"))
    // sort_by with a field key, then take the max element + reshape
    assert(run("p.items | sort_by(@, &v) | reverse(@)[0].{id: id, v: v}")
      .as[(Long, Long)].collect().toSet === Set((1L, 30L), (4L, 40L)))
    // sort_by then explode preserves sorted order within each doc
    assert(run("p.items | sort_by(@, &v)[0].v").as[Long].collect().toSet
      === Set(10L, 40L))
    // contains() over arrays and strings (substring semantics)
    assert(run("p.names | contains(@, 'a')").as[Boolean].collect().toSet
      === Set(true, false))
    assert(run("p.names[0] | contains(@, 'b')").as[Boolean].collect().toSet
      === Set(true, false))
    // starts_with() on a string field
    assert(run("p.names[0] | starts_with(@, 'b')").as[Boolean].collect().toSet
      === Set(true, false))
    // to_number() parses strings, null for unparsable (names are letters)
    assert(run("p.names[0] | to_number(@)").as[Option[Double]].collect().toSet
      === Set(None))
    // nested function calls are out of the supported subset — fail fast
    intercept[IllegalArgumentException](run("p | to_number(join('', names))"))
    // map(&field, array) projects each element, composes with index/agg
    assert(run("p | map(&v, items)[0]").as[Long].collect().toSet
      === Set(30L, 40L))
    assert(run("p.map(&v, items) | max(@)").as[Long].collect().toSet
      === Set(30L, 40L))
    // not_null picks the first non-null argument
    assert(run("p.items[0] | not_null(tag, id)").as[String].collect().toSet
      === Set("x", "y"))
    // ends_with / to_string on scalars
    assert(run("p.names[0] | ends_with(@, 'b')").as[Boolean].collect().toSet
      === Set(true, false))
    assert(run("p.xs[0] | to_string(@)").as[String].collect().toSet
      === Set("7", "2"))
    // numeric fns in the jmespath number domain
    assert(run("p.abs(neg)").as[Double].collect().toSet === Set(2.5))
    assert(run("p.ceil(neg)").as[Long].collect().toSet === Set(-2L))
    assert(run("p.floor(neg)").as[Long].collect().toSet === Set(-3L))
    assert(run("p.xs | sum(@)").as[Double].collect().toSet === Set(34.0, 3.0))
    assert(run("p.xs | avg(@)").as[Double].collect().toSet === Set(8.5, 1.5))
    // min_by/max_by pick whole elements by key
    assert(run("p.items | min_by(@, &v).v").as[Long].collect().toSet
      === Set(10L, 40L))
    assert(run("p.items | max_by(@, &v).id").as[Long].collect().toSet
      === Set(1L, 4L))
    // min_by of an EMPTY array (filter matches nothing) is null, not an
    // ANSI element_at crash
    assert(run("p.items[?tag == 'zz'] | min_by(@, &v)").collect()
      .forall(_.isNullAt(0)))
    // [] on an ALREADY-FLAT array passes through unchanged (jmespath
    // spec: non-list elements are kept as-is)
    assert(run("p.names[] | length(@)").as[Long].collect().toSet
      === Set(3L, 1L))
    // [] flatten projection merges one nesting level
    assert(run("p.nest[] | length(@)").as[Long].collect().toSet
      === Set(3L, 1L))
    assert(run("p.nest[] | sum(@)").as[Double].collect().toSet
      === Set(6.0, 4.0))
    // multiselect LIST: selections pack into one array column "values";
    // same-type stays typed, mixed types coerce to string
    assert(run("p.[neg, neg]").schema.head.name === "values")
    assert(run("p.xs | [0:2] | length(@)").as[Long].collect().toSet
      === Set(2L))
    assert(run("p.[names, xs] | length(@)").as[Long].collect().toSet
      === Set(2L)) // two selections → a 2-element (string-coerced) list
    // standalone bracket ops on the piped root
    assert(run("p.xs | [0]").as[Long].collect().toSet === Set(7L, 2L))
    assert(run("p.items | sort_by(@, &v) | [0].v").as[Long].collect().toSet
      === Set(10L, 40L))
    assert(run("p.items | [?tag == 'x'] | length(@)")
      .as[Long].collect().toSet === Set(2L, 0L))
    // dotted &expression key: pick by a NESTED field
    assert(run("p.items | max_by(@, &m.s).id").as[Long].collect().toSet
      === Set(2L, 4L))
    intercept[IllegalArgumentException](run("p.items | sort_by(@, &)"))
    // functions need well-formed args
    intercept[IllegalArgumentException](run("p.xs | join(@)"))
    intercept[IllegalArgumentException](run("p.items | sort_by(@, v)"))
    intercept[IllegalArgumentException](run("p | map(v, items)"))
    intercept[IllegalArgumentException](run("p | not_null()"))
    // unknown function name is still an unsupported segment
    intercept[org.apache.spark.sql.AnalysisException](
      run("p.xs | nope(@)").collect())
  }

  test("file-stats skipping: selective filters read fewer files, same rows") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats").toString, spark)
    // range layout on o_orderkey → files hold disjoint key ranges, the
    // regime where min/max skipping prunes hardest
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(8, col("o_orderkey"))
    cat.save(Chain(orders), "ord")
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    val pred = col("o_orderkey") <= maxKey / 10
    val (kept, total) = cat.pruneCount("ord", pred)
    assert(total === 8, s"expected 8 files, got $total")
    assert(kept < total && kept >= 1, s"kept=$kept of $total")
    // pruned read ≡ unpruned filter, row for row
    val pruned = cat.readDatasetWhere("ord", pred)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("ord").selectExcept("sys").toDF
      .filter(pred).collect().toSet
    assert(pruned === full && pruned.nonEmpty)
    // range predicates, equality, IN, AND/OR compose
    val (k2, _) = cat.pruneCount("ord",
      col("o_orderkey") > maxKey - maxKey / 10 && col("o_orderkey").isNotNull)
    assert(k2 < total, s"k2=$k2")
    val (k3, _) = cat.pruneCount("ord", col("o_orderkey") === 1L)
    assert(k3 === 1, s"equality should hit one range file, got $k3")
    // out-of-domain equality prunes everything; the read still answers
    val (k0, _) = cat.pruneCount("ord", col("o_orderkey") === -42L)
    assert(k0 === 0)
    assert(cat.readDatasetWhere("ord", col("o_orderkey") === -42L)
      .toDF.count() === 0L)
    // unsupported shape (arithmetic over the column) degrades to keep-all
    val (kAll, _) = cat.pruneCount("ord", col("o_orderkey") * 2 < 10)
    assert(kAll === total)
  }

  test("file-stats skipping: string prefix predicates prune on min/max") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats_pfx").toString,
      spark)
    // 4 files with EXACTLY disjoint path ranges: hive-partitioned on the
    // dir letter, one file per dir=a…d holding 50 paths (sampling-free —
    // repartitionByRange could split a dir across files)
    val paths = spark.range(200).selectExpr(
      "chr(97 + id div 50) as dir",
      "concat('s3://b/', chr(97 + id div 50), '/', lpad(id % 50, 3, '0'))" +
        " as path", "id as n").coalesce(1)
    cat.save(Chain(paths), "pfx", partitionBy = Seq("dir"))
    val total4 = 4
    // startsWith on one directory hits exactly its file
    val (k1, t1) = cat.pruneCount("pfx", col("path").startsWith("s3://b/b/"))
    assert(t1 === total4 && k1 === 1, s"k1=$k1 t1=$t1")
    // LIKE 'p%' spells the same prune
    val (k2, _) = cat.pruneCount("pfx", col("path").like("s3://b/c/%"))
    assert(k2 === 1, s"k2=$k2")
    // a prefix past every max prunes everything; the read still answers
    val (k0, _) = cat.pruneCount("pfx", col("path").startsWith("s3://z/"))
    assert(k0 === 0)
    assert(cat.readDatasetWhere("pfx", col("path").startsWith("s3://z/"))
      .toDF.count() === 0L)
    // the shared bucket prefix keeps all files (and loses no rows)
    val (kA, _) = cat.pruneCount("pfx", col("path").startsWith("s3://b/"))
    assert(kA === total4)
    // NOT(startsWith): files whose whole range shares the prefix drop
    val (kN, _) = cat.pruneCount("pfx", !col("path").startsWith("s3://b/b/"))
    assert(kN === 3, s"kN=$kN")
    // inner wildcards stay unsupported → keep-all, rows still exact
    val (kW, _) = cat.pruneCount("pfx", col("path").like("s3://b/_/00%"))
    assert(kW === total4)
    val pred = col("path").startsWith("s3://b/b/")
    val pruned = cat.readDatasetWhere("pfx", pred)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("pfx").selectExcept("sys").toDF
      .filter(pred).collect().toSet
    assert(pruned === full && pruned.size === 50)
  }

  test("stats tiers: parquet index past inlineMaxFiles ≡ inline stats.json") {
    import graft.catalog.Catalog
    val confKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(confKey)
    try {
      val rootP = Files.createTempDirectory("fstats_tier").toString
      val cat = new Catalog(rootP, spark)
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(8, col("o_orderkey"))
      spark.conf.set(confKey, "4") // 8 files > 4 → executor-written tier
      cat.save(Chain(orders), "big")
      val vb = cat.latestVersion("big").get
      val vdir = java.nio.file.Paths.get(rootP, "datasets", "big", s"v$vb")
      assert(!Files.exists(vdir.resolve("stats.json")))
      assert(Files.isDirectory(vdir.resolve("stats")),
        "past the threshold the index must be the stats/ parquet table")
      spark.conf.set(confKey, "512") // inline control twin
      cat.save(Chain(orders), "small")
      val vsm = cat.latestVersion("small").get
      assert(Files.exists(java.nio.file.Paths.get(rootP, "datasets",
        "small", s"v$vsm", "stats.json")))
      val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
      // parity matrix: every predicate shape prunes identically and the
      // pruned read stays row-identical to the unpruned filter
      val preds = Seq(
        col("o_orderkey") <= maxKey / 10,
        col("o_orderkey") === 1L,
        col("o_orderkey") === -42L,            // out-of-domain: prune all
        col("o_orderkey").isin(1L, maxKey),
        col("o_orderkey") * 2 < 10)            // unsupported: keep all
      preds.foreach { p =>
        assert(cat.pruneCount("big", p) === cat.pruneCount("small", p),
          s"tier prune disagreement on $p")
        val tiered = cat.readDatasetWhere("big", p)
          .selectExcept("sys").toDF.collect().toSet
        val inline = cat.readDatasetWhere("small", p)
          .selectExcept("sys").toDF.collect().toSet
        assert(tiered === inline, s"tier read disagreement on $p")
      }
      // restricted load: only the wanted column (plus census) crosses
      val restricted = cat.fileStatsFor("big", vb, Some(Seq("o_orderkey")))
      assert(restricted.size === 8)
      assert(restricted.forall(_.cols.keySet.subsetOf(Set("o_orderkey"))))
      val census = cat.fileStatsFor("big", vb, Some(Nil))
      assert(census.size === 8 && census.forall(_.cols.isEmpty))
      assert(census.map(_.rows).sum === orders.count())
      // a cow mutation on the parquet tier keeps the tier, the row
      // arithmetic, and pruned-read correctness
      val before = cat.readDataset("big").toDF.count()
      val res = cat.deleteWhere("big", col("o_orderkey") === 1L)
      val vdir2 = java.nio.file.Paths.get(rootP, "datasets", "big",
        s"v${res.version}")
      assert(!Files.exists(vdir2.resolve("stats.json")))
      assert(Files.isDirectory(vdir2.resolve("stats")))
      assert(res.rowsAfter === before - 1)
      assert(cat.readDataset("big").toDF.count() === before - 1)
      val p2 = col("o_orderkey") <= maxKey / 10
      val prunedAfter = cat.readDatasetWhere("big", p2)
        .selectExcept("sys").toDF.collect().toSet
      val fullAfter = cat.readDataset("big").selectExcept("sys").toDF
        .filter(p2).collect().toSet
      assert(prunedAfter === fullAfter && prunedAfter.nonEmpty)
      val (keptAfter, totalAfter) = cat.pruneCount("big", p2)
      assert(keptAfter < totalAfter,
        s"rebuilt index must still prune: $keptAfter/$totalAfter")
      // zero-copy clone carries the index BY POINTER (indexFrom): no
      // physical stats dir of its own, pruning identical to the source
      cat.cloneDataset("big", "big2")
      val vc = cat.latestVersion("big2").get
      assert(!Files.isDirectory(java.nio.file.Paths.get(rootP, "datasets",
        "big2", s"v$vc", "stats")),
        "clone must not materialize an index tree")
      assert(cat.pruneCount("big2", p2)._1 === keptAfter)
    } finally prev match {
      case Some(x) => spark.conf.set(confKey, x)
      case None => spark.conf.unset(confKey)
    }
  }

  test("file-stats skipping prunes on string min/max too") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats_s").toString, spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .repartitionByRange(4, col("lang"))
    cat.save(Chain(docs), "docs")
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    val first = langs.head
    val (kept, total) = cat.pruneCount("docs", col("lang") === first)
    assert(total === 4 && kept < total, s"kept=$kept of $total")
    val pruned = cat.readDatasetWhere("docs", col("lang") === first)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("docs").selectExcept("sys").toDF
      .filter(col("lang") === first).collect().toSet
    assert(pruned === full && pruned.nonEmpty)
    // stats.json round-trips through its parser
    val v = cat.latestVersion("docs").get
    val stats = cat.fileStats("docs", v)
    assert(stats.size === 4)
    assert(stats.forall(_.cols.contains("lang")))
    assert(stats.map(_.rows).sum === docs.count())
  }

  test("file-stats string pruning uses UTF-8 byte order, not UTF-16") {
    // "￿" encodes EF BF BF; an emoji surrogate pair encodes
    // F0 9F 98 80 — UTF-8 byte order says ￿ < emoji (Spark's filter
    // semantics), Java String order says the opposite. A Java-order
    // comparator would prune the ￿ file under `col <= emoji` and
    // silently drop its rows.
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats_u8").toString, spark)
    val rows = Seq((1L, "￿"), (2L, "😀"), (3L, "apple"))
      .toDF("id", "s")
      .repartitionByRange(3, col("s")) // one string per file
    cat.save(Chain(rows), "uni")
    val pred = col("s") <= "😀"
    val pruned = cat.readDatasetWhere("uni", pred)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("uni").selectExcept("sys").toDF
      .filter(pred).collect().toSet
    assert(pruned === full, s"pruned=$pruned full=$full")
    assert(pruned.size === 3) // all of apple, ￿, emoji match in UTF-8 order
  }

  /** Writes `rows` through a catalog save with a tiny parquet block size
    * so ONE data file carries multiple row groups, then hands back
    * (catalog, #rowGroups of the single data file). Restores the conf. */
  private def saveMultiRowGroup(catDirPrefix: String, name: String,
                                rows: org.apache.spark.sql.DataFrame)
      : (graft.catalog.Catalog, Int) = {
    import graft.catalog.Catalog
    val hc = spark.sparkContext.hadoopConfiguration
    val prior = Option(hc.get("parquet.block.size"))
    hc.setInt("parquet.block.size", 1024) // flush a group every ~100 rows
    val cat =
      try {
        val c = new Catalog(Files.createTempDirectory(catDirPrefix).toString, spark)
        c.save(Chain(rows.coalesce(1)), name)
        c
      } finally prior match {
        case Some(p) => hc.set("parquet.block.size", p)
        case None => hc.unset("parquet.block.size")
      }
    val v = cat.latestVersion(name).get
    val dataDir = new java.io.File(s"${cat.root}/datasets/$name/v$v/data")
    val pq = dataDir.listFiles.filter(_.getName.endsWith(".parquet"))
    assert(pq.length === 1, s"expected one data file, got ${pq.toSeq}")
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(pq.head.toString),
      new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val groups = try reader.getFooter.getBlocks.size finally reader.close()
    (cat, groups)
  }

  test("file-stats merge combines row-group string min/max in UTF-8 order") {
    // One FILE, several row groups: early groups hold only U+FFFF strings,
    // the last only emoji (surrogate pairs). Merging group envelopes with
    // Java's UTF-16 order would pick the emoji as the FILE min (D83D <
    // FFFF in code units), and `s <= "￿…"` would then prove
    // `min > literal` and prune the file — losing all 150 matching rows.
    val pad = "x" * 50
    val rows = spark.range(300).toDF("id")
      .withColumn("s", when(col("id") < 150, lit("￿" + pad))
        .otherwise(lit("😀" + pad)))
      .sortWithinPartitions("id")
    val (cat, groups) = saveMultiRowGroup("fstats_mrg", "uni2", rows)
    assert(groups >= 2, s"need a multi-row-group file, got $groups group(s)")
    val pred = col("s") <= "￿" + pad
    val pruned = cat.readDatasetWhere("uni2", pred)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("uni2").selectExcept("sys").toDF
      .filter(pred).collect().toSet
    assert(pruned === full, s"pruned lost ${full.size - pruned.size} rows")
    assert(pruned.size === 150)
  }

  test("a non-finite row group evicts the column's stats in either order") {
    // Finite-then-Inf: the Inf group arrives AFTER bounds were
    // accumulated — the accumulated entry must be evicted, not kept as a
    // partial envelope that excludes the Inf rows (and vice versa).
    for ((name, infFirst) <- Seq(("inf_last", false), ("inf_first", true))) {
      val rows = spark.range(300).toDF("id")
        .withColumn("d", when(col("id") < 150,
          lit(if (infFirst) Double.PositiveInfinity else 1.5))
          .otherwise(lit(if (infFirst) 2.5 else Double.PositiveInfinity)))
        .sortWithinPartitions("id")
      val (cat, groups) = saveMultiRowGroup(s"fstats_$name", name, rows)
      assert(groups >= 2, s"need a multi-row-group file, got $groups group(s)")
      val v = cat.latestVersion(name).get
      cat.fileStats(name, v).foreach { f =>
        assert(!f.cols.contains("d"),
          s"$name: poisoned column must carry NO envelope, got ${f.cols.get("d")}")
      }
      val pred = col("d") <= 2.0
      val (kept, total) = cat.pruneCount(name, pred)
      assert(kept === total)
    }
  }

  test("file-stats tolerate non-finite double footer min/max") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats_inf").toString, spark)
    val rows = Seq((1L, 1.5), (2L, Double.PositiveInfinity),
      (3L, Double.NegativeInfinity), (4L, 2.5)).toDF("id", "d")
      .repartition(2)
    cat.save(Chain(rows), "inf") // harvest must not record ±Inf bounds
    val v = cat.latestVersion("inf").get
    // stats.json stays parseable and any recorded d-bounds are finite
    cat.fileStats("inf", v).foreach(_.cols.get("d").foreach { c =>
      if (c.kind == "d")
        assert(java.lang.Double.isFinite(c.minD) && java.lang.Double.isFinite(c.maxD))
    })
    // pruned reads over the column neither throw nor drop rows
    val pred = col("d") <= 2.0
    val pruned = cat.readDatasetWhere("inf", pred)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("inf").selectExcept("sys").toDF
      .filter(pred).collect().toSet
    assert(pruned === full && pruned.nonEmpty)
    val (kept, total) = cat.pruneCount("inf", pred)
    assert(kept === total) // stats-less column degrades to keep-all
  }

  test("bloom index prunes equality lookups where min/max ranges overlap") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fbloom").toString, spark)
    // hash layout: every file's event_id range spans ~the whole domain,
    // so min/max can NEVER prune an equality — the bloom regime
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type").repartition(8)
    cat.save(Chain(ev), "ev", bloomCols = Seq("event_id", "event_type"))
    val someId = ev.agg(min("event_id")).head().getLong(0) + 7
    val (keptRange, total) = cat.pruneCount("ev", col("event_id") === someId)
    assert(total === 8 && keptRange <= 3,
      s"bloom should localize the key to ~1 file (+fp), kept $keptRange")
    // parity with the full-scan filter
    val pruned = cat.readDatasetWhere("ev", col("event_id") === someId)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("ev").selectExcept("sys").toDF
      .filter(col("event_id") === someId).collect().toSet
    assert(pruned === full && pruned.nonEmpty)
    // a value present in EVERY file must not be falsely pruned
    val (keptAll, _) = cat.pruneCount("ev", col("event_type") === "view")
    assert(keptAll === 8)
    // an absent value inside the min/max range prunes everything
    val (keptNone, _) = cat.pruneCount("ev",
      col("event_type") === "no_such_type")
    assert(keptNone === 0)
    assert(cat.readDatasetWhere("ev", col("event_type") === "no_such_type")
      .toDF.count() === 0L)
    // IN lists check each literal; un-bloomed columns stay range-only
    val (keptIn, _) = cat.pruneCount("ev",
      col("event_id").isin(someId, someId + 1))
    assert(keptIn <= 5, s"keptIn=$keptIn")
    val (keptOther, _) = cat.pruneCount("ev", col("user_id") === 1L)
    assert(keptOther === 8)
    // unsupported bloom column types fail the save fast
    intercept[IllegalArgumentException] {
      val ts = spark.read.parquet(s"$sf/events.parquet").select("event_id", "ts")
      cat.save(Chain(ts), "ev_bad", bloomCols = Seq("ts"))
    }
  }

  test("parquet bloom index (executor-written) matches the inline-json path") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fbloom_pq").toString, spark)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type").repartition(8)
    // force the scale path: every save routes blooms through the
    // executor-written parquet index instead of a driver collect
    spark.conf.set("graft.bloom.inlineMaxFiles", "0")
    try cat.save(Chain(ev), "evp", bloomCols = Seq("event_id", "event_type"))
    finally spark.conf.unset("graft.bloom.inlineMaxFiles")
    val v = cat.latestVersion("evp").get
    val vdir = java.nio.file.Paths.get(cat.root, "datasets", "evp", s"v$v")
    assert(java.nio.file.Files.isDirectory(vdir.resolve("blooms")),
      "scale path must write a blooms/ parquet index")
    assert(!java.nio.file.Files.exists(vdir.resolve("blooms.json")),
      "scale path must not also write inline blooms.json")
    // identical pruning behavior to the inline path
    val someId = ev.agg(min("event_id")).head().getLong(0) + 7
    val (keptRange, total) = cat.pruneCount("evp", col("event_id") === someId)
    assert(total === 8 && keptRange <= 3, s"kept $keptRange of $total")
    val pruned = cat.readDatasetWhere("evp", col("event_id") === someId)
      .selectExcept("sys").toDF.collect().toSet
    val full = cat.readDataset("evp").selectExcept("sys").toDF
      .filter(col("event_id") === someId).collect().toSet
    assert(pruned === full && pruned.nonEmpty)
    val (keptNone, _) = cat.pruneCount("evp",
      col("event_type") === "no_such_type")
    assert(keptNone === 0)
    // the wanted-columns load restricts what crosses to the driver
    val one = cat.fileBlooms("evp", v, Some(Seq("event_type")))
    assert(one.nonEmpty && one.values.forall(_.keySet === Set("event_type")))
    assert(cat.fileBlooms("evp", v, Some(Seq("user_id"))).isEmpty)
    // full load (maintenance view) still returns both columns
    val all = cat.fileBlooms("evp", v)
    assert(all.size === 8 &&
      all.values.forall(_.keySet === Set("event_id", "event_type")))
    // repeated pruned reads hit the bloom cache — no Spark job per call
    val loads0 = cat.bloomLoads
    cat.pruneCount("evp", col("event_id") === someId)
    cat.pruneCount("evp", col("event_id") === someId + 1)
    assert(cat.bloomLoads === loads0,
      s"repeat lookups must not reload the index (+${cat.bloomLoads - loads0})")
  }

  test("partitioned dataset versions: dir layout + stats/bloom skip compose") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("cat_part").toString, spark)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .repartitionByRange(4, col("doc_id"))
    val v = cat.save(Chain(docs), "docs", partitionBy = Seq("lang"),
      bloomCols = Seq("doc_id"))
    // hive layout on disk; stats/bloom keys carry the partition subdir
    val dataDir = java.nio.file.Paths.get(cat.root, "datasets", "docs",
      s"v$v", "data")
    import scala.jdk.CollectionConverters._
    val subdirs = Files.list(dataDir).iterator.asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("lang=")), subdirs)
    val stats = cat.fileStats("docs", v)
    assert(stats.nonEmpty && stats.forall(_.file.startsWith("lang=")),
      stats.map(_.file).take(3))
    assert(stats.map(_.rows).sum === docs.count())
    val blooms = cat.fileBlooms("docs", v)
    assert(blooms.nonEmpty && blooms.keys.forall(_.startsWith("lang=")))
    // read-back parity: partition column recovered, full row set intact
    val back = cat.readDataset("docs").selectExcept("sys").toDF
    assert(back.columns.toSet === docs.columns.toSet)
    assert(back.select(docs.columns.map(col): _*).collect().toSet
      === docs.collect().toSet)
    // pruned read on a NON-partition column: files skipped, partition
    // column still present and correct in the result
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val pred = col("doc_id") <= maxId / 10
    val (kept, total) = cat.pruneCount("docs", pred)
    assert(kept < total, s"kept=$kept total=$total")
    val pruned = cat.readDatasetWhere("docs", pred)
      .selectExcept("sys").toDF
    assert(pruned.columns.contains("lang"))
    assert(pruned.select(docs.columns.map(col): _*).collect().toSet
      === docs.filter(pred).collect().toSet)
    // bloom equality skip works through partition subdirs too
    val someId = maxId / 2
    val prunedEq = cat.readDatasetWhere("docs", col("doc_id") === someId)
      .selectExcept("sys").toDF
    assert(prunedEq.select(docs.columns.map(col): _*).collect().toSet
      === docs.filter(col("doc_id") === someId).collect().toSet)
    // a partition-column predicate stays conservative at the stats layer
    // (footers can't see it) — Spark's own directory pruning applies at
    // scan time and parity holds
    val first = docs.select("lang").as[String].head()
    val byLang = cat.readDatasetWhere("docs", col("lang") === first)
      .selectExcept("sys").toDF
    assert(byLang.select(docs.columns.map(col): _*).collect().toSet
      === docs.filter(col("lang") === first).collect().toSet)
  }

  test("relativize keeps partition subdirs across scheme/relative bases") {
    import graft.catalog.FileStats.relativize
    // scheme-qualified executor path vs plain base
    assert(relativize("/wh/d/v1/data",
      "file:/wh/d/v1/data/lang=en/part-0.parquet") === "lang=en/part-0.parquet")
    assert(relativize("/wh/d/v1/data",
      "/wh/d/v1/data/part-0.parquet") === "part-0.parquet")
    // RELATIVE warehouse root: base absolutizes before the strip, so the
    // partition subdir survives instead of collapsing to a basename
    val cwd = java.nio.file.Paths.get("").toAbsolutePath
    assert(relativize("relwh/d/v1/data",
      s"file:$cwd/relwh/d/v1/data/lang=en/part-0.parquet")
      === "lang=en/part-0.parquet")
    // unmatchable base falls back to the /data/ anchor, keeping subdirs
    assert(relativize("/somewhere/else",
      "file:/wh/d/v1/data/lang=en/part-0.parquet") === "lang=en/part-0.parquet")
  }

  test("partition columns round-trip their saved types and raw values") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("cat_ptype").toString, spark)
    // numeric-LOOKING string keys ("00".."03") and a real long key —
    // inference would turn "00" into the int 0 and lose the leading zero
    val df = spark.range(40).select(col("id"),
      format_string("%02d", pmod(col("id"), lit(4))).as("shard"),
      pmod(col("id"), lit(3)).as("bucket"))
    val v = cat.save(Chain(df), "typed", partitionBy = Seq("shard", "bucket"))
    val back = cat.readDataset("typed").selectExcept("sys").toDF
    assert(back.schema("shard").dataType.typeName === "string")
    assert(back.schema("bucket").dataType.typeName === "long")
    assert(back.select("id", "shard", "bucket").collect().toSet
      === df.collect().toSet)
    // the pruned-read path restores types the same way
    val pruned = cat.readDatasetWhere("typed", col("id") <= 10L)
      .selectExcept("sys").toDF
    assert(pruned.schema("shard").dataType.typeName === "string")
    assert(pruned.select("id", "shard", "bucket").collect().toSet
      === df.filter(col("id") <= 10L).collect().toSet)
    // OPTIMIZE preserves the detected layout by default and the values
    // survive byte-for-byte (no inferred-int corruption lands on disk)
    val (v2, _, _) = cat.optimize("typed", nFiles = 2)
    assert(v2 > v)
    val d2 = java.nio.file.Paths.get(cat.root, "datasets", "typed",
      s"v$v2", "data")
    import scala.jdk.CollectionConverters._
    assert(Files.list(d2).iterator.asScala.filter(Files.isDirectory(_))
      .forall(_.getFileName.toString.startsWith("shard=")))
    val opt = cat.readDataset("typed").selectExcept("sys").toDF
    assert(opt.schema("shard").dataType.typeName === "string")
    assert(opt.select("id", "shard", "bucket").collect().toSet
      === df.collect().toSet)
  }

  test("file-stats skipping: null-aware IS NULL pruning, conservative NOT") {
    import graft.catalog.Catalog
    val cat = new Catalog(Files.createTempDirectory("fstats_n").toString, spark)
    // file 0: no nulls (v in 1..50); file 1: half null
    val df = (1 to 100).map(i =>
        (i.toLong, if (i > 50 && i % 2 == 0) None else Some(i.toLong)))
      .toDF("id", "v").repartitionByRange(2, col("id"))
    cat.save(Chain(df), "nulled")
    val (keptNull, total) = cat.pruneCount("nulled", col("v").isNull)
    assert(total === 2 && keptNull === 1, s"keptNull=$keptNull")
    val got = cat.readDatasetWhere("nulled", col("v").isNull)
      .toDF.count()
    assert(got === 25L)
    // NOT(=) prunes only a constant file; here values vary → keep both
    val (keptNe, _) = cat.pruneCount("nulled", !(col("id") === 1L))
    assert(keptNe === 2)
    // but a file whose column is a single constant CAN be pruned by NOT(=)
    val cat2 = new Catalog(Files.createTempDirectory("fstats_c").toString, spark)
    val const = (1 to 40).map(i => (i.toLong, if (i <= 20) "a" else "b"))
      .toDF("id", "tag").repartitionByRange(2, col("tag"))
    cat2.save(Chain(const), "tags")
    val (keptNotA, tot2) = cat2.pruneCount("tags", !(col("tag") === "a"))
    assert(tot2 === 2 && keptNotA === 1, s"keptNotA=$keptNotA")
    assert(cat2.readDatasetWhere("tags", !(col("tag") === "a"))
      .toDF.count() === 20L)
  }

  test("zip source: central-directory listing + lazy stored/deflate reads") {
    import graft.files.{FileOps, ZipArchive}
    val dir = Files.createTempDirectory("zipsrc")
    val texts = (0 until 6).map(i => i -> ("payload-" * (i + 1) + i)).toMap
    def writeZip(name: String, ids: Seq[Int], comment: Option[String]): Unit = {
      val zos = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(dir.resolve(name)))
      ids.foreach { i =>
        val bytes = texts(i).getBytes("UTF-8")
        val e = new java.util.zip.ZipEntry(s"m$i.txt")
        if (i % 2 == 0) { // stored
          e.setMethod(java.util.zip.ZipEntry.STORED)
          e.setSize(bytes.length.toLong)
          e.setCompressedSize(bytes.length.toLong)
          val crc = new java.util.zip.CRC32(); crc.update(bytes)
          e.setCrc(crc.getValue)
        }
        zos.putNextEntry(e); zos.write(bytes); zos.closeEntry()
      }
      // a directory entry must be skipped by the listing
      zos.putNextEntry(new java.util.zip.ZipEntry("sub/")); zos.closeEntry()
      comment.foreach(zos.setComment) // EOCD scan must step over comments
      zos.close()
    }
    writeZip("a.zip", Seq(0, 1, 2), None)
    writeZip("b.zip", Seq(3, 4, 5), Some("trailing archive comment"))

    val listed = FileOps.readZip(spark, dir.toString + "/*.zip")
    val rows = FileOps.withTextContent(listed).toDF
      .select(col("file.path"), col("file.size"), col("content"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq ===
      (0 to 2).map(i => s"a.zip/m$i.txt") ++ (3 to 5).map(i => s"b.zip/m$i.txt"))
    rows.foreach { case (path, size, content) =>
      val i = path.replaceAll(".*/m(\\d+)\\.txt", "$1").toInt
      assert(content === texts(i), path)
      assert(size === texts(i).getBytes("UTF-8").length.toLong, path)
    }
    // deflated members really are smaller on disk than their payload
    val meta = ZipArchive.centralDirectory(
      new org.apache.hadoop.fs.Path(dir.resolve("b.zip").toUri)
        .getFileSystem(new org.apache.hadoop.conf.Configuration()),
      new org.apache.hadoop.fs.Path(dir.resolve("b.zip").toUri))
    val m5 = meta.find(_.name == "m5.txt").get
    assert(m5.method === 8 && m5.compSize < m5.uncompSize)
    // EXPORT path (FileRef.open streams) must dispatch zip members like
    // readBytes does: raw-range streaming exported header-prefixed,
    // truncated, possibly-deflated garbage while readBytes looked fine
    val dest = Files.createTempDirectory("zipexp").toString
    graft.files.FileOps.toStorage(listed.toDF, dest, placement = "fullpath")
    (0 to 2).foreach { i =>
      val got = Files.readString(
        java.nio.file.Paths.get(dest, "a.zip", s"m$i.txt"))
      assert(got === texts(i), s"exported zip member m$i corrupt")
    }
  }

  test("webdataset sample keys split at the FIRST dot; io edge fixes") {
    import graft.files.{FileOps, WebDataset}
    // first-dot grouping: img.jpg + img.seg.png are ONE sample
    assert(WebDataset.splitKey("d/0001.jpg") === ("d/0001", "jpg"))
    assert(WebDataset.splitKey("d/0001.seg.png") === ("d/0001", "seg.png"))
    assert(WebDataset.splitKey("d/noext") === ("d/noext", ""))
    // globstar matches ZERO segments: **/*.txt finds a root-level file
    val d = Files.createTempDirectory("globz")
    Files.writeString(d.resolve("root.txt"), "r")
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("sub/deep.txt"), "s")
    val paths = FileOps.readStorage(spark, d.toString, Some("**/*.txt"))
      .toDF.select("file.path").as[String].collect().sorted.toSeq
    assert(paths === Seq("root.txt", "sub/deep.txt"), paths)
    // placement=etag on a dot-less basename falls back to .bin, and a
    // dotted DIRECTORY never leaks into the extension
    def ref(path: String, etag: String) = graft.files.FileRef(
      d.toString, path, 1L, "", etag, true,
      new java.sql.Timestamp(0L), "")
    assert(FileOps.placementPath(ref("docs/README", "E1"), "etag") === "E1.bin")
    assert(FileOps.placementPath(ref("v1.2/data", "E2"), "etag") === "E2.bin")
    // resolve() builds the SAME etag shape as listing rows
    val listed2 = FileOps.readStorage(spark, d.toString, Some("root.txt"))
      .toDF.select("file.etag").as[String].head()
    val resolved = ref("root.txt", "stale").resolve()
    assert(resolved.etag === listed2, s"$listed2 vs ${resolved.etag}")
  }

  test("warc source: streaming records, multi-member gzip, http split") {
    import graft.files.Warc
    val dir = Files.createTempDirectory("warcsrc")
    def rec(t: String, uri: String, body: Array[Byte],
            ct: String = "application/http; msgtype=response") =
      (Map("WARC-Type" -> t, "WARC-Record-ID" -> s"<urn:uuid:$t-$uri>",
        "WARC-Date" -> "2026-03-04T05:06:07Z", "WARC-Target-URI" -> uri,
        "Content-Type" -> ct), body)
    val http = "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n"
    // .warc.gz: one gzip member per record (CC convention)
    val gz = Files.newOutputStream(dir.resolve("a.warc.gz"))
    Warc.writeRecords(gz, Iterator(
      rec("response", "http://x/1", (http + "hello").getBytes("UTF-8")),
      rec("request", "http://x/1", "GET /1 HTTP/1.1\r\n\r\n".getBytes("UTF-8"),
        ct = "application/http; msgtype=request"),
      // headerless-HTTP payload: split must pass it through whole
      rec("resource", "http://x/2", "raw bytes no framing".getBytes("UTF-8"),
        ct = "text/plain")))
    // plain .warc, single stream, to cover the uncompressed path — with
    // a FRACTIONAL-second date (WARC 1.1), which must parse, not null
    val plain = Files.newOutputStream(dir.resolve("b.warc"))
    Warc.writeRecords(plain, Iterator(
      (Map("WARC-Type" -> "response",
        "WARC-Record-ID" -> "<urn:uuid:frac>",
        "WARC-Date" -> "2026-03-04T05:06:07.123Z",
        "WARC-Target-URI" -> "http://y/3",
        "Content-Type" -> "application/http; msgtype=response"),
        (http + "world").getBytes("UTF-8"))),
      gzipPerRecord = false)

    val all = Warc.readRecords(spark, dir.toString + "/*.warc*")
      .orderBy("target_uri", "warc_type").collect()
    assert(all.length === 4)
    val resp = Warc.readRecords(spark, dir.toString + "/*.warc*",
        types = Seq("response"))
      .select(col("target_uri"), col("http_status"),
        col("http_content_type"), col("payload").cast("string"))
      .orderBy("target_uri").collect()
    assert(resp.map(r => (r.getString(0), r.getInt(1), r.getString(2),
      r.getString(3))).toSeq === Seq(
      ("http://x/1", 404, "text/plain", "hello"),
      ("http://y/3", 404, "text/plain", "world")))
    val res = Warc.readRecords(spark, dir.toString + "/a.warc.gz",
        types = Seq("resource")).collect()
    assert(new String(res.head.getAs[Array[Byte]]("payload"), "UTF-8")
      === "raw bytes no framing")
    assert(res.head.getAs[java.sql.Timestamp]("warc_date").toInstant
      === java.time.Instant.parse("2026-03-04T05:06:07Z"))
    // the fractional-second record parses instead of nulling
    val frac = Warc.readRecords(spark, dir.toString + "/b.warc")
      .select("warc_date").head()
    assert(!frac.isNullAt(0), "fractional WARC-Date must parse")
    assert(frac.getTimestamp(0).toInstant
      === java.time.Instant.parse("2026-03-04T05:06:07.123Z"))
  }

  test("distributed parquet-tier pruning ≡ driver pruning (and survives a corrupt index)") {
    import graft.catalog.Catalog
    val sKey = "graft.stats.inlineMaxFiles"
    val bKey = "graft.bloom.inlineMaxFiles"
    val dKey = "graft.stats.distributedPrune"
    val prevS = spark.conf.getOption(sKey)
    val prevB = spark.conf.getOption(bKey)
    try {
      val rootP = Files.createTempDirectory("fstats_dist").toString
      val cat = new Catalog(rootP, spark)
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(8, col("o_orderkey"))
      spark.conf.set(sKey, "4") // 8 files > 4 → parquet stats tier
      // twin fixtures: inline blooms.json (broadcast arm) and blooms/
      // parquet index (cogroup-join arm) beside the same stats tier
      spark.conf.set(bKey, "32")
      cat.save(Chain(orders), "bi", bloomCols = Seq("o_orderkey"))
      spark.conf.set(bKey, "0")
      cat.save(Chain(orders), "bp", bloomCols = Seq("o_orderkey"))
      val vbi = cat.latestVersion("bi").get
      val vdir = java.nio.file.Paths.get(rootP, "datasets", "bi", s"v$vbi")
      assert(Files.isDirectory(vdir.resolve("stats")) &&
        Files.exists(vdir.resolve("blooms.json")))
      val vbp = cat.latestVersion("bp").get
      assert(Files.isDirectory(java.nio.file.Paths.get(rootP, "datasets",
        "bp", s"v$vbp", "blooms")))
      val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
      val preds = Seq(
        col("o_orderkey") <= maxKey / 10,
        col("o_orderkey") === 1L,
        col("o_orderkey") === -42L,
        col("o_orderkey").isin(1L, maxKey),
        !(col("o_orderkey") === 1L),
        col("o_orderkey") * 2 < 10,
        col("o_orderkey") > maxKey / 2 && col("o_custkey") >= 0L)
      for (ds <- Seq("bi", "bp"); p <- preds) {
        spark.conf.set(dKey, "false")
        val driver = cat.pruneCount(ds, p)
        val driverRows = cat.readDatasetWhere(ds, p)
          .selectExcept("sys").toDF.collect().toSet
        spark.conf.set(dKey, "true")
        val parses0 = cat.statsParses
        val dist = cat.pruneCount(ds, p)
        val distRows = cat.readDatasetWhere(ds, p)
          .selectExcept("sys").toDF.collect().toSet
        assert(dist === driver, s"$ds prune disagreement on $p")
        assert(distRows === driverRows, s"$ds read disagreement on $p")
        // the distributed path must never materialize the stats index
        // on the driver
        assert(cat.statsParses === parses0,
          s"$ds distributed prune collected the index on the driver ($p)")
      }
      spark.conf.set(dKey, "true")
      // a cow mutation through the distributed touched-file probe
      val before = cat.readDataset("bi").toDF.count()
      val res = cat.deleteWhere("bi", col("o_orderkey") === 1L)
      assert(res.rowsAfter === before - 1)
      assert(res.filesRewritten < 8,
        "envelope pruning must hard-link most files through the delete")
      // corrupt index: every reader degrades to a full scan, mutations
      // still run (touch-everything), nothing throws
      val v2 = cat.latestVersion("bi").get
      val sdir = java.nio.file.Paths.get(rootP, "datasets", "bi",
        s"v$v2", "stats")
      import scala.jdk.CollectionConverters._
      Files.list(sdir).iterator().asScala.toList
        .filter(_.toString.endsWith(".parquet"))
        .foreach(f => Files.write(f, "not parquet".getBytes))
      val p2 = col("o_orderkey") <= maxKey / 10
      assert(cat.pruneCount("bi", p2) === ((0, 0)))
      val degraded = cat.readDatasetWhere("bi", p2)
        .selectExcept("sys").toDF.collect().toSet
      val fullRows = cat.readDataset("bi").selectExcept("sys").toDF
        .filter(p2).collect().toSet
      assert(degraded === fullRows && degraded.nonEmpty)
      val before2 = cat.readDataset("bi").toDF.count()
      val res2 = cat.deleteWhere("bi", col("o_orderkey") === 2L)
      assert(res2.rowsAfter === before2 - 1)
      assert(cat.readDataset("bi").toDF.count() === before2 - 1)
      // the rebuilt version's index is fresh — pruning works again
      assert(cat.pruneCount("bi", p2)._1 > 0)
    } finally {
      spark.conf.unset(dKey)
      prevS match { case Some(x) => spark.conf.set(sKey, x)
                    case None => spark.conf.unset(sKey) }
      prevB match { case Some(x) => spark.conf.set(bKey, x)
                    case None => spark.conf.unset(bKey) }
    }
  }
}
