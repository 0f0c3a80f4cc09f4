package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, SemVer}
import graft.core.Chain
import graft.delta.Delta
import graft.files.FileOps

/** Catalog versioning, checkpoint lookup, delta incremental save, file ops. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("save / read / versions / latest") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    val v1 = cat.save(c, "nations")
    assert(v1 === SemVer(1, 0, 0))
    val v2 = cat.save(c.filter(col("n_regionkey") === 0), "nations")
    assert(v2 === SemVer(1, 1, 0))
    assert(cat.versions("nations") === Seq(v1, v2))
    assert(cat.readDataset("nations").count() <
      cat.readDataset("nations", Some(v1)).count())
    // saved data carries sys columns for chunk/shuffle reproducibility
    assert(cat.readDataset("nations").toDF.columns.contains("sys"))
    // versions are immutable
    intercept[IllegalArgumentException](cat.save(c, "nations", Some(v1)))
  }

  test("dotted top-level column names survive a partitioned save/read") {
    // hive-partitioned reads reorder to the recorded schema via a
    // projection; a dot inside a TOP-LEVEL name (JSON-ingested keys)
    // must resolve as the column, not as nested-field access
    val root = Files.createTempDirectory("cat_dotted").toString
    val cat = new Catalog(root, spark)
    val df = spark.range(20).toDF("id")
      .withColumn("a.b", col("id") * 2)
      .withColumn("part", col("id") % 2)
    cat.save(Chain(df), "dotted", partitionBy = Seq("part"))
    val back = cat.readDataset("dotted").selectExcept("sys").toDF
    assert(back.columns.toSeq === Seq("id", "a.b", "part"))
    assert(back.agg(sum(col("`a.b`"))).head().getLong(0) === (0 until 20)
      .map(_ * 2L).sum)
    // the pruned-read path reorders through the same projection
    val pruned = cat.readDatasetWhere("dotted", col("id") >= 10)
      .selectExcept("sys").toDF
    assert(pruned.columns.toSeq === Seq("id", "a.b", "part"))
    assert(pruned.count() === 10)
  }

  test("compaction's packed twin session carries runtime confs (true clone)") {
    val s2 = org.apache.spark.sql.graft.bridge.cloneSession(spark)
    try {
      spark.conf.set("graft.test.cloneprobe", "carried")
      val s3 = org.apache.spark.sql.graft.bridge.cloneSession(spark)
      // a runtime conf set AFTER session build must carry to the clone —
      // newSession() would reset it (rebase modes, timezone, etc.)
      assert(s3.conf.get("graft.test.cloneprobe") === "carried")
      // and the clone's own flips stay session-scoped
      s3.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      assert(spark.conf.get("spark.sql.files.maxPartitionBytes") !== "65536")
    } finally {
      spark.conf.unset("graft.test.cloneprobe")
      assert(s2 ne spark)
    }
  }

  test("racing saves of one dataset serialize on the version bump, no torn dirs") {
    val root = Files.createTempDirectory("cat_race").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    cat.save(c, "r")
    // 4 concurrent auto-bump savers: every one must land a DISTINCT
    // version (the claim loop re-bumps losers), every version must be
    // complete (meta committed, data readable), and no temp dir survives
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val expected = c.toDF.count()
    val vs = Await.result(
      Future.sequence((1 to 4).map(i => Future {
        cat.save(c.mutate("writer" -> lit(i)), "r")
      })), 120.seconds)
    assert(vs.toSet.size === 4, s"collided versions: $vs")
    assert(cat.versions("r").size === 5)
    vs.foreach { v =>
      assert(cat.readDataset("r", Some(v)).count() === expected)
      assert(cat.rowsOf("r", v) === expected)
    }
    // no leftover temp dirs
    import scala.jdk.CollectionConverters._
    val leftovers = Files.list(java.nio.file.Paths.get(root, "datasets", "r"))
      .iterator.asScala.map(_.getFileName.toString)
      .filterNot(_.startsWith("v")).toSeq
    assert(leftovers.isEmpty, leftovers.toString)
    // explicit-version immutability still enforced under the new protocol
    intercept[IllegalArgumentException](cat.save(c, "r", Some(vs.head)))
  }

  test("optimize compacts to a new lineage-tracked version, user rows identical") {
    val root = Files.createTempDirectory("cat_opt").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/orders.parquet").repartition(24))
    val v1 = cat.save(c, "o")
    val beforeRows = cat.readDataset("o").selectExcept("sys")
      .toDF.collect().toSet
    val (v2, before, after) = cat.optimize("o", nFiles = 4)
    assert(before === 24 && after <= 4, s"$before -> $after")
    assert(v2 > v1)
    assert(cat.depsOf("o", v2) === Seq(("o", v1)))
    val afterRows = cat.readDataset("o").selectExcept("sys")
      .toDF.collect().toSet
    assert(afterRows === beforeRows)
    // the optimized version re-harvested footer stats
    assert(cat.fileStats("o", v2).nonEmpty)
    // bloom re-indexing rides along when requested
    val (v3, _, _) = cat.optimize("o", nFiles = 4,
      bloomCols = Seq("o_orderkey"))
    assert(cat.fileBlooms("o", v3).nonEmpty)
    // a partitionBy passthrough re-lays the optimized version out
    // hive-partitioned, rows identical
    val (v4, _, _) = cat.optimize("o", nFiles = 2,
      partitionBy = Seq("o_orderstatus"))
    val d4 = java.nio.file.Paths.get(root, "datasets", "o", s"v$v4", "data")
    import scala.jdk.CollectionConverters._
    assert(Files.list(d4).iterator.asScala.filter(Files.isDirectory(_))
      .forall(_.getFileName.toString.startsWith("o_orderstatus=")))
    assert(cat.readDataset("o", Some(v4)).selectExcept("sys").toDF
      .select(beforeRows.head.schema.fieldNames.map(col): _*)
      .collect().toSet === beforeRows)
  }

  test("optimize bin-packs skewed input files into even-sized outputs") {
    import org.apache.spark.sql.functions.{col, concat_ws, explode, lit, md5, repeat, sequence}
    val root = Files.createTempDirectory("cat_opt_skew").toString
    val cat = new Catalog(root, spark)
    // BYTE skew: every bucket b holds 400 rows, but the payload width
    // grows with (b+1)² — file sizes run ~1x..250x. repartitionByRange
    // row-balances (sampling is row-weighted), so byte skew is the
    // regime a plain coalesce can't see: it folds everything into one
    // giant output beside empties.
    val skewed = spark.range(16).select(col("id").as("b"),
        explode(sequence(lit(1L), lit(400L))).as("n"))
      .select(col("n"), col("b"),
        repeat(md5(concat_ws("-", col("b"), col("n"))),
          ((col("b") + 1) * (col("b") + 1)).cast("int")).as("payload"))
      .repartitionByRange(16, col("b"))
    val v1 = cat.save(Chain(skewed), "sk")
    def fileBytes(v: graft.catalog.SemVer): Seq[Long] = {
      val d = java.nio.file.Paths.get(root, "datasets", "sk", s"v$v", "data")
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(Files.size(_)).toSeq
    }
    val bytes1 = fileBytes(v1)
    assert(bytes1.size >= 8 && bytes1.max >= 4 * bytes1.min,
      s"fixture should write byte-skewed files, got $bytes1")
    val (v2, before, after) = cat.optimize("sk", nFiles = 4)
    assert(before === bytes1.size && after === 4, s"$before -> $after")
    val bytes2 = fileBytes(v2)
    assert(bytes2.size === 4 &&
      bytes2.max.toDouble / bytes2.sum <= 0.6,
      s"size-aware packing should spread bytes, got $bytes2")
    assert(cat.fileStats("sk", v2).map(_.rows).sum === 16 * 400L)
    // user rows identical through the rewrite
    assert(cat.readDataset("sk").selectExcept("sys").toDF.collect().toSet
      === cat.readDataset("sk", Some(v1)).selectExcept("sys")
        .toDF.collect().toSet)
  }

  test("vacuum sweeps crashed-save temp dirs, spares fresh in-flight ones") {
    val root = Files.createTempDirectory("cat_sweep").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    cat.save(c, "s")
    val ds = java.nio.file.Paths.get(root, "datasets", "s")
    def ageTree(p: java.nio.file.Path): Unit = {
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 3 * 3600 * 1000L)
      val walk = Files.walk(p)
      try walk.iterator().forEachRemaining(q => Files.setLastModifiedTime(q, old))
      finally walk.close()
    }
    val stale = ds.resolve(".tmp-deadbeef")
    Files.createDirectories(stale.resolve("data"))
    ageTree(stale)
    val fresh = ds.resolve(".tmp-cafebabe")
    Files.createDirectories(fresh)
    // a long-running save: dir CREATED hours ago but parquet parts still
    // streaming in — the newest mtime under the tree is what must gate
    val inflight = ds.resolve(".tmp-slowsave")
    Files.createDirectories(inflight.resolve("data"))
    ageTree(inflight)
    Files.writeString(inflight.resolve("data").resolve("part-0.parquet"), "x")
    val swept = cat.sweepTempDirs()
    assert(swept === Seq("s/.tmp-deadbeef"), swept.toString)
    assert(!Files.exists(stale) && Files.exists(fresh) && Files.exists(inflight))
    // and vacuum runs the sweep as part of its destructive pass
    Files.createDirectories(stale)
    ageTree(stale)
    cat.vacuum(keepLast = 1)
    assert(!Files.exists(stale) && Files.exists(fresh) && Files.exists(inflight))
  }

  test("vacuum keeps the retention window plus the transitive lineage closure") {
    val root = Files.createTempDirectory("cat_vac").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    val a1 = cat.save(c, "a")                                   // 1.0.0
    val a2 = cat.save(c.limit(3), "a")                          // 1.1.0
    val a3 = cat.save(c.limit(2), "a")                          // 1.2.0
    // b's latest depends on the OLDEST a — retention alone would delete it
    cat.save(c.limit(1), "b", deps = Seq(s"a@v$a1"))
    val deleted = cat.vacuum(keepLast = 1)
    // a@1.1.0 is the only victim: a@1.2.0 is newest, a@1.0.0 is b's dep
    assert(deleted === Seq(("a", a2)))
    assert(cat.versions("a") === Seq(a1, a3))
    assert(cat.versions("b").size === 1)
    // survivors still read (dep protection kept the data, not just meta)
    assert(cat.readDataset("a", Some(a1)).count() === 5)
    // a second vacuum is a no-op (idempotent on a clean catalog)
    assert(cat.vacuum(keepLast = 1) === Seq.empty)
    // dangling deps (to a never-existing version) don't block deletion;
    // a dry run reports the same victims without touching anything
    cat.save(c.limit(4), "a")                                   // 1.3.0
    cat.save(c, "b", deps = Seq("ghost@v9.9.9"))
    val expect = Set(("a", a1), ("a", a3), ("b", SemVer(1, 0, 0)))
    assert(cat.vacuum(keepLast = 1, dryRun = true).toSet === expect)
    assert(cat.versions("a").size === 3 && cat.versions("b").size === 2)
    assert(cat.vacuum(keepLast = 1).toSet === expect)
  }

  test("vacuum reclaims cow-trail middles: same-dataset deps are provenance") {
    val root = Files.createTempDirectory("cat_vac_cow").toString
    val cat = new Catalog(root, spark)
    import org.apache.spark.sql.functions.col
    val n = spark.read.parquet(s"$sf/orders.parquet")
    val v1 = cat.save(Chain(n), "t")
    val r2 = cat.deleteWhere("t", col("o_orderkey") % 7 === 0)
    val r3 = cat.deleteWhere("t", col("o_orderkey") % 11 === 0)
    // cross-dataset lineage still pins: derived depends on the OLDEST
    cat.save(cat.readDataset("t", Some(v1)).limit(5), "derived",
      deps = Seq(s"t@v$v1"))
    // the cow middle is the only victim — its child's parent link is
    // provenance (hard-linked carries), NOT liveness, so the trail is
    // reclaimable; v1 survives through the derived dataset's dep
    val expectRows = cat.readDataset("t").toDF.count()
    assert(cat.vacuum(keepLast = 1, dryRun = true) === Seq(("t", r2.version)))
    assert(cat.vacuum(keepLast = 1) === Seq(("t", r2.version)))
    assert(cat.versions("t") === Seq(v1, r3.version))
    // the survivor reads whole: carried files were hard links, deleting
    // the ancestor's dir entries never touched their inodes
    assert(cat.readDataset("t").toDF.count() === expectRows)
    assert(cat.readDataset("t", Some(v1)).toDF.count() === n.count())
  }

  test("vacuum two-phase: tombstone keeps bytes through the grace window, matured prune shrinks, marker+meta resurrects") {
    val prevG = sys.props.get("graft.vacuum.graceMs")
    try {
      val root = Files.createTempDirectory("cat_vac_grace").toString
      val cat = new Catalog(root, spark)
      import org.apache.spark.sql.functions.col
      val n = spark.read.parquet(s"$sf/orders.parquet")
      val v1 = cat.save(Chain(n), "t")
      val r2 = cat.deleteWhere("t", col("o_orderkey") % 7 === 0)
      val r3 = cat.deleteWhere("t", col("o_orderkey") % 11 === 0)
      def files(v: graft.catalog.SemVer): Int = {
        import scala.jdk.CollectionConverters._
        val d = java.nio.file.Paths.get(root, "datasets", "t", s"v$v", "data")
        if (!Files.isDirectory(d)) 0
        else { val w = Files.walk(d)
          try w.iterator.asScala.count(_.toString.endsWith(".parquet"))
          finally w.close() }
      }
      val v1Files = files(v1)
      val v2Files = files(r2.version)
      // phase 1 under a LONG grace: both retired versions tombstone
      // (invisible) but every byte stays — a commit racing the scan
      // could still be about to reference them
      sys.props("graft.vacuum.graceMs") = "3600000"
      assert(cat.vacuum(keepLast = 1).toSet ===
        Set(("t", v1), ("t", r2.version)))
      assert(cat.versions("t") === Seq(r3.version))
      assert(files(v1) === v1Files && files(r2.version) === v2Files,
        "grace keeps every byte")
      assert(Files.exists(java.nio.file.Paths.get(root, "datasets", "t",
        s"v$v1", ".pool")))
      // the survivor reads whole through the pools the entire time
      assert(cat.readDataset("t").toDF.count() === r3.rowsAfter)
      // phase 2 once matured: each pool shrinks to exactly the files
      // r3's manifest references (v1 keeps the twice-untouched bulk,
      // r2 keeps only its rewrite output that survived r3)
      sys.props("graft.vacuum.graceMs") = "0"
      cat.vacuum(keepLast = 1)
      // exact pin: each pool holds precisely the files r3's manifest
      // resolves to it — nothing more, nothing less
      val byOwner = cat.dataFilesOf("t", r3.version)
        .groupBy(e => e.v).view.mapValues(_.size).toMap
      assert(files(v1) === byOwner.getOrElse(v1, 0))
      assert(files(r2.version) === byOwner.getOrElse(r2.version, 0))
      assert(files(v1) + files(r2.version) < v1Files + v2Files,
        "the prune must actually reclaim unreferenced bytes")
      assert(cat.readDataset("t").toDF.count() === r3.rowsAfter)
      // crash-resurrect guard: a committed version wearing a stray
      // .pool marker (crash between marker and meta delete) is healed,
      // never pruned
      val latestDir = java.nio.file.Paths.get(root, "datasets", "t",
        s"v${r3.version}")
      Files.write(latestDir.resolve(".pool"), Array.empty[Byte])
      cat.vacuum(keepLast = 1)
      assert(!Files.exists(latestDir.resolve(".pool")),
        "marker on a committed version must be healed")
      assert(cat.versions("t").contains(r3.version) &&
        cat.readDataset("t").toDF.count() === r3.rowsAfter)
    } finally prevG match {
      case Some(x) => sys.props("graft.vacuum.graceMs") = x
      case None => sys.props.remove("graft.vacuum.graceMs")
    }
  }

  test("exportVersion materializes a manifest version; storageStats shows the sharing") {
    val root = Files.createTempDirectory("cat_export").toString
    val cat = new Catalog(root, spark)
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t", partitionBy = Seq("o_orderstatus"))
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 16)
    assert(r.filesReused > 0)
    // storage accounting: two versions share the cold bulk, so the
    // logical sum (per-version claims) exceeds physical bytes
    val st = cat.storageStats().find(_._1 == "t").get
    assert(st._2 === 2 && st._3 > st._4,
      s"zero-copy sharing must show logical > physical: $st")
    // export resolves the manifest and copies real bytes; the tree is
    // self-contained (read WITHOUT the catalog), hive layout intact
    val dest = Files.createTempDirectory("cat_export_out").resolve("snap")
    val (nf, bytes) = cat.exportVersion("t", r.version, dest.toString)
    assert(nf === cat.versionDataFiles("t", r.version).size && bytes > 0)
    val got = spark.read.parquet(dest.resolve("data").toString)
    assert(got.count() === r.rowsAfter)
    assert(got.columns.contains("o_orderstatus"),
      "partition columns must survive the export")
    val expect = cat.readDataset("t").toDF.drop("sys")
    val gotSel = got.drop("sys").select(expect.columns.map(col): _*)
      .withColumn("o_orderstatus", col("o_orderstatus").cast("string"))
    assert(gotSel.exceptAll(expect).isEmpty &&
      expect.exceptAll(gotSel).isEmpty)
    // inline stats sidecar traveled: the exported tree carries the
    // same skipping metadata a fresh save would
    assert(Files.exists(dest.resolve("meta.json")))
    // destination must be empty (no silent overwrite)
    intercept[IllegalArgumentException](
      cat.exportVersion("t", r.version, dest.toString))
    // the transport round-trip: import into a SECOND catalog registers
    // the snapshot as a fresh version with local identity and cleared
    // lineage; reads are identical through the catalog's recorded
    // schema (partition values at their saved types)
    val root2 = Files.createTempDirectory("cat_import").toString
    val cat2 = new Catalog(root2, spark)
    val iv = cat2.importVersion("t2", dest.toString)
    assert(iv === graft.catalog.SemVer(1, 0, 0))
    assert(cat2.depsOf("t2", iv).isEmpty, "source-catalog deps cleared")
    val imported = cat2.readDataset("t2").toDF.drop("sys")
      .select(expect.columns.map(col): _*)
    assert(imported.exceptAll(expect).isEmpty &&
      expect.exceptAll(imported).isEmpty)
    // skipping metadata traveled: the imported version still prunes
    val mid = cat2.readDataset("t2").toDF
      .agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0) / 2
    val (k2, t2) = cat2.pruneCount("t2", col("o_orderkey") > mid)
    assert(k2 < t2, s"imported stats must prune: $k2/$t2")
  }

  test("deleteVersion is two-phase: grace keeps bytes, matured sweep reclaims, live refs survive") {
    val prevG = sys.props.get("graft.vacuum.graceMs")
    try {
      val root = Files.createTempDirectory("cat_delver").toString
      val cat = new Catalog(root, spark)
      import org.apache.spark.sql.functions.col
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      val v1 = cat.save(Chain(o), "t")
      val r2 = cat.deleteWhere("t", col("o_orderkey") % 7 === 0)
      val d1 = java.nio.file.Paths.get(root, "datasets", "t", s"v$v1")
      // an immediate physical delete would race a concurrent
      // restore/clone that already resolved its census from the
      // still-committed version — under a long grace the version goes
      // INVISIBLE but every byte stays
      sys.props("graft.vacuum.graceMs") = "3600000"
      cat.deleteVersion("t", v1)
      assert(cat.versions("t") === Seq(r2.version), "invisible at once")
      assert(Files.exists(d1.resolve(".pool")) &&
        !Files.exists(d1.resolve("meta.json")))
      assert(cat.readDataset("t").toDF.count() === r2.rowsAfter,
        "the carried survivor reads whole through the pool")
      // matured: the sweep (run by the next deleteVersion on this
      // dataset — no full vacuum needed) shrinks the pool to exactly
      // the files the survivor's manifest still references
      sys.props("graft.vacuum.graceMs") = "0"
      cat.deleteVersion("t", v1)
      val kept = {
        import scala.jdk.CollectionConverters._
        val dd = d1.resolve("data")
        if (!Files.isDirectory(dd)) Set.empty[String]
        else { val w = Files.walk(dd)
          try w.iterator.asScala.filter(_.toString.endsWith(".parquet"))
            .map(p => dd.relativize(p).toString).toSet
          finally w.close() }
      }
      val referenced = cat.dataFilesOf("t", r2.version)
        .filter(_.v == v1).map(_.rel).toSet
      assert(kept === referenced,
        s"pool must keep exactly the live refs: kept=${kept.size} " +
          s"referenced=${referenced.size}")
      assert(cat.readDataset("t").toDF.count() === r2.rowsAfter)
      // a wholly unreferenced version reclaims fully once matured
      val v3 = cat.save(Chain(o.limit(10)), "u")
      cat.deleteVersion("u", v3)
      assert(!Files.exists(
        java.nio.file.Paths.get(root, "datasets", "u", s"v$v3")),
        "unreferenced matured pool deletes whole")
    } finally prevG match {
      case Some(x) => sys.props("graft.vacuum.graceMs") = x
      case None => sys.props.remove("graft.vacuum.graceMs")
    }
  }

  test("storageStats counts only data bytes; byte-exact after save → delete → restore") {
    val sKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(sKey)
    try {
      spark.conf.set(sKey, "4") // parquet stats tier → index parquet exists
      val root = Files.createTempDirectory("cat_storage").toString
      val cat = new Catalog(root, spark)
      import org.apache.spark.sql.functions.col
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      val v1 = cat.save(Chain(o), "t")
      val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
        .head().getLong(0)
      val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 16)
      assert(r.filesReused > 0)
      cat.restore("t", v1)
      // the index tables are parquet too — they must NOT skew the census
      import scala.jdk.CollectionConverters._
      val statsDir = java.nio.file.Paths.get(root, "datasets", "t",
        s"v$v1", "stats")
      assert(Files.isDirectory(statsDir), "fixture needs a parquet index")
      def dataBytes(v: graft.catalog.SemVer): Long = {
        val dd = java.nio.file.Paths.get(root, "datasets", "t", s"v$v",
          "data")
        if (!Files.isDirectory(dd)) 0L
        else { val w = Files.walk(dd)
          try w.iterator.asScala.filter(_.toString.endsWith(".parquet"))
            .map(Files.size(_)).sum
          finally w.close() }
      }
      val vs = cat.versions("t")
      assert(vs.size === 3)
      val logicalExp = vs.map(v =>
        cat.versionDataFiles("t", v).values.sum).sum
      val physicalExp = vs.map(dataBytes).sum
      val (_, nv, logical, physical) =
        cat.storageStats().find(_._1 == "t").get
      assert(nv === 3)
      assert(logical === logicalExp, "logical = per-version claims")
      assert(physical === physicalExp,
        "physical = data bytes only, never the index tables")
      assert(logical > physical, "the trail must show sharing")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(sKey, v)
        case None => spark.conf.set(sKey, "512")
      }
    }
  }

  test("importVersion rejects a raw manifest version dir; export fan-out parity") {
    val root = Files.createTempDirectory("cat_impguard").toString
    val cat = new Catalog(root, spark)
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t")
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 8)
    assert(r.filesReused > 0, s"fixture must carry files: $r")
    // a raw zero-copy version dir carries a manifest whose bytes live
    // in ancestor dirs — importing it would commit a half-empty version
    val rawDir = java.nio.file.Paths.get(root, "datasets", "t",
      s"v${r.version}")
    assert(Files.exists(rawDir.resolve("manifest.json")))
    val cat2 = new Catalog(
      Files.createTempDirectory("cat_impguard2").toString, spark)
    val e = intercept[IllegalArgumentException](
      cat2.importVersion("t2", rawDir.toString))
    assert(e.getMessage.contains("exportVersion"))
    // the distributed copy arm (threshold 0 forces the Spark job)
    // produces the identical tree and accounting as the serial arm
    val serial = Files.createTempDirectory("cat_exp_ser").resolve("s")
    val fanned = Files.createTempDirectory("cat_exp_fan").resolve("f")
    val (nf1, b1) = cat.exportVersion("t", r.version, serial.toString)
    val prevT = spark.conf.getOption("graft.export.fanThreshold")
    try {
      spark.conf.set("graft.export.fanThreshold", "0")
      val (nf2, b2) = cat.exportVersion("t", r.version, fanned.toString)
      assert((nf1, b1) === (nf2, b2))
    } finally prevT match {
      case Some(x) => spark.conf.set("graft.export.fanThreshold", x)
      case None => spark.conf.unset("graft.export.fanThreshold")
    }
    val a = spark.read.parquet(serial.resolve("data").toString)
    val b = spark.read.parquet(fanned.resolve("data").toString)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the fanned tree imports cleanly
    val iv = cat2.importVersion("t2", fanned.toString)
    assert(cat2.readDataset("t2").toDF.count() === r.rowsAfter)
    assert(iv === graft.catalog.SemVer(1, 0, 0))
  }

  test("int-literal predicates prune long columns (promote-cast folding)") {
    // the analyzer wraps `longCol < 50`'s INT literal in a cast — before
    // the fold, the stats evaluator saw no bare Literal and silently
    // read every file for the most common predicate shape there is
    val root = Files.createTempDirectory("cat_litcast").toString
    val cat = new Catalog(root, spark)
    import org.apache.spark.sql.functions.col
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t")
    val (kept, total) = cat.pruneCount("t", col("o_orderkey") <= 100)
    assert(total === 8 && kept < total,
      s"int-literal range predicate must prune: $kept/$total")
    // correctness unchanged: pruned read equals the unpruned filter
    assert(cat.readDatasetWhere("t", col("o_orderkey") <= 100).toDF.count()
      === cat.readDataset("t").toDF.filter(col("o_orderkey") <= 100).count())
    // and a string-typed literal cast to a numeric folds too
    val (k2, t2) = cat.pruneCount("t",
      col("o_orderkey") <= org.apache.spark.sql.functions.lit("100")
        .cast("bigint"))
    assert(k2 < t2, s"castable string literal must prune: $k2/$t2")
  }

  test("fsck: clean catalog reports nothing; planted corruptions are each found") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("cat_fsck").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t")
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 8) // manifest v2
    assert(r.filesReused > 0)
    cat.save(Chain(o.limit(3)), "src")
    cat.save(cat.readDataset("src").limit(2), "derived",
      deps = Seq("src@v1.0.0"))
    assert(cat.fsck() === Nil, "healthy catalog must be clean")
    val base = java.nio.file.Paths.get(root, "datasets")
    // 1. outside interference: physically remove a carried file of v1
    val victim = cat.dataFilesOf("t", r.version)
      .filterNot(_.v == r.version).head
    Files.delete(base.resolve("t").resolve(s"v${victim.v}")
      .resolve("data").resolve(victim.rel))
    // 2. stale commit lock (mtime pushed past the stale bar)
    val lock = base.resolve("t").resolve(".commit.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 600000L))
    // 3. stray pool marker on a committed version
    Files.createFile(base.resolve("src").resolve("v1.0.0")
      .resolve(".pool"))
    // 4. claimed-headless version dir (crashed writer pre-commit)
    Files.createDirectories(base.resolve("src").resolve("v9.0.0"))
    // 5. cross-dataset broken dep (simulate external deletion)
    def deleteTreeRaw(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(p)
      try w.iterator.asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
    }
    deleteTreeRaw(base.resolve("src").resolve("v1.0.0"))
    // 6. stale tmp dir
    val tmp = base.resolve("t").resolve(".tmp-fsck")
    Files.createDirectories(tmp)
    Files.setLastModifiedTime(tmp,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7200000L))
    val findings = cat.fsck()
    def has(sev: String, n: String, pat: String): Boolean =
      findings.exists(f => f._4 == sev && f._1 == n && f._3.contains(pat))
    assert(has("critical", "t", "missing-data-file"), findings.toString)
    assert(has("warn", "t", "stale-lock"), findings.toString)
    assert(has("info", "t", "stale-tmp"), findings.toString)
    assert(has("info", "src", "claimed-headless"), findings.toString)
    assert(has("warn", "derived", "broken-dep:src@v1.0.0"),
      findings.toString)
    // the stray marker vanished with v1.0.0's dir (case 5 deleted it);
    // plant a fresh one on the surviving version to pin the finding
    Files.createFile(base.resolve("derived").resolve("v1.0.0")
      .resolve(".pool"))
    assert(cat.fsck().exists(f => f._1 == "derived" &&
      f._3 == "stray-pool-marker"), "marker beside meta must be flagged")
  }

  test("fsck: a version the batched pre-pass skipped still probes its " +
    "entries directly (no fail-open)") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("cat_fsck3").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t")
    cat.save(Chain(o.limit(3)), "u")
    // a manifest (carry) version, whose entries the missing-file check
    // walks; physically remove one of its carried files
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 8)
    assert(r.filesReused > 0)
    val victim = cat.dataFilesOf("t", r.version)
      .filterNot(_.v == r.version).head
    Files.delete(java.nio.file.Paths.get(root, "datasets", "t",
      s"v${victim.v}", "data").resolve(victim.rel))
    val normal = cat.fsck()
    assert(normal.exists(f => f._1 == "t" &&
      f._3.contains("missing-data-file")), normal.toString)
    // force the pre-pass to skip t (stands in for a manifest that throws
    // in the pre-pass but parses in the main loop, or a racing save):
    // its entry paths are then absent from the batched missing-set, and
    // consulting that set would silently report every file as present —
    // the main loop must fall back to direct per-entry probes instead
    val key = "graft.fsck.prePassSkipDatasets"
    try {
      spark.conf.set(key, "t")
      val skipped = cat.fsck()
      assert(skipped.exists(f => f._1 == "t" &&
        f._3.contains("missing-data-file")),
        s"pre-pass-skipped dataset failed open: $skipped")
      // findings parity with the normal pass
      assert(skipped.toSet === normal.toSet)
    } finally spark.conf.unset(key)
  }

  test("fsck: containment + self-erasing corruptions (manifest, index, meta)") {
    import org.apache.spark.sql.functions.col
    val sKey = "graft.stats.inlineMaxFiles"
    val prev = spark.conf.getOption(sKey)
    try {
      spark.conf.set(sKey, "4") // parquet stats tier on the 8-file save
      val root = Files.createTempDirectory("cat_fsck2").toString
      val cat = new Catalog(root, spark)
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "a")
      val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
        .head().getLong(0)
      val r = cat.deleteWhere("a", col("o_orderkey") <= mx / 16)
      assert(r.filesReused > 0)
      cat.save(Chain(o.limit(5)), "b") // must stay clean throughout
      cat.save(Chain(o.limit(5)), "c")
      cat.save(Chain(o.limit(5)), "d")
      assert(cat.fsck() === Nil, "healthy catalog must be clean")
      val base = java.nio.file.Paths.get(root, "datasets")
      // 1. TRUNCATED manifest that still parses — zero owner groups while
      //    the meta claims rows: the corruption that erases its own
      //    evidence (reads "succeed" with zero rows)
      Files.write(base.resolve("a").resolve(s"v${r.version}")
        .resolve("manifest.json"),
        "{\n  \"version\": 1,\n  \"owners\": [\n  ]\n}".getBytes("UTF-8"))
      // 2. UNPARSEABLE manifest (bad owner string, no @v separator)
      Files.write(base.resolve("d").resolve("v1.0.0")
        .resolve("manifest.json"),
        ("{\n  \"version\": 1,\n  \"owners\": [\n" +
          "    {\"d\": \"noatv\", \"r\": [\n      \"x.parquet\"\n    ]}\n" +
          "  ]\n}").getBytes("UTF-8"))
      // 3. corrupt parquet stats index → census query throws
      val statsDir = base.resolve("a").resolve("v1.0.0").resolve("stats")
      assert(Files.isDirectory(statsDir), "fixture needs the parquet tier")
      walkOf(statsDir).filter(_.toString.endsWith(".parquet"))
        .foreach(p => Files.write(p, "not parquet".getBytes("UTF-8")))
      // 4. garbage meta.json → rowsOf throws; fsck must report scan-error
      //    for that version and keep scanning everything else
      Files.write(base.resolve("c").resolve("v1.0.0").resolve("meta.json"),
        "junk".getBytes("UTF-8"))
      // 5. stray non-semver v* dir: flags itself, aborts nothing
      Files.createDirectories(base.resolve("a").resolve("vbackup-old"))
      // 6. LIVE tmp dir: old dir mtime but a fresh file inside — the
      //    sweepTempDirs aging rule (newest mtime under the tree) must
      //    keep it un-flagged
      val live = base.resolve("a").resolve(".tmp-live")
      Files.createDirectories(live)
      Files.write(live.resolve("part-0"), "x".getBytes("UTF-8"))
      Files.setLastModifiedTime(live,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
      val f = cat.fsck()
      def has(sev: String, n: String, pat: String): Boolean =
        f.exists(x => x._4 == sev && x._1 == n && x._3.contains(pat))
      assert(has("critical", "a", "corrupt-manifest:zero-entries"), f.toString)
      assert(has("critical", "d", "corrupt-manifest:IllegalArgument"), f.toString)
      assert(has("warn", "a", "unreadable-stats-index"), f.toString)
      assert(has("warn", "c", "scan-error:"), f.toString)
      assert(f.exists(x => x._1 == "a" && x._2 == "vbackup-old" &&
        x._3 == "unparseable-version-dir"), f.toString)
      assert(!f.exists(_._3 == "stale-tmp"),
        s"live tmp tree must not read as debris: $f")
      assert(!f.exists(_._1 == "b"),
        s"containment: unrelated dataset must scan clean: $f")
    } finally prev match {
      case Some(x) => spark.conf.set(sKey, x)
      case None => spark.conf.unset(sKey)
    }
  }

  private def walkOf(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val w = Files.walk(p)
    try w.iterator.asScala.filter(Files.isRegularFile(_)).toSeq
    finally w.close()
  }

  test("readDatasetAsOf resolves timestamp time travel over createdAt") {
    val root = Files.createTempDirectory("cat_asof").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    val t0 = java.time.Instant.now()
    cat.save(c, "r")                 // v1.0.0 (5 rows)
    Thread.sleep(1100)
    val mid = java.time.Instant.now()
    Thread.sleep(1100)
    cat.save(c.limit(2), "r")        // v1.1.0 (2 rows)
    // between the saves → v1.0.0; after both → the newest; before any → error
    assert(cat.readDatasetAsOf("r", mid).count() === 5)
    assert(cat.readDatasetAsOf("r", java.time.Instant.now()).count() === 2)
    intercept[IllegalArgumentException] {
      cat.readDatasetAsOf("r", t0.minusSeconds(60))
    }
    intercept[IllegalArgumentException] {
      cat.readDatasetAsOf("nope", mid)
    }
  }

  test("checkpoint lookup by chain hash") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
      .filter(col("r_regionkey") > 0)
    cat.save(c, "regions")
    assert(cat.findCheckpoint(c.hash).map(_._1) === Some("regions"))
    assert(cat.findCheckpoint("nope").isEmpty)
  }

  test("delta save: full on first run, incremental on change, no-op when same") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val v1data = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "value")
    def transform(c: Chain): Chain =
      c.mutate("value2" -> (col("value") * 2))

    val r1 = Delta.deltaSave(cat, Chain(v1data), "out",
      deltaOn = Seq("id"), compare = Seq("value"), transform)
    assert(r1.fullRecompute)
    assert(cat.readDataset("out").count() === 3)

    // second run, one modified + one added row
    val v2data = Seq((1L, "a", 10.0), (2L, "b", 25.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("id", "name", "value")
    val r2 = Delta.deltaSave(cat, Chain(v2data), "out",
      deltaOn = Seq("id"), compare = Seq("value"), transform)
    assert(!r2.fullRecompute)
    assert(r2.changedRows === 2)
    val out = cat.readDataset("out").toDF
    assert(out.count() === 4)
    assert(out.filter(col("id") === 2).select("value2").as[Double].head() === 50.0)

    // third run with identical source → previous version stands
    val r3 = Delta.deltaSave(cat, Chain(v2data), "out",
      deltaOn = Seq("id"), compare = Seq("value"), transform)
    assert(r3.changedRows === 0)
    assert(r3.version === r2.version)
  }

  test("delta retry reprocesses rows flagged with errors") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    // transform marks value<0 rows with an error (first pass "fails" them)
    def transform(c: Chain): Chain = c.mutate(
      "result" -> (col("value") * 2),
      "error" -> when(col("value") < 0, "bad input").otherwise(lit("")))
    val v1 = Seq((1L, 10.0), (2L, -5.0), (3L, 30.0)).toDF("id", "value")
    Delta.deltaSave(cat, Chain(v1), "retr", Seq("id"), Seq("value"), transform,
      retryOn = Some("error"))
    // same source, but row 2 now "fixed" upstream → still same source data;
    // retry should re-run the errored key even though nothing changed
    val r2 = Delta.deltaSave(cat, Chain(v1), "retr", Seq("id"), Seq("value"),
      transform, retryOn = Some("error"))
    assert(!r2.fullRecompute)
    assert(r2.changedRows === 1) // only the errored row was reprocessed
    val out = cat.readDataset("retr").toDF
    assert(out.count() === 3)
  }

  test("delta save matches a full recompute when the transform filters a changed row") {
    val root = Files.createTempDirectory("cat_dflt").toString
    val cat = new Catalog(root, spark)
    def transform(c: Chain): Chain =
      c.filter(col("value") > 0.5).mutate("v2" -> (col("value") * 2))
    val v1 = Seq((1L, 0.9), (2L, 0.7), (3L, 0.3)).toDF("id", "value")
    Delta.deltaSave(cat, Chain(v1), "flt", Seq("id"), Seq("value"), transform)
    assert(cat.readDataset("flt").toDF.select("id").as[Long]
      .collect().sorted.toSeq === Seq(1L, 2L))
    // row 1's value drops below the transform's filter: a full recompute
    // would not emit it, so the incremental run must REMOVE its stale
    // previous output (processed keys are subtracted, not replay output)
    val v2 = Seq((1L, 0.1), (2L, 0.7), (3L, 0.3)).toDF("id", "value")
    val r = Delta.deltaSave(cat, Chain(v2), "flt", Seq("id"), Seq("value"),
      transform)
    assert(!r.fullRecompute && r.changedRows === 1)
    val out = cat.readDataset("flt").toDF
    assert(out.select("id").as[Long].collect().toSeq === Seq(2L),
      s"stale filtered-out row survived: ${out.collect().toSeq}")
    assert(transform(Chain(v2)).toDF.count() === out.count(),
      "incremental result must equal the full recompute")
  }

  test("delta save with compare=empty detects adds only (keys-only snapshot)") {
    val root = Files.createTempDirectory("cat_dko").toString
    val cat = new Catalog(root, spark)
    def transform(c: Chain): Chain = c.mutate("v2" -> (col("value") * 2))
    val v1 = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value")
    Delta.deltaSave(cat, Chain(v1), "ko", Seq("id"), Seq.empty, transform)
    // modified value is INVISIBLE to keys-only detection; the added key
    // is processed — and the run must not crash on the keys-only
    // snapshot (diff defaults comparators to SHARED columns)
    val v2 = Seq((1L, 9.0), (2L, 2.0), (3L, 3.0)).toDF("id", "value")
    val r = Delta.deltaSave(cat, Chain(v2), "ko", Seq("id"), Seq.empty,
      transform)
    assert(!r.fullRecompute && r.changedRows === 1)
    val out = cat.readDataset("ko").toDF
    assert(out.count() === 3)
    assert(out.filter(col("id") === 1).select("v2").as[Double].head() === 2.0,
      "row 1's modification must NOT be re-derived under keys-only")
    assert(out.filter(col("id") === 3).select("v2").as[Double].head() === 6.0)
  }

  test("delta guards against delta-disabled ops") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val data = Seq((1L, 1.0)).toDF("id", "value")
    intercept[IllegalArgumentException] {
      Delta.deltaSave(cat, Chain(data), "bad", Seq("id"), Seq("value"),
        c => c.groupByAgg(Seq("id"), "n" -> count(lit(1))))
    }
  }

  test("read_storage lists files with glob; to_storage exports them") {
    val tmp = Files.createTempDirectory("tree")
    Files.createDirectories(tmp.resolve("cats"))
    Files.createDirectories(tmp.resolve("dogs/others"))
    Files.writeString(tmp.resolve("cats/cat1.txt"), "meow")
    Files.writeString(tmp.resolve("cats/cat2.txt"), "mrow")
    Files.writeString(tmp.resolve("dogs/dog1.txt"), "woof")
    Files.writeString(tmp.resolve("dogs/others/dog4.md"), "ruff")
    Files.writeString(tmp.resolve("description"), "Cats and Dogs")

    val all = FileOps.readStorage(spark, tmp.toString)
    assert(all.count() === 5)
    val txt = FileOps.readStorage(spark, tmp.toString, Some("**/*.txt"))
    assert(txt.count() === 3)
    val glob = FileOps.readStorage(spark, tmp.toString, Some("cats/*"))
    assert(glob.count() === 2)
    val sizes = all.toDF.select(col("file.path"), col("file.size"))
      .as[(String, Long)].collect().toMap
    assert(sizes("cats/cat1.txt") === 4)

    // export with fullpath placement
    val dest = Files.createTempDirectory("dest").toString
    FileOps.toStorage(txt.toDF, dest)
    assert(Files.exists(java.nio.file.Paths.get(dest, "cats/cat1.txt")))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(dest, "dogs/dog1.txt"))) === "woof")
  }

  test("withTextContent attaches blob text distributed (cache + prefetch)") {
    val tmp = Files.createTempDirectory("tree2")
    Files.writeString(tmp.resolve("a.txt"), "meow")
    Files.writeString(tmp.resolve("b.txt"), "woof")
    val listed = FileOps.readStorage(spark, tmp.toString)
    val withText = FileOps.withTextContent(listed)
    val m = withText.toDF.select(col("file.path"), col("content"))
      .as[(String, String)].collect().toMap
    assert(m === Map("a.txt" -> "meow", "b.txt" -> "woof"))
  }

  test("readStorageCached caches listings with TTL and update override") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val tmp = Files.createTempDirectory("tree3")
    Files.writeString(tmp.resolve("x.txt"), "1")
    val c1 = FileOps.readStorageCached(cat, spark, tmp.toString)
    assert(c1.count() === 1)
    val name = FileOps.listingDatasetName(tmp.toString)
    assert(cat.versions(name).size === 1)
    // new file appears, but cached listing is fresh → still 1 row
    Files.writeString(tmp.resolve("y.txt"), "2")
    assert(FileOps.readStorageCached(cat, spark, tmp.toString).count() === 1)
    assert(cat.versions(name).size === 1)
    // forced update relists and bumps the listing dataset version
    assert(FileOps.readStorageCached(cat, spark, tmp.toString,
      update = true).count() === 2)
    assert(cat.versions(name).size === 2)
    // glob filter over the cached listing
    assert(FileOps.readStorageCached(cat, spark, tmp.toString,
      pattern = Some("x.*")).count() === 1)
  }

  test("saveOrReuse skips materialization when the chain hash matches") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
      .filter(col("r_regionkey") > 1)
    val (v1, reused1) = cat.saveOrReuse(c, "ckpt")
    assert(!reused1)
    val again = Chain(spark.read.parquet(s"$sf/region.parquet"))
      .filter(col("r_regionkey") > 1)
    val (v2, reused2) = cat.saveOrReuse(again, "ckpt")
    assert(reused2 && v1 === v2)
    // a different chain gets a new version
    val (v3, reused3) = cat.saveOrReuse(c.limit(1), "ckpt")
    assert(!reused3)
    assert(v3 !== v1)
  }

  test("du and ls aggregate the file tree per directory") {
    val tmp = Files.createTempDirectory("tree4")
    Files.createDirectories(tmp.resolve("a/b"))
    Files.writeString(tmp.resolve("a/x.txt"), "12345")     // 5 bytes
    Files.writeString(tmp.resolve("a/b/y.txt"), "123")     // 3 bytes
    Files.writeString(tmp.resolve("top.txt"), "1")         // 1 byte
    val listing = FileOps.readStorage(spark, tmp.toString).toDF
    val du = FileOps.du(listing).as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(du("") === ((9L, 3L)))        // root: all files
    assert(du("a") === ((8L, 2L)))
    assert(du("a/b") === ((3L, 1L)))
    val ls = FileOps.ls(listing, "a").as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(ls === Map("x.txt" -> ((5L, 1L)), "b/" -> ((3L, 1L))))
  }

  test("glob translation corner cases") {
    assert(FileOps.globMatch("*.txt", "a.txt"))
    assert(!FileOps.globMatch("*.txt", "d/a.txt")) // * does not cross /
    assert(FileOps.globMatch("**/*.txt", "d/e/a.txt"))
    assert(FileOps.globMatch("{cats,dogs}/*", "cats/x"))
    assert(!FileOps.globMatch("{cats,dogs}/*", "birds/x"))
    assert(FileOps.globMatch("a?c/*", "abc/z"))
  }

  test("brace expansion: ranges, padding, nesting (storage_pattern parity)") {
    import FileOps.expandBraces
    assert(expandBraces("*.{mp3, wav}") === Seq("*.mp3", "*.wav")) // trim
    assert(expandBraces("file{1..3}") === Seq("file1", "file2", "file3"))
    assert(expandBraces("file{01..03}") === Seq("file01", "file02", "file03"))
    assert(expandBraces("file{3..1}") === Seq("file3", "file2", "file1"))
    assert(expandBraces("f{08..10}") === Seq("f08", "f09", "f10"))
    assert(expandBraces("x{a..c}") === Seq("xa", "xb", "xc"))
    assert(expandBraces("x{c..a}") === Seq("xc", "xb", "xa"))
    assert(expandBraces("{a,b}/{c,d}")
      === Seq("a/c", "a/d", "b/c", "b/d"))
    // unrecognized range specs keep their content (braces consumed —
    // reference parity: _expand_range returns the spec verbatim);
    // unbalanced braces stay fully literal
    assert(expandBraces("x{aa..b}") === Seq("xaa..b"))
    assert(expandBraces("x{1..2..3}") === Seq("x1..2..3"))
    assert(expandBraces("unclosed{a,b") === Seq("unclosed{a,b"))
    // depth-aware comma split: nested comma groups expand in the
    // recursion; a range option beside a comma stays literal (bash
    // semantics); absurd ranges stay literal instead of OOMing
    assert(expandBraces("{a,{b,c}}") === Seq("a", "b", "c"))
    assert(expandBraces("p{x,{1..3}}q") === Seq("pxq", "p1q", "p2q", "p3q"))
    assert(expandBraces("x{1,3..5}") === Seq("x1", "x3..5"))
    assert(expandBraces("x{1..99999999999999999999}")
      === Seq("x1..99999999999999999999"))
    assert(expandBraces("x{0..2000000000}") === Seq("x0..2000000000"))
    // expansion drives matching end to end
    assert(FileOps.globMatch("shard-{01..12}.tar", "shard-07.tar"))
    assert(!FileOps.globMatch("shard-{01..12}.tar", "shard-13.tar"))
    assert(FileOps.globMatch("d/{a..c}/*.{png,jpg}", "d/b/x.jpg"))
    assert(!FileOps.globMatch("d/{a..c}/*.{png,jpg}", "d/e/x.jpg"))
  }

  test("brace patterns select across mixed zip and plain storage") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("mixed_store")
    // plain files part01..part03 + two zips shard1.zip / shard2.zip
    (1 to 3).foreach(i => Files.write(root.resolve(f"part$i%02d.txt"),
      s"plain$i".getBytes("UTF-8")))
    (1 to 2).foreach { z =>
      val zp = root.resolve(s"shard$z.zip")
      val out = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(zp))
      (1 to 2).foreach { m =>
        out.putNextEntry(new java.util.zip.ZipEntry(s"m$m.txt"))
        out.write(s"zip$z-$m".getBytes("UTF-8"))
        out.closeEntry()
      }
      out.close()
    }
    // plain side: a padded numeric range through read_storage's pattern
    val plain = FileOps.readStorage(spark, root.toString,
      Some("part{01..02}.txt")).toDF
      .select("file.path").as[String].collect().sorted
    assert(plain.toSeq === Seq("part01.txt", "part02.txt"))
    // zip side: a brace RANGE over archive names through the central-dir
    // lister (Hadoop globStatus alone can't expand ranges)
    val members = FileOps.readZip(spark,
      s"$root/shard{1..2}.zip").toDF
      .select("file.path").as[String].collect().sorted
    assert(members.toSeq === Seq("shard1.zip/m1.txt", "shard1.zip/m2.txt",
      "shard2.zip/m1.txt", "shard2.zip/m2.txt"))
    // and a comma set restricted to one archive
    val one = FileOps.readZip(spark, s"$root/{shard1,nope}.zip").toDF
      .select("file.path").as[String].collect().sorted
    assert(one.toSeq === Seq("shard1.zip/m1.txt", "shard1.zip/m2.txt"))
  }

  test("webdataset key split: hidden files, multi-dot names, no extension") {
    import graft.files.WebDataset.splitKey
    assert(splitKey("a/0001.jpg") === ("a/0001", "jpg"))
    // FIRST dot of the basename (WebDataset convention): the multi-part
    // extension stays whole so 0001.jpg / 0001.seg.png share one key
    assert(splitKey("a/archive.tar.gz") === ("a/archive", "tar.gz"))
    assert(splitKey("noext") === ("noext", ""))
    assert(splitKey("dir/.hidden") === ("dir/.hidden", "")) // dot-prefix is not an ext
    assert(splitKey("dir/sub/x.json") === ("dir/sub/x", "json"))
    assert(splitKey("trailing/") === ("trailing", ""))
  }

  test("listings() enumerates cached listing datasets with freshness") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val dataDir = Files.createTempDirectory("lst_src")
    Files.write(dataDir.resolve("a.txt"), "x".getBytes)
    FileOps.readStorageCached(cat, spark, s"file://$dataDir")
    cat.save(Chain(spark.read.parquet(s"$sf/region.parquet")), "not_a_listing")
    val ls = FileOps.listings(cat).collect()
    assert(ls.length === 1)
    assert(ls.head.getAs[String]("name").startsWith("lst__"))
    assert(ls.head.getAs[Long]("rows") === 1L)
    assert(!ls.head.getAs[Boolean]("expired"))
  }

  test("webdataset: tar shards group into samples; virtual reads hit byte ranges") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import graft.files.WebDataset
    val dir = Files.createTempDirectory("wds")
    val tar = dir.resolve("shard-000.tar")
    val out = new TarArchiveOutputStream(Files.newOutputStream(tar))
    def add(name: String, bytes: Array[Byte]): Unit = {
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      out.putArchiveEntry(e); out.write(bytes); out.closeArchiveEntry()
    }
    add("a/0001.jpg", "JPGDATA1".getBytes)
    add("a/0001.json", """{"caption":"one"}""".getBytes)
    add("a/0002.jpg", "JPGDATA22".getBytes)
    add("a/0002.json", """{"caption":"two"}""".getBytes)
    out.close()

    val members = WebDataset.readTarMembers(spark, tar.toString)
    assert(members.count() === 4)
    assert(members.select("sample_key").distinct().count() === 2)

    val samples = WebDataset.readSamples(spark, tar.toString)
    assert(samples.count() === 2)
    val row = samples.filter(col("sample_key") === "a/0001").head()
    val parts = row.getAs[Map[String, Array[Byte]]]("parts")
    assert(new String(parts("jpg")) === "JPGDATA1")
    assert(new String(parts("json")).contains("one"))

    // virtual read: byte-range fetch via the location pointer, no payload
    val lazySamples = WebDataset.readSamples(spark, tar.toString, withData = false)
    val loc = lazySamples.filter(col("sample_key") === "a/0002").head()
      .getAs[Map[String, String]]("locations")("jpg")
    assert(new String(WebDataset.readVirtual(loc)) === "JPGDATA22")

    // a FileRef whose location carries the pointer reads the member, not
    // the whole tar (TarVFile semantics)
    val vf = graft.files.FileRef("file://" + dir, "shard-000.tar", 0L, "", "v",
      is_latest = true, null, loc)
    assert(new String(vf.readBytes()) === "JPGDATA22")
  }

  test("FileRef.resolve re-stats from storage; rebase re-roots the source") {
    import graft.files.FileRef
    val dir = Files.createTempDirectory("fr")
    Files.write(dir.resolve("a.txt"), "hello".getBytes)
    val stale = FileRef(s"file://$dir", "a.txt", -99L, "", "old",
      is_latest = false, null, null)
    val fresh = stale.resolve()
    assert(fresh.size === 5L && fresh.is_latest && fresh.etag != "old")
    assert(fresh.last_modified !== null)
    val gone = FileRef(s"file://$dir", "missing.txt", 0L, "", "",
      is_latest = true, null, null).resolve()
    assert(gone.size === -1L && !gone.is_latest)
    assert(stale.rebase("s3a://bucket/").uri === "s3a://bucket/a.txt")
  }

  test("diffVersions labels changes between two saved versions") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    import spark.implicits._
    val v1 = cat.save(Chain(Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v")), "d")
    val v2 = cat.save(Chain(Seq((1L, "a"), (2L, "B"), (4L, "d"))
      .toDF("id", "v")), "d")
    val m = Delta.diffVersions(cat, "d", v1, v2, on = Seq("id"),
        compare = Seq("v"))
      .toDF.select("id", "diff").as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "S", 2L -> "M", 3L -> "D", 4L -> "A"))
  }

  test("version specifiers resolve to the latest satisfying version") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    cat.save(c, "d", Some(SemVer(1, 0, 0)))
    cat.save(c, "d", Some(SemVer(1, 2, 0)))
    cat.save(c, "d", Some(SemVer(1, 2, 5)))
    cat.save(c, "d", Some(SemVer(2, 0, 0)))
    def r(spec: String) = cat.resolveSpec("d", spec).map(_.toString)
    assert(r("1.2.5") === Some("1.2.5"))
    assert(r("1.2") === Some("1.2.5"))   // prefix match
    assert(r("1") === Some("1.2.5"))
    assert(r(">=1.2.0") === Some("2.0.0"))
    assert(r("<2.0.0") === Some("1.2.5"))
    assert(r("<=1.2.0") === Some("1.2.0"))
    assert(r(">2") === None)
    assert(r("^1.0") === Some("1.2.5"))  // same major
    assert(r("~1.2") === Some("1.2.5"))  // same major.minor
    assert(r("~1.0") === Some("1.0.0"))
    assert(cat.readDatasetSpec("d", "^1").count() === 5)
    intercept[NoSuchElementException](cat.readDatasetSpec("d", ">2.0.0"))
  }

  test("find filters listings by glob, name regex, and size bounds") {
    val listing = Seq(
      ("a/sub1/x.txt", 100L), ("a/sub1/y.log", 900L),
      ("a/sub2/z.txt", 900L), ("b/sub1/w.txt", 900L))
      .toDF("p", "s")
      .select(struct(col("p").as("path"), col("s").as("size")).as("file"))
    def paths(df: org.apache.spark.sql.DataFrame) =
      df.select("file.path").as[String].collect().toSet
    assert(paths(FileOps.find(listing, glob = Some("*/sub1/*.txt"))) ===
      Set("a/sub1/x.txt", "b/sub1/w.txt"))
    assert(paths(FileOps.find(listing, glob = Some("a/**"), minSize = 500)) ===
      Set("a/sub1/y.log", "a/sub2/z.txt"))
    assert(paths(FileOps.find(listing, nameRegex = Some("^[wx]"), maxSize = 500)) ===
      Set("a/sub1/x.txt"))
  }

  test("moveDataset renames all versions and patches metadata") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    cat.save(c, "regions"); cat.save(c, "regions")
    cat.moveDataset("regions", "geo.main.regions")
    assert(cat.versions("regions").isEmpty)
    assert(cat.versions("geo.main.regions").size === 2)
    assert(cat.readMeta("geo.main.regions", SemVer(1, 0, 0))
      .contains("\"name\": \"geo.main.regions\""))
    assert(cat.readDataset("geo.main.regions").count() === 5)
    intercept[IllegalArgumentException](cat.moveDataset("nope", "x"))
  }

  test("namespaces: create, list (registered + implied), guarded delete") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    cat.createNamespace("ml")
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    cat.save(c, "prod.corpus.docs")
    // "local" (the default namespace) is always present
    assert(cat.namespaces() === Seq("local", "ml", "prod"))
    intercept[IllegalArgumentException](cat.deleteNamespace("prod"))
    cat.deleteNamespace("ml")
    assert(cat.namespaces() === Seq("local", "prod"))
  }

  test("job metrics: params, scalars, executor-side counters, sidecar") {
    import graft.catalog.JobMetrics
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val jm = JobMetrics(cat, "job-42", spark)
    jm.setParam("threshold", "0.8")
    jm.set("rows_per_sec", 1234.5)
    val dropped = jm.counter("dropped")
    // counter bumped from executor-side tasks, merged on the driver
    spark.range(100).foreach { i => if (i % 4 == 0) dropped.add(1) }
    jm.persist()
    val json = JobMetrics.read(cat, "job-42").get
    assert(json.contains("\"threshold\": \"0.8\""))
    assert(json.contains("\"rows_per_sec\": 1234.5"))
    assert(json.contains("\"dropped\": 25"))
    assert(JobMetrics.read(cat, "nope").isEmpty)
  }

  test("checkpoint index serves many-version catalogs without meta scans") {
    val root = Files.createTempDirectory("cat_idx").toString
    val cat = new Catalog(root, spark)
    val base = Chain(spark.read.parquet(s"$sf/region.parquet"))
    // 30 distinct versions (limit(n) changes the chain hash)
    val chains = (1 to 30).map(n => base.limit(n))
    chains.foreach(c => cat.save(c, "many"))
    // every hash resolves through the index file
    assert(Files.exists(java.nio.file.Paths.get(root, "checkpoints.idx")))
    chains.zipWithIndex.foreach { case (c, i) =>
      assert(cat.findCheckpoint(c.hash) ===
        Some(("many", graft.catalog.SemVer(1, i, 0))))
    }
    // deleting a version invalidates its (stale) index entry
    cat.deleteVersion("many", graft.catalog.SemVer(1, 4, 0))
    assert(cat.findCheckpoint(chains(4).hash).isEmpty)
    // index self-heals for pre-index catalogs: drop the file, hit via scan,
    // then the entry is back
    java.nio.file.Files.delete(java.nio.file.Paths.get(root, "checkpoints.idx"))
    assert(cat.findCheckpoint(chains(9).hash).isDefined)
    assert(Files.exists(java.nio.file.Paths.get(root, "checkpoints.idx")))
  }

  test("projects: create / get / list / delete, reserved names, auto-create") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    // default project auto-creates on first touch, is never creatable directly
    val dflt = cat.getProject(Catalog.DefaultNamespace, Catalog.DefaultProject)
    assert(dflt.namespace === "local" && dflt.name === "local")
    intercept[IllegalArgumentException](cat.createProject("dev", "local"))
    intercept[IllegalArgumentException](cat.createProject("dev", "listing"))
    intercept[IllegalArgumentException](cat.createProject("dev", "has.dot"))
    intercept[IllegalArgumentException](cat.createProject("dev", "has@at"))
    intercept[IllegalArgumentException](cat.createProject("bad.ns", "p"))
    // create + read back metadata
    val p = cat.createProject("dev", "vision", descr = "cv datasets")
    assert(p.descr === "cv datasets" && p.createdAt.nonEmpty)
    assert(cat.getProject("dev", "vision").descr === "cv datasets")
    // idempotent create keeps the original record
    assert(cat.createProject("dev", "vision").createdAt === p.createdAt)
    // unknown projects are an error, no silent creation
    intercept[NoSuchElementException](cat.getProject("dev", "nope"))
    // listing filters by namespace and includes dataset-implied projects
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    cat.save(c, "team.nlp.regions")
    val devNames = cat.listProjects(Some("dev")).map(_.name)
    assert(devNames === Seq("vision"))
    val all = cat.listProjects(None).map(p => (p.namespace, p.name))
    assert(all.contains(("team", "nlp")) && all.contains(("dev", "vision")))
    assert(cat.projectsDF().columns.toSeq ===
      Seq("namespace", "name", "descr", "created_at"))
  }

  test("projects: saveIn qualifies names; delete guards on content") {
    val root = Files.createTempDirectory("cat").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    cat.createProject("team", "nlp")
    val v = cat.saveIn(c, "team", "nlp", "nations")
    assert(cat.datasets().contains("team.nlp.nations"))
    assert(cat.readDataset("team.nlp.nations", Some(v)).count() === c.count())
    // parseDatasetName default-filling (reference dataset.py:78)
    assert(cat.parseDatasetName("n") === (("local", "local", "n")))
    assert(cat.parseDatasetName("p.n") === (("local", "p", "n")))
    assert(cat.parseDatasetName("ns.p.n") === (("ns", "p", "n")))
    intercept[IllegalArgumentException](cat.parseDatasetName("a.b.c.d"))
    // saveIn into an unregistered project fails — projects are explicit
    intercept[NoSuchElementException](cat.saveIn(c, "team", "ghost", "x"))
    // deletion refuses while datasets remain, then succeeds after cleanup
    intercept[IllegalArgumentException](cat.deleteProject("team", "nlp"))
    intercept[IllegalArgumentException](cat.deleteNamespace("team"))
    cat.deleteDataset("team.nlp.nations")
    cat.deleteProject("team", "nlp")
    cat.deleteNamespace("team")
    assert(!cat.namespaces().contains("team"))
    // the default namespace/project can never be deleted
    intercept[IllegalArgumentException](cat.deleteNamespace("local"))
    intercept[IllegalArgumentException](cat.deleteProject("local", "local"))
  }

  test("stats cache revalidates when another instance rewrites the dataset") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("cat_xproc").toString
    val a = new Catalog(root, spark)
    val b = new Catalog(root, spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val v = a.save(Chain(orders.repartitionByRange(4, col("o_orderkey"))), "o")
    a.pruneCount("o", col("o_orderkey") <= 100L) // a caches v's envelopes
    // a DIFFERENT catalog instance (≈ another process) re-creates the
    // dataset at the same version with keys far outside the old range —
    // a's instance-level invalidation never fires, only the freshness
    // token can save the read
    b.deleteDataset("o")
    val v2 = b.save(Chain(orders
      .select((col("o_orderkey") + 1000000L).as("o_orderkey"),
        col("o_totalprice"))
      .repartitionByRange(4, col("o_orderkey"))), "o")
    assert(v2 === v, "re-created dataset restarts at the same version")
    val pred = col("o_orderkey") > 1000000L
    val pruned = a.readDatasetWhere("o", pred)
      .selectExcept("sys").toDF.count()
    val full = a.readDataset("o").selectExcept("sys").toDF
      .filter(pred).count()
    assert(pruned === full && pruned > 0,
      s"stale envelopes must not prune live rows: pruned=$pruned full=$full")
  }

  test("stats.json parses once per version across pruned reads") {
    import org.apache.spark.sql.functions.col
    val cat = new Catalog(Files.createTempDirectory("cat_scache").toString, spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
    val v = cat.save(Chain(orders), "o")
    val base = cat.statsParses
    val pred = col("o_orderkey") <= 100L
    cat.readDatasetWhere("o", pred).toDF.count()
    assert(cat.statsParses === base + 1, "first pruned read parses stats.json")
    cat.readDatasetWhere("o", pred).toDF.count()
    cat.pruneCount("o", pred)
    cat.pruneCount("o", col("o_totalprice") > 0.0)
    assert(cat.statsParses === base + 1,
      s"later reads must hit the cache, parsed ${cat.statsParses - base} times")
    // a second version parses once more; the first stays cached
    val v2 = cat.save(Chain(orders), "o")
    cat.pruneCount("o", pred, Some(v2))
    cat.pruneCount("o", pred, Some(v))
    assert(cat.statsParses === base + 2)
    // dataset-level invalidation drops the cached entries
    cat.deleteDataset("o")
    val v3 = cat.save(Chain(orders), "o")
    cat.pruneCount("o", pred, Some(v3))
    assert(cat.statsParses === base + 3)
  }

  test("dataset annotations: save, filter semantics, legacy-meta patch") {
    val root = Files.createTempDirectory("cat_attrs").toString
    val cat = new graft.catalog.Catalog(root, spark)
    val r = Chain(spark.read.parquet(s"$sf/region.parquet"))
    cat.save(r, "a", description = "first", attrs = Seq("nlp", "loc=US"))
    cat.save(r, "b", attrs = Seq("loc"))

    // reference has_attr semantics: bare vs name=value vs name=*
    assert(cat.attrMatches(Seq("nlp", "loc=US"), "nlp"))
    assert(!cat.attrMatches(Seq("nlp", "loc=US"), "loc"))   // bare ≠ valued
    assert(cat.attrMatches(Seq("nlp", "loc=US"), "loc=US"))
    assert(cat.attrMatches(Seq("nlp", "loc=US"), "loc=*"))
    // reference has_attr: the wildcard test is a.split("=")[0] == name,
    // which a BARE `loc` attr satisfies too (dataset_info.py:50-53)
    assert(cat.attrMatches(Seq("loc"), "loc=*"))
    assert(!cat.attrMatches(Seq("location=US"), "loc=*"))
    assert(cat.datasetsDF(Seq("loc=*")).select("name")
      .as[String].collect().toSeq.sorted === Seq("a", "b"))

    // a meta.json written before annotations existed: strip the fields,
    // then updateDataset must seed them and patch in place (no bump)
    val v = cat.latestVersion("b").get
    val mp = java.nio.file.Paths.get(root, "datasets", "b", s"v$v", "meta.json")
    val legacy = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
      .replaceAll("(?m)^  \"description\".*\n  \"attrs\".*\n", "")
    java.nio.file.Files.write(mp, legacy.getBytes("UTF-8"))
    assert(cat.annotationsOf("b", v) === (("", Seq.empty)))
    cat.updateDataset("b", description = Some("patched \"q\""),
      attrs = Some(Seq("vision")))
    assert(cat.annotationsOf("b", v) === (("patched \"q\"", Seq("vision"))))
    assert(cat.latestVersion("b").get === v)
    // data still readable after the in-place patch
    assert(cat.readDataset("b").toDF.count() === 5L)
  }

  test("readChanges diffs only the churned files of a cow version pair") {
    val root = Files.createTempDirectory("cat_cdfslice").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "o")
    val key = o.agg(min("o_orderkey")).head().getLong(0)
    val mr = cat.deleteWhere("o", col("o_orderkey") === key)
    assert(mr.filesReused >= 6, s"sorted layout must localize: $mr")
    val feed = Delta.readChanges(cat, "o", SemVer(1, 0, 0), mr.version,
      Seq("o_orderkey")).toDF
    // the feed's scans must touch only the churned file pair, not 16
    val nIn = feed.inputFiles.length
    assert(nIn <= 4, s"file-level diff must skip carried files: read $nIn")
    val rows = feed.collect()
    assert(rows.length === 1 &&
      rows(0).getAs[String]("_change_type") === "delete" &&
      rows(0).getAs[Long]("o_orderkey") === key)
    // an OPTIMIZE repack moves rows between files without changing them:
    // every file differs, but the feed must still be empty
    cat.optimize("o", nFiles = 2)
    val v3 = cat.latestVersion("o").get
    assert(Delta.readChanges(cat, "o", mr.version, v3,
      Seq("o_orderkey")).toDF.isEmpty)
  }

  test("append links every prior file and the CDF reports only inserts") {
    val root = Files.createTempDirectory("cat_app").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 20)), "nat")
    val batch = n.filter(col("n_nationkey") >= 20)
    val r = cat.append("nat", batch)
    assert(r.filesRewritten >= 1 && r.filesReused >= 1, s"$r")
    assert(r.rowsAfter === 25L && r.rowsBefore === 20L)
    assert(cat.readDataset("nat").count() === 25L)
    // sys ids keep ascending across the append (chunk/shuffle contract)
    val ids = cat.readDataset("nat").toDF.select("sys.id")
      .collect().map(_.getLong(0))
    assert(ids.distinct.length === 25)
    // the file-level diff sees exactly the appended rows as inserts
    val feed = Delta.readChanges(cat, "nat", SemVer(1, 0, 0), r.version,
      Seq("n_nationkey")).toDF
    assert(feed.filter(col("_change_type") === "insert").count() === 5L)
    assert(feed.count() === 5L)
    // schema mismatch fails loudly
    intercept[IllegalArgumentException](
      cat.append("nat", n.select(col("n_nationkey"))))
    // append onto a stats-less version: no partial stats.json may form
    cat.save(Chain(n), "bare", harvestStats = false)
    val r2 = cat.append("bare", batch.limit(2))
    assert(r2.rowsAfter === 27L)
    assert(cat.fileStats("bare", r2.version).isEmpty,
      "all-or-nothing: a stats-less base must stay stats-less")
    assert(cat.readDataset("bare").count() === 27L)
  }

  test("autoCompact folds small append files, links the big bulk") {
    val root = Files.createTempDirectory("cat_ac").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    cat.save(Chain(o.filter(col("o_orderkey") % 2 === 0).coalesce(1)), "t")
    // five small appends — the streaming-ingest debris shape
    val rest = o.filter(col("o_orderkey") % 2 =!= 0)
    (0 until 5).foreach(i =>
      cat.append("t", rest.filter(col("o_orderkey") % 10 === (2 * i + 1))
        .coalesce(1)))
    val total = o.count()
    val filesBefore = cat.versionDataFiles("t",
      cat.latestVersion("t").get).size
    assert(filesBefore >= 6)
    // under threshold: no version written
    assert(cat.autoCompact("t", maxSmallFiles = 10).isEmpty)
    // over threshold: ONLY the small files compact; the bulk links.
    // smallBytes sits between the batch-file and bulk-file sizes
    val sizes = cat.versionDataFiles("t", cat.latestVersion("t").get)
    val cut = sizes.values.max // bulk file is the largest
    val r = cat.autoCompact("t", maxSmallFiles = 2,
      smallBytes = cut).get
    assert(r.filesReused === 1, s"the bulk file must link: $r")
    assert(r.rowsBefore === total && r.rowsAfter === total)
    assert(cat.versionDataFiles("t", r.version).size < filesBefore)
    assert(cat.readDataset("t").count() === total)
  }

  test("datasetStream follows live appends; mutations need allowChanges") {
    val root = Files.createTempDirectory("cat_tst").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 10)), "nat")
    val ckpt = Files.createTempDirectory("cat_tst_ckpt").toString
    val q = Delta.datasetStream(cat, "nat")
      .writeStream.outputMode("append").format("memory")
      .queryName("tst_live").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("tst_live").count() === 10L)
      // an append committed by the exactly-once sink WHILE the stream
      // runs must arrive (the sink heals the _stream links post-commit)
      val stage = Files.createTempDirectory("cat_tst_in").toString + "/b"
      n.filter(col("n_nationkey") >= 10).coalesce(1).write.parquet(stage)
      val schema = spark.read.parquet(stage).schema
      val sink = graft.streaming.EventStream.appendToDataset(
        spark.readStream.schema(schema).parquet(stage), cat, "nat",
        Files.createTempDirectory("cat_tst_ck2").toString)
      sink.awaitTermination()
      q.processAllAvailable()
      assert(spark.table("tst_live").count() === 25L)
      // LAYOUT-ONLY maintenance (dataChange=false): autoCompact between
      // appends must neither duplicate nor stall the strict follower
      assert(cat.autoCompact("nat", maxSmallFiles = 0,
        smallBytes = Long.MaxValue).nonEmpty)
      cat.append("nat", n.limit(0)) // no-op-ish append keeps versions moving
      Delta.healDatasetStream(cat, "nat")
      q.processAllAvailable()
      assert(spark.table("tst_live").count() === 25L,
        "a row-identical repack must emit nothing")
    } finally q.stop()
    // a REAL mutation breaks the append-only contract loudly...
    cat.deleteWhere("nat", col("n_nationkey") === 0L)
    intercept[IllegalArgumentException](Delta.datasetStream(cat, "nat"))
    // ...and allowChanges takes ignoreChanges semantics verbatim: a
    // replay from the start of history emits every file version ever
    // committed — the deleted key still appears (it lives in a
    // pre-delete file) and the rewritten file's SURVIVORS appear twice
    val ckpt3 = Files.createTempDirectory("cat_tst_ck3").toString
    val replay = graft.streaming.EventStream.runAvailableNow(
      Delta.datasetStream(cat, "nat", allowChanges = true),
      "tst_replay", ckpt3, noDataBatch = false)
    assert(replay.select("n_nationkey").distinct().count() === 25L)
    val survivorCopies = replay.filter(col("n_nationkey") === 1L).count()
    assert(survivorCopies >= 2L,
      s"rewritten file must re-emit its survivors: $survivorCopies")
  }

  test("datasetStream heal: vacuumed _linked mark never re-links carried files") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("cat_vacmark").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 10)), "nv")
    Delta.datasetStream(cat, "nv") // brings up the strict farm, mark=v1
    cat.append("nv", n.filter(col("n_nationkey") >= 10 &&
      col("n_nationkey") < 15)) // v2
    val v2 = cat.latestVersion("nv").get
    Delta.healDatasetStream(cat, "nv") // follower catches up: mark=v2
    cat.append("nv", n.filter(col("n_nationkey") >= 15 &&
      col("n_nationkey") < 20)) // v3 — heal LAGS here (no sink running)
    val farm = java.nio.file.Paths.get(root, "datasets", "nv",
      "_stream", "strict")
    def links(): Seq[String] = {
      val s = java.nio.file.Files.list(farm)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).toSeq
      finally s.close()
    }
    def rels(): Seq[String] = links().map(_.split("__", 2)(1))
    val before = links().toSet
    assert(rels().distinct.size === rels().size, "clean farm precondition")
    // the vacuum interplay: the marked version v2 vanishes while the
    // heal still lags behind v3
    cat.deleteVersion("nv", v2)
    Delta.healDatasetStream(cat, "nv")
    // v3 appended one file; the carried v1/v2 files must NOT re-link
    // under the v3 prefix beside their existing links
    val added = links().toSet -- before
    assert(added.size === 1, s"only v3's own file links, got $added")
    assert(rels().distinct.size === rels().size,
      "carried files must not re-link under a second version prefix")
    // the farm keeps following: a fresh append links exactly its own files
    cat.append("nv", n.filter(col("n_nationkey") >= 20))
    Delta.healDatasetStream(cat, "nv")
    assert(rels().distinct.size === rels().size)
    // end-to-end: a strict replay sees every row exactly once
    val ck = Files.createTempDirectory("cat_vacmark_ck").toString
    val replay = graft.streaming.EventStream.runAvailableNow(
      Delta.datasetStream(cat, "nv"), "vacmark_replay", ck,
      noDataBatch = false)
    assert(replay.count() === 25L)
    assert(replay.select("n_nationkey").distinct().count() === 25L)
  }

  test("bloom probe re-hashes cross-family literals in the column's domain") {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    def xx(l: Literal): Long =
      new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]
    // build side: a DOUBLE column bloomed in the double domain (canon)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100)
    Seq(1.5, 5.0).foreach(d => bf.putLong(xx(Literal(d, DoubleType))))
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val blooms = Map("d" -> bos.toByteArray)
    val f = graft.catalog.FileStats.FileStat("f1", 2, Map("d" ->
      graft.catalog.FileStats.ColStats("d", 0, 0, 1.5, 5.0, null, null, 0)))
    // un-analyzed predicate: INT literal against the double column (no
    // analyzer promote-cast). The probe must re-hash 5 in the column's
    // domain (5.0) instead of missing in the long domain and pruning a
    // file that holds the match.
    val eq5 = EqualTo(UnresolvedAttribute("d"), Literal(5, IntegerType))
    assert(graft.catalog.FileStats.mayMatch(eq5, f, blooms),
      "cross-family equality must keep the file that holds the value")
    assert(graft.catalog.FileStats.evalMay(
      graft.catalog.FileStats.compile(eq5), f, blooms))
    // genuine absence (inside the range envelope) still prunes
    val eq3 = EqualTo(UnresolvedAttribute("d"), Literal(3, IntegerType))
    assert(!graft.catalog.FileStats.mayMatch(eq3, f, blooms))
    assert(!graft.catalog.FileStats.evalMay(
      graft.catalog.FileStats.compile(eq3), f, blooms))
    // fractional literal on an integral column: the bloom abstains
    // (no long can equal 2.5; the range check is the decider)
    val fl = graft.catalog.FileStats.FileStat("f2", 2, Map("k" ->
      graft.catalog.FileStats.ColStats("l", 1, 9, 0, 0, null, null, 0)))
    val bfL = org.apache.spark.util.sketch.BloomFilter.create(100)
    bfL.putLong(xx(Literal(4L, org.apache.spark.sql.types.LongType)))
    val bosL = new java.io.ByteArrayOutputStream()
    bfL.writeTo(bosL)
    val eqFrac = EqualTo(UnresolvedAttribute("k"), Literal(2.5, DoubleType))
    assert(graft.catalog.FileStats.mayMatch(eqFrac, fl,
      Map("k" -> bosL.toByteArray)), "bloom must abstain, not mis-hash")
  }

  test("datasetStream strict heal survives a vacuumed mark after auto-compact") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("cat_vaccomp").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 8).repartition(2)), "nc")
    Delta.datasetStream(cat, "nc") // strict farm up, mark=v1
    cat.append("nc", n.filter(col("n_nationkey") >= 8 &&
      col("n_nationkey") < 12)) // v2
    Delta.healDatasetStream(cat, "nc")
    // layout-only repack: the walk SKIPS it but the mark advances past
    // it — the farm still holds the pre-compaction rels
    val rc = cat.autoCompact("nc", maxSmallFiles = 1)
    assert(rc.nonEmpty, "fixture must compact")
    Delta.healDatasetStream(cat, "nc")
    val markV = cat.latestVersion("nc").get
    cat.append("nc", n.filter(col("n_nationkey") >= 12 &&
      col("n_nationkey") < 15)) // v4 — heal lags
    cat.deleteVersion("nc", markV) // the mark version vanishes
    val farm = java.nio.file.Paths.get(root, "datasets", "nc",
      "_stream", "strict")
    def rels(): Seq[String] = {
      val s = java.nio.file.Files.list(farm)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).map(_.split("__", 2)(1)).toSeq
      finally s.close()
    }
    val before = rels().size
    // the census sidecar gives the heal the VACUUMED mark version's
    // exact baseline: v4 is append-only relative to it, so the heal
    // must LINK v4's file — the farm-seed fallback misread the
    // compacted-away rels as removals and stalled strict forever
    Delta.healDatasetStream(cat, "nc")
    assert(rels().size === before + 1,
      s"post-compaction append must link after a vacuumed mark: ${rels()}")
    assert(rels().distinct.size === rels().size, "no re-links")
    val ck = Files.createTempDirectory("cat_vaccomp_ck").toString
    val replay = graft.streaming.EventStream.runAvailableNow(
      Delta.datasetStream(cat, "nc"), "vaccomp_replay", ck,
      noDataBatch = false)
    assert(replay.select("n_nationkey").distinct().count() === 15L)
  }

  test("datasetStream heal: corrupt _linked mark self-heals from the farm") {
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("cat_badmark").toString
    val cat = new Catalog(root, spark)
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 10)), "nb")
    Delta.datasetStream(cat, "nb") // strict farm up, mark=v1
    cat.append("nb", n.filter(col("n_nationkey") >= 10 &&
      col("n_nationkey") < 15)) // v2
    Delta.healDatasetStream(cat, "nb") // mark=v2
    val farm = java.nio.file.Paths.get(root, "datasets", "nb",
      "_stream", "strict")
    def links(): Seq[String] = {
      val s = java.nio.file.Files.list(farm)
      try s.iterator.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).toSeq
      finally s.close()
    }
    def rels(): Seq[String] = links().map(_.split("__", 2)(1))
    val before = links().toSet
    // scribble the mark: a strict heal must neither stall nor duplicate
    val markP = farm.resolve("_linked")
    java.nio.file.Files.write(markP, "not a version".getBytes("UTF-8"))
    cat.append("nb", n.filter(col("n_nationkey") >= 15 &&
      col("n_nationkey") < 20)) // v3
    Delta.healDatasetStream(cat, "nb") // the heal hits the corrupt mark
    val added = links().toSet -- before
    assert(added.size === 1, s"only v3's own file links, got $added")
    assert(rels().distinct.size === rels().size,
      "self-healed resume must not re-link carried files")
    // the mark file itself was repaired to a parsable version
    val healed = new String(
      java.nio.file.Files.readAllBytes(markP), "UTF-8").trim
    assert(graft.catalog.SemVer.parse(healed) ===
      cat.latestVersion("nb").get)
    // exactly-once replay across the corruption
    val ck = Files.createTempDirectory("cat_badmark_ck").toString
    val replay = graft.streaming.EventStream.runAvailableNow(
      Delta.datasetStream(cat, "nb"), "badmark_replay", ck,
      noDataBatch = false)
    assert(replay.count() === 20L)
    assert(replay.select("n_nationkey").distinct().count() === 20L)
  }

  test("changesStream follows syncs committed WHILE the stream runs") {
    val root = Files.createTempDirectory("cat_cdfst").toString
    val cat = new Catalog(root, spark)
    val n = Chain(spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name")))
    cat.save(n, "nat")
    Delta.syncChanges(cat, "nat", Seq("n_nationkey"))
    val ckpt = Files.createTempDirectory("cat_cdfst_ckpt").toString
    val q = Delta.changesStream(cat, "nat")
      .writeStream.outputMode("append").format("memory")
      .queryName("cdfst_live").option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val snap = spark.table("cdfst_live").count()
      assert(snap === 25L, s"first sync snapshots all rows: $snap")
      // a sync committed AFTER the stream started must arrive as a new
      // micro-batch without a restart
      cat.deleteWhere("nat", col("n_nationkey") < 5L)
      Delta.syncChanges(cat, "nat", Seq("n_nationkey"))
      q.processAllAvailable()
      val dels = spark.table("cdfst_live")
        .filter(col("_change_type") === "delete").count()
      assert(dels === 5L, s"live-followed deletes: $dels")
    } finally q.stop()
  }

  test("partitioned reads return recorded-schema column order and dtypes") {
    // Partitioned NON-evolved versions resolve through fullReadSchema
    // (explicit schema, no inference flip): the partition column comes
    // back in its ORIGINAL position and dtype, not appended last as an
    // inference-off string. Pins the read-back layout contract.
    val root = Files.createTempDirectory("cat_part_order").toString
    val cat = new Catalog(root, spark)
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val v = cat.save(Chain(nation), "natp", partitionBy = Seq("n_regionkey"))
    val back = cat.readDataset("natp", Some(v)).toDF
    // column order: the pre-save user columns in order, sys last
    assert(back.columns.toSeq === nation.columns.toSeq :+ "sys")
    // partition column keeps its recorded dtype (long, not string)
    assert(back.schema("n_regionkey").dataType ===
      nation.schema("n_regionkey").dataType)
    // rows identical under the restored layout
    assert(back.drop("sys").collect().toSet === nation.collect().toSet)
  }
}
