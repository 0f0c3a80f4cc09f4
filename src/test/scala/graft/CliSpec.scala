package graft

import java.nio.file.Files
import graft.catalog.Catalog
import graft.cli.Cli
import graft.core.Chain

/** CLI surface: each command drives the same library calls and renders
  * plain text (reference: src/datachain/cli/commands/). */
class CliSpec extends SparkSpec {

  private def storageDir(): String = {
    val d = Files.createTempDirectory("clifs")
    Files.writeString(d.resolve("a.txt"), "hello")
    Files.createDirectories(d.resolve("sub"))
    Files.writeString(d.resolve("sub/b.bin"), "0123456789")
    d.toString
  }

  test("ls / du / find render listings") {
    val dir = storageDir()
    val (c1, out1) = Cli.run(Seq("ls", dir), spark)
    assert(c1 === 0)
    assert(out1.linesIterator.toSeq.head === "path\tsize")
    assert(out1.contains("a.txt\t5") && out1.contains("sub/b.bin\t10"))

    val (c2, out2) = Cli.run(Seq("du", dir), spark)
    assert(c2 === 0)
    // root dir "" totals both files; "sub" totals its own
    assert(out2.linesIterator.exists(_.startsWith("\t15\t2")))
    assert(out2.linesIterator.exists(l => l.startsWith("sub\t10\t1")))

    val (c3, out3) = Cli.run(Seq("find", dir, "--name", "\\.bin$"), spark)
    assert(c3 === 0)
    assert(out3.contains("sub/b.bin") && !out3.contains("a.txt"))
  }

  test("cp exports blobs with placement") {
    val dir = storageDir()
    val dest = Files.createTempDirectory("clidest").toString
    val (c, out) = Cli.run(Seq("cp", dir, dest), spark)
    assert(c === 0 && out.startsWith("copied 2 files"))
    assert(Files.readString(java.nio.file.Paths.get(dest, "sub/b.bin")) ===
      "0123456789")
  }

  test("dataset commands: datasets/versions/show/mv/rm against a catalog") {
    val root = Files.createTempDirectory("clicat").toString
    val cat = new Catalog(root, spark)
    cat.save(Chain(spark.read.parquet(s"$sf/region.parquet")), "regions")
    val cargs = Seq("--catalog", root)

    val (c1, out1) = Cli.run(Seq("datasets") ++ cargs, spark)
    assert(c1 === 0 && out1.contains("regions\t1.0.0\t5"))

    val (c2, out2) = Cli.run(Seq("versions", "regions") ++ cargs, spark)
    assert(c2 === 0 && out2.trim === "v1.0.0")

    val (c3, out3) = Cli.run(Seq("show", "regions", "-n", "2") ++ cargs, spark)
    assert(c3 === 0)
    assert(out3.linesIterator.toSeq.head.split('\t').contains("r_name"))
    assert(out3.linesIterator.size === 3) // header + 2 rows

    val (c4, _) = Cli.run(Seq("mv-dataset", "regions", "geo") ++ cargs, spark)
    assert(c4 === 0)
    val (c5, out5) = Cli.run(Seq("versions", "geo") ++ cargs, spark)
    assert(c5 === 0 && out5.trim === "v1.0.0")
    val (c6, _) = Cli.run(Seq("rm-dataset", "geo") ++ cargs, spark)
    assert(c6 === 0)
    assert(cat.datasets().isEmpty)
  }

  test("lineage / vacuum commands") {
    val root = Files.createTempDirectory("clivac").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/region.parquet"))
    val v1 = cat.save(c, "base")
    cat.save(c.limit(3), "base")
    cat.save(c.limit(2), "derived", deps = Seq(s"base@v$v1"))
    val cargs = Seq("--catalog", root)

    val (l1, out1) = Cli.run(Seq("lineage") ++ cargs, spark)
    assert(l1 === 0)
    assert(out1.contains("derived\t1.0.0\tbase\t1.0.0"))

    // keep=1 per dataset, but base@1.0.0 survives as derived's dep
    val (v2, out2) = Cli.run(Seq("vacuum", "--keep", "1") ++ cargs, spark)
    assert(v2 === 0)
    assert(out2.trim === "nothing to vacuum" ||
      !out2.contains("base@v1.0.0"))
    assert(cat.versions("base").contains(v1))
    val (v3, out3) = Cli.run(Seq("vacuum", "--keep", "1") ++ cargs, spark)
    assert(v3 === 0 && out3.trim === "nothing to vacuum")
  }

  test("restore / clone / optimize commands") {
    val root = Files.createTempDirectory("clirestore").toString
    val cat = new Catalog(root, spark)
    val c = Chain(spark.read.parquet(s"$sf/nation.parquet"))
    val v1 = cat.save(c, "nat")
    cat.deleteWhere("nat",
      org.apache.spark.sql.functions.col("n_regionkey") === 0)
    val cargs = Seq("--catalog", root)

    val (r1, out1) = Cli.run(Seq("restore", "nat", "1.0.0") ++ cargs, spark)
    assert(r1 === 0 && out1.contains("restored nat to v1.0.0"), out1)
    assert(cat.readDataset("nat").toDF.count() === c.toDF.count())

    val (r2, out2) = Cli.run(Seq("clone", "nat", "nat2") ++ cargs, spark)
    assert(r2 === 0 && out2.contains("cloned nat -> nat2@v1.0.0"), out2)
    assert(cat.readDataset("nat2").toDF.count() === c.toDF.count())

    val (r3, out3) = Cli.run(Seq("optimize", "nat", "--files", "2",
      "--zorder-by", "n_nationkey,n_regionkey") ++ cargs, spark)
    assert(r3 === 0 && out3.contains("optimized nat"), out3)
    assert(out3.contains("zorder n_nationkey,n_regionkey"), out3)
    // bad version errors cleanly
    val (r4, out4) = Cli.run(Seq("restore", "nat", "9.9.9") ++ cargs, spark)
    assert(r4 === 2 && out4.contains("error"), out4)
  }

  test("sync-changes / mv-refresh commands") {
    val root = Files.createTempDirectory("clicdc").toString
    val cat = new Catalog(root, spark)
    val n = Chain(spark.read.parquet(s"$sf/nation.parquet")
      .select(org.apache.spark.sql.functions.col("n_nationkey"),
        org.apache.spark.sql.functions.col("n_regionkey")))
    cat.save(n, "nat")
    graft.delta.MatView.create(cat, "by_region", "nat",
      Seq("n_nationkey"), Seq("n_regionkey"),
      Seq(graft.delta.MvAgg("n", "count", "*")))
    val cargs = Seq("--catalog", root)
    val (s1, o1) = Cli.run(Seq("sync-changes", "nat", "n_nationkey") ++
      cargs, spark)
    assert(s1 === 0 && o1.contains("exported 25 change rows"), o1)
    val (s2, o2) = Cli.run(Seq("sync-changes", "nat", "n_nationkey") ++
      cargs, spark)
    assert(s2 === 0 && o2.contains("already in sync"), o2)
    cat.deleteWhere("nat",
      org.apache.spark.sql.functions.col("n_regionkey") === 0)
    val (m1, mo1) = Cli.run(Seq("mv-refresh", "by_region") ++ cargs, spark)
    assert(m1 === 0 && mo1.contains("additive") &&
      mo1.contains("deleted=1"), mo1)
    val (m2, mo2) = Cli.run(Seq("mv-refresh", "by_region") ++ cargs, spark)
    assert(m2 === 0 && mo2.contains("noop"), mo2)
  }

  test("append / auto-compact commands") {
    val root = Files.createTempDirectory("cliapp").toString
    val cat = new Catalog(root, spark)
    import org.apache.spark.sql.functions.col
    val n = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    cat.save(Chain(n.filter(col("n_nationkey") < 20)), "nat")
    val staged = Files.createTempDirectory("cliapp_in").toString + "/b"
    n.filter(col("n_nationkey") >= 20).coalesce(1).write.parquet(staged)
    val cargs = Seq("--catalog", root)
    val (a1, ao1) = Cli.run(Seq("append", "nat", staged) ++ cargs, spark)
    assert(a1 === 0 && ao1.contains("appended 5 rows"), ao1)
    assert(cat.readDataset("nat").count() === 25L)
    val (c1, co1) = Cli.run(Seq("auto-compact", "nat",
      "--max-small", "10") ++ cargs, spark)
    assert(c1 === 0 && co1.contains("under threshold"), co1)
    val (c2, co2) = Cli.run(Seq("auto-compact", "nat", "--max-small", "0",
      "--small-mb", "1024") ++ cargs, spark)
    assert(c2 === 0 && co2.contains("compacted"), co2)
    assert(cat.readDataset("nat").count() === 25L)
  }

  test("namespaces / projects / error paths") {
    val root = Files.createTempDirectory("clicat").toString
    val cat = new Catalog(root, spark)
    cat.createProject("dev", "vision", descr = "cv")
    val cargs = Seq("--catalog", root)

    val (c1, out1) = Cli.run(Seq("namespaces") ++ cargs, spark)
    assert(c1 === 0 && out1.linesIterator.toSet === Set("dev", "local"))

    val (c2, out2) = Cli.run(Seq("projects", "dev") ++ cargs, spark)
    assert(c2 === 0 && out2.trim === "dev.vision  # cv")

    val (c3, out3) = Cli.run(Seq("bogus"), spark)
    assert(c3 === 2 && out3.contains("unknown command"))
    val (c4, out4) = Cli.run(Seq("show", "nope") ++ cargs, spark)
    assert(c4 === 1 && out4.startsWith("error:"))
    val (c5, out5) = Cli.run(Seq("versions") ++ cargs, spark)
    assert(c5 === 2 && out5.contains("needs <name>"))
  }

  test("storage detail / flatten commands") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("clistore").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(graft.core.Chain(o), "t")
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    cat.deleteWhere("t", col("o_orderkey") <= mx / 8)
    val cargs = Seq("--catalog", root)
    // summary: one row per dataset with the sharing factor
    val (c0, out0) = Cli.run(Seq("storage") ++ cargs, spark)
    assert(c0 === 0 && out0.contains("t versions=2"))
    // drill-down: v2's manifest names v1 as a shared owner
    val (c1, out1) = Cli.run(Seq("storage", "t") ++ cargs, spark)
    assert(c1 === 0 && out1.linesIterator.size === 2)
    assert(out1.contains("t@v1.0.0:"), s"owner drill-down missing: $out1")
    // flatten re-owns everything; detail shows self-only
    val (c2, out2) = Cli.run(Seq("flatten", "t") ++ cargs, spark)
    assert(c2 === 0 && out2.startsWith("flattened t as v"))
    val (c3, out3) = Cli.run(Seq("storage", "t") ++ cargs, spark)
    val last = out3.linesIterator.toSeq.last
    assert(last.contains("owners=self:"), s"flattened owners: $last")
  }

  test("fsck command: clean exit 0, critical findings exit 1") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("clifsck").toString
    val cat = new Catalog(root, spark)
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
    cat.save(Chain(o), "t")
    val mx = o.agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .head().getLong(0)
    val r = cat.deleteWhere("t", col("o_orderkey") <= mx / 8)
    val cargs = Seq("--catalog", root)
    val (c0, out0) = Cli.run(Seq("fsck") ++ cargs, spark)
    assert(c0 === 0 && out0 === "clean")
    // non-critical finding only → still exit 0 (scripts gate on data loss)
    val lock = java.nio.file.Paths.get(root, "datasets", "t", ".commit.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 600000L))
    val (c1, out1) = Cli.run(Seq("fsck") ++ cargs, spark)
    assert(c1 === 0 && out1.contains("stale-lock"), out1)
    // critical: physically remove a carried data file → exit 1
    val victim = cat.dataFilesOf("t", r.version)
      .filterNot(_.v == r.version).head
    Files.delete(java.nio.file.Paths.get(root, "datasets", "t",
      s"v${victim.v}", "data", victim.rel))
    val (c2, out2) = Cli.run(Seq("fsck") ++ cargs, spark)
    assert(c2 === 1 && out2.contains("missing-data-file"), out2)
  }

  test("locks / break-lock commands") {
    import spark.implicits._
    val root = Files.createTempDirectory("clilock").toString
    val cat = new Catalog(root, spark)
    cat.save(graft.core.Chain(Seq((1, "a")).toDF("k", "s")), "t")
    val cargs = Seq("--catalog", root)

    val (c0, out0) = Cli.run(Seq("locks") ++ cargs, spark)
    assert(c0 === 0 && out0 === "no commit locks held")
    // plant a crashed holder's lock
    val lockP = java.nio.file.Paths.get(root, "datasets", "t", ".commit.lock")
    Files.createFile(lockP)
    val (c1, out1) = Cli.run(Seq("locks") ++ cargs, spark)
    assert(c1 === 0 && out1.contains("t") && out1.contains("ms"))
    // fresh lock: refused without force (require → usage-class exit 2)
    val (c2, out2) = Cli.run(Seq("break-lock", "t") ++ cargs, spark)
    assert(c2 === 2 && out2.contains("LIVE commit"))
    val (c3, out3) =
      Cli.run(Seq("break-lock", "t", "--force", "true") ++ cargs, spark)
    assert(c3 === 0 && out3 === "broke lock on t")
    assert(!Files.exists(lockP))
    // table still writable afterwards
    assert(cat.deleteWhere("t", org.apache.spark.sql.functions
      .col("k") === 0).rowsAfter === 1)
  }
}
