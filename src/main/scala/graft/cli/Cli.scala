package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, SemVer}
import graft.files.FileOps

/**
 * Thin command-line surface over the engine — the Spark restatement of the
 * reference CLI (reference: src/datachain/cli/commands/{ls,du,datasets,
 * show}.py). Every command is a pure function from parsed args to a small
 * result string computed by the same library calls users script against;
 * the CLI adds no second code path.
 *
 *   graft-cli ls <uri> [--glob P]           list files under a storage root
 *   graft-cli du <uri>                      per-directory byte totals
 *   graft-cli find <uri> [--name R] [--min-size N] [--max-size N]
 *   graft-cli cp <uri> <dest> [--glob P]    export matching blobs
 *   graft-cli datasets                      saved datasets with versions/rows
 *   graft-cli versions <name>               versions of one dataset
 *   graft-cli show <name> [--version V] [-n N]   head of a saved dataset
 *   graft-cli rm-dataset <name>             delete a dataset (all versions)
 *   graft-cli mv-dataset <from> <to>        rename a dataset
 *   graft-cli restore <name> <version>      roll back (zero-copy link)
 *   graft-cli clone <src> <dest> [--version V]   shallow clone
 *   graft-cli optimize <name> [--files N] [--zorder-by c1,c2,...]
 *   graft-cli append <name> <parquet-path>  zero-rewrite append version
 *   graft-cli auto-compact <name> [--max-small N] [--small-mb MB]
 *   graft-cli sync-changes <name> <k1,k2>   export CDF rows since last sync
 *   graft-cli mv-refresh <name>             refresh a materialized view
 *   graft-cli locks                         datasets holding a commit lock
 *   graft-cli break-lock <name> [--force true]   remove a crashed
 *                                           holder's lock (fresh locks are
 *                                           live commits — refused unless
 *                                           forced)
 *   graft-cli namespaces                    list namespaces
 *   graft-cli projects [namespace]          list projects
 *
 * Catalog root comes from --catalog <dir> or GRAFT_CATALOG (default
 * ./graft_catalog), matching the reference's implicit local metastore.
 */
object Cli {

  final case class Parsed(cmd: String, positional: Seq[String],
                          flags: Map[String, String])

  def parse(args: Seq[String]): Parsed = {
    require(args.nonEmpty, usage)
    val cmd = args.head
    val (flags, pos) = {
      var f = Map.empty[String, String]
      val p = Seq.newBuilder[String]
      var i = 1
      while (i < args.length) {
        val a = args(i)
        if (a.startsWith("--")) {
          require(i + 1 < args.length, s"flag $a needs a value")
          f += (a.drop(2) -> args(i + 1)); i += 2
        } else if (a == "-n") {
          require(i + 1 < args.length, "-n needs a value")
          f += ("n" -> args(i + 1)); i += 2
        } else { p += a; i += 1 }
      }
      (f, p.result())
    }
    Parsed(cmd, pos, flags)
  }

  val usage: String =
    """usage: graft-cli <command> [args]
      |commands: ls du find cp datasets versions show rm-dataset mv-dataset
      |          lineage storage export import vacuum restore clone optimize
      |          flatten fsck append auto-compact sync-changes mv-refresh
      |          locks break-lock namespaces projects""".stripMargin

  /** Run a command; returns (exit code, rendered output). Never calls
    * System.exit — `main` owns process concerns, tests call this. */
  def run(args: Seq[String], spark: SparkSession): (Int, String) =
    try {
      val p = parse(args)
      val catRoot = p.flags.getOrElse("catalog",
        sys.env.getOrElse("GRAFT_CATALOG", "graft_catalog"))
      lazy val cat = new Catalog(catRoot, spark)
      def listing(uri: String) =
        FileOps.readStorage(spark, uri, p.flags.get("glob")).toDF
      val out = p.cmd match {
        case "ls" =>
          render(listing(arg(p, 0, "uri"))
            .select(col("file.path"), col("file.size"))
            .orderBy("path"))
        case "du" =>
          render(FileOps.du(listing(arg(p, 0, "uri")))
            .orderBy("dir"))
        case "find" =>
          render(FileOps.find(listing(arg(p, 0, "uri")),
              glob = p.flags.get("glob"), nameRegex = p.flags.get("name"),
              minSize = p.flags.getOrElse("min-size", "-1").toLong,
              maxSize = p.flags.getOrElse("max-size", "-1").toLong)
            .select(col("file.path"), col("file.size")).orderBy("path"))
        case "cp" =>
          val src = listing(arg(p, 0, "uri"))
          FileOps.toStorage(src, arg(p, 1, "dest"),
            placement = p.flags.getOrElse("placement", "fullpath"))
          s"copied ${src.count()} files to ${arg(p, 1, "dest")}"
        case "datasets" => render(cat.datasetsDF().orderBy("name", "version"))
        case "versions" =>
          cat.versions(arg(p, 0, "name")).map(v => s"v$v").mkString("\n")
        case "show" =>
          val name = arg(p, 0, "name")
          val version = p.flags.get("version").map(SemVer.parse)
          val n = p.flags.getOrElse("n", "10").toInt
          render(graft.core.Sys.drop(cat.readDataset(name, version).toDF)
            .limit(n))
        case "rm-dataset" => cat.deleteDataset(arg(p, 0, "name"))
          s"deleted ${arg(p, 0, "name")}"
        case "mv-dataset" => cat.moveDataset(arg(p, 0, "from"), arg(p, 1, "to"))
          s"moved ${arg(p, 0, "from")} -> ${arg(p, 1, "to")}"
        case "lineage" => render(cat.lineageDF()
          .orderBy("dataset", "version", "dep_name"))
        case "storage" =>
          // logical (per-version claims) vs physical bytes — the
          // manifest sharing factor per dataset; with a dataset arg,
          // the per-version drill-down: which versions share which
          // owners' pools
          p.positional.headOption match {
            case Some(name) =>
              cat.storageDetail(name).map { case (v, nf, bytes, owners) =>
                s"v$v files=$nf logical=$bytes owners=$owners"
              } match {
                case Nil => s"no versions in $name"
                case rows => rows.mkString("\n")
              }
            case None =>
              cat.storageStats().map { case (n, vs, log, phys) =>
                s"$n versions=$vs logical=$log physical=$phys"
              } match {
                case Nil => "no datasets"
                case rows => rows.mkString("\n")
              }
          }
        case "flatten" =>
          val name = arg(p, 0, "name")
          val nv = cat.flattenVersion(name)
          s"flattened $name as v$nv"
        case "fsck" =>
          // fsck-family contract: exit 0 only when nothing critical was
          // found, so `graft-cli fsck && promote.sh` gates correctly
          cat.fsck() match {
            case Nil => "clean"
            case rows =>
              val text = rows.map { case (n, subj, finding, sev) =>
                s"$sev $n $subj $finding"
              }.mkString("\n")
              return (if (rows.exists(_._4 == "critical")) 1 else 0, text)
          }
        case "export" =>
          val name = arg(p, 0, "name")
          val v = SemVer.parse(arg(p, 1, "version"))
          val (nf, bytes) = cat.exportVersion(name, v, arg(p, 2, "dest"))
          s"exported $name@v$v: $nf files, $bytes bytes"
        case "import" =>
          val name = arg(p, 0, "name")
          val nv = cat.importVersion(name, arg(p, 1, "src"))
          s"imported $name@v$nv"
        case "vacuum" =>
          val keep = p.flags.getOrElse("keep", "2").toInt
          val dry = p.flags.get("dry-run").exists(_.equalsIgnoreCase("true"))
          val gone = cat.vacuum(keep, dryRun = dry)
          val verb = if (dry) "would delete" else "deleted"
          if (gone.isEmpty) "nothing to vacuum"
          else gone.map { case (n, v) => s"$verb $n@v$v" }.mkString("\n")
        case "restore" =>
          val name = arg(p, 0, "name")
          val to = SemVer.parse(arg(p, 1, "version"))
          val nv = cat.restore(name, to)
          s"restored $name to v$to as v$nv"
        case "clone" =>
          val src = arg(p, 0, "src")
          val dst = arg(p, 1, "dest")
          val nv = cat.cloneDataset(src, dst,
            p.flags.get("version").map(SemVer.parse))
          s"cloned $src -> $dst@v$nv"
        case "optimize" =>
          val name = arg(p, 0, "name")
          val n = p.flags.getOrElse("files", "32").toInt
          val z = p.flags.get("zorder-by")
            .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil)
          val (nv, before, after) = cat.optimize(name, nFiles = n,
            zorderByCols = z)
          s"optimized $name: $before -> $after files as v$nv" +
            (if (z.nonEmpty) s" (zorder ${z.mkString(",")})" else "")
        case "append" =>
          val name = arg(p, 0, "name")
          val src = arg(p, 1, "parquet-path")
          val r = cat.append(name, spark.read.parquet(src))
          s"appended ${r.rowsAfter - r.rowsBefore} rows to $name as " +
            s"v${r.version} (${r.filesReused} files linked)"
        case "auto-compact" =>
          val name = arg(p, 0, "name")
          val maxSmall = p.flags.getOrElse("max-small", "16").toInt
          val smallMb = p.flags.getOrElse("small-mb", "32").toLong
          cat.autoCompact(name, maxSmall, smallMb << 20) match {
            case None => s"$name under threshold, nothing compacted"
            case Some(r) => s"compacted ${r.filesRewritten} small files " +
              s"of $name (${r.filesReused} linked) as v${r.version}"
          }
        case "sync-changes" =>
          val name = arg(p, 0, "name")
          val on = arg(p, 1, "keys").split(',').map(_.trim).toSeq
          val n = graft.delta.Delta.syncChanges(cat, name, on)
          if (n == 0L) s"$name already in sync"
          else s"exported $n change rows to ${name}__changes"
        case "mv-refresh" =>
          val r = graft.delta.MatView.refresh(cat, arg(p, 0, "name"))
          s"refresh ${arg(p, 0, "name")}: ${r.mode} " +
            s"${r.from}->${r.to} dirty=${r.dirtyGroups} " +
            s"upserted=${r.upserted} deleted=${r.deleted}"
        case "locks" =>
          val ls = cat.commitLocks()
          if (ls.isEmpty) "no commit locks held"
          else ls.map { case (n, age) => f"$n%-40s ${age}ms" }.mkString("\n")
        case "break-lock" =>
          val name = arg(p, 0, "name")
          val force = p.flags.get("force").exists(_.equalsIgnoreCase("true"))
          if (cat.breakCommitLock(name, force)) s"broke lock on $name"
          else s"no lock on $name"
        case "namespaces" => cat.namespaces().mkString("\n")
        case "projects" =>
          cat.listProjects(p.positional.headOption)
            .map(pr => s"${pr.namespace}.${pr.name}" +
              (if (pr.descr.nonEmpty) s"  # ${pr.descr}" else ""))
            .mkString("\n")
        case other => return (2, s"unknown command: $other\n$usage")
      }
      (0, out)
    } catch {
      case e: IllegalArgumentException => (2, s"error: ${e.getMessage}")
      case e: NoSuchElementException => (1, s"error: ${e.getMessage}")
      // operational failures (e.g. break-lock hitting an unwritable
      // dir) report loudly instead of crashing the CLI process
      case e: IllegalStateException => (1, s"error: ${e.getMessage}")
    }

  private def arg(p: Parsed, i: Int, name: String): String = {
    require(p.positional.length > i, s"${p.cmd} needs <$name>")
    p.positional(i)
  }

  /** Plain-text table: header + up to 1000 rows (CLI output, not a data
    * path — exports go through `cp`/to_parquet). */
  private def render(df: DataFrame): String = {
    val cols = df.columns
    val rows = df.limit(1000).collect()
    (cols.mkString("\t") +: rows.map(_.toSeq.map {
      case null => ""
      case s: String => s
      case x => x.toString
    }.mkString("\t"))).mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (code, out) = run(args.toSeq, spark)
    println(out)
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
