package graft.catalog

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, count, count_distinct, lit, max, not, struct, sum, when}
import graft.core.{Chain, OpTree, Sys}
import graft.schema.SignalSchema

/**
 * Versioned dataset catalog — the Spark restatement of the reference's
 * metastore + warehouse split (reference: src/datachain/data_storage/
 * metastore.py, warehouse.py:353, dataset.py:187,361).
 *
 * Physical layout (one warehouse root, any Hadoop-compatible FS — local in
 * tests, S3A/HDFS on a cluster):
 *
 *   <root>/datasets/<name>/v<semver>/data/        parquet (partitioned)
 *   <root>/datasets/<name>/v<semver>/meta.json    schema JSON, lineage deps,
 *                                                 chain hash, created_at, job
 *
 * Version resolution: exact "1.2.3", or latest when omitted. Each version is
 * immutable once written (writes go to a fresh dir), so `readDataset` is a
 * plain parquet scan with full predicate/column pushdown and no table locks —
 * the same property Delta/Iceberg snapshots give, without a format dependency
 * (swap the layout for Delta on clusters that ship it).
 *
 * Checkpoints: `findCheckpoint(chainHash)` mirrors the reference's skip of
 * `save()` calls whose chain hash matches a prior job's checkpoint
 * (reference: src/datachain/lib/dc/datachain.py:696-723).
 *
 * Concurrency contract: single writer per dataset name (the same contract
 * the reference's metastore transactionality provides). Two racing saves
 * of one name may pick the same next version; the loser fails fast on the
 * immutability check rather than corrupting a version directory.
 */
final case class SemVer(major: Int, minor: Int, patch: Int) extends Ordered[SemVer] {
  override def toString = s"$major.$minor.$patch"
  def compare(o: SemVer): Int =
    Ordering[(Int, Int, Int)].compare((major, minor, patch), (o.major, o.minor, o.patch))
  def bumpMajor: SemVer = SemVer(major + 1, 0, 0)
  def bumpMinor: SemVer = SemVer(major, minor + 1, 0)
  def bumpPatch: SemVer = SemVer(major, minor, patch + 1)
}

object SemVer {
  def parse(s: String): SemVer = s.split('.') match {
    case Array(a, b, c) => SemVer(a.toInt, b.toInt, c.toInt)
    case _ => throw new IllegalArgumentException(s"bad semver: $s")
  }
}

final case class VersionMeta(
    name: String, version: String, chainHash: String,
    schemaJson: String, deps: Seq[String], createdAt: String, rows: Long,
    description: String = "", attrs: Seq[String] = Nil)

/**
 * A data-quality expectation enforced at save time — the Delta CHECK
 * constraint / Deequ-style gate a training-data pipeline puts in front of
 * every materialization. A row PASSES only when `predicate` is TRUE
 * (NULL counts as a violation — stricter than SQL CHECK's null-passes,
 * because a quality gate must prove the row good, not fail to prove it
 * bad). Modes:
 *  - `"fail"`: any violating row ABORTS the save before the version is
 *    claimed — the tmp-then-claim protocol makes the constraint
 *    transactional (nothing ever becomes visible), and violations are
 *    counted by the write's own Observation: zero extra scans.
 *  - `"drop"`: violating rows are filtered out of the saved version
 *    (plan-level filter in the same write pass); the dropped count is
 *    recorded as an `expect:` attr on the version.
 *  - `"quarantine"`: like drop, plus the violating rows are saved as a
 *    version of `<name>__quarantine` with an attr pointer from the main
 *    version — one extra pass over the source, the price of keeping the
 *    rejects auditable.
 */
final case class Expect(name: String,
                        predicate: org.apache.spark.sql.Column,
                        mode: String = "fail")

/** Thrown by [[Catalog.save]] when a fail-mode [[Expect]] has violating
  * rows; the version was NOT committed. */
final case class ExpectFailed(dataset: String, expectation: String,
                              violations: Long)
    extends RuntimeException(
      s"expectation '$expectation' failed on save of '$dataset': " +
        s"$violations violating rows; version not committed")

/** Outcome of a copy-on-write row mutation ([[Catalog.deleteWhere]] /
  * [[Catalog.updateWhere]] / [[Catalog.mergeInto]]): the new immutable
  * version plus the file-reuse evidence — `filesReused` files crossed to
  * the new version as hard links (metadata only, zero bytes copied) and
  * only `filesRewritten` files were written. */
final case class MutationResult(
    version: SemVer, filesRewritten: Int, filesReused: Int,
    rowsBefore: Long, rowsAfter: Long,
    rowsMatched: Long = 0L, rowsInserted: Long = 0L)

/** Optimistic-concurrency abort (Delta's ConcurrentWriteException): a
  * read-modify-write mutation found a DIFFERENT latest version at commit
  * time than the one it started from — committing anyway would silently
  * drop the other writer's changes from the new latest. Retryable: the
  * caller re-reads the table and re-applies its mutation. */
final class ConcurrentMutationException(msg: String)
    extends RuntimeException(msg)

/** A registered project inside a namespace (reference Project,
  * src/datachain/project.py:13-46). */
final case class Project(namespace: String, name: String,
                         descr: String, createdAt: String)

object Catalog {
  /** Reference Namespace.default / Project.default / Project.listing. */
  val DefaultNamespace = "local"
  val DefaultProject = "local"
  val ListingProject = "listing"

  /** `guardLatest` sentinel: the commit requires the dataset to have NO
    * committed version yet (v0.0.0 is never claimable — real versions
    * start at 1.0.0). The create half of a create-or-append decision. */
  val ExpectNoVersions: SemVer = SemVer(0, 0, 0)

  /** A commit lock whose mtime is older than this is presumed a crashed
    * holder's debris and may be stolen. LIVE holders heartbeat the
    * mtime at a quarter of this period while the commit body runs, so
    * only a truly dead (or wholly frozen) holder ages past it.
    * Tunable for tests via `-Dgraft.lock.staleMs=`. */
  private[catalog] def lockStaleMs: Long =
    sys.props.get("graft.lock.staleMs").map(_.toLong).getOrElse(60000L)

  /** Retirement grace: a vacuumed version's bytes are PRUNED only
    * after its tombstone has aged past this window (phase 2 of the
    * two-phase vacuum) — the retention discipline that makes the
    * liveness scan sound against commits racing the scan. Set it above
    * any plausible commit wall (Delta's retention-check rationale).
    * Tunable via `-Dgraft.vacuum.graceMs=` (tests use 0). */
  private[catalog] def vacuumGraceMs: Long =
    sys.props.get("graft.vacuum.graceMs").map(_.toLong)
      .getOrElse(24L * 3600 * 1000)

  /** String envelopes use the broadcast nested-loop probe up to this
    * many string-stat files; beyond, the binned equi-join arm runs
    * (tunable for tests via `-Dgraft.env.stringNestedLoopMax=`). */
  private[catalog] def stringNestedLoopMax: Int =
    sys.props.get("graft.env.stringNestedLoopMax").map(_.toInt)
      .getOrElse(1024)

  /** One data file of a version: `rel`ative path under the data dir of
    * the version that physically WROTE it. Owners are always resolved —
    * a manifest entry never points at another manifest (one hop from any
    * version to bytes, no chains to walk, no chain to break). */
  final case class ManifestEntry(ds: String, v: SemVer, rel: String)

  /** One idempotent file copy (REPLACE_EXISTING — a retried/speculative
    * task re-copies safely). Lives on the companion so the fanned
    * task closure serializes the module reference, never a Catalog. */
  private[catalog] def copyOne(s: String, d: String): Long = {
    val dst = java.nio.file.Paths.get(d)
    java.nio.file.Files.createDirectories(dst.getParent)
    java.nio.file.Files.copy(java.nio.file.Paths.get(s), dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.size(dst)
  }

  /** A version's file manifest: the complete data-file census with
    * physical owners, plus an optional pointer at the version whose
    * parquet-tier stats/blooms index dirs this version reuses verbatim
    * (restore/clone carry — the index keys are version-dir-relative file
    * names, identical for a zero-copy version). */
  private[graft] final case class Manifest(
      entries: Vector[ManifestEntry],
      indexFrom: Option[(String, SemVer)]) {
    lazy val relOwner: Map[String, (String, SemVer)] =
      entries.iterator.map(e => e.rel -> ((e.ds, e.v))).toMap
  }

  /** Retry loop for optimistic-concurrency aborts: re-runs `body` (which
    * must RE-RESOLVE the table — every mutation verb re-reads latest at
    * entry, so `retryOnConflict(3)(cat.deleteWhere(...))` just works)
    * until it commits or `attempts` conflicts pass through. */
  def retryOnConflict[T](attempts: Int = 3)(body: => T): T = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: ConcurrentMutationException =>
          left -= 1
          if (left <= 0) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

final class Catalog(val root: String, spark: SparkSession) {

  private def dsDir(name: String): Path = Paths.get(root, "datasets", name)
  private def vDir(name: String, v: SemVer): Path = dsDir(name).resolve(s"v$v")

  /** Eagerly listed directory entries with the stream CLOSED — an
    * abandoned Files.list stream leaks a directory fd until GC. A dir
    * that vanishes mid-list (racing delete) reads as empty, which every
    * caller treats conservatively. */
  private def listDir(d: Path): Seq[Path] =
    if (!Files.isDirectory(d)) Seq.empty
    else {
      try {
        val s = Files.list(d)
        try s.iterator.asScala.toSeq finally s.close()
      } catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          Seq.empty
      }
    }

  /** The hive partition columns encoded in a version-relative file name
    * — the leading key=value directory chain (empty for plain layouts).
    * Works off the MANIFEST rel, so a zero-copy version whose own data
    * dir is empty still reports its layout. */
  private def relPartitionCols(rel: String): Seq[String] =
    rel.split('/').toSeq.init.takeWhile(_.contains('='))
      .map(_.takeWhile(_ != '='))

  private def partitionColsOf(name: String, v: SemVer): Seq[String] =
    dataFilesOf(name, v).headOption
      .map(e => relPartitionCols(e.rel)).getOrElse(Seq.empty)

  // ---- version file manifests: zero-copy carry without hard links ----
  // A version whose commit REUSES ancestor files (cow mutations, append,
  // restore, clone, partial optimize/compaction) records a MANIFEST
  // beside its meta.json instead of materializing a linked file tree:
  // each entry names the version that physically owns the file, and
  // readers assemble the scan's file list across owner dirs. This is the
  // Delta-log / Iceberg-manifest mechanism: a commit writes only its
  // rewrite output plus O(files) metadata, is object-store-safe (no
  // link(), no degradation to a physical copy of the untouched 99%),
  // and vacuum tracks liveness per FILE — a kept version pins exactly
  // the ancestor files it references, never whole ancestor versions.
  // Plain saves and full optimize write self-contained trees and carry
  // no manifest; absence = "every file lives under this version's own
  // data/" (the pre-manifest layout), so existing catalogs read
  // unchanged.

  private def manifestPath(name: String, v: SemVer): Path =
    vDir(name, v).resolve("manifest.json")

  // manifest cache: versions are immutable once committed, so entries
  // only churn on vacuum/move (freshness-token checked like statsCache)
  private val manifestCacheMax = 64
  private val manifestCache =
    new java.util.LinkedHashMap[String, (String, Option[Catalog.Manifest])](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Option[Catalog.Manifest])])
          : Boolean = size() > manifestCacheMax
    }

  private[graft] def manifestOf(name: String, v: SemVer)
      : Option[Catalog.Manifest] = manifestCache.synchronized {
    val p = manifestPath(name, v)
    val key = s"$name@@$v"
    val tok = freshToken(p)
    val hit = manifestCache.get(key)
    if (hit != null && hit._1 == tok) hit._2
    else {
      val parsed =
        if (!Files.exists(p)) None
        else Some(parseManifest(name, v,
          new String(Files.readAllBytes(p), "UTF-8")))
      manifestCache.put(key, (tok, parsed))
      parsed
    }
  }

  /** Serialize with the version's OWN files as "." so the written bytes
    * never embed the version number they live under (claimVersion picks
    * it inside the commit lock). Line-oriented: escaped rel strings
    * contain no literal newline, so the `\n    ]}` group terminator is
    * unambiguous for the parser below (the stats.json idiom). */
  private def manifestJson(self: (String, SemVer),
                           m: Catalog.Manifest): String = {
    def ownerStr(o: (String, SemVer)) =
      if (o == self) "." else s"${o._1}@v${o._2}"
    val groups = m.entries.groupBy(e => (e.ds, e.v)).toSeq
      .sortBy { case (o, _) => ownerStr(o) }
      .map { case (o, es) =>
        val rels = es.map(_.rel).sorted
          .map(r => s"""      "${esc(r)}"""").mkString(",\n")
        s"""    {"d": "${esc(ownerStr(o))}", "r": [\n$rels\n    ]}"""
      }.mkString(",\n")
    val ix = m.indexFrom.map(o =>
      s"""  "indexFrom": "${esc(ownerStr(o))}",\n""").getOrElse("")
    s"{\n  \"version\": 1,\n$ix  \"owners\": [\n$groups\n  ]\n}"
  }

  private def parseManifest(name: String, v: SemVer,
                            s: String): Catalog.Manifest = {
    def ownerOf(x: String): (String, SemVer) =
      if (x == ".") (name, v)
      else {
        val i = x.lastIndexOf("@v")
        require(i > 0, s"manifest of $name@v$v: bad owner '$x'")
        (x.substring(0, i), SemVer.parse(x.substring(i + 2)))
      }
    val strRe = "\"((?:[^\"\\\\]|\\\\.)*)\"".r
    val ix = "\"indexFrom\": \"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(s).map(m => ownerOf(metaUnesc(m.group(1))))
    val ownerRe =
      ("\\{\"d\": \"((?:[^\"\\\\]|\\\\.)*)\", \"r\": \\[\\n" +
        "([\\s\\S]*?)\\n    \\]\\}").r
    val entries = ownerRe.findAllMatchIn(s).flatMap { m =>
      val (d, ov) = ownerOf(metaUnesc(m.group(1)))
      strRe.findAllMatchIn(m.group(2)).map(r =>
        Catalog.ManifestEntry(d, ov, metaUnesc(r.group(1))))
    }.toVector
    Catalog.Manifest(entries, ix)
  }

  /** Every data file of `name@v` as (physical owner, rel): the manifest
    * when present, else the version's own tree (self-contained layout). */
  private[graft] def dataFilesOf(name: String, v: SemVer)
      : Seq[Catalog.ManifestEntry] =
    manifestOf(name, v) match {
      case Some(m) => m.entries
      case None =>
        val dataDir = vDir(name, v).resolve("data")
        walkParquet(dataDir).map(f =>
          Catalog.ManifestEntry(name, v, dataDir.relativize(f).toString))
    }

  /** Absolute physical path of one version-relative data file — the
    * one-hop manifest resolution every path consumer goes through. */
  private[graft] def resolveDataFile(name: String, v: SemVer,
                                     rel: String): Path = {
    val (d, ov) = manifestOf(name, v).flatMap(_.relOwner.get(rel))
      .getOrElse((name, v))
    vDir(d, ov).resolve("data").resolve(rel)
  }

  /** Physical parquet-tier index dir (`stats` or `blooms`) of
    * `name@v`: its own when present, else the manifest's indexFrom
    * target (restore/clone reuse the source's index verbatim — same
    * version-relative keys). */
  private def idxDirOf(name: String, v: SemVer, which: String): Path = {
    val own = vDir(name, v).resolve(which)
    if (Files.isDirectory(own)) own
    else manifestOf(name, v).flatMap(_.indexFrom) match {
      case Some((d, ov)) => vDir(d, ov).resolve(which)
      case None => own
    }
  }

  private def statsDirOf(name: String, v: SemVer): Path =
    idxDirOf(name, v, "stats")

  private def bloomsDirOf(name: String, v: SemVer): Path =
    idxDirOf(name, v, "blooms")

  /** Recursive parquet-file census of a data dir (partitioned versions
    * nest files under key=value subdirs). */
  private def walkParquet(d: Path): Seq[Path] =
    if (!Files.isDirectory(d)) Seq.empty
    else {
      try {
        val w = Files.walk(d)
        try w.iterator.asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        finally w.close()
      } catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          Seq.empty
      }
    }

  /** Every regular file under `d` (any extension — meta, index, data),
    * stream closed, racing-delete-safe: the export/import/flatten tree
    * walks share this. */
  private def walkFiles(d: Path): Seq[Path] =
    if (!Files.isDirectory(d)) Seq.empty
    else {
      try {
        val w = Files.walk(d)
        try w.iterator.asScala.filter(Files.isRegularFile(_)).toSeq
        finally w.close()
      } catch {
        case _: java.io.IOException | _: java.io.UncheckedIOException =>
          Seq.empty
      }
    }

  def datasets(): Seq[String] = {
    val d = Paths.get(root, "datasets")
    listDir(d).filter(Files.isDirectory(_))
      .map(_.getFileName.toString).sorted
  }

  /** Datasets currently carrying a commit-lock file → lock age millis
    * (operator observability; a healthy lock lives milliseconds). */
  def commitLocks(): Seq[(String, Long)] =
    datasets().flatMap { n =>
      val p = dsDir(n).resolve(".commit.lock")
      if (!Files.exists(p)) None
      else
        try Some(n -> (System.currentTimeMillis() -
          Files.getLastModifiedTime(p).toMillis))
        catch { case _: java.io.IOException => None }
    }

  /** Operator verb: remove a dataset's commit-lock file (a crashed
    * holder's debris). Refuses a FRESH lock — that's a live commit —
    * unless `force`; mirrors the 60 s stale rule writers apply
    * themselves, so this verb is for impatient humans and monitoring,
    * not correctness. Returns TRUE when a lock was removed. */
  def breakCommitLock(name: String, force: Boolean = false): Boolean = {
    val p = dsDir(name).resolve(".commit.lock")
    if (!Files.exists(p)) return false
    val age =
      try System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis
      catch {
        case _: java.nio.file.NoSuchFileException => return false // raced away
        case e: java.io.IOException => throw new IllegalStateException(
          s"cannot stat lock on '$name': ${e.getMessage}", e)
      }
    require(force || age > Catalog.lockStaleMs,
      s"lock on '$name' is ${age}ms old — likely a LIVE commit " +
        "(healthy locks clear in milliseconds); pass force to override")
    // steal via the same ATOMIC_MOVE-to-grave pattern writers use: a
    // plain delete could race a writer that just stale-broke this lock
    // and re-created its own — deleting THAT admits two writers to the
    // critical section (the exact lost update the lock prevents)
    val grave = p.resolveSibling(
      s".commit.lock.stale-${java.util.UUID.randomUUID}")
    try {
      Files.move(p, grave, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      Files.deleteIfExists(grave)
      true
    } catch {
      case _: java.nio.file.NoSuchFileException => false // someone else won
      case e: java.io.IOException => throw new IllegalStateException(
        s"failed to break lock on '$name': ${e.getMessage}", e)
    }
  }

  /** Atomically claim a version dir of `name` — the next bump, or the
    * explicit one (which fails on collision instead of re-bumping). At
    * most one winner per version on any POSIX/HDFS-semantics store; an
    * auto-bump loser re-reads the raw listing (claimed dirs count even
    * before their meta commits) and retries with the next bump. The ONE
    * commit-protocol implementation: save, cowRewrite, and linkVersion
    * all claim through here. */
  /**
   * Serializes the metadata COMMIT step (claim → move → meta write) of
   * every version writer of `name`, cross-process via an atomic lock
   * file. The lock is held only across metadata ops (milliseconds —
   * never across a Spark job), so contention is negligible; a holder
   * that crashed mid-commit is broken after 60 s (its claimed version
   * dir stays dead, the number is never reused). Combined with a
   * latest-version check inside the lock this gives the lake layer
   * OPTIMISTIC CONCURRENCY: two read-modify-write mutations racing from
   * the same base can't both commit — the loser aborts with
   * [[ConcurrentMutationException]] instead of silently dropping the
   * winner's rows from the new latest (the classic lost update).
   */
  // tokens of locks THIS thread currently holds (body runs inline, so
  // thread identity is lock identity) — what [[commitFence]] checks
  // against the on-disk lock immediately before a meta.json commit
  private val heldTokens =
    new ThreadLocal[scala.collection.mutable.Map[String, String]] {
      override def initialValue() =
        scala.collection.mutable.Map.empty[String, String]
    }

  /** The COMMIT FENCE closing the frozen-holder lease gap: a holder
    * frozen whole past the stale period (GC pause, VM freeze) can have
    * its lock stolen and a rival commit land; when it wakes, writing
    * meta.json would interleave the two commits. Version writers call
    * this immediately before the meta.json write — if the on-disk lock
    * no longer carries our token, the commit ABORTS as a retryable
    * [[ConcurrentMutationException]] with no metadata written (the
    * claimed dir stays an invisible orphan of the tolerated debris
    * class). Residual: a freeze landing between this read and the
    * write is still exposed — the gap shrinks from body-length to one
    * read-to-write instant. */
  private def commitFence(name: String): Unit =
    heldTokens.get.get(name).foreach { token =>
      val lockP = dsDir(name).resolve(".commit.lock")
      val owned =
        try new String(Files.readAllBytes(lockP), "UTF-8") == token
        catch { case _: java.io.IOException => false }
      if (!owned)
        throw new ConcurrentMutationException(
          s"dataset '$name': commit lock was stolen mid-commit (holder " +
            "frozen past the stale period); nothing was committed — " +
            "re-read the table and retry")
    }

  private def withCommitLock[T](name: String)(body: => T): T = {
    val lockP = dsDir(name).resolve(".commit.lock")
    Files.createDirectories(lockP.getParent)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    // OWNED lock: the holder's token rides in the file, so release only
    // removes a lock we still hold (a breaker that stole it can't have
    // ITS fresh lock deleted by our finally), and stale breaking is an
    // ATOMIC_MOVE to a unique grave — of N waiters that judge the same
    // lock stale, exactly one wins the rename; the losers just re-loop.
    // A plain delete-then-retry would let waiter B delete the lock
    // waiter A just re-created, putting two writers in the critical
    // section — the exact lost update this lock exists to prevent.
    val token = java.util.UUID.randomUUID.toString
    var held = false
    while (!held) {
      try {
        Files.createFile(lockP)
        Files.write(lockP, token.getBytes("UTF-8"))
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale =
            try Files.getLastModifiedTime(lockP).toMillis <
              System.currentTimeMillis() - Catalog.lockStaleMs
            catch { case _: java.io.IOException => false } // vanished: retry
          if (stale) {
            val grave = lockP.resolveSibling(
              s".commit.lock.stale-${java.util.UUID.randomUUID}")
            try {
              Files.move(lockP, grave,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              Files.deleteIfExists(grave)
            } catch { case _: java.io.IOException => () } // lost the steal
          }
          else if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"commit-lock timeout for dataset '$name'")
          else Thread.sleep(10)
        case _: java.nio.file.NoSuchFileException =>
          // the dataset dir vanished mid-wait (a concurrent moveDataset
          // or delete won its lock and took the directory) — surface as
          // the retryable conflict it is, not a raw filesystem error
          throw new ConcurrentMutationException(
            s"dataset '$name' was moved or deleted while waiting to " +
              "commit; re-resolve the table and retry")
      }
    }
    // lease heartbeat: a legitimately slow commit body (cold NFS,
    // object-store metadata latency) must not age past the stale
    // threshold mid-critical-section and get stolen — refresh the lock
    // mtime at a quarter of the stale period while the body runs. A
    // crashed holder stops beating and ages out exactly as before. (A
    // holder frozen WHOLE — a GC pause longer than the stale period —
    // can still be stolen; the owner-token release below then leaves
    // the thief's fresh lock alone, and [[commitFence]] turns the
    // woken holder's would-be interleaved commit into a retryable
    // abort at the meta.json write.)
    val beat = new Thread(() => {
      val period = math.max(Catalog.lockStaleMs / 4, 5L)
      try {
        var mine = true
        while (mine && !Thread.interrupted()) {
          Thread.sleep(period)
          // refresh only while the token is still ours: after a steal
          // (the frozen-holder gap) the lock belongs to someone else —
          // blindly touching it would keep a since-CRASHED thief's lock
          // perpetually fresh and wedge every later writer. (The
          // read-then-touch pair is not atomic: one touch can land just
          // after a steal — bounded at ONE extra stale period, since
          // the next beat reads the foreign token and stops.)
          try {
            mine = new String(Files.readAllBytes(lockP), "UTF-8") == token
            if (mine) Files.setLastModifiedTime(lockP,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
          } catch { case _: java.io.IOException => () } // transient: retry
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-$name")
    beat.setDaemon(true)
    beat.start()
    heldTokens.get.put(name, token)
    try body
    finally {
      heldTokens.get.remove(name)
      beat.interrupt()
      // ATOMIC disposal: a read-then-delete pair would let a holder
      // waking from a long freeze delete a THIEF's fresh lock (steal
      // lands between the read and the delete). Move the lock into an
      // owned grave first — of N racers exactly one wins the rename —
      // THEN check whose token it carries: ours is deleted, a foreign
      // one is put straight back. (If the put-back target got occupied
      // in the interim the foreign grave is dropped — the residual
      // multi-steal window of advisory file locking, now needing THREE
      // interleaved racers inside one rename instead of two.)
      try {
        val grave = lockP.resolveSibling(s".commit.lock.rel-$token")
        try {
          Files.move(lockP, grave,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          val mine =
            try new String(Files.readAllBytes(grave), "UTF-8") == token
            catch { case _: java.io.IOException => false }
          if (mine) Files.deleteIfExists(grave)
          else {
            try Files.move(grave, lockP,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            catch { case _: java.io.IOException =>
              Files.deleteIfExists(grave)
            }
          }
        } catch {
          case _: java.nio.file.NoSuchFileException => () // already stolen
        }
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Test seam: run `body` under `name`'s commit lock (the production
    * [[withCommitLock]], heartbeat included) — lets specs pin the
    * slow-holder lease behavior without a public slow verb. */
  private[graft] def withCommitLockForTest[T](name: String)(body: => T): T =
    withCommitLock(name)(body)

  /** Test seam for the pre-meta commit fence — exactly what every
    * version writer calls before its meta.json write. */
  private[graft] def commitFenceForTest(name: String): Unit =
    commitFence(name)

  /** Inside the commit lock: the latest committed version must still be
    * the one this writer's read-modify-write started from.
    * [[Catalog.ExpectNoVersions]] (v0.0.0 — never claimable, real
    * versions start at 1.0.0) expects the dataset to have NO committed
    * version yet: the create-or-append decision of streaming sinks is a
    * read-modify-write too, and an unguarded first save would overwrite
    * a concurrently landed table. */
  private def guardLatestIs(name: String, expected: Option[SemVer]): Unit =
    expected.foreach { e =>
      val cur = versions(name).lastOption
      val ok =
        if (e == Catalog.ExpectNoVersions) cur.isEmpty else cur.contains(e)
      if (!ok)
        throw new ConcurrentMutationException(
          s"dataset '$name': expected " +
            (if (e == Catalog.ExpectNoVersions) "no committed version"
             else s"latest v$e") +
            s" at commit but found " +
            s"${cur.map("v" + _).getOrElse("none")} — a concurrent " +
            "writer committed first; re-read the table and retry")
    }

  private def claimVersion(name: String, explicit: Option[SemVer])
      : (SemVer, Path) = {
    // real versions start at 1.0.0: v0.0.0 is the ExpectNoVersions
    // guard sentinel and must stay unclaimable, or guardLatest=0.0.0
    // would be ambiguous between "expect none" and a real version
    require(explicit.forall(_ >= SemVer(1, 0, 0)),
      s"explicit versions start at 1.0.0 (got v${explicit.get})")
    var v = explicit.getOrElse(rawVersions(name).lastOption
      .map(_.bumpMinor).getOrElse(SemVer(1, 0, 0)))
    var dir: Path = null
    while (dir == null) {
      val cand = vDir(name, v)
      try { Files.createDirectory(cand); dir = cand }
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        require(explicit.isEmpty,
          s"version $name@v$v already exists (immutable)")
        v = rawVersions(name).lastOption.map(_.bumpMinor)
          .getOrElse(v.bumpMinor)
      }
    }
    (v, dir)
  }

  /** Recursive delete of a tmp tree (no-op when absent) — the shared
    * abort-path cleanup of every version writer. */
  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.delete)

  /** All claimed version dirs, complete or not — the writer's view. */
  private def rawVersions(name: String): Seq[SemVer] =
    listDir(dsDir(name))
      .map(_.getFileName.toString).filter(_.startsWith("v"))
      .map(s => SemVer.parse(s.drop(1))).sorted

  /** Reader-visible versions: only COMPLETE ones (meta.json committed).
    * A concurrently claimed-but-unfinished version dir stays invisible,
    * so readers never resolve "latest" to a half-written snapshot. */
  def versions(name: String): Seq[SemVer] =
    rawVersions(name).filter(v =>
      Files.exists(vDir(name, v).resolve("meta.json")))

  def latestVersion(name: String): Option[SemVer] = versions(name).lastOption

  /**
   * Materialize a chain as a new dataset version (reference `save`,
   * src/datachain/lib/dc/datachain.py:602-672). Stamps sys columns, writes
   * parquet, records schema + lineage. Returns the written version.
   */
  /** Dataset names are dot-path identifiers — never filesystem paths. */
  private def requireValidName(name: String): Unit =
    require(name.nonEmpty && !name.contains('/') && !name.contains('\\') &&
      // brackets would corrupt the attrs metadata parse (dataset names
      // are embedded in expect:quarantine=... attrs); '=' would make
      // the dataset DIRECTORY parse as a hive partition under any read
      // whose basePath sits above it
      !name.contains('[') && !name.contains(']') && !name.contains('=') &&
      name != "." && name != ".." && !name.startsWith("."),
      s"invalid dataset name: '$name'")

  /** `partitionBy`: write the version hive-partitioned on these columns —
    * reads via [[readDataset]]/[[readDatasetWhere]] recover the partition
    * columns and Spark prunes partition DIRECTORIES on matching
    * predicates before the file-level stats/bloom skip even runs (the
    * two levers compose: directory pruning on the layout keys, footer
    * skipping on everything else). */
  def save(chain: Chain, name: String, version: Option[SemVer] = None,
           deps: Seq[String] = Seq.empty, bloomCols: Seq[String] = Nil,
           bloomExpected: Long = 100000L, harvestStats: Boolean = true,
           partitionBy: Seq[String] = Nil, description: String = "",
           attrs: Seq[String] = Nil, expect: Seq[Expect] = Nil,
           unique: Seq[String] = Nil,
           guardLatest: Option[SemVer] = None)
      : SemVer = {
    requireValidName(name)
    attrs.foreach(a => require(!a.contains(']') && !a.contains('['),
      s"attr may not contain brackets: '$a'"))
    expect.foreach(e => require(Set("fail", "drop", "quarantine")(e.mode),
      s"unknown expectation mode '${e.mode}' (fail|drop|quarantine)"))
    require(expect.map(_.name).distinct.size == expect.size,
      "expectation names must be unique")
    // expectation names land in the bracket-delimited attrs metadata —
    // the same injection surface the user-attr validation guards
    expect.foreach(e => require(e.name.matches("[A-Za-z0-9_.:-]+"),
      s"expectation name must be [A-Za-z0-9_.:-]+, got '${e.name}'"))
    // fail fast on an explicitly requested version that already exists —
    // before paying for the write
    version.foreach(v => require(!Files.exists(vDir(name, v)),
      s"version $name@v$v already exists (immutable)"))
    // Concurrent-writer protocol: the data lands in a private temp dir
    // first, then the version is CLAIMED by an atomic createDirectory of
    // the version dir (at most one winner per version on any POSIX/HDFS-
    // semantics store) and the data renamed in. A racing auto-bump saver
    // that loses the claim re-reads the latest version and retries with
    // the next bump — both writers succeed with distinct versions and no
    // torn directory, matching the reference metastore's transactional
    // version bump.
    val tmp = dsDir(name).resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.createDirectories(tmp)
    try {
      // Row count rides along the write via Observation — no second scan
      // of the written data (at 100 TB a read-back count doubles the save
      // cost). Expectation violation counts stack on the same pass:
      // drop/quarantine counts observe BELOW the filter, fail counts on
      // the kept rows.
      val base = chain.toDF
      val dropModes = expect.filter(e =>
        e.mode == "drop" || e.mode == "quarantine")
      val failModes = expect.filter(_.mode == "fail")
      val preObs = org.apache.spark.sql.Observation()
      val preMetrics = dropModes.map(e =>
        count(when(!coalesce(e.predicate, lit(false)), 1))
          .as(s"viol_${e.name}"))
      val observed0 =
        if (preMetrics.nonEmpty)
          base.observe(preObs, preMetrics.head, preMetrics.tail: _*)
        else base
      val keptDf = dropModes.map(e => coalesce(e.predicate, lit(false)))
        .reduceOption(_ && _).map(observed0.filter).getOrElse(observed0)
      val obs = org.apache.spark.sql.Observation()
      val failMetrics = failModes.map(e =>
        count(when(!coalesce(e.predicate, lit(false)), 1))
          .as(s"viol_${e.name}"))
      val stamped = Sys.stamp(keptDf)
        .observe(obs, count(lit(1)).as("rows"), failMetrics: _*)
      val writer = stamped.write.mode("errorifexists")
      withJobDesc(s"catalog.save $name: data write") {
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*)
         else writer).parquet(tmp.resolve("data").toString)
      }
      val rows = obs.get("rows").asInstanceOf[Long]
      // fail-mode expectations: abort BEFORE the claim — the version is
      // never visible (tmp dir removed by the finally), the transactional
      // CHECK-constraint property
      failModes.foreach { e =>
        val viol = obs.get(s"viol_${e.name}").asInstanceOf[Long]
        if (viol > 0) throw ExpectFailed(name, e.name, viol)
      }
      if (unique.nonEmpty) {
        // PRIMARY KEY constraint, checked after the write and BEFORE the
        // claim (transactional). CollectMetrics forbids DISTINCT
        // aggregates, so this is one honest key-column-pruned scan of
        // the just-written files — O(rows of the key columns), never a
        // rescan of the payload. Explicit schema = the frame just
        // written: a partitioned save's string key values "01" and "1"
        // must NOT collapse to one int under partition-type inference (a
        // spurious PK abort), and reading with the writer's own schema
        // sidesteps inference without touching session conf.
        val nd = spark.read.schema(stamped.schema)
          .parquet(tmp.resolve("data").toString)
          .agg(count_distinct(struct(unique.map(col): _*))).head().getLong(0)
        if (nd != rows)
          throw ExpectFailed(name, s"unique(${unique.mkString(",")})",
            rows - nd)
      }
      val dropViol: Map[String, Long] = dropModes.map(e =>
        e.name -> preObs.get(s"viol_${e.name}").asInstanceOf[Long]).toMap
      // quarantine: rejects land as their own auditable dataset version
      // (one extra pass over the source — skipped entirely when clean)
      val quarModes = expect.filter(_.mode == "quarantine")
      val quarAttrs: Seq[String] =
        if (quarModes.forall(e => dropViol(e.name) == 0L)) Seq.empty
        else {
          val qc = quarModes.map(e => !coalesce(e.predicate, lit(false)))
            .reduce(_ || _)
          val qv = save(Chain(Sys.drop(base.filter(qc))),
            s"${name}__quarantine", harvestStats = false)
          Seq(s"expect:quarantine=${name}__quarantine@v$qv")
        }
      val expectAttrs: Seq[String] =
        failModes.map(e => s"expect:${e.name}=pass") ++
        dropModes.map(e => s"expect:${e.name}=dropped:${dropViol(e.name)}") ++
        quarAttrs
      // Footer-stats harvest for data skipping: per-file column min/max
      // from parquet footers only (metadata reads fanned out on
      // executors, never a rescan). Computed on the temp dir so the claim
      // section below stays metadata-fast.
      // harvestStats=false: internal bookkeeping datasets (delta source
      // snapshots, listing caches) are read whole, never predicate-pruned
      // — their saves skip the footer pass entirely
      // Tier split (the blooms/ precedent): up to graft.stats
      // .inlineMaxFiles the harvest collects to the driver and lands in
      // stats.json (one tiny metadata read per pruned read); past it the
      // index is written by the EXECUTORS as a parquet table under
      // stats/ — the driver never materializes a FileStat (at millions
      // of files the inline form is a driver-memory/parse bottleneck).
      val statsInlineMax =
        spark.conf.get("graft.stats.inlineMaxFiles", "512").toInt
      // one listing feeds the tier split AND the footer harvest below
      val dataFileList = walkParquet(tmp.resolve("data")).map(_.toString)
      val nDataFiles = dataFileList.size
      val statsTiered = harvestStats && nDataFiles > statsInlineMax
      val stats =
        if (!harvestStats || statsTiered) Seq.empty[FileStats.FileStat]
        else try withJobDesc(s"catalog.save $name: stats harvest") {
          FileStats.harvest(spark, tmp.resolve("data").toString,
            Some(dataFileList))
        }
        catch { case scala.util.control.NonFatal(_) =>
          // stats are an optimization: a harvest failure must never fail
          // the save (readers fall back to scanning every file)
          Seq.empty[FileStats.FileStat]
        }
      if (statsTiered)
        try FileStats.writeStatsIndex(spark, tmp.resolve("data").toString,
          tmp.resolve("stats").toString, Some(dataFileList))
        catch { case scala.util.control.NonFatal(_) =>
          // all-or-nothing: a partial index would make pruned reads skip
          // the uncovered files — drop it and fall back to no stats
          deleteTree(tmp.resolve("stats"))
        }
      // Opt-in per-file bloom index: equality pruning on columns whose
      // per-file min/max ranges overlap (min/max can't skip there). ONE
      // extra pass over the written data, grouped by file — a cost the
      // caller chose for its hottest point-lookup columns.
      // Small versions inline the bitmaps into blooms.json (one tiny
      // metadata read); past the threshold the index is written by the
      // EXECUTORS as a parquet table under blooms/ — the driver never
      // holds a bitmap (100k files × ~100 KB would be ~10 GB of heap).
      val inlineMax = spark.conf.get("graft.bloom.inlineMaxFiles", "32").toInt
      val blooms: Map[String, Map[String, Array[Byte]]] =
        if (bloomCols.isEmpty) Map.empty
        else {
          val nFiles = nDataFiles
          if (nFiles > inlineMax) {
            FileStats.writeBloomIndex(spark, tmp.resolve("data").toString,
              bloomCols, bloomExpected, tmp.resolve("blooms").toString,
              schema = Some(stamped.schema))
            Map.empty
          } else withJobDesc(s"catalog.save $name: bloom index") {
            FileStats.buildBlooms(spark, tmp.resolve("data").toString,
              bloomCols, bloomExpected, schema = Some(stamped.schema))
          }
        }
      withCommitLock(name) {
        // plain saves are overwrite-semantics (no guard by default:
        // racing savers both land, distinct versions); maintenance
        // passes that commit THROUGH save (optimize) guard their base
        guardLatestIs(name, guardLatest)
        val (v, dir) = claimVersion(name, version)
        Files.move(tmp.resolve("data"), dir.resolve("data"))
        if (Files.isDirectory(tmp.resolve("blooms")))
          Files.move(tmp.resolve("blooms"), dir.resolve("blooms"))
        if (Files.isDirectory(tmp.resolve("stats")))
          Files.move(tmp.resolve("stats"), dir.resolve("stats"))
        val meta = metaJson(VersionMeta(
          name, v.toString, chain.hash, SignalSchema.toJson(chain.schema),
          deps, java.time.Instant.now.toString, rows, description,
          attrs ++ expectAttrs))
        commitFence(name)
        Files.write(dir.resolve("meta.json"), meta.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        if (stats.nonEmpty)
          Files.write(dir.resolve("stats.json"),
            FileStats.toJson(stats).getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        if (blooms.nonEmpty)
          Files.write(dir.resolve("blooms.json"),
            FileStats.bloomsToJson(blooms).getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        appendCheckpointIndex(chain.hash, name, v)
        v
      }
    } finally {
      deleteTree(tmp)
    }
  }

  /**
   * Maintenance pass (the Delta `OPTIMIZE [ZORDER BY]` story, composed
   * from this catalog's own parts): rewrite the latest version of `name`
   * as a NEW immutable version whose layout serves reads better —
   * optionally Z-order-clustered on two columns (quantile-bucketed, so
   * per-file footer envelopes are narrow on BOTH dimensions), re-bloomed
   * on `bloomCols`, with fresh per-file stats harvested by the save
   * itself. USER columns are identical row-for-row (sys re-stamps like
   * any materialization — per-version reproducibility is sys's contract);
   * the new version records a lineage dep on the one it rewrote, so
   * vacuum's closure keeps the provenance.
   * Returns (newVersion, filesBefore, filesAfter).
   */
  def optimize(name: String, nFiles: Int = 32,
               zorderBy: Option[(String, String)] = None,
               bloomCols: Seq[String] = Nil,
               bloomExpected: Long = 100000L,
               partitionBy: Seq[String] = Nil,
               zorderByCols: Seq[String] = Nil,
               curve: String = "zorder"): (SemVer, Int, Int) = {
    require(curve == "zorder" || curve == "hilbert",
      s"optimize curve must be zorder|hilbert, got $curve")
    val v = latestVersion(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val files = dataFilesOf(name, v)
    val before = files.size
    // partitioned versions: the rewrite reads partition columns back as
    // plain data columns (at their RECORDED types); unless the caller
    // overrides, the detected layout is re-applied so OPTIMIZE preserves
    // partitioning by default (file counts then follow partitions ×
    // coalesce, not nFiles alone)
    val layout =
      if (partitionBy.nonEmpty) partitionBy
      else partitionColsOf(name, v)
    val df0 = readVersionData(name, v)
    // 2-col tuple or the N-col list — same quantile z-curve either way
    val zcols = zorderBy.map(t => Seq(t._1, t._2)).getOrElse(zorderByCols)
    def commit(laid: DataFrame): SemVer =
      save(Chain(graft.core.Sys.drop(laid)), name,
        deps = Seq(s"$name@v$v"), bloomCols = bloomCols,
        bloomExpected = bloomExpected, partitionBy = layout,
        guardLatest = Some(v))
    val nv =
      if (zcols.nonEmpty) {
        // curve = "hilbert" swaps the Morton interleave for the
        // locality-maximal Hilbert key (grid-adjacent consecutive
        // positions — tighter per-file envelopes on mid-cell range
        // splits); everything else (quantile bins, cell-aligned range
        // partitioning via Layout.cellAligned, version/lineage
        // mechanics) is identical.
        val bits = graft.io.Layout.curveBits(8, zcols.size)
        val (frame, vcol) =
          if (curve == "hilbert")
            (graft.io.Layout.hilbertFrameQuantileN(df0, zcols, bits), "hval")
          else
            (graft.io.Layout.zorderFrameQuantileN(df0, zcols, bits), "zval")
        commit(graft.io.Layout.cellAligned(frame, vcol,
          bits * zcols.size, nFiles))
      } else {
        // size-aware bin-packing (Layout.compactTo's approach): size the
        // SCAN partitions to ~total/nFiles so coalesce merges even-byte
        // chunks. Plain coalesce over the default 128 MB packing folds
        // every small file into one read task and writes one giant
        // output beside empties when inputs are skewed. The packing
        // targets live on a CLONED session (shared SparkContext, own
        // SQLConf) whose catalog twin re-derives the scan — no JVM-wide
        // lock held across the rewrite job, and concurrent reads on the
        // base session never see the flip.
        val total = files.map(e =>
          Files.size(vDir(e.ds, e.v).resolve("data").resolve(e.rel))).sum
        val target = math.max(64L << 10,
          math.ceil(total.toDouble / math.max(1, nFiles)).toLong)
        commit(packedSession(target).readVersionData(name, v)
          .coalesce(nFiles))
      }
    val after = dataFilesOf(name, nv).size
    (nv, before, after)
  }

  // ---- row-level mutations: copy-on-write DELETE / UPDATE / MERGE ----
  // The Delta/Iceberg row-mutation story on this catalog's immutable
  // snapshots (reference datasets are append/version-only; row mutation
  // is the lake-parity surface a training-data curator actually needs —
  // GDPR deletes, label fixes, upserts from a curation UI). Mechanism:
  // the stats/bloom index picks the files that MAY contain affected rows;
  // only those are rewritten, every other file crosses to the new version
  // BY REFERENCE in its manifest — a metadata-only commit that writes
  // zero carried bytes on any store (the Delta-log/Iceberg mechanism;
  // vacuum's per-file refcount keeps referenced ancestors' bytes alive
  // while either version can still be retired independently).

  /** Relative files of `name@v` that MAY contain a row matching `pred`
    * (footer-stats + bloom pruning; conservative: stats-less versions,
    * files missing from stats, and unsupported predicate shapes all count
    * as touched), beside the full relative file census. */
  private def touchedFiles(name: String, v: SemVer,
                           pred: org.apache.spark.sql.Column)
      : (Seq[String], Seq[String]) = {
    val all = dataFilesOf(name, v).map(_.rel)
    val cond = resolvedCondition(readVersionData(name, v).filter(pred))
    val touched = cond match {
      case Some(pe) if statsTierIsParquet(name, v) && distributedPruneOn =>
        keptFilesParquetTier(name, v, pe) match {
          // only safe to narrow when the census covers every file —
          // otherwise uncovered files must count as touched, and their
          // identity is unknowable from the kept list alone
          case Some((kept, total)) if total == all.size.toLong =>
            val keptSet = kept.toSet
            all.filter(keptSet)
          case _ => all
        }
      case Some(pe) =>
        val refs = pe.references.map(_.name).toSeq
        val stats = try fileStatsFor(name, v, Some(refs))
          catch { case scala.util.control.NonFatal(_) =>
            Seq.empty[FileStats.FileStat] }
        if (stats.isEmpty) all
        else {
          val byFile = stats.map(s => s.file -> s).toMap
          val blooms = fileBlooms(name, v, Some(refs))
          all.filter { rel =>
            byFile.get(rel) match {
              case Some(fs) =>
                FileStats.mayMatch(pe, fs, blooms.getOrElse(rel, Map.empty))
              case None => true
            }
          }
        }
      case _ => all
    }
    (touched, all)
  }

  /** Version-relative parquet names of `name@v` with on-disk sizes —
    * the carried-file detector for file-level version diffs: cow
    * mutations carry untouched files under the SAME relative name via
    * the manifest (and fresh saves never reuse a name), so same-name
    * same-size files across two versions are byte-identical (with
    * manifests on both sides they are the same physical file). */
  private[graft] def versionDataFiles(name: String, v: SemVer)
      : Map[String, Long] =
    manifestOf(name, v) match {
      case Some(m) => m.entries.iterator.map { e =>
        e.rel -> Files.size(
          vDir(e.ds, e.v).resolve("data").resolve(e.rel))
      }.toMap
      case None =>
        val dataDir = vDir(name, v).resolve("data")
        walkParquet(dataDir).map { p =>
          dataDir.relativize(p).toString -> Files.size(p)
        }.toMap
    }

  /** Read only the named version-relative files of `name@v`
    * (explicit-schema rules applied; empty = empty frame with the
    * version's schema). */
  private[graft] def readVersionSlice(name: String, v: SemVer,
                                      files: Seq[String]): DataFrame =
    readVersionFiles(name, v, files)

  /** Read exactly `files` (relative) of `name@v` with the version's
    * recorded types restored; empty `files` reads nothing (a zero-row
    * frame with the version's schema). Manifest versions group the
    * files by PHYSICAL owner and union the per-owner scans — each scan
    * keeps its owner's data dir as basePath, so hive partition columns
    * parse off the shared rel layout exactly as a self-contained read
    * (owner count = mutation-chain depth, small by construction). */
  private def readVersionFiles(name: String, v: SemVer,
                               files: Seq[String]): DataFrame =
    manifestOf(name, v) match {
      case Some(m) =>
        val full = fullReadSchema(name, v).getOrElse(
          throw new IllegalStateException(
            s"manifest version $name@v$v lacks a recorded schema"))
        if (files.isEmpty)
          // the version's OWN data dir may hold rewrite files — an empty
          // slice must not read them; a zero-row local frame with the
          // recorded schema preserves the contract
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            full)
        else if (files.headOption.forall(relPartitionCols(_).isEmpty) &&
            !name.contains('=') &&
            m.entries.forall(e => !e.ds.contains('='))) {
          // UNPARTITIONED layout: partition columns don't exist, so
          // per-owner basePaths buy nothing — read every resolved path
          // as ONE relation (basePath = the warehouse root, a common
          // prefix with no key=value segments). A mutation chain of any
          // depth then plans exactly one scan node; without this, a
          // table cow-mutated daily for a year reads as a ~365-way
          // union of per-owner scans. Legacy dataset names containing
          // '=' (new ones are rejected) would hive-parse under the
          // root basePath, so they keep the per-owner arm.
          val paths = files.map { r =>
            val (d, ov) = m.relOwner.getOrElse(r, (name, v))
            s"${vDir(d, ov).resolve("data")}/$r"
          }
          readWithSchema(Paths.get(root).toString, paths, full)
        } else {
          // hive-partitioned: partition VALUES derive from each file's
          // path relative to its owner's data dir, so the scans stay
          // per-owner (owner count = mutation-chain depth — bounded by
          // flattenVersion / graft.manifest.maxOwners)
          val byOwner = files
            .map(r => m.relOwner.getOrElse(r, (name, v)) -> r)
            .groupBy(_._1).toSeq
            .sortBy { case ((d, ov), _) => s"$d@v$ov" }
          byOwner.map { case ((d, ov), rs) =>
            val dd = vDir(d, ov).resolve("data").toString
            readWithSchema(dd, rs.map(p => s"$dd/${p._2}"), full)
          }.reduce(_.unionByName(_))
        }
      case None =>
        val dataDir = vDir(name, v).resolve("data").toString
        if (files.isEmpty) readVersionData(name, v).limit(0)
        else fullReadSchema(name, v) match {
          case Some(full) =>
            readWithSchema(dataDir, files.map(r => s"$dataDir/$r"), full)
          case None => restoreTypes(
            readNoInfer(dataDir, files.map(r => s"$dataDir/$r")), name, v)
        }
    }

  /**
   * Copy-on-write rewrite engine shared by the three mutations: replace
   * `touched` files of `name@v` with the rows of `rewritten` (None = no
   * replacement rows at all), hard-link everything else, commit as a new
   * immutable version with a lineage dep on the one it mutated.
   *
   * Metadata economics at 100 TB: per-file stats are REUSED for linked
   * files and harvested only over the rewritten output, so the stats cost
   * is O(touched files), not O(all files) — in BOTH tiers: inline
   * stats.json/blooms.json carry per linked file, and the parquet-table
   * indexes (stats/ + blooms/, the many-file form) carry untouched
   * files' rows through an anti-join on the touched list, re-indexing
   * only the rewrite output (the idxcarry probe shows flat mutation wall
   * against a linearly growing whole-rebuild). Row counts come from
   * footer stats, never a rescan.
   */
  private def cowRewrite(name: String, v: SemVer, touched: Seq[String],
                         all: Seq[String], rewritten: Option[DataFrame],
                         op: String, bloomExpected: Long,
                         schemaJsonOverride: Option[String] = None,
                         evolves: Boolean = false,
                         extraAttrs: Seq[String] = Nil,
                         guardLatest: Option[SemVer] = None)
      : MutationResult = {
    // once a version chain carries files that predate a column, every
    // descendant keeps the explicit-schema read flag
    val evolvedFlag = evolves || isEvolved(name, v)
    // carried entries resolve through the base's manifest to the files'
    // PHYSICAL owners, so a mutation chain of any depth stays one hop
    val baseManifest = manifestOf(name, v)
    val touchedSet = touched.toSet
    val untouched = all.filterNot(touchedSet)
    // parquet stats tier: the old index never collects to the driver —
    // completeness checks and row arithmetic run as index queries, and
    // the NEW version's index CARRIES untouched files' rows (anti-join
    // on the touched list) plus a partial harvest of the rewrite output
    val oldTierParquet = statsTierIsParquet(name, v)
    val oldStats = if (oldTierParquet) Seq.empty else fileStats(name, v)
    val kept = oldStats.filter(s => untouched.contains(s.file))
    // untouched ⊆ stats-covered by construction (a file missing from
    // stats is always touched); a violation would silently lose rows
    // from pruned reads of the new version, so fail loudly instead.
    // A wholly stats-less version (harvestStats=false save) is fine —
    // the new version then writes no stats.json either (all-or-nothing)
    require(kept.size == untouched.size || oldStats.isEmpty,
      s"$op: ${untouched.size - kept.size} untouched files lack stats")
    if (oldTierParquet) {
      // an UNREADABLE index degrades like a stats-less version: the
      // touched-file probe already fell back to touch-everything, so the
      // mutation is still correct — only an index that READS but does
      // not cover every file (a write-side invariant violation) aborts
      val census =
        try Some(FileStats.statsIndexCensusCount(spark,
          statsDirOf(name, v).toString))
        catch { case scala.util.control.NonFatal(_) => None }
      census match {
        case Some(c) =>
          require(c == all.size,
            s"$op: the parquet stats index does not cover every data file")
        case None =>
          require(untouched.isEmpty,
            s"$op: unreadable parquet stats index with untouched files")
      }
    }
    val untouchedSet = untouched.toSet
    val layout = partitionColsOf(name, v)
    val tmp = dsDir(name).resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.createDirectories(tmp.resolve("data"))
    val res = try {
      // untouched files never move: they cross to the new version as
      // manifest references (resolved to physical owners at commit)
      // old bloom shape, read up front: inline filters are carried per
      // referenced file and built ONLY over the rewrite output
      val inlineP = vDir(name, v).resolve("blooms.json")
      val parqB = bloomsDirOf(name, v)
      val oldInline: Map[String, Map[String, Array[Byte]]] =
        if (!Files.exists(inlineP)) Map.empty
        else FileStats.bloomsFromJson(
          new String(Files.readAllBytes(inlineP), "UTF-8"))
      val inlineCols =
        oldInline.valuesIterator.flatMap(_.keys).toSeq.distinct.sorted
      // parquet-tier bloom columns, read up front (metadata-sized
      // distinct): the rewrite's partial index builds pre-move
      val parqCols: Seq[String] =
        if (!Files.isDirectory(parqB)) Seq.empty
        else try spark.read.parquet(parqB.toString).select("col").distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      val rewriteDir = tmp.resolve("rewrite")
      var rewriteStats: Seq[FileStats.FileStat] = Seq.empty
      var rewrittenRows = 0L
      var rewFiles: Seq[Path] = Seq.empty
      var builtBlooms: Map[String, Map[String, Array[Byte]]] = Map.empty
      // partial index tables over ONLY the rewrite output, built while
      // the files still sit under rewriteDir (their dir-relative names
      // equal the final version-relative names): the untouched files'
      // rows carry from the old version's index tables verbatim, so a
      // point mutation on a bloom/stats-indexed giant re-indexes
      // O(touched) files, never the whole tree
      var statsNewOk = false
      var bloomsNewOk = false
      rewritten.foreach { df =>
        val w = df.write.mode("errorifexists")
        withJobDesc(s"catalog.$op $name: rewrite write") {
          (if (layout.nonEmpty) w.partitionBy(layout: _*) else w)
            .parquet(rewriteDir.toString)
        }
        rewFiles = walkParquet(rewriteDir)
        rewriteStats =
          try withJobDesc(s"catalog.$op $name: rewrite stats harvest") {
            FileStats.harvest(spark, rewriteDir.toString)
          }
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        rewrittenRows =
          if (rewriteStats.nonEmpty) rewriteStats.map(_.rows).sum
          else if (rewFiles.isEmpty) 0L
          else spark.read.parquet(rewriteDir.toString).count()
        if (inlineCols.nonEmpty && rewFiles.nonEmpty)
          builtBlooms = FileStats.buildBlooms(spark, rewriteDir.toString,
            inlineCols, bloomExpected, schema = Some(df.schema))
        if (oldTierParquet && rewFiles.nonEmpty)
          statsNewOk =
            try {
              FileStats.writeStatsIndex(spark, rewriteDir.toString,
                tmp.resolve("stats.new").toString)
              true
            } catch { case scala.util.control.NonFatal(_) =>
              deleteTree(tmp.resolve("stats.new")); false
            }
        if (parqCols.nonEmpty && rewFiles.nonEmpty)
          bloomsNewOk =
            try {
              FileStats.writeBloomIndex(spark, rewriteDir.toString,
                parqCols, bloomExpected, tmp.resolve("blooms.new").toString,
                schema = Some(df.schema))
              true
            } catch { case scala.util.control.NonFatal(_) =>
              deleteTree(tmp.resolve("blooms.new")); false
            }
        // move the rewrite's part files into the version tree, partition
        // subdirs preserved (part names carry job UUIDs — no collisions
        // with any referenced ancestor file)
        rewFiles.foreach { f =>
          val dst = tmp.resolve("data").resolve(rewriteDir.relativize(f))
          Files.createDirectories(dst.getParent)
          Files.move(f, dst)
        }
      }
      // pure path math (the files just moved); version-relative names of
      // the rewrite output — the manifest's self-owned entries
      val rewRels = rewFiles.map(f => rewriteDir.relativize(f).toString)
      // stats.json must cover EVERY file or not exist at all — a partial
      // stats file would make pruned reads skip the uncovered files
      val statsComplete = !oldTierParquet &&
        (rewriteStats.size == rewFiles.size) &&
          (untouched.isEmpty || oldStats.nonEmpty)
      val newStats = if (statsComplete) kept ++ rewriteStats else Seq.empty
      // parquet-tier base → parquet-tier result: untouched files' index
      // rows CARRY verbatim (the link farm doesn't change their footers
      // or version-relative names; the census check above proved the old
      // index covers them all) and union with the rewrite's partial
      // index — an O(touched) re-index. Any carry failure degrades to
      // the old whole-tree footer pass, and THAT failure degrades to an
      // index-less version (readable, just unpruned).
      lazy val touchedDf = spark.createDataset(touched)(
        org.apache.spark.sql.Encoders.STRING).toDF("file")
      if (oldTierParquet) {
        val carriedOk =
          try {
            require(!sys.props.contains("graft.test.failStatsCarry"),
              "test hook: forced stats-carry failure")
            require(statsNewOk || rewFiles.isEmpty,
              "rewrite partial stats index missing")
            val keptIdx = spark.read
              .parquet(statsDirOf(name, v).toString)
              .join(touchedDf, Seq("file"), "left_anti")
            val full =
              if (statsNewOk) keptIdx.unionByName(
                spark.read.parquet(tmp.resolve("stats.new").toString))
              else keptIdx
            // same (col, file) range clustering as writeStatsIndex, so
            // a wanted-columns read of the carried index prunes row
            // groups on `col` exactly like a rebuilt one
            val parts = math.max(4, math.min(2048,
              (untouched.size + rewFiles.size) / 25000))
            full.repartitionByRange(parts, col("col"), col("file"))
              .write.mode("errorifexists")
              .parquet(tmp.resolve("stats").toString)
            true
          } catch { case scala.util.control.NonFatal(_) =>
            deleteTree(tmp.resolve("stats")); false
          }
        if (!carriedOk)
          // full-census rebuild: under the manifest design tmp/data holds
          // ONLY the rewrite output, so indexing just that dir would
          // commit a PARTIAL stats index — and stats pruning, unlike
          // bloom pruning, is not conservative for missing files (pruned
          // reads silently drop every row of an unindexed file). Resolve
          // the untouched rels to their physical owners and index the
          // whole census; relativize's `/data/` anchor keys cross-dir
          // files by their version-relative names, matching the manifest.
          // Any failure degrades to an index-LESS version (readable,
          // just unpruned) — never a partial index.
          try {
            require(!sys.props.contains("graft.test.failStatsRebuild"),
              "test hook: forced stats-rebuild failure")
            val resolved = untouched.map(r =>
              resolveDataFile(name, v, r).toString) ++
              walkParquet(tmp.resolve("data")).map(_.toString)
            FileStats.writeStatsIndex(spark, tmp.resolve("data").toString,
              tmp.resolve("stats").toString, listed = Some(resolved))
          } catch { case scala.util.control.NonFatal(_) =>
            deleteTree(tmp.resolve("stats"))
          }
      }
      val inlineBlooms: Map[String, Map[String, Array[Byte]]] =
        oldInline.filter { case (f, _) => untouchedSet.contains(f) } ++
          builtBlooms
      if (parqCols.nonEmpty) {
        // the parquet bloom index carries the same way (bloom pruning
        // is conservative for any file missing from the index, so even
        // a partial carry only costs pruning, never rows)
        val carriedOk =
          try {
            require(bloomsNewOk || rewFiles.isEmpty,
              "rewrite partial bloom index missing")
            val keptIdx = spark.read.parquet(parqB.toString)
              .join(touchedDf, Seq("file"), "left_anti")
            val full =
              if (bloomsNewOk) keptIdx.unionByName(
                spark.read.parquet(tmp.resolve("blooms.new").toString))
              else keptIdx
            full.write.mode("errorifexists")
              .parquet(tmp.resolve("blooms").toString)
            true
          } catch { case scala.util.control.NonFatal(_) =>
            deleteTree(tmp.resolve("blooms")); false
          }
        if (!carriedOk)
          // schema MUST ride along: the no-schema fallback reads with
          // partition-type inference off, so a bloomed NON-STRING hive
          // partition column would build its bitmap in the string
          // domain while probes hash the recorded type — every equality
          // on it would wrongly prune (bloom misses are not conservative)
          FileStats.writeBloomIndex(spark, tmp.resolve("data").toString,
            parqCols, bloomExpected, tmp.resolve("blooms").toString,
            schema = rewritten.map(_.schema)
              .orElse(recordedSchema(name, v)))
      }
      deleteTree(tmp.resolve("stats.new"))
      deleteTree(tmp.resolve("blooms.new"))
      val schemaJson = schemaJsonOverride
        .orElse(recordedSchema(name, v).map(SignalSchema.toJson))
        .getOrElse(SignalSchema.toJson(
          Sys.drop(readVersionData(name, v)).schema))
      val rowsBefore = rowsOf(name, v)
      // with a stats-less base, untouched files can only be the WHOLE
      // version (the append shape; mutations touch everything when no
      // stats exist), so their row count is the meta's rowsBefore
      val rowsAfter =
        if (oldTierParquet)
          // census aggregation on the index — never a driver collect.
          // touched == everything (unresolvable predicate, or a degraded
          // unreadable index) needs no query — and skips broadcasting an
          // every-file list that at millions of files could exceed limits
          (if (untouched.isEmpty) 0L
           else FileStats.statsIndexRowsExcluding(spark,
             statsDirOf(name, v).toString, touched)) + rewrittenRows
        else if (oldStats.isEmpty && untouched.nonEmpty)
          rowsBefore + rewrittenRows
        else kept.map(_.rows).sum + rewrittenRows
      withCommitLock(name) {
        // optimistic concurrency: the loser of a mutation race aborts
        // HERE (its rewrite work is discarded with the tmp dir) instead
        // of committing a version that silently lacks the winner's edit
        guardLatestIs(name, guardLatest)
        val (nv, dir) = claimVersion(name, None)
        Files.move(tmp.resolve("data"), dir.resolve("data"))
        if (Files.isDirectory(tmp.resolve("blooms")))
          Files.move(tmp.resolve("blooms"), dir.resolve("blooms"))
        if (Files.isDirectory(tmp.resolve("stats")))
          Files.move(tmp.resolve("stats"), dir.resolve("stats"))
        // the manifest lands BEFORE meta.json (the commit point): a
        // crash in between leaves an invisible claimed dir, never a
        // committed version without its file census. A full rewrite
        // (untouched empty) is self-contained and skips the manifest.
        if (untouched.nonEmpty) {
          val entries = (untouched.map { rel =>
            val (d, ov) = baseManifest.flatMap(_.relOwner.get(rel))
              .getOrElse((name, v))
            Catalog.ManifestEntry(d, ov, rel)
          } ++ rewRels.map(Catalog.ManifestEntry(name, nv, _))).toVector
          Files.write(dir.resolve("manifest.json"),
            manifestJson((name, nv),
              Catalog.Manifest(entries, None)).getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        }
        // chainHash is a fresh UUID-tagged marker: a mutation is not a
        // chain checkpoint, so it must never satisfy findCheckpoint
        val meta = metaJson(VersionMeta(
          name, nv.toString, s"cow-$op-${java.util.UUID.randomUUID}",
          schemaJson, Seq(s"$name@v$v"), java.time.Instant.now.toString,
          rowsAfter,
          attrs = (if (evolvedFlag) Seq("schema:evolved") else Nil) ++
            extraAttrs))
        commitFence(name)
        Files.write(dir.resolve("meta.json"), meta.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        if (newStats.nonEmpty)
          Files.write(dir.resolve("stats.json"),
            FileStats.toJson(newStats).getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        if (inlineBlooms.nonEmpty)
          Files.write(dir.resolve("blooms.json"),
            FileStats.bloomsToJson(inlineBlooms).getBytes("UTF-8"),
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        MutationResult(nv, rewFiles.size, untouched.size,
          rowsBefore, rowsAfter)
      }
    } finally {
      deleteTree(tmp)
    }
    maybeAutoFlatten(name)
    res
  }

  /**
   * Zero-copy commit of `srcName@srcV`'s files as a NEW version of
   * `dstName`: the manifest references every source data file by its
   * PHYSICAL owner (resolved one hop through the source's own manifest,
   * so chains of restores/clones never deepen), the parquet-tier stats
   * and bloom indexes carry by `indexFrom` pointer (their keys are
   * version-dir-relative, identical for a zero-copy version), and the
   * meta records the cross-version lineage dep. O(files) metadata, zero
   * data bytes, on any store. The engine behind [[restore]] and
   * [[cloneDataset]].
   */
  private def linkVersion(srcName: String, srcV: SemVer,
                          dstName: String,
                          guardLatest: Option[SemVer] = None): SemVer = {
    requireValidName(dstName)
    val srcDir = vDir(srcName, srcV)
    require(Files.exists(srcDir.resolve("meta.json")),
      s"unknown version $srcName@v$srcV")
    val entries = dataFilesOf(srcName, srcV).toVector
    val indexFrom: Option[(String, SemVer)] =
      if (Files.isDirectory(srcDir.resolve("stats")) ||
          Files.isDirectory(srcDir.resolve("blooms")))
        Some((srcName, srcV))
      else manifestOf(srcName, srcV).flatMap(_.indexFrom)
    // schema derivation can launch a read — resolve it BEFORE the lock
    val schemaJson = recordedSchema(srcName, srcV).map(SignalSchema.toJson)
      .getOrElse(SignalSchema.toJson(
        Sys.drop(readVersionData(srcName, srcV)).schema))
    withCommitLock(dstName) {
      guardLatestIs(dstName, guardLatest)
      val (nv, dir) = claimVersion(dstName, None)
      Files.createDirectories(dir.resolve("data"))
      // inline index sidecars are metadata-sized — copy them so the new
      // version's inline tier stands alone (dir-tier carries by pointer)
      Seq("stats.json", "blooms.json").foreach { f =>
        if (Files.exists(srcDir.resolve(f)))
          Files.copy(srcDir.resolve(f), dir.resolve(f))
      }
      Files.write(dir.resolve("manifest.json"),
        manifestJson((dstName, nv),
          Catalog.Manifest(entries, indexFrom)).getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      val meta = metaJson(VersionMeta(
        dstName, nv.toString, s"cow-link-${java.util.UUID.randomUUID}",
        schemaJson, Seq(s"$srcName@v$srcV"),
        java.time.Instant.now.toString, rowsOf(srcName, srcV),
        attrs = if (isEvolved(srcName, srcV)) Seq("schema:evolved")
          else Nil))
      commitFence(dstName)
      Files.write(dir.resolve("meta.json"), meta.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      nv
    }
  }

  /** RESTORE (Delta `RESTORE TABLE ... VERSION AS OF`): roll `name` back
    * to version `to` by committing a zero-copy link-version of it as the
    * new LATEST — history stays intact (the bad versions remain
    * time-travelable until vacuumed), and the restore costs one hard
    * link per file. */
  def restore(name: String, to: SemVer): SemVer = {
    require(versions(name).contains(to),
      s"restore: no committed version $name@v$to")
    // a restore is a read-modify-write of LATEST too: racing mutations
    // must not silently disappear under a concurrently committed restore
    linkVersion(name, to, name, guardLatest = versions(name).lastOption)
  }

  /**
   * FLATTEN a manifest version: commit a row-identical NEW version whose
   * data dir physically holds every file (same version-relative names,
   * bytes moved by the fanned copier) with the index tables copied in,
   * so the new version stands alone — no manifest, no owner fan-out, no
   * ancestor pins. The mutation-chain maintenance verb (Delta's
   * checkpoint-compaction role): every cow/append commit adds one
   * physical owner to the chain, so a table mutated daily reads as an
   * ever-wider per-owner union on PARTITIONED layouts (unpartitioned
   * reads already collapse to one scan) and pins every ancestor's
   * referenced files against vacuum until a flatten (or full `optimize`)
   * resets the owner count to 1. Zero shuffle, zero rewrite — cost is
   * one distributed byte copy, strictly cheaper than optimize; the
   * chain's bytes reclaim at the next matured vacuum. Layout-only
   * (row-identical, sys ids preserved), so table streams SKIP it.
   * No-op on an already self-contained version. Only the LATEST version
   * can flatten (a flatten of an ancestor would resurrect old rows as
   * the new latest — that verb is [[restore]]).
   */
  def flattenVersion(name: String): SemVer = {
    val v = latestVersion(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    if (manifestOf(name, v).isEmpty) return v
    val entries = dataFilesOf(name, v)
    val tmp = dsDir(name).resolve(s".tmp-${java.util.UUID.randomUUID}")
    try {
      // up front, not per copied pair: a zero-entry manifest (restore
      // of an empty save) must still move a data dir at commit
      Files.createDirectories(tmp.resolve("data"))
      copyFanned(entries.map(e => (
        vDir(e.ds, e.v).resolve("data").resolve(e.rel).toString,
        tmp.resolve("data").resolve(e.rel).toString)))
      // the parquet-tier index tables travel physically too (keys are
      // version-relative — identical file set, identical keys); a
      // pointer carry would pin the chain's index dirs in vacuum,
      // defeating the point of flattening
      Seq("stats", "blooms").foreach { d =>
        val idx = idxDirOf(name, v, d)
        copyFanned(walkFiles(idx).map(f => (f.toString,
          tmp.resolve(d).resolve(idx.relativize(f).toString).toString)))
      }
      val srcDir = vDir(name, v)
      val schemaJson = recordedSchema(name, v).map(SignalSchema.toJson)
        .getOrElse(SignalSchema.toJson(
          Sys.drop(readVersionData(name, v)).schema))
      withCommitLock(name) {
        // losing a race to a concurrent mutation aborts — the caller
        // (or the next commit's auto-trigger) simply flattens later
        guardLatestIs(name, Some(v))
        val (nv, dir) = claimVersion(name, None)
        Files.move(tmp.resolve("data"), dir.resolve("data"))
        Seq("stats", "blooms").foreach { d =>
          if (Files.isDirectory(tmp.resolve(d)))
            Files.move(tmp.resolve(d), dir.resolve(d))
        }
        Seq("stats.json", "blooms.json").foreach { f =>
          if (Files.exists(srcDir.resolve(f)))
            Files.copy(srcDir.resolve(f), dir.resolve(f))
        }
        val meta = metaJson(VersionMeta(
          name, nv.toString, s"cow-flatten-${java.util.UUID.randomUUID}",
          schemaJson, Seq(s"$name@v$v"),
          java.time.Instant.now.toString, rowsOf(name, v),
          attrs = if (isEvolved(name, v)) Seq("schema:evolved") else Nil))
        commitFence(name)
        Files.write(dir.resolve("meta.json"), meta.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        nv
      }
    } finally deleteTree(tmp)
  }

  /** Auto-flatten trigger, run after every manifest-writing commit:
    * when the latest version's manifest names more than
    * `graft.manifest.maxOwners` distinct physical owners (default off),
    * flatten it — bounding both the partitioned read fan-out and the
    * vacuum pin set. Losing a race is fine; the next commit
    * re-triggers. */
  private def maybeAutoFlatten(name: String): Unit =
    // the mutation is ALREADY COMMITTED when this runs — no failure
    // here (bad conf value, disk-full mid-copy, a lost commit race)
    // may escape, or the caller would believe the commit failed and
    // retry it, committing the same batch twice
    try {
      val raw = spark.conf.get("graft.manifest.maxOwners",
        Int.MaxValue.toString)
      // a malformed cap must not be silently eaten with the flatten
      // failures below — the operator would believe the bound is live
      // while chains grow without limit; still must not escape, so
      // complain loudly and treat as unset
      val max = raw.toIntOption.getOrElse {
        System.err.println(
          s"[graft] ignoring non-integer graft.manifest.maxOwners='$raw'")
        Int.MaxValue
      }
      if (max != Int.MaxValue) {
        val owners = latestVersion(name).flatMap(manifestOf(name, _))
          .map(_.entries.iterator.map(e => (e.ds, e.v)).toSet.size)
          .getOrElse(0)
        if (owners > max) flattenVersion(name)
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /**
   * EXPORT a version as a SELF-CONTAINED portable tree at `dest`:
   * every data file physically copied (manifest resolved — a
   * zero-copy version's bytes live across ancestor dirs, so shipping
   * a snapshot off the warehouse genuinely needs this verb now),
   * plus meta.json, the inline index sidecars, and the parquet-tier
   * index dirs when present (carried-by-pointer indexes are copied
   * from their owner). The exported tree has NO manifest — it reads
   * as a plain pre-manifest version dir (`dest/data` is directly
   * `spark.read.parquet`-able for non-evolved schemas; an EVOLVED
   * version's old files predate some columns, so read those through
   * [[importVersion]] + [[readDataset]], which supplies the recorded
   * schema from the traveling meta.json), and [[importVersion]]
   * registers it in another catalog. Returns (files copied, bytes
   * copied). Deep-clone-to-elsewhere; for an in-catalog deep copy,
   * `optimize` already materializes.
   */
  /** Copy `(src, dst)` file pairs and return total bytes copied.
    * Below `graft.export.fanThreshold` (default 64 files) the copies
    * run driver-serial (no job overhead for the common small export);
    * past it they fan out over the executors — a 10 TB snapshot must
    * never funnel through one driver thread. Executor-side java.nio
    * matches the catalog's shared-filesystem contract (the same one
    * every commit-protocol move relies on). */
  private def copyFanned(pairs: Seq[(String, String)]): Long = {
    // REPLACE_EXISTING makes the copy IDEMPOTENT: a retried or
    // speculative Spark task re-runs its pairs over destinations a
    // dead attempt may have part-written — without it the retry fails
    // deterministically on FileAlreadyExists and the export aborts at
    // exactly the scale the fan-out exists for. Destinations are
    // always private (fresh export dest / commit-protocol tmp), so
    // replace can never clobber foreign data.
    val threshold =
      spark.conf.get("graft.export.fanThreshold", "64").toInt
    if (pairs.size <= threshold)
      pairs.map { case (s, d) => Catalog.copyOne(s, d) }.sum
    else
      spark.sparkContext
        .parallelize(pairs, math.min(pairs.size, 128))
        .map { case (s, d) => Catalog.copyOne(s, d) }
        .fold(0L)(_ + _)
  }

  def exportVersion(name: String, version: SemVer,
                    dest: String): (Int, Long) = {
    require(versions(name).contains(version),
      s"exportVersion: no committed version $name@v$version")
    val out = Paths.get(dest)
    require(!Files.exists(out) || listDir(out).isEmpty,
      s"exportVersion: destination $dest must be empty")
    Files.createDirectories(out.resolve("data"))
    val entries = dataFilesOf(name, version)
    val pairs = entries.map { e =>
      (vDir(e.ds, e.v).resolve("data").resolve(e.rel).toString,
        out.resolve("data").resolve(e.rel).toString)
    }
    val bytes = copyFanned(pairs)
    val srcDir = vDir(name, version)
    Seq("meta.json", "stats.json", "blooms.json").foreach { f =>
      if (Files.exists(srcDir.resolve(f)))
        Files.copy(srcDir.resolve(f), out.resolve(f))
    }
    Seq("stats", "blooms").foreach { d =>
      val idx = idxDirOf(name, version, d)
      copyFanned(walkFiles(idx).map(f =>
        (f.toString,
          out.resolve(d).resolve(idx.relativize(f).toString).toString)))
    }
    (entries.size, bytes)
  }

  /** IMPORT an [[exportVersion]] tree as a NEW version of `name` in
    * THIS catalog: the self-contained dir is copied in under a freshly
    * claimed version number (the commit protocol — data lands before
    * the meta.json commit point, name/version fields patched to the
    * local identity, lineage cleared: deps reference the SOURCE
    * catalog's versions, meaningless here). The transport pair for
    * moving snapshots between warehouses. */
  def importVersion(name: String, src: String): SemVer = {
    requireValidName(name)
    val in = Paths.get(src)
    require(Files.exists(in.resolve("meta.json")) &&
      Files.isDirectory(in.resolve("data")),
      s"importVersion: $src is not an exported version tree")
    // a raw zero-copy version dir from another warehouse carries a
    // manifest whose data lives across ANCESTOR dirs — importing it
    // would commit a version missing most of its bytes while the
    // patched meta still claims the full row count; only exportVersion
    // trees (manifest resolved, self-contained) are importable
    require(!Files.exists(in.resolve("manifest.json")),
      s"importVersion: $src is not self-contained " +
        "(has a manifest.json — produce the tree with exportVersion)")
    val tmp = dsDir(name).resolve(s".tmp-${java.util.UUID.randomUUID}")
    Files.createDirectories(tmp)
    try {
      // copy the tree into the save protocol's private temp first —
      // the claim-then-move commit stays metadata-fast and atomic
      copyFanned(walkFiles(in).map(f =>
        (f.toString, tmp.resolve(in.relativize(f).toString).toString)))
      val meta = new String(
        Files.readAllBytes(tmp.resolve("meta.json")), "UTF-8")
      withCommitLock(name) {
        val (nv, dir) = claimVersion(name, None)
        Files.move(tmp.resolve("data"), dir.resolve("data"))
        Seq("stats", "blooms").foreach { d =>
          if (Files.isDirectory(tmp.resolve(d)))
            Files.move(tmp.resolve(d), dir.resolve(d))
        }
        Seq("stats.json", "blooms.json").foreach { f =>
          if (Files.exists(tmp.resolve(f)))
            Files.move(tmp.resolve(f), dir.resolve(f))
        }
        val patched = meta
          .replaceFirst("\"name\": \"(?:[^\"\\\\]|\\\\.)*\"",
            java.util.regex.Matcher.quoteReplacement(
              "\"name\": \"" + esc(name) + "\""))
          .replaceFirst("\"version\": \"[^\"]*\"",
            java.util.regex.Matcher.quoteReplacement(
              "\"version\": \"" + nv + "\""))
          .replaceFirst("\"deps\": \\[[^\\]]*\\]", "\"deps\": []")
        commitFence(name)
        Files.write(dir.resolve("meta.json"), patched.getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        nv
      }
    } finally deleteTree(tmp)
  }

  /** Per-dataset storage accounting — what the manifest layer makes
    * worth asking: `logicalBytes` is what every committed version
    * claims to hold (manifest-resolved sizes, carried files counted
    * once PER VERSION), `physicalBytes` is what the dataset dir
    * actually stores (each byte once, pools included). Their ratio is
    * the zero-copy sharing factor; rows are
    * (dataset, versions, logicalBytes, physicalBytes). */
  def storageStats(): Seq[(String, Int, Long, Long)] =
    datasets().sorted.map { n =>
      val vs = versions(n)
      val logical = vs.iterator.map(v =>
        versionDataFiles(n, v).values.sum).sum
      // walk only each version/pool dir's data/ subtree: the stats/ and
      // blooms/ index tables are parquet too, and a whole-dataset-dir
      // walk (index dirs, stream farms) would skew the physical census
      // — and with it the advertised zero-copy sharing factor
      val physical = listDir(dsDir(n))
        .filter(_.getFileName.toString.startsWith("v"))
        .map(_.resolve("data"))
        .flatMap(walkParquet)
        .map(Files.size(_)).sum
      (n, vs.size, logical, physical)
    }

  /** Per-version sharing detail for one dataset: each committed
    * version's file count, logical bytes, and the physical owners its
    * manifest resolves to ("self" = its own data dir, `owner:count`
    * per group) — which versions share which pools, the drill-down
    * behind [[storageStats]]. */
  def storageDetail(name: String): Seq[(SemVer, Int, Long, String)] =
    versions(name).map { v =>
      val entries = dataFilesOf(name, v)
      val bytes = versionDataFiles(name, v).values.sum
      val owners = entries.groupBy(e => (e.ds, e.v)).toSeq
        .map { case ((d, ov), es) =>
          val tag = if ((d, ov) == ((name, v))) "self" else s"$d@v$ov"
          s"$tag:${es.size}"
        }.sorted.mkString(",")
      (v, entries.size, bytes, owners)
    }

  /**
   * Catalog FSCK — scan every dataset for invariant violations and
   * crash debris; returns (dataset, subject, finding, severity) rows,
   * empty = clean. READ-ONLY: nothing is repaired here (vacuum sweeps
   * pools/tmp, break-lock frees crashed locks, flatten/optimize
   * rebuild layouts, a stats rebuild re-indexes). Findings:
   *  - `missing-data-file` (critical): a committed manifest entry
   *    resolves to a physical path that no longer exists — reads of
   *    that version lose rows. The one finding that can only come from
   *    outside interference (the grace-window protocol never deletes
   *    referenced bytes).
   *  - `partial-stats-index` (warn): parquet-tier index census ≠ the
   *    version's file count — the read-side census guard already
   *    degrades such reads to unpruned, but the index should be
   *    dropped or rebuilt.
   *  - `missing-index-owner` (warn): an indexFrom pointer targets a
   *    version whose index dirs are gone — reads degrade to unpruned.
   *  - `broken-dep` (warn): recorded CROSS-dataset lineage names a
   *    missing version (same-dataset parent links are provenance —
   *    vacuum legitimately retires those ancestors).
   *  - `stale-lock` (warn): a commit-lock file older than the stale
   *    bar (a crashed holder; writers steal it themselves).
   *  - `stray-pool-marker` (info): `.pool` beside a committed
   *    meta.json (crash between marker and meta delete; the next
   *    vacuum resurrects it).
   *  - `claimed-headless` (info): a claimed version dir with neither
   *    meta.json nor `.pool` (a writer crashed pre-commit; invisible
   *    to readers, swept with the tmp debris).
   *  - `stale-tmp` (info): a `.tmp-*` dir whose NEWEST content mtime is
   *    older than an hour (the [[sweepTempDirs]] aging rule — a large
   *    save still streaming parquet parts after an hour is live, not
   *    debris).
   *  - `corrupt-manifest` (critical): a committed manifest that fails
   *    to parse, or parses to zero entries while the meta claims rows —
   *    the corruption that erases its own evidence (reads return zero
   *    rows "successfully"). Truncation that drops only SOME owner
   *    groups is caught by the missing-data-file / partial-stats-index
   *    census checks when an index exists.
   *  - `empty-data-dir` (critical): a self-contained committed version
   *    claiming rows whose data dir holds no parquet.
   *  - `unreadable-stats-index` (warn): the parquet-tier index census
   *    query itself fails (corrupt index files) — reads permanently
   *    degrade to unpruned until the index is dropped or rebuilt.
   *  - `unparseable-version-dir` (info): a `v*` dir whose suffix isn't
   *    a semver (foreign debris in the dataset dir).
   *  - `scan-error` (warn): a dataset/version whose metadata could not
   *    be read at all (I/O error, permissions) — fsck reports it and
   *    keeps scanning instead of aborting, since its whole purpose is
   *    running against damaged catalogs.
   * Cost: metadata-only — one stat per manifest-referenced file plus
   * one index census query per parquet-tier version; run it like
   * vacuum, as a maintenance pass.
   */
  /** Label the Spark jobs a protocol phase launches (UI/profiler
    * attribution — thread-local, restored after). */
  private def withJobDesc[A](desc: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Scheme-stripped, normalized path string — so `file:///x/y` (what
    * `input_file_name()` reports) and `/x/y` (what a java.nio Path
    * prints) compare equal in [[fsck]]'s batched census map. */
  private def normalizeFsPath(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    if (u.getPath == null || u.getPath.isEmpty) p else u.getPath
  }

  def fsck(): Seq[(String, String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String, String)]
    val now = System.currentTimeMillis()
    def guard[A](n: String, subj: String)(body: => A): Unit =
      try { body; () } catch {
        case scala.util.control.NonFatal(e) =>
          out += ((n, subj,
            s"scan-error:${e.getClass.getSimpleName}:${
              Option(e.getMessage).getOrElse("").take(120)}", "warn"))
      }
    // ---- batched pre-pass (findings unchanged, cost shape fixed) ----
    // 1. missing-data-file probes: the per-entry Files.exists loop was
    //    driver-serial (~30-56 µs/file — 8 driver-minutes at 10M files);
    //    past a threshold the stat calls fan out as a Spark job (the
    //    copyFanned idiom) and the loop below just consults the set.
    // 2. stats-index censuses: one Spark count PER parquet-tier version
    //    (~0.3 s job launch each — 150 s on a 500-version catalog)
    //    batch into ONE read over every index dir, grouped by dir; any
    //    version the batch can't answer falls back to its own query.
    val allEntryPaths = scala.collection.mutable.ArrayBuffer.empty[String]
    val allCensusDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    // versions whose manifests the pre-pass successfully enumerated: only
    // THEIR entries may consult the batched missing-set below. A version
    // skipped here (manifest parse failed, listing raced a save, the
    // test-only skip conf) but parsed in the main loop would otherwise
    // have every entry path absent from the set and be silently reported
    // as present — a fail-open consistency check (r16 VERDICT #4).
    val preCovered = scala.collection.mutable.HashSet.empty[(String, SemVer)]
    val prePassSkip: Set[String] =
      try spark.conf.get("graft.fsck.prePassSkipDatasets", "")
        .split(',').map(_.trim).filter(_.nonEmpty).toSet
      catch { case scala.util.control.NonFatal(_) => Set.empty }
    // test seam only — findings are unaffected (skipped datasets take
    // the direct-probe fallback below), but they lose the batched
    // existence pre-pass (driver-serial probes); warn so a conf that
    // leaks into a real session is visible
    if (prePassSkip.nonEmpty)
      System.err.println("[fsck] graft.fsck.prePassSkipDatasets is set " +
        s"(${prePassSkip.mkString(",")}) — test seam, slow path")
    datasets().filterNot(prePassSkip).foreach { n =>
      try listDir(dsDir(n)).map(_.getFileName.toString)
        .filter(_.startsWith("v"))
        .flatMap(s => try Some(SemVer.parse(s.drop(1)))
                      catch { case scala.util.control.NonFatal(_) => None })
        .foreach { v =>
          if (Files.exists(vDir(n, v).resolve("meta.json"))) {
            try {
              manifestOf(n, v).foreach(_.entries.foreach(e =>
                allEntryPaths +=
                  vDir(e.ds, e.v).resolve("data").resolve(e.rel).toString))
              preCovered += ((n, v))
            } catch { case scala.util.control.NonFatal(_) => () }
            try if (statsTierIsParquet(n, v))
              allCensusDirs += statsDirOf(n, v).toString
            catch { case scala.util.control.NonFatal(_) => () }
          }
        }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val fanoutMin =
      try spark.conf.get("graft.fsck.fanoutMinFiles", "4096").toInt
      catch { case scala.util.control.NonFatal(_) => 4096 }
    val distinctPaths = allEntryPaths.distinct
    val missingPaths: Set[String] =
      if (distinctPaths.size <= fanoutMin)
        distinctPaths.filterNot(p =>
          Files.exists(java.nio.file.Paths.get(p))).toSet
      else
        try spark.sparkContext
          .parallelize(distinctPaths.toSeq, 32)
          .filter(p => !java.nio.file.Files.exists(
            java.nio.file.Paths.get(p)))
          .collect().toSet
        catch { case scala.util.control.NonFatal(_) =>
          distinctPaths.filterNot(p =>
            Files.exists(java.nio.file.Paths.get(p))).toSet
        }
    val batchedCensus: Map[String, Long] =
      if (allCensusDirs.size < 2) Map.empty
      else try {
        import org.apache.spark.sql.functions.{col, count, input_file_name, lit, regexp_replace}
        spark.read.parquet(allCensusDirs.distinct.toSeq: _*)
          .where(col("col").isNull)
          .groupBy(regexp_replace(input_file_name(), "/[^/]*$", "")
            .as("__dir"))
          .agg(count(lit(1)).as("__n"))
          .collect()
          .map(r => normalizeFsPath(r.getString(0)) -> r.getLong(1)).toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    datasets().sorted.foreach { n => guard(n, "-") {
      val lockP = dsDir(n).resolve(".commit.lock")
      if (Files.exists(lockP)) {
        val age = try now - Files.getLastModifiedTime(lockP).toMillis
          catch { case _: java.io.IOException => 0L }
        if (age > Catalog.lockStaleMs)
          out += ((n, "-", s"stale-lock:${age}ms", "warn"))
      }
      listDir(dsDir(n))
        .filter(_.getFileName.toString.startsWith(".tmp-"))
        .foreach { t =>
          if (now - newestMtimeUnder(t) > 3600000L)
            out += ((n, t.getFileName.toString, "stale-tmp", "info"))
        }
      // parse version dirs one by one: a stray "version-backup" dir must
      // flag itself, not abort the dataset's whole scan
      val vs = listDir(dsDir(n)).map(_.getFileName.toString)
        .filter(_.startsWith("v"))
        .flatMap { s =>
          try Some(SemVer.parse(s.drop(1)))
          catch { case scala.util.control.NonFatal(_) =>
            out += ((n, s, "unparseable-version-dir", "info")); None
          }
        }.sorted
      vs.foreach { v => guard(n, s"v$v") {
        val dir = vDir(n, v)
        val hasMeta = Files.exists(dir.resolve("meta.json"))
        val hasPool = Files.exists(dir.resolve(".pool"))
        if (hasMeta && hasPool)
          out += ((n, s"v$v", "stray-pool-marker", "info"))
        if (!hasMeta && !hasPool)
          out += ((n, s"v$v", "claimed-headless", "info"))
        if (hasMeta) {
          val manifest =
            try Right(manifestOf(n, v))
            catch { case scala.util.control.NonFatal(e) => Left(e) }
          manifest match {
            case Left(e) =>
              out += ((n, s"v$v",
                s"corrupt-manifest:${e.getClass.getSimpleName}", "critical"))
            case Right(Some(m)) =>
              if (m.entries.isEmpty && rowsOf(n, v) > 0)
                out += ((n, s"v$v",
                  "corrupt-manifest:zero-entries", "critical"))
              // versions the pre-pass didn't enumerate probe directly:
              // their paths are absent from the batched set by
              // construction, and consulting it would fail open
              val covered = preCovered((n, v))
              m.entries.foreach { e =>
                val p = vDir(e.ds, e.v).resolve("data").resolve(e.rel)
                val missing =
                  if (covered) missingPaths.contains(p.toString)
                  else !Files.exists(p)
                if (missing)
                  out += ((n, s"v$v",
                    s"missing-data-file:${e.ds}@v${e.v}/${e.rel}",
                    "critical"))
              }
              m.indexFrom.foreach { case (d, ov) =>
                if (!Files.isDirectory(vDir(d, ov).resolve("stats")) &&
                    !Files.isDirectory(vDir(d, ov).resolve("blooms")))
                  out += ((n, s"v$v",
                    s"missing-index-owner:$d@v$ov", "warn"))
              }
            case Right(None) =>
              // self-contained layout: dataFilesOf enumerates the disk,
              // so per-file exists checks are tautologies — the only
              // detectable loss is the whole data dir emptied
              if (rowsOf(n, v) > 0 &&
                  walkParquet(dir.resolve("data")).isEmpty)
                out += ((n, s"v$v", "empty-data-dir", "critical"))
          }
          if (statsTierIsParquet(n, v)) {
            // batch answer first; a dir the batched read couldn't cover
            // (empty dir, scheme mismatch, corrupt sibling poisoning the
            // union) falls back to its own query — identical findings
            val census = batchedCensus.getOrElse(
              normalizeFsPath(statsDirOf(n, v).toString),
              try FileStats.statsIndexCensusCount(spark,
                statsDirOf(n, v).toString)
              catch { case scala.util.control.NonFatal(_) => -1L })
            val files = censusCountOf(n, v)
            if (census < 0)
              out += ((n, s"v$v", "unreadable-stats-index", "warn"))
            else if (census != files)
              out += ((n, s"v$v",
                s"partial-stats-index:$census/$files", "warn"))
          }
          depsOf(n, v).foreach { case (dn, dv) =>
            if (dn != n &&
                !Files.exists(vDir(dn, dv).resolve("meta.json")))
              out += ((n, s"v$v", s"broken-dep:$dn@v$dv", "warn"))
          }
        }
      }}
    }}
    out.result()
  }

  /** Shallow CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`): a new
    * dataset whose v1 zero-copy-links `src`'s files. Clone and source
    * then evolve independently — mutations of either are copy-on-write —
    * while the recorded dep keeps the source version vacuum-safe. */
  def cloneDataset(src: String, dst: String,
                   version: Option[SemVer] = None): SemVer = {
    val v = version.orElse(latestVersion(src)).getOrElse(
      throw new NoSuchElementException(s"dataset $src not found"))
    linkVersion(src, v, dst)
  }

  /**
   * Partial OPTIMIZE (Delta's `OPTIMIZE ... WHERE`): compact ONLY the
   * files that may contain predicate-matching rows into ~`nFiles`
   * size-even outputs (scan partitions sized to total/nFiles, the same
   * packing as [[optimize]]), hard-linking every other file — the
   * hot-partition small-file sweep that never rewrites the cold 99% of
   * a 100 TB dataset. Layout-only: touched files are carried WHOLE (no
   * filtering), so the new version is row-identical to the old one.
   */
  def optimizeWhere(name: String, predicate: org.apache.spark.sql.Column,
                    nFiles: Int = 8,
                    bloomExpected: Long = 100000L): MutationResult = {
    val v = latestVersion(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val (touched, all) = touchedFiles(name, v, predicate)
    compactFiles(name, v, touched, all, nFiles, "optimize_where",
      bloomExpected)
  }

  /** Compact exactly `touched` (whole files, no filtering — the new
    * version is row-identical) into ~`nFiles` size-even outputs,
    * hard-linking the rest. Shared engine of [[optimizeWhere]] and
    * [[autoCompact]]. */
  private def compactFiles(name: String, v: SemVer, touched: Seq[String],
                           all: Seq[String], nFiles: Int, op: String,
                           bloomExpected: Long): MutationResult = {
    if (touched.isEmpty)
      cowRewrite(name, v, touched, all, None, op, bloomExpected,
        guardLatest = Some(v))
    else {
      val total = touched.map(r =>
        Files.size(resolveDataFile(name, v, r))).sum
      val target = math.max(64L << 10,
        math.ceil(total.toDouble / math.max(1, nFiles)).toLong)
      // the scan packs at WRITE time (inside cowRewrite); the packing
      // targets live on a cloned session's SQLConf (see optimize) —
      // cowRewrite itself still runs on THIS catalog, only the touched
      // scan is re-derived on the packed twin
      cowRewrite(name, v, touched, all,
        Some(packedSession(target).readVersionFiles(name, v, touched)
          .coalesce(nFiles)),
        op, bloomExpected, guardLatest = Some(v))
    }
  }

  /** A catalog twin on a CLONED Spark session (shared context, COPIED
    * runtime SQLConf) carrying the compaction packing targets — the flip
    * is session-scoped, so no lock is held across the rewrite job and
    * the base session's concurrent readers never observe it. A true
    * clone (not `newSession()`, which resets to builder-time defaults):
    * runtime confs the user set — rebase modes, session timezone, case
    * sensitivity — must hold on the rewrite's read or the compacted
    * bytes could differ from what the base session reads. */
  private def packedSession(targetBytes: Long): Catalog = {
    val s2 = org.apache.spark.sql.graft.bridge.cloneSession(spark)
    s2.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    s2.conf.set("spark.sql.files.openCostInBytes",
      math.min(4L << 20, targetBytes / 16).toString)
    new Catalog(root, s2)
  }

  /**
   * Auto-compaction for append-heavy tables (Delta's autoCompact): when
   * the latest version holds more than `maxSmallFiles` files under
   * `smallBytes`, compact EXACTLY those small files into ~`nFiles`
   * size-even outputs, hard-linking every full-size file — layout-only
   * and row-identical. This is what keeps a streaming-append table's
   * file count bounded without ever rewriting the compacted bulk: the
   * small batch files fold together, the big results of previous
   * compactions carry as links. Returns None under threshold (nothing
   * written).
   */
  def autoCompact(name: String, maxSmallFiles: Int = 16,
                  smallBytes: Long = 32L << 20, nFiles: Int = 1,
                  bloomExpected: Long = 100000L): Option[MutationResult] = {
    val v = latestVersion(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val sizes = versionDataFiles(name, v)
    val small = sizes.filter(_._2 < smallBytes).keys.toSeq.sorted
    if (small.size <= maxSmallFiles) None
    else Some(compactFiles(name, v, small, sizes.keys.toSeq.sorted,
      nFiles, "auto_compact", bloomExpected))
  }

  /**
   * DELETE WHERE on a saved dataset, committed as a NEW copy-on-write
   * version: rows where `predicate` is TRUE are removed (FALSE and NULL
   * rows stay — SQL DELETE semantics). Only files the stats/bloom index
   * says may contain a matching row are rewritten; the rest hard-link
   * (see [[cowRewrite]]). Surviving rows keep their `sys` identity.
   */
  def deleteWhere(name: String, predicate: org.apache.spark.sql.Column,
                  version: Option[SemVer] = None,
                  bloomExpected: Long = 100000L): MutationResult = {
    val v = version.orElse(latestVersion(name)).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val (touched, all) = touchedFiles(name, v, predicate)
    val rewrittenDf =
      if (touched.isEmpty) None
      else Some(readVersionFiles(name, v, touched)
        .filter(not(coalesce(predicate, lit(false)))))
    cowRewrite(name, v, touched, all, rewrittenDf, "delete", bloomExpected,
      guardLatest = if (version.isEmpty) Some(v) else None)
  }

  /**
   * UPDATE ... SET ... WHERE on a saved dataset, committed as a NEW
   * copy-on-write version: for rows where `predicate` is TRUE each
   * `set` column takes its expression's value (evaluated over the OLD
   * row — simultaneous assignment, SQL UPDATE semantics); other rows
   * and all other columns pass through unchanged, and every updated
   * row keeps its `sys` identity. Values are cast back to the column's
   * existing type so rewritten files stay schema-identical to linked
   * ones. Only may-match files are rewritten.
   */
  def updateWhere(name: String, predicate: org.apache.spark.sql.Column,
                  set: Map[String, org.apache.spark.sql.Column],
                  version: Option[SemVer] = None,
                  bloomExpected: Long = 100000L): MutationResult = {
    val v = version.orElse(latestVersion(name)).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    require(set.nonEmpty, "updateWhere: empty SET")
    require(!set.contains(Sys.ColName), "updateWhere: sys is not assignable")
    val (touched, all) = touchedFiles(name, v, predicate)
    val rewrittenDf =
      if (touched.isEmpty) None
      else {
        val df = readVersionFiles(name, v, touched)
        val bad = set.keySet -- df.columns.toSet
        require(bad.isEmpty, s"updateWhere: unknown columns $bad")
        val hit = coalesce(predicate, lit(false))
        Some(df.select(df.columns.map { c =>
          set.get(c) match {
            case Some(e) =>
              when(hit, e).otherwise(col(c))
                .cast(df.schema(c).dataType).as(c)
            case None => col(c)
          }
        }: _*))
      }
    cowRewrite(name, v, touched, all, rewrittenDf, "update", bloomExpected,
      guardLatest = if (version.isEmpty) Some(v) else None)
  }

  /**
   * MERGE INTO (upsert) a saved dataset from `source`, committed as a
   * NEW copy-on-write version: target rows whose `on` key matches a
   * source row take the source's values for every non-key column
   * (keeping their `sys` identity — a stable row id across mutations);
   * source rows matching no target row are inserted (stamped with sys
   * ids past the version's footer-max id, so identities never collide).
   * `matchedAction = "delete"` removes matched rows instead — the
   * delete-by-key-list (GDPR) shape, still rewriting only
   * key-overlapping files. Delta's MERGE cardinality rule is enforced:
   * source keys must be unique and non-null.
   *
   * File pruning: when the source's distinct key count fits
   * `keyCollectMax` the touched-file predicate is per-column IN lists
   * (range + bloom prunable); larger sources probe the per-file footer
   * ENVELOPES against the source keys directly (binned broadcast join,
   * see [[touchedByEnvelope]]) — both are supersets of true key
   * membership, so an untouched file provably contains no matching key
   * and the global anti-join for inserts only needs the touched files'
   * keys.
   */
  def mergeInto(name: String, source: DataFrame, on: Seq[String],
                version: Option[SemVer] = None,
                insertNotMatched: Boolean = true,
                matchedAction: String = "update",
                evolveSchema: Boolean = false,
                keyCollectMax: Int = 10000,
                bloomExpected: Long = 100000L): MutationResult = {
    val v = version.orElse(latestVersion(name)).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    require(on.nonEmpty, "mergeInto: empty key")
    require(Set("update", "delete")(matchedAction),
      s"mergeInto: matchedAction must be update|delete, got '$matchedAction'")
    val src0 = Sys.drop(source)
    val target = readVersionData(name, v)
    val userCols = target.columns.filterNot(_ == Sys.ColName)
    // schema evolution (Delta withSchemaEvolution): extra source columns
    // EXTEND the table — matched rows take the source value, carried and
    // pre-existing rows read back null. The version records the extended
    // schema plus the `schema:evolved` flag, so reads supply it
    // explicitly and old files fill the new columns by name.
    val newCols: Seq[String] =
      if (!evolveSchema) {
        require(src0.columns.sorted.sameElements(userCols.sorted),
          s"mergeInto: source columns ${src0.columns.sorted.mkString(",")} " +
            s"must equal target user columns ${userCols.sorted.mkString(",")}" +
            " (pass evolveSchema=true to extend)")
        Seq.empty
      } else {
        require(userCols.forall(src0.columns.contains),
          s"mergeInto(evolveSchema): source must carry every target " +
            s"column; missing ${userCols.filterNot(src0.columns.contains).mkString(",")}")
        src0.columns.filterNot(userCols.contains).toSeq
      }
    def outType(c: String): org.apache.spark.sql.types.DataType =
      if (newCols.contains(c)) src0.schema(c).dataType
      else target.schema(c).dataType
    val outUser = userCols.toSeq ++ newCols
    // two single-shot jobs, deliberately: one full-aggregate pre-flight
    // (row count, key uniqueness, null keys — bounds driver memory
    // before anything is collected), then the distinct-key collect for
    // small sources. A fused groupBy().limit(cap+1).collect() was tried
    // (r17) and measured SLOWER: CollectLimit schedules partitions
    // incrementally, turning the single fused pass into 3-5 jobs per
    // merge (q_stream_upsert 4.5 → 5.2-6.4 s).
    val aggs =
      Seq(count(lit(1)).as("__n"),
        count_distinct(struct(on.map(col): _*)).as("__nd")) ++
      on.map(k =>
        sum(when(col(k).isNull, 1L).otherwise(0L)).as(s"__nulls_$k"))
    val h = src0.agg(aggs.head, aggs.tail: _*).head()
    val srcRows = h.getAs[Long]("__n")
    on.foreach(k => require(h.getAs[Long](s"__nulls_$k") == 0L,
      s"mergeInto: source has NULL keys in '$k'"))
    require(h.getAs[Long]("__nd") == srcRows,
      s"mergeInto: source keys are not unique " +
        s"(${srcRows} rows, ${h.getAs[Long]("__nd")} distinct keys)")
    if (srcRows == 0L)
      return MutationResult(v, 0, 0, rowsOf(name, v), rowsOf(name, v))
    val (touched, all) =
      if (h.getAs[Long]("__nd") <= keyCollectMax) {
        // small source: per-column IN lists ride the full stats + BLOOM
        // evaluator (a point-lookup merge on a bloom-indexed version
        // localizes to the exact files holding the keys)
        val tuples = src0.select(on.map(col): _*).distinct().collect()
        touchedFiles(name, v, on.zipWithIndex.map { case (k, i) =>
          col(k).isin(tuples.map(_.get(i)).distinct.toSeq: _*)
        }.reduce(_ && _))
      } else touchedByEnvelope(name, v, src0, on)
    val touchedDf = readVersionFiles(name, v, touched)
    val s = src0.select(src0.columns.map(c => col(c).as(s"__s_$c")): _*)
    val joinCond = on.map(k => col(k) === col(s"__s_$k")).reduce(_ && _)
    // matched target rows take source values, keep their sys identity
    val joined = touchedDf.join(s, joinCond, "left")
    val matched = col(s"__s_${on.head}").isNotNull // source keys non-null
    // matchedAction="delete" turns the merge into a delete-by-key-list
    // (the GDPR/right-to-be-forgotten shape): matched target rows are
    // removed instead of updated, still touching only key-overlapping
    // files. Its matched count is derived arithmetically after the write
    // (removed rows can't carry a marker through it).
    val survivors =
      if (matchedAction == "delete")
        joined.filter(!matched).select(
          (outUser.map { c =>
            if (newCols.contains(c)) lit(null).cast(outType(c)).as(c)
            else col(c)
          } ++ Seq(col(Sys.ColName), lit(0L).as("__m"),
            lit(0L).as("__i"))): _*)
      else joined.select(
        (outUser.map { c =>
          if (newCols.contains(c))
            when(matched, col(s"__s_$c"))
              .otherwise(lit(null).cast(outType(c))).as(c)
          else if (on.contains(c)) col(c)
          else when(matched, col(s"__s_$c")).otherwise(col(c))
            .cast(outType(c)).as(c)
        } ++ Seq(col(Sys.ColName),
          when(matched, 1L).otherwise(0L).as("__m"),
          lit(0L).as("__i"))): _*)
    val out =
      if (!insertNotMatched) survivors
      else {
        // an unmatched source key cannot live in an untouched file (the
        // prune predicate is a superset of key membership), so the anti
        // join only needs the touched files' keys
        val anti = s.join(touchedDf.select(on.map(col): _*),
          joinCond, "left_anti")
        val base = maxSysId(name, v, all, target)
        val ins0 = Sys.stampFrom(
          anti.select(outUser.map(c =>
            col(s"__s_$c").cast(outType(c)).as(c)): _*),
          base)
        val ins = ins0.select(
          (outUser.map(col) ++ Seq(col(Sys.ColName),
            lit(1L).as("__m"), lit(1L).as("__i"))): _*)
        survivors.union(ins)
      }
    val obs = org.apache.spark.sql.Observation()
    val rewrittenDf = out
      .observe(obs, sum(col("__m")).as("matchedPlusIns"),
        sum(col("__i")).as("inserted"))
      .drop("__m", "__i")
    val schemaOverride =
      if (newCols.isEmpty) None
      else Some(SignalSchema.toJson(org.apache.spark.sql.types.StructType(
        // extended schema: existing user fields verbatim, new ones from
        // the source, forced nullable (pre-evolution rows read null)
        userCols.map(c => target.schema(c)) ++
          newCols.map(c => src0.schema(c).copy(nullable = true)))))
    val res = cowRewrite(name, v, touched, all, Some(rewrittenDf),
      "merge", bloomExpected, schemaJsonOverride = schemaOverride,
      evolves = newCols.nonEmpty,
      guardLatest = if (version.isEmpty) Some(v) else None)
    val insN = Option(obs.get("inserted")).map(_.asInstanceOf[Long])
      .getOrElse(0L)
    val mPlusI = Option(obs.get("matchedPlusIns")).map(_.asInstanceOf[Long])
      .getOrElse(0L)
    val matchedN =
      if (matchedAction == "delete") res.rowsBefore + insN - res.rowsAfter
      else mPlusI - insN
    res.copy(rowsMatched = matchedN, rowsInserted = insN)
  }

  /** Highest stamped sys.id in `name@v` — footer stats when present,
    * one agg over the version otherwise. New rows stamp above it. */
  private def maxSysId(name: String, v: SemVer, all: Seq[String],
                       target: DataFrame): Long =
    FileStats.leafMaxLong(spark,
      all.map(r => resolveDataFile(name, v, r).toString), "sys.id")
      .getOrElse {
        val r = target.agg(max(col("sys.id"))).head()
        if (r.isNullAt(0)) -1L else r.getLong(0)
      }

  /**
   * APPEND rows as a new immutable version — Delta's `mode("append")`:
   * every existing file hard-links across (zero bytes copied, stats and
   * blooms carried), only the new rows write. The cheapest possible
   * write on a growing table: cost is O(batch), never O(table), and the
   * file-level CDF diff then reports exactly the appended files as
   * inserts. `extraAttrs` lands IN the same meta.json commit — the
   * atomicity hook the exactly-once streaming sink uses for its batch
   * marker ([[graft.streaming.EventStream]] `appendToDataset`).
   *
   * Concurrency: like every mutation here, an append is snapshot-based
   * on the parent it read — two writers appending concurrently both
   * commit, but the later version is based on the earlier writer's
   * PARENT, not its result (the recorded parent dep makes the fork
   * auditable in lineage). Run one writer per dataset; serialize
   * multi-writer ingest through one stream.
   */
  def append(name: String, rows: DataFrame,
             version: Option[SemVer] = None,
             bloomExpected: Long = 100000L,
             extraAttrs: Seq[String] = Nil): MutationResult = {
    val v = version.orElse(latestVersion(name)).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val src = Sys.drop(rows)
    val target = readVersionData(name, v)
    val userCols = target.columns.filterNot(_ == Sys.ColName)
    require(src.columns.sorted.sameElements(userCols.sorted),
      s"append: source columns ${src.columns.sorted.mkString(",")} must " +
        s"equal target user columns ${userCols.sorted.mkString(",")}")
    val all = versionDataFiles(name, v).keys.toSeq.sorted
    val base = maxSysId(name, v, all, target)
    val stamped = Sys.stampFrom(
      src.select(userCols.map(c =>
        col(c).cast(target.schema(c).dataType).as(c)): _*), base)
      .select((userCols.map(col) :+ col(Sys.ColName)): _*)
    cowRewrite(name, v, Seq.empty, all, Some(stamped), "append",
      bloomExpected, extraAttrs = extraAttrs,
      guardLatest = if (version.isEmpty) Some(v) else None)
  }

  /**
   * Exact touched-file selection for a LARGE merge source (too many
   * distinct keys to collect): probe each file's footer ENVELOPE against
   * the source's keys. A file is touched iff, for EVERY key column, some
   * source key falls inside its [min,max] — files whose envelope no key
   * enters are provably match-free and hard-linkable. This is what makes
   * the common upsert shape "update some old keys + insert brand-new
   * high keys" cheap: a single [min,max] box over the source would span
   * the whole domain and touch every file; the envelope probe leaves the
   * uncovered middle alone.
   *
   * Scale shape: one broadcast BINNED equi-join per key column — numeric
   * envelopes expand into at most `binCap` bin rows (bin width = the
   * median envelope width, so a sorted/z-ordered layout's files land in
   * ~1 bin each) and source keys join on their bin, map-side-aggregated
   * down to at most one row per file. Envelopes wider than `binCap` bins
   * are touched unconditionally (a file spanning the domain is almost
   * surely hit — pruning it was never on the table). Never a cross
   * product, never a key collect. String keys use a bounded
   * nested-loop probe up to 1024 string-stat files; beyond that they
   * bin EQUI-DEPTH over the envelope bounds via a shared binary-search
   * rank ([[probeEnvelopesStringBinned]]) and run the same binned
   * equi-join.
   */
  private def touchedByEnvelope(name: String, v: SemVer, src: DataFrame,
                                on: Seq[String]): (Seq[String], Seq[String]) = {
    val all = dataFilesOf(name, v).map(_.rel)
    val stats = try fileStatsFor(name, v, Some(on))
      catch { case scala.util.control.NonFatal(_) =>
        Seq.empty[FileStats.FileStat] }
    if (stats.isEmpty) return (all, all)
    val byFile = stats.map(s => s.file -> s).toMap
    var candidates: Set[String] = byFile.keySet
    for (k <- on if candidates.nonEmpty) {
      val parts = candidates.toSeq.sorted.map(f => f -> byFile(f).cols.get(k))
      val (have0, missing) = parts.partition(_._2.isDefined)
      val have = have0.map { case (f, c) => (f, c.get) }
      val hit: Set[String] =
        if (have.isEmpty) Set.empty
        else have.head._2.kind match {
          case "l" => probeEnvelopesLong(src, k, have)
          case "d" => probeEnvelopesDouble(src, k, have)
          case _ => probeEnvelopesString(src, k, have)
        }
      candidates = hit ++ missing.map(_._1)
    }
    val touched = candidates ++ all.filterNot(byFile.contains)
    (all.filter(touched), all)
  }

  private val envBinCap = 16L

  private def collectHitFiles(joined: DataFrame): Set[String] =
    joined.groupBy("__f").count().collect().map(_.getString(0)).toSet

  private def probeEnvelopesLong(src: DataFrame, k: String,
                                 envs: Seq[(String, FileStats.ColStats)])
      : Set[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, expr}
    val g0 = envs.map(_._2.minL).min
    val g1 = envs.map(_._2.maxL).max
    if (g1 - g0 < 0) return envs.map(_._1).toSet // span overflow: keep all
    val widths = envs.map { case (_, c) => c.maxL - c.minL + 1 }.sorted
    val w = math.max(1L, widths(widths.size / 2)) // median envelope width
    val (narrow, wide) = envs.partition { case (_, c) =>
      (c.maxL - g0) / w - (c.minL - g0) / w < envBinCap
    }
    if (narrow.isEmpty) return wide.map(_._1).toSet
    val env = narrow.flatMap { case (f, c) =>
      val bLo = (c.minL - g0) / w
      val bHi = (c.maxL - g0) / w
      (bLo to bHi).map(b => (f, b, c.minL, c.maxL))
    }.toDF("__f", "__b", "__lo", "__hi")
    // the between filter also keeps the bin subtraction overflow-free
    val keys = src.select(col(k).cast("long").as("__k")).na.drop()
      .filter(col("__k").between(lit(g0), lit(g1)))
      .withColumn("__b", expr(s"(__k - ${g0}L) div ${w}L"))
    // past ~64k files the bin table (files × ≤binCap rows) can exceed
    // broadcast limits — fall back to a plain equi-join on the bin and
    // let AQE pick the strategy
    val envJ = if (narrow.size <= envBroadcastMax) broadcast(env) else env
    val hit = collectHitFiles(keys.join(envJ,
      keys("__b") === env("__b") &&
        col("__k") >= col("__lo") && col("__k") <= col("__hi")))
    hit ++ wide.map(_._1)
  }

  /** Envelope-bin tables stop broadcasting past this many files — the
    * join still runs (shuffled on the bin), only the strategy changes.
    * One shared constant with the touched-file join arm. */
  private val envBroadcastMax = FileStats.metaBroadcastMax

  private def probeEnvelopesDouble(src: DataFrame, k: String,
                                   envs: Seq[(String, FileStats.ColStats)])
      : Set[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, floor => ffloor}
    val g0 = envs.map(_._2.minD).min
    val g1 = envs.map(_._2.maxD).max
    val widths = envs.map { case (_, c) => c.maxD - c.minD }.sorted
    val span = g1 - g0
    val w0 = widths(widths.size / 2)
    val w = if (w0 > 0) w0 else if (span > 0) span / 4096.0 else 1.0
    def bin(x: Double): Long = math.floor((x - g0) / w).toLong
    // ±1 bin guard: double rounding at a boundary must only ADD touches
    val (narrow, wide) = envs.partition { case (_, c) =>
      bin(c.maxD) - bin(c.minD) + 2 < envBinCap
    }
    if (narrow.isEmpty) return wide.map(_._1).toSet
    val env = narrow.flatMap { case (f, c) =>
      (bin(c.minD) - 1 to bin(c.maxD) + 1).map(b => (f, b, c.minD, c.maxD))
    }.toDF("__f", "__b", "__lo", "__hi")
    val keys = src.select(col(k).cast("double").as("__k")).na.drop()
      .filter(col("__k").between(lit(g0), lit(g1))) // drops NaN too
      .withColumn("__b", ffloor((col("__k") - lit(g0)) / lit(w)).cast("long"))
    val envJ = if (narrow.size <= envBroadcastMax) broadcast(env) else env
    val hit = collectHitFiles(keys.join(envJ,
      keys("__b") === env("__b") &&
        col("__k") >= col("__lo") && col("__k") <= col("__hi")))
    hit ++ wide.map(_._1)
  }

  private def probeEnvelopesString(src: DataFrame, k: String,
                                   envs: Seq[(String, FileStats.ColStats)])
      : Set[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    // Spark's string ordering IS UTF-8 byte order — the same domain the
    // footer envelopes live in, so the comparison is consistent
    if (envs.size > Catalog.stringNestedLoopMax)
      return probeEnvelopesStringBinned(src, k, envs)
    val env = envs.map { case (f, c) => (f, c.minS, c.maxS) }
      .toDF("__f", "__lo", "__hi")
    collectHitFiles(src.select(col(k).cast("string").as("__k")).na.drop()
      .join(broadcast(env),
        col("__k") >= col("__lo") && col("__k") <= col("__hi")))
  }

  /**
   * Past the nested-loop cap, string envelopes bin EQUI-DEPTH in their
   * own domain: the sorted envelope LOWER bounds become quantile
   * boundaries and every bound ranks against them by binary search
   * ([[org.apache.spark.sql.graft.StringBoundsRank]], UTF-8 byte
   * order). The driver bins the envelopes and the scan bins the source
   * keys through the SAME rank object, so bin assignment can never
   * diverge; the exact string range test rides as the join residual. A
   * sorted layout's files span ~1 bin each regardless of key SHAPE (no
   * numeric-projection rollover pathology); envelopes spanning ≥
   * [[envBinCap]] bins are touched unconditionally, like the numeric
   * arms. Files with null bounds (all-null column) can't match a
   * non-null key and stay untouched, matching the nested-loop arm.
   */
  private def probeEnvelopesStringBinned(src: DataFrame, k: String,
      envs: Seq[(String, FileStats.ColStats)]): Set[String] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val (bounded, nullB) =
      envs.partition { case (_, c) => c.minS != null && c.maxS != null }
    val _ = nullB // untouched by construction
    if (bounded.isEmpty) return Set.empty
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    def minU(a: String, b: String) = if (u(a).compareTo(u(b)) <= 0) a else b
    def maxU(a: String, b: String) = if (u(a).compareTo(u(b)) >= 0) a else b
    val g0 = bounded.map(_._2.minS).reduce(minU)
    val g1 = bounded.map(_._2.maxS).reduce(maxU)
    val losSorted = bounded.map(_._2.minS)
      .sortWith((a, b) => u(a).compareTo(u(b)) < 0)
    val nb = math.min(4096, losSorted.size)
    val bounds = (1 until nb)
      .map(i => losSorted((i.toLong * losSorted.size / nb).toInt))
      .distinct.toArray
    val ranker = org.apache.spark.sql.graft.StringBoundsRank(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(""),
        org.apache.spark.sql.types.StringType),
      if (bounds.nonEmpty) bounds else Array(g0))
    def rk(s: String): Long = ranker.rank(u(s))
    val (narrow, wide) = bounded.partition { case (_, c) =>
      rk(c.maxS) - rk(c.minS) < envBinCap
    }
    if (narrow.isEmpty) return wide.map(_._1).toSet
    val env = narrow.flatMap { case (f, c) =>
      (rk(c.minS) to rk(c.maxS)).map(b => (f, b, c.minS, c.maxS))
    }.toDF("__f", "__b", "__lo", "__hi")
    val keys = src.select(col(k).cast("string").as("__k")).na.drop()
      .filter(col("__k").between(lit(g0), lit(g1)))
      .withColumn("__b", org.apache.spark.sql.graft.bridge.column(
        ranker.withNewChildren(Seq(
          org.apache.spark.sql.graft.bridge.expression(col("__k"))))))
    val envJ = if (narrow.size <= envBroadcastMax) broadcast(env) else env
    val hit = collectHitFiles(keys.join(envJ,
      keys("__b") === env("__b") &&
        col("__k") >= col("__lo") && col("__k") <= col("__hi")))
    hit ++ wide.map(_._1)
  }

  // ---- SQL surface: datasets as queryable views -----------------------

  /** SQL view name for a dataset (latest) or a pinned version:
    * `docs` / `docs_v1_2_0`. Dataset names are already view-safe by
    * [[requireValidName]] except dashes/dots, which map to underscores. */
  private def viewName(name: String, v: Option[SemVer]): String = {
    val base = name.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    v.map(x => s"${base}_v${x.toString.replace('.', '_')}").getOrElse(base)
  }

  /**
   * Run ANSI SQL over the catalog: every dataset is addressable as a
   * temp view by name (latest version) and as `name_vX_Y_Z` (time
   * travel), so `sql("SELECT * FROM docs JOIN docs_v1_0_0 USING (id)")`
   * compares a dataset with its own history. Registration is LAZY and
   * metadata-cheap: the query text is scanned against the catalog
   * listing and only the referenced datasets/versions become views —
   * a catalog with thousands of versions never pays O(versions) schema
   * reads for one query. Views are plain parquet scans: full predicate
   * pushdown, column pruning, and Catalyst optimization apply.
   */
  def sql(query: String): DataFrame = {
    val mentioned = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(query).toSet
    // view name → the dataset (and optional pinned version) it serves;
    // two sources mapping to one sanitized name (e.g. "a.b" vs "a_b",
    // or a dataset literally named "t_v1_0_0" vs t@1.0.0's pinned view)
    // must fail LOUDLY when the query mentions it — silently serving
    // whichever registered last would answer from the wrong table
    val views = scala.collection.mutable.Map
      .empty[String, List[(String, Option[SemVer])]]
    datasets().foreach { n =>
      val base = viewName(n, None)
      if (mentioned(base))
        views(base) = (n, None) :: views.getOrElse(base, Nil)
      versions(n).foreach { v =>
        val pinned = viewName(n, Some(v))
        if (mentioned(pinned))
          views(pinned) = (n, Some(v)) :: views.getOrElse(pinned, Nil)
      }
    }
    views.foreach { case (vn, sources) =>
      require(sources.size == 1,
        s"ambiguous view name '$vn': " + sources.map {
          case (n, None) => s"dataset '$n'"
          case (n, Some(v)) => s"dataset '$n' version $v"
        }.mkString(" vs "))
      val (n, ver) = sources.head
      readDataset(n, ver).toDF.createOrReplaceTempView(vn)
    }
    spark.sql(query)
  }

  /** Per-file footer stats recorded at save time (empty when the version
    * predates stats harvesting or harvest failed). */
  // Parsed stats.json cache: version dirs are immutable once committed,
  // so an entry never goes stale — without it every readDatasetWhere /
  // pruneCount re-parses the whole file, a real cost once a catalog
  // holds thousands of versions. Bounded LRU; empty results are NOT
  // cached (stats.json lands just after meta.json at save — a reader in
  // that window must not pin "no stats" forever). Dataset delete/move
  // invalidate by name so a re-created dataset reads fresh.
  private val statsCacheMax = 256
  // value = (freshness token = stats.json mtime+size, parsed stats).
  // The token guards the cross-PROCESS hole instance-level invalidation
  // can't see: a dataset deleted and re-created by another Catalog
  // instance lands on the same name@version — serving the old envelopes
  // would silently drop rows from pruned reads. One metadata stat per
  // hit keeps the parse-once economics.
  private val statsCache =
    new java.util.LinkedHashMap[String, (String, Seq[FileStats.FileStat])](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Seq[FileStats.FileStat])])
          : Boolean =
        size() > statsCacheMax
    }
  /** Observability hook for the parse-once tests. */
  private[graft] var statsParses = 0L
  private def invalidateStats(name: String): Unit = statsCache.synchronized {
    statsCache.keySet.removeIf(_.startsWith(name + "@@"))
    bloomCache.synchronized {
      bloomCache.keySet.removeIf(_.startsWith(name + "@@"))
    }
    // the kept-files cache rides the same freshness token, whose
    // mtime-millis resolution has collision holes across a
    // delete+re-create at the same name@version — purge it with the rest
    keptCache.synchronized {
      keptCache.keySet.removeIf(_.startsWith(name + "@@"))
    }
    manifestCache.synchronized {
      manifestCache.keySet.removeIf(_.startsWith(name + "@@"))
    }
    // the census count guards pruning safety (keptFilesParquetTier
    // rejects partial/foreign indexes by census mismatch) — a stale
    // count across delete+re-create at the same name is the same
    // token-collision hole as keptCache above
    censusCache.synchronized {
      censusCache.keySet.removeIf(_.startsWith(name + "@@"))
    }
  }
  private def freshToken(p: Path): String =
    try s"${Files.getLastModifiedTime(p).toMillis}:${Files.size(p)}"
    catch { case _: java.io.IOException => "gone" }

  def fileStats(name: String, version: SemVer): Seq[FileStats.FileStat] =
    statsCache.synchronized {
      val key = s"$name@@$version"
      val p = vDir(name, version).resolve("stats.json")
      if (!Files.exists(p)) Seq.empty
      else {
        val tok = freshToken(p)
        val hit = statsCache.get(key)
        if (hit != null && hit._1 == tok) hit._2
        else {
          statsParses += 1
          val parsed =
            FileStats.fromJson(new String(Files.readAllBytes(p), "UTF-8"))
          statsCache.put(key, (tok, parsed))
          parsed
        }
      }
    }

  /** TRUE when `name@v` carries the parquet-table stats tier (the
    * many-file form) rather than inline stats.json — its own dir or a
    * zero-copy version's indexFrom pointer. */
  private[graft] def statsTierIsParquet(name: String, version: SemVer)
      : Boolean =
    !Files.exists(vDir(name, version).resolve("stats.json")) &&
      Files.isDirectory(statsDirOf(name, version))

  /** Column-restricted stats: the inline tier parses whole (small by
    * construction, cached) and the restriction is a no-op; the parquet
    * tier loads census rows plus only `wanted` columns — the driver
    * holds O(files × wanted) small entries, never the full index.
    * `wanted = Some(Nil)` loads census only; `None` loads everything
    * (observability hooks — avoid on the parquet tier's hot path). */
  private[graft] def fileStatsFor(name: String, version: SemVer,
                                  wanted: Option[Seq[String]])
      : Seq[FileStats.FileStat] = {
    val jsonP = vDir(name, version).resolve("stats.json")
    if (Files.exists(jsonP)) fileStats(name, version)
    else {
      val pdir = statsDirOf(name, version)
      if (!Files.isDirectory(pdir)) Seq.empty
      else {
        val key = s"$name@@$version@@" +
          wanted.map(_.sorted.mkString(",")).getOrElse("*")
        val tok = freshToken(pdir)
        val hit = statsCache.synchronized(Option(statsCache.get(key)))
        hit match {
          case Some((t, cached)) if t == tok => cached
          case _ =>
            // the index read is a Spark job — never under the cache lock
            val parsed = FileStats.readStatsIndex(spark, pdir.toString,
              wanted.map(_.sorted))
            statsCache.synchronized {
              statsParses += 1
              statsCache.put(key, (tok, parsed))
            }
            parsed
        }
      }
    }
  }

  /**
   * Data-skipping read: `readDatasetWhere(name, pred)` prunes whole files
   * whose footer min/max prove the predicate can't match (Delta-style
   * skipping on NON-partition columns — the biggest 100 TB read-path
   * lever after partition pruning), then applies the predicate to the
   * survivors. Conservative by construction: unsupported predicate
   * shapes, missing stats, or stats-less versions degrade to reading
   * every file, so the result ALWAYS equals `readDataset(...).filter`.
   */
  def readDatasetWhere(name: String, predicate: org.apache.spark.sql.Column,
                       version: Option[SemVer] = None): Chain = {
    val v = version.orElse(latestVersion(name))
      .getOrElse(throw new NoSuchElementException(s"dataset $name not found"))
    val full = readVersionData(name, v).filter(predicate)
    val df =
      resolvedCondition(full) match {
        case None => full
        case Some(pe) if statsTierIsParquet(name, v) && distributedPruneOn =>
          // parquet tier: the prune itself runs on the executors; only
          // kept file names reach the driver
          keptFilesParquetTier(name, v, pe) match {
            case Some((kept, total)) =>
              if (kept.size.toLong == total || kept.isEmpty) full
              else readSelected(name, v, kept, predicate)
            case None => full
          }
        case Some(pe) =>
          // only the predicate's columns cross from the stats/bloom
          // indexes — on the inline tier (and the parity off-switch)
          // this keeps the driver load O(files × predicate cols)
          val stats = try fileStatsFor(name, v,
              Some(pe.references.map(_.name).toSeq))
            catch { case scala.util.control.NonFatal(_) =>
              Seq.empty[FileStats.FileStat] }
          if (stats.isEmpty) full
          else pruneWith(full, stats, pe, name, v, predicate)
      }
    Chain(df, OpTree.empty.append("read_dataset_where", name, v.toString))
  }

  private def pruneWith(full: DataFrame, stats: Seq[FileStats.FileStat],
                        pe: org.apache.spark.sql.catalyst.expressions.Expression,
                        name: String, v: SemVer,
                        predicate: org.apache.spark.sql.Column)
      : DataFrame = {
          val blooms = fileBlooms(name, v,
            Some(pe.references.map(_.name).toSeq))
          val kept = stats.filter(f =>
            FileStats.mayMatch(pe, f, blooms.getOrElse(f.file, Map.empty)))
          if (kept.size == stats.size || kept.isEmpty)
            // nothing pruned, or nothing survives (read the dir anyway
            // for the schema; the filter returns zero rows)
            full
          else readSelected(name, v, kept.map(_.file), predicate)
  }

  /** Read exactly `files` (version-relative) of `name@v` with the
    * recorded types restored, then apply `predicate` — the shared tail
    * of the driver and distributed pruning paths ([[readVersionFiles]]
    * resolves manifest owners and keeps hive partition columns alive
    * via per-owner basePaths). */
  private def readSelected(name: String, v: SemVer,
                           files: Seq[String],
                           predicate: org.apache.spark.sql.Column)
      : DataFrame =
    readVersionFiles(name, v, files).filter(predicate)

  // Distributed-prune result cache: (version, predicate, columns) →
  // (kept files, census total). Same freshness-token discipline as
  // statsCache; values are O(kept) path strings. The key uses the
  // COMPILED predicate's rendering — stable across analyses, where the
  // Catalyst tree's toString carries fresh expr-ids per query.
  private val keptCacheMax = 64
  private val keptCache =
    new java.util.LinkedHashMap[String, (String, (Seq[String], Long))](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, (Seq[String], Long))])
          : Boolean = size() > keptCacheMax
    }

  /** TRUE unless `graft.stats.distributedPrune` (default on) disables the
    * executor-side pruning path — the off switch exists for the parity
    * tests and as an operational escape hatch. */
  private def distributedPruneOn: Boolean =
    spark.conf.get("graft.stats.distributedPrune", "true").toBoolean

  /**
   * Parquet-tier pruning without materializing the index on the driver:
   * compiles `pe` to the serializable [[FileStats.PPred]], evaluates the
   * envelope/bloom test as a cogroup over the stats/ (+ blooms/) index
   * tables on the EXECUTORS, and collects only the kept file names —
   * O(kept) driver memory where the collect path is O(files × columns).
   * Returns (kept files, census total); None degrades to a full scan
   * (corrupt/unreadable index — stats are an optimization, never a
   * correctness dependency).
   */
  private def keptFilesParquetTier(name: String, v: SemVer,
      pe: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[(Seq[String], Long)] = {
    val pdir = statsDirOf(name, v)
    try {
      val refs = pe.references.map(_.name).toSeq.distinct.sorted
      val cp = FileStats.compile(pe)
      val key = s"$name@@$v@@kept@@${refs.mkString(",")}@@$cp"
      val tok = freshToken(pdir)
      val hit = keptCache.synchronized(Option(keptCache.get(key)))
      val res = hit match {
        case Some((t, r)) if t == tok => r
        case _ =>
          // bloom tier: inline blooms.json broadcasts as a map (small by
          // its own tier's construction), a blooms/ table joins by file
          val bj = vDir(name, v).resolve("blooms.json")
          val bd = bloomsDirOf(name, v)
          val inline =
            if (Files.exists(bj)) fileBlooms(name, v, Some(refs))
            else Map.empty[String, Map[String, Array[Byte]]]
          val bloomDir =
            if (!Files.exists(bj) && Files.isDirectory(bd)) Some(bd.toString)
            else None
          // kept names AND the census total come back from ONE pass
          // over the index (the second scan per pruned read is gone)
          val r = FileStats.prunedFilesDistributed(spark, pdir.toString,
            bloomDir, inline, cp, refs)
          keptCache.synchronized(keptCache.put(key, (tok, r)))
          r
      }
      // stats pruning is only safe when the index covers EVERY data
      // file (unlike blooms it is not conservative for missing files —
      // a pruned read would silently drop every row of an unindexed
      // file). A census mismatch with the manifest means a partial or
      // foreign index: degrade to the unpruned path.
      if (res._2 == censusCountOf(name, v)) Some(res) else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // per-version data-file count, cached: manifest versions read it from
  // the (cached) manifest, but a SELF-CONTAINED version's count is a
  // recursive dir walk — without the cache every pruned read of a
  // 100k-file version would pay that walk, even on keptCache hits.
  // Committed versions are immutable (vacuum touches only tombstoned
  // pools), so the meta.json freshness token is a sufficient key.
  private val censusCacheMax = 64
  private val censusCache =
    new java.util.LinkedHashMap[String, (String, Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Long)]): Boolean =
        size() > censusCacheMax
    }

  private def censusCountOf(name: String, v: SemVer): Long =
    manifestOf(name, v) match {
      case Some(m) => m.entries.size.toLong
      case None => censusCache.synchronized {
        val key = s"$name@@$v"
        val tok = freshToken(vDir(name, v).resolve("meta.json"))
        val hit = censusCache.get(key)
        if (hit != null && hit._1 == tok) hit._2
        else {
          val n = walkParquet(vDir(name, v).resolve("data")).size.toLong
          censusCache.put(key, (tok, n))
          n
        }
      }
    }

  /** Per-file bloom index recorded at save time with `bloomCols` (empty
    * when the version has none). file → column → serialized filter.
    * `wanted` restricts a parquet-indexed version's load to just those
    * columns (the predicate's references) — inline blooms.json versions
    * are small by construction and load whole. */
  // Bloom-index cache: without it every pruned read re-reads and decodes
  // the whole inline blooms.json, or — worse, on the parquet-index path —
  // launches a Spark job + driver collect per readDatasetWhere call.
  // Keyed by (version, wanted columns) with the same cross-process
  // freshness token as the stats cache; capacity stays small because the
  // values hold real bitmap bytes.
  private val bloomCacheMax = 32
  private val bloomCache =
    new java.util.LinkedHashMap[String, (String, Map[String, Map[String, Array[Byte]]])](
        16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (String, Map[String, Map[String, Array[Byte]]])])
          : Boolean =
        size() > bloomCacheMax
    }
  /** Observability hook mirroring [[statsParses]]. */
  private[graft] var bloomLoads = 0L

  def fileBlooms(name: String, version: SemVer,
                 wanted: Option[Seq[String]] = None)
      : Map[String, Map[String, Array[Byte]]] = bloomCache.synchronized {
    val p = vDir(name, version).resolve("blooms.json")
    val d = bloomsDirOf(name, version)
    val src =
      if (Files.exists(p)) p
      else if (Files.isDirectory(d)) d
      else return Map.empty
    val key = s"$name@@$version@@${wanted.map(_.sorted.mkString(",")).getOrElse("*")}"
    val tok = freshToken(src)
    val hit = bloomCache.get(key)
    if (hit != null && hit._1 == tok) hit._2
    else {
      bloomLoads += 1
      val loaded =
        if (src eq p)
          FileStats.bloomsFromJson(new String(Files.readAllBytes(p), "UTF-8"))
        else FileStats.readBloomIndex(spark, d.toString, wanted)
      bloomCache.put(key, (tok, loaded))
      loaded
    }
  }

  /** The ANALYZED filter condition of `df` — Column lambdas arrive as
    * lazy ColumnNode trees; running them through the analyzer against the
    * real scan yields typed Catalyst predicates (AttributeReference,
    * typed Literals, promote-casts) the stats evaluator understands. */
  private def resolvedCondition(df: DataFrame)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    df.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        // normalize literal-side promote-casts once, at the birthplace
        // of every pruning predicate (`longCol < 50` with an int
        // literal must prune like `< 50L`)
        FileStats.foldLiteralCasts(f.condition)
    }

  /** (files kept, files total) the skipping evaluator would read for
    * `predicate` — the observability hook the pruning tests pin. */
  def pruneCount(name: String, predicate: org.apache.spark.sql.Column,
                 version: Option[SemVer] = None): (Int, Int) = {
    val v = version.orElse(latestVersion(name))
      .getOrElse(throw new NoSuchElementException(s"dataset $name not found"))
    resolvedCondition(readVersionData(name, v).filter(predicate)) match {
      case Some(pe) if statsTierIsParquet(name, v) && distributedPruneOn =>
        keptFilesParquetTier(name, v, pe) match {
          case Some((kept, total)) => (kept.size, total.toInt)
          case None => (0, 0) // unreadable index ≡ stats-less version
        }
      case Some(pe) =>
        val refs = pe.references.map(_.name).toSeq
        val stats = try fileStatsFor(name, v, Some(refs))
          catch { case scala.util.control.NonFatal(_) =>
            Seq.empty[FileStats.FileStat] }
        val blooms = fileBlooms(name, v, Some(refs))
        (stats.count(f =>
          FileStats.mayMatch(pe, f, blooms.getOrElse(f.file, Map.empty))),
          stats.size)
      case None =>
        // census-only load: sizes without pulling column stats
        val stats = try fileStatsFor(name, v, Some(Nil))
          catch { case scala.util.control.NonFatal(_) =>
            Seq.empty[FileStats.FileStat] }
        (stats.size, stats.size)
    }
  }

  // ---- checkpoint index: hash → (name, version) without scanning metas ----
  // One append-only line per save; lookup is a single small-file read
  // instead of O(total versions) meta.json reads. Entries are validated
  // against the version dir on hit, so deletes need no index rewrite.

  private def ckptIndex: Path = Paths.get(root, "checkpoints.idx")

  private def appendCheckpointIndex(hash: String, name: String, v: SemVer): Unit =
    synchronized {
      Files.createDirectories(ckptIndex.getParent)
      Files.write(ckptIndex, s"$hash\t$name\tv$v\n".getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

  /** Load a saved version (latest when not given) as a Chain
    * (reference `read_dataset`, src/datachain/lib/dc/datasets.py:27). */
  def readDataset(name: String, version: Option[SemVer] = None): Chain = {
    val v = version.orElse(latestVersion(name))
      .getOrElse(throw new NoSuchElementException(s"dataset $name not found"))
    Chain(readVersionData(name, v),
      OpTree.empty.append("read_dataset", name, v.toString))
  }

  /** Version data with partition-type inference OFF and the RECORDED
    * schema's types restored: a hive-partitioned version's key column
    * round-trips with its saved type and exact directory values ("00"
    * stays the string "00" — inference would silently turn it into the
    * int 0 and lose the leading zero). Plain versions pass through
    * untouched (no partition columns, types already match). */
  private def readVersionData(name: String, v: SemVer): DataFrame =
    manifestOf(name, v) match {
      case Some(m) => readVersionFiles(name, v, m.entries.map(_.rel))
      case None => fullReadSchema(name, v) match {
        case Some(full) =>
          readWithSchema(vDir(name, v).resolve("data").toString, Nil, full)
        case None =>
          restoreTypes(readNoInfer(vDir(name, v).resolve("data").toString,
            Nil), name, v)
      }
    }

  /** TRUE when `name@v` committed a SCHEMA EXTENSION (some data files
    * predate a column — merge schema evolution, or any mutation chained
    * on top of one): reads must then supply the recorded schema
    * explicitly, so old files resolve columns by name and fill the new
    * ones with null instead of inferring a random file's footer. */
  private[graft] def isEvolved(name: String, v: SemVer): Boolean =
    try readMeta(name, v).contains("\"schema:evolved\"")
    catch { case scala.util.control.NonFatal(_) => false }

  /** The full on-read schema: recorded user schema + the sys struct.
    * Every version read prefers this explicit form — it resolves parquet
    * columns by name, parses hive partition values at their RECORDED
    * types (no inference, no session-conf flip, no restore cast), and is
    * immune to concurrent-session conf races. None only for legacy metas
    * without a recorded schema (the readNoInfer fallback). */
  private def fullReadSchema(name: String, v: SemVer)
      : Option[org.apache.spark.sql.types.StructType] =
    recordedSchema(name, v).map { rec =>
      import org.apache.spark.sql.types._
      StructType(rec.fields :+ StructField(Sys.ColName,
        StructType(Seq(StructField("id", LongType),
          StructField("rand", LongType)))))
    }

  /** [[fullReadSchema]] gated on the schema-evolution marker — kept for
    * call sites that must know evolution specifically. */
  private def explicitSchemaOf(name: String, v: SemVer)
      : Option[org.apache.spark.sql.types.StructType] =
    if (!isEvolved(name, v)) None else fullReadSchema(name, v)

  private def readWithSchema(path: String, files: Seq[String],
                             schema: org.apache.spark.sql.types.StructType)
      : DataFrame = {
    val r = spark.read.schema(schema)
    val df =
      if (files.isEmpty) r.parquet(path)
      else r.option("basePath", path).parquet(files: _*)
    // hive-partitioned relations move partition columns to the end of
    // the relation output regardless of the user schema's order — project
    // back to the RECORDED order so partitioned and flat versions read
    // identically (a pure reorder; column pruning still reaches the scan)
    // backtick-quote the names: a dot inside a TOP-LEVEL column name
    // (JSON-ingested keys) must not parse as nested-field access
    if (df.columns.sameElements(schema.fieldNames)) df
    else df.select(schema.fieldNames.map(n =>
        org.apache.spark.sql.functions.col(s"`${n.replace("`", "``")}`"))
      .toIndexedSeq: _*)
  }

  /** The JVM-wide [[ConfFlip]] guard: every session-global conf flip
    * (partition-inference off in [[readNoInfer]] and the bloom builder's
    * fallback, the packing targets in optimize/compactFiles) serializes
    * here — two concurrent flips would cross-restore (B captures A's
    * flipped value as its "previous" and the session ends permanently
    * mis-configured). Reentrant per thread. The main read path no longer
    * flips at all — [[fullReadSchema]] reads resolve with an explicit
    * schema — so contention is limited to legacy-meta fallbacks and
    * maintenance rewrites. */
  private def confFlipLock = ConfFlip.lock

  private def readNoInfer(path: String, files: Seq[String]): DataFrame =
    confFlipLock.synchronized {
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "false")
      // file-source relations resolve (incl. partition discovery) eagerly
      // inside read.parquet, so the scoped conf covers the inference
      try {
        if (files.isEmpty) spark.read.parquet(path)
        else spark.read.option("basePath", path).parquet(files: _*)
      } finally spark.conf.set(key, prev)
    }

  private def metaUnesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case o => sb += o; i += 2
        }
      } else { sb += ch; i += 1 }
    }
    sb.toString
  }

  /** The user schema recorded at save time (None when meta is missing or
    * predates schema recording). */
  def recordedSchema(name: String, version: SemVer)
      : Option[org.apache.spark.sql.types.StructType] =
    try {
      val meta = readMeta(name, version)
      "\"schema\": \"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(meta)
        .map(m => graft.schema.SignalSchema.fromJson(metaUnesc(m.group(1))))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def restoreTypes(df: DataFrame, name: String, v: SemVer)
      : DataFrame =
    recordedSchema(name, v) match {
      case Some(rec) =>
        // nullability is NOT a difference: parquet reads back nullable
        // while recorded schemas may carry NOT NULL marks — compare and
        // cast in the all-nullable form
        import org.apache.spark.sql.types._
        def denull(dt: DataType): DataType = dt match {
          case s: StructType => StructType(s.fields.map(f =>
            StructField(f.name, denull(f.dataType), nullable = true)))
          case a: ArrayType => ArrayType(denull(a.elementType), true)
          case m: MapType => MapType(denull(m.keyType), denull(m.valueType), true)
          case o => o
        }
        val types = rec.fields.map(f => f.name -> denull(f.dataType)).toMap
        if (df.schema.fields.forall(f =>
            types.get(f.name).forall(_ == denull(f.dataType)))) df
        else df.select(df.columns.map { c =>
          types.get(c) match {
            case Some(dt) if denull(df.schema(c).dataType) != dt =>
              col(c).cast(dt).as(c)
            case _ => col(c)
          }
        }: _*)
      case None => df
    }

  /**
   * Load by version specifier (reference version specifiers,
   * src/datachain/lib/dc/datasets.py + semver.py): exact `"1.2.3"`,
   * comparators `">=1.2.0"` / `">1.0"` / `"<=2"` / `"<2.0.0"`, caret
   * `"^1.2"` (same major), tilde `"~1.2"` (same major.minor). Picks the
   * LATEST version satisfying the spec.
   */
  /** Time travel by TIMESTAMP (the `TIMESTAMP AS OF` half beside
    * version specifiers): the newest version whose recorded `createdAt`
    * is at or before `asOf`. Metadata-only resolution (one meta read
    * per version of this dataset); throws if the dataset has no version
    * that old. */
  def readDatasetAsOf(name: String, asOf: java.time.Instant): Chain = {
    val vs = versions(name)
    require(vs.nonEmpty, s"unknown dataset: $name")
    val eligible = vs.filter { v =>
      "\"createdAt\": \"([^\"]+)\"".r.findFirstMatchIn(readMeta(name, v))
        .exists(m => !java.time.Instant.parse(m.group(1)).isAfter(asOf))
    }
    require(eligible.nonEmpty,
      s"$name has no version created at or before $asOf")
    readDataset(name, Some(eligible.last))
  }

  def readDatasetSpec(name: String, spec: String): Chain = {
    val v = resolveSpec(name, spec).getOrElse(throw new NoSuchElementException(
      s"dataset $name has no version matching '$spec' " +
        s"(available: ${versions(name).mkString(", ")})"))
    readDataset(name, Some(v))
  }

  /** Latest version of `name` satisfying `spec`; see [[readDatasetSpec]]. */
  def resolveSpec(name: String, spec: String): Option[SemVer] = {
    def pad(s: String): (SemVer, Int) = {
      val parts = s.trim.split('.')
      require(parts.nonEmpty && parts.length <= 3 &&
        parts.forall(_.forall(_.isDigit)), s"bad version in spec: $s")
      (SemVer(parts.head.toInt,
        if (parts.length > 1) parts(1).toInt else 0,
        if (parts.length > 2) parts(2).toInt else 0), parts.length)
    }
    val vs = versions(name)
    val t = spec.trim
    val pred: SemVer => Boolean = t match {
      case s if s.startsWith(">=") => v => v >= pad(s.drop(2))._1
      case s if s.startsWith("<=") => v => v <= pad(s.drop(2))._1
      case s if s.startsWith(">")  => v => v > pad(s.drop(1))._1
      case s if s.startsWith("<")  => v => v < pad(s.drop(1))._1
      case s if s.startsWith("^")  =>
        val (lo, _) = pad(s.drop(1)); v => v >= lo && v.major == lo.major
      case s if s.startsWith("~")  =>
        val (lo, _) = pad(s.drop(1))
        v => v >= lo && v.major == lo.major && v.minor == lo.minor
      case s =>
        val (exact, given) = pad(s)
        given match {
          case 3 => v => v == exact
          case 2 => v => v.major == exact.major && v.minor == exact.minor
          case _ => v => v.major == exact.major
        }
    }
    vs.filter(pred).lastOption
  }

  def readMeta(name: String, version: SemVer): String =
    new String(Files.readAllBytes(vDir(name, version).resolve("meta.json")), "UTF-8")

  /** Recorded row count of a saved version (from meta, no data scan). */
  def rowsOf(name: String, version: SemVer): Long =
    "\"rows\": (\\d+)".r.findFirstMatchIn(readMeta(name, version))
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalStateException(s"no rows in $name@v$version meta"))

  /** Remove a single version (rollback of a failed multi-save protocol
    * step; versions are otherwise immutable). ALWAYS two-phase: the
    * version is tombstoned (invisible to readers immediately) and its
    * bytes stay until the grace window passes — an immediate physical
    * delete would race a concurrent restore/clone/mutation that already
    * resolved its file census from the still-committed version and is
    * about to commit a manifest referencing these files (and a clone
    * into ANOTHER dataset holds a different commit lock, so no lock
    * here could close that window; only the grace period does, exactly
    * as vacuum argues). Matured pools of this dataset are swept on the
    * way out, so repeated deletes still reclaim space without a full
    * vacuum. */
  def deleteVersion(name: String, version: SemVer): Unit = {
    tombstone(name, version)
    sweepMaturedPools(name, liveRefs())
  }

  /** FILE-level liveness across every committed manifest in the
    * catalog (the reader view right now — tombstoned pools have no
    * manifest): per owning version, the set of referenced rels; plus
    * the versions some indexFrom pointer targets. Metadata scan: one
    * cached manifest read per committed version. */
  private def liveRefs()
      : (Map[(String, SemVer), Set[String]], Set[(String, SemVer)]) = {
    val files =
      scala.collection.mutable.Map.empty[(String, SemVer), Set[String]]
    val idx = scala.collection.mutable.Set.empty[(String, SemVer)]
    datasets().foreach { n =>
      versions(n).foreach { ov =>
        manifestOf(n, ov).foreach { m =>
          m.entries.foreach { e =>
            if ((e.ds, e.v) != ((n, ov)))
              files((e.ds, e.v)) =
                files.getOrElse((e.ds, e.v), Set.empty) + e.rel
          }
          m.indexFrom.foreach { ix => if (ix != ((n, ov))) idx += ix }
        }
      }
    }
    (files.toMap, idx.toSet)
  }

  /** The deps list EXACTLY as recorded — including non-dataset markers
    * (`stream@batchN`) that [[depsOf]]'s `name@vX.Y.Z` parse skips. */
  def rawDepsOf(name: String, version: SemVer): Seq[String] = {
    val meta = readMeta(name, version)
    "\"deps\": \\[(.*?)\\]".r.findFirstMatchIn(meta).toSeq.flatMap { m =>
      "\"([^\"]+)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
    }
  }

  /** Lineage deps (`name@vX.Y.Z`) recorded at save time for one version. */
  def depsOf(name: String, version: SemVer): Seq[(String, SemVer)] = {
    val meta = readMeta(name, version)
    "\"deps\": \\[(.*?)\\]".r.findFirstMatchIn(meta).toSeq.flatMap { m =>
      "\"([^\"]+)@v(\\d+\\.\\d+\\.\\d+)\"".r.findAllMatchIn(m.group(1))
        .map(d => (d.group(1), SemVer.parse(d.group(2)))).toSeq
    }
  }

  /**
   * Snapshot retention GC — the expire-snapshots/VACUUM maintenance pass
   * every snapshot-versioned table needs (without it, a daily-saved
   * dataset keeps every byte it ever wrote): keeps the newest `keepLast`
   * versions of every dataset PLUS, transitively, any version a kept
   * version's recorded lineage depends on — deleting a dep would break
   * `readDataset` reproducibility for a survivor, so lineage always wins
   * over the retention count. Returns the deleted (name, version) pairs
   * (`dryRun = true` reports the victims without deleting — audit first).
   * Cost model: metadata-only reads (one meta.json per PROTECTED
   * version for the dep closure), then per-victim directory deletes — no
   * data file is ever read.
   */
  def vacuum(keepLast: Int = 2, dryRun: Boolean = false): Seq[(String, SemVer)] = {
    require(keepLast >= 1, "keepLast must be at least 1")
    val all = datasets().map(n => n -> versions(n)).toMap
    val seed = all.toSeq.flatMap { case (n, vs) =>
      vs.takeRight(keepLast).map(n -> _)
    }
    val protect = scala.collection.mutable.Set.empty[(String, SemVer)]
    val queue = scala.collection.mutable.Queue.empty[(String, SemVer)]
    seed.foreach { s => protect += s; queue += s }
    while (queue.nonEmpty) {
      val (n, v) = queue.dequeue()
      depsOf(n, v).foreach { d =>
        // SAME-dataset deps (a cow mutation's / optimize's / restore's
        // parent-version link) are PROVENANCE, not liveness: the
        // FILE-level manifest refcount below keeps exactly the carried
        // bytes a surviving child references, so deleting an ancestor
        // VERSION never breaks it — while following these links would
        // make every mutation trail immortal (unbounded storage on a
        // daily-mutated 100 TB table). Retention (keepLast) governs a
        // dataset's own history; the closure protects only
        // CROSS-dataset lineage (derived pins its source).
        val exists = d._1 != n && all.get(d._1).exists(_.contains(d._2))
        if (exists && !protect(d)) { protect += d; queue += d }
      }
    }
    val victims = all.toSeq.sortBy(_._1).flatMap { case (n, vs) =>
      vs.filterNot(v => protect((n, v))).map(n -> _)
    }
    // dryRun reports what WOULD go — the audit step before a destructive
    // pass over someone's catalog
    if (!dryRun) {
      // TWO-PHASE retirement (the Delta/Iceberg retention-window
      // discipline). Phase 1 — TOMBSTONE: every victim loses its
      // meta.json (invisible to readers) and becomes a FILE POOL whose
      // bytes all stay. Phase 2 — PRUNE, only for pools retired at
      // least [[Catalog.vacuumGraceMs]] ago: delete the files no
      // committed manifest references (plus index dirs nothing
      // indexFrom-points at), and the whole dir once nothing is
      // referenced. The grace window is what makes the liveness scan
      // sound against CONCURRENT commits: a restore/clone/mutation
      // racing phase 1 resolved its references from a then-committed
      // version; by the time its owner files could be pruned, its own
      // manifest has been visible for the whole grace period and pins
      // them. (Residual: a single commit stalled LONGER than the grace
      // period can still lose referenced files — set the grace above
      // any plausible commit wall, as Delta documents for its
      // retention check.)
      victims.foreach { case (n, v) => tombstone(n, v) }
      // liveness at PRUNE time (computed lazily — most vacuums
      // tombstone fresh victims and find no matured pool to prune)
      lazy val live = liveRefs()
      all.keys.toSeq.sorted.foreach(n => sweepMaturedPools(n, live))
      sweepTempDirs()
    }
    victims
  }

  /** Prune every GRACE-MATURED pool dir of dataset `n` (phase 2 of
    * retirement, shared by [[vacuum]] and [[deleteVersion]]); `live`
    * is the catalog-wide manifest refcount, evaluated at most once and
    * only if a matured pool actually exists. */
  private def sweepMaturedPools(n: String,
      live: => (Map[(String, SemVer), Set[String]], Set[(String, SemVer)]))
      : Unit = {
    lazy val (liveFiles, liveIdx) = live
    val cutoff = System.currentTimeMillis() - Catalog.vacuumGraceMs
    listDir(dsDir(n))
      .filter(p => Files.exists(p.resolve(".pool")))
      .foreach { p =>
        val pv = SemVer.parse(p.getFileName.toString.drop(1))
        if (Files.exists(p.resolve("meta.json"))) {
          // a crash between the marker and the meta delete left a
          // COMMITTED version wearing a pool marker — it may be
          // protected again by now; resurrect it, never prune it
          Files.deleteIfExists(p.resolve(".pool"))
        } else {
          val matured =
            try Files.getLastModifiedTime(p.resolve(".pool"))
              .toMillis <= cutoff
            catch { case _: java.io.IOException => false }
          if (matured)
            prunePool(n, pv,
              liveFiles.getOrElse((n, pv), Set.empty),
              liveIdx((n, pv)))
        }
      }
  }

  /** Phase 1 of retirement: mark the dir as a pool (`.pool` mtime is
    * the retirement clock — created once, never refreshed) and drop
    * the reader-visible metadata. Every data byte stays until the
    * grace period passes. The marker lands BEFORE the meta delete so a
    * crash leaves either a still-committed version (the sweep
    * resurrects it) or a recognizable pool — never an anonymous
    * headless dir. */
  private def tombstone(name: String, v: SemVer): Unit = {
    invalidateStats(name)
    val d = vDir(name, v)
    if (!Files.exists(d)) return
    try Files.createFile(d.resolve(".pool"))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    Seq("meta.json", "manifest.json", "stats.json", "blooms.json")
      .foreach(f => Files.deleteIfExists(d.resolve(f)))
  }

  /** Phase 2: shrink a matured pool to the files/indexes committed
    * manifests still reference; a fully unreferenced pool is deleted
    * whole (its version number stays unreclaimable while newer dirs
    * exist — claimVersion bumps past every claimed dir). */
  private def prunePool(name: String, v: SemVer,
                        keepRels: Set[String], keepIdx: Boolean): Unit = {
    invalidateStats(name)
    val d = vDir(name, v)
    if (!Files.exists(d)) return
    if (keepRels.isEmpty && !keepIdx) { deleteTree(d); return }
    if (!keepIdx) {
      deleteTree(d.resolve("stats"))
      deleteTree(d.resolve("blooms"))
    }
    val dataDir = d.resolve("data")
    walkParquet(dataDir).foreach { f =>
      if (!keepRels(dataDir.relativize(f).toString)) Files.delete(f)
    }
    // sweep now-empty partition subdirs (deepest first), keeping data/
    if (Files.isDirectory(dataDir)) {
      val w = Files.walk(dataDir)
      val dirs = try w.iterator.asScala.filter(Files.isDirectory(_))
        .toSeq.reverse finally w.close()
      dirs.filterNot(_ == dataDir).foreach { sub =>
        if (listDir(sub).isEmpty)
          try Files.delete(sub) catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Age of a staging tree = the NEWEST mtime under it, not the dir's
    * own (set at creation and never refreshed while parquet parts
    * stream into data/) — a save still writing after the age bar must
    * not read as stale. A concurrent save can rename/delete the tree
    * mid-walk; a vanished or unreadable tree reads as fresh
    * (Long.MaxValue) so one racing dir never aborts a sweep or scan. */
  private def newestMtimeUnder(p: java.nio.file.Path): Long =
    try {
      val walk = Files.walk(p)
      try walk.iterator.asScala
        .map(q => Files.getLastModifiedTime(q).toMillis)
        .foldLeft(Long.MinValue)(math.max)
      finally walk.close()
    } catch {
      case _: java.io.IOException | _: java.io.UncheckedIOException =>
        Long.MaxValue
    }

  /** Remove save-protocol temp dirs older than an hour — debris of
    * writers that crashed between the parquet write and the version
    * claim. The age guard keeps a concurrent in-flight save's temp dir
    * safe; claimed-but-incomplete VERSION dirs (no meta.json) stay, they
    * hold a version number a retry must not reuse. */
  def sweepTempDirs(maxAge: java.time.Duration = java.time.Duration.ofHours(1))
      : Seq[String] = {
    val cutoff = System.currentTimeMillis() - maxAge.toMillis
    datasets().flatMap { n =>
      // a concurrent deleteDataset can remove dsDir(n) after datasets()
      // enumerated it — listDir reads a vanished dataset as empty, so
      // the sweep skips it instead of aborting
      listDir(dsDir(n))
        .filter(p => p.getFileName.toString.startsWith(".tmp-") &&
          newestMtimeUnder(p) < cutoff)
        .flatMap { p =>
          try {
            Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.delete)
            Some(s"$n/${p.getFileName}")
          } catch {
            case _: java.io.IOException | _: java.io.UncheckedIOException =>
              None // raced with its owner finishing the claim — leave it
          }
        }
    }
  }

  def deleteDataset(name: String): Unit = {
    // another dataset's live manifest referencing this one's files
    // (a clone, or a derived zero-copy version) would silently lose
    // rows if the bytes vanished under it — refuse; delete or
    // materialize (optimize) the referencing dataset first
    val refs = datasets().filter(_ != name).flatMap { o =>
      versions(o).filter { v =>
        manifestOf(o, v).exists(m =>
          m.indexFrom.exists(_._1 == name) || m.entries.exists(_.ds == name))
      }.map(v => s"$o@v$v")
    }
    require(refs.isEmpty,
      s"deleteDataset($name): files are still referenced by " +
        s"${refs.take(3).mkString(", ")}" +
        (if (refs.size > 3) s" (+${refs.size - 3} more)" else ""))
    invalidateStats(name)
    val d = dsDir(name)
    if (Files.exists(d)) {
      Files.walk(d).iterator.asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  /** Rename a dataset, all versions included (reference `move_dataset`,
    * src/datachain/lib/dc/datasets.py). Metadata is patched so the stored
    * name matches; the data files never move byte-wise beyond the dir
    * rename (an O(1) metadata operation on any real FS). */
  def moveDataset(from: String, to: String): Unit = {
    invalidateStats(from)
    requireValidName(to)
    require(Files.isDirectory(dsDir(from)), s"dataset $from not found")
    // an aborted writer can leave an empty footprint dir (known debris
    // class — the save protocol tolerates it too): reclaim it when its
    // only content is a NOT-freshly-held lock, so a ghost dir doesn't
    // block the name forever
    if (Files.isDirectory(dsDir(to)) && versions(to).isEmpty) {
      val entries = listDir(dsDir(to))
      val onlyLock = entries.forall(
        _.getFileName.toString == ".commit.lock")
      if (onlyLock) {
        try {
          // steal a STALE-only lock via breakCommitLock's ATOMIC_MOVE
          // grave — a plain staleness-checked delete could race a
          // writer just creating dataset `to` and remove its FRESH
          // lock, admitting its commit section unserialized; a fresh
          // lock throws here (require) and the reclaim backs off
          if (entries.nonEmpty) breakCommitLock(to)
          Files.deleteIfExists(dsDir(to))
        } catch {
          case _: java.io.IOException => ()
          case _: IllegalArgumentException => () // fresh lock: live writer
          case _: IllegalStateException => () // stat error: back off too
        }
      }
    }
    require(!Files.exists(dsDir(to)), s"dataset $to already exists")
    Files.createDirectories(dsDir(to).getParent)
    // under the source's commit lock: an in-flight writer either commits
    // before the move (its version travels) or reaches its own commit
    // section after it — where the guard check sees an empty version
    // list at the OLD name and aborts with ConcurrentMutationException
    // instead of a torn half-write into a vanished directory
    withCommitLock(from) {
      Files.move(dsDir(from), dsDir(to))
      versions(to).foreach { v =>
        val patched = readMeta(to, v).replaceFirst(
          "\"name\": \"" + java.util.regex.Pattern.quote(esc(from)) + "\"",
          java.util.regex.Matcher.quoteReplacement(
            "\"name\": \"" + esc(to) + "\""))
        Files.write(vDir(to, v).resolve("meta.json"),
          patched.getBytes("UTF-8"), StandardOpenOption.TRUNCATE_EXISTING)
      }
      // manifests name their physical owners BY DATASET — every live
      // manifest referencing `from` (the moved dataset's own restore
      // trails, and any clone of it elsewhere) must follow the rename
      // or its reads break. Metadata-only: one rewrite per manifest
      // that actually mentions the old name.
      rewriteManifestOwner(from, to)
      // the held lock file traveled with the directory, serializing
      // writers that discover the NEW name until the meta patch above
      // is complete — drop the carried copy LAST (the finally deletes
      // only the old path, which no longer exists)
      Files.deleteIfExists(dsDir(to).resolve(".commit.lock"))
    }
  }

  /** Rename dataset `from` → `to` inside every committed manifest of
    * the catalog (the [[moveDataset]] fix-up). Owners serialize at the
    * line head as `{"d": "<ds>@v` — a safe structural match (`esc`
    * leaves `@` alone and dataset names cannot contain quotes). Each
    * rewrite lands as temp-write + ATOMIC_MOVE: a committed manifest
    * must never be observable (or survivable after a crash) in a
    * truncated state — a partial parse would silently drop owner
    * groups and lose rows from reads. */
  private def rewriteManifestOwner(from: String, to: String): Unit = {
    val needle = "\"d\": \"" + esc(from) + "@v"
    val repl = "\"d\": \"" + esc(to) + "@v"
    val ixNeedle = "\"indexFrom\": \"" + esc(from) + "@v"
    val ixRepl = "\"indexFrom\": \"" + esc(to) + "@v"
    datasets().foreach { n =>
      versions(n).foreach { v =>
        val p = manifestPath(n, v)
        if (Files.exists(p)) {
          val s = new String(Files.readAllBytes(p), "UTF-8")
          if (s.contains(needle) || s.contains(ixNeedle)) {
            val tmp = p.resolveSibling(
              s".manifest.json.tmp-${java.util.UUID.randomUUID}")
            Files.write(tmp,
              s.replace(needle, repl).replace(ixNeedle, ixRepl)
                .getBytes("UTF-8"),
              StandardOpenOption.CREATE_NEW)
            Files.move(tmp, p,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            invalidateStats(n)
          }
        }
      }
    }
  }

  // ---- namespaces (reference: src/datachain/lib/dc/namespaces.py) ----
  // Dataset full names are dot-paths "namespace.project.name"; a namespace
  // is a registered prefix. Registration is a marker file, so namespace ops
  // are metadata-only.

  private def nsFile(ns: String): Path = Paths.get(root, "namespaces", ns)

  def createNamespace(ns: String): Unit = {
    require(ns.nonEmpty && !ns.contains('/'), s"bad namespace: $ns")
    Files.createDirectories(nsFile(ns).getParent)
    if (!Files.exists(nsFile(ns))) Files.createFile(nsFile(ns))
  }

  def namespaces(): Seq[String] = {
    val d = Paths.get(root, "namespaces")
    val registered = listDir(d).map(_.getFileName.toString)
    val implied = datasets().filter(_.contains('.')).map(_.split('.').head)
    (registered ++ implied ++ Seq(Catalog.DefaultNamespace)).distinct.sorted
  }

  def deleteNamespace(ns: String): Unit = {
    require(ns != Catalog.DefaultNamespace, s"namespace $ns is reserved")
    require(!datasets().exists(_.startsWith(ns + ".")),
      s"namespace $ns still has datasets")
    require(listProjects(Some(ns)).isEmpty, s"namespace $ns still has projects")
    Files.deleteIfExists(nsFile(ns))
  }

  // ---- projects (reference: src/datachain/project.py,
  // data_storage/metastore.py:860-1003) ----
  // A project lives inside a namespace; dataset full names are
  // "namespace.project.name". The default project is local.local (reference
  // Project.default/Namespace.default); "listing" is where bucket-listing
  // datasets land. Registration is one small JSON per project — metadata
  // only, no data movement, safe on any Hadoop FS.

  private def projFile(ns: String, name: String): Path =
    Paths.get(root, "projects", ns, name + ".json")

  private def validIdent(s: String): Boolean =
    s.nonEmpty && !s.contains('.') && !s.contains('@') && !s.contains('/') &&
      !s.contains('\\')

  /** Register a project (idempotent). Reference `create_project`
    * (src/datachain/data_storage/metastore.py:860). Reserved names
    * ("local", "listing") may only be created through [[getProject]]'s
    * auto-create, mirroring the reference's validate-then-autocreate split
    * (project.py:24-37, metastore.py:912-915). */
  def createProject(ns: String, name: String, descr: String = ""): Project = {
    require(validIdent(ns), s"bad namespace name: '$ns'")
    require(validIdent(name), s"bad project name: '$name'")
    require(name != Catalog.DefaultProject && name != Catalog.ListingProject,
      s"project name $name is reserved")
    createProjectUnchecked(ns, name, descr)
  }

  private def createProjectUnchecked(ns: String, name: String, descr: String): Project = {
    createNamespace(ns)
    val f = projFile(ns, name)
    Files.createDirectories(f.getParent)
    if (!Files.exists(f)) {
      val createdAt = java.time.Instant.now.toString
      val json =
        s"""{"namespace": "${esc(ns)}", "name": "${esc(name)}", """ +
          s""""descr": "${esc(descr)}", "createdAt": "$createdAt"}"""
      Files.write(f, json.getBytes("UTF-8"), StandardOpenOption.CREATE)
    }
    readProject(ns, name)
  }

  private def readProject(ns: String, name: String): Project = {
    val meta = new String(Files.readAllBytes(projFile(ns, name)), "UTF-8")
    def field(k: String): String =
      ("\"" + k + "\": \"([^\"]*)\"").r.findFirstMatchIn(meta)
        .map(_.group(1)).getOrElse("")
    Project(ns, name, field("descr"), field("createdAt"))
  }

  /** Fetch a project; auto-creates the default ("local.local") and
    * "listing" projects on first touch (reference metastore.py:912-915). */
  def getProject(ns: String, name: String): Project = {
    if (!Files.exists(projFile(ns, name))) {
      val autoCreate = ns == Catalog.DefaultNamespace &&
        (name == Catalog.DefaultProject || name == Catalog.ListingProject)
      if (autoCreate) return createProjectUnchecked(ns, name, "")
      throw new NoSuchElementException(s"project $ns.$name not found")
    }
    readProject(ns, name)
  }

  /** Projects in one namespace, or all (reference `list_projects`,
    * metastore.py:966). Includes projects implied by existing
    * fully-qualified dataset names. */
  def listProjects(ns: Option[String] = None): Seq[Project] = {
    val d = Paths.get(root, "projects")
    val registered: Seq[(String, String)] =
      listDir(d).filter(Files.isDirectory(_)).flatMap { nsDir =>
        listDir(nsDir)
          .filter(_.getFileName.toString.endsWith(".json"))
          .map(f => (nsDir.getFileName.toString,
            f.getFileName.toString.stripSuffix(".json")))
      }
    val implied = datasets().map(_.split('.')).collect {
      case Array(n, p, _) => (n, p)
    }
    (registered ++ implied).distinct
      .filter { case (n, _) => ns.forall(_ == n) }
      .sortBy(identity)
      .map { case (n, p) =>
        if (Files.exists(projFile(n, p))) readProject(n, p)
        else Project(n, p, "", "")
      }
  }

  /** Remove a registered project; refuses while datasets still live under
    * it, and never removes the reserved defaults. */
  def deleteProject(ns: String, name: String): Unit = {
    require(!(ns == Catalog.DefaultNamespace && name == Catalog.DefaultProject),
      s"project $ns.$name is reserved")
    require(!datasets().exists(_.startsWith(s"$ns.$name.")),
      s"project $ns.$name still has datasets")
    Files.deleteIfExists(projFile(ns, name))
  }

  /** Split a dataset name into (namespace, project, short name), filling
    * defaults (reference `parse_dataset_name`, src/datachain/dataset.py:78):
    * "n" → local.local.n; "p.n" → local.p.n; "ns.p.n" as-is; more dots →
    * error. */
  def parseDatasetName(full: String): (String, String, String) = {
    require(full.nonEmpty, "dataset name cannot be empty")
    full.split('.') match {
      case Array(n) => (Catalog.DefaultNamespace, Catalog.DefaultProject, n)
      case Array(p, n) => (Catalog.DefaultNamespace, p, n)
      case Array(ns, p, n) => (ns, p, n)
      case _ => throw new IllegalArgumentException(s"invalid dataset name $full")
    }
  }

  /** Save into an explicit project; the stored name is the fully-qualified
    * dot-path, so every existing read/version API works on the result. */
  def saveIn(chain: Chain, ns: String, project: String, name: String,
             deps: Seq[String] = Seq.empty): SemVer = {
    require(validIdent(name), s"bad dataset short name: '$name'")
    getProject(ns, project) // must exist (or auto-create the defaults)
    save(chain, s"$ns.$project.$name", deps = deps)
  }

  /** Meta-chain over projects (reference `projects()` listing). */
  def projectsDF(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    listProjects(None).map(p => (p.namespace, p.name, p.descr, p.createdAt))
      .toDF("namespace", "name", "descr", "created_at")
  }

  /** Meta-chain over the catalog itself: one row per dataset version with
    * its recorded row count and creation time
    * (reference `datasets()`, src/datachain/lib/dc/datasets.py:523). */
  /** Lineage edges across the catalog: one row per recorded dep —
    * (dataset, version, dep_name, dep_version), the provenance graph
    * that `readDataset` reproducibility rests on and [[vacuum]]
    * protects. Metadata-only (one meta.json read per version). */
  def lineageDF(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    datasets().flatMap(n => versions(n).flatMap { v =>
      depsOf(n, v).map { case (dn, dv) =>
        (n, v.toString, dn, dv.toString)
      }
    }).toDF("dataset", "version", "dep_name", "dep_version")
  }

  /** Undo [[esc]]'s JSON string escaping. */
  // metaUnesc is the one decoder for strings esc() wrote — a regex-based
  // variant here silently turned 	 into the literal "u0009" and
  // updateDataset then persisted the corruption back into meta.json
  private def unesc(s: String): String = metaUnesc(s)

  /** (description, attrs) recorded at save time for one version. */
  def annotationsOf(name: String, version: SemVer): (String, Seq[String]) = {
    val meta = readMeta(name, version)
    val str = "((?:[^\"\\\\]|\\\\.)*)"
    val d = ("\"description\": \"" + str + "\"").r
      .findFirstMatchIn(meta).map(m => unesc(m.group(1))).getOrElse("")
    val a = "\"attrs\": \\[(.*?)\\]".r.findFirstMatchIn(meta).toSeq.flatMap {
      m => ("\"" + str + "\"").r.findAllMatchIn(m.group(1))
        .map(x => unesc(x.group(1))).toSeq
    }
    (d, a)
  }

  /**
   * Patch the recorded description/attrs of an existing version without a
   * new materialization (reference `update_dataset`,
   * src/datachain/lib/dc/datasets.py:423 — annotations are registry
   * metadata, not data, so editing them must not cost a version bump).
   * `None` leaves a field unchanged.
   */
  def updateDataset(name: String, version: Option[SemVer] = None,
                    description: Option[String] = None,
                    attrs: Option[Seq[String]] = None): Unit = {
    val v = version.orElse(latestVersion(name)).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val (d0, a0) = annotationsOf(name, v)
    val meta0 = readMeta(name, v)
    // versions written before annotations existed: seed the fields first
    val meta =
      if (meta0.contains("\"description\":")) meta0
      else meta0.replaceFirst("\"schema\":",
        java.util.regex.Matcher.quoteReplacement(
          "\"description\": \"\",\n  \"attrs\": [],\n  \"schema\":"))
    // square brackets inside attr values would defeat the bracket-bounded
    // patch below — cheap to forbid, annotations are tags not payloads
    attrs.foreach(_.foreach(a => require(!a.contains(']') && !a.contains('['),
      s"attr may not contain brackets: '$a'")))
    val patched = meta
      .replaceFirst("\"description\": \"(?:[^\"\\\\]|\\\\.)*\"",
        java.util.regex.Matcher.quoteReplacement(
          "\"description\": \"" + esc(description.getOrElse(d0)) + "\""))
      .replaceFirst("\"attrs\": \\[.*?\\]",
        java.util.regex.Matcher.quoteReplacement(
          "\"attrs\": " + attrs.getOrElse(a0)
            .map(a => "\"" + esc(a) + "\"").mkString("[", ",", "]")))
    atomicPatchMeta(name, v, patched)
  }

  /** Replace a committed version's meta.json atomically: write a sibling
    * temp file and ATOMIC_MOVE it into place. A plain CREATE+TRUNCATE
    * leaves a window where a crash or a concurrent reader (versions(),
    * annotationsOf from a live streaming sink) sees empty/partial JSON —
    * the same tmp-then-claim discipline every data writer here uses. */
  private def atomicPatchMeta(name: String, v: SemVer,
                              content: String): Unit = {
    val dir = vDir(name, v)
    val tmp = dir.resolve(s"meta.json.tmp-${java.util.UUID.randomUUID}")
    Files.write(tmp, content.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
    Files.move(tmp, dir.resolve("meta.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The copy-on-write op that produced a version ("delete", "update",
    * "merge", "append", "optimize_where", "auto_compact", ...) — None
    * for plain saves. Stream protocols use it to tell LAYOUT-ONLY
    * versions (row-identical repacks, Delta's dataChange=false) from
    * real mutations. */
  private[graft] def cowOpOf(name: String, version: SemVer): Option[String] =
    "\"chainHash\": \"cow-([a-z_]+)-".r
      .findFirstMatchIn(readMeta(name, version)).map(_.group(1))

  /** Append a lineage dep to an existing version's meta without a new
    * materialization — the vacuum-protection half of a metadata cursor
    * ([[graft.delta.MatView.refresh]] records its synced-from source
    * version this way, since its merge commits carry only the
    * version-chain dep). Idempotent; `dep` is `name@vX.Y.Z`. */
  private[graft] def addDep(name: String, version: SemVer,
                            dep: String): Unit = {
    require(!dep.contains(']') && !dep.contains('['),
      s"dep may not contain brackets: '$dep'")
    val cur = depsOf(name, version).map { case (n, v) => s"$n@v$v" }
    if (cur.contains(dep)) return
    val meta = readMeta(name, version)
    val patched = meta.replaceFirst("\"deps\": \\[.*?\\]",
      java.util.regex.Matcher.quoteReplacement(
        "\"deps\": " + (cur :+ dep).map(d => "\"" + esc(d) + "\"")
          .mkString("[", ",", "]")))
    atomicPatchMeta(name, version, patched)
  }

  /** `attrFilters`: reference `datasets(attrs=...)` — every filter must
    * match ([[attrMatches]] semantics: bare, name=value, name=*). */
  def datasetsDF(attrFilters: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def metaField(meta: String, key: String): Option[String] =
      ("\"" + key + "\": \"?([^\",]+)\"?").r.findFirstMatchIn(meta).map(_.group(1))
    datasets().flatMap(n => versions(n).map { v =>
      val meta = readMeta(n, v)
      val (descr, attrs) = annotationsOf(n, v)
      (n, v.toString,
        metaField(meta, "rows").map(_.toLong).getOrElse(-1L),
        metaField(meta, "createdAt").getOrElse(""),
        descr, attrs)
    }).filter { case (_, _, _, _, _, attrs) =>
      attrFilters.forall(attrMatches(attrs, _))
    }.toDF("name", "version", "rows", "created_at", "description", "attrs")
  }

  /**
   * Save unless an identical chain was already materialized: if a version
   * with the same chain hash exists, return it untouched — the reference's
   * checkpoint skip of `save()` calls on job re-runs
   * (reference: src/datachain/lib/dc/datachain.py:696-723).
   */
  def saveOrReuse(chain: Chain, name: String,
                  deps: Seq[String] = Seq.empty): (SemVer, Boolean) =
    findCheckpoint(chain.hash) match {
      case Some((n, v)) if n == name => (v, true)
      case _ => (save(chain, name, deps = deps), false)
    }

  /** Find a dataset version whose chain hash matches (checkpoint reuse).
    * Served from the append-only index; falls back to a full meta scan for
    * catalogs written before the index existed. */
  def findCheckpoint(chainHash: String): Option[(String, SemVer)] = {
    if (Files.exists(ckptIndex)) {
      val hit = Files.readAllLines(ckptIndex).asScala.iterator
        .map(_.split('\t'))
        .collectFirst {
          case Array(h, n, vs) if h == chainHash &&
            Files.exists(vDir(n, SemVer.parse(vs.drop(1))).resolve("meta.json")) =>
            (n, SemVer.parse(vs.drop(1)))
        }
      if (hit.isDefined) return hit
    }
    val scanned = datasets().iterator.flatMap { n =>
      versions(n).flatMap { v =>
        val meta = readMeta(n, v)
        if (meta.contains("\"chainHash\": \"" + chainHash + "\"")) Some((n, v))
        else None
      }
    }.nextOption()
    // self-heal: index pre-index-era hits so the next lookup is O(1)
    scanned.foreach { case (n, v) => appendCheckpointIndex(chainHash, n, v) }
    scanned
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def metaJson(m: VersionMeta): String = {
    val deps = m.deps.map(d => "\"" + esc(d) + "\"").mkString("[", ",", "]")
    val attrs = m.attrs.map(a => "\"" + esc(a) + "\"").mkString("[", ",", "]")
    s"""{
  "name": "${esc(m.name)}",
  "version": "${m.version}",
  "chainHash": "${m.chainHash}",
  "createdAt": "${m.createdAt}",
  "rows": ${m.rows},
  "deps": $deps,
  "description": "${esc(m.description)}",
  "attrs": $attrs,
  "schema": "${esc(m.schemaJson)}"
}"""
  }

  /**
   * Reference attr-match semantics
   * (src/datachain/lib/dataset_info.py:44-58 `has_attr`): a bare `"NLP"`
   * matches only the bare attr; `"loc=US"` matches that exact pair;
   * `"loc=*"` matches any attr named `loc` — valued OR bare (the
   * reference's wildcard test is `a.split("=")[0] == name`, which a bare
   * `loc` attr satisfies).
   */
  def attrMatches(attrs: Seq[String], query: String): Boolean =
    query.split("=", 2) match {
      case Array(_) => attrs.contains(query)
      case Array(n, "*") => attrs.exists(a => a.split("=", 2)(0) == n)
      case Array(n, v) => attrs.contains(s"$n=$v")
      case _ => false
    }
}
