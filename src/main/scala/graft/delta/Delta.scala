package graft.delta

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, SemVer}
import graft.core.Chain

/**
 * Delta + retry incremental recompute — the reference's batch-delta story
 * (reference: src/datachain/delta.py:239-391 `delta_retry_update`).
 *
 * Given a source chain, a transformation, and a previously saved result
 * version, a delta save:
 *   1. diffs the *current* source against the source snapshot used for the
 *      previous result (anti-join on `deltaOn` keys + `compare` cols),
 *   2. replays the transformation only on the changed rows,
 *   3. unions with the previous result rows that weren't re-derived,
 *   4. saves as a new version.
 * Retry modes (reference: src/datachain/delta.py:126-186 `_get_retry_chain`):
 *   - `retryOn = Some(errCol)`: re-process source rows whose previous-result
 *     row carries a non-empty error marker (`delta_retry="column"`),
 *   - `retryMissing = true`: re-process source rows whose keys are ABSENT
 *     from the previous result — rows a crashed/partial prior run never
 *     emitted (`delta_retry=True`).
 * Both overlap the regular changed-set; the union is deduplicated before
 * replay (the reference subtracts the diff chain for the same reason).
 *
 * At scale this is the classic incremental-batch pattern: the diff is one
 * null-safe anti-join (shuffle on the key), the replay touches only changed
 * partitions, and the union is a metadata concat.
 */
object Delta {

  final case class DeltaResult(version: SemVer, fullRecompute: Boolean,
                               changedRows: Long)

  /**
   * Operators that invalidate delta (whole-input semantics), mirroring
   * `delta_disabled` (reference: src/datachain/delta.py:27-45).
   */
  val DeltaDisabledOps: Set[String] =
    Set("group_by", "agg_udf", "union", "distinct", "merge")

  def deltaCompatible(chain: Chain): Boolean =
    !chain.ops.ops.exists(op => DeltaDisabledOps.contains(op.name))

  /** The ops `transform` appended on top of `in` — checked on the REAL
    * output chain (not a dry run), so a transform that branches on data
    * shape is still caught. */
  private def requireCompatible(in: Chain, out: Chain): Unit = {
    val appended = out.ops.ops.drop(in.ops.ops.length).map(_.name)
    require(!appended.exists(DeltaDisabledOps.contains),
      s"transformation contains delta-disabled ops " +
        s"(${appended.filter(DeltaDisabledOps.contains).mkString(",")} of " +
        s"${DeltaDisabledOps.mkString(",")})")
  }

  /**
   * Time-travel changeset between two saved versions of a dataset:
   * `diffVersions(cat, "docs", v1, v2)` returns v2's rows labeled
   * A/D/M/S relative to v1 (the reference's `compare` flow applied to the
   * catalog's immutable snapshots). Pure composition of `read_dataset` +
   * `diff`, so it is one full-outer join at any scale.
   */
  def diffVersions(catalog: Catalog, name: String,
                   from: SemVer, to: SemVer,
                   on: Seq[String], compare: Seq[String] = Seq.empty,
                   statusCol: String = "diff"): Chain = {
    def at(v: SemVer) =
      Chain(graft.core.Sys.drop(catalog.readDataset(name, Some(v)).toDF))
    at(to).diff(at(from), on = on, compare = compare,
      statusCol = Some(statusCol))
  }

  /**
   * Delta-style CHANGE DATA FEED between two saved versions: one row per
   * change labeled `_change_type` ∈ `insert` / `delete` /
   * `update_preimage` / `update_postimage` (the exact Delta CDF vocabulary,
   * so downstream consumers written against `table_changes()` port
   * unchanged). Inserts and update_postimage rows carry `to`'s values;
   * deletes and update_preimage rows carry `from`'s. Unchanged rows never
   * surface.
   *
   * One full-outer join over only the DIFFERING FILES at any scale: a
   * copy-on-write mutation hard-links untouched files into the new
   * version under the same version-relative name, so a file present in
   * both versions with the same size is byte-identical and provably
   * contributes no changes — the join reads just each side's unshared
   * files, making the feed O(churned files), never O(table) (a
   * one-file delete on a 100 TB table diffs one file pair). Versions
   * written by whole saves share no file names and degrade to the full
   * diff naturally; rows that merely MOVED files (OPTIMIZE / Z-ORDER
   * repacks) meet themselves on both sides and emit nothing. The M rows
   * fan out into their pre/post pair via a 2-element array explode,
   * never a second join. `on` must identify rows uniquely (the Delta CDF
   * contract). Composes with [[diffVersions]] (same key/compare
   * semantics) and with the copy-on-write mutations
   * ([[graft.catalog.Catalog.deleteWhere]] etc.), whose versions this
   * feed audits.
   */
  def readChanges(catalog: Catalog, name: String,
                  from: SemVer, to: SemVer,
                  on: Seq[String], compare: Seq[String] = Seq.empty,
                  typeCol: String = "_change_type"): Chain = {
    val have = catalog.versions(name)
    require(have.contains(from) && have.contains(to),
      s"readChanges: unknown version $from or $to of '$name' (have $have)")
    val fNew = catalog.versionDataFiles(name, to)
    val fOld = catalog.versionDataFiles(name, from)
    val shared = fNew.keySet.intersect(fOld.keySet)
      .filter(k => fNew(k) == fOld(k))
    val newerDf = graft.core.Sys.drop(
      catalog.readVersionSlice(name, to, (fNew.keySet -- shared).toSeq.sorted))
    val olderDf = graft.core.Sys.drop(
      catalog.readVersionSlice(name, from, (fOld.keySet -- shared).toSeq.sorted))
    val cols = newerDf.columns.toSeq
    val oldCols = olderDf.columns.toSet
    require(on.forall(k => cols.contains(k) && oldCols(k)),
      s"readChanges: keys ${on.mkString(",")} must exist in both versions")
    // a column the OLDER version predates (mergeInto schema evolution)
    // reads as null on the old side — the feed then reports the rows
    // that gained a value as updates, which is exactly what happened
    def rSide(c: String): org.apache.spark.sql.Column =
      if (oldCols(c)) col(s"r.$c")
      else lit(null).cast(newerDf.schema(c).dataType)
    // literal presence markers, NOT key-isNotNull: the <=> join matches
    // NULL keys to each other, and a null-keyed insert must still read
    // as an insert rather than a phantom update
    val newer = newerDf.withColumn("__lm", lit(true)).alias("l")
    val older = olderDf.withColumn("__rm", lit(true)).alias("r")
    val cmp = (if (compare.nonEmpty) compare
               else cols.filterNot(on.contains)).filter(cols.contains)
    val cond = on.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    val joined = newer.join(older, cond, "full_outer")
      .withColumn("__l", col("l.__lm").isNotNull)
      .withColumn("__r", col("r.__rm").isNotNull)
    val modifiedCond =
      if (cmp.isEmpty) lit(false)
      else cmp.map(c => !(col(s"l.$c") <=> rSide(c))).reduce(_ || _)
    val kinds = when(col("__l") && !col("__r"), array(lit("insert")))
      .when(!col("__l") && col("__r"), array(lit("delete")))
      .when(modifiedCond,
        array(lit("update_preimage"), lit("update_postimage")))
      .otherwise(array().cast("array<string>")) // S rows explode to nothing
    val exploded = joined.withColumn(typeCol, explode(kinds))
    val fromSide = col(typeCol) === "delete" ||
      col(typeCol) === "update_preimage"
    val out = exploded.select(cols.map(c =>
      when(fromSide, rSide(c)).otherwise(col(s"l.$c")).as(c)) :+
      col(typeCol): _*)
    Chain(out, graft.core.OpTree.empty
      .append("read_changes", name, from.toString, to.toString))
  }

  /**
   * Multi-hop change data feed: [[readChanges]] over every ADJACENT
   * version pair in `(from, to]`, each row stamped with the
   * `_commit_version` that produced it — Delta's `table_changes(tbl,
   * fromV, toV)` per-commit granularity, where the two-version
   * [[readChanges]] is the net view. One full-outer join per hop
   * (#versions bounded, each join is the usual one-exchange diff).
   */
  def readChangesRange(catalog: Catalog, name: String,
                       from: SemVer, to: SemVer,
                       on: Seq[String], compare: Seq[String] = Seq.empty,
                       typeCol: String = "_change_type"): Chain = {
    val vs = catalog.versions(name).filter(v => v >= from && v <= to)
    require(vs.headOption.contains(from) && vs.lastOption.contains(to) &&
      vs.size >= 2, s"bad version range $from..$to (have: $vs)")
    val hops = vs.sliding(2).map { case Seq(a, b) =>
      readChanges(catalog, name, a, b, on, compare, typeCol).toDF
        .withColumn("_commit_version", lit(b.toString))
    }.toSeq
    // by-name union with null-fill: hops that straddle a schema
    // evolution have different arities (pre-evolution hops lack the new
    // column) — a positional union would mis-zip or fail
    Chain(hops.reduce(_.unionByName(_, allowMissingColumns = true)),
      graft.core.OpTree.empty
        .append("read_changes_range", name, from.toString, to.toString))
  }

  /**
   * Incremental CDF EXPORT — the feed a downstream consumer actually
   * tails: every call appends the change rows of all versions committed
   * since the last sync to the catalog dataset `<name>__changes`
   * (columns = the table's + `_change_type` + `_commit_version`). Sync
   * state lives in LINEAGE, not a side file: each export version records
   * a dep on the source version it reached, so the next call resumes
   * from `depsOf(latest export)` — and vacuum keeps the synced-from
   * version alive while the export referencing it lives. The first sync
   * snapshots the current rows as `insert` changes (Delta's
   * startingVersion semantics). Returns the number of change rows
   * appended (0 = already in sync, no version written).
   */
  def syncChanges(catalog: Catalog, name: String, on: Seq[String],
                  compare: Seq[String] = Seq.empty): Long = {
    val changesName = s"${name}__changes"
    val latest = catalog.latestVersion(name).getOrElse(
      throw new NoSuchElementException(s"dataset $name not found"))
    val lastSynced = catalog.latestVersion(changesName).flatMap(v =>
      catalog.depsOf(changesName, v)
        .collectFirst { case (`name`, dv) => dv })
    val out: Option[Chain] = lastSynced match {
      case Some(lv) if lv == latest => None
      case Some(lv) =>
        Some(readChangesRange(catalog, name, lv, latest, on, compare))
      case None =>
        // first sync: the current state IS the change set
        Some(Chain(graft.core.Sys.drop(
            catalog.readDataset(name, Some(latest)).toDF)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(latest.toString))))
    }
    out match {
      case None => 0L
      case Some(chain) =>
        val v = catalog.save(chain, changesName,
          deps = Seq(s"$name@v$latest"), harvestStats = false)
        linkStreamExports(catalog, changesName)
        catalog.rowsOf(changesName, v)
    }
  }

  /** Hard-link every COMMITTED export version's data files into the
    * export's `_stream` dir (idempotent; called by [[syncChanges]] after
    * each commit and by [[changesStream]] at start to heal links a
    * crashed sync missed). The indirection exists because a raw
    * version-dir glob would also match a crashed save's
    * claimed-but-uncommitted data dir — linking only versions whose
    * meta.json committed keeps the stream equal to the batch
    * [[changesFeed]]. Links pin exported bytes past vacuum until the
    * export dataset itself is deleted (deliberate: a stream consumer
    * can always replay). */
  private def linkStreamExports(catalog: Catalog,
                                changesName: String): Unit = {
    import java.nio.file.{Files => JF, Paths => JP}
    val dir = JP.get(catalog.root, "datasets", changesName, "_stream")
    JF.createDirectories(dir)
    catalog.versions(changesName).foreach { v =>
      catalog.versionDataFiles(changesName, v).keysIterator.foreach { rel =>
        // resolveDataFile: a manifest version's bytes live under the
        // owning ancestor's dir, not its own
        linkIntoStream(dir,
          catalog.resolveDataFile(changesName, v, rel),
          s"v${v}__${rel.replace('/', '_')}")
      }
    }
  }

  /** Idempotent link-or-copy of one committed data file into a
    * `_stream` dir — the shared primitive of [[linkStreamExports]] and
    * [[linkDatasetStream]] (one naming scheme, one fallback chain). */
  private def linkIntoStream(dir: java.nio.file.Path,
                             src: java.nio.file.Path,
                             linkName: String): Unit = {
    import java.nio.file.{Files => JF}
    val dst = dir.resolve(linkName)
    if (!JF.exists(dst)) {
      try JF.createLink(dst, src)
      catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          try JF.copy(src, dst)
          catch {
            case _: java.nio.file.FileAlreadyExistsException => ()
          }
      }
    }
  }

  /** The full exported change history of `name`: every version of
    * `<name>__changes` unioned in commit order — what a consumer that
    * missed several syncs replays. Versions between two syncs that were
    * vacuumed before their sync collapse into net changes (documented
    * CDF-over-gaps semantics). */
  def changesFeed(catalog: Catalog, name: String): Chain = {
    val changesName = s"${name}__changes"
    val vs = catalog.versions(changesName)
    require(vs.nonEmpty, s"no changes exported yet for $name")
    Chain(vs.map(v => graft.core.Sys.drop(
        catalog.readDataset(changesName, Some(v)).toDF))
      .reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  /**
   * STREAMING tail of the exported change feed: a Structured Streaming
   * source over `<name>__changes`, where every [[syncChanges]] call's
   * export version surfaces as a new micro-batch — the consumer side of
   * CDC (Delta's `readStream.option("readChangeFeed")`). The file source
   * watches the export's `_stream` link dir, which [[syncChanges]]
   * populates only AFTER a version's meta.json commits — a raw
   * version-dir glob could replay a crashed save's claimed-but-
   * uncommitted data, which `versions()`/[[changesFeed]] would never
   * show. Schema is the latest export version's (earlier files that
   * predate an evolved column read null, matching [[changesFeed]]'s
   * by-name union). Run it once with AvailableNow to replay history, or
   * leave it running to follow future syncs.
   */
  def changesStream(catalog: Catalog, name: String)
      : org.apache.spark.sql.DataFrame = {
    val changesName = s"${name}__changes"
    val vs = catalog.versions(changesName)
    require(vs.nonEmpty,
      s"no changes exported yet for $name — run syncChanges first")
    linkStreamExports(catalog, changesName) // heal links a crash missed
    val latest = catalog.readDataset(changesName, Some(vs.last)).toDF
    val stream = latest.sparkSession.readStream
      .schema(latest.schema) // incl. the sys stamp; dropped below
      .parquet(s"${catalog.root}/datasets/$changesName/_stream")
    graft.core.Sys.drop(stream)
  }

  /**
   * Stream a catalog TABLE as a Structured Streaming source (Delta's
   * `spark.readStream.table(...)`): every committed version's NEW data
   * files surface as micro-batches — on an append-only table (saves +
   * [[graft.catalog.Catalog.append]] / the exactly-once sink) that is
   * exactly the table's rows, once each. A version that REWRITES or
   * REMOVES files (deleteWhere/update/merge/OPTIMIZE) breaks the
   * append-only contract and fails loudly unless `allowChanges = true`,
   * which takes Delta's `ignoreChanges` semantics verbatim: rewritten
   * files re-emit whole (their surviving rows appear again), deletions
   * never surface — downstream must tolerate duplicates. Same
   * committed-only `_stream` link protocol as [[changesStream]];
   * [[graft.streaming.EventStream]] `appendToDataset` heals the links
   * after each batch so a table-to-table streaming pipeline follows
   * live.
   */
  def datasetStream(catalog: Catalog, name: String,
                    allowChanges: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    val vs = catalog.versions(name)
    require(vs.nonEmpty, s"dataset $name not found")
    val policy = if (allowChanges) "ignorechanges" else "strict"
    linkDatasetStream(catalog, name, policy, failOnChange = !allowChanges)
    val latest = catalog.readDataset(name, Some(vs.last)).toDF
    val stream = latest.sparkSession.readStream
      .schema(latest.schema) // incl. the sys stamp; dropped below
      .parquet(s"${catalog.root}/datasets/$name/_stream/$policy")
    graft.core.Sys.drop(stream)
  }

  /** Layout-only cow ops (row-identical repacks — Delta's
    * dataChange=false): the table stream SKIPS their versions entirely,
    * so periodic [[graft.catalog.Catalog.autoCompact]] /
    * `optimizeWhere` maintenance never re-emits or stalls a follower.
    * (Full `optimize`/Z-ORDER commits as a fresh save and is NOT
    * detectable — run the partial forms on streamed tables.) */
  private val LayoutOnlyOps = Set("optimize_where", "auto_compact",
    "flatten")

  /** Link every committed version's new-vs-parent data files into the
    * dataset's per-policy `_stream/<policy>` link farm (strict and
    * ignoreChanges followers get independent farms — hard links cost
    * nothing, and the contracts can't contaminate each other), starting
    * from the farm's `_linked` high-water mark, so a heal after batch N
    * walks only the versions since the last heal, not the history. On a
    * REAL destructive version (not layout-only): `failOnChange` throws
    * (strict stream creation); a strict heal STOPS linking at the
    * boundary instead — the follower stalls safely rather than
    * receiving duplicate rows, and the next strict `datasetStream` call
    * reports the contract break loudly. */
  private def linkDatasetStream(catalog: Catalog, name: String,
                                policy: String,
                                failOnChange: Boolean): Unit = {
    import java.nio.file.{Files => JF, Paths => JP}
    val dir = JP.get(catalog.root, "datasets", name, "_stream", policy)
    JF.createDirectories(dir)
    val strict = policy == "strict"
    val markP = dir.resolve("_linked")
    val censusP = dir.resolve("_linked_census")
    val vs = catalog.versions(name)
    val markParsed =
      if (!JF.exists(markP)) None
      else scala.util.Try(SemVer.parse(
        new String(JF.readAllBytes(markP), "UTF-8").trim)).toOption
    // Resume point + baseline file set. When the marked version has been
    // VACUUMED (writer heals lagged behind the latest version, then
    // vacuum removed the mark's version), restarting from an empty prev
    // would re-link every carried file under a new version's prefix
    // beside its existing v<old>__rel link — a strict follower would
    // then re-read rows it already consumed. Instead: everything <= mark
    // was already linked, so resume AFTER the mark with prev seeded from
    // the farm's own links (each link is a hard link, so its size IS the
    // source file's identity; the newest version's link per rel wins).
    def parsedFarm(): Seq[(String, SemVer, Long)] = {
      val entries = {
        val s = JF.list(dir)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.toSeq
        finally s.close()
      }
      entries.filter(p => JF.isRegularFile(p))
        .flatMap { p =>
          val n = p.getFileName.toString
          val cut = n.indexOf("__")
          if (!n.startsWith("v") || cut < 0) None
          else scala.util.Try(SemVer.parse(n.substring(1, cut))).toOption
            .map(ver => (n.substring(cut + 2), ver, JF.size(p)))
        }
    }
    def farmLinks(): Map[String, Long] =
      parsedFarm()
        .groupBy(_._1)
        .map { case (rel, hits) => rel -> hits.maxBy(_._2)._3 }
    // A CORRUPT mark (exists but unparsable) self-heals from the farm:
    // links are version-prefixed and the walk is in-order, so the
    // newest linked version IS the durable mark ("everything <= it was
    // already linked"). Rewriting it immediately turns the corruption
    // into the ordinary mark/vacuumed-mark resume below — without this,
    // the newest-size farm seed makes OLD versions look like removals
    // and a strict heal stalls permanently on a one-off mark scribble.
    val mark = markParsed.orElse {
      if (!JF.exists(markP)) None
      else {
        val fromFarm = parsedFarm().map(_._2).sorted.lastOption
        fromFarm.foreach { v =>
          System.err.println(s"[graft] datasetStream: corrupt _linked " +
            s"mark for '$name'/$policy — self-healed to v$v from the " +
            "link farm")
          JF.write(markP, v.toString.getBytes("UTF-8"))
        }
        fromFarm
      }
    }
    val markIdx = mark.map(vs.indexOf).filter(_ >= 0)
    val (startIdx, prevInit) = markIdx match {
      case Some(i) => (i, catalog.versionDataFiles(name, vs(i)))
      case None if mark.isDefined =>
        // vacuumed mark: skip every surviving version below it (already
        // linked), walk only the versions past the mark. Baseline for
        // the removal check: the census SIDECAR written beside the mark
        // (the mark version's exact rel->size census, vacuum-independent).
        // The farm-link fallback (legacy dirs) conflates "repacked away
        // by a CONSUMED layout-only version" with "removed" — on an
        // append-only table that was auto-compacted it false-stalls a
        // strict heal forever; the sidecar removes that ambiguity.
        (vs.lastIndexWhere(_ < mark.get),
          readCensus(censusP, mark.get).getOrElse(farmLinks()))
      case None if JF.exists(markP) =>
        // unreadable mark but the farm was active: conservative — walk
        // everything, the farm seed dedups what's already linked
        (-1, farmLinks())
      case None => (-1, Map.empty[String, Long])
    }
    var prev = prevInit
    // vacuumed-mark resume keeps linkedTo None until a post-mark version
    // actually links: regressing the mark to the pre-mark survivor would
    // lose the "everything <= mark is linked" fact and a later heal
    // would re-link the vacuumed version's carried files
    var linkedTo = markIdx.map(vs(_))
    vs.drop(startIdx + 1).foreach { v =>
      val cur = catalog.versionDataFiles(name, v)
      require(cur.keysIterator.forall(!_.contains('/')),
        s"datasetStream: $name@v$v is hive-partitioned — partition " +
          "values live in directory names the flat stream can't carry; " +
          "stream the unpartitioned base or the change-feed export")
      if (catalog.cowOpOf(name, v).exists(LayoutOnlyOps)) {
        prev = cur // dataChange=false: row-identical, emit nothing
        linkedTo = Some(v)
      } else {
        val removed =
          prev.keySet.exists(k => !cur.get(k).contains(prev(k)))
        if (removed && strict) {
          require(!failOnChange,
            s"datasetStream: $name@v$v rewrote or removed files — not " +
              "an append-only table; pass allowChanges=true for " +
              "ignoreChanges semantics (rewritten files re-emit, " +
              "deletes never surface)")
          // heal under strict: stall BEFORE the mutation — never
          // duplicates; the mark stays put so the break re-surfaces
          writeMark(markP, censusP, linkedTo, prev)
          return
        }
        cur.keysIterator
          .filterNot(k => prev.get(k).contains(cur(k)))
          .foreach(rel => linkIntoStream(dir,
            catalog.resolveDataFile(name, v, rel),
            s"v${v}__${rel.replace('/', '_')}"))
        prev = cur
        linkedTo = Some(v)
      }
    }
    writeMark(markP, censusP, linkedTo, prev)
  }

  /** Advance the high-water mark + its census sidecar. The sidecar
    * (first line: the mark version; then `size\tREL` lines) is the
    * mark version's exact file census — the removal-check baseline
    * that survives the mark version being vacuumed. Census is written
    * FIRST: a crash between the writes leaves an old mark beside a
    * newer census, which the version tag detects (readCensus ignores
    * it); the reverse order would leave a vacuumed-mark resume
    * trusting a stale baseline. */
  private def writeMark(markP: java.nio.file.Path,
                        censusP: java.nio.file.Path,
                        to: Option[SemVer],
                        census: Map[String, Long]): Unit =
    to.foreach { v =>
      // entry-count trailer + temp-file ATOMIC_MOVE: a plain in-place
      // write could crash line-aligned-truncated with the version tag
      // intact, and readCensus would accept an incomplete baseline —
      // the vacuumed-mark resume would then re-link files already
      // emitted (duplicate rows to stream followers)
      val entries = census.toSeq.sortBy(_._1)
        .map { case (r, sz) => s"$sz\t$r" }
      val body = ((v.toString +: entries) :+ s"#n=${entries.size}")
        .mkString("\n")
      val tmp = censusP.resolveSibling(
        "." + censusP.getFileName + ".tmp-" + java.util.UUID.randomUUID)
      java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, censusP,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.write(markP, v.toString.getBytes("UTF-8"))
    }

  /** The census sidecar, iff present, parseable, and tagged with the
    * expected mark version (anything else — legacy farm, torn write —
    * reads as None and the caller falls back). */
  private def readCensus(censusP: java.nio.file.Path,
                         at: SemVer): Option[Map[String, Long]] =
    if (!java.nio.file.Files.exists(censusP)) None
    else scala.util.Try {
      val lines = new String(
        java.nio.file.Files.readAllBytes(censusP), "UTF-8")
        .split("\n").filter(_.nonEmpty)
      require(lines.head == at.toString, "census belongs to another mark")
      // completeness witness: the `#n=` trailer must match the entry
      // count (a legacy census without the trailer still parses — the
      // atomic writer above has stamped every census since it shipped)
      val (entries, trailer) = lines.tail.partition(!_.startsWith("#n="))
      trailer.headOption.foreach { t =>
        require(t == s"#n=${entries.length}", "census truncated")
      }
      entries.map { l =>
        val i = l.indexOf('\t')
        l.substring(i + 1) -> l.substring(0, i).toLong
      }.toMap
    }.toOption

  /** Re-link a table's `_stream` dir if one exists (a follower started
    * [[datasetStream]] at some point) — called by writers after a
    * commit so live followers see the new version; honors the dir's
    * recorded policy. No-op when nobody follows. */
  def healDatasetStream(catalog: Catalog, name: String): Unit =
    Seq("strict", "ignorechanges").foreach { p =>
      val dir = java.nio.file.Paths.get(catalog.root, "datasets", name,
        "_stream", p)
      if (java.nio.file.Files.isDirectory(dir))
        linkDatasetStream(catalog, name, p, failOnChange = false)
    }

  /**
   * Incremental save of `transform(source)` under `name`.
   *
   * `sourceSnapshotName` is the catalog dataset where each run persists its
   * source snapshot — the previous snapshot is what we diff against (the
   * Spark restatement of the reference's reliance on stored source
   * versions). First run = full compute.
   */
  def deltaSave(catalog: Catalog, source: Chain, name: String,
                deltaOn: Seq[String], compare: Seq[String],
                transform: Chain => Chain,
                retryOn: Option[String] = None,
                retryMissing: Boolean = false): DeltaResult = {
    val snapName = s"__src__$name"
    val prevSnap = catalog.latestVersion(snapName)
    val prevResult = catalog.latestVersion(name)
    // The snapshot exists only to answer "which keys changed?" next run —
    // the diff reads nothing but keys + comparators from it (deleted rows
    // are dropped, so right-side payloads never surface). Persisting only
    // those columns makes snapshot cost O(keys), not O(payload): at 100 TB
    // the snapshot of a wide media table is a few GB of keys+etags.
    def snapshot(): Chain =
      Chain(source.toDF.select((deltaOn ++ compare).distinct.map(col): _*))
    // Result and snapshot land in different (immutable) version dirs, so
    // the two write jobs are independent — submit them concurrently and the
    // scheduler overlaps them on idle cores instead of serializing two
    // small jobs (the dominant per-call latency at bench scale).
    def saveBoth(out: Chain, deps: Seq[String]): (SemVer, SemVer) = {
      val snapF = Future(catalog.save(snapshot(), snapName,
        harvestStats = false))
      val v =
        try catalog.save(out, name, deps = deps)
        catch { case e: Throwable =>
          // roll the concurrent snapshot back — a surviving newer snapshot
          // beside a stale result would make the next diff skip its changes
          try catalog.deleteVersion(snapName, Await.result(snapF, Duration.Inf))
          catch { case s: Throwable => e.addSuppressed(s) }
          throw e
        }
      (v, Await.result(snapF, Duration.Inf))
    }

    if (prevSnap.isEmpty || prevResult.isEmpty) {
      val out = transform(source)
      requireCompatible(source, out)
      val (v, snapV) = saveBoth(out, Seq(s"$snapName@full"))
      // row count comes from the snapshot save's own metadata — no extra scan
      return DeltaResult(v, fullRecompute = true,
        changedRows = catalog.rowsOf(snapName, snapV))
    }

    // sys columns are a materialization artifact — strip them before
    // diffing/unioning with the (unstamped) in-flight chains.
    val prev = Chain(graft.core.Sys.drop(
      catalog.readDataset(snapName, prevSnap).toDF))
    // Changed = rows of current source that are new or modified vs snapshot.
    val changed = source.diff(prev, on = deltaOn, compare = compare,
      added = true, modified = true, deleted = false, same = false)

    val prevOut = Chain(graft.core.Sys.drop(
      catalog.readDataset(name, prevResult).toDF))
    val retriedErr = retryOn match {
      case Some(errCol) =>
        // keys of previous-result rows with a non-empty error marker
        val errKeys = prevOut.toDF
          .filter(col(errCol).isNotNull && col(errCol) =!= "")
          .select(deltaOn.map(col): _*).distinct()
        source.toDF.join(errKeys, deltaOn, "left_semi")
      case None => source.toDF.limit(0)
    }
    // delta_retry=True: source keys the previous result never emitted
    // (reference delta.py:166-169 `source_dc.subtract(result_dataset, on)`)
    val retriedMissing =
      if (retryMissing) Chain(source.toDF).subtract(prevOut, on = deltaOn).toDF
      else source.toDF.limit(0)
    // The changed-set feeds three consumers (count, replay, anti-join) —
    // persist it so the diff's full-outer join runs once, not three times.
    val toProcessDF = changed.toDF
      .unionByName(retriedErr).unionByName(retriedMissing)
      .distinct().persist()
    try {
      val toProcess = Chain(toProcessDF)
      val nChanged = toProcessDF.count()

      if (nChanged == 0) {
        // No changes: current result version stands.
        return DeltaResult(prevResult.get, fullRecompute = false, changedRows = 0)
      }

      val replayed = transform(toProcess)
      requireCompatible(toProcess, replayed)
      // Previous result rows whose key was NOT REPROCESSED, kept as-is.
      // Subtract the PROCESSED key set, not the replay output: a changed
      // row the transform now filters out must lose its stale previous
      // output (a full recompute would not produce it) — subtracting
      // `replayed` kept it forever (reference delta semantics: the diff
      // keys are what's removed, delta.py)
      val kept = prevOut.subtract(toProcess, on = deltaOn)
      val out = Chain(kept.toDF.unionByName(replayed.toDF))
      val (v, _) = saveBoth(out,
        Seq(s"$snapName@v${prevSnap.get}", s"$name@v${prevResult.get}"))
      DeltaResult(v, fullRecompute = false, changedRows = nChanged)
    } finally toProcessDF.unpersist()
  }
}
