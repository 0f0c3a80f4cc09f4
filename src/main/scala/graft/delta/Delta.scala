package graft.delta

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
 * `retryOn` additionally re-processes previous-result rows whose error
 * column is non-empty (reference: delta.py:126-186).
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
                retryOn: Option[String] = None): DeltaResult = {
    require(deltaCompatible(transform(Chain(source.toDF.limit(0)))),
      s"transformation contains delta-disabled ops (${DeltaDisabledOps.mkString(",")})")
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

    if (prevSnap.isEmpty || prevResult.isEmpty) {
      val out = transform(source)
      val v = catalog.save(out, name, deps = Seq(s"$snapName@full"))
      val snapV = catalog.save(snapshot(), snapName)
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
    val retried = retryOn match {
      case Some(errCol) =>
        // keys of previous-result rows with a non-empty error marker
        val errKeys = prevOut.toDF
          .filter(col(errCol).isNotNull && col(errCol) =!= "")
          .select(deltaOn.map(col): _*).distinct()
        Chain(source.toDF.join(errKeys, deltaOn, "left_semi"))
      case None => Chain(source.toDF.limit(0))
    }
    // The changed-set feeds three consumers (count, replay, anti-join) —
    // persist it so the diff's full-outer join runs once, not three times.
    val toProcessDF = changed.toDF.unionByName(retried.toDF).distinct().persist()
    try {
      val toProcess = Chain(toProcessDF)
      val nChanged = toProcessDF.count()

      if (nChanged == 0) {
        // No changes: current result version stands.
        return DeltaResult(prevResult.get, fullRecompute = false, changedRows = 0)
      }

      val replayed = transform(toProcess)
      // Previous result rows whose key was NOT re-derived, kept as-is.
      val kept = prevOut.subtract(replayed, on = deltaOn)
      val out = Chain(kept.toDF.unionByName(replayed.toDF))
      val v = catalog.save(out, name,
        deps = Seq(s"$snapName@v${prevSnap.get}", s"$name@v${prevResult.get}"))
      catalog.save(snapshot(), snapName)
      DeltaResult(v, fullRecompute = false, changedRows = nChanged)
    } finally toProcessDF.unpersist()
  }
}
