package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.SignalSchema

/**
 * The graft `Chain` — a lazy, immutable chain of operations over a table of
 * nested records; the Spark-native counterpart of the reference's
 * `DataChain` (reference: src/datachain/lib/dc/datachain.py:108).
 *
 * Architecture: every relational operator is a *declarative* DataFrame
 * transformation, so Catalyst owns optimization (predicate pushdown, column
 * pruning, join strategy, AQE). The Chain itself only adds:
 *   - an [[OpTree]] recording lineage + a stable content hash (checkpoints,
 *     delta recompute — reference: src/datachain/query/dataset.py:164-174),
 *   - dotted-path signal resolution over nested StructTypes,
 *   - the reference's operator semantics where they differ from Spark
 *     defaults (merge collision renaming, null-safe subtract, diff statuses).
 *
 * Scale posture: nothing here collects to the driver; `sample`, `shuffle`,
 * `chunk` are pushdown-friendly filters/sorts over persisted `sys.rand`
 * rather than driver-side row picks.
 */
final class Chain private (
    private[graft] val df: DataFrame,
    val ops: OpTree) {

  def spark: SparkSession = df.sparkSession
  def toDF: DataFrame = df
  def schema = df.schema
  def hash: String = ops.hash

  private def next(d: DataFrame, op: String, args: String*): Chain =
    new Chain(d, ops.append(op, args: _*))

  // ------------------------------------------------------------- projection

  /** Keep the given signals. A dotted path surfaces as a FLAT top-level
    * column named with underscores ("file.path" -> file_path) — it does
    * not re-nest. Colliding outputs (select("file.path", "file_path"))
    * fail loudly rather than emitting two identically-named columns. */
  def select(cols: String*): Chain = {
    val outNames = cols.map(_.replace('.', '_'))
    val dups = outNames.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty,
      s"select: colliding output names ${dups.mkString(", ")}")
    next(df.select(cols.map(c => SignalSchema.resolve(c).as(c.replace('.', '_'))): _*),
      "select", cols: _*)
  }

  def selectExpr(cols: Column*): Chain =
    next(df.select(cols: _*), "selectExpr", cols.map(_.toString): _*)

  /** Drop the given signals; dotted paths drop nested struct fields
    * (reference select_except is nested-path aware,
    * src/datachain/lib/dc/datachain.py:1163). */
  def selectExcept(cols: String*): Chain = {
    val (nested, top) = cols.partition(_.contains('.'))
    val dropped = top.foldLeft(df)((d, c) => d.drop(c))
    val out = nested.foldLeft(dropped) { (d, path) =>
      val i = path.indexOf('.')
      val (root, rest) = (path.substring(0, i), path.substring(i + 1))
      d.withColumn(root, col(root).dropFields(rest))
    }
    next(out, "select_except", cols: _*)
  }

  /** Add / replace computed columns; evaluated by Catalyst, never row-code. */
  def mutate(exprs: (String, Column)*): Chain =
    next(df.withColumns(exprs.toMap), "mutate", exprs.map(_._1): _*)

  def rename(from: String, to: String): Chain =
    next(df.withColumnRenamed(from, to), "rename", from, to)

  // ----------------------------------------------------------------- filter

  /** AND of the given predicates (consecutive filters fuse in Catalyst). */
  def filter(preds: Column*): Chain =
    next(preds.foldLeft(df)((d, p) => d.filter(p)), "filter",
      preds.map(_.toString): _*)

  // --------------------------------------------------------------- ordering

  /** Order is only guaranteed into an immediately following limit/collect —
    * the same caveat the reference documents
    * (reference: src/datachain/lib/dc/datachain.py:1126-1131). */
  def orderBy(cols: Column*): Chain =
    next(df.orderBy(cols: _*), "order_by", cols.map(_.toString): _*)

  def limit(n: Int): Chain = next(df.limit(n), "limit", n.toString)
  def offset(n: Int): Chain = next(df.offset(n), "offset", n.toString)

  // ------------------------------------------------------------ set-like ops

  /** One arbitrary representative row per distinct key
    * (reference semantics: src/datachain/lib/dc/datachain.py:1139-1153). */
  def distinctOn(cols: String*): Chain =
    next(df.dropDuplicates(cols), "distinct", cols: _*)

  /** Whole-row distinct. */
  def distinct(): Chain = next(df.distinct(), "distinct")

  /** Random sample of exactly min(n, count) rows — the reference's
    * `ORDER BY random() LIMIT n` (datachain.py:2767), which Spark plans as
    * TakeOrderedAndProject: a bounded heap per partition + driver merge,
    * one pass, no full sort and no pre-count scan. */
  def sample(n: Int): Chain =
    next(df.orderBy(rand()).limit(n), "sample", n.toString)

  /** Deterministic pseudo-random sample: exactly min(n, count) rows chosen
    * by md5-hash order of `keyCol` — reproducible across runs and engines
    * (unlike [[sample]]'s fraction-based draw) PROVIDED `keyCol` is a row
    * identity: among rows sharing a key value the hash and tiebreak are
    * equal, so which of them crosses the limit boundary is partition-
    * order luck. Plans as a TakeOrderedAndProject
    * (per-partition top-n, then merge), never a full sort. */
  def sampleDeterministic(n: Int, keyCol: String): Chain =
    next(df.orderBy(md5(SignalSchema.resolve(keyCol).cast("string")).asc,
      SignalSchema.resolve(keyCol).asc).limit(n),
      "sample_det", n.toString, keyCol)

  /** Deterministic reshuffle by persisted sys.rand (stamps sys if absent). */
  def shuffle(seed: Long = 0L): Chain = {
    val stamped = if (df.columns.contains(Sys.ColName)) df else Sys.stamp(df, seed)
    next(stamped.orderBy(col("sys.rand")), "shuffle", seed.toString)
  }

  /** Deterministic 1/total split by sys.rand
    * (reference: src/datachain/lib/dc/datachain.py:2879).
    * Deterministic PER SAVED VERSION: sys.rand persists with the data.
    * On an unsaved chain the stamp derives from partition row order,
    * which an upstream shuffle does not stabilize across jobs — calling
    * chunk(0,2) and chunk(1,2) as two separate actions on such a chain
    * can double- or zero-assign rows (the reference has the identical
    * contract: its sys__rand exists only on materialized tables). Save
    * or persist first when chunks must partition exactly. */
  def chunk(index: Int, total: Int): Chain = {
    require(index >= 0 && index < total, s"chunk index $index out of [0,$total)")
    val stamped = if (df.columns.contains(Sys.ColName)) df else Sys.stamp(df)
    next(stamped.filter(pmod(col("sys.rand"), lit(total)) === index),
      "chunk", index.toString, total.toString)
  }

  /** UNION ALL by signal name; errors list the missing columns per side,
    * mirroring the reference (src/datachain/lib/dc/datachain.py:1711-1727). */
  def union(other: Chain): Chain = {
    val l = df.columns.toSet
    val r = other.df.columns.toSet
    require(l == r,
      s"union schema mismatch: left missing ${(r -- l).toSeq.sorted.mkString(",")}; " +
        s"right missing ${(l -- r).toSeq.sorted.mkString(",")}")
    new Chain(df.unionByName(other.df),
      ops.append("union").withParent(other.ops.hash))
  }

  /** NULL-safe anti-join on key columns
    * (reference: src/datachain/lib/dc/datachain.py:1729-1793). */
  def subtract(other: Chain, on: Seq[String], rightOn: Seq[String] = Seq.empty): Chain = {
    val rOn = if (rightOn.nonEmpty) rightOn else on
    require(rOn.size == on.size, "on/right_on length mismatch")
    // Alias the build side so self-subtract (shared lineage) resolves
    // unambiguously; ship only the key columns to the join.
    val l = df.alias("__sub_l")
    val r = other.df.select(rOn.map(col): _*).alias("__sub_r")
    val cond = on.zip(rOn)
      .map { case (a, b) => col(s"__sub_l.$a") <=> col(s"__sub_r.$b") }
      .reduce(_ && _)
    new Chain(l.join(r, cond, "left_anti"),
      ops.append("subtract", on ++ rOn: _*).withParent(other.ops.hash))
  }

  /** NULL-safe semi-join: rows of this chain whose key exists in `other`.
    * The reference has no `intersect`; this is the Spark-native complement
    * of [[subtract]] (left_semi — no right columns materialize, so the
    * build side ships only its key columns over the wire). */
  def semiJoin(other: Chain, on: Seq[String], rightOn: Seq[String] = Seq.empty): Chain = {
    val rOn = if (rightOn.nonEmpty) rightOn else on
    require(rOn.size == on.size, "on/right_on length mismatch")
    val l = df.alias("__semi_l")
    val r = other.df.select(rOn.map(col): _*).alias("__semi_r")
    val cond = on.zip(rOn)
      .map { case (a, b) => col(s"__semi_l.$a") <=> col(s"__semi_r.$b") }
      .reduce(_ && _)
    new Chain(l.join(r, cond, "left_semi"),
      ops.append("semi_join", on ++ rOn: _*).withParent(other.ops.hash))
  }

  // ------------------------------------------------------------------ joins

  /**
   * Merge (join) with the reference's semantics
   * (reference: src/datachain/lib/dc/datachain.py:1601-1709):
   * default LEFT OUTER; `inner`/`full` flags; right-side column-name
   * collisions (other than equi-join keys joined by name) renamed with the
   * `rname` prefix; `sys` dropped from the right side. Arbitrary `Column`
   * join conditions (theta joins) supported via `condition`.
   *
   * Physical strategy is Catalyst's: broadcast when one side is small
   * (AQE-threshold), else shuffle. Call with `broadcast(right.toDF())`
   * upstream when the dimension side is known-small.
   */
  def merge(right: Chain, on: Seq[String], rightOn: Seq[String] = Seq.empty,
            how: String = "left_outer", rname: String = "right_",
            condition: Option[Column] = None): Chain = {
    require(on.nonEmpty || condition.isDefined,
      "merge needs join keys (`on`) or an expression `condition`")
    require(rightOn.isEmpty || rightOn.size == on.size,
      s"right_on has ${rightOn.size} columns but on has ${on.size}")
    val r0 = Sys.drop(right.df)
    val joined =
      if (condition.isDefined) {
        // Expression join: keep all columns, rename right collisions.
        val mapping = SignalSchema.mergeRootMapping(
          df.columns.toSeq, r0.columns.toSeq, rname)
        val r = mapping.foldLeft(r0) { case (d, (from, to)) =>
          if (from == to) d else d.withColumnRenamed(from, to)
        }
        df.join(r, condition.get, how)
      } else if (rightOn.isEmpty || rightOn == on) {
        // Equi-join by name: using-columns join keeps one key copy; rename
        // remaining right collisions with the rname prefix.
        val collide = (r0.columns.toSet -- on).intersect(df.columns.toSet)
        // ALL right roots go into the mapping (not just the colliding
        // subset): the two-phase claim inside mergeRootMapping needs to
        // see every live right name, or a rename could land on one
        val mapping = SignalSchema.mergeRootMapping(
          df.columns.toSeq, r0.columns.toSeq.filterNot(on.contains), rname)
        val r = collide.foldLeft(r0)((d, c) => d.withColumnRenamed(c, mapping(c)))
        df.join(r, on, how)
      } else {
        val collide = r0.columns.toSet.intersect(df.columns.toSet)
        val mapping = SignalSchema.mergeRootMapping(
          df.columns.toSeq, r0.columns.toSeq, rname)
        val r = collide.foldLeft(r0)((d, c) => d.withColumnRenamed(c, mapping(c)))
        val rOnMapped = rightOn.map(c => mapping.getOrElse(c, c))
        val cond = on.zip(rOnMapped).map { case (a, b) => df(a) === r(b) }
          .reduce(_ && _)
        df.join(r, cond, how)
      }
    new Chain(joined,
      ops.append("merge", (on ++ rightOn :+ how): _*).withParent(right.ops.hash))
  }

  // ------------------------------------------------------------ aggregation

  /** GROUP BY over (possibly dotted/nested) keys with named aggregates
    * (reference: src/datachain/lib/dc/datachain.py:1172-1293). */
  /**
   * Group by signals + named aggregates. A key naming a COMPLEX signal (a
   * struct column, e.g. `file`) expands to its leaf columns for grouping
   * and is re-packed into the struct afterwards — the reference's
   * complex-signal `partition_by` with partial output models
   * (reference: src/datachain/lib/dc/datachain.py:1172-1293,
   * signal_schema.py:821-853). Grouping on scalar leaves keeps the
   * aggregation fully codegen'd; struct equality == leafwise equality, so
   * semantics match grouping on the struct itself.
   */
  def groupByAgg(keys: Seq[String], aggs: (String, Column)*): Chain = {
    require(aggs.nonEmpty, "group_by requires at least one aggregate")
    def typeOf(path: String): Option[org.apache.spark.sql.types.DataType] = {
      def walk(t: org.apache.spark.sql.types.DataType, parts: List[String])
          : Option[org.apache.spark.sql.types.DataType] = (t, parts) match {
        case (t, Nil) => Some(t)
        case (s: org.apache.spark.sql.types.StructType, p :: rest) =>
          s.fields.find(_.name == p).flatMap(f => walk(f.dataType, rest))
        case _ => None
      }
      walk(df.schema, path.split('.').toList)
    }
    val structKeys: Map[String, org.apache.spark.sql.types.StructType] =
      keys.flatMap(k => typeOf(k) match {
        case Some(s: org.apache.spark.sql.types.StructType) => Some(k -> s)
        case _ => None
      }).toMap
    val leafKeys: Seq[String] = keys.flatMap { k =>
      structKeys.get(k) match {
        case Some(s) => SignalSchema.leafPaths(s, k)
        case None    => Seq(k)
      }
    }
    val keyCols = leafKeys.map(k => SignalSchema.resolve(k).as(k.replace('.', '_')))
    val aggCols = aggs.map { case (n, c) => c.as(n) }
    val grouped =
      if (leafKeys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
    // re-pack each struct key from its flattened leaves (partial model)
    def repack(s: org.apache.spark.sql.types.StructType, prefix: String): Column =
      struct(s.fields.toSeq.map { f =>
        val p = s"$prefix.${f.name}"
        f.dataType match {
          case ns: org.apache.spark.sql.types.StructType => repack(ns, p).as(f.name)
          case _ => col(p.replace('.', '_')).as(f.name)
        }
      }: _*)
    val out =
      if (structKeys.isEmpty) grouped
      else grouped.select(
        keys.map { k =>
          structKeys.get(k) match {
            case Some(s) => repack(s, k).as(k)
            case None    => col(k.replace('.', '_'))
          }
        } ++ aggs.map { case (n, _) => col(n) }: _*)
    next(out, "group_by", keys ++ aggs.map(_._1): _*)
  }

  // whole-chain scalar shortcuts (reference: datachain.py:2569-2636)
  def count(): Long = df.count()
  def isEmpty: Boolean = df.isEmpty
  def sumOf(c: String): Row = df.agg(sum(col(c))).first()
  def avgOf(c: String): Row = df.agg(avg(col(c))).first()
  def minOf(c: String): Row = df.agg(min(col(c))).first()
  def maxOf(c: String): Row = df.agg(max(col(c))).first()

  // ------------------------------------------------------------------- diff

  /**
   * Row-level changeset vs `other` (reference: src/datachain/diff/__init__.py:27-163):
   * full outer join on `on` keys (null-safe); status per row:
   *   A = key only here, D = key only in other, M = keys match but a
   *   `compare` column differs, S = same. Deleted rows take `other`'s values.
   * Keeps requested statuses; `statusCol` optionally retained.
   */
  def diff(other: Chain, on: Seq[String], compare: Seq[String] = Seq.empty,
           added: Boolean = true, deleted: Boolean = true,
           modified: Boolean = true, same: Boolean = true,
           statusCol: Option[String] = None): Chain = {
    val l = Sys.drop(df).alias("l")
    val r = Sys.drop(other.df).alias("r")
    val cond = on.map(k => col(s"l.$k") <=> col(s"r.$k")).reduce(_ && _)
    // default comparators: the left's non-key columns that the right
    // ALSO has — modifiedCond can only reference shared columns (the
    // projection below already tolerates right-missing columns), and a
    // keys-only right side (deltaSave's O(keys) snapshot) then means
    // keys-only change detection: adds/deletes, never M
    val rCols = Sys.drop(other.df).columns.toSet
    val cmp = if (compare.nonEmpty) compare
      else Sys.drop(df).columns.toSeq.filterNot(on.contains)
        .filter(rCols.contains)
    // A row exists on a side iff any of its key cols is non-null after the
    // full join (presence markers tolerate all-null key corner cases).
    // LITERAL presence markers (stamped pre-join), not key-isNotNull:
    // the join is null-safe, so an all-null-key row is a real row that
    // can match or stand alone — key-null tests would misread an
    // unmatched all-null-key row as present-on-both-sides (M/S instead
    // of A/D). Same device as Delta.readChanges.
    val lm = l.withColumn("__lp0", lit(true)).alias("l")
    val rm = r.withColumn("__rp0", lit(true)).alias("r")
    val joined = lm.join(rm, cond, "full_outer")
      .withColumn("__l_present", col("l.__lp0").isNotNull)
      .withColumn("__r_present", col("r.__rp0").isNotNull)
    val modifiedCond =
      if (cmp.isEmpty) lit(false)
      else cmp.map(c => !(col(s"l.$c") <=> col(s"r.$c"))).reduce(_ || _)
    val status = when(col("__l_present") && !col("__r_present"), "A")
      .when(!col("__l_present") && col("__r_present"), "D")
      .when(modifiedCond, "M")
      .otherwise("S")
    val withStatus = joined.withColumn("__diff", status)
    val wanted = Seq("A" -> added, "D" -> deleted, "M" -> modified, "S" -> same)
      .collect { case (s, true) => s }
    val filtered = withStatus.filter(col("__diff").isin(wanted: _*))
    // Deleted rows surface the right side's values; everything else the left's.
    val lCols = Sys.drop(df).columns.toSeq
    val outCols = lCols.map { c =>
      val rSide = if (Sys.drop(other.df).columns.contains(c)) col(s"r.$c")
        else lit(null)
      when(col("__diff") === "D", rSide).otherwise(col(s"l.$c")).as(c)
    } ++ statusCol.map(sc => Seq(col("__diff").as(sc))).getOrElse(Seq.empty)
    new Chain(filtered.select(outCols: _*),
      ops.append("diff", on ++ compare: _*).withParent(other.ops.hash))
  }

  /** `diff` keyed on file identity, comparing file version/etag
    * (reference: src/datachain/lib/dc/datachain.py:1863-1933). */
  def fileDiff(other: Chain, fileCol: String = "file",
               added: Boolean = true, deleted: Boolean = false,
               modified: Boolean = true, same: Boolean = false,
               statusCol: Option[String] = None): Chain =
    diff(other,
      on = Seq(s"$fileCol.source", s"$fileCol.path"),
      compare = Seq(s"$fileCol.version", s"$fileCol.etag"),
      added = added, deleted = deleted, modified = modified, same = same,
      statusCol = statusCol)

  // -------------------------------------------------------------- typed UDFs

  /** 1:1 typed row mapping (reference `map`, src/datachain/lib/dc/datachain.py:809).
    * Unlike the reference there is no join-back on sys__id: the closure
    * carries the full typed row through the executor. */
  def mapTyped[T: Encoder, U: Encoder](f: T => U): Chain =
    next(df.as[T].map(f).toDF(), "map")

  /**
   * 1:1 typed mapping with per-row error capture: a failing row yields
   * null outputs plus the exception message in `errorCol` instead of
   * failing the job — the reference's error-column contract that
   * `Delta.deltaSave(retryOn = ...)` consumes to re-process failed rows
   * on the next incremental run (reference: src/datachain/delta.py:126-186).
   *
   * Use a case-class `U` when failed rows must carry null values: for a
   * primitive `U` (Long/Double/...) the value column holds the type's
   * default on error rows (primitives can't encode null) — `errorCol`
   * IS NULL remains the authoritative success test either way.
   */
  def mapTypedSafe[T: Encoder, U: Encoder](f: T => U,
                                           errorCol: String = "error"): Chain = {
    require(!implicitly[Encoder[U]].schema.fieldNames.contains(errorCol),
      s"output type already has a '$errorCol' field — pass a different errorCol")
    val tupEnc = org.apache.spark.sql.Encoders.tuple(
      implicitly[Encoder[U]], org.apache.spark.sql.Encoders.STRING)
    val mapped = df.as[T].map { t =>
      try (f(t), null: String)
      catch { case scala.util.control.NonFatal(e) =>
        (null.asInstanceOf[U], s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }(tupEnc).toDF()
    val isStruct = mapped.schema.head.dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType]
    val out =
      if (isStruct) mapped.select(col("_1.*"), col("_2").as(errorCol))
      else mapped.select(col("_1").as("value"), col("_2").as(errorCol))
    next(out, "map_safe", errorCol)
  }

  /** 1:N typed generator (reference `gen`, datachain.py:862) — output rows
    * replace the input row set. */
  def genTyped[T: Encoder, U: Encoder](f: T => IterableOnce[U]): Chain =
    next(df.as[T].flatMap(f).toDF(), "gen")

  /** N:M group-wise generator (reference `agg`, datachain.py:901): rows
    * grouped by key, UDF sees the whole group, yields any number of rows.
    * Spark's shuffle+sort replaces the reference's dense_rank partition
    * table (src/datachain/query/dataset.py:582-615). */
  def aggTyped[T: Encoder, K: Encoder, U: Encoder](key: T => K)(
      f: (K, Iterator[T]) => IterableOnce[U]): Chain =
    next(df.as[T].groupByKey(key).flatMapGroups(f).toDF(), "agg_udf")

  /** N:N batched mapping over partition iterators (reference `batch_map`). */
  def batchMapTyped[T: Encoder, U: Encoder](batch: Int)(
      f: Seq[T] => Seq[U]): Chain =
    next(df.as[T].mapPartitions(it => it.grouped(batch).flatMap(f)).toDF(),
      "batch_map", batch.toString)

  // ----------------------------------------------------------------- json

  /** Parse a JSON-string column into a struct and explode it to columns
    * (reference `explode`/`from_json`, datachain.py:451-466). */
  def explodeJson(jsonCol: String, schema: org.apache.spark.sql.types.StructType,
                  keep: Boolean = false): Chain = {
    val parsed = df.withColumn("__obj", from_json(col(jsonCol), schema))
    val base = if (keep) parsed else parsed.drop(jsonCol)
    next(base.select(col("*"), col("__obj.*")).drop("__obj"),
      "explode_json", jsonCol)
  }

  /** [[explodeJson]] without a hand-built schema: the struct type is
    * inferred from a bounded sample of the column (reference
    * meta_formats.py's sample-driven model inference) and then applied to
    * every row — inference cost is O(sampleSize) regardless of table size. */
  def explodeJsonInferred(jsonCol: String, sampleSize: Int = 1000,
                          keep: Boolean = false): Chain = {
    val spark = df.sparkSession
    import spark.implicits._
    val sample = df.select(col(jsonCol)).na.drop().limit(sampleSize)
      .as[String]
    val inferred = spark.read.json(sample).schema
    explodeJson(jsonCol, inferred, keep)
  }

  // -------------------------------------------------------------- consume

  /** Streamed row iterator (reference `to_iter`/`collect`) — paginates
    * partitions through the driver without materializing the result. */
  def toLocalIterator(): java.util.Iterator[Row] = df.toLocalIterator()

  def toList(): Seq[Row] = df.collect().toSeq

  /** Rows as column-name → value maps (reference `to_records`). */
  def toRecords(): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map(_.getValuesMap[Any](cols))
  }

  /** One column's values (reference `to_values`). */
  def toValues(colName: String): Seq[Any] =
    df.select(colName).collect().toSeq.map(_.get(0))

  def show(n: Int = 20): Unit = df.show(n, truncate = false)

  /** Execute the chain for its side effects, discarding rows
    * (reference `exec`, datachain.py). */
  def exec(): Unit = df.foreach(_ => ())

  /** Print the (nested) schema tree (reference `print_schema`). */
  def printSchema(): Unit = df.printSchema()

  // ------------------------------------------------------------ persistence

  /** Hash-partition by the given keys (pre-shuffle for a co-located join
    * or repeated aggregations over the same keys — Catalyst reuses the
    * exchange across stages that need this partitioning). */
  def repartitionBy(n: Int, cols: String*): Chain =
    next(df.repartition(n, cols.map(SignalSchema.resolve): _*),
      "repartition", (n.toString +: cols): _*)

  /** Stamp sys columns (id, rand) — applied automatically at save. */
  def withSys(seed: Long = 0L): Chain = next(Sys.stamp(df, seed), "with_sys")

  /** Session-scoped persist (reference `persist`, datachain.py:570). */
  def persist(): Chain = next(df.persist(), "persist")

  // ------------------------------------------------------------ composition

  /** `apply`-style composition helper (reference: datachain.py:786). */
  def through(f: Chain => Chain): Chain = f(this)
}

object Chain {
  /** Session-lifetime memo of [[readJsonInferred]]'s sample-inferred
    * schemas, keyed (path, sampleSize, listing fingerprint) — schema
    * metadata only, never row data; bounded and invalidated by any
    * file-size/mtime change through the fingerprint. */
  private val jsonSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int, Long), org.apache.spark.sql.types.StructType]()

  def apply(df: DataFrame): Chain =
    new Chain(df, OpTree.empty.append("source", df.schema.map(_.name): _*))

  def apply(df: DataFrame, ops: OpTree): Chain = new Chain(df, ops)

  /** read_parquet (reference: src/datachain/lib/dc/parquet.py:15). */
  def readParquet(spark: SparkSession, path: String): Chain =
    new Chain(spark.read.parquet(path), OpTree.empty.append("read_parquet", path))

  /** ORC read — the columnar sibling of [[readParquet]] (Spark-native
    * source; same predicate-pushdown/column-pruning/vectorized-read path,
    * so every downstream operator and the catalog save flow work
    * unchanged on ORC-resident data lakes). */
  def readOrc(spark: SparkSession, path: String): Chain =
    new Chain(spark.read.orc(path), OpTree.empty.append("read_orc", path))

  /** Avro container read — the row-oriented ingest format of
    * Kafka/stream archives (see [[graft.files.AvroIO]]: per-file
    * fan-out, schema from one header, streaming decode). */
  def readAvro(spark: SparkSession, path: String): Chain =
    new Chain(graft.files.AvroIO.readAvro(spark, path),
      OpTree.empty.append("read_avro", path))

  /** read_csv (reference: src/datachain/lib/dc/csv.py:15). */
  def readCsv(spark: SparkSession, path: String,
              header: Boolean = true, delimiter: String = ",",
              schema: Option[org.apache.spark.sql.types.StructType] = None,
              multiLine: Boolean = false): Chain = {
    // multiLine: quoted fields may span lines (embedded newlines) — off
    // by default because it disables the line-splittable parallel parse
    val r = spark.read.option("header", header.toString)
      .option("sep", delimiter).option("multiLine", multiLine.toString)
    val df = schema.map(s => r.schema(s)).getOrElse(r.option("inferSchema", "true"))
      .csv(path)
    new Chain(df, OpTree.empty.append("read_csv", path))
  }

  /** read_json / jsonl (reference: src/datachain/lib/dc/json.py:19). */
  def readJson(spark: SparkSession, path: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None): Chain = {
    val r = spark.read
    val df = schema.map(s => r.schema(s)).getOrElse(r).json(path)
    new Chain(df, OpTree.empty.append("read_json", path))
  }

  /**
   * Schemaless JSONL read with SAMPLE-based schema inference + jmespath
   * descent (reference `read_json`'s model inference and jmespath
   * handling, src/datachain/lib/meta_formats.py): the schema is inferred
   * from the first `sampleSize` lines only — at 100 TB the inference pass
   * reads a few KB, not the corpus — then applied to the full scan.
   *
   * Supported jmespath subset (each step re-roots the rows at that
   * subtree, all compiled to pure Catalyst column ops — descent over
   * 100 TB is a codegen'd projection, the only shuffle-free plan there
   * is):
   *  - `a.b.c` — dotted struct descent
   *  - `a[*]` — array explosion (one row per element)
   *  - `a[2]`, `a[-1]` — array indexing (negative = from the end)
   *  - `a[1:4]`, `a[2:]`, `a[:3]` — slices (non-negative bounds)
   *  - `a[?field == 'x']`, `a[?n >= 3]` — array filter on an element
   *    field vs a literal (`== != < <= > >=`; string / number / boolean)
   *  - `{alias: path, ...}` — multiselect hash reshaping the current
   *    root into the named projection (dotted paths)
   *  - `[e1, e2, ...]` — multiselect list packing the selections into
   *    one array column (named `values`; mixed types coerce to string)
   *  - standalone bracket ops on the piped root: `xs | [0]`, `xs | [1:]`
   *  - `&expression` refs (sort_by/min_by/max_by keys, map's expr) are
   *    dotted field paths: `sort_by(@, &m.score)`
   *  - ops compose within a segment: `items[?tag=='a'][*]`, `xs[1:3][0]`,
   *    `items[*].{x: a.b, y: c}`
   * A terminal scalar/array step keeps its field name as the single
   * output column.
   */
  def readJsonInferred(spark: SparkSession, path: String,
                       jmespath: Option[String] = None,
                       sampleSize: Int = 1000): Chain = {
    import spark.implicits._
    // The inferred schema depends only on (path contents, sampleSize) —
    // never on the jmespath, which compiles to column ops AFTER the scan.
    // Memoize it per session keyed on a (name, size, mtime) listing
    // fingerprint (the listing-TTL-cache precedent): a pipeline that
    // reads the same JSONL source through N different jmespaths pays ONE
    // inference pass, not N, and a changed/rewritten source re-infers.
    val inferred = {
      val fp = try {
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
        // fingerprint LEAF FILES recursively: a direct-children listing
        // missed in-place edits of files nested under subdirectories
        // (partition-style layouts) — the subdir's own mtime/len don't
        // change, so a stale schema was silently served. (A same-second
        // same-length rewrite of one file still passes — mtime
        // granularity; acceptable for a session-scoped memo.)
        def leaves(st: org.apache.hadoop.fs.FileStatus)
            : Seq[(String, Long, Long)] =
          if (st.isDirectory) {
            val it = fs.listFiles(st.getPath, true)
            val buf = Seq.newBuilder[(String, Long, Long)]
            while (it.hasNext) {
              val f = it.next()
              buf += ((f.getPath.toString, f.getLen, f.getModificationTime))
            }
            buf.result()
          } else Seq((st.getPath.toString, st.getLen, st.getModificationTime))
        val sts =
          if (fs.isDirectory(hp)) leaves(fs.getFileStatus(hp))
          else fs.globStatus(hp) match {
            case null => Seq.empty
            case arr => arr.toSeq.flatMap(leaves)
          }
        sts.sorted.hashCode.toLong
      } catch { case scala.util.control.NonFatal(_) => Long.MinValue }
      val key = (path, sampleSize, fp)
      if (fp == Long.MinValue) { // unfingerprintable: never cache
        val sample = spark.read.text(path).limit(sampleSize).as[String]
        spark.read.json(sample).schema
      } else Option(jsonSchemaCache.get(key)).getOrElse {
        val sample = spark.read.text(path).limit(sampleSize).as[String]
        val s = spark.read.json(sample).schema
        if (jsonSchemaCache.size > 256) jsonSchemaCache.clear()
        jsonSchemaCache.put(key, s)
        s
      }
    }
    var out = spark.read.schema(inferred).json(path)
    jmespath.map(_.trim).filter(_.nonEmpty).foreach { jp =>
      out = applyJmespath(out, jp)
    }
    new Chain(out,
      OpTree.empty.append("read_json", path, jmespath.getOrElse("")))
  }

  /** Split a jmespath on top-level dots (dots inside `[...]` stay put). */
  private[graft] def jmesSegments(jp: String): Seq[String] = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    jp.foreach { c =>
      if (c == '[' || c == '{' || c == '(') depth += 1
      if (c == ']' || c == '}' || c == ')') depth -= 1
      if (c == '.' && depth == 0) {
        if (cur.nonEmpty) { segs += cur.toString; cur.clear() }
      } else cur += c
    }
    if (cur.nonEmpty) segs += cur.toString
    segs.toSeq
  }

  private val jmesFilterRe =
    """^\?\s*([A-Za-z_][A-Za-z0-9_]*)\s*(==|!=|<=|>=|<|>)\s*(.+?)\s*$""".r
  private val jmesSliceRe = """^(-?\d*):(-?\d*)$""".r

  /** Split on top-level pipes (`|` outside brackets/braces/quotes). */
  private[graft] def jmesPipes(jp: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    jp.foreach { c =>
      if (c == '\'') inStr = !inStr
      if (!inStr && (c == '[' || c == '{' || c == '(')) depth += 1
      if (!inStr && (c == ']' || c == '}' || c == ')')) depth -= 1
      if (c == '|' && depth == 0 && !inStr) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Apply one jmespath (see [[readJsonInferred]]) to a DataFrame.
    * Pipe expressions (`lhs | rhs`) apply left-to-right — each side is a
    * full sub-expression over the previous result, the natural fit for
    * the re-rooting model. Package-visible for spec coverage. */
  private[graft] def applyJmespath(df: DataFrame, jp: String): DataFrame =
    jmesPipes(jp).foldLeft(df)(applyJmespathExpr)

  private val jmesFnRe = """^([a-z_]+)\((.*)\)((?:\[.*\])?)$""".r

  /** The sole column of the current root — what `@` refers to in a
    * function step. Struct-expanded roots need an explicit path. */
  private def jmesCurrent(df: DataFrame): Column = {
    require(df.columns.length == 1,
      s"jmespath '@' needs a single-column root, have " +
        df.columns.mkString("(", ",", ")"))
    col(df.columns.head)
  }

  /** The `][`-split bracket ops of a standalone `[...]` segment, or None
    * when the content is a multiselect LIST (`[a, b]`) rather than
    * index/slice/filter/flatten/star ops. */
  private def jmesBracketOps(seg: String): Option[Seq[String]] = {
    val inner = seg.substring(1, seg.length - 1)
    val parts =
      if (inner.isEmpty) Seq("")
      else inner.split("\\]\\[", -1).toSeq
    val opLike = parts.forall(p => p == "*" || p == "" ||
      p.matches("-?\\d+") || p.matches("(-?\\d*):(-?\\d*)") ||
      p.startsWith("?"))
    if (opLike) Some(parts) else None
  }

  private def applyJmespathExpr(df0: DataFrame, jp: String): DataFrame = {
    var out = df0
    jmesSegments(jp).foreach { seg =>
      if (seg.startsWith("[") && seg.endsWith("]") &&
          jmesBracketOps(seg).isEmpty) {
        // multiselect LIST `[e1, e2, ...]`: each element evaluates
        // against the current root and the results pack into ONE array
        // column (spec-named — jmespath lists are anonymous, the column
        // must be called something; "values" mirrors the hash's field
        // naming). jmespath is dynamically typed where array() needs one
        // element type, so mixed-type selections coerce to their string
        // rendering (the not_null() precedent).
        val parts = jmesArgs(seg.substring(1, seg.length - 1))
        require(parts.nonEmpty, s"empty jmespath multiselect list: '$seg'")
        val cs = parts.map(p => jmesValueArg(out, p))
        val dts = cs.map(c => out.select(c).schema.head.dataType).distinct
        val arr =
          if (dts.length <= 1) array(cs: _*)
          else array(cs.map(_.cast("string")): _*)
        out = out.select(arr.as("values"))
      } else if (seg.startsWith("{") && seg.endsWith("}")) {
        // multiselect hash: `{alias: path, ...}` — reshape the current
        // root into the named projection (paths are dotted field refs,
        // resolved against the re-rooted columns)
        val pairs = seg.substring(1, seg.length - 1).split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map { p =>
            val i = p.indexOf(':')
            require(i > 0, s"jmespath multiselect needs 'alias: path': '$p'")
            val path = p.drop(i + 1).trim
            require(!path.contains('[') && !path.contains('{'),
              s"jmespath multiselect paths are dotted field refs: '$path'")
            (p.take(i).trim, path)
          }
        require(pairs.nonEmpty, s"empty jmespath multiselect: '$seg'")
        out = out.select(pairs.map { case (a, p) => col(p).as(a) }: _*)
      } else {
      val (name, c0, ops) = seg match {
        case jmesFnRe(fn, argsRaw, trailing) if jmesFns(fn) =>
          val t: Seq[String] =
            if (trailing.isEmpty) Seq.empty
            else trailing.stripPrefix("[").stripSuffix("]")
              .split("\\]\\[", -1).toSeq
          (fn, jmesFunction(out, fn, argsRaw), t)
        case _ =>
          val bracketAt = seg.indexOf('[')
          val n = if (bracketAt < 0) seg else seg.take(bracketAt)
          val t: Seq[String] =
            if (bracketAt < 0) Seq.empty
            else seg.drop(bracketAt).stripPrefix("[").stripSuffix("]")
              .split("\\]\\[", -1).toSeq
          if (n.nonEmpty) (n, col(n), t)
          else
            // standalone bracket ops (`[0]`, `[1:3]`, `[?…]` — the
            // post-pipe shapes) apply to the current single-column root
            (out.columns.head, jmesCurrent(out), t)
      }
      var c: Column = c0
      var exploded = false
      ops.foreach {
        case "*" =>
          // explosion is a row-level op: materialize the current expr
          out = out.select(explode(c).as("__jm"))
          c = col("__jm")
          exploded = true
        case jmesFilterRe(field, op, rawLit) =>
          val l = jmesLiteral(rawLit)
          c = filter(c, e => op match {
            case "==" => e.getField(field) === l
            case "!=" => e.getField(field) =!= l
            case "<"  => e.getField(field) < l
            case "<=" => e.getField(field) <= l
            case ">"  => e.getField(field) > l
            case ">=" => e.getField(field) >= l
          })
        case jmesSliceRe(a, b) =>
          val start = if (a.isEmpty) 0 else a.toInt
          require(start >= 0 && (b.isEmpty || b.toInt >= 0),
            s"jmespath slice supports non-negative bounds: '[$a:$b]'")
          val len =
            if (b.isEmpty) lit(Int.MaxValue)
            else greatest(lit(b.toInt - start), lit(0))
          c = slice(c, lit(start + 1), len)
        case "" =>
          // `a[]` — flatten projection: merge one level of nesting; per
          // the jmespath spec a flat array passes through unchanged
          // (flatten() on array<scalar> would be an analysis error)
          import org.apache.spark.sql.types.ArrayType
          out.select(c).schema.head.dataType match {
            case ArrayType(_: ArrayType, _) => c = flatten(c)
            case _ => // already flat
          }
        case idx if idx.matches("-?\\d+") =>
          val i = idx.toInt
          c = element_at(c, if (i >= 0) i + 1 else i) // -1 = last, as jmespath
        case other =>
          throw new IllegalArgumentException(
            s"unsupported jmespath bracket op: '[$other]' in '$seg'")
      }
      // re-root: structs expand to their fields; scalars/arrays keep the
      // segment's field name as the single column
      val rooted = out.select(c.as("__jm"))
      out = rooted.schema.head.dataType match {
        case _: org.apache.spark.sql.types.StructType =>
          rooted.select(col("__jm.*"))
        case _ => rooted.select(col("__jm").as(name))
      }
      val _ = exploded
      }
    }
    out
  }

  private val jmesFns: Set[String] =
    Set("length", "join", "sort_by", "reverse", "min", "max",
      "contains", "starts_with", "to_number", "map", "not_null",
      "ends_with", "to_string", "abs", "ceil", "floor", "sum", "avg",
      "min_by", "max_by")

  /** Split function args on top-level commas (quotes/brackets respected). */
  private def jmesArgs(raw: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    raw.foreach { ch =>
      if (ch == '\'') inStr = !inStr
      if (!inStr && (ch == '[' || ch == '{' || ch == '(')) depth += 1
      if (!inStr && (ch == ']' || ch == '}' || ch == ')')) depth -= 1
      if (ch == ',' && depth == 0 && !inStr) { parts += cur.toString; cur.clear() }
      else cur += ch
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /**
   * JMESPath function step, compiled to the matching Catalyst HOF/builtin
   * (all stay inside whole-stage codegen — a function step over 100 TB is
   * still a pure projection). `@` is the current (single-column) root; a
   * dotted path resolves against the root's columns; sort_by's key is the
   * `&field` expression form.
   */
  private def jmesFunction(df: DataFrame, fn: String, argsRaw: String): Column = {
    val args = jmesArgs(argsRaw)
    def path(a: String): Column = {
      require(!a.contains('[') && !a.contains('('),
        s"jmespath function args are '@' or dotted paths: '$a'")
      if (a == "@") jmesCurrent(df) else col(a)
    }
    def dtype(a: String): org.apache.spark.sql.types.DataType =
      df.select(path(a)).schema.head.dataType
    def va(a: String): Column = jmesValueArg(df, a)
    import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
    fn match {
      case "length" =>
        require(args.length == 1, s"length(subject): got '$argsRaw'")
        dtype(args.head) match {
          case _: ArrayType => size(path(args.head)).cast("long")
          case StringType => length(path(args.head)).cast("long")
          case s: StructType =>
            // jmespath length(object) = number of PRESENT keys, per row.
            // Inferred JSON reads an absent key as a null struct field,
            // so present = non-null (a literal JSON null is merged with
            // absent by the schema inference — flat-schema limitation)
            s.fields.map(f =>
              when(path(args.head).getField(f.name).isNotNull, 1L)
                .otherwise(0L)).reduce(_ + _)
          case dt => throw new IllegalArgumentException(
            s"jmespath length() needs array/string/object, got $dt")
        }
      case "join" =>
        require(args.length == 2 && args.head.startsWith("'"),
          s"join('glue', array): got '$argsRaw'")
        array_join(path(args(1)), args.head.stripPrefix("'").stripSuffix("'"))
      case "sort_by" =>
        require(args.length == 2 && args(1).startsWith("&"),
          s"sort_by(array, &key): got '$argsRaw'")
        val key = jmesKeyRef(args(1))
        array_sort(path(args.head), (a, b) =>
          when(key(a) < key(b), -1)
            .when(key(a) > key(b), 1)
            .otherwise(0))
      case "reverse" =>
        require(args.length == 1, s"reverse(subject): got '$argsRaw'")
        reverse(path(args.head))
      case "min" =>
        require(args.length == 1, s"min(array): got '$argsRaw'")
        array_min(path(args.head))
      case "max" =>
        require(args.length == 1, s"max(array): got '$argsRaw'")
        array_max(path(args.head))
      case "contains" =>
        require(args.length == 2, s"contains(subject, search): got '$argsRaw'")
        dtype(args.head) match {
          case _: ArrayType => array_contains(path(args.head), va(args(1)))
          case StringType => path(args.head).contains(va(args(1)))
          case dt => throw new IllegalArgumentException(
            s"jmespath contains() needs array/string subject, got $dt")
        }
      case "starts_with" =>
        require(args.length == 2,
          s"starts_with(subject, prefix): got '$argsRaw'")
        path(args.head).startsWith(va(args(1)))
      case "to_number" =>
        // jmespath returns null for an unparsable string — try_cast, not
        // an ANSI cast that would fail the whole scan on one bad row
        require(args.length == 1, s"to_number(arg): got '$argsRaw'")
        va(args.head).try_cast("double")
      case "map" =>
        // map(&expr, array): expr is a dotted field path applied to each
        // element — a transform() HOF, still a pure codegen projection
        require(args.length == 2 && args.head.startsWith("&"),
          s"map(&expr, array): got '$argsRaw'")
        transform(path(args(1)), jmesKeyRef(args.head))
      case "ends_with" =>
        require(args.length == 2, s"ends_with(subject, suffix): got '$argsRaw'")
        path(args.head).endsWith(va(args(1)))
      case "to_string" =>
        require(args.length == 1, s"to_string(arg): got '$argsRaw'")
        va(args.head).cast("string")
      case "abs" | "ceil" | "floor" =>
        require(args.length == 1, s"$fn(number): got '$argsRaw'")
        fn match {
          case "abs" => abs(va(args.head))
          case "ceil" => ceil(va(args.head))
          case _ => floor(va(args.head))
        }
      case "sum" =>
        // jmespath sum([]) is 0; fold in the double domain like jmespath's
        // number type
        require(args.length == 1, s"sum(array): got '$argsRaw'")
        aggregate(path(args.head), lit(0.0), (acc, x) => acc + x.cast("double"))
      case "avg" =>
        // avg of an empty array is null, per the spec
        require(args.length == 1, s"avg(array): got '$argsRaw'")
        val arr = path(args.head)
        when(size(arr) > 0,
          aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))
            / size(arr))
      case "min_by" | "max_by" =>
        require(args.length == 2 && args(1).startsWith("&"),
          s"$fn(array, &key): got '$argsRaw'")
        val key = jmesKeyRef(args(1))
        val arr = path(args.head)
        // null-keyed elements sort AWAY from the chosen end, so they can
        // never beat a real key (a bare <-comparator would leave them
        // wherever TimSort found them — an arbitrary wrong answer)
        val nullsLose = if (fn == "min_by") 1 else -1
        val sorted = array_sort(arr, (a, b) =>
          when(key(a).isNull && key(b).isNull, 0)
            .when(key(a).isNull, nullsLose)
            .when(key(b).isNull, -nullsLose)
            .when(key(a) < key(b), -1)
            .when(key(a) > key(b), 1)
            .otherwise(0))
        // null for an empty array (jmespath semantics) — a bare
        // element_at would THROW under ANSI instead
        when(size(arr) > 0,
          if (fn == "min_by") element_at(sorted, 1) else element_at(sorted, -1))
      case "not_null" =>
        require(args.nonEmpty, s"not_null(a, b, ...): got '$argsRaw'")
        // jmespath is dynamically typed; mixed-type args coerce to their
        // string rendering rather than tripping ANSI numeric casts
        val cs = args.map(va)
        val dts = cs.map(c => df.select(c).schema.head.dataType).distinct
        if (dts.length <= 1) coalesce(cs: _*)
        else coalesce(cs.map(_.cast("string")): _*)
    }
  }

  /** An `&expression` reference (sort_by/min_by/max_by keys): a DOTTED
    * field path applied to an array element — `&v`, `&m.score` both
    * resolve by getField descent. */
  private def jmesKeyRef(arg: String): Column => Column = {
    val fields = arg.stripPrefix("&").trim.split("\\.").toSeq
    require(fields.nonEmpty && fields.forall(f =>
        f.nonEmpty && !f.contains('[') && !f.contains('(')),
      s"jmespath &expression must be a dotted field path: '$arg'")
    e => fields.foldLeft(e)(_.getField(_))
  }

  /** A function VALUE argument: a [[jmesLiteral]] shape (quoted string /
    * number / boolean), `@`, or a dotted path against the current root. */
  private def jmesValueArg(df: DataFrame, a: String): Column = a match {
    case "@" => jmesCurrent(df)
    case l if (l.startsWith("'") && l.endsWith("'") && l.length >= 2) ||
        l == "true" || l == "false" || l.matches("-?\\d+(\\.\\d+)?") =>
      jmesLiteral(l)
    case p =>
      require(!p.contains('[') && !p.contains('('),
        s"jmespath function args are literals, '@' or dotted paths: '$p'")
      col(p)
  }

  private def jmesLiteral(raw: String): Column = raw match {
    case s if s.startsWith("'") && s.endsWith("'") && s.length >= 2 =>
      lit(s.substring(1, s.length - 1))
    case "true"  => lit(true)
    case "false" => lit(false)
    case n => lit(BigDecimal(n).toDouble)
  }

  /** Reference `utils.normalize_col_names` (src/datachain/lib/utils.py:55):
    * lowercase, collapse non-[0-9a-z] runs to "_", strip edge "_", then make
    * the result a unique identifier with a `cN_` counter prefix on collision
    * or non-identifier (keeping earlier names' claims, including `existing`
    * columns already in the output like "split"). Returns originals→new in
    * input order. */
  private[graft] def normalizeColNames(existing: Seq[String],
                                       cols: Seq[String]): Seq[(String, String)] = {
    val taken = scala.collection.mutable.Set.empty[String]
    val orgSet = (existing ++ cols).toSet
    var counter = 0
    def isIdent(s: String): Boolean =
      s.nonEmpty && (s.head.isLetter || s.head == '_') &&
        s.forall(c => c.isLetterOrDigit || c == '_')
    val all = (existing ++ cols).map { org =>
      val base = "[^0-9a-z]+".r.replaceAllIn(org.toLowerCase, "_")
        .stripPrefix("_").stripSuffix("_")
      var gen = base
      while (!isIdent(gen) || taken(gen) || (gen != org && orgSet(gen))) {
        gen = if (base.nonEmpty) s"c${counter}_$base" else s"c$counter"
        counter += 1
      }
      taken += gen
      org -> gen
    }
    all.drop(existing.length)
  }

  /**
   * read_hf — parquet bridge over a HuggingFace-exported dataset directory
   * (reference: src/datachain/lib/dc/hf.py:17, lib/hf.py:123 stream_splits).
   * The reference streams rows from `datasets.load_dataset`; the public
   * interchange format this bridge consumes is the hub's parquet export — a
   * dataset root with one subdirectory per split, each holding `*.parquet`.
   * Reference semantics kept:
   *  - `split` selects one split; empty reads ALL splits found
   *  - a `split` column is prepended only when more than one split is read
   *    (reference `hf.py` adds it when `len(ds_dict) > 1`)
   *  - column names are normalized exactly like `utils.normalize_col_names`
   *  - `limit > 0` caps rows per split (reference `take(limit)`)
   * Scale shape: the driver lists only the split directories (one metadata
   * round-trip); each split is a plain distributed parquet scan and the
   * per-split union is a zero-shuffle plan concat, so pushdown/pruning reach
   * every leaf scan untouched.
   */
  def readHf(spark: SparkSession, path: String, split: String = "",
             limit: Int = 0): Chain = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val splits =
      if (split.nonEmpty) Seq(split)
      else fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(_.startsWith(".")).sorted.toSeq
    require(splits.nonEmpty, s"no split directories under $path")
    val multi = splits.length > 1
    val frames = splits.map { sp =>
      val df0 = spark.read.parquet(new org.apache.hadoop.fs.Path(root, sp).toString)
      val df1 = if (limit > 0) df0.limit(limit) else df0
      val renamed = normalizeColNames(if (multi) Seq("split") else Nil,
          df1.columns.toSeq)
        .foldLeft(df1) { case (d, (org, norm)) =>
          if (org == norm) d else d.withColumnRenamed(org, norm)
        }
      if (multi) renamed.select(lit(sp).as("split") +: renamed.columns
        .map(c => col(s"`$c`")): _*)
      else renamed
    }
    // limit is part of the chain identity: two readHf chains differing only
    // in limit must not share a content hash, or checkpoint reuse would
    // hand back the truncated materialization
    new Chain(frames.reduce(_.unionByName(_)),
      OpTree.empty.append("read_hf", path, split, limit.toString))
  }

  /** read_values (reference: src/datachain/lib/dc/values.py:18). */
  def readValues[T <: Product : Encoder](spark: SparkSession, rows: Seq[T]): Chain =
    new Chain(spark.createDataset(rows).toDF(), OpTree.empty.append("read_values"))

  /** read_records: rows as maps + explicit schema
    * (reference: src/datachain/lib/dc/records.py:21). */
  def readRecords(spark: SparkSession, rows: Seq[Row],
                  schema: org.apache.spark.sql.types.StructType): Chain =
    new Chain(
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema),
      OpTree.empty.append("read_records"))

  /** read_database via JDBC (reference: src/datachain/lib/dc/database.py:298).
    * Exercised for real against embedded Derby (ships with Spark's jars) in
    * the q_read_database gate and IoSpec; [[readDatabasePartitioned]] is the
    * scale path. */
  def readDatabase(spark: SparkSession, url: String, query: String,
                   props: java.util.Properties = new java.util.Properties())
      : Chain =
    new Chain(spark.read.jdbc(url, s"($query) AS q", props),
      OpTree.empty.append("read_database", url, query))

  /** Partitioned JDBC read — the 100 TB-side shape: `numPartitions`
    * executors each pull a `partitionColumn` range slice concurrently
    * instead of one connection streaming the whole result set
    * (reference `read_database`'s engine-side batching, database.py:325). */
  def readDatabasePartitioned(spark: SparkSession, url: String, query: String,
                              partitionColumn: String, lowerBound: Long,
                              upperBound: Long, numPartitions: Int,
                              props: java.util.Properties =
                                new java.util.Properties()): Chain =
    new Chain(spark.read.jdbc(url, s"($query) AS q", partitionColumn,
        lowerBound, upperBound, numPartitions, props),
      OpTree.empty.append("read_database", url, query,
        s"$partitionColumn/$numPartitions"))
}
