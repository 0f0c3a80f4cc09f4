package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Nested "signal" schema helpers — graft keeps nesting native in Spark
 * `StructType`s instead of the reference's `__`-flattened physical columns
 * (reference: src/datachain/lib/signal_schema.py, flattening convention
 * src/datachain/data_storage/schema.py:32). Flatten/unflatten exist only at
 * the storage/interop boundary (e.g. CSV export) and round-trip losslessly.
 */
object SignalSchema {

  val Delimiter = "__"

  /** Resolve a dotted signal path ("file.path") to a Column. */
  def resolve(path: String): Column = col(path)

  /** All leaf paths of a schema, dotted (e.g. "file.path"). */
  def leafPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => leafPaths(s, p)
        case _             => Seq(p)
      }
    }

  /** Top-level signal roots that `path` belongs to ("file.path" -> "file"). */
  def rootOf(path: String): String = path.split('.').head

  /** Flatten nested struct columns to `__`-joined flat columns. The
    * delimiter is a CONVENTION, not an escape (the reference's physical
    * layout): a flat column whose name already contains `__` reads as a
    * nested path on the way back — by design (`sys__id` IS `sys.id`).
    * What cannot be allowed is two DIFFERENT inputs producing the same
    * flat name (struct a{b} beside a literal a__b) — that would write
    * duplicate columns silently, so it fails loudly here. */
  def flatten(df: DataFrame): DataFrame = {
    val cols = leafPaths(df.schema).map { p =>
      col(p).as(p.replace(".", Delimiter))
    }
    val names = leafPaths(df.schema).map(_.replace(".", Delimiter))
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    require(dups.isEmpty,
      s"flatten: colliding flat names ${dups.mkString(", ")} — a nested " +
        "path flattens onto an existing column; rename one side")
    df.select(cols: _*)
  }

  /** Inverse of [[flatten]]: rebuild structs from `__`-joined column
    * names. Lossless for VALUES with one documented exception: a flat
    * format cannot distinguish a NULL struct from a struct of all-null
    * fields (both flatten to all-null leaf columns), so a null nested
    * signal returns as a non-null struct with null fields — the same
    * identification every flat-table system (including the reference's
    * `__` physical layout) makes. */
  def unflatten(df: DataFrame): DataFrame = {
    // Group top-level prefixes; recursively rebuild nested structs.
    def build(names: Seq[(List[String], String)]): Seq[Column] = {
      names.groupBy(_._1.head).toSeq.sortBy {
        case (root, _) => names.indexWhere(_._1.head == root)
      }.map { case (root, members) =>
        if (members.size == 1 && members.head._1.size == 1)
          col(members.head._2).as(root)
        else {
          val children = members.map { case (segs, flat) => (segs.tail, flat) }
          struct(build(children): _*).as(root)
        }
      }
    }
    val parts = df.schema.fieldNames.toSeq.map(n => (n.split(Delimiter).toList, n))
    df.select(build(parts): _*)
  }

  /**
   * Merge-collision renaming: right-side top-level signals whose name
   * collides with a left-side signal get the `rname` prefix, mirroring
   * `generate_merge_root_mapping`
   * (reference: src/datachain/lib/signal_schema.py:85-135).
   * Returns right-root -> new-name (identity when no collision).
   * Two-phase: every NON-colliding right root claims its own name
   * FIRST, so a collision rename can never steal an existing right
   * column's name (left(name) + right(name, right_name) maps name ->
   * right_right_name, never onto the live right_name — which would
   * have produced two identically-named columns downstream).
   */
  def mergeRootMapping(leftRoots: Seq[String], rightRoots: Seq[String],
                       rname: String = "right_"): Map[String, String] = {
    val left = leftRoots.toSet
    val taken = scala.collection.mutable.Set[String](leftRoots: _*)
    rightRoots.filterNot(left.contains).foreach(taken += _)
    rightRoots.map { r =>
      if (!left.contains(r)) r -> r
      else {
        // First free candidate: right_x, right_right_x, ...
        var cand = rname + r
        while (taken.contains(cand)) cand = rname + cand
        taken += cand
        r -> cand
      }
    }.toMap
  }

  /** Serialize a schema to JSON (stored in catalog version metadata). */
  def toJson(schema: StructType): String = schema.json

  def fromJson(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]
}
