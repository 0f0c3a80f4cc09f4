package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute

/**
 * Per-file column min/max statistics for catalog data skipping — the
 * Delta-style file-pruning layer on NON-partition columns (the reference
 * leans on its warehouse's SQLite/ClickHouse indexes for selective reads;
 * on a 100 TB parquet lake the equivalent lever is skipping whole files
 * from footer metadata before the scan is even planned).
 *
 * Harvest reads ONLY parquet footers (a few KB per file, no data pages),
 * fanned out over executors, and lands in `stats.json` beside `meta.json`
 * in the immutable version dir. Pruning conservatively keeps any file the
 * evaluator cannot prove irrelevant: unsupported predicate shapes, missing
 * stats, or unsupported column types all degrade to "keep", so a pruned
 * read NEVER loses rows — the predicate is still applied to what's read.
 */
/** JVM-wide guard for the few remaining session-global conf flips
  * (partition-inference off, packing targets): concurrent flips would
  * cross-restore — B captures A's flipped value as its "previous" and the
  * session ends permanently mis-configured. Reentrant per thread. */
private[graft] object ConfFlip {
  val lock = new Object
}

object FileStats {

  /** One column's footer stats aggregated across a file's row groups.
    * `kind` is "l" (integral, long-exact), "d" (floating), or "s" (UTF-8
    * string); min/max are held in the matching representation. */
  final case class ColStats(kind: String, minL: Long, maxL: Long,
                            minD: Double, maxD: Double,
                            minS: String, maxS: String, nulls: Long)

  final case class FileStat(file: String, rows: Long,
                            cols: Map[String, ColStats])

  /** Shared ceiling for broadcasting per-FILE metadata lists (touched
    * files, envelope bins): past ~64k entries the list can approach
    * broadcast limits, so joins fall back to a shuffled exchange. One
    * constant for every metadata-join arm — retune it in one place. */
  val metaBroadcastMax = 65536

  /** Footer-only stats for one parquet file. Columns whose statistics are
    * absent/empty, or whose physical type we don't evaluate, are simply
    * not recorded (→ never pruned on). */
  def readFooter(path: String, conf: Configuration): FileStat = {
    val in = HadoopInputFile.fromPath(new HPath(path), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks
      var rows = 0L
      val acc = scala.collection.mutable.Map[String, ColStats]()
      val bad = scala.collection.mutable.Set[String]()
      val it = blocks.iterator()
      while (it.hasNext) {
        val b = it.next()
        rows += b.getRowCount
        val cit = b.getColumns.iterator()
        while (cit.hasNext) {
          val c = cit.next()
          // top-level leaves only: nested paths don't map 1:1 to columns
          if (c.getPath.size == 1) {
            val name = c.getPath.toDotString
            val st = c.getStatistics
            val prim = c.getPrimitiveType
            if (st == null || bad(name) || st.isEmpty ||
                !st.hasNonNullValue) {
              // a single stats-less row group poisons the whole file's
              // entry for that column (can't bound what we didn't see) —
              // unless the group is all-null, where nulls still count
              if (st != null && st.isNumNullsSet && st.getNumNulls == b.getRowCount &&
                  acc.contains(name)) {
                val p = acc(name)
                // an earlier group may have left the -1 "unknown" sentinel
                // (num_nulls unset) — adding onto it would FABRICATE a
                // count (-1 + 1 = 0 claims "no nulls" over a null row and
                // IS NULL pruning would drop the group); propagate unknown
                // exactly like merge() does
                acc(name) = p.copy(nulls =
                  if (p.nulls < 0) -1L else p.nulls + st.getNumNulls)
              } else { bad += name; acc.remove(name) }
            } else {
              val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
              val next: Option[ColStats] = prim.getPrimitiveTypeName match {
                case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64
                    if plainIntegral(prim.getLogicalTypeAnnotation) =>
                  val mn = st.genericGetMin.asInstanceOf[Number].longValue
                  val mx = st.genericGetMax.asInstanceOf[Number].longValue
                  Some(ColStats("l", mn, mx, 0, 0, null, null, nulls))
                case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                  val mn = st.genericGetMin.asInstanceOf[Number].doubleValue
                  val mx = st.genericGetMax.asInstanceOf[Number].doubleValue
                  // ±Inf/NaN footer stats (parquet-mr propagates them) would
                  // break both the JSON meta and BigDecimal pruning — treat
                  // the column as stats-less instead (file is always kept)
                  if (java.lang.Double.isFinite(mn) && java.lang.Double.isFinite(mx))
                    Some(ColStats("d", 0, 0, mn, mx, null, null, nulls))
                  else None
                case PrimitiveTypeName.BINARY
                    if isUtf8(prim.getLogicalTypeAnnotation) =>
                  val mn = st.minAsString
                  val mx = st.maxAsString
                  Some(ColStats("s", 0, 0, 0, 0, mn, mx, nulls))
                case _ => None
              }
              next match {
                // a poisoned group (e.g. non-finite double stats) evicts
                // any bounds accumulated from EARLIER groups and blocks
                // later ones — partial envelopes would exclude the rows
                // the poisoned group holds and prune files that match
                case None => bad += name; acc.remove(name)
                case Some(s) if !bad(name) =>
                  acc(name) = acc.get(name).map(merge(_, s)).getOrElse(s)
                case _ =>
              }
            }
          }
        }
      }
      FileStat(path, rows, acc.toMap)
    } finally reader.close()
  }

  private def isUtf8(l: LogicalTypeAnnotation): Boolean =
    l != null && l.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]

  /** INT32/INT64 whose stored value IS the logical value: no annotation,
    * or a signed int annotation. Dates/timestamps/times (epoch encodings)
    * and decimals (unscaled storage) would compare wrongly as raw longs. */
  private def plainIntegral(l: LogicalTypeAnnotation): Boolean = l match {
    case null => true
    case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
    case _ => false
  }

  private def merge(a: ColStats, b: ColStats): ColStats = {
    val nulls = if (a.nulls < 0 || b.nulls < 0) -1L else a.nulls + b.nulls
    a.kind match {
      case "l" => a.copy(minL = math.min(a.minL, b.minL),
        maxL = math.max(a.maxL, b.maxL), nulls = nulls)
      case "d" => a.copy(minD = math.min(a.minD, b.minD),
        maxD = math.max(a.maxD, b.maxD), nulls = nulls)
      case _ =>
        // combine in UTF8String BYTE order — the domain the footer stats
        // and the pruning comparator (cmpLE) live in. Java String <= is
        // UTF-16 code-unit order and disagrees past the BMP: picking an
        // emoji (surrogate pair) over U+FFFF as the file min would let
        // cmpLE prove `lo > literal` for a file that contains a match.
        def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        a.copy(
          minS = if (u(a.minS).compareTo(u(b.minS)) <= 0) a.minS else b.minS,
          maxS = if (u(a.maxS).compareTo(u(b.maxS)) >= 0) a.maxS else b.maxS,
          nulls = nulls)
    }
  }

  /** `file` relative to `baseDir`, comparing URI PATH components so the
    * scheme-qualified names executors report (file://…, hdfs://…) strip
    * against a plain base path. A RELATIVE base (catalog on a relative
    * warehouse root) is absolutized first — otherwise every file would
    * fall through to the basename fallback and a partitioned layout
    * would record dangling keys (subdir lost → pruned reads 404 instead
    * of degrading). Last resorts: the suffix after the catalog's own
    * `/data/` anchor, then the basename. */
  private[graft] def relativize(baseDir: String, file: String): String = {
    val baseUri = new HPath(baseDir).toUri
    val basePath =
      if (baseUri.getScheme == null && !baseUri.getPath.startsWith("/"))
        java.nio.file.Paths.get(baseDir).toAbsolutePath.normalize.toString
      else baseUri.getPath
    val base = basePath.stripSuffix("/")
    val f = new HPath(file).toUri.getPath
    if (f.startsWith(base + "/")) f.substring(base.length + 1)
    else {
      val anchor = f.lastIndexOf("/data/")
      if (anchor >= 0) f.substring(anchor + "/data/".length)
      else f.substring(f.lastIndexOf('/') + 1)
    }
  }

  /** Recursive parquet listing (partitioned versions nest files under
    * key=value dirs) — paths only, the one thing the driver holds in
    * every tier. */
  private def listParquet(dataDir: String): Seq[String] = {
    val conf = new Configuration()
    val d = new HPath(dataDir)
    val fs = d.getFileSystem(conf)
    val it = fs.listFiles(d, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        files += f.getPath.toString
    }
    files.toSeq
  }

  /** Harvest stats for every data file of a freshly written version —
    * footer reads fan out over executors (one small metadata read per
    * file; at 100 TB with ~100k files this is seconds, not a rescan). */
  def harvest(spark: SparkSession, dataDir: String,
              listed: Option[Seq[String]] = None): Seq[FileStat] = {
    val files = listed.getOrElse(listParquet(dataDir))
    // Driver-inline tier: a footer is a few-KB metadata read (~1-3 ms
    // local), while even an empty Spark job costs tens of ms of scheduling
    // — so small versions read their footers right here and save one job
    // per save/mutation. Past the threshold the harvest fans out on
    // executors exactly as before (the 100 TB path: ~100k footers in
    // parallel, never a rescan).
    val inlineMax =
      try spark.conf.get("graft.stats.harvestInlineFiles", "32").toInt
      catch { case scala.util.control.NonFatal(_) => 32 }
    val stats =
      if (files.isEmpty) Seq.empty[FileStat]
      else if (files.size <= inlineMax)
        files.toSeq.map(readFooter(_, new Configuration()))
      else spark.sparkContext
        .parallelize(files.toSeq, math.min(files.size, 32))
        .map(p => readFooter(p, new Configuration()))
        .collect().toSeq
    stats.map(s => s.copy(file = relativize(dataDir, s.file)))
  }

  // ---- executor-written stats index: the many-file tier ----
  // stats.json collects one FileStat per file to the driver and parses
  // driver-side per version — fine at ~100k files, a driver-memory/parse
  // bottleneck at millions. Past `graft.stats.inlineMaxFiles` the same
  // footer harvest lands as a parquet table under `stats/` written BY
  // the executors (the blooms/ precedent): the driver never materializes
  // a FileStat at build time, and the read side loads only the
  // predicate's columns plus the per-file census rows.

  /** One flat row of the stats index. `col == null` marks the file's
    * CENSUS row — it carries the row count and is the completeness
    * witness (the index must cover EVERY data file or not exist at
    * all, the same all-or-nothing invariant as stats.json). */
  final case class StatRow(file: String, rows: Long, col: Option[String],
                           kind: Option[String],
                           minL: Option[Long], maxL: Option[Long],
                           minD: Option[Double], maxD: Option[Double],
                           minS: Option[String], maxS: Option[String],
                           nulls: Option[Long])

  private def toRows(s: FileStat): Seq[StatRow] =
    StatRow(s.file, s.rows, None, None, None, None, None, None, None,
      None, None) +:
      s.cols.toSeq.sortBy(_._1).map { case (n, c) =>
        StatRow(s.file, s.rows, Some(n), Some(c.kind),
          if (c.kind == "l") Some(c.minL) else None,
          if (c.kind == "l") Some(c.maxL) else None,
          if (c.kind == "d") Some(c.minD) else None,
          if (c.kind == "d") Some(c.maxD) else None,
          if (c.kind == "s") Option(c.minS) else None,
          if (c.kind == "s") Option(c.maxS) else None,
          Some(c.nulls))
      }

  private def fromRows(rows: Seq[org.apache.spark.sql.Row]): Seq[FileStat] = {
    def opt[T](r: org.apache.spark.sql.Row, n: String): Option[T] = {
      val i = r.fieldIndex(n)
      if (r.isNullAt(i)) None else Some(r.getAs[T](i))
    }
    rows.map(r => StatRow(r.getAs[String]("file"), r.getAs[Long]("rows"),
        opt[String](r, "col"), opt[String](r, "kind"),
        opt[Long](r, "minL"), opt[Long](r, "maxL"),
        opt[Double](r, "minD"), opt[Double](r, "maxD"),
        opt[String](r, "minS"), opt[String](r, "maxS"),
        opt[Long](r, "nulls")))
      .groupBy(_.file).toSeq
      .map { case (file, rs) => statFromRows(file, rs) }
  }

  /** Build the parquet stats index for a data dir: footer harvest on
    * executors, rows written straight to `outDir` — O(1) driver memory
    * at any file count. Clustered by column name so a wanted-columns
    * read prunes row groups on `col`. */
  def writeStatsIndex(spark: SparkSession, dataDir: String,
                      outDir: String,
                      listed: Option[Seq[String]] = None): Unit = {
    val files = listed.getOrElse(listParquet(dataDir))
    if (files.isEmpty) return
    import spark.implicits._
    val base = dataDir
    // index-write parallelism scales with the file count (a fixed 4
    // would serialize a many-million-file index into 4 tasks); range
    // clustering on (col, file) keeps a wanted-columns read prunable
    // by parquet row-group stats on `col`
    val parts = math.max(4, math.min(2048, files.size / 25000)).toInt
    spark.createDataset(spark.sparkContext
        .parallelize(files, math.min(files.size, 64))
        .flatMap { p =>
          val s = readFooter(p, new Configuration())
          toRows(s.copy(file = relativize(base, s.file)))
        })
      .repartitionByRange(parts, org.apache.spark.sql.functions.col("col"),
        org.apache.spark.sql.functions.col("file"))
      .write.mode("errorifexists").parquet(outDir)
  }

  /** Rebuild one file's FileStat from its index rows — the shared
    * builder of the driver collect path and the distributed cogroup. */
  private def statFromRows(file: String, rs: Seq[StatRow]): FileStat = {
    val census = rs.find(_.col.isEmpty)
    val nRows = census.map(_.rows).getOrElse(rs.head.rows)
    val cols = rs.iterator.filter(_.col.isDefined).map { r =>
      val cs = r.kind.get match {
        case "l" => ColStats("l", r.minL.get, r.maxL.get, 0, 0, null, null,
          r.nulls.get)
        case "d" => ColStats("d", 0, 0, r.minD.get, r.maxD.get, null, null,
          r.nulls.get)
        case _ => ColStats("s", 0, 0, 0, 0, r.minS.orNull, r.maxS.orNull,
          r.nulls.get)
      }
      r.col.get -> cs
    }.toMap
    FileStat(file, nRows, cols)
  }

  /** Load the stats index restricted to `wanted` columns (None = all;
    * Some(Nil) = census only). Census rows always load — they carry the
    * file set and row counts, so a stats-covered file with none of the
    * wanted columns still appears (conservatively kept by pruning). */
  def readStatsIndex(spark: SparkSession, dir: String,
                     wanted: Option[Seq[String]]): Seq[FileStat] = {
    import org.apache.spark.sql.functions.col
    val base = spark.read.parquet(dir)
    val sel = wanted match {
      case Some(w) if w.isEmpty => base.where(col("col").isNull)
      case Some(w) =>
        base.where(col("col").isNull || col("col").isin(w.map(x => x: Any): _*))
      case None => base
    }
    fromRows(sel.collect().toSeq)
  }

  /**
   * Distributed file pruning over the parquet stats index — the read-side
   * twin of [[writeStatsIndex]]. The driver compiles the predicate once
   * ([[compile]]) into a small serializable tree with bloom hashes
   * precomputed, the executors rebuild each file's envelope from its
   * index rows (cogrouped with its bloom bitmaps when the version carries
   * a bloom index) and evaluate [[evalMay]], and ONLY the kept file names
   * cross to the driver — O(kept) driver memory at any file count, where
   * the collect path is O(files × predicate columns). Inline blooms
   * (blooms.json beside a parquet stats tier) broadcast as a map.
   * Returns (kept files, census total) from ONE pass over the index —
   * the census count rides the same aggregation instead of a second
   * index scan per pruned read.
   */
  def prunedFilesDistributed(spark: SparkSession, statsDir: String,
                             bloomDir: Option[String],
                             inlineBlooms: Map[String, Map[String, Array[Byte]]],
                             pred: PPred, wanted: Seq[String])
      : (Seq[String], Long) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val statRows = {
      val base = spark.read.parquet(statsDir)
      (if (wanted.isEmpty) base.where(col("col").isNull)
       else base.where(col("col").isNull ||
         col("col").isin(wanted.map(x => x: Any): _*))).as[StatRow]
    }
    val bloomRows: org.apache.spark.sql.Dataset[(String, String, Array[Byte])] =
      bloomDir match {
        case Some(d) if wanted.nonEmpty =>
          spark.read.parquet(d)
            .where(col("col").isin(wanted.map(x => x: Any): _*))
            .select(col("file"), col("col"), col("bloom"))
            .as[(String, String, Array[Byte])]
        case _ => spark.emptyDataset[(String, String, Array[Byte])]
      }
    val bc = spark.sparkContext.broadcast(inlineBlooms)
    val flags = statRows.groupByKey(_.file)
      .cogroup(bloomRows.groupByKey(_._1)) { (file, ss, bs) =>
        val rs = ss.toSeq
        // a bloom-only group (file absent from the census) adds nothing:
        // the census is the file set, all-or-nothing by construction
        if (rs.isEmpty) Iterator.empty
        else {
          val blooms = bs.map(t => t._2 -> t._3).toMap ++
            bc.value.getOrElse(file, Map.empty[String, Array[Byte]])
          Iterator.single(
            (file, evalMay(pred, statFromRows(file, rs), blooms)))
        }
      }
    // one aggregation row: (census total, kept names) — collect_list
    // skips the when()'s nulls, so only kept names materialize
    val F = org.apache.spark.sql.functions
    val r = flags.toDF("file", "keep")
      .agg(F.count(F.lit(1)).as("total"),
        F.collect_list(F.when(F.col("keep"), F.col("file"))).as("kept"))
      .head()
    (r.getSeq[String](1).sorted, r.getLong(0))
  }

  /** Census row count — the completeness check of the parquet tier. */
  def statsIndexCensusCount(spark: SparkSession, dir: String): Long = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(dir).where(col("col").isNull).count()
  }

  /** Total data rows across census rows, excluding `excluded` files —
    * the cow rowsAfter arithmetic without collecting the census (the
    * excluded side broadcasts; it is the touched list, small by
    * pruning's construction). */
  def statsIndexRowsExcluding(spark: SparkSession, dir: String,
                              excluded: Seq[String]): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, sum}
    import spark.implicits._
    val census = spark.read.parquet(dir).where(col("col").isNull)
    val rem =
      if (excluded.isEmpty) census
      else {
        // a very large touched list stops broadcasting (the "small by
        // pruning's construction" assumption has a ceiling) — the anti
        // join still runs, shuffled
        val ex = excluded.toDF("file")
        census.join(
          if (excluded.size <= metaBroadcastMax) broadcast(ex) else ex,
          Seq("file"), "left_anti")
      }
    val r = rem.agg(sum(col("rows"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /**
   * Footer-only max of one integral LEAF column (dotted path, e.g. the
   * nested `sys.id`) across `files` — the metadata pass copy-on-write
   * merges use to pick an insert-id base past every carried row. Returns
   * None when any file lacks usable stats for the leaf (caller falls
   * back to a column scan); Some(-1) for an empty file list so ids start
   * at 0. Fanned over executors like [[harvest]] past a handful of files.
   */
  def leafMaxLong(spark: SparkSession, files: Seq[String], leaf: String)
      : Option[Long] = {
    def one(p: String): Option[Long] = {
      val in = HadoopInputFile.fromPath(new HPath(p), new Configuration())
      val reader = ParquetFileReader.open(in)
      try {
        var mx = Long.MinValue
        var any = false
        var ok = true
        val it = reader.getFooter.getBlocks.iterator()
        while (it.hasNext && ok) {
          val b = it.next()
          var found = false
          val cit = b.getColumns.iterator()
          while (cit.hasNext && ok) {
            val c = cit.next()
            if (c.getPath.toDotString == leaf) {
              found = true
              val st = c.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) ok = false
              else c.getPrimitiveType.getPrimitiveTypeName match {
                case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
                  mx = math.max(mx,
                    st.genericGetMax.asInstanceOf[Number].longValue)
                  any = true
                case _ => ok = false
              }
            }
          }
          // a row group without the leaf at all: only all-null groups do
          // this for a present column — can't bound, fall back
          if (!found) ok = false
        }
        if (ok && any) Some(mx) else None
      } finally reader.close()
    }
    if (files.isEmpty) Some(-1L)
    else {
      val per =
        if (files.size <= 4) files.map(one)
        else spark.sparkContext
          .parallelize(files, math.min(files.size, 32))
          .map(one).collect().toSeq
      if (per.forall(_.isDefined)) Some(per.flatten.max) else None
    }
  }

  // ---- stats.json (de)serialization — same hand-rolled JSON style as
  // meta.json; values carry a kind tag so longs stay long-exact ----

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(stats: Seq[FileStat]): String = {
    val files = stats.map { f =>
      val cols = f.cols.toSeq.sortBy(_._1).map { case (n, c) =>
        val mm = c.kind match {
          case "l" => s""""min": ${c.minL}, "max": ${c.maxL}"""
          case "d" => s""""min": ${c.minD}, "max": ${c.maxD}"""
          case _ =>
            s""""min": "${esc(c.minS)}", "max": "${esc(c.maxS)}""""
        }
        s"""      "${esc(n)}": {"kind": "${c.kind}", $mm, "nulls": ${c.nulls}}"""
      }.mkString(",\n")
      // version-dir-RELATIVE names (plain files OR key=value/part-…) —
      // the version dir is immutable and relocatable
      s"""    {"file": "${esc(f.file)}", "rows": ${f.rows}, "cols": {
$cols
    }}"""
    }.mkString(",\n")
    s"""{
  "files": [
$files
  ]
}"""
  }

  def fromJson(json: String): Seq[FileStat] = {
    // minimal structural parse of our own writer's output
    val fileRe =
      ("\\{\"file\": \"((?:[^\"\\\\]|\\\\.)*)\", \"rows\": (\\d+), " +
        "\"cols\": \\{([\\s\\S]*?)\\n    \\}\\}").r
    val colRe =
      ("\"((?:[^\"\\\\]|\\\\.)*)\": \\{\"kind\": \"(l|d|s)\", " +
        "\"min\": (\"(?:[^\"\\\\]|\\\\.)*\"|[^,]+), " +
        "\"max\": (\"(?:[^\"\\\\]|\\\\.)*\"|[^,]+), " +
        "\"nulls\": (-?\\d+)\\}").r
    def unesc(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
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
        } else { sb += c; i += 1 }
      }
      sb.toString
    }
    fileRe.findAllMatchIn(json).map { fm =>
      val cols = colRe.findAllMatchIn(fm.group(3)).map { cm =>
        val kind = cm.group(2)
        val (mnS, mxS) = (cm.group(3).trim, cm.group(4).trim)
        val cs = kind match {
          case "l" => ColStats("l", mnS.toLong, mxS.toLong, 0, 0, null, null,
            cm.group(5).toLong)
          case "d" => ColStats("d", 0, 0, mnS.toDouble, mxS.toDouble,
            null, null, cm.group(5).toLong)
          case _ => ColStats("s", 0, 0, 0, 0,
            unesc(mnS.stripPrefix("\"").stripSuffix("\"")),
            unesc(mxS.stripPrefix("\"").stripSuffix("\"")),
            cm.group(5).toLong)
        }
        unesc(cm.group(1)) -> cs
      }.toMap
      FileStat(unesc(fm.group(1)), fm.group(2).toLong, cols)
    }.toSeq
  }

  // ---- per-file bloom index: equality pruning beyond min/max ----

  /** One pass over a freshly written data dir, grouped by file: a bloom
    * filter per (file, column) over CANONICALIZED xxhash64 keys
    * (integrals hash as bigint, floats as double), so the pruning side
    * can hash an analyzer-promoted literal identically. Supported column
    * types: integral, float/double, string — blooms are an explicit
    * caller request, so anything else fails fast. */
  /** The shared one-pass grouped aggregation: one row per data FILE, one
    * serialized bloom per requested column. */
  private def bloomAggDf(spark: SparkSession, dataDir: String,
                         cols: Seq[String], expectedItems: Long,
                         schema: Option[org.apache.spark.sql.types.StructType],
                         listed: Option[Seq[String]] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name, xxhash64}
    import org.apache.spark.sql.types._
    // partition-type inference OFF: a string partition key "00" must
    // hash as the string "00", not the inferred int 0 — the probe side
    // hashes in the RECORDED type domain, and a mismatch makes every
    // bloom lookup miss (pruned reads silently lose rows). Writers that
    // know the written frame's schema pass it (explicit-schema read, no
    // session-conf involvement); the fallback flips inference off under
    // the shared ConfFlip lock.
    // `listed`: explicit (possibly cross-dir, manifest-resolved) file
    // paths; reads without a basePath, so bloom columns must be DATA
    // columns there (a partition column would resolve null) — every
    // listed caller blooms data columns only.
    val df = (schema, listed) match {
      case (Some(s), Some(fs)) => spark.read.schema(s).parquet(fs: _*)
      case (Some(s), None) => spark.read.schema(s).parquet(dataDir)
      case (None, fs) => ConfFlip.lock.synchronized {
        val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
        val prevInfer = spark.conf.get(inferKey)
        spark.conf.set(inferKey, "false")
        try fs match {
          case Some(l) => spark.read.parquet(l: _*)
          case None => spark.read.parquet(dataDir)
        }
        finally spark.conf.set(inferKey, prevInfer)
      }
    }
    def canon(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(c).cast("bigint")
        case FloatType | DoubleType => col(c).cast("double")
        case StringType => col(c)
        case dt => throw new IllegalArgumentException(
          s"bloomCols: unsupported type $dt for column '$c' " +
            "(integral, float/double, string)")
      }
    val aggs = cols.map(c => graft.functions.GraftFunctions
      .bloom_agg(xxhash64(canon(c)), expectedItems).as(s"__bloom_$c"))
    df.groupBy(input_file_name().as("__f"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def buildBlooms(spark: SparkSession, dataDir: String, cols: Seq[String],
                  expectedItems: Long,
                  schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Map[String, Map[String, Array[Byte]]] = {
    bloomAggDf(spark, dataDir, cols, expectedItems, schema)
      .collect().map { r =>
        relativize(dataDir, r.getString(0)) -> cols.zipWithIndex.map {
          case (c, i) => c -> r.getAs[Array[Byte]](i + 1)
        }.toMap
      }.toMap
  }

  /** Executor-written bloom index: the same grouped pass as
    * `buildBlooms`, but the bitmaps land in a parquet index table
    * `(file, col, bloom)` written BY the executors — the driver never
    * materializes a single filter. At 100k files × ~100 KB bitmaps the
    * collect() path costs ~10 GB of driver heap; this one is O(1) driver
    * memory at any file count, and the read side prunes the index scan
    * to just the predicate's columns (`col IN (...)` pushed to parquet). */
  def writeBloomIndex(spark: SparkSession, dataDir: String, cols: Seq[String],
                      expectedItems: Long, outDir: String,
                      schema: Option[org.apache.spark.sql.types.StructType] =
                        None,
                      listed: Option[Seq[String]] = None): Unit = {
    import org.apache.spark.sql.functions.{array, col, explode, struct, udf, lit => flit}
    val pairs = cols.map(c =>
      struct(flit(c).as("col"), col(s"__bloom_$c").as("bloom")))
    // a Scala UDF is fine here: it runs once per FILE row (metadata
    // scale), never in the data path — and the version-dir-relative key
    // must survive partition subdirectories AND scheme-qualified names
    val rel = udf((f: String) => relativize(dataDir, f))
    bloomAggDf(spark, dataDir, cols, expectedItems, schema, listed)
      .select(rel(col("__f")).as("file"),
        explode(array(pairs: _*)).as("e"))
      .select(col("file"), col("e.col").as("col"), col("e.bloom").as("bloom"))
      .write.mode("errorifexists").parquet(outDir)
  }

  /** Load the parquet bloom index, restricted to `wanted` columns (None =
    * all). Only the predicate's columns cross to the driver — the index
    * scan itself is pruned by parquet row-group stats on `col`. */
  def readBloomIndex(spark: SparkSession, dir: String,
                     wanted: Option[Seq[String]])
      : Map[String, Map[String, Array[Byte]]] = {
    import org.apache.spark.sql.functions.col
    val base = spark.read.parquet(dir)
    val sel = wanted match {
      case Some(ws) if ws.nonEmpty => base.filter(col("col").isin(ws: _*))
      case Some(_) => return Map.empty
      case None => base
    }
    sel.collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) =>
        f -> rows.map(r => r.getString(1) -> r.getAs[Array[Byte]](2)).toMap
      }
  }

  def bloomsToJson(blooms: Map[String, Map[String, Array[Byte]]]): String = {
    val enc = java.util.Base64.getEncoder
    val files = blooms.toSeq.sortBy(_._1).map { case (f, cols) =>
      val cs = cols.toSeq.sortBy(_._1).map { case (c, b) =>
        s"""      "${esc(c)}": "${enc.encodeToString(b)}""""
      }.mkString(",\n")
      s"""    {"file": "${esc(f)}", "cols": {
$cs
    }}"""
    }.mkString(",\n")
    s"""{
  "files": [
$files
  ]
}"""
  }

  def bloomsFromJson(json: String): Map[String, Map[String, Array[Byte]]] = {
    val dec = java.util.Base64.getDecoder
    val fileRe =
      ("\\{\"file\": \"((?:[^\"\\\\]|\\\\.)*)\", \"cols\": \\{" +
        "([\\s\\S]*?)\\n    \\}\\}").r
    val colRe = "\"((?:[^\"\\\\]|\\\\.)*)\": \"([A-Za-z0-9+/=]*)\"".r
    fileRe.findAllMatchIn(json).map { fm =>
      val cols = colRe.findAllMatchIn(fm.group(2)).map { cm =>
        cm.group(1) -> dec.decode(cm.group(2))
      }.toMap
      fm.group(1) -> cols
    }.toMap
  }

  /** xxhash64 (seed 42, Spark semantics) of a literal value, tagged
    * with the DOMAIN it was hashed in ('l' integral / 'd' double /
    * 's' string). buildBlooms hashes each column in the domain of its
    * RECORDED type, so a probe may only use this hash when the file's
    * stats kind agrees — a cross-family literal (int literal against a
    * double-bloomed column: un-analyzed predicates reach the public
    * mayMatch/compile without the analyzer's promote-cast) must
    * re-hash in the column's own domain ([[hashInKind]]) or degrade to
    * keep. None for types blooms don't cover (→ no bloom pruning). */
  private def bloomHash(v: Any): Option[(Long, Char)] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types._
    val (litE, dom) = v match {
      case null => return None
      case n: Byte => (Literal(n.toLong, LongType), 'l')
      case n: Short => (Literal(n.toLong, LongType), 'l')
      case n: Int => (Literal(n.toLong, LongType), 'l')
      case n: Long => (Literal(n, LongType), 'l')
      case n: Float => (Literal(n.toDouble, DoubleType), 'd')
      case n: Double => (Literal(n, DoubleType), 'd')
      case s: org.apache.spark.unsafe.types.UTF8String =>
        (Literal(s, StringType), 's')
      case s: String =>
        (Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
          StringType), 's')
      case _ => return None
    }
    Some((new XxHash64(Seq(litE)).eval(null).asInstanceOf[Long], dom))
  }

  /** Hash the canonical literal in a REQUESTED domain — the file's
    * stats kind — when the predicate literal's own family differs.
    * None when the value cannot live in that domain (a fractional
    * literal on an integral column, a string on a numeric one): the
    * bloom then abstains and the range check decides. */
  private def hashInKind(v: Either[BigDecimal, String], kind: String)
      : Option[Long] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.types._
    def xx(l: Literal): Long =
      new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]
    (kind, v) match {
      case ("l", scala.Left(bd)) if bd.isValidLong =>
        Some(xx(Literal(bd.longValue, LongType)))
      case ("d", scala.Left(bd)) =>
        Some(xx(Literal(bd.toDouble, DoubleType)))
      case ("s", scala.Right(str)) => Some(xx(Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(str),
        StringType)))
      case _ => None
    }
  }

  /** Shared bloom probe for both evaluator paths: use the precomputed
    * hash when its domain matches the file's stats kind (the analyzed-
    * predicate common case), re-hash in the column's domain when they
    * differ, and ABSTAIN when the column has no stats row — without the
    * kind tag the bloom's build domain is unknowable, and a cross-domain
    * probe can falsely prune (bloom misses are not conservative). */
  private def bloomCheck(n: String, vE: Option[Either[BigDecimal, String]],
                         h: Option[(Long, Char)], f: FileStat,
                         blooms: Map[String, Array[Byte]]): Boolean =
    h match {
      case Some((hash, dom)) => blooms.get(n) match {
        case Some(bytes) =>
          val use = f.cols.get(n).map(_.kind) match {
            case Some(k) if k != dom.toString => vE.flatMap(hashInKind(_, k))
            case Some(_) => Some(hash)
            // no stats row: the bloom's build domain is unknowable, and a
            // cross-domain probe can FALSELY prune (bloom misses are not
            // conservative) — abstain rather than trust the precomputed
            // hash's domain
            case None => None
          }
          use match {
            case Some(hh) =>
              org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(bytes))
                .mightContainLong(hh)
            case None => true
          }
        case None => true
      }
      case None => true
    }

  private def bloomMay(a: Expression, v: Any,
                       blooms: Map[String, Array[Byte]],
                       f: FileStat): Boolean =
    attr(a) match {
      case Some(n) => bloomCheck(n, lit(v), bloomHash(v), f, blooms)
      case None => true
    }

  // ---- pruning evaluator: may this file contain a matching row? ----

  /**
   * Conservative satisfiability of `pred` against one file's stats:
   * returns false ONLY when the footer bounds prove no row can match.
   * Handles =, <, <=, >, >=, IN, BETWEEN-as-AND, IS [NOT] NULL over
   * literal comparisons on top-level columns, composed with AND/OR/NOT;
   * everything else (expressions over columns, casts, UDFs, unknown
   * columns) evaluates to "may match". When the version carries a bloom
   * index for a column, equality/IN literals additionally check
   * mightContain — the prune that works where per-file ranges overlap.
   */
  def mayMatch(pred: Expression, f: FileStat,
               blooms: Map[String, Array[Byte]] = Map.empty): Boolean =
    pred match {
    case And(l, r) => mayMatch(l, f, blooms) && mayMatch(r, f, blooms)
    case Or(l, r) => mayMatch(l, f, blooms) || mayMatch(r, f, blooms)
    case Not(child) => mayMatchNeg(child, f)
    case IsNull(a) => attr(a) match {
      case Some(n) => f.cols.get(n).forall(c => c.nulls != 0)
      case None => true
    }
    case IsNotNull(a) => attr(a) match {
      case Some(n) => f.cols.get(n) match {
        case Some(c) if c.nulls >= 0 => f.rows - c.nulls > 0
        case _ => true
      }
      case None => true
    }
    case EqualTo(a, Literal(v, _)) =>
      cmpMay(a, v, f, eq = true) && bloomMay(a, v, blooms, f)
    case EqualTo(Literal(v, _), a) =>
      cmpMay(a, v, f, eq = true) && bloomMay(a, v, blooms, f)
    case LessThan(a, Literal(v, _)) => rangeMay(a, f, lt = Some(v))
    case GreaterThan(Literal(v, _), a) => rangeMay(a, f, lt = Some(v))
    case LessThanOrEqual(a, Literal(v, _)) => rangeMay(a, f, le = Some(v))
    case GreaterThanOrEqual(Literal(v, _), a) => rangeMay(a, f, le = Some(v))
    case GreaterThan(a, Literal(v, _)) => rangeMay(a, f, gt = Some(v))
    case LessThan(Literal(v, _), a) => rangeMay(a, f, gt = Some(v))
    case GreaterThanOrEqual(a, Literal(v, _)) => rangeMay(a, f, ge = Some(v))
    case LessThanOrEqual(Literal(v, _), a) => rangeMay(a, f, ge = Some(v))
    case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { l =>
        val v = l.asInstanceOf[Literal].value
        cmpMay(a, v, f, eq = true) && bloomMay(a, v, blooms, f)
      }
    case EqualNullSafe(a, Literal(v, _)) => eqNsMay(a, v, f, blooms)
    case EqualNullSafe(Literal(v, _), a) => eqNsMay(a, v, f, blooms)
    case PrefixOf(a, p) => attr(a) match {
      case Some(n) => f.cols.get(n).forall(prefixMayC(_, utf8(p)))
      case None => true
    }
    case _ => true
  }

  /** `a <=> v`: a null literal behaves as isnull; a non-null literal
    * prunes exactly like equality (null rows simply don't match). */
  private def eqNsMay(a: Expression, v: Any, f: FileStat,
                      blooms: Map[String, Array[Byte]]): Boolean =
    if (v == null) attr(a) match {
      case Some(n) => f.cols.get(n).forall(c => c.nulls != 0)
      case None => true
    }
    else cmpMay(a, v, f, eq = true) && bloomMay(a, v, blooms, f)

  /** mayMatch(NOT child): true unless EVERY row provably matches child.
    * Only the cases where min==max can prove "always matches"; anything
    * else conservatively keeps the file. */
  private def mayMatchNeg(child: Expression, f: FileStat): Boolean =
    child match {
      case And(l, r) => mayMatchNeg(l, f) || mayMatchNeg(r, f)
      case Or(l, r) => mayMatchNeg(l, f) && mayMatchNeg(r, f)
      case Not(c) => mayMatch(c, f)
      case EqualTo(a, Literal(v, _)) => notAlwaysEq(a, v, f)
      case EqualTo(Literal(v, _), a) => notAlwaysEq(a, v, f)
      case IsNull(a) => attr(a) match {
        // NOT isnull may match unless the whole file is null
        case Some(n) => f.cols.get(n) match {
          case Some(c) => c.nulls < f.rows
          case None => true
        }
        case None => true
      }
      case IsNotNull(a) => attr(a) match {
        case Some(n) => f.cols.get(n).forall(c => c.nulls != 0)
        case None => true
      }
      case EqualNullSafe(a, Literal(v, _)) => notAlwaysEqNs(a, v, f)
      case EqualNullSafe(Literal(v, _), a) => notAlwaysEqNs(a, v, f)
      case PrefixOf(a, p) => attr(a) match {
        case Some(n) => f.cols.get(n).forall(prefixNegC(_, utf8(p)))
        case None => true
      }
      case _ => true
    }

  /** NOT(a <=> v): unlike NOT(a = v), NULL rows DO satisfy the negation
    * when v is non-null (<=> never returns null) — prunable only when
    * min == max == v AND the file provably holds zero nulls; for a null
    * literal, only when every row is null. */
  private def notAlwaysEqNs(a: Expression, v: Any, f: FileStat): Boolean =
    attr(a) match {
      case Some(n) => f.cols.get(n) match {
        case Some(c) =>
          if (v == null) !(c.nulls >= 0 && c.nulls == f.rows)
          else {
            val allEq = c.nulls == 0 && lit(v).exists(x =>
              (for { l <- lo(c); h <- hi(c) } yield l == x && h == x)
                .getOrElse(false))
            !allEq
          }
        case None => true
      }
      case None => true
    }

  private def notAlwaysEq(a: Expression, v: Any, f: FileStat): Boolean =
    (attr(a), lit(v)) match {
      case (Some(n), Some(x)) => f.cols.get(n) match {
        case Some(c) =>
          // NOT(a = v) matches some row iff a non-null value != v exists
          // (null rows fail the NOT too, three-valued); stats being
          // recorded implies at least one non-null value, so the file is
          // prunable exactly when min == max == v
          val allEq = (for { l <- lo(c); h <- hi(c) }
            yield l == x && h == x).getOrElse(false)
          !allEq
        case None => true
      }
      case _ => true
    }

  private def attr(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case a: UnresolvedAttribute if a.nameParts.size == 1 => Some(a.name)
    // the analyzer promotes comparisons by casting the COLUMN side
    // (int col vs long literal → Cast(col, long)); a widening integral
    // or float→double cast is value-identity, so the child's stats
    // bound the cast output exactly. Anything lossy stays opaque.
    case c: Cast if wideningCast(c) => attr(c.child)
    case _ => None
  }

  /** Fold a literal-side promote-cast into the literal itself: the
    * analyzer wraps the NARROWER side of a comparison, so `longCol < 50`
    * (int literal — the most common predicate shape there is) arrives
    * as `longCol < cast(50 as bigint)`, and a bare-Literal matcher
    * falls to the conservative arm — silently disabling pruning.
    * Evaluating the cast at compile time yields exactly the value the
    * runtime comparison uses; folding is restricted to
    * timezone-independent target domains (the stats domains), so the
    * fold can never drift from execution. A cast that throws at fold
    * time (ANSI overflow) stays unfolded → conservative. */
  private[graft] def foldLiteralCasts(e: Expression): Expression =
    e.transformUp {
      case c: Cast if c.child.isInstanceOf[Literal] &&
          foldableTarget(c.dataType) =>
        try Literal.create(
          c.eval(org.apache.spark.sql.catalyst.InternalRow.empty),
          c.dataType)
        catch { case scala.util.control.NonFatal(_) => c }
    }

  private def foldableTarget(
      t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  private def wideningCast(c: Cast): Boolean = {
    import org.apache.spark.sql.types._
    def rank(d: DataType): Int = d match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => -1
    }
    (c.child.dataType, c.dataType) match {
      case (f, t) if rank(f) > 0 && rank(t) >= rank(f) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** Comparable literal domain: BigDecimal for numerics, String for
    * strings — mirrors the two stats families. (scala.Left/Right spelled
    * out: catalyst.expressions._ shadows them with the string function.) */
  private def lit(v: Any): Option[Either[BigDecimal, String]] = v match {
    case null => None
    case n: Byte => Some(scala.Left(BigDecimal(n.toInt)))
    case n: Short => Some(scala.Left(BigDecimal(n.toInt)))
    case n: Int => Some(scala.Left(BigDecimal(n)))
    case n: Long => Some(scala.Left(BigDecimal(n)))
    case n: Float if java.lang.Float.isFinite(n) => Some(scala.Left(BigDecimal(n.toDouble)))
    case n: Double if java.lang.Double.isFinite(n) => Some(scala.Left(BigDecimal(n)))
    case d: java.math.BigDecimal => Some(scala.Left(BigDecimal(d)))
    case d: org.apache.spark.sql.types.Decimal => Some(scala.Left(d.toBigDecimal))
    case s: org.apache.spark.unsafe.types.UTF8String => Some(scala.Right(s.toString))
    case s: String => Some(scala.Right(s))
    case _ => None
  }

  private def lo(c: ColStats): Option[Either[BigDecimal, String]] = c.kind match {
    case "l" => Some(scala.Left(BigDecimal(c.minL)))
    // non-finite stats from older metas: unknown bound → never prune
    case "d" if java.lang.Double.isFinite(c.minD) => Some(scala.Left(BigDecimal(c.minD)))
    case "d" => None
    case _ => Some(scala.Right(c.minS))
  }
  private def hi(c: ColStats): Option[Either[BigDecimal, String]] = c.kind match {
    case "l" => Some(scala.Left(BigDecimal(c.maxL)))
    case "d" if java.lang.Double.isFinite(c.maxD) => Some(scala.Left(BigDecimal(c.maxD)))
    case "d" => None
    case _ => Some(scala.Right(c.maxS))
  }

  private def cmpLE(a: Either[BigDecimal, String],
                    b: Either[BigDecimal, String]): Option[Boolean] = (a, b) match {
    case (scala.Left(x), scala.Left(y)) => Some(x <= y)
    case (scala.Right(x), scala.Right(y)) =>
      // parquet footer min/max and Spark's string comparisons are both
      // unsigned UTF-8 byte order; Java String.compareTo is UTF-16
      // code-unit order and DISAGREES past the BMP (e.g. "￿" vs an
      // emoji surrogate pair) — compare in the domain the stats live in
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) <= 0)
    case _ => None // numeric literal vs string stats: type confusion → keep
  }

  // ---- prefix pruning (col.startsWith(p) / LIKE 'p%') ----
  // The path/URL-prefix filter is the single most common selective shape
  // on this engine's file-centric columns; a sorted byte range [min,max]
  // contains a p-prefixed string iff max >= p AND min's first |p| bytes
  // compare <= p. All comparisons run in unsigned UTF-8 byte order (the
  // domain parquet footer stats and Spark string ordering share).

  private def utf8(s: String): Array[Byte] =
    org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes

  private def cmpBytes(a: Array[Byte], aLen: Int, b: Array[Byte]): Int = {
    val n = math.min(aLen, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    aLen - b.length
  }

  private def startsWithBytes(s: Array[Byte], p: Array[Byte]): Boolean =
    s.length >= p.length && {
      var i = 0
      while (i < p.length && s(i) == p(i)) i += 1
      i == p.length
    }

  /** May a file with stats `c` hold a string starting with `p`? Missing
    * stats or a non-string column (type confusion) keep the file. */
  private def prefixMayC(c: ColStats, pb: Array[Byte]): Boolean =
    if (c.kind != "s" || c.minS == null || c.maxS == null) true
    else {
      val mx = utf8(c.maxS)
      val mn = utf8(c.minS)
      cmpBytes(mx, mx.length, pb) >= 0 &&
        cmpBytes(mn, math.min(mn.length, pb.length), pb) <= 0
    }

  /** NOT(startsWith): prunable only when every value in [min,max]
    * provably has the prefix — true iff BOTH bounds start with it (byte
    * order sandwiches everything between). Null rows fail the NOT too
    * (three-valued), so nulls never block the prune. */
  private def prefixNegC(c: ColStats, pb: Array[Byte]): Boolean =
    if (c.kind != "s" || c.minS == null || c.maxS == null) true
    else !(startsWithBytes(utf8(c.minS), pb) &&
      startsWithBytes(utf8(c.maxS), pb))

  /** Recognizes the two prefix-filter spellings: `startswith(col, 'p')`
    * and `col LIKE 'p%'` (single trailing %, no other wildcards, no
    * escape char in the body — anything else stays unsupported/keep). */
  private object PrefixOf {
    def unapply(e: Expression): Option[(Expression, String)] = e match {
      case StartsWith(a, Literal(p: org.apache.spark.unsafe.types.UTF8String, _)) =>
        Some((a, p.toString))
      case Like(a, Literal(p: org.apache.spark.unsafe.types.UTF8String, _), esc) =>
        val s = p.toString
        if (s.nonEmpty && s.last == '%' && {
          val body = s.dropRight(1)
          !body.exists(ch => ch == '%' || ch == '_' || ch == esc)
        }) Some((a, s.dropRight(1)))
        else None
      case _ => None
    }
  }

  private def cmpMay(a: Expression, v: Any, f: FileStat, eq: Boolean): Boolean =
    (attr(a), lit(v)) match {
      case (Some(n), Some(x)) => f.cols.get(n) match {
        case Some(c) =>
          (for { l <- lo(c); h <- hi(c); a1 <- cmpLE(l, x); a2 <- cmpLE(x, h) }
            yield a1 && a2).getOrElse(true)
        case None => true
      }
      case _ => true
    }

  private def rangeMay(a: Expression, f: FileStat,
                       lt: Option[Any] = None, le: Option[Any] = None,
                       gt: Option[Any] = None, ge: Option[Any] = None): Boolean =
    attr(a) match {
      case Some(n) => f.cols.get(n) match {
        case Some(c) =>
          def ok(bound: Option[Any], test: Either[BigDecimal, String] => Option[Boolean]) =
            bound.flatMap(b => lit(b).flatMap(test)).getOrElse(true)
          // col < x possible iff min < x; col > x possible iff max > x
          ok(lt, x => for { l <- lo(c); r <- cmpLE(x, l) } yield !r) &&
            ok(le, x => for { l <- lo(c); r <- cmpLE(l, x) } yield r) &&
            ok(gt, x => for { h <- hi(c); r <- cmpLE(h, x) } yield !r) &&
            ok(ge, x => for { h <- hi(c); r <- cmpLE(x, h) } yield r)
        case None => true
      }
      case None => true
    }

  // ---- compiled predicate: the executor-shippable form of mayMatch ----
  // Catalyst Expressions never leave the driver: `compile` lowers the
  // supported shapes into this closed serializable tree (literals in the
  // BigDecimal/String comparison domain, bloom hashes PREcomputed — the
  // xxhash64 of a literal is a constant), and `evalMay`/`evalNeg` mirror
  // mayMatch/mayMatchNeg arm for arm. PropertySpec pins the equivalence
  // `evalMay(compile(p), f, b) == mayMatch(p, f, b)` across a generated
  // predicate × stats matrix.

  sealed trait PPred extends Serializable
  final case class PAnd(l: PPred, r: PPred) extends PPred
  final case class POr(l: PPred, r: PPred) extends PPred
  final case class PNot(c: PPred) extends PPred
  final case class PIsNull(col: String) extends PPred
  final case class PIsNotNull(col: String) extends PPred
  /** op ∈ eq | lt | le | gt | ge; `v` None = uncomparable literal type
    * (→ range check passes), `bloomHash` only set for eq. */
  final case class PCmp(col: String, op: String,
                        v: Option[Either[BigDecimal, String]],
                        bloomHash: Option[(Long, Char)]) extends PPred
  final case class PIn(col: String,
                       vs: Seq[(Option[Either[BigDecimal, String]],
                         Option[(Long, Char)])]) extends PPred
  /** startsWith / LIKE 'p%' — the prefix in UTF-8 bytes. Array fields
    * default to reference equals/toString, which would destabilize the
    * kept-files cache key (every compile would render a fresh `[B@…`);
    * value-based overrides keep `$cp` renderings stable. */
  final case class PPrefix(col: String, p: Array[Byte]) extends PPred {
    override def equals(o: Any): Boolean = o match {
      case PPrefix(c2, p2) => col == c2 && java.util.Arrays.equals(p, p2)
      case _ => false
    }
    override def hashCode: Int =
      31 * col.hashCode + java.util.Arrays.hashCode(p)
    override def toString: String =
      s"PPrefix($col,${p.map(b => f"$b%02x").mkString})"
  }
  /** `col <=> v`; `nullLit` marks `<=> NULL` (≡ isnull). */
  final case class PEqNs(col: String, v: Option[Either[BigDecimal, String]],
                         bloomHash: Option[(Long, Char)],
                         nullLit: Boolean) extends PPred
  /** Unsupported shape — may always match (never prunes). */
  case object PAny extends PPred

  def compile(pred: Expression): PPred = {
    def cmp(op: String, a: Expression, v: Any): PPred = attr(a) match {
      case Some(n) =>
        PCmp(n, op, lit(v), if (op == "eq") bloomHash(v) else None)
      case None => PAny
    }
    pred match {
      case And(l, r) => PAnd(compile(l), compile(r))
      case Or(l, r) => POr(compile(l), compile(r))
      case Not(child) => PNot(compile(child))
      case IsNull(a) => attr(a).map(PIsNull).getOrElse(PAny)
      case IsNotNull(a) => attr(a).map(PIsNotNull).getOrElse(PAny)
      case EqualTo(a, Literal(v, _)) => cmp("eq", a, v)
      case EqualTo(Literal(v, _), a) => cmp("eq", a, v)
      case LessThan(a, Literal(v, _)) => cmp("lt", a, v)
      case GreaterThan(Literal(v, _), a) => cmp("lt", a, v)
      case LessThanOrEqual(a, Literal(v, _)) => cmp("le", a, v)
      case GreaterThanOrEqual(Literal(v, _), a) => cmp("le", a, v)
      case GreaterThan(a, Literal(v, _)) => cmp("gt", a, v)
      case LessThan(Literal(v, _), a) => cmp("gt", a, v)
      case GreaterThanOrEqual(a, Literal(v, _)) => cmp("ge", a, v)
      case LessThanOrEqual(Literal(v, _), a) => cmp("ge", a, v)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        attr(a) match {
          case Some(n) => PIn(n, vs.map { l =>
            val v = l.asInstanceOf[Literal].value
            (lit(v), bloomHash(v))
          })
          case None => PAny
        }
      case EqualNullSafe(a, Literal(v, _)) => eqNs(a, v)
      case EqualNullSafe(Literal(v, _), a) => eqNs(a, v)
      case PrefixOf(a, p) =>
        attr(a).map(n => PPrefix(n, utf8(p))).getOrElse(PAny)
      case _ => PAny
    }
  }

  private def eqNs(a: Expression, v: Any): PPred = attr(a) match {
    case Some(n) =>
      if (v == null) PEqNs(n, None, None, nullLit = true)
      else PEqNs(n, lit(v), bloomHash(v), nullLit = false)
    case None => PAny
  }

  def evalMay(p: PPred, f: FileStat,
              blooms: Map[String, Array[Byte]]): Boolean = {
    def cmpOk(n: String, v: Option[Either[BigDecimal, String]]): Boolean =
      v match {
        case None => true
        case Some(x) => f.cols.get(n) match {
          case Some(c) =>
            (for { l <- lo(c); h <- hi(c); a1 <- cmpLE(l, x); a2 <- cmpLE(x, h) }
              yield a1 && a2).getOrElse(true)
          case None => true
        }
      }
    def bloomOk(n: String, v: Option[Either[BigDecimal, String]],
                h: Option[(Long, Char)]): Boolean =
      bloomCheck(n, v, h, f, blooms)
    p match {
      case PAnd(l, r) => evalMay(l, f, blooms) && evalMay(r, f, blooms)
      case POr(l, r) => evalMay(l, f, blooms) || evalMay(r, f, blooms)
      case PNot(c) => evalNeg(c, f)
      case PIsNull(n) => f.cols.get(n).forall(c => c.nulls != 0)
      case PIsNotNull(n) => f.cols.get(n) match {
        case Some(c) if c.nulls >= 0 => f.rows - c.nulls > 0
        case _ => true
      }
      case PCmp(n, "eq", v, h) => cmpOk(n, v) && bloomOk(n, v, h)
      case PCmp(n, op, vOpt, _) => vOpt match {
        case None => true
        case Some(x) => f.cols.get(n) match {
          case Some(c) => (op match {
            case "lt" => for { l <- lo(c); r <- cmpLE(x, l) } yield !r
            case "le" => for { l <- lo(c); r <- cmpLE(l, x) } yield r
            case "gt" => for { h <- hi(c); r <- cmpLE(h, x) } yield !r
            case _ => for { h <- hi(c); r <- cmpLE(x, h) } yield r
          }).getOrElse(true)
          case None => true
        }
      }
      case PIn(n, vs) => vs.exists { case (v, h) =>
        cmpOk(n, v) && bloomOk(n, v, h) }
      case PPrefix(n, pb) => f.cols.get(n).forall(prefixMayC(_, pb))
      case PEqNs(n, v, h, isNullLit) =>
        if (isNullLit) f.cols.get(n).forall(c => c.nulls != 0)
        else cmpOk(n, v) && bloomOk(n, v, h)
      case PAny => true
    }
  }

  /** evalMay(PNot(c)): true unless every row provably matches `c` —
    * mirrors [[mayMatchNeg]] (blooms never participate in negation). */
  private def evalNeg(p: PPred, f: FileStat): Boolean = p match {
    case PAnd(l, r) => evalNeg(l, f) || evalNeg(r, f)
    case POr(l, r) => evalNeg(l, f) && evalNeg(r, f)
    case PNot(c) => evalMay(c, f, Map.empty)
    case PCmp(n, "eq", Some(x), _) => f.cols.get(n) match {
      case Some(c) =>
        val allEq = (for { l <- lo(c); h <- hi(c) }
          yield l == x && h == x).getOrElse(false)
        !allEq
      case None => true
    }
    case PIsNull(n) => f.cols.get(n) match {
      case Some(c) => c.nulls < f.rows
      case None => true
    }
    case PIsNotNull(n) => f.cols.get(n).forall(c => c.nulls != 0)
    case PPrefix(n, pb) => f.cols.get(n).forall(prefixNegC(_, pb))
    case PEqNs(n, vOpt, _, isNullLit) => f.cols.get(n) match {
      case Some(c) =>
        if (isNullLit) !(c.nulls >= 0 && c.nulls == f.rows)
        else {
          val allEq = c.nulls == 0 && vOpt.exists(x =>
            (for { l <- lo(c); h <- hi(c) } yield l == x && h == x)
              .getOrElse(false))
          !allEq
        }
      case None => true
    }
    case _ => true
  }
}
