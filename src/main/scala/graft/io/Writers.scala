package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.schema.SignalSchema

/**
 * Export sinks — graft's counterpart of the reference's `to_parquet/to_csv/
 * to_json/to_jsonl/to_database` (reference: src/datachain/lib/dc/
 * datachain.py:2217-2460). All distributed writers; none collect.
 */
object Writers {

  /** Key under which the signal schema JSON is embedded in parquet footers,
    * mirroring DATACHAIN_SIGNAL_SCHEMA_PARQUET_KEY (reference:
    * src/datachain/lib/dc/datachain.py:2305-2310). */
  val SchemaMetaKey = "graft.signal_schema"

  /** Parquet export; optional hive partitioning; schema JSON is persisted
    * as a sidecar (parquet footer KV metadata isn't writable through the
    * public DataFrame API — the sidecar round-trips through readParquet). */
  def toParquet(df: DataFrame, path: String,
                partitionBy: Seq[String] = Seq.empty,
                mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    val w = df.write.mode(mode)
    val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    pw.parquet(path)
    val meta = s"""{"$SchemaMetaKey": ${escape(SignalSchema.toJson(df.schema))}}"""
    writeSidecar(df, path, meta)
  }

  /** Restore the signal schema recorded by [[toParquet]] (if present). */
  def readSchemaSidecar(df: DataFrame, path: String): Option[String] =
    sidecarText(df.sparkSession, path)

  /** Read a [[toParquet]] export with its recorded signal schema
    * RESTORED: a plain parquet read re-infers hive partition columns
    * (a long key partitioned on disk reads back int) and appends them
    * after the data columns; the sidecar's schema JSON reapplies the
    * recorded order and types. Falls back to the plain read when the
    * export carries no sidecar (foreign parquet). */
  def readParquetExport(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    // the sidecar check needs only a FileSystem — either branch then
    // pays exactly ONE parquet read (a plain read first would run
    // listing + schema inference just to throw them away)
    sidecarText(spark, path).flatMap(parseSidecar) match {
      case None => spark.read.parquet(path)
      case Some(schemaJson) =>
        // pass the recorded schema TO the reader: partition-column
        // type inference is bypassed entirely, so a STRING partition
        // value that renders numeric ("007") reads back verbatim — a
        // cast-after-infer would have collapsed it to "7"
        spark.read.schema(SignalSchema.fromJson(schemaJson)).parquet(path)
    }

  private def sidecarText(spark: org.apache.spark.sql.SparkSession,
                          path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path, "_graft_schema.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }
  }

  /** Extract the schema JSON out of the sidecar wrapper `{"<key>":
    * "<escaped>"}` — the inverse of [[toParquet]]'s [[escape]]. */
  private def parseSidecar(s: String): Option[String] = {
    val i = s.indexOf(':')
    if (i < 0) return None
    val v = s.substring(i + 1).trim.stripSuffix("}").trim
    if (!(v.startsWith("\"") && v.endsWith("\"")) || v.length < 2)
      return None
    val body = v.substring(1, v.length - 1)
    val sb = new StringBuilder
    var j = 0
    while (j < body.length) {
      val c = body.charAt(j)
      if (c == '\\' && j + 1 < body.length) {
        body.charAt(j + 1) match {
          case '"' => sb += '"'; j += 2
          case '\\' => sb += '\\'; j += 2
          case 'n' => sb += '\n'; j += 2
          case 'u' if j + 6 <= body.length =>
            sb += Integer.parseInt(body.substring(j + 2, j + 6), 16).toChar
            j += 6
          case other => sb += other; j += 2
        }
      } else { sb += c; j += 1 }
    }
    Some(sb.toString)
  }

  /** ORC export — same layout options as [[toParquet]] (Spark-native
    * writer: dictionary + RLE encodings, per-stripe stats for pushdown). */
  def toOrc(df: DataFrame, path: String,
            partitionBy: Seq[String] = Seq.empty,
            mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    val w = df.write.mode(mode)
    val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    pw.orc(path)
  }

  /** Avro container export — one `.avro` file per partition, written
    * executor-parallel ([[graft.files.AvroIO.toAvro]]); nullable columns
    * become `[null, T]` unions, dates/timestamps their logical types. */
  def toAvro(df: DataFrame, path: String): Unit =
    graft.files.AvroIO.toAvro(df, path)

  /** CSV export. String cells with embedded newlines are written
    * QUOTED-MULTILINE per RFC 4180 — read such files back with
    * `readCsv(multiLine = true)`; the default line-splittable parse
    * would split those records mid-row (PERMISSIVE mode, silently). */
  def toCsv(df: DataFrame, path: String, header: Boolean = true,
            delimiter: String = ",",
            mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    // nested signals flattened to `__` columns at the flat-format boundary;
    // arrays/maps (unwritable as CSV cells) serialized to JSON strings,
    // like the reference's flat exports
    import org.apache.spark.sql.functions.{col, to_json}
    import org.apache.spark.sql.types.{ArrayType, MapType}
    val flat = SignalSchema.flatten(df)
    val csvSafe = flat.select(flat.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
    csvSafe.write.mode(mode)
      .option("header", header.toString).option("sep", delimiter).csv(path)
  }

  /** JSONL (the line-delimited layout Spark writes natively). Null
    * fields are WRITTEN (ignoreNullFields=false): Spark's default omits
    * them, so an all-null column would vanish from the file entirely
    * and a schema-less re-read would drop it from the inferred schema. */
  def toJsonl(df: DataFrame, path: String,
              mode: SaveMode = SaveMode.ErrorIfExists): Unit =
    df.write.mode(mode).option("ignoreNullFields", "false").json(path)

  /** Single JSON array document. DRIVER-SIDE, EXPORT-SCALE ONLY: rows
    * stream through `toLocalIterator` to one driver-written file — the
    * single-array format is inherently serial, so throughput is one
    * driver thread and wall-time is O(rows). Use [[toJsonl]] (parallel,
    * one file per partition) for anything corpus-sized; this exists
    * because the reference's to_json writes one array file too. */
  def toJsonArray(df: DataFrame, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write('[')
      var first = true
      // to_json with ignoreNullFields=false (df.toJSON has no option
      // hook and would silently omit null fields — see toJsonl)
      df.select(org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct(df.columns.map(
            org.apache.spark.sql.functions.col): _*),
          java.util.Map.of("ignoreNullFields", "false")).as("j"))
        .as(org.apache.spark.sql.Encoders.STRING)
        .toLocalIterator().forEachRemaining { line =>
        if (!first) out.write(',')
        out.write('\n')
        out.write(line.getBytes("UTF-8"))
        first = false
      }
      out.write("\n]".getBytes("UTF-8"))
    } finally out.close()
  }

  /**
   * Bucketed table save: hash-bucket (and sort) by join keys so repeated
   * joins/aggregations on those keys run with NO exchange — the
   * materialized-partitioning play for fact tables that join the same
   * dimension keys query after query at 100 TB. Spark's bucketing requires
   * a catalog table (saveAsTable), so these live under the session's
   * warehouse dir rather than a plain path.
   */
  def saveBucketed(df: DataFrame, table: String, keys: Seq[String],
                   buckets: Int, mode: SaveMode = SaveMode.Overwrite,
                   path: Option[String] = None): Unit = {
    require(keys.nonEmpty && buckets > 0, "need keys and positive buckets")
    val w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    // an explicit path makes it an EXTERNAL table: the data outlives the
    // session while the name stays session-scoped (Layout.bucketize uses
    // this for temp-dir layouts)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** JDBC sink (reference `to_database`). Exercised for real against
    * embedded Derby (ships with Spark's jars) in the q_read_database gate
    * and IoSpec; writes stream per-partition through executor-side
    * connections, so sink throughput scales with executors. */
  def toDatabase(df: DataFrame, url: String, table: String,
                 props: java.util.Properties = new java.util.Properties(),
                 mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  private def writeSidecar(df: DataFrame, dir: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_schema.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def escape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
