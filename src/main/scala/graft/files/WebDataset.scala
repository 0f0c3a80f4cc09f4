package graft.files

import org.apache.commons.compress.archivers.tar.TarFile
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WebDataset reader — tar shards of multimodal training samples
 * (reference: src/datachain/lib/webdataset.py, tar.py). A shard is a .tar
 * whose members group by stem: `dir/0001.jpg` + `dir/0001.json` + ... form
 * ONE sample keyed `dir/0001`, with one part per extension.
 *
 * Scale design: shards are the parallelism unit (the WebDataset contract —
 * shards are sized for sequential read), so each tar is parsed inside a
 * single task via `binaryFile` + flatMap; a 100 TB corpus of 1 GB shards
 * fans out to 100k independent tasks with zero shuffle until the optional
 * per-sample grouping. Member rows carry (tar_path, offset, size) — the
 * reference's TarVFile pointer — so payloads can be re-read lazily from
 * the archive by byte range ([[FileRef]] `location`) instead of shipping
 * bytes through every downstream stage.
 */
object WebDataset {

  case class WdsMember(sample_key: String, ext: String, tar_path: String,
                       offset: Long, size: Long, data: Array[Byte])

  /** Split "dir/0001.jpg" → ("dir/0001", "jpg") at the FIRST dot of the
    * basename — the WebDataset convention: everything after the first
    * period is the (possibly multi-part) extension, so "0001.jpg" and
    * "0001.seg.png" group under one sample key "0001" (last-dot
    * splitting silently tore such samples apart). Extension-less
    * members get ext "" (the reference errors on unknown extensions
    * only when a typed schema demands it — here the schema is
    * (key, ext) generic). */
  private[graft] def splitKey(name: String): (String, String) = {
    val base = name.stripSuffix("/")
    val slash = base.lastIndexOf('/')
    val dot = base.indexOf('.', slash + 1)
    if (dot > slash + 1) (base.substring(0, dot), base.substring(dot + 1))
    else (base, "")
  }

  /**
   * One row per tar member: sample_key, ext, provenance (tar_path, offset,
   * size) and the member bytes. `withData = false` keeps payloads out of
   * the rows entirely — downstream stages read byte ranges lazily via the
   * location pointer, which is the 100 TB path.
   */
  def readTarMembers(spark: SparkSession, glob: String,
                     withData: Boolean = true): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (tarPath, bytes) =>
        val tf = new TarFile(new SeekableInMemoryByteChannel(bytes))
        try {
          val out = scala.collection.mutable.ArrayBuffer.empty[WdsMember]
          tf.getEntries.forEach { e =>
            if (e.isFile) {
              val (key, ext) = splitKey(e.getName)
              val data =
                if (!withData) Array.empty[Byte]
                else {
                  val in = tf.getInputStream(e)
                  try in.readAllBytes() finally in.close()
                }
              out += WdsMember(key, ext, tarPath, e.getDataOffset, e.getSize, data)
            }
          }
          out.toSeq
        } finally tf.close()
      }
      .toDF()
  }

  /**
   * One row per SAMPLE: key + a map ext → bytes + a map ext → location
   * pointer (reference `Builder.produce`, webdataset.py:168). The grouping
   * shuffles on (tar_path, sample_key) — members of a sample are adjacent
   * in their shard, so map-side partial aggregation keeps this cheap.
   */
  def readSamples(spark: SparkSession, glob: String,
                  withData: Boolean = true): DataFrame =
    readTarMembers(spark, glob, withData)
      .groupBy(col("tar_path"), col("sample_key"))
      .agg(
        map_from_entries(collect_list(struct(col("ext"), col("data"))))
          .as("parts"),
        map_from_entries(collect_list(struct(col("ext"),
          to_json(struct(col("tar_path").as("parent"), col("offset"),
            col("size")))))).as("locations"))

  /** Read one member's bytes by its location pointer
    * `{"parent": tarPath, "offset": n, "size": m}` — a byte-range read of
    * the shard, no tar scan (reference TarVFile, lib/tar.py). */
  /** Parse a virtual-file location JSON into (parent path, offset, size). */
  def virtualRange(location: String)
      : (org.apache.hadoop.fs.Path, Long, Long) = {
    // quoted values parse as full JSON strings (a parent path may
    // contain commas); numbers as digit runs. Sizes are LONG — .toInt
    // silently wrapped members >= 2 GiB into negative bounds.
    def field(k: String): String = {
      val quoted = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      val bare = ("\"" + k + "\"\\s*:\\s*(-?[0-9]+)").r
      quoted.findFirstMatchIn(location).map(_.group(1))
        .orElse(bare.findFirstMatchIn(location).map(_.group(1)))
        .getOrElse(throw new IllegalArgumentException(s"bad location: $location"))
    }
    (new org.apache.hadoop.fs.Path(field("parent")),
      field("offset").toLong, field("size").toLong)
  }

  def readVirtual(location: String,
                  conf: org.apache.hadoop.conf.Configuration =
                    new org.apache.hadoop.conf.Configuration()): Array[Byte] = {
    val (p, offset, size) = virtualRange(location)
    require(size <= Int.MaxValue,
      s"virtual member of $size bytes cannot materialize — stream it " +
        "via FileRef.open instead")
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      in.seek(offset)
      val buf = new Array[Byte](size.toInt)
      in.readFully(buf)
      buf
    } finally in.close()
  }

  /**
   * WebDataset writer — the export half of the shard contract (reference
   * exports samples back to storage via `to_storage`; the tar sharding here
   * follows the public WebDataset convention the reader above consumes).
   *
   * Each input partition streams its rows into `shard-{partition}-{seq}.tar`
   * files under `outDir`, rolling to a new shard when ~`maxShardBytes` of
   * on-disk tar bytes (payload + 512 B header and 512 B padding per member
   * + 1 KiB trailer; POSIX long-name extension blocks are not counted, so
   * the bound is approximate for very long member names) has been written —
   * executors write their own shards directly to the target filesystem with
   * no shuffle and no driver involvement, so a 100 TB export fans out to
   * one independent writer per partition. Callers control shard count and
   * ordering with `repartitionByRange`/`sortWithinPartitions` before the
   * call (sorted input → deterministic shard contents).
   *
   * Task retry/speculation safety: each attempt writes to attempt-scoped
   * `.tmp` names (which a `*.tar` glob never matches) and promotes them to
   * the final shard names only after its iterator drains, first-commit-wins
   * per shard — an attempt finding the final name already present treats it
   * as committed by a sibling and discards its own copy, and final files
   * are never deleted (a zombie that deleted-then-died would lose a
   * committed shard). A failed or losing attempt therefore leaves behind
   * only `.tmp` litter. Caveat shared with every committer-less side-file
   * writer: if the upstream partition contents are NONdeterministic across
   * attempts, two attempts may produce different shard counts and a stale
   * higher-seq shard from the larger attempt can survive — sort/repartition
   * deterministically before the call (as documented above).
   *
   * Expects columns (`keyCol`: string, `extCol`: string, `dataCol`: binary);
   * the member name is `key.ext` (or bare `key` when ext is empty), which
   * round-trips through [[splitKey]].
   */
  def writeTarShards(df: DataFrame, outDir: String,
                     keyCol: String = "sample_key", extCol: String = "ext",
                     dataCol: String = "data",
                     maxShardBytes: Long = 1L << 30): Unit = {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.spark.TaskContext
    val rows = df.select(col(keyCol).cast("string"), col(extCol).cast("string"),
      col(dataCol).cast("binary"))
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val attempt = tc.taskAttemptId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val dir = new org.apache.hadoop.fs.Path(outDir)
        val fs = dir.getFileSystem(conf)
        // on-disk cost of one member: 512 B header + payload padded to 512
        def entryBytes(payload: Long): Long = 512L + ((payload + 511L) / 512L) * 512L
        val trailerBytes = 1024L
        var seq = 0
        var written = 0L
        var tar: TarArchiveOutputStream = null
        val pending = scala.collection.mutable.ArrayBuffer
          .empty[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)]
        def tmpPath(s: Int) = new org.apache.hadoop.fs.Path(
          dir, f".shard-$pid%05d-$s%03d.attempt$attempt.tmp")
        def finalPath(s: Int) = new org.apache.hadoop.fs.Path(
          dir, f"shard-$pid%05d-$s%03d.tar")
        def roll(): Unit = {
          if (tar != null) tar.close()
          val p = tmpPath(seq)
          pending += ((p, finalPath(seq)))
          tar = new TarArchiveOutputStream(fs.create(p, true))
          tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          seq += 1
          written = 0L
        }
        var committed = false
        try {
          roll()
          it.foreach { r =>
            val key = r.getString(0)
            val ext = Option(r.getString(1)).getOrElse("")
            val data = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.empty[Byte])
            val cost = entryBytes(data.length.toLong)
            if (written > 0 && written + cost + trailerBytes > maxShardBytes) roll()
            val e = new TarArchiveEntry(if (ext.isEmpty) key else s"$key.$ext")
            e.setSize(data.length.toLong)
            tar.putArchiveEntry(e)
            tar.write(data)
            tar.closeArchiveEntry()
            written += cost
          }
          tar.close()
          tar = null
          // commit: promote this attempt's tmp files to the final names.
          // First-commit-wins — an existing final shard means a sibling
          // attempt of this partition already committed that seq, so this
          // attempt just drops its own tmp. Never delete a final file: a
          // zombie attempt that deleted-then-died would lose a committed
          // shard.
          pending.foreach { case (tmp, fin) =>
            if (fs.exists(fin) || !fs.rename(tmp, fin)) {
              if (!fs.exists(fin))
                throw new java.io.IOException(s"rename $tmp -> $fin failed")
              try fs.delete(tmp, false) catch { case _: Throwable => () }
            }
          }
          committed = true
        } finally {
          if (tar != null) { try tar.close() catch { case _: Throwable => () } }
          if (!committed)
            pending.foreach { case (tmp, _) =>
              try fs.delete(tmp, false) catch { case _: Throwable => () }
            }
        }
      }
    }
  }
}
