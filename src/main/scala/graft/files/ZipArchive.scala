package graft.files

import java.util.zip.Inflater
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Zip archives as a storage source — the sibling of [[WebDataset]]'s tar
 * shards for the other ubiquitous bulk-upload container (reference models
 * archive members as virtual files via the `location` pointer,
 * src/datachain/lib/file.py:122; zip itself is not in the reference —
 * added here because crawl/label drops routinely arrive zipped).
 *
 * Scale shape: listing NEVER streams an archive. Each zip is resolved from
 * its central directory alone — one bounded tail read (EOCD scan + CD
 * parse) per archive, a few KB for thousands of members — and archives fan
 * out one per executor task, so a bucket of 100k zips lists as 100k small
 * range reads with zero driver involvement. Member payloads stay lazy:
 * rows carry a `location` pointer (parent, local-header offset, compressed
 * size, method) and [[readMember]] does one ~64 B header read + one
 * range read + an in-memory inflate — no archive scan, same contract as
 * tar virtual files.
 */
object ZipArchive {

  /** One archive member, central-directory fields only (no payload). */
  final case class ZipEntryMeta(name: String, method: Int, compSize: Long,
                                uncompSize: Long, crc32: Long,
                                localHeaderOffset: Long)

  private val EOCD_SIG = 0x06054b50
  private val CEN_SIG = 0x02014b50
  private val LOC_SIG = 0x04034b50

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i) | (u16(b, i + 2).toLong << 16)) & 0xffffffffL

  /**
   * Parse the central directory of one zip: a tail read (up to 64 KB + 22 B
   * — the max EOCD comment span) to find the end-of-central-directory
   * record, then one exact range read of the directory itself. Total I/O is
   * O(members), independent of archive size.
   */
  def centralDirectory(fs: FileSystem, path: HPath): Seq[ZipEntryMeta] = {
    val len = fs.getFileStatus(path).getLen
    val tailLen = math.min(len, 64 * 1024 + 22L).toInt
    val in = fs.open(path)
    try {
      val tail = new Array[Byte](tailLen)
      in.seek(len - tailLen)
      in.readFully(tail)
      // scan backwards for the EOCD signature (comments may follow it)
      var e = tailLen - 22
      while (e >= 0 && u32(tail, e) != (EOCD_SIG & 0xffffffffL)) e -= 1
      require(e >= 0, s"$path: no end-of-central-directory record")
      val total = u16(tail, e + 10)
      val cdSize = u32(tail, e + 12)
      val cdOff = u32(tail, e + 16)
      require(cdOff != 0xffffffffL && total != 0xffff,
        s"$path: zip64 archives not supported (member table > 4 GB/65k)")
      val cd = new Array[Byte](cdSize.toInt)
      in.seek(cdOff)
      in.readFully(cd)
      val out = Seq.newBuilder[ZipEntryMeta]
      var p = 0
      var i = 0
      while (i < total) {
        require(u32(cd, p) == (CEN_SIG & 0xffffffffL),
          s"$path: bad central-directory entry at $p")
        val method = u16(cd, p + 10)
        val crc = u32(cd, p + 16)
        val csize = u32(cd, p + 20)
        val usize = u32(cd, p + 24)
        val nameLen = u16(cd, p + 28)
        val extraLen = u16(cd, p + 30)
        val commentLen = u16(cd, p + 32)
        val lho = u32(cd, p + 42)
        val name = new String(cd, p + 46, nameLen, "UTF-8")
        out += ZipEntryMeta(name, method, csize, usize, crc, lho)
        p += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      out.result()
    } finally in.close()
  }

  /**
   * List zip members under a glob as `File` rows (one row per member,
   * directories skipped). `file.path` is `<zip name>/<member>`, `file.etag`
   * the member CRC-32, and `file.location` the lazy pointer [[readMember]]
   * consumes — [[FileRef.readBytes]] dispatches on its `"method"` field, so
   * downstream blob ops (text ingest, multimodal decode) work unchanged on
   * archive members.
   */
  def listZip(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // full brace expansion up front (ranges, nesting — FileOps parity);
    // Hadoop's globStatus only knows flat comma sets
    val zips = graft.files.FileOps.expandBraces(glob)
      .flatMap { pat =>
        val g = new HPath(pat)
        val fs0 = g.getFileSystem(conf.value)
        Option(fs0.globStatus(g)).getOrElse(Array.empty).toSeq
      }
      .filter(_.isFile).map(st => (st.getPath.toUri.toString,
        st.getModificationTime)).distinct.sorted
    spark.createDataset(zips)
      .repartition(math.max(1, math.min(zips.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { case (zipUri, mtime) =>
        val p = new HPath(zipUri)
        val fs = p.getFileSystem(conf.value)
        val parent = Option(p.getParent).map(_.toUri.toString).getOrElse("")
        centralDirectory(fs, p).filter(e => !e.name.endsWith("/")).map { e =>
          FileRef(
            source = parent,
            path = s"${p.getName}/${e.name}",
            size = e.uncompSize,
            version = "",
            etag = f"${e.crc32}%08x",
            is_latest = true,
            last_modified = new java.sql.Timestamp(mtime),
            location = s"""{"parent":"$zipUri","offset":${e.localHeaderOffset},""" +
              s""""size":${e.compSize},"method":${e.method},"usize":${e.uncompSize}}""")
        }
      }
      .toDF()
      .select(struct(col("source"), col("path"), col("size"), col("version"),
        col("etag"), col("is_latest"), col("last_modified"), col("location"))
        .as("file"))
  }

  /**
   * Fetch one member by its location pointer: read the 30-byte local file
   * header (name/extra lengths there can differ from the central
   * directory's), range-read exactly `size` compressed bytes, inflate if
   * method 8 (raw deflate), pass through if method 0 (stored).
   */
  def readMember(location: String, conf: Configuration): Array[Byte] = {
    def field(k: String): Long =
      ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(location)
        .getOrElse(throw new IllegalArgumentException(s"bad location: $location"))
        .group(1).toLong
    val parent = "\"parent\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(location)
      .getOrElse(throw new IllegalArgumentException(s"bad location: $location"))
      .group(1)
    val (off, csize, method, usize) =
      (field("offset"), field("size"), field("method").toInt, field("usize"))
    // non-zip64 size fields hold up to 4 GiB-1 — beyond a JVM array's
    // reach; fail fast with a clear error instead of a negative-size
    // allocation or a wrong-range read
    require(csize <= Int.MaxValue && usize <= Int.MaxValue,
      s"$parent@$off: member too large ($csize/$usize bytes; " +
        "2 GiB is the in-memory member limit)")
    val p = new HPath(parent)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val comp = try {
      val hdr = new Array[Byte](30)
      in.seek(off)
      in.readFully(hdr)
      require(u32(hdr, 0) == (LOC_SIG & 0xffffffffL),
        s"$parent@$off: bad local header")
      val dataOff = off + 30 + u16(hdr, 26) + u16(hdr, 28)
      val buf = new Array[Byte](csize.toInt)
      in.seek(dataOff)
      in.readFully(buf)
      buf
    } finally in.close()
    method match {
      case 0 => comp
      case 8 =>
        val inf = new Inflater(true)
        try {
          inf.setInput(comp)
          val out = new Array[Byte](usize.toInt)
          var done = 0
          var stalled = false
          while (done < out.length && !inf.finished() && !stalled) {
            val n = inf.inflate(out, done, out.length - done)
            // a truncated/corrupt deflate stream returns 0 and asks for
            // more input that does not exist — fail, don't hang the task
            stalled = n == 0 && inf.needsInput()
            done += n
          }
          require(done == out.length, s"$parent@$off: short inflate")
          out
        } finally inf.end()
      case m => throw new IllegalArgumentException(
        s"$parent@$off: unsupported zip method $m (stored/deflate only)")
    }
  }
}
