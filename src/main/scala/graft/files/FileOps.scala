package graft.files

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Chain, OpTree}

/**
 * The `File` signal family + storage listing/export — graft's counterpart of
 * the reference's File model and `read_storage`/`to_storage`
 * (reference: src/datachain/lib/file.py:200-244, src/datachain/lib/dc/
 * storage.py:21, src/datachain/lib/listing.py:46-120).
 *
 * A listed object becomes one row with a nested `file` struct:
 *   file.source, file.path, file.size, file.version, file.etag,
 *   file.is_latest, file.last_modified, file.location
 *
 * Scale design: listing is *distributed* — the driver only enumerates
 * first-level prefixes; each prefix is listed recursively inside an
 * executor task (`flatMap` over an RDD of prefixes), so a 100M-object
 * bucket lists in parallel instead of through one driver loop. Blob I/O is
 * lazy: rows carry references, bytes are opened per-partition on demand
 * ([[FileRef.readBytes]]), with an executor-local cache keyed by
 * (source, path, etag) standing in for the reference's blob cache
 * (reference: src/datachain/cache.py).
 */
final case class FileRef(
    source: String, path: String, size: Long, version: String, etag: String,
    is_latest: Boolean, last_modified: java.sql.Timestamp, location: String) {

  def uri: String = {
    val s = source.stripSuffix("/")
    s"$s/$path"
  }

  /** Lazy open against any Hadoop-compatible FS (local, HDFS, S3A, ...).
    * A non-empty `location` marks a VIRTUAL file (a member inside an
    * archive, reference TarVFile): bytes come from a byte-range read of
    * the parent object instead of a whole-object fetch. */
  def readBytes(conf: Configuration = new Configuration()): Array[Byte] =
    FileCache.getOrFetch(this) {
      if (location != null && location.nonEmpty && location.contains("\"parent\"")) {
        // zip members carry a "method" field (stored/deflate) and need the
        // local-header walk + inflate; tar virtual files are a plain range
        if (location.contains("\"method\"")) ZipArchive.readMember(location, conf)
        else WebDataset.readVirtual(location, conf)
      } else readWhole(conf)
    }

  private def readWhole(conf: Configuration): Array[Byte] = {
      val p = new HPath(uri)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
  }

  def readText(conf: Configuration = new Configuration()): String =
    new String(readBytes(conf), "UTF-8")

  /**
   * Streaming open (reference `File.open`, src/datachain/lib/file.py:395):
   * returns an InputStream over the object WITHOUT materializing it —
   * the path for UDFs that scan multi-GB blobs. Virtual files stream the
   * member's byte range of the parent archive. Bypasses [[FileCache]]
   * by design (a stream larger than the cache bound must not evict it).
   */
  def open(conf: Configuration = new Configuration()): java.io.InputStream = {
    if (location != null && location.nonEmpty && location.contains("\"parent\"")) {
      // zip members need the SAME dispatch readBytes has: their offset
      // is the local-header position (not the data) and deflate members
      // must inflate — a raw range stream exported every zip member as
      // header-prefixed, truncated, possibly-compressed garbage
      if (location.contains("\"method\""))
        new java.io.ByteArrayInputStream(ZipArchive.readMember(location, conf))
      else {
        val (p, offset, size) = WebDataset.virtualRange(location)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        in.seek(offset)
        new BoundedInputStream(in, size)
      }
    } else {
      val p = new HPath(uri)
      p.getFileSystem(conf).open(p)
    }
  }

  /**
   * Export this single file under `destDir` (reference `File.save`/`export`,
   * src/datachain/lib/file.py:432-532). Placement as in
   * [[FileOps.toStorage]]: "fullpath" (default), "filename", "etag".
   * Pure stream-to-stream copy — constant memory at any blob size.
   * Returns the destination URI.
   */
  def export(destDir: String, placement: String = "fullpath",
             conf: Configuration = new Configuration()): String = {
    val outPath = new HPath(
      s"${destDir.stripSuffix("/")}/${FileOps.placementPath(this, placement)}")
    val ofs = outPath.getFileSystem(conf)
    val in = open(conf)
    try {
      val out = ofs.create(outPath, true)
      try {
        val buf = new Array[Byte](256 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
    outPath.toUri.toString
  }

  /** Re-stat from storage: refresh size/etag/last_modified (reference
    * `File.resolve`, src/datachain/lib/file.py:663). Missing objects come
    * back with size -1 and is_latest=false rather than throwing, so a
    * resolve sweep over a listing can proceed row-by-row. */
  def resolve(conf: Configuration = new Configuration()): FileRef = {
    val p = new HPath(uri)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) copy(size = -1L, is_latest = false)
    else {
      val st = fs.getFileStatus(p)
      copy(size = st.getLen,
        // same mtime-len etag SHAPE as the listing rows build — a ":"
        // here made every resolved file look modified vs its listing
        etag = st.getModificationTime.toString + "-" + st.getLen,
        last_modified = new java.sql.Timestamp(st.getModificationTime),
        is_latest = true)
    }
  }

  /** Re-root the reference under a new source prefix (reference
    * `File.rebase`, src/datachain/lib/file.py:721). */
  def rebase(newSource: String): FileRef =
    copy(source = newSource.stripSuffix("/"))
}

/** Bounded stream over an already-positioned underlying stream (virtual
  * archive members: read exactly `limit` bytes of the parent). */
private[files] final class BoundedInputStream(
    underlying: java.io.InputStream, limit: Long) extends java.io.InputStream {
  private var remaining = limit
  override def read(): Int =
    if (remaining <= 0) -1
    else { val b = underlying.read(); if (b >= 0) remaining -= 1; b }
  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (remaining <= 0) return -1
    val n = underlying.read(buf, off, math.min(len.toLong, remaining).toInt)
    if (n > 0) remaining -= n
    n
  }
  override def close(): Unit = underlying.close()
}

/**
 * Executor-local blob cache keyed by (source, path, etag)
 * (reference: src/datachain/cache.py — `ensure_cached`). Bounded by BYTES
 * with LRU eviction — an entry-count bound would let 4096 multi-MB blobs
 * OOM an executor. Oversized blobs (> 1/8 of the bound) are served but
 * never cached: one giant object must not wipe the working set.
 */
object FileCache {
  @volatile private var maxBytes: Long = 256L * 1024 * 1024
  private var curBytes: Long = 0L
  private val cache = new java.util.LinkedHashMap[String, Array[Byte]](
    64, 0.75f, /*accessOrder=*/ true)

  /** Re-bound the cache (tests, or executors with small heaps). */
  def setMaxBytes(n: Long): Unit = synchronized {
    maxBytes = n
    evictUntilFits(0L)
  }

  def currentBytes: Long = synchronized(curBytes)

  private def evictUntilFits(incoming: Long): Unit = {
    val it = cache.entrySet().iterator()
    while (curBytes + incoming > maxBytes && it.hasNext) {
      curBytes -= it.next().getValue.length
      it.remove()
    }
  }

  def getOrFetch(ref: FileRef)(fetch: => Array[Byte]): Array[Byte] = {
    val key = s"${ref.source} ${ref.path} ${ref.etag}"
    val hit = synchronized(cache.get(key))
    if (hit != null) return hit
    val bytes = fetch
    if (bytes.length <= maxBytes / 8) synchronized {
      if (!cache.containsKey(key)) {
        evictUntilFits(bytes.length.toLong)
        cache.put(key, bytes)
        curBytes += bytes.length
      }
    }
    bytes
  }

  def clear(): Unit = synchronized { cache.clear(); curBytes = 0L }
}

object FileOps {

  /**
   * `read_storage`: recursively list a directory/bucket into `file` rows.
   * Glob filtering via `pattern` (applied to the relative path). The listing
   * fans out over first-level prefixes in parallel on executors.
   */
  def readStorage(spark: SparkSession, uriStr: String,
                  pattern: Option[String] = None): Chain = {
    import spark.implicits._
    val rootUri = if (uriStr.contains("://")) uriStr else s"file://$uriStr"
    val source = rootUri.stripSuffix("/")

    // Driver: enumerate first-level entries only (cheap even on huge roots).
    val conf = new Configuration()
    val rootPath = new HPath(rootUri)
    val fs = rootPath.getFileSystem(conf)
    val firstLevel = fs.listStatus(rootPath).toSeq
    val (dirs, files) = firstLevel.partition(_.isDirectory)
    val prefixes = dirs.map(_.getPath.toUri.toString)

    def toRef(st: org.apache.hadoop.fs.FileStatus): FileRef = {
      val full = st.getPath.toUri.toString
      val rel = full.stripPrefix(source).stripPrefix("/")
      FileRef(source, rel, st.getLen, "",
        // local etag: mtime-size derived, like the reference's local backend
        s"${st.getModificationTime}-${st.getLen}",
        is_latest = true,
        new java.sql.Timestamp(st.getModificationTime), null)
    }

    val topFiles = files.map(toRef)
    // Executors: recursive listing per prefix.
    val nested = spark.sparkContext
      .parallelize(prefixes, math.max(1, prefixes.size))
      .flatMap { prefix =>
        val p = new HPath(prefix)
        val pfs = p.getFileSystem(new Configuration())
        val it = pfs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer[FileRef]()
        while (it.hasNext) {
          val st = it.next()
          val full = st.getPath.toUri.toString
          val rel = full.stripPrefix(source).stripPrefix("/")
          buf += FileRef(source, rel, st.getLen, "",
            s"${st.getModificationTime}-${st.getLen}",
            is_latest = true,
            new java.sql.Timestamp(st.getModificationTime), null)
        }
        buf
      }
    val all = spark.createDataset(nested).union(spark.createDataset(topFiles))
    val filtered = pattern match {
      // column predicate (codegen'd regex), not a closure — keeps the
      // listing pipeline inside whole-stage codegen
      case Some(g) => all.filter(col("path").rlike("^" + globToRegex(g) + "$"))
      case None    => all
    }
    val df = filtered.toDF().select(struct(
      col("source"), col("path"), col("size"), col("version"), col("etag"),
      col("is_latest"), col("last_modified"), col("location")).as("file"))
    Chain(df, OpTree.empty.append("read_storage", uriStr, pattern.getOrElse("")))
  }

  /**
   * read_storage over zip archives: one `file` row per archive member,
   * listed from each zip's central directory alone (bounded tail read per
   * archive — see [[ZipArchive]]). Member payloads stay lazy; downstream
   * blob ops ([[withTextContent]], multimodal decode) work unchanged.
   */
  def readZip(spark: SparkSession, glob: String): Chain =
    Chain(ZipArchive.listZip(spark, glob),
      OpTree.empty.append("read_zip", glob))

  /**
   * Attach the referenced blob's text content as a `content` column —
   * the reference's `TextFile.read_text` as a distributed operator
   * (reference: src/datachain/lib/file.py:784). Runs per-partition with
   * bounded prefetch (overlapping fetch latency with downstream compute)
   * and the executor-local [[FileCache]]; nothing touches the driver.
   */
  def withTextContent(chain: Chain, fileCol: String = "file",
                      prefetch: Int = 2): Chain = {
    val df = chain.toDF
    val spark = df.sparkSession
    import spark.implicits._
    val refs = df.select(
      col(s"$fileCol.source"), col(s"$fileCol.path"), col(s"$fileCol.size"),
      col(s"$fileCol.version"), col(s"$fileCol.etag"),
      col(s"$fileCol.is_latest"), col(s"$fileCol.last_modified"),
      col(s"$fileCol.location")).as[FileRef]
    val withContent = refs.mapPartitions { it =>
      val conf = new Configuration()
      graft.udf.Prefetcher.ahead(
        it.map(r => (r, new String(r.readBytes(conf), "UTF-8"))), prefetch)
    }.toDF("file_ref", "content")
    val out = withContent.select(
      struct(col("file_ref.*")).as(fileCol), col("content"))
    Chain(out, chain.ops.append("with_text_content", fileCol))
  }

  /**
   * Listing-dataset cache with TTL — the reference caches bucket listings
   * as datasets named `lst__<uri>` and relists after 4h
   * (reference: src/datachain/lib/listing.py:26-120). The listing is
   * re-used from the catalog when fresh, rebuilt (and re-saved as a new
   * version) when missing, expired, or `update` is forced.
   */
  val ListingTtl: java.time.Duration = java.time.Duration.ofHours(4)

  def listingDatasetName(uri: String): String =
    // the sanitized form alone collides ("/a b" vs "/a_b" → one cache
    // entry serving the other directory's listing); suffix a hash of
    // the RAW uri so distinct uris can never share a listing dataset
    "lst__" + uri.replaceAll("[^A-Za-z0-9._-]", "_") + "_" +
      java.lang.Long.toHexString(
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
          uri.getBytes("UTF-8"),
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          uri.getBytes("UTF-8").length, 42) & 0xffffffffL)

  def readStorageCached(catalog: graft.catalog.Catalog, spark: SparkSession,
                        uri: String, pattern: Option[String] = None,
                        update: Boolean = false,
                        ttl: java.time.Duration = ListingTtl): Chain = {
    val name = listingDatasetName(uri)
    val fresh = catalog.latestVersion(name).exists { v =>
      val meta = catalog.readMeta(name, v)
      val created = "\"createdAt\": \"([^\"]+)\"".r.findFirstMatchIn(meta)
        .map(m => java.time.Instant.parse(m.group(1)))
      created.exists(c =>
        java.time.Instant.now().isBefore(c.plus(ttl)))
    }
    val listing =
      if (fresh && !update) catalog.readDataset(name)
      else {
        val listed = readStorage(spark, uri)
        catalog.save(listed, name, harvestStats = false)
        catalog.readDataset(name)
      }
    val base = Chain(graft.core.Sys.drop(listing.toDF), listing.ops)
    pattern match {
      case Some(g) =>
        // glob applied as a filter over the cached listing (pure SQL)
        val rx = globToRegex(g)
        base.filter(col("file.path").rlike("^" + rx + "$"))
      case None => base
    }
  }

  /** Enumerate cached listing datasets (reference `listings()`,
    * src/datachain/lib/dc/listings.py): one row per cached listing version
    * with its row count and freshness. */
  def listings(catalog: graft.catalog.Catalog): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    catalog.datasetsDF()
      .filter(col("name").startsWith("lst__"))
      .withColumn("expired",
        expr(s"created_at = '' OR " +
          s"to_timestamp(created_at) < now() - interval ${ListingTtl.toHours} hours"))
  }

  /**
   * `du`: cumulative size/count per directory over a listing — the
   * reference's recursive-CTE dir expansion
   * (reference: src/datachain/data_storage/schema.py:88-147 DirExpansion,
   * warehouse.py:554-963) restated as one explode + one aggregation:
   * each file contributes its size to every ancestor directory ("" = root).
   * Fully distributed; shuffle key is the directory path.
   */
  def du(listing: DataFrame, fileCol: String = "file"): DataFrame = {
    val parts = split(col(s"$fileCol.path"), "/")
    // sequence(1,0) descends in Spark — root-level files get only ""
    val dirPrefixes = when(size(parts) <= 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(parts) - 1),
        i => concat_ws("/", slice(parts, lit(1), i))))
    val ancestors = concat(array(lit("")), dirPrefixes)
    listing
      .select(explode(ancestors).as("dir"), col(s"$fileCol.size").as("size"))
      .groupBy("dir")
      .agg(sum("size").as("total_size"), count(lit(1)).as("n_files"))
  }

  /** `ls`: immediate children of a directory prefix over a listing —
    * one row per child name, files and first-level subdirs. */
  def ls(listing: DataFrame, prefix: String = "",
         fileCol: String = "file"): DataFrame = {
    val p = if (prefix.isEmpty) "" else prefix.stripSuffix("/") + "/"
    val rel = expr(s"substring($fileCol.path, ${p.length + 1})")
    listing
      .filter(col(s"$fileCol.path").startsWith(p))
      .select(
        when(rel.contains("/"),
          concat(element_at(split(rel, "/"), 1), lit("/")))
          .otherwise(rel).as("name"),
        col(s"$fileCol.size").as("size"))
      .groupBy("name")
      .agg(sum("size").as("total_size"), count(lit(1)).as("n"))
  }

  /**
   * `find`: filter a listing by path glob, name regex, and size bounds —
   * the reference CLI's `datachain find` restated as pure Column predicates
   * (pushdown-able; a find over a parquet-backed listing prunes at the
   * scan, it never materializes the full listing).
   */
  def find(listing: DataFrame, glob: Option[String] = None,
           nameRegex: Option[String] = None,
           minSize: Long = -1L, maxSize: Long = -1L,
           fileCol: String = "file"): DataFrame = {
    val path = col(s"$fileCol.path")
    val name = element_at(split(path, "/"), -1)
    val preds = Seq(
      glob.map(g => path.rlike("^" + globToRegex(g) + "$")),
      nameRegex.map(r => name.rlike(r)),
      Option.when(minSize >= 0)(col(s"$fileCol.size") >= minSize),
      Option.when(maxSize >= 0)(col(s"$fileCol.size") <= maxSize)).flatten
    preds.foldLeft(listing)((d, p) => d.filter(p))
  }

  /** Glob match supporting `*`, `?`, `**` and full brace expansion
    * ([[expandBraces]]): comma sets, numeric/letter ranges, nesting. */
  def globMatch(glob: String, path: String): Boolean = {
    val regex = globToRegex(glob)
    path.matches(regex)
  }

  /**
   * Brace expansion, reference-parity (storage_pattern.py
   * `expand_brace_pattern`, src/datachain/lib/dc/storage_pattern.py:93):
   * the first top-level BALANCED `{...}` expands to its comma options
   * (whitespace-trimmed) or to a range — numeric `{1..10}` (descending
   * and zero-padded `{01..10}` forms included) or single-letter
   * `{a..z}` — then each result recurses, so multiple/nested groups
   * multiply out (`{a,b}/{c,d}` → 4 patterns). Unbalanced braces and
   * unrecognized range specs stay literal, as in the reference.
   */
  def expandBraces(pattern: String): Seq[String] = {
    val start = pattern.indexOf('{')
    if (start < 0 || pattern.indexOf('}') < 0) return Seq(pattern)
    var depth = 0
    var end = -1
    var i = start
    while (i < pattern.length && end < 0) {
      pattern.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end <= start) return Seq(pattern)
    val prefix = pattern.substring(0, start)
    val suffix = pattern.substring(end + 1)
    val content = pattern.substring(start + 1, end)
    // comma split is DEPTH-AWARE: '{a,{b,c}}' groups as ["a","{b,c}"]
    // (the inner set expands in the recursion), and only a comma-free
    // body can be a range — bash semantics for '{1,3..5}' (the "3..5"
    // option stays literal)
    val parts = topLevelSplit(content)
    val options =
      if (parts.lengthCompare(1) == 0 && content.contains(".."))
        expandRange(content)
      else parts.map(_.trim)
    options.flatMap(o => expandBraces(prefix + o + suffix))
  }

  /** Split on commas at brace depth 0 only. */
  private def topLevelSplit(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c =>
        if (c == '{') depth += 1 else if (c == '}') depth -= 1
        sb.append(c)
    }
    out += sb.toString
    out.toSeq
  }

  /** `a..b` range forms of [[expandBraces]]; anything else is literal. */
  private def expandRange(spec: String): Seq[String] = {
    val parts = spec.split("\\.\\.", -1)
    if (parts.length != 2) return Seq(spec)
    val (a, b) = (parts(0), parts(1))
    if (a.nonEmpty && b.nonEmpty && a.length <= 18 && b.length <= 18 &&
        a.forall(_.isDigit) && b.forall(_.isDigit)) {
      // zero-padded when either endpoint writes a leading zero — the
      // width is the wider endpoint's ("{01..10}" → 01,02,…,10).
      // Endpoints past Long (>18 digits) and absurd widths (>1M
      // patterns would OOM the driver before any listing) stay literal.
      val pad =
        if (a.head == '0' || b.head == '0') math.max(a.length, b.length)
        else 0
      val (s, e) = (a.toLong, b.toLong)
      if (math.abs(e - s) > 1000000L) return Seq(spec)
      val nums = if (s <= e) s to e else s to e by -1
      nums.map(n =>
        if (pad > 0) ("%0" + pad + "d").format(n) else n.toString)
    } else if (a.length == 1 && b.length == 1 &&
        a.head.isLetter && b.head.isLetter) {
      val (s, e) = (a.head.toInt, b.head.toInt)
      val cs = if (s <= e) s to e else s to e by -1
      cs.map(_.toChar.toString)
    } else Seq(spec)
  }

  def globToRegex(glob: String): String = {
    val expanded = expandBraces(glob)
    if (expanded.lengthCompare(1) == 0) globToRegexOne(expanded.head)
    else expanded.map(globToRegexOne).mkString("(?:", "|", ")")
  }

  /** One brace-free pattern → regex; leftover (unbalanced) braces are
    * literal characters. */
  private def globToRegexOne(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' =>
          if (i + 1 < glob.length && glob.charAt(i + 1) == '*') {
            // globstar matches ZERO or more segments (bash/gitignore/
            // python semantics): "**/" as a unit → "(?:.*/)?" so
            // "**/*.jpg" still matches a root-level "photo.jpg", and a
            // bare "**" → ".*"; plain ".*" required at least one char
            // before the next "/" and silently dropped root matches
            if (i + 2 < glob.length && glob.charAt(i + 2) == '/') {
              sb.append("(?:.*/)?"); i += 2
            } else { sb.append(".*"); i += 1 }
          } else sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case c if "\\.[]()^$+|{}".indexOf(c) >= 0 => sb.append("\\").append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /**
   * `to_storage`: copy the blobs referenced by the `file` signal into
   * `destDir`. Placement mirrors the reference's options: "fullpath"
   * re-creates the relative tree; "filename" flattens (duplicate names
   * rejected up-front, reference: datachain.py:2722-2725). Runs
   * per-partition on executors.
   */
  def toStorage(df: DataFrame, destDir: String,
                placement: String = "fullpath", fileCol: String = "file"): Unit = {
    import df.sparkSession.implicits._
    val refs = df.select(
      col(s"$fileCol.source"), col(s"$fileCol.path"), col(s"$fileCol.size"),
      col(s"$fileCol.version"), col(s"$fileCol.etag"),
      col(s"$fileCol.is_latest"), col(s"$fileCol.last_modified"),
      col(s"$fileCol.location")).as[FileRef]
    if (placement == "filename") {
      val dup = refs.groupByKey(r => r.path.split('/').last).count()
        .filter(_._2 > 1).take(1)
      require(dup.isEmpty,
        s"duplicate filenames under 'filename' placement: ${dup.headOption.map(_._1)}")
    }
    refs.foreachPartition { (it: Iterator[FileRef]) =>
      val conf = new Configuration()
      // stream-to-stream per file (constant memory at any blob size),
      // bypassing the blob cache — an export sweep must not evict it
      it.foreach { r => r.export(destDir, placement, conf) }
    }
  }

  /** Relative destination path for an exported file under a placement
    * scheme (reference `get_destination_path`, src/datachain/lib/file.py).
    * Shared by [[toStorage]] and [[FileRef.export]]. */
  def placementPath(r: FileRef, placement: String): String = placement match {
    case "filename" => r.path.split('/').last
    case "etag"     =>
      // extension of the BASENAME: splitting the whole path on '.'
      // returned slash-containing "extensions" for dot-less names or
      // dotted directories ("v1.2/data" → "2/data"), and the "bin"
      // fallback could never fire
      val base = r.path.split('/').last
      val ext = if (base.contains('.')) base.substring(base.lastIndexOf('.') + 1) else "bin"
      r.etag + "." + ext
    case _           => r.path
  }
}
