package graft.files

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (ISO 28500) reader — the Common Crawl interchange format, and the
 * raw feed of every web-scale LLM corpus. The reference ingests crawl
 * output as generic files (src/datachain/lib/file.py); at 100 TB the
 * format that actually arrives is `.warc.gz`, so graft parses it natively.
 *
 * Scale design: WARC files are the parallelism unit. A `.warc.gz` is a
 * concatenation of gzip members and is NOT splittable without an external
 * index, so each file is parsed sequentially inside one task — exactly how
 * Common Crawl sizes them (~1 GB) to be consumed. A 100 TB crawl of 100k
 * files fans out to 100k independent tasks with zero shuffle and zero
 * driver involvement past the listing. Parsing STREAMS: records are
 * decoded one at a time off the (de-gzipped) input, so peak memory per
 * task is one record's payload, never the file.
 *
 * Each record row carries provenance (`warc_file`) plus the parsed WARC
 * headers the pipeline filters on (type, target URI, date, content type)
 * and — for `response` records carrying HTTP — the split HTTP status /
 * Content-Type / body, so the downstream chain (htmlToText → langId →
 * quality → dedup) starts from the body without re-parsing HTTP framing.
 */
object Warc {

  final case class WarcRecord(
      warc_file: String,
      record_id: String,
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      http_status: Option[Int],
      http_content_type: Option[String],
      payload: Array[Byte])

  /**
   * One row per WARC record under `glob` (`.warc` or `.warc.gz`; gzip
   * multi-member streams handled by the JDK inflater). `httpSplit = true`
   * (default) strips HTTP response framing from `application/http`
   * payloads into (http_status, http_content_type, body); raw payloads
   * pass through untouched for every other record type.
   */
  def readRecords(spark: SparkSession, glob: String,
                  httpSplit: Boolean = true,
                  types: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val g = new HPath(if (glob.contains("://")) glob else s"file://$glob")
    val fs0 = g.getFileSystem(conf.value)
    val files = Option(fs0.globStatus(g)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toUri.toString).toSeq.sorted
    val wanted = types.map(_.toLowerCase).toSet
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .flatMap { uri =>
        val p = new HPath(uri)
        val pfs = p.getFileSystem(conf.value)
        val raw: InputStream = pfs.open(p)
        val in = new DataInputStream(new BufferedInputStream(
          if (uri.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024)
          else raw, 64 * 1024))
        val it = recordIterator(in, uri, httpSplit)
        val filtered =
          if (wanted.isEmpty) it
          else it.filter(r => wanted.contains(r.warc_type.toLowerCase))
        // hasNext == false closes the stream (iterator is fully drained by
        // the task or abandoned with the input exhausted)
        filtered
      }
      .toDF()
      .withColumn("warc_date",
        // patternless parse: WARC 1.1 allows fractional seconds
        // (2026-01-02T03:04:05.123Z) which a seconds-only pattern
        // silently nulled; Spark's ISO parser takes any fraction width,
        // and try_ keeps genuinely bad dates null instead of failing
        // the whole scan under ANSI
        try_to_timestamp(col("warc_date")))
  }

  /** Streaming record iterator over one (decompressed) WARC stream. */
  private[files] def recordIterator(in: DataInputStream, uri: String,
                                    httpSplit: Boolean): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private var done = false

      private def advance(): Unit = {
        if (done || nextRec != null) return
        try {
          var version = readLine(in)
          // skip blank separators between records
          while (version != null && version.isEmpty) version = readLine(in)
          if (version == null) { done = true; in.close(); return }
          require(version.startsWith("WARC/"),
            s"$uri: expected WARC version line, got '$version'")
          val headers = scala.collection.mutable.LinkedHashMap[String, String]()
          var line = readLine(in)
          while (line != null && line.nonEmpty) {
            val i = line.indexOf(':')
            if (i > 0)
              headers(line.substring(0, i).trim.toLowerCase) =
                line.substring(i + 1).trim
            line = readLine(in)
          }
          val len = headers.getOrElse("content-length", "0").toLong
          require(len >= 0 && len <= Int.MaxValue,
            s"$uri: record content-length $len out of range " +
              "(2 GiB is the in-memory record limit)")
          val payload = new Array[Byte](len.toInt)
          in.readFully(payload)
          val ctype = headers.getOrElse("content-type", "")
          val (status, httpCt, body) =
            if (httpSplit && ctype.startsWith("application/http"))
              splitHttp(payload)
            else (None, None, payload)
          nextRec = WarcRecord(
            warc_file = uri,
            record_id = headers.getOrElse("warc-record-id", ""),
            warc_type = headers.getOrElse("warc-type", ""),
            target_uri = headers.getOrElse("warc-target-uri", ""),
            warc_date = headers.getOrElse("warc-date", ""),
            content_type = ctype,
            content_length = len,
            http_status = status,
            http_content_type = httpCt,
            payload = body)
        } catch {
          case _: EOFException => done = true; in.close()
          // malformed record (bad version line, garbage content-length):
          // close the stream BEFORE propagating — the task fails either
          // way, but must not leak one fd per attempt per bad file
          case scala.util.control.NonFatal(e) =>
            done = true
            try in.close() catch { case s: Throwable => e.addSuppressed(s) }
            throw e
        }
      }

      override def hasNext: Boolean = { advance(); nextRec != null }
      override def next(): WarcRecord = {
        advance()
        if (nextRec == null) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }

  /** Read one CRLF (or bare-LF) terminated ISO-8859-1 line; null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(80)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  /** Split an application/http payload into (status, Content-Type, body). */
  private[files] def splitHttp(
      payload: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    // find header/body boundary: CRLFCRLF (or LFLF)
    var i = 0
    var boundary = -1
    var bodyStart = -1
    while (boundary < 0 && i < payload.length - 1) {
      if (payload(i) == '\n') {
        if (payload(i + 1) == '\n') { boundary = i; bodyStart = i + 2 }
        else if (i + 2 < payload.length && payload(i + 1) == '\r' &&
                 payload(i + 2) == '\n') { boundary = i; bodyStart = i + 3 }
      }
      i += 1
    }
    if (boundary < 0) return (None, None, payload)
    val head = new String(payload, 0, boundary, "ISO-8859-1")
    val lines = head.split("\r?\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split("\\s+").lift(1))
      .flatMap(s => scala.util.Try(s.toInt).toOption)
    val ct = lines.drop(1).collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }
    (status, ct, java.util.Arrays.copyOfRange(payload, bodyStart, payload.length))
  }

  // ---------------------------------------------------------------- writer

  /**
   * Write records as a `.warc.gz` — one gzip member per record, the
   * Common Crawl convention that keeps records independently seekable.
   * Fixture/export helper (single stream); the distributed export path is
   * per-partition invocation from an executor task.
   */
  def writeRecords(out: java.io.OutputStream,
                   records: Iterator[(Map[String, String], Array[Byte])],
                   gzipPerRecord: Boolean = true): Unit = {
    records.foreach { case (headers, payload) =>
      val target: java.io.OutputStream =
        if (gzipPerRecord) new GZIPOutputStream(out, 64 * 1024) else out
      val sb = new java.lang.StringBuilder()
      sb.append("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
      target.write(sb.toString.getBytes("ISO-8859-1"))
      target.write(payload)
      target.write("\r\n\r\n".getBytes("ISO-8859-1"))
      target match {
        case g: GZIPOutputStream => g.finish()
        case _ =>
      }
    }
    out.close()
  }
}
