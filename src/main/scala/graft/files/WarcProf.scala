package graft.files

import java.io.{BufferedInputStream, DataInputStream}
import java.util.zip.GZIPInputStream

/** Scratch profiler for the WARC record parser (no Spark). */
object WarcProf {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    (1 to 5).foreach { round =>
      val t0 = System.nanoTime()
      val in = new DataInputStream(new BufferedInputStream(
        new GZIPInputStream(java.nio.file.Files.newInputStream(
          java.nio.file.Paths.get(path)), 64 * 1024), 64 * 1024))
      val it = Warc.recordIterator(in, path, httpSplit = true)
      var n = 0L; var bytes = 0L
      while (it.hasNext) { val r = it.next(); n += 1; bytes += r.payload.length }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"round $round: $n records, ${bytes / 1e6}%.1f MB payload, " +
        f"${sec}%.3f s, ${bytes / 1e6 / sec}%.1f MB/s")
    }
  }
}
