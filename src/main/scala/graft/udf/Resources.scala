package graft.udf

import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap}

/**
 * UDF execution support — the Spark restatement of the reference's
 * execution knobs and shared resources:
 *
 *  - [[Settings]]: the reference's `settings(cache, prefetch, parallel,
 *    workers, batch_size, ...)` (reference: src/datachain/lib/settings.py).
 *    `parallel`/`workers` have no meaning on Spark (executors are the
 *    parallelism); they're accepted and ignored with that documented.
 *  - [[SetupRegistry]]: the reference's `setup=` lazily-initialized shared
 *    resources (reference: src/datachain/lib/dc/datachain.py:2637-2679) —
 *    per-executor singletons, initialized once per JVM, never serialized.
 *  - [[Prefetcher]]: bounded-lookahead iterator wrapping for blob I/O
 *    inside mapPartitions (reference: src/datachain/lib/udf.py:356-393
 *    async prefetch + src/datachain/asyn.py).
 */
final case class Settings(
    cache: Boolean = false,
    prefetch: Int = 2,
    batchSize: Int = 2000,
    // accepted for API parity; Spark's executor count is the parallelism
    parallel: Option[Int] = None,
    workers: Option[Int] = None)

object SetupRegistry {
  private val resources = new ConcurrentHashMap[String, AnyRef]()

  /** Get-or-create a named per-executor resource (thread-safe, lazy). */
  def get[T <: AnyRef](name: String)(create: => T): T =
    resources.computeIfAbsent(name, _ => create).asInstanceOf[T]

  def clear(): Unit = resources.clear()
}

object Prefetcher {

  /**
   * Wrap a partition iterator so that `lookahead` elements are materialized
   * ahead of the consumer on a background thread — overlaps blob fetch
   * latency with compute, like the reference's prefetch workers. Use inside
   * `mapPartitions` *before* the expensive per-row work:
   *
   * {{{
   * ds.mapPartitions { it =>
   *   Prefetcher.ahead(it.map(r => (r, r.file.readBytes())), 4)
   *     .map { case (r, bytes) => expensiveDecode(r, bytes) }
   * }
   * }}}
   */
  def ahead[T](it: Iterator[T], lookahead: Int): Iterator[T] = {
    if (lookahead <= 0) return it
    val queue = new ArrayBlockingQueue[AnyRef](lookahead)
    val End = new Object
    @volatile var error: Throwable = null
    val feeder = new Thread(() => {
      try it.foreach(x => queue.put(x.asInstanceOf[AnyRef]))
      catch { case t: Throwable => error = t }
      finally queue.put(End)
    }, "graft-prefetch")
    feeder.setDaemon(true)
    feeder.start()
    new Iterator[T] {
      private var nextElem: AnyRef = _
      private var done = false
      private def advance(): Unit = if (nextElem == null && !done) {
        nextElem = queue.take()
        if (nextElem eq End) {
          done = true; nextElem = null
          if (error != null) throw error
        }
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): T = {
        advance()
        if (done) throw new NoSuchElementException
        val r = nextElem.asInstanceOf[T]; nextElem = null; r
      }
    }
  }
}
