package graft.catalog

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/**
 * Job-scoped metrics & params — the Spark restatement of the reference's
 * `query/metrics.py` / `query/params.py` (job-scoped key-value metrics set
 * during UDF execution, recorded on the job).
 *
 * Distributed increments use Spark accumulators (the executor-safe path:
 * closures can bump a counter from any task, values merge on the driver);
 * scalar metrics/params are driver-side. `persist()` writes one JSON
 * sidecar per job under `<warehouse>/jobs/` — the catalog's job record.
 */
final class JobMetrics(catalog: Catalog, val jobId: String,
                       spark: SparkSession) {
  require(jobId.nonEmpty && !jobId.contains('/') && !jobId.contains('\\') &&
    !jobId.startsWith("."), s"invalid job id: '$jobId'")

  private val params = TrieMap.empty[String, String]
  private val metrics = TrieMap.empty[String, Double]
  private val counters = TrieMap.empty[String, LongAccumulator]

  def setParam(key: String, value: String): Unit = params.put(key, value)

  /** Set a scalar metric (reference `metrics.set`). */
  def set(key: String, value: Double): Unit = metrics.put(key, value)

  /** Executor-incrementable counter; safe to call `.add` inside any UDF
    * closure. Registered once per key. */
  def counter(key: String): LongAccumulator =
    counters.getOrElseUpdate(key, spark.sparkContext.longAccumulator(s"$jobId/$key"))

  def persist(): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    def obj(entries: Iterable[(String, String)]) =
      entries.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")
    val json = obj(Seq(
      "job" -> s""""${esc(jobId)}"""",
      "params" -> obj(params.map { case (k, v) => k -> s""""${esc(v)}"""" }),
      "metrics" -> obj(metrics.map { case (k, v) => k -> v.toString }),
      "counters" -> obj(counters.map { case (k, a) => k -> a.value.toString })))
    val dir = Paths.get(catalog.root, "jobs")
    Files.createDirectories(dir)
    Files.write(dir.resolve(s"$jobId.json"), json.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }
}

object JobMetrics {
  def apply(catalog: Catalog, jobId: String, spark: SparkSession): JobMetrics =
    new JobMetrics(catalog, jobId, spark)

  def read(catalog: Catalog, jobId: String): Option[String] = {
    val p = Paths.get(catalog.root, "jobs", s"$jobId.json")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8")) else None
  }
}
