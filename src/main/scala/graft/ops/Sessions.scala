package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization — gap-based session ids over event streams, the
 * declarative (window-function) twin of the stateful streaming version
 * ([[graft.streaming.EventStream.statefulSessionize]]).
 *
 * One shuffle on the entity key; both window passes share the same
 * partitioning, so Catalyst plans a single exchange.
 */
object Sessions {

  /**
   * Adds `sessionCol`: 1-based session id per `keyCol`, a new session
   * starting whenever the gap since the previous event exceeds `gapSec`.
   * `tieBreak` makes ordering total when timestamps collide.
   */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSec: Long = 1800, tieBreak: Option[String] = None,
                 sessionCol: String = "session_id"): DataFrame = {
    require(!df.columns.contains(sessionCol),
      s"input already has a '$sessionCol' column")
    val order: Seq[Column] =
      col(tsCol).asc +: tieBreak.map(c => col(c).asc).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull, 1)
      .when(unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSec, 1)
      .otherwise(0)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("long"))
  }
}
