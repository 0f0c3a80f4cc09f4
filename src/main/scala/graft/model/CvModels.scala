package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Computer-vision signal models — the Spark counterparts of the
 * reference's `BBox`/`OBBox`/`Pose`/`Segment` data models
 * (reference: src/datachain/model/bbox.py:14,218, pose.py, segment.py).
 * Case classes give typed Dataset rows; the column helpers are pure
 * Catalyst arithmetic (codegen'd, usable in filters that push down).
 *
 * Geometry convention matches the reference: `coords = [x1, y1, x2, y2]`
 * (top-left, bottom-right), pose as parallel x/y arrays.
 */
final case class BBox(title: String, coords: Seq[Float])
final case class OBBox(title: String, coords: Seq[Float]) // 8 values, 4 corners
final case class Pose(x: Seq[Float], y: Seq[Float], visible: Seq[Float])
final case class Segment(title: String, x: Seq[Float], y: Seq[Float])

object CvColumns {

  /** Box area; 0 for degenerate boxes. */
  def bboxArea(coords: Column): Column = {
    val w = greatest(element_at(coords, 3) - element_at(coords, 1), lit(0.0))
    val h = greatest(element_at(coords, 4) - element_at(coords, 2), lit(0.0))
    w * h
  }

  /** Intersection-over-union of two [x1,y1,x2,y2] boxes. */
  def bboxIou(a: Column, b: Column): Column = {
    val ix = greatest(
      least(element_at(a, 3), element_at(b, 3)) -
        greatest(element_at(a, 1), element_at(b, 1)), lit(0.0))
    val iy = greatest(
      least(element_at(a, 4), element_at(b, 4)) -
        greatest(element_at(a, 2), element_at(b, 2)), lit(0.0))
    val inter = ix * iy
    val union = bboxArea(a) + bboxArea(b) - inter
    when(union <= 0.0, 0.0).otherwise(inter / union)
  }

  /** Whether box `a` fully contains box `b`. */
  def bboxContains(a: Column, b: Column): Column =
    element_at(a, 1) <= element_at(b, 1) &&
      element_at(a, 2) <= element_at(b, 2) &&
      element_at(a, 3) >= element_at(b, 3) &&
      element_at(a, 4) >= element_at(b, 4)

  /** Box center as [cx, cy]. */
  def bboxCenter(coords: Column): Column = array(
    (element_at(coords, 1) + element_at(coords, 3)) / 2,
    (element_at(coords, 2) + element_at(coords, 4)) / 2)

  /** Fraction of pose keypoints marked visible (> threshold). */
  def poseVisibleRatio(visible: Column, threshold: Double = 0.5): Column =
    when(size(visible) === 0, 0.0).otherwise(
      size(filter(visible, v => v > threshold)).cast("double") /
        size(visible).cast("double"))

  /** Oriented-box area from interleaved [x1,y1,x2,y2,x3,y3,x4,y4] corners
    * (reference OBBox layout, src/datachain/model/bbox.py:218) — the
    * 4-vertex case of [[segmentArea]]. */
  def obboxArea(coords: Column): Column =
    segmentArea(
      array(element_at(coords, 1), element_at(coords, 3),
        element_at(coords, 5), element_at(coords, 7)),
      array(element_at(coords, 2), element_at(coords, 4),
        element_at(coords, 6), element_at(coords, 8)))

  /** Polygon (Segment) area via the shoelace formula over parallel x/y
    * vertex arrays; 0 for degenerate (<3 vertex) polygons. */
  def segmentArea(x: Column, y: Column): Column = {
    val n = size(x)
    val cross = aggregate(sequence(lit(1), n), lit(0.0),
      (acc, i) => {
        val j = when(i === n, 1).otherwise(i + 1)
        acc + (element_at(x, i) * element_at(y, j) -
          element_at(x, j) * element_at(y, i)).cast("double")
      })
    when(n < 3, 0.0).otherwise(abs(cross) / 2)
  }
}
