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

  // ---- bbox format converters (reference convert_bbox,
  // src/datachain/model/utils.py:23-191): canonical storage is VOC
  // pixels [x1,y1,x2,y2]; every conversion mirrors the reference's
  // arithmetic exactly, incl. its two-stage rounding (banker's round to
  // 4 decimals, then banker's round to int for pixel outputs — Spark's
  // `bround` IS Python's round). All pure codegen projections. ----

  private def r4(c: Column): Column = bround(c.cast("double"), 4)
  private def px(c: Column): Column = bround(r4(c)).cast("int")

  /** COCO [x,y,w,h] pixels → VOC [x1,y1,x2,y2] int pixels
    * (reference BBox.from_coco). */
  def bboxFromCoco(c: Column): Column = array(
    px(element_at(c, 1)), px(element_at(c, 2)),
    px(element_at(c, 1) + element_at(c, 3)),
    px(element_at(c, 2) + element_at(c, 4)))

  /** VOC → COCO [x,y,w,h] int pixels (reference BBox.to_coco). */
  def bboxToCoco(c: Column): Column = array(
    px(element_at(c, 1)), px(element_at(c, 2)),
    px(element_at(c, 3) - element_at(c, 1)),
    px(element_at(c, 4) - element_at(c, 2)))

  /** YOLO normalized [xc,yc,w,h] × image [W,H] → VOC int pixels
    * (reference BBox.from_yolo). */
  def bboxFromYolo(c: Column, w: Column, h: Column): Column = array(
    px((element_at(c, 1) - element_at(c, 3) / 2) * w),
    px((element_at(c, 2) - element_at(c, 4) / 2) * h),
    px((element_at(c, 1) + element_at(c, 3) / 2) * w),
    px((element_at(c, 2) + element_at(c, 4) / 2) * h))

  /** VOC pixels → YOLO normalized [xc,yc,w,h] at 4 decimals
    * (reference BBox.to_yolo). */
  def bboxToYolo(c: Column, w: Column, h: Column): Column = array(
    r4((element_at(c, 1) + element_at(c, 3)) / 2 / w),
    r4((element_at(c, 2) + element_at(c, 4)) / 2 / h),
    r4((element_at(c, 3) - element_at(c, 1)) / w),
    r4((element_at(c, 4) - element_at(c, 2)) / h))

  /** Albumentations normalized [x1,y1,x2,y2] × image [W,H] → VOC int
    * pixels (reference BBox.from_albumentations). */
  def bboxFromAlbumentations(c: Column, w: Column, h: Column): Column =
    array(
      px(element_at(c, 1) * w), px(element_at(c, 2) * h),
      px(element_at(c, 3) * w), px(element_at(c, 4) * h))

  /** VOC pixels → Albumentations normalized at 4 decimals
    * (reference BBox.to_albumentations). */
  def bboxToAlbumentations(c: Column, w: Column, h: Column): Column =
    array(
      r4(element_at(c, 1) / w), r4(element_at(c, 2) / h),
      r4(element_at(c, 3) / w), r4(element_at(c, 4) / h))

  /** Point-in-box, edges inclusive (reference BBox.point_inside). */
  def bboxPointInside(x: Column, y: Column, box: Column): Column =
    element_at(box, 1) <= x && x <= element_at(box, 3) &&
      element_at(box, 2) <= y && y <= element_at(box, 4)

  /** Pose-in-box: every keypoint with x>0 OR y>0 lies inside (reference
    * BBox.pose_inside — origin keypoints mean "not detected"). */
  def bboxPoseInside(px: Column, py: Column, box: Column): Column =
    forall(zip_with(px, py, (a, b) => struct(a.as("x"), b.as("y"))),
      p => !(p.getField("x") > 0 || p.getField("y") > 0) ||
        bboxPointInside(p.getField("x"), p.getField("y"), box))

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
