package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** As-of and binned range join semantics. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks the latest right row at or before the left time") {
    val left = Seq((1L, "a", 10.0), (2L, "a", 25.0), (3L, "a", 5.0),
      (4L, "b", 50.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, 100.0), ("a", 20.0, 200.0), ("b", 60.0, 999.0))
      .toDF("k", "rt", "v")
    val out = Joins.asofBackward(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // coincident right row matches
    assert(out(2L) === Some(200.0)) // latest preceding, not first
    assert(out(3L) === None)        // nothing at or before t=5
    assert(out(4L) === None)        // right row is after left time
  }

  test("asof joins: null times and null keys are never match candidates") {
    // a right row with NULL time sorted to every frame head and attached
    // its payload to every left row; null keys paired with null-key left
    // rows — both now read as "no candidate"
    val left = Seq((1L, "a", 10.0), (2L, null.asInstanceOf[String], 10.0))
      .toDF("id", "k", "t")
    val right = Seq(("a", Option.empty[Double], 99.0),
        ("a", Option(5.0), 42.0),
        (null.asInstanceOf[String], Option(5.0), 77.0))
      .toDF("k", "rt", "v")
      .select(col("k"), col("rt").cast("double").as("rt"), col("v"))
    val out = Joins.asofBackward(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(42.0), "the real candidate wins, not the null-time row")
    assert(out(2L) === None, "null keys match nothing")
    // a null-time LEFT row gets a null payload in BOTH directions
    val leftN = Seq((3L, "a", Option.empty[Double])).toDF("id", "k", "t")
      .select(col("id"), col("k"), col("t").cast("double").as("t"))
    val b = Joins.asofBackward(leftN, right, Seq("k"), "t", "rt")
      .select("v").as[Option[Double]].head()
    val f = Joins.asofForward(leftN, right, Seq("k"), "t", "rt")
      .select("v").as[Option[Double]].head()
    assert(b === None && f === None, s"null left time must not match: $b $f")
  }

  test("intervalOverlapJoin raises on inverted intervals even inside one bin") {
    val a = Seq((1L, 5.6, 5.2)).toDF("aid", "lo", "hi") // inverted, same bin
    val b = Seq((9L, 0.0, 10.0)).toDF("bid", "blo", "bhi")
    val e = intercept[Exception](
      Joins.intervalOverlapJoin(a, "lo", "hi", b, "blo", "bhi",
        binWidth = 1.0).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("intervalOverlapJoin")), msgs.mkString("|"))
  }

  test("asofBackward tolerance drops stale matches") {
    val left = Seq((1L, "a", 100.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, 7.0)).toDF("k", "rt", "v")
    val hit = Joins.asofBackward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(100.0)).select("v").as[Option[Double]].head()
    val miss = Joins.asofBackward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(50.0)).select("v").as[Option[Double]].head()
    assert(hit === Some(7.0))
    assert(miss === None)
  }

  test("asofForward picks the earliest right row at or after the left time") {
    val left = Seq((1L, "a", 10.0), (2L, "a", 15.0), (3L, "a", 25.0),
      (4L, "b", 70.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, 100.0), ("a", 20.0, 200.0), ("b", 60.0, 999.0))
      .toDF("k", "rt", "v")
    val out = Joins.asofForward(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // coincident right row matches
    assert(out(2L) === Some(200.0)) // earliest following, not latest
    assert(out(3L) === None)        // nothing at or after t=25
    assert(out(4L) === None)        // right row is before left time
    val tol = Joins.asofForward(left, right, Seq("k"), "t", "rt",
      tolerance = Some(3.0)).select("id", "v")
      .as[(Long, Option[Double])].collect().toMap
    assert(tol(2L) === None) // 20-15=5 beyond tolerance 3
  }

  test("asofNearest picks the closer side, ties to backward") {
    val left = Seq((1L, "a", 14.0), (2L, "a", 15.0), (3L, "a", 16.0),
      (4L, "a", 1.0), (5L, "a", 99.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, 100.0), ("a", 20.0, 200.0))
      .toDF("k", "rt", "v")
    val out = Joins.asofNearest(left, right, Seq("k"), "t", "rt")
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(100.0)) // 4 back vs 6 forward
    assert(out(2L) === Some(100.0)) // tie (5 vs 5) -> backward
    assert(out(3L) === Some(200.0)) // 6 back vs 4 forward
    assert(out(4L) === Some(100.0)) // only a forward candidate
    assert(out(5L) === Some(200.0)) // only a backward candidate
    // tolerance bounds BOTH directions: at t=1 the forward candidate is
    // 9 away — beyond 5 it is ignored entirely
    val tol = Joins.asofNearest(left, right, Seq("k"), "t", "rt",
      tolerance = Some(5.0)).select("id", "v")
      .as[(Long, Option[Double])].collect().toMap
    assert(tol(4L) === None)
    assert(tol(1L) === Some(100.0))
  }

  test("allowExactMatches=false makes all three directions strict") {
    val left = Seq((1L, "a", 10.0), (2L, "a", 15.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, 100.0), ("a", 20.0, 200.0), ("a", 5.0, 50.0))
      .toDF("k", "rt", "v")
    // backward: coincident t=10 row is hidden, falls back to t=5
    val b = Joins.asofBackward(left, right, Seq("k"), "t", "rt",
        allowExactMatches = false)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(b(1L) === Some(50.0))
    assert(b(2L) === Some(100.0)) // strictly-before rows unaffected
    // forward: coincident t=10 row is hidden, jumps to t=20
    val f = Joins.asofForward(left, right, Seq("k"), "t", "rt",
        allowExactMatches = false)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(f(1L) === Some(200.0))
    assert(f(2L) === Some(200.0))
    // nearest: the exact match at t=10 is excluded on BOTH sides, so the
    // candidates are t=5 (5 back) and t=20 (10 forward) -> backward wins;
    // ties (strictly before/after, equal distance) still go backward
    val n = Joins.asofNearest(left, right, Seq("k"), "t", "rt",
        allowExactMatches = false)
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(n(1L) === Some(50.0))
    assert(n(2L) === Some(100.0)) // 5 back vs 5 forward -> backward
  }

  test("timestamp as-of compares in exact long microseconds") {
    // microseconds apart at epoch magnitude — a double-seconds key
    // cannot represent these distances exactly
    val left = spark.sql(
      """SELECT 1L AS id, 'a' AS k,
        |  timestamp_micros(1700000000000010) AS t""".stripMargin)
    val right = spark.sql(
      """SELECT 'a' AS k, timestamp_micros(1700000000000000) AS rt,
        |  100.0D AS v
        |UNION ALL
        |SELECT 'a', timestamp_micros(1700000000000020), 200.0D""".stripMargin)
    // equidistant at exactly 10 µs either side: tie must go backward
    val out = Joins.asofNearest(left, right, Seq("k"), "t", "rt")
      .select("v").as[Option[Double]].head()
    assert(out === Some(100.0))
    // tolerance is still epoch SECONDS for timestamps: 10 µs = 1e-5 s
    val tol = Joins.asofNearest(left, right, Seq("k"), "t", "rt",
        tolerance = Some(1e-6)).select("v").as[Option[Double]].head()
    assert(tol === None)
    val tol2 = Joins.asofNearest(left, right, Seq("k"), "t", "rt",
        tolerance = Some(1e-4)).select("v").as[Option[Double]].head()
    assert(tol2 === Some(100.0))
  }

  test("asofBackward preserves genuinely-null right values for real matches") {
    val left = Seq((1L, "a", 30.0)).toDF("id", "k", "t")
    val right = Seq(("a", 10.0, Some(5.0)), ("a", 20.0, None))
      .toDF("k", "rt", "v")
    // the t=20 row IS the match; its null value must not fall back to t=10's
    val out = Joins.asofBackward(left, right, Seq("k"), "t", "rt")
      .select("v").as[Option[Double]].head()
    assert(out === None)
  }

  test("rangeJoinBinned equals the naive inequality join") {
    val points = (1 to 200).map(i => (i.toLong, i * 7.3 % 500)).toDF("id", "p")
    val ivs = (0 to 9).map(i => (i.toLong, i * 50.0 - 3.0, i * 50.0 + 61.0))
      .toDF("tier", "lo", "hi")
    val binned = Joins.rangeJoinBinned(points, "p", ivs, "lo", "hi", 50.0)
      .select("id", "tier").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("id", "tier").as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("intervalOverlapJoin equals the naive overlap join, duplicate-free") {
    // lengths straddle the bin width (some spans cover 3+ bins) so the
    // canonical-bin dedup is actually exercised
    val a = (1 to 150).map(i =>
      (i.toLong, i * 13.7 % 400, i * 13.7 % 400 + (i % 5) * 37.0 + 1))
      .toDF("a_id", "alo", "ahi")
    val b = (1 to 120).map(i =>
      (i.toLong, i * 29.1 % 400, i * 29.1 % 400 + (i % 7) * 23.0 + 1))
      .toDF("b_id", "blo", "bhi")
    val binned = Joins.intervalOverlapJoin(a, "alo", "ahi", b, "blo", "bhi",
        binWidth = 40.0)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val naive = a.join(b, col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(binned.length === binned.toSet.size, "pairs must not duplicate")
    assert(binned.toSet === naive.toSet)
    assert(binned.nonEmpty)
    // keyed variant: overlaps only within the same key
    val ka = a.withColumn("k", col("a_id") % 3)
    val kb = b.withColumn("k2", col("b_id") % 3)
    val keyed = Joins.intervalOverlapJoin(ka, "alo", "ahi", kb, "blo", "bhi",
        binWidth = 40.0, keyCols = Seq("k" -> "k2"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val keyedNaive = ka.join(kb, col("k") === col("k2") &&
        col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(keyed.length === keyed.toSet.size)
    assert(keyed.toSet === keyedNaive.toSet)
    // corrupt interval fails fast rather than descending sequences
    val bad = Seq((1L, 100.0, 5.0)).toDF("a_id", "alo", "ahi")
    intercept[Exception] {
      Joins.intervalOverlapJoin(bad, "alo", "ahi", b, "blo", "bhi", 40.0)
        .count()
    }
  }
}
