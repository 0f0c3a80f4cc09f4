package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: SQL-only access to the custom expressions. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers graft functions for pure SQL") {
    // force the shared context up first, then build a sibling session with
    // extensions on the same SparkContext
    TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s.sql(
        """SELECT int_hash_64(42L) AS ih,
          | sip_hash_64('hello') AS sh,
          | bit_hamming_distance(0L, -1L) AS bh,
          | size(char_ngrams('abcd', 2)) AS ng,
          | size(minhash_signature('a b c d e', 8, 3)) AS mh""".stripMargin)
        .head()
      assert(r.getAs[Long]("ih") === graft.functions.Impl.intHash64(42L))
      assert(r.getAs[Long]("sh") ===
        graft.functions.Impl.sipHash64Bytes("hello".getBytes))
      assert(r.getAs[Int]("bh") === 64)
      assert(r.getAs[Int]("ng") === 3)
      assert(r.getAs[Int]("mh") === 8)
      // the MG aggregate is SQL-callable too (GROUP BY surface)
      val hh = s.sql(
        """SELECT heavy_hitters(t.w, 16, 2) AS hh FROM (
          |  SELECT explode(split('a a a b b c', ' ')) AS w) t""".stripMargin)
        .selectExpr("inline(hh)").collect()
        .map(x => (x.getString(0), x.getLong(1))).toSeq
      assert(hh === Seq(("a", 3L), ("b", 2L)))
      // the bounded-heap top-k aggregate is SQL-callable too
      val tk = s.sql(
        """SELECT topk_rows(CAST(n AS DOUBLE), w, 2) AS tk FROM (
          |  SELECT 'a' AS w, 3 AS n UNION ALL SELECT 'b', 9
          |  UNION ALL SELECT 'c', 9 UNION ALL SELECT 'd', 1) t""".stripMargin)
        .selectExpr("inline(tk)").collect()
        .map(x => (x.getDouble(0), x.getString(1))).toSeq
      assert(tk === Seq((9.0, "b"), (9.0, "c")))
      // NaN scores are skipped like nulls — they must neither rank nor
      // break the eval sort's comparator consistency
      val tkNaN = s.sql(
        """SELECT topk_rows(n, w, 3) AS tk FROM (
          |  SELECT 'a' AS w, CAST('NaN' AS DOUBLE) AS n
          |  UNION ALL SELECT 'b', 2.0D UNION ALL SELECT 'c', 1.0D
          |  UNION ALL SELECT 'd', CAST('NaN' AS DOUBLE)) t""".stripMargin)
        .selectExpr("inline(tk)").collect()
        .map(x => (x.getDouble(0), x.getString(1))).toSeq
      assert(tkNaN === Seq((2.0, "b"), (1.0, "c")))
      // the KLL quantile aggregate is SQL-callable too
      val kq = s.sql(
        """SELECT kll_quantiles(CAST(v AS DOUBLE), array(0.5D, 1.0D), 64) AS q
          |FROM (SELECT explode(sequence(1, 10)) AS v)""".stripMargin)
        .head().getSeq[Double](0)
      assert(kq === Seq(5.0, 10.0))
      // the weighted variant too: value 9 carries 10x the mass of 1..8
      val kw = s.sql(
        """SELECT kll_quantiles_weighted(CAST(v AS DOUBLE),
          |  CAST(CASE WHEN v = 9 THEN 10 ELSE 1 END AS BIGINT),
          |  array(0.5D), 64) AS q
          |FROM (SELECT explode(sequence(1, 9)) AS v)""".stripMargin)
        .head().getSeq[Double](0)
      assert(kw === Seq(9.0)) // cum weight hits ceil(0.5*18)=9 at v=9
    } finally {
      SparkSession.setActiveSession(TestSpark.spark)
      SparkSession.setDefaultSession(TestSpark.spark)
    }
  }
}
