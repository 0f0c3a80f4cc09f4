package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.functions.Impl
import graft.files.FileOps
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants for the pure kernels (no Spark session). */
object KernelProps extends Properties("graft.kernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("intHash64 deterministic + injective (bijective finalizer)") =
    forAll { (a: Long, b: Long) =>
      Impl.intHash64(a) == Impl.intHash64(a) &&
        (a == b || Impl.intHash64(a) != Impl.intHash64(b))
    }

  property("bitHamming symmetry/identity/triangle") =
    forAll { (a: Long, b: Long, c: Long) =>
      Impl.bitHammingDistance(a, a) == 0 &&
        Impl.bitHammingDistance(a, b) == Impl.bitHammingDistance(b, a) &&
        Impl.bitHammingDistance(a, c) <=
          Impl.bitHammingDistance(a, b) + Impl.bitHammingDistance(b, c)
    }

  property("byteHamming zero iff equal, bounded by max length") =
    forAll { (a: String, b: String) =>
      val d = Impl.byteHammingDistance(
        UTF8String.fromString(a), UTF8String.fromString(b))
      ((d == 0) == (a == b)) && d <= math.max(a.length, b.length)
    }

  property("normalize idempotent") = forAll { (s: String) =>
    val once = Impl.normalize(UTF8String.fromString(s))
    Impl.normalize(UTF8String.fromString(once)) == once
  }

  property("minhash: deterministic, k-wide, whitespace-insensitive") =
    forAll(text, Gen.choose(1, 32)) { (t, k) =>
      val u = UTF8String.fromString(t)
      val s1 = Impl.minhashSignature(u, k, 3).array.toSeq
      val s2 = Impl.minhashSignature(
        UTF8String.fromString("  " + t.replaceAll(" ", "   ") + " "), k, 3)
        .array.toSeq
      s1.length == k && s1 == s2
    }

  property("charNgrams: distinct, length n, all present in normalized text") =
    forAll(text, Gen.choose(1, 5)) { (t, n) =>
      val norm = Impl.normalize(UTF8String.fromString(t))
      val grams = Impl.charNgrams(UTF8String.fromString(t), n)
        .array.map(_.toString)
      grams.distinct.length == grams.length &&
        grams.forall(g => g.length == n && norm.contains(g))
    }

  property("glob: literal self-match; ** matches; * stays in one segment") = {
    val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    forAll(Gen.listOfN(3, seg)) { segs =>
      val path = segs.mkString("/")
      FileOps.globMatch(path, path) &&
        FileOps.globMatch("**", path) &&
        !FileOps.globMatch(segs.head + "/*", path)
    }
  }

  property("simhash is a bag-of-tokens fingerprint (order-free)") =
    forAll(Gen.listOfN(8, word), Gen.long) { (ws, seed) =>
      val rnd = new scala.util.Random(seed)
      val a = Impl.simHash64(UTF8String.fromString(ws.mkString(" ")))
      val b = Impl.simHash64(UTF8String.fromString(
        rnd.shuffle(ws).mkString(" ")))
      a == b
    }

  property("sipHash64 distinct on distinct short strings (sampled)") =
    forAll(word, word) { (a, b) =>
      a == b || Impl.sipHash64Bytes(a.getBytes) != Impl.sipHash64Bytes(b.getBytes)
    }

  property("boundsRank = linear count of boundaries <= v, any dup pattern") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(-100.0, 100.0)),
           Gen.chooseNum(-150.0, 150.0)) { (bs, v) =>
      val sorted = bs.sorted.toArray
      val e = org.apache.spark.sql.graft.BoundsRank(
        org.apache.spark.sql.catalyst.expressions.Literal(v), sorted)
      e.rank(v) == sorted.count(_ <= v)
    }

  property("topk_rows: any chunking/merge order + serde round-trip = sort-take") = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{DoubleType, StringType}
    val row = Gen.zip(Gen.choose(0, 9).map(_.toDouble), // dense score ties
      Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    forAll(Gen.listOf(row), Gen.choose(1, 7), Gen.choose(1, 5)) {
      (rows, k, chunk) =>
        val agg = org.apache.spark.sql.graft.TopKRows(
          BoundReference(0, DoubleType, nullable = true),
          BoundReference(1, StringType, nullable = true), k)
        def bufOf(part: Seq[(Double, String)]) = {
          val b = part.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
            agg.update(b, InternalRow(r._1, UTF8String.fromString(r._2)))
          }
          agg.deserialize(agg.serialize(b)) // shuffle-boundary round-trip
        }
        // merge MUTATES the accumulator (as Spark's agg machinery does —
        // each buffer is consumed once), so rebuild buffers per merge order
        def evalOf(parts: Seq[Seq[(Double, String)]]) = {
          val merged = parts.map(bufOf)
            .reduceLeftOption(agg.merge)
            .getOrElse(agg.createAggregationBuffer())
          agg.eval(merged).asInstanceOf[
              org.apache.spark.sql.catalyst.util.GenericArrayData]
            .array.toSeq.map { r =>
              val ir = r.asInstanceOf[InternalRow]
              (ir.getDouble(0), ir.getUTF8String(1).toString)
            }
        }
        val chunks = rows.grouped(chunk).toList
        val expected = rows.sortBy { case (s, i) => (-s, i) }.take(k)
        evalOf(chunks) == expected && evalOf(chunks.reverse) == expected
    }
  }
}
