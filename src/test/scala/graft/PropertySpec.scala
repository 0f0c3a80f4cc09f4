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

  // mixed ASCII / multi-byte / astral material, including strings
  // shorter than lcp+7 and equal prefixes
  private val binChunk: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(4)), Gen.const(""), Gen.const("é"),
    Gen.const("😀"), Gen.const("中文"), Gen.const("ÿ"),
    Gen.const("zz"))
  private val binStr: Gen[String] =
    Gen.listOfN(3, binChunk).map(_.mkString)

  property("StringBoundsRank monotone + exact boundary semantics (UTF-8 order)") =
    forAll(Gen.nonEmptyListOf(binStr), binStr, binStr) { (bs, x, y) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.StringType
      def u(s: String) = UTF8String.fromString(s)
      val sorted = bs.distinct.sortWith((a, b) => u(a).compareTo(u(b)) < 0)
      val r = org.apache.spark.sql.graft.StringBoundsRank(
        Literal(u(""), StringType), sorted.toArray)
      val (rx, ry) = (r.rank(u(x)), r.rank(u(y)))
      val cmp = u(x).compareTo(u(y))
      // rank = |{b : b <= v}| exactly, and monotone in byte order
      rx == sorted.count(b => u(b).compareTo(u(x)) <= 0) &&
        (if (cmp <= 0) rx <= ry else rx >= ry)
    }
}

/** Compiled-predicate parity: the executor-shippable [[graft.catalog
  * .FileStats.PPred]] tree must evaluate EXACTLY like the driver's
  * `mayMatch` for every predicate shape the pruner understands (and every
  * shape it doesn't — both must conservatively keep), including after a
  * Java serialization round-trip (the form in which it ships to tasks). */
object StatsPruneProps extends Properties("graft.statsprune") {

  import graft.catalog.FileStats
  import graft.catalog.FileStats.{ColStats, FileStat}
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  private val aRef = AttributeReference("a", LongType)()
  private val bRef = AttributeReference("b", DoubleType)()
  private val sRef = AttributeReference("s", StringType)()

  private val longLit: Gen[Literal] =
    Gen.choose(-6L, 14L).map(Literal(_, LongType))
  private val dblLit: Gen[Literal] =
    Gen.choose(-6.0, 14.0).map(Literal(_, DoubleType))
  private val strLit: Gen[Literal] = Gen.oneOf("a", "mm", "zz", "😀", "￿")
    .map(s => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
      StringType))
  private val nullLit: Gen[Literal] = Gen.const(Literal(null, LongType))
  // Decimal: comparable by lit() but NOT bloom-hashable — exercises the
  // cmp-only arm
  private val decLit: Gen[Literal] = Gen.choose(-6L, 14L)
    .map(v => Literal(Decimal(v), DecimalType(10, 0)))

  private def litFor(a: AttributeReference): Gen[Literal] =
    if (a eq aRef) Gen.frequency(6 -> longLit, 1 -> nullLit, 1 -> decLit)
    else if (a eq bRef) dblLit
    else strLit

  private val attrG: Gen[AttributeReference] = Gen.oneOf(aRef, bRef, sRef)

  // LIKE patterns spanning the supported prefix shape ('p%'), the
  // unsupported residuals (inner wildcards, escapes, bare '%'), and a
  // beyond-BMP prefix; StartsWith additionally lands on NON-string
  // attrs (type confusion — both evaluators must keep).
  private val likeLit: Gen[Literal] =
    Gen.oneOf("a%", "m%", "mm", "z_", "😀%", "%", "%%", "\\a%", "a\\%")
      .map(s => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        StringType))

  private val leaf: Gen[Expression] = attrG.flatMap { a =>
    litFor(a).flatMap { l =>
      Gen.oneOf(
        EqualTo(a, l), EqualTo(l, a),
        LessThan(a, l), LessThan(l, a),
        LessThanOrEqual(a, l), LessThanOrEqual(l, a),
        GreaterThan(a, l), GreaterThan(l, a),
        GreaterThanOrEqual(a, l), GreaterThanOrEqual(l, a),
        IsNull(a), IsNotNull(a),
        EqualNullSafe(a, l), EqualNullSafe(l, a),
        StartsWith(a, l),
        // the analyzer's widening promote-cast
        EqualTo(Cast(a, a.dataType), l),
        // unsupported shapes — both evaluators must keep the file
        EqualTo(Add(a, Literal(1L, LongType)), l),
        GreaterThan(a, a))
    }
  }
  private val likeLeaf: Gen[Expression] = for {
    a <- attrG; p <- likeLit
    e <- Gen.oneOf(StartsWith(a, p), Like(a, p, '\\'))
  } yield e
  private val inLeaf: Gen[Expression] = attrG.flatMap { a =>
    Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, litFor(a)))
      .map(ls => In(a, ls))
  }

  private def predG(depth: Int): Gen[Expression] =
    if (depth <= 0) Gen.frequency(5 -> leaf, 1 -> inLeaf, 1 -> likeLeaf)
    else Gen.frequency(
      3 -> leaf, 1 -> inLeaf, 1 -> likeLeaf,
      2 -> (for { l <- predG(depth - 1); r <- predG(depth - 1) }
        yield And(l, r)),
      2 -> (for { l <- predG(depth - 1); r <- predG(depth - 1) }
        yield Or(l, r)),
      2 -> predG(depth - 1).map(Not))

  private def colG(kind: String): Gen[Option[ColStats]] =
    Gen.frequency(1 -> Gen.const(None), 4 -> (kind match {
      case "l" => for {
        mn <- Gen.choose(-10L, 10L); w <- Gen.choose(0L, 8L)
        nulls <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 50L))
      } yield Some(ColStats("l", mn, mn + w, 0, 0, null, null, nulls))
      case "d" => for {
        mn <- Gen.choose(-10.0, 10.0); w <- Gen.choose(0.0, 8.0)
        nulls <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 50L))
      } yield Some(ColStats("d", 0, 0, mn, mn + w, null, null, nulls))
      case _ => for {
        xs <- Gen.listOfN(2, Gen.oneOf("a", "mm", "zz", "😀", "￿"))
        nulls <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 50L))
      } yield {
        def u(x: String) =
          org.apache.spark.unsafe.types.UTF8String.fromString(x)
        val srt = xs.sortBy(u)
        Some(ColStats("s", 0, 0, 0, 0, srt.head, srt.last, nulls))
      }
    }))

  private val statG: Gen[FileStat] = for {
    rows <- Gen.choose(1L, 60L)
    ca <- colG("l"); cb <- colG("d"); cs <- colG("s")
  } yield FileStat("f",
    rows,
    Seq("a" -> ca, "b" -> cb, "s" -> cs)
      .collect { case (n, Some(c)) => n -> c }.toMap)

  /** Real serialized bloom over a subset of the long domain for "a" —
    * exercises the precomputed-hash arm end to end. */
  private val bloomG: Gen[Map[String, Array[Byte]]] =
    Gen.frequency(1 -> Gen.const(Map.empty[String, Array[Byte]]),
      2 -> Gen.someOf(-6L to 14L).map { vs =>
        val bf = org.apache.spark.util.sketch.BloomFilter.create(64)
        vs.foreach { v =>
          bf.putLong(new XxHash64(Seq(Literal(v, LongType)))
            .eval(null).asInstanceOf[Long])
        }
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        Map("a" -> bos.toByteArray)
      })

  private def roundTrip(p: FileStats.PPred): FileStats.PPred = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(p); oos.close()
    new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[FileStats.PPred]
  }

  property("evalMay ∘ compile ≡ mayMatch (incl. serialized)") =
    forAll(predG(3), statG, bloomG) { (p, f, blooms) =>
      val expected = FileStats.mayMatch(p, f, blooms)
      val cp = FileStats.compile(p)
      FileStats.evalMay(cp, f, blooms) == expected &&
        FileStats.evalMay(roundTrip(cp), f, blooms) == expected
    }

  // ---- CDC kernel vs a naive sequential reference ----
  // Random unicode (incl. astral chars) × random clamps: chunkSpans
  // must equal a direct, obviously-correct simulation of the spec —
  // window polynomial over CODEPOINTS, cut when divisible and the
  // chunk is >= minLen, forced cut at maxLen, trailing remainder kept.
  private val uniChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.oneOf(" ", "\t", "é", "漢", "\u00ff"),
    1 -> Gen.oneOf("\uD83D\uDE00", "\uD83E\uDD16")) // astral pairs
  private val uniText: Gen[String] =
    Gen.listOf(uniChar).map(_.mkString)

  private def naiveCdc(s: String, k: Int, d: Long, mn: Int, mx: Int)
      : Seq[(Int, String)] = {
    val cps = s.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var prev = 0
    var i = 0
    while (i < cps.length) {
      val len = i - prev + 1
      val cand = i >= k - 1 && {
        var acc = 0L
        var w = 1L
        var j = 0
        while (j < k) { acc += cps(i - j).toLong * w; w *= graft.ops.Cdc.W; j += 1 }
        acc % d == 0
      }
      if ((cand && len >= mn) || len >= mx) {
        out += ((prev, new String(cps, prev, i + 1 - prev))); prev = i + 1
      }
      i += 1
    }
    if (prev < cps.length)
      out += ((prev, new String(cps, prev, cps.length - prev)))
    out.toSeq
  }

  property("cdc chunkSpans == naive reference, partitions the text") =
    forAll(uniText, Gen.choose(2, 12), Gen.choose(1L, 17L),
      Gen.choose(1, 6), Gen.choose(6, 40)) { (t, k, d, mn, mx) =>
      val got = graft.ops.Cdc.chunkSpans(t, k, d, mn, mx)
      got == naiveCdc(t, k, d, mn, mx) &&
        got.map(_._2).mkString == t
    }

  // ---- Winnowing kernel vs a naive per-window reference ----
  // The deque-based O(n) selection must equal the obviously-correct
  // O(n·w) simulation: for every window of w consecutive gram hashes
  // (one window over all grams when there are fewer than w), keep the
  // minimum, RIGHTMOST occurrence on ties, distinct positions in order.
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val h = graft.ops.Winnow.gramHashes(s, k)
    val g = h.length
    if (g == 0) return Seq.empty
    val sel = (0 to math.max(g - w, 0)).map { ws =>
      val end = math.min(ws + w - 1, g - 1)
      val mn = (ws to end).map(h).min
      (ws to end).filter(i => h(i) == mn).max
    }.distinct.sorted
    sel.map(i => (i + 1, h(i)))
  }

  property("winnow fingerprintSpans == naive reference") =
    forAll(uniText, Gen.choose(2, 9), Gen.choose(1, 10)) { (t, k, w) =>
      graft.ops.Winnow.fingerprintSpans(t, k, w) == naiveWinnow(t, k, w)
    }

  property("winnow catches every shared run of >= w+k-1 codepoints") =
    forAll(uniText, uniText, Gen.choose(2, 6), Gen.choose(1, 8),
      Gen.listOfN(24, Gen.alphaNumChar).map(_.mkString)) {
      (pre, suf, k, w, core0) =>
        // a common core of exactly w+k-1 codepoints embedded in
        // different contexts must yield at least one shared fp VALUE
        val core = core0.take(w + k - 1)
        (core.length == w + k - 1) ==> {
          val a = pre + core + suf
          val b = suf + core + pre
          val fa = graft.ops.Winnow.fingerprintSpans(a, k, w).map(_._2).toSet
          val fb = graft.ops.Winnow.fingerprintSpans(b, k, w).map(_._2).toSet
          fa.intersect(fb).nonEmpty
        }
    }

  property("winnow density: consecutive selections at most w grams apart") =
    forAll(uniText, Gen.choose(2, 6), Gen.choose(1, 8)) { (t, k, w) =>
      val pos = graft.ops.Winnow.fingerprintSpans(t, k, w).map(_._1)
      pos.sliding(2).forall {
        case Seq(a, b) => b > a && b - a <= w
        case _ => true
      }
    }
}

// ---- Hilbert curve kernels (graft.io.Hilbert) ----
// The classic 2-D kernel and Skilling's N-d transpose kernel are pinned
// on the three properties that define a Hilbert curve: the index/coords
// maps invert each other on the FULL index domain (bijectivity), the
// curve starts at the origin, and consecutive curve positions are
// grid-adjacent (one axis changes, by exactly 1 — the locality property
// Morton/Z-order lacks at quadrant boundaries).
object HilbertProps extends Properties("graft.hilbert") {
  import org.scalacheck.{Gen, Prop}
  import Prop.forAll
  import graft.io.Hilbert

  private val bits2: Gen[Int] = Gen.choose(1, 16)
  private def d2(bits: Int): Gen[Long] = Gen.choose(0L, (1L << (2 * bits)) - 1)

  property("index2 ∘ coords2 ≡ id (bijective on the full domain)") =
    forAll(bits2.flatMap(b => d2(b).map((b, _)))) { case (b, d) =>
      val (x, y) = Hilbert.coords2(d, b)
      x >= 0 && x < (1L << b) && y >= 0 && y < (1L << b) &&
        Hilbert.index2(x, y, b) == d
    }

  property("index2 starts at the origin") =
    forAll(bits2)(b => Hilbert.index2(0, 0, b) == 0L)

  property("coords2 unit step: consecutive positions are grid-adjacent") =
    forAll(bits2.flatMap(b => d2(b).map((b, _)))) { case (b, d0) =>
      val d = math.min(d0, (1L << (2 * b)) - 2)
      val (x1, y1) = Hilbert.coords2(d, b)
      val (x2, y2) = Hilbert.coords2(d + 1, b)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }

  private val nb: Gen[(Int, Int)] = for {
    n <- Gen.choose(2, 6)
    b <- Gen.choose(1, math.min(10, 62 / n))
  } yield (n, b)

  property("indexN ∘ coordsN ≡ id (bijective on the full domain)") =
    forAll(nb.flatMap { case (n, b) =>
      Gen.choose(0L, (1L << (n * b)) - 1).map((n, b, _)) }) { case (n, b, d) =>
      val c = Hilbert.coordsN(d, n, b)
      c.forall(v => v >= 0 && v < (1L << b)) &&
        Hilbert.indexN(c, b) == d
    }

  property("coordsN ∘ indexN ≡ id (coordinate-side round trip)") =
    forAll(nb.flatMap { case (n, b) =>
      Gen.listOfN(n, Gen.choose(0L, (1L << b) - 1)).map(c => (n, b, c)) }) {
      case (n, b, c0) =>
        val c = c0.toArray
        Hilbert.coordsN(Hilbert.indexN(c, b), n, b).sameElements(c)
    }

  property("indexN starts at the origin") =
    forAll(nb) { case (n, b) =>
      Hilbert.indexN(new Array[Long](n), b) == 0L }

  property("coordsN unit step: one axis changes by exactly 1") =
    forAll(nb.flatMap { case (n, b) =>
      Gen.choose(0L, (1L << (n * b)) - 2).map((n, b, _)) }) { case (n, b, d) =>
      val c1 = Hilbert.coordsN(d, n, b)
      val c2 = Hilbert.coordsN(d + 1, n, b)
      c1.indices.map(i => math.abs(c1(i) - c2(i))).sum == 1
    }
}

// ---- BPE kernels (graft.ops.Bpe) ----
// Training is pinned against an independently written O(V²) reference
// (sliding-window pair counts, sortBy argmax — different code shape
// from the library's fold/updateWith loop), and the replay encoder is
// pinned equal to the min-rank-iterative formulation GPT-2-style
// encoders use — the classical equivalence that holds for any table
// the trainer itself produced.
object BpeProps extends Properties("graft.bpe") {
  import org.scalacheck.{Gen, Prop}
  import Prop.forAll
  import graft.ops.Bpe

  private val word: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')))
      .map(_.mkString)
  private val corpus: Gen[List[(String, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      word.flatMap(w => Gen.choose(1L, 9L).map((w, _)))))

  private def naiveTrain(wc: Seq[(String, Long)], k: Int): Vector[(String, String)] = {
    var seqs = wc.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .map { case (w, c) => (Bpe.splitChars(w), c) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    var out = Vector.empty[(String, String)]
    for (_ <- 1 to k) {
      val counts = seqs.flatMap { case (s, c) =>
        s.sliding(2).filter(_.size == 2).map(p => ((p(0), p(1)), c)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (counts.nonEmpty) {
        // utf-8 order == natural order on this ascii alphabet
        val best = counts.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out :+= best
        seqs = seqs.map { case (s, c) => (Bpe.mergeLtr(s, best._1, best._2), c) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      }
    }
    out
  }

  /** min-rank-iterative encode (the GPT-2 formulation). */
  private def minRankEncode(w: String, merges: Vector[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var s = Bpe.splitChars(w)
    var go = true
    while (go && s.length > 1) {
      val cand = (0 until s.length - 1)
        .flatMap(i => rank.get((s(i), s(i + 1))).map(r => (r, i)))
      if (cand.isEmpty) go = false
      else {
        val r = cand.map(_._1).min
        val i = cand.filter(_._1 == r).map(_._2).min
        s = s.take(i) ++ Vector(s(i) + s(i + 1)) ++ s.drop(i + 2)
      }
    }
    s
  }

  property("train == independent naive reference") =
    forAll(corpus, Gen.choose(1, 10)) { (wc, k) =>
      Bpe.train(wc, k) == naiveTrain(wc, k)
    }

  // multi-byte symbols (2-byte é, 3-byte 中, astral 𝄞) exercise the
  // UTF-8 tie-break through the incremental trainer's lazy heap — the
  // ascii generator above can't distinguish byte order from char order
  private val wordU: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a", "z", "é", "中", "𝄞")))
      .map(_.mkString)
  private val corpusU: Gen[List[(String, Long)]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n,
      wordU.flatMap(w => Gen.choose(1L, 9L).map((w, _)))))

  property("incremental train == in-library full-recount trainer") =
    forAll(corpusU, Gen.choose(1, 12)) { (wc, k) =>
      Bpe.train(wc, k) == Bpe.trainNaive(wc, k)
    }

  property("train is input-order invariant") =
    forAll(corpus, Gen.choose(1, 6)) { (wc, k) =>
      Bpe.train(wc, k) == Bpe.train(wc.reverse, k)
    }

  property("mergeLtr: concat preserved, pair eliminated") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "ab")),
      Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (s0, a, b) =>
      val s = s0.toVector
      val m = Bpe.mergeLtr(s, a, b)
      m.mkString == s.mkString &&
        !m.iterator.sliding(2).withPartial(false)
          .exists(p => p(0) == a && p(1) == b)
    }

  property("encode: tokens reassemble the word") =
    forAll(corpus, word, Gen.choose(1, 8)) { (wc, w, k) =>
      val model = Bpe.Model(Bpe.train(wc, k))
      model.encode(w).mkString == w
    }

  property("replay encode == min-rank encode on trained tables") =
    forAll(corpus, word, Gen.choose(1, 10)) { (wc, w, k) =>
      val merges = Bpe.train(wc, k)
      Bpe.Model(merges).encode(w) == minRankEncode(w, merges)
    }

  property("extend(train(k1), k2) == train(k1+k2) — continuation is exact") =
    forAll(corpusU, Gen.choose(1, 6), Gen.choose(1, 6)) { (wc, k1, k2) =>
      val base = Bpe.Model(Bpe.train(wc, k1))
      Bpe.extend(base, wc, k2).merges == Bpe.train(wc, k1 + k2)
    }

  property("extend pins ids: every pre-extension token id survives") =
    forAll(corpusU, Gen.choose(1, 6), Gen.choose(1, 6)) { (wc, k1, k2) =>
      val bwc = wc.map { case (w, c) => (Bpe.toByteChars(w), c) }
      val base = Bpe.Model(Bpe.train(bwc, k1), byteLevel = true,
        specials = Vector("<|eot|>", "<|pad|>"))
      val ext = Bpe.extend(base, bwc, k2)
      val idsB = Bpe.tokenIds(base)
      val idsE = Bpe.tokenIds(ext)
      // old merges AND the reserved specials keep their exact ids —
      // a stream encoded under `base` decodes under `ext`
      idsB.forall { case (t, i) => idsE.get(t).contains(i) } &&
        idsE.values.toSeq.distinct.size == idsE.size
    }

  // arbitrary multibyte text (2/3/4-byte UTF-8, whitespace runs,
  // contractions, specials and their fragments) for the round-trip pin
  private val uniText: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "B", " ", "  ", "\n", "\t", "'s", "é",
      "中", "𝄞", "🙂", ",", "9", "<|eot|>", "<|f▁|>", "<", "|", ">"))
      .map(_.mkString)

  property("tokenizeRow → byte-inverse == original text (lossless)") = {
    val charToByte = Bpe.byteToChar.zipWithIndex
      .map { case (s, i) => s.charAt(0) -> i.toByte }.toMap
    val specials = Vector("<|eot|>", "<|f▁|>") // one non-Latin-1
    forAll(uniText, corpusU, Gen.choose(1, 6)) { (t, wc, k) =>
      val merges = Bpe.train(
        wc.map { case (w, c) => (Bpe.toByteChars(w), c) }, k)
      val model = Bpe.Model(merges, byteLevel = true, preTok = true,
        specials = specials)
      val rows = model.tokenizeRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val bytes = (0 until rows.numElements()).flatMap { i =>
        val r = rows.getStruct(i, 3)
        val tok = r.getUTF8String(2).toString
        // specials ride UNMAPPED (detokenize pre-maps them the same way)
        if (specials.contains(tok))
          tok.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
        else tok.map(charToByte)
      }.toArray
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == t
    }
  }

  // text built from marker FRAGMENTS so partial/overlapping prefixes
  // ("<|", "eot", full markers) land adjacent in every combination
  private val markerText: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", " ", "<", "|", ">", "eot", "pad",
      "<|eot|>", "<|pad|>")).map(_.mkString)

  property("splitOnSpecials: lossless, exact, specials never in plain runs") =
    forAll(markerText) { t =>
      val specials = Seq("<|eot|>", "<|pad|>")
      val segs = Bpe.splitOnSpecials(t, specials)
      segs.map(_._1).mkString == t &&
        segs.forall { case (s, isSp) =>
          if (isSp) specials.contains(s)
          else s.nonEmpty && specials.forall(sp => !s.contains(sp))
        }
    }
}
