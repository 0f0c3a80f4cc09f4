package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, Split, TextAnalysis}
import graft.core.Chain

/** Dedup / similarity / text-analysis / multimodal operator tests. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river shore"), // near dup of 1
    (4L, "completely different text about spark catalyst and tungsten codegen"),
    (5L, "der hund und die katze sind nicht zu hause heute")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized texts") {
    val groups = Dedup.exactDupGroups(docs, "text", "doc_id")
    val g = groups.collect()
    assert(g.length === 1)
    assert(g.head.getAs[Long]("keep_id") === 1L)
    assert(g.head.getAs[Long]("dup_count") === 2L)
  }

  test("exact dedup keeps one representative row per content hash") {
    val deduped = Dedup.exact(docs, "text", "doc_id")
    val ids = deduped.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 4L, 5L)) // 2 is the dup of 1; 1 is kept
    val dup = deduped.filter(col("doc_id") === 1).head()
    assert(dup.getAs[Long]("dup_count") === 2L)
    assert(deduped.filter(col("doc_id") === 3).head()
      .getAs[Long]("dup_count") === 1L)
  }

  test("null-text rows survive dedup: exact keeps a representative, subtractSeen keeps them") {
    // exact: null texts hash to a null key — the null-SAFE join must
    // still elect one representative for the null group (min id), like
    // exactDupGroups reports it, instead of dropping every null row
    val withNulls = Seq((1L, "same"), (2L, "same"),
      (7L, null.asInstanceOf[String]), (9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = Dedup.exact(withNulls, "text", "doc_id")
    assert(kept.select("doc_id").as[Long].collect().toSet === Set(1L, 7L),
      "one representative per group, null group included")
    assert(kept.filter(col("doc_id") === 7).head()
      .getAs[Long]("dup_count") === 2L)
    // subtractSeen: bloom_might_contain(null) is null — the row must
    // land in definite-new, never silently fail both branch filters
    val hist = Seq((1L, "seen")).toDF("doc_id", "text")
    val batch = Seq((10L, "seen"), (11L, null.asInstanceOf[String]),
      (12L, "fresh")).toDF("doc_id", "text")
    val out = Dedup.subtractSeen(batch, hist, "text", "doc_id",
      expectedItems = 10L)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(11L, 12L))
    // connectedComponents: a null endpoint is not a node — no NPE on
    // the local path, no phantom null row, star parity
    val e = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
      .unionByName(Seq(("x", "y")).toDF("a", "b")
        .select(lit(null).cast("long").as("id_a"), lit(5L).as("id_b")))
    val cc = Dedup.connectedComponents(e)
    assert(cc.filter(col("id").isNull).count() === 0)
    assert(cc.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L),
      "the null edge (and the node it alone introduced) is not a node")
    assert(cc.select("cluster_id").distinct().count() === 1)
    val ccDist = Dedup.connectedComponents(e, localEdgeThreshold = 0L)
    assert(ccDist.filter(col("id").isNull).count() === 0)
    assert(ccDist.select("id").as[Long].collect().toSet === Set(1L, 2L, 3L))
  }

  test("minhash signatures: identical for dups, k values, deterministic") {
    val sig = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), k = 16).as("sig"))
    val m = sig.as[(Long, Seq[Long])].collect().toMap
    assert(m(1L) === m(2L))             // exact dup → identical signature
    assert(m.values.forall(_.size === 16))
    val overlap13 = m(1L).zip(m(3L)).count { case (a, b) => a == b }
    val overlap14 = m(1L).zip(m(4L)).count { case (a, b) => a == b }
    assert(overlap13 > overlap14)       // near dup shares more minhashes
  }

  test("minhash LSH finds near-dup candidate pairs, not unrelated ones") {
    val edges = Dedup.minhashDedupEdges(docs, "text", "doc_id",
      threshold = 0.5, k = 16, bands = 8, ngram = 4)
    val pairs = edges.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash edges identical whichever shingle scope is used") {
    def run(candsOnly: Boolean) =
      Dedup.minhashDedupEdges(docs, "text", "doc_id", threshold = 0.5,
        k = 16, bands = 8, ngram = 4, shingleCandidatesOnly = candsOnly)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    assert(run(candsOnly = true) === run(candsOnly = false))
  }

  test("simhash near-dups") {
    val nd = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 10)
    val pairs = nd.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard: 1.0 for identical, low for unrelated") {
    val j = docs.alias("a").join(docs.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.ngramJaccard(col("a.text"), col("b.text"), 3).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 3L)) > 0.7)
    assert(j((1L, 5L)) < 0.4)
  }

  test("embedding near-dups via hyperplane LSH find planted copies") {
    val vecs = (0 until 50).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 8 + d).toFloat)
      (i.toLong, v)
    }
    val planted = vecs.take(5).map { case (id, v) => (id + 1000L, v) }
    val df = (vecs ++ planted).toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDups(df, "embedding", "vec_id",
      threshold = 0.999, planes = 8)
    val pairs = nd.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, i + 1000L))))
  }

  test("brute-force ANN returns self as top-1 with sim 1.0") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val topk = Similarity.bruteForceTopK(emb, queries, k = 3)
    val top1 = topk.filter(col("rank") === 1)
      .select("query_id", "vec_id", "sim")
      .as[(Long, Long, Double)].collect()
    top1.foreach { case (q, v, s) => assert(q === v); assert(s === 1.0) }
  }

  test("IVF ANN: self in top-k with high probe coverage") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (assigned, centroids) = Similarity.ivfBuild(emb, nlist = 4, iterations = 1)
    assert(assigned.count() === emb.count())
    val topk = Similarity.ivfTopK(assigned, centroids, queries, k = 3, nprobe = 4)
    // nprobe == nlist → exhaustive → self must be rank 1
    val top1 = topk.filter(col("rank") === 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    top1.foreach { case (q, v) => assert(q === v) }
  }

  test("language id picks marker-heavy language") {
    val r = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) === "en")
    assert(r(5L) === "de")
  }

  test("text quality / token count / fingerprint") {
    val r = docs.filter(col("doc_id") === 1)
      .select(TextAnalysis.tokenCount(col("text")),
        TextAnalysis.qualityScore(col("text")),
        TextAnalysis.fingerprintMd5(col("text")))
      .head()
    assert(r.getInt(0) === 13)
    assert(r.getDouble(1) >= 0.8)
    assert(r.getString(2).length === 32)
    // fingerprint normalization: whitespace/case-insensitive
    val fps = Seq("A  b", "a b").toDF("text")
      .select(TextAnalysis.fingerprintMd5(col("text"))).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("text signal edges: empty token count, stopword membership, US phone scrub") {
    // empty / whitespace-only text = 0 tokens (split of '' yields [''],
    // which uncorrected metered one phantom token)
    val tc = Seq("", "   ", "one two").toDF("text")
      .select(TextAnalysis.tokenCount(col("text"))).as[Int].collect()
    assert(tc.toSeq === Seq(0, 0, 2))
    // stopword ratio counts TOKEN membership: 'que' (in both fr and es
    // lists) counts once, and adjacent identical stopwords all count
    val sw = Seq("que sera", "the the cat").toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text"))).as[Double].collect()
    assert(math.abs(sw(0) - 0.5) < 1e-9, s"que counted twice? ${sw(0)}")
    assert(math.abs(sw(1) - 2.0 / 3.0) < 1e-9,
      s"adjacent stopwords undercounted? ${sw(1)}")
    // plain US-format phone (no country code) must redact too
    val pii = Seq("call 555-123-4567 or +1-555-123-4567 now").toDF("text")
      .select(TextAnalysis.scrubPii(col("text"))).as[String].head()
    assert(!pii.contains("4567"), pii)
    assert(pii.contains("<PHONE>"), pii)
  }

  test("vector kernels reject null elements; mp3 scan resumes past false syncs") {
    import graft.functions.GraftFunctions
    // a null slot must raise, not read as 0.0 (a plausible wrong distance)
    val vecs = Seq((Array[java.lang.Float](1.0f, null, 2.0f),
        Array[java.lang.Float](1.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
    val e = intercept[Exception](
      vecs.select(GraftFunctions.cosine_distance(col("a"), col("b")))
        .collect())
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("null element")), msgs(e).mkString("|"))
    // mp3: ID3 tag followed by 0xFF padding (a false sync with reserved
    // bitrate bits) then a REAL MPEG1 Layer III header — the scan must
    // resume past the padding instead of bailing with null
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 0)
    val pad = Array.fill[Byte](4)(0xFF.toByte) // sync-looking, brIdx=15
    val frame = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x00)
    val body = Array.fill[Byte](100)(0)
    val bytes = id3 ++ pad ++ frame ++ body
    val meta = Seq(Tuple1(bytes)).toDF("b")
      .select(GraftFunctions.mp3_frame_meta(col("b")).as("m"))
      .select("m.*").head()
    assert(meta.getAs[String]("version") === "1")
    assert(meta.getAs[Int]("bitrate_kbps") === 128)
  }

  test("htmlToText drops script/style/comment blocks and decodes entities") {
    val cases = Seq(
      ("<html><head><style media=\"x\">b{..}</style><script type=\"t\">" +
        "if (a < b) { run(); }</script></head><body><h1>Hi</h1>\n" +
        "<p>one&nbsp;two &amp; three</p><!-- drop\nme --></body></html>",
        "Hi one two & three"),
      // entity decode order: &amp; last, so double-escaped survives one level
      ("&amp;lt;tag&amp;gt; &lt;b&gt;", "&lt;tag&gt; <b>"),
      // multi-line script body, attributes with >-free values
      ("a<script>\nvar s = \"</scr\" + \"ipt>\";\n</script>b", "a b"),
      ("no markup at   all", "no markup at all"))
    val r = cases.map(_._1).toDF("h")
      .select(TextAnalysis.htmlToText(col("h"))).as[String].collect()
    assert(r.toSeq === cases.map(_._2))
  }

  test("url toolkit: registered domain edges, normalize idempotence, links") {
    import graft.ops.Urls
    // registered-domain edge matrix: case folding, multi-part suffixes,
    // IPv4 pass-through, single labels, a host that IS a public suffix
    val rd = Seq("WWW.Example.CO.UK", "a.b.example.com", "10.1.2.3",
        "localhost", "github.io", "x.github.io", "deep.x.github.io")
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String].collect()
    assert(rd.toSeq === Seq("example.co.uk", "example.com", "10.1.2.3",
      "localhost", "github.io", "x.github.io", "x.github.io"))

    // full-PSL semantics the curated set could not express:
    // wildcard rules (*.ck, *.nagoya.jp), the exception rule !www.ck,
    // PRIVATE-section suffixes (blogspot.com), and the default rule
    // for an unlisted TLD
    val psl = Seq(
      "x.anything.ck",        // *.ck → suffix anything.ck
      "anything.ck",          // IS a public suffix → itself
      "www.ck",               // !www.ck exception → registrable
      "a.www.ck",             // exception prevails over the wildcard
      "bar.foo.nagoya.jp",    // *.nagoya.jp (private section)
      "shop.example.nom.br",  // wildcard ccTLD rule *.nom.br
      "myblog.blogspot.com",  // private suffix → registrable at 3 labels
      "b.myblog.blogspot.com",
      "a.b.unlistedtld")      // default rule * → last label is the suffix
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String].collect()
    assert(psl.toSeq === Seq(
      "x.anything.ck", "anything.ck", "www.ck", "www.ck",
      "bar.foo.nagoya.jp", "shop.example.nom.br",
      "myblog.blogspot.com", "myblog.blogspot.com", "b.unlistedtld"))
    // kernel-level spot checks (same engine the expression codegens into)
    assert(graft.ops.Psl.isPublicSuffix("co.uk") &&
      graft.ops.Psl.isPublicSuffix("anything.ck") &&
      !graft.ops.Psl.isPublicSuffix("www.ck") &&
      !graft.ops.Psl.isPublicSuffix("example.co.uk"))

    // vectors from the published checkPublicSuffix test file
    // (publicsuffix.org/list — wildcard+exception mid-hierarchy, deep
    // state suffixes, a private uk.com): null-expected hosts map to
    // themselves under this API's pass-through choice
    val vec = Seq(
      "b.ide.kyoto.jp" -> "b.ide.kyoto.jp",   // ide.kyoto.jp is a suffix
      "a.b.ide.kyoto.jp" -> "b.ide.kyoto.jp",
      "c.kobe.jp" -> "c.kobe.jp",             // *.kobe.jp → IS a suffix
      "b.c.kobe.jp" -> "b.c.kobe.jp",
      "a.b.c.kobe.jp" -> "b.c.kobe.jp",
      "city.kobe.jp" -> "city.kobe.jp",       // !city.kobe.jp exception
      "www.city.kobe.jp" -> "city.kobe.jp",
      "test.k12.ak.us" -> "test.k12.ak.us",
      "www.test.k12.ak.us" -> "test.k12.ak.us",
      "example.uk.com" -> "example.uk.com",   // private-section uk.com
      "b.example.uk.com" -> "example.uk.com",
      // malformed shapes pass through VERBATIM (trailing-dot FQDN form
      // included — plain split would silently drop the empty label)
      "example.com." -> "example.com.",
      ".example.com" -> ".example.com")
    vec.foreach { case (h, want) =>
      assert(graft.ops.Psl.registeredDomain(h) === want, h) }

    // punycode fold: xn-- spellings of unicode PSL rules match at the
    // same depth as their unicode form, the answer keeps the caller's
    // (punycode) spelling, and the fold composes with the codegen'd
    // column path. орг.срб = xn--c1avg.xn--90a3ac (multi-label rule);
    // 公司.cn = xn--55qx5d.cn; рф = xn--p1ai. An invalid xn-- label
    // falls back to the default rule like any unlisted TLD.
    val puny = Seq(
      "www.example.xn--c1avg.xn--90a3ac" -> "example.xn--c1avg.xn--90a3ac",
      "example.xn--c1avg.xn--90a3ac" -> "example.xn--c1avg.xn--90a3ac",
      "deep.foo.bar.xn--55qx5d.cn" -> "bar.xn--55qx5d.cn",
      "www.example.xn--p1ai" -> "example.xn--p1ai",
      // unicode spelling of the same host — same depth
      "www.example.орг.срб" -> "example.орг.срб",
      "a.b.xn--thisisnotvalidpuny.zz" -> "xn--thisisnotvalidpuny.zz")
    puny.foreach { case (h, want) =>
      assert(graft.ops.Psl.registeredDomain(h) === want, h) }
    assert(graft.ops.Psl.isPublicSuffix("xn--c1avg.xn--90a3ac") &&
      graft.ops.Psl.isPublicSuffix("xn--55qx5d.cn") &&
      !graft.ops.Psl.isPublicSuffix("example.xn--c1avg.xn--90a3ac"))
    val punyCol = puny.map(_._1)
      .toDF("h").select(Urls.registeredDomain(col("h"))).as[String].collect()
    assert(punyCol.toSeq === puny.map(_._2))

    // review fixes: a '?' inside the fragment is NOT a query (SPA
    // routing URLs), and IPv6 literals keep their brackets
    val spa = Seq("https://ex.com/path#/route?tab=2").toDF("u")
      .select(Urls.urlNormalize(col("u"))).as[String].head()
    assert(spa === "https://ex.com/path", spa)
    val v6 = Seq("http://[2001:db8::1]:8080/x").toDF("u")
      .select(Urls.urlParts(col("u"))).head().getStruct(0)
    assert(v6.getAs[String]("host") === "[2001:db8::1]", v6.toString)
    assert(v6.getAs[Int]("port") === 8080)

    // normalize is idempotent: a canonical URL re-canonicalizes to itself
    val urls = Seq(
      "HTTPS://A.B:443/x?utm_source=s&z=1&a=2#f",
      "http://h.example.org:8080?p=1",
      "https://plain.example.com/path")
    val once = urls.toDF("u")
      .select(Urls.urlNormalize(col("u")).as("n1"))
      .withColumn("n2", Urls.urlNormalize(col("n1")))
      .collect()
    once.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(once.map(_.getString(0)).toSeq === Seq(
      "https://a.b/x?a=2&z=1", "http://h.example.org:8080/?p=1",
      "https://plain.example.com/path"))

    // link extraction: document order, case-insensitive tag, decoys
    // (img src, area, single-quoted href) are not extracted
    val links = Seq(
      "<a href=\"u1\">x</a><img src=\"nope\"><area href=\"nope2\">" +
        "<A class=\"c\" href=\"u2\">y</A><a href='sq'>z</a>")
      .toDF("h").select(Urls.extractLinks(col("h"))).as[Seq[String]].collect()
    assert(links.head === Seq("u1", "u2"))
  }

  test("train/test split is deterministic, complete, and disjoint") {
    val c = Chain(spark.read.parquet(s"$sf/orders.parquet"))
    val Seq(train, test) = Split.trainTestSplit(c, Seq(0.8, 0.2))
    val n = c.count()
    assert(train.count() + test.count() === n)
    val t1 = train.toDF.select("o_orderkey").as[Long].collect().toSet
    val t2 = test.toDF.select("o_orderkey").as[Long].collect().toSet
    assert(t1.intersect(t2).isEmpty)
    val again = Split.trainTestSplit(c, Seq(0.8, 0.2)).head
      .toDF.select("o_orderkey").as[Long].collect().toSet
    assert(again === t1)
  }

  test("bbox converters mirror the reference incl. banker's rounding") {
    import graft.model.CvColumns._
    // Python round() is HALF-EVEN: from_coco([1.5,2.5,3,4]) → x1=2 (1.5
    // rounds up to even 2), y1=2 (2.5 rounds DOWN to even 2), x2=4
    // (4.5→4), y2=6 (6.5→6) — reference BBox.from_coco semantics
    val df = Seq(Tuple1(Seq(1.5, 2.5, 3.0, 4.0))).toDF("c")
    assert(df.select(bboxFromCoco(col("c"))).head().getSeq[Int](0)
      === Seq(2, 2, 4, 6))
    // from_yolo / from_albumentations against hand-computed reference
    val y = Seq(Tuple1(Seq(0.5, 0.5, 0.25, 0.5))).toDF("c")
    assert(y.select(bboxFromYolo(col("c"), lit(640), lit(480)))
      .head().getSeq[Int](0) === Seq(240, 120, 400, 360))
    val a = Seq(Tuple1(Seq(0.1, 0.2, 0.3, 0.4))).toDF("c")
    assert(a.select(bboxFromAlbumentations(col("c"), lit(640), lit(480)))
      .head().getSeq[Int](0) === Seq(64, 96, 192, 192))
    // pose_inside: origin keypoints are "not detected" and skipped
    val p = Seq(
      (Seq(0.0, 250.0), Seq(0.0, 130.0)),
      (Seq(0.0, 500.0), Seq(0.0, 130.0))).toDF("px", "py")
      .withColumn("box", typedLit(Seq(240, 120, 400, 360)))
    val ins = p.select(bboxPoseInside(col("px"), col("py"), col("box")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ins === Seq(true, false))
  }

  test("cv model columns: area, iou, containment, pose visibility") {
    import graft.model._
    import graft.model.CvColumns._
    val df = Seq(
      (Seq(0.0, 0.0, 10.0, 10.0), Seq(0.0, 0.0, 10.0, 10.0)),   // identical
      (Seq(0.0, 0.0, 10.0, 10.0), Seq(20.0, 20.0, 30.0, 30.0)), // disjoint
      (Seq(0.0, 0.0, 10.0, 10.0), Seq(2.0, 2.0, 8.0, 8.0)))     // contained
      .toDF("a", "b")
    val r = df.select(round(bboxIou(col("a"), col("b")), 4).as("iou"),
      bboxContains(col("a"), col("b")).as("c")).collect()
    assert(r(0).getDouble(0) === 1.0)
    assert(r(1).getDouble(0) === 0.0)
    assert(r(2).getDouble(0) === 0.36) // 36/100
    assert(r(2).getBoolean(1))
    val pose = Seq(Tuple1(Seq(1.0, 0.0, 0.9, 0.2))).toDF("visible")
      .select(poseVisibleRatio(col("visible"))).as[Double].head()
    assert(pose === 0.5)
    // typed rows round-trip through Encoders
    val ds = Seq(BBox("cat", Seq(1f, 2f, 3f, 4f))).toDS()
    assert(ds.head().coords === Seq(1f, 2f, 3f, 4f))
    // oriented box: 3-4-5 right triangle doubled = rotated rect, area 12;
    // segment shoelace agrees on the axis-aligned unit square
    val ob = Seq(Tuple1(Seq(0.0, 0.0, 3.0, 4.0, 6.0, 0.0, 3.0, -4.0)))
      .toDF("coords").select(obboxArea(col("coords"))).as[Double].head()
    assert(ob === 24.0)
    val sq = Seq((Seq(0.0, 1.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0)))
      .toDF("x", "y").select(segmentArea(col("x"), col("y")))
      .as[Double].head()
    assert(sq === 1.0)
  }

  test("profile summarizes columns in one pass") {
    val p = graft.ops.Profile.summarize(
      spark.read.parquet(s"$sf/customer.parquet"))
    val byCol = p.collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(byCol.keySet === Set("c_custkey", "c_name", "c_nationkey",
      "c_acctbal", "c_mktsegment"))
    val bal = byCol("c_acctbal")
    assert(bal.getAs[Long]("nulls") === 0L)
    assert(bal.getAs[Double]("min") <= bal.getAs[Double]("p50"))
    assert(bal.getAs[Double]("p50") <= bal.getAs[Double]("p95"))
    assert(bal.getAs[Double]("p95") <= bal.getAs[Double]("max"))
    val name = byCol("c_name")
    assert(name.getAs[Double]("min") > 0) // string → length stats
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sum_l_quantity"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = graft.ops.Skew.groupBySalted(li, Seq("l_returnflag"),
        buckets = 8, sums = Seq("l_quantity"))
      .as[(String, Double, Long)].collect().toSet
    // sums of doubles: compare with tolerance (association order differs)
    val d = direct.map(t => t._1 -> ((t._2, t._3))).toMap
    val s = salted.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d.keySet === s.keySet)
    d.foreach { case (k, (sd, nd)) =>
      assert(math.abs(sd - s(k)._1) / math.max(1.0, math.abs(sd)) < 1e-12)
      assert(nd === s(k)._2)
    }
  }

  test("stopword ratio reflects marker density") {
    val r = Seq("the cat is on the mat", "lorem ipsum dolor sit amet")
      .toDF("text")
      .select(TextAnalysis.stopwordRatio(col("text"))).as[Double].collect()
    assert(r(0) > 0.3)
    assert(r(1) === 0.0)
  }

  test("multimodal resize scales metadata within the target box") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val decoded = Multimodal.decodeImages(
      Multimodal.syntheticMedia(docsDf, "doc_id", "text"))
    val resized = Multimodal.resizeImages(decoded, 640, 480)
    val dims = resized.select("meta.width", "meta.height")
      .as[(Int, Int)].collect()
    assert(dims.nonEmpty)
    dims.foreach { case (w, h) => assert(w <= 640 && h <= 480 && w > 0 && h > 0) }
    // aspect ratio preserved (within integer truncation)
    val orig = decoded.select("id", "meta.width", "meta.height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val res = resized.select("id", "meta.width", "meta.height")
      .as[(Long, Int, Int)].collect()
    res.foreach { case (id, w, h) =>
      val (ow, oh) = orig(id)
      // ratio comparison only meaningful away from integer-truncation range
      if ((ow > 640 || oh > 480) && w >= 10 && h >= 10)
        assert(math.abs(w.toDouble / h - ow.toDouble / oh) /
          (ow.toDouble / oh) < 0.2)
    }
  }

  test("multimodal decode stub: deterministic schema-stable plumbing") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.syntheticMedia(docsDf, "doc_id", "text")
    val decoded = Multimodal.decodeImages(media)
    assert(decoded.columns.toSeq === Seq("id", "meta", "features"))
    assert(decoded.count() === docsDf.count())
    val twice = Multimodal.decodeImages(media)
    assert(decoded.select("id", "meta.width").collect().toSet ===
      twice.select("id", "meta.width").collect().toSet)
    val frames = Multimodal.sampleFrames(media.limit(3), n = 4)
    assert(frames.count() === 12)
  }

  test("real image decode covers GIF and BMP via ImageIO") {
    for ((fmt, w, h) <- Seq(("gif", 17, 9), ("bmp", 23, 11))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      val (meta, feats) = Multimodal.decodeImage(bos.toByteArray, "raw")
      assert(meta.format === fmt)
      assert(meta.width === w && meta.height === h)
      // solid-color image → channel means match the fill exactly
      assert(feats(0) === 0x33.toFloat && feats(1) === 0x66.toFloat &&
        feats(2) === 0x99.toFloat)
    }
  }

  test("dHash: brightness-invariant, scale-robust; banded near-dups found") {
    def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val g = gray(x, y) & 0xFF
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // gradient signs survive a uniform brightness shift (no mod wrap)
    val base = png(90, 80, (x, y) => 10 + (x * 17 + y * 7) % 180)
    val bright = png(90, 80, (x, y) => 50 + (x * 17 + y * 7) % 180)
    val hBase = Multimodal.dHash64(base, "png")
    assert(hBase === Multimodal.dHash64(bright, "png"))
    // and a SMOOTH field survives a 2x downscale (box averages converge;
    // an aliasing sawtooth wouldn't — that's physics, not the hash)
    def smooth(w: Int, h: Int) = png(w, h, (x, y) => {
      val (u, v) = (x.toDouble / w, y.toDouble / h)
      (40 + 100 * u * u + 60 * v + 50 * u * v).toInt
    })
    val sm = Multimodal.dHash64(smooth(90, 80), "png")
    val dScale = java.lang.Long.bitCount(
      sm ^ Multimodal.dHash64(smooth(45, 40), "png"))
    assert(dScale <= 6, s"scale-robustness drift $dScale bits")
    // a different pattern is far away
    val other = png(90, 80, (x, y) => (x * x * 3 + y * 11) % 256)
    assert(java.lang.Long.bitCount(
      hBase ^ Multimodal.dHash64(other, "png")) > 10)
    // near-dup pair sweep: 20 distinct pattern images + 1 slightly
    // perturbed copy of image 0 — the banded join must surface exactly
    // the planted pair (and any true low-hamming organic pair the
    // brute-force check also finds)
    val rows = (0 until 20).map { i =>
      Multimodal.MediaRow(i.toLong,
        png(90, 80, (x, y) => (x * (13 + i) + y * (5 + 3 * i)) % 256), "png")
    } :+ Multimodal.MediaRow(100L,
      png(90, 80, (x, y) =>
        if (x == 3 && y == 4) 99 else (x * 13 + y * 5) % 256), "png")
    val media = rows.toDF()
    val pairs = Multimodal.imageNearDups(media, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hashes = Multimodal.imageDHash(media)
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= 3
    } yield (a, b)).toSet
    assert(pairs === brute)          // recall AND precision vs brute force
    assert(pairs.contains((0L, 100L))) // the planted perceptual near-dup
  }

  test("real WAV decode round-trips javax.sound encode via AudioSystem") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet").limit(20)
    val media = Multimodal.syntheticWavMedia(docsDf, "doc_id")
    val decoded = Multimodal.decodeAudios(media)
    val rows = decoded.select("id", "meta.sample_rate", "meta.channels",
      "meta.samples", "meta.format", "meta.codec", "meta.bit_rate").collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000)
      assert(r.getInt(2) === (1 + id % 2).toInt)
      assert(r.getLong(3) === 400 + (id % 32) * 25)
      assert(r.getString(4) === "wav")
      assert(r.getString(5) === "pcm_signed_16")
      assert(r.getInt(6) === 8000 * 16 * (1 + id % 2).toInt)
    }
    // non-audio payloads fall back to the deterministic stub, never throw
    val textMedia = Multimodal.syntheticMedia(docsDf, "doc_id", "text")
    val stubbed = Multimodal.decodeAudios(textMedia)
    assert(stubbed.count() === 20)
    assert(stubbed.select("meta.codec").distinct().head().getString(0) === "stub")
  }

  test("dedupLines removes corpus boilerplate, keeps unique lines in order") {
    import graft.ops.Corpus
    val docs = Seq(
      (1L, "alpha one\nSHARED FOOTER\nbeta one"),
      (2L, "alpha two\nSHARED FOOTER\nbeta two"),
      (3L, "alpha three\nSHARED FOOTER\nbeta three"),
      (4L, "SHARED FOOTER\nonly line left"),
      (5L, "SHARED FOOTER") // all lines removed -> doc dropped
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "alpha one\nbeta one",
      2L -> "alpha two\nbeta two",
      3L -> "alpha three\nbeta three",
      4L -> "only line left"))
    // below the threshold nothing is removed
    val loose = Corpus.dedupLines(docs, "doc_id", "text", minDocs = 6)
    assert(loose.count() === 5)
    assert(loose.filter(col("doc_id") === 1).head().getString(1) ===
      "alpha one\nSHARED FOOTER\nbeta one")
  }

  test("duplicatedGramFraction scores shared grams, drops short docs") {
    import graft.ops.Corpus
    val docs = Seq(
      (1L, "the cat sat on the mat today"),   // grams shared with doc 2
      (2L, "the cat sat on the mat tonight"), // differs in last token
      (3L, "completely different words entirely here now folks"),
      (4L, "too short")                       // < n tokens -> no grams
    ).toDF("doc_id", "text")
    val out = Corpus.duplicatedGramFraction(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 7 tokens -> 5 trigrams; docs 1 and 2 share the first 4 (the 5th
    // differs in its final token); doc 3 shares none; doc 4 vanishes
    assert(out === Map(1L -> ((5L, 4L)), 2L -> ((5L, 4L)), 3L -> ((5L, 0L))))
    val frac = Corpus.duplicatedGramFraction(docs, "doc_id", "text", n = 3)
      .filter(col("doc_id") === 1).head().getDouble(3)
    assert(frac === 0.8)
  }

  test("mixDomains: exact at 0/1, deterministic and monotone in between") {
    import graft.ops.Corpus
    val df = spark.range(2000).select(col("id"),
      concat(lit("d"), pmod(col("id"), lit(4))).as("dom"))
    val out = Corpus.mixDomains(df, "id", "dom",
      Map("d0" -> 1.0, "d1" -> 0.5, "d2" -> 0.0), defaultFraction = 0.25,
      seed = "s1")
    val counts = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("d0") === 500)            // keep-all
    assert(!counts.contains("d2"))          // drop-all
    assert(counts("d1") > 150 && counts("d1") < 350)   // ~0.5 of 500
    assert(counts("d3") > 50 && counts("d3") < 200)    // default 0.25
    // same seed -> identical sample; different seed -> different sample
    val again = Corpus.mixDomains(df, "id", "dom",
      Map("d1" -> 0.5), defaultFraction = 0.0, seed = "s1")
    val other = Corpus.mixDomains(df, "id", "dom",
      Map("d1" -> 0.5), defaultFraction = 0.0, seed = "s2")
    assert(again.collect().toSet === again.collect().toSet)
    assert(again.select("id").collect().toSet !==
      other.select("id").collect().toSet)
    // a 0.5 sample is a subset of rows, never modified rows
    assert(again.select("id", "dom").except(df).count() === 0)
  }

  test("topTokens counts globally with deterministic tie-break") {
    import graft.ops.Corpus
    val docs = Seq("b a a", "c b A", "c b").toDF("text")
    val top = Corpus.topTokens(docs, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("invertedIndex caps postings but keeps full-corpus df/tf") {
    import graft.ops.Corpus
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "a"), (4L, "b"))
      .toDF("doc_id", "text")
    val full = Corpus.invertedIndex(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(full === Set(("a", 3L, 4L, "1,2,3"), ("b", 2L, 2L, "1,4"),
      ("c", 1L, 1L, "2")))
    val capped = Corpus.invertedIndex(docs, "doc_id", "text", maxPostings = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(capped === Set(("a", 3L, 4L, "1,2"), ("b", 2L, 2L, "1,4"),
      ("c", 1L, 1L, "2")))
  }

  test("covarianceMatrix ignores null and wrong-length vectors") {
    // clean 2-dim rows plus a null row and a 3-dim straggler: the per-cell
    // n must be the clean count (3) for EVERY pair — without the up-front
    // hygiene filter the null row vanishes from all pairs and the long row
    // only from some, skewing n asymmetrically
    val rows = Seq(Some(Array(1f, 2f)), Some(Array(3f, 4f)),
      Some(Array(5f, 6f)), None, Some(Array(7f, 8f, 9f)))
      .toDF("embedding")
    val clean = Seq(Array(1f, 2f), Array(3f, 4f), Array(5f, 6f))
      .map(Tuple1(_)).toDF("embedding")
    val a = Similarity.covarianceMatrix(rows, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Similarity.covarianceMatrix(clean, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a === b)
    assert(a.keySet === Set((0, 0), (0, 1), (1, 1))) // modal dim = 2 wins
  }

  test("randomProjection: deterministic, sign-balanced, distance-preserving") {
    import graft.ops.Similarity
    // orthogonal scaled basis-ish vectors with known geometry
    val vecs = (0 until 8).map { v =>
      (v.toLong, Array.tabulate(64)(i => if (i == v * 8) 4.0f else 0.0f))
    }.toDF("vec_id", "vec")
    val out = Similarity.randomProjection(vecs, "vec", outDim = 16)
      .select(col("vec_id"), col("projected"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // determinism: a second run (different partitioning) is identical
    val out2 = Similarity.randomProjection(vecs.repartition(5), "vec", 16)
      .select(col("vec_id"), col("projected"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out === out2)
    // a one-hot input picks one signed matrix column: all entries ±4/√16
    assert(out(0L).forall(y => math.abs(math.abs(y) - 1.0) < 1e-9))
    // JL norm preservation in expectation: ||y||² within 3x of ||x||²=16
    // for every vector (loose bound — this is a 16-dim projection)
    out.values.foreach { y =>
      val n2 = y.map(v => v * v).sum
      assert(n2 > 16.0 / 3 && n2 < 16.0 * 3, s"norm²=$n2")
    }
  }

  test("pcaTopComponent recovers a planted principal direction") {
    // points on the line t*(0.6, 0.8): covariance is rank-1 with
    // eigenvector exactly the direction (sign-fixed positive)
    val pts = Seq(-2.0, -1.0, 1.0, 2.0)
      .map(t => Tuple1(Array(0.6f * t.toFloat, 0.8f * t.toFloat)))
      .toDF("embedding")
    val v = Similarity.pcaTopComponent(pts, "embedding", iterations = 30)
    assert(v.length === 2)
    assert(math.abs(v(0) - 0.6) < 1e-6 && math.abs(v(1) - 0.8) < 1e-6, v)
  }

  test("rrfFuse combines ranks reciprocally with deterministic ties") {
    import graft.ops.Corpus
    val runA = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val runB = Seq((3L, 9.0), (1L, 2.0)).toDF("id", "score")
    val out = Corpus.rrfFuse(Seq(runA, runB), "id", "score", kRrf = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    def s(rs: Int*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Set((1L, s(1, 2), 2L), (2L, s(2), 1L), (3L, s(3, 1), 2L)))
  }

  test("canonicalUrl normalizes scheme, host, port, params, and fragment") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
      "https://www.example.com/a/b?a=1&b=2",
      "http://example.com:80/",
      "http://example.com",
      "https://example.com:8443/x?fbclid=1&z=9"
    ).toDF("u")
    val got = urls.select(TextAnalysis.canonicalUrl(col("u")).as("c"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "https://www.example.com/a/b?a=1&b=2",
      "https://www.example.com/a/b?a=1&b=2",
      "http://example.com",
      "http://example.com",
      "https://example.com:8443/x?z=9")) // non-default port kept
  }

  test("kCore peels low-degree nodes and reports in-core degrees") {
    import graft.ops.Graph
    // K4 on {a,b,c,d} plus a pendant chain d-e-f: 3-core = the K4
    val edges = Seq(
      ("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"),
      ("d","e"),("e","f")
    ).toDF("src","dst")
    val core = Graph.kCore(edges, "src", "dst", k = 3, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(core === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("kCoreConverged reaches the fixpoint the fixed-rounds peel approaches") {
    import graft.ops.Graph
    // K4 + a 3-chain hanging off it: the chain peels over MULTIPLE rounds
    // (e peels only after f, d-side edge only after e), so convergence
    // genuinely iterates; the 3-core fixpoint is exactly the K4
    val edges = Seq(
      ("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d"),
      ("d","e"),("e","f"),("f","g")
    ).toDF("src","dst")
    val core = Graph.kCoreConverged(edges, "src", "dst", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(core === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    assert(Graph.lastKCoreRounds >= 2) // chain forces multi-round peeling
    // and the fixed-rounds variant at sufficient depth agrees
    val fixed = Graph.kCore(edges, "src", "dst", k = 3, rounds = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(fixed === core)
  }

  test("heavy_hitters is exact within capacity and ranks deterministically") {
    import graft.ops.Corpus
    val docs = Seq(
      ("s1", "x y x y x y z w"), // bigrams: x y(3) y x(2) y z(1) z w(1)
      ("s1", "x y q r"),
      ("s2", "a b a b c d")
    ).toDF("source", "text")
    val hh = Corpus.heavyHitterPhrases(docs, "text", "source",
        n = 2, capacity = 64, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(hh === Set(
      ("s1", 1L, "x y", 4L), ("s1", 2L, "y x", 2L),
      ("s2", 1L, "a b", 2L), ("s2", 2L, "b a", 1L)))
  }

  test("heavy_hitters beyond capacity: undercounts bounded, hitters survive") {
    import graft.functions.GraftFunctions.heavy_hitters
    // 3000 'hot' + 600 'warm' + 300 singleton keys, shuffled across
    // partitions; capacity 16 << 903 distinct forces MG decrements.
    // Bound: undercount <= N/(capacity+1); any item with true count
    // above that threshold is guaranteed present.
    val rows = (Seq.fill(3000)("hot") ++ Seq.fill(600)("warm") ++
      (1 to 300).map(i => s"one_$i"))
    val df = scala.util.Random.shuffle(rows).toDF("item").repartition(7)
    val n = rows.size.toDouble
    val out = df.agg(heavy_hitters(col("item"), 16, 16).as("hh"))
      .selectExpr("inline(hh)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = n / 17
    assert(out.contains("hot") && out.contains("warm"))
    assert(out("hot") <= 3000L && out("hot") >= (3000 - bound).toLong)
    assert(out("warm") <= 600L && out("warm") >= (600 - bound).toLong)
  }

  test("connectedComponentsStar: chains, cliques, self-loops; few rounds on long chains") {
    import graft.ops.Dedup
    // planted 1000-link chain + a separate triangle + a self-loop-only
    // node: star rounds must produce exactly min-label components
    val chain = (0L until 1000L).map(i => (i, i + 1))
    val extra = Seq((5000L, 5001L), (5001L, 5002L), (5000L, 5002L),
      (7777L, 7777L))
    val edges = (chain ++ extra).toDF("id_a", "id_b")
    val out = Dedup.connectedComponentsStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 1001 + 3 + 1)
    assert((0L to 1000L).forall(out(_) == 0L), "chain collapses to min id")
    assert(Seq(5000L, 5001L, 5002L).forall(out(_) == 5000L))
    assert(out(7777L) === 7777L) // self-loop-only node is its own cluster
    // the whole point vs min-label: rounds ≪ diameter (1000 here)
    assert(Dedup.lastStarRounds <= 15, s"rounds=${Dedup.lastStarRounds}")
    // cross-check against the min-label path on a shape IT can finish
    // (short chains), including id-order robustness (reversed edges)
    val short = (0L until 60L).map(i => (i + 1, i)).toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(short)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val label = Dedup.connectedComponents(short)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(star === label)
  }

  test("connectedComponents falls back to star rounds when maxIter is hit moving") {
    import graft.ops.Dedup
    // a 300-link chain with a 3-round label budget: min-label would stop
    // mid-propagation with wrong labels; the fallback must deliver the
    // exact clustering anyway (and record star rounds as evidence)
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain, maxIter = 3,
        localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 301)
    assert(out.values.forall(_ == 0L), "every node reaches the chain min")
    assert(Dedup.lastStarRounds > 0)
  }

  test("topk_rows: exact top-k under any partitioning, ties broken by item") {
    import graft.functions.GraftFunctions.topk_rows
    // 500 rows with heavily-duplicated scores (mod 17) so heap evictions
    // and score-ties both fire; k=9 << group size forces replacement on
    // both the update and merge paths. Expected = the plain sort answer.
    val rows = (0 until 500).map { i =>
      val id = f"id_${(i * 2654435761L) % 997}%04d_$i"
      (id, ((i * 31) % 17).toDouble)
    }
    val expected = rows.sortBy { case (id, s) => (-s, id) }.take(9)
      .map { case (id, s) => (s, id) }
    for (parts <- Seq(1, 7, 32)) {
      val out = rows.toDF("id", "s").repartition(parts)
        .agg(topk_rows(col("s"), col("id"), 9).as("tk"))
        .selectExpr("inline(tk)")
        .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
      assert(out === expected, s"parts=$parts")
    }
  }

  test("topk_rows: nulls skipped; short group returns all rows ordered") {
    import graft.functions.GraftFunctions.topk_rows
    val df = Seq((Some("a"), Some(1.0)), (None, Some(9.0)),
      (Some("b"), None), (Some("c"), Some(2.0))).toDF("id", "s")
    val out = df.agg(topk_rows(col("s"), col("id"), 10).as("tk"))
      .selectExpr("inline(tk)")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(out === Seq((2.0, "c"), (1.0, "a")))
  }

  test("topKPerGroup doubles as a deterministic bottom-k-by-hash group sampler") {
    import graft.ops.Corpus
    // score = -xxhash64(id): the kept rows are the k smallest hashes per
    // group — a uniform deterministic sample, reproduced exactly by the
    // sort answer and stable across partitionings
    val rows = (0 until 300).map(i => (s"g${i % 3}", s"item_$i"))
    val df = rows.toDF("g", "id")
    val out = Corpus.topKPerGroup(df.repartition(13), "g",
        -xxhash64(col("id")).cast("double"), col("id"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (g, members) =>
      val spark2 = members.map(_._2).toDF("id")
        .select(col("id"), xxhash64(col("id")).as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      spark2.sortBy { case (id, h) => (h, id) }.take(5).zipWithIndex
        .map { case ((id, _), i) => (g, (i + 1).toLong, id) }
    }.toSet
    assert(out === expected)
  }

  test("image_header_dims: header-only dims agree with the full decode; corrupt → null") {
    import graft.functions.GraftFunctions.image_header_dims
    def encode(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      bos.toByteArray
    }
    val rows = Seq(
      ("png", encode(37, 21, "png")), ("jpeg", encode(640, 480, "jpg")),
      ("gif", encode(13, 7, "gif")), ("bmp", encode(255, 300, "bmp")),
      ("junk", Array[Byte](1, 2, 3, 4, 5)))
    val out = rows.toDF("label", "payload")
      .select(col("label"), image_header_dims(col("payload")).as("h"))
      .collect().map { r =>
        r.getString(0) -> Option(r.getStruct(1)).map(s =>
          (s.getString(0), s.getInt(1), s.getInt(2)))
      }.toMap
    assert(out("png") === Some(("png", 37, 21)))
    assert(out("jpeg") === Some(("jpeg", 640, 480)))
    assert(out("gif") === Some(("gif", 13, 7)))
    assert(out("bmp") === Some(("bmp", 255, 300)))
    assert(out("junk") === None)
  }

  test("saltedJoin: parity with the plain join, hot key spread across buckets") {
    import graft.ops.Joins
    // one hot key (80% of the big side) + a long tail; small side has
    // unmatched keys, big side has rows with no match (left_outer case)
    val big = ((1 to 4000).map(i => (7L, s"hot_$i")) ++
      (1 to 1000).map(i => ((i % 50 + 100).toLong, s"tail_$i")) ++
      Seq((999L, "orphan"))).toDF("k", "payload")
    val small = ((100 to 149).map(i => (i.toLong, s"dim_$i")) ++
      Seq((7L, "dim_hot"), (888L, "dim_unmatched"))).toDF("k2", "name")
    for (how <- Seq("inner", "left_outer")) {
      val out = Joins.saltedJoin(big, small, "k", "k2", buckets = 8, how)
        .select("k", "payload", "name")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)))).toSeq.sorted
      val plain = big.join(small, col("k") === col("k2"), how)
        .select("k", "payload", "name")
        .collect().map(r => (r.getLong(0), r.getString(1),
          Option(r.getString(2)))).toSeq.sorted
      assert(out === plain, how)
    }
    // the hot key's rows really do spread over the salt space
    val salts = big.filter(col("k") === 7L)
      .withColumn("__s", pmod(xxhash64(struct(col("k"), col("payload"))),
        lit(8L)))
      .select("__s").distinct().count()
    assert(salts === 8L)
  }

  test("funnel: greedy-earliest strict chain, partial depth, optional gap") {
    import graft.ops.Sessions
    def ts(sec: Long) = sec * 1000000L
    val rows = Seq(
      (1L, ts(10), "signup"), (1L, ts(20), "view"), (1L, ts(30), "purchase"),
      // u2: pre-signup view ignored; purchase BEFORE its t2 ignored
      (2L, ts(5), "view"), (2L, ts(10), "signup"), (2L, ts(9), "view"),
      (2L, ts(15), "view"), (2L, ts(12), "purchase"),
      // u3 never signs up — not in the funnel at all
      (3L, ts(1), "purchase"),
      // u4: view at the signup instant is NOT strictly after; purchase 29s
      // after t2 completes without a gap but violates maxGapSec=20
      (4L, ts(10), "signup"), (4L, ts(10), "view"), (4L, ts(11), "view"),
      (4L, ts(40), "purchase"))
    val df = rows.toDF("user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Sessions.funnel(df, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("step_reached"))).toMap
    assert(out.keySet === Set(1L, 2L, 4L))
    assert(out(1L) === ((Some(ts(10)), Some(ts(20)), Some(ts(30)), 3L)))
    assert(out(2L) === ((Some(ts(10)), Some(ts(15)), None, 2L)))
    assert(out(4L) === ((Some(ts(10)), Some(ts(11)), Some(ts(40)), 3L)))
    val gapped = Sessions.funnel(df, "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), maxGapSec = Some(20L))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("step_reached")).toMap
    assert(gapped(4L) === 2L)
    assert(gapped(1L) === 3L)
  }

  test("rollingDistinct: window merges daily sketches; exact in the sparse regime") {
    import graft.ops.Sessions
    def t(day: Int, u: Long) =
      (java.sql.Timestamp.valueOf(f"2024-01-0$day%d 10:00:00"), u)
    // day1 = 1..100, day2 = 51..150 (50 overlap), day3 = 301..400
    val rows = (1L to 100L).map(t(1, _)) ++ (51L to 150L).map(t(2, _)) ++
      (301L to 400L).map(t(3, _))
    val out = Sessions.rollingDistinct(rows.toDF("ts", "user_id"),
        "user_id", "ts", days = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(out === Seq(
      ("2024-01-01", 100L, 100L),
      ("2024-01-02", 100L, 150L),   // union of days 1-2 dedupes overlap
      ("2024-01-03", 100L, 200L))) // disjoint days 2-3 sum
  }

  test("retentionCohorts: offsets from the first-event week, distinct actives") {
    import graft.ops.Sessions
    // 2024-01-01 is a Monday: u1 cohort week0 active weeks {0,2} (twice in
    // week2 — counted once); u2 cohort week1 active {1}
    def t(day: Int, h: Int = 0) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d ${h}%02d:00:00")
    val df = Seq(
      (1L, t(2)), (1L, t(15)), (1L, t(16)),
      (2L, t(10)), (2L, t(11))).toDF("user_id", "ts")
    val out = Sessions.retentionCohorts(df, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("frequencySketch: exact in the wide regime, never undercounts when narrow") {
    import graft.ops.Corpus
    // 2,000 distinct tokens with known zipf-ish counts; default width
    // ~136k >> 2,000 so every probe is exact
    val rows = (1 to 2000).flatMap(i => Seq.fill(1 + i % 7)(s"tok_$i"))
    val df = rows.toDF("t").repartition(9)
    val cms = Corpus.frequencySketch(df, "t")
    val probe = (1 to 2000).map(i => (s"tok_$i", (1 + i % 7).toLong))
      .toDF("t", "want")
    val out = Corpus.estimateFrequencies(probe, "t", cms)
    assert(out.filter(col("est_count") =!= col("want")).count() === 0L)
    // absent keys estimate small (bounded by eps·N), never negative
    val miss = Corpus.estimateFrequencies(
      Seq("absent_a", "absent_b").toDF("t"), "t", cms)
      .collect().map(_.getLong(1))
    assert(miss.forall(m => m >= 0L && m <= 2))
    // narrow sketch (width 100 << 2000 distinct): estimates can only
    // OVERcount — the CMS one-sided guarantee
    val narrow = Corpus.frequencySketch(df, "t", eps = math.E / 100)
    val over = Corpus.estimateFrequencies(probe, "t", narrow)
    assert(over.filter(col("est_count") < col("want")).count() === 0L)
  }

  test("chainops sugar threads LINEAGE: params and upstream change the hash") {
    // a bare Chain(df) would reset the OpTree to output column names —
    // different parameterizations or upstreams would then hash equal and
    // saveOrReuse could serve a stale checkpoint
    import graft.ops.chainops._
    import graft.core.Chain
    val a = Chain(Seq((1L, "some text here")).toDF("doc_id", "text"))
    val h64 = a.cdcChunks("text", "doc_id", divisor = 64).hash
    assert(h64 !== a.cdcChunks("text", "doc_id", divisor = 128).hash,
      "chunking params must reach the hash")
    // multi-valued params are length-prefixed + escaped: a separator
    // INSIDE an element can't collide with the element boundary (a
    // plain mkString("|") made these two hash equal → stale checkpoint)
    assert(a.blocklist("text", Seq("a|b")).hash !==
      a.blocklist("text", Seq("a", "b")).hash,
      "Seq(\"a|b\") and Seq(\"a\",\"b\") must hash differently")
    assert(a.mixByTokenBudget("doc_id", "text", "doc_id",
        Map("x=1,y" -> 2L)).hash !==
      a.mixByTokenBudget("doc_id", "text", "doc_id",
        Map("x" -> 1L, "y" -> 2L)).hash,
      "map entry boundaries must be unambiguous")
    assert(h64 !== a.filter(col("doc_id") > 0)
      .cdcChunks("text", "doc_id", divisor = 64).hash,
      "the upstream chain must reach the hash")
    // two-input sugar: the second chain contributes its own hash
    val hist1 = Chain(Seq((9L, "h")).toDF("doc_id", "text"))
    val hist2 = hist1.filter(col("doc_id") > 0)
    assert(a.subtractSeen(hist1, "text", "doc_id").hash !==
      a.subtractSeen(hist2, "text", "doc_id").hash,
      "the history chain must reach the hash")
  }

  test("chainops.cdcChunks / cdcShareStats mirror the Cdc ops") {
    import graft.ops.chainops._
    import graft.core.Chain
    val docs = Chain(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and AGAIN"),
      (3L, "completely different content with no reuse at all here"))
      .toDF("doc_id", "text"))
    val chunks = docs.cdcChunks("text", "doc_id", k = 8, divisor = 4).toDF
    assert(chunks.columns.toSeq === Seq("doc_id", "start", "chunk"))
    // partition property per doc through the fluent path
    val re = chunks.groupBy("doc_id")
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("start"), col("chunk")))).getField("chunk")).as("t"))
    assert(re.filter(col("doc_id") === 1L).head().getString(1)
      .startsWith("the quick brown"))
    val stats = docs.cdcShareStats("text", "doc_id", k = 8, divisor = 4)
      .toDF.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // docs 1 and 2 share their prefix chunks; doc 3 shares nothing
    assert(stats(1L) > 0 && stats(2L) > 0 && stats(3L) === 0L)
  }

  test("chainops.nearestNeighbors dispatches every tier; unknown method rejects") {
    import graft.ops.chainops._
    import graft.core.Chain
    val emb = Chain(spark.read.parquet(s"$sf/embeddings.parquet"))
    val q = Chain(emb.toDF.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding")))
    for (m <- Seq("brute", "hamming", "sq8", "pq")) {
      val out = emb.nearestNeighbors(q, k = 3, method = m).toDF
      assert(out.count() === 6L, m)
      assert(out.columns.contains("query_id") &&
        out.columns.contains("vec_id"), m)
    }
    intercept[IllegalArgumentException] {
      emb.nearestNeighbors(q, k = 3, method = "faiss")
    }
  }

  test("madOutliers: flags the planted tail, robust to the outliers themselves") {
    import graft.ops.Profile
    // 100 values near 50 + two extreme points; mean/stddev would be
    // dragged by the extremes, the median/MAD pair is not
    val rows = ((1 to 100).map(i => (i.toLong, 50.0 + (i % 11) - 5)) ++
      Seq((900L, 10000.0), (901L, -10000.0))).toDF("id", "v")
    val out = Profile.madOutliers(rows, "v", c = 3.0)
      .select("id", "is_outlier")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(900L) && out(901L))
    assert((1 to 100).forall(i => !out(i.toLong)))
    // winsorize trims the same tail instead of dropping it: row count
    // unchanged, extremes clamped to the exact [p05, p95] bounds
    val w = Profile.winsorize(rows, "v", loP = 0.05, hiP = 0.95)
    assert(w.count() === rows.count())
    val sorted = rows.select(col("v").cast("double")).as[Double]
      .collect().sorted
    val (lo, hi) = (sorted(math.ceil(0.05 * sorted.length).toInt - 1),
      sorted(math.ceil(0.95 * sorted.length).toInt - 1))
    val clamped = w.select("v_w").as[Double].collect()
    assert(clamped.min === lo && clamped.max === hi)
  }

  test("winsorize/madOutliers survive an all-null column (no sketch to read)") {
    import graft.ops.Profile
    val rows = (1 to 10).map(i => (i.toLong, null: java.lang.Double))
      .toDF("id", "v")
    val w = Profile.winsorize(rows, "v")
    assert(w.count() === 10 && w.columns.contains("v_w"))
    assert(w.select("v_w").collect().forall(_.isNullAt(0)))
    val m = Profile.madOutliers(rows, "v")
    assert(m.count() === 10)
    assert(m.select("is_outlier").as[Boolean].collect().forall(_ == false))
    assert(m.select("v_dev").collect().forall(_.isNullAt(0)))
  }

  test("Profile.drift: empty before snapshot yields boolean flags, never null") {
    import graft.ops.Profile
    val after = (1 to 10).map(i => (i.toDouble, i.toLong)).toDF("v", "k")
    val before = after.filter(lit(false))
    // n_before = 0 → row_change divides by zero (null); the flag must
    // still come back as a concrete boolean for every column
    val flags = Profile.drift(before, after, relTol = 0.1)
      .select("drift_flag").collect()
    assert(flags.nonEmpty && flags.forall(r => !r.isNullAt(0)))
  }

  test("pqTrain init: TakeOrdered+broadcast-rank ≡ the dense_rank window path") {
    import org.apache.spark.sql.expressions.Window
    // duplicate id among the lowest kc + unsorted input: the retired
    // dense_rank-over-unpartitioned-window init gave duplicate ids a
    // SHARED cid — the TakeOrdered + driver-rank + broadcast-join init
    // must reproduce its (subspace, cid, subvector) rows exactly
    val vs = Seq(
      (5L, Array(5f, 0f, 5f, 0f)),
      (3L, Array(3f, 1f, 3f, 1f)),
      (3L, Array(3f, 2f, 3f, 2f)),
      (9L, Array(9f, 0f, 9f, 0f)),
      (1L, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding")
    val parts = Similarity.pqParts(vs, m = 2, vecCol = "embedding",
      idCol = "vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).mkString(",")))
      .sorted.toSeq
    val got = rows(Similarity.pqInitCents(parts, vs, kc = 3,
      idCol = "vec_id"))
    val want = rows(parts
      .withColumn("cid", (dense_rank().over(Window.orderBy(col("__id")))
        .cast("int") - 1))
      .filter(col("cid") < 3)
      .select(col("__s"), col("cid"), col("__xs")))
    assert(got.size === 8 && got === want, s"got $got want $want")
  }

  test("pqTrain pads empty clusters: collapsed init still yields kc per subspace") {
    // ids 0 and 1 carry IDENTICAL vectors, so both init centroids (first
    // kc=2 ids) coincide and every point ties to cid 0 — cid 1 wins no
    // points in the Lloyd recompute and must keep its previous position
    // instead of vanishing (a jagged codebook mis-indexes the flattened
    // s*kc+code ADC table)
    val vs = ((0L, Array(1f, 1f, 1f, 1f)) +: (1L to 5L).map(i =>
      (i, if (i == 1) Array(1f, 1f, 1f, 1f)
          else Array(i.toFloat, 1f, i.toFloat, 1f)))).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(vs, m = 2, kc = 2, iterations = 2)
    assert(cb.length === 2 && cb.forall(_.length === 2),
      cb.map(_.length).toSeq.toString)
    // and the trained book scores without mis-indexing end-to-end
    val q = vs.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = Similarity.pqTopK(vs, q, k = 3, cb).collect()
    assert(top.length === 3)
  }

  test("videoHeaderMeta parses ISO-BMFF variants; non-MP4 yields null") {
    import graft.ops.Multimodal
    // 1. round-trip over the synthetic builder
    val media = Multimodal.syntheticMp4Media(
      (0L until 40L).toDF("doc_id"), "doc_id")
    val out = Multimodal.videoHeaderMeta(media)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    (0L until 40L).foreach { id =>
      assert(out(id) === (("isom", (1000.0 + (id % 97) * 500.0) / 1000.0,
        (64 + id % 32).toInt, (48 + id % 16).toInt)), s"id=$id")
    }
    // 2. structural variants, byte-edited from a known build
    val base = Multimodal.buildMp4("mp42", 600, 1200, 320, 240)
    val ftypLen = 20 // 8 + brand(4) + minor(4) + one compat brand(4)
    val (ftyp, moov) = base.splitAt(ftypLen)
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def parse1(bytes: Array[Byte]) = {
      val df = spark.createDataFrame(Seq((1L, bytes, "mp4")))
        .toDF("id", "payload", "format")
      Multimodal.videoHeaderMeta(df).collect().head
    }
    // trailing moov behind a big mdat: the walk skips the payload box
    val mdat = be32(8L + 100) ++ "mdat".getBytes("ISO-8859-1") ++
      Array.fill[Byte](100)(0)
    val r1 = parse1(ftyp ++ mdat ++ moov)
    assert(r1.getString(1) === "mp42" && r1.getDouble(2) === 2.0 &&
      r1.getInt(3) === 320 && r1.getInt(4) === 240)
    // 64-bit largesize mdat before the moov
    val big = be32(1L) ++ "mdat".getBytes("ISO-8859-1") ++
      Array.fill[Byte](8)(0).patch(0, be32(0L) ++ be32(16L + 50), 8) ++
      Array.fill[Byte](50)(0)
    val r2 = parse1(ftyp ++ big ++ moov)
    assert(r2.getString(1) === "mp42" && r2.getInt(3) === 320)
    // non-ISO-BMFF payload → null struct (expression is null-tolerant)
    val junk = spark.createDataFrame(Seq(
        (9L, "not a video at all".getBytes("UTF-8"), "bin")))
      .toDF("id", "payload", "format")
    val rj = Multimodal.videoHeaderMeta(junk).collect().head
    assert(rj.isNullAt(1) && rj.isNullAt(2) && rj.isNullAt(3) && rj.isNullAt(4))
    // truncated/corrupt moov: walk ends early, brand still surfaces
    val rc = parse1(ftyp ++ moov.take(20))
    assert(rc.getString(1) === "mp42" && rc.isNullAt(2))
  }

  test("videoHeaderMeta: EBML/WebM walk, unknown-size segment, float32 duration") {
    import graft.ops.Multimodal
    def parse1(bytes: Array[Byte]) = {
      val df = spark.createDataFrame(Seq((1L, bytes, "webm")))
        .toDF("id", "payload", "format")
      Multimodal.videoHeaderMeta(df).collect().head
    }
    // builder round-trip
    val base = Multimodal.buildWebm("matroska", 4500.0, 640, 360)
    val r = parse1(base)
    assert(r.getString(1) === "matroska" && r.getDouble(2) === 4.5 &&
      r.getInt(3) === 640 && r.getInt(4) === 360)
    // unknown-size Segment (streaming form: all size bits set)
    val segAt = base.indexOfSlice(Seq(0x18, 0x53, 0x80, 0x67).map(_.toByte))
    val unk = base.clone()
    unk(segAt + 4) = 0xFF.toByte // 1-byte size, all ones = unknown
    val r2 = parse1(unk)
    assert(r2.getString(1) === "matroska" && r2.getInt(3) === 640)
    // 4-byte float Duration variant, hand-built element stream
    def be(v: Long, n: Int): Array[Byte] =
      (n - 1 to 0 by -1).map(k => ((v >> (8 * k)) & 0xFF).toByte).toArray
    def el(id: Long, idLen: Int, body: Array[Byte]): Array[Byte] =
      be(id, idLen) ++ Array((0x80 | body.length).toByte) ++ body
    val f32 = el(0x1A45DFA3L, 4,
        el(0x4282L, 2, "webm".getBytes("ISO-8859-1"))) ++
      el(0x1549A966L, 4,
        el(0x2AD7B1L, 3, be(1000000L, 3)) ++
        el(0x4489L, 2, be(java.lang.Float.floatToIntBits(1250f) & 0xFFFFFFFFL, 4)))
    val r3 = parse1(f32)
    assert(r3.getString(1) === "webm" && r3.getDouble(2) === 1.25)
    // junk → null struct
    val junk = parse1("RIFFxxxxWEBPVP8 ".getBytes("ISO-8859-1"))
    assert(junk.isNullAt(1) && junk.isNullAt(2))
  }

  test("audioFrameMeta: MPEG2/2.5 tables, reserved indices, junk → null") {
    import graft.ops.Multimodal
    def mp3(h1: Int, h2: Int, h3: Int, pad: Int = 100): Array[Byte] = {
      val b = new Array[Byte](4 + pad)
      b(0) = 0xFF.toByte; b(1) = h1.toByte; b(2) = h2.toByte; b(3) = h3.toByte
      b
    }
    def parse1(bytes: Array[Byte]) = {
      val df = spark.createDataFrame(Seq((1L, bytes, "mp3")))
        .toDF("id", "payload", "format")
      Multimodal.audioFrameMeta(df).collect().head
    }
    // MPEG2 Layer III, bitrate idx 4 (V2L23 table → 32), sr idx 1 → 24000
    val v2 = parse1(mp3(0xF3, (4 << 4) | (1 << 2), 0xC0))
    assert(v2.getString(1) === "2" && v2.getInt(2) === 3 &&
      v2.getInt(3) === 32 && v2.getInt(4) === 24000 &&
      v2.getString(5) === "mono")
    // MPEG2.5 Layer II, idx 2 → 16 kbps, sr idx 0 → 11025
    val v25 = parse1(mp3(0xE5, 2 << 4, 0x40))
    assert(v25.getString(1) === "2.5" && v25.getInt(2) === 2 &&
      v25.getInt(3) === 16 && v25.getInt(4) === 11025 &&
      v25.getString(5) === "joint")
    // MPEG1 Layer I, idx 14 → 448 kbps
    val l1 = parse1(mp3(0xFF, (14 << 4) | (2 << 2), 0x00))
    assert(l1.getInt(2) === 1 && l1.getInt(3) === 448 &&
      l1.getInt(4) === 32000 && l1.getString(5) === "stereo")
    // reserved: free bitrate (0), bad bitrate (15), bad samplerate (3)
    assert(parse1(mp3(0xFB, 0 << 4, 0)).isNullAt(1))
    assert(parse1(mp3(0xFB, 15 << 4, 0)).isNullAt(1))
    assert(parse1(mp3(0xFB, (4 << 4) | (3 << 2), 0)).isNullAt(1))
    // junk without a frame sync
    assert(parse1("definitely not audio".getBytes("UTF-8") ++
      new Array[Byte](50)).isNullAt(1))
    // CBR duration estimate: bytes*8/bitrate from the sync offset
    val d = parse1(mp3(0xFB, (9 << 4) | (0 << 2), 0x00, pad = 1996))
    assert(d.getInt(3) === 128)
    assert(math.abs(d.getDouble(6) - 2000.0 * 8 / 128000.0) < 1e-12)
  }

  test("Profile.schemaDiff reports added/removed/retyped incl. nested paths") {
    import graft.ops.Profile
    val before = Seq((1L, "a", 2.0)).toDF("id", "keep", "gone")
      .withColumn("meta", struct(lit(1).as("x"), lit("s").as("y")))
    val after = Seq((1, "a", true)).toDF("id", "keep", "fresh")
      .withColumn("meta", struct(lit(1).as("x")))
    val d = Profile.schemaDiff(before, after)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d === Set(("gone", "removed"), ("meta.y", "removed"),
      ("fresh", "added"), ("id", "retyped")))
    // identical schemas → empty diff
    assert(Profile.schemaDiff(before, before).count() === 0L)
  }

  test("Profile.drift: flags mean/row/null movement, silent on identity") {
    import graft.ops.Profile
    val before = (1 to 100).map(i => (i.toDouble, i.toLong)).toDF("v", "k")
    def flags(after: org.apache.spark.sql.DataFrame) =
      Profile.drift(before, after, relTol = 0.1)
        .select("column", "drift_flag")
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // identical snapshot: nothing drifts
    assert(flags(before) === Map("v" -> false, "k" -> false))
    // one column's mean moves 50%: only it flags
    val shifted = before.withColumn("v", col("v") * 1.5)
    assert(flags(shifted) === Map("v" -> true, "k" -> false))
    // 20% of rows dropped: EVERY column flags through row_change
    val fewer = before.filter(col("k") <= 80)
    assert(flags(fewer).values.forall(identity))
    // nulls appearing in one column: null-rate flag
    val nulled = before.withColumn("v",
      when(col("k") % 5 === 0, lit(null)).otherwise(col("v")))
    val f = flags(nulled)
    assert(f("v") === true)
  }

  test("distinctSketch: mergeable — union of sketches equals sketch of union") {
    import graft.ops.Profile
    // two halves with a planted overlap; merging the per-half sketches
    // must give the same estimate as sketching the concatenation, and
    // both must land within the lgK=14 error envelope of the true 30k
    val h1 = (0 until 20000).map(i => ("a", s"item_$i"))
    val h2 = (10000 until 30000).map(i => ("b", s"item_$i"))
    val parts = Profile.distinctSketch(
      (h1 ++ h2).toDF("g", "id").repartition(11), Seq("g"), "id")
    val merged = Profile.unionEstimate(parts)
      .head().getLong(0)
    val direct = Profile.distinctSketch(
        (h1 ++ h2).map { case (_, id) => Tuple1(id) }.toDF("id")
          .withColumn("g", lit("all")), Seq("g"), "id")
      .head().getAs[Long]("estimate")
    assert(merged === direct, "associative merge")
    assert(math.abs(merged - 30000.0) / 30000.0 < 0.02, s"merged=$merged")
    // per-half estimates are accurate too
    val byG = parts.collect().map(r => r.getString(0) ->
      r.getAs[Long]("estimate")).toMap
    assert(math.abs(byG("a") - 20000.0) / 20000.0 < 0.02)
    assert(math.abs(byG("b") - 20000.0) / 20000.0 < 0.02)
  }

  test("distinctOverlap: inclusion-exclusion lands inside the error envelope") {
    import graft.ops.Corpus
    // |A|=20k, |B|=20k, |A∩B|=10k, |A∪B|=30k
    val a = (0 until 20000).map(i => Tuple1(s"item_$i")).toDF("id")
    val b = (10000 until 30000).map(i => Tuple1(s"item_$i")).toDF("id")
    val r = Corpus.distinctOverlap(a, b, "id").head()
    assert(math.abs(r.getAs[Long]("est_a") - 20000.0) / 20000.0 < 0.02)
    assert(math.abs(r.getAs[Long]("est_union") - 30000.0) / 30000.0 < 0.02)
    assert(math.abs(r.getAs[Long]("est_intersect") - 10000.0) / 30000.0 < 0.05)
    assert(math.abs(r.getAs[Double]("jaccard_est") - 1.0 / 3) < 0.05)
    // disjoint corpora: the intersect estimate is noise around zero,
    // clamped to the non-negative domain
    val c = (50000 until 70000).map(i => Tuple1(s"item_$i")).toDF("id")
    val d0 = Corpus.distinctOverlap(a, c, "id").head()
    assert(d0.getAs[Long]("est_intersect") <
      0.05 * d0.getAs[Long]("est_union"))
  }

  test("kll_quantiles exact regime: discrete quantiles, partitioning-invariant") {
    import graft.functions.GraftFunctions.kll_quantiles
    // deterministic shuffle of 1..1000; n=1000 <= k=2048, so no
    // compaction fires anywhere and the answer is the exact discrete
    // lower quantile regardless of how merges interleave
    val base = (1 to 1000).sortBy(i => (i * 2654435761L) % 1000003)
      .map(_.toDouble)
    for (parts <- Seq(1, 7, 32)) {
      val out = base.toDF("v").repartition(parts)
        .agg(kll_quantiles(col("v"), Seq(0.0, 0.25, 0.5, 0.9, 1.0), 2048))
        .head().getSeq[Double](0)
      assert(out === Seq(1.0, 250.0, 500.0, 900.0, 1000.0), s"parts=$parts")
    }
  }

  test("kll_quantiles under compaction: rank error within the documented bound") {
    import graft.functions.GraftFunctions.kll_quantiles
    // n >> k forces multi-level compaction; the estimate's TRUE rank must
    // stay within ~1.5·log2(n/k)/k of the requested rank (≈0.046 here —
    // asserted at 0.05 with the deterministic alternating compactor)
    val n = 60000
    val kk = 256
    val data = (0 until n).map(i => ((i * 2654435761L) % 999983).toDouble)
    val sorted = data.sorted
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val est = data.toDF("v").repartition(8)
      .agg(kll_quantiles(col("v"), probs, kk))
      .head().getSeq[Double](0)
    probs.zip(est).foreach { case (q, v) =>
      val rank = sorted.count(_ <= v)
      val err = math.abs(rank - q * n) / n
      assert(err < 0.05, s"q=$q est=$v rankErr=$err")
    }
  }

  test("kll_quantiles_weighted: equals the row-replicated unweighted sketch") {
    import graft.functions.GraftFunctions.{kll_quantiles, kll_quantiles_weighted}
    // weights 1..13 exercise multi-bit decomposition; the semantic
    // ground truth is literal row replication through the UNWEIGHTED
    // sketch (exact regime both sides, so both equal the true weighted
    // discrete quantiles), across partitionings
    val rows = (1 to 200).map(i =>
      (((i * 2654435761L) % 997).toDouble, (i % 13 + 1).toLong))
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val replicated = rows.flatMap { case (v, w) =>
      Seq.fill(w.toInt)(v) }
    val expected = replicated.toDF("v")
      .agg(kll_quantiles(col("v"), probs, 4096)).head().getSeq[Double](0)
    for (parts <- Seq(1, 7, 32)) {
      val got = rows.toDF("v", "w").repartition(parts)
        .agg(kll_quantiles_weighted(col("v"), col("w"), probs, 4096))
        .head().getSeq[Double](0)
      assert(got === expected, s"parts=$parts")
    }
    // null / non-positive weights are skipped; all-skipped yields null
    val mixed = Seq((1.0, Some(0L)), (2.0, None), (3.0, Some(2L)))
      .toDF("v", "w")
    assert(mixed.agg(kll_quantiles_weighted(col("v"), col("w"),
      Seq(0.5), 64)).head().getSeq[Double](0) === Seq(3.0))
    assert(mixed.filter(col("v") < 3)
      .agg(kll_quantiles_weighted(col("v"), col("w"), Seq(0.5), 64))
      .head().isNullAt(0))
  }

  test("kll_quantiles: nulls skipped, all-null group yields null") {
    import graft.functions.GraftFunctions.kll_quantiles
    val df = Seq(Some(3.0), None, Some(1.0)).toDF("v")
    val out = df.agg(kll_quantiles(col("v"), Seq(0.5, 1.0), 16))
      .head().getSeq[Double](0)
    assert(out === Seq(1.0, 3.0)) // n=2: ceil(0.5·2)=1 → smallest
    val empty = df.filter(col("v").isNull)
      .agg(kll_quantiles(col("v"), Seq(0.5), 16)).head()
    assert(empty.isNullAt(0))
  }

  test("chainops sugar for r7 ops: clusters, star clusters, projection, quantiles") {
    import graft.ops.chainops._
    import graft.core.Chain
    val edges = Chain(Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b"))
    assert(edges.dupClusters().toDF.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(edges.dupClustersStar().toDF.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val vecs = Chain(Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("id", "vec"))
    assert(vecs.randomProjection("vec", outDim = 4).toDF
      .select("projected").head().getSeq[Double](0).length === 4)
    val q = Chain((1 to 100).map(i => (i % 2, i.toDouble)).toDF("g", "v"))
      .quantilesByGroup("v", "g", Seq(0.5), k = 256).toDF
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).head).toMap
    assert(q(0) === 50.0 && q(1) === 49.0) // discrete lower quantiles
  }

  test("chainops sugar for r8 ops: overlap join, video/audio meta") {
    import graft.ops.chainops._
    import graft.core.Chain
    val a = Chain(Seq((1L, 0.0, 10.0), (2L, 50.0, 60.0)).toDF("a", "lo", "hi"))
    val b = Chain(Seq((7L, 5.0, 6.0), (8L, 100.0, 101.0)).toDF("b", "l2", "h2"))
    assert(a.overlapJoin(b, "lo", "hi", "l2", "h2", binWidth = 8.0)
      .toDF.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq === Seq((1L, 7L)))
    val vm = Chain(graft.ops.Multimodal.syntheticMp4Media(
      Seq(3L).toDF("doc_id"), "doc_id")).videoMeta().toDF.head()
    assert(vm.getString(1) === "isom" && vm.getInt(3) === 67)
    val am = Chain(graft.ops.Multimodal.syntheticMp3Media(
      Seq(3L).toDF("doc_id"), "doc_id")).audioMeta().toDF.head()
    assert(am.getString(1) === "1" && am.getInt(2) === 3)
  }

  test("fluent chainops pipeline: clean -> quality -> dedup -> pack") {
    import graft.ops.chainops._
    val c = Chain(docs.unionByName(
      docs.filter(col("doc_id") === 1).withColumn("doc_id", lit(99L))))
    val out = c.cleanText("text")
      .withQuality("text")
      .dedupExact("text", "doc_id")
      .packByTokens("token_count", "doc_id", budget = 20, shards = 2)
    val rows = out.toDF
    assert(rows.columns.contains("quality") && rows.columns.contains("pack_id"))
    // 1==2==99 exact dups -> one survivor with dup_count 3
    assert(rows.count() === 4)
    assert(rows.filter(col("doc_id") === 1).head()
      .getAs[Long]("dup_count") === 3L)
    val near = c.dedupNear("text", "doc_id", threshold = 0.5)
    assert(near.count() < c.count()) // near-dup 3 collapses too
  }

  test("connected components merge transitively linked dup edges (both paths)") {
    // components: {1,2,3} via 1-2, 2-3; {10,11}; 4,5 isolated (absent)
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    for (thresh <- Seq(2000000L, 0L)) { // driver union-find / label propagation
      val cc = Dedup.connectedComponents(edges, localEdgeThreshold = thresh)
        .as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }
  }

  test("connected components: long chain converges within diameter rounds") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // force the distributed path — the rounds bound is what's under test
    val cc = Dedup.connectedComponents(chain, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(cc.size === 12 && cc.values.forall(_ === 1L))
  }

  test("chunkText covers the text with the declared stride and overlap") {
    val df = Seq((1L, "a" * 950), (2L, "xy"), (3L, "")).toDF("id", "text")
    val chunks = df.select(col("id"),
        explode(TextAnalysis.chunkText(col("text"), 400, 100)).as("c"))
      .select(col("id"), col("c.chunk_idx"), length(col("c.chunk")).as("len"))
      .as[(Long, Long, Int)].collect()
    // 950 chars, stride 300: starts 0,300,600 → lens 400,400,350
    assert(chunks.filter(_._1 == 1L).map(c => (c._2, c._3)).sorted.toSeq ===
      Seq((0L, 400), (1L, 400), (2L, 350)))
    assert(chunks.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 2)))
    assert(chunks.filter(_._1 == 3L).toSeq === Seq((3L, 0L, 0)))
  }

  test("audio fragment sampling covers the declared duration") {
    val media = Seq(
      (1L, Array.fill[Byte](1000)(7), 10.0),  // 10s -> 4 fragments of 3s
      (2L, Array.fill[Byte](30)(1), 2.0))     // shorter than one fragment
      .toDF("id", "payload", "duration_sec")
    val frags = Multimodal.sampleAudioFragments(media, fragmentSec = 3.0)
      .select("id", "fragment_idx", "start_sec", "end_sec")
      .as[(Long, Int, Double, Double)].collect().sortBy(r => (r._1, r._2))
    val a1 = frags.filter(_._1 == 1L)
    assert(a1.length === 4)
    assert(a1.last._4 === 10.0)                       // last fragment ends at dur
    assert(a1.map(f => f._4 - f._3).sum === 10.0)     // fragments tile the clip
    assert(frags.filter(_._1 == 2L).toSeq === Seq((2L, 0, 0.0, 2.0)))
  }

  test("connected components agree with union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      for (thresh <- Seq(2000000L, 0L)) {
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"),
            localEdgeThreshold = thresh)
          .as[(Long, Long)].collect().toMap
        assert(got === want)
      }
    }
  }

  test("chunkText chunks reconstruct the text exactly (random configs)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 4) {
      val len = rnd.nextInt(3000)
      val size = 1 + rnd.nextInt(500)
      val overlap = rnd.nextInt(size)
      val stride = size - overlap
      val text = rnd.alphanumeric.take(len).mkString
      val chunks = Seq(Tuple1(text)).toDF("text")
        .select(explode(TextAnalysis.chunkText(col("text"), size, overlap)).as("c"))
        .select("c.chunk_idx", "c.chunk")
        .as[(Long, String)].collect().sortBy(_._1).map(_._2)
      // strip each chunk's overlap-with-previous, concatenate → original
      val rebuilt = chunks.head + chunks.tail.map(_.drop(overlap)).mkString
      assert(rebuilt === text, s"len=$len size=$size overlap=$overlap")
      // every chunk except the last is full-size
      chunks.dropRight(1).foreach(c => assert(c.length === size))
    }
  }

  test("scrubPii redacts emails, phones, ssns; leaves clean text alone") {
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org today",
      "call +1-555-123-4567 or 44 555 0100 200",
      "ssn 078-05-1120 ok",
      "nothing sensitive here").toDF("text")
    val out = df.select(TextAnalysis.scrubPii(col("text"))).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1).contains("<PHONE>") && !out(1).contains("555-123"))
    assert(out(2) === "ssn <SSN> ok")
    assert(out(3) === "nothing sensitive here")
  }

  test("stripHtml / stripUrls / dupLineFraction edge cases") {
    val rows = Seq(
      "<p>hello <b>world</b></p>",          // nested tags
      "no tags here",
      "<a href=\"x\">link</a><br/>text",    // adjacent tags
      "see https://a.b/c and www.d.e end",  // two urls
      "",                                   // empty
      "line\n\nline\nline\nother")          // blank + dup lines
      .toDF("text")
    val got = rows.select(
      TextAnalysis.stripHtml(col("text")).as("h"),
      TextAnalysis.stripUrls(col("text")).as("u"),
      round(TextAnalysis.dupLineFraction(col("text")), 4).as("d"))
      .collect()
    assert(got(0).getString(0) === "hello world")
    assert(got(1).getString(0) === "no tags here")
    assert(got(2).getString(0) === "link text")
    assert(got(3).getString(1) === "see and end")
    assert(got(4).getString(0) === "" && got(4).getDouble(2) === 0.0)
    // 4 non-blank lines, 2 distinct -> half are repeats of earlier lines
    assert(got(5).getDouble(2) === 0.5)
  }

  test("stratified sample caps each stratum deterministically") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = Split.stratifiedSample(df, "grp", "id", 10)
    val s2 = Split.stratifiedSample(df, "grp", "id", 10)
    assert(s1.groupBy("grp").count().as[(String, Long)].collect().toMap ===
      Map("a" -> 10L, "b" -> 10L))
    assert(s1.collect().toSet === s2.collect().toSet) // reproducible
  }

  test("lmPerplexity matches hand-computed interpolated bigram scores") {
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((1L, "a b c")).toDF("doc_id", "text")
    val r = graft.ops.Corpus.lmPerplexity(train, score, "doc_id", "text")
      .collect().head
    // train: U(a)=2 U(b)=2 T=4 V=2; B(a,b)=2 B(b,a)=1
    val pAB = 0.9 * 2.0 / 2.0 + (1 - 0.9) * (2 + 1) / 6.0
    val pBC = 0.0 + (1 - 0.9) * (0 + 1) / 6.0 // unseen bigram AND unseen w2
    val expAvg = BigDecimal((math.log(pAB) + math.log(pBC)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_bigrams") === 2L)
    assert(math.abs(r.getAs[Double]("avg_logp") - expAvg) < 2e-6)
    assert(math.abs(r.getAs[Double]("ppl") - math.exp(-expAvg)) < 1e-2)
  }

  test("lmPerplexity ranks in-domain text as less perplexed than gibberish") {
    val train = docs
    val score = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "zxq wvut plof gmern kwyt blarg snee")).toDF("doc_id", "text")
    val m = graft.ops.Corpus.lmPerplexity(train, score, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(m(10L) < m(11L))
  }

  test("writeTarShards round-trips keys, exts and payload bytes") {
    val out = java.nio.file.Files.createTempDirectory("wds_w").toString
    val rows = (1 to 30).map(i => (f"s/k$i%03d", "txt",
      ("payload " * (i % 5 + 1) + i).getBytes("UTF-8")))
      .toDF("sample_key", "ext", "data")
    graft.files.WebDataset.writeTarShards(
      rows.repartitionByRange(2, col("sample_key"))
        .sortWithinPartitions("sample_key"),
      out, maxShardBytes = 200)
    val back = graft.files.WebDataset.readTarMembers(spark, s"$out/*.tar")
      .select("sample_key", "ext", "data")
      .as[(String, String, Array[Byte])].collect()
      .map { case (k, e, d) => (k, e, new String(d, "UTF-8")) }.toSet
    val want = (1 to 30).map(i => (f"s/k$i%03d", "txt",
      "payload " * (i % 5 + 1) + i)).toSet
    assert(back === want)
    // 200-byte roll on ~40-150-byte members must produce multiple shards
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".tar")) > 4)
  }

  test("writeTarShards bounds on-disk shard size including tar overhead") {
    val out = java.nio.file.Files.createTempDirectory("wds_sz").toString
    // 1-byte payloads cost 1024 B on disk each (512 header + 512 padding);
    // with the 1 KiB trailer, a 4096-byte budget fits exactly 3 members
    val rows = (1 to 12).map(i => (f"k$i%02d", "bin", Array[Byte](1)))
      .toDF("sample_key", "ext", "data").coalesce(1)
    graft.files.WebDataset.writeTarShards(rows, out, maxShardBytes = 4096)
    val shards = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(shards.length === 4)
    assert(shards.forall(_.length <= 4096),
      shards.map(f => s"${f.getName}=${f.length}").mkString(","))
    // no attempt-scoped tmp litter survives a successful commit
    assert(new java.io.File(out).listFiles().forall(!_.getName.endsWith(".tmp")))
  }

  test("ngramDecontaminate counts exact benchmark n-gram overlap") {
    val corpus = Seq((1L, "a b c d e"), (2L, "x y z w"), (3L, "a b"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "b c d e")).toDF("doc_id", "text")
    val r = graft.ops.Corpus.ngramDecontaminate(corpus, bench,
        "doc_id", "text", n = 3)
      .select("doc_id", "n_grams", "n_contaminated", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    // doc1 grams {abc,bcd,cde}; bench grams {bcd,cde} → 2 of 3 hit
    // doc3 has fewer than 3 tokens → no grams → absent from the report
    assert(r === Set((1L, 3L, 2L, true), (2L, 2L, 0L, false)))
  }

  test("chainops decontaminate and perplexity filters compose on Chain") {
    import graft.ops.chainops._
    val corpus = Chain(docs)
    val bench = Chain(Seq((9L, "jumps over the lazy dog near the river"))
      .toDF("doc_id", "text"))
    val kept = corpus.decontaminate(bench, "text", "doc_id", n = 5)
      .toDF.select("doc_id").as[Long].collect().toSet
    // docs 1-3 share 5-gram windows with the benchmark; 4 and 5 do not
    assert(kept === Set(4L, 5L))
    val filtered = corpus
      .filterByPerplexity(corpus, "text", "doc_id", maxPpl = 1e9)
      .toDF
    assert(filtered.count() === 5)
    assert(filtered.columns.contains("ppl"))
    // rows too short to score (no bigrams) are kept with null ppl, like
    // decontaminate's keep-too-short rule — not silently dropped
    val withShort = Chain(docs.union(Seq((6L, "solo")).toDF("doc_id", "text")))
      .filterByPerplexity(corpus, "text", "doc_id", maxPpl = 1e9).toDF
    assert(withShort.count() === 6)
    assert(withShort.filter(col("doc_id") === 6L && col("ppl").isNull)
      .count() === 1)
    // dup-fraction filter: planted near-copies drop, unique docs and
    // too-short (unscored) rows stay
    val planted = docs.union(
      docs.filter(col("doc_id") === 1)
        .select((col("doc_id") + 100).as("doc_id"), col("text")))
      .union(Seq((6L, "solo")).toDF("doc_id", "text"))
    val deduped = Chain(planted)
      .filterByDupFraction("text", "doc_id", maxFrac = 0.99, n = 3)
      .toDF.select("doc_id").as[Long].collect().toSet
    assert(!deduped.contains(1L) && !deduped.contains(101L))
    assert(deduped.contains(6L))
  }

  test("signSignature packs sign bits into 64-dim limbs") {
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 1.0f)),
      (2L, Array.fill(130)(1.0f))).toDF("id", "v")
    val sig = df.select(col("id"), Similarity.signSignature(col("v")).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) === Seq(5L)) // 101b
    assert(sig(2L) === Seq(-1L, -1L, 3L)) // 64 ones, 64 ones, 2 ones
  }

  test("hammingRerankTopK recalls most brute-force neighbors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.hammingRerankTopK(emb, q, k = 10, prefilter = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(rr.size === exact.size)
    val recall = (rr & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall")
  }

  test("pqTopK: trained codebook recalls euclidean neighbors at 32x compression") {
    import graft.functions.GraftFunctions.decimal_sq_distance
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // exact euclidean reference
    val exact = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("cv"))
      .join(broadcast(q.select(col("query_id"),
        col("embedding").cast("array<double>").as("qv"))))
      .withColumn("d", decimal_sq_distance(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("query_id").orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rn") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val cb = Similarity.pqTrain(emb, m = 8, kc = 16, iterations = 2)
    // codebook is the size it claims: 8 subspaces x 16 centroids x 8 dims
    assert(cb.length === 8 && cb.forall(s => s.length === 16 &&
      s.forall(_.length === 8)))
    // raw ADC trades recall for 32x compression — modest by design
    val pq = Similarity.pqTopK(emb, q, k = 10, cb)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(pq.size === exact.size)
    val adcRecall = (pq & exact).size.toDouble / exact.size
    assert(adcRecall >= 0.3, s"adcRecall=$adcRecall")
    // the production shape: ADC prefilter + exact rerank recovers the
    // neighbors while fetching only prefilter vectors per query. The
    // synthetic near-random corpus is the adversarial case for a coarse
    // quantizer (no cluster structure to exploit), hence the generous
    // 30% prefilter here; clustered real embeddings need far less
    val rr = Similarity.pqRerankTopK(emb, q, k = 10, cb, prefilter = 150)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (rr & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"rerank recall=$recall")
    // codes stay in the codebook range
    val codes = Similarity.pqEncode(emb, cb)
      .select(explode(col("codes"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("ivfPqRerankTopK: composed recipe recalls euclidean neighbors with real pruning") {
    import graft.functions.GraftFunctions.decimal_sq_distance
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val (assigned, centroids) = Similarity.ivfBuild(emb, nlist = 16,
      iterations = 1)
    // the index spreads the corpus across many cells — pruning is real
    // (nprobe=6 of 16 scans well under half the corpus)
    val cells = assigned.groupBy("centroid_id").count().count()
    assert(cells >= 8, s"degenerate clustering: $cells cells")
    val cb = Similarity.pqTrain(emb, m = 8, kc = 16, iterations = 1)
    val res = Similarity.ivfPqRerankTopK(assigned, centroids, q, k = 10,
        cb, nprobe = 6, prefilter = 60)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("cv"))
      .join(broadcast(q.select(col("query_id"),
        col("embedding").cast("array<double>").as("qv"))))
      .withColumn("d", decimal_sq_distance(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("query_id").orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rn") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (res & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // every query still returns a full k (shortlist never starves)
    assert(res.size === exact.size)
  }

  test("sq8TopK: near-exact euclidean ranking at 4x compression; code edges") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // exact euclidean top-10 (squared distance ranks like distance)
    val qq = q.select(col("query_id"),
      col("embedding").cast("array<double>").as("__q"))
    val exact = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("__v"))
      .join(qq)
      .withColumn("__d", graft.functions.GraftFunctions.decimal_sq_distance(
        col("__q"), col("__v")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("__d").asc, col("vec_id").asc)))
      .filter(col("rk") <= 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(emb, q, k = 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(sq.size === exact.size)
    // int8 quantization error is tiny relative to inter-vector distances:
    // the quantized ranking should agree almost everywhere (and each
    // query's own vector must stay its nearest neighbor)
    val recall = (sq & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
    val self = Similarity.sq8TopK(emb, q, k = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    self.foreach { case (qid, vid) => assert(qid === vid) }
    // two-stage: the 4x prefilter + exact rerank recovers every neighbor
    // the raw byte-code ranking flips — full agreement with exact top-10
    val rr = Similarity.sq8RerankTopK(emb, q, k = 10, prefilter = 40)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(rr === exact, s"sq8+rerank diverged: ${(rr diff exact)}")
    // kernel edges: clamping and the degenerate (scale=0) dimension
    val mins = Array(0.0, 5.0)
    val scales = Array(1.0 / 255.0, 0.0)
    val out = Seq((1L, Array(1.5, 7.0)), (2L, Array(-9.0, 5.0)))
      .toDF("id", "v")
      .select(graft.functions.GraftFunctions.sq8_encode(
        col("v"), mins.toSeq, scales.toSeq).as("c"))
      .as[Array[Byte]].collect()
    assert((out(0)(0) & 0xFF) === 255 && out(0)(1) === 0) // clamp hi, degenerate
    assert(out(1)(0) === 0)                               // clamp lo
  }

  test("exactSubstrDedup excises later copies and intra-doc repeats, keeps firsts") {
    import graft.ops.Corpus
    val corpus = Seq(
      (1L, "a b c d e f g h"),          // all windows globally first
      (2L, "a b c d e f g h x y"),      // copy of 1 + unique tail
      (3L, "p q r s p q r s p q r s")   // phrase repeated 3x within one doc
    ).toDF("doc_id", "text")
    val out = Corpus.exactSubstrDedup(corpus, "doc_id", "text", minLen = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_clean")))).toMap
    assert(out(1L) === ((8L, 0L, "a b c d e f g h")))
    // doc 2: marked windows at positions 1..5 merge to span [1,8]
    assert(out(2L) === ((10L, 8L, "x y")))
    // doc 3: second+third occurrences of the phrase merge to span [5,12]
    assert(out(3L) === ((12L, 8L, "p q r s")))
  }

  test("exactSubstrDedup invariant: n_tokens = n_removed + |text_clean| (random corpora)") {
    import graft.ops.Corpus
    // tiny vocabulary + short windows force heavy natural duplication
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val corpus = (1L to 40L).map { i =>
      val n = 5 + rnd.nextInt(30)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val out = Corpus.exactSubstrDedup(corpus, "doc_id", "text", minLen = 5)
    assert(out.count() === 40)
    val bad = out.filter(col("n_tokens") =!= col("n_removed") +
      size(filter(split(col("text_clean"), " "), t => t =!= lit("")))).count()
    assert(bad === 0L)
    // with 5^5 possible windows over ~800 positions, something must dedup
    assert(out.agg(sum("n_removed")).head().getLong(0) > 0L)
  }

  test("subtractSeen equals exact anti-join at any fpp (bloom is only a router)") {
    val history = Seq((1L, "seen doc one"), (2L, "seen doc two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen doc one"),      // dup of history (different id)
      (11L, "seen doc two"),
      (12L, "genuinely new doc"),
      (13L, "another new doc")).toDF("doc_id", "text")
    for (fpp <- Seq(0.5, 0.01)) { // coarse and tight filters, same answer
      val out = Dedup.subtractSeen(batch, history, "text", "doc_id",
        expectedItems = 10L, fpp = fpp)
      assert(out.select("doc_id").as[Long].collect().toSet === Set(12L, 13L), s"fpp=$fpp")
      assert(out.columns.toSeq === Seq("doc_id", "text")) // schema preserved
    }
    // empty history: everything is new
    val none = Dedup.subtractSeen(batch, history.limit(0), "text", "doc_id",
      expectedItems = 10L)
    assert(none.count() === 4)
  }

  test("subtractSeenChunks drops tail-edited re-crawls, keeps fresh and unmeasurable rows") {
    val body = ("rivers braid across the delta carrying silt from the " +
      "high plateau down to the patient sea where terns wheel over the " +
      "shallows and fishermen mend their long nets at first light")
    val history = Seq((1L, body), (2L, "short note about tea rituals"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, body.dropRight(8) + " edited!"), // tail edit → prefix chunks match → dropped
      (11L, "a wholly different report on turbine maintenance schedules " +
        "with no overlapping phrasing at all in any clause"), // fresh → kept
      (12L, "")).toDF("doc_id", "text")      // zero chunks → kept
    val out = Dedup.subtractSeenChunks(batch, history, "text", "doc_id",
      k = 8, divisor = 16, maxSharedFrac = 0.5)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(11L, 12L))
    assert(out.columns.toSeq === Seq("doc_id", "text"))
    // empty history: everything is new
    assert(Dedup.subtractSeenChunks(batch, history.limit(0), "text",
      "doc_id").count() === 3)
    // threshold edge: frac 1.0 only drops FULLY-shared docs — the
    // tail-edited copy carries at least one unshared chunk and survives
    val lax = Dedup.subtractSeenChunks(batch, history, "text", "doc_id",
      k = 8, divisor = 16, maxSharedFrac = 1.0)
    assert(lax.count() === 3)
  }

  test("toParquet sidecar round-trip: readParquetExport restores the recorded schema") {
    import graft.io.Writers
    val tmp = java.nio.file.Files.createTempDirectory("topq_spec")
    // STRING partition values that render numeric ("007") are the trap:
    // inference would read them back as int 7 — the sidecar schema must
    // reach the READER (not a cast-after-infer) to round-trip verbatim
    val d = Seq((1L, "a", "007"), (2L, "b", "1e3"), (3L, "c\"\nqu", "007"))
      .toDF("k", "s", "part")
    Writers.toParquet(d, s"$tmp/out", partitionBy = Seq("part"))
    val back = Writers.readParquetExport(spark, s"$tmp/out")
    // a PLAIN read re-infers the partition col (long→int) and moves it
    // last; the sidecar restores the recorded order and types
    val plain = spark.read.parquet(s"$tmp/out")
    assert(plain.schema.fieldNames.last === "part")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      d.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === d.collect().map(_.toSeq).toSet)
    // foreign parquet (no sidecar): plain read, no throw
    d.write.parquet(s"$tmp/foreign")
    assert(Writers.readParquetExport(spark, s"$tmp/foreign").count() === 3)
  }

  test("subtractSeenNear drops exact and near copies of history, keeps fresh") {
    val body = ("rivers braid across the delta carrying silt from the " +
      "high plateau down to the patient sea where terns wheel over the " +
      "shallows and fishermen mend their long nets at first light while " +
      "the tide writes and rewrites the same sentence in the sand")
    val history = Seq((1L, body), (2L, "short unrelated note about tea"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, body),                              // exact copy → dropped
      (11L, body + " tail marker token"),       // near-dup → dropped
      (12L, "a wholly different report on turbine maintenance schedules " +
        "with no overlapping phrasing at all in any of its clauses"),
      (13L, "short unrelated note about coffee")) // below 0.5 vs "tea" note?
      .toDF("doc_id", "text")
    val out = Dedup.subtractSeenNear(batch, history, "text", "doc_id",
      threshold = 0.5)
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(10L) && !kept.contains(11L))
    assert(kept.contains(12L))
    assert(out.columns.toSeq === Seq("doc_id", "text")) // schema preserved
    // tighter threshold keeps the sibling note; looser drops it iff its
    // true 5-gram Jaccard crosses — just pin the exact-arith behavior of
    // the two fixed rows rather than asserting the borderline one
    val strict = Dedup.subtractSeenNear(batch, history, "text", "doc_id",
      threshold = 0.95)
    val keptStrict = strict.select("doc_id").as[Long].collect().toSet
    assert(!keptStrict.contains(10L)) // exact copy still J=1.0
    assert(keptStrict.contains(11L))  // tail-marked J<0.95 survives
    // empty history: nothing bands, everything survives
    assert(Dedup.subtractSeenNear(batch, history.limit(0), "text", "doc_id")
      .count() === 4)
  }

  test("chainops sugar composes the r5 ops end-to-end") {
    import graft.ops.chainops._
    val base = ("the data to be of use must have come with fifty words " +
      "at least so this sentence keeps adding plain english filler words " +
      "until the counter clears the minimum threshold set by the paper " +
      "which is fifty whitespace separated words in total here now done " +
      "extra pad tokens one two three four five six seven eight nine ten")
    val docs = Chain((1L to 20L).map(i =>
      (i, s"$base doc $i", i * 10L)).toDF("doc_id", "text", "weight"))
    val out = docs
      .gopherFilter("text")
      .blocklist("text", Seq("forbidden phrase"))
      .weightedSample("doc_id", "weight", n = 5, seed = "t")
      .bm25Select("doc_id", "text", Seq("fifty"))
    val rows = out.toDF.collect()
    assert(rows.length === 5)
    assert(out.toDF.columns.contains("score"))
    val hist = Chain(Seq((100L, s"$base doc 3", 1L))
      .toDF("doc_id", "text", "weight"))
    val unseen = docs.subtractSeen(hist, "text", "doc_id")
    assert(unseen.toDF.count() === 19) // doc 3's content is in history
  }

  test("blocklist: Aho-Corasick counts overlapping multi-pattern hits") {
    val rows = Seq(
      (1L, "ababa"),             // "aba" twice (overlapping), "ba" twice
      (2L, "clean text here"),
      (3L, "ABA uppercase hit"), // case-insensitive: one "aba"
      (4L, "suffix overlap abab")).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistSignals(rows, "text", Seq("aba", "ba"))
      .select("doc_id", "n_blocked", "blocklist_pass")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(out(1L) === ((4, false)))
    assert(out(2L) === ((0, true)))
    assert(out(3L) === ((2, false))) // "aba" + its inner "ba"
    assert(out(4L) === ((2, false))) // "aba" and its inner "ba" in "abab"
    val kept = TextAnalysis.blocklistFilter(rows, "text", Seq("aba", "ba"))
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    assert(kept.columns.toSeq === Seq("doc_id", "text"))
  }

  test("bm25 matches an independent replay of the formula") {
    import graft.ops.Corpus
    val rows = Seq(
      (1L, "spark spark table fast"),
      (2L, "table scan only here"),
      (3L, "nothing relevant at all whatsoever")).toDF("doc_id", "text")
    val got = Corpus.bm25(rows, "doc_id", "text", Seq("spark", "table"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent replay: N=3, sdl=13, avgdl=13/3
    def term(tf: Int, df: Int, dl: Int): Double = {
      if (tf == 0) return 0.0 * math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      val idf = math.log(1.0 + (3.0 - df + 0.5) / (df + 0.5))
      idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (13.0 / 3.0)))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet === Set(1L, 2L)) // doc 3 matches nothing
    assert(got(1L) === r6(term(2, 1, 4) + term(1, 2, 4)))
    assert(got(2L) === r6(term(0, 1, 4) + term(1, 2, 4)))
    // doc 1 mentions both terms, one twice: must outrank doc 2
    assert(got(1L) > got(2L))
  }

  test("kmeans separates two obvious blobs and assigns every row once") {
    val blobA = (1L to 10L).map(i => (i, Array(1.0f + i * 0.001f, 1.0f)))
    val blobB = (11L to 20L).map(i => (i, Array(-1.0f, -1.0f - i * 0.001f)))
    val df = (blobA ++ blobB).toDF("vec_id", "embedding")
    val (assign, cents) = Similarity.kmeans(df, k = 2, iterations = 3)
    val byCluster = assign.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byCluster.size === 20)
    val aClusters = (1L to 10L).map(byCluster).toSet
    val bClusters = (11L to 20L).map(byCluster).toSet
    assert(aClusters.size === 1 && bClusters.size === 1 &&
      aClusters != bClusters)
    assert(cents.count() === 2)
    // determinism: a second run yields the identical assignment
    val (again, _) = Similarity.kmeans(df, k = 2, iterations = 3)
    assert(again.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap === byCluster)
  }

  test("c4 rules: line and page verdicts, cleaned text rebuild") {
    val rows = Seq(
      (1L, "this line has five good words.\nanother line with enough words here.\na third qualifying line sits here."),
      (2L, "no terminal punctuation on this line\nshort line.\nthis page keeps too few lines overall."),
      (3L, "this page uses javascript in every line javascript.\nmore javascript mentions on this line javascript.\njavascript rules drop these lines too javascript."),
      (4L, "a fine line with enough words.\nanother fine line with plenty words.\nthird fine line is long enough.\nbut lorem ipsum poisons the page."),
      (5L, "curly brace { kills the whole page.\nsecond line with sufficient word count.\nthird line also has enough words.")
    ).toDF("doc_id", "text")
    val s = TextAnalysis.c4Signals(rows, "doc_id", "text")
      .select("doc_id", "n_kept", "c4_keep").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(s(1L) === ((3, true)))
    assert(s(2L) === ((1, false))) // only the last line qualifies
    assert(s(3L) === ((0, false))) // javascript line rule removes all
    assert(s(4L) === ((4, false))) // lines fine, page rule: lorem ipsum
    assert(s(5L) === ((3, false))) // all lines pass line rules; brace is a page rule
    val cleaned = TextAnalysis.c4Clean(rows, "doc_id", "text")
    assert(cleaned.select("doc_id").as[Long].collect().toSeq === Seq(1L))
    assert(cleaned.select("text").as[String].head().split("\n").length === 3)
  }

  test("weightedSample matches an independent replay of the A-ES formula") {
    // independent implementation: JDK MessageDigest, no Spark expressions
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def key(id: Long, w: Double): Double = {
      val u = java.lang.Long.parseLong(md5hex(s"$id:t").take(13), 16) / 4503599627370496.0
      BigDecimal(math.pow(u, 1.0 / w)).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = (1L to 50L).map(i => (i, (i % 7 + 1).toDouble)) :+ (51L, 0.0)
    val df = rows.toDF("id", "w")
    val got = Split.weightedSample(df, "id", "w", n = 10, seed = "t")
      .select("id").as[Long].collect().toSet
    val want = rows.filter(_._2 > 0)
      .sortBy { case (id, w) => (-key(id, w), id) }.take(10).map(_._1).toSet
    assert(got === want)
    // zero-weight row can never appear, even with n > rows
    val all = Split.weightedSample(df, "id", "w", n = 100, seed = "t")
      .select("id").as[Long].collect().toSet
    assert(!all.contains(51L) && all.size === 50)
  }

  test("gopherSignals: each rule fires on its crafted violator") {
    val base = ("the data to be of use must have come with fifty words " +
      "at least so this sentence keeps adding plain english filler words " +
      "until the counter clears the minimum threshold set by the paper " +
      "which is fifty whitespace separated words in total here now done " +
      "extra pad tokens one two three four five six seven eight nine ten")
    val rows = Seq(
      (1L, base),                                     // passes everything
      (2L, "too few words"),                          // rule 1: word count
      (3L, base + " ####### ## ### #### ## # ## ## ### ## # ## # ## ## #"), // rule 3: symbols
      (4L, (1 to 60).map(i => s"- bullet $i").mkString("\n")), // rule 4: bullets
      (5L, base.split(" ").map(w => w + "...").mkString("\n")), // rule 5: ellipsis lines
      (6L, (1 to 60).map(_.toString).mkString(" ") + " the of"), // rule 6: alpha + rule 1 ok
      (7L, Seq.fill(60)("zz qq xx").mkString(" "))    // rule 7: no stop words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherSignals(rows, "text")
      .select("doc_id", "gopher_pass", "n_words", "stop_hits")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L) === true)
    for (id <- 2L to 7L) assert(out(id) === false, s"doc $id should fail")
  }

  test("pageRank: hand-computed dangling case, mass conservation, edge-multiplicity invariance") {
    import graft.ops.Graph
    // n=2, single edge a→b, one iteration: r0 = 0.5 each; b is dangling so
    // dm = 0.5; a = 0.15/2 + 0.85*(0 + 0.25) = 0.2875, b = 0.075 +
    // 0.85*(0.5 + 0.25) = 0.7125
    val r1 = Graph.pageRank(Seq(("a", "b")).toDF("src", "dst"), "src", "dst",
        iterations = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("a") - 0.2875) < 1e-9)
    assert(math.abs(r1("b") - 0.7125) < 1e-9)
    // cycle with an authority and a feeder: c collects the most rank, and
    // the dangling correction keeps the vector summing to 1
    val e2 = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"))
      .toDF("src", "dst")
    val r2 = Graph.pageRank(e2, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r2.values.sum - 1.0) < 1e-6)
    assert(r2("c") > r2("a") && r2("c") > r2("b") && r2("c") > r2("d"))
    // PageRank is defined on the distinct edge set: duplicated edges must
    // not change the answer
    val dup = Graph.pageRank(e2.unionAll(e2), "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dup === r2)
    // empty edge set (e.g. a filter matched nothing): empty result with
    // the right schema, no NPE / divide-by-zero
    val empty = Graph.pageRank(e2.filter(lit(false)), "src", "dst",
      iterations = 1)
    assert(empty.columns.toSeq === Seq("node", "rank"))
    assert(empty.count() === 0L)
  }

  test("personalizedPageRank: mass conservation, seed locality, absent seeds ignored") {
    import graft.ops.Graph
    // two disconnected 2-cycles: seeding {a} must put ALL mass on the
    // a-b component and none on c-d (teleport AND dangling return to p)
    val e = Seq(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"))
      .toDF("src", "dst")
    val seeds = Seq("a", "zzz-not-in-graph").toDF("node") // absent seed ignored
    // 20 iterations ≈ stationary (a 2-cycle oscillates early):
    // a = 0.15 + 0.85²·a → a ≈ 0.5405, b ≈ 0.4595
    val r = Graph.personalizedPageRank(e, "src", "dst", seeds, "node",
        iterations = 20)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r("c") === 0.0 && r("d") === 0.0)
    assert(r("a") > r("b") && r("b") > 0.0) // a holds the teleport share
    // residual oscillation after k iters decays as 0.85^k ≈ 0.018 at k=20
    assert(math.abs(r("a") - 0.5405) < 0.03, r)
    // hand-check one iteration on a single dangling edge, seed {a}:
    // r0 = (a=1, b=0); c1(b) = 1; dm = 0 (b held no mass)
    // a = 1*0.15 + 0.85*0 = 0.15; b = 0 + 0.85*1 = 0.85
    val one = Graph.personalizedPageRank(Seq(("a", "b")).toDF("src", "dst"),
        "src", "dst", Seq("a").toDF("node"), "node", iterations = 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(one("a") - 0.15) < 1e-9, one)
    assert(math.abs(one("b") - 0.85) < 1e-9, one)
    // all-absent seed set fails fast rather than dividing by zero
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(e, "src", "dst",
        Seq("nope").toDF("node"), "node", iterations = 1)
    }
  }

  test("triangleCount: hand graph, K4, dirty edges, brute-force cross-check") {
    import graft.ops.Graph
    // two triangles joined by a bridge: 1-2-3 and 4-5-6, bridge 3-4.
    // Dirty input: duplicates, reversed duplicates, a self-loop.
    val e = Seq(("1", "2"), ("2", "3"), ("1", "3"), ("3", "4"),
        ("4", "5"), ("5", "6"), ("4", "6"), ("2", "1"), ("1", "3"),
        ("5", "5"))
      .toDF("src", "dst")
    val r = Graph.triangleCount(e, "src", "dst").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r.keySet === Set("1", "2", "3", "4", "5", "6"))
    assert(r("1") === ((2L, 1L, 1.0)) && r("2") === ((2L, 1L, 1.0)))
    assert(r("3") === ((3L, 1L, 0.333333333333)))
    assert(r("4") === ((3L, 1L, 0.333333333333)))
    assert(r("5") === ((2L, 1L, 1.0)) && r("6") === ((2L, 1L, 1.0)))
    // K4: every node sits in C(3,2)=3 triangles, lcc 1.0
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b }
      yield (a.toString, b.toString)).toDF("src", "dst")
    Graph.triangleCount(k4, "src", "dst").collect().foreach { x =>
      assert(x.getLong(1) === 3L && x.getLong(2) === 3L &&
        x.getDouble(3) === 1.0)
    }
    // deterministic pseudo-random graph vs a brute-force count
    val n = 24
    val rnd = for { a <- 0 until n; b <- 0 until n
      if a < b && (a * 31 + b * 17) % 5 == 0 } yield (a, b)
    val adj = rnd.toSet
    def linked(x: Int, y: Int) = adj.contains((math.min(x, y), math.max(x, y)))
    val brute = (for { a <- 0 until n; b <- 0 until n; c <- 0 until n
      if a < b && b < c && linked(a, b) && linked(b, c) && linked(a, c) }
      yield Seq(a, b, c)).flatten.groupBy(identity).map { case (k, v) =>
        k.toString -> v.size.toLong }
    val got = Graph.triangleCount(
        rnd.map(p => (p._1.toString, p._2.toString)).toDF("src", "dst"),
        "src", "dst")
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    brute.foreach { case (k, v) => assert(got(k) === v) }
    assert(got.filter(_._2 > 0).keySet === brute.filter(_._2 > 0).keySet)
  }

  test("labelPropagation: two cliques with a bridge stay separate; CC merges them") {
    import graft.ops.Graph
    // K4 on {a1..a4}, K4 on {b1..b4}, one bridge a4-b1. Deterministic
    // min-tie-break LPA: within each clique every node sees the clique's
    // labels, so after one sweep the whole clique converges to its
    // minimum id; the bridge is one weak edge and cannot flip either side
    val cliqueA = for { x <- Seq("a1", "a2", "a3", "a4")
      y <- Seq("a1", "a2", "a3", "a4") if x < y } yield (x, y)
    val cliqueB = for { x <- Seq("b1", "b2", "b3", "b4")
      y <- Seq("b1", "b2", "b3", "b4") if x < y } yield (x, y)
    val e = (cliqueA ++ cliqueB :+ ("a4", "b1")).toDF("src", "dst")
    val lab = Graph.labelPropagation(e, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("a1", "a2", "a3", "a4").map(lab).toSet === Set("a1"))
    assert(Seq("b1", "b2", "b3", "b4").map(lab).toSet === Set("b1"))
    // duplicate/reversed edges must not change the result (distinct set)
    val dup = Graph.labelPropagation(
        e.unionAll(e.select(col("dst"), col("src"))), "src", "dst", 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dup === lab)
  }

  test("dsirWeights ranks target-like docs above off-domain docs") {
    import graft.ops.Corpus
    val target = Seq(
      (100L, "alpha beta gamma alpha beta gamma alpha beta"),
      (101L, "alpha beta gamma delta alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma alpha beta"), // looks like the target domain
      (2L, "zulu yankee xray whiskey victor uniform"), // off-domain
      (3L, "")).toDF("doc_id", "text") // no tokens -> no grams -> drops out
    val w = Corpus.dsirWeights(target, raw, "doc_id", "text", buckets = 64)
    val m = w.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("dsir_logratio")).toMap
    assert(m.keySet === Set(1L, 2L))
    assert(m(1L) > m(2L), m.toString)
  }

  test("temperatureMix: t=1 keeps all; lower t nests and flattens domains") {
    import graft.ops.Corpus
    val df = (1 to 300).map(i =>
      (i.toLong, if (i <= 200) "big" else "small")).toDF("id", "dom")
    assert(Corpus.temperatureMix(df, "id", "dom", 1.0, "s").count() === 300)
    val half = Corpus.temperatureMix(df, "id", "dom", 0.5, "s")
      .select("id").as[Long].collect().toSet
    val flat = Corpus.temperatureMix(df, "id", "dom", 0.0, "s")
      .select("id").as[Long].collect().toSet
    // lower temperature -> lower per-domain rate -> same coin, lower
    // threshold -> strictly nested surviving sets
    assert(flat.subsetOf(half))
    // the smallest domain's rate is exactly 1 at every temperature
    assert(half.count(_ > 200) === 100)
    assert(flat.count(_ > 200) === 100)
    // big domain: rate sqrt(100/200)=0.707 at t=0.5, 0.5 at t=0
    val big5 = half.count(_ <= 200)
    val big0 = flat.count(_ <= 200)
    assert(big5 > 200 * 0.55 && big5 < 200 * 0.85, s"big5=$big5")
    assert(big0 > 200 * 0.35 && big0 < 200 * 0.65, s"big0=$big0")
  }

  test("temperatureMix keeps NULL-domain rows as their own group; dsirWeights fails loudly on an empty target") {
    import graft.ops.Corpus
    // NULL domain is a group like any other: at t=1 nothing is dropped
    // (the old equi-join silently deleted every null-domain row)
    val df = ((1 to 40).map(i => (i.toLong, "web")) ++
      (41 to 50).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("id", "dom")
    val all = Corpus.temperatureMix(df, "id", "dom", 1.0, "s")
    assert(all.count() === 50)
    assert(all.filter(col("dom").isNull).count() === 10)
    // and it participates in n_min like any group (t=0 flattens web
    // toward the 10-row null group in expectation, not toward 40)
    val flat = Corpus.temperatureMix(df, "id", "dom", 0.0, "s")
    assert(flat.filter(col("dom").isNull).count() === 10)
    assert(flat.filter(col("dom") === "web").count() < 30)
    // empty target corpus: every score would silently be NULL — raise
    val target0 = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val e = intercept[Exception](
      Corpus.dsirWeights(target0, raw, "doc_id", "text", buckets = 64)
        .collect())
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("target corpus has no tokens")),
      msgs(e).mkString(" | "))
  }

  test("mixByTokenBudget matches the naive running-sum rule at any bucketing") {
    import graft.ops.Corpus
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 400).map { i =>
      (i.toLong, if (i <= 250) "web" else if (i <= 350) "code" else "books",
        (i % 17 + 1).toLong)
    }.toDF("id", "dom", "toks")
    val budgets = Map("web" -> 400L, "code" -> 100000L, "books" -> 37L)
    // ground truth: the documented contract, computed the naive way
    val h = md5(concat(col("id").cast("string"), lit(":s")))
    val w = Window.partitionBy("dom").orderBy(col("__h"), col("id"))
    val naive = df.withColumn("__h", h)
      .join(budgets.toSeq.toDF("dom", "__bud"), Seq("dom"))
      .withColumn("__before", coalesce(sum(col("toks")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__before") < col("__bud"))
      .select("id").as[Long].collect().toSet
    // tiny bucket counts force multi-doc buckets and real boundary scans;
    // 65536 makes ~every bucket single-doc — same answer either way
    for (buckets <- Seq(1, 4, 64, 1 << 16)) {
      val got = Corpus.mixByTokenBudget(df, "id", "dom", "toks", budgets,
        seed = "s", buckets = buckets).select("id").as[Long].collect()
      assert(got.length === got.toSet.size, s"buckets=$buckets dup rows")
      assert(got.toSet === naive, s"buckets=$buckets mismatch")
    }
    val sel = Corpus.mixByTokenBudget(df, "id", "dom", "toks", budgets,
      seed = "s", buckets = 64)
    val byDom = sel.groupBy("dom").agg(sum("toks").as("m"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // whole-domain keep when mass < budget
    assert(byDom("code")._2 === 100)
    // budgets are met, never undershot (boundary doc included), and not
    // overshot by more than one doc's mass
    assert(byDom("web")._1 >= 400L && byDom("web")._1 < 400L + 18L)
    assert(byDom("books")._1 >= 37L && byDom("books")._1 < 37L + 18L)
    // recipe-absent domains are dropped
    assert(Corpus.mixByTokenBudget(df, "id", "dom", "toks",
      Map("web" -> 10L), seed = "s").select("dom").distinct()
      .as[String].collect().toSeq === Seq("web"))
    // zero budget selects nothing from the domain
    assert(Corpus.mixByTokenBudget(df, "id", "dom", "toks",
      Map("web" -> 0L), seed = "s").count() === 0L)
    intercept[IllegalArgumentException](
      Corpus.mixByTokenBudget(df, "id", "dom", "toks", budgets, buckets = 48))
    intercept[IllegalArgumentException](
      Corpus.mixByTokenBudget(df, "id", "dom", "toks", Map.empty))
  }

  test("mixByTokenBudgetEpochs upsamples whole epochs + remainder selection") {
    import graft.ops.Corpus
    val df = (1 to 100).map { i =>
      (i.toLong, if (i <= 60) "wiki" else if (i <= 90) "web" else "zero",
        if (i > 90) 0L else (i % 7 + 1).toLong)
    }.toDF("id", "dom", "toks")
    val wikiMass = (1 to 60).map(i => (i % 7 + 1).toLong).sum
    // wiki budget = 2 full epochs + a bit; web stays sub-mass
    val budgets = Map("wiki" -> (2 * wikiMass + 10), "web" -> 20L,
      "zero" -> 50L)
    val out = Corpus.mixByTokenBudgetEpochs(df, "id", "dom", "toks", budgets,
      seed = "e", buckets = 64).cache()
    // (row, epoch) pairs are distinct
    assert(out.count() === out.select("id", "epoch").distinct().count())
    val wiki = out.filter(col("dom") === "wiki")
    // two full epochs of every wiki doc...
    assert(wiki.filter(col("epoch") < 2).count() === 120L)
    // ...plus a remainder pass at epoch 2 that meets the leftover budget
    val rem = wiki.filter(col("epoch") === 2)
    val remMass = rem.agg(sum("toks")).head().getLong(0)
    assert(rem.count() > 0 && remMass >= 10L && remMass < 10L + 8L)
    // wiki total token mass meets the budget, within one doc's overshoot
    assert(wiki.agg(sum("toks")).head().getLong(0) >= budgets("wiki"))
    // sub-mass domain: pure epoch-0 selection, budget met
    val web = out.filter(col("dom") === "web")
    assert(web.select("epoch").distinct().as[Long].collect().toSeq === Seq(0L))
    assert(web.agg(sum("toks")).head().getLong(0) >= 20L)
    // zero-mass domain: one epoch-0 pass of every doc (all before-mass 0)
    assert(out.filter(col("dom") === "zero").count() === 10L)
    // the remainder pass agrees with mixByTokenBudget under the same seed
    val naiveRem = Corpus.mixByTokenBudget(df.filter(col("dom") === "wiki"),
      "id", "dom", "toks", Map("wiki" -> 10L), seed = "e", buckets = 64)
      .select("id").as[Long].collect().toSet
    assert(rem.select("id").as[Long].collect().toSet === naiveRem)
    out.unpersist()
  }

  test("semanticDedup drops the later copy inside a cluster, keeps the rest") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)),
      (10L, Array(0.8f, 0.6f, 0f)), // cluster 0 (cos .8 vs anchor0, .6 vs 1)
      (11L, Array(0.6f, 0.8f, 0f)), // cluster 1
      (110L, Array(0.8f, 0.6f, 0f)) // exact copy of 10 -> dropped
    ).toDF("id", "vec")
    val out = Dedup.semanticDedup(vecs, "id", "vec",
        vecs.filter(col("id") < 3), "id", "vec", threshold = 0.98,
        cache = false)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Boolean]("kept")))).toMap
    assert(out(10L) === ((0L, true)))
    assert(out(110L) === ((0L, false))) // same cluster, later id, cos 1.0
    assert(out(11L) === ((1L, true)))
    assert(out.values.count(!_._2) === 1) // nothing else dropped
  }

  test("semanticDedup min_by assignment matches driver-side brute-force argmax") {
    // 60 deterministic pseudo-random vectors, 5 anchors: the map-side
    // min_by arg-max (highest cosine, ties to lowest anchor id) must
    // reproduce an independent exhaustive assignment exactly
    def vec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(4) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40).toFloat / (1 << 24).toFloat) + 0.01f
      }
    }
    val vs = (0L until 60L).map(i => (i, vec(i)))
    val as = (0L until 5L).map(i => (i, vec(i + 1000)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val expected = vs.map { case (id, v) =>
      id -> as.minBy { case (aid, av) => (-cos(v, av), aid) }._1
    }.toMap
    val out = Dedup.semanticDedup(vs.toDF("id", "vec"), "id", "vec",
        as.toDF("id", "vec"), "id", "vec", threshold = 1.1, cache = false)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(out === expected)
  }

  test("semanticDedup never assigns documents to a null-vector anchor") {
    // a null similarity would sort FIRST in the ascending min_by struct
    // and claim every document — the coalesce-to-+∞ guard must make such
    // anchors lose to any real score
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f))).toDF("id", "vec")
    val anchors = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (99L, null.asInstanceOf[Array[Float]])).toDF("id", "vec")
    val out = Dedup.semanticDedup(vecs, "id", "vec", anchors, "id", "vec",
        threshold = 0.98, cache = false)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster"))
      .toMap
    assert(out === Map(0L -> 0L, 1L -> 1L), out.toString)
  }

  test("semanticDedup clusterCap guards a degenerate one-anchor clustering") {
    // One anchor absorbs all 12 vectors (the collapsed-k-means case): the
    // intra-cluster pair join would be all-pairs over the whole corpus.
    val vecs = (0L until 12L).map(i => (i, Array(1f, i.toFloat * 1e-4f, 0f)))
      .toDF("id", "vec")
    val anchors = Seq((0L, Array(1f, 0f, 0f))).toDF("id", "vec")
    // Cap below the cluster size: pair join must be skipped for the
    // over-cap cluster — every row comes back, all kept, none dropped.
    val capped = Dedup.semanticDedup(vecs, "id", "vec", anchors, "id", "vec",
        threshold = 0.9, clusterCap = 5, cache = false).collect()
    assert(capped.length === 12)
    assert(capped.forall(_.getAs[Boolean]("kept")), "over-cap cluster must be left un-deduped")
    // Same input with the cap off: the near-identical vectors dedup down to
    // the earliest id — proves the cap (not the data) produced the all-kept
    // result above.
    val uncapped = Dedup.semanticDedup(vecs, "id", "vec", anchors, "id", "vec",
        threshold = 0.9, clusterCap = 0, cache = false).collect()
    assert(uncapped.count(_.getAs[Boolean]("kept")) === 1)
    assert(uncapped.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("id")).toSeq === Seq(0L))
  }

  test("qualityLogistic: bounded scores, prose above punctuation noise") {
    val df = Seq(
      (1L, "the quick brown fox is glad that it runs for the hills today"),
      (2L, "!!! ??? ;;; *** ((( ))) @@@ ###")).toDF("doc_id", "text")
    val s = df.select(col("doc_id"),
        TextAnalysis.qualityLogistic(col("text")).as("p"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("p")).toMap
    assert(s.values.forall(p => p > 0.0 && p < 1.0), s.toString)
    assert(s(1L) > 0.5 && s(2L) < 0.5, s.toString)
  }

  test("hammingTopK ranks by sign-bit hamming with id tie-break") {
    val corpus = Seq(
      (1L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, -1.0f)),
      (3L, Array(-1.0f, -1.0f, 1.0f, 1.0f)),
      (4L, Array(-1.0f, -1.0f, -1.0f, -1.0f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 1.0f, 1.0f, 1.0f))).toDF("query_id", "embedding")
    val r = Similarity.hammingTopK(corpus, q, k = 4)
      .select("vec_id", "hamming", "rank").as[(Long, Long, Int)]
      .collect().sortBy(_._3)
    assert(r.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(r.map(_._2).toSeq === Seq(0L, 1L, 2L, 4L))
  }

  test("cdc: partition property, divisor rule, clamps, edit alignment") {
    import graft.ops.Cdc
    val t = "the quick brown fox jumps over the lazy dog again and again ok"
    // chunks partition the text exactly, starts are consistent
    val spans = Cdc.chunkSpans(t, 8, 4, 1, Int.MaxValue)
    assert(spans.map(_._2).mkString === t)
    assert(spans.map(_._1) ===
      spans.map(_._2.length).scanLeft(0)(_ + _).dropRight(1))
    // every non-final cut satisfies the ORACLE's direct window
    // polynomial (pins rolling == direct; 31^7 < 2^53, pow is exact)
    def direct(i: Int): Long =
      (0 until 8).map(j => t.charAt(i - j).toLong *
        math.pow(31.0, j.toDouble).toLong).sum
    spans.dropRight(1).foreach { case (st, ch) =>
      assert(direct(st + ch.length - 1) % 4 === 0, s"cut at $st+${ch.length}") }
    // maxLen forces cuts, minLen suppresses them — both still partition
    val mx = Cdc.chunkSpans(t, 8, 4, 1, 10)
    assert(mx.map(_._2).mkString === t && mx.forall(_._2.length <= 10))
    val mn = Cdc.chunkSpans(t, 8, 2, 12, Int.MaxValue)
    assert(mn.map(_._2).mkString === t &&
      mn.dropRight(1).forall(_._2.length >= 12))
    // the CDC property: a front insertion leaves the suffix chunks
    // byte-identical (fixed-size blocks would shift every boundary)
    val edited = "XYZW " + t
    val ca = Cdc.chunkSpans(t, 8, 4, 1, Int.MaxValue).map(_._2)
    val cb = Cdc.chunkSpans(edited, 8, 4, 1, Int.MaxValue).map(_._2)
    val shared = ca.toSet.intersect(cb.toSet)
    assert(shared.size >= ca.size - 2, s"suffix chunks must survive: $shared")
    // degenerate shapes
    assert(Cdc.chunkSpans("", 8, 4, 1, Int.MaxValue).isEmpty)
    assert(Cdc.chunkSpans("short", 8, 4, 1, Int.MaxValue) ===
      Seq((0, "short")))
    // codepoint domain (SQL substr/ord/length parity): an astral char
    // is ONE window element, never a surrogate pair split across
    // chunks; starts are codepoint offsets
    val emoji = ("abc😀def " * 6) + "x tail here ok"
    val ce = Cdc.chunkSpans(emoji, 8, 4, 1, Int.MaxValue)
    assert(ce.map(_._2).mkString === emoji)
    assert(ce.forall(c => !Character.isLowSurrogate(c._2.head) &&
      !Character.isHighSurrogate(c._2.last)), ce.toString)
    assert(ce.map(_._1) === ce.map(c =>
      c._2.codePointCount(0, c._2.length)).scanLeft(0)(_ + _).dropRight(1))
  }

  test("winnow: selection rule, guarantees, DataFrame ops, near-dup") {
    import graft.ops.Winnow
    // hand-checkable selection: grams of "abab..." alternate two hash
    // values; every window's min is the 'a...'-rooted gram, rightmost
    // occurrence — positions step by 2 (the tie/dedup rule visible)
    val ab = "ababababab" // 10 cps, k=2 -> 9 grams
    val hs = Winnow.gramHashes(ab, 2)
    assert(hs.length === 9)
    assert(hs.distinct.length === 2)
    val fps3 = Winnow.fingerprintSpans(ab, 2, 3)
    // h("ab") = 97*31+98 < h("ba"); rightmost 'ab' gram per window
    assert(fps3.forall(_._2 === hs(0)), fps3.toString)
    assert(fps3.map(_._1) === Seq(3, 5, 7, 9), fps3.toString)
    // degenerate shapes: sub-k text -> none; exactly k -> the one gram;
    // fewer grams than w -> single window over all
    assert(Winnow.fingerprintSpans("x", 2, 4).isEmpty)
    assert(Winnow.fingerprintSpans("xy", 2, 4) ===
      Seq((1, 120L * 31 + 121)))
    assert(Winnow.fingerprintSpans("abcd", 2, 99).size === 1)
    // fp value == gram hash at pos (1-based), astral-safe
    val emoji = "no😀de😀up winnow text 😀 here we go"
    val he = Winnow.gramHashes(emoji, 3)
    Winnow.fingerprintSpans(emoji, 3, 4).foreach { case (p, f) =>
      assert(he(p - 1) === f) }

    // DataFrame explode matches the kernel row-for-row
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog ok then"),
      (2L, "the quick brown fox jumps over the lazy dog ok soon"),
      (3L, "entirely different content with no overlap whatsoever"),
      (4L, "xy")).toDF("doc_id", "text")
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .as[(Long, Int, Long)].collect().toSet
    val want = docs.as[(Long, String)].collect().flatMap { case (id, t) =>
      Winnow.fingerprintSpans(t, 5, 4).map { case (p, f) => (id, p, f) }
    }.toSet
    assert(got === want && got.nonEmpty)

    // near-dup: the tail-edited pair is found with exact set algebra;
    // the unrelated doc pairs with nobody at the threshold
    val pairs = Winnow.nearDup(docs, "doc_id", "text",
        k = 5, w = 4, minJaccard = 0.5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val setOf = (t: String) =>
      Winnow.fingerprintSpans(t, 5, 4).map(_._2).toSet
    val s1 = setOf("the quick brown fox jumps over the lazy dog ok then")
    val s2 = setOf("the quick brown fox jumps over the lazy dog ok soon")
    val sh = s1.intersect(s2).size.toLong
    val un = s1.union(s2).size.toLong
    assert(sh.toDouble / un >= 0.5, s"fixture must be a near-dup: $sh/$un")
    assert(pairs === Set((1L, 2L, sh, un)), pairs.toString)
    // maxDocsPerFp drops corpus-wide grams before pairing: with every
    // fp capped away, no pairs survive
    assert(Winnow.nearDup(docs, "doc_id", "text", k = 5, w = 4,
      minJaccard = 0.01, maxDocsPerFp = 1).count() === 0)

    // composed single-pass variant == nearDup + sharedSpans, row for row
    val (cp, cs) = Winnow.nearDupWithSpans(docs, "doc_id", "text",
      k = 5, w = 4, minJaccard = 0.5)
    assert(cp.as[(Long, Long, Long, Long)].collect().toSet === pairs)
    val spans = Winnow.sharedSpans(docs, "doc_id", "text",
      Winnow.nearDup(docs, "doc_id", "text", k = 5, w = 4,
        minJaccard = 0.5), k = 5, w = 4)
      .as[(Long, Long, Int, Int, Long)].collect().toSet
    assert(cs.as[(Long, Long, Int, Int, Long)].collect().toSet === spans
      && spans.nonEmpty)
  }

  test("winnow coalesceRuns: lockstep spans chain, gaps and misalignments split") {
    import graft.ops.Winnow
    import spark.implicits._
    // k=5, w=4 -> gap bound w+k-1 = 8. One pair, three regimes:
    //  - delta 10, positions 1,4,9 (steps <= 8): ONE run, len 9+5-1=13
    //  - delta 10, position 40 (gap 31 > 8): its own run, len 5
    //  - delta 20, position 6: different alignment, its own run
    val spans = Seq(
      (1L, 2L, 1, 11, 100L), (1L, 2L, 4, 14, 101L), (1L, 2L, 9, 19, 102L),
      (1L, 2L, 40, 50, 103L),
      (1L, 2L, 6, 26, 104L)
    ).toDF("id_a", "id_b", "pos_a", "pos_b", "fp")
    val runs = Winnow.coalesceRuns(spans, k = 5, w = 4)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(runs === Set(
      (1L, 2L, 1, 11, 13),
      (1L, 2L, 40, 50, 5),
      (1L, 2L, 6, 26, 5)), runs.toString)
    // end-to-end: the planted shared prefix coalesces into one long run
    // per near-dup pair whose length covers most of the prefix
    val docs2 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog ok then"),
      (2L, "the quick brown fox jumps over the lazy dog ok soon"))
      .toDF("doc_id", "text")
    val (_, cs2) = Winnow.nearDupWithSpans(docs2, "doc_id", "text",
      k = 5, w = 4, minJaccard = 0.5)
    val rr = Winnow.coalesceRuns(cs2, k = 5, w = 4)
      .as[(Long, Long, Int, Int, Int)].collect()
    assert(rr.exists(r => r._3 == r._4 && r._5 > 30),
      s"shared prefix must coalesce into one long aligned run: " +
        rr.mkString(","))
  }

  test("packSequences: fragments tile windows, docs reassemble, zero-docs drop") {
    import graft.ops.Corpus
    import spark.implicits._
    val L = 8L
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 17L), (5L, 1L),
      (6L, 0L)).toDF("doc_id", "tokens")
    val out = Corpus.packSequences(df, "doc_id", "tokens", seqLen = L)
      .as[(Long, Long, Long, Long, Long)].collect()
    // zero-token doc contributes nothing
    assert(!out.exists(_._1 == 6L))
    // per doc: fragments chain 1..tokens contiguously
    val toks = Map(1L -> 5L, 2L -> 3L, 3L -> 9L, 4L -> 17L, 5L -> 1L)
    toks.foreach { case (id, n) =>
      val fr = out.filter(_._1 == id).sortBy(_._4)
      assert(fr.head._4 === 1L && fr.last._5 === n, fr.mkString(","))
      fr.sliding(2).filter(_.size == 2).foreach(p =>
        assert(p(1)._4 === p(0)._5 + 1, fr.mkString(",")))
    }
    // per window: fragments tile [0, L) contiguously; every window but
    // the last is exactly full (total mass 35 -> windows 0..4, last 3)
    val bySeq = out.groupBy(_._2)
    assert(bySeq.keySet === Set(0L, 1L, 2L, 3L, 4L))
    bySeq.foreach { case (sid, fr0) =>
      val fr = fr0.sortBy(_._3)
      assert(fr.head._3 === 0L)
      fr.sliding(2).filter(_.size == 2).foreach(p =>
        assert(p(1)._3 === p(0)._3 + (p(0)._5 - p(0)._4 + 1)))
      val mass = fr.map(f => f._5 - f._4 + 1).sum
      assert(if (sid == 4L) mass === 3L else mass === L)
    }
    // deterministic: same seed same layout, different seed permutes the
    // doc order (with overwhelming probability on 5 docs)
    val again = Corpus.packSequences(df, "doc_id", "tokens", seqLen = L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq ===
      again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("bpe byte-level: GPT-2 byte map, pre-tokenizer, token ids") {
    import graft.ops.Bpe
    // bytes_to_unicode spot pins: printables keep their codepoint,
    // space (byte 32, the 33rd non-printable is NOT it — bytes 0-32
    // are the first 33) maps to 256+32 = U+0120 'Ġ', newline to 'Ċ'
    assert(Bpe.toByteChars("ab") === "ab")
    assert(Bpe.toByteChars("a b") === "aĠb")
    assert(Bpe.toByteChars("a\nb") === "aĊb")
    // multi-byte expansion: one mapped char per UTF-8 byte
    assert(Bpe.toByteChars("é").length === 2)
    assert(Bpe.toByteChars("中").length === 3)
    assert(Bpe.toByteChars("𝄞").length === 4)
    // pre-tokenizer: contractions split, spaces prefix words, digit
    // and punctuation runs separate
    assert(Bpe.preTokenize("it's a test, no.42").toSeq ===
      Seq("it", "'s", " a", " test", ",", " no", ".", "42"))
    // token ids: alphabet by byte, merges by rank, specials after
    val m = Bpe.Model(Vector(("a", "b"), ("ab", "c")), byteLevel = true,
      preTok = true)
    val ids = Bpe.tokenIds(m, specials = Seq("<|eot|>"))
    // ids are BYTE VALUES for the alphabet (the char is the byte's
    // mapped codepoint: Ġ = U+0120 = 256+32, its id = the byte, 32)
    assert(ids("a") === 97 && ids("Ġ") === 32)
    assert(ids("ab") === 256 && ids("abc") === 257)
    assert(ids("<|eot|>") === 258)
    // a learned merge fusing the LITERAL special string must not steal
    // the special's reserved id (specials win the collision)
    val mc = Bpe.Model(Vector(("a", "b")), byteLevel = true)
    assert(Bpe.tokenIds(mc, specials = Seq("ab"))("ab") === 257)
    // byte-level encode replays merges over the mapped word
    assert(m.encode("abc") === Vector("abc"))
    assert(m.encode(" ab") === Vector("Ġ", "ab"))
  }

  test("bpe specials: tokenize splits ON reserved markers (GPT-2 semantics)") {
    import graft.ops.Bpe
    // splitOnSpecials: literal occurrences surface as their own
    // segments, longest special wins a shared prefix, reassembly is
    // lossless
    assert(Bpe.splitOnSpecials("a<|eot|>b", Seq("<|eot|>")) ===
      Vector(("a", false), ("<|eot|>", true), ("b", false)))
    assert(Bpe.splitOnSpecials("<|eot|><|eot|>", Seq("<|eot|>")) ===
      Vector(("<|eot|>", true), ("<|eot|>", true)))
    assert(Bpe.splitOnSpecials("x<|e|>y", Seq("<|e|>", "<|e")) ===
      Vector(("x", false), ("<|e|>", true), ("y", false)),
      "longest special wins at a shared prefix")
    assert(Bpe.splitOnSpecials("plain", Seq("<|eot|>")) ===
      Vector(("plain", false)))
    // a blank config entry must not crash the executor-side tokenizer
    assert(Bpe.splitOnSpecials("plain", Seq("", "<|eot|>")) ===
      Vector(("plain", false)))
    // a model CARRYING specials encodes the marker as ONE token that
    // takes its reserved id — never as ordinary bytes; word positions
    // stay global across the split
    val m = Bpe.Model(Vector(("a", "b")), byteLevel = true, preTok = true,
      specials = Vector("<|eot|>"))
    import spark.implicits._
    val docs = Seq((1L, "ab<|eot|> ab")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, "doc_id", "text", m)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got === Set((1L, 1, 1, "ab"), (1L, 2, 1, "<|eot|>"),
      (1L, 3, 1, "Ġ"), (1L, 3, 2, "ab")), got.toString)
    val ids = Bpe.tokenIds(m) // model-carried specials, no repetition
    assert(ids("<|eot|>") === 257)
    // an EMPTY specials model keeps the documented non-splitting
    // behavior: the marker encodes as ordinary bytes
    val m0 = m.copy(specials = Vector.empty)
    val raw = Bpe.tokenize(docs, "doc_id", "text", m0)
      .as[(Long, Int, Int, String)].collect()
    assert(!raw.exists(_._4 == "<|eot|>"),
      "without specials the marker must byte-encode")
  }

  test("bpe save/load: the persisted tokenizer round-trips bit-for-bit") {
    import graft.ops.Bpe
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("bpe_persist")
      .toString
    val cat = new graft.catalog.Catalog(root, spark)
    val corpus = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), col("text"))
    val trained = Bpe.trainBytesOn(corpus, "text", numMerges = 12)
      .copy(specials = Vector("<|endoftext|>", "<|pad|>"))
    val v = Bpe.save(cat, "tok", trained)
    // a FRESH catalog instance (cold caches — the cross-session shape)
    val loaded = Bpe.load(new graft.catalog.Catalog(root, spark), "tok")
    assert(loaded === trained, "merges, mode flags, specials — all exact")
    assert(Bpe.tokenIds(loaded) === Bpe.tokenIds(trained))
    // versioned like any dataset: retrain → v2, the old pin still loads
    val retrained = Bpe.trainBytesOn(corpus, "text", numMerges = 4)
    Bpe.save(cat, "tok", retrained)
    assert(Bpe.load(cat, "tok").merges.size === retrained.merges.size)
    assert(Bpe.load(cat, "tok", Some(v)) === trained,
      "the pinned version keeps the original model")
    // an EXTENDED model pins specialBase (old special ids stay valid)
    // and the pin survives persistence
    val ext = Bpe.extendBytesOn(corpus, "text", trained, extraMerges = 3)
    assert(ext.specialBase === 256 + trained.merges.size)
    assert(Bpe.tokenIds(ext)("<|endoftext|>") ===
      Bpe.tokenIds(trained)("<|endoftext|>"),
      "extension must not move a reserved special id")
    Bpe.save(cat, "tok_ext", ext)
    val loadedExt = Bpe.load(cat, "tok_ext")
    assert(loadedExt === ext)
    assert(Bpe.tokenIds(loadedExt) === Bpe.tokenIds(ext))
    // a non-model dataset refuses to load as one
    cat.save(graft.core.Chain(corpus), "notatok")
    intercept[IllegalArgumentException](Bpe.load(cat, "notatok"))
  }

  test("bpe: paper example, encode replay, expression parity, edge shapes") {
    import graft.ops.Bpe
    // the ACL'16 example vocabulary (no end-of-word marker — documented
    // choice): first four merges are the classic es, est, lo, low
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(wc, 4)
    assert(merges === Vector(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      merges.toString)
    val model = Bpe.Model(merges)
    assert(model.encode("lowest") === Vector("low", "est"))
    assert(model.encode("newest") === Vector("n", "e", "w", "est"))
    assert(model.encode("zzz") === Vector("z", "z", "z"))
    // ties break by UTF-8 byte order; early stop when nothing pairs
    assert(Bpe.train(Seq(("ab", 1L), ("cd", 1L)), 5) ===
      Vector(("a", "b"), ("c", "d")))
    // mergeLtr is greedy left-to-right non-overlapping
    assert(Bpe.mergeLtr(Vector("a", "a", "a"), "a", "a") ===
      Vector("aa", "a"))

    // DataFrame tokenize matches the model word-for-word, 1-based
    // positions, empties dropped, astral chars survive
    import spark.implicits._
    val docs = Seq((1L, "low lower  newest"), (2L, "  "), (3L, ""),
      (4L, "wid\u00e9st low\ud83d\ude00")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, "doc_id", "text", model)
      .as[(Long, Int, Int, String)].collect().toSet
    val want = Seq((1L, "low lower  newest"),
        (4L, "wid\u00e9st low\ud83d\ude00")).flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).zipWithIndex.flatMap { case (w, wi) =>
        model.encode(w).zipWithIndex.map { case (tk, ti) =>
          (id, wi + 1, ti + 1, tk) } }
    }.toSet
    assert(got === want && got.nonEmpty)
    // every word reassembles from its tokens in order (lossless)
    val joined = Bpe.tokenize(docs, "doc_id", "text", model)
      .groupBy($"doc_id", $"widx")
      .agg(concat_ws("", sort_array(collect_list(struct($"tidx", $"token")))
        .getField("token")).as("w"))
      .as[(Long, Int, String)].collect().toSet
    val words = Seq((1L, "low lower  newest"),
        (4L, "wid\u00e9st low\ud83d\ude00")).flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).zipWithIndex.map { case (w, i) =>
        (id, i + 1, w) } }.toSet
    assert(joined === words)
  }
}
