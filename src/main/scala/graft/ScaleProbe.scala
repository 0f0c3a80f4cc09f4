package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling probe: runs the MinHash-LSH dedup pipeline (signatures → banded
 * candidates → Jaccard verification) over the sf0.1 documents corpus
 * amplified K× (text perturbed per copy so signatures differ), and prints
 * sec per K — evidence that the operator scales linearly in corpus size
 * (candidate generation is bucket-local, never O(n²)).
 *
 * Run: sbt "runMain graft.ScaleProbe 1 4 8"
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 4, 8)
    // SPARK_GRAFT_PROBE=minhash,ccstar,linededup,decontaminate,dupfraction,
    //   lm,exactsubstr,dsir,semdedup,ann,graph,triangles,lpa,kmeans,kcore,
    //   heavyhitters,covariance,kll,topk,sketchoverlap,saltjoin,bucketjoin,
    //   pq,profile,rollingdistinct,funnel,statsskip,bloomskip,
    //   intervaljoin,mediameta,optimize,tokenmix,crawl,fuzzyjoin,mutate,statstier,
    //   mergelarge,cdfchurn,annindexq,
    //   matview,cdc,manifest,hilbert3d,hilbert2d,idxcarry,chunkdedup,
    //   winnow,bpe,chain,export,fsck
    //   (default all)
    val want: String => Boolean = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(',').map(_.trim).toSet)
      .map(s => (x: String) => s(x)).getOrElse(_ => true)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // see Bench: the 100-entry default evicts across probe families and
      // K steps, polluting timings with janino recompilation
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()

    if (want("minhash")) {
      val results = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            // distinct suffix per copy so copies aren't trivial exact dups
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val edges = graft.ops.Dedup.minhashDedupEdges(
          corpus, "text", "doc_id", threshold = 0.5, k = 32, bands = 8)
        val n = edges.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        // localEdgeThreshold=0 pins the distributed label-propagation path —
        // this probe is the evidence that the 100 TB path scales, so the
        // small-graph driver shortcut must not kick in here
        val nClusters = graft.ops.Dedup.connectedComponents(edges, localEdgeThreshold = 0L)
          .select("cluster_id").distinct().count()
        val ccSec = (System.nanoTime() - t1) / 1e9
        println(f"K=$k%-3d rows=${5000L * k}%-8d edges=$n%-10d ${sec}%.2f s   " +
          f"cc: $nClusters%-7d clusters in ${graft.ops.Dedup.lastRounds} rounds ${ccSec}%.2f s")
        (k, sec)
      }
      val (k1, s1) = results.head
      val (kN, sN) = results.last
      println(f"scale factor ${kN.toDouble / k1}%.0fx -> time factor ${sN / s1}%.2fx")
    }

    // Star CC vs min-label on adversarial diameter: a planted chain of
    // K*10000 links. Min-label needs O(diameter) rounds (capped here —
    // it would NOT finish); large-star/small-star contracts any chain in
    // O(log² n) rounds. The round counts are the evidence.
    if (want("ccstar")) {
      ks.foreach { k =>
        val n = 10000L * k
        val chain = spark.range(n)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        val t0 = System.nanoTime()
        val clusters = graft.ops.Dedup.connectedComponentsStar(chain)
          .select("cluster_id").distinct().count()
        val starSec = (System.nanoTime() - t0) / 1e9
        val starRounds = graft.ops.Dedup.lastStarRounds
        val t1 = System.nanoTime()
        val lpClusters = graft.ops.Dedup
          .connectedComponents(chain, maxIter = starRounds,
            localEdgeThreshold = 0L)
          .select("cluster_id").distinct().count()
        val lpSec = (System.nanoTime() - t1) / 1e9
        println(f"ccstar K=$k%-3d links=$n%-9d star: $clusters cluster(s) " +
          f"in $starRounds rounds ${starSec}%.2f s   " +
          f"min-label after the same rounds: $lpClusters%-7d labels " +
          f"(needs ~$n rounds) ${lpSec}%.2f s")
      }
    }

    // Cross-document line dedup at the same amplifications: multi-line docs
    // where one line is corpus-wide boilerplate. Wide stages touch only
    // 8-byte hashes, so time should track corpus size ~linearly too.
    if (want("linededup")) {
      val lineResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy"),
              lit("\nshared boilerplate line\nunique tail "),
              col("doc_id") * k + col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val kept = graft.ops.Corpus.dedupLines(corpus, "doc_id", "text", minDocs = 3)
        val n = kept.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"lineDedup K=$k%-3d docs=${5000L * k}%-8d kept=$n%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (lk1, ls1) = lineResults.head
      val (lkN, lsN) = lineResults.last
      println(f"lineDedup scale ${lkN.toDouble / lk1}%.0fx -> time ${lsN / ls1}%.2fx")
    }

    // 13-gram decontamination at the same amplifications: benchmark stays
    // fixed-size (an eval suite doesn't grow with the corpus), so time
    // should track corpus size while the benchmark side always broadcasts.
    if (want("decontaminate")) {
      val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val dcResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val flagged = graft.ops.Corpus.ngramDecontaminate(
            corpus, bench, "doc_id", "text", n = 13)
          .filter(col("contaminated")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"decontaminate K=$k%-3d docs=${5000L * k}%-8d flagged=$flagged%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (dk1, ds1) = dcResults.head
      val (dkN, dsN) = dcResults.last
      println(f"decontaminate scale ${dkN.toDouble / dk1}%.0fx -> time ${dsN / ds1}%.2fx")
    }

    // duplication fraction at the same amplifications: copies share all
    // grams except the per-copy suffix tail, so the duplicated-key set
    // grows with the corpus — the worst (most shuffle-heavy) regime.
    if (want("dupfraction")) {
      val dfResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val scored = graft.ops.Corpus.duplicatedGramFraction(
            corpus, "doc_id", "text", n = 13)
          .filter(col("dup_fraction") >= 0.5).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"dupFraction K=$k%-3d docs=${5000L * k}%-8d dup>=.5=$scored%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (fk1, fs1) = dfResults.head
      val (fkN, fsN) = dfResults.last
      println(f"dupFraction scale ${fkN.toDouble / fk1}%.0fx -> time ${fsN / fs1}%.2fx")
    }

    // Bigram-LM scoring: train on the base corpus, score the amplified one.
    // The count tables are vocabulary-sized (they DON'T grow with copies —
    // the suffix tokens add O(K) types), so scoring should scale linearly.
    if (want("lm")) {
      val lmResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val n = graft.ops.Corpus.lmPerplexity(docs, corpus, "doc_id", "text")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"lmScore K=$k%-3d docs=${5000L * k}%-8d scored=$n%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (mk1, ms1) = lmResults.head
      val (mkN, msN) = lmResults.last
      println(f"lmScore scale ${mkN.toDouble / mk1}%.0fx -> time ${msN / ms1}%.2fx")
    }

    // Exact-substring dedup in the worst regime: every copy shares its
    // whole body with the original, so nearly every window row becomes a
    // mark and nearly the whole amplified corpus is excised — maximal
    // span-merge and rebuild work per input row.
    if (want("exactsubstr")) {
      val esResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val agg = graft.ops.Corpus.exactSubstrDedup(corpus, "doc_id", "text",
            minLen = 13)
          .agg(sum("n_tokens").as("t"), sum("n_removed").as("r")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"exactSubstr K=$k%-3d docs=${5000L * k}%-8d " +
          f"removed=${agg.getLong(1)}%-10d of ${agg.getLong(0)}%-10d ${sec}%.2f s")
        (k, sec)
      }
      val (ek1, es1) = esResults.head
      val (ekN, esN) = esResults.last
      println(f"exactSubstr scale ${ekN.toDouble / ek1}%.0fx -> time ${esN / es1}%.2fx")
    }

    // DSIR importance weights: the curated target stays fixed-size (a
    // target corpus doesn't grow with the crawl), the raw corpus amplifies
    // K×. The count/lambda tables are bucket-bounded (B rows) regardless of
    // K, so time should track raw-corpus size ~linearly.
    if (want("dsir")) {
      val target = docs.filter(pmod(col("doc_id"), lit(20)) < 2)
      val dsResults = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val n = graft.ops.Corpus.dsirWeights(target, corpus, "doc_id", "text",
          buckets = 4096).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"dsir K=$k%-3d docs=${5000L * k}%-8d scored=$n%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (xk1, xs1) = dsResults.head
      val (xkN, xsN) = dsResults.last
      println(f"dsir scale ${xkN.toDouble / xk1}%.0fx -> time ${xsN / xs1}%.2fx")
    }

    // SemDeDup at constant cluster size: the anchor count grows with the
    // corpus (8 per amplification unit — exactly how the paper operates
    // k-means: k scales so clusters stay ~10^4-10^5), so the within-cluster
    // all-pairs stage does constant work per cluster and total time tracks
    // corpus size ~linearly.
    if (want("semdedup")) {
      val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb0 = emb0.count()
      val sdResults = ks.map { k =>
        val corpus = emb0.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("vec_id") * k + col("__copy")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (pmod(col("__copy") * 31 + i, lit(7)) - lit(3))
                .cast("float") * lit(0.01f)).as("embedding"))
        val anchors = corpus.filter(col("vec_id") < 8 * k)
        val t0 = System.nanoTime()
        val out = graft.ops.Dedup.semanticDedup(corpus, "vec_id", "embedding",
          anchors, "vec_id", "embedding", threshold = 0.98)
        val dropped = out.filter(!col("kept")).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"semdedup K=$k%-3d vecs=${nEmb0 * k}%-8d anchors=${8 * k}%-5d " +
          f"dropped=$dropped%-8d ${sec}%.2f s")
        (k, sec)
      }
      val (zk1, zs1) = sdResults.head
      val (zkN, zsN) = sdResults.last
      println(f"semdedup scale ${zkN.toDouble / zk1}%.0fx -> time ${zsN / zs1}%.2fx")
    }

    // ANN family: amplify the embeddings corpus K× with a small
    // deterministic per-copy jitter (copies stay near their original, so
    // the neighbor structure is preserved but signatures/centroids differ),
    // then check that each approximate index (a) keeps the gate's recall
    // property — ≥3 of 5 brute-force neighbors per query — against brute
    // force recomputed on the SAME amplified corpus, and (b) scales
    // ~linearly in corpus size. hammingTopK is timed as the stage-1 scan;
    // ivf and rerank carry the recall bound.
    if (want("ann")) {
      import graft.ops.Similarity
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb = emb.count()
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      def recallOk(ann: org.apache.spark.sql.DataFrame,
                   bf: org.apache.spark.sql.DataFrame): Long =
        ann.select(col("query_id"), col("vec_id"))
          .intersect(bf.select(col("query_id"), col("vec_id")))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
          .filter(col("n_hits") >= 3).count()
      // untimed warm pass: codegen + encoder JIT for all three pipelines,
      // so the K=1 measurement isn't dominated by first-query compilation
      Similarity.hammingTopK(emb, queries, 5).count()
      locally {
        val (a0, c0) = Similarity.ivfBuild(emb, nlist = 16, iterations = 1)
        Similarity.ivfTopK(a0, c0, queries, 5, nprobe = 8).count()
      }
      Similarity.hammingRerankTopK(emb, queries, 5, prefilter = 40).count()
      Similarity.sq8TopK(emb, queries, 5).count()
      val annResults = ks.map { k =>
        val corpus = emb.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("vec_id") * k + col("__copy")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (pmod(col("__copy") * 31 + i, lit(7)) - lit(3))
                .cast("float") * lit(0.01f)).as("embedding"))
          .cache()
        corpus.count()
        val bf = Similarity.bruteForceTopK(corpus, queries, 5)
          .select("query_id", "vec_id").cache()
        bf.count()
        val t0 = System.nanoTime()
        Similarity.hammingTopK(corpus, queries, 5).count()
        val hamSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (assigned, centroids) = Similarity.ivfBuild(corpus, nlist = 16,
          iterations = 1)
        val ivfOk = recallOk(
          Similarity.ivfTopK(assigned, centroids, queries, 5, nprobe = 8), bf)
        val ivfSec = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val rrOk = recallOk(
          Similarity.hammingRerankTopK(corpus, queries, 5, prefilter = 40), bf)
        val rrSec = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val sqOk = recallOk(Similarity.sq8TopK(corpus, queries, 5), bf)
        val sqSec = (System.nanoTime() - t3) / 1e9
        println(f"ann K=$k%-3d vecs=${nEmb * k}%-8d hamming ${hamSec}%.2f s   " +
          f"ivf(recall_ok=$ivfOk/3) ${ivfSec}%.2f s   " +
          f"rerank(recall_ok=$rrOk/3) ${rrSec}%.2f s   " +
          f"sq8(recall_ok=$sqOk/3) ${sqSec}%.2f s")
        // sq8 bound is 2/3, not 3/3: the probe's jittered clones sit
        // ~0.01 apart — BELOW the int8 quantization step on this value
        // range — so neighbor flips among clones are expected physics at
        // high clone density (production answer: sq8 prefilter + exact
        // rerank, same as the hamming pipeline). On the real (non-clone)
        // corpus sq8 matches exact top-k bit-for-bit minus quantization
        // error (OpsSpec recall >= 0.8, q_ann_sq8 oracle).
        require(ivfOk == 3 && rrOk == 3 && sqOk >= 2,
          s"ANN recall property failed at K=$k: ivf=$ivfOk rerank=$rrOk sq8=$sqOk")
        corpus.unpersist(); bf.unpersist()
        (k, hamSec, ivfSec, rrSec, sqSec)
      }
      val f = annResults.head
      val l = annResults.last
      println(f"ann scale ${l._1.toDouble / f._1}%.0fx -> hamming ${l._2 / f._2}%.2fx " +
        f"ivf ${l._3 / f._3}%.2fx rerank ${l._4 / f._4}%.2fx sq8 ${l._5 / f._5}%.2fx")
    }
    // PageRank at K disjoint copies of the supplier→part graph: node count
    // and edge count both scale K×; per-iteration cost is the edges⋈ranks
    // join, so time should track K ~linearly. Mass conservation (Σrank=1)
    // must hold at every K — it exercises the dangling-mass path, since
    // every part node is dangling.
    if (want("graph")) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst")).cache()
      val nEdge = li.count()
      val results = ks.map { k =>
        val edges = li.crossJoin(spark.range(k).select(col("id").as("__c")))
          .select(concat(col("src"), lit("_"), col("__c")).as("src"),
            concat(col("dst"), lit("_"), col("__c")).as("dst"))
        val t0 = System.nanoTime()
        val ranks = graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3)
        val (nNodes, total) = {
          val r = ranks.agg(count(lit(1)), sum("rank")).head()
          (r.getLong(0), r.getDouble(1))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"pagerank K=$k%-3d edges=${nEdge * k}%-9d nodes=$nNodes%-8d " +
          f"mass=$total%.9f ${sec}%.2f s")
        require(math.abs(total - 1.0) < 1e-6,
          s"rank mass leaked at K=$k: $total")
        (k, sec)
      }
      println(f"pagerank scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // Triangle counting at K disjoint copies of the co-occurrence graph:
    // wedge space and triangle set both scale exactly K×, so the summed
    // per-node triangle count must be K × the base count (a correctness
    // invariant, not just a timing) and time should track K ~linearly —
    // degree orientation keeps the per-node wedge fan-out constant as
    // copies are added.
    if (want("triangles")) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_partkey"))
      val base = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").cast("string").as("src"),
          col("l2.l_partkey").cast("string").as("dst")).cache()
      val nEdge = base.count()
      var baseTri = -1L
      val results = ks.map { k =>
        val edges = base.crossJoin(spark.range(k).select(col("id").as("__c")))
          .select(concat(col("src"), lit("_"), col("__c")).as("src"),
            concat(col("dst"), lit("_"), col("__c")).as("dst"))
        val t0 = System.nanoTime()
        val r = graft.ops.Graph.triangleCount(edges, "src", "dst")
          .agg(sum("triangles"), count(lit(1))).head()
        val (tri3, nNodes) = (r.getLong(0), r.getLong(1))
        val sec = (System.nanoTime() - t0) / 1e9
        // per-copy count: the first probed K anchors the invariant
        if (baseTri < 0) baseTri = tri3 / k
        println(f"triangles K=$k%-3d edges~${nEdge * k}%-9d nodes=$nNodes%-8d " +
          f"tri3=$tri3%-9d ${sec}%.2f s")
        require(tri3 == baseTri * k,
          s"triangle count not K-linear at K=$k: $tri3 vs ${baseTri * k}")
        (k, sec)
      }
      println(f"triangles scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // LPA communities at K disjoint copies: labels never cross copies, so
    // the distinct-community count must scale exactly K× (correctness
    // invariant) while per-iteration cost is the labels⋈neighbors join —
    // time should track K ~linearly.
    if (want("lpa")) {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_partkey"))
      val base = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").cast("string").as("src"),
          col("l2.l_partkey").cast("string").as("dst")).cache()
      val nEdge = base.count()
      var baseComm = -1L
      val results = ks.map { k =>
        val edges = base.crossJoin(spark.range(k).select(col("id").as("__c")))
          .select(concat(col("src"), lit("_"), col("__c")).as("src"),
            concat(col("dst"), lit("_"), col("__c")).as("dst"))
        val t0 = System.nanoTime()
        val r = graft.ops.Graph.labelPropagation(edges, "src", "dst", 2)
          .agg(countDistinct("label"), count(lit(1))).head()
        val (nComm, nNodes) = (r.getLong(0), r.getLong(1))
        val sec = (System.nanoTime() - t0) / 1e9
        if (baseComm < 0) baseComm = nComm / k
        println(f"lpa K=$k%-3d edges~${nEdge * k}%-9d nodes=$nNodes%-8d " +
          f"communities=$nComm%-7d ${sec}%.2f s")
        require(nComm == baseComm * k,
          s"community count not K-linear at K=$k: $nComm vs ${baseComm * k}")
        (k, sec)
      }
      println(f"lpa scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // Engine-exact k-means at K× jittered embeddings: assignment is a
    // broadcast-centroid scan (linear), recompute shuffles rows×dim
    // scalars with map-side combine — time should track K ~linearly and
    // all 8 clusters must stay populated.
    if (want("kmeans")) {
      import graft.ops.Similarity
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb = emb.count()
      val results = ks.map { k =>
        // id = copy*n + vec_id keeps the k lowest ids (the deterministic
        // init) DISTINCT vectors of copy 0 — vec_id*k+copy would make all
        // 8 initial centroids jittered clones of vector 0 and collapse a
        // cluster (observed: 7/8 at K=8)
        val corpus = emb.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("__copy") * nEmb + col("vec_id")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (pmod(col("__copy") * 31 + i, lit(7)) - lit(3))
                .cast("float") * lit(0.01f)).as("embedding"))
        val t0 = System.nanoTime()
        val (assign, cents) = Similarity.kmeans(corpus, k = 8, iterations = 2)
        val nAssigned = assign.count()
        val nCents = cents.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"kmeans K=$k%-3d vecs=${nEmb * k}%-8d assigned=$nAssigned%-8d " +
          f"clusters=$nCents ${sec}%.2f s")
        require(nAssigned == nEmb * k && nCents == 8,
          s"kmeans degenerate at K=$k: $nAssigned rows, $nCents clusters")
        (k, sec)
      }
      println(f"kmeans scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    if (want("kcore")) {
      // disjoint copies: per-copy suffixed node ids replicate the graph K×
      // (edges and nodes both scale K×; the core structure repeats per copy)
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey")).cache()
      li.count()
      val base = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").cast("string").as("src"),
          col("l2.l_partkey").cast("string").as("dst")).cache()
      val nEdge = base.count()
      val results = ks.map { k =>
        val edges = base.crossJoin(spark.range(k).select(col("id").as("__c")))
          .select(concat(col("src"), lit("_"), col("__c")).as("src"),
            concat(col("dst"), lit("_"), col("__c")).as("dst"))
        val t0 = System.nanoTime()
        val core = graft.ops.Graph.kCore(edges, "src", "dst", k = 4, rounds = 4)
        val n = core.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"kcore K=$k%-3d edges=${nEdge * k}%-9d core_nodes=$n%-8d ${sec}%.2f s")
        (k, sec)
      }
      println(f"kcore scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    if (want("covariance")) {
      // corpus grows K×, the shuffle stays O(dim^2 × partitions) — time
      // should track the map-side pair derivation, i.e. ~linear, while
      // the result stays exactly 2080 cells
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb = emb.count()
      val results = ks.map { k =>
        val corpus = emb.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select(transform(col("embedding"), (x, i) =>
            x + (pmod(col("__copy") * 13 + i, lit(5)) - lit(2))
              .cast("float") * lit(0.01f)).as("embedding"))
        val t0 = System.nanoTime()
        val cells = graft.ops.Similarity.covarianceMatrix(corpus, "embedding")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"covariance K=$k%-3d vecs=${nEmb * k}%-8d cells=$cells%-6d ${sec}%.2f s")
        require(cells == 2080, s"expected 2080 cells, got $cells")
        (k, sec)
      }
      println(f"covariance scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    if (want("heavyhitters")) {
      // gram volume scales K× while the distinct-key space stays fixed —
      // the regime where the O(capacity) summary shuffle is the whole win
      val results = ks.map { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select(concat(lit("src"), pmod(col("doc_id"), lit(20))).as("source"),
            col("text"))
        val t0 = System.nanoTime()
        val hh = graft.ops.Corpus.heavyHitterPhrases(
          corpus, "text", "source", n = 2, capacity = 4096, topK = 5)
        val n = hh.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"heavyhitters K=$k%-3d docs=${5000L * k}%-8d rows=$n%-6d ${sec}%.2f s")
        require(n == 100, s"expected 20 groups x 5, got $n")
        (k, sec)
      }
      println(f"heavyhitters scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // KLL quantile sketch: row volume scales K× over a fixed group space —
    // the shuffle carries O(k·log n) sketch bytes per group regardless of
    // row count, where exact percentile would sort the whole column
    if (want("kll")) {
      val results = ks.map { k =>
        val rows = spark.range(200000L * k).select(
          pmod(col("id"), lit(1000)).as("g"),
          pmod(xxhash64(col("id")), lit(1000000)).cast("double").as("v"))
        val t0 = System.nanoTime()
        val q = rows.groupBy("g").agg(graft.functions.GraftFunctions
          .kll_quantiles(col("v"), Seq(0.5, 0.99), 256).as("q"))
        val n = q.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"kll K=$k%-3d rows=${200000L * k}%-9d groups=$n%-5d ${sec}%.2f s")
        require(n == 1000, s"expected 1000 groups, got $n")
        (k, sec)
      }
      println(f"kll scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // topk_rows vs the window idiom at K× row volume over a fixed group
    // space. Honest framing: Spark's OWN rank-limit pushdown
    // (WindowGroupLimit, SPARK-37099) already bounds the window route's
    // shuffle map-side, so on a plain batch top-k the two are
    // comparable — the probe reports the window route both WITH the
    // optimization and with it disabled (what a naive engine, or any
    // rank pattern the optimizer fails to match, pays: a full per-group
    // sort-shuffle). The aggregate's unique ground is composition — it
    // runs INSIDE a groupBy beside other aggregates in one pass, and in
    // STREAMING aggregations where window functions are illegal
    // (q_stream_topk pins that).
    if (want("topk")) {
      import org.apache.spark.sql.expressions.Window
      val results = ks.map { k =>
        val rows = spark.range(400000L * k).select(
          pmod(col("id"), lit(500)).cast("string").as("g"),
          pmod(xxhash64(col("id")), lit(10000000)).cast("double").as("s"),
          concat(lit("i"), col("id")).as("item"))
        val t0 = System.nanoTime()
        val n = graft.ops.Corpus.topKPerGroup(rows, "g", col("s"),
          col("item"), k = 10).count()
        val heapSec = (System.nanoTime() - t0) / 1e9
        val w = Window.partitionBy("g").orderBy(col("s").desc, col("item"))
        val t1 = System.nanoTime()
        val nW = rows.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).count()
        val winSec = (System.nanoTime() - t1) / 1e9
        val thresholdKey = "spark.sql.optimizer.windowGroupLimitThreshold"
        val prevT = spark.conf.get(thresholdKey)
        spark.conf.set(thresholdKey, "-1")
        val t2 = System.nanoTime()
        val nN = rows.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10).count()
        val naiveSec = (System.nanoTime() - t2) / 1e9
        spark.conf.set(thresholdKey, prevT)
        require(n == 5000 && nW == 5000 && nN == 5000,
          s"expected 500x10, got $n/$nW/$nN")
        println(f"topk K=$k%-3d rows=${400000L * k}%-9d heap ${heapSec}%.2f s" +
          f"   window+grouplimit ${winSec}%.2f s" +
          f"   window-naive ${naiveSec}%.2f s (${naiveSec / heapSec}%.1fx)")
        (k, heapSec)
      }
      println(f"topk scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // HLL overlap: corpus scales K×, the cross-corpus artifact stays two
    // ~16 KB sketches — vs the exact distinct-join overlap whose shuffle
    // grows with the corpus
    if (want("sketchoverlap")) {
      val results = ks.map { k =>
        val a = spark.range(500000L * k)
          .select(concat(lit("t"), col("id")).as("g"))
        val b = spark.range(250000L * k, 750000L * k)
          .select(concat(lit("t"), col("id")).as("g"))
        val t0 = System.nanoTime()
        val r = graft.ops.Corpus.distinctOverlap(a, b, "g").head()
        val skSec = (System.nanoTime() - t0) / 1e9
        val est = r.getAs[Long]("est_intersect")
        val t1 = System.nanoTime()
        val exact = a.intersect(b).count()
        val exSec = (System.nanoTime() - t1) / 1e9
        val err = math.abs(est - exact).toDouble / exact
        println(f"sketchoverlap K=$k%-3d |A|=${500000L * k}%-9d " +
          f"sketch ${skSec}%.2f s (err ${err * 100}%.2f%%)   " +
          f"exact intersect ${exSec}%.2f s (${exSec / skSec}%.1fx)")
        require(err < 0.05, s"estimate off by ${err * 100}%")
        (k, skSec)
      }
      println(f"sketchoverlap scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // salted join under planted skew: 90% of the big side carries ONE
    // key, the dim is non-broadcastable by conf — the salt turns the
    // single melted reducer into `buckets` balanced ones
    if (want("saltjoin")) {
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val results = ks.map { k =>
          val n = 1000000L * k
          val big = spark.range(n).select(
            when(pmod(col("id"), lit(10)) < 9, lit(7L))
              .otherwise(pmod(col("id"), lit(100000))).as("k"),
            col("id").as("payload"))
          val small = spark.range(100000)
            .select(col("id").as("k2"), concat(lit("d"), col("id")).as("name"))
          val t0 = System.nanoTime()
          val plain = big.join(small, col("k") === col("k2")).count()
          val plainSec = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val salted = graft.ops.Joins.saltedJoin(
            big, small, "k", "k2", buckets = 32).count()
          val saltSec = (System.nanoTime() - t1) / 1e9
          require(plain == salted, s"parity: $plain != $salted")
          println(f"saltjoin K=$k%-3d rows=$n%-9d plain ${plainSec}%.2f s" +
            f"   salted ${saltSec}%.2f s (${plainSec / saltSec}%.1fx)")
          (k, saltSec)
        }
        println(f"saltjoin scale ${results.last._1.toDouble / results.head._1}%.0fx " +
          f"-> time factor ${results.last._2 / results.head._2}%.2fx")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    }

    // PQ/ADC candidate scan vs the brute-force float scan at K× corpus.
    // HONEST result on this 64-dim in-memory toy: brute force WINS
    // (~0.6×) — a 64-float codegen'd cosine kernel is simply cheap when
    // the whole corpus sits in page cache. PQ's win domain is (a) memory:
    // 32× smaller scan footprint is the difference between RAM-resident
    // and spilling at billions of vectors, and (b) real embedding widths
    // (768–1536 dims: brute cost grows 12–24×, ADC stays m adds). The
    // probe pins the honest crossover data and that ADC stays ~linear.
    if (want("pq")) {
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb = emb.count()
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val cb = graft.ops.Similarity.pqTrain(emb, m = 8, kc = 16,
        iterations = 1)
      val results = ks.map { k =>
        val corpus = emb.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("vec_id") * k + col("__copy")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (pmod(col("__copy") * 17 + i, lit(7)) - lit(3))
                .cast("float") * lit(0.005f)).as("embedding"))
        // pre-materialize BOTH scan inputs (stored-codes vs stored-floats
        // — the fair comparison: each side reads its own persisted
        // artifact), then time the candidate scans
        val mat = corpus.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        mat.count()
        val codes = graft.ops.Similarity.pqEncode(mat, cb)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        codes.count()
        // training wall time at this corpus size: the init is a
        // TakeOrdered + broadcast rank join and every Lloyd stage is
        // partial-aggregated, so the curve must stay sub-linear in the
        // corpus (the retired dense_rank init sorted the whole N×m
        // frame in ONE partition — linear-plus at best)
        val tTr = System.nanoTime()
        graft.ops.Similarity.pqTrain(mat, m = 8, kc = 16, iterations = 1)
        val trainSec = (System.nanoTime() - tTr) / 1e9
        val t0 = System.nanoTime()
        val nPq = graft.ops.Similarity.pqAdcTopK(codes, queries, k = 10, cb)
          .count()
        val pqSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nBf = graft.ops.Similarity.bruteForceTopK(mat, queries,
          k = 10).count()
        val bfSec = (System.nanoTime() - t1) / 1e9
        require(nPq == 80 && nBf == 80, s"expected 8x10, got $nPq/$nBf")
        codes.unpersist(blocking = false)
        mat.unpersist(blocking = false)
        println(f"pq K=$k%-3d vecs=${nEmb * k}%-9d adc ${pqSec}%.2f s" +
          f"   brute ${bfSec}%.2f s (${bfSec / pqSec}%.1fx)" +
          f"   train ${trainSec}%.2f s")
        (k, pqSec, trainSec)
      }
      println(f"pq scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx" +
        f"   train factor ${results.last._3 / results.head._3}%.2fx")
    }

    // bucketed layout: pay the bucketed write once, then every join on
    // the key runs exchange-free — probe reports write cost + per-join
    // time vs the shuffling plain join
    if (want("bucketjoin")) {
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val results = ks.map { k =>
          val n = 1000000L * k
          val a = spark.range(n).select(pmod(col("id"), lit(200000)).as("k"),
            col("id").as("va"))
          val b = spark.range(n).select(pmod(col("id") * 7, lit(200000)).as("k2"),
            col("id").as("vb"))
          val root = java.nio.file.Files
            .createTempDirectory(s"graft_bkprobe_$k").toString
          val t0 = System.nanoTime()
          graft.io.Layout.bucketize(a, s"bkp_a_$k", s"$root/a", "k", 32)
          graft.io.Layout.bucketize(b, s"bkp_b_$k", s"$root/b", "k2", 32)
          val writeSec = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val nb = graft.io.Layout
            .bucketedJoin(spark, s"bkp_a_$k", s"bkp_b_$k", "k", "k2").count()
          val bkSec = (System.nanoTime() - t1) / 1e9
          val t2 = System.nanoTime()
          val np = a.join(b, col("k") === col("k2")).count()
          val plSec = (System.nanoTime() - t2) / 1e9
          require(nb == np, s"parity: $nb != $np")
          println(f"bucketjoin K=$k%-3d rows=$n%-9d write ${writeSec}%.2f s" +
            f"   bucketed join ${bkSec}%.2f s   plain join ${plSec}%.2f s" +
            f" (${plSec / bkSec}%.1fx)")
          (k, bkSec)
        }
        println(f"bucketjoin scale ${results.last._1.toDouble / results.head._1}%.0fx " +
          f"-> time factor ${results.last._2 / results.head._2}%.2fx")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
    // r7 tail ops: profile robustness (winsorize/MAD), rolling distinct,
    // funnel — each is a fixed number of sketch/aggregation passes, so
    // time must grow ~linearly with the event count, never faster.
    def events(k: Int) = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      val norm = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
      norm.crossJoin(spark.range(k).select(col("id").as("__copy")))
        .select((col("event_id") * k + col("__copy")).as("event_id"),
          col("ts"),
          (col("user_id") * k + col("__copy")).as("user_id"),
          col("event_type"), col("value"))
    }

    if (want("profile")) {
      val results = ks.map { k =>
        val ev = events(k).cache(); val n = ev.count()
        val t0 = System.nanoTime()
        val w = graft.ops.Profile.winsorize(ev, "value")
          .agg(sum(col("value_w"))).head()
        val wSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val m = graft.ops.Profile.madOutliers(ev, "value")
          .filter(col("is_outlier")).count()
        val mSec = (System.nanoTime() - t1) / 1e9
        ev.unpersist()
        val _ = w
        println(f"profile K=$k%-3d rows=$n%-9d winsorize ${wSec}%.2f s   " +
          f"madOutliers ($m flagged) ${mSec}%.2f s")
        (k, wSec + mSec)
      }
      println(f"profile scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    if (want("rollingdistinct")) {
      val results = ks.map { k =>
        val ev = events(k).cache(); val n = ev.count()
        val t0 = System.nanoTime()
        val days = graft.ops.Sessions.rollingDistinct(ev, "user_id", "ts")
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        ev.unpersist()
        println(f"rollingdistinct K=$k%-3d rows=$n%-9d $days day rows ${sec}%.2f s")
        (k, sec)
      }
      println(f"rollingdistinct scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    if (want("funnel")) {
      val results = ks.map { k =>
        val ev = events(k).cache(); val n = ev.count()
        val t0 = System.nanoTime()
        val f = graft.ops.Sessions.funnel(ev, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
          .agg(sum(col("step_reached"))).head()
        val sec = (System.nanoTime() - t0) / 1e9
        ev.unpersist()
        val _ = f
        println(f"funnel K=$k%-3d rows=$n%-9d ${sec}%.2f s")
        (k, sec)
      }
      println(f"funnel scale ${results.last._1.toDouble / results.head._1}%.0fx " +
        f"-> time factor ${results.last._2 / results.head._2}%.2fx")
    }

    // File-stats skipping at scale: a K×-amplified range-layout save, then
    // a selective read. The evidence is (a) files pruned ∝ selectivity
    // regardless of K and (b) pruned-read time tracking the SURVIVING
    // fraction, not the corpus size.
    if (want("statsskip")) {
      ks.foreach { k =>
        val ev = events(k)
        val n = ev.count()
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_ssk_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val t0 = System.nanoTime()
        cat.save(graft.core.Chain(
          ev.repartitionByRange(32, col("event_id"))), "ev")
        val saveSec = (System.nanoTime() - t0) / 1e9
        val maxId = n * 2 // ids were re-spread by k; bound via count*2
        val pred = col("event_id") <= maxId / 16
        val (kept, total) = cat.pruneCount("ev", pred)
        val t1 = System.nanoTime()
        val rows = cat.readDatasetWhere("ev", pred).toDF.count()
        val prunedSec = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val rowsFull = cat.readDataset("ev").toDF.filter(pred).count()
        val fullSec = (System.nanoTime() - t2) / 1e9
        require(rows == rowsFull, s"parity: $rows != $rowsFull")
        println(f"statsskip K=$k%-3d rows=$n%-9d save(+stats) ${saveSec}%.2f s" +
          f"   kept $kept/$total files, pruned read ${prunedSec}%.2f s" +
          f" vs full-scan filter ${fullSec}%.2f s (${fullSec / prunedSec}%.1fx)")
      }
    }

    // Bloom-index probe: a HASH layout (every file spans the key domain,
    // min/max can never prune equality) saved with a bloom on a unique
    // string key. Evidence: (a) the save-time bloom pass cost vs the
    // plain save, (b) a point lookup keeps ~1 file (+fp) INDEPENDENT of
    // K — the property that makes point lookups O(1 file) at lake scale.
    if (want("bloomskip")) {
      ks.foreach { k =>
        val ev = events(k)
          .withColumn("ekey", concat(lit("k"), col("event_id")))
          .repartition(32)
        val n = ev.count()
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_blp_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val t0 = System.nanoTime()
        cat.save(graft.core.Chain(ev), "plain")
        val plainSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        cat.save(graft.core.Chain(ev), "bloomed", bloomCols = Seq("ekey"),
          bloomExpected = math.max(n / 32, 1000L))
        val bloomSec = (System.nanoTime() - t1) / 1e9
        val (kept, total) = cat.pruneCount("bloomed", col("ekey") === "k7")
        val t2 = System.nanoTime()
        val rows = cat.readDatasetWhere("bloomed", col("ekey") === "k7")
          .toDF.count()
        val lookupSec = (System.nanoTime() - t2) / 1e9
        require(rows == 1L, s"point lookup parity: $rows")
        println(f"bloomskip K=$k%-3d rows=$n%-9d save ${plainSec}%.2f s" +
          f" vs +bloom ${bloomSec}%.2f s (${bloomSec / plainSec}%.1fx)" +
          f"   lookup kept $kept/$total files in ${lookupSec}%.2f s")
        // the STREAMED index path (executor-written parquet, O(1) driver
        // memory): same save + lookup, bitmaps never collect()ed — the
        // driver-heap number to beat is files × bloom bytes (~10 GB at
        // 100k files), which this path never allocates
        spark.conf.set("graft.bloom.inlineMaxFiles", "0")
        val t3 = System.nanoTime()
        try cat.save(graft.core.Chain(ev), "bloomed_pq",
            bloomCols = Seq("ekey"), bloomExpected = math.max(n / 32, 1000L))
        finally spark.conf.unset("graft.bloom.inlineMaxFiles")
        val pqSaveSec = (System.nanoTime() - t3) / 1e9
        val v = cat.latestVersion("bloomed_pq").get
        val idxDir = java.nio.file.Paths.get(root, "datasets", "bloomed_pq",
          s"v$v", "blooms")
        val idxBytes = {
          import scala.jdk.CollectionConverters._
          val w = java.nio.file.Files.walk(idxDir)
          try w.iterator.asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size(_)).sum
          finally w.close()
        }
        val t4 = System.nanoTime()
        val rowsPq = cat.readDatasetWhere("bloomed_pq", col("ekey") === "k7")
          .toDF.count()
        val pqLookupSec = (System.nanoTime() - t4) / 1e9
        val t5 = System.nanoTime()
        val rowsPq2 = cat.readDatasetWhere("bloomed_pq", col("ekey") === "k9")
          .toDF.count()
        val pqCachedSec = (System.nanoTime() - t5) / 1e9
        require(rowsPq == 1L && rowsPq2 == 1L,
          s"pq point lookup parity: $rowsPq/$rowsPq2")
        println(f"bloomskip K=$k%-3d streamed index: save ${pqSaveSec}%.2f s" +
          f" (${pqSaveSec / plainSec}%.1fx plain), index ${idxBytes / 1024}%d KB" +
          f" on disk (0 B on driver), lookup ${pqLookupSec}%.2f s cold" +
          f" / ${pqCachedSec}%.2f s cached")
      }
    }
    // Interval-overlap probe: BOTH sides grow K×. Pair work in the binned
    // equi-join tracks (key, bin) collisions — at fixed key cardinality
    // and bin width the per-bin population grows K× per side, so emitted
    // pairs (and time) grow ~K²/keys, NEVER |a|×|b| all-pairs. The
    // evidence is pairs/sec staying flat-to-improving as K rises.
    if (want("intervaljoin")) {
      ks.foreach { k =>
        val ev = events(k)
        def side(modulus: Int, mult: Int, len: Int) = ev
          .filter(pmod(col("event_id"), lit(modulus)) === 0)
          .select(col("event_id"),
            pmod(col("user_id"), lit(200)).as("k"),
            pmod(col("event_id") * mult, lit(100000)).cast("double").as("lo"))
          .withColumn("hi", col("lo") + len)
        val a = side(5, 37, 50).cache()
        val b = side(7, 53, 30).select(col("event_id").as("b_event_id"),
          col("k").as("bk"), col("lo").as("blo"), col("hi").as("bhi"))
          .cache()
        val (na, nb) = (a.count(), b.count())
        val t0 = System.nanoTime()
        val pairs = graft.ops.Joins.intervalOverlapJoin(a, "lo", "hi",
          b, "blo", "bhi", binWidth = 100.0,
          keyCols = Seq(("k", "bk"))).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"intervaljoin K=$k%-3d a=$na%-8d b=$nb%-8d pairs=$pairs%-10d" +
          f" ${sec}%.2f s  ${pairs / sec / 1e6}%.2f M pairs/s")
        a.unpersist(); b.unpersist()
      }
    }

    // Media-metadata probe: codec-free MP4 box walk + MP3 frame-header
    // parse over a K×-amplified blob corpus. Both expressions touch a
    // bounded header prefix per blob (~tens of bytes), so sec scales with
    // BLOB COUNT, not payload bytes — rows/sec should hold flat.
    if (want("mediameta")) {
      ks.foreach { k =>
        val ids = spark.range(5000L * k).select(col("id").as("doc_id"))
        val t0 = System.nanoTime()
        val vids = graft.ops.Multimodal.videoHeaderMeta(
          graft.ops.Multimodal.syntheticMp4Media(ids, "doc_id"))
          .agg(count(lit(1)), sum("duration_sec")).head()
        val vSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val auds = graft.ops.Multimodal.audioFrameMeta(
          graft.ops.Multimodal.syntheticMp3Media(ids, "doc_id"))
          .agg(count(lit(1)), sum("bitrate_kbps")).head()
        val aSec = (System.nanoTime() - t1) / 1e9
        val n = 5000L * k
        println(f"mediameta K=$k%-3d blobs=$n%-8d mp4 ${vSec}%.2f s" +
          f" (${n / vSec / 1000}%.0f k/s)  mp3 ${aSec}%.2f s" +
          f" (${n / aSec / 1000}%.0f k/s)  [${vids.getLong(0)}/${auds.getLong(0)} parsed]")
      }
    }

    // OPTIMIZE probe: a K×-shattered version (file count AND bytes grow
    // with K) compacted to a fixed target layout. Evidence: the rewrite
    // cost scales with DATA, the bin-packed outputs stay even (max file
    // ≤ ~2× mean), and the pass stays a single scan + write — no shuffle.
    if (want("optimize")) {
      ks.foreach { k =>
        val ev = events(k).repartition(32 * k)
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_opt_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val t0 = System.nanoTime()
        cat.save(graft.core.Chain(ev), "ev")
        val saveSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (v2, before, after) = cat.optimize("ev", nFiles = 16)
        val optSec = (System.nanoTime() - t1) / 1e9
        val sizes = {
          import scala.jdk.CollectionConverters._
          val d = java.nio.file.Paths.get(root, "datasets", "ev",
            s"v$v2", "data")
          java.nio.file.Files.list(d).iterator.asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(java.nio.file.Files.size(_)).toSeq
        }
        val spread = sizes.max.toDouble * sizes.size / sizes.sum
        println(f"optimize K=$k%-3d files $before%-4d -> $after%-3d" +
          f" save ${saveSec}%.2f s  optimize ${optSec}%.2f s" +
          f"  max/mean ${spread}%.2f")
      }
    }
    // Token-mix probe: the data-recipe sampler over a K×-amplified
    // corpus with budgets scaled to stay ~20% selective. The evidence:
    // cost grows with the CORPUS (one groupBy histogram + broadcast
    // semi-join), while the doc-level window work stays bounded by the
    // boundary buckets (one per domain) — never a per-domain global sort.
    if (want("tokenmix")) {
      val d0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars").as("toks"))
      ks.foreach { k =>
        val corpus = d0.crossJoin(
            spark.range(k).select(col("id").as("__c")))
          .select((col("doc_id") * k + col("__c")).as("doc_id"),
            col("source"), col("toks")).cache()
        val n = corpus.count()
        val mass = corpus.groupBy("source").agg(sum("toks").as("m"))
          .agg(min("m")).head().getLong(0)
        val budgets = (0 until 20).map(i => s"src$i" -> mass / 5).toMap
        val t0 = System.nanoTime()
        val sel = graft.ops.Corpus.mixByTokenBudget(corpus, "doc_id",
          "source", "toks", budgets, seed = "p")
        val selN = sel.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"tokenmix K=$k%-3d rows=$n%-9d selected=$selN%-8d" +
          f" ${sec}%.2f s  ${n / sec / 1e6}%.2f M rows/s")
        corpus.unpersist()
      }
    }

    // Crawl-ingest probe: K .warc.gz files (each the full sf0.1 corpus as
    // HTML responses) through WARC read → WET extraction → URL
    // canonicalization → domain rollup. A .warc.gz is NOT splittable, so
    // the file is the parallelism unit — the honest prediction is FLAT
    // wall time while K ≤ cores (K independent tasks) and linear past
    // that, with per-file MB/s the invariant. That is exactly Common
    // Crawl's own consumption model (~1 GB files × ~100k = the corpus).
    if (want("crawl")) {
      import java.nio.file.{Files => JFiles, Paths, StandardCopyOption}
      val tmp = JFiles.createTempDirectory("probe_crawl")
      val base = tmp.resolve("base.warc.gz")
      val rows = docs.collect()
      val httpHead =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
      graft.files.Warc.writeRecords(JFiles.newOutputStream(base),
        rows.iterator.map { r =>
          val id = r.getLong(0)
          val html = "<html><head><script>x()</script></head><body><p>" +
            r.getString(1).replace("&", "&amp;").replace("<", "&lt;") +
            "</p></body></html>"
          (Map("WARC-Type" -> "response",
               "WARC-Record-ID" -> s"<urn:uuid:$id>",
               "WARC-Date" -> "2026-01-02T03:04:05Z",
               "WARC-Target-URI" ->
                 s"HTTPS://WWW.H${id % 50}-site.CO.UK/a/$id?utm_source=x&i=$id",
               "Content-Type" -> "application/http; msgtype=response"),
            httpHead.getBytes("ISO-8859-1") ++ html.getBytes("UTF-8"))
        })
      val mb = JFiles.size(base) / 1e6
      ks.foreach { k =>
        val dir = tmp.resolve(s"k$k"); JFiles.createDirectories(dir)
        (0 until k).foreach(i => JFiles.copy(base,
          dir.resolve(f"crawl-$i%05d.warc.gz"),
          StandardCopyOption.REPLACE_EXISTING))
        val t0 = System.nanoTime()
        val out = graft.files.Warc
          .readRecords(spark, dir.toString + "/*.warc.gz",
            types = Seq("response"))
          .select(col("target_uri"), col("payload").cast("string").as("h"))
          .select(graft.ops.Urls.registeredDomain(graft.ops.Urls
              .urlParts(graft.ops.Urls.urlNormalize(col("target_uri")))
              .getField("host")).as("domain"),
            graft.ops.TextAnalysis.tokenCount(
              graft.ops.TextAnalysis.htmlToText(col("h"))).as("toks"))
          .groupBy("domain").agg(count(lit(1)).as("n"), sum("toks").as("t"))
        val nDomains = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"crawl K=$k%-3d files=$k (${mb}%.1f MB each) " +
          f"domains=$nDomains%-4d ${sec}%.2f s  " +
          f"${k * mb / sec}%.1f MB/s aggregate (gz)")
      }
    }
    // Fuzzy-join probe: BOTH tables grow K×, and because every copy keeps
    // the base text, the TRUE match set grows ~K² by construction (every
    // L copy of a doc matches every R copy) — a deliberately adversarial
    // density. The claim under test: pair work scales with MATCHES (the
    // band buckets emit candidates ≈ true matches), never with |L|×|R|
    // (1.6e9 pairs at K=8, vs ~350k candidates actually verified).
    if (want("fuzzyjoin")) {
      ks.foreach { k =>
        val lhs = docs.crossJoin(
            spark.range(k).select(col("id").as("__c")))
          .select((col("doc_id") * k + col("__c")).as("doc_id"),
            concat(col("text"), lit(" L"), col("__c")).as("text"))
        val rhs = docs.crossJoin(
            spark.range(k).select(col("id").as("__c")))
          .select((col("doc_id") * k + col("__c")).as("doc_id"),
            concat(col("text"), lit(" R"), col("__c")).as("text"))
        val t0 = System.nanoTime()
        val n = graft.ops.Dedup.fuzzyJoin(lhs, "text", "doc_id",
          rhs, "text", "doc_id", threshold = 0.5).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"fuzzyjoin K=$k%-3d rows=${5000L * k}x2 matches=$n%-8d ${sec}%.2f s")
      }
    }

    // Copy-on-write mutation probe: the version grows K× (rows AND file
    // count — keys shifted per copy so the layout stays range-sorted)
    // while the mutation keeps touching the SAME low key band. The honest
    // prediction: deleteWhere wall time is ~FLAT in K (rewrite cost is
    // O(touched files); the linked remainder costs one hard link per
    // file, metadata only) while filesReused grows linearly — the
    // evidence that mutating a 100 TB dataset costs what the mutation
    // touches, not what the dataset weighs. mergeInto's envelope probe is
    // timed beside it with a fixed source for the same reason.
    if (want("mutate")) {
      import java.nio.file.{Files => JFiles}
      val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val span = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
      ks.foreach { k =>
        val root = JFiles.createTempDirectory(s"probe_mut_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val amplified = orders
          .crossJoin(spark.range(k).select(col("id").as("__c")))
          .select((col("o_orderkey") + col("__c") * span).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8 * k, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
        val tS = System.nanoTime()
        cat.save(graft.core.Chain(amplified), "ord")
        val saveSec = (System.nanoTime() - tS) / 1e9
        val t0 = System.nanoTime()
        val d = cat.deleteWhere("ord", col("o_orderkey") <= span / 16)
        val delSec = (System.nanoTime() - t0) / 1e9
        val src = orders.limit(10000)
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 2).as("o_totalprice"))
          .dropDuplicates("o_orderkey")
        val t1 = System.nanoTime()
        val m = cat.mergeInto("ord", src, Seq("o_orderkey"),
          keyCollectMax = 0) // force the envelope-probe path
        val mrgSec = (System.nanoTime() - t1) / 1e9
        // append = fixed 10k batch against the K×-grown table: all old
        // files hard-link, only the batch writes — expected ~flat
        val batch = orders.limit(10000)
          .select((col("o_orderkey") + 900000000L).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
        val tA = System.nanoTime()
        val a = cat.append("ord", batch)
        val appSec = (System.nanoTime() - tA) / 1e9
        // restore = the zero-copy claim under K× file growth: pure
        // metadata (one link per file), expected ~flat wall time
        val t2 = System.nanoTime()
        cat.restore("ord", graft.catalog.SemVer(1, 0, 0))
        val resSec = (System.nanoTime() - t2) / 1e9
        println(f"mutate K=$k%-3d files=${8 * k}%-4d save=${saveSec}%.2f s  " +
          f"delete=${delSec}%.2f s (rw=${d.filesRewritten} ln=${d.filesReused})  " +
          f"merge=${mrgSec}%.2f s (rw=${m.filesRewritten} ln=${m.filesReused})  " +
          f"append=${appSec}%.2f s (ln=${a.filesReused})  " +
          f"restore=${resSec}%.3f s")
      }
    }

    // Manifest-based zero-copy carry at MANY files: restore commits a
    // NEW version that references every file of the old one, so it
    // isolates the carry cost. The evidence: the commit writes ZERO
    // data bytes at any K (the new version's data dir is physically
    // empty), wall cost is metadata-only (µs-class per referenced
    // file: one manifest line), and reads resolve — where the old
    // hard-link farm burned one inode link per file and degraded to a
    // FULL DATA COPY on object stores.
    // Hilbert vs Morton at 3 dims: same rows, same file count, laid
    // out by Catalog.optimize under each curve; footer-stats pruning
    // measured on box/slab predicates at several selectivities. The
    // comparison documents when the Hilbert swap is worth it — its
    // unit-step locality tightens per-file envelopes on MID-CELL range
    // splits, which matters more as dimensionality rises.
    if (want("hilbert3d")) {
      import org.apache.spark.sql.functions.{xxhash64, pmod, abs => fabs}
      val n = 2000000L
      val df = spark.range(n).select(
        pmod(fabs(xxhash64(col("id"), lit(1))), lit(1000L)).as("x"),
        pmod(fabs(xxhash64(col("id"), lit(2))), lit(1000L)).as("y"),
        pmod(fabs(xxhash64(col("id"), lit(3))), lit(1000L)).as("z"))
      val root = java.nio.file.Files
        .createTempDirectory("probe_h3").toString
      val cat = new graft.catalog.Catalog(root, spark)
      cat.save(graft.core.Chain(df), "h3")
      val preds = Seq(
        "box 10%" -> (col("x") < 464L && col("y") < 464L &&
          col("z") < 464L),
        "box 1%" -> (col("x") < 215L && col("y") < 215L &&
          col("z") < 215L),
        "2d 1%" -> (col("x") < 100L && col("y") < 100L),
        "slab 5%" -> (col("x") >= 500L && col("x") < 550L))
      for (files <- Seq(64, 256); curve <- Seq("zorder", "hilbert")) {
        cat.optimize("h3", nFiles = files,
          zorderByCols = Seq("x", "y", "z"), curve = curve)
        val row = preds.map { case (nm, p) =>
          val (kept, total) = cat.pruneCount("h3", p)
          f"$nm kept $kept%3d/$total"
        }.mkString("  ")
        println(f"hilbert3d files=$files%-4d curve=$curve%-8s $row")
      }
    }

    // The case Hilbert is KEPT for, measured: on 2-D data laid out in
    // curve order, a spatial box maps to runs of CONSECUTIVE files —
    // fewer runs = fewer seeks on a range scan. For each curve: kept
    // files (prune parity) and the number of contiguous runs among the
    // kept part indexes (write order = curve order). Hilbert's unit-step
    // path should turn the same kept set into fewer, longer runs.
    if (want("hilbert2d")) {
      import org.apache.spark.sql.functions.{xxhash64, pmod, abs => fabs,
        input_file_name}
      val n = 2000000L
      val df = spark.range(n).select(
        pmod(fabs(xxhash64(col("id"), lit(1))), lit(1000L)).as("x"),
        pmod(fabs(xxhash64(col("id"), lit(2))), lit(1000L)).as("y"))
      val root = java.nio.file.Files
        .createTempDirectory("probe_h2").toString
      val cat = new graft.catalog.Catalog(root, spark)
      cat.save(graft.core.Chain(df), "h2")
      val preds = Seq(
        "box 10%" -> (col("x") < 316L && col("y") < 316L),
        "box 1%" -> (col("x") < 100L && col("y") < 100L),
        "strip 5%" -> (col("y") >= 500L && col("y") < 550L))
      def runsOf(parts: Seq[Int]): Int =
        if (parts.isEmpty) 0
        else 1 + parts.sorted.sliding(2).count {
          case Seq(a, b) => b != a + 1
          case _ => false
        }
      for (curve <- Seq("zorder", "hilbert")) {
        cat.optimize("h2", nFiles = 256, zorderByCols = Seq("x", "y"),
          curve = curve)
        val row = preds.map { case (nm, p) =>
          val kept = cat.readDatasetWhere("h2", p).toDF
            .select(input_file_name()).distinct()
            .collect().map(_.getString(0))
            .map(f => f.split('/').last.split('-')(1).toInt).toSeq
          f"$nm kept ${kept.size}%3d runs ${runsOf(kept)}%3d"
        }.mkString("  ")
        println(f"hilbert2d files=256 curve=$curve%-8s $row")
      }
    }

    if (want("manifest")) {
      import java.nio.file.{Files => JFiles}
      ks.foreach { k =>
        val files = 1280 * k
        val df = spark.range(100L * files).select(col("id").as("k1"))
          .repartitionByRange(files, col("k1"))
        val root = JFiles.createTempDirectory(s"probe_man_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        cat.save(graft.core.Chain(df), "big")
        val v1 = graft.catalog.SemVer(1, 0, 0)
        val t0 = System.nanoTime()
        val v2 = cat.restore("big", v1)
        val resSec = (System.nanoTime() - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val base = java.nio.file.Paths.get(root, "datasets", "big")
        // physical census of the restored version dir: data/ holds
        // nothing, the manifest carries everything by reference
        val w2 = JFiles.walk(base.resolve(s"v$v2").resolve("data"))
        val physical = try w2.iterator().asScala
          .count(_.toString.endsWith(".parquet")) finally w2.close()
        require(physical == 0, s"restore materialized $physical files")
        val manifest = cat.versionDataFiles("big", v2)
        require(manifest.size == files,
          s"manifest carries ${manifest.size}/$files")
        val manBytes = JFiles.size(
          base.resolve(s"v$v2").resolve("manifest.json"))
        println(f"manifest K=$k%-3d files=$files%-6d " +
          f"restore=${resSec}%.3f s  data bytes written=0  " +
          f"manifest=${manBytes / 1024} KiB  us/file=${
            resSec * 1e6 / files}%.1f")
      }
    }

    // Read cost vs MUTATION-CHAIN depth: D sequential point deletes on
    // a 64-file table, then time a full read + count the planned scan
    // nodes at the deepest version. The unpartitioned read must plan
    // ONE scan regardless of how many physical owners the manifest
    // names (the depth-365 daily-mutation shape); flattenVersion then
    // resets the owner count and the read cost must match a fresh save.
    if (want("chain")) {
      import java.nio.file.{Files => JFiles}
      ks.foreach { k =>
        val depth = 32 * k
        val files = 64
        val df = spark.range(2000L * files).select(col("id").as("k1"),
          (col("id") % 97).as("v"))
          .repartitionByRange(files, col("k1"))
        val root = JFiles.createTempDirectory(s"probe_chain_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        cat.save(graft.core.Chain(df), "t")
        val n0 = 2000L * files
        val step = n0 / (depth + 2)
        val t0 = System.nanoTime()
        (1 to depth).foreach { i =>
          cat.deleteWhere("t", col("k1") === i * step)
        }
        val mutSec = (System.nanoTime() - t0) / 1e9
        val v = cat.latestVersion("t").get
        val owners = cat.dataFilesOf("t", v)
          .map(e => (e.ds, e.v)).distinct.size
        val read = cat.readDataset("t").toDF
        val scans = read.queryExecution.executedPlan.collectLeaves()
          .collect { case f: org.apache.spark.sql.execution
            .FileSourceScanExec => f }.size
        val t1 = System.nanoTime()
        val rows = read.count()
        val readSec = (System.nanoTime() - t1) / 1e9
        require(rows == n0 - depth, s"chain lost rows: $rows")
        val t2 = System.nanoTime()
        cat.flattenVersion("t")
        val flatSec = (System.nanoTime() - t2) / 1e9
        val t3 = System.nanoTime()
        val rowsF = cat.readDataset("t").toDF.count()
        val readFlatSec = (System.nanoTime() - t3) / 1e9
        require(rowsF == rows, s"flatten lost rows: $rowsF != $rows")
        println(f"chain K=$k%-3d depth=$depth%-4d owners=$owners%-4d " +
          f"scans=$scans%-3d read=${readSec}%.2f s  " +
          f"mut=${mutSec / depth}%.3f s/commit  " +
          f"flatten=${flatSec}%.2f s  read-after=${readFlatSec}%.2f s")
      }
    }

    // exportVersion at a 10k-file version: the fanned copier (Spark job
    // past graft.export.fanThreshold) vs the driver-serial loop. The
    // verb exists to ship snapshots — at 10 TB a single driver thread
    // is a days-long copy, so the fan-out is the scale path.
    if (want("export")) {
      import java.nio.file.{Files => JFiles}
      ks.foreach { k =>
        val files = 1280 * k
        val df = spark.range(20L * files).select(col("id").as("k1"))
          .repartitionByRange(files, col("k1"))
        val root = JFiles.createTempDirectory(s"probe_exp_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        cat.save(graft.core.Chain(df), "big")
        val v1 = graft.catalog.SemVer(1, 0, 0)
        val serialDir = JFiles.createTempDirectory(s"probe_exp_s$k")
          .resolve("out")
        spark.conf.set("graft.export.fanThreshold",
          Int.MaxValue.toString)
        val t0 = System.nanoTime()
        val (nf1, b1) = cat.exportVersion("big", v1, serialDir.toString)
        val serSec = (System.nanoTime() - t0) / 1e9
        val fanDir = JFiles.createTempDirectory(s"probe_exp_f$k")
          .resolve("out")
        spark.conf.set("graft.export.fanThreshold", "64")
        val t1 = System.nanoTime()
        val (nf2, b2) = cat.exportVersion("big", v1, fanDir.toString)
        val fanSec = (System.nanoTime() - t1) / 1e9
        spark.conf.unset("graft.export.fanThreshold")
        require((nf1, b1) == (nf2, b2), s"parity: $nf1/$b1 vs $nf2/$b2")
        println(f"export K=$k%-3d files=$files%-6d " +
          f"serial=${serSec}%.2f s  fanned=${fanSec}%.2f s  " +
          f"speedup=${serSec / fanSec}%.1fx  bytes=${b1 / 1024 / 1024} MiB")
      }
    }

    // fsck wall cost vs catalog size: the advertised contract is
    // metadata-only (one stat per manifest-referenced file + one index
    // census per parquet-tier version), so the curve must be linear in
    // files with a tiny constant — cheap enough to run at vacuum cadence.
    if (want("fsck")) {
      import java.nio.file.{Files => JFiles}
      ks.foreach { k =>
        val files = 1280 * k
        val df = spark.range(20L * files).select(col("id").as("k1"))
          .repartitionByRange(files, col("k1"))
        val root = JFiles.createTempDirectory(s"probe_fsck_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        cat.save(graft.core.Chain(df), "big")
        // one cow mutation → a manifest version whose entries fsck must
        // resolve cross-owner, the probe's dominant stat loop
        cat.deleteWhere("big", col("k1") < 20L * files / 100)
        cat.save(graft.core.Chain(df.limit(100)), "side")
        val t0 = System.nanoTime()
        val findings = cat.fsck()
        val sec = (System.nanoTime() - t0) / 1e9
        require(findings.isEmpty, s"clean catalog: $findings")
        val perFile = sec * 1e6 / files
        println(f"fsck K=$k%-3d files=$files%-6d wall=${sec}%.3f s  " +
          f"(${perFile}%.1f us/file)")
      }
    }

    // Chunk-level incremental dedup at K×-growing HISTORY (the
    // steady-state shape: a fixed daily batch against an accumulated
    // corpus). Cost drivers: one chunking pass per side + an equi-join
    // on the chunk key + one grouped stats pass — expected to grow
    // (sub-)linearly in history, never quadratically, with the batch's
    // kept/dropped split invariant to K (copies of ROUND-0 docs stay
    // caught no matter how much unrelated history accumulates).
    if (want("chunkdedup")) {
      val base = docs // (doc_id, text) cached above
      val nBase = base.count()
      ks.foreach { k =>
        val history = base.crossJoin(
            spark.range(k).select(col("id").as("__c")))
          .select((col("doc_id") * k + col("__c")).as("doc_id"),
            when(col("__c") === 0, col("text"))
              .otherwise(concat(lit("v"), col("__c"), lit(" "),
                col("text"))).as("text"))
        val batch = base.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(expr("substr(text, 1, length(text) - 5)"),
              lit(" tail edited now")).as("text"))
          .unionByName(base.filter(col("doc_id") % 9 === 4)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              translate(col("text"), "aeiou", "01234").as("text")))
        val t0 = System.nanoTime()
        val kept = graft.ops.Dedup.subtractSeenChunks(batch, history,
          "text", "doc_id", k = 8, divisor = 32).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val nBatch = batch.count()
        println(f"chunkdedup K=$k%-3d histDocs=${nBase * k}%-8d " +
          f"batch=$nBatch%-6d kept=$kept%-6d wall=${sec}%.2f s")
      }
    }

    // Index carry on mutation: a K×-growing version carrying BOTH
    // parquet-tier indexes (stats/ + blooms/) takes a narrow-band
    // delete. The carried re-index is O(touched) — its wall time must
    // sit well under the retired whole-tree rebuild (timed beside it on
    // the same new version) and grow far slower than the file count.
    if (want("idxcarry")) {
      import java.nio.file.{Files => JFiles}
      val prevB = spark.conf.getOption("graft.bloom.inlineMaxFiles")
      try {
        spark.conf.set("graft.bloom.inlineMaxFiles", "0")
        ks.foreach { k =>
          val files = 640 * k
          val rows = 200L * files
          val df = spark.range(rows).select(col("id").as("k1"),
              concat(lit("u"), col("id")).as("k2"))
            .repartitionByRange(files, col("k1"))
          val root = JFiles.createTempDirectory(s"probe_idx_$k").toString
          val cat = new graft.catalog.Catalog(root, spark)
          cat.save(graft.core.Chain(df), "big", bloomCols = Seq("k2"))
          val t0 = System.nanoTime()
          val d = cat.deleteWhere("big", col("k1") <= rows / 64)
          val mutSec = (System.nanoTime() - t0) / 1e9
          // whole-rebuild comparator over the BASE version's physical
          // tree (the mutated version's own dir holds only the rewrite
          // output now — its full census lives in the manifest)
          val dataDir = java.nio.file.Paths.get(root, "datasets", "big",
            "v1.0.0", "data").toString
          val cmp = JFiles.createTempDirectory(s"probe_idx_cmp_$k")
          val t1 = System.nanoTime()
          graft.catalog.FileStats.writeStatsIndex(spark, dataDir,
            cmp.resolve("stats").toString)
          graft.catalog.FileStats.writeBloomIndex(spark, dataDir,
            Seq("k2"), 100000L, cmp.resolve("blooms").toString)
          val rebuildSec = (System.nanoTime() - t1) / 1e9
          println(f"idxcarry K=$k%-3d files=$files%-6d " +
            f"mutate(carried)=${mutSec}%.2f s " +
            f"(rw=${d.filesRewritten} ln=${d.filesReused})  " +
            f"whole-rebuild=${rebuildSec}%.2f s")
        }
      } finally {
        prevB match {
          case Some(v) => spark.conf.set("graft.bloom.inlineMaxFiles", v)
          case None => spark.conf.set("graft.bloom.inlineMaxFiles", "32")
        }
      }
    }

    // Parquet stats tier, read side: a K×-growing MANY-FILE version
    // (1280..10240 files, well past graft.stats.inlineMaxFiles=512) is
    // pruned two ways — the distributed path (predicate compiled to
    // PPred, envelope test cogrouped over the stats/ index on the
    // executors, only kept file NAMES collected) vs the driver collect
    // path (every stat row materialized, mayMatch looped). Evidence:
    // identical prune decisions, and the driver-resident bytes of what
    // each path collects (SizeEstimator) — the distributed path's
    // footprint is O(kept names) and stays ~flat in file count.
    if (want("statstier")) {
      import java.nio.file.{Files => JFiles}
      ks.foreach { k =>
        val files = 1280 * k
        val rows = 1000L * files
        val df = spark.range(rows)
          .select(col("id").as("k1"), (col("id") % 97).as("k2"))
          .repartitionByRange(files, col("k1"))
        val root = JFiles.createTempDirectory(s"probe_stt_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val tS = System.nanoTime()
        cat.save(graft.core.Chain(df), "big")
        val saveSec = (System.nanoTime() - tS) / 1e9
        val v = cat.latestVersion("big").get
        val pred = col("k1") <= rows / 64
        // distributed (default on)
        spark.conf.set("graft.stats.distributedPrune", "true")
        val t0 = System.nanoTime()
        val (kept, total) = cat.pruneCount("big", pred)
        val distSec = (System.nanoTime() - t0) / 1e9
        // driver collect path (parity + footprint comparison)
        spark.conf.set("graft.stats.distributedPrune", "false")
        val t1 = System.nanoTime()
        val (keptD, totalD) = cat.pruneCount("big", pred)
        val drvSec = (System.nanoTime() - t1) / 1e9
        require((kept, total) == (keptD, totalD),
          s"tier parity: ($kept,$total) != ($keptD,$totalD)")
        // what each path leaves resident on the driver
        val drvStats = cat.fileStatsFor("big", v, Some(Seq("k1")))
        val drvBytes = org.apache.spark.util.SizeEstimator.estimate(drvStats)
        val keptNames = drvStats.filter(s =>
          graft.catalog.FileStats.evalMay(graft.catalog.FileStats.compile(
            org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
              org.apache.spark.sql.catalyst.expressions.AttributeReference(
                "k1", org.apache.spark.sql.types.LongType)(),
              org.apache.spark.sql.catalyst.expressions.Literal(rows / 64))),
            s, Map.empty)).map(_.file)
        val keptBytes = org.apache.spark.util.SizeEstimator.estimate(keptNames)
        spark.conf.unset("graft.stats.distributedPrune")
        val t2 = System.nanoTime()
        val pruned = cat.readDatasetWhere("big", pred).toDF.count()
        val readSec = (System.nanoTime() - t2) / 1e9
        require(pruned == rows / 64 + 1, s"pruned read rows: $pruned")
        println(f"statstier K=$k%-3d files=$files%-6d save(+index)=${saveSec}%.1f s  " +
          f"prune dist=${distSec}%.2f s vs driver=${drvSec}%.2f s " +
          f"(kept $kept/$total)  driver-resident: collect=${drvBytes / 1024}%d KiB " +
          f"vs kept-names=${keptBytes / 1024}%d KiB  pruned read ${readSec}%.2f s")
      }
    }

    // mergeInto with a LARGE source (no key collect — keyCollectMax=0
    // forces the envelope-binned probe): the classic upsert shape,
    // ~60k source rows updating a narrow low band + inserting brand-new
    // high keys, against a K×-growing range-laid table. The claim: files
    // rewritten track the BAND + the inserts, not the table, so merge
    // wall time stays ~flat while the table grows 8×.
    if (want("mergelarge")) {
      import java.nio.file.{Files => JFiles}
      val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val span = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
      ks.foreach { k =>
        val root = JFiles.createTempDirectory(s"probe_mrgl_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val amplified = orders
          .crossJoin(spark.range(k).select(col("id").as("__c")))
          .select((col("o_orderkey") + col("__c") * span).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8 * k, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
        cat.save(graft.core.Chain(amplified), "ord")
        val updates = orders.filter(col("o_orderkey") <= span / 16)
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 2).as("o_totalprice"))
        val inserts = orders.filter(col("o_orderkey") % 3 === 0)
          .select((col("o_orderkey") + span * k + 1000000L).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
        val src = updates.unionByName(inserts)
        val nSrc = src.count()
        val t0 = System.nanoTime()
        val m = cat.mergeInto("ord", src, Seq("o_orderkey"),
          keyCollectMax = 0)
        val sec = (System.nanoTime() - t0) / 1e9
        require(m.rowsMatched > 0 && m.rowsInserted > 0, s"upsert shape: $m")
        println(f"mergelarge K=$k%-3d tableRows=${150000L * k}%-9d " +
          f"files=${8 * k}%-4d srcRows=$nSrc%-7d merge=${sec}%.2f s " +
          f"(rw=${m.filesRewritten} ln=${m.filesReused} " +
          f"matched=${m.rowsMatched} ins=${m.rowsInserted})")
        // STRING-keyed twin through the binned envelope arm (cap=0
        // forces it even at probe file counts): same upsert shape, same
        // flat files-rewritten claim — the probe that used to document
        // the >1024-file touch-everything loss
        def skey(c: org.apache.spark.sql.Column) =
          concat(lit("s3://bucket/key/"), format_string("%012d", c))
        val amplifiedS = amplified
          .select(skey(col("o_orderkey")).as("okey"), col("o_custkey"),
            col("o_totalprice"))
          .repartitionByRange(8 * k, col("okey"))
          .sortWithinPartitions("okey")
        cat.save(graft.core.Chain(amplifiedS), "ordstr")
        val srcS = src.select(skey(col("o_orderkey")).as("okey"),
          col("o_custkey"), col("o_totalprice"))
        val prevCap = sys.props.get("graft.env.stringNestedLoopMax")
        sys.props("graft.env.stringNestedLoopMax") = "0"
        val (mS, secS) =
          try {
            val t1 = System.nanoTime()
            val r = cat.mergeInto("ordstr", srcS, Seq("okey"),
              keyCollectMax = 0)
            (r, (System.nanoTime() - t1) / 1e9)
          } finally prevCap match {
            case Some(v) => sys.props("graft.env.stringNestedLoopMax") = v
            case None => sys.props.remove("graft.env.stringNestedLoopMax")
          }
        require(mS.rowsMatched == m.rowsMatched &&
          mS.rowsInserted == m.rowsInserted,
          s"string twin diverged: $mS vs $m")
        println(f"mergelarge K=$k%-3d STRING keys (binned arm)          " +
          f"srcRows=$nSrc%-7d merge=${secS}%.2f s " +
          f"(rw=${mS.filesRewritten} ln=${mS.filesReused})")
      }
    }

    // Change data feed on a HIGH-CHURN trail: four band-targeted
    // mutations (fixed churn volume) against a K×-growing base, then
    // both CDF reads — the two-version NET diff and the per-commit
    // range feed. The claim: the diff reads only each hop's UNSHARED
    // file pairs (hard-linked carries skip), so feed cost tracks the
    // churn, not the table — ~flat across 8× base growth.
    if (want("cdfchurn")) {
      import java.nio.file.{Files => JFiles}
      val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val span = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
      ks.foreach { k =>
        val root = JFiles.createTempDirectory(s"probe_cdf_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val amplified = orders
          .crossJoin(spark.range(k).select(col("id").as("__c")))
          .select((col("o_orderkey") + col("__c") * span).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8 * k, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
        val v1 = cat.save(graft.core.Chain(amplified), "ord")
        // fixed-size churn: each hop touches one narrow low band
        (0 until 4).foreach { i =>
          val lo = i.toLong * span / 64
          val hi = lo + span / 128
          if (i % 2 == 0)
            cat.deleteWhere("ord",
              col("o_orderkey") > lo && col("o_orderkey") <= hi)
          else
            cat.updateWhere("ord",
              col("o_orderkey") > lo && col("o_orderkey") <= hi,
              Map("o_totalprice" -> (col("o_totalprice") + lit(1.0))))
        }
        val vN = cat.latestVersion("ord").get
        val t0 = System.nanoTime()
        val net = graft.delta.Delta.readChanges(cat, "ord", v1, vN,
          Seq("o_orderkey")).toDF.count()
        val netSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val perCommit = graft.delta.Delta.readChangesRange(cat, "ord",
          v1, vN, Seq("o_orderkey")).toDF.count()
        val rangeSec = (System.nanoTime() - t1) / 1e9
        println(f"cdfchurn K=$k%-3d tableRows=${150000L * k}%-9d " +
          f"files=${8 * k}%-4d net-diff $net%-7d rows ${netSec}%.2f s   " +
          f"per-commit feed $perCommit%-7d rows ${rangeSec}%.2f s")
      }
    }

    // Persisted-IVF batch query throughput: one index build over a
    // K×-growing corpus, then 64-query batches through searchIndex
    // (routing collect ≤ 64×nprobe rows; the index read prunes to the
    // probed centroid bands via footer stats). Evidence: batch latency
    // vs the brute-force scan, and a second warm batch (the amortized
    // steady state a query service runs at).
    if (want("annindexq")) {
      import java.nio.file.{Files => JFiles}
      import graft.ops.Similarity
      val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select("vec_id", "embedding").cache()
      val nEmb = emb.count()
      val queries = emb.filter(col("vec_id") < 64)
        .select(col("vec_id").as("query_id"), col("embedding")).cache()
      queries.count()
      ks.foreach { k =>
        val corpus = emb.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("vec_id") * k + col("__copy")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (pmod(col("__copy") * 31 + i, lit(7)) - lit(3))
                .cast("float") * lit(0.01f)).as("embedding"))
        val root = JFiles.createTempDirectory(s"probe_aiq_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val tB = System.nanoTime()
        Similarity.saveIndex(cat, "idx", corpus, nlist = 32, nFiles = 32)
        val buildSec = (System.nanoTime() - tB) / 1e9
        val t0 = System.nanoTime()
        val n1 = Similarity.searchIndex(cat, "idx", queries, k = 5,
          nprobe = 4).count()
        val coldSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Similarity.searchIndex(cat, "idx", queries, k = 5, nprobe = 4)
          .count()
        val warmSec = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        Similarity.bruteForceTopK(corpus, queries, 5).count()
        val bruteSec = (System.nanoTime() - t2) / 1e9
        require(n1 == 64 * 5, s"64 queries x top-5: $n1")
        println(f"annindexq K=$k%-3d vecs=${nEmb * k}%-8d " +
          f"build=${buildSec}%.1f s  batch64 cold=${coldSec}%.2f s " +
          f"warm=${warmSec}%.2f s  brute=${bruteSec}%.2f s " +
          f"(${bruteSec / warmSec}%.1fx)")
      }
    }

    // MatView refresh: FIXED change volume against a K×-growing base.
    // The claim under test is O(changes): the file-level CDF diff reads
    // only churned files and the additive path never rescans the source,
    // so refresh wall time should stay ~flat while the base (rows and
    // files) grows 8× — the 100 TB daily-refresh story.
    if (want("matview")) {
      import java.nio.file.{Files => JFiles}
      val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      val span = orders.agg(max("o_orderkey")).head().getLong(0) + 1L
      ks.foreach { k =>
        val root = JFiles.createTempDirectory(s"probe_mv_$k").toString
        val cat = new graft.catalog.Catalog(root, spark)
        val amplified = orders
          .crossJoin(spark.range(k).select(col("id").as("__c")))
          .select((col("o_orderkey") + col("__c") * span).as("o_orderkey"),
            col("o_custkey"), col("o_totalprice"))
          .repartitionByRange(8 * k, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey")
        cat.save(graft.core.Chain(amplified), "ord")
        val tC = System.nanoTime()
        graft.delta.MatView.create(cat, "mv", "ord", Seq("o_orderkey"),
          Seq("o_custkey"), Seq(
            graft.delta.MvAgg("n", "count", "*"),
            graft.delta.MvAgg("rev", "sum", "o_totalprice")))
        val createSec = (System.nanoTime() - tC) / 1e9
        // fixed churn regardless of K: one low-key band (≲1 file wide)
        cat.deleteWhere("ord", col("o_orderkey") <= span / 64)
        val t0 = System.nanoTime()
        val r = graft.delta.MatView.refresh(cat, "mv")
        val refSec = (System.nanoTime() - t0) / 1e9
        println(f"matview K=$k%-3d rows=${150000L * k}%-9d " +
          f"create=${createSec}%.2f s  refresh=${refSec}%.2f s " +
          f"(${r.mode}, dirty=${r.dirtyGroups} up=${r.upserted} " +
          f"del=${r.deleted})")
      }
    }

    // Content-defined chunking at K×: the split is a pure projection
    // (no shuffle) and the share stats are ONE exchange on the chunk
    // key — time should track corpus size linearly, never candidates²
    if (want("cdc")) {
      ks.foreach { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            // half the copies keep the original text (planted passage
            // reuse), half get a distinct tail (unique chunks)
            when(col("__copy") % 2 === 0, col("text"))
              .otherwise(concat(col("text"), lit(" tail v"), col("__copy")))
              .as("text"))
        val t0 = System.nanoTime()
        val stats = graft.ops.Cdc.cdcShareStats(corpus, "doc_id", "text",
          k = 8, divisor = 64)
        val agg = stats.agg(sum("n_chunks"), sum("n_shared")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"cdc K=$k%-3d docs=${5000L * k}%-8d " +
          f"chunks=${agg.getLong(0)}%-9d shared=${agg.getLong(1)}%-9d " +
          f"${sec}%.2f s")
      }
    }
    // Winnow near-dup at growing corpus: every copy keeps the original
    // text's fingerprints (content-based grams ignore the tail tag), so
    // UNCAPPED pairing would grow quadratically in K. The probe pins the
    // production posture: the maxDocsPerFp cap bounds every posting, so
    // wall time tracks the LINEAR fingerprint projection while the pair
    // stage stays bounded — the same hot-key story as the MinHash bucket
    // cap, measured.
    if (want("winnow")) {
      ks.foreach { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val pairs = graft.ops.Winnow.nearDup(corpus, "doc_id", "text",
          k = 9, w = 12, minJaccard = 0.65, maxDocsPerFp = 200)
        val n = pairs.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val fps = graft.ops.Winnow.fingerprints(corpus, "doc_id", "text",
          k = 9, w = 12).count()
        println(f"winnow K=$k%-3d docs=${5000L * k}%-8d fps=$fps%-9d " +
          f"pairs=$n%-9d ${sec}%.2f s")
      }
    }

    // BPE at growing corpus: training cost is bounded by the VOCABULARY
    // (driver loop over the word-frequency table — flat in K by
    // construction), encoding is a linear projection with the per-JVM
    // word memo. The probe separates the two timings.
    if (want("bpe")) {
      ks.foreach { k =>
        val corpus = docs.crossJoin(
            spark.range(k).select(col("id").as("__copy")))
          .select((col("doc_id") * k + col("__copy")).as("doc_id"),
            concat(col("text"), lit(" v"), col("__copy")).as("text"))
        val t0 = System.nanoTime()
        val model = graft.ops.Bpe.trainOn(corpus, "text", numMerges = 16)
        val trainSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val nTok = graft.ops.Bpe.tokenize(corpus, "doc_id", "text", model)
          .count()
        val encSec = (System.nanoTime() - t1) / 1e9
        println(f"bpe K=$k%-3d docs=${5000L * k}%-8d tokens=$nTok%-10d " +
          f"train ${trainSec}%.2f s  encode ${encSec}%.2f s")
      }
      // merge-count scaling on a FIXED word table: the incremental
      // trainer's per-merge cost must stay flat-ish as the vocabulary
      // grows (the naive recount paid the whole word table per merge —
      // linear in merges × corpus, intractable at 32k). The docs
      // fixture's vocabulary saturates at ~90 merges, so the curve
      // runs on a deterministic synthetic Zipf table with enough
      // symbol diversity to sustain thousands of merges; the naive
      // trainer is timed once at the small end as the comparator.
      val rnd = new scala.util.Random(42)
      val wc = (0 until 100000).map { i =>
        val len = 3 + rnd.nextInt(10)
        val w = Array.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
        (w, 1L + 1000000L / (i + 1))
      }
      val tN = System.nanoTime()
      graft.ops.Bpe.trainNaive(wc, 64)
      val naiveSec = (System.nanoTime() - tN) / 1e9
      println(f"bpe merges=64    naive-recount train ${naiveSec}%.2f s  " +
        f"ms/merge=${naiveSec * 1000 / 64}%.2f")
      Seq(64, 512, 2048, 8192).foreach { m =>
        val t0 = System.nanoTime()
        val merges = graft.ops.Bpe.train(wc, m)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"bpe merges=$m%-5d learned=${merges.size}%-5d " +
          f"train ${sec}%.2f s  ms/merge=${sec * 1000 / merges.size}%.2f")
      }
    }
    spark.stop()
  }
}
