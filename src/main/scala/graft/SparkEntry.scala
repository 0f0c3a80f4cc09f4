package graft

import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Chain
import graft.catalog.{Catalog, Expect, ExpectFailed}
import graft.delta.{Delta, MatView, MvAgg}
import graft.files.FileOps
import graft.functions.GraftFunctions._
import graft.ops.{Cdc, Corpus, Dedup, Multimodal, Similarity, Split, TextAnalysis, Winnow}
import graft.streaming.EventStream

// ---- typed-UDF row models (top-level for Encoder derivation) ----
case class ValRow(id: Long, name: String, score: Double)
case class PartIn(p_partkey: Long, p_name: String)
case class PartOut(p_partkey: Long, rev_name: String, name_len: Long)
case class WordOut(p_partkey: Long, word: String)
case class LineIn(l_orderkey: Long, l_linenumber: Int, l_returnflag: String,
                  l_linestatus: String, l_extendedprice: Double)
case class TopOut(l_returnflag: String, l_linestatus: String,
                  l_orderkey: Long, l_extendedprice: Double, rk: Long)

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 that is SQL-expressible carries a DuckDB
  * oracle; approximate / hash-specific / side-effecting operators are
  * rows-only and additionally golden-tested in ScalaTest.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped as TIMESTAMP(NANOS) (readable only ns-as-long,
    * converted exactly to micros) and as native timestamp[us] (read as
    * TIMESTAMP_NTZ). Normalize either encoding to session-UTC TimestampType
    * so every events query sees one wall-clock-identical column type. */
  private def normTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  private def E(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normTs(T(s, dir, "events"))
  }

  private def C(s: SparkSession, dir: String, name: String): Chain =
    Chain.readParquet(s, s"$dir/$name.parquet")

  /** The streaming file source wants a DIRECTORY: stage a temp dir
    * holding a symlink to the single testdata parquet. */
  private def stageStreamDir(dir: String, table: String): String = {
    val stage = Files.createTempDirectory("graft_stage")
    Files.createSymbolicLink(stage.resolve(s"$table.parquet"),
      java.nio.file.Paths.get(s"$dir/$table.parquet"))
    stage.toString
  }

  /** Run a complete-mode streaming query to quiescence and return its
    * memory-sink table. State-store instances scale with shuffle
    * partitions; for gate-sized state, fewer+bigger state partitions
    * commit far faster (each partition fsyncs its own delta file per
    * batch) — on a real cluster this is sized to state volume, not core
    * count. The conf is saved/restored around the run; the query name
    * derives from a logical-shift random (never negative, unlike
    * math.abs at Int.MinValue). */
  private def runCompleteGate(s: SparkSession, stream: DataFrame,
                              prefix: String): DataFrame = {
    val ckpt = Files.createTempDirectory(s"${prefix}_ckpt").toString
    val qn = prefix + "_" + (scala.util.Random.nextInt() >>> 1)
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try graft.streaming.EventStream.runCompleteNow(stream, qn, ckpt)
    finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(qn)
  }

  /** Exact decimal sum surfaced as double — deterministic across engines
    * (plain double sums are order-dependent). */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
  private def davg(c: Column): Column =
    sum(c.cast("decimal(18,4)")).cast("double") / count(lit(1))

  /** The chunk-dedup fixture batch shared by q_subtract_seen_chunks and
    * q_stream_chunk_dedup: tail-edited re-crawls of history docs
    * (+300000 — prefix chunks match, DROPPED) and vowel-rewritten
    * fresh docs (+400000 — no chunk matches, KEPT). ONE construction so
    * the two gates can't drift. */
  private def chunkDedupBatch(s: SparkSession, dir: String): DataFrame = {
    val hist = T(s, dir, "documents").select(col("doc_id"), col("text"))
    val edited = hist.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(expr("substr(text, 1, length(text) - 5)"),
          lit(" tail edited now")).as("text"))
    val fresh = hist.filter(pmod(col("doc_id"), lit(9)) === 4)
      .select((col("doc_id") + 400000).as("doc_id"),
        translate(col("text"), "aeiou", "01234").as("text"))
    edited.unionByName(fresh)
  }

  /** The shared DuckDB oracle of both chunk-dedup gates (per-doc
    * decisions are micro-batch-split-invariant, so the streaming gate
    * answers identically). The final LEFT JOIN keeps zero-chunk
    * (empty-text) batch docs, matching subtractSeenChunks' documented
    * keep-unmeasurable rule — an inner join would silently drop them
    * if the fixture ever grew an empty text. */
  /** Shared winnow-oracle CTE chain (k=9, w=12, W=31 powers spelled
    * out): `corpus(doc_id, text)` → gram hashes `g` → per-doc gram
    * count `n` → window starts `w0` (a doc with fewer than w grams is
    * ONE window over all of them, greatest(...,1)) → window rows `win`
    * → per-window min `m` → rightmost-min selection `sel(doc_id, pos,
    * fp)`. Exact int64 throughout (k=9 bound holds even astral), so
    * both winnow gates replay the kernel verbatim. */
  private val winnowSelCtes: String =
    """ g AS (SELECT doc_id, i,
      |   (CAST(ord(substr(text, i,   1)) AS BIGINT) * 852891037441
      |  + CAST(ord(substr(text, i+1, 1)) AS BIGINT) * 27512614111
      |  + CAST(ord(substr(text, i+2, 1)) AS BIGINT) * 887503681
      |  + CAST(ord(substr(text, i+3, 1)) AS BIGINT) * 28629151
      |  + CAST(ord(substr(text, i+4, 1)) AS BIGINT) * 923521
      |  + CAST(ord(substr(text, i+5, 1)) AS BIGINT) * 29791
      |  + CAST(ord(substr(text, i+6, 1)) AS BIGINT) * 961
      |  + CAST(ord(substr(text, i+7, 1)) AS BIGINT) * 31
      |  + CAST(ord(substr(text, i+8, 1)) AS BIGINT)) AS h
      |  FROM corpus,
      |    LATERAL unnest(generate_series(1, length(text) - 8)) AS t(i)
      |  WHERE length(text) >= 9),
      | n AS (SELECT doc_id, max(i) AS gmax FROM g GROUP BY 1),
      | w0 AS (SELECT doc_id, t.ws FROM n,
      |   LATERAL unnest(generate_series(1, greatest(gmax - 11, 1))) AS t(ws)),
      | win AS (SELECT w0.doc_id, w0.ws, g.i, g.h FROM w0 JOIN g
      |   ON g.doc_id = w0.doc_id AND g.i BETWEEN w0.ws AND w0.ws + 11),
      | m AS (SELECT doc_id, ws, min(h) AS fp FROM win GROUP BY 1, 2),
      | sel AS (SELECT win.doc_id, max(win.i) AS pos, m.fp
      |   FROM win JOIN m ON win.doc_id = m.doc_id AND win.ws = m.ws
      |     AND win.h = m.fp
      |   GROUP BY win.doc_id, win.ws, m.fp)""".stripMargin

  /** Unrolled BPE training + encode oracle (k merges, whitespace
    * words). One merge application is a PURE list expression —
    * matches `mt` = positions of the pair, `kept` = greedy LTR
    * non-overlap via run parity (p - first-index-of-run even), rebuild
    * fuses kept positions and drops their right halves — so stage k is
    * a plain projection and the argmax a plain aggregate: no recursion
    * (DuckDB's chained recursive CTEs mis-evaluate; see the gate
    * comment), every merge and token re-derived exactly. MATERIALIZED
    * keeps the k-stage chain linear instead of re-inlining f_{k-1}
    * into each of its two consumers. A stage whose mm is empty (the
    * corpus ran out of adjacent pairs) passes f_{k-1} through
    * unchanged — mirroring Bpe.train's early stop, so the gate
    * survives a regenerated fixture with a tiny vocabulary. */
  /** The K unrolled BPE merge stages (pick the max-count pair with the
    * UTF-8 tie-break, apply it greedily LTR via the run-parity trick)
    * over a caller-provided `wf(word, cnt)` + `f0(word, syms)` header
    * — shared by the whitespace and byte-level train oracles. */
  private def bpeStageCtes(k: Int): String = {
    def pick(j: Int): String =
      s""" p$j AS (SELECT s.syms[i] AS a, s.syms[i+1] AS b, sum(wf.cnt) AS c
         |   FROM f${j - 1} s JOIN wf USING (word),
         |     unnest(range(1, len(s.syms))) AS t(i)
         |   GROUP BY 1, 2),
         | mm$j AS MATERIALIZED (
         |   SELECT a, b FROM p$j ORDER BY c DESC, a, b LIMIT 1)""".stripMargin
    def apply(j: Int): String =
      s""" n$j AS (SELECT word, syms,
         |    list_filter(range(1, len(syms)), i -> syms[i] = mm.a
         |      AND syms[i+1] = mm.b) AS mt
         |   FROM f${j - 1}, mm$j AS mm),
         | kp$j AS (SELECT word, syms,
         |    list_filter(mt, (x, p) ->
         |      (p - list_position(list_transform(mt, (y, q) -> y - q),
         |         x - p)) % 2 = 0) AS kept
         |   FROM n$j),
         | f$j AS MATERIALIZED (SELECT word,
         |    [y for y in list_transform(range(1, len(syms) + 1), j ->
         |       CASE WHEN list_contains(kept, j) THEN syms[j] || syms[j+1]
         |            WHEN list_contains(kept, j - 1) THEN NULL
         |            ELSE syms[j] END) if y IS NOT NULL] AS syms
         |   FROM kp$j
         |   UNION ALL
         |   SELECT word, syms FROM f${j - 1}
         |   WHERE NOT EXISTS (SELECT 1 FROM mm$j))""".stripMargin
    (1 to k).map(j => pick(j) + ",\n" + apply(j)).mkString(",\n")
  }

  private def bpeTrainCtes(k: Int): String =
    s""" wf AS MATERIALIZED (SELECT w AS word, count(*) AS cnt FROM (
       |   SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
       |     x -> x != '')) AS w
       |   FROM documents) GROUP BY 1),
       | f0 AS (SELECT word,
       |   [x for x in string_split_regex(word, '')] AS syms FROM wf),
       |${bpeStageCtes(k)}""".stripMargin

  /** GPT-2 byte→char mapping as pure SQL arithmetic (the
    * bytes_to_unicode rule: printable bytes keep their codepoint, the
    * rest get 256 + their index among non-printables — counted as
    * b minus the printables below b). */
  private val bpeByteMapSql: String =
    """chr(CAST(CASE WHEN (b BETWEEN 33 AND 126) OR (b BETWEEN 161 AND 172)
      |      OR (b BETWEEN 174 AND 255) THEN b
      |    ELSE 256 + b - (least(greatest(b-33,0),94)
      |      + least(greatest(b-161,0),12)
      |      + least(greatest(b-174,0),82)) END AS INTEGER))""".stripMargin

  /** The RE2-safe GPT-2-style pre-tokenization pattern as a DuckDB
    * string literal (apostrophe doubled). Must stay equal to
    * [[graft.ops.Bpe.Gpt2ishPatternStr]]. */
  private val bpePreTokPatSql: String =
    "''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BYTE-LEVEL train replay over a `corpus(doc_id, text)` CTE:
    * GPT-2-style regex pre-tokens counted corpus-wide, each word's
    * chars expanded to UTF-8 bytes ARITHMETICALLY (no blob ops — pure
    * codepoint math both engines share), bytes mapped through the
    * bytes_to_unicode rule, then the same K unrolled merge stages as
    * the whitespace oracle. Also emits `voc(token, id)` — byte
    * alphabet 0-255 plus 255+j per learned merge (min id on fused-
    * string collision) — and `nmerges` (learned merge count). */
  private def bpeByteTrainCtes(k: Int): String = {
    val stages = bpeStageCtes(k)
    val mergeRows = (1 to k).map(j =>
      s"SELECT a || b AS token, 255 + $j AS id FROM mm$j")
      .mkString("\n   UNION ALL ")
    s""" wf AS MATERIALIZED (SELECT w AS word, count(*) AS cnt FROM (
       |   SELECT unnest(regexp_extract_all(text, '$bpePreTokPatSql')) AS w
       |   FROM corpus) GROUP BY 1),
       | wch AS (SELECT word, i, ord(string_split_regex(word, '')[i]) AS cp
       |   FROM wf, unnest(range(1, length(word) + 1)) AS t(i)),
       | wby AS (SELECT word, i,
       |   CASE WHEN cp < 128 THEN [cp]
       |        WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
       |        WHEN cp < 65536 THEN [224 + cp // 4096,
       |          128 + (cp // 64) % 64, 128 + cp % 64]
       |        ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
       |          128 + (cp // 64) % 64, 128 + cp % 64] END AS bs
       |   FROM wch),
       | f0 AS MATERIALIZED (SELECT word, flatten(list(mapped ORDER BY i))
       |     AS syms
       |   FROM (SELECT word, i,
       |     list_transform(bs, b -> $bpeByteMapSql) AS mapped FROM wby)
       |   GROUP BY word),
       |$stages,
       | voc AS (SELECT token, min(id) AS id FROM (
       |   SELECT $bpeByteMapSql AS token, b AS id FROM range(0, 256) t(b)
       |   UNION ALL $mergeRows) GROUP BY 1),
       | nmerges AS (SELECT count(*) AS n FROM (
       |   ${(1 to k).map(j => s"SELECT a FROM mm$j")
             .mkString("\n   UNION ALL ")}))""".stripMargin
  }

  /** The winnow fixture corpus on the Spark side: base docs plus a
    * tail-edited copy of every ninth (the planted near-dups the
    * winnow_dedup/spans/runs gates detect and localize). */
  private def winnowCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(pmod(col("doc_id"), lit(9)) === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(expr("substr(text, 1, length(text) - 5)"),
          lit(" tail edited now")).as("text")))
  }

  /** The winnow-dedup fixture corpus (base docs + tail-edited copies of
    * every ninth) and the capped pair pipeline over [[winnowSelCtes]]'s
    * `m` — shared by the q_winnow_dedup and q_winnow_spans oracles. */
  private val winnowCopyCorpus: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000,
      |    substr(text, 1, length(text) - 5) || ' tail edited now'
      |  FROM documents WHERE doc_id % 9 = 0)""".stripMargin

  private val winnowPairCtes: String =
    """ fps0 AS (SELECT DISTINCT doc_id, fp FROM m),
      | df AS (SELECT fp, count(*) AS c FROM fps0 GROUP BY 1),
      | fps AS (SELECT fps0.* FROM fps0 JOIN df USING (fp)
      |   WHERE df.c <= 200),
      | sz AS (SELECT doc_id, count(*) AS n FROM fps GROUP BY 1),
      | pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    count(*) AS n_shared,
      |    any_value(sa.n) + any_value(sb.n) - count(*) AS n_union
      |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |  JOIN sz sa ON sa.doc_id = a.doc_id
      |  JOIN sz sb ON sb.doc_id = b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private val chunkDedupOracleSql: String =
    """WITH newdocs AS (
      |  SELECT doc_id + 300000 AS doc_id,
      |         substr(text, 1, length(text) - 5) || ' tail edited now' AS text
      |  FROM documents WHERE doc_id % 9 = 0
      |  UNION ALL
      |  SELECT doc_id + 400000, translate(text, 'aeiou', '01234')
      |  FROM documents WHERE doc_id % 9 = 4),
      | corpus AS (
      |  SELECT doc_id, text FROM newdocs
      |  UNION ALL SELECT doc_id, text FROM documents),
      | cand AS (SELECT doc_id, text,
      |   unnest(generate_series(8, length(text))) AS i FROM corpus),
      | cut AS (SELECT doc_id, text, i FROM cand WHERE
      |   (CAST(ord(substr(text, i-7, 1)) AS BIGINT) * 27512614111
      |  + CAST(ord(substr(text, i-6, 1)) AS BIGINT) * 887503681
      |  + CAST(ord(substr(text, i-5, 1)) AS BIGINT) * 28629151
      |  + CAST(ord(substr(text, i-4, 1)) AS BIGINT) * 923521
      |  + CAST(ord(substr(text, i-3, 1)) AS BIGINT) * 29791
      |  + CAST(ord(substr(text, i-2, 1)) AS BIGINT) * 961
      |  + CAST(ord(substr(text, i-1, 1)) AS BIGINT) * 31
      |  + CAST(ord(substr(text, i, 1)) AS BIGINT)) % 32 = 0),
      | seg AS (
      |   SELECT doc_id,
      |     substr(text, lag(i,1,0) OVER (PARTITION BY doc_id ORDER BY i) + 1,
      |            i - lag(i,1,0) OVER (PARTITION BY doc_id ORDER BY i)) AS chunk
      |   FROM cut
      |   UNION ALL
      |   SELECT c.doc_id, substr(c.text, coalesce(m.mx, 0) + 1) AS chunk
      |   FROM corpus c LEFT JOIN (SELECT doc_id, max(i) AS mx FROM cut GROUP BY 1) m
      |     ON c.doc_id = m.doc_id
      |   WHERE length(c.text) > coalesce(m.mx, 0)),
      | histch AS (SELECT DISTINCT chunk FROM seg WHERE doc_id < 300000),
      | st AS (SELECT doc_id, count(*) AS total,
      |   sum(CASE WHEN chunk IN (SELECT chunk FROM histch)
      |       THEN 1 ELSE 0 END) AS shared
      |   FROM seg WHERE doc_id >= 300000 GROUP BY 1)
      |SELECT n.doc_id, n.text FROM newdocs n LEFT JOIN st USING (doc_id)
      |WHERE st.total IS NULL OR st.shared <= st.total * 0.5""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // ======================================================================
  // Queries
  // ======================================================================

  /** Map literal with a DUPLICATE-KEY guard: Scala's Map(...) keeps
    * only the LAST entry per key, so a re-used gate name silently
    * shadows an existing gate and its oracle with zero signal (it
    * happened — q_seq_pack). Both registries build through this. */
  private def gateMap[V](pairs: (String, V)*): Map[String, V] = {
    val dup = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty, s"duplicate gate names: ${dup.mkString(", ")}")
    pairs.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = gateMap(

    // ------------------------------------------------------------ sources
    "q1_agg" -> ((s, dir) =>
      C(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupByAgg(Seq("l_returnflag", "l_linestatus"),
          "sum_qty" -> dsum(col("l_quantity")),
          "sum_base_price" -> dsum(col("l_extendedprice")),
          // decimal inputs BEFORE the multiply: a double product cast to
          // decimal rounds differently across engines at 100× scale
          "sum_disc_price" -> sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double"),
          "avg_qty" -> davg(col("l_quantity")),
          "avg_price" -> davg(col("l_extendedprice")),
          "count_order" -> count(lit(1)))
        .toDF),

    "q_read_parquet" -> ((s, dir) =>
      C(s, dir, "part")
        .filter(col("p_size") < 20)
        .select("p_partkey", "p_brand", "p_retailprice")
        .toDF),

    "q_schema_merge" -> ((s, dir) => {
      // Schema-evolution read: two snapshot generations of the same
      // dataset — the older written before a column existed — come back as
      // one frame under mergeSchema, with nulls where the old files have
      // no column (the reference's dataset versions evolve schemas the
      // same way; Spark's parquet footer merge is the engine-native path)
      val root = Files.createTempDirectory("graft_merge").toString
      val nation = T(s, dir, "nation")
      nation.filter(col("n_nationkey") < 13)
        .select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(s"$root/gen=1")
      nation.filter(col("n_nationkey") >= 13)
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode("overwrite").parquet(s"$root/gen=2")
      s.read.option("mergeSchema", "true").parquet(root)
        .select("n_nationkey", "n_name", "n_regionkey")
    }),

    "q_read_csv" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_csv").toString
      graft.io.Writers.toCsv(T(s, dir, "nation").coalesce(1), tmp,
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType)))
      Chain.readCsv(s, tmp, header = true, schema = Some(schema)).toDF
    }),

    "q_read_json" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_json").toString
      graft.io.Writers.toJsonl(T(s, dir, "region").coalesce(1), tmp,
        mode = org.apache.spark.sql.SaveMode.Overwrite)
      val schema = StructType(Seq(
        StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))
      Chain.readJson(s, tmp, Some(schema)).toDF
    }),

    "q_read_values" -> ((s, dir) => {
      import s.implicits._
      Chain.readValues(s, Seq(
        ValRow(1L, "alpha", 3.5), ValRow(2L, "beta", -1.25), ValRow(3L, "gamma", 0.0)))
        .toDF
    }),

    "q_read_records" -> ((s, dir) => {
      // read_records (untyped Row + explicit schema — the schema-dynamic
      // twin of read_values' case-class path), incl. a NULL cell and a
      // unicode string: the oracle rebuilds the same literal rows
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("score", DoubleType)))
      Chain.readRecords(s, Seq(
        org.apache.spark.sql.Row(1L, "ascii", 1.5),
        org.apache.spark.sql.Row(2L, "héllo", null),
        org.apache.spark.sql.Row(3L, null, -2.25)), schema).toDF
    }),

    "q_json_infer" -> ((s, dir) => {
      // schemaless JSONL: documents round-trip through nested JSON text,
      // read back with SAMPLE-inferred schema + jmespath descent into the
      // payload subtree — no hand-built StructType anywhere.
      val tmp = Files.createTempDirectory("graft_jsonl").toString + "/docs"
      T(s, dir, "documents").select(to_json(struct(
          struct(col("doc_id"), col("lang"), col("n_chars")).as("payload"),
          lit("v1").as("gen"))).as("value"))
        .write.mode("overwrite").text(tmp)
      Chain.readJsonInferred(s, tmp, jmespath = Some("payload"),
          sampleSize = 200)
        .toDF
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    "q_jmespath" -> ((s, dir) => {
      // extended jmespath grammar end-to-end: array FILTER + explosion +
      // MULTISELECT reshape (`p.items[?tag=='a'][*].{k:…, val:…}`)
      // compiled to pure Catalyst (filter HOF + explode + projection)
      // over a sample-inferred JSONL read; the oracle rebuilds the same
      // item rows relationally with generate_series
      val tmp = Files.createTempDirectory("graft_jmes").toString + "/docs"
      T(s, dir, "documents").filter(col("doc_id") < 400)
        .select(to_json(struct(struct(
          transform(sequence(lit(0), lit(2)), k => struct(
            k.cast("long").as("k"),
            when(pmod(col("doc_id") + k, lit(2)) === 0, lit("a"))
              .otherwise(lit("b")).as("tag"),
            (col("doc_id") * 3 + k).as("v"))).as("items")).as("p")))
          .as("value"))
        .write.mode("overwrite").text(tmp)
      Chain.readJsonInferred(s, tmp,
          jmespath = Some("p.items[?tag == 'a'][*].{k: k, tag: tag, val: v}"),
          sampleSize = 100)
        .toDF
    }),

    "q_jmespath_fns" -> ((s, dir) => {
      // jmespath FUNCTIONS + PIPES (the full-grammar residual): sort_by/
      // reverse/multiselect (the original pipe) PLUS the r10 residual set
      // — contains / starts_with / to_number / map / not_null — each as a
      // tagged single-column projection over the same inferred JSONL,
      // unioned into one frame. Every branch is pure Catalyst (HOFs +
      // try_cast), zero shuffles; the v values are scrambled mod 97 so
      // the sort is non-trivial.
      val tmp = Files.createTempDirectory("graft_jmes_fn").toString + "/docs"
      T(s, dir, "documents").filter(col("doc_id") < 400)
        .select(to_json(struct(struct(
          transform(sequence(lit(0), lit(2)), k => struct(
            k.cast("long").as("k"),
            when(pmod(col("doc_id") + k, lit(2)) === 0, lit("a"))
              .otherwise(lit("b")).as("tag"),
            pmod(col("doc_id") * 3 + k * 31, lit(97)).as("v"))).as("items"),
          concat(lit("id-"), col("doc_id")).as("sid"),
          concat((col("doc_id") * 3).cast("string"), lit(".5")).as("num"),
          array(lit("a"), lit("b"),
            concat(lit("t"), pmod(col("doc_id"), lit(7)).cast("string")))
            .as("tags"),
          array(array(col("doc_id")),
            array(col("doc_id") + 1, col("doc_id") + 2)).as("nest"),
          transform(sequence(lit(0), lit(2)), k => struct(
            struct(pmod(col("doc_id") * 7 + k * 13, lit(89)).as("s"))
              .as("m"),
            k.cast("long").as("k"))).as("nitems"),
          when(pmod(col("doc_id"), lit(2)) === 1,
            concat(lit("alt-"), col("doc_id"))).as("alt"))
          .as("p"))).as("value"))
        .write.mode("overwrite").text(tmp)
      def rd(jp: String, out: String) = {
        val df = Chain.readJsonInferred(s, tmp, jmespath = Some(jp),
          sampleSize = 100).toDF
        df.select(lit(out).as("fn"),
          col(df.columns.head).cast("string").as("out"))
      }
      Seq(
        rd("p.items | sort_by(@, &v) | reverse(@)[0].v", "pipe_max"),
        rd("p.contains(tags, 't3')", "contains"),
        rd("p.starts_with(sid, 'id-1')", "starts_with"),
        rd("p.to_number(num)", "to_number"),
        rd("p.map(&v, items)[0]", "map_first"),
        rd("p.not_null(alt, sid)", "not_null"),
        rd("p.map(&v, items) | sum(@)", "sum"),
        rd("p.items | min_by(@, &v).v", "min_by"),
        rd("p.ends_with(sid, '3')", "ends_with"),
        rd("p.nest[] | sum(@)", "flatten_sum"),
        // the r11-residual grammar: multiselect LIST, dotted &expression
        // keys, and standalone bracket ops on a piped root
        rd("p.[sid, num] | join('-', @)", "mslist"),
        rd("p.nitems | max_by(@, &m.s).k", "maxby_nested"),
        rd("p.items | sort_by(@, &v) | [0].v", "pipe_idx")
      ).reduce(_.unionAll(_))
    }),

    "q_read_database" -> ((s, dir) => {
      // REAL JDBC round-trip against embedded Derby (ships in Spark's jar
      // dir): to_database writes nation through executor-side connections,
      // read_database pulls it back as a 4-way partitioned range read (the
      // scale shape); oracle is the original table.
      System.setProperty("derby.stream.error.file", "/tmp/derby.log")
      val db = Files.createTempDirectory("graft_derby").resolve("db")
      val url = s"jdbc:derby:$db;create=true"
      val src = T(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.io.Writers.toDatabase(src, url, "nation_db")
      // Spark's JDBC writer quotes identifiers at CREATE, so Derby stores
      // them case-sensitively lowercase — the readback query must quote too.
      Chain.readDatabasePartitioned(s, url,
          """SELECT "n_nationkey", "n_name", "n_regionkey" FROM nation_db""",
          partitionColumn = "n_nationkey", lowerBound = 0L, upperBound = 25L,
          numPartitions = 4)
        .toDF
    }),

    "q_export_version" -> ((s, dir) => {
      // EXPORT materializes a zero-copy version into a portable
      // self-contained tree: the cow delete's manifest references v1
      // for the three cold files, so the export must resolve owners
      // and copy real bytes — the read goes straight at the exported
      // data dir (no catalog, no manifest), proving the tree stands
      // alone. Oracle: the surviving rows.
      val root = Files.createTempDirectory("graft_export").toString
      val cat = new Catalog(root, s)
      val n = T(s, dir, "nation")
        .repartitionByRange(4, col("n_nationkey"))
        .sortWithinPartitions("n_nationkey")
      cat.save(Chain(n), "n")
      val r = cat.deleteWhere("n", col("n_nationkey") < 5)
      require(r.filesReused > 0, s"fixture must carry files: $r")
      val dest = Files.createTempDirectory("graft_export_out")
        .resolve("snap")
      cat.exportVersion("n", r.version, dest.toString)
      s.read.parquet(dest.resolve("data").toString).drop("sys")
        .select(n.columns.map(col): _*)
    }),

    "q_flatten" -> ((s, dir) => {
      // the mutation-chain maintenance verb end-to-end: two cow deletes
      // build a multi-owner chain, flattenVersion materializes it
      // (row-identical, self-contained, layout-only), and the read of
      // the flattened latest must equal the plain double filter — with
      // the owner census proving the chain actually collapsed.
      val root = Files.createTempDirectory("graft_flatten").toString
      val cat = new Catalog(root, s)
      val d = T(s, dir, "documents").select("doc_id", "source", "n_chars")
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
      cat.save(Chain(d), "docs")
      // scale-independent bounds (doc_id is dense 0..n-1 at every sf):
      // each delete clips one tail, so the two rewrites touch DISJOINT
      // edge files and the middle carries — a multi-owner chain at any
      // corpus size
      val n = d.count()
      cat.deleteWhere("docs", col("doc_id") < n / 10)
      cat.deleteWhere("docs", col("doc_id") >= n * 9 / 10)
      val owners = cat.latestVersion("docs").map(v =>
        cat.dataFilesOf("docs", v).map(e => (e.ds, e.v)).distinct.size)
      require(owners.exists(_ >= 2), s"fixture must chain: $owners")
      val fv = cat.flattenVersion("docs")
      require(cat.dataFilesOf("docs", fv)
        .forall(e => e.ds == "docs" && e.v == fv),
        "flattened version must own every file")
      cat.readDataset("docs").toDF.drop("sys")
    }),

    "q_storage_stats" -> ((s, dir) => {
      // the manifest layer's user-facing accounting: after a
      // save → cow-delete → restore trail the dataset holds three
      // versions whose LOGICAL bytes (what every committed version
      // claims, carried files counted once per version) must exceed
      // the PHYSICAL bytes actually stored (v2 carries 7 of 8 files by
      // reference, v3 is a zero-copy restore of v1) — the sharing
      // factor is the proof the zero-copy design shares. Byte sizes
      // aren't SQL-derivable, so the gate emits the analytically
      // certain shape: version count, per-version recorded row counts,
      // and the sharing inequality (logical − physical = 2·B(v1) −
      // B(touched) > 0 by construction); CatalogSpec pins the byte
      // arithmetic exactly.
      val root = Files.createTempDirectory("graft_storage").toString
      val cat = new Catalog(root, s)
      val d = T(s, dir, "documents").select("doc_id", "source", "n_chars")
        .repartitionByRange(8, col("doc_id"))
        .sortWithinPartitions("doc_id")
      cat.save(Chain(d), "docs")
      val v1 = cat.versions("docs").head
      val r = cat.deleteWhere("docs", col("doc_id") < 50)
      require(r.filesReused > 0, s"fixture must carry files: $r")
      cat.restore("docs", v1)
      val st = cat.storageStats().filter(_._1 == "docs")
      require(st.size == 1, s"one accounting row for docs: $st")
      val (_, nv, logical, physical) = st.head
      val rows = cat.versions("docs").map(v => cat.rowsOf("docs", v))
      import s.implicits._
      Seq((nv.toLong, rows(0), rows(1), rows(2),
          logical > physical, physical > 0L))
        .toDF("versions", "v1_rows", "v2_rows", "v3_rows",
          "logical_gt_physical", "physical_positive")
    }),

    "q_fsck" -> ((s, dir) => {
      // the maintenance verb end-to-end: a healthy catalog scans
      // clean, then four planted corruptions — one per detection
      // mechanism — are each found, and nothing else is. Finding
      // strings carry non-deterministic detail (part-file UUIDs, lock
      // ages), so the gate projects the finding TYPE; datasets,
      // subjects, and severities are deterministic by construction.
      // Oracle: the literal expected findings table.
      val root = Files.createTempDirectory("graft_fsck").toString
      val cat = new Catalog(root, s)
      val n = T(s, dir, "nation")
        .repartitionByRange(4, col("n_nationkey"))
        .sortWithinPartitions("n_nationkey")
      cat.save(Chain(n), "t")
      val r = cat.deleteWhere("t", col("n_nationkey") < 5)
      require(r.filesReused > 0, s"fixture must carry files: $r")
      require(r.version.toString == "1.1.0", s"bump drifted: ${r.version}")
      cat.save(Chain(n.limit(3)), "u")
      require(cat.fsck().isEmpty, "healthy catalog must scan clean")
      val base = java.nio.file.Paths.get(root, "datasets")
      // critical: outside interference deletes a carried v1 byte —
      // v2's manifest entry now resolves to nothing
      val victim = cat.dataFilesOf("t", r.version)
        .filterNot(_.v == r.version).head
      Files.delete(base.resolve("t").resolve(s"v${victim.v}")
        .resolve("data").resolve(victim.rel))
      // critical: a self-contained version claiming rows with its data
      // dir emptied (only whole-dir loss is detectable without a manifest)
      import scala.jdk.CollectionConverters._
      val uData = base.resolve("u").resolve("v1.0.0").resolve("data")
      val w = Files.walk(uData)
      try w.iterator.asScala.filter(_.toString.endsWith(".parquet"))
        .toSeq.foreach(Files.delete)
      finally w.close()
      // warn: a crashed holder's commit lock (mtime past the stale bar)
      val lock = base.resolve("t").resolve(".commit.lock")
      Files.createFile(lock)
      Files.setLastModifiedTime(lock,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 600000L))
      // info: foreign debris posing as a version dir
      Files.createDirectories(base.resolve("t").resolve("vbackup"))
      import s.implicits._
      cat.fsck().map { case (ds, subj, finding, sev) =>
        (ds, subj, finding.split(':').head, sev) }
        .toDF("dataset", "subject", "finding", "severity")
    }),

    "q_read_database_part" -> ((s, dir) => {
      // the partitioned-ingest correctness trap, pinned: JDBC
      // lower/upperBound only shape the range predicates — they must
      // NOT filter. Bounds deliberately INSIDE the key domain and more
      // partitions than bound width: the first/last stripes absorb the
      // out-of-bounds rows, and the union must still be every supplier
      // exactly once (the 100 TB ingest shape: N executors pulling
      // range slices concurrently).
      System.setProperty("derby.stream.error.file", "/tmp/derby.log")
      val db = Files.createTempDirectory("graft_derby_p").resolve("db")
      val url = s"jdbc:derby:$db;create=true"
      val src = T(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      graft.io.Writers.toDatabase(src, url, "supplier_db")
      Chain.readDatabasePartitioned(s, url,
          """SELECT "s_suppkey", "s_name", "s_nationkey" FROM supplier_db""",
          partitionColumn = "s_suppkey",
          lowerBound = 5L, upperBound = 15L, numPartitions = 8)
        .toDF
    }),

    "q_read_hf" -> ((s, dir) => {
      // HF parquet-export bridge: stage nation as a two-split dataset dir
      // (train/validation, split by key mod 5) with hub-style denormalized
      // column names; readHf must discover both splits, prepend the split
      // column, and normalize "N-Name"/"RegionKey" → n_name/regionkey.
      val root = Files.createTempDirectory("graft_hf").toString
      val src = T(s, dir, "nation").select(col("n_nationkey"),
        col("n_name").as("N-Name"), col("n_regionkey").as("RegionKey"))
      src.filter(col("n_nationkey") % 5 =!= 0)
        .write.mode("overwrite").parquet(s"$root/train")
      src.filter(col("n_nationkey") % 5 === 0)
        .write.mode("overwrite").parquet(s"$root/validation")
      Chain.readHf(s, root).toDF
        .select("split", "n_nationkey", "n_name", "regionkey")
    }),

    "q_stream_quantiles" -> ((s, dir) => {
      // the mergeable KLL sketch running INSIDE the streaming engine: its
      // serialized buffer is the state-store payload of a windowed
      // aggregation (the same mergeability that makes it map-side-
      // combinable makes it streaming-state-safe). Exact regime at gate
      // scale (per-window n <= k), so the per-window discrete quantiles
      // reproduce row-for-row in SQL.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stream = normTs(s.readStream.schema(schema)
          .parquet(stageStreamDir(dir, "events")))
        .groupBy(window(col("ts"), "1 hour"))
        .agg(graft.functions.GraftFunctions.kll_quantiles(
          col("value").cast("double"), Seq(0.5, 0.9), 16384).as("__q"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
          element_at(col("__q"), 1).as("p50"),
          element_at(col("__q"), 2).as("p90"))
      runCompleteGate(s, stream, "sq")
    }),

    "q_stream_tokens" -> ((s, dir) => {
      // the live token-budget meter: a byte-level BPE tokenizer running
      // INSIDE a streaming aggregation. Training happens batch-side;
      // the model rides the stream projection as a broadcast-referenced
      // object (the persisted-artifact deployment shape), the tokenize
      // expression is a stateless codegen projection, and the
      // per-source token/doc counters live in the state store — counts
      // must equal the static replay the oracle derives.
      val corpus = T(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(23)) === 0)
        .select(col("doc_id"), col("source"),
          expr("substr(text, 1, 120)").as("text"))
      val model = graft.ops.Bpe.trainBytesOn(corpus, "text", numMerges = 4)
      val schema = T(s, dir, "documents").schema
      val stream = s.readStream.schema(schema)
        .parquet(stageStreamDir(dir, "documents"))
        .filter(pmod(col("doc_id"), lit(23)) === 0)
        .select(col("source"),
          size(graft.ops.Bpe.tokensCol(
            expr("substr(text, 1, 120)"), model)).as("n"))
        .groupBy(col("source"))
        .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_docs"))
      runCompleteGate(s, stream, "st")
    }),

    "q_stream_session_window" -> ((s, dir) => {
      // Spark's NATIVE session_window streaming aggregation (state-store
      // session merging) beside the custom flatMapGroupsWithState
      // sessionizer — a different mechanism with a different boundary
      // rule (windows merge iff they OVERLAP: gap-equal diffs split,
      // half-open [start, last+gap)). Append mode emits only closed
      // sessions; the far-future watermark-kicker event (user -1)
      // closes every real session so the emitted set equals the batch
      // sessionization, which the oracle replays µs-exactly.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = E(s, dir).filter(col("user_id") < 200)
        .select(col("ts"), col("user_id"))
      val kickTs = ev.agg(max("ts")).head().getTimestamp(0).toInstant
        .plus(java.time.Duration.ofDays(10))
      val staged = ev.unionByName(ev.limit(1).select(
        lit(java.sql.Timestamp.from(kickTs)).as("ts"),
        lit(-1L).as("user_id")))
      val dirS = Files.createTempDirectory("graft_ssw").toString
      staged.coalesce(1).write.mode("overwrite").parquet(dirS)
      val schema = s.read.parquet(dirS).schema
      val stream = s.readStream.schema(schema).parquet(dirS)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          col("n_events"))
      val ckpt = Files.createTempDirectory("graft_ssw_ckpt").toString
      val qn = "ssw_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(stream, qn, ckpt)
        .filter(col("user_id") >= 0)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_sessionize" -> ((s, dir) => {
      // the stateful streaming sessionizer (flatMapGroupsWithState,
      // per-user gap state in the state store) — a single AvailableNow
      // batch applies events in (time, id) order, so the session ids
      // equal the batch window-function formulation and the gate shares
      // q_sessionize's oracle shape
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stage = stageStreamDir(dir, "events")
      import s.implicits._
      val stream = normTs(s.readStream.schema(schema).parquet(stage))
        .filter(col("user_id") < 100)
        .select(col("event_id"), col("ts"), col("user_id"))
        .as[graft.streaming.EventStream.EventIn]
      val out = graft.streaming.EventStream
        .statefulSessionize(stream, gapSec = 1800).toDF
      val ckpt = Files.createTempDirectory("graft_ssz_ckpt").toString
      val qn = "ssz_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(out, qn, ckpt)
        .select(col("event_id"), col("user_id"), col("session_id"))
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_distinct" -> ((s, dir) => {
      // per-window distinct users through the THIRD sketch in the
      // streaming engine (after KLL and the top-k heap): hll_sketch_agg's
      // serialized sketch is the state-store payload of a windowed
      // aggregation — the op exists because count(DISTINCT) is
      // UNSUPPORTED in streaming; the sketch is how a stream counts
      // users at all. Property-oracled like q_approx_distinct: the
      // exact counts (recomputed in batch) cross-check the engines and
      // the streamed estimate must land within the lgK=14 envelope
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stream = normTs(s.readStream.schema(schema)
          .parquet(stageStreamDir(dir, "events")))
        .groupBy(window(col("ts"), "1 day"))
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("user_id"), lit(14))).as("approx_users"),
          count(lit(1)).as("n_events"))
        .select(date_format(col("window.start"), "yyyy-MM-dd")
          .as("day"), col("approx_users"), col("n_events"))
      val streamed = runCompleteGate(s, stream, "sdc")
      val exact = normTs(T(s, dir, "events"))
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      streamed.join(exact, Seq("day"))
        .select(col("day"), col("exact_users"), col("n_events"),
          (abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.02).as("est_ok"))
    }),

    "q_stream_wm_dedup" -> ((s, dir) => {
      // declarative watermarked dedup: the staged dir carries every
      // event TWICE (two links to the same parquet); dropDuplicates on
      // event_id within the watermark horizon collapses them back to
      // exactly the source table the oracle reads
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stage = Files.createTempDirectory("graft_swd")
      Files.createSymbolicLink(stage.resolve("a.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      Files.createSymbolicLink(stage.resolve("b.parquet"),
        java.nio.file.Paths.get(s"$dir/events.parquet"))
      val out = graft.streaming.EventStream
        .dedupEvents(s, stage.toString, schema)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val ckpt = Files.createTempDirectory("graft_swd_ckpt").toString
      val qn = "swd_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(out, qn, ckpt)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_enrich" -> ((s, dir) => {
      // stream-static dimension enrichment: each micro-batch broadcast-
      // joins the dim (re-broadcast per batch, so a slowly-changing dim
      // stays current). Dim derives deterministically from user ids, so
      // the AvailableNow run equals the plain batch join the oracle runs
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stage = stageStreamDir(dir, "events")
      val dim = T(s, dir, "events").select(col("user_id")).distinct()
        .withColumn("segment", pmod(col("user_id"), lit(4)))
      val stream = s.readStream.schema(schema).parquet(stage)
        .select(col("event_id"), col("user_id"))
      val out = graft.streaming.EventStream.enrich(stream, dim,
        Seq("user_id"))
      val ckpt = Files.createTempDirectory("graft_sen_ckpt").toString
      val qn = "sen_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(out, qn, ckpt)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_heavy_hitters" -> ((s, dir) => {
      // the FOURTH native sketch through the streaming state store:
      // per-event-type Misra–Gries top-3 props values. Capacity 4096
      // far exceeds the distinct props per type, so every count is
      // exact and the batch group-count oracle reproduces the summary
      // row-for-row — streaming frequent-items without ever holding a
      // per-type count table in state
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stream = s.readStream.schema(schema)
        .parquet(stageStreamDir(dir, "events"))
        .filter(col("props").isNotNull)
        .groupBy(col("event_type"))
        .agg(graft.functions.GraftFunctions
          .heavy_hitters(col("props"), capacity = 4096, topK = 3).as("__hh"))
      runCompleteGate(s, stream, "shh")
        .select(col("event_type"), posexplode(col("__hh")).as(Seq("__p", "__e")))
        .select(col("event_type"), (col("__p") + 1).cast("long").as("rank"),
          col("__e.item").as("props"), col("__e.count").as("n"))
    }),

    "q_stream_topk" -> ((s, dir) => {
      // per-type top-3 events by value as a STREAMING aggregation — the
      // niche window functions cannot serve: row_number() is illegal in a
      // streaming query, while the bounded-heap aggregate's serialized
      // O(k) buffer rides the state store like any mergeable summary.
      // event_id rides zero-padded so the heap's lexical tie-break equals
      // numeric order; AvailableNow reproduces the batch answer exactly
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stream = s.readStream.schema(schema)
        .parquet(stageStreamDir(dir, "events"))
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(graft.functions.GraftFunctions.topk_rows(col("value"),
          lpad(col("event_id").cast("string"), 10, "0"), 3).as("__tk"))
      runCompleteGate(s, stream, "stk")
        .select(col("event_type"), posexplode(col("__tk")).as(Seq("__p", "__e")))
        .select(col("event_type"), (col("__p") + 1).cast("long").as("rank"),
          col("__e.item").cast("long").as("event_id"),
          col("__e.score").as("value"))
    }),

    "q_stream_funnel" -> ((s, dir) => {
      // the stateful streaming funnel: per-user chain state in the state
      // store, one advancement row per step reached. A single
      // AvailableNow batch applies events in (time, id) order, so the
      // emitted advancements reconstruct the BATCH funnel's t1/t2/t3
      // exactly — the oracle is q_funnel's CTE chain unpivoted
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stage = stageStreamDir(dir, "events")
      import s.implicits._
      val stream = normTs(s.readStream.schema(schema).parquet(stage))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[graft.streaming.EventStream.FunnelEventIn]
      val out = graft.streaming.EventStream.streamingFunnel(stream,
        Seq("signup", "view", "purchase")).toDF
      val ckpt = Files.createTempDirectory("graft_sfn_ckpt").toString
      val qn = "sfn_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(out, qn, ckpt)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_dedup" -> ((s, dir) => {
      // streaming incremental dedup vs ingested history (the delta-crawl
      // ingest filter): history = every 3rd event's composite content;
      // bloom routes definite-new rows join-free MAP-SIDE, the stream-
      // static left_anti confirms bloom hits per micro-batch — stateless,
      // and the AvailableNow run reproduces batch subtractSeen exactly
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stage = stageStreamDir(dir, "events")
      val content = concat_ws("|", col("user_id"), col("event_type"),
        col("props"))
      val history = T(s, dir, "events").filter(col("event_id") % 3 === 0)
      val stream = s.readStream.schema(schema).parquet(stage)
      val out = graft.streaming.EventStream
        .subtractSeenStream(stream, history, content,
          expectedItems = 200000L)
        .select(col("event_id"))
      val ckpt = Files.createTempDirectory("graft_sdh_ckpt").toString
      val qn = "sdh_" + math.abs(scala.util.Random.nextInt())
      graft.streaming.EventStream.runAvailableNow(out, qn, ckpt)
    }),

    "q_stream_join_outer" -> ((s, dir) => {
      // LEFT OUTER watermarked stream-stream join — the semantics the
      // inner gate can't cover: unmatched views emit null-extended ONLY
      // when the watermark proves no purchase can still arrive (state
      // eviction in the trailing no-data batch, the exact machinery
      // q_stream_join legitimately skips). A far-future watermark-kicker
      // row on BOTH streams (user -1, matching nothing) drives the final
      // watermark past every real view's join window, so the emitted set
      // equals the static LEFT JOIN exactly — no eviction-boundary
      // sensitivity for the oracle to chase. The kicker itself stays in
      // state (its own window is open) and never emits.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = normTs(T(s, dir, "events").filter(col("event_id") < 20000))
        .withColumn("ts", date_trunc("second", col("ts")))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val kickTs = ev.agg(max("ts")).head().getTimestamp(0).toInstant
        .plus(java.time.Duration.ofDays(10))
      def stageDir(df: DataFrame): String = {
        val d = Files.createTempDirectory("graft_sjo").toString
        df.coalesce(1).write.mode("overwrite").parquet(d)
        d
      }
      def withKicker(df: DataFrame, idCol: String, tsCol: String): DataFrame =
        df.unionByName(df.limit(1).select(
          lit(-1L).as(idCol),
          (if (idCol == "view_id") lit(-1L).as("user_id")
           else lit(-1L).as("p_user")),
          lit(java.sql.Timestamp.from(kickTs)).as(tsCol))
          .select(df.columns.map(col): _*))
      val vDir = stageDir(withKicker(
        ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("vts")), "view_id", "vts"))
      val pDir = stageDir(withKicker(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"),
            col("user_id").as("p_user"), col("ts").as("pts")),
        "purchase_id", "pts"))
      def src(d: String) = {
        val schema = s.read.parquet(d).schema
        s.readStream.schema(schema).parquet(d)
      }
      val views = src(vDir).withWatermark("vts", "1 hour")
      val purch = src(pDir).withWatermark("pts", "1 hour")
      val joined = views.join(purch,
          col("user_id") === col("p_user") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 6 HOURS"),
          "left_outer")
        .select(col("user_id"), col("view_id"), col("purchase_id"))
      val ckpt = Files.createTempDirectory("graft_sjo_ckpt").toString
      val qn = "sjo_" + math.abs(scala.util.Random.nextInt())
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      // noDataBatch stays ON: the trailing batch is what evicts left
      // state and emits the null-extended unmatched views
      try graft.streaming.EventStream.runAvailableNow(joined, qn, ckpt)
        .filter(col("user_id") >= 0)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_join" -> ((s, dir) => {
      // Stream-stream attribution join: a views stream joins a purchases
      // stream on user with the purchase inside [view, view + 6h] — the
      // canonical watermarked interval join whose state the time-range
      // condition bounds (each side buffers at most watermark + range).
      // Both sides arrive in one AvailableNow batch, so no input is late
      // and the emitted matches equal the static interval join exactly,
      // which is what the oracle computes.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = normTs(T(s, dir, "events").filter(col("event_id") < 20000))
        .withColumn("ts", date_trunc("second", col("ts")))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      def stageDir(df: DataFrame): String = {
        val d = Files.createTempDirectory("graft_sj").toString
        df.coalesce(1).write.mode("overwrite").parquet(d)
        d
      }
      val vDir = stageDir(ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("vts")))
      val pDir = stageDir(ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("pts")))
      def src(d: String) = {
        val schema = s.read.parquet(d).schema
        s.readStream.schema(schema).parquet(d)
      }
      val views = src(vDir).withWatermark("vts", "1 hour")
      val purch = src(pDir).withWatermark("pts", "1 hour")
      val joined = views.join(purch,
          col("user_id") === col("p_user") &&
          col("pts") >= col("vts") &&
          col("pts") <= col("vts") + expr("INTERVAL 6 HOURS"))
        .select(col("user_id"), col("view_id"), col("purchase_id"))
      val ckpt = Files.createTempDirectory("graft_sj_ckpt").toString
      val qn = "sj_" + math.abs(scala.util.Random.nextInt())
      // stream-stream joins keep FOUR state stores per partition per side;
      // at gate-sized state the per-partition commit fsyncs dominate, so
      // run the fresh checkpoint with 4 partitions (cluster sizing follows
      // state volume, not core count)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      // inner interval-join matches emit eagerly in the data batch; the
      // trailing no-data batch would only evict state (4 stores x 4
      // partitions x 2 sides of commit work) — skip it
      try graft.streaming.EventStream.runAvailableNow(joined, qn, ckpt,
        noDataBatch = false)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_streaming_late" -> ((s, dir) => {
      // Watermark late-data accounting, made deterministic: three staged
      // files become three ordered micro-batches (mtime order,
      // maxFilesPerTrigger=1). Spark filters late records with the
      // watermark of the PREVIOUS micro-batch (SPARK-40925 two-watermark
      // model: filter-for-data lags eviction by one batch), so batch 3
      // (event_id % 3 == 0, the out-of-order arrivals) is filtered against
      // the watermark in effect during batch 2 — max(batch-1 ts) - 1h —
      // and a late row is DROPPED iff its whole 10-minute window closed at
      // or below that watermark. Append mode then emits exactly the
      // windows whose end <= the final watermark (max kept ts - 1h).
      // The oracle reproduces both rules from the static frame
      // (timestamps truncated to whole seconds on both sides; neither
      // watermark lands on a window boundary, so the comparison is exact).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // gate-scale bound: covers all of sf0.01 (max id 9999) so the oracle
      // comparison is over the full table there; at larger bench SFs it
      // keeps the 4-micro-batch state workload constant-sized
      val ev = normTs(T(s, dir, "events").filter(col("event_id") < 20000))
        .withColumn("ts", date_trunc("second", col("ts")))
        .select(col("event_id"), col("ts"), col("event_type"))
      val stage = Files.createTempDirectory("graft_late")
      // ONE partitioned write stages all three micro-batch files (the
      // three separate coalesce(1) jobs this replaces were most of the
      // gate's wall time); repartition(1) makes one writer task → exactly
      // one part file per __b dir, promoted to a named file with a fixed
      // mtime (only the relative order matters to the source)
      val tmpStage = Files.createTempDirectory("graft_late_w").toString
      ev.withColumn("__b", pmod(col("event_id"), lit(3)))
        .repartition(1).write.partitionBy("__b").mode("overwrite")
        .parquet(tmpStage)
      def promote(b: Int, name: String, mtimeMs: Long): Unit = {
        val part = new java.io.File(s"$tmpStage/__b=$b").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = stage.resolve(name)
        Files.copy(part.toPath, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      promote(1, "01.parquet", 1700000000000L)
      promote(2, "02.parquet", 1700000100000L)
      promote(0, "03.parquet", 1700000200000L)
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"))
      val ckpt = Files.createTempDirectory("graft_late_ckpt").toString
      val qn = "late_" + math.abs(scala.util.Random.nextInt())
      // 8 state partitions instead of the session's 32: 4 micro-batches
      // each commit one state file per partition, and at gate scale the
      // commit fan-out — not the data — is the cost (the partition count
      // is baked into the fresh checkpoint, so this never affects other
      // queries' plans; restored immediately)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.EventStream.runAvailableNow(stream, qn, ckpt)
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_datasets" -> ((s, dir) => {
      // catalog meta-chain under the oracle: three saves (one a version
      // bump) list back with the exact recorded row counts; created_at is
      // wall-clock so it stays out of the gate projection
      val root = Files.createTempDirectory("graft_meta").toString
      val cat = new Catalog(root, s)
      cat.save(Chain(T(s, dir, "nation")), "meta.nations")
      cat.save(Chain(T(s, dir, "region")), "meta.regions")
      cat.save(Chain(T(s, dir, "nation").filter(col("n_regionkey") === 0)),
        "meta.nations")
      cat.datasetsDF().select("name", "version", "rows")
    }),

    "q_job_metrics" -> ((s, dir) => {
      // job metrics under the oracle: executor tasks bump accumulators
      // (one per row, one per name char), the job sidecar persists, and
      // the read-back values must equal exact count/sum arithmetic
      val root = Files.createTempDirectory("graft_jobs").toString
      val cat = new Catalog(root, s)
      val jm = graft.catalog.JobMetrics(cat, "gate_job", s)
      val rows = jm.counter("rows_seen")
      val chars = jm.counter("name_chars")
      T(s, dir, "nation").foreach { r =>
        rows.add(1)
        chars.add(r.getAs[String]("n_name").length.toLong)
      }
      jm.setParam("source", "nation")
      jm.persist()
      s.read.json(s"$root/jobs")
        .select(col("job"), col("counters.rows_seen").cast("long")
          .as("rows_seen"), col("counters.name_chars").cast("long")
          .as("name_chars"))
    }),

    "q_save_roundtrip" -> ((s, dir) => {
      val root = Files.createTempDirectory("graft_cat").toString
      val cat = new Catalog(root, s)
      val agg = C(s, dir, "supplier")
        .groupByAgg(Seq("s_nationkey"),
          "n_suppliers" -> count(lit(1)),
          "total_bal" -> dsum(col("s_acctbal")))
      cat.save(agg, "supplier_stats")
      cat.readDataset("supplier_stats").selectExcept("sys").toDF
    }),

    // ------------------------------------------------- projection / filter
    "q_mutate" -> ((s, dir) =>
      C(s, dir, "part")
        .mutate(
          "bumped" -> round(col("p_retailprice") * 1.1, 2),
          "brand_u" -> upper(col("p_brand")),
          "name_len" -> length(col("p_name")).cast("long"))
        .select("p_partkey", "bumped", "brand_u", "name_len")
        .toDF),

    "q_filter" -> ((s, dir) => {
      import graft.dsl.{C => $c, GraftColumn}
      C(s, dir, "customer")
        .filter(
          $c("c_mktsegment").in_("BUILDING", "AUTOMOBILE"),
          $c("c_name").glob("Customer*"),
          $c("c_name").regexp("[02468]$"),
          $c("c_acctbal") > 0)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        .toDF
    }),

    "q_order_limit" -> ((s, dir) =>
      C(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .toDF),

    "q_offset" -> ((s, dir) =>
      C(s, dir, "orders")
        .orderBy(col("o_orderkey").asc)
        .offset(10).limit(15)
        .select("o_orderkey", "o_custkey")
        .toDF),

    "q_distinct" -> ((s, dir) =>
      C(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .through(c => Chain(c.toDF.distinct()))
        .toDF),

    "q_chunk" -> ((s, dir) =>
      Split.byKeyMod(T(s, dir, "lineitem"), "l_orderkey", 4, 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    "q_sample" -> ((s, dir) => {
      // random draw oracled as a PROPERTY (q_approx_distinct trick): exact
      // size, no duplicate rows, and every sampled key exists in the source
      // are all cross-engine checkable even though the drawn set isn't
      val sampled = C(s, dir, "orders").sample(100).select("o_orderkey").toDF
      val src = T(s, dir, "orders").select(col("o_orderkey").as("__src_key"))
      sampled.join(src, col("o_orderkey") === col("__src_key"), "left")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_distinct"),
          count(col("__src_key")).as("n_in_source"))
    }),

    "q_shuffle" -> ((s, dir) =>
      C(s, dir, "nation").shuffle(seed = 7).selectExcept("sys").toDF),

    // -------------------------------------------------------- set ops
    "q_union" -> ((s, dir) => {
      val a = C(s, dir, "orders").filter(col("o_orderkey") <= 100)
        .select("o_orderkey", "o_totalprice")
      val b = C(s, dir, "orders")
        .filter(col("o_orderkey").between(50, 150))
        .select("o_orderkey", "o_totalprice")
      a.union(b).toDF
    }),

    "q_subtract" -> ((s, dir) => {
      val cust = C(s, dir, "customer")
      val ords = C(s, dir, "orders").rename("o_custkey", "c_custkey")
      cust.subtract(ords, on = Seq("c_custkey"))
        .select("c_custkey", "c_name").toDF
    }),

    // ----------------------------------------------------------- joins
    "q_merge_inner" -> ((s, dir) => {
      val o = C(s, dir, "orders").rename("o_custkey", "c_custkey")
      val c = C(s, dir, "customer")
      o.merge(c, on = Seq("c_custkey"), how = "inner")
        .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
        .toDF
    }),

    "q_merge_left" -> ((s, dir) => {
      val c = C(s, dir, "customer").filter(col("c_custkey") <= 500)
      val o = C(s, dir, "orders").rename("o_custkey", "c_custkey")
      c.merge(o, on = Seq("c_custkey"))  // default left-outer
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .toDF
    }),

    "q_merge_full" -> ((s, dir) => {
      val l = C(s, dir, "nation").filter(col("n_regionkey") < 2)
        .select("n_nationkey", "n_name")
      val r = C(s, dir, "nation").filter(col("n_regionkey") > 0)
        .select("n_nationkey", "n_name")
      l.merge(r, on = Seq("n_nationkey"), how = "full_outer").toDF
    }),

    "q_merge_expr" -> ((s, dir) => {
      val n = C(s, dir, "nation")
      val r = C(s, dir, "region")
      n.merge(r, on = Seq.empty, how = "inner",
          condition = Some(col("n_regionkey") === col("r_regionkey")))
        .select("n_nationkey", "n_name", "r_name")
        .toDF
    }),

    // ------------------------------------------------------ diff / delta
    "q_diff" -> ((s, dir) => {
      val oldV = C(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        .select("o_orderkey", "o_totalprice")
      val newV = C(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(11)) =!= 0)
        .mutate("o_totalprice" -> when(pmod(col("o_orderkey"), lit(5)) === 0,
          round(col("o_totalprice") * 2, 2)).otherwise(col("o_totalprice")))
        .select("o_orderkey", "o_totalprice")
      newV.diff(oldV, on = Seq("o_orderkey"), compare = Seq("o_totalprice"),
        statusCol = Some("status")).toDF
    }),

    "q_file_diff" -> ((s, dir) => {
      def files(c: Chain): Chain = Chain(c.toDF.select(struct(
        lit("synth://docs").as("source"),
        concat(lit("doc_"), col("doc_id"), lit(".txt")).as("path"),
        col("n_chars").as("size"),
        lit("").as("version"),
        col("etag"),
        lit(true).as("is_latest"),
        lit(null).cast("timestamp").as("last_modified"),
        lit(null).cast("string").as("location")).as("file")))
      val oldV = files(C(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(13)) =!= 0)
        .mutate("etag" -> col("n_chars").cast("string")))
      val newV = files(C(s, dir, "documents")
        .mutate("etag" -> when(pmod(col("doc_id"), lit(17)) === 0,
          (col("n_chars") + 1).cast("string"))
          .otherwise(col("n_chars").cast("string"))))
      newV.fileDiff(oldV, added = true, deleted = true, modified = true,
          same = false, statusCol = Some("status"))
        .selectExpr(col("file.path").as("path"), col("status"))
        .toDF
    }),

    // ------------------------------------------------------- aggregation
    "q_group_collect" -> ((s, dir) =>
      // collect_list exercised via the sorted-CSV surface: the driver's
      // pandas compare cannot sort raw array cells, so the array stays
      // internal and the gate sees a deterministic string rendering.
      C(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .groupByAgg(Seq("l_orderkey"),
          "items_csv" -> concat_ws(",", array_sort(collect_list(col("l_linenumber")))),
          "n" -> count(lit(1)))
        .toDF),

    "q_group_concat" -> ((s, dir) =>
      // reference `concat` group aggregate (group_concat with separator,
      // func/aggregate.py:230) — deterministic via sorted collect
      C(s, dir, "customer")
        .groupByAgg(Seq("c_nationkey"),
          "segs" -> concat_ws("|", array_sort(collect_list(col("c_mktsegment")))),
          "n" -> count(lit(1)))
        .toDF),

    "q_cube" -> ((s, dir) =>
      // grouping-sets family (SURVEY §2.5 lists it as a Spark freebie)
      T(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    "q_empty_agg" -> ((s, dir) =>
      // aggregate over an EMPTY relation: count=0, sum/min/max/avg=NULL —
      // the null-vs-zero parity corner both engines must agree on
      T(s, dir, "lineitem").filter(col("l_quantity") < -1)
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("s"),
          min(col("l_quantity")).as("mn"),
          max(col("l_quantity")).as("mx"),
          avg(col("l_quantity")).as("av"),
          count_distinct(col("l_returnflag")).as("nd"))),

    "q_grouping_sets" -> ((s, dir) =>
      // explicit grouping sets (finer than cube/rollup): per-flag, per-status,
      // and grand total in ONE pass — Spark expands to a single Expand+Agg
      T(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))),

    "q_merge_right" -> ((s, dir) => {
      val l = C(s, dir, "orders").selectExpr(
        col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      val r = C(s, dir, "customer").selectExpr(col("c_custkey"), col("c_name"))
      l.merge(r, on = Seq("c_custkey"), how = "right_outer")
        .select("c_custkey", "o_orderkey", "o_totalprice", "c_name").toDF
    }),

    "q_merge_self" -> ((s, dir) => {
      // self-merge: right-side collisions take the rname prefix (the
      // reference auto-clones self-joins; Spark just needs the rename,
      // datachain.py:1601-1709 + signal_schema.py:85-135)
      val c = C(s, dir, "customer").selectExpr(col("c_custkey"), col("c_name"))
      c.merge(c, on = Seq("c_custkey"), how = "inner").toDF
    }),

    "q_rollup" -> ((s, dir) =>
      T(s, dir, "orders")
        .rollup(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))),

    "q_pivot" -> ((s, dir) =>
      // pivot with explicit value list: no extra distinct-scan, plan is a
      // single hash aggregate — the shape that survives a 100× scale-up
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))),

    "q_unpivot" -> ((s, dir) =>
      // melt: wide measures → (key, measure, value) rows; pure projection
      // + generator, zero shuffle at any scale
      T(s, dir, "lineitem").filter(col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")),

    "q_intersect" -> ((s, dir) => {
      val cust = C(s, dir, "customer")
      val ords = C(s, dir, "orders").rename("o_custkey", "c_custkey")
      cust.semiJoin(ords, on = Seq("c_custkey"))
        .select("c_custkey", "c_name").toDF
    }),

    "q_group_by_file" -> ((s, dir) => {
      // complex-signal partition_by: group on the whole `file` struct
      // (expanded to leaves, re-packed as a partial model) — reference
      // datachain.py:1172-1293. Output projects from the re-packed struct,
      // so the gate covers expansion AND partial reconstruction.
      val listing = T(s, dir, "documents").select(
        struct(lit("s3://corpus").as("source"),
          concat(lit("docs/sub"), pmod(col("doc_id"), lit(7)),
            lit("/data.txt")).as("path")).as("file"),
        col("n_chars"), col("lang"))
      Chain(listing)
        .groupByAgg(Seq("file"),
          "n_docs" -> count(lit(1)),
          "total_chars" -> sum(col("n_chars")).cast("long"),
          "n_langs" -> countDistinct(col("lang")))
        .toDF
        .select(col("file.source").as("file_source"),
          col("file.path").as("file_path"),
          col("n_docs"), col("total_chars"), col("n_langs"))
    }),

    "q_stats_agg" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
            .as("covar_qp"))),

    "q_percentile" -> ((s, dir) =>
      // exact percentiles (linear interpolation — same contract as DuckDB
      // quantile_cont); approx_percentile is the >TB-scale variant, kept out
      // of the gate because approximation is engine-specific
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("median(l_extendedprice)"), 6).as("med_price"))),

    "q_kll_quantiles" -> ((s, dir) => {
      // mergeable KLL quantile sketch in its EXACT regime (per-group n
      // stays <= k=16384 at gate scale, so no compaction fires and every
      // entry is the exact discrete lower quantile — smallest value with
      // cumulative count >= ceil(q*n), which the oracle reproduces with a
      // row_number selection). Beyond the regime the same aggregate
      // degrades to the documented ~1.5·log2(n/k)/k rank error (OpsSpec
      // property test); the O(k·log n) mergeable summary partial-
      // aggregates map-side where exact percentile sorts the column.
      val li = T(s, dir, "lineitem").filter(col("l_orderkey") % 8 === 0)
      li.groupBy(col("l_returnflag").as("flag"))
        .agg(graft.functions.GraftFunctions.kll_quantiles(
          col("l_quantity").cast("double"),
          Seq(0.25, 0.5, 0.9, 0.99), 16384).as("__q"))
        .select(col("flag"),
          element_at(col("__q"), 1).as("p25"),
          element_at(col("__q"), 2).as("p50"),
          element_at(col("__q"), 3).as("p90"),
          element_at(col("__q"), 4).as("p99"))
    }),

    "q_profile" -> ((s, dir) =>
      // one-pass column profiler; the gate pins its exact metrics
      // (count/nulls/min/max/mean — value stats for numerics, length stats
      // for strings, null for other types). approx_distinct and the
      // t-digest percentiles stay out: approximation is engine-specific,
      // and they are covered by q_approx_distinct / q_percentile —
      // sketches = false also keeps their cost out of the aggregation
      graft.ops.Profile.summarize(T(s, dir, "orders"), sketches = false)
        .select(col("column"), col("dtype"), col("n"), col("nulls"),
          round(col("min"), 4).as("min_v"), round(col("max"), 4).as("max_v"),
          round(col("mean"), 4).as("mean_v"))),

    "q_winsorize" -> ((s, dir) =>
      // quantile clamping at [p05, p95]: KLL bounds in the exact regime
      // (15,000 rows <= k), so every clamped value reproduces in SQL
      // k = 64k keeps the exact regime with 4x headroom over the
      // current 15,000 rows (testdata regenerates between rounds)
      graft.ops.Profile.winsorize(
          T(s, dir, "orders").select(col("o_orderkey"),
            col("o_totalprice")), "o_totalprice", loP = 0.05, hiP = 0.95,
          k = 65536)
        .select(col("o_orderkey"),
          round(col("o_totalprice_w"), 6).as("clamped"))),

    "q_outliers" -> ((s, dir) =>
      // MAD-based robust outlier flags over order totals: median and MAD
      // both from the KLL sketch in its exact regime (15,000 rows ≤
      // k=16384), so every deviation and flag reproduces in SQL with the
      // same discrete lower-quantile convention
      graft.ops.Profile.madOutliers(
          T(s, dir, "orders").select(col("o_orderkey"),
            col("o_totalprice")), "o_totalprice", c = 3.0, k = 65536)
        .select(col("o_orderkey"),
          round(col("o_totalprice_dev"), 6).as("dev"),
          col("is_outlier"))),

    "q_profile_drift" -> ((s, dir) => {
      // snapshot-to-snapshot drift QA: the "after" version reprices
      // o_totalprice +20% on the same rows — its mean moves 4× past the
      // 5% tolerance (flag true) while o_custkey and the row count are
      // untouched (flag false) — both flags far from the boundary, so
      // engine fp noise can't flip them; exact counts cross-check
      val before = T(s, dir, "orders")
        .select(col("o_totalprice"), col("o_custkey"))
      val after = T(s, dir, "orders")
        .select((col("o_totalprice") * 1.2).as("o_totalprice"),
          col("o_custkey"))
      graft.ops.Profile.drift(before, after, relTol = 0.05)
        .select(col("column"), col("n_before"), col("n_after"),
          col("nulls_before"), col("nulls_after"),
          round(col("mean_before"), 4).as("mean_b"),
          round(col("mean_after"), 4).as("mean_a"),
          col("drift_flag"))
    }),

    "q_math_funcs" -> ((s, dir) =>
      T(s, dir, "orders").select(
        col("o_orderkey"),
        round(sqrt(col("o_totalprice")), 6).as("sq"),
        round(pow(col("o_totalprice"), lit(0.3)), 6).as("pw"),
        round(log(col("o_totalprice") + 1), 6).as("ln1"),
        round(log10(col("o_totalprice") + 1), 6).as("lg10"),
        round(exp(col("o_totalprice") / 100000.0), 6).as("ex"),
        abs(col("o_custkey") - 500).as("ab"),
        ceil(col("o_totalprice")).as("ce"),
        floor(col("o_totalprice")).as("fl"),
        signum(col("o_custkey") - 500).cast("int").as("sg"),
        pmod(col("o_orderkey"), lit(7)).as("md"))),

    "q_date_funcs" -> ((s, dir) =>
      T(s, dir, "orders").select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        date_format(date_trunc("month", col("o_orderdate")),
          "yyyy-MM-dd HH:mm:ss").as("mstart"))),

    "q_json_path" -> ((s, dir) => {
      // nested JSON-path extraction (reference jmespath support,
      // lib/meta_formats.py): build a nested doc per row, extract leaf +
      // array-index paths with get_json_object (codegen'd, no UDF)
      val j = concat(lit("{\"meta\":{\"ids\":[1,2,3],\"tag\":\"t\"},\"payload\":"),
        col("props"), lit("}"))
      E(s, dir).filter(col("event_id") < 2000).select(
        col("event_id"),
        get_json_object(j, "$.payload.k").cast("long").as("k"),
        get_json_object(j, "$.meta.ids[1]").cast("long").as("id1"),
        get_json_object(j, "$.meta.tag").as("tag"))
    }),

    "q_batch_map" -> ((s, dir) => {
      import s.implicits._
      // batch_map (N:N batched mapper, reference datachain.py:1037) — same
      // row contract as map, executed over 500-row slices of each partition
      Chain(T(s, dir, "part").select(col("p_partkey"), col("p_name")))
        .batchMapTyped[PartIn, PartOut](500)(batch =>
          batch.map(p => PartOut(p.p_partkey, p.p_name.reverse, p.p_name.length.toLong)))
        .toDF
    }),

    "q_skew_agg" -> ((s, dir) =>
      // two-phase salted aggregation: identical result to a direct groupBy,
      // hot keys spread over 16 reducers first (the 100TB skew path)
      graft.ops.Skew.groupBySalted(T(s, dir, "lineitem"),
        Seq("l_returnflag"), buckets = 16, sums = Seq("l_quantity"))),

    "q_asof_join" -> ((s, dir) => {
      // backward as-of: each event picks up the latest checkpoint value at
      // or before its timestamp for the same user (single-shuffle plan)
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofBackward(l, refs, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_forward" -> ((s, dir) => {
      // forward as-of: each event picks up the EARLIEST checkpoint at or
      // after its timestamp (pandas direction='forward'); same
      // single-shuffle union+window plan, reversed frame
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofForward(l, refs, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_nearest" -> ((s, dir) => {
      // nearest as-of (ties to backward): one exchange, two directional
      // windows over the same hash partitioning
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofNearest(l, refs, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_tolerance" -> ((s, dir) => {
      // as-of with a staleness bound: matches further back than 1 hour are
      // dropped (kept as nulls) — the quote-staleness contract
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(50)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofBackward(l, refs, Seq("user_id"), "ts", "ts",
          tolerance = Some(3600.0))
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_strict" -> ((s, dir) => {
      // strict backward as-of (pandas allow_exact_matches=False): a ref
      // row exactly at the event's timestamp is NOT eligible — for the
      // ref events themselves this forces the PREVIOUS checkpoint, so
      // strict and non-strict genuinely differ on this data
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofBackward(l, refs, Seq("user_id"), "ts", "ts",
          allowExactMatches = false)
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_strict_fwd" -> ((s, dir) => {
      // strict forward as-of: earliest ref STRICTLY after the event
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofForward(l, refs, Seq("user_id"), "ts", "ts",
          allowExactMatches = false)
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_asof_strict_near" -> ((s, dir) => {
      // strict nearest: exact-time candidates excluded on BOTH sides, the
      // closer strict neighbor wins, µs-exact ties to backward
      val ev = E(s, dir)
      val refs = ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val l = ev.select("event_id", "user_id", "ts")
      graft.ops.Joins.asofNearest(l, refs, Seq("user_id"), "ts", "ts",
          allowExactMatches = false)
        .select(col("event_id"), round(col("ref_value"), 6).as("ref_value"))
    }),

    "q_range_join" -> ((s, dir) => {
      // interval containment as a binned equi-join: customers matched to
      // non-overlapping balance tiers derived from nation
      val tiers = T(s, dir, "nation").select(
        col("n_nationkey").as("tier"),
        (col("n_nationkey") * 440.0 - 1000.0).as("lo"),
        (col("n_nationkey") * 440.0 - 560.0).as("hi"))
      graft.ops.Joins.rangeJoinBinned(
          T(s, dir, "customer").select(col("c_custkey"), col("c_acctbal")),
          "c_acctbal", tiers, "lo", "hi", binWidth = 200.0)
        .select(col("c_custkey"), col("tier"))
    }),

    "q_any_value" -> ((s, dir) => {
      val c = C(s, dir, "customer").rename("c_nationkey", "n_nationkey")
      val n = C(s, dir, "nation")
      c.merge(n, on = Seq("n_nationkey"), how = "inner")
        .groupByAgg(Seq("n_nationkey"),
          "nation_name" -> any_value(col("n_name")),
          "n_customers" -> count(lit(1)),
          "total_bal" -> dsum(col("c_acctbal")))
        .toDF
    }),

    "q_scalar_agg" -> ((s, dir) =>
      C(s, dir, "lineitem")
        .groupByAgg(Seq.empty,
          "cnt" -> count(lit(1)),
          "sum_qty" -> dsum(col("l_quantity")),
          "avg_price" -> davg(col("l_extendedprice")),
          "min_ship" -> date_format(min(col("l_shipdate")), "yyyy-MM-dd"),
          "max_ship" -> date_format(max(col("l_shipdate")), "yyyy-MM-dd"))
        .toDF),

    "q_count_distinct" -> ((s, dir) =>
      C(s, dir, "lineitem")
        .groupByAgg(Seq("l_returnflag"),
          "n_parts" -> countDistinct(col("l_partkey")),
          "n_supps" -> countDistinct(col("l_suppkey")),
          "n_rows" -> count(lit(1)))
        .toDF),

    "q_approx_distinct" -> ((s, dir) =>
      // HLL++ estimate asserted against the exact count as an oracled
      // PROPERTY: the estimate itself is engine-specific, but "within the
      // configured 2% relative error" is checkable cross-engine
      C(s, dir, "lineitem")
        .groupByAgg(Seq("l_returnflag"),
          "exact_parts" -> countDistinct(col("l_partkey")),
          "approx_ok" -> (abs(approx_count_distinct(col("l_partkey"), rsd = 0.02)
              - countDistinct(col("l_partkey"))).cast("double") /
            countDistinct(col("l_partkey")) <= 0.05))
        .toDF),

    // ----------------------------------------------------------- window
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "lineitem").filter(col("l_suppkey") <= 20)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("nt"),
          lag(col("l_quantity"), 1).over(w).as("lag_qty"),
          lead(col("l_quantity"), 1).over(w).as("lead_qty"),
          first(col("l_quantity")).over(w).as("first_qty"),
          round(sum(col("l_quantity")).over(wr), 2).as("running_qty"))
    }),

    // ------------------------------------------------------- typed UDFs
    "q_map_udf" -> ((s, dir) => {
      import s.implicits._
      Chain(T(s, dir, "part").select(col("p_partkey"), col("p_name")))
        .mapTyped[PartIn, PartOut](p =>
          PartOut(p.p_partkey, p.p_name.reverse, p.p_name.length.toLong))
        .toDF
    }),

    "q_gen_udf" -> ((s, dir) => {
      import s.implicits._
      Chain(T(s, dir, "part").filter(col("p_partkey") < 2000)
          .select(col("p_partkey"), col("p_name")))
        .genTyped[PartIn, WordOut](p =>
          p.p_name.split(" ").toSeq.map(w => WordOut(p.p_partkey, w)))
        .toDF
    }),

    "q_agg_udf" -> ((s, dir) => {
      import s.implicits._
      // N:M group-wise generator: top-2 line items per (flag,status) by
      // price — bounded-heap accumulation, so group iterators stream
      // (no whole-group buffering; safe for 100×-sized groups).
      Chain(T(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"), col("l_extendedprice")))
        .aggTyped[LineIn, (String, String), TopOut](
          r => (r.l_returnflag, r.l_linestatus)) { case ((f, st), it) =>
          implicit val ord: Ordering[LineIn] = Ordering.by(r =>
            (-r.l_extendedprice, r.l_orderkey, r.l_linenumber.toLong))
          val top = it.foldLeft(List.empty[LineIn]) { (acc, r) =>
            (r :: acc).sorted.take(2)
          }
          top.zipWithIndex.map { case (r, i) =>
            TopOut(f, st, r.l_orderkey, r.l_extendedprice, i + 1L)
          }
        }
        .toDF
    }),

    // -------------------------------------------------- scalar functions
    "q_string_funcs" -> ((s, dir) =>
      T(s, dir, "part").select(
        col("p_partkey"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_brand"), "Brand#", "B-").as("brand2"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("devowel"),
        element_at(split(col("p_type"), " "), 1).as("first_word"),
        upper(col("p_brand")).as("up"),
        lower(col("p_name")).as("lo"),
        substring(col("p_name"), 1, 5).as("pfx"))),

    "q_string_funcs2" -> ((s, dir) =>
      // second string family: regexp group extraction, padding, repeat,
      // translate — all codegen'd built-ins
      T(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d)(\\d)", 1).as("brand_major"),
        regexp_extract(col("p_brand"), "Brand#(\\d)(\\d)", 2).as("brand_minor"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        rpad(col("p_type"), 30, ".").as("padded_type"),
        translate(col("p_name"), "aeiou", "AEIOU").as("vowels_upper"),
        repeat(lit("ab"), pmod(col("p_partkey"), lit(3)).cast("int") + 1)
          .as("rep"))),

    "q_path_funcs" -> ((s, dir) => {
      val p = concat(lit("data/"), col("source"), lit("/doc_"), col("doc_id"),
        lit(".txt"))
      val p2 = concat(col("doc_id"), lit(".tar.gz"))
      T(s, dir, "documents").select(
        col("doc_id"),
        path_parent(p).as("parent"),
        path_name(p).as("name"),
        path_file_stem(p).as("stem"),
        path_file_ext(p).as("ext"),
        path_parent(p2).as("parent2"),
        path_file_stem(p2).as("stem2"),
        path_file_ext(p2).as("ext2"))
    }),

    "q_array_funcs" -> ((s, dir) => {
      // arrays of length 2..6 (never empty slices: DuckDB returns NULL for
      // out-of-range list slices where Spark returns [])
      val arr = sequence(lit(1L), pmod(col("vec_id"), lit(5)) + 2)
      T(s, dir, "embeddings").select(
        col("vec_id"),
        size(arr).cast("long").as("n"),
        array_join(arr.cast("array<string>"), "-").as("joined"),
        element_at(arr, 1).as("first_el"),
        array_join(slice(arr, 2, 2).cast("array<string>"), "-").as("sliced"),
        array_contains(arr, 3L).as("has3"))
    }),

    "q_numeric_funcs" -> ((s, dir) =>
      T(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").bitwiseAND(col("o_custkey")).as("band"),
        col("o_orderkey").bitwiseOR(col("o_custkey")).as("bor"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 1).as("shr"),
        bit_hamming_distance(col("o_orderkey"), col("o_custkey")).cast("int")
          .as("bham"))),

    "q_hash_funcs" -> ((s, dir) =>
      // sip_hash_64 / sim_hash_64 / fingerprint64 have no portable DuckDB
      // twin, so the gate hashes a DETERMINISTIC literal-derived input set
      // and the oracle is a golden VALUES table (scale-factor independent).
      // Algorithmic correctness is anchored by the SipHash paper test
      // vectors in FunctionsSpec; this gate pins the full column pipeline
      // (cast/encode/null paths) to those audited values.
      s.range(0, 100).toDF("n").select(
        col("n"),
        int_hash_64(col("n")).as("ih"),
        sip_hash_64(concat(lit("key_"), col("n"))).as("sh"),
        byte_hamming_distance(concat(lit("key_"), col("n")), lit("key_0"))
          .as("bh"),
        TextAnalysis.fingerprint64(concat(lit("Doc  "), col("n"), lit(" text")))
          .as("fp64"),
        sim_hash_64(concat(lit("alpha beta gamma token_"), col("n")))
          .as("simh"))),

    "q_int_hash" -> ((s, dir) =>
      // custom codegen'd IntHash64 Catalyst expression, hash-matched against
      // an independent 128-bit-limb emulation in the oracle (the one hash
      // family portable enough to cross-check engine-to-engine)
      T(s, dir, "orders").filter(col("o_orderkey") < 3000).select(
        col("o_orderkey"),
        int_hash_64(col("o_orderkey")).as("ih_key"),
        int_hash_64(col("o_custkey")).as("ih_cust"))),

    "q_conditional" -> ((s, dir) =>
      T(s, dir, "customer").select(
        col("c_custkey"),
        greatest(col("c_acctbal"), lit(0.0)).as("g"),
        least(col("c_acctbal"), lit(1000.0)).as("l"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bucket"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg"),
        col("c_acctbal").isNull.as("isnull"))),

    "q_datetime" -> ((s, dir) =>
      C(s, dir, "orders")
        .mutate("yr" -> year(col("o_orderdate")).cast("long"),
          "mo" -> month(col("o_orderdate")).cast("long"))
        .groupByAgg(Seq("yr", "mo"),
          "n" -> count(lit(1)),
          "total" -> dsum(col("o_totalprice")))
        .toDF),

    "q_explode_json" -> ((s, dir) =>
      Chain(E(s, dir).filter(col("event_id") < 2000))
        .explodeJson("props", StructType(Seq(StructField("k", LongType))))
        .select("event_id", "event_type", "k")
        .toDF),

    // -------------------------------------------------------- streaming
    "q_streaming" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = T(s, dir, "events").schema
      val stream = normTs(s.readStream.schema(schema)
        .parquet(stageStreamDir(dir, "events")))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("value_sum"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"), col("event_type"), col("n"), col("value_sum"))
      runCompleteGate(s, stream, "evw")
    }),

    // --------------------------------------------------- splits / chunks
    "q_train_test_split" -> ((s, dir) => {
      val train = Split.byKeyMod(E(s, dir), "event_id", 10, 0)
        .unionByName(Split.byKeyMod(E(s, dir), "event_id", 10, 1))
      val test = Split.byKeyMod(E(s, dir), "event_id", 10, 9)
      train.select(lit("train").as("part"), col("event_id"))
        .unionByName(test.select(lit("test").as("part"), col("event_id")))
    }),

    // ------------------------------------------------------------- dedup
    "q_dedup_exact" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dups = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val corpus = docs.unionByName(dups)
      corpus.groupBy(TextAnalysis.fingerprintMd5(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("dup_count"))
    }),

    "q_minhash_dedup" -> ((s, dir) => {
      // Oracled EXACTLY: DuckDB recomputes all-pairs 5-gram Jaccard over
      // the same corpus and keeps pairs ≥ threshold — a hash match means
      // the banded LSH surfaced the complete true edge set (recall) and
      // emitted nothing below threshold (precision), with edge weights
      // agreeing to 4 decimals.
      val docs = T(s, dir, "documents")
      // plant near-dups only on docs long enough (n_chars >= 200) that the
      // suffix keeps their shingle-Jaccard deep in the LSH high-recall
      // zone — a 0.74-Jaccard pair from a tiny doc sits where 4-row bands
      // miss ~5% of the time, and "passes when the hash gets lucky" is not
      // a gate
      val nearDups = docs
        .filter(pmod(col("doc_id"), lit(4)) === 0 && col("n_chars") >= 200)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" tail marker token")))
      val corpus = docs.unionByName(nearDups).select("doc_id", "text")
      // shingleCandidatesOnly=false, measured: the planted near-dups put
      // ~40% of docs in a candidate pair, so corpus-wide shingling costs
      // little extra gram work and lets the scheduler overlap the gram
      // stage with the LSH self-join (sf0.1 min-of-3: ~1.7s vs ~2.2s for
      // the serialized candidates-only DAG). At web scale, where candidates
      // are ~1% of the corpus, flip it to true — see the scaladoc trade
      // note on Dedup.minhashDedupEdges.
      Dedup.minhashDedupEdges(corpus, "text", "doc_id",
        threshold = 0.5, k = 64, bands = 16, ngram = 5,
        shingleCandidatesOnly = false)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),

    "q_ann_rerank" -> ((s, dir) => {
      // two-stage ANN (hamming prefilter → exact cosine re-rank): recall@5
      // ≥ 0.6 per query vs in-Spark brute force, same honest property
      // pattern as q_ann_ivf. The prefilter is a constant FRACTION of the
      // corpus (8%, floor 40 = the sf0.01 value), not a constant count —
      // a fixed width silently loses recall as the corpus grows (measured:
      // prefilter=40 drops a query below 3/5 recall at sf0.1's 2000
      // vectors), which is exactly the production mis-sizing trap
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val rr = Similarity.hammingRerankTopK(emb, queries, k = 5,
        prefilter = math.max(40L, emb.count() * 2 / 25).toInt)
      val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      val hits = rr.select(col("query_id"), col("vec_id"))
        .intersect(bf.select(col("query_id"), col("vec_id")))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) >= 3).as("recall_ok"))
    }),

    "q_simhash_dedup" -> ((s, dir) => {
      // simhash as candidate generator + exact Jaccard verification; the
      // oracle is the true thresholded all-pairs edge set (same exactness
      // argument as q_minhash_dedup, via a different LSH family).
      // Corpus is bounded (doc_id < 150) because exact recall of
      // 0.5-Jaccard pairs demands a hamming radius of ~12 — pigeonhole
      // banding guarantees recall there, but a radius that wide is only
      // affordable on a verification-sized corpus. At production scale
      // simhash runs at its standard small radius (Manku et al. use 3) and
      // jaccard-complete dedup is minhash LSH's job (q_minhash_dedup).
      val docs = T(s, dir, "documents").filter(col("doc_id") < 150)
      val nearDups = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" tail")))
      val corpus = docs.unionByName(nearDups).select("doc_id", "text")
      Dedup.simhashDedupEdges(corpus, "text", "doc_id",
        maxHamming = 12, threshold = 0.5, ngram = 5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    }),

    "q_ngram_jaccard" -> ((s, dir) => {
      val g = T(s, dir, "documents").filter(col("doc_id") < 80)
        .select(col("doc_id"),
          TextAnalysis.charNgrams(col("text"), 3).as("grams"))
      val a = g.select(col("doc_id").as("id_a"), col("grams").as("ga"))
      val b = g.select(col("doc_id").as("id_b"), col("grams").as("gb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.ngramJaccardArrays(col("ga"), col("gb")), 4).as("jaccard"))
    }),

    "q_embed_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val copies = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
        .withColumn("vec_id", col("vec_id") + 100000)
      Dedup.embeddingNearDups(emb.unionByName(copies), "embedding", "vec_id",
        threshold = 0.98, planes = 12)
    }),

    "q_subtract_seen" -> ((s, dir) => {
      // incremental dedup against ingested history: history = every 3rd
      // doc, new batch = the whole corpus; the bloom prefilter routes
      // definite-new rows join-free and the anti-join confirms the rest —
      // the result is the exact unseen set regardless of fpp
      val docs = T(s, dir, "documents").select(col("doc_id"), col("source"),
        col("text"))
      Dedup.subtractSeen(docs, docs.filter(col("doc_id") % 3 === 0),
          "text", "doc_id", expectedItems = 1000L, fpp = 0.01)
        .select(col("doc_id"), col("source"))
    }),

    "q_image_dhash" -> ((s, dir) => {
      // REAL perceptual-hash round-trip: deterministic 9×8 pattern PNGs
      // (javax.imageio-encoded), dHash64 decodes and hashes them through
      // the full grayscale → box-average → gradient-sign path; the grid
      // matches the downsample and PNG is lossless, so the oracle
      // recomputes every bit from the (id, x, y) pattern arithmetic —
      // no codec needed. Hash split hi/lo (rows 4-7 / 0-3) keeps both
      // halves inside unsigned-32 range for cross-engine compare.
      val media = Multimodal.syntheticPatternPngMedia(
        T(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
      Multimodal.imageDHash(media)
        .select(col("id"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
          col("dhash").bitwiseAND(lit(0xFFFFFFFFL)).as("dhash_lo"))
    }),

    "q_compact" -> ((s, dir) => {
      // maintenance-pass losslessness under the driver oracle: shatter
      // orders into 40 small files, compact (shuffle-free coalesce sized
      // from on-disk bytes), read back — the oracle is the original
      // table, so a hash match proves the rewrite preserved every row
      // and every value while the spec (IoSpec) separately pins the
      // file-count and no-exchange plan properties.
      val tmp = Files.createTempDirectory("graft_compact").toString
      val orders = T(s, dir, "orders")
      orders.repartition(40).write.mode("overwrite").parquet(s"$tmp/small")
      graft.io.Layout.compactTo(s, s"$tmp/small", s"$tmp/packed")
      s.read.parquet(s"$tmp/packed")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
    }),

    "q_zorder" -> ((s, dir) => {
      // Z-order (Morton) layout key over (o_custkey, o_totalprice):
      // linear bins over the exact min/max, bit-plane interleave — a pure
      // codegen'd projection after one min/max agg. The write path
      // (Layout.writeZOrdered) range-partitions on this value so every
      // file gets a narrow min/max envelope on BOTH columns (footer-stat
      // skipping on either predicate dimension); the oracle reproduces
      // the exact z-value per row (IEEE-identical binning arithmetic).
      val o = T(s, dir, "orders")
      graft.io.Layout.zorderFrame(o, "o_custkey", "o_totalprice")
        .select(col("o_orderkey"), col("zval"))
    }),

    "q_hilbert" -> ((s, dir) => {
      // Hilbert layout key over the same dimensions as q_zorder: same
      // exact linear bins, but curve positions from the classic 2-D
      // reflect+rotate kernel — consecutive positions are grid-ADJACENT
      // cells, so range-partitioned files cover compact connected
      // regions (no Morton quadrant jumps). The kernel carries only
      // (x, y, s, d) scalar state per bit plane, so the oracle replays
      // the loop verbatim with a recursive CTE — every hval re-derived
      // bit-for-bit in DuckDB
      val o = T(s, dir, "orders")
      graft.io.Layout.hilbertFrame(o, "o_custkey", "o_totalprice")
        .select(col("o_orderkey"), col("hval"))
    }),

    "q_hilbert_skip" -> ((s, dir) => {
      // Hilbert layout × catalog file-stats skipping, composed
      // end-to-end (the q_zorder_skip twin): a curve-prefix-aligned
      // save gives every file a compact sub-quadrant envelope on BOTH
      // dimensions (Skilling N-d kernel over quantile buckets), a 2-D
      // box predicate prunes files from footer stats alone (asserted),
      // and the pruned read still returns the exact full-scan aggregate
      val root = Files.createTempDirectory("graft_hskip").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
      val bits = 8
      val h = graft.io.Layout.cellAligned(
        graft.io.Layout.hilbertFrameQuantileN(o,
          Seq("o_custkey", "o_totalprice"), bits), "hval", 2 * bits,
        nFiles = 32)
      cat.save(Chain(h), "hord")
      val mx = o.agg(max("o_custkey"), max("o_totalprice")).head()
      val (ck, tp) = (mx.getLong(0), mx.getDouble(1))
      val pred = col("o_custkey") <= ck / 8 &&
        col("o_totalprice") <= tp / 8
      val (kept, total) = cat.pruneCount("hord", pred)
      require(kept >= 1 && kept < total / 2,
        s"hilbert 2-D box must prune most files: kept $kept of $total")
      cat.readDatasetWhere("hord", pred).selectExcept("sys").toDF
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"),
          coalesce(min("o_orderkey"), lit(0L)).as("min_key"))
    }),

    "q_zorder_skip" -> ((s, dir) => {
      // Z-order layout × catalog file-stats skipping, composed end-to-end:
      // a Morton-cell-aligned save gives every file a narrow min/max
      // envelope on BOTH dimensions, so a 2-D box predicate prunes files
      // from footer stats alone (asserted), and the pruned read still
      // returns the exact full-scan aggregate (oracle)
      val root = Files.createTempDirectory("graft_zskip").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
      val bits = 8
      val z = graft.io.Layout.cellAligned(
        graft.io.Layout.zorderFrameQuantile(o, "o_custkey", "o_totalprice",
          bits), "zval", 2 * bits, nFiles = 32)
      cat.save(Chain(z), "zord")
      val mx = o.agg(max("o_custkey"), max("o_totalprice")).head()
      val (ck, tp) = (mx.getLong(0), mx.getDouble(1))
      val pred = col("o_custkey") <= ck / 8 &&
        col("o_totalprice") <= tp / 8
      val (kept, total) = cat.pruneCount("zord", pred)
      require(kept >= 1 && kept < total / 2,
        s"z-order 2-D box must prune most files: kept $kept of $total")
      cat.readDatasetWhere("zord", pred).selectExcept("sys").toDF
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"),
          coalesce(min("o_orderkey"), lit(0L)).as("min_key"))
    }),

    "q_partitioned_read" -> ((s, dir) => {
      // hive-style partitioned layout: events written partitioned by
      // event_type (salted to at most 4 files per directory), read back
      // with a partition predicate — the scan's PartitionFilters prune
      // the other directories before listing a single file (PlanSpec
      // pins that). Row-level parity with the plain filtered table.
      val root = Files.createTempDirectory("graft_part").toString
      graft.io.Layout.writePartitioned(
        T(s, dir, "events").select(col("event_id"), col("user_id"),
          col("event_type")),
        root, "event_type")
      s.read.parquet(root)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    "q_bucketed_join" -> ((s, dir) => {
      // durable co-located join: both sides written hash-bucketed on the
      // join key (8 buckets, sorted within buckets), so the join reads
      // matching buckets file-to-file and Catalyst elides BOTH exchanges
      // AND both sorts (PlanSpec pins the no-Exchange shape) — the
      // disk-layout answer to a 100 TB fact⋈dim join that recurs on the
      // same key. Result oracled against the plain SQL join.
      val suf = math.abs(scala.util.Random.nextInt())
      val root = Files.createTempDirectory("graft_buck").toString
      graft.io.Layout.bucketize(T(s, dir, "orders"),
        s"orders_bk_$suf", s"$root/orders", "o_custkey", 8)
      graft.io.Layout.bucketize(T(s, dir, "customer"),
        s"customer_bk_$suf", s"$root/customer", "c_custkey", 8)
      graft.io.Layout.bucketedJoin(s, s"orders_bk_$suf", s"customer_bk_$suf",
          "o_custkey", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"),
          countDistinct(col("c_custkey")).as("n_customers"))
    }),

    "q_label_prop" -> ((s, dir) => {
      // deterministic synchronous LPA communities over the same sparse
      // part co-occurrence graph as q_triangles: 2 iterations, most-
      // frequent-neighbor label with min tie-break — every update is
      // exact counting + string-min, so the oracle unrolls the identical
      // iterations in SQL and hash-matches the full label vector.
      val li = T(s, dir, "lineitem").filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
      graft.ops.Graph.labelPropagation(e, "src", "dst", iterations = 2)
    }),

    "q_subtract_seen_near" -> ((s, dir) => {
      // incremental NEAR-dup dedup: history = the full corpus; the new
      // batch mixes (a) tail-marked near-dups of long history docs (same
      // high-recall planting as q_minhash_dedup — their Jaccard sits deep
      // above the 0.5 threshold), (b) exact copies (Jaccard 1.0, every
      // band collides), (c) genuinely fresh rows. Oracled EXACTLY: DuckDB
      // recomputes all new×history pair Jaccards, so a hash match proves
      // the banded join surfaced every true near-dup (recall) and the
      // verify step dropped nothing fresh (precision).
      val docs = T(s, dir, "documents")
      val hist = docs.select(col("doc_id"), col("text"))
      val newBatch = docs
        .filter(pmod(col("doc_id"), lit(4)) === 0 && col("n_chars") >= 200)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" tail marker token")).as("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(4)) === 1)
          .select((col("doc_id") + 300000).as("doc_id"), col("text")))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(4)) === 2)
          .select((col("doc_id") + 400000).as("doc_id"),
            concat(lit("entirely fresh content row number "), col("doc_id"),
              lit(" with no shared phrasing")).as("text")))
      // candidates cover ~half the batch (planted dups), so corpus-wide
      // shingling beats the candidate semi-joins here — the web-scale
      // default (shingleCandidatesOnly=true) wins when candidates are ~1%
      Dedup.subtractSeenNear(newBatch, hist, "text", "doc_id",
          threshold = 0.5, shingleCandidatesOnly = false)
        .select(col("doc_id"))
    }),

    "q_semdedup" -> ((s, dir) => {
      // SemDeDup over embeddings: every 5th vector planted back re-id'd
      // (cosine exactly 1.0 with its original), anchors = the first 8
      // vectors; originals survive, planted copies land in the same
      // cluster and are dropped — assignment, clusters, and kept flags all
      // reproduced exactly by the oracle's own argmax + all-pairs check
      val emb = T(s, dir, "embeddings")
      val corpus = emb.unionByName(
        emb.filter(pmod(col("vec_id"), lit(5)) === 0)
          .withColumn("vec_id", col("vec_id") + 100000))
      Dedup.semanticDedup(corpus, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        threshold = 0.98)
    }),

    "q_embed_pairs" -> ((s, dir) => {
      val e = T(s, dir, "embeddings").filter(col("vec_id") < 60)
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(lit(1.0) - cosine_distance(col("va"), col("vb")), 6).as("sim"))
    }),

    // ------------------------------------------------- similarity search
    "q_ann_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(emb, queries, k = 5)
    }),

    "q_ann_pq" -> ((s, dir) => {
      // product-quantized ANN (m=8 subspaces x 8 centroids, init-only
      // codebook): 64-dim float vectors collapse to 8 small ints (32x)
      // and queries score candidates via ADC table lookups. Encode
      // argmin, table build, and ADC sums are all decimal-exact, so
      // DuckDB reproduces every code, every distance, and the full
      // top-k list bit-for-bit
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val codebook = Similarity.pqTrain(emb, m = 8, kc = 8)
      Similarity.pqTopK(emb, queries, k = 5, codebook)
    }),

    "q_ann_pq_rerank" -> ((s, dir) => {
      // two-stage PQ: ADC top-20 prefilter (codes only) → exact decimal
      // rerank of just those candidates. BOTH stages are decimal-exact,
      // so the oracle reproduces the prefilter set AND the reranked
      // distances bit-for-bit
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val codebook = Similarity.pqTrain(emb, m = 8, kc = 8)
      Similarity.pqRerankTopK(emb, queries, k = 5, codebook, prefilter = 20)
    }),

    "q_ann_sq8" -> ((s, dir) => {
      // SQ8 scalar-quantized ANN: corpus collapses to 1 byte/dim (4×
      // compression), queries scan the codes asymmetrically. Oracled
      // EXACTLY — encode (per-dim min/max linear bins, HALF_UP) and
      // asymmetric distance (dequantize + 12-dp decimal sum) are
      // engine-exact arithmetic, so DuckDB reproduces every distance and
      // the full top-k list bit-for-bit (not just a recall property).
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.sq8TopK(emb, queries, k = 5)
    }),

    "q_ann_sq8_rerank" -> ((s, dir) => {
      // two-stage SQ8: byte-code prefilter (top-20) then exact euclidean
      // rerank (top-5). BOTH stages are engine-exact arithmetic, so the
      // oracle unrolls the whole pipeline — quantized candidate list
      // included — and hash-matches the final ranking bit-for-bit.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.sq8RerankTopK(emb, queries, k = 5, prefilter = 20)
    }),

    "q_ann_ivf" -> ((s, dir) => {
      // recall@5 ≥ 0.6 per query vs the in-Spark brute force (itself
      // pinned exactly against DuckDB in q_ann_topk) — an honest property
      // oracle for an approximate index: nprobe=8 of nlist=16 keeps the
      // pruning real (half the inverted lists are never scanned) while the
      // recall bound stays deterministic.
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val (assigned, centroids) = Similarity.ivfBuild(emb, nlist = 16,
        iterations = 1)
      val ivf = Similarity.ivfTopK(assigned, centroids, queries, k = 5,
        nprobe = 8)
      val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      val hits = ivf.select(col("query_id"), col("vec_id"))
        .intersect(bf.select(col("query_id"), col("vec_id")))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) >= 3).as("recall_ok"))
    }),

    "q_ann_ivf_pq" -> ((s, dir) => {
      // the composed billion-scale recipe (IVFPQ shape): coarse cells
      // route each query to 8 of 16 inverted lists, ONLY those cells'
      // 8-int PQ codes are ADC-scanned, and the 40-candidate shortlist
      // reranks against exact decimal distances. Property oracle like
      // q_ann_ivf: recall@5 >= 3/5 per query vs the exact euclidean
      // top-5 computed with the same decimal kernel
      val emb = T(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val (assigned, centroids) = Similarity.ivfBuild(emb, nlist = 16,
        iterations = 1)
      val cb = Similarity.pqTrain(emb, m = 8, kc = 16, iterations = 1)
      // prefilter sized as a corpus FRACTION (8%, floor 40) — the r5
      // q_ann_rerank lesson: a fixed shortlist silently loses recall as
      // the corpus grows across SFs/regenerations
      val pre = math.max(40L, emb.count() / 12L).toInt
      val res = Similarity.ivfPqRerankTopK(assigned, centroids, queries,
        k = 5, cb, nprobe = 8, prefilter = pre)
      val exact = emb.select(col("vec_id"),
          col("embedding").cast("array<double>").as("__cv"))
        .join(broadcast(queries.select(col("query_id"),
          col("embedding").cast("array<double>").as("__qv"))))
        .withColumn("__d", graft.functions.GraftFunctions
          .decimal_sq_distance(col("__qv"), col("__cv")))
        .withColumn("__rn", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("__d").asc, col("vec_id").asc)))
        .filter(col("__rn") <= 5)
      val hits = res.select(col("query_id"), col("vec_id"))
        .intersect(exact.select(col("query_id"), col("vec_id")))
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      queries.select(col("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) >= 3).as("recall_ok"))
    }),

    "q_ann_index" -> ((s, dir) => {
      // PERSISTED IVF index: build once into the catalog (corpus range-
      // laid by centroid_id + centroids dataset + lineage dep), query
      // many times. Asserted: the layout actually skips files (a
      // half-domain centroid predicate must prune via footer stats), and
      // search recall matches the q_ann_ivf property (searchIndex reads a
      // pruned SUPERSET of the probed lists, so results equal ivfTopK's)
      val root = Files.createTempDirectory("graft_annidx").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val emb = T(s, dir, "embeddings")
        Similarity.saveIndex(cat, "idx", emb, nlist = 16, iterations = 1,
          nFiles = 16)
        val (kept, total) = cat.pruneCount("idx", col("centroid_id") < 8L)
        require(kept < total,
          s"range layout must let stats prune unprobed lists: $kept/$total")
        val queries = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("query_id"), col("embedding"))
        val res = Similarity.searchIndex(cat, "idx", queries, k = 5,
          nprobe = 8)
        val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
        val hits = res.select(col("query_id"), col("vec_id"))
          .intersect(bf.select(col("query_id"), col("vec_id")))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        queries.select(col("query_id"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            (coalesce(col("n_hits"), lit(0L)) >= 3).as("recall_ok"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    // ------------------------------------------------------ text analysis
    "q_lang_id" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))),

    "q_text_quality" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("token_count"),
        TextAnalysis.subwordCount(col("text")).cast("long").as("subword_count"),
        round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TextAnalysis.upperRatio(col("text")), 4).as("upper_ratio"),
        round(TextAnalysis.meanWordLen(col("text")), 4).as("mean_word_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))),

    "q_quality_classifier" -> ((s, dir) =>
      // model-based quality filtering (GPT-3/LLaMA-style linear classifier
      // inference, fixed weights): sigmoid over the cheap text features —
      // one codegen'd projection, oracle reproduces the arithmetic exactly
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.qualityLogistic(col("text")).as("quality_prob"))
        .withColumn("keep", col("quality_prob") >= 0.5)),

    "q_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp_md5"))),

    "q_bpe" -> ((s, dir) => {
      // byte-pair encoding end-to-end: ONE distributed word-count, an
      // 8-merge driver loop over the bounded frequency table, then a
      // codegen'd tokenize projection over the corpus. The oracle
      // re-runs the whole thing in SQL — each merge application is a
      // pure list expression (greedy LTR via run parity), so the 8
      // training stages unroll as plain projections + aggregates and
      // DuckDB re-derives every merge AND every token bit-for-bit
      // (count ties break by UTF-8 byte order on both sides). NOTE:
      // trainOn's top-maxWords vocabulary cap (default 2^20) is NOT
      // modeled by the oracle — safe here because this corpus holds a
      // few dozen distinct words; a gate on an open-vocabulary corpus
      // would need the cap mirrored as a top-N filter on wf
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = graft.ops.Bpe.trainOn(docs, "text", numMerges = 8)
      graft.ops.Bpe.tokenize(docs, "doc_id", "text", model)
    }),

    "q_winnow" -> ((s, dir) =>
      // winnowed fingerprints (Schleimer et al. 2003, the MOSS
      // selection): every window of w=12 consecutive 9-gram hashes
      // keeps its minimum (rightmost on ties) — ~2/(w+1) of the grams,
      // position-carrying, with the guarantee that any shared run of
      // >= w+k-1 = 20 chars is caught. The gram hash is the CDC
      // polynomial family (exact int64 for k <= 9 even astral), so the
      // oracle re-derives every fingerprint bit-for-bit
      Winnow.fingerprints(
        T(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", k = 9, w = 12)),

    "q_winnow_dedup" -> ((s, dir) => {
      // near-dup pairs by winnow-fingerprint Jaccard: tail-edited
      // copies share their whole prefix's fingerprints; the bucketed
      // self-join on fingerprint VALUE emits candidates ~ true
      // matches, never an all-pairs product (PlanSpec pins no
      // CartesianProduct). maxDocsPerFp=200 is the production hot-key
      // guard — this synthetic corpus draws from a tiny vocabulary
      // (~1.5k distinct fps across 5k docs, hottest in 76% of them),
      // so uncapped the candidate expansion is 61M pairs vs 5.4M
      // capped at sf0.1; the cap is plain df-filter SQL, so the
      // oracle replays it exactly. The 0.65 compare is deterministic
      // cross-engine: n_shared/n_union are exact int64 and the ratio
      // is ONE ieee754 division on both sides
      Winnow.nearDup(winnowCorpus(s, dir), "doc_id", "text",
        k = 9, w = 12, minJaccard = 0.65, maxDocsPerFp = 200)
    }),

    "q_winnow_spans" -> ((s, dir) => {
      // passage LOCALIZATION — the winnowing differentiator: for every
      // near-dup pair the fingerprints carry positions, so the match
      // points at the reused run (pos_a, pos_b are 1-based codepoint
      // gram starts; consecutive rows chain into the shared passage).
      // Composed form: detection and localization share ONE persisted
      // fingerprint pass (PlanSpec pins a single winnow_fingerprints
      // projection in the whole plan); the pair table is tiny so both
      // span joins broadcast it
      val corpus = winnowCorpus(s, dir)
      Winnow.nearDupWithSpans(corpus, "doc_id", "text",
        k = 9, w = 12, minJaccard = 0.65, maxDocsPerFp = 200)._2
    }),

    "q_winnow_runs" -> ((s, dir) => {
      // span-RUN coalescing: matching position pairs advancing in
      // lockstep (constant pos_b - pos_a alignment, gaps <= w+k-1 —
      // winnowing guarantees a fingerprint at least every w grams of a
      // shared run) chain into (start_a, start_b, length) passages.
      // One window + one groupBy over pair-local frames on top of the
      // composed single-pass plan; the planted tail-edited copies make
      // the expected runs analytic (one long shared-prefix run per
      // pair), and the oracle re-derives every run from raw text
      val corpus = winnowCorpus(s, dir)
      val (_, spans) = Winnow.nearDupWithSpans(corpus, "doc_id", "text",
        k = 9, w = 12, minJaccard = 0.65, maxDocsPerFp = 200)
      Winnow.coalesceRuns(spans, k = 9, w = 12)
    }),

    // ------------------------------------------------------- multimodal
    "q_image_header" -> ((s, dir) =>
      // header-only dims over real encoded PNGs: the expression reads the
      // IHDR chunk (~24 bytes), never a pixel — decode-free metadata
      // backfill, oracled by the same id-formula arithmetic as
      // q_multimodal's full decode
      Multimodal.imageHeaderMeta(
        Multimodal.syntheticPngMedia(T(s, dir, "documents"), "doc_id"))),

    "q_video_header" -> ((s, dir) =>
      // codec-free video metadata: spec-correct minimal MP4s built
      // box-by-box, parsed back through the ISO-BMFF walk (ftyp brand,
      // mvhd duration/timescale, tkhd 16.16 dims) — the honest no-ffmpeg
      // subset of the reference's ffprobe fields, oracled arithmetically
      Multimodal.videoHeaderMeta(
        Multimodal.syntheticMp4Media(T(s, dir, "documents"), "doc_id"))),

    "q_webm_header" -> ((s, dir) => {
      // BOTH video containers through the one dispatching op: MP4 box
      // walk and Matroska EBML walk coalesce per row on the magic bytes;
      // the mixed corpus proves the dispatch and both parsers at once
      val docs = T(s, dir, "documents")
      val mp4 = Multimodal.syntheticMp4Media(docs, "doc_id")
      val webm = Multimodal.syntheticWebmMedia(
        docs.select((col("doc_id") + 10000).as("doc_id")), "doc_id")
      Multimodal.videoHeaderMeta(mp4.unionByName(webm))
    }),

    "q_audio_frame_meta" -> ((s, dir) =>
      // codec-free MP3 metadata: ID3v2 skip + frame-sync scan + spec
      // bitrate/samplerate tables + CBR duration estimate, all parsed
      // from 4 header bytes per blob; fixtures carry id-derived table
      // indices so the oracle replays every field arithmetically
      Multimodal.audioFrameMeta(
        Multimodal.syntheticMp3Media(T(s, dir, "documents"), "doc_id"))),

    "q_multimodal" -> ((s, dir) => {
      // REAL codec round-trip: ids → solid-color PNGs encoded with
      // javax.imageio → decodeImages reads true pixel dimensions and mean
      // channel values back; the oracle derives the same numbers
      // arithmetically from the id formulas. (PNG byte length is
      // encoder-specific, so the size column is decoded pixel bytes.)
      val media = Multimodal.syntheticPngMedia(T(s, dir, "documents"), "doc_id")
      Multimodal.decodeImages(media)
        .select(col("id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          (col("meta.width").cast("long") * col("meta.height") * lit(3L))
            .as("px_bytes"),
          element_at(col("features"), 1).cast("double").as("mean_r"),
          element_at(col("features"), 2).cast("double").as("mean_g"),
          element_at(col("features"), 3).cast("double").as("mean_b"))
    }),

    "q_audio_decode" -> ((s, dir) => {
      // REAL audio codec round-trip: ids → PCM_SIGNED 16-bit WAVs encoded
      // with javax.sound.sampled → decodeAudios reads true sample rate /
      // channels / frame counts back through the same JDK codec; the
      // oracle derives identical numbers arithmetically from the id.
      val media = Multimodal.syntheticWavMedia(T(s, dir, "documents"), "doc_id")
      Multimodal.decodeAudios(media)
        .select(col("id"), col("meta.format").as("format"),
          col("meta.codec").as("codec"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.samples").as("samples"),
          round(col("meta.duration"), 6).as("duration"),
          col("meta.bit_rate").as("bit_rate"))
    }),

    "q_line_dedup" -> ((s, dir) => {
      // CCNet-style cross-document line dedup: synthesize 3-line docs where
      // line 2 is shared boilerplate (5 variants x ~100 docs each) and
      // line 3 is unique; at minDocs=3 the boilerplate (and any text line
      // repeated across >=3 docs — the planted dup docs) must vanish while
      // every unique line survives in order.
      val threeLine = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit("\npromo block "), pmod(col("doc_id"), lit(5)),
          lit("\ntail marker "), col("doc_id")).as("text"))
      Corpus.dedupLines(threeLine, "doc_id", "text", minDocs = 3)
    }),

    "q_domain_mix" -> ((s, dir) =>
      // deterministic domain-mix sampling: md5-coin per row, per-source
      // keep fractions (curated kept, crawl downsampled, rest dropped) —
      // zero-shuffle map-side filter, bit-identical in any engine
      Corpus.mixDomains(
        T(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        fractions = Map("src0" -> 1.0, "src1" -> 1.0, "src2" -> 0.5,
          "src3" -> 0.5, "src4" -> 0.2, "src5" -> 0.2),
        defaultFraction = 0.0, seed = "mix1")),

    "q_top_tokens" -> ((s, dir) =>
      // corpus vocabulary head: top-50 whitespace tokens by global count,
      // deterministic tie-break on the token text
      Corpus.topTokens(T(s, dir, "documents"), "text", n = 50)),

    "q_heavy_hitters" -> ((s, dir) =>
      // per-source top-5 bigrams through the native Misra–Gries aggregate
      // (O(capacity) mergeable state per group crosses the shuffle, not
      // the gram stream). capacity 4096 comfortably exceeds the corpus's
      // distinct-bigram count per source, so every count is exact and the
      // oracle recomputes them with a plain SQL group-count — the gate
      // pins the aggregate's update/merge/eval machinery end to end
      Corpus.heavyHitterPhrases(T(s, dir, "documents"), "text", "source",
        n = 2, capacity = 4096, topK = 5)),

    "q_kll_weighted" -> ((s, dir) =>
      // weight-aware KLL: per-source doc-length quantiles where each doc
      // counts by a deterministic integer mass (doc_id%7+1, exercising
      // multi-bit binary-expansion inserts) — "percentile by token mass,
      // not by row count". Exact regime (level sizes << k), so the
      // weighted discrete quantile reproduces in SQL
      T(s, dir, "documents")
        .select(col("source"), col("n_chars").cast("double").as("__v"),
          (pmod(col("doc_id"), lit(7)) + 1).cast("long").as("__w"))
        .groupBy("source")
        .agg(graft.functions.GraftFunctions.kll_quantiles_weighted(
          col("__v"), col("__w"), Seq(0.5, 0.9), 2048).as("__q"))
        .select(col("source"), element_at(col("__q"), 1).as("p50"),
          element_at(col("__q"), 2).as("p90"))),

    "q_topk_group" -> ((s, dir) =>
      // per-source top-7 documents by length through the native bounded-
      // heap aggregate: O(k) pairs per group cross the shuffle, and the
      // aggregate form composes with other aggs / streaming (see
      // q_stream_topk). doc_id rides as a zero-padded string so the
      // aggregate's lexical tie-break equals numeric order, making the
      // row_number oracle reproduce it bit-for-bit
      Corpus.topKPerGroup(T(s, dir, "documents"), "source",
        col("n_chars").cast("double"),
        lpad(col("doc_id").cast("string"), 8, "0"), k = 7)
        .select(col("source"), col("rank"),
          col("item").cast("long").as("doc_id"), col("score"))),

    "q_cms_counts" -> ((s, dir) => {
      // Count–Min point queries: sketch the corpus's whitespace tokens
      // once (the mergeable broadcastable artifact), then probe the top
      // 100 tokens. width = ceil(e/2e-5) ≈ 136k >> the corpus's distinct
      // count, so the min over 7 grid rows is collision-free and every
      // estimate equals the exact count the oracle recomputes in SQL —
      // the exact regime that pins the sketch's update/merge/probe path
      val toks = T(s, dir, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("token"))
        .filter(col("token") =!= "")
      val cms = Corpus.frequencySketch(toks, "token")
      val top = toks.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token").asc).limit(100)
      Corpus.estimateFrequencies(top, "token", cms)
        .select(col("token"), col("exact_n"),
          (col("est_count") === col("exact_n")).as("est_ok"))
    }),

    "q_sketch_overlap" -> ((s, dir) => {
      // sketch-cheap contamination estimate: 13-gram overlap between the
      // corpus and the every-7th-doc benchmark via mergeable HLL sketches
      // (~16 KB per side crosses the shuffle, never the gram streams).
      // Oracled as a PROPERTY like q_approx_distinct: the exact distinct
      // counts cross-check the engines; the estimates must land within
      // the lgK=14 error envelope. benchmark ⊂ corpus, so exact union =
      // exact_a and exact intersect = exact_b
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      // derive each side's gram stream ONCE and persist: the sketch agg
      // and the oracle's exact count both read it, and the interpreted
      // HOF n-gram derivation (not the aggregation) dominates this gate's
      // cost — without the cache the plan DAG recomputes it four times
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val gAll = docs.select(explode(Corpus.ngramsCol(col("text"), 13))
        .as("__g")).persist(MEMORY_AND_DISK)
      val gB = bench.select(explode(Corpus.ngramsCol(col("text"), 13))
        .as("__g")).persist(MEMORY_AND_DISK)
      val est = Corpus.distinctOverlap(gAll, gB, "__g", lgK = 14)
      val exactA = gAll.agg(countDistinct(col("__g")).as("exact_a"))
      val exactB = gB.agg(countDistinct(col("__g")).as("exact_b"))
      est.crossJoin(exactA).crossJoin(exactB).select(
        col("exact_a"), col("exact_b"),
        (abs(col("est_a") - col("exact_a")).cast("double") /
          col("exact_a") <= 0.02).as("a_ok"),
        (abs(col("est_b") - col("exact_b")).cast("double") /
          col("exact_b") <= 0.02).as("b_ok"),
        (abs(col("est_union") - col("exact_a")).cast("double") /
          col("exact_a") <= 0.02).as("union_ok"),
        (abs(col("est_intersect") - col("exact_b")).cast("double") /
          col("exact_a") <= 0.05).as("intersect_ok"))
    }),

    "q_decontaminate" -> ((s, dir) => {
      // GPT-3-style 13-gram decontamination: every 7th doc doubles as the
      // benchmark, so those docs are fully contaminated and the rest carry
      // only natural overlap — all counts exactly reproduced by the oracle
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      Corpus.ngramDecontaminate(docs,
        docs.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text",
        n = 13)
    }),

    "q_dup_fraction" -> ((s, dir) => {
      // Lee-et-al duplication fraction: every 5th doc is planted back into
      // the corpus with a re-id and a short tail edit, so planted pairs
      // score near 1.0 while the rest carry only natural overlap — all
      // counts exactly reproduced by the oracle
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" extra tail")))
      Corpus.duplicatedGramFraction(docs.unionByName(copies), "doc_id",
        "text", n = 13)
    }),

    "q_lm_perplexity" -> ((s, dir) => {
      // CCNet-style bigram-LM quality signal: train interpolated counts on
      // the even-id half of the corpus, score the odd-id half (guarantees
      // the unseen-token smoothing path is exercised); rounded outputs are
      // engine-exact
      val docs = T(s, dir, "documents")
      Corpus.lmPerplexity(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    }),

    "q_cdc_chunks" -> ((s, dir) => {
      // content-defined chunking (Rabin window polynomial, rolling O(1)
      // kernel): boundaries depend only on LOCAL content, so a copy
      // whose TAIL is edited shares every prefix chunk with its
      // original — fixed-size blocks would misalign after the first
      // byte shift. Per-doc shared-chunk counts expose passage reuse;
      // the fingerprint is plain int64 arithmetic, recomputed exactly
      // by the DuckDB oracle (powers of 31 spelled out)
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.filter(pmod(col("doc_id"), lit(9)) === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(expr("substr(text, 1, length(text) - 5)"),
            lit(" tail edited now")).as("text"))
      Cdc.cdcShareStats(docs.unionByName(copies), "doc_id", "text",
        k = 8, divisor = 32)
    }),

    "q_subtract_seen_chunks" -> ((s, dir) => {
      // chunk-level incremental dedup (the CDC follow-on to
      // q_subtract_seen): the daily batch carries (a) tail-edited
      // re-crawls of history docs — their prefix chunks match verbatim,
      // shared fraction > 1/2, DROPPED — and (b) vowel-rewritten docs
      // whose chunks match nothing — KEPT. An exact content key sees
      // every batch row as new; the chunk key is what catches (a).
      val hist = T(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.subtractSeenChunks(chunkDedupBatch(s, dir), hist,
        "text", "doc_id", k = 8, divisor = 32, maxSharedFrac = 0.5)
    }),

    "q_stream_chunk_dedup" -> ((s, dir) => {
      // STREAMING chunk-level dedup — the ingest-time form of
      // q_subtract_seen_chunks: each micro-batch of the crawl stream
      // filters against the static accumulated corpus via foreachBatch →
      // subtractSeenChunks (per-doc decisions depend only on the doc's
      // own chunks vs history, so any micro-batch split reproduces the
      // batch answer exactly — the same oracle SQL applies verbatim).
      // maxFilesPerTrigger=1 forces a genuinely multi-batch run.
      val hist = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val stage = Files.createTempDirectory("graft_scd_feed").toString
      chunkDedupBatch(s, dir)
        .coalesce(2).write.mode("overwrite").parquet(stage)
      val outDir = Files.createTempDirectory("graft_scd_out").toString
      val stream = s.readStream
        .schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val ckpt = Files.createTempDirectory("graft_scd_ckpt").toString
      // the history chunk table is computed + persisted ONCE — inside
      // foreachBatch it would re-chunk the whole corpus per trigger
      val histChunks = Dedup.chunkTable(hist, "text", "doc_id",
          k = 8, divisor = 32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var batches = 0
      val q = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          batches += 1
          Dedup.subtractSeenChunksPre(b.toDF, histChunks, "text", "doc_id",
            k = 8, divisor = 32, maxSharedFrac = 0.5)
            .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      histChunks.unpersist(blocking = false)
      require(batches >= 2, s"multi-batch run expected, got $batches")
      s.read.parquet(outDir)
    }),

    "q_to_parquet" -> ((s, dir) => {
      // to_parquet + signal-schema sidecar round-trip: a hive-
      // partitioned export re-infers the partition column (long → int)
      // on a plain read and moves it last; the sidecar restores the
      // RECORDED schema, so the round-trip equals the source in rows,
      // order, and types (the oracle is the source table itself)
      val tmp = Files.createTempDirectory("graft_topq")
      val d = T(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      graft.io.Writers.toParquet(d, s"$tmp/out",
        partitionBy = Seq("n_regionkey"))
      val back = graft.io.Writers.readParquetExport(s, s"$tmp/out")
      require(back.schema.map(f => (f.name, f.dataType)) ==
        d.schema.map(f => (f.name, f.dataType)),
        s"sidecar must restore the recorded schema: ${back.schema} " +
          s"vs ${d.schema}")
      back
    }),

    "q_exact_substr" -> ((s, dir) => {
      // Lee-et-al ExactSubstr dedup: every 7th doc is replanted re-id'd
      // with a 4-token suffix appended — too short to form its own
      // 13-token window, so each copy's body is excised as ONE merged span
      // (the original, being globally first, survives verbatim) while the
      // windows straddling body+suffix stay unique and keep the copy's
      // tail. Spans, token counts, and rebuilt text all oracle exactly.
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"),
          lit(" planted unique suffix marker")))
      Corpus.exactSubstrDedup(docs.unionByName(copies), "doc_id", "text",
        minLen = 13)
    }),

    "q_blocklist" -> ((s, dir) =>
      // Aho–Corasick blocklist scan (the deferred C4 bad-word rule):
      // occurrence counts of 3 patterns incl. a 2-word phrase, overlapping
      // substring semantics — the oracle counts positions per pattern
      TextAnalysis.blocklistSignals(
        T(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", Seq("spark", "hash", "row scan"))
        .select("doc_id", "n_blocked", "blocklist_pass")),

    "q_bm25" -> ((s, dir) =>
      // BM25 relevance against a 3-term query; corpus stats (N, Σdl, df)
      // are one broadcast row, scores are exact-count arithmetic — the
      // oracle reproduces the formula term-for-term
      Corpus.bm25(T(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", Seq("spark", "table", "hash"))),

    "q_kmeans" -> ((s, dir) => {
      // engine-exact Lloyd's k-means (k=8, 2 update iterations) over the
      // embeddings: decimal-summed distances and means make every
      // assignment and centroid bit-reproducible — the oracle unrolls the
      // same two iterations in SQL
      val (assignments, _) =
        Similarity.kmeans(T(s, dir, "embeddings"), k = 8, iterations = 2)
      assignments
    }),

    "q_bbox_convert" -> ((s, dir) => {
      // bbox format conversion matrix (reference convert_bbox,
      // model/utils.py:23-191): deterministic COCO boxes from doc_id →
      // VOC canonical → back to COCO + YOLO + Albumentations + a
      // point-inside predicate, all pure codegen projections. Image size
      // 641×479: coprime to 10^4, so no 4-decimal rounding ties and the
      // banker's-vs-half-up difference between engines cannot surface
      import graft.model.CvColumns._
      val b = T(s, dir, "documents").select(col("doc_id"),
        array((col("doc_id") % 100).cast("double"),
          ((col("doc_id") * 3) % 80).cast("double"),
          (col("doc_id") % 7 + 10).cast("double"),
          (col("doc_id") % 11 + 5).cast("double")).as("coco"))
      val voc = bboxFromCoco(col("coco"))
      val vocL = voc.cast("array<long>")
      val cocoL = bboxToCoco(voc).cast("array<long>")
      val yolo = bboxToYolo(voc, lit(641), lit(479))
      val alb = bboxToAlbumentations(voc, lit(641), lit(479))
      // the driver's pandas comparator cannot sort raw array cells
      // (the q_group_collect precedent), so the four bbox arrays are
      // unpacked into 16 scalar columns — the conversion math is
      // identical, only the gate packaging changes
      b.select(col("doc_id"),
        vocL.getItem(0).as("voc0"), vocL.getItem(1).as("voc1"),
        vocL.getItem(2).as("voc2"), vocL.getItem(3).as("voc3"),
        cocoL.getItem(0).as("coco0"), cocoL.getItem(1).as("coco1"),
        cocoL.getItem(2).as("coco2"), cocoL.getItem(3).as("coco3"),
        yolo.getItem(0).as("yolo0"), yolo.getItem(1).as("yolo1"),
        yolo.getItem(2).as("yolo2"), yolo.getItem(3).as("yolo3"),
        alb.getItem(0).as("alb0"), alb.getItem(1).as("alb1"),
        alb.getItem(2).as("alb2"), alb.getItem(3).as("alb3"),
        bboxPointInside((col("doc_id") % 130).cast("double"),
          (col("doc_id") % 90).cast("double"), voc).as("pin"))
    }),

    "q_cluster_balance" -> ((s, dir) => {
      // cluster-balanced sampling (topic-diversity curation): the
      // engine-exact k-means topics are capped at 40 docs each in
      // deterministic md5 order, so a dominant topic can't flood the
      // curated set; the oracle wraps the unrolled-Lloyd SQL in the same
      // per-cluster cap. The row_number cap is map-side bounded
      // (WindowGroupLimit), never a full corpus ordering
      Similarity.clusterBalance(T(s, dir, "embeddings"), k = 8,
        iterations = 2, perCluster = 40)
    }),

    "q_c4_rules" -> ((s, dir) => {
      // C4 cleaning (Raffel et al. 2020): the corpus is single-line, so
      // synthesize a 3-line page per document (equal token thirds, each
      // closed with a period), then plant violations — every 7th doc says
      // "javascript" in line 2 (line rule), every 11th gains a lorem-ipsum
      // line (page rule), every 13th a brace (page rule). Short docs make
      // <5-word lines, exercising the word-count rule. All counts, keeps,
      // and rebuilt texts reproduce exactly in the oracle.
      val toks = filter(split(trim(col("text")), "\\s+"), w => length(w) > 0)
      val nt = size(toks)
      val k = (nt / lit(3)).cast("int")
      val l1 = concat(array_join(slice(toks, lit(1), k), " "), lit("."))
      val l2b = array_join(slice(toks, k + 1, k), " ")
      val l2 = when(col("doc_id") % 7 === 0,
        concat(l2b, lit(" javascript."))).otherwise(concat(l2b, lit(".")))
      val l3b = array_join(slice(toks, k * 2 + 1, nt - k * 2), " ")
      val l3 = when(col("doc_id") % 13 === 0,
        concat(l3b, lit(" {."))).otherwise(concat(l3b, lit(".")))
      val page = when(col("doc_id") % 11 === 0,
        concat_ws("\n", l1, l2, l3, lit("lorem ipsum dolor sit amet words.")))
        .otherwise(concat_ws("\n", l1, l2, l3))
      val input = T(s, dir, "documents")
        .select(col("doc_id"), page.as("text"))
      TextAnalysis.c4Signals(input, "doc_id", "text")
        .select("doc_id", "n_lines", "n_kept", "c4_keep", "text_clean")
    }),

    "q_weighted_sample" -> ((s, dir) =>
      // Efraimidis–Spirakis weighted sample, weight = document length:
      // md5-uniform keys make the draw engine-exact; TakeOrdered top-n
      Split.weightedSample(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        "doc_id", "n_chars", n = 100, seed = "ws")),

    "q_gopher_rules" -> ((s, dir) => {
      // Gopher/MassiveText quality rules (Rae et al. 2021 App. A): exact
      // integer counts + one 6-dp-rounded division per signal, so every
      // ratio, per-rule verdict, and the overall pass flag reproduce
      // bit-for-bit in the oracle
      TextAnalysis.gopherSignals(
        T(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .drop("text")
    }),

    "q_pagerank" -> ((s, dir) => {
      // link-graph authority signal (the web-graph document-quality input
      // of CommonCrawl-scale pipelines) over the supplier→part bipartite
      // graph from lineitem: 3 power iterations at d=0.85 with
      // dangling-mass redistribution (every part node is dangling, so the
      // correction path carries real mass). Decimal-summed, 12-dp-rounded
      // iterations are bit-exact cross-engine — the oracle unrolls the
      // same three iterations in SQL and hash-matches the full vector.
      val li = T(s, dir, "lineitem")
      val edges = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3)
    }),

    "q_ppr" -> ((s, dir) => {
      // personalized PageRank seeded on three supplier nodes: the
      // targeted-crawl scoring variant — rank flows from the seed set
      // through their parts, and dangling mass returns TO the seeds (p
      // replaces 1/n in teleport, init, and the dangling correction).
      // Same decimal-exact loop as q_pagerank; the oracle unrolls the
      // same three seeded iterations and hash-matches the full vector.
      import s.implicits._
      val li = T(s, dir, "lineitem")
      val edges = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      val seeds = Seq("s1", "s2", "s3").toDF("node")
      graft.ops.Graph.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iterations = 3)
    }),

    "q_triangles" -> ((s, dir) => {
      // per-node triangle count + local clustering coefficient over the
      // part co-occurrence graph (parts sharing an order, high-quantity
      // lineitems only — the filter keeps the graph sparse; unfiltered,
      // TPC-H co-occurrence is near-regular with degree ~1k at sf0.1 and
      // the wedge space explodes to billions). LCC separates organic
      // neighborhoods from clique-like spam farms — q_pagerank's
      // companion web-curation signal. Degree-oriented wedge join bounds
      // out-degree by O(sqrt E); counts exact, lcc one 12-dp-rounded
      // IEEE division — bit-exact cross-engine.
      val li = T(s, dir, "lineitem").filter(col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
      graft.ops.Graph.triangleCount(e, "src", "dst")
    }),

    "q_inverted_index" -> ((s, dir) =>
      // full inverted index over the corpus: df/tf per token plus the
      // ascending posting list as CSV (the array-safe compare surface)
      Corpus.invertedIndex(T(s, dir, "documents"), "doc_id", "text")),

    "q_random_projection" -> ((s, dir) =>
      // deterministic ±1 JL projection 64→16 dims: pure map-side fold,
      // no shuffle; the sign matrix regenerates from int_hash_64(j·131071
      // + i) so the oracle rebuilds all 1024 signs with the same HUGEINT
      // hash emulation as q_int_hash and decimal-sums identically
      Similarity.randomProjection(T(s, dir, "embeddings"), "embedding",
          outDim = 16)
        .select(col("vec_id"),
          posexplode(col("projected")).as(Seq("j", "y")))),

    "q_covariance" -> ((s, dir) =>
      // distributed Gramian: per-row pair products derive map-side and
      // partial-aggregate, so only O(dim^2 x partitions) partials cross
      // the exchange — the PCA/whitening input at any corpus size. The
      // oracle recomputes every upper-triangle cell with the same
      // 12-dp-decimal sums and hash-matches all 2080 of them
      Similarity.covarianceMatrix(T(s, dir, "embeddings"), "embedding")),

    "q_rrf" -> ((s, dir) => {
      // reciprocal-rank fusion of two retrieval runs over documents: a
      // length-prior run (n_chars) and a decorrelated pseudo-relevance
      // run (affine doc_id hash mod 101) — rank-only fusion, so the
      // oracle reproduces it with two row_number windows
      val docs = T(s, dir, "documents")
      val runA = docs.select(col("doc_id"),
        col("n_chars").cast("double").as("score"))
      val runB = docs.select(col("doc_id"),
        ((col("doc_id") * 37 + 11) % 101).cast("double").as("score"))
      Corpus.rrfFuse(Seq(runA, runB), "doc_id", "score", kRrf = 60)
    }),

    "q_url_dedup" -> ((s, dir) => {
      // URL canonicalization + dedup: three raw spellings per resource
      // class (shouty scheme/host + default port + tracking params +
      // fragment; clean https; http with :80 and a click id) collapse to
      // one canonical key, then a hash groupBy keeps the lowest doc_id.
      // The oracle rebuilds the same variants and canonicalization in SQL
      val d = col("doc_id")
      val raw = when(d % 3 === 0,
          concat(lit("HTTPS://WWW.Site"), (d % 20).cast("string"),
            lit(".COM:443/page/"), (d % 7).cast("string"),
            lit("/?utm_source=feed&b=2&a=1#sec")))
        .when(d % 3 === 1,
          concat(lit("https://www.site"), (d % 20).cast("string"),
            lit(".com/page/"), (d % 7).cast("string"), lit("?a=1&b=2")))
        .otherwise(
          concat(lit("http://site"), (d % 20).cast("string"),
            lit(".com:80/item/"), (d % 11).cast("string"), lit("?gclid=xyz")))
      T(s, dir, "documents").select(d, raw.as("__raw"))
        .select(d, graft.ops.TextAnalysis.canonicalUrl(col("__raw")).as("url"))
        .groupBy("url")
        .agg(min(d).as("keep_id"), count(lit(1)).as("dup_count"))
    }),

    "q_kcore" -> ((s, dir) => {
      // 4-core after 4 peel rounds over the sparse part co-occurrence
      // graph (quantity > 40 keeps it sparse enough that peeling bites:
      // 1924 nodes -> 858 at sf0.01). Exact integer degrees; the oracle
      // unrolls the same four rounds in SQL and hash-matches
      val li = T(s, dir, "lineitem").filter(col("l_quantity") > 40)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
      graft.ops.Graph.kCore(e, "src", "dst", k = 4, rounds = 4)
    }),

    "q_kcore_converged" -> ((s, dir) => {
      // the production peel-to-fixpoint entry point (Observation-counted
      // rounds, no fixed budget) on a sparser co-occurrence graph
      // (quantity > 46, k=3: fixpoint in ~4 rounds at both SFs, so the
      // eager per-round checkpoints stay cheap). Peeling is monotone —
      // once converged, extra rounds are no-ops — so the oracle's 8
      // unrolled rounds hash-match the true fixpoint.
      val li = T(s, dir, "lineitem").filter(col("l_quantity") > 46)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("l1").join(li.as("l2"),
          col("l1.l_orderkey") === col("l2.l_orderkey") &&
            col("l1.l_partkey") < col("l2.l_partkey"))
        .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
      graft.ops.Graph.kCoreConverged(e, "src", "dst", k = 3)
    }),

    "q_dsir" -> ((s, dir) => {
      // DSIR importance weights: curated target = src0/src1 docs, raw =
      // the other 18 sources; hashed unigram+bigram buckets (md5 mod 1024,
      // collisions are part of the model) make the feature space
      // engine-exact, so every weight reproduces bit-for-bit in the oracle
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      Corpus.dsirWeights(
        docs.filter(col("source").isin("src0", "src1")),
        docs.filter(!col("source").isin("src0", "src1")),
        "doc_id", "text", buckets = 1024, alpha = 1.0)
    }),

    "q_temperature_mix" -> ((s, dir) =>
      // temperature-flattened domain mix over a skewed corpus (every 3rd
      // doc dropped except in src0/src1, so domain sizes split 25/17/16):
      // rates derive from exact long counts only — no float summation —
      // and the md5 coin reproduces the exact surviving sample
      Corpus.temperatureMix(
        T(s, dir, "documents")
          .filter(col("doc_id") % 3 =!= 0 || col("source").isin("src0", "src1"))
          .select(col("doc_id"), col("source")),
        "doc_id", "source", temperature = 0.5, seed = "temp1")),

    "q_partitioned_dataset" -> ((s, dir) => {
      // hive-partitioned VERSIONS through the catalog: the save lays the
      // version out as lang=… directories, and a mixed predicate then
      // composes BOTH pruning levers — Spark's directory pruning on the
      // partition key, footer-stats file skipping on doc_id — under the
      // same immutable-version semantics (stats/bloom keys are
      // version-dir-relative so they survive the subdirs). Oracle is the
      // plain relational filter.
      val root = Files.createTempDirectory("graft_part").toString
      val cat = new Catalog(root, s)
      val docs = T(s, dir, "documents").repartitionByRange(4, col("doc_id"))
      cat.save(Chain(docs), "docs.part", partitionBy = Seq("lang"))
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      cat.readDatasetWhere("docs.part",
          col("lang").isin("en", "de") && col("doc_id") <= maxId / 2 &&
            col("n_chars") >= 50)
        .selectExcept("sys").toDF
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    "q_token_mix" -> ((s, dir) =>
      // token-budget "data recipe" mix (the Llama/Dolma mixture shape):
      // per-domain budgets filled in deterministic md5 order, boundary
      // doc included (budgets met, never undershot), whole-domain keep
      // when mass < budget, recipe-absent domains dropped. The oracle
      // replays the naive per-domain running sum — a hash match proves
      // the bucketed-histogram path (which never globally orders the
      // corpus) selects the IDENTICAL document set.
      Corpus.mixByTokenBudget(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").as("tokens")),
        "doc_id", "source", "tokens",
        budgets = Map("src0" -> 1000000L, "src1" -> 5000L,
          "src2" -> 2000L, "src3" -> 300L),
        seed = "tmix")),

    "q_bpe_mix" -> ((s, dir) => {
      // the cross-module composition data recipes actually need: train
      // a BPE on the corpus, count REAL tokens per document (not the
      // n_chars proxy), and fill per-domain token budgets with those
      // counts. The oracle re-derives the tokenizer (unrolled training
      // stages), recounts every document, and replays the running-sum
      // selection — one hash match certifying tokenizer AND recipe
      // together. Empty docs keep tokens=0 (LEFT JOIN + coalesce on
      // the oracle side; size() of an empty token array on ours), and
      // a NULL text also counts 0 — size() null-propagates (or yields
      // -1 under legacy sizeOfNull) where the oracle's LEFT JOIN +
      // coalesce counts 0; greatest(…, 0) skips nulls AND floors -1,
      // keeping both engines aligned on null-text rows either way.
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val model = graft.ops.Bpe.trainOn(docs, "text", numMerges = 8)
      Corpus.mixByTokenBudget(
        docs.select(col("doc_id"), col("source"),
          greatest(size(graft.ops.Bpe.tokensCol(col("text"), model)),
            lit(0)).cast("long").as("tokens")),
        "doc_id", "source", "tokens",
        budgets = Map("src0" -> 500000L, "src1" -> 3000L,
          "src2" -> 1200L, "src3" -> 200L),
        seed = "bmix")
    }),

    "q_ctx_windows" -> ((s, dir) => {
      // concatenate-and-cut sequence packing over REAL BPE token
      // counts — the pretraining input pipeline (distinct from
      // q_seq_pack's whole-doc shard packing: HERE documents split
      // across fixed windows, nothing padded or dropped): the corpus
      // token stream in seeded-hash order, cut into 512-token context
      // windows; one row per doc×window fragment. Composes the
      // trained tokenizer with the bucketed prefix-sum packer; the
      // oracle re-derives the tokenizer, every count, the global
      // order, and every fragment boundary
      val docs = T(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = graft.ops.Bpe.trainOn(docs, "text", numMerges = 8)
      val counts = docs.select(col("doc_id"),
        greatest(size(graft.ops.Bpe.tokensCol(col("text"), model)),
          lit(0)).cast("long").as("tokens"))
      Corpus.packSequences(counts, "doc_id", "tokens",
        seqLen = 512L, seed = "pack")
    }),

    "q_bpe_bytes" -> ((s, dir) => {
      // byte-level GPT-2-style BPE: closed 256-symbol alphabet via the
      // bytes_to_unicode mapping, regex pre-tokenization (the RE2-safe
      // variant both engines share), and a token-id vocabulary
      // (alphabet 0-255, 256+rank per merge, specials after) — the
      // fidelity mode that makes token budgets structurally
      // interchangeable with released byte-level tokenizers. The
      // fixture plants 2/3/4-byte UTF-8 so the byte expansion is
      // actually exercised; per-doc id checksums bound the output
      // while pinning every token and id (any difference breaks a
      // sum). The oracle re-derives the byte map, the pre-tokens,
      // every merge, and every id in SQL.
      val corpus = T(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(11)) === 0)
        .select(col("doc_id"),
          concat(expr("substr(text, 1, 200)"),
            lit(" café 中文 €9 𝄞x")).as("text"))
      val model = graft.ops.Bpe.trainBytesOn(corpus, "text", numMerges = 8)
      val ids = graft.ops.Bpe.tokenIds(model,
        specials = Seq("<|endoftext|>"))
      import s.implicits._
      val vocab = ids.toSeq.toDF("token", "token_id")
      graft.ops.Bpe.tokenize(corpus, "doc_id", "text", model)
        .join(vocab, "token")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("token_id")).as("id_sum"),
          sum(col("widx") * col("token_id")).as("wid_sum"),
          sum(col("tidx") * col("token_id")).as("tid_sum"))
        .withColumn("eot_id",
          lit(256 + model.merges.size).cast("long"))
    }),

    "q_bpe_roundtrip" -> ((s, dir) => {
      // decode is the exact inverse of encode: tokenize with a trained
      // byte-level model (multibyte chars, an astral emoji, an ASCII
      // special AND a non-Latin-1 special planted in every doc), then
      // detokenize — the oracle is the IDENTITY (the fixture itself),
      // so any asymmetry in the regex pre-tokenizer, the byte map, the
      // merge replay, the special splitting, or the token ordering
      // breaks the hash.
      val corpus = T(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(19)) === 0)
        .select(col("doc_id"),
          concat(expr("substr(text, 1, 220)"),
            lit(" ¡mixté! 🙂<|endoftext|>中<|fim▁|>ok")).as("text"))
      val model = graft.ops.Bpe.trainBytesOn(corpus, "text", numMerges = 6)
        .copy(specials = Vector("<|endoftext|>", "<|fim▁|>"))
      graft.ops.Bpe.detokenize(
        graft.ops.Bpe.tokenize(corpus, "doc_id", "text", model),
        "doc_id", model.specials)
    }),

    "q_bpe_extend" -> ((s, dir) => {
      // vocabulary EXPANSION: continue a trained byte-level model with
      // four MORE merges from the same corpus — greedy BPE is strictly
      // sequential, so the extended model must be bit-identical to an
      // 8-merge from-scratch train (old merge ranks — and therefore
      // already-assigned token ids — never move; streams encoded under
      // the 4-merge model stay decodable). The oracle derives the
      // 8-merge training and every token id independently in SQL.
      val corpus = T(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(17)) === 0)
        .select(col("doc_id"),
          concat(expr("substr(text, 1, 180)"),
            lit(" naïve 東京 ₿7")).as("text"))
      val base = graft.ops.Bpe.trainBytesOn(corpus, "text", numMerges = 4)
      val model = graft.ops.Bpe.extendBytesOn(corpus, "text", base,
        extraMerges = 4)
      require(model.merges.take(4) == base.merges,
        "extension must preserve the base ranks")
      import s.implicits._
      val vocab = graft.ops.Bpe.tokenIds(model).toSeq
        .toDF("token", "token_id")
      graft.ops.Bpe.tokenize(corpus, "doc_id", "text", model)
        .join(vocab, "token")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("token_id")).as("id_sum"),
          sum(col("widx") * col("token_id")).as("wid_sum"),
          sum(col("tidx") * col("token_id")).as("tid_sum"))
    }),

    "q_bpe_persist" -> ((s, dir) => {
      // the persisted tokenizer artifact + special-token splitting:
      // train byte-level BPE, SAVE it as a catalog dataset, LOAD it
      // back through a fresh Catalog instance, and tokenize a
      // marker-bearing corpus with the LOADED model. Two contracts
      // pinned at once: (1) the model round-trips bit-for-bit (token
      // budgets are reproducible across sessions only if it does), and
      // (2) a document CONTAINING `<|endoftext|>` encodes it as the
      // RESERVED id — tokenize splits ON specials before
      // pre-tokenization (GPT-2 semantics), never as ordinary bytes.
      // The tokenize corpus is text‖marker‖text so every plain
      // pre-token is in the training vocabulary — the oracle re-derives
      // training, the split, the global word index, and every id.
      val trainC = T(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("doc_id"), expr("substr(text, 1, 150)").as("text"))
      val corpus = trainC.select(col("doc_id"),
        concat(col("text"), lit("<|endoftext|>"), col("text")).as("text"))
      val trained = graft.ops.Bpe.trainBytesOn(trainC, "text",
          numMerges = 6)
        .copy(specials = Vector("<|endoftext|>"))
      val root = Files.createTempDirectory("graft_bpe_persist").toString
      graft.ops.Bpe.save(new Catalog(root, s), "tok", trained)
      val model = graft.ops.Bpe.load(new Catalog(root, s), "tok")
      require(model == trained, "persisted bpe model must round-trip")
      import s.implicits._
      val vocab = graft.ops.Bpe.tokenIds(model).toSeq
        .toDF("token", "token_id")
      graft.ops.Bpe.tokenize(corpus, "doc_id", "text", model)
        .join(vocab, "token")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("token_id")).as("id_sum"),
          sum(col("widx") * col("token_id")).as("wid_sum"),
          sum(col("tidx") * col("token_id")).as("tid_sum"))
    }),

    "q_token_mix_epochs" -> ((s, dir) =>
      // the UPSAMPLING half of data recipes: src0's budget is many times
      // its token mass, so the whole domain repeats floor(budget/mass)
      // epochs and the remainder pass (same md5 selection rule) tops it
      // up; src1 stays sub-mass (pure selection at epoch 0). The oracle
      // replays the epoch expansion with generate_series plus the naive
      // running-sum remainder.
      Corpus.mixByTokenBudgetEpochs(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars").as("tokens")),
        "doc_id", "source", "tokens",
        budgets = Map("src0" -> 200000L, "src1" -> 5000L),
        seed = "emix")
        // pin every numeric output to long: the oracle's HUGEINT-tainted
        // epoch column otherwise lands in pandas as float64 while Spark
        // writes int64 — the driver's comparator hashes dtypes, not
        // rendered strings, so equal values still hash-mismatch
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("tokens").cast("long").as("tokens"),
          col("epoch").cast("long").as("epoch"))),

    "q_wds_export" -> ((s, dir) => {
      // WebDataset round-trip: export documents as tar shards (range-
      // partitioned, sorted, rolling at 64 KiB), read the shards back with
      // the member reader, and prove key/ext/size/payload fidelity
      val out = Files.createTempDirectory("graft_wds").toString
      val members = T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(
          concat(lit("docs/"), format_string("%05d", col("doc_id")))
            .as("sample_key"),
          lit("txt").as("ext"), encode(col("text"), "UTF-8").as("data"))
        .repartitionByRange(4, col("sample_key"))
        .sortWithinPartitions("sample_key")
      graft.files.WebDataset.writeTarShards(members, out,
        maxShardBytes = 64 * 1024)
      graft.files.WebDataset.readTarMembers(s, s"$out/*.tar")
        .select(col("sample_key"), col("ext"), col("size"),
          decode(col("data"), "UTF-8").as("text"))
    }),

    "q_ann_hamming" -> ((s, dir) => {
      // binary-quantized ANN: sign-bit signatures (64 dims/limb) ranked by
      // XOR popcount — the 32×-smaller first-stage filter before exact
      // cosine re-rank at scale
      val emb = T(s, dir, "embeddings")
      Similarity.hammingTopK(emb,
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding")), k = 10)
    }),

    // ------------------------------------------- composite / incremental
    "q_pipeline_e2e" -> ((s, dir) => {
      // THE composed flagship: raw storage → executor-parallel listing →
      // schemaful JSONL ingest → heuristic lang-id → model-based quality
      // classifier → exact dedup vs ingested history (bloom + anti-join)
      // → MinHash-LSH near-dedup vs a near-duplicate history → GPT-3
      // 13-gram decontamination → temperature-flattened domain mix →
      // catalog save with a lineage dep, footer stats, and a bloom
      // index. One chain through every LLM-pipeline family; the oracle
      // recomputes each stage's surviving count (and the per-source mix)
      // from first principles, so a hash match proves the operators
      // compose — not just that each works alone.
      val root = Files.createTempDirectory("graft_pipe")
      val corpusDir = root.toString + "/corpus"
      val docs = T(s, dir, "documents")
      // every stage here is metadata-small next to the 32-thread session
      // default — scope the shuffle width down for the eager section (the
      // saves materialize the whole chain inside it), like the other
      // fixed-overhead-bound gates
      val prevSP = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      docs.select(to_json(struct(col("doc_id"), col("text"), col("lang"),
          col("source"))).as("value"))
        .repartition(8).write.mode("overwrite").text(corpusDir)
      val listed = FileOps.readStorage(s, corpusDir,
        pattern = Some("part-*")).toDF
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val raw = s.read
        .schema("doc_id LONG, text STRING, lang STRING, source STRING")
        .json(corpusDir + "/part-*")
        .persist(MEMORY_AND_DISK)
      val langed = raw.filter(TextAnalysis.langId(col("text")) === "en")
      val quality = langed.filter(
        TextAnalysis.qualityLogistic(col("text")) >= 0.5)
      val hist = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"))
      // each survivor set feeds several consumers (the next stage + its
      // own count branch) — persist so the stage-count union doesn't
      // recompute the whole prefix per branch
      val fresh = Dedup.subtractSeen(quality, hist, "text", "doc_id",
          expectedItems = 1000L, fpp = 0.01)
        .persist(MEMORY_AND_DISK)
      val hist2 = docs.filter(col("doc_id") % 5 === 0 && col("n_chars") >= 200)
        .select(col("doc_id"),
          concat(col("text"), lit(" tail marker token")).as("text"))
      val near = Dedup.subtractSeenNear(fresh, hist2, "text", "doc_id",
          threshold = 0.5, shingleCandidatesOnly = false)
        .persist(MEMORY_AND_DISK)
      val bench = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"))
      val contaminated = Corpus.ngramDecontaminate(
          near.select(col("doc_id"), col("text")), bench, "doc_id", "text",
          n = 13)
        .filter(col("contaminated")).select(col("doc_id"))
      val clean = near.join(contaminated, Seq("doc_id"), "left_anti")
        .persist(MEMORY_AND_DISK)
      val mixed = Corpus.temperatureMix(
          clean.select(col("doc_id"), col("source")), "doc_id", "source",
          temperature = 0.5, seed = "pipe")
        .persist(MEMORY_AND_DISK)
      val cat = new Catalog(root.toString + "/cat", s)
      val hv = cat.save(Chain(hist), "corpus.history")
      val fv = cat.save(Chain(mixed), "corpus.clean",
        deps = Seq(s"corpus.history@v$hv"), bloomCols = Seq("doc_id"))
      require(cat.depsOf("corpus.clean", fv) == Seq(("corpus.history", hv)),
        "pipeline lineage must record the history dependency")
      require(cat.fileStats("corpus.clean", fv).nonEmpty,
        "save must harvest footer stats")
      require(cat.fileBlooms("corpus.clean", fv).nonEmpty,
        "save must build the bloom index")
      val saved = cat.readDataset("corpus.clean").selectExcept("sys").toDF
      def stage(name: String, df: DataFrame) =
        df.agg(count(lit(1)).cast("long").as("n_rows"))
          .select(lit(name).as("stage"), col("n_rows"))
      Seq(stage("01_files_listed", listed),
        stage("02_ingested", raw),
        stage("03_lang_en", langed),
        stage("04_quality", quality),
        stage("05_after_exact_dedup", fresh),
        stage("06_after_near_dedup", near),
        stage("07_after_decontam", clean),
        stage("09_saved", saved))
        .reduce(_.unionAll(_))
        .unionAll(mixed.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_rows"))
          .select(concat(lit("08_mix_"), col("source")).as("stage"),
            col("n_rows")))
      } finally s.conf.set("spark.sql.shuffle.partitions", prevSP)
    }),

    "q_merge_stem" -> ((s, dir) => {
      // expression join on a path function — the reference's documented
      // merge-on-file_stem example (datachain.py:1630-1634)
      val l = Chain(T(s, dir, "documents").select(col("doc_id"),
        concat(lit("docs/doc_"), col("doc_id"), lit(".txt")).as("path"),
        col("n_chars")))
      val r = Chain(T(s, dir, "documents").select(
        concat(lit("doc_"), col("doc_id")).as("stem_key"), col("lang")))
      l.merge(r, on = Seq.empty, how = "inner",
          condition = Some(path_file_stem(col("path")) === col("stem_key")))
        .select("doc_id", "n_chars", "lang")
        .toDF
    }),

    "q_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val rows3 = w.rowsBetween(-2, Window.currentRow)
      val wr = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
        .rangeBetween(-100, Window.currentRow)
      E(s, dir).filter(col("user_id") < 100)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value").cast("decimal(18,6)")).over(rows3)
            .cast("double"), 4).as("moving_sum3"),
          round(sum(col("value").cast("decimal(18,6)")).over(wr)
            .cast("double"), 4).as("range_sum"))
    }),

    "q_sessionize" -> ((s, dir) =>
      graft.ops.Sessions.sessionize(
          E(s, dir).filter(col("user_id") < 100),
          keyCol = "user_id", tsCol = "ts", gapSec = 1800,
          tieBreak = Some("event_id"))
        .select("event_id", "user_id", "session_id")),

    "q_kfold" -> ((s, dir) =>
      // deterministic 5-fold CV assignment: zero-shuffle projection,
      // md5-content-hash folds reproduced bit-for-bit by the oracle
      graft.ops.Split.kFold(
        T(s, dir, "orders").select(col("o_orderkey")),
        "o_orderkey", k = 5, seed = "cv")),

    "q_weighted_sample_group" -> ((s, dir) =>
      // per-source weighted draw (weight = n_chars) through the bounded
      // heap: one pass samples every stratum at once, O(5) state per
      // group across the shuffle; the md5-derived A-ES keys make the
      // draw deterministic and SQL-replayable
      graft.ops.Split.weightedSamplePerGroup(
        T(s, dir, "documents").select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "doc_id", "n_chars", n = 5, seed = "wsg")),

    "q_salted_join" -> ((s, dir) =>
      // skew-salted fact⋈dim join, row-level parity with the plain join:
      // the salt spreads any hot part key across 8 reducers and the ×8
      // dim replication rides a (key, salt) equi-join — the shape for
      // when the dim outgrows broadcast and AQE skew-split can't fire
      graft.ops.Joins.saltedJoin(
          T(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_quantity")),
          T(s, dir, "part").select(col("p_partkey"), col("p_name")),
          "l_partkey", "p_partkey", buckets = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("p_name"), col("l_quantity"))),

    "q_interval_join" -> ((s, dir) => {
      // interval×interval overlap join, binned: both sides explode to
      // fixed-width bins, hash-join on (key, bin), exact-overlap filter,
      // and each pair emits ONLY from the bin of its overlap's left edge
      // — exact dedup with zero distinct shuffles and never a cross join
      def side(modulus: Int, mult: Int, len: Int) =
        E(s, dir).filter(pmod(col("event_id"), lit(modulus)) === 0)
          .select(col("event_id"),
            pmod(col("user_id"), lit(50)).as("k"),
            pmod(col("event_id") * mult, lit(10000)).cast("double").as("lo"))
          .withColumn("hi", col("lo") + len)
      val a = side(5, 37, 50)
      val b = side(7, 53, 30).select(col("event_id").as("b_event_id"),
        col("k").as("bk"), col("lo").as("blo"), col("hi").as("bhi"))
      graft.ops.Joins.intervalOverlapJoin(a, "lo", "hi", b, "blo", "bhi",
          binWidth = 64.0, keyCols = Seq("k" -> "bk"))
        .select(col("event_id").as("a_id"), col("b_event_id").as("b_id"),
          (least(col("hi"), col("bhi")) - greatest(col("lo"), col("blo")))
            .cast("long").as("overlap"))
    }),

    "q_funnel" -> ((s, dir) =>
      // ordered signup→view→purchase funnel, greedy-earliest chain per
      // user: each step is one min-agg + one entity-keyed join (no event
      // collection, no window sort — whale-user safe), all sharing one
      // partitioning. Timestamps surface as epoch-µs longs so the
      // DuckDB CTE chain reproduces them exactly
      graft.ops.Sessions.funnel(E(s, dir), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"),
          col("step_reached"))),

    "q_rolling_dau" -> ((s, dir) => {
      // rolling-7-day distinct users from mergeable daily HLL sketches:
      // each window is a sketch MERGE, never a 7-day rescan (exact
      // rolling distinct can't reuse yesterday's work). Property-oracled
      // like q_stream_distinct: exact counts cross-check the engines,
      // estimates must land in the lgK=14 envelope
      val ev = normTs(T(s, dir, "events"))
      val roll = graft.ops.Sessions.rollingDistinct(ev, "user_id", "ts",
        days = 7)
      val d = ev.select(date_trunc("day", col("ts")).as("__day"),
        col("user_id")).distinct()
      val days = d.select(col("__day")).distinct()
        .withColumn("__rn", row_number().over(Window.orderBy("__day")))
      val exactRolling = days.as("d1")
        .join(days.as("d2"),
          col("d2.__rn").between(col("d1.__rn") - 6, col("d1.__rn")))
        .join(d.as("dd"), col("dd.__day") === col("d2.__day"))
        .groupBy(col("d1.__day").cast("date").cast("string").as("day"))
        .agg(countDistinct(col("dd.user_id")).as("exact_rolling"))
      val exactDaily = d
        .groupBy(col("__day").cast("date").cast("string").as("day"))
        .agg(countDistinct(col("user_id")).as("exact_active"))
      roll.join(exactDaily, Seq("day")).join(exactRolling, Seq("day"))
        .select(col("day"), col("exact_active"), col("exact_rolling"),
          (abs(col("active") - col("exact_active")).cast("double") /
            col("exact_active") <= 0.02).as("daily_ok"),
          (abs(col("rolling_active") - col("exact_rolling")).cast("double") /
            col("exact_rolling") <= 0.02).as("rolling_ok"))
    }),

    "q_retention" -> ((s, dir) =>
      // weekly retention cohorts: cohort by ISO week of first event,
      // distinct (user, week) activity joined back on the entity key —
      // join input bounded by users×weeks, never raw events
      graft.ops.Sessions.retentionCohorts(E(s, dir), "user_id", "ts")),

    "q_pipeline_clean" -> ((s, dir) => {
      // end-to-end training-data cleaning: dedup (exact, keep min id) →
      // quality/token filters — the composite pipeline shape this engine
      // exists for, verified row-for-row against the oracle
      val docs = T(s, dir, "documents")
      val dups = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val corpus = docs.unionByName(dups)
        .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
      // keep-min-id per fingerprint via a windowed rank — ONE corpus scan
      // and one shuffle, where a groupBy + join-back would scan (and
      // re-fingerprint) the corpus twice
      val w = Window.partitionBy(col("fp"))
        .orderBy(col("doc_id").asc)
      corpus.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("token_count"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .filter(col("quality") >= 0.6 &&
          col("token_count").between(20, 100000))
    }),

    "q_delta_inc" -> ((s, dir) => {
      // delta-incremental save == full recompute (the delta correctness
      // property, checked against an oracle that computes the full result)
      val root = Files.createTempDirectory("graft_delta").toString
      val cat = new Catalog(root, s)
      def transform(c: Chain): Chain =
        c.mutate("value2" -> round(col("value") * 2, 6))
          .selectExpr(col("event_id"), col("event_type"), col("value2"))
      val v1 = Chain(E(s, dir).filter(col("event_id") < 5000)
        .select(col("event_id"), col("event_type"), col("value")))
      Delta.deltaSave(cat, v1, "ds", Seq("event_id"), Seq("value"), transform)
      // v2 bound covers all of sf0.01 (max id 9999), so the oracle diff is
      // over the full table there; at larger bench SFs it keeps the
      // snapshot write constant-sized
      val v2 = Chain(E(s, dir).filter(col("event_id") < 20000)
        .withColumn("value", when(pmod(col("event_id"), lit(7)) === 0,
          col("value") + 1).otherwise(col("value")))
        .select(col("event_id"), col("event_type"), col("value")))
      Delta.deltaSave(cat, v2, "ds", Seq("event_id"), Seq("value"), transform)
      cat.readDataset("ds").selectExcept("sys").toDF
    }),

    "q_delta_retry" -> ((s, dir) => {
      // Both retry modes (reference delta.py:126-186): run 1's transform
      // "fails" on event_id % 11 == 0 (error-column rows) and silently
      // DROPS event_id % 13 == 0 (rows missing from the result; the source
      // itself never changes, so only retryMissing can bring them back).
      // Run 2 replays a clean transform with retryOn + retryMissing; the
      // result must equal a clean full recompute — which is the oracle.
      val root = Files.createTempDirectory("graft_delta_retry").toString
      val cat = new Catalog(root, s)
      val src = Chain(E(s, dir).filter(col("event_id") < 5000)
        .select(col("event_id"), col("event_type"), col("value")))
      def flaky(c: Chain): Chain =
        c.filter(pmod(col("event_id"), lit(13)) =!= 0)
          .mutate(
            "value2" -> when(pmod(col("event_id"), lit(11)) === 0, lit(null)
                .cast("double"))
              .otherwise(round(col("value") * 2, 6)),
            "err" -> when(pmod(col("event_id"), lit(11)) === 0, lit("boom"))
              .otherwise(lit("")))
          .selectExpr(col("event_id"), col("event_type"), col("value2"),
            col("err"))
      def clean(c: Chain): Chain =
        c.mutate("value2" -> round(col("value") * 2, 6), "err" -> lit(""))
          .selectExpr(col("event_id"), col("event_type"), col("value2"),
            col("err"))
      Delta.deltaSave(cat, src, "ds", Seq("event_id"), Seq("value"), flaky)
      Delta.deltaSave(cat, src, "ds", Seq("event_id"), Seq("value"), clean,
        retryOn = Some("err"), retryMissing = true)
      cat.readDataset("ds").selectExcept("sys").toDF
    }),

    "q_stats_skipping" -> ((s, dir) => {
      // Catalog file-stats data skipping (Delta-style min/max pruning on
      // non-partition columns): a range-layout save records per-file
      // footer stats; a selective read must PROVE it pruned files
      // (asserted) and still return exactly the full-scan answer (oracle)
      val root = Files.createTempDirectory("graft_stats_skip").toString
      val cat = new Catalog(root, s)
      val orders = T(s, dir, "orders").repartitionByRange(8, col("o_orderkey"))
      cat.save(Chain(orders), "ord")
      val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
      val pred = col("o_orderkey") <= maxKey / 8
      val (kept, total) = cat.pruneCount("ord", pred)
      require(kept >= 1 && kept < total,
        s"stats skipping must prune files: kept $kept of $total")
      cat.readDatasetWhere("ord", pred).selectExcept("sys").toDF
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
    }),

    "q_optimize" -> ((s, dir) => {
      // the catalog's OPTIMIZE maintenance pass: a shattered 40-file save
      // rewrites as a Z-ordered compacted NEW version (lineage dep on the
      // old one) whose footer envelopes prune 2-D box predicates; the
      // oracle pins the rewrite lossless on user columns and the in-query
      // asserts pin the layout properties
      val root = Files.createTempDirectory("graft_optimize").toString
      val cat = new Catalog(root, s)
      val orders = T(s, dir, "orders").repartition(40)
      cat.save(Chain(orders), "ord")
      val (v2, before, after) = cat.optimize("ord", nFiles = 16,
        zorderBy = Some(("o_custkey", "o_totalprice")))
      require(before == 40 && after <= 16,
        s"optimize must compact: $before -> $after files")
      require(cat.depsOf("ord", v2)
          .map { case (n, dv) => s"$n@v$dv" } == Seq("ord@v1.0.0"),
        s"optimize must record lineage, got ${cat.depsOf("ord", v2)}")
      val mx = orders.agg(max("o_custkey"), max("o_totalprice")).head()
      val pred = col("o_custkey") <= mx.getLong(0) / 8 &&
        col("o_totalprice") <= mx.getDouble(1) / 8
      val (kept, total) = cat.pruneCount("ord", pred)
      require(kept < total / 2,
        s"optimized layout must prune the 2-D box: kept $kept of $total")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_optimize_hilbert" -> ((s, dir) => {
      // OPTIMIZE with the Hilbert curve instead of the Morton key —
      // same compaction/lineage/pruning contract as q_optimize, the
      // locality-maximal layout now reachable from the lake layer's
      // maintenance verb. Lossless oracle + in-query asserts (compact,
      // lineage, 2-D box prune) pin the layout properties.
      val root = Files.createTempDirectory("graft_opth").toString
      val cat = new Catalog(root, s)
      val orders = T(s, dir, "orders").repartition(40)
      cat.save(Chain(orders), "ord")
      val (v2, before, after) = cat.optimize("ord", nFiles = 16,
        zorderByCols = Seq("o_custkey", "o_totalprice"),
        curve = "hilbert")
      require(before == 40 && after <= 16,
        s"optimize must compact: $before -> $after files")
      require(cat.depsOf("ord", v2)
          .map { case (n, dv) => s"$n@v$dv" } == Seq("ord@v1.0.0"),
        s"optimize must record lineage, got ${cat.depsOf("ord", v2)}")
      val mx = orders.agg(max("o_custkey"), max("o_totalprice")).head()
      val pred = col("o_custkey") <= mx.getLong(0) / 8 &&
        col("o_totalprice") <= mx.getDouble(1) / 8
      val (kept, total) = cat.pruneCount("ord", pred)
      require(kept < total / 2,
        s"hilbert layout must prune the 2-D box: kept $kept of $total")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_auto_compact" -> ((s, dir) => {
      // auto-compaction folds the small-file debris of N drip appends
      // back into a bounded file count as a NEW layout-only version:
      // the bulk base file crosses as a hard link (filesReused), only
      // the debris rewrites, row identity is untouched (oracle = the
      // whole orders table the base+appends reassemble)
      val root = Files.createTempDirectory("graft_autocompact").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      val o = T(s, dir, "orders")
      cat.save(Chain(o.filter(col("o_orderkey") % 5 =!= 0).coalesce(1)),
        "ord")
      // six appends of disjoint slivers of the %5==0 band → six small
      // files beside one bulk file
      (0 until 6).foreach { i =>
        cat.append("ord", o.filter(col("o_orderkey") % 5 === 0 &&
          col("o_orderkey") % 6 === i))
      }
      val v = cat.latestVersion("ord").get
      val sizes = cat.versionDataFiles("ord", v)
      require(sizes.size == 7, s"expected 1 bulk + 6 debris, got $sizes")
      // threshold between debris and bulk, derived from the real sizes
      // so the gate is compression-proof
      val bulkBytes = sizes.values.max
      val r = cat.autoCompact("ord", maxSmallFiles = 3,
        smallBytes = bulkBytes, nFiles = 2)
      require(r.isDefined, "6 small files over a 3-file budget must compact")
      val res = r.get
      require(res.filesReused == 1,
        s"the bulk file must hard-link through untouched: $res")
      require(res.filesRewritten <= 2 && res.rowsAfter == res.rowsBefore,
        s"layout-only fold into <=2 files: $res")
      val after = cat.versionDataFiles("ord", res.version)
      require(after.size <= 3, s"post-compact layout: ${after.size} files")
      // below threshold now → the verb is idempotent (None, no version)
      require(cat.autoCompact("ord", maxSmallFiles = 3,
        smallBytes = bulkBytes, nFiles = 2).isEmpty,
        "a compacted layout must not re-trigger")
      cat.readDataset("ord").selectExcept("sys").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_vacuum" -> ((s, dir) => {
      // retention vacuum with the dependency-closure guard: keepLast=1
      // would delete both old base versions, but a derived dataset pins
      // the OLDEST through its recorded dep — only the unreferenced
      // middle version is deleted (asserted exactly, dry-run first),
      // and every survivor still reads from disk afterwards
      val root = Files.createTempDirectory("graft_vacuum").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      val o = T(s, dir, "orders")
      val v1 = cat.save(Chain(o), "base")
      val r2 = cat.deleteWhere("base", col("o_orderkey") % 7 === 0)
      val r3 = cat.deleteWhere("base", col("o_orderkey") % 11 === 0)
      cat.save(cat.readDataset("base", Some(v1)).selectExcept("sys")
          .filter(col("o_orderkey") % 13 === 0),
        "derived", deps = Seq(s"base@v$v1"))
      val expect = Seq(("base", r2.version))
      require(cat.vacuum(keepLast = 1, dryRun = true) == expect,
        "dry run must report exactly the unreferenced middle version")
      require(cat.versions("base").size == 3, "dry run must not delete")
      require(cat.vacuum(keepLast = 1) == expect,
        "vacuum must delete exactly the unreferenced middle version")
      require(cat.versions("base") == Seq(v1, r3.version),
        s"retention + dep closure survivors: ${cat.versions("base")}")
      require(cat.readDataset("base", Some(v1)).toDF.count() > 0 &&
        cat.readDataset("derived").toDF.count() > 0,
        "dep-protected version and its derived view must still read")
      require(cat.vacuum(keepLast = 1).isEmpty, "second vacuum is a no-op")
      cat.readDataset("base").selectExcept("sys").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_move_dataset" -> ((s, dir) => {
      // dataset rename/move across namespaces: every version moves, the
      // per-version meta is patched to the new name, the old name is
      // gone, the implied namespace registers, and a dependent's dep
      // still resolves via the version data (oracle = read-back row
      // identity of the moved latest)
      val root = Files.createTempDirectory("graft_move").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      val n = T(s, dir, "nation")
      cat.save(Chain(n.filter(col("n_nationkey") < 10)), "src_ds")
      cat.save(Chain(n), "src_ds")
      cat.moveDataset("src_ds", "archive.moved_ds")
      require(!cat.datasets().contains("src_ds") &&
        cat.datasets().contains("archive.moved_ds"),
        s"move must transfer the name: ${cat.datasets()}")
      require(cat.versions("archive.moved_ds").size == 2,
        "every version must move")
      require(cat.namespaces().contains("archive"),
        "the dot-path prefix must surface as a namespace")
      require(cat.readDataset("archive.moved_ds",
          cat.versions("archive.moved_ds").headOption).toDF.count() == 10,
        "old versions must read under the new name")
      // the datasets meta-chain reflects the patched name
      val names = cat.datasetsDF().select("name")
        .collect().map(_.getString(0)).toSet
      require(names.contains("archive.moved_ds") && !names.contains("src_ds"),
        s"meta-chain must carry the new name: $names")
      cat.readDataset("archive.moved_ds").selectExcept("sys").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_write_roundtrip" -> ((s, dir) => {
      // write-side fidelity through BOTH flat exports, with the HARD
      // content injected (the fixture text is clean): a comma, a double
      // quote, and an embedded newline appended to every row force the
      // CSV writer's quoting/escaping and the multiLine read path, and
      // the JSONL hop re-escapes the same bytes. Two hops later the
      // frame must equal the source (oracle injects identically)
      val tmp = Files.createTempDirectory("graft_wrt")
      val d = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          concat(col("text"), lit(", \"q\"\nend")).as("text"))
      graft.io.Writers.toCsv(d, s"$tmp/csv")
      val fromCsv = Chain.readCsv(s, s"$tmp/csv",
        schema = Some(d.schema), multiLine = true).toDF
      graft.io.Writers.toJsonl(fromCsv, s"$tmp/jsonl")
      Chain.readJson(s, s"$tmp/jsonl", schema = Some(d.schema)).toDF
    }),

    "q_checkpoint_reuse" -> ((s, dir) => {
      // checkpoint skip on re-run (reference datachain.py:696-723): the
      // SAME chain (by content hash) saved twice materializes once —
      // the rerun returns the existing version untouched; a CHANGED
      // chain gets a fresh version. Read-back of the reused version is
      // the oracle (the filtered region table)
      val root = Files.createTempDirectory("graft_ckpt").toString
      val cat = new Catalog(root, s)
      def chainA = Chain(T(s, dir, "region"))
        .filter(col("r_regionkey") < 4).select("r_regionkey", "r_name")
      val (v1, reused1) = cat.saveOrReuse(chainA, "ck")
      require(!reused1, "first save must materialize")
      val (v2, reused2) = cat.saveOrReuse(chainA, "ck")
      require(reused2 && v2 == v1,
        s"identical chain must reuse v$v1, got v$v2 reused=$reused2")
      require(cat.versions("ck") == Seq(v1), "no second version written")
      // a different chain (different predicate) must NOT reuse
      val (v3, reused3) = cat.saveOrReuse(
        Chain(T(s, dir, "region")).filter(col("r_regionkey") < 3)
          .select("r_regionkey", "r_name"), "ck")
      require(!reused3 && v3 != v1, "changed chain must re-materialize")
      cat.readDataset("ck", Some(v1)).selectExcept("sys").toDF
    }),

    "q_read_asof" -> ((s, dir) => {
      // TIMESTAMP AS OF time travel: an instant captured BETWEEN two
      // commits resolves to the earlier version — the pre-delete table
      // is the read-back (oracle: the whole nation table), even though
      // latest has rows removed. Both half-open edges pinned: asOf
      // before v1 throws, asOf now resolves latest
      val root = Files.createTempDirectory("graft_asof").toString
      val cat = new Catalog(root, s)
      val n = T(s, dir, "nation")
      val before = java.time.Instant.now.minusSeconds(3600)
      cat.save(Chain(n), "nat")
      // derive mid from v1's RECORDED createdAt, not a second wall-clock
      // read — an NTP backward step between two Instant.now calls would
      // otherwise make mid predate v1 and fail the gate spuriously
      val v1created = java.time.Instant.parse(
        cat.datasetsDF().select("created_at").head().getString(0))
      val mid = v1created.plusMillis(2)
      // ... and v2's stamp must land strictly after mid
      Thread.sleep(5)
      cat.deleteWhere("nat", col("n_nationkey") % 2 === 0)
      val asOf = cat.readDatasetAsOf("nat", mid)
      require(asOf.toDF.count() == 25, "asOf must see the pre-delete table")
      require(cat.readDatasetAsOf("nat", java.time.Instant.now)
        .toDF.count() < 25, "a now-instant resolves the post-delete latest")
      val thrown =
        try { cat.readDatasetAsOf("nat", before); false }
        catch { case _: IllegalArgumentException => true }
      require(thrown, "an instant before v1 must throw")
      asOf.selectExcept("sys").toDF
    }),

    "q_cme_guard" -> ((s, dir) => {
      // optimistic concurrency end-to-end: a maintenance writer that
      // read v1 must NOT be able to commit once a delete landed v2 —
      // its guarded commit aborts with ConcurrentMutationException,
      // leaves no version debris, releases the commit lock, and the
      // table reads as exactly the delete's survivors (the oracle)
      val root = Files.createTempDirectory("graft_cme").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
      val v1 = cat.save(Chain(o), "ord")
      cat.deleteWhere("ord", col("o_orderkey") % 7 === 0)
      val aborted =
        // the stale writer's content never lands — a tiny frame keeps
        // the gate's cost on the PROTOCOL, not a redundant table write
        try { cat.save(Chain(o.limit(50)), "ord", guardLatest = Some(v1))
          false }
        catch {
          case _: graft.catalog.ConcurrentMutationException => true
        }
      require(aborted, "a stale-base commit must abort, not overwrite")
      require(cat.versions("ord").size == 2,
        s"the aborted commit must leave no version: ${cat.versions("ord")}")
      // the lock is free again: a correctly-guarded follow-up commits
      val v2 = cat.latestVersion("ord").get
      cat.deleteWhere("ord", lit(false))
      require(cat.versions("ord").size == 3, "post-abort mutation lands")
      require(cat.rowsOf("ord", cat.latestVersion("ord").get) ==
        cat.rowsOf("ord", v2), "the no-op delete keeps every survivor")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_delete_where" -> ((s, dir) => {
      // copy-on-write DELETE: a range-laid orders version drops its low
      // key band as a NEW immutable version — the stats index proves the
      // high-range files can't hold a match, so they cross as hard links
      // (asserted: most files reused, zero bytes copied) and only the
      // overlapping files are rewritten; the read-back equals the SQL
      // NOT-filter (oracle), including NULL-predicate rows staying
      val root = Files.createTempDirectory("graft_delete").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val r = cat.deleteWhere("ord", col("o_orderkey") <= mx / 16)
      require(r.filesReused > 0 && r.filesRewritten < 8,
        s"delete must reuse untouched files: $r")
      require(r.rowsAfter < r.rowsBefore, s"delete must drop rows: $r")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_update_where" -> ((s, dir) => {
      // copy-on-write UPDATE: only files that may contain a predicate
      // match are rewritten (simultaneous assignment over the OLD row,
      // values cast back to the column's type so rewritten files stay
      // schema-identical to the hard-linked ones); oracle is the CASE
      // projection over the raw table
      val root = Files.createTempDirectory("graft_update").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val r = cat.updateWhere("ord", col("o_orderkey") <= mx / 16,
        Map("o_totalprice" -> (col("o_totalprice") * 2),
          "o_orderpriority" -> upper(col("o_orderpriority"))))
      require(r.filesReused > 0 && r.rowsAfter == r.rowsBefore,
        s"update must reuse untouched files and keep row count: $r")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_merge_into" -> ((s, dir) => {
      // copy-on-write MERGE INTO (upsert): matched target rows take the
      // source's values keeping their sys identity, unmatched source
      // rows insert with fresh ids past the version's footer-max; the
      // source's low-end keys can't touch high-range files (asserted
      // reuse). Oracle: anti-join + union over the same deterministic
      // source construction
      val root = Files.createTempDirectory("graft_merge").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val updates = o.filter(col("o_orderkey") <= mx / 16)
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      val inserts = o.filter(col("o_orderkey") <= mx / 32)
        .withColumn("o_orderkey", col("o_orderkey") + lit(mx + 1000000L))
      val r = cat.mergeInto("ord", updates.union(inserts), Seq("o_orderkey"))
      require(r.filesReused > 0,
        s"merge on low-end keys must reuse high-range files: $r")
      require(r.rowsInserted > 0 && r.rowsMatched > 0, s"merge shape: $r")
      require(r.rowsAfter == r.rowsBefore + r.rowsInserted, s"merge rows: $r")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_stream_append" -> ((s, dir) => {
      // exactly-once streaming ingest into the catalog: two staged
      // parquet files arrive as two micro-batches (maxFilesPerTrigger=1),
      // each landing as an O(batch) hard-link APPEND version whose batch
      // id commits atomically inside the meta.json; a FRESH-checkpoint
      // rerun re-offers all the data and must append nothing (the
      // marker scan covers the replayed ids) — exactly-once through
      // both checkpoint replay AND checkpoint loss
      val root = Files.createTempDirectory("graft_sapp").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val ev = T(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"))
          .filter(col("event_id") % 5 === 0)
        val stage = Files.createTempDirectory("graft_sapp_in")
          .toString + "/ev"
        ev.repartition(2).write.parquet(stage)
        val schema = s.read.parquet(stage).schema
        def run(ck: String): Unit = {
          val st = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(stage)
          val q = EventStream.appendToDataset(st, cat, "ev", ck)
          q.awaitTermination()
        }
        run(Files.createTempDirectory("graft_sapp_ck1").toString)
        require(cat.versions("ev").size >= 2,
          s"two micro-batches must land as versions: ${cat.versions("ev")}")
        val n1 = cat.rowsOf("ev", cat.latestVersion("ev").get)
        run(Files.createTempDirectory("graft_sapp_ck2").toString)
        val n2 = cat.rowsOf("ev", cat.latestVersion("ev").get)
        require(n1 == n2, s"lost-checkpoint rerun must be a no-op: $n1/$n2")
        cat.readDataset("ev").selectExcept("sys").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_table_stream" -> ((s, dir) => {
      // stream FROM a catalog table (Delta readStream.table): a save
      // plus two O(batch) appends surface as micro-batches of exactly
      // the table's rows — the committed-only _stream link protocol, so
      // a torn save can never leak into the feed
      val root = Files.createTempDirectory("graft_tst").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val c = T(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        cat.save(Chain(c.filter(col("c_custkey") % 3 === 0)), "cust")
        cat.append("cust", c.filter(col("c_custkey") % 3 === 1))
        cat.append("cust", c.filter(col("c_custkey") % 3 === 2))
        val st = Delta.datasetStream(cat, "cust")
        val ckpt = Files.createTempDirectory("graft_tst_ckpt").toString
        val qn = "tst_" + math.abs(scala.util.Random.nextInt())
        graft.streaming.EventStream.runAvailableNow(st, qn, ckpt,
          noDataBatch = false)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_stream_upsert" -> ((s, dir) => {
      // streaming CDC apply (Delta APPLY CHANGES INTO): a staged change
      // feed — updates, deletes, and brand-new keys, globally unique so
      // the final state is micro-batch-boundary independent — merges into
      // a range-laid orders version per batch (foreachBatch → mergeInto,
      // maxFilesPerTrigger=1 forces a multi-batch run); the maintained
      // table is the oracle
      val root = Files.createTempDirectory("graft_scdc").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val base = T(s, dir, "orders")
      val mx = base.agg(max("o_orderkey")).head().getLong(0)
      val updates = base.filter(col("o_orderkey") % 9 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("__del", lit(false))
      val deletes = base.filter(col("o_orderkey") % 9 === 1)
        .withColumn("__del", lit(true))
      val inserts = base.filter(col("o_orderkey") % 9 === 2)
        .withColumn("o_orderkey", col("o_orderkey") + lit(mx + 1000000L))
        .withColumn("__del", lit(false))
      val stage = Files.createTempDirectory("graft_scdc_feed").toString
      updates.union(deletes).union(inserts)
        .coalesce(2).write.mode("overwrite").parquet(stage)
      val stream = s.readStream
        .schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val ckpt = Files.createTempDirectory("graft_scdc_ckpt").toString
      graft.streaming.EventStream.applyChanges(stream, cat, "ord",
        Seq("o_orderkey"), ckpt, deleteCol = Some("__del"))
        .awaitTermination()
      require(cat.versions("ord").size > 2,
        s"multi-batch CDC must land multiple versions: ${cat.versions("ord")}")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_restore" -> ((s, dir) => {
      // RESTORE VERSION AS OF: an accidental DELETE rolls back as a new
      // zero-copy link-version (history intact, bad version still
      // time-travelable, one hard link per file); a shallow CLONE forks
      // the dataset the same way and mutates independently (asserted).
      // Oracle: the restored latest equals the original table
      val root = Files.createTempDirectory("graft_restore").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val v1 = cat.latestVersion("ord").get
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      cat.deleteWhere("ord", col("o_orderkey") <= mx / 4) // the accident
      cat.restore("ord", v1)
      val cv = cat.cloneDataset("ord", "ord_fork")
      cat.deleteWhere("ord_fork", col("o_orderkey") > mx / 2)
      require(cat.readDataset("ord_fork").toDF.count() <
        cat.readDataset("ord").toDF.count(),
        "clone must mutate independently of its source")
      require(cat.depsOf("ord_fork", cv).nonEmpty,
        "clone must record the cross-dataset lineage dep")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_merge_evolve" -> ((s, dir) => {
      // schema evolution on MERGE (Delta withSchemaEvolution): the source
      // carries a NEW column — matched rows take its value, every
      // pre-evolution row reads null. The version records the extended
      // schema + evolved flag, reads supply it explicitly, and the cold
      // files still cross as hard links (asserted)
      val root = Files.createTempDirectory("graft_evolve").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val src = T(s, dir, "orders")
        .filter(col("o_orderkey") <= mx / 16)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("audit_flag", col("o_orderkey") % 20 === 0)
      val r = cat.mergeInto("ord", src, Seq("o_orderkey"),
        evolveSchema = true)
      require(r.filesReused > 0 && r.rowsInserted == 0,
        s"low-band evolution must reuse cold files: $r")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_zorder_nd" -> ((s, dir) => {
      // N-column Z-ORDER (Delta's ZORDER BY (c1..cN)): a 3-dim quantile
      // z-curve clusters the rewrite so a single-dimension slab predicate
      // prunes files on EVERY dimension from footer stats alone —
      // asserted per dim; the oracle pins the rewrite lossless
      val root = Files.createTempDirectory("graft_znd").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders").repartition(40)
      cat.save(Chain(o), "ord")
      val (v2, _, after) = cat.optimize("ord", nFiles = 16,
        zorderByCols = Seq("o_custkey", "o_totalprice", "o_orderkey"))
      require(after <= 16, s"must compact to <=16 files, got $after")
      val mx = o.agg(max("o_custkey"), max("o_totalprice"),
        max("o_orderkey")).head()
      val preds = Seq(
        col("o_custkey") <= mx.getLong(0) / 8,
        col("o_totalprice") <= mx.getDouble(1) / 8,
        col("o_orderkey") <= mx.getLong(2) / 8)
      preds.foreach { p =>
        val (kept, total) = cat.pruneCount("ord", p, Some(v2))
        require(kept < total,
          s"3-dim z-layout must prune every dimension: $kept/$total for $p")
      }
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_optimize_where" -> ((s, dir) => {
      // partial OPTIMIZE (Delta's OPTIMIZE ... WHERE): only the hot low
      // quarter of a 32-file range layout compacts; the cold 3/4 cross
      // as hard links (asserted) — the small-file sweep that never
      // rewrites the cold bulk. Layout-only: oracle pins row identity
      val root = Files.createTempDirectory("graft_ow").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
        .repartitionByRange(32, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
      cat.save(Chain(o), "ord")
      val mx = o.agg(max("o_orderkey")).head().getLong(0)
      val r = cat.optimizeWhere("ord", col("o_orderkey") <= mx / 4,
        nFiles = 2)
      require(r.rowsBefore == r.rowsAfter, s"layout-only: $r")
      require(r.filesReused > 16 && r.filesRewritten < 8,
        s"cold files must link, hot band must compact: $r")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_catalog_sql" -> ((s, dir) => {
      // ANSI SQL over the catalog with time travel: datasets register
      // lazily as views (`nat` = latest, `nat_v1_0_0` = pinned), so one
      // anti-join recovers exactly the rows a copy-on-write DELETE
      // removed — the SQL face of immutable versioning
      val root = Files.createTempDirectory("graft_sql").toString
      val cat = new Catalog(root, s)
      cat.save(Chain(T(s, dir, "nation")), "nat")
      cat.deleteWhere("nat", col("n_regionkey") === 0L)
      cat.sql(
        """SELECT b.n_nationkey, b.n_name
          |FROM nat_v1_0_0 b LEFT ANTI JOIN nat a
          |  ON a.n_nationkey = b.n_nationkey
          |ORDER BY b.n_nationkey""".stripMargin)
    }),

    "q_cdf_sync" -> ((s, dir) => {
      // incremental CDF EXPORT: three syncs tail a mutation trail — the
      // first snapshots current rows as inserts (startingVersion
      // semantics), later ones append exactly the changes since the
      // version the LINEAGE dep of the last export records (sync state
      // lives in deps, vacuum-safe); a no-op sync writes nothing. The
      // consumer-side changesFeed replays the full history (oracle)
      val root = Files.createTempDirectory("graft_cdfsync").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("text")).filter(col("doc_id") < 60)
        cat.save(Chain(docs), "docs")                            // 1.0.0
        val n1 = Delta.syncChanges(cat, "docs", Seq("doc_id"))
        require(n1 == 60, s"first sync snapshots all rows: $n1")
        require(Delta.syncChanges(cat, "docs", Seq("doc_id")) == 0,
          "in-sync export must be a no-op")
        cat.deleteWhere("docs", col("doc_id") % 7 === 0)         // 1.1.0
        cat.updateWhere("docs", col("doc_id") % 5 === 0,
          Map("text" -> concat(col("text"), lit("!"))))          // 1.2.0
        Delta.syncChanges(cat, "docs", Seq("doc_id"))
        val inserts = docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat(lit("new"), col("doc_id")).as("text"))
        cat.mergeInto("docs", inserts, Seq("doc_id"))            // 1.3.0
        Delta.syncChanges(cat, "docs", Seq("doc_id"))
        Delta.changesFeed(cat, "docs").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_cdf_stream" -> ((s, dir) => {
      // the CONSUMER side of CDC as a structured stream: the same
      // mutation trail as q_cdf_sync, exported by three syncs, then
      // tailed by Delta.changesStream — each export version surfaces as
      // a file-source micro-batch, and the AvailableNow replay must
      // equal the batch changesFeed (same DuckDB oracle)
      val root = Files.createTempDirectory("graft_cdfst").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("text")).filter(col("doc_id") < 60)
        cat.save(Chain(docs), "docs")
        Delta.syncChanges(cat, "docs", Seq("doc_id"))
        cat.deleteWhere("docs", col("doc_id") % 7 === 0)
        cat.updateWhere("docs", col("doc_id") % 5 === 0,
          Map("text" -> concat(col("text"), lit("!"))))
        Delta.syncChanges(cat, "docs", Seq("doc_id"))
        val inserts = docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat(lit("new"), col("doc_id")).as("text"))
        cat.mergeInto("docs", inserts, Seq("doc_id"))
        Delta.syncChanges(cat, "docs", Seq("doc_id"))
        val stream = Delta.changesStream(cat, "docs")
        val ckpt = Files.createTempDirectory("graft_cdfst_ckpt").toString
        val qn = "cdfst_" + math.abs(scala.util.Random.nextInt())
        graft.streaming.EventStream.runAvailableNow(stream, qn, ckpt,
          noDataBatch = false)
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_matview_inc" -> ((s, dir) => {
      // incrementally-maintained materialized view, ADDITIVE path: a
      // delete + update + insert trail refreshes via pure signed-delta
      // arithmetic over the change feed — the source is never rescanned
      // (refresh cost ∝ changes, not table; the 100 TB MV story). Group
      // birth (new langs) and group death (lang dropped) both land
      // through envelope-pruned merges; a no-op refresh writes nothing.
      // Oracle: DuckDB recomputes the final groupBy from the
      // analytically-reconstructed table
      val root = Files.createTempDirectory("graft_mv").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val d = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        cat.save(Chain(d), "d")
        MatView.create(cat, "d_by_lang", "d", Seq("doc_id"), Seq("lang"),
          Seq(MvAgg("n_docs", "count", "*"), MvAgg("chars", "sum", "n_chars"),
            MvAgg("avg_chars", "avg", "n_chars")))
        cat.deleteWhere("d", col("doc_id") % 7 === 0)
        cat.updateWhere("d", col("doc_id") % 5 === 0,
          Map("n_chars" -> (col("n_chars") + lit(1000L))))
        val ins = d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("x_"), col("lang")).as("lang"), col("n_chars"))
        cat.mergeInto("d", ins, Seq("doc_id"))
        cat.deleteWhere("d", col("lang") === "en")
        val r = MatView.refresh(cat, "d_by_lang")
        require(r.mode == "additive" && r.upserted > 0 && r.deleted >= 1L,
          s"four mutations, one additive refresh, 'en' group dies: $r")
        require(MatView.refresh(cat, "d_by_lang").mode == "noop",
          "in-sync refresh must be a no-op")
        MatView.read(cat, "d_by_lang").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_matview_partitioned" -> ((s, dir) => {
      // MatView over a hive-PARTITIONED source — the untested
      // composition: the recompute path's dirty-group source read runs
      // partition-DIRECTORY pruning and the IN-pruned dirty keys
      // together (a one-lang deletion re-aggregates one lang's
      // partition, not the table), then an insert-only append stays on
      // the zero-source-scan additive path even with min present.
      // Oracle recomputes the final groupBy from the reconstructed table
      val root = Files.createTempDirectory("graft_mvpart").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val d = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        cat.save(Chain(d), "dp", partitionBy = Seq("lang"))
        val v0 = cat.latestVersion("dp").get
        require(cat.versionDataFiles("dp", v0).keys
            .forall(_.startsWith("lang=")),
          "source must be laid out under lang= partition dirs")
        MatView.create(cat, "mvp", "dp", Seq("doc_id"), Seq("lang"),
          Seq(MvAgg("lo", "min", "n_chars"), MvAgg("n", "count", "*"),
            MvAgg("chars", "sum", "n_chars")))
        // strip one lang's minima → exactly one dirty group; min +
        // removals force the recompute path, whose source read composes
        // partition pruning with the dirty-key IN prune
        cat.deleteWhere("dp", col("lang") === "en" &&
          col("n_chars") % 3 === 0)
        val r = MatView.refresh(cat, "mvp")
        require(r.mode == "recompute" && r.dirtyGroups == 1,
          s"one dirty lang through the recompute path: $r")
        // insert-only batch: min stays ADDITIVE (least/greatest), the
        // partitioned source is never rescanned
        cat.append("dp", d.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
            (col("n_chars") + 7L).as("n_chars")))
        val r2 = MatView.refresh(cat, "mvp")
        require(r2.mode == "additive",
          s"insert-only must stay additive: $r2")
        require(MatView.refresh(cat, "mvp").mode == "noop",
          "in-sync refresh must be a no-op")
        MatView.read(cat, "mvp").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_matview_minmax" -> ((s, dir) => {
      // materialized view, RECOMPUTE path: deleting rows can strip a
      // group's current min/max, which no bounded per-group state can
      // repair — the refresh re-aggregates exactly the dirty groups from
      // the source, pruned to the files whose stats overlap the dirty
      // keys. Inserted negative extremes must surface as new minima
      val root = Files.createTempDirectory("graft_mvmm").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val d = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        cat.save(Chain(d), "d")
        MatView.create(cat, "mm", "d", Seq("doc_id"), Seq("lang"),
          Seq(MvAgg("lo", "min", "n_chars"), MvAgg("hi", "max", "n_chars"),
            MvAgg("n", "count", "*")))
        cat.deleteWhere("d", col("n_chars") % 2 === 0)
        val ins = d.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            (-col("doc_id")).cast("long").as("n_chars"))
        cat.mergeInto("d", ins, Seq("doc_id"))
        val r = MatView.refresh(cat, "mm")
        require(r.mode == "recompute",
          s"min/max must take the recompute path: $r")
        require(MatView.refresh(cat, "mm").mode == "noop",
          "in-sync refresh must be a no-op")
        MatView.read(cat, "mm").toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_matview_distinct" -> ((s, dir) => {
      // DISTINCT-COUNT materialized view: HLL sketch state per group,
      // insert-only refresh UNIONS sketches (additive path — zero source
      // scans), removals would recompute. Property-oracled like
      // q_approx_distinct: the estimate is engine-specific, but at this
      // cardinality the sketch is exact, so est == exact distinct is
      // checkable cross-engine
      val root = Files.createTempDirectory("graft_mvd").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val d = T(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("source"))
        cat.save(Chain(d), "d")
        MatView.create(cat, "mvd", "d", Seq("doc_id"), Seq("lang"),
          Seq(MvAgg("n_docs", "count", "*"),
            MvAgg("n_sources", "approx_distinct", "source")))
        val ins = d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            concat(lit("mirror-"), col("source")).as("source"))
        cat.mergeInto("d", ins, Seq("doc_id"))
        val r = MatView.refresh(cat, "mvd")
        require(r.mode == "additive",
          s"insert-only batch must union sketches additively: $r")
        val exact = graft.core.Sys.drop(cat.readDataset("d").toDF)
          .groupBy("lang")
          .agg(count_distinct(col("source")).as("__exact"))
        MatView.read(cat, "mvd").toDF
          .join(exact, Seq("lang"))
          .select(col("lang"), col("n_docs"),
            (col("n_sources") === col("__exact")).as("distinct_ok"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_expectations" -> ((s, dir) => {
      // data-quality expectations at save (Delta CHECK constraints /
      // Deequ gates): a failing fail-mode constraint aborts BEFORE the
      // version is claimed (asserted: no visible version, zero cost via
      // the write's own Observation); then one save runs a drop + a
      // quarantine + a passing fail-mode gate together — kept rows are
      // the oracle, the quarantine version holds exactly the rejects,
      // and the outcome attrs audit every expectation on the meta
      val root = Files.createTempDirectory("graft_expect").toString
      val cat = new Catalog(root, s)
      val o = T(s, dir, "orders")
      val aborted =
        try { cat.save(Chain(o), "ord", expect = Seq(
          Expect("impossible", col("o_totalprice") < 0.0))); false }
        catch { case _: ExpectFailed => true }
      require(aborted && cat.versions("ord").isEmpty,
        "fail-mode violation must abort before the claim")
      cat.save(Chain(o), "ord", expect = Seq(
        Expect("cust_mod", col("o_custkey") % 7 =!= 3, mode = "drop"),
        Expect("key_mod", col("o_orderkey") % 10 =!= 0, mode = "quarantine"),
        Expect("key_positive", col("o_orderkey") > 0L)))
      val qRows = cat.readDataset("ord__quarantine").toDF.count()
      val expectQ = o.filter(col("o_orderkey") % 10 === 0).count()
      require(qRows == expectQ,
        s"quarantine must hold exactly the rejects: $qRows vs $expectQ")
      val meta = cat.readMeta("ord", cat.latestVersion("ord").get)
      require(meta.contains("expect:key_positive=pass") &&
        meta.contains("expect:cust_mod=dropped:") &&
        meta.contains("expect:quarantine=ord__quarantine@v"),
        s"outcome attrs must audit the expectations: $meta")
      cat.readDataset("ord").selectExcept("sys").toDF
    }),

    "q_change_feed" -> ((s, dir) => {
      // Delta-style CHANGE DATA FEED auditing a copy-on-write mutation
      // trail: delete → update → merge-insert land as three new immutable
      // versions, and readChanges(v1 → v4) reconstructs the net row-level
      // history with Delta's exact _change_type vocabulary (insert /
      // delete / update_preimage / update_postimage) from ONE full-outer
      // join — the oracle rebuilds all four legs analytically
      val root = Files.createTempDirectory("graft_cdf").toString
      val cat = new Catalog(root, s)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val docs = T(s, dir, "documents")
          .select(col("doc_id"), col("text")).filter(col("doc_id") < 60)
        cat.save(Chain(docs), "docs")
        val v1 = cat.latestVersion("docs").get
        cat.deleteWhere("docs", col("doc_id") % 7 === 0)
        cat.updateWhere("docs", col("doc_id") % 5 === 0,
          Map("text" -> concat(col("text"), lit("!"))))
        val inserts = docs.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"),
            concat(lit("new"), col("doc_id")).as("text"))
        val r = cat.mergeInto("docs", inserts, Seq("doc_id"))
        require(r.rowsMatched == 0 && r.rowsInserted > 0,
          s"fresh keys must all insert: $r")
        val v4 = cat.latestVersion("docs").get
        Delta.readChanges(cat, "docs", v1, v4, on = Seq("doc_id")).toDF
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }),

    "q_bloom_skipping" -> ((s, dir) => {
      // per-file BLOOM index (the skipping layer beyond min/max): a hash
      // layout makes every file's key range span the whole domain — range
      // stats can never prune an equality there — but the opt-in bloom on
      // the high-cardinality string key localizes a point lookup to the
      // file(s) actually holding the value (asserted), and the pruned
      // read still returns exactly the full-scan answer (oracle)
      val root = Files.createTempDirectory("graft_bloom_skip").toString
      val cat = new Catalog(root, s)
      val ev = E(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"))
        .withColumn("ekey", concat(lit("k"), col("event_id")))
        .repartition(16)
      cat.save(Chain(ev), "ev", bloomCols = Seq("ekey"))
      val (kept, total) = cat.pruneCount("ev", col("ekey") === "k7")
      require(kept >= 1 && kept < total / 2,
        s"bloom must localize the lookup: kept $kept of $total")
      cat.readDatasetWhere("ev", col("ekey") === "k7")
        .selectExcept("sys").toDF
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    "q_delta_storage" -> ((s, dir) => {
      // The reference's flagship incremental flow (delta.py:239-391 driven
      // by lib/listing.py): read_storage(delta=True) → transform → save.
      // Composes readStorageCached (listing dataset) → Delta.deltaSave
      // (listing diff on path+etag keys) over a file tree that MUTATES
      // between runs. The run-stamp column proves incrementality through
      // the oracle: unchanged files keep run=1 rows CARRIED from v1,
      // changed/new files are recomputed with run=2 — a full recompute
      // would stamp everything 2 and hash-mismatch. A third save over the
      // unchanged tree must be a no-op (asserted, version unchanged).
      val root = Files.createTempDirectory("graft_delta_storage").toString
      val src = Files.createTempDirectory("graft_ds_src").toString
      val cat = new Catalog(root, s)
      val docs = T(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      def stageFile(id: Long, text: String): Unit =
        Files.write(java.nio.file.Paths.get(src, s"doc$id.txt"),
          text.getBytes("UTF-8"))
      docs.filter(_._1 < 30).foreach { case (id, t) => stageFile(id, t) }
      var run = 0
      def listSrc(): Chain =
        FileOps.readStorageCached(cat, s, src, update = true)
          .mutate("path" -> col("file.path"), "etag" -> col("file.etag"))
      def transform(c: Chain): Chain = {
        val stamp = run
        FileOps.withTextContent(c, "file")
          .mutate("path" -> col("file.path"),
            "n_chars" -> length(col("content")).cast("long"),
            "run" -> lit(stamp))
          .selectExpr(col("path"), col("n_chars"), col("run"))
      }
      run = 1
      val r1 = Delta.deltaSave(cat, listSrc(), "docs", Seq("path"),
        Seq("etag"), transform)
      require(r1.fullRecompute, "first delta save must be a full compute")
      // mutate the tree: every doc_id % 3 == 0 file grows one char, ten
      // new files appear — mtime-size etags flip on the changed ones
      docs.filter { case (id, _) => id < 30 && id % 3 == 0 }
        .foreach { case (id, t) => stageFile(id, t + "!") }
      docs.filter(_._1 >= 30).foreach { case (id, t) => stageFile(id, t) }
      run = 2
      val changedN = docs.count { case (id, _) =>
        (id < 30 && id % 3 == 0) || id >= 30 }
      val r2 = Delta.deltaSave(cat, listSrc(), "docs", Seq("path"),
        Seq("etag"), transform)
      require(!r2.fullRecompute && r2.changedRows == changedN,
        s"expected incremental recompute of $changedN files, " +
          s"got full=${r2.fullRecompute} changed=${r2.changedRows}")
      // unchanged tree, fresh listing → no-op: version stands
      run = 3
      val r3 = Delta.deltaSave(cat, listSrc(), "docs", Seq("path"),
        Seq("etag"), transform)
      require(r3.changedRows == 0 && r3.version == r2.version,
        s"third save must be a no-op, got $r3 vs ${r2.version}")
      cat.readDataset("docs").selectExcept("sys").toDF
    }),

    "q_bbox_iou" -> ((s, dir) => {
      // CV model math (reference BBox): boxes derived from part attributes,
      // IoU/area/containment as pure Catalyst arithmetic
      import graft.model.CvColumns._
      val d = col("p_size").cast("double")
      val boxed = T(s, dir, "part").select(col("p_partkey"),
        array(d, d, d + 10.0, d + 10.0).as("box_a"),
        array(d + 5.0, d + 5.0, d + 20.0, d + 18.0).as("box_b"))
      boxed.select(col("p_partkey"),
        round(bboxArea(col("box_a")), 4).as("area_a"),
        round(bboxIou(col("box_a"), col("box_b")), 6).as("iou"),
        bboxContains(col("box_a"), col("box_b")).as("contains_b"))
    }),

    "q_polygon_area" -> ((s, dir) => {
      // Segment polygon math (shoelace) over synthetic quads
      import graft.model.CvColumns._
      val v = col("p_size").cast("double")
      T(s, dir, "part").select(col("p_partkey"),
        round(segmentArea(
          array(lit(0.0), v, v + 3.0, lit(1.0)),
          array(lit(0.0), lit(1.0), v, v + 1.0)), 4).as("area"))
    }),

    "q_file_du" -> ((s, dir) => {
      // per-directory cumulative sizes over a synthetic file tree derived
      // from documents (dir depth 2: source/subK/docN)
      val listing = T(s, dir, "documents").select(struct(
        lit("synth://x").as("source"),
        concat(col("source"), lit("/sub"), pmod(col("doc_id"), lit(3)),
          lit("/doc"), col("doc_id"), lit(".txt")).as("path"),
        col("n_chars").as("size"),
        lit("").as("version"), lit("").as("etag"), lit(true).as("is_latest"),
        lit(null).cast("timestamp").as("last_modified"),
        lit(null).cast("string").as("location")).as("file"))
      FileOps.du(listing)
    }),

    // ----------------------------------------- round-3 pipeline operators
    "q_dedup_clusters" -> ((s, dir) => {
      // near-dup edges (exact 3-gram Jaccard >= 0.5 over planted variants)
      // → connected components → cluster assignment; the "keep one doc per
      // duplicate cluster" primitive, end-to-end
      val base = T(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text"))
      val variants = base.filter(pmod(col("doc_id"), lit(4)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" tail")))
      val corpus = base.unionByName(variants)
      val g = corpus.select(col("doc_id"),
        TextAnalysis.charNgrams(col("text"), 3).as("grams"))
      val a = g.select(col("doc_id").as("id_a"), col("grams").as("ga"))
      val b = g.select(col("doc_id").as("id_b"), col("grams").as("gb"))
      val edges = a.join(b, col("id_a") < col("id_b"))
        .filter(Dedup.ngramJaccardArrays(col("ga"), col("gb")) >= 0.5)
        .select("id_a", "id_b")
      Dedup.connectedComponents(edges)
    }),

    "q_cc_star" -> ((s, dir) => {
      // large-star/small-star connected components (Kiveris et al.) on a
      // planted chain forest (50-link paths over consecutive doc_ids) —
      // the adversarial-diameter shape where min-label propagation needs
      // O(diameter) rounds; the star rounds contract each chain to its
      // min in a handful of rounds (lastStarRounds single-digit here).
      val d = T(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"))
      val e = d.as("x").join(d.as("y"),
          col("y.doc_id") === col("x.doc_id") + 1 &&
            pmod(col("x.doc_id"), lit(50)) =!= 49)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      Dedup.connectedComponentsStar(e)
    }),

    "q_doc_chunks" -> ((s, dir) =>
      // 1:N chunking for LLM context windows: 500-char chunks, 100 overlap
      T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(TextAnalysis.chunkText(col("text"), 500, 100)).as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          col("c.chunk").as("chunk"))),

    "q_tfidf" -> ((s, dir) => {
      // corpus-wide TF-IDF, top-3 terms per doc. The n_docs scalar is
      // always broadcast; the per-word df table is VOCABULARY-sized, so
      // its join strategy is left to AQE — broadcast when the vocabulary
      // fits, shuffle-hash when a web-scale corpus makes it gigabytes
      // (forcing broadcast here would OOM at 100 TB)
      val docs = T(s, dir, "documents").filter(col("doc_id") < 300)
      val words = docs.select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word").rlike("^[a-z]{3,}$"))
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "word").crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("word").asc)
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("doc_id", "word", "tfidf", "rk")
    }),

    "q_stratified" -> ((s, dir) =>
      // class-balanced deterministic sampling: <=20 docs per language,
      // chosen by md5 order (reproducible across engines and runs)
      Split.stratifiedSample(
        T(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id", 20)),

    "q_sample_det" -> ((s, dir) =>
      C(s, dir, "orders").sampleDeterministic(100, "o_orderkey")
        .select("o_orderkey", "o_totalprice").toDF),

    "q_pii_scrub" -> ((s, dir) =>
      // plant synthetic PII (email/phone/SSN) then scrub — validates the
      // redaction patterns byte-for-byte against the oracle's RE2 engine
      T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.scrubPii(concat(col("text"),
            lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-123-4567 ssn 123-45-6789")))
            .as("clean"))),

    "q_multimodal_frames" -> ((s, dir) => {
      // video frame-sampling plumbing (1:N) over synthetic payloads; the
      // byte-slicing math is SQL-expressible, so unlike the stubbed decode
      // this multimodal path is hash-checked against the oracle
      val media = Multimodal.syntheticMedia(
        T(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text")
      Multimodal.sampleFrames(media, 4)
        .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
    }),

    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      E(s, dir).filter(col("user_id") < 50).select(
        col("event_id"), col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(col("value") - lag(col("value"), 1).over(w), 6).as("delta_v"))
    }),

    "q_seq_pack" -> ((s, dir) =>
      // sequence packing: 4 parallel shard streams, ~2000-token packs
      graft.ops.Pack.byTokenBudget(
        T(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("tokens")),
        "tokens", "doc_id", budget = 2000, shards = 4)),

    "q_dedup_keep_best" -> ((s, dir) => {
      // keep-best dedup: one representative per content group chosen by a
      // quality key (longest doc, id-desc tiebreak), not just min id
      val docs = T(s, dir, "documents")
      val dups = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000)
      val corpus = docs.unionByName(dups)
        .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
      val w = Window.partitionBy(col("fp"))
        .orderBy(col("n_chars").desc, col("doc_id").desc)
      corpus.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("fp"), col("doc_id"), col("n_chars"))
    }),

    "q_contamination" -> ((s, dir) => {
      // train/test decontamination: flag test docs whose normalized-content
      // fingerprint appears in train (planted overlap guarantees hits).
      // At scale: semi-join on the 16-byte fingerprint only.
      val docs = T(s, dir, "documents")
      val train = docs.filter(pmod(col("doc_id"), lit(10)) < 8)
      val test = docs.filter(pmod(col("doc_id"), lit(10)) >= 8)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(17)) === 0)
          .withColumn("doc_id", col("doc_id") + 200000))
      val fpOf = (d: org.apache.spark.sql.DataFrame) =>
        d.select(col("doc_id"), TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      fpOf(test).join(fpOf(train).select("fp").distinct(), Seq("fp"), "left_semi")
        .select("doc_id", "fp")
    }),

    "q_fuzzy_match" -> ((s, dir) => {
      // fuzzy record matching on edit distance — candidate pairs pre-pruned
      // by a cheap equi-key (first word of the type) so the quadratic
      // levenshtein only runs inside blocks, the standard blocking design
      val p = T(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey"), col("p_type"),
          element_at(split(col("p_type"), " "), 1).as("blk"))
      val a = p.select(col("p_partkey").as("id_a"), col("p_type").as("ta"),
        col("blk"))
      val b = p.select(col("p_partkey").as("id_b"), col("p_type").as("tb"),
        col("blk"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("ta"), col("tb")))
        .filter(col("dist") <= 8)
        .select("id_a", "id_b", "dist")
    }),

    "q_text_clean" -> ((s, dir) =>
      // boilerplate removal: plant HTML + URLs, strip both
      T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.stripUrls(TextAnalysis.stripHtml(
            concat(lit("<html><body class=\"x\">"), col("text"),
              lit(" see https://example.com/a?b=1 and www.test.org now</body>"))))
            .as("clean"))),

    "q_repetition" -> ((s, dir) => {
      // Gopher-style repetition: duplicate-line fraction (array expr) +
      // top-token share computed relationally (explode → count → max),
      // which scales where a per-row HOF would be quadratic
      val docs = T(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"),
          concat(col("text"), lit("\nrepeat me\nrepeat me\nrepeat me"))
            .as("text"))
      val dup = docs.select(col("doc_id"),
        round(TextAnalysis.dupLineFraction(col("text")), 6).as("dup_line_frac"))
      val toks = docs.select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val top = toks.groupBy("doc_id")
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as("raw"))
        .select(col("doc_id"), round(col("raw"), 6).as("top_token_frac"))
      dup.join(top, "doc_id")
    }),

    "q_histogram" -> ((s, dir) =>
      // fixed-bound histogram for profiling: one aggregation, bucket ids
      // computed scan-side (width 50k, clamped to 10 buckets)
      T(s, dir, "orders")
        .groupBy(least(floor(col("o_totalprice") / 50000.0), lit(9.0))
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))),

    "q_provenance" -> ((s, dir) =>
      // per-row source-file provenance (reference ArrowRow, lib/arrow.py):
      // Spark's _metadata struct rides the scan for free — no extra I/O
      T(s, dir, "part")
        .filter(col("p_size") < 10)
        .select(col("p_partkey"),
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1)
            .as("src_file"),
          (col("_metadata.file_size") > 0).as("has_size"))),

    "q_file_find" -> ((s, dir) => {
      // `find` over a listing: glob + size predicates as pure Column
      // filters (same synthetic tree as q_file_du)
      val listing = T(s, dir, "documents").select(struct(
        lit("synth://x").as("source"),
        concat(col("source"), lit("/sub"), pmod(col("doc_id"), lit(3)),
          lit("/doc"), col("doc_id"), lit(".txt")).as("path"),
        col("n_chars").as("size"),
        lit("").as("version"), lit("").as("etag"), lit(true).as("is_latest"),
        lit(null).cast("timestamp").as("last_modified"),
        lit(null).cast("string").as("location")).as("file"))
      FileOps.find(listing, glob = Some("*/sub1/*.txt"), minSize = 500)
        .select(col("file.path").as("path"), col("file.size").as("size"))
    }),

    // ------------------------------------------------------ file listing
    "q_read_storage" -> ((s, dir) =>
      FileOps.readStorage(s, dir, pattern = Some("*.parquet"))
        .selectExpr(col("file.path").as("path"), col("file.size").as("size"))
        .toDF),

    "q_to_storage" -> ((s, dir) => {
      // end-to-end export sweep: stage one real file per document, list the
      // staging dir (readStorage), copy every blob through
      // FileOps.toStorage (executor-side stream-to-stream export), then
      // re-list the DESTINATION — the oracle recomputes each exported
      // file's (name, byte size) from the documents table, so a hash match
      // proves the export moved every file with byte-exact sizes.
      val src = Files.createTempDirectory("graft_tostorage_src").toString
      val dest = Files.createTempDirectory("graft_tostorage_dst").toString
      // fixture staging only (40 small files) — the operator under test is
      // the distributed list→export→re-list cycle below
      T(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect().foreach { r =>
          Files.write(
            java.nio.file.Paths.get(src, s"doc${r.getLong(0)}.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
      val listing = FileOps.readStorage(s, src, pattern = Some("*.txt"))
      FileOps.toStorage(listing.toDF, dest, placement = "filename")
      FileOps.readStorage(s, dest, pattern = Some("*.txt"))
        .selectExpr(col("file.path").as("path"), col("file.size").as("size"))
        .toDF
    }),

    "q_read_zip" -> ((s, dir) => {
      // zip-archive source: stage one real zip with MIXED methods (even
      // doc_ids stored, odd deflated), list it from the central directory
      // (ZipArchive.listZip — no archive scan), then pull every member's
      // payload through the lazy location pointer (readMember: local-header
      // walk + range read + inflate). The oracle recomputes each member's
      // (path, byte size, text) from the documents table, so a hash match
      // proves listing AND decompression are byte-exact for both methods.
      val tmp = Files.createTempDirectory("graft_zip_src").toString
      val zipPath = java.nio.file.Paths.get(tmp, "docs.zip")
      val zos = new java.util.zip.ZipOutputStream(
        java.nio.file.Files.newOutputStream(zipPath))
      // fixture staging only (40 small members) — the operator under test
      // is the distributed list→fetch→inflate cycle below
      T(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect().foreach { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          val e = new java.util.zip.ZipEntry(s"doc${r.getLong(0)}.txt")
          if (r.getLong(0) % 2 == 0) {
            e.setMethod(java.util.zip.ZipEntry.STORED)
            e.setSize(bytes.length.toLong)
            e.setCompressedSize(bytes.length.toLong)
            val crc = new java.util.zip.CRC32()
            crc.update(bytes)
            e.setCrc(crc.getValue)
          }
          zos.putNextEntry(e)
          zos.write(bytes)
          zos.closeEntry()
        }
      zos.close()
      FileOps.withTextContent(FileOps.readZip(s, zipPath.toString))
        .toDF
        .select(col("file.path").as("path"), col("file.size").as("size"),
          col("content"))
    }),

    "q_warc" -> ((s, dir) => {
      // WARC source (Common Crawl's interchange format): stage one real
      // .warc.gz (one gzip member per record — the CC convention), with a
      // warcinfo record, one request + one response per document, then read
      // back ONLY the responses with HTTP framing split off. The oracle
      // recomputes (uri, status, content-type, date, body text) from the
      // documents table, so a hash match proves record framing,
      // multi-member gunzip, header parse, HTTP split, AND payload bytes.
      val tmp = Files.createTempDirectory("graft_warc").toString
      val out = java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(tmp, "crawl-00000.warc.gz"))
      val docs = T(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), col("text")).collect()
      val httpHead =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
      val recs = Iterator(
        (Map("WARC-Type" -> "warcinfo",
             "WARC-Record-ID" -> "<urn:uuid:info>",
             "WARC-Date" -> "2026-01-02T03:04:05Z",
             "Content-Type" -> "application/warc-fields"),
          "software: graft\r\n".getBytes("UTF-8"))) ++
        docs.iterator.flatMap { r =>
          val id = r.getLong(0)
          val body = r.getString(1).getBytes("UTF-8")
          Iterator(
            (Map("WARC-Type" -> "request",
                 "WARC-Record-ID" -> s"<urn:uuid:req-$id>",
                 "WARC-Date" -> "2026-01-02T03:04:05Z",
                 "WARC-Target-URI" -> s"http://example.com/doc$id",
                 "Content-Type" -> "application/http; msgtype=request"),
              s"GET /doc$id HTTP/1.1\r\nHost: example.com\r\n\r\n"
                .getBytes("ISO-8859-1")),
            (Map("WARC-Type" -> "response",
                 "WARC-Record-ID" -> s"<urn:uuid:resp-$id>",
                 "WARC-Date" -> "2026-01-02T03:04:05Z",
                 "WARC-Target-URI" -> s"http://example.com/doc$id",
                 "Content-Type" -> "application/http; msgtype=response"),
              httpHead.getBytes("ISO-8859-1") ++ body))
        }
      graft.files.Warc.writeRecords(out, recs)
      graft.files.Warc.readRecords(s, tmp + "/*.warc.gz",
          types = Seq("response"))
        .select(col("target_uri").as("uri"), col("http_status"),
          col("http_content_type").as("http_ct"), col("warc_date"),
          col("payload").cast("string").as("content"))
    }),

    "q_html_text" -> ((s, dir) => {
      // the WET step: rule-based HTML -> text extraction. Each document is
      // wrapped in a real page (title, style+script blocks that MUST be
      // dropped wholesale, a comment, entity-escaped body text, &nbsp;/
      // &quot; entities); the oracle rebuilds the expected plain text from
      // the raw column, so a hash match proves block removal, tag
      // stripping, entity decode, and whitespace collapse are all exact.
      val esc = foldEscape(col("text"))
      T(s, dir, "documents").filter(col("doc_id") < 400)
        .select(col("doc_id"),
          concat(
            lit("<html><head><title>T</title><style type=\"text/css\">" +
              "p { color: red; }</style><script>if (1 < 2) { x(); }" +
              "</script></head><body><h1>Doc "),
            col("doc_id"),
            lit("</h1><!-- hidden --><p>"), esc,
            lit("&nbsp;&quot;end&quot;</p></body></html>")).as("html"))
        .select(col("doc_id"),
          TextAnalysis.htmlToText(col("html")).as("content"))
    }),

    "q_url_parse" -> ((s, dir) => {
      // URL component parsing + registered domain over six templates that
      // cover userinfo, explicit ports, IPv4 hosts, multi-part public
      // suffixes (co.uk, github.io), fragment-only tails. The oracle
      // CONSTRUCTS every expected field analytically from doc_id — a hash
      // match proves the parser, not a second parser.
      import graft.ops.Urls
      val m = col("doc_id") % 6
      val url =
        when(m === 0, concat(lit("https://WWW.Example.co.uk/articles/"),
          col("doc_id"), lit("?b=2&a=1#frag")))
        .when(m === 1, concat(lit("http://user@sub.blog.example.com:8080/post/"),
          col("doc_id")))
        .when(m === 2, concat(lit("https://10.0.0."), col("doc_id") % 200,
          lit("/health")))
        .when(m === 3, concat(lit("ftp://files.example.org/data/"),
          col("doc_id"), lit(".bin")))
        .when(m === 4, concat(lit("https://shop-"), col("doc_id") % 50,
          lit(".github.io/item?q=x")))
        .otherwise(lit("https://example.com#top"))
      T(s, dir, "documents").filter(col("doc_id") < 600)
        .select(col("doc_id"), url.as("url"))
        .withColumn("p", Urls.urlParts(col("url")))
        .select(col("doc_id"), col("url"),
          col("p.scheme").as("scheme"), col("p.host").as("host"),
          col("p.port").as("port"), col("p.path").as("path"),
          col("p.query").as("qs"), col("p.fragment").as("frag"),
          Urls.registeredDomain(col("p.host")).as("reg_domain"))
    }),

    "q_url_normalize" -> ((s, dir) => {
      // URL canonicalization for dedup keys: case folding, default-port
      // drop, root path, tracking-param strip, param sort, fragment drop.
      // Oracle constructs the expected canonical string per template.
      import graft.ops.Urls
      val m = col("doc_id") % 6
      val url =
        when(m === 0, lit("HTTPS://Example.COM:443/a/b?utm_source=x&b=2&a=1#sec"))
        .when(m === 1, lit("http://Example.org:80/"))
        .when(m === 2, concat(lit("https://Shop.Example.co.uk/p?gclid=1&id="),
          col("doc_id")))
        .when(m === 3, lit("http://a.b.example.net:8080?x=1"))
        .when(m === 4, concat(lit("https://example.com/search?q="),
          col("doc_id"), lit("&utm_medium=email&ref=home")))
        .otherwise(lit("https://example.com/path#frag"))
      T(s, dir, "documents").filter(col("doc_id") < 600)
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          Urls.urlNormalize(col("url")).as("norm"))
    }),

    "q_link_graph" -> ((s, dir) => {
      // Outlink graph from HTML: extract hrefs (mixed-case <a>/<A>, an
      // <img src> decoy that must NOT match), parse hosts, roll up to
      // registered domain (hN.co.uk — multi-part suffix path), count
      // in-links per domain. Oracle recomputes the degree table from
      // doc_id arithmetic. Scale shape: extraction/parsing are map-side
      // codegen; the only shuffle is the final tiny domain count.
      import graft.ops.Urls
      val r1 = col("doc_id") % 7
      val r2 = (col("doc_id") + 3) % 7
      val html = concat(
        lit("<p><a href=\"https://h"), r1, lit(".co.uk/d/"), col("doc_id"),
        lit("\">x</a> mid <img src=\"https://ignore.me/i.png\"> "),
        lit("<A href=\"https://h"), r2, lit(".co.uk/e/"), col("doc_id"),
        lit("\">y</A></p>"))
      T(s, dir, "documents").filter(col("doc_id") < 400)
        .select(Urls.extractLinks(html).as("links"))
        .select(explode(col("links")).as("link"))
        .select(Urls.registeredDomain(
          Urls.urlParts(col("link")).getField("host")).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n"))
    }),

    "q_read_orc" -> ((s, dir) => {
      // ORC as a first-class lake format: export a typed slice (longs,
      // ints, doubles, strings, date) through Writers.toOrc, read it back
      // via Chain.readOrc. DuckDB has no ORC reader, so the oracle reads
      // the SAME slice from the parquet source — a hash match proves the
      // ORC write+read round-trip is byte-faithful per type.
      val tmp = Files.createTempDirectory("graft_orc").toString + "/li"
      val src = T(s, dir, "lineitem")
        .filter(col("l_orderkey") % 40 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"),
          col("l_shipdate").cast("date").as("ship_date"))
      graft.io.Writers.toOrc(src, tmp)
      Chain.readOrc(s, tmp).toDF
    }),

    "q_read_avro" -> ((s, dir) => {
      // Avro as the row-oriented ingest sibling: the full orders table
      // (longs, strings, double, timestamp) exported as one container
      // per partition — executor-written via the Avro core runtime, no
      // spark-avro artifact — read back through the header-derived
      // schema. DuckDB has no Avro reader, so the oracle reads the same
      // rows from parquet: a hash match proves the write+read round-trip
      // is value-faithful per type, logical timestamps included
      val tmp = Files.createTempDirectory("graft_avro").toString + "/o"
      val src = T(s, dir, "orders").repartition(4)
      graft.io.Writers.toAvro(src, tmp)
      Chain.readAvro(s, tmp).toDF
    }),

    "q_crawl_e2e" -> ((s, dir) => {
      // The crawl front door composed end-to-end: stage a real .warc.gz
      // (warcinfo + request noise + HTML responses with messy URLs), then
      // ONE declarative chain does WARC read → HTTP split → WET text
      // extraction → URL canonicalization → eTLD+1 rollup → token count →
      // quality floor. The oracle reconstructs every output column
      // analytically from the documents table, so a hash match proves the
      // whole pipeline — framing, gunzip, HTML block removal, entity
      // decode, tracking-param strip, suffix-set rollup, tokenization —
      // composes exactly.
      import graft.ops.Urls
      val tmp = Files.createTempDirectory("graft_crawl").toString
      val out = java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(tmp, "crawl-00000.warc.gz"))
      val docs = T(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), col("text")).collect()
      def esc(t: String) =
        t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val httpHead =
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
      val recs = Iterator(
        (Map("WARC-Type" -> "warcinfo",
             "WARC-Record-ID" -> "<urn:uuid:info>",
             "WARC-Date" -> "2026-01-02T03:04:05Z",
             "Content-Type" -> "application/warc-fields"),
          "software: graft\r\n".getBytes("UTF-8"))) ++
        docs.iterator.flatMap { r =>
          val id = r.getLong(0)
          val uri =
            s"HTTPS://WWW.H${id % 5}-site.CO.UK/art/$id?utm_source=feed&id=$id"
          val html = "<html><head><title>T</title><style>s{color:red}" +
            "</style><script>if(1<2){x()}</script></head><body><h1>Doc " +
            id + "</h1><!-- c --><p>" + esc(r.getString(1)) +
            "&nbsp;&quot;end&quot;</p></body></html>"
          Iterator(
            (Map("WARC-Type" -> "request",
                 "WARC-Record-ID" -> s"<urn:uuid:rq$id>",
                 "WARC-Date" -> "2026-01-02T03:04:05Z",
                 "WARC-Target-URI" -> uri,
                 "Content-Type" -> "application/http; msgtype=request"),
              s"GET /art/$id HTTP/1.1\r\n\r\n".getBytes("ISO-8859-1")),
            (Map("WARC-Type" -> "response",
                 "WARC-Record-ID" -> s"<urn:uuid:rs$id>",
                 "WARC-Date" -> "2026-01-02T03:04:05Z",
                 "WARC-Target-URI" -> uri,
                 "Content-Type" -> "application/http; msgtype=response"),
              httpHead.getBytes("ISO-8859-1") ++ html.getBytes("UTF-8")))
        }
      graft.files.Warc.writeRecords(out, recs)
      graft.files.Warc.readRecords(s, tmp + "/*.warc.gz",
          types = Seq("response"))
        .select(col("target_uri"), col("payload").cast("string").as("html"))
        .withColumn("url", Urls.urlNormalize(col("target_uri")))
        .withColumn("p", Urls.urlParts(col("url")))
        .select(
          regexp_extract(col("p.path"), "/art/([0-9]+)", 1)
            .cast("long").as("doc_id"),
          col("url"),
          Urls.registeredDomain(col("p.host")).as("domain"),
          TextAnalysis.htmlToText(col("html")).as("content"))
        .withColumn("tokens", TextAnalysis.tokenCount(col("content")).cast("long"))
        .filter(col("tokens") >= 10)
        .select("doc_id", "url", "domain", "tokens", "content")
    }),

    "q_dataset_attrs" -> ((s, dir) => {
      // Dataset annotations (reference save(description=, attrs=) +
      // datasets(attrs=...) + update_dataset): three saves — one fully
      // annotated, one attrs-only, one bare then PATCHED in place via
      // updateDataset (no version bump) — listed back under the three
      // reference filter shapes: bare attr, name=* wildcard, multi-filter
      // conjunction. Oracle is the analytic truth table.
      val root = Files.createTempDirectory("graft_attrs").toString
      val cat = new Catalog(root, s)
      cat.save(Chain(T(s, dir, "nation")), "ds.a",
        description = "nations slice", attrs = Seq("nlp", "loc=US"))
      cat.save(Chain(T(s, dir, "region")), "ds.b", attrs = Seq("nlp", "loc=EU"))
      cat.save(Chain(T(s, dir, "region")), "ds.c")
      cat.updateDataset("ds.c", description = Some("patched later"),
        attrs = Some(Seq("vision", "loc=US")))
      def shaped(flt: String, attrs: Seq[String]) =
        cat.datasetsDF(attrs).select(lit(flt).as("flt"), col("name"),
          col("version"), col("rows"), col("description"),
          array_join(col("attrs"), ",").as("attrs_s"))
      shaped("nlp", Seq("nlp"))
        .union(shaped("loc=*", Seq("loc=*")))
        .union(shaped("both", Seq("loc=US", "vision")))
    }),

    "q_fuzzy_join" -> ((s, dir) => {
      // Record linkage across two tables: left = curated slice, right =
      // "scraped" mix of tail-marked near-dups (Jaccard deep above 0.5),
      // exact copies (1.0), and fresh junk. fuzzyJoin must return exactly
      // the true (left,right,similarity) pairs — the oracle recomputes ALL
      // cross-pair Jaccards exactly, so a hash match proves banded-LSH
      // recall AND verification precision AND the similarity values.
      val docs = T(s, dir, "documents")
      val left = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id").as("lid"), col("text"))
      val right = docs
        .filter(pmod(col("doc_id"), lit(6)) === 0 && col("n_chars") >= 200)
        .select((col("doc_id") + 500000).as("rid"),
          concat(col("text"), lit(" tail marker token")).as("rtext"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(6)) === 3)
          .select((col("doc_id") + 600000).as("rid"), col("text").as("rtext")))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(6)) === 1)
          .select((col("doc_id") + 700000).as("rid"),
            concat(lit("entirely fresh content row number "),
              col("doc_id")).as("rtext")))
      Dedup.fuzzyJoin(left, "text", "lid", right, "rtext", "rid",
        threshold = 0.5)
    })
  )

  /** HTML-escape the characters [[TextAnalysis.htmlToText]] decodes (& first). */
  private def foldEscape(c: Column): Column =
    Seq("&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;")
      .foldLeft(c) { case (acc, (ch, e)) => replace(acc, lit(ch), lit(e)) }

  // ======================================================================
  // DuckDB oracles — identical semantics, identical output column names.
  // ======================================================================

  /** Mirrors TextAnalysis.markerHits: distinct whole-token marker hits. */
  private def markerSql(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString("[", ",", "]")
    raw"len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')), $list))"
  }

  /** DuckDB emulation of our IntHash64 Catalyst expression: unsigned-64
    * wraparound multiply rebuilt from 32-bit limbs in HUGEINT (DuckDB
    * integer ops trap on overflow, so c * x mod 2^64 needs the split). */
  /** DuckDB emulation of [[graft.functions.Impl.intHash64]]'s unsigned
    * 64-bit pipeline (xor-shift + wrapping multiplies) over HUGEINT —
    * shared by the q_int_hash oracle and the random-projection sign
    * matrix. */
  private object IntHashSql {
    val m32 = "4294967296"; val m64 = "18446744073709551616"
    val c1 = "5544725790478674055"  // 0x4CF2D2BAAE6DA887
    val c2 = "18397679294719823053" // 0xFF51AFD7ED558CCD
    val c3 = "14181476777654086739" // 0xC4CEB9FE1A85EC53
    def xsh(v: String): String =
      s"CAST(xor(CAST($v AS UBIGINT), CAST($v AS UBIGINT) >> 33) AS HUGEINT)"
    def xorc1(v: String): String =
      s"CAST(xor(CAST($v AS UBIGINT), CAST($c1 AS UBIGINT)) AS HUGEINT)"
    def mulm(a: String, c: String): String =
      s"(((($a)%$m32)*(($c)%$m32) + (((($a)//$m32)*(($c)%$m32) + " +
        s"(($a)%$m32)*(($c)//$m32))%$m32)*$m32) % $m64)"
    def sgn(v: String): String =
      s"CAST(CASE WHEN $v >= 9223372036854775808 THEN $v - $m64 ELSE $v END AS BIGINT)"
  }

  /** The q_kmeans oracle (two Lloyd iterations unrolled in SQL) — shared
    * with q_cluster_balance, which wraps it in a per-cluster cap. */
  private val kmeansOracleSql: String =
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
      | c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, x
      |   FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
      | d1 AS (SELECT v.vec_id, c.cid,
      |     round(CAST(list_sum(list_transform(generate_series(1, 64),
      |       i -> CAST(round((v.x[i] - c.x[i]) * (v.x[i] - c.x[i]), 12)
      |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
      |   FROM v, c0 c),
      | a1 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |   FROM d1) WHERE rn = 1),
      | u1 AS (SELECT a.cid, i.i AS dim,
      |     round(CAST(sum(CAST(round(v.x[i.i], 12) AS DECIMAL(38,18)))
      |       AS DOUBLE) / count(*), 12) AS m
      |   FROM a1 a JOIN v USING (vec_id), generate_series(1, 64) AS i(i)
      |   GROUP BY a.cid, i.i),
      | c1 AS (SELECT cid, list(m ORDER BY dim) AS x FROM u1 GROUP BY cid),
      | d2 AS (SELECT v.vec_id, c.cid,
      |     round(CAST(list_sum(list_transform(generate_series(1, 64),
      |       i -> CAST(round((v.x[i] - c.x[i]) * (v.x[i] - c.x[i]), 12)
      |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
      |   FROM v, c1 c),
      | a2 AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
      |     row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |   FROM d2) WHERE rn = 1),
      | u2 AS (SELECT a.cid, i.i AS dim,
      |     round(CAST(sum(CAST(round(v.x[i.i], 12) AS DECIMAL(38,18)))
      |       AS DOUBLE) / count(*), 12) AS m
      |   FROM a2 a JOIN v USING (vec_id), generate_series(1, 64) AS i(i)
      |   GROUP BY a.cid, i.i),
      | c2 AS (SELECT cid, list(m ORDER BY dim) AS x FROM u2 GROUP BY cid),
      | d3 AS (SELECT v.vec_id, c.cid,
      |     round(CAST(list_sum(list_transform(generate_series(1, 64),
      |       i -> CAST(round((v.x[i] - c.x[i]) * (v.x[i] - c.x[i]), 12)
      |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
      |   FROM v, c2 c)
      |SELECT vec_id, cid AS cluster, d AS dist FROM (SELECT vec_id, cid, d,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |  FROM d3) WHERE rn = 1""".stripMargin

  private def intHash64OracleStages: String = {
    import IntHashSql._
    def both(f: String => String) = s"${f("a")} AS a, ${f("b")} AS b"
    s"""WITH i AS (SELECT o_orderkey,
       |  CAST(o_orderkey AS HUGEINT) + CASE WHEN o_orderkey < 0 THEN $m64 ELSE 0 END AS a,
       |  CAST(o_custkey AS HUGEINT) + CASE WHEN o_custkey < 0 THEN $m64 ELSE 0 END AS b
       | FROM orders WHERE o_orderkey < 3000),
       | s1 AS (SELECT o_orderkey, ${both(v =>
              s"CAST(xor(CAST($v AS UBIGINT), CAST($c1 AS UBIGINT)) AS HUGEINT)")} FROM i),
       | s2 AS (SELECT o_orderkey, ${both(xsh)} FROM s1),
       | s3 AS (SELECT o_orderkey, ${both(mulm(_, c2))} FROM s2),
       | s4 AS (SELECT o_orderkey, ${both(xsh)} FROM s3),
       | s5 AS (SELECT o_orderkey, ${both(mulm(_, c3))} FROM s4),
       | s6 AS (SELECT o_orderkey, ${both(xsh)} FROM s5)
       |SELECT o_orderkey, ${sgn("a")} AS ih_key, ${sgn("b")} AS ih_cust
       |FROM s6""".stripMargin
  }

  /** Unrolled k-core peel oracle (the q_kcore shape, round count as a
    * parameter): peeling is monotone, so unrolling MORE rounds than the
    * true fixpoint needs is a no-op and the result hash-matches
    * [[graft.ops.Graph.kCoreConverged]] exactly. */
  private def kcoreUnrolledSql(qty: Int, k: Int, rounds: Int): String = {
    // MATERIALIZED is load-bearing: each round references the previous
    // edge CTE three times, so default CTE inlining re-expands the whole
    // chain 3^rounds times (the 8-round unroll exhausted DuckDB's file
    // handles re-opening lineitem.parquet thousands of times)
    val head =
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |   WHERE l_quantity > $qty),
         | e0 AS MATERIALIZED (SELECT DISTINCT
         |     CAST(least(a.l_partkey, b.l_partkey) AS VARCHAR) AS a,
         |     CAST(greatest(a.l_partkey, b.l_partkey) AS VARCHAR) AS b
         |   FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |     AND a.l_partkey < b.l_partkey)""".stripMargin
    val body = (1 to rounds).map { i =>
      val p = i - 1
      s""", d$i AS (SELECT node, count(*) AS deg FROM (
         |     SELECT a AS node FROM e$p UNION ALL SELECT b FROM e$p) GROUP BY 1),
         | a$i AS (SELECT node FROM d$i WHERE deg >= $k),
         | e$i AS MATERIALIZED (SELECT e$p.a, e$p.b FROM e$p
         |   JOIN a$i x ON e$p.a = x.node JOIN a$i y ON e$p.b = y.node)""".stripMargin
    }.mkString("")
    s"""$head$body
       |SELECT node, count(*) AS degree FROM (
       |  SELECT a AS node FROM e$rounds UNION ALL SELECT b FROM e$rounds)
       |GROUP BY node""".stripMargin
  }

  /** Unrolled personalized-PageRank oracle (the q_pagerank shape with the
    * teleport vector concentrated on `seedsList`): p(v) = 1/|S∩V| on
    * seeds, 0 elsewhere, replacing 1/n in init, teleport, AND the
    * dangling redistribution — mirrors
    * [[graft.ops.Graph.personalizedPageRank]]'s decimal-exact arithmetic
    * term for term, so the full vector hash-matches. */
  private def pprUnrolledSql(seedsList: Seq[String], iters: Int): String = {
    val inList = seedsList.map(s => s"'$s'").mkString(", ")
    def p(alias: String) =
      s"(CASE WHEN $alias.node IN (SELECT node FROM sd) " +
        s"THEN 1.0/(SELECT sn FROM sn) ELSE 0.0 END)"
    val head =
      s"""WITH e AS (SELECT DISTINCT 's'||l_suppkey AS src, 'p'||l_partkey AS dst
         |   FROM lineitem),
         | nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         | dg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
         | sd AS (SELECT node FROM nd WHERE node IN ($inList)),
         | sn AS (SELECT CAST(count(*) AS DOUBLE) AS sn FROM sd),
         | r0 AS (SELECT nd.node, round(${p("nd")}, 12) AS rank FROM nd)""".stripMargin
    val body = (1 to iters).map { i =>
      val prev = i - 1
      s""", c$i AS (SELECT e.dst AS node,
         |     CAST(sum(CAST(round(r.rank/dg.d, 12) AS DECIMAL(38,18))) AS DOUBLE) AS c
         |   FROM e JOIN r$prev r ON e.src = r.node JOIN dg ON e.src = dg.src
         |   GROUP BY e.dst),
         | d$i AS (SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(38,18))) AS DOUBLE), 0) AS dm
         |   FROM r$prev r LEFT JOIN dg ON r.node = dg.src WHERE dg.src IS NULL),
         | r$i AS (SELECT nd.node, round(${p("nd")}*(1-0.85)
         |     + 0.85*(coalesce(c$i.c, 0) + (SELECT dm FROM d$i)*${p("nd")}), 12) AS rank
         |   FROM nd LEFT JOIN c$i ON nd.node = c$i.node)""".stripMargin
    }.mkString("")
    s"$head$body\nSELECT node, rank FROM r$iters"
  }

  def oracleSql: Map[String, String] = {
    val en = markerSql(TextAnalysis.enStop)
    val de = markerSql(TextAnalysis.deStop)
    val fr = markerSql(TextAnalysis.frStop)
    val es = markerSql(TextAnalysis.esStop)
    val all = markerSql(TextAnalysis.enStop ++ TextAnalysis.deStop ++
      TextAnalysis.frStop ++ TextAnalysis.esStop)
    val norm = raw"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"
    val tokCount = raw"(CASE WHEN trim(text) = '' THEN 0 ELSE " +
      raw"len(string_split_regex(trim(text), '\s+')) END)"
    val qualityProb =
      raw"""round(1.0 / (1.0 + exp(-(
           |  -1.0
           |  + 2.0 * least($tokCount / 100.0, 1.0)
           |  + 3.0 * least($all / 8.0, 1.0)
           |  - 4.0 * (CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
           |           / length(text) END)
           |  - 2.0 * (CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
           |           / length(text) END)
           |  + 0.5 * (CASE WHEN (CASE WHEN $tokCount = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
           |           / $tokCount END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
           |))), 6)""".stripMargin
    val langEnPred =
      s"""(greatest($en, $de, $fr, $es) > 0
         | AND $en = greatest($en, $de, $fr, $es))""".stripMargin
    val lmToks =
      raw"""list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '')""".stripMargin
    val qualityExpr =
      s"""round((
         |   (CASE WHEN $tokCount BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) +
         |   (CASE WHEN $all > 0 THEN 1.0 ELSE 0.0 END) +
         |   (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END) < 0.3 THEN 1.0 ELSE 0.0 END) +
         |   (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text) END) < 0.3 THEN 1.0 ELSE 0.0 END) +
         |   (CASE WHEN (CASE WHEN $tokCount = 0 THEN 0.0
         |      ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |           / $tokCount END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
         | ) / 5.0, 2)""".stripMargin

    gateMap(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
          | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
          | count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,

      "q_read_parquet" ->
        "SELECT p_partkey, p_brand, p_retailprice FROM part WHERE p_size < 20",

      "q_read_csv" -> "SELECT * FROM nation",
      "q_read_json" -> "SELECT * FROM region",

      "q_job_metrics" ->
        """SELECT 'gate_job' AS job, count(*) AS rows_seen,
          | CAST(sum(length(n_name)) AS BIGINT) AS name_chars
          |FROM nation""".stripMargin,

      "q_datasets" ->
        """SELECT 'meta.nations' AS name, '1.0.0' AS version,
          | (SELECT count(*) FROM nation) AS "rows"
          |UNION ALL
          |SELECT 'meta.nations', '1.1.0',
          | (SELECT count(*) FROM nation WHERE n_regionkey = 0)
          |UNION ALL
          |SELECT 'meta.regions', '1.0.0',
          | (SELECT count(*) FROM region)""".stripMargin,

      "q_schema_merge" ->
        """SELECT n_nationkey, n_name,
          | CASE WHEN n_nationkey >= 13 THEN n_regionkey END AS n_regionkey
          |FROM nation""".stripMargin,

      "q_read_hf" ->
        """SELECT CASE WHEN n_nationkey % 5 = 0 THEN 'validation'
          | ELSE 'train' END AS split,
          | n_nationkey, n_name, n_regionkey AS regionkey FROM nation""".stripMargin,

      "q_read_values" ->
        """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'alpha', 3.5),
          | (CAST(2 AS BIGINT), 'beta', -1.25),
          | (CAST(3 AS BIGINT), 'gamma', 0.0)) AS t(id, name, score)""".stripMargin,

      "q_read_records" ->
        """SELECT * FROM (VALUES
          | (CAST(1 AS BIGINT), 'ascii', 1.5),
          | (CAST(2 AS BIGINT), 'héllo', CAST(NULL AS DOUBLE)),
          | (CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), -2.25))
          | AS t(id, name, score)""".stripMargin,

      "q_json_infer" ->
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
          | CAST(n_chars AS BIGINT) AS n_chars FROM documents""".stripMargin,

      "q_jmespath" ->
        """SELECT s.k, CASE WHEN (doc_id + s.k) % 2 = 0 THEN 'a' ELSE 'b'
          |  END AS tag, doc_id*3 + s.k AS val
          |FROM documents, generate_series(0, 2) AS s(k)
          |WHERE doc_id < 400 AND (doc_id + s.k) % 2 = 0""".stripMargin,

      "q_jmespath_fns" ->
        """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400),
          | it AS (SELECT doc_id, (doc_id*3 + s.k*31) % 97 AS v
          |   FROM d, generate_series(0, 2) AS s(k)),
          | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          |   ORDER BY v DESC) AS rn FROM it)
          |SELECT 'pipe_max' AS fn, CAST(v AS VARCHAR) AS out
          |  FROM r WHERE rn = 1
          |UNION ALL SELECT 'contains', CAST(doc_id % 7 = 3 AS VARCHAR) FROM d
          |UNION ALL SELECT 'starts_with',
          |  CAST(starts_with('id-' || CAST(doc_id AS VARCHAR), 'id-1') AS VARCHAR) FROM d
          |UNION ALL SELECT 'to_number',
          |  CAST(CAST(doc_id*3 + 0.5 AS DOUBLE) AS VARCHAR) FROM d
          |UNION ALL SELECT 'map_first', CAST((doc_id*3) % 97 AS VARCHAR) FROM d
          |UNION ALL SELECT 'not_null',
          |  CASE WHEN doc_id % 2 = 1 THEN 'alt-' || CAST(doc_id AS VARCHAR)
          |       ELSE 'id-' || CAST(doc_id AS VARCHAR) END FROM d
          |UNION ALL SELECT 'sum', CAST(CAST((doc_id*3) % 97 + (doc_id*3+31) % 97
          |  + (doc_id*3+62) % 97 AS DOUBLE) AS VARCHAR) FROM d
          |UNION ALL SELECT 'min_by', CAST(least((doc_id*3) % 97,
          |  (doc_id*3+31) % 97, (doc_id*3+62) % 97) AS VARCHAR) FROM d
          |UNION ALL SELECT 'ends_with',
          |  CAST(ends_with('id-' || CAST(doc_id AS VARCHAR), '3') AS VARCHAR) FROM d
          |UNION ALL SELECT 'flatten_sum',
          |  CAST(CAST(doc_id*3 + 3 AS DOUBLE) AS VARCHAR) FROM d
          |UNION ALL SELECT 'mslist',
          |  'id-' || CAST(doc_id AS VARCHAR) || '-'
          |    || CAST(doc_id*3 AS VARCHAR) || '.5' FROM d
          |UNION ALL SELECT 'maxby_nested', CAST(k AS VARCHAR) FROM (
          |  SELECT doc_id, s.k, row_number() OVER (PARTITION BY doc_id
          |    ORDER BY (doc_id*7 + s.k*13) % 89 DESC) AS rn
          |  FROM d, generate_series(0, 2) AS s(k)) WHERE rn = 1
          |UNION ALL SELECT 'pipe_idx', CAST(least((doc_id*3) % 97,
          |  (doc_id*3+31) % 97, (doc_id*3+62) % 97) AS VARCHAR) FROM d""".stripMargin,

      "q_read_database" ->
        "SELECT n_nationkey, n_name, n_regionkey FROM nation",

      "q_read_database_part" ->
        "SELECT s_suppkey, s_name, s_nationkey FROM supplier",

      "q_export_version" ->
        "SELECT * FROM nation WHERE n_nationkey >= 5",

      "q_flatten" ->
        """SELECT doc_id, source, n_chars FROM documents
          |WHERE NOT (doc_id < (SELECT count(*) // 10 FROM documents))
          |  AND NOT (doc_id >=
          |    (SELECT count(*) * 9 // 10 FROM documents))""".stripMargin,

      "q_storage_stats" ->
        """SELECT CAST(3 AS BIGINT) AS versions,
          | (SELECT count(*) FROM documents) AS v1_rows,
          | (SELECT count(*) FROM documents WHERE NOT (doc_id < 50))
          |   AS v2_rows,
          | (SELECT count(*) FROM documents) AS v3_rows,
          | true AS logical_gt_physical,
          | true AS physical_positive""".stripMargin,

      "q_fsck" ->
        """SELECT * FROM (VALUES
          |  ('t', '-', 'stale-lock', 'warn'),
          |  ('t', 'v1.1.0', 'missing-data-file', 'critical'),
          |  ('t', 'vbackup', 'unparseable-version-dir', 'info'),
          |  ('u', 'v1.0.0', 'empty-data-dir', 'critical'))
          |  AS f(dataset, subject, finding, severity)""".stripMargin,

      "q_save_roundtrip" ->
        """SELECT s_nationkey, count(*) AS n_suppliers,
          | CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM supplier GROUP BY s_nationkey""".stripMargin,

      "q_mutate" ->
        """SELECT p_partkey, round(p_retailprice * 1.1, 2) AS bumped,
          | upper(p_brand) AS brand_u, CAST(length(p_name) AS BIGINT) AS name_len
          |FROM part""".stripMargin,

      "q_filter" ->
        """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
          |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')
          | AND c_name LIKE 'Customer%'
          | AND regexp_matches(c_name, '[02468]$')
          | AND c_acctbal > 0""".stripMargin,

      "q_order_limit" ->
        """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

      "q_offset" ->
        """SELECT o_orderkey, o_custkey FROM orders
          |ORDER BY o_orderkey ASC LIMIT 15 OFFSET 10""".stripMargin,

      "q_distinct" ->
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

      "q_chunk" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_orderkey % 4 = 1""".stripMargin,

      "q_shuffle" -> "SELECT n_nationkey, n_name, n_regionkey FROM nation",

      "q_union" ->
        """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 100
          |UNION ALL
          |SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_orderkey BETWEEN 50 AND 150""".stripMargin,

      "q_subtract" ->
        """SELECT c_custkey, c_name FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

      "q_merge_inner" ->
        """SELECT o.o_orderkey, o.o_custkey AS c_custkey, c.c_name, o.o_totalprice
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

      "q_merge_left" ->
        """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
          |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
          |WHERE c.c_custkey <= 500""".stripMargin,

      "q_merge_full" ->
        """WITH l AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey < 2),
          | r AS (SELECT n_nationkey, n_name FROM nation WHERE n_regionkey > 0)
          |SELECT COALESCE(l.n_nationkey, r.n_nationkey) AS n_nationkey,
          | l.n_name AS n_name, r.n_name AS right_n_name
          |FROM l FULL JOIN r ON l.n_nationkey = r.n_nationkey""".stripMargin,

      "q_merge_expr" ->
        """SELECT n.n_nationkey, n.n_name, r.r_name
          |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin,

      "q_diff" ->
        """WITH oldv AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
          | newv AS (SELECT o_orderkey,
          |   CASE WHEN o_orderkey % 5 = 0 THEN round(o_totalprice * 2, 2)
          |        ELSE o_totalprice END AS o_totalprice
          |   FROM orders WHERE o_orderkey % 11 <> 0)
          |SELECT
          | CASE WHEN r.o_orderkey IS NULL THEN l.o_orderkey
          |      WHEN l.o_orderkey IS NULL THEN r.o_orderkey
          |      ELSE l.o_orderkey END AS o_orderkey,
          | CASE WHEN l.o_orderkey IS NULL THEN r.o_totalprice
          |      ELSE l.o_totalprice END AS o_totalprice,
          | CASE WHEN r.o_orderkey IS NULL THEN 'A'
          |      WHEN l.o_orderkey IS NULL THEN 'D'
          |      WHEN l.o_totalprice <> r.o_totalprice THEN 'M'
          |      ELSE 'S' END AS status
          |FROM newv l FULL JOIN oldv r ON l.o_orderkey = r.o_orderkey""".stripMargin,

      "q_file_diff" ->
        """WITH oldv AS (SELECT 'doc_' || doc_id || '.txt' AS path,
          |   CAST(n_chars AS VARCHAR) AS etag
          |   FROM documents WHERE doc_id % 13 <> 0),
          | newv AS (SELECT 'doc_' || doc_id || '.txt' AS path,
          |   CASE WHEN doc_id % 17 = 0 THEN CAST(n_chars + 1 AS VARCHAR)
          |        ELSE CAST(n_chars AS VARCHAR) END AS etag
          |   FROM documents)
          |SELECT
          | CASE WHEN l.path IS NULL THEN r.path ELSE l.path END AS path,
          | CASE WHEN r.path IS NULL THEN 'A'
          |      WHEN l.path IS NULL THEN 'D'
          |      WHEN l.etag <> r.etag THEN 'M'
          |      ELSE 'S' END AS status
          |FROM newv l FULL JOIN oldv r ON l.path = r.path
          |WHERE NOT (l.path IS NOT NULL AND r.path IS NOT NULL AND l.etag = r.etag)""".stripMargin,

      "q_group_collect" ->
        """SELECT l_orderkey,
          | string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS items_csv,
          | count(*) AS n
          |FROM lineitem WHERE l_orderkey < 1000 GROUP BY l_orderkey""".stripMargin,

      "q_group_concat" ->
        """SELECT c_nationkey,
          | string_agg(c_mktsegment, '|' ORDER BY c_mktsegment) AS segs,
          | count(*) AS n
          |FROM customer GROUP BY c_nationkey""".stripMargin,

      "q_cube" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,

      "q_rollup" ->
        """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
          | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
          | count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |GROUP BY ROLLUP(EXTRACT(year FROM o_orderdate),
          |                EXTRACT(month FROM o_orderdate))""".stripMargin,

      "q_pivot" ->
        """SELECT l_returnflag,
          | CAST(sum(CASE WHEN l_linestatus = 'F'
          |   THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
          | CAST(sum(CASE WHEN l_linestatus = 'O'
          |   THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_unpivot" ->
        """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
          |  l_quantity AS value
          |FROM lineitem WHERE l_orderkey < 100
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
          |FROM lineitem WHERE l_orderkey < 100
          |UNION ALL
          |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
          |FROM lineitem WHERE l_orderkey < 100""".stripMargin,

      "q_intersect" ->
        // IS NOT DISTINCT FROM mirrors semiJoin's null-safe <=> exactly
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey IS NOT DISTINCT FROM c.c_custkey)""".stripMargin,

      "q_group_by_file" ->
        """SELECT 's3://corpus' AS file_source,
          | 'docs/sub' || CAST(doc_id % 7 AS VARCHAR) || '/data.txt' AS file_path,
          | count(*) AS n_docs,
          | CAST(sum(n_chars) AS BIGINT) AS total_chars,
          | count(DISTINCT lang) AS n_langs
          |FROM documents GROUP BY 1, 2""".stripMargin,

      "q_stats_agg" ->
        """SELECT l_returnflag,
          | round(stddev_samp(l_quantity), 4) AS sd_qty,
          | round(var_samp(l_quantity), 4) AS var_qty,
          | round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
          | round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_percentile" ->
        """SELECT l_returnflag,
          | round(quantile_cont(l_quantity, 0.25), 6) AS p25,
          | round(quantile_cont(l_quantity, 0.5), 6) AS p50,
          | round(quantile_cont(l_quantity, 0.9), 6) AS p90,
          | round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_kll_quantiles" ->
        """WITH src AS (SELECT l_returnflag AS flag,
          |    CAST(l_quantity AS DOUBLE) AS v
          |  FROM lineitem WHERE l_orderkey % 8 = 0),
          | ranked AS (SELECT flag, v,
          |    row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
          |    count(*) OVER (PARTITION BY flag) AS n FROM src)
          |SELECT flag,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.25*n) AS BIGINT)) THEN v END) AS p25,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.5*n) AS BIGINT)) THEN v END) AS p50,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.9*n) AS BIGINT)) THEN v END) AS p90,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.99*n) AS BIGINT)) THEN v END) AS p99
          |FROM ranked GROUP BY flag""".stripMargin,

      "q_profile" ->
        """SELECT 'o_orderkey' AS "column", 'bigint' AS dtype, count(*) AS n,
          |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
          |  round(CAST(min(o_orderkey) AS DOUBLE), 4) AS min_v,
          |  round(CAST(max(o_orderkey) AS DOUBLE), 4) AS max_v,
          |  round(avg(CAST(o_orderkey AS DOUBLE)), 4) AS mean_v
          |FROM orders
          |UNION ALL
          |SELECT 'o_custkey', 'bigint', count(*),
          |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  round(CAST(min(o_custkey) AS DOUBLE), 4),
          |  round(CAST(max(o_custkey) AS DOUBLE), 4),
          |  round(avg(CAST(o_custkey AS DOUBLE)), 4)
          |FROM orders
          |UNION ALL
          |SELECT 'o_orderstatus', 'string', count(*),
          |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  round(CAST(min(length(o_orderstatus)) AS DOUBLE), 4),
          |  round(CAST(max(length(o_orderstatus)) AS DOUBLE), 4),
          |  round(avg(CAST(length(o_orderstatus) AS DOUBLE)), 4)
          |FROM orders
          |UNION ALL
          |SELECT 'o_totalprice', 'double', count(*),
          |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  round(CAST(min(o_totalprice) AS DOUBLE), 4),
          |  round(CAST(max(o_totalprice) AS DOUBLE), 4),
          |  round(avg(CAST(o_totalprice AS DOUBLE)), 4)
          |FROM orders
          |UNION ALL
          |SELECT 'o_orderdate', 'timestamp_ntz', count(*),
          |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  NULL, NULL, NULL
          |FROM orders
          |UNION ALL
          |SELECT 'o_orderpriority', 'string', count(*),
          |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          |  round(CAST(min(length(o_orderpriority)) AS DOUBLE), 4),
          |  round(CAST(max(length(o_orderpriority)) AS DOUBLE), 4),
          |  round(avg(CAST(length(o_orderpriority) AS DOUBLE)), 4)
          |FROM orders""".stripMargin,

      "q_math_funcs" ->
        """SELECT o_orderkey,
          | round(sqrt(o_totalprice), 6) AS sq,
          | round(pow(o_totalprice, 0.3), 6) AS pw,
          | round(ln(o_totalprice + 1), 6) AS ln1,
          | round(log10(o_totalprice + 1), 6) AS lg10,
          | round(exp(o_totalprice / 100000.0), 6) AS ex,
          | abs(o_custkey - 500) AS ab,
          | CAST(ceil(o_totalprice) AS BIGINT) AS ce,
          | CAST(floor(o_totalprice) AS BIGINT) AS fl,
          | CAST(sign(o_custkey - 500) AS INTEGER) AS sg,
          | o_orderkey % 7 AS md
          |FROM orders""".stripMargin,

      "q_date_funcs" ->
        """SELECT o_orderkey,
          | strftime(o_orderdate, '%Y-%m-%d') AS d,
          | CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
          | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
          | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
          | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
          | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
          | strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
          | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS mstart
          |FROM orders""".stripMargin,

      "q_json_path" ->
        """WITH j AS (SELECT event_id,
          |  '{"meta":{"ids":[1,2,3],"tag":"t"},"payload":' || props || '}' AS doc
          | FROM events WHERE event_id < 2000)
          |SELECT event_id,
          | CAST(json_extract_string(doc, '$.payload.k') AS BIGINT) AS k,
          | CAST(json_extract_string(doc, '$.meta.ids[1]') AS BIGINT) AS id1,
          | json_extract_string(doc, '$.meta.tag') AS tag
          |FROM j""".stripMargin,

      "q_batch_map" ->
        """SELECT p_partkey, reverse(p_name) AS rev_name,
          | CAST(length(p_name) AS BIGINT) AS name_len FROM part""".stripMargin,

      "q_skew_agg" ->
        """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity,
          | count(*) AS n
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_read_storage" ->
        """SELECT regexp_extract(filename, '([^/]*)$', 1) AS path,
          | CAST(size AS BIGINT) AS size
          |FROM read_blob('{SF_DIR}/*.parquet')""".stripMargin,

      "q_to_storage" ->
        """SELECT 'doc' || doc_id || '.txt' AS path,
          | CAST(strlen(text) AS BIGINT) AS size
          |FROM documents WHERE doc_id < 40""".stripMargin,

      "q_read_zip" ->
        """SELECT 'docs.zip/doc' || doc_id || '.txt' AS path,
          | CAST(strlen(text) AS BIGINT) AS size, text AS content
          |FROM documents WHERE doc_id < 40""".stripMargin,

      "q_warc" ->
        """SELECT 'http://example.com/doc' || doc_id AS uri,
          | CAST(200 AS INTEGER) AS http_status,
          | 'text/html; charset=utf-8' AS http_ct,
          | TIMESTAMP '2026-01-02 03:04:05' AS warc_date,
          | text AS content
          |FROM documents WHERE doc_id < 60""".stripMargin,

      "q_html_text" ->
        """SELECT doc_id,
          | trim(regexp_replace(
          |   'T Doc ' || doc_id || ' ' || text || ' "end"',
          |   '\s+', ' ', 'g')) AS content
          |FROM documents WHERE doc_id < 400""".stripMargin,

      "q_url_parse" ->
        """SELECT doc_id,
          | CASE doc_id%6
          |  WHEN 0 THEN 'https://WWW.Example.co.uk/articles/'||doc_id||'?b=2&a=1#frag'
          |  WHEN 1 THEN 'http://user@sub.blog.example.com:8080/post/'||doc_id
          |  WHEN 2 THEN 'https://10.0.0.'||(doc_id%200)||'/health'
          |  WHEN 3 THEN 'ftp://files.example.org/data/'||doc_id||'.bin'
          |  WHEN 4 THEN 'https://shop-'||(doc_id%50)||'.github.io/item?q=x'
          |  ELSE 'https://example.com#top' END AS url,
          | CASE doc_id%6 WHEN 3 THEN 'ftp' WHEN 1 THEN 'http'
          |  ELSE 'https' END AS scheme,
          | CASE doc_id%6
          |  WHEN 0 THEN 'WWW.Example.co.uk'
          |  WHEN 1 THEN 'sub.blog.example.com'
          |  WHEN 2 THEN '10.0.0.'||(doc_id%200)
          |  WHEN 3 THEN 'files.example.org'
          |  WHEN 4 THEN 'shop-'||(doc_id%50)||'.github.io'
          |  ELSE 'example.com' END AS host,
          | CAST(CASE doc_id%6 WHEN 1 THEN 8080 ELSE NULL END AS INTEGER) AS port,
          | CASE doc_id%6
          |  WHEN 0 THEN '/articles/'||doc_id
          |  WHEN 1 THEN '/post/'||doc_id
          |  WHEN 2 THEN '/health'
          |  WHEN 3 THEN '/data/'||doc_id||'.bin'
          |  WHEN 4 THEN '/item' ELSE '' END AS path,
          | CASE doc_id%6 WHEN 0 THEN 'b=2&a=1' WHEN 4 THEN 'q=x'
          |  ELSE '' END AS qs,
          | CASE doc_id%6 WHEN 0 THEN 'frag' WHEN 5 THEN 'top'
          |  ELSE '' END AS frag,
          | CASE doc_id%6
          |  WHEN 0 THEN 'example.co.uk'
          |  WHEN 1 THEN 'example.com'
          |  WHEN 2 THEN '10.0.0.'||(doc_id%200)
          |  WHEN 3 THEN 'example.org'
          |  WHEN 4 THEN 'shop-'||(doc_id%50)||'.github.io'
          |  ELSE 'example.com' END AS reg_domain
          |FROM documents WHERE doc_id < 600""".stripMargin,

      "q_url_normalize" ->
        """SELECT doc_id,
          | CASE doc_id%6
          |  WHEN 0 THEN 'HTTPS://Example.COM:443/a/b?utm_source=x&b=2&a=1#sec'
          |  WHEN 1 THEN 'http://Example.org:80/'
          |  WHEN 2 THEN 'https://Shop.Example.co.uk/p?gclid=1&id='||doc_id
          |  WHEN 3 THEN 'http://a.b.example.net:8080?x=1'
          |  WHEN 4 THEN 'https://example.com/search?q='||doc_id||'&utm_medium=email&ref=home'
          |  ELSE 'https://example.com/path#frag' END AS url,
          | CASE doc_id%6
          |  WHEN 0 THEN 'https://example.com/a/b?a=1&b=2'
          |  WHEN 1 THEN 'http://example.org/'
          |  WHEN 2 THEN 'https://shop.example.co.uk/p?id='||doc_id
          |  WHEN 3 THEN 'http://a.b.example.net:8080/?x=1'
          |  WHEN 4 THEN 'https://example.com/search?q='||doc_id
          |  ELSE 'https://example.com/path' END AS norm
          |FROM documents WHERE doc_id < 600""".stripMargin,

      "q_read_orc" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
          | l_returnflag, CAST(l_shipdate AS DATE) AS ship_date
          |FROM lineitem WHERE l_orderkey % 40 = 0""".stripMargin,

      "q_read_avro" ->
        "SELECT * FROM orders",

      "q_dataset_attrs" ->
        """SELECT * FROM (VALUES
          | ('nlp',  'ds.a', '1.0.0', CAST(25 AS BIGINT), 'nations slice', 'nlp,loc=US'),
          | ('nlp',  'ds.b', '1.0.0', CAST(5 AS BIGINT),  '',              'nlp,loc=EU'),
          | ('loc=*','ds.a', '1.0.0', CAST(25 AS BIGINT), 'nations slice', 'nlp,loc=US'),
          | ('loc=*','ds.b', '1.0.0', CAST(5 AS BIGINT),  '',              'nlp,loc=EU'),
          | ('loc=*','ds.c', '1.0.0', CAST(5 AS BIGINT),  'patched later', 'vision,loc=US'),
          | ('both', 'ds.c', '1.0.0', CAST(5 AS BIGINT),  'patched later', 'vision,loc=US')
          |) AS t(flt, name, version, rows, description, attrs_s)""".stripMargin,

      "q_fuzzy_join" ->
        s"""WITH lft AS (
           |  SELECT doc_id AS lid, text FROM documents WHERE doc_id % 3 = 0
           |), rgt AS (
           |  SELECT doc_id + 500000 AS rid, text || ' tail marker token' AS text
           |    FROM documents WHERE doc_id % 6 = 0 AND n_chars >= 200
           |  UNION ALL
           |  SELECT doc_id + 600000, text FROM documents WHERE doc_id % 6 = 3
           |  UNION ALL
           |  SELECT doc_id + 700000, 'entirely fresh content row number ' || doc_id
           |    FROM documents WHERE doc_id % 6 = 1
           |), gl AS (
           |  SELECT lid, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams FROM lft
           |), gr AS (
           |  SELECT rid, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams FROM rgt)
           |SELECT l.lid AS left_id, r.rid AS right_id,
           |  round(CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
           |        len(list_distinct(l.grams || r.grams)), 6) AS similarity
           |FROM gl l JOIN gr r ON
           |  CASE WHEN len(list_distinct(l.grams || r.grams)) = 0 THEN 0.0
           |    ELSE CAST(len(list_intersect(l.grams, r.grams)) AS DOUBLE) /
           |         len(list_distinct(l.grams || r.grams)) END >= 0.5""".stripMargin,

      "q_crawl_e2e" ->
        """WITH c AS (SELECT doc_id,
          |  trim(regexp_replace('T Doc '||doc_id||' '||text||' "end"',
          |    '\s+', ' ', 'g')) AS content
          |  FROM documents WHERE doc_id < 300)
          |SELECT doc_id,
          | 'https://www.h'||(doc_id%5)||'-site.co.uk/art/'||doc_id
          |   ||'?id='||doc_id AS url,
          | 'h'||(doc_id%5)||'-site.co.uk' AS domain,
          | CAST(len(string_split_regex(content, '\s+')) AS BIGINT) AS tokens,
          | content
          |FROM c WHERE len(string_split_regex(content, '\s+')) >= 10""".stripMargin,

      "q_link_graph" ->
        """SELECT domain, CAST(count(*) AS BIGINT) AS n FROM (
          |  SELECT 'h'||(doc_id%7)||'.co.uk' AS domain
          |  FROM documents WHERE doc_id < 400
          |  UNION ALL
          |  SELECT 'h'||((doc_id+3)%7)||'.co.uk'
          |  FROM documents WHERE doc_id < 400)
          |GROUP BY domain""".stripMargin,

      "q_asof_join" ->
        // CAST(ts AS TIMESTAMP) truncates any ns-precision parquet timestamp
        // to micros, matching Spark's micros-truncated reads — keeps strict
        // "at or before" semantics identical on both sides
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
          |SELECT l.event_id, round(r.ref_value, 6) AS ref_value
          |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

      "q_asof_forward" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
          |SELECT l.event_id, round(r.ref_value, 6) AS ref_value
          |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,

      "q_asof_nearest" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          | b AS (SELECT l.event_id, l.ts AS lt, r.ts AS bt, r.ref_value AS bv
          |   FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
          | f AS (SELECT l.event_id, r.ts AS ft, r.ref_value AS fv
          |   FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
          |SELECT b.event_id, round(CASE
          |  WHEN bt IS NULL THEN fv
          |  WHEN ft IS NULL THEN bv
          |  WHEN epoch_us(lt) - epoch_us(bt) <= epoch_us(ft) - epoch_us(lt)
          |    THEN bv
          |  ELSE fv END, 6) AS ref_value
          |FROM b JOIN f ON b.event_id = f.event_id""".stripMargin,

      "q_asof_tolerance" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 50 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
          |SELECT l.event_id,
          | CASE WHEN (epoch_us(l.ts) - epoch_us(r.ts)) <= 3600000000
          |      THEN round(r.ref_value, 6) END AS ref_value
          |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

      "q_asof_strict" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
          |SELECT l.event_id, round(r.ref_value, 6) AS ref_value
          |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts > r.ts""".stripMargin,

      "q_asof_strict_fwd" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
          |SELECT l.event_id, round(r.ref_value, 6) AS ref_value
          |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts < r.ts""".stripMargin,

      "q_asof_strict_near" ->
        """WITH r AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
          |  max(value) AS ref_value FROM events
          |  WHERE event_id % 10 = 0 GROUP BY 1, 2),
          | l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          | b AS (SELECT l.event_id, l.ts AS lt, r.ts AS bt, r.ref_value AS bv
          |   FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts > r.ts),
          | f AS (SELECT l.event_id, r.ts AS ft, r.ref_value AS fv
          |   FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts < r.ts)
          |SELECT b.event_id, round(CASE
          |  WHEN bt IS NULL THEN fv
          |  WHEN ft IS NULL THEN bv
          |  WHEN epoch_us(lt) - epoch_us(bt) <= epoch_us(ft) - epoch_us(lt)
          |    THEN bv
          |  ELSE fv END, 6) AS ref_value
          |FROM b JOIN f ON b.event_id = f.event_id""".stripMargin,

      "q_range_join" ->
        """WITH tiers AS (SELECT n_nationkey AS tier,
          |  n_nationkey * 440.0 - 1000.0 AS lo,
          |  n_nationkey * 440.0 - 560.0 AS hi FROM nation)
          |SELECT c_custkey, tier FROM customer
          |JOIN tiers ON c_acctbal >= lo AND c_acctbal < hi""".stripMargin,

      "q_any_value" ->
        """SELECT c.c_nationkey AS n_nationkey, any_value(n.n_name) AS nation_name,
          | count(*) AS n_customers,
          | CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY c.c_nationkey""".stripMargin,

      "q_scalar_agg" ->
        """SELECT count(*) AS cnt,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
          | strftime(min(l_shipdate), '%Y-%m-%d') AS min_ship,
          | strftime(max(l_shipdate), '%Y-%m-%d') AS max_ship
          |FROM lineitem""".stripMargin,

      "q_count_distinct" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_approx_distinct" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
          | TRUE AS approx_ok
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q_window" ->
        """SELECT l_suppkey, l_orderkey, l_linenumber,
          | CAST(row_number() OVER w AS BIGINT) AS rn,
          | CAST(rank() OVER w AS BIGINT) AS rnk,
          | CAST(dense_rank() OVER w AS BIGINT) AS drnk,
          | CAST(ntile(4) OVER w AS BIGINT) AS nt,
          | lag(l_quantity, 1) OVER w AS lag_qty,
          | lead(l_quantity, 1) OVER w AS lead_qty,
          | first_value(l_quantity) OVER w AS first_qty,
          | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
          |   ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
          |FROM lineitem WHERE l_suppkey <= 20
          |WINDOW w AS (PARTITION BY l_suppkey
          | ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)""".stripMargin,

      "q_map_udf" ->
        """SELECT p_partkey, reverse(p_name) AS rev_name,
          | CAST(length(p_name) AS BIGINT) AS name_len FROM part""".stripMargin,

      "q_gen_udf" ->
        """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
          |FROM part WHERE p_partkey < 2000""".stripMargin,

      "q_agg_udf" ->
        """WITH r AS (SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice,
          |  row_number() OVER (PARTITION BY l_returnflag, l_linestatus
          |    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rk
          | FROM lineitem)
          |SELECT l_returnflag, l_linestatus, l_orderkey, l_extendedprice,
          | CAST(rk AS BIGINT) AS rk
          |FROM r WHERE rk <= 2""".stripMargin,

      "q_string_funcs" ->
        """SELECT p_partkey, CAST(length(p_name) AS BIGINT) AS name_len,
          | regexp_replace(p_brand, 'Brand#', 'B-', 'g') AS brand2,
          | regexp_replace(p_type, '[aeiou]', '', 'g') AS devowel,
          | string_split(p_type, ' ')[1] AS first_word,
          | upper(p_brand) AS up, lower(p_name) AS lo,
          | substr(p_name, 1, 5) AS pfx
          |FROM part""".stripMargin,

      "q_string_funcs2" ->
        raw"""SELECT p_partkey,
           | regexp_extract(p_brand, 'Brand#(\d)(\d)', 1) AS brand_major,
           | regexp_extract(p_brand, 'Brand#(\d)(\d)', 2) AS brand_minor,
           | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
           | rpad(p_type, 30, '.') AS padded_type,
           | translate(p_name, 'aeiou', 'AEIOU') AS vowels_upper,
           | repeat('ab', CAST(p_partkey % 3 AS INTEGER) + 1) AS rep
           |FROM part""".stripMargin,

      "q_path_funcs" ->
        """WITH x AS (SELECT doc_id,
          |  'data/' || source || '/doc_' || doc_id || '.txt' AS p,
          |  doc_id || '.tar.gz' AS p2 FROM documents),
          | y AS (SELECT doc_id, p, p2,
          |  regexp_extract(p, '([^/]*)$', 1) AS nm,
          |  regexp_extract(p2, '([^/]*)$', 1) AS nm2 FROM x),
          | z AS (SELECT *,
          |  CASE WHEN strpos(nm, '.') > 0 THEN regexp_extract(nm, '\.([^.]*)$', 1) ELSE '' END AS ext,
          |  CASE WHEN strpos(nm2, '.') > 0 THEN regexp_extract(nm2, '\.([^.]*)$', 1) ELSE '' END AS ext2
          | FROM y)
          |SELECT doc_id,
          | CASE WHEN strpos(p, '/') > 0 THEN regexp_extract(p, '^(.*?)/+[^/]*$', 1) ELSE '' END AS parent,
          | nm AS name,
          | rtrim(substr(nm, 1, CAST(length(nm) AS INT) -
          |   (CASE WHEN strpos(nm, '.') > 0 THEN CAST(length(ext) AS INT) ELSE 0 END)), '.') AS stem,
          | ext,
          | CASE WHEN strpos(p2, '/') > 0 THEN regexp_extract(p2, '^(.*?)/+[^/]*$', 1) ELSE '' END AS parent2,
          | rtrim(substr(nm2, 1, CAST(length(nm2) AS INT) -
          |   (CASE WHEN strpos(nm2, '.') > 0 THEN CAST(length(ext2) AS INT) ELSE 0 END)), '.') AS stem2,
          | ext2
          |FROM z""".stripMargin,

      "q_array_funcs" ->
        """WITH a AS (SELECT vec_id, range(1, vec_id % 5 + 3) AS arr FROM embeddings)
          |SELECT vec_id, CAST(len(arr) AS BIGINT) AS n,
          | array_to_string(arr, '-') AS joined,
          | arr[1] AS first_el,
          | array_to_string(arr[2:3], '-') AS sliced,
          | list_contains(arr, 3) AS has3
          |FROM a""".stripMargin,

      "q_numeric_funcs" ->
        """SELECT o_orderkey,
          | o_orderkey & o_custkey AS band,
          | o_orderkey | o_custkey AS bor,
          | xor(o_orderkey, o_custkey) AS bxor,
          | o_orderkey << 2 AS shl,
          | o_orderkey >> 1 AS shr,
          | CAST(bit_count(xor(o_orderkey, o_custkey)) AS INTEGER) AS bham
          |FROM orders""".stripMargin,

      "q_conditional" ->
        """SELECT c_custkey, greatest(c_acctbal, 0.0) AS g,
          | least(c_acctbal, 1000.0) AS l,
          | CASE WHEN c_acctbal < 0 THEN 'neg'
          |      WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
          | coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
          | c_acctbal IS NULL AS isnull
          |FROM customer""".stripMargin,

      "q_datetime" ->
        """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
          | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
          | count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY 1, 2""".stripMargin,

      "q_explode_json" ->
        """SELECT event_id, event_type,
          | CAST(json_extract(props, '$.k') AS BIGINT) AS k
          |FROM events WHERE event_id < 2000""".stripMargin,

      "q_streaming" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          | event_type, count(*) AS n,
          | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
          |FROM events GROUP BY 1, 2""".stripMargin,

      "q_stream_quantiles" ->
        """WITH e AS (SELECT date_trunc('hour', ts) AS w,
          |    CAST(value AS DOUBLE) AS v FROM events),
          | r AS (SELECT w, v,
          |    row_number() OVER (PARTITION BY w ORDER BY v) AS rn,
          |    count(*) OVER (PARTITION BY w) AS n FROM e)
          |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.5*n) AS BIGINT))
          |   THEN v END) AS p50,
          | max(CASE WHEN rn = greatest(1, CAST(ceil(0.9*n) AS BIGINT))
          |   THEN v END) AS p90
          |FROM r GROUP BY w""".stripMargin,

      "q_stream_tokens" ->
        s"""WITH corpus AS (SELECT doc_id, source,
           |    substr(text, 1, 120) AS text
           |   FROM documents WHERE doc_id % 23 = 0),
           |${bpeByteTrainCtes(4)},
           | docs AS (SELECT doc_id, source,
           |    regexp_extract_all(text, '$bpePreTokPatSql') AS ws
           |   FROM corpus),
           | wpos AS (SELECT d.doc_id, d.source, d.ws[t.widx] AS word
           |   FROM docs d, unnest(range(1, len(d.ws) + 1)) AS t(widx)),
           | cnt AS (SELECT w.source, len(f.syms) AS k
           |   FROM wpos w JOIN f4 f USING (word))
           |SELECT c.source,
           |  CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
           |  c.n_docs
           |FROM (SELECT source, count(*) AS n_docs FROM corpus
           |      GROUP BY 1) c
           |LEFT JOIN (SELECT source, sum(k) AS n_tokens FROM cnt
           |      GROUP BY 1) t USING (source)""".stripMargin,

      "q_winsorize" ->
        """WITH v AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS x
          |   FROM orders),
          | r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn,
          |     count(*) OVER () AS n FROM v),
          | lo AS (SELECT x AS b FROM r
          |   WHERE rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))),
          | hi AS (SELECT x AS b FROM r
          |   WHERE rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT)))
          |SELECT o_orderkey,
          | round(least(greatest(x, lo.b), hi.b), 6) AS clamped
          |FROM v, lo, hi""".stripMargin,

      "q_outliers" ->
        """WITH v AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS x
          |   FROM orders),
          | m AS (SELECT x AS med FROM (SELECT x,
          |     row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
          |   FROM v) WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))),
          | d AS (SELECT v.o_orderkey, abs(v.x - m.med) AS dev FROM v, m),
          | m2 AS (SELECT dev AS mad FROM (SELECT dev,
          |     row_number() OVER (ORDER BY dev) AS rn, count(*) OVER () AS n
          |   FROM d) WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT)))
          |SELECT o_orderkey, round(dev, 6) AS dev,
          | (dev > 3.0 * mad) AS is_outlier
          |FROM d, m2""".stripMargin,

      "q_profile_drift" ->
        """WITH b AS (SELECT count(*) AS n,
          |   avg(CAST(o_totalprice AS DOUBLE)) AS m_tp,
          |   avg(CAST(o_custkey AS DOUBLE)) AS m_ck FROM orders),
          | a AS (SELECT count(*) AS n,
          |   avg(CAST(o_totalprice * 1.2 AS DOUBLE)) AS m_tp,
          |   avg(CAST(o_custkey AS DOUBLE)) AS m_ck FROM orders)
          |SELECT 'o_totalprice' AS "column", b.n AS n_before, a.n AS n_after,
          | CAST(0 AS BIGINT) AS nulls_before, CAST(0 AS BIGINT) AS nulls_after,
          | round(b.m_tp, 4) AS mean_b, round(a.m_tp, 4) AS mean_a,
          | (abs(a.m_tp - b.m_tp) / greatest(abs(b.m_tp), 1e-12) > 0.05
          |  OR abs(CAST(a.n - b.n AS DOUBLE) / b.n) > 0.05) AS drift_flag
          |FROM b, a
          |UNION ALL
          |SELECT 'o_custkey', b.n, a.n, 0, 0,
          | round(b.m_ck, 4), round(a.m_ck, 4),
          | (abs(a.m_ck - b.m_ck) / greatest(abs(b.m_ck), 1e-12) > 0.05
          |  OR abs(CAST(a.n - b.n AS DOUBLE) / b.n) > 0.05)
          |FROM b, a""".stripMargin,

      "q_stream_session_window" ->
        """WITH x AS (SELECT user_id, ts,
          |  lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC)
          |    AS prev_ts
          | FROM events WHERE user_id < 200),
          | s AS (SELECT user_id, ts,
          |  sum(CASE WHEN prev_ts IS NULL THEN 1
          |    WHEN epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
          |    ELSE 0 END) OVER
          |   (PARTITION BY user_id ORDER BY epoch_us(ts) ASC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          | FROM x)
          |SELECT user_id, epoch_us(min(ts)) AS session_start,
          | count(*) AS n_events
          |FROM s GROUP BY user_id, sid""".stripMargin,

      "q_stream_sessionize" ->
        """WITH x AS (SELECT event_id, user_id, ts,
          |  lag(ts) OVER (PARTITION BY user_id
          |    ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_ts
          | FROM events WHERE user_id < 100)
          |SELECT event_id, user_id,
          | CAST(sum(CASE WHEN prev_ts IS NULL THEN 1
          |   WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
          |   ELSE 0 END) OVER
          |  (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          |  AS session_id
          |FROM x""".stripMargin,

      "q_stream_distinct" ->
        """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
          | count(DISTINCT user_id) AS exact_users,
          | count(*) AS n_events, TRUE AS est_ok
          |FROM events GROUP BY 1""".stripMargin,

      "q_stream_wm_dedup" ->
        "SELECT event_id, user_id, event_type FROM events",

      "q_stream_enrich" ->
        """SELECT user_id, event_id, user_id % 4 AS segment
          |FROM events""".stripMargin,

      "q_stream_heavy_hitters" ->
        """WITH c AS (SELECT event_type, props, count(*) AS n
          |  FROM events WHERE props IS NOT NULL GROUP BY 1, 2),
          | r AS (SELECT event_type, props, n, row_number() OVER (
          |    PARTITION BY event_type ORDER BY n DESC, props ASC) AS rank
          |  FROM c)
          |SELECT event_type, CAST(rank AS BIGINT) AS rank, props, n
          |FROM r WHERE rank <= 3""".stripMargin,

      "q_stream_topk" ->
        """WITH r AS (SELECT event_type, event_id, value,
          |   row_number() OVER (PARTITION BY event_type
          |     ORDER BY value DESC, event_id ASC) AS rank
          | FROM events WHERE value IS NOT NULL)
          |SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id, value
          |FROM r WHERE rank <= 3""".stripMargin,

      "q_stream_funnel" ->
        """WITH s1 AS (SELECT user_id, epoch_us(min(ts)) AS t1
          |   FROM events WHERE event_type = 'signup' GROUP BY 1),
          | s2 AS (SELECT e.user_id, epoch_us(min(ts)) AS t2
          |   FROM events e JOIN s1 ON e.user_id = s1.user_id
          |   WHERE event_type = 'view' AND epoch_us(ts) > t1 GROUP BY 1),
          | s3 AS (SELECT e.user_id, epoch_us(min(ts)) AS t3
          |   FROM events e JOIN s2 ON e.user_id = s2.user_id
          |   WHERE event_type = 'purchase' AND epoch_us(ts) > t2 GROUP BY 1)
          |SELECT user_id, CAST(1 AS BIGINT) AS step, t1 AS t_micros FROM s1
          |UNION ALL
          |SELECT user_id, CAST(2 AS BIGINT), t2 FROM s2
          |UNION ALL
          |SELECT user_id, CAST(3 AS BIGINT), t3 FROM s3""".stripMargin,

      "q_stream_dedup" ->
        raw"""WITH e AS (SELECT event_id,
           |   lower(regexp_replace(trim(CAST(user_id AS VARCHAR) || '|' ||
           |     event_type || '|' || props), '\s+', ' ', 'g')) AS c
           |  FROM events)
           |SELECT event_id FROM e
           |WHERE NOT EXISTS (SELECT 1 FROM e h
           |  WHERE h.event_id % 3 = 0 AND h.c = e.c)""".stripMargin,

      "q_stream_join_outer" ->
        """WITH ev AS (SELECT event_id, date_trunc('second', ts) AS ts,
          |   user_id, event_type FROM events WHERE event_id < 20000),
          | v AS (SELECT event_id AS view_id, user_id, ts AS vts
          |   FROM ev WHERE event_type = 'view'),
          | p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
          |   FROM ev WHERE event_type = 'purchase')
          |SELECT v.user_id, v.view_id, p.purchase_id
          |FROM v LEFT JOIN p ON v.user_id = p.user_id
          | AND p.pts >= v.vts
          | AND p.pts <= v.vts + INTERVAL 6 HOUR""".stripMargin,

      "q_stream_join" ->
        """WITH ev AS (SELECT event_id, date_trunc('second', ts) AS ts,
          |   user_id, event_type FROM events WHERE event_id < 20000),
          | v AS (SELECT event_id AS view_id, user_id, ts AS vts
          |   FROM ev WHERE event_type = 'view'),
          | p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
          |   FROM ev WHERE event_type = 'purchase')
          |SELECT v.user_id, v.view_id, p.purchase_id
          |FROM v JOIN p ON v.user_id = p.user_id
          | AND p.pts >= v.vts
          | AND p.pts <= v.vts + INTERVAL 6 HOUR""".stripMargin,

      "q_streaming_late" ->
        """WITH ev AS (SELECT event_id, date_trunc('second', ts) AS ts,
          |   event_type FROM events WHERE event_id < 20000),
          | b3 AS (SELECT * FROM ev WHERE event_id % 3 = 0),
          | wd AS (SELECT (SELECT max(ts) FROM ev WHERE event_id % 3 = 1)
          |   - INTERVAL 1 HOUR AS w),
          | kept AS (SELECT * FROM ev WHERE event_id % 3 <> 0
          |   UNION ALL
          |   SELECT b3.* FROM b3, wd
          |   WHERE time_bucket(INTERVAL '10 minutes', b3.ts)
          |     + INTERVAL '10 minutes' > wd.w),
          | wf AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM kept),
          | agg AS (SELECT time_bucket(INTERVAL '10 minutes', ts)
          |     AS window_start, event_type, count(*) AS n
          |   FROM kept GROUP BY 1, 2)
          |SELECT agg.window_start, agg.event_type, agg.n FROM agg, wf
          |WHERE agg.window_start + INTERVAL '10 minutes' <= wf.w""".stripMargin,

      "q_train_test_split" ->
        """SELECT 'train' AS part, event_id FROM events WHERE event_id % 10 IN (0, 1)
          |UNION ALL
          |SELECT 'test' AS part, event_id FROM events WHERE event_id % 10 = 9""".stripMargin,

      "q_dedup_exact" ->
        s"""WITH corpus AS (
           | SELECT * FROM documents
           | UNION ALL
           | SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
           | FROM documents WHERE doc_id % 3 = 0)
           |SELECT md5($norm) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
           |FROM corpus GROUP BY 1""".stripMargin,

      "q_ngram_jaccard" ->
        s"""WITH g AS (SELECT doc_id,
           |  list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 2, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 3))) AS grams
           | FROM documents WHERE doc_id < 80)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           | round(CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
           |   ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           |        len(list_distinct(a.grams || b.grams)) END, 4) AS jaccard
           |FROM g a JOIN g b ON a.doc_id < b.doc_id""".stripMargin,

      // True thresholded all-pairs edge set — hash match proves the banded
      // MinHash LSH achieved exact recall AND precision on this corpus
      // (validated: every true pair here has Jaccard ≥ 0.74, far above the
      // 0.5 threshold, so band-probability recall is not borderline).
      "q_minhash_dedup" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000 AS doc_id, text || ' tail marker token' AS text
           |  FROM documents WHERE doc_id % 4 = 0 AND n_chars >= 200
           |), g AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams
           |  FROM corpus
           |), p AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
           |      ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           |           len(list_distinct(a.grams || b.grams)) END AS j
           |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, round(j, 4) AS jaccard FROM p WHERE j >= 0.5""".stripMargin,

      "q_simhash_dedup" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 150
           |  UNION ALL
           |  SELECT doc_id + 100000 AS doc_id, text || ' tail' AS text
           |  FROM documents WHERE doc_id < 150 AND doc_id % 4 = 0
           |), g AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams
           |  FROM corpus
           |), p AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
           |      ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           |           len(list_distinct(a.grams || b.grams)) END AS j
           |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, round(j, 4) AS jaccard FROM p WHERE j >= 0.5""".stripMargin,

      // True cosine ≥ threshold all-pairs set (validated: only the planted
      // identical copies reach 0.98 — the organic max is 0.51 — so the
      // hyperplane-LSH bucket join must surface exactly the planted set).
      "q_embed_dedup" ->
        """WITH corpus AS (
          |  SELECT vec_id, embedding FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 100000 AS vec_id, embedding
          |  FROM embeddings WHERE vec_id % 5 = 0
          |), p AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
          |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
          |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.98""".stripMargin,

      "q_subtract_seen" ->
        raw"""SELECT d.doc_id, d.source FROM documents d
           |WHERE NOT EXISTS (SELECT 1 FROM documents h
           |  WHERE h.doc_id % 3 = 0
           |  AND lower(regexp_replace(trim(h.text), '\s+', ' ', 'g')) =
           |      lower(regexp_replace(trim(d.text), '\s+', ' ', 'g')))""".stripMargin,

      "q_image_dhash" ->
        """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 300),
          | bits AS (SELECT id, p,
          |    CASE WHEN (7*id + 3*(px+1)*(px+1) + 5*py + (px+1)*py) % 256 >
          |              (7*id + 3*px*px + 5*py + px*py) % 256
          |      THEN 1 ELSE 0 END AS bit
          |   FROM (SELECT id, s.p, s.p % 8 AS px, s.p // 8 AS py
          |     FROM ids, generate_series(0, 63) AS s(p)))
          |SELECT id,
          |  CAST(sum(CASE WHEN p >= 32
          |    THEN (CAST(bit AS BIGINT) << (p - 32)) ELSE 0 END) AS BIGINT)
          |    AS dhash_hi,
          |  CAST(sum(CASE WHEN p < 32
          |    THEN (CAST(bit AS BIGINT) << p) ELSE 0 END) AS BIGINT)
          |    AS dhash_lo
          |FROM bits GROUP BY id""".stripMargin,

      "q_compact" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
          |FROM orders""".stripMargin,

      "q_partitioned_read" ->
        """SELECT event_id, user_id, event_type FROM events
          |WHERE event_type IN ('view', 'purchase')""".stripMargin,

      "q_bucketed_join" ->
        """SELECT c_mktsegment, count(*) AS n_orders,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |   AS revenue,
          | count(DISTINCT c_custkey) AS n_customers
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |GROUP BY c_mktsegment""".stripMargin,

      "q_zorder" ->
        """WITH r AS (SELECT min(CAST(o_custkey AS DOUBLE)) AS xmin,
          |    max(CAST(o_custkey AS DOUBLE)) AS xmax,
          |    min(CAST(o_totalprice AS DOUBLE)) AS ymin,
          |    max(CAST(o_totalprice AS DOUBLE)) AS ymax FROM orders),
          | b AS (SELECT o_orderkey,
          |   CAST(least(greatest(floor((CAST(o_custkey AS DOUBLE) - xmin)
          |     * 65535.0 / (xmax - xmin)), 0), 65535) AS BIGINT) AS bxx,
          |   CAST(least(greatest(floor((CAST(o_totalprice AS DOUBLE) - ymin)
          |     * 65535.0 / (ymax - ymin)), 0), 65535) AS BIGINT) AS byy
          |  FROM orders CROSS JOIN r)
          |SELECT o_orderkey, CAST(list_sum(list_transform(range(0, 16), i ->
          |    (((bxx >> i) & 1) << (2*i + 1)) + (((byy >> i) & 1) << (2*i))))
          |  AS BIGINT) AS zval
          |FROM b""".stripMargin,

      "q_hilbert" ->
        // the classic reflect+rotate loop replayed verbatim: the
        // recursive CTE carries (x, y, s, d) per row, one step per bit
        // plane from s=2^15 down; validated cell-for-cell against the
        // kernel on random grids before landing
        """WITH RECURSIVE
          | r AS (SELECT min(CAST(o_custkey AS DOUBLE)) AS xmin,
          |    max(CAST(o_custkey AS DOUBLE)) AS xmax,
          |    min(CAST(o_totalprice AS DOUBLE)) AS ymin,
          |    max(CAST(o_totalprice AS DOUBLE)) AS ymax FROM orders),
          | b AS (SELECT o_orderkey,
          |   CAST(least(greatest(floor((CAST(o_custkey AS DOUBLE) - xmin)
          |     * 65535.0 / (xmax - xmin)), 0), 65535) AS BIGINT) AS bxx,
          |   CAST(least(greatest(floor((CAST(o_totalprice AS DOUBLE) - ymin)
          |     * 65535.0 / (ymax - ymin)), 0), 65535) AS BIGINT) AS byy
          |  FROM orders CROSS JOIN r),
          | h AS (
          |  SELECT o_orderkey, bxx AS x, byy AS y,
          |    CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d FROM b
          |  UNION ALL
          |  SELECT o_orderkey,
          |    CASE WHEN (y & s) != 0 THEN x
          |         WHEN (x & s) != 0 THEN 65535 - y
          |         ELSE y END,
          |    CASE WHEN (y & s) != 0 THEN y
          |         WHEN (x & s) != 0 THEN 65535 - x
          |         ELSE x END,
          |    s // 2,
          |    d + s * s * xor(3 * CASE WHEN (x & s) != 0 THEN 1 ELSE 0 END,
          |                    CASE WHEN (y & s) != 0 THEN 1 ELSE 0 END)
          |  FROM h WHERE s > 0)
          |SELECT o_orderkey, d AS hval FROM h WHERE s = 0""".stripMargin,

      "q_label_prop" ->
        """WITH pe AS (SELECT DISTINCT CAST(l1.l_partkey AS VARCHAR) AS a,
          |     CAST(l2.l_partkey AS VARCHAR) AS b
          |   FROM lineitem l1 JOIN lineitem l2
          |     ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
          |   WHERE l1.l_quantity > 30 AND l2.l_quantity > 30),
          | und AS (SELECT a AS node, b AS nbr FROM pe
          |   UNION SELECT b, a FROM pe),
          | l0 AS (SELECT DISTINCT node, node AS label FROM und),
          | c1 AS (SELECT u.node, l.label, count(*) AS n
          |   FROM und u JOIN l0 l ON u.nbr = l.node GROUP BY u.node, l.label),
          | l1 AS (SELECT node, label FROM (SELECT node, label,
          |     row_number() OVER (PARTITION BY node
          |       ORDER BY n DESC, label ASC) AS rk FROM c1) WHERE rk = 1),
          | c2 AS (SELECT u.node, l.label, count(*) AS n
          |   FROM und u JOIN l1 l ON u.nbr = l.node GROUP BY u.node, l.label),
          | l2 AS (SELECT node, label FROM (SELECT node, label,
          |     row_number() OVER (PARTITION BY node
          |       ORDER BY n DESC, label ASC) AS rk FROM c2) WHERE rk = 1)
          |SELECT node, label FROM l2""".stripMargin,

      "q_subtract_seen_near" ->
        s"""WITH newb AS (
           |  SELECT doc_id + 200000 AS doc_id, text || ' tail marker token' AS text
           |    FROM documents WHERE doc_id % 4 = 0 AND n_chars >= 200
           |  UNION ALL
           |  SELECT doc_id + 300000, text FROM documents WHERE doc_id % 4 = 1
           |  UNION ALL
           |  SELECT doc_id + 400000, 'entirely fresh content row number ' ||
           |      doc_id || ' with no shared phrasing'
           |    FROM documents WHERE doc_id % 4 = 2
           |), gh AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams
           |  FROM documents
           |), gn AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 5))) AS grams
           |  FROM newb
           |), dup AS (
           |  SELECT DISTINCT n.doc_id
           |  FROM gn n JOIN gh h ON
           |    CASE WHEN len(list_distinct(n.grams || h.grams)) = 0 THEN 0.0
           |      ELSE CAST(len(list_intersect(n.grams, h.grams)) AS DOUBLE) /
           |           len(list_distinct(n.grams || h.grams)) END >= 0.5)
           |SELECT doc_id FROM newb
           |WHERE doc_id NOT IN (SELECT doc_id FROM dup)""".stripMargin,

      "q_pipeline_e2e" ->
        s"""WITH base AS (SELECT doc_id, text, lang, source FROM documents),
           | lang_en AS (SELECT * FROM base WHERE $langEnPred),
           | qual AS (SELECT * FROM lang_en WHERE $qualityProb >= 0.5),
           | histn AS (SELECT $norm AS nt FROM documents WHERE doc_id % 3 = 0),
           | fresh AS (SELECT * FROM qual
           |   WHERE $norm NOT IN (SELECT nt FROM histn)),
           | hist2 AS (SELECT doc_id, text || ' tail marker token' AS text
           |   FROM documents WHERE doc_id % 5 = 0 AND n_chars >= 200),
           | gh AS (SELECT doc_id, list_distinct(list_transform(
           |     range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |     i -> substr($norm, CAST(i AS INT), 5))) AS grams FROM hist2),
           | gn AS (SELECT doc_id, list_distinct(list_transform(
           |     range(1, CAST(greatest(length($norm) - 4, 0) AS BIGINT) + 1),
           |     i -> substr($norm, CAST(i AS INT), 5))) AS grams FROM fresh),
           | dup AS (SELECT DISTINCT n.doc_id FROM gn n JOIN gh h ON
           |   CASE WHEN len(list_distinct(n.grams || h.grams)) = 0 THEN 0.0
           |     ELSE CAST(len(list_intersect(n.grams, h.grams)) AS DOUBLE) /
           |          len(list_distinct(n.grams || h.grams)) END >= 0.5),
           | near AS (SELECT * FROM fresh
           |   WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
           | ntoks AS (SELECT doc_id, $lmToks AS toks FROM near),
           | ng AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,
           |     unnest(list_transform(
           |       generate_series(1, greatest(len(toks) - 12, 0)),
           |       i -> array_to_string(toks[i:i+12], ' '))) AS g FROM ntoks)),
           | btoks AS (SELECT doc_id, $lmToks AS toks FROM documents
           |   WHERE doc_id % 7 = 0),
           | bg AS (SELECT DISTINCT g FROM (SELECT unnest(list_transform(
           |       generate_series(1, greatest(len(toks) - 12, 0)),
           |       i -> array_to_string(toks[i:i+12], ' '))) AS g FROM btoks)),
           | cont AS (SELECT DISTINCT doc_id FROM ng JOIN bg USING (g)),
           | clean AS (SELECT * FROM near
           |   WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
           | c AS (SELECT source, count(*) AS n FROM clean GROUP BY 1),
           | m AS (SELECT min(n) AS nmin FROM c),
           | r AS (SELECT source,
           |   round(pow(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE), 0.5), 9)
           |     AS keep FROM c CROSS JOIN m),
           | t AS (SELECT source, CASE WHEN keep >= 1.0 THEN 'zzzzzzzz'
           |   ELSE printf('%08x', CAST(floor(keep * 4294967296.0) AS BIGINT))
           |   END AS thr FROM r),
           | mixed AS (SELECT clean.doc_id, clean.source FROM clean
           |   JOIN t USING (source)
           |   WHERE substring(md5(doc_id || ':pipe'), 1, 8) < thr)
           |SELECT '01_files_listed' AS stage, CAST(8 AS BIGINT) AS n_rows
           |UNION ALL SELECT '02_ingested', count(*) FROM base
           |UNION ALL SELECT '03_lang_en', count(*) FROM lang_en
           |UNION ALL SELECT '04_quality', count(*) FROM qual
           |UNION ALL SELECT '05_after_exact_dedup', count(*) FROM fresh
           |UNION ALL SELECT '06_after_near_dedup', count(*) FROM near
           |UNION ALL SELECT '07_after_decontam', count(*) FROM clean
           |UNION ALL SELECT '09_saved', count(*) FROM mixed
           |UNION ALL SELECT '08_mix_' || source, count(*) FROM mixed
           |  GROUP BY source""".stripMargin,

      "q_semdedup" ->
        """WITH corpus AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[])
          |  FROM embeddings WHERE vec_id % 5 = 0),
          | a AS (SELECT vec_id AS aid, CAST(embedding AS DOUBLE[]) AS av
          |   FROM embeddings WHERE vec_id < 8),
          | s AS (SELECT c.vec_id, a.aid,
          |   list_cosine_similarity(c.v, a.av) AS sim
          |   FROM corpus c CROSS JOIN a),
          | asg AS (SELECT vec_id, aid, row_number() OVER
          |   (PARTITION BY vec_id ORDER BY sim DESC, aid ASC) AS rk FROM s),
          | cl AS (SELECT vec_id, aid AS cluster FROM asg WHERE rk = 1),
          | dropped AS (SELECT DISTINCT y.vec_id
          |   FROM cl x JOIN cl y ON x.cluster = y.cluster
          |     AND x.vec_id < y.vec_id
          |   JOIN corpus cx ON cx.vec_id = x.vec_id
          |   JOIN corpus cy ON cy.vec_id = y.vec_id
          |   WHERE list_cosine_similarity(cx.v, cy.v) >= 0.98)
          |SELECT cl.vec_id, cl.cluster, dropped.vec_id IS NULL AS kept
          |FROM cl LEFT JOIN dropped ON cl.vec_id = dropped.vec_id""".stripMargin,

      "q_hash_funcs" ->
        """SELECT * FROM (VALUES
          |(0,4761183170873013810,8786273878450987434,0,5704371099999008445,-4007762839887001341),(1,-7869394227045998544,4358605616530791692,1,-6498601739002993585,657966039262562307),(2,-248608356505383867,856228434405501679,1,-1385632245090889598,-3953733285172608765),
          |(3,-8822279209149135622,-9059585493510689520,1,7229729349355574937,5269635736682152195),(4,7766709361750702608,-8219596027201201781,1,-8664305460830834909,-3935701045369075453),(5,-3218165664639757266,-8123931911175774551,1,-7805760533981797891,5215608870550667267),
          |(6,-5704700739868698584,3118769349233946719,1,6041678784471169156,81506549478328579),(7,-5080932840849291128,382151493691351607,1,-3582326513479014010,-3953720065198225405),(8,-6746709515335415996,-7405893380927547834,1,-8908279718434981138,-4602232535938348797),
          |(9,4416930539393268817,-967404152687289749,1,-724553397385310180,-3935721789928880125),(10,8496710636302058981,6311195855514093860,2,-745069891676357556,5269656782087045379),(11,6561530814298065564,6458692020114876661,2,4612906714115426837,99523971664201731),
          |(12,8883038512925605042,3210691507797536877,2,-7828686243411168361,4693191305403828227),(13,-5480170861711810777,8149913744846724180,2,277508952692354430,-8547387046599669501),(14,8373083765050575850,-7588914113399757437,2,-3635244270493019351,-9195904396324075261),
          |(15,4783429523421833175,5093990583410452502,2,-8359237935461380141,-8565417929142793981),(16,-1916220363295865271,7117629606486083951,2,2217098484297461384,9452262766461187),(17,-5918066581413945031,5108224865980434737,2,-6983579547282685138,4693195746332918019),
          |(18,4156750859297347867,-5546717292949056078,2,-542809880365410928,-9123846518868670461),(19,9030657540164129362,-7086371437845033428,2,-782621104000522542,657954099138152451),(20,1626306447464072420,-4016726796340301409,2,-4588696997380454190,-3953737691741372157),
          |(21,-3969024625226967317,3800895785825869724,2,1517909468480912502,5269656369856119043),(22,6764189089460701775,-4450107892761571594,2,4766736765958005853,-3953715546957133565),(23,7104960832659052428,-5660023298472927991,2,6484726126713494383,-8637475669276866557),
          |(24,802868794257063001,-2795629547595133833,2,-3497456825977647368,603924218126288899),(25,-7937000808412192353,6720198385432117791,2,7748431613181200997,99524418338588931),(26,-7290183967670281035,1093219084589043772,2,2729643432458348583,-9123850942753748989),
          |(27,5544279150075107020,-3908032476606674387,2,1495963088881374275,-4512166144114278397),(28,3145953363552033685,934307693148632662,2,5399319715789494568,-4584218395059926781),(29,8237170646308821012,7339010624699774797,2,1719876862335587860,603928478731387139),
          |(30,637170949039862475,9207054951772167363,2,5841387540199835617,-9195922040032589565),(31,-6350392646268118979,8221578516308154612,2,-5429055090145294037,81487557269782787),(32,1605537257164530618,5596321750902713108,2,5477830304895108081,603927568200911107),
          |(33,6261557096916326933,56341902338175698,2,-7189689305520908384,-4512160689503713021),(34,931228205014557787,4226434959333121640,2,-6546627561503209060,9434533093310467),(35,-5667600506044535904,3681503023949799109,2,-2169928168986628232,657970325658978307),
          |(36,5457884022647595218,-1037505295528101594,2,-5703939470516702974,-8565423426549938173),(37,8976376773095767583,1567987293162833000,2,1768534003187613133,-4025790475267030781),(38,-5309619275126363621,7039655678841936418,2,-980644434310153809,5215609008193063171),
          |(39,-6938141157288047093,5099786497077877800,2,-62519789712565209,4693197077756117251),(40,2973782029276838589,9005172512575454111,2,-1829012549406524279,-9123846716370190333),(41,-6646402337361073975,-2388912663269448406,2,-5699638702051386869,4639149217844297731),
          |(42,-6956393143342258023,-2679295112651393052,2,138355603570029454,5197576914432589827),(43,1571252719488933908,575300728153756414,2,-6305193794473750963,5287649027174041603),(44,-1659603539774672775,-6048540347530434022,2,-8654960134067354559,9430152275443971),
          |(45,-3769371526704522911,4766183129460783841,2,6001325002070221234,99507736738054403),(46,-734401201973765969,2087250795511168038,2,-8717450443788595183,81510836057557251),(47,-3753496055172901505,4117281143017537626,2,971715374860420606,5215614677547745283),
          |(48,8983963531907202160,5645287438178439784,2,-8416696987916713163,27467872389695491),(49,7764999351126361456,6422618662631106983,2,808173383127076318,5197582403249799427),(50,5979762375373053550,-5612608779660359916,2,3768839709572542552,27466815846662147),
          |(51,-2729638852623340902,566543244772530608,2,-6064577724919957069,5215595556168417539),(52,2302254088307881523,-1102705926214654692,2,8337682524314424928,-4530174959163799549),(53,4004801461884009498,-5223392452995474877,2,-321105615857375635,-3935721764073062397),
          |(54,-3806126258761915263,8557049881841605680,2,-4865980765966451665,-8637481012016922621),(55,-48762898190358901,-6757828376744150954,2,-4349910182349520078,-4584219511968872445),(56,-5976294845067953147,4187990673721578658,2,8290842963209596390,-3953731884864503549),
          |(57,383900978453256345,-4599566451515440298,2,-5139321776486054578,-9123850977128742653),(58,-8378942725443202271,-5820364397972046222,2,-3085655196478416253,-3953718879703529469),(59,-3086532707049852007,-1408768266304924670,2,8907595125211157830,99519556504911875),
          |(60,-6546806429931307545,8122126456084858306,2,-401224290266042184,-4602237062986414077),(61,1730792393343050759,-5597642103615957946,2,-3494627226172024979,4711192518363726083),(62,1660559892782701477,-8517078818375357205,2,5937652843126821054,9431217295229187),
          |(63,355039618527380531,6320171358756616929,2,3841271482196210148,585908453683153155),(64,-6414828616713696168,-1183337061143743651,2,-8574235111635998411,-8637475549001023229),(65,7336278428541809927,4299890697518383140,2,-8008559694953033916,-8565401539616800765),
          |(66,-7597454989828208216,-9069692265629898059,2,-773960480449222063,27444404556826627),(67,-5022282956766113982,4360229473134642212,2,-1118644701115745009,9434799311997187),(68,7742064027805371824,-8817787854901186850,2,7513631897932543522,-4530179760922951677),
          |(69,4421846831109193241,7503519367649980500,2,-863730242985240678,99523971645341955),(70,-6937362535711284289,-2909410690363025201,2,-307425122358560085,4621133719737909251),(71,-6896471892296302973,3747982792220780267,2,-3721383747596072980,4711192432248012803),
          |(72,3458613661027010808,7018185139000844425,2,2351164599103542424,-8547404793203209981),(73,95474718890257185,947561873557799610,2,2036140646630619270,81510784318703875),(74,-7745766143833143819,-4186617924263899939,2,-1995602780854681604,585892278833563651),
          |(75,3779442652289989795,-3463337122387997972,2,2843501130134135203,-4025794203432861437),(76,-2218920365528935811,-7099835904362564050,2,1363731340932929171,585890887417366787),(77,6003888424129345806,-3739879696242768579,2,-450359378585290090,5287650298415071235),
          |(78,9136085812147792838,8450776165268675977,2,-8692551960055438998,5287650100764737539),(79,4996339969123334738,-1421474629188196031,2,-2326944815956608591,-3953732872841035517),(80,3426747419852903945,2365717590106799187,2,-7329891151151344866,5215609850004635907),
          |(81,8766869069778488965,5977674689759251275,2,-4554539956950755822,9453345100447747),(82,7991148783664134045,-7074523392886214715,2,1123685039806498570,-9141866414952546301),(83,-685638927470024944,4836622645421966197,2,-5465926817622464645,-8637476614037387261),
          |(84,-3226650007556328794,8203780557933985532,2,-7853651129139771669,5215613457644521475),(85,8201652274843179656,-6411774582263689173,2,-5995179371635661065,-4007758871335124733),(86,-6380731894381036097,4525577697205699814,2,6483672712045273796,-4602251631362406141),
          |(87,3803977398634034642,-6347772000366297656,2,-6352042892839152213,-9141862034001968893),(88,682337623028910935,-7543903965940348132,2,-2083099379552004803,-9213940553123362813),(89,297723155266869825,-5062285535621392555,2,1497672457714851532,-3935723164315762685),
          |(90,4383923020933692842,-7983176628483815453,2,-5716729297258818138,5287666464789495811),(91,1636750525096201260,-4508786364716146064,2,-7636015202611766323,-8547390207628640253),(92,-1781841535284857326,-1604725624726976045,2,4612845150871202753,-3935722064737679101),
          |(93,1477590393011910804,-4746390002939446975,2,-2260116004948849060,5269657572430610691),(94,-5629501554857232880,3775880303546983981,2,7571450791574817341,9452125260531971),(95,4514545129966808623,8940020672799632750,2,-4646865128895501595,4693191219489851395),
          |(96,-798820388698714993,84529414765189782,2,9198298703125613694,657966073490882819),(97,-1718308154946016060,2861496814427645857,2,-3304949623000556607,657966064900259843),(98,-9121738304623869295,3725269799963356098,2,-1870010600103595713,5287670879967641603),
          |(99,5900276008102321431,-8926401290904400088,2,7860431307071714197,-8565418856841740285)
          |) AS t(n, ih, sh, bh, fp64, simh)""".stripMargin,

      "q_sample" ->
        """SELECT CAST(100 AS BIGINT) AS n, CAST(100 AS BIGINT) AS n_distinct,
          | CAST(100 AS BIGINT) AS n_in_source""".stripMargin,

      // Arithmetic oracle for the REAL PNG codec round-trip: solid-color
      // images mean the decoded mean channel values and dimensions are pure
      // functions of the id.
      "q_image_header" ->
        """SELECT doc_id AS id, 'png' AS format,
          | CAST(8 + doc_id % 16 AS INT) AS width,
          | CAST(8 + doc_id % 8 AS INT) AS height
          |FROM documents""".stripMargin,

      "q_video_header" ->
        """SELECT doc_id AS id, 'isom' AS brand,
          | (1000 + (doc_id % 97) * 500) / 1000.0 AS duration_sec,
          | CAST(64 + doc_id % 32 AS INT) AS width,
          | CAST(48 + doc_id % 16 AS INT) AS height
          |FROM documents""".stripMargin,

      "q_webm_header" ->
        """SELECT doc_id AS id, 'isom' AS brand,
          | (1000 + (doc_id % 97) * 500) / 1000.0 AS duration_sec,
          | CAST(64 + doc_id % 32 AS INT) AS width,
          | CAST(48 + doc_id % 16 AS INT) AS height
          |FROM documents
          |UNION ALL
          |SELECT doc_id + 10000 AS id, 'webm' AS brand,
          | (2000 + ((doc_id + 10000) % 89) * 250) / 1000.0 AS duration_sec,
          | CAST(128 + (doc_id + 10000) % 64 AS INT) AS width,
          | CAST(72 + (doc_id + 10000) % 36 AS INT) AS height
          |FROM documents""".stripMargin,

      "q_audio_frame_meta" ->
        """WITH m AS (SELECT doc_id AS id,
          |  ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
          |    [CAST(doc_id % 14 AS INT) + 1] AS kbps,
          |  200 + (doc_id % 50) * 10 AS total,
          |  40 + doc_id % 10 AS off
          | FROM documents)
          |SELECT id, '1' AS version, CAST(3 AS INT) AS layer,
          | CAST(kbps AS INT) AS bitrate_kbps,
          | CAST(([44100,48000,32000])[CAST(id % 3 AS INT) + 1] AS INT)
          |   AS sample_rate,
          | (['stereo','joint','dual','mono'])[CAST(id % 4 AS INT) + 1]
          |   AS channels,
          | (total - off) * 8.0 / (kbps * 1000.0) AS est_duration_sec
          |FROM m""".stripMargin,

      "q_multimodal" ->
        """SELECT doc_id AS id, 'png' AS format,
          | CAST(8 + doc_id % 16 AS INT) AS width,
          | CAST(8 + doc_id % 8 AS INT) AS height,
          | CAST((8 + doc_id % 16) * (8 + doc_id % 8) * 3 AS BIGINT) AS px_bytes,
          | CAST(doc_id * 37 % 256 AS DOUBLE) AS mean_r,
          | CAST(doc_id * 59 % 256 AS DOUBLE) AS mean_g,
          | CAST(doc_id * 83 % 256 AS DOUBLE) AS mean_b
          |FROM documents""".stripMargin,

      "q_audio_decode" ->
        """SELECT doc_id AS id, 'wav' AS format, 'pcm_signed_16' AS codec,
          | 8000 AS sample_rate,
          | CAST(1 + doc_id % 2 AS INT) AS channels,
          | CAST(400 + (doc_id % 32) * 25 AS BIGINT) AS samples,
          | round((400 + (doc_id % 32) * 25) / 8000.0, 6) AS duration,
          | CAST(8000 * 16 * (1 + doc_id % 2) AS INT) AS bit_rate
          |FROM documents""".stripMargin,

      "q_line_dedup" ->
        """WITH d AS (SELECT doc_id,
          |   text || chr(10) || 'promo block ' || (doc_id % 5) ||
          |   chr(10) || 'tail marker ' || doc_id AS text FROM documents),
          | l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
          |   generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM d),
          | dup AS (SELECT line FROM l GROUP BY line
          |   HAVING count(DISTINCT doc_id) >= 3),
          | kept AS (SELECT l.* FROM l ANTI JOIN dup USING (line))
          |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
          |FROM kept GROUP BY doc_id""".stripMargin,

      "q_domain_mix" ->
        """SELECT doc_id, source FROM documents
          |WHERE substring(md5(doc_id || ':mix1'), 1, 8) <
          | CASE source
          |  WHEN 'src0' THEN 'zzzzzzzz' WHEN 'src1' THEN 'zzzzzzzz'
          |  WHEN 'src2' THEN '80000000' WHEN 'src3' THEN '80000000'
          |  WHEN 'src4' THEN '33333333' WHEN 'src5' THEN '33333333'
          |  ELSE '00000000' END""".stripMargin,

      "q_top_tokens" ->
        raw"""SELECT token, cnt FROM (
           |  SELECT token, count(*) AS cnt FROM (
           |    SELECT unnest(string_split_regex(lower(text), '\s+')) AS token
           |    FROM documents)
           |  WHERE token <> '' GROUP BY token)
           |ORDER BY cnt DESC, token ASC LIMIT 50""".stripMargin,

      "q_heavy_hitters" ->
        raw"""WITH d AS (SELECT source,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | b AS (SELECT source, unnest(list_transform(
           |     generate_series(1, greatest(len(toks) - 1, 0)),
           |     i -> array_to_string(toks[i:i+1], ' '))) AS phrase FROM d),
           | c AS (SELECT source, phrase, count(*) AS n FROM b GROUP BY 1, 2),
           | rk AS (SELECT source, phrase, n, row_number() OVER (
           |     PARTITION BY source ORDER BY n DESC, phrase ASC) AS rank
           |   FROM c)
           |SELECT source, CAST(rank AS BIGINT) AS rank, phrase, n
           |FROM rk WHERE rank <= 5""".stripMargin,

      "q_cms_counts" ->
        raw"""WITH t AS (SELECT unnest(string_split_regex(lower(text),
           |    '\s+')) AS token FROM documents),
           | c AS (SELECT token, count(*) AS exact_n FROM t
           |   WHERE token <> '' GROUP BY token)
           |SELECT token, exact_n, TRUE AS est_ok FROM c
           |ORDER BY exact_n DESC, token ASC LIMIT 100""".stripMargin,

      "q_sketch_overlap" ->
        raw"""WITH d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | g0 AS (SELECT doc_id, unnest(list_transform(
           |     generate_series(1, greatest(len(toks) - 12, 0)),
           |     i -> array_to_string(toks[i:i+12], ' '))) AS g FROM d),
           | a AS (SELECT count(DISTINCT g) AS exact_a FROM g0),
           | b AS (SELECT count(DISTINCT g) AS exact_b FROM g0
           |   WHERE doc_id % 7 = 0)
           |SELECT exact_a, exact_b, TRUE AS a_ok, TRUE AS b_ok,
           |  TRUE AS union_ok, TRUE AS intersect_ok FROM a, b""".stripMargin,

      "q_kll_weighted" ->
        """WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS v,
          |   doc_id % 7 + 1 AS w FROM documents),
          | g AS (SELECT source, v, sum(w) AS wv FROM d GROUP BY 1, 2),
          | c AS (SELECT source, v,
          |   sum(wv) OVER (PARTITION BY source ORDER BY v) AS cum FROM g),
          | t AS (SELECT source, sum(wv) AS tot FROM g GROUP BY 1)
          |SELECT c.source,
          | min(CASE WHEN cum >= greatest(1,
          |   CAST(ceil(0.5 * tot) AS BIGINT)) THEN v END) AS p50,
          | min(CASE WHEN cum >= greatest(1,
          |   CAST(ceil(0.9 * tot) AS BIGINT)) THEN v END) AS p90
          |FROM c JOIN t ON c.source = t.source GROUP BY 1""".stripMargin,

      "q_topk_group" ->
        """WITH rk AS (SELECT source, doc_id,
          |   CAST(n_chars AS DOUBLE) AS score,
          |   row_number() OVER (PARTITION BY source
          |     ORDER BY n_chars DESC, doc_id ASC) AS rank
          | FROM documents)
          |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, score
          |FROM rk WHERE rank <= 7""".stripMargin,

      "q_embed_pairs" ->
        """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 60)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |   CAST(b.embedding AS DOUBLE[])), 6) AS sim
          |FROM e a JOIN e b ON a.vec_id < b.vec_id""".stripMargin,

      "q_ann_topk" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
          | s AS (SELECT q.query_id, e.vec_id,
          |   list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
          |     CAST(e.embedding AS DOUBLE[])) AS sim0
          |   FROM q CROSS JOIN embeddings e),
          | r AS (SELECT query_id, vec_id, sim0,
          |   row_number() OVER (PARTITION BY query_id
          |     ORDER BY sim0 DESC, vec_id ASC) AS rk FROM s)
          |SELECT query_id, vec_id, round(sim0, 6) AS sim, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 5""".stripMargin,

      "q_ann_pq" ->
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
          | cb AS (SELECT s.s AS s, CAST(r.rn - 1 AS INT) AS cid,
          |     r.x[s.s*8+1 : s.s*8+8] AS c
          |   FROM (SELECT x, row_number() OVER (ORDER BY vec_id) AS rn
          |     FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)) r,
          |    generate_series(0, 7) AS s(s)),
          | d AS (SELECT v.vec_id, cb.s, cb.cid,
          |     round(CAST(list_sum(list_transform(generate_series(1, 8),
          |       i -> CAST(round((v.x[cb.s*8+i] - cb.c[i])
          |         * (v.x[cb.s*8+i] - cb.c[i]), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM v, cb),
          | codes AS (SELECT vec_id, s, cid FROM (SELECT vec_id, s, cid,
          |     row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid)
          |       AS rn FROM d) WHERE rn = 1),
          | adc AS (SELECT q.vec_id AS query_id, c.vec_id,
          |     round(CAST(sum(CAST(q.d AS DECIMAL(38,18))) AS DOUBLE), 9)
          |       AS dist
          |   FROM codes c JOIN d q ON q.s = c.s AND q.cid = c.cid
          |   WHERE q.vec_id < 3 GROUP BY 1, 2),
          | r AS (SELECT query_id, vec_id, dist, row_number() OVER (
          |     PARTITION BY query_id ORDER BY dist, vec_id) AS rk FROM adc)
          |SELECT query_id, vec_id, dist, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 5""".stripMargin,

      "q_ann_pq_rerank" ->
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
          | cb AS (SELECT s.s AS s, CAST(r.rn - 1 AS INT) AS cid,
          |     r.x[s.s*8+1 : s.s*8+8] AS c
          |   FROM (SELECT x, row_number() OVER (ORDER BY vec_id) AS rn
          |     FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)) r,
          |    generate_series(0, 7) AS s(s)),
          | d AS (SELECT v.vec_id, cb.s, cb.cid,
          |     round(CAST(list_sum(list_transform(generate_series(1, 8),
          |       i -> CAST(round((v.x[cb.s*8+i] - cb.c[i])
          |         * (v.x[cb.s*8+i] - cb.c[i]), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM v, cb),
          | codes AS (SELECT vec_id, s, cid FROM (SELECT vec_id, s, cid,
          |     row_number() OVER (PARTITION BY vec_id, s ORDER BY d, cid)
          |       AS rn FROM d) WHERE rn = 1),
          | adc AS (SELECT q.vec_id AS query_id, c.vec_id,
          |     round(CAST(sum(CAST(q.d AS DECIMAL(38,18))) AS DOUBLE), 9)
          |       AS dist
          |   FROM codes c JOIN d q ON q.s = c.s AND q.cid = c.cid
          |   WHERE q.vec_id < 3 GROUP BY 1, 2),
          | pre AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
          |     row_number() OVER (PARTITION BY query_id
          |       ORDER BY dist, vec_id) AS rk FROM adc) WHERE rk <= 20),
          | ex AS (SELECT p.query_id, p.vec_id,
          |     round(CAST(list_sum(list_transform(generate_series(1, 64),
          |       i -> CAST(round((q.x[i] - c.x[i]) * (q.x[i] - c.x[i]), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM pre p JOIN v q ON q.vec_id = p.query_id
          |    JOIN v c ON c.vec_id = p.vec_id),
          | r AS (SELECT query_id, vec_id, d, row_number() OVER (
          |     PARTITION BY query_id ORDER BY d, vec_id) AS rk FROM ex)
          |SELECT query_id, vec_id, d AS dist, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 5""".stripMargin,

      "q_ann_sq8" ->
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
          | st AS (SELECT i.i AS dim, min(v.x[i.i]) AS mn,
          |     (max(v.x[i.i]) - min(v.x[i.i])) / 255.0 AS sc
          |   FROM v, generate_series(1, 64) AS i(i) GROUP BY i.i),
          | mm AS (SELECT list(mn ORDER BY dim) AS mins,
          |     list(sc ORDER BY dim) AS scs FROM st),
          | c AS (SELECT v.vec_id, list_transform(generate_series(1, 64),
          |     i -> CASE WHEN m.scs[i] = 0 THEN 0
          |       ELSE CAST(least(greatest(floor((v.x[i] - m.mins[i]) / m.scs[i]
          |         + 0.5), 0), 255) AS INT) END) AS code
          |   FROM v CROSS JOIN mm m),
          | q AS (SELECT vec_id AS query_id, x AS qv FROM v WHERE vec_id < 3),
          | s AS (SELECT q.query_id, c.vec_id,
          |     round(CAST(list_sum(list_transform(generate_series(1, 64),
          |       i -> CAST(round((q.qv[i] - (m.mins[i] + c.code[i] * m.scs[i]))
          |          * (q.qv[i] - (m.mins[i] + c.code[i] * m.scs[i])), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM q CROSS JOIN c CROSS JOIN mm m),
          | r AS (SELECT query_id, vec_id, d,
          |   row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rk
          |   FROM s)
          |SELECT query_id, vec_id, d AS dist, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 5""".stripMargin,

      "q_ann_sq8_rerank" ->
        """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
          | st AS (SELECT i.i AS dim, min(v.x[i.i]) AS mn,
          |     (max(v.x[i.i]) - min(v.x[i.i])) / 255.0 AS sc
          |   FROM v, generate_series(1, 64) AS i(i) GROUP BY i.i),
          | mm AS (SELECT list(mn ORDER BY dim) AS mins,
          |     list(sc ORDER BY dim) AS scs FROM st),
          | c AS (SELECT v.vec_id, list_transform(generate_series(1, 64),
          |     i -> CASE WHEN m.scs[i] = 0 THEN 0
          |       ELSE CAST(least(greatest(floor((v.x[i] - m.mins[i]) / m.scs[i]
          |         + 0.5), 0), 255) AS INT) END) AS code
          |   FROM v CROSS JOIN mm m),
          | q AS (SELECT vec_id AS query_id, x AS qv FROM v WHERE vec_id < 3),
          | s AS (SELECT q.query_id, c.vec_id,
          |     round(CAST(list_sum(list_transform(generate_series(1, 64),
          |       i -> CAST(round((q.qv[i] - (m.mins[i] + c.code[i] * m.scs[i]))
          |          * (q.qv[i] - (m.mins[i] + c.code[i] * m.scs[i])), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM q CROSS JOIN c CROSS JOIN mm m),
          | pre AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, d,
          |     row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rk
          |   FROM s) WHERE rk <= 20),
          | ex AS (SELECT p.query_id, p.vec_id,
          |     round(CAST(list_sum(list_transform(generate_series(1, 64),
          |       i -> CAST(round((q.qv[i] - v.x[i]) * (q.qv[i] - v.x[i]), 12)
          |         AS DECIMAL(38,18)))) AS DOUBLE), 9) AS d
          |   FROM pre p JOIN q ON p.query_id = q.query_id
          |   JOIN v ON p.vec_id = v.vec_id),
          | r AS (SELECT query_id, vec_id, d,
          |   row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rk
          |   FROM ex)
          |SELECT query_id, vec_id, d AS dist, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 5""".stripMargin,

      "q_ann_ivf" ->
        """SELECT vec_id AS query_id, TRUE AS recall_ok
          |FROM embeddings WHERE vec_id < 3""".stripMargin,

      "q_ann_ivf_pq" ->
        """SELECT vec_id AS query_id, TRUE AS recall_ok
          |FROM embeddings WHERE vec_id < 3""".stripMargin,

      "q_ann_index" ->
        """SELECT vec_id AS query_id, TRUE AS recall_ok
          |FROM embeddings WHERE vec_id < 3""".stripMargin,

      "q_ann_rerank" ->
        """SELECT vec_id AS query_id, TRUE AS recall_ok
          |FROM embeddings WHERE vec_id < 3""".stripMargin,

      "q_ann_hamming" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
          | h AS (SELECT q.query_id, e.vec_id,
          |   CAST(len(list_filter(generate_series(1, len(q.qv)),
          |     i -> (q.qv[i] > 0) <> (e.embedding[i] > 0))) AS BIGINT) AS hamming
          |   FROM q CROSS JOIN embeddings e),
          | r AS (SELECT query_id, vec_id, hamming,
          |   row_number() OVER (PARTITION BY query_id
          |     ORDER BY hamming ASC, vec_id ASC) AS rk FROM h)
          |SELECT query_id, vec_id, hamming, CAST(rk AS BIGINT) AS rank
          |FROM r WHERE rk <= 10""".stripMargin,

      "q_decontaminate" ->
        raw"""WITH d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | g0 AS (SELECT doc_id, unnest(list_transform(
           |     generate_series(1, greatest(len(toks) - 12, 0)),
           |     i -> array_to_string(toks[i:i+12], ' '))) AS g FROM d),
           | g AS (SELECT DISTINCT doc_id, g FROM g0),
           | bg AS (SELECT DISTINCT g FROM g WHERE doc_id % 7 = 0),
           | t AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
           | h AS (SELECT g.doc_id, count(*) AS n_contaminated
           |   FROM g JOIN bg USING (g) GROUP BY 1)
           |SELECT t.doc_id, t.n_grams,
           |  coalesce(h.n_contaminated, 0) AS n_contaminated,
           |  coalesce(h.n_contaminated, 0) > 0 AS contaminated
           |FROM t LEFT JOIN h ON t.doc_id = h.doc_id""".stripMargin,

      "q_dup_fraction" ->
        raw"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' extra tail'
           |  FROM documents WHERE doc_id % 5 = 0),
           | d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM corpus),
           | g0 AS (SELECT doc_id, unnest(list_transform(
           |     generate_series(1, greatest(len(toks) - 12, 0)),
           |     i -> array_to_string(toks[i:i+12], ' '))) AS g FROM d),
           | g AS (SELECT DISTINCT doc_id, g FROM g0),
           | dup AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2)
           |SELECT g.doc_id, count(*) AS n_grams,
           |  CAST(sum(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dup_grams,
           |  round(sum(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
           |    / CAST(count(*) AS DOUBLE), 6) AS dup_fraction
           |FROM g LEFT JOIN dup USING (g) GROUP BY g.doc_id""".stripMargin,

      "q_cdc_chunks" ->
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 200000, substr(text, 1, length(text) - 5) || ' tail edited now'
          |  FROM documents WHERE doc_id % 9 = 0),
          | cand AS (SELECT doc_id, text,
          |   unnest(generate_series(8, length(text))) AS i FROM corpus),
          | cut AS (SELECT doc_id, text, i FROM cand WHERE
          |   (CAST(ord(substr(text, i-7, 1)) AS BIGINT) * 27512614111
          |  + CAST(ord(substr(text, i-6, 1)) AS BIGINT) * 887503681
          |  + CAST(ord(substr(text, i-5, 1)) AS BIGINT) * 28629151
          |  + CAST(ord(substr(text, i-4, 1)) AS BIGINT) * 923521
          |  + CAST(ord(substr(text, i-3, 1)) AS BIGINT) * 29791
          |  + CAST(ord(substr(text, i-2, 1)) AS BIGINT) * 961
          |  + CAST(ord(substr(text, i-1, 1)) AS BIGINT) * 31
          |  + CAST(ord(substr(text, i, 1)) AS BIGINT)) % 32 = 0),
          | seg AS (
          |   SELECT doc_id,
          |     substr(text, lag(i,1,0) OVER (PARTITION BY doc_id ORDER BY i) + 1,
          |            i - lag(i,1,0) OVER (PARTITION BY doc_id ORDER BY i)) AS chunk
          |   FROM cut
          |   UNION ALL
          |   SELECT c.doc_id, substr(c.text, coalesce(m.mx, 0) + 1) AS chunk
          |   FROM corpus c LEFT JOIN (SELECT doc_id, max(i) AS mx FROM cut GROUP BY 1) m
          |     ON c.doc_id = m.doc_id
          |   WHERE length(c.text) > coalesce(m.mx, 0)),
          | sh AS (SELECT chunk FROM seg GROUP BY chunk
          |   HAVING count(DISTINCT doc_id) > 1)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
          |  CAST(coalesce(sum(CASE WHEN chunk IN (SELECT chunk FROM sh)
          |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_shared
          |FROM seg GROUP BY doc_id""".stripMargin,

      "q_subtract_seen_chunks" -> chunkDedupOracleSql,

      "q_to_parquet" ->
        "SELECT n_nationkey, n_name, n_regionkey FROM nation",

      // same computation as q_subtract_seen_chunks — per-doc decisions
      // are independent, so the micro-batched run answers identically
      "q_stream_chunk_dedup" -> chunkDedupOracleSql,

      "q_exact_substr" ->
        raw"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' planted unique suffix marker'
           |  FROM documents WHERE doc_id % 7 = 0),
           | d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM corpus),
           | w AS (SELECT doc_id,
           |   unnest(generate_series(1, greatest(len(toks) - 12, 0))) AS p,
           |   unnest(list_transform(generate_series(1, greatest(len(toks) - 12, 0)),
           |     i -> array_to_string(toks[i:i+12], ' '))) AS g FROM d),
           | m AS (SELECT doc_id, p AS s, p + 12 AS e FROM (
           |   SELECT doc_id, p,
           |     row_number() OVER (PARTITION BY g ORDER BY doc_id, p) AS rn
           |   FROM w) WHERE rn >= 2),
           | isl AS (SELECT doc_id, s, e,
           |   CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |   THEN 1 ELSE 0 END AS nw FROM m),
           | grp AS (SELECT doc_id, s, e, sum(nw) OVER (PARTITION BY doc_id
           |   ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |   AS grp FROM isl),
           | sp AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM grp
           |   GROUP BY doc_id, grp),
           | rem AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS removed
           |   FROM sp GROUP BY 1),
           | tok AS (SELECT doc_id, unnest(toks) AS w,
           |   unnest(generate_series(1, len(toks))) AS i FROM d),
           | kept AS (SELECT t.doc_id, t.w, t.i FROM tok t
           |   WHERE NOT EXISTS (SELECT 1 FROM sp
           |     WHERE sp.doc_id = t.doc_id AND t.i BETWEEN sp.s AND sp.e)),
           | txt AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text_clean
           |   FROM kept GROUP BY 1)
           |SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS n_tokens,
           |  coalesce(rem.removed, 0) AS n_removed,
           |  coalesce(txt.text_clean, '') AS text_clean
           |FROM d LEFT JOIN rem ON d.doc_id = rem.doc_id
           |LEFT JOIN txt ON d.doc_id = txt.doc_id""".stripMargin,

      // positional substring counts (overlapping) mirror Aho–Corasick
      // all-occurrence semantics exactly
      "q_blocklist" ->
        """WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
          | c AS (SELECT doc_id,
          |   len(list_filter(generate_series(1, length(t) - 4),
          |     i -> substr(t, i, 5) = 'spark'))
          | + len(list_filter(generate_series(1, length(t) - 3),
          |     i -> substr(t, i, 4) = 'hash'))
          | + len(list_filter(generate_series(1, length(t) - 7),
          |     i -> substr(t, i, 8) = 'row scan')) AS n_blocked
          |  FROM d)
          |SELECT doc_id, n_blocked, n_blocked = 0 AS blocklist_pass FROM c""".stripMargin,

      "q_bm25" ->
        raw"""WITH d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(lower(text)), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | f AS (SELECT doc_id, len(toks) AS dl,
           |   len(list_filter(toks, x -> x = 'spark')) AS tf0,
           |   len(list_filter(toks, x -> x = 'table')) AS tf1,
           |   len(list_filter(toks, x -> x = 'hash')) AS tf2
           |  FROM d),
           | g AS (SELECT count(*) AS n, sum(dl) AS sdl,
           |   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
           |   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
           |   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
           |  FROM f)
           |SELECT doc_id, round(
           |   ln(1.0 + (CAST(n AS DOUBLE) - df0 + 0.5) / (df0 + 0.5))
           |     * (CAST(tf0 AS DOUBLE) * (1.2 + 1.0))
           |     / (CAST(tf0 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
           |        / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
           | + ln(1.0 + (CAST(n AS DOUBLE) - df1 + 0.5) / (df1 + 0.5))
           |     * (CAST(tf1 AS DOUBLE) * (1.2 + 1.0))
           |     / (CAST(tf1 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
           |        / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
           | + ln(1.0 + (CAST(n AS DOUBLE) - df2 + 0.5) / (df2 + 0.5))
           |     * (CAST(tf2 AS DOUBLE) * (1.2 + 1.0))
           |     / (CAST(tf2 AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
           |        / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS score
           |FROM f, g WHERE tf0 + tf1 + tf2 > 0""".stripMargin,

      // unrolled Lloyd iterations mirroring Similarity.kmeans arithmetic
      // exactly (12-dp rounds, DECIMAL(38,18) sums, 9-dp distances, cid
      // tiebreak) — assignments and distances are bit-equal
      "q_kmeans" -> kmeansOracleSql,

      "q_bbox_convert" ->
        """WITH b AS (SELECT doc_id,
          |    doc_id % 100 AS x, (doc_id * 3) % 80 AS y,
          |    doc_id % 7 + 10 AS w, doc_id % 11 + 5 AS h,
          |    doc_id % 130 AS px, doc_id % 90 AS py
          |  FROM documents)
          |SELECT doc_id,
          |  x AS voc0, y AS voc1, x + w AS voc2, y + h AS voc3,
          |  x AS coco0, y AS coco1, w AS coco2, h AS coco3,
          |  round((2*x + w) / 2.0 / 641, 4) AS yolo0,
          |  round((2*y + h) / 2.0 / 479, 4) AS yolo1,
          |  round(w / 641.0, 4) AS yolo2, round(h / 479.0, 4) AS yolo3,
          |  round(x / 641.0, 4) AS alb0, round(y / 479.0, 4) AS alb1,
          |  round((x + w) / 641.0, 4) AS alb2,
          |  round((y + h) / 479.0, 4) AS alb3,
          |  x <= px AND px <= x + w AND y <= py AND py <= y + h AS pin
          |FROM b""".stripMargin,

      "q_cluster_balance" ->
        s"""SELECT vec_id, cluster, dist FROM (
          |  SELECT vec_id, cluster, dist,
          |    row_number() OVER (PARTITION BY cluster
          |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn2
          |  FROM ($kmeansOracleSql)
          |) WHERE rn2 <= 40""".stripMargin,

      "q_c4_rules" ->
        raw"""WITH d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | sz AS (SELECT doc_id, toks, len(toks) AS nt, len(toks)//3 AS k FROM d),
           | pg AS (SELECT doc_id,
           |   array_to_string(toks[1:k], ' ') || '.' AS l1,
           |   CASE WHEN doc_id % 7 = 0
           |     THEN array_to_string(toks[k+1:2*k], ' ') || ' javascript.'
           |     ELSE array_to_string(toks[k+1:2*k], ' ') || '.' END AS l2,
           |   CASE WHEN doc_id % 13 = 0
           |     THEN array_to_string(toks[2*k+1:nt], ' ') || ' {.'
           |     ELSE array_to_string(toks[2*k+1:nt], ' ') || '.' END AS l3
           |  FROM sz),
           | t2 AS (SELECT doc_id,
           |   CASE WHEN doc_id % 11 = 0
           |     THEN l1 || chr(10) || l2 || chr(10) || l3 || chr(10) ||
           |       'lorem ipsum dolor sit amet words.'
           |     ELSE l1 || chr(10) || l2 || chr(10) || l3 END AS text
           |  FROM pg),
           | s AS (SELECT doc_id, text,
           |   string_split(text, chr(10)) AS lines,
           |   list_filter(string_split(text, chr(10)), l ->
           |     (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
           |       OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"'))
           |     AND len(list_filter(string_split_regex(trim(l), '\s+'),
           |       w -> w <> '')) >= 5
           |     AND NOT contains(lower(l), 'javascript')) AS kept
           |  FROM t2)
           |SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
           |  len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
           |    AND NOT contains(text, '{') AS c4_keep,
           |  coalesce(array_to_string(kept, chr(10)), '') AS text_clean
           |FROM s""".stripMargin,

      "q_weighted_sample" ->
        """SELECT doc_id, source, n_chars FROM (
          |  SELECT doc_id, source, n_chars,
          |    round(pow(CAST(CAST('0x' || substr(md5(doc_id || ':ws'), 1, 13)
          |        AS BIGINT) AS DOUBLE) / 4503599627370496.0,
          |      1.0 / CAST(n_chars AS DOUBLE)), 12) AS k
          |  FROM documents WHERE n_chars > 0
          |  ORDER BY k DESC, doc_id ASC LIMIT 100)""".stripMargin,

      "q_gopher_rules" ->
        raw"""WITH d AS (SELECT doc_id, text,
           |   list_filter(string_split_regex(trim(text), '\s+'), t -> t <> '') AS toks,
           |   string_split(text, chr(10)) AS lines
           |  FROM documents)
           |SELECT doc_id,
           |  len(toks) AS n_words,
           |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           |    / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
           |  round(CAST((length(text) - length(replace(text, '#', '')))
           |      + (length(text) - length(replace(text, '...', ''))) / 3
           |      + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
           |    / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
           |  round(CAST(len(list_filter(lines,
           |      l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS DOUBLE)
           |    / CAST(len(lines) AS DOUBLE), 6) AS bullet_frac,
           |  round(CAST(len(list_filter(lines,
           |      l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           |    / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_frac,
           |  round(CAST(len(list_filter(toks,
           |      x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           |    / CAST(len(toks) AS DOUBLE), 6) AS alpha_frac,
           |  len(list_filter(['the','be','to','of','and','that','have','with'],
           |    w -> list_contains(list_transform(toks, x -> lower(x)), w))) AS stop_hits,
           |  (len(toks) BETWEEN 50 AND 100000)
           |    AND (round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           |      / CAST(len(toks) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0)
           |    AND (round(CAST((length(text) - length(replace(text, '#', '')))
           |        + (length(text) - length(replace(text, '...', ''))) / 3
           |        + (length(text) - length(replace(text, '…', ''))) AS DOUBLE)
           |      / CAST(len(toks) AS DOUBLE), 6) <= 0.1)
           |    AND (round(CAST(len(list_filter(lines,
           |        l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS DOUBLE)
           |      / CAST(len(lines) AS DOUBLE), 6) <= 0.9)
           |    AND (round(CAST(len(list_filter(lines,
           |        l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS DOUBLE)
           |      / CAST(len(lines) AS DOUBLE), 6) <= 0.3)
           |    AND (round(CAST(len(list_filter(toks,
           |        x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
           |      / CAST(len(toks) AS DOUBLE), 6) >= 0.8)
           |    AND (len(list_filter(['the','be','to','of','and','that','have','with'],
           |      w -> list_contains(list_transform(toks, x -> lower(x)), w))) >= 2)
           |    AS gopher_pass
           |FROM d""".stripMargin,

      // unrolled power iteration; every arithmetic step mirrors
      // Graph.pageRank exactly (12-dp rounds, DECIMAL(38,18) sums), so the
      // rank vector is bit-equal, not approximately equal
      "q_inverted_index" ->
        raw"""WITH t AS (SELECT doc_id,
           |   unnest(list_filter(string_split_regex(trim(regexp_replace(
           |     lower(text), '[^a-z0-9\s]', ' ', 'g')), '\s+'),
           |     x -> x <> '')) AS token
           |  FROM documents),
           | d AS (SELECT token, doc_id, count(*) AS k FROM t GROUP BY 1, 2)
           |SELECT token, count(*) AS df, CAST(sum(k) AS BIGINT) AS tf,
           |  string_agg(doc_id, ',' ORDER BY doc_id) AS postings_csv
           |FROM d GROUP BY token""".stripMargin,

      "q_random_projection" -> {
        import IntHashSql._
        // The DECIMAL(38,12) term cast is load-bearing: DuckDB's
        // round(double, 12) returns a DOUBLE whose binary value sits
        // ~1e-16 off the clean 12-dp decimal; casting THAT at scale 18
        // captures the representation noise and a later 9-dp decimal
        // round can flip an exact .5 tie. At scale 12 the nearest-decimal
        // cast absorbs the noise and recovers the clean term, matching
        // Spark's shortest-repr double→decimal conversion exactly.
        s"""WITH m0 AS (SELECT a.j, b.i,
           |    CAST(a.j*131071 + b.i AS HUGEINT) AS h
           |   FROM generate_series(0, 15) a(j), generate_series(0, 63) b(i)),
           | m1 AS (SELECT j, i, ${xorc1("h")} AS h FROM m0),
           | m2 AS (SELECT j, i, ${xsh("h")} AS h FROM m1),
           | m3 AS (SELECT j, i, ${mulm("h", c2)} AS h FROM m2),
           | m4 AS (SELECT j, i, ${xsh("h")} AS h FROM m3),
           | m5 AS (SELECT j, i, ${mulm("h", c3)} AS h FROM m4),
           | m AS (SELECT j, i, CASE WHEN ${xsh("h")} % 2 = 1
           |     THEN 1.0 ELSE -1.0 END AS s FROM m5),
           | v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
           |   FROM embeddings),
           | t AS (SELECT vec_id, j,
           |    sum(CAST(round(x[i+1] * s, 12) AS DECIMAL(38,12))) AS acc
           |   FROM v, m GROUP BY 1, 2)
           |SELECT vec_id, CAST(j AS INT) AS j,
           |  CAST(round(acc, 9) AS DOUBLE) * 0.25 AS y
           |FROM t""".stripMargin
      },

      "q_covariance" ->
        """WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
          | p AS (SELECT i, j, x[i+1] AS xi, x[j+1] AS xj FROM v,
          |   (SELECT a.i, b.j FROM generate_series(0, 63) a(i)
          |      JOIN generate_series(0, 63) b(j) ON b.j >= a.i) ij),
          | g AS (SELECT i, j, count(*) AS n,
          |   CAST(sum(CAST(round(xi * xj, 12) AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
          |   CAST(sum(CAST(round(xi, 12) AS DECIMAL(38,18))) AS DOUBLE) AS sx,
          |   CAST(sum(CAST(round(xj, 12) AS DECIMAL(38,18))) AS DOUBLE) AS sy
          |  FROM p GROUP BY 1, 2)
          |SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
          |  round((sxy - sx * sy / n) / n, 9) AS cov FROM g""".stripMargin,

      "q_rrf" ->
        """WITH ra AS (SELECT doc_id, row_number() OVER (
          |     ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id ASC) AS r
          |   FROM documents),
          | rb AS (SELECT doc_id, row_number() OVER (
          |     ORDER BY CAST((doc_id * 37 + 11) % 101 AS DOUBLE) DESC,
          |       doc_id ASC) AS r
          |   FROM documents),
          | u AS (SELECT * FROM ra UNION ALL SELECT * FROM rb)
          |SELECT doc_id,
          |  round(CAST(sum(CAST(round(1.0 / (60 + r), 12) AS DECIMAL(38,18)))
          |    AS DOUBLE), 9) AS rrf_score,
          |  count(*) AS n_runs
          |FROM u GROUP BY doc_id""".stripMargin,

      "q_url_dedup" ->
        raw"""WITH r AS (SELECT doc_id,
           |   CASE WHEN doc_id % 3 = 0 THEN
           |     'HTTPS://WWW.Site' || CAST(doc_id % 20 AS VARCHAR) ||
           |     '.COM:443/page/' || CAST(doc_id % 7 AS VARCHAR) ||
           |     '/?utm_source=feed&b=2&a=1#sec'
           |   WHEN doc_id % 3 = 1 THEN
           |     'https://www.site' || CAST(doc_id % 20 AS VARCHAR) ||
           |     '.com/page/' || CAST(doc_id % 7 AS VARCHAR) || '?a=1&b=2'
           |   ELSE
           |     'http://site' || CAST(doc_id % 20 AS VARCHAR) ||
           |     '.com:80/item/' || CAST(doc_id % 11 AS VARCHAR) || '?gclid=xyz'
           |   END AS raw FROM documents),
           | s1 AS (SELECT doc_id, regexp_replace(trim(raw), '#.*$$', '') AS nf
           |   FROM r),
           | s2 AS (SELECT doc_id,
           |   lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
           |     AS scheme,
           |   regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
           |   FROM s1),
           | s3 AS (SELECT doc_id, scheme,
           |   lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
           |   regexp_replace(regexp_extract(rest, '^[^/?]*([^?]*)', 1),
           |     '/+$$', '') AS path,
           |   regexp_extract(rest, '\?(.*)$$', 1) AS query FROM s2),
           | s4 AS (SELECT doc_id, scheme,
           |   CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
           |     WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
           |     ELSE hostport END AS host,
           |   path,
           |   coalesce(array_to_string(list_sort(list_filter(
           |     string_split(query, '&'),
           |     p -> p <> '' AND NOT regexp_matches(p,
           |       '^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid)='))),
           |     '&'), '') AS q FROM s3),
           | canon AS (SELECT doc_id, scheme || '://' || host || path ||
           |   CASE WHEN q = '' THEN '' ELSE '?' || q END AS url FROM s4)
           |SELECT url, min(doc_id) AS keep_id, count(*) AS dup_count
           |FROM canon GROUP BY url""".stripMargin,

      "q_kcore_converged" -> kcoreUnrolledSql(qty = 46, k = 3, rounds = 8),

      "q_ppr" -> pprUnrolledSql(Seq("s1", "s2", "s3"), iters = 3),

      "q_kcore" ->
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
          |   WHERE l_quantity > 40),
          | e0 AS (SELECT DISTINCT
          |     CAST(least(a.l_partkey, b.l_partkey) AS VARCHAR) AS a,
          |     CAST(greatest(a.l_partkey, b.l_partkey) AS VARCHAR) AS b
          |   FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
          |     AND a.l_partkey < b.l_partkey),
          | d1 AS (SELECT node, count(*) AS deg FROM (
          |     SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
          | a1 AS (SELECT node FROM d1 WHERE deg >= 4),
          | e1 AS (SELECT e0.a, e0.b FROM e0
          |   JOIN a1 x ON e0.a = x.node JOIN a1 y ON e0.b = y.node),
          | d2 AS (SELECT node, count(*) AS deg FROM (
          |     SELECT a AS node FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
          | a2 AS (SELECT node FROM d2 WHERE deg >= 4),
          | e2 AS (SELECT e1.a, e1.b FROM e1
          |   JOIN a2 x ON e1.a = x.node JOIN a2 y ON e1.b = y.node),
          | d3 AS (SELECT node, count(*) AS deg FROM (
          |     SELECT a AS node FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
          | a3 AS (SELECT node FROM d3 WHERE deg >= 4),
          | e3 AS (SELECT e2.a, e2.b FROM e2
          |   JOIN a3 x ON e2.a = x.node JOIN a3 y ON e2.b = y.node),
          | d4 AS (SELECT node, count(*) AS deg FROM (
          |     SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
          | a4 AS (SELECT node FROM d4 WHERE deg >= 4),
          | e4 AS (SELECT e3.a, e3.b FROM e3
          |   JOIN a4 x ON e3.a = x.node JOIN a4 y ON e3.b = y.node)
          |SELECT node, count(*) AS degree FROM (
          |  SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
          |GROUP BY node""".stripMargin,

      "q_pagerank" ->
        """WITH e AS (SELECT DISTINCT 's'||l_suppkey AS src, 'p'||l_partkey AS dst
          |   FROM lineitem),
          | nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
          | dg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
          | nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
          | r0 AS (SELECT node, round(1.0/(SELECT n FROM nn), 12) AS rank FROM nd),
          | c1 AS (SELECT e.dst AS node,
          |     CAST(sum(CAST(round(r.rank/dg.d, 12) AS DECIMAL(38,18))) AS DOUBLE) AS c
          |   FROM e JOIN r0 r ON e.src = r.node JOIN dg ON e.src = dg.src
          |   GROUP BY e.dst),
          | d1 AS (SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(38,18))) AS DOUBLE), 0) AS dm
          |   FROM r0 r LEFT JOIN dg ON r.node = dg.src WHERE dg.src IS NULL),
          | r1 AS (SELECT nd.node, round((1-0.85)/(SELECT n FROM nn)
          |     + 0.85*(coalesce(c1.c, 0) + (SELECT dm FROM d1)/(SELECT n FROM nn)), 12) AS rank
          |   FROM nd LEFT JOIN c1 ON nd.node = c1.node),
          | c2 AS (SELECT e.dst AS node,
          |     CAST(sum(CAST(round(r.rank/dg.d, 12) AS DECIMAL(38,18))) AS DOUBLE) AS c
          |   FROM e JOIN r1 r ON e.src = r.node JOIN dg ON e.src = dg.src
          |   GROUP BY e.dst),
          | d2 AS (SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(38,18))) AS DOUBLE), 0) AS dm
          |   FROM r1 r LEFT JOIN dg ON r.node = dg.src WHERE dg.src IS NULL),
          | r2 AS (SELECT nd.node, round((1-0.85)/(SELECT n FROM nn)
          |     + 0.85*(coalesce(c2.c, 0) + (SELECT dm FROM d2)/(SELECT n FROM nn)), 12) AS rank
          |   FROM nd LEFT JOIN c2 ON nd.node = c2.node),
          | c3 AS (SELECT e.dst AS node,
          |     CAST(sum(CAST(round(r.rank/dg.d, 12) AS DECIMAL(38,18))) AS DOUBLE) AS c
          |   FROM e JOIN r2 r ON e.src = r.node JOIN dg ON e.src = dg.src
          |   GROUP BY e.dst),
          | d3 AS (SELECT coalesce(CAST(sum(CAST(r.rank AS DECIMAL(38,18))) AS DOUBLE), 0) AS dm
          |   FROM r2 r LEFT JOIN dg ON r.node = dg.src WHERE dg.src IS NULL),
          | r3 AS (SELECT nd.node, round((1-0.85)/(SELECT n FROM nn)
          |     + 0.85*(coalesce(c3.c, 0) + (SELECT dm FROM d3)/(SELECT n FROM nn)), 12) AS rank
          |   FROM nd LEFT JOIN c3 ON nd.node = c3.node)
          |SELECT node, rank FROM r3""".stripMargin,

      "q_triangles" ->
        """WITH pe AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
          |   FROM lineitem l1 JOIN lineitem l2
          |     ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
          |   WHERE l1.l_quantity > 30 AND l2.l_quantity > 30),
          | tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |   FROM pe e1 JOIN pe e2 ON e2.a = e1.a AND e2.b > e1.b
          |              JOIN pe e3 ON e3.a = e1.b AND e3.b = e2.b),
          | corners AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          |   UNION ALL SELECT z FROM tri),
          | t AS (SELECT node, count(*) AS triangles FROM corners GROUP BY node),
          | d AS (SELECT node, count(*) AS degree FROM
          |    (SELECT a AS node FROM pe UNION ALL SELECT b FROM pe) GROUP BY node)
          |SELECT CAST(d.node AS VARCHAR) AS node, d.degree,
          |  coalesce(t.triangles, 0) AS triangles,
          |  CASE WHEN d.degree >= 2
          |    THEN round(2.0*coalesce(t.triangles, 0)/(d.degree*(d.degree - 1)), 12)
          |    ELSE 0.0 END AS lcc
          |FROM d LEFT JOIN t ON d.node = t.node""".stripMargin,

      "q_dsir" ->
        raw"""WITH d AS (SELECT doc_id, source,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | g AS (SELECT doc_id, source, unnest(list_concat(toks,
           |     list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
           |       i -> toks[i] || ' ' || toks[i+1]))) AS g FROM d),
           | bk AS (SELECT doc_id, source,
           |   CAST(('0x' || substring(md5(g), 1, 6)) AS BIGINT) % 1024 AS b
           |  FROM g),
           | ct AS (SELECT b, count(*) AS ct FROM bk
           |   WHERE source IN ('src0','src1') GROUP BY 1),
           | cr AS (SELECT b, count(*) AS cr FROM bk
           |   WHERE source NOT IN ('src0','src1') GROUP BY 1),
           | tt AS (SELECT sum(ct) AS tt FROM ct),
           | tr AS (SELECT sum(cr) AS tr FROM cr),
           | lam AS (SELECT coalesce(ct.b, cr.b) AS b,
           |    ln((coalesce(ct, 0) + 1.0) / (tt + 1024.0)) -
           |    ln((coalesce(cr, 0) + 1.0) / (tr + 1024.0)) AS lam
           |   FROM ct FULL OUTER JOIN cr ON ct.b = cr.b
           |   CROSS JOIN tt CROSS JOIN tr)
           |SELECT doc_id, count(*) AS n_grams,
           |  round(avg(lam), 6) AS dsir_logratio
           |FROM bk JOIN lam USING (b)
           |WHERE source NOT IN ('src0','src1') GROUP BY 1""".stripMargin,

      "q_temperature_mix" ->
        """WITH docs AS (SELECT doc_id, source FROM documents
          |   WHERE doc_id % 3 <> 0 OR source IN ('src0','src1')),
          | c AS (SELECT source, count(*) AS n FROM docs GROUP BY 1),
          | m AS (SELECT min(n) AS nmin FROM c),
          | r AS (SELECT source,
          |   round(pow(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE), 0.5), 9)
          |     AS keep FROM c CROSS JOIN m),
          | t AS (SELECT source, CASE WHEN keep >= 1.0 THEN 'zzzzzzzz'
          |   ELSE printf('%08x', CAST(floor(keep * 4294967296.0) AS BIGINT))
          |   END AS thr FROM r)
          |SELECT doc_id, source FROM docs JOIN t USING (source)
          |WHERE substring(md5(doc_id || ':temp1'), 1, 8) < thr""".stripMargin,

      "q_lm_perplexity" ->
        raw"""WITH d AS (SELECT doc_id,
           |   list_filter(string_split_regex(trim(regexp_replace(lower(text),
           |     '[^a-z0-9\s]', ' ', 'g')), '\s+'), t -> t <> '') AS toks
           |  FROM documents),
           | tr AS (SELECT doc_id, toks FROM d WHERE doc_id % 2 = 0),
           | sc AS (SELECT doc_id, toks FROM d WHERE doc_id % 2 = 1),
           | trtok AS (SELECT doc_id, unnest(toks) AS w,
           |   unnest(generate_series(1, len(toks))) AS i FROM tr),
           | sctok AS (SELECT doc_id, unnest(toks) AS w,
           |   unnest(generate_series(1, len(toks))) AS i FROM sc),
           | u AS (SELECT w, count(*) AS u FROM trtok GROUP BY 1),
           | tot AS (SELECT CAST(sum(u) AS DOUBLE) AS t, count(*) AS v FROM u),
           | b AS (SELECT a.w AS w1, z.w AS w2, count(*) AS b FROM trtok a
           |   JOIN trtok z ON a.doc_id = z.doc_id AND z.i = a.i + 1
           |   GROUP BY 1, 2),
           | scbg AS (SELECT a.doc_id, a.w AS w1, z.w AS w2 FROM sctok a
           |   JOIN sctok z ON a.doc_id = z.doc_id AND z.i = a.i + 1),
           | j AS (SELECT s.doc_id,
           |    ln(0.9 * coalesce(CAST(b.b AS DOUBLE) / u1.u, 0) +
           |       (1 - 0.9) * (coalesce(u2.u, 0) + 1) / (tot.t + tot.v)) AS lp
           |   FROM scbg s
           |   LEFT JOIN b ON s.w1 = b.w1 AND s.w2 = b.w2
           |   LEFT JOIN u u1 ON s.w1 = u1.w
           |   LEFT JOIN u u2 ON s.w2 = u2.w
           |   CROSS JOIN tot)
           |SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logp,
           |  round(exp(-round(avg(lp), 6)), 3) AS ppl
           |FROM j GROUP BY 1""".stripMargin,

      "q_partitioned_dataset" ->
        """SELECT doc_id, lang, source, n_chars FROM documents
          |WHERE lang IN ('en', 'de')
          |  AND doc_id <= (SELECT max(doc_id) FROM documents) // 2
          |  AND n_chars >= 50""".stripMargin,

      "q_token_mix" ->
        """WITH b(source, budget) AS (VALUES ('src0', 1000000),
          |   ('src1', 5000), ('src2', 2000), ('src3', 300)),
          | d AS (SELECT doc_id, source, n_chars AS tokens,
          |   md5(doc_id || ':tmix') AS h FROM documents),
          | j AS (SELECT d.*, b.budget FROM d JOIN b USING (source)),
          | r AS (SELECT *, coalesce(sum(tokens) OVER (PARTITION BY source
          |   ORDER BY h, doc_id
          |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |   AS before FROM j)
          |SELECT doc_id, source, tokens FROM r WHERE before < budget""".stripMargin,

      "q_bpe_mix" ->
        s"""WITH
           |${bpeTrainCtes(8)},
           | dws AS (SELECT doc_id,
           |    list_filter(string_split_regex(text, '\\s+'),
           |      x -> x != '') AS ws
           |   FROM documents),
           | wpos AS (SELECT d.doc_id, d.ws[t.widx] AS word
           |   FROM dws d, unnest(range(1, len(d.ws) + 1)) AS t(widx)),
           | dt AS (SELECT w.doc_id, sum(len(f.syms)) AS tokens
           |   FROM wpos w JOIN f8 f USING (word) GROUP BY 1),
           | b(source, budget) AS (VALUES ('src0', 500000),
           |   ('src1', 3000), ('src2', 1200), ('src3', 200)),
           | d0 AS (SELECT d.doc_id, d.source,
           |   CAST(coalesce(dt.tokens, 0) AS BIGINT) AS tokens,
           |   md5(d.doc_id || ':bmix') AS h
           |  FROM documents d LEFT JOIN dt USING (doc_id)),
           | j AS (SELECT d0.*, b.budget FROM d0 JOIN b USING (source)),
           | r AS (SELECT *, coalesce(sum(tokens) OVER (PARTITION BY source
           |   ORDER BY h, doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |   AS before FROM j)
           |SELECT doc_id, source, tokens FROM r
           |WHERE before < budget""".stripMargin,

      "q_ctx_windows" ->
        s"""WITH
           |${bpeTrainCtes(8)},
           | dws AS (SELECT doc_id,
           |    list_filter(string_split_regex(text, '\\s+'),
           |      x -> x != '') AS ws
           |   FROM documents),
           | wpos AS (SELECT d.doc_id, d.ws[t.widx] AS word
           |   FROM dws d, unnest(range(1, len(d.ws) + 1)) AS t(widx)),
           | dt AS (SELECT w.doc_id, sum(len(f.syms)) AS tokens
           |   FROM wpos w JOIN f8 f USING (word) GROUP BY 1),
           | d0 AS (SELECT d.doc_id,
           |   CAST(coalesce(dt.tokens, 0) AS BIGINT) AS tokens,
           |   md5(d.doc_id || ':pack') AS h
           |  FROM documents d LEFT JOIN dt USING (doc_id)),
           | dpos AS (SELECT *, CAST(coalesce(sum(tokens) OVER (
           |    ORDER BY h, doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |    AS BIGINT) AS strt
           |   FROM d0 WHERE tokens > 0),
           | fr AS (SELECT doc_id, tokens, strt,
           |    unnest(range(strt // 512, (strt + tokens - 1) // 512 + 1))
           |      AS seq_id
           |   FROM dpos)
           |SELECT doc_id, seq_id,
           |  greatest(strt, seq_id * 512) - seq_id * 512 AS seq_off,
           |  greatest(strt, seq_id * 512) - strt + 1 AS tok_from,
           |  least(strt + tokens, (seq_id + 1) * 512) - strt AS tok_to
           |FROM fr""".stripMargin,

      "q_bpe_bytes" ->
        s"""WITH corpus AS (SELECT doc_id,
           |    substr(text, 1, 200) || ' café 中文 €9 𝄞x' AS text
           |   FROM documents WHERE doc_id % 11 = 0),
           |${bpeByteTrainCtes(8)},
           | docs AS (SELECT doc_id,
           |    regexp_extract_all(text, '$bpePreTokPatSql') AS ws
           |   FROM corpus),
           | wpos AS (SELECT d.doc_id, t.widx, d.ws[t.widx] AS word
           |   FROM docs d, unnest(range(1, len(d.ws) + 1)) AS t(widx)),
           | toks AS (SELECT w.doc_id, w.widx, u.tidx,
           |    f.syms[u.tidx] AS token
           |   FROM wpos w JOIN f8 f USING (word),
           |     unnest(range(1, len(f.syms) + 1)) AS u(tidx))
           |SELECT t.doc_id,
           |  count(*) AS n_tokens,
           |  CAST(sum(v.id) AS BIGINT) AS id_sum,
           |  CAST(sum(t.widx * v.id) AS BIGINT) AS wid_sum,
           |  CAST(sum(t.tidx * v.id) AS BIGINT) AS tid_sum,
           |  256 + (SELECT n FROM nmerges) AS eot_id
           |FROM toks t JOIN voc v ON v.token = t.token
           |GROUP BY 1""".stripMargin,

      "q_bpe_roundtrip" ->
        """SELECT doc_id,
          |  substr(text, 1, 220) || ' ¡mixté! 🙂<|endoftext|>中<|fim▁|>ok'
          |    AS text
          |FROM documents WHERE doc_id % 19 = 0""".stripMargin,

      "q_bpe_extend" ->
        s"""WITH corpus AS (SELECT doc_id,
           |    substr(text, 1, 180) || ' naïve 東京 ₿7' AS text
           |   FROM documents WHERE doc_id % 17 = 0),
           |${bpeByteTrainCtes(8)},
           | docs AS (SELECT doc_id,
           |    regexp_extract_all(text, '$bpePreTokPatSql') AS ws
           |   FROM corpus),
           | wpos AS (SELECT d.doc_id, t.widx, d.ws[t.widx] AS word
           |   FROM docs d, unnest(range(1, len(d.ws) + 1)) AS t(widx)),
           | toks AS (SELECT w.doc_id, w.widx, u.tidx,
           |    f.syms[u.tidx] AS token
           |   FROM wpos w JOIN f8 f USING (word),
           |     unnest(range(1, len(f.syms) + 1)) AS u(tidx))
           |SELECT t.doc_id,
           |  count(*) AS n_tokens,
           |  CAST(sum(v.id) AS BIGINT) AS id_sum,
           |  CAST(sum(t.widx * v.id) AS BIGINT) AS wid_sum,
           |  CAST(sum(t.tidx * v.id) AS BIGINT) AS tid_sum
           |FROM toks t JOIN voc v ON v.token = t.token
           |GROUP BY 1""".stripMargin,

      "q_bpe_persist" ->
        s"""WITH corpus AS (SELECT doc_id, substr(text, 1, 150) AS text
           |   FROM documents WHERE doc_id % 13 = 0),
           |${bpeByteTrainCtes(6)},
           | docs AS (SELECT doc_id,
           |    string_split(text || '<|endoftext|>' || text,
           |      '<|endoftext|>') AS parts
           |   FROM corpus),
           | segs AS (SELECT d.doc_id, t.sidx, d.parts[t.sidx] AS seg,
           |    len(d.parts) AS np
           |   FROM docs d, unnest(range(1, len(d.parts) + 1)) AS t(sidx)),
           | wseg AS (SELECT doc_id, sidx, np,
           |    regexp_extract_all(seg, '$bpePreTokPatSql') AS ws
           |   FROM segs),
           | pwords AS (SELECT w.doc_id, w.sidx, t.pos, w.ws[t.pos] AS word,
           |    false AS isspec
           |   FROM wseg w, unnest(range(1, len(w.ws) + 1)) AS t(pos)),
           | swords AS (SELECT doc_id, sidx, 2147483647 AS pos,
           |    '<|endoftext|>' AS word, true AS isspec
           |   FROM wseg WHERE sidx < np),
           | words AS (SELECT doc_id, isspec, word,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY sidx, pos) AS widx
           |   FROM (SELECT * FROM pwords UNION ALL SELECT * FROM swords)),
           | toks AS (
           |   SELECT w.doc_id, w.widx, u.tidx, f.syms[u.tidx] AS token
           |   FROM (SELECT * FROM words WHERE NOT isspec) w
           |     JOIN f6 f USING (word),
           |     unnest(range(1, len(f.syms) + 1)) AS u(tidx)
           |   UNION ALL
           |   SELECT doc_id, widx, 1 AS tidx, word AS token
           |   FROM words WHERE isspec),
           | voc2 AS (SELECT token, id FROM voc
           |   UNION ALL
           |   SELECT '<|endoftext|>', 256 + (SELECT n FROM nmerges))
           |SELECT t.doc_id,
           |  count(*) AS n_tokens,
           |  CAST(sum(v.id) AS BIGINT) AS id_sum,
           |  CAST(sum(t.widx * v.id) AS BIGINT) AS wid_sum,
           |  CAST(sum(t.tidx * v.id) AS BIGINT) AS tid_sum
           |FROM toks t JOIN voc2 v ON v.token = t.token
           |GROUP BY 1""".stripMargin,

      "q_token_mix_epochs" ->
        """WITH b(source, budget) AS (VALUES ('src0', 200000), ('src1', 5000)),
          | d AS (SELECT doc_id, source, n_chars AS tokens,
          |   md5(doc_id || ':emix') AS h FROM documents),
          | m AS (SELECT source, sum(tokens) AS mass FROM d
          |   JOIN b USING (source) GROUP BY source),
          | pl AS (SELECT b.source, b.budget, m.mass,
          |   CASE WHEN m.mass > 0 THEN b.budget // m.mass ELSE 0 END AS e
          |   FROM b JOIN m USING (source)),
          | f AS (SELECT d.doc_id, d.source, d.tokens,
          |   unnest(range(0, CAST(pl.e AS BIGINT))) AS epoch
          |   FROM d JOIN pl USING (source)),
          | r AS (SELECT d.*, pl.budget, pl.mass, pl.e,
          |   coalesce(sum(tokens) OVER (PARTITION BY d.source
          |     ORDER BY h, doc_id
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |     AS before FROM d JOIN pl USING (source))
          |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
          |  CAST(tokens AS BIGINT) AS tokens, CAST(epoch AS BIGINT) AS epoch
          |FROM f
          |UNION ALL
          |SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
          |  CAST(tokens AS BIGINT) AS tokens, CAST(e AS BIGINT) AS epoch
          |FROM r WHERE before < budget - e * mass""".stripMargin,

      "q_wds_export" ->
        """SELECT 'docs/' || lpad(CAST(doc_id AS VARCHAR), 5, '0') AS sample_key,
          | 'txt' AS ext, CAST(octet_length(encode(text)) AS BIGINT) AS size,
          | text
          |FROM documents WHERE doc_id < 200""".stripMargin,

      "q_lang_id" ->
        s"""WITH p AS (SELECT doc_id, lang,
           |  CASE WHEN greatest($en, $de, $fr, $es) = 0 THEN 'und'
           |       WHEN $en = greatest($en, $de, $fr, $es) THEN 'en'
           |       WHEN $de = greatest($en, $de, $fr, $es) THEN 'de'
           |       WHEN $fr = greatest($en, $de, $fr, $es) THEN 'fr'
           |       ELSE 'es' END AS predicted
           | FROM documents)
           |SELECT lang, predicted, count(*) AS n FROM p GROUP BY 1, 2""".stripMargin,

      "q_text_quality" ->
        s"""SELECT doc_id,
           | CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS token_count,
           | CAST((CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) +
           |   length(regexp_replace(text, '[^0-9.,;:!?]', '', 'g')) AS BIGINT)
           |   AS subword_count,
           | round(CASE WHEN length(text) = 0 THEN 0.0
           |   ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
           |        / length(text) END, 4) AS punct_ratio,
           | round(CASE WHEN length(text) = 0 THEN 0.0
           |   ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
           |        / length(text) END, 4) AS upper_ratio,
           | round(CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) = 0 THEN 0.0
           |   ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
           |        / (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) END, 4) AS mean_word_len,
           | round((
           |   (CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END) +
           |   (CASE WHEN $all > 0 THEN 1.0 ELSE 0.0 END) +
           |   (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END) < 0.3 THEN 1.0 ELSE 0.0 END) +
           |   (CASE WHEN (CASE WHEN length(text) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text) END) < 0.3 THEN 1.0 ELSE 0.0 END) +
           |   (CASE WHEN (CASE WHEN (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) = 0 THEN 0.0
           |      ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
           |           / (CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END) END) BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
           | ) / 5.0, 2) AS quality
           |FROM documents""".stripMargin,

      "q_quality_classifier" ->
        s"""SELECT doc_id, quality_prob, quality_prob >= 0.5 AS keep FROM (
           |SELECT doc_id, $qualityProb AS quality_prob FROM documents)""".stripMargin,

      "q_fingerprint" ->
        s"SELECT doc_id, md5($norm) AS fp_md5 FROM documents",

      "q_bpe" ->
        s"""WITH
           |${bpeTrainCtes(8)},
           | docs AS (SELECT doc_id,
           |    list_filter(string_split_regex(text, '\\s+'),
           |      x -> x != '') AS ws
           |   FROM documents),
           | wpos AS (SELECT d.doc_id, t.widx, d.ws[t.widx] AS word
           |   FROM docs d, unnest(range(1, len(d.ws) + 1)) AS t(widx))
           |SELECT w.doc_id, w.widx, u.tidx, f.syms[u.tidx] AS token
           |FROM wpos w JOIN f8 f USING (word),
           |  unnest(range(1, len(f.syms) + 1)) AS u(tidx)""".stripMargin,

      "q_winnow" ->
        s"""WITH corpus AS (SELECT doc_id, text FROM documents),
           |$winnowSelCtes
           |SELECT DISTINCT doc_id, pos, fp FROM sel""".stripMargin,

      "q_winnow_dedup" ->
        s"""WITH $winnowCopyCorpus,
           |$winnowSelCtes,
           |$winnowPairCtes
           |SELECT id_a, id_b, n_shared, n_union FROM pairs
           |WHERE CAST(n_shared AS DOUBLE) / n_union >= 0.65""".stripMargin,

      "q_winnow_spans" ->
        s"""WITH $winnowCopyCorpus,
           |$winnowSelCtes,
           |$winnowPairCtes,
           | kp AS (SELECT id_a, id_b FROM pairs
           |  WHERE CAST(n_shared AS DOUBLE) / n_union >= 0.65),
           | spos AS (SELECT DISTINCT doc_id, pos, fp FROM sel)
           |SELECT k.id_a, k.id_b, sa.pos AS pos_a, sb.pos AS pos_b, sa.fp
           |FROM kp k
           |JOIN spos sa ON sa.doc_id = k.id_a
           |JOIN spos sb ON sb.doc_id = k.id_b AND sb.fp = sa.fp""".stripMargin,

      // the spans oracle + the run coalescer replayed in SQL: lockstep
      // alignment (delta = pos_b - pos_a), gap bound w+k-1 = 20, run
      // id by prefix sum of gap breaks, one aggregate per run
      "q_winnow_runs" ->
        s"""WITH $winnowCopyCorpus,
           |$winnowSelCtes,
           |$winnowPairCtes,
           | kp AS (SELECT id_a, id_b FROM pairs
           |  WHERE CAST(n_shared AS DOUBLE) / n_union >= 0.65),
           | spos AS (SELECT DISTINCT doc_id, pos, fp FROM sel),
           | sp AS (SELECT k.id_a, k.id_b, sa.pos AS pos_a, sb.pos AS pos_b
           |  FROM kp k
           |  JOIN spos sa ON sa.doc_id = k.id_a
           |  JOIN spos sb ON sb.doc_id = k.id_b AND sb.fp = sa.fp),
           | marked AS (SELECT id_a, id_b, pos_a, pos_b,
           |    pos_b - pos_a AS delta,
           |    CASE WHEN pos_a - lag(pos_a) OVER
           |      (PARTITION BY id_a, id_b, pos_b - pos_a
           |       ORDER BY pos_a) > 20 THEN 1 ELSE 0 END AS brk
           |  FROM sp),
           | runs AS (SELECT *, sum(brk) OVER
           |    (PARTITION BY id_a, id_b, delta ORDER BY pos_a
           |     ROWS UNBOUNDED PRECEDING) AS run
           |  FROM marked)
           |SELECT id_a, id_b, min(pos_a) AS start_a, min(pos_b) AS start_b,
           |  max(pos_a) + 9 - min(pos_a) AS length
           |FROM runs GROUP BY id_a, id_b, delta, run""".stripMargin,

      "q_merge_stem" ->
        """WITH l AS (SELECT doc_id, 'docs/doc_' || doc_id || '.txt' AS path, n_chars
          |  FROM documents),
          | r AS (SELECT 'doc_' || doc_id AS stem_key, lang FROM documents)
          |SELECT l.doc_id, l.n_chars, r.lang
          |FROM l JOIN r ON r.stem_key = 'doc_' || l.doc_id""".stripMargin,

      "q_window_frames" ->
        """SELECT event_id, user_id,
          | round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
          |   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS moving_sum3,
          | round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
          |   (PARTITION BY user_id ORDER BY event_id ASC
          |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS range_sum
          |FROM events WHERE user_id < 100""".stripMargin,

      "q_sessionize" ->
        """WITH x AS (SELECT event_id, user_id, ts,
          |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
          | FROM events WHERE user_id < 100)
          |SELECT event_id, user_id,
          | CAST(sum(CASE WHEN prev_ts IS NULL THEN 1
          |               WHEN date_diff('microsecond', prev_ts, ts)
          |                 > 1800 * 1000000 THEN 1
          |               ELSE 0 END) OVER
          |   (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          |FROM x""".stripMargin,

      "q_kfold" ->
        """SELECT o_orderkey,
          | CAST(CAST('0x' || substr(md5(o_orderkey || ':cv'), 1, 13)
          |   AS BIGINT) % 5 AS BIGINT) AS fold
          |FROM orders""".stripMargin,

      "q_weighted_sample_group" ->
        """WITH k AS (SELECT source, doc_id,
          |   round(pow(CAST(CAST('0x' || substr(md5(doc_id || ':wsg'), 1, 13)
          |       AS BIGINT) AS DOUBLE) / 4503599627370496.0,
          |     1.0 / CAST(n_chars AS DOUBLE)), 12) AS wkey
          |  FROM documents WHERE n_chars > 0),
          | r AS (SELECT source, doc_id, wkey, row_number() OVER (
          |     PARTITION BY source ORDER BY wkey DESC, doc_id ASC) AS rank
          |   FROM k)
          |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, wkey
          |FROM r WHERE rank <= 5""".stripMargin,

      "q_salted_join" ->
        """SELECT l_orderkey, l_linenumber, l_partkey, p_name, l_quantity
          |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

      "q_interval_join" ->
        """WITH a AS (SELECT event_id, user_id % 50 AS k,
          |   CAST((event_id*37) % 10000 AS DOUBLE) AS lo,
          |   CAST((event_id*37) % 10000 + 50 AS DOUBLE) AS hi
          |  FROM events WHERE event_id % 5 = 0),
          | b AS (SELECT event_id, user_id % 50 AS k,
          |   CAST((event_id*53) % 10000 AS DOUBLE) AS lo,
          |   CAST((event_id*53) % 10000 + 30 AS DOUBLE) AS hi
          |  FROM events WHERE event_id % 7 = 0)
          |SELECT a.event_id AS a_id, b.event_id AS b_id,
          | CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) AS BIGINT)
          |   AS overlap
          |FROM a JOIN b ON a.k = b.k AND a.lo < b.hi AND b.lo < a.hi""".stripMargin,

      "q_funnel" ->
        """WITH s1 AS (SELECT user_id, epoch_us(min(ts)) AS t1
          |   FROM events WHERE event_type = 'signup' GROUP BY 1),
          | s2 AS (SELECT e.user_id, epoch_us(min(ts)) AS t2
          |   FROM events e JOIN s1 ON e.user_id = s1.user_id
          |   WHERE event_type = 'view' AND epoch_us(ts) > t1 GROUP BY 1),
          | s3 AS (SELECT e.user_id, epoch_us(min(ts)) AS t3
          |   FROM events e JOIN s2 ON e.user_id = s2.user_id
          |   WHERE event_type = 'purchase' AND epoch_us(ts) > t2 GROUP BY 1)
          |SELECT s1.user_id, t1, t2, t3,
          | CAST(1 + (CASE WHEN t2 IS NULL THEN 0 ELSE 1 END)
          |        + (CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          |   AS step_reached
          |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
          | LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin,

      "q_rolling_dau" ->
        """WITH d AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
          |   FROM events),
          | days AS (SELECT day, row_number() OVER (ORDER BY day) AS rn
          |   FROM (SELECT DISTINCT day FROM d)),
          | r AS (SELECT d1.day, count(DISTINCT dd.user_id) AS exact_rolling
          |   FROM days d1 JOIN days d2 ON d2.rn BETWEEN d1.rn - 6 AND d1.rn
          |   JOIN d dd ON dd.day = d2.day GROUP BY 1),
          | a AS (SELECT day, count(DISTINCT user_id) AS exact_active
          |   FROM d GROUP BY 1)
          |SELECT strftime(a.day, '%Y-%m-%d') AS day, exact_active,
          | exact_rolling, TRUE AS daily_ok, TRUE AS rolling_ok
          |FROM a JOIN r ON a.day = r.day""".stripMargin,

      "q_retention" ->
        """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
          |   FROM events GROUP BY 1),
          | a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
          |   FROM events)
          |SELECT CAST(CAST(cohort AS DATE) AS VARCHAR) AS cohort_week,
          | CAST(floor(date_diff('day', CAST(cohort AS DATE),
          |   CAST(wk AS DATE)) / 7) AS BIGINT) AS week_offset,
          | count(DISTINCT a.user_id) AS active_users
          |FROM a JOIN f ON a.user_id = f.user_id
          |GROUP BY 1, 2""".stripMargin,

      "q_pipeline_clean" ->
        s"""WITH corpus AS (
           |  SELECT * FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
           |  FROM documents WHERE doc_id % 3 = 0),
           | f AS (SELECT doc_id, lang, text, md5($norm) AS fp FROM corpus),
           | keep AS (SELECT fp, min(doc_id) AS doc_id FROM f GROUP BY fp),
           | kept AS (SELECT f.* FROM f JOIN keep
           |   ON f.fp = keep.fp AND f.doc_id = keep.doc_id),
           | m AS (SELECT doc_id, lang,
           |   CAST($tokCount AS BIGINT) AS token_count,
           |   $qualityExpr AS quality
           |  FROM kept)
           |SELECT doc_id, lang, token_count, quality FROM m
           |WHERE quality >= 0.6 AND token_count BETWEEN 20 AND 100000""".stripMargin,

      "q_bbox_iou" ->
        """WITH b AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS d FROM part),
          | g AS (SELECT p_partkey,
          |  greatest(least(d + 10.0, d + 20.0) - greatest(d, d + 5.0), 0.0) AS ix,
          |  greatest(least(d + 10.0, d + 18.0) - greatest(d, d + 5.0), 0.0) AS iy,
          |  100.0 AS area_a, (15.0 * 13.0) AS area_b
          | FROM b)
          |SELECT p_partkey, round(area_a, 4) AS area_a,
          | round(CASE WHEN (area_a + area_b - ix * iy) <= 0 THEN 0.0
          |   ELSE ix * iy / (area_a + area_b - ix * iy) END, 6) AS iou,
          | FALSE AS contains_b
          |FROM g""".stripMargin,

      "q_polygon_area" ->
        """WITH p AS (SELECT p_partkey, CAST(p_size AS DOUBLE) AS s FROM part),
          | poly AS (SELECT p_partkey,
          |  [0, s, s+3, 1] AS xs, [0, 1, s, s+1] AS ys FROM p)
          |SELECT p_partkey, round(abs(
          |  (xs[1]*ys[2]-xs[2]*ys[1]) + (xs[2]*ys[3]-xs[3]*ys[2]) +
          |  (xs[3]*ys[4]-xs[4]*ys[3]) + (xs[4]*ys[1]-xs[1]*ys[4])) / 2, 4)
          |  AS area
          |FROM poly""".stripMargin,

      "q_file_du" ->
        """WITH files AS (SELECT
          |   source || '/sub' || (doc_id % 3) || '/doc' || doc_id || '.txt' AS path,
          |   n_chars AS size FROM documents),
          | x AS (SELECT path, size, string_split(path, '/') AS parts FROM files),
          | a AS (SELECT size, unnest(
          |   list_prepend('', list_transform(range(1, CAST(len(parts) AS BIGINT)),
          |     i -> array_to_string(parts[1:CAST(i AS INT)], '/')))) AS dir
          |  FROM x)
          |SELECT dir, CAST(sum(size) AS BIGINT) AS total_size,
          | count(*) AS n_files
          |FROM a GROUP BY dir""".stripMargin,

      "q_seq_pack" ->
        s"""WITH d AS (SELECT doc_id,
           |  CAST($tokCount AS BIGINT) AS tokens,
           |  doc_id % 4 AS shard
           | FROM documents WHERE doc_id < 400)
           |SELECT doc_id, tokens, shard,
           | CAST(floor(CAST(coalesce(sum(tokens) OVER (PARTITION BY shard
           |   ORDER BY doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING
           |   AND 1 PRECEDING), 0) AS DOUBLE) / 2000) AS BIGINT) AS pack_id
           |FROM d""".stripMargin,

      "q_dedup_keep_best" ->
        s"""WITH corpus AS (
           |  SELECT * FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
           |  FROM documents WHERE doc_id % 3 = 0),
           | f AS (SELECT doc_id, n_chars, md5($norm) AS fp,
           |   row_number() OVER (PARTITION BY md5($norm)
           |     ORDER BY n_chars DESC, doc_id DESC) AS rk
           |  FROM corpus)
           |SELECT fp, doc_id, n_chars FROM f WHERE rk = 1""".stripMargin,

      "q_contamination" ->
        s"""WITH train AS (SELECT md5($norm) AS fp FROM documents
           |   WHERE doc_id % 10 < 8),
           | test AS (SELECT doc_id, md5($norm) AS fp FROM documents
           |   WHERE doc_id % 10 >= 8
           |  UNION ALL
           |  SELECT doc_id + 200000 AS doc_id, md5($norm) AS fp
           |  FROM documents WHERE doc_id % 17 = 0)
           |SELECT doc_id, fp FROM test
           |WHERE EXISTS (SELECT 1 FROM train WHERE train.fp = test.fp)""".stripMargin,

      "q_fuzzy_match" ->
        """WITH p AS (SELECT p_partkey, p_type,
          |   string_split(p_type, ' ')[1] AS blk
          |  FROM part WHERE p_partkey < 300)
          |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
          | CAST(levenshtein(a.p_type, b.p_type) AS INTEGER) AS dist
          |FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
          |WHERE levenshtein(a.p_type, b.p_type) <= 8""".stripMargin,

      "q_text_clean" ->
        raw"""SELECT doc_id, trim(regexp_replace(regexp_replace(
           |  regexp_replace(
           |    '<html><body class="x">' || text ||
           |      ' see https://example.com/a?b=1 and www.test.org now</body>',
           |    '<[^>]*>', ' ', 'g'),
           |  '(https?://|www\.)[^\s]+', ' ', 'g'), '\s+', ' ', 'g')) AS clean
           |FROM documents WHERE doc_id < 200""".stripMargin,

      "q_repetition" ->
        raw"""WITH d AS (SELECT doc_id,
           |   text || chr(10) || 'repeat me' || chr(10) || 'repeat me' ||
           |     chr(10) || 'repeat me' AS text
           |  FROM documents WHERE doc_id < 300),
           | lines AS (SELECT doc_id,
           |   list_filter(string_split(text, chr(10)),
           |     l -> length(trim(l)) > 0) AS ls FROM d),
           | dup AS (SELECT doc_id, round(CASE WHEN len(ls) <= 0 THEN 0.0
           |   ELSE CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
           |   END, 6) AS dup_line_frac FROM lines),
           | toks AS (SELECT doc_id,
           |   unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
           |  FROM d),
           | tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
           | top AS (SELECT doc_id,
           |   round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_frac
           |  FROM tc GROUP BY doc_id)
           |SELECT dup.doc_id, dup.dup_line_frac, top.top_token_frac
           |FROM dup JOIN top ON dup.doc_id = top.doc_id""".stripMargin,

      "q_histogram" ->
        """SELECT CAST(least(floor(o_totalprice / 50000.0), 9.0) AS BIGINT)
          |   AS bucket,
          | count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders GROUP BY 1""".stripMargin,

      "q_provenance" ->
        """SELECT p_partkey,
          | regexp_extract(filename, '([^/]*)$', 1) AS src_file,
          | TRUE AS has_size
          |FROM read_parquet('{SF_DIR}/part.parquet', filename=true)
          |WHERE p_size < 10""".stripMargin,

      "q_file_find" ->
        raw"""SELECT source || '/sub' || (doc_id % 3) || '/doc' || doc_id || '.txt' AS path,
           | n_chars AS size
           |FROM documents
           |WHERE regexp_matches(
           |   source || '/sub' || (doc_id % 3) || '/doc' || doc_id || '.txt',
           |   '^[^/]*/sub1/[^/]*\.txt$$')
           | AND n_chars >= 500""".stripMargin,

      "q_delta_inc" ->
        """SELECT event_id, event_type,
          | round((CASE WHEN event_id % 7 = 0 THEN value + 1 ELSE value END) * 2, 6)
          |   AS value2
          |FROM events WHERE event_id < 20000""".stripMargin,

      "q_zorder_skip" ->
        """SELECT count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |   AS total,
          | coalesce(min(o_orderkey), 0) AS min_key
          |FROM orders
          |WHERE o_custkey <= (SELECT max(o_custkey) // 8 FROM orders)
          | AND o_totalprice <= (SELECT max(o_totalprice) / 8 FROM orders)""".stripMargin,

      "q_hilbert_skip" ->
        """SELECT count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |   AS total,
          | coalesce(min(o_orderkey), 0) AS min_key
          |FROM orders
          |WHERE o_custkey <= (SELECT max(o_custkey) // 8 FROM orders)
          | AND o_totalprice <= (SELECT max(o_totalprice) / 8 FROM orders)""".stripMargin,

      "q_stats_skipping" ->
        """SELECT o_orderstatus, count(*) AS n,
          | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders
          |WHERE o_orderkey <= (SELECT max(o_orderkey) // 8 FROM orders)
          |GROUP BY 1""".stripMargin,

      "q_optimize" ->
        "SELECT * FROM orders",

      "q_optimize_hilbert" ->
        "SELECT * FROM orders",

      "q_auto_compact" ->
        "SELECT * FROM orders",

      "q_vacuum" ->
        """SELECT * FROM orders
          |WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0""".stripMargin,

      "q_move_dataset" ->
        "SELECT * FROM nation",

      "q_cme_guard" ->
        "SELECT * FROM orders WHERE o_orderkey % 7 <> 0",

      "q_read_asof" ->
        "SELECT * FROM nation",

      "q_checkpoint_reuse" ->
        "SELECT r_regionkey, r_name FROM region WHERE r_regionkey < 4",

      "q_write_roundtrip" ->
        """SELECT doc_id, lang,
          |  text || ', "q"' || chr(10) || 'end' AS text
          |FROM documents""".stripMargin,

      "q_delete_where" ->
        """SELECT * FROM orders
          |WHERE NOT (o_orderkey <= (SELECT max(o_orderkey) // 16 FROM orders))""".stripMargin,

      "q_update_where" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus,
          | CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 16 FROM orders)
          |   THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
          | o_orderdate,
          | CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 16 FROM orders)
          |   THEN upper(o_orderpriority) ELSE o_orderpriority END AS o_orderpriority
          |FROM orders""".stripMargin,

      "q_stream_append" ->
        """SELECT event_id, user_id, event_type FROM events
          |WHERE event_id % 5 = 0""".stripMargin,

      "q_table_stream" ->
        "SELECT c_custkey, c_nationkey, c_acctbal FROM customer",

      "q_stream_upsert" ->
        """WITH mxv AS (SELECT max(o_orderkey) AS mx FROM orders)
          |SELECT o_orderkey, o_custkey, o_orderstatus,
          |  o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
          |FROM orders WHERE o_orderkey % 9 = 0
          |UNION ALL
          |SELECT * FROM orders WHERE o_orderkey % 9 NOT IN (0, 1)
          |UNION ALL
          |SELECT o_orderkey + (SELECT mx FROM mxv) + 1000000, o_custkey,
          |  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          |FROM orders WHERE o_orderkey % 9 = 2""".stripMargin,

      "q_optimize_where" ->
        "SELECT * FROM orders",

      "q_zorder_nd" ->
        "SELECT * FROM orders",

      "q_restore" ->
        "SELECT * FROM orders",

      "q_merge_evolve" ->
        """SELECT o_orderkey, o_custkey, o_orderstatus,
          | CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 16 FROM orders)
          |   THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
          | o_orderdate, o_orderpriority,
          | CASE WHEN o_orderkey <= (SELECT max(o_orderkey) // 16 FROM orders)
          |   THEN o_orderkey % 20 = 0 ELSE NULL END AS audit_flag
          |FROM orders""".stripMargin,

      "q_catalog_sql" ->
        """SELECT n_nationkey, n_name FROM nation
          |WHERE n_regionkey = 0 ORDER BY n_nationkey""".stripMargin,

      "q_cdf_sync" ->
        """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60)
          |SELECT doc_id, text, 'insert' AS _change_type,
          |  '1.0.0' AS _commit_version FROM base
          |UNION ALL
          |SELECT doc_id, text, 'delete', '1.1.0' FROM base
          |WHERE doc_id % 7 = 0
          |UNION ALL
          |SELECT doc_id, text, 'update_preimage', '1.2.0' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id, text || '!', 'update_postimage', '1.2.0' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id + 1000000, 'new' || doc_id, 'insert', '1.3.0'
          |FROM base WHERE doc_id % 11 = 0""".stripMargin,

      "q_cdf_stream" ->
        """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60)
          |SELECT doc_id, text, 'insert' AS _change_type,
          |  '1.0.0' AS _commit_version FROM base
          |UNION ALL
          |SELECT doc_id, text, 'delete', '1.1.0' FROM base
          |WHERE doc_id % 7 = 0
          |UNION ALL
          |SELECT doc_id, text, 'update_preimage', '1.2.0' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id, text || '!', 'update_postimage', '1.2.0' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id + 1000000, 'new' || doc_id, 'insert', '1.3.0'
          |FROM base WHERE doc_id % 11 = 0""".stripMargin,

      "q_matview_inc" ->
        """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
          |t1 AS (SELECT * FROM base WHERE doc_id % 7 <> 0),
          |t2 AS (SELECT doc_id, lang,
          |         CASE WHEN doc_id % 5 = 0 THEN n_chars + 1000
          |              ELSE n_chars END AS n_chars
          |       FROM t1),
          |t3 AS (SELECT * FROM t2 UNION ALL
          |       SELECT doc_id + 1000000, 'x_' || lang, n_chars
          |       FROM base WHERE doc_id % 11 = 0),
          |t4 AS (SELECT * FROM t3 WHERE lang <> 'en')
          |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars) AS BIGINT) AS chars,
          |  CAST(CAST(sum(CAST(n_chars AS DECIMAL(28,10))) AS DOUBLE)
          |       / count(n_chars) AS DOUBLE) AS avg_chars
          |FROM t4 GROUP BY lang""".stripMargin,

      "q_matview_partitioned" ->
        """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
          |t1 AS (SELECT * FROM base
          |       WHERE NOT (lang = 'en' AND n_chars % 3 = 0)),
          |t2 AS (SELECT * FROM t1 UNION ALL
          |       SELECT doc_id + 2000000, lang, n_chars + 7
          |       FROM base WHERE doc_id % 17 = 0)
          |SELECT lang, CAST(min(n_chars) AS BIGINT) AS lo,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(n_chars) AS BIGINT) AS chars
          |FROM t2 GROUP BY lang""".stripMargin,

      "q_matview_minmax" ->
        """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
          |t1 AS (SELECT * FROM base WHERE n_chars % 2 <> 0),
          |t2 AS (SELECT * FROM t1 UNION ALL
          |       SELECT doc_id + 1000000, lang, -doc_id
          |       FROM base WHERE doc_id % 13 = 0)
          |SELECT lang, CAST(min(n_chars) AS BIGINT) AS lo,
          |  CAST(max(n_chars) AS BIGINT) AS hi,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM t2 GROUP BY lang""".stripMargin,

      "q_matview_distinct" ->
        """WITH base AS (SELECT doc_id, lang, source FROM documents),
          |t AS (SELECT * FROM base UNION ALL
          |      SELECT doc_id + 1000000, lang, 'mirror-' || source
          |      FROM base WHERE doc_id % 9 = 0)
          |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          |  TRUE AS distinct_ok
          |FROM t GROUP BY lang""".stripMargin,

      "q_expectations" ->
        """SELECT * FROM orders
          |WHERE o_custkey % 7 <> 3 AND o_orderkey % 10 <> 0""".stripMargin,

      "q_change_feed" ->
        """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 60)
          |SELECT doc_id, text, 'delete' AS _change_type FROM base
          |WHERE doc_id % 7 = 0
          |UNION ALL
          |SELECT doc_id, text, 'update_preimage' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id, text || '!', 'update_postimage' FROM base
          |WHERE doc_id % 7 <> 0 AND doc_id % 5 = 0
          |UNION ALL
          |SELECT doc_id + 1000000, 'new' || doc_id, 'insert' FROM base
          |WHERE doc_id % 11 = 0""".stripMargin,

      "q_merge_into" ->
        """WITH mxv AS (SELECT max(o_orderkey) AS mx FROM orders),
          |s AS (
          |  SELECT o_orderkey, o_custkey, o_orderstatus,
          |    o_totalprice * 3 AS o_totalprice, o_orderdate, o_orderpriority
          |  FROM orders WHERE o_orderkey <= (SELECT mx // 16 FROM mxv)
          |  UNION ALL
          |  SELECT o_orderkey + (SELECT mx FROM mxv) + 1000000 AS o_orderkey,
          |    o_custkey, o_orderstatus, o_totalprice, o_orderdate,
          |    o_orderpriority
          |  FROM orders WHERE o_orderkey <= (SELECT mx // 32 FROM mxv)
          |)
          |SELECT * FROM orders
          |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM s)
          |UNION ALL
          |SELECT * FROM s""".stripMargin,

      "q_bloom_skipping" ->
        """SELECT event_id, user_id, event_type FROM events
          |WHERE 'k' || event_id = 'k7'""".stripMargin,

      "q_delta_storage" ->
        """SELECT 'doc' || doc_id || '.txt' AS path,
          | CAST(length(text) + CASE WHEN doc_id < 30 AND doc_id % 3 = 0
          |   THEN 1 ELSE 0 END AS BIGINT) AS n_chars,
          | CASE WHEN doc_id >= 30 OR doc_id % 3 = 0 THEN 2 ELSE 1 END AS run
          |FROM documents WHERE doc_id < 40""".stripMargin,

      "q_delta_retry" ->
        """SELECT event_id, event_type, round(value * 2, 6) AS value2,
          | '' AS err
          |FROM events WHERE event_id < 5000""".stripMargin,

      "q_int_hash" -> intHash64OracleStages,

      "q_merge_self" ->
        """SELECT a.c_custkey, a.c_name, b.c_name AS right_c_name
          |FROM customer a JOIN customer b ON a.c_custkey = b.c_custkey""".stripMargin,

      "q_empty_agg" ->
        """SELECT count(*) AS n,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
          | min(l_quantity) AS mn, max(l_quantity) AS mx,
          | avg(l_quantity) AS av,
          | count(DISTINCT l_returnflag) AS nd
          |FROM lineitem WHERE l_quantity < -1""".stripMargin,

      "q_grouping_sets" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

      "q_merge_right" ->
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, c.c_name
          |FROM orders o RIGHT JOIN customer c
          |ON o.o_custkey = c.c_custkey""".stripMargin,

      "q_cc_star" ->
        """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 1000),
          | e AS (SELECT x.doc_id AS a, y.doc_id AS b FROM d x JOIN d y
          |   ON y.doc_id = x.doc_id + 1 AND x.doc_id % 50 <> 49),
          | nd AS (SELECT a AS id FROM e UNION SELECT b FROM e)
          |SELECT id, id - id % 50 AS cluster_id FROM nd""".stripMargin,

      "q_dedup_clusters" ->
        s"""WITH RECURSIVE corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id < 60
           |  UNION ALL
           |  SELECT doc_id + 100000 AS doc_id, text || ' tail' AS text
           |  FROM documents WHERE doc_id < 60 AND doc_id % 4 = 0),
           | g AS (SELECT doc_id, list_distinct(list_transform(
           |    range(1, CAST(greatest(length($norm) - 2, 0) AS BIGINT) + 1),
           |    i -> substr($norm, CAST(i AS INT), 3))) AS grams FROM corpus),
           | e AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |   FROM g a JOIN g b ON a.doc_id < b.doc_id
           |   WHERE (CASE WHEN len(list_distinct(a.grams || b.grams)) = 0 THEN 0.0
           |     ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
           |          len(list_distinct(a.grams || b.grams)) END) >= 0.5),
           | sym AS (SELECT id_a AS a, id_b AS b FROM e
           |         UNION SELECT id_b, id_a FROM e),
           | reach AS (SELECT a AS id, a AS r FROM sym
           |   UNION
           |   SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id)
           |SELECT id, min(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,

      "q_doc_chunks" ->
        """WITH d AS (SELECT doc_id, text,
          |  greatest(CAST(ceil((length(text) - 100) / 400.0) AS BIGINT), 1) AS n
          | FROM documents WHERE doc_id < 200),
          | x AS (SELECT doc_id, text, unnest(range(0, n)) AS chunk_idx FROM d)
          |SELECT doc_id, chunk_idx,
          | substr(text, CAST(chunk_idx * 400 + 1 AS INT), 500) AS chunk
          |FROM x""".stripMargin,

      "q_tfidf" ->
        raw"""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
           | w0 AS (SELECT doc_id,
           |   unnest(string_split_regex(lower(text), '\s+')) AS word FROM d),
           | w AS (SELECT doc_id, word FROM w0
           |   WHERE regexp_matches(word, '^[a-z]{3,}$$')),
           | tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
           | df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
           | n AS (SELECT count(*) AS n_docs FROM d),
           | sc AS (SELECT tf.doc_id, tf.word,
           |   round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
           |  FROM tf JOIN df USING (word) CROSS JOIN n),
           | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
           |   ORDER BY tfidf DESC, word ASC) AS rk FROM sc)
           |SELECT doc_id, word, tfidf, CAST(rk AS BIGINT) AS rk
           |FROM r WHERE rk <= 3""".stripMargin,

      "q_stratified" ->
        """WITH r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
          | FROM documents)
          |SELECT doc_id, lang FROM r WHERE rk <= 20""".stripMargin,

      "q_sample_det" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY md5(CAST(o_orderkey AS VARCHAR)) ASC, o_orderkey ASC
          |LIMIT 100""".stripMargin,

      "q_pii_scrub" ->
        raw"""SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
           |  text || ' contact user' || doc_id ||
           |    '@example.com or +1-555-123-4567 ssn 123-45-6789',
           |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |  '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
           |  '(\+?[0-9]{1,3}[-. ])?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}',
           |  '<PHONE>', 'g') AS clean
           |FROM documents WHERE doc_id < 200""".stripMargin,

      "q_multimodal_frames" ->
        """WITH d AS (SELECT doc_id AS id, strlen(text) AS L
          |  FROM documents WHERE doc_id < 300),
          | f AS (SELECT id, i AS frame_idx, greatest(1, L // 4) AS flen, L
          |  FROM d CROSS JOIN range(0, 4) t(i))
          |SELECT id, frame_idx,
          | CAST(least(least(frame_idx * flen, L) + flen, L)
          |   - least(frame_idx * flen, L) AS BIGINT) AS frame_len
          |FROM f""".stripMargin,

      "q_window_lag" ->
        """SELECT event_id, user_id,
          | lag(event_type) OVER w AS prev_type,
          | lead(event_type) OVER w AS next_type,
          | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          | round(value - lag(value) OVER w, 6) AS delta_v
          |FROM events WHERE user_id < 50
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin
    )
  }
}
