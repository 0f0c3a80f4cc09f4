package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/**
 * Byte-pair encoding tokenizer (Sennrich, Haddow & Birch, ACL 2016 —
 * the subword algorithm behind GPT/LLaMA-family vocabularies): start
 * from characters, repeatedly merge the corpus-wide most frequent
 * adjacent symbol pair, and tokenize by replaying the learned merges.
 * This is the REAL token counter for token-budget work ([[Corpus]]'s
 * mixing/packing operate on counts; a trained BPE makes those counts
 * vocabulary-faithful instead of whitespace-approximate).
 *
 * Scale shape: the corpus-proportional work is ONE distributed
 * word-count groupBy; training then runs driver-side on the BOUNDED
 * word-frequency table (top `maxWords` by count — the standard
 * formulation trains on the word-frequency dict, not the raw corpus,
 * so the driver holds O(vocab) state, never O(corpus)). Encoding is a
 * pure codegen'd projection — one static call per row against the
 * broadcast-referenced model, with a per-JVM memo so repeated words
 * (Zipf says: almost all of them) encode once per executor.
 *
 * Determinism & oracle: pair selection breaks count ties by UTF-8
 * byte order of (a, b) — DuckDB's default VARCHAR collation — and
 * merges apply left-to-right non-overlapping. Both training and
 * encoding are therefore replayable in plain SQL: one merge step is a
 * pure list expression (greedy LTR via a run-parity trick for the
 * a==b case), so the driver's oracle unrolls K training stages and
 * re-derives every merge AND every token bit-for-bit.
 *
 * Encoding replays merges IN RANK ORDER (exactly how training applies
 * them). For tables this object trained, that is provably the same as
 * the min-rank-iterative formulation GPT-2 style encoders use —
 * scalacheck pins the equivalence on randomly trained corpora.
 */
object Bpe {

  /** UTF-8 byte-order comparison (DuckDB/Spark binary collation) —
    * the tie-break order for equal pair counts. */
  private def u8cmp(x: (String, String), y: (String, String)): Int = {
    val c = UTF8String.fromString(x._1)
      .binaryCompare(UTF8String.fromString(y._1))
    if (c != 0) c
    else UTF8String.fromString(x._2)
      .binaryCompare(UTF8String.fromString(y._2))
  }
  private def u8lt(x: (String, String), y: (String, String)): Boolean =
    u8cmp(x, y) < 0

  /** One merge pass: replace adjacent (a, b) with the fused symbol,
    * left-to-right non-overlapping ("aaa" + (a,a) → [aa, a]). */
  def mergeLtr(seq: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += seq(i); i += 1 }
    }
    out.result()
  }

  /**
   * Learn up to `numMerges` merges from a word-frequency table. Stops
   * early when no adjacent pair remains. Pure function of the
   * (word, count) multiset — input order never matters.
   *
   * INCREMENTAL: pair counts live in a hash map maintained as deltas, a
   * pair→words inverted index names the only words a merge can touch,
   * and the arg-max comes off a lazy-deletion max-heap (every count
   * CHANGE enqueues a fresh (count, pair) entry; a popped entry is
   * valid iff it matches the pair's current count). Per-merge cost is
   * O(touched words × length + changed pairs × log heap) — flat-ish in
   * the MERGE COUNT, where the naive recount walked every symbol of
   * every word per merge (intractable at a production 32k-merge
   * vocabulary: ~1e11 driver ops at the 1M-word cap). Merge selection
   * is bit-identical to [[trainNaive]]: same max-count pair, same
   * UTF-8 tie-break (the heap orders ties by reversed byte compare, so
   * the smallest pair surfaces first; scalacheck pins the equivalence
   * on random corpora).
   */
  def train(wordCounts: Seq[(String, Long)],
            numMerges: Int): Vector[(String, String)] = {
    // indexed word table: splitChars is injective, so distinct input
    // words stay distinct; sequences that become equal after a merge
    // need no collapsing — their counts contribute identically apart
    trainFrom(wordCounts.iterator
      .map { case (w, c) => (splitChars(w), c) }
      .filter(_._1.nonEmpty).toArray, numMerges)
  }

  /** The trainer's engine over PRE-SPLIT symbol sequences — the entry
    * [[extend]] needs (its sequences carry an earlier model's merges
    * already applied). */
  private def trainFrom(tab: Array[(Vector[String], Long)],
                        numMerges: Int): Vector[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = tab.map(_._1)
    val wcnt = tab.map(_._2)
    def pairsOf(s: Vector[String]): Iterator[(String, String)] =
      (0 until s.length - 1).iterator.map(i => (s(i), s(i + 1)))
    val pairCounts =
      scala.collection.mutable.HashMap.empty[(String, String), Long]
    // membership is add-only (stale members are re-validated against
    // the word's CURRENT symbols before any work) — total inserts are
    // bounded by pair occurrences processed, never rebuilt
    val pairWords =
      scala.collection.mutable.HashMap.empty[(String, String),
        scala.collection.mutable.BitSet]
    // max-heap: count first, UTF-8-SMALLEST pair wins ties (reversed
    // compare — PriorityQueue dequeues the ordering's maximum)
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
                    y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c else u8cmp((y._2, y._3), (x._2, x._3))
        }
      }
    val heap =
      scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](
        heapOrd)
    var wi = 0
    while (wi < words.length) {
      val c = wcnt(wi)
      pairsOf(words(wi)).foreach { p =>
        pairCounts.updateWith(p)(v => Some(v.getOrElse(0L) + c))
        pairWords.getOrElseUpdate(p,
          scala.collection.mutable.BitSet.empty) += wi
      }
      wi += 1
    }
    pairCounts.foreach { case (p, c) => heap.enqueue((c, p._1, p._2)) }
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      var best: (String, String) = null
      while (best == null && heap.nonEmpty) {
        val (c, a, b) = heap.dequeue()
        if (c > 0 && pairCounts.getOrElse((a, b), 0L) == c) best = (a, b)
      }
      if (best == null) done = true
      else {
        merges += best
        val changed =
          scala.collection.mutable.HashSet.empty[(String, String)]
        pairWords.getOrElse(best,
            scala.collection.mutable.BitSet.empty).foreach { w =>
          val s = words(w)
          // stale member (the pair vanished from this word under an
          // earlier merge): one linear re-validation, no rewrite
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            if (s(i) == best._1 && s(i + 1) == best._2) has = true
            i += 1
          }
          if (has) {
            val c = wcnt(w)
            val s2 = mergeLtr(s, best._1, best._2)
            pairsOf(s).foreach { p =>
              pairCounts.updateWith(p)(_.map(_ - c).filter(_ != 0L))
              changed += p
            }
            pairsOf(s2).foreach { p =>
              pairCounts.updateWith(p)(v => Some(v.getOrElse(0L) + c))
              pairWords.getOrElseUpdate(p,
                scala.collection.mutable.BitSet.empty) += w
              changed += p
            }
            words(w) = s2
          }
        }
        pairWords.remove(best)
        changed.foreach { p =>
          val c = pairCounts.getOrElse(p, 0L)
          if (c > 0) heap.enqueue((c, p._1, p._2))
        }
        k += 1
      }
    }
    merges.result()
  }

  /** CONTINUE training: learn `extraMerges` more merges on top of
    * `model`'s, from a word-count table in the model's symbol domain
    * (byte-mapped for a byte-level model — [[extendBytesOn]] handles
    * that). Greedy BPE is strictly sequential, so extending k1 merges
    * by k2 over the SAME counts is bit-identical to training k1+k2
    * from scratch (scalacheck pins it) — the vocabulary-EXPANSION
    * verb: grow a persisted tokenizer's vocab without invalidating
    * ids already assigned — old merges keep their ranks, and when the
    * model reserves specials their ids are PINNED at the
    * pre-extension positions (`specialBase`), the new merges' ids
    * landing after them — so token streams encoded under the old
    * model stay decodable under the extended one, specials included. */
  def extend(model: Model, wordCounts: Seq[(String, Long)],
             extraMerges: Int): Model = {
    val tab = wordCounts.iterator
      .map { case (w, c) =>
        var s = splitChars(w)
        var i = 0
        while (i < model.merges.length && s.length > 1) {
          s = mergeLtr(s, model.merges(i)._1, model.merges(i)._2)
          i += 1
        }
        (s, c)
      }
      .filter(_._1.nonEmpty).toArray
    // pin the specials' reserved ids at their pre-extension positions
    // (first extension wins; later ones keep the existing pin) — without
    // this, token streams already encoded with a special id would decode
    // as whichever NEW merge landed on that id
    val pinned =
      if (model.specials.nonEmpty && model.specialBase < 0)
        256 + model.merges.size
      else model.specialBase
    model.copy(merges = model.merges ++ trainFrom(tab, extraMerges),
      specialBase = pinned)
  }

  /** [[extend]] over a DataFrame corpus for a byte-level model: one
    * distributed pre-token count (the same job [[trainBytesOn]] runs),
    * byte-mapped, then the driver-side continuation. */
  def extendBytesOn(df: DataFrame, textCol: String, model: Model,
                    extraMerges: Int, maxWords: Int = 1 << 20): Model = {
    require(model.byteLevel, "extendBytesOn needs a byte-level model")
    val wc = preTokenCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (toByteChars(r.getString(0)), r.getLong(1))).toSeq
    extend(model, wc, extraMerges)
  }

  /** The textbook full-recount trainer — kept as the equivalence
    * reference for the incremental [[train]] (scalacheck pins
    * bit-identical merge lists on random corpora). */
  private[graft] def trainNaive(wordCounts: Seq[(String, Long)],
                              numMerges: Int): Vector[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var seqs: Map[Vector[String], Long] = wordCounts
      .groupMapReduce(w => splitChars(w._1))(_._2)(_ + _)
      .filter(_._1.nonEmpty)
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((s, c) <- seqs; i <- 0 until s.length - 1)
        counts.updateWith((s(i), s(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        val best = counts.foldLeft(Option.empty[((String, String), Long)]) {
          case (acc, kv) => acc match {
            case Some(b) if b._2 > kv._2 || (b._2 == kv._2 && u8lt(b._1, kv._1)) => acc
            case _ => Some(kv)
          }
        }.get._1
        merges += best
        seqs = seqs.groupMapReduce { case (s, _) =>
          mergeLtr(s, best._1, best._2) }(_._2)(_ + _)
        k += 1
      }
    }
    merges.result()
  }

  /** Precompiled whitespace splitter — tokenizeRow runs per row inside
    * whole-stage codegen, so the Pattern must not recompile per call. */
  private[ops] val Ws: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("\\s+")

  /** Split a word into codepoint symbols (astral-safe). */
  def splitChars(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  // ---- byte-level mode (the GPT-2/LLaMA alphabet) ----

  /** GPT-2's byte→unicode bijection (Radford et al. 2019, encoder.py's
    * bytes_to_unicode — a public algorithm): printable bytes keep
    * their codepoint, the other 68 map to 256+n in byte order. Every
    * byte becomes one visible BMP char, so any UTF-8 string becomes a
    * char sequence with a CLOSED 256-symbol alphabet — no unknown
    * tokens, and token ids are well-defined (0-255 alphabet, 256+rank
    * per merge). The mapping is pure arithmetic, which is what lets
    * the DuckDB oracle rebuild the identical table from range(256). */
  private[graft] val byteToChar: Array[String] = {
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      val printable = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
        (b >= 174 && b <= 255)
      if (printable) out(b) = String.valueOf(b.toChar)
      else { out(b) = String.valueOf((256 + n).toChar); n += 1 }
      b += 1
    }
    out
  }

  /** A word's UTF-8 bytes as their mapped chars — one char per byte.
    * Injective, so byte-level training reuses the codepoint kernels
    * verbatim on the mapped string. */
  def toByteChars(w: String): String = {
    val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(byteToChar(bs(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** GPT-2-STYLE pre-tokenization, RE2-compatible variant: the
    * original pattern's `\s+(?!\S)` lookahead arm is dropped (RE2 —
    * DuckDB's regex engine — has no lookahead), so interior
    * whitespace runs tokenize as one greedy token instead of leaving
    * the last space to the following word. Both engines run this
    * IDENTICAL pattern — that, not GPT-2 exactness, is what makes the
    * gate replayable; counts are interchangeable with a released
    * tokenizer's in structure (contractions, space-prefixed words,
    * number runs, punctuation runs), documented as a variant. */
  val Gpt2ishPatternStr: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  private[ops] val Gpt2ish: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(Gpt2ishPatternStr)

  /** The pre-tokens of `text` in order (spaces ride as prefixes of the
    * following word, the byte-level convention). */
  def preTokenize(text: String): Array[String] = {
    val m = Gpt2ish.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** Token-id vocabulary of a byte-level model: ids 0-255 are the byte
    * alphabet in byte order, merge rank k's fused symbol gets 256+k
    * (first rank wins if two merge paths fuse the same string), and
    * `specials` append after the merges (after the PRE-EXTENSION
    * merges, at the pinned `specialBase`, for an extended model) — the
    * GPT-2-style id space that makes token BUDGETS interchangeable
    * across runs. Requires byte-level (the alphabet must be closed for
    * ids to be total). */
  def tokenIds(model: Model, specials: Seq[String] = Nil): Map[String, Int] = {
    require(model.byteLevel, "token ids need the closed byte alphabet")
    // explicit arg wins; a model carrying its own reserved specials
    // (the save/load round-trip) needs no repetition at every call
    val sp = if (specials.nonEmpty) specials else model.specials
    // an EXTENDED model shifted every post-extension merge id by the
    // specials-list SIZE pinned at extension — a different size here
    // would silently renumber those ids between calls
    if (model.specialBase >= 0)
      require(sp.size == model.specials.size,
        s"extended model pinned ${model.specials.size} specials at " +
          s"specialBase=${model.specialBase}; got ${sp.size} — post-" +
          "extension merge ids would silently renumber")
    // an EXTENDED model pins `specialBase` at its pre-extension value so
    // ids already handed out stay valid: specials keep their reserved
    // slots and the new merges' fused symbols shift PAST them — the
    // layout is bytes | old merges | specials | new merges
    val base =
      if (model.specialBase >= 0) model.specialBase
      else 256 + model.merges.size
    val spec = sp.zipWithIndex.map { case (s, j) => s -> (base + j) }
    val merged = model.merges.zipWithIndex.map { case ((a, b), r) =>
      val id = 256 + r
      (a + b) -> (if (id >= base) id + sp.size else id) }
    // toMap keeps the LAST entry per key: merges reversed so the lowest
    // rank survives a fused-string collision, and SPECIALS LAST so a
    // corpus that literally contains a marker string (documents joined
    // with <|endoftext|> — the normal situation) cannot have a learned
    // merge steal the special's reserved id
    (byteToChar.zipWithIndex.map { case (s, i) => s -> i } ++
      merged.reverse ++ spec).toMap
  }

  /** Split `text` into (segment, isSpecial) runs: every literal
    * occurrence of a special token becomes its own segment (GPT-2 /
    * HF `split` pre-tokenizer semantics — a document that contains
    * `<|endoftext|>` must encode it as the RESERVED id, never as
    * ordinary bytes). Longest special wins at a shared prefix;
    * non-special runs pass through for normal pre-tokenization. */
  private[graft] def splitOnSpecials(text: String, specials: Seq[String])
      : Vector[(String, Boolean)] = {
    // an empty special (a blank config entry) matches nowhere and would
    // crash the first-char prefilter — drop it rather than fail the
    // tokenize job on the executors
    val byLen = specials.filter(_.nonEmpty).distinct.sortBy(-_.length)
    if (byLen.isEmpty) return Vector((text, false))
    val heads = byLen.map(_.head).toSet
    val out = Vector.newBuilder[(String, Boolean)]
    var i = 0
    var start = 0
    while (i < text.length) {
      if (heads.contains(text.charAt(i))) {
        byLen.find(sp => text.startsWith(sp, i)) match {
          case Some(sp) =>
            if (i > start) out += ((text.substring(start, i), false))
            out += ((sp, true))
            i += sp.length
            start = i
          case None => i += 1
        }
      } else i += 1
    }
    if (start < text.length) out += ((text.substring(start), false))
    out.result()
  }

  /** A trained merge list with an in-rank-order replay encoder and a
    * per-JVM word memo (serializable; rides expressions via
    * addReferenceObj). `byteLevel`: words map to their GPT-2 byte
    * chars before the replay (train the merges on mapped words —
    * [[trainBytesOn]] does). `preTok`: [[tokenizeRow]] splits with the
    * GPT-2-style regex instead of plain whitespace (spaces ride as
    * word prefixes, so token counts include them). `specials`:
    * reserved marker strings [[tokenizeRow]] splits ON before any
    * pre-tokenization — each literal occurrence surfaces as its own
    * single-token word whose id [[tokenIds]] reserves after the
    * merges (GPT-2 semantics; empty = no splitting, markers encode
    * as ordinary bytes). */
  case class Model(merges: Vector[(String, String)],
                   byteLevel: Boolean = false,
                   preTok: Boolean = false,
                   specials: Vector[String] = Vector.empty,
                   specialBase: Int = -1) {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()

    /** Tokens of one word: replay every merge in rank order. */
    def encode(word: String): Vector[String] = {
      val hit = memo.get(word)
      if (hit != null) return hit
      var s = splitChars(if (byteLevel) toByteChars(word) else word)
      var i = 0
      while (i < merges.length && s.length > 1) {
        s = mergeLtr(s, merges(i)._1, merges(i)._2)
        i += 1
      }
      // bound the memo: Zipf heads fit easily; a pathological unique-
      // word stream must not grow executor memory without limit
      if (memo.size < (1 << 20)) memo.put(word, s)
      s
    }

    /** The codegen entry point: split `text` into words (whitespace,
      * empties dropped — or the GPT-2-style regex when `preTok`),
      * encode each word, pack as
      * array<struct<widx:int, tidx:int, token:string>> with 1-based
      * word/token positions (the SQL unnest convention). */
    def tokenizeRow(text: UTF8String): ArrayData = {
      val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
      var w = 0 // global 1-based word position across segments
      Bpe.splitOnSpecials(text.toString, specials).foreach {
        case (seg, true) =>
          // a special is its own word AND its own single token — never
          // byte-mapped, never merged
          w += 1
          rows += InternalRow(w, 1, UTF8String.fromString(seg))
        case (seg, false) =>
          val words =
            if (preTok) Bpe.preTokenize(seg)
            else Bpe.Ws.split(seg).filter(_.nonEmpty)
          var wi = 0
          while (wi < words.length) {
            val toks = encode(words(wi))
            w += 1
            var ti = 0
            while (ti < toks.length) {
              rows += InternalRow(w, ti + 1,
                UTF8String.fromString(toks(ti)))
              ti += 1
            }
            wi += 1
          }
      }
      new GenericArrayData(rows.toArray)
    }
  }

  /** Distributed (word, count) table for `textCol` — the one
    * corpus-proportional job training needs. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Train on `df`'s `textCol`: one distributed word count, then the
    * driver loop over the top-`maxWords` frequency table (ties at the
    * cut kept deterministically by word). `maxWords` bounds driver
    * memory at any corpus size — the standard vocabulary cap. */
  def trainOn(df: DataFrame, textCol: String, numMerges: Int,
              maxWords: Int = 1 << 20): Model = {
    val wc = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Model(train(wc, numMerges))
  }

  /** Distributed pre-token counts under the GPT-2-style regex — the
    * byte-level trainer's one corpus job. */
  def preTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(regexp_extract_all(col(textCol),
        lit(Gpt2ishPatternStr), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Byte-level GPT-2-style training: regex pre-tokens counted
    * corpus-wide, mapped to their byte chars, merges learned over the
    * closed 256-symbol alphabet. The returned model byte-maps and
    * regex-splits at encode time ([[Model.byteLevel]]/[[Model.preTok]]). */
  def trainBytesOn(df: DataFrame, textCol: String, numMerges: Int,
                   maxWords: Int = 1 << 20): Model = {
    val wc = preTokenCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect().map(r => (toByteChars(r.getString(0)), r.getLong(1))).toSeq
    Model(train(wc, numMerges), byteLevel = true, preTok = true)
  }

  /** `array<struct<widx, tidx, token>>` column of BPE tokens. */
  def tokensCol(text: Column, model: Model): Column =
    org.apache.spark.sql.graft.bridge.column(
      org.apache.spark.sql.graft.BpeTokenizeExpr(
        org.apache.spark.sql.graft.bridge.expression(text), model))

  /** Exploded token table `(id, widx, tidx, token)` — one codegen'd
    * projection + one Generate, no shuffle. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               model: Model): DataFrame =
    df.select(col(idCol), explode(tokensCol(col(textCol), model)).as("t"))
      .select(col(idCol), col("t.widx").as("widx"),
        col("t.tidx").as("tidx"), col("t.token").as("token"))

  // ---- detokenize: the inverse, tokens → original text ----

  /** Reassemble original text from a [[tokenize]] table of a BYTE-LEVEL
    * model — entirely codegen built-ins, no UDF: tokens concat in
    * (widx, tidx) order, one `translate` inverts the GPT-2 byte map
    * (each mapped char → the Latin-1 char of its original byte), then
    * `encode(…, 'ISO-8859-1')` yields the raw bytes and a UTF-8 decode
    * restores the text. `specials` ride UNMAPPED through tokenize, so
    * each is pre-mapped into the byte-char domain (a literal
    * [[toByteChars]] per special — driver-side constants) before the
    * shared inversion; any special round-trips exactly, not just
    * printable-ASCII ones. The round-trip
    * `detokenize(tokenize(text)) == text` is exact because the
    * pre-tokenizer is lossless (every char class has an alternative)
    * and BPE merges only ever CONCATENATE symbols — exact per
    * TOKENIZED document: a document whose text produced ZERO tokens
    * (empty string; whitespace-only under whitespace mode) has no
    * rows here and so no output row — callers that must restore such
    * documents left-join from the source ids with `coalesce('')`. */
  def detokenize(tokens: DataFrame, idCol: String,
                 specials: Seq[String] = Nil): DataFrame = {
    val mapped = byteToChar.mkString
    val latin1 = (0 until 256).map(_.toChar).mkString
    def toMapped(tok: Column): Column =
      specials.filter(_.nonEmpty).distinct.foldLeft(tok) { (acc, sp) =>
        when(tok === lit(sp), lit(toByteChars(sp))).otherwise(acc)
      }
    tokens.groupBy(col(idCol))
      .agg(decode(encode(translate(
          concat_ws("", transform(
            array_sort(collect_list(struct(col("widx"), col("tidx"),
              col("token")))),
            x => toMapped(x.getField("token")))),
          mapped, latin1), "ISO-8859-1"), "UTF-8").as("text"))
  }

  // ---- persisted tokenizer artifact ----
  // A trained model is worthless if every job retrains it: token
  // budgets (mixing recipes, context-window packing) are reproducible
  // across sessions only when the merges/vocab are PINNED — the GPT-2
  // merges.txt / HF tokenizer.json role, played by a catalog dataset so
  // versioning, lineage deps, and vacuum protection all apply
  // (the Similarity.saveIndex idiom).

  /** Persist `model` (+ its reserved specials) as catalog dataset
    * `name`: one row per merge (kind='merge', rank, a, b) and one per
    * special (kind='special', rank=position, a=text); alphabet/pre-tok
    * mode ride the version attrs. Returns the committed version —
    * datasets whose budgets used this tokenizer should record
    * `deps = Seq(s"$name@v$v")` so vacuum can never orphan them. */
  def save(catalog: graft.catalog.Catalog, name: String,
           model: Model): graft.catalog.SemVer = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val rows =
      model.merges.zipWithIndex.map { case ((a, b), r) =>
        ("merge", r, a, b)
      } ++ model.specials.zipWithIndex.map { case (s, j) =>
        ("special", j, s, "")
      }
    val df = rows.toDF("kind", "rank", "a", "b")
      .repartition(1).sortWithinPartitions("kind", "rank")
    catalog.save(graft.core.Chain(df), name,
      attrs = Seq(s"bpe:byteLevel=${model.byteLevel}",
        s"bpe:preTok=${model.preTok}") ++
        (if (model.specialBase >= 0)
          Seq(s"bpe:specialBase=${model.specialBase}") else Nil),
      harvestStats = false)
  }

  /** Load a persisted model (latest version when not given). The
    * round-trip is exact: merges in rank order, specials in reserved-id
    * order, mode flags from the version attrs — `tokenize`/`tokenIds`
    * with a loaded model reproduce the trained one bit-for-bit. */
  def load(catalog: graft.catalog.Catalog, name: String,
           version: Option[graft.catalog.SemVer] = None): Model = {
    val v = version.orElse(catalog.versions(name).lastOption).getOrElse(
      throw new NoSuchElementException(s"bpe model '$name' not found"))
    val attrs = catalog.annotationsOf(name, v)._2
    def flag(p: String): Boolean = attrs.exists(_ == s"$p=true")
    require(attrs.exists(_.startsWith("bpe:byteLevel=")),
      s"'$name'@v$v is not a persisted bpe model (no bpe: attrs)")
    val rows = graft.core.Sys.drop(catalog.readDataset(name, Some(v)).toDF)
      .select(col("kind"), col("rank"), col("a"), col("b"))
      .collect()
    val merges = rows.filter(_.getString(0) == "merge")
      .sortBy(_.getInt(1)).map(r => (r.getString(2), r.getString(3)))
    val specials = rows.filter(_.getString(0) == "special")
      .sortBy(_.getInt(1)).map(_.getString(2))
    val base = attrs.collectFirst {
      case a if a.startsWith("bpe:specialBase=") =>
        a.stripPrefix("bpe:specialBase=").toInt
    }.getOrElse(-1)
    Model(merges.toVector, byteLevel = flag("bpe:byteLevel"),
      preTok = flag("bpe:preTok"), specials = specials.toVector,
      specialBase = base)
  }
}
