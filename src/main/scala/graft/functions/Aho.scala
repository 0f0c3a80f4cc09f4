package graft.functions

/**
 * Aho–Corasick multi-pattern string automaton: one pass over the text
 * counts occurrences of EVERY pattern simultaneously (overlapping matches
 * included), instead of one scan per pattern. This is the blocklist
 * primitive a C4-style bad-word filter needs at 100 TB — pattern lists run
 * to thousands of entries, and P regex/contains passes over a corpus is P
 * scans too many.
 *
 * Built once on the driver, serialized into the expression, rebuilt lazily
 * per executor. Matching is case-sensitive on char values (lowercase the
 * column and the patterns together for case-insensitive use).
 */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  // trie over chars; fail links per Aho–Corasick; endCount[n] = number of
  // patterns ending exactly at node n; suffixCount[n] = patterns ending at
  // n or any fail-link ancestor (precomputed so matching never walks links)
  @transient private lazy val (next, fail, suffixCount) = build()

  private def build(): (Array[java.util.HashMap[Character, Integer]],
                        Array[Int], Array[Int]) = {
    val nextB = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val endB = scala.collection.mutable.ArrayBuffer(0)
    for (p <- patterns) {
      var node = 0
      for (c <- p) {
        val m = nextB(node)
        val t = m.get(c)
        node = if (t != null) t.intValue()
        else {
          nextB += new java.util.HashMap[Character, Integer]()
          endB += 0
          m.put(c, nextB.size - 1)
          nextB.size - 1
        }
      }
      endB(node) += 1
    }
    val n = nextB.size
    val failA = new Array[Int](n)
    val sufA = endB.toArray
    val queue = new java.util.ArrayDeque[Int]()
    nextB(0).forEach((_, v) => queue.add(v.intValue()))
    while (!queue.isEmpty) {
      val u = queue.poll()
      sufA(u) += sufA(failA(u))
      nextB(u).forEach { (c, v) =>
        // fail link of child: follow u's fail chain until a node with a
        // c-transition (or root)
        var f = failA(u)
        while (f != 0 && !nextB(f).containsKey(c)) f = failA(f)
        val t = nextB(f).get(c)
        failA(v.intValue()) =
          if (t != null && t.intValue() != v.intValue()) t.intValue() else 0
        queue.add(v.intValue())
      }
    }
    (nextB.toArray, failA, sufA)
  }

  /** Total occurrences of all patterns in `s`, overlapping included. */
  def countAll(s: String): Int = {
    var node = 0
    var hits = 0
    var i = 0
    while (i < s.length) {
      val c = Character.valueOf(s.charAt(i))
      var t = next(node).get(c)
      while (t == null && node != 0) {
        node = fail(node)
        t = next(node).get(c)
      }
      node = if (t != null) t.intValue() else 0
      hits += suffixCount(node)
      i += 1
    }
    hits
  }
}
