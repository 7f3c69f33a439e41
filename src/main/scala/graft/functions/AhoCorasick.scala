package graft.functions

import scala.collection.mutable

/** Classic Aho–Corasick multi-pattern substring matcher (Aho & Corasick,
  * CACM 1975), specialized to the one question d48 asks of it: does this
  * text contain ANY of the patterns? Matching is over UTF-16 code units —
  * exactly `java.lang.String.contains` semantics, so the hit set is
  * bit-identical to the broadcast contains-probe and to a SQL
  * `position(needle in text) > 0` oracle.
  *
  * Shape rationale (the 100 TB story): with a benchmark-sized needle set
  * (thousands to low millions of chars) the scale-correct decontamination
  * plan is ONE pass over the corpus — O(total corpus chars), zero
  * shuffle — not a gram inverted index that explodes and shuffles a row
  * per corpus character. The automaton is built once on the driver and
  * broadcast; per-task cost is a pointer walk per character with
  * early-exit on the first hit.
  *
  * Storage is three primitive arrays (edges as a single sorted
  * `(node<<16 | char)` key array + parallel value array, binary-searched;
  * fail links; hit flags), so the broadcast payload is compact
  * (~17 bytes/pattern char) and deserialization is an array read. Nodes
  * are bounded by total pattern chars + 1, and the packed key keeps
  * node ids < 2^31 − safe while total pattern chars stay under
  * [[AhoCorasick.MaxPatternChars]] (enforced in [[AhoCorasick.build]]).
  *
  * An EMPTY pattern means `contains("")` — true for every text; `build`
  * surfaces it as `matchesAll` so callers short-circuit the scan (the
  * automaton would not see it: the root would carry the hit flag, which
  * the scan loop only consults after consuming a character).
  */
final class AhoCorasick private[functions] (
    edgeKeys: Array[Long], edgeVals: Array[Int],
    fail: Array[Int], hit: Array[Boolean]) extends Serializable {

  @inline private def lookup(node: Int, c: Char): Int = {
    val key = (node.toLong << 16) | c
    val i = java.util.Arrays.binarySearch(edgeKeys, key)
    if (i >= 0) edgeVals(i) else -1
  }

  /** True iff `text` contains at least one pattern as a substring. */
  def anyMatch(text: String): Boolean = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var st = s
      var nxt = lookup(st, c)
      while (nxt < 0 && st != 0) {
        st = fail(st)
        nxt = lookup(st, c)
      }
      s = if (nxt >= 0) nxt else 0
      if (hit(s)) return true
      i += 1
    }
    false
  }
}

object AhoCorasick {

  /** Bound on total pattern chars: keeps the packed edge key in 47 bits
    * and the broadcast payload ≤ ~0.5 GB (~17 B/char) — callers switch to
    * the gram inverted index beyond this (the truly-huge-needle-set
    * regime, where needles no longer fit executor memory anyway).
    */
  val MaxPatternChars: Long = 16L * 1024 * 1024

  /** Built automaton plus the degenerate-empty-pattern flag. */
  final case class Built(matcher: AhoCorasick, matchesAll: Boolean)

  def build(patterns: Iterable[String]): Built = {
    var matchesAll = false
    // trie with a growable global edge map; node 0 is the root
    val trans = new mutable.LongMap[Int]()
    val failB = new mutable.ArrayBuffer[Int](); failB += 0
    val hitB = new mutable.ArrayBuffer[Boolean](); hitB += false
    var chars = 0L
    for (p <- patterns) {
      if (p.isEmpty) matchesAll = true
      else {
        chars += p.length
        require(chars <= MaxPatternChars,
          s"pattern set exceeds $MaxPatternChars chars - use the gram-index path")
        var node = 0
        var i = 0
        while (i < p.length) {
          val key = (node.toLong << 16) | p.charAt(i)
          node = trans.getOrElse(key, {
            val nn = failB.length
            trans(key) = nn
            failB += 0; hitB += false
            nn
          })
          i += 1
        }
        hitB(node) = true
      }
    }
    val fail = failB.toArray
    val hit = hitB.toArray
    // freeze edges into sorted parallel arrays (scan uses binary search)
    val edgeKeys = new Array[Long](trans.size)
    val edgeVals = new Array[Int](trans.size)
    var j = 0
    trans.foreach { case (k, v) => edgeKeys(j) = k; edgeVals(j) = v; j += 1 }
    val order = Array.range(0, edgeKeys.length).sortBy(i => edgeKeys(i))
    val sk = order.map(i => edgeKeys(i))
    val sv = order.map(i => edgeVals(i))
    // BFS fail links over the frozen edges; hit flags propagate along
    // fail chains so the scan never walks them on the hot path
    @inline def look(node: Int, c: Char): Int = {
      val i = java.util.Arrays.binarySearch(sk, (node.toLong << 16) | c)
      if (i >= 0) sv(i) else -1
    }
    val queue = new java.util.ArrayDeque[Int]()
    // depth-1 children fail to root
    var e = 0
    while (e < sk.length) {
      if ((sk(e) >>> 16) == 0) { fail(sv(e)) = 0; queue.add(sv(e)) }
      e += 1
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      // children of u: edge keys share the (u << 16) prefix — locate the
      // slice by binary search on the prefix bounds
      var lo = java.util.Arrays.binarySearch(sk, u.toLong << 16)
      if (lo < 0) lo = -lo - 1
      var hi = java.util.Arrays.binarySearch(sk, (u.toLong + 1) << 16)
      if (hi < 0) hi = -hi - 1
      var i = lo
      while (i < hi) {
        val c = (sk(i) & 0xffffL).toChar
        val v = sv(i)
        var f = fail(u)
        var nxt = look(f, c)
        while (nxt < 0 && f != 0) { f = fail(f); nxt = look(f, c) }
        fail(v) = if (nxt >= 0 && nxt != v) nxt else 0
        if (hit(fail(v))) hit(v) = true
        queue.add(v)
        i += 1
      }
    }
    Built(new AhoCorasick(sk, sv, fail, hit), matchesAll)
  }
}
