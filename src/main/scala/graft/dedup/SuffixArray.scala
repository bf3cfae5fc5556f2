package graft.dedup

/** Suffix array (prefix-doubling + Kasai LCP) — the in-memory kernel behind
  * the per-partition suffix-array long-repeat pass (engine analogue of the
  * reference's Merkle-subtree maximal-duplicate regions,
  * /root/reference/src/tree_approach.cpp:413-477, re-expressed for
  * variable-length text). Public textbook algorithms.
  *
  * Doubling rounds sort PACKED primitive longs (rank₁ 20b | rank₂ 20b |
  * index 20b — sign-safe 60 bits) — no comparator, no boxing: ~40× faster than an Ordering-based
  * sort and the difference between a usable and unusable per-partition pass.
  * Supports n < 2²⁰ per partition (a partition holding more than 2 MB of
  * concatenated text should be split anyway).
  */
object SuffixArray {

  final val MAX_N: Int = (1 << 20) - 1

  /** Suffix array of s (byte order). */
  def build(s: Array[Byte]): Array[Int] = {
    val n = s.length
    require(n <= MAX_N, s"partition text too large for SA pass: $n > $MAX_N")
    if (n == 0) return Array.emptyIntArray
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = (s(i) & 0xff) + 1; i += 1 } // ranks >= 1; 0 = absent
    val keys = new Array[Long](n)
    val sa = new Array[Int](n)
    var k = 1
    var done = false
    while (!done) {
      i = 0
      while (i < n) {
        val r2 = if (i + k < n) rank(i + k) else 0
        keys(i) = (rank(i).toLong << 40) | (r2.toLong << 20) | i.toLong
        i += 1
      }
      java.util.Arrays.sort(keys)
      // re-rank
      var r = 1
      var prev = keys(0) >>> 20 // (rank1, rank2) part
      sa(0) = (keys(0) & 0xfffffL).toInt
      rank(sa(0)) = r
      i = 1
      while (i < n) {
        val cur = keys(i) >>> 20
        if (cur != prev) { r += 1; prev = cur }
        val idx = (keys(i) & 0xfffffL).toInt
        sa(i) = idx
        rank(idx) = r
        i += 1
      }
      done = r == n || k >= n
      k <<= 1
    }
    sa
  }

  /** LCP array via Kasai: lcp(i) = lcp(sa(i), sa(i+1)), length n-1. */
  def kasai(s: Array[Byte], sa: Array[Int]): Array[Int] = {
    val n = s.length
    if (n <= 1) return Array.emptyIntArray
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n - 1)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) + 1 < n) {
        val j = sa(rank(i) + 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }
}
