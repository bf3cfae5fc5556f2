package graft.dedup

/** Plain suffix array (prefix-doubling, O(n log² n)) + Kasai LCP — the
  * in-memory kernel behind the per-partition suffix-array long-repeat pass
  * (the engine analogue of the reference's Merkle-subtree maximal-duplicate
  * regions, /root/reference/src/tree_approach.cpp:413-477, re-expressed for
  * variable-length text instead of aligned chunks). Public textbook
  * algorithms, implemented from the definition.
  */
object SuffixArray {

  /** Suffix array of s (byte order). */
  def build(s: Array[Byte]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.emptyIntArray
    var rank = new Array[Int](n)
    var tmp = new Array[Int](n)
    val sa = Array.range(0, n)
    var i = 0
    while (i < n) { rank(i) = s(i) & 0xff; i += 1 }
    var k = 1
    while (k < n) {
      val kk = k
      val ord = new Ordering[Int] {
        def compare(a: Int, b: Int): Int = {
          if (rank(a) != rank(b)) return Integer.compare(rank(a), rank(b))
          val ra = if (a + kk < n) rank(a + kk) else -1
          val rb = if (b + kk < n) rank(b + kk) else -1
          Integer.compare(ra, rb)
        }
      }
      scala.util.Sorting.stableSort(sa)(ord)
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (ord.compare(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      val t = rank; System.arraycopy(tmp, 0, t, 0, n)
      if (rank(sa(n - 1)) == n - 1) return sa
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
