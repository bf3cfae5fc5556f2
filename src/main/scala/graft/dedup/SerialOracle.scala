package graft.dedup

import graft.functions.Impl

/** Single-threaded exact oracle (the analogue of the reference's serial
  * host-side implementations, /root/reference/include/reference_impl.hpp:16-132):
  * brute-force O(n²) Jaccard over the SAME shingle config as the distributed
  * pipeline + exact union-find clustering with min-id representatives.
  * Used by tests to compute dup-pair recall (≥0.99 gate) and to check cluster
  * assignments; never run at scale.
  */
object SerialOracle {

  /** Must mirror the graft shingle kernel's normalization: ASCII lowercase +
    * whitespace-run tokenization, k-word shingles.
    */
  def shingleSet(text: String, k: Int): Array[Int] = {
    val lowered = text.map(c => if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
    Impl.shinglesFromWords(
      Impl.wordHashes(lowered.getBytes(java.nio.charset.StandardCharsets.UTF_8)), k)
  }

  /** All pairs (a < b) with exact Jaccard >= tau. Includes exact dups (J=1);
    * two empty shingle sets are identical content (J=1) — matches the
    * pipeline, where empty docs collapse in the exact-dup stage.
    */
  def truePairs(docs: Seq[(Long, String)], cfg: DedupConfig): Set[(Long, Long)] = {
    val sets = docs.map { case (id, t) => (id, shingleSet(t, cfg.shingleK)) }
      .sortBy(_._1)
    val out = Set.newBuilder[(Long, Long)]
    var i = 0
    while (i < sets.length) {
      var j = i + 1
      while (j < sets.length) {
        if (Impl.jaccardArr(sets(i)._2, sets(j)._2) >= cfg.tau)
          out += ((sets(i)._1, sets(j)._1))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  /** Exact connected components with min-id cluster representative. */
  def clusters(ids: Seq[Long], pairs: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min-id wins (deterministic representative)
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    ids.map(i => i -> find(i)).toMap
  }
}
