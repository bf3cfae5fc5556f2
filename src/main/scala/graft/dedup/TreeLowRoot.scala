package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.gf

/** J3 — TreeLowRoot election (the reference's third approach, SURVEY.md
  * §2.4): among identical fresh chunks, the winner is NOT the lowest leaf
  * (J2's atomic_min) but the leaf whose enclosing maximal fresh-duplicated
  * subtree ROOT has the lowest node index — the copy that anchors the
  * biggest deduplicable region.
  *
  * Mirrors /root/reference/include/reference_impl.hpp:265-399
  * (dedup_low_root_ref) and src/tree_low_root_approach.cpp:55-214:
  *
  *   1. leaf labels: FIXED (same digest, same position vs previous
  *      checkpoint), SHIFT (digest in the global first-occurrence map),
  *      FIRST_DUPL otherwise; fresh digests collect member lists;
  *   2. the FIRST_DUPL forest: a parent joins when BOTH children are
  *      FIRST_DUPL; its combined digest H(l‖r) also collects members;
  *   3. root pruning (reference_impl.hpp:348-372): members climb to their
  *      subtree root (while the parent's digest is still fresh-duplicated);
  *      if two members of one digest share a root, that root's digest is
  *      ERASED — iterated to fixpoint (an ambiguous root can't elect);
  *   4. election (reference_impl.hpp:375-399): per fresh digest, the member
  *      with the lowest surviving root becomes FIRST_OCUR; the rest are
  *      SHIFT_DUPL. This is `groupBy(digest).agg(min_by(leaf, root))` once
  *      roots are known — the Spark shape of the final step.
  *
  * Execution shape: steps 1 and 4's relabel are Spark projections/joins;
  * steps 2–3 are a per-checkpoint TREE fixpoint over the fresh-duplicated
  * digest table, which is bounded by the checkpoint's chunk count (the
  * reference's whole approach is per-checkpoint, tree = one buffer) — run
  * on the driver over collected (node, digest) pairs like the Chain's local
  * fast path. At web scale the engine's unit of parallelism is documents,
  * not intra-checkpoint tree nodes.
  */
object TreeLowRoot {

  import ChunkDedup.{FIRST, FIXED, SHIFT}

  /** One checkpoint's election result. */
  case class LowRootResult(
      labels: DataFrame,          // (node, label) per LEAF
      numFirstOcur: Long,         // leaves elected FIRST_OCUR
      numShiftDupl: Long,
      numFixedDupl: Long)

  private type Digest = scala.collection.immutable.ArraySeq[Byte]
  private def key(d: Array[Byte]): Digest =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(d)

  /** Serial election core over one checkpoint's leaf digests (by position).
    * @param prev    previous checkpoint's leaf digests (None = baseline)
    * @param global  digests already in the cross-checkpoint first-occurrence
    *                map (probe)
    * @return (labels by position, winners: digest -> elected node)
    */
  def elect(leaves: Array[Array[Byte]],
            prev: Option[Array[Array[Byte]]],
            global: Digest => Boolean): (Array[String], Map[Digest, Long]) = {
    val n = leaves.length
    val leafBase = n - 1
    val numNodes = 2 * n - 1
    // digest per built node (leaves + FIRST_DUPL forest internals)
    val nodeDigest = new java.util.HashMap[Long, Digest]()
    val labels = new Array[String](n) // leaf labels by position
    val firstDupl = new java.util.HashMap[Digest, java.util.ArrayList[Long]]()
    def addMember(d: Digest, node: Long): Unit =
      firstDupl.computeIfAbsent(d, _ => new java.util.ArrayList[Long]()).add(node)

    val isFirstDupl = new java.util.HashSet[Long]()
    for (pos <- 0 until n) {
      val node = leafBase + pos
      val d = key(leaves(pos))
      nodeDigest.put(node, d)
      if (prev.exists(p => java.util.Arrays.equals(p(pos), leaves(pos)))) {
        labels(pos) = FIXED
      } else if (global(d)) {
        labels(pos) = SHIFT
      } else {
        labels(pos) = "FIRST_DUPL"
        addMember(d, node)
        isFirstDupl.add(node)
      }
    }

    // 2. FIRST_DUPL forest, bottom-up in DESCENDING node order — member
    // lists keep the reference's insertion order (leaves ascending from the
    // labeling loop, internals descending from this one), which the pruning
    // scan below is sensitive to (reference_impl.hpp:329-345)
    var node = n - 2
    while (node >= 0) {
      val l = 2L * node + 1; val r = 2L * node + 2
      if (isFirstDupl.contains(l) && isFirstDupl.contains(r)) {
        val pd = key(graft.functions.Impl.murmur128Digest(
          nodeDigest.get(l).toArray ++ nodeDigest.get(r).toArray))
        nodeDigest.put(node.toLong, pd)
        isFirstDupl.add(node.toLong)
        addMember(pd, node.toLong)
      }
      node -= 1
    }

    // 3. root pruning to fixpoint (reference_impl.hpp:348-372)
    def climb(u: Long): Long = {
      var cur = u
      while (cur > 0 && {
        val p = (cur - 1) / 2
        val pd = nodeDigest.get(p)
        pd != null && firstDupl.containsKey(pd)
      }) cur = (cur - 1) / 2
      cur
    }
    // Faithful per-entry scan (reference_impl.hpp:348-372): track the MIN
    // root seen so far; a member whose root EQUALS the current min erases
    // that root's digest and restarts the entry. Entry order is the only
    // freedom the C++ leaves to the hash map — fixed here to byte-
    // lexicographic digest order for determinism.
    val entryOrder = {
      import scala.jdk.CollectionConverters._
      firstDupl.keySet().asScala.toSeq.sortBy(_.toArray.map(_ & 0xff).toSeq)(
        scala.math.Ordering.Implicits.seqOrdering[Seq, Int])
    }
    for (d <- entryOrder) {
      var found = true
      while (found && firstDupl.containsKey(d)) {
        found = false
        var root = Long.MaxValue
        val ms = firstDupl.get(d).iterator()
        while (!found && ms.hasNext) {
          val pr = climb(ms.next())
          if (pr < root) root = pr
          else if (pr == root) {
            firstDupl.remove(nodeDigest.get(root))
            found = true
          }
        }
      }
    }

    // 4. election: lowest surviving root wins (reference_impl.hpp:375-399)
    val winners = scala.collection.mutable.Map.empty[Digest, Long]
    for (pos <- 0 until n if labels(pos) == "FIRST_DUPL") {
      val d = nodeDigest.get((leafBase + pos).toLong)
      if (!winners.contains(d)) {
        val members = firstDupl.get(d)
        var bestRoot = Long.MaxValue; var select = Long.MaxValue
        val ms = members.iterator()
        while (ms.hasNext) {
          val u = ms.next()
          val r = climb(u)
          if (r < bestRoot) { bestRoot = r; select = u }
        }
        winners(d) = select
      }
    }
    for (pos <- 0 until n if labels(pos) == "FIRST_DUPL") {
      val d = nodeDigest.get((leafBase + pos).toLong)
      labels(pos) = if (winners(d) == leafBase + pos) FIRST else SHIFT
    }
    (labels, winners.toMap)
  }

  /** Stateful low-root dedup chain (chunk-size-1 style golden harness, like
    * ChunkDedup.Chain but with the J3 election). Leaf hashing runs through
    * the same murmur128 kernel/expressions; the per-checkpoint tree fixpoint
    * runs on the driver (bounded by the checkpoint's chunk count).
    */
  final class Chain(spark: SparkSession, numChunks: Long) {
    private var prev: Option[Array[Array[Byte]]] = None
    private val globalMap = new java.util.HashSet[Digest]()

    def checkpoint(chunks: DataFrame): LowRootResult = {
      val rows = chunks
        .select(col("pos"), gf.murmur128(col("chunk")).as("digest"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        .sortBy(_._1)
      require(rows.length == numChunks, s"expected $numChunks chunks")
      val leaves = rows.map(_._2)
      val (labels, winners) = elect(leaves, prev, globalMap.contains)
      // elected digests enter the cross-checkpoint map (reference inserts
      // the selected leaf, reference_impl.hpp:396-398; single-member fresh
      // digests elect themselves). Internal forest digests matter only for
      // restart reconstruction, which ChunkDedup.Chain provides.
      winners.keysIterator.foreach(globalMap.add)
      prev = Some(leaves)
      import spark.implicits._
      val labelDf = labels.zipWithIndex
        .map { case (l, pos) => (numChunks - 1 + pos, l) }.toSeq
        .toDF("node", "label")
      LowRootResult(labelDf,
        labels.count(_ == FIRST).toLong,
        labels.count(_ == SHIFT).toLong,
        labels.count(_ == FIXED).toLong)
    }
  }
}
