package graft.dedup

/** Pinned shingle/signature configuration (SURVEY.md §7.1 item 5): the serial
  * oracle and the distributed pipeline MUST share one instance, or recall
  * comparison is meaningless.
  *
  * Default b×r: 32 bands × 4 rows = 128 perms (north_star). At the default
  * τ=0.7 the LSH miss probability for a true pair is
  * (1 - 0.7⁴)³² ≈ 1.5e-4 ≪ the 0.01 recall budget.
  */
case class DedupConfig(
    shingleK: Int = 5,
    numPerm: Int = 128,
    bands: Int = 32,
    tau: Double = 0.7,
    seed: Long = 42L,
    /** candidate buckets larger than this emit star edges (rep↔member)
      * instead of all O(n²) pairs — skew guard for boilerplate bands. */
    maxBucket: Int = 64,
    /** SimHash Hamming-ball radius (block-probe pass). */
    simhashMaxHamming: Int = 3,
    /** SimHash probe blocks: key on every (k−d)-subset of k blocks —
      * C(k, k−d) keys/doc of ~64·(k−d)/k bits. k=6, d=3 ⇒ 20 keys of ~32
      * bits: chance collisions shrink 2^16× vs single 16-bit blocks (the
      * quadratic-vs-linear candidate-stage difference at web scale). */
    simhashBlocks: Int = 6) {
  require(numPerm % bands == 0, "bands must divide numPerm")
  def rows: Int = numPerm / bands
}
