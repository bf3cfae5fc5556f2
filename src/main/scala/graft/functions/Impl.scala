package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the graft Catalyst expressions. Every method here is
  * a pure function of its arguments so both interpreted `eval` and generated
  * code (`graft.functions.Impl.xxx(...)`) call the same body, and the serial
  * test oracle can reuse it verbatim.
  *
  * Hash identities mirror the reference's content keys:
  * MurmurHash3_x64_128 with seed 0 (public Austin Appleby algorithm; the
  * reference uses the same function, /root/reference/include/kokkos_murmur3.hpp:213-292,
  * seed pinned at :436). All other mixers (splitmix64) are public-domain.
  */
object Impl {

  // ---------------------------------------------------------------- murmur3

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** splitmix64 step — used to derive deterministic per-permutation seeds. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  @inline private def getLongLE(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) | ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) | ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  /** MurmurHash3_x64_128 over bytes [off, off+len); returns {h1, h2}. */
  def murmur128(bytes: Array[Byte], off: Int, len: Int, seed: Long): Array[Long] = {
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    var b = 0
    while (b < nblocks) {
      val i = off + b * 16
      var k1 = getLongLE(bytes, i)
      var k2 = getLongLE(bytes, i + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    // tail
    val t = off + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (bytes(t + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (bytes(t + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 += h2; h2 += h1
    Array(h1, h2)
  }

  /** 16-byte digest (reference HashDigest layout: h1 LE ‖ h2 LE). */
  def murmur128Digest(s: UTF8String): Array[Byte] = murmur128Digest(s.getBytes)

  def murmur128Digest(bytes: Array[Byte]): Array[Byte] = {
    val h = murmur128(bytes, 0, bytes.length, 0L)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = ((h(0) >>> (8 * i)) & 0xff).toByte
      out(8 + i) = ((h(1) >>> (8 * i)) & 0xff).toByte
      i += 1
    }
    out
  }

  /** h1 of murmur128 without allocating the result array — the hot-loop form
    * (same algorithm as [[murmur128]], result limited to the first word).
    */
  def murmurH1(bytes: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h1 = seed
    var h2 = seed
    val nblocks = len / 16
    var b = 0
    while (b < nblocks) {
      val i = off + b * 16
      var k1 = getLongLE(bytes, i)
      var k2 = getLongLE(bytes, i + 8)
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      b += 1
    }
    val t = off + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      var j = rem - 1
      while (j >= 8) { k2 ^= (bytes(t + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
      k2 *= C2; k2 = rotl(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 ^= (bytes(t + j) & 0xffL) << (j * 8); j -= 1 }
      k1 *= C1; k1 = rotl(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix64(h1); h2 = fmix64(h2)
    h1 + h2 // == final h1 (h1 += h2 in the reference finalization)
  }

  /** 64-bit content hash (h1 of murmur128, seed 0). */
  def hash64(bytes: Array[Byte], off: Int, len: Int): Long =
    murmurH1(bytes, off, len, 0L)

  def hash64(s: UTF8String): Long = { val b = s.getBytes; hash64(b, 0, b.length) }

  def hash64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hash64(b, 0, b.length)
  }

  // --------------------------------------------------------------- shingles

  @inline private def isSpace(b: Byte): Boolean = (b & 0xff) <= 0x20

  /** Per-word 64-bit hashes, whitespace-delimited (runs of chars <= 0x20).
    * Allocation-free per word (primitive buffer, unboxed murmur h1) — this
    * sits under every shingle/minhash/simhash/content-key call.
    */
  def wordHashes(bytes: Array[Byte]): Array[Long] = {
    var buf = new Array[Long](64)
    var m = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isSpace(bytes(i))) i += 1
      val start = i
      while (i < n && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (m == buf.length) buf = java.util.Arrays.copyOf(buf, m * 2)
        buf(m) = murmurH1(bytes, start, i - start, 0L)
        m += 1
      }
    }
    if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m)
  }

  /** Zero-copy variant over UTF8String base memory with inline ASCII
    * lowercasing — no per-doc text copies (a cached UTF8String points into
    * the column buffer; `getBytes`/`toLowerCase` would each copy ~2 KB per
    * doc, and in local mode allocation bandwidth is the scaling ceiling).
    * Non-ASCII bytes pass through unchanged (normalization is pinned to
    * ASCII case-folding; the serial oracle mirrors this).
    */
  def normWordHashes(s: UTF8String): Array[Long] = {
    import org.apache.spark.unsafe.Platform
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var buf = new Array[Long](64)
    var m = 0
    // reusable scratch for one lowercased word (words are short)
    var word = new Array[Byte](32)
    var i = 0
    while (i < n) {
      while (i < n && (Platform.getByte(base, off + i) & 0xff) <= 0x20) i += 1
      val start = i
      while (i < n && (Platform.getByte(base, off + i) & 0xff) > 0x20) i += 1
      val len = i - start
      if (len > 0) {
        if (len > word.length) word = new Array[Byte](len)
        var j = 0
        while (j < len) {
          var b = Platform.getByte(base, off + start + j)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          word(j) = b
          j += 1
        }
        if (m == buf.length) buf = java.util.Arrays.copyOf(buf, m * 2)
        buf(m) = murmurH1(word, 0, len, 0L)
        m += 1
      }
    }
    if (m == buf.length) buf else java.util.Arrays.copyOf(buf, m)
  }

  private final val SHINGLE_PRIME = 0x100000001b3L // FNV64 prime

  /** Combine k consecutive word hashes into one order-sensitive shingle hash. */
  @inline private def combineShingle(words: Array[Long], start: Int, k: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < k) { h = (h ^ words(start + j)) * SHINGLE_PRIME; j += 1 }
    fmix64(h)
  }

  /** Distinct, sorted 64-bit k-word-shingle hashes of `text`, normalized:
    * lowercased, whitespace-run tokenised (⇒ whitespace- and case-insensitive
    * in one kernel pass — no regex, no normalized-string column). Docs
    * shorter than k words hash the whole word sequence as one shingle so
    * short docs still participate in dedup.
    */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val words = normWordHashes(text)
    val out = shinglesFromWords(words, k)
    new GenericArrayData(out)
  }

  /** Whole-document content key: order-sensitive fold of the normalized
    * (lowercased, whitespace-run-tokenised) word-hash sequence — the exact
    * dedup key. Equivalent to hashing the normalized text, in one pass.
    * Empty/whitespace-only docs key to the same constant (they are exact
    * duplicates of each other).
    */
  def contentKey64(text: UTF8String): Long = {
    val words = normWordHashes(text)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < words.length) { h = (h ^ words(i)) * SHINGLE_PRIME; i += 1 }
    fmix64(h)
  }

  /** 32-bit shingle ids (top half of the 64-bit combine): halves every
    * downstream cache/shuffle byte; in-doc collision odds at ~300 shingles
    * are ~1e-5, and the serial oracle shares the identical ids so the recall
    * gate stays apples-to-apples.
    */
  def shinglesFromWords(words: Array[Long], k: Int): Array[Int] = {
    val n = words.length
    if (n == 0) return Array.emptyIntArray
    val m = if (n < k) 1 else n - k + 1
    val kk = math.min(k, n)
    val raw = new Array[Int](m)
    var i = 0
    while (i < m) { raw(i) = (combineShingle(words, i, kk) >>> 32).toInt; i += 1 }
    distinctSorted(raw)
  }

  def distinctSorted(raw: Array[Int]): Array[Int] = {
    java.util.Arrays.sort(raw)
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || raw(w - 1) != raw(i)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    if (w == raw.length) raw else java.util.Arrays.copyOf(raw, w)
  }

  // ---------------------------------------------------------------- minhash

  private val seedCache = new ConcurrentHashMap[(Int, Long), Array[Long]]()

  def permSeeds(numPerm: Int, seed: Long): Array[Long] =
    seedCache.computeIfAbsent((numPerm, seed), { key: (Int, Long) =>
      val arr = new Array[Long](key._1)
      var s = key._2
      var i = 0
      while (i < arr.length) { s = splitmix64(s); arr(i) = s; i += 1 }
      arr
    })

  /** MinHash signature: sig(i) = min over shingles x of fmix64(x ^ seed_i).
    * One fused pass over (shingles × perms) — the "batched MinHash signatures
    * (128 permutations)" kernel. Empty input → all Long.MaxValue (matches no
    * band of any non-empty doc).
    */
  def minhash(shingleHashes: ArrayData, numPerm: Int, seed: Long): ArrayData =
    new GenericArrayData(minhashArr(shingleHashes.toIntArray(), numPerm, seed))

  def minhashArr(xs: Array[Int], numPerm: Int, seed: Long): Array[Long] = {
    val seeds = permSeeds(numPerm, seed)
    val sig = new Array[Long](numPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < xs.length) {
      val x = xs(i).toLong & 0xffffffffL
      var p = 0
      while (p < numPerm) {
        val v = fmix64(x ^ seeds(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: split the signature into `numBands` equal bands and hash
    * each band's rows to one long (band index folded in, so band j of one doc
    * can only collide with band j of another).
    */
  def bandHashes(sig: ArrayData, numBands: Int): ArrayData =
    new GenericArrayData(bandHashesArr(sig.toLongArray(), numBands))

  def bandHashesArr(sig: Array[Long], numBands: Int): Array[Long] = {
    val r = sig.length / numBands
    val out = new Array[Long](numBands)
    var bnd = 0
    while (bnd < numBands) {
      var h = 0xcbf29ce484222325L ^ bnd.toLong
      var j = bnd * r
      val end = j + r
      while (j < end) { h = (h ^ sig(j)) * SHINGLE_PRIME; j += 1 }
      out(bnd) = fmix64(h)
      bnd += 1
    }
    out
  }

  // ---------------------------------------------------------------- simhash

  /** SimHash 64-bit fingerprint over normalized (lowercased) word hashes,
    * term-frequency weighted.
    */
  def simhash64(text: UTF8String): Long =
    simhashFromWords(normWordHashes(text))

  def simhashFromWords(words: Array[Long]): Long = {
    val counter = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = words(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counter(b) += 1 else counter(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counter(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Fused per-document feature kernel: ONE tokenization pass produces the
    * shingle set, the MinHash signature AND the SimHash fingerprint —
    * struct(sh, sig, sim64). Local-mode scaling is allocation/memory-
    * bandwidth-bound (BASELINE.md), and the text scan + word hashing is the
    * shared expensive part of all three features; separate expressions
    * tokenize the same 2 KB of text twice.
    */
  def featureStruct(text: UTF8String, k: Int, numPerm: Int, seed: Long): InternalRow = {
    val words = normWordHashes(text)
    val sh = shinglesFromWords(words, k)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(sh),
      new GenericArrayData(minhashArr(sh, numPerm, seed)),
      simhashFromWords(words)))
  }

  /** 16-bit block `i` (0..3) of a simhash — the naive Hamming-ball probe key
    * (kept for tests/queries; use [[simhashKeys]] at scale).
    */
  def simhashBlock(h: Long, i: Int): Int = ((h >>> (16 * i)) & 0xffffL).toInt

  /** Multi-block Hamming probe keys (Manku/Jain/Sarma, WWW'07 style): split
    * the 64-bit fingerprint into `k` blocks; two fingerprints within Hamming
    * distance d agree on ≥ k−d whole blocks, so key on every (k−d)-subset of
    * blocks. Key width ≈ 64·(k−d)/k bits ⇒ chance collisions shrink by 2^32
    * vs a single 16-bit block — the difference between a linear and a
    * quadratic candidate stage at 10¹² docs.
    */
  def simhashKeys(h: Long, k: Int, d: Int): ArrayData = {
    val combos = blockCombos(k, d)
    val out = new Array[Long](combos.length)
    var c = 0
    while (c < combos.length) {
      val blocks = combos(c)
      var key = 0xcbf29ce484222325L ^ c.toLong // combo index salt
      var j = 0
      while (j < blocks.length) {
        val b = blocks(j)
        val lo = (64 * b) / k
        val hi = (64 * (b + 1)) / k
        val width = hi - lo
        val mask = if (width == 64) -1L else (1L << width) - 1
        key = (key ^ ((h >>> lo) & mask)) * SHINGLE_PRIME
        j += 1
      }
      out(c) = fmix64(key)
      c += 1
    }
    new GenericArrayData(out)
  }

  private val comboCache = new ConcurrentHashMap[(Int, Int), Array[Array[Int]]]()

  /** All (k−d)-subsets of {0..k−1}, lexicographic, cached. */
  def blockCombos(k: Int, d: Int): Array[Array[Int]] =
    comboCache.computeIfAbsent((k, d), { key: (Int, Int) =>
      val (kk, dd) = key
      val take = kk - dd
      require(take >= 1 && take <= kk, s"invalid block combo ($kk, $dd)")
      (0 until kk).combinations(take).map(_.toArray).toArray
    })

  // ------------------------------------------------------- set similarities

  /** |A ∩ B| for sorted distinct int arrays (the shingle sets). */
  def intersectSize(a: ArrayData, b: ArrayData): Int =
    intersectSizeArr(a.toIntArray(), b.toIntArray())

  def intersectSizeArr(a: Array[Int], b: Array[Int]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  /** Jaccard similarity of two sorted distinct shingle-id sets. */
  def jaccard(a: ArrayData, b: ArrayData): Double =
    jaccardArr(a.toIntArray(), b.toIntArray())

  def jaccardArr(a: Array[Int], b: Array[Int]): Double = {
    if (a.length == 0 && b.length == 0) return 1.0
    val inter = intersectSizeArr(a, b)
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  // ------------------------------------------------------------ fingerprint

  /** 64-bit rolling (polynomial) fingerprint of the raw bytes — the
    * whole-document content key used by the exact-dup fast path and lineage.
    */
  def fingerprint64(text: UTF8String): Long = {
    val b = text.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xffL)) * SHINGLE_PRIME; i += 1 }
    fmix64(h)
  }

  // -------------------------------------------------------------- winnowing

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): positions+hashes of
    * selected `gram`-byte windows such that any exact repeat of length >=
    * gram + window - 1 shares at least one selected fingerprint. Returns
    * array<struct<pos:int, hash:long>> — the scale path of the suffix-array
    * long-repeat pass (candidates verified by substring extension).
    */
  def winnow(text: UTF8String, gram: Int, window: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    if (n < gram) return new GenericArrayData(Array.empty[Any])
    val m = n - gram + 1
    val hs = new Array[Long](m)
    // rolling polynomial hash of each gram, then mixed
    var h = 0L
    var i = 0
    while (i < gram) { h = h * SHINGLE_PRIME + (b(i) & 0xffL); i += 1 }
    var pow = 1L
    i = 1
    while (i < gram) { pow *= SHINGLE_PRIME; i += 1 }
    hs(0) = fmix64(h)
    i = 1
    while (i < m) {
      h = (h - (b(i - 1) & 0xffL) * pow) * SHINGLE_PRIME + (b(i + gram - 1) & 0xffL)
      hs(i) = fmix64(h)
      i += 1
    }
    // winnow: rightmost-min per window, dedup consecutive selections
    val sel = new java.util.ArrayList[Any](math.max(4, m / math.max(1, window)))
    var lastPos = -1
    var start = 0
    while (start + window <= m) {
      var minIdx = start
      var j = start + 1
      while (j < start + window) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      if (minIdx != lastPos) {
        sel.add(InternalRow(minIdx, hs(minIdx)))
        lastPos = minIdx
      }
      start += 1
    }
    if (m < window) { // short doc: single minimum over all grams
      var minIdx = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(minIdx)) minIdx = j; j += 1 }
      sel.add(InternalRow(minIdx, hs(minIdx)))
    }
    new GenericArrayData(sel.toArray)
  }

  /** Verify a candidate repeat anchor (a[pa..pa+gram) == b[pb..pb+gram)) and
    * extend it to the MAXIMAL matching span. Returns {startA, startB, len} or
    * null when the anchor doesn't verify (fingerprint collision). Two anchors
    * inside the same maximal repeat extend to the identical span, so a plain
    * `distinct` downstream replaces interval merging.
    */
  def extendMatch(a: UTF8String, b: UTF8String, pa: Int, pb: Int, gram: Int): InternalRow = {
    val ab = a.getBytes
    val bb = b.getBytes
    if (pa < 0 || pb < 0 || pa + gram > ab.length || pb + gram > bb.length) return null
    var i = 0
    while (i < gram) {
      if (ab(pa + i) != bb(pb + i)) return null
      i += 1
    }
    var sa = pa
    var sb = pb
    while (sa > 0 && sb > 0 && ab(sa - 1) == bb(sb - 1)) { sa -= 1; sb -= 1 }
    var ea = pa + gram
    var eb = pb + gram
    while (ea < ab.length && eb < bb.length && ab(ea) == bb(eb)) { ea += 1; eb += 1 }
    InternalRow(sa, sb, ea - sa)
  }

  // ------------------------------------------------------------- embeddings

  /** Cosine similarity of two float vectors, accumulated in double with a
    * fixed left-to-right order (deterministic across runs/partitionings).
    */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane (SRP) LSH bucket of a float vector: `bits`-bit sign
    * sketch from seeded deterministic hyperplanes — cosine-ANN scale path.
    */
  def srpBucket(v: ArrayData, bits: Int, seed: Long): Long = {
    val n = v.numElements()
    var out = 0L
    var bit = 0
    while (bit < bits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // deterministic pseudo-gaussian component for (bit, i)
        val r = fmix64(seed ^ (bit.toLong << 32) ^ i.toLong)
        val g = (r >> 11).toDouble / (1L << 52).toDouble // uniform(-1,1)-ish
        dot += v.getFloat(i) * g
        i += 1
      }
      if (dot >= 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
