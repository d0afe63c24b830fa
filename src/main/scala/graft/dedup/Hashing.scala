package graft.dedup

/** Row-local 64-bit string hashing for sketch signatures (MinHash,
  * SimHash). FNV-1a over UTF-8 bytes with a seed fold and an
  * avalanche finisher (splitmix64) — deterministic, allocation-free,
  * fast enough to hash ~10⁹ shingles/core/minute.
  *
  * Sketches are engine-internal (no cross-engine oracle), so the hash
  * only needs to be stable within this library.
  */
object Hashing {

  /** Distinct word n-gram shingles, plain-Scala fast path (the Column
    * variant in [[Dedup.shingles]] exists for SQL-surface parity; catalyst
    * higher-order lambdas are interpreted per element and ~100× slower).
    */
  def shingleSet(text: String, n: Int = 3): Array[String] = {
    if (text == null) return Array.empty
    val w = text.split(' ')
    if (w.length < n) return Array.empty
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= w.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      out += sb.toString
      i += 1
    }
    out.toArray
  }
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  def hash64(s: String, seed: Long = 0L): Long = {
    var h = FnvOffset ^ (seed * FnvPrime)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      // fold UTF-16 char as two bytes — stable and avoids encoder allocs
      h = (h ^ (c & 0xff)) * FnvPrime
      h = (h ^ ((c >> 8) & 0xff)) * FnvPrime
      i += 1
    }
    // splitmix64 avalanche
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-permutation MinHash signature of a shingle set — one pass per
    * permutation over the shingles, all row-local.
    */
  def minhashSignature(shingles: Seq[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    shingles.foreach { sh =>
      var i = 0
      while (i < k) {
        val h = hash64(sh, seed = i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** 64-bit SimHash of a shingle set: per bit, sum ±1 contributions of
    * each shingle hash; signature bit = sign.
    */
  def simhash64(shingles: Seq[String]): Long = {
    val counts = new Array[Int](64)
    shingles.foreach { sh =>
      val h = hash64(sh)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
