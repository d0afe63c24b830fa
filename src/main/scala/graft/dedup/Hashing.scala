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
    // limit -1: keep trailing empty tokens, matching Spark's split() in
    // Dedup.shingles — the parity this scaladoc claims (split(' ') drops
    // trailing empties, so a doc ending in a space would shingle
    // differently per surface; r3 self-review)
    val w = text.split(" ", -1)
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

  /** Rabin–Karp polynomial rolling hashes of every k-char window, one
    * hash per position in O(n): h(i+1) = (h(i) - s(i)·B^(k-1))·B + s(i+k).
    */
  def rollingHashes(s: String, k: Int): Array[Long] = {
    if (s == null || s.length < k) return Array.empty
    val B = 1000000007L
    var bPow = 1L
    var i = 0
    while (i < k - 1) { bPow *= B; i += 1 }
    val out = new Array[Long](s.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= s.length - k) {
      h = (h - s.charAt(i - 1) * bPow) * B + s.charAt(i + k - 1)
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowing (Schleimer et al.): keep the minimum rolling hash of each
    * window of `w` consecutive k-gram hashes (rightmost on ties), dedup.
    * Guarantees any match of length ≥ w+k−1 shares a fingerprint — the
    * local-substring-overlap detector that md5 whole-doc hashing can't
    * give. Row-local, map-only at any scale.
    */
  def winnow(s: String, k: Int = 8, w: Int = 8): Array[Long] = {
    val hs = rollingHashes(s, k)
    if (hs.isEmpty) return Array.empty
    val out = new scala.collection.mutable.LinkedHashSet[Long]
    var start = 0
    val lastStart = math.max(hs.length - w, 0)
    while (start <= lastStart) {
      var minIdx = start
      var i = start
      val end = math.min(start + w, hs.length)
      while (i < end) {
        if (hs(i) <= hs(minIdx)) minIdx = i // rightmost minimum
        i += 1
      }
      out += hs(minIdx)
      start += 1
    }
    out.toArray
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

  /** Fused k-permutation MinHash straight from the text — bit-identical
    * to `minhashSignature(shingleSet(text), k)` (MinhashKernelSpec holds
    * the equality corpus-wide), ~allocation-free:
    *
    *  - a 3-word shingle is a CONTIGUOUS char range of the source (the
    *    delimiter is a single space — the [[graft.functions.WordBigrams]]
    *    argument), so no StringBuilder and no shingle Strings exist;
    *  - MinHash is multiplicity-invariant (a duplicate shingle can never
    *    change a minimum), so the LinkedHashSet dedup is dropped rather
    *    than replicated;
    *  - the k FNV chains advance TOGETHER in one scan of each shingle's
    *    chars (chars read once, not k times), then avalanche+min at the
    *    shingle boundary — the same `hash64(sh, seed = i)` arithmetic,
    *    reassociated.
    *
    * This is the dominant CPU of the LSH driver queries; signature
    * VALUES are unchanged, so the boundary-oracle dumps and every
    * downstream band/cap/join/verify stage hash-match as before.
    */
  def minhashSignatureOfText(text: String, k: Int, n: Int = 3): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    if (text == null) return sig
    val len = text.length
    var spaces = 0
    var i = 0
    while (i < len) { if (text.charAt(i) == ' ') spaces += 1; i += 1 }
    val m = spaces + 1 // word count under split(" ", -1) (trailing empties kept)
    if (m < n) return sig
    val starts = new Array[Int](m)
    val ends   = new Array[Int](m)
    starts(0) = 0
    var w = 0
    i = 0
    while (i < len) {
      if (text.charAt(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = len
    val hs = new Array[Long](k)
    var s = 0
    while (s <= m - n) {
      var t = 0
      while (t < k) { hs(t) = FnvOffset ^ (t * FnvPrime); t += 1 }
      var j = starts(s)
      val until = ends(s + n - 1)
      while (j < until) {
        val c  = text.charAt(j)
        val b1 = (c & 0xff).toLong
        val b2 = ((c >> 8) & 0xff).toLong
        t = 0
        while (t < k) {
          var h = hs(t)
          h = (h ^ b1) * FnvPrime
          hs(t) = (h ^ b2) * FnvPrime
          t += 1
        }
        j += 1
      }
      t = 0
      while (t < k) {
        var z = hs(t) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= (z >>> 31)
        if (z < sig(t)) sig(t) = z
        t += 1
      }
      s += 1
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
