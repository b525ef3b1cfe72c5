package graft.pipeline

/** The engine-portability hash kernel shared by
  * [[TextAnalysis.winnowingFingerprints]] and
  * [[Dedup.contentDefinedChunks]]: token hashes are the FIRST 4 MD5 BYTES
  * (= first 8 hex chars — reproducible in any SQL engine) reduced mod
  * 2^31-1, and k-grams fold those hashes with base 131 under the same
  * modulus, so every intermediate stays far below 2^63 and the arithmetic
  * replays bit-for-bit in DuckDB oracles. ONE definition: the constants
  * and byte-folding order are load-bearing for every committed oracle, so
  * the two operators must not be able to drift apart.
  */
private[pipeline] object RollingHash {
  /** Modulus 2^31 - 1 (prime; keeps base-131 folds under 2^63). */
  val M: Long = 2147483647L
  /** Polynomial fold base. */
  val B: Long = 131L

  /** Per-token hashes: first 4 md5 bytes, big-endian, mod [[M]]. */
  def tokenHashes(toks: Seq[String]): Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < th.length) {
      val d = md.digest(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      var h = 0L
      var b = 0
      while (b < 4) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      th(i) = h % M
      i += 1
    }
    th
  }

  /** Base-[[B]] fold of the k token hashes starting at index j, mod [[M]]. */
  def gramHash(th: Array[Long], j: Int, k: Int): Long = {
    var acc = th(j)
    var x = 1
    while (x < k) { acc = (acc * B + th(j + x)) % M; x += 1 }
    acc
  }
}
