package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** 52-bit md5-prefix hash — the ENGINE-PORTABLE base hash the sketch
  * family's `md5_52` modes share (fingerprint64, minhash_sig). 13 hex
  * nibbles of md5(s) folded big-endian into a non-negative long: exactly
  * the `strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1` fold the
  * DuckDB oracles compute (and the arithmetic `Curation.hashRank52`
  * already engine-validates via `q_sample_exact` / `q_shuffle_order`),
  * done here on the raw digest bytes instead of the hex string.
  *
  * 52 bits so the value is also EXACT in a double; md5 rather than
  * xxhash64 because xxhash64 is not SQL-reproducible in DuckDB — this is
  * the hash that buys the sketch expressions a real oracle.
  */
object Md5Hash {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 13 hex nibbles of md5(s) as a long in [0, 2^52). */
  def hash52(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    // hex nibble i of the digest string = (i even: high, odd: low) nibble
    // of byte i/2; 13 nibbles = bytes 0..5 + high nibble of byte 6
    ((d(0) & 0xFFL) << 44) | ((d(1) & 0xFFL) << 36) | ((d(2) & 0xFFL) << 28) |
      ((d(3) & 0xFFL) << 20) | ((d(4) & 0xFFL) << 12) | ((d(5) & 0xFFL) << 4) |
      ((d(6) & 0xF0L) >>> 4)
  }

  /** First 8 md5 digest bytes big-endian as the raw 64-bit value (signed
    * Long with identical bits) — the full-width sibling [[hash52]] can't
    * provide (SimHash needs all 64 bit lanes). DuckDB mirrors it as the
    * 16-nibble fold of `md5(s)` in HUGEINT, sign-converted.
    */
  def hash64(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    md.update(s.getBytes)
    val d = md.digest()
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) | ((d(2) & 0xFFL) << 40) |
      ((d(3) & 0xFFL) << 32) | ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }
}
