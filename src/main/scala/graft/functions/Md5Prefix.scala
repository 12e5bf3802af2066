package graft.functions

/** THE driver/executor-side implementation of the repo's cross-engine
  * 52-bit hash contract: the first 13 hex chars of md5("<salt><id>") as
  * a long — byte-identical to Spark SQL's
  * `conv(substring(md5(cast(concat('<salt>', id) as binary)), 1, 13), 16, 10)`
  * and DuckDB's `('0x' || substr(md5('<salt>' || id), 1, 13))::BIGINT`.
  * 52 bits so the value survives a Double cast exactly (the bottomk r7
  * lesson). Every JVM-side consumer (streaming twin sketches, any
  * future sampler) MUST use this helper instead of hand-rolling the
  * digest slice — two copies of the byte-math is how the contract
  * silently forks (r9 review finding). Spec-side INDEPENDENT references
  * (GraphsSpec.lmHash) deliberately keep their own copy: they exist to
  * catch THIS helper drifting. */
object Md5Prefix {
  def hash52(salt: String, id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + id).getBytes("UTF-8"))
    // 7 bytes = 14 hex chars; keep 13 (52 bits)
    java.lang.Long.parseLong(
      d.take(7).map("%02x".format(_)).mkString.take(13), 16)
  }

  /** 60-bit variant — the JVM mirror of the operators' shared h60
    * (conv(substring(md5(..), 1, 15), 16, 10)) sampling key. */
  def hash60(salt: String, id: Long): Long = hash60s(salt + id)

  /** 60-bit variant over an arbitrary string — the mirror of
    * `conv(substring(md5(cast(s as binary)), 1, 15), 16, 10)` (the
    * minhash shingle base hash; Streams.lshIncrement computes arriving
    * docs' signatures with it). */
  def hash60s(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }
}
