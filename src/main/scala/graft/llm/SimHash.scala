package graft.llm

import org.apache.spark.sql.SparkSession

/** SimHash near-duplicate fingerprinting.
  *
  * The scale path is the 64-bit JVM implementation below (FNV-1a token
  * hashes folded into 64 sign counters), registered as `simhash64` —
  * one BIGINT per document, so dedup becomes: compute fingerprint →
  * explode 4×16-bit bands → bucket join on band value → verify
  * candidates with `hamming64` ≤ threshold. Same band/bucket shape as
  * [[MinHashLSH]], so the shuffle is on 16-bit band keys, never text.
  *
  * A reduced relational 16-bit formulation (explode tokens → nibble
  * arithmetic on md5 hex → per-bit sign sums) lives in
  * `LlmQueries.q22` where it is oracle-checked against DuckDB —
  * engine-portable proof of the algorithm; this object is the fast
  * production form.
  */
object SimHash {

  /** FNV-1a 64-bit over UTF-8 bytes — stable, dependency-free. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit simhash of a token sequence (unit weights). */
  def simhash64(tokens: Seq[String]): Long = {
    if (tokens == null) return 0L
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 16-bit band `b` (0–3) of a simhash — the LSH bucket key. */
  def band16(h: Long, b: Int): Int = ((h >>> (16 * b)) & 0xffffL).toInt

  def register(spark: SparkSession): Unit = {
    spark.udf.register("simhash64", (toks: Seq[String]) => simhash64(toks))
    spark.udf.register("hamming64", (a: Long, b: Long) => hamming64(a, b))
  }
}
