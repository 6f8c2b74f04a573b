package graft.llm

import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Document fingerprinting via rolling hashes + winnowing
  * (Schleimer/Wilkerson/Aiken's MOSS scheme): Rabin–Karp hashes of all
  * `w`-byte windows, then the minimum hash of every `g`-hash window is
  * kept (rightmost minimum). Shifted or locally-edited copies share
  * most fingerprints, which makes containment detection robust where
  * whole-document hashing fails.
  *
  * Scale shape: fingerprints are computed row-local (a UDF), then
  * candidate detection is `explode(fingerprints)` → groupBy/bucket
  * join on the fingerprint value — the same bucket-join pattern as
  * [[MinHashLSH]]/[[SimHash]]; nothing quadratic, no driver state.
  */
object Fingerprint {

  val DefaultWindow = 16  // bytes per rolling hash
  val DefaultGuarantee = 8 // winnowing window (hashes)

  private val Base = 1000003L
  private val Mod = (1L << 61) - 1 // Mersenne prime: no bias, no overflow

  /** Rabin–Karp rolling hashes of all w-byte windows. */
  def rollingHashes(bytes: Array[Byte], w: Int): Array[Long] = {
    if (bytes == null || bytes.length < w || w <= 0) return Array.empty
    val out = new Array[Long](bytes.length - w + 1)
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (mulMod(h, Base) + (bytes(i) & 0xff)) % Mod; i += 1 }
    out(0) = h
    i = w
    while (i < bytes.length) {
      h = (h - mulMod(bytes(i - w) & 0xff, pow) % Mod + Mod) % Mod
      h = (mulMod(h, Base) + (bytes(i) & 0xff)) % Mod
      out(i - w + 1) = h
      i += 1
    }
    out
  }

  /** 128-bit-safe modular multiply via Math.multiplyHigh split. */
  private def mulMod(a: Long, b: Long): Long = {
    // Mod = 2^61 - 1: reduce a*b = hi·2^64 + lo using 2^64 ≡ 8 (mod M)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val loMod = java.lang.Long.remainderUnsigned(lo, Mod)
    val hiMod = (hi % Mod * (8 % Mod)) % Mod // 2^64 mod (2^61-1) = 8
    (loMod + hiMod) % Mod
  }

  /** Winnowing: rightmost minimum of each g-window of hashes, deduped
    * on consecutive repeats. */
  def winnow(hashes: Array[Long], g: Int): Array[Long] = {
    if (hashes.isEmpty || g <= 0) return Array.empty
    if (hashes.length <= g) return Array(hashes.min)
    val out = new ArrayBuffer[Long]()
    var lastPos = -1
    var i = 0
    while (i + g <= hashes.length) {
      var minPos = i
      var j = i + 1
      while (j < i + g) { if (hashes(j) <= hashes(minPos)) minPos = j; j += 1 }
      if (minPos != lastPos) { out += hashes(minPos); lastPos = minPos }
      i += 1
    }
    out.toArray
  }

  /** Winnowed fingerprints of a document. */
  def fingerprints(text: String, w: Int = DefaultWindow,
      g: Int = DefaultGuarantee): Array[Long] = {
    if (text == null) return Array.empty
    winnow(rollingHashes(text.getBytes(java.nio.charset.StandardCharsets.UTF_8), w), g)
  }

  /** Fraction (fixed-point millionths) of `a`'s fingerprints present
    * in `b` — containment, the MOSS similarity measure. */
  def containmentFp(a: Array[Long], b: Array[Long]): Long = {
    if (a == null || a.isEmpty) return 0L
    val bs = b.toSet
    math.floor(1e6 * a.count(bs.contains) / a.length).toLong
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("doc_fingerprints",
      (text: String) => fingerprints(text))
    spark.udf.register("fingerprint_containment_fp",
      (a: Seq[Long], b: Seq[Long]) =>
        containmentFp(Option(a).map(_.toArray).orNull, Option(b).map(_.toArray).getOrElse(Array.empty)))
  }
}
