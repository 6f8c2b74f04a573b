package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Near-duplicate pairs at Hamming distance ≤ `maxHamming`: one
    * simhash per doc, 4×16-bit band explode, bucket groupBy with
    * in-bucket upper-triangle expansion (the fingerprint rides along —
    * 8 bytes — so the verify needs no join back), then the popcount
    * filter (applied BEFORE the distinct, so the dedup exchange sees
    * only surviving pairs). Single corpus traversal, one shuffle keyed
    * on (band_id, band_val); same shape as
    * [[MinHashLSH.candidatePairsFromSets]], including the
    * pre-materialization `maxBucketSize` cap (blank docs all hash to
    * sh=0 and would otherwise build one giant bucket). */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 12, maxBucketSize: Int = 0): DataFrame = {
    register(docs.sparkSession)
    val sh = docs.select(col(idCol).as("doc_id"), expr(
      s"""simhash64(CASE WHEN length(trim($textCol)) = 0 THEN array()
         | ELSE split(trim($textCol), '\\\\s+') END)""".stripMargin).as("sh"))
    val bands = sh.select(col("doc_id"), col("sh"), posexplode(expr(
      "transform(sequence(0, 3), b -> shiftright(sh, 16 * b) & 65535L)"))
      .as(Seq("band_id", "band_val")))
    val capped = MinHashLSH.capBuckets(bands, Seq("band_id", "band_val"), maxBucketSize)
    val buckets = capped.groupBy(col("band_id"), col("band_val"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh")))).as("xs"))
      .filter(size(col("xs")) >= 2)
    buckets
      .select(explode(expr(MinHashLSH.upperTriangleSql("xs",
        (a, b) => s"struct($a.doc_id AS doc_a, $b.doc_id AS doc_b, " +
          s"$a.sh AS sh_a, $b.sh AS sh_b)"))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        expr("hamming64(p.sh_a, p.sh_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
