package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Pipeline (all set-oriented, no driver state, no all-pairs scan):
  *   1. shingle: word n-grams of the tokenized text;
  *   2. minhash: k independent signatures — `min(md5(seed || shingle))`
  *      per seed, the min taken lexicographically over hex strings so
  *      the same operator is expressible in any engine with md5();
  *   3. band: signatures grouped into bands; each (band_id, band_key)
  *      is a bucket key;
  *   4. bucket join: docs sharing a bucket become candidate pairs —
  *      the only join is an equi-join on the bucket key, so candidate
  *      generation is a shuffle on short hash strings, never on text;
  *   5. verify: exact shingle-set Jaccard on the candidates only.
  *
  * Scale notes: the shuffle payload is doc_id + 32-byte keys. Popular
  * buckets (boilerplate shingles) are the skew risk — AQE skew-join
  * handles moderate cases; for pathological corpora cap bucket size
  * upstream with a count filter before the self-join.
  */
object MinHashLSH {

  /** Word n-gram shingles; docs shorter than n collapse to one shingle. */
  def shingleExpr(toksCol: String, n: Int): Column =
    expr(
      s"""CASE WHEN size($toksCol) >= $n
         | THEN transform(sequence(0, size($toksCol) - $n),
         |   i -> concat_ws(' ', slice($toksCol, i + 1, $n)))
         | ELSE array(concat_ws(' ', $toksCol)) END""".stripMargin)

  /** Mersenne prime 2^31−1: signature arithmetic stays far below
    * BIGINT overflow (base < P, a < 2^20 → product < 2^51). */
  val P = 2147483647L

  /** Per-seed LCG constants (a_k, b_k) — deterministic, embedded
    * identically in the DuckDB oracle. */
  def seedParams(k: Int): (Long, Long) = {
    val a = ((1103515245L * (k + 1) + 12345L) % ((1L << 20) - 1)) | 1L // odd, < 2^20
    val b = (2654435769L * (k + 1)) % P
    (a, b)
  }

  /** Base hash per shingle: md5 once, first 15 hex chars → 60-bit int,
    * reduced mod P. Each of the k signatures is then a cheap integer
    * LCG over the base values — one md5 per shingle total, not k
    * (the md5-per-(seed,shingle) variant dominated the benchmark). */
  def baseHashExpr(shCol: String): Column =
    expr(
      s"""transform($shCol,
         |  s -> cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) % $P)""".stripMargin)

  /** k minhash signatures from a base-hash array column. */
  def minhashExpr(basesCol: String, k: Int): Column = {
    val mins = (0 until k).map { i =>
      val (a, b) = seedParams(i)
      s"array_min(transform($basesCol, v -> (v * ${a}L + ${b}L) % $P))"
    }
    expr(s"array(${mins.mkString(", ")})")
  }

  /** (doc_id, sh) — tokenized + shingled projection of the corpus. */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), shingleExpr("toks", shingleN).as("sh"))

  /** Distinct candidate pairs (doc_a < doc_b) sharing ≥1 LSH bucket.
    * `numHashes` signatures, banded `rowsPerBand` each. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 1): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    LlmFunctions.registerMinHashSigs(docs.sparkSession)
    val numBands = numHashes / rowsPerBand
    val mh = shingled(docs, idCol, textCol, shingleN)
      .withColumn("bases", baseHashExpr("sh"))
      // native single-traversal form of [[minhashExpr]]
      .select(col("doc_id"), expr(s"minhash_sigs(bases, $numHashes)").as("mh"))
    val bandKey = expr(
      s"""transform(sequence(0, ${numBands - 1}),
         |  b -> concat_ws('|', transform(slice(mh, b * $rowsPerBand + 1, $rowsPerBand),
         |    x -> cast(x as string))))""".stripMargin)
    val bands = mh.select(col("doc_id"),
      posexplode(bandKey).as(Seq("band_id", "band_key")))
    val left = bands.select(col("doc_id").as("doc_a"), col("band_id"), col("band_key"))
    val right = bands.select(col("doc_id").as("doc_b"), col("band_id"), col("band_key"))
    left.join(right, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Candidate pairs with their exact shingle-set Jaccard similarity
    * (fixed-point millionths), filtered at `minJaccardFp`. The sets
    * compared are the 60-bit base hashes, not the shingle strings —
    * same Jaccard up to ~1e-5 collision mass, and integer
    * intersect/union is several times cheaper than string sets at
    * corpus scale. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 1,
      minJaccardFp: Long = 0L): DataFrame = {
    val pairs = candidatePairs(docs, idCol, textCol, shingleN, numHashes, rowsPerBand)
    val sets = shingled(docs, idCol, textCol, shingleN)
      .withColumn("bases", baseHashExpr("sh"))
      .select(col("doc_id"), array_distinct(col("bases")).as("s"))
    val jaccard = expr(
      """cast(floor(1000000.0 * cast(size(array_intersect(sa, sb)) as double)
        |  / cast(size(array_union(sa, sb)) as double)) as bigint)""".stripMargin)
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard.as("jaccard_fp"))
      .filter(col("jaccard_fp") >= minJaccardFp)
  }
}
