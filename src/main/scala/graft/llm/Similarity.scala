package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over `array<float>` embedding columns.
  *
  * Determinism: scores are per-element fixed-point —
  * `floor(a[i]*b[i]*1e6)` per dimension, then an integer sum — so the
  * result is associative and identical under any partitioning or
  * evaluation order (a plain float dot product differs in the last ulp
  * between engines and between shuffle layouts).
  *
  * Scale paths:
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the
  *    full corpus — exact, one scan, no shuffle of the corpus; right
  *    when |queries| is small.
  *  - [[annTopK]]: sign-random-projection LSH — each vector gets an
  *    8-bit bucket from the signs of 8 fixed hyperplane projections;
  *    search joins on bucket equality, so the corpus is shuffled once
  *    by a 1-byte key and only same-bucket candidates are scored.
  *    Recall < 1 by construction; widen with multi-probe (flip one
  *    sign bit) if needed.
  */
object Similarity {

  /** Associative fixed-point dot product of two array<float> columns —
    * engine-portable higher-order-function form (used where the
    * session may not have graft functions registered; the DuckDB
    * oracle mirrors this arithmetic exactly). */
  def dotFpExpr(a: String, b: String): Column =
    expr(
      s"""cast(aggregate(zip_with($a, $b,
         |  (x, y) -> cast(floor(cast(x as double) * cast(y as double) * 1000000.0) as bigint)),
         |  0L, (acc, v) -> acc + v) as bigint)""".stripMargin)

  /** Same arithmetic as a native codegen expression ([[expressions.DotFpExpr]])
    * — the hot-path form used by the top-k operators. Requires
    * [[LlmFunctions.registerAll]] (done by the operators themselves). */
  def dotFpNative(a: String, b: String): Column = expr(s"dot_fp($a, $b)")

  /** Deterministic integer hyperplanes for the sign-LSH bucketing —
    * weights in [-3, 3] from an LCG over (plane, dim). Exposed so the
    * DuckDB oracle can embed the identical literals. */
  val NumPlanes = 8
  def planeWeights(dim: Int): Seq[Seq[Int]] =
    (0 until NumPlanes).map { p =>
      (0 until dim).map { i =>
        ((((p.toLong * dim + i) * 1103515245L + 12345L) % 7 + 7) % 7 - 3).toInt
      }
    }

  /** 8-bit LSH bucket id of an embedding column: the sign pattern of
    * the fixed-point projections onto the 8 hyperplanes, each computed
    * by the native codegen `dot_fp` against a double-literal plane
    * (requires [[LlmFunctions.registerDotFp]] on the session — the
    * top-k operators register it themselves). */
  def bucketExpr(embCol: String, dim: Int): Column =
    planeWeights(dim).zipWithIndex
      .map { case (w, p) =>
        val plane = w.map(v => s"${v.toDouble}D").mkString("array(", ", ", ")")
        when(expr(s"dot_fp($embCol, $plane)") > 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Exact top-k: every query row scored against every candidate row.
    * `queries` must be small — it is broadcast. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    LlmFunctions.registerDotFp(queries.sparkSession)
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = q.crossJoin(candidates.select(col("vec_id"), col("embedding").as("ce")))
      .select(col("query_id"), col("vec_id"), dotFpNative("qe", "ce").as("dot_fp"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot_fp").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket, then scored exactly. */
  /** Embedding-cosine near-duplicate pairs (unit vectors → dot =
    * cosine): multi-probe sign-LSH — each vector probes its own bucket
    * plus the 8 buckets at Hamming distance 1, candidates sharing a
    * probe are scored exactly with `dot_fp`, and pairs at or above
    * `minDotFp` survive. All-pairs work is confined to buckets
    * (corpus shuffles once on the bucket key; probes only multiply
    * the small exploded key stream by 9, never the payload). */
  def embeddingNearDupPairs(vectors: DataFrame, minDotFp: Long, dim: Int): DataFrame = {
    LlmFunctions.registerDotFp(vectors.sparkSession)
    // The narrow (vec_id, bucket) projection is consumed twice (probe
    // stream + bucket side of the candidate join) — persist it so the
    // 8-plane projection runs once per vector. Only the 16-byte rows
    // are cached, never the embedding payload; the payload joins below
    // re-read the source, where parquet pruning makes the second scan
    // cheap and the join stays inside one codegen stage.
    val b = vectors.select(col("vec_id"),
      bucketExpr("embedding", dim).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = b.select(col("vec_id").as("vec_a"),
      explode(expr(
        s"""transform(sequence(0, $NumPlanes),
           |  j -> CASE WHEN j = 0 THEN bucket
           |       ELSE bucket ^ shiftleft(cast(1 as bigint), j - 1) END)""".stripMargin))
        .as("probe"))
    val pairs = probes
      .join(b.select(col("vec_id").as("vec_b"), col("bucket")),
        col("probe") === col("bucket") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    pairs
      .join(vectors.select(col("vec_id").as("vec_a"), col("embedding").as("ea")), "vec_a")
      .join(vectors.select(col("vec_id").as("vec_b"), col("embedding").as("eb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), dotFpNative("ea", "eb").as("dot_fp"))
      .filter(col("dot_fp") >= minDotFp)
  }

  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int): DataFrame = {
    LlmFunctions.registerDotFp(queries.sparkSession)
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("bucket", bucketExpr("embedding", dim))
    val q = broadcast(withBucket(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket")))
    val c = withBucket(candidates)
      .select(col("vec_id"), col("embedding").as("ce"), col("bucket"))
    val scored = q.join(c, "bucket")
      .select(col("query_id"), col("vec_id"), dotFpNative("qe", "ce").as("dot_fp"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot_fp").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
