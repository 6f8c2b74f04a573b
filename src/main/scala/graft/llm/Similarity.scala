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

  /** Associative fixed-point dot product of two array<float> columns. */
  def dotFpExpr(a: String, b: String): Column =
    expr(
      s"""cast(aggregate(zip_with($a, $b,
         |  (x, y) -> cast(floor(cast(x as double) * cast(y as double) * 1000000.0) as bigint)),
         |  0L, (acc, v) -> acc + v) as bigint)""".stripMargin)

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

  /** Per-element fixed-point projection of a float embedding. */
  def fixedPointExpr(embCol: String): Column =
    expr(s"transform($embCol, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))")

  /** Signed projection of an already-fixed-point embedding column onto
    * plane `p` — integer math end to end. */
  private def planeDot(efpCol: String, weights: Seq[Int]): Column =
    expr(
      s"""cast(aggregate(zip_with($efpCol,
         |  array(${weights.mkString(", ")}),
         |  (v, w) -> v * cast(w as bigint)),
         |  0L, (acc, v) -> acc + v) as bigint)""".stripMargin)

  /** 8-bit LSH bucket id from a fixed-point embedding column
    * (materialize [[fixedPointExpr]] once — the 8 plane projections
    * reuse it instead of re-deriving it per plane). */
  def bucketFromFpExpr(efpCol: String, dim: Int): Column =
    planeWeights(dim).zipWithIndex
      .map { case (w, p) => when(planeDot(efpCol, w) > 0, lit(1L << p)).otherwise(lit(0L)) }
      .reduce(_ + _)

  /** Convenience: bucket id straight from the float embedding. */
  def bucketExpr(embCol: String, dim: Int): Column = {
    val efp = s"transform($embCol, x -> cast(floor(cast(x as double) * 1000000.0) as bigint))"
    bucketFromFpExpr(efp, dim)
  }

  /** Exact top-k: every query row scored against every candidate row.
    * `queries` must be small — it is broadcast. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = q.crossJoin(candidates.select(col("vec_id"), col("embedding").as("ce")))
      .select(col("query_id"), col("vec_id"), dotFpExpr("qe", "ce").as("dot_fp"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot_fp").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket, then scored exactly. */
  def annTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int): DataFrame = {
    def withBucket(df: DataFrame): DataFrame = df
      .withColumn("efp", fixedPointExpr("embedding"))
      .withColumn("bucket", bucketFromFpExpr("efp", dim))
      .drop("efp")
    val q = broadcast(withBucket(queries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket")))
    val c = withBucket(candidates)
      .select(col("vec_id"), col("embedding").as("ce"), col("bucket"))
    val scored = q.join(c, "bucket")
      .select(col("query_id"), col("vec_id"), dotFpExpr("qe", "ce").as("dot_fp"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot_fp").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
