package graft
import org.apache.spark.sql.functions._
import graft.llm.{LlmFunctions, Similarity}
object ProfileQ29 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LlmFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s   rows=$n")
    }
    val emb = Tables.embeddings(spark, dir)
    time("count") { emb.count() }
    val b = emb.select(col("vec_id"), Similarity.bucketExpr("embedding", 64).as("bucket"))
    time("buckets") { b.count() }
    val probes = b.select(col("vec_id").as("vec_a"),
      explode(expr(
        """transform(sequence(0, 8),
          |  j -> CASE WHEN j = 0 THEN bucket
          |       ELSE bucket ^ shiftleft(cast(1 as bigint), j - 1) END)""".stripMargin))
        .as("probe"))
    time("probes") { probes.count() }
    val pairs = probes
      .join(b.select(col("vec_id").as("vec_b"), col("bucket")),
        col("probe") === col("bucket") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b")).distinct()
    time("pairs+distinct") { pairs.count() }
    time("full") {
      Similarity.embeddingNearDupPairs(emb, 350000L, 64).count()
    }
    spark.stop()
  }
}
