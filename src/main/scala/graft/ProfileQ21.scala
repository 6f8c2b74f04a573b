package graft
import org.apache.spark.sql.functions._
import graft.llm.{MinHashLSH, TextAnalysis, LlmFunctions}
object ProfileQ21 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LlmFunctions.registerAll(spark)
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s   rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    time("tokens+shingles") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), MinHashLSH.shingleExpr("toks", 3).as("sh"))
        .select(sum(size(col("sh")))).collect()(0).getLong(0)
    }
    time("+bases(md5)") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), MinHashLSH.shingleExpr("toks", 3).as("sh"))
        .withColumn("bases", MinHashLSH.baseHashExpr("sh"))
        .select(sum(size(col("bases")))).collect()(0).getLong(0)
    }
    time("+minhash_sigs") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), MinHashLSH.shingleExpr("toks", 3).as("sh"))
        .withColumn("bases", MinHashLSH.baseHashExpr("sh"))
        .select(col("doc_id"), expr("minhash_sigs(bases, 8)").as("mh"))
        .select(sum(size(col("mh")))).collect()(0).getLong(0)
    }
    time("candidatePairs") {
      MinHashLSH.candidatePairs(docs, "doc_id", "text").count()
    }
    time("nearDupPairs(full)") {
      MinHashLSH.nearDupPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
