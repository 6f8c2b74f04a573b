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
    val sets = MinHashLSH.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets") { sets.select(sum(size(col("s")))).collect()(0).getLong(0) }
    val mh = sets.select(col("doc_id"), expr("minhash_sigs(s, 8)").as("mh"))
    time("+minhash_sigs") { mh.count() }
    val bandKey = expr(
      "transform(sequence(0, 7), b -> concat_ws('|', transform(slice(mh, b + 1, 1), x -> cast(x as string))))")
    val bands = mh.select(col("doc_id"), posexplode(bandKey).as(Seq("band_id", "band_key")))
    time("+bands") { bands.count() }
    val buckets = bands.groupBy(col("band_id"), col("band_key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("+buckets") { buckets.count() }
    val exploded = buckets.select(explode(expr(MinHashLSH.upperTriangleSql("ids",
        (a, b) => s"struct($a AS doc_a, $b AS doc_b)"))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
    time("+explodePairs") { exploded.count() }
    time("+distinct") { exploded.distinct().count() }
    time("candidatePairs") {
      MinHashLSH.candidatePairs(docs, "doc_id", "text").count()
    }
    time("nearDupPairs(full)") {
      MinHashLSH.nearDupPairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
