package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the classifier's algebraic contracts on arbitrary
  * corpora — delta-training is exact (counts form a monoid), and
  * scoring is invariant under corpus order/partitioning (no
  * positional state anywhere in the pipeline). */
object NbClassifierProps extends Properties("NbClassifier") with SparkTestSession {

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val docGen: Gen[(String, String)] = for {
    n <- Gen.choose(0, 8)
    ws <- Gen.listOfN(n, word)
    lab <- Gen.oneOf("x", "y", "z")
  } yield (ws.mkString(" "), lab)

  private val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(1, 24)
    ds <- Gen.listOfN(n, docGen)
  } yield ds.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }

  property("mergeCounts(train(A), train(B)) == train(A ++ B)") =
    forAll(corpusGen, corpusGen) { (a, b0) =>
      import spark.implicits._
      // disjoint ids so the union is a legal corpus
      val b = b0.map { case (id, t, l) => (id + 1000L, t, l) }
      def cnt(df: org.apache.spark.sql.DataFrame) =
        NbClassifier.train(df, "text", "lang").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val merged = NbClassifier.mergeCounts(
          NbClassifier.train(a.toDF("doc_id", "text", "lang"), "text", "lang"),
          NbClassifier.train(b.toDF("doc_id", "text", "lang"), "text", "lang"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      merged == cnt((a ++ b).toDF("doc_id", "text", "lang"))
    }

  property("predict is invariant under corpus order and partitioning") =
    forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text", "lang")
      val counts = NbClassifier.train(df, "text", "lang")
      def p(d: org.apache.spark.sql.DataFrame) =
        NbClassifier.predict(d, counts, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3))).toSet
      p(df) == p(docs.reverse.toDF("doc_id", "text", "lang").repartition(7))
    }
}
