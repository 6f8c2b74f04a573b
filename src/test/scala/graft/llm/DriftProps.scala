package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the drift monitor's pivoted ingest spelling equals the
  * per-cell card on ARBITRARY fixtures whose observed values stay
  * within the configured list plus at most one unseen value — the
  * q289 equivalence theorem under random group counts, mixes, empty
  * sides, and arrival-only/baseline-only groups (the pivot's
  * documented difference, zero-arrival silence, is normalized out by
  * restricting the compare to groups with arrivals). */
object DriftProps extends Properties("Drift") with SparkTestSession {

  private val Cells = Seq("en", "de", "fr")

  private case class Fixture(arr: List[(String, String)],
      cor: List[(String, String)])

  private val fixtureGen: Gen[Fixture] = {
    val group = Gen.oneOf("s0", "s1", "s2")
    // values from the list + ONE unseen ("xx") + null
    val cell = Gen.frequency(
      5 -> Gen.oneOf(Cells),
      1 -> Gen.const("xx"),
      1 -> Gen.const(null.asInstanceOf[String]))
    val row = for { g <- group; c <- cell } yield (g, c)
    for {
      nA <- Gen.choose(0, 30)
      nC <- Gen.choose(0, 40)
      arr <- Gen.listOfN(nA, row)
      cor <- Gen.listOfN(nC, row)
    } yield Fixture(arr, cor)
  }

  property("chiSquarePivot == chiSquareCard on groups with arrivals") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      val arr = f.arr.toDF("src", "cell")
      val cor = f.cor.toDF("src", "cell")
      def shape(d: org.apache.spark.sql.DataFrame) = d.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
        .toSet
      // "(null)" is an outside-the-list value too: it and "xx" must not BOTH
      // appear in one group for the lump to stay lossless — filter
      // such draws to the claimed domain
      val groupsWithBoth = (f.arr ++ f.cor).groupBy(_._1).collect {
        case (g, rows) if rows.exists(_._2 == null) &&
          rows.exists(_._2 == "xx") => g
      }.toSet
      if (groupsWithBoth.nonEmpty) true
      else {
        val arrGroups = f.arr.map(_._1).toSet
        val pivot = shape(
          Drift.chiSquarePivot(arr, cor, "src", "cell", Cells))
        val card = shape(Drift.chiSquareCard(arr, cor, "src", "cell"))
          .filter(r => arrGroups.contains(r._1))
        pivot == card
      }
    }
}
