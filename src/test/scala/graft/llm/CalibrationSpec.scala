package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[FoldDebt.calibrationCard]]: modeled debt next to measured
  * storage fragmentation on a real chained store. Filesystem-measured
  * — certified here instead of the SQL oracle (the Storage
  * position): the measured columns must equal an independent
  * recomputation from the directory tree, the modeled columns must
  * equal [[SigStore.debtCard]] row for row, and compaction must reset
  * both the meter AND the measured base. */
class CalibrationSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = df(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "pack my box with five dozen fine liquor jugs today"),
    (9L, "completely unrelated fresh document with new words inside"))

  private def freshStore(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("calib-spec-").toString + "/store"
    SigStore.init(base, "doc_id", "text", root, 3, 8, 1, 3)
    SigStore.appendArrivals(
      df((4L, "pack my box with five dozen fine liquor jugs today")),
      "doc_id", "text", root): Unit
    SigStore.appendErases({
      import spark.implicits._
      Seq(2L).toDF("doc_id")
    }, root): Unit
    root
  }

  /** Independent footprint recomputation — plain java.io walk with
    * the same control-file exclusions. */
  private def footprint(path: String): (Long, Long) = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .filterNot(_.getName.startsWith(".")).toSeq.flatMap(walk)
      else if (f.getName.startsWith("_") || f.getName.startsWith("."))
        Seq.empty
      else Seq(f)
    val fs = walk(new java.io.File(path))
    (fs.size.toLong, fs.map(_.length()).sum)
  }

  test("measured columns equal an independent walk and the exact " +
      "ppm arithmetic; modeled columns equal the debt card") {
    val root = freshStore()
    val card = FoldDebt.calibrationCard(spark, root)
      .orderBy(col("epoch")).collect()
    assert(card.length === 2)
    val (bf, bb) = footprint(s"$root/gen-0")
    for (r <- card) {
      val e = r.getAs[Long]("epoch")
      val (nf, nb) = footprint(f"$root/epochs/e$e%013d")
      assert(r.getAs[Long]("n_files") === nf)
      assert(r.getAs[Long]("n_bytes") === nb)
      assert(r.getAs[Long]("base_files") === bf)
      assert(r.getAs[Long]("base_bytes") === bb)
      assert(r.getAs[Long]("measured_file_ppm") ===
        nf * 1000000L / math.max(bf, 1L))
      assert(r.getAs[Long]("measured_byte_ppm") ===
        nb * 1000000L / math.max(bb, 1L))
      assert(nf > 0L && nb > 0L,
        "every fold must add measurable fragmentation — that is the " +
          "depth charge's physical basis")
    }
    val modeled = SigStore.debtCard(spark, root)
      .orderBy(col("epoch")).collect()
    for ((c, m) <- card.zip(modeled);
        f <- Seq("batch_rows", "erase_rows", "live_rows", "debt_ppm",
          "cum_debt_ppm", "debt_gen", "cum_tomb_ppm", "tomb_gen",
          "chain_depth"))
      assert(c.getAs[Long](f) === m.getAs[Long](f),
        s"modeled column $f must ride the ONE debt meter")
  }

  test("deriveDepthUnitPpm is the mean measured file share, and an " +
      "empty chain derives nothing rather than lore") {
    val root = freshStore()
    val card = FoldDebt.calibrationCard(spark, root)
    val rows = card.orderBy(col("epoch")).collect()
    val expected = rows.map(_.getAs[Long]("measured_file_ppm")).sum /
      rows.length
    assert(FoldDebt.deriveDepthUnitPpm(card) === Some(expected))
    // measured basis on this fixture store: each delta epoch appends
    // its files against the generation — the derived constant is the
    // same order as the modeled 125000 (1/8-budget) charge, which is
    // why the default stands; deployments calibrate with this helper
    assert(expected > 0L)
    Artifacts.compact(spark, root): Unit
    assert(FoldDebt.deriveDepthUnitPpm(
      FoldDebt.calibrationCard(spark, root)) === None)
  }

  test("compaction resets the measured base along with the meter") {
    val root = freshStore()
    Artifacts.compact(spark, root): Unit
    assert(FoldDebt.calibrationCard(spark, root).count() === 0L)
    SigStore.appendArrivals(
      df((30L, "a new document that arrives after the compaction ran")),
      "doc_id", "text", root): Unit
    val card = FoldDebt.calibrationCard(spark, root).collect()
    assert(card.length === 1)
    val (bf1, bb1) = footprint(s"$root/gen-1")
    assert(card.head.getAs[Long]("base_files") === bf1)
    assert(card.head.getAs[Long]("base_bytes") === bb1)
  }
}
