package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[ChunkStore]] — the refcounted CDC chunk index as the second
  * [[ChainedStore]] family (r18 verdict ask #7): the served chain
  * must equal a full [[Fingerprint.chunkCountIndex]] rebuild over
  * the surviving corpus, compaction must preserve the image and
  * reset the meter, and shared chunks must survive a contributor's
  * erasure with the refcount decremented, not dropped. */
class ChunkStoreSpec extends AnyFunSuite with SparkTestSession {

  Fingerprint.register(spark)

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // docs 1 and 2 share identical text (every chunk refcounted twice);
  // doc 3 is distinct; the arrival 4 duplicates 3's text
  private val base = df(
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 8),
    (2L, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 8),
    (3L, "kilo lima mike november oscar papa quebec romeo sierra tango " * 8))
  private val arrivals = df(
    (4L, "kilo lima mike november oscar papa quebec romeo sierra tango " * 8))
  // erasing 2 must decrement the shared family's refcounts to 1,
  // never drop keys doc 1 still owns
  private val erased = base.filter(col("doc_id") === 2L)

  private def finalCorpus = base.unionByName(arrivals)
    .filter(col("doc_id") =!= 2L)

  private def freshStore(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("chunkstore-spec-").toString + "/store"
    ChunkStore.init(base, "doc_id", "text", root)
    ChunkStore.appendArrivals(arrivals, "doc_id", "text", root): Unit
    ChunkStore.appendErases(erased, "doc_id", "text", root): Unit
    root
  }

  private def image(counts: DataFrame): Seq[(String, Long)] =
    counts.collect()
      .map(r => (r.getAs[String]("ck"), r.getAs[Long]("n")))
      .sorted.toSeq

  test("the served chain equals a full rebuild over the surviving " +
      "corpus, with shared chunks decremented not dropped") {
    val root = freshStore()
    val served = image(ChunkStore.serve(spark, root))
    val rebuilt = image(
      Fingerprint.chunkCountIndex(finalCorpus, "doc_id", "text"))
    assert(served === rebuilt)
    assert(served.nonEmpty)
    // the 1/2-shared family survives at refcount 2 (docs 3 + 4),
    // and doc 1's keys survive doc 2's erasure at refcount 1
    assert(served.exists(_._2 === 2L))
    assert(served.exists(_._2 === 1L))
  }

  test("compact preserves the image, resets the meter, keeps epoch " +
      "numbering, and vacuum leaves a serving store") {
    val root = freshStore()
    val before = image(ChunkStore.serve(spark, root))
    assert(ChunkStore.debtCard(spark, root).count() === 2L)
    val stats = ChunkStore.compact(spark, root)
    assert(stats.gen === "gen-1" && stats.epochsFolded === 2)
    assert(image(ChunkStore.serve(spark, root)) === before)
    assert(ChunkStore.debtCard(spark, root).count() === 0L)
    // idempotent
    assert(ChunkStore.compact(spark, root).epochsFolded === 0)
    ChunkStore.vacuum(root)
    assert(image(ChunkStore.serve(spark, root)) === before)
    // appends continue; the meter prices against the compacted base
    ChunkStore.appendArrivals(
      df((9L, "whiskey xray yankee zulu uniform victor whiskey tango " * 8)),
      "doc_id", "text", root): Unit
    val card = ChunkStore.debtCard(spark, root).collect()
    assert(card.length === 1 && card.head.getAs[Long]("epoch") === 3L)
  }

  test("erase stat rows price only keys actually in the served index") {
    val root = freshStore()
    // a never-added doc's chunks hit nothing → erase_rows 0
    ChunkStore.appendErases(
      df((99L, "totally absent text never folded into this store at all")),
      "doc_id", "text", root): Unit
    val card = ChunkStore.debtCard(spark, root)
      .orderBy(col("epoch")).collect()
    assert(card.last.getAs[Long]("erase_rows") === 0L)
    // the real erase epoch priced doc 2's in-index keys
    assert(card(1).getAs[Long]("erase_rows") > 0L)
  }
}
