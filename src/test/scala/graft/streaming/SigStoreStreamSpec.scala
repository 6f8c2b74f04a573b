package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.llm.{MinHashLSH, SigStore}

/** Top-level so Spark can derive an Encoder. */
case class StoreDoc(doc_id: Long, text: String)
case class StoreTomb(doc_id: Long)

/** [[Streams.storeIngest]]/[[Streams.storeEraseIngest]] — the q312 →
  * q315 loop closed live: micro-batches append delta epochs to the
  * chained store, the meter re-reads the store's own chain, and a
  * crossed budget EXECUTES compaction mid-stream. Stream == batch:
  * the served index after the stream equals a full rebuild over
  * everything fed (minus everything erased). */
class SigStoreStreamSpec extends AnyFunSuite with SparkTestSession {

  private val ShingleN = 3
  private val NumHashes = 8
  private val Cap = 3

  private def doc(i: Long, t: String) = StoreDoc(i, t)

  private val baseDocs = Seq(
    doc(1L, "the quick brown fox jumps over the lazy dog tonight"),
    doc(2L, "the quick brown fox jumps over the lazy dog tonight"),
    doc(3L, "pack my box with five dozen fine liquor jugs today"),
    doc(9L, "completely unrelated fresh document with new words inside"))

  private val arrivalBatches = Seq(
    Seq(doc(10L, "pack my box with five dozen fine liquor jugs today"),
      doc(11L, "a genuinely new document about something else entirely")),
    Seq(doc(12L, "standard boilerplate legal disclaimer text block here now"),
      doc(13L, "standard boilerplate legal disclaimer text block here now")),
    Seq(doc(14L, "one more late arrival closing out the crawl window")))

  private def image(idx: MinHashLSH.SigIndex) = (
    idx.bands.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Int]("band_id"), r.getAs[String]("band_key")))
      .sorted.toSeq,
    idx.sets.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq)

  private def freshRoot(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("sigstore-stream-").toString + "/store"
    import spark.implicits._
    SigStore.init(baseDocs.toDF(), "doc_id", "text", root,
      ShingleN, NumHashes, 1, Cap)
    root
  }

  test("storeIngest appends one epoch per micro-batch, fires " +
      "compaction when the meter crosses, and serves == rebuild") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val input = MemoryStream[StoreDoc]
    // a budget the depth charge alone crosses immediately: every
    // epoch's verdict is checkpoint, so compaction MUST fire live
    val q = Streams.storeIngest(input.toDF(), "doc_id", "text", root,
        debtBudgetPpm = 100000L)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("sigstore-stream-ckpt-").toString)
      .start()
    try {
      for (b <- arrivalBatches) {
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // compaction fired mid-stream: the pointer left gen-0 behind
    val ptr = SigStore.readPointer(root)
    assert(ptr.gen != "gen-0", "the crossed budget must EXECUTE compact")
    // meter reset: fewer live epochs than appended
    assert(SigStore.debtCard(spark, root).count() <
      arrivalBatches.size.toLong)
    // stream == batch: served index equals the full rebuild
    val all = (baseDocs ++ arrivalBatches.flatten).toDF()
    assert(image(SigStore.serve(spark, root)) ===
      image(MinHashLSH.signatureIndex(all, "doc_id", "text",
        ShingleN, NumHashes, 1, Cap)))
  }

  test("a replayed batch is a no-op, not a wedge: the (sinkId, " +
      "batchId) txn marker survives restart (ADVICE r18)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val batch = arrivalBatches.head
    def run(data: Seq[StoreDoc]*): Unit = {
      val input = MemoryStream[StoreDoc]
      val q = Streams.storeIngest(input.toDF(), "doc_id", "text", root)
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("sigstore-replay-ckpt-").toString)
        .start()
      try for (b <- data) { input.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }
    run(batch)
    val epochsAfterFirst = SigStore.epochs(root)
    // the crash-replay shape: a fresh checkpoint re-delivers batchId 0
    // with the SAME rows — pre-fix this re-appended the ids and the
    // disjoint-arrival guard permanently wedged the restarted stream;
    // now the txn marker makes it a no-op...
    run(batch, arrivalBatches(1))
    // ...while the genuinely new batch (batchId 1) still lands
    assert(SigStore.epochs(root).size === epochsAfterFirst.size + 1)
    val all = (baseDocs ++ batch ++ arrivalBatches(1)).toDF()
    assert(image(SigStore.serve(spark, root)) ===
      image(MinHashLSH.signatureIndex(all, "doc_id", "text",
        ShingleN, NumHashes, 1, Cap)))
  }

  test("storeEraseIngest lands erase epochs and the rebuild arm " +
      "physically reclaims the dead rows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    // tombstone budget of 1 ppm: any real erase crosses it → rebuild
    val input = MemoryStream[StoreTomb]
    val q = Streams.storeEraseIngest(input.toDF(), root,
        tombBudgetPpm = 1L)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("sigstore-erase-ckpt-").toString)
      .start()
    try {
      input.addData(StoreTomb(2L))
      q.processAllAvailable()
    } finally q.stop()
    val ptr = SigStore.readPointer(root)
    assert(ptr.gen != "gen-0", "a crossed tombstone budget must rebuild")
    // the erased doc is gone from the CURRENT generation's files
    assert(spark.read.parquet(s"$root/${ptr.gen}/sets")
      .filter(col("doc_id") === 2L).count() === 0L)
    val survivors = baseDocs.filterNot(_.doc_id == 2L).toDF()
    assert(image(SigStore.serve(spark, root)) ===
      image(MinHashLSH.signatureIndex(survivors, "doc_id", "text",
        ShingleN, NumHashes, 1, Cap)))
  }
}
