package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The shared chained-layout machinery lifted out of SigStore (r18
  * verdict ask #7) plus the two ADVICE r18 concurrency fixes: epoch
  * slot allocation must survive a lost rename race, and `(sinkId,
  * batchId)` txn markers must make foreachBatch replays no-ops —
  * surviving compaction AND vacuum. */
class ChainedStoreSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = df(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen fine liquor jugs today"))

  private def freshRoot(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("chainedstore-spec-").toString + "/store"
    SigStore.init(base, "doc_id", "text", root, 3, 8, 1, 0)
    root
  }

  test("txn markers: append stamps, lastTxn reads, alreadyApplied " +
      "guards the replay, and compact+vacuum carry the watermark") {
    val root = freshRoot()
    assert(ChainedStore.lastTxn(root, "arrive").isEmpty)
    assert(!ChainedStore.alreadyApplied(root, "arrive", 0L))
    SigStore.appendArrivals(
      df((3L, "a fresh arrival document with brand new words here")),
      "doc_id", "text", root, txn = Some("arrive" -> 0L)): Unit
    assert(ChainedStore.lastTxn(root, "arrive") === Some(0L))
    assert(ChainedStore.alreadyApplied(root, "arrive", 0L))
    assert(!ChainedStore.alreadyApplied(root, "arrive", 1L))
    // a second sink keeps its own watermark
    SigStore.appendErases(df((99L, "x")).select(col("doc_id")), root,
      txn = Some("erase" -> 7L)): Unit
    assert(ChainedStore.lastTxn(root, "erase") === Some(7L))
    assert(ChainedStore.lastTxn(root, "arrive") === Some(0L))
    // compaction carries the markers into the new generation...
    Artifacts.compact(spark, root): Unit
    assert(ChainedStore.alreadyApplied(root, "arrive", 0L))
    assert(ChainedStore.alreadyApplied(root, "erase", 7L))
    // ...so vacuum (which deletes the consumed epoch dirs, markers
    // and all) cannot lose the idempotency watermark
    SigStore.vacuum(root)
    assert(SigStore.epochs(root).isEmpty)
    assert(ChainedStore.alreadyApplied(root, "arrive", 0L))
    assert(ChainedStore.alreadyApplied(root, "erase", 7L))
    assert(!ChainedStore.alreadyApplied(root, "erase", 8L))
  }

  test("epoch slot allocation retries past a lost rename race " +
      "instead of crashing with a half-published temp dir") {
    val root = freshRoot()
    // another writer lands slot 1 WHILE this publish's body runs —
    // the realistic window, since the body executes Spark jobs. The
    // move then fails and the allocator must take the next slot.
    val stolen = ChainedStore.epochDir(root, 1L)
    import spark.implicits._
    val e = ChainedStore.publishEpoch(spark, root, arrive = true) { tmp =>
      // a REAL winning epoch is non-empty (stat + payload), which is
      // what makes the loser's rename fail — rename(2) would happily
      // replace an empty directory
      assert(stolen.mkdirs())
      java.nio.file.Files.write(stolen.toPath.resolve("stat"),
        "occupied".getBytes("UTF-8")): Unit
      Artifacts.saveIndexFrame(tmp + "/arrive_sets",
        MinHashLSH.shingleSets(
          df((4L, "another very fresh arrival document right over here")),
          "doc_id", "text", 3))
      1L
    }
    assert(e === 2L) // lost slot 1, landed slot 2
    // clean the stranger's empty dir the way the winning JVM's real
    // epoch would occupy it, then the fold chain serves normally
    ChainedStore.deleteRecursively(stolen)
    assert(SigStore.serve(spark, root).sets.count() === 3L)
  }

  test("whitespace in a sink id is rejected before anything publishes") {
    val root = freshRoot()
    val before = SigStore.epochs(root)
    intercept[IllegalArgumentException] {
      SigStore.appendArrivals(
        df((5L, "yet another brand new fresh arrival document here")),
        "doc_id", "text", root, txn = Some("bad sink" -> 0L))
    }
    assert(SigStore.epochs(root) === before)
  }
}
