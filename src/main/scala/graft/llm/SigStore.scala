package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chained ON-DISK layout for the incrementally-maintained signature
  * index — the shipping shape of [[MinHashLSH.SigIndex]] once a crawl
  * maintains it at epoch cadence, and the artifact family
  * [[Artifacts.compact]] operates on (r17 verdict ask #3: the q312
  * debt policy names checkpoint/rebuild actions; this is the
  * mechanism that runs them).
  *
  * Layout under `root`:
  * {{{
  *   meta                      one line: shingleN numHashes rowsPerBand cap
  *   CURRENT                   one line: <genDir> <epochWatermark>
  *   gen-0/{bands,counts,sets[,evicted]}/   the base generation image
  *   epochs/e<13-digit>/stat/               (epoch, batch_rows, erase_rows)
  *   epochs/e<13-digit>/arrive_sets/        arrival [[MinHashLSH.shingleSets]]
  *   epochs/e<13-digit>/erase_ids/          tombstoned (doc_id) rows
  *   gen-<k>/...                            written by [[compact]]
  * }}}
  *
  * Reading ([[serve]]) resolves `CURRENT`, loads the named
  * generation, and folds every epoch ABOVE the watermark in order —
  * [[MinHashLSH.indexDeltaFromSets]] for arrival epochs (the text was
  * shingled once, at append time; replay is integer-only),
  * [[MinHashLSH.indexErase]] for erase epochs. The served index is
  * therefore exactly the fold chain the q312 meter prices: each
  * un-compacted epoch adds one fold of lineage and one directory of
  * delta files.
  *
  * [[compact]] executes the policy's `checkpoint`/`rebuild` action:
  * it materializes the served image into a FRESH generation directory
  * and atomically advances `CURRENT` past the consumed epochs. Nothing
  * is deleted — a reader holding the old generation's paths keeps
  * working (the Delta/Iceberg snapshot discipline: compaction
  * publishes, [[vacuum]] reclaims, and only vacuum is unsafe to run
  * under live readers of retired snapshots). Because every fold is
  * exact (q280/q294), the compacted image serves ROW-IDENTICALLY to
  * the chain it replaces — proven on-corpus by the compact card and
  * on planted transitions by SigStoreSpec. Tombstone mass is
  * physically dropped by the rewrite (erased rows are anti-joined out
  * of the new generation's files), and the debt meter resets by
  * construction: [[debtCard]] reads only epochs above the watermark.
  *
  * Scale shape: every frame is distributed parquet; driver-side work
  * is directory listing and two one-line pointer files (catalog-
  * scale). Appends are batch-bounded; compact's cost is one fold-
  * chain materialization — exactly the price q312 schedules it to
  * pay. */
object SigStore {

  final case class Meta(shingleN: Int, numHashes: Int, rowsPerBand: Int,
      cap: Int)

  final case class Pointer(gen: String, watermark: Long)

  /** Compaction receipt: the new generation dir, the watermark it
    * consumed through, and how many epochs it folded. */
  final case class CompactStats(gen: String, watermark: Long,
      epochsFolded: Int)

  private def write(path: java.nio.file.Path, text: String): Unit = {
    val tmp = java.nio.file.Files.createTempFile(
      path.getParent, "." + path.getFileName.toString, ".tmp")
    java.nio.file.Files.write(tmp, text.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def readLine(path: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim

  def readMeta(root: String): Meta = {
    val f = readLine(java.nio.file.Paths.get(root, "meta")).split("\\s+")
    Meta(f(0).toInt, f(1).toInt, f(2).toInt, f(3).toInt)
  }

  def readPointer(root: String): Pointer = {
    val f = readLine(java.nio.file.Paths.get(root, "CURRENT")).split("\\s+")
    Pointer(f(0), f(1).toLong)
  }

  /** Epoch numbers present under `root/epochs`, ascending. */
  def epochs(root: String): Seq[Long] = {
    val d = new java.io.File(root, "epochs")
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("e"))
      .map(_.getName.drop(1).toLong).sorted.toSeq
  }

  private def epochDir(root: String, e: Long) =
    new java.io.File(new java.io.File(root, "epochs"), f"e$e%013d")

  /** Initialize a store: build [[MinHashLSH.signatureIndex]] over
    * `docs` and publish it as generation 0 with an empty chain. */
  def init(docs: DataFrame, idCol: String, textCol: String, root: String,
      shingleN: Int, numHashes: Int, rowsPerBand: Int, cap: Int): Unit = {
    val idx = MinHashLSH.signatureIndex(docs, idCol, textCol, shingleN,
      numHashes, rowsPerBand, cap)
    new java.io.File(root).mkdirs()
    writeGen(new java.io.File(root, "gen-0").toString, idx)
    write(java.nio.file.Paths.get(root, "meta"),
      s"$shingleN $numHashes $rowsPerBand $cap\n")
    write(java.nio.file.Paths.get(root, "CURRENT"), "gen-0 0\n")
  }

  private def writeGen(genPath: String, idx: MinHashLSH.SigIndex): Unit = {
    Artifacts.saveIndexFrame(genPath + "/bands", idx.bands)
    Artifacts.saveIndexFrame(genPath + "/counts", idx.counts)
    Artifacts.saveIndexFrame(genPath + "/sets", idx.sets)
    idx.evicted.foreach(ev =>
      Artifacts.saveIndexFrame(genPath + "/evicted", ev))
  }

  private def loadGen(spark: SparkSession, root: String,
      gen: String, cap: Int): MinHashLSH.SigIndex = {
    val p = new java.io.File(root, gen).toString
    MinHashLSH.SigIndex(
      Artifacts.loadIndexFrame(spark, p + "/bands"),
      Artifacts.loadIndexFrame(spark, p + "/counts"),
      Artifacts.loadIndexFrame(spark, p + "/sets"),
      if (cap > 0) Some(Artifacts.loadIndexFrame(spark, p + "/evicted"))
      else None)
  }

  /** Append an ARRIVAL epoch: the batch is shingled once, here, and
    * its `(doc_id, s)` sets land as the epoch's delta files (replay
    * never re-tokenizes). Same disjoint-id precondition as
    * [[MinHashLSH.indexDelta]] — and because the store's whole
    * fold ≡ rebuild theorem stands on it, the default ENFORCES it:
    * a batch naming an id already in the served index fails loudly
    * BEFORE the epoch publishes (re-folding a known doc would
    * permanently inflate the bucket counts — a re-crawl erases
    * first). The check is one id-keyed semi-join against the served
    * sets per append — crawl-cadence cost; a bulk loader that has
    * already proven disjointness upstream passes
    * `verifyDisjoint = false`. The epoch publishes atomically (temp
    * dir + rename) so a concurrent [[serve]] never reads a half-
    * written epoch. Returns the epoch number. */
  def appendArrivals(arrivals: DataFrame, idCol: String, textCol: String,
      root: String, verifyDisjoint: Boolean = true): Long = {
    val m = readMeta(root)
    val spark = arrivals.sparkSession
    if (verifyDisjoint) {
      val dup = arrivals
        .select(col(graft.Names.quoted(idCol)).as("doc_id"))
        .join(serve(spark, root).sets.select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        .limit(5).collect().map(_.getLong(0))
      require(dup.isEmpty,
        s"appendArrivals: batch re-folds ids already in the index " +
          s"(${dup.mkString(", ")}${if (dup.length == 5) ", …" else ""})" +
          " — a re-crawl of a known doc erases first (indexErase), " +
          "never bare-folds")
    }
    publishEpoch(spark, root) { tmp =>
      val sets = MinHashLSH.shingleSets(arrivals, idCol, textCol,
        m.shingleN)
      Artifacts.saveIndexFrame(tmp + "/arrive_sets", sets)
      spark.read.parquet(tmp + "/arrive_sets").count()
    }
  }

  /** Append an ERASE epoch: a `(doc_id)` tombstone frame. Idempotent
    * per id at fold time ([[MinHashLSH.indexErase]]); the stat row
    * counts ids that are actually IN the served index, so the debt
    * meter prices real tombstone mass, not no-op requests. */
  def appendErases(eraseIds: DataFrame, root: String): Long = {
    val spark = eraseIds.sparkSession
    publishEpoch(spark, root, arrive = false) { tmp =>
      val ids = eraseIds.select(col("doc_id")).distinct()
      Artifacts.saveIndexFrame(tmp + "/erase_ids", ids)
      val served = serve(spark, root)
      spark.read.parquet(tmp + "/erase_ids")
        .join(served.sets.select(col("doc_id")), Seq("doc_id"),
          "left_semi").count()
    }
  }

  private def publishEpoch(spark: SparkSession, root: String,
      arrive: Boolean = true)(body: String => Long): Long = {
    val next = epochs(root).lastOption.getOrElse(0L) + 1L
    val parent = new java.io.File(root, "epochs")
    parent.mkdirs()
    val tmp = java.nio.file.Files.createTempDirectory(parent.toPath,
      ".epoch-")
    val n = body(tmp.toString)
    import spark.implicits._
    Seq((next, if (arrive) n else 0L, if (arrive) 0L else n))
      .toDF("epoch", "batch_rows", "erase_rows")
      .repartition(1).write.mode("overwrite").parquet(tmp + "/stat")
    java.nio.file.Files.move(tmp, epochDir(root, next).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** The served index: the current generation with every epoch above
    * the watermark folded on in order. Lineage depth — and therefore
    * read cost — grows with the un-compacted chain length; that is
    * the debt [[debtCard]] prices and [[compact]] resets. */
  def serve(spark: SparkSession, root: String): MinHashLSH.SigIndex = {
    val m = readMeta(root)
    val ptr = readPointer(root)
    val base = loadGen(spark, root, ptr.gen, m.cap)
    epochs(root).filter(_ > ptr.watermark).foldLeft(base) { (idx, e) =>
      val d = epochDir(root, e)
      if (new java.io.File(d, "arrive_sets").exists())
        MinHashLSH.indexDeltaFromSets(idx,
          spark.read.parquet(new java.io.File(d, "arrive_sets").toString),
          m.numHashes, m.rowsPerBand, m.cap)
      else
        MinHashLSH.indexErase(idx,
          spark.read.parquet(new java.io.File(d, "erase_ids").toString),
          m.numHashes, m.rowsPerBand, m.cap)
    }
  }

  /** The q312 policy meter over THIS store's un-compacted chain:
    * [[FoldDebt.schedule]] over the epoch stat rows above the
    * watermark. Empty chain → empty card (debt zero by construction —
    * compaction reset the meter). */
  def debtCard(spark: SparkSession, root: String,
      depthUnitPpm: Long = FoldDebt.DefaultDepthUnitPpm,
      tombWeight: Long = FoldDebt.DefaultTombWeight,
      debtBudgetPpm: Long = FoldDebt.DefaultDebtBudgetPpm,
      tombBudgetPpm: Long = FoldDebt.DefaultTombBudgetPpm): DataFrame = {
    val m = readMeta(root)
    val ptr = readPointer(root)
    val live = epochs(root).filter(_ > ptr.watermark)
    val stats =
      if (live.isEmpty)
        spark.range(0).select(col("id").as("epoch"),
          col("id").as("batch_rows"), col("id").as("erase_rows"))
      else live.map(e => spark.read.parquet(
        new java.io.File(epochDir(root, e), "stat").toString))
        .reduce(_ unionByName _)
    // the relative-mass denominators start from the compacted
    // generation's corpus size, not zero — a 100-doc delta on a
    // million-doc base must price as 0.01%, not as 100% of a chain
    // that "began" empty
    val baseLive = loadGen(spark, root, ptr.gen, m.cap)
      .sets.select(col("doc_id")).count()
    FoldDebt.schedule(stats, "epoch", "batch_rows", "erase_rows",
      depthUnitPpm, tombWeight, debtBudgetPpm, tombBudgetPpm, baseLive)
  }

  /** Execute the compaction ([[FoldDebt]]'s `checkpoint`/`rebuild`
    * action): materialize the served image as a fresh generation and
    * atomically advance `CURRENT` past the consumed epochs. A no-op
    * (current pointer returned, zero epochs folded) when the chain is
    * already empty — compact is idempotent. Retired generations and
    * consumed epoch dirs are LEFT IN PLACE for live readers;
    * [[vacuum]] reclaims them. */
  def compact(spark: SparkSession, root: String): CompactStats = {
    val ptr = readPointer(root)
    val chain = epochs(root).filter(_ > ptr.watermark)
    if (chain.isEmpty) return CompactStats(ptr.gen, ptr.watermark, 0)
    val served = serve(spark, root)
    val k = ptr.gen.stripPrefix("gen-").toInt + 1
    val gen = s"gen-$k"
    writeGen(new java.io.File(root, gen).toString, served)
    write(java.nio.file.Paths.get(root, "CURRENT"),
      s"$gen ${chain.max}\n")
    CompactStats(gen, chain.max, chain.size)
  }

  /** Reclaim retired generations and consumed epoch dirs. UNSAFE
    * under readers still holding retired snapshots — run it the way a
    * table format runs vacuum: after a retention window, never
    * concurrently with a reader of the old generation. */
  def vacuum(root: String): Unit = {
    val ptr = readPointer(root)
    val rootF = new java.io.File(root)
    Option(rootF.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen-") &&
        f.getName != ptr.gen)
      .foreach(deleteRecursively)
    epochs(root).filter(_ <= ptr.watermark)
      .foreach(e => deleteRecursively(epochDir(root, e)))
  }

  private def deleteRecursively(f: java.io.File): Unit =
    if (f.exists()) {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .foreach(deleteRecursively)
      f.delete(): Unit
    }
}
