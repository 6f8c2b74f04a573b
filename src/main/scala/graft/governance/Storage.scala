package graft.governance

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet storage-footprint audit — the "what does column pruning
  * actually buy" card a 100 TB table owner reads before tuning
  * `ReadSchema`: per column, compressed/uncompressed bytes and the
  * column's share of the file, straight from the parquet FOOTER. No
  * data pages are read — footers are O(columns × row-groups)
  * metadata, so the driver-side loop is the honest shape (the same
  * argument as the governance catalog facade: catalog-scale, never
  * corpus-scale). For a many-file 100 TB table the same footer read
  * distributes as a `mapPartitions` over the file list; the per-file
  * work below is unchanged.
  *
  * Every number is copied verbatim from footer fields other engines
  * parse identically (DuckDB's `parquet_metadata()` exposes the same
  * `total_compressed_size` / `total_uncompressed_size` /
  * `num_values`). The driver's oracle session only sees table VIEWS
  * (and `parquet_metadata` takes constant paths only), so this
  * operator is certified by its ScalaTest invariants instead of the
  * SQL oracle — the one extension-layer component in that position
  * alongside the JDBC sink. */
object Storage {

  /** One row per leaf column of `<dir>/<table>.parquet`:
    * `(column_name, n_values, compressed_bytes, uncompressed_bytes,
    * share_ppm)` — share is of total compressed bytes, in exact ppm. */
  def parquetFootprint(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    // the session's Hadoop conf, not a bare Configuration — the
    // operator must reach every filesystem the session can (S3A
    // credentials, fs.defaultFS, ...)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(s"$dir/$table.parquet"),
      spark.sessionState.newHadoopConf()))
    val perCol =
      try {
        reader.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .groupBy(_.getPath.toDotString)
          .map { case (name, chunks) =>
            (name,
              chunks.map(_.getValueCount).sum,
              chunks.map(_.getTotalSize).sum,
              chunks.map(_.getTotalUncompressedSize).sum)
          }.toSeq
      } finally reader.close()
    val totalComp = perCol.map(_._3).sum
    import spark.implicits._
    perCol.map { case (name, nv, comp, uncomp) =>
      (name, nv, comp, uncomp,
        if (totalComp == 0L) 0L
        else (BigInt(comp) * 1000000 / totalComp).toLong)
    }.toDF("column_name", "n_values", "compressed_bytes",
      "uncompressed_bytes", "share_ppm")
      .orderBy("column_name")
  }

  /** Recursive (data files, bytes) footprint of a directory tree —
    * the fragmentation primitive the fold-debt calibration reads
    * ([[graft.llm.FoldDebt.calibrationCard]]): each delta-epoch
    * directory's footprint IS the file-count/byte cost that fold
    * added, and the generation directory is the base it amortizes
    * against. Writer-control files (`_SUCCESS`, `.crc` sidecars,
    * dot-temp files) are excluded — readers never open them, so they
    * are not read-amplification. Driver-side walk, catalog-scale (an
    * artifact dir holds tens to hundreds of files; for an object
    * store the same walk is one LIST call per prefix). */
  def dirFootprint(path: String): (Long, Long) = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .filterNot(_.getName.startsWith("."))
          .map(walk).foldLeft((0L, 0L)) { case ((n, b), (n2, b2)) =>
            (n + n2, b + b2)
          }
      else if (f.getName.startsWith("_") || f.getName.startsWith("."))
        (0L, 0L)
      else (1L, f.length())
    walk(new java.io.File(path))
  }
}
