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
}
