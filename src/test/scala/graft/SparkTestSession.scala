package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — one per JVM (sbt forks one test
  * JVM), built through `Sessions.builder` so tests run with exactly the
  * semantics of the Verify/Bench entry points.
  */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}

object SparkTestSession {
  lazy val session: SparkSession = {
    val s = Sessions.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
