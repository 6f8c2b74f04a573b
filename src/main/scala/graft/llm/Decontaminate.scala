package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share
  * winnowed rolling-hash fingerprints ([[Fingerprint]]) with any
  * evaluation document — the standard check that benchmark text has
  * not leaked into a training corpus (shifted or lightly edited
  * copies still collide on most fingerprints, where whole-document
  * hashing misses them).
  *
  * Scale shape: fingerprints are row-local; the only join is an
  * equi-join of exploded 8-byte fingerprint values against the
  * (distinct, typically much smaller) eval fingerprint set — shuffle
  * keys are hashes, never text. Contamination is reported as
  * fixed-point millionths of the training doc's distinct fingerprints
  * found in the eval set (the MOSS containment measure, directional:
  * train ⊆ eval).
  */
object Decontaminate {

  /** (doc_id, n_fps, n_shared, contamination_fp) for every training
    * doc with at least one fingerprint shared with `eval`. */
  def contaminated(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    Fingerprint.register(train.sparkSession)
    def fps(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      expr(s"array_distinct(doc_fingerprints($textCol))").as("fps"))
    val evalFps = fps(eval).select(explode(col("fps")).as("fp")).distinct()
    fps(train)
      .select(col("doc_id"), size(col("fps")).cast("bigint").as("n_fps"),
        explode(col("fps")).as("fp"))
      .join(evalFps, "fp")
      .groupBy(col("doc_id"))
      .agg(max(col("n_fps")).as("n_fps"), count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_fps"), col("n_shared"),
        expr("cast(floor(1000000.0 * cast(n_shared as double) / cast(n_fps as double)) as bigint)")
          .as("contamination_fp"))
  }
}
