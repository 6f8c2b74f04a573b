package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far did each user get through a
  * required event sequence (stage₁ → stage₂ → …), where each stage
  * must occur STRICTLY AFTER the previous one was first reached. The
  * conversion question every event pipeline answers — and one that
  * sessionization (q11) and windowed counts (q9) do not: ordering
  * across event types matters, not volume.
  *
  * Per stage the computation is one filtered aggregation — the
  * earliest stage-k event per user after that user's stage-(k−1)
  * time — joined user-keyed onto the previous frontier. No per-user
  * event sort, no window over the raw stream; k stages cost k
  * aggregations + k joins on the user key, each frontier one row per
  * surviving user. Integer event-time microseconds end to end.
  */
object Funnel {

  /** `(user, <stage>_us ... , stage)` for every user with ≥1 event of
    * any type: nullable first-reach time per stage and the count of
    * stages reached. `stages` maps stage name → the value of
    * `typeCol` that advances it. */
  def reach(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[(String, String)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    require(stages.map(_._1).distinct.size == stages.size,
      "stage names must be unique")
    val q = graft.Names.quoted _
    val base = events.select(col(q(userCol)).as("user"),
      col(q(typeCol)).as("et"), col(q(tsCol)).as("us"))
    val users = base.select(col("user")).distinct()
    var out = users
    var prev: Option[String] = None
    stages.foreach { case (name, etVal) =>
      val cName = s"${name}_us"
      val hits = base.filter(col("et") === etVal && col("us").isNotNull)
      val frontier = prev match {
        case None =>
          hits.groupBy(col("user")).agg(min(col("us")).as(cName))
        case Some(p) =>
          hits.join(out.filter(col(p).isNotNull)
              .select(col("user"), col(p).as("_prev")), Seq("user"))
            .filter(col("us") > col("_prev"))
            .groupBy(col("user")).agg(min(col("us")).as(cName))
      }
      out = out.join(frontier, Seq("user"), "left")
      prev = Some(cName)
    }
    val stageCount = stages.map { case (name, _) =>
      when(col(s"${name}_us").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    out.withColumn("stage", stageCount)
  }
}
