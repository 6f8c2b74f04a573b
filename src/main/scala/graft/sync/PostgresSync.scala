package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Spark → PostgreSQL/PostGIS synchronization — the engine's
  * equivalent of the reference's `PostgresSyncManager`
  * (`/root/reference/src/dask_felleskomponenter/felleskomponenter/sync_df_to_pgdb.py:10-291`).
  *
  * Two-phase design preserved: (1) executors write the DataFrame to a
  * staging table over JDBC (overwrite + truncate — idempotent,
  * parallelism = input partitions); (2) the driver promotes staging to
  * target inside Postgres with either a transactional snapshot
  * (`:204-220`) or a CDC-style MERGE driven by an `update_type` column
  * (`:222-252`), converting WKB geometry columns via
  * `ST_GeomFromWKB(col, srid)` (`:198-202`).
  *
  * All SQL text generation is pure ([[PostgresSyncSql]]) and
  * golden-tested offline; the environment validation and the psycopg
  * connection are behind injection points (`env`/`fileExists`/
  * `runSql`) since no live Postgres or Databricks runtime exists here.
  */
final case class PostgresTargetConfig(
    host: String,
    dbname: String,
    user: String,
    password: String,
    stagingTable: String,
    targetTable: String,
    updateTypeCol: String = "update_type",
    srid: Int = 0)

/** Pure SQL-text generation (reference `:198-252`). */
object PostgresSyncSql {

  /** Geometry columns are wrapped in ST_GeomFromWKB at read-from-
    * staging time (`:198-202`). */
  def fmtCol(colName: String, tableName: String, geometryCols: Seq[String],
      srid: Int): String = {
    val colRef = s"""$tableName."$colName""""
    if (geometryCols.contains(colName)) s"ST_GeomFromWKB($colRef, $srid)" else colRef
  }

  /** Transactional truncate+insert promotion (`:204-220`). */
  def snapshotSql(cfg: PostgresTargetConfig, cols: Seq[String],
      geomCols: Seq[String]): String = {
    val colsList = cols.map(c => s""""$c"""").mkString(", ")
    val selList = cols.map(fmtCol(_, cfg.stagingTable, geomCols, cfg.srid)).mkString(", ")
    s"""BEGIN;
       |TRUNCATE TABLE ${cfg.targetTable};
       |INSERT INTO ${cfg.targetTable} ($colsList)
       |SELECT $selList FROM ${cfg.stagingTable};
       |COMMIT;""".stripMargin
  }

  /** MERGE with delete/update/insert arms driven by the update-type
    * column (`:222-252`). */
  def mergeSql(cfg: PostgresTargetConfig, cols: Seq[String], keys: Seq[String],
      geomCols: Seq[String]): String = {
    val tgt = cfg.targetTable
    val stg = cfg.stagingTable
    val ut = cfg.updateTypeCol
    val joinCondition = keys.map(k => s"$tgt.$k = $stg.$k").mkString(" AND ")
    val updateCols = cols.filterNot(c => keys.contains(c) || c == ut)
    val updateSet = updateCols
      .map(c => s""""$c" = ${fmtCol(c, stg, geomCols, cfg.srid)}""").mkString(", ")
    val insertCols = cols.filterNot(_ == ut)
    val insertNames = insertCols.map(c => s""""$c"""").mkString(", ")
    val insertVals = insertCols.map(fmtCol(_, stg, geomCols, cfg.srid)).mkString(", ")
    s"""MERGE INTO $tgt
       |USING $stg
       |ON $joinCondition
       |WHEN MATCHED AND $stg.$ut = 'delete' THEN
       |    DELETE
       |WHEN MATCHED AND $stg.$ut != 'delete' THEN
       |    UPDATE SET $updateSet
       |WHEN NOT MATCHED AND $stg.$ut != 'delete' THEN
       |    INSERT ($insertNames) VALUES ($insertVals);""".stripMargin
  }
}

/** Fail-fast environment contract (`:31-70`): SSL cert env vars
  * present, cert files exist, and the cluster security mode permits
  * local file access. All probes injectable for offline tests. */
final class EnvironmentValidator(
    env: String => Option[String],
    fileExists: String => Boolean,
    securityMode: () => String) {

  def validate(host: String): Unit = {
    val requiredEnvVars = Seq("ca", "cert", "key")
    val missing = requiredEnvVars.filter(env(_).isEmpty)
    if (missing.nonEmpty)
      throw new RuntimeException(
        s"Missing required environment variables for making SSL connection to host $host:" +
          s"\t${missing.mkString(", ")}." +
          "Ensure environment variables are set on the cluster for init script to run successfully.")
    Seq("CLOUD_SQL_CA", "CLOUD_SQL_CERT", "CLOUD_SQL_KEY").foreach { v =>
      val path = env(v).getOrElse(
        throw new RuntimeException(s"Missing required environment variable: $v"))
      if (!fileExists(path))
        throw new java.io.FileNotFoundException(
          s"Certificate file defined in $v not found at path: $path. Check init script execution.")
    }
    if (securityMode().toUpperCase(java.util.Locale.ROOT) == "USER_ISOLATION")
      throw new RuntimeException(
        "CRITICAL: This code requires 'Single User' or 'No Isolation Shared' mode. " +
          "Shared clusters (User Isolation) restrict access to local file paths required for SSL certs.")
  }
}

final class PostgresSyncManager(
    config: PostgresTargetConfig,
    spark: SparkSession,
    certs: Map[String, String],
    runSql: String => Int,
    stagingWriter: Option[DataFrame => Unit] = None) {

  val jdbcUrl = s"jdbc:postgresql://${config.host}/${config.dbname}"

  /** JDBC options for the staging write (`:177-196`). */
  def stagingJdbcOptions: Map[String, String] = Map(
    "url" -> jdbcUrl,
    "dbtable" -> config.stagingTable,
    "user" -> config.user,
    "password" -> config.password,
    "driver" -> "org.postgresql.Driver",
    "ssl" -> "true",
    "sslmode" -> "verify-ca",
    "sslrootcert" -> certs("ca"),
    "sslcert" -> certs("cert"),
    "sslkey" -> certs("key"),
    "truncate" -> "true")

  /** Executor-parallel staging write (`:188-196`). The JDBC write is
    * the production path; `stagingWriter` injects a test double (same
    * pattern as `runSql` — no live PG exists offline). */
  def writeToStaging(df: DataFrame): Unit = stagingWriter match {
    case Some(w) => w(df)
    case None =>
      df.write.format("jdbc").options(stagingJdbcOptions)
        .mode(SaveMode.Overwrite).save()
  }

  /** Full sync (`:254-291`): staging write then snapshot or merge. */
  def sync(df: DataFrame, mode: String = "snapshot",
      mergeKeys: Seq[String] = Nil, geometryCols: Seq[String] = Nil): Unit = {
    if (mode == "merge" && mergeKeys.isEmpty)
      throw new IllegalArgumentException(
        "Argument 'merge_keys' is required when mode='merge'.")
    if (mode != "snapshot" && mode != "merge")
      throw new IllegalArgumentException(s"Unknown mode: $mode")
    writeToStaging(df)
    mode match {
      case "snapshot" =>
        runSql(PostgresSyncSql.snapshotSql(config, df.columns.toSeq, geometryCols))
      case "merge" =>
        runSql(PostgresSyncSql.mergeSql(config, df.columns.toSeq, mergeKeys, geometryCols))
      case other => throw new IllegalArgumentException(s"Unknown mode: $other")
    }
  }

  /** Continuous sync: every micro-batch of `stream` runs the same
    * staging→snapshot/merge cycle as [[sync]] via `foreachBatch` — the
    * reference's batch PG sync lifted onto Structured Streaming.
    * Exactly-once lands through idempotence, the standard foreachBatch
    * contract: a replayed batch after a failure converges to the same
    * target state.
    *
    * Mode semantics bind to the stream's output mode: `merge` upserts
    * each batch's (new) rows by key and pairs with append-mode
    * streams; `snapshot` TRUNCATEs the target and rewrites it from the
    * batch, which is only correct when every batch carries the FULL
    * result — i.e. complete-mode aggregate streams — so the output
    * mode is derived from the sync mode rather than left to disagree
    * (an append+snapshot combination would silently discard all
    * previously-synced rows on every trigger). Arguments are validated
    * HERE, not in the first micro-batch, so a bad mode fails at
    * configure time instead of killing a checkpointed query mid-flight.
    * Pass `checkpointLocation` in production so offsets survive
    * restarts. Returns the configured writer — call `.start()` (and
    * manage the query) at the call site. */
  def syncStream(stream: DataFrame, mode: String = "merge",
      mergeKeys: Seq[String] = Nil, geometryCols: Seq[String] = Nil,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    if (mode == "merge" && mergeKeys.isEmpty)
      throw new IllegalArgumentException(
        "Argument 'merge_keys' is required when mode='merge'.")
    if (mode != "snapshot" && mode != "merge")
      throw new IllegalArgumentException(s"Unknown mode: $mode")
    val w = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sync(batch.toDF(), mode, mergeKeys, geometryCols)
      }
      .outputMode(if (mode == "snapshot") "complete" else "append")
    checkpointLocation.fold(w)(cp => w.option("checkpointLocation", cp))
  }
}

object PostgresSyncManager {

  /** Secrets-backed factory — the reference's
    * `from_databricks_secrets` (`sync_df_to_pgdb.py:97-154`) with the
    * secret store injected as a function (Databricks `dbutils.secrets
    * .get`, a vault client, …) instead of a hard runtime dependency. */
  def fromSecrets(
      secret: (String, String) => String,
      scope: String,
      hostKey: String,
      passwordKey: String,
      dbname: String,
      user: String,
      stagingTable: String,
      targetTable: String,
      updateTypeCol: String = "update_type",
      srid: Int = 0,
      spark: SparkSession,
      certs: Map[String, String]): PostgresSyncManager = {
    val config = PostgresTargetConfig(
      host = secret(scope, hostKey),
      dbname = dbname,
      user = user,
      password = secret(scope, passwordKey),
      stagingTable = stagingTable,
      targetTable = targetTable,
      updateTypeCol = updateTypeCol,
      srid = srid)
    new PostgresSyncManager(config, spark, certs, jdbcRunner(config, certs))
  }

  /** Driver-side SQL execution over the PostgreSQL JDBC driver with
    * verify-ca SSL — the java.sql equivalent of the reference's
    * psycopg connection (`:156-170`). Untested offline (no live PG). */
  def jdbcRunner(config: PostgresTargetConfig, certs: Map[String, String])
      : String => Int = { sql =>
    val props = new java.util.Properties()
    props.setProperty("user", config.user)
    props.setProperty("password", config.password)
    props.setProperty("ssl", "true")
    props.setProperty("sslmode", "verify-ca")
    props.setProperty("sslrootcert", certs("ca"))
    props.setProperty("sslcert", certs("cert"))
    props.setProperty("sslkey", certs("key"))
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:postgresql://${config.host}/${config.dbname}", props)
    try {
      val st = conn.createStatement()
      try { st.execute(sql); st.getUpdateCount }
      finally st.close()
    } finally conn.close()
  }
}
