package graft.sync

import org.scalatest.funsuite.AnyFunSuite

/** Golden string tests for the Postgres promotion SQL
  * (`sync_df_to_pgdb.py:198-252`) and environment validation
  * (`:31-70`) — no live Postgres offline, so the contract is the
  * generated text and the fail-fast checks. */
class PostgresSyncSpec extends AnyFunSuite {

  private val cfg = PostgresTargetConfig(
    host = "db.internal", dbname = "geodata", user = "etl", password = "pw",
    stagingTable = "public.buildings_staging", targetTable = "public.buildings",
    srid = 25835)

  test("snapshot SQL: transactional truncate + insert with geometry wrap") {
    val sql = PostgresSyncSql.snapshotSql(cfg,
      cols = Seq("id", "name", "geom"), geomCols = Seq("geom"))
    assert(sql ==
      """BEGIN;
        |TRUNCATE TABLE public.buildings;
        |INSERT INTO public.buildings ("id", "name", "geom")
        |SELECT public.buildings_staging."id", public.buildings_staging."name", ST_GeomFromWKB(public.buildings_staging."geom", 25835) FROM public.buildings_staging;
        |COMMIT;""".stripMargin)
  }

  test("merge SQL: delete/update/insert arms driven by update_type") {
    val sql = PostgresSyncSql.mergeSql(cfg,
      cols = Seq("id", "name", "geom", "update_type"),
      keys = Seq("id"), geomCols = Seq("geom"))
    assert(sql ==
      """MERGE INTO public.buildings
        |USING public.buildings_staging
        |ON public.buildings.id = public.buildings_staging.id
        |WHEN MATCHED AND public.buildings_staging.update_type = 'delete' THEN
        |    DELETE
        |WHEN MATCHED AND public.buildings_staging.update_type != 'delete' THEN
        |    UPDATE SET "name" = public.buildings_staging."name", "geom" = ST_GeomFromWKB(public.buildings_staging."geom", 25835)
        |WHEN NOT MATCHED AND public.buildings_staging.update_type != 'delete' THEN
        |    INSERT ("id", "name", "geom") VALUES (public.buildings_staging."id", public.buildings_staging."name", ST_GeomFromWKB(public.buildings_staging."geom", 25835));""".stripMargin)
  }

  test("merge SQL: multi-key join condition") {
    val sql = PostgresSyncSql.mergeSql(cfg,
      cols = Seq("k1", "k2", "v", "update_type"), keys = Seq("k1", "k2"),
      geomCols = Nil)
    assert(sql.contains(
      "ON public.buildings.k1 = public.buildings_staging.k1 AND " +
        "public.buildings.k2 = public.buildings_staging.k2"))
    assert(sql.contains("""UPDATE SET "v" = public.buildings_staging."v""""))
  }

  test("non-geometry columns are never wrapped; srid flows through") {
    assert(PostgresSyncSql.fmtCol("plain", "t", Seq("geom"), 4326) == "t.\"plain\"")
    assert(PostgresSyncSql.fmtCol("geom", "t", Seq("geom"), 4326) ==
      "ST_GeomFromWKB(t.\"geom\", 4326)")
  }

  test("environment validation: missing env vars fail fast (:39-47)") {
    val v = new EnvironmentValidator(_ => None, _ => true, () => "SINGLE_USER")
    val e = intercept[RuntimeException](v.validate("h"))
    assert(e.getMessage.contains("ca, cert, key"))
  }

  test("environment validation: missing cert file fails fast (:55-60)") {
    val env = Map("ca" -> "x", "cert" -> "x", "key" -> "x",
      "CLOUD_SQL_CA" -> "/certs/ca.pem", "CLOUD_SQL_CERT" -> "/certs/c.pem",
      "CLOUD_SQL_KEY" -> "/certs/k.pem")
    val v = new EnvironmentValidator(env.get, _ == "/certs/ca.pem", () => "SINGLE_USER")
    val e = intercept[java.io.FileNotFoundException](v.validate("h"))
    assert(e.getMessage.contains("CLOUD_SQL_CERT"))
  }

  test("environment validation: USER_ISOLATION mode is rejected (:62-70)") {
    val env = Map("ca" -> "x", "cert" -> "x", "key" -> "x",
      "CLOUD_SQL_CA" -> "/c", "CLOUD_SQL_CERT" -> "/c", "CLOUD_SQL_KEY" -> "/c")
    val v = new EnvironmentValidator(env.get, _ => true, () => "user_isolation")
    val e = intercept[RuntimeException](v.validate("h"))
    assert(e.getMessage.contains("Single User"))
  }

  test("staging JDBC options match the reference write config (:177-196)") {
    val mgr = new PostgresSyncManager(cfg, null,
      Map("ca" -> "/ca", "cert" -> "/cert", "key" -> "/key"), _ => 0)
    val o = mgr.stagingJdbcOptions
    assert(o("url") == "jdbc:postgresql://db.internal/geodata")
    assert(o("dbtable") == "public.buildings_staging")
    assert(o("driver") == "org.postgresql.Driver")
    assert(o("sslmode") == "verify-ca")
    assert(o("truncate") == "true")
  }

  test("fromSecrets factory resolves host/password through the injected store (:97-154)") {
    val secrets = Map(("scope1", "db-host") -> "10.1.2.3", ("scope1", "db-pass") -> "s3cret")
    val mgr = PostgresSyncManager.fromSecrets(
      secret = (s, k) => secrets((s, k)),
      scope = "scope1", hostKey = "db-host", passwordKey = "db-pass",
      dbname = "geodata", user = "etl",
      stagingTable = "public.s", targetTable = "public.t",
      srid = 4326, spark = null,
      certs = Map("ca" -> "/ca", "cert" -> "/cert", "key" -> "/key"))
    assert(mgr.jdbcUrl == "jdbc:postgresql://10.1.2.3/geodata")
    assert(mgr.stagingJdbcOptions("password") == "s3cret")
  }

  test("merge without keys is rejected (:277-278); unknown mode rejected (:288-289)") {
    val mgr = new PostgresSyncManager(cfg, null,
      Map("ca" -> "/ca", "cert" -> "/cert", "key" -> "/key"), _ => 0)
    intercept[IllegalArgumentException](mgr.sync(null, mode = "merge"))
    intercept[IllegalArgumentException](mgr.sync(null, mode = "bogus",
      mergeKeys = Seq("id")))
  }

  private def recordingManager(staged: scala.collection.mutable.ArrayBuffer[Long],
      sqls: scala.collection.mutable.ArrayBuffer[String]): PostgresSyncManager =
    new PostgresSyncManager(cfg, graft.SparkTestSession.session,
      Map("ca" -> "/ca", "cert" -> "/cert", "key" -> "/key"),
      sql => { sqls += sql; 0 },
      stagingWriter = Some(df => staged += df.count()))

  test("syncStream merge: one staging write + one MERGE per micro-batch") {
    val spark = graft.SparkTestSession.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staged = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sqls = scala.collection.mutable.ArrayBuffer.empty[String]
    val mgr = recordingManager(staged, sqls)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val query = mgr.syncStream(input.toDF().toDF("id", "name"),
      mode = "merge", mergeKeys = Seq("id")).start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      query.processAllAvailable()
      input.addData((3L, "c"))
      query.processAllAvailable()
      assert(staged.toSeq == Seq(2L, 1L)) // one staging write per batch
      // MERGE is a single atomic statement (no BEGIN wrapper)
      assert(sqls.size == 2 &&
        sqls.forall(_ == PostgresSyncSql.mergeSql(cfg, Seq("id", "name"), Seq("id"), Nil)))
    } finally query.stop()
  }

  test("syncStream snapshot: complete-mode aggregate, full refresh per batch") {
    val spark = graft.SparkTestSession.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val staged = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sqls = scala.collection.mutable.ArrayBuffer.empty[String]
    val mgr = recordingManager(staged, sqls)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val agg = input.toDF().toDF("id", "name")
      .groupBy(org.apache.spark.sql.functions.col("name"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val query = mgr.syncStream(agg, mode = "snapshot").start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      query.processAllAvailable()
      input.addData((3L, "a"))
      query.processAllAvailable()
      // complete mode: each snapshot batch carries the FULL aggregate,
      // so TRUNCATE+INSERT is a consistent refresh (2 groups both times)
      assert(staged.toSeq == Seq(2L, 2L))
      assert(sqls.size == 2 &&
        sqls.forall(_ == PostgresSyncSql.snapshotSql(cfg, Seq("name", "n"), Nil)))
    } finally query.stop()
  }

  test("syncStream validates arguments at configure time, not mid-stream") {
    val spark = graft.SparkTestSession.session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mgr = recordingManager(
      scala.collection.mutable.ArrayBuffer.empty,
      scala.collection.mutable.ArrayBuffer.empty)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val df = input.toDF().toDF("id", "name")
    intercept[IllegalArgumentException](mgr.syncStream(df)) // merge w/o keys
    intercept[IllegalArgumentException](mgr.syncStream(df, mode = "bogus"))
  }
}
