package graft

import graft.sql.Ddl

/** The SQL DDL surface: the reference's seven schema-on-write CREATE
  * TABLEs re-expressed for the parquet source — declared, queryable,
  * partition-pruned, and idempotent. */
class DdlSpec extends SparkSpec {
  import spark.implicits._

  test("all seven reference tables declare, round-trip, and re-declare") {
    val wh = tmpDir("ddl-warehouse")
    Ddl.createAll(spark, wh)
    val listed = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Ddl.tableNames.toSet.subsetOf(listed))

    // silver schema matches the reference declaration (spot columns)
    val silver = spark.table("silver_webtoon_user_session_events")
    val fields = silver.schema.fields.map(f => f.name -> f.dataType.sql).toMap
    assert(fields("session_id") == "STRING")
    assert(fields("user_id") == "INT")
    assert(fields("datetime") == "DATE")
    assert(fields("duration_ms") == "BIGINT")
    assert(fields("is_complete") == "INT")
    assert(silver.schema.size == 20)

    // SQL INSERT lands in the declared partition layout and reads back
    spark.sql(
      """INSERT INTO silver_webtoon_user_session_events
        |PARTITION (datetime = '2024-03-01')
        |SELECT 's1', 7, 'w1', 'ep_1', 'ios', 'KR', 'phone', 'safari',
        |  TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 00:05:00',
        |  300000L, 0.9D, true, true, true, false, 'COMPLETE', 1, 0
        |""".stripMargin)
    val row = spark.sql(
      """SELECT user_id, session_state, datetime
        |FROM silver_webtoon_user_session_events
        |WHERE datetime = DATE '2024-03-01'""".stripMargin)
      .as[(Int, String, java.sql.Date)].collect()
    assert(row.toSeq == Seq((7, "COMPLETE",
      java.sql.Date.valueOf("2024-03-01"))))

    // IF NOT EXISTS: re-declaring is a no-op, data survives
    Ddl.createAll(spark, wh)
    assert(spark.table("silver_webtoon_user_session_events").count() == 1)

    Ddl.tableNames.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
