package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Live-PostgreSQL round-trip — ACTIVATES only when
  * `SPARK_GRAFT_POSTGRES_URL` points at a reachable server (e.g.
  * `jdbc:postgresql://host:5432/db?user=u&password=p`) AND the postgresql
  * JDBC driver is on the classpath; otherwise every test cancels
  * (skipped-green in the sandbox, exercised for free the day an
  * environment has a server — the K3-style hook for the S3/K1 partials,
  * cf. KafkaLiveSpec).
  *
  * This is the real-server leg the Derby-backed EtlLifecycleSpec and the
  * DDL-shape-only PostgresDialectSpec cannot cover: the reference's
  * `spark_airports_final.py:77-97` overwrite-write and read-back against
  * actual Postgres semantics (TEXT/FLOAT8 storage, overwrite = drop +
  * recreate).
  */
class PostgresLiveSpec extends AnyFunSuite {
  import TestSpark.spark

  private val DRIVER = "org.postgresql.Driver"

  private def url: String = {
    val u = sys.env.getOrElse("SPARK_GRAFT_POSTGRES_URL", "")
    assume(u.nonEmpty,
      "SPARK_GRAFT_POSTGRES_URL not set — no Postgres in this environment")
    assume(scala.util.Try(Class.forName(DRIVER)).isSuccess,
      "postgresql JDBC driver not on the classpath")
    u
  }

  test("K1→S3: overwrite write round-trips through a live server") {
    val u = url
    val table = s"graft_live_${java.util.UUID.randomUUID().toString.take(8)}"
    val rows = spark.range(10).select(
      col("id"), concat(lit("name"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))
    try {
      graft.sinks.Sinks.jdbcWrite(rows, u, table, DRIVER)
      // second write proves overwrite (not append): count must stay 10
      graft.sinks.Sinks.jdbcWrite(rows, u, table, DRIVER)
      val back = graft.sinks.Sinks.jdbcRead(spark, u, table, DRIVER)
      assert(back.count() == 10)
      // values and types survive the TEXT/FLOAT8 round-trip exactly
      assert(back.select(col("id"), col("name"), col("score")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
        (0L until 10L).map(i => (i, s"name$i", i * 1.5)).toSet)
    } finally {
      // unlike Kafka topics (retention-expired), tables accumulate forever
      // — drop what this run created, even on assertion failure
      val conn = java.sql.DriverManager.getConnection(u)
      try conn.createStatement().execute(s"DROP TABLE IF EXISTS $table")
      finally conn.close()
    }
  }
}
