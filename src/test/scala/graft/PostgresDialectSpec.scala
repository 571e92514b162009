package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The reference persists to PostgreSQL (`spark_airports_final.py:77-97`);
  * this container has no Postgres server, so K1/S3 *semantics* are proven
  * on embedded Derby (EtlLifecycleSpec) and the Postgres-specific part —
  * the column type mapping `Sinks.jdbcWrite` would emit at deploy time —
  * is pinned here against Spark's own PostgresDialect (resolved through
  * the public `JdbcDialects.get`, no server needed). A Postgres deploy is
  * then a URL/driver config change with a test-pinned DDL shape.
  */
class PostgresDialectSpec extends AnyFunSuite {

  private val pg = JdbcDialects.get("jdbc:postgresql://host:5432/db")

  private def ddlType(dt: DataType): Option[String] =
    pg.getJDBCType(dt).map(_.databaseTypeDefinition)

  test("the cleaned airport row maps to the documented Postgres column types") {
    // persisted schema: id/name/icao string, latitude/longitude double
    assert(ddlType(StringType).contains("TEXT"))
    assert(ddlType(DoubleType).contains("FLOAT8")) // = "double precision"
  }

  test("engine output types used by other sinks have Postgres definitions") {
    assert(ddlType(FloatType).contains("FLOAT4"))
    assert(ddlType(BinaryType).contains("BYTEA"))
    assert(ddlType(BooleanType).contains("BOOLEAN"))
    // LongType/IntegerType fall through to the common JDBC mapping
    // (BIGINT/INTEGER) — the dialect declining to override IS the contract
    assert(ddlType(LongType).isEmpty || ddlType(LongType).contains("BIGINT"))
  }

  test("a non-postgres URL resolves to a different dialect (mapping is URL-driven)") {
    val derby = JdbcDialects.get("jdbc:derby:memory:x")
    assert(derby != pg)
  }
}
