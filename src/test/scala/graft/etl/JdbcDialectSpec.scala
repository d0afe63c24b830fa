package graft.etl

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the JDBC type mapping the warehouse model table gets on BOTH
  * target dialects — the margin where the reference's real target
  * (Postgres, square_ETL.py:232-233) differs from the sandbox's wire
  * test (Derby). graft.tools.PgParity validated the Postgres column
  * types against a LIVE PostgreSQL 15 via psql (DDL accepted, 25 rows
  * round-tripped exactly — BENCH_LOCAL §r12); this spec keeps that
  * validated mapping from drifting silently under a Spark upgrade. The
  * load-bearing asymmetry: Spark's TimestampType is instant-typed, so
  * Postgres gets TIMESTAMP WITH TIME ZONE while Derby (no tz type)
  * gets plain TIMESTAMP — values must therefore travel as instants
  * (epoch/ISO-Z), never as zone-rendered text.
  */
class JdbcDialectSpec extends AnyFunSuite {

  private val modelSchema = StructType(Seq(
    StructField("profile_name", StringType),
    StructField("mse", DoubleType),
    StructField("prediction", DoubleType),
    StructField("forecast_start", TimestampType)))

  private def mapping(url: String): Seq[String] = {
    val d = JdbcDialects.get(url)
    modelSchema.fields.toSeq.map { f =>
      d.getJDBCType(f.dataType)
        .orElse(org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils.getCommonJDBCType(f.dataType))
        .get.databaseTypeDefinition
    }
  }

  test("PostgresDialect maps the model table to the psql-validated types") {
    assert(mapping("jdbc:postgresql://localhost/x") ==
      Seq("TEXT", "FLOAT8", "FLOAT8", "TIMESTAMP WITH TIME ZONE"))
  }

  test("DerbyDialect maps the model table to the wire-tested types") {
    assert(mapping("jdbc:derby:memory:x") ==
      Seq("CLOB", "DOUBLE PRECISION", "DOUBLE PRECISION", "TIMESTAMP"))
  }
}
