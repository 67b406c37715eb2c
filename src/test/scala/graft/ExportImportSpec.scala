package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ExportImport

/** EXPORT/IMPORT bundle semantics (ExportSemanticAnalyzer /
  * ImportSemanticAnalyzer parity): full-fidelity schema round-trip,
  * original column order after a partitioned export (which moves
  * partition columns last on disk), and — the scale property — an
  * imported partitioned table still PRUNES partitions.
  */
class ExportImportSpec extends AnyFunSuite {
  import SparkTestBase._

  private def bundleDir(name: String): String =
    SparkTestBase.tmpDir(s"graft_exim_$name").toString

  private def norm(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = norm(f.dataType), nullable = true)))
      case a: ArrayType =>
        a.copy(elementType = norm(a.elementType), containsNull = true)
      case m: MapType =>
        m.copy(valueType = norm(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  test("non-partitioned round-trip preserves schema and rows exactly") {
    val df = spark.sql(
      """SELECT id AS k, CAST(id AS DECIMAL(12,3)) / 7 AS d,
        |  CONCAT('v', id) AS s, DATE'2024-01-01' + CAST(id AS INT) AS dt,
        |  ARRAY(id, id * 2) AS arr,
        |  NAMED_STRUCT('a', id, 'b', CAST(id AS DOUBLE) / 3) AS st
        |FROM RANGE(100)""".stripMargin)
    val dir = bundleDir("plain")
    ExportImport.exportTable(df, dir)
    val back = ExportImport.importTable(spark, dir)
    // Nullability is normalized: Spark's parquet reader relaxes nested
    // containsNull/field nullability on ANY round-trip; names and types
    // (incl. decimal scale, arrays, structs) must survive exactly.
    assert(norm(back.schema) == norm(df.schema),
      "schema (names+types incl. decimal scale, arrays, structs) must survive")
    assert(ExportImport.partitionCols(dir).isEmpty)
    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    assert(back.collect().sortBy(key).toSeq == df.collect().sortBy(key).toSeq)
  }

  test("partitioned import restores column order and prunes partitions") {
    val cust = T.t(spark, sfDir, "customer")
    val dir = bundleDir("part")
    ExportImport.exportTable(cust, dir, Seq("c_mktsegment"))
    assert(ExportImport.partitionCols(dir) == Seq("c_mktsegment"))
    val back = ExportImport.importTable(spark, dir)
    assert(back.columns.toSeq == cust.columns.toSeq,
      "partitioned write reorders columns on disk; import must restore")
    val q = back.filter(col("c_mktsegment") === "BUILDING")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.substring(plan.indexOf("PartitionFilters"))
        .takeWhile(_ != ']').contains("c_mktsegment"),
      "segment filter must prune partition directories, not scan-and-filter")
    assert(q.count() ==
      cust.filter(col("c_mktsegment") === "BUILDING").count())
  }
}
