package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression

/** Hive `CREATE TEMPORARY MACRO` (SURVEY.md §2.8 extension surfaces;
  * reference: ql/plan/CreateMacroDesc.class, hive-exec-2.3.10) —
  * Spark-first: a macro is a NAMED SQL EXPRESSION with parameters, so
  * define() parses the body once with the session's own SQL parser and
  * registers a FunctionBuilder that substitutes call-site argument
  * expressions for the parameter attributes. The result inlines into
  * the caller's plan exactly like Hive's macro expansion: Catalyst
  * sees ordinary expressions — optimizable, codegen-able, pushdown-able
  * — never a UDF black box. (A Scala-UDF "macro" would be the
  * anti-pattern: opaque to the optimizer and off the codegen path.)
  *
  * Scale note: zero runtime cost — expansion happens at plan time, so
  * a macro used in a 100 TB scan is indistinguishable from writing the
  * expression inline.
  */
object Macros {

  /** Register `name(params...) AS body` as a temporary function.
    * Re-registration replaces (Hive semantics). Parameter references in
    * `body` are matched by (case-insensitive) attribute name.
    */
  def define(spark: SparkSession, name: String, params: Seq[String],
      body: String): Unit = {
    val parsed = spark.sessionState.sqlParser.parseExpression(body)
    val lower = params.map(_.toLowerCase)
    // Reject typos NOW (a misspelled parameter would otherwise surface
    // as an unresolved-column error at every call site).
    val free = parsed.collect {
      case a: UnresolvedAttribute if !lower.contains(a.name.toLowerCase) =>
        a.name
    }
    require(free.isEmpty,
      s"macro $name references undefined names: ${free.mkString(", ")}")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (args: Seq[Expression]) => {
        require(args.length == params.length,
          s"macro $name expects ${params.length} arguments, " +
            s"got ${args.length}")
        val sub = lower.zip(args).toMap
        parsed.transformUp {
          case a: UnresolvedAttribute => sub.getOrElse(a.name.toLowerCase, a)
        }
      },
      "sql_udf") // closest ExpressionInfo source tag: a SQL-defined fn
  }
}
