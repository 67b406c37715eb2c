package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view query rewrite (Hive 3's Calcite-based
  * `HiveMaterializedViewsRegistry` rewrite — SURVEY.md §1.1 [Hive3+]),
  * re-expressed as a custom Catalyst `Rule[LogicalPlan]` — the (c)-level
  * extension surface from the build plan: a whole-plan semantic Spark
  * lacks, injected via `spark.experimental.extraOptimizations`
  * (equivalently `SparkSessionExtensions.injectOptimizerRule` at
  * session-build time).
  *
  * Mechanism: `register` materializes a DataFrame into a catalog table
  * and records the CANONICALIZED analyzed plan it computes. The rule
  * then replaces any query subtree whose canonical form equals a
  * registered plan with a scan of the materialized table — exprIds are
  * re-bound with an aliasing Project so the substitution is transparent
  * to the rest of the plan. Like Hive, rewrites serve STALE data if the
  * base tables change after materialization; REFRESH = re-register
  * (documented gap: no incremental maintenance).
  *
  * Scale notes: this is the classic aggregate-reuse play — a 100 TB
  * scan+agg collapses to a read of the (tiny) materialized result, and
  * matching is O(plan size), driver-side only.
  */
object MaterializedViews {

  /** canonicalized defining plan -> (table name, cached optimized scan
    * of the table). The scan is resolved ONCE at registration so the
    * rule never launches a nested query execution inside the optimizer
    * (that nesting is a stack-overflow vector).
    */
  private val registry = TrieMap[LogicalPlan, (String, LogicalPlan)]()
  private val ruleInstalled = TrieMap[String, Boolean]()
  private val applying = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  def register(spark: SparkSession, name: String, defining: DataFrame): Unit = {
    if (!spark.catalog.tableExists(name))
      defining.write.saveAsTable(name)
    // extraOptimizations run AFTER the main optimizer batches, so the
    // incoming subtrees are optimized — match on the OPTIMIZED canonical
    // form of the defining query. If the rule is already installed and
    // rewrote this very plan (re-registration), the optimized form reads
    // the MV itself — never register that, or the rule would chase its
    // own output.
    val optimized = defining.queryExecution.optimizedPlan
    val readsMv = optimized.collectLeaves().exists(_.toString.contains(name))
    if (!readsMv) {
      val scan = spark.table(name).queryExecution.optimizedPlan
      registry.putIfAbsent(optimized.canonicalized, (name, scan))
    }
    ensureRule(spark)
  }

  private def ensureRule(spark: SparkSession): Unit =
    if (ruleInstalled.putIfAbsent(
        System.identityHashCode(spark).toString, true).isEmpty) {
      spark.experimental.extraOptimizations ++= Seq(new Rewrite)
    }

  /** Replaces registered subtrees bottom-up; a hit substitutes the
    * cached MV scan re-aliased to the replaced subtree's output
    * attributes. Re-entrant applications (nested optimizations) no-op.
    */
  final class Rewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (applying.get()) plan
      else {
        applying.set(true)
        try plan.transformUp {
          case p if registry.contains(p.canonicalized) =>
            val (_, cached) = registry(p.canonicalized)
            // Fresh relation instance per substitution: two hits in one
            // plan (self-join of the MV subtree) must not share exprIds.
            val mv = cached match {
              case m: MultiInstanceRelation =>
                m.newInstance().asInstanceOf[LogicalPlan]
              case other => other
            }
            // Positional re-bind (table column order = defining schema
            // order): keep original exprIds so parents are untouched.
            val projectList = p.output.zip(mv.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }
            Project(projectList, mv)
        } finally applying.set(false)
      }
  }
}
