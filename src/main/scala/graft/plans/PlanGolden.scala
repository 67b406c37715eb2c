package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, SinglePartition}

/** Normalized physical-plan SHAPE signatures — the regression asset the
  * reference keeps as its TPC-DS plan-golden corpus (SURVEY.md §5.2:
  * `ql/src/test/queries/clientpositive/perf/query1–99.q` under
  * TestTezPerfCliDriver, whose .q.out files freeze operator trees).
  * Correctness gates catch wrong ANSWERS; nothing else catches a
  * still-correct plan that quietly loses a broadcast, a pushed filter,
  * or an Exchange-free bucketed join after a Spark upgrade or a stats
  * shift — at 100 TB that silent drift IS the outage. PlanGoldenSpec
  * snapshots these signatures for the most expensive registered queries
  * and fails on any shape change.
  *
  * The signature keeps exactly what a reviewer checks in
  * `.explain("formatted")` — operator kind, join strategy + build side,
  * exchange partitioning + key count, pushed/partition filters, read
  * schema, aggregate/sort/window key counts — and normalizes away
  * everything run-dependent: expression ids (`#123`), file paths,
  * partition counts, statistics, codegen/AQE wrappers (we sign the
  * planner's output, `queryExecution.sparkPlan`, before AQE mutates it).
  */
object PlanGolden {

  def signature(df: DataFrame): String =
    render(df.queryExecution.sparkPlan, 0).mkString("\n") + "\n"

  private def norm(s: String): String = s
    .replaceAll("#\\d+[A-Z]*", "#")
    .replaceAll("(file:)?/[^\\s,\\]\\)]*", "<path>")
    .replaceAll("@[0-9a-f]+", "")
    .replaceAll("\\s+", " ")
    .trim

  private def label(p: SparkPlan): String = p match {
    case j: BroadcastHashJoinExec =>
      s"BroadcastHashJoin ${j.joinType} build=${j.buildSide} keys=${j.leftKeys.length}"
    case j: ShuffledHashJoinExec =>
      s"ShuffledHashJoin ${j.joinType} build=${j.buildSide} keys=${j.leftKeys.length}"
    case j: SortMergeJoinExec =>
      s"SortMergeJoin ${j.joinType} keys=${j.leftKeys.length}"
    case j: BroadcastNestedLoopJoinExec =>
      s"BroadcastNestedLoopJoin ${j.joinType} build=${j.buildSide}"
    case _: CartesianProductExec => "CartesianProduct"
    case e: ShuffleExchangeExec =>
      val part = e.outputPartitioning match {
        case h: HashPartitioning => s"hash(keys=${h.expressions.length})"
        case r: RangePartitioning => s"range(keys=${r.ordering.length})"
        case SinglePartition => "single"
        case other => other.getClass.getSimpleName
      }
      s"Exchange $part"
    case e: BroadcastExchangeExec =>
      s"BroadcastExchange ${e.mode.getClass.getSimpleName}"
    case a: HashAggregateExec =>
      s"HashAggregate keys=${a.groupingExpressions.length} ${aggModes(a.aggregateExpressions.map(_.mode.toString))}"
    case a: ObjectHashAggregateExec =>
      s"ObjectHashAggregate keys=${a.groupingExpressions.length} ${aggModes(a.aggregateExpressions.map(_.mode.toString))}"
    case a: SortAggregateExec =>
      s"SortAggregate keys=${a.groupingExpressions.length} ${aggModes(a.aggregateExpressions.map(_.mode.toString))}"
    case s: SortExec =>
      s"Sort keys=${s.sortOrder.length} global=${s.global}"
    case w: WindowExec =>
      s"Window part=${w.partitionSpec.length} order=${w.orderSpec.length}"
    case w: WindowGroupLimitExec =>
      s"WindowGroupLimit part=${w.partitionSpec.length} ${w.mode}"
    case t: TakeOrderedAndProjectExec =>
      s"TakeOrderedAndProject limit=${t.limit}"
    case s: FileSourceScanExec =>
      val pushed = s.metadata.get("PushedFilters").map(norm).getOrElse("[]")
      val partF = s.metadata.get("PartitionFilters").map(norm).getOrElse("[]")
      val schema = s.requiredSchema.fieldNames.sorted.mkString(",")
      s"Scan parquet cols=[$schema] pushed=$pushed partition=$partF"
    case b: BatchScanExec =>
      s"BatchScan ${norm(b.scan.getClass.getSimpleName)}"
    case g: GenerateExec =>
      s"Generate ${g.generator.getClass.getSimpleName} outer=${g.outer}"
    case e: ExpandExec => s"Expand projections=${e.projections.length}"
    case _: FilterExec => "Filter"
    case _: ProjectExec => "Project"
    case _: LocalTableScanExec => "LocalTableScan"
    case _: RDDScanExec => "ExistingRDD"
    case other =>
      norm(other.getClass.getSimpleName.stripSuffix("Exec"))
  }

  /** Partial/Final mode multiset, order-normalized. */
  private def aggModes(ms: Seq[String]): String =
    if (ms.isEmpty) "modes=[]"
    else s"modes=[${ms.distinct.sorted.mkString(",")}]"

  private def render(p: SparkPlan, depth: Int): Seq[String] =
    (("  " * depth) + label(p)) +: p.children.flatMap(render(_, depth + 1))
}
