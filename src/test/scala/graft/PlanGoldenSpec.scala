package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression gate over the most expensive registered
  * queries (the reference's TPC-DS perf-golden idea, SURVEY.md §5.2):
  * each query's normalized physical-plan signature
  * (plans.PlanGolden.signature) is frozen under
  * src/test/resources/plan_golden/ and any drift — a lost broadcast, a
  * new Exchange, a filter that stopped pushing down — fails the suite
  * even while answers stay correct.
  *
  * To re-freeze after an INTENTIONAL plan change:
  *   GRAFT_REGEN_PLAN_GOLDEN=1 sbt "testOnly graft.PlanGoldenSpec"
  * then review the golden diff in git like any other code change.
  */
class PlanGoldenSpec extends AnyFunSuite {
  import SparkTestBase._

  private val goldenDir =
    java.nio.file.Paths.get("src", "test", "resources", "plan_golden")
  private val regen = sys.env.get("GRAFT_REGEN_PLAN_GOLDEN").contains("1")

  /** The FULL registry (round 11; was the 36 most expensive) — one
    * frozen signature per registered query, the reference's ~99-query
    * TPC-DS perf-golden corpus scaled to this registry: any silent
    * broadcast→shuffle, lost pushdown or new Exchange ANYWHERE now
    * fails the build instead of surfacing as bench drift. Sink/DDL
    * queries sign their read-back plan (the write side is asserted by
    * their own specs); that is a weaker but still real gate — a
    * read-back that stops pruning partitions changes its signature.
    * NOTE for regeneration: signatures may embed data-derived scan
    * bounds (partition filters), so a driver-side testdata regeneration
    * that changes row COUNTS (not just values) requires a golden
    * re-freeze — that is the intended behavior of a plan gate.
    */
  private val corpus = SparkEntry.all.map(_.name)

  private def goldenPath(name: String) = goldenDir.resolve(s"$name.txt")

  private def readGolden(name: String): Option[String] = {
    val p = goldenPath(name)
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    else None
  }

  private def writeGolden(name: String, sig: String): Unit = {
    java.nio.file.Files.createDirectories(goldenDir)
    java.nio.file.Files.write(goldenPath(name), sig.getBytes("UTF-8"))
    ()
  }

  private def diff(golden: String, actual: String): String = {
    val g = golden.split("\n", -1)
    val a = actual.split("\n", -1)
    val out = new StringBuilder
    val n = math.max(g.length, a.length)
    var i = 0
    while (i < n) {
      val gl = if (i < g.length) g(i) else "<missing>"
      val al = if (i < a.length) a(i) else "<missing>"
      if (gl != al) out.append(s"  line ${i + 1}:\n    golden: $gl\n    actual: $al\n")
      i += 1
    }
    out.toString
  }

  corpus.foreach { name =>
    test(s"plan golden: $name") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val sig = plans.PlanGolden.signature(df)
      readGolden(name) match {
        case _ if regen => writeGolden(name, sig)
        case None =>
          fail(s"no golden for $name — run with GRAFT_REGEN_PLAN_GOLDEN=1 " +
            "to freeze the current plan shape")
        case Some(golden) =>
          assert(golden == sig,
            s"\nPLAN SHAPE DRIFT in $name:\n${diff(golden, sig)}\n" +
              "If intentional, re-freeze with GRAFT_REGEN_PLAN_GOLDEN=1 " +
              "and commit the golden diff.")
      }
    }
  }

  test("the harness detects drift (failing-on-purpose demo)") {
    // Disabling broadcast joins must change q3's signature — proving a
    // lost broadcast is exactly the class of drift the goldens catch.
    val name = "q3_shipping_priority"
    val base = plans.PlanGolden.signature(
      SparkEntry.queries(name)(spark, sfDir))
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val drifted = plans.PlanGolden.signature(
        SparkEntry.queries(name)(spark, sfDir))
      assert(base.contains("BroadcastHashJoin"))
      assert(base != drifted,
        "signature must change when the broadcast strategy is lost")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("signatures are deterministic across plannings") {
    val name = "q16_supplier_part_count"
    val a = plans.PlanGolden.signature(SparkEntry.queries(name)(spark, sfDir))
    val b = plans.PlanGolden.signature(SparkEntry.queries(name)(spark, sfDir))
    assert(a == b)
  }
}
