package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore catalog compatibility (SURVEY.md §3.3 / §1.2): the
  * reference's table catalog is the Hive metastore (HiveMetaStoreClient,
  * hive-metastore-2.3.10). Spark's twin is `enableHiveSupport()` —
  * `spark.sql.catalogImplementation=hive` backs the session's
  * ExternalCatalog with HiveExternalCatalog over an embedded-Derby
  * metastore. This spec builds such a session (same JVM, same
  * SparkContext, its own SharedState + metastore db), pushes the CTAS /
  * bucketed-SMB / MV table flows through it, and asserts the metastore
  * actually served them: tables persist across `newSession()` (i.e.
  * they live in the external catalog, not session temp state), the SMB
  * join over metastore-backed bucketed tables runs Exchange-free, and
  * the MV rewrite rule fires against a metastore-backed MV table.
  */
class HiveCatalogSpec extends AnyFunSuite {

  private def withHiveSession[A](f: SparkSession => A): A = {
    val prev = SparkTestBase.spark // materialize the shared context first
    val base = java.nio.file.Files.createTempDirectory("graft-hive-cat")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val hs = try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    finally {
      // Whatever happened, the suite-shared session stays the default.
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    try f(hs)
    finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("enableHiveSupport catalog round-trips CTAS, SMB and MV tables") {
    withHiveSession { hs =>
      assert(hs.conf.get("spark.sql.catalogImplementation") === "hive")
      val sfDir = SparkTestBase.sfDir

      // CTAS through the metastore.
      T.t(hs, sfDir, "nation").createOrReplaceTempView("hcat_nation_src")
      hs.sql("DROP TABLE IF EXISTS hcat_ctas")
      hs.sql("""CREATE TABLE hcat_ctas USING parquet AS
                SELECT n_nationkey, n_name, n_regionkey
                FROM hcat_nation_src""")
      assert(hs.table("hcat_ctas").count() === 25)

      // Bucketed + sorted pair for an SMB join, written via the
      // metastore-backed catalog.
      for (t <- Seq("hcat_smb_a", "hcat_smb_b"))
        hs.sql(s"DROP TABLE IF EXISTS $t")
      val n = T.t(hs, sfDir, "nation")
      n.write.bucketBy(4, "n_nationkey").sortBy("n_nationkey")
        .saveAsTable("hcat_smb_a")
      n.groupBy("n_nationkey").agg(count(lit(1)).as("c"))
        .write.bucketBy(4, "n_nationkey").sortBy("n_nationkey")
        .saveAsTable("hcat_smb_b")
      val smb = hs.table("hcat_smb_a")
        .join(hs.table("hcat_smb_b").hint("merge"), "n_nationkey")
      assert(smb.count() === 25)
      val physical = smb.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("Exchange"),
        s"SMB join over metastore bucketed tables shuffled:\n$physical")

      // MV registration + rewrite against a metastore-backed MV table.
      hs.sql("DROP TABLE IF EXISTS hcat_mv")
      val defining = T.t(hs, sfDir, "nation")
        .groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
      MaterializedViews.register(hs, "hcat_mv", defining)
      val rewritten = T.t(hs, sfDir, "nation")
        .groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
      val optimized = rewritten.queryExecution.optimizedPlan.toString
      assert(optimized.contains("hcat_mv"),
        s"MV rewrite did not hit the metastore-backed MV:\n$optimized")
      assert(rewritten.count() === 5)

      // The tables live in the EXTERNAL catalog: a fresh session over
      // the same SharedState (new temp-view state, same metastore)
      // still sees all of them — temp views don't survive this hop.
      val s2 = hs.newSession()
      for (t <- Seq("hcat_ctas", "hcat_smb_a", "hcat_smb_b", "hcat_mv"))
        assert(s2.catalog.tableExists(t), s"$t missing from metastore")
      assert(!s2.catalog.tableExists("hcat_nation_src"))
      assert(s2.table("hcat_mv").count() === 5)

      // And the embedded Derby metastore db physically exists.
      val msDir = new java.io.File(
        hs.conf.get("javax.jdo.option.ConnectionURL")
          .split("databaseName=")(1).split(";")(0))
      assert(msDir.isDirectory && msDir.listFiles().nonEmpty)
    }
  }
}
