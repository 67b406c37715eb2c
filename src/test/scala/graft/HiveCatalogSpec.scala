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
    val base = SparkTestBase.tmpDir("graft-hive-cat")
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val hs = try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      // scope Hive's session resources dir under the cleaned base —
      // the default leaves an empty /tmp/<uuid>_resources per session
      .config("hive.downloaded.resources.dir",
        s"$base/resources/$${hive.session.id}")
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

  test("LOAD DATA into a Hive-format table + partitioned overwrite") {
    withHiveSession { hs =>
      // Stage a pipe-delimited text file — the classic LOAD DATA input.
      val stage = SparkTestBase.tmpDir("hcat-load")
      val f1 = stage.resolve("batch1.txt")
      java.nio.file.Files.writeString(f1,
        "1|alpha\n2|beta\n3|gamma\n")
      val f2 = stage.resolve("batch2.txt")
      java.nio.file.Files.writeString(f2, "4|delta\n5|epsilon\n")

      hs.sql("DROP TABLE IF EXISTS hcat_load")
      hs.sql("""CREATE TABLE hcat_load (id INT, name STRING)
                ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
                STORED AS TEXTFILE""")
      // LOAD DATA is a FILE MOVE into the table location — no rewrite,
      // no scan; the second load APPENDS (Hive semantics).
      hs.sql(s"LOAD DATA LOCAL INPATH '$f1' INTO TABLE hcat_load")
      assert(hs.table("hcat_load").count() === 3)
      hs.sql(s"LOAD DATA LOCAL INPATH '$f2' INTO TABLE hcat_load")
      assert(hs.table("hcat_load").count() === 5)
      assert(hs.sql(
        "SELECT sum(id) s FROM hcat_load").head.getLong(0) === 15L)

      // Partitioned target: load lands in the named partition, and
      // OVERWRITE replaces only that partition.
      val fp = stage.resolve("part_a.txt")
      java.nio.file.Files.writeString(fp, "10|x\n11|y\n")
      hs.sql("DROP TABLE IF EXISTS hcat_load_p")
      hs.sql("""CREATE TABLE hcat_load_p (id INT, name STRING)
                PARTITIONED BY (src STRING)
                ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
                STORED AS TEXTFILE""")
      hs.sql(s"LOAD DATA LOCAL INPATH '$fp' INTO TABLE hcat_load_p" +
        " PARTITION (src='a')")
      val fb = stage.resolve("part_b.txt")
      java.nio.file.Files.writeString(fb, "20|z\n")
      hs.sql(s"LOAD DATA LOCAL INPATH '$fb' INTO TABLE hcat_load_p" +
        " PARTITION (src='b')")
      assert(hs.table("hcat_load_p").count() === 3)
      val fo = stage.resolve("part_a2.txt")
      java.nio.file.Files.writeString(fo, "12|w\n")
      hs.sql(s"LOAD DATA LOCAL INPATH '$fo' OVERWRITE INTO TABLE" +
        " hcat_load_p PARTITION (src='a')")
      assert(hs.sql("SELECT id FROM hcat_load_p WHERE src='a'")
        .collect().map(_.getInt(0)).toSeq === Seq(12))
      assert(hs.sql("SELECT id FROM hcat_load_p WHERE src='b'")
        .collect().map(_.getInt(0)).toSeq === Seq(20))
    }
  }

  test("permanent CREATE FUNCTION persists in the metastore across sessions") {
    withHiveSession { hs =>
      // Hive-UDF-backed PERMANENT function (metastore FUNCS table) —
      // the reference's CREATE FUNCTION surface; class is the repo's
      // own hive-exec UDF subclass, already on the session classpath.
      hs.sql("DROP FUNCTION IF EXISTS hcat_titlecase")
      hs.sql("CREATE FUNCTION hcat_titlecase AS" +
        " 'graft.functions.HiveLegacyUdf'")
      assert(hs.sql("SELECT hcat_titlecase('hello WORLD') r")
        .head.getString(0) === "Hello World")

      // A NEW session over the same metastore resolves it without any
      // re-registration — the definition lives in the catalog, not in
      // session state (CREATE TEMPORARY FUNCTION would fail this hop).
      val s2 = hs.newSession()
      assert(s2.sql("SELECT hcat_titlecase('spark sql') r")
        .head.getString(0) === "Spark Sql")
      assert(s2.catalog.functionExists("hcat_titlecase"))
      // NULL flows through the reflective bridge as NULL.
      assert(s2.sql("SELECT hcat_titlecase(CAST(NULL AS STRING)) r")
        .head.isNullAt(0))
    }
  }
}
