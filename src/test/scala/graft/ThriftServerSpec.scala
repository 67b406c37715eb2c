package graft

import java.sql.DriverManager

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hive.service.cli.thrift.ThriftCLIService
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
import org.scalatest.funsuite.AnyFunSuite

/** HiveServer2 / JDBC entry point (SURVEY.md §3.2): the reference's #2
  * access path is a Thrift SQL endpoint (hive-service-rpc TCLIService)
  * driven by the hive-jdbc driver. Spark ships the same endpoint as
  * `HiveThriftServer2.startWithContext` — it binds to THIS session's
  * state, so temp views registered by the engine are queryable over the
  * wire. The spec round-trips a broadcast-join query through a real
  * JDBC connection (org.apache.hive.jdbc.HiveDriver, the on-disk
  * hive-jdbc-2.3.10 jar) and asserts parity with the DataFrame path.
  */
class ThriftServerSpec extends AnyFunSuite {
  import SparkTestBase._

  private val port = 10816 // fixed uncommon port; single-JVM test env

  test("JDBC clients get the same rows as the DataFrame path") {
    // The server's HiveConf is built from system properties + the
    // session's hadoop conf; session-conf propagation is unreliable
    // when another suite has already initialized Hive client state in
    // this JVM, so set BOTH, then connect to the port the Thrift
    // service ACTUALLY bound (the only race-proof source of truth).
    System.setProperty("hive.server2.thrift.port", port.toString)
    System.setProperty("hive.server2.thrift.bind.host", "127.0.0.1")
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    // GLOBAL temp views: each JDBC connection gets its own cloned
    // session, so plain temp views would be invisible over the wire.
    T.t(spark, sfDir, "nation").createOrReplaceGlobalTempView("hs2_nation")
    T.t(spark, sfDir, "region").createOrReplaceGlobalTempView("hs2_region")
    val sql =
      """SELECT r.r_name AS r_name, COUNT(*) AS n_nations,
        |       CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum
        |FROM global_temp.hs2_nation n
        |JOIN global_temp.hs2_region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r_name""".stripMargin
    val expected = spark.sql(sql).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      val boundPort = server.getServices.asScala.collectFirst {
        case t: ThriftCLIService => t.getPortNumber
      }.getOrElse(port)
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // The server binds asynchronously — retry the connect briefly.
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 60) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://127.0.0.1:$boundPort/default", "", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(500) }
      }
      assert(conn != null, s"could not connect to HS2 on port $boundPort")
      try {
        val rs = conn.createStatement().executeQuery(sql)
        val got = ArrayBuffer.empty[(String, Long, Long)]
        while (rs.next())
          got += ((rs.getString("r_name"), rs.getLong("n_nations"),
            rs.getLong("key_sum")))
        assert(got.toSeq === expected)
        assert(got.nonEmpty)
      } finally conn.close()
    } finally server.stop()
  }
}
