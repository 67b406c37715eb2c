package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole suite (same conf shape as
  * Verify/Bench: UTC, low shuffle partitions, temp warehouse).
  */
object SparkTestBase {
  val sfDir = "/root/testdata/sf0.001"

  /** Suite-scoped temp dir, deleted recursively when the forked test
    * JVM exits — `sbt test` must leave /tmp net-unchanged (r15 hygiene:
    * hundreds of graft-acid-spec and stage dirs, ~674 MB, had
    * accumulated across runs — a measured bench pollutant).
    * Every spec uses this instead of raw Files.createTempDirectory.
    */
  private val tmpDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs.add(p)
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(d: java.nio.file.Path): Unit = {
          if (java.nio.file.Files.isDirectory(d)) {
            val st = java.nio.file.Files.list(d)
            try st.forEach(rm(_)) finally st.close()
          }
          java.nio.file.Files.deleteIfExists(d); ()
        }
        tmpDirs.forEach(d => try rm(d) catch { case _: Throwable => () })
      }))
    p
  }

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        SparkTestBase.tmpDir("graft-test-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(s)
  }
}
