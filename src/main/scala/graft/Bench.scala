package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query, one JSON line out.
  *
  * Harness notes (VERDICT r1 #6-#8, r2 advice): queries run in the STABLE
  * registry order (`SparkEntry.all`, a Seq — not an unordered Map); a
  * warm-up pass touches EVERY test table (parquet footer/IO first-touch)
  * plus one full query (codegen/catalog init); each query is timed
  * `iters` times and the MEDIAN reported (kills GC/AQE noise on trivial
  * inputs); failed queries are listed in `failed` and contribute NOTHING
  * to `queries` or `total`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
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

    // Warm-up (untimed): every table once (footer/IO), one query (codegen).
    T.star.foreach { n =>
      try T.t(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    try SparkEntry.all.head.run(spark, sfDir).count()
    catch { case _: Throwable => () }

    var failed = List.empty[String]
    val results = SparkEntry.all.flatMap { d =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try { d.run(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      if (times.isEmpty) { failed ::= d.name; None }
      else Some(d.name -> times.sorted.apply(times.size / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
