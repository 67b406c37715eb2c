package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** Property fuzz for the native signature kernels: on RANDOM token
  * arrays (unicode, empty strings, duplicates, single chars — shapes
  * the documents corpus never produces), minhash_sigs and simhash64
  * must stay BIT-identical to the composed/relational Spark forms they
  * replace. A divergence here means LSH bands silently change.
  */
object KernelLawsSpec extends Properties("KernelLaws") {
  import SparkTestBase._

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const(""),
    Gen.oneOf("é", "日本語", "🙂", "a b", "\tx", "ß"),
    Gen.choose('a', 'e').map(_.toString))

  private val tokens: Gen[List[String]] =
    Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, token))

  property("minhash_sigs(arr, 8) == composed array_min(transform(...))") =
    Prop.forAllNoShrink(Gen.listOfN(5, tokens)) { rows =>
      import spark.implicits._
      HiveCompatFunctions.ensure(spark)
      val composed = (0 until 8).map(k =>
        expr(s"array_min(transform(arr, v -> xxhash64($k, v)))"))
      rows.toDF("arr")
        .withColumn("native", expr("minhash_sigs(arr, 8)"))
        .withColumn("composed", array(composed: _*))
        .filter(col("native") =!= col("composed"))
        .count() == 0L
    }

  property("simhash64(arr) == relational explode/count/sum form") =
    Prop.forAllNoShrink(Gen.listOfN(5, tokens)) { rows =>
      import spark.implicits._
      HiveCompatFunctions.ensure(spark)
      val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
      val tok = df.select(col("id"), explode(col("arr")).as("tokv"))
        .groupBy("id", "tokv").agg(count(lit(1)).as("cnt"))
        .withColumn("h", xxhash64(col("tokv")))
      val bitSums = (0 until 64).map(j =>
        sum(when(expr(s"(h >> $j) & 1") === 1, col("cnt"))
          .otherwise(-col("cnt"))).as(s"s$j"))
      val sums = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      val sig = (0 until 64).map(j =>
        shiftleft(when(col(s"s$j") > 0, 1L).otherwise(0L), j))
        .reduce(_ bitwiseOR _)
      val rel = sums.select(col("id"), sig.as("rel"))
      df.select(col("id"), expr("simhash64(arr)").as("native"))
        .join(rel, "id")
        .filter(col("native") =!= col("rel"))
        .count() == 0L
    }

  property("simhash60(arr) == relational form over the portable md5 h60 hash") =
    Prop.forAllNoShrink(Gen.listOfN(5, tokens)) { rows =>
      import spark.implicits._
      HiveCompatFunctions.ensure(spark)
      val df = rows.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
      val tok = df.select(col("id"), explode(col("arr")).as("tokv"))
        .groupBy("id", "tokv").agg(count(lit(1)).as("cnt"))
        // The exact portable hash the kernel must reproduce: first 15
        // md5 hex digits as a BIGINT (== DuckDB's ('0x'||...)::BIGINT).
        .withColumn("h",
          expr("CAST(conv(substr(md5(tokv), 1, 15), 16, 10) AS BIGINT)"))
      val bitSums = (0 until 60).map(j =>
        sum(when(expr(s"(h >> $j) & 1") === 1, col("cnt"))
          .otherwise(-col("cnt"))).as(s"s$j"))
      val sums = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      val sig = (0 until 60).map(j =>
        shiftleft(when(col(s"s$j") > 0, 1L).otherwise(0L), j))
        .reduce(_ bitwiseOR _)
      val rel = sums.select(col("id"), sig.as("rel"))
      df.select(col("id"), expr("simhash60(arr)").as("native"))
        .join(rel, "id")
        .filter(col("native") =!= col("rel"))
        .count() == 0L
    }
}
