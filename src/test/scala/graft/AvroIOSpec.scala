package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AvroIO round-trip properties the oracle query can't see: null
  * values, all supported scalar types, and multi-partition writes.
  */
class AvroIOSpec extends AnyFunSuite {
  import SparkTestBase._

  test("nulls and all scalar types survive the round-trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(7)),
      (2L, None, None, None),
      (3L, Some(""), Some(-0.0), Some(-1))
    ).toDF("id", "s", "d", "i")
      .select(col("id"), col("s"),
        col("d").cast("double").as("d"), col("i").cast("int").as("i"))
    val path = SparkTestBase.tmpDir("graft-avro-test").toString + "/rt"
    AvroIO.write(df.repartition(3), path)
    val back = AvroIO.read(spark, path, df.schema)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }
}
