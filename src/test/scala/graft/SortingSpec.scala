package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CLUSTER BY contract: co-partitioned by key AND sorted within every
  * partition — the property the rows-only harness check can't see.
  */
class SortingSpec extends AnyFunSuite {
  import SparkTestBase._

  test("cluster-by layout is key-partitioned and sorted within partitions") {
    // Same CLUSTER BY layout q_cluster_by builds (that query now emits
    // the relational invariant aggregate for its oracle; the raw
    // partition-local sortedness contract is only observable here).
    val df = T.t(spark, sfDir, "lineitem")
      .repartition(col("l_orderkey"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val perPartition = df
      .select(spark_partition_id().as("pid"), col("l_orderkey"),
        col("l_linenumber"))
      .collect().groupBy(_.getInt(0))
    assert(perPartition.nonEmpty)
    for ((pid, rows) <- perPartition) {
      val keys = rows.map(r => (r.getLong(1),
        r.getAs[Number](2).longValue)).toSeq
      assert(keys === keys.sorted, s"partition $pid not sorted")
    }
    // Co-partitioning: a key never appears in two partitions.
    val keyParts = perPartition.toSeq
      .flatMap { case (pid, rows) => rows.map(r => (r.getLong(1), pid)) }
      .distinct.groupBy(_._1).values.map(_.size)
    assert(keyParts.forall(_ == 1), "an orderkey spans partitions")
  }
}
