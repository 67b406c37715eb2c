package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * primitive (Hive's `CLUSTERED BY` covers one dimension; lakehouse
  * engines expose this as `OPTIMIZE ... ZORDER BY`). Interleaving the
  * bits of two key columns makes rows that are close in BOTH
  * dimensions land in the same files, so parquet min/max row-group
  * stats prune scans filtered on EITHER dimension — the way a 100 TB
  * table stays queryable on its second and third access patterns
  * without a second sorted copy.
  *
  * Pure bit arithmetic on codegen'd built-ins (shift/and/or): no UDF,
  * no shuffle beyond the one range-partition of the clustered write,
  * and the same integer math is expressible in ANSI SQL, so the key
  * itself is oracle-checkable bit for bit.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (the classic mask-shift cascade). Inputs are taken
    * mod 2^16: keys wider than 16 bits keep CORRECTNESS (the key is
    * only a layout hint) but lose locality — rescale or bucket such
    * columns first. Date/timestamp dimensions should enter as DAY
    * ORDINALS (datediff from an epoch): parquet row-group stats on
    * timestamp_ntz columns are not used for pruning (measured in
    * ZOrderSpec — a pushed timestamp filter still scans every row
    * group), while BIGINT stats prune as expected.
    */
  def spread16(c: Column): Column = {
    val x0 = pmod(c.cast("long"), lit(65536L))
    val x1 = (x0 bitwiseOR shiftleft(x0, 8)) bitwiseAND lit(0x00FF00FFL)
    val x2 = (x1 bitwiseOR shiftleft(x1, 4)) bitwiseAND lit(0x0F0F0F0FL)
    val x3 = (x2 bitwiseOR shiftleft(x2, 2)) bitwiseAND lit(0x33333333L)
    (x3 bitwiseOR shiftleft(x3, 1)) bitwiseAND lit(0x55555555L)
  }

  /** 32-bit Morton key: x in even bits, y in odd bits. */
  def zkey(x: Column, y: Column): Column =
    spread16(x) bitwiseOR shiftleft(spread16(y), 1)

  /** Write `df` clustered by zkey(x, y) into `files` files: range-
    * partition on the key so each file owns one compact z-interval
    * (both dimensions ~sqrt-narrow per file), sort within partitions
    * so row groups inside a file are narrower still. The key column is
    * dropped before the write — it is a layout decision, not data.
    */
  def writeClustered(df: DataFrame, x: Column, y: Column, files: Int,
      path: String): Unit =
    df.withColumn("__zkey", zkey(x, y))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
}
