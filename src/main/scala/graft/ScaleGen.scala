package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark-scaling dataset generator (NOT part of the query surface):
  * builds an N× replica of a driver-generated test dir so the scale
  * claims in SCALE.md can be MEASURED, not just argued (round-7 verdict
  * "Next round #1"). /root/testdata is read-only, so output lands under
  * the repo (gitignored), e.g. `scaledata/sf1` = 10× sf0.1.
  *
  *   sbt "runMain graft.ScaleGen /root/testdata/sf0.1 scaledata/sf1 10"
  *
  * Replication design — each replica r in 0..N-1 is a key-shifted copy
  * (replica 0 is the identity), chosen so per-query work scales ~N×
  * with the DISTRIBUTION of the original held fixed:
  *
  *  - Fact/dim keys shift by r × (max_key+1), consistently across
  *    tables (o_custkey moves with c_custkey, l_partkey with p_partkey
  *    ...), so every join keeps its per-replica selectivity and fan-out;
  *    replicas join only within themselves, exactly like TPC-H's scale
  *    factor. nation/region stay fixed (as in the driver's own sf0.01 →
  *    sf0.1 scaling), so per-nation group cardinality grows N× — the
  *    realistic direction: more rows per group, not more groups.
  *  - documents: doc_id shifts; TEXT passes through a per-replica
  *    seeded alphabet PERMUTATION (replica 0 = identity) — word
  *    lengths, token counts, doc lengths and the zipf shape survive
  *    exactly, but replicas share no vocabulary, so the duplicate/
  *    near-duplicate RATE of the corpus is constant as it grows (naive
  *    copies would multiply every dup-group size by N and quadratically
  *    blow up pair-generating queries — that would be measuring a
  *    different corpus, not a bigger one; a caesar ROTATION would
  *    collide past 26 replicas). n_chars stays truthful (a permutation
  *    preserves length).
  *  - embeddings: vec_id shifts; vectors get a per-replica ORTHOGONAL
  *    transform (circular dimension shift by r + deterministic sign
  *    flips). Orthogonality preserves every within-replica cosine/L2
  *    relation bit-for-bit in structure (the dedup/ANN geometry), while
  *    cross-replica similarity decays to noise — again: constant
  *    near-dup rate at N× rows.
  *  - events: event_id/user_id shift, timestamps unchanged — N× more
  *    users over the same time range, so sessionization/windows get N×
  *    more groups of the same size.
  */
object ScaleGen {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"
  private val AlphaU = Alpha.toUpperCase

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("scaledata/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tbl(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    // Consistent key offsets across tables (max+1 of the SOURCE domain).
    def off(name: String, key: String): Long =
      tbl(name).agg(max(col(key))).head.getLong(0) + 1L

    val kCust = off("customer", "c_custkey")
    val kSupp = off("supplier", "s_suppkey")
    val kPart = off("part", "p_partkey")
    val kOrd = off("orders", "o_orderkey")
    val kEvent = off("events", "event_id")
    val kUser = off("events", "user_id")
    val kDoc = off("documents", "doc_id")
    val kVec = off("embeddings", "vec_id")

    /** N key-shifted replicas; `f(df, r)` applies per-replica rewrites. */
    def reps(name: String)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(r => f(tbl(name), r)).reduce(_ unionByName _)

    def shift(df: DataFrame, r: Int, keys: (String, Long)*): DataFrame =
      keys.foldLeft(df) { case (d, (k, o)) =>
        d.withColumn(k, col(k) + lit(r * o)) }

    // Fixed dims: same 5 regions / 25 nations at every scale factor.
    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)

    write(reps("customer")(shift(_, _, "c_custkey" -> kCust)),
      "customer", 4)
    write(reps("supplier")(shift(_, _, "s_suppkey" -> kSupp)),
      "supplier", 1)
    write(reps("part")(shift(_, _, "p_partkey" -> kPart)), "part", 4)
    write(reps("orders")(
      shift(_, _, "o_orderkey" -> kOrd, "o_custkey" -> kCust)),
      "orders", 8)
    write(reps("lineitem")(shift(_, _, "l_orderkey" -> kOrd,
      "l_partkey" -> kPart, "l_suppkey" -> kSupp)), "lineitem", 32)
    write(reps("events")(
      shift(_, _, "event_id" -> kEvent, "user_id" -> kUser)),
      "events", 8)

    // documents: per-replica seeded alphabet permutation — vocabulary
    // disjoint across replicas (w.h.p. for any replica count), every
    // length/shape statistic preserved. Fisher-Yates driven by a
    // splitmix-style integer hash of (r, i): deterministic, no RNG
    // state shared across replicas.
    def perm(r: Int): String = {
      val a = Alpha.toCharArray
      var i = a.length - 1
      while (i > 0) {
        var z = (r.toLong << 16) + i
        z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
        z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
        z ^= z >>> 33
        val j = ((z % (i + 1)) + (i + 1)).toInt % (i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      new String(a)
    }
    write(reps("documents") { (df, r) =>
      val p = perm(r)
      shift(df, r, "doc_id" -> kDoc)
        .withColumn("text",
          if (r == 0) col("text")
          else translate(col("text"), Alpha + AlphaU, p + p.toUpperCase))
    }, "documents", 8)

    // embeddings: per-replica orthogonal transform — dimension circular
    // shift by r plus deterministic sign flips (replica 0 = identity).
    val dim = tbl("embeddings").select(size(col("embedding")))
      .head.getInt(0)
    write(reps("embeddings") { (df, r) =>
      val v =
        if (r == 0) col("embedding")
        else array((0 until dim).map { i =>
          val j = (i + r) % dim
          val sgn = if ((i * 7 + r * 13) % 3 == 0) -1.0f else 1.0f
          col("embedding").getItem(j) * lit(sgn)
        }: _*)
      shift(df, r, "vec_id" -> kVec).withColumn("embedding", v)
    }, "embeddings", 4)

    val counts = T.star.map { t =>
      s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}"
    }
    println(s"""{"scalegen":"$out","n":$n,"counts":"${counts.mkString(",")}"}""")
    spark.stop()
  }
}
