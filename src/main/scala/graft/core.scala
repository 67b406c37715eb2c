package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One named capability: a Spark query plus (optionally) DuckDB oracle SQL
  * the driver hash-compares against. Name and column aliases MUST match
  * between the two (the driver sorts columns by name before hashing).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** A themed group of QueryDefs (joins, aggregates, windows, ...). */
trait QueryPack {
  def defs: Seq[QueryDef]

  /** Oracle-checked query. */
  protected def q(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), run)

  /** Rows-only query (no SQL-expressible oracle). */
  protected def qRows(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, run)
}

/** Table access + numeric helpers shared by all packs. */
object T {
  val star = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one test table. At 100 TB this is the same call against a
    * partitioned table root; Spark's file source handles split planning,
    * partition pruning and filter/column pushdown identically.
    *
    * `events.ts` has shipped as BOTH parquet INT64 TIMESTAMP(NANOS)
    * (earlier rounds) and TIMESTAMP(MICROS) (current driver generator),
    * so detect from the read schema and surface the SAME two columns
    * either way:
    *   - `ts_ns` BIGINT — exact epoch nanos, oracle twin is DuckDB
    *     `epoch_ns(ts)` (epoch_ns of a µs timestamp is exact)
    *   - `ts` TIMESTAMP — microsecond precision, oracle twin is
    *     `CAST(ts AS TIMESTAMP)` (DuckDB ns→us cast truncates the same
    *     way the nanos branch here does)
    * Nanos files: Spark 4 refuses TIMESTAMP(NANOS) as a timestamp
    * (PARQUET_TYPE_ILLEGAL), so the legacy nanosAsLong conf (set in
    * HiveCompatFunctions.ensure) reads them as raw BIGINT nanos —
    * integer `div` keeps the ns→µs math in long space (epoch nanos
    * ~1.7e18 exceed a double's 2^53 integer range; truncation = floor
    * for the non-negative nanos in the test data).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    HiveCompatFunctions.ensure(s)
    if (name == "events") {
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType => // TIMESTAMP(NANOS) file read as raw nanos
          raw.withColumn("ts_ns", col("ts"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          // TIMESTAMP(MICROS) file. isAdjustedToUTC=false makes Spark
          // read TIMESTAMP_NTZ; every session here pins
          // spark.sql.session.timeZone=UTC (Bench/Verify/SparkTestBase),
          // so the cast to TIMESTAMP is the identity instant mapping and
          // downstream code keeps the same TimestampType contract the
          // nanos branch always produced.
          val ts = col("ts").cast(TimestampType)
          raw.withColumn("ts", ts)
            .withColumn("ts_ns", unix_micros(ts) * lit(1000L))
      }
    } else s.read.parquet(s"$dir/$name.parquet")
  }

  /** True if dir's events.parquet stores ts as INT64 TIMESTAMP(NANOS)
    * (which the nanosAsLong conf surfaces as a raw BIGINT); false for
    * TIMESTAMP(MICROS) files. Callers that read events with an explicit
    * LongType schema (the streaming specs' file source) get the raw
    * int64 either way and use this to pick the µs conversion.
    */
  def eventsTsIsNanos(s: SparkSession, dir: String): Boolean = {
    HiveCompatFunctions.ensure(s)
    s.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType
  }

  /** Exact-decimal cast for money/quantity doubles. Summing doubles is
    * order-dependent (partial aggregation order differs run to run and
    * engine to engine); summing decimals is exact and associative, so the
    * Spark result and the DuckDB oracle agree bit-for-bit after the final
    * cast back to double. Scale 4 keeps 2-decimal money values unambiguous.
    */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum, surfaced as double (deterministic final cast). */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count, evaluated in
    * double exactly like the oracle's `CAST(SUM(..) AS DOUBLE)/COUNT(..)`.
    */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** Cross-engine-portable 60-bit hash: identical in Spark
    * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
    * (`('0x' || substr(md5(x),1,15))::BIGINT`) — 15 hex digits keep it
    * positive and inside BIGINT. Use whenever an ORACLE-CHECKED query
    * needs hash-based blocking/ordering (xxhash64 is Spark-only).
    */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Revenue pattern sum(price*(1-disc)): scale-8 decimal sum, rescaled
    * to 2 decimals (HALF_UP both engines — see q1 notes) before double.
    */
  def drev(p: Column, d: Column): Column =
    sum(dec(p) * (lit(1) - dec(d))).cast("decimal(38,2)").cast(DoubleType)

  /** Cross-statement scratch hygiene. Iterative operators and
    * shared-artifact memos persist eager localCheckpoint blocks that
    * outlive the query that made them; in a long-running session (the
    * bench harness, a Thrift server) they accumulate without bound and
    * the storage pressure evicts later queries' working blocks
    * (measured: q_cluster_kmeans 1.3 s in isolation → 6.8 s once ~100
    * queries of scratch preceded it). `releaseScratch` is the
    * between-statements hook: drop every persisted RDD EXCEPT those
    * registered through `pinning` — artifacts that must outlive their
    * creating query (Dedup's memoized pair graph). Pinned checkpoints
    * have truncated lineage, so unpersisting them would break later
    * consumers; they are few and bounded by design.
    */
  private val pinnedRdds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Run `build` and pin any RDD it persists so releaseScratch keeps it.
    * Serial-harness contract: no concurrent persists in this session
    * while `build` runs (true for Bench/Verify/ScalaTest here).
    */
  def pinning[A](s: SparkSession)(build: => A): A = {
    val before = s.sparkContext.getPersistentRDDs.keySet
    val out = build
    (s.sparkContext.getPersistentRDDs.keySet -- before)
      .foreach(pinnedRdds.add(_))
    out
  }

  /** Drop all unpinned persisted blocks a statement left behind.
    * BLOCKING: the async form left removal racing the next statement,
    * so on a large-heap JVM (the driver runs ~88 g) tens of GB of dead
    * scratch stayed resident in old gen and G1's concurrent-mark cycles
    * traced it continuously, stealing CPU from the 32 executor threads.
    * Callers sit in untimed gaps, so the synchronous wait is free.
    */
  def releaseScratch(s: SparkSession): Unit =
    s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedRdds.contains(id)) rdd.unpersist(blocking = true)
    }

  /** Process-scoped scratch dir (session warehouses of the Bench /
    * Verify / Explain mains), deleted recursively at JVM exit — every
    * harness run otherwise leaks one `graft-wh*` dir (complete with
    * any q_ddl_* table data) into /tmp for the box's lifetime, the
    * r15 hygiene sweep's second-largest debris class after the spec
    * temp dirs.
    */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(d: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(d)) {
          val st = java.nio.file.Files.list(d)
          try st.forEach(rm(_)) finally st.close()
        }
        java.nio.file.Files.deleteIfExists(d); ()
      }
      try rm(p) catch { case _: Throwable => () }
    }))
    p.toString
  }

  /** Content fingerprint of one test table: md5 over the sorted
    * (path, size, mtime) listing of `$dir/$name.parquet` (file or
    * directory). Setup-once memos (the BPE merge table, ANALYZEd stats
    * tables) keyed by data-dir PATH alone silently go stale if the
    * dir's parquet is regenerated in-process; keying on this makes them
    * self-invalidate, and it costs one directory listing — no data read.
    */
  def contentTag(dir: String, name: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(dir, s"$name.parquet")
    val files: Seq[Path] =
      if (Files.isDirectory(root)) {
        val st = Files.walk(root)
        try st.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        finally st.close() // walk holds a directory fd until closed
      } else if (Files.exists(root)) Seq(root)
      else Seq.empty
    val sig = files.map(_.toString).sorted.map { p =>
      val path = Paths.get(p)
      s"$p:${Files.size(path)}:${Files.getLastModifiedTime(path).toMillis}"
    }.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(8)
      .map("%02x".format(_)).mkString
  }

  /** DuckDB-side twins of dec/dsum/davg for oracle SQL strings. */
  def oDec(e: String): String = s"CAST($e AS DECIMAL(18,4))"
  def oSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
  def oAvg(e: String): String =
    s"(CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE) / COUNT($e))"
  def oRev(p: String, d: String): String =
    s"CAST(ROUND(SUM(${oDec(p)} * (1 - ${oDec(d)})), 2) AS DOUBLE)"
}
