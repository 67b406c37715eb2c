package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Record-level fuzz for the legacy-container format bridges
  * (sources/LegacyDecode + AvroIO) — the MediaBlobsFuzzSpec contract
  * extended to the RDD-layer ingest paths: a corrupt RECORD (garbage
  * numeric bytes, wrong arity, overflowing digit strings, a schema the
  * writer never had) must cost one null-quarantined field/row, never a
  * thrown task, and well-formed records must decode exactly as before.
  * Container-level corruption stays with the Hadoop/Avro readers (see
  * the LegacyDecode scaladoc for the boundary).
  */
class LegacyBridgeFuzzSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def tmpDir(name: String): String =
    SparkTestBase.tmpDir(name).toString + "/data"

  test("parseLong: total on adversarial strings, exact on well-formed") {
    import sources.LegacyDecode.parseLong
    assert(parseLong("0") === 0L)
    assert(parseLong("-123") === -123L)
    assert(parseLong("999999999999999999") === 999999999999999999L)
    Seq(null, "", "-", "x", "12x", "x12", "1.5", " 1", "1 ",
      "9999999999999999999", "-9999999999999999999", // 19 digits: > Long-safe bound
      "99999999999999999999", "\u0001", "０１２" // full-width digits
    ).foreach(s => assert(parseLong(s) === null, s"parseLong($s)"))
  }

  test("SequenceFile text decode: corrupt records quarantine by null, never throw") {
    val s = spark
    import org.apache.hadoop.io.{LongWritable, Text}
    val p = tmpDir("graft-fuzz-seq")
    val records = Seq(
      "1\u0001ALGERIA\u00010",        // well-formed
      "2\u0001BRAZIL",                 // short arity: regionkey missing
      "x\u0001GARBAGE\u0001y",         // non-numeric keys
      "99999999999999999999\u0001OVERFLOW\u00013", // 20-digit key
      "",                              // empty record
      "4\u0001\u00012",                // empty name field
      "5\u0001EXTRA\u00011\u0001TRAILING") // arity too LONG: extra ignored
    s.sparkContext.parallelize(records, 2)
      .map(r => (new LongWritable(r.length.toLong), new Text(r)))
      .saveAsSequenceFile(p)
    val got = sources.LegacyDecode.readSeqDelimited(s, p, StructType(Seq(
        StructField("k", LongType), StructField("nm", StringType),
        StructField("rk", LongType))))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
      .toSet
    // one row per record — corrupt fields null, their siblings intact
    assert(got === Set(
      (Some(1L), Some("ALGERIA"), Some(0L)),
      (Some(2L), Some("BRAZIL"), None),
      (None, Some("GARBAGE"), None),
      (None, Some("OVERFLOW"), Some(3L)),
      (None, None, None),              // "": k parses null, nm/rk past the end
      (Some(4L), Some(""), Some(2L)),
      (Some(5L), Some("EXTRA"), Some(1L))))
  }

  test("RCFile projected read: garbage numerics and missing columns quarantine") {
    val s = spark
    import org.apache.hadoop.hive.serde2.columnar.{BytesRefArrayWritable, BytesRefWritable}
    import java.nio.charset.StandardCharsets.UTF_8
    val p = tmpDir("graft-fuzz-rc")
    // A 2-column legacy file READ as if it had 3 (projection asks for a
    // column the writer never had) with garbage in the numeric column.
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.hadoop.hive.ql.io.RCFileOutputFormat.setColumnNumber(conf, 2)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    val w = new org.apache.hadoop.hive.ql.io.RCFile.Writer(fs, conf,
      new org.apache.hadoop.fs.Path(p, "part-00000.rc"))
    Seq(("7", "GOOD"), ("oops", "BADKEY"), ("", "EMPTYKEY"),
        ("99999999999999999999", "OVERFLOW")).foreach { case (a, b) =>
      val v = new BytesRefArrayWritable(2)
      val ab = a.getBytes(UTF_8); val bb = b.getBytes(UTF_8)
      v.set(0, new BytesRefWritable(ab, 0, ab.length))
      v.set(1, new BytesRefWritable(bb, 0, bb.length))
      w.append(v)
    }
    w.close()
    val got = sources.LegacyDecode.readRcProjected(s, p, StructType(Seq(
        StructField("k", LongType), StructField("nm", StringType),
        StructField("rk", LongType))), Seq(0, 1, 2), minPartitions = 1)
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(got === Set(
      (Some(7L), Some("GOOD"), None),
      (None, Some("BADKEY"), None),
      (None, Some("EMPTYKEY"), None),
      (None, Some("OVERFLOW"), None)))
  }

  test("Avro read: writer-schema drift quarantines fields, never ClassCastException") {
    val s = spark
    import s.implicits._
    val p = tmpDir("graft-fuzz-avro")
    // writer schema: (k long, nm string, extra double)
    AvroIO.write(Seq((1L, "A", 0.5), (2L, "B", 1.5))
      .toDF("k", "nm", "extra"), p)
    // reader asks for: k as long (ok), nm as LONG (type drift → null),
    // gone as string (renamed/missing field → null), extra as double (ok)
    val got = AvroIO.read(s, p, StructType(Seq(
        StructField("k", LongType),
        StructField("nm", LongType),
        StructField("gone", StringType),
        StructField("extra", DoubleType))))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3))))
      .toSet
    assert(got === Set(
      (Some(1L), None, None, Some(0.5)),
      (Some(2L), None, None, Some(1.5))))
  }
}
