package graft

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro read/write WITHOUT the spark-avro connector (absent from this
  * classpath — only avro-core/avro-mapred ship): the Hadoop
  * AvroKey{Input,Output}Format bridged to DataFrames at the RDD layer.
  * This is the sanctioned "genuine per-partition imperative logic"
  * escape hatch — records are built/unpacked inside the partition, the
  * Avro Schema is re-parsed per partition (Schema isn't serializable),
  * and fields are extracted to plain values BEFORE any shuffle (AvroKey
  * isn't serializable either).
  *
  * Supports the scalar lattice the test tables need (long/double/
  * string); nullable via unions would extend the same way.
  */
object AvroIO {

  private def avroSchemaJson(schema: StructType): String = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case other => sys.error(s"unsupported avro mapping: $other")
      }
      // Nullable columns become Avro null-unions (null first so the
      // field default can be null).
      val t = if (f.nullable) s"""["null",$base]""" else base
      val dflt = if (f.nullable) ""","default":null""" else ""
      s"""{"name":"${f.name}","type":$t$dflt}"""
    }.mkString(",")
    s"""{"type":"record","name":"GraftRow","fields":[$fields]}"""
  }

  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema)
    val names = sparkSchema.fieldNames
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    df.rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(json)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        names.zipWithIndex.foreach { case (n, i) => rec.put(n, row.get(i)) }
        (new AvroKey[GenericRecord](rec), NullWritable.get)
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(s: SparkSession, path: String, schema: StructType): DataFrame = {
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val rdd = s.sparkContext.newAPIHadoopFile(path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .mapPartitions { it =>
        // Unpack to plain JVM values in-partition: Utf8 → String etc.
        // TYPE-CHECKED against the requested schema, quarantine-by-null
        // (the LegacyDecode contract): a file written with a different
        // schema — a renamed field (get returns null), a field whose
        // writer type disagrees with the requested one — yields null
        // for that field instead of a ClassCastException killing the
        // task when the mismatched value later hits the row encoder.
        // Int widens to Long (the one lossless legacy promotion).
        it.map { case (k, _) =>
          val rec = k.datum()
          // Record.get(String) THROWS AvroRuntimeException on a field
          // the writer schema lacks — look the field up first.
          def fld(n: String): AnyRef = {
            val f = rec.getSchema.getField(n)
            if (f == null) null else rec.get(f.pos())
          }
          Row.fromSeq(names.zip(types).map {
            // ASYMMETRY (documented, ADVICE r14): the StringType branch
            // stringifies ANY writer type (a long read as string yields
            // "123") — Avro's own promotion convention — while the
            // numeric branches below null type drift (the TYPE-CHECKED
            // quarantine). Callers must not assume drift always nulls:
            // only non-string targets quarantine.
            case (n, StringType) =>
              Option(fld(n)).map(_.toString).orNull
            case (n, t) => fld(n) match {
              case v: java.lang.Long if t == LongType => v
              case v: java.lang.Integer if t == LongType =>
                java.lang.Long.valueOf(v.longValue)
              case v: java.lang.Integer if t == IntegerType => v
              case v: java.lang.Double if t == DoubleType => v
              case _ => null
            }
          }.toIndexedSeq)
        }
      }
    s.createDataFrame(rdd, schema)
  }
}
