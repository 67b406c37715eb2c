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
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(names.zip(types).map {
            case (n, StringType) =>
              Option(rec.get(n)).map(_.toString).orNull
            case (n, _) => rec.get(n)
          }.toIndexedSeq)
        }
      }
    s.createDataFrame(rdd, schema)
  }
}
