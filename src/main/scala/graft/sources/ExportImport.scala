package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{JArray, JString}
import org.json4s.jackson.JsonMethods

/** EXPORT / IMPORT table surface — the reference's table-replication
  * path (`[jar]` hive-exec-2.3.10-core.jar
  * `ql/parse/{ExportSemanticAnalyzer, ImportSemanticAnalyzer}.class`).
  * Hive's EXPORT writes a self-describing bundle: `_metadata` (a
  * serialized table definition) next to the table's data files, and
  * IMPORT recreates the table anywhere from that bundle alone — no
  * metastore lookup on the receiving side.
  *
  * Spark-first twin: `_metadata.json` carries the schema (Catalyst
  * DataType JSON — types survive exactly, including DECIMAL scale and
  * timestamps), the partition spec and the format; data lands under
  * `dir/data/` in the table's own layout with partition directories
  * preserved. An imported partitioned table therefore keeps partition
  * PRUNING — what makes export/import a usable replication mechanism
  * at scale, not just a backup dump.
  *
  * Scale: export is one distributed write (no driver data path) — a
  * 100 TB export is the same `df.write.partitionBy(...)` job as any
  * table copy; import is metadata-only until an action runs, and the
  * stored schema means NO inference scan over the imported files.
  */
object ExportImport {

  /** EXPORT TABLE ... TO `dir`: self-describing bundle
    * (`dir/_metadata.json` + parquet files under `dir/data/`, one
    * subdirectory per partition value when partitioned).
    */
  def exportTable(df: DataFrame, dir: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(s"$dir/data")
    val parts = partitionBy.map("\"" + _ + "\"").mkString("[", ",", "]")
    // df.schema.json is the full-fidelity Catalyst schema (kept in the
    // original column order, partition columns included).
    val meta = s"""{"version":1,"format":"parquet","partitionCols":$parts,
                  |"schema":${df.schema.json}}""".stripMargin
    Files.writeString(Paths.get(dir, "_metadata.json"), meta)
  }

  /** IMPORT TABLE FROM `dir`: rebuild the DataFrame from the bundle —
    * stored schema applied explicitly (no inference scan), original
    * column order restored (a partitioned write moves partition columns
    * last on disk; the metadata remembers where they belong).
    */
  def importTable(s: SparkSession, dir: String): DataFrame = {
    val jv = JsonMethods.parse(Files.readString(Paths.get(dir, "_metadata.json")))
    val schema = DataType.fromJson(
      JsonMethods.compact(JsonMethods.render(jv \ "schema")))
      .asInstanceOf[StructType]
    (jv \ "format") match {
      case JString("parquet") => ()
      case other => throw new IllegalArgumentException(
        s"unsupported export format: $other")
    }
    s.read.schema(schema).parquet(s"$dir/data")
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Partition columns recorded in the bundle (for catalog recreation). */
  def partitionCols(dir: String): Seq[String] =
    (JsonMethods.parse(Files.readString(Paths.get(dir, "_metadata.json")))
      \ "partitionCols") match {
      case JArray(xs) => xs.collect { case JString(p) => p }
      case _ => Nil
    }
}
