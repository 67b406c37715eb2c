package graft.functions

import org.apache.hadoop.hive.ql.exec.UDF

/** A classic Hive simple UDF (reference surface: `CREATE FUNCTION ...
  * AS 'class'` resolved via hive-exec's reflection-based UDF bridge —
  * jar-verified `org.apache.hadoop.hive.ql.exec.UDF` in
  * hive-exec-2.3.10-core). Spark's HiveSessionCatalog loads exactly
  * this shape for PERMANENT functions persisted in the metastore FUNCS
  * table, which is what HiveCatalogSpec exercises: create once, use
  * from a brand-new session without re-registering.
  *
  * Deliberately trivial logic (initial-caps a string) — the thing under
  * test is catalog persistence + the UDF bridge, not string handling.
  */
class HiveLegacyUdf extends UDF {
  def evaluate(s: String): String =
    if (s == null) null
    else s.split(" ", -1).map { w =>
      if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase
    }.mkString(" ")
}
