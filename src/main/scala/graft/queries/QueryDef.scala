package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's surface: a Spark implementation plus (when
  * ANSI-SQL-expressible) an equivalent DuckDB oracle. The driver's t2 gate
  * hash-compares the two on identical parquet inputs (Verify.scala), so:
  *   - column names and types must match exactly between the two forms;
  *   - output must be deterministically ordered (ORDER BY a unique key set);
  *   - doubles must come from exact decimal accumulation (Det.dsum) or
  *     deterministic rounding (Det.rdet) — see graft.functions.Det.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
