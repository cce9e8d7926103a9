package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame pipeline plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * used by the external correctness gate.
  *
  * Contract notes (driver compare):
  *  - result columns are hash-compared after sorting by NAME — every
  *    computed column must carry the same alias in both `run` and `oracle`;
  *  - double aggregates must be order-independent across engines — sum via
  *    DECIMAL cast, then cast the final value back to DOUBLE;
  *  - every query ends with a total deterministic ORDER BY.
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
