package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A declared query: (session, sf-dir) => result frame. Every query is
    * deterministic (total ORDER BY with a unique tie-break; doubles
    * rounded; timestamps rendered at second precision or coarser) so the
    * driver can hash-compare it against its DuckDB oracle.
    */
  type Q = (SparkSession, String) => DataFrame
}
