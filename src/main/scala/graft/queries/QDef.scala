package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: Spark plan + (optionally) the equivalent DuckDB SQL
  * for the driver's oracle compare. `sql = None` → rows-only check; such
  * queries must carry their own ScalaTest/ScalaCheck coverage.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

/** Cross-engine determinism helpers.
  *
  * Floating-point SUM over shuffled partitions is order-dependent; at 60k+
  * rows the Spark-vs-DuckDB drift exceeds any sane rounding. So every sum
  * over a double column first casts to an exact DECIMAL(30,6): both engines
  * round the identical per-row double the same way (no representable ties at
  * scale 6), sum exactly, and cast the identical decimal back to double.
  * This also makes ORDER BY on aggregated measures deterministic, which a
  * `round()`-only approach would not.
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** Batch-mode transformWithState spins up an EPHEMERAL RocksDB state
    * store; its load path reports snapshot-upload lag to the
    * StateStoreCoordinator RPC endpoint — which only a STREAMING query
    * manager registers on the driver. In a batch-only session the lookup
    * dies with RpcEndpointNotFoundException inside loadStateStore.
    * Touching `s.streams` instantiates the session's
    * StreamingQueryManager, whose construction registers the coordinator
    * endpoint (public API, no query started); the lag report itself is
    * telemetry we also switch off. */
  private[queries] def prepBatchStateStore(s: SparkSession): Unit = {
    s.streams
    s.conf.set(
      "spark.sql.streaming.stateStore.coordinatorReportSnapshotUploadLag",
      "false")
  }

  private val Dec = DecimalType(30, 6)

  /** Exact sum of a double expression; deterministic across engines. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Decomposed dsum for re-aggregation (pre-agg then rollup/cube): the
    * partial keeps the exact decimal sum; the merge re-sums partials and
    * casts once — sum(dsumPart) ∘ dsumMerge ≡ dsum, exactly. */
  def dsumPart(c: Column): Column = sum(c.cast(Dec))
  def dsumMerge(c: Column): Column = sum(c).cast("double")

  /** Exact average (decimal sum / count); deterministic across engines. */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast("double") / count(c)).cast("double")

  /** DuckDB-side equivalents of dsum/davg (keep in sync with the above). */
  def sqlDsum(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE) / count($e) AS DOUBLE)"
}
