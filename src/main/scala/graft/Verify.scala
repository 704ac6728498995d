package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args beyond <sfDir> <outDir> (builder-local use): run only the named
    // queries and emit only their oracle entries — fast single-query parity
    // iteration; the driver always calls with exactly two args.
    val Array(sfDir, outDir) = args.take(2)
    // Fail fast (ADVICE r12): SPARK_GRAFT_SEM_K is a measurement-only
    // override that moves the Spark engine's k while the DuckDB oracle
    // derives k from the corpus — a gated run with it set would produce
    // silently engine-divergent results, so the gate refuses to start.
    require(!sys.env.contains("SPARK_GRAFT_SEM_K"),
      "SPARK_GRAFT_SEM_K is a ScaleProof measurement knob; unset it " +
        "for correctness runs (the oracle derives k from the corpus)")
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // data-size-derived AQE seed (see graft.Bench / Tables.
      // derivedInitPartitions): identity at the gate SFs (≤ 17.5 MB ⇒
      // clamp to cpus), scale-adaptive on bigger corpora
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS",
          graft.tables.Tables.derivedInitPartitions(sfDir, cpus.toInt)
            .toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // timestamp annotations vary by testdata regen: TIMESTAMP(NANOS)
      // reads as ns-Long under this flag, naive µs reads as
      // TIMESTAMP_NTZ; Tables.normalizeEventTs dispatches on the read
      // type and normalizes either to µs TimestampType
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
