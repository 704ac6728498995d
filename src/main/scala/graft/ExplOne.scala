package graft
import org.apache.spark.sql.SparkSession
object ExplOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val df = SparkEntry.queries("q_welch_ttest")(spark, "/root/testdata/sf0.001")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)),
      PlanDump.canonicalize(df.queryExecution.explainString(mode)))
    spark.stop()
  }
}
