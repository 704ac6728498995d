package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.chaining._

/** Plan-fingerprint artifact (NEXT r15 candidate #4): one canonical
  * line per declared query — operator count, Exchange count, codegen
  * span count, and an md5 fingerprint of the CANONICALIZED formatted
  * physical plan — written to a committed file so plan regressions
  * diff textually in review (a broadcast silently degrading to SMJ, a
  * pushdown lost, a new Exchange appearing shows up as a one-line diff
  * long before a bench regression localizes it).
  *
  * Canonicalization strips everything run-specific: expression ids
  * (#123), plan ids, checkpoint RDD ids, file paths/sizes/statistics,
  * memory addresses. What remains is the plan SHAPE: the operator
  * tree, join strategies, partitioning, pushed filters.
  *
  * Queries that call localCheckpoint(true) during construction execute
  * their prelude eagerly — the dump therefore runs at sf0.001 (the
  * smoke corpus) and takes minutes, not the gate's cost.
  *
  * Usage: runMain graft.PlanDump [sfDir] [outFile]
  */
object PlanDump {
  def canonicalize(plan: String): String = plan
    .replaceAll("#\\d+L?", "#x")
    .replaceAll("plan_id=\\d+", "plan_id=x")
    .replaceAll("ExistingRDD\\[[^\\]]*\\]", "ExistingRDD[x]")
    .replaceAll("Location: [^\\n]*", "Location: x")
    .replaceAll("file:[^,\\]\\s)]*", "file:x")
    .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
    .replaceAll("size=[^,)\\s]*", "size=x")
    .replaceAll("rowCount=\\d+", "rowCount=x")
    .replaceAll("@[0-9a-f]{6,}", "@x")
    .replaceAll("cp-[0-9a-f-]+", "cp-x")
    .replaceAll("rdd_\\d+_\\d+", "rdd_x")
    // run-global RDD id counters (localCheckpoint scans)
    .replaceAll("RDD\\[\\d+\\]", "RDD[x]")
    // JIT-assigned lambda class suffixes vary per JVM launch
    .replaceAll("Lambda\\$\\d+/0x[0-9a-f]+", "Lambda\\$x")
    // Catalyst lambda-variable names carry a session-global counter
    // that shifts whenever ANY query is added before this one
    .replaceAll("\\bx_\\d+#x", "x_n#x")
    // builder-local temp dirs (kpl archive roundtrip, format codecs)
    .replaceAll("/tmp/[^,\\]\\s)]*", "/tmp/x")
    // streaming state info: per-run UUID + batch timestamp
    .replaceAll("runId = [0-9a-f-]{36}", "runId = x")
    .replaceAll("\\b1[0-9]{12}\\b", "epochms")
    // the multi-distinct Expand rewrite binds gid->column via a hash-
    // ordered Map (Catalyst-internal, semantically irrelevant): drop
    // the double-bracketed branch payload, keep the operator + counts
    .replaceAll("(?m)^(Arguments: \\[\\[).*$", "$1x]]")
    // ... and its gid numbering + partitioning-key order leak further
    // downstream: neutralize the gid literals, sort the
    // hashpartitioning key list, and sort attribute lists so the
    // fingerprint tracks plan SHAPE, not hash-map iteration order
    .replaceAll("gid#x = \\d+", "gid#x = n")
    // partition COUNTS are session config (local[4] tests vs local[8]
    // dumps vs 32-thread bench), not plan shape — blind them so the
    // same plan fingerprints identically from any session
    .pipe(s => "hashpartitioning\\(([^()]*)\\)".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement("hashpartitioning(" +
        m.group(1).split(",").map(_.trim)
          .map(p => if (p.forall(_.isDigit)) "n" else p)
          .sorted.mkString(", ") + ")")))
    .replaceAll("(rangepartitioning\\([^()]*), \\d+\\)", "$1, n)")
    .replaceAll("Partitioning\\(\\d+\\)", "Partitioning(n)")
    .replaceAll("numPartitions = \\d+", "numPartitions = n")
    .linesIterator.map(sortAttrList).mkString("\n")

  private val AttrLine =
    ("^((?:Input|Output|Keys|Functions|Results|Aggregate Attributes)" +
      " \\[\\d+\\]: \\[)(.*)(\\])$").r

  /** Sort a bracketed attribute list on depth-0 commas (paren-aware —
    * nested calls like f(a, b) stay intact). */
  private[graft] def sortAttrList(line: String): String = line match {
    case AttrLine(pre, body, post) =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      body.foreach {
        case c @ ('(' | '[') => depth += 1; cur.append(c)
        case c @ (')' | ']') => depth -= 1; cur.append(c)
        case ',' if depth == 0 => parts += cur.result().trim; cur.clear()
        case c => cur.append(c)
      }
      if (cur.nonEmpty) parts += cur.result().trim
      pre + parts.sorted.mkString(", ") + post
    case _ => line
  }

  def fingerprint(name: String, plan: String): String = {
    val canon = canonicalize(plan)
    val heads = "(?m)^\\(\\d+\\) ([A-Za-z][A-Za-z0-9_]*)".r
      .findAllMatchIn(canon).map(_.group(1)).toSeq
    val ex = heads.count(_.contains("Exchange"))
    val spans = "codegen id : (\\d+)".r
      .findAllMatchIn(canon).map(_.group(1)).toSet.size
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    f"$name%-36s ops=${heads.size}%-4d exchanges=$ex%-3d " +
      f"codegen_spans=$spans%-3d md5=${md.take(12)}"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    val dbg = sys.env.get("PLANDUMP_DEBUG_DIR")
    dbg.foreach(p => new java.io.File(p).mkdirs())
    val lines = SparkEntry.defs.sortBy(_.name).map { q =>
      try {
        val df = q.fn(spark, sfDir)
        val txt = df.queryExecution.explainString(mode)
        dbg.foreach(p => Files.writeString(Paths.get(s"$p/${q.name}.txt"),
          canonicalize(txt)))
        fingerprint(q.name, txt)
      } catch {
        case e: Throwable =>
          f"${q.name}%-36s ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").takeWhile(_ != '\n').take(80)
      }
    }
    val header = Seq(
      s"# Plan fingerprints over ${lines.size} declared queries at $sfDir",
      "# <name> ops=<operator count> exchanges=<Exchange count> " +
        "codegen_spans=<WholeStageCodegen spans> md5=<canonical-plan hash>",
      "# Regenerate: sbt \"runMain graft.PlanDump\" — run-specific ids/" +
        "paths/stats are canonicalized away; any diff is a plan change.")
    Files.writeString(Paths.get(out),
      (header ++ lines).mkString("", "\n", "\n"))
    println(s"[plandump] ${lines.size} fingerprints -> $out")
    spark.stop()
  }
}
