package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Type-strict oracle guard — the round-7 lesson, made permanent.
  *
  * The driver's hasher canonicalizes DuckDB HUGEINT (int128 — what DuckDB
  * widens `sum(BIGINT)` and `//` results to) differently from BIGINT, so an
  * oracle column left as HUGEINT hash-mismatches even when every value is
  * identical to the Spark BIGINT output. Round 7 shipped 15 such queries;
  * this spec DESCRIBEs every `SparkEntry.oracleSql` entry in DuckDB and
  * fails if any result column is HUGEINT (or JSON, which Spark writes as
  * VARCHAR) — so the channel can never ship silently again. The full
  * Spark-vs-oracle type comparison lives in tools/check_parity.py; this is
  * the cheap in-suite tripwire for the oracle side alone.
  */
class OracleTypesSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val banned = Seq("HUGEINT", "UHUGEINT", "JSON")

  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("no oracle SQL produces a HUGEINT/JSON-typed result column") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"testdata absent: $sfDir")
    val probe = os("python3", "-c", "import duckdb")
    assume(probe == 0, "python3+duckdb unavailable")

    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    val jsonFile = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(jsonFile, json)
    val py = Files.createTempFile("oracle_types", ".py")
    Files.writeString(py,
      s"""import duckdb, json, sys
         |tables = ["region","nation","customer","supplier","part","orders",
         |          "lineitem","events","documents","embeddings"]
         |con = duckdb.connect()
         |for t in tables:
         |    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
         |                f"read_parquet('$sfDir/{t}.parquet')")
         |oracle = json.load(open(sys.argv[1]))
         |banned = ${banned.map(b => s""""$b"""").mkString("(", ",", ")")}
         |bad = []
         |for name, sql in sorted(oracle.items()):
         |    for col, typ, *_ in con.execute(f"DESCRIBE ({sql})").fetchall():
         |        if any(b in typ for b in banned):
         |            bad.append(f"{name}.{col}: {typ}")
         |print("\\n".join(bad))
         |sys.exit(1 if bad else 0)
         |""".stripMargin)

    val out = new StringBuilder
    val code = scala.sys.process.Process(
      Seq("python3", py.toString, jsonFile.toString))
      .!(scala.sys.process.ProcessLogger(l => out ++= l + "\n", _ => ()))
    assert(code == 0,
      s"oracle columns typed ${banned.mkString("/")} — wrap in " +
        s"CAST(... AS BIGINT/VARCHAR):\n$out")
  }

  private def os(cmd: String*): Int =
    try scala.sys.process.Process(cmd).!(
      scala.sys.process.ProcessLogger(_ => (), _ => ()))
    catch { case _: Throwable => -1 }
}
