package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping.
  *
  * Partition pruning (see `q_scan_pruned`) skips on ONE column; a 100 TB
  * table queried by 2-D boxes (part × supplier, lat × lon, time × tenant)
  * needs rows that are close in BOTH dimensions to be close on disk, so
  * parquet row-group min/max stats can skip files for 2-D predicates.
  * Interleaving the bits of the two keys gives a single sort key with that
  * property; `repartitionByRange` + `sortWithinPartitions` on it yields
  * the clustered layout (the same recipe Delta/Iceberg `ZORDER BY` uses).
  *
  * Everything here composes built-in codegen'd functions (shifts, masks,
  * adds) — no UDF, stays inside whole-stage codegen, and has an exact
  * ANSI-SQL twin for the DuckDB oracle.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative integral
    * columns: result bit 2i is bit i of `a`, bit 2i+1 is bit i of `b`.
    * `bits` ≤ 31 (2·bits must fit a long). Keys wider than `bits` bits
    * should be range-quantized first (catalog/footer stats give the
    * bounds); the TPC-H keys used by the declared query fit directly. */
  def zvalue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftrightunsigned(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB-side twin of [[zvalue]] — keep in sync bit-for-bit. */
  def sqlZ(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " + ", ")")

  /** Driver-side data-skipping audit: of the parquet files under `dir`,
    * how many contain a row group whose [min,max] statistics on BOTH
    * `colA` and `colB` admit the box `colA ≤ hiA ∧ colB ≤ hiB`? This is
    * the exact file set a stats-aware reader must touch for the box —
    * measured from footer metadata alone (the `Tables.rowCount` pattern:
    * a driver-side footer read, NO Spark job). Returns
    * (filesOverlapping, filesTotal). */
  def filesOverlappingBox(spark: org.apache.spark.sql.SparkSession,
      dir: String, colA: String, hiA: Long, colB: String, hiB: Long): (Int, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    val files = fs.listStatus(path).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    var overlapping = 0
    files.foreach { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val hits = reader.getFooter.getBlocks.asScala.exists { block =>
          def minOf(c: String): Option[Long] =
            block.getColumns.asScala
              .find(_.getPath.toDotString == c)
              .flatMap(cc => Option(cc.getStatistics))
              .collect { case s: org.apache.parquet.column.statistics.LongStatistics
                if !s.isEmpty => s.genericGetMin.longValue() }
          (minOf(colA), minOf(colB)) match {
            case (Some(ma), Some(mb)) => ma <= hiA && mb <= hiB
            case _ => true // missing stats: a reader must scan it
          }
        }
        if (hits) overlapping += 1
      } finally reader.close()
    }
    (overlapping, files.length)
  }

  /** Reference interleave for tests. */
  def zvalueRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
