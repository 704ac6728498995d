package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.kinesis._
import graft.tables.Tables._

/** Declared queries exposing the reference-fidelity sink pipeline as
  * observable DataFrames: greedy size-bounded packing stats and a full
  * pack→wire→decode round trip. Greedy packing is order- and
  * size-dependent emission — inexpressible as a SQL aggregate, hence
  * `mapPartitions` (SURVEY §7.2) and rows-only driver checks; the exact
  * invariants are ScalaCheck-tested in KinesisSpec.
  */
object KinesisQueries {

  private val statsSchema = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("batch_seq", IntegerType, nullable = false),
    StructField("num_records", IntegerType, nullable = false),
    StructField("size_bytes", IntegerType, nullable = false),
    StructField("wire_bytes", IntegerType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false)))

  val all: Seq[QDef] = Seq(

    // Pack lineitem rows (CSV-serialized payloads) into KPL aggregates,
    // 8 hash buckets — each bucket packed independently inside
    // mapPartitions, the exact shape of the distributed sink. Output is
    // one row per emitted aggregate with its wire-size bookkeeping and a
    // decode round-trip flag.
    QDef("q_kinesis_pack_stats",
      (s, d) => {
        val ehks = ShardModel.evenRanges(4).map { case (lo, hi) =>
          lo.add(hi.subtract(lo).divide(java.math.BigInteger.TWO)).toString
        }.toArray
        val packed = lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
              col("l_linenumber"), col("l_quantity"), col("l_extendedprice")).as("payload"))
          .repartition(8, pmod(col("l_orderkey"), lit(8)))
          .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
        val rdd = packed.select(col("payload")).rdd.mapPartitionsWithIndex { (pid, rows) =>
          val router = new ShardModel.Router(ehks, seed = 42L + pid) // Router mixes the seed

          val it = new BatchingIterator(
            rows.map(r => ("a", Option.empty[String], r.getString(0).getBytes("UTF-8"))),
            () => router.next())
          it.zipWithIndex.map { case (b, i) =>
            val wire = b.aggregate.toRecordBytes
            val decoded = AggRecordCodec.decode(wire)
            // Arrays.equals, not .toSeq ==: the Seq comparison boxes every
            // payload byte (measured ~1 s of the query at sf0.1)
            Row(pid, i, b.numUserRecords, b.sizeBytes, wire.length,
              decoded.numUserRecords == b.numUserRecords &&
                decoded.records.length == b.aggregate.records.length &&
                decoded.records.iterator.zip(b.aggregate.records.iterator)
                  .forall { case (x, y) => java.util.Arrays.equals(x.data, y.data) })
          }
        }
        s.createDataFrame(rdd, statsSchema).orderBy(col("bucket"), col("batch_seq"))
      },
      None),

    // Pack payloads to KPL wire files, read them back through the DSv2
    // source (graft.kinesis.kpl), aggregate per source file — exercises
    // the full wire round trip as a declared query (rows-only; byte-level
    // checks in KplFormatSpec).
    QDef("q_kpl_archive_roundtrip",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("kpl_q").toString
        val ehks = ShardModel.evenRanges(4).map { case (lo, hi) =>
          lo.add(hi.subtract(lo).divide(java.math.BigInteger.TWO)).toString
        }.toArray
        val payloads = orders(s, d)
          .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")).cast("binary").as("payload"))
          .repartition(4)
        graft.kinesis.kpl.KplFileFormat.writeWireFiles(payloads, "payload", dir, ehks)
        s.read.format(graft.kinesis.kpl.KplFileFormat.Name).load(dir)
          .groupBy(col("source_file"))
          .agg(count(lit(1)).as("n_records"),
            countDistinct(col("explicit_hash_key")).as("n_ehks"),
            sum(length(col("data"))).as("payload_bytes"))
          .select(element_at(split(col("source_file"), "/"), -1).as("file"),
            col("n_records"), col("n_ehks"), col("payload_bytes"))
          .orderBy(col("file"))
      },
      None),

    // End-to-end sink run against the in-memory transport (4 shards, a
    // failure injected every 5th call to exercise rebuild-retry): one
    // summary row. Smoke-checked by the driver, asserted in KinesisSpec.
    QDef("q_kinesis_sink_roundtrip",
      (s, d) => {
        val kinesis = new InMemoryKinesis(numShards = 4, failEvery = 5)
        val cfg = KinesisSinkSemantics.Config(streamName = "graft-test", backoffMillis = 1)
        val payloads = orders(s, d)
          .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
            col("o_totalprice")).cast("binary").as("payload"))
          .repartition(4)
        val written = KinesisSinkSemantics.write(payloads, "payload", kinesis, kinesis, cfg)
        import scala.jdk.CollectionConverters._
        val perShard = kinesis.received.asScala.map { case (k, v) => k -> v.size }.toSeq.sorted
        import s.implicits._
        perShard.toDF("shard_id", "n_aggregates")
          .withColumn("user_records_written", lit(written))
          .orderBy(col("shard_id"))
      },
      None)
  )
}
