package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Physical-layout scale proofs as DECLARED queries: the two 100 TB
  * storage-side strategies — bucketed co-located joins (pay the join
  * shuffle once at write time, never per query) and partition-pruned
  * scans (date predicates never touch non-matching files) — each run
  * end-to-end with its layout property ASSERTED inside the query, so the
  * driver's correctness gate also re-proves the plan shape every round.
  */
object Physical {

  /** DuckDB twin of the engine-side 32-bit text checksum
    * `conv(substring(md5(text), 1, 8), 16, 10)` — the md5-nibble Horner
    * idiom (first 8 hex nibbles, most-significant first). */
  private val textSum32Sql: String = (1 to 8)
    .map(i => s"(strpos('0123456789abcdef', substr(md5(text), $i, 1))" +
      s" - 1) * ${1L << (32 - 4 * i)}")
    .mkString("(", " + ", ")")

  /** Throws unless the plan fragment contains zero exchanges of the named
    * kind. Checked on the PRE-output fragment (the final orderBy of a
    * declared query legitimately range-shuffles). */
  private def assertNoExchange(df: DataFrame, what: String): DataFrame = {
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = graft.tables.Bucketing.countExchanges(plan)
    if (shuffles > 0)
      throw new IllegalStateException(
        s"$what: expected a shuffle-free plan, found $shuffles exchange(s):\n" +
          plan.take(4000))
    df
  }

  val all: Seq[QDef] = Seq(

    // Co-located fact-fact join: both sides written bucketed+sorted on the
    // join key (8 buckets), then joined AND aggregated on that key with
    // ZERO Exchange anywhere before the final presentation sort — the
    // plan shape asserted in-query on every run. At 100 TB this is the
    // difference between re-shuffling two fact tables per query and
    // scanning co-located buckets; the aggregation reuses the same bucket
    // distribution, so it too is exchange-free.
    QDef("q_join_bucketed",
      (s, d) => {
        import graft.tables.{Bucketing, LayoutCache}
        // table names embed the sanitized corpus path so the pay-once
        // guard never aliases two scale factors; the once-key also pins
        // the SESSION, because bucketed tables live in the session
        // catalog (unlike the on-disk layouts below, they do not survive
        // a session restart in the same JVM)
        val sfx = LayoutCache.keyOf(d)
        val (tOrders, tItems) = (s"graft_bkt_orders_$sfx", s"graft_bkt_lineitem_$sfx")
        LayoutCache.once(s"bucketed:${System.identityHashCode(s)}:$d") {
          Bucketing.writeBucketed(
            orders(s, d).select(col("o_orderkey").as("okey"),
              col("o_totalprice")),
            tOrders, "okey", buckets = 8)
          Bucketing.writeBucketed(
            lineitem(s, d).select(col("l_orderkey").as("okey"),
              col("l_extendedprice")),
            tItems, "okey", buckets = 8)
        }
        val joined = Bucketing
          .bucketedJoin(s, tOrders, tItems, "okey")
          .groupBy(col("okey"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("rev"),
            max(col("o_totalprice")).as("o_price"))
        assertNoExchange(joined, "q_join_bucketed")
          .orderBy(col("okey"))
          .limit(2000)
      },
      Some(s"""SELECT o_orderkey AS okey, count(*) AS n_items,
          ${sqlDsum("l_extendedprice")} AS rev,
          max(o_totalprice) AS o_price
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY okey LIMIT 2000""")),

    // Bloom-pruned shuffle join: a selective dim-side filter is collapsed
    // into a broadcast bloom (sized from footer stats, no count() job) and
    // applied to the fact side BEFORE its shuffle — at 100 TB this drops
    // ~80% of the lineitem shuffle for a 20%-selective orders predicate,
    // for a few MB of bloom. The join that follows removes the bloom's
    // false positives, so the result is exact at any fpp; the probe is a
    // codegen'd Catalyst expression (inside whole-stage codegen, not a
    // UDF), and its survival into the physical plan is asserted in-query.
    QDef("q_join_bloom_pruned",
      (s, d) => {
        import graft.functions.BloomFunctions._
        val dim = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        val bloomBytes = buildLongBloom(dim, "o_orderkey",
          expectedItems = graft.tables.Tables.rowCount(s, d, "orders"))
        val pruned = lineitem(s, d)
          .filter(bloom_might_contain(col("l_orderkey"), bloomBytes))
        val joined = pruned
          .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("rev"))
          .orderBy(col("l_returnflag"))
        val plan = joined.queryExecution.executedPlan.toString
        if (!plan.contains("graft_bloom_might_contain"))
          throw new IllegalStateException(
            s"q_join_bloom_pruned: probe missing from physical plan:\n${plan.take(4000)}")
        joined
      },
      Some(s"""SELECT l_returnflag, count(*) AS n_lines,
          ${sqlDsum("l_extendedprice")} AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY 1 ORDER BY l_returnflag""")),

    // Partition-pruned scan: events re-laid-out Hive-style by event_date,
    // then a one-day query — the scan must carry a partition filter (no
    // non-matching directory is even listed), asserted in-query. The
    // rewrite cost is the point: pay the layout once, prune forever.
    QDef("q_scan_pruned",
      (s, d) => {
        val dir = s"/tmp/graft_part_events_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          events(s, d)
            .withColumn("event_date", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("event_date").parquet(dir)
        }
        val pruned = s.read.parquet(dir)
          .filter(col("event_date") === "2024-01-05")
        val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
        if (!scan.contains("PartitionFilters: [isnotnull(event_date"))
          throw new IllegalStateException(
            s"q_scan_pruned: scan lost its partition filter:\n${scan.take(2000)}")
        pruned
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS n, ${sqlDsum("value")} AS sv
        FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
        GROUP BY 1 ORDER BY event_type""")),

    // Dynamic partition pruning: the fact side is partitioned on
    // event_date, the dim side carries the selective filter — STATIC
    // pruning can't help (the fact predicate only exists at runtime, as
    // the dim join keys), so Catalyst must inject a dynamicpruning
    // subquery into the fact scan: broadcast the filtered dim once, reuse
    // it to skip non-matching partitions BEFORE they're read. At 100 TB
    // this is the fact-to-date-dim star-join pattern; the in-query
    // assertion pins the dynamicpruningexpression into the scan on every
    // driver run. Oracle: the equivalent static predicate.
    QDef("q_scan_dpp",
      (s, d) => {
        val dir = s"/tmp/graft_dpp_events_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          events(s, d)
            .withColumn("event_date", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("event_date").parquet(dir)
        }
        val fact = s.read.parquet(dir)
        val dim = s.range(0, 31)
          .select(date_add(lit(java.sql.Date.valueOf("2024-01-01")),
            col("id").cast("int")).as("event_date"))
          .filter(dayofmonth(col("event_date")) <= 3)
        val joined = fact.join(broadcast(dim), "event_date")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
          .orderBy(col("event_type"))
        val plan = joined.queryExecution.executedPlan.toString
        if (!plan.toLowerCase.contains("dynamicpruning"))
          throw new IllegalStateException(
            s"q_scan_dpp: no dynamic pruning subquery in the fact scan:\n${plan.take(4000)}")
        joined
      },
      // pinned to the dim's literal dates (Jan 1-3 2024), NOT
      // day-of-month<=3: the dim only spans 2024-01, so a fixture that
      // grows into February must not silently diverge the oracle
      Some(s"""SELECT event_type, count(*) AS n, ${sqlDsum("value")} AS sv
        FROM events WHERE CAST(ts AS DATE)
          BETWEEN DATE '2024-01-01' AND DATE '2024-01-03'
        GROUP BY 1 ORDER BY event_type""")),

    // Z-order clustered layout: lineitem rewritten sorted by the Morton
    // interleave of (l_partkey, l_suppkey), then a 2-D box query — the
    // layout that lets parquet min/max stats skip row groups for BOTH
    // dimensions at once (partitioning can only prune one). The in-query
    // assertion pins the clustering property: matching rows concentrate
    // in a strict subset of the z-range files (a natural orderkey layout
    // scatters them across ~all — ZOrderSpec proves the comparative).
    // The summed z-values in the result make the oracle re-verify the
    // bit-interleave itself cross-engine.
    QDef("q_zorder_cluster",
      (s, d) => {
        import graft.tables.ZOrder
        val dir = s"/tmp/graft_zorder_${graft.tables.LayoutCache.keyOf(d)}"
        val nFiles = 8
        graft.tables.LayoutCache.once(dir) {
          lineitem(s, d)
            .withColumn("zval",
              ZOrder.zvalue(col("l_partkey"), col("l_suppkey"), bits = 20))
            .repartitionByRange(nFiles, col("zval"))
            .sortWithinPartitions(col("zval"))
            .write.mode("overwrite").parquet(dir)
        }
        // footer-stats audit, NOT a Spark job (the first cut ran an
        // input_file_name().distinct().count() scan per invocation —
        // assertion overhead in every bench pass): a stats-aware reader
        // must touch exactly the files whose row-group min/max admit the
        // box, and z-clustering must keep that a strict subset
        val (touched, total) = ZOrder.filesOverlappingBox(
          s, dir, "l_partkey", 100L, "l_suppkey", 10L)
        if (touched >= total)
          throw new IllegalStateException(
            s"q_zorder_cluster: box stats admit all $touched/$total z-range files — no clustering")
        s.read.parquet(dir)
          .filter(col("l_partkey") <= 100 && col("l_suppkey") <= 10)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("zval")).as("zsum"),
            dsum(col("l_extendedprice")).as("rev"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
          CAST(sum(${graft.tables.ZOrder.sqlZ("l_partkey", "l_suppkey", 20)}) AS BIGINT) AS zsum,
          ${sqlDsum("l_extendedprice")} AS rev
        FROM lineitem WHERE l_partkey <= 100 AND l_suppkey <= 10
        GROUP BY 1 ORDER BY l_returnflag""")),

    // Columnar-format round trip on the DECLARED surface: parquet →
    // ORC → aggregate, oracle-checked against the parquet originals —
    // format fidelity (decimal/double/string exactness) as a gated
    // property, not just a suite test. (CSV/JSON/text round-trips are
    // exercised in BatchFormatsSpec; ORC is the one with a second
    // columnar metadata path worth gating.)
    QDef("q_format_orc_roundtrip",
      (s, d) => {
        val dir = s"/tmp/graft_orc_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
              col("l_extendedprice"))
            .write.mode("overwrite").orc(dir)
        }
        s.read.orc(dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sq"),
            dsum(col("l_extendedprice")).as("sp"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, count(*) AS n,
          ${sqlDsum("l_quantity")} AS sq, ${sqlDsum("l_extendedprice")} AS sp
        FROM lineitem GROUP BY 1 ORDER BY l_returnflag""")),

    // TEXT-FORMAT ROUND TRIPS (r14) — CSV and JSON join ORC on the
    // DECLARED gate: the string-heavy documents table is written out
    // and read back through each text codec, and a per-lang fidelity
    // certificate (row count, byte totals, id range, and a 32-bit
    // md5-prefix checksum over every text value — the cross-engine
    // hash idiom) is oracle-checked against the parquet ORIGINALS, so
    // any quoting/escaping/encoding loss anywhere in the round trip
    // breaks the hash gate, not just a suite test. Scale: one write +
    // one scan + a map-side agg; the checksum is per-row work.
    QDef("q_format_csv_roundtrip",
      (s, d) => {
        val dir = s"/tmp/graft_csv_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          documents(s, d)
            .select(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars"))
            .write.mode("overwrite").option("header", "true").csv(dir)
        }
        s.read.option("header", "true")
          .schema("doc_id LONG, text STRING, lang STRING, " +
            "source STRING, n_chars LONG")
          .csv(dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
            sum(conv(substring(md5(col("text").cast("binary")), 1, 8),
              16, 10).cast("long")).as("text_sum32"))
          .orderBy(col("lang"))
      },
      Some(s"""SELECT lang, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id,
          CAST(sum($textSum32Sql) AS BIGINT) AS text_sum32
        FROM documents GROUP BY 1 ORDER BY lang""")),

    QDef("q_format_json_roundtrip",
      (s, d) => {
        val dir = s"/tmp/graft_json_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          documents(s, d)
            .select(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars"))
            .write.mode("overwrite").json(dir)
        }
        s.read
          .schema("doc_id LONG, text STRING, lang STRING, " +
            "source STRING, n_chars LONG")
          .json(dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
            sum(conv(substring(md5(col("text").cast("binary")), 1, 8),
              16, 10).cast("long")).as("text_sum32"))
          .orderBy(col("lang"))
      },
      Some(s"""SELECT lang, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id,
          CAST(sum($textSum32Sql) AS BIGINT) AS text_sum32
        FROM documents GROUP BY 1 ORDER BY lang""")),

    // HIVE-PARTITIONED WRITE ROUNDTRIP — the layout every serious lake
    // uses: documents written `partitionBy(lang)` (one directory per
    // partition value, the column ENCODED IN THE PATH and dropped from
    // the data files), read back through partition discovery, and
    // checksummed per lang against the parquet ORIGINALS — so a lost
    // or mistyped partition column, a row landing in the wrong
    // directory, or a discovery miss breaks the hash gate. The read
    // also proves partition PRUNING is available to every downstream
    // lang filter (the scan's partitionFilters sit on the discovered
    // column — asserted in PhysicalSpec). Scale: the write is one
    // shuffle-free scan fanning to |langs| directories; the read is a
    // normal pruned scan.
    QDef("q_format_partitioned_roundtrip",
      (s, d) => {
        val dir = s"/tmp/graft_part_${graft.tables.LayoutCache.keyOf(d)}"
        graft.tables.LayoutCache.once(dir) {
          documents(s, d)
            .select(col("doc_id"), col("text"), col("lang"),
              col("source"), col("n_chars"))
            .write.mode("overwrite").partitionBy("lang").parquet(dir)
        }
        s.read.parquet(dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
            sum(conv(substring(md5(col("text").cast("binary")), 1, 8),
              16, 10).cast("long")).as("text_sum32"))
          .select(col("lang").cast("string").as("lang"), col("n"),
            col("sum_chars"), col("min_id"), col("max_id"),
            col("text_sum32"))
          .orderBy(col("lang"))
      },
      Some(s"""SELECT lang, count(*) AS n,
          CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          min(doc_id) AS min_id, max(doc_id) AS max_id,
          CAST(sum($textSum32Sql) AS BIGINT) AS text_sum32
        FROM documents GROUP BY 1 ORDER BY lang""")),

    // CDC merge/upsert (MERGE INTO semantics composed from a full outer
    // join + coalesce — the Delta/Iceberg upsert path expressed in plain
    // Spark): updates win over base, inserts append. The update and
    // insert sets are derived deterministically from orders so the oracle
    // replays the identical merge; post-merge the result is audited by
    // status class (original / updated / inserted). At scale this is one
    // shuffle on the merge key — the same join the table format's MERGE
    // executes underneath.
    QDef("q_merge_upsert",
      (s, d) => {
        val base = orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        val updates = base.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 100.0).as("o_totalprice"),
            lit("UPD").as("o_orderstatus"))
          .unionAll(base.filter(col("o_orderkey") % 97 === 0)
            .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
              col("o_totalprice"), lit("NEW").as("o_orderstatus")))
        base.as("b").join(updates.as("u"),
            col("b.o_orderkey") === col("u.o_orderkey"), "full_outer")
          .select(
            coalesce(col("u.o_orderkey"), col("b.o_orderkey")).as("k"),
            coalesce(col("u.o_totalprice"), col("b.o_totalprice")).as("p"),
            coalesce(col("u.o_orderstatus"), col("b.o_orderstatus")).as("st"))
          .groupBy(col("st"))
          .agg(count(lit(1)).as("n"), dsum(col("p")).as("sp"),
            max(col("k")).as("max_k"))
          .orderBy(col("st"))
      },
      Some(s"""WITH base AS (SELECT o_orderkey, o_totalprice, o_orderstatus
          FROM orders),
        updates AS (
          SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
            'UPD' AS o_orderstatus FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey + 100000000, o_totalprice, 'NEW'
          FROM base WHERE o_orderkey % 97 = 0),
        merged AS (SELECT
            COALESCE(u.o_orderkey, b.o_orderkey) AS k,
            COALESCE(u.o_totalprice, b.o_totalprice) AS p,
            COALESCE(u.o_orderstatus, b.o_orderstatus) AS st
          FROM base b FULL OUTER JOIN updates u
            ON b.o_orderkey = u.o_orderkey)
        SELECT st, count(*) AS n, ${sqlDsum("p")} AS sp, max(k) AS max_k
        FROM merged GROUP BY st ORDER BY st""")),

    // Hidden file-metadata columns (`_metadata.file_path` / `file_size`
    // / `file_modification_time`): the lineage/debugging surface a data
    // engineer uses to trace bad rows back to their source files. The
    // row count is pinned exactly against the table; the file facts
    // collapse to invariant flags (≥1 distinct file, every size
    // positive, every row's file under the table root) since absolute
    // paths/sizes are environment-specific.
    QDef("q_scan_file_metadata",
      (s, d) => {
        val df = s.read.parquet(s"$d/lineitem.parquet")
          .select(col("_metadata.file_path").as("fp"),
            col("_metadata.file_size").as("fs"))
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col("fp")).as("nf"),
            min(col("fs")).as("min_fs"),
            sum(when(col("fp").contains("lineitem.parquet"), 0L)
              .otherwise(1L)).as("stray"))
          .select(col("n_rows"),
            (col("nf") >= 1).cast("long").as("has_files"),
            (col("min_fs") > 0).cast("long").as("sizes_positive"),
            (col("stray") === 0).cast("long").as("paths_under_root"))
      },
      Some("""SELECT (SELECT count(*) FROM lineitem) AS n_rows,
        CAST(1 AS BIGINT) AS has_files,
        CAST(1 AS BIGINT) AS sizes_positive,
        CAST(1 AS BIGINT) AS paths_under_root"""))
  )
}
