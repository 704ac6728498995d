package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import Q._

/** Second-wave surface: map functions, SQL-parser entry points (scalar /
  * IN subqueries, grouping sets), pivot, posexplode, numeric RANGE frames.
  * The spark.sql queries register per-call temp views (cheap: catalog
  * metadata only) and exercise the parser→analyzer path end-to-end.
  */
object Extras {

  private def viewed(s: org.apache.spark.sql.SparkSession, d: String,
      names: String*): Unit =
    names.foreach(n => table(s, d, n).createOrReplaceTempView(n))

  val all: Seq[QDef] = Seq(

    QDef("q_map_funs",
      (s, d) => events(s, d)
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
            lit("user"), col("user_id").cast("string")).as("m"))
        .select(col("event_id"),
          // scalar cells only: the driver's checker can't sort array cells
          array_join(map_keys(col("m")), ",").as("keys"),
          array_join(map_values(col("m")), ",").as("vals"),
          element_at(col("m"), "type").as("type_val"),
          element_at(col("m"), "user").as("user_val"))
        .orderBy(col("event_id"))
        .limit(400),
      Some("""SELECT event_id,
        array_to_string(map_keys(m), ',') AS keys,
        array_to_string(map_values(m), ',') AS vals,
        m['type'][1] AS type_val, m['user'][1] AS user_val
        FROM (SELECT event_id,
                map(['type','user'], [event_type, CAST(user_id AS VARCHAR)]) AS m
              FROM events)
        ORDER BY event_id LIMIT 400""")),

    // TPC-H Q6-style revenue-change: the SQL-parser path (spark.sql over
    // temp views) with an exact single-row decimal aggregate.
    QDef("q_sql_q6_forecast",
      (s, d) => {
        viewed(s, d, "lineitem")
        s.sql(s"""SELECT ${sqlDsumSpark("l_extendedprice * l_discount")} AS revenue,
          count(*) AS n
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_discount BETWEEN 0.05 AND 0.07
            AND l_quantity < 24.0""")
      },
      Some(s"""SELECT ${sqlDsum("l_extendedprice * l_discount")} AS revenue,
        count(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24.0""")),

    QDef("q_agg_grouping_sets",
      (s, d) => {
        viewed(s, d, "lineitem")
        s.sql(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
          coalesce(l_linestatus, 'ALL') AS ls,
          ${sqlDsumSpark("l_quantity")} AS sum_qty, count(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          ORDER BY rf, ls""")
      },
      Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        coalesce(l_linestatus, 'ALL') AS ls,
        ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY rf, ls""")),

    // Scalar subquery: orders at more than twice the global average price.
    QDef("q_scalar_subquery",
      (s, d) => {
        viewed(s, d, "orders")
        s.sql("""SELECT o_orderkey, o_totalprice
          FROM orders
          WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
          ORDER BY o_orderkey LIMIT 300""")
      },
      Some("""SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey LIMIT 300""")),

    // IN-subquery (plans as a left-semi join).
    QDef("q_in_subquery",
      (s, d) => {
        viewed(s, d, "orders", "customer")
        s.sql("""SELECT o_orderkey, o_custkey
          FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'MACHINERY')
            AND o_totalprice > 200000.0
          ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
          AND o_totalprice > 200000.0
        ORDER BY o_orderkey""")),

    // Pivot: per-user event-type counts as columns.
    QDef("q_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = events(s, d).groupBy(col("user_id"))
          .pivot("event_type", types).agg(count(lit(1)))
        p.select(col("user_id") +:
            types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
        coalesce("click", 0) AS click, coalesce("error", 0) AS error,
        coalesce("purchase", 0) AS purchase, coalesce("signup", 0) AS signup,
        coalesce("view", 0) AS view
        FROM (SELECT user_id, event_type FROM events)
        PIVOT (count(*) FOR event_type IN ('click','error','purchase','signup','view'))
        ORDER BY user_id""")),

    // posexplode: tokens with their 0-based position.
    QDef("q_posexplode",
      (s, d) => documents(s, d)
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(filter(split(col("text"), " "), t => t =!= "")))
        .withColumnRenamed("pos", "tok_pos").withColumnRenamed("col", "tok")
        .select(col("doc_id"), col("tok_pos").cast("long").as("tok_pos"), col("tok"))
        .orderBy(col("doc_id"), col("tok_pos")),
      Some("""SELECT doc_id,
        unnest(range(0, len(toks))) AS tok_pos,
        unnest(toks) AS tok
        FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
              FROM documents WHERE doc_id < 20)
        ORDER BY doc_id, tok_pos""")),

    // Numeric RANGE frame: count + exact sum of orders within 20000 of the
    // current price, per customer.
    QDef("q_window_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-20000L, 0L)
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_near"))
          .orderBy(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
          .limit(600)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
          count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
            RANGE BETWEEN 20000 PRECEDING AND CURRENT ROW) AS n_near
        FROM orders
        ORDER BY o_custkey, o_totalprice, o_orderkey LIMIT 600"""))
  )

  /** Spark-SQL-dialect spelling of Q.sqlDsum (CAST…DECIMAL(30,6) sum). */
  private def sqlDsumSpark(e: String): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(30,6))) AS DOUBLE)"

  val all2: Seq[QDef] = Seq(

    // Custom typed Aggregator (udaf): PutRecords-call estimate per
    // supplier from serialized row sizes, 1MB budget.
    QDef("q_custom_agg_batches",
      (s, d) => lineitem(s, d)
        .select(col("l_suppkey"),
          length(concat_ws("|", col("l_orderkey"), col("l_partkey"),
            col("l_quantity"), col("l_extendedprice"))).cast("long").as("sz"))
        .groupBy(col("l_suppkey"))
        .agg(
          graft.functions.BatchCountAggregator
            .batch_count(col("sz"), 1000000L).as("n_batches"),
          sum(col("sz")).as("total_bytes"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_suppkey")),
      Some("""SELECT l_suppkey,
        greatest(1, CAST(ceil(CAST(sum(sz) AS DOUBLE) / 1000000.0) AS BIGINT)) AS n_batches,
        CAST(sum(sz) AS BIGINT) AS total_bytes, count(*) AS n_rows
        FROM (SELECT l_suppkey,
                length(concat_ws('|', l_orderkey, l_partkey, l_quantity,
                                 l_extendedprice)) AS sz
              FROM lineitem)
        GROUP BY l_suppkey ORDER BY l_suppkey""")),

    // Unpivot (melt): wide metric columns → long (metric, value) rows.
    QDef("q_unpivot",
      (s, d) => part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric")),
      Some("""SELECT p_partkey, metric, val FROM (
          SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
                 p_retailprice AS retailprice FROM part)
        UNPIVOT (val FOR metric IN (size, retailprice))
        ORDER BY p_partkey, metric""")),

    // Typed Dataset path: case-class groupByKey + mapGroups (compile-time
    // row types; same shuffle shape as the untyped groupBy).
    QDef("q_typed_mapgroups",
      (s, d) => {
        import s.implicits._
        orders(s, d).select(col("o_custkey"), col("o_totalprice"))
          .as[(Long, Double)]
          .groupByKey(_._1)
          .mapGroups { (k, rows) =>
            var n = 0L; var mx = Double.MinValue
            rows.foreach { r => n += 1; if (r._2 > mx) mx = r._2 }
            (k, n, mx)
          }
          .toDF("custkey", "n_orders", "max_price")
          .orderBy(col("custkey"))
      },
      Some("""SELECT o_custkey AS custkey, count(*) AS n_orders,
        max(o_totalprice) AS max_price
        FROM orders GROUP BY o_custkey ORDER BY custkey""")),

    // Fuzzy string dedup: edit-distance pairs within (brand, type) blocks
    // — levenshtein-based near-dup detection for short text fields.
    QDef("q_fuzzy_name_pairs",
      (s, d) => {
        val a = part(s, d).select(col("p_partkey").as("a_key"),
          col("p_name").as("a_name"), col("p_brand"), col("p_type"))
        val b = part(s, d).select(col("p_partkey").as("b_key"),
          col("p_name").as("b_name"), col("p_brand"), col("p_type"))
        a.join(b, Seq("p_brand", "p_type"))
          .filter(col("a_key") < col("b_key"))
          .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("long"))
          .filter(col("dist") <= 4)
          .select(col("p_brand"), col("a_key"), col("b_key"), col("dist"))
          .orderBy(col("p_brand"), col("a_key"), col("b_key"))
          .limit(500)
      },
      Some("""SELECT a.p_brand, a.p_partkey AS a_key, b.p_partkey AS b_key,
        CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_type = b.p_type
          AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 4
        ORDER BY a.p_brand, a_key, b_key LIMIT 500""")),

    // Array set algebra over token arrays (sorted for cross-engine order).
    QDef("q_array_setops",
      (s, d) => documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .select(col("doc_id"),
          slice(col("toks"), 1, 8).as("head_toks"),
          // clamp like DuckDB's toks[-8:]: Spark slice(arr, -8, 8) returns
          // [] outright when the array has fewer than 8 elements
          slice(col("toks"), greatest(size(col("toks")) - 7, lit(1)), lit(8)).as("tail_toks"))
        .select(col("doc_id"),
          // joined to scalar cells: the driver's checker can't sort array cells
          array_join(array_sort(array_intersect(col("head_toks"), col("tail_toks"))), "|").as("inter"),
          array_join(array_sort(array_union(col("head_toks"), col("tail_toks"))), "|").as("uni"),
          array_join(array_sort(array_except(col("head_toks"), col("tail_toks"))), "|").as("diff"),
          arrays_overlap(col("head_toks"), col("tail_toks")).as("overlaps"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        COALESCE(array_to_string(list_sort(list_distinct(list_intersect(head_toks, tail_toks))), '|'), '') AS inter,
        COALESCE(array_to_string(list_sort(list_distinct(head_toks || tail_toks)), '|'), '') AS uni,
        COALESCE(array_to_string(list_sort(list_distinct(list_filter(head_toks,
          x -> NOT list_contains(tail_toks, x)))), '|'), '') AS diff,
        list_has_any(head_toks, tail_toks) AS overlaps
        FROM (SELECT doc_id, toks[1:8] AS head_toks, toks[-8:] AS tail_toks
              FROM (SELECT doc_id,
                      list_filter(string_split(text, ' '), t -> t <> '') AS toks
                    FROM documents WHERE doc_id < 50))
        ORDER BY doc_id""")),

    // try_cast: failed casts yield NULL, never errors. The top-300 cut
    // happens BEFORE the try-projections: every try_cast failure costs a
    // thrown-and-caught exception per row, so evaluating them on the
    // full table only to keep 300 rows multiplied that by 500× (measured
    // 2.4 s → 0.15 s at sf0.1). Same rule at 100 TB: put expensive or
    // exception-prone projections above the limit, not below it.
    QDef("q_try_cast",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(300)
        .select(col("o_orderkey"),
          expr("try_cast(split(o_orderpriority, '-')[0] AS BIGINT)").as("prio_num"),
          expr("try_cast(o_orderpriority AS BIGINT)").as("bad_cast"),
          expr("try_cast(o_totalprice AS DECIMAL(4,0))").cast("double").as("overflow_cast")),
      Some("""SELECT o_orderkey,
        try_cast(string_split(o_orderpriority, '-')[1] AS BIGINT) AS prio_num,
        try_cast(o_orderpriority AS BIGINT) AS bad_cast,
        CAST(try_cast(o_totalprice AS DECIMAL(4,0)) AS DOUBLE) AS overflow_cast
        FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // Null-safe semantics: <=> (IS NOT DISTINCT FROM), nvl/nvl2, nulls in
    // aggregates vs counts.
    QDef("q_null_handling",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("P")).as("st"),
          col("o_totalprice"))
        .select(col("o_orderkey"),
          (col("st") <=> lit("F")).cast("long").as("eq_f"),
          (col("st") <=> lit(null)).cast("long").as("is_null"),
          coalesce(col("st"), lit("PENDING")).as("st_filled"),
          when(col("st").isNull, round(col("o_totalprice"), 0))
            .otherwise(lit(null)).as("pending_price"))
        .orderBy(col("o_orderkey"))
        .limit(500),
      Some("""SELECT o_orderkey,
        CAST(st IS NOT DISTINCT FROM 'F' AS BIGINT) AS eq_f,
        CAST(st IS NOT DISTINCT FROM NULL AS BIGINT) AS is_null,
        coalesce(st, 'PENDING') AS st_filled,
        CASE WHEN st IS NULL THEN round(o_totalprice, 0) END AS pending_price
        FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
              FROM orders)
        ORDER BY o_orderkey LIMIT 500""")),

    // Null-preserving generator: explode_outer keeps rows whose array is
    // empty (plain explode drops them — the silent row-loss footgun in
    // fan-out pipelines). The oracle models outer semantics by unnesting
    // [NULL] for empty arrays.
    QDef("q_explode_outer",
      (s, d) => customer(s, d)
        .orderBy(col("c_custkey")).limit(500)
        .select(col("c_custkey"),
          expr("""CASE WHEN c_custkey % 3 = 0 THEN CAST(array() AS ARRAY<INT>)
                  ELSE sequence(1, CAST(c_custkey % 3 AS INT)) END""").as("arr"))
        .select(col("c_custkey"), explode_outer(col("arr")).as("v"))
        .orderBy(col("c_custkey"), asc_nulls_first("v")),
      Some("""SELECT c_custkey, CAST(v AS INT) AS v FROM (
          SELECT c_custkey,
            unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS v
          FROM (SELECT c_custkey,
                  CASE WHEN c_custkey % 3 = 0 THEN []
                       ELSE range(1, CAST(c_custkey % 3 AS INT) + 1) END AS arr
                FROM (SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 500)))
        ORDER BY c_custkey, v NULLS FIRST""")),

    // Correlated LATERAL subquery (SQL-parser path): per-nation top-2
    // customers by balance — the lateral form of per-group top-k, planned
    // by Spark as a rewritten window/join under the hood.
    QDef("q_lateral_topk",
      (s, d) => {
        viewed(s, d, "nation"); viewed(s, d, "customer")
        s.sql("""SELECT n_name, t.c_name, t.c_acctbal
          FROM nation,
          LATERAL (SELECT c_name, c_acctbal FROM customer
                   WHERE c_nationkey = n_nationkey
                   ORDER BY c_acctbal DESC, c_name LIMIT 2) t
          ORDER BY n_name, t.c_acctbal DESC, t.c_name""")
      },
      Some("""SELECT n_name, t.c_name, t.c_acctbal
        FROM nation,
        LATERAL (SELECT c_name, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        ORDER BY n_name, t.c_acctbal DESC, t.c_name""")),

    // SKYLINE / PARETO FRONTIER (Börzsönyi et al. ICDE'01) — the classic
    // multi-criteria operator Spark has no primitive for: parts where no
    // other part is both cheaper-or-equal AND larger-or-equal (strict
    // somewhere) on (p_retailprice min, p_size max). Implemented as the
    // DISTRIBUTED two-phase sort-filter skyline: aggregate to distinct
    // (price, size) groups, take each hash-bucket's LOCAL skyline with
    // one window pass (any subset's local skyline is a SUPERSET of the
    // global skyline restricted to it — dominance is transitive, so a
    // locally-dominated point is globally dominated), then one global
    // pass over the few survivors. The single-pass invariant: under
    // (price asc, size desc) order, a distinct group survives iff the
    // running max size over STRICT predecessors is below its own size
    // (an earlier same-price row has strictly larger size; an earlier
    // cheaper row with size ≥ mine dominates — both collapse to
    // maxPrev < size). Phase 1 windows partition by bucket; phase 2 sees
    // only local survivors (≪ groups). Pure comparisons — class A.
    QDef("q_skyline_pareto",
      (s, d) => {
        val g = part(s, d)
          .groupBy(col("p_retailprice").as("price"), col("p_size").as("sz"))
          .agg(count(lit(1)).as("m"))
        def skyline(df: org.apache.spark.sql.DataFrame,
            bucket: Option[org.apache.spark.sql.Column])
            : org.apache.spark.sql.DataFrame = {
          val w0 = bucket.fold(Window.orderBy(col("price"), col("sz").desc))(
            b => Window.partitionBy(b)
              .orderBy(col("price"), col("sz").desc))
          val w = w0.rowsBetween(Window.unboundedPreceding, -1)
          df.withColumn("mx", max(col("sz")).over(w))
            .filter(col("mx").isNull || col("mx") < col("sz"))
            .drop("mx")
        }
        val local = skyline(g, Some(pmod(col("sz"), lit(8))))
        skyline(local, None)
          .select(col("price"), col("sz").cast("long").as("sz"), col("m"))
          .orderBy(col("price"))
      },
      Some("""WITH g AS (SELECT p_retailprice AS price,
            CAST(p_size AS BIGINT) AS sz, CAST(count(*) AS BIGINT) AS m
          FROM part GROUP BY 1, 2),
        w AS (SELECT price, sz, m,
            max(sz) OVER (ORDER BY price ASC, sz DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
          FROM g)
        SELECT price, sz, m FROM w
        WHERE mx IS NULL OR mx < sz
        ORDER BY price""")),

    // QUANTILE NORMALIZATION onto the global centile grid — the
    // batch-effect correction step (microarray lineage, now corpus-mix
    // conditioning): replace each doc's length by the GLOBAL
    // distribution's value at the doc's within-source percentile, so
    // every source's length distribution maps onto the corpus-wide one.
    // Exact type-1 quantiles throughout: within-source rank r by the
    // (n_chars, doc_id) total order, percentile p = ⌈100·r/n_s⌉ by
    // integer division, and the 100-row global grid read off the count
    // histogram with the 100·cum ≥ p·N cross-multiplied rank test (the
    // q_winsorize_stats mechanism) — then one broadcast equi-join on p.
    // No global per-row sort: ranks partition by source, the histogram
    // window runs over distinct values, the grid is 100 rows. Class A.
    QDef("q_quantile_norm",
      (s, d) => {
        val docs = documents(s, d)
        val hist = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("m"))
        val wv = Window.orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("m")).over(wv))
        val n = docs.agg(count(lit(1)).as("n"))
        val grid = cum.crossJoin(broadcast(n))
          .select(col("n_chars"), col("cum"), col("n"),
            explode(sequence(lit(1), lit(100))).as("p"))
          .filter(col("cum") * 100 >= col("p") * col("n"))
          .groupBy(col("p")).agg(min(col("n_chars")).as("norm_chars"))
        val ws = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        val nS = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        docs.select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("r", row_number().over(ws).cast("long"))
          .join(broadcast(nS), Seq("source"))
          .withColumn("p",
            expr("(100 * r + n_s - 1) div n_s").cast("int"))
          .join(broadcast(grid), Seq("p"))
          .select(col("doc_id"), col("source"), col("n_chars"),
            col("p").cast("long").as("pctl"), col("norm_chars"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH hist AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS m
          FROM documents GROUP BY 1),
        cum AS (SELECT n_chars,
            CAST(sum(m) OVER (ORDER BY n_chars
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM hist),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        grid AS (SELECT p, min(n_chars) AS norm_chars
          FROM cum CROSS JOIN n CROSS JOIN range(1, 101) t(p)
          WHERE cum * 100 >= p * n GROUP BY p),
        ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s
          FROM documents GROUP BY source),
        ranked AS (SELECT doc_id, source, n_chars,
            CAST(row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS BIGINT) AS r
          FROM documents)
        SELECT doc_id, ranked.source, n_chars,
          CAST((100 * r + n_s - 1) // n_s AS BIGINT) AS pctl,
          norm_chars
        FROM ranked JOIN ns ON ranked.source = ns.source
        JOIN grid ON grid.p = (100 * r + n_s - 1) // n_s
        ORDER BY doc_id"""))
  )
}
