package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.tables.Tables._
import Q._

/** Projection / filter / scalar-function surface: arithmetic, predicates
  * (IN/BETWEEN/LIKE), string, date/time, math, conditional, decimal, JSON,
  * hash, and array functions.
  *
  * All expressions are built-in `functions._` — fully whole-stage-codegen'd,
  * and the filters/projections push down to the Parquet scan (verified via
  * explain: PushedFilters + pruned ReadSchema).
  */
object Scalars {

  val all: Seq[QDef] = Seq(

    QDef("q_proj_arith",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 2).as("charge"),
          floor(col("l_quantity")).cast("long").as("qty_floor"),
          (col("l_orderkey") % 7).as("ok_mod7"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
        // order by every column for a total order
        .orderBy(col("l_orderkey"), col("line_no"), col("charge"), col("qty_floor"))
        .limit(500),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charge,
        CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        l_orderkey % 7 AS ok_mod7
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        ORDER BY l_orderkey, line_no, charge, qty_floor LIMIT 500""")),

    QDef("q_filter_in_between_like",
      (s, d) => part(s, d)
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5")
          && col("p_size").between(5, 40)
          && col("p_type").like("%A%")
          && !col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_name, p_brand, p_type,
        CAST(p_size AS BIGINT) AS p_size, p_retailprice
        FROM part
        WHERE p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
          AND p_size BETWEEN 5 AND 40
          AND p_type LIKE '%A%' AND p_name NOT LIKE '%gear%'
        ORDER BY p_partkey""")),

    QDef("q_string_funs",
      (s, d) => customer(s, d)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          substring(col("c_name"), 10, 5).as("sub"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          element_at(split(col("c_name"), "#"), 2).as("id_part"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"))
        .orderBy(col("c_custkey"))
        .limit(300),
      Some("""SELECT c_custkey,
        upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
        substring(c_name, 10, 5) AS sub,
        CAST(length(c_name) AS BIGINT) AS name_len,
        concat(c_name, '-', c_mktsegment) AS cat,
        regexp_replace(c_name, 'Customer', 'Cust') AS repl,
        lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        string_split(c_name, '#')[2] AS id_part,
        regexp_extract(c_name, '([0-9]+)', 1) AS digits
        FROM customer ORDER BY c_custkey LIMIT 300""")),

    QDef("q_date_funs",
      (s, d) => orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).cast("long").as("days_to_2002"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
        .limit(300),
      Some("""SELECT o_orderkey,
        year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        day(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // Regexp replacement with capture-group backreferences ($1 in Spark,
    // \1 in DuckDB — same semantics, dialect-spelled each side).
    QDef("q_regexp_capture",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(col("c_name"), "Customer#0*([0-9]+)", "cust-$1").as("short_name"),
          regexp_extract(col("c_name"), "#(0*)([0-9]+)$", 2).as("id_digits"))
        .orderBy(col("c_custkey"))
        .limit(300),
      Some("""SELECT c_custkey,
        regexp_replace(c_name, 'Customer#0*([0-9]+)', 'cust-\1', 'g') AS short_name,
        regexp_extract(c_name, '#(0*)([0-9]+)$', 2) AS id_digits
        FROM customer ORDER BY c_custkey LIMIT 300""")),

    // Calendar-interval arithmetic (month adds clamp to month end in
    // both engines).
    QDef("q_interval_arith",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate") + expr("INTERVAL 1 MONTH")).as("plus_month"),
          to_date(col("o_orderdate") - expr("INTERVAL 2 WEEKS")).as("minus_2w"),
          to_date(col("o_orderdate") + expr("INTERVAL 1 YEAR")).as("plus_year"),
          add_months(to_date(col("o_orderdate")), 3).as("plus_q"))
        .orderBy(col("o_orderkey"))
        .limit(300),
      Some("""SELECT o_orderkey,
        CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS plus_month,
        CAST(o_orderdate - INTERVAL 14 DAY AS DATE) AS minus_2w,
        CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS plus_year,
        CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_q
        FROM orders ORDER BY o_orderkey LIMIT 300""")),

    // Engine-specific hash functions (xxhash64 / murmur3 / crc32) — the
    // raw values have no cross-engine oracle by construction (different
    // algorithms than DuckDB's hash()), so the ORACLE checks recomputed
    // in-query invariants instead: each hash re-derived from a substring
    // RECOMPOSITION of the input must equal the direct hash (purity over
    // content, not physical representation), and re-seeding xxhash64 with
    // an extra column must change the value (seed sensitivity; 64-bit
    // collision on this fixed 200-row set would be ~2⁻⁵⁶ and is verified
    // absent). DuckDB pins every flag to 1.
    QDef("q_hash_engine",
      (s, d) => {
        val recomposed = concat(substring(col("c_name"), 1, 5),
          substring(col("c_name"), 6, 1000))
        customer(s, d)
          .select(col("c_custkey"),
            xxhash64(col("c_name")).as("xx"),
            xxhash64(recomposed).as("xx2"),
            xxhash64(col("c_name"), lit(1)).as("xxs"),
            hash(col("c_name")).as("mm"),
            hash(recomposed).as("mm2"),
            crc32(col("c_name").cast("binary")).as("crc"),
            crc32(recomposed.cast("binary")).as("crc2"))
          .select(col("c_custkey"),
            (col("xx") === col("xx2")).cast("long").as("xx_recompose_ok"),
            (col("xx") =!= col("xxs")).cast("long").as("xx_seed_sensitive"),
            (col("mm") === col("mm2")).cast("long").as("murmur_recompose_ok"),
            (col("crc") === col("crc2")).cast("long").as("crc_recompose_ok"))
          .orderBy(col("c_custkey"))
          .limit(200)
      },
      Some("""SELECT c_custkey,
        CAST(1 AS BIGINT) AS xx_recompose_ok,
        CAST(1 AS BIGINT) AS xx_seed_sensitive,
        CAST(1 AS BIGINT) AS murmur_recompose_ok,
        CAST(1 AS BIGINT) AS crc_recompose_ok
        FROM customer ORDER BY c_custkey LIMIT 200""")),

    // Bitwise operations.
    QDef("q_bit_ops",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("xored"),
          shiftleft(col("o_orderkey"), 2).as("shl2"),
          shiftright(col("o_orderkey"), 3).as("shr3"),
          bit_count(col("o_orderkey")).cast("long").as("popcount"))
        .orderBy(col("o_orderkey"))
        .limit(400),
      Some("""SELECT o_orderkey,
        o_orderkey & 255 AS low_byte,
        o_orderkey | 4096 AS with_flag,
        xor(o_orderkey, o_custkey) AS xored,
        o_orderkey << 2 AS shl2,
        o_orderkey >> 3 AS shr3,
        CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
        FROM orders ORDER BY o_orderkey LIMIT 400""")),

    // Nested struct construction + field access round trip. The struct cell
    // is emitted as to_json text (driver's checker can't sort struct cells);
    // bal is stringified via DECIMAL(12,2) so both engines render "100.00"
    // identically inside the JSON.
    QDef("q_struct_funs",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          struct(col("c_name").as("name"),
            col("c_mktsegment").as("segment"),
            col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(12, 2))
              .cast("string").as("bal")).as("info"))
        .select(col("c_custkey"),
          to_json(col("info")).as("info_json"),
          col("info.name").as("flat_name"),
          col("info.bal").as("flat_bal"))
        .orderBy(col("c_custkey"))
        .limit(300),
      Some("""SELECT c_custkey,
        CAST(to_json({'name': c_name, 'segment': c_mktsegment,
                 'bal': CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)})
          AS VARCHAR) AS info_json,
        c_name AS flat_name,
        CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS flat_bal
        FROM customer ORDER BY c_custkey LIMIT 300""")),

    QDef("q_date_format",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("full"),
          date_format(col("o_orderdate"), "yyyy").as("y"))
        .orderBy(col("o_orderkey"))
        .limit(300),
      Some("""SELECT o_orderkey,
        strftime(o_orderdate, '%Y-%m') AS ym,
        strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS full,
        strftime(o_orderdate, '%Y') AS y
        FROM orders ORDER BY o_orderkey LIMIT 300""")),

    QDef("q_math_funs",
      (s, d) => lineitem(s, d)
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          ceil(col("l_quantity") / 3.0).cast("long").as("qty_ceil3"),
          floor(col("l_extendedprice") / 1000.0).cast("long").as("price_k"),
          round(pow(col("l_discount") + 1.0, 2), 6).as("pow2"),
          round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(log10(col("l_extendedprice")), 6).as("log10_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          pmod(col("l_orderkey"), lit(13)).as("mod13"))
        .orderBy(col("l_orderkey"), col("line_no"), col("price_r1"), col("sqrt_qty")),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        round(l_extendedprice, 1) AS price_r1,
        abs(l_discount - 0.05) AS abs_disc,
        CAST(ceil(l_quantity / 3.0) AS BIGINT) AS qty_ceil3,
        CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
        round(pow(l_discount + 1.0, 2), 6) AS pow2,
        round(sqrt(l_quantity), 6) AS sqrt_qty,
        round(ln(l_extendedprice), 6) AS ln_price,
        round(log10(l_extendedprice), 6) AS log10_price,
        round(exp(l_discount), 6) AS exp_disc,
        l_orderkey % 13 AS mod13
        FROM lineitem WHERE l_orderkey % 100 = 0
        ORDER BY l_orderkey, line_no, price_r1, sqrt_qty""")),

    QDef("q_cond_funs",
      (s, d) => orders(s, d)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 250000.0, "big")
            .when(col("o_totalprice") > 100000.0, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"),
          round(greatest(col("o_totalprice"), lit(150000.0)), 2).as("at_least"),
          round(least(col("o_totalprice"), lit(150000.0)), 2).as("at_most"),
          (col("o_orderstatus") === "F").cast("long").as("is_final"))
        .orderBy(col("o_orderkey"))
        .limit(400),
      Some("""SELECT o_orderkey,
        CASE WHEN o_totalprice > 250000.0 THEN 'big'
             WHEN o_totalprice > 100000.0 THEN 'mid'
             ELSE 'small' END AS bucket,
        coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
        round(greatest(o_totalprice, 150000.0), 2) AS at_least,
        round(least(o_totalprice, 150000.0), 2) AS at_most,
        CAST(o_orderstatus = 'F' AS BIGINT) AS is_final
        FROM orders ORDER BY o_orderkey LIMIT 400""")),

    // Exact decimal arithmetic: cast-to-decimal per row, multiply exactly,
    // emit as double (identical value both engines), plus an exact grouped sum.
    QDef("q_cast_decimal",
      (s, d) => lineitem(s, d)
        .select(col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            col("l_discount").cast(DecimalType(18, 4))).cast("double").as("disc_amt"))
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("disc_amt")).as("total_disc"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
        ${sqlDsum("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4)) AS DOUBLE)")} AS total_disc,
        count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // JSON extraction from events.props (e.g. {"k": 87}); oracle uses a
    // regexp to avoid depending on the DuckDB json extension.
    QDef("q_json_extract",
      (s, d) => events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        min(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS min_k,
        max(CAST(regexp_extract(props, '"k":\s*(-?[0-9]+)', 1) AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type""")),

    QDef("q_hash_md5",
      (s, d) => customer(s, d)
        .select(col("c_custkey"),
          md5(col("c_name").cast("binary")).as("md5_name"),
          sha2(col("c_name").cast("binary"), 256).as("sha256_name"))
        .orderBy(col("c_custkey"))
        .limit(200),
      Some("""SELECT c_custkey, md5(c_name) AS md5_name,
        sha256(c_name) AS sha256_name
        FROM customer ORDER BY c_custkey LIMIT 200""")),

    // Array functions over the 64-dim embedding column; float values pass
    // through exactly, HOF-computed norms in double then rounded.
    QDef("q_array_funs",
      (s, d) => embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          // slice stays in the plan but is reduced to a scalar (driver's
          // checker can't sort array cells); float→double is exact widening
          round(aggregate(slice(col("embedding"), 1, 3), lit(0.0),
            (acc, x) => acc + x.cast("double")), 6).as("head3_sum"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          element_at(col("embedding"), -1).cast("double").as("last_val"),
          array_max(col("embedding")).cast("double").as("max_val"),
          array_min(col("embedding")).cast("double").as("min_val"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("norm2"))
        .orderBy(col("vec_id"))
        .limit(400),
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        round(list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))), 6) AS head3_sum,
        CAST(embedding[1] AS DOUBLE) AS first_val,
        CAST(embedding[-1] AS DOUBLE) AS last_val,
        CAST(list_max(embedding) AS DOUBLE) AS max_val,
        CAST(list_min(embedding) AS DOUBLE) AS min_val,
        round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2
        FROM embeddings ORDER BY vec_id LIMIT 400"""))
  )
}
