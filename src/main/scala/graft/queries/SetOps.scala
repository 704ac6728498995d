package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Set-operation surface: UNION ALL, UNION (distinct), unionByName,
  * INTERSECT, EXCEPT, EXCEPT ALL.
  */
object SetOps {

  val all: Seq[QDef] = Seq(

    QDef("q_union_all",
      (s, d) => orders(s, d).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey"), lit("big_order").as("src"))
        .union(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"), lit("building").as("src")))
        .orderBy(col("custkey"), col("src")),
      Some("""SELECT * FROM (
          SELECT o_custkey AS custkey, 'big_order' AS src FROM orders
            WHERE o_totalprice > 250000.0
          UNION ALL
          SELECT c_custkey, 'building' FROM customer
            WHERE c_mktsegment = 'BUILDING')
        ORDER BY custkey, src""")),

    QDef("q_union_distinct",
      (s, d) => orders(s, d).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey"))
        .union(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")))
        .distinct()
        .orderBy(col("custkey")),
      Some("""SELECT * FROM (
          SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000.0
          UNION
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        ORDER BY custkey""")),

    // unionByName: same result as q_union_all but the second input's
    // columns are listed in a different order and matched by name.
    QDef("q_union_by_name",
      (s, d) => orders(s, d).filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("custkey"), lit("big_order").as("src"))
        .unionByName(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(lit("building").as("src"), col("c_custkey").as("custkey")))
        .orderBy(col("custkey"), col("src")),
      Some("""SELECT * FROM (
          SELECT o_custkey AS custkey, 'big_order' AS src FROM orders
            WHERE o_totalprice > 250000.0
          UNION ALL
          SELECT c_custkey, 'building' FROM customer
            WHERE c_mktsegment = 'BUILDING')
        ORDER BY custkey, src""")),

    QDef("q_intersect",
      (s, d) => orders(s, d).select(col("o_custkey").as("custkey"))
        .intersect(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey")),
      Some("""SELECT * FROM (
          SELECT o_custkey AS custkey FROM orders
          INTERSECT
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        ORDER BY custkey""")),

    QDef("q_except",
      (s, d) => customer(s, d).select(col("c_custkey").as("custkey"))
        .except(orders(s, d).filter(col("o_totalprice") > 200000.0)
          .select(col("o_custkey").as("custkey")))
        .orderBy(col("custkey")),
      Some("""SELECT * FROM (
          SELECT c_custkey AS custkey FROM customer
          EXCEPT
          SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0)
        ORDER BY custkey""")),

    // Multiset EXCEPT ALL: each order keeps multiplicity minus one per
    // matching filtered row.
    QDef("q_except_all",
      (s, d) => orders(s, d).select(col("o_custkey").as("custkey"))
        .exceptAll(orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("custkey")),
      Some("""SELECT custkey, count(*) AS n FROM (
          SELECT o_custkey AS custkey FROM orders
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY custkey ORDER BY custkey""")),

    QDef("q_intersect_all",
      (s, d) => orders(s, d).select(col("o_custkey").as("custkey"))
        .intersectAll(orders(s, d).filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey").as("custkey")))
        .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("custkey")),
      Some("""SELECT custkey, count(*) AS n FROM (
          SELECT o_custkey AS custkey FROM orders
          INTERSECT ALL
          SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0)
        GROUP BY custkey ORDER BY custkey"""))
  )
}
