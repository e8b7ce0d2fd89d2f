package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 batch 15: migration data-quality audits — the pre-flight
  * screens a schema migration (the reference's domain) runs BEFORE
  * moving data, each a question the reference's pipeline answers only
  * implicitly (by failing mid-COPY):
  *
  *  - q412 referential integrity: orphan child keys per FK edge —
  *    the rows a target-side `ADD CONSTRAINT` would reject;
  *  - q413 numeric-width sizing: per money/measure column, the digit
  *    envelope a TypeMapper-style NUMERIC(p,s) choice must cover;
  *  - q414 string width/charset: per text column, observed char/byte
  *    widths (the VARCHAR(n) sizing input) and non-ASCII / NUL
  *    incidence (the COPY-encoding hazards q06 scrubs).
  *
  * Scale shapes: q412 aggregates child keys before the anti join
  * (shuffle = distinct keys, parents broadcast when small); q413/q414
  * are single-scan column-pruned aggregates unioned into a roster-
  * sized report.
  */
object Round11oQueries {

  type QFn = (SparkSession, String) => DataFrame

  def queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- referential-integrity audit --------------------------------------
    ("q412_fk_orphan_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String): DataFrame = {
        val keys = child.filter(col(ck).isNotNull)
          .groupBy(col(ck).as("k")).agg(count(lit(1)).as("n"))
        val orphans = keys.join(parent.select(col(pk).as("k")), Seq("k"), "left_anti")
        val tot = keys.agg(sum($"n").as("n_child"),
          count(lit(1)).as("n_distinct_keys"))
        val orp = orphans.agg(
          coalesce(sum($"n"), lit(0L)).as("n_orphan_rows"),
          count(lit(1)).as("n_orphan_keys"))
        tot.crossJoin(orp).select(lit(name).as("fk_edge"),
          $"n_child", $"n_distinct_keys", $"n_orphan_keys", $"n_orphan_rows",
          expr("1000000 * n_orphan_rows div n_child").as("orphan_ppm"))
      }
      val li = Tables.t(s, dir, "lineitem")
      Seq(
        edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.t(s, dir, "orders"), "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey",
          Tables.t(s, dir, "part"), "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.t(s, dir, "supplier"), "s_suppkey"),
        edge("orders.o_custkey->customer", Tables.t(s, dir, "orders"),
          "o_custkey", Tables.t(s, dir, "customer"), "c_custkey"),
        edge("customer.c_nationkey->nation", Tables.t(s, dir, "customer"),
          "c_nationkey", Tables.t(s, dir, "nation"), "n_nationkey")
      ).reduce(_ unionByName _).orderBy("fk_edge")
    }, Some("""
      WITH e1 AS (SELECT 'lineitem.l_orderkey->orders' AS fk_edge, l_orderkey AS k
          FROM lineitem WHERE l_orderkey IS NOT NULL),
      e1a AS (SELECT fk_edge, k, count(*) AS n FROM e1 GROUP BY 1, 2),
      e1r AS (SELECT fk_edge, CAST(sum(n) AS BIGINT) AS n_child,
          CAST(count(*) AS BIGINT) AS n_distinct_keys,
          CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_orphan_keys,
          CAST(coalesce(sum(n) FILTER (WHERE o_orderkey IS NULL), 0) AS BIGINT)
            AS n_orphan_rows
        FROM e1a LEFT JOIN orders ON k = o_orderkey GROUP BY 1),
      e2 AS (SELECT 'lineitem.l_partkey->part' AS fk_edge, l_partkey AS k
          FROM lineitem WHERE l_partkey IS NOT NULL),
      e2a AS (SELECT fk_edge, k, count(*) AS n FROM e2 GROUP BY 1, 2),
      e2r AS (SELECT fk_edge, CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE p_partkey IS NULL) AS BIGINT),
          CAST(coalesce(sum(n) FILTER (WHERE p_partkey IS NULL), 0) AS BIGINT)
        FROM e2a LEFT JOIN part ON k = p_partkey GROUP BY 1),
      e3 AS (SELECT 'lineitem.l_suppkey->supplier' AS fk_edge, l_suppkey AS k
          FROM lineitem WHERE l_suppkey IS NOT NULL),
      e3a AS (SELECT fk_edge, k, count(*) AS n FROM e3 GROUP BY 1, 2),
      e3r AS (SELECT fk_edge, CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE s_suppkey IS NULL) AS BIGINT),
          CAST(coalesce(sum(n) FILTER (WHERE s_suppkey IS NULL), 0) AS BIGINT)
        FROM e3a LEFT JOIN supplier ON k = s_suppkey GROUP BY 1),
      e4 AS (SELECT 'orders.o_custkey->customer' AS fk_edge, o_custkey AS k
          FROM orders WHERE o_custkey IS NOT NULL),
      e4a AS (SELECT fk_edge, k, count(*) AS n FROM e4 GROUP BY 1, 2),
      e4r AS (SELECT fk_edge, CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
          CAST(coalesce(sum(n) FILTER (WHERE c_custkey IS NULL), 0) AS BIGINT)
        FROM e4a LEFT JOIN customer ON k = c_custkey GROUP BY 1),
      e5 AS (SELECT 'customer.c_nationkey->nation' AS fk_edge,
          CAST(c_nationkey AS BIGINT) AS k
          FROM customer WHERE c_nationkey IS NOT NULL),
      e5a AS (SELECT fk_edge, k, count(*) AS n FROM e5 GROUP BY 1, 2),
      e5r AS (SELECT fk_edge, CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
          CAST(count(*) FILTER (WHERE n_nationkey IS NULL) AS BIGINT),
          CAST(coalesce(sum(n) FILTER (WHERE n_nationkey IS NULL), 0) AS BIGINT)
        FROM e5a LEFT JOIN nation ON k = n_nationkey GROUP BY 1),
      u AS (SELECT * FROM e1r UNION ALL SELECT * FROM e2r
        UNION ALL SELECT * FROM e3r UNION ALL SELECT * FROM e4r
        UNION ALL SELECT * FROM e5r)
      SELECT fk_edge, n_child, n_distinct_keys, n_orphan_keys, n_orphan_rows,
        1000000 * n_orphan_rows // n_child AS orphan_ppm
      FROM u ORDER BY fk_edge""")),

    // ----- numeric-width sizing audit ---------------------------------------
    // The digit envelope behind a NUMERIC(p,s) target-type choice: max
    // integer digits observed, negatives, nulls, and rows that would
    // overflow NUMERIC(12,2)'s 10 integer digits. floor(abs(x)) is
    // exact in doubles at these magnitudes, so the digit count is an
    // integer fact, not a float estimate.
    ("q413_numeric_width_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      def audit(table: String, column: String): DataFrame = {
        val x = col(column)
        Tables.t(s, dir, table).agg(
          count(lit(1)).as("n_rows"),
          sum(x.isNull.cast("long")).as("n_null"),
          sum((x < 0).cast("long")).as("n_negative"),
          max(length(floor(abs(x)).cast("long").cast("string"))
            .cast("long")).as("max_int_digits"),
          sum((abs(x) >= 1e10).cast("long")).as("n_overflow_12_2"))
          .select(lit(s"$table.$column").as("col"), $"n_rows", $"n_null",
            $"n_negative", $"max_int_digits", $"n_overflow_12_2")
      }
      Seq(audit("lineitem", "l_extendedprice"), audit("lineitem", "l_quantity"),
        audit("orders", "o_totalprice"), audit("customer", "c_acctbal"),
        audit("part", "p_retailprice"), audit("supplier", "s_acctbal"),
        audit("events", "value"))
        .reduce(_ unionByName _).orderBy("col")
    }, Some("""
      WITH a AS (
        SELECT 'lineitem.l_extendedprice' AS col, count(*) AS n_rows,
          count(*) FILTER (WHERE l_extendedprice IS NULL) AS n_null,
          count(*) FILTER (WHERE l_extendedprice < 0) AS n_negative,
          max(length(CAST(CAST(floor(abs(l_extendedprice)) AS BIGINT) AS VARCHAR))) AS max_int_digits,
          count(*) FILTER (WHERE abs(l_extendedprice) >= 1e10) AS n_overflow_12_2
        FROM lineitem
        UNION ALL SELECT 'lineitem.l_quantity', count(*),
          count(*) FILTER (WHERE l_quantity IS NULL),
          count(*) FILTER (WHERE l_quantity < 0),
          max(length(CAST(CAST(floor(abs(l_quantity)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(l_quantity) >= 1e10) FROM lineitem
        UNION ALL SELECT 'orders.o_totalprice', count(*),
          count(*) FILTER (WHERE o_totalprice IS NULL),
          count(*) FILTER (WHERE o_totalprice < 0),
          max(length(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(o_totalprice) >= 1e10) FROM orders
        UNION ALL SELECT 'customer.c_acctbal', count(*),
          count(*) FILTER (WHERE c_acctbal IS NULL),
          count(*) FILTER (WHERE c_acctbal < 0),
          max(length(CAST(CAST(floor(abs(c_acctbal)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(c_acctbal) >= 1e10) FROM customer
        UNION ALL SELECT 'part.p_retailprice', count(*),
          count(*) FILTER (WHERE p_retailprice IS NULL),
          count(*) FILTER (WHERE p_retailprice < 0),
          max(length(CAST(CAST(floor(abs(p_retailprice)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(p_retailprice) >= 1e10) FROM part
        UNION ALL SELECT 'supplier.s_acctbal', count(*),
          count(*) FILTER (WHERE s_acctbal IS NULL),
          count(*) FILTER (WHERE s_acctbal < 0),
          max(length(CAST(CAST(floor(abs(s_acctbal)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(s_acctbal) >= 1e10) FROM supplier
        UNION ALL SELECT 'events.value', count(*),
          count(*) FILTER (WHERE value IS NULL),
          count(*) FILTER (WHERE value < 0),
          max(length(CAST(CAST(floor(abs(value)) AS BIGINT) AS VARCHAR))),
          count(*) FILTER (WHERE abs(value) >= 1e10) FROM events)
      SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
        CAST(n_null AS BIGINT) AS n_null,
        CAST(n_negative AS BIGINT) AS n_negative,
        CAST(max_int_digits AS BIGINT) AS max_int_digits,
        CAST(n_overflow_12_2 AS BIGINT) AS n_overflow_12_2
      FROM a ORDER BY col""")),

    // ----- string width / charset audit -------------------------------------
    // The VARCHAR(n) sizing input plus the two COPY-encoding hazards
    // (non-ASCII, embedded NUL) per text column — what q06's scrubber
    // handles row-wise, reported as a per-column incidence screen.
    ("q414_string_width_audit", (s: SparkSession, dir: String) => {
      import s.implicits._
      def audit(table: String, column: String): DataFrame = {
        val x = col(column)
        Tables.t(s, dir, table).agg(
          count(lit(1)).as("n_rows"),
          sum(x.isNull.cast("long")).as("n_null"),
          max(length(x).cast("long")).as("max_chars"),
          max(octet_length(x).cast("long")).as("max_bytes"),
          sum(x.rlike("[^\\x00-\\x7F]").cast("long")).as("n_non_ascii"),
          sum((instr(x, "\u0000") > 0).cast("long")).as("n_with_nul"))
          .select(lit(s"$table.$column").as("col"), $"n_rows", $"n_null",
            $"max_chars", $"max_bytes", $"n_non_ascii", $"n_with_nul")
      }
      Seq(audit("customer", "c_name"), audit("customer", "c_mktsegment"),
        audit("part", "p_name"), audit("part", "p_type"),
        audit("supplier", "s_name"), audit("events", "event_type"),
        audit("events", "props"), audit("documents", "lang"))
        .reduce(_ unionByName _).orderBy("col")
    }, Some("""
      WITH a AS (
        SELECT 'customer.c_name' AS col, count(*) AS n_rows,
          count(*) FILTER (WHERE c_name IS NULL) AS n_null,
          max(length(c_name)) AS max_chars, max(strlen(c_name)) AS max_bytes,
          count(*) FILTER (WHERE regexp_matches(c_name, '[^\x00-\x7F]')) AS n_non_ascii,
          count(*) FILTER (WHERE strpos(c_name, chr(0)) > 0) AS n_with_nul
        FROM customer
        UNION ALL SELECT 'customer.c_mktsegment', count(*),
          count(*) FILTER (WHERE c_mktsegment IS NULL),
          max(length(c_mktsegment)), max(strlen(c_mktsegment)),
          count(*) FILTER (WHERE regexp_matches(c_mktsegment, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(c_mktsegment, chr(0)) > 0)
        FROM customer
        UNION ALL SELECT 'part.p_name', count(*),
          count(*) FILTER (WHERE p_name IS NULL),
          max(length(p_name)), max(strlen(p_name)),
          count(*) FILTER (WHERE regexp_matches(p_name, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(p_name, chr(0)) > 0)
        FROM part
        UNION ALL SELECT 'part.p_type', count(*),
          count(*) FILTER (WHERE p_type IS NULL),
          max(length(p_type)), max(strlen(p_type)),
          count(*) FILTER (WHERE regexp_matches(p_type, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(p_type, chr(0)) > 0)
        FROM part
        UNION ALL SELECT 'supplier.s_name', count(*),
          count(*) FILTER (WHERE s_name IS NULL),
          max(length(s_name)), max(strlen(s_name)),
          count(*) FILTER (WHERE regexp_matches(s_name, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(s_name, chr(0)) > 0)
        FROM supplier
        UNION ALL SELECT 'events.event_type', count(*),
          count(*) FILTER (WHERE event_type IS NULL),
          max(length(event_type)), max(strlen(event_type)),
          count(*) FILTER (WHERE regexp_matches(event_type, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(event_type, chr(0)) > 0)
        FROM events
        UNION ALL SELECT 'events.props', count(*),
          count(*) FILTER (WHERE props IS NULL),
          max(length(props)), max(strlen(props)),
          count(*) FILTER (WHERE regexp_matches(props, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(props, chr(0)) > 0)
        FROM events
        UNION ALL SELECT 'documents.lang', count(*),
          count(*) FILTER (WHERE lang IS NULL),
          max(length(lang)), max(strlen(lang)),
          count(*) FILTER (WHERE regexp_matches(lang, '[^\x00-\x7F]')),
          count(*) FILTER (WHERE strpos(lang, chr(0)) > 0)
        FROM documents)
      SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
        CAST(n_null AS BIGINT) AS n_null,
        CAST(max_chars AS BIGINT) AS max_chars,
        CAST(max_bytes AS BIGINT) AS max_bytes,
        CAST(n_non_ascii AS BIGINT) AS n_non_ascii,
        CAST(n_with_nul AS BIGINT) AS n_with_nul
      FROM a ORDER BY col"""))
  )
}
