package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.catalog.{Exclusion, Pagination}
import graft.ddlgen.DdlGen
import graft.transform.ValueTransforms._
import graft.types.TypeMapper

/** The SURVEY §2 operator inventory, each as an oracle-checkable query over
  * the driver testdata.
  *
  * Determinism rules (the driver hash-compares against DuckDB):
  *  - money/double aggregates go through exact decimal arithmetic
  *    (`dsum`), so Spark's and DuckDB's summation order cannot diverge;
  *  - every query ends in a total ORDER BY;
  *  - both sides alias every computed column identically.
  */
object CoreQueries {

  /** Order-insensitive exact sum: per-row cast to decimal(18,s) (exact for
    * the 2-decimal money domain), decimal accumulation — then DOUBLE out.
    * The final double cast is deliberate: the sum itself is exact decimal
    * (no summation-order divergence), and a double survives every
    * parquet/pandas/DuckDB reader identically, whereas decimal columns
    * render with trailing zeros in some readers ("253942.00") and as
    * floats in others ("253942.0") and hash-mismatch downstream. */
  private def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale)).cast("double")

  /** Money columns as exact decimals. All arithmetic on these stays in
    * decimal (never double): double→decimal cast rounding differs between
    * engines (Spark rounds the shortest-repr string, DuckDB the exact
    * binary value), so products must be formed AFTER the cast, where the
    * 2-decimal inputs are exact and every multiply is exact. */
  private def money(c: Column): Column = c.cast(DecimalType(12, 2))
  private def rate1m(c: Column): Column = lit(1).cast(DecimalType(3, 2)) - c.cast(DecimalType(3, 2))
  private def rate1p(c: Column): Column = lit(1).cast(DecimalType(3, 2)) + c.cast(DecimalType(3, 2))

  type QFn = (SparkSession, String) => DataFrame

  val queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- A1/A3-family aggregation with full pushdown (TPC-H Q1 shape) --
    ("q01_agg", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity", 2).as("sum_qty"),
          dsum($"l_extendedprice", 2).as("sum_base_price"),
          sum(money($"l_extendedprice") * rate1m($"l_discount")).cast(DecimalType(38, 4)).cast("double").as("sum_disc_price"),
          sum(money($"l_extendedprice") * rate1m($"l_discount") * rate1p($"l_tax")).cast(DecimalType(38, 6)).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // ----- J1: the reference's deferred-join pagination as an operator ---
    ("q02_deferred_join_page", (s: SparkSession, dir: String) => {
      val orders = Tables.t(s, dir, "orders")
      Pagination.deferredJoinPage(orders, Seq("o_orderkey"), 1000, 500)
        .orderBy("o_orderkey")
    }, Some("""
      WITH temp AS (
        SELECT o_orderkey FROM orders
        ORDER BY o_orderkey LIMIT 500 OFFSET 1000)
      SELECT t.* FROM orders t JOIN temp USING (o_orderkey)
      ORDER BY o_orderkey""")),

    // ----- P3: wildcard exclusion filter (root.go:227-246) ---------------
    ("q03_exclusion_filter", (s: SparkSession, dir: String) => {
      val docs = Tables.t(s, dir, "documents")
      Exclusion.filterExcluded(docs, "source", Seq("src1", "src1*", "*2"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .orderBy("source")
    }, Some("""
      SELECT source, count(*) AS n_docs FROM documents
      WHERE lower(source) NOT LIKE 'src1' AND lower(source) NOT LIKE 'src1%'
        AND lower(source) NOT LIKE '%2'
      GROUP BY source ORDER BY source""")),

    // ----- A3: ordered GROUP_CONCAT via the sort-by-struct idiom ---------
    ("q04_group_concat", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables.t(s, dir, "customer")
      val nat = Tables.t(s, dir, "nation")
      cust.join(nat, $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(DdlGen.orderedGroupConcat($"c_custkey", $"c_name").as("customer_list"),
          count(lit(1)).as("n_customers"))
        .orderBy("n_name")
    }, Some("""
      SELECT n_name, string_agg(c_name, ', ' ORDER BY c_custkey) AS customer_list,
             count(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // ----- §1.1: the MySQL→PG type switch as a distributed expression ----
    ("q05_typemap", (s: SparkSession, dir: String) => {
      import s.implicits._
      val meta: Seq[(Int, String, String, Option[Long], Option[Int], Option[Int], String)] = Seq(
        (1, "id", "int", None, Some(10), Some(0), "NO"),
        (2, "c_tiny", "tinyint", None, Some(3), Some(0), "YES"),
        (3, "c_medium", "mediumint", None, Some(7), Some(0), "YES"),
        (4, "c_big", "bigint", None, Some(19), Some(0), "YES"),
        (5, "c_varchar", "varchar", Some(100L), None, None, "NO"),
        (6, "c_char", "char", Some(10L), None, None, "YES"),
        (7, "c_text", "text", Some(65535L), None, None, "YES"),
        (8, "c_ttext", "tinytext", Some(255L), None, None, "YES"),
        (9, "c_mtext", "mediumtext", Some(16777215L), None, None, "YES"),
        (10, "c_ltext", "longtext", Some(4294967295L), None, None, "YES"),
        (11, "c_dt", "datetime", None, None, None, "YES"),
        (12, "c_ts", "timestamp", None, None, None, "NO"),
        (13, "c_date", "date", None, None, None, "YES"),
        (14, "c_dec_ps", "decimal", None, Some(12), Some(3), "YES"),
        (15, "c_dec_p", "decimal", None, Some(8), None, "YES"),
        (16, "c_double", "double", None, Some(22), None, "YES"),
        (17, "c_float", "float", None, Some(12), None, "YES"),
        (18, "c_tblob", "tinyblob", None, None, None, "YES"),
        (19, "c_blob", "blob", None, None, None, "YES"),
        (20, "c_mblob", "mediumblob", None, None, None, "YES"),
        (21, "c_lblob", "longblob", None, None, None, "YES"),
        (22, "c_bit", "bit", None, None, None, "YES"),
        (23, "c_geom", "geometry", None, None, None, "YES"),
        (24, "c_enum", "enum", Some(7L), None, None, "YES"),
        (25, "c_json", "json", None, None, None, "YES"),
        (26, "c_year", "year", None, None, None, "YES"))
      meta.toDF("ordinal_position", "column_name", "data_type",
          "character_maximum_length", "numeric_precision", "numeric_scale", "is_nullable")
        .select(
          $"ordinal_position", $"column_name", $"data_type",
          TypeMapper.pgTypeExpr($"data_type", $"character_maximum_length",
            $"numeric_precision", $"numeric_scale").as("pg_type"),
          when($"is_nullable" === "NO", "not null").otherwise("null").as("nullability"))
        .orderBy("ordinal_position")
    }, Some("""
      WITH meta(ordinal_position, column_name, data_type, character_maximum_length, numeric_precision, numeric_scale, is_nullable) AS (VALUES
        (1, 'id', 'int', NULL, 10, 0, 'NO'),
        (2, 'c_tiny', 'tinyint', NULL, 3, 0, 'YES'),
        (3, 'c_medium', 'mediumint', NULL, 7, 0, 'YES'),
        (4, 'c_big', 'bigint', NULL, 19, 0, 'YES'),
        (5, 'c_varchar', 'varchar', 100, NULL, NULL, 'NO'),
        (6, 'c_char', 'char', 10, NULL, NULL, 'YES'),
        (7, 'c_text', 'text', 65535, NULL, NULL, 'YES'),
        (8, 'c_ttext', 'tinytext', 255, NULL, NULL, 'YES'),
        (9, 'c_mtext', 'mediumtext', 16777215, NULL, NULL, 'YES'),
        (10, 'c_ltext', 'longtext', 4294967295, NULL, NULL, 'YES'),
        (11, 'c_dt', 'datetime', NULL, NULL, NULL, 'YES'),
        (12, 'c_ts', 'timestamp', NULL, NULL, NULL, 'NO'),
        (13, 'c_date', 'date', NULL, NULL, NULL, 'YES'),
        (14, 'c_dec_ps', 'decimal', NULL, 12, 3, 'YES'),
        (15, 'c_dec_p', 'decimal', NULL, 8, NULL, 'YES'),
        (16, 'c_double', 'double', NULL, 22, NULL, 'YES'),
        (17, 'c_float', 'float', NULL, 12, NULL, 'YES'),
        (18, 'c_tblob', 'tinyblob', NULL, NULL, NULL, 'YES'),
        (19, 'c_blob', 'blob', NULL, NULL, NULL, 'YES'),
        (20, 'c_mblob', 'mediumblob', NULL, NULL, NULL, 'YES'),
        (21, 'c_lblob', 'longblob', NULL, NULL, NULL, 'YES'),
        (22, 'c_bit', 'bit', NULL, NULL, NULL, 'YES'),
        (23, 'c_geom', 'geometry', NULL, NULL, NULL, 'YES'),
        (24, 'c_enum', 'enum', 7, NULL, NULL, 'YES'),
        (25, 'c_json', 'json', NULL, NULL, NULL, 'YES'),
        (26, 'c_year', 'year', NULL, NULL, NULL, 'YES'))
      SELECT ordinal_position, column_name, data_type,
        CASE
          WHEN data_type IN ('int','mediumint','tinyint') THEN 'int'
          WHEN data_type = 'varchar' THEN 'varchar(' || character_maximum_length || ')'
          WHEN data_type = 'char' THEN 'char(' || character_maximum_length || ')'
          WHEN data_type IN ('text','tinytext','mediumtext','longtext') THEN 'text'
          WHEN data_type IN ('datetime','timestamp') THEN 'timestamp'
          WHEN data_type = 'decimal' THEN
            CASE WHEN numeric_scale IS NULL THEN 'decimal(' || numeric_precision || ')'
                 ELSE 'decimal(' || numeric_precision || ',' || numeric_scale || ')' END
          WHEN data_type IN ('double','float') THEN 'double precision'
          WHEN data_type IN ('tinyblob','blob','mediumblob','longblob') THEN 'bytea'
          ELSE data_type
        END AS pg_type,
        CASE WHEN is_nullable = 'NO' THEN 'not null' ELSE 'null' END AS nullability
      FROM meta ORDER BY ordinal_position""")),

    // ----- §1.2: GEOMETRY/BIT hex + NUL scrub value transforms -----------
    ("q06_value_transforms", (s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Tables.t(s, dir, "documents")
      val withNul = concat($"text", lit("\u0000"), lit("tail"))
      docs.filter($"doc_id" < 100)
        .select(
          $"doc_id",
          geomHex($"text".cast("binary")).as("geom_hex"),
          bitHex($"text".cast("binary")).as("bit_hex"),
          hasNul(withNul).as("had_nul"),
          length(withNul).as("raw_len"),
          length(scrubNul(withNul)).as("scrubbed_len"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        substr(lower(hex(encode(text))), 9) AS geom_hex,
        substr(lower(hex(encode(text))), 2) AS bit_hex,
        strpos(text || chr(0) || 'tail', chr(0)) > 0 AS had_nul,
        length(text || chr(0) || 'tail') AS raw_len,
        length(regexp_replace(text || chr(0) || 'tail', chr(0), '', 'g')) AS scrubbed_len
      FROM documents WHERE doc_id < 100 ORDER BY doc_id""")),

    // ----- C6/A1: compareDb count verification ---------------------------
    ("q07_count_compare", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      val orders = Tables.t(s, dir, "orders")
      val cust = Tables.t(s, dir, "customer")
      graft.verify.CompareDb.countCompare(s, Seq(
        ("customer_self", cust, Some(cust)),
        ("orders_vs_lineitem_keys", orders, Some(li.select($"l_orderkey").distinct())),
        ("region_missing", Tables.t(s, dir, "region"), None)))
    }, Some("""
      SELECT * FROM (
        SELECT 'customer_self' AS table_name,
               (SELECT count(*) FROM customer) AS src_rows,
               (SELECT count(*) FROM customer) AS dest_rows,
               'YES' AS dest_is_exist,
               CASE WHEN (SELECT count(*) FROM customer) = (SELECT count(*) FROM customer) THEN 'YES' ELSE 'NO' END AS is_ok
        UNION ALL
        SELECT 'orders_vs_lineitem_keys',
               (SELECT count(*) FROM orders),
               (SELECT count(DISTINCT l_orderkey) FROM lineitem),
               'YES',
               CASE WHEN (SELECT count(*) FROM orders) = (SELECT count(DISTINCT l_orderkey) FROM lineitem) THEN 'YES' ELSE 'NO' END
        UNION ALL
        SELECT 'region_missing', (SELECT count(*) FROM region), -1, 'NO', 'NO')
      ORDER BY table_name""")),

    // ----- A2/C4: pagination planning math -------------------------------
    ("q08_page_plan", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ps = 5000L
      Tables.t(s, dir, "lineitem")
        .agg(count(lit(1)).as("cnt"))
        .select($"cnt", explode(sequence(lit(0L),
          (ceil($"cnt" / lit(ps.toDouble))).cast("long") - 1)).as("page_id"))
        .select($"cnt", $"page_id",
          ($"page_id" * ps).as("page_offset"),
          least(lit(ps), $"cnt" - $"page_id" * ps).as("page_rows"))
        .orderBy("page_id")
    }, Some("""
      WITH c AS (SELECT count(*) AS cnt FROM lineitem),
      p AS (SELECT cnt, unnest(range(0, CAST(ceil(cnt / 5000.0) AS BIGINT))) AS page_id FROM c)
      SELECT cnt, page_id, page_id * 5000 AS page_offset,
             least(5000, cnt - page_id * 5000) AS page_rows
      FROM p ORDER BY page_id""")),

    // ----- P4/S2: zero-row schema probe ----------------------------------
    ("q09_schema_probe", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity", $"l_shipdate")
        .filter(lit(1) === lit(0))
    }, Some("""
      SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem WHERE 1 = 0""")),

    // ----- J2/J3-family: multi-way equi-join + agg (TPC-H Q5 shape) ------
    ("q10_join_agg", (s: SparkSession, dir: String) => {
      import s.implicits._
      val li = Tables.t(s, dir, "lineitem")
      val orders = Tables.t(s, dir, "orders")
      val cust = Tables.t(s, dir, "customer")
      val nation = Tables.t(s, dir, "nation")
      val region = Tables.t(s, dir, "region")
      li.join(orders, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name".isin("ASIA", "EUROPE"))
        .groupBy($"r_name", $"n_name")
        .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    }, Some("""
      SELECT r_name, n_name,
        CAST(CAST(sum(CAST((l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ----- O1-O4: global sort + limit (TakeOrderedAndProject) ------------
    ("q11_sort_limit", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
    }, Some("""
      SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ----- §2.6: the scalar-function surface -----------------------------
    ("q12_scalar_funcs", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .filter($"o_orderkey" <= 200)
        .select(
          $"o_orderkey",
          concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("status_prio"),
          lower($"o_orderpriority").as("prio_lower"),
          upper($"o_orderstatus").as("status_upper"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("coalesced"),
          when($"o_totalprice" > 200000, "big")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("small").as("size_class"),
          regexp_replace($"o_orderpriority", "[0-9]-", "").as("prio_name"),
          substring($"o_orderpriority", 1, 1).as("prio_code"),
          ceil($"o_totalprice").cast("long").as("price_ceil"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("order_date_str"),
          md5($"o_orderstatus".cast("binary")).as("status_md5"))
        .orderBy("o_orderkey")
    }, Some("""
      SELECT o_orderkey,
        o_orderstatus || '-' || o_orderpriority AS status_prio,
        lower(o_orderpriority) AS prio_lower,
        upper(o_orderstatus) AS status_upper,
        coalesce(nullif(o_orderstatus, 'O'), 'open') AS coalesced,
        CASE WHEN o_totalprice > 200000 THEN 'big'
             WHEN o_totalprice > 100000 THEN 'mid'
             ELSE 'small' END AS size_class,
        regexp_replace(o_orderpriority, '[0-9]-', '', 'g') AS prio_name,
        substr(o_orderpriority, 1, 1) AS prio_code,
        CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
        md5(o_orderstatus) AS status_md5
      FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""")),

    // ----- Window functions (ranking + running aggregate) ----------------
    ("q13_window_topk", (s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("cum_spend",
          sum($"o_totalprice".cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast(DecimalType(38, 2)).cast("double"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey",
          $"o_totalprice".cast(DecimalType(18, 2)).cast("double").as("total_price"), $"cum_spend")
        .orderBy("o_custkey", "rn")
    }, Some("""
      SELECT o_custkey, rn, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price, cum_spend
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
          CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS DOUBLE) AS cum_spend
        FROM orders)
      WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ----- Time-window aggregation over the events table -----------------
    ("q14_event_window", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value", 2).as("sum_value"))
        .select($"window.start".as("hour_start"), $"event_type", $"n_events", $"sum_value")
        .orderBy("hour_start", "event_type")
    }, Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        count(*) AS n_events,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")),

    // ----- Semi-structured: JSON extraction from event props -------------
    ("q15_json_extract", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .filter($"event_id" < 500)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }, Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events WHERE event_id < 500 ORDER BY event_id""")),

    // ----- Grouping sets: ROLLUP subtotals -------------------------------
    ("q29_rollup", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          dsum($"o_totalprice", 2).as("total_spend"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")),

    // ----- Anti/semi joins: EXISTS / NOT EXISTS --------------------------
    ("q30_anti_semi_join", (s: SparkSession, dir: String) => {
      import s.implicits._
      val cust = Tables.t(s, dir, "customer")
      val orders = Tables.t(s, dir, "orders")
      val without = cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", lit("no_orders").as("status"))
      val withO = cust.join(orders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", lit("has_orders").as("status"))
      without.unionByName(withO).orderBy("c_custkey")
    }, Some("""
      SELECT c_custkey, 'no_orders' AS status FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT c_custkey, 'has_orders' FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    // ----- Distinct aggregates -------------------------------------------
    ("q31_distinct_agg", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- Set operations -------------------------------------------------
    ("q32_set_ops", (s: SparkSession, dir: String) => {
      import s.implicits._
      val liParts = Tables.t(s, dir, "lineitem").select($"l_partkey".as("partkey")).distinct()
      val allParts = Tables.t(s, dir, "part").select($"p_partkey".as("partkey"))
      val unsold = allParts.exceptAll(liParts).select($"partkey", lit("unsold").as("tag"))
      val sold = allParts.intersect(liParts).select($"partkey", lit("sold").as("tag"))
      unsold.unionByName(sold).orderBy("partkey")
    }, Some("""
      SELECT partkey, 'unsold' AS tag FROM (
        SELECT p_partkey AS partkey FROM part
        EXCEPT ALL
        SELECT DISTINCT l_partkey FROM lineitem)
      UNION ALL
      SELECT partkey, 'sold' FROM (
        SELECT p_partkey AS partkey FROM part
        INTERSECT
        SELECT DISTINCT l_partkey FROM lineitem)
      ORDER BY partkey""")),

    // ----- Grouping sets: full CUBE --------------------------------------
    ("q35_cube", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .cube($"event_type", date_format($"ts", "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy($"event_type".asc_nulls_first, $"month".asc_nulls_first)
    }, Some("""
      SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n_events
      FROM events GROUP BY CUBE (event_type, strftime(ts, '%Y-%m'))
      ORDER BY event_type ASC NULLS FIRST, month ASC NULLS FIRST""")),

    // ----- Analytic window family: lag/lead/rank/ntile/first/last --------
    ("q40_window_analytics", (s: SparkSession, dir: String) => {
      import s.implicits._
      val price = $"o_totalprice".cast(DecimalType(18, 2)).cast("double")
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.t(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .select(
          $"o_custkey", $"o_orderkey",
          lag(price, 1).over(w).as("prev_price"),
          lead(price, 1).over(w).as("next_price"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          first(price).over(full).as("first_price"),
          last(price).over(full).as("last_price"))
        .orderBy("o_custkey", "o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
        lag(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS prev_price,
        lead(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS next_price,
        rank() OVER w AS rnk,
        dense_rank() OVER w AS drnk,
        ntile(4) OVER w AS quartile,
        first_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        last_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER
          (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    // ----- Grouping sets: explicit set list + grouping_id ----------------
    ("q46_grouping_sets", (s: SparkSession, dir: String) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .groupingSets(
          Seq(Seq($"o_orderstatus", $"o_orderpriority"), Seq($"o_orderstatus"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_orders"),
          dsum($"o_totalprice", 2).as("total_spend"))
        .orderBy($"gid", $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        count(*) AS n_orders,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_spend
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))
  )
}
