package graft.ddlgen

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native regeneration of the reference's catalog-to-DDL SQL
  * generators (cmd/tablemeta.go:156-364). The MySQL-only
  * `GROUP_CONCAT(DISTINCT col ORDER BY seq SEPARATOR ', ')` (tablemeta.go:215,
  * 217, 278) becomes the sort-by-struct idiom: collect_list of
  * (seq, value) structs → array_sort → project value → array_distinct →
  * array_join. All map-side-combinable aggregates; no driver loop.
  */
object DdlGen {

  /** Ordered, distinct string-agg: the Spark equivalent of MySQL
    * GROUP_CONCAT(DISTINCT v ORDER BY ord SEPARATOR sep). */
  def orderedGroupConcat(ord: Column, value: Column, sep: String = ", "): Column =
    array_join(
      array_distinct(transform(array_sort(collect_list(struct(ord.as("o"), value.as("v")))),
        x => x.getField("v"))),
      sep)

  /** Index DDL generation (cmd/tablemeta.go:205-248): one row per
    * (table, index) with its ordered column list → a CREATE/ALTER statement.
    * Expects columns: table_name, index_name, non_unique (int),
    * seq_in_index (int), column_name, index_type.
    * `suffix` replaces the reference's nondeterministic `uuid()/md5(rand())`
    * name salt (tablemeta.go:215) so output is testable. */
  def indexDdl(stats: DataFrame, suffix: String = "x", distributed: Boolean = false): DataFrame = {
    val cols = orderedGroupConcat(col("seq_in_index"), col("column_name")).as("col_list")
    val grouped = stats.groupBy(col("table_name"), col("index_name"),
        col("non_unique"), col("index_type"))
      .agg(cols)
    val ddl =
      when(col("index_name") === "PRIMARY",
        concat(lit("alter table "), col("table_name"),
          lit(" add primary key ("), col("col_list"), lit(")")))
      .when(col("non_unique") === 0,
        concat(lit("create unique index "), col("index_name"), lit("_"), lit(suffix),
          lit(" on "), col("table_name"), lit(" ("), col("col_list"), lit(")")))
      .when(upper(col("index_type")) === "FULLTEXT",
        concat(lit("create index "), col("index_name"), lit("_"), lit(suffix),
          lit(" on "), col("table_name"), lit(" using gin(to_tsvector('english', "),
          col("col_list"), lit("))")))
      .otherwise(
        concat(lit("create index "), col("index_name"), lit("_"), lit(suffix),
          lit(" on "), col("table_name"), lit(" ("), col("col_list"), lit(")")))
    grouped.select(col("table_name"), col("index_name"), ddl.as("ddl"))
      .orderBy("table_name", "index_name")
  }

  /** FK DDL generation (cmd/tablemeta.go:257-298): KEY_COLUMN_USAGE inner
    * join REFERENTIAL_CONSTRAINTS on constraint_name, GROUP_CONCAT of the
    * FK column list → ALTER TABLE ADD CONSTRAINT. kcu columns:
    * constraint_name, table_name, column_name, ordinal_position,
    * referenced_table_name, referenced_column_name. rc columns:
    * constraint_name, update_rule, delete_rule. */
  def fkDdl(kcu: DataFrame, rc: DataFrame): DataFrame = {
    kcu.join(rc, Seq("constraint_name"), "inner")
      .groupBy(col("constraint_name"), col("table_name"),
        col("referenced_table_name"), col("update_rule"), col("delete_rule"))
      .agg(
        orderedGroupConcat(col("ordinal_position"), col("column_name")).as("fk_cols"),
        orderedGroupConcat(col("ordinal_position"), col("referenced_column_name")).as("ref_cols"))
      .select(col("table_name"), col("constraint_name"),
        concat(lit("alter table "), col("table_name"),
          lit(" add constraint "), col("constraint_name"),
          lit(" foreign key ("), col("fk_cols"),
          lit(") references "), col("referenced_table_name"),
          lit(" ("), col("ref_cols"),
          lit(") on delete "), lower(col("delete_rule")),
          lit(" on update "), lower(col("update_rule"))).as("ddl"))
      .orderBy("table_name", "constraint_name")
  }

  /** Sequence DDL for auto-increment columns (cmd/tablemeta.go:156-201):
    * drop/create sequence + alter-default. Expects columns: table_name,
    * column_name, auto_increment (long). */
  def sequenceDdl(autoInc: DataFrame): DataFrame = {
    val seqName = concat(lit("seq_"), col("table_name"), lit("_"), col("column_name"))
    autoInc.select(
        col("table_name"), col("column_name"),
        concat(lit("drop sequence if exists "), seqName).as("drop_ddl"),
        concat(lit("create sequence "), seqName,
          lit(" start with "), col("auto_increment")).as("create_ddl"),
        concat(lit("alter table "), col("table_name"),
          lit(" alter column "), col("column_name"),
          lit(" set default nextval('"), seqName, lit("')")).as("default_ddl"))
      .orderBy("table_name", "column_name")
  }

  /** View-body scrub (cmd/tablemeta.go:300-331): strip backticks, the
    * source-schema prefix, and MySQL `convert(x using utf8mb4)` wrappers,
    * then wrap in CREATE OR REPLACE VIEW. Expects: table_name, view_definition. */
  def viewDdl(views: DataFrame, schemaName: String): DataFrame = {
    val body = regexp_replace(
      regexp_replace(
        regexp_replace(col("view_definition"), "`", ""),
        s"$schemaName\\.", ""),
      "(?i)convert\\(([^)]+) using [a-z0-9]+\\)", "$1")
    views.select(col("table_name"),
        concat(lit("create or replace view "), col("table_name"),
          lit(" as "), body).as("ddl"))
      .orderBy("table_name")
  }

  /** Trigger DDL scrub (cmd/tablemeta.go:333-364): `#` line comments → `--`.
    * Expects: trigger_name, action_statement. */
  def triggerDdl(triggers: DataFrame): DataFrame =
    triggers.select(col("trigger_name"),
        regexp_replace(col("action_statement"), "(?m)^#", "--").as("body"))
      .orderBy("trigger_name")
}
