package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ddlgen.DdlGen

/** The catalog→DDL generators (SURVEY §2.1 S6–S10) as oracle-checked
  * queries over literal information_schema-shaped fixtures — the same
  * VALUES rows on both engines, so the DuckDB oracle exercises the full
  * generator logic (ordered string-agg, branch pyramids, scrub regexes),
  * not just a spec's golden strings.
  */
object DdlQueries {

  type QFn = (SparkSession, String) => DataFrame

  val queries: Seq[(String, QFn, Option[String])] = Seq(

    // ----- S7: index DDL (GROUP_CONCAT + IF/CASE pyramid) ----------------
    ("q36_ddl_index", (s: SparkSession, dir: String) => {
      import s.implicits._
      val stats = Seq(
        ("t1", "PRIMARY", 0, 1, "id", "BTREE"),
        ("t1", "ix_ab", 1, 2, "b", "BTREE"),
        ("t1", "ix_ab", 1, 1, "a", "BTREE"),
        ("t1", "ux_c", 0, 1, "c", "BTREE"),
        ("t2", "ft_d", 1, 1, "d", "FULLTEXT"),
        ("t2", "PRIMARY", 0, 2, "k2", "BTREE"),
        ("t2", "PRIMARY", 0, 1, "k1", "BTREE"))
        .toDF("table_name", "index_name", "non_unique", "seq_in_index",
          "column_name", "index_type")
      DdlGen.indexDdl(stats, suffix = "s1")
    }, Some("""
      WITH stats(table_name, index_name, non_unique, seq_in_index, column_name, index_type) AS (VALUES
        ('t1', 'PRIMARY', 0, 1, 'id', 'BTREE'),
        ('t1', 'ix_ab', 1, 2, 'b', 'BTREE'),
        ('t1', 'ix_ab', 1, 1, 'a', 'BTREE'),
        ('t1', 'ux_c', 0, 1, 'c', 'BTREE'),
        ('t2', 'ft_d', 1, 1, 'd', 'FULLTEXT'),
        ('t2', 'PRIMARY', 0, 2, 'k2', 'BTREE'),
        ('t2', 'PRIMARY', 0, 1, 'k1', 'BTREE')),
      g AS (SELECT table_name, index_name, non_unique, index_type,
              string_agg(column_name, ', ' ORDER BY seq_in_index) AS col_list
            FROM stats GROUP BY table_name, index_name, non_unique, index_type)
      SELECT table_name, index_name,
        CASE WHEN index_name = 'PRIMARY'
               THEN 'alter table ' || table_name || ' add primary key (' || col_list || ')'
             WHEN non_unique = 0
               THEN 'create unique index ' || index_name || '_s1 on ' || table_name || ' (' || col_list || ')'
             WHEN upper(index_type) = 'FULLTEXT'
               THEN 'create index ' || index_name || '_s1 on ' || table_name ||
                    ' using gin(to_tsvector(''english'', ' || col_list || '))'
             ELSE 'create index ' || index_name || '_s1 on ' || table_name || ' (' || col_list || ')'
        END AS ddl
      FROM g ORDER BY table_name, index_name""")),

    // ----- S8: FK DDL (join + ordered string-agg) ------------------------
    ("q37_ddl_fk", (s: SparkSession, dir: String) => {
      import s.implicits._
      val kcu = Seq(
        ("fk_a", "child", "a", 1, "parent", "x"),
        ("fk_a", "child", "b", 2, "parent", "y"),
        ("fk_b", "child2", "p", 1, "parent", "x"))
        .toDF("constraint_name", "table_name", "column_name", "ordinal_position",
          "referenced_table_name", "referenced_column_name")
      val rc = Seq(("fk_a", "CASCADE", "NO ACTION"), ("fk_b", "RESTRICT", "SET NULL"))
        .toDF("constraint_name", "update_rule", "delete_rule")
      DdlGen.fkDdl(kcu, rc)
    }, Some("""
      WITH kcu(constraint_name, table_name, column_name, ordinal_position, referenced_table_name, referenced_column_name) AS (VALUES
        ('fk_a', 'child', 'a', 1, 'parent', 'x'),
        ('fk_a', 'child', 'b', 2, 'parent', 'y'),
        ('fk_b', 'child2', 'p', 1, 'parent', 'x')),
      rc(constraint_name, update_rule, delete_rule) AS (VALUES
        ('fk_a', 'CASCADE', 'NO ACTION'), ('fk_b', 'RESTRICT', 'SET NULL')),
      g AS (SELECT k.constraint_name, k.table_name, k.referenced_table_name,
              r.update_rule, r.delete_rule,
              string_agg(k.column_name, ', ' ORDER BY k.ordinal_position) AS fk_cols,
              string_agg(k.referenced_column_name, ', ' ORDER BY k.ordinal_position) AS ref_cols
            FROM kcu k JOIN rc r USING (constraint_name)
            GROUP BY 1, 2, 3, 4, 5)
      SELECT table_name, constraint_name,
        'alter table ' || table_name || ' add constraint ' || constraint_name ||
        ' foreign key (' || fk_cols || ') references ' || referenced_table_name ||
        ' (' || ref_cols || ') on delete ' || lower(delete_rule) ||
        ' on update ' || lower(update_rule) AS ddl
      FROM g ORDER BY table_name, constraint_name""")),

    // ----- S6: sequence DDL triplet --------------------------------------
    ("q38_ddl_sequence", (s: SparkSession, dir: String) => {
      import s.implicits._
      val ai = Seq(("t1", "id", 42L), ("t2", "seq_no", 7L))
        .toDF("table_name", "column_name", "auto_increment")
      DdlGen.sequenceDdl(ai)
    }, Some("""
      WITH ai(table_name, column_name, auto_increment) AS (VALUES
        ('t1', 'id', 42), ('t2', 'seq_no', 7))
      SELECT table_name, column_name,
        'drop sequence if exists seq_' || table_name || '_' || column_name AS drop_ddl,
        'create sequence seq_' || table_name || '_' || column_name ||
          ' start with ' || auto_increment AS create_ddl,
        'alter table ' || table_name || ' alter column ' || column_name ||
          ' set default nextval(''seq_' || table_name || '_' || column_name || ''')' AS default_ddl
      FROM ai ORDER BY table_name, column_name""")),

    // ----- S9/S10: view scrub + trigger comment rewrite ------------------
    ("q39_ddl_view_trigger", (s: SparkSession, dir: String) => {
      import s.implicits._
      val views = Seq(
        ("v1", "select `a`, convert(`b` using utf8mb4) from mydb.`t`"),
        ("v2", "select x from mydb.u where x > 1"))
        .toDF("table_name", "view_definition")
      val trig = Seq(("tr1", "#note\nbegin\n#x\nend")).toDF("trigger_name", "action_statement")
      DdlGen.viewDdl(views, "mydb")
        .select($"table_name".as("object_name"), $"ddl".as("body"))
        .unionByName(DdlGen.triggerDdl(trig)
          .select($"trigger_name".as("object_name"), $"body"))
        .orderBy("object_name")
    }, Some("""
      WITH v(table_name, view_definition) AS (VALUES
        ('v1', 'select `a`, convert(`b` using utf8mb4) from mydb.`t`'),
        ('v2', 'select x from mydb.u where x > 1')),
      t(trigger_name, action_statement) AS (VALUES ('tr1', chr(35) || 'note' || chr(10) || 'begin' || chr(10) || chr(35) || 'x' || chr(10) || 'end')),
      vd AS (SELECT table_name AS object_name,
        'create or replace view ' || table_name || ' as ' ||
          regexp_replace(regexp_replace(regexp_replace(view_definition, '`', '', 'g'),
            'mydb\.', '', 'g'), '(?i)convert\(([^)]+) using [a-z0-9]+\)', '\1', 'g') AS body
        FROM v),
      td AS (SELECT trigger_name AS object_name,
        regexp_replace(action_statement, '(?m)^#', '--', 'g') AS body FROM t)
      SELECT * FROM (SELECT * FROM vd UNION ALL SELECT * FROM td)
      ORDER BY object_name"""))
  )
}
