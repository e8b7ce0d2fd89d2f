package graft.ddlgen

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DdlGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("orderedGroupConcat: ordered by seq, distinct, custom separator (A3)") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (1, 3, "b"), (2, 1, "z")).toDF("g", "seq", "v")
    val got = df.groupBy($"g")
      .agg(DdlGen.orderedGroupConcat($"seq", $"v").as("l"))
      .orderBy("g").select("l").as[String].collect()
    assert(got.toSeq == Seq("a, b", "z"))
  }

  test("indexDdl: PRIMARY / unique / plain / fulltext branches (tablemeta.go:205-248)") {
    val stats = Seq(
      ("t1", "PRIMARY", 0, 1, "id", "BTREE"),
      ("t1", "ix_ab", 1, 2, "b", "BTREE"),
      ("t1", "ix_ab", 1, 1, "a", "BTREE"),
      ("t1", "ux_c", 0, 1, "c", "BTREE"),
      ("t1", "ft_d", 1, 1, "d", "FULLTEXT"))
      .toDF("table_name", "index_name", "non_unique", "seq_in_index", "column_name", "index_type")
    val ddl = DdlGen.indexDdl(stats, suffix = "s1").select("ddl").as[String].collect().toSeq
    assert(ddl.contains("alter table t1 add primary key (id)"))
    assert(ddl.contains("create index ix_ab_s1 on t1 (a, b)"))
    assert(ddl.contains("create unique index ux_c_s1 on t1 (c)"))
    assert(ddl.exists(_.contains("to_tsvector('english', d)")))
  }

  test("fkDdl: composite FK with rules (tablemeta.go:257-298)") {
    val kcu = Seq(
      ("fk1", "child", "a", 1, "parent", "x"),
      ("fk1", "child", "b", 2, "parent", "y"))
      .toDF("constraint_name", "table_name", "column_name", "ordinal_position",
        "referenced_table_name", "referenced_column_name")
    val rc = Seq(("fk1", "CASCADE", "NO ACTION")).toDF("constraint_name", "update_rule", "delete_rule")
    val ddl = DdlGen.fkDdl(kcu, rc).select("ddl").as[String].head()
    assert(ddl == "alter table child add constraint fk1 foreign key (a, b) " +
      "references parent (x, y) on delete no action on update cascade")
  }

  test("sequenceDdl emits drop/create/default triplet (tablemeta.go:156-201)") {
    val ai = Seq(("t1", "id", 42L)).toDF("table_name", "column_name", "auto_increment")
    val row = DdlGen.sequenceDdl(ai).collect().head
    assert(row.getAs[String]("drop_ddl") == "drop sequence if exists seq_t1_id")
    assert(row.getAs[String]("create_ddl") == "create sequence seq_t1_id start with 42")
    assert(row.getAs[String]("default_ddl")
      == "alter table t1 alter column id set default nextval('seq_t1_id')")
  }

  test("viewDdl scrubs backticks, schema prefix, convert() (tablemeta.go:300-331)") {
    val v = Seq(("v1", "select `a`, convert(`b` using utf8mb4) from mydb.`t`"))
      .toDF("table_name", "view_definition")
    assert(DdlGen.viewDdl(v, "mydb").select("ddl").as[String].head()
      == "create or replace view v1 as select a, b from t")
  }

  test("triggerDdl rewrites # comments to -- (tablemeta.go:333-364)") {
    val t = Seq(("tr1", "#note\nbegin\n#x\nend")).toDF("trigger_name", "action_statement")
    assert(DdlGen.triggerDdl(t).select("body").as[String].head()
      == "--note\nbegin\n--x\nend")
  }
}
