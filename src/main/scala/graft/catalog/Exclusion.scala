package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-exclusion filtering (cmd/root.go:227-246; config example.yml:23-26):
  * each configured pattern excludes matching table names; `*` is the
  * wildcard (mapped to SQL LIKE `%`). Expressed as a single conjunctive
  * Column predicate so Catalyst can push it into the scan.
  */
object Exclusion {

  /** `*` → `%`, matching the reference's wildcard rewrite (root.go:237-239). */
  def toLikePattern(p: String): String = p.replace("*", "%")

  /** Conjunction of NOT LIKE predicates over `c`. Empty pattern list → keep
    * everything. */
  def excludePredicate(c: Column, patterns: Seq[String]): Column =
    patterns.foldLeft(lit(true))((acc, p) => acc && !c.like(toLikePattern(p)))

  def filterExcluded(df: DataFrame, nameCol: String, patterns: Seq[String]): DataFrame =
    df.filter(excludePredicate(col(nameCol), patterns))
}
