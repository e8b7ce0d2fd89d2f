package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-exclusion filtering (cmd/root.go:227-246; config example.yml:23-26):
  * each configured pattern excludes matching table names; `*` is the
  * wildcard (mapped to SQL LIKE `%`). Expressed as a single conjunctive
  * Column predicate so Catalyst can push it into the scan.
  *
  * Matching is CASE-INSENSITIVE: the reference evaluates exclusion as
  * MySQL `table_name NOT LIKE '...'`, and MySQL's default `*_ci`
  * collations compare case-insensitively — `exclude: LOG*` skips `log1`
  * there, so it must here too.
  */
object Exclusion {

  /** `*` → `%`, matching the reference's wildcard rewrite (root.go:237-239). */
  def toLikePattern(p: String): String = p.replace("*", "%")

  /** Conjunction of NOT LIKE predicates over `c`. Empty pattern list → keep
    * everything. */
  def excludePredicate(c: Column, patterns: Seq[String]): Column =
    patterns.foldLeft(lit(true))((acc, p) =>
      // Locale.ROOT: the default locale would fold 'LOGIN*' to 'logın*'
      // under tr_TR and silently stop matching
      acc && !lower(c).like(toLikePattern(p).toLowerCase(java.util.Locale.ROOT)))

  def filterExcluded(df: DataFrame, nameCol: String, patterns: Seq[String]): DataFrame =
    df.filter(excludePredicate(col(nameCol), patterns))

  /** One LIKE pattern → an anchored regex with SQL LIKE semantics
    * (`%` any sequence, `_` any single char, everything else literal) —
    * the driver-side compilation of exactly what `Column.like` evaluates. */
  def likeRegex(p: String): java.util.regex.Pattern = {
    val sb = new StringBuilder
    toLikePattern(p).foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case c   => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    // UNICODE_CASE so the compiled form folds non-ASCII the same way the
    // Column.like predicate's lower() does (Ö→ö), keeping the driver-side
    // work list and Spark-side filtering in agreement
    java.util.regex.Pattern.compile(sb.toString,
      java.util.regex.Pattern.DOTALL | java.util.regex.Pattern.CASE_INSENSITIVE |
        java.util.regex.Pattern.UNICODE_CASE)
  }

  /** Driver-side keep-predicate over table names (cmd/root.go:227-246).
    * The work list is catalog metadata — at most thousands of short
    * strings — so matching belongs on the driver: compiling the patterns
    * once and filtering in-memory costs microseconds, where spinning a
    * Spark job per name (or even one job for all names) costs scheduler
    * round-trips that serialize a 10k-table catalog into 10k jobs. */
  def compiledKeep(patterns: Seq[String]): String => Boolean = {
    val compiled = patterns.map(likeRegex)
    name => !compiled.exists(_.matcher(name).matches())
  }
}
