package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** THE engine-wide tokenizer contract, in one place: lower(text) split
  * on '[^a-z0-9]+', empty tokens dropped. Every text/dedup/curation
  * operator and every DuckDB oracle mirrors exactly this expression —
  * previously each module carried its own copy, so a regex tweak in one
  * could silently desynchronize query families that must agree (e.g.
  * decontamination shingles vs dedup shingles). Spark-side drift is now
  * a compile-time non-issue; Spark-vs-oracle drift is caught by the
  * hash-match gate.
  */
object Tokenize {

  /** tokens of an arbitrary string column (Spark side) — q173 tokenizes
    * the PII-scrubbed `clean_text`, not the raw `text`.
    */
  def toksExprOf(colName: String): Column =
    expr(s"filter(split(lower($colName), '[^a-z0-9]+'), x -> length(x) > 0)")

  /** the DuckDB mirror over an arbitrary column, for oracle SQL. */
  def toksSqlOf(colName: String): String =
    s"list_filter(string_split_regex(lower($colName), '[^a-z0-9]+'), x -> length(x) > 0)"

  /** tokens of the `text` column (Spark side). */
  def toksExpr: Column = toksExprOf("text")

  /** the DuckDB mirror, for interpolation into oracle SQL. */
  val toksSql: String = toksSqlOf("text")
}
