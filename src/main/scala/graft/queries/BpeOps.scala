package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge APPLICATION — the last standard stage of a
  * training-data pipeline the engine was missing: every published
  * pipeline sizes shards, packs sequences, and reports budgets in
  * TOKENIZER tokens, not whitespace words (a BPE token count runs
  * ~1.3-2x the word count and the gap is content-dependent, so
  * whitespace counts systematically mis-size packs).
  *
  * The merge table is a FIXED LITERAL (the engine's established
  * stand-in pattern — q169's classifier weights, q175's language
  * profiles): real pipelines load ~50k learned merges from a tokenizer
  * artifact, but the APPLICATION machinery — per-word symbol stream,
  * ordered merge rules, corpus-wide counts riding the scan — is
  * identical, and that machinery is what's implemented and gated here.
  *
  * Encoding contract (cross-engine exact, one definition site):
  *   - a word becomes a symbol stream rendered as a STRING, every
  *     symbol wrapped in its own spaces: "the" -> " t  h  e "
  *     (adjacent symbols are separated by TWO spaces — each owns a
  *     leading and a trailing one, so a replacement never consumes a
  *     neighbor's boundary and greedy left-to-right replacement is
  *     well-defined);
  *   - merge rules apply IN TABLE ORDER, one global left-to-right
  *     `replace(s, ' a  b ', ' ab ')` pass each. The table is ordered
  *     parts-before-use (a rule's symbols are built only by earlier
  *     rules), the same invariant real BPE merge lists have, which is
  *     what makes sequential per-rule application deterministic and
  *     equal in any engine with standard replace() semantics;
  *   - the BPE token count of a word = surviving symbol count; a doc's
  *     count sums its words'.
  *
  * Everything is codegen'd string builtins riding the scan — per-row
  * narrow work, no shuffle, no UDF; the DuckDB oracle applies the SAME
  * table via the same wrap/replace/count pipeline (only the two
  * engines' regex-replacement spellings differ: `$1` vs `\1`).
  */
object Bpe {

  /** Ordered merge rules (parts always precede uses). A real tokenizer
    * ships ~50k of these; 16 common English units exercise multi-level
    * merges (t+h -> th, th+e -> the; i+n -> in, in+g -> ing).
    */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h",
    "th" -> "e",
    "i" -> "n",
    "a" -> "n",
    "an" -> "d",
    "e" -> "r",
    "o" -> "n",
    "r" -> "e",
    "in" -> "g",
    "o" -> "r",
    "e" -> "n",
    "a" -> "t",
    "e" -> "s",
    "o" -> "u",
    "l" -> "e",
    "c" -> "o"
  )

  private def chain(wrapped: String): String =
    Merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, ' $a  $b ', ' $a$b ')"
    }

  /** Spark SQL: the full encode of a word-expression into the wrapped
    * symbol-stream string (apply [[symCountSpark]] for the count).
    */
  def encodeSpark(word: String): String =
    chain(s"regexp_replace($word, '(.)', ' $$1 ')")

  /** DuckDB mirror of [[encodeSpark]] — same wrap, same table, same
    * replace chain; only the regex replacement spelling differs.
    */
  def encodeDuck(word: String): String =
    chain(s"regexp_replace($word, '(.)', ' \\1 ', 'g')")

  /** Spark SQL: symbol count of an encoded stream (split on runs of
    * spaces, drop empties).
    */
  def symCountSpark(encoded: String): String =
    s"size(filter(split($encoded, ' +'), x -> x != ''))"

  /** DuckDB mirror of [[symCountSpark]]. */
  def symCountDuck(encoded: String): String =
    s"len(list_filter(string_split_regex($encoded, ' +'), x -> x <> ''))"

  /** Spark SQL: a doc's total BPE token count over its `toks` array. */
  def docTokensSpark(toksCol: String): String =
    s"aggregate(transform($toksCol, w -> cast(${symCountSpark(encodeSpark("w"))} as bigint)), " +
      "cast(0 as bigint), (acc, x) -> acc + x)"

  /** DuckDB mirror of [[docTokensSpark]]. */
  def docTokensDuck(toksCol: String): String =
    s"CAST(coalesce(list_sum(list_transform($toksCol, " +
      s"w -> ${symCountDuck(encodeDuck("w"))})), 0) AS BIGINT)"
}

object BpeOps {

  val entries: Seq[QueryDef] = Seq(
    // --------------------------------------------------------------- q188
    // BPE token accounting per document: word count, character count,
    // and the BPE token count under the literal merge table — the
    // numbers a shard-sizing/budgeting stage keys on (q129/q89 run on
    // whitespace words; this is the tokenizer-true replacement). Pure
    // narrow per-row string work riding the documents scan.
    QueryDef(
      "q188_bpe_tokenize",
      (s, dir) =>
        Engine
          .table(s, dir, "documents")
          .select(col("doc_id"), Tokenize.toksExpr.as("toks"))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_words"),
            expr("aggregate(transform(toks, w -> cast(length(w) as bigint)), " +
              "cast(0 as bigint), (acc, x) -> acc + x)").as("n_chars"),
            expr(Bpe.docTokensSpark("toks")).as("n_bpe")
          )
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, ${Tokenize.toksSql} AS toks FROM documents)
             SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(list_transform(toks, w -> length(w))), 0) AS BIGINT)
                 AS n_chars,
               ${Bpe.docTokensDuck("toks")} AS n_bpe
             FROM t ORDER BY doc_id""")
    ),
    // --------------------------------------------------------------- q189
    // Sequence packing on BPE tokens — q129's GPT-style
    // concatenate-and-slice packing, re-keyed on the tokenizer-true
    // counts q188 computes (the verdict-8 "wire the counts into
    // packing" step): each doc's (pack_id, pack_offset) in fixed
    // 2048-BPE-token training sequences via the exact distributed
    // prefix sum (Ranks.distributedPrefixSum — range exchange, local
    // cumsum, broadcast offsets; never a global single-partition
    // window).
    QueryDef(
      "q189_bpe_pack",
      (s, dir) => {
        val st = Engine
          .table(s, dir, "documents")
          .select(col("doc_id"), Tokenize.toksExpr.as("toks"))
          .select(col("doc_id"), expr(Bpe.docTokensSpark("toks")).as("n_tokens"))
        graft.operators.Ranks
          .distributedPrefixSum(st, Seq(col("doc_id")), col("n_tokens"), inclusive = false)
          .withColumn("start", col("psum"))
          .select(
            col("doc_id"),
            col("n_tokens"),
            expr("start div 2048").as("pack_id"),
            (col("start") % 2048).as("pack_offset")
          )
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, ${Tokenize.toksSql} AS toks FROM documents),
             st AS (SELECT doc_id, ${Bpe.docTokensDuck("toks")} AS nt FROM t),
             c AS (
               SELECT doc_id, nt,
                 coalesce(sum(nt) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
               FROM st)
             SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
               CAST(s // 2048 AS BIGINT) AS pack_id,
               CAST(s % 2048 AS BIGINT) AS pack_offset
             FROM c ORDER BY doc_id""")
    )
  )
}
