package graft.queries

import graft.{Engine, QueryDef}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full PII detection / redaction stage — the Dolma / FineWeb scrub a
  * training pipeline runs before tokenization, completing q73's
  * email+phone md5 check with the three pieces real pipelines need:
  *
  *   - strict IPv4 (octet-validated 0-255, so `999.999.999.999` and
  *     `v1.2.3` decoys do NOT match) alongside email + both US phone
  *     forms;
  *   - q171: NON-destructive span attributes — (doc_id, pii_type,
  *     span_start, span_end, matched) with exact 0-based character
  *     offsets (end exclusive), the "attribute file" Dolma emits so
  *     downstream stages can mask without re-scanning;
  *   - q172: the destructive scrub — full redacted text with typed
  *     masks, per-class counts, masked-char totals, and the
  *     FineWeb-style density drop rule (docs above `PpmDropThreshold`
  *     PII-chars-per-million are dropped, not masked).
  *
  * The corpus has no organic PII, so each doc is suffixed with a
  * deterministic contact line derived from (doc_id, lang, source) —
  * one generator branch per PII class plus a decoy branch that must
  * match NOTHING (the negative control for the strict octet regex).
  * Generator and patterns are single backslash-free SQL strings used
  * verbatim by both engines (Spark `expr` + DuckDB interpolation —
  * literal `.` `(` `)` `+` appear as one-char classes `[.]` etc., so
  * no escape-processing divergence is possible).
  *
  * Span offsets are computed WITHOUT a position-reporting regex API
  * (neither engine has one): parts = split(aug, pat) and
  * ms = regexp_extract_all(aug, pat) interleave exactly, so
  * start_i = len(parts[1..i]) + len(ms[1..i-1]) — prefix sums over
  * per-doc arrays, identical in both engines. The generator's fixed
  * ` [eot]` tail guarantees no match touches end-of-string, which
  * keeps trailing-empty `split` semantics out of play.
  *
  * Scale (100 TB): both queries are pure narrow maps — codegen'd
  * regexp + array HOFs riding the parquet scan, rows ~1x (q171
  * explodes to ~1 span/doc), no shuffle except the gate's final
  * ORDER BY. The scrub composes into the q173 recipe composite
  * via [[piiClean]].
  */
object PiiOps {

  /** Email: local@domain.tld, tld >= 2 alpha. */
  private val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  /** US phone, paren or dashed form: (555) 012-3456 | 555-012-3456. */
  private val phonePat = "[(][0-9]{3}[)] [0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Strict IPv4: every octet 0-255, no leading zeros emitted by the
    * generator; `999.999.999.999` cannot match (the leftover digit
    * before each dot is provably unconsumable).
    */
  private val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private val ipPat = s"$octet[.]$octet[.]$octet[.]$octet"

  /** Docs above this PII density (masked chars per million) are
    * dropped rather than masked — the FineWeb rule for
    * contact-page-like docs that are mostly PII.
    */
  private[queries] val PpmDropThreshold = 60000L

  /** Deterministic PII suffix over (doc_id, lang, source): one branch
    * per class, a two-email branch, a mixed email+IP branch, and the
    * all-decoy negative-control branch. Dialect-shared SQL.
    */
  private[queries] val piiGenSql: String =
    """text || ' [contact] ' || (CASE doc_id % 5
         WHEN 0 THEN 'mail user' || CAST(doc_id AS STRING) || '@' || source || '.example.com'
           || (CASE WHEN doc_id % 10 = 0 THEN ' cc admin@' || lang || '-mail.org' ELSE '' END)
         WHEN 1 THEN 'call ' || (CASE doc_id % 2 WHEN 0
             THEN '(555) ' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
             ELSE '555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') END)
         WHEN 2 THEN 'from ' || CAST(10 + doc_id % 90 AS STRING) || '.' || CAST(doc_id % 256 AS STRING)
           || '.' || CAST((doc_id * 7) % 256 AS STRING) || '.' || CAST(doc_id % 250 AS STRING)
         WHEN 3 THEN 'decoy 999.999.999.999 user at example dot com 555-12 v1.2.3'
         ELSE 'mixed u' || CAST(doc_id % 89 AS STRING) || '@' || lang || '.net via 172.16.' || CAST(doc_id % 254 AS STRING) || '.1'
       END) || ' [eot]'"""

  private val piiTypes = Seq("email" -> emailPat, "phone" -> phonePat, "ipv4" -> ipPat)

  /** Spans of one PII class over the `aug` column: 0-based start,
    * exclusive end, plus the matched string. Guarded explode (never
    * `sequence(1, 0)`, which DESCENDS).
    */
  private def spansFor(aug: DataFrame, piiType: String, pat: String): DataFrame =
    aug
      .withColumn("parts", expr(s"split(aug, '$pat', -1)"))
      .withColumn("ms", expr(s"regexp_extract_all(aug, '$pat', 0)"))
      .filter(size(col("ms")) > 0)
      .withColumn("i", explode(expr("sequence(1, size(ms))")))
      .select(
        col("doc_id"),
        lit(piiType).as("pii_type"),
        col("i").cast("long").as("idx"),
        expr("""cast(aggregate(slice(parts, 1, i), cast(0 as bigint), (a, x) -> a + length(x))
                   + aggregate(slice(ms, 1, i - 1), cast(0 as bigint), (a, x) -> a + length(x)) as bigint)""")
          .as("span_start"),
        expr("""cast(aggregate(slice(parts, 1, i), cast(0 as bigint), (a, x) -> a + length(x))
                   + aggregate(slice(ms, 1, i), cast(0 as bigint), (a, x) -> a + length(x)) as bigint)""")
          .as("span_end"),
        expr("element_at(ms, i)").as("matched")
      )

  /** One DuckDB span CTE body per PII class (mirrors [[spansFor]]). */
  private def spanSqlFor(piiType: String, pat: String): String =
    s"""SELECT doc_id, '$piiType' AS pii_type, CAST(i AS BIGINT) AS idx,
          CAST(coalesce(list_sum(list_transform(parts[1:i], x -> length(x))), 0)
             + coalesce(list_sum(list_transform(ms[1:i-1], x -> length(x))), 0) AS BIGINT) AS span_start,
          CAST(coalesce(list_sum(list_transform(parts[1:i], x -> length(x))), 0)
             + coalesce(list_sum(list_transform(ms[1:i], x -> length(x))), 0) AS BIGINT) AS span_end,
          ms[i] AS matched
        FROM (SELECT doc_id, str_split_regex(aug, '$pat') AS parts,
                regexp_extract_all(aug, '$pat', 0) AS ms,
                unnest(generate_series(1, len(regexp_extract_all(aug, '$pat', 0)))) AS i
              FROM a)"""

  /** Redaction + density columns over an `aug` DataFrame — the
    * reusable scrub stage (q172 and the q173 composite both route
    * here, so the oracle gate covers the composed code path).
    * Output adds: clean_text, n_email, n_phone, n_ipv4, masked_chars,
    * pii_ppm, kept.
    *
    * Counts are SEQUENTIAL — n_email over the raw text, n_phone over
    * the email-masked text, n_ipv4 over the email+phone-masked text —
    * matching the replacement chain exactly, so a class is counted
    * only when its mask actually lands in clean_text (an IP embedded
    * inside an email address, e.g. 'x.1.2.3.4@b.co', is consumed by
    * the email mask and is NOT also counted as an IP). masked_chars
    * is derived from the real length delta plus the inserted mask
    * lengths, so overlapping matches can never double-count density
    * and trip the drop rule spuriously.
    */
  def piiClean(aug: DataFrame): DataFrame =
    aug
      .withColumn("t1", regexp_replace(col("aug"), emailPat, "<EMAIL>"))
      .withColumn("t2", regexp_replace(col("t1"), phonePat, "<PHONE>"))
      .withColumn("clean_text", regexp_replace(col("t2"), ipPat, "<IP>"))
      .withColumn("n_email", expr(s"cast(size(regexp_extract_all(aug, '$emailPat', 0)) as bigint)"))
      .withColumn("n_phone", expr(s"cast(size(regexp_extract_all(t1, '$phonePat', 0)) as bigint)"))
      .withColumn("n_ipv4", expr(s"cast(size(regexp_extract_all(t2, '$ipPat', 0)) as bigint)"))
      .withColumn(
        "masked_chars",
        expr("""cast(length(aug) - length(clean_text)
               + 7 * n_email + 7 * n_phone + 4 * n_ipv4 as bigint)""")
      )
      .withColumn(
        "pii_ppm",
        expr("cast(round(masked_chars * 1000000.0 / length(aug)) as bigint)")
      )
      .withColumn("kept", col("pii_ppm") < lit(PpmDropThreshold))
      .drop("t1", "t2")

  // DuckDB mirrors of the sequential chain, as nested expressions over
  // CTE column `aug` (kept as snippets so q172/q177's oracle and
  // q173's composite oracle interpolate the SAME strings).
  private def t1Sql: String = s"regexp_replace(aug, '$emailPat', '<EMAIL>', 'g')"
  private def t2Sql: String = s"regexp_replace($t1Sql, '$phonePat', '<PHONE>', 'g')"

  /** DuckDB mirror of [[piiClean]]'s clean_text column alone — the
    * subset the q173 recipe composite's oracle needs.
    */
  private[queries] def cleanTextSql: String =
    s"regexp_replace($t2Sql, '$ipPat', '<IP>', 'g')"

  private def nEmailSql: String = s"len(regexp_extract_all(aug, '$emailPat', 0))"
  private def nPhoneSql: String = s"len(regexp_extract_all($t1Sql, '$phonePat', 0))"
  private def nIpSql: String = s"len(regexp_extract_all($t2Sql, '$ipPat', 0))"
  private def maskedSql: String =
    s"""(length(aug) - length($cleanTextSql)
        + 7 * ($nEmailSql) + 7 * ($nPhoneSql) + 4 * ($nIpSql))"""

  /** DuckDB mirror of [[piiClean]]'s pii_ppm column alone (q173). */
  private[queries] def piiPpmSql: String =
    s"CAST(round($maskedSql * 1000000.0 / length(aug)) AS BIGINT)"

  /** DuckDB mirror of [[piiClean]]'s added columns, as a SELECT body
    * over CTE `a(doc_id, aug, ...)`.
    */
  private def cleanSqlCols: String =
    s"""$cleanTextSql AS clean_text,
        CAST($nEmailSql AS BIGINT) AS n_email,
        CAST($nPhoneSql AS BIGINT) AS n_phone,
        CAST($nIpSql AS BIGINT) AS n_ipv4,
        CAST($maskedSql AS BIGINT) AS masked_chars,
        $piiPpmSql AS pii_ppm"""

  /** q172's transform as a reusable DataFrame function — the scrub's
    * projection over any `documents`-shaped input (batch scan or
    * unbounded stream): stateless narrow ops only, so q177 runs it
    * UNCHANGED over a file stream with no state store and Append mode
    * (the q169/q170 pattern).
    */
  def redact(docs: DataFrame): DataFrame =
    piiClean(docs.select(col("doc_id"), expr(piiGenSql).as("aug")))
      .select(
        col("doc_id"),
        col("clean_text"),
        col("n_email"),
        col("n_phone"),
        col("n_ipv4"),
        col("masked_chars"),
        col("pii_ppm"),
        col("kept")
      )

  /** q172's oracle — shared verbatim by q177's streaming replay (same
    * transform, streaming source), so the two gates can never drift.
    * (A def: `entries` vals interpolate eagerly.)
    */
  private[graft] def redactOracleSql: String =
    s"""WITH a AS (SELECT doc_id, $piiGenSql AS aug FROM documents)
             SELECT doc_id, $cleanSqlCols,
               ($piiPpmSql < $PpmDropThreshold) AS kept
             FROM a ORDER BY doc_id"""

  val entries: Seq[QueryDef] = Seq(
    // -------------------------------------------------------------- q171
    QueryDef(
      "q171_pii_spans",
      (s, dir) => {
        val aug = Engine
          .table(s, dir, "documents")
          .select(col("doc_id"), expr(piiGenSql).as("aug"))
        piiTypes
          .map { case (t, p) => spansFor(aug, t, p) }
          .reduce(_ unionAll _)
          .orderBy(col("doc_id"), col("pii_type"), col("span_start"))
      },
      Some(s"""WITH a AS (SELECT doc_id, $piiGenSql AS aug FROM documents)
             ${piiTypes.map { case (t, p) => spanSqlFor(t, p) }.mkString(" UNION ALL ")}
             ORDER BY doc_id, pii_type, span_start""")
    ),
    // -------------------------------------------------------------- q172
    QueryDef(
      "q172_pii_redact",
      (s, dir) => redact(Engine.table(s, dir, "documents")).orderBy(col("doc_id")),
      Some(redactOracleSql)
    )
  )
}
