package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every registered operator from the query modules:
  *   - queries.Relational: scans, filter/project, joins, aggs, windows,
  *     top-k, set ops (SURVEY §2 native inventory)
  *   - queries.TextOps: word count / grep (the reference's golden
  *     queries, SURVEY §2.4) + text-quality operators
  *   - queries.EventOps: time-window aggs, sessionization, JSON
  *   - queries.DedupOps: exact + MinHash/LSH/SimHash near-dup
  *   - queries.SimilarityOps: brute-force + LSH ANN over embeddings
  *   - mr.PipeOps: the generic external-executable map/reduce surface
  *     (reference O1/O6, `mapreduce/worker/__main__.py:55-87`)
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    _root_.graft.queries.Relational.entries ++
      _root_.graft.queries.TextOps.entries ++
      _root_.graft.queries.EventOps.entries ++
      _root_.graft.queries.DedupOps.entries ++
      _root_.graft.queries.CurationOps.entries ++
      _root_.graft.queries.PiiOps.entries ++
      _root_.graft.queries.GraphOps.entries ++
      _root_.graft.queries.EtlOps.entries ++
      _root_.graft.queries.BpeOps.entries ++
      _root_.graft.queries.SimilarityOps.entries ++
      _root_.graft.queries.RetrievalOps.entries ++
      mr.PipeOps.entries ++
      streaming.StreamOps.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q173: the complete published-recipe composite — URL canonicalize ->
    * per-domain cap -> PII scrub + density drop -> C4 blocklist ->
    * rule gate + classifier logit -> exact dedup -> fuzzy MinHash-band
    * dedup -> per-stratum quota split -> shard manifest, in ONE plan
    * over ONE documents scan (the round-8 successor to q167, folding in
    * q163/q164/q169/q172/q179; stage-identical to the streaming ingest
    * gate q181 on the document-local stages).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q173_recipe_manifest")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
