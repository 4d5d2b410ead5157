package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.QueryDef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Driver-registry entries for the Structured Streaming surface: each
  * replays a finite table (events for the windowed/stateful family;
  * documents/embeddings for the incremental-index lifecycles) through
  * a real streaming query (file-stream source -> transform -> memory
  * sink or exactly-once index mutation) and returns the materialized
  * result, which must equal the batch semantics the DuckDB oracle
  * expresses. The index lifecycles (dedup q174/q176, ANN
  * q210-q228/q241/q249/q253, lexical q236/q237/q246/q248, hybrid
  * q250) share the staging helpers below and the TieredIndex
  * exactly-once batch watermarks.
  */
object StreamOps {

  private val seq = new AtomicInteger(0)
  private def sinkName(prefix: String): String = s"${prefix}_${seq.incrementAndGet()}"

  /** Stage "today's arrivals" (doc_id % 5 = 0) for the incremental-dedup
    * streams (q174/q176): 4 doc_id-range parquet files under
    * `work/incoming`, mtimes spaced 60 s so the file source's
    * oldest-first replay order IS doc_id order — which makes
    * "first arrival wins" coincide with the batch oracles' min(doc_id)
    * / lowest-id-earlier rules (range k's ids all precede range k+1's).
    */
  private def stageIncoming(
      s: org.apache.spark.sql.SparkSession, dir: String, work: String,
      table: String = "documents", idCol: String = "doc_id"): String = {
    val incoming = s"$work/incoming"
    graft.Engine
      .table(s, dir, table)
      .filter(col(idCol) % 5 === 0)
      .repartitionByRange(4, col(idCol))
      .write
      .parquet(incoming)
    val parts = new java.io.File(incoming)
      .listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName) // part-00000 = lowest doc_id range
    val base = parts.map(_.lastModified()).max
    // replay order IS the gate's determinism: a filesystem that rejects
    // setLastModified must fail loudly at staging time, not scramble
    // micro-batch order into a hard-to-diagnose hash mismatch
    parts.zipWithIndex.foreach { case (f, i) =>
      require(
        f.setLastModified(base + i * 60000L),
        s"stageIncoming: setLastModified failed for ${f.getPath} — " +
          "file-source replay order would be nondeterministic")
    }
    incoming
  }

  /** Stage a frame as `parts` single-file micro-batches under
    * `work/incoming` with a DETERMINISTIC, SQL-expressible membership:
    * file k holds the rows where `batchExpr` = k (unlike
    * [[stageIncoming]]'s range split, whose boundaries come from the
    * range partitioner's sampling and cannot be replayed by an
    * oracle). mtimes ascend in k, so the file source's oldest-first
    * replay makes micro-batch k's id BE k — the q214 per-batch
    * observables join against the oracle on it.
    */
  private def stageBatches(
      df: org.apache.spark.sql.DataFrame, work: String,
      batchExpr: org.apache.spark.sql.Column, parts: Int): String =
    stageBatchSlices(df, work, batchExpr, 0 until parts)

  /** [[stageBatches]]'s RANGE form — stage only `slices`, appending to
    * whatever is already staged under `work/incoming` with strictly
    * LATER mtimes (floor = max staged mtime + one step): the restart-
    * recovery lifecycle (q262) stages batches 0-1, runs a query to
    * completion, then stages 2-3 and resumes from the checkpoint — the
    * file source must list the new files after the consumed ones so
    * the resumed micro-batch ids continue exactly where the offsets
    * log stopped.
    */
  private def stageBatchSlices(
      df: org.apache.spark.sql.DataFrame, work: String,
      batchExpr: org.apache.spark.sql.Column, slices: Seq[Int]): String = {
    val incoming = s"$work/incoming"
    val staged = Option(new java.io.File(incoming).listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    val base = math.max(
      System.currentTimeMillis,
      (staged.map(_.lastModified) :+ 0L).max + 60000L)
    // ONE pass over the arrivals frame for ALL slices. The previous
    // per-slice `filter(batchExpr === b).coalesce(1).write` loop paid
    // |slices| full computations of `df` — for the hybrid gates that
    // frame is documents ⋈ embedding-ids, so staging alone read the
    // corpus |slices| times; at 100 TB a bookkeeping step must not be
    // |slices| corpus passes. The slice id becomes a dynamic partition
    // column, and `repartition(|slices|, __slice)` lands every row of
    // one slice in exactly ONE task, so each partition dir holds
    // exactly ONE file — `maxFilesPerTrigger=1` makes file ==
    // micro-batch, so the 1-file-per-slice invariant is load-bearing
    // and asserted below. Gated observables are aggregates / sorted
    // pages, so the shuffle's row order inside a staged file is
    // immaterial.
    val tmp = new java.io.File(s"$work/stage_tmp")
    graft.Engine.deleteRecursively(tmp)
    df.withColumn("__slice", batchExpr.cast("int"))
      .filter(col("__slice").isin(slices.map(b => b: Any): _*))
      .repartition(slices.size, col("__slice"))
      .write.partitionBy("__slice").parquet(tmp.toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(incoming)): Unit
    for ((b, i) <- slices.zipWithIndex) {
      val fs = Option(new java.io.File(tmp, s"__slice=$b").listFiles)
        .getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      // destination names CARRY THE SLICE NUMBER: two slices hashed to
      // the same write task produce part files with IDENTICAL names,
      // and a bare-name move into the flat incoming/ dir would silently
      // REPLACE the first file with the second (rename(2) semantics) —
      // one staged batch lost
      val dest = new java.io.File(incoming, f"slice-$b%05d.parquet")
      if (fs.isEmpty) {
        // an EMPTY slice still stages a schema-only file — micro-batch
        // ids must stay aligned with slice numbers (partitionBy never
        // creates a dir for a value with no rows)
        val etmp = new java.io.File(s"$work/stage_tmp_empty")
        graft.Engine.deleteRecursively(etmp)
        df.filter(lit(false)).coalesce(1).write.parquet(etmp.toString)
        val ef = Option(etmp.listFiles).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
        require(ef.length == 1, s"stageBatchSlices: empty-slice write for $b produced ${ef.length} files")
        java.nio.file.Files.move(ef(0).toPath, dest.toPath): Unit
        graft.Engine.deleteRecursively(etmp)
      } else {
        require(
          fs.length == 1,
          s"stageBatchSlices: slice $b staged ${fs.length} files — " +
            "repartition(|slices|, __slice) must land one file per slice " +
            "(file == micro-batch under maxFilesPerTrigger=1)")
        java.nio.file.Files.move(fs(0).toPath, dest.toPath): Unit
      }
      // batch-id-equals-k depends on these mtimes: fail loudly if the
      // filesystem refuses (a slow write's real mtime could otherwise
      // scramble micro-batch ids and fail the gate undiagnosably)
      require(
        dest.setLastModified(base + i * 60000L),
        s"stageBatches: setLastModified failed for ${dest.getPath} — " +
          "micro-batch ids would not equal the staged batch numbers")
    }
    graft.Engine.deleteRecursively(tmp)
    incoming
  }

  /** Per-LIFECYCLE memo of a generation's frozen quantizer frames.
    * `ss.read.parquet($gen/coarse|codebook)` inside a foreachBatch
    * loop re-lists the dir and re-reads parquet footers on the DRIVER
    * every micro-batch — pure fixed overhead, since quantizers are
    * immutable once their generation commits (rebuild-only
    * artifacts). One lazy frame pair per generation dir serves the
    * whole lifecycle; the memo lives in the query's closure and dies
    * with it (never across runs — a bench pass that rebuilds the
    * artifacts builds a fresh memo), and the frames are LAZY plans:
    * every batch still reads the parquet bytes at execution, nothing
    * caches data. Generation-swap lifecycles call it with the LIVE
    * root per batch — a retrain's fresh dir is only ever read (and
    * memoized) after its commit, so a memo entry can never go stale
    * within a run.
    */
  private def quantReader(): (org.apache.spark.sql.SparkSession, String) =>
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val memo = scala.collection.mutable.Map
      .empty[String, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)]
    (ss, gen) =>
      // synchronized: the dense leg may resolve quantizers from a
      // legsInParallel pool thread
      memo.synchronized {
        memo.getOrElseUpdate(
          gen, (ss.read.parquet(s"$gen/coarse"), ss.read.parquet(s"$gen/codebook")))
      }
  }

  /** Run a micro-batch's two INDEPENDENT index legs concurrently —
    * guide §2.6 "overlap independent jobs": the lexical (postings) and
    * dense (codes) legs of one CDC batch touch DISJOINT TieredIndex
    * dirs (each with its own writer lock and watermarks), so their
    * jobs can back-fill each other's scheduling/planning gaps on the
    * driver; actions were only sequential because the loop called
    * them sequentially. The ORDER CONTRACTS all hold: order WITHIN a
    * leg is preserved (tombstone before append, append before
    * maintain), and the serve/fence runs strictly AFTER both legs
    * (both Awaits return first). A failure in either leg rethrows at
    * the Await and fails the batch loudly, exactly as the sequential
    * spelling did.
    */
  private def legsInParallel(a: => Unit)(b: => Unit): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(a)
    val fb = Future(b)
    Await.result(fa, Duration.Inf)
    Await.result(fb, Duration.Inf)
  }

  /** The MID-STREAM-SEARCHABILITY lifecycle at system depth (k,
    * rounds) — ONE definition site for q214 (16, 1) and q219 (256, 2),
    * so the shallow gate and the production-depth gate run the same
    * code object: day-0 trains on the standing population (vec_id % 5
    * <> 0) and freezes its quantizers + codes through the unified
    * artifact writer; today's vectors arrive as 4 deterministic-mod
    * micro-batches; each batch frozen-encodes its arrivals, packs at
    * the writer's own depth dispatch (<= 16: 4-bit BIGINT, else the
    * K=256-capable hex), appends exactly-once (batchId watermark),
    * maintains, and then probes the LIVE index through the pruned
    * artifact-serving path — batch bid's arrivals must already be hits
    * in probe bid. The encode+append is watermark-guarded while the
    * probe+write runs unconditionally (idempotent overwrite — q214's
    * replay-window rationale). Output: (batch_id, qid, rn, vec_id, ad),
    * 4 gated probes, 3 strictly mid-stream.
    */
  private def ivfadcStreamSearch(
      s: org.apache.spark.sql.SparkSession, dir: String, tag: String,
      k: Int, rounds: Int,
      trainSample: Option[org.apache.spark.sql.Column] = None,
      policy: graft.operators.TieredIndex.Policy = graft.operators.TieredIndex.Policy(),
      midProbes: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val S = graft.queries.SimilarityOps
    val work = graft.Engine.scratchDir(tag, dir)
    graft.Engine.deleteRecursively(work)
    val day0 = S.ivecs(s, dir).filter(col("vec_id") % 5 =!= 0)
    // trainSample (q228): quantizers fit on a deterministic sample of
    // the day-0 standing population; the full standing population and
    // all arrivals still frozen-encode against them
    S.writeIvfAdcArtifacts(
      s, work.toString, day0, k = k, rounds = rounds,
      trainIv = trainSample.map(day0.filter))
    val codesDir = s"$work/codes"
    val incoming = stageBatches(
      graft.Engine.table(s, dir, "embeddings").filter(col("vec_id") % 5 === 0),
      work.toString, expr("(vec_id div 5) % 4"), 4)
    val probesDir = s"$work/probes"
    val q = S.ivecs(s, dir)
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      .localCheckpoint()
    // frozen-quantizer frames hoisted out of the per-batch loop
    // (immutable artifacts; per-batch re-resolution is driver-side
    // listing/footer work — lazy plans, nothing caches data)
    val coarse = s.read.parquet(s"$work/coarse")
    val codebook = s.read.parquet(s"$work/codebook")
    val stream = s.readStream
      .schema(s.read.parquet(incoming).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val query = stream.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ss = batch.sparkSession
        if (bid > graft.operators.TieredIndex.lastBatch(codesDir)) {
          val enc = S.ivfadcEncode(S.toIv(batch), coarse, codebook)
          // pack at the index's own depth — the same dispatch the
          // artifact writer used for the day-0 base segment
          val packed = if (k <= 16) S.packCodes(enc) else S.packCodesHex(enc)
          graft.operators.TieredIndex.append(ss, codesDir, packed, batchId = bid)
          graft.operators.TieredIndex
            .maintain(ss, codesDir, Seq(col("ccid"), col("vec_id")), policy): Unit
        }
        // probe the LIVE index this batch just committed into —
        // batch bid's arrivals must already be hits here (via the
        // one artifact-serving path: pushed-literal list pruning).
        // q241 skips the mid-stream probes: its observables are the
        // post-hoc time-travel probes of the same lifecycle.
        if (midProbes)
          S.ivfadcProbeIndex(ss, work.toString, q, k = k)
            .select(lit(bid).as("batch_id"), col("qid"), col("rn"), col("vec_id"), col("ad"))
            .write.mode("overwrite").parquet(s"$probesDir/b$bid")
      }
      .start()
    query.awaitTermination()
    if (midProbes)
      s.read.option("recursiveFileLookup", "true").parquet(probesDir)
        .orderBy(col("batch_id"), col("qid"), col("rn"))
    else s.emptyDataFrame
  }

  val entries: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q90
    QueryDef(
      "q90_stream_hourly",
      (s, dir) => {
        val stream = EventStreaming.eventsStream(s, dir)
        EventStreaming
          .runToMemory(s, EventStreaming.hourlyCounts(stream), sinkName("q90"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
             FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")
    ),
    // ---------------------------------------------------------------- q91
    QueryDef(
      "q91_stream_user_totals",
      (s, dir) => {
        val stream = EventStreaming.eventsStream(s, dir)
        EventStreaming
          .runToMemory(s, EventStreaming.userTotals(s, stream).toDF(), sinkName("q91"),
            OutputMode.Update())
          .select(col("user_id"), col("n_events"), round(col("total_value"), 2).as("total_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
             FROM events GROUP BY user_id ORDER BY user_id""")
    ),
    // ---------------------------------------------------------------- q92
    // Streaming dedup: dropDuplicatesWithinWatermark keys the state on
    // event_id AND lets the watermark evict entries older than the delay,
    // so state is bounded on an unbounded stream (plain
    // dropDuplicates("event_id") would grow state forever). Duplicates
    // arriving within the 2-hour delay of each other dedup exactly.
    QueryDef(
      "q92_stream_dedup",
      (s, dir) => {
        // events.parquet has no duplicate event_ids, which would make
        // the dedup vacuous — self-union the stream so every event
        // arrives twice and the operator must actually drop rows for the
        // distinct-count oracle to match
        val ev = EventStreaming.eventsStream(s, dir)
        val stream = ev
          .union(EventStreaming.eventsStream(s, dir))
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_unique"))
        EventStreaming
          .runToMemory(s, stream, sinkName("q92"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS n_unique
             FROM events GROUP BY event_type ORDER BY event_type""")
    ),
    // ---------------------------------------------------------------- q93
    // Streaming session windows: gap-based sessions as a streaming
    // groupBy key with a watermark — sessions merge as events arrive and
    // emit once the watermark passes their close. Same session semantics
    // as batch q37; the oracle derives sessions via the lag/island trick.
    QueryDef(
      "q93_stream_sessions",
      (s, dir) => {
        val stream = EventStreaming
          .eventsStream(s, dir)
          .withWatermark("ts", "2 hours")
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
          .select(
            col("user_id"),
            col("w.start").as("session_start"),
            col("w.end").as("session_end"),
            col("n"),
            col("sum_value")
          )
        EventStreaming
          .runToMemory(s, stream, sinkName("q93"))
          .orderBy(col("user_id"), col("session_start"))
      },
      Some("""WITH e AS (
               SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
               FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             ), se AS (
               SELECT user_id, ts, value,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM e)
             SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
               CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
               count(*) AS n, round(sum(value), 2) AS sum_value
             FROM se GROUP BY user_id, sid ORDER BY user_id, session_start""")
    ),
    // ---------------------------------------------------------------- q94
    // Stream-static join: the event stream enriched against the static
    // customer dimension (re-read per micro-batch, broadcast by Catalyst
    // since it is small), then aggregated by segment. The canonical
    // "enrich a stream with a dimension table" shape.
    QueryDef(
      "q94_stream_static_join",
      (s, dir) => {
        val dim = graft.Engine
          .table(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val stream = EventStreaming
          .eventsStream(s, dir)
          .join(dim, col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        EventStreaming
          .runToMemory(s, stream, sinkName("q94"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS sum_value
             FROM events JOIN customer ON user_id = c_custkey
             GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    ),
    // ---------------------------------------------------------------- q95
    // Stream-stream interval join: purchases attributed to clicks by the
    // same user within the preceding hour. Both sides carry watermarks so
    // the join state is evicted once an event can no longer match
    // (p_ts/c_ts more than watermark+interval old); an INNER join emits
    // matches immediately, so the finite replay equals the batch join.
    QueryDef(
      "q95_stream_stream_join",
      (s, dir) => {
        val ev = EventStreaming.eventsStream(s, dir)
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
          .withWatermark("c_ts", "2 hours")
        val joined = purchases
          .join(
            clicks,
            col("user_id") === col("c_user") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("c_ts") <= col("p_ts")
          )
          .select(col("p_id"), col("c_id"), col("user_id"))
        EventStreaming
          .runToMemory(s, joined, sinkName("q95"), OutputMode.Append())
          .orderBy(col("p_id"), col("c_id"))
      },
      Some("""SELECT a.event_id AS p_id, b.event_id AS c_id, a.user_id
             FROM events a JOIN events b
               ON a.user_id = b.user_id AND a.event_type = 'purchase'
               AND b.event_type = 'click'
               AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
             ORDER BY p_id, c_id""")
    ),
    // ---------------------------------------------------------------- q96
    // transformWithState — Spark 4's arbitrary-state API (typed
    // ValueState, TTL, timers; successor of mapGroupsWithState), backed
    // by the RocksDB state store. Running per-user count + max; update
    // mode means the memory sink's last row per user is the final total,
    // which is what the batch oracle expresses.
    QueryDef(
      "q96_stream_transform_with_state",
      (s, dir) => {
        val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
        s.conf.set(
          "spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val stream = EventStreaming.eventsStream(s, dir)
          val name = sinkName("q96")
          EventStreaming
            .runToMemory(s, EventStreaming.userStatsTws(s, stream).toDF(), name,
              OutputMode.Update())
            .groupBy(col("user_id"))
            .agg(max(col("n_events")).as("n_events"), round(max(col("max_value")), 2).as("max_value"))
            .orderBy(col("user_id"))
        } finally {
          prevProvider match {
            case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
            case None    => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
          }
        }
      },
      Some("""SELECT user_id, count(*) AS n_events, round(max(value), 2) AS max_value
             FROM events GROUP BY user_id ORDER BY user_id""")
    ),
    // --------------------------------------------------------------- q105
    // Stream-stream LEFT OUTER interval join: purchases with their
    // attributing click if one exists, else a -1 marker. Outer (null)
    // results emit only once the watermark proves no match can arrive —
    // purchases newer than (max ts - watermark - interval) are still held
    // in state when the replay ends, so the query (and the oracle,
    // identically) bounds itself to purchases old enough that their
    // outer result is guaranteed emitted: p_ts < max(ts) - 190 min
    // (2 h watermark + 1 h interval + slack off the eviction boundary).
    QueryDef(
      "q105_stream_left_outer",
      (s, dir) => {
        // the replay's end-of-stream watermark: the query-global
        // watermark is the MIN across both watermarked inputs, i.e.
        // min(max click ts, max purchase ts) - 2h. Kept LAZY as a
        // one-row aggregate broadcast-joined onto the sink result —
        // no extra driver job at plan-build time (the stream replay
        // itself is the only action here, inherent to the harness).
        val bound = graft.Engine
          .table(s, dir, "events")
          .agg(
            least(
              max(when(col("event_type") === "click", col("ts"))),
              max(when(col("event_type") === "purchase", col("ts")))
            ).as("mx")
          )
        val ev = EventStreaming.eventsStream(s, dir)
        val purchases = ev
          .filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours")
        val clicks = ev
          .filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
          .withWatermark("c_ts", "2 hours")
        val joined = purchases
          .join(
            clicks,
            col("user_id") === col("c_user") &&
              col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("c_ts") <= col("p_ts"),
            "left_outer"
          )
          .select(col("p_id"), coalesce(col("c_id"), lit(-1L)).as("c_id"), col("user_id"), col("p_ts"))
        EventStreaming
          .runToMemory(s, joined, sinkName("q105"), OutputMode.Append())
          .crossJoin(broadcast(bound))
          .filter(col("p_ts") < col("mx") - expr("INTERVAL 190 MINUTES"))
          .select(col("p_id"), col("c_id"), col("user_id"))
          .orderBy(col("p_id"), col("c_id"))
      },
      Some("""WITH m AS (SELECT least(
               max(ts) FILTER (event_type = 'click'),
               max(ts) FILTER (event_type = 'purchase')) AS mx FROM events)
             SELECT a.event_id AS p_id, coalesce(b.event_id, -1) AS c_id, a.user_id
             FROM events a LEFT JOIN events b
               ON a.user_id = b.user_id AND b.event_type = 'click'
               AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
             WHERE a.event_type = 'purchase'
               AND a.ts < (SELECT mx FROM m) - INTERVAL 190 MINUTE
             ORDER BY p_id, c_id""")
    ),
    // --------------------------------------------------------------- q106
    // Chained stateful operators in one streaming query (Spark 4 lifts
    // the old one-stateful-op-per-query limit): watermarked exact dedup
    // on event_id feeding a tumbling-window count — the "dedup then
    // aggregate" shape every ingestion pipeline wants, previously forced
    // into two queries with an intermediate sink. Both operators share
    // the 2-hour watermark; dedup state and window state evict on it
    // independently.
    QueryDef(
      "q106_stream_dedup_windowed",
      (s, dir) => {
        // self-union as in q92: duplicates must exist for the chained
        // dedup stage to be load-bearing rather than structural
        val stream = EventStreaming
          .eventsStream(s, dir)
          .union(EventStreaming.eventsStream(s, dir))
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_unique"))
          .select(col("w.start").as("hour"), col("event_type"), col("n_unique"))
        // Complete mode: window state is retained so every window emits
        // (append mode would withhold windows newer than the final
        // watermark); the upstream dedup state still evicts on it
        EventStreaming
          .runToMemory(s, stream, sinkName("q106"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
               count(DISTINCT event_id) AS n_unique
             FROM events GROUP BY 1, 2 ORDER BY hour, event_type""")
    ),
    // --------------------------------------------------------------- q135
    // Closed-session emission via flatMapGroupsWithState — the 0..N
    // outputs-per-group API the mapGroupsWithState family lacks: a
    // session is EMITTED the moment a later event proves it closed
    // (gap > 30 min); the open session stays in state and never emits,
    // so each user's final session is deliberately absent. The oracle
    // sessionizes in SQL and drops each user's last session — pinning
    // both the session arithmetic AND the emission semantics.
    QueryDef(
      "q135_stream_closed_sessions",
      (s, dir) => {
        val sessions =
          EventStreaming.closedSessions(s, EventStreaming.eventsStream(s, dir)).toDF()
        EventStreaming
          .runToMemory(s, sessions, sinkName("q135"), OutputMode.Append())
          .orderBy(col("user_id"), col("start_us"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
             o AS (SELECT user_id, us,
               CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                      OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
                    THEN 1 ELSE 0 END AS brk
               FROM e),
             s AS (SELECT user_id, us,
               sum(brk) OVER (PARTITION BY user_id ORDER BY us
                 ROWS UNBOUNDED PRECEDING) AS sid
               FROM o),
             g AS (SELECT user_id, sid, min(us) AS start_us, count(*) AS n_events
               FROM s GROUP BY user_id, sid)
             SELECT user_id, start_us, CAST(n_events AS BIGINT) AS n_events FROM g
             QUALIFY sid < max(sid) OVER (PARTITION BY user_id)
             ORDER BY user_id, start_us""")
    ),
    // --------------------------------------------------------------- q142
    // Chained TIME-WINDOW aggregations in one streaming query — the
    // other multi-stateful-operator shape Spark 4 allows (q106 chains
    // dedup->window; this chains window->window): hourly counts re-
    // aggregated into daily rollups by windowing OVER the hourly window
    // column. The daily stage sees one row per (hour, type) instead of
    // raw events — exactly how a 100 TB metrics pipeline keeps its
    // second-stage state tiny. Append mode is required for chained
    // stateful aggs, so a day emits only once the watermark passes its
    // close; the replay's final watermark is max(ts) - 2h, and both the
    // engine and the oracle bound themselves to days provably emitted
    // (day end <= max ts - 130 min: 2 h watermark + slack off the
    // eviction boundary). Counts and max are exact across the two
    // stages (sum-of-sums / max-of-maxes); no float re-association.
    QueryDef(
      "q142_stream_daily_rollup",
      (s, dir) => {
        val bound = graft.Engine
          .table(s, dir, "events")
          .agg(max(col("ts")).as("mx"))
        val hourly = EventStreaming
          .eventsStream(s, dir)
          .withWatermark("ts", "2 hours")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), max(col("value")).as("mx_v"))
        val daily = hourly
          .groupBy(window(col("w"), "1 day").as("d"), col("event_type"))
          .agg(
            sum(col("n")).as("n_events"),
            count(lit(1)).as("n_hours"),
            max(col("n")).as("peak_hour_n"),
            round(max(col("mx_v")), 2).as("max_value")
          )
          .select(
            col("d.start").as("day"), col("d.end").as("day_end"), col("event_type"),
            col("n_events"), col("n_hours"), col("peak_hour_n"), col("max_value")
          )
        EventStreaming
          .runToMemory(s, daily, sinkName("q142"), OutputMode.Append())
          .crossJoin(broadcast(bound))
          .filter(col("day_end") <= col("mx") - expr("INTERVAL 130 MINUTES"))
          .select(
            col("day"), col("event_type"), col("n_events"),
            col("n_hours"), col("peak_hour_n"), col("max_value")
          )
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH m AS (SELECT max(ts) AS mx FROM events),
             h AS (
               SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_type,
                 count(*) AS n, max(value) AS mx_v
               FROM events GROUP BY 1, 2)
             SELECT CAST(date_trunc('day', hr) AS TIMESTAMP) AS day, event_type,
               CAST(sum(n) AS BIGINT) AS n_events,
               count(*) AS n_hours,
               CAST(max(n) AS BIGINT) AS peak_hour_n,
               round(max(mx_v), 2) AS max_value
             FROM h
             WHERE date_trunc('day', hr) + INTERVAL 1 DAY
               <= (SELECT mx FROM m) - INTERVAL 130 MINUTE
             GROUP BY 1, 2 ORDER BY day, event_type""")
    ),
    // --------------------------------------------------------------- q149
    // Stream-static BAND join: the event stream enriched against a
    // static value-tier table on a pure range condition (no equality
    // key) — the non-equi cousin of q94's dimension join. Also pins the
    // IntervalStabJoin guard from the streaming side: the injected
    // strategy must stand down on streaming inputs (its executeCollect
    // of the build side has no streaming semantics), leaving Spark's
    // stock stream-static BroadcastNestedLoopJoin — asserted in
    // PlanShapeSpec. Per micro-batch the static side re-broadcasts; at
    // scale the tier table is tiny so the non-equi scan is 3 predicate
    // evaluations per event.
    QueryDef(
      "q149_stream_band_join",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val tiers = Seq(
          ("small", -1e9, 10.0),
          ("mid", 10.0, 60.0),
          ("large", 60.0, 1e9)
        ).toDF("tier", "lo", "hi")
        val stream = EventStreaming
          .eventsStream(s, dir)
          .join(tiers, col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("tier"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        EventStreaming
          .runToMemory(s, stream, sinkName("q149"))
          .orderBy(col("tier"), col("event_type"))
      },
      Some("""SELECT tier, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
             FROM events
             JOIN (VALUES ('small', -1e9, 10.0), ('mid', 10.0, 60.0),
                          ('large', 60.0, 1e9)) AS t(tier, lo, hi)
               ON value >= lo AND value < hi
             GROUP BY tier, event_type ORDER BY tier, event_type""")
    ),
    // --------------------------------------------------------------- q170
    // Streaming curation: q169's quality scorer applied UNCHANGED to a
    // documents file-stream — the "ingest-time curation" shape where
    // each arriving crawl shard is scored as it lands instead of in a
    // nightly batch. The scorer is stateless narrow ops only, so the
    // streaming query needs NO state store, no watermark, and Append
    // mode: per-micro-batch cost is exactly the batch per-row cost,
    // state is zero regardless of stream length — the strongest
    // possible unbounded-stream guarantee. Gate: the materialized
    // stream output must hash-equal q169's batch oracle (the shared
    // qualityScoreOracle — same SQL string object, zero drift).
    QueryDef(
      "q170_stream_quality",
      (s, dir) => {
        val batchSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val docsStream = s.readStream
          .schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        EventStreaming
          .runToMemory(
            s,
            graft.queries.TextOps.qualityScore(docsStream),
            sinkName("q170"),
            OutputMode.Append()
          )
          .orderBy(col("doc_id"))
      },
      Some(graft.queries.TextOps.qualityScoreOracle)
    ),
    // --------------------------------------------------------------- q174
    // STREAMING incremental dedup — the ingest-time shape q126/q136 run
    // nightly, moved to the moment of arrival: today's crawl slice
    // (doc_id % 5 = 0) arrives as a file stream, one file per
    // micro-batch (maxFilesPerTrigger=1), and each micro-batch is
    // foreachBatch-anti-joined against the PERSISTED hash index that
    // q136's day-0 builder wrote, then appends its own new hashes — so
    // micro-batch k+1 dedups against everything up to and including
    // micro-batch k. The index is the only state: no state store, no
    // watermark, and the index grows by exactly the survivors' hashes
    // (the cumulative property StreamIncrementalSpec pins). At 100 TB
    // this is the sustainable shape: per-arrival cost is
    // O(batch + matching index partitions), never a corpus re-hash.
    //
    // Determinism: the incoming slice is staged as range-partitioned
    // files (file k = k-th doc_id range) with strictly increasing
    // mtimes, so the file source replays them oldest-first in doc_id
    // order and a cross-batch duplicate's FIRST arrival is its lowest
    // doc_id — making "first arrival wins" coincide with the batch
    // oracle's min(doc_id) rule. Gate: the SAME oracle SQL string as
    // q126/q136 (DedupOps.incrementalOracleSql) — three execution
    // shapes, one contract.
    QueryDef(
      "q174_stream_incremental_dedup",
      (s, dir) => {
        val work = graft.Engine.scratchDir("q174", dir)
        graft.Engine.deleteRecursively(work) // idempotent: survivors/checkpoint/index from a prior run
        // day-0: the standing corpus's hash index as a TIERED index
        // (base generation range-clustered on h; q136's flat builder
        // reads the same historyHashes frame — one history definition)
        val indexDir = s"$work/hash_index"
        graft.operators.TieredIndex.create(
          s, indexDir, graft.queries.DedupOps.historyHashes(s, dir), 4, Seq(col("h")))
        val incoming = stageIncoming(s, dir, work.toString)
        val survDir = s"$work/survivors"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            // REPLAY GUARD — foreachBatch is at-least-once: if a batch
            // crashed AFTER its index append committed (watermark
            // advanced) but BEFORE the streaming checkpoint commit, the
            // replay's anti-join would see the batch's OWN hashes, surv
            // would recompute empty, and the overwrite below would
            // clobber the batch's previously-written correct survivors.
            // The survivor write commits before the index append, so a
            // committed watermark implies the survivors are already
            // durable — skip the whole body.
            if (bid > graft.operators.TieredIndex.lastBatch(indexDir)) {
            val ss = batch.sparkSession
            // hash the arrivals ONCE (first-of-hash agg + survivors
            // join both consume this — q136's checkpoint rationale)
            val keyed = batch
              .select(col("doc_id"), col("lang"), col("source"), md5(col("text")).as("h"))
              .localCheckpoint(eager = false)
            val first = keyed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
            val surv = keyed
              .join(first.select(col("doc_id")), Seq("doc_id"), "left_semi")
              .join(graft.operators.TieredIndex.read(ss, indexDir), Seq("h"), "left_anti")
              // materialize BEFORE the index append: appending first
              // would make the lazy anti-join see this batch's own
              // hashes and drop everything
              .localCheckpoint()
            // exactly-once under foreachBatch retries, like the index
            // append below: each batch owns a deterministic subdir and
            // OVERWRITES it, so a replayed batch replaces its own
            // output instead of appending duplicate survivor rows
            surv
              .select(col("doc_id"), col("lang"), col("source"))
              .write.mode("overwrite").parquet(s"$survDir/b$bid")
            graft.operators.TieredIndex.append(ss, indexDir, surv.select(col("h")).distinct(), batchId = bid)
            // per-batch index MAINTENANCE: size/tier-aware — a no-op
            // manifest read until a threshold trips, then a MINOR
            // compaction of the accumulated deltas only (O(batch), not
            // O(index)); the base is rewritten only when the small
            // generations reach a fraction of its size. Content-neutral:
            // gate + cumulative-index spec see identical results.
            graft.operators.TieredIndex.maintain(ss, indexDir, Seq(col("h"))): Unit
            }
          }
          .start()
        query.awaitTermination()
        // end-of-window maintenance: force pending deltas into a tier so
        // the index sits at its bounded steady-state file count for the
        // next ingest window — StreamIncrementalSpec pins it
        graft.operators.TieredIndex.maintain(s, indexDir, Seq(col("h")), force = true): Unit
        s.read.option("recursiveFileLookup", "true").parquet(survDir).orderBy(col("doc_id"))
      },
      Some(graft.queries.DedupOps.incrementalOracleSql)
    ),
    // --------------------------------------------------------------- q176
    // Streaming incremental FUZZY dedup — q174's exact-hash shape with
    // the near-dup contract: the persisted index holds MinHash BAND
    // BUCKETS (q52/q167's banding: 8-sig over distinct 3-gram
    // shingles, 4 bands x 2 rows), and an arriving doc is dropped when
    // any of its buckets was seen before — in the day-0 history OR in
    // any earlier arrival. Each micro-batch appends ALL its buckets
    // (dropped docs' too), which is what makes the semantics
    // SQL-expressible: "shares a bucket with any earlier doc" (history,
    // or lower doc_id — arrival order IS id order, see stageIncoming)
    // rather than the non-monotone "earlier surviving doc". Docs too
    // short to shingle (< 3 tokens) have no buckets and pass through,
    // identically in the oracle. At 100 TB: per-arrival cost is
    // O(batch buckets + matching index partitions) — the banded
    // candidate-generation economics of q52, made cumulative; no
    // pair enumeration anywhere, no state store, the bucket index is
    // the only state and grows by the batch's distinct buckets.
    QueryDef(
      "q176_stream_fuzzy_dedup",
      (s, dir) => {
        val work = graft.Engine.scratchDir("q176", dir)
        graft.Engine.deleteRecursively(work)
        val bandsExpr = graft.functions.TextHashOps.bandBuckets(col("sig"), 4, 2)
        def buckets(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
          docs
            .select(col("doc_id"), graft.queries.Tokenize.toksExpr.as("toks"))
            .filter(size(col("toks")) >= 3)
            .select(
              col("doc_id"),
              graft.functions.TextHashOps
                .minhashSig(
                  array_distinct(graft.functions.TextHashOps.gramsText(col("toks"), 3)), 8)
                .as("sig"))
            .select(col("doc_id"), explode(bandsExpr).as("bucket"))
        // day-0: the standing corpus's band buckets as a TIERED index
        // (base generation range-clustered so the per-batch semi-join
        // reads sorted stats-pruned files)
        val indexDir = s"$work/bucket_index"
        graft.operators.TieredIndex.create(
          s,
          indexDir,
          buckets(graft.Engine.table(s, dir, "documents").filter(col("doc_id") % 5 =!= 0))
            .select(col("bucket"))
            .distinct(),
          4,
          Seq(col("bucket")))
        val incoming = stageIncoming(s, dir, work.toString)
        val survDir = s"$work/survivors"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            // replay guard — a committed watermark implies this batch's
            // survivors are already durable (q174's rationale): without
            // it, a replay lands in the window where the bucket index
            // already holds this batch's buckets, dropExt matches
            // everything, and the overwrite clobbers correct survivors
            if (bid > graft.operators.TieredIndex.lastBatch(indexDir)) {
            val ss = batch.sparkSession
            val rows = batch
              .select(col("doc_id"), col("lang"), col("source"), col("text"))
              .localCheckpoint(eager = false)
            // shingle+sign the arrivals ONCE: three consumers (external
            // drop, within-batch min, index append)
            val bk = buckets(rows).localCheckpoint(eager = false)
            val dropExt = bk
              .join(graft.operators.TieredIndex.read(ss, indexDir), Seq("bucket"), "left_semi")
              .select(col("doc_id"))
            val bmin = bk.groupBy(col("bucket")).agg(min(col("doc_id")).as("m"))
            val dropIn = bk
              .join(bmin, "bucket")
              .filter(col("m") < col("doc_id"))
              .select(col("doc_id"))
            val dropped = dropExt.union(dropIn).distinct()
            val surv = rows
              .join(dropped, Seq("doc_id"), "left_anti")
              // materialize BEFORE the index append (q174's rationale)
              .localCheckpoint()
            // per-batch overwrite dir = exactly-once on retry (q174's rationale)
            surv.select(col("doc_id"), col("lang"), col("source")).write.mode("overwrite").parquet(s"$survDir/b$bid")
            graft.operators.TieredIndex.append(ss, indexDir, bk.select(col("bucket")).distinct(), batchId = bid)
            // per-batch size/tier-aware maintenance (q174's cycle):
            // deltas-only minors, size-triggered majors; content-neutral
            graft.operators.TieredIndex.maintain(ss, indexDir, Seq(col("bucket"))): Unit
            }
          }
          .start()
        query.awaitTermination()
        // end-of-window maintenance — StreamIncrementalSpec pins the
        // bounded steady-state file count + per-segment clustering
        graft.operators.TieredIndex.maintain(s, indexDir, Seq(col("bucket")), force = true): Unit
        s.read.option("recursiveFileLookup", "true").parquet(survDir).orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, source, ${graft.queries.Tokenize.toksSql} AS toks
               FROM documents),
             shq AS (SELECT doc_id, list_distinct(list_transform(
                 generate_series(1, len(toks) - 2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sg
               FROM t WHERE len(toks) >= 3),
             mq AS (SELECT doc_id,
                 ${graft.functions.TextHashOps.sigSql()} AS sig
               FROM shq),
             bq AS (SELECT doc_id, ${graft.functions.TextHashOps.bandBucketsSql("sig", 4, 2)} AS bucket FROM mq),
             dropd AS (SELECT DISTINCT m.doc_id FROM bq m JOIN bq e
                 ON m.bucket = e.bucket
                 AND (e.doc_id % 5 <> 0 OR e.doc_id < m.doc_id)
               WHERE m.doc_id % 5 = 0)
             SELECT doc_id, lang, source FROM t
             WHERE doc_id % 5 = 0
               AND doc_id NOT IN (SELECT doc_id FROM dropd)
             ORDER BY doc_id""")
    ),
    // --------------------------------------------------------------- q181
    // The INGEST-TIME recipe — q173's document-local stages (PII scrub
    // + density drop -> C4 blocklist -> rule + classifier quality gate
    // -> exact dedup on the clean-token hash) running per micro-batch
    // at the moment of arrival, via the ONE shared stage function
    // (CurationOps.ingestGate: batch recipe and stream run the same
    // code object, so the two paths cannot drift). Day-0 processes the
    // standing corpus through the same gate and persists its
    // survivors' clean-token hashes range-clustered; each arriving
    // micro-batch gates its docs, keeps first-of-hash within the
    // batch, anti-joins the index, appends its survivors — q174's
    // cumulative-index contract, now carrying the FULL curation
    // pipeline rather than raw-text hashes. The corpus-GLOBAL stages
    // (domain caps, fuzzy banding, split/shard) stay in nightly
    // compaction by design: they need global counts a micro-batch
    // cannot know (the ingestGate scaladoc states the split). At
    // 100 TB: per-arrival cost is O(batch + matching index
    // partitions); no state store; the hash index is the only state.
    QueryDef(
      "q181_stream_ingest_recipe",
      (s, dir) => {
        val work = graft.Engine.scratchDir("q181", dir)
        graft.Engine.deleteRecursively(work)
        // day-0: the standing corpus through the SAME gate; index = its
        // survivors' distinct clean-token hashes as a TIERED index
        val indexDir = s"$work/clean_hash_index"
        graft.operators.TieredIndex.create(
          s,
          indexDir,
          graft.queries.CurationOps
            .ingestGate(graft.Engine.table(s, dir, "documents").filter(col("doc_id") % 5 =!= 0))
            .select(col("cm"))
            .distinct(),
          4,
          Seq(col("cm")))
        val incoming = stageIncoming(s, dir, work.toString)
        val survDir = s"$work/survivors"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            // replay guard — a committed watermark implies this batch's
            // survivors are already durable (q174's rationale): without
            // it, a replay anti-joins against an index that already
            // holds this batch's hashes and clobbers correct survivors
            if (bid > graft.operators.TieredIndex.lastBatch(indexDir)) {
            val ss = batch.sparkSession
            // gate the arrivals ONCE (within-batch first-of-hash and
            // the survivors join both consume this)
            val gated = graft.queries.CurationOps
              .ingestGate(batch)
              .localCheckpoint(eager = false)
            val first = gated.groupBy(col("cm")).agg(min(col("doc_id")).as("doc_id"))
            val surv = gated
              .join(first.select(col("doc_id")), Seq("doc_id"), "left_semi")
              .join(graft.operators.TieredIndex.read(ss, indexDir), Seq("cm"), "left_anti")
              // materialize BEFORE the index append (q174's rationale)
              .localCheckpoint()
            surv
              .select(
                col("doc_id"), col("lang"), col("source"), col("pii_ppm"),
                col("n_words"), col("logit_micro"))
              // per-batch overwrite dir = exactly-once on retry (q174's rationale)
              .write.mode("overwrite").parquet(s"$survDir/b$bid")
            graft.operators.TieredIndex.append(ss, indexDir, surv.select(col("cm")).distinct(), batchId = bid)
            // per-batch size/tier-aware maintenance (q174's cycle):
            // deltas-only minors, size-triggered majors; content-neutral
            graft.operators.TieredIndex.maintain(ss, indexDir, Seq(col("cm"))): Unit
            }
          }
          .start()
        query.awaitTermination()
        // end-of-window maintenance — StreamIncrementalSpec pins the
        // bounded steady-state file count + per-segment clustering
        graft.operators.TieredIndex.maintain(s, indexDir, Seq(col("cm")), force = true): Unit
        s.read.option("recursiveFileLookup", "true").parquet(survDir).orderBy(col("doc_id"))
      },
      Some(graft.queries.CurationOps.ingestRecipeOracleSql)
    ),
    // --------------------------------------------------------------- q177
    // Streaming PII scrub — q172's redaction transform applied
    // UNCHANGED to a documents file-stream (the q170 pattern, now for
    // the scrub stage): real pipelines mask PII at ingest so raw
    // contact data never lands in the lake. The transform is stateless
    // narrow ops only (regex scan/replace + arithmetic riding the
    // read), so the streaming query needs NO state store, no
    // watermark, Append mode — zero state regardless of stream length,
    // and per-micro-batch cost is exactly the batch per-row cost.
    // Gate: the materialized stream output hash-equals q172's batch
    // oracle (the shared redactOracleSql — same SQL string object,
    // zero drift).
    QueryDef(
      "q177_stream_pii_redact",
      (s, dir) => {
        val batchSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val docsStream = s.readStream
          .schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        EventStreaming
          .runToMemory(
            s,
            graft.queries.PiiOps.redact(docsStream),
            sinkName("q177"),
            OutputMode.Append()
          )
          .orderBy(col("doc_id"))
      },
      Some(graft.queries.PiiOps.redactOracleSql)
    ),
    // --------------------------------------------------------------- q192
    // Streaming BPE token accounting — q188's per-doc tokenizer-true
    // counts applied UNCHANGED to a documents file-stream (the
    // q170/q177 pattern, now for the tokenize stage): real pipelines
    // meter arriving crawl shards in TOKENIZER tokens at ingest so
    // shard sizing and budget dashboards never run on whitespace
    // counts. Stateless narrow string work only (the wrapped
    // replace-chain rides the read), so NO state store, no watermark,
    // Append mode — zero state at any stream length, per-batch cost =
    // the batch per-row cost. Gate: the SAME oracle string object as
    // q188 (BpeOps.tokenCountsOracleSql — one transform, two execution
    // shapes, structural no-drift).
    QueryDef(
      "q192_stream_bpe",
      (s, dir) => {
        val batchSchema = s.read.parquet(s"$dir/documents.parquet").schema
        val docsStream = s.readStream
          .schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet")
          .parquet(dir)
        EventStreaming
          .runToMemory(
            s,
            graft.queries.BpeOps.tokenCounts(docsStream),
            sinkName("q192"),
            OutputMode.Append()
          )
          .orderBy(col("doc_id"))
      },
      Some(graft.queries.BpeOps.tokenCountsOracleSql)
    ),
    // --------------------------------------------------------------- q210
    // STREAMING appends to the persisted ANN index — q206's build-once
    // IVFADC artifact made LIVE (FAISS's add() contract on Spark): the
    // day-0 index trains on the standing population ONLY (vec_id % 5
    // <> 0) and its quantizers FREEZE as artifacts; today's vectors
    // (vec_id % 5 = 0) arrive as a file stream, and each micro-batch
    // encodes its arrivals against the frozen coarse cells + residual
    // codebook read back from disk — coarse argmin, residual, 8
    // subspace argmins, 4-bit pack — and appends the 4-byte codes to
    // the TIERED codes index exactly-once (batchId watermark: a
    // replayed batch no-ops), with per-batch size-aware maintenance.
    // The probe then answers the fixed query batch from the UNION
    // index: base + every arrival, searchable the moment its batch
    // commits. Freezing the quantizers is what makes ingest O(batch):
    // arrivals never retrain or touch existing codes (codebook drift
    // is a REBUILD decision, not an ingest one — the production
    // split). Gate: the oracle replays the same lifecycle in one plan
    // (train on the day-0 population, frozen-encode EVERYONE, probe),
    // so stream-of-appends must lose nothing vs a batch encode, and
    // the (qid, rn, vec_id, ad) output keeps q206's positioned-
    // neighbor + exact-integer-distance pin. At 100 TB: per-arrival
    // cost is O(batch x broadcast codebooks); the probe reads ~2/16
    // of the clustered codes index; no state store — the index is the
    // only state.
    QueryDef(
      "q210_ivfadc_stream_append",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val work = graft.Engine.scratchDir("q210", dir)
        graft.Engine.deleteRecursively(work)
        // day-0: train on the standing population only; freeze the
        // quantizers + seed the codes index through the ONE artifact
        // writer (q206/q213's layout — coarse/codebook parquet, codes
        // as a base-only TieredIndex), so the streamed appends below
        // land on exactly the index a batch build produces: one
        // storage engine, both lifecycles
        S.writeIvfAdcArtifacts(
          s, work.toString,
          S.ivecs(s, dir).filter(col("vec_id") % 5 =!= 0), k = 16, rounds = 1)
        val codesDir = s"$work/codes"
        val incoming = stageIncoming(s, dir, work.toString, table = "embeddings", idCol = "vec_id")
        // frozen-quantizer frames hoisted out of the per-batch loop
        val coarse = s.read.parquet(s"$work/coarse")
        val codebook = s.read.parquet(s"$work/codebook")
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            // replay guard (q174's rationale) — the append itself
            // already no-ops on a replayed id; skipping the body spares
            // the replay the whole frozen-encode recompute as well
            if (bid > graft.operators.TieredIndex.lastBatch(codesDir)) {
            val ss = batch.sparkSession
            // frozen-codebook encode of the arrivals: the quantizers
            // come from the artifacts, never from this batch
            val enc = S.ivfadcEncode(S.toIv(batch), coarse, codebook)
            graft.operators.TieredIndex.append(ss, codesDir, S.packCodes(enc), batchId = bid)
            // per-batch size/tier-aware maintenance (q174's cycle)
            graft.operators.TieredIndex.maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            }
          }
          .start()
        query.awaitTermination()
        // end-of-window maintenance: bounded steady-state file count
        graft.operators.TieredIndex.maintain(
          s, codesDir, Seq(col("ccid"), col("vec_id")), force = true): Unit
        val q = S.ivecs(s, dir)
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
        // probe through the ONE artifact-serving path: the probed-list
        // restriction reaches the codes scan as a pushed literal
        S.ivfadcProbeIndex(s, work.toString, q, k = 16)
          .orderBy(col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcIncrementalOracleSql)
    ),
    // --------------------------------------------------------------- q214
    // MID-STREAM SEARCHABILITY — the property q210 gates only at
    // end-of-stream, now gated between every micro-batch: the add()
    // contract's value is that batch k's vectors are SEARCHABLE at
    // batch k+1, so after each batch's exactly-once append + per-batch
    // maintenance, the SAME foreachBatch probes the live index and
    // persists the positioned top-3 under that batch id. Staging is
    // the deterministic mod split (arrival batch = (vec_id div 5) % 4)
    // rather than q174's sampled range split, so the oracle can replay
    // each PREFIX population exactly: ADC distances are population-
    // independent (frozen encode), so one oracle-side ADC table
    // filtered to each prefix reproduces all four probes — 4 gated
    // probes, 3 of them strictly mid-stream. Exactly-once shape: the
    // encode+append is watermark-guarded (a replayed batch skips it),
    // while the probe+write runs unconditionally — at replay time the
    // index already holds exactly batches <= k, so the overwrite
    // rewrites identical rows (the probe is deterministic in the
    // index state its batch committed).
    QueryDef(
      "q214_ivfadc_stream_search",
      (s, dir) => ivfadcStreamSearch(s, dir, tag = "q214", k = 16, rounds = 1),
      Some(graft.queries.SimilarityOps.ivfadcStreamSearchOracleSql())
    ),
    // --------------------------------------------------------------- q219
    // Mid-stream searchability at PRODUCTION DEPTH — q214's add()
    // lifecycle run on the (K=256, 2-round) hex-packed system a real
    // deployment serves (round-12 verdict #3: the unified-storage
    // claim was gated at shallow depth only — the deep index had the
    // build-once path (q213) but never the streaming add() path). The
    // ONE parameterized lifecycle ([[ivfadcStreamSearch]]) runs both:
    // day-0 trains deep on the standing population and freezes, each
    // micro-batch frozen-encodes its arrivals, packs the K=256-capable
    // HEX codes (the same writer dispatch as writeIvfAdcArtifacts —
    // 4-bit BIGINT would sign-trap at cid 255), appends exactly-once,
    // maintains, and probes the live index through the pruned
    // artifact-serving path. 4 gated probes, 3 strictly mid-stream;
    // the oracle is the q214 chain generalized to (256, 2) — the
    // SAME def, different depth arguments, so the two gates cannot
    // drift structurally. At 100 TB this is the system the claim is
    // about: 8-byte hex codes per vector, O(batch) ingest, probes
    // reading only the probed lists.
    QueryDef(
      "q219_ivfadc_deep_stream_search",
      (s, dir) => ivfadcStreamSearch(s, dir, tag = "q219", k = 256, rounds = 2),
      Some(graft.queries.SimilarityOps.ivfadcStreamSearchOracleSql(256, 2))
    ),
    // --------------------------------------------------------------- q218
    // TWO-STAGE SERVING on the query stream — the round-12 verdict's
    // composition gap: q215 served raw ADC order per micro-batch while
    // the +20-recall-point exact re-rank (q212/q216) existed only on
    // the batch path; a production query stream runs BOTH stages per
    // request. Each arriving query micro-batch now executes the
    // COMPLETE q216 request against the build-once deep artifact —
    // pruned-scan ADC probe -> top-16 candidates -> exact integer-L2
    // re-rank -> positioned top-3 WITH exact distances — through the
    // ONE serving definition site (SimilarityOps.ivfadcServe: the
    // batch and stream shapes are the same code object). The 4 staged
    // batches partition the fixed 20-query contract, so the union of
    // per-batch serves must equal q216's batch serve exactly — gated
    // by the SAME oracle string object (zero drift). Per-batch cost:
    // broadcast quantizers + the probed lists + 16 exact distances
    // per query; no state store, no index mutation; the per-batch
    // overwrite dir is exactly-once on replay by itself.
    QueryDef(
      "q218_ivfadc_stream_serve",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val work = graft.Engine.scratchDir("q218", dir)
        graft.Engine.deleteRecursively(work)
        val idx = S.buildIvfAdcIndex(s, dir, k = 256, rounds = 2)
        val incoming = stageBatches(
          graft.Engine.table(s, dir, "embeddings").filter(col("vec_id") < 20),
          work.toString, expr("vec_id div 5"), 4)
        // hoisted: the refine stage's corpus frame is one checkpointed
        // read shared by all 4 micro-batches — calling ivecs inside
        // foreachBatch would re-scan and re-pin the whole corpus per
        // batch (ivfadcStreamSearch hoists its reused frames the same way)
        val iv = S.ivecs(s, dir)
        val servesDir = s"$work/serves"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val qb = S.toIv(batch).select(col("vec_id").as("qid"), col("iv").as("qiv"))
            // the full two-stage request per micro-batch: probe the
            // artifact (pruned scan), re-rank the 16 candidates by
            // exact distance against the corpus vectors
            S.ivfadcServe(ss, idx, qb, iv, k = 256)
              .write.mode("overwrite").parquet(s"$servesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(servesDir)
          .orderBy(col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcServeOracleSql())
    ),
    // --------------------------------------------------------------- q223
    // STREAMING DELETES from the live ANN index — the retraction
    // complement of q214/q219's add() gate, and the streaming shape of
    // q222's batch delete: GDPR/takedown requests arrive as
    // micro-batches of vec_ids, each issues ONE exactly-once O(keys)
    // tombstone (TieredIndex.delete with the batchId watermark — a
    // replayed batch no-ops, same guard as append), per-batch
    // maintenance runs the delete-aware compaction cycle live (minors
    // fold with masks applied; a size-triggered major may retire
    // tombstones mid-stream — content-neutral either way), and the
    // SAME foreachBatch probes the shrinking index: batch b's
    // retracted vectors must already be GONE from probe b's top-3s.
    // The oracle is the mid-stream-searchability chain with the prefix
    // condition FLIPPED — q214 gates "arrivals <= b searchable", this
    // gates "deletions <= b unsearchable" (one comparison apart, both
    // riding the deterministic mod split) — and ADC distances are
    // population-independent (deletes never re-encode survivors), so
    // one oracle-side ADC table filtered to each shrinking population
    // replays all four probes exactly. At 100 TB: each retraction is
    // O(keys) at issue time, masks ride broadcast anti-joins on the
    // pruned probe scan, physical removal amortizes into maintenance.
    QueryDef(
      "q223_ivfadc_stream_delete",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val work = graft.Engine.scratchDir("q223", dir)
        graft.Engine.deleteRecursively(work)
        // snapshot the build-once deep artifact (q222's clone-then-
        // mutate shape: the process-wide cache stays read-only)
        graft.Engine.copyRecursively(
          new java.io.File(S.buildIvfAdcIndex(s, dir, k = 256, rounds = 2)), work)
        val codesDir = s"$work/codes"
        // the retraction request stream: 4 deterministic-mod batches
        // of vec_ids (batch k retracts slice (vec_id div 5) % 4 == k
        // of the vec_id % 5 == 0 population)
        val incoming = stageBatches(
          graft.Engine.table(s, dir, "embeddings")
            .filter(col("vec_id") % 5 === 0).select(col("vec_id")),
          work.toString, expr("(vec_id div 5) % 4"), 4)
        val probesDir = s"$work/probes"
        val q = S.ivecs(s, dir)
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            // exactly-once retraction: the tombstone append carries the
            // batch watermark, so a crashed-then-replayed batch no-ops
            graft.operators.TieredIndex.delete(
              ss, codesDir, batch.select(col("vec_id")), batchId = bid)
            // the delete-aware maintenance cycle, live per batch
            graft.operators.TieredIndex
              .maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            // probe the SHRUNK index this batch just committed —
            // batch bid's retractions must already be gone (idempotent
            // overwrite: the probe is deterministic in the committed
            // index state, q214's replay rationale)
            S.ivfadcProbeIndex(ss, work.toString, q, k = 256)
              .select(lit(bid).as("batch_id"), col("qid"), col("rn"), col("vec_id"), col("ad"))
              .write.mode("overwrite").parquet(s"$probesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(probesDir)
          .orderBy(col("batch_id"), col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcStreamDeleteOracleSql)
    ),
    // --------------------------------------------------------------- q215
    // STREAMING QUERIES over the static ANN artifact — q210/q214's
    // complement and the other half of production serving: there the
    // INDEX was live and the query batch fixed; here the index is the
    // frozen build-once artifact (q206's builder, shared process-wide
    // cache) and the QUERIES arrive as a stream, probed per
    // micro-batch (the q149/q192 stream-static pattern applied to
    // ivfadcProbe). Per-batch cost is O(batch x broadcast quantizers +
    // 2 probed lists per query); no state store, no index mutation —
    // the per-batch overwrite dir is exactly-once on replay by itself.
    // The 4 staged query batches partition the fixed 20-query
    // contract, so the union of per-batch results answers each query
    // identically to q206's batch probe — gated by the SAME oracle
    // string object (zero drift).
    QueryDef(
      "q215_ivfadc_stream_queries",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val work = graft.Engine.scratchDir("q215", dir)
        graft.Engine.deleteRecursively(work)
        val idx = S.buildIvfAdcIndex(s, dir)
        val incoming = stageBatches(
          graft.Engine.table(s, dir, "embeddings").filter(col("vec_id") < 20),
          work.toString, expr("vec_id div 5"), 4)
        val probesDir = s"$work/probes"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val qb = S.toIv(batch).select(col("vec_id").as("qid"), col("iv").as("qiv"))
            // per-batch probe through the one artifact-serving path —
            // here the pruning bites hardest: 5 queries probe <= 10 of
            // the 16 lists, and the pushed literal skips the rest
            S.ivfadcProbeIndex(ss, idx, qb, k = 16)
              .write.mode("overwrite").parquet(s"$probesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(probesDir)
          .orderBy(col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcProbeOracleSql)
    ),
    // --------------------------------------------------------------- q227
    // THE FULL PRODUCTION LOOP in one gate — round-13 verdict #3: the
    // mid-stream probes of q214/q219/q223 gate raw ADC order only,
    // and each gates ONE mutation kind; a production vector store
    // runs CDC micro-batches that APPEND and RETRACT in the same
    // batch and serves every request TWO-STAGE. Each micro-batch b
    // carries arrival slice b (vec_id % 5 = 0, mod-4 split, full
    // embedding rows tagged op='add') AND retraction slice b
    // (vec_id % 5 = 1, tagged op='del'): the adds frozen-encode and
    // append exactly-once under the APPEND watermark, the dels issue
    // one O(keys) tombstone exactly-once under the SEPARATE DELETE
    // watermark (the round-13 ADVICE trap, now fixed and exercised:
    // with a shared watermark the second mutation of every batch
    // would silently no-op), maintenance runs the delete-aware cycle
    // live, and the SAME foreachBatch then serves the fixed 20-query
    // contract against the LIVE index through the complete two-stage
    // path — pruned-scan ADC probe -> top-16 -> exact integer-L2
    // re-rank -> positioned top-3 WITH exact distances. Batch b's
    // arrivals must already be servable hits and its retractions
    // already gone, AFTER the refine stage. The oracle composes the
    // q214 prefix condition with the q223 shrink condition per batch
    // and re-ranks each population's ADC top-16 through the serve
    // oracle's refine CTEs — ADC distances are population-independent
    // (frozen encode, no re-encode on delete), so one oracle-side ADC
    // table replays all four add+delete populations exactly.
    QueryDef(
      "q227_ivfadc_live_serve",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val work = graft.Engine.scratchDir("q227", dir)
        graft.Engine.deleteRecursively(work)
        S.writeIvfAdcArtifacts(
          s, work.toString,
          S.ivecs(s, dir).filter(col("vec_id") % 5 =!= 0), k = 256, rounds = 2)
        val codesDir = s"$work/codes"
        // the CDC request stream: arrivals + retractions, one file per
        // deterministic mod-4 batch, both ops in the SAME micro-batch
        val incoming = stageBatches(
          graft.Engine.table(s, dir, "embeddings")
            .filter(col("vec_id") % 5 === 0 || col("vec_id") % 5 === 1)
            .withColumn("op", when(col("vec_id") % 5 === 0, lit("add")).otherwise(lit("del"))),
          work.toString, expr("(vec_id div 5) % 4"), 4)
        val servesDir = s"$work/serves"
        // hoisted reused frames (q218 rationale): the refine-stage
        // corpus and the fixed query contract are shared by all batches
        val iv = S.ivecs(s, dir)
        val q = iv
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        // frozen-quantizer frames hoisted out of the per-batch loop
        val coarse = s.read.parquet(s"$work/coarse")
        val codebook = s.read.parquet(s"$work/codebook")
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            // UPSERT half — watermark-guarded (skipping a replayed
            // batch spares the frozen-encode recompute; append itself
            // no-ops on the watermark regardless)
            if (bid > graft.operators.TieredIndex.lastBatch(codesDir)) {
              val enc = S.ivfadcEncode(
                S.toIv(batch.filter(col("op") === "add")), coarse, codebook)
              graft.operators.TieredIndex
                .append(ss, codesDir, S.packCodesHex(enc), batchId = bid)
            }
            // RETRACT half — exactly-once against the SEPARATE delete
            // watermark; same batchId as the append, both commit
            graft.operators.TieredIndex.delete(
              ss, codesDir,
              batch.filter(col("op") === "del").select(col("vec_id")),
              batchId = bid)
            graft.operators.TieredIndex
              .maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            // TWO-STAGE serve of the live index this batch just
            // mutated (idempotent overwrite — q214's replay rationale)
            S.ivfadcServe(ss, work.toString, q, iv, k = 256)
              .select(
                lit(bid).as("batch_id"), col("qid"), col("rn"),
                col("vec_id"), col("d"))
              .write.mode("overwrite").parquet(s"$servesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(servesDir)
          .orderBy(col("batch_id"), col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcLiveServeOracleSql)
    ),
    // --------------------------------------------------------------- q228
    // SAMPLED day-0 training under the PRODUCTION streaming lifecycle
    // — q226's training-cost cut proven inside the q219 shape (the
    // round-13 verdict's x2.8-at-sf1 row IS q219's day-0 deep train):
    // the deep (256, 2) day-0 quantizers now fit on the deterministic
    // keyed-hash sample of the standing population (seed ids + ~25%,
    // the q226 membership restricted to day-0 — one predicate AND),
    // the full standing population frozen-encodes against them, and
    // the identical 4-batch add/maintain/probe lifecycle runs on top.
    // The oracle is the q219 chain with the sampled trainWhere —
    // every mid-stream probe must match under the cheaper training.
    // This is the scale configuration a 100 TB deployment actually
    // runs: O(sample) Lloyd passes + one O(corpus) encode, then
    // O(batch) ingest forever.
    QueryDef(
      "q228_ivfadc_sampled_stream",
      (s, dir) => ivfadcStreamSearch(
        s, dir, tag = "q228", k = 256, rounds = 2,
        trainSample = Some(graft.queries.SimilarityOps.sampledTrainCol)),
      Some(graft.queries.SimilarityOps.ivfadcStreamSearchOracleSql(
        256, 2, sampleWhere = graft.queries.SimilarityOps.sampledTrainWhereSql))
    ),
    // --------------------------------------------------------------- q236
    // INCREMENTAL LEXICAL INDEX — the q214 mid-stream-searchability
    // lifecycle applied to the RETRIEVAL stack's sparse half (Lucene's
    // segment model: every refresh commits a new immutable postings
    // segment; queries read all live segments): day-0 builds the
    // postings index (doc_id, word, tf — BM25's complete sufficient
    // state, clustered by word so a term lookup stats-prunes to its
    // own key range) for the standing population as a TieredIndex
    // base; today's documents arrive as 4 deterministic micro-batches,
    // each appending ITS OWN postings segment exactly-once (batchId
    // watermark) with LSM maintenance; after every append the fixed
    // keyword query ranks the LIVE index through bm25FromPostings —
    // the same scoring code object q229 uses on the batch path — and
    // batch b's new documents must already be scoreable in rank b.
    // Collection stats (N, avgdl) are recomputed from the live
    // segments per request, so mid-stream scores are EXACTLY the
    // batch-recompute-over-prefix values the oracle expresses — the
    // incremental index is indistinguishable from a rebuild at every
    // point, which is the whole gate. At 100 TB: appends are
    // O(batch-tokens), reads prune to the query terms' key ranges,
    // and the stats aggregate is one narrow pass the deployment would
    // cache per refresh epoch.
    QueryDef(
      "q236_bm25_stream_index",
      (s, dir) => {
        val terms = Seq("hash", "join", "spark")
        val T = graft.operators.TieredIndex
        val work = bm25StreamIngest(s, dir, "q236", afterBatch = (ss, bid, w) =>
          // rank against the LIVE index this batch just committed
          // into; unconditional idempotent overwrite (q214's
          // replay-window rationale)
          bm25Top5(T.read(ss, s"$w/postings"), terms, bid)
            .write.mode("overwrite").parquet(s"$w/ranks/b$bid"))
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/ranks")
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(bm25PrefixRanksOracleSql)
    ),
    // --------------------------------------------------------------- q237
    // TIME-TRAVEL READS of the mutating index (Delta/Iceberg `VERSION
    // AS OF`, LSM edition) — the SAME ingest as q236 replayed under a
    // widened GC retention window (Policy.retainGenerations = 16:
    // snapshot retention is a policy knob, priced as retained disk),
    // then every per-batch ranking answered POST-HOC from historical
    // snapshots: readAsOf(b) resolves the newest committed generation
    // whose append watermark <= b and must reproduce batch b's
    // mid-stream ranks EXACTLY — the oracle is q236's string object
    // verbatim (zero drift), so time travel proving
    // population-identity with the live reads IS the gate. Maintenance
    // stays ON during ingest (compactions fold files, never data;
    // snapshots survive via retention, not by pausing the LSM) — the
    // reproducibility contract every training-data pipeline wants
    // from its index ("which corpus state trained this checkpoint?")
    // without freezing ingestion.
    QueryDef(
      "q237_index_time_travel",
      (s, dir) => {
        val terms = Seq("hash", "join", "spark")
        val T = graft.operators.TieredIndex
        val work = bm25StreamIngest(
          s, dir, "q237",
          policy = graft.operators.TieredIndex.Policy(retainGenerations = 16))
        val store = s"$work/postings"
        (0 until 4)
          .map(b => bm25Top5(T.readAsOf(s, store, b.toLong), terms, b.toLong))
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(bm25PrefixRanksOracleSql)
    ),
    // --------------------------------------------------------------- q241
    // TIME-TRAVEL ANN SERVING — q237's reproducibility contract on the
    // VECTOR side: the (16, 1) mid-stream-searchability lifecycle
    // (q214's exactly-once appends + LSM maintenance) runs under a
    // widened retention window WITHOUT its mid-stream probes, and
    // every per-batch positioned top-3 is then answered POST-HOC by
    // probing historical code populations (ivfadcProbeIndex asOf =
    // readAsOf of the codes TieredIndex; cells/codebook are frozen, so
    // time travel changes the searchable population and nothing else —
    // the pushed-literal list pruning rides the snapshot read
    // unchanged). Oracle: q214's string object VERBATIM — "probe the
    // index as it was after batch b" must equal "what a probe at batch
    // b actually returned", which is the audit every what-did-we-serve
    // investigation needs ("which neighbors did yesterday's index give
    // this query?") without replaying the stream.
    QueryDef(
      "q241_ann_time_travel",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        ivfadcStreamSearch(
          s, dir, tag = "q241", k = 16, rounds = 1,
          policy = graft.operators.TieredIndex.Policy(retainGenerations = 16),
          midProbes = false): Unit
        val work = graft.Engine.scratchDir("q241", dir)
        val q = S.ivecs(s, dir)
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        (0 until 4)
          .map(b =>
            S.ivfadcProbeIndex(s, work.toString, q, k = 16, asOf = Some(b.toLong))
              .select(
                lit(b.toLong).as("batch_id"), col("qid"), col("rn"),
                col("vec_id"), col("ad")))
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("qid"), col("rn"))
      },
      Some(graft.queries.SimilarityOps.ivfadcStreamSearchOracleSql())
    ),
    // --------------------------------------------------------------- q243
    // SNAPSHOT DIFF — the audit that makes time travel actionable
    // (Delta's table_changes / Iceberg's changelog scan): for every
    // batch, the multiset difference between consecutive index
    // snapshots, reduced to the documents it touches — which must be
    // EXACTLY that batch's staged arrival slice, nothing more (a
    // compaction between the two snapshots rewrites files, and any
    // row it corrupted or duplicated would surface here), nothing
    // less (a lost append surfaces as a missing doc). Gated against
    // the slice membership predicate itself — the one query where
    // the oracle is a single WHERE clause because the ENGINE side
    // carries all the machinery (ingest, retention, two snapshot
    // resolves per batch, exceptAll). diff(0) diffs against the
    // day-0 base (watermark -1). At scale: each diff is one
    // anti-join of two snapshot reads — O(changed + index) per
    // audit, run on demand, never a standing cost.
    QueryDef(
      "q243_index_snapshot_diff",
      (s, dir) => {
        val T = graft.operators.TieredIndex
        val work = bm25StreamIngest(
          s, dir, "q243",
          policy = graft.operators.TieredIndex.Policy(retainGenerations = 16))
        val store = s"$work/postings"
        (0 until 4)
          .map { b =>
            T.readAsOf(s, store, b.toLong)
              .exceptAll(T.readAsOf(s, store, b - 1L))
              .select(col("doc_id"))
              .distinct()
              .select(lit(b.toLong).as("batch_id"), col("doc_id"))
          }
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("doc_id"))
      },
      Some("""SELECT CAST((doc_id // 5) % 4 AS BIGINT) AS batch_id, doc_id
             FROM documents WHERE doc_id % 5 = 0
             ORDER BY batch_id, doc_id""")
    ),
    // --------------------------------------------------------------- q246
    // POSITIONAL POSTINGS, PERSISTED — the round-14 verdict's #2 gap
    // closed: q242 answered the phrase query by re-tokenizing the
    // corpus per request, with a scaladoc claim that at scale the
    // (doc_id, position) lists "come straight from a positional
    // inverted index — same segments". This gate builds exactly that
    // index (positionalPostingsOf: the postingsOf schema + a sorted
    // positions column — Lucene's positional segment; tf kept so the
    // SAME segments answer BM25 unchanged) through the q236 TieredIndex
    // lifecycle — day-0 base + 4 exactly-once micro-batch appends with
    // LSM maintenance — and answers a THREE-token phrase query
    // ("slow hash batch") FROM the live index both BATCH (the day-0
    // base, batch_id = -1, before any stream) and MID-STREAM (after
    // every append): each term's occurrences are one PRUNED index read
    // (word = term pushes to the scan — the word-clustered segments
    // stats-prune to that term's key range, plan-pinned), positions
    // shift by the term's phrase offset, and adjacency is the 2-join
    // equi-chain on (doc_id, p) — the (n-1)-join generalization q242's
    // scaladoc promised. Oracle: per-prefix-population recompute from
    // raw text, so a lost append, a mis-sorted positions list, or a
    // compaction that corrupted one offset all fail the hash. At
    // 100 TB: appends are O(batch tokens), a k-token phrase reads k
    // key ranges and joins — never a corpus scan.
    QueryDef(
      "q246_phrase_stream_index",
      (s, dir) => {
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        // two request shapes per refresh: the 2-token exact phrase and
        // the 3-token generalization (one more shifted equi-join —
        // phraseRank is n-ary; the tri page may legitimately be empty
        // on a tiny prefix, the bi page never is)
        val phrases = Seq(("bi", Seq("table", "hash")), ("tri", Seq("slow", "hash", "batch")))
        def ranks(ss: org.apache.spark.sql.SparkSession, w: String, bid: Long)
            : org.apache.spark.sql.DataFrame = {
          val post = T.read(ss, s"$w/postings")
          phrases.map { case (tag, p) =>
            R.phraseRank(post, p)
              .select(
                lit(bid).as("batch_id"), lit(tag).as("phrase"),
                col("rk"), col("doc_id"), col("n"))
          }.reduce(_ unionAll _)
        }
        val work = bm25StreamIngest(
          s, dir, "q246",
          postFn = R.positionalPostingsOf,
          afterCreate = (ss, w) =>
            ranks(ss, w, -1L).write.mode("overwrite").parquet(s"$w/ranks/bm1"),
          afterBatch = (ss, bid, w) =>
            ranks(ss, w, bid).write.mode("overwrite").parquet(s"$w/ranks/b$bid"))
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/ranks")
          .orderBy(col("batch_id"), col("phrase"), col("rk"))
      },
      Some(phrasePrefixRanksOracleSql)
    ),
    // --------------------------------------------------------------- q248
    // EPOCH-CACHED COLLECTION STATS — the live BM25 index's serving
    // shape (round-14 verdict #4): q236 recomputed (N, avgdl) and the
    // per-doc lengths from the live segments PER REQUEST — correct,
    // but a deployment serving thousands of requests per refresh epoch
    // computes them ONCE at the epoch boundary (the index only changes
    // at refreshes) and reuses them across every request in the epoch.
    // This gate runs that shape: after each append+maintain (= the
    // refresh epoch boundary), the per-doc length frame and the 1-row
    // collection stats are MATERIALIZED once (localCheckpoint — the
    // cache), then TWO different keyword requests serve from the live
    // postings (terms as pushed literals — the key-range-pruned read)
    // scored against the CACHED frames through the one bm25Score core.
    // Oracle: full per-prefix recompute for both term sets — cached-
    // epoch serving must be indistinguishable from per-request
    // recompute at every epoch, which is the whole claim. At 100 TB:
    // the O(index) dl/stats pass amortizes over the epoch's request
    // count; each request pays only its terms' key ranges + bounded
    // joins.
    QueryDef(
      "q248_bm25_epoch_cached_serve",
      (s, dir) => {
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val qsets = Seq(("kw", Seq("hash", "join", "spark")), ("dt", Seq("data", "stream")))
        val work = bm25StreamIngest(
          s, dir, "q248",
          afterBatch = (ss, bid, w) => {
            val post = T.read(ss, s"$w/postings")
            // EPOCH BOUNDARY: one dl pass + one stats row, materialized
            // and shared by every request until the next refresh
            val dl = post
              .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
              .localCheckpoint()
            val stats = R.statsOf(dl).localCheckpoint()
            val w5 = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            qsets.map { case (tag, words) =>
              R.bm25Score(R.termTfPushed(post, words), dl, stats)
                .orderBy(col("score").desc, col("doc_id"))
                .limit(5)
                .withColumn("rk", row_number().over(w5).cast("long"))
                .select(
                  lit(bid).as("batch_id"), lit(tag).as("qset"),
                  col("rk"), col("doc_id"), col("score"))
            }.reduce(_ unionAll _)
              .write.mode("overwrite").parquet(s"$w/ranks/b$bid")
          })
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/ranks")
          .orderBy(col("batch_id"), col("qset"), col("rk"))
      },
      Some(bm25EpochCachedOracleSql)
    ),
    // --------------------------------------------------------------- q249
    // ANN SNAPSHOT DIFF — q243's change audit on the VECTOR side
    // (round-14 verdict #5: the codes index had time travel but no
    // change-audit twin, so a corrupted compaction would surface only
    // as recall drift): the q241 ingest lifecycle (day-0 base + 4
    // exactly-once streaming appends, LSM maintenance ON, widened
    // retention), then for every batch the multiset difference between
    // consecutive codes-index snapshots reduced to the vec_ids it
    // touches — which must be EXACTLY that batch's staged arrival
    // slice: a compaction that duplicated or corrupted a packed row
    // surfaces as an extra diff row (exceptAll is multiset — same
    // vec_id, different bytes, still a diff), a lost append as a
    // missing one. Oracle: the slice-membership predicate itself.
    // At scale: one anti-join of two snapshot reads per audited batch,
    // run on demand.
    QueryDef(
      "q249_ann_snapshot_diff",
      (s, dir) => {
        val T = graft.operators.TieredIndex
        ivfadcStreamSearch(
          s, dir, tag = "q249", k = 16, rounds = 1,
          policy = graft.operators.TieredIndex.Policy(retainGenerations = 16),
          midProbes = false): Unit
        val store = s"${graft.Engine.scratchDir("q249", dir)}/codes"
        (0 until 4)
          .map { b =>
            T.readAsOf(s, store, b.toLong)
              .exceptAll(T.readAsOf(s, store, b - 1L))
              .select(col("vec_id"))
              .distinct()
              .select(lit(b.toLong).as("batch_id"), col("vec_id"))
          }
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("vec_id"))
      },
      Some("""SELECT CAST((vec_id // 5) % 4 AS BIGINT) AS batch_id, vec_id
             FROM embeddings WHERE vec_id % 5 = 0
             ORDER BY batch_id, vec_id""")
    ),
    // --------------------------------------------------------------- q250
    // HYBRID SERVING OVER TWO LIVE INDEXES — the whole retrieval
    // deployment in one gate: ONE CDC document stream maintains BOTH
    // halves of the hybrid stack (the lexical postings TieredIndex and
    // the ANN codes TieredIndex, each day-0-based on the standing
    // population, each appended exactly-once per micro-batch with LSM
    // maintenance), and after every batch the SAME fixed request
    // ("more like document 7") is served HYBRID from the two live
    // indexes: the sparse leg scores BM25 over the live postings
    // (dynamic N/avgdl/df — the stats move as the corpus grows), the
    // dense leg runs the complete two-stage request against the live
    // codes (pruned ADC probe -> top-32 -> exact re-rank -> top-20),
    // and RRF fuses the two positioned lists into the batch's top-10
    // page — q244's composition with BOTH legs mutating under the
    // stream, which is exactly what a production RAG system is. Batch
    // b's arrivals must be reachable through BOTH legs in page b. The
    // oracle recomputes each prefix population's BM25 chain and each
    // prefix's ADC+re-rank dense leg (frozen encode => ADC distances
    // are population-independent; one wadc serves all four prefixes)
    // into four fusion chains — one mis-served neighbor or one stale
    // collection stat anywhere in either index fails the hash. At
    // 100 TB: per batch the appends are O(batch), the sparse leg reads
    // its terms' key ranges, the dense leg nprobe/|cells| of the
    // codes, fusion is free — the gate IS the deployment's request
    // path.
    QueryDef(
      "q250_hybrid_live_serve",
      (s, dir) => {
        val work = hybridLiveIngest(s, dir, "q250", phases = Seq(0 until 4))
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/pages")
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridLiveServeOracleSql)
    ),
    // --------------------------------------------------------------- q253
    // RETRAIN + BLUE/GREEN SWAP UNDER A LIVE STREAM — q247's lifecycle
    // where it actually happens: ingestion never stops for a retrain.
    // The stream appends arrival slices to the LIVE generation's codes
    // index (resolved per batch — the serving processes' view); at
    // batch 2 the drift response fires MID-STREAM: retrain on the
    // deterministic sample of everything ingested so far (day-0 +
    // slices 0..2, q226's path), re-encode that whole population into
    // gen-00001, commit, swap — and batch 3's append lands in the NEW
    // generation while readers of the old one stay valid. The
    // cross-generation exactly-once trap this gate exists to pin: the
    // fresh generation's codes index already CONTAINS batches <= 2
    // (the re-encode folded them), so its watermark is SEEDED at 2
    // (TieredIndex.create seedBatch) — a replayed batch 2 no-ops
    // against gen-00001 instead of appending its slice twice, and the
    // retrain itself is guarded on the generation list (a replay after
    // the swap skips it; a replay after a crash mid-retrain overwrites
    // the un-pointed orphan dir). Gated observables: the post-swap
    // serves of batches 2 and 3 — population prefix(2)/prefix(3) under
    // the RETRAINED quantizers, through the complete two-stage path.
    // The oracle replays the sampled prefix-2 training once (frozen
    // encode covers everything; ADC distances are population-
    // independent) and filters per-batch populations. At 100 TB this
    // is the retrain story a year-long deployment runs quarterly:
    // O(sample) Lloyd + one O(corpus) encode, zero ingest downtime,
    // zero double-ingestion.
    QueryDef(
      "q253_stream_retrain_swap",
      (s, dir) => {
        val (work, _) = retrainSwapIngest(
          s, dir, "q253", graft.operators.TieredIndex.Policy(), recordServes = true)
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/serves")
          .orderBy(col("batch_id"), col("qid"), col("rn"))
      },
      Some(streamRetrainSwapOracleSql)
    ),
    // --------------------------------------------------------------- q256
    // GENERATION-AWARE TIME TRAVEL — the round-15 verdict's #3
    // composition gap closed: readAsOf resolves historical CODE
    // populations, but after a q253 retrain the quantizer artifacts
    // have TWO generations, and a pre-swap codes snapshot decoded with
    // post-swap codebooks is silent garbage (different coarse cells,
    // different per-subspace centroids — the ADC arithmetic would
    // still produce numbers). The missing resolve is WHICH GENERATION
    // served batch b; Generations now records each commit's batch
    // mark in its pointer HISTORY, and resolveAsOf answers from it.
    // This gate runs the full q253 retrain-under-stream lifecycle
    // (blue commits at mark -1, the mid-stream green retrain commits
    // at mark 2), then answers EVERY batch's positioned top-3
    // POST-HOC: resolveAsOf(b) picks the generation (blue for batches
    // 0-1, green for 2-3 — the `gen` column is gated so a wrong
    // resolve fails before the distances do), and the two-stage serve
    // runs against THAT generation's quantizers with its codes index
    // read AS OF batch b. The oracle replays both training chains
    // side by side (the blue biased-half chain and the green sampled
    // prefix-2 chain — the prefixed-CTE composition) and serves each
    // batch's prefix population through the matching one. This is the
    // "which corpus state + which model artifacts served this
    // request" audit a year-long deployment needs after any retrain;
    // at scale it costs two snapshot resolves + one pruned probe per
    // audited batch, on demand.
    QueryDef(
      "q256_generation_time_travel",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val G = graft.operators.Generations
        val (_, root) = retrainSwapIngest(
          s, dir, "q256",
          graft.operators.TieredIndex.Policy(retainGenerations = 16),
          recordServes = false)
        val iv = S.ivecs(s, dir)
        val q = iv
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        (0 until 4)
          .map { b =>
            // the cross-generation resolve: which artifact set was
            // CURRENT at batch b (pointer history), then that
            // generation's codes as of batch b (manifest watermarks)
            val gen = G.resolveAsOf(root, b.toLong)
            val genName = new java.io.File(gen).getName
            S.ivfadcServe(s, gen, q, iv, k = 16, asOf = Some(b.toLong))
              .select(
                lit(b.toLong).as("batch_id"), lit(genName).as("gen"),
                col("qid"), col("rn"), col("vec_id"), col("d"))
          }
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("qid"), col("rn"))
      },
      Some(generationTimeTravelOracleSql)
    ),
    // --------------------------------------------------------------- q257
    // QUANTIZER RETRAIN UNDER THE HYBRID STACK — q253 composed into
    // q250's deployment (round-15 verdict #4): q253 retrained the
    // dense leg of a dense-ONLY stream; a production RAG system
    // retrains its quantizers while the lexical postings index keeps
    // appending and every batch still serves fused pages. ONE CDC
    // document stream maintains BOTH live indexes; at batch 2 the
    // dense leg's mid-stream retrain fires (sampled prefix-2
    // training, full re-encode, seeded watermark, blue/green commit
    // at mark 2) while the postings index appends straight through —
    // zero downtime on EITHER leg — and the hybrid pages before and
    // after the swap are all gated: batches 0-1 fuse BM25 with the
    // BLUE (biased-half) dense serve, batches 2-3 with the GREEN
    // (retrained) one, so a missed swap, a stale codebook, or a
    // dropped lexical append anywhere in the lifecycle fails the
    // hash. The lexical collection stats ride a q248-style EPOCH
    // CACHE whose key includes the LIVE GENERATION as well as the
    // postings watermark — the round-15 verdict named the stale-epoch
    // serve across a swap as the bug class, and keying the epoch on
    // (postings watermark, generation) is the invalidation rule that
    // prevents it (each batch here moves both, so every page is
    // gated against full recompute). At 100 TB: the retrain is
    // O(sample) Lloyd + one O(corpus) encode paid at the trigger, the
    // swap O(1), and neither leg's per-batch ingest or per-request
    // cost changes shape.
    QueryDef(
      "q257_hybrid_retrain_swap",
      (s, dir) => {
        val (work, _) = hybridRetrainIngest(
          s, dir, "q257", graft.operators.TieredIndex.Policy())
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/pages")
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridRetrainSwapOracleSql)
    ),
    // --------------------------------------------------------------- q259
    // THE HISTORICAL HYBRID PAGE — time travel across BOTH legs AND
    // the generation swap in one audit: "what page did we serve at
    // batch b" answered POST-HOC after the q257 lifecycle (retrain
    // mid-stream included), by composing every as-of resolve the
    // engine now has — the postings index readAsOf(b) (manifest
    // watermarks), the generation pointer resolveAsOf(b) (commit-mark
    // history: blue for batches 0-1, green for 2-3), and that
    // generation's codes readAsOf(b) — then re-running the SAME
    // request (BM25 from the snapshot postings with snapshot-derived
    // dl/stats, two-stage dense serve from the snapshot codes, RRF).
    // Oracle: q257's string object VERBATIM — the replayed pages must
    // equal the live mid-stream pages to the hash, the q237/q241
    // zero-drift contract extended over the full hybrid deployment
    // with a retrain in the middle. This is the what-did-we-serve
    // investigation a production RAG system runs after an incident;
    // at scale each audit costs three snapshot resolves + the
    // ordinary request (pruned key-range + nprobe/|cells| reads), on
    // demand, with retention the only standing price.
    QueryDef(
      "q259_hybrid_page_time_travel",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val G = graft.operators.Generations
        val (work, root) = hybridRetrainIngest(
          s, dir, "q259",
          graft.operators.TieredIndex.Policy(retainGenerations = 16))
        val docs = graft.Engine.table(s, dir, "documents")
        val iv = S.ivecs(s, dir)
        // the fixed request's DISTINCT terms as a driver-side literal
        // list, pulled ONCE per lifecycle (termsLiteral's bounded
        // 1-row fetch) — every batch's tf leg pushes `word IN (...)`
        // to the word-clustered postings scan instead of paying a
        // broadcast join that never reaches the scan
        val qWords = R.termsLiteral(docs
          .filter(col("doc_id") === 7)
          .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        (0 until 4)
          .map { b =>
            val post = T.readAsOf(s, s"$work/postings", b.toLong)
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(post, qWords)
              .filter(col("doc_id") =!= 7)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(20)
              .withColumn("lex_rk", row_number().over(wL).cast("long"))
              .select(col("doc_id"), col("lex_rk"))
            val vec = S
              .ivfadcServe(
                s, G.resolveAsOf(root, b.toLong), q7, iv, k = 16,
                candN = 32, topN = 20, asOf = Some(b.toLong))
              .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
            R.rrfFuse(lex, vec)
              .select(
                lit(b.toLong).as("batch_id"), col("rk"), col("doc_id"),
                col("rrf"), col("lex_rk"), col("vec_rk"))
          }
          .reduce(_ unionAll _)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridRetrainSwapOracleSql)
    ),
    // --------------------------------------------------------------- q255
    // CDC RETRACTION THROUGH BOTH LEGS of the live hybrid stack — the
    // round-15 verdict's #1 asymmetry closed: q250's lexical leg was
    // append-only (the ANN leg retracted via q223/q227 tombstones, but
    // a deleted document would have kept serving BM25 hits forever).
    // This gate runs q250's dual-index deployment under a REAL CDC
    // stream: each micro-batch b APPENDS arrival slice b (doc_id % 5 =
    // 0, op='add') AND RETRACTS standing slice b (doc_id % 5 = 1,
    // op='del') — the delete flows through the postings TieredIndex as
    // ONE doc-keyed tombstone (O(deleted docs), cheaper than expanding
    // to postings rows: the order-aware masked read anti-joins on
    // doc_id and masks every posting of the doc at once) under the
    // separate delete watermark, and through the codes index as the
    // q227 vec_id tombstone — both exactly-once under the same
    // batchId. After every batch the SAME hybrid request serves from
    // the two mutating indexes, and the gated pages pin that a
    // retracted doc is gone from BOTH legs with the MOVING collection
    // stats (N, avgdl, df all shrink through bm25FromPostings's
    // masked dl/stats pass — a stale stat anywhere shifts every score
    // and fails the hash). Oracle: per-batch populations = standing
    // minus retractions <= b plus arrivals <= b (q227's composition,
    // hybrid edition), each replayed through the full BM25 + ADC +
    // re-rank + RRF chains. At 100 TB: a retraction is O(keys) at
    // issue time on each index; physical removal amortizes into the
    // LSM maintenance both indexes already run.
    QueryDef(
      "q255_hybrid_cdc_retract",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val work = graft.Engine.scratchDir("q255", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val ids = graft.Engine.table(s, dir, "embeddings").select(col("vec_id"))
        val uni = docs.join(ids, docs("doc_id") === ids("vec_id"), "left_semi")
        // day-0 standing population (includes the %5==1 docs that the
        // stream will retract — deletes arrive AFTER the build, the
        // deployment's actual order)
        val postDir = s"$work/postings"
        T.create(
          s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
          4, Seq(col("word"), col("doc_id")))
        val iv = S.ivecs(s, dir)
        S.writeIvfAdcArtifacts(
          s, work.toString, iv.filter(col("vec_id") % 5 =!= 0), k = 16, rounds = 1)
        val codesDir = s"$work/codes"
        // the CDC stream: arrivals + retractions, both ops per batch
        val incoming = stageBatches(
          uni.filter(col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1)
            .select(col("doc_id"), col("text"))
            .withColumn("op", when(col("doc_id") % 5 === 0, lit("add")).otherwise(lit("del"))),
          work.toString, expr("(doc_id div 5) % 4"), 4)
        val pagesDir = s"$work/pages"
        // the fixed request's DISTINCT terms as a driver-side literal
        // list, pulled ONCE per lifecycle (termsLiteral's bounded
        // 1-row fetch) — every batch's tf leg pushes `word IN (...)`
        // to the word-clustered postings scan instead of paying a
        // broadcast join that never reaches the scan
        val qWords = R.termsLiteral(docs
          .filter(col("doc_id") === 7)
          .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        // frozen-quantizer frames hoisted out of the per-batch loop
        val coarse = s.read.parquet(s"$work/coarse")
        val codebook = s.read.parquet(s"$work/codebook")
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val adds = batch.filter(col("op") === "add")
            val dels = batch.filter(col("op") === "del")
            // the two index legs run CONCURRENTLY (disjoint dirs, §2.6)
            legsInParallel {
              // LEXICAL upsert + retract — the append under the append
              // watermark, the doc-keyed tombstone under the SEPARATE
              // delete watermark (one CDC batch commits both marks)
              if (bid > T.lastBatch(postDir))
                T.append(ss, postDir, R.postingsOf(adds), batchId = bid)
              T.delete(ss, postDir, dels.select(col("doc_id")), batchId = bid)
              T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            } {
              // VECTOR upsert + retract — q227's loop at the q250 depth
              if (bid > T.lastBatch(codesDir)) {
                val arrivals = iv.join(
                  broadcast(adds.select(col("doc_id").as("vec_id"))),
                  Seq("vec_id"), "left_semi")
                val enc = S.ivfadcEncode(arrivals, coarse, codebook)
                T.append(ss, codesDir, S.packCodes(enc), batchId = bid)
              }
              T.delete(
                ss, codesDir, dels.select(col("doc_id").as("vec_id")), batchId = bid)
              T.maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            }
            // HYBRID serve — retracted docs must be gone from BOTH
            // legs, and the sparse scores must carry the SHRUNK stats;
            // fenced: one CDC batch commits FOUR marks (append+delete
            // on each index), and the page waits for all of them
            T.fenceAligned(postDir, codesDir): Unit
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
              .filter(col("doc_id") =!= 7)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(20)
              .withColumn("lex_rk", row_number().over(wL).cast("long"))
              .select(col("doc_id"), col("lex_rk"))
            val vec = S.ivfadcServe(ss, work.toString, q7, iv, k = 16, candN = 32, topN = 20)
              .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
            R.rrfFuse(lex, vec)
              .select(
                lit(bid).as("batch_id"), col("rk"), col("doc_id"),
                col("rrf"), col("lex_rk"), col("vec_rk"))
              .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(pagesDir)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridCdcRetractOracleSql)
    ),
    // --------------------------------------------------------------- q258
    // CDC UPSERT LIFECYCLE — the commonest CDC event, gated end to
    // end (round-15 verdict #5): a re-ingested doc_id is a CONTENT
    // UPDATE, and an index that only appends would double-serve it —
    // stale postings inflating BM25 tf/df/dl and a stale code row
    // still answering ANN probes next to the fresh one. The upsert
    // spelling is DELETE + APPEND under ONE batchId on BOTH indexes:
    // the doc-keyed tombstone first (masking every pre-update row),
    // the re-tokenized postings / re-encoded code appended second (a
    // later segment number, so the tombstone can never mask the fresh
    // rows — the LSM order contract), each exactly-once against its
    // own watermark (TieredIndex commits both marks atomically, so a
    // replayed batch no-ops as a unit). The stream updates slice
    // doc_id % 7 = 3 across 4 micro-batches — text gains a suffix,
    // the embedding flips (reversed — a deterministic stand-in for
    // re-embedding changed content) — and after every batch BOTH legs
    // are served and gated WITH their metrics: the BM25 top-10
    // (scores carry the moving tf/df/dl/stats, and the 'refreshed'
    // query term only exists in post-update text — a surviving
    // pre-update posting or a missing update both shift scores) and
    // the doc-7 dense top-10 (exact distances against the AS-UPDATED
    // vectors — a stale code row or a missed re-encode surfaces as a
    // wrong candidate or distance). The oracle carries the original
    // AND updated corpora chains side by side (prefixed CTEs + the
    // tSrc hook) and serves each batch from the merged as-of state.
    // At 100 TB: an upsert batch costs O(changed docs) on each index;
    // physical removal of the superseded rows amortizes into the LSM
    // maintenance already running.
    QueryDef(
      "q258_cdc_upsert_lifecycle",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val work = graft.Engine.scratchDir("q258", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val emb = graft.Engine.table(s, dir, "embeddings")
        val uni = docs.join(
          emb.select(col("vec_id")), docs("doc_id") === col("vec_id"), "left_semi")
        // day-0: BOTH indexes hold the full pre-update corpus; the
        // quantizers train EXCLUDING the updatable slice (frozen
        // artifacts must not move when content does — the update
        // path re-encodes against them)
        val postDir = s"$work/postings"
        T.create(s, postDir, R.postingsOf(uni), 4, Seq(col("word"), col("doc_id")))
        val iv = S.ivecs(s, dir)
        S.writeIvfAdcArtifacts(
          s, work.toString, iv, k = 16, rounds = 1,
          trainIv = Some(iv.filter(col("vec_id") % 7 =!= 3)))
        val codesDir = s"$work/codes"
        // the update stream: slice doc_id % 7 = 3, four batches
        val incoming = stageBatches(
          uni.filter(col("doc_id") % 7 === 3).select(col("doc_id"), col("text")),
          work.toString, expr("(doc_id div 7) % 4"), 4)
        val pagesDir = s"$work/pages"
        // the request's terms, sorted — pushed per batch as `word IN
        // (...)` literals (the termsLiteral convention for the fixed
        // frames; here the set is already a literal)
        val qWords = Seq("hash", "join", "refreshed")
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        // frozen-quantizer frames hoisted out of the per-batch loop
        val coarse = s.read.parquet(s"$work/coarse")
        val codebook = s.read.parquet(s"$work/codebook")
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val updated = batch.withColumn(
              "text", concat(col("text"), lit(" graft refreshed revision")))
            // the two index legs run CONCURRENTLY (disjoint dirs, §2.6)
            legsInParallel {
              // LEXICAL upsert: tombstone FIRST (masks the pre-update
              // postings), re-tokenized postings second — both under
              // batchId bid against their separate watermarks
              T.delete(ss, postDir, batch.select(col("doc_id")), batchId = bid)
              if (bid > T.lastBatch(postDir))
                T.append(ss, postDir, R.postingsOf(updated), batchId = bid)
              T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            } {
              // VECTOR upsert: tombstone, then the re-embedded content
              // frozen-encoded against the day-0 quantizers
              T.delete(
                ss, codesDir, batch.select(col("doc_id").as("vec_id")), batchId = bid)
              if (bid > T.lastBatch(codesDir)) {
                val reEmb = emb
                  .join(broadcast(batch.select(col("doc_id").as("vec_id"))),
                    Seq("vec_id"), "left_semi")
                  .withColumn("embedding", reverse(col("embedding")))
                val enc = S.ivfadcEncode(S.toIv(reEmb), coarse, codebook)
                T.append(ss, codesDir, S.packCodes(enc), batchId = bid)
              }
              T.maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            }
            // SERVE both legs with metrics, fenced (the upsert batch
            // commits all four marks before either leg serves). The
            // exact re-rank corpus is the AS-UPDATED state (updates
            // <= bid applied) — a candidate's distance must reflect
            // its live content
            T.fenceAligned(postDir, codesDir): Unit
            val ivLive = S.toIv(emb.withColumn(
              "embedding",
              when(
                col("vec_id") % 7 === 3 && expr("(vec_id div 7) % 4") <= bid,
                reverse(col("embedding"))).otherwise(col("embedding"))))
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(10)
              .withColumn("rk", row_number().over(wL).cast("long"))
              .select(
                lit(bid).as("batch_id"), lit("lex").as("leg"), col("rk"),
                col("doc_id"), col("score"), lit(null).cast("long").as("d"))
            val vec = S
              .ivfadcServe(ss, work.toString, q7, ivLive, k = 16, candN = 32, topN = 10)
              .select(
                lit(bid).as("batch_id"), lit("vec").as("leg"),
                col("rn").as("rk"), col("vec_id").as("doc_id"),
                lit(null).cast("double").as("score"), col("d"))
            lex.unionAll(vec)
              .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(pagesDir)
          .orderBy(col("batch_id"), col("leg"), col("rk"))
      },
      Some(cdcUpsertLifecycleOracleSql)
    ),
    // --------------------------------------------------------------- q260
    // THE FULL CDC MATRIX UNDER A MID-STREAM RETRAIN — every lifecycle
    // event this engine's serving stack supports, in ONE gated
    // deployment: each micro-batch b simultaneously APPENDS arrival
    // slice b (doc_id % 5 = 0), RETRACTS standing slice b (% 5 = 1),
    // and UPSERTS content-update slice b (% 5 = 3: text suffixed,
    // embedding re-embedded) through BOTH live indexes — tombstones
    // first, fresh postings/codes second, exactly-once per watermark —
    // and at batch 2 the dense leg RETRAINS mid-stream on the sampled
    // CURRENT population STATE (membership minus retractions plus
    // arrivals, content with updates applied) and blue/green-swaps
    // with BOTH watermarks seeded (a replayed batch-2 append OR
    // delete must no-op against the fresh generation — the
    // seedDeleteBatch composition this gate exists to pin). Hybrid
    // pages after every batch: batches 0-1 fuse against the blue
    // quantizers, 2-3 against the green, all over the shifting
    // population with moving collection stats. The oracle composes
    // FOUR quantizer chains (blue/green x original/updated content —
    // training rows exclude the updatable class on both sides, so
    // each generation's quantizers are bit-identical across its two
    // content chains) and picks every vector's row from the chain
    // matching its as-of-b generation and content. At 100 TB: each
    // batch is O(changed) on both indexes, the retrain O(sample) +
    // O(corpus) at the trigger, the swap O(1) — the whole matrix
    // costs what its parts cost.
    QueryDef(
      "q260_hybrid_full_cdc_retrain",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val G = graft.operators.Generations
        val work = graft.Engine.scratchDir("q260", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val emb = graft.Engine.table(s, dir, "embeddings")
        val uni = docs.join(
          emb.select(col("vec_id")), docs("doc_id") === col("vec_id"), "left_semi")
        val postDir = s"$work/postings"
        T.create(
          s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
          4, Seq(col("word"), col("doc_id")))
        val root = s"$work/ann"
        val iv = S.ivecs(s, dir)
        val day0 = iv.filter(col("vec_id") % 5 =!= 0)
        // BLUE: biased-half day-0 quantizers, training EXCLUDING the
        // updatable class (frozen artifacts must be reproducible from
        // content that never changes — the oracle's decomposition
        // hinges on it)
        S.writeIvfAdcArtifacts(
          s, s"$root/gen-00000", day0, k = 16, rounds = 1,
          trainIv = Some(day0.filter(
            (col("vec_id") < 32 || col("vec_id") % 2 === 0) &&
              col("vec_id") % 5 =!= 3)))
        G.commit(root, "gen-00000", mark = -1L)
        val incoming = stageBatches(
          uni.filter(
            col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 3)
            .select(col("doc_id"), col("text"))
            .withColumn(
              "op",
              when(col("doc_id") % 5 === 0, lit("add"))
                .when(col("doc_id") % 5 === 1, lit("del"))
                .otherwise(lit("upd"))),
          work.toString, expr("(doc_id div 5) % 4"), 4)
        val pagesDir = s"$work/pages"
        // the fixed request's DISTINCT terms as a driver-side literal
        // list, pulled ONCE per lifecycle (termsLiteral's bounded
        // 1-row fetch) — every batch's tf leg pushes `word IN (...)`
        // to the word-clustered postings scan instead of paying a
        // broadcast join that never reaches the scan
        val qWords = R.termsLiteral(docs
          .filter(col("doc_id") === 7)
          .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        // the embedding corpus as of update-slice prefix u
        def embAsOf(u: Long) = emb.withColumn(
          "embedding",
          when(
            col("vec_id") % 5 === 3 && expr("(vec_id div 5) % 4") <= u,
            reverse(col("embedding"))).otherwise(col("embedding")))
        // per-generation frozen-quantizer memo (read once per
        // generation, not once per batch)
        val quant = quantReader()
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val adds = batch.filter(col("op") === "add")
            val dels = batch.filter(col("op") === "del")
            val upds = batch.filter(col("op") === "upd")
              .withColumn("text", concat(col("text"), lit(" graft refreshed revision")))
            // the two index legs run CONCURRENTLY (disjoint dirs,
            // §2.6); the retrain below waits for BOTH (it must see
            // batch-2's dense ops land in blue before the swap)
            legsInParallel {
              // LEXICAL: retractions + superseded content tombstone
              // FIRST, fresh postings second (order contract: the
              // tombstone must predate the re-appended rows)
              T.delete(
                ss, postDir,
                dels.select(col("doc_id")).unionAll(upds.select(col("doc_id"))),
                batchId = bid)
              if (bid > T.lastBatch(postDir))
                T.append(ss, postDir, R.postingsOf(adds.unionByName(upds)), batchId = bid)
              T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            } {
              // DENSE: the same discipline against the LIVE generation
              val cur = G.resolve(root)
              T.delete(
                ss, s"$cur/codes",
                dels.select(col("doc_id").as("vec_id"))
                  .unionAll(upds.select(col("doc_id").as("vec_id"))),
                batchId = bid)
              if (bid > T.lastBatch(s"$cur/codes")) {
                val addIv = iv.join(
                  broadcast(adds.select(col("doc_id").as("vec_id"))),
                  Seq("vec_id"), "left_semi")
                val updIv = S.toIv(emb
                  .join(
                    broadcast(upds.select(col("doc_id").as("vec_id"))),
                    Seq("vec_id"), "left_semi")
                  .withColumn("embedding", reverse(col("embedding"))))
                val (cc, cb) = quant(ss, cur)
                val enc = S.ivfadcEncode(addIv.unionByName(updIv), cc, cb)
                T.append(ss, s"$cur/codes", S.packCodes(enc), batchId = bid)
              }
              T.maintain(ss, s"$cur/codes", Seq(col("ccid"), col("vec_id"))): Unit
            }
            // MID-STREAM RETRAIN on the current population STATE —
            // membership minus retractions plus arrivals as of batch
            // 2, content with updates <= 2 applied; BOTH fresh
            // watermarks seeded so a replayed batch-2 append OR
            // delete no-ops against the new generation
            if (bid == 2 && G.resolve(root).endsWith("gen-00000")) {
              graft.Engine.deleteRecursively(new java.io.File(s"$root/gen-00001"))
              val popPred =
                (col("vec_id") % 5 === 2 || col("vec_id") % 5 === 3 ||
                  col("vec_id") % 5 === 4) ||
                  (col("vec_id") % 5 === 1 && expr("(vec_id div 5) % 4") > 2) ||
                  (col("vec_id") % 5 === 0 && expr("(vec_id div 5) % 4") <= 2)
              val ivState2 = S.toIv(embAsOf(2L)).filter(popPred)
              S.writeIvfAdcArtifacts(
                ss, s"$root/gen-00001", ivState2, k = 16, rounds = 1,
                trainIv = Some(ivState2.filter(
                  S.sampledTrainCol && col("vec_id") % 5 =!= 3)),
                seedBatch = bid, seedDeleteBatch = bid)
              G.commit(root, "gen-00001", mark = bid)
            }
            // HYBRID page from the two live indexes: moving stats on
            // the sparse leg, as-updated exact re-rank on the dense —
            // fenced across the full CDC matrix (append AND delete
            // watermarks of both indexes agree, the seeded generation
            // included)
            T.fenceAligned(postDir, s"${G.resolve(root)}/codes"): Unit
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
              .filter(col("doc_id") =!= 7)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(20)
              .withColumn("lex_rk", row_number().over(wL).cast("long"))
              .select(col("doc_id"), col("lex_rk"))
            val vec = S
              .ivfadcServe(
                ss, G.resolve(root), q7, S.toIv(embAsOf(bid)), k = 16,
                candN = 32, topN = 20)
              .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
            R.rrfFuse(lex, vec)
              .select(
                lit(bid).as("batch_id"), col("rk"), col("doc_id"),
                col("rrf"), col("lex_rk"), col("vec_rk"))
              .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(pagesDir)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridFullCdcRetrainOracleSql)
    ),
    // --------------------------------------------------------------- q261
    // ROLLBACK WITH CATCH-UP UNDER THE LIVE HYBRID STREAM — the ops
    // event q254's O(1) pointer write cannot serve alone (round-16
    // verdict #1): the q257-shaped deployment swaps to the retrained
    // GREEN generation at batch 2 (the swap fires BEFORE the batch's
    // dense append here, so arrival batches 2 AND 3 land ONLY in
    // green — blue's codes index freezes at batch 1), green turns out
    // bad, and at batch 3 operations rolls back to blue WITH INGEST
    // CONTINUING. A bare pointer write would serve blue silently
    // missing two committed batches; rollbackCatchUp closes the gap
    // first — blue's own watermark names the missed range (2..3), the
    // staged source replays each missed batch's arrivals re-encoded
    // against BLUE's frozen quantizers under the ORIGINAL batch ids
    // (exactly-once by construction), and the pointer moves only once
    // blue is current. Gated pages: batches 0-1 fuse against blue,
    // batch 2 against green (the swap's one live page), batch 3
    // against blue again over the FULL batch-0..3 population — the
    // blue chain over the complete prefix, which only holds if the
    // catch-up actually re-drove the gap (a frozen blue index fails
    // the hash on every arrival in batches 2-3). The lexical leg
    // appends straight through swap AND rollback. At 100 TB: the
    // catch-up is O(missed batches) — the batches' own encode cost,
    // paid once — and the rollback stays zero-downtime on both legs.
    QueryDef(
      "q261_rollback_catchup",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val G = graft.operators.Generations
        val work = graft.Engine.scratchDir("q261", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val ids = graft.Engine.table(s, dir, "embeddings").select(col("vec_id"))
        val uni = docs.join(ids, docs("doc_id") === ids("vec_id"), "left_semi")
        val postDir = s"$work/postings"
        T.create(
          s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
          4, Seq(col("word"), col("doc_id")))
        val root = s"$work/ann"
        val iv = S.ivecs(s, dir)
        val day0 = iv.filter(col("vec_id") % 5 =!= 0)
        S.writeIvfAdcArtifacts(
          s, s"$root/gen-00000", day0, k = 16, rounds = 1,
          trainIv = Some(day0.filter(col("vec_id") < 32 || col("vec_id") % 2 === 0)))
        G.commit(root, "gen-00000", mark = -1L)
        val incoming = stageBatches(
          uni.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")),
          work.toString, expr("(doc_id div 5) % 4"), 4)
        val pagesDir = s"$work/pages"
        // the fixed request's DISTINCT terms as a driver-side literal
        // list, pulled ONCE per lifecycle (termsLiteral's bounded
        // 1-row fetch) — every batch's tf leg pushes `word IN (...)`
        // to the word-clustered postings scan instead of paying a
        // broadcast join that never reaches the scan
        val qWords = R.termsLiteral(docs
          .filter(col("doc_id") === 7)
          .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        // the retained staged source IS the catch-up's replay log
        // (Kafka-retention's stand-in): batch b's arrivals, by the
        // staged membership
        val batchDocs = (b: Long) =>
          s.read.parquet(incoming).filter(expr("(doc_id div 5) % 4") === b)
        // per-generation frozen-quantizer memo (read once per
        // generation — blue AND green — not once per batch)
        val quant = quantReader()
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            // the LEXICAL leg runs CONCURRENTLY with the dense leg's
            // ordered retrain->append->rollback sequence (disjoint
            // dirs, §2.6); the fence below waits for both
            legsInParallel {
              // LEXICAL leg: appends through swap AND rollback
              if (bid > T.lastBatch(postDir)) {
                T.append(ss, postDir, R.postingsOf(batch), batchId = bid)
                T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
              }
            } {
              // the mid-stream retrain fires BEFORE this batch's dense
              // append (pointer-guarded): green trains on the prefix-1
              // population, it is seeded at batch 1, and batches 2-3
              // land ONLY in green — the exact gap the rollback must
              // close
              if (bid == 2 && G.resolve(root).endsWith("gen-00000")) {
                graft.Engine.deleteRecursively(new java.io.File(s"$root/gen-00001"))
                val pop = iv.filter(
                  col("vec_id") % 5 =!= 0 || expr("(vec_id div 5) % 4") <= 1)
                S.writeIvfAdcArtifacts(
                  ss, s"$root/gen-00001", pop, k = 16, rounds = 1,
                  trainIv = Some(pop.filter(S.sampledTrainCol)), seedBatch = bid - 1)
                G.commit(root, "gen-00001", mark = bid)
              }
              // DENSE append to the LIVE generation
              val cur = G.resolve(root)
              if (bid > T.lastBatch(s"$cur/codes")) {
                val arr = iv.join(
                  broadcast(batch.select(col("doc_id").as("vec_id"))),
                  Seq("vec_id"), "left_semi")
                val (cc, cb) = quant(ss, cur)
                val enc = S.ivfadcEncode(arr, cc, cb)
                T.append(ss, s"$cur/codes", S.packCodes(enc), batchId = bid)
                T.maintain(ss, s"$cur/codes", Seq(col("ccid"), col("vec_id"))): Unit
              }
              // THE ROLLBACK EVENT: green regressed — roll back to blue
              // at batch 3 with ingest continuing (pointer-guarded, the
              // retrain's replay discipline); each missed batch
              // re-encodes from the retained staged source against
              // BLUE's frozen quantizers under its original id
              if (bid == 3 && G.resolve(root).endsWith("gen-00001"))
                rollbackCatchUp(root, "gen-00000", upTo = bid, mark = bid) {
                  (tgt, b) =>
                    val arr = iv.join(
                      broadcast(batchDocs(b).select(col("doc_id").as("vec_id"))),
                      Seq("vec_id"), "left_semi")
                    val (cc, cb) = quant(ss, tgt)
                    val enc = S.ivfadcEncode(arr, cc, cb)
                    T.append(ss, s"$tgt/codes", S.packCodes(enc), batchId = b)
                    T.maintain(
                      ss, s"$tgt/codes", Seq(col("ccid"), col("vec_id"))): Unit
                }
            }
            // HYBRID page from the live pair, fenced — at batch 3 the
            // fence itself proves the catch-up (a frozen blue index
            // would disagree with the postings watermark)
            T.fenceAligned(postDir, s"${G.resolve(root)}/codes"): Unit
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
              .filter(col("doc_id") =!= 7)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(20)
              .withColumn("lex_rk", row_number().over(wL).cast("long"))
              .select(col("doc_id"), col("lex_rk"))
            val vec = S
              .ivfadcServe(ss, G.resolve(root), q7, iv, k = 16, candN = 32, topN = 20)
              .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
            R.rrfFuse(lex, vec)
              .select(
                lit(bid).as("batch_id"), col("rk"), col("doc_id"),
                col("rrf"), col("lex_rk"), col("vec_rk"))
              .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(pagesDir)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(rollbackCatchUpOracleSql)
    ),
    // --------------------------------------------------------------- q262
    // STREAMING RESTART RECOVERY FROM THE CHECKPOINT — the one
    // production codepath every prior gate left untested (round-16
    // verdict #2): they all run `Trigger.AvailableNow()` to
    // completion, so the `checkpointLocation` each query dutifully
    // writes was never read back by an actual restart. This gate runs
    // q250's dual-index hybrid deployment SPLIT ACROSS A REAL
    // STOP/START: batches 0-1 are staged and a query runs to
    // termination; then batches 2-3 are staged and a NEW query starts
    // on the SAME checkpoint dir. Structured Streaming's recovery
    // path must do the rest — the file-source offsets log marks the
    // consumed files so the resumed query processes EXACTLY the two
    // new ones, micro-batch ids CONTINUE at 2 (the staged-slice ids
    // the per-batch observables join on), and any replayed
    // foreachBatch invocation no-ops through the index watermarks.
    // Oracle: q250's string object VERBATIM — the four pages of the
    // stop/start lifecycle must hash-equal the single-run deployment,
    // which is the whole recovery contract (a re-read file would
    // double-append and shift BM25 stats; a skipped file would freeze
    // page 2-3; a restarted batch id would misalign every prefix).
    // At 100 TB this is the nightly reality of any long-running
    // ingest: executors die, queries restart, and the checkpoint +
    // watermark pair is what makes that invisible.
    QueryDef(
      "q262_restart_recovery",
      (s, dir) => {
        val work = hybridLiveIngest(
          s, dir, "q262", phases = Seq(Seq(0, 1), Seq(2, 3)))
        s.read.option("recursiveFileLookup", "true").parquet(s"$work/pages")
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(hybridLiveServeOracleSql)
    ),
    // --------------------------------------------------------------- q264
    // POSITIONAL POSTINGS UNDER CDC — the round-16 verdict's #5 gap:
    // q246 stream-maintains the positional index but only ever
    // APPENDS, and q255/q258 retract/upsert only the standard
    // postings — a retracted doc's positions rows would keep serving
    // phrase matches forever, and a content update would double-count
    // phrase occurrences (stale positions next to fresh ones). This
    // gate runs the full CDC discipline with `positionalPostingsOf`
    // as the segment payload: each micro-batch b APPENDS arrival
    // slice b (doc_id % 5 = 0), RETRACTS standing slice b (% 5 = 1),
    // and UPSERTS content-update slice b (% 5 = 3 — the text gains a
    // suffix CONTAINING BOTH GATE PHRASES, so a missed update or a
    // surviving stale row shifts the counts, not just membership),
    // tombstones first / fresh rows second under one batchId (the LSM
    // order contract), exactly-once per watermark. After every batch
    // BOTH phrase arities rank from the live index; oracle = per-batch
    // population recompute from raw text (retractions out, arrivals
    // in, updated text applied) through the q246 adjacency chains. At
    // 100 TB: a retraction is O(keys), an upsert O(changed docs'
    // tokens), and the phrase serve keeps q242's economics (k pruned
    // key-range reads + (k-1) bounded joins).
    QueryDef(
      "q264_phrase_cdc_lifecycle",
      (s, dir) => {
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val work = graft.Engine.scratchDir("q264", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val postDir = s"$work/postings"
        T.create(
          s, postDir,
          R.positionalPostingsOf(docs.filter(col("doc_id") % 5 =!= 0)),
          4, Seq(col("word"), col("doc_id")))
        val incoming = stageBatches(
          docs.filter(
            col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 3)
            .select(col("doc_id"), col("text"))
            .withColumn(
              "op",
              when(col("doc_id") % 5 === 0, lit("add"))
                .when(col("doc_id") % 5 === 1, lit("del"))
                .otherwise(lit("upd"))),
          work.toString, expr("(doc_id div 5) % 4"), 4)
        val ranksDir = s"$work/ranks"
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val adds = batch.filter(col("op") === "add")
            val dels = batch.filter(col("op") === "del")
            val upds = batch.filter(col("op") === "upd")
              .withColumn("text", concat(col("text"), lit(s" $phraseCdcSuffix")))
            // tombstone FIRST (retractions + superseded content — the
            // doc-keyed mask covers every positions row of the doc),
            // fresh positional postings second: the order contract
            T.delete(
              ss, postDir,
              dels.select(col("doc_id")).unionAll(upds.select(col("doc_id"))),
              batchId = bid)
            if (bid > T.lastBatch(postDir))
              T.append(
                ss, postDir,
                R.positionalPostingsOf(adds.unionByName(upds)), batchId = bid)
            T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            // serve BOTH phrase arities from the live positional index
            val post = T.read(ss, postDir)
            gatePhrases
              .map { case (tag, p) =>
                R.phraseRank(post, p, topN = 20)
                  .select(
                    lit(bid).as("batch_id"), lit(tag).as("phrase"),
                    col("rk"), col("doc_id"), col("n"))
              }
              .reduce(_ unionAll _)
              .write.mode("overwrite").parquet(s"$ranksDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(ranksDir)
          .orderBy(col("batch_id"), col("phrase"), col("rk"))
      },
      Some(phraseCdcRanksOracleSql)
    ),
    // --------------------------------------------------------------- q265
    // ROLLBACK WITH CATCH-UP UNDER THE FULL CDC MATRIX — q261's ops
    // event composed into q260's deployment, the hardest rollback this
    // engine can face: every micro-batch simultaneously APPENDS
    // arrival slice b, RETRACTS standing slice b, and UPSERTS
    // content-update slice b through BOTH live indexes; the dense leg
    // swaps to the green generation at batch 2 (trained on the CDC
    // STATE as of batch 1 — membership minus retractions plus
    // arrivals, updates applied — with BOTH watermarks seeded at 1,
    // the swap firing BEFORE the batch's dense ops so CDC batches 2-3
    // land only in green); green regresses and batch 3 rolls back to
    // blue WITH INGEST CONTINUING. The catch-up must re-drive the
    // missed batches' TOMBSTONES as well as their appends — a
    // rollback that replayed only arrivals would resurrect every doc
    // retracted while green served and keep serving superseded
    // content (stale codes) next to fresh — and it does so through
    // the SAME applyBatch function the live stream uses (tombstones
    // first, fresh codes second, exactly-once per watermark), so the
    // catch-up path CANNOT drift from the live path. Gated pages:
    // batches 0-1 blue, batch 2 green, batch 3 blue over the full
    // shifted population with updates <= 3 applied — one resurrected
    // retraction, one missed re-encode, or one frozen arrival
    // anywhere fails the hash. At 100 TB: the catch-up is O(changed
    // rows of the missed batches) on the one lagging index; the
    // rollback stays zero-downtime on both legs.
    QueryDef(
      "q265_full_cdc_rollback",
      (s, dir) => {
        val S = graft.queries.SimilarityOps
        val R = graft.queries.RetrievalOps
        val T = graft.operators.TieredIndex
        val G = graft.operators.Generations
        val work = graft.Engine.scratchDir("q265", dir)
        graft.Engine.deleteRecursively(work)
        val docs = graft.Engine.table(s, dir, "documents")
        val emb = graft.Engine.table(s, dir, "embeddings")
        val uni = docs.join(
          emb.select(col("vec_id")), docs("doc_id") === col("vec_id"), "left_semi")
        val postDir = s"$work/postings"
        T.create(
          s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
          4, Seq(col("word"), col("doc_id")))
        val root = s"$work/ann"
        val iv = S.ivecs(s, dir)
        val day0 = iv.filter(col("vec_id") % 5 =!= 0)
        S.writeIvfAdcArtifacts(
          s, s"$root/gen-00000", day0, k = 16, rounds = 1,
          trainIv = Some(day0.filter(
            (col("vec_id") < 32 || col("vec_id") % 2 === 0) &&
              col("vec_id") % 5 =!= 3)))
        G.commit(root, "gen-00000", mark = -1L)
        val incoming = stageBatches(
          uni.filter(
            col("doc_id") % 5 === 0 || col("doc_id") % 5 === 1 ||
              col("doc_id") % 5 === 3)
            .select(col("doc_id"), col("text"))
            .withColumn(
              "op",
              when(col("doc_id") % 5 === 0, lit("add"))
                .when(col("doc_id") % 5 === 1, lit("del"))
                .otherwise(lit("upd"))),
          work.toString, expr("(doc_id div 5) % 4"), 4)
        val pagesDir = s"$work/pages"
        // the fixed request's DISTINCT terms as a driver-side literal
        // list, pulled ONCE per lifecycle (termsLiteral's bounded
        // 1-row fetch) — every batch's tf leg pushes `word IN (...)`
        // to the word-clustered postings scan instead of paying a
        // broadcast join that never reaches the scan
        val qWords = R.termsLiteral(docs
          .filter(col("doc_id") === 7)
          .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
        val q7 = iv
          .filter(col("vec_id") === 7)
          .select(col("vec_id").as("qid"), col("iv").as("qiv"))
          .localCheckpoint()
        def embAsOf(u: Long) = emb.withColumn(
          "embedding",
          when(
            col("vec_id") % 5 === 3 && expr("(vec_id div 5) % 4") <= u,
            reverse(col("embedding"))).otherwise(col("embedding")))
        // per-generation frozen-quantizer memo (read once per
        // generation — blue AND green — not once per batch)
        val quant = quantReader()
        val stream = s.readStream
          .schema(s.read.parquet(incoming).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(incoming)
        val query = stream.writeStream
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val ss = batch.sparkSession
            val adds = batch.filter(col("op") === "add")
            val dels = batch.filter(col("op") === "del")
            val upds = batch.filter(col("op") === "upd")
              .withColumn("text", concat(col("text"), lit(" graft refreshed revision")))
            // ONE dense CDC apply for the live path AND the catch-up:
            // batch b's staged rows (the retained source), tombstones
            // first, fresh codes second, exactly-once per watermark
            def applyDense(gen: String, b: Long): Unit = {
              val rows = ss.read.parquet(incoming)
                .filter(expr("(doc_id div 5) % 4") === b)
              val bDels = rows.filter(col("op") === "del")
              val bUpds = rows.filter(col("op") === "upd")
              val bAdds = rows.filter(col("op") === "add")
              T.delete(
                ss, s"$gen/codes",
                bDels.select(col("doc_id").as("vec_id"))
                  .unionAll(bUpds.select(col("doc_id").as("vec_id"))),
                batchId = b)
              if (b > T.lastBatch(s"$gen/codes")) {
                val addIv = iv.join(
                  broadcast(bAdds.select(col("doc_id").as("vec_id"))),
                  Seq("vec_id"), "left_semi")
                val updIv = S.toIv(emb
                  .join(
                    broadcast(bUpds.select(col("doc_id").as("vec_id"))),
                    Seq("vec_id"), "left_semi")
                  .withColumn("embedding", reverse(col("embedding"))))
                val (cc, cb) = quant(ss, gen)
                val enc = S.ivfadcEncode(addIv.unionByName(updIv), cc, cb)
                T.append(ss, s"$gen/codes", S.packCodes(enc), batchId = b)
              }
              T.maintain(ss, s"$gen/codes", Seq(col("ccid"), col("vec_id"))): Unit
            }
            // the LEXICAL leg runs CONCURRENTLY with the dense leg's
            // ordered retrain->apply->rollback sequence (disjoint
            // dirs, §2.6); the fence below waits for both
            legsInParallel {
              // LEXICAL: tombstones first, fresh postings second
              T.delete(
                ss, postDir,
                dels.select(col("doc_id")).unionAll(upds.select(col("doc_id"))),
                batchId = bid)
              if (bid > T.lastBatch(postDir))
                T.append(ss, postDir, R.postingsOf(adds.unionByName(upds)), batchId = bid)
              T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            } {
              // the mid-stream retrain fires BEFORE this batch's dense
              // ops: green trains on the CDC STATE as of batch 1, both
              // watermarks seeded there, and CDC batches 2-3 land ONLY
              // in green — the full-matrix gap the rollback must close
              if (bid == 2 && G.resolve(root).endsWith("gen-00000")) {
                graft.Engine.deleteRecursively(new java.io.File(s"$root/gen-00001"))
                val popPred =
                  (col("vec_id") % 5 === 2 || col("vec_id") % 5 === 3 ||
                    col("vec_id") % 5 === 4) ||
                    (col("vec_id") % 5 === 1 && expr("(vec_id div 5) % 4") > 1) ||
                    (col("vec_id") % 5 === 0 && expr("(vec_id div 5) % 4") <= 1)
                val ivState1 = S.toIv(embAsOf(1L)).filter(popPred)
                S.writeIvfAdcArtifacts(
                  ss, s"$root/gen-00001", ivState1, k = 16, rounds = 1,
                  trainIv = Some(ivState1.filter(
                    S.sampledTrainCol && col("vec_id") % 5 =!= 3)),
                  seedBatch = 1L, seedDeleteBatch = 1L)
                G.commit(root, "gen-00001", mark = bid)
              }
              applyDense(G.resolve(root), bid)
              // THE ROLLBACK EVENT at batch 3: the catch-up re-drives
              // the missed CDC batches — tombstones AND appends —
              // through the same applyDense, then moves the pointer
              if (bid == 3 && G.resolve(root).endsWith("gen-00001"))
                rollbackCatchUp(root, "gen-00000", upTo = bid, mark = bid)(applyDense)
            }
            // HYBRID page, fenced across the full matrix
            T.fenceAligned(postDir, s"${G.resolve(root)}/codes"): Unit
            val wL = org.apache.spark.sql.expressions.Window
              .orderBy(col("score").desc, col("doc_id"))
            val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
              .filter(col("doc_id") =!= 7)
              .orderBy(col("score").desc, col("doc_id"))
              .limit(20)
              .withColumn("lex_rk", row_number().over(wL).cast("long"))
              .select(col("doc_id"), col("lex_rk"))
            val vec = S
              .ivfadcServe(
                ss, G.resolve(root), q7, S.toIv(embAsOf(bid)), k = 16,
                candN = 32, topN = 20)
              .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
            R.rrfFuse(lex, vec)
              .select(
                lit(bid).as("batch_id"), col("rk"), col("doc_id"),
                col("rrf"), col("lex_rk"), col("vec_rk"))
              .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
          }
          .start()
        query.awaitTermination()
        s.read.option("recursiveFileLookup", "true").parquet(pagesDir)
          .orderBy(col("batch_id"), col("rk"))
      },
      Some(fullCdcRollbackOracleSql)
    )
  )

  /** Day-0 postings base + 4 exactly-once micro-batch postings appends
    * with LSM maintenance — the INGEST half of the incremental lexical
    * index, ONE definition site for q236 (which ranks the live index
    * mid-stream via `afterBatch`), q237/q243 (which replay the same
    * ingest under a widened retention window and answer post-hoc by
    * time travel), q246 (`postFn` = positionalPostingsOf — the same
    * segment lifecycle carrying a positions column; `afterCreate`
    * probes the day-0 base before any batch), and q248 (cached-epoch
    * serving). Returns the work dir; the store lives at
    * `work/postings`.
    */
  private def bm25StreamIngest(
      s: org.apache.spark.sql.SparkSession, dir: String, tag: String,
      policy: graft.operators.TieredIndex.Policy = graft.operators.TieredIndex.Policy(),
      postFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        graft.queries.RetrievalOps.postingsOf,
      afterCreate: (org.apache.spark.sql.SparkSession, String) => Unit = (_, _) => (),
      afterBatch: (org.apache.spark.sql.SparkSession, Long, String) => Unit = (_, _, _) => ())
      : String = {
    val T = graft.operators.TieredIndex
    val work = graft.Engine.scratchDir(tag, dir)
    graft.Engine.deleteRecursively(work)
    val docs = graft.Engine.table(s, dir, "documents")
    val store = s"$work/postings"
    T.create(
      s, store, postFn(docs.filter(col("doc_id") % 5 =!= 0)),
      4, Seq(col("word"), col("doc_id")))
    afterCreate(s, work.toString)
    val incoming = stageBatches(
      docs.filter(col("doc_id") % 5 === 0),
      work.toString, expr("(doc_id div 5) % 4"), 4)
    val stream = s.readStream
      .schema(s.read.parquet(incoming).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val query = stream.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ss = batch.sparkSession
        if (bid > T.lastBatch(store)) {
          T.append(ss, store, postFn(batch), batchId = bid)
          T.maintain(ss, store, Seq(col("word"), col("doc_id")), policy): Unit
        }
        afterBatch(ss, bid, work.toString)
      }
      .start()
    query.awaitTermination()
    work.toString
  }

  /** q250's dual-index hybrid deployment — ONE definition site for
    * q250 (one continuous run over all four arrival batches) and q262
    * (the SAME lifecycle split across a real STOP/RESTART: each
    * `phases` element stages its slices and runs a NEW streaming query
    * to completion against the ONE checkpoint dir, so the resumed
    * query must recover from the offsets log — micro-batch ids
    * continue where the previous query stopped, consumed files are
    * never re-read, and a replayed foreachBatch no-ops via the index
    * watermarks). Per batch: exactly-once postings + codes appends
    * with LSM maintenance, the cross-index serve fence, and the fixed
    * hybrid request's fused page into `<work>/pages`. Returns the
    * work dir.
    */
  private def hybridLiveIngest(
      s: org.apache.spark.sql.SparkSession, dir: String, tag: String,
      phases: Seq[Seq[Int]]): String = {
    val S = graft.queries.SimilarityOps
    val R = graft.queries.RetrievalOps
    val T = graft.operators.TieredIndex
    val work = graft.Engine.scratchDir(tag, dir)
    graft.Engine.deleteRecursively(work)
    val docs = graft.Engine.table(s, dir, "documents")
    val ids = graft.Engine.table(s, dir, "embeddings").select(col("vec_id"))
    // the hybrid universe: docs that BOTH legs can reach
    val uni = docs.join(ids, docs("doc_id") === ids("vec_id"), "left_semi")
    val postDir = s"$work/postings"
    T.create(
      s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
      4, Seq(col("word"), col("doc_id")))
    val iv = S.ivecs(s, dir)
    S.writeIvfAdcArtifacts(
      s, work.toString, iv.filter(col("vec_id") % 5 =!= 0), k = 16, rounds = 1)
    val codesDir = s"$work/codes"
    val arrivals = uni.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))
    val pagesDir = s"$work/pages"
    // hoisted request inputs (q218 rationale): the fixed query's
    // terms (a driver-side literal list — termsLiteral's bounded
    // 1-row fetch, so every batch's tf leg pushes `word IN (...)` to
    // the postings scan) and micro-vector are shared by all batches
    val qWords = R.termsLiteral(docs
      .filter(col("doc_id") === 7)
      .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
    val q7 = iv
      .filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      .localCheckpoint()
    // frozen-quantizer frames hoisted out of the per-batch loop: the
    // artifacts are immutable once written, and re-resolving them
    // every micro-batch re-lists the dir + re-reads footers on the
    // driver (lazy plans — each batch still reads the bytes at
    // execution, nothing caches data)
    val coarse = s.read.parquet(s"$work/coarse")
    val codebook = s.read.parquet(s"$work/codebook")
    for (slices <- phases) {
      val incoming = stageBatchSlices(
        arrivals, work.toString, expr("(doc_id div 5) % 4"), slices)
      val stream = s.readStream
        .schema(s.read.parquet(incoming).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming)
      val query = stream.writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
          val ss = batch.sparkSession
          // the two index legs run CONCURRENTLY (disjoint dirs, §2.6)
          legsInParallel {
            // LEXICAL upsert — exactly-once postings append + maintain
            if (bid > T.lastBatch(postDir)) {
              T.append(ss, postDir, R.postingsOf(batch), batchId = bid)
              T.maintain(ss, postDir, Seq(col("word"), col("doc_id"))): Unit
            }
          } {
            // VECTOR upsert — the batch's embeddings frozen-encode
            // against the day-0 quantizers (q210's contract)
            if (bid > T.lastBatch(codesDir)) {
              val arr = iv.join(
                broadcast(batch.select(col("doc_id").as("vec_id"))),
                Seq("vec_id"), "left_semi")
              val enc = S.ivfadcEncode(arr, coarse, codebook)
              T.append(ss, codesDir, S.packCodes(enc), batchId = bid)
              T.maintain(ss, codesDir, Seq(col("ccid"), col("vec_id"))): Unit
            }
          }
          // HYBRID serve of the two LIVE indexes this batch mutated —
          // behind the cross-index fence (both watermark pairs agree,
          // so the page can never fuse two different corpus states)
          T.fenceAligned(postDir, codesDir): Unit
          val wL = org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))
          val lex = R.bm25FromPostingsPushed(T.read(ss, postDir), qWords)
            .filter(col("doc_id") =!= 7)
            .orderBy(col("score").desc, col("doc_id"))
            .limit(20)
            .withColumn("lex_rk", row_number().over(wL).cast("long"))
            .select(col("doc_id"), col("lex_rk"))
          val vec = S.ivfadcServe(ss, work.toString, q7, iv, k = 16, candN = 32, topN = 20)
            .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
          R.rrfFuse(lex, vec)
            .select(
              lit(bid).as("batch_id"), col("rk"), col("doc_id"),
              col("rrf"), col("lex_rk"), col("vec_rk"))
            .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
        }
        .start()
      query.awaitTermination()
    }
    work.toString
  }

  /** q253's retrain-under-stream lifecycle — ONE definition site for
    * q253 (which gates the post-swap LIVE serves) and q256 (which
    * re-answers every batch POST-HOC via generation-aware time
    * travel): the BLUE generation (biased-half quantizers over the
    * day-0 standing population — the aged-codebook stand-in, q247's
    * convention) commits at mark -1 (= before the stream); 4 arrival
    * micro-batches append exactly-once to the LIVE generation's codes
    * index (resolved per batch) with LSM maintenance under `policy`;
    * at batch 2 the mid-stream retrain fires — sampled prefix-2
    * training (q226's membership), full re-encode, the fresh codes
    * index's watermark SEEDED at 2 so a replayed pre-swap batch
    * no-ops — and gen-00001 commits at mark 2: the swap, recorded in
    * the pointer history for [[graft.operators.Generations.resolveAsOf]].
    * The retrain guard reads the POINTER, not the dir listing: a
    * crash mid-retrain leaves an un-pointed orphan gen-00001 dir, and
    * a listing-based guard would skip the replayed retrain entirely
    * (serving forever from the old quantizers); the pointer only
    * moves at commit. Returns (work dir, generations root); when
    * `recordServes`, each post-swap batch's two-stage live serve
    * lands under `<work>/serves` (q253's gated observable).
    */
  private def retrainSwapIngest(
      s: org.apache.spark.sql.SparkSession, dir: String, tag: String,
      policy: graft.operators.TieredIndex.Policy,
      recordServes: Boolean): (String, String) = {
    val S = graft.queries.SimilarityOps
    val T = graft.operators.TieredIndex
    val G = graft.operators.Generations
    val work = graft.Engine.scratchDir(tag, dir)
    graft.Engine.deleteRecursively(work)
    val root = s"$work/ann"
    val iv = S.ivecs(s, dir)
    val day0 = iv.filter(col("vec_id") % 5 =!= 0)
    S.writeIvfAdcArtifacts(
      s, s"$root/gen-00000", day0, k = 16, rounds = 1,
      trainIv = Some(day0.filter(col("vec_id") < 32 || col("vec_id") % 2 === 0)))
    G.commit(root, "gen-00000", mark = -1L)
    val incoming = stageBatches(
      graft.Engine.table(s, dir, "embeddings").filter(col("vec_id") % 5 === 0),
      work.toString, expr("(vec_id div 5) % 4"), 4)
    val servesDir = s"$work/serves"
    val q = iv
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      .localCheckpoint()
    // per-generation frozen-quantizer memo (read once per generation,
    // not once per batch)
    val quant = quantReader()
    val stream = s.readStream
      .schema(s.read.parquet(incoming).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val query = stream.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ss = batch.sparkSession
        // append to the LIVE generation (resolved per batch — after
        // the swap this is gen-00001, whose seeded watermark makes a
        // replayed pre-swap batch a no-op)
        val cur = G.resolve(root)
        if (bid > T.lastBatch(s"$cur/codes")) {
          val (cc, cb) = quant(ss, cur)
          val enc = S.ivfadcEncode(S.toIv(batch), cc, cb)
          T.append(ss, s"$cur/codes", S.packCodes(enc), batchId = bid)
          T.maintain(ss, s"$cur/codes", Seq(col("ccid"), col("vec_id")), policy): Unit
        }
        if (bid == 2 && G.resolve(root).endsWith("gen-00000")) {
          // MID-STREAM RETRAIN: everything ingested so far; the
          // un-pointed orphan from a crashed attempt — overwrite
          graft.Engine.deleteRecursively(new java.io.File(s"$root/gen-00001"))
          val pop = iv.filter(
            col("vec_id") % 5 =!= 0 || expr("(vec_id div 5) % 4") <= 2)
          S.writeIvfAdcArtifacts(
            ss, s"$root/gen-00001", pop, k = 16, rounds = 1,
            trainIv = Some(pop.filter(S.sampledTrainCol)), seedBatch = bid)
          G.commit(root, "gen-00001", mark = bid)
        }
        if (recordServes && bid >= 2)
          S.ivfadcServe(ss, G.resolve(root), q, iv, k = 16)
            .select(
              lit(bid).as("batch_id"), col("qid"), col("rn"),
              col("vec_id"), col("d"))
            .write.mode("overwrite").parquet(s"$servesDir/b$bid")
      }
      .start()
    query.awaitTermination()
    (work.toString, root)
  }

  /** q257's dual-index retrain-under-hybrid lifecycle — ONE
    * definition site for q257 (which gates the LIVE per-batch hybrid
    * pages) and q259 (which re-derives every page POST-HOC through
    * the composed time-travel resolves): q250's dual-index CDC stream
    * (postings + codes, exactly-once, LSM maintenance under `policy`)
    * with q253's mid-stream sampled retrain + blue/green swap at
    * batch 2 (marks recorded in the pointer history) on the dense
    * leg, the lexical epoch stats cached per (postings watermark,
    * live generation) — the swap alone invalidates, the stale-epoch
    * bug class of this composition — and a hybrid RRF page served
    * after every batch into `<work>/pages`. Returns (work dir,
    * generations root).
    */
  private def hybridRetrainIngest(
      s: org.apache.spark.sql.SparkSession, dir: String, tag: String,
      policy: graft.operators.TieredIndex.Policy): (String, String) = {
    val S = graft.queries.SimilarityOps
    val R = graft.queries.RetrievalOps
    val T = graft.operators.TieredIndex
    val G = graft.operators.Generations
    val work = graft.Engine.scratchDir(tag, dir)
    graft.Engine.deleteRecursively(work)
    val docs = graft.Engine.table(s, dir, "documents")
    val ids = graft.Engine.table(s, dir, "embeddings").select(col("vec_id"))
    val uni = docs.join(ids, docs("doc_id") === ids("vec_id"), "left_semi")
    val postDir = s"$work/postings"
    T.create(
      s, postDir, R.postingsOf(uni.filter(col("doc_id") % 5 =!= 0)),
      4, Seq(col("word"), col("doc_id")))
    val root = s"$work/ann"
    val iv = S.ivecs(s, dir)
    val day0 = iv.filter(col("vec_id") % 5 =!= 0)
    S.writeIvfAdcArtifacts(
      s, s"$root/gen-00000", day0, k = 16, rounds = 1,
      trainIv = Some(day0.filter(col("vec_id") < 32 || col("vec_id") % 2 === 0)))
    G.commit(root, "gen-00000", mark = -1L)
    val incoming = stageBatches(
      uni.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")),
      work.toString, expr("(doc_id div 5) % 4"), 4)
    val pagesDir = s"$work/pages"
    // the fixed request's terms as a once-per-lifecycle driver-side
    // literal list: every batch's tf leg pushes `word IN (...)` to
    // the word-clustered postings scan (a broadcast-join restriction
    // never reaches the scan)
    val qWords = R.termsLiteral(docs
      .filter(col("doc_id") === 7)
      .select(explode(graft.queries.Tokenize.toksExpr).as("word")))
    val q7 = iv
      .filter(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
      .localCheckpoint()
    // the q248 epoch cache with the GENERATION in its key: dl and the
    // 1-row stats are recomputed only when (postings watermark, live
    // generation) moves — the swap alone is enough to invalidate,
    // which is exactly the stale-epoch bug class the composition
    // introduces
    var epochKey: (Long, String) = null
    var dlCache: org.apache.spark.sql.DataFrame = null
    var statsCache: org.apache.spark.sql.DataFrame = null
    // per-generation frozen-quantizer memo (read once per generation,
    // not once per batch)
    val quant = quantReader()
    val stream = s.readStream
      .schema(s.read.parquet(incoming).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(incoming)
    val query = stream.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val ss = batch.sparkSession
        // the two index legs run CONCURRENTLY (disjoint dirs, §2.6);
        // the retrain below waits for BOTH (batch-2's dense append
        // must land in blue before the swap)
        legsInParallel {
          // LEXICAL leg: appends straight through the swap
          if (bid > T.lastBatch(postDir)) {
            T.append(ss, postDir, R.postingsOf(batch), batchId = bid)
            T.maintain(ss, postDir, Seq(col("word"), col("doc_id")), policy): Unit
          }
        } {
          // DENSE leg: append to the LIVE generation
          val cur = G.resolve(root)
          if (bid > T.lastBatch(s"$cur/codes")) {
            val arrivals = iv.join(
              broadcast(batch.select(col("doc_id").as("vec_id"))),
              Seq("vec_id"), "left_semi")
            val (cc, cb) = quant(ss, cur)
            val enc = S.ivfadcEncode(arrivals, cc, cb)
            T.append(ss, s"$cur/codes", S.packCodes(enc), batchId = bid)
            T.maintain(ss, s"$cur/codes", Seq(col("ccid"), col("vec_id")), policy): Unit
          }
        }
        // the mid-stream retrain, pointer-guarded (q253's shape)
        if (bid == 2 && G.resolve(root).endsWith("gen-00000")) {
          graft.Engine.deleteRecursively(new java.io.File(s"$root/gen-00001"))
          val pop = iv.filter(
            col("vec_id") % 5 =!= 0 || expr("(vec_id div 5) % 4") <= 2)
          S.writeIvfAdcArtifacts(
            ss, s"$root/gen-00001", pop, k = 16, rounds = 1,
            trainIv = Some(pop.filter(S.sampledTrainCol)), seedBatch = bid)
          G.commit(root, "gen-00001", mark = bid)
        }
        // EPOCH BOUNDARY: refresh the cached lexical stats iff the
        // epoch key moved (postings watermark OR generation)
        val post = T.read(ss, postDir)
        val key = (T.lastBatch(postDir), new java.io.File(G.resolve(root)).getName)
        if (key != epochKey) {
          dlCache = post
            .groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
            .localCheckpoint()
          statsCache = R.statsOf(dlCache).localCheckpoint()
          epochKey = key
        }
        // HYBRID serve: cached-epoch BM25 + the live generation's
        // two-stage dense request, fused — behind the cross-index
        // fence (the live generation's codes must agree with the
        // postings on both watermark pairs before a page fuses them)
        T.fenceAligned(postDir, s"${G.resolve(root)}/codes"): Unit
        val wL = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))
        val tf = R.termTfPushed(post, qWords)
        val lex = R.bm25Score(tf, dlCache, statsCache)
          .filter(col("doc_id") =!= 7)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
          .withColumn("lex_rk", row_number().over(wL).cast("long"))
          .select(col("doc_id"), col("lex_rk"))
        val vec = S
          .ivfadcServe(ss, G.resolve(root), q7, iv, k = 16, candN = 32, topN = 20)
          .select(col("vec_id").as("doc_id"), col("rn").as("vec_rk"))
        R.rrfFuse(lex, vec)
          .select(
            lit(bid).as("batch_id"), col("rk"), col("doc_id"),
            col("rrf"), col("lex_rk"), col("vec_rk"))
          .write.mode("overwrite").parquet(s"$pagesDir/b$bid")
      }
      .start()
    query.awaitTermination()
    (work.toString, root)
  }

  /** ROLLBACK WITH CATCH-UP — the lifecycle arrow q254's pointer write
    * alone cannot serve under a LIVE stream (round-16 verdict #1):
    * ingest appends only to the LIVE generation, so after a mid-stream
    * swap the batches that landed in the new (green) generation are
    * MISSING from the rolled-back-to (blue) one — a bare rollback
    * would serve blue's codes index silently frozen at the swap. The
    * driver loop that closes the gap is exactly the machinery the
    * watermarks already provide: blue's `lastBatch` NAMES the first
    * missed batch, and each missed batch re-applies against BLUE
    * through the SAME `applyBatch` function the live stream uses on
    * the current generation (q261 re-encodes arrivals from the
    * retained staged source against blue's frozen quantizers; q265
    * replays the full add+retract+upsert matrix, tombstones first) —
    * exactly-once by construction, so a crashed catch-up resumes
    * where it stopped (the loop re-derives `from` from the watermark)
    * and a concurrent replay no-ops. The pointer only moves AFTER the
    * target is current (commit last): a reader that resolves the
    * rollback target never sees the frozen gap, and a crash
    * mid-catch-up leaves CURRENT on the abandoned generation — the
    * rollback simply re-runs. At 100 TB: the catch-up costs
    * O(missed batches) encodes — the price of the batches themselves,
    * paid once — while the swap stays O(1); this is the ops-runbook
    * event (bad retrain, roll back NOW, keep ingesting) the blue/
    * green machinery exists for (q261 gates it end to end).
    */
  private def rollbackCatchUp(
      root: String, target: String, upTo: Long, mark: Long)(
      applyBatch: (String, Long) => Unit): Unit = {
    val tgt = s"$root/$target"
    // the gap IS the target's watermark: (lastBatch, upTo] never
    // reached it — re-drive each batch with its original id through
    // the SAME per-batch apply the live stream uses (`applyBatch`
    // takes the generation dir + batch id and is internally
    // exactly-once against the index watermarks, so a crashed
    // catch-up resumes and an over-replayed batch no-ops; under CDC
    // the append and delete watermarks move in lockstep — every
    // batch commits both — so the append watermark names the gap for
    // both mutation kinds)
    val from = graft.operators.TieredIndex.lastBatch(s"$tgt/codes") + 1
    (from to upTo).foreach(b => applyBatch(tgt, b))
    // the pointer moves LAST: the rollback target is only resolvable
    // once it has caught up to the stream watermark
    graft.operators.Generations.commit(root, target, mark = mark)
  }

  /** The fixed keyword query's positioned top-5 over a postings frame
    * — q236's per-batch observable and q237's per-snapshot one (same
    * code object, so live and time-travel rankings cannot drift). The
    * terms go down as PUSHED LITERALS (`word IN (...)` reaches the
    * word-clustered index scan and row-group-prunes to the terms' key
    * ranges) — a broadcast-join restriction never reaches the scan.
    */
  private def bm25Top5(
      post: org.apache.spark.sql.DataFrame,
      words: Seq[String], bid: Long): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
    graft.queries.RetrievalOps.bm25FromPostingsPushed(post, words)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(5)
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(lit(bid).as("batch_id"), col("rk"), col("doc_id"), col("score"))
  }

  /** q236's oracle — per-batch PREFIX populations recomputed from
    * scratch through prefixed bm25Sql chains (batch b's searchable
    * population is the standing docs plus arrival slices 0..b, the
    * q214 prefix condition). Shared VERBATIM by q237: time travel must
    * reproduce exactly the mid-stream ranks — same string object, zero
    * drift. A def — eager interpolation rule.
    */
  private def bm25PrefixRanksOracleSql: String = {
    val termsCte = "SELECT unnest(['hash', 'join', 'spark']) AS word"
    val chains = (0 until 4).map { b =>
      s"""pop$b AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 5 <> 0 OR (doc_id // 5) % 4 <= $b),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", termsCte, s"p$b")}"""
    }.mkString(",\n             ")
    val unions = (0 until 4).map { b =>
      s"""SELECT CAST($b AS BIGINT) AS batch_id, CAST(rk AS BIGINT) AS rk, doc_id, score
             FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rk
               FROM p${b}scored) WHERE rk <= 5"""
    }.mkString("\n             UNION ALL\n             ")
    s"""WITH $chains
             $unions
             ORDER BY batch_id, rk"""
  }

  /** q246's oracle — the 2-token ("table hash") and 3-token ("slow
    * hash batch") phrases ranked by per-prefix-population recompute
    * FROM RAW TEXT (q242's adjacency chain, and the same chain
    * extended one token), for the day-0 base (batch -1) and each of
    * the 4 append prefixes: the live positional index must be
    * indistinguishable from re-tokenizing its population at every
    * point, for BOTH phrase arities. A def — eager interpolation rule.
    */
  private def phrasePrefixRanksOracleSql: String = {
    val toks = graft.queries.Tokenize.toksSql
    def popWhere(b: Int): String =
      if (b < 0) "doc_id % 5 <> 0"
      else s"doc_id % 5 <> 0 OR (doc_id // 5) % 4 <= $b"
    phraseRanksOracleSql(-1 to 3, b =>
      s"tl${phraseTag(b)} AS (SELECT doc_id, $toks AS toks FROM documents WHERE ${popWhere(b)})")
  }

  /** The two fixed gate phrases — ONE definition site for the engine
    * serves (q246/q264 rank both arities per batch) and the oracle
    * adjacency chains.
    */
  private def gatePhrases: Seq[(String, Seq[String])] =
    Seq(("bi", Seq("table", "hash")), ("tri", Seq("slow", "hash", "batch")))

  /** The content-update suffix the q264 upserts append — it CONTAINS
    * both gate phrases ("table hash" and "slow hash batch"), so a
    * superseded doc's surviving stale positions or a missed update
    * shifts the gated COUNTS, not merely membership. A def shared
    * with the oracle's `text || ' ...'` spelling.
    */
  private def phraseCdcSuffix: String = "graft table hash slow hash batch"

  /** The phrase-ranks oracle SKELETON shared by q246 (per-prefix
    * populations, day-0 probe included) and q264 (CDC populations
    * with retractions applied and updated text): `tlCtes(b)` supplies
    * batch b's tokenized-population CTE chain ending at
    * `tl{phraseTag(b)}`, and the skeleton replays both gate phrases'
    * adjacency chains (ex/ph/cnt per arity) and positioned top-20s
    * over it. A def — eager interpolation rule.
    */
  private def phraseRanksOracleSql(batches: Seq[Int], tlCtes: Int => String): String = {
    val chains = batches.map { b =>
      val t = phraseTag(b)
      val perPhrase = gatePhrases.map { case (tag, p) =>
        val cond = p.zipWithIndex
          .map { case (w, i) => s"t.toks[e.j${if (i == 0) "" else s" + $i"}] = '$w'" }
          .mkString(" AND ")
        s"""ex$tag$t AS (SELECT doc_id, unnest(generate_series(1, len(toks) - ${p.size - 1})) AS j
               FROM tl$t),
             ph$tag$t AS (SELECT e.doc_id FROM ex$tag$t e JOIN tl$t t USING (doc_id)
               WHERE $cond),
             cnt$tag$t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM ph$tag$t GROUP BY doc_id)"""
      }.mkString(",\n             ")
      s"""${tlCtes(b)},
             $perPhrase"""
    }.mkString(",\n             ")
    val unions = (for {
      b <- batches
      (tag, _) <- gatePhrases
    } yield {
      val t = phraseTag(b)
      s"""SELECT CAST($b AS BIGINT) AS batch_id, '$tag' AS phrase,
               CAST(rk AS BIGINT) AS rk, doc_id, n
             FROM (SELECT doc_id, n,
                 row_number() OVER (ORDER BY n DESC, doc_id) AS rk
               FROM cnt$tag$t) WHERE rk <= 20"""
    }).mkString("\n             UNION ALL\n             ")
    s"""WITH $chains
             $unions
             ORDER BY batch_id, phrase, rk"""
  }

  private def phraseTag(b: Int): String = if (b < 0) "m1" else b.toString

  /** q264's oracle — the phrase skeleton over CDC populations: batch
    * b's corpus is the standing classes (doc_id % 5 in {2, 3, 4})
    * minus retraction slices <= b (% 5 = 1 out) plus arrival slices
    * <= b (% 5 = 0 in), with the update slices' text suffixed (both
    * gate phrases gain an occurrence per applied update). A def —
    * eager interpolation rule.
    */
  private def phraseCdcRanksOracleSql: String = {
    val toks = graft.queries.Tokenize.toksSql
    def popWhere(b: Int): String =
      s"""((doc_id % 5 = 2 OR doc_id % 5 = 3 OR doc_id % 5 = 4)
                 OR (doc_id % 5 = 1 AND (doc_id // 5) % 4 > $b)
                 OR (doc_id % 5 = 0 AND (doc_id // 5) % 4 <= $b))"""
    def updWhen(b: Int): String = s"(doc_id % 5 = 3 AND (doc_id // 5) % 4 <= $b)"
    phraseRanksOracleSql(0 until 4, b =>
      s"""src$b AS (SELECT doc_id, CASE WHEN ${updWhen(b)}
                 THEN text || ' $phraseCdcSuffix' ELSE text END AS text
               FROM documents WHERE ${popWhere(b)}),
             tl$b AS (SELECT doc_id, $toks AS toks FROM src$b)""")
  }

  /** q248's oracle — per-batch PREFIX populations recomputed from
    * scratch for BOTH request term sets through prefixed bm25Sql
    * chains (kN = the 3-term keyword request, dN = the 2-term one):
    * serving from epoch-cached dl/stats must equal per-request
    * recompute at every epoch. A def — eager interpolation rule.
    */
  private def bm25EpochCachedOracleSql: String = {
    val sets = Seq(
      ("kw", "SELECT unnest(['hash', 'join', 'spark']) AS word", "k"),
      ("dt", "SELECT unnest(['data', 'stream']) AS word", "d"))
    val pops = (0 until 4).map { b =>
      s"""pop$b AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 5 <> 0 OR (doc_id // 5) % 4 <= $b)"""
    }
    val chains = for {
      b <- 0 until 4
      (_, termsCte, p) <- sets
    } yield graft.queries.RetrievalOps.bm25Sql(s"pop$b", termsCte, s"$p$b")
    val unions = (for {
      b <- 0 until 4
      (tag, _, p) <- sets
    } yield s"""SELECT CAST($b AS BIGINT) AS batch_id, '$tag' AS qset,
               CAST(rk AS BIGINT) AS rk, doc_id, score
             FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rk
               FROM $p${b}scored) WHERE rk <= 5""").mkString(
      "\n             UNION ALL\n             ")
    s"""WITH ${(pops ++ chains).mkString(",\n             ")}
             $unions
             ORDER BY batch_id, qset, rk"""
  }

  /** q253's oracle — the post-swap serves replayed: ONE sampled
    * training chain over the prefix-2 population (what the mid-stream
    * retrain saw: day-0 + arrival slices 0..2, restricted to the q226
    * deterministic sample), frozen encode covering every vector, and
    * per-batch two-stage serves (ADC top-16 -> exact re-rank -> top-3)
    * filtered to the prefix-b searchable population for b in {2, 3}.
    * ADC distances are population-independent, so one wadc serves both
    * prefixes. A def — eager interpolation rule.
    */
  private def streamRetrainSwapOracleSql: String = {
    val S = graft.queries.SimilarityOps
    val trainWhere =
      s"(vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= 2) AND (${S.sampledTrainWhereSql})"
    val perBatch = (2 to 3).map { b =>
      s"""l16$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM wadc WHERE vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= $b)
               WHERE rn <= 16),
             lrr$b AS (SELECT c.qid, c.vec_id,
                 list_sum(list_transform(generate_series(1, len(q.qiv)),
                   j -> (q.qiv[j] - x.iv[j]) * (q.qiv[j] - x.iv[j]))) AS d
               FROM l16$b c JOIN wq q ON c.qid = q.qid
               JOIN t x ON c.vec_id = x.vec_id)"""
    }.mkString(",\n             ")
    val unions = (2 to 3).map { b =>
      s"""SELECT CAST($b AS BIGINT) AS batch_id, qid, CAST(rn AS BIGINT) AS rn, vec_id,
               CAST(d AS BIGINT) AS d
             FROM (SELECT qid, vec_id, d,
                 row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rn
               FROM lrr$b) WHERE rn <= 3"""
    }.mkString("\n             UNION ALL\n             ")
    s"""${S.ivfadcSql(16, 1, trainWhere = trainWhere)},
             $perBatch
             $unions
             ORDER BY batch_id, qid, rn"""
  }

  /** q256's oracle — BOTH quantizer chains side by side (the
    * prefixed-CTE composition): the BLUE chain trains on the
    * biased half of the day-0 standing population (what gen-00000
    * froze), the GREEN chain (prefix `g`) on the sampled prefix-2
    * population (what the mid-stream retrain saw), and each batch's
    * positioned top-3 is served through the chain whose generation
    * was CURRENT at that batch — blue for batches 0-1 with prefix-b
    * populations, green for 2-3 — with the resolved generation name
    * as a gated literal. A def — eager interpolation rule.
    */
  private def generationTimeTravelOracleSql: String = {
    val S = graft.queries.SimilarityOps
    val blueTrain = "(vec_id % 5 <> 0) AND (vec_id < 32 OR vec_id % 2 = 0)"
    val greenTrain =
      s"(vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= 2) AND (${S.sampledTrainWhereSql})"
    def leg(b: Int, p: String, gen: String): (String, String) = {
      val ctes = s"""l16$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM ${p}wadc WHERE vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= $b)
               WHERE rn <= 16),
             lrr$b AS (SELECT c.qid, c.vec_id,
                 list_sum(list_transform(generate_series(1, len(q.qiv)),
                   j -> (q.qiv[j] - x.iv[j]) * (q.qiv[j] - x.iv[j]))) AS d
               FROM l16$b c JOIN ${p}wq q ON c.qid = q.qid
               JOIN ${p}t x ON c.vec_id = x.vec_id)"""
      val sel = s"""SELECT CAST($b AS BIGINT) AS batch_id, '$gen' AS gen, qid,
               CAST(rn AS BIGINT) AS rn, vec_id, CAST(d AS BIGINT) AS d
             FROM (SELECT qid, vec_id, d,
                 row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rn
               FROM lrr$b) WHERE rn <= 3"""
      (ctes, sel)
    }
    val legs = (0 until 4).map(b =>
      if (b < 2) leg(b, "", "gen-00000") else leg(b, "g", "gen-00001"))
    s"""${S.ivfadcSql(16, 1, trainWhere = blueTrain)},
             ${S.ivfadcSql(16, 1, trainWhere = greenTrain, p = "g", lead = false)},
             ${legs.map(_._1).mkString(",\n             ")}
             ${legs.map(_._2).mkString("\n             UNION ALL\n             ")}
             ORDER BY batch_id, qid, rn"""
  }

  /** q258's oracle — the original and the AS-UPDATED corpora side by
    * side: the lexical chains recompute BM25 per batch over `uni`
    * with the text suffix applied to updates <= b (so the moving
    * tf/df/dl/stats and the update-only 'refreshed' term are gated
    * with scores), and the dense legs merge TWO quantizer-identical
    * ADC chains — the original corpus (default prefix) and the
    * reversed-embedding corpus (prefix `u`, tSrc = emb2; training
    * EXCLUDES the updatable slice on both, so the frozen quantizers
    * are bit-identical and only the per-vector encode differs) —
    * picking each vec_id's row from the chain matching its as-of-b
    * state, with the exact re-rank against the same merged state.
    * A def — eager interpolation rule.
    */
  private def cdcUpsertLifecycleOracleSql: String = {
    val S = graft.queries.SimilarityOps
    val termsCte = "SELECT unnest(['refreshed', 'hash', 'join']) AS word"
    def upd(idc: String, b: Int): String =
      s"($idc % 7 = 3 AND ($idc // 7) % 4 <= $b)"
    val perBatch = (0 until 4).map { b =>
      s"""pop$b AS (SELECT doc_id,
                 CASE WHEN ${upd("doc_id", b)}
                   THEN text || ' graft refreshed revision' ELSE text END AS text
               FROM uni),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", termsCte, s"x$b")},
             adc$b AS (SELECT qid, vec_id, ad FROM uwadc
                 WHERE qid = 7 AND ${upd("vec_id", b)}
               UNION ALL
               SELECT qid, vec_id, ad FROM wadc
                 WHERE qid = 7 AND NOT ${upd("vec_id", b)}),
             l32$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM adc$b) WHERE rn <= 32),
             tb$b AS (SELECT vec_id, iv FROM ut WHERE ${upd("vec_id", b)}
               UNION ALL SELECT vec_id, iv FROM t WHERE NOT ${upd("vec_id", b)}),
             lrr$b AS (SELECT c.qid, c.vec_id,
                 list_sum(list_transform(generate_series(1, len(q.qiv)),
                   j -> (q.qiv[j] - x.iv[j]) * (q.qiv[j] - x.iv[j]))) AS d
               FROM l32$b c JOIN wq q ON c.qid = q.qid
               JOIN tb$b x ON c.vec_id = x.vec_id)"""
    }.mkString(",\n             ")
    val unions = (0 until 4).flatMap { b =>
      Seq(
        s"""SELECT CAST($b AS BIGINT) AS batch_id, 'lex' AS leg,
               CAST(rk AS BIGINT) AS rk, doc_id, score, CAST(NULL AS BIGINT) AS d
             FROM (SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rk
               FROM x${b}scored) WHERE rk <= 10""",
        s"""SELECT CAST($b AS BIGINT) AS batch_id, 'vec' AS leg,
               CAST(rk AS BIGINT) AS rk, vec_id AS doc_id,
               CAST(NULL AS DOUBLE) AS score, CAST(d AS BIGINT) AS d
             FROM (SELECT vec_id, d,
                 row_number() OVER (ORDER BY d, vec_id) AS rk
               FROM lrr$b) WHERE rk <= 10""")
    }.mkString("\n             UNION ALL\n             ")
    s"""${S.ivfadcSql(16, 1, trainWhere = "vec_id % 7 <> 3")},
             emb2 AS (SELECT vec_id,
                 CASE WHEN vec_id % 7 = 3 THEN list_reverse(embedding)
                   ELSE embedding END AS embedding
               FROM embeddings),
             ${S.ivfadcSql(
        16, 1, trainWhere = "vec_id % 7 <> 3", p = "u", lead = false,
        tSrc = "emb2")},
             uni AS (SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             $perBatch
             $unions
             ORDER BY batch_id, leg, rk"""
  }

  // ---- the q250-family hybrid-page oracle fragments: ONE definition
  // site for the per-batch CTEs every hybrid gate shares
  // (q250/q255/q257/q259/q260 differ only in their population
  // predicates and in WHICH quantizer chain feeds the candidates —
  // the lex page, the exact re-rank join, the RRF fusion tail, and
  // the gated page row must never fork between them).

  /** The sparse leg's positioned top-20 over `x{b}scored` (the
    * bm25Sql chain's output), query doc excluded.
    */
  private def hybridLexCte(b: Int): String =
    s"""lex$b AS (SELECT doc_id, lex_rk FROM (
                 SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rk
                 FROM x${b}scored WHERE doc_id <> 7)
               WHERE lex_rk <= 20)"""

  /** The exact-integer re-rank distances of candidate set `l32{b}`
    * against corpus `tRel` and query batch `wqRel`.
    */
  private def hybridRerankCte(b: Int, tRel: String = "t", wqRel: String = "wq"): String =
    s"""lrr$b AS (SELECT c.qid, c.vec_id,
                 list_sum(list_transform(generate_series(1, len(q.qiv)),
                   j -> (q.qiv[j] - x.iv[j]) * (q.qiv[j] - x.iv[j]))) AS d
               FROM l32$b c JOIN $wqRel q ON c.qid = q.qid
               JOIN $tRel x ON c.vec_id = x.vec_id)"""

  /** The dense top-20 from `lrr{b}` and the RRF fusion tail ending at
    * `fr{b}` (rk-positioned page rows).
    */
  private def hybridFuseCtes(b: Int): String =
    s"""vec$b AS (SELECT vec_id AS doc_id, vec_rk FROM (
                 SELECT vec_id, row_number() OVER (ORDER BY d, vec_id) AS vec_rk
                 FROM lrr$b) WHERE vec_rk <= 20),
             fused$b AS (SELECT coalesce(lex$b.doc_id, vec$b.doc_id) AS doc_id,
                 lex$b.lex_rk, vec$b.vec_rk,
                 round(coalesce(CAST(1 AS DOUBLE) / (lex$b.lex_rk + 60), 0)
                   + coalesce(CAST(1 AS DOUBLE) / (vec$b.vec_rk + 60), 0), 6) AS rrf
               FROM lex$b FULL OUTER JOIN vec$b ON lex$b.doc_id = vec$b.doc_id),
             fr$b AS (SELECT doc_id, rrf, lex_rk, vec_rk,
               row_number() OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused$b)"""

  /** Batch `b`'s gated top-10 page row over `fr{b}`. */
  private def hybridPageRowSql(b: Int): String =
    s"""SELECT CAST($b AS BIGINT) AS batch_id, CAST(rk AS BIGINT) AS rk, doc_id, rrf,
               CAST(lex_rk AS BIGINT) AS lex_rk, CAST(vec_rk AS BIGINT) AS vec_rk
             FROM fr$b WHERE rk <= 10"""

  /** q260's oracle — FOUR quantizer chains (blue/green generations x
    * original/updated content, all via the prefixed-CTE + tSrc
    * composition): training rows exclude the updatable class on every
    * chain, so each generation's quantizers are bit-identical across
    * its two content chains, and every vector's ADC row is picked
    * from the chain matching its as-of-b generation (blue for
    * batches 0-1, green for 2-3) and content version (updated iff its
    * update slice <= b). The sparse legs recompute BM25 per batch
    * over the shifting population (arrivals in, retractions out,
    * updates' text applied), the exact re-rank reads the as-of-b
    * merged corpus, and each batch's RRF fusion is replayed. A def —
    * eager interpolation rule.
    */
  private def hybridFullCdcRetrainOracleSql: String =
    hybridFullCdcOracleSql(
      greenPrefix = 2, chainOf = b => if (b < 2) ("", "v") else ("g", "h"))

  /** q265's oracle — the full-matrix skeleton with the ROLLBACK's
    * chain map: green trains on the CDC STATE as of batch 1
    * (membership minus retraction slices > 1 plus arrival slices
    * <= 1; training excludes the updatable class, so content state is
    * immaterial to the frozen quantizers) and serves ONLY batch 2's
    * page; batches 0-1 AND 3 ride the blue chains — batch 3 over the
    * full shifted population with updates <= 3 applied, which only
    * holds if the catch-up re-drove BOTH the missed tombstones and
    * the missed appends into blue. A def — eager interpolation rule.
    */
  private def fullCdcRollbackOracleSql: String =
    hybridFullCdcOracleSql(
      greenPrefix = 1, chainOf = b => if (b == 2) ("g", "h") else ("", "v"))

  /** The q260-family oracle SKELETON (one definition site for q260
    * and q265): FOUR quantizer chains (blue/green x original/updated
    * content), the green pair trained on the CDC state as of batch
    * `greenPrefix`, each batch's dense rows picked from the chain
    * pair `chainOf(b)` = (original-content prefix, updated-content
    * prefix). Defaults preserve the pre-round-17 q260 oracle text
    * verbatim.
    */
  private def hybridFullCdcOracleSql(
      greenPrefix: Int, chainOf: Int => (String, String)): String = {
    val S = graft.queries.SimilarityOps
    val terms = "SELECT DISTINCT unnest(" + graft.queries.Tokenize.toksSql +
      ") AS word FROM documents WHERE doc_id = 7"
    def pop(v: String, b: Int): String =
      s"""(($v % 5 = 2 OR $v % 5 = 3 OR $v % 5 = 4)
                 OR ($v % 5 = 1 AND ($v // 5) % 4 > $b)
                 OR ($v % 5 = 0 AND ($v // 5) % 4 <= $b))"""
    def upd(v: String, b: Int): String =
      s"($v % 5 = 3 AND ($v // 5) % 4 <= $b)"
    val blueTrain =
      "(vec_id % 5 <> 0) AND (vec_id % 5 <> 3) AND (vec_id < 32 OR vec_id % 2 = 0)"
    val greenTrain =
      s"${pop("vec_id", greenPrefix)} AND (vec_id % 5 <> 3) AND (${S.sampledTrainWhereSql})"
    val perBatch = (0 until 4).map { b =>
      val (po, pu) = chainOf(b)
      s"""pop$b AS (SELECT doc_id,
                 CASE WHEN ${upd("doc_id", b)}
                   THEN text || ' graft refreshed revision' ELSE text END AS text
               FROM uni WHERE ${pop("doc_id", b)}),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", terms, s"x$b")},
             ${hybridLexCte(b)},
             adc$b AS (SELECT qid, vec_id, ad FROM ${pu}wadc
                 WHERE qid = 7 AND ${pop("vec_id", b)} AND ${upd("vec_id", b)}
               UNION ALL
               SELECT qid, vec_id, ad FROM ${po}wadc
                 WHERE qid = 7 AND ${pop("vec_id", b)} AND NOT ${upd("vec_id", b)}),
             l32$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM adc$b) WHERE rn <= 32),
             tb$b AS (SELECT vec_id, iv FROM vt WHERE ${upd("vec_id", b)}
               UNION ALL SELECT vec_id, iv FROM t WHERE NOT ${upd("vec_id", b)}),
             ${hybridRerankCte(b, tRel = s"tb$b")},
             ${hybridFuseCtes(b)}"""
    }.mkString(",\n             ")
    val unions = (0 until 4).map(hybridPageRowSql)
      .mkString("\n             UNION ALL\n             ")
    s"""${S.ivfadcSql(16, 1, trainWhere = blueTrain)},
             emb2 AS (SELECT vec_id,
                 CASE WHEN vec_id % 5 = 3 THEN list_reverse(embedding)
                   ELSE embedding END AS embedding
               FROM embeddings),
             ${S.ivfadcSql(
        16, 1, trainWhere = blueTrain, p = "v", lead = false, tSrc = "emb2")},
             ${S.ivfadcSql(16, 1, trainWhere = greenTrain, p = "g", lead = false)},
             ${S.ivfadcSql(
        16, 1, trainWhere = greenTrain, p = "h", lead = false, tSrc = "emb2")},
             uni AS (SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             $perBatch
             $unions
             ORDER BY batch_id, rk"""
  }

  /** q250's oracle — four per-prefix hybrid pages: each batch's sparse
    * leg is a full BM25 recompute over the prefix population (prefixed
    * bm25Sql chains over the hybrid universe), its dense leg the
    * day-0-trained ADC chain filtered to the prefix population (frozen
    * encode => ADC distances are population-independent, so ONE wadc
    * serves all four prefixes), top-32 -> exact re-rank -> top-20, and
    * the RRF fusion replayed per batch. A def — eager interpolation
    * rule.
    */
  private def hybridLiveServeOracleSql: String = {
    val terms = "SELECT DISTINCT unnest(" + graft.queries.Tokenize.toksSql +
      ") AS word FROM documents WHERE doc_id = 7"
    val perBatch = (0 until 4).map { b =>
      s"""pop$b AS (SELECT doc_id, text FROM uni
               WHERE doc_id % 5 <> 0 OR (doc_id // 5) % 4 <= $b),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", terms, s"x$b")},
             ${hybridLexCte(b)},
             l32$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM wadc WHERE qid = 7
                 AND (vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= $b)) WHERE rn <= 32),
             ${hybridRerankCte(b)},
             ${hybridFuseCtes(b)}"""
    }.mkString(",\n             ")
    val unions = (0 until 4).map(hybridPageRowSql)
      .mkString("\n             UNION ALL\n             ")
    s"""${graft.queries.SimilarityOps.ivfadcSql(16, 1, trainWhere = "vec_id % 5 <> 0")},
             uni AS (SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             $perBatch
             $unions
             ORDER BY batch_id, rk"""
  }

  /** q257's oracle — q250's per-prefix hybrid replay with the dense
    * leg SWITCHING CHAINS at the swap batch: the sparse legs are the
    * prefixed bm25Sql recomputes over each growing population (so a
    * cached-but-stale epoch stat fails the hash), the dense legs for
    * batches 0-1 ride the BLUE chain (biased-half day-0 training)
    * and for batches 2-3 the GREEN chain (sampled prefix-2 training,
    * prefix `g` — the two complete quantizer chains coexist via the
    * prefixed-CTE composition), each filtered to its batch's
    * population, and every batch's RRF fusion is replayed. A def —
    * eager interpolation rule.
    */
  private def hybridRetrainSwapOracleSql: String =
    hybridGenerationSwapOracleSql(
      greenPrefix = 2, chainOf = b => if (b < 2) "" else "g")

  /** q261's oracle — the same skeleton with the ROLLBACK's chain map:
    * the green generation trains on the prefix-1 population (the swap
    * fires before batch 2's append) and serves ONLY batch 2's page;
    * batches 0-1 AND 3 ride the blue chain — batch 3 over the FULL
    * prefix-3 population, which is precisely the catch-up's gated
    * claim (a blue codes index frozen at the swap would miss every
    * batch-2/3 arrival). A def — eager interpolation rule.
    */
  private def rollbackCatchUpOracleSql: String =
    hybridGenerationSwapOracleSql(
      greenPrefix = 1, chainOf = b => if (b == 2) "g" else "")

  /** The q257-family oracle SKELETON (one definition site for q257/
    * q259 and q261): per-batch prefix populations replayed through
    * prefixed bm25Sql chains, the dense leg riding the quantizer
    * chain `chainOf(b)` ("" = the blue biased-half day-0 chain, "g" =
    * the green chain trained on the sampled prefix-`greenPrefix`
    * population), and every batch's RRF fusion replayed. Defaults
    * preserve the pre-round-17 q257 oracle text verbatim.
    */
  private def hybridGenerationSwapOracleSql(
      greenPrefix: Int, chainOf: Int => String): String = {
    val S = graft.queries.SimilarityOps
    val terms = "SELECT DISTINCT unnest(" + graft.queries.Tokenize.toksSql +
      ") AS word FROM documents WHERE doc_id = 7"
    val blueTrain = "(vec_id % 5 <> 0) AND (vec_id < 32 OR vec_id % 2 = 0)"
    val greenTrain =
      s"(vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= $greenPrefix) AND (${S.sampledTrainWhereSql})"
    val perBatch = (0 until 4).map { b =>
      val p = chainOf(b)
      s"""pop$b AS (SELECT doc_id, text FROM uni
               WHERE doc_id % 5 <> 0 OR (doc_id // 5) % 4 <= $b),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", terms, s"x$b")},
             ${hybridLexCte(b)},
             l32$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM ${p}wadc WHERE qid = 7
                 AND (vec_id % 5 <> 0 OR (vec_id // 5) % 4 <= $b)) WHERE rn <= 32),
             ${hybridRerankCte(b, tRel = s"${p}t", wqRel = s"${p}wq")},
             ${hybridFuseCtes(b)}"""
    }.mkString(",\n             ")
    val unions = (0 until 4).map(hybridPageRowSql)
      .mkString("\n             UNION ALL\n             ")
    s"""${S.ivfadcSql(16, 1, trainWhere = blueTrain)},
             ${S.ivfadcSql(16, 1, trainWhere = greenTrain, p = "g", lead = false)},
             uni AS (SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             $perBatch
             $unions
             ORDER BY batch_id, rk"""
  }

  /** q255's oracle — q250's four per-prefix hybrid replays with the
    * populations COMPOSED from arrivals and retractions (q227's
    * condition, hybrid edition): after batch b the servable corpus is
    * the standing docs minus retraction slices <= b plus arrival
    * slices <= b. The sparse legs recompute full BM25 chains over
    * each shrink-and-grow population (so the MOVING N/avgdl/df are
    * gated at every batch), the dense legs filter the one
    * population-independent ADC table (frozen encode — deletes never
    * re-encode survivors), and each batch's RRF fusion is replayed.
    * A def — eager interpolation rule.
    */
  private def hybridCdcRetractOracleSql: String = {
    val terms = "SELECT DISTINCT unnest(" + graft.queries.Tokenize.toksSql +
      ") AS word FROM documents WHERE doc_id = 7"
    def popWhere(idc: String, b: Int): String =
      s"""(($idc % 5 <> 0 AND $idc % 5 <> 1)
                 OR ($idc % 5 = 0 AND ($idc // 5) % 4 <= $b)
                 OR ($idc % 5 = 1 AND ($idc // 5) % 4 > $b))"""
    val perBatch = (0 until 4).map { b =>
      s"""pop$b AS (SELECT doc_id, text FROM uni
               WHERE ${popWhere("doc_id", b)}),
             ${graft.queries.RetrievalOps.bm25Sql(s"pop$b", terms, s"x$b")},
             ${hybridLexCte(b)},
             l32$b AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
                 row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn
               FROM wadc WHERE qid = 7
                 AND ${popWhere("vec_id", b)}) WHERE rn <= 32),
             ${hybridRerankCte(b)},
             ${hybridFuseCtes(b)}"""
    }.mkString(",\n             ")
    val unions = (0 until 4).map(hybridPageRowSql)
      .mkString("\n             UNION ALL\n             ")
    s"""${graft.queries.SimilarityOps.ivfadcSql(16, 1, trainWhere = "vec_id % 5 <> 0")},
             uni AS (SELECT d.doc_id, d.text FROM documents d
               WHERE d.doc_id IN (SELECT vec_id FROM embeddings)),
             $perBatch
             $unions
             ORDER BY batch_id, rk"""
  }
}
