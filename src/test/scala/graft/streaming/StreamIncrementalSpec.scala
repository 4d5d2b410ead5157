package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q174 — streaming incremental dedup: beyond the oracle gate (which
  * pins the survivor SET), this pins the three properties that make it
  * the ingest-time shape rather than a replayed batch job:
  *   1. the replay really is incremental — multiple micro-batches ran
  *     (one per staged range file), visible as checkpoint offsets;
  *   2. the index is CUMULATIVE — after the run it holds exactly the
  *     day-0 history hashes plus the survivors' new hashes (each
  *     micro-batch appended its own delta);
  *   3. the three execution shapes agree — the stream's survivors
  *     equal q126's recompute-the-world batch form row for row.
  */
class StreamIncrementalSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.Engine.session("test")

  test("q174: multi-batch replay, cumulative index, batch-equal survivors") {
    val survivors =
      graft.SparkEntry.queries("q174_stream_incremental_dedup")(spark, dir).collect()

    // same JVM, same per-process token: this resolves to the exact dir
    // the query just used (a hand-built path would silently pin a stale
    // leftover from an earlier process — the pre-token naming did)
    val work = graft.Engine.scratchDir("q174", dir)

    // 1. incremental: one committed offset file per micro-batch
    val batches = new java.io.File(s"$work/ckpt/commits")
      .listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected a multi-batch replay, saw $batches micro-batch(es)")

    // 2. cumulative index = day-0 history hashes + survivors' hashes
    val docs = graft.Engine.table(spark, dir, "documents").withColumn("h", md5(col("text")))
    val histHashes =
      docs.filter(col("doc_id") % 5 =!= 0).select(col("h")).distinct().collect().map(_.getString(0)).toSet
    val survIds = survivors.map(_.getLong(0)).toSet
    val survHashes = docs
      .filter(col("doc_id").isin(survIds.toSeq: _*))
      .select(col("h")).distinct().collect().map(_.getString(0)).toSet
    val indexed = graft.operators.TieredIndex
      .read(spark, s"$work/hash_index").collect().map(_.getString(0)).toSet
    assert(indexed == histHashes ++ survHashes,
      s"index drifted: ${indexed.size} entries vs ${(histHashes ++ survHashes).size} expected")
    // every survivor's hash was genuinely NEW to the index at arrival
    assert(survHashes.intersect(histHashes).isEmpty)

    // 2b. MAINTENANCE CYCLE: the per-batch delta appends were folded by
    // the size/tier-aware policy (per-batch maintain + end-of-window
    // force), so despite >= 2 appending micro-batches the CURRENT
    // generation sits at a bounded file count, and WITHIN each sorted
    // segment the per-file key ranges are DISJOINT — the stats-pruning
    // layout the day-0 base had, preserved per tier. (The content
    // assertion above is the result-equivalence half: the tiered index
    // dedups identically.)
    val idxFiles = graft.operators.TieredIndex.currentFiles(s"$work/hash_index")
    assert(idxFiles.length <= 8,
      s"index deltas were never compacted: ${idxFiles.length} files")
    graft.operators.TieredIndex.currentSegments(s"$work/hash_index").foreach {
      case (_, segPath) =>
        val ranges = spark.read
          .parquet(segPath)
          .select(col("h"), input_file_name().as("f"))
          .groupBy(col("f"))
          .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
          .collect()
          .map(r => (r.getString(1), r.getString(2)))
          .sortBy(_._1)
        ranges.sliding(2).foreach {
          case Array((_, hi1), (lo2, _)) =>
            assert(hi1 < lo2, s"segment $segPath file ranges overlap: $hi1 >= $lo2")
          case _ =>
        }
    }

    // 3. stream == batch: same survivors as q126's recompute form
    val batch = graft.SparkEntry.queries("q126_incremental_dedup")(spark, dir).collect()
    assert(survivors.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
  }

  test("q176: fuzzy tier is load-bearing and its bucket index is cumulative") {
    val fuzzy =
      graft.SparkEntry.queries("q176_stream_fuzzy_dedup")(spark, dir).collect()
    val exact =
      graft.SparkEntry.queries("q174_stream_incremental_dedup")(spark, dir).collect()
    // Among docs LONG ENOUGH TO SHINGLE, near-dup banding can only drop
    // MORE than exact-hash dedup (identical texts share every band
    // bucket). Docs under 3 tokens have no buckets and pass the fuzzy
    // tier BY DESIGN even when exact dedup drops them as literal
    // duplicates — so the subset claim is scoped to shingleable docs.
    val shingleable = graft.Engine
      .table(spark, dir, "documents")
      .select(col("doc_id"), graft.queries.Tokenize.toksExpr.as("toks"))
      .filter(size(col("toks")) >= 3)
      .collect().map(_.getLong(0)).toSet
    val fuzzyIds = fuzzy.map(_.getLong(0)).toSet
    val exactIds = exact.map(_.getLong(0)).toSet
    assert(fuzzyIds.intersect(shingleable).subsetOf(exactIds),
      "fuzzy kept a shingleable doc exact-dedup dropped")
    assert(fuzzyIds.size < exactIds.size, "fuzzy tier dropped nothing — vacuous")

    val work = graft.Engine.scratchDir("q176", dir)
    // multi-batch replay
    val batches = new java.io.File(s"$work/ckpt/commits")
      .listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected a multi-batch replay, saw $batches micro-batch(es)")
    // cumulative index: after the run it holds every distinct band
    // bucket of the WHOLE corpus (history + all arrivals, dropped docs
    // included — the "any earlier doc" contract)
    val idx = graft.operators.TieredIndex
      .read(spark, s"$work/bucket_index").collect().map(_.getString(0)).toSet
    val sig = graft.Engine
      .table(spark, dir, "documents")
      .select(col("doc_id"), graft.queries.Tokenize.toksExpr.as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(graft.functions.TextHashOps
        .minhashSig(array_distinct(graft.functions.TextHashOps.gramsText(col("toks"), 3)), 8)
        .as("sig"))
      .select(explode(expr(
        """array(md5(concat(sig[0], sig[1])), md5(concat(sig[2], sig[3])),
                 md5(concat(sig[4], sig[5])), md5(concat(sig[6], sig[7])))""")).as("bucket"))
      .collect().map(_.getString(0)).toSet
    assert(idx == sig, s"index ${idx.size} buckets vs ${sig.size} expected")
    // maintenance cycle holds the bounded steady-state layout
    val nIdxFiles = graft.operators.TieredIndex.currentFiles(s"$work/bucket_index").length
    assert(nIdxFiles <= 8, s"bucket index never compacted: $nIdxFiles files")
  }

  test("q181: ingest recipe — multi-batch, gate-consistent, cumulative clean-hash index") {
    val survivors =
      graft.SparkEntry.queries("q181_stream_ingest_recipe")(spark, dir).collect()
    assert(survivors.nonEmpty)

    val work = graft.Engine.scratchDir("q181", dir)
    // multi-batch replay
    val batches = new java.io.File(s"$work/ckpt/commits")
      .listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected a multi-batch replay, saw $batches micro-batch(es)")

    // survivors are exactly gated arrivals minus clean-hash collisions:
    // every survivor must appear in ingestGate's output for the arriving
    // slice, with identical gate metrics (the stream runs the SAME code)
    val gated = graft.queries.CurationOps
      .ingestGate(graft.Engine.table(spark, dir, "documents").filter(col("doc_id") % 5 === 0))
      .collect()
      .map(r => r.getLong(0) -> r.toSeq.init) // drop cm for the compare
      .toMap
    survivors.foreach { r =>
      val id = r.getLong(0)
      assert(gated.contains(id), s"survivor $id not in the batch gate output")
      assert(gated(id) == r.toSeq, s"gate metrics drifted for $id")
    }

    // cumulative index = day-0 gate-survivor hashes + arrival survivors'
    val histCm = graft.queries.CurationOps
      .ingestGate(graft.Engine.table(spark, dir, "documents").filter(col("doc_id") % 5 =!= 0))
      .select(col("cm")).distinct().collect().map(_.getString(0)).toSet
    val survIds = survivors.map(_.getLong(0)).toSet
    val survCm = graft.queries.CurationOps
      .ingestGate(graft.Engine.table(spark, dir, "documents").filter(col("doc_id") % 5 === 0))
      .filter(col("doc_id").isin(survIds.toSeq: _*))
      .select(col("cm")).distinct().collect().map(_.getString(0)).toSet
    val idx = graft.operators.TieredIndex
      .read(spark, s"$work/clean_hash_index").collect().map(_.getString(0)).toSet
    assert(idx == histCm ++ survCm,
      s"index drifted: ${idx.size} entries vs ${(histCm ++ survCm).size} expected")
    assert(survCm.intersect(histCm).isEmpty)
    // maintenance cycle holds the bounded steady-state layout
    val nIdxFiles = graft.operators.TieredIndex.currentFiles(s"$work/clean_hash_index").length
    assert(nIdxFiles <= 8, s"clean-hash index never compacted: $nIdxFiles files")
    graft.Engine.releaseScratch(spark)
  }

  test("q210: frozen quantizers, complete cumulative codes index, searchable arrivals, replay no-op") {
    val result = graft.SparkEntry.queries("q210_ivfadc_stream_append")(spark, dir).collect()
    val work = graft.Engine.scratchDir("q210", dir)
    val codesDir = s"$work/codes"

    // 1. incremental: one committed offset per staged range file
    val batches = new java.io.File(s"$work/ckpt/commits")
      .listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 2, s"expected a multi-batch replay, saw $batches micro-batch(es)")

    // 2. the quantizers are FROZEN on the day-0 population: every coarse
    // cell is a base vector (vec_id < 16 AND % 5 <> 0 — arrivals 0/5/10/15
    // must never become cells), so ingest cannot have retrained anything
    val cells = spark.read.parquet(s"$work/coarse")
      .collect().map(_.getLong(0)).sorted
    assert(cells.sameElements((0L until 16L).filter(_ % 5 != 0)), cells.mkString(","))

    // 3. the codes index is complete and duplicate-free: one code per
    // corpus vector — day-0 base codes plus exactly the arrivals
    val n = graft.Engine.table(spark, dir, "embeddings").count()
    val idx = graft.operators.TieredIndex.read(spark, codesDir)
    assert(idx.count() == n, s"codes index holds ${idx.count()} of $n vectors")
    assert(idx.select(col("vec_id")).distinct().count() == n, "duplicate codes in the index")

    // 4. arrivals are SEARCHABLE: the gated probe output must rank some
    // appended vector (vec_id % 5 = 0, not a query id) as a neighbor —
    // the property that makes this ingest, not archival
    assert(result.exists(r => r.getLong(2) % 5 == 0), "no appended vector ever surfaced as a neighbor")

    // 5. exactly-once: replaying an already-committed batchId is a no-op
    // (segment list and row count unchanged)
    val before = graft.operators.TieredIndex.currentFiles(codesDir).map(_.getName).sorted.toSeq
    graft.operators.TieredIndex.append(
      spark, codesDir,
      idx.limit(5),
      batchId = graft.operators.TieredIndex.lastBatch(codesDir))
    assert(graft.operators.TieredIndex.currentFiles(codesDir).map(_.getName).sorted.toSeq == before)
    assert(graft.operators.TieredIndex.read(spark, codesDir).count() == n)
    graft.Engine.releaseScratch(spark)
  }
}
