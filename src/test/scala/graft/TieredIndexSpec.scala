package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TieredIndex

/** The size/tier-aware index maintenance contract (operators/
  * TieredIndex.scala) — the round-10 replacement for the fixed
  * every-2nd-batch full rewrite:
  *   1. round-trip: read() is exactly base + appended deltas;
  *   2. MANY-BATCH COST: across a long append/maintain run the base is
  *     never rewritten and total compaction I/O is O(delta bytes) —
  *     NOT O(index x batches), the round-9 weak flag;
  *   3. a reader that resolved the previous generation survives a
  *     concurrent maintenance cycle (manifest-swap + one-generation
  *     retention — no transient miss, no repair window);
  *   4. orphans from a crashed mutation (segment + manifest written,
  *     CURRENT never swapped) are invisible to readers and GC'd;
  *   5. majors are SIZE-triggered: comparable-size deltas fold the
  *     whole index into one fresh sized base.
  */
class TieredIndexSpec extends AnyFunSuite {
  private lazy val spark = Engine.session("test")

  private def tmp(name: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_tidx_$name"
    Engine.deleteRecursively(new java.io.File(d))
    d
  }

  private def keyed(ids: Range) = {
    import spark.implicits._
    ids.map(i => f"k$i%08d").toDF("k")
  }

  test("create/append/read round-trip") {
    val dir = tmp("roundtrip")
    TieredIndex.create(spark, dir, keyed(0 until 1000), 4, Seq(col("k")))
    TieredIndex.append(spark, dir, keyed(1000 until 1010))
    TieredIndex.append(spark, dir, keyed(1010 until 1020))
    val got = TieredIndex.read(spark, dir).collect().map(_.getString(0)).toSet
    assert(got == (0 until 1020).map(i => f"k$i%08d").toSet)
  }

  test("many-batch maintenance: base never rewritten, total I/O is O(deltas)") {
    val dir = tmp("manybatch")
    // a base ~200x the per-batch delta, so the size-triggered major
    // never fires and every compaction must be deltas/tiers only
    TieredIndex.create(spark, dir, keyed(0 until 60000), 4, Seq(col("k")))
    val baseBytes = TieredIndex.currentFiles(dir).map(_.length).sum
    var reports = Vector.empty[TieredIndex.Maintenance]
    for (b <- 0 until 12) {
      TieredIndex.append(spark, dir, keyed((60000 + 20 * b) until (60000 + 20 * (b + 1))))
      reports :+= TieredIndex.maintain(spark, dir, Seq(col("k")))
    }
    reports :+= TieredIndex.maintain(spark, dir, Seq(col("k")), force = true)
    val actions = reports.map(_.action)
    assert(actions.contains("minor"), s"no minor compaction in $actions")
    assert(!actions.contains("major"), s"a tiny delta stream forced a full rewrite: $actions")
    // every compaction read strictly less than the base — tier work only
    reports.filter(_.action != "none").foreach { r =>
      assert(r.bytesIn < baseBytes, s"${r.action} read ${r.bytesIn} >= base $baseBytes")
    }
    // total compaction I/O across 12 batches is a small multiple of the
    // DELTA bytes (each delta byte is rewritten once per level it climbs,
    // bounded by the tier fan-in) — nowhere near one base rewrite, let
    // alone the old policy's 6 full rewrites
    assert(reports.map(_.bytesIn).sum < baseBytes / 2,
      s"compaction I/O ${reports.map(_.bytesIn).sum} vs base $baseBytes")
    // steady state: bounded file count, nothing lost
    assert(TieredIndex.currentFiles(dir).length <= 10)
    assert(TieredIndex.read(spark, dir).count() == 60000 + 12 * 20)
  }

  test("a reader holding the previous generation survives a maintenance cycle") {
    val dir = tmp("reader")
    TieredIndex.create(spark, dir, keyed(0 until 5000), 4, Seq(col("k")))
    TieredIndex.append(spark, dir, keyed(5000 until 5020))
    TieredIndex.append(spark, dir, keyed(5020 until 5040))
    // resolve the plan (and its concrete file listing) BEFORE compaction
    val reader = TieredIndex.read(spark, dir)
    val rep = TieredIndex.maintain(spark, dir, Seq(col("k")), force = true)
    assert(rep.action != "none")
    // the old generation's delta segments were just retired from the
    // manifest — but stay on disk for one cycle, so the reader sees a
    // complete, consistent snapshot instead of a transient miss
    assert(reader.count() == 5040)
    assert(TieredIndex.read(spark, dir).count() == 5040)
  }

  test("orphans from a crashed mutation are invisible and GC'd; CURRENT stays live") {
    val dir = tmp("crash")
    TieredIndex.create(spark, dir, keyed(0 until 800), 2, Seq(col("k")))
    TieredIndex.append(spark, dir, keyed(800 until 820))
    // simulate a compaction killed between "write new segment+manifest"
    // and "swap CURRENT": both files exist, pointer still on the old
    // generation — exactly the round-9 compactInPlace repair window,
    // which this design removes by construction
    keyed(0 until 10).write.parquet(s"$dir/seg-90000")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "manifest-90000"),
      "base seg-90000 1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // a restarted reader sees the committed generation, not the orphan
    assert(TieredIndex.read(spark, dir).count() == 820)
    // a restart append must not resurrect the orphan either (the GC's
    // "previous generation" has to be the real previous COMMITTED one,
    // not the crashed mutation's higher-numbered manifest)
    TieredIndex.append(spark, dir, keyed(820 until 825))
    TieredIndex.maintain(spark, dir, Seq(col("k")), force = true): Unit
    assert(!new java.io.File(dir, "seg-90000").exists, "orphan segment not GC'd")
    assert(!new java.io.File(dir, "manifest-90000").exists, "orphan manifest not GC'd")
    assert(TieredIndex.read(spark, dir).count() == 825)
  }

  test("a replayed foreachBatch append is a no-op (exactly-once watermark)") {
    val dir = tmp("replay")
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    TieredIndex.append(spark, dir, keyed(100 until 120), batchId = 0L)
    TieredIndex.append(spark, dir, keyed(120 until 140), batchId = 1L)
    val segsBefore = TieredIndex.currentSegments(dir)
    val rowsBefore = TieredIndex.read(spark, dir).count()
    // foreachBatch is at-least-once: a crash after batch 1's append
    // replays batch 1 — the watermark in the manifest must no-op it
    TieredIndex.append(spark, dir, keyed(120 until 140), batchId = 1L)
    assert(TieredIndex.currentSegments(dir) == segsBefore, "replay appended a new segment")
    assert(TieredIndex.read(spark, dir).count() == rowsBefore, "replay duplicated rows")
    // ... and a compaction must carry the watermark forward, so a
    // replay arriving AFTER a maintenance cycle still no-ops
    TieredIndex.maintain(spark, dir, Seq(col("k")), force = true): Unit
    TieredIndex.append(spark, dir, keyed(120 until 140), batchId = 1L)
    assert(TieredIndex.read(spark, dir).count() == rowsBefore, "post-compaction replay duplicated rows")
    // the NEXT batch still appends normally
    TieredIndex.append(spark, dir, keyed(140 until 150), batchId = 2L)
    assert(TieredIndex.read(spark, dir).count() == rowsBefore + 10)
    // non-streaming callers (batchId = -1) keep unconditional appends
    TieredIndex.append(spark, dir, keyed(150 until 160))
    TieredIndex.append(spark, dir, keyed(150 until 160))
    assert(TieredIndex.read(spark, dir).count() == rowsBefore + 30)
    Engine.releaseScratch(spark)
  }

  test("major compaction is size-triggered and rebuilds one sized base") {
    val dir = tmp("major")
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    var sawMajor = false
    for (b <- 0 until 6 if !sawMajor) {
      TieredIndex.append(spark, dir, keyed((100 + 50 * b) until (100 + 50 * (b + 1))))
      sawMajor = TieredIndex.maintain(spark, dir, Seq(col("k"))).action == "major"
    }
    assert(sawMajor, "comparable-size deltas never tripped the size threshold")
    val kinds = TieredIndex.currentSegments(dir).map(_._1)
    assert(kinds == Seq("base"), s"post-major generation is $kinds")
    assert(TieredIndex.read(spark, dir).count() >= 150)
    Engine.releaseScratch(spark)
  }

  test("delete: tombstones mask order-aware, re-appends resurrect, compactions absorb") {
    import spark.implicits._
    def keys(ids: Seq[Int]) = ids.map(i => f"k$i%08d").toDF("k")
    def got(dir: String) =
      TieredIndex.read(spark, dir).collect().map(_.getString(0)).toSet
    def all(ids: Seq[Int]) = ids.map(i => f"k$i%08d").toSet

    val dir = tmp("delete")
    TieredIndex.create(spark, dir, keyed(0 until 1000), 4, Seq(col("k")))
    TieredIndex.append(spark, dir, keyed(1000 until 1020))
    // retract keys living in the BASE and in the DELTA: both masked
    // immediately, O(keys) — no data file rewritten by the delete
    val filesBefore = TieredIndex.currentFiles(dir).map(_.getPath).toSet
    TieredIndex.delete(spark, dir, keys((0 until 5) ++ (1000 until 1005)))
    assert(
      TieredIndex.currentFiles(dir).map(_.getPath).toSet.intersect(filesBefore) == filesBefore,
      "delete rewrote a data file")
    assert(got(dir) == all((5 until 1000) ++ (1005 until 1020)))
    // ORDER CONTRACT: re-appending 3 of the deleted keys AFTER the
    // tombstone makes them live again (a set-minus would swallow them)
    TieredIndex.append(spark, dir, keys(0 until 3))
    val expected = all((0 until 3) ++ (5 until 1000) ++ (1005 until 1020))
    assert(got(dir) == expected)
    // a forced MINOR (major threshold pushed out of reach — the tiny
    // fixture's parquet per-file overhead would otherwise trip the
    // size trigger) folds the deltas WITH the tombstone applied; the
    // tombstone survives (base rows still physically present) and the
    // result set is unchanged
    val minor = TieredIndex
      .maintain(spark, dir, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e9), force = true)
    assert(minor.action == "minor", s"expected minor, got ${minor.action}")
    assert(TieredIndex.currentSegments(dir).exists(_._1 == "tomb"), "minor retired a live tombstone")
    assert(got(dir) == expected)
    // a MAJOR (threshold any tombstone byte trips) physically removes
    // the masked base rows and retires every tombstone: the generation
    // is one plain base again — delete cost fully amortized into the
    // maintenance the index already pays for
    val major = TieredIndex
      .maintain(spark, dir, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e-9))
    assert(major.action == "major", s"expected major, got ${major.action}")
    assert(!TieredIndex.currentSegments(dir).exists(_._1 == "tomb"), "major kept a dead tombstone")
    assert(got(dir) == expected, "major changed the visible set")
    // the streaming replay guard covers deletes too: a batch-tagged
    // delete commits its watermark, and a replay of the same batch id
    // (here carrying a different key set, as a crashed-then-recomputed
    // batch might) must no-op instead of re-deleting
    TieredIndex.delete(spark, dir, keys(Seq(900)), batchId = 7L)
    val afterTagged = expected - f"k${900}%08d"
    assert(got(dir) == afterTagged)
    TieredIndex.delete(spark, dir, keys(Seq(5)), batchId = 7L)
    assert(got(dir) == afterTagged, "a replayed delete re-applied")
    Engine.releaseScratch(spark)
  }

  test("append and delete watermarks are separate: one CDC batch commits both") {
    import spark.implicits._
    def keys(ids: Seq[Int]) = ids.map(i => f"k$i%08d").toDF("k")
    def got(dir: String) = TieredIndex.read(spark, dir).collect().map(_.getString(0)).toSet
    val dir = tmp("cdc")
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    // a CDC upsert+retract micro-batch: ONE batchId, an append AND a
    // delete — with a shared watermark the delete would silently no-op
    // (the append's commit already advanced it to 0)
    TieredIndex.append(spark, dir, keyed(100 until 110), batchId = 0L)
    TieredIndex.delete(spark, dir, keys(Seq(3, 4)), batchId = 0L)
    assert(TieredIndex.lastBatch(dir) == 0L)
    assert(TieredIndex.lastDeleteBatch(dir) == 0L)
    assert(got(dir) == ((0 until 100) ++ (100 until 110)).map(i => f"k$i%08d").toSet -- Seq("k00000003", "k00000004"))
    // replays of EITHER half no-op independently
    TieredIndex.append(spark, dir, keyed(100 until 110), batchId = 0L)
    TieredIndex.delete(spark, dir, keys(Seq(50)), batchId = 0L)
    assert(got(dir).size == 108, "a replayed CDC half re-applied")
    assert(got(dir)("k00000050"), "a replayed delete under an old batchId applied")
    // the watermarks advance independently: batch 1 deletes only (no
    // append), batch 2 appends only — each guard tracks its own kind
    TieredIndex.delete(spark, dir, keys(Seq(5)), batchId = 1L)
    TieredIndex.append(spark, dir, keyed(110 until 115), batchId = 1L)
    assert(TieredIndex.lastDeleteBatch(dir) == 1L)
    assert(got(dir).size == 112)
    // a compaction carries BOTH watermarks forward
    TieredIndex.maintain(spark, dir, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e9), force = true): Unit
    assert(TieredIndex.lastBatch(dir) == 1L, "compaction dropped the append watermark")
    assert(TieredIndex.lastDeleteBatch(dir) == 1L, "compaction dropped the delete watermark")
    TieredIndex.delete(spark, dir, keys(Seq(6)), batchId = 1L)
    assert(got(dir).size == 112, "post-compaction delete replay re-applied")
    Engine.releaseScratch(spark)
  }

  test("cross-index serve fence: a half-committed CDC batch fails loudly, repair realigns") {
    import spark.implicits._
    // the hybrid stack's dual-store window: ONE CDC batch commits into
    // TWO independent indexes (postings then codes); a crash between
    // the commits leaves them one batch apart, and a hybrid serve
    // issued inside the window would fuse two different corpus states
    val postings = tmp("fence_post")
    val codes = tmp("fence_codes")
    TieredIndex.create(spark, postings, keyed(0 until 50), 2, Seq(col("k")))
    TieredIndex.create(spark, codes, keyed(0 until 50), 2, Seq(col("k")))
    TieredIndex.append(spark, postings, keyed(50 until 60), batchId = 0L)
    TieredIndex.append(spark, codes, keyed(50 until 60), batchId = 0L)
    assert(TieredIndex.fenceAligned(postings, codes) == 0L)
    // the crash: batch 1's postings commit lands, the codes commit
    // never runs — the serve-time fence must refuse, naming the lag
    TieredIndex.append(spark, postings, keyed(60 until 70), batchId = 1L)
    val ex = intercept[IllegalArgumentException](
      TieredIndex.fenceAligned(postings, codes))
    assert(ex.getMessage.contains("append 1"), ex.getMessage)
    assert(ex.getMessage.contains("append 0"), ex.getMessage)
    assert(ex.getMessage.contains("readAsOf(0)"), ex.getMessage)
    // the replayed batch repairs the lagging index (its own append
    // no-ops on the leader via the watermark) and the fence realigns
    TieredIndex.append(spark, codes, keyed(60 until 70), batchId = 1L)
    assert(TieredIndex.fenceAligned(postings, codes) == 1L)
    // the DELETE watermark is fenced too: a half-committed tombstone
    // is the same window (q255/q258/q260's CDC batches commit both)
    def keys(ids: Seq[Int]) = ids.map(i => f"k$i%08d").toDF("k")
    TieredIndex.delete(spark, postings, keys(Seq(3)), batchId = 2L)
    val exd = intercept[IllegalArgumentException](
      TieredIndex.fenceAligned(postings, codes))
    assert(exd.getMessage.contains("delete 2"), exd.getMessage)
    TieredIndex.delete(spark, codes, keys(Seq(3)), batchId = 2L)
    assert(TieredIndex.fenceAligned(postings, codes) == 1L)
    Engine.releaseScratch(spark)
  }

  private def scanCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size

  test("tombstone-heavy reads stay bounded: <= |tombs|+1 data branches, merged by maintenance") {
    import spark.implicits._
    def keys(ids: Seq[Int]) = ids.map(i => f"k$i%08d").toDF("k")
    def got(dir: String) = TieredIndex.read(spark, dir).collect().map(_.getString(0)).toSet

    // interleaved shape first: base, t1, delta, t2, t3 — data segments
    // sharing an applicable-tombstone set share ONE branch, so the plan
    // is 2 data scans (base masked by 3 tombs, delta by 2) + 5 tombstone
    // scans = 7 relations, within the documented |tombs|+1 = 4 data
    // branches
    val dir = tmp("tombbound")
    TieredIndex.create(spark, dir, keyed(0 until 200), 2, Seq(col("k")))
    TieredIndex.delete(spark, dir, keys(Seq(0)))
    TieredIndex.append(spark, dir, keyed(200 until 210))
    TieredIndex.delete(spark, dir, keys(Seq(1)))
    TieredIndex.delete(spark, dir, keys(Seq(200)))
    assert(scanCount(TieredIndex.read(spark, dir)) == 2 + 3 + 2,
      "interleaved tombstones planned an unexpected scan count")
    assert(got(dir) == ((2 until 200) ++ (201 until 210)).map(i => f"k$i%08d").toSet)

    // DELETE-ONLY stream (the q223 shape): one tombstone per batch, no
    // deltas — minors can never run, so without tombstone merging the
    // plan grows O(|tombs|^2) anti-joins. The tombMergeAt threshold
    // folds TRAILING tombstones (all masking the identical data set)
    // into one key-distinct tombstone: O(keys), no data file touched.
    val dir2 = tmp("tombonly")
    TieredIndex.create(spark, dir2, keyed(0 until 300), 2, Seq(col("k")))
    var merges = 0
    for (b <- 0 until 8) {
      TieredIndex.delete(spark, dir2, keys(Seq(b, 100 + b)), batchId = b.toLong)
      val m = TieredIndex.maintain(spark, dir2, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e9))
      assert(m.action == "none" || m.action == "tomb_merge", s"unexpected ${m.action}")
      if (m.action == "tomb_merge") merges += 1
    }
    assert(merges >= 1, "8 delete-only batches never triggered a tombstone merge")
    // steady state: bounded tombstone count -> bounded reader plan
    val tombsLeft = TieredIndex.currentSegments(dir2).count(_._1 == "tomb")
    assert(tombsLeft <= 4, s"$tombsLeft tombstones left after merges")
    assert(scanCount(TieredIndex.read(spark, dir2)) <= 1 + tombsLeft)
    // force merges the remainder down to one
    TieredIndex.maintain(spark, dir2, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e9), force = true): Unit
    assert(TieredIndex.currentSegments(dir2).count(_._1 == "tomb") == 1)
    assert(scanCount(TieredIndex.read(spark, dir2)) == 2)
    // nothing over- or under-masked across the merges, and the delete
    // watermark survived them
    assert(got(dir2) == ((8 until 100) ++ (108 until 300)).map(i => f"k$i%08d").toSet)
    assert(TieredIndex.lastDeleteBatch(dir2) == 7L)
    // the merged tombstone is NOT fooled into masking later data: a
    // re-append after the merge resurrects its keys (order contract)
    TieredIndex.append(spark, dir2, keys(Seq(0, 100)))
    assert(got(dir2).contains("k00000000") && got(dir2).contains("k00000100"))
    Engine.releaseScratch(spark)
  }

  test("tombstone merge only folds schema-identical tombstones (a (k) tomb is not a (k,v) tomb)") {
    import spark.implicits._
    val dir = tmp("tombschema")
    val data = Seq(("a", 1L), ("b", 1L), ("b", 2L), ("c", 1L), ("d", 1L)).toDF("k", "v")
    TieredIndex.create(spark, dir, data, 1, Seq(col("k")))
    // 1 narrow (k)-schema tombstone masking every v of 'a', then 3
    // (k, v)-schema tombstones — heterogeneous trailing set
    TieredIndex.delete(spark, dir, Seq("a").toDF("k"))
    TieredIndex.delete(spark, dir, Seq(("b", 1L)).toDF("k", "v"))
    TieredIndex.delete(spark, dir, Seq(("c", 9L)).toDF("k", "v")) // no match: masks nothing
    TieredIndex.delete(spark, dir, Seq(("d", 1L)).toDF("k", "v"))
    def got = TieredIndex.read(spark, dir).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expected = Set(("b", 2L), ("c", 1L))
    assert(got == expected)
    // the merge must NOT unionByName-crash on the mixed schemas, and
    // must fold only the (k, v) group — the (k) tombstone's any-v mask
    // semantics cannot be represented by a (k, v)-schema row
    val m = TieredIndex.maintain(spark, dir, Seq(col("k")), TieredIndex.Policy(majorFrac = 1e9), force = true)
    assert(m.action == "tomb_merge", s"expected tomb_merge, got ${m.action}")
    assert(m.segmentsIn == 3, s"merged ${m.segmentsIn} tombstones, expected the (k,v) group of 3")
    assert(TieredIndex.currentSegments(dir).count(_._1 == "tomb") == 2)
    assert(got == expected, "tombstone merge changed the visible set")
    Engine.releaseScratch(spark)
  }

  test("null-keyed rows are maskable: tombstone anti-joins are null-safe") {
    import spark.implicits._
    val dir = tmp("nullkey")
    val withNull = Seq(Some("a"), Some("b"), None).toDF("k")
    TieredIndex.create(spark, dir, withNull, 1, Seq(col("k")))
    TieredIndex.delete(spark, dir, Seq(Option.empty[String]).toDF("k"))
    val left = TieredIndex.read(spark, dir).collect().map(r => Option(r.getString(0))).toSet
    assert(left == Set(Some("a"), Some("b")), s"null-keyed delete did not apply: $left")
    Engine.releaseScratch(spark)
  }

  test("time travel: readAsOf(b) reproduces each batch's population under retention") {
    val dir = tmp("timetravel")
    val retain = TieredIndex.Policy(retainGenerations = 16)
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    for (b <- 0 until 4) {
      TieredIndex.append(
        spark, dir, keyed((100 + 10 * b) until (100 + 10 * (b + 1))), batchId = b.toLong)
      TieredIndex.maintain(spark, dir, Seq(col("k")), retain): Unit
    }
    // every historical append watermark resolves to exactly its prefix
    // population — compactions between appends fold files, never data
    for (b <- 0 until 4) {
      val got = TieredIndex.readAsOf(spark, dir, b.toLong)
        .collect().map(_.getString(0)).toSet
      val want = (0 until (100 + 10 * (b + 1))).map(i => f"k$i%08d").toSet
      assert(got == want, s"readAsOf($b): ${got.size} rows, want ${want.size}")
    }
    // batch -1 = the pre-stream create generation
    assert(
      TieredIndex.readAsOf(spark, dir, -1L).count() == 100,
      "readAsOf(-1) is the day-0 base")
    // a watermark beyond the newest resolves to the current generation
    assert(TieredIndex.readAsOf(spark, dir, 99L).count() == 140)
    Engine.releaseScratch(spark)
  }

  test("time travel outside the retention window fails loudly, never partially") {
    val dir = tmp("ttgc")
    // default retention (2 generations): after enough append+maintain
    // cycles the early generations' manifests/segments are collected
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    for (b <- 0 until 6) {
      TieredIndex.append(spark, dir, keyed((100 + 10 * b) until (100 + 10 * (b + 1))), batchId = b.toLong)
      TieredIndex.maintain(spark, dir, Seq(col("k"))): Unit
    }
    val ex = intercept[Exception] {
      TieredIndex.readAsOf(spark, dir, -1L).count()
    }
    assert(
      ex.getMessage.contains("retainGenerations") || ex.getMessage.contains("retention"),
      s"GC'd snapshot error does not name the retention knob: ${ex.getMessage}")
    // the CURRENT generation is untouched by the failure
    assert(TieredIndex.read(spark, dir).count() == 160)
    Engine.releaseScratch(spark)
  }

  test("time travel resolves on BOTH watermarks: delete-only batches never leak into earlier snapshots") {
    val dir = tmp("ttdual")
    val retain = TieredIndex.Policy(retainGenerations = 16)
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    // batch 0: append 100..110
    TieredIndex.append(spark, dir, keyed(100 until 110), batchId = 0L)
    TieredIndex.maintain(spark, dir, Seq(col("k")), retain): Unit
    // batch 1: DELETE-ONLY (the round-14 ADVICE trap: this commit
    // carries append watermark 0 and only dbatch advances to 1 — an
    // append-only resolve of batch 0 would pick it and show the
    // deletes a batch early)
    TieredIndex.delete(spark, dir, keyed(0 until 5), batchId = 1L)
    TieredIndex.maintain(spark, dir, Seq(col("k")), retain): Unit
    // batch 2: append 110..120
    TieredIndex.append(spark, dir, keyed(110 until 120), batchId = 2L)
    TieredIndex.maintain(spark, dir, Seq(col("k")), retain): Unit
    def asOf(b: Long): Set[String] =
      TieredIndex.readAsOf(spark, dir, b).collect().map(_.getString(0)).toSet
    def want(r: Range): Set[String] = r.map(i => f"k$i%08d").toSet
    // after batch 0: the delete has NOT happened yet
    assert(asOf(0L) == want(0 until 110), "readAsOf(0) leaked a future delete-only batch")
    // after batch 1: exactly the delete applied, nothing else
    assert(asOf(1L) == want(5 until 110))
    // after batch 2: delete + second append
    assert(asOf(2L) == want(5 until 120))
    Engine.releaseScratch(spark)
  }

  test("a rebuilt index with a seeded watermark no-ops replayed batches (exactly-once across a swap)") {
    val dir = tmp("seedwm")
    // a mid-stream rebuild folded batches <= 2 into the fresh base
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")), seedBatch = 2L)
    assert(TieredIndex.lastBatch(dir) == 2L)
    // the replay of an already-folded batch must be a no-op
    TieredIndex.append(spark, dir, keyed(100 until 110), batchId = 2L)
    assert(TieredIndex.read(spark, dir).count() == 100, "replayed batch double-ingested")
    // the next live batch lands
    TieredIndex.append(spark, dir, keyed(100 until 110), batchId = 3L)
    assert(TieredIndex.read(spark, dir).count() == 110)
    Engine.releaseScratch(spark)
  }

  test("a rebuilt index seeds BOTH watermarks: replayed deletes no-op too") {
    val dir = tmp("seeddwm")
    // a mid-stream rebuild folded batch <= 2's appends AND deletes
    // into the fresh base (q260's retrain under a full CDC stream)
    TieredIndex.create(
      spark, dir, keyed(0 until 100), 2, Seq(col("k")),
      seedBatch = 2L, seedDeleteBatch = 2L)
    assert(TieredIndex.lastDeleteBatch(dir) == 2L)
    // the replayed batch-2 delete must be a no-op (its keys were
    // already excluded by the rebuild — a tombstone here would be
    // harmless today but breaks the exactly-once discipline)
    TieredIndex.delete(spark, dir, keyed(0 until 10).select(col("k")), batchId = 2L)
    assert(
      !TieredIndex.currentSegments(dir).exists(_._1 == "tomb"),
      "replayed delete re-issued its tombstone")
    assert(TieredIndex.read(spark, dir).count() == 100)
    // the next live batch's delete lands
    TieredIndex.delete(spark, dir, keyed(0 until 10).select(col("k")), batchId = 3L)
    assert(TieredIndex.read(spark, dir).count() == 90)
    Engine.releaseScratch(spark)
  }

  test("writer fence: a second concurrent mutator fails loudly instead of racing the pointer") {
    val dir = tmp("fence")
    TieredIndex.create(spark, dir, keyed(0 until 100), 2, Seq(col("k")))
    // simulate a concurrent writer mid-mutation: hold the exclusive
    // lock the mutators take (same JVM -> OverlappingFileLockException
    // inside, surfaced as the contract IllegalStateException)
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(dir, "LOCK"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val lock = ch.tryLock()
    assert(lock != null, "test could not acquire the writer lock")
    try {
      val exA = intercept[IllegalStateException] {
        TieredIndex.append(spark, dir, keyed(100 until 110))
      }
      assert(exA.getMessage.contains("concurrent writer"), exA.getMessage)
      val exD = intercept[IllegalStateException] {
        TieredIndex.delete(spark, dir, keyed(0 until 5))
      }
      assert(exD.getMessage.contains("concurrent writer"), exD.getMessage)
      val exM = intercept[IllegalStateException] {
        TieredIndex.maintain(spark, dir, Seq(col("k")))
      }
      assert(exM.getMessage.contains("concurrent writer"), exM.getMessage)
      // create participates in the SAME fence (round-15 ADVICE: it
      // used to deleteRecursively the tree — unlinking the peer's
      // held-lock inode — BEFORE locking, so a racing create went
      // undetected and both mutators proceeded). It must throw while
      // the peer holds the lock, and must NOT have destroyed the
      // peer's index contents in the attempt.
      val exC = intercept[IllegalStateException] {
        TieredIndex.create(spark, dir, keyed(0 until 10), 1, Seq(col("k")))
      }
      assert(exC.getMessage.contains("concurrent writer"), exC.getMessage)
      assert(
        TieredIndex.read(spark, dir).count() == 100,
        "a fenced-out create must leave the live index untouched")
    } finally { lock.release(); ch.close() }
    // the index is uncorrupted and writable once the peer releases
    assert(TieredIndex.read(spark, dir).count() == 100)
    TieredIndex.append(spark, dir, keyed(100 until 110))
    assert(TieredIndex.read(spark, dir).count() == 110)
    Engine.releaseScratch(spark)
  }
}
