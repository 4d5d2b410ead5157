package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-side invariants for the product-quantization pair (q202
  * encode, q203 ADC recall). The DuckDB gate pins the exact values;
  * these pin the PQ contract itself: code-range/packing validity, the
  * seed fixed point, distortion sanity, and the ADC lower-bound
  * property that makes the lookup-table search correct.
  */
class PqSpec extends AnyFunSuite {
  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.Engine.session("test")

  test("q202: every code packs 8 nibbles in [0,16); seeds encode to themselves") {
    val rows = graft.SparkEntry
      .queries("q202_pq_encode")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = graft.Engine.table(spark, dir, "embeddings").count()
    assert(rows.length == n, "every vector is encoded")
    rows.foreach { case (vid, code, qerr) =>
      assert(code >= 0 && code < (1L << 32), s"vec $vid: code $code outside 8 nibbles")
      assert(qerr >= 0, s"vec $vid: negative distortion")
    }
    // a codebook seed's nearest cell in every subspace is itself after
    // one Lloyd round ONLY if its cell kept it; at minimum, seed 0's
    // full code stays valid and total distortion over seeds is below
    // the non-seed average (seeds sit at or near their own cells)
    val (seeds, rest) = rows.partition(_._1 < 16)
    val seedAvg = seeds.map(_._3).sum.toDouble / seeds.length
    val restAvg = rest.map(_._3).sum.toDouble / rest.length
    assert(seedAvg < restAvg, s"seed distortion $seedAvg !< non-seed $restAvg")
    graft.Engine.releaseScratch(spark)
  }

  test("q204: IVFADC recall rows well-formed, never above the exact-IVF ceiling") {
    val rows = graft.SparkEntry
      .queries("q204_ivfadc_recall")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20 && rows.forall { case (_, k, h) => k == 3 && h >= 0 && h <= 3 })
    // ADC scores probed-list candidates with LOSSY distances, so its
    // recall sits at or below exact-scoring IVF's. q204's L2 coarse
    // quantizer and q124's cosine one probe near-identical lists on
    // this corpus (measured: same 52/60 ceiling), so the ordering is a
    // stable deterministic pin here, not a theorem across quantizers
    val ivfadcTotal = rows.map(_._3).sum
    val ivfExact = graft.SparkEntry
      .queries("q124_ann_recall")(spark, dir)
      .collect()
      .map(_.getLong(3))
      .sum
    assert(ivfadcTotal <= ivfExact, s"IVFADC $ivfadcTotal beats its exact ceiling $ivfExact")
    assert(ivfadcTotal > 0, "vacuous: IVFADC recalled nothing")
    graft.Engine.releaseScratch(spark)
  }

  test("q203: recall in range, and ADC distance equals codebook-decoded exact L2") {
    val rows = graft.SparkEntry
      .queries("q203_pq_adc_recall")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20 && rows.forall { case (_, k, h) => k == 3 && h >= 0 && h <= 3 })
    // the property ADC relies on: sum of per-subspace lookup distances
    // == L2 between the query and the DECODED (reconstructed) vector.
    // Recompute one query's ADC against a reconstruction done with
    // plain column ops and compare.
    val cb = SimilarityOps.pqCodebook(spark, dir).localCheckpoint(eager = false)
    val a2 = SimilarityOps.pqAssign(spark, dir, cb)
    val recon = a2
      .join(cb, Seq("m", "cid"))
      .select(col("vec_id"), col("m"), col("cv"))
      .groupBy(col("vec_id"))
      .agg(expr("flatten(transform(array_sort(collect_list(struct(m, cv))), p -> p.cv))")
        .as("rv"))
    val iv = graft.Engine
      .table(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          "x -> cast(floor(x * 1000000 + 0.5d) as bigint) + 16777216L)").as("iv"))
    val qv = iv.filter(col("vec_id") === 0L).select(col("iv").as("qiv"))
    val viaRecon = recon
      .crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= 0L)
      .select(
        col("vec_id"),
        graft.functions.VectorOps.l2sqLong(col("qiv"), col("rv")).as("dr"))
    val qsubs = iv
      .filter(col("vec_id") === 0L)
      .select(explode(expr("transform(sequence(0, 7), " +
        "m -> named_struct('m', m, 'qsv', slice(iv, m * 8 + 1, 8)))")).as("x"))
      .select(col("x.m").as("m"), col("x.qsv").as("qsv"))
    val pdt = qsubs
      .join(cb, Seq("m"))
      .select(col("m"), col("cid"), graft.functions.VectorOps.l2sqLong(col("qsv"), col("cv")).as("pd"))
    val viaAdc = a2
      .join(broadcast(pdt), Seq("m", "cid"))
      .filter(col("vec_id") =!= 0L)
      .groupBy(col("vec_id"))
      .agg(sum(col("pd")).as("da"))
    val diff = viaRecon
      .join(viaAdc, "vec_id")
      .filter(col("dr") =!= col("da"))
      .count()
    assert(diff == 0, "ADC lookup sum != exact L2 to the reconstruction")
    graft.Engine.releaseScratch(spark)
  }

  test("q211/q212: recall ledger orders as ADC <= re-rank <= probe ceiling") {
    // the two-stage serving contract: exact re-ranking of ADC's top-16
    // can only improve on ADC order, and nothing can recall a neighbor
    // outside the probed lists. STRICT improvement over deep ADC is
    // the measured point of the refine stage (31/60 -> 50/60 at
    // sf0.01) — pinned as > rather than >= so a silently disabled
    // re-rank fails the suite, not just the perf ledger.
    val adc = graft.SparkEntry
      .queries("q208_ivfadc_deep_recall")(spark, dir)
      .collect().map(_.getLong(2)).sum
    val rr = graft.SparkEntry
      .queries("q212_ivfadc_rerank")(spark, dir)
      .collect().map(_.getLong(2)).sum
    val ceil = graft.SparkEntry
      .queries("q211_ivf_probe_ceiling")(spark, dir)
      .collect().map(_.getLong(2)).sum
    assert(adc < rr, s"re-rank ($rr) did not strictly improve on ADC order ($adc)")
    assert(rr <= ceil, s"re-rank ($rr) exceeds the probe ceiling ($ceil) — impossible")
    graft.Engine.releaseScratch(spark)
  }

  test("q217: the curve's nprobe=2 point equals q208's ADC recall; q216 re-ranks above every point") {
    // cross-query consistency: q217 probes the PERSISTED deep artifact
    // while q208 retrains inline — at nprobe = 2 they are the same
    // system, so the recall totals must agree exactly (a drift here
    // means the artifact round-trip or the prn plumbing lost
    // something). And the measured point of the curve: NO nprobe
    // (1..8) reaches the re-ranked recall — more probes add ADC
    // impostors faster than true neighbors, re-ranking is the lever.
    val curve = graft.SparkEntry
      .queries("q217_ann_nprobe_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val adc = graft.SparkEntry
      .queries("q208_ivfadc_deep_recall")(spark, dir)
      .collect().map(_.getLong(2)).sum
    assert(curve(2L) == adc, s"curve@2 (${curve(2L)}) != inline ADC recall ($adc)")
    val rr = graft.SparkEntry
      .queries("q212_ivfadc_rerank")(spark, dir)
      .collect().map(_.getLong(2)).sum
    assert(curve.values.max < rr, s"some nprobe (${curve.values.max}) matched re-rank ($rr)")
    graft.Engine.releaseScratch(spark)
  }

  test("q220: re-rank curve@2 equals q212 per query; re-ranking restores monotone nprobe gains") {
    // the decision-grade curve: at nprobe = 2 the artifact-path
    // re-rank IS q212's inline-trained composition, so the per-query
    // hit counts must agree exactly (not just the total — a
    // compensating per-query drift would mean the artifact round-trip
    // or the prn plumbing diverged). And the measured point of the
    // query: unlike q217's raw-ADC curve (non-monotone — extra lists
    // add quantization impostors), the RE-RANKED curve must be
    // non-decreasing in nprobe, and its widest point must beat the
    // 2-probe point — once the refine stage exists, more probes buy
    // recall again (47/51/53/57 at sf0.01).
    val curve = graft.SparkEntry
      .queries("q220_ann_rerank_curve")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val at2 = curve.filter(_._2 == 2L).map(t => (t._1, t._3)).toMap
    val q212 = graft.SparkEntry
      .queries("q212_ivfadc_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toMap
    assert(at2 == q212, s"curve@2 per-query hits diverged from q212: $at2 vs $q212")
    val totals = curve.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val ordered = Seq(1L, 2L, 4L, 8L).map(totals)
    assert(
      ordered == ordered.sorted,
      s"re-ranked curve not monotone in nprobe: $ordered")
    assert(
      ordered.last > totals(2L),
      s"widest re-ranked point (${ordered.last}) did not beat 2-probe (${totals(2L)})")
    graft.Engine.releaseScratch(spark)
  }

  test("q206: the persisted index is built once and probe-equal to inline training") {
    val dir = "/root/testdata/sf0.001"
    val run = graft.SparkEntry.queries("q206_ivfadc_probe")
    // first call builds the artifact (COMPLETE marker committed last)
    val first = run(spark, dir).collect().map(_.toSeq).toSeq
    val idx = SimilarityOps.buildIvfAdcIndex(spark, dir)
    val marker = new java.io.File(idx, "COMPLETE")
    assert(marker.exists, "no COMPLETE marker after build")
    val stamp = marker.lastModified
    // second call must SKIP the build (artifact reuse — the
    // probe-many lifecycle) and read identical results back
    val second = run(spark, dir).collect().map(_.toSeq).toSeq
    assert(marker.lastModified == stamp, "probe call rebuilt the index")
    assert(second == first, "artifact re-read changed the probe result")
    // probing the artifact must equal probing the inline-trained parts
    // (write -> read -> unpack loses nothing)
    val (cc, ca, cb, a2) = SimilarityOps.ivfadcTrain(spark, dir, k = 16, rounds = 1)
    val q = graft.Engine
      .table(spark, dir, "embeddings")
      .select(
        col("vec_id"),
        expr("transform(cast(embedding as array<double>), " +
          "x -> cast(floor(x * 1000000 + 0.5d) as bigint) + 16777216L)").as("iv"))
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("iv").as("qiv"))
    val inline = SimilarityOps
      .ivfadcProbe(q, cc, cb, a2.join(ca, "vec_id"))
      .orderBy(col("qid"), col("rn"))
      .collect().map(_.toSeq).toSeq
    assert(inline == first, "artifact probe != inline-trained probe")
    // a torn build (marker removed) is invisible: the next call
    // rebuilds from scratch and converges to the same rows
    assert(marker.delete())
    val rebuilt = run(spark, dir).collect().map(_.toSeq).toSeq
    assert(rebuilt == first, "rebuild after a torn build diverged")
    graft.Engine.releaseScratch(spark)
  }

  test("q240: the index histogram is complete — populations sum to the corpus") {
    val rows = graft.SparkEntry
      .queries("q240_ann_index_stats")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 16, "one row per coarse cell")
    val n = graft.Engine.table(spark, dir, "embeddings").count()
    assert(rows.map(_._2).sum == n, "every vector is in exactly one list")
    val fracSum = rows.map(_._3).sum
    assert(math.abs(fracSum - 1.0) < 1e-4, s"fractions sum to $fracSum")
    assert(rows.forall(_._2 > 0), "an empty cell coalesced wrong at training")
    graft.Engine.releaseScratch(spark)
  }

  test("q241: time-travel probes equal q214's mid-stream probes row for row") {
    // THE reproducibility identity: probing the historical snapshot
    // after the stream ends returns exactly what the live probe
    // returned mid-stream — same lifecycle parameters, independent
    // scratch trees, one shared oracle string in the registry
    val live = graft.SparkEntry
      .queries("q214_ivfadc_stream_search")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val travel = graft.SparkEntry
      .queries("q241_ann_time_travel")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(travel == live, "time-travel probes diverged from the live mid-stream probes")
    graft.Engine.releaseScratch(spark)
  }
}
