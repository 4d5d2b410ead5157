package graft.queries

import graft.{Engine, QueryDef}
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * q60 is brute-force cosine top-k — the exact baseline. q61 is the
  * scale path: random-hyperplane LSH bucketing so each query only scores
  * candidates in its bucket. q54-style near-dup pairs live here too.
  *
  * Determinism: cosine is computed with the same explicit formula in
  * Spark and the DuckDB oracle; ordering keys are cosine values
  * quantized to 6 decimals with vec_id tiebreaks, so FP last-bit noise
  * cannot reorder results.
  *
  * Scale notes (100 TB): brute-force is a broadcast of the (small) query
  * set against a partitioned scan of the corpus — embarrassingly
  * parallel, no shuffle until the per-query top-k (which is a partial
  * top-k per partition + merge under TakeOrderedAndProject semantics
  * via window over qid). LSH replaces the full scan with a bucket-key
  * shuffle join; recall tunes with #planes/#tables.
  */
object SimilarityOps {

  /** embeddings with the squared norm precomputed once per row — pair
    * scoring then costs one dot product instead of three array passes.
    * The arithmetic (dot / sqrt(n2a * n2b)) is identical to computing
    * norms per pair, so results are bit-equal to the naive form.
    */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Engine
      .table(s, dir, "embeddings")
      // single-file scan = one partition locally; spread pair scoring
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("e"))
      .withColumn("n2", norm2(col("e")))

  private val embSql =
    """SELECT vec_id, label, e, list_sum(list_transform(e, x -> x * x)) AS n2 FROM
       (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings) raw"""

  /** explicit-formula cosine with precomputed norms (matches the Spark side) */
  private def cosSql(a: String, b: String, n2a: String, n2b: String): String =
    s"(list_sum(list_transform(list_zip($a, $b), x -> x[1] * x[2])) / sqrt($n2a * $n2b))"

  private def cosCol(a: Column, b: Column, n2a: Column, n2b: Column): Column =
    dot(a, b) / sqrt(n2a * n2b)

  /** The drop set of embedding-cosine near-dup dedup: the higher-id
    * member of every within-label pair whose 6-decimal-rounded cosine
    * clears `threshold` (greedy keep-lowest). Single source of the
    * dedup threshold — shared by q57 and the q99 curation pipeline.
    */
  private[queries] def embDropIds(
      s: SparkSession,
      dir: String,
      threshold: Double = 0.45): DataFrame = {
    val e = emb(s, dir)
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(cosCol(col("a.e"), col("b.e"), col("a.n2"), col("b.n2")), 6) >= threshold)
      .select(col("b.vec_id").as("id_b"))
      .distinct()
  }

  val entries: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q54
    // Embedding near-dup pairs within label blocks: top-100 by cosine.
    QueryDef(
      "q54_embedding_pairs",
      (s, dir) => {
        val e = emb(s, dir)
        e.as("a")
          .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("id_a"),
            col("b.vec_id").as("id_b"),
            round(cosCol(col("a.e"), col("b.e"), col("a.n2"), col("b.n2")), 6).as("cos")
          )
          .orderBy(col("cos").desc, col("id_a"), col("id_b"))
          .limit(100)
      },
      Some(s"""WITH t AS ($embSql)
             SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(${cosSql("a.e", "b.e", "a.n2", "b.n2")}, 6) AS cos
             FROM t a JOIN t b ON a.label = b.label AND a.vec_id < b.vec_id
             ORDER BY cos DESC, id_a, id_b LIMIT 100""")
    ),
    // ---------------------------------------------------------------- q60
    // Brute-force cosine top-5 neighbors for the first 20 query vectors.
    QueryDef(
      "q60_knn_bruteforce",
      (s, dir) => {
        val e = emb(s, dir)
        val q = e
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qe"), col("n2").as("qn2"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
        broadcast(q)
          .join(e, col("qid") =!= col("vec_id"))
          .select(
            col("qid"),
            col("vec_id").as("cid"),
            round(cosCol(col("qe"), col("e"), col("qn2"), col("n2")), 6).as("cos")
          )
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .select(col("qid"), col("cid"), col("cos"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      Some(s"""WITH t AS ($embSql),
             q AS (SELECT vec_id AS qid, e AS qe, n2 AS qn2 FROM t WHERE vec_id < 20),
             sc AS (SELECT q.qid, t.vec_id AS cid, round(${cosSql("q.qe", "t.e", "q.qn2", "t.n2")}, 6) AS cos
               FROM q JOIN t ON q.qid <> t.vec_id),
             r AS (SELECT qid, cid, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn FROM sc)
             SELECT qid, cid, cos, rn FROM r WHERE rn <= 5 ORDER BY qid, rn""")
    ),
    // ---------------------------------------------------------------- q61
    // LSH-bucketed ANN: 8 deterministic random hyperplanes -> 256 buckets;
    // each query scores only its bucket. Approximate by design (no SQL
    // oracle — rows-only check); recall vs q60 is asserted in tests.
    QueryDef(
      "q61_ann_lsh",
      (s, dir) => {
        val planes: Seq[Seq[Double]] = {
          val r = new scala.util.Random(42)
          Seq.fill(8)(Seq.fill(64)(r.nextGaussian()))
        }
        val e = emb(s, dir)
        val bucketed = e.withColumn(
          "bucket",
          (0 until 8)
            .map(p => when(dot(col("e"), typedLit(planes(p))) >= 0, 1 << p).otherwise(0))
            .reduce(_ + _)
        )
        val q = bucketed
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qe"), col("n2").as("qn2"), col("bucket"))
        val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
        broadcast(q)
          .join(bucketed, Seq("bucket"))
          .filter(col("qid") =!= col("vec_id"))
          .select(
            col("qid"),
            col("vec_id").as("cid"),
            round(cosCol(col("qe"), col("e"), col("qn2"), col("n2")), 6).as("cos")
          )
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("qid"), col("cid"), col("cos"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      None
    ),
    // ---------------------------------------------------------------- q63
    // IVF-style ANN: 16 coarse centroids (deterministic sample), every
    // vector assigned to its nearest centroid (one broadcast pass — the
    // k*n assignment cost of IVF build); queries probe their 2 nearest
    // centroids and score only those inverted lists. Approximate by
    // design (rows-only; sanity vs brute force asserted in tests).
    QueryDef(
      "q63_ann_ivf",
      (s, dir) => {
        val e = emb(s, dir)
        val cents = e
          .filter(col("vec_id") < 16)
          .select(col("vec_id").as("cent_id"), col("e").as("ce"), col("n2").as("cn2"))
        // assignment: nearest centroid per vector (IVF build)
        val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cent_id"))
        val assigned = e
          .crossJoin(broadcast(cents))
          .withColumn("ccos", round(cosCol(col("e"), col("ce"), col("n2"), col("cn2")), 6))
          .withColumn("arn", row_number().over(wAssign))
          .filter(col("arn") === 1)
          .select(col("vec_id"), col("label"), col("e"), col("n2"), col("cent_id"))
        // probe: each query visits its 2 nearest centroids' lists
        val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cent_id"))
        val probes = e
          .filter(col("vec_id") < 20)
          .select(col("vec_id").as("qid"), col("e").as("qe"), col("n2").as("qn2"))
          .crossJoin(broadcast(cents))
          .withColumn("qcos", round(cosCol(col("qe"), col("ce"), col("qn2"), col("cn2")), 6))
          .withColumn("prn", row_number().over(wProbe))
          .filter(col("prn") <= 2)
          .select(col("qid"), col("qe"), col("qn2"), col("cent_id"))
        val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
        probes
          .join(assigned, Seq("cent_id"))
          .filter(col("qid") =!= col("vec_id"))
          .select(
            col("qid"),
            col("vec_id").as("cid"),
            round(cosCol(col("qe"), col("e"), col("qn2"), col("n2")), 6).as("cos")
          )
          .withColumn("rn", row_number().over(wTop).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("qid"), col("cid"), col("cos"), col("rn"))
          .orderBy(col("qid"), col("rn"))
      },
      None
    ),
    // ---------------------------------------------------------------- q57
    // Embedding-cosine near-dup dedup: drop the higher-id member of every
    // within-label pair whose cosine clears the threshold (greedy
    // keep-lowest, same convention as q55). The 0.45 threshold is tuned
    // to this synthetic corpus (max pair cosine ~0.51); a production
    // near-dup pass runs the same plan at ~0.95+. The comparison is on
    // the 6-decimal-rounded cosine so the cut line is engine-exact.
    // Scale: label-blocked pair scoring like q54; at 100 TB the blocking
    // key becomes an ANN bucket (q61/q63) and this stays the verify+drop
    // stage over candidates only.
    QueryDef(
      "q57_embedding_dedup",
      (s, dir) => {
        val e = emb(s, dir)
        val dups = embDropIds(s, dir)
        e.join(dups, e("vec_id") === dups("id_b"), "left_anti")
          .select(col("vec_id"), col("label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH t AS ($embSql),
             p AS (SELECT b.vec_id AS id_b FROM t a JOIN t b
               ON a.label = b.label AND a.vec_id < b.vec_id
               WHERE round(${cosSql("a.e", "b.e", "a.n2", "b.n2")}, 6) >= 0.45)
             SELECT vec_id, label FROM t
             WHERE vec_id NOT IN (SELECT id_b FROM p) ORDER BY vec_id""")
    ),
    // ---------------------------------------------------------------- q72
    // Scalar int8 quantization of the embedding column — the storage
    // path for a 100 TB vector corpus (4x smaller than float32, 8x than
    // float64; dot products stay integer ops until the final rescale).
    // Per-vector symmetric scale = 127/max|x|; floor(x*scale + 0.5) is
    // used instead of round() so both engines round identically. q_l1 is
    // an exact integer invariant of the quantized vector; mae is the
    // reconstruction error after dequantization.
    QueryDef(
      "q72_embedding_quantize",
      (s, dir) =>
        Engine
          .table(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
          .withColumn("mx", expr("array_max(transform(e, x -> abs(x)))"))
          .filter(col("mx") > 0)
          .withColumn("scale", lit(127.0) / col("mx"))
          .withColumn("q", expr("transform(e, x -> cast(floor(x * scale + 0.5d) as bigint))"))
          .select(
            col("vec_id"),
            expr("aggregate(q, 0L, (a, v) -> a + abs(v))").as("q_l1"),
            round(
              expr(
                "aggregate(sequence(1, size(e)), 0d, (a, i) -> a + abs(element_at(e, i) - element_at(q, i) / scale))"
              ) / size(col("e")),
              6
            ).as("mae")
          )
          .orderBy(col("vec_id")),
      Some("""WITH t AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
             m AS (SELECT vec_id, e, 127.0 / list_max(list_transform(e, x -> abs(x))) AS scale
               FROM t WHERE list_max(list_transform(e, x -> abs(x))) > 0),
             q AS (SELECT vec_id, scale, e,
               list_transform(e, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS qv FROM m)
             SELECT vec_id,
               CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
               round(list_sum(list_transform(generate_series(1, len(e)),
                 i -> abs(e[i] - qv[i] / scale))) / len(e), 6) AS mae
             FROM q ORDER BY vec_id""")
    ),
    // ---------------------------------------------------------------- q62
    // Per-label centroid norm + dispersion: elementwise mean via
    // posexplode -> group by (label, pos) -> re-assemble.
    QueryDef(
      "q62_label_centroids",
      (s, dir) => {
        val e = emb(s, dir)
        e.select(col("label"), posexplode(col("e")).as(Seq("pos", "v")))
          .groupBy(col("label"), col("pos"))
          .agg(avg(col("v")).as("m"))
          .groupBy(col("label"))
          .agg(round(sqrt(sum(col("m") * col("m"))), 6).as("centroid_norm"))
          .orderBy(col("label"))
      },
      Some("""WITH t AS (SELECT label, unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
               unnest(generate_series(0, len(embedding) - 1)) AS pos
             FROM embeddings),
             m AS (SELECT label, pos, avg(v) AS m FROM t GROUP BY label, pos)
             SELECT label, round(sqrt(sum(m * m)), 6) AS centroid_norm
             FROM m GROUP BY label ORDER BY label""")
    )
  )
}
