package graft.operators

import graft.functions.Toks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over the embeddings
  * table (vec_id BIGINT, embedding FLOAT[], label INT).
  *
  * Embeddings are integer-quantized (floor(x*100), exact in both engines) so
  * every score is exact integer arithmetic — dot products, squared-cosine
  * thresholds — giving bit-exact DuckDB oracles with zero float drift.
  *
  * Scale design:
  *   - `sim_knn` is the brute-force baseline: a small query set is
  *     broadcast against the full corpus (the corpus side never shuffles;
  *     per-partition top-k then global top-k via TakeOrderedAndProject);
  *   - `sim_lsh_nn` / `dd_embed_cos` are the scale path: candidates meet
  *     only inside a sign-LSH bucket (random-hyperplane LSH with
  *     axis-aligned planes — deterministic, no stored model), in BANDS
  *     independent bands of BAND_BITS planes each. Band-duplicate candidate
  *     pairs are folded by a max-aggregation on the pair key — no join-back
  *     to the vector table.
  *
  * Parameter law (round 3 — set by MEASURED recall, not guessed): a pair at
  * angle θ collides in one b-bit band with prob (1-θ/π)^b and in any of L
  * bands with 1-(1-(1-θ/π)^b)^L; candidate volume scales as L·n²/2^b. The
  * r2 setting (L=2, b=12) measured recall ~0.28 even on near-dup-grade
  * planted pairs (θ≈14°) — exact vs its oracle but weak as search. Round 3
  * uses L=4, b=12: near-dup recall rises to >0.85 (floor pinned on PLANTED
  * perturbed copies in TrainingOpsSpec) while candidate volume stays at
  * n²/1024 — scale-safe. What LSH at ANY scale-viable parameters cannot do
  * is find the true nearest neighbor of a near-RANDOM vector (the test
  * embeddings' true-NN angles are ≈60°: per-band collision (2/3)^12 ≈
  * 0.008, so measured top-1 recall is a few percent — reported, not
  * asserted): that regime needs the IVF path (probe lists cover angular
  * cells regardless of similarity) or brute force. This boundary is
  * fundamental to single-probe sign-LSH, not a tuning miss.
  */
object Similarity {

  private val BANDS = 4
  private val BAND_BITS = 12 // planes per band; needs BANDS*BAND_BITS <= dims (64)
  private val N_QUERIES = 8
  private val TOP_K = 5

  /** Quantized view of any (vec_id, embedding) frame. */
  private[graft] def quantizedFrom(raw: DataFrame): DataFrame =
    raw
      .select(
        col("vec_id"),
        Toks.quantize(col("embedding")).as("q"),
        col("embedding").as("e")
      )
      .withColumn("nq", Toks.dotQ(col("q"), col("q")))

  private def quantized(spark: SparkSession, sfDir: String): DataFrame =
    quantizedFrom(spark.read.parquet(s"$sfDir/embeddings.parquet"))

  /** Sign bucket of band `b` (0-based): planes are dims b*BAND_BITS+1 ..
    * (b+1)*BAND_BITS. pow(2, k-1) is exact in double for k <= 53.
    */
  private def bandSig(emb: org.apache.spark.sql.Column, b: Int): org.apache.spark.sql.Column =
    aggregate(
      sequence(lit(1), lit(BAND_BITS)),
      lit(0L),
      (acc, k) =>
        acc + when(element_at(emb, k + b * BAND_BITS) >= 0,
          pow(lit(2.0), k - 1).cast("long")).otherwise(lit(0L))
    )

  /** One row per (vector, band): (vec_id, q, nq, band, sig). */
  private[graft] def bandedFrom(quant: DataFrame): DataFrame =
    quant.select(
      col("vec_id"), col("q"), col("nq"),
      explode(array((0 until BANDS).map { b =>
        struct(lit(b).as("band"), bandSig(col("e"), b).as("sig"))
      }: _*)).as("bs")
    ).select(col("vec_id"), col("q"), col("nq"),
      col("bs.band").as("band"), col("bs.sig").as("sig"))

  private def banded(spark: SparkSession, sfDir: String): DataFrame =
    bandedFrom(quantized(spark, sfDir))

  private val SQL_QUANTIZED =
    s"""emb AS (SELECT vec_id, embedding e FROM embeddings),
       |qv AS (SELECT vec_id, e, ${Toks.SQL_QUANT} q FROM emb),
       |qn AS (SELECT vec_id, e, q,
       |              CAST(list_dot_product(q, q) AS BIGINT) nq FROM qv)""".stripMargin

  private val SQL_BANDED =
    s"""bands AS (
       |  SELECT vec_id, q, nq, b AS band,
       |         CAST(list_sum([CASE WHEN e[b*$BAND_BITS + k] >= 0
       |                             THEN CAST(1 AS BIGINT) << (k-1) ELSE 0 END
       |                        for k in generate_series(1, $BAND_BITS)]) AS BIGINT) sig
       |  FROM qn, generate_series(0, ${BANDS - 1}) g(b))""".stripMargin

  // ---- brute-force top-k (baseline) --------------------------------------

  def knn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = quantized(spark, sfDir)
    val q = e.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
    val scored = q.join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), Toks.dotQ(col("qq"), col("q")).as("dot"))
    // heap top-k per query via the custom operator (the corpus-size scored
    // set never gets partition-sorted), then rank the k*queries survivors
    val w = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    graft.plans.TopK
      .perKey(scored, Seq(col("qid")), Seq(col("dot").desc, col("vec_id").asc), TOP_K)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("qid", "rank", "vec_id", "dot")
      .orderBy("qid", "rank")
  }

  val knnSql: String =
    s"""WITH $SQL_QUANTIZED,
       |q AS (SELECT vec_id qid, q qq FROM qn WHERE vec_id < $N_QUERIES),
       |scored AS (
       |  SELECT qid, e.vec_id, CAST(list_dot_product(qq, e.q) AS BIGINT) dot
       |  FROM q JOIN qn e ON e.vec_id <> qid)
       |SELECT qid, rank, vec_id, dot FROM (
       |  SELECT qid, vec_id, dot,
       |         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id ASC) rank
       |  FROM scored)
       |WHERE rank <= $TOP_K ORDER BY qid, rank""".stripMargin

  // ---- LSH-bucketed nearest neighbor (scale path) ------------------------

  def lshNn(spark: SparkSession, sfDir: String): DataFrame =
    lshNnFrom(banded(spark, sfDir))

  /** LSH top-1 over any pre-banded frame (tests plant perturbed copies). */
  private[graft] def lshNnFrom(bd: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // candidates meet inside a (band, sig) bucket; a pair seen in several
    // bands is folded by the groupBy (dot is identical in every copy)
    val pairs = bd.as("a")
      .join(bd.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_id"),
        col("b.vec_id").as("nn_id"),
        Toks.dotQ(col("a.q"), col("b.q")).as("dot")
      )
      .groupBy("vec_id", "nn_id")
      .agg(max(col("dot")).as("dot"))
    val w = Window.partitionBy("vec_id").orderBy(col("dot").desc, col("nn_id").asc)
    pairs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "nn_id", "dot")
      .orderBy("vec_id")
  }

  val lshNnSql: String =
    s"""WITH $SQL_QUANTIZED,
       |$SQL_BANDED,
       |pairs AS (
       |  SELECT a.vec_id vec_id, b.vec_id nn_id,
       |         max(CAST(list_dot_product(a.q, b.q) AS BIGINT)) dot
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2)
       |SELECT vec_id, nn_id, dot FROM (
       |  SELECT vec_id, nn_id, dot,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, nn_id ASC) rn
       |  FROM pairs)
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  // ---- embedding-cosine near-duplicate pairs -----------------------------

  /** Pairs in the same sign bucket with cos² >= 0.09 (scaled: cos²·10⁴ >=
    * 900) and positive dot — all integer arithmetic.
    */
  def embedCos(spark: SparkSession, sfDir: String): DataFrame = {
    val bd = banded(spark, sfDir)
    bd.as("a")
      .join(bd.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        Toks.dotQ(col("a.q"), col("b.q")).as("dot"),
        col("a.nq").as("na"),
        col("b.nq").as("nb")
      )
      // fold band duplicates (identical dot/na/nb in every copy)
      .groupBy("vec_a", "vec_b")
      .agg(max(col("dot")).as("dot"), max(col("na")).as("na"), max(col("nb")).as("nb"))
      .filter(col("dot") > 0)
      // integral `div`, not `/`: double division of ~1e15 numerators can
      // round across an integer boundary and disagree with DuckDB's exact //
      .withColumn("num", col("dot") * col("dot") * lit(10000L))
      .withColumn("den", col("na") * col("nb"))
      .selectExpr("vec_a", "vec_b", "num div den AS cos2_e4")
      .filter(col("cos2_e4") >= 900)
      .orderBy("vec_a", "vec_b")
  }

  val embedCosSql: String =
    s"""WITH $SQL_QUANTIZED,
       |$SQL_BANDED,
       |p AS (
       |  SELECT a.vec_id vec_a, b.vec_id vec_b,
       |         max(CAST(list_dot_product(a.q, b.q) AS BIGINT)) dot,
       |         max(a.nq) na, max(b.nq) nb
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2)
       |SELECT vec_a, vec_b, (dot * dot * 10000) // (na * nb) AS cos2_e4
       |FROM p
       |WHERE dot > 0 AND (dot * dot * 10000) // (na * nb) >= 900
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---- IVF (inverted-file) ANN -------------------------------------------

  private val N_CENT = 8   // deterministic centroids
  private val N_PROBE = 2  // probe the 2 nearest centroid lists
  private val IVF_K = 3    // neighbors returned per query
  private val IVF_QUERIES = 32 // query vectors: vec_id in [N_CENT, N_CENT + 32)
  private val DIMS = 64    // embedding dimensionality (fixed by the table)

  /** IVF ANN with a one-step integer Lloyd refinement: the seed codebook is
    * the first 8 vectors, every vector is assigned to its nearest seed, and
    * each centroid is re-estimated as the element-wise TRUNCATED integer
    * mean of its members — Spark `div` and DuckDB `//` both truncate toward
    * zero, so both engines hold bit-identical codebooks with no
    * trained-model exchange. The refinement lifted measured recall@1-in-3
    * from 0.125 (seed codebook ≈ random sphere partition) to the floor
    * pinned in TrainingOpsSpec. A query probes its top-2 refined lists; at
    * scale assignment is a one-off pass and the candidate join touches
    * |probes|/|centroids| of the corpus, with more Lloyd steps / sqrt(n)
    * centroids as the quality levers.
    */
  /** Nearest-centroid assignment (rank by dot desc, cid asc) over a
    * quantized frame `e` — shared by `sim_ivf` and `dd_semantic`.
    */
  private def assignNearest(e: DataFrame, centroids: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cdot").desc, col("cid").asc)
    e.crossJoin(broadcast(centroids))
      .withColumn("cdot", Toks.dotQ(col("q"), col("cq")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("cid"), col("q"), col("nq"))
  }

  /** Deterministic integer-Lloyd codebook (seed = first `nCent` vectors, one
    * truncated-integer-mean refinement) — shared by `sim_ivf` (fixed
    * N_CENT) and `dd_semantic` (adaptive ~√n), bit-identical across engines.
    */
  private def lloydCentroids(e: DataFrame, nCent: Long = N_CENT): DataFrame = {
    val cent0 = e.filter(col("vec_id") < nCent)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    assignNearest(e, cent0)
      .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .selectExpr("cid", "pos", "s div c AS m")
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cid"), transform(col("pm"), x => x.getField("m")).as("cq"))
  }

  def ivf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = quantized(spark, sfDir)
    val cent = lloydCentroids(e)
    val assign = assignNearest(e, cent)
    // queries probe their top-N_PROBE centroids
    val wProbe = Window.partitionBy("qid").orderBy(col("cdot").desc, col("cid").asc)
    val probes = e.filter(col("vec_id") >= N_CENT && col("vec_id") < N_CENT + IVF_QUERIES)
      .select(col("vec_id").as("qid"), col("q").as("qq"))
      .crossJoin(broadcast(cent))
      .withColumn("cdot", Toks.dotQ(col("qq"), col("cq")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= N_PROBE)
      .select("qid", "qq", "cid")
    // candidates = vectors in the probed lists
    val wTop = Window.partitionBy("qid").orderBy(col("dot").desc, col("vec_id").asc)
    probes.join(assign, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", Toks.dotQ(col("qq"), col("q")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= IVF_K)
      .select("qid", "rank", "vec_id", "dot")
      .orderBy("qid", "rank")
  }

  /** Shared Lloyd-codebook CTE chain (needs $SQL_QUANTIZED in scope):
    * cent0 → assign0 → cent → assign (vec_id, cid, q, nq). `cent` is the
    * seed-codebook size as SQL text — a literal for `sim_ivf`, a scalar
    * subquery (~√n) for `dd_semantic`.
    */
  private def sqlLloyd(cent: String): String =
    s"""cent0 AS (SELECT vec_id cid, q cq FROM qn WHERE vec_id < $cent),
       |assign0 AS (
       |  SELECT vec_id, cid, q FROM (
       |    SELECT e.vec_id, cent0.cid, e.q,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY CAST(list_dot_product(e.q, cent0.cq) AS BIGINT) DESC,
       |                                       cent0.cid ASC) arn
       |    FROM qn e CROSS JOIN cent0)
       |  WHERE arn = 1),
       |cent AS (
       |  SELECT cid, list(m ORDER BY pos) cq FROM (
       |    SELECT a.cid, g.pos, CAST(sum(a.q[g.pos]) // count(*) AS BIGINT) m
       |    FROM assign0 a, generate_series(1, $DIMS) g(pos)
       |    GROUP BY a.cid, g.pos)
       |  GROUP BY cid),
       |assign AS (
       |  SELECT vec_id, cid, q, nq FROM (
       |    SELECT e.vec_id, cent.cid, e.q, e.nq,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY CAST(list_dot_product(e.q, cent.cq) AS BIGINT) DESC,
       |                                       cent.cid ASC) arn
       |    FROM qn e CROSS JOIN cent)
       |  WHERE arn = 1)""".stripMargin

  private val SQL_LLOYD = sqlLloyd(N_CENT.toString)

  val ivfSql: String =
    s"""WITH $SQL_QUANTIZED,
       |$SQL_LLOYD,
       |probes AS (
       |  SELECT qid, qq, cid FROM (
       |    SELECT e.vec_id qid, e.q qq, cent.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |                              ORDER BY CAST(list_dot_product(e.q, cent.cq) AS BIGINT) DESC,
       |                                       cent.cid ASC) prn
       |    FROM qn e CROSS JOIN cent
       |    WHERE e.vec_id >= $N_CENT AND e.vec_id < ${N_CENT + IVF_QUERIES})
       |  WHERE prn <= $N_PROBE)
       |SELECT qid, rank, vec_id, dot FROM (
       |  SELECT p.qid, a.vec_id,
       |         CAST(list_dot_product(p.qq, a.q) AS BIGINT) dot,
       |         row_number() OVER (PARTITION BY p.qid
       |                            ORDER BY CAST(list_dot_product(p.qq, a.q) AS BIGINT) DESC,
       |                                     a.vec_id ASC) rank
       |  FROM probes p JOIN assign a ON p.cid = a.cid
       |  WHERE a.vec_id <> p.qid)
       |WHERE rank <= $IVF_K ORDER BY qid, rank""".stripMargin

  // ---- SemDeDup: cluster-scoped semantic deduplication ---------------------

  /** SemDeDup (Abbas et al. 2023 shape): k-means-cluster the embeddings,
    * then deduplicate WITHIN each cluster — pairwise similarity is only ever
    * computed inside a cluster, so the quadratic term is n·(n/k) rather than
    * n², and clusters shard cleanly across executors (their LAION dedup runs
    * exactly this way; at 10^12 scale k grows ~√n and centroids train on a
    * sample). Keep-rule is the published one-pass greedy, made deterministic:
    * a vector is DROPPED iff a lower-id vector in the same cluster sits
    * within the similarity ball (cos² ≥ 0.09, exact integer arithmetic —
    * same threshold device as `dd_embed_cos`); the reported keeper is the
    * lowest such id. Cluster assignment reuses the shared integer-Lloyd
    * codebook (bit-identical across engines), so the whole op is hash-
    * oracled, not rows-only.
    *
    * vs `dd_embed_cos`: same pair arithmetic, different SCOPING — LSH
    * buckets can split a true near-dup pair across buckets (recall loss),
    * clusters bound the work differently (recall loss only at cluster
    * boundaries) and are what the published pipeline uses when an IVF-style
    * codebook already exists for search.
    */
  def semantic(spark: SparkSession, sfDir: String): DataFrame =
    semanticFrom(quantized(spark, sfDir))

  /** SemDeDup over any pre-quantized frame (tests plant perturbed copies).
    *
    * The codebook size is ADAPTIVE: k = max(N_CENT, ⌈√n⌉). With fixed k the
    * within-cluster pair term grows n²/k — quadratic (measured: soak
    * exponent ≈1.9 at 3–10× the bench scale). k ~ √n balances the n·k
    * assignment term against the n²/k pair term so both grow n^1.5 — the
    * SemDeDup paper's regime (their k also grows sublinearly; at 10^12 the
    * assignment side would move to the IVF index instead of a crossJoin).
    * n is a driver-side scalar parameter (same device as q_pagerank's
    * graph size); the oracle computes the identical k via a scalar
    * subquery — ⌈√n⌉ on an exact integer count is bit-equal in both
    * engines (IEEE-correctly-rounded sqrt).
    */
  private[graft] def semanticFrom(e: DataFrame): DataFrame = {
    val eC = e.localCheckpoint() // n + codebook + pairs reuse one frame
    val k = math.max(N_CENT.toLong, math.ceil(math.sqrt(eC.count().toDouble)).toLong)
    val asg = assignNearest(eC, lloydCentroids(eC, k))
    val pairs = asg.as("a")
      .join(asg.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("keep_cand"),
        col("b.vec_id").as("vec_id"),
        Toks.dotQ(col("a.q"), col("b.q")).as("dot"),
        col("a.nq").as("na"), col("b.nq").as("nb"))
      .filter(col("dot") > 0)
      .withColumn("cos2_e4",
        expr("(dot * dot * 10000) div (na * nb)"))
      .filter(col("cos2_e4") >= 900)
    pairs
      .groupBy("vec_id")
      .agg(min(struct(col("keep_cand"), col("cos2_e4"))).as("k"))
      .select(col("vec_id"), col("k.keep_cand").as("kept_id"),
        col("k.cos2_e4").as("cos2_e4"))
      .orderBy("vec_id")
  }

  val semanticSql: String =
    s"""WITH $SQL_QUANTIZED,
       |${sqlLloyd(s"(SELECT GREATEST($N_CENT, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM qn)")},
       |pairs AS (
       |  SELECT a.vec_id keep_cand, b.vec_id vec_id,
       |         CAST(list_dot_product(a.q, b.q) AS BIGINT) dot,
       |         a.nq na, b.nq nb
       |  FROM assign a JOIN assign b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |close AS (
       |  SELECT keep_cand, vec_id, (dot * dot * 10000) // (na * nb) cos2_e4
       |  FROM pairs
       |  WHERE dot > 0 AND (dot * dot * 10000) // (na * nb) >= 900)
       |SELECT vec_id, min(keep_cand) kept_id,
       |       CAST(min_by(cos2_e4, keep_cand) AS BIGINT) cos2_e4
       |FROM close GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- product quantization (PQ) ANN --------------------------------------

  private val PQ_M = 8        // subspaces
  private val PQ_SUB = DIMS / PQ_M // dims per subspace (8)
  private val PQ_CODES = 16   // codes per subspace codebook
  private val PQ_QUERIES = 16 // query vectors: vec_id in [PQ_CODES, PQ_CODES+16)
  private val PQ_K = 5        // neighbors returned per query

  /** Exact squared-L2 between two quantized integer subvectors (ordered
    * fold — bit-deterministic at any parallelism).
    */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Product-quantization ANN — the memory-compression scale path that IVF
    * alone lacks: each 64-dim vector is encoded as PQ_M=8 nibble-sized code
    * ids (16 codes/subspace), i.e. ~8 bytes instead of 256 — the
    * representation a 10^12-vector index actually stores. Codebooks are
    * deterministic (seed = the first PQ_CODES vectors' subvectors, one
    * integer-mean Lloyd step — `div` truncation identical in both engines,
    * same device as `sim_ivf`), so no trained-model exchange and the DuckDB
    * oracle is bit-exact. Queries score candidates by ASYMMETRIC distance
    * (ADC, Jégou et al. TPAMI'11 shape): a per-query lookup table of exact
    * squared-L2 from each query subvector to each code (PQ_M × PQ_CODES = 128
    * rows/query) is joined onto the code table — sum over subspaces
    * approximates the true distance without touching raw vectors.
    *
    * Scale shape: codebook training touches the corpus once (at 100 TB you
    * train on a sample; noted, not load-bearing for correctness); ENCODING is
    * a broadcast-codebook argmin folded map-side by a partial-agg
    * `min(struct(d2, cid))` — one shuffle on (vec_id, m) whose payload is the
    * 8-int subvector, never the full vector; ADC is a BROADCAST join of the
    * tiny LUT onto the code table followed by a partial-agg'd sum — the
    * encoded corpus never shuffles raw embeddings; top-k rides the
    * bounded-heap TopKPerKey operator.
    */
  def pq(spark: SparkSession, sfDir: String): DataFrame =
    pqFrom(quantized(spark, sfDir), PQ_CODES, PQ_CODES + PQ_QUERIES)

  /** PQ over any pre-quantized frame; queries are vec_id in [qLo, qHi)
    * (tests plant perturbed copies and query them directly).
    */
  private[graft] def pqFrom(e: DataFrame, qLo: Long, qHi: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one row per (vector, subspace): the 8-dim integer subvector
    val sub = e.select(
      col("vec_id"),
      explode(array((0 until PQ_M).map { m =>
        struct(lit(m).as("m"), slice(col("q"), m * PQ_SUB + 1, PQ_SUB).as("s"))
      }: _*)).as("ms"))
      .select(col("vec_id"), col("ms.m").as("m"), col("ms.s").as("s"))
    val seed = sub.filter(col("vec_id") < PQ_CODES)
      .select(col("m"), col("vec_id").as("cid"), col("s").as("c"))
    // nearest-code assignment under a broadcast codebook: aggregate argmin
    // (partial-agg combines map-side; ties break on lowest cid; `s` rides in
    // struct position 3 and never reaches comparison because cid is unique)
    def assign(codebook: DataFrame): DataFrame = sub
      .join(broadcast(codebook), Seq("m"))
      .select(col("vec_id"), col("m"), struct(sqDist(col("s"), col("c")).as("d2"),
        col("cid").as("cid"), col("s").as("s")).as("cand"))
      .groupBy("vec_id", "m")
      .agg(min(col("cand")).as("best"))
      .select(col("vec_id"), col("m"), col("best.cid").as("cid"), col("best.s").as("s"))
    // one Lloyd step: per-(subspace, code) element-wise truncated integer mean
    val cb = assign(seed)
      .select(col("m"), col("cid"), posexplode(col("s")).as(Seq("pos", "v")))
      .groupBy("m", "cid", "pos")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
      .selectExpr("m", "cid", "pos", "sv div cnt AS cv")
      .groupBy("m", "cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pm"))
      .select(col("m"), col("cid"), transform(col("pm"), x => x.getField("cv")).as("c"))
    val codes = assign(cb).select("vec_id", "m", "cid")
    // per-query ADC lookup table: exact d2 from query subvector to each code
    val lut = sub
      .filter(col("vec_id") >= qLo && col("vec_id") < qHi)
      .join(broadcast(cb), Seq("m"))
      .select(col("vec_id").as("qid"), col("m"), col("cid"),
        sqDist(col("s"), col("c")).as("qd"))
    val adc = codes
      .join(broadcast(lut), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("qd")).as("adist"))
    val w = Window.partitionBy("qid").orderBy(col("adist").asc, col("vec_id").asc)
    graft.plans.TopK
      .perKey(adc, Seq(col("qid")), Seq(col("adist").asc, col("vec_id").asc), PQ_K)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("qid", "rank", "vec_id", "adist")
      .orderBy("qid", "rank")
  }

  val pqSql: String = {
    val d2 = (a: String, b: String) =>
      s"CAST(list_dot_product($a,$a) + list_dot_product($b,$b) - 2*list_dot_product($a,$b) AS BIGINT)"
    s"""WITH $SQL_QUANTIZED,
       |sub AS (
       |  SELECT vec_id, m, list_slice(q, m*$PQ_SUB + 1, m*$PQ_SUB + $PQ_SUB) s
       |  FROM qn, generate_series(0, ${PQ_M - 1}) g(m)),
       |seed AS (SELECT m, vec_id cid, s c FROM sub WHERE vec_id < $PQ_CODES),
       |asg0 AS (
       |  SELECT vec_id, m, s, cid FROM (
       |    SELECT sub.vec_id, sub.m, sub.s, seed.cid,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.m
       |                              ORDER BY ${d2("sub.s", "seed.c")} ASC, seed.cid ASC) rn
       |    FROM sub JOIN seed ON sub.m = seed.m)
       |  WHERE rn = 1),
       |cb AS (
       |  SELECT m, cid, list(cv ORDER BY pos) c FROM (
       |    SELECT a.m, a.cid, g.pos, CAST(sum(a.s[g.pos]) // count(*) AS BIGINT) cv
       |    FROM asg0 a, generate_series(1, $PQ_SUB) g(pos)
       |    GROUP BY a.m, a.cid, g.pos)
       |  GROUP BY m, cid),
       |codes AS (
       |  SELECT vec_id, m, cid FROM (
       |    SELECT sub.vec_id, sub.m, cb.cid,
       |           row_number() OVER (PARTITION BY sub.vec_id, sub.m
       |                              ORDER BY ${d2("sub.s", "cb.c")} ASC, cb.cid ASC) rn
       |    FROM sub JOIN cb ON sub.m = cb.m)
       |  WHERE rn = 1),
       |lut AS (
       |  SELECT sub.vec_id qid, sub.m, cb.cid, ${d2("sub.s", "cb.c")} qd
       |  FROM sub JOIN cb ON sub.m = cb.m
       |  WHERE sub.vec_id >= $PQ_CODES AND sub.vec_id < ${PQ_CODES + PQ_QUERIES}),
       |adc AS (
       |  SELECT qid, vec_id, CAST(sum(qd) AS BIGINT) adist
       |  FROM codes JOIN lut USING (m, cid)
       |  WHERE vec_id <> qid
       |  GROUP BY 1, 2)
       |SELECT qid, rank, vec_id, adist FROM (
       |  SELECT qid, vec_id, adist,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY adist ASC, vec_id ASC) rank
       |  FROM adc)
       |WHERE rank <= $PQ_K ORDER BY qid, rank""".stripMargin
  }

  // ---- contract surface --------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_knn" -> (knn _),
    "sim_lsh_nn" -> (lshNn _),
    "sim_ivf" -> (ivf _),
    "sim_pq" -> (pq _),
    "dd_embed_cos" -> (embedCos _),
    "dd_semantic" -> (semantic _)
  )

  def oracles: Map[String, String] = Map(
    "sim_knn" -> knnSql,
    "sim_lsh_nn" -> lshNnSql,
    "sim_ivf" -> ivfSql,
    "sim_pq" -> pqSql,
    "dd_embed_cos" -> embedCosSql,
    "dd_semantic" -> semanticSql
  )
}
