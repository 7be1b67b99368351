package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFns
import graft.sources.Tables
import graft.operators.{Multimodal, Similarity}

/** Embedding similarity search + multimodal-column coverage
  * (north-star operators; no counterpart in the reference ETL).
  *
  * Cross-engine float policy: raw embedding floats pass through
  * untouched; every *derived* score is either (a) computed over
  * DECIMAL for order-independence (centroids) or (b) rounded to 4
  * decimals with the row selection keyed on the rounded value plus an
  * id tie-break, so a sub-1e-4 engine difference cannot change the
  * selected rows (cosine top-k).
  */
object Vectors {

  /** DuckDB twin of `Similarity.kmeans(k = 8, iters = 2)` — unrolled
    * Lloyd rounds ending in `asg(vec_id, cluster_id, cosine)`. Shared
    * by q74 (the assignment itself), q85 (diversity sampling over it)
    * and q86 (semantic dedup inside its clusters); defined before
    * `all` because the catalog Seq interpolates it at object init. */
  private val kmeansCte: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
      |a1 AS (SELECT e.vec_id, e.v, c.cid,
      |    round(list_cosine_similarity(e.v, c.cv), 4) AS s
      |  FROM e CROSS JOIN c0 c),
      |b1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
      |    ORDER BY s DESC, cid) AS rn FROM a1),
      |as1 AS (SELECT vec_id, v, cid FROM b1 WHERE rn = 1),
      |u1 AS (SELECT cid, dim,
      |    CAST(sum(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS mv
      |  FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim
      |        FROM as1)
      |  GROUP BY cid, dim),
      |c1 AS (SELECT cid, list(mv ORDER BY dim) AS cv FROM u1 GROUP BY cid),
      |a2 AS (SELECT e.vec_id, c.cid,
      |    round(list_cosine_similarity(e.v, c.cv), 4) AS s
      |  FROM e CROSS JOIN c1 c),
      |b2 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
      |    ORDER BY s DESC, cid) AS rn FROM a2),
      |asg AS (SELECT vec_id, cid AS cluster_id, s AS cosine
      |  FROM b2 WHERE rn = 1)""".stripMargin

  /** Deterministic CLUSTERED embedding fixture (closed-form per row —
    * no window, no randomness): cluster `L = vec_id % 10` has center
    * `c_L[j] = ±1` (Knuth-hash sign of `L·64+j`), and member
    * `i = vec_id / 10` inflates ONE dimension `d = i % 64` ALONG the
    * center's sign by `eps(i)` — `0.05·(i+1)` for the 8 nearest
    * members, `2.0` for the rest. Inflating along the sign keeps the
    * numerator `q·v = 64 + eps_q + eps_v` and makes exact cosine
    * STRICTLY DECREASING in `eps_v` (d/de of
    * `(64+eps_q+e)/√(64+2e+e²)` has the sign of `−eps_q(1+e) < 0`),
    * so every query's true top-5 is its cluster's five smallest-eps
    * members — which are also its five smallest vec_ids, aligning the
    * id tie-breaks every approximate scorer uses. Consecutive near
    * members differ by ≳ 7.8e-4 in cosine, an order above the 1e-4
    * rounding, and signs never flip, so sign-band LSH keys are
    * constant within a cluster. Cross-cluster cosine is a ±1
    * random-sign correlation (≈ 0 ± 0.12) — clusters are cleanly
    * separable, which is exactly what the near-random stock
    * embeddings lack (the q148 floors sit at the random baseline for
    * that reason). Emitted as ARRAY<FLOAT> with `label = vec_id % 10`
    * so every ANN path runs bit-identically to its q148 wiring. */
  def clusteredEmbeddings(emb: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val v = col("vec_id")
    val label = pmod(v, lit(10L))
    val idx = floor(v / lit(10L)).cast("long")
    val dmark = pmod(idx, lit(64L))
    val eps = when(idx < 8, (idx + 1).cast("double") * lit(0.05))
      .otherwise(lit(2.0))
    val vec = transform(sequence(lit(0L), lit(63L)), j => {
      val h = shiftright((label * 64L + j) * lit(2654435761L), 16)
      val sgn = when(pmod(h, lit(2L)) === 0L, lit(1.0)).otherwise(lit(-1.0))
      (sgn * (lit(1.0) + when(j === dmark, eps).otherwise(lit(0.0))))
        .cast("float")
    })
    emb.select(v.as("vec_id"), label.cast("int").as("label"),
      vec.as("embedding"))
  }

  /** recall@k of one approximate result against the exact top-k, as a
    * single hashed gate row `(method, n_queries, recall_ok)` — shared
    * by the q148 regression gate and the q153 quality gate. */
  private def recallGate(exact: org.apache.spark.sql.DataFrame,
      ann: org.apache.spark.sql.DataFrame, method: String,
      floor: Double): org.apache.spark.sql.DataFrame = {
    val hits = ann.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("n"))
      .join(hits, Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"),
        (sum(coalesce(col("hits"), lit(0L))).cast("double") /
          sum(col("n"))).as("recall"))
      .select(lit(method).as("method"), col("n_queries"),
        (col("recall") >= floor).as("recall_ok"))
  }

  val all: Seq[Q] = Seq(

    // Brute-force cosine top-k: small query set broadcast against the
    // corpus — the exact-search baseline (one map stage + k·|Q| rows
    // into the final top-k shuffle).
    Q("q50_cosine_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cosine
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, cosine, rank FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
          emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, roundTo = 4)
        .orderBy("query_id", "rank")
    },

    // k-NN label vote: predict a query vector's label from its top-5
    // neighbors' labels (composition: top-k → join labels → argmax).
    Q("q51_knn_label_vote",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 4) AS cosine
        |  FROM q JOIN embeddings c ON c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored),
        |votes AS (
        |  SELECT query_id, label, count(*) AS cnt FROM ranked
        |  WHERE rank <= 5 GROUP BY query_id, label),
        |best AS (
        |  SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cnt DESC, label) AS rn
        |  FROM votes)
        |SELECT query_id, label AS pred_label FROM best WHERE rn = 1
        |ORDER BY query_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val topk = Similarity.bruteForceTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, roundTo = 4)
      val votes = topk
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")), Seq("neighbor_id"))
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("query_id")).orderBy(desc("cnt"), asc("label"))
      votes.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("query_id"), col("label").as("pred_label"))
        .orderBy("query_id")
    },

    // Per-label centroid cells (first 8 dims) — element-wise mean via
    // posexplode + regroup; DECIMAL accumulation for order-independence.
    Q("q52_label_centroids",
      """SELECT label, CAST(dim AS BIGINT) AS dim,
        |  CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS mean_v
        |FROM (
        |  SELECT label, unnest(embedding) AS v,
        |         generate_subscripts(embedding, 1) AS dim
        |  FROM embeddings)
        |WHERE dim <= 8
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("dim", (col("pos") + 1).cast("long"))
        .where(col("dim") <= 8)
        .groupBy(col("label"), col("dim"))
        .agg((sum(col("v").cast("double").cast(DecimalType(20, 10))).cast("double") /
          count(lit(1))).as("mean_v"))
        .orderBy("label", "dim")
    },

    // k-means (2 Lloyd rounds, k=8, seeded from the 8 smallest ids):
    // centroids are collected model state re-inlined as literals, so
    // assignment is map-only unrolled codegen and the update shuffles
    // only (cid, dim) sums. DECIMAL centroid means make even the
    // round-2 assignment bit-identical to the oracle's unrolled CTEs
    // (Vectors.kmeansCte, shared with q85/q86).
    Q("q74_kmeans",
      s"""$kmeansCte
        |SELECT vec_id, cluster_id, cosine
        |FROM asg ORDER BY vec_id""".stripMargin) { (s, d) =>
      Similarity.kmeans(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2)
        .orderBy("vec_id")
    },

    // Diversity-aware corpus selection: cluster the embedding space
    // (q74's k-means) and keep the 25 nearest-to-centroid vectors per
    // cluster — per-cluster quotas preserve coverage of every region
    // instead of letting one dense mode dominate the sample. The cap
    // is one ranked window over the assignment output (the capPerGroup
    // shape); everything upstream is the already-proven k-means.
    Q("q85_diversity_sample",
      s"""$kmeansCte,
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank FROM asg)
        |SELECT cluster_id, vec_id, cosine, rank FROM rk
        |WHERE rank <= 25 ORDER BY cluster_id, rank""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val asg = Similarity.kmeans(Tables.embeddings(s, d), "vec_id", "embedding",
        k = 8, iters = 2)
      asg
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("cluster_id"))
            .orderBy(desc("cosine"), col("vec_id"))).cast("long"))
        .where(col("rank") <= 25)
        .select(col("cluster_id"), col("vec_id"), col("cosine"), col("rank"))
        .orderBy("cluster_id", "rank")
    },

    // Semantic dedup (SemDeDup-shaped): exact cosine runs ONLY between
    // same-cluster pairs of the q74 assignment, and a vector dies iff
    // a smaller-id cluster-mate scores >= 0.4 against it (keep-first).
    // The cluster key bounds the candidate join — Σ|cluster|², not N²;
    // k grows with the corpus to hold cluster size constant.
    Q("q86_semdedup",
      s"""$kmeansCte,
        |wv AS (SELECT asg.vec_id, asg.cluster_id, asg.cosine, e.v
        |  FROM asg JOIN e USING (vec_id)),
        |dup AS (SELECT DISTINCT b.vec_id AS vid
        |  FROM wv a JOIN wv b
        |    ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4)
        |SELECT w.vec_id, w.cluster_id, w.cosine FROM wv w
        |WHERE w.vec_id NOT IN (SELECT vid FROM dup)
        |ORDER BY w.vec_id""".stripMargin) { (s, d) =>
      Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 2, threshold = 0.4)
        .orderBy("vec_id")
    },

    // LSH-bucketed ANN — the scale path (OR-amplified bands bound the
    // candidate set, hot buckets capped). Sign-plane keys are integer-
    // only and the rescore is rounded, so the approximate result is
    // still DETERMINISTIC → full hash check against the generated twin.
    Q("q53_lsh_ann", Vectors.lshAnnOracle) { (s, d) =>
      Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
          dims = 64, planesPerBand = 8, k = 5, bands = 4, maxBucketFreq = 200)
        .orderBy("query_id", "rank")
    },

    // Embedding-cosine near-dup pairs (exact all-pairs baseline, scored
    // by the native codegen cosine; threshold on the rounded score).
    Q("q54_cosine_neardup",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                               CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4, roundTo = 4)
        .orderBy("id_a", "id_b")
    },

    // Scale path for near-dup: axis-sign SimHash band candidates +
    // exact rescore. Candidate generation is integer-only (sign tests
    // on stored components), so unlike classic float-LSH the candidate
    // set is bit-reproducible in the oracle → full hash check. Finds
    // the subset of q54's pairs that collide in ≥1 of 8 sign bands —
    // at 100 TB this replaces q54's O(N²) all-pairs with bucket-bounded
    // joins that shuffle only (band, key, id) triples.
    Q("q55_banded_neardup", Vectors.bandedNeardupOracle) { (s, d) =>
      Similarity.bandedCosinePairs(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4, bands = 8, bitsPerBand = 8, maxBandFreq = 200, roundTo = 4)
        .orderBy("id_a", "id_b")
    },

    // IVF-style ANN: bounded codebook (label centroids as the
    // deterministic stand-in for a trained one) partitions the corpus;
    // queries probe nprobe cells. Assignment/scoring on the rounded
    // cosine → fully deterministic → full hash check, unlike
    // float-plane LSH (q53).
    Q("q57_ivf_ann", Vectors.ivfOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
          emb, emb.where(col("vec_id") < 8),
          Similarity.codebookFromLabels(emb, "label", "embedding"),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .orderBy("query_id", "rank")
    },

    // Stored-codebook IVF (incremental ANN): the codebook persists as
    // a manifest-committed table and the probe reads it back — the
    // q103/q105 stored-index pattern for vector search, so arriving
    // batches share ONE index instead of re-deriving it per query.
    // The oracle is the inline-codebook q57 SQL: centroids round-trip
    // parquet bit-exactly, so stored and inline probes must agree to
    // the hash. BucketingSpec gates the plan: the stored side is one
    // broadcast of a k-row table, zero added exchanges vs inline.
    Q("q110_stored_ivf_ann", Vectors.ivfOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_ivf_codebook_" + Integer.toHexString(d.hashCode) +
          "_" + Q.runId).toString
      Similarity.storeCodebook(
        Similarity.codebookFromLabels(emb, "label", "embedding"), root)
      Similarity.ivfTopK(
          emb, emb.where(col("vec_id") < 8),
          Similarity.loadCodebook(s, root),
          "vec_id", "embedding", k = 5, nprobe = 2)
        .orderBy("query_id", "rank")
    },

    // Product quantization + ADC top-k: each 64-dim vector compresses
    // to 8 subspace cell codes; queries score corpus CODES through a
    // broadcast lookup table (cos of the reconstructed vector) and
    // never reread the embeddings — the memory/IO shape billion-scale
    // ANN actually ships. Subspace codebooks derive from the label
    // means (the q57 deterministic-codebook policy), encode is rounded
    // L2-argmin with cell tie-break, ADC partials sum in DECIMAL — the
    // whole pipeline hash-checks against the SQL twin.
    Q("q119_pq_ann", Vectors.pqOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cb = Similarity.pqCodebooks(emb, "label", "embedding", m = 8, dims = 64)
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 8), cb,
          "vec_id", "embedding", k = 5, subLen = 8)
        .orderBy("query_id", "rank")
    },

    // Stored-codebook PQ (incremental compressed ANN): the subspace
    // codebooks persist as a manifest-committed table (the q110
    // stored-index pattern), so arriving batches ENCODE against the
    // same frozen index — the production PQ lifecycle, where codes are
    // only comparable if every batch used the same codebooks. The
    // oracle is the inline q119 SQL: double centroids round-trip
    // parquet bit-exactly, so stored and inline must agree to the hash.
    Q("q120_stored_pq_ann", Vectors.pqOracle) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val root = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_pq_codebook_" + Integer.toHexString(d.hashCode) +
          "_" + Q.runId).toString
      graft.sources.Lake.commitOverwrite(
        Similarity.pqCodebooks(emb, "label", "embedding", m = 8, dims = 64)
          .select(col("sub"), col("cell"), col("centroid")), root)
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 8),
          graft.sources.Lake.readCommitted(s, root),
          "vec_id", "embedding", k = 5, subLen = 8)
        .orderBy("query_id", "rank")
    },

    // Int8 scalar quantization + quantized top-k: the 4×-smaller index
    // representation an ANN system scores at scale. All arithmetic
    // before the final sqrt/div is exact-integer, so the whole result
    // hash-matches bit-exactly (no accumulation-order caveat).
    Q("q69_quantized_topk",
      """WITH qz AS (
        |  SELECT vec_id,
        |    CASE WHEN coalesce(mx, 0.0) = 0.0 THEN list_transform(dv, x -> 0.0)
        |         ELSE list_transform(dv, x -> floor((x * (127.0 / mx)) + 0.5)) END AS qv
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS mx
        |        FROM embeddings)),
        |q AS (SELECT vec_id AS query_id, qv AS qq FROM qz WHERE vec_id < 8),
        |sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.qq, c.qv) AS qd,
        |    list_dot_product(q.qq, q.qq) AS na2,
        |    list_dot_product(c.qv, c.qv) AS nb2
        |  FROM q JOIN qz c ON c.vec_id <> q.query_id),
        |s2 AS (SELECT query_id, neighbor_id, CAST(qd AS BIGINT) AS qdot,
        |    round(CASE WHEN na2 * nb2 = 0.0 THEN 0.0
        |               ELSE qd / (sqrt(na2) * sqrt(nb2)) END, 4) AS qcos
        |  FROM sc),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |                ORDER BY qcos DESC, neighbor_id) AS rank FROM s2)
        |SELECT query_id, neighbor_id, qdot, qcos, rank FROM r
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.quantizedTopK(
          emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    // Power-iteration PCA: the corpus's top principal direction by
    // v ← rescale(Xᵀ(Xv)) — the covariance matrix is NEVER
    // materialized; each of the 8 rounds is one map-only projection
    // pass against the broadcast-literal direction + one dims-group
    // partial-aggregatable shuffle + a 64-component exact driver
    // rescale (the k-means literal-sync precedent). Fixed-point
    // integer end-to-end (power-of-two scales, sign-split truncating
    // division), so every projection hash-matches the 8-step
    // unrolled-CTE oracle bit for bit. The output is each vector's
    // exact integer projection onto the final direction — the
    // spectral outlier/curriculum signal next to q74's clusters.
    Q("q140_power_iteration", Vectors.powerIterOracle) { (s, d) =>
      Similarity.powerIteration(Tables.embeddings(s, d),
          "vec_id", "embedding", dims = 64, rounds = 8)
        .orderBy("vec_id")
    },

    // Embedding-level decontamination: q76's eval-leak sweep in the
    // semantic space — corpus vectors whose max cosine against the
    // broadcast benchmark set reaches 0.5 are dropped (paraphrased
    // leakage that exact shingle overlap misses). The q50 brute-force
    // scoring shape; payloads never shuffle. Survivors + their
    // max_cos under the hash.
    Q("q143_embedding_decontam",
      """WITH b AS (SELECT embedding AS bv FROM embeddings WHERE vec_id % 10 = 7),
        |c AS (SELECT vec_id, label, embedding FROM embeddings
        |      WHERE vec_id % 10 <> 7),
        |m AS (SELECT c.vec_id, c.label,
        |    max(round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                     CAST(b.bv AS DOUBLE[])), 4)) AS max_cos
        |  FROM c, b GROUP BY c.vec_id, c.label)
        |SELECT vec_id, label, max_cos FROM m
        |WHERE max_cos < 0.5 ORDER BY vec_id""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.decontaminateByCosine(
          emb.where(pmod(col("vec_id"), lit(10)) =!= 7)
            .select("vec_id", "label", "embedding"),
          emb.where(pmod(col("vec_id"), lit(10)) === 7),
          "vec_id", "embedding", threshold = 0.5)
        .select("vec_id", "label", "max_cos")
        .orderBy("vec_id")
    },

    // Multimodal: binary payload column + metadata/feature extraction
    // (decode stubbed — container has no codecs; plumbing is real).
    Q("q60_media_features",
      """SELECT doc_id AS media_id,
        |  'application/x-demo-' || substr(md5(text), 1, 4) AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS content_md5,
        |  CAST(CAST(('0x' || substr(md5(text), 1, 4)) AS UBIGINT) % 1024 + 64 AS INT) AS width,
        |  CAST(CAST(('0x' || substr(md5(text), 5, 4)) AS UBIGINT) % 1024 + 64 AS INT) AS height
        |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
      Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.documents(s, d), "doc_id", "text"))
        .orderBy("media_id")
    },

    // mapPartitions-based batched decode over REAL images: the fixture
    // writes a genuine 24-bit BMP per document (dims/seed derived from
    // md5(text) nibbles), javax.imageio decodes it, and the result
    // columns are the image's ACTUAL width/height plus the decoded
    // pixel-sum checksum. The oracle never decodes — it recomputes the
    // ground-truth dims, the exact BMP byte length (54-byte header +
    // 4-byte-padded rows), and the pixel sum arithmetically — so a
    // codec that returned wrong dimensions or wrong pixel bytes breaks
    // the hash. content_md5 of the payload is real too but not
    // SQL-derivable (the oracle can't construct BMP bytes), so the
    // catalog projection keeps the arithmetic-checkable columns.
    Q("q61_media_decode_partitioned", Vectors.mediaDecodeOracle) { (s, d) =>
      Multimodal.decodePartitioned(
          Multimodal.imagesFromDocuments(Tables.documents(s, d), "doc_id", "text"))
        .select(col("media_id"), col("mime"), col("byte_len"),
          col("width"), col("height"), col("pixel_sum"))
        .orderBy("media_id")
    },

    // Partition-local REAL resize: decode via javax.imageio →
    // nearest-neighbor resample to 48x48 (dst pixel (x,y) = src
    // (x*w/48, y*h/48), integer floor — the one resampling rule an SQL
    // oracle replicates exactly) → deterministic BMP re-encode. The
    // oracle checks the resized pixel sum and the re-encoded byte
    // length; both are pure arithmetic over the generator's
    // ground-truth ramp, so the decode, the resample arithmetic AND
    // the re-encode framing are all under the hash.
    Q("q62_media_resize", Vectors.mediaResizeOracle) { (s, d) =>
      Multimodal.resizePartitioned(
          Multimodal.imagesFromDocuments(Tables.documents(s, d), "doc_id", "text"),
          dstW = 48, dstH = 48)
        .select(col("media_id"), col("mime"), col("width"), col("height"),
          length(col("payload")).cast("long").as("byte_len"), col("pixel_sum"))
        .orderBy("media_id")
    },

    // Frame sampling over FIVE real containers: docs with id%5=0 are
    // standard multi-frame ANIMATED GIFs (stock-JDK image-block walk),
    // id%5=2 MULTI-PAGE TIFFs (stock-JDK IFD-chain walk) — both
    // lossless by construction (indexed frames over an exact gray
    // palette) — id%5=3 uncompressed-DIB AVIs (RIFF chunk walk to the
    // movi LIST, per-'00db' frame decode), id%5=4 ISO-BMFF MP4s
    // carrying 'DIB ' samples (big-endian box walk to the stbl,
    // stsc/stsz/stco sample reconstruction — the container gives real
    // frame boundaries with NO codec; a compressed-fourcc mp4 keeps
    // that structure and NULLs only the pixel columns), and the rest
    // length-prefixed BMP containers whose demuxer walks the per-frame
    // size fields; all sample every 2nd frame up to 3 and genuinely
    // decode each sampled frame. Dims and per-frame pixel sums (frame
    // f's ramp is offset by f) share one closed form the oracle
    // recomputes arithmetically; per-frame byte length exists only
    // where the container byte-delimits frames (NULL for GIF/TIFF).
    // The stride chunker remains only for genuinely non-JDK codecs.
    Q("q63_frame_sample", Vectors.frameSampleOracle) { (s, d) =>
      Multimodal.frameSample(
          Multimodal.videosFromDocuments(Tables.documents(s, d), "doc_id", "text"),
          everyNth = 2, maxFrames = 3)
        .select(col("media_id"), col("frame_idx"), col("width"), col("height"),
          col("pixel_sum"), col("frame_bytes"))
        .orderBy("media_id", "frame_idx")
    },

    // Audio decode over REAL 16-bit PCM WAVs: the fixture writes a
    // genuine RIFF stream per document (sample count / rate / seed from
    // md5(text) nibbles, sample i = ((seed+1)·40503·(i+1)) % 65536 -
    // 32768), the stock-JDK javax.sound reader genuinely parses and
    // decodes it, and peak/energy are integer-exact over the decoded
    // samples — all recomputed arithmetically by the oracle, which
    // never touches a WAV byte.
    Q("q94_audio_decode", Vectors.audioDecodeOracle) { (s, d) =>
      Multimodal.decodeAudioPartitioned(
          Multimodal.audioFromDocuments(Tables.documents(s, d), "doc_id", "text"))
        .orderBy("media_id")
    },

    // Image near-dup by perceptual average-hash over REAL decoded
    // pixels: 8×8 nearest-neighbor grid, integer luminance vs grid
    // mean (no division — lum·64 ≥ Σ), 16-hex-char hash, dup groups
    // keyed by hash. The oracle recomputes the same bits from the
    // generator's ramp arithmetic — decode, sampling rule, threshold
    // and byte packing are all under the hash. Undecodable media
    // carries no hash and joins no group.
    Q("q104_image_ahash_dedup", Vectors.imageAHashOracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Multimodal.aHashPartitioned(
          Multimodal.imagesFromDocuments(Tables.documents(s, d), "doc_id", "text"))
        .where(col("ahash").isNotNull)
        .withColumn("dup_group",
          min(col("media_id")).over(Window.partitionBy(col("ahash"))))
        .orderBy("media_id")
    },

    // Audio near-dup by acoustic fingerprint over REAL decoded
    // samples: 32 equal time slices, one bit per energy-delta sign
    // (the Haitsma–Kalker/landmark shape collapsed to one band so the
    // bits are integer-exact), dup groups keyed by the packed
    // fingerprint — the q104 pattern for the audio modality. The
    // oracle recomputes every bit from the WAV generator's sample
    // arithmetic; decode, slicing rule, strict-> threshold and bit
    // packing are all under the hash. Undecodable audio carries no
    // fingerprint and joins no group.
    Q("q123_audio_fingerprint", Vectors.audioFingerprintOracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Multimodal.fingerprintAudioPartitioned(
          Multimodal.audioFromDocuments(Tables.documents(s, d), "doc_id", "text"))
        .where(col("fingerprint").isNotNull)
        .withColumn("dup_group",
          min(col("media_id")).over(Window.partitionBy(col("fingerprint"))))
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("fingerprint"), col("dup_group"))
        .orderBy("media_id")
    },

    // Video near-dup: per-frame perceptual aHash (q104's image hash at
    // frame granularity, computed during the one demux pass) rolled up
    // into a video fingerprint — md5 over the frame-ordered hash
    // string — with dup groups keyed by it. Completes the modality ×
    // dedup matrix: image (q104), audio (q123), video (here). All four
    // real containers are under the hash; frame order is pinned by an
    // array_sort on (frame_idx, hash), never collect_list order. The
    // oracle re-derives every frame's aHash bits from the generator's
    // ramp arithmetic (frame f's ramp is offset by f).
    Q("q127_video_fingerprint", Vectors.videoFingerprintOracle) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val frames = Multimodal.frameSample(
        Multimodal.videosFromDocuments(Tables.documents(s, d), "doc_id", "text"),
        everyNth = 1, maxFrames = 8)
      frames.where(col("frame_ahash").isNotNull)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          md5(concat_ws("",
            transform(
              array_sort(collect_list(struct(col("frame_idx"), col("frame_ahash")))),
              x => x.getField("frame_ahash")))).as("fingerprint"))
        .withColumn("dup_group",
          min(col("media_id")).over(Window.partitionBy(col("fingerprint"))))
        .orderBy("media_id")
    },

    // TRAINING-RECORD ASSEMBLY across all four modalities: one wide
    // row per document joining the text token count with the REAL
    // decoded image dims/pixel-sum, audio duration/energy, and video
    // frame count — the last step of a multimodal pipeline, where the
    // per-modality feature tables (each produced by a partition-local
    // codec pass) meet on the document key. Three codec passes + three
    // equi-joins on doc_id; at 100 TB each feature table is the
    // already-materialized output of its own stage, so the assembly
    // is pure co-partitioned joins of fixed-width rows. Every joined
    // value is under the hash (closed-form fixture arithmetic).
    Q("q131_multimodal_record", Vectors.multimodalRecordOracle) { (s, d) =>
      val docs = Tables.documents(s, d)
      val txt = docs.where(col("text").isNotNull).select(col("doc_id"),
        size(TextFns.tokens(TextFns.normalize(col("text")))).cast("long").as("n_tokens"))
      val img = Multimodal.decodePartitioned(
          Multimodal.imagesFromDocuments(docs, "doc_id", "text"))
        .select(col("media_id").as("doc_id"), col("width").as("img_w"),
          col("height").as("img_h"), col("pixel_sum").as("img_pixel_sum"))
      val aud = Multimodal.decodeAudioPartitioned(
          Multimodal.audioFromDocuments(docs, "doc_id", "text"))
        .select(col("media_id").as("doc_id"), col("duration_ms").as("audio_ms"),
          col("energy").as("audio_energy"))
      val vid = Multimodal.frameSample(
          Multimodal.videosFromDocuments(docs, "doc_id", "text"),
          everyNth = 1, maxFrames = 8)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"))
        .select(col("media_id").as("doc_id"), col("n_frames"))
      txt.join(img, "doc_id").join(aud, "doc_id").join(vid, "doc_id")
        .orderBy("doc_id")
    },

    // ANN recall gate UNDER THE HASH (the q90/q144 bounded-guarantee
    // discipline): every approximate path — sign-band LSH (q53), IVF
    // (q57), PQ ADC (q119), int8 quantized (q69) — is scored as
    // recall@5 against the exact q50 brute-force top-5 on the SAME
    // query set, and the in-bound flags are hashed against literal
    // TRUE. Every pipeline here is deterministic, so recall is exactly
    // reproducible: a banding, nprobe, encode or quantization
    // regression that costs recall flips a flag and fails the round.
    // The floors are REGRESSION floors, not quality claims — the
    // synthetic embeddings are near-random (no cluster structure), so
    // bucketed methods sit near the random-candidate baseline by
    // construction (measured sf0.01/sf0.1: lsh 0.100/0.075, ivf
    // 0.375/0.425, pq 0.150/0.025, int8 0.975/1.000); int8 is
    // near-exact everywhere and gates the scoring arithmetic itself.
    Q("q148_ann_recall",
      """SELECT method, CAST(n_queries AS BIGINT) AS n_queries, recall_ok
        |FROM (VALUES ('int8', 8, TRUE), ('ivf', 8, TRUE),
        |             ('lsh', 8, TRUE), ('pq', 8, TRUE))
        |  AS t(method, n_queries, recall_ok)
        |ORDER BY method""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val queries = emb.where(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        k = 5, roundTo = 4).select(col("query_id"), col("neighbor_id"))
      def gate(ann: org.apache.spark.sql.DataFrame, method: String,
          floor: Double) = recallGate(exact, ann, method, floor)
      gate(Similarity.lshTopK(emb, "vec_id", "embedding", dims = 64,
          planesPerBand = 8, k = 5, bands = 4, maxBucketFreq = 200)
          .where(col("query_id") < 8), "lsh", floor = 0.05)
        .unionByName(gate(Similarity.ivfTopK(emb, queries,
          Similarity.codebookFromLabels(emb, "label", "embedding"),
          "vec_id", "embedding", k = 5, nprobe = 2), "ivf", floor = 0.25))
        .unionByName(gate(Similarity.pqTopK(emb, queries,
          Similarity.pqCodebooks(emb, "label", "embedding", m = 8, dims = 64),
          "vec_id", "embedding", k = 5, subLen = 8), "pq", floor = 0.02))
        .unionByName(gate(Similarity.quantizedTopK(emb, queries,
          "vec_id", "embedding", k = 5), "int8", floor = 0.9))
        .orderBy("method")
    },

    // ANN recall gate that BINDS ON QUALITY: the same four approximate
    // paths as q148, run over the deterministic CLUSTERED fixture
    // ([[clusteredEmbeddings]] — per-label ±1 centers, one inflated
    // dim per member) where real retrieval structure exists, gated at
    // recall@5 ≥ 0.8 and hashed against literal TRUE. q148's floors
    // sit at the random-candidate baseline because the stock synthetic
    // embeddings carry no cluster structure — it catches determinism
    // regressions but a banding/nprobe/encode change that destroyed
    // actual retrieval quality could still pass it; THIS gate fails
    // the round for any such change (measured on the fixture: lsh,
    // ivf, pq and int8 all at recall 1.0 for sf0.01 AND sf0.1 — the
    // 0.8 floor leaves margin for tie-flips only, not for structural
    // regressions). lsh probes with a cluster-sized bucket cap: the
    // fixture's whole point is that a cluster shares its band keys,
    // so the hot-bucket guard must admit cluster-sized buckets here.
    Q("q153_ann_clustered_recall",
      """SELECT method, CAST(n_queries AS BIGINT) AS n_queries, recall_ok
        |FROM (VALUES ('int8', 8, TRUE), ('ivf', 8, TRUE),
        |             ('lsh', 8, TRUE), ('pq', 8, TRUE))
        |  AS t(method, n_queries, recall_ok)
        |ORDER BY method""".stripMargin) { (s, d) =>
      val emb = clusteredEmbeddings(Tables.embeddings(s, d))
      val queries = emb.where(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        k = 5, roundTo = 4).select(col("query_id"), col("neighbor_id"))
      def gate(ann: org.apache.spark.sql.DataFrame, method: String) =
        recallGate(exact, ann, method, floor = 0.8)
      gate(Similarity.lshTopK(emb, "vec_id", "embedding", dims = 64,
          planesPerBand = 8, k = 5, bands = 4, maxBucketFreq = 2048)
          .where(col("query_id") < 8), "lsh")
        .unionByName(gate(Similarity.ivfTopK(emb, queries,
          Similarity.codebookFromLabels(emb, "label", "embedding"),
          "vec_id", "embedding", k = 5, nprobe = 2), "ivf"))
        .unionByName(gate(Similarity.pqTopK(emb, queries,
          Similarity.pqCodebooks(emb, "label", "embedding", m = 8, dims = 64),
          "vec_id", "embedding", k = 5, subLen = 8), "pq"))
        .unionByName(gate(Similarity.quantizedTopK(emb, queries,
          "vec_id", "embedding", k = 5), "int8"))
        .orderBy("method")
    })

  /** Shared oracle prelude: the stub decoder's pseudo-dimensions.
    * `Multimodal.stubDecode` derives them from the payload's md5 —
    * first 4 hex nibbles → width, next 4 → height, the SAME derivation
    * as `extractFeatures`/q60, so one CTE serves decode, resize, and
    * feature extraction. (md5 of the UTF-8 payload equals md5 of the
    * text string — the corpus is ASCII, verified at every SF.) */
  /** Shared oracle prelude: the image fixture's ground truth. The
    * generator (`Multimodal.imagesFromDocuments`) derives dims/seed
    * from md5(text) hex nibbles with the exact same arithmetic, and
    * pixel (x, y) of the emitted BMP is `(seed + x + y) % 256` on all
    * three channels — so decoded dimensions, exact BMP byte length
    * (54-byte header + rows padded to 4 bytes) and whole-image pixel
    * sums are all closed-form here, no image decode needed. */
  private def imageDimsCte: String =
    """dims AS (
      |  SELECT doc_id AS media_id,
      |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 64 + 8 AS w,
      |    CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 64 + 8 AS h,
      |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS s
      |  FROM documents WHERE text IS NOT NULL)""".stripMargin

  /** DuckDB twin of q61: real-decode metadata recomputed
    * arithmetically — dims from the md5 nibbles, byte_len from the BMP
    * layout, pixel_sum by enumerating the (x, y) grid (≤71×71 per doc,
    * a few million cheap rows at the verify SF). */
  lazy val mediaDecodeOracle: String =
    s"""WITH $imageDimsCte,
       |xs AS (SELECT media_id, h, s, unnest(generate_series(0, w - 1)) AS x FROM dims),
       |xy AS (SELECT media_id, s, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
       |ps AS (SELECT media_id, CAST(sum(3 * ((s + x + y) % 256)) AS BIGINT) AS pixel_sum
       |       FROM xy GROUP BY media_id)
       |SELECT d.media_id, 'image/bmp' AS mime,
       |  CAST(54 + d.h * (((3 * d.w + 3) // 4) * 4) AS BIGINT) AS byte_len,
       |  CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height, ps.pixel_sum
       |FROM dims d JOIN ps ON d.media_id = ps.media_id
       |ORDER BY d.media_id""".stripMargin

  /** DuckDB twin of q104: the 8×8 average-hash recomputed from the
    * ramp ground truth. Sampling follows the q62 nearest-neighbor
    * rule ((x·w)//8, (y·h)//8); luminance is the integer r+g+b =
    * 3·((s + sx + sy) % 256); a bit is set when lum·64 ≥ the grid
    * total (exact integer compare, no division); byte y packs row
    * y's bits LSB-first and the hash is the y-ordered hex concat —
    * identical to `ImageCodec.aHashHex`. */
  lazy val imageAHashOracle: String =
    s"""WITH $imageDimsCte,
       |gx AS (SELECT media_id, w, h, s, unnest(generate_series(0, 7)) AS x FROM dims),
       |samp AS (SELECT media_id, x, y,
       |    3 * ((s + (x * w) // 8 + (y * h) // 8) % 256) AS lum
       |  FROM (SELECT media_id, w, h, s, x, unnest(generate_series(0, 7)) AS y FROM gx)),
       |tot AS (SELECT media_id, sum(lum) AS total FROM samp GROUP BY media_id),
       |bytes AS (
       |  SELECT sp.media_id, sp.y,
       |    sum(CASE WHEN sp.lum * 64 >= t.total THEN 1 << sp.x ELSE 0 END) AS b
       |  FROM samp sp JOIN tot t ON sp.media_id = t.media_id
       |  GROUP BY sp.media_id, sp.y),
       |hashes AS (
       |  SELECT media_id, string_agg(printf('%02x', CAST(b AS INT)), '' ORDER BY y) AS ahash
       |  FROM bytes GROUP BY media_id)
       |SELECT media_id, 'image/bmp' AS mime, ahash,
       |  min(media_id) OVER (PARTITION BY ahash) AS dup_group
       |FROM hashes ORDER BY media_id""".stripMargin

  /** DuckDB twin of q62 (real resize to 48×48): dst pixel (x, y) reads
    * src (x·w/48, y·h/48) with integer floor, so the resized pixel sum
    * enumerates the 48×48 dst grid; the re-encoded byte length is the
    * constant BMP size of a 48×48 image. */
  lazy val mediaResizeOracle: String =
    s"""WITH $imageDimsCte,
       |xs AS (SELECT media_id, w, h, s, unnest(generate_series(0, 47)) AS x FROM dims),
       |xy AS (SELECT media_id, s, (x * w) // 48 AS sx, (y * h) // 48 AS sy
       |       FROM (SELECT media_id, w, h, s, x, unnest(generate_series(0, 47)) AS y
       |             FROM xs)),
       |ps AS (SELECT media_id, CAST(sum(3 * ((s + sx + sy) % 256)) AS BIGINT) AS pixel_sum
       |       FROM xy GROUP BY media_id)
       |SELECT d.media_id, 'image/bmp' AS mime,
       |  CAST(48 AS INT) AS width, CAST(48 AS INT) AS height,
       |  CAST(54 + 48 * (((3 * 48 + 3) // 4) * 4) AS BIGINT) AS byte_len,
       |  ps.pixel_sum
       |FROM dims d JOIN ps ON d.media_id = ps.media_id
       |ORDER BY d.media_id""".stripMargin

  /** DuckDB twin of q63 (real demux + per-frame decode): the container
    * holds nf ∈ [2, 7] frames of fixed per-doc dims; sampling every 2nd
    * frame capped at 3 keeps fi < least(nf, 6) (stride 2 divides the
    * cap bound evenly, so the cap is a plain filter). Frame f's ramp is
    * offset by f — ONE closed form for all five containers;
    * frame_bytes exists where frames are byte-delimited: the full BMP
    * layout for the BMP container, the header-less DIB pixel array
    * (h × padded row) for both the AVI's '00db' chunks (media_id % 5
    * = 3) and the MP4's 'DIB ' samples (media_id % 5 = 4), and NULL
    * for the GIF (media_id % 5 = 0) and TIFF (media_id % 5 = 2) docs,
    * whose frames live inside one encoded stream. */
  lazy val frameSampleOracle: String =
    """WITH vdims AS (
      |  SELECT doc_id AS media_id,
      |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 24 + 8 AS w,
      |    CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 24 + 8 AS h,
      |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS s,
      |    CAST(('0x' || substr(md5(text), 13, 4)) AS BIGINT) % 6 + 2 AS nf
      |  FROM documents WHERE text IS NOT NULL),
      |fr AS (SELECT media_id, w, h, s, unnest(generate_series(0, least(nf, 6) - 1, 2)) AS fi
      |       FROM vdims),
      |xs AS (SELECT media_id, h, s, fi, unnest(generate_series(0, w - 1)) AS x FROM fr),
      |xy AS (SELECT media_id, s, fi, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
      |ps AS (SELECT media_id, fi,
      |         CAST(sum(3 * ((s + fi + x + y) % 256)) AS BIGINT) AS pixel_sum
      |       FROM xy GROUP BY media_id, fi)
      |SELECT f.media_id, CAST(f.fi AS INT) AS frame_idx,
      |  CAST(f.w AS INT) AS width, CAST(f.h AS INT) AS height, ps.pixel_sum,
      |  CASE WHEN f.media_id % 5 IN (0, 2) THEN NULL
      |       WHEN f.media_id % 5 IN (3, 4)
      |         THEN CAST(f.h * (((3 * f.w + 3) // 4) * 4) AS BIGINT)
      |       ELSE CAST(54 + f.h * (((3 * f.w + 3) // 4) * 4) AS BIGINT)
      |  END AS frame_bytes
      |FROM fr f JOIN ps ON f.media_id = ps.media_id AND f.fi = ps.fi
      |ORDER BY f.media_id, f.fi""".stripMargin

  /** DuckDB twin of q94 (real WAV decode): the generator's ground
    * truth in closed form — sample count / rate / seed from the md5
    * nibbles, every decoded sample re-derived by the same positive-
    * BIGINT arithmetic (max intermediate ≈ 2.2e10, energy ≤ 2.3e12 —
    * no overflow in either engine), byte_len from the fixed RIFF
    * layout (44-byte header + 2 bytes/sample). energy is CAST back to
    * BIGINT because DuckDB widens sum(BIGINT) to HUGEINT. */
  lazy val audioDecodeOracle: String =
    """WITH adims AS (
      |  SELECT doc_id AS media_id,
      |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 2048 + 64 AS n,
      |    8000 + (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 4) * 4000 AS rate,
      |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS s
      |  FROM documents WHERE text IS NOT NULL),
      |samp AS (
      |  SELECT media_id, ((s + 1) * 40503 * (i + 1)) % 65536 - 32768 AS v
      |  FROM (SELECT media_id, n, s, unnest(generate_series(0, n - 1)) AS i FROM adims)),
      |ag AS (
      |  SELECT media_id, CAST(max(abs(v)) AS BIGINT) AS peak_abs,
      |    CAST(sum(v * v) AS BIGINT) AS energy
      |  FROM samp GROUP BY media_id)
      |SELECT d.media_id, 'audio/wav' AS mime,
      |  CAST(44 + 2 * d.n AS BIGINT) AS byte_len,
      |  CAST(d.rate AS INT) AS sample_rate, CAST(d.n AS BIGINT) AS n_samples,
      |  CAST(d.n * 1000 // d.rate AS BIGINT) AS duration_ms,
      |  ag.peak_abs, ag.energy
      |FROM adims d JOIN ag ON d.media_id = ag.media_id
      |ORDER BY d.media_id""".stripMargin

  /** DuckDB twin of q123: the WAV generator's samples re-derived
    * arithmetically (same CTE as [[audioDecodeOracle]]), sliced into
    * 32 equal frames by the integer rule `i·32 div n`, per-frame Σv²
    * compared to its predecessor (strict >), bits packed LSB-first —
    * the exact [[graft.operators.AudioCodec.bandFingerprint]]
    * arithmetic, so the fingerprint and its dup groups hash. */
  lazy val audioFingerprintOracle: String =
    """WITH adims AS (
      |  SELECT doc_id AS media_id,
      |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 2048 + 64 AS n,
      |    8000 + (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 4) * 4000 AS rate,
      |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS s
      |  FROM documents WHERE text IS NOT NULL),
      |samp AS (
      |  SELECT media_id, i, n, ((s + 1) * 40503 * (i + 1)) % 65536 - 32768 AS v
      |  FROM (SELECT media_id, n, s, unnest(generate_series(0, n - 1)) AS i FROM adims)),
      |fe AS (
      |  SELECT media_id, (i * 32) // n AS f, CAST(sum(v * v) AS BIGINT) AS e
      |  FROM samp GROUP BY media_id, (i * 32) // n),
      |bits AS (
      |  SELECT media_id, f,
      |    CASE WHEN e > lag(e) OVER (PARTITION BY media_id ORDER BY f)
      |      THEN 1 ELSE 0 END AS b
      |  FROM fe),
      |fp AS (
      |  SELECT media_id,
      |    CAST(sum(b * (CAST(1 AS BIGINT) << CAST(f - 1 AS INT))) AS BIGINT) AS fingerprint
      |  FROM bits WHERE f > 0 GROUP BY media_id)
      |SELECT d.media_id, CAST(d.rate AS INT) AS sample_rate,
      |  CAST(d.n AS BIGINT) AS n_samples, fp.fingerprint,
      |  min(d.media_id) OVER (PARTITION BY fp.fingerprint) AS dup_group
      |FROM adims d JOIN fp ON d.media_id = fp.media_id
      |ORDER BY d.media_id""".stripMargin


  /** DuckDB twin of q131: each modality's closed-form fixture
    * arithmetic (image ramp dims/pixel-sum, WAV sample energy, video
    * frame count) joined on the doc key with the token count. */
  lazy val multimodalRecordOracle: String =
    s"""WITH $imageDimsCte,
       |xs AS (SELECT media_id, h, s, unnest(generate_series(0, w - 1)) AS x FROM dims),
       |xy AS (SELECT media_id, s, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
       |ps AS (SELECT media_id, CAST(sum(3 * ((s + x + y) % 256)) AS BIGINT) AS img_pixel_sum
       |       FROM xy GROUP BY media_id),
       |adims AS (
       |  SELECT doc_id AS media_id,
       |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 2048 + 64 AS n,
       |    8000 + (CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 4) * 4000 AS rate,
       |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS sd
       |  FROM documents WHERE text IS NOT NULL),
       |samp AS (
       |  SELECT media_id, ((sd + 1) * 40503 * (i + 1)) % 65536 - 32768 AS v
       |  FROM (SELECT media_id, n, sd, unnest(generate_series(0, n - 1)) AS i FROM adims)),
       |ae AS (SELECT media_id, CAST(sum(v * v) AS BIGINT) AS audio_energy
       |       FROM samp GROUP BY media_id),
       |vdims AS (
       |  SELECT doc_id AS media_id,
       |    CAST(('0x' || substr(md5(text), 13, 4)) AS BIGINT) % 6 + 2 AS nf
       |  FROM documents WHERE text IS NOT NULL),
       |toks AS (
       |  SELECT doc_id, CAST(len(${Text.oTok}) AS BIGINT) AS n_tokens
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT t.doc_id, t.n_tokens,
       |  CAST(d.w AS INT) AS img_w, CAST(d.h AS INT) AS img_h, ps.img_pixel_sum,
       |  CAST(a.n * 1000 // a.rate AS BIGINT) AS audio_ms, ae.audio_energy,
       |  CAST(v.nf AS BIGINT) AS n_frames
       |FROM toks t
       |JOIN dims d ON d.media_id = t.doc_id
       |JOIN ps ON ps.media_id = t.doc_id
       |JOIN adims a ON a.media_id = t.doc_id
       |JOIN ae ON ae.media_id = t.doc_id
       |JOIN vdims v ON v.media_id = t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** DuckDB twin of q127: the video generator's per-frame ramps
    * (pixel (x, y) of frame f = (s + f + x + y) % 256, gray) pushed
    * through q104's aHash arithmetic per frame — 8×8 nearest-neighbor
    * grid, lum·64 vs frame total, LSB-first row bytes — then the frame
    * hashes concatenated in frame order under one md5. Same bits for
    * all five containers (lossless by construction), so the Spark
    * decode → hash → roll-up chain must agree to the digest. */
  lazy val videoFingerprintOracle: String =
    """WITH vdims AS (
      |  SELECT doc_id AS media_id,
      |    CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 24 + 8 AS w,
      |    CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 24 + 8 AS h,
      |    CAST(('0x' || substr(md5(text), 9, 4)) AS BIGINT) % 256 AS s,
      |    CAST(('0x' || substr(md5(text), 13, 4)) AS BIGINT) % 6 + 2 AS nf
      |  FROM documents WHERE text IS NOT NULL),
      |fr AS (SELECT media_id, w, h, s, unnest(generate_series(0, nf - 1)) AS f FROM vdims),
      |gx AS (SELECT media_id, w, h, s, f, unnest(generate_series(0, 7)) AS x FROM fr),
      |samp AS (SELECT media_id, f, x, y,
      |    3 * ((s + f + (x * w) // 8 + (y * h) // 8) % 256) AS lum
      |  FROM (SELECT media_id, w, h, s, f, x, unnest(generate_series(0, 7)) AS y FROM gx)),
      |tot AS (SELECT media_id, f, sum(lum) AS total FROM samp GROUP BY media_id, f),
      |bytes AS (
      |  SELECT sp.media_id, sp.f, sp.y,
      |    sum(CASE WHEN sp.lum * 64 >= t.total THEN 1 << sp.x ELSE 0 END) AS b
      |  FROM samp sp JOIN tot t ON sp.media_id = t.media_id AND sp.f = t.f
      |  GROUP BY sp.media_id, sp.f, sp.y),
      |fhash AS (
      |  SELECT media_id, f,
      |    string_agg(printf('%02x', CAST(b AS INT)), '' ORDER BY y) AS ahash
      |  FROM bytes GROUP BY media_id, f),
      |vfp AS (
      |  SELECT media_id, count(*) AS n_frames,
      |    md5(string_agg(ahash, '' ORDER BY f)) AS fingerprint
      |  FROM fhash GROUP BY media_id)
      |SELECT media_id, n_frames, fingerprint,
      |  min(media_id) OVER (PARTITION BY fingerprint) AS dup_group
      |FROM vfp ORDER BY media_id""".stripMargin

  /** DuckDB twin of Similarity.lshTopK(dims=64, 4 bands × 8 sign
    * planes, cap 200, k=5): band keys generated from the SAME
    * [[Similarity.planeDim]] picks, identical rounded-cosine rescore
    * with neighbor-id tie-break — bit-exact despite being an
    * approximate index. */
  lazy val lshAnnOracle: String = {
    val planeDims = Similarity.bandPlaneDims(4, 8, 64)
    val bandSelects = (0 until 4).map { b =>
      val key = (0 until 8).map { j =>
        val d = planeDims(b)(j)
        s"(CASE WHEN embedding[${d + 1}] >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $key AS bkey FROM embeddings WHERE len(embedding) >= 64"
    }.mkString("\n  UNION ALL ")
    s"""WITH banded AS (
       |  $bandSelects),
       |capped AS (
       |  SELECT vec_id, band, bkey FROM (
       |    SELECT vec_id, band, bkey, count(*) OVER (PARTITION BY band, bkey) AS f
       |    FROM banded)
       |  WHERE f <= 200),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM capped a JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.vec_id <> b.vec_id),
       |scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                 CAST(n.embedding AS DOUBLE[])), 4) AS cosine
       |  FROM cand c
       |  JOIN embeddings q ON q.vec_id = c.query_id
       |  JOIN embeddings n ON n.vec_id = c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB twin of Similarity.ivfTopK over the label codebook:
    * identical DECIMAL-exact centroids, identical rounded-cosine
    * assignment (max cos, tie → smallest cell) and scoring. */
  /** SQL twin of q119: per-(label, dim) DECIMAL means sliced into 8
    * subspaces, rounded L2-argmin encode (x·c − ‖c‖²/2 form, cell
    * tie-break), ADC scoring with DECIMAL partial sums — every step
    * mirrors the Spark program so the hash matches. */
  lazy val pqOracle: String =
    """WITH cb AS (
      |  SELECT CAST(floor((dim-1)/8) AS BIGINT) AS sub, label AS cell,
      |         list(mean_v ORDER BY dim) AS centroid FROM (
      |    SELECT label, dim,
      |      CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS mean_v
      |    FROM (SELECT label, unnest(embedding) AS v,
      |                 generate_subscripts(embedding, 1) AS dim FROM embeddings)
      |    GROUP BY label, dim)
      |  GROUP BY 1, 2),
      |codes AS (
      |  SELECT id, sub, cell AS code FROM (
      |    SELECT e.vec_id AS id, c.sub, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id, c.sub ORDER BY
      |        round(list_dot_product(
      |            CAST(e.embedding[(CAST(c.sub AS INT)*8+1):(CAST(c.sub AS INT)*8+8)] AS DOUBLE[]),
      |            c.centroid)
      |          - 0.5 * list_dot_product(c.centroid, c.centroid), 4) DESC,
      |        c.cell) AS rn
      |    FROM embeddings e CROSS JOIN cb c)
      |  WHERE rn = 1),
      |lut AS (
      |  SELECT q.vec_id AS query_id, c.sub, c.cell,
      |    round(list_dot_product(
      |        CAST(q.embedding[(CAST(c.sub AS INT)*8+1):(CAST(c.sub AS INT)*8+8)] AS DOUBLE[]),
      |        c.centroid), 4) AS partial,
      |    round(list_dot_product(c.centroid, c.centroid), 4) AS cnorm2,
      |    sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
      |                          CAST(q.embedding AS DOUBLE[]))) AS qnorm
      |  FROM embeddings q CROSS JOIN cb c WHERE q.vec_id < 8),
      |scored AS (
      |  SELECT l.query_id, s.id AS neighbor_id,
      |    round(CAST(sum(CAST(l.partial AS DECIMAL(20,10))) AS DOUBLE)
      |      / (any_value(l.qnorm)
      |         * sqrt(CAST(sum(CAST(l.cnorm2 AS DECIMAL(20,10))) AS DOUBLE))), 4) AS cosine
      |  FROM codes s JOIN lut l ON l.sub = s.sub AND l.cell = s.code
      |  WHERE l.query_id <> s.id
      |  GROUP BY l.query_id, s.id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cosine,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  lazy val ivfOracle: String =
    """WITH centroids AS (
      |  SELECT label AS cell, list(mean_v ORDER BY dim) AS centroid FROM (
      |    SELECT label, dim,
      |      CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(20,10))) AS DOUBLE) / count(*) AS mean_v
      |    FROM (SELECT label, unnest(embedding) AS v,
      |                 generate_subscripts(embedding, 1) AS dim FROM embeddings)
      |    GROUP BY label, dim)
      |  GROUP BY label),
      |assigned AS (
      |  SELECT cell, vec_id AS neighbor_id, embedding AS cv FROM (
      |    SELECT c.cell, e.vec_id, e.embedding,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid), 4) DESC,
      |                 c.cell) AS rn
      |    FROM embeddings e CROSS JOIN centroids c)
      |  WHERE rn = 1),
      |probes AS (
      |  SELECT cell, vec_id AS query_id, embedding AS qv FROM (
      |    SELECT c.cell, e.vec_id, e.embedding,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid), 4) DESC,
      |                 c.cell) AS rn
      |    FROM embeddings e CROSS JOIN centroids c WHERE e.vec_id < 8)
      |  WHERE rn <= 2),
      |ranked AS (
      |  SELECT p.query_id, a.neighbor_id,
      |    round(list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[])), 4) AS cosine,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY round(list_cosine_similarity(CAST(p.qv AS DOUBLE[]), CAST(a.cv AS DOUBLE[])), 4) DESC,
      |               a.neighbor_id) AS rank
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE p.query_id <> a.neighbor_id)
      |SELECT query_id, neighbor_id, cosine, rank FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB twin of Similarity.bandedCosinePairs(0.4, 8 bands × 8
    * bits, cap 200): identical integer band keys from component signs,
    * identical rounded-cosine rescore. */
  lazy val bandedNeardupOracle: String = {
    // len guard mirrors the Spark side's short-vector exclusion
    // (Similarity.bandedCosinePairs): DuckDB's out-of-range embedding[i]
    // is NULL → CASE ELSE 0, which would band-key a short vector Spark
    // never scores
    val bandSelects = (0 until 8).map { b =>
      val key = (0 until 8).map { j =>
        s"(CASE WHEN embedding[${b * 8 + j + 1}] >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, $b AS band, $key AS bkey FROM embeddings WHERE len(embedding) >= 64"
    }.mkString("\n  UNION ALL ")
    s"""WITH banded AS (
       |  $bandSelects),
       |capped AS (
       |  SELECT vec_id, band, bkey FROM (
       |    SELECT vec_id, band, bkey, count(*) OVER (PARTITION BY band, bkey) AS f
       |    FROM banded)
       |  WHERE f <= 200),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM capped a JOIN capped b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.vec_id < b.vec_id)
       |SELECT c.id_a, c.id_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                               CAST(b.embedding AS DOUBLE[])), 4) AS cosine
       |FROM cand c
       |JOIN embeddings a ON a.vec_id = c.id_a
       |JOIN embeddings b ON b.vec_id = c.id_b
       |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                                   CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q140 oracle: 8 power-iteration rounds unrolled as materialized
    * CTEs over the fixed-point quantized embeddings (x·1024,
    * power-of-two scale → the float widen/multiply/round are exact
    * and engine-identical). Per round: s = x·v per vector, u = Σ x·s
    * per dim (interior HUGEINT, exact), rescale max|v| to 2¹⁶ with a
    * sign-split `//` on nonnegative operands so floor division equals
    * the engine's truncating BigInt division. */
  private[queries] def powerIterOracle: String = {
    val rounds = 8
    val steps = (1 to rounds).flatMap { r =>
      Seq(
        s"""s$r AS MATERIALIZED (
           |  SELECT vec_id, CAST(sum(x * v) AS BIGINT) AS s
           |  FROM xq JOIN v${r - 1} USING (d) GROUP BY vec_id)""".stripMargin,
        s"""u$r AS MATERIALIZED (
           |  SELECT xq.d, sum(xq.x * s$r.s) AS u
           |  FROM xq JOIN s$r USING (vec_id) GROUP BY xq.d)""".stripMargin,
        s"""v$r AS MATERIALIZED (
           |  SELECT d, CAST(CASE WHEN m.m = 0 THEN 1024
           |    WHEN u < 0 THEN -(((-u) * 65536) // m.m)
           |    ELSE (u * 65536) // m.m END AS BIGINT) AS v
           |  FROM u$r, (SELECT max(abs(u)) AS m FROM u$r) m)""".stripMargin)
    }
    s"""WITH xq AS MATERIALIZED (
       |  SELECT vec_id, t.i AS d,
       |    CAST(floor(CAST(embedding[t.i] AS DOUBLE) * 1024.0 + 0.5) AS BIGINT) AS x
       |  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
       |  WHERE len(embedding) = 64),
       |v0 AS (SELECT i AS d, CAST(1024 AS BIGINT) AS v
       |       FROM unnest(generate_series(1, 64)) AS t(i)),
       |${steps.mkString(",\n")}
       |SELECT xq.vec_id, CAST(sum(x * v) AS BIGINT) AS pc1_proj
       |FROM xq JOIN v$rounds USING (d)
       |GROUP BY xq.vec_id ORDER BY xq.vec_id""".stripMargin
  }
}
