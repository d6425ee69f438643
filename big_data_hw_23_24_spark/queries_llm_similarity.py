"""LLM-pipeline queries, similarity tier: cosine / quantized / IVF /
PQ ANN ladder, MMR rerank, k-means faces, Gram matrix, multimodal
plumbing. Split out of queries_llm.py in r9; see queries_llm.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.dedup import (  # noqa: F401  (used at query call time)
    exact_duplicate_groups,
    exact_jaccard_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from .operators.multimodal import decode_media, media_from_documents  # noqa: F401
from .operators.similarity import cosine_topk, ivf_topk  # noqa: F401
from .operators.textstats import (  # noqa: F401
    content_fingerprints,
    detect_language,
    quality_scores,
    token_stats,
)
from .queries import _REGISTRY, register
from .queries import _REGISTRY as _R  # post-registration oracle patches
from .queries_llm_shared import (  # noqa: F401  (used inside f-string oracles)
    _BAND_COLLIDE,
    _BOILER_SQL_BASE,
    _EST_JACCARD,
    _PINNED_BPE_MERGES,
    _SHINGLES_CTE,
    _SYNTH_LINES_CTE,
    _bpe_oracle_sql,
    _md5_minhash_sig_cte,
    _synth_lines,
)
from .sources.tables import load_table


# --- similarity search -------------------------------------------------------
# Brute-force cosine is oracle-checked with DuckDB's
# list_cosine_similarity (both sides compute in double); top-k rank is
# tie-broken by neighbor id. Queries = vec_id < 5.
@register(
    "knn_cosine_bruteforce",
    """
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6)
               AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[]))
                          DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 10
    """,
    doc="exact cosine top-10 for 5 query vectors (brute force baseline)",
)
def knn_cosine_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


@register(
    "knn_cosine_quantized",
    """
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    qz AS (
      SELECT vec_id, m,
             CASE WHEN m > 0
                  THEN list_transform(v, e ->
                         CAST(floor(e / m * 127.0 + 0.5) AS INTEGER))
                  ELSE list_transform(v, e -> 0) END AS codes
      FROM (SELECT vec_id, v,
                   list_max(list_transform(v, e -> abs(e))) AS m FROM x)
    ),
    deq AS (SELECT vec_id,
                   list_transform(codes, c -> c * m / 127.0) AS v FROM qz),
    qs AS (SELECT vec_id, v FROM x WHERE vec_id < 5),
    stage1 AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id)
               AS r1
      FROM qs q JOIN deq c ON q.vec_id <> c.vec_id
    ),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             list_cosine_similarity(qx.v, cx.v) AS sc
      FROM stage1 s
      JOIN x qx ON qx.vec_id = s.query_id
      JOIN x cx ON cx.vec_id = s.neighbor_id
      WHERE s.r1 <= 40
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, round(sc, 6) AS cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sc DESC, neighbor_id) AS rank
      FROM exact
    ) WHERE rank <= 10
    """,
    doc="top-10 cosine via int8-quantized scan (4x smaller table) + "
        "exact rerank of the 40-candidate shortlist; reported scores "
        "are exact",
)
def knn_cosine_quantized(spark, sf_dir):
    from .operators.similarity import quantized_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_topk(emb, emb.where(F.col("vec_id") < 5),
                          k=10, rerank_factor=4)


@register(
    "knn_cosine_ivf",
    None,  # ANN: recall measured against brute force in tests
    doc="IVF ANN top-10 (16 lists, nprobe=4, k-means-lite on driver sample)",
)
def knn_cosine_ivf(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 5), k=10)


# --- multimodal plumbing -----------------------------------------------------
# The fake decode is a pure function of the payload bytes, so the
# Arrow/mapInPandas path has an exact SQL oracle: md5-derived dims over
# the same UTF-8 payload.
@register(
    "media_decode_meta",
    """
    SELECT media_id, n_bytes, format, width, height, checksum FROM (
      SELECT doc_id AS media_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             'text/plain' AS format,
             CAST(64 + ('0x' || substr(md5(text), 1, 4))::BIGINT % 1984
               AS INTEGER) AS width,
             CAST(64 + ('0x' || substr(md5(text), 5, 4))::BIGINT % 1984
               AS INTEGER) AS height,
             md5(text) AS checksum
      FROM documents)
    """,
    doc="multimodal: binary payload → typed metadata via Arrow-batched "
        "mapInPandas (deterministic fake codec; real codec stubbed)",
)
def media_decode_meta(spark, sf_dir):
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return decode_media(media, fake=True)


# The feature-extraction step of the multimodal pipeline: payload →
# embedding components through the same Arrow mapInPandas path, with
# the deterministic md5-derived fake standing in for a model — so the
# face value-checks the full kernel contract (batching, schema, long
# form) against an engine recomputation.
@register(
    "media_feature_vectors",
    """
    SELECT doc_id AS media_id, i::INT AS i,
           round(('0x' || substr(md5(text), 8 * i + 1, 8))::BIGINT
                 / 4294967296.0, 6) AS feat
    FROM documents, (SELECT unnest(range(0, 4)) AS i)
    """,
    doc="multimodal feature extraction: binary payload → 4 md5-derived "
        "embedding components via the Arrow mapInPandas kernel (fake "
        "model; long form, one scalar per cell)",
)
def media_feature_vectors(spark, sf_dir):
    from .operators.multimodal import extract_features

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return extract_features(media, dim=4, fake=True)


# --- embedding quantization --------------------------------------------------
# Codes are serialized to a CSV string so the value-hash compares a
# scalar; both engines compute codes with the RAW max-abs scale and
# round only the reported scale. floor(x + 0.5) rounding is used
# because round() half-even vs half-away differs across engines.
@register(
    "embedding_quantize_int8",
    """
    SELECT vec_id, round(m, 6) AS scale,
           array_to_string(codes, ',') AS codes_str,
           CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS l1
    FROM (
      SELECT vec_id, m,
             CASE WHEN m > 0
                  THEN list_transform(x, v ->
                         CAST(floor(v / m * 127.0 + 0.5) AS INTEGER))
                  ELSE list_transform(x, v -> 0) END AS codes
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
                   list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                           v -> abs(v))) AS m
            FROM embeddings)
    )
    """,
    doc="symmetric per-vector int8 quantization (4x embedding storage "
        "cut): max-abs scale, floor-based half-up rounding, narrow map",
)
def embedding_quantize_int8(spark, sf_dir):
    from .operators.similarity import quantize_embeddings

    q = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", "scale",
        F.concat_ws(",", F.col("codes")).alias("codes_str"),
        F.aggregate("codes", F.lit(0),
                    lambda acc, v: acc + F.abs(v)).cast("bigint").alias("l1"),
    )


# --- distributed k-means (IVF codebook training) -----------------------------
# Iterative, init-dependent → no SQL oracle (the MRFFT category);
# the Lloyd guarantees (cost monotonicity, blob recovery, IVF recall
# with trained centroids) are property-tested in tests/test_clustering.
@register(
    "embedding_kmeans_sizes",
    None,
    doc="distributed Lloyd's k-means over embeddings → cluster sizes "
        "(bounded-shuffle sufficient-statistics iteration; trains the "
        "IVF codebook at full-corpus scale)",
)
def embedding_kmeans_sizes(spark, sf_dir):
    import numpy as np

    from .operators.clustering import kmeans_fit
    from .operators.similarity import _nearest_lists_udf

    # cache only for the training iterations; the returned (lazy) plan
    # re-reads parquet once rather than leaking the cache past the call
    emb = load_table(spark, sf_dir, "embeddings").cache()
    try:
        cent, _ = kmeans_fit(emb, k=8, iters=4, seed=42)
    finally:
        emb.unpersist()
    assign = _nearest_lists_udf(cent, 1)
    return (emb.select(assign(F.col("embedding"))[0].alias("cluster_id"))
            .groupBy("cluster_id")
            .agg(F.count("*").alias("n_vecs"))
            .orderBy("cluster_id"))


# --- filtered vector search --------------------------------------------------
# The vector-DB "filtered ANN" pattern: a metadata predicate restricts
# the searchable corpus BEFORE any distance is computed (pre-filter),
# rather than over-fetching and post-filtering top-k — at 100 TB the
# semi-join prunes the scan to the eligible fraction and the distance
# kernel never touches an ineligible vector. Joins embeddings to their
# documents on the shared id space.
@register(
    "knn_cosine_filtered",
    """
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6)
               AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(c.embedding AS DOUBLE[]))
                          DESC,
                        c.vec_id) AS rank
      FROM embeddings q
      JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 5
        AND c.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
    ) WHERE rank <= 10
    """,
    doc="filtered vector search: metadata pre-filter (documents.lang) "
        "semi-joined into the corpus before the exact cosine top-10",
)
def knn_cosine_filtered(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    eligible = (load_table(spark, sf_dir, "documents")
                .where(F.col("lang") == "en")
                .select(F.col("doc_id").alias("vec_id")))
    corpus = emb.join(eligible, "vec_id", "semi")
    return cosine_topk(corpus, emb.where(F.col("vec_id") < 5), k=10)


# --- nearest-centroid assignment (IVF kernel, oracle-checked) ----------------
# embedding_kmeans_sizes is no-oracle by design (iterative training),
# but the ASSIGNMENT kernel at its core — nearest centroid by squared
# L2 — is deterministic given fixed centroids. This face fixes the
# centroids to the first four corpus vectors and value-checks every
# vector's assignment and distance; tests/test_llm_ops.py then pins the
# Arrow UDF kernel (_nearest_lists_udf) to this JVM-expression face, so
# the driver row transitively covers the IVF routing kernel. Argmin
# margins dwarf cross-engine summation-order error (measured ≥ 3e-7 at
# the checked SFs vs ~1e-14 float noise). Queued for window rotation.
@register(
    "embedding_nearest_centroid",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 4),
    d AS (
      SELECT e.vec_id, c.centroid_id,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
      FROM e, c
    ),
    r AS (SELECT vec_id, centroid_id, dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, centroid_id) AS rn
          FROM d)
    SELECT vec_id, centroid_id, round(dist, 6) AS dist_sq
    FROM r WHERE rn = 1
    """,
    doc="nearest-centroid assignment over 4 fixed centroids: the IVF "
        "routing kernel as a value-checked JVM-expression face",
)
def embedding_nearest_centroid(spark, sf_dir):
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
    dist = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    return (emb.crossJoin(F.broadcast(cents))
            .select("vec_id",
                    F.struct(dist.alias("d"),
                             F.col("centroid_id").alias("cid")).alias("s"))
            .groupBy("vec_id").agg(F.min("s").alias("b"))
            .select("vec_id", F.col("b.cid").alias("centroid_id"),
                    F.round(F.col("b.d"), 6).alias("dist_sq")))


# --- one Lloyd round from fixed centroids (k-means oracle face) --------------
# kmeans_fit is no-oracle by design (iterative), but each round's
# distributed work — assign to nearest centroid, aggregate per-
# (cluster, dim) sum / sum-sq / count — is deterministic given fixed
# centroids. This face fixes them to the first four corpus vectors and
# value-checks the FULL sufficient-statistics table the trainer
# iterates on (next centroids AND the Lloyd cost are pure functions of
# these rows), extending driver coverage from the routing kernel
# (embedding_nearest_centroid) to the whole training round.
@register(
    "embedding_lloyd_round",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 4),
    d AS (
      SELECT e.vec_id, e.v, c.centroid_id,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
      FROM e, c
    ),
    a AS (SELECT vec_id, v, centroid_id,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dist, centroid_id) AS rn
          FROM d),
    x AS (SELECT centroid_id, unnest(v) AS x,
                 generate_subscripts(v, 1) - 1 AS pos
          FROM a WHERE rn = 1)
    SELECT centroid_id, pos::INT AS pos,
           round(sum(x), 6) AS sum_x,
           round(sum(x * x), 6) AS sum_sq,
           count(*)::BIGINT AS cnt
    FROM x GROUP BY centroid_id, pos
    """,
    doc="one Lloyd k-means round from 4 fixed centroids: per-(cluster, "
        "dim) sum/sum-sq/count sufficient statistics, value-checked",
)
def embedding_lloyd_round(spark, sf_dir):
    from .operators.clustering import lloyd_round

    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv"))
    return lloyd_round(emb, cents)


# --- product quantization (PQ) faces -----------------------------------------
# pq_train is rows-only (per-subspace k-means on a driver sample); the
# deterministic kernels — encode against FIXED codebooks and the ADC
# lookup-table search — carry full oracles, the nearest-centroid move
# applied per subspace. Codebooks fix centroid c of subspace j to
# subvector j of corpus vector c (m=8 subspaces × 8 dims, k=16).
_PQ_SQL_BASE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    js AS (SELECT unnest(range(0, 8)) AS j),
    sv AS (SELECT e.vec_id, js.j,
                  e.v[js.j * 8 + 1 : js.j * 8 + 8] AS sub
           FROM e, js),
    cb AS (SELECT j, vec_id::INT AS centroid_id, sub AS cv
           FROM sv WHERE vec_id < 16),
    d AS (
      SELECT s.vec_id, s.j, c.centroid_id,
             list_sum(list_transform(range(1, len(s.sub) + 1),
                                     i -> (s.sub[i] - c.cv[i]) ^ 2)) AS dist
      FROM sv s JOIN cb c ON c.j = s.j
    ),
    codes AS (
      SELECT vec_id, j, centroid_id AS code, dist FROM (
        SELECT vec_id, j, centroid_id, dist,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY dist, centroid_id) AS rn
        FROM d) WHERE rn = 1
    )
"""


@register(
    "embedding_pq_codes",
    _PQ_SQL_BASE + """
    SELECT vec_id, j::INT AS j, code, round(dist, 6) AS dist_sq
    FROM codes
    """,
    doc="PQ encode against fixed codebooks (m=8, k=16): per-subspace "
        "nearest-centroid codes + quantization error, long form "
        "(operators/pq.py; Jegou et al. 2011)",
)
def embedding_pq_codes(spark, sf_dir):
    from .operators.pq import fixed_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_encode(emb, fixed_codebooks(emb, m=8, k=16), m=8)


@register(
    "knn_pq_adc",
    _PQ_SQL_BASE + """,
    lut AS (
      SELECT s.vec_id AS query_id, s.j, c.centroid_id AS code,
             round(list_sum(list_transform(range(1, len(s.sub) + 1),
                                           i -> (s.sub[i] - c.cv[i]) ^ 2)),
                   6) AS d
      FROM sv s JOIN cb c ON c.j = s.j
      WHERE s.vec_id < 5
    ),
    scored AS (
      SELECT l.query_id, co.vec_id AS neighbor_id,
             round(sum(l.d), 6) AS adist
      FROM codes co JOIN lut l ON l.j = co.j AND l.code = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY l.query_id, co.vec_id
    )
    SELECT query_id, neighbor_id, adist, rank FROM (
      SELECT query_id, neighbor_id, adist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adist, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
    doc="PQ asymmetric-distance top-10: corpus scanned as 8-byte codes "
        "joined to the broadcast per-query LUT, per-cell distances "
        "rounded before summing so ranks are engine-stable",
)
def knn_pq_adc(spark, sf_dir):
    from .operators.pq import fixed_codebooks, pq_adc_topk, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    cb = fixed_codebooks(emb, m=8, k=16)
    codes = pq_encode(emb, cb, m=8).select("vec_id", "j", "code")
    return pq_adc_topk(codes, emb.where(F.col("vec_id") < 5), cb, m=8,
                       k_top=10, exclude_self=True)


@register(
    "knn_pq_rerank",
    _PQ_SQL_BASE + """,
    lut AS (
      SELECT s.vec_id AS query_id, s.j, c.centroid_id AS code,
             round(list_sum(list_transform(range(1, len(s.sub) + 1),
                                           i -> (s.sub[i] - c.cv[i]) ^ 2)),
                   6) AS d
      FROM sv s JOIN cb c ON c.j = s.j
      WHERE s.vec_id < 5
    ),
    short AS (
      SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, co.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY l.query_id
                 ORDER BY round(sum(l.d), 6), co.vec_id) AS srank
        FROM codes co JOIN lut l ON l.j = co.j AND l.code = co.code
        WHERE co.vec_id <> l.query_id
        GROUP BY l.query_id, co.vec_id)
      WHERE srank <= 40
    ),
    exact AS (
      SELECT s.query_id, s.neighbor_id,
             round(list_sum(list_transform(range(1, len(q.v) + 1),
                   i -> (q.v[i] - n.v[i]) ^ 2)), 6) AS dist_sq
      FROM short s
      JOIN e q ON q.vec_id = s.query_id
      JOIN e n ON n.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_sq, rank FROM (
      SELECT query_id, neighbor_id, dist_sq,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist_sq, neighbor_id) AS rank
      FROM exact)
    WHERE rank <= 10
    """,
    doc="the full production PQ path: 40-deep ADC shortlist over code "
        "bytes, then exact squared-L2 rerank of only the shortlisted "
        "pairs against raw vectors (the quantized_topk two-stage shape)",
)
def knn_pq_rerank(spark, sf_dir):
    from .operators.pq import fixed_codebooks, pq_encode, pq_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cb = fixed_codebooks(emb, m=8, k=16)
    codes = pq_encode(emb, cb, m=8).select("vec_id", "j", "code")
    return pq_rerank_topk(emb, codes, emb.where(F.col("vec_id") < 5),
                          cb, m=8, k_top=10, fetch=40)


# --- video frame-sampling plan (r8) ------------------------------------------
# The codec-free half of the video path: WHICH frames to decode is
# pure arithmetic (frame count from payload size in the fake-codec
# convention, stride-10 sampling), so unlike the decode kernels this
# face is fully value-checkable. The explode runs BEFORE the heavy
# decode at scale, so frames parallelize across tasks.
@register(
    "media_frame_plan",
    """
    WITH f AS (
      SELECT doc_id AS media_id,
             length(text) // 100 AS n_frames
      FROM documents
    )
    SELECT media_id,
           (generate_subscripts(generate_series(0,
              greatest(n_frames - 1, 0), 10), 1) - 1)::INT AS frame_pos,
           unnest(generate_series(0, greatest(n_frames - 1, 0), 10))::INT
             AS frame_idx
    FROM f
    """,
    doc="frame-sampling schedule for video payloads: stride-10 frame "
        "indices from the payload's frame count, exploded before the "
        "decode kernel so frames parallelize across tasks (the "
        "oracle-checkable arithmetic half of the multimodal path)",
)
def media_frame_plan(spark, sf_dir):
    from .operators.multimodal import frame_sample_plan, media_from_documents

    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return frame_sample_plan(media, every_nth=10)


# --- distributed Gram matrix (E82) -------------------------------------------
@register(
    "embedding_gram_matrix",
    """
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    p AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON b.i >= a.i)
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
           round(sum(v[p.i] * v[p.j]) / count(*), 6) AS value
    FROM e, p GROUP BY p.i, p.j
    """,
    doc="distributed Gram matrix (PCA/whitening prep): upper triangle "
        "of the mean outer product (1/n) sum v v^T over the embedding "
        "corpus -- one BLAS matmul per Arrow batch, shuffle of "
        "#batches x d(d+1)/2 fixed-width rows, n-independent",
)
def embedding_gram_matrix(spark, sf_dir):
    from .operators.similarity import embedding_gram

    return embedding_gram(load_table(spark, sf_dir, "embeddings"))


# --- PCA projection (E90) ----------------------------------------------------
# no_oracle by design: the basis comes from an eigendecomposition
# whose numerics are LAPACK-implementation-specific (the MRFFT
# category); the guarantees — orthonormal basis, decreasing explained
# variance, anisotropy recovery, partitioning invariance — are
# property-tested in tests/test_llm_ops.py.
@register(
    "embedding_pca_projected",
    None,
    doc="corpus PCA dimensionality reduction (64 -> 8) before ANN "
        "indexing: covariance from the one-pass Gram kernel + d JVM "
        "mean aggregates, bounded d x d driver eigendecomposition "
        "(the L*K-coreset state bound), broadcast-matmul projection",
)
def embedding_pca_projected(spark, sf_dir):
    from .operators.similarity import pca_components, pca_project

    emb = load_table(spark, sf_dir, "embeddings")
    comps = pca_components(emb, n_components=8)
    out = pca_project(emb, comps)
    return out.select(
        "vec_id",
        F.transform("projected", lambda x: F.round(x, 6))
        .alias("projected"))


# --- MMR diversified re-ranking (E98) ----------------------------------------
# Greedy selection is sequential in k, so the oracle unrolls the same
# five argmax steps as CTEs (the PageRank pattern); scores are ranked
# on RAW doubles in both engines -- safe because the engines' cosine
# parity is already established by the knn_* faces -- and the damping
# constants interpolate the same Python doubles the Spark plan uses.
def _mmr_oracle_sql(k: int = 5, pool: int = 20, lam: float = 0.7) -> str:
    l, l1 = repr(lam), repr(1.0 - lam)
    sql = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    pool AS (
      SELECT query_id, cand_id, cv, rel FROM (
        SELECT q.query_id, c.vec_id AS cand_id, c.v AS cv,
               list_cosine_similarity(q.qv, c.v) AS rel,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                          c.vec_id) AS r
        FROM q JOIN e c ON c.vec_id <> q.query_id)
      WHERE r <= {pool}
    ),
    pick1 AS (
      SELECT query_id, cand_id, cv, rel, score, 1 AS mmr_rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, cand_id) AS rr
        FROM (SELECT *, {l} * rel - {l1} * 0.0 AS score FROM pool))
      WHERE rr = 1
    ),
    sel1 AS (SELECT query_id, cand_id, cv, rel, score, mmr_rank
             FROM pick1)"""
    for i in range(2, k + 1):
        p = i - 1
        sql += f""",
    rem{i} AS (SELECT pl.* FROM pool pl
               WHERE NOT EXISTS (SELECT 1 FROM sel{p} s
                                 WHERE s.query_id = pl.query_id
                                   AND s.cand_id = pl.cand_id)),
    ms{i} AS (SELECT r.query_id, r.cand_id,
                     max(list_cosine_similarity(r.cv, s.cv)) AS m
              FROM rem{i} r JOIN sel{p} s ON s.query_id = r.query_id
              GROUP BY 1, 2),
    pick{i} AS (
      SELECT query_id, cand_id, cv, rel, score, {i} AS mmr_rank FROM (
        SELECT r.query_id, r.cand_id, r.cv, r.rel,
               {l} * r.rel - {l1} * coalesce(m.m, 0.0) AS score,
               row_number() OVER (PARTITION BY r.query_id
                 ORDER BY {l} * r.rel - {l1} * coalesce(m.m, 0.0) DESC,
                          r.cand_id) AS rr
        FROM rem{i} r LEFT JOIN ms{i} m
          ON m.query_id = r.query_id AND m.cand_id = r.cand_id)
      WHERE rr = 1),
    sel{i} AS (SELECT * FROM sel{p} UNION ALL
               SELECT query_id, cand_id, cv, rel, score, mmr_rank
               FROM pick{i})"""
    sql += f"""
    SELECT query_id, cand_id AS neighbor_id,
           CAST(mmr_rank AS BIGINT) AS mmr_rank,
           round(rel, 6) AS cosine, round(score, 6) AS mmr_score
    FROM sel{k}"""
    return sql


@register(
    "knn_mmr_rerank",
    _mmr_oracle_sql(),
    doc="maximal-marginal-relevance diversification after top-k: "
        "greedy lambda-weighted relevance-vs-redundancy selection "
        "(k=5 from a pool of 20), five unrolled relational argmax "
        "steps over the persisted broadcast-query pool -- every join "
        "keyed on query_id, the pool bounded, no Python kernel",
)
def knn_mmr_rerank(spark, sf_dir):
    from .operators.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_rerank(emb, emb.where(F.col("vec_id") < 5),
                      k=5, pool_size=20, lam=0.7)


# --- pinned-centroid IVF face (E139, r9) -----------------------------------------
# The fixed-centroid move (Lloyd round, PQ codebooks) applied to the
# LAST rows-only ANN stage: with centroids pinned to the first 16
# corpus vectors, assignment, probing and scoring are all relational
# and the ENTIRE IVF dataflow — argmin list assignment, nprobe=4
# probe selection, exact cosine over probed lists only — is
# value-checked; ivf_topk keeps the production trained-codebook path
# (recall vs exact measured in tests).
@register(
    "knn_ivf_pinned",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    c AS (SELECT vec_id AS list_id, v AS cv FROM e WHERE vec_id < 16),
    ad AS (
      SELECT e.vec_id AS neighbor_id, e.v, c.list_id,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
      FROM e, c
    ),
    a AS (SELECT neighbor_id, v, list_id FROM (
            SELECT neighbor_id, v, list_id,
                   row_number() OVER (PARTITION BY neighbor_id
                                      ORDER BY dist, list_id) AS rn
            FROM ad) WHERE rn = 1),
    qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    pd AS (
      SELECT q.query_id, q.qv, c.list_id,
             list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> (q.qv[i] - c.cv[i]) ^ 2)) AS dist
      FROM qs q, c
    ),
    pr AS (SELECT query_id, qv, list_id FROM (
             SELECT query_id, qv, list_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY dist, list_id) AS rn
             FROM pd) WHERE rn <= 4),
    sc AS (
      SELECT p.query_id, a.neighbor_id,
             list_cosine_similarity(p.qv, a.v) AS s
      FROM pr p JOIN a ON a.list_id = p.list_id
      WHERE p.query_id <> a.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, round(s, 6) AS cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, neighbor_id)
                  AS INTEGER) AS rank
      FROM sc
    ) WHERE rank <= 10
    """,
    doc="IVF top-10 cosine with pinned centroids (first 16 corpus "
        "vectors): broadcast argmin list assignment, nprobe=4 probe "
        "equi-join, exact cosine over probed lists only — the full "
        "IVF dataflow value-checked; the trained-codebook path stays "
        "in ivf_topk",
)
def knn_ivf_pinned(spark, sf_dir):
    from .operators.similarity import ivf_topk_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk_pinned(emb, emb.where(F.col("vec_id") < 5),
                           k=10, n_lists=16, nprobe=4)


# --- ANN rollout-gate evaluation (E146, r10) ---------------------------------------
# The third member of the approximation-gate family (E140 gates
# approximate dedup, E145 the quantile sketch): the pinned-IVF ANN
# stage scored against the exact brute-force top-k on the same
# corpus. Both sides are already value-checked faces, so the oracle is
# their CTE composition and every miss in the report is the REAL
# recall cost of probing nprobe=4 of 16 lists — not engine noise.
# Deliberately NOT in the bench HEADLINE: the exact side is the
# brute-force form, run once per rollout as a gate (the E140 rule).
def _knn_eval_sql() -> str:
    return f"""
    WITH ex AS ({_R["knn_cosine_bruteforce"].oracle}),
    pv AS ({_R["knn_ivf_pinned"].oracle}),
    j AS (
      SELECT coalesce(ex.query_id, pv.query_id) AS query_id,
             ex.rank AS r_exact, pv.rank AS r_pred
      FROM ex FULL OUTER JOIN pv
        ON ex.query_id = pv.query_id
       AND ex.neighbor_id = pv.neighbor_id
    )
    SELECT query_id,
           count(r_exact)::BIGINT AS n_exact,
           count(r_pred)::BIGINT AS n_pred,
           sum(CASE WHEN r_exact IS NOT NULL AND r_pred IS NOT NULL
                    THEN 1 ELSE 0 END)::BIGINT AS n_hit,
           round(sum(CASE WHEN r_exact IS NOT NULL AND r_pred IS NOT NULL
                          THEN 1 ELSE 0 END) * 1.0 / count(r_exact), 6)
             AS recall_at_k,
           sum(CASE WHEN r_exact IS NOT NULL AND r_pred IS NOT NULL
                    THEN abs(r_exact - r_pred) ELSE 0 END)::BIGINT
             AS rank_displacement
    FROM j GROUP BY query_id
    """


@register(
    "knn_eval_ivf",
    _knn_eval_sql(),
    doc="ANN rollout gate: pinned-IVF top-10 scored against the exact "
        "brute-force top-10 per query — hits, recall@10 and summed "
        "rank displacement; composed from two value-checked faces so "
        "disagreements are the real nprobe recall cost, not engine "
        "noise (gate face, not benched — the E140 rule)",
)
def knn_eval_ivf(spark, sf_dir):
    from .operators.similarity import cosine_topk, ivf_topk_pinned

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, qs, k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_exact"))
    pred = ivf_topk_pinned(emb, qs, k=10, n_lists=16, nprobe=4).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_pred"))
    hit = F.col("r_exact").isNotNull() & F.col("r_pred").isNotNull()
    return (exact.join(pred, ["query_id", "neighbor_id"], "full_outer")
            .groupBy("query_id")
            .agg(F.count("r_exact").cast("long").alias("n_exact"),
                 F.count("r_pred").cast("long").alias("n_pred"),
                 F.count_if(hit).cast("long").alias("n_hit"),
                 F.round(F.count_if(hit)
                         / F.count("r_exact"), 6).alias("recall_at_k"),
                 F.sum(F.when(hit, F.abs(F.col("r_exact")
                                         - F.col("r_pred")))
                       .otherwise(0)).cast("long")
                 .alias("rank_displacement")))


# --- block-level binary payload dedup (E147, r10) ---------------------------------
# The multimodal tier's first VALUE-CHECKED dedup: fixed aligned
# 64-byte blocks of the binary payload (filesystem/CAS-chunking
# semantics — codec-free, works on any binary column), block
# fingerprint = md5 of the lower-hex byte slice (Spark slices the real
# BINARY column; DuckDB slices hex(blob) at 2x offsets — bit-identical,
# verified before this oracle was written). Alignment-sensitivity is
# the stated contract: this answers re-ingested/truncated assets;
# text-content near-dup lives in the MinHash/SimHash tier.
@register(
    "media_block_dedup",
    """
    WITH raw AS (
      SELECT doc_id AS media_id, text FROM documents
      UNION ALL
      -- salted re-ingest: every 83rd asset appears byte-identically
      -- under a new id, so the full_dup branch is non-vacuous at
      -- every SF (the corpus's own exact dups are NORMALIZED-text
      -- dups, not byte-identical payloads)
      SELECT doc_id + 1000000 AS media_id, text FROM documents
      WHERE doc_id % 83 = 0
    ),
    m AS (
      SELECT media_id, hex(encode(text)) AS hx,
             CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)
               AS n_blocks
      FROM raw WHERE octet_length(encode(text)) > 0
    ),
    bx AS (SELECT media_id, hx, unnest(range(0, n_blocks)) AS bi FROM m),
    blocks AS (
      SELECT media_id, bi,
             md5(lower(substring(hx, CAST(bi * 128 + 1 AS BIGINT), 128)))
               AS h
      FROM bx
    ),
    safe AS (
      SELECT bi, h FROM blocks GROUP BY bi, h HAVING count(*) <= 8
    ),
    bl AS (
      SELECT b.media_id, b.bi, b.h
      FROM blocks b JOIN safe s ON s.bi = b.bi AND s.h = b.h
    ),
    pairs AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(*)::BIGINT AS n_shared_blocks
      FROM bl a JOIN bl b
        ON a.bi = b.bi AND a.h = b.h AND a.media_id < b.media_id
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    pl AS (SELECT media_id, n_blocks, md5(lower(hx)) AS ph FROM m)
    SELECT p.media_a, p.media_b, p.n_shared_blocks,
           pa.n_blocks AS n_blocks_a, pb.n_blocks AS n_blocks_b,
           (pa.ph = pb.ph) AS full_dup
    FROM pairs p
    JOIN pl pa ON pa.media_id = p.media_a
    JOIN pl pb ON pb.media_id = p.media_b
    """,
    doc="block-level dedup over the binary media payload: aligned "
        "64-byte blocks, md5-of-lower-hex fingerprints, (offset, hash) "
        "equi-join with a max_df=8 stop-block guard, pairs sharing >= "
        "2 blocks verified with whole-payload hash equality — the "
        "shuffle key is the block, never a pair",
)
def media_block_dedup(spark, sf_dir):
    from .operators.multimodal import block_dedup_pairs

    docs = load_table(spark, sf_dir, "documents")
    salted = (docs.where(F.col("doc_id") % 83 == 0)
              .withColumn("doc_id", F.col("doc_id") + 1000000))
    media = media_from_documents(
        docs.select("doc_id", "text")
        .unionByName(salted.select("doc_id", "text")))
    return block_dedup_pairs(media)


# --- E161: binary header sniff (magic + declared dims) ------------------------
# The codec-free step before any decode at 100 TB: read the magic,
# pull the declared dimensions, quarantine what doesn't parse. The
# payloads are assembled Spark-side with a REAL 8-byte header (ASCII
# magic + big-endian u16 dims + body bytes; every 13th asset truncated
# to 3 bytes) whose ground truth is a pure function of doc_id — so the
# oracle states the SPEC directly and the parity row proves the whole
# bytes roundtrip (assemble -> binary -> substring/conv parse) equals
# it, without the oracle engine touching a blob.
@register(
    "media_header_parse",
    """
    WITH base AS (
      SELECT doc_id AS media_id, text,
             16 + doc_id % 640 AS w,
             16 + (doc_id * 7) % 480 AS h,
             (doc_id % 13 = 0) AS corrupt
      FROM documents
    )
    SELECT media_id,
           CASE WHEN corrupt THEN 'unknown'
                WHEN media_id % 3 = 0 THEN 'png'
                WHEN media_id % 3 = 1 THEN 'jpeg'
                ELSE 'wav' END AS format,
           CASE WHEN corrupt THEN NULL
                ELSE CAST(w AS INTEGER) END AS width,
           CASE WHEN corrupt THEN NULL
                ELSE CAST(h AS INTEGER) END AS height,
           CASE WHEN corrupt THEN 3
                ELSE 8 + octet_length(encode(text)) END::BIGINT AS n_bytes,
           NOT corrupt AS header_ok
    FROM base
    """,
    doc="binary header sniff over the synthesized media table: 4-byte "
        "ASCII magic -> format, 2-byte big-endian dims via "
        "conv(hex(substring(binary))), short/unknown payloads "
        "quarantined (format 'unknown', null dims, header_ok false); "
        "oracle states the synthesis SPEC, so parity proves the "
        "assemble->parse byte roundtrip",
)
def media_header_parse(spark, sf_dir):
    from .operators.multimodal import (parse_media_headers,
                                       synth_media_headers)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return parse_media_headers(synth_media_headers(docs))


# --- E234: REAL WAV decode through the Arrow kernel path ----------------------
# The media tier's first GENUINE codec face: the payloads are real
# RIFF/WAVE PCM files assembled Spark-side (44-byte standard header +
# 16-bit mono samples, hex construction -> one unhex, no UDF on the
# write path), and the decode is the stdlib `wave` module — a real
# container parser that was in the container all along — plus numpy
# signal stats, inside the SAME Arrow-batched mapInPandas shape the
# tier's stand-in kernels pinned. The waveform is a constant-amplitude
# square wave whose parameters are pure functions of doc_id, so the
# oracle states the DECODED metadata in closed form (peak = rms =
# amplitude exactly; every sample is +-a) and the parity row proves
# assemble -> real bytes -> real codec -> stats equals the spec.
# Every 13th asset is truncated to 10 bytes: wave.Error -> the
# quarantine branch (ok=false, null stats), non-vacuous at every SF.
@register(
    "media_wav_decode",
    """
    SELECT doc_id AS media_id,
           (doc_id % 13 <> 0) AS ok,
           CASE WHEN doc_id % 13 <> 0
                THEN (8000 + (doc_id % 3) * 4000)::INTEGER END AS sample_rate,
           CASE WHEN doc_id % 13 <> 0 THEN 1::INTEGER END AS n_channels,
           CASE WHEN doc_id % 13 <> 0 THEN 2::INTEGER END AS sample_width,
           CASE WHEN doc_id % 13 <> 0
                THEN (40 + doc_id % 80)::BIGINT END AS n_frames,
           CASE WHEN doc_id % 13 <> 0
                THEN (500 + (doc_id % 17) * 250)::INTEGER END AS peak,
           CASE WHEN doc_id % 13 <> 0
                THEN (500 + (doc_id % 17) * 250)::INTEGER END AS rms,
           CASE WHEN doc_id % 13 <> 0
                THEN 44 + 2 * (40 + doc_id % 80)
                ELSE 10 END::BIGINT AS n_bytes
    FROM documents
    """,
    doc="REAL audio decode: Spark-assembled genuine RIFF/WAVE PCM "
        "payloads parsed by the stdlib wave codec + numpy stats in an "
        "Arrow-batched mapInPandas kernel; oracle states the synthesis "
        "spec in closed form, so parity proves the full "
        "assemble->codec->stats roundtrip; truncated uploads take the "
        "quarantine branch (ok=false, null stats)",
)
def media_wav_decode(spark, sf_dir):
    from .operators.multimodal import decode_wav, synth_wav_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_wav(synth_wav_media(docs))


# --- E166: reciprocal best match (mutual nearest neighbors) --------------------
@register(
    "knn_reciprocal_best",
    """
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    qa AS (SELECT * FROM x WHERE vec_id % 10 = 0 AND vec_id < 1000),
    qb AS (SELECT * FROM x WHERE vec_id % 10 <> 0 OR vec_id >= 1000),
    fwd AS (
      SELECT id_a, id_b, sc FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(a.v, b.v) AS sc,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.v, b.v) DESC,
                          b.vec_id) AS r
        FROM qa a JOIN qb b ON a.vec_id <> b.vec_id
      ) WHERE r = 1
    ),
    back AS (
      SELECT id_b, id_a FROM (
        SELECT b.vec_id AS id_b, a.vec_id AS id_a,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY list_cosine_similarity(b.v, a.v) DESC,
                          a.vec_id) AS r
        FROM (SELECT DISTINCT qb.* FROM qb
              SEMI JOIN fwd ON fwd.id_b = qb.vec_id) b
        JOIN qa a ON a.vec_id <> b.vec_id
      ) WHERE r = 1
    )
    SELECT f.id_a, f.id_b, round(f.sc, 6) AS cosine
    FROM fwd f JOIN back k ON k.id_a = f.id_a AND k.id_b = f.id_b
    """,
    doc="reciprocal best match (mutual nearest neighbors, the "
        "bilingual-lexicon-induction primitive): side A = every 10th "
        "vector under the fixed id cap (bounded queries at any SF), "
        "forward cosine top-1 into side B, back direction "
        "scored only for the forward winners (bounded by |A|) against "
        "A as the corpus, mutual pairs kept — two query-bounded scans, "
        "never |B|-side all-pairs",
)
def knn_reciprocal_best(spark, sf_dir):
    from .operators.similarity import reciprocal_best_match

    emb = load_table(spark, sf_dir, "embeddings")
    # side A must be a FIXED-size query set: sampling it proportionally
    # (%10 alone) grows |A|x|B| quadratically with the corpus — the
    # id cap keeps the face bounded at any SF (identical results at
    # the checked SFs, where every vec_id < 1000)
    is_a = (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 1000)
    return reciprocal_best_match(emb.where(is_a), emb.where(~is_a))


# --- E171: per-label embedding centroid drift -----------------------------------
# The embedding-model drift monitor: the "current" snapshot is a
# deterministic perturbation (labels 0-4 only: every 4th vector gets
# +0.25 on dimension vec_id % 64), so perturbed labels must report the
# planted shift and labels 5-9 must report EXACTLY zero — within one
# engine both centroids of an untouched label aggregate the same
# doubles in the same order, so d is exactly 0, and the zero branch is
# deterministic (top_dim = 0 by the min-dim tiebreak over all-zero
# shifts).
@register(
    "embedding_centroid_drift",
    """
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    ex AS (
      SELECT label, vec_id, unnest(v) AS val,
             generate_subscripts(v, 1) - 1 AS dim
      FROM x
    ),
    curex AS (
      SELECT label, vec_id, dim,
             CASE WHEN label < 5 AND vec_id % 4 = 0
                       AND dim = vec_id % 64
                  THEN val + 0.25 ELSE val END AS val
      FROM ex
    ),
    cb AS (SELECT label, dim, avg(val) AS c, count(*) AS n
           FROM ex GROUP BY 1, 2),
    cc AS (SELECT label, dim, avg(val) AS c FROM curex GROUP BY 1, 2),
    j AS (
      SELECT cb.label, cb.dim, cb.n, cc.c - cb.c AS d
      FROM cb JOIN cc ON cc.label = cb.label AND cc.dim = cb.dim
    ),
    agg AS (
      SELECT label, CAST(min(n) AS BIGINT) AS n_base,
             CAST(min(n) AS BIGINT) AS n_cur,
             round(sqrt(sum(d * d)), 6) AS l2_shift
      FROM j GROUP BY label
    ),
    top AS (
      SELECT label, dim, abs(d) AS ad,
             row_number() OVER (PARTITION BY label
                                ORDER BY abs(d) DESC, dim) AS r
      FROM j
    )
    SELECT a.label, a.n_base, a.n_cur, a.l2_shift,
           CAST(t.dim AS INTEGER) AS top_dim,
           round(t.ad, 6) AS top_dim_shift
    FROM agg a JOIN top t ON t.label = a.label AND t.r = 1
    """,
    doc="per-label embedding centroid drift between two snapshots: "
        "centroids from one posexplode + one hash aggregate per side "
        "(the corpus never shuffles, only labels x dims aggregate "
        "rows), L2 shift + argmax dimension with min-dim tiebreak; "
        "perturbed labels (0-4) report the planted shift, untouched "
        "labels report exactly zero",
)
def embedding_centroid_drift(spark, sf_dir):
    from .operators.similarity import centroid_drift

    emb = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "label",
                F.col("embedding").cast("array<double>").alias("embedding"))
    perturbed = emb.select(
        "vec_id", "label",
        F.when((F.col("label") < 5) & (F.col("vec_id") % 4 == 0),
               F.transform(
                   "embedding",
                   lambda v, i: F.when(i == F.col("vec_id") % 64,
                                       v + 0.25).otherwise(v)))
        .otherwise(F.col("embedding")).alias("embedding"))
    return centroid_drift(emb, perturbed)


# --- E172: mutual nearest neighbors over IVF (r12) ----------------------------
# The scale path for pipeline-embedded mutual-NN: knn_reciprocal_best
# (E166) scans the big side exactly — the honest run-once audit —
# while this face routes BOTH directions through the pinned-IVF index,
# so per-query work is nprobe/n_lists of the corpus. Centroid sets are
# pinned per side (id-below predicates both engines state literally);
# every stage — assignment argmin, probe selection, cosine over probed
# lists, top-1, mutuality join — is relational, so the whole
# approximate dataflow value-checks. The recall cost of probing is
# MEASURED by knn_eval_reciprocal below, never assumed.
def _ivf_top1_sql(qcte: str, ccte: str, cent_below: int, nprobe: int,
                  tag: str) -> str:
    """One IVF-routed top-1 direction as DuckDB CTE text: queries from
    ``qcte`` (vec_id, v) against corpus ``ccte``, centroids = corpus
    rows with vec_id < cent_below, ``nprobe`` nearest lists probed.
    Emits CTE ``top{tag}`` (qid, nid, s)."""
    return f"""
    c{tag} AS (SELECT vec_id AS list_id, v AS cv FROM {ccte}
               WHERE vec_id < {cent_below}),
    ad{tag} AS (
      SELECT e.vec_id AS nid, e.v, c.list_id,
             list_sum(list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - c.cv[i]) ^ 2)) AS dist
      FROM {ccte} e, c{tag} c
    ),
    a{tag} AS (SELECT nid, v, list_id FROM (
                 SELECT nid, v, list_id,
                        row_number() OVER (PARTITION BY nid
                                           ORDER BY dist, list_id) AS rn
                 FROM ad{tag}) WHERE rn = 1),
    pd{tag} AS (
      SELECT q.vec_id AS qid, q.qv AS qv, c.list_id,
             list_sum(list_transform(range(1, len(q.qv) + 1),
                                     i -> (q.qv[i] - c.cv[i]) ^ 2)) AS dist
      FROM (SELECT vec_id, v AS qv FROM {qcte}) q, c{tag} c
    ),
    pr{tag} AS (SELECT qid, qv, list_id FROM (
                  SELECT qid, qv, list_id,
                         row_number() OVER (PARTITION BY qid
                                            ORDER BY dist, list_id) AS rn
                  FROM pd{tag}) WHERE rn <= {nprobe}),
    sc{tag} AS (
      SELECT p.qid, a.nid, list_cosine_similarity(p.qv, a.v) AS s
      FROM pr{tag} p JOIN a{tag} a USING (list_id)
      WHERE p.qid <> a.nid
    ),
    top{tag} AS (SELECT qid, nid, s FROM (
                   SELECT qid, nid, s,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY s DESC, nid) AS rn
                   FROM sc{tag}) WHERE rn = 1)"""


def _reciprocal_ivf_sql() -> str:
    return f"""
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    qa AS (SELECT * FROM x WHERE vec_id % 10 = 0 AND vec_id < 1000),
    qb AS (SELECT * FROM x WHERE vec_id % 10 <> 0 OR vec_id >= 1000),
    {_ivf_top1_sql("qa", "qb", 16, 4, "f")},
    fwd AS (SELECT qid AS id_a, nid AS id_b, s FROM topf),
    qbw AS (SELECT DISTINCT qb.* FROM qb
            SEMI JOIN fwd ON fwd.id_b = qb.vec_id),
    {_ivf_top1_sql("qbw", "qa", 160, 4, "k")},
    back AS (SELECT qid AS id_b, nid AS id_a FROM topk)
    SELECT f.id_a, f.id_b, round(f.s, 6) AS cosine
    FROM fwd f JOIN back k ON k.id_a = f.id_a AND k.id_b = f.id_b
    """


@register(
    "knn_reciprocal_ivf",
    _reciprocal_ivf_sql(),
    doc="mutual nearest neighbors with both directions routed through "
        "the pinned-IVF index (nprobe=4): forward A->B against B's "
        "14-list pinned centroid set, back direction only for forward "
        "winners against A's 16-list set — per-query work is "
        "nprobe/n_lists of the corpus in each direction, the "
        "pipeline-embeddable form of knn_reciprocal_best; recall vs "
        "the exact mutual set is measured by knn_eval_reciprocal",
)
def knn_reciprocal_ivf(spark, sf_dir):
    from .operators.similarity import reciprocal_best_match_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    is_a = (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 1000)
    return reciprocal_best_match_ivf(
        emb.where(is_a), emb.where(~is_a), nprobe=4,
        cent_below_b=16, cent_below_a=160)


# The gate: IVF-mutual pairs scored against the exact mutual set — one
# summary row (the E140/E145/E146 convention; the exact side is the
# run-once brute-force audit, so this face is NOT benched).
def _eval_reciprocal_sql() -> str:
    return f"""
    WITH ex AS ({_R["knn_reciprocal_best"].oracle}),
    pv AS ({_reciprocal_ivf_sql()}),
    j AS (
      SELECT coalesce(ex.id_a, pv.id_a) AS id_a,
             ex.id_a IS NOT NULL AS in_exact,
             pv.id_a IS NOT NULL AS in_pred
      FROM ex FULL OUTER JOIN pv
        ON ex.id_a = pv.id_a AND ex.id_b = pv.id_b
    )
    SELECT sum(CASE WHEN in_exact THEN 1 ELSE 0 END)::BIGINT AS n_exact,
           sum(CASE WHEN in_pred THEN 1 ELSE 0 END)::BIGINT AS n_pred,
           sum(CASE WHEN in_exact AND in_pred
                    THEN 1 ELSE 0 END)::BIGINT AS n_hit,
           round(sum(CASE WHEN in_exact AND in_pred THEN 1 ELSE 0 END)
                 * 1.0 / sum(CASE WHEN in_exact THEN 1 ELSE 0 END), 6)
             AS recall,
           round(sum(CASE WHEN in_exact AND in_pred THEN 1 ELSE 0 END)
                 * 1.0 / sum(CASE WHEN in_pred THEN 1 ELSE 0 END), 6)
             AS precision
    FROM j
    """


@register(
    "knn_eval_reciprocal",
    _eval_reciprocal_sql(),
    doc="mutual-NN rollout gate: the IVF-routed mutual pairs scored "
        "against the exact mutual set (knn_reciprocal_best) — pair "
        "recall AND precision in one summary row (IVF can also *add* "
        "pairs: a missed true top-1 can make a wrong pair mutual), "
        "composed from two value-checked faces so every miss is the "
        "real nprobe recall cost; gate face, not benched (E140 rule)",
)
def knn_eval_reciprocal(spark, sf_dir):
    from .operators.similarity import (reciprocal_best_match,
                                       reciprocal_best_match_ivf)

    emb = load_table(spark, sf_dir, "embeddings")
    is_a = (F.col("vec_id") % 10 == 0) & (F.col("vec_id") < 1000)
    a, b = emb.where(is_a), emb.where(~is_a)
    exact = (reciprocal_best_match(a, b)
             .select("id_a", "id_b", F.lit(True).alias("in_exact")))
    pred = (reciprocal_best_match_ivf(a, b, nprobe=4, cent_below_b=16,
                                      cent_below_a=160)
            .select("id_a", "id_b", F.lit(True).alias("in_pred")))
    j = exact.join(pred, ["id_a", "id_b"], "full_outer")
    ex = F.sum(F.when(F.col("in_exact"), 1).otherwise(0))
    pr = F.sum(F.when(F.col("in_pred"), 1).otherwise(0))
    hit = F.sum(F.when(F.col("in_exact") & F.col("in_pred"), 1)
                .otherwise(0))
    return j.agg(ex.cast("long").alias("n_exact"),
                 pr.cast("long").alias("n_pred"),
                 hit.cast("long").alias("n_hit"),
                 F.round(hit / ex, 6).alias("recall"),
                 F.round(hit / pr, 6).alias("precision"))


# --- E197: hubness diagnostic of the exact k-NN graph -----------------------
@register(
    "knn_hubness",
    """
    WITH nn AS (
      SELECT neighbor_id FROM (
        SELECT c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])) DESC,
                          c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      ) WHERE rank <= 10
    ),
    indeg AS (
      SELECT coalesce(d.d, 0) AS d
      FROM embeddings e
      LEFT JOIN (SELECT neighbor_id, count(*)::BIGINT AS d
                 FROM nn GROUP BY 1) d
        ON d.neighbor_id = e.vec_id
    ),
    m AS (
      SELECT count(*)::BIGINT AS n_vectors,
             max(d)::BIGINT AS max_in_degree,
             sum(CASE WHEN d = 0 THEN 1 ELSE 0 END)::BIGINT
               AS n_antihubs,
             sum(d) AS s1, sum(d * d) AS s2, sum(d * d * d) AS s3
      FROM indeg
    )
    SELECT n_vectors, CAST(10 AS BIGINT) AS k, max_in_degree,
           n_antihubs,
           CASE WHEN s2 * 1.0 / n_vectors
                     - (s1 * 1.0 / n_vectors) * (s1 * 1.0 / n_vectors)
                     > 0
                THEN round(
                  (s3 * 1.0 / n_vectors
                   - 3 * (s1 * 1.0 / n_vectors) * (s2 * 1.0 / n_vectors)
                   + 2 * (s1 * 1.0 / n_vectors) * (s1 * 1.0 / n_vectors)
                     * (s1 * 1.0 / n_vectors))
                  / ((s2 * 1.0 / n_vectors
                      - (s1 * 1.0 / n_vectors) * (s1 * 1.0 / n_vectors))
                     * sqrt(s2 * 1.0 / n_vectors
                            - (s1 * 1.0 / n_vectors)
                              * (s1 * 1.0 / n_vectors))), 6)
           END AS skewness
    FROM m
    """,
    doc="hubness audit of the exact top-10 cosine graph over the eval "
        "table: in-degree max / antihub count / population skewness "
        "g1 from exact integer moment sums (zero-degree vectors "
        "included via left join); RUN-ONCE rollout gate — the exact "
        "all-pairs graph is quadratic by intent, the pipeline path "
        "is the IVF tier",
)
def knn_hubness(spark, sf_dir):
    from .operators.similarity import hubness_report

    return hubness_report(load_table(spark, sf_dir, "embeddings"), k=10)


# --- E198: Matryoshka prefix-dimension retrieval gate ------------------------
@register(
    "knn_prefix_dim_eval",
    """
    WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
    pq AS (SELECT vec_id, CAST(embedding[1:32] AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id < 20),
    pc AS (SELECT vec_id, CAST(embedding[1:32] AS DOUBLE[]) AS v
           FROM embeddings),
    fullk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                          c.vec_id) AS rank
        FROM q JOIN c ON q.vec_id <> c.vec_id
      ) WHERE rank <= 10
    ),
    prefk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT pq.vec_id AS query_id, pc.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY pq.vec_id
                 ORDER BY list_cosine_similarity(pq.v, pc.v) DESC,
                          pc.vec_id) AS rank
        FROM pq JOIN pc ON pq.vec_id <> pc.vec_id
      ) WHERE rank <= 10
    )
    SELECT (SELECT count(DISTINCT query_id) FROM fullk)::BIGINT
             AS n_queries,
           CAST(10 AS BIGINT) AS k,
           CAST(32 AS BIGINT) AS prefix_dim,
           round((SELECT count(*) FROM fullk
                  JOIN prefk USING (query_id, neighbor_id))
                 / ((SELECT count(DISTINCT query_id) FROM fullk)
                    * 10.0), 6) AS recall
    """,
    doc="Matryoshka gate: recall@10 of first-32-dims cosine against "
        "full-64-dims cosine over the pinned 20-query set — the "
        "half-storage rollout readout; two bounded-query exact scans "
        "(the sanctioned brute-force shape), prefix sliced in-plan",
)
def knn_prefix_dim_eval(spark, sf_dir):
    from .operators.similarity import prefix_dim_recall

    return prefix_dim_recall(load_table(spark, sf_dir, "embeddings"),
                             k=10, prefix=32, n_queries=20)


# --- E199: hardest-positive / semi-hard-negative triplet mining --------------
@register(
    "embedding_triplet_mining",
    """
    WITH x AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    sc AS (
      SELECT a.vec_id AS aid, a.label AS alab,
             c.vec_id AS cid, c.label AS clab,
             list_cosine_similarity(a.v, c.v) AS cos
      FROM x a JOIN x c ON a.vec_id <> c.vec_id
      WHERE a.vec_id < 30
    ),
    pos AS (
      SELECT aid, cid AS pos_id, cos AS pcos FROM (
        SELECT aid, cid, cos,
               row_number() OVER (PARTITION BY aid
                                  ORDER BY cos, cid) AS rn
        FROM sc WHERE clab = alab
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT aid, cid AS neg_id, cos AS ncos FROM (
        SELECT s.aid, s.cid, s.cos,
               row_number() OVER (PARTITION BY s.aid
                                  ORDER BY s.cos DESC, s.cid) AS rn
        FROM sc s JOIN pos p ON p.aid = s.aid
        WHERE s.clab <> s.alab AND s.cos < p.pcos
      ) WHERE rn = 1
    )
    SELECT p.aid AS anchor_id, p.pos_id,
           round(p.pcos, 6) AS pos_cos,
           n.neg_id, round(n.ncos, 6) AS neg_cos,
           round(p.pcos - n.ncos, 6) AS margin
    FROM pos p LEFT JOIN neg n ON n.aid = p.aid
    """,
    doc="FaceNet-rule triplet mining over the labeled eval table: per "
        "anchor (vec_id < 30) the hardest positive (lowest same-label "
        "cosine) and the semi-hard negative (highest different-label "
        "cosine still below the positive); argmaxes as single "
        "(cosine, id)-struct min/max aggregates, anchors broadcast "
        "against one corpus scan, no-semi-hard anchors kept with null "
        "neg columns",
)
def embedding_triplet_mining(spark, sf_dir):
    from .operators.similarity import triplet_mining

    return triplet_mining(load_table(spark, sf_dir, "embeddings"),
                          anchors_below=30)


# --- E200: Johnson-Lindenstrauss projection distortion audit -----------------
@register(
    "embedding_rp_distortion",
    """
    WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT unnest(range(1, 65)) AS i),
    js AS (SELECT unnest(range(0, 16)) AS j),
    proj AS (
      SELECT i, j,
             CASE WHEN ('0x' || substr(md5('rp:' || (i - 1) || ':' || j),
                                       1, 8))::BIGINT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM dims, js
    ),
    ex AS (SELECT vec_id, i, v[i] AS xv FROM x, dims),
    y AS (
      SELECT vec_id, j, sum(xv * s) AS y
      FROM ex JOIN proj USING (i) GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM x a JOIN x b ON b.vec_id = a.vec_id + 1
      UNION ALL
      SELECT a.vec_id, b.vec_id
      FROM x a JOIN x b ON b.vec_id = a.vec_id + 7
      UNION ALL
      SELECT a.vec_id, b.vec_id
      FROM x a JOIN x b ON b.vec_id = a.vec_id + 49
    ),
    orig AS (
      SELECT p.a, p.b,
             list_sum(list_transform(range(1, 65),
               i -> (xa.v[i] - xb.v[i]) * (xa.v[i] - xb.v[i]))) AS d2
      FROM pairs p
      JOIN x xa ON xa.vec_id = p.a
      JOIN x xb ON xb.vec_id = p.b
    ),
    pr AS (
      SELECT p.a, p.b, sum((ya.y - yb.y) * (ya.y - yb.y)) AS p2
      FROM pairs p
      JOIN y ya ON ya.vec_id = p.a
      JOIN y yb ON yb.vec_id = p.b AND yb.j = ya.j
      GROUP BY 1, 2
    ),
    r AS (
      SELECT pr.p2 / (16.0 * orig.d2) AS r
      FROM orig JOIN pr ON pr.a = orig.a AND pr.b = orig.b
      WHERE orig.d2 > 0
    )
    SELECT count(*)::BIGINT AS n_pairs,
           CAST(16 AS BIGINT) AS target_dim,
           round(avg(r), 6) AS mean_ratio,
           round(min(r), 6) AS min_ratio,
           round(max(r), 6) AS max_ratio
    FROM r
    """,
    doc="JL random-projection distortion: md5-derived +-1 sign matrix "
        "(64 -> 16 dims), projection as posexplode + broadcast sign "
        "join + one hash aggregate (no UDF, fully codegen), distance "
        "ratios ||Rx-Ry||^2/(16 ||x-y||^2) over the deterministic "
        "+1/+7/+49 offset pair sample — linear equi-joins, never "
        "all-pairs; +-1 signs keep products exact so the sums agree "
        "across engines",
)
def embedding_rp_distortion(spark, sf_dir):
    from .operators.similarity import rp_distortion

    return rp_distortion(load_table(spark, sf_dir, "embeddings"),
                         target_dim=16, offsets=(1, 7, 49))


# --- E222: representative-based silhouette per label --------------------------
# The cluster-separation gate: medoid-style s = (b-a)/max(a,b)
# against each label's min-id representative — linear, broadcast
# fan-out bounded by the label alphabet, per-row s quantized to
# integer micros so the per-label mean is an exact BIGINT sum.
@register(
    "embedding_silhouette",
    """
    WITH reps AS (
      SELECT label AS rl, arg_min(embedding, vec_id) AS rep
      FROM embeddings GROUP BY 1
    ),
    d AS (
      SELECT e.label AS l, e.vec_id AS id, r.rl,
             list_distance(CAST(e.embedding AS DOUBLE[]),
                           CAST(r.rep AS DOUBLE[])) AS d
      FROM embeddings e CROSS JOIN reps r
    ),
    pr AS (
      SELECT l, id,
             min(CASE WHEN l = rl THEN d END) AS a,
             min(CASE WHEN l <> rl THEN d END) AS b
      FROM d GROUP BY 1, 2
    ),
    m AS (
      SELECT l,
             CAST(round(a * 1e6) AS BIGINT) AS am,
             CAST(round(b * 1e6) AS BIGINT) AS bm,
             CASE WHEN b IS NOT NULL
                  THEN CAST(round(
                    CASE WHEN greatest(a, b) > 0
                         THEN (b - a) / greatest(a, b) ELSE 0
                    END * 1e6) AS BIGINT)
             END AS sm
      FROM pr
    )
    SELECT l AS label, count(*)::BIGINT AS n,
           round(sum(am) / 1e6 / count(*), 6) AS mean_a,
           CASE WHEN count(bm) > 0
                THEN round(sum(bm) / 1e6 / count(bm), 6) END AS mean_b,
           CASE WHEN count(sm) > 0
                THEN round(sum(sm) / 1e6 / count(sm), 6) END AS mean_s
    FROM m GROUP BY 1
    """,
    doc="medoid-style silhouette per embedding label: a = distance to "
        "the own label's min-id representative, b = nearest foreign "
        "representative, s = (b-a)/max(a,b); #labels-row broadcast, "
        "one corpus pass with label-alphabet fan-out, per-row s in "
        "exact integer micros so the mean survives summation order",
)
def embedding_silhouette(spark, sf_dir):
    from .operators.similarity import label_silhouette

    return label_silhouette(load_table(spark, sf_dir, "embeddings"),
                            "label", "embedding", "vec_id")


# --- E224: top eigenvector via integer-exact power iteration -------------------
def _eigen_oracle_sql(rounds: int = 5) -> str:
    """Unrolled power-iteration oracle (the BPE-oracle treatment):
    integer-micro Gram, HUGEINT matvecs, floats only at the final
    normalize + Rayleigh step — the same literals the operator uses."""
    ctes = []
    prev = "v0"
    for r in range(1, rounds + 1):
        ctes.append(
            f"v{r} AS (SELECT gs.i AS i, sum(gs.g * {prev}.c) AS c\n"
            f"          FROM gs JOIN {prev} ON {prev}.i = gs.j"
            f" GROUP BY 1)")
        prev = f"v{r}"
    joined = ",\n    ".join(ctes)
    return f"""
    WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    idx AS (SELECT unnest(range(1, 65)) AS i),
    gu AS (
      SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
             CAST(round(round(sum(v[p.i] * v[p.j]) / count(*), 6)
                        * 1e6) AS BIGINT) AS g
      FROM e, (SELECT a.i AS i, b.i AS j
               FROM idx a JOIN idx b ON b.i >= a.i) p
      GROUP BY p.i, p.j
    ),
    gs AS (SELECT i, j, g FROM gu
           UNION ALL SELECT j, i, g FROM gu WHERE i <> j),
    v0 AS (SELECT CAST(unnest(range(1, 65)) AS INT) AS i,
                  CAST(1 AS HUGEINT) AS c),
    {joined},
    nrm AS (SELECT sqrt(sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)))
                   AS nm
            FROM {prev}),
    vv AS (SELECT i, CAST(c AS DOUBLE) / nm AS v FROM {prev}, nrm),
    lam AS (SELECT sum((CAST(gs.g AS DOUBLE) / 1e6) * a.v * b.v) AS l
            FROM gs JOIN vv a ON a.i = gs.i JOIN vv b ON b.i = gs.j)
    SELECT vv.i AS dim, round(vv.v, 6) AS component,
           round(lam.l, 6) AS rayleigh
    FROM vv, lam
    """


@register(
    "embedding_top_eigen",
    _eigen_oracle_sql(rounds=5),
    doc="top principal direction of the embedding Gram via 5 rounds "
        "of power iteration in EXACT INTEGER arithmetic (6-dp gram -> "
        "integer micros, HUGEINT matvecs, PSD so no per-round "
        "normalization) — floats appear once, at the final "
        "unit-normalize + Rayleigh step; the corpus-scale work is the "
        "one distributed Gram pass, the iteration is dim-bounded "
        "driver math (the BPE-argmax convention); the oracle unrolls "
        "the identical rounds over HUGEINT CTEs",
)
def embedding_top_eigen(spark, sf_dir):
    from .operators.similarity import top_eigenvector

    return top_eigenvector(load_table(spark, sf_dir, "embeddings"),
                           rounds=5)
