"""LLM-data-pipeline queries: dedup, similarity search, text analysis,
multimodal plumbing — the north-star extensions, oracle-checked where
SQL-expressible.

Shingling/tokenization conventions are mirrored exactly between the
Spark operators and the DuckDB oracle SQL (single-space split, empty
tokens dropped, distinct word 3-grams).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.dedup import (
    exact_duplicate_groups,
    exact_jaccard_pairs,
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from .operators.multimodal import decode_media, media_from_documents
from .operators.similarity import cosine_topk, ivf_topk
from .operators.textstats import (
    content_fingerprints,
    detect_language,
    quality_scores,
    token_stats,
)
from .queries import _REGISTRY, register
from .sources.tables import load_table

# DuckDB CTE mirroring operators.dedup.word_shingles (distinct word
# 3-grams over non-empty space-split tokens).
_SHINGLES_CTE = """
w AS (
  SELECT doc_id, word, row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents)
  WHERE word <> ''
),
sh AS (
  SELECT DISTINCT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS shingle
  FROM w a
  JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)"""


# --- exact dedup -------------------------------------------------------------
# The synthetic corpus has no exact duplicates, so the check would pass
# vacuously (0 rows from both engines). Instead dedup runs over
# documents UNION ALL a mangled copy (uppercased, doubled+leading
# whitespace, shifted ids) that normalization must collapse — every
# fingerprint group provably has ≥2 members, so a green cell certifies
# real grouping, not an empty intersection.
@register(
    "dedup_exact_groups",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper('  ' || replace(text, ' ', '  '))
      FROM documents
    )
    SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM (SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
            AS fingerprint, doc_id FROM all_docs)
    GROUP BY fingerprint HAVING count(*) > 1
    """,
    doc="exact dedup: hash-groupBy on normalized-text md5 "
        "(input salted with mangled duplicates so the check is non-vacuous)",
)
def dedup_exact_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "),
                         F.regexp_replace("text", " ", "  "))).alias("text"),
    )
    return exact_duplicate_groups(docs.unionAll(mangled))


# --- exact n-gram Jaccard pairs (ground truth for LSH) ----------------------
@register(
    "jaccard_pairs_exact",
    f"""
    WITH {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(ix * 1.0 / (sa.sz + sb.sz - ix), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ix * 1.0 / (sa.sz + sb.sz - ix) >= 0.7
    """,
    doc="exact all-pairs 3-gram Jaccard ≥ 0.7 via inverted shingle index",
)
def jaccard_pairs_exact(spark, sf_dir):
    return exact_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.7)


# --- MinHash-LSH near-dedup (approximate candidates, exact verify) ----------
@register(
    "dedup_minhash_lsh",
    None,  # xxhash64-based signatures are Spark-specific; recall vs the
           # exact pairs is asserted in tests/test_dedup.py instead
    doc="MinHash(32)+LSH(8×4) near-dup pairs, Jaccard-verified ≥ 0.7",
)
def dedup_minhash_lsh(spark, sf_dir):
    return minhash_near_duplicates(load_table(spark, sf_dir, "documents"),
                                   threshold=0.7)


@register(
    "dedup_simhash",
    None,
    doc="64-bit SimHash near-dup pairs, Hamming ≤ 3, pigeonhole-banded",
)
def dedup_simhash(spark, sf_dir):
    return simhash_near_duplicates(load_table(spark, sf_dir, "documents"),
                                   max_hamming=3)


# --- dedup components (pairs → groups) ---------------------------------------
# Transitive closure of the near-dup relation: the step that turns pair
# lists into dedup groups with a canonical survivor (min id). Spark
# side: iterative min-label propagation (driver-bounded rounds, the
# MRFFT iteration contract); oracle side: DuckDB recursive CTE over the
# same exact-Jaccard ≥ 0.7 edges — one of the few iterative operators
# with a full value-checked oracle.
@register(
    "dedup_components",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ix * 1.0 / (sa.sz + sb.sz - ix) >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, min(lbl) AS component
    FROM reach GROUP BY node
    """,
    doc="connected components over exact-Jaccard ≥ 0.7 pairs: "
        "iterative min-label propagation vs recursive-CTE oracle",
)
def dedup_components(spark, sf_dir):
    from .operators.components import connected_components

    pairs = exact_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.7)
    return connected_components(pairs)


@register(
    "dedup_survivor_groups",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ix * 1.0 / (sa.sz + sb.sz - ix) >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT component AS keep_id, count(*) AS n_docs,
           count(*) - 1 AS n_dropped
    FROM comp GROUP BY component
    """,
    doc="per-component survivor summary (keep min-id, drop the rest) — "
        "the aggregation the corpus pipeline and dedup report act on",
)
def dedup_survivor_groups(spark, sf_dir):
    from .operators.components import connected_components, dedup_survivors

    pairs = exact_jaccard_pairs(load_table(spark, sf_dir, "documents"), 0.7)
    return dedup_survivors(connected_components(pairs))


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


# --- text analysis -----------------------------------------------------------
@register(
    "doc_token_stats",
    """
    SELECT doc_id, len(words) AS n_tokens, length(text) AS n_chars_text,
           round(length(list_aggregate(words, 'string_agg', ''))
                 * 1.0 / greatest(len(words), 1), 4) AS avg_token_len
    FROM (SELECT doc_id, text,
                 list_filter(string_split(lower(text), ' '),
                             w -> w <> '') AS words
          FROM documents)
    """,
    doc="token counting per document (narrow map)",
)
def doc_token_stats(spark, sf_dir):
    return token_stats(load_table(spark, sf_dir, "documents"))


@register(
    "doc_quality_scores",
    """
    SELECT doc_id,
           round(punct, 6) AS punct_ratio,
           round(digits, 6) AS digit_ratio,
           round(rep, 6) AS distinct_token_ratio,
           round(0.4 * length_ok + 0.3 * rep
                 + 0.2 * (1 - least(punct * 10, 1.0))
                 + 0.1 * (1 - least(digits * 10, 1.0)), 6) AS quality_score
    FROM (
      SELECT doc_id,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
               * 1.0 / greatest(length(text), 1) AS punct,
             (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               * 1.0 / greatest(length(text), 1) AS digits,
             len(list_distinct(list_filter(string_split(lower(text), ' '),
                                           w -> w <> '')))
               * 1.0 / greatest(len(list_filter(string_split(lower(text), ' '),
                                                w -> w <> '')), 1) AS rep,
             CASE WHEN length(text) BETWEEN 100 AND 20000
                  THEN 1.0 ELSE 0.5 END AS length_ok
      FROM documents)
    """,
    doc="quality scoring: punct/digit density, repetition, length band",
)
def doc_quality_scores(spark, sf_dir):
    return quality_scores(load_table(spark, sf_dir, "documents"))


@register(
    "doc_language_id",
    """
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS detected_lang,
           greatest(h_de, h_en, h_es, h_fr) AS hits
    FROM (
      SELECT doc_id,
             len(list_intersect(words, ['der','die','und','ist','das'])) AS h_de,
             len(list_intersect(words, ['the','and','of','to','is'])) AS h_en,
             len(list_intersect(words, ['el','la','y','es','los'])) AS h_es,
             len(list_intersect(words, ['le','la','et','est','les'])) AS h_fr
      FROM (SELECT doc_id,
                   list_distinct(list_filter(string_split(lower(text), ' '),
                                             w -> w <> '')) AS words
            FROM documents))
    """,
    doc="stopword-profile language ID (argmax, lexicographic ties)",
)
def doc_language_id(spark, sf_dir):
    return detect_language(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(norm) AS fingerprint, length(norm) AS norm_len
    FROM (SELECT doc_id, regexp_replace(lower(trim(text)), ' +', ' ', 'g')
            AS norm FROM documents)
    """,
    doc="content fingerprinting (md5 of normalized text)",
)
def doc_fingerprints(spark, sf_dir):
    return content_fingerprints(load_table(spark, sf_dir, "documents")) \
        .drop("crc")  # crc32 has no DuckDB analogue; stays in the operator


# --- TF-IDF keyword extraction ----------------------------------------------
# Both engines rank on the UNROUNDED score (tf and df are exact
# integers, so tf·ln((N+1)/(df+1)) is bit-identical IEEE math) with
# term as tie-break, and round only the reported value.
@register(
    "doc_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                w -> w <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT doc_id, term, tf, df, round(score, 6) AS tfidf, rank FROM (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) DESC,
                        tf.term) AS rank
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    """,
    doc="top-3 TF-IDF terms per document (tf agg → df agg → join → "
        "window top-k; smoothed idf)",
)
def doc_tfidf_top_terms(spark, sf_dir):
    from .operators.textstats import tfidf_top_terms

    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


# --- document chunking (context windows with overlap) ------------------------
# DuckDB list slicing is 1-based inclusive, so words[a+1 : a+size]
# mirrors Spark's slice(words, a+1, size) exactly.
@register(
    "doc_chunks",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    ),
    c AS (SELECT doc_id, words, len(words) AS n FROM w WHERE len(words) > 0)
    SELECT doc_id, chunk_id,
           len(words[chunk_id * 48 + 1 : chunk_id * 48 + 64])
             AS n_chunk_tokens,
           array_to_string(words[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
             AS chunk_text
    FROM (SELECT doc_id, words,
                 unnest(generate_series(
                   0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT)))
                   AS chunk_id
          FROM c)
    """,
    doc="overlapping token chunking (size 64, stride 48): "
        "split → sequence → explode → slice, shuffle-free",
)
def doc_chunks(spark, sf_dir):
    from .operators.textstats import token_chunks

    return token_chunks(load_table(spark, sf_dir, "documents"),
                        size=64, stride=48)


# --- Python UDTF extension point ---------------------------------------------
# One row per kept sentence via LATERAL split_sentences(text); the
# oracle states the same split/trim/drop-empties rule with unnest +
# a per-doc ordinal window. INTEGER casts mirror Spark's int columns.
@register(
    "doc_sentences_udtf",
    """
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                AS INTEGER) AS sent_idx,
           s AS sentence,
           CAST(length(s) AS INTEGER) AS n_chars
    FROM (SELECT doc_id, trim(unnest(string_split(text, '.')), ' ') AS s,
                 generate_subscripts(string_split(text, '.'), 1) AS i
          FROM documents)
    WHERE s <> ''
    """,
    doc="Python UDTF (LATERAL table function): sentence explode — the "
        "UDTF half of SURVEY §2.9's extension point; Arrow-batched, "
        "kept off benched paths by design",
)
def doc_sentences_udtf(spark, sf_dir):
    from .functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents") \
        .createOrReplaceTempView("_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
    """)


# --- PII / contact-surface scan ----------------------------------------------
# Patterns restricted to the regex subset Java and RE2 evaluate
# identically (character classes + bounded repetition, no lookaround).
# The synthetic corpus contains no contacts, so — like
# dedup_exact_groups — the input is salted with a copy carrying one
# injected email + URL per doc, making every salted row a non-vacuous
# positive while originals pin the zero case.
@register(
    "doc_pii_scan",
    r"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             text || ' contact' || doc_id ||
             '@example.com see http://ex.com/page/' || doc_id
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
             AS n_emails,
           CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER)
             AS n_urls,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
           + len(regexp_extract_all(text, 'https?://[^ ]+')) > 0 AS has_pii
    FROM all_docs
    """,
    doc="PII/contact scan: regexp_count narrow map (emails + URLs), "
        "salted with injected contacts so the check is non-vacuous",
)
def doc_pii_scan(spark, sf_dir):
    from .operators.textstats import pii_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    salted = docs.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" contact"), F.col("doc_id"),
                 F.lit("@example.com see http://ex.com/page/"),
                 F.col("doc_id")).alias("text"))
    return pii_scan(docs.unionAll(salted))


@register(
    "doc_pii_redact",
    r"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             text || ' contact' || doc_id ||
             '@example.com see http://ex.com/page/' || doc_id
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]',
               'g'),
             'https?://[^ ]+', '[URL]', 'g') AS text
    FROM all_docs
    """,
    doc="PII redaction: emails/URLs replaced with placeholders over the "
        "same salted input as doc_pii_scan (global regexp_replace)",
)
def doc_pii_redact(spark, sf_dir):
    from .operators.textstats import redact_pii

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    salted = docs.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" contact"), F.col("doc_id"),
                 F.lit("@example.com see http://ex.com/page/"),
                 F.col("doc_id")).alias("text"))
    return redact_pii(docs.unionAll(salted))


# --- benchmark decontamination -----------------------------------------------
# Eval-set contamination check: docs sharing ≥1 word 8-gram with the
# benchmark set (here: documents 0-4 verbatim, so the sources
# themselves flag as fully contaminated — non-vacuous by construction).
@register(
    "doc_contamination_scan",
    """
    WITH toked AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '')
               AS words
      FROM documents
    ),
    sh8 AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(words) - 7),
               i -> array_to_string(words[i : i + 7], ' ')))) AS shingle
      FROM toked WHERE len(words) >= 8
    ),
    bench AS (SELECT DISTINCT shingle FROM sh8 WHERE doc_id < 5),
    hits AS (
      SELECT doc_id, count(*) AS n_shared
      FROM sh8 WHERE shingle IN (SELECT shingle FROM bench)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
           coalesce(h.n_shared, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc="benchmark decontamination: word-8-gram overlap vs a broadcast "
        "benchmark shingle set (map-side semi-join, no corpus shuffle)",
)
def doc_contamination_scan(spark, sf_dir):
    from .operators.textstats import contamination_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return contamination_scan(docs, docs.where(F.col("doc_id") < 5), n=8)


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


# --- embedding-cosine near-dup (the dedup face of similarity) ----------------
# The synthetic embeddings are near-random (max pairwise cosine ≈ 0.51
# at sf0.01), so the near-dup threshold sits at 0.4 to make the check
# non-vacuous (59 pairs at sf0.01). Both engines compare the ROUNDED
# cosine so a threshold-straddling ulp can't flip membership.
@register(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= 0.4
    """,
    doc="exact embedding-cosine near-dup pairs (small-scale oracle "
        "face; embedding_lsh_pairs is the scale path)",
)
def dedup_embedding_cosine(spark, sf_dir):
    from .operators.similarity import cosine_pairs

    return cosine_pairs(load_table(spark, sf_dir, "embeddings"), 0.4)


@register(
    "dedup_embedding_lsh",
    None,
    doc="random-hyperplane LSH near-dup: banded sign-bit signatures → "
        "chunk equi-join candidates → exact-cosine verify (precision 1, "
        "recall <1 by design at this low threshold; property-tested "
        "against cosine_pairs with planted near-dups)",
)
def dedup_embedding_lsh(spark, sf_dir):
    from .operators.similarity import embedding_lsh_pairs

    return embedding_lsh_pairs(load_table(spark, sf_dir, "embeddings"), 0.4)


# The oracle-checkable face of the LSH path (r8, the E76 md5-MinHash
# precedent applied to hyperplanes): ±1 sign planes pinned from md5
# parity over int8-quantized codes make every sign bit an exact
# integer computation both engines reproduce; the band-join-verify
# dataflow (and its shuffle keys) is byte-for-byte the production
# face's (_lsh_band_verify). 64/64 hardcoded in the SQL = the testdata
# embedding dim; the Spark face infers dim at runtime.
@register(
    "dedup_embedding_lsh_pinned",
    """
    WITH planes AS (
      SELECT jj.j, dd.d,
             CASE WHEN ('0x' || substr(md5(jj.j || '_' || dd.d), 1, 8))::BIGINT
                       % 2 = 0 THEN 1 ELSE -1 END AS sgn
      FROM (SELECT unnest(generate_series(0, 63)) AS j) jj,
           (SELECT unnest(generate_series(0, 63)) AS d) dd
    ),
    q AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS m
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    el AS (
      SELECT vec_id, t.d,
             CASE WHEN m > 0
                  THEN floor(v[t.d + 1] / m * 127 + 0.5)::BIGINT
                  ELSE 0 END AS c
      FROM q, unnest(generate_series(0, 63)) t(d)
    ),
    bits AS (
      SELECT e.vec_id, p.j,
             CASE WHEN sum(e.c * p.sgn) > 0 THEN 1 ELSE 0 END AS bit
      FROM el e JOIN planes p ON p.d = e.d
      GROUP BY e.vec_id, p.j
    ),
    bandv AS (
      SELECT vec_id, j // 8 AS chunk,
             sum(bit * (1 << (j % 8)))::BIGINT AS val
      FROM bits GROUP BY vec_id, j // 8
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bandv a JOIN bandv b
        ON a.chunk = b.chunk AND a.val = b.val AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                        CAST(eb.embedding AS DOUBLE[])), 6)
             AS cosine
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                       CAST(eb.embedding AS DOUBLE[])), 6)
          >= 0.4
    """,
    doc="md5-pinned sign-plane LSH near-dup pairs: every candidate pair "
        "an exact integer computation, full value oracle for the banded "
        "LSH dataflow (production Gaussian face stays dedup_embedding_lsh)",
)
def dedup_embedding_lsh_pinned(spark, sf_dir):
    from .operators.similarity import embedding_lsh_pairs_pinned

    return embedding_lsh_pairs_pinned(
        load_table(spark, sf_dir, "embeddings"), 0.4)


# --- deterministic content-hash train/val/test split -------------------------
# The corpus-prep step random sampling can't give: a reproducible,
# engine-portable, re-ingestion-stable split. Both engines compute the
# identical md5-hex-prefix bucket and the identical lexicographic
# thresholds (0.8/0.1/0.1 → 'cccc'/'e666' over a 16^4 bucket space), so
# every document's assignment is value-checked, not just the counts.
@register(
    "doc_train_val_split",
    """
    SELECT doc_id, substr(md5(text), 1, 4) AS bucket,
           CASE WHEN substr(md5(text), 1, 4) < 'cccc' THEN 'train'
                WHEN substr(md5(text), 1, 4) < 'e666' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="deterministic content-hash train/val/test split (0.8/0.1/0.1); "
        "narrow map, zero shuffle, stable across engines and re-ingestion",
)
def doc_train_val_split(spark, sf_dir):
    from .operators.splits import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "text").select("doc_id", "bucket", "split")


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


# --- incremental batch-vs-corpus dedup ---------------------------------------
# The synthetic corpus has no duplicates, so the batch is constructed
# to exercise every status non-vacuously: mangled copies of doc_id%10=0
# (normalization must collapse them → dup_of_corpus), novel rewrites of
# doc_id%10=1 (→ novel), and a second copy of each rewrite under a
# higher id (→ dup_in_batch). Both engines build the identical batch.
@register(
    "dedup_incremental",
    """
    WITH batch AS (
      SELECT doc_id + 1000000 AS doc_id,
             upper('  ' || replace(text, ' ', '  ')) AS text
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' zzznovel'
      FROM documents WHERE doc_id % 10 = 1
      UNION ALL
      SELECT doc_id + 3000000, text || ' zzznovel'
      FROM documents WHERE doc_id % 10 = 1
    ),
    fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
               AS fingerprint,
             row_number() OVER (
               PARTITION BY md5(regexp_replace(lower(trim(text)),
                                               ' +', ' ', 'g'))
               ORDER BY doc_id) AS rn
      FROM batch
    ),
    seen AS (
      SELECT DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
               AS fingerprint
      FROM documents
    )
    SELECT f.doc_id, f.fingerprint,
           CASE WHEN s.fingerprint IS NOT NULL THEN 'dup_of_corpus'
                WHEN f.rn > 1 THEN 'dup_in_batch'
                ELSE 'novel' END AS status
    FROM fp f LEFT JOIN seen s ON s.fingerprint = f.fingerprint
    """,
    doc="incremental ingestion dedup: batch fingerprints vs the corpus "
        "DISTINCT-fingerprint set (novel / dup_of_corpus / dup_in_batch)",
)
def dedup_incremental(spark, sf_dir):
    from .operators.dedup import incremental_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "),
                         F.regexp_replace("text", " ", "  "))).alias("text"))
    novel = docs.where(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zzznovel")).alias("text"))
    again = novel.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return incremental_dedup(mangled.unionAll(novel).unionAll(again), docs)


# Bloom-prefiltered face of the same contract: IDENTICAL statuses (so
# it shares dedup_incremental's oracle verbatim), but batch rows the
# corpus bitmap rejects never enter the verification join — the
# shuffle is proportional to the duplicate fraction, not the batch.
# The synthetic batch exercises both routes non-vacuously: mangled
# copies pass the bloom and verify as dup_of_corpus; the zzznovel
# rewrites are (mostly) rejected outright and settle from the in-batch
# rank alone.
@register(
    "dedup_incremental_bloom",
    _REGISTRY["dedup_incremental"].oracle,
    doc="bloom-prefiltered incremental ingestion dedup: broadcast "
        "corpus-fingerprint bitmap routes the batch, only possible "
        "members pay the exact verification join; no false negatives, "
        "exact statuses",
)
def dedup_incremental_bloom(spark, sf_dir):
    from .operators.dedup import incremental_dedup_bloom

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "),
                         F.regexp_replace("text", " ", "  "))).alias("text"))
    novel = docs.where(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zzznovel")).alias("text"))
    again = novel.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return incremental_dedup_bloom(
        mangled.unionAll(novel).unionAll(again), docs)


# --- BPE pair statistics (tokenizer training, step 1) ------------------------
@register(
    "bpe_pair_counts",
    """
    WITH vocab AS (
      SELECT word, count(*) AS n_occ
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, n_occ, word
      FROM (SELECT word, n_occ,
                   unnest(generate_series(1, length(word) - 1)) AS i
            FROM vocab WHERE length(word) >= 2)
    )
    SELECT pair, sum(n_occ)::BIGINT AS n_occurrences,
           count(DISTINCT word)::BIGINT AS n_distinct_words
    FROM pairs GROUP BY pair
    """,
    doc="BPE merge-selection statistics: adjacent char-pair frequencies "
        "exploded from the aggregated vocabulary, never the token stream",
)
def bpe_pair_counts(spark, sf_dir):
    from .operators.tokenizer import bpe_pair_counts as _bpe

    return _bpe(load_table(spark, sf_dir, "documents"))


# --- vocabulary coverage curve (tokenizer training, step 2) ------------------
@register(
    "vocab_coverage",
    """
    WITH counts AS (
      SELECT word, count(*) AS n_occ
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    ranked AS (
      SELECT sum(n_occ) OVER (ORDER BY n_occ DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             row_number() OVER (ORDER BY n_occ DESC, word) AS rank,
             sum(n_occ) OVER () AS total
      FROM counts
    )
    SELECT p AS coverage_target,
           min(rank)::BIGINT AS vocab_size,
           min_by(cum, rank)::BIGINT AS tokens_covered,
           max(total)::BIGINT AS total_tokens
    FROM ranked,
         (SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS p)
    WHERE cum >= p * total
    GROUP BY p
    """,
    doc="vocabulary sizing: smallest top-frequency vocab covering "
        "50/90/99% of token occurrences (cumsum over the vocab table)",
)
def vocab_coverage(spark, sf_dir):
    from .operators.tokenizer import vocab_coverage as _vc

    return _vc(load_table(spark, sf_dir, "documents"))


# --- repetition quality signals ----------------------------------------------
@register(
    "doc_repetition_scores",
    """
    WITH w AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1)
                     AS i
            FROM documents)
      WHERE word <> ''
    ),
    bg AS (
      SELECT a.doc_id, a.word || ' ' || b.word AS bigram
      FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    ),
    bgs AS (
      SELECT doc_id, count(*) AS n_bg, count(DISTINCT bigram) AS n_dist
      FROM bg GROUP BY doc_id
    ),
    tok AS (
      SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word
    ),
    tops AS (
      SELECT doc_id, max(c) AS top_c, sum(c)::BIGINT AS n_tokens
      FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(t.n_tokens, 0) AS n_tokens,
           round(coalesce(t.top_c, 0)
                 / greatest(coalesce(t.n_tokens, 1), 1), 6)
             AS top_token_frac,
           round(CASE WHEN coalesce(b.n_bg, 0) > 0
                      THEN (b.n_bg - b.n_dist) / b.n_bg
                      ELSE 0 END, 6) AS dup_bigram_frac
    FROM documents d
    LEFT JOIN tops t ON t.doc_id = d.doc_id
    LEFT JOIN bgs b ON b.doc_id = d.doc_id
    """,
    doc="C4/Gopher-style repetition signals: top-token fraction + "
        "duplicated-bigram fraction per document",
)
def doc_repetition_scores(spark, sf_dir):
    from .operators.textstats import repetition_scores

    return repetition_scores(load_table(spark, sf_dir, "documents"))


# --- sequence packing (context-window assembly) ------------------------------
@register(
    "doc_pack_sequences",
    """
    WITH toks AS (
      SELECT doc_id, source AS shard,
             len(list_filter(string_split(text, ' '), w -> w <> ''))
               AS n_tokens
      FROM documents
    ),
    pos AS (
      SELECT shard, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS off
      FROM toks WHERE n_tokens > 0
    ),
    spans AS (
      SELECT shard, doc_id, n_tokens, off,
             unnest(generate_series((off // 256)::BIGINT,
                                    ((off + n_tokens - 1) // 256)::BIGINT))
               AS bin_id
      FROM pos
    )
    SELECT shard, bin_id, doc_id,
           (least((bin_id + 1) * 256, off + n_tokens)
            - greatest(bin_id * 256, off))::BIGINT AS n_tokens_in_bin
    FROM spans
    """,
    doc="GPT-style sequence packing: per-shard concatenation order, "
        "fixed 256-token context windows, doc→window token assignment",
)
def doc_pack_sequences(spark, sf_dir):
    from .operators.packing import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), 256)


# --- source mixing (corpus recipe) -------------------------------------------
# A graded mixture over the synthetic sources: full src0, half src1,
# a quarter src2, a tenth src3, 5% of everything else — every rate
# band exercised, every row's keep decision value-checked.
@register(
    "corpus_source_mix",
    """
    WITH rated AS (
      SELECT doc_id, source, substr(md5(text), 1, 4) AS bucket,
             CASE source WHEN 'src0' THEN 1.0::DOUBLE
                         WHEN 'src1' THEN 0.5::DOUBLE
                         WHEN 'src2' THEN 0.25::DOUBLE
                         WHEN 'src3' THEN 0.1::DOUBLE
                         ELSE 0.05::DOUBLE END AS keep_rate,
             CASE source WHEN 'src0' THEN 'g'
                         WHEN 'src1' THEN '8000'
                         WHEN 'src2' THEN '4000'
                         WHEN 'src3' THEN '1999'
                         ELSE '0ccc' END AS bound
      FROM documents
    )
    SELECT doc_id, source, bucket, keep_rate, bucket < bound AS keep
    FROM rated
    """,
    doc="deterministic data-mixing: per-source content-hash downsampling "
        "to a target corpus recipe (1.0/0.5/0.25/0.1/0.05 rate bands)",
)
def corpus_source_mix(spark, sf_dir):
    from .operators.splits import mix_sources

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
    return (mix_sources(docs, rates, default_rate=0.05)
            .select("doc_id", "source", "bucket", "keep_rate", "keep"))


# --- streaming continuous-ingestion dedup ------------------------------------
# E38 composed with the idempotent sink (E28) behind a real
# Structured Streaming query: the salted corpus replays as 10 ordered
# micro-batches (originals first in doc_id order, then mangled copies
# of every 5th doc, then doubled novel rewrites), and each epoch dedups
# against fingerprints accumulated in strictly-earlier epochs. The
# final status table is deterministic — the oracle recomputes the
# identical epoch assignment (row_number over doc_id, div ceil(N/10))
# and the identical three-way status rules in SQL.
@register(
    "streaming_ingest_dedup",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper('  ' || replace(text, ' ', '  '))
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 3000000 + 2 * doc_id + dup.k, text || ' zzznovel'
      FROM documents, (SELECT unnest([0, 1]) AS k) dup
      WHERE doc_id % 5 = 1
    ),
    seqd AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) - 1 AS seq,
             (SELECT (count(*) + 9) // 10 FROM all_docs) AS chunk
      FROM all_docs
    ),
    ep AS (
      SELECT doc_id, epoch, fingerprint,
             row_number() OVER (PARTITION BY epoch, fingerprint
                                ORDER BY doc_id) AS rn
      FROM (SELECT doc_id, (seq // chunk)::INT AS epoch,
                   md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
                     AS fingerprint
            FROM seqd)
    )
    SELECT e.doc_id, e.fingerprint,
           CASE WHEN EXISTS (SELECT 1 FROM ep p
                             WHERE p.fingerprint = e.fingerprint
                               AND p.epoch < e.epoch)
                  THEN 'dup_of_corpus'
                WHEN e.rn > 1 THEN 'dup_in_batch'
                ELSE 'novel' END AS status,
           e.epoch
    FROM ep e
    """,
    doc="continuous-ingestion dedup over real micro-batches: per-epoch "
        "statuses vs the accumulated fingerprint store, idempotent "
        "epoch-keyed appends",
)
def streaming_ingest_dedup(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import Window

    from .streaming.ingest_dedup import StreamingIngestDedup
    from .streaming.replay import replay_shuffle_cap, write_microbatches

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "),
                         F.regexp_replace("text", " ", "  "))).alias("text"))
    novel = docs.where(F.col("doc_id") % 5 == 1) \
        .select("doc_id", F.concat("text", F.lit(" zzznovel")).alias("text"))
    doubled = novel.select(
        (3000000 + 2 * F.col("doc_id")).alias("doc_id"), "text").unionAll(
        novel.select((3000000 + 2 * F.col("doc_id") + 1).alias("doc_id"),
                     "text"))
    all_docs = docs.unionAll(mangled).unionAll(doubled)
    # global seq for the replay harness only (bounded salted corpus)
    seqd = all_docs.withColumn(
        "seq", F.row_number().over(Window.orderBy("doc_id")) - 1)
    d = tempfile.mkdtemp(prefix="ingest_stream_")
    store = tempfile.mkdtemp(prefix="ingest_store_")
    try:
        glob = write_microbatches(seqd, d, n_buckets=10)
        stream = (spark.readStream
                  .schema("doc_id long, text string, seq long")
                  .option("maxFilesPerTrigger", 1).parquet(glob))
        pipe = StreamingIngestDedup(spark, store)
        with replay_shuffle_cap(spark):
            q = (stream.writeStream.foreachBatch(pipe)
                 .trigger(availableNow=True).start())
            # fail loudly on timeout — a silent partial status table
            # would surface as a confusing oracle mismatch downstream
            assert q.awaitTermination(180), "ingest-dedup stream timed out"
        # materialize before the store directory is removed
        return (pipe.statuses()
                .select("doc_id", "fingerprint", "status",
                        F.col("epoch").cast("int").alias("epoch"))
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)


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


# --- unigram-LM quality scoring (perplexity proxy) ---------------------------
# Registered BELOW the checked window (r5's window is full and every
# slot has a never-checked query earning its first row); queued to
# rotate in next round — see tests/test_registry_order.py.
@register(
    "doc_unigram_logprob",
    """
    WITH vocab AS (
      SELECT word, count(*) AS n_occ
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    tot AS (SELECT sum(n_occ)::DOUBLE AS total,
                   count(*)::DOUBLE AS n_vocab FROM vocab),
    tok AS (
      SELECT doc_id, word, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY doc_id, word
    ),
    scored AS (
      SELECT t.doc_id, t.c,
             -ln((v.n_occ + 1.0) / (tot.total + tot.n_vocab)) AS neg_lp
      FROM tok t JOIN vocab v USING (word), tot
    )
    SELECT d.doc_id,
           coalesce(s.n_tokens, 0) AS n_tokens,
           coalesce(s.score, 0.0) AS avg_neg_logprob
    FROM documents d
    LEFT JOIN (SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                      round(sum(c * neg_lp) / sum(c), 6) AS score
               FROM scored GROUP BY doc_id) s USING (doc_id)
    """,
    doc="unigram-LM perplexity-proxy quality scoring: corpus-estimated "
        "add-one-smoothed -ln p(w), averaged per document",
)
def doc_unigram_logprob(spark, sf_dir):
    from .operators.tokenizer import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"))


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


# --- cross-document boilerplate mining ---------------------------------------
# The map stage of repeated-paragraph removal (CCNet/RefinedWeb-style
# cleaning): mine word 8-grams shared by ≥3 documents, then score each
# document's exposure to the mined set. Both queries share the
# (doc, ngram) CTE so the oracles state the same dataflow the Spark
# plans execute.
_BOILER_SQL_BASE = """
    WITH f AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(ws) - 7),
                    i -> array_to_string(ws[i + 1 : i + 8], ' '))) AS ngram
      FROM f WHERE len(ws) >= 8
    ),
    pairs AS (SELECT doc_id, ngram, count(*) AS c
              FROM g GROUP BY doc_id, ngram),
    boiler AS (
      SELECT ngram, count(*) AS n_docs, sum(c)::BIGINT AS n_occ
      FROM pairs GROUP BY ngram HAVING count(*) >= 3
    )
"""


@register(
    "corpus_boilerplate_ngrams",
    _BOILER_SQL_BASE + """
    SELECT ngram, n_docs, n_occ FROM boiler
    """,
    doc="cross-document boilerplate mining: word 8-grams in >=3 docs "
        "with doc and occurrence counts (operators/textstats.py)",
)
def corpus_boilerplate_ngrams(spark, sf_dir):
    from .operators.textstats import boilerplate_ngrams

    return boilerplate_ngrams(load_table(spark, sf_dir, "documents"),
                              n=8, min_docs=3)


@register(
    "doc_boilerplate_share",
    _BOILER_SQL_BASE + """,
    totals AS (SELECT doc_id, sum(c)::BIGINT AS n_ngrams
               FROM pairs GROUP BY doc_id),
    hits AS (
      SELECT p.doc_id, sum(p.c)::BIGINT AS n_boiler
      FROM pairs p WHERE p.ngram IN (SELECT ngram FROM boiler)
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           coalesce(t.n_ngrams, 0) AS n_ngrams,
           coalesce(h.n_boiler, 0) AS n_boiler,
           round(coalesce(h.n_boiler / t.n_ngrams, 0.0), 6)
             AS boiler_share
    FROM documents d
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    """,
    doc="per-document boilerplate exposure: fraction of the doc's "
        "8-gram stream that is corpus-level boilerplate — the "
        "template-page drop signal",
)
def doc_boilerplate_share(spark, sf_dir):
    from .operators.textstats import doc_boilerplate_share as share

    return share(load_table(spark, sf_dir, "documents"), n=8, min_docs=3)


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


# --- full BPE training loop --------------------------------------------------
# Formerly rows-only (iterative argmax); converted to a full oracle in
# r8 by UNROLLING the 8 training rounds as CTE rounds, the same pinned-
# input pattern as knn_mmr_rerank's greedy steps and
# events_item_pagerank's iterations. Each round k is three CTEs:
# p{k} (adjacent-pair counts off the framed-symbol vocabulary — the
# frame trick documented at _bpe_oracle_sql), b{k} (the argmax with the
# engine-shared tie-break: count desc, then lexicographic a, b), and
# v{k+1} (the greedy merge as a framed-string replace, left-to-right
# non-overlapping exactly like tokenizer._merge_pair's JVM fold).
# tests/test_llm_ops.py additionally pins the merge sequence to an
# independent pure-Python BPE reference.
def _bpe_train_oracle_sql(n_merges: int = 8) -> str:
    parts = ["""WITH w AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
wc AS (SELECT word, count(*) AS n_occ FROM w WHERE word <> '' GROUP BY word),
v0 AS (SELECT array_to_string(list_transform(string_split(word, ''),
         c -> chr(2) || c || chr(3)), '') AS fs, n_occ FROM wc)"""]
    for k in range(n_merges):
        parts.append(f"""p{k} AS (
  SELECT s.syms[t.i - 1] AS a, s.syms[t.i] AS b, sum(s.n_occ)::BIGINT AS cnt
  FROM (SELECT string_split(substr(fs, 2, length(fs) - 2),
               chr(3) || chr(2)) AS syms, n_occ FROM v{k}) s,
       unnest(generate_series(2, len(s.syms))) AS t(i)
  GROUP BY a, b),
b{k} AS (SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
v{k + 1} AS (SELECT replace(fs, chr(2) || a || chr(3) || chr(2) || b || chr(3),
                chr(2) || a || b || chr(3)) AS fs, n_occ FROM v{k}, b{k})""")
    sel = "\nUNION ALL ".join(
        f'SELECT {k} AS step, a AS "left", b AS "right", cnt AS pair_count '
        f"FROM b{k}" for k in range(n_merges))
    return ",\n".join(parts) + "\n" + sel + "\nORDER BY step"


@register(
    "bpe_learned_merges",
    _bpe_train_oracle_sql(8),
    doc="distributed BPE training: 8 learned merges over the corpus "
        "(vocab-scale pair aggregate + bounded argmax + JVM merge fold "
        "per round); oracle unrolls the rounds as framed-symbol CTEs",
)
def bpe_learned_merges(spark, sf_dir):
    from .operators.tokenizer import bpe_train

    merges = bpe_train(load_table(spark, sf_dir, "documents"), n_merges=8)
    rows = [(i, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "step int, left string, right string, pair_count long")


# Pinned merge table for the oracle-checked encode face: the realistic
# production shape (a pre-trained tokenizer's merge list is a fixed
# artifact applied to new corpora), and what makes the greedy fold
# SQL-checkable. Multi-level merges (th+e after t+h) exercise
# multi-char symbol folding. Training itself stays rows-only in
# bpe_learned_merges (iterative argmax).
_PINNED_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"),
]


def _bpe_oracle_sql() -> str:
    """DuckDB SQL computing the identical greedy BPE encode.

    Each symbol is framed as ``\\x02sym\\x03``; a merge (a, b) is then
    ``replace(s, '\\x02a\\x03\\x02b\\x03', '\\x02ab\\x03')`` applied in
    training order. String replace is left-to-right non-overlapping
    and the per-symbol framing makes every match a full-symbol pair
    (no cross-boundary or run artifacts — a consumed match never eats
    the next pair's delimiter), so the fold semantics of
    ``tokenizer._merge_pair`` are reproduced exactly; verified against
    the pure-Python reference in tests. Frame chars never occur in
    text (control bytes).
    """
    sl, sr = "\x02", "\x03"
    expr = ("array_to_string(list_transform(string_split(word, ''), "
            f"c -> '{sl}' || c || '{sr}'), '')")
    for a, b in _PINNED_BPE_MERGES:
        expr = f"replace({expr}, '{sl}{a}{sr}{sl}{b}{sr}', '{sl}{a}{b}{sr}')"
    return f"""
    WITH w AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
      WHERE word <> ''
    ),
    enc AS (SELECT doc_id, {expr} AS s FROM w),
    per AS (
      SELECT doc_id, count(*) AS n_words,
             sum(length(s) - length(replace(s, '{sr}', ''))) AS n_symbols
      FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(p.n_words, 0)::INT AS n_words,
           coalesce(p.n_symbols, 0)::INT AS n_symbols
    FROM documents d LEFT JOIN per p USING (doc_id)
    """


@register(
    "doc_bpe_tokens",
    _bpe_oracle_sql(),
    doc="BPE-encode the corpus with the pinned 8-merge table → per-doc "
        "word and symbol counts (narrow JVM fold, no Python, no "
        "shuffle); oracle emulates the greedy fold with framed-symbol "
        "string replaces",
)
def doc_bpe_tokens(spark, sf_dir):
    from .operators.tokenizer import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    return (bpe_encode(docs, _PINNED_BPE_MERGES)
            .select("doc_id", "n_words", "n_symbols"))


# --- bigram-LM quality scoring (conditional perplexity proxy) ----------------
# The tier above doc_unigram_logprob on the LM-filter ladder; queued
# for window rotation like its sibling.
@register(
    "doc_bigram_logprob",
    """
    WITH w AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1)
                     AS i
            FROM documents)
      WHERE word <> ''
    ),
    uni AS (SELECT word, count(*) AS n_occ FROM w GROUP BY word),
    nv AS (SELECT count(*)::DOUBLE AS n_vocab FROM uni),
    bg AS (SELECT a.doc_id, a.word AS prev, b.word AS word
           FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
    big AS (SELECT prev, word, count(*) AS c_vw FROM bg
            GROUP BY prev, word),
    per AS (SELECT doc_id, prev, word, count(*) AS c FROM bg
            GROUP BY doc_id, prev, word),
    sc AS (
      SELECT p.doc_id, p.c,
             -ln((g.c_vw + 1.0) / (u.n_occ + nv.n_vocab)) AS neg_lp
      FROM per p
      JOIN big g USING (prev, word)
      JOIN uni u ON u.word = p.prev, nv
    )
    SELECT d.doc_id, coalesce(s.n_bigrams, 0) AS n_bigrams,
           coalesce(s.score, 0.0) AS avg_neg_logprob
    FROM documents d
    LEFT JOIN (SELECT doc_id, sum(c)::BIGINT AS n_bigrams,
                      round(sum(c * neg_lp) / sum(c), 6) AS score
               FROM sc GROUP BY doc_id) s USING (doc_id)
    """,
    doc="conditional bigram-LM perplexity proxy: add-one-smoothed "
        "-ln p(w|prev) averaged per document",
)
def doc_bigram_logprob(spark, sf_dir):
    from .operators.tokenizer import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents"))


# --- C4-style line cleaning --------------------------------------------------
# The synthetic corpus is single-line word-soup with no punctuation, so
# (exactly like dedup_exact_groups) the checks run over a DERIVED
# multi-line corpus built identically in both engines: five lines per
# document with planted duplicates, punctuation-terminated sentences, a
# too-short line and a periodic "lorem ipsum" marker — every branch of
# the line filter and the keep-first dedup fold is provably exercised.
_SYNTH_LINES_CTE = """
synth AS (
  SELECT doc_id,
         substr(text, 1, 50) || '.'  AS la,
         substr(text, 51, 80)        AS lb,
         'Ok.'                       AS lc,
         substr(text, 1, 30) || '?'  AS ld,
         CASE WHEN doc_id % 7 = 0
              THEN 'lorem ipsum dolor sit amet.'
              ELSE 'A clean closing line here.' END AS le
  FROM documents
)"""


def _synth_lines(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.concat(F.substring("text", 1, 50), F.lit(".")).alias("la"),
        F.substring("text", 51, 80).alias("lb"),
        F.lit("Ok.").alias("lc"),
        F.concat(F.substring("text", 1, 30), F.lit("?")).alias("ld"),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit("lorem ipsum dolor sit amet."))
        .otherwise(F.lit("A clean closing line here.")).alias("le"))


@register(
    "doc_c4_line_filter",
    f"""
    WITH {_SYNTH_LINES_CTE},
    f AS (
      SELECT doc_id,
             la || chr(10) || lb || chr(10) || lc || chr(10) || ld
                || chr(10) || le AS text,
             list_filter([la, lb, lc, ld, le],
                         l -> regexp_matches(trim(l), '[.!?"]\\s*$')
                              AND len(list_filter(string_split(trim(l), ' '),
                                                  w -> w <> '')) >= 4)
               AS kept
      FROM synth
    )
    SELECT doc_id, 5::INT AS n_lines,
           CAST(len(kept) AS INT) AS n_kept,
           md5(array_to_string(kept, chr(10))) AS clean_md5,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(text, '{{') AS has_brace,
           len(kept) >= 2 AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT contains(text, '{{') AS keep
    FROM f
    """,
    doc="C4 line filter (Raffel et al. 2020 §2.2): keep "
        "punctuation-terminated lines with ≥4 words, junk-flag and "
        "keep/drop the document — zero-shuffle HOF map over a derived "
        "multi-line corpus",
)
def doc_c4_line_filter(spark, sf_dir):
    from .operators.cleaning import c4_line_filter

    s = _synth_lines(spark, sf_dir)
    docs = s.select(
        "doc_id",
        F.concat_ws("\n", "la", "lb", "lc", "ld", "le").alias("text"))
    out = c4_line_filter(docs, min_words=4, min_lines=2)
    return out.select(
        "doc_id", F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_kept").cast("int").alias("n_kept"),
        F.md5("clean_text").alias("clean_md5"),
        "has_lorem", "has_brace", "keep")


@register(
    "doc_dedup_lines",
    f"""
    WITH {_SYNTH_LINES_CTE},
    lines AS (
      SELECT doc_id, unnest([la, la, lb, ld, la]) AS line,
             generate_subscripts([la, la, lb, ld, la], 1) AS pos
      FROM synth
    ),
    firsts AS (
      SELECT doc_id, line, pos,
             row_number() OVER (PARTITION BY doc_id, line
                                ORDER BY pos) AS rn
      FROM lines
    )
    SELECT doc_id, 5::INT AS n_lines,
           CAST(count(*) AS INT) AS n_unique_lines,
           md5(string_agg(line, chr(10) ORDER BY pos)) AS dedup_md5
    FROM firsts WHERE rn = 1 GROUP BY doc_id
    """,
    doc="within-document repeated-line removal, keep-first in original "
        "order (zero-shuffle HOF fold; planted duplicate lines make "
        "the check non-vacuous)",
)
def doc_dedup_lines(spark, sf_dir):
    from .operators.cleaning import dedup_lines

    s = _synth_lines(spark, sf_dir)
    docs = s.select(
        "doc_id",
        F.concat_ws("\n", "la", "la", "lb", "ld", "la").alias("text"))
    out = dedup_lines(docs)
    return out.select(
        "doc_id", F.col("n_lines").cast("int").alias("n_lines"),
        F.col("n_unique_lines").cast("int").alias("n_unique_lines"),
        F.md5("text_deduped").alias("dedup_md5"))


# --- exact per-source stratified sample --------------------------------------
@register(
    "corpus_stratified_sample",
    """
    SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank
    FROM (SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents)
    WHERE rn <= 10
    """,
    doc="exactly 10 documents per source, chosen by md5(doc_id) order "
        "— seed-free, engine-portable, prefix-consistent sampling via "
        "the two-stage grouped top-k (no stratum ever funnels through "
        "one reducer)",
)
def corpus_stratified_sample(spark, sf_dir):
    from .operators.selection import stratified_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(docs, ["source"], 10, "doc_id") \
        .select("doc_id", "source",
                F.col("sample_rank").cast("bigint").alias("sample_rank"))


# --- token-budget quality curation -------------------------------------------
# Rank documents by a deterministic quality signal (non-space character
# density: one integer/integer division, bit-identical in any IEEE
# engine) and admit them best-first until a 10k-token budget fills.
# The cumulative sum is the range-partitioned two-pass prefix sum
# (operators/ranking.py) — no single-partition window ever sees the
# corpus.
@register(
    "corpus_quality_budget",
    """
    WITH scored AS (
      SELECT doc_id,
             len(replace(text, ' ', '')) * 1.0 / n_chars AS score,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, score, n_tokens,
             sum(n_tokens) OVER (
               ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM scored
    )
    SELECT doc_id, round(score, 6) AS score, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= 10000
    """,
    doc="compute-optimal curation: fill a 10k-token budget best-first "
        "by character-density score via the scalable global prefix sum",
)
def corpus_quality_budget(spark, sf_dir):
    from .operators.selection import quality_budget

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        (F.length(F.regexp_replace("text", " ", "")) * 1.0
         / F.col("n_chars")).alias("score"),
        F.size(F.filter(F.split("text", " "), lambda w: w != F.lit("")))
        .cast("bigint").alias("n_tokens"))
    out = quality_budget(scored, [F.col("score").desc(), F.col("doc_id")],
                         "n_tokens", 10000, cum_col="cum_tokens")
    return out.select("doc_id", F.round("score", 6).alias("score"),
                      "n_tokens", "cum_tokens")


# --- SemDeDup: semantic dedup within embedding clusters ----------------------
# Same fixed-centroid convention as embedding_nearest_centroid (the
# first four corpus vectors), same round-then-compare cosine rule as
# dedup_embedding_cosine; τ=0.35 keeps ~100 in-cluster pairs live at
# both checked SFs so the dropped set is provably non-empty.
@register(
    "dedup_semantic_clusters",
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
    asg AS (SELECT vec_id, v, centroid_id AS cluster FROM a WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT y.vec_id
      FROM asg x JOIN asg y
        ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      WHERE round(list_cosine_similarity(x.v, y.v), 6) >= 0.35
    )
    SELECT g.vec_id, g.cluster,
           (dr.vec_id IS NOT NULL) AS dropped
    FROM asg g LEFT JOIN dropped dr USING (vec_id)
    """,
    doc="SemDeDup (arXiv:2303.09540): nearest-centroid clustering, "
        "then per-cluster cosine ≥ 0.35 collapses near-duplicates to "
        "the smallest-id exemplar — the pair join is keyed by cluster, "
        "never all-pairs",
)
def dedup_semantic_clusters(spark, sf_dir):
    from .operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    cents = (emb.where(F.col("vec_id") < 4)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("embedding").cast("array<double>").alias("cv")))
    return semantic_dedup(emb, cents, threshold=0.35)


# --- winnowing fingerprints --------------------------------------------------
@register(
    "doc_winnow_fingerprints",
    """
    WITH wds AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 4 THEN
               list_transform(range(1, len(ws) - 4 + 2),
                 i -> substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 16))
             ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM wds
    ),
    s AS (
      SELECT doc_id, grams,
             CASE
               WHEN len(grams) >= 5 THEN
                 list_sort(list_distinct(
                   list_transform(range(1, len(grams) - 5 + 2),
                                  j -> list_min(grams[j:j+4]))))
               WHEN len(grams) >= 1 THEN [list_min(grams)]
               ELSE CAST([] AS VARCHAR[]) END AS sel
      FROM g
    )
    SELECT doc_id, CAST(len(grams) AS INT) AS n_grams,
           CAST(len(sel) AS INT) AS n_selected,
           md5(array_to_string(sel, ',')) AS fp_set_md5
    FROM s
    """,
    doc="winnowing fingerprints (Schleimer et al. 2003, MOSS): word "
        "4-gram md5 hashes, window-of-5 minima, distinct selected set "
        "— guarantees any shared ≥8-word run co-selects a hash; one "
        "zero-shuffle HOF projection",
)
def doc_winnow_fingerprints(spark, sf_dir):
    from .operators.textstats import winnow_fingerprints

    out = winnow_fingerprints(load_table(spark, sf_dir, "documents"),
                              k=4, w=5)
    return out.select("doc_id",
                      F.col("n_grams").cast("int").alias("n_grams"),
                      F.col("n_selected").cast("int").alias("n_selected"),
                      "fp_set_md5")


# --- winnowing overlap pairs (the MOSS comparison step) ----------------------
_WINNOW_SEL_CTE = """
wds AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 4 THEN
           list_transform(range(1, len(ws) - 4 + 2),
             i -> substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 16))
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM wds
),
s AS (
  SELECT doc_id,
         CASE
           WHEN len(grams) >= 5 THEN
             list_sort(list_distinct(
               list_transform(range(1, len(grams) - 5 + 2),
                              j -> list_min(grams[j:j+4]))))
           WHEN len(grams) >= 1 THEN [list_min(grams)]
           ELSE CAST([] AS VARCHAR[]) END AS sel
  FROM g
)"""


@register(
    "doc_overlap_pairs",
    f"""
    WITH {_WINNOW_SEL_CTE},
    ex AS (SELECT doc_id, len(sel) AS n_sel, unnest(sel) AS h FROM s)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(count(*) AS INT) AS n_shared,
           round(count(*) * 1.0
                 / (any_value(a.n_sel) + any_value(b.n_sel) - count(*)), 6)
             AS resemblance
    FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
    doc="MOSS overlap detection: inverted-index equi-join on winnowed "
        "fingerprints, scored by shared count and resemblance — cost "
        "is sum(df^2) over hashes, never a document cross product "
        "(max_df stop-fingerprint guard available for web-scale junk)",
)
def doc_overlap_pairs(spark, sf_dir):
    from .operators.textstats import winnow_overlap_pairs

    return winnow_overlap_pairs(load_table(spark, sf_dir, "documents"),
                                k=4, w=5)


# --- token-balanced shards ---------------------------------------------------
@register(
    "corpus_token_shards",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(cum AS BIGINT) AS cum_tokens,
           CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard
    FROM c
    """,
    doc="equal-work training shards: ~2000 tokens per shard in "
        "deterministic md5-shuffled order, via the range-partitioned "
        "two-pass global prefix sum (no single-reducer window)",
)
def corpus_token_shards(spark, sf_dir):
    from .operators.selection import token_shards

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != F.lit("")))
        .cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("_h"))
    out = token_shards(t, ["_h", "doc_id"], "n_tokens", 2000,
                       cum_col="cum_tokens")
    return out.select("doc_id", "n_tokens", "cum_tokens", "shard")


# --- token entropy (diversity signal) ----------------------------------------
@register(
    "doc_token_entropy",
    """
    WITH tok AS (
      SELECT doc_id, word, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY doc_id, word
    ),
    agg AS (
      SELECT doc_id, sum(c)::BIGINT AS n_tokens,
             sum(c * ln(c)) AS clc
      FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(round(ln(a.n_tokens) - a.clc / a.n_tokens, 6), 0.0)
             AS token_entropy
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc="per-document Shannon entropy of the word distribution "
        "(Gopher-style repetition/diversity signal), ln(n) - sum(c "
        "ln c)/n over per-word counts — one doc-keyed exchange",
)
def doc_token_entropy(spark, sf_dir):
    from .operators.textstats import token_entropy

    return token_entropy(load_table(spark, sf_dir, "documents"))


# --- dataset card (corpus ops report) ----------------------------------------
# The rollup a corpus owner actually reads before training: per
# (source, lang), per source, and grand-total document/char/token
# inventories. Integer-derived metrics only (sums, min/max, one exact
# division for the mean) so every cell is engine-exact; one pass, one
# grouping-sets aggregate — the Expand operator costs 3 rows per input
# row, all map-side combined before the single shuffle.
@register(
    "corpus_stats_card",
    """
    SELECT source, lang,
           CAST(GROUPING(source, lang) AS BIGINT) AS gid,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           CAST(sum(len(list_filter(string_split(text, ' '),
                                    w -> w <> ''))) AS BIGINT)
             AS total_tokens,
           min(n_chars)::BIGINT AS min_chars,
           max(n_chars)::BIGINT AS max_chars,
           round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """,
    doc="dataset card: per-(source, lang) / per-source / grand-total "
        "document, char and token inventories in ONE rollup pass "
        "(3-row Expand, map-side combined before the single shuffle)",
)
def corpus_stats_card(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "),
                            lambda w: w != F.lit("")))
    return (docs.withColumn("_nt", n_tok)
            .rollup("source", "lang")
            .agg(F.grouping_id().alias("gid"),
                 F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.sum("_nt").cast("bigint").alias("total_tokens"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.round(F.sum("n_chars") * 1.0 / F.count("*"), 4)
                 .alias("avg_chars"))
            .select("source", "lang", "gid", "n_docs", "total_chars",
                    "total_tokens", "min_chars", "max_chars",
                    "avg_chars"))


# --- BM25 retrieval (E64) ----------------------------------------------------
# The query-term list is a module literal so the Spark plan and the
# generated oracle SQL can never disagree on the unrolled expressions.
_BM25_TERMS = ["spark", "query", "stream", "merge"]


def _bm25_oracle() -> str:
    from .operators.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=25)


@register(
    "doc_bm25_topk",
    None,  # replaced right below — oracle is generated from the terms
    doc="Okapi BM25 top-25 for a bag-of-words query: narrow per-doc "
        "tf/dl expressions (no corpus explode), ONE 1-row stats "
        "aggregate broadcast back, TakeOrderedAndProject top-k",
)
def doc_bm25_topk(spark, sf_dir):
    from .operators.retrieval import bm25_topk

    return bm25_topk(load_table(spark, sf_dir, "documents"),
                     _BM25_TERMS, k=25)


# register() stores the oracle eagerly; patch in the generated SQL so
# both faces derive from the same _BM25_TERMS literal
from .queries import _REGISTRY as _R  # noqa: E402

_R["doc_bm25_topk"].oracle = _bm25_oracle()


# --- DSIR importance weights (E65) -------------------------------------------
@register(
    "doc_dsir_weights",
    """
    WITH w AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS words
      FROM documents
    ),
    f AS (
      SELECT doc_id, lang = 'en' AS t,
             substr(md5(g), 1, 3) AS b, count(*) AS c
      FROM (SELECT doc_id, lang,
                   unnest(CASE WHEN len(words) >= 2
                          THEN list_transform(range(1, len(words)),
                                              i -> words[i] || ' ' || words[i+1])
                          ELSE [] END) AS g
            FROM w)
      GROUP BY doc_id, t, b
    ),
    bt AS (
      SELECT b, sum(c) AS raw,
             sum(CASE WHEN t THEN c ELSE 0 END) AS tgt
      FROM f GROUP BY b
    ),
    tot AS (SELECT sum(raw) AS traw, sum(tgt) AS ttgt FROM bt),
    lr AS (
      SELECT b, ln(tgt * 1.0 / greatest(ttgt, 1) + 1e-6)
               - ln(raw * 1.0 / greatest(traw, 1) + 1e-6) AS lr
      FROM bt CROSS JOIN tot
    ),
    pd AS (
      SELECT f.doc_id, sum(f.c)::BIGINT AS n_feats,
             sum(f.c * lr.lr) AS wsum
      FROM f JOIN lr USING (b) GROUP BY f.doc_id
    )
    SELECT d.doc_id, coalesce(pd.n_feats, 0) AS n_feats,
           coalesce(round(pd.wsum / pd.n_feats, 6), 0.0) AS weight
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
    doc="DSIR importance resampling weights (Xie et al. 2023): "
        "hashed-bigram target-vs-raw log-likelihood ratio per doc "
        "(probability-space +1e-6 smoothing), target = lang='en'; "
        "4096-bucket md5 feature hash, bucket table broadcast back — "
        "three keyed aggregates, no all-pairs",
)
def doc_dsir_weights(spark, sf_dir):
    from .operators.selection import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    return dsir_importance(docs, F.col("lang") == "en", bucket_chars=3)


# --- hashed linear quality classifier (E66) ----------------------------------
@register(
    "doc_quality_classifier",
    """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS words
      FROM documents
    ),
    sc AS (
      SELECT doc_id, len(words) AS n_tokens,
             CASE WHEN len(words) > 0 THEN
               round(list_sum(list_transform(words,
                 w -> ('0x' || substr(md5('q:' || w), 1, 8))::BIGINT
                      / 4294967296.0 * 2.0 - 1.0)) / len(words), 6)
             ELSE 0.0 END AS logit
      FROM s
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens, logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
           logit > 0 AS keep
    FROM sc
    """,
    doc="fastText-style hashed linear quality classifier: "
        "deterministic md5-derived token weights folded JVM-side "
        "(F.aggregate, zero shuffle, no explode); the trained-weights "
        "face (linear_quality_score_weighted) is the same dataflow "
        "with a broadcast weight table",
)
def doc_quality_classifier(spark, sf_dir):
    from .operators.cleaning import linear_quality_score

    return linear_quality_score(load_table(spark, sf_dir, "documents"))


# --- temperature-based source resampling (E67) -------------------------------
@register(
    "corpus_temperature_mix",
    """
    -- join on a null-coalesced shadow key, mirroring the operator:
    -- NULL sources form their own upsampling group and must NOT be
    -- dropped by NULL-never-equals-NULL join semantics
    WITH c AS (SELECT coalesce(source, chr(0) || '<null>') AS srckey,
                      count(*) AS ns
               FROM documents GROUP BY 1),
    mx AS (SELECT max(ns) AS nmax FROM c),
    s AS (
      SELECT srckey,
             round(sqrt(nmax / (ns * 1.0)), 6) AS multiplicity,
             CAST(floor(sqrt(nmax / (ns * 1.0))) AS BIGINT) AS base,
             CAST(floor((sqrt(nmax / (ns * 1.0))
                         - floor(sqrt(nmax / (ns * 1.0)))) * 65536)
                  AS BIGINT) AS extra
      FROM c CROSS JOIN mx
    ),
    d AS (
      SELECT d.doc_id, d.source, s.multiplicity,
             s.base + CASE WHEN ('0x' || substr(md5(d.text), 1, 4))::BIGINT
                                < s.extra THEN 1 ELSE 0 END AS n_copies
      FROM documents d
      JOIN s ON s.srckey = coalesce(d.source, chr(0) || '<null>')
    )
    SELECT doc_id, source, multiplicity,
           CAST(n_copies AS BIGINT) AS n_copies,
           CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy
    FROM d
    """,
    doc="temperature-based source upsampling (XLM-R/mT5 mixing rule, "
        "alpha=0.5): multiplicity (n_max/n_s)^0.5 per source, "
        "fractional copies realized by content-hash bucket — sqrt is "
        "IEEE-correctly-rounded so the whole path is engine-exact; "
        "tiny count table broadcast back, corpus never shuffles",
)
def corpus_temperature_mix(spark, sf_dir):
    from .operators.splits import temperature_resample

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_resample(docs, alpha=0.5)
    return out.select("doc_id", "source", "multiplicity",
                      F.col("n_copies").cast("long").alias("n_copies"),
                      F.col("copy").cast("long").alias("copy"))


# --- batch BM25 via inverted index (E64 scale face) --------------------------
@register(
    "doc_bm25_multi",
    """
    WITH q AS (
      SELECT * FROM (VALUES (1, 'spark'), (1, 'join'),
                            (2, 'stream'), (2, 'window'),
                            (3, 'merge'), (3, 'table'), (3, 'sort'))
        AS t(qid, term)
    ),
    base AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '')
               AS words
      FROM documents
    ),
    s AS (SELECT count(*) AS n, sum(len(words)) AS sumdl FROM base),
    post AS (
      SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, len(words) AS dl, unnest(words) AS term
            FROM base)
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
    scored AS (
      SELECT q.qid, p.doc_id,
             count(*)::BIGINT AS n_hits,
             round(sum(ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                       * (p.tf * 2.2)
                       / (p.tf + 1.2 * (0.25 + 0.75 * p.dl
                                        / (s.sumdl * 1.0 / s.n)))), 6)
               AS score
      FROM post p
      JOIN q ON p.term = q.term
      JOIN dfq ON p.term = dfq.term
      CROSS JOIN s
      GROUP BY q.qid, p.doc_id
    )
    SELECT * FROM (
      SELECT qid, doc_id, n_hits, score,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY score DESC, doc_id)
                  AS INTEGER) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
    doc="batch BM25 over an inverted index: corpus postings pruned to "
        "query terms BEFORE the (doc, term) aggregate, query table and "
        "per-term df broadcast back, per-query top-k via the two-stage "
        "grouped pattern (no per-query single-reducer funnel)",
)
def doc_bm25_multi(spark, sf_dir):
    from .operators.retrieval import bm25_search_many

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, ["spark", "join"]), (2, ["stream", "window"]),
         (3, ["merge", "table", "sort"])],
        "qid int, terms array<string>")
    out = bm25_search_many(docs, qs, k=10)
    return out.select(F.col("qid").cast("int").alias("qid"),
                      "doc_id", "n_hits", "score",
                      F.col("rank").cast("int").alias("rank"))


# --- streaming quality-gated ingestion (E68) ---------------------------------
# The classifier gate run AT INGEST over real micro-batches: documents
# replay in 10 ordered epochs, each epoch is scored and flagged by the
# stateless hashed-linear gate and written through the epoch-keyed
# idempotent sink. Deterministic end state — the oracle recomputes the
# identical scores, flags and epoch assignment (doc_id div ceil(N/10))
# in SQL.
@register(
    "streaming_quality_gate",
    """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS words
      FROM documents
    ),
    n AS (SELECT count(*) AS total FROM documents),
    sc AS (
      SELECT doc_id, len(words) AS n_tokens,
             CASE WHEN len(words) > 0 THEN
               round(list_sum(list_transform(words,
                 w -> ('0x' || substr(md5('q:' || w), 1, 8))::BIGINT
                      / 4294967296.0 * 2.0 - 1.0)) / len(words), 6)
             ELSE 0.0 END AS logit
      FROM s
    )
    SELECT doc_id, n_tokens::BIGINT AS n_tokens, logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
           round(1.0 / (1.0 + exp(-logit)), 6) >= 0.5
             AND n_tokens >= 5 AS kept,
           CAST(doc_id // CAST(ceil(total / 10.0) AS BIGINT) AS BIGINT)
             AS epoch
    FROM sc CROSS JOIN n
    """,
    doc="streaming quality-gated ingestion: the hashed-linear "
        "classifier gate applied per micro-batch over 10 replayed "
        "epochs, all rows written with flags through the epoch-keyed "
        "idempotent sink; oracle recomputes scores, flags and epoch "
        "assignment in SQL",
)
def streaming_quality_gate(spark, sf_dir):
    import shutil
    import tempfile

    from .streaming.quality_gate import StreamingQualityGate, run_quality_gate
    from .streaming.replay import replay_shuffle_cap, write_microbatches

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text").withColumn("seq", F.col("doc_id"))
    d = tempfile.mkdtemp(prefix="sqg_stream_")
    try:
        glob = write_microbatches(docs, d, n_buckets=10)
        stream = (spark.readStream
                  .schema("doc_id long, text string, seq long")
                  .option("maxFilesPerTrigger", 1).parquet(glob))
        gate = StreamingQualityGate(d + "_out")
        with replay_shuffle_cap(spark):
            run_quality_gate(spark, stream, gate, timeout_sec=180)
        out = gate.results(spark) \
            .select("doc_id", "n_tokens", "logit", "prob", "kept",
                    F.col("epoch").cast("long").alias("epoch"))
        # materialize before the temp store is deleted below
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d + "_out", ignore_errors=True)
        shutil.rmtree(d + "_out_ckpt", ignore_errors=True)


# --- shard manifest with content checksums (r8) ------------------------------
@register(
    "corpus_shard_manifest",
    """
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h,
             ('0x' || substr(md5(regexp_replace(lower(trim(text)),
                                                ' +', ' ', 'g')),
                             1, 8))::BIGINT AS fp
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens, fp,
             sum(n_tokens) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM t
    )
    SELECT CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard,
           count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(fp)::BIGINT AS checksum
    FROM c GROUP BY 1
    """,
    doc="shard manifest with order-insensitive content checksums "
        "(sum of member 32-bit fingerprint ints): the integrity "
        "artifact a trainer verifies before consuming a sharded "
        "export — stable under any partitioning, broken by any "
        "flipped/dropped/duplicated document",
)
def corpus_shard_manifest(spark, sf_dir):
    from .operators.selection import shard_manifest

    return shard_manifest(load_table(spark, sf_dir, "documents"))


# --- language-ID confusion matrix (r8) ---------------------------------------
# The detector-QA audit: labeled languages vs the stopword-profile
# detector, including how the profile-less zh label mis-buckets and
# the 'und' spill. Exact integer counts, one ratio division.
@register(
    "corpus_language_confusion",
    """
    WITH det AS (
      SELECT doc_id,
             CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr
                    THEN 'de'
                  WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                  WHEN h_es >= h_fr THEN 'es'
                  ELSE 'fr' END AS detected_lang
      FROM (
        SELECT doc_id,
               len(list_intersect(words,
                   ['der','die','und','ist','das'])) AS h_de,
               len(list_intersect(words,
                   ['the','and','of','to','is'])) AS h_en,
               len(list_intersect(words, ['el','la','y','es','los']))
                 AS h_es,
               len(list_intersect(words, ['le','la','et','est','les']))
                 AS h_fr
        FROM (SELECT doc_id,
                     list_distinct(list_filter(
                       string_split(lower(text), ' '), w -> w <> ''))
                       AS words
              FROM documents))
    ),
    cells AS (
      SELECT d.lang, det.detected_lang, count(*)::BIGINT AS n_docs
      FROM det JOIN documents d USING (doc_id)
      GROUP BY 1, 2
    ),
    tot AS (SELECT lang, sum(n_docs)::BIGINT AS label_total
            FROM cells GROUP BY 1)
    SELECT c.lang, c.detected_lang, c.n_docs, t.label_total,
           round(c.n_docs * 1.0 / t.label_total, 6) AS recall
    FROM cells c JOIN tot t USING (lang)
    """,
    doc="language-ID confusion matrix: stopword-profile detector vs "
        "provenance labels (per-cell share of the label's docs) -- "
        "the detector-QA audit before thresholds gate a multilingual "
        "corpus; two aggregates on the bounded label x detected grid",
)
def corpus_language_confusion(spark, sf_dir):
    from .operators.textstats import language_confusion

    return language_confusion(load_table(spark, sf_dir, "documents"))


# --- quality-score calibration audit (r8) ------------------------------------
# Classifier-prob deciles (exact-ntile spine) crossed with the
# independent lexicon gate: exact integer counts + one ratio division
# per decile — no float-sum hazard past the scoring step.
@register(
    "corpus_quality_calibration",
    """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS words
      FROM documents
    ),
    sc AS (
      SELECT doc_id,
             CASE WHEN len(words) > 0 THEN
               round(list_sum(list_transform(words,
                 w -> ('0x' || substr(md5('q:' || w), 1, 8))::BIGINT
                      / 4294967296.0 * 2.0 - 1.0)) / len(words), 6)
             ELSE 0.0 END AS logit,
             len(list_filter(words, x -> x IN ('slow', 'dup'))) <= 1
               AS kept
      FROM s
    ),
    j AS (
      SELECT doc_id, round(1.0 / (1.0 + exp(-logit)), 6) AS prob, kept
      FROM sc
    ),
    d AS (
      SELECT *, ntile(10) OVER (ORDER BY prob, doc_id) AS decile FROM j
    )
    SELECT decile::BIGINT AS decile, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN NOT kept THEN 1 ELSE 0 END)::BIGINT
             AS n_flagged,
           round(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS flag_rate
    FROM d GROUP BY 1
    """,
    doc="quality-score calibration: classifier-prob deciles x "
        "independent lexicon-gate flag rate -- the audit a learned "
        "curation score needs before it gates terabytes; exact-ntile "
        "spine, integer counts, single ratio division",
)
def corpus_quality_calibration(spark, sf_dir):
    from .operators.selection import quality_calibration

    return quality_calibration(load_table(spark, sf_dir, "documents"),
                               ["slow", "dup"], n_tiles=10, max_hits=1)


# --- k-anonymity audit (r8) --------------------------------------------------
# Quasi-identifiers over the customer dimension: nation x market
# segment x coarse balance band — combinations small enough that some
# equivalence classes fall under k=5 while most don't, so at_risk
# fires both ways.
@register(
    "customers_k_anonymity",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
           count(*)::BIGINT AS class_size,
           count(*) < 5 AS at_risk
    FROM customer
    GROUP BY 1, 2, 3
    """,
    doc="k-anonymity audit: equivalence-class sizes over "
        "quasi-identifier combinations with under-k classes flagged "
        "-- the re-identification check before a data release; one "
        "keyed aggregate, output bounded by class count",
)
def customers_k_anonymity(spark, sf_dir):
    from .operators.textstats import k_anonymity_report

    c = load_table(spark, sf_dir, "customer")
    return k_anonymity_report(
        c, ["c_nationkey", "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("long")
            .alias("bal_band")], k=5)


# --- lexicon safety gate (r8) ------------------------------------------------
# Blocklist = one common + one rare corpus word so hit counts spread
# and the max_hits=1 gate drops and keeps non-vacuously. Token match,
# not substring (the 'ass'-in-'class' false positive).
@register(
    "doc_blocklist_gate",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS words
      FROM documents
    ),
    h AS (
      SELECT doc_id, len(words) AS n_words,
             list_filter(words, x -> x IN ('slow', 'dup')) AS hits
      FROM w
    )
    SELECT doc_id, len(hits)::BIGINT AS n_hits,
           len(list_distinct(hits))::BIGINT AS n_distinct_terms,
           round(len(hits) * 1.0 / greatest(n_words, 1), 6) AS hit_ratio,
           len(hits) <= 1 AS kept
    FROM h
    """,
    doc="lexicon safety gate: whitespace-token blocklist hit counts "
        "and keep flag (the transparent first rung under the learned "
        "classifier tier); literal term array in the plan, narrow "
        "map, zero shuffle",
)
def doc_blocklist_gate(spark, sf_dir):
    from .operators.textstats import blocklist_gate

    return blocklist_gate(load_table(spark, sf_dir, "documents"),
                          ["slow", "dup"], max_hits=1)


# --- RAKE keyphrase extraction (r8) ------------------------------------------
# Stopwords are five HIGH-FREQUENCY corpus words so the phrase
# splitting is dense and non-vacuous. Scores stay in integer millis
# end to end (floor(degree*1000/freq) per word, summed) so the
# ranking never touches a float sum.
@register(
    "doc_rake_keyphrases",
    """
    WITH w0 AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS i,
             word IN ('join', 'scan', 'row', 'batch', 'hash') AS is_stop
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM documents)
      WHERE word <> ''
    ),
    w1 AS (
      SELECT *, sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS pid
      FROM w0
    ),
    cand AS (
      SELECT doc_id, pid, string_agg(word, ' ' ORDER BY i) AS phrase,
             count(*)::BIGINT AS n_words
      FROM w1 WHERE NOT is_stop GROUP BY doc_id, pid
    ),
    members AS (
      SELECT w1.doc_id, w1.pid, w1.word, c.n_words
      FROM w1 JOIN cand c ON c.doc_id = w1.doc_id AND c.pid = w1.pid
      WHERE NOT w1.is_stop
    ),
    wstats AS (
      SELECT word, count(*) AS freq, sum(n_words) AS deg
      FROM members GROUP BY word
    ),
    wm AS (SELECT word, floor(deg * 1000 / freq)::BIGINT AS milli
           FROM wstats),
    scored AS (
      SELECT m.doc_id, m.pid, sum(wm.milli)::BIGINT AS score_milli
      FROM members m JOIN wm USING (word) GROUP BY 1, 2
    ),
    ph AS (
      SELECT DISTINCT c.doc_id, c.phrase, c.n_words, s.score_milli
      FROM cand c JOIN scored s
        ON s.doc_id = c.doc_id AND s.pid = c.pid
    )
    SELECT doc_id, phrase, n_words, score_milli,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score_milli DESC, phrase)
             AS rank
    FROM ph QUALIFY rank <= 3
    """,
    doc="RAKE keyphrase extraction: stopword-delimited candidate "
        "phrases (gaps-and-islands, doc-keyed windows), corpus-wide "
        "degree/frequency word scores in integer millis, phrase = sum "
        "of word scores, two-stage grouped top-3",
)
def doc_rake_keyphrases(spark, sf_dir):
    from .operators.textstats import rake_keyphrases

    return rake_keyphrases(load_table(spark, sf_dir, "documents"),
                           ["join", "scan", "row", "batch", "hash"], k=3)


# --- pruned n-gram count table (r8) ------------------------------------------
@register(
    "corpus_ngram_table",
    """
    WITH w AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM documents)
      WHERE word <> ''
    ),
    u AS (
      SELECT 1 AS n, word AS gram FROM w
      UNION ALL
      SELECT 2, a.word || ' ' || b.word
      FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      UNION ALL
      SELECT 3, a.word || ' ' || b.word || ' ' || c.word
      FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
               JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    )
    SELECT n::BIGINT AS n, gram, count(*)::BIGINT AS cnt
    FROM u GROUP BY 1, 2 HAVING count(*) >= 2
    """,
    doc="pruned n-gram count table (orders 1-3, min count 2): the "
        "KenLM-style LM training table -- every occurrence counted, "
        "all orders in one scan + one map-side-combinable aggregate, "
        "hapax tail pruned",
)
def corpus_ngram_table(spark, sf_dir):
    from .operators.textstats import ngram_count_table

    return ngram_count_table(load_table(spark, sf_dir, "documents"))


# --- per-doc n-gram novelty (r8) ---------------------------------------------
@register(
    "corpus_gram_novelty",
    f"""
    WITH {_SHINGLES_CTE},
    own AS (SELECT shingle, min(doc_id) AS owner FROM sh GROUP BY shingle)
    SELECT s.doc_id, count(*)::BIGINT AS n_grams,
           sum(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel,
           round(sum(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty
    FROM sh s JOIN own o USING (shingle)
    GROUP BY s.doc_id
    """,
    doc="per-document n-gram novelty: fraction of a doc's distinct "
        "3-grams first owned by this doc (min-id election) -- the "
        "per-doc dedup-strength / memorization-exposure signal; "
        "inverted-index shape, no pair join",
)
def corpus_gram_novelty(spark, sf_dir):
    from .operators.textstats import gram_novelty

    return gram_novelty(load_table(spark, sf_dir, "documents"))


# --- ingest dup-rate trend (r8) ----------------------------------------------
# Both engines assign day = doc_id % 7 and plant mangled copies of
# doc_id%4=0 on the NEXT day ((doc_id+1)%7), so every day has real
# docs and most days have cross-day duplicates — rates non-vacuous in
# both directions. First occurrence is elected on the encoded
# day·10^8+id key in BOTH engines (integer min, no struct-vs-SQL
# mismatch).
@register(
    "corpus_dup_rate_daily",
    """
    WITH all_docs AS (
      SELECT doc_id, text, doc_id % 7 AS day FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper('  ' || replace(text, ' ', '  ')),
             (doc_id + 1) % 7
      FROM documents WHERE doc_id % 4 = 0
    ),
    t AS (
      SELECT day::BIGINT AS day, doc_id::BIGINT AS id,
             md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
      FROM all_docs
    ),
    firsts AS (
      SELECT fp, min({'day': day, 'id': id}) AS fkey FROM t GROUP BY fp
    )
    SELECT day, count(*)::BIGINT AS n_docs,
           sum(CASE WHEN day <> fkey.day OR id <> fkey.id
                    THEN 1 ELSE 0 END)::BIGINT AS n_dups,
           round(sum(CASE WHEN day <> fkey.day OR id <> fkey.id
                          THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_rate
    FROM t JOIN firsts USING (fp)
    GROUP BY day
    """,
    doc="ingest dup-rate trend: per ingest window, the fraction of "
        "docs whose fingerprint occurred earlier corpus-wide "
        "(min(struct(day,id)) first-occurrence election — safe for "
        "any id range; text never shuffles) -- the standing "
        "crawler-health monitor",
)
def corpus_dup_rate_daily(spark, sf_dir):
    from .operators.dedup import dup_rate_by_window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.withColumn("day", F.col("doc_id") % 7)
    mangled = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "),
                         F.regexp_replace("text", " ", "  ")))
        .alias("text"),
        ((F.col("doc_id") + 1) % 7).alias("day"))
    return dup_rate_by_window(base.unionByName(mangled))


# --- split representativeness drift (r8) -------------------------------------
# Composition face: the content-hash split (E31 machinery) feeding the
# E102 KS machinery with the SPLIT label as the group — "is my val
# slice distributionally representative of train". A content-hash
# split should show near-zero KS on length; a big gap would mean the
# split machinery (or the corpus) is length-biased.
@register(
    "corpus_split_drift",
    """
    WITH lab AS (
      SELECT CASE WHEN substr(md5(text), 1, 4) < 'cccc' THEN 'train'
                  WHEN substr(md5(text), 1, 4) < 'e666' THEN 'val'
                  ELSE 'test' END AS split,
             n_chars AS x
      FROM documents WHERE n_chars IS NOT NULL
    ),
    vc AS (SELECT split AS grp, x, count(*) AS c FROM lab GROUP BY 1, 2),
    grid AS (SELECT DISTINCT x FROM vc),
    sizes AS (SELECT grp, sum(c) AS n FROM vc GROUP BY 1),
    dense AS (
      SELECT s.grp, g.x, s.n, coalesce(v.c, 0) AS c
      FROM sizes s CROSS JOIN grid g
      LEFT JOIN vc v ON v.grp = s.grp AND v.x = g.x
    ),
    cdf AS (
      SELECT grp, x, n,
             sum(c) OVER (PARTITION BY grp ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) / n AS cdf
      FROM dense
    )
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           CAST(max(a.n) AS BIGINT) AS n_a,
           CAST(max(b.n) AS BIGINT) AS n_b,
           round(max(abs(a.cdf - b.cdf)), 6) AS ks
    FROM cdf a JOIN cdf b ON a.x = b.x AND a.grp < b.grp
    GROUP BY 1, 2
    """,
    doc="split representativeness: pairwise KS distance between the "
        "train/val/test slices' length distributions — the "
        "content-hash split audited by the drift machinery; bounded "
        "by distinct lengths x 3 slices",
)
def corpus_split_drift(spark, sf_dir):
    from .operators.grouped import ks_distance_matrix
    from .operators.splits import hash_split

    docs = load_table(spark, sf_dir, "documents")
    lab = hash_split(docs, "text").select("split", "n_chars")
    return ks_distance_matrix(lab, "n_chars", group_col="split")


# --- data-constrained epoch schedule (r8) ------------------------------------
# Weights derive from the source NUMBER (1 + n%4, a 4x spread) while
# availability is near-uniform, so with budget = 1.5x the corpus the
# cap provably fires both ways at every SF (epochs_raw ≈ 30·w_norm ∈
# {0.6, 1.2, 1.8, 2.4} with max_epochs=2). The budget itself is a
# bounded 1-row aggregate taken before plan construction (the
# L·K-coreset category of driver action).
@register(
    "corpus_epoch_schedule",
    """
    WITH t AS (
      SELECT source,
             sum(len(list_filter(string_split(text, ' '),
                                 w -> w <> '')))::BIGINT AS avail
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT floor(1.5 * sum(avail))::BIGINT AS budget FROM t),
    w AS (SELECT source,
                 (1 + CAST(substr(source, 4) AS INT) % 4) * 1.0 AS wt
          FROM t),
    tw AS (SELECT sum(wt) AS tw FROM w),
    base AS (
      SELECT t.source, t.avail AS n_tokens_avail,
             round(w.wt / tw.tw, 6) AS weight_norm
      FROM t JOIN w USING (source), tw
    ),
    calc AS (
      SELECT source, n_tokens_avail, weight_norm,
             floor(weight_norm * tot.budget)::BIGINT AS target_tokens
      FROM base, tot
    ),
    e AS (
      SELECT *, target_tokens * 1.0 / n_tokens_avail AS er FROM calc
    )
    SELECT source, n_tokens_avail, weight_norm, target_tokens,
           round(least(2.0, er), 6) AS epochs,
           er > 2.0 AS capped,
           floor(round(least(2.0, er), 6)
                 * n_tokens_avail)::BIGINT AS realized_tokens,
           (target_tokens - floor(round(least(2.0, er), 6)
                                  * n_tokens_avail))::BIGINT
             AS deficit_tokens
    FROM e
    """,
    doc="data-constrained epoch schedule: target shares -> per-source "
        "repeat factors capped at max_epochs, with the shortfall "
        "reported as deficit instead of silently redistributed; the "
        "corpus reduces to |sources| rows before any join",
)
def corpus_epoch_schedule(spark, sf_dir):
    from .operators.selection import epoch_schedule

    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "),
                     lambda w: w != F.lit(""))
    total = docs.agg(F.sum(F.size(words)).cast("long")).first()[0]
    weights = (docs.select("source").distinct()
               .select("source",
                       ((F.substring("source", 4, 10).cast("int") % 4 + 1)
                        .cast("double")).alias("weight")))
    return epoch_schedule(docs, weights, int(total * 1.5 // 1),
                          max_epochs=2.0)


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


# --- SFT chat-template rendering (r8) ----------------------------------------
# Both engines synthesize the identical 3-turn conversation per doc
# (fixed system prompt, user = first 60 chars, assistant = next 120),
# then compute the ChatML rendering arithmetic. The value-checked part
# is the span math: content_start/content_end are exact 0-based char
# offsets into the conversation's full rendered text — the loss mask.
@register(
    "doc_chat_render",
    """
    WITH turns AS (
      SELECT doc_id AS conv_id, 0 AS turn, 'system' AS role,
             'You are a helpful assistant.' AS content FROM documents
      UNION ALL
      SELECT doc_id, 1, 'user', substr(text, 1, 60) FROM documents
      UNION ALL
      SELECT doc_id, 2, 'assistant', substr(text, 61, 120) FROM documents
    ),
    r AS (
      SELECT conv_id, turn, role, content,
             (12 + length(role) + 1
              + coalesce(length(content), 0) + 11)::BIGINT AS rlen
      FROM turns
    ),
    o AS (
      SELECT conv_id, turn, role, content,
             coalesce(sum(rlen) OVER (
               PARTITION BY conv_id ORDER BY turn
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS strt
      FROM r
    )
    SELECT conv_id, turn, role,
           (strt + 12 + length(role) + 1)::BIGINT AS content_start,
           (strt + 12 + length(role) + 1
            + coalesce(length(content), 0))::BIGINT AS content_end,
           '<|im_start|>' || role || chr(10) || coalesce(content, '')
             || '<|im_end|>' || chr(10) AS rendered
    FROM o
    """,
    doc="SFT chat-template rendering: ChatML per-turn rendering with "
        "exact 0-based content spans (the loss mask) -- posexplode + "
        "one keyed per-conversation window, no global ordering",
)
def doc_chat_render(spark, sf_dir):
    from .operators.chat import chat_render_spans

    docs = load_table(spark, sf_dir, "documents")
    msgs = F.array(
        F.struct(F.lit("system").alias("role"),
                 F.lit("You are a helpful assistant.").alias("content")),
        F.struct(F.lit("user").alias("role"),
                 F.substring("text", 1, 60).alias("content")),
        F.struct(F.lit("assistant").alias("role"),
                 F.substring("text", 61, 120).alias("content")))
    return chat_render_spans(
        docs.select(F.col("doc_id").alias("conv_id"),
                    msgs.alias("messages")))


# --- HTML extraction (r8) ----------------------------------------------------
# The corpus is plain text, so (the _SYNTH_LINES_CTE precedent) both
# engines wrap each document in an IDENTICAL synthetic page first:
# head with a style block, h1 + p content, an &amp; entity, one anchor,
# and a script block on doc_id%3=0 — every extraction branch (block
# strip with contents, tag strip, entity decode incl. the amp-last
# double-decode guard, link count, whitespace collapse) provably
# exercised. Patterns avoid backreferences so Java regex and RE2 agree.
@register(
    "doc_html_extract",
    """
    WITH h AS (
      SELECT doc_id,
        '<html><head><STYLE>p{color:red}</STYLE></head><body><h1>'
        || substr(text, 1, 20) || '</h1><p>' || text
        || ' &amp; more</p><A HREF="http://x/' || doc_id
        || '">link</A>'
        || CASE WHEN doc_id % 3 = 0
                THEN '<SCRIPT>var x=1;</SCRIPT>' ELSE '' END
        || '</body></html>' AS html
      FROM documents
    ),
    s1 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(html,
               '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
               '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t
      FROM h
    ),
    s2 AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '(?i)<a[\\s>]'))::BIGINT
               AS n_links,
             regexp_replace(t, '<[^>]*>', ' ', 'g') AS t
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, n_links,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(t,
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', ''''), '&amp;', '&'),
               ' +', ' ', 'g')) AS text
      FROM s2
    )
    SELECT doc_id, n_links, text, length(text)::BIGINT AS n_chars
    FROM s3
    """,
    doc="HTML -> training text extraction: script/style block strip, "
        "anchor count, tag strip, basic entity decode (amp last), "
        "whitespace collapse -- one narrow map, zero shuffle, the "
        "step between the crawl and every cleaning operator",
)
def doc_html_extract(spark, sf_dir):
    from .operators.cleaning import html_extract

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Mixed-case tags on purpose: the planted page exercises the
    # case-insensitive strip/count paths so parity is non-vacuous on
    # real-world HTML (uppercase <SCRIPT>/<A HREF> pages).
    html = F.concat(
        F.lit('<html><head><STYLE>p{color:red}</STYLE></head><body><h1>'),
        F.substring("text", 1, 20), F.lit("</h1><p>"), F.col("text"),
        F.lit(' &amp; more</p><A HREF="http://x/'),
        F.col("doc_id").cast("string"), F.lit('">link</A>'),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("<SCRIPT>var x=1;</SCRIPT>")).otherwise(F.lit("")),
        F.lit("</body></html>"))
    return html_extract(docs.select("doc_id", html.alias("html")))


# --- dedup impact report (r8) ------------------------------------------------
# The go/no-go audit before a dedup pass. The synthetic corpus has no
# duplicates, so the input is salted with planted clusters covering
# FOUR sizes: every doc (size-1 tail), a mangled copy of doc_id%3=0
# (size 2), a verbatim + a mangled copy of doc_id%5=0 (size 3), and
# the %15=0 overlap of both rules (size 4) — the histogram, doc and
# token conservation, and survivor-token arithmetic all non-vacuous.
@register(
    "corpus_dedup_impact",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper('  ' || replace(text, ' ', '  '))
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 2000000, text
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 3000000, upper('  ' || replace(text, ' ', '  '))
      FROM documents WHERE doc_id % 5 = 0
    ),
    t AS (
      SELECT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
               AS fingerprint,
             doc_id,
             len(list_filter(string_split(text, ' '),
                             w -> w <> ''))::BIGINT AS n_tokens
      FROM all_docs
    ),
    per AS (
      SELECT fingerprint, count(*)::BIGINT AS cluster_size,
             sum(n_tokens)::BIGINT AS n_tokens,
             arg_min(n_tokens, doc_id) AS keep_tokens
      FROM t GROUP BY fingerprint
    )
    SELECT cluster_size, count(*)::BIGINT AS n_clusters,
           sum(cluster_size)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(n_tokens - keep_tokens)::BIGINT AS tokens_lost
    FROM per GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc="dedup impact audit: duplicate-cluster size histogram with "
        "exact training-token cost of deduplicating (tokens of every "
        "non-survivor); 40-byte projection + two keyed aggregations, "
        "output bounded by distinct cluster sizes",
)
def corpus_dedup_impact(spark, sf_dir):
    from .operators.dedup import dedup_impact_report

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangle = F.upper(F.concat(F.lit("  "),
                              F.regexp_replace("text", " ", "  ")))
    d3 = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), mangle.alias("text"))
    d5a = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text")
    d5b = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), mangle.alias("text"))
    return dedup_impact_report(
        docs.unionAll(d3).unionAll(d5a).unionAll(d5b))


# --- length-bucketed padded batching (r8) ------------------------------------
# The padded-batching complement of doc_pack_sequences: inference /
# encoder / reward-scoring batches pad to the batch max, so the
# assignment IS the wasted-FLOPs audit. One range-partitioned global
# rank (the E79 spine) + a keyed 32-row window — no single-reducer
# window anywhere.
@register(
    "corpus_length_batches",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                             w -> w <> ''))::BIGINT AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) AS rn
      FROM t
    ),
    b AS (SELECT doc_id, n_tokens, (rn - 1) // 32 AS batch_id FROM r)
    SELECT doc_id, n_tokens, batch_id::BIGINT AS batch_id,
           max(n_tokens) OVER (PARTITION BY batch_id)::BIGINT AS batch_max,
           (max(n_tokens) OVER (PARTITION BY batch_id)
            - n_tokens)::BIGINT AS pad_waste
    FROM b
    """,
    doc="length-bucketed micro-batch assignment with exact per-doc "
        "padding waste: range-partitioned global length rank, batch = "
        "rank div B, pad to batch max — the wasted-FLOPs audit of "
        "padded batching",
)
def corpus_length_batches(spark, sf_dir):
    from .operators.packing import length_batches

    return length_batches(load_table(spark, sf_dir, "documents"),
                          batch_size=32)


# --- streaming ingest health (r8) --------------------------------------------
# no_oracle by design: trigger durations, rates and wall-clock stamps
# are runtime facts, not data facts (the reservoir/MRFFT category).
# The structural invariants — monotonic batch ids, non-decreasing
# watermark, input-row conservation, non-negative lag — are property-
# tested in tests/test_streaming.py.
@register(
    "streaming_ingest_health",
    None,
    doc="per-trigger ingest health from StreamingQueryProgress: "
        "throughput, trigger duration, watermark and watermark lag — "
        "the ops-side complement of the ingest gates; bounded by the "
        "progress retention count, never by data size",
)
def streaming_ingest_health(spark, sf_dir):
    import shutil
    import tempfile

    from .streaming.health import health_report, query_progress
    from .streaming.replay import replay_shuffle_cap, write_microbatches

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id",
                    F.timestamp_seconds(F.lit(1_700_000_000)
                                        + F.col("doc_id")).alias("ts"))
            .withColumn("seq", F.col("doc_id")))
    d = tempfile.mkdtemp(prefix="sih_stream_")
    try:
        glob = write_microbatches(docs, d, n_buckets=5)
        stream = (spark.readStream
                  .schema("doc_id long, ts timestamp, seq long")
                  .option("maxFilesPerTrigger", 1).parquet(glob))
        agg = (stream.withWatermark("ts", "10 seconds")
               .groupBy(F.window("ts", "60 seconds")).count())
        with replay_shuffle_cap(spark):
            q = (agg.writeStream.outputMode("update")
                 .foreachBatch(lambda df, eid: df.count())
                 .trigger(availableNow=True)
                 .option("checkpointLocation", d + "_ckpt").start())
            assert q.awaitTermination(180), "health stream did not finish"
        return health_report(spark, query_progress(q))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(d + "_ckpt", ignore_errors=True)


# --- exact repeated-span removal (E69) ---------------------------------------
@register(
    "doc_span_dedup",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS words
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS start,
             array_to_string(words[i:i+7], ' ') AS gram
      FROM (SELECT doc_id, words,
                   unnest(range(1, len(words) - 8 + 2)) AS i
            FROM base WHERE len(words) >= 8)
    ),
    mined AS (
      SELECT gram FROM (SELECT gram, count(DISTINCT doc_id) AS nd
                        FROM pos GROUP BY gram)
      WHERE nd >= 2
    ),
    fl AS (
      SELECT doc_id, list_sort(list(DISTINCT start)) AS starts
      FROM pos JOIN mined USING (gram) GROUP BY doc_id
    ),
    cleaned AS (
      SELECT b.doc_id, b.words,
             CASE WHEN f.starts IS NULL THEN b.words
             ELSE list_filter(b.words, (w, i) ->
                    len(list_filter(f.starts,
                                    s -> s <= i AND i <= s + 7)) = 0)
             END AS kept
      FROM base b LEFT JOIN fl f USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_tokens,
           CAST(len(words) - len(kept) AS BIGINT) AS n_removed,
           -- array_to_string([]) is NULL in DuckDB, '' in Spark
           coalesce(array_to_string(kept, ' '), '') AS clean_text
    FROM cleaned
    """,
    doc="exact repeated-span removal (Lee et al. 2022 at word "
        "granularity, strip-all-occurrences variant): drop every "
        "token covered by a word 8-gram shared by >= 2 docs; ONE "
        "materialized positioned-gram table feeds both the mined set "
        "(broadcast back) and the per-doc flagged starts",
)
def doc_span_dedup(spark, sf_dir):
    from .operators.textstats import remove_repeated_spans

    return remove_repeated_spans(load_table(spark, sf_dir, "documents"))


# --- exact-substring dedup, keep-one variant (E131, r9) -----------------------
# The published ExactSubstr semantics (Lee et al. 2022): the FIRST
# OWNER (min doc_id) of a shared word 8-gram keeps its occurrences;
# every later doc loses the covered tokens — one copy of each
# duplicated span survives the corpus. Sibling of doc_span_dedup
# (strip-all, the boilerplate default); same positioned-gram table,
# the mined aggregate just also elects min(doc_id) as owner and the
# flag join drops the owner's own rows. Non-vacuous on the natural
# corpus (sf0.001: 1 115 shared grams, 22 owners, 24 losing docs).
@register(
    "doc_span_dedup_keepone",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS words
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS start,
             array_to_string(words[i:i+7], ' ') AS gram
      FROM (SELECT doc_id, words,
                   unnest(range(1, len(words) - 8 + 2)) AS i
            FROM base WHERE len(words) >= 8)
    ),
    mined AS (
      SELECT gram, owner FROM (
        SELECT gram, count(DISTINCT doc_id) AS nd,
               min(doc_id) AS owner
        FROM pos GROUP BY gram)
      WHERE nd >= 2
    ),
    fl AS (
      SELECT doc_id, list_sort(list(DISTINCT start)) AS starts
      FROM pos JOIN mined USING (gram)
      WHERE doc_id <> owner
      GROUP BY doc_id
    ),
    cleaned AS (
      SELECT b.doc_id, b.words,
             CASE WHEN f.starts IS NULL THEN b.words
             ELSE list_filter(b.words, (w, i) ->
                    len(list_filter(f.starts,
                                    s -> s <= i AND i <= s + 7)) = 0)
             END AS kept
      FROM base b LEFT JOIN fl f USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_tokens,
           CAST(len(words) - len(kept) AS BIGINT) AS n_removed,
           -- array_to_string([]) is NULL in DuckDB, '' in Spark
           coalesce(array_to_string(kept, ' '), '') AS clean_text
    FROM cleaned
    """,
    doc="exact repeated-span dedup, keep-one variant (Lee et al. 2022 "
        "ExactSubstr at word granularity): the min-doc_id owner of a "
        "shared 8-gram keeps its occurrences, later docs lose the "
        "covered tokens; same single positioned-gram table as "
        "doc_span_dedup, owner elected inside the mined aggregate",
)
def doc_span_dedup_keepone(spark, sf_dir):
    from .operators.textstats import remove_repeated_spans_keepone

    return remove_repeated_spans_keepone(
        load_table(spark, sf_dir, "documents"))


# --- char-granularity repeated-substring flags (E132, r9) ----------------------
# Sub-word repetition (minified JS, base64 blobs) is invisible to the
# word-8-gram faces; char 20-gram winnowing (window-8 minima, NOT
# stride sampling — strided windows only match offset-congruent
# copies) flags it with an alignment-independent >= 27-shared-chars
# guarantee, riding the same inverted-index shape as every dedup face.
@register(
    "doc_char_span_flags",
    """
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 20 THEN
               list_transform(range(1, length(text) - 20 + 2),
                 i -> substr(md5(substr(text, i, 20)), 1, 16))
             ELSE CAST([] AS VARCHAR[]) END AS grams
      FROM documents
    ),
    s AS (
      SELECT doc_id, len(grams)::BIGINT AS n_grams,
             CASE
               WHEN len(grams) >= 8 THEN
                 list_distinct(
                   list_transform(range(1, len(grams) - 8 + 2),
                                  j -> list_min(grams[j:j+7])))
               WHEN len(grams) >= 1 THEN [list_min(grams)]
               ELSE CAST([] AS VARCHAR[]) END AS sel
      FROM g
    ),
    pos AS (SELECT doc_id, unnest(sel) AS h FROM s),
    mined AS (
      SELECT h FROM (SELECT h, count(*) AS nd FROM pos GROUP BY h)
      WHERE nd >= 2
    ),
    fl AS (
      SELECT doc_id, count(*)::BIGINT AS n_flagged
      FROM pos JOIN mined USING (h) GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_grams, len(sel)::BIGINT AS n_selected,
           coalesce(fl.n_flagged, 0)::BIGINT AS n_flagged,
           CASE WHEN len(sel) > 0
                THEN round(coalesce(fl.n_flagged, 0) * 1.0 / len(sel), 6)
                ELSE 0.0 END AS flag_frac
    FROM s LEFT JOIN fl ON s.doc_id = fl.doc_id
    """,
    doc="char-granularity repeated-substring flags: winnowed char "
        "20-gram fingerprints (window-8 minima, alignment-independent "
        ">= 27-char guarantee) mined for >= 2-doc sharing; catches "
        "sub-word repetition (minified JS, base64) word-gram faces "
        "miss; one HOF projection + inverted-index join",
)
def doc_char_span_flags(spark, sf_dir):
    from .operators.textstats import char_span_flags

    return char_span_flags(load_table(spark, sf_dir, "documents"))


# --- reranker feature assembly on the BM25 shortlist (E133, r9) ----------------
# Retrieval ships BM25 -> shortlist; the production next hop is
# feature assembly for a learned scorer. (query, doc) pair features —
# first-stage rank/score, query coverage, raw-tf/length, earliest
# match position — as ONE broadcast-shortlist corpus join + expression
# block. The model call is not a data-engine concern; the features are.
@register(
    "doc_rerank_features",
    """
    WITH q AS (
      SELECT * FROM (VALUES (1, 'spark'), (1, 'join'),
                            (2, 'stream'), (2, 'window'),
                            (3, 'merge'), (3, 'table'), (3, 'sort'))
        AS t(qid, term)
    ),
    base AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), w -> w <> '')
               AS words
      FROM documents
    ),
    s AS (SELECT count(*) AS n, sum(len(words)) AS sumdl FROM base),
    post AS (
      SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
      FROM (SELECT doc_id, len(words) AS dl, unnest(words) AS term
            FROM base)
      WHERE term IN (SELECT DISTINCT term FROM q)
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, count(*) AS df FROM post GROUP BY term),
    scored AS (
      SELECT q.qid, p.doc_id,
             count(*)::BIGINT AS n_hits,
             round(sum(ln(1.0 + (s.n - dfq.df + 0.5) / (dfq.df + 0.5))
                       * (p.tf * 2.2)
                       / (p.tf + 1.2 * (0.25 + 0.75 * p.dl
                                        / (s.sumdl * 1.0 / s.n)))), 6)
               AS score
      FROM post p
      JOIN q ON p.term = q.term
      JOIN dfq ON p.term = dfq.term
      CROSS JOIN s
      GROUP BY q.qid, p.doc_id
    ),
    short AS (
      SELECT * FROM (
        SELECT qid, doc_id, n_hits, score,
               CAST(row_number() OVER (PARTITION BY qid
                                       ORDER BY score DESC, doc_id)
                    AS INTEGER) AS rank
        FROM scored)
      WHERE rank <= 10
    ),
    ql AS (SELECT qid, count(DISTINCT term)::BIGINT AS n_terms,
                  list(DISTINCT term) AS terms
           FROM q GROUP BY qid)
    SELECT sh.qid, sh.doc_id, sh.rank, sh.score, ql.n_terms, sh.n_hits,
           round(sh.n_hits * 1.0 / ql.n_terms, 6) AS overlap_frac,
           len(b.words)::BIGINT AS dl,
           len(list_filter(b.words,
                           w -> list_contains(ql.terms, w)))::BIGINT
             AS tf_total,
           round(len(list_filter(b.words,
                                 w -> list_contains(ql.terms, w))) * 1.0
                 / len(b.words), 6) AS density,
           list_min(list_filter(range(1, len(b.words) + 1),
                    i -> list_contains(ql.terms, b.words[i])))::BIGINT
             AS first_pos
    FROM short sh
    JOIN ql USING (qid)
    JOIN base b USING (doc_id)
    """,
    doc="reranker feature assembly over the BM25 top-10 shortlist: "
        "first-stage rank/score carried, query coverage "
        "(n_hits/n_terms), raw tf and length density, earliest match "
        "position; shortlist broadcast into one narrow corpus join",
)
def doc_rerank_features(spark, sf_dir):
    from .operators.retrieval import rerank_features

    docs = load_table(spark, sf_dir, "documents")
    qs = spark.createDataFrame(
        [(1, ["spark", "join"]), (2, ["stream", "window"]),
         (3, ["merge", "table", "sort"])],
        "qid int, terms array<string>")
    out = rerank_features(docs, qs, k=10)
    return out.select(F.col("qid").cast("int").alias("qid"),
                      "doc_id", F.col("rank").cast("int").alias("rank"),
                      "score", "n_terms", "n_hits", "overlap_frac",
                      "dl", "tf_total", "density", "first_pos")


# --- bounded backfill / catch-up (E134, r9) ------------------------------------
# The post-outage operation steady-state ingest faces don't cover:
# re-read ONLY the lagged bucket range (range bound in the source glob
# — partitions outside the lag window are never listed), land via
# dynamic partition overwrite. The query runs the catch-up TWICE with
# fresh checkpoints — the driver's value compare against the source-
# side oracle IS the no-duplicate-landing proof (a second append would
# double every count and checksum).
@register(
    "streaming_backfill_catchup",
    """
    WITH n AS (SELECT count(*) AS total FROM documents),
    t AS (
      SELECT doc_id,
             CAST(doc_id // CAST(ceil(total / 10.0) AS BIGINT)
                  AS BIGINT) AS bucket,
             len(list_filter(string_split(text, ' '),
                             w -> w <> ''))::BIGINT AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               AS fp
      FROM documents CROSS JOIN n
    )
    SELECT bucket, count(*)::BIGINT AS n_docs,
           sum(n_tokens)::BIGINT AS n_tokens,
           sum(fp)::BIGINT AS checksum
    FROM t WHERE bucket BETWEEN 4 AND 7
    GROUP BY bucket
    """,
    doc="bounded backfill of lagged buckets [4,7]: range-pruned source "
        "glob (unlagged partitions never listed), availableNow replay, "
        "dynamic-partition-overwrite landing; the catch-up runs TWICE "
        "with fresh checkpoints so the per-bucket counts + order-"
        "insensitive checksums also prove no-duplicate landing",
)
def streaming_backfill_catchup(spark, sf_dir):
    import shutil
    import tempfile

    from .streaming.backfill import backfill_report, run_backfill
    from .streaming.replay import replay_shuffle_cap, write_microbatches

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text").withColumn("seq", F.col("doc_id")))
    d = tempfile.mkdtemp(prefix="bfc_stream_")
    try:
        write_microbatches(docs, d, n_buckets=10)
        schema = "doc_id long, text string, seq long, bucket int"
        with replay_shuffle_cap(spark):
            run_backfill(spark, d, schema, 4, 7, d + "_out",
                         d + "_ck1")
            # the outage double-run: same range, lost checkpoint —
            # the sink contract (not the checkpoint) prevents dups
            sink = run_backfill(spark, d, schema, 4, 7, d + "_out",
                                d + "_ck2")
        out = backfill_report(sink.read(spark))
        # materialize before the temp store is deleted below
        return out.localCheckpoint(eager=True)
    finally:
        for suffix in ("", "_out", "_ck1", "_ck2"):
            shutil.rmtree(d + suffix, ignore_errors=True)


# --- quality-aware dedup survivors (E70) -------------------------------------
@register(
    "dedup_survivors_best",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ix * 1.0 / (sa.sz + sb.sz - ix) >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component
             FROM reach GROUP BY node),
    q AS (
      SELECT doc_id,
             round(0.4 * length_ok + 0.3 * rep
                   + 0.2 * (1 - least(punct * 10, 1.0))
                   + 0.1 * (1 - least(digits * 10, 1.0)), 6) AS quality_score
      FROM (
        SELECT doc_id,
               (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 * 1.0 / greatest(length(text), 1) AS punct,
               (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                 * 1.0 / greatest(length(text), 1) AS digits,
               len(list_distinct(list_filter(string_split(lower(text), ' '),
                                             w -> w <> '')))
                 * 1.0 / greatest(len(list_filter(string_split(lower(text), ' '),
                                                  w -> w <> '')), 1) AS rep,
               CASE WHEN length(text) BETWEEN 100 AND 20000
                    THEN 1.0 ELSE 0.5 END AS length_ok
        FROM documents)
    )
    SELECT component, doc_id AS keep_id, quality_score AS keep_score,
           n_docs, n_docs - 1 AS n_dropped
    FROM (
      SELECT c.component, c.doc_id, q.quality_score,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY q.quality_score DESC, c.doc_id)
               AS r,
             count(*) OVER (PARTITION BY c.component) AS n_docs
      FROM comp c JOIN q USING (doc_id))
    WHERE r = 1
    """,
    doc="quality-aware survivor per near-dup component (RefinedWeb "
        "keep-best-of-cluster): argmax of the heuristic quality score, "
        "id tiebreak, vs the recursive-CTE components + quality oracle",
)
def dedup_survivors_best(spark, sf_dir):
    from .operators.components import best_survivors, connected_components
    from .operators.textstats import quality_scores

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(exact_jaccard_pairs(docs, 0.7))
    return best_survivors(comp, quality_scores(docs))


# --- tokenizer fertility per source (E73) ------------------------------------
def _bpe_fertility_oracle_sql() -> str:
    """Per-source rollup of the pinned-merge BPE encode: reuses the
    framed-symbol replace fold of ``_bpe_oracle_sql`` and aggregates
    chars/words/symbols into the two tokenizer-selection metrics."""
    sl, sr = "\x02", "\x03"
    expr = ("array_to_string(list_transform(string_split(word, ''), "
            f"c -> '{sl}' || c || '{sr}'), '')")
    for a, b in _PINNED_BPE_MERGES:
        expr = f"replace({expr}, '{sl}{a}{sr}{sl}{b}{sr}', '{sl}{a}{b}{sr}')"
    return f"""
    WITH w AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
      WHERE word <> ''
    ),
    enc AS (SELECT doc_id, {expr} AS s FROM w),
    per AS (
      SELECT doc_id, count(*) AS n_words,
             sum(length(s) - length(replace(s, '{sr}', ''))) AS n_symbols
      FROM enc GROUP BY doc_id
    )
    SELECT d.source,
           count(*) AS n_docs,
           sum(d.n_chars)::BIGINT AS total_chars,
           coalesce(sum(p.n_words), 0)::BIGINT AS total_words,
           coalesce(sum(p.n_symbols), 0)::BIGINT AS total_symbols,
           round(sum(p.n_symbols) * 1.0 / sum(p.n_words), 6) AS fertility,
           round(sum(d.n_chars) * 1.0 / sum(p.n_symbols), 6)
             AS chars_per_symbol
    FROM documents d LEFT JOIN per p USING (doc_id)
    GROUP BY d.source
    """


@register(
    "corpus_bpe_fertility",
    _bpe_fertility_oracle_sql(),
    doc="tokenizer fertility per source: symbols/word and chars/symbol "
        "under the pinned 8-merge BPE — the metric a tokenizer/corpus "
        "pairing is selected on (high fertility = the tokenizer "
        "fragments that source); narrow encode fold + one rollup",
)
def corpus_bpe_fertility(spark, sf_dir):
    from .operators.tokenizer import bpe_encode

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode(docs, _PINNED_BPE_MERGES) \
        .select("doc_id", "n_words", "n_symbols")
    return (docs.select("doc_id", "source", "n_chars")
            .join(enc, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("total_chars"),
                 F.coalesce(F.sum("n_words"), F.lit(0)).cast("long")
                 .alias("total_words"),
                 F.coalesce(F.sum("n_symbols"), F.lit(0)).cast("long")
                 .alias("total_symbols"),
                 F.round(F.sum("n_symbols") * 1.0 / F.sum("n_words"), 6)
                 .alias("fertility"),
                 F.round(F.sum("n_chars") * 1.0 / F.sum("n_symbols"), 6)
                 .alias("chars_per_symbol")))


# --- incremental minhash near-dup matching (E74) -----------------------------
# r7 conversion: formerly rows-only. The md5 hash family
# (operators/dedup.py::md5_minhash_constants) is engine-portable, so
# the whole pipeline — shingle → 32-hash signature → 8-band collision
# → signature-estimate Jaccard — is deterministic SQL DuckDB can
# replay bit-for-bit. The oracle expresses band collision as SLICE
# EQUALITY, which is exactly what the operator's band_hash equality
# means (xxhash64 of the slice text; a 64-bit collision between
# unequal slices could only ADD a candidate pair, which the ≥threshold
# estimate filter then re-checks on the full signatures).


def _md5_minhash_sig_cte(src: str) -> str:
    """CTE block: md5-family 32-hash MinHash signatures over
    ``{src}(doc_id, text)`` → ``sig(doc_id, s)``. Embeds the SAME
    pinned (a_i, c_i) literals the Spark face uses."""
    from .operators.dedup import md5_minhash_constants

    mins = ", ".join(f"min(({a} * b + {c}) % 2147483647)"
                     for a, c in md5_minhash_constants(32))
    return f"""
    ws AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM {src})
      WHERE word <> ''
    ),
    shg AS (
      SELECT DISTINCT a.doc_id,
             a.word || ' ' || b.word || ' ' || c.word AS shingle
      FROM ws a
      JOIN ws b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN ws c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    base AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS b
             FROM shg),
    sig AS (SELECT doc_id, [{mins}] AS s FROM base GROUP BY doc_id)"""


# ∃ band k ∈ 0..7: the 4-element slices agree (1-based inclusive)
_BAND_COLLIDE = " OR ".join(
    f"a.s[{4 * k + 1}:{4 * k + 4}] = b.s[{4 * k + 1}:{4 * k + 4}]"
    for k in range(8))

_EST_JACCARD = ("len(list_filter(range(1, 33), "
                "i -> list_extract(a.s, i) = list_extract(b.s, i))) / 32.0")


@register(
    "dedup_incremental_minhash",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz1 zz2 zz3'
      FROM documents WHERE doc_id % 5 = 0
    ),
    {_md5_minhash_sig_cte("all_docs")}
    SELECT batch_id, corpus_id, est_jaccard FROM (
      SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id,
             round({_EST_JACCARD}, 6) AS est_jaccard
      FROM sig a JOIN sig b
        ON a.doc_id >= 1000000 AND b.doc_id < 1000000
       AND ({_BAND_COLLIDE}))
    WHERE est_jaccard >= 0.5
    """,
    doc="incremental NEAR-dup matching of a new batch against a "
        "signature-only corpus store (text never retained): batch "
        "shingled alone, one banded equi-join vs the store's bands, "
        "MinHash-estimate Jaccard on collided pairs; batch = every "
        "5th doc with a 3-word tail appended (J about 0.9); md5 hash "
        "family so the full signature pipeline is oracle-replayable",
)
def dedup_incremental_minhash(spark, sf_dir):
    from .operators.dedup import (
        minhash_match_against, minhash_signature, word_shingles)

    docs = load_table(spark, sf_dir, "documents")
    # the store is read by BOTH the banding and the estimate branches;
    # in production it is a premade parquet (cheap re-scan), here it
    # would be the 32-hash signature map recomputed twice — build once
    from .operators.util import ensure_fanout

    store = (minhash_signature(word_shingles(ensure_fanout(docs)),
                               hash_family="md5")
             .select("doc_id", "signature")
             .localCheckpoint(eager=True))
    # near-dup derivation: append a 3-word tail — shingles are
    # case-SENSITIVE (unlike the exact rung's normalized fingerprints),
    # so a case mangle would zero the overlap; a suffix keeps
    # J = S/(S+3) ≈ 0.9 for the ~50-word docs
    batch = (docs.where(F.col("doc_id") % 5 == 0)
             .select((F.col("doc_id") + 1000000).alias("doc_id"),
                     F.concat("text", F.lit(" zz1 zz2 zz3")).alias("text")))
    return minhash_match_against(batch, store, threshold=0.5,
                                 hash_family="md5")


# --- banded LSH self-join, oracle face (E76) ---------------------------------
@register(
    "dedup_minhash_banded",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz1 zz2 zz3'
      FROM documents WHERE doc_id % 5 = 0
    ),
    {_md5_minhash_sig_cte("all_docs")}
    SELECT id_a, id_b, est_jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round({_EST_JACCARD}, 6) AS est_jaccard
      FROM sig a JOIN sig b
        ON a.doc_id < b.doc_id AND ({_BAND_COLLIDE}))
    WHERE est_jaccard >= 0.5
    """,
    doc="banded-LSH SELF-join near-dup face of dedup_minhash_lsh with "
        "the md5 hash family: same lsh_candidate_pairs plan (band-hash "
        "equi-join, never all-pairs), signature-estimate Jaccard "
        "instead of the re-shingle verify, fully oracle-replayable; "
        "input salted with 3-word-suffix copies so every planted pair "
        "must surface",
)
def dedup_minhash_banded(spark, sf_dir):
    from .operators.dedup import (
        lsh_candidate_pairs, minhash_signature, word_shingles)
    from .operators.util import ensure_fanout

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (docs.where(F.col("doc_id") % 5 == 0)
              .select((F.col("doc_id") + 1000000).alias("doc_id"),
                      F.concat("text", F.lit(" zz1 zz2 zz3")).alias("text")))
    # signature map read by banding AND both sides of the estimate
    # join — materialize once (the dedup_minhash_lsh persist strategy)
    signed = (minhash_signature(
                  word_shingles(ensure_fanout(docs.unionAll(copies))),
                  hash_family="md5")
              .where(F.size("shingles") > 0)
              .select("doc_id", "signature")
              .localCheckpoint(eager=True))
    pairs = lsh_candidate_pairs(signed, bands=8)
    sa = signed.select(F.col("doc_id").alias("id_a"),
                       F.col("signature").alias("_sig_a"))
    sb = signed.select(F.col("doc_id").alias("id_b"),
                       F.col("signature").alias("_sig_b"))
    agree = F.size(F.filter(
        F.zip_with("_sig_a", "_sig_b", lambda x, y: x == y),
        lambda m: m))
    return (pairs.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    F.round(agree / F.size("_sig_a"), 6)
                    .alias("est_jaccard"))
            .where(F.col("est_jaccard") >= 0.5))


# --- cross-document paragraph dedup (E75) ------------------------------------
# CCNet-style: each distinct line survives only in its first
# (doc_id, position) owner corpus-wide. Runs over the synthetic
# multi-line corpus (the C4 derivation), where 'Ok.' and the closing
# line are shared by construction across most documents.
@register(
    "corpus_dedup_paragraphs",
    f"""
    WITH {_SYNTH_LINES_CTE},
    d AS (
      SELECT doc_id,
             la || chr(10) || lb || chr(10) || lc || chr(10) || ld
                || chr(10) || le AS text
      FROM synth
    ),
    l AS (
      SELECT doc_id, pos, line FROM (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos
        FROM d)
    ),
    r AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, pos) AS rn
      FROM l
    ),
    k AS (SELECT * FROM r WHERE line = '' OR rn = 1)
    SELECT d.doc_id,
           5::BIGINT AS n_lines,
           CAST(coalesce(c.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(c.clean_text, '') AS clean_text
    FROM d LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text
      FROM k GROUP BY doc_id) c USING (doc_id)
    """,
    doc="CCNet cross-document paragraph dedup: every distinct line "
        "survives only in its first (doc, position) owner corpus-wide "
        "(empty lines structural, always kept); one line-keyed owner "
        "election, one join back, one doc-keyed ordered reassembly",
)
def corpus_dedup_paragraphs(spark, sf_dir):
    from .operators.cleaning import dedup_paragraphs_global

    s = _synth_lines(spark, sf_dir)
    docs = s.select(
        "doc_id",
        F.concat_ws("\n", "la", "lb", "lc", "ld", "le").alias("text"))
    return dedup_paragraphs_global(docs)


# --- span-level benchmark decontamination (E77) ------------------------------
@register(
    "doc_decontaminate_spans",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS words
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i AS start,
             array_to_string(words[i:i+7], ' ') AS gram
      FROM (SELECT doc_id, words,
                   unnest(range(1, len(words) - 8 + 2)) AS i
            FROM base WHERE len(words) >= 8)
    ),
    bg AS (SELECT DISTINCT gram FROM pos WHERE doc_id % 37 = 0),
    fl AS (
      SELECT doc_id, list_sort(list(DISTINCT start)) AS starts
      FROM pos JOIN bg USING (gram) GROUP BY doc_id
    ),
    cleaned AS (
      SELECT b.doc_id, b.words,
             CASE WHEN f.starts IS NULL THEN b.words
             ELSE list_filter(b.words, (w, i) ->
                    len(list_filter(f.starts,
                                    s -> s <= i AND i <= s + 7)) = 0)
             END AS kept
      FROM base b LEFT JOIN fl f USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_tokens,
           CAST(len(words) - len(kept) AS BIGINT) AS n_removed,
           coalesce(array_to_string(kept, ' '), '') AS clean_text
    FROM cleaned
    """,
    doc="span-level benchmark decontamination (GPT-3 appendix-C n-gram "
        "collision removal): strip every token covered by a word "
        "8-gram appearing in the benchmark corpus (here: every 37th "
        "doc), keeping the rest of the document; benchmark gram set "
        "broadcast, corpus never shuffles",
)
def doc_decontaminate_spans(spark, sf_dir):
    from .operators.textstats import decontaminate_spans

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 37 == 0).select("text")
    return decontaminate_spans(docs, bench)


# --- URL-normalization dedup (E78) -------------------------------------------
# The testdata has no url column, so the face synthesizes a
# deterministic provenance URL per doc (scheme/case/www/query/trailing
# variants by doc_id residue) that normalization must collapse --
# every group's membership is provable, the dedup_exact_groups salting
# pattern applied to provenance.
_URL_SYNTH_SPARK = (
    "concat('HTTPS://WWW.', coalesce(source, 'none'), '.Example.com/p', "
    "cast(doc_id % 40 as string), "
    "case when doc_id % 3 = 0 then '?utm_source=feed' "
    "when doc_id % 3 = 1 then '/' else '' end)")
_URL_SYNTH_DUCK = (
    "'HTTPS://WWW.' || coalesce(source, 'none') || '.Example.com/p' || "
    "CAST(doc_id % 40 AS VARCHAR) || "
    "CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed' "
    "WHEN doc_id % 3 = 1 THEN '/' ELSE '' END")


@register(
    "dedup_url_normalized",
    f"""
    WITH u AS (SELECT doc_id, {_URL_SYNTH_DUCK} AS url FROM documents),
    n AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url), '^https?://', ''), '^www\\.', ''),
               '[?#].*$', ''), '/+$', '') AS norm_url
      FROM u
    )
    SELECT norm_url, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM n GROUP BY norm_url HAVING count(*) > 1
    """,
    doc="provenance (URL) dedup groups: normalize scheme/case/www/"
        "query/trailing-slash variants, hash-groupBy on the normalized "
        "URL, keep-first survivor -- the RefinedWeb first-stage dedup "
        "that runs before any content hashing",
)
def dedup_url_normalized(spark, sf_dir):
    from .operators.cleaning import url_duplicate_groups

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", F.expr(_URL_SYNTH_SPARK).alias("url")))
    return url_duplicate_groups(docs)


# --- CCNet per-language LM-quality buckets (E79) -----------------------------
@register(
    "doc_lm_quality_buckets",
    """
    WITH vocab AS (
      SELECT word, count(*) AS n_occ
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    tot AS (SELECT sum(n_occ)::DOUBLE AS total,
                   count(*)::DOUBLE AS n_vocab FROM vocab),
    tok AS (
      SELECT doc_id, word, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY doc_id, word
    ),
    scored AS (
      SELECT t.doc_id, t.c,
             -ln((v.n_occ + 1.0) / (tot.total + tot.n_vocab)) AS neg_lp
      FROM tok t JOIN vocab v USING (word), tot
    ),
    per_doc AS (
      SELECT d.doc_id, d.lang,
             coalesce(s.score, 0.0) AS avg_neg_logprob
      FROM documents d
      LEFT JOIN (SELECT doc_id,
                        round(sum(c * neg_lp) / sum(c), 6) AS score
                 FROM scored GROUP BY doc_id) s USING (doc_id)
    ),
    r AS (
      SELECT doc_id, lang, avg_neg_logprob,
             row_number() OVER (PARTITION BY lang
                                ORDER BY avg_neg_logprob, doc_id)
               AS lang_rank,
             count(*) OVER (PARTITION BY lang) AS ln
      FROM per_doc
    )
    SELECT doc_id, lang, avg_neg_logprob,
           CAST(lang_rank AS BIGINT) AS lang_rank,
           CASE WHEN lang_rank * 100 <= 30 * ln THEN 'head'
                WHEN lang_rank * 100 <= 70 * ln THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM r
    """,
    doc="CCNet-style per-language LM-quality buckets: rank within each "
        "language by the unigram-LM perplexity proxy, cut head/middle/"
        "tail at 30/70 percent by INTEGER rank arithmetic; scalable "
        "via the range-partitioned global rank, never one reducer per "
        "language",
)
def doc_lm_quality_buckets(spark, sf_dir):
    from .operators.selection import lm_quality_buckets

    return lm_quality_buckets(load_table(spark, sf_dir, "documents"))


# --- asymmetric containment near-dup (E80) -----------------------------------
# Salted with TRUNCATED copies (first half of the words of every 7th
# doc): a truncated mirror has Jaccard about 0.5 against its source but
# directed containment exactly 1.0 -- the case Jaccard-based dedup
# misses by construction, provably planted.
@register(
    "dedup_containment_pairs",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             coalesce(array_to_string(
               words[1:CAST(floor(len(words) / 2) AS INT)], ' '), '')
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> w <> '')
                     AS words
            FROM documents)
      WHERE doc_id % 7 = 0
    ),
    w AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS i
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
                   generate_subscripts(string_split(text, ' '), 1) AS i
            FROM all_docs)
      WHERE word <> ''
    ),
    sh AS (
      SELECT DISTINCT a.doc_id,
             a.word || ' ' || b.word || ' ' || c.word AS shingle
      FROM w a
      JOIN w b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      JOIN w c ON c.doc_id = a.doc_id AND c.i = a.i + 2
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    keep AS (SELECT shingle FROM sh GROUP BY shingle
             HAVING count(*) <= 100),
    shf AS (SELECT s.doc_id, s.shingle FROM sh s JOIN keep USING (shingle)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM shf a JOIN shf b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_common, containment_a, containment_b FROM (
      SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
             round(n_common * 1.0 / sa.sz, 6) AS containment_a,
             round(n_common * 1.0 / sb.sz, 6) AS containment_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b)
    WHERE containment_a >= 0.9 OR containment_b >= 0.9
    """,
    doc="asymmetric (containment) near-dup pairs, Broder 1997: "
        "directed |A-int-B|/|A| >= 0.9 either way over distinct word "
        "3-gram shingles -- catches subset/quoted/truncated duplication "
        "that Jaccard misses; inverted-index pairing with a max_df=100 "
        "stop-shingle guard, denominators from the UNFILTERED shingle "
        "sets; input salted with half-truncated copies (containment "
        "exactly 1.0 by construction)",
)
def dedup_containment_pairs(spark, sf_dir):
    from .operators.dedup import shingle_containment_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    trunc = (docs.where(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 2000000).alias("doc_id"),
                     F.concat_ws(" ", F.slice(
                         words, F.lit(1),
                         F.floor(F.size(words) / 2).cast("int")))
                     .alias("text")))
    return shingle_containment_pairs(docs.unionAll(trunc),
                                     threshold=0.9, max_df=100)


# --- Z-order layout key (E81) ------------------------------------------------
def _zorder_oracle_sql() -> str:
    from .operators.layout import z_value_sql

    z = z_value_sql("user_id % 4096", "event_id % 4096", bits=12)
    return f"""
    SELECT event_id,
           CAST(user_id % 4096 AS BIGINT) AS cx,
           CAST(event_id % 4096 AS BIGINT) AS cy,
           {z} AS zval
    FROM events
    """


@register(
    "events_zorder_key",
    _zorder_oracle_sql(),
    doc="Z-order (Morton) layout key: interleave the bits of two "
        "grid coordinates so one range-partitioned sort gives parquet "
        "files tight min/max stats on BOTH dimensions (the Delta "
        "OPTIMIZE ZORDER BY kernel); pure 64-bit mask-shift "
        "arithmetic, generated from the same spread schedule in both "
        "engines",
)
def events_zorder_key(spark, sf_dir):
    from .operators.layout import z_value

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("user_id") % 4096).cast("long").alias("cx"),
        (F.col("event_id") % 4096).cast("long").alias("cy"),
        z_value(F.col("user_id") % 4096, F.col("event_id") % 4096,
                bits=12).alias("zval"))


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


# --- leakage-safe (component-keyed) split (E83) ------------------------------
@register(
    "corpus_leakage_safe_split",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ix
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    prs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ix * 1.0 / (sa.sz + sb.sz - ix) >= 0.7
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM prs
      UNION SELECT id_b, id_a FROM prs
    ),
    reach(node, lbl) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
    ),
    comp AS (SELECT node AS doc_id, min(lbl) AS component
             FROM reach GROUP BY node)
    SELECT d.doc_id, c.component,
           substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)),
                  1, 4) AS bucket,
           CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id)
                                     AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
                WHEN substr(md5(CAST(coalesce(c.component, d.doc_id)
                                     AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN comp c USING (doc_id)
    """,
    doc="leakage-safe train/val/test split: the md5 bucket is keyed on "
        "the near-dup COMPONENT label (singletons on their own id), so "
        "no near-duplicate pair can straddle train/eval -- the "
        "benchmark-inflation leak Lee et al. 2022 measure on C4; vs "
        "the recursive-CTE components oracle",
)
def corpus_leakage_safe_split(spark, sf_dir):
    from .operators.components import connected_components
    from .operators.splits import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(exact_jaccard_pairs(docs, 0.7))
    return leakage_safe_split(docs.select("doc_id"), comp) \
        .select("doc_id", "component", "bucket", "split")


# --- streaming incremental MinHash ingestion (E84) ---------------------------
# The near-dup sibling of streaming_ingest_dedup: per-epoch banded
# matching against the signature store (epochs strictly before), plus
# keep-first matching within the batch. Salted so all three statuses
# are non-vacuous: every 5th doc re-appears later with a 3-word tail
# (near_dup_corpus), and every 5th-plus-1 doc contributes a pair of
# identical WORD-REVERSED twins (no shingles shared with the original,
# so the pair's only match is each other -> the larger id is
# near_dup_batch when they land in the same epoch; epoch-boundary
# splits make it near_dup_corpus, and the oracle states the same
# condition, so there is nothing partitioning-dependent).
@register(
    "streaming_ingest_minhash",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz1 zz2 zz3'
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT 5000000 + 2 * doc_id + tw.k,
             array_to_string(list_reverse(
               list_filter(string_split(text, ' '), w -> w <> '')), ' ')
      FROM documents, (SELECT unnest([0, 1]) AS k) tw
      WHERE doc_id % 5 = 1
    ),
    seqd AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY doc_id) - 1 AS seq,
             (SELECT (count(*) + 9) // 10 FROM all_docs) AS chunk
      FROM all_docs
    ),
    {_md5_minhash_sig_cte("all_docs")},
    se AS (
      SELECT s.doc_id, s.s, (q.seq // q.chunk)::INT AS epoch
      FROM sig s JOIN seqd q USING (doc_id)
    ),
    m AS (
      SELECT a.doc_id,
             max(CASE WHEN b.epoch < a.epoch THEN 1 ELSE 0 END) AS mc,
             max(CASE WHEN b.epoch = a.epoch AND b.doc_id < a.doc_id
                      THEN 1 ELSE 0 END) AS mb
      FROM se a JOIN se b
        ON ({_BAND_COLLIDE})
       AND round({_EST_JACCARD}, 6) >= 0.5
       AND (b.epoch < a.epoch
            OR (b.epoch = a.epoch AND b.doc_id < a.doc_id))
      GROUP BY a.doc_id
    )
    SELECT q.doc_id,
           CASE WHEN m.mc = 1 THEN 'near_dup_corpus'
                WHEN m.mb = 1 THEN 'near_dup_batch'
                ELSE 'novel' END AS status,
           (q.seq // q.chunk)::INT AS epoch
    FROM seqd q LEFT JOIN m USING (doc_id)
    """,
    doc="continuous-ingestion NEAR-dup detection over real "
        "micro-batches: per-epoch banded MinHash matching against the "
        "accumulated signature store (text never retained) plus "
        "keep-first in-batch matching, idempotent epoch-keyed appends; "
        "md5 hash family makes the whole replay oracle-recomputable",
)
def streaming_ingest_minhash(spark, sf_dir):
    import shutil
    import tempfile

    from pyspark.sql import Window

    from .streaming.ingest_minhash import StreamingIngestMinhash
    from .streaming.replay import replay_shuffle_cap, write_microbatches

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tailed = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat("text", F.lit(" zz1 zz2 zz3")).alias("text"))
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    rev = docs.where(F.col("doc_id") % 5 == 1).select(
        "doc_id", F.array_join(F.reverse(words), " ").alias("text"))
    twins = rev.select(
        (5000000 + 2 * F.col("doc_id")).alias("doc_id"), "text").unionAll(
        rev.select((5000000 + 2 * F.col("doc_id") + 1).alias("doc_id"),
                   "text"))
    all_docs = docs.unionAll(tailed).unionAll(twins)
    seqd = all_docs.withColumn(
        "seq", F.row_number().over(Window.orderBy("doc_id")) - 1)
    d = tempfile.mkdtemp(prefix="minhash_stream_")
    store = tempfile.mkdtemp(prefix="minhash_store_")
    try:
        glob = write_microbatches(seqd, d, n_buckets=10)
        stream = (spark.readStream
                  .schema("doc_id long, text string, seq long")
                  .option("maxFilesPerTrigger", 1).parquet(glob))
        pipe = StreamingIngestMinhash(spark, store, threshold=0.5)
        with replay_shuffle_cap(spark):
            q = (stream.writeStream.foreachBatch(pipe)
                 .trigger(availableNow=True).start())
            assert q.awaitTermination(240), \
                "ingest-minhash stream timed out"
        return (pipe.statuses()
                .select("doc_id", "status",
                        F.col("epoch").cast("int").alias("epoch"))
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)


# --- deterministic contrastive negatives (E85) -------------------------------
@register(
    "doc_contrastive_negatives",
    """
    WITH r AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS idx
               FROM documents),
    cnt AS (SELECT count(*) AS n FROM documents),
    e AS (SELECT r.doc_id, r.idx, cnt.n, j.neg_rank
          FROM r, cnt, (SELECT unnest(range(1, 5)) AS neg_rank) j),
    t AS (SELECT doc_id, neg_rank, n, idx,
                 ('0x' || substr(md5(doc_id || ':' || neg_rank), 1, 8))
                   ::BIGINT % n AS h
          FROM e),
    tt AS (SELECT doc_id, neg_rank,
                  CASE WHEN h + 1 = idx THEN ((h + 1) % n) + 1
                       ELSE h + 1 END AS tidx
           FROM t)
    SELECT tt.doc_id, CAST(tt.neg_rank AS INT) AS neg_rank,
           r2.doc_id AS neg_id
    FROM tt JOIN r r2 ON r2.idx = tt.tidx
    """,
    doc="deterministic contrastive negative sampling: 4 seed-free "
        "pseudo-random negatives per anchor via md5(anchor:j) mod n "
        "over a dense range-partitioned global index, skip-self bump; "
        "uniform with replacement, engine/partitioning-stable",
)
def doc_contrastive_negatives(spark, sf_dir):
    from .operators.selection import contrastive_negatives

    docs = load_table(spark, sf_dir, "documents")
    return contrastive_negatives(docs, k=4)


# --- payment-card PII scan with Luhn validation (E86) ------------------------
def _payment_pii_oracle_sql() -> str:
    from .operators.textstats import luhn_valid_sql

    luhn = luhn_valid_sql("x", "duckdb")
    return f"""
    WITH salted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
                          THEN ' card 4532015112830366 end'
                          WHEN doc_id % 3 = 1
                          THEN ' card 4532015112830367 end'
                          ELSE '' END AS text
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             regexp_extract_all(text, '[0-9]{{13,19}}') AS cands
      FROM salted
    )
    SELECT doc_id,
           CAST(len(cands) AS BIGINT) AS n_card_candidates,
           CAST(len(list_filter(cands, x -> {luhn})) AS BIGINT)
             AS n_luhn_valid,
           len(list_filter(cands, x -> {luhn})) > 0 AS has_payment_pii
    FROM c
    """


@register(
    "doc_payment_pii_scan",
    _payment_pii_oracle_sql(),
    doc="payment-card PII scan with Luhn validation: 13-19-digit runs "
        "as candidates, arithmetic checksum fold separating probable "
        "card numbers from order ids/EANs; input salted with one "
        "valid and one invalid card per doc_id residue so both "
        "branches of the checksum are provably exercised",
)
def doc_payment_pii_scan(spark, sf_dir):
    from .operators.textstats import payment_pii_scan

    docs = load_table(spark, sf_dir, "documents")
    salt = (F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" card 4532015112830366 end"))
            .when(F.col("doc_id") % 3 == 1,
                  F.lit(" card 4532015112830367 end"))
            .otherwise(F.lit("")))
    salted = docs.select("doc_id",
                         F.concat("text", salt).alias("text"))
    return payment_pii_scan(salted)


# --- sentence-boundary greedy chunking (E87) ---------------------------------
@register(
    "doc_sentence_chunks",
    """
    WITH RECURSIVE sr AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS si,
             s,
             len(list_filter(string_split(s, ' '), w -> w <> '')) AS nt
      FROM (SELECT doc_id, trim(unnest(string_split(text, '.')), ' ') AS s,
                   generate_subscripts(string_split(text, '.'), 1) AS i
            FROM documents)
      WHERE s <> ''
    ),
    rec(doc_id, si, len, cid) AS (
      SELECT doc_id, si, nt, 0 FROM sr WHERE si = 1
      UNION ALL
      SELECT s.doc_id, s.si,
             CASE WHEN r.len > 0 AND r.len + s.nt > 40
                  THEN s.nt ELSE r.len + s.nt END,
             CASE WHEN r.len > 0 AND r.len + s.nt > 40
                  THEN r.cid + 1 ELSE r.cid END
      FROM rec r JOIN sr s ON s.doc_id = r.doc_id AND s.si = r.si + 1
    )
    SELECT sr.doc_id, CAST(rec.cid AS INT) AS chunk_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(sr.nt) AS BIGINT) AS n_chunk_tokens,
           string_agg(sr.s, ' ' ORDER BY sr.si) AS chunk_text
    FROM sr JOIN rec ON rec.doc_id = sr.doc_id AND rec.si = sr.si
    GROUP BY sr.doc_id, rec.cid
    """,
    doc="sentence-boundary greedy chunking (the RAG discipline: never "
        "split mid-sentence): pack consecutive sentences into <= 40 "
        "token chunks via a per-doc JVM aggregate fold, vs the same "
        "fold as a linear recursive CTE",
)
def doc_sentence_chunks(spark, sf_dir):
    from .operators.textstats import sentence_pack_chunks

    return sentence_pack_chunks(load_table(spark, sf_dir, "documents"),
                                max_tokens=40)


# --- key-skew diagnosis report (E88) -----------------------------------------
def _skew_oracle_one(col: str) -> str:
    return f"""
    SELECT '{col}' AS key_col, key_value, cnt,
           CAST(rank AS INT) AS rank, n_distinct,
           round(mx * n_distinct * 1.0 / total, 6) AS skew_factor
    FROM (SELECT key_value, cnt,
                 row_number() OVER (ORDER BY cnt DESC, key_value) AS rank
          FROM (SELECT CAST({col} AS VARCHAR) AS key_value,
                       count(*) AS cnt
                FROM events GROUP BY 1)
          QUALIFY rank <= 10),
         (SELECT count(*) AS n_distinct, sum(cnt) AS total,
                 max(cnt) AS mx
          FROM (SELECT count(*) AS cnt FROM events
                GROUP BY CAST({col} AS VARCHAR)))
    """


@register(
    "events_skew_report",
    _skew_oracle_one("user_id") + " UNION ALL "
    + _skew_oracle_one("event_type"),
    doc="key-skew diagnosis: per candidate shuffle key, the top-10 "
        "heaviest values and the max-over-uniform skew factor -- the "
        "measurement that decides between plain joins, salting and "
        "AQE skew handling; map-side-combined counts, "
        "TakeOrderedAndProject top-N, 1-row summary broadcast",
)
def events_skew_report(spark, sf_dir):
    from .operators.skew import skew_report

    ev = load_table(spark, sf_dir, "events")
    return skew_report(ev, ["user_id", "event_type"], top_n=10)


# --- PMI collocations (E89) --------------------------------------------------
@register(
    "corpus_pmi_collocations",
    """
    WITH w AS (
      SELECT word, i, doc_id,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) AS wi
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word,
                   generate_subscripts(string_split(lower(text), ' '), 1)
                     AS i
            FROM documents)
      WHERE word <> ''
    ),
    uni AS (SELECT word, count(*) AS c FROM w GROUP BY word),
    tot AS (SELECT sum(c)::DOUBLE AS t FROM uni),
    bi AS (
      SELECT a.word AS w1, b.word AS w2, count(*) AS pair_count
      FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.wi = a.wi + 1
      GROUP BY 1, 2
    ),
    ptot AS (SELECT sum(pair_count)::DOUBLE AS p FROM bi),
    scored AS (
      SELECT bi.w1, bi.w2, bi.pair_count,
             round(ln((bi.pair_count / ptot.p)
                      / ((u1.c / tot.t) * (u2.c / tot.t))), 6) AS pmi
      FROM bi
      JOIN uni u1 ON u1.word = bi.w1
      JOIN uni u2 ON u2.word = bi.w2, tot, ptot
      WHERE bi.pair_count >= 5
    )
    SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count, pmi,
           CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT)
             AS rank
    FROM scored
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
    doc="top-20 PMI collocations with a min-count-5 support floor "
        "(multi-word vocabulary / phrase-merge mining): one bigram "
        "aggregate + vocab-scale unigram broadcast, ranked on the "
        "6-dp-rounded score with word tiebreaks",
)
def corpus_pmi_collocations(spark, sf_dir):
    from .operators.textstats import pmi_collocations

    return pmi_collocations(load_table(spark, sf_dir, "documents"),
                            min_count=5, k=20)


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


# --- JSONL ingestion with corrupt-record tolerance (E91) ---------------------
# The JSON line is CONSTRUCTED by identical string concatenation in
# both engines (codes-only fields, no escaping surface) rather than
# each engine's to_json serializer, whose spacing/ordering differ;
# every 13th line is truncated to a malformed prefix so the PERMISSIVE
# path is provably exercised.
@register(
    "doc_jsonl_ingest",
    """
    WITH lines AS (
      SELECT doc_id AS orig_id,
             CASE WHEN doc_id % 13 = 0
                  THEN substr(j, 1, 15)
                  ELSE j END AS line
      FROM (SELECT doc_id,
                   '{"doc_id": ' || doc_id || ', "lang": "' || lang
                     || '", "n": ' || n_chars || '}' AS j
            FROM documents)
    )
    SELECT orig_id,
           CASE WHEN json_valid(line)
                     AND json_extract(line, '$.doc_id') IS NOT NULL
                THEN true ELSE false END AS parse_ok,
           CASE WHEN json_valid(line)
                THEN CAST(line ->> 'doc_id' AS BIGINT) END AS parsed_doc_id,
           CASE WHEN json_valid(line)
                THEN line ->> 'lang' END AS parsed_lang,
           CASE WHEN json_valid(line)
                THEN CAST(line ->> 'n' AS BIGINT) END AS parsed_n
    FROM lines
    """,
    doc="schema-on-read JSONL ingestion with PERMISSIVE corrupt-record "
        "tolerance: malformed lines (every 13th, truncated) parse to "
        "nulls with an explicit ok flag instead of failing the batch; "
        "from_json narrow map, no shuffle",
)
def doc_jsonl_ingest(spark, sf_dir):
    from .sources.jsonl import parse_json_lines

    docs = load_table(spark, sf_dir, "documents")
    j = F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string"),
                 F.lit(', "lang": "'), F.col("lang"),
                 F.lit('", "n": '), F.col("n_chars").cast("string"),
                 F.lit("}"))
    lines = docs.select(
        F.col("doc_id").alias("orig_id"),
        F.when(F.col("doc_id") % 13 == 0, F.substring(j, 1, 15))
        .otherwise(j).alias("line"))
    parsed = parse_json_lines(lines, "line",
                              "doc_id BIGINT, lang STRING, n BIGINT",
                              ok_probe="doc_id")
    return parsed.select(
        "orig_id", F.col("parse_ok"),
        F.col("rec.doc_id").alias("parsed_doc_id"),
        F.col("rec.lang").alias("parsed_lang"),
        F.col("rec.n").alias("parsed_n"))


# --- PERMISSIVE CSV-line ingestion (r8) --------------------------------------
# The CSV sibling of doc_jsonl_ingest: payload built by identical
# string concat in both engines, every 13th line truncated; the ok
# probe is the LAST field (truncation kills it first). The oracle
# emulates from_csv's PERMISSIVE semantics with string_split +
# try_cast — missing trailing fields and uncastable values read as
# nulls, never errors.
@register(
    "doc_csv_ingest",
    """
    WITH lines AS (
      SELECT doc_id AS orig_id,
             CASE WHEN doc_id % 13 = 0 THEN substr(c, 1, 7)
                  ELSE c END AS line
      FROM (SELECT doc_id,
                   doc_id || ',' || lang || ',' || n_chars AS c
            FROM documents)
    ),
    p AS (SELECT orig_id, line, string_split(line, ',') AS parts
          FROM lines)
    SELECT orig_id,
           CASE WHEN len(parts) >= 3
                     AND try_cast(parts[3] AS BIGINT) IS NOT NULL
                THEN true ELSE false END AS parse_ok,
           try_cast(parts[1] AS BIGINT) AS parsed_doc_id,
           CASE WHEN len(parts) >= 2 THEN parts[2] END AS parsed_lang,
           CASE WHEN len(parts) >= 3
                THEN try_cast(parts[3] AS BIGINT) END AS parsed_n
    FROM p
    """,
    doc="schema-on-read CSV-line ingestion with PERMISSIVE "
        "corrupt-record tolerance (from_csv narrow map): truncated "
        "lines parse to null trailing fields with an explicit ok "
        "flag; the envelope-payload case the file-level CSV reader "
        "doesn't cover",
)
def doc_csv_ingest(spark, sf_dir):
    from .sources.jsonl import parse_csv_lines

    docs = load_table(spark, sf_dir, "documents")
    c = F.concat(F.col("doc_id").cast("string"), F.lit(","),
                 F.col("lang"), F.lit(","),
                 F.col("n_chars").cast("string"))
    lines = docs.select(
        F.col("doc_id").alias("orig_id"),
        F.when(F.col("doc_id") % 13 == 0, F.substring(c, 1, 7))
        .otherwise(c).alias("line"))
    parsed = parse_csv_lines(lines, "line",
                             "doc_id BIGINT, lang STRING, n BIGINT",
                             ok_probe="n")
    return parsed.select(
        "orig_id", "parse_ok",
        F.col("rec.doc_id").alias("parsed_doc_id"),
        F.col("rec.lang").alias("parsed_lang"),
        F.col("rec.n").alias("parsed_n"))


# --- Gopher quality rules (E92) ----------------------------------------------
# The corpus text is single-line prose with no bullets/ellipses/
# symbols, so the face synthesizes a deterministic page per doc_id
# residue (bullet blocks, read-more ellipsis lines, hash runs, digit
# words) -- every rule provably fires in BOTH directions; same
# synthesize-the-adversary pattern as the URL and JSONL faces.
@register(
    "doc_gopher_rules",
    """
    WITH page AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- item one'
                  || chr(10) || '- click here' || chr(10) || '- menu'
                  ELSE '' END
             || CASE WHEN doc_id % 8 = 0 THEN chr(10) || '- a'
                  || chr(10) || '- b' || chr(10) || '- c'
                  || chr(10) || '- d' || chr(10) || '- e'
                  || chr(10) || '- f' || chr(10) || '- g'
                  || chr(10) || '- h' || chr(10) || '- i'
                  || chr(10) || '- j' ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'read more...'
                  || chr(10) || 'see more...' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                  THEN ' # # # # # # # #' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                  THEN ' 1234 5678 9012 3456 7890 2468' ELSE '' END
               AS text
      FROM documents
    ),
    arr AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         w -> w <> '') AS ws,
             string_split(text, chr(10)) AS ls,
             length(text) - length(replace(text, '#', '')) AS hash_n,
             CAST((length(text) - length(replace(text, '...', ''))) / 3
                  AS BIGINT) AS ellipsis_n
      FROM page
    ),
    m AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CASE WHEN len(ws) > 0 THEN round(
               list_sum(list_transform(ws, w -> length(w)))::DOUBLE
                 / len(ws), 6) END AS mean_word_len,
             CASE WHEN len(ws) > 0 THEN round(
               (hash_n + ellipsis_n)::DOUBLE / len(ws), 6) END
               AS symbol_ratio,
             round(len(list_filter(ls,
               l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))::DOUBLE
               / len(ls), 6) AS bullet_line_ratio,
             round(len(list_filter(ls,
               l -> rtrim(l) LIKE '%...'))::DOUBLE / len(ls), 6)
               AS ellipsis_line_ratio,
             CASE WHEN len(ws) > 0 THEN round(
               len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                 ::DOUBLE / len(ws), 6) END AS alpha_word_ratio,
             CAST(len(list_intersect(list_transform(ws, w -> lower(w)),
               ['the','a','and','of','to','be','have','with']))
               AS BIGINT) AS stop_hits
      FROM arr
    )
    SELECT *,
           coalesce(n_words BETWEEN 10 AND 80
                    AND mean_word_len BETWEEN 3 AND 10
                    AND symbol_ratio <= 0.1
                    AND bullet_line_ratio <= 0.9
                    AND ellipsis_line_ratio <= 0.3
                    AND alpha_word_ratio >= 0.8
                    AND stop_hits >= 2, false) AS keep
    FROM m
    """,
    doc="Gopher quality-rule battery (Rae et al. 2021 App. A): word "
        "count / mean word length / symbol ratio / bullet and "
        "ellipsis line ratios / alpha-word ratio / stop-word probe, "
        "plus the combined keep gate; pure JVM fold battery, zero "
        "shuffles, scan-speed first-pass corpus gate",
)
def doc_gopher_rules(spark, sf_dir):
    from .operators.cleaning import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit("\n- item one\n- click here\n- menu"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 8 == 0,
               F.lit("\n- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i"
                     "\n- j")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit("\nread more...\nsee more...")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.lit(" # # # # # # # #")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.lit(" 1234 5678 9012 3456 7890 2468"))
        .otherwise(F.lit("")),
    )
    # the synthetic corpus vocabulary carries only 'the'/'a' from the
    # canonical probe list, so the face swaps in a list the corpus can
    # actually hit twice -- the keep gate must fire both ways
    return gopher_rules(
        docs.select("doc_id", page.alias("text")),
        min_words=10, max_words=80,
        stopwords=("the", "a", "and", "of", "to", "be", "have", "with"))


# --- deterministic weighted sampling (E93) -----------------------------------
# Priority sampling (Duffield-Lund-Thorup): the ranking key w/u is ONE
# IEEE division of identical doubles, so both engines rank bit-
# identically -- no pow/ln ulp hazard (the reason this face is NOT
# Efraimidis-Spirakis). 16^12 + 1 = 281474976710657.
@register(
    "corpus_priority_sample",
    """
    WITH wtd AS (
      SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
             CAST(n_chars AS DOUBLE) / (
               ((('0x' || substr(md5('ps' || ':' || source || ':'
                                     || CAST(doc_id AS VARCHAR)),
                   1, 12))::BIGINT + 1.0) / 281474976710657.0))
               AS priority
      FROM documents WHERE n_chars > 0
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY priority DESC, doc_id)
                  AS rank
      FROM wtd
    ),
    t AS (
      SELECT *, coalesce(max(CASE WHEN rank = 11 THEN priority END)
                           OVER (PARTITION BY source), 0.0) AS tau
      FROM r WHERE rank <= 11
    )
    SELECT source, doc_id, weight, CAST(rank AS BIGINT) AS rank,
           round(priority, 6) AS priority, round(tau, 6) AS tau,
           round(greatest(weight, tau), 6) AS est_weight
    FROM t WHERE rank <= 10
    """,
    doc="deterministic weighted per-source sampling via priority "
        "sampling (w/u with a reproducible md5 uniform, top-k per "
        "stratum through the two-stage grouped funnel) plus the "
        "Horvitz-Thompson est_weight = max(w, tau) estimator; "
        "length-weighted eval carving that any engine reproduces "
        "bit-identically",
)
def corpus_priority_sample(spark, sf_dir):
    from .operators.selection import priority_sample

    return priority_sample(load_table(spark, sf_dir, "documents"),
                           weight_col="n_chars", k=10)


# --- Zipf rank-frequency fit (E94) -------------------------------------------
@register(
    "corpus_zipf_fit",
    """
    WITH freq AS (
      SELECT source AS grp, w, count(*) AS c
      FROM (SELECT source,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents)
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY c DESC, w) AS r
      FROM freq
    )
    SELECT grp AS source,
           CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           round(regr_slope(ln(c), ln(r)), 6) AS zipf_slope,
           round(regr_intercept(ln(c), ln(r)), 6) AS zipf_intercept,
           round(regr_r2(ln(c), ln(r)), 6) AS zipf_r2
    FROM ranked GROUP BY grp
    """,
    doc="per-source Zipf-law diagnostic: OLS of ln(freq) on ln(rank) "
        "over the vocabulary-scale frequency table via the built-in "
        "regr_* aggregates; slope far from -1 or low R2 flags "
        "machine-generated / keyword-stuffed slices before mixing",
)
def corpus_zipf_fit(spark, sf_dir):
    from .operators.textstats import zipf_fit

    return zipf_fit(load_table(spark, sf_dir, "documents"))


# --- fixed-iteration PageRank (E95) ------------------------------------------
# The oracle unrolls the SAME three damped iterations as CTEs; the
# multiplication order (pr * (w/ow)) is mirrored exactly, and damping
# constants are interpolated from the same Python doubles the Spark
# plan uses, so both engines evaluate identical IEEE expressions.
def _pagerank_oracle_sql(iterations: int = 3, damping: float = 0.85) -> str:
    d, one_minus_d = repr(damping), repr(1.0 - damping)
    parts = ["""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
      FROM events
    ),
    hops AS (
      SELECT item AS src,
             lead(item) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS dst
      FROM seq
    ),
    edges AS (SELECT src, dst, count(*)::DOUBLE AS w
              FROM hops WHERE dst IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    n AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
    pr0 AS (SELECT node, 1.0 / n.n AS pr FROM nodes, n)"""]
    for i in range(1, iterations + 1):
        parts.append(f""",
    c{i} AS (SELECT e.dst AS node, sum(p.pr * (e.w / o.ow)) AS c
             FROM edges e JOIN pr{i - 1} p ON p.node = e.src
             JOIN outw o ON o.src = e.src GROUP BY 1),
    d{i} AS (SELECT coalesce(sum(p.pr), 0.0) AS dm FROM pr{i - 1} p
             LEFT JOIN outw o ON o.src = p.node WHERE o.src IS NULL),
    pr{i} AS (SELECT nodes.node,
              {one_minus_d} / n.n
                + {d} * (coalesce(c{i}.c, 0.0) + d{i}.dm / n.n) AS pr
              FROM nodes LEFT JOIN c{i} USING (node), n, d{i})""")
    parts.append(f"""
    SELECT p.node AS item, round(p.pr, 6) AS pagerank,
           coalesce(o.ow, 0.0) AS out_weight
    FROM pr{iterations} p LEFT JOIN outw o ON o.src = p.node""")
    return "".join(parts)


@register(
    "events_item_pagerank",
    _pagerank_oracle_sql(),
    doc="fixed-iteration weighted PageRank over the item-transition "
        "graph (consecutive events per user via a user-partitioned "
        "lead window): damped rank with explicit dangling-mass "
        "redistribution, three unrolled iterations of vertex-keyed "
        "join+aggregate -- the clickstream importance signal, "
        "deterministic relational algebra end to end",
)
def events_item_pagerank(spark, sf_dir):
    from .operators.graph import pagerank, transition_edges

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "ts", "event_id",
                  F.get_json_object("props", "$.k").cast("long")
                  .alias("item")))
    return (pagerank(transition_edges(ev))
            .withColumnRenamed("node", "item"))


# --- cross-source containment matrix (E96) -----------------------------------
# n = 5 (not the decontamination default 8): the synthetic corpus's
# docs are ~56 words over a small vocabulary, and cross-source
# repeated 8-grams don't exist at sf0.001 -- a vacuous 0-row face
# proves nothing, the r04 lesson.
@register(
    "corpus_source_overlap",
    """
    WITH f AS (
      SELECT source,
             list_filter(string_split(text, ' '), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT source,
             unnest(list_transform(range(0, len(ws) - 4),
                    i -> array_to_string(ws[i + 1 : i + 5], ' ')))
               AS ngram
      FROM f WHERE len(ws) >= 5
    ),
    sg AS (SELECT DISTINCT source, ngram FROM g),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams_a
              FROM sg GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sg a JOIN sg b USING (ngram)
      WHERE a.source <> b.source GROUP BY 1, 2
    )
    SELECT src_a, src_b, s.n_grams_a, n_common,
           round(n_common::DOUBLE / s.n_grams_a, 6) AS containment
    FROM inter JOIN sizes s ON s.source = inter.src_a
    """,
    doc="directed cross-source 5-gram containment matrix: how much of "
        "slice A literally occurs in slice B -- the slice-independence "
        "diagnostic before mixing; gram-keyed equi-join with fanout "
        "bounded by sources^2 per gram, never doc-pairs",
)
def corpus_source_overlap(spark, sf_dir):
    from .operators.textstats import source_overlap_matrix

    return source_overlap_matrix(
        load_table(spark, sf_dir, "documents"), n=5)


# --- unicode NFC normalization (E97) -----------------------------------------
# The corpus is pure ASCII, so the face decomposes it deterministically
# (every 'e' -> 'e' + U+0301 for doc_id % 3 = 0, a composed-accent
# suffix for % 5 = 0) -- NFC must recompose the former (changed=true)
# and fix neither the latter nor plain ASCII (changed=false).
@register(
    "doc_unicode_nfc",
    """
    WITH page AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(text, 'e', 'e' || chr(769))
                  ELSE text END
             || CASE WHEN doc_id % 5 = 0 THEN ' caf' || chr(233)
                  ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           nfc_normalize(t) AS norm_text,
           nfc_normalize(t) <> t AS changed,
           CAST(length(t) AS BIGINT) AS len_before,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS len_after
    FROM page
    """,
    doc="unicode NFC normalization before fingerprint dedup: "
        "decomposed combining sequences recompose so visually-equal "
        "strings hash equal; Arrow pandas_udf over unicodedata "
        "(no JVM SQL normalizer exists) value-checked against "
        "DuckDB's nfc_normalize",
)
def doc_unicode_nfc(spark, sf_dir):
    from .operators.cleaning import normalize_unicode

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.when(F.col("doc_id") % 3 == 0,
               F.replace(F.col("text"), F.lit("e"),
                         F.lit("e\u0301")))
        .otherwise(F.col("text")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" café"))
        .otherwise(F.lit("")))
    return normalize_unicode(docs.select("doc_id", page.alias("text")))


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


# --- daily volume anomaly scores (E99) ---------------------------------------
@register(
    "events_daily_anomaly",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, day, n,
             avg(n) OVER w AS a,
             stddev_samp(n) OVER w AS s,
             count(n) OVER w AS c
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, n,
           CASE WHEN c >= 3 THEN round(a, 6) END AS baseline_avg,
           CASE WHEN c >= 3 THEN round(s, 6) END AS baseline_std,
           round(CASE WHEN c >= 3 AND s > 0
                      THEN (n - a) / s END, 6) AS z,
           coalesce(abs(CASE WHEN c >= 3 AND s > 0
                             THEN (n - a) / s END) > 2.0, false)
             AS is_anomaly
    FROM scored
    """,
    doc="per-type daily event-volume anomaly: z-score of each day's "
        "count against the strictly-trailing 7-day ROWS baseline "
        "(never self-inclusive); ingestion failures read as z << 0, "
        "bot floods as z >> 0; the window side is days x keys rows, "
        "never event-scale",
)
def events_daily_anomaly(spark, sf_dir):
    from .operators.timeseries import daily_anomaly_scores

    # DATE → ISO string on both sides: the compare layer treats
    # Spark date objects and DuckDB datetime64 days as different
    return (daily_anomaly_scores(load_table(spark, sf_dir, "events"))
            .withColumn("day", F.col("day").cast("string")))


# --- Heaps vocabulary-growth curve (E100) ------------------------------------
@register(
    "corpus_vocab_growth",
    """
    WITH per_doc AS (
      SELECT source, doc_id,
             len(list_filter(string_split(lower(text), ' '),
                             x -> x <> '')) AS n_words
      FROM documents
    ),
    tok AS (
      SELECT source, doc_id,
             unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS w
      FROM documents
    ),
    first_occ AS (
      SELECT source, w, min(doc_id) AS first_id
      FROM tok GROUP BY 1, 2
    ),
    news AS (
      SELECT source, first_id AS doc_id, count(*) AS new_words
      FROM first_occ GROUP BY 1, 2
    )
    SELECT p.source, p.doc_id,
           CAST(p.n_words AS BIGINT) AS n_words,
           CAST(coalesce(n.new_words, 0) AS BIGINT) AS new_words,
           CAST(sum(p.n_words) OVER w AS BIGINT) AS cum_tokens,
           CAST(sum(coalesce(n.new_words, 0)) OVER w AS BIGINT)
             AS cum_vocab
    FROM per_doc p LEFT JOIN news n USING (source, doc_id)
    WINDOW w AS (PARTITION BY p.source ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Heaps-law vocabulary-growth curve per source: cumulative "
        "tokens vs cumulative distinct vocabulary in doc order -- "
        "'is more data still adding new words'; first-occurrence "
        "min-aggregate plus source-partitioned cumulative windows, "
        "vocabulary-scale shuffles only",
)
def corpus_vocab_growth(spark, sf_dir):
    from .operators.textstats import vocab_growth_curve

    return vocab_growth_curve(load_table(spark, sf_dir, "documents"))


# --- snapshot diff (E101) ----------------------------------------------------
# Two snapshots are synthesized deterministically from the one corpus:
# OLD drops doc_id % 43 = 1 (those become 'added'), NEW drops
# doc_id % 47 = 0 ('removed') and rewrites doc_id % 31 = 2
# ('modified'); everything else is 'unchanged' -- all four statuses
# provably populated.
@register(
    "corpus_snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id,
             md5(coalesce(regexp_replace(lower(trim(text)), ' +', ' ',
                                         'g'), '')) AS old_fp
      FROM documents WHERE doc_id % 43 <> 1
    ),
    new AS (
      SELECT doc_id,
             md5(coalesce(regexp_replace(lower(trim(
               CASE WHEN doc_id % 31 = 2 THEN text || ' rewritten'
                    ELSE text END)), ' +', ' ', 'g'), '')) AS new_fp
      FROM documents WHERE doc_id % 47 <> 0
    )
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old_fp IS NULL THEN 'added'
                WHEN new_fp IS NULL THEN 'removed'
                WHEN old_fp = new_fp THEN 'unchanged'
                ELSE 'modified' END AS status,
           old_fp, new_fp
    FROM old FULL OUTER JOIN new USING (doc_id)
    """,
    doc="dataset snapshot diff: content change set between two corpus "
        "versions by dedup fingerprint (added/removed/modified/"
        "unchanged), one full-outer equi-join of 32-byte (id, hash) "
        "projections -- text never shuffles; the promotion gate "
        "before training on a re-crawled snapshot",
)
def corpus_snapshot_diff(spark, sf_dir):
    from .operators.diff import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 43 != 1).select("doc_id", "text")
    new = (docs.where(F.col("doc_id") % 47 != 0)
           .select("doc_id",
                   F.when(F.col("doc_id") % 31 == 2,
                          F.concat(F.col("text"), F.lit(" rewritten")))
                   .otherwise(F.col("text")).alias("text")))
    return snapshot_diff(old, new)


# --- snapshot MERGE / upsert (r8) --------------------------------------------
# The step after the diff: APPLY the change set — the re-crawl refresh
# every training-corpus pipeline runs. Same old/new derivation as
# corpus_snapshot_diff; the end-to-end contract is
# merge(old, change_set(old, new)) == new, and the `action` column
# value-checks WHICH merge path produced each row (kept = passed
# through from old, upserted = taken from the change set), so the
# oracle is a real reconstruction, not a tautology. Replay-idempotency
# (re-applying the change set is a no-op) is pinned in
# tests/test_llm_ops.py along with the dynamic-partition-overwrite
# write face.
@register(
    "corpus_apply_snapshot",
    """
    WITH old AS (
      SELECT doc_id,
             md5(coalesce(regexp_replace(lower(trim(text)), ' +', ' ',
                                         'g'), '')) AS old_fp
      FROM documents WHERE doc_id % 43 <> 1
    ),
    new AS (
      SELECT doc_id,
             md5(coalesce(regexp_replace(lower(trim(
               CASE WHEN doc_id % 31 = 2 THEN text || ' rewritten'
                    ELSE text END)), ' +', ' ', 'g'), '')) AS new_fp
      FROM documents WHERE doc_id % 47 <> 0
    )
    SELECT new.doc_id, new_fp AS fp,
           CASE WHEN old_fp IS NOT NULL AND old_fp = new_fp
                THEN 'kept' ELSE 'upserted' END AS action
    FROM new LEFT JOIN old USING (doc_id)
    """,
    doc="idempotent keyed MERGE: apply the snapshot change set "
        "(upsert + delete tombstones) to the current corpus -> next "
        "snapshot with per-row merge provenance; one full-outer "
        "equi-join on the id, change-set payload is the only text "
        "that moves",
)
def corpus_apply_snapshot(spark, sf_dir):
    from .operators.dedup import normalized_text
    from .operators.diff import apply_snapshot, change_set

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 43 != 1).select("doc_id", "text")
    new = (docs.where(F.col("doc_id") % 47 != 0)
           .select("doc_id",
                   F.when(F.col("doc_id") % 31 == 2,
                          F.concat(F.col("text"), F.lit(" rewritten")))
                   .otherwise(F.col("text")).alias("text")))
    merged = apply_snapshot(old, change_set(old, new))
    fp = F.md5(F.coalesce(normalized_text(F.col("text")), F.lit("")))
    return merged.select("doc_id", fp.alias("fp"), "action")


# --- KS distance matrix (E102) -----------------------------------------------
@register(
    "corpus_length_ks_matrix",
    """
    WITH vc AS (
      SELECT source AS grp, n_chars AS x, count(*) AS c
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
    ),
    grid AS (SELECT DISTINCT x FROM vc),
    sizes AS (SELECT grp, sum(c) AS n FROM vc GROUP BY 1),
    dense AS (
      SELECT s.grp, g.x, s.n, coalesce(v.c, 0) AS c
      FROM sizes s CROSS JOIN grid g
      LEFT JOIN vc v ON v.grp = s.grp AND v.x = g.x
    ),
    cdf AS (
      SELECT grp, x, n,
             sum(c) OVER (PARTITION BY grp ORDER BY x
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) / n AS cdf
      FROM dense
    )
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           CAST(max(a.n) AS BIGINT) AS n_a,
           CAST(max(b.n) AS BIGINT) AS n_b,
           round(max(abs(a.cdf - b.cdf)), 6) AS ks
    FROM cdf a JOIN cdf b ON a.x = b.x AND a.grp < b.grp
    GROUP BY 1, 2
    """,
    doc="pairwise two-sample KS distance between per-source length "
        "distributions: max CDF gap over the densified value grid -- "
        "the distributional drift / slice-independence test; bounded "
        "by distinct-values x groups, CDFs are exact integer ratios "
        "so no float hazard",
)
def corpus_length_ks_matrix(spark, sf_dir):
    from .operators.grouped import ks_distance_matrix

    return ks_distance_matrix(load_table(spark, sf_dir, "documents"),
                              "n_chars")


# --- SpaceSaving heavy hitters (E103) ----------------------------------------
# no_oracle by design: per-partition counter evictions depend on
# arrival order within each partition (the reservoir/sticky category,
# SURVEY §5); the guarantees -- any item with global count > N/k
# present, est_min <= true <= est_max -- are property-tested in
# tests/test_llm_ops.py. The face plants a deterministic skew so the
# heavy set is non-vacuous.
@register(
    "streaming_spacesaving_topk",
    None,
    doc="distributed SpaceSaving heavy hitters (Metwally 2005 + "
        "mergeable-summaries merge): <= k counters per partition via "
        "one Arrow mapInPandas pass, P x k-row merge with absent-"
        "partition threshold bounds; the order-insensitive third leg "
        "of the reference's HW3 frequent-items triple",
)
def streaming_spacesaving_topk(spark, sf_dir):
    from .operators.frequent import space_saving_topk

    ev = load_table(spark, sf_dir, "events")
    items = ev.select(
        F.when(F.col("user_id") % 3 == 0, F.lit("heavy-0"))
        .when(F.col("user_id") % 7 == 1, F.lit("heavy-1"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("item"))
    return space_saving_topk(items, "item", k=50, out_k=10)


# --- robust per-source stats (E104) ------------------------------------------
@register(
    "corpus_robust_stats",
    """
    WITH base AS (
      SELECT coalesce(CAST(source AS VARCHAR), chr(0) || '<null>')
               AS gkey,
             source AS grp, CAST(n_chars AS DOUBLE) AS v, doc_id
      FROM documents WHERE n_chars IS NOT NULL
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY gkey
                                   ORDER BY v, doc_id) AS r,
             count(*) OVER (PARTITION BY gkey) AS n
      FROM base
    ),
    marked AS (
      SELECT *,
             greatest(CAST(ceil(n * 5 / 100.0) AS BIGINT), 1) AS lo_r,
             greatest(CAST(ceil(n * 95 / 100.0) AS BIGINT), 1) AS hi_r
      FROM ranked
    ),
    fences AS (
      SELECT gkey, max(CASE WHEN r = lo_r THEN v END) AS p_lo,
                   max(CASE WHEN r = hi_r THEN v END) AS p_hi
      FROM marked GROUP BY 1
    )
    SELECT m.grp AS source, CAST(count(*) AS BIGINT) AS n,
           max(f.p_lo) AS p_lo, max(f.p_hi) AS p_hi,
           round(avg(CASE WHEN m.r > m.lo_r AND m.r <= m.hi_r
                          THEN m.v END), 6) AS trimmed_mean,
           round(avg(greatest(least(m.v, f.p_hi), f.p_lo)), 6)
             AS winsor_mean,
           round(avg(m.v), 6) AS plain_mean
    FROM marked m JOIN fences f USING (gkey)
    GROUP BY m.grp
    """,
    doc="outlier-robust per-source stats: EXACT rank-order P5/P95 "
        "fences (integer rank logic, no engine-varying interpolation) "
        "with trimmed and Winsorized means beside the plain mean; "
        "ranks from the range-partitioned global spine, never a "
        "per-group reducer funnel",
)
def corpus_robust_stats(spark, sf_dir):
    from .operators.grouped import robust_stats

    return robust_stats(load_table(spark, sf_dir, "documents"),
                        "n_chars")
