"""Tokenizer-training preparation operators: BPE pair statistics and
vocabulary-coverage curves.

North-star extension: before an LLM trains, a tokenizer trains — and
the data-heavy part of BPE/unigram training is exactly two corpus
aggregates: (1) symbol-pair frequencies for merge selection, (2) the
token-frequency curve that sizes the vocabulary. Both are expressed
here with the classic scale trick: aggregate the corpus down to its
VOCABULARY first (one shuffle over the token stream; the vocabulary is
Zipf-bounded and orders of magnitude smaller), then do all per-word
work — character-pair explosion, ranking, cumulative sums — on the
vocabulary table. At 100 TB the token stream is trillions of rows but
the vocabulary is ~10⁷; every operator below touches the big side
exactly once, in a map-side-combining hash aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _words


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n_occ) over lower-cased space-split tokens — the
    vocabulary table every op in this module starts from. One hash
    aggregate with map-side combine; the corpus is scanned once."""
    return (docs.select(F.explode(_words(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("n_occ")))


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-character-pair frequencies for BPE merge selection →
    (pair, n_occurrences, n_distinct_words).

    The first (and by far most expensive) step of byte-pair-encoding
    training: count every adjacent symbol pair in the corpus, weighted
    by word frequency. The pair explosion runs over the *vocabulary*,
    never the token stream — a word appearing 10⁹ times contributes
    its pairs once, carried by its count — so the wide intermediate is
    bounded by Σ|word| over distinct words, and the final aggregate by
    the symbol-pair space (≤ charset²). Overlapping pairs counted at
    every position, the textbook formulation ("aaa" → "aa" twice).
    """
    vocab = word_counts(docs, text_col)
    pairs = (
        vocab.where(F.length("word") >= 2)
        .select("word", "n_occ",
                F.explode(F.sequence(F.lit(1), F.length("word") - 1))
                .alias("i"))
        .select("word", "n_occ",
                F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"))
    )
    return (pairs.groupBy("pair")
            .agg(F.sum("n_occ").cast("long").alias("n_occurrences"),
                 F.count_distinct("word").alias("n_distinct_words")))


def vocab_coverage(docs: DataFrame,
                   targets: Sequence[float] = (0.5, 0.9, 0.99),
                   text_col: str = "text") -> DataFrame:
    """Vocabulary sizing: for each coverage target p, the smallest
    top-frequency vocabulary covering ≥ p of all token occurrences →
    (coverage_target, vocab_size, tokens_covered, total_tokens).

    The curve that picks a tokenizer's vocab size (and, inverted, the
    OOV rate any fixed vocabulary implies). Ranking + cumulative sum
    run on the aggregated vocabulary table; the single-partition
    ordered window is deliberate and safe — the vocabulary is the
    Zipf-bounded small side (~10⁷ rows at web scale, KBs here), not
    the corpus. Ties broken by word ascending so the curve is
    deterministic. Targets must be in (0, 1]; each always has an
    answer because cum reaches total at the last row.
    """
    counts = word_counts(docs, text_col)
    order = [F.col("n_occ").desc(), F.col("word")]
    w_cum = (Window.orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy()
    ranked = counts.select(
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
        F.sum("n_occ").over(w_cum).alias("cum"),
        F.sum("n_occ").over(w_all).alias("total"),
    )
    tgt = F.explode(F.array(*[F.lit(float(p)) for p in targets]))
    return (ranked.select("rank", "cum", "total",
                          tgt.alias("coverage_target"))
            .where(F.col("cum") >= F.col("coverage_target") * F.col("total"))
            .groupBy("coverage_target")
            .agg(F.min("rank").cast("long").alias("vocab_size"),
                 F.min_by("cum", "rank").cast("long").alias("tokens_covered"),
                 F.max("total").cast("long").alias("total_tokens")))


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM scoring → (doc_id, n_tokens, avg_neg_logprob): the
    perplexity-proxy quality filter (KenLM-style pipelines score docs
    against an n-gram LM and drop the tails; the unigram tier is the
    expression-only, exactly-oracle-checkable form of the same shape).

    p(w) = count(w)/total over THIS corpus with add-one smoothing over
    the observed vocabulary; a document's score is the mean of
    -ln p(w) over its tokens — high = improbable/garbled text, low =
    stopword soup. Two aggregates (the shared vocabulary table + one
    (doc_id, word) aggregate) and one join on ``word``; the vocabulary
    side is Zipf-small, so AQE broadcasts it and the token stream
    shuffles once on (doc_id, word) — the tfidf_top_terms shape.
    Documents with no tokens are kept with score 0 so corpus-wide
    coverage is preserved for downstream filters.
    """
    # one repartition of the compact documents feeds BOTH branches
    # (ReuseExchange): the (doc_id, word) aggregate and the final
    # per-doc aggregate are satisfied by HashPartitioning(doc_id), so
    # the exploded token stream itself is never shuffled — only the
    # Zipf-small vocabulary aggregate and its one-row total window are
    base = docs.select(F.col(id_col), F.col(text_col)) \
        .repartition(F.col(id_col))
    vocab = word_counts(base, text_col)
    # |V| rides the same vocab-scale window that computes the token
    # total — no eager driver action, so scoring is ONE Spark job
    # instead of a count() pass plus the real one
    w_tot = Window.partitionBy()
    vocab = vocab.withColumn("total", F.sum("n_occ").over(w_tot)) \
                 .withColumn("n_vocab", F.count("*").over(w_tot))
    tok = (base.select(F.col(id_col),
                       F.explode_outer(_words(F.col(text_col))).alias("word"))
           .groupBy(id_col, "word").agg(F.count("word").alias("c")))
    neg_lp = -F.log((F.col("n_occ") + 1.0)
                    / (F.col("total") + F.col("n_vocab")))
    return (tok.join(vocab, "word", "left")
            .groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.round(F.coalesce(
                     F.sum(F.col("c") * neg_lp) / F.sum("c"), F.lit(0.0)),
                     6).alias("avg_neg_logprob")))


def _merge_pair(symbols, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of adjacent
    (left, right) symbol pairs — the BPE apply step — as a pure JVM
    higher-order fold (no Python, no shuffle): the accumulator carries
    (emitted symbols, pending symbol) and each step either completes a
    merge, flushes the pending symbol, or starts a new pending one."""
    merged = F.lit(left + right)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"))

    def step(acc, s):
        hit = acc.pend.eqNullSafe(F.lit(left)) & (s == F.lit(right))
        flushed = F.when(acc.pend.isNotNull(),
                         F.concat(acc.out, F.array(acc.pend))) \
            .otherwise(acc.out)
        return F.when(hit, F.struct(
            F.concat(acc.out, F.array(merged)).alias("out"),
            F.lit(None).cast("string").alias("pend"))) \
            .otherwise(F.struct(flushed.alias("out"), s.alias("pend")))

    def finish(acc):
        return F.when(acc.pend.isNotNull(),
                      F.concat(acc.out, F.array(acc.pend))).otherwise(acc.out)

    return F.aggregate(symbols, init, step, finish)


def bpe_train(docs: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Byte-pair-encoding training: learn ``n_merges`` merges over the
    corpus → [(left, right, pair_count), ...] in merge order.

    The full iterative BPE loop, Spark-first end to end. The working
    state is the VOCABULARY as symbol arrays (word → [chars...] with a
    count), never the corpus: each round is (1) one vocab-scale
    explode+aggregate for adjacent-pair counts, (2) a bounded driver
    action taking the argmax pair (count desc, then lexicographic — a
    deterministic tie-break the driver's ~KB of state mirrors MRFFT's
    coreset collect), (3) a narrow JVM fold (``_merge_pair``) applying
    the merge greedily left-to-right — no Python touches a symbol.
    Lineage is truncated every round (localCheckpoint) so the plan
    stays flat across iterations, the connected-components contract.

    No SQL oracle by design (iterative argmax, SURVEY §5's MRFFT
    category): tests pin the merge sequence to an independent pure-
    Python BPE reference on planted corpora instead.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    # LAZY checkpoints (1 job/round instead of 2): each round's take(1)
    # is a global sort-limit — a full-scan action that materializes the
    # current vocab as a side effect. The PREVIOUS round's blocks can
    # only be dropped after that materialization (its partitions are
    # the current vocab's input), so unpersist trails by one round.
    vocab = (word_counts(docs, text_col)
             .select(F.split("word", "").alias("syms"), "n_occ")
             .localCheckpoint(eager=False))
    prev: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = (vocab.where(F.size("syms") >= 2)
                     .select("n_occ", F.explode(F.sequence(
                         F.lit(1), F.size("syms") - 1)).alias("i"),
                         "syms")
                     .select(F.col("syms")[F.col("i") - 1].alias("a"),
                             F.col("syms")[F.col("i")].alias("b"),
                             "n_occ"))
            best = (pairs.groupBy("a", "b")
                    .agg(F.sum("n_occ").cast("long").alias("cnt"))
                    .orderBy(F.col("cnt").desc(), "a", "b")
                    .take(1))  # materializes vocab; prev now unread
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            a, b, cnt = best[0].a, best[0].b, best[0].cnt
            merges.append((a, b, int(cnt)))
            nxt = vocab.select(
                _merge_pair(F.col("syms"), a, b).alias("syms"), "n_occ") \
                .localCheckpoint(eager=False)
            prev, vocab = vocab, nxt
    finally:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_encode(docs: DataFrame, merges: Sequence[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to the corpus → (doc_id, n_words,
    n_symbols, symbols): the tokenize step that turns text into BPE
    symbols for counting, packing, and batching.

    Encoding is a pure narrow map: per word, the merge list is applied
    in training order, each application the same JVM ``_merge_pair``
    fold used in training — so train and encode can never disagree on
    greedy semantics. The merge list is bounded (a tokenizer's merge
    table), compiled into the expression tree once; no Python, no
    shuffle, no join — the corpus streams through at scan speed.
    Lossless by construction: concatenating a word's symbols restores
    the word (property-tested), so n_symbols is the real post-BPE
    sequence length packing should budget for.
    """
    words = _words(F.col(text_col))
    enc = lambda w: _encode_word(w, merges)  # noqa: E731
    symbols = F.flatten(F.transform(words, enc))
    per_word = F.transform(words, lambda w: F.size(enc(w)))
    return docs.select(
        F.col(id_col), F.size(words).alias("n_words"),
        F.aggregate(per_word, F.lit(0), lambda a, x: a + x)
        .alias("n_symbols"),
        symbols.alias("symbols"))


def _encode_word(word, merges: Sequence[tuple[str, str]]):
    syms = F.split(word, "")
    for a, b in merges:
        syms = _merge_pair(syms, a, b)
    return syms


def bigram_logprob(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Conditional bigram-LM scoring → (doc_id, n_bigrams,
    avg_neg_logprob): the next tier above ``unigram_logprob`` on the
    KenLM-style quality-filter ladder — score each document by the
    mean of -ln p(w_i | w_{i-1}) with add-one smoothing,
    p(w|v) = (c(v,w)+1)/(c(v)+|V|).

    Scale shape mirrors the unigram op: the corpus aggregates down to
    its bigram and unigram tables once (both Zipf-bounded), the
    document side explodes its adjacent pairs and aggregates per
    (doc_id, prev, word) — so each distinct bigram of a document joins
    once, not once per occurrence — and both LM tables broadcast into
    the join (AQE; at web scale the bigram table may need a plain hash
    join, which is the same plan minus the broadcast). Documents with
    fewer than 2 tokens are kept with score 0.
    """
    from .dedup import _shifted_gram_zip

    words = _words(F.col(text_col))
    # CASE guards the <2-token branch for ANSI mode, as in textstats;
    # the zip form evaluates words per ROW, never per element (the
    # r12 shingling root-cause)
    doc_pairs = F.when(F.size(words) >= 2, F.transform(
        _shifted_gram_zip(words, 2),
        lambda x: F.struct(x["0"].alias("prev"), x["1"].alias("word")))
    ).otherwise(F.array().cast("array<struct<prev:string,word:string>>"))

    base = docs.select(F.col(id_col), F.col(text_col)) \
        .repartition(F.col(id_col))
    uni = word_counts(base, text_col)
    # |V| folded into the plan as a vocab-scale window count (the
    # unigram_logprob move): one Spark job, no eager driver action.
    # Every real ``prev`` matches the unigram table (same corpus), so
    # n_vocab is only null on the null-key row a <2-token doc
    # contributes — where c = 0 and the CASE guard below already
    # yields 0.0.
    uni = uni.withColumn("n_vocab", F.count("*").over(Window.partitionBy()))
    ex = base.select(F.col(id_col),
                     F.explode_outer(doc_pairs).alias("p"))
    per = (ex.groupBy(id_col, "p.prev", "p.word")
           .agg(F.count("p").alias("c")))
    big = (base.select(F.explode(doc_pairs).alias("p"))
           .groupBy("p.prev", "p.word").agg(F.count("*").alias("c_vw")))
    neg_lp = -F.log((F.coalesce("c_vw", F.lit(0)) + 1.0)
                    / (F.coalesce("n_occ", F.lit(0)) + F.col("n_vocab")))
    # explicit CASE guard: neg_lp is non-null even on the null-key row
    # a <2-token doc contributes, so the numerator is 0.0 (not NULL)
    # and a bare division would raise DIVIDE_BY_ZERO under ANSI mode
    avg = F.when(F.sum("c") > 0,
                 F.round(F.sum(F.col("c") * neg_lp) / F.sum("c"), 6)) \
        .otherwise(F.lit(0.0))
    return (per.join(big, ["prev", "word"], "left")
            .join(uni.withColumnRenamed("word", "prev"), ["prev"], "left")
            .groupBy(id_col)
            .agg(F.sum("c").cast("long").alias("n_bigrams"),
                 avg.alias("avg_neg_logprob")))


# --- BPE-ish regex pre-tokenizer (E138) ------------------------------------------

# GPT-2-style pre-tokenization, simplified to the engine-portable
# subset: no lookahead (RE2 has none), ASCII classes (identical in
# Java regex and RE2), leftmost-first alternation (verified identical
# across both engines on contraction/punct-run/decimal edge cases).
# Contractions split off first, then space-prefixed letter runs,
# digit runs, and punctuation runs — the token-boundary shape every
# modern BPE vocabulary is trained over.
PRETOKEN_PATTERN = ("'(?:s|t|re|ve|m|ll|d)"
                    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")


def pretokenize_stats(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """BPE-ish regex token counting → ``(doc_id, n_pretokens, n_words,
    n_numbers, n_contractions, n_punct, n_ws_tokens, fertility)``.

    The tokenizer-cost estimator that sits BETWEEN whitespace word
    counts (too coarse: code and URLs are one "word") and a full BPE
    encode (needs a trained merge table): pre-token counts from the
    GPT-2-style boundary regex predict sequence length for ANY
    BPE-family tokenizer, because merges never cross pre-token
    boundaries. ``fertility`` = pre-tokens per whitespace word — the
    per-document cost signal (prose ≈ 1; minified/punct-heavy text
    blows past 2, exactly the docs whose token budget explodes).

    One narrow projection: ``regexp_extract_all`` + class counts as
    anchored-regex array filters, zero shuffle, streams at scan speed.
    """
    toks = F.coalesce(
        F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), 0),
        F.array().cast("array<string>"))
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")

    def n_class(arr, pat):
        return F.size(F.filter(arr, lambda t: t.rlike(pat))).cast("long")

    t = docs.withColumn("_pt", toks)
    n_pre = F.size("_pt").cast("long")
    n_ws = F.size(words).cast("long")
    return t.select(
        F.col(id_col),
        n_pre.alias("n_pretokens"),
        n_class(F.col("_pt"), "^ ?[A-Za-z]+$").alias("n_words"),
        n_class(F.col("_pt"), "^ ?[0-9]+$").alias("n_numbers"),
        n_class(F.col("_pt"), "^'(s|t|re|ve|m|ll|d)$")
        .alias("n_contractions"),
        n_class(F.col("_pt"), "^ ?[^A-Za-z0-9 ]+$").alias("n_punct"),
        n_ws.alias("n_ws_tokens"),
        F.when(n_ws > 0, F.round(n_pre / n_ws, 6))
        .otherwise(F.lit(0.0)).alias("fertility"))
