"""Line-level corpus cleaning: C4-style heuristic filters and
within-document repeated-line removal.

The C4 pipeline (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning", §2.2) cleans web text LINE by line before any document-level
filtering: keep only lines that end in terminal punctuation and have a
minimum number of words, then drop documents that end up too short or
contain tell-tale junk ("lorem ipsum", curly braces from leaked code).
Boilerplate menus, cookie banners and navigation fragments die here —
before tokenization ever sees them.

Both operators are pure higher-order-function maps over the split line
array (``F.filter`` / ``F.aggregate``): ZERO shuffles, no explode, no
per-line rows ever materialized, nothing leaves the JVM. At 100 TB this
is the only acceptable shape for per-line work — an explode-based
rewrite would multiply the shuffle-free scan into billions of
intermediate rows for no reason. Per-document line counts are bounded
(documents are bounded), so the O(lines²) ``array_contains`` inside the
keep-first dedup fold is a constant-bounded local loop, not a scale
term.

Reference scope: the reference engine has no text-cleaning surface
(its P2/P6 projections are the nearest primitives, G016HW1.java:61-70);
these operators extend the engine toward the training-data pipeline the
north-star calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: a line "ends in terminal punctuation" if, after trimming trailing
#: whitespace, the last character is . ! ? or a closing double quote —
#: the C4 heuristic for "looks like a real sentence".
_TERMINAL_RE = '[.!?"]\\s*$'


def _word_count(line: Column) -> Column:
    """Non-empty space-split token count (the corpus-wide convention —
    mirrors operators.textstats and the shingle CTE)."""
    return F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))


def c4_line_filter(docs: DataFrame, text_col: str = "text",
                   min_words: int = 4, min_lines: int = 2,
                   out_col: str = "clean_text") -> DataFrame:
    """C4 line filter: keep lines ending in terminal punctuation with
    ≥ ``min_words`` words; flag documents that survive.

    Adds:
      * ``n_lines`` / ``n_kept`` — before/after line counts;
      * ``out_col`` — the kept lines re-joined with newlines;
      * ``has_lorem`` / ``has_brace`` — C4 junk flags (page-level
        "lorem ipsum" placeholder text, curly braces ⇒ leaked code);
      * ``keep`` — ``n_kept ≥ min_lines`` and neither junk flag.

    One narrow projection; the plan is a scan → project with no
    exchange (plan-asserted in tests/test_plans.py).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda l: F.trim(l).rlike(_TERMINAL_RE)
        & (_word_count(F.trim(l)) >= min_words))
    lowered = F.lower(F.col(text_col))
    return (docs
            .withColumn("n_lines", F.size(lines))
            .withColumn("n_kept", F.size(kept))
            .withColumn(out_col, F.array_join(kept, "\n"))
            .withColumn("has_lorem", lowered.contains("lorem ipsum"))
            .withColumn("has_brace", F.col(text_col).contains("{"))
            .withColumn(
                "keep",
                (F.col("n_kept") >= min_lines)
                & ~F.col("has_lorem") & ~F.col("has_brace")))


def dedup_lines(docs: DataFrame, text_col: str = "text",
                out_col: str = "text_deduped") -> DataFrame:
    """Drop repeated lines WITHIN each document, keeping the first
    occurrence in original order (navigation chrome and repeated
    headers collapse to one instance).

    Implemented as a left fold over the line array that appends a line
    only if it has not been seen yet — order-preserving dedup with no
    explode, no window and no shuffle. Adds ``n_lines``,
    ``n_unique_lines`` and ``out_col``.
    """
    lines = F.split(F.col(text_col), "\n")
    deduped = F.aggregate(
        lines,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc)
        .otherwise(F.concat(acc, F.array(x))))
    return (docs
            .withColumn("n_lines", F.size(lines))
            .withColumn("_dedup", deduped)
            .withColumn("n_unique_lines", F.size("_dedup"))
            .withColumn(out_col, F.array_join("_dedup", "\n"))
            .drop("_dedup"))
