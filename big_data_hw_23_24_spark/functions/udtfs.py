"""Python UDTF extension point (SURVEY §2.9's UDTF half).

The reference's only extension mechanism is Java lambdas inside
``map``/``mapPartitions``; the engine's table-valued analogue is the
PySpark UDTF: a class whose ``eval`` yields zero-or-more rows per input
row, used via ``LATERAL`` join in SQL.

UDTFs execute row-at-a-time in Python — the documented slow path. They
are the *extensibility* surface (arbitrary one-to-many row logic a SQL
expression can't state); anything expressible with explode/sequence/
transform (see ``operators/textstats.py::token_chunks``) should use
those instead, and no UDTF appears on a benched path. ``useArrow=True``
batches the transfer, which is as fast as this path gets.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string, n_chars: int",
      useArrow=True)
class SplitSentences:
    """Explode a document into trimmed, non-empty '.'-sentences.

    One input row → one output row per sentence, with a 0-based index
    over the *kept* sentences. The split rule (segments of a '.'-split,
    trimmed of spaces, empties dropped) is deliberately simple so the
    DuckDB oracle can state it exactly; a production splitter would
    swap in a real segmenter here — the plumbing is the point.
    """

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for seg in text.split("."):
            s = seg.strip(" ")
            if s:
                yield idx, s, len(s)
                idx += 1


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
