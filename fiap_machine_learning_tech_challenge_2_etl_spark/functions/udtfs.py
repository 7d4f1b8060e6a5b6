"""Python user-defined table functions (Spark 4 UDTF API).

UDTFs are the row→rows escape hatch when an expansion's shape can't be
stated with ``explode``/``posexplode`` over array expressions — e.g. an
expansion whose per-row fan-out depends on imperative logic. They run
Python-side, so the engine's rule stands: prefer the native array-expression
formulation (see ``chunk_documents`` in the query catalog, which chunks
with sequence/transform/slice at codegen speed); keep the UDTF form as the
extensibility surface and for parity-testing the native one.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class WordNgrams:
    """Emit (position, space-joined word n-gram) rows for one text input —
    the UDTF twin of operators.dedup.shingles (n fixed per call)."""

    def eval(self, text: str, n: int):
        if text is None:
            return
        toks = [t for t in text.split() if t]
        if len(toks) < n:
            if toks:
                yield 0, " ".join(toks)
            return
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("word_ngrams", WordNgrams)
