"""Python user-defined table functions (UDTFs).

The reference has no UDF surface at all (SURVEY.md section 2.10); this
module covers the modern Spark table-function API for the cases where a
row genuinely expands into a variable number of rows under custom Python
logic (parsers, tokenizers, span extractors). For anything expressible
with built-in generators (explode/posexplode/inline/stack) prefer those:
they stay JVM-side. A UDTF is the structured alternative to exploding a
Python-UDF array: rows stream out of the worker instead of materializing
per-row lists.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="term: string, pos: int")
class TermExplode:
    """Whitespace tokenizer as a table function: one (term, position)
    row per token. Deterministic, pure-Python, batched by the Python
    runner -- register with ``spark.udtf.register`` and use via
    ``LATERAL term_explode(text)``."""

    def eval(self, text: str):  # noqa: D102
        if text:
            for i, term in enumerate(text.lower().split()):
                yield term, i


def register_udtfs(spark) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("term_explode", TermExplode)
