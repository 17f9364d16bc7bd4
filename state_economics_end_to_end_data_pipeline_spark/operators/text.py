"""Text-analysis operators for LLM-data pipelines (north-star extensions;
not in the reference -- SURVEY.md section 7 M4).

All built from JVM-side expressions (split/transform/aggregate/md5): no
Python UDFs, so they run inside whole-stage codegen and scale linearly.
Token/shingle explosion happens per-row inside a task (narrow), never as a
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deliberately tiny, deterministic english-ish stopword set: the lang-id /
# quality heuristics must be reproducible in plain SQL for the oracle.
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")


def tokens(c: Column | str) -> Column:
    """Whitespace tokenizer (regex split on runs of whitespace)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column | str) -> Column:
    """Token count as bigint."""
    return F.size(tokens(c)).cast("bigint")


def word_ngrams(toks: Column, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles from a token array. 1-based element_at keeps
    the expression portable (Spark `arr[i]` is 0-based, SQL dialects are
    1-based -- never mix)."""
    # sequence(start, stop) descends when stop < start -- guard short docs
    # to an empty index array instead.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(gram) if distinct else gram


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of tokens that are stopwords (multiset count)."""
    return F.size(F.filter(toks, lambda x: x.isin(*stopwords))).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: token count, distinct-token ratio,
    stopword ratio, mean token length -- the cheap heuristics used to filter
    LLM training corpora. Pure arithmetic on counts: deterministic.

    Empty-document semantics: the whitespace split of an empty string is
    ``['']`` in Spark AND DuckDB, so an empty/whitespace-only doc counts
    ONE zero-length token (n_tokens=1, mean_token_len=0.0) -- the
    denominator is never 0 by construction, and the convention is
    cross-engine stable. Ratios still go through ``try_divide`` as a
    zero-cost guard for exotic tokenizers swapped in by callers."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_uniq = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = stopword_count(toks)
    total_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(
        id_col,
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        n_stop.alias("n_stopwords"),
        F.try_divide(n_uniq.cast("double"), n_tok.cast("double")).alias("distinct_ratio"),
        F.try_divide(n_stop.cast("double"), n_tok.cast("double")).alias("stopword_ratio"),
        F.try_divide(total_len.cast("double"), n_tok.cast("double")).alias("mean_token_len"),
    )


def lang_guess(toks: Column, threshold_pct: int = 8) -> Column:
    """Heuristic language id: stopword density >= threshold% -> 'en'.
    Integer cross-multiplied comparison (no float threshold edge cases --
    the oracle must reproduce the decision bit-for-bit)."""
    n_tok = F.size(toks).cast("bigint")
    n_stop = stopword_count(toks)
    return F.when(n_stop * 100 >= n_tok * threshold_pct, F.lit("en")).otherwise(
        F.lit("other")
    )


def char_ngram_fingerprint(c: Column | str, n: int = 8) -> Column:
    """Winnowing-style document fingerprint: min md5 over all character
    n-grams. Rolling-hash semantics with a portable hash (md5 strings
    compare identically everywhere)."""
    c = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_min(F.transform(idx, lambda i: F.md5(F.substring(c, i, n))))


PII_PATTERNS = {
    # deliberately simple, deterministic patterns -- reproducible in any
    # regex dialect (no lookarounds, no unicode classes)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def redact_pii(c: Column | str, patterns: dict[str, str] | None = None) -> Column:
    """PII redaction for training corpora: each pattern family replaced by
    its [TYPE] tag, applied in deterministic (sorted) order. Pure
    regexp_replace chain -- JVM codegen, no UDF."""
    col = F.col(c) if isinstance(c, str) else c
    for name in sorted(patterns or PII_PATTERNS):
        pat = (patterns or PII_PATTERNS)[name]
        col = F.regexp_replace(col, pat, f"[{name.upper()}]")
    return col


def pii_counts(c: Column | str, patterns: dict[str, str] | None = None) -> list[Column]:
    """Per-family PII match counts (one column per pattern)."""
    col = F.col(c) if isinstance(c, str) else c
    pats = patterns or PII_PATTERNS
    return [
        F.regexp_count(col, F.lit(pats[name])).cast("bigint").alias(f"n_{name}")
        for name in sorted(pats)
    ]
