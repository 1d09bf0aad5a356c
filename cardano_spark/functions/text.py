"""Text-analysis column expressions for the training-data pipeline
(language-ID, quality scoring, token counting, shingling).

All JVM-side built-ins — no Python UDFs in any hot path. Each Spark
expression has a DuckDB text twin (``*_sql``) used by the
correctness oracles; the two are kept adjacent so they evolve in
lockstep.

Determinism: token sets are ``array_distinct`` of a plain
whitespace split (identical semantics both engines); all ratios are
single IEEE divisions of exact integer counts; the quality-score
formula is a fixed-order chain of double ops, bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish token pattern: letter runs, digit runs, or single
#: non-alphanumeric marks. Simple enough that Java regex (Spark) and
#: RE2 (DuckDB) agree exactly.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: Tiny embedded stopword lists per language (deterministic,
#: self-contained — no external model files). Used by the n-gram
#: heuristic language scorer.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von", "zu"],
    "en": ["the", "a", "and", "is", "of", "to", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ne"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}
LANGS = sorted(STOPWORDS)


def tokens(text: Column) -> Column:
    """Whitespace tokens (with multiplicity)."""
    return F.split(text, " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def distinct_tokens(text: Column) -> Column:
    """Unigram shingle set."""
    return F.array_distinct(F.split(text, " "))


def distinct_tokens_sql(expr: str) -> str:
    return f"list_distinct(string_split({expr}, ' '))"


def tokens_sexpr(expr: str) -> str:
    """SPARK-SQL text twin of :func:`tokens` (driver-latency fast
    path; the ``*_sexpr`` convention of operators/similarity.py)."""
    return f"split({expr}, ' ')"


def distinct_tokens_sexpr(expr: str) -> str:
    """SPARK-SQL text twin of :func:`distinct_tokens`."""
    return f"array_distinct(split({expr}, ' '))"


def ngram_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles. Empty array when the document
    has fewer than n tokens (guards Spark's descending-``sequence``
    behavior when stop < start)."""
    toks = F.split(text, " ")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_shingles_sql(expr: str, n: int) -> str:
    toks = f"string_split({expr}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN list_distinct(list_transform("
        f"generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))) "
        f"ELSE [] END"
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Adjacent word n-grams WITH multiplicity (the LM-counting twin
    of :func:`ngram_shingles`, which deduplicates for set-similarity).
    Empty array when the document has fewer than n tokens (guards
    Spark's descending-``sequence`` behavior when stop < start)."""
    toks = F.split(text, " ")
    k = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams_sql(expr: str, n: int) -> str:
    toks = f"string_split({expr}, ' ')"
    return (
        f"CASE WHEN len({toks}) >= {n} THEN list_transform("
        f"generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    """How many tokens (with multiplicity) are stopwords of ``lang``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(words, t)))


def stopword_hits_sql(toks_expr: str, lang: str) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
    return f"len(list_filter({toks_expr}, t -> list_contains({lit}, t)))"


def stopword_hits_sexpr(toks_expr: str, lang: str) -> str:
    """SPARK-SQL text twin of :func:`stopword_hits`."""
    lit = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + ")"
    return f"size(filter({toks_expr}, t -> array_contains({lit}, t)))"


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count via :data:`TOKEN_RE`."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def token_count_regex_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TOKEN_RE}'))"


def punct_count(text: Column) -> Column:
    """Characters outside [a-z0-9 ] — for the synthetic corpus these
    are punctuation plus non-Latin script."""
    return F.length(F.regexp_replace(text, "[a-z0-9 ]", ""))


def punct_count_sql(expr: str) -> str:
    return f"length(regexp_replace({expr}, '[a-z0-9 ]', '', 'g'))"


def quality_score(text: Column) -> Column:
    """The fixed-order document quality formula (q30 and the corpus
    build pipeline share this ONE definition):
    0.5*stopword_ratio + 0.3*len_score + 0.2*(1 - punct_ratio)."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    stop_ratio = stopword_hits(toks, "en").cast("long").cast("double") / n_tok.cast(
        "double"
    )
    len_score = F.least(n_tok, F.lit(100)).cast("double") / F.lit(100.0)
    punct_ratio = punct_count(text).cast("long").cast("double") / n_chars.cast(
        "double"
    )
    return (
        F.lit(0.5) * stop_ratio
        + F.lit(0.3) * len_score
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
    )
