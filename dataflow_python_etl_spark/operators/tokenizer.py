"""BPE tokenizer vocabulary induction over a document corpus — the
step between a curated corpus and the `bpe_tokens` counting tier
(SURVEY.md §2.4 extension family; standard byte-pair-encoding merge
learning, Sennrich et al. 2016, re-shaped for Spark).

100 TB shape: the ONLY corpus-sized work is one word-frequency
aggregation (explode + map-side-combined groupBy — the same shape as
exact dedup). Merge learning then runs DRIVER-SIDE over the word
frequency table, which is bounded by |distinct words| (and capped by
``top_words``, an exact heavy-hitters cut: ORDER BY freq LIMIT N),
not by corpus bytes — the classic BPE algorithm only ever looks at
that table, so shipping it to the driver is the correct plan, not a
collect() smell. Applying the learned merges back to the corpus is an
Arrow ``mapInPandas`` map (no shuffle): pure per-token work with a
precompiled rank dict.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.text import tokens

END = "</w>"  # end-of-word marker: merges cannot cross word boundaries

# Default heavy-hitters cap on the driver-collected word table. At web
# scale the distinct-"word" population (URLs, hashes, typos) runs to
# billions of rows; the top ~1M words carry nearly all token mass, so
# the capped table learns materially identical merges while bounding
# driver memory BY DEFAULT. Uncapped is an explicit opt-in
# (``top_words=None``) for small curated corpora.
DEFAULT_TOP_WORDS = 1_000_000


def word_frequencies(
    docs: DataFrame, text_col: str = "text", top_words: int | None = DEFAULT_TOP_WORDS
) -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus pass.

    ``top_words`` caps the table with an exact frequency cut (sort +
    limit, word tie-break for determinism) and defaults to
    :data:`DEFAULT_TOP_WORDS` so the downstream driver-side collect in
    :func:`learn_bpe_merges` is bounded unless the caller explicitly
    passes ``top_words=None``.
    """
    if top_words is not None and top_words <= 0:
        raise ValueError("top_words must be positive (or None to disable the cap)")
    toks = F.filter(tokens(text_col), lambda t: t != F.lit(""))
    wf = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if top_words is not None:
        wf = wf.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_words)
    return wf


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        key = tuple(merged)
        out[key] = out.get(key, 0) + freq
    return out


def learn_bpe_merges(
    word_freqs: DataFrame | list[tuple[str, int]],
    n_merges: int,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    Classic greedy BPE: words start as character sequences (+ ``</w>``
    sentinel so merges never cross words); each round merges the most
    frequent adjacent symbol pair. Ties break lexicographically on the
    pair, so the result is DETERMINISTIC across runs, partitionings,
    and engines. Stops early when no pair reaches ``min_freq``.

    Accepts the DataFrame from :func:`word_frequencies` (collected
    here — bounded by the table contract above) or a plain list for
    driver-side use/tests.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    rows = (
        [(r["word"], r["freq"]) for r in word_freqs.collect()]
        if isinstance(word_freqs, DataFrame)
        else list(word_freqs)
    )
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in rows:
        key = tuple(word) + (END,)
        vocab[key] = vocab.get(key, 0) + int(freq)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # max by (freq, pair) with the LEXICOGRAPHICALLY SMALLEST pair
        # winning ties — deterministic without relying on dict order
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_i, best_rank = -1, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens): tokenize each
    document with the learned merges (lowest-rank pair first, the
    standard BPE encode order).

    Arrow ``mapInPandas`` — a zero-shuffle map; the merges ride to the
    executors as a precompiled rank dict inside the closure (a few MB
    for real vocab sizes — the same bounded artifact the driver
    already held). Concatenating each word's subtokens always
    reconstructs the word + ``</w>`` (no information loss; pinned).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = (
        f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long"
    )

    def _enc(it: Iterator) -> Iterator:
        import re

        import pandas as pd

        # Same segmentation as word_frequencies' Spark-side split on
        # Java \s+ (ASCII [ \t\n\x0B\f\r]) — Python str.split() would
        # split on Unicode whitespace (e.g. U+00A0) and encode words
        # the frequency pass never learned merges for.
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks_col, n_col = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in ws.split(text or ""):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bpe_tokens": toks_col, "n_bpe_tokens": n_col}
            )

    return docs.select(id_col, text_col).mapInPandas(_enc, out_schema)
