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


# Portable BPE-ish pre-tokenization: lowercase runs, digit runs, and
# single non-alnum marks — the segmentation q38 counts and the
# tokenizer-budget twin of whitespace tokens (a real BPE vocab splits
# further, but this regex is deterministic and engine-portable, so the
# oracle can mirror it). Classes are disjoint and contain no
# whitespace, so re-tokenizing a space-joined subtoken stream yields
# the same subtokens (chunk_text round-trips under bpe chunking).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def bpe_tokens(col: Column | str) -> Column:
    """array<string> of BPE-ish subword tokens (see ``BPE_RE``).
    Matches are non-empty by construction — no empty-string filter
    needed (unlike whitespace ``tokens``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_RE), F.lit(0))


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


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


# Per-language function-word profiles for the multilingual classifier
# (public common function words; deliberately tiny — the heuristic
# n-gram/stopword family, not a trained model). Profiles may overlap
# ("la" is Spanish AND French): ties break by dict order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": EN_STOPWORDS,
    "es": ("el", "la", "de", "que", "y", "en", "los", "se"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
}


def langid_scores(col: Column | str) -> Column:
    """Multilingual language-ID: per-language stopword-hit ratios and
    an argmax prediction, as one struct column
    ``(en, es, fr, de, pred)``.

    The prediction argmaxes the ROUNDED scores (cross-engine ULP
    safety — the same invariant every ranking in this repo follows)
    with ties broken by profile order (en < es < fr < de), and falls
    back to ``'und'`` when every profile scores zero. Pure expression
    tree over one tokenization — zero-shuffle on a 100 TB scan, and
    term-by-term SQL-mirrorable. (On synthetic corpora this measures
    plumbing, not linguistics — same caveat as ``langid_en_score``.)
    """
    scores = {
        lang: F.round(stopword_ratio(col, words), 6)
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0.0, F.lit("und"))
    for lang in LANG_STOPWORDS:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return F.struct(
        *[scores[lang].alias(lang) for lang in LANG_STOPWORDS],
        pred.alias("pred"),
    )


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
    * (i % 97 + 1)) % mod`` over 1-based token positions.

    ONE indexed ``transform`` pass over the token array (the
    two-argument ``(element, index)`` lambda) plus the summing
    ``aggregate`` — no ``sequence`` allocation and no per-position
    ``element_at`` probes, which halves the interpreted-HOF work per
    token vs the positional formulation (this is the headline shape
    the q22 weak flag measured; cost is linear in document length and
    zero-shuffle/map-side either way). Position arithmetic is done in
    LONG from the start so a pathologically long document (>~160k
    tokens, where ``i*131*98`` exceeds int32) cannot overflow —
    DuckDB's integer ops would error rather than wrap, so staying in
    int32 would diverge cross-engine exactly when it matters."""
    terms = F.transform(
        tokens(col),
        lambda t, i: (
            ((i + 1).cast("long") * 131 + F.length(t) * 7
             + F.ascii(F.substring(t, 1, 1)))
            * ((i + 1) % 97 + 1)
        ),
    )
    return (F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % mod).alias("fingerprint")


# ---------------------------------------------------------------------------
# Corpus-curation functions for LLM training pipelines: PII scrubbing,
# repetition (boilerplate) metrics, URL/domain handling. All pure JVM
# expression trees — zero-exchange map plans, safe in the 100 TB hot
# path, and regex/array semantics that a SQL oracle can mirror.
# ---------------------------------------------------------------------------

# Order matters: emails before bare digit-runs (an email can contain
# digits); each pattern replaced by a typed placeholder so downstream
# tokenization stays stable.
_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"(?:\+?\d{1,2}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}\b", "<PHONE>"),
    (r"\b\d{13,19}\b", "<CCNUM>"),
)


def pii_scrub(col: Column | str) -> Column:
    """Replace common PII shapes (emails, IPv4s, SSNs, phone numbers,
    long card-like digit runs) with typed placeholders.

    A chained ``regexp_replace`` expression tree: runs inside
    whole-stage codegen, no Python in the per-row path. This is the
    regex tier of PII removal — a production pipeline layers an NER
    model on top for names/addresses; the regex tier does the
    high-precision structured shapes and is the part that must run on
    every byte of a 100 TB corpus."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in _PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def _lines(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")


def dedup_lines(col: Column | str) -> Column:
    """Text with repeated (exact, non-empty) lines removed, keeping
    each line's FIRST occurrence — the in-document twin of the
    corpus dedup tiers: scraped pages repeat nav menus / cookie
    banners per section, and repeated boilerplate both wastes tokens
    and skews n-gram statistics.

    One expression tree: a single ``aggregate`` fold appending each
    line to the accumulator unless already present — first-occurrence
    distinct in one pass over the line array. Zero-shuffle, no
    Python; the measured removal fraction is exactly
    ``dup_line_fraction``.

    (The earlier ``array_position(lines, lines[i]) == i`` spelling
    referenced the computed ``lines`` array INSIDE the index lambdas,
    which re-evaluates the whole-document split+filter once per line
    — the O(n²) shared-subexpression pitfall that also hit q22's
    fingerprint; docs/SCALE.md. The fold's ``array_contains`` probe
    per step is over the accumulator, a lambda variable — no
    re-evaluation.)
    """
    kept = F.aggregate(
        _lines(col),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    # NULL text folds to NULL — keep the empty-string policy (same as
    # _ngrams) rather than propagating the null.
    return F.coalesce(F.array_join(kept, "\n"), F.lit(""))


def dup_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier
    line (Gopher-style repetition signal: boilerplate navigation,
    scraped templates). 0.0 for documents with <2 lines."""
    lines = _lines(col)
    n = F.size(lines)
    return F.round(
        F.when(n > 0, (n - F.size(F.array_distinct(lines))) / n).otherwise(F.lit(0.0)), 6
    )


def dup_line_char_fraction(col: Column | str) -> Column:
    """Fraction of characters living in duplicated lines — the
    character-weighted twin of :func:`dup_line_fraction` (one short
    repeated line matters less than a repeated paragraph)."""
    lines = _lines(col)
    chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    dchars = F.aggregate(
        F.array_distinct(lines), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return F.round(
        F.when(chars > 0, (chars - dchars) / chars).otherwise(F.lit(0.0)), 6
    )


def ellipsis_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines ending in an ellipsis — a Gopher
    rule: truncated-preview boilerplate ('read more...')."""
    lines = _lines(col)
    n = F.size(lines)
    ell = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$")))
    return F.round(F.when(n > 0, ell / n).otherwise(F.lit(0.0)), 6)


def symbol_word_ratio(col: Column | str) -> Column:
    """Symbols (#, …, bullet marks) per token — high values indicate
    markup/boilerplate rather than prose (Gopher rule)."""
    c = F.col(col) if isinstance(col, str) else col
    n_sym = F.length(c) - F.length(F.regexp_replace(c, r"[#…•*>|]", ""))
    n_tok = token_count(col)
    return F.round(F.when(n_tok > 0, n_sym / n_tok).otherwise(F.lit(0.0)), 6)


def alpha_word_fraction(col: Column | str) -> Column:
    """Fraction of tokens containing at least one ASCII letter — the
    Gopher "80% of words must contain an alphabetic character" rule
    (filters number/markup soup that token counts alone miss)."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def bullet_line_fraction(col: Column | str) -> Column:
    """Fraction of non-empty lines starting with a bullet mark — a
    Gopher rule (≤90% bullet lines): list-only pages are navigation,
    not prose."""
    lines = _lines(col)
    n = F.size(lines)
    hits = F.size(F.filter(lines, lambda x: F.trim(x).rlike("^[-*•>]")))
    return F.round(F.when(n > 0, hits / n).otherwise(F.lit(0.0)), 6)


def stopword_kinds(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """How many DISTINCT stopwords from the list appear — the Gopher
    "contains at least two stop words" rule. Counting kinds (not hits)
    means a page spamming one function word doesn't pass.

    One ``array_intersect`` (which dedups) against the constant probe
    array, so the tokenization is evaluated exactly once per row — a
    lambda probing ``tokens(col)`` per stopword would re-run the
    split once per probe word (the N-sibling shared-subexpression
    pitfall; docs/SCALE.md)."""
    probe = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.array_intersect(tokens(col), probe)).cast("long")


def url_domain(col: Column | str) -> Column:
    """Registrable host of a URL (lowercased, port stripped) via the
    JVM ``parse_url`` — for per-domain quotas, blocklists, and
    provenance stats over crawl corpora."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.parse_url(c, F.lit("HOST")))


def readability_scores(col: Column | str) -> Column:
    """Flesch reading-ease readability as one struct
    ``(words, sentences, syllables, flesch)`` — the classic
    document-difficulty signal for curriculum ordering and quality
    stratification of training corpora.

    Portable construction: syllables ≈ count of vowel groups
    (``[aeiouy]+`` over the lowercased text — the standard regex
    approximation), sentences = count of ``[.!?]+`` runs (floored at
    1 so fragments still score), words = whitespace tokens. The
    Flesch formula ``206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words)`` is evaluated in the same textual
    operation order on both engines (integer counts, two double
    divisions, rounded to 3) — SQL-mirrorable term by term (q90).
    Zero-shuffle expression tree; all three counts reuse nothing that
    re-evaluates per element (no HOF lambdas at all)."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.greatest(token_count(c), F.lit(1))
    sentences = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]+"), F.lit(0))), F.lit(1)
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(c), F.lit("[aeiouy]+"), F.lit(0))
    )
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words / sentences)
        - F.lit(84.6) * (syllables / words),
        3,
    )
    return F.struct(
        words.cast("long").alias("words"),
        sentences.cast("long").alias("sentences"),
        syllables.cast("long").alias("syllables"),
        flesch.alias("flesch"),
    )


# (pattern, replacement) chain for html_to_text — module-level so the
# DuckDB oracle generator mirrors the EXACT same rules in the same
# order (queries._html_to_text_sql). Patterns stay inside the
# Java-regex ∩ RE2 portable subset: inline (?is) flags, non-greedy
# blocks, character classes — no backreferences, no lookaround.
HTML_TEXT_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<(script|style)[^>]*>.*?</\s*(script|style)\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level boundaries become newlines so line-based quality
    # signals (dup_line_fraction, boilerplate) see real lines
    (r"(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote)[^>]*>", "\n"),
    (r"<[^>]+>", " "),  # any remaining tag
    # minimal entity decode — the common five + nbsp + numeric quote;
    # unknown entities are left as-is (documented lossy subset).
    # &amp; decodes LAST so "&amp;lt;" becomes "&lt;" (one level, the
    # standard single-pass behavior), not "<"
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    # whitespace normalization: spaces/tabs collapse, blank-ish lines
    # vanish, edges trim
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^\n|\n$", ""),
    (r"^ | $", ""),
)


def _mojibake_rules() -> tuple[tuple[str, str], ...]:
    """(mojibake, repaired) pairs for UTF-8-read-as-CP1252 damage —
    the classic crawl encoding bug: a page's UTF-8 bytes decoded
    with Windows-1252 turn every non-ASCII char into a 2-3 char
    gremlin ('é' → 'Ã©', '’' → 'â€™'). Repair inverts that byte-level
    mistake as a PURE CODEPOINT replace chain, so both engines (and
    the oracle) share it literally.

    Generated, not hand-typed: for each source codepoint the mojibake
    string IS its UTF-8 bytes decoded with SLOPPY CP1252 — CP1252
    where the five undefined bytes (0x81 8D 8F 90 9D) fall back to
    their Latin-1 (C1 control) values, which is what real lenient
    decoders emit and exactly ftfy's documented ``sloppy-windows-
    1252`` derivation. Coverage: the CP1252 punctuation block
    (U+2013/2018/20AC/… — 3-char gremlins) and the full Latin-1
    supplement U+00A0–U+00FF (2-char gremlins). Longer gremlins
    replace FIRST so a 3-char fix is never half-eaten by a 2-char
    rule. One pass repairs exactly one level of damage, and the
    round-trip ``repair(corrupt(s)) == s`` is exact for any ``s``
    over ASCII + the covered repertoire that contains no PRE-EXISTING
    gremlin sequence (property-tested) — text that already looks like
    mojibake is genuinely indistinguishable from damage and gets
    repaired too, the ambiguity every repairer shares (ftfy's own
    premise); double-mojibake needs a second application, out of
    scope."""

    def sloppy_cp1252(bs: bytes) -> str:
        out = []
        for b in bs:
            try:
                out.append(bytes([b]).decode("cp1252"))
            except UnicodeDecodeError:
                out.append(chr(b))  # undefined in CP1252: Latin-1 value
        return "".join(out)

    # CP1252's 0x80-0x9F mapping targets (the chars whose UTF-8 is
    # 3 bytes long and whose gremlins roam real crawls)
    punct = (
        "€‚ƒ„…†‡ˆ‰Š"
        "‹ŒŽ‘’“”•–—"
        "˜™š›œžŸ"
    )
    rules: list[tuple[str, str]] = []
    for ch in punct + "".join(chr(c) for c in range(0xA0, 0x100)):
        rules.append((sloppy_cp1252(ch.encode("utf-8")), ch))
    # longest gremlin first; codepoint tie-break for determinism
    rules.sort(key=lambda r: (-len(r[0]), r[1]))
    return tuple(rules)


MOJIBAKE_RULES: tuple[tuple[str, str], ...] = _mojibake_rules()


def repair_mojibake(col: Column | str) -> Column:
    """Undo one level of UTF-8-read-as-CP1252 mojibake (see
    :data:`MOJIBAKE_RULES`): a pure Catalyst chain of LITERAL
    ``replace`` calls — no regex, no Python, map-side only. Clean
    text passes through untouched (the gremlin sequences are
    unproducible from ASCII and vanishingly rare in legitimate
    non-ASCII text — the ftfy premise); the q162 oracle runs the
    identical chain, so the repair semantics are hash-verified
    cross-engine."""
    c = F.col(col) if isinstance(col, str) else col
    for moji, ch in MOJIBAKE_RULES:
        c = F.replace(c, F.lit(moji), F.lit(ch))
    return c


def html_to_text(col: Column | str) -> Column:
    """Main-content text extraction from raw HTML — the crawl-ingest
    tier-0 step BEFORE any text tier (quality, dedup, langid) can
    run: strips script/style/comment blocks, turns block-level tags
    into line boundaries (so the line-based Gopher/boilerplate
    signals downstream see real lines), drops remaining tags, decodes
    the common entities (single-pass: ``&amp;lt;`` → ``&lt;``), and
    normalizes whitespace.

    Pure Catalyst ``regexp_replace`` chain (JVM, map-side, no
    Python); every pattern sits in the Java-regex ∩ RE2 portable
    subset so the q157 oracle runs the IDENTICAL rules in DuckDB —
    remember DuckDB replaces only the first match without the ``'g''``
    flag. Regex extraction is the documented public baseline (the
    jusText/trafilatura family's first stage), not a DOM parser:
    malformed nesting degrades to extra whitespace, never to lost
    non-markup text."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_TEXT_RULES:
        c = F.regexp_replace(c, pat, rep)
    return c
