"""URL canonicalization — the crawl-dedup primitive that catches
duplicates BEFORE any content hashing: the same page fetched as
``HTTP://Example.com:80/a/b/?utm_source=x&id=5#frag`` and
``http://example.com/a/b?id=5`` must collapse to one canonical key.

Everything is Catalyst string/array expressions (regexp_extract /
split / filter / array_sort / array_join — JVM-side, codegen-friendly,
no UDF), and every regex is simple enough that Java regex (Spark) and
RE2 (DuckDB) agree character-for-character, so a SQL oracle replays
the canonicalization exactly (q145).

Canonical form (RFC 3986 normalization plus the tracking-param strip
every crawl pipeline applies):
- scheme and host lowercased;
- default ports dropped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- path: runs of ``/`` collapsed, trailing ``/`` dropped, empty → ``/``;
- query: split on ``&``, empty params and tracking params dropped
  (``utm_*``, ``gclid``, ``fbclid``, ``ref``), the rest SORTED and
  rejoined (param order never distinguishes pages), ``?`` dropped if
  nothing survives.

Scale shape: pure per-row projection — map-side, zero shuffle; the
dedup that follows groups on the canonical string exactly like exact
text dedup."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization; a '=`-prefix
# match ('utm_' covers utm_source/medium/campaign/term/content)
TRACKING_PREFIXES = ("utm_", "gclid=", "fbclid=", "ref=")


def _url_parts(u: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, hostport, path, query) — empty strings when absent
    (regexp_extract returns '' on no-match in BOTH engines)."""
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    # the non-greedy [^#]*? anchors the '?' BEFORE any fragment: a
    # '?' inside the fragment ('/a#sec?id=5') is NOT a query string
    query = F.regexp_extract(u, r"^[^#]*?\?([^#]*)", 1)
    return scheme, hostport, path, query


def canonical_url(col: Column | str) -> Column:
    """The canonical form of a URL string (see module docstring).
    Idempotent — canonical(canonical(u)) == canonical(u), pinned in
    tests. NULL or blank/whitespace in → NULL out (an empty string
    is ABSENT provenance, not a page identity — canonicalizing it to
    '/' would collapse every provenance-free doc into one dedup
    group); a scheme-less non-blank string canonicalizes its
    path/query anyway (host treated as the leading segment)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme, hostport, path, query = _url_parts(u)
    lscheme = F.lower(scheme)
    host = F.lower(hostport)
    host = F.when(lscheme == "http", F.regexp_replace(host, ":80$", "")).otherwise(
        host
    )
    host = F.when(lscheme == "https", F.regexp_replace(host, ":443$", "")).otherwise(
        host
    )
    npath = F.regexp_replace(path, "/{2,}", "/")
    npath = F.regexp_replace(npath, "/$", "")
    npath = F.when(npath == "", F.lit("/")).otherwise(npath)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("gclid=")
        & ~p.startswith("fbclid=")
        & ~p.startswith("ref="),
    )
    qs = F.array_join(F.array_sort(keep), "&")
    out = F.concat(
        F.when(lscheme == "", F.lit("")).otherwise(F.concat(lscheme, F.lit("://"))),
        host,
        npath,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(
        u.isNull() | (u == ""), F.lit(None).cast("string")
    ).otherwise(out)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
) -> DataFrame:
    """Canonical-URL dedup report: ``(canonical_url, n_raw, keep_id)``
    — one row per canonical page with how many raw fetches collapsed
    into it and the deterministic survivor (min id, the repo-wide
    keep-first convention). One projection + one groupBy (map-side
    combined); at 100 TB this runs BEFORE any content fetch/hash and
    prunes the fan-in for every later tier."""
    missing = [c for c in (url_col, id_col) if c not in df.columns]
    if missing:
        raise ValueError(f"columns absent from frame: {missing}")
    return (
        df.select(
            canonical_url(url_col).alias("canonical_url"),
            F.col(id_col).alias("__id"),
        )
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            F.min("__id").alias("keep_id"),
        )
    )
