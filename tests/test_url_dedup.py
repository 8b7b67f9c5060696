"""Canonical-URL dedup (q145): fixed-case canonicalization table,
idempotence, survivorship, and the pure-projection plan shape."""

import pytest
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.url import canonical_url, url_dedup

CASES = [
    # (raw, canonical)
    ("HTTP://Example.com:80/a/b/?utm_source=x&id=5#frag", "http://example.com/a/b?id=5"),
    ("http://example.com/a/b?id=5", "http://example.com/a/b?id=5"),
    ("https://Example.COM:443//x//y/?b=2&a=1&fbclid=zz", "https://example.com/x/y?a=1&b=2"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("http://example.com/?utm_campaign=q", "http://example.com/"),
    ("http://example.com:8080/p", "http://example.com:8080/p"),  # non-default port kept
    ("https://example.com:80/p", "https://example.com:80/p"),  # :80 is NOT https default
    ("example.com/path/", "example.com/path"),  # scheme-less still normalized
    ("  https://pad.example.com/p  ", "https://pad.example.com/p"),
    ("http://a.com/p?ref=x&gclid=1&z=9&a=0", "http://a.com/p?a=0&z=9"),
    ("http://a.com/p?refresh=1", "http://a.com/p?refresh=1"),  # 'ref=' prefix, not 'ref*'
    ("http://a.com/p?utm_source=x", "http://a.com/p"),  # all params stripped -> no '?'
    ("HTTPS://A.COM/Path/Is/CaseSensitive", "https://a.com/Path/Is/CaseSensitive"),
    # '?' INSIDE the fragment is not a query (review-caught): same
    # page as /a, NOT the same as /a?id=5
    ("http://example.com/a#sec?id=5", "http://example.com/a"),
    # blank/whitespace URL = absent provenance, NOT the page '/'
    ("", None),
    ("   ", None),
]


def test_canonicalization_fixed_table(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, url string"
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonical_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_idempotent_and_null(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)] + [(99, None)],
        "id long, url string",
    )
    once = canonical_url("url")
    rows = df.select(
        "id", once.alias("c1"), canonical_url(once).alias("c2")
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], r
    assert next(r["c1"] for r in rows if r["id"] == 99) is None


def test_url_dedup_survivorship_and_plan(spark):
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    df = spark.createDataFrame(
        [
            (3, "http://example.com/a/b?id=5"),
            (1, "HTTP://Example.com:80/a/b/?utm_source=x&id=5#frag"),
            (2, "https://other.com/z"),
            (7, None),
        ],
        "fetch_id long, url string",
    )
    out = url_dedup(df, "url", "fetch_id")
    # plan checks BEFORE collect: explain on an executed frame prints
    # the AQE Initial plan too and doubles substring counts (CLAUDE.md)
    assert count_exchanges(out) == 1  # pure projection + ONE exchange
    assert "EvalPython" not in explain_str(out)
    got = {r["canonical_url"]: (r["n_raw"], r["keep_id"]) for r in out.collect()}
    assert got == {
        "http://example.com/a/b?id=5": (2, 1),  # min id survives
        "https://other.com/z": (1, 2),
    }
    with pytest.raises(ValueError, match="absent"):
        url_dedup(df, "nope", "fetch_id")


def test_q145_shape(spark):
    from dataflow_python_etl_spark.queries import QUERIES

    out = QUERIES["q145_url_canonical_dedup"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["canonical_url", "n_raw", "keep_id"]
    # every canonical page absorbed all 3 variants of >= 1 doc
    assert all(r["n_raw"] % 3 == 0 and r["n_raw"] >= 3 for r in rows)
    # v0 (suffix 0) always survives: lowest raw_id per doc
    assert all(r["keep_id"] % 10 == 0 for r in rows)
    # canonical keys carry no tracking params, default ports, or
    # doubled slashes
    assert all(
        "utm_" not in r["canonical_url"]
        and ":443" not in r["canonical_url"]
        and "//doc" not in r["canonical_url"]
        for r in rows
    )


def test_canonical_url_property_variants_collapse(spark):
    """Property (hypothesis-driven construction, one Spark round
    trip): for ANY clean canonical form, every messy variant built
    from transformations the normalizer must undo — scheme/host
    case, default port, fragment, tracking params, param shuffle,
    doubled slashes, trailing slash, surrounding whitespace —
    canonicalizes back to the clean form, and the canonical form is
    a fixed point."""
    import random

    from hypothesis import given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(max_examples=120, deadline=None)
    @given(
        scheme=st.sampled_from(["http", "https"]),
        host=st.lists(
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8)
            .filter(lambda s: not s.startswith("-") and not s.endswith("-")),
            min_size=1, max_size=3,
        ),
        segs=st.lists(
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=8),
            min_size=0, max_size=4,
        ),
        params=st.dictionaries(
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6)
            .filter(lambda k: not k.startswith("utm") and k not in ("gclid", "fbclid", "ref")),
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=0, max_size=6),
            max_size=4,
        ),
        seed=st.integers(0, 2**31),
    )
    def build(scheme, host, segs, params, seed):
        rng = random.Random(seed)
        hostname = ".".join(host)
        path = "/" + "/".join(segs) if segs else "/"
        qs = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
        clean = f"{scheme}://{hostname}{path.rstrip('/') or '/'}" + (f"?{qs}" if qs else "")
        # messy variant: transformations the normalizer must undo
        mhost = "".join(c.upper() if rng.random() < 0.5 else c for c in hostname)
        mport = {"http": ":80", "https": ":443"}[scheme] if rng.random() < 0.5 else ""
        mpath = path.replace("/", "//") if rng.random() < 0.5 else path
        if rng.random() < 0.5 and mpath != "/":
            mpath += "/"
        items = [f"{k}={v}" for k, v in params.items()]
        if rng.random() < 0.5:
            items.append(rng.choice(["utm_source=x", "gclid=abc", "fbclid=1", "ref=rss"]))
        rng.shuffle(items)
        mqs = "?" + "&".join(items) if items else ""
        frag = "#frag" if rng.random() < 0.5 else ""
        pad = " " if rng.random() < 0.5 else ""
        messy = f"{pad}{scheme.upper()}://{mhost}{mport}{mpath}{mqs}{frag}{pad}"
        cases.append((clean, messy))

    build()
    df = spark.createDataFrame(cases, "clean string, messy string")
    bad = df.where(
        (canonical_url("messy") != F.col("clean"))
        | (canonical_url("clean") != F.col("clean"))
    )
    offenders = bad.limit(5).collect()
    assert not offenders, [(r["clean"], r["messy"]) for r in offenders]


def test_containment_plan_jvm_only(spark):
    """containment_pairs never leaves the JVM: no EvalPython in the
    plan (regexps, window, joins all Catalyst expressions)."""
    from dataflow_python_etl_spark.operators.dedup import (
        containment_pairs,
        unpersist_all,
    )
    from dataflow_python_etl_spark.plans.checks import explain_str

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "b c d e f")], "doc_id long, text string"
    )
    try:
        assert "EvalPython" not in explain_str(containment_pairs(df))
    finally:
        unpersist_all()
