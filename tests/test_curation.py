"""Corpus-curation operators: PII scrubbing, repetition metrics,
domain handling, per-key quotas, and the multimodal resize /
frame-sample kernels (fake codecs; real Arrow plumbing)."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.text import (
    dup_line_char_fraction,
    dup_line_fraction,
    ellipsis_line_fraction,
    pii_scrub,
    symbol_word_ratio,
    url_domain,
)
from dataflow_python_etl_spark.operators.corpus import cap_per_key
from dataflow_python_etl_spark.operators.multimodal import (
    resize_images,
    sample_frames,
    with_binary_payload,
)


def test_pii_scrub_patterns(spark):
    rows = spark.createDataFrame(
        [
            ("mail me at jo.doe+x@example.co.uk now",),
            ("server 192.168.1.10 down",),
            ("ssn 123-45-6789 leaked",),
            ("call (415) 555-1234 or +1 650.555.9999",),
            ("card 4111111111111111 charged",),
            ("plain text stays",),
        ],
        "text: string",
    ).select(pii_scrub("text").alias("t"))
    got = [r["t"] for r in rows.collect()]
    assert got[0] == "mail me at <EMAIL> now"
    assert got[1] == "server <IP> down"
    assert got[2] == "ssn <SSN> leaked"
    assert "<PHONE>" in got[3] and "555" not in got[3]
    assert got[4] == "card <CCNUM> charged"
    assert got[5] == "plain text stays"


def test_repetition_metrics(spark):
    boiler = "menu\nhome\nmenu\nhome\nmenu"  # 5 lines, 2 distinct
    prose = "alpha beta\ngamma delta"
    df = spark.createDataFrame([(boiler,), (prose,)], "text: string").select(
        dup_line_fraction("text").alias("dlf"),
        dup_line_char_fraction("text").alias("dlcf"),
    )
    got = df.collect()
    assert got[0]["dlf"] == 0.6  # 3 of 5 lines are repeats
    # chars: 5 lines * 4 chars = 20, distinct = 8 -> 12/20
    assert got[0]["dlcf"] == 0.6
    assert got[1]["dlf"] == 0.0 and got[1]["dlcf"] == 0.0


def test_ellipsis_and_symbol_metrics(spark):
    df = spark.createDataFrame(
        [("read more...\nfull story…\nactual text",), ("# a > b | c",)],
        "text: string",
    ).select(
        ellipsis_line_fraction("text").alias("ell"),
        symbol_word_ratio("text").alias("sym"),
    )
    got = df.collect()
    assert abs(got[0]["ell"] - 2 / 3) < 1e-6
    assert got[1]["sym"] == 0.5  # 3 symbols / 6 whitespace tokens


def test_url_domain(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.com:8080/a/b?q=1",), ("http://sub.site.org/x",)],
        "url: string",
    ).select(url_domain("url").alias("d"))
    assert [r["d"] for r in df.collect()] == ["www.example.com", "sub.site.org"]


def test_cap_per_key_quota(spark):
    df = spark.createDataFrame(
        [(d, i) for d in ("a.com", "b.com") for i in range(10)] + [("c.com", 0)],
        "domain: string, doc_id: long",
    )
    out = cap_per_key(df, ["domain"], 3, ["doc_id"])
    by_dom = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom == {"a.com": 3, "b.com": 3, "c.com": 1}
    # deterministic survivors: lowest doc_ids
    assert sorted(
        r["doc_id"] for r in out.where(F.col("domain") == "a.com").collect()
    ) == [0, 1, 2]


def test_cap_per_key_salted_matches_and_balances(spark):
    # 90%-one-key corpus: the case where single-phase cap_per_key
    # funnels the whole hot key through one reducer.
    hot = [("hot.com", i) for i in range(900)]
    cold = [(f"c{i % 20}.org", 1000 + i) for i in range(100)]
    df = spark.createDataFrame(hot + cold, "domain: string, doc_id: long").repartition(8)
    n, s = 5, 16

    plain = cap_per_key(df, ["domain"], n, ["doc_id"])
    salted = cap_per_key(df, ["domain"], n, ["doc_id"], salt_buckets=s)

    # identical output: phase 1 never drops a global top-n survivor
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # two-phase plan: a window over (domain, __salt) then one over (domain)
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("windowpartitionspecdefinition") >= 2 or plan.count("Window") >= 2

    # balance pin: replicate phase 1 and assert the hot key's rows
    # reach the second shuffle spread over many salt buckets, each
    # emitting at most n rows (bounded reducer input, n*s total).
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(s))
    w1 = Window.partitionBy("domain", "__salt").orderBy("doc_id")
    phase1 = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= n)
    )
    per_bucket = (
        phase1.where(F.col("domain") == "hot.com")
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(per_bucket) > 4  # hot key spread over many reducers
    assert max(r["count"] for r in per_bucket) <= n
    assert sum(r["count"] for r in per_bucket) <= n * s


def test_resize_images_contract(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "xy")], "doc_id: long, text: string"
    )
    out = resize_images(with_binary_payload(docs), width=4, height=2).collect()
    assert {r["asset_id"] for r in out} == {1, 2}
    for r in out:
        assert len(r["payload"]) == 8 and r["width"] == 4 and r["height"] == 2
    # deterministic: same input -> same bytes
    again = resize_images(with_binary_payload(docs), 4, 2).collect()
    assert {bytes(r["payload"]) for r in out} == {bytes(r["payload"]) for r in again}


def test_sample_frames_fanout_and_skip(spark):
    docs = spark.createDataFrame(
        [(1, "0123456789abcdef"), (2, "")], "doc_id: long, text: string"
    )
    out = sample_frames(with_binary_payload(docs), n_frames=4, frame_ms=500).collect()
    # empty payload yields no frames; the other yields exactly 4
    assert {r["asset_id"] for r in out} == {1}
    assert sorted((r["frame_idx"], r["ts_ms"]) for r in out) == [
        (0, 0), (1, 500), (2, 1000), (3, 1500),
    ]
    assert all(len(r["frame"]) == 4 for r in out)  # 16 bytes / 4 frames


def test_curation_plans_stay_narrow(spark):
    """Scalar curation fns are zero-exchange map plans; the multimodal
    kernels are shuffle-free mapInPandas."""
    docs = spark.createDataFrame([(1, "a\nb", "http://x.com")],
                                 "doc_id: long, text: string, url: string")
    scalar_plan = docs.select(
        pii_scrub("text"), dup_line_fraction("text"), url_domain("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in scalar_plan
    mm_plan = (
        sample_frames(with_binary_payload(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in mm_plan and "MapInPandas" in mm_plan


def test_curate_corpus_full_pipeline(spark):
    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from dataflow_python_etl_spark.sources.catalog import read_table

    sf = "/root/testdata/sf0.001"
    docs = read_table(spark, sf, "documents")
    emb = read_table(spark, sf, "embeddings")
    out = curate_corpus(
        docs, emb, domain_col="source", max_per_domain=50, cosine_threshold=0.95
    )
    rows = out.collect()
    n_in = docs.count()
    assert 0 < len(rows) < n_in
    # survivors carry scrubbed text + metrics
    assert set(out.columns) == {"doc_id", "text", "quality", "n_tokens"}
    assert all(r["quality"] >= 0.3 and r["n_tokens"] > 0 for r in rows)
    # the quota bound holds per source domain
    per_dom = (
        out.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source").count().collect()
    )
    assert all(r["count"] <= 50 for r in per_dom)
    # whole pipeline is ONE lazy plan: no action ran during construction
    assert out.is_cached is False


def test_extract_audio_features_windows(spark):
    from dataflow_python_etl_spark.operators.multimodal import extract_audio_features

    # 2.5 windows of 4 bytes -> exactly 2 full windows; constant signal
    # (silence at center) has rms 0; alternating has crossings
    docs = spark.createDataFrame(
        [(1, bytes([128, 128, 128, 128, 0, 255, 0, 255, 77, 99])),
         (2, b"")],
        "doc_id: long, payload: binary",
    )
    out = extract_audio_features(docs, window_bytes=4).collect()
    rows = {(r["asset_id"], r["window_idx"]): r for r in out}
    assert set(rows) == {(1, 0), (1, 1)}  # empty payload -> no rows
    assert rows[(1, 0)]["rms"] == 0.0 and rows[(1, 0)]["peak"] == 0
    assert rows[(1, 1)]["peak"] == 128 and rows[(1, 1)]["zero_crossings"] == 3


def test_curate_corpus_tiered_dedup_variant(spark):
    """Round-5 capstone variant: line-dedup + normalized-dedup +
    SimHash tiers selected. Exact-output pin: composing the standalone
    operators in the documented order reproduces curate_corpus
    byte-for-byte (full row hash, text included), and the synthetic
    planted variants resolve exactly as specified."""
    import hashlib

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.functions.text import (
        dedup_lines,
        pii_scrub,
        token_count,
    )
    from dataflow_python_etl_spark.operators.corpus import curate_corpus, quality_score
    from dataflow_python_etl_spark.operators.dedup import (
        dedup_normalized,
        ngram_jaccard_pairs,
        simhash_pairs,
        unpersist_all,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    got = curate_corpus(
        docs,
        line_dedup=True,
        normalized_dedup=True,
        simhash_max_hamming=3,
    )
    got_rows = got.collect()
    unpersist_all()
    assert 0 < len(got_rows) < docs.count()
    assert set(got.columns) == {"doc_id", "text", "quality", "n_tokens"}
    assert got.is_cached is False  # still one lazy plan

    # independent composition of the standalone operators, documented
    # order: scrub -> line dedup -> quality -> normalized -> jaccard
    # -> simhash -> final projection
    base = docs.select(
        F.col("doc_id"), dedup_lines(pii_scrub("text")).alias("text")
    ).withColumn("quality", quality_score("text")).where(F.col("quality") >= 0.3)
    base = base.join(
        dedup_normalized(base).select("doc_id"), "doc_id", "left_semi"
    )
    jp = ngram_jaccard_pairs(base, threshold=0.5, max_shingle_df=64)
    base = base.join(
        jp.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    sp = simhash_pairs(base, max_hamming=3)
    base = base.join(
        sp.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    want_rows = base.select(
        "doc_id", "text", "quality", token_count("text").cast("long").alias("n_tokens")
    ).collect()
    unpersist_all()

    def digest(rows):
        h = hashlib.md5()
        for t in sorted((r["doc_id"], r["text"], r["quality"], r["n_tokens"]) for r in rows):
            h.update(repr(t).encode())
        return h.hexdigest()

    assert digest(got_rows) == digest(want_rows)

    # planted variants: a case/punct variant of doc A dies in the
    # normalized tier; in-doc repeated lines collapse; both effects
    # visible in the exact output text
    body = "the quick brown fox jumps over the lazy dog and runs far away home"
    synth = spark.createDataFrame(
        [
            (1, body + "\nrepeat line\nrepeat line\nrepeat line"),
            # normalized variant of doc 1 AFTER its line tier runs:
            # same words, different case/punctuation/line spam
            (2, (body + "\nREPEAT LINE!!!\nREPEAT LINE!!!").upper()),
            (3, "an entirely different document about boats and rivers ok"),
        ],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in curate_corpus(
            synth, min_quality=0.0, line_dedup=True, normalized_dedup=True
        ).collect()
    }
    unpersist_all()
    assert set(out) == {1, 3}  # doc 2 collapsed onto min-id survivor 1
    assert out[1].count("repeat line") == 1  # line tier collapsed repeats


def test_curate_corpus_decontamination_tier(spark):
    """Round-5: the decontamination tier drops exactly the documents
    contamination_check flags, before any dedup tier — composing the
    standalone operators reproduces curate_corpus exactly."""
    import hashlib

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.functions.text import pii_scrub, token_count
    from dataflow_python_etl_spark.operators.corpus import curate_corpus, quality_score
    from dataflow_python_etl_spark.operators.dedup import (
        contamination_check,
        ngram_jaccard_pairs,
        unpersist_all,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    eval_set = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)

    got = curate_corpus(corpus, decontaminate_against=eval_set)
    got_rows = got.collect()
    unpersist_all()

    base = corpus.select(
        F.col("doc_id"), pii_scrub("text").alias("text")
    ).withColumn("quality", quality_score("text")).where(F.col("quality") >= 0.3)
    flagged = contamination_check(base, eval_set).select("doc_id")
    base = base.join(flagged, "doc_id", "left_anti")
    jp = ngram_jaccard_pairs(base, threshold=0.5, max_shingle_df=64)
    base = base.join(
        jp.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    want_rows = base.select(
        "doc_id", "text", "quality", token_count("text").cast("long").alias("n_tokens")
    ).collect()
    unpersist_all()

    def digest(rows):
        h = hashlib.md5()
        for t in sorted((r["doc_id"], r["text"], r["quality"], r["n_tokens"]) for r in rows):
            h.update(repr(t).encode())
        return h.hexdigest()

    assert 0 < len(got_rows) < corpus.count()
    assert digest(got_rows) == digest(want_rows)

    # and the tier really bit: at least one quality-surviving doc was
    # dropped for contamination alone
    n_without = curate_corpus(corpus).count()
    unpersist_all()
    assert len(got_rows) < n_without


def test_curate_corpus_span_dedup_tier(spark):
    """Round-5: the span tier cuts cross-doc >=n-token runs before the
    quality gate — composition with the standalone operators is exact,
    and a fully-duplicated doc dies at the quality gate (empty text)."""
    import hashlib

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.functions.text import pii_scrub, token_count
    from dataflow_python_etl_spark.operators.corpus import curate_corpus, quality_score
    from dataflow_python_etl_spark.operators.dedup import (
        dedup_spans,
        ngram_jaccard_pairs,
        unpersist_all,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    got = curate_corpus(docs, span_dedup_n=8)
    got_rows = got.collect()
    unpersist_all()

    scrub = docs.select(F.col("doc_id"), pii_scrub("text").alias("text"))
    sp = (
        dedup_spans(scrub, n=8)
        .where(F.trim(F.col("cleaned")) != "")
        .select("doc_id", F.col("cleaned").alias("text"))
    )
    base = sp.withColumn("quality", quality_score("text")).where(F.col("quality") >= 0.3)
    jp = ngram_jaccard_pairs(base, threshold=0.5, max_shingle_df=64)
    base = base.join(
        jp.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    want_rows = base.select(
        "doc_id", "text", "quality", token_count("text").cast("long").alias("n_tokens")
    ).collect()
    unpersist_all()

    def digest(rows):
        h = hashlib.md5()
        for t in sorted((r["doc_id"], r["text"], r["quality"], r["n_tokens"]) for r in rows):
            h.update(repr(t).encode())
        return h.hexdigest()

    assert 0 < len(got_rows)
    assert digest(got_rows) == digest(want_rows)
    # the tier bit: documents that were ENTIRELY duplicated spans are
    # gone (not surviving as empty rows), and surviving text really
    # was rewritten relative to the span-free pipeline
    emptied = {
        r["doc_id"]
        for r in dedup_spans(scrub, n=8).where(F.trim(F.col("cleaned")) == "").collect()
    }
    unpersist_all()
    assert emptied, "fixture corpus should contain fully-duplicated docs"
    got_ids = {r["doc_id"] for r in got_rows}
    assert not (emptied & got_ids)
    plain = {r["doc_id"]: r["text"] for r in curate_corpus(docs).collect()}
    unpersist_all()
    assert any(
        r["doc_id"] in plain and r["text"] != plain[r["doc_id"]] for r in got_rows
    ), "span tier should rewrite at least one surviving document"


def test_curate_corpus_url_tier_zero(spark):
    """tier 0 (url_col): re-fetches whose URLs canonicalize
    identically collapse to the min-id survivor BEFORE any content
    tier — even when their texts differ (the later content tiers get
    one page, not N fetch variants); null-URL docs pass through."""
    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    import random

    rng = random.Random(8)
    prose = lambda: " ".join(  # noqa: E731
        rng.choice(["river", "stone", "gentle", "meadow", "harbor", "lantern",
                    "orchard", "winter", "travels", "quietly", "morning"])
        for _ in range(60)
    )
    docs = spark.createDataFrame(
        [
            (1, prose() + " fetch one", "HTTP://Site.com:80/a/?utm_source=x"),
            (2, prose() + " fetch two", "http://site.com/a"),  # same page
            (3, prose() + " other page", "http://site.com/b"),
            (4, prose() + " no provenance", None),
        ],
        "doc_id long, text string, url string",
    )
    try:
        out = curate_corpus(docs, min_quality=0.0, url_col="url")
        ids = {r["doc_id"] for r in out.collect()}
        assert 2 not in ids  # higher-id re-fetch collapsed by URL alone
        assert {1, 3, 4} <= ids  # distinct page + null-URL doc survive
        # without the tier, both fetches survive (texts differ)
        base = {r["doc_id"] for r in curate_corpus(docs.drop("url"), min_quality=0.0).collect()}
        assert {1, 2, 3, 4} <= base
    finally:
        unpersist_all()


def test_html_to_text_spec(spark):
    """The extraction contract on hand-crafted HTML: script/style/
    comment content VANISHES, block tags become line boundaries,
    inline tags become spaces, entity decode is single-pass
    (&amp;lt; -> &lt;, never <), unknown entities survive, malformed
    markup degrades to whitespace (never eats non-markup text)."""
    from dataflow_python_etl_spark.functions.text import html_to_text

    cases = [
        # full page: every rule class at once
        (
            '<html><head><title>T</title><style>b{c:r}</style>'
            '<script>var s="<p>secret</p>";\nmore();</script></head>'
            '<body><!-- hidden --><h1>Head</h1><p>one &amp; two '
            '&lt;three&gt;</p><div>four&nbsp;five&#39;s</div>'
            '<ul><li>item</li></ul>tail</body></html>',
            "T\nHead\none & two <three>\nfour five's\nitem\ntail",
        ),
        # single-pass entity decode + unknown entity survives
        ("a &amp;lt;b &copy; c", "a &lt;b &copy; c"),
        # inline tags are spaces, not line breaks; whitespace collapses
        ("x <b>bold</b>\t\t<i>it</i>   y", "x bold it y"),
        # malformed: unclosed tag eats to the next '>', text survives
        ("before <a href='u broken after>kept", "before kept"),
        # case-insensitive block removal, multiline body
        ("<SCRIPT>\nvar x = 1;\n</SCRIPT>keep<STYLE>s</STYLE>", "keep"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "id: long, h: string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select("id", html_to_text("h").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_curate_corpus_html_extract_tier(spark):
    """curate_corpus(html_extract=True) over HTML-wrapped docs equals
    curate_corpus over the plain docs (the wrapper extracts to the
    exact original text), and an all-markup page is dropped by the
    extraction tier itself — never leaked past the quality gate by
    the empty-string 0.304 loophole."""
    from dataflow_python_etl_spark.operators.corpus import curate_corpus
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.length("text") > 0
    )
    wrapped = docs.withColumn(
        "text",
        F.concat(
            F.lit("<html><head><script>var x=1;</script></head><body><p>"),
            F.col("text"),
            F.lit("</p><!-- footer --></body></html>"),
        ),
    )
    markup_only = spark.createDataFrame(
        [(999_999, "<html><body><script>x()</script><style>a{}</style></body></html>")],
        "doc_id: long, text: string",
    )
    want = sorted(
        (r["doc_id"], r["text"], r["quality"])
        for r in curate_corpus(docs).collect()
    )
    got = sorted(
        (r["doc_id"], r["text"], r["quality"])
        for r in curate_corpus(
            wrapped.select("doc_id", "text").unionByName(markup_only),
            html_extract=True,
        ).collect()
    )
    assert got == want and want
