"""Checks for rows-only queries whose guarantees the oracle can't pin:
approx-distinct accuracy, minhash recall vs the exact variant."""

from pyspark.sql import functions as F

from dataflow_python_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_approx_distinct_within_5pct(spark):
    # q44's in-plan err_ok gate allows 3·rsd (15%); this test pins the
    # tighter 5% envelope the estimator actually achieves here.
    from dataflow_python_etl_spark.sources.catalog import read_table

    rows = QUERIES["q44_approx_distinct"].fn(spark, SF_DIR).collect()
    assert rows and all(r["err_ok"] for r in rows)
    approx = {
        r["event_type"]: r["a"]
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.05).alias("a"))
        .collect()
    }
    for r in rows:
        e = r["exact_users"]
        assert abs(approx[r["event_type"]] - e) <= max(2, 0.05 * e), (r["event_type"], approx[r["event_type"]], e)


def test_minhash_recall_vs_exact(spark):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q25_minhash_lsh_pairs"].fn(spark, SF_DIR).collect()
    }
    assert lsh <= exact  # no false positives (exact verification)
    # recall on this corpus' near-dup structure: banding finds them all
    assert len(lsh) >= 0.9 * len(exact)


def test_rp_lsh_recall_vs_exact_cosine(spark):
    """q28's banded random-projection LSH must recover ≥80% of the
    true cosine-≥0.45 pairs (the 8-band × 3-plane geometry was chosen
    for exactly this; measured 0.86/1.00/0.94 at sf0.001/0.01/0.1),
    with no false positives (scores are exact and re-thresholded)."""
    import numpy as np

    from dataflow_python_etl_spark.sources.catalog import read_table

    rows = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    S = np.round((V @ V.T) / np.outer(norms, norms), 6)
    iu = np.triu_indices(len(ids), 1)
    keep = S[iu] >= 0.45
    exact = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[0][keep]], ids[iu[1][keep]])
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["q28_cosine_pairs_lsh"].fn(spark, SF_DIR).collect()
    }
    assert lsh <= exact, "LSH produced pairs below the threshold"
    assert len(lsh) >= 0.8 * len(exact), (len(lsh), len(exact))


def test_simhash_near_dups_have_close_hashes(spark):
    """Planted near-dup pairs should have small simhash hamming distance."""
    sim = {r["doc_id"]: r["simhash"] for r in QUERIES["q26_simhash"].fn(spark, SF_DIR).collect()}
    pairs = QUERIES["q24_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    assert pairs
    def hamming(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    dists = [hamming(sim[p["doc_a"]], sim[p["doc_b"]]) for p in pairs]
    # near-dups cluster well below the random-pair expectation of 32 bits
    assert sum(dists) / len(dists) < 16


def test_minhash_incremental_matches_full_rebuild(spark):
    """Ingest-time dedup: splitting the corpus into (indexed corpus,
    new batch) and probing the stored band index must find exactly the
    pairs the full-rebuild minhash_lsh_pairs finds on the union that
    touch a new doc — via an index computed once, with signatures only
    for the batch."""
    from dataflow_python_etl_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        unpersist_all,
    )
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    new_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}

    full = minhash_lsh_pairs(docs)
    expected = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in full.collect()
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    unpersist_all()

    index = minhash_band_index(corpus)
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs_incremental(corpus, batch, index).collect()
    }
    unpersist_all()
    assert got == expected
    assert expected  # the split must actually exercise cross + in-batch hits


def test_simhash_pairs_exact_vs_brute_force(spark):
    """The pigeonhole claim, verified: banded candidate generation at
    radius < n_bands finds EXACTLY the brute-force Hamming pair set
    (no recall loss — this tier is exact, unlike MinHash banding)."""
    import itertools

    from dataflow_python_etl_spark.operators.dedup import simhash, simhash_pairs
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    def ham(a, b):
        return bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")

    for k, bands in ((3, 4), (6, 8)):
        brute = sorted(
            (a, b, ham(a, b))
            for a, b in itertools.combinations(sorted(sigs), 2)
            if ham(a, b) <= k
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(docs, max_hamming=k, n_bands=bands).collect()
        )
        assert got == brute and brute, (k, bands)


def test_simhash_pairs_validation(spark):
    import pytest

    from dataflow_python_etl_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="exactness"):
        simhash_pairs(docs, max_hamming=8, n_bands=8)
    with pytest.raises(ValueError, match="divide evenly"):
        simhash_pairs(docs, max_hamming=3, n_bands=7)


def test_simhash_pairs_exact_on_random_corpora(spark):
    """Pigeonhole exactness as a randomized property: for arbitrary
    small corpora (including near-identical docs engineered to land
    within small Hamming radii), banded pairs == brute force."""
    import itertools
    import random

    from dataflow_python_etl_spark.operators.dedup import simhash, simhash_pairs

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        base = [rng.choice(vocab) for _ in range(20)]
        rows = []
        for i in range(24):
            words = list(base)
            # perturb a few positions: small signature distances
            for _ in range(rng.randrange(0, 6)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((i, " ".join(words)))
        docs = spark.createDataFrame(rows, "doc_id: long, text: string")
        sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

        def ham(a, b):
            return bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")

        brute = sorted(
            (a, b, ham(a, b))
            for a, b in itertools.combinations(sorted(sigs), 2)
            if ham(a, b) <= 6
        )
        got = sorted(
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_pairs(docs, max_hamming=6, n_bands=8).collect()
        )
        assert got == brute, trial


def test_dedup_normalized_collapses_variants(spark):
    """Case / punctuation / whitespace variants normalize to one
    content key with the min-id survivor; genuinely different texts
    stay apart. The plan is exact-dedup shaped: one exchange, no
    Python."""
    from dataflow_python_etl_spark.operators.dedup import dedup_normalized
    from dataflow_python_etl_spark.plans.checks import count_exchanges, explain_str

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!  This is FINE."),
            (2, "hello world this is fine"),
            (3, "HELLO   WORLD: this is \"fine\""),
            (4, "a different document entirely"),
            (5, "hello world this is fine though"),  # extra word: distinct
        ],
        "doc_id: long, text: string",
    )
    out = dedup_normalized(docs)
    rows = {r["doc_id"]: r["n_variants"] for r in out.collect()}
    assert rows == {1: 3, 4: 1, 5: 1}
    # plan pin on a real parquet scan (a local relation adds its own
    # parallelize exchange): map-side partial agg -> ONE shuffle
    from dataflow_python_etl_spark.sources.catalog import read_table

    real = dedup_normalized(read_table(spark, "/root/testdata/sf0.001", "documents"))
    assert count_exchanges(real) == 1
    assert "EvalPython" not in explain_str(real)


def test_span_dedup_planted(spark):
    """Round-5 sequence-level tier: a >=8-token run shared by two docs
    is cut from BOTH (Lee et al. remove-all-copies), shorter shared
    runs and unique text survive, fully-duplicated docs come out
    empty (not null), and the mask plan stays JVM-side."""
    from dataflow_python_etl_spark.operators.dedup import dedup_spans
    from dataflow_python_etl_spark.plans.checks import explain_str

    span = "one two three four five six seven eight"        # 8 tokens
    short = "alpha beta gamma"                               # < n, safe
    docs = spark.createDataFrame(
        [
            (1, f"intro {span} outro"),
            (2, f"{span} trailing words here"),
            (3, f"unique text with {short} inside it okay"),
            (4, f"other copy of {short} but too short to cut"),
            (5, span),                                       # fully dup
        ],
        "doc_id: long, text: string",
    )
    out = dedup_spans(docs, n=8)
    rows = {r["doc_id"]: (r["cleaned"], r["n_tokens_removed"]) for r in out.collect()}
    assert rows[1] == ("intro outro", 8)
    assert rows[2] == ("trailing words here", 8)
    assert rows[3] == (f"unique text with {short} inside it okay", 0)
    assert rows[4] == (f"other copy of {short} but too short to cut", 0)
    assert rows[5] == ("", 8)                                # empty, not null
    assert "EvalPython" not in explain_str(out)

    # overlapping spans merge: doc pair sharing a 10-token run removes
    # all 10 tokens (3 overlapping 8-gram starts), not 8
    long_span = span + " nine ten"
    docs2 = spark.createDataFrame(
        [(1, f"x {long_span} y"), (2, f"p {long_span} q")],
        "doc_id: long, text: string",
    )
    rows2 = {r["doc_id"]: r["n_tokens_removed"] for r in dedup_spans(docs2, n=8).collect()}
    assert rows2 == {1: 10, 2: 10}


def test_span_dedup_keep_first_policy(spark):
    """keep_first: the lowest-id doc keeps the shared span intact,
    every other copy is cut; unique text untouched."""
    from dataflow_python_etl_spark.operators.dedup import dedup_spans

    span = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"intro {span} outro"),
            (2, f"{span} trailing words here"),
            (3, "totally unrelated unique sentence stands alone fine"),
        ],
        "doc_id: long, text: string",
    )
    rows = {
        r["doc_id"]: (r["cleaned"], r["n_tokens_removed"])
        for r in dedup_spans(docs, n=8, policy="keep_first").collect()
    }
    assert rows[1] == (f"intro {span} outro", 0)   # keeper: intact
    assert rows[2] == ("trailing words here", 8)   # copy: cut
    assert rows[3][1] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="policy"):
        dedup_spans(docs, policy="nope").collect()


def test_vocab_growth_monotone_and_totals(spark):
    """q140 invariants on real data: cumulative vocab is monotone
    non-decreasing, the last point equals the corpus-wide distinct
    term count, and every decile 1..10 reports."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.functions import text as TX
    from dataflow_python_etl_spark.queries import QUERIES
    from dataflow_python_etl_spark.sources.catalog import read_table

    rows = (
        QUERIES["q140_vocab_growth"]
        .fn(spark, "/root/testdata/sf0.001")
        .orderBy("decile")
        .collect()
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cum = [r["cum_vocab"] for r in rows]
    assert cum == sorted(cum)
    assert cum[-1] == sum(r["new_terms"] for r in rows)
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    total_terms = (
        docs.select(F.explode(TX.tokens(F.col("text"))).alias("t"))
        .where(F.col("t") != "")
        .select("t")
        .distinct()
        .count()
    )
    assert cum[-1] == total_terms


def test_df_spectrum_buckets_and_conservation(spark):
    """q141: crafted 4-doc corpus — term coverage deciles are exact
    integer division of df·10 by n_docs, n_terms and postings
    conserve across buckets."""
    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.queries import QUERIES

    # operate through the registry at sf0.001 for invariants
    rows = QUERIES["q141_df_spectrum"].fn(spark, "/root/testdata/sf0.001").collect()
    assert all(0 <= r["coverage_decile"] <= 10 for r in rows)
    from dataflow_python_etl_spark.functions import text as TX
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    vocab = (
        docs.select(F.explode(F.array_distinct(TX.tokens(F.col("text")))).alias("t"))
        .where(F.col("t") != "")
    )
    assert sum(r["n_terms"] for r in rows) == vocab.distinct().count()
    assert sum(r["total_postings"] for r in rows) == vocab.count()


def test_containment_pairs_catches_subset_dup_jaccard_misses(spark):
    """The planted case containment exists for: doc 2 is doc 1
    embedded verbatim in ~9x more text — Jaccard ~0.1 (below any
    useful threshold), containment 1.0. Plus: prefix-filtered result
    == brute-force all-pairs on a random corpus (the no-false-
    negatives proof, both directions), and the integer threshold
    cross-multiply keeps boundary pairs exact."""
    import random

    from pyspark.sql import functions as F

    from dataflow_python_etl_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
        unpersist_all,
    )

    inner = " ".join(f"core{i}" for i in range(30))
    filler = " ".join(f"pad{i}" for i in range(270))
    rng = random.Random(147)
    noise = [
        (100 + i, " ".join(f"n{rng.randrange(10**6)}" for _ in range(25)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(
        [(1, inner), (2, inner + " " + filler)] + noise, "doc_id long, text string"
    )
    try:
        got = {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in containment_pairs(docs, threshold_ppm=900_000).collect()
        }
        assert got[(1, 2)] == 1.0  # subset dup found
        jac = {
            (r["doc_a"], r["doc_b"])
            for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
        }
        assert (1, 2) not in jac  # ...which Jaccard misses

        # exactness: prefix-filtered == brute force (all shared-shingle
        # pairs verified directly) on a corpus with overlapping halves
        base = [f"w{i}" for i in range(40)]
        corpus = [
            (i, " ".join(base[s : s + 20]))
            for i, s in enumerate([0, 5, 10, 18, 20, 2])
        ]
        df2 = spark.createDataFrame(corpus, "doc_id long, text string")
        for t_ppm in (500_000, 800_000, 1_000_000):
            fast = {
                (r["doc_a"], r["doc_b"]): r["containment"]
                for r in containment_pairs(df2, threshold_ppm=t_ppm).collect()
            }
            # brute force: exact containment over every pair
            sh = {
                r["doc_id"]: set(
                    " ".join(p)
                    for p in zip(
                        r["text"].split(), r["text"].split()[1:], r["text"].split()[2:]
                    )
                )
                for r in df2.collect()
            }
            brute = {}
            ids = sorted(sh)
            for i, a in enumerate(ids):
                for b in ids[i + 1 :]:
                    c = len(sh[a] & sh[b])
                    mn = min(len(sh[a]), len(sh[b]))
                    if mn and c * 1_000_000 >= t_ppm * mn:
                        brute[(a, b)] = round(c / mn, 6)
            assert fast == brute, (t_ppm, fast, brute)

        import pytest

        with pytest.raises(ValueError, match="threshold_ppm"):
            containment_pairs(docs, threshold_ppm=0)
    finally:
        unpersist_all()
