"""Physical-plan pins: the scale properties each declared query must
keep (pushdown, pruning, broadcast joins, minimal shuffles). A change
that silently de-optimizes a plan fails here, not on the cluster."""

import pytest

from dataflow_python_etl_spark.plans.checks import (
    count_exchanges,
    explain_str,
    final_plan_str,
    has_broadcast_join,
    has_pushed_filters,
    read_schema_columns,
)
from dataflow_python_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    return QUERIES[name].fn(spark, SF_DIR)


def test_projection_and_filter_reach_scan(spark):
    df = _q(spark, "q02_projection_pushdown")
    assert has_pushed_filters(df), "l_quantity filter must push to parquet"
    cols = read_schema_columns(df)
    # exactly the 6 projected columns are read — no full-width scan
    assert set(cols) == {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_shipdate",
    }


def test_flagship_prunes_to_needed_columns(spark):
    df = _q(spark, "q01_pricing_summary")
    cols = set(read_schema_columns(df))
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert has_pushed_filters(df), "shipdate filter must push down"


def test_mart_denorm_broadcasts_dims(spark):
    # No forced F.broadcast hints anywhere in q04 — orders is
    # fact-sized and customer scales with SF, so a hard hint would
    # OOM at 100 TB. Size-based planning must still pick broadcast at
    # test scale, proving the hint was never needed.
    df = _q(spark, "q04_mart_denorm")
    assert "ResolvedHint" not in explain_str(df, "extended"), "q04 must not carry broadcast hints"
    assert has_broadcast_join(df)
    # broadcast left joins: no shuffle of the fact table at all
    assert count_exchanges(df) == 0, explain_str(df, "simple")


def test_mart_denorm_aqe_broadcasts_at_sf01(spark):
    # Execute at sf0.1: the *finalized* adaptive plan must still join
    # by broadcast, chosen from measured sizes, not hints — same plan
    # at test scale, safe (shuffle join) at cluster scale.
    df = QUERIES["q04_mart_denorm"].fn(spark, "/root/testdata/sf0.1")
    s = final_plan_str(df)
    assert "isFinalPlan=true" in s, s
    assert "BroadcastHashJoin" in s, s


def test_revenue_star_broadcasts_all_dims(spark):
    # customer's hint is gone too (scales with SF); nation/region keep
    # theirs (bounded at 25/5 rows at any SF).
    df = _q(spark, "q20_revenue_by_nation")
    assert has_broadcast_join(df)
    # lineitem⋈orders shuffles (both large); the dim joins must not
    # add exchanges beyond join + final agg
    assert count_exchanges(df) <= 3, explain_str(df, "simple")


def test_revenue_star_aqe_broadcasts_customer_at_sf01(spark):
    df = QUERIES["q20_revenue_by_nation"].fn(spark, "/root/testdata/sf0.1")
    s = final_plan_str(df)
    assert "isFinalPlan=true" in s, s
    # all three dim joins broadcast in the finalized plan; the only
    # shuffle joins allowed are lineitem⋈orders (+ the final agg)
    assert s.count("BroadcastHashJoin") >= 3, s


def test_top1_per_group_single_shuffle(spark):
    # window dedup = one hash partition by the window key
    df = _q(spark, "q03_top1_per_group")
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_compensation_single_shuffle(spark):
    # The whole compensation recompute (quota + rank + case) must be
    # ONE shuffle on the flight key — both windows share partitioning.
    df = _q(spark, "q10_compensation")
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_scalar_queries_have_zero_shuffles(spark):
    for name in ["q05_abs_amount", "q06_obfuscate_names", "q09_age_years",
                 "q17_string_funcs", "q18_scalar_funcs", "q19_json_map_funcs",
                 "q21_text_metrics",
                 "q22_fingerprint", "q26_simhash", "q30_multimodal_meta"]:
        df = _q(spark, name)
        assert count_exchanges(df) == 0, f"{name} should be a pure map plan"


def test_cosine_topk_broadcasts_queries(spark):
    df = _q(spark, "q27_cosine_topk")
    assert has_broadcast_join(df)
    # corpus never shuffles for scoring; only the final top-k window
    assert count_exchanges(df) == 1, explain_str(df, "simple")


def test_obfuscation_is_jvm_only(spark):
    # No Python UDF in the hot path: plan must not contain
    # BatchEvalPython / ArrowEvalPython nodes.
    s = explain_str(_q(spark, "q06_obfuscate_names"), "simple")
    assert "EvalPython" not in s


def test_correlated_subquery_is_decorrelated(spark):
    # The reference executed this shape as one RPC per row
    # (datalake_compensation.py:96-115); Catalyst must rewrite it to
    # aggregate + join — the plan contains a join, never a per-row loop.
    df = _q(spark, "q46_correlated_subquery")
    s = explain_str(df, "simple")
    assert "Join" in s and "Aggregate" in s


def test_split_by_group_zero_exchange_jvm_only(spark):
    """The dataset split is a pure map-side projection: no shuffle,
    no Python in the data path — it costs one expression per row at
    any corpus size."""
    from dataflow_python_etl_spark.operators.corpus import split_by_group
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents")
    out = split_by_group(docs, "doc_id", {"train": 0.9, "test": 0.1})
    plan = explain_str(out)
    assert count_exchanges(out) == 0
    assert "EvalPython" not in plan


@pytest.mark.parametrize("token_mode,tokenizer_fn", [
    ("whitespace", "split("), ("bpe", "regexp_extract_all(")
])
def test_chunk_documents_single_generate_no_python(spark, token_mode, tokenizer_fn):
    """Chunking is one Generate over a projection that computes the
    token array once per document — the sibling-projection shape that
    re-runs the tokenizer per output chunk must not come back, and the
    whole operator stays JVM-side. Pinned for BOTH token modes."""
    from dataflow_python_etl_spark.operators.chunking import chunk_documents
    from dataflow_python_etl_spark.sources.catalog import read_table

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = chunk_documents(docs, chunk_tokens=64, overlap_tokens=8, token_mode=token_mode)
    plan = explain_str(out)
    assert count_exchanges(out) == 0
    assert "EvalPython" not in plan
    assert plan.count("posexplode") == 1
    # the tokenizer expression is evaluated EXACTLY once (in the
    # projection below the Generate) — not re-run per chunk by a
    # sibling projection, and not re-derived inside a pushed
    # empty-doc Filter
    assert plan.count(tokenizer_fn) == 1, plan


def test_q51_chunk_accounting_plan(spark):
    """The chunk-accounting oracle query keeps chunking's shape: one
    Generate, one exchange (the doc_id aggregation), no Python."""
    df = QUERIES["q51_bpe_chunk_accounting"].fn(spark, SF_DIR)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 1, plan
    assert plan.count("Generate") == 1 and "EvalPython" not in plan, plan


def test_q53_salted_quota_plan(spark):
    """Two-phase salted quota: exactly two exchanges ((key, salt) then
    key), and BOTH phases' rank filters pushed map-side via
    WindowGroupLimit — the skew-safe shape with bounded second
    shuffle."""
    df = QUERIES["q53_domain_quota"].fn(spark, SF_DIR)
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 2, plan
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "EvalPython" not in plan, plan


def test_q63_contamination_corpus_never_shuffles(spark):
    # The corpus stream must flow Scan → Generate → BroadcastHashJoin
    # (eval grams broadcast) with the ONLY non-broadcast exchanges
    # being (a) the eval side's benchmark-sized distinct and (b) the
    # per-doc aggregation of HIT rows. No corpus-sized exchange.
    df = _q(spark, "q63_contamination_check")
    s = explain_str(df, "simple")
    assert "BroadcastExchange" in s, s
    # exactly 2 shuffle exchanges: eval-gram distinct + hit-row agg
    assert count_exchanges(df) == 2, s
    assert "EvalPython" not in s, "shingling must stay JVM-side"


def test_fingerprint_tokenization_outside_lambda(spark):
    # q22's O(n-squared) regression class: a computed array referenced
    # INSIDE a HOF lambda body is re-evaluated per element (the split
    # re-ran once per token position until round 6). Pin: the single
    # split() in the optimized plan is transform's INPUT — it appears
    # BEFORE the first lambdafunction, never inside one — and the path
    # stays JVM-only.
    df = _q(spark, "q22_fingerprint")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan
    assert plan.index("split(") < plan.index("lambdafunction("), plan
    assert "EvalPython" not in explain_str(df, "simple")


def test_dedup_lines_split_outside_lambda(spark):
    # Same pin for the line-dedup fold (functions.text.dedup_lines,
    # checked in isolation — q61 has sibling metric expressions with
    # their own splits): the newline split feeds aggregate() as
    # input; the lambdas probe only lambda variables.
    from dataflow_python_etl_spark.functions.text import dedup_lines

    df = spark.createDataFrame([("a\nb",)], "text string").select(
        dedup_lines("text").alias("cleaned")
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.index("split(") < plan.index("lambdafunction("), plan
    # every lambda body references only lambda-bound variables, never
    # the input column (re-evaluation-per-element shape)
    import re

    for body in re.findall(r"lambdafunction\((.*?), lambda", plan):
        assert "text#" not in body, body


def test_shard_manifest_one_exchange_no_python(spark):
    """q107: shard accounting is ONE hash aggregate on shard_id —
    one exchange of ≤ n_shards partial rows per task, all JVM."""
    df = _q(spark, "q107_shard_manifest")
    assert count_exchanges(df) == 1
    assert "EvalPython" not in explain_str(df)


def test_event_cadence_single_user_exchange(spark):
    """q112: the lag window and the bucket aggregate cost one
    user-keyed exchange plus the bounded-key-space agg exchange."""
    df = _q(spark, "q112_event_cadence")
    assert count_exchanges(df) == 2
    assert "EvalPython" not in explain_str(df)


def test_seasonal_outliers_fact_never_shuffles_on_data_key(spark):
    """q109: bucket stats broadcast back — the only exchanges are
    the bucket-stat partial agg and the final (grp, dow) rollup,
    both collapsing map-side to bounded key spaces."""
    df = _q(spark, "q109_seasonal_outliers")
    assert has_broadcast_join(df)
    assert "EvalPython" not in explain_str(df)


def test_stickiness_spine_join_is_broadcast_equality(spark):
    """q114: the 7x-exploded (user, day) frame joins the day spine by
    EQUALITY against a BROADCAST — never a |user-days| x |spine|
    nested-loop range join, which is the naive spelling's plan."""
    df = _q(spark, "q114_stickiness")
    s = explain_str(df)
    assert has_broadcast_join(df)
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert count_exchanges(df) == 6, s
    assert "EvalPython" not in s


def test_order_consistency_two_exchanges(spark):
    """q115: the lineitem rollup's one orderkey exchange plus the
    1-row summary agg; the header side broadcasts."""
    df = _q(spark, "q115_order_consistency")
    assert count_exchanges(df) == 2
    assert has_broadcast_join(df)
    assert "EvalPython" not in explain_str(df)


def test_join_key_skew_bounded_topk(spark):
    """q116: heavy-key diagnostic is a hash agg on the join key, a
    1-row totals broadcast, and a distributed TakeOrdered — no global
    sort exchange of the full key histogram."""
    df = _q(spark, "q116_join_key_skew")
    s = explain_str(df)
    assert count_exchanges(df) == 3, s
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in s, s
    assert "EvalPython" not in s


def test_fastest_paths_fact_scanned_once(spark):
    """q117: Bellman-Ford rounds relax the |types|^2 edge table —
    the edge derivation (the only fact-sized work) is behind a
    REGISTERED persist, so each round's broadcast reads the cache,
    not k re-scans of events. Explain still prints the cached
    subtree's lineage inside every InMemoryRelation block, so the
    pin is the cache wiring itself; persist semantics give the
    one-materialization runtime property."""
    df = _q(spark, "q117_fastest_paths")
    s = explain_str(df)
    assert "InMemoryTableScan" in s, s
    assert "CartesianProduct" not in s
    assert "EvalPython" not in s


def test_snapshot_diff_single_join_then_one_row(spark):
    """q118: table_diff is ONE full-outer key join (two side shuffles)
    collapsing straight into the 1-row summary agg — no second pass
    over either snapshot, no Python."""
    df = _q(spark, "q118_snapshot_diff")
    assert count_exchanges(df) == 3
    assert "EvalPython" not in explain_str(df)


def test_user_growth_windows_over_days_not_rows(spark):
    """q119: the only global-order window runs AFTER the per-day
    collapse (<= |days| rows): user min-agg, day agg, day-frame
    window — three exchanges, the last over a bounded frame."""
    df = _q(spark, "q119_user_growth")
    assert count_exchanges(df) == 3
    assert "EvalPython" not in explain_str(df)


def test_entry_conversion_shares_user_exchange(spark):
    """q120: session flag, running index, entry rank, and per-session
    rollup all subset-cluster on the ONE user-keyed exchange; the
    only other exchange is the |types|-keyed final agg."""
    df = _q(spark, "q120_entry_conversion")
    assert count_exchanges(df) == 2
    assert "EvalPython" not in explain_str(df)


def test_kmv_overlap_truncates_map_side(spark):
    """q121: the row_number <= k rank plans as a WindowGroupLimit, so
    each map task ships at most k hashes per set — a billion-member
    audience costs k rows per task; distinct + rank + 2-row combine
    = three exchanges."""
    df = _q(spark, "q121_kmv_audience_overlap")
    s = explain_str(df)
    assert "WindowGroupLimit" in s, s
    assert count_exchanges(df) == 3
    assert "EvalPython" not in s


def test_feed_freshness_broadcast_now_two_exchanges(spark):
    """q122: the 1-row corpus-max instant broadcasts onto the one
    group-keyed aggregate."""
    df = _q(spark, "q122_feed_freshness")
    assert count_exchanges(df) == 2
    assert has_broadcast_join(df)
    assert "EvalPython" not in explain_str(df)


def test_daily_series_fact_collapses_before_spine(spark):
    """q123/q125: the fact table collapses map-side onto (group, day)
    in ONE exchange; spine explode, lag window, and rollup run on
    day-spine-sized frames (the spine join broadcasts)."""
    for name in ("q123_daily_autocorrelation", "q125_seasonal_naive_backtest"):
        df = _q(spark, name)
        assert count_exchanges(df) == 2, name
        assert has_broadcast_join(df), name
        assert "EvalPython" not in explain_str(df), name


def test_segment_mode_rolls_up_before_window(spark):
    """q124: the argmax window runs on the |segments|x|priorities|
    rollup (WindowGroupLimit truncates map-side), never the fact."""
    df = _q(spark, "q124_segment_mode_priority")
    s = explain_str(df)
    assert count_exchanges(df) == 2
    assert "WindowGroupLimit" in s, s
    assert "EvalPython" not in s


def test_cms_join_size_no_key_shuffle_for_estimate(spark):
    """q127: the sketch side is a map-side explode + bounded d×w agg;
    no corpus-keyed shuffle anywhere except the exact-comparison
    side the query deliberately carries."""
    df = _q(spark, "q127_cms_join_size")
    assert "EvalPython" not in explain_str(df)
    assert count_exchanges(df) == 5


def test_timedecay_attribution_matches_multitouch_shape(spark):
    """q129: same plan skeleton as q113 (shared journey-numbering
    construction) — branching lineage re-reads the pruned scan per
    branch but every exchange clusters on the user key; a shape
    regression in either shows up as a count drift between them."""
    a = _q(spark, "q113_multitouch_attribution")
    b = _q(spark, "q129_timedecay_attribution")
    assert count_exchanges(b) == count_exchanges(a) == 9
    assert "EvalPython" not in explain_str(b)


def test_growth_accounting_single_fact_exchange(spark):
    """q130: repartition(user) feeds BOTH the (user, week) dedup agg
    (hash(u) subset-clusters (u, wk)) and the lag/lead window, so the
    fact crosses exactly one exchange; the other two are the
    |user-weeks|-sized week rollup and the |weeks|-sized horizon
    window. The ledger explode means no branch recomputes the
    fact-sized upstream (no second scan of events)."""
    df = _q(spark, "q130_growth_accounting")
    e = explain_str(df)
    assert count_exchanges(df) == 3
    assert "EvalPython" not in e
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", e)) == 1, e


def test_association_rules_cached_baskets_no_python(spark):
    """q131: every branch (pairs, item counts, basket total) reads the
    REGISTERED basket cache — InMemoryTableScan in plan (the q117
    pin shape; explain re-prints cached lineage so scan counts lie),
    and the whole rule pipeline is JVM-side."""
    from dataflow_python_etl_spark.operators.dedup import unpersist_all

    df = _q(spark, "q131_association_rules")
    e = explain_str(df)
    assert "InMemoryTableScan" in e, e
    assert "EvalPython" not in e
    unpersist_all()


def test_top_paths_truncates_map_side_two_exchanges(spark):
    """q132: the rn <= n filter plans as a PARTIAL WindowGroupLimit
    (each map task ships n rows per user before the shuffle); the
    per-user assembly reuses the window's user exchange, so the plan
    holds two exchanges: user, then path."""
    df = _q(spark, "q132_top_paths")
    e = explain_str(df)
    assert "WindowGroupLimit" in e, e
    assert count_exchanges(df) == 2, e
    assert "EvalPython" not in e
    assert "TakeOrdered" in e, e


def test_knn_classify_broadcasts_queries_corpus_unshuffled(spark):
    """q133: the corpus streams through the broadcast score stage
    exactly as q27; everything after the top-k is queries*k-sized.
    Three exchanges total (top-k window, vote agg, argmax window),
    none fact-sized beyond the first."""
    df = _q(spark, "q133_knn_classify")
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 3, explain_str(df, "simple")
    assert "EvalPython" not in explain_str(df)


def test_trend_slope_two_exchanges(spark):
    """q134: one map-side-combined (group, day) rollup — the only
    fact-sized exchange — then a |groups|-keyed sum pass."""
    df = _q(spark, "q134_trend_slope")
    assert count_exchanges(df) == 2, explain_str(df, "simple")
    assert "EvalPython" not in explain_str(df)


def test_m4_downsample_single_series_bucket_exchange(spark):
    """q139: bounds broadcast + ONE (series, bucket) exchange shared
    by both row_number windows and the final agg (plus the 1-row
    bounds agg's own singleton exchange)."""
    df = _q(spark, "q139_m4_downsample")
    e = explain_str(df)
    assert "EvalPython" not in e
    # exchanges: fact->(series,bucket) once; bounds agg singleton
    assert count_exchanges(df) <= 2, explain_str(df, "simple")


def test_audio_containment_decode_map_side_pairs_jvm(spark):
    """q152: the ONLY Python stages are the two Arrow-batched
    mapInPandas kernels (corpus synthesis + CDC segmenting — real
    decode is the public-knowledge constraint); everything after the
    (id, hash) fan-out is JVM — no row-at-a-time EvalPython — and the
    pair search is the shared-hash equi-join, never a cartesian."""
    df = _q(spark, "q152_audio_containment_pairs")
    s = explain_str(df, "simple")
    # MapInPandas counts are inflated by re-printed persisted subtrees
    # (round-6 pitfall) — pin presence + absence of the slow paths
    assert "MapInPandas" in s
    assert "EvalPython" not in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s
    n = count_exchanges(df)
    assert n <= 10, f"pair pipeline grew extra shuffles: {n}\n{s[:2000]}"


def test_pq_grid_codes_pure_map_plan(spark):
    """q154 is a pure map-side projection: zero exchanges, no Python,
    and the scan prunes to the two needed columns."""
    df = _q(spark, "q154_pq_grid_codes")
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 0, plan
    assert "EvalPython" not in plan
    cols = read_schema_columns(df)
    assert "vec_id" in cols and "embedding" in cols and "label" not in cols


def test_dsir_weight_join_broadcasts(spark):
    """q156's <=B-row weight table must broadcast back onto the
    (id, bucket) counts — the corpus-sized side never shuffles for
    the join — and the whole plan stays JVM-side."""
    df = _q(spark, "q156_dsir_selection")
    plan = explain_str(df, "simple")
    assert has_broadcast_join(df), plan
    assert "EvalPython" not in plan


def test_k_core_query_stays_jvm(spark):
    """q155's peel rounds are localCheckpointed leaves, but the final
    round's degree agg + convergence guard must still be a JVM plan
    (raise_error lives in a FILTER, never a prunable projection)."""
    df = _q(spark, "q155_k_core")
    plan = explain_str(df, "simple")
    assert "EvalPython" not in plan
    assert "Filter" in plan and "raise_error" in plan, plan


def test_html_extract_rule_chain_evaluated_once(spark):
    """q157 derives text/n_lines/n_chars from ONE evaluation of the
    13-step regexp chain behind a one-element explode — a Generate
    boundary CollapseProject cannot merge through (the measured
    N-sibling re-evaluation pitfall put 3x the hottest expression on
    every row before). The script|style rule carries the token twice
    WITHIN one pattern (open + close tag alternation), so a single
    chain evaluation shows exactly 2 occurrences in the optimized
    plan (the old triple-sibling shape showed 6), inside a Generate."""
    df = _q(spark, "q157_html_extract")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("script|style") == 2, plan.count("script|style")
    assert "Generate" in plan


def test_core_communities_query_stays_jvm(spark):
    """q160's peel + flood + modularity arithmetic is all Catalyst:
    no EvalPython anywhere, and the modularity floor divisions stay
    integer (no cast to double sneaks in via pow())."""
    df = _q(spark, "q160_core_communities")
    plan = explain_str(df, "simple")
    assert "EvalPython" not in plan
    assert "POWER" not in plan.upper() and "pow(" not in plan


def test_quality_classifier_weight_join_broadcasts(spark):
    """q161's <=B+1-row weight table must broadcast onto the
    (id, bucket) gram counts at BOTH fit margins and frozen scoring
    (the corpus-sized side never shuffles for the join), and the
    whole fit+score plan stays JVM — the trainer is Catalyst
    aggregates, not a Python loop."""
    df = _q(spark, "q161_quality_classifier")
    plan = explain_str(df, "simple")
    assert has_broadcast_join(df), plan
    assert "EvalPython" not in plan
    # the int64 margin guard is filter-anchored (a dead projected
    # column would be pruned and the check would silently vanish)
    assert "raise_error" in plan and "Filter" in plan, plan


def test_mojibake_repair_pure_map_plan(spark):
    """q162 is plant -> corrupt -> repair, all literal replace chains:
    zero exchanges, no regex fallback to Python, scan pruned to the
    two needed columns."""
    df = _q(spark, "q162_mojibake_repair")
    plan = explain_str(df, "simple")
    assert count_exchanges(df) == 0, plan
    assert "EvalPython" not in plan
    cols = read_schema_columns(df)
    assert "doc_id" in cols and "text" in cols and "lang" not in cols


def test_ann_recall_probes_are_partition_pruned(spark):
    """q163's three index probes must reach the inverted files as
    cid partition filters (file-listing-level pruning — the whole
    point of the persisted IVF layout), and recall arithmetic stays
    JVM."""
    df = _q(spark, "q163_ann_recall")
    plan = final_plan_str(df)
    assert "EvalPython" not in plan
    assert "PartitionFilters" in plan, plan
    pruned = [
        seg[:200] for seg in plan.split("PartitionFilters")[1:]
        if "cid" in seg[:200]
    ]
    assert len(pruned) >= 3, plan  # fp64 + sq8 + pq probes all pruned
    # r11-optimization shape pins (VERDICT r11 #5): the contract-
    # bounded broadcast hints keep every recall hit-join a BHJ (the
    # before-shape was 12 SortMergeJoins / 48 Exchanges), and the
    # exact brute-force baseline + shared probe frame are CACHED —
    # consumed from InMemoryTableScan, not re-derived per union branch
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, plan
    assert "InMemoryTableScan" in final, plan


def test_erasure_rewrite_scans_once_and_broadcasts_keys(spark, tmp_path):
    """q166 / operators.erasure: the kept-frame rewrite behind every
    index erasure is ONE FileScan of the derived surface with the
    request-sized key set BROADCAST onto it (at 100 TB the surface
    never re-shuffles for a deletion batch), audit counts riding the
    write via Observation — and the whole plan stays JVM."""
    from dataflow_python_etl_spark.operators.erasure import _kset, _observed_kept

    p = str(tmp_path / "t")
    spark.range(1000).selectExpr("id AS doc_id", "id % 5 AS dl").write.parquet(p)
    keys = spark.createDataFrame([(3,), (7,)], "doc_id: long")
    kept, _obs = _observed_kept(
        spark.read.parquet(p), "doc_id", _kset(keys, "doc_id"), "pin"
    )
    plan = final_plan_str(kept)
    # an executed AQE dump prints Final AND Initial plans — count
    # inside the final section only (the round-6 double-count pitfall)
    final = plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in final
    assert final.count("FileScan parquet") == 1, plan
    # static estimate picks SMJ; AQE measures the key set and
    # broadcasts — the property forget_keys' docstring promises
    assert "BroadcastHashJoin" in final, plan


def test_ann_rerank_refine_scan_pruned_and_id_pushed(spark):
    """q167's two-stage probe: the refine scan must stay
    partition-pruned to the SAME probed cells as the coarse stage AND
    push the driver-bounded shortlist ids into the parquet scan
    (row-group skipping — the columnar analog of id-keyed refinement
    fetch). Per-query cost stays independent of corpus size even with
    the second stage; everything JVM."""
    df = _q(spark, "q167_ann_recall_reranked")
    plan = final_plan_str(df)
    assert "EvalPython" not in plan
    pushed = [seg[:500] for seg in plan.split("PushedFilters: ")[1:]]
    assert any("In(neighbor_id" in s for s in pushed), plan
    pruned = [
        seg[:200] for seg in plan.split("PartitionFilters")[1:]
        if "cid" in seg[:200]
    ]
    assert len(pruned) >= 2, plan  # the pq probe AND the refine scan
    # r11-optimization shape pins (VERDICT r11 #5): one cached k=R
    # coarse probe serves the pq variant (rk <= K prefix), the
    # shortlist, and the rerank stage — no SortMergeJoin anywhere
    # (before: 8), and the cached frames read from InMemoryTableScan
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final, plan
    assert "InMemoryTableScan" in final, plan


def test_ivf_ann_assignment_cached_and_norm_folded_once(spark):
    """q39's r11 shape: the centroid-assignment frame feeds both join
    sides from a REGISTERED cache (InMemoryTableScan — uncached, the
    whole assignment map ran twice per action), the corpus-side L2
    norm is folded ONCE per row and reused by all centroid cosines
    (the plan must not contain more norm-fold aggregates than rows
    of the centroid literal + the pair stage), and the query side
    broadcasts."""
    df = _q(spark, "q39_ivf_ann")
    plan = explain_str(df)
    assert "InMemoryTableScan" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan
