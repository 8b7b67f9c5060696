"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan,
2005) over a token stream, built with the repo's PORTABLE hash family
(md5-derived, engine-reproducible) so sketch contents — not just
estimates — are bit-identical across engines and runs.

Why a sketch when exact counts are one groupBy away: the sketch is
d×w integers REGARDLESS of vocabulary size, mergeable by cell-wise
addition — the shape that survives streaming checkpoints, cross-
shard unions, and driver collection at 100 TB, where the exact
vocabulary table does not. Estimates overcount only (never under),
with error ≤ 2N/w at probability 1 − (1/2)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_python_etl_spark.functions.text import md5_hash60


def _cell(col, row: int, width: int):
    """Deterministic column index of ``col`` in sketch row ``row``."""
    return F.pmod(
        md5_hash60(F.concat(F.lit(f"cms-r{row}:"), col)), F.lit(width)
    ).cast("int")


def count_min_sketch(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: ``(row, col, cnt)`` with exactly the cells
    that are non-zero (a dense d×w materialization is pointless in a
    DataFrame). ONE explode of depth d per item row plus a map-side-
    combined sum — shuffle volume is bounded by d×w per partition,
    never the item count. Merging two sketches is
    ``union().groupBy(row, col).sum(cnt)``."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cell(F.col(item_col), r, width).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("rc")
    return (
        items.select(rows, wcol.alias("w"))
        .groupBy("rc.row", "rc.col")
        .agg(F.sum("w").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(item, est): Count-Min point estimates — min over rows of the
    probed cells. The probe set explodes to |probes|×d lookups joined
    against the sketch (broadcastable: the sketch is ≤ d×w rows by
    construction — THE point of sketching); absent cells read 0."""
    lookups = probes.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cell(F.col(item_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "rc.row", "rc.col")
    return (
        lookups.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter: the mergeable membership sketch (Bloom, 1970)
# ---------------------------------------------------------------------------


def _bloom_bit(col, h: int, n_bits: int):
    """Deterministic bit position of ``col`` under hash ``h`` — the
    same portable md5 construction as the Count-Min cells, so filter
    CONTENTS are bit-identical across engines and runs."""
    return F.pmod(
        md5_hash60(F.concat(F.lit(f"bloom-h{h}:"), col)), F.lit(n_bits)
    ).cast("int")


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    n_bits: int = 131_072,
    n_hashes: int = 5,
) -> DataFrame:
    """Build the filter as its SET bit positions, one ``(bit)`` row
    each — ≤ ``n_bits`` rows regardless of item count (the sketch
    shape that broadcasts at 100 TB where the member table cannot).
    One explode of ``n_hashes`` per item + a distinct; merging two
    filters is ``union().distinct()``. False-positive rate ≈
    (1 − e^(−k·n/m))^k — size m for the expected member count.

    The canonical uses: semi-join pruning (probe a 100 TB fact scan
    against a broadcast filter of the dim keys BEFORE the shuffle)
    and the streaming-ingest "definitely new" fast path.
    """
    if n_bits < 2 or n_hashes < 1:
        raise ValueError(f"need n_bits >= 2, n_hashes >= 1, got {n_bits}/{n_hashes}")
    bits = F.explode(
        F.array(
            *[_bloom_bit(F.col(item_col), h, n_bits) for h in range(n_hashes)]
        )
    )
    return items.select(bits.alias("bit")).distinct()


def bloom_might_contain(
    probes: DataFrame,
    bloom: DataFrame,
    item_col: str = "item",
    n_bits: int = 131_072,
    n_hashes: int = 5,
) -> DataFrame:
    """(item, might_contain) per DISTINCT probe value: true iff ALL
    ``n_hashes`` bit positions are set — no false negatives, false
    positives at the sized rate. The filter side broadcasts (≤ n_bits
    rows by construction); the probe stream explodes ×k and reduces
    with one map-side-combined count — nothing probe-sized shuffles
    twice. Parameters must match the build (same contract as the
    Count-Min probe)."""
    lookups = probes.select(F.col(item_col).alias("item")).distinct().select(
        "item",
        F.explode(
            F.array(
                *[_bloom_bit(F.col("item"), h, n_bits) for h in range(n_hashes)]
            )
        ).alias("bit"),
    )
    marked = bloom.select("bit", F.lit(1).alias("__set"))
    return (
        lookups.join(F.broadcast(marked), ["bit"], "left")
        .groupBy("item")
        .agg((F.count(F.col("__set")) == n_hashes).alias("might_contain"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog: the mergeable distinct-count sketch (Flajolet et al., 2007)
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    items: DataFrame,
    item_col: str = "item",
    group_cols: tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """HLL register table ``(*group_cols, bucket, rho)``: bucket = the
    low ``p`` bits of the portable 60-bit md5 hash, rho = leading-zero
    count of the remaining ``60-p`` bits + 1, max'd per bucket — at
    most ``2^p`` rows per group REGARDLESS of item count. Merging two
    sketches is ``union().groupBy(bucket).max(rho)``; contents are
    bit-identical across engines (md5 hashing, integer bit math via
    ``bin()`` string length — no platform clz intrinsic), so the q89
    oracle reproduces the registers, not just the estimate."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    h = md5_hash60(F.col(item_col))
    w = F.shiftright(h, p)  # exact: h < 2^60, top 60-p bits
    rho = F.when(w == 0, F.lit(61 - p)).otherwise(
        F.lit(61 - p) - F.length(F.bin(w))
    ).cast("int")
    return (
        items.select(
            *group_cols,
            F.pmod(h, F.lit(m)).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """(*group_cols, est): the raw HLL estimate ``α·m²/Σ2^(−M_j)``,
    computed in EXACT integer arithmetic — each register contributes
    ``2^(T−rho)`` (T = 61−p, so terms are integers up to 2^T; the sum
    fits int64 through p ≥ 4) and absent buckets contribute ``2^T``
    (rho = 0) via one count — then ONE double division by the literal
    numerator, rounded to 3 places. Exact-integer-until-one-division
    is the same cross-engine hash-stability construction as the
    rolling-anomaly moments (docs/SCALE.md): no float summation
    order anywhere. Raw estimator only — the small-range linear-
    counting branch needs ``ln``, whose last-ulp behavior is engine-
    private; size ``p`` so the expected cardinality sits in the raw
    regime (n ≳ 2.5·2^p), where HLL's ±1.04/√m error holds."""
    m = 1 << p
    t_max = 61 - p
    num = _hll_alpha(m) * m * m * float(2**t_max)
    term = F.pow(F.lit(2.0), F.lit(t_max) - F.col("rho")).cast("long")
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.sum(term).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            *group_cols,
            F.round(
                F.lit(num)
                / (
                    F.col("__s")
                    + (F.lit(m) - F.col("__n")) * F.lit(2**t_max).cast("long")
                ),
                3,
            ).alias("est"),
        )
    )


def streaming_count_min(
    item_stream: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`count_min_sketch` — and deliberately
    the SAME plan. Because the sketch is a pure cell explode + keyed
    integer sum, its live twin is a NATIVE streaming aggregation: the
    state store holds exactly the ≤ d×w non-zero cells (longs), every
    micro-batch folds in by cell-wise addition — the sketch's
    mergeability IS the streaming-state contract, no custom stateful
    operator needed. Run the sink in ``complete`` mode (re-emitting
    the whole sketch is sketch-sized by construction — the point of
    sketching) or ``update`` for changed cells only. Cross-batch
    result ≡ the batch sketch over the union of all drops
    (parity-pinned in tests); contents stay bit-identical to the
    DuckDB oracle's because the portable md5 cell hash is shared.
    """
    return count_min_sketch(
        item_stream, item_col=item_col, depth=depth, width=width,
        weight_col=weight_col,
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-``k`` heavy hitters by Count-Min estimate — ``(item, est)``
    ordered by ``(est DESC, item)``. The sketch-side answer to "what
    dominates the stream": estimates OVERCOUNT only, so every true
    heavy hitter is guaranteed to appear with ``est ≥`` its true
    count — the sketch can promote a light item, never hide a heavy
    one (verify promotions with one exact semi-joined count when it
    matters).

    The item stream feeds the sketch build AND the distinct probe set,
    so it goes through ``register_cache`` (one materialization, two
    consumers). Probe cost is VOCABULARY×depth lookups against the
    broadcast ≤ d×w sketch — at 100 TB the stream is unbounded but the
    probe side is the vocabulary, and the top-k is a TakeOrdered, not
    a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from dataflow_python_etl_spark.operators.dedup import register_cache

    its = register_cache(items.select(F.col(item_col).alias("item")))
    sketch = count_min_sketch(its, depth=depth, width=width)
    est = cms_estimate(sketch, its.distinct(), depth=depth, width=width)
    return est.orderBy(F.col("est").desc(), F.col("item")).limit(k)


def streaming_hll_registers(
    item_stream: DataFrame,
    item_col: str = "item",
    group_cols: tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """Streaming twin of :func:`hll_registers` — the same plan, for
    the same reason as :func:`streaming_count_min`: the register table
    is a pure hash projection + keyed MAX, which is a native streaming
    aggregation. State = at most ``2^p`` ints per group in the state
    store; each micro-batch folds in by register-wise max — the HLL
    merge law IS the streaming-state update. ``complete`` mode re-emits
    the (sketch-sized) register table; feed it to
    :func:`hll_estimate` batch-side for the live distinct count.
    Cross-batch parity with the batch registers over the union of all
    drops is pinned in tests.
    """
    return hll_registers(item_stream, item_col=item_col, group_cols=group_cols, p=p)

# --- KMV (k-minimum-values) distinct & overlap sketch ---------------------
#
# Bar-Yossef et al. 2002 / Beyer et al. 2007 ("distinct sampling"):
# keep the k SMALLEST hash values of a set; the k-th smallest R_k
# estimates cardinality as (k-1)·M/R_k (M = hash domain), and two
# sketches support set-algebra estimates (union/intersection/Jaccard)
# that neither Count-Min nor HLL can give without per-pair sketches.
# Built on the portable 60-bit md5 hash, a KMV sketch is a
# DETERMINISTIC function of the set — contents are bit-identical
# across engines/runs, so the oracle reproduces the sketch itself.

KMV_DOMAIN = 16**15  # md5_hash60 range: [0, 2^60)


def kmv_sketches(
    df: DataFrame,
    set_col: str,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-set KMV sketch: ``(set_id, hashes)`` where ``hashes`` is
    the ASCENDING array of the ≤ k smallest DISTINCT portable hashes
    of the set's keys. One distinct exchange on (set, hash) — the
    HASH VALUE is the identity, so a re-seen key collapses (what
    makes :func:`refresh_kmv_agg`'s merge ≡ full-data sketch EXACT,
    not just collision-improbable) and two distinct keys colliding
    in 60 bits collapse too (KMV's sample-of-distinct-hashes
    semantics; ~k²/2⁶¹ estimate effect). Then a ``row_number() <= k``
    rank — which plans as a PARTIAL WindowGroupLimit, truncating
    each map task to k rows BEFORE the shuffle (the repo's free-
    skew-protection shape), so a set of any size ships at most k
    hashes per task. The collected array is ≤ k longs per set by
    construction — THE point of sketching."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = (
        df.select(F.col(set_col).alias("set_id"), F.col(key_col).alias("__k"))
        .select("set_id", md5_hash60(F.col("__k").cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("set_id").orderBy("h")
    return (
        h.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy("set_id")
        .agg(F.array_sort(F.collect_list("h")).alias("hashes"))
    )


def dec38(c):
    """The decimal lift that accompanies :func:`_int_div` whenever an
    integer PRODUCT can brush int64 (the sums fit, their products
    don't): one definition so a precision change lands everywhere."""
    return c.cast("decimal(38,0)")


def _int_div(a, b):
    """Exact integer division of two long columns whose quotient may
    exceed 2^53: route through DECIMAL(38,0) so no double rounding
    ever occurs (numerator is made exactly divisible first). ANSI
    mode is on in Spark 4 — callers guarantee b > 0."""
    an = (a - F.pmod(a, b)).cast("decimal(38,0)")
    return (an / b.cast("decimal(38,0)")).cast("long")


def _kmv_est_int(hashes_col, k: int):
    """Distinct-count estimate from a KMV hash array, ALL-INTEGER:
    exact size when unsaturated (< k hashes means every distinct key
    is in the sketch), else ``(k-1) * (M div R_k)`` with R_k the
    largest retained hash. Overflow-free by construction — R_k is
    >= k-1 (k distinct non-negative hashes), so the product is <= M;
    the floor costs <= (k-1)/R_k relative error, negligible exactly
    when the estimator is in regime (R_k << M). R_k >= k-1 >= 1 also
    rules out division by zero."""
    rk = F.element_at(hashes_col, -1)
    m = F.lit(KMV_DOMAIN).cast("long")
    return F.when(
        F.size(hashes_col) < k, F.size(hashes_col).cast("long")
    ).otherwise(F.lit(k - 1).cast("long") * _int_div(m, rk))


def kmv_overlap(
    df: DataFrame,
    set_col: str,
    key_col: str,
    set_a,
    set_b,
    k: int = 256,
) -> DataFrame:
    """Audience-overlap report between two keyed sets, sketch-only:
    one row ``(k, est_a, est_b, est_union, n_common, jaccard_ppm)``.

    The union sketch is the k smallest of the MERGED hash arrays
    (KMV's merge law: kmv(A ∪ B) = k-min(kmv(A) ∪ kmv(B)), pinned in
    tests); the Jaccard estimate is the fraction of the union
    sketch's members present in BOTH input sketches (Beyer et al.'s
    intersection-over-sketch), in positive-operand integer ppm.
    Everything after the two per-set sketches is array math on a
    2-row frame. At 100 TB the cost is the sketches' one distinct
    exchange; the combine is constant-size."""
    sk = kmv_sketches(
        df.where(F.col(set_col).isin([set_a, set_b])), set_col, key_col, k
    )
    empty = F.array().cast("array<long>")
    # a set absent from df entirely is a legal empty audience — its
    # sketch is the empty array, not NULL (NULL would poison every
    # downstream array op and the report row)
    both = sk.groupBy().agg(
        F.coalesce(
            F.max(F.when(F.col("set_id") == set_a, F.col("hashes"))), empty
        ).alias("a"),
        F.coalesce(
            F.max(F.when(F.col("set_id") == set_b, F.col("hashes"))), empty
        ).alias("b"),
    )
    u = F.slice(F.array_sort(F.array_union(F.col("a"), F.col("b"))), 1, k)
    common = F.array_intersect(F.array_intersect(u, F.col("a")), F.col("b"))
    return both.select(
        F.lit(k).alias("k"),
        _kmv_est_int(F.col("a"), k).alias("est_a"),
        _kmv_est_int(F.col("b"), k).alias("est_b"),
        _kmv_est_int(u, k).alias("est_union"),
        F.size(common).cast("long").alias("n_common"),
        F.when(F.size(u) == 0, F.lit(0).cast("long")).otherwise(
            _int_div(
                F.size(common).cast("long") * F.lit(1_000_000).cast("long"),
                F.size(u).cast("long"),
            )
        ).alias("jaccard_ppm"),
    )


def cms_self_join_size(sketch: DataFrame) -> DataFrame:
    """Self-join-size / F2 estimate from a Count-Min sketch: one row
    ``(est_pairs)`` = min over sketch rows of Σ_col cnt² (the
    AMS-style second frequency moment read off CMS cells, Alon-
    Matias-Szegedy 1996 via Cormode & Muthukrishnan 2005). This IS
    the pre-flight for ``a JOIN b ON k = k`` self-joins: Σ_k f(k)²
    is exactly the row count such a join produces, and the sketch
    answers it in d×w integers without grouping the key — the
    companion to :func:`~dataflow_python_etl_spark.operators.profile.
    join_key_skew`, which exactifies the top-k keys AFTER this says
    the join is dangerous. Overcounts only (hash collisions add
    cross terms, never subtract), so a green estimate is trustworthy.
    Integer arithmetic throughout; per-cell squares need cnt ≲ 3·10⁹
    (beyond that Spark ANSI raises loudly — widen the sketch, which
    also tightens the estimate)."""
    return (
        sketch.groupBy("row")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s"))
        .agg(F.min("s").cast("long").alias("est_pairs"))
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch — HDR-histogram-style base-2 grid
# (Tene's HdrHistogram bucketing, re-expressed as pure integer
# Catalyst expressions). The missing member of the sketch family:
# CMS answers frequency, Bloom membership, HLL/KMV distinct — this
# answers "p99 latency / length distribution" as a maintainable MV.
# ---------------------------------------------------------------------------

QSK_PRECISION = 7  # sub-bucket bits: relative error <= 2^-7 (~0.8%)


def _qsk_shift(v, p: int):
    """How many low bits the grid discards for value ``v``: 0 while
    v < 2^(p+1) (bucket = exact value), else bitlen(v)-1-p. Bit
    length via ``length(bin(v))`` — pure integer/string ops that
    Spark and DuckDB evaluate identically (no engine-private log)."""
    return F.greatest(F.lit(0), (F.length(F.bin(v)) - F.lit(1 + p)).cast("int"))


def quantile_bucket(col, precision_bits: int = QSK_PRECISION):
    """Deterministic bucket id for a NON-NEGATIVE long: with
    ``s = max(0, bitlen(v)-1-p)``, ``bucket = (s << p) + (v >> s)``.
    Values below 2^(p+1) map to themselves (exact); above, the top
    p+1 bits index a linear subdivision of each power-of-two range —
    monotone in v, contiguous across ranges, relative bucket width
    <= 2^-p. A pure function of the value: sketch contents are
    bit-identical across engines, partitionings, and runs."""
    p = int(precision_bits)
    v = col.cast("long")
    s = _qsk_shift(v, p)
    # variable shift amounts: the PySpark wrappers only accept
    # literal ints, but the underlying SQL functions take expressions
    return F.shiftleft(s.cast("long"), p) + F.call_function("shiftright", v, s)


def quantile_bucket_lo(bucket, precision_bits: int = QSK_PRECISION):
    """Inverse of :func:`quantile_bucket`: the smallest value in the
    bucket — ``s = max(0, (bucket >> p) - 1)``, then
    ``(bucket - (s << p)) << s``. The estimator's returned value, so
    estimates are always <= the true quantile and within 2^-p of it
    (accuracy band pinned in tests)."""
    p = int(precision_bits)
    b = bucket.cast("long")
    s = F.greatest(F.lit(0), (F.shiftright(b, p) - F.lit(1)).cast("int"))
    sub = b - F.shiftleft(s.cast("long"), p)
    return F.call_function("shiftleft", sub, s)


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    precision_bits: int = QSK_PRECISION,
) -> DataFrame:
    """Per-group quantile sketch: ``(group..., bucket, cnt)`` — the
    base-2 grid histogram of the NON-NEGATIVE integer measure.
    Bucket count is bounded by construction (<= (64-p)·2^p + 2^(p+1)
    rows per group, ~7.4k at p=7, regardless of data size), counts
    are plain longs, and the whole build is ONE groupBy — map-side
    partial aggregation collapses each task to the bounded bucket
    set before the shuffle, so a 100 TB column ships kilobytes.

    Mergeability is additivity: ``sketch(A) ⊎ sketch(B)`` summed
    per (group, bucket) ≡ ``sketch(A ∪ B)`` exactly (the merge-law
    pin), so :func:`~dataflow_python_etl_spark.operators.upsert.
    refresh_additive_agg` and ``stream_additive_agg_to_table``
    maintain it as a materialized view with no quantile-specific
    code. NULL measures are dropped (absent measurements); negative
    values raise loudly through the repo's filter-anchored
    raise_error pattern — a silent abs() or drop would skew every
    downstream percentile."""
    if not 1 <= int(precision_bits) <= 16:
        raise ValueError(f"precision_bits must be in [1, 16], got {precision_bits}")
    gb = list(group_cols or [])
    missing = [c for c in gb + [value_col] if c not in df.columns]
    if missing:
        raise ValueError(f"columns absent from frame: {missing}")
    v = F.col(value_col).cast("long")
    guarded = (
        df.select(*gb, v.alias("__v"))
        .where(v.isNotNull())
        .where(
            F.when(
                F.col("__v") < 0,
                F.raise_error(
                    F.concat(
                        F.lit("quantile_sketch: negative value "),
                        F.col("__v").cast("string"),
                        F.lit(f" in column {value_col} — the base-2 grid"),
                        F.lit(" is defined for non-negative measures"),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    )
    return (
        guarded.select(
            *gb, quantile_bucket(F.col("__v"), precision_bits).alias("bucket")
        )
        .groupBy(*gb, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def quantile_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    quantiles_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
    precision_bits: int = QSK_PRECISION,
) -> DataFrame:
    """Quantile readout from a sketch: ``(group..., q_ppm, est,
    n_rows)`` — for each requested quantile q (in ppm), the lower
    bound of the bucket containing the rank-``ceil(q·n)`` value
    (the "lower quantile" definition; exact integer rank arithmetic,
    so both engines pick the identical bucket). Two window passes
    over the (bounded-size) sketch share one exchange; the quantile
    fan-out is a literal-array explode. est <= true quantile
    < est·(1 + 2^-p) whenever the true quantile >= 2^(p+1) (below
    that the bucket is the exact value)."""
    gb = list(group_cols or [])
    qs = [int(q) for q in quantiles_ppm]
    if not qs or any(not 0 < q <= 1_000_000 for q in qs):
        raise ValueError(f"quantiles_ppm must be in (0, 1e6], got {quantiles_ppm}")
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(*gb)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*gb)
    c = sketch.select(
        *gb,
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_all).alias("n_rows"),
    )
    e = c.select(
        *gb,
        "bucket",
        "cnt",
        "__cum",
        "n_rows",
        F.explode(F.array(*[F.lit(q).cast("long") for q in qs])).alias("q_ppm"),
    )
    rank = F.expr("(n_rows * q_ppm + 999999) div 1000000")
    return e.where((F.col("__cum") >= rank) & (F.col("__cum") - F.col("cnt") < rank)).select(
        *gb,
        "q_ppm",
        quantile_bucket_lo(F.col("bucket"), precision_bits).alias("est"),
        "n_rows",
    )
