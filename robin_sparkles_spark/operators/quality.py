"""Data-quality / warehouse-maintenance operators (EXT): constraint
validation and column profiling — the audits a 100 TB deployment runs
nightly over its star schema, expressed as shuffle-minimal plans with
exact DuckDB twins.

Determinism rules as registry.py (exact counts, no doubles except
final ratios computed identically in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources import load_table

# (child table, fk column, parent table, pk column) — the star
# schema's declared-but-unenforced foreign keys
FK_PAIRS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit over every FK pair in the star schema: child rows
    whose key has no parent (LEFT ANTI join), as count and rate.

    Parquet enforces nothing; at 100 TB this audit IS the constraint
    system. Plan per pair: ONE pass over the child — LEFT join the
    deduped parent key set (dimension parents broadcast; the one
    fact-fact pair, lineitem→orders, shuffles on the join key) and
    count rows + parent-misses in the same aggregation, so the child
    is never scanned twice (an anti-join + separate count would).
    The per-pair single-row results union into one tiny report. A
    clean pipeline yields orphans=0 rows — the audit's steady-state —
    so the test plants a synthetic violation to prove the detector
    detects (the fixture itself is expected clean)."""
    # r15 (guide §2.4): lineitem carries THREE audited FKs and was
    # scanned once per pair — the dominant pass count at 100 TB (it is
    # the biggest fact table). One shared pass now left-joins all
    # three parent key sets (orders shuffled, part/supplier broadcast
    # — same per-parent strategy as before) and one aggregation emits
    # all three orphan counts, unpivoted via stack into the identical
    # three report rows. Non-lineitem pairs keep the per-pair
    # single-pass detector.
    li_pairs = [p for p in FK_PAIRS if p[0] == "lineitem"]
    reports = [_audit_lineitem_fks(spark, sf_dir, li_pairs)]
    reports += [
        audit_fk_pair(
            load_table(spark, sf_dir, child).select(F.col(fk).alias("k")),
            load_table(spark, sf_dir, parent).select(F.col(pk).alias("k")),
            fk_label=f"{child}.{fk}",
            ref_label=f"{parent}.{pk}",
            # broadcast DIMENSION parents only; the one fact parent
            # (orders, for lineitem.l_orderkey) must shuffle-join —
            # its key set is |orders| and broadcasting it is exactly
            # the 100 TB failure this audit's plan avoids (r5 review
            # catch: the hint was unconditional)
            broadcast_parent=parent != "orders",
        )
        for child, fk, parent, pk in FK_PAIRS
        if child != "lineitem"
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _audit_lineitem_fks(
    spark: SparkSession, sf_dir: str, pairs
) -> DataFrame:
    """All of lineitem's FK audits in ONE pass over lineitem: left
    join each parent's deduped key set (orders shuffle-joined,
    dimensions broadcast — the same per-parent strategy the per-pair
    form used), count rows + per-parent misses in one aggregation,
    unpivot with stack. Emits exactly the rows ``audit_fk_pair``
    emitted for these pairs."""
    child = load_table(spark, sf_dir, "lineitem").select(
        *[F.col(fk).alias(f"k{i}") for i, (_, fk, _, _) in enumerate(pairs)]
    )
    joined = child
    for i, (_, fk, parent, pk) in enumerate(pairs):
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias(f"k{i}"))
            .distinct()
            .withColumn(f"present{i}", F.lit(1))
        )
        if parent != "orders":
            p = F.broadcast(p)
        joined = joined.join(p, f"k{i}", "left")
    aggs = [F.count("*").alias("child_rows")] + [
        F.sum(
            F.when(F.col(f"present{i}").isNull(), 1).otherwise(0)
        ).alias(f"orphans{i}")
        for i in range(len(pairs))
    ]
    wide = joined.agg(*aggs)
    stack_args: list = [F.lit(len(pairs))]
    for i, (c, fk, parent, pk) in enumerate(pairs):
        stack_args += [
            F.lit(f"{c}.{fk}"),
            F.lit(f"{parent}.{pk}"),
            F.col(f"orphans{i}"),
        ]
    return wide.select(
        F.stack(*stack_args).alias("fk", "ref_to", "orphans"),
        "child_rows",
    ).select(
        "fk",
        "ref_to",
        "child_rows",
        "orphans",
        (
            F.col("orphans").cast("double")
            / F.col("child_rows").cast("double")
        ).alias("orphan_rate"),
    )


def audit_fk_pair(
    child_keys: DataFrame,
    parent_keys: DataFrame,
    fk_label: str,
    ref_label: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """One FK pair's single-row audit — the actual detector, factored
    out so tests can run it against a deliberately broken parent set
    (a constant-zero counting bug must fail THIS code path, not a
    reimplementation in the test)."""
    child_keys = child_keys.toDF("k")
    p = parent_keys.toDF("k").distinct().withColumn("present", F.lit(1))
    if broadcast_parent:
        p = F.broadcast(p)
    return (
        child_keys.join(p, "k", "left")
        .agg(
            F.count("*").alias("child_rows"),
            F.sum(F.when(F.col("present").isNull(), 1).otherwise(0)).alias(
                "orphans"
            ),
        )
        .select(
            F.lit(fk_label).alias("fk"),
            F.lit(ref_label).alias("ref_to"),
            "child_rows",
            "orphans",
            (
                F.col("orphans").cast("double") / F.col("child_rows").cast("double")
            ).alias("orphan_rate"),
        )
    )


def _ri_sql() -> str:
    parts = []
    for child, fk, parent, pk in FK_PAIRS:
        parts.append(f"""
SELECT '{child}.{fk}' AS fk, '{parent}.{pk}' AS ref_to,
       (SELECT COUNT(*) FROM {child}) AS child_rows,
       (SELECT COUNT(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{pk} = c.{fk})) AS orphans,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pk} = c.{fk})) AS DOUBLE)
       / CAST((SELECT COUNT(*) FROM {child}) AS DOUBLE) AS orphan_rate""")
    return " UNION ALL ".join(parts)


# columns profiled per table — a representative mix of keys, strings,
# and measures (profiling everything would be a wall of output; a real
# deployment profiles per-table manifests like this one)
PROFILE_COLUMNS = (
    ("orders", "o_custkey"),
    ("orders", "o_totalprice"),
    ("orders", "o_orderstatus"),
    ("lineitem", "l_quantity"),
    ("lineitem", "l_discount"),
    ("customer", "c_acctbal"),
    ("events", "value"),
    ("events", "event_type"),
    ("documents", "n_chars"),
)


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: per profiled column — row count, nulls,
    exact distinct count, and min/max rendered as strings (one
    schema across numeric and string columns). Numeric columns
    aggregate on the NUMERIC value and render the result afterwards
    — MIN(CAST(x AS VARCHAR)) would be lexicographic ('100037.54' <
    '99992.36', a garbage bound the mirrored oracle could not catch;
    an r5 review found exactly that and this order is the fix). The
    render goes through the exact DECIMAL(18,2) cast so both engines
    format identically.

    This is the stats-collection pass an optimizer's CBO or a data
    catalog runs: one aggregation per table (all of a table's columns
    profile in a single pass over the scan — conditional aggregates,
    not one scan per column), outputs union into a 9-row report. The
    exact distinct keeps the oracle bit-tight; production swaps in
    HLL++ per the sketches module's documented trade."""
    by_table: dict[str, list[str]] = {}
    for t, c in PROFILE_COLUMNS:
        by_table.setdefault(t, []).append(c)
    reports = []
    for t, cols in by_table.items():
        df = load_table(spark, sf_dir, t)
        # r16 analysis (VERDICT r15 #8), two findings kept as notes:
        # (a) the VERDICT hypothesis — raw rows crossing the shuffle
        # ×(distinct aggs) — is NOT the plan's behavior: Spark's
        # distinct-rewrite already partial-aggregates (value, gid)
        # groups BELOW the exchange (see the executed plan in
        # plans/r16/column_profile_before.txt), so the shuffle carries
        # distinct values. (b) the real per-table costs are the
        # string-column min/max forcing the first-level aggregate to
        # be SORT-based (var-length agg buffers are not hash-
        # supported) on the single-row-group fixture scans. A hash
        # repartition of the projected scan to the core budget was
        # tried and REVERTED: cold A/B read 2.50/2.28 → 2.88/2.71 s
        # med/min of 4 — the extra exchange of raw profile rows costs
        # more than the parallelized sort saves at every gate scale
        # (at 100 TB the tables split naturally and the fan would be
        # a no-op anyway, so the revert loses nothing at scale).
        aggs = [F.count("*").alias("n_rows")]
        for c in cols:
            is_num = dict(df.dtypes)[c] in ("bigint", "int", "double", "float")

            def render(agg_col):
                return (
                    agg_col.cast("decimal(18,2)").cast("string")
                    if is_num
                    else agg_col
                )

            aggs += [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
                F.countDistinct(c).alias(f"{c}__distinct"),
                render(F.min(F.col(c))).alias(f"{c}__min"),
                render(F.max(F.col(c))).alias(f"{c}__max"),
            ]
        wide = df.agg(*aggs)
        # unpivot the single wide row via stack — the table is scanned
        # ONCE regardless of column count (a union of per-column
        # selects would re-run the aggregation per column: Spark does
        # no common-subtree elimination across union branches)
        stack_args: list = [F.lit(len(cols))]
        for c in cols:
            stack_args += [
                F.lit(f"{t}.{c}"),
                F.col(f"{c}__nulls"),
                F.col(f"{c}__distinct"),
                F.col(f"{c}__min"),
                F.col(f"{c}__max"),
            ]
        reports.append(
            wide.select(
                "n_rows",
                F.stack(*stack_args).alias(
                    "col_name", "n_nulls", "n_distinct", "min_str", "max_str"
                ),
            ).select(
                "col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _profile_sql(spark: SparkSession, sf_dir: str) -> str:
    """Oracle twin; needs the live schema to mirror the numeric-cast
    decision, so it is a lazy (sf_dir → SQL) callable resolved at
    gate time."""
    by_table: dict[str, list[str]] = {}
    for t, c in PROFILE_COLUMNS:
        by_table.setdefault(t, []).append(c)
    parts = []
    for t, cols in by_table.items():
        df = load_table(spark, sf_dir, t)
        for c in cols:
            is_num = dict(df.dtypes)[c] in ("bigint", "int", "double", "float")

            def rend(agg: str) -> str:
                # numeric: aggregate first, render after (same order
                # as the Spark side — never MIN over strings)
                return (
                    f"CAST(CAST({agg} AS DECIMAL(18,2)) AS VARCHAR)"
                    if is_num
                    else agg
                )

            parts.append(f"""
SELECT '{t}.{c}' AS col_name,
       (SELECT COUNT(*) FROM {t}) AS n_rows,
       (SELECT COUNT(*) FROM {t} WHERE {c} IS NULL) AS n_nulls,
       (SELECT COUNT(DISTINCT {c}) FROM {t}) AS n_distinct,
       (SELECT {rend(f'MIN({c})')} FROM {t}) AS min_str,
       (SELECT {rend(f'MAX({c})')} FROM {t}) AS max_str""")
    return " UNION ALL ".join(parts)


def _profile_oracle(sf_dir: str) -> str:
    from ..session import active_or_local

    return _profile_sql(active_or_local("quality_oracle"), sf_dir)


HIST_WIDTH = 25_000.0  # fixed-width buckets over o_totalprice
HIST_BUCKETS = 24  # top bucket absorbs the tail


def orders_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: fixed 25k-wide buckets
    (top bucket clamps the tail), count and mass share per bucket —
    the distribution view next to the profiler's min/max and the
    quantile queries' point estimates.

    Fixed bounds (not data-derived) keep this ONE pass — a
    min/max-then-bucket histogram needs two scans or an sketch; at
    100 TB the fixed grid is what monitoring dashboards use so
    week-over-week histograms stay comparable. Map-only bucket
    projection + one 24-group aggregation. Bucket arithmetic:
    floor(price / width) exactly (double division by a power-of-ten
    constant, floored identically both engines, prices are 2-decimal
    so never on a bucket boundary ulp)."""
    bucket = F.least(
        F.floor(F.col("o_totalprice") / F.lit(HIST_WIDTH)),
        F.lit(HIST_BUCKETS - 1),
    ).cast("long")
    o = load_table(spark, sf_dir, "orders").select(bucket.alias("bucket"))
    total = o.agg(F.count("*").alias("n_total"))
    return (
        o.groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("lo"),
            ((F.col("bucket") + 1) * HIST_WIDTH).alias("hi"),
            "n_orders",
            (
                F.col("n_orders").cast("double") / F.col("n_total").cast("double")
            ).alias("share"),
        )
    )


ORDERS_HIST_SQL = f"""
WITH b AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / {HIST_WIDTH!r}) AS BIGINT),
               {HIST_BUCKETS - 1}) AS bucket
  FROM orders
),
tot AS (SELECT COUNT(*) AS n_total FROM b)
SELECT bucket,
       bucket * {HIST_WIDTH!r} AS lo,
       (bucket + 1) * {HIST_WIDTH!r} AS hi,
       COUNT(*) AS n_orders,
       CAST(COUNT(*) AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
FROM b CROSS JOIN tot t
GROUP BY bucket, t.n_total
"""


# --- table content fingerprints --------------------------------------------

_FP_MOD = 2_147_483_647  # MERSENNE_P — keep the row-hash field small
# Per-table canonical row hash covering EVERY column of the table
# (an r5 review caught a subset-only draft whose "any change moves
# the fp" claim was false for unhashed columns). Each term is
# engine-portable — integer keys, price cents, epoch days, and the
# polynomial char-fold for strings — expressed once per DIALECT:
# Spark terms need F.Column builders (poly_fingerprint is a Catalyst
# higher-order fold with no Spark-SQL string form shared with
# DuckDB), SQL terms are DuckDB fragments. Every (coef × term) is
# reduced mod p BEFORE the row sum so ≤ |cols| × p stays far under
# 2^63 regardless of column count.
_FP_COEFS = (1000003, 999983, 999979, 999961, 999959, 999953)


# (kind, column) pairs per table — plain data, so the SQL twin can be
# rendered at import time while the Spark Columns (which need an
# active SparkContext) are built only when the query runs
_FP_SPECS: dict[str, list[tuple[str, str]]] = {
    "region": [("key", "r_regionkey"), ("text", "r_name")],
    "nation": [
        ("key", "n_nationkey"),
        ("text", "n_name"),
        ("key", "n_regionkey"),
    ],
    "customer": [
        ("key", "c_custkey"),
        ("text", "c_name"),
        ("key", "c_nationkey"),
        ("cents", "c_acctbal"),
        ("text", "c_mktsegment"),
    ],
    "orders": [
        ("key", "o_orderkey"),
        ("key", "o_custkey"),
        ("text", "o_orderstatus"),
        ("cents", "o_totalprice"),
        ("epoch_day", "o_orderdate"),
        ("text", "o_orderpriority"),
    ],
}


def _fp_rowh_spark(terms: list[tuple[str, str]]) -> F.Column:
    """Spark Column for the combined row hash (needs a live context)."""
    from ..functions.hashing import poly_fingerprint

    builders = {
        "key": lambda c: F.col(c).cast("long"),
        "cents": lambda c: F.round(F.col(c) * 100).cast("long"),
        "epoch_day": lambda c: F.datediff(
            c, F.lit("1970-01-01").cast("date")
        ).cast("long"),
        "text": lambda c: poly_fingerprint(F.col(c)),
    }
    acc = None
    # strict: zip silently dropping a 7th column would quietly void
    # the "every column is hashed" guarantee (r5 review); grow
    # _FP_COEFS before growing any spec past six columns
    for coef, (kind, col) in zip(_FP_COEFS[: len(terms)], terms, strict=True):
        term = (builders[kind](col) * F.lit(coef)) % F.lit(_FP_MOD)
        acc = term if acc is None else acc + term
    return acc % F.lit(_FP_MOD)


def _fp_rowh_sql(terms: list[tuple[str, str]]) -> str:
    """DuckDB fragment for the combined row hash (context-free)."""
    from ..functions.hashing import poly_fingerprint_sql

    builders = {
        "key": lambda c: f"CAST({c} AS BIGINT)",
        "cents": lambda c: f"CAST(ROUND({c} * 100) AS BIGINT)",
        "epoch_day": (
            lambda c: f"CAST(CAST({c} AS DATE) - DATE '1970-01-01' AS BIGINT)"
        ),
        "text": poly_fingerprint_sql,
    }
    parts = [
        f"(({builders[kind](col)}) * {coef}) % {_FP_MOD}"
        for coef, (kind, col) in zip(_FP_COEFS[: len(terms)], terms, strict=True)
    ]
    return f"({' + '.join(parts)}) % {_FP_MOD}"


def table_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint per table — the
    replication/integrity primitive next to ``orders_snapshot_diff``:
    the diff tells you WHAT changed between two versions; this tells
    you IN ONE SCAN PER TABLE (and a 16-byte answer) WHETHER two
    copies agree at all, which is the check a 100 TB replication or
    backup-restore pipeline runs first. fp = Σ rowh mod p where rowh
    hashes EVERY column of the row (keys, string char-folds, price
    cents, epoch days): the SUM makes the fingerprint independent of
    row order, partitioning, and engine, so the same table produces
    the same fp everywhere — and any single-row change to any column
    moves it, up to the mod-p collision odds (~2⁻³¹ per comparison;
    widen to two moduli for archival use).

    Plan: per table one map-side hash projection + one keyless
    aggregation (partial sums collapse to one row per partition
    before the 1-row shuffle); the per-table rows union into a
    |tables|-row report. BIGINT accumulation bounds: rows ×
    2³¹ < 2⁶³ holds to ~10⁹ rows/table; past that, accumulate
    DECIMAL(38,0) and take the mod at the end."""
    parts = []
    for table, terms in _FP_SPECS.items():
        rowh = _fp_rowh_spark(terms)
        t = load_table(spark, sf_dir, table)
        parts.append(
            t.select(rowh.alias("rowh"))
            .agg(
                F.count("*").alias("n_rows"),
                (F.sum("rowh") % _FP_MOD).cast("long").alias("content_fp"),
            )
            .select(
                F.lit(table).alias("table_name"), "n_rows", "content_fp"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _fingerprints_sql() -> str:
    selects = []
    for table, terms in _FP_SPECS.items():
        rowh_sql = _fp_rowh_sql(terms)
        selects.append(
            f"""SELECT '{table}' AS table_name, COUNT(*) AS n_rows,
       CAST(SUM({rowh_sql}) % {_FP_MOD} AS BIGINT) AS content_fp
FROM {table}"""
        )
    return "\nUNION ALL\n".join(selects)


# --- model-based quality filtering (late r11) ---------------------------------
#
# The INFERENCE sibling of DSIR: apply a TRAINED hashed linear text
# classifier (the fastText-style quality filter every production LLM
# pipeline runs — CCNet/LLaMA-style "looks like Wikipedia" scoring)
# to every document, at scale. The engine's contribution is the
# SCORING PLAN: hashed unigram+bigram bag-of-features (the DSIR
# feature space), one weight lookup per feature, one
# sum+count aggregation per document — map-side-combinable, one
# shuffle, linear. The weight table is an input artifact in
# production; the fixture uses a deterministic affine stand-in
# (w(b) = (37b + 1009) % 4001 − 2000) so the oracle can recompute it
# closed-form — swapping in real trained weights is a broadcast-array
# or join-table substitution that does not change the plan.
#
# Exactness: the mean-logit score is fixed-point — score_fp =
# ((Σw + 2000·n)·1000) div n − 2000000. The +2000·n shift keeps the
# dividend nonnegative so Spark's `div` and DuckDB's `//` agree
# (they differ on negative operands: truncation vs floor — the same
# trap the DSIR fixed point documents). Sigmoid is monotone, so
# thresholding the logit IS thresholding the probability; no libm
# exp enters the gate. Threshold 130000 ≈ the fixture median
# (measured at sf0.01) — selective and non-vacuous.

QCLF_BUCKETS = 4096
QCLF_THRESHOLD_FP = 130_000


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_features, score_fp, keep): mean hashed-linear logit
    per document in exact fixed point + the keep verdict at the
    declared threshold."""
    from .ngram_lm import _lc_tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", _lc_tokens().alias("ws"))
    feats_expr = (
        "concat(ws, if(size(ws) >= 2,"
        " transform(sequence(0, size(ws) - 2),"
        "           i -> concat(ws[i], ' ', ws[i+1])),"
        " array()))"
    )
    bucket = (
        "CAST(conv(substring(md5(f), 1, 15), 16, 10) AS BIGINT)"
        f" % {QCLF_BUCKETS}"
    )
    weight = "((37 * b + 1009) % 4001) - 2000"
    feats = (
        toks.select("doc_id", F.explode(F.expr(feats_expr)).alias("f"))
        .withColumn("b", F.expr(bucket))
        .withColumn("w", F.expr(weight))
    )
    per = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_features"), F.sum("w").alias("s")
    )
    score = F.expr("((s + 2000 * n_features) * 1000) div n_features - 2000000")
    return per.select(
        "doc_id",
        "n_features",
        score.alias("score_fp"),
        (score >= QCLF_THRESHOLD_FP).alias("keep"),
    )


QCLF_SQL = f"""
WITH feats AS (
  SELECT doc_id, unnest(list_concat(ws,
           CASE WHEN len(ws) >= 2 THEN
             list_transform(generate_series(1, len(ws) - 1),
                            i -> concat(ws[i], ' ', ws[i+1]))
           ELSE [] END)) AS f
  FROM (SELECT doc_id,
               list_filter(string_split(lower(text), ' '),
                           t -> len(t) > 0) AS ws
        FROM documents)
  WHERE len(ws) > 0
),
scored AS (
  SELECT doc_id, f,
         ((37 * (CAST(concat('0x', substr(md5(f), 1, 15)) AS BIGINT)
                 % {QCLF_BUCKETS}) + 1009) % 4001) - 2000 AS w
  FROM feats
),
per AS (
  SELECT doc_id, COUNT(*) AS n_features, CAST(SUM(w) AS BIGINT) AS s
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_features,
       ((s + 2000 * n_features) * 1000) // n_features - 2000000 AS score_fp,
       ((s + 2000 * n_features) * 1000) // n_features - 2000000
         >= {QCLF_THRESHOLD_FP} AS keep
FROM per
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "quality_classifier_score": (quality_classifier_score, QCLF_SQL),
    "referential_integrity_audit": (referential_integrity_audit, _ri_sql()),
    "column_profile": (column_profile, _profile_oracle),
    "orders_price_histogram": (orders_price_histogram, ORDERS_HIST_SQL),
    "table_fingerprints": (table_fingerprints, _fingerprints_sql()),
}
