"""Warehouse-modeling and affinity operators (EXT): SCD2 history
assembly from a changelog, market-basket co-purchase affinity, triangle
counting on the co-purchase graph, and sketch-based join-cardinality
estimation.

These four complete the "data-platform" story next to scale_ops
(bloom pruning / z-order / latest-wins upsert): latest-wins answers
"what is true NOW", SCD2 answers "what was true WHEN" — the other half
of CDC compaction a lakehouse needs; the affinity pair/triangle
queries are the canonical product-graph workloads; and the KMV
overlap estimator is how a cost-based planner sizes a join before
running it (the sketch algebra of ``sketches.users_kmv_by_type``
applied to two-set intersection via the standard K-min-values union
property).

Determinism rules as registry.py: engine-portable affine hashes only,
integer/epoch-day outputs (never raw dates), doubles produced by a
single identical op sequence in both dialects, no nullable-int output
columns (a NULL BIGINT round-trips through pandas as float64 and
breaks the driver's dtype-kind check — SCD2's open rows use the
classic 9999-12-31 sentinel instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.barrier import barrier
from ..functions.hashing import MERSENNE_P, affine_params
from ..sources import load_table

# --- SCD2 history assembly -------------------------------------------------

SCD_MOD = 7  # sampled keys receiving change records
SCD_DELTA = 10.0  # exact double increment per version
# classic open-ended high date: epoch day of 9999-12-31
SCD_OPEN_DAY = 2_932_896


def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension assembly: a deterministic
    changelog (v1 = the base row at o_orderdate; v2 = +30 days,
    status 'U', price +{SCD_DELTA}; v3 on every 3rd sampled key =
    +60 days, status 'F', price +2·{SCD_DELTA}) is compiled into
    versioned validity intervals — valid_from/valid_to epoch days via
    LEAD over each key's version sequence, open rows closed with the
    9999-12-31 sentinel.

    This is the half of CDC compaction ``scale_ops.orders_upsert_latest``
    doesn't cover: latest-wins keeps only the current image (one
    max_by aggregation); SCD2 keeps every image with its validity
    window, which needs the per-key ORDER — one window over the key
    partitioning, i.e. exactly one shuffle on the dimension key.

    At 100 TB: the changelog is fact-scale but each key's version
    chain is short; the single key-partitioned window (no self-join,
    no global sort) is the plan a lakehouse SCD2 MERGE compiles to.
    Output: one row per (key, version), keys sampled at 1/{SCD_MOD}.
    """
    base = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % SCD_MOD == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.datediff("o_orderdate", F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day0"),
        )
    )
    v1 = base.select(
        "o_orderkey",
        F.lit(1).cast("long").alias("version"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("day0").alias("eff_day"),
    )
    v2 = base.select(
        "o_orderkey",
        F.lit(2).cast("long").alias("version"),
        F.lit("U").alias("status"),
        (F.col("o_totalprice") + SCD_DELTA).alias("price"),
        (F.col("day0") + 30).alias("eff_day"),
    )
    v3 = (
        base.where(F.col("o_orderkey") % (3 * SCD_MOD) == 0)
        .select(
            "o_orderkey",
            F.lit(3).cast("long").alias("version"),
            F.lit("F").alias("status"),
            (F.col("o_totalprice") + 2 * SCD_DELTA).alias("price"),
            (F.col("day0") + 60).alias("eff_day"),
        )
    )
    w = W.partitionBy("o_orderkey").orderBy("eff_day", "version")
    return (
        v1.unionByName(v2)
        .unionByName(v3)
        .withColumn("valid_to_day", F.lead("eff_day").over(w))
        .select(
            "o_orderkey",
            "version",
            "status",
            "price",
            F.col("eff_day").alias("valid_from_day"),
            F.coalesce("valid_to_day", F.lit(SCD_OPEN_DAY))
            .cast("long")
            .alias("valid_to_day"),
            F.when(F.col("valid_to_day").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_current"),
        )
    )


ORDERS_SCD2_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day0
  FROM orders WHERE o_orderkey % {SCD_MOD} = 0
),
changelog AS (
  SELECT o_orderkey, CAST(1 AS BIGINT) AS version, o_orderstatus AS status,
         o_totalprice AS price, day0 AS eff_day FROM base
  UNION ALL
  SELECT o_orderkey, CAST(2 AS BIGINT), 'U',
         o_totalprice + {SCD_DELTA!r}, day0 + 30 FROM base
  UNION ALL
  SELECT o_orderkey, CAST(3 AS BIGINT), 'F',
         o_totalprice + {2 * SCD_DELTA!r}, day0 + 60
  FROM base WHERE o_orderkey % {3 * SCD_MOD} = 0
),
seq AS (
  SELECT *, LEAD(eff_day) OVER (PARTITION BY o_orderkey
                                ORDER BY eff_day, version) AS nxt
  FROM changelog
)
SELECT o_orderkey, version, status, price,
       eff_day AS valid_from_day,
       CAST(COALESCE(nxt, {SCD_OPEN_DAY}) AS BIGINT) AS valid_to_day,
       CAST(CASE WHEN nxt IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM seq
"""


# --- market-basket co-purchase affinity ------------------------------------

BASKET_CAP = 8  # max distinct parts per order entering the pair fan-out
PAIR_MIN_SUPPORT = 2  # orders a pair must co-occur in to count as an edge
PAIR_TOP_N = 20


def _capped_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) with at most BASKET_CAP parts per order
    (deterministic keep: the BASKET_CAP smallest partkeys). The cap is
    the same quadratic-blowup bound as the shingle df-cap in
    ``dedup.dedup_ngram_jaccard``: an order with P parts fans out
    P·(P−1)/2 pairs, so one pathological mega-basket (a B2B order
    with 10⁴ line items) would otherwise emit 5·10⁷ rows from a
    single input row; the cap makes the per-order cost ≤ C(cap, 2)."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    w = W.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        items.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BASKET_CAP)
        .select("l_orderkey", "l_partkey")
    )


def _pair_counts(capped: DataFrame) -> DataFrame:
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
    )


def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PAIR_TOP_N} co-purchased part pairs by order co-occurrence,
    with lift (observed / expected-under-independence co-occurrence).

    Plan: distinct (order, part) → per-order cap window (one shuffle
    on orderkey) → self-equi-join ON ORDERKEY (pairs only form within
    an order — never a cross join) → (part_a, part_b) count with a
    support floor → broadcast part-frequency join for lift → global
    top-N via orderBy+limit (TakeOrderedAndProject: per-partition
    top-N partials, N rows to the driver, no global sort).

    At 100 TB: the pair fan-out is bounded by cap²/2 per order; the
    support floor keeps the affinity table sparse; part frequencies
    are |parts|-sized (broadcast)."""
    capped = barrier(
        _capped_items(spark, sf_dir), "corpus", "copurchase capped order-items"
    )
    n_orders_total = capped.select("l_orderkey").distinct().count()
    occ = capped.groupBy("l_partkey").agg(F.count("*").alias("occ"))
    pairs = _pair_counts(capped).where(F.col("n_orders") >= PAIR_MIN_SUPPORT)
    lift = (
        F.col("n_orders").cast("double")
        * F.lit(float(n_orders_total))
        / (F.col("occ_a").cast("double") * F.col("occ_b").cast("double"))
    )
    return (
        pairs.join(
            F.broadcast(occ.withColumnRenamed("occ", "occ_a")),
            pairs.part_a == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            F.broadcast(occ.withColumnRenamed("occ", "occ_b")),
            F.col("part_b") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .select("part_a", "part_b", "n_orders", lift.alias("lift"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(PAIR_TOP_N)
    )


_CAPPED_SQL = f"""
  SELECT l_orderkey, l_partkey
  FROM (SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_partkey) AS rn
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem))
  WHERE rn <= {BASKET_CAP}
"""

COPURCHASE_SQL = f"""
WITH capped AS ({_CAPPED_SQL}),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_total FROM capped),
occ AS (SELECT l_partkey, COUNT(*) AS occ FROM capped GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*) AS n_orders
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {PAIR_MIN_SUPPORT}
)
SELECT part_a, part_b, n_orders,
       CAST(n_orders AS DOUBLE) * CAST(n.n_total AS DOUBLE)
         / (CAST(oa.occ AS DOUBLE) * CAST(ob.occ AS DOUBLE)) AS lift
FROM pairs
JOIN occ oa ON pairs.part_a = oa.l_partkey
JOIN occ ob ON pairs.part_b = ob.l_partkey
CROSS JOIN n
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT {PAIR_TOP_N}
"""


# --- triangle counting on the co-purchase graph ----------------------------


def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + clustering coefficient of the
    co-purchase graph (parts as nodes, an edge where two parts
    co-occur in ≥ {PAIR_MIN_SUPPORT} orders), via DEGREE-ORIENTED
    wedge closing — the standard distributed triangle algorithm
    (Cohen / Suri-Vassilvitskii MapReduce form).

    Why orientation matters at scale: the naive wedge join fans out
    Σ deg² rows, which a single celebrity node turns into a hot-key
    blowup. Orienting every edge from its lower-(degree, id) endpoint
    to the higher one makes the graph acyclic with out-degree
    O(√|E|), so the wedge join emits Σ outdeg² = O(|E|^1.5) rows
    TOTAL, independent of skew — the same hot-key-bounding move as
    the shingle df-cap, expressed on a graph.

    Plan: support-thresholded edges (the copurchase pair pipeline) →
    degree agg → orient (two broadcast-able joins onto the |nodes|-
    sized degree table) → wedge self-equi-join on the middle node →
    ONE closing left-join pass that counts candidates and closed
    triangles together → one summary row (nodes, edges, wedges =
    Σ C(deg,2), oriented wedge candidates, triangles, global
    clustering 3·Δ/wedges).
    """
    edges = (
        _pair_counts(_capped_items(spark, sf_dir))
        .where(F.col("n_orders") >= PAIR_MIN_SUPPORT)
        .select(F.col("part_a").alias("pa"), F.col("part_b").alias("pb"))
    )
    # reused by: degrees, orientation, wedge close
    edges = barrier(edges, "groups", "copurchase support-floored edge set")
    return triangle_summary(edges)


def triangle_summary(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle statistics over an undirected edge set
    (columns ``pa < pb``, one row per distinct edge) — the graph core
    of ``triangle_count_copurchase``, factored out so property tests
    can drive it with planted cliques/cycles of known triangle count."""
    deg = barrier(
        edges.select(F.col("pa").alias("node"))
        .unionAll(edges.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg")),
        "groups",
        "triangle node degrees",
    )
    da = deg.select(F.col("node").alias("pa"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("pb"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("pa") < F.col("pb"))
    )
    oriented = barrier(
        edges.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .select(
            F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
            F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        ),
        "groups",
        "triangle degree-oriented edges",
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).select(
        F.col("e1.src").alias("wa"), F.col("e2.dst").alias("wc")
    )
    # oriented edges are unique (distinct undirected edges, one
    # deterministic direction each), so the closing LEFT join never
    # duplicates a wedge — candidates and triangles come out of ONE
    # pass over the wedge stream instead of running the join twice
    closing = oriented.select(
        F.col("src").alias("wa"), F.col("dst").alias("wc"), F.lit(1).alias("hit")
    )
    tri = wedges.join(closing, ["wa", "wc"], "left").agg(
        F.count("*").alias("n_candidates"),
        F.count("hit").alias("n_triangles"),
    )
    stats = deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    )
    n_edges = edges.count()
    return (
        stats.crossJoin(tri)
        .select(
            "n_nodes",
            F.lit(n_edges).cast("long").alias("n_edges"),
            "n_wedges",
            "n_candidates",
            "n_triangles",
            (
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("clustering_coeff"),
        )
    )


# MATERIALIZED: `oriented` is referenced three times (two wedge sides
# + the closing join) and `edges` twice — DuckDB would otherwise
# inline and recompute the pair-scan per reference (the PAGERANK_SQL
# lesson; measured 3.0 s → 0.3 s at sf0.1, bit-identical).
TRIANGLE_SQL = f"""
WITH capped AS MATERIALIZED ({_CAPPED_SQL}),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM capped a JOIN capped b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {PAIR_MIN_SUPPORT}
),
deg AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg
  FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
  GROUP BY 1
),
oriented AS MATERIALIZED (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.pa < e.pb)
              THEN e.pa ELSE e.pb END AS src,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.pa < e.pb)
              THEN e.pb ELSE e.pa END AS dst
  FROM edges e JOIN deg da ON e.pa = da.node JOIN deg db ON e.pb = db.node
),
wedges AS MATERIALIZED (
  SELECT e1.src AS wa, e2.dst AS wc
  FROM oriented e1 JOIN oriented e2 ON e1.dst = e2.src
),
tri AS (
  SELECT COUNT(*) AS n_candidates, COUNT(o.src) AS n_triangles
  FROM wedges w LEFT JOIN oriented o ON w.wa = o.src AND w.wc = o.dst
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       CAST((SELECT SUM(deg * (deg - 1)) / 2 FROM deg) AS BIGINT) AS n_wedges,
       tri.n_candidates,
       tri.n_triangles,
       CAST(3.0 AS DOUBLE) * CAST(tri.n_triangles AS DOUBLE)
         / CAST((SELECT SUM(deg * (deg - 1)) / 2 FROM deg) AS DOUBLE)
         AS clustering_coeff
FROM tri
"""


# --- KMV join-cardinality (set-overlap) estimation -------------------------

OVERLAP_K = 256  # K-minimum-values sketch size per side
_OVERLAP_HASH_IDX = 17  # affine family index (disjoint from other sketches)


def custkey_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation from two KMV sketches: how many
    customers placed an URGENT order AND have a finished ('F') order —
    estimated from two {OVERLAP_K}-minimum-values sketches via the
    standard KMV union/intersection algebra (Beyer et al., SIGMOD'07:
    the K smallest of A∪B are a subset of sketch(A) ∪ sketch(B);
    Jaccard ≈ overlap inside that union sketch; |A∩B| ≈ J · |A∪B|),
    next to the exact intersection for the accuracy report.

    Why this exists: this is how a cost-based optimizer sizes a join
    WITHOUT running it — each side's sketch is a {OVERLAP_K}-row
    TakeOrderedAndProject over a scan (per-partition partial top-K,
    K rows to the driver side of the plan), so the estimate costs two
    scans and no shuffle of the join itself. Engine-portable affine
    hash keeps the sketch — including its error — bit-identical in
    both engines (the ``sketches`` module's determinism move).

    Output: one row (exact_a, exact_b, exact_inter, est_inter,
    rel_error)."""
    a, b = affine_params(_OVERLAP_HASH_IDX)
    orders = load_table(spark, sf_dir, "orders")
    set_a = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    set_b = (
        orders.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    h = (F.col("o_custkey") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)

    def sketch(s: DataFrame) -> DataFrame:
        # custkey < p makes the affine map injective: distinct keys →
        # distinct hashes, so the top-K needs no second distinct
        return s.select(h.alias("h")).orderBy("h").limit(OVERLAP_K)

    sk_a = barrier(sketch(set_a), "sample", "KMV overlap sketch A (K rows)")
    sk_b = barrier(sketch(set_b), "sample", "KMV overlap sketch B (K rows)")
    union_k = (
        sk_a.unionAll(sk_b).distinct().orderBy("h").limit(OVERLAP_K)
    )
    kth = union_k.agg(
        F.max("h").alias("kth"), F.count("*").alias("k_used")
    )
    inter_in_sketch = (
        sk_a.join(sk_b, "h")
        .crossJoin(F.broadcast(kth))
        .where(F.col("h") <= F.col("kth"))
        .agg(F.count("*").alias("n_common"), F.first("kth").alias("kth"),
             F.first("k_used").alias("k_used"))
    )
    exact = (
        set_a.join(set_b, "o_custkey")
        .agg(F.countDistinct("o_custkey").alias("exact_inter"))
        .crossJoin(set_a.agg(F.countDistinct("o_custkey").alias("exact_a")))
        .crossJoin(set_b.agg(F.countDistinct("o_custkey").alias("exact_b")))
    )
    # degenerate guard (the users_kmv_by_type short-circuit): when the
    # union carries fewer than K distinct values the sketch IS the set
    # — (K−1)·p/kth would wildly underestimate, the exact size is free
    est_union = F.when(
        F.col("k_used") < OVERLAP_K, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(float(OVERLAP_K - 1))
        * F.lit(float(MERSENNE_P))
        / F.col("kth").cast("double")
    )
    est_inter = (
        F.col("n_common").cast("double") / F.col("k_used").cast("double")
    ) * est_union
    return (
        exact.crossJoin(F.broadcast(inter_in_sketch))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            est_inter.alias("est_inter"),
        )
        .withColumn(
            "rel_error",
            F.abs(F.col("est_inter") - F.col("exact_inter").cast("double"))
            / F.col("exact_inter").cast("double"),
        )
    )


def _overlap_sql() -> str:
    a, b = affine_params(_OVERLAP_HASH_IDX)
    return f"""
WITH set_a AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
),
set_b AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
),
sk_a AS (
  SELECT (o_custkey * {a} + {b}) % {MERSENNE_P} AS h FROM set_a
  ORDER BY h LIMIT {OVERLAP_K}
),
sk_b AS (
  SELECT (o_custkey * {a} + {b}) % {MERSENNE_P} AS h FROM set_b
  ORDER BY h LIMIT {OVERLAP_K}
),
union_k AS (
  SELECT DISTINCT h FROM (SELECT h FROM sk_a UNION ALL SELECT h FROM sk_b)
  ORDER BY h LIMIT {OVERLAP_K}
),
kth AS (SELECT MAX(h) AS kth, COUNT(*) AS k_used FROM union_k),
common AS (
  SELECT COUNT(*) AS n_common, MAX(kth.kth) AS kth, MAX(kth.k_used) AS k_used
  FROM sk_a JOIN sk_b USING (h) CROSS JOIN kth
  WHERE h <= kth.kth
),
exact AS (
  SELECT (SELECT COUNT(*) FROM set_a) AS exact_a,
         (SELECT COUNT(*) FROM set_b) AS exact_b,
         (SELECT COUNT(*) FROM set_a JOIN set_b USING (o_custkey))
           AS exact_inter
),
est AS (
  SELECT (CAST(n_common AS DOUBLE) / CAST(k_used AS DOUBLE))
           * (CASE WHEN k_used < {OVERLAP_K} THEN CAST(k_used AS DOUBLE)
                   ELSE CAST({OVERLAP_K - 1} AS DOUBLE)
                        * CAST({MERSENNE_P} AS DOUBLE) / CAST(kth AS DOUBLE)
              END) AS est_inter
  FROM common
)
SELECT exact_a, exact_b, exact_inter, est_inter,
       ABS(est_inter - CAST(exact_inter AS DOUBLE))
         / CAST(exact_inter AS DOUBLE) AS rel_error
FROM exact CROSS JOIN est
"""


# --- snapshot diff ---------------------------------------------------------

# keys % 10: 3 → dropped in snapshot B, 6 → mutated, 0 → cloned as a new
# key at +DIFF_ADD_OFFSET.  The offset is far above any plausible
# o_orderkey (TPC-H sf100k tops out ~6e11 < 2^40), so synthesized
# "added" keys cannot collide with organic ones.
DIFF_ADD_OFFSET = 1 << 40
DIFF_PRICE_DELTA = 7.5  # exact double increment for mutated rows
_DIFF_HASH_IDX = 21  # affine family index (disjoint from other uses)


def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation between two table versions — the
    row-level diff a lakehouse "table history" / data-validation pass
    computes between version N and N+1 (and the third leg of the CDC
    triad: ``orders_upsert_latest`` compacts a changelog forward,
    ``orders_scd2_history`` keeps every image, this RECOVERS a
    changelog from two full snapshots when no CDC feed exists).
    Snapshot B is derived from base orders deterministically: keys
    ending in 3 are deleted, keys ending in 6 get a price+status
    mutation, keys ending in 0 are cloned as brand-new keys at
    +``DIFF_ADD_OFFSET``. Output: one row per differing key with
    change_type ∈ {{added, removed, changed}} and both row
    fingerprints (sentinel -1 for the absent side — nullable BIGINTs
    break the gate's dtype check, see module docstring).

    The 100 TB move is WHAT shuffles: each side collapses to
    (key, fingerprint) before the full-outer join — the fingerprint
    is pure arithmetic over the row's business columns (price cents ×
    affine + status codepoint, engine-portable), so the diff's
    shuffle traffic is 16 bytes/row regardless of row width, and
    unchanged keys (the overwhelming majority between adjacent
    versions) are dropped immediately after the join. No wide row
    ever crosses the network."""
    a, b = affine_params(_DIFF_HASH_IDX)

    def fp(status: F.Column, price: F.Column) -> F.Column:
        cents = F.round(price * 100).cast("long")
        return (cents * F.lit(a) + F.lit(b) + F.ascii(status)) % F.lit(MERSENNE_P)

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    snap_a = base.select(
        "o_orderkey", fp(F.col("o_orderstatus"), F.col("o_totalprice")).alias("fp")
    )
    kept = base.where(F.col("o_orderkey") % 10 != 3)
    mutated = F.col("o_orderkey") % 10 == 6
    snap_b_rows = kept.select(
        "o_orderkey",
        F.when(mutated, F.lit("R")).otherwise(F.col("o_orderstatus")).alias("st"),
        F.when(mutated, F.col("o_totalprice") + DIFF_PRICE_DELTA)
        .otherwise(F.col("o_totalprice"))
        .alias("pr"),
    ).unionByName(
        base.where(F.col("o_orderkey") % 10 == 0).select(
            (F.col("o_orderkey") + DIFF_ADD_OFFSET).alias("o_orderkey"),
            F.lit("N").alias("st"),
            F.col("o_totalprice").alias("pr"),
        )
    )
    snap_b = snap_b_rows.select(
        "o_orderkey", fp(F.col("st"), F.col("pr")).alias("fp")
    )
    joined = snap_a.withColumnRenamed("fp", "fp_a").join(
        snap_b.withColumnRenamed("fp", "fp_b"), "o_orderkey", "full_outer"
    )
    return (
        joined.select(
            "o_orderkey",
            F.when(F.col("fp_a").isNull(), "added")
            .when(F.col("fp_b").isNull(), "removed")
            .when(F.col("fp_a") != F.col("fp_b"), "changed")
            .alias("change_type"),
            F.coalesce("fp_a", F.lit(-1)).cast("long").alias("old_fp"),
            F.coalesce("fp_b", F.lit(-1)).cast("long").alias("new_fp"),
        )
        .where(F.col("change_type").isNotNull())
    )


def _snapshot_diff_sql() -> str:
    a, b = affine_params(_DIFF_HASH_IDX)

    def fp(status: str, price: str) -> str:
        return (
            f"(CAST(ROUND(({price}) * 100) AS BIGINT) * {a} + {b}"
            f" + ord({status})) % {MERSENNE_P}"
        )

    return f"""
WITH snap_a AS (
  SELECT o_orderkey, {fp('o_orderstatus', 'o_totalprice')} AS fp_a FROM orders
),
snap_b_rows AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 6 THEN 'R' ELSE o_orderstatus END AS st,
         CASE WHEN o_orderkey % 10 = 6
              THEN o_totalprice + {DIFF_PRICE_DELTA!r}
              ELSE o_totalprice END AS pr
  FROM orders WHERE o_orderkey % 10 != 3
  UNION ALL
  SELECT o_orderkey + {DIFF_ADD_OFFSET}, 'N', o_totalprice
  FROM orders WHERE o_orderkey % 10 = 0
),
snap_b AS (SELECT o_orderkey, {fp('st', 'pr')} AS fp_b FROM snap_b_rows),
diff AS (
  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'added'
              WHEN b.o_orderkey IS NULL THEN 'removed'
              WHEN a.fp_a != b.fp_b THEN 'changed' END AS change_type,
         COALESCE(a.fp_a, -1) AS old_fp,
         COALESCE(b.fp_b, -1) AS new_fp
  FROM snap_a a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
)
SELECT o_orderkey, change_type,
       CAST(old_fp AS BIGINT) AS old_fp, CAST(new_fp AS BIGINT) AS new_fp
FROM diff WHERE change_type IS NOT NULL
"""


def orders_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance — update a per-status
    aggregate (order count + price cents) from snapshot A to snapshot
    B by applying SIGNED DELTAS, never rescanning the base: removed
    rows contribute (−1, −cents) to their group, mutated rows retract
    from the old group and insert into the new one (the group-
    migration case naive "just re-add" implementations get wrong),
    added rows insert into theirs. new_view = base_view ⊕ Σdeltas per
    group. Uses the same deterministic snapshot-B construction as
    ``orders_snapshot_diff``; the ORACLE recomputes the aggregate
    from snapshot B directly, so the gate proves the delta algebra
    equals a full recompute.

    At 100 TB this is THE argument for maintaining views
    incrementally: the base never moves (its aggregate is a stored
    |groups|-row table), only the day's changes — a ~0.1%-scale
    stream — are scanned, signed, and aggregated; the merge is a
    |groups|-row full-outer join. Counts and cents are exact longs,
    so retract/insert arithmetic is associative with no float drift
    (a double-SUM view could NOT be maintained this way and stay
    bit-stable)."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base_view = base.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"), F.sum("cents").alias("c")
    )
    removed = base.where(F.col("o_orderkey") % 10 == 3).select(
        F.col("o_orderstatus").alias("status"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("cents")).alias("dc"),
    )
    mutated = base.where(F.col("o_orderkey") % 10 == 6)
    retract = mutated.select(
        F.col("o_orderstatus").alias("status"),
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("cents")).alias("dc"),
    )
    # mutated rows re-enter under status 'R' with price + DELTA
    # (exact long cents arithmetic — no float round-trip)
    insert = mutated.select(
        F.lit("R").alias("status"),
        F.lit(1).cast("long").alias("dn"),
        (F.col("cents") + int(DIFF_PRICE_DELTA * 100)).alias("dc"),
    )
    added = base.where(F.col("o_orderkey") % 10 == 0).select(
        F.lit("N").alias("status"),
        F.lit(1).cast("long").alias("dn"),
        F.col("cents").alias("dc"),
    )
    deltas = (
        removed.unionByName(retract).unionByName(insert).unionByName(added)
        .groupBy("status")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )
    merged = base_view.join(deltas, "status", "full_outer").select(
        "status",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (F.coalesce("c", F.lit(0)) + F.coalesce("dc", F.lit(0)))
        .cast("long")
        .alias("total_cents"),
    )
    return merged.where(F.col("n_orders") > 0)


MV_INCREMENTAL_SQL = f"""
WITH snap_b AS (
  SELECT CASE WHEN o_orderkey % 10 = 6 THEN 'R' ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 10 = 6
              THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   + {int(DIFF_PRICE_DELTA * 100)}
              ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 != 3
  UNION ALL
  SELECT 'N', CAST(ROUND(o_totalprice * 100) AS BIGINT)
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT status, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM snap_b GROUP BY status
"""
# no HAVING twin for Spark's n_orders > 0 filter: a group whose
# deltas net to zero has zero snap_b rows and is absent from the
# GROUP BY by construction (a COUNT(*) > 0 clause would be
# vacuously true — r5 review flagged the false symmetry)


QUERIES: dict = {}

QUERIES_TAIL = {
    "orders_scd2_history": (orders_scd2_history, ORDERS_SCD2_SQL),
    "copurchase_part_pairs": (copurchase_part_pairs, COPURCHASE_SQL),
    "triangle_count_copurchase": (triangle_count_copurchase, TRIANGLE_SQL),
    "custkey_overlap_kmv": (custkey_overlap_kmv, _overlap_sql()),
    "orders_snapshot_diff": (orders_snapshot_diff, _snapshot_diff_sql()),
    "orders_mv_incremental": (orders_mv_incremental, MV_INCREMENTAL_SQL),
}
