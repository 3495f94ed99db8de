"""Skew-mitigation join helpers (100 TB posture).

AQE's skew-join splitting (on by default in session.py) handles most
cases at runtime; explicit salting remains the tool when one side's
hot keys are known and AQE can't help — e.g. a shuffle-hash join
feeding a stateful stage, or pre-AQE engines. The salted join is
semantically identical to the plain join; tests assert equality.

Shape: fact side gets a uniform random salt in [0, n); the dimension
side is exploded n× (one row per salt value); the join key becomes
(key, salt), spreading each hot key over n reducers. Cost: dim side
inflates n× — use for dim ≪ fact, which is exactly the skew scenario.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT_COL = "__salt"


def salt_fact(df: DataFrame, n_salts: int, seed: int = 42) -> DataFrame:
    """Add a uniform salt column to the (large, skewed) fact side."""
    return df.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )


def explode_dim(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate the (small) dimension side once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with ``n_salts``-way key
    salting. Result equals the unsalted join (salt columns dropped);
    each hot key's rows spread across ``n_salts`` shuffle partitions.
    """
    f = salt_fact(fact, n_salts, seed)
    d = explode_dim(dim, n_salts)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)
