"""Skew-handling join utilities (north_rule: "partitioning / shuffle /
skew handled explicitly").

AQE's skew-join split handles most skew adaptively (enabled in
session.get_spark), but it only splits SORT-MERGE join partitions after
a shuffle has already been planned, and it can't help a first-stage
aggregation or a build that disables AQE. `salted_join` is the explicit
form: fact rows get a deterministic salt in [0, n_salts), the dim side
is exploded ×n_salts, and the join key becomes (key, salt) — a hot
key's rows spread across n_salts reducers instead of one straggler
task. Cost: dim replicated n_salts× (choose n_salts ≈ hot-key rows /
target-partition rows; dims here are broadcast-small, so the explode is
cheap). Values are identical to the plain join — pinned by
tests/test_salted_join.py.

Reference analog: none (single-machine app); this is the engine-side
scale mandate, same family as extract_turns' salted repartition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join a skew-keyed `fact` to a (small) `dim` on `key` with
    explicit salting. Output columns = plain `fact.join(dim, key, how)`.

    The fact salt is a deterministic hash of the whole row (any
    assignment is correct; determinism keeps reruns identical), the dim
    is exploded to every salt value, and the join clusters on
    (key, salt).
    """
    fact_salted = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
               F.lit(n_salts)).cast("int"))
    dim_salted = dim.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)])))
    return (fact_salted.join(dim_salted, [key, SALT_COL], how)
            .drop(SALT_COL))
