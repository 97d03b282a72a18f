"""Scale toolkit: bucketed co-located joins and skew salting.

Two shuffle-control primitives the 100 TB design point needs (SURVEY
§4 'Partitioned parallel scan' / shuffle guidance):

- **Bucketed tables**: persist both sides of a recurring join bucketed
  by the join key (`bucketBy` + `saveAsTable`). Spark then plans the
  join with zero Exchange on either side — at 100 TB this converts the
  dominant shuffle into a local merge per bucket. The reference's
  analog is its even key-range split (TableKeyRangeUtils.java:17-42),
  which co-locates work but is recomputed per run; bucketing bakes it
  into the layout.
- **Salted joins**: when one side's key distribution is heavily skewed
  beyond what AQE's skew-join splitting handles, explode the small side
  into N salt replicas and scatter the big side across them. Classic
  two-sided salting; the join key becomes (key, salt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Spark
    plans this with no Exchange (verify via .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: scatter `big` across n_salts sub-keys and
    replicate `small` to all of them. Output columns = big ∪ small
    (join key once), same as a plain join.

    Only join types where unmatched SMALL-side rows are dropped are
    supported: a right/full outer join would surface each unmatched
    small row once per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} "
            "(outer small-side rows would duplicate per salt)"
        )
    big_s = big.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")
