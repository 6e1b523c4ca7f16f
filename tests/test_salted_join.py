"""salted_join: value-identical to the plain join, and the hot key's
rows actually land on multiple reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_image_to_text_spark.operators.skew import salted_join


def _rows(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, str(v)) for v in t))


def test_salted_join_values_match_plain_join(spark):
    # 90 % of fact rows share one key — the classic straggler shape
    fact = spark.range(0, 3000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 37).cast("string")))
        .alias("k"),
        F.col("id").alias("payload"))
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", 100 + i) for i in range(37)],
        "k string, attr int")
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*sorted(salted.columns))) == \
        _rows(plain.select(*sorted(plain.columns)))

    # left join keeps unmatched fact rows exactly like the plain one
    dim_missing = dim.filter(F.col("k") != "hot")
    plain_l = fact.join(dim_missing, "k", "left")
    salted_l = salted_join(fact, dim_missing, "k", n_salts=4, how="left")
    assert _rows(salted_l.select(*sorted(salted_l.columns))) == \
        _rows(plain_l.select(*sorted(plain_l.columns)))


def test_salt_disperses_hot_key_over_reducers(spark):
    fact = spark.range(0, 4000).select(
        F.lit("hot").alias("k"), F.col("id").alias("payload"))
    dim = spark.createDataFrame([("hot", 1)], "k string, attr int")
    n_salts = 8
    joined = salted_join(fact, dim, "k", n_salts=n_salts)
    # repartition exactly as the salted join's cluster key does and count
    # distinct partitions the hot key occupies
    from ocr_image_to_text_spark.operators.skew import SALT_COL

    fs = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
               F.lit(n_salts)).cast("int"))
    n_parts = (fs.repartition(16, F.col("k"), F.col(SALT_COL))
               .select(F.spark_partition_id().alias("pid"))
               .distinct().count())
    assert n_parts > 1  # unsalted, hash("hot") would be ONE partition
    assert joined.count() == 4000
