"""Scale-technique queries: the skew/bucketing machinery exercised as
verified queries (results provably identical to their unsalted /
unbucketed forms — which is exactly what the oracle checks)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io
from ..operators.skew import salted_join
from ..registry import register


@register(
    "q_salted_skew_join",
    oracle="""
SELECT md5(event_type) AS type_tag,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavily-skewed equi-join (events: 100k+ rows over 5 event_type
    keys) done with the salted-join operator: the fact side salts into 8
    deterministic subkeys, the 5-row dim replicates per salt, shuffle
    key is (event_type, salt). On this data Catalyst broadcasts the dim
    anyway (no shuffle at all — fine); at 100 TB with a non-broadcastable
    dim, the salt is what prevents one reducer per hot key. The oracle is
    the plain unsalted join+agg — salting must not change a single row."""
    e = io.load_events(spark, sf_dir).select(
        "event_id", "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    dim = e.select("event_type").distinct().withColumn(
        "type_tag", F.md5("event_type")
    )
    joined = salted_join(
        e, dim, on="event_type", salt_from="event_id", buckets=8
    )
    return joined.groupBy("type_tag").agg(
        F.count("*").alias("n"),
        F.sum("v").cast("double").alias("total_value"),
    )
