"""Bucketed co-located join: identically-bucketed tables join with NO
Exchange in the executed plan (the 100-TB repeated-join shape)."""

import pytest
from pyspark.sql import functions as F

from cl_readability_spark.pipeline.bucketing import colocated_join, write_bucketed
from cl_readability_spark.pipeline.transcripts import synthetic_transcripts

pytestmark = pytest.mark.spark


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = synthetic_transcripts(spark, 5, seed=3).select("conv_id", "turn_idx", "role")
        dims = df.groupBy("conv_id").agg(F.count("*").alias("n_turns"))

        write_bucketed(df, "t_facts", ["conv_id"], n_buckets=4)
        write_bucketed(dims, "t_dims", ["conv_id"], n_buckets=4)

        joined = colocated_join(spark, "t_facts", "t_dims", on=["conv_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == df.count()

        # control: the same join on plain (unbucketed) tables DOES shuffle
        df.write.mode("overwrite").saveAsTable("t_plain_facts")
        dims.write.mode("overwrite").saveAsTable("t_plain_dims")
        plain = colocated_join(spark, "t_plain_facts", "t_plain_dims", on=["conv_id"])
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        for t in ("t_facts", "t_dims", "t_plain_facts", "t_plain_dims"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
