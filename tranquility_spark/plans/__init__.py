from tranquility_spark.plans.rollup import build_rollup, rollup_oracle_sql  # noqa: F401
