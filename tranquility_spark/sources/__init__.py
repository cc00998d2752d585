from tranquility_spark.sources.files import TABLES, load_table, load_all  # noqa: F401
