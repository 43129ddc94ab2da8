from bears_spark.queries.tables import load_tables
