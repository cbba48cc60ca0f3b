"""Named-query registry: every implemented operator from SURVEY.md §2 appears
here as a (Spark plan builder, DuckDB oracle SQL) pair consumed by
`__spark_entry__.py` and `bench.py`."""
