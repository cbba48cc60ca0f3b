"""Column-expression builders (all JVM-side `pyspark.sql.functions`
compositions — no Python UDFs in this package; UDF-backed operators live in
`crz_scraper_spark.operators`)."""
