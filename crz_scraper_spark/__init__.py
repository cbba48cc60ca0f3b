"""crz_scraper_spark — a from-scratch, PySpark-native analytics engine with the
query and data-processing capabilities of slovak-egov/CRZ-scraper.

Not a port: the reference (at /root/reference, studied read-only) is a
single-threaded pandas/CSV ETL pipeline; this engine re-expresses its data
semantics (SURVEY.md §2 operator inventory) as lazy DataFrame plans optimized
by Catalyst, plus large-scale training-data-pipeline extensions (dedup,
similarity search, multimodal columns, text analysis) designed for 100 TB.

Layout:
    session.py    — tuned SparkSession factory
    catalog.py    — testdata table loading / temp-view registration
    sources/      — scans & sinks (parquet, pipe-CSV, XML, binary/dir-tree)
    functions/    — scalar/array/text column expression builders
    operators/    — composed relational & document operators
    plans/        — the named-query registry (queries + DuckDB oracle SQL)
    streaming/    — Structured Streaming surface (windows, dedup, sessions)
"""

__version__ = "0.1.0"
