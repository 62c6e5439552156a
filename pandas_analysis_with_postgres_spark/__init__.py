"""PySpark-native analytics engine with the capability surface of
gizemsutcu/Pandas-Analysis-With-Postgres (reference: a pandas+Postgres
customer-dimension ETL, ``dmCustomerProc.py``), re-expressed Spark-first.

Everything here is built on the public Apache Spark / PySpark API:
DataFrame/SQL plans optimized by Catalyst + AQE, Structured Streaming for
streams, Arrow-batched pandas UDFs only where built-ins genuinely cannot
express the semantics.

Layout
------
- ``session``    : tuned SparkSession factory
- ``sources``    : parquet test tables + JDBC (Postgres) source/sink
- ``functions``  : scalar/column expression helpers (flags, text, vectors)
- ``operators``  : relational operators (joins, aggregates, windows,
                   set ops, upsert, SCD2, dedup, similarity, multimodal)
- ``plans``      : full query definitions used by ``__spark_entry__``/bench
- ``pipeline``   : the reference's 16-stage customer ETL, Spark-first
- ``streaming``  : Structured Streaming windows/watermark/dedup
"""

__version__ = "0.1.0"
