"""PySpark-native analytics engine with the capabilities of
fcolobe/data-engineer-challenge (reference surveyed in SURVEY.md).

Everything here is idiomatic PySpark: declarative DataFrame/SQL plans
optimized by Catalyst, Arrow-batched Pandas UDFs only at the genuine
Python boundaries (binary document text extraction), and Structured
Streaming for the incremental path.

Layout
------
- ``session``    SparkSession factory tuned for the driver harness
- ``schemas``    single source of truth for every table schema (SURVEY §1.3)
- ``tables``     parquet loaders for the driver testdata star schema
- ``functions``  scalar column expressions (SURVEY §2.4 F1-F5, §2.2 P3-P13)
- ``operators``  relational + extended operators (SURVEY §2.2-2.3, §2.10)
- ``sources``    excel / binary-document / parquet readers (SURVEY §2.1)
- ``plans``      the registered query library backing __spark_entry__
- ``streaming``  incremental micro-batch + windowed aggregation (SURVEY §2.7)
- ``pipeline``   the two reference entry-point dataflows (SURVEY §3)
"""

__version__ = "0.1.0"
