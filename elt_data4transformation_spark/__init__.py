"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ELT stack (cfischa/elt_data4transformation).

Everything is expressed Spark-first: DataFrame/SQL logical plans that
Catalyst optimizes (pushdown, pruning, broadcast, AQE), with Pandas UDFs
only where built-ins cannot express the semantics.

Layout:
- ``session``    — SparkSession factory with scale-aware defaults
- ``sources``    — table loaders / sinks (parquet, csv, json, upsert)
- ``functions``  — scalar/column expression library (hashes, dates, text)
- ``operators``  — reusable DataFrame transformations (dedup, windows,
                   similarity, latest-wins, merge-policy upsert, ...)
- ``plans``      — named end-to-end queries (the SURVEY §2 inventory),
                   each registered with a DuckDB oracle for correctness
- ``streaming``  — Structured Streaming renditions of the incremental
                   patterns (watermarks, stateful dedup, snapshot diff)
"""

__version__ = "0.1.0"
