"""cl_readability_spark — PySpark-native main-content extraction engine.

A from-scratch reimplementation of the Readability.js main-content
extraction algorithm (the capability surface of atlas-engineer/cl-readability,
see SURVEY.md) designed for Spark:

- ``core``     — the pure-Python extraction algorithm (DOM parse, candidate
                 scoring, grab-article retry loop).  No Spark imports; ships
                 to executors via ``--py-files``.
- ``pipeline`` — the Spark shell: vectorized pandas/Arrow UDFs, conv_id-salted
                 repartitioning, checkpoint/resume anti-join, metrics sidecar.
- ``functions``— DataFrame-level twins of the SQL-expressible sub-operators
                 (used for DuckDB oracle checks) plus training-data-pipeline
                 text ops (dedup, token counting, quality scoring).
"""

__version__ = "0.1.0"
