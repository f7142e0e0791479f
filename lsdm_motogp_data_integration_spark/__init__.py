"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ``salvatoreChiacchio0/LSDM-MotoGP-Data-Integration``
(a Pentaho Kettle ETL over MotoGP data), re-expressed Spark-first.

Layout
------
- ``session``    SparkSession factory tuned for local testing, scale-ready.
- ``schemas``    StructTypes for the reference's 11 sources + testdata tables.
- ``sources``    readers (csv/json/parquet with declared schemas), writers.
- ``functions``  scalar helpers: jaro-winkler, name normalization,
                 multi-format date parsing, code-map lookup.
- ``operators``  relational/custom operators: surrogate keys, similarity
                 (fuzzy) join, dedup family, ANN search, text analysis,
                 sessionization, multimodal plumbing.
- ``pipelines``  the 7 integrated MotoGP output tables (SURVEY.md §1.4),
                 one module per sink, built on the operators.
- ``streaming``  Structured Streaming variants of the event pipelines.
- ``plans``      plan-inspection helpers (explain/pushdown assertions).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
