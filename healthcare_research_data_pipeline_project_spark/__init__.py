"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference healthcare research data pipeline
(Justinxy23/Healthcare-Research-Data-Pipeline-Project), re-expressed
Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE, shuffle sizing, Arrow).
- ``tables``     : loaders for the driver's parquet star schema.
- ``functions/`` : scalar helpers (deterministic numerics, security,
                   text analysis, vector math).
- ``operators/`` : reusable relational / dedup / similarity operators.
- ``queries/``   : the query corpus wired to the test tables, each with
                   a DuckDB oracle twin.
- ``healthcare/``: reference-parity domain layer (schemas, generator,
                   ETL, the 10 analytics queries, RCA, reporting).
- ``sources/``   : readers (csv/json/jdbc/hl7-fhir) and sinks (upsert,
                   json, cache).
- ``streaming/`` : Structured Streaming surveillance operators.
- ``multimodal/``: binary-column plumbing for image/audio payloads.
- ``plans/``     : physical-plan inspection helpers (pushdown,
                   broadcast, codegen assertions).

Design notes (100 TB posture)
-----------------------------
Every operator is declarative DataFrame/SQL first so Catalyst applies
predicate pushdown, column pruning, join reordering and AQE (skew join,
partition coalescing). Python touches data only through Arrow-batched
pandas UDFs, and only where JVM builtins cannot express the semantics
(none of the reference's operators need it). No driver-side row loops.
"""

__version__ = "0.1.0"
