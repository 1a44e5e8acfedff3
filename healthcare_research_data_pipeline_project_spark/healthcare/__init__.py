"""Reference-parity healthcare domain layer.

The reference's warehouse is a star schema fed by an RDBMS; here the
warehouse is *derived deterministically from the driver's TPC-H
tables* through engine-portable hash-based mapping SQL (`mapping.py`),
so the reference's 10 analytics queries (`queries10.py`) run
identically — and oracle-checkably — in Spark SQL and DuckDB.

`generator.py` additionally reproduces the reference's standalone
synthetic-data generator (seeded, distribution-parity) as a
Spark-native distributed generator for tests that need raw-shaped
data (ETL parity paths).
"""
