"""crate_spark — a PySpark-native analytics engine with the query
capabilities of CrateDB (reference: /root/reference, crate/crate).

Architecture: Spark SQL / Catalyst over Parquet. The reference's
shard/phase/transport execution machinery (BatchIterator pipelines,
MODULO/BROADCAST distribution, circuit breakers) maps onto Spark's
built-in task scheduling, shuffle exchanges and Tungsten codegen; this
package supplies the *semantic* layer on top:

- ``session``   — SparkSession factory, engine confs, table catalog
- ``functions`` — scalar/aggregate functions CrateDB has and Spark lacks
- ``operators`` — composite operators (kNN, dedup, text analysis)
- ``queries``   — the oracle-checked operator inventory (SURVEY.md §2)
"""

__version__ = "0.1.0"
