"""bistro_spark — a from-scratch PySpark-native streaming column-calculus engine.

Reproduces the query semantics of the public ``asavinov/bistro`` engine
(calc / link / project / accumulate / roll columns; product / where / range
tables; delta-driven incremental evaluation; the Bistro Streams layer) as a
thin declarative API that compiles to DataFrame / Structured Streaming plans,
so Catalyst + Tungsten + the state store provide optimization, vectorization,
incrementality and exactly-once — none of which the reference has.

This is NOT a port: the reference (Java, ``core/.../core/Schema.java``,
``Column.java``, ``Table.java``) evaluates per-row lambdas over in-memory
arrays in a single thread; here every operator is expressed with built-in
``pyspark.sql.functions`` (JVM whole-stage codegen) or Arrow-vectorized
pandas UDFs, and distributes over executors.
"""

from bistro_spark.schema import Schema, Table
from bistro_spark.session import get_spark

__all__ = ["Schema", "Table", "get_spark"]
__version__ = "0.1.0"
