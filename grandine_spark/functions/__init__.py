"""Column-expression library — JVM-side (Catalyst/WholeStageCodegen) functions.

Everything here is built from ``pyspark.sql.functions`` only: no Python UDFs.
These are the engine's hot-path expressions (cell indexing, bbox predicates,
geocoding, text quality metrics); the numpy kernels in
``grandine_spark.kernels`` are reserved for genuinely non-relational geometry
(PIP refinement, clipping, MVT encoding).
"""
