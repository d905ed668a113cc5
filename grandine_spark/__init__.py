"""grandine_spark — a from-scratch PySpark-native spatial-join + vector-tiling engine.

Re-expresses the semantics of the reference geodata toolkit (thomersch/grandine,
a Go MVT tiler, surveyed in SURVEY.md) as an idiomatic Spark engine:

- geometry/tile kernels are pure numpy (``grandine_spark.kernels``), exercised
  either as vectorized pandas UDFs or inside ``applyInPandas`` groups;
- cell indexing (slippy-map z/x/y — the engine's H3/S2 analog) is expressed in
  *native Spark SQL expressions* so Catalyst keeps it inside WholeStageCodegen
  (``grandine_spark.functions.tile_exprs``);
- the spatial join is a cell-equi-join (broadcast when the polygon side is
  small) + vectorized ray-casting point-in-polygon refinement
  (``grandine_spark.operators.spatial_join``);
- the tiler is a DataFrame DAG: zoom filter → coverage explode → salted
  repartition → groupBy(z,x,y) → applyInPandas(MVT encode)
  (``grandine_spark.operators.tiling``);
- web-scale text ops (dedup, similarity, language-ID, quality) live in
  ``grandine_spark.operators.dedup`` / ``similarity`` / ``functions.text``.
"""

__version__ = "0.1.0"
