"""Engine operators: spatial join, tiling pipeline, kNN, raster↔vector,
dedup family, similarity search. Each is a function DataFrame → DataFrame —
the engine's "query surface" is the DataFrame API itself (the reference has
no SQL layer; its pipelines are fixed dataflows, SURVEY.md §1.2)."""
