"""Sources & sinks: deterministic synthetic tables (pages per BASELINE.json's
input_hint, features per the reference's data model), format codecs
(GeoJSON / GeoJSON-seq / geo-CSV / Spaten fixture reader), and the tile sink.
"""
