"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.9) — resumability there comes from
checkpoints, not streams. This module adds the streaming ingest a continuous
web-crawl feed would need: pages stream → geocode → cell index → watermarked
windowed per-cell counts, and a streaming tile-assignment pass-through. Both
are the same native expressions as the batch operators (the DataFrame code is
shared), so batch/stream parity is structural.
"""
