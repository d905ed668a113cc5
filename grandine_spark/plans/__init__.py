"""Pipeline assembly: checkpointed, resumable, lineage-tracked stages."""
