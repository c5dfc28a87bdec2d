"""Shared utilities: profiling spans, offline-artifact checkpointing."""
