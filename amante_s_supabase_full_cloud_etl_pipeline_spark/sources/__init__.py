"""Batch/streaming ingestion sources and sinks."""
