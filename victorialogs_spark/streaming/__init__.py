"""Streaming: Structured Streaming ingest + retention/compaction
(ingest.py) and live tail (tail.py)."""
