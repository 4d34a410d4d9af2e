"""Data sources: distributed NDJSON ingestion (ndjson.py)."""
