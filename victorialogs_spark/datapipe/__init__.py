"""LLM-training-data pipeline operators: dedup, similarity/ANN search,
text analysis, multimodal column plumbing. See dedup.py, similarity.py,
text.py, multimodal.py."""
