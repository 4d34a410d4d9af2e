"""Side indexes: token-bloom file pruning for word filters (bloom.py)."""
