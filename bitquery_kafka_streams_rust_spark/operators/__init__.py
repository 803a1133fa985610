"""Relational operators: filters, extraction, dedup, aggregates,
similarity search, skew handling."""
