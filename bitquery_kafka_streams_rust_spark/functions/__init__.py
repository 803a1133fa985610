"""Column-builder functions: token arrays, text analysis, encodings."""
