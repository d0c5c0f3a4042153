"""Operators: relational, EAV/restructuring, dedup, similarity, text, windows."""
