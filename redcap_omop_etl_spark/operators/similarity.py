"""Similarity search over embedding columns: brute-force and LSH-bucketed.

Net-new LLM-data-pipeline surface (BASELINE.json north star).
"""

from __future__ import annotations
