"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Net-new LLM-data-pipeline surface (BASELINE.json north star). Filled in
alongside the documents-table workload queries.
"""

from __future__ import annotations
