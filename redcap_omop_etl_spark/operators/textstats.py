"""Text analysis operators: language-ID, quality scoring, token counts,
document fingerprinting.

Net-new LLM-data-pipeline surface (BASELINE.json north star).
"""

from __future__ import annotations
