"""Regenerate COVERAGE.md's auto-generated registry appendix in place."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redcap_omop_etl_spark import workload

MARK = "\n## Appendix: full workload registry (auto-generated)\n"


def main() -> None:
    workload._ensure_loaded()
    rows = []
    for name, spec in sorted(workload.REGISTRY.items()):
        mod = spec.fn.__module__.split(".")[-1]
        kind = "oracled" if spec.oracle else "rows-only (by design)"
        rows.append(f"| `{name}` | `{mod}` | {kind} |")
    section = (
        MARK
        + "\nEvery `queries()` entry, its module, and its correctness mode.\n"
        + "Regenerate with `python tools/regen_coverage_appendix.py`.\n\n"
        + "| query | module | gate |\n|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    text = open(path).read()
    head = text.split(MARK)[0]
    open(path, "w").write(head + section)
    print(f"wrote {len(rows)} registry rows")


if __name__ == "__main__":
    main()
