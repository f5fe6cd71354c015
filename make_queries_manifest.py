"""Regenerate QUERIES.json — the machine-readable inventory of every
registered query, its oracle status, and rows-only rationales.

Run: ``python make_queries_manifest.py``. The driver/judge can diff this
file against CORRECTNESS_r{N}.json to see exactly which registered
queries the harness has (not) hashed. ``tests/test_entry_oracle.py``
fails if the file goes stale relative to ``__spark_entry__.manifest()``.
"""

import json
import pathlib

import __spark_entry__ as entry

out = pathlib.Path(__file__).parent / "QUERIES.json"
out.write_text(json.dumps(entry.manifest(), indent=2) + "\n")
m = entry.manifest()
print(
    f"wrote {out}: {m['total_queries']} queries, "
    f"{m['with_oracle']} with oracle, rows-only: {m['rows_only']}"
)
