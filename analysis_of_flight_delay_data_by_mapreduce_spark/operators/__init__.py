"""Reusable operators.

- ``aggregates``  : the reference's relational surface (SURVEY §2.2-2.3)
                    as generic, composable DataFrame transforms
- ``dedup``       : exact + near-duplicate detection (extension tier)
- ``similarity``  : embedding top-k similarity search (extension tier)
- ``text``        : language-ID, quality scoring, token counting,
                    fingerprinting (extension tier)
- ``multimodal``  : binary-column plumbing with pandas-UDF decode slots
- ``sessions``    : gap sessionization, gaps-and-islands SCD2 intervals,
                    changelog compaction (latest state per key)
"""
