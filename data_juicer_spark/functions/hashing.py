"""Hash/fingerprint column builders."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_sha256(col: Column) -> Column:
    """The per-row parity invariant hash (BASELINE.json input_hint)."""
    return F.sha2(col, 256)


def doc_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of lowercased text stripped of
    non-alphanumerics (the document_deduplicator normalize-then-hash
    shape, /root/reference/data_juicer/ops/deduplicator/
    document_deduplicator.py:63-66) — SQL-expressible on any engine."""
    return F.md5(F.regexp_replace(F.lower(col), r"[^a-z0-9]", ""))
