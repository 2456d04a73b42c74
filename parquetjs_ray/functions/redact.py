"""Regex redaction / normalization over a text column.

The PII-scrubbing pass of a training-data pipeline: replace every match
of a set of named patterns with a placeholder and report per-document
match counts. Everything is vectorized through Arrow's RE2 kernels
(``replace_substring_regex`` / ``count_substring_regex``) — no Python
per row, no state, no shuffle: one streaming ``map_batches`` stage.

DuckDB's regex engine is also RE2, so any pattern used here behaves
identically in ``regexp_replace(..., 'g')`` — the operator is
SQL-oracle-checkable including the full redacted text
(``oracle_sql()['redact_docs']``).

``PII_PATTERNS`` are the standard defaults (email, IPv4, long digit
runs / phone-like sequences); callers pass their own dict for
corpus-specific scrubbing.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["PII_PATTERNS", "redact"]

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\s().-]{7,}\d",
}


def redact(
    ds: rd.Dataset,
    patterns: dict[str, str] | None = None,
    *,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    counts: bool = True,
) -> rd.Dataset:
    """Replace matches of each named pattern with ``replacement``.

    Patterns apply in dict order (earlier redactions can mask later
    patterns — e.g. an email redacted first won't also count as a
    phone-like digit run). With ``counts=True`` a ``n_<name>`` int64
    column per pattern records how many matches each document had."""
    pats = dict(patterns if patterns is not None else PII_PATTERNS)

    def stage(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        for name, pat in pats.items():
            if counts:
                batch = batch.append_column(
                    f"n_{name}",
                    pc.count_substring_regex(col, pat).cast(pa.int64()),
                )
            col = pc.replace_substring_regex(col, pat, replacement)
        return batch.set_column(
            batch.schema.get_field_index(text_col), text_col, col
        )

    return ds.map_batches(stage, batch_format="pyarrow")
