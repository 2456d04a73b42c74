"""Deterministic north-rule table generator (FIXTURES.md F1).

Schema: ``doc_id:string, tokens:list<int32>, n_tok:int32, source:string``.
Generation is seeded **per shard** so any shard can be produced
independently and identically on any worker — the property that makes
the fixture shardable to arbitrary scale (the same scheme would feed a
multi-node generation job; here shards are written sequentially or via
Ray tasks).

Distributions (see FIXTURES.md):
* ``source``: 20 names, Zipf-weighted (hot-source skew, exercises the
  salted repartition);
* token counts ~ lognormal(ln 512, 0.6) clamped to [8, 8192];
* token ids Zipf-ranked over vocab 50257 with a per-source base offset
  (FOR-friendly) and injected repeat-runs in ~10% of rows (RLE-friendly);
* ``doc_id`` = ``src{source:02d}/doc{row:012d}`` (FSST-friendly).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["SCHEMA_TOKENS", "SOURCES", "generate_shard", "write_synth", "fruits_table"]

SCHEMA_TOKENS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

SOURCES = [
    "cc", "wiki", "code", "books", "news", "forum", "law", "med",
    "math", "web2", "chat", "mail", "sub", "paper", "patent", "ref",
    "social", "edu", "gov", "misc",
]
VOCAB = 50257


_ZIPF_CDF: np.ndarray | None = None


def _zipf_ranks(rng: np.random.Generator, n: int, a: float = 1.3) -> np.ndarray:
    """Bounded Zipf(a) ranks in [1, VOCAB] via a cached inverse-CDF table."""
    global _ZIPF_CDF
    if _ZIPF_CDF is None:
        pmf = np.arange(1, VOCAB + 1, dtype=np.float64) ** (-a)
        _ZIPF_CDF = np.cumsum(pmf / pmf.sum())
    return np.searchsorted(_ZIPF_CDF, rng.random(n)) + 1


def _source_weights(s: float) -> np.ndarray:
    w = np.arange(1, len(SOURCES) + 1, dtype=np.float64) ** (-s)
    return w / w.sum()


def generate_shard(
    shard_id: int,
    rows: int,
    *,
    seed: int = 42,
    zipf_s: float = 1.3,
    row_offset: int | None = None,
) -> pa.Table:
    """One deterministic shard of the north-rule table."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, shard_id]))
    row0 = shard_id * rows if row_offset is None else row_offset

    src_idx = rng.choice(len(SOURCES), size=rows, p=_source_weights(zipf_s)).astype(np.int32)
    lens = np.clip(rng.lognormal(np.log(512), 0.6, rows), 8, 8192).astype(np.int64)
    total = int(lens.sum())

    # token ids: bounded-Zipf ranks (inverse-CDF table; np.random.zipf's
    # rejection sampler is pathologically slow for a < 2) + per-source base
    ranks = _zipf_ranks(rng, total)
    base = (src_idx.astype(np.int64) * 997) % 20000
    flat = np.minimum(np.repeat(base, lens) + ranks, VOCAB - 1).astype(np.int32)

    # inject repeat-runs into ~10% of rows (RLE-friendly)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    run_rows = np.flatnonzero(rng.random(rows) < 0.10)
    if len(run_rows):
        run_lens = np.minimum(lens[run_rows] // 2, 64)
        run_starts = offsets[run_rows]
        run_vals = flat[run_starts]  # repeat the row's first token
        idx = np.repeat(run_starts, run_lens) + (
            np.arange(int(run_lens.sum())) - np.repeat(np.cumsum(run_lens) - run_lens, run_lens)
        )
        flat[idx] = np.repeat(run_vals, run_lens)

    row_ids = np.arange(row0, row0 + rows, dtype=np.int64)
    doc_id = np.char.add(
        np.char.add("src", np.char.zfill(src_idx.astype("U2"), 2)),
        np.char.add("/doc", np.char.zfill(row_ids.astype("U12"), 12)),
    )

    tokens = pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32)), pa.array(flat))
    return pa.Table.from_arrays(
        [
            pa.array(doc_id.tolist(), type=pa.string()),
            tokens,
            pa.array(lens.astype(np.int32)),
            pa.array([SOURCES[i] for i in src_idx], type=pa.string()),
        ],
        schema=SCHEMA_TOKENS,
    )


def write_synth(
    out_dir: str,
    n_rows: int,
    *,
    n_shards: int = 8,
    seed: int = 42,
    zipf_s: float = 1.3,
    overwrite: bool = False,
) -> list[str]:
    """Write the fixture as ``n_shards`` parquet files; cached unless overwrite."""
    os.makedirs(out_dir, exist_ok=True)
    rows_per = (n_rows + n_shards - 1) // n_shards
    paths = []
    for s in range(n_shards):
        rows = min(rows_per, n_rows - s * rows_per)
        if rows <= 0:
            break
        path = os.path.join(out_dir, f"shard-{s:05d}.parquet")
        paths.append(path)
        if overwrite or not os.path.exists(path):
            tbl = generate_shard(s, rows, seed=seed, zipf_s=zipf_s, row_offset=s * rows_per)
            pq.write_table(tbl, path)
    return paths


def fruits_table(repeats: int = 1) -> pa.Table:
    """Nested fixture mirroring the reference integration schema
    (`/root/reference/test/integration.js:12-97`), Arrow-expressible subset
    (FIXTURES.md F3). Exercises nulls, empty lists, and nested repeated."""
    rows = []
    for i in range(repeats):
        rows += [
            {
                "name": f"apples-{i}",
                "quantity": 10,
                "price": 2.6,
                "day": 18262,
                "finger": b"FNORD",
                "stock": [{"quantity": [10], "warehouse": "A"}, {"quantity": [20], "warehouse": "B"}],
                "colour": ["green", "red"],
            },
            {
                "name": f"oranges-{i}",
                "quantity": 20,
                "price": 2.7,
                "day": 18263,
                "finger": b"ABCDE",
                "stock": [{"quantity": [50, 75], "warehouse": "X"}],
                "colour": ["orange"],
            },
            {
                "name": f"kiwi-{i}",
                "quantity": None,
                "price": 4.2,
                "day": 18264,
                "finger": b"XXXXX",
                "stock": [{"quantity": None, "warehouse": "X"}, {"quantity": [500], "warehouse": "P"}],
                "colour": ["green", "brown"],
            },
            {
                "name": f"banana-{i}",
                "quantity": None,
                "price": 3.2,
                "day": 18265,
                "finger": b"12345",
                "stock": [],
                "colour": ["yellow"],
            },
        ]
    schema = pa.schema(
        [
            ("name", pa.string()),
            ("quantity", pa.int64()),
            ("price", pa.float64()),
            ("day", pa.date32()),
            ("finger", pa.binary(5)),
            (
                "stock",
                pa.list_(
                    pa.struct([("quantity", pa.list_(pa.int64())), ("warehouse", pa.string())])
                ),
            ),
            ("colour", pa.list_(pa.string())),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)
