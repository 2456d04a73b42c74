"""Broadcast encode-plan artifacts and their on-disk persistence.

The sampling pass builds one :class:`EncodePlan` on the driver —
the global ``source`` dictionary, the FSST symbol table for ``doc_id``,
per-column sampled stats — which is then ``ray.put`` once and read by
every encoder/decoder actor in ``__init__`` (never re-shipped per
batch). The same plan is persisted under ``<out_dir>/_artifacts/`` so a
decode-only job (or a resumed run) can rebuild actors without the
original driver state. This replaces the reference's thrift footer
metadata (`/root/reference/lib/writer.js:520-569`) as the engine's
"schema + how it was encoded" record.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa

from ..codecs.fsst import FsstTable

__all__ = ["ColumnStats", "EncodePlan", "save_plan", "load_plan"]

FORMAT_VERSION = 5  # v5: per-chunk column aggregates for manifest-only pushdown (v2-v4 artifacts remain readable)


@dataclass
class ColumnStats:
    """Merged sampled statistics driving the codec selector."""

    count: int = 0
    null_count: int = 0
    min: int | None = None
    max: int | None = None
    distinct_est: int | None = None
    mean_run: float = 1.0  # mean equal-value run length
    avg_len: float = 0.0  # strings: mean byte length
    fsst_ratio: float | None = None  # sampled encoded/raw ratio
    token_remap_gain: float | None = None  # sampled rank-dict/raw size ratio


@dataclass
class EncodePlan:
    source_dict: list[str] = field(default_factory=list)
    source_hist: dict[str, int] = field(default_factory=dict)  # sampled per-source counts (skew/salting)
    fsst_symbols: list[bytes] = field(default_factory=list)
    stats: dict[str, ColumnStats] = field(default_factory=dict)
    token_dict_column: str | None = None  # list<int> column with a rank dict
    token_dict_vals: list[int] = field(default_factory=list)  # rank → value
    bloom_columns: list[str] = field(default_factory=list)  # per-chunk Bloom filters (== pruning)
    # codec speed/size profile: "fast" never selects vpack (fewest encode/
    # decode passes, r2-era throughput), "balanced" (default) requires a
    # ≥10% size win, "small" takes any size win
    profile: str | None = None
    version: int = FORMAT_VERSION

    def source_dict_array(self) -> pa.Array:
        return pa.array(self.source_dict, type=pa.string())

    def fsst_table(self) -> FsstTable | None:
        return FsstTable(self.fsst_symbols) if self.fsst_symbols else None


def save_plan(plan: EncodePlan, out_dir: str) -> str:
    from .. import storage as st

    art = st.join(out_dir, "_artifacts")
    st.makedirs(art)
    doc = {
        "version": plan.version,
        "source_dict": plan.source_dict,
        "source_hist": plan.source_hist,
        "fsst_symbols": [s.hex() for s in plan.fsst_symbols],
        "stats": {k: vars(v) for k, v in plan.stats.items()},
        "token_dict_column": plan.token_dict_column,
        "token_dict_vals": plan.token_dict_vals,
        "bloom_columns": plan.bloom_columns,
        "profile": plan.profile,
    }
    path = st.join(art, "plan.json")
    st.write_json_atomic(path, doc)
    return path


def load_plan(out_dir: str) -> EncodePlan:
    from .. import storage as st

    doc = st.read_json(st.join(out_dir, "_artifacts", "plan.json"))
    return EncodePlan(
        source_dict=doc["source_dict"],
        source_hist=doc.get("source_hist", {}),
        fsst_symbols=[bytes.fromhex(h) for h in doc["fsst_symbols"]],
        stats={k: ColumnStats(**v) for k, v in doc["stats"].items()},
        token_dict_column=doc.get("token_dict_column"),
        token_dict_vals=doc.get("token_dict_vals", []),
        bloom_columns=doc.get("bloom_columns", []),
        profile=doc.get("profile"),
        version=doc["version"],
    )
