"""Oracle byte-faithfulness + size model + synth generator determinism."""

import numpy as np
import pytest

from parquetjs_ray.codecs import rle
from parquetjs_ray.oracle.parquetjs_rle import encode_reference
from parquetjs_ray.oracle.size_model import plain_size, reference_table_size
from parquetjs_ray.sources.synth import SCHEMA_TOKENS, generate_shard
import pyarrow as pa


GOLDENS = [
    ([0, 1, 2, 3, 4, 5, 6, 7], 3, bytes([0x03, 0x88, 0xC6, 0xFA])),
    ([0, 1, 2, 3, 4, 5, 6, 7, 6, 5], 3, bytes([0x05, 0x88, 0xC6, 0xFA, 0x2E, 0x00, 0x00])),
    ([42] * 8, 6, bytes([0x10, 0x2A])),
    (
        [0, 1, 2, 3, 4, 5, 6, 7, 4, 4, 4, 4, 4, 4, 4, 4, 0, 1, 2, 3, 4, 5, 6, 7],
        3,
        bytes([0x03, 0x88, 0xC6, 0xFA, 0x10, 0x04, 0x03, 0x88, 0xC6, 0xFA]),
    ),
]


@pytest.mark.parametrize("values,width,expected", GOLDENS)
def test_oracle_matches_reference_goldens(values, width, expected):
    assert encode_reference(values, width, disable_envelope=True) == expected


@pytest.mark.parametrize("seed", range(5))
def test_oracle_decodable_by_production_decoder(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 8, 500, dtype=np.uint64)
    vals[100:200] = 5  # force repeated runs
    buf = encode_reference(vals, 3, disable_envelope=True)
    got = rle.decode(buf, len(vals), 3, disable_envelope=True)
    assert got.tolist() == vals.tolist()


def test_plain_size_model():
    assert plain_size(pa.array([1, 2, 3], type=pa.int32())) == 12
    assert plain_size(pa.array([1, 2, 3], type=pa.int64())) == 24
    assert plain_size(pa.array(["ab", "c"], type=pa.string())) == 8 + 3
    assert plain_size(pa.array([True] * 9)) == 2


def test_reference_table_size_sanity():
    tbl = generate_shard(0, 2000, seed=7)
    sizes = reference_table_size(tbl)
    n_tokens = sum(len(t) for t in tbl["tokens"].to_pylist())
    # tokens column dominated by 4 B/token PLAIN values
    assert sizes["per_column"]["tokens"] > 4 * n_tokens
    assert sizes["per_column"]["n_tok"] > 4 * 2000
    assert sizes["total"] > sum(sizes["per_column"].values())


def test_synth_deterministic_and_valid():
    a = generate_shard(3, 500, seed=42)
    b = generate_shard(3, 500, seed=42)
    assert a.equals(b)
    assert a.schema.equals(SCHEMA_TOKENS)
    n_tok = a["n_tok"].to_numpy()
    lens = np.array([len(t) for t in a["tokens"].to_pylist()])
    assert (n_tok == lens).all()  # invariant from FIXTURES.md F1
    assert a["doc_id"].to_pylist()[0].startswith("src")
    # shards differ
    c = generate_shard(4, 500, seed=42)
    assert not a.equals(c)


def test_synth_skew():
    t = generate_shard(0, 5000, seed=42, zipf_s=2.0)
    counts = {}
    for s in t["source"].to_pylist():
        counts[s] = counts.get(s, 0) + 1
    top = max(counts.values()) / 5000
    assert top > 0.5  # hot source dominates at s=2.0
