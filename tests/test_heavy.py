"""Heavy hitters (Misra-Gries sketch + exact recount) vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parquetjs_ray.functions.heavy import heavy_hitters, _mg_compress


def _brute(values, phi_num, phi_den):
    vals, counts = np.unique(np.asarray(values), return_counts=True)
    n = len(values)
    keep = counts * phi_den >= n * phi_num
    order = np.lexsort((vals[keep], -counts[keep]))
    return list(zip(vals[keep][order].tolist(), counts[keep][order].tolist()))


def _run(values, phi_num, phi_den, **kw):
    ds = rd.from_arrow(pa.table({"v": pa.array(values)})).repartition(8)
    t = heavy_hitters(ds, "v", phi_num=phi_num, phi_den=phi_den, **kw)
    return list(zip(t["key"].to_pylist(), t["n"].to_pylist()))


def test_mg_compress_superset_bound():
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 1000, 64).astype(np.int64)
    keys = pa.array([f"k{i}" for i in range(64)])
    kept_keys, kept = _mg_compress(keys, counts, 10)
    assert len(kept) <= 10
    # every kept count underestimates by at most the subtracted offset
    orig = dict(zip(keys.to_pylist(), counts.tolist()))
    for key, c in zip(kept_keys.to_pylist(), kept.tolist()):
        assert 0 < c <= orig[key]


def test_heavy_hitters_zipf_exact(ray_session):
    rng = np.random.default_rng(11)
    vals = (rng.zipf(1.5, 20000) % 500).astype(np.int64)
    assert _run(vals, 1, 100) == _brute(vals, 1, 100)


def test_heavy_hitters_uniform_none_qualify(ray_session):
    # 10k distinct singletons, phi=1%: nothing qualifies, and the
    # carrier rows must still count N exactly (no false positives)
    vals = np.arange(10000, dtype=np.int64)
    assert _run(vals, 1, 100) == []


def test_heavy_hitters_equal_singleton_batches(ray_session):
    # adversarial for the sketch: every batch holds k+1 equal-count keys
    # so MG compression drops ALL counters; one global key still crosses
    # the threshold and must be found with its exact count
    vals = np.concatenate([np.arange(5000), np.full(600, 77)]).astype(np.int64)
    rng = np.random.default_rng(3)
    rng.shuffle(vals)
    assert _run(vals, 1, 10) == _brute(vals, 1, 10)


def test_heavy_hitters_words(ray_session):
    docs = ["the cat sat", "the dog", "the cat ran far away today"] * 50
    ds = rd.from_arrow(pa.table({"v": pa.array(docs)})).repartition(4)
    t = heavy_hitters(ds, "v", phi_num=1, phi_den=10, split_words=True)
    flat = " ".join(docs).split(" ")
    assert list(zip(t["key"].to_pylist(), t["n"].to_pylist())) == _brute(flat, 1, 10)


def test_heavy_hitters_rejects_bad_phi(ray_session):
    with pytest.raises(ValueError):
        _run([1, 2, 3], 0, 100)
