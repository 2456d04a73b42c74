"""Hash sampling, source mixing, and sequence-packing operator tests."""

import numpy as np
import pyarrow as pa
import pytest

from parquetjs_ray.functions.packing import pack_sequences
from parquetjs_ray.functions.sampling import (
    hash_keep_mask,
    mix_sources,
    stratified_sample,
)


def _corpus(n=2000, n_sources=4, seed=7):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)  # unsorted on purpose
    src = np.array([f"s{i % n_sources}" for i in range(n)])
    n_tok = rng.integers(1, 400, size=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "source": pa.array(src),
            "n_tok": pa.array(n_tok),
        }
    )


def test_hash_keep_mask_deterministic_and_rate():
    ids = np.arange(100_000, dtype=np.int64)
    m1 = hash_keep_mask(ids, 250_000)
    m2 = hash_keep_mask(ids, 250_000)
    assert np.array_equal(m1, m2)
    # ±2% of the requested 25% on 100k uniform keys
    assert abs(m1.mean() - 0.25) < 0.02
    # different seed -> different (but still deterministic) subset
    m3 = hash_keep_mask(ids, 250_000, seed=1)
    assert not np.array_equal(m1, m3)
    # monotone: raising the rate only adds rows
    m4 = hash_keep_mask(ids, 500_000)
    assert np.all(m4[m1])


def test_stratified_sample_batch_independent(ray_session):
    import ray.data as rd

    t = _corpus()
    rates = {"s0": 1_000_000, "s1": 500_000, "s2": 0}  # s3 absent -> dropped
    out_1 = (
        stratified_sample(rd.from_arrow(t), rates).take_all()
    )
    out_many = (
        stratified_sample(
            rd.from_arrow(t).repartition(13), rates
        ).take_all()
    )
    k1 = sorted(r["doc_id"] for r in out_1)
    k2 = sorted(r["doc_id"] for r in out_many)
    assert k1 == k2  # block layout cannot change the sample
    by_src = {}
    for r in out_1:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src.get("s0", [])) == 500  # rate 1.0 keeps everything
    assert "s2" not in by_src and "s3" not in by_src
    assert 0 < len(by_src["s1"]) < 500


def test_mix_sources_rates(ray_session):
    import ray.data as rd

    # skewed counts: s0 has 4x the rows of s1
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(2500, dtype=np.int64)),
            "source": pa.array(["s0"] * 2000 + ["s1"] * 500),
        }
    )
    out = mix_sources(rd.from_arrow(t)).take_all()
    by = {}
    for r in out:
        by.setdefault(r["source"], 0)
        by[r["source"]] += 1
    # equal mixing targets min_count=500 from each source; hash sampling
    # is approximate for the downsampled stratum, exact for the full one
    assert by["s1"] == 500
    assert abs(by["s0"] - 500) < 75


def test_temperature_mix_flattens_skew(ray_session):
    """α=½ temperature mixing: a 16:1 skew flattens toward 4:1 (sqrt of
    the count ratio), deterministically — and never upsamples."""
    import ray.data as rd

    from parquetjs_ray.functions.sampling import temperature_mix

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(3400, dtype=np.int64)),
            "source": pa.array(["big"] * 3200 + ["small"] * 200),
        }
    )
    out = temperature_mix(rd.from_arrow(t)).take_all()
    by = {}
    for r in out:
        by[r["source"]] = by.get(r["source"], 0) + 1
    # weights isqrt: big=56, small=14 -> W=70; N = min(3200*70//56,
    # 200*70//14) = 1000; targets: big 800, small 200 (kept whole)
    assert by["small"] == 200
    assert abs(by["big"] - 800) < 90  # hash sampling approximates the rate
    # deterministic: identical output on a rerun
    again = temperature_mix(rd.from_arrow(t)).take_all()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_pack_sequences_matches_reference_scan(ray_session):
    import ray.data as rd

    t = _corpus()
    got = pack_sequences(rd.from_arrow(t), capacity=512, bucket_width=128).take_all()
    got_by_id = {r["doc_id"]: r["window_id"] for r in got}
    assert len(got_by_id) == t.num_rows

    # brute-force single-threaded reference: per source, docs in id order,
    # exclusive cumsum // capacity
    ids = t["doc_id"].to_numpy()
    srcs = t["source"].to_pylist()
    toks = t["n_tok"].to_numpy()
    rows = sorted(zip(srcs, ids, toks))
    run_src, run = None, 0
    for s, i, tk in rows:
        if s != run_src:
            run_src, run = s, 0
        assert got_by_id[int(i)] == run // 512, (s, i)
        run += int(tk)


def test_pack_sequences_bucket_width_invariant(ray_session):
    import ray.data as rd

    t = _corpus(n=500)
    a = pack_sequences(rd.from_arrow(t), capacity=300, bucket_width=32).take_all()
    b = pack_sequences(rd.from_arrow(t).repartition(11), capacity=300, bucket_width=4096).take_all()
    ka = sorted((r["doc_id"], r["window_id"]) for r in a)
    kb = sorted((r["doc_id"], r["window_id"]) for r in b)
    assert ka == kb


def test_epoch_shuffle_deterministic_permutation(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parquetjs_ray.functions.sampling import epoch_shuffle

    tbl = pa.table({"doc_id": pa.array(np.arange(500, dtype=np.int64))})
    a = [r["doc_id"] for r in epoch_shuffle(rd.from_arrow(tbl), seed=1).take_all()]
    b = [r["doc_id"] for r in epoch_shuffle(rd.from_arrow(tbl), seed=1).take_all()]
    c = [r["doc_id"] for r in epoch_shuffle(rd.from_arrow(tbl), seed=2).take_all()]
    assert a == b                     # same seed → identical order
    assert a != c                     # different seed → different order
    assert sorted(a) == sorted(c) == list(range(500))  # a permutation
    assert a != list(range(500))      # actually shuffled


def test_reservoir_per_group_exact_k_and_layout_invariant(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import _mix64, reservoir_per_group

    t = _corpus(n=1200, n_sources=5)
    got = reservoir_per_group(rd.from_arrow(t), 17, group_col="source").take_all()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(int(r["doc_id"]))
    assert set(by_src) == {f"s{i}" for i in range(5)}
    # exactly k per group, and exactly the k smallest mix64 ranks
    ids = np.asarray(t["doc_id"])
    src = np.asarray(t["source"]).astype(str)
    h = _mix64(ids.astype(np.uint64))
    for s, members in by_src.items():
        assert len(members) == 17
        want = set(ids[src == s][np.argsort(h[src == s])][:17].tolist())
        assert set(members) == want
    # block-layout invariance: different partitioning, same sample
    again = reservoir_per_group(
        rd.from_arrow(t).repartition(13), 17, group_col="source"
    ).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in again) == sorted(
        (r["source"], r["doc_id"]) for r in got
    )


def test_reservoir_per_group_small_groups(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import reservoir_per_group

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(7, dtype=np.int64)),
            "source": pa.array(["a"] * 5 + ["b"] * 2),
        }
    )
    got = reservoir_per_group(rd.from_arrow(t), 3, group_col="source").take_all()
    counts = {}
    for r in got:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    assert counts == {"a": 3, "b": 2}  # groups smaller than k keep all rows


def test_budget_sample_exact_vs_numpy_and_layout_invariant(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import _mix64, budget_sample

    t = _corpus(n=900, n_sources=3)
    budget = 6000
    got = budget_sample(rd.from_arrow(t), budget, len_col="n_tok").take_all()

    ids = np.asarray(t["doc_id"])
    src = np.asarray(t["source"]).astype(str)
    lens = np.asarray(t["n_tok"])
    h = _mix64(ids.astype(np.uint64))
    want = set()
    for s in np.unique(src):
        m = src == s
        order = np.argsort(h[m], kind="stable")
        cum = np.cumsum(lens[m][order])
        want |= set(ids[m][order[cum <= budget]].tolist())
    assert {int(r["doc_id"]) for r in got} == want
    # cumulative length per source never exceeds the budget
    per_src = {}
    for r in got:
        per_src[r["source"]] = per_src.get(r["source"], 0) + int(r["n_tok"])
    assert all(v <= budget for v in per_src.values())
    # layout invariance + bucket-width invariance
    again = budget_sample(
        rd.from_arrow(t).repartition(13), budget, len_col="n_tok", bucket_bits=4
    ).take_all()
    assert {int(r["doc_id"]) for r in again} == want


def test_budget_sample_budget_smaller_than_any_doc(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import budget_sample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "source": pa.array(["a"] * 5),
            "n_tok": pa.array(np.full(5, 100, np.int64)),
        }
    )
    got = budget_sample(rd.from_arrow(t), 99, len_col="n_tok").take_all()
    assert got == []  # boundary-straddling docs are dropped, never split


def _token_corpus(n=400, n_sources=3, seed=9):
    rng = np.random.default_rng(seed)
    words = np.array(["tok%d" % i for i in range(40)])
    texts = [" ".join(rng.choice(words, size=int(k)).tolist()) for k in rng.integers(2, 30, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{i % n_sources}" for i in range(n)]),
            "text": pa.array(texts),
        }
    )


def test_materialize_windows_stitches_exact_streams(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.packing import materialize_windows
    from parquetjs_ray.functions.tokenize import tokenize

    tbl = _token_corpus()
    tok = tokenize(rd.from_arrow(tbl), top_k=25)
    per_doc = {
        r["doc_id"]: (r["source"], list(r["tokens"])) for r in tok.take_all()
    }
    cap = 64
    got = materialize_windows(
        tokenize(rd.from_arrow(tbl).repartition(7), top_k=25), capacity=cap
    ).take_all()

    # reference: concatenate per source in doc_id order, chop by first-token rule
    streams = {}
    for did in sorted(per_doc):
        src, toks = per_doc[did]
        s = streams.setdefault(src, {"pos": 0, "wins": {}})
        w = s["pos"] // cap
        s["wins"].setdefault(w, []).extend(toks)
        s["pos"] += len(toks)
    want = {
        (src, w): toks for src, s in streams.items() for w, toks in s["wins"].items()
    }
    assert {(r["source"], r["window_id"]): list(r["tokens"]) for r in got} == want
    assert all(r["n_tok"] == len(r["tokens"]) for r in got)


def test_training_shards_end_to_end_encode(ray_session, tmp_path):
    """The full corpus→shards flow: tokenize → materialize windows →
    encode_stream (the north-rule (id, tokens, n_tok, source) shape) →
    decode → per-window token-array equality."""
    import ray.data as rd

    from parquetjs_ray.functions.packing import materialize_windows
    from parquetjs_ray.functions.tokenize import tokenize
    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    tbl = _token_corpus(n=600)
    win = materialize_windows(
        tokenize(rd.from_arrow(tbl), top_k=25), capacity=128
    ).materialize()

    def add_shard_id(b: pa.Table) -> pa.Table:
        # window ids repeat across sources; the artifact id must be unique
        sid = [f"{s}/{w}" for s, w in zip(b["source"].to_pylist(), b["window_id"].to_pylist())]
        return b.append_column("shard_id", pa.array(sid, pa.string()))

    shards = win.map_batches(add_shard_id, batch_format="pyarrow")
    plan = build_plan_from_dataset(shards, fsst_columns=("shard_id",), sample_rows=5_000)
    outdir = str(tmp_path / "shards")
    rep = encode_stream(shards, outdir, plan=plan, id_col="shard_id",
                        target_rows_per_partition=64)
    assert rep["rows"] == win.count()
    back = {r["shard_id"]: list(r["tokens"]) for r in decode_dataset(outdir).take_all()}
    for r in win.take_all():
        key = f'{r["source"]}/{r["window_id"]}'
        assert back[key] == list(r["tokens"]), key


def test_iter_token_batches_budget_and_completeness(ray_session, tmp_path):
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import decode_dataset, encode_stream
    from parquetjs_ray.pipelines.loader import iter_token_batches
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    rng = np.random.default_rng(21)
    n = 500
    lens = rng.integers(1, 60, size=n).astype(np.int64)
    lens[7] = 500  # one row longer than any budget we use
    flat = rng.integers(0, 1000, size=int(lens.sum())).astype(np.int32)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(n)], pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(["s%d" % (i % 3) for i in range(n)]),
        }
    )
    ds = rd.from_arrow(tbl)
    plan = build_plan_from_dataset(ds, sample_rows=1_000)
    outdir = str(tmp_path / "art")
    encode_stream(ds, outdir, plan=plan, target_rows_per_partition=100)

    budget = 300
    batches = list(iter_token_batches(outdir, budget))
    # every row exactly once, stream order = decode order
    got_ids = [i for b in batches for i in b["doc_id"].to_pylist()]
    want_ids = [
        i for b in decode_dataset(outdir).iter_batches(batch_format="pyarrow", batch_size=None)
        for i in b["doc_id"].to_pylist()
    ]
    assert got_ids == want_ids and sorted(got_ids) == sorted(f"d{i}" for i in range(n))
    by_id = dict(zip([f"d{i}" for i in range(n)], lens))
    for b in batches:
        total = sum(by_id[i] for i in b["doc_id"].to_pylist())
        assert total <= budget or b.num_rows == 1  # oversized rows ride alone
    # token payloads intact
    back = {
        i: list(t)
        for b in batches
        for i, t in zip(b["doc_id"].to_pylist(), b["tokens"].to_pylist())
    }
    for i in range(n):
        s, e = int(offs[i]), int(offs[i + 1])
        assert back[f"d{i}"] == flat[s:e].tolist()
    # determinism: same boundaries on a second pass
    again = [b["doc_id"].to_pylist() for b in iter_token_batches(outdir, budget)]
    assert again == [b["doc_id"].to_pylist() for b in batches]

    # the preserve_order pin is scoped to the loader's own dataset:
    # an abandoned (un-exhausted, un-closed) iterator must leave the
    # process-global DataContext untouched for concurrent jobs
    from ray.data import DataContext

    before = DataContext.get_current().execution_options.preserve_order
    it = iter_token_batches(outdir, budget)
    next(it)  # start it, then abandon without close()
    assert DataContext.get_current().execution_options.preserve_order == before


def test_iter_token_batches_pushdown(ray_session, tmp_path):
    """columns= / where= plumb through to the pruned decode: only the
    selected rows stream, and the tokens column is auto-added to a
    projection that omits it."""
    import ray.data as rd

    from parquetjs_ray.pipelines.encode import encode_stream
    from parquetjs_ray.pipelines.loader import iter_token_batches
    from parquetjs_ray.stages.stats import build_plan_from_dataset

    n = 300
    lens = np.full(n, 10, np.int64)
    flat = np.arange(10 * n, dtype=np.int32)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:04d}" for i in range(n)], pa.string()),
            "tokens": pa.ListArray.from_arrays(pa.array(offs), pa.array(flat)),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array(["a" if i < 100 else "b" for i in range(n)]),
        }
    )
    ds = rd.from_arrow(tbl)
    plan = build_plan_from_dataset(ds, sample_rows=500)
    outdir = str(tmp_path / "art")
    encode_stream(ds, outdir, plan=plan, target_rows_per_partition=50)

    got = list(
        iter_token_batches(
            outdir, 100, columns=["doc_id"], where=[("source", "==", "a")]
        )
    )
    ids = [i for b in got for i in b["doc_id"].to_pylist()]
    assert sorted(ids) == [f"d{i:04d}" for i in range(100)]  # filtered to source a
    assert all(set(b.column_names) == {"doc_id", "tokens"} for b in got)
    assert all(len(b["tokens"].combine_chunks().values) <= 100 for b in got)
