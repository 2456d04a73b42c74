"""Session-8 operator batch: distributed 2-D skyline, vocabulary
overlap, lag-1 autocorrelation, co-occurrence pair mining, k-anonymity
audit — each pinned against a brute-force numpy or DuckDB oracle on
randomized inputs (same SQL-parity strategy as test_functions.py)."""

import numpy as np
import pyarrow as pa
import pytest


# ── skyline ──────────────────────────────────────────────────────────


def _brute_skyline(x, y):
    keep = np.ones(len(x), dtype=bool)
    for i in range(len(x)):
        dom = (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
        keep[i] = not dom.any()
    return keep


def test_pareto_kernel_matches_bruteforce():
    from parquetjs_ray.functions.skyline import _pareto_keep

    rng = np.random.default_rng(7)
    for n in (1, 2, 50, 400):
        # small value range forces duplicates and ties on both axes
        x = rng.integers(0, 12, n).astype(np.float64)
        y = rng.integers(0, 12, n).astype(np.float64)
        got = _pareto_keep(x, y)
        assert got.tolist() == _brute_skyline(x, y).tolist(), n


def test_pareto_kernel_duplicates_all_survive():
    from parquetjs_ray.functions.skyline import _pareto_keep

    # identical undominated points: strict dominance keeps every copy
    x = np.array([1.0, 1.0, 2.0])
    y = np.array([5.0, 5.0, 1.0])
    assert _pareto_keep(x, y).tolist() == [True, True, False]


def test_skyline_distributed_matches_bruteforce(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.skyline import skyline

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table(
        {
            "id": pa.array(np.arange(n)),
            "price": pa.array(rng.integers(0, 500, n).astype(np.float64) / 4),
            "size": pa.array(rng.integers(0, 60, n).astype(np.int64)),
        }
    )
    out = skyline(
        rd.from_arrow(t).repartition(7), minimize="price", maximize="size"
    ).take_all()
    keep = _brute_skyline(
        t["price"].to_numpy(), t["size"].to_numpy().astype(np.float64)
    )
    want = sorted(int(i) for i in t["id"].to_numpy()[keep])
    assert sorted(r["id"] for r in out) == want


# ── vocab overlap ────────────────────────────────────────────────────


def test_vocab_overlap_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.tokenize import vocab_overlap

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(300):
        src = f"s{i % 4}"
        text = " ".join(rng.choice(words, rng.integers(1, 9)))
        rows.append((src, text))
    t = pa.table(
        {
            "source": pa.array([r[0] for r in rows]),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    got = vocab_overlap(rd.from_arrow(t).repartition(5)).to_pylist()
    want = duckdb.sql(
        "WITH p AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w FROM t), "
        "v AS (SELECT source, count(*) c FROM p GROUP BY source) "
        "SELECT a.source, b.source, count(*), va.c + vb.c - count(*) "
        "FROM p a JOIN p b ON a.w = b.w AND a.source < b.source "
        "JOIN v va ON va.source = a.source JOIN v vb ON vb.source = b.source "
        "GROUP BY a.source, b.source, va.c, vb.c ORDER BY 1, 2"
    ).fetchall()
    assert [(r["source_a"], r["source_b"], r["n_shared"], r["n_union"]) for r in got] == [
        tuple(r) for r in want
    ]


# ── lag-1 autocorrelation ────────────────────────────────────────────


def test_lag1_autocorr_matches_numpy(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import lag1_autocorr

    rng = np.random.default_rng(5)
    rows_ts, rows_key = [], []
    series = {}
    base = 1_600_000_000_000_000  # us
    for k in ("a", "b"):
        hours = np.sort(rng.choice(200, 40, replace=False))
        counts = rng.integers(1, 9, len(hours))
        series[k] = counts
        for h, c in zip(hours, counts):
            for j in range(c):
                rows_ts.append(base + int(h) * 3_600_000_000 + j)
                rows_key.append(k)
    t = pa.table(
        {
            "event_type": pa.array(rows_key),
            "ts": pa.array(rows_ts, pa.timestamp("us")),
        }
    )
    out = {
        r["event_type"]: (r["n_pairs"], r["autocorr"])
        for r in lag1_autocorr(rd.from_arrow(t).repartition(4)).take_all()
    }
    for k, c in series.items():
        n_pairs, corr = out[k]
        assert n_pairs == len(c) - 1
        want = np.corrcoef(c[:-1], c[1:])[0, 1]
        assert corr == pytest.approx(want, abs=1e-12)


def test_lag1_autocorr_degenerate(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import lag1_autocorr

    # constant series (zero variance) and a single bucket -> null corr
    t = pa.table(
        {
            "event_type": pa.array(["c", "c", "d"]),
            "ts": pa.array([0, 3_600_000_000, 0], pa.timestamp("us")),
        }
    )
    out = {r["event_type"]: r for r in lag1_autocorr(rd.from_arrow(t)).take_all()}
    assert out["c"]["n_pairs"] == 1 and out["c"]["autocorr"] is None
    assert out["d"]["n_pairs"] == 0 and out["d"]["autocorr"] is None


# ── co-occurrence pairs ──────────────────────────────────────────────


def test_cooccur_pairs_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import cooccur_pairs_topk

    rng = np.random.default_rng(9)
    n = 4000
    t = pa.table(
        {
            "g": pa.array(rng.integers(0, 600, n).astype(np.int64)),
            "item": pa.array(rng.integers(0, 50, n).astype(np.int64)),
        }
    )
    got = cooccur_pairs_topk(
        rd.from_arrow(t).repartition(6), group_col="g", item_col="item", k=25
    ).take_all()
    want = duckdb.sql(
        "WITH d AS (SELECT DISTINCT g, item FROM t) "
        "SELECT a.item, b.item, count(*) FROM d a "
        "JOIN d b ON a.g = b.g AND a.item < b.item "
        "GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 25"
    ).fetchall()
    assert [(r["item_a"], r["item_b"], r["n_groups"]) for r in got] == [
        tuple(r) for r in want
    ]


def test_cooccur_pairs_max_basket_raises(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import cooccur_pairs_topk

    t = pa.table(
        {
            "g": pa.array(np.zeros(30, np.int64)),
            "item": pa.array(np.arange(30, dtype=np.int64)),
        }
    )
    with pytest.raises(Exception, match="max_basket"):
        cooccur_pairs_topk(
            rd.from_arrow(t), group_col="g", item_col="item", max_basket=8
        ).take_all()


# ── k-anonymity ──────────────────────────────────────────────────────


def test_k_anonymity_audit(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.profile import k_anonymity_audit

    t = pa.table(
        {
            "nat": pa.array([1] * 12 + [2] * 3 + [3] * 1),
            "seg": pa.array(["x"] * 12 + ["y"] * 3 + ["y"]),
        }
    )
    out = k_anonymity_audit(rd.from_arrow(t).repartition(3), ["nat", "seg"], k=5).take_all()
    assert [(r["nat"], r["seg"], r["n_rows"]) for r in out] == [(3, "y", 1), (2, "y", 3)]


# ── composition queries: trending / decay / hourly / benford ─────────


def _events_table(n=5000, seed=13):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    return pa.table(
        {
            "ts": pa.array(
                base + rng.integers(0, 40 * 86_400_000_000, n), pa.timestamp("us")
            ),
            "event_type": pa.array(rng.choice(["a", "b", "c", "d"], n)),
        }
    )


def test_trending_query_matches_duckdb(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    t = _events_table()
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = sorted(
        (r["day_us"], r["event_type"], r["n"])
        for r in m.q_trending_event_types(str(tmp_path)).take_all()
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            "WITH c AS (SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) day_us, "
            "event_type, count(*)::BIGINT n FROM t GROUP BY 1,2) "
            "SELECT day_us, event_type, n FROM c QUALIFY "
            "row_number() OVER (PARTITION BY day_us ORDER BY n DESC, event_type) <= 3"
        ).fetchall()
    )
    assert got == want


def test_decayed_popularity_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    t = _events_table(seed=29)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {
        r["event_type"]: r["decay_score"]
        for r in m.q_decayed_popularity_events(str(tmp_path)).take_all()
    }
    us = t["ts"].cast(pa.int64()).to_numpy()
    types = np.asarray(t["event_type"])
    age = (us.max() - us) // 86_400_000_000
    w = np.where(age >= 20, 0, 1_000_000 >> np.minimum(age, 19))
    for k in np.unique(types):
        assert got[str(k)] == int(w[types == k].sum())


def test_hourly_profile_shares_exact(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    t = _events_table(seed=31)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    rows = m.q_hourly_profile_events(str(tmp_path)).take_all()
    us = t["ts"].cast(pa.int64()).to_numpy()
    types = np.asarray(t["event_type"])
    hours = (us // 3_600_000_000) % 24
    for r in rows:
        mask = (types == r["event_type"]) & (hours == r["hour"])
        assert r["n"] == int(mask.sum())
        total = int((types == r["event_type"]).sum())
        assert r["share_milli"] == 1000 * r["n"] // total


def test_benford_digit_extraction_exact_powers(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as m

    # totals landing exactly on powers of ten — the float-log10 trap
    prices = [1.00, 10.00, 100.00, 1000.00, 99.99, 900.01, 0.05]
    t = pa.table({"o_totalprice": pa.array(prices, pa.float64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    rows = {r["digit"]: r["n_orders"] for r in m.q_benford_orders(str(tmp_path)).to_pylist()}
    # cents: 100,1000,10000,100000,9999,90001,5 -> digits 1,1,1,1,9,9,5
    assert rows == {1: 4, 5: 1, 9: 2}


# ── Welch A/B ────────────────────────────────────────────────────────


def test_group_welch_t_matches_manual(ray_session):
    import math

    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_welch_t

    rng = np.random.default_rng(17)
    n = 3000
    arm = rng.integers(0, 2, n).astype(np.int64)
    # arm-1 values shifted up: expect a clearly negative t for (a - b)
    cents = rng.integers(100, 5000, n) + arm * 500
    t = pa.table(
        {
            "k": pa.array(np.where(rng.integers(0, 2, n) == 0, "x", "y")),
            "arm": pa.array(arm),
            "v": pa.array(cents / 100.0),
        }
    )
    out = {
        r["k"]: r
        for r in group_welch_t(
            rd.from_arrow(t).repartition(5), "k", "arm", "v", x_scale=2
        ).take_all()
    }
    ks = np.asarray(t["k"])
    for key in ("x", "y"):
        r = out[key]
        va = cents[(ks == key) & (arm == 0)]
        vb = cents[(ks == key) & (arm == 1)]
        assert (r["n_a"], r["n_b"]) == (len(va), len(vb))
        assert r["mean_a"] == pytest.approx(va.mean() / 100, rel=1e-12)
        von_a = va.var(ddof=1) / len(va)
        von_b = vb.var(ddof=1) / len(vb)
        want_t = (va.mean() - vb.mean()) / math.sqrt(von_a + von_b)
        assert r["welch_t"] == pytest.approx(want_t, rel=1e-9)
        assert r["welch_t"] < -3  # the planted shift is detected


def test_group_welch_t_degenerate(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_welch_t

    # arm b has one observation -> t is NULL; zero variance both -> NULL
    t = pa.table(
        {
            "k": pa.array(["p"] * 4 + ["q"] * 4),
            "arm": pa.array([0, 0, 0, 1, 0, 0, 1, 1], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 7.0, 7.0]),
        }
    )
    out = {r["k"]: r for r in group_welch_t(rd.from_arrow(t), "k", "arm", "v", x_scale=2).take_all()}
    assert out["p"]["welch_t"] is None  # n_b == 1
    assert out["q"]["welch_t"] is None  # both variances zero


# ── Gini ─────────────────────────────────────────────────────────────


def test_group_gini_matches_bruteforce(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import group_gini

    rng = np.random.default_rng(21)
    n = 2000
    t = pa.table(
        {
            "k": pa.array(np.where(rng.integers(0, 2, n) == 0, "a", "b")),
            "v": pa.array(rng.integers(0, 800, n).astype(np.int64)),
        }
    )
    out = {r["k"]: r for r in group_gini(rd.from_arrow(t).repartition(5), key="k", value="v").take_all()}
    ks, vs = np.asarray(t["k"]), t["v"].to_numpy()
    for key in ("a", "b"):
        x = vs[ks == key].astype(object)  # python ints -> exact
        delta = int(np.abs(x[:, None] - x[None, :]).sum())
        want = (1000 * delta) // (2 * len(x) * int(x.sum()))
        assert out[key]["n"] == len(x)
        assert out[key]["gini_milli"] == want


def test_group_gini_edges(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import group_gini

    # perfectly equal -> 0; one owner -> (n-1)/n; zero-sum -> NULL
    t = pa.table(
        {
            "k": pa.array(["eq"] * 4 + ["one"] * 4 + ["z"] * 2),
            "v": pa.array([5, 5, 5, 5, 0, 0, 0, 9, 0, 0], pa.int64()),
        }
    )
    out = {r["k"]: r for r in group_gini(rd.from_arrow(t), key="k", value="v").take_all()}
    assert out["eq"]["gini_milli"] == 0
    assert out["one"]["gini_milli"] == 750  # 3/4
    assert out["z"]["gini_milli"] is None
    with pytest.raises(Exception, match="non-negative"):
        group_gini(
            rd.from_arrow(pa.table({"k": ["x"], "v": pa.array([-1], pa.int64())})),
            key="k",
            value="v",
        ).take_all()
