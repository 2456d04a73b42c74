"""Session-9 (round-5 final) operator tests: nearest-direction as-of
join, exact z-score outliers, trimmed mean, triangle counting, TPC-H
Q12/Q14 shapes, systematic sampling."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _nearest_tables(seed: int, tmax: int = 60):
    """Coarse time grid → plenty of exact equal-distance ties on both
    sides, the case the tiebreak rule exists for."""
    rng = np.random.default_rng(seed)
    nl, nr = 1500, 600
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, nl).astype("int64")),
            "t": pa.array(rng.integers(0, tmax, nl).astype("int64")),
            "lid": pa.array(np.arange(nl, dtype="int64")),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, nr).astype("int64")),
            "rt": pa.array(rng.integers(0, tmax, nr).astype("int64")),
            "val": pa.array(rng.permutation(nr).astype("int64")),
        }
    )
    return left, right


@pytest.mark.parametrize("seed", [17, 43])
def test_asof_nearest_matches_duckdb(ray_session, seed):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    left, right = _nearest_tables(seed)
    got = (
        asof_join(
            rd.from_arrow(left).repartition(5), rd.from_arrow(right).repartition(3),
            by="k", left_on="t", right_on="rt",
            left_cols=["lid"], right_cols=["val"], tiebreak="val",
            direction="nearest",
        )
        .to_pandas()
    )
    lft, rgt = left, right  # left/right are SQL reserved words
    want = duckdb.sql(
        "SELECT l.lid, (SELECT r.val FROM rgt r WHERE r.k = l.k "
        " ORDER BY abs(r.rt - l.t) ASC, r.val ASC LIMIT 1) AS val FROM lft l"
    ).fetchall()
    g = dict(zip(got["lid"].tolist(), got["val"].tolist()))
    assert len(g) == left.num_rows
    for lid, v in dict(want).items():
        gv = g[lid]
        if v is None:
            assert gv is None or (isinstance(gv, float) and math.isnan(gv))
        else:
            assert int(gv) == v


def test_asof_nearest_tolerance_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    left, right = _nearest_tables(91)
    tol = 3
    got = (
        asof_join(
            rd.from_arrow(left).repartition(4), rd.from_arrow(right).repartition(3),
            by="k", left_on="t", right_on="rt",
            left_cols=["lid"], right_cols=["val"], tiebreak="val",
            direction="nearest", tolerance_us=tol,
        )
        .to_pandas()
    )
    lft, rgt = left, right
    # tolerance voids the SELECTED match, it does not re-select: the
    # SQL replica is the plain nearest expression + one CASE filter
    want = duckdb.sql(
        "WITH m AS (SELECT l.lid, "
        " (SELECT abs(r.rt - l.t) FROM rgt r WHERE r.k = l.k "
        "  ORDER BY abs(r.rt - l.t) ASC, r.val ASC LIMIT 1) AS d, "
        " (SELECT r.val FROM rgt r WHERE r.k = l.k "
        "  ORDER BY abs(r.rt - l.t) ASC, r.val ASC LIMIT 1) AS val FROM lft l) "
        f"SELECT lid, CASE WHEN d <= {tol} THEN val END AS val FROM m"
    ).fetchall()
    g = dict(zip(got["lid"].tolist(), got["val"].tolist()))
    for lid, v in dict(want).items():
        gv = g[lid]
        if v is None:
            assert gv is None or (isinstance(gv, float) and math.isnan(gv))
        else:
            assert int(gv) == v


def test_asof_nearest_tie_prefers_smallest_tiebreak(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    # left at t=10; right rows at 8 and 12 (distance 2 both sides) —
    # the smaller tiebreak wins regardless of side
    left = pa.table({"k": pa.array([1, 1], pa.int64()), "t": pa.array([10, 10], pa.int64()),
                     "lid": pa.array([0, 1], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()), "rt": pa.array([8, 12], pa.int64()),
                      "val": pa.array([7, 3], pa.int64())})
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        by="k", left_on="t", right_on="rt",
        left_cols=["lid"], right_cols=["val"], tiebreak="val",
        direction="nearest",
    ).to_pandas()
    assert sorted(out["val"].tolist()) == [3, 3]  # forward row has val 3 < 7


def test_zscore_outliers_matches_bruteforce(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import zscore_outliers_per_group

    rng = np.random.default_rng(7)
    n = 4000
    keys = rng.integers(0, 30, n).astype("int64")
    # 2-decimal values with planted extremes
    vals = np.round(rng.normal(50, 10, n), 2)
    vals[rng.choice(n, 40, replace=False)] += rng.choice([-1, 1], 40) * 500.0
    vals = np.round(vals, 2)  # re-quantize: float += drifts off the 2-dec grid
    t = pa.table(
        {
            "rid": pa.array(np.arange(n, dtype="int64")),
            "k": pa.array(keys),
            "v": pa.array(vals),
        }
    )
    got = (
        zscore_outliers_per_group(
            rd.from_arrow(t).repartition(6), "k", "v", "rid", scale=2, c_num=3, c_den=1
        )
        .to_pandas()
    )
    # integer referee in Python big ints
    x = np.round(vals * 100).astype(np.int64)
    expect = set()
    for k in np.unique(keys):
        idx = np.flatnonzero(keys == k)
        nn = len(idx)
        S = int(x[idx].sum())
        Q = int((x[idx].astype(object) ** 2).sum())
        T = 9 * (nn * Q - S * S)
        for i in idx:
            a = abs(nn * int(x[i]) - S)
            if a * a > T:
                expect.add(int(i))
    assert set(got["rid"].tolist()) == expect
    assert list(got.columns) == ["rid", "k", "v"]


def test_zscore_outliers_rejects_oversized_group(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import zscore_outliers_per_group

    t = pa.table({"rid": pa.array([0, 1], pa.int64()), "k": pa.array([1, 1], pa.int64()),
                  "v": pa.array([1.0, 2.0])})
    # c_num so large that even n=2 violates max(c)·n < 2^30
    with pytest.raises((ValueError, Exception)):
        zscore_outliers_per_group(
            rd.from_arrow(t), "k", "v", "rid", scale=0, c_num=1 << 30, c_den=1
        ).to_pandas()


def test_zscore_outliers_rejects_inexact_scale(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import zscore_outliers_per_group

    t = pa.table({"rid": pa.array([0, 1], pa.int64()), "k": pa.array([1, 1], pa.int64()),
                  "v": pa.array([1.234, 2.0])})  # 3 decimals at scale=2
    with pytest.raises(Exception):
        zscore_outliers_per_group(
            rd.from_arrow(t), "k", "v", "rid", scale=2
        ).to_pandas()


def test_trimmed_mean_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import trimmed_mean_per_group

    rng = np.random.default_rng(5)
    n = 3000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 7, n).astype("int64")),
            "x": pa.array(rng.integers(-500, 50000, n).astype("int64")),
        }
    )
    got = (
        trimmed_mean_per_group(
            rd.from_arrow(t).repartition(5), key="k", value="x", p_num=1, p_den=4
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH r AS (SELECT k, x, row_number() OVER (PARTITION BY k ORDER BY x) rn, "
        " count(*) OVER (PARTITION BY k) n FROM t) "
        "SELECT k, CAST(count(*) AS BIGINT) trim_n, CAST(sum(x) AS VARCHAR) trim_sum "
        "FROM r WHERE rn > n // 4 AND rn <= n - n // 4 GROUP BY k ORDER BY k"
    ).fetchdf()
    assert got["k"].tolist() == want["k"].tolist()
    assert got["trim_n"].tolist() == want["trim_n"].tolist()
    assert got["trim_sum"].tolist() == want["trim_sum"].tolist()


def test_trimmed_mean_rejects_full_trim():
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import trimmed_mean_per_group

    t = pa.table({"k": pa.array([1], pa.int64()), "x": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        trimmed_mean_per_group(rd.from_arrow(t), key="k", value="x", p_num=1, p_den=2)


def _tri_referee(u: np.ndarray, v: np.ndarray) -> tuple[int, int, int]:
    import duckdb

    e = pa.table({"u": pa.array(u), "v": pa.array(v)})
    return duckdb.sql(
        "WITH c AS (SELECT least(u, v) lo, greatest(u, v) hi FROM e WHERE u <> v), "
        "d AS (SELECT DISTINCT lo, hi FROM c) "
        "SELECT "
        "(SELECT count(*) FROM (SELECT lo x FROM d UNION SELECT hi FROM d))::BIGINT, "
        "(SELECT count(*) FROM d)::BIGINT, "
        "(SELECT count(*) FROM d e1 JOIN d e2 ON e2.lo = e1.hi "
        " JOIN d e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)::BIGINT"
    ).fetchall()[0]


@pytest.mark.parametrize("seed,nodes,m", [(3, 60, 900), (11, 200, 3000)])
def test_triangle_count_matches_duckdb(ray_session, seed, nodes, m):
    import ray.data as rd

    from parquetjs_ray.functions.graph import triangle_count

    rng = np.random.default_rng(seed)
    # duplicates, both orientations and self-loops all present
    u = rng.integers(0, nodes, m).astype("int64")
    v = rng.integers(0, nodes, m).astype("int64")
    t = pa.table({"a": pa.array(u), "b": pa.array(v)})
    got = triangle_count(rd.from_arrow(t).repartition(6), "a", "b")
    nn, ne, nt = _tri_referee(u, v)
    assert got["n_nodes"][0].as_py() == nn
    assert got["n_edges"][0].as_py() == ne
    assert got["n_triangles"][0].as_py() == nt


def test_triangle_count_min_count_and_empty(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.graph import triangle_count

    # triangle 1-2-3 repeated twice, triangle 4-5-6 once: min_count=2
    # keeps only the first
    rep = [(1, 2), (2, 3), (1, 3)] * 2 + [(4, 5), (5, 6), (4, 6)]
    t = pa.table({"a": pa.array([p[0] for p in rep], pa.int64()),
                  "b": pa.array([p[1] for p in rep], pa.int64())})
    got = triangle_count(rd.from_arrow(t), "a", "b", min_count=2)
    assert got["n_triangles"][0].as_py() == 1
    assert got["n_edges"][0].as_py() == 3
    # self-loops only -> empty graph
    t2 = pa.table({"a": pa.array([7, 8], pa.int64()), "b": pa.array([7, 8], pa.int64())})
    got2 = triangle_count(rd.from_arrow(t2), "a", "b")
    assert got2["n_triangles"][0].as_py() == 0
    assert got2["n_edges"][0].as_py() == 0


def test_triangle_count_out_degree_guard(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.graph import triangle_count

    # star K_{1,n}: hub out-degree is bounded by degree ordering (hub is
    # ranked LAST, so leaves point at it: out-degree 1 each) — the guard
    # must therefore NOT trip on a star...
    n = 50
    star = pa.table({"a": pa.array(np.zeros(n, np.int64)),
                     "b": pa.array(np.arange(1, n + 1, dtype=np.int64))})
    got = triangle_count(rd.from_arrow(star), "a", "b")
    assert got["n_triangles"][0].as_py() == 0
    # ...but a clique pushes real out-degrees past a tiny cap
    k = 20
    ti, tj = np.triu_indices(k, 1)
    clique = pa.table({"a": pa.array(ti.astype(np.int64)), "b": pa.array(tj.astype(np.int64))})
    with pytest.raises(Exception):
        triangle_count(rd.from_arrow(clique), "a", "b", max_out_degree=3)


def test_promo_share_and_priority_counts_sf0001(ray_session):
    """Q12/Q14-shape query wrappers vs DuckDB on the smallest sf."""
    import duckdb

    import __ray_entry__ as mod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for name in ("promo_revenue_share", "lineflag_priority_counts"):
        got = mod.queries()[name](sf).to_pandas().reset_index(drop=True)
        want = con.execute(mod.oracle_sql()[name]).fetchdf()
        got = got[sorted(got.columns)].astype(str)
        want = want[sorted(want.columns)].astype(str)
        assert got.values.tolist() == want.values.tolist(), name


def _pagerank_referee(pairs, k, iters, scale=10**12):
    """Pure-Python big-int referee for the fixed-point recurrence."""
    from collections import defaultdict

    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj = defaultdict(list)
    for a, b in canon:
        adj[a].append(b)
        adj[b].append(a)
    nodes = sorted(adj)
    n = len(nodes)
    deg = {u: len(adj[u]) for u in nodes}
    s = {u: scale // n for u in nodes}
    base = (15 * scale) // (100 * n)
    for _ in range(iters):
        inc = {u: sum(s[v] // deg[v] for v in adj[u]) for u in nodes}
        s = {u: base + (85 * inc[u]) // 100 for u in nodes}
    order = sorted(nodes, key=lambda u: (-s[u], u))[:k]
    return [(u, str(s[u])) for u in order]


@pytest.mark.parametrize("seed", [2, 29])
def test_pagerank_matches_referee(ray_session, seed):
    import ray.data as rd

    from parquetjs_ray.functions.graph import pagerank_topk

    rng = np.random.default_rng(seed)
    m = 600
    u = rng.integers(0, 80, m).astype("int64")
    v = rng.integers(0, 80, m).astype("int64")
    t = pa.table({"a": pa.array(u), "b": pa.array(v)})
    got = pagerank_topk(
        rd.from_arrow(t).repartition(7), "a", "b", k=15, iterations=3
    )
    want = _pagerank_referee(list(zip(u.tolist(), v.tolist())), 15, 3)
    assert list(zip(got["node"].to_pylist(), got["score"].to_pylist())) == want


def test_pagerank_empty_and_degree_guard(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.graph import pagerank_topk

    loops = pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([1, 2], pa.int64())})
    out = pagerank_topk(rd.from_arrow(loops), "a", "b")
    assert out.num_rows == 0
    # a hub whose degree breaks the int64 headroom at a huge scale must
    # raise loudly, never overflow
    n = 40
    star = pa.table({"a": pa.array(np.zeros(n, np.int64)),
                     "b": pa.array(np.arange(1, n + 1, dtype=np.int64))})
    with pytest.raises(Exception):
        pagerank_topk(rd.from_arrow(star), "a", "b", scale=10**17)


def test_kcore_matches_referee(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.graph import k_core

    rng = np.random.default_rng(13)
    m = 500
    u = rng.integers(0, 60, m).astype("int64")
    v = rng.integers(0, 60, m).astype("int64")
    got = k_core(
        rd.from_arrow(pa.table({"a": pa.array(u), "b": pa.array(v)})).repartition(5),
        "a", "b", k=3,
    )
    # pure-Python peeler referee
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in zip(u.tolist(), v.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    live = set(adj)
    while True:
        drop = {x for x in live if len(adj[x] & live) < 3}
        if not drop:
            break
        live -= drop
    want = sorted((x, len(adj[x] & live)) for x in live)
    assert list(zip(got["node"].to_pylist(), got["core_deg"].to_pylist())) == want


def test_kcore_path_graph_empty(ray_session):
    """A path peels end-in: its 2-core is empty — the multi-round case."""
    import ray.data as rd

    from parquetjs_ray.functions.graph import k_core

    n = 12
    t = pa.table({"a": pa.array(np.arange(n - 1, dtype=np.int64)),
                  "b": pa.array(np.arange(1, n, dtype=np.int64))})
    got = k_core(rd.from_arrow(t), "a", "b", k=2)
    assert got.num_rows == 0
    # a cycle IS its own 2-core
    t2 = pa.table({"a": pa.array(np.arange(n, dtype=np.int64)),
                   "b": pa.array((np.arange(n, dtype=np.int64) + 1) % n)})
    got2 = k_core(rd.from_arrow(t2), "a", "b", k=2)
    assert got2.num_rows == n
    assert set(got2["core_deg"].to_pylist()) == {2}


@pytest.mark.parametrize("seed", [19])
def test_bfs_hops_matches_referee(ray_session, seed):
    import ray.data as rd

    from parquetjs_ray.functions.graph import bfs_hops

    rng = np.random.default_rng(seed)
    m = 400
    u = rng.integers(0, 70, m).astype("int64")
    v = rng.integers(0, 70, m).astype("int64")
    got = bfs_hops(
        rd.from_arrow(pa.table({"a": pa.array(u), "b": pa.array(v)})).repartition(5),
        "a", "b", seed=5, max_hops=3,
    )
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in zip(u.tolist(), v.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    dist = {5: 0}
    q = deque([5])
    while q:
        x = q.popleft()
        if dist[x] == 3:
            continue
        for y in adj[x]:
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    want = sorted(dist.items())
    assert list(zip(got["node"].to_pylist(), got["hops"].to_pylist())) == want


def test_bfs_hops_early_exit_disconnected(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.graph import bfs_hops

    # two components; seed in the triangle — the other edge unreachable
    t = pa.table({"a": pa.array([1, 2, 1, 10], pa.int64()),
                  "b": pa.array([2, 3, 3, 11], pa.int64())})
    got = bfs_hops(rd.from_arrow(t), "a", "b", seed=1, max_hops=6)
    assert list(zip(got["node"].to_pylist(), got["hops"].to_pylist())) == [
        (1, 0), (2, 1), (3, 1)
    ]


def test_ks_drift_matches_scipy_free_referee(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.profile import ks_drift_per_group

    rng = np.random.default_rng(23)
    n = 5000
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    # group c drawn from a shifted distribution -> big KS
    vals = rng.integers(0, 200, n).astype("int64")
    vals[keys == "c"] += 120
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    got = (
        ks_drift_per_group(rd.from_arrow(t).repartition(6), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # exact rational referee in pure Python
    N = n
    grid = np.unique(vals)
    for _, row in got.iterrows():
        sel = keys == row["k"]
        ns = int(sel.sum())
        best = 0
        for v in grid.tolist():
            cs = int((vals[sel] <= v).sum())
            cg = int((vals <= v).sum())
            best = max(best, abs(cs * N - cg * ns))
        assert row["ks_num"] == str(best)
        assert row["ks_den"] == str(ns * N)
    # group c must drift more than a or b
    num = {r["k"]: int(r["ks_num"]) / int(r["ks_den"]) for _, r in got.iterrows()}
    assert num["c"] > max(num["a"], num["b"])


def test_loo_mean_encode_singletons_and_referee(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import loo_mean_encode

    t = pa.table(
        {
            "rid": pa.array([0, 1, 2, 3], pa.int64()),
            "k": pa.array(["a", "a", "a", "b"]),
            "x": pa.array([10, 20, 40, 7], pa.int64()),
        }
    )
    got = (
        loo_mean_encode(rd.from_arrow(t).repartition(3), "k", "x", ["rid"])
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert got["loo_num"].tolist()[:3] == [60, 50, 30]
    assert got["loo_den"].tolist()[:3] == [2, 2, 2]
    assert pa.Table.from_pandas(got).column("loo_num")[3].as_py() is None
    assert pa.Table.from_pandas(got).column("loo_den")[3].as_py() is None


def test_group_topk_with_other_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_topk_with_other

    rng = np.random.default_rng(31)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(np.array(["s1", "s2", "s3"])[rng.integers(0, 3, n)]),
            "v": pa.array(np.array(list("abcdefg"))[rng.integers(0, 7, n)]),
        }
    )
    got = (
        group_topk_with_other(rd.from_arrow(t).repartition(5), "k", "v", k=2)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH c AS (SELECT k, v, count(*)::BIGINT n FROM t GROUP BY 1,2), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY n DESC, v) rn FROM c) "
        "SELECT k, v, n FROM r WHERE rn <= 2 "
        "UNION ALL SELECT k, 'OTHER', sum(n)::BIGINT FROM r WHERE rn > 2 GROUP BY k "
        "ORDER BY k, v"
    ).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_first_touch_attribution_sf0001(ray_session):
    import duckdb

    import __ray_entry__ as mod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    got = mod.queries()["first_touch_attribution"](sf).to_pandas()
    want = con.execute(mod.oracle_sql()["first_touch_attribution"]).fetchdf()
    got = got[sorted(got.columns)].astype(str).sort_values(list(sorted(got.columns))).reset_index(drop=True)
    want = want[sorted(want.columns)].astype(str).sort_values(list(sorted(want.columns))).reset_index(drop=True)
    assert got.values.tolist() == want.values.tolist()


def test_dense_bucket_counts_zero_fill(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import dense_bucket_counts

    W = 10
    # key "a" active in buckets 0 and 3; "b" only in bucket 1 -> grid 0..3
    t = pa.table(
        {
            "k": pa.array(["a", "a", "a", "b"]),
            "ts": pa.array([1, 5, 35, 12], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    got = (
        dense_bucket_counts(rd.from_arrow(t), "k", "ts", bucket_us=W)
        .to_pandas()
        .sort_values(["k", "bucket_us"])
        .reset_index(drop=True)
    )
    assert got[got["k"] == "a"]["n"].tolist() == [2, 0, 0, 1]
    assert got[got["k"] == "b"]["n"].tolist() == [0, 1, 0, 0]
    assert got["bucket_us"].tolist() == [0, 10, 20, 30] * 2
