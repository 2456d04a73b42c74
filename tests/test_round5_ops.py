"""Round-5 operator batch: grouped window ranks, winsorize, CUBE,
UNPIVOT, skew report, per-group cap, exact stratified split — each
pinned against a DuckDB oracle on randomized inputs (the same
SQL-parity strategy as test_functions.py; SURVEY.md §5)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(n=2500, n_src=5, vmax=60, seed=23):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(rng.permutation(10_000)[:n].astype("int64")),
            "source": pa.array([f"s{i % n_src}" for i in range(n)]),
            "n_chars": pa.array(rng.integers(0, vmax, n).astype("int64")),
        }
    )


def test_rank_per_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import rank_per_group

    for n, n_src, vmax in ((2500, 5, 40), (17, 3, 4), (1, 1, 2)):
        t = _docs_table(n, n_src, vmax)
        got = rank_per_group(rd.from_arrow(t).repartition(4)).take_all()
        want = duckdb.sql(
            "SELECT doc_id, "
            "row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id), "
            "rank() OVER (PARTITION BY source ORDER BY n_chars), "
            "dense_rank() OVER (PARTITION BY source ORDER BY n_chars), "
            "percent_rank() OVER (PARTITION BY source ORDER BY n_chars), "
            "cume_dist() OVER (PARTITION BY source ORDER BY n_chars) FROM t"
        ).fetchall()
        w = {r[0]: r[1:] for r in want}
        g = {
            r["doc_id"]: (
                r["row_number"], r["rank"], r["dense_rank"],
                r["percent_rank"], r["cume_dist"],
            )
            for r in got
        }
        assert g == {k: tuple(v) for k, v in w.items()}  # bit-exact incl. doubles


def test_rank_per_group_hot_key_bounded_groups(ray_session):
    """One key owning 10^5 rows over a narrow value range: every
    map_groups tie class is bounded by the value's duplicate count (the
    histogram carries the cross-value offsets), and ranks stay exact."""
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import rank_per_group

    n = 100_000
    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype="int64")),
            "source": pa.array(["hot"] * n),
            "n_chars": pa.array(rng.integers(0, 50, n).astype("int64")),
        }
    )
    got = rank_per_group(rd.from_arrow(t).repartition(8)).take_all()
    want = duckdb.sql(
        "SELECT doc_id, "
        "row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id), "
        "dense_rank() OVER (PARTITION BY source ORDER BY n_chars) FROM t"
    ).fetchall()
    w = {r[0]: r[1:] for r in want}
    assert all((w[r["doc_id"]] == (r["row_number"], r["dense_rank"])) for r in got)
    assert len(got) == n


def test_winsorize_per_group_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import winsorize_per_group

    t = _docs_table(3000, 4, 500)
    got = winsorize_per_group(
        rd.from_arrow(t).repartition(5), q_lo=0.05, q_hi=0.95
    ).take_all()
    # quantile_disc semantics: element at 1-based position ceil(q*n)
    want = duckdb.sql(
        "WITH b AS (SELECT source, "
        " quantile_disc(n_chars, 0.05) AS lo, quantile_disc(n_chars, 0.95) AS hi "
        " FROM t GROUP BY source) "
        "SELECT t.doc_id, least(greatest(t.n_chars, b.lo), b.hi) "
        "FROM t JOIN b USING (source)"
    ).fetchall()
    w = dict(want)
    assert {r["doc_id"]: r["clipped"] for r in got} == w


def test_cube_aggregate_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import cube_aggregate

    rng = np.random.default_rng(3)
    n = 4000
    t = pa.table(
        {
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
            "lang": pa.array(rng.choice(["en", "de", "fr"], n).tolist()),
            "n_chars": pa.array(rng.integers(0, 100, n).astype("int64")),
        }
    )
    got = cube_aggregate(
        rd.from_arrow(t).repartition(6), ["source", "lang"], value="n_chars"
    ).take_all()
    want = duckdb.sql(
        "SELECT source, lang, grouping(source, lang) AS lvl, count(*) AS n, "
        "sum(n_chars) AS sum_v FROM t GROUP BY CUBE(source, lang)"
    ).fetchall()
    w = {(r[0], r[1], r[2]): (r[3], r[4]) for r in want}
    g = {(r["source"], r["lang"], r["lvl"]): (r["n"], r["sum_v"]) for r in got}
    assert g == w
    assert len(g) == len(want)  # all 4 grouping sets present


def test_unpivot_counts_inverts_pivot(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import pivot_counts, unpivot_counts

    rng = np.random.default_rng(11)
    n = 3000
    t = pa.table(
        {
            "u": pa.array(rng.integers(0, 60, n).astype("int64")),
            "e": pa.array(rng.choice(["a", "b", "c"], n).tolist()),
        }
    )
    wide = pivot_counts(rd.from_arrow(t).repartition(7), "u", "e", ["a", "b", "c"])
    long = unpivot_counts(
        wide, "u", ["n_a", "n_b", "n_c"], var_name="e", val_name="n"
    ).take_all()
    want = duckdb.sql(
        "SELECT u, 'n_' || e AS e, count(*) AS n FROM t GROUP BY u, e"
    ).fetchall()
    assert {(r["u"], r["e"]): r["n"] for r in long} == {
        (a, b): c for a, b, c in want
    }


def test_unpivot_keep_zero_rows(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import unpivot_counts

    t = pa.table({"u": [1, 2], "n_a": [0, 3], "n_b": [5, 0]})
    long = unpivot_counts(
        rd.from_arrow(t), "u", ["n_a", "n_b"], drop_zero=False
    ).take_all()
    assert len(long) == 4
    assert {(r["u"], r["variable"], r["value"]) for r in long} == {
        (1, "n_a", 0),
        (1, "n_b", 5),
        (2, "n_a", 3),
        (2, "n_b", 0),
    }


def test_group_share_report_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_share_report

    t = _docs_table(3000, 7)
    got = group_share_report(rd.from_arrow(t).repartition(5), "source").take_all()
    want = duckdb.sql(
        "WITH c AS (SELECT source, count(*) AS n FROM t GROUP BY source), "
        "tot AS (SELECT sum(n) AS t FROM c) "
        "SELECT source, n, "
        " row_number() OVER (ORDER BY n DESC, source) AS rank, "
        " n / (SELECT t FROM tot)::DOUBLE AS share, "
        " sum(n) OVER (ORDER BY n DESC, source) / (SELECT t FROM tot)::DOUBLE AS cum_share "
        "FROM c ORDER BY rank"
    ).fetchall()
    g = [(r["source"], r["n"], r["rank"], r["share"], r["cum_share"]) for r in got]
    assert g == [tuple(r) for r in want]  # bit-exact incl. the doubles


def test_cap_per_group_matches_duckdb_hash_order(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.sampling import cap_per_group

    t = _docs_table(2000, 4)
    k = 37
    got = cap_per_group(rd.from_arrow(t).repartition(6), k).take_all()
    mix = _mix64_sql("doc_id", "t")
    want = duckdb.sql(
        f"WITH h AS ({mix}), "
        "r AS (SELECT doc_id, source, row_number() OVER "
        " (PARTITION BY source ORDER BY (x // 2), doc_id) AS rn FROM h) "
        f"SELECT doc_id FROM r WHERE rn <= {k}"
    ).fetchall()
    assert sorted(r["doc_id"] for r in got) == sorted(r[0] for r in want)
    # every group exactly at the cap (groups here are larger than k)
    from collections import Counter

    by_src = Counter(r["source"] for r in got)
    assert all(v == k for v in by_src.values())


def test_stratified_split_exact_counts_and_membership(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.sampling import stratified_split_exact

    t = _docs_table(2203, 5)  # deliberately not divisible
    got = stratified_split_exact(
        rd.from_arrow(t).repartition(6), {"train": 90, "val": 7, "test": 3}
    ).take_all()
    mix = _mix64_sql("doc_id", "t")
    want = duckdb.sql(
        f"WITH h AS ({mix}), "
        "r AS (SELECT doc_id, source, "
        " row_number() OVER (PARTITION BY source ORDER BY (x // 8589934592), doc_id) - 1 AS rn0, "
        " count(*) OVER (PARTITION BY source) AS n FROM h) "
        "SELECT doc_id, CASE WHEN rn0 < (n*90)//100 THEN 'train' "
        " WHEN rn0 < (n*97)//100 THEN 'val' ELSE 'test' END FROM r"
    ).fetchall()
    assert {r["doc_id"]: r["split"] for r in got} == dict(want)
    # exact per-group counts: floor-difference law
    from collections import Counter

    per = Counter((r["source"], r["split"]) for r in got)
    tot = Counter(r["source"] for r in got)
    for s, n in tot.items():
        assert per[(s, "train")] == n * 90 // 100
        assert per[(s, "val")] == n * 97 // 100 - n * 90 // 100
        assert per[(s, "test")] == n - n * 97 // 100


def test_stratified_split_exact_rejects_bad_args(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import stratified_split_exact

    t = pa.table({"doc_id": [1], "source": ["s"]})
    with pytest.raises(ValueError):
        stratified_split_exact(rd.from_arrow(t), {"train": 1})


def _mix64_sql(id_col: str, table: str) -> str:
    """DuckDB splitmix64 replica (seed 0): the same xor/modmul chain as
    __ray_entry__._sample_hash_ctes, inlined for test independence and
    parametrized on the source table."""
    mod64 = "18446744073709551616::HUGEINT"

    def modmul(x: str, c: str) -> str:
        return (
            f"((({x}) % 4294967296) * {c}::HUGEINT + "
            f"((({x}) // 4294967296) * {c}::HUGEINT % 4294967296) * 4294967296) % {mod64}"
        )

    return (
        "SELECT doc_id, source, xor(x4, x4 >> 31) AS x FROM ("
        f"SELECT doc_id, source, {modmul('x3', '10723151780598845931')} AS x4 FROM ("
        "SELECT doc_id, source, xor(x2, x2 >> 27) AS x3 FROM ("
        f"SELECT doc_id, source, {modmul('x1', '13787848793156543929')} AS x2 FROM ("
        f"SELECT doc_id, source, xor(x0, x0 >> 30) AS x1 FROM ("
        f"SELECT doc_id, source, {id_col}::HUGEINT AS x0 FROM {table})))))"
    )


def test_funnel_stages_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.windows import funnel_stages

    rng = np.random.default_rng(5)
    n = 6000
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 300, n).astype("int64")),
            "event_type": pa.array(
                rng.choice(["view", "click", "purchase", "other"], n).tolist()
            ),
            "ts": pa.array(rng.integers(0, 10_000, n).astype("int64")),
        }
    )
    got = funnel_stages(
        rd.from_arrow(t).repartition(6), ["view", "click", "purchase"]
    ).take_all()
    want = duckdb.sql(
        "WITH s1 AS (SELECT user_id, min(ts) AS t FROM t "
        " WHERE event_type='view' GROUP BY user_id), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM t e "
        " JOIN s1 ON e.user_id=s1.user_id AND e.ts > s1.t "
        " WHERE e.event_type='click' GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM t e "
        " JOIN s2 ON e.user_id=s2.user_id AND e.ts > s2.t "
        " WHERE e.event_type='purchase' GROUP BY e.user_id) "
        "SELECT 1 AS stage, count(*) FROM s1 "
        "UNION ALL SELECT 2, count(*) FROM s2 "
        "UNION ALL SELECT 3, count(*) FROM s3"
    ).fetchall()
    w = dict(want)
    g = {r["stage"]: r["n_keys"] for r in got}
    assert g == w
    names = {r["stage"]: r["event_type"] for r in got}
    assert names == {1: "view", 2: "click", 3: "purchase"}
    # monotone survivorship
    assert g[1] >= g[2] >= g[3]


def test_funnel_stages_zero_survivors_and_empty_stage_rows(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import funnel_stages

    # nobody purchases after clicking: stage 3 must still emit a 0 row
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2], type=pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "ts": pa.array([10, 20, 5], type=pa.int64()),
        }
    )
    got = funnel_stages(rd.from_arrow(t), ["view", "click", "purchase"]).take_all()
    g = {r["stage"]: r["n_keys"] for r in got}
    assert g == {1: 2, 2: 1, 3: 0}


def test_asof_join_forward(ray_session):
    import math

    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "t": pa.array([100, 5, 50, 70, 10], pa.int64()),
            "lid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "rt": pa.array([10, 50, 50, 60], pa.int64()),
            "val": pa.array([7, 8, 9, 5], pa.int64()),
        }
    )
    out = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", left_on="t", right_on="rt",
            left_cols=["lid"], right_cols=["val"], tiebreak="val",
            direction="forward",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    vals = out["val"].tolist()
    # lid=10 (k=1,t=100): no rt>=100 -> null
    # lid=11 (k=1,t=5): first rt>=5 is 10 -> val 7
    # lid=12 (k=1,t=50): rt=50 tie -> MIN val = 8 (forward tiebreak)
    # lid=13 (k=2,t=70): no rt>=70 -> null
    # lid=14 (k=3): no right rows -> null
    def is_null(v):
        return v is None or (isinstance(v, float) and math.isnan(v))

    assert is_null(vals[0])
    assert vals[1] == 7
    assert vals[2] == 8
    assert is_null(vals[3]) and is_null(vals[4])


def test_asof_join_forward_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    rng = np.random.default_rng(17)
    nl, nr = 2000, 800
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, nl).astype("int64")),
            "t": pa.array(rng.integers(0, 5000, nl).astype("int64")),
            "lid": pa.array(np.arange(nl, dtype="int64")),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rng.integers(0, 40, nr).astype("int64")),
            "rt": pa.array(rng.integers(0, 5000, nr).astype("int64")),
            "val": pa.array(np.arange(nr, dtype="int64")),
        }
    )
    got = (
        asof_join(
            rd.from_arrow(left).repartition(5), rd.from_arrow(right).repartition(3),
            by="k", left_on="t", right_on="rt",
            left_cols=["lid"], right_cols=["val"], tiebreak="val",
            direction="forward",
        )
        .to_pandas()
    )
    lft, rgt = left, right  # left/right are SQL reserved words
    want = duckdb.sql(
        "SELECT l.lid, (SELECT r.val FROM rgt r WHERE r.k = l.k AND r.rt >= l.t "
        " ORDER BY r.rt ASC, r.val ASC LIMIT 1) AS val FROM lft l"
    ).fetchall()
    w = dict(want)
    g = dict(zip(got["lid"].tolist(), got["val"].tolist()))
    import math

    for lid, v in w.items():
        gv = g[lid]
        if v is None:
            assert gv is None or (isinstance(gv, float) and math.isnan(gv))
        else:
            assert int(gv) == v


def test_log_quantile_sketch_error_bound():
    from parquetjs_ray.functions.sketch import LogQuantileSketch

    rng = np.random.default_rng(41)
    for dist in (
        rng.lognormal(3, 2, 50_000),
        rng.exponential(100, 50_000),
        np.concatenate((rng.normal(-50, 20, 20_000), [0.0] * 500, rng.lognormal(2, 1, 30_000))),
    ):
        eps = 0.01
        sk = LogQuantileSketch(eps=eps).add(dist)
        srt = np.sort(dist)
        for q in (0.1, 0.5, 0.9, 0.99):
            exact = srt[max(1, int(np.ceil(q * len(srt)))) - 1]
            got = sk.quantile(q)
            if exact == 0.0:
                assert got == 0.0
            else:
                # bucket bounds are within (1+eps); geometric midpoint
                # keeps the result inside ~eps relative error
                assert abs(got - exact) <= (eps + 1e-9) * abs(exact) + 1e-12, (q, got, exact)


def test_log_quantile_sketch_merge_and_serde_associative():
    from parquetjs_ray.functions.sketch import LogQuantileSketch

    rng = np.random.default_rng(43)
    v = rng.lognormal(0, 3, 30_000)
    whole = LogQuantileSketch().add(v)
    merged = LogQuantileSketch()
    for chunk in np.array_split(v, 7):
        merged.merge(LogQuantileSketch.deserialize(LogQuantileSketch().add(chunk).serialize()))
    assert merged.count == whole.count == len(v)
    for q in (0.25, 0.5, 0.75, 0.95):
        assert merged.quantile(q) == whole.quantile(q)  # merge is exact


def test_log_quantile_sketch_edge_cases():
    import pytest as _pytest

    from parquetjs_ray.functions.sketch import LogQuantileSketch

    with _pytest.raises(ValueError):
        LogQuantileSketch(eps=0)
    with _pytest.raises(ValueError):
        LogQuantileSketch().quantile(0.5)
    sk = LogQuantileSketch().add(np.array([0.0, 0.0, np.inf, np.nan, -1.0, 2.0]))
    assert sk.count == 4  # non-finite dropped
    assert sk.quantile(0.01) < 0
    assert sk.quantile(0.5) == 0.0
    assert sk.quantile(1.0) > 0


def test_content_overlap_bitmask_and_join_plans_agree(ray_session):
    """The small-domain bitmask plan and the large-domain fp self-join
    plan must produce identical matrices (bitmask_domain_cap=0 forces
    the join plan on the same input)."""
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.dedup import content_overlap_matrix

    rng = np.random.default_rng(47)
    n = 5000
    t = pa.table(
        {
            "uid": pa.array(rng.integers(0, 400, n).astype("int64")),
            "grp": pa.array(rng.choice([f"g{i}" for i in range(7)], n).tolist()),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    fast = content_overlap_matrix(ds, text_col="uid", group_col="grp").take_all()
    slow = content_overlap_matrix(
        ds, text_col="uid", group_col="grp", bitmask_domain_cap=0
    ).take_all()
    want = duckdb.sql(
        "WITH d AS (SELECT DISTINCT uid, grp FROM t) "
        "SELECT a.grp, b.grp, count(*) FROM d a JOIN d b "
        "ON a.uid = b.uid AND a.grp < b.grp GROUP BY 1, 2"
    ).fetchall()
    w = {(r[0], r[1]): r[2] for r in want}
    f = {(r["src_a"], r["src_b"]): r["n_shared"] for r in fast}
    s = {(r["src_a"], r["src_b"]): r["n_shared"] for r in slow}
    assert f == w and s == w


def test_stratified_split_exact_hash_collision_classes(ray_session):
    """Force 31-bit hash collisions so the cogroup ties branch actually
    runs, and check membership still matches the SQL oracle."""
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.sampling import _GOLDEN, _U, _mix64, stratified_split_exact

    cand = np.arange(3_000_000, dtype=np.int64)
    h31 = (_mix64(cand.astype(np.uint64) + _U(0)) >> _U(33)).astype(np.int64)
    order = np.argsort(h31, kind="stable")
    hs = h31[order]
    dup_pos = np.flatnonzero(hs[1:] == hs[:-1])
    assert len(dup_pos) > 0, "no 31-bit collisions in 3M candidates?!"
    pairs = np.stack((cand[order[dup_pos]], cand[order[dup_pos + 1]]), axis=1)[:20]
    colliders = pairs.ravel()
    fillers = cand[10_000 : 10_000 + 500]
    ids = np.unique(np.concatenate((colliders, fillers)))
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "source": pa.array(["s0"] * len(ids)),  # same group → real tie classes
        }
    )
    got = stratified_split_exact(
        rd.from_arrow(t).repartition(4), {"train": 90, "val": 7, "test": 3}
    ).take_all()
    mix = _mix64_sql("doc_id", "t")
    want = duckdb.sql(
        f"WITH h AS ({mix}), "
        "r AS (SELECT doc_id, source, "
        " row_number() OVER (PARTITION BY source ORDER BY (x // 8589934592), doc_id) - 1 AS rn0, "
        " count(*) OVER (PARTITION BY source) AS n FROM h) "
        "SELECT doc_id, CASE WHEN rn0 < (n*90)//100 THEN 'train' "
        " WHEN rn0 < (n*97)//100 THEN 'val' ELSE 'test' END FROM r"
    ).fetchall()
    assert len(got) == len(ids)
    assert {r["doc_id"]: r["split"] for r in got} == dict(want)


def test_rank_per_group_stateless_mode_matches_grouped(ray_session):
    """include_row_number=False resolves rank/dense_rank/percent_rank/
    cume_dist in one stateless pass — bit-identical to the cogroup mode."""
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import rank_per_group

    t = _docs_table(2500, 5, 40)
    full = {
        r["doc_id"]: (r["rank"], r["dense_rank"], r["percent_rank"], r["cume_dist"])
        for r in rank_per_group(rd.from_arrow(t).repartition(4)).take_all()
    }
    fast = rank_per_group(
        rd.from_arrow(t).repartition(4), include_row_number=False
    ).take_all()
    assert "row_number" not in fast[0]
    got = {
        r["doc_id"]: (r["rank"], r["dense_rank"], r["percent_rank"], r["cume_dist"])
        for r in fast
    }
    assert got == full


def test_weighted_sample_k_exact_vs_referee_and_stable(ray_session):
    """A-ES is a pure function of (ids, weights, seed): the operator's
    top-k must equal a single-machine numpy referee computing the same
    exponential keys — and be invariant to repartitioning."""
    import ray.data as rd

    from parquetjs_ray.functions.sampling import _GOLDEN, _U, _mix64, weighted_sample_k

    rng = np.random.default_rng(53)
    n, k, seed = 20_000, 200, 3
    ids = rng.permutation(100_000)[:n].astype("int64")
    w = rng.integers(1, 5000, n).astype("int64")
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})

    salt = _U((seed * _GOLDEN) & 0xFFFFFFFFFFFFFFFF)
    h = _mix64(ids.astype(np.uint64) + salt)
    u = (h.astype(np.float64) + 0.5) / 18446744073709551616.0
    key = np.log(u) / w.astype(np.float64)
    referee = set(ids[np.argsort(key)[::-1][:k]].tolist())

    for parts in (3, 11):
        got = weighted_sample_k(
            rd.from_arrow(t).repartition(parts), k, seed=seed
        ).take_all()
        assert len(got) == k
        assert {r["doc_id"] for r in got} == referee


def test_weighted_sample_k_favors_heavy_and_skips_nonpositive(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.sampling import weighted_sample_k

    n = 5000
    ids = np.arange(n, dtype="int64")
    w = np.ones(n, dtype="int64")
    w[0] = 10_000_000  # overwhelming weight → sampled for any seed
    w[1] = 0  # never sampled
    t = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})
    for seed in range(5):
        got = {r["doc_id"] for r in weighted_sample_k(rd.from_arrow(t), 50, seed=seed).take_all()}
        assert 0 in got and 1 not in got and len(got) == 50


def test_group_argextreme_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_argextreme

    # duplicate extreme values across batches → tie resolution must be
    # the smallest id on BOTH ends
    rng = np.random.default_rng(59)
    n = 4000
    t = pa.table(
        {
            "doc_id": pa.array(rng.permutation(50_000)[:n].astype("int64")),
            "source": pa.array([f"s{i % 6}" for i in range(n)]),
            "n_chars": pa.array(rng.integers(0, 25, n).astype("int64")),
        }
    )
    got = group_argextreme(
        rd.from_arrow(t).repartition(7), "source", "n_chars", "doc_id"
    ).take_all()
    want = duckdb.sql(
        "WITH mn AS (SELECT source, n_chars a, doc_id b FROM t QUALIFY "
        " row_number() OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC) = 1), "
        "mx AS (SELECT source, n_chars c, doc_id d FROM t QUALIFY "
        " row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) = 1) "
        "SELECT mn.source, a, b, c, d FROM mn JOIN mx USING (source)"
    ).fetchall()
    w = {r[0]: r[1:] for r in want}
    g = {
        r["source"]: (r["min_n_chars"], r["min_doc_id"], r["max_n_chars"], r["max_doc_id"])
        for r in got
    }
    assert g == {k: tuple(v) for k, v in w.items()}


def test_funnel_stages_within_window_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.windows import funnel_stages

    rng = np.random.default_rng(61)
    n = 6000
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 300, n).astype("int64")),
            "event_type": pa.array(rng.choice(["view", "click", "purchase"], n).tolist()),
            "ts": pa.array(rng.integers(0, 10_000, n).astype("int64")),
        }
    )
    W = 40
    got = funnel_stages(
        rd.from_arrow(t).repartition(6), ["view", "click", "purchase"], within_us=W
    ).take_all()
    want = duckdb.sql(
        "WITH s1 AS (SELECT user_id, min(ts) AS t FROM t "
        " WHERE event_type='view' GROUP BY user_id), "
        f"s2 AS (SELECT e.user_id, min(e.ts) AS t FROM t e "
        f" JOIN s1 ON e.user_id=s1.user_id AND e.ts > s1.t AND e.ts <= s1.t + {W} "
        " WHERE e.event_type='click' GROUP BY e.user_id), "
        f"s3 AS (SELECT e.user_id, min(e.ts) AS t FROM t e "
        f" JOIN s2 ON e.user_id=s2.user_id AND e.ts > s2.t AND e.ts <= s2.t + {W} "
        " WHERE e.event_type='purchase' GROUP BY e.user_id) "
        "SELECT 1 AS stage, count(*) FROM s1 "
        "UNION ALL SELECT 2, count(*) FROM s2 "
        "UNION ALL SELECT 3, count(*) FROM s3"
    ).fetchall()
    g = {r["stage"]: r["n_keys"] for r in got}
    assert g == dict(want)
    # the window must actually bite vs the unwindowed funnel
    full = {
        r["stage"]: r["n_keys"]
        for r in funnel_stages(
            rd.from_arrow(t), ["view", "click", "purchase"]
        ).take_all()
    }
    assert g[2] < full[2] and g[3] < full[3]


def test_bm25_topk_matches_numpy_referee(ray_session):
    """BM25 is a pure function of (corpus, query): the operator's top-k
    ids AND float scores must equal a single-machine numpy referee using
    the same formula in the same term order — and be invariant to
    repartitioning."""
    import ray.data as rd

    from parquetjs_ray.functions.df import bm25_topk

    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(50)]
    docs = [
        " ".join(rng.choice(vocab, rng.integers(5, 60)).tolist()) for _ in range(800)
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(800, dtype="int64")), "text": pa.array(docs)}
    )
    terms, k, k1, b = ["w3", "w17", "w40"], 15, 1.2, 0.75

    # referee
    split = [d.split(" ") for d in docs]
    lens = np.array([len(s) for s in split], np.float64)
    tf = np.array([[s.count(term) for term in terms] for s in split], np.float64)
    df = (tf > 0).sum(axis=0)
    n = len(docs)
    avgdl = lens.sum() / n
    idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
    norm = k1 * (1.0 - b + b * (lens / avgdl))
    score = np.zeros(n, np.float64)
    for t_i in range(len(terms)):
        score += idf[t_i] * (tf[:, t_i] * (k1 + 1.0)) / (tf[:, t_i] + norm)
    order = np.lexsort((np.arange(n), -score))[:k]
    referee = [(int(i), score[i]) for i in order]

    for parts in (3, 9):
        got = bm25_topk(rd.from_arrow(t).repartition(parts), terms, k).take_all()
        assert [(r["doc_id"], r["score"]) for r in got] == referee


def test_bm25_topk_rejects_bad_args(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.df import bm25_topk

    t = pa.table({"doc_id": [1], "text": ["a b"]})
    with pytest.raises(ValueError):
        bm25_topk(rd.from_arrow(t), [], 5)
    with pytest.raises(ValueError):
        bm25_topk(rd.from_arrow(t), ["a"], 0)


# ————— fuzzy_dup_pairs: exact edit-distance near-dup mining —————


def _brute_lev(a: str, b: str) -> int:
    """Plain O(nm) Levenshtein on utf-8 bytes (referee)."""
    x, y = a.encode("utf-8"), b.encode("utf-8")
    prev = list(range(len(y) + 1))
    for i, ca in enumerate(x, 1):
        cur = [i]
        for j, cb in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(y)]


def test_lev_banded_matches_brute_force():
    from parquetjs_ray.functions.dedup import _lev_banded

    rng = np.random.default_rng(7)
    alpha = "abcd"
    for _ in range(200):
        n, m = rng.integers(0, 14, 2)
        a = "".join(alpha[i] for i in rng.integers(0, 4, n))
        b = "".join(alpha[i] for i in rng.integers(0, 4, m))
        for k in (0, 1, 3, 8):
            got = _lev_banded(
                np.frombuffer(a.encode(), np.uint8),
                np.frombuffer(b.encode(), np.uint8),
                k,
            )
            true = _brute_lev(a, b)
            if true <= k:
                assert got == true, (a, b, k)
            else:
                assert got > k, (a, b, k)


def test_lev_banded_byte_semantics_unicode():
    from parquetjs_ray.functions.dedup import _lev_banded

    # DuckDB levenshtein('héllo','hello') == 2 (bytes), not 1
    a = np.frombuffer("héllo".encode(), np.uint8)
    b = np.frombuffer("hello".encode(), np.uint8)
    assert _lev_banded(a, b, 10) == 2


def test_fuzzy_dup_pairs_exactly_once_across_buckets(ray_session):
    """Pairs must surface exactly once even when the two docs live in
    different (adjacent) length buckets, and never when buckets are
    non-adjacent but distance would qualify (impossible by the length
    bound) — brute-force referee over a planted corpus."""
    import ray.data as rd

    from parquetjs_ray.functions.dedup import fuzzy_dup_pairs

    rng = np.random.default_rng(11)
    base = "the quick brown fox jumps over the lazy dog " * 3
    texts, ids = [], []
    for i in range(80):
        # perturb: delete a random slice of 0..6 chars at a random spot
        cut = int(rng.integers(0, 7))
        at = int(rng.integers(0, len(base) - cut))
        texts.append(base[:at] + base[at + cut :] + "x" * int(rng.integers(0, 3)))
        ids.append(i)
    # plus some far-away docs that must never pair with anything
    for i in range(80, 100):
        texts.append("z" * int(rng.integers(200, 400)))
        ids.append(i)
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    k = 4
    got = (
        fuzzy_dup_pairs(rd.from_arrow(t), k=k, bucket_width=k)
        .sort(["id_a", "id_b"])
        .to_pandas()
    )
    want = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = _brute_lev(texts[i], texts[j])
            if d <= k:
                want.append((ids[i], ids[j], d))
    want.sort()
    assert list(map(tuple, got.itertuples(index=False))) == want
    # the planted z-docs all differ in length by >k from everything real
    assert got["dist"].max() <= k
    # exactly-once: no duplicated (id_a, id_b)
    assert not got.duplicated(["id_a", "id_b"]).any()


def test_fuzzy_dup_pairs_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.dedup import fuzzy_dup_pairs

    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(words[w] for w in rng.integers(0, 6, int(rng.integers(4, 30))))
        for _ in range(300)
    ]
    t = pa.table({"doc_id": pa.array(range(300), pa.int64()), "text": texts})
    got = fuzzy_dup_pairs(rd.from_arrow(t), k=6).sort(["id_a", "id_b"]).to_pandas()
    con = duckdb.connect()
    con.register("d", t)
    want = con.sql(
        "WITH cand AS MATERIALIZED (SELECT a.doc_id id_a, b.doc_id id_b, a.text ta, b.text tb "
        " FROM d a JOIN d b ON a.doc_id < b.doc_id AND abs(strlen(a.text)-strlen(b.text)) <= 6), "
        "s AS MATERIALIZED (SELECT id_a, id_b, levenshtein(ta, tb) dist FROM s0) "
        "SELECT id_a, id_b, dist FROM s WHERE dist <= 6 ORDER BY id_a, id_b".replace("s0", "cand")
    ).df()
    assert len(want) > 0  # the corpus genuinely contains near-dups
    assert got.astype("int64").values.tolist() == want.astype("int64").values.tolist()


def test_fuzzy_dup_pairs_rejects_bad_args(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.dedup import fuzzy_dup_pairs

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a"]})
    with pytest.raises(ValueError):
        fuzzy_dup_pairs(rd.from_arrow(t), k=-1)
    with pytest.raises(ValueError):
        fuzzy_dup_pairs(rd.from_arrow(t), k=5, bucket_width=3)


# ————— dataset_setop: INTERSECT / EXCEPT, set + bag semantics —————


def test_dataset_setop_all_four_ops_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.setops import dataset_setop

    rng = np.random.default_rng(9)
    def mk(n, seed_shift):
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 40, n).astype("int64")),
                "s": pa.array([f"v{int(x)}" for x in rng.integers(0, 6, n)]),
                "f": pa.array(np.round(rng.integers(0, 50, n) / 4.0, 2)),
            }
        )

    ta, tb = mk(3000, 0), mk(2500, 1)
    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    da, db = rd.from_arrow(ta), rd.from_arrow(tb)
    for op, sql in [
        ("intersect", "INTERSECT"),
        ("intersect_all", "INTERSECT ALL"),
        ("except", "EXCEPT"),
        ("except_all", "EXCEPT ALL"),
    ]:
        got = dataset_setop(da, db, op=op).sort(["k", "s", "f"]).to_pandas()[["k", "s", "f"]]
        want = con.sql(
            f"SELECT k, s, f FROM ta {sql} SELECT k, s, f FROM tb ORDER BY k, s, f"
        ).df()
        assert len(want) > 0, (op, "test data must exercise a nonempty result")
        assert got.reset_index(drop=True).values.tolist() == want.values.tolist(), op


def test_dataset_setop_nulls_and_collisions(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.setops import dataset_setop

    # nulls are equal to nulls (SQL set-op semantics: INTERSECT treats
    # NULLs as not distinct), and exact within-group compare means even
    # adversarial same-hash rows cannot merge
    ta = pa.table({"k": pa.array([1, None, 2, None], pa.int64()), "s": ["a", "b", "c", "b"]})
    tb = pa.table({"k": pa.array([None, 2], pa.int64()), "s": ["b", "c"]})
    got = (
        dataset_setop(rd.from_arrow(ta), rd.from_arrow(tb), op="intersect")
        .to_pandas()
        .sort_values(["s"])
    )
    assert got["s"].tolist() == ["b", "c"]
    exc = dataset_setop(rd.from_arrow(ta), rd.from_arrow(tb), op="except").to_pandas()
    assert exc["s"].tolist() == ["a"]


def test_dataset_setop_rejects_bad_args(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.setops import dataset_setop

    t = pa.table({"a": [1]})
    t2 = pa.table({"b": [1]})
    with pytest.raises(ValueError):
        dataset_setop(rd.from_arrow(t), rd.from_arrow(t2), op="intersect")
    with pytest.raises(ValueError):
        dataset_setop(rd.from_arrow(t), rd.from_arrow(t), op="union_weird")


# ————— group_collect: ordered string_agg / array_agg —————


def test_group_collect_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_collect

    rng = np.random.default_rng(21)
    n = 4000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 25, n).astype("int64")),
            "v": pa.array(rng.integers(0, 10_000, n).astype("int64")),
            "o": pa.array(rng.permutation(n).astype("int64")),  # unique order key
        }
    )
    con = duckdb.connect()
    con.register("t", t)
    got = group_collect(rd.from_arrow(t), "k", "v", order_col="o").sort("k").to_pandas()
    want = con.sql(
        "SELECT k, string_agg(CAST(v AS VARCHAR), ',' ORDER BY o) AS v_agg "
        "FROM t GROUP BY k ORDER BY k"
    ).df()
    assert got.reset_index(drop=True).equals(want)
    # array form
    got2 = (
        group_collect(rd.from_arrow(t), "k", "v", order_col="o", as_string=False)
        .sort("k")
        .to_pandas()
    )
    want2 = con.sql("SELECT k, array_agg(v ORDER BY o) AS v_agg FROM t GROUP BY k ORDER BY k").df()
    assert got2["k"].tolist() == want2["k"].tolist()
    assert all(list(a) == list(b) for a, b in zip(got2["v_agg"], want2["v_agg"]))


def test_group_collect_tie_fallback_deterministic(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_collect

    # equal order keys: result must still be a pure function of the data
    # (ties fall back to the value itself, ascending)
    t = pa.table({"k": [1, 1, 1], "v": ["b", "a", "c"], "o": [5, 5, 5]})
    got = group_collect(rd.from_arrow(t), "k", "v", order_col="o").to_pandas()
    assert got["v_agg"].tolist() == ["a,b,c"]


# ————— interval_overlap_join —————


def test_interval_overlap_join_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.joins import interval_overlap_join

    rng = np.random.default_rng(31)
    def mk(n, seed):
        s = rng.integers(0, 1_000_000, n).astype("int64")
        return pa.table(
            {
                "k": pa.array(rng.integers(0, 12, n).astype("int64")),
                "id": pa.array(np.arange(seed, seed + n).astype("int64")),
                "s": pa.array(s),
                "e": pa.array(s + rng.integers(0, 40_000, n)),
            }
        )

    ta, tb = mk(800, 0), mk(700, 10_000)
    con = duckdb.connect()
    con.register("ta", ta)
    con.register("tb", tb)
    got = (
        interval_overlap_join(
            rd.from_arrow(ta), rd.from_arrow(tb),
            key_col="k", start_col="s", end_col="e", id_col="id",
            bucket_us=25_000,  # smaller than max span: forces multi-bucket replication
        )
        .sort(["k", "id_a", "id_b"])
        .to_pandas()
    )
    want = con.sql(
        "SELECT a.k, a.id AS id_a, b.id AS id_b FROM ta a JOIN tb b "
        "ON a.k = b.k AND a.s <= b.e AND b.s <= a.e ORDER BY a.k, id_a, id_b"
    ).df()
    assert len(want) > 0
    assert got.reset_index(drop=True).astype("int64").equals(want.astype("int64"))
    # exactly-once even though intervals replicate across buckets
    assert not got.duplicated(["k", "id_a", "id_b"]).any()


def test_interval_overlap_join_guards(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.joins import interval_overlap_join

    t = pa.table({"k": [1], "id": [1], "s": [0], "e": [10_000_000]})
    # Ray wraps worker-side errors in RayTaskError — match on the message
    with pytest.raises(Exception, match="buckets"):
        interval_overlap_join(
            rd.from_arrow(t), rd.from_arrow(t),
            key_col="k", start_col="s", end_col="e", id_col="id",
            bucket_us=10, max_buckets_per_interval=16,
        ).take_all()
    bad = pa.table({"k": [1], "id": [1], "s": [10], "e": [5]})
    with pytest.raises(Exception):
        interval_overlap_join(
            rd.from_arrow(bad), rd.from_arrow(bad),
            key_col="k", start_col="s", end_col="e", id_col="id", bucket_us=100,
        ).take_all()


# ————— group_moments: exact overflow-proof second moments —————


def test_group_moments_exact_vs_python_bigint(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_moments

    rng = np.random.default_rng(41)
    n = 30_000
    # adversarial magnitudes: values near ±2^31 make per-value squares
    # ~2^62 and group sums far beyond int64 — only exact big-int folding
    # survives
    x = rng.integers(-(2**31) + 1, 2**31, n).astype("int64")
    y = rng.integers(-(2**31) + 1, 2**31, n).astype("int64")
    k = rng.integers(0, 4, n).astype("int64")
    t = pa.table({"k": k, "x": x, "y": y})
    got = group_moments(rd.from_arrow(t), "k", "x", "y").sort("k").to_pandas()
    for _, row in got.iterrows():
        m = k == row["k"]
        xs, ys = x[m].tolist(), y[m].tolist()  # python ints: exact
        assert row["n"] == len(xs)
        assert int(row["sum_x"]) == sum(xs)
        assert int(row["sum_xy"]) == sum(a * b for a, b in zip(xs, ys))
        assert int(row["sum_x2"]) == sum(a * a for a in xs)
        assert int(row["sum_y2"]) == sum(b * b for b in ys)
        assert int(row["sum_y2"]) > 2**63  # proves int64 would have overflowed


def test_group_moments_decimal_scaling_and_covariance(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_moments

    rng = np.random.default_rng(42)
    n = 5_000
    xs = np.round(rng.random(n) * 100.0, 2)  # 2-decimal doubles
    ys = rng.integers(0, 1000, n).astype("int64")
    k = rng.integers(0, 3, n).astype("int64")
    t = pa.table({"k": k, "x": pa.array(xs), "y": ys})
    got = group_moments(rd.from_arrow(t), "k", "x", "y", x_scale=2).sort("k").to_pandas()
    for _, row in got.iterrows():
        m = k == row["k"]
        nn = int(row["n"])
        sx, sy = int(row["sum_x"]), int(row["sum_y"])
        sxy = int(row["sum_xy"])
        cov = (nn * sxy - sx * sy) / nn**2 / 100.0  # undo the x scale
        ref = np.cov(xs[m], ys[m], bias=True)[0, 1]
        assert abs(cov - ref) < 1e-6 * max(1.0, abs(ref))


def test_group_moments_rejects_inexact_and_wide(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_moments

    t = pa.table({"k": [1, 1], "x": [0.1234567, 1.0], "y": [1, 2]})
    with pytest.raises(Exception, match="not exact"):
        group_moments(rd.from_arrow(t), "k", "x", "y", x_scale=2).take_all()
    t2 = pa.table({"k": [1], "x": [2**40], "y": [1]})
    with pytest.raises(Exception, match="31 bits"):
        group_moments(rd.from_arrow(t2), "k", "x", "y").take_all()


def test_grouped_quantiles_interpolated_matches_duckdb_bitexact(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import grouped_quantiles

    t = _docs_table(3001, 5, 700, seed=51)  # odd/even group sizes mixed
    got = (
        grouped_quantiles(
            rd.from_arrow(t).repartition(6),
            {"p25": 0.25, "p50": 0.5, "p90": 0.9, "pphi": 0.6180339887},
            interpolated=True,
        )
        .sort("source")
        .to_pandas()
    )
    want = duckdb.sql(
        "SELECT source, quantile_cont(n_chars, 0.25) AS p25, "
        "quantile_cont(n_chars, 0.5) AS p50, quantile_cont(n_chars, 0.9) AS p90, "
        "quantile_cont(n_chars, 0.6180339887) AS pphi "
        "FROM t GROUP BY source ORDER BY source"
    ).df()
    # bit-exact doubles, not approx
    for c in ("p25", "p50", "p90", "pphi"):
        assert np.array_equal(
            got[c].to_numpy().view(np.int64), want[c].to_numpy().view(np.int64)
        ), c


def test_mode_per_group_matches_duckdb_with_cross_batch_ties(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import mode_per_group

    rng = np.random.default_rng(61)
    n = 6000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, n).astype("int64")),
            "v": pa.array(rng.choice(["a", "b", "c", "d"], n).tolist()),
        }
    )
    got = (
        mode_per_group(rd.from_arrow(t).repartition(7), "k", "v").sort("k").to_pandas()
    )
    want = duckdb.sql(
        "WITH c AS (SELECT k, v, count(*) AS n FROM t GROUP BY k, v) "
        "SELECT k, v AS mode_val, n AS mode_n FROM c "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY n DESC, v) = 1 ORDER BY k"
    ).df()
    assert got.reset_index(drop=True).equals(want)
    # exact tie: smallest value must win deterministically
    t2 = pa.table({"k": [1, 1, 1, 1], "v": ["z", "z", "a", "a"]})
    got2 = mode_per_group(rd.from_arrow(t2).repartition(2), "k", "v").to_pandas()
    assert got2["mode_val"].tolist() == ["a"] and got2["mode_n"].tolist() == [2]


def test_mad_outliers_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import mad_outliers_per_group

    t = _docs_table(3000, 5, 900, seed=71)
    got = (
        mad_outliers_per_group(
            rd.from_arrow(t).repartition(6), c_num=3, c_den=2
        )
        .sort("doc_id")
        .to_pandas()
    )
    want = duckdb.sql(
        "WITH m AS (SELECT source, quantile_disc(n_chars, 0.5) AS med FROM t GROUP BY source), "
        "dv AS (SELECT t.doc_id, t.source, t.n_chars, abs(t.n_chars - m.med) AS dev "
        " FROM t JOIN m USING (source)), "
        "s AS (SELECT source, quantile_disc(dev, 0.5) AS mad FROM dv GROUP BY source) "
        "SELECT dv.doc_id, dv.source, dv.n_chars, dv.dev, s.mad, "
        " (2*dv.dev > 3*s.mad) AS is_outlier "
        "FROM dv JOIN s USING (source) ORDER BY dv.doc_id"
    ).df()
    assert got["is_outlier"].sum() > 0  # the corpus must exercise real flags
    assert got.reset_index(drop=True).equals(want)


def test_mad_outliers_constant_group_flags_nothing(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import mad_outliers_per_group

    # constant group: MAD = 0, dev = 0 → 0 > 0 false, nothing flagged
    t = pa.table({"doc_id": [1, 2, 3], "source": ["s"] * 3, "n_chars": [7, 7, 7]})
    got = mad_outliers_per_group(rd.from_arrow(t)).to_pandas()
    assert not got["is_outlier"].any()


def test_extract_json_int_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.text import extract_json_int

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "props": ['{"k": 69}', '{"k":-3}', '{"other": 1}', "{}", '{ "k" : 12, "z": 9}'],
        }
    )
    got = extract_json_int(rd.from_arrow(t), col="props", field="k").sort("event_id").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "SELECT event_id, CAST(NULLIF(regexp_extract(props, '\"k\"\\s*:\\s*(-?\\d+)', 1), '') AS BIGINT) AS k "
        "FROM t ORDER BY event_id"
    ).df()
    assert got.reset_index(drop=True).equals(want)
    assert got["k"].isna().tolist() == [False, False, True, True, False]


def test_resample_ffill_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.windows import resample_ffill

    rng = np.random.default_rng(81)
    n = 600  # sparse: many keys first observed mid-span → leading NULLs
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 40, n).astype("int64")),
            "ts": pa.array(rng.integers(0, 500_000, n).astype("int64")),
            "value": pa.array(np.round(rng.random(n) * 100, 2)),
            "event_id": pa.array(rng.permutation(n).astype("int64")),
        }
    )
    W = 10_000
    got = (
        resample_ffill(rd.from_arrow(t).repartition(6), bucket_us=W)
        .sort(["user_id", "bucket"])
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        f"WITH b AS (SELECT user_id, ts // {W} AS b, value, ts AS tt, event_id FROM t), "
        "lastv AS (SELECT user_id, b, value FROM b "
        " QUALIFY row_number() OVER (PARTITION BY user_id, b ORDER BY tt DESC, event_id DESC) = 1), "
        "bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM b), "
        "grid AS (SELECT u.user_id, g.b FROM (SELECT DISTINCT user_id FROM b) u "
        " CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS b FROM bounds) g), "
        "j AS (SELECT grid.user_id, grid.b, lastv.value FROM grid LEFT JOIN lastv USING (user_id, b)) "
        "SELECT user_id, b AS bucket, last_value(value IGNORE NULLS) OVER "
        " (PARTITION BY user_id ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value "
        "FROM j ORDER BY user_id, bucket"
    ).df()
    assert want["value"].isna().any()  # leading-null region genuinely exercised
    assert got.reset_index(drop=True).equals(want)


def test_resample_ffill_sparse_key_leading_nulls(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import resample_ffill

    # key 2 first observed late: its grid rows before that must be NULL,
    # and ties inside a bucket resolve to the greatest (ts, event_id)
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 2, 1], pa.int64()),
            "ts": pa.array([5, 25, 35, 25], pa.int64()),
            "value": pa.array([1.0, 2.0, 9.0, 3.0]),
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    got = (
        resample_ffill(rd.from_arrow(t), bucket_us=10)
        .sort(["user_id", "bucket"])
        .to_pandas()
    )
    # global grid buckets 0..3; key 1: [1.0, 1.0, 3.0 (event_id 4 beats 2), 3.0]
    k1 = got[got["user_id"] == 1]["value"].tolist()
    assert k1 == [1.0, 1.0, 3.0, 3.0]
    k2 = got[got["user_id"] == 2]["value"].tolist()
    assert k2[:3] == [None, None, None] or (np.isnan(k2[:3]).all())
    assert k2[3] == 9.0


def test_group_approx_distinct_error_bound_and_merge(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_approx_distinct

    rng = np.random.default_rng(91)
    n = 60_000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 4, n).astype("int64")),
            "v": pa.array(rng.integers(0, 15_000, n).astype("int64")),
        }
    )
    got = (
        group_approx_distinct(rd.from_arrow(t).repartition(8), "k", "v")
        .sort("k")
        .to_pandas()
    )
    want = duckdb.sql(
        "SELECT k, count(DISTINCT v) AS n FROM t GROUP BY k ORDER BY k"
    ).df()
    # ±5% (3 sigma at p=12 is ~4.9%) on every group, merge-invariant
    # across the 8-partition split
    for g, w in zip(got["n_distinct_approx"], want["n"]):
        assert abs(g - w) <= 0.05 * w, (g, w)
    # determinism: same input, different partitioning → identical result
    got2 = (
        group_approx_distinct(rd.from_arrow(t).repartition(3), "k", "v")
        .sort("k")
        .to_pandas()
    )
    assert got["n_distinct_approx"].tolist() == got2["n_distinct_approx"].tolist()


def test_group_approx_distinct_string_values(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_approx_distinct

    t = pa.table(
        {
            "k": pa.array([1] * 1000, pa.int64()),
            "v": [f"doc-{i % 137}" for i in range(1000)],
        }
    )
    got = group_approx_distinct(rd.from_arrow(t), "k", "v").to_pandas()
    assert abs(int(got["n_distinct_approx"][0]) - 137) <= 10


# ————— distributed byte-level BPE training —————


def _ref_bpe(texts, k):
    """Sequential reference BPE: raw adjacent-pair counts (classic
    Sennrich counting), greedy-leftmost non-overlapping application,
    ties to the smallest (a, b)."""
    from collections import Counter

    docs = [list(t.encode()) for t in texts]
    merges = []
    for step in range(k):
        c = Counter()
        for d in docs:
            for i in range(len(d) - 1):
                c[(d[i], d[i + 1])] += 1
        if not c or max(c.values()) < 2:
            break
        maxc = max(c.values())
        a, b = min(p for p, n in c.items() if n == maxc)
        nid = 256 + step
        merges.append((a, b, nid))
        for di, d in enumerate(docs):
            out, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == a and d[i + 1] == b:
                    out.append(nid)
                    i += 2
                else:
                    out.append(d[i])
                    i += 1
            docs[di] = out
    return merges, docs


def test_bpe_train_matches_sequential_referee(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.tokenize import bpe_encode, bpe_train

    rng = np.random.default_rng(101)
    words = ["the", "cat", "sat", "hat", "aaa", "bb", "banana"]
    texts = [
        " ".join(words[w] for w in rng.integers(0, len(words), int(rng.integers(2, 12))))
        for _ in range(60)
    ]
    merges_ref, docs_ref = _ref_bpe(texts, 16)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    merges = bpe_train(rd.from_arrow(t).repartition(5), n_merges=16)
    assert merges == merges_ref  # byte-stable incl. a==b overlap runs
    enc = bpe_encode(rd.from_arrow(t), merges).sort("doc_id").to_pandas()
    assert all(list(enc["tokens"][i]) == docs_ref[i] for i in range(len(texts)))
    assert enc["n_tok"].tolist() == [len(d) for d in docs_ref]


def test_bpe_train_partitioning_invariant(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.tokenize import bpe_train

    texts = ["abcabcabc", "abcabc", "xyzxyz"] * 10
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    m1 = bpe_train(rd.from_arrow(t).repartition(2), n_merges=8)
    m2 = bpe_train(rd.from_arrow(t).repartition(7), n_merges=8)
    assert m1 == m2 and len(m1) > 0


def test_pca_fit_transform_matches_numpy(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.ann import pca_fit, pca_transform

    rng = np.random.default_rng(111)
    n, d, k = 800, 12, 4
    # anisotropic data: PCA must find the stretched axes
    basis = rng.normal(size=(d, d))
    X = (rng.normal(size=(n, d)) * np.array([10, 5, 3, 2] + [0.1] * (d - 4))) @ basis
    X = X.astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype="int64")),
            "embedding": pa.array([row for row in X.tolist()], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(5)
    mean, comp = pca_fit(ds, k=k)
    X64 = X.astype(np.float64)
    mu = X64.mean(axis=0)
    C = np.cov(X64.T, bias=True)
    w, v = np.linalg.eigh(C)
    ref = v[:, ::-1][:, :k].T
    flip = ref[np.arange(k), np.abs(ref).argmax(axis=1)] < 0
    ref[flip] *= -1
    assert np.abs(mean - mu).max() < 1e-9
    assert np.abs(comp - ref).max() < 1e-9  # incl. the deterministic signs
    out = pca_transform(ds, mean, comp).sort("vec_id").to_pandas()
    P = np.stack(out["embedding"].tolist())
    refp = ((X64 - mu) @ ref.T).astype(np.float32)
    assert np.abs(P - refp).max() == 0.0
    # the top-k basis captures the planted anisotropy
    cap = w[::-1][:k].sum() / np.trace(C)
    assert cap > 0.95


def test_pca_fit_deterministic_across_partitionings(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.ann import pca_fit

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    m1, c1 = pca_fit(ds.repartition(2), k=6)
    m2, c2 = pca_fit(ds.repartition(2), k=6)
    assert np.array_equal(m1, m2) and np.array_equal(c1, c2)


def test_group_regression_matches_duckdb_bitexact(ray_session):
    import duckdb
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_regression

    rng = np.random.default_rng(121)
    n = 8000
    k = rng.integers(0, 6, n).astype("int64")
    x = rng.integers(0, 500, n).astype("int64")
    y = (3 * x + rng.integers(-50, 50, n)).astype("int64")
    t = pa.table({"k": k, "x": x, "y": y})
    # plus one degenerate group: constant x → NULL slope
    t = pa.concat_tables(
        [t, pa.table({"k": [99, 99], "x": [7, 7], "y": [1, 2]})]
    )
    got = group_regression(rd.from_arrow(t).repartition(5), "k", "x", "y").sort("k").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "WITH m AS (SELECT k, count(*)::BIGINT n, sum(x) sx, sum(y) sy, "
        " sum(x*y) sxy, sum(x*x) sx2 FROM t GROUP BY k) "
        "SELECT k, n, "
        "CASE WHEN n*sx2 - sx*sx = 0 THEN NULL ELSE "
        " CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sx2 - sx*sx AS DOUBLE) END AS slope, "
        "CASE WHEN n*sx2 - sx*sx = 0 THEN NULL ELSE "
        " (CAST(sy AS DOUBLE) - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sx2 - sx*sx AS DOUBLE)) "
        "  * CAST(sx AS DOUBLE)) / n END AS intercept "
        "FROM m ORDER BY k"
    ).df()
    assert got["k"].tolist() == want["k"].tolist()
    real = want["slope"].notna()
    assert np.array_equal(
        got["slope"][real].to_numpy().view(np.int64),
        want["slope"][real].to_numpy().view(np.int64),
    )
    assert got["slope"][~real].isna().all()
    # planted relationship recovered
    assert all(abs(s - 3.0) < 0.2 for s in got["slope"][real][got["k"][real] != 99])


def test_twap_per_group_matches_duckdb_bitexact(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import twap_per_group

    rng = np.random.default_rng(41)
    n = 4000
    base = 1_700_000_000_000_000
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 37, n).astype("int64")),
            # multi-day span so cross-bucket intervals exercise phase 2
            "ts": pa.array(
                base + rng.integers(0, 5 * 86_400_000_000, n).astype("int64"),
                pa.timestamp("us"),
            ),
            "event_id": pa.array(rng.permutation(n).astype("int64")),
            "value": pa.array(np.round(rng.uniform(0, 500, n), 2)),
        }
    )
    got = (
        twap_per_group(rd.from_arrow(t).repartition(6))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH e AS (SELECT user_id, epoch_us(ts) t, CAST(round(value*100) AS HUGEINT) v, "
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) tn FROM t) "
        "SELECT user_id, count(*)::BIGINT + 1 AS n_events, "
        "CAST(sum(v*(tn-t)) AS DOUBLE)/CAST(sum(tn-t)*100 AS DOUBLE) AS twap "
        "FROM e WHERE tn IS NOT NULL GROUP BY user_id ORDER BY user_id"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)  # bit-exact doubles


def test_twap_per_group_edge_cases(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.windows import twap_per_group

    t = pa.table(
        {
            "user_id": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
            "ts": pa.array(
                [0, 10, 10, 0, 2_000_000, 4_000_000], pa.timestamp("us")
            ),
            "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "value": pa.array([5.0, 3.0, 7.0, 10.0, 20.0, 99.0]),
        }
    )
    rows = {r["user_id"]: r for r in twap_per_group(rd.from_arrow(t).repartition(3)).take_all()}
    assert 1 not in rows  # single event: no interval, no row (SQL parity)
    assert rows[2]["twap"] is None or np.isnan(rows[2]["twap"])  # all same ts: 0/0 → NULL
    # user 3: 10.0 for 2s then 20.0 for 2s → 15.0 exactly
    assert rows[3]["n_events"] == 3 and rows[3]["twap"] == 15.0


def test_twap_per_group_hot_key_block_split_invariant(ray_session):
    """One user owning every event: phase 1 resolves intervals per BLOCK
    of the global sort, so no task ever materializes the key's history,
    and the exact result is invariant to where the block splits fall."""
    import ray.data as rd

    from parquetjs_ray.functions.windows import twap_per_group

    rng = np.random.default_rng(7)
    n = 20_000
    t = pa.table(
        {
            "user_id": pa.array(np.zeros(n, dtype="int64")),
            "ts": pa.array(
                np.sort(rng.integers(0, 10 * 86_400_000_000, n)).astype("int64"),
                pa.timestamp("us"),
            ),
            "event_id": pa.array(np.arange(n, dtype="int64")),
            "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        }
    )
    a = twap_per_group(rd.from_arrow(t).repartition(8)).take_all()
    b = twap_per_group(rd.from_arrow(t).repartition(37)).take_all()
    assert len(a) == len(b) == 1
    assert a[0]["twap"] == b[0]["twap"] and a[0]["n_events"] == n


def test_group_hhi_matches_duckdb_bitexact(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_hhi

    rng = np.random.default_rng(11)
    n = 6000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 23, n).astype("int64")),
            "v": pa.array([f"t{x}" for x in rng.integers(0, 7, n) ** 2]),
        }
    )
    got = (
        group_hhi(rd.from_arrow(t).repartition(5), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH c AS (SELECT k, v, count(*)::HUGEINT c FROM t GROUP BY 1,2) "
        "SELECT k, sum(c)::BIGINT n, count(*)::BIGINT n_distinct, "
        "CAST(sum(c*c) AS DOUBLE)/CAST(sum(c)*sum(c) AS DOUBLE) hhi "
        "FROM c GROUP BY k ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # single-value key ⇒ hhi exactly 1.0
    one = group_hhi(
        rd.from_arrow(pa.table({"k": pa.array([9, 9, 9], pa.int64()), "v": ["a", "a", "a"]})),
        "k", "v",
    ).take_all()
    assert one[0]["hhi"] == 1.0 and one[0]["n_distinct"] == 1


def test_ttr_batch_matches_duckdb_and_is_collision_free(ray_session):
    import duckdb
    import pandas as pd

    from parquetjs_ray.functions.text import ttr_batch

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)] + ["naïve", "héllo", ""]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 60)))
        for _ in range(400)
    ] + ["", "x", "a a a a"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    got = ttr_batch(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT doc_id, len(string_split(text,' '))::BIGINT n_words, "
        "len(list_distinct(string_split(text,' ')))::BIGINT n_distinct_words, "
        "CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)/"
        "CAST(len(string_split(text,' ')) AS DOUBLE) ttr FROM t ORDER BY doc_id"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_group_chisq_matches_duckdb_bitexact(ray_session):
    """Randomized label mixes incl. keys missing domain values entirely
    (their expected-count terms must still contribute)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_chisq

    rng = np.random.default_rng(19)
    n = 5000
    types = ["a", "b", "c", "dd"]
    # skewed per-key mixes; key 0 only ever emits 'a' (missing 3 domain values)
    ks = rng.integers(0, 17, n).astype("int64")
    vs = np.array(types, object)[rng.integers(0, 4, n)]
    vs[ks == 0] = "a"
    t = pa.table({"k": pa.array(ks), "v": pa.array(vs.tolist())})
    got = (
        group_chisq(rd.from_arrow(t).repartition(5), "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    terms = " + ".join(
        f"CAST((o_{x}*bign - n*c_{x})*(o_{x}*bign - n*c_{x}) AS DOUBLE)"
        f"/CAST(n*c_{x}*bign AS DOUBLE)"
        for x in sorted(types)
    )
    obs = ", ".join(
        f"count(*) FILTER (v='{x}')::HUGEINT AS o_{x}" for x in sorted(types)
    )
    gcs = ", ".join(
        f"max(CASE WHEN v='{x}' THEN c END) AS c_{x}" for x in sorted(types)
    )
    want = duckdb.sql(
        f"WITH g AS (SELECT v, count(*)::HUGEINT c FROM t GROUP BY 1), "
        f"tot AS (SELECT sum(c) AS bign, {gcs} FROM g), "
        f"u AS (SELECT k, count(*)::HUGEINT n, {obs} FROM t GROUP BY 1) "
        f"SELECT k, n::BIGINT AS n, {terms} AS chisq FROM u, tot ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    # the all-'a' key diverges far more than any mixed key
    row0 = got[got["k"] == 0]["chisq"].iloc[0]
    assert row0 > got[got["k"] != 0]["chisq"].max()


def test_grouping_sets_matches_duckdb(ray_session):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.groupops import grouping_sets_aggregate

    t = _docs_table(1800, 4, 30)
    got = (
        grouping_sets_aggregate(
            rd.from_arrow(t).repartition(5),
            ["source"],
            [("source",), ()],
            value="n_chars",
        )
        .to_pandas()
        .sort_values(["lvl", "source"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "SELECT source, CAST(grouping(source) AS BIGINT) lvl, "
        "CAST(count(*) AS BIGINT) n, CAST(sum(n_chars) AS BIGINT) sum_v "
        "FROM t GROUP BY GROUPING SETS ((source), ()) ORDER BY lvl, source"
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_exact=True)


def test_grouping_sets_rejects_bad_sets(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.groupops import grouping_sets_aggregate

    t = _docs_table(10)
    ds = rd.from_arrow(t)
    with pytest.raises(ValueError, match="unknown keys"):
        grouping_sets_aggregate(ds, ["source"], [("nope",)], value="n_chars")
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_aggregate(ds, ["source"], [("source",), ("source",)], value="n_chars")


def test_vocab_coverage_matches_duckdb(ray_session):
    """Randomized Zipf-ish vocabulary with a forced multi-word tie class
    at the boundary; plus the coverage=1 (keep-all) edge."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.df import vocab_coverage

    rng = np.random.default_rng(29)
    vocab = [f"w{i:03d}" for i in range(120)]
    # Zipf-ish: word i appears ~1200/(i+1) times; many 1-count ties at the tail
    words = []
    for i, w in enumerate(vocab):
        words += [w] * max(1, 1200 // (i + 1))
    rng.shuffle(words)
    texts = [" ".join(words[i::40]) for i in range(40)]  # 40 docs partition the bag
    t = pa.table({"text": texts})
    for num, den in ((8, 10), (999, 1000), (1, 1), (1, 10**9)):
        got = vocab_coverage(rd.from_arrow(t).repartition(7), num, den).to_pandas()
        want = duckdb.sql(
            "WITH w AS (SELECT unnest(string_split(text,' ')) AS word FROM t), "
            "c AS (SELECT word, count(*)::BIGINT AS cnt FROM w GROUP BY 1), "
            "tt AS (SELECT sum(cnt)::HUGEINT AS total FROM c) "
            "SELECT word, cnt FROM c, tt "
            "QUALIFY (sum(cnt) OVER (ORDER BY cnt DESC, word) - cnt)::HUGEINT "
            f"< (total * {num}) // {den} ORDER BY word"
        ).df()
        if len(want) == 0:
            assert len(got) == 0  # tiny-coverage edge: empty on both sides
            continue
        got = got.sort_values("word").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_group_corr_matches_duckdb_bitexact(ray_session):
    """Pearson r + population covariance bit-equal to SQL (sqrt is a
    correctly-rounded IEEE op), incl. a zero-variance group → NULL corr."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.groupops import group_corr

    rng = np.random.default_rng(31)
    n = 3000
    k = rng.integers(0, 7, n).astype("int64")
    x = rng.integers(-500, 500, n).astype("int64")
    y = (3 * x + rng.integers(-40, 40, n)).astype("float64") / 100.0  # 2-decimal, corr≈1
    x = x.astype("float64")
    k[:50] = 99  # degenerate group: constant x → NULL corr
    x[:50] = 7.0
    t = pa.table({"k": pa.array(k), "x": pa.array(x), "y": pa.array(np.round(y, 2))})
    got = (
        group_corr(rd.from_arrow(t).repartition(6), "k", "x", "y", x_scale=0, y_scale=2)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        "WITH s AS (SELECT k, CAST(round(x) AS BIGINT) x, CAST(round(y*100) AS BIGINT) y FROM t), "
        "m AS (SELECT k, count(*)::BIGINT n, sum(x) sx, sum(y) sy, sum(x*y) sxy, "
        " sum(x*x) sx2, sum(y*y) sy2 FROM s GROUP BY k) "
        "SELECT k, n, CAST(n*sxy - sx*sy AS DOUBLE)/CAST(n*n AS DOUBLE) AS cov_pop, "
        "CASE WHEN n*sx2-sx*sx = 0 OR n*sy2-sy*sy = 0 THEN NULL ELSE "
        " CAST(n*sxy - sx*sy AS DOUBLE)/sqrt(CAST(n*sx2-sx*sx AS DOUBLE)*CAST(n*sy2-sy*sy AS DOUBLE)) END AS corr "
        "FROM m ORDER BY k"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert np.isnan(got[got["k"] == 99]["corr"].iloc[0])
    assert got[got["k"] != 99]["corr"].min() > 0.99


def test_dedup_keep_best_keeps_longest_per_cluster(ray_session):
    """Planted mirror clusters: exactly one survivor per cluster (the
    longest, ties → smallest id), unclustered docs untouched."""
    import ray.data as rd

    from parquetjs_ray.functions.dedup import dedup_keep_best

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "n_chars": pa.array([10, 30, 30, 5, 99, 7, 7], pa.int64()),
        }
    )
    # clusters: {1,2,3} (max 30 tied between 2,3 → keep 2), {6,7} (tie → 6)
    clusters = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 6, 7], pa.int64()),
            "cluster_id": pa.array([1, 1, 1, 6, 6], pa.int64()),
        }
    )
    got = dedup_keep_best(rd.from_arrow(docs).repartition(3), clusters)
    kept = sorted(r["doc_id"] for r in got.take_all())
    assert kept == [2, 4, 5, 6]


def test_collocations_topk_matches_duckdb_bitexact(ray_session):
    """PMI-ranked collocations: planted strong pair + filler; pmi_milli
    floor division bit-identical to DuckDB HUGEINT //, LIMIT semantics,
    consecutive-space empty words, repartition invariance."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.lm import collocations_topk

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(300):
        ws = list(rng.choice(words, size=12))
        if i % 3 == 0:
            ws[4:6] = ["san", "francisco"]  # planted collocation
        if i % 50 == 0:
            ws.append("")  # trailing space -> empty word
        texts.append(" ".join(ws))
    docs = pa.table({"doc_id": pa.array(range(300), pa.int64()), "text": texts})

    got = (
        collocations_topk(rd.from_arrow(docs).repartition(5), k=10, min_count=3)
        .to_pandas()
        .sort_values(["pmi_milli", "w1", "w2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        "WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents), "
        "tot AS (SELECT CAST(sum(len(ws)) AS HUGEINT) AS n FROM w), "
        "uni AS (SELECT word, CAST(count(*) AS HUGEINT) AS c FROM "
        " (SELECT unnest(ws) AS word FROM w) GROUP BY word), "
        "bi0 AS (SELECT ws, unnest(generate_series(1, greatest(len(ws)-1, 0))) AS i FROM w), "
        "bi AS (SELECT ws[i] AS w1, ws[i+1] AS w2, CAST(count(*) AS HUGEINT) AS cnt "
        " FROM bi0 GROUP BY 1, 2), "
        "sc AS (SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt, "
        " CAST((1000 * cnt * (SELECT n FROM tot)) // (u1.c * u2.c) AS BIGINT) AS pmi_milli "
        " FROM bi JOIN uni u1 ON bi.w1 = u1.word JOIN uni u2 ON bi.w2 = u2.word "
        " WHERE cnt >= 3) "
        "SELECT w1, w2, cnt, pmi_milli FROM sc ORDER BY pmi_milli DESC, w1, w2 LIMIT 10"
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"cnt": "int64", "pmi_milli": "int64"}),
        want.astype({"cnt": "int64", "pmi_milli": "int64"}),
        check_exact=True,
    )
    # the planted pair dominates PMI
    assert got.iloc[0]["w1"] == "san" and got.iloc[0]["w2"] == "francisco"

    # repartition invariance: different layout, identical result
    got2 = (
        collocations_topk(rd.from_arrow(docs).repartition(1), k=10, min_count=3)
        .to_pandas()
        .sort_values(["pmi_milli", "w1", "w2"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2, check_exact=True)


def test_cohort_retention_matches_duckdb(ray_session):
    """Staggered cohorts with gaps + a hot key: exact parity with the
    DISTINCT-pair/min-cohort SQL, invariant to partitioning."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import cohort_retention

    W = 1000  # bucket width (us)
    rows = []
    # user 1: first in bucket 0, returns 0,2,5 (gap at 1,3,4)
    for b in (0, 2, 5):
        rows.append((1, b * W + 7))
    # user 2: same cohort, returns 0,1
    for b in (0, 1):
        rows.append((2, b * W + 3))
    # user 3: cohort 2, active 2 only
    rows.append((3, 2 * W + 1))
    # user 4 is HOT: 10_000 events all inside buckets 1 and 3
    for i in range(10_000):
        rows.append((4, (1 if i % 2 else 3) * W + (i % W)))
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    got = (
        cohort_retention(rd.from_arrow(ev).repartition(7), bucket_us=W)
        .to_pandas()
        .sort_values(["cohort", "period"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        f"WITH p AS (SELECT DISTINCT user_id, CAST(epoch_us(ts) // {W} AS BIGINT) AS d "
        " FROM events), "
        "c AS (SELECT user_id, min(d) AS cohort FROM p GROUP BY user_id) "
        "SELECT c.cohort, p.d - c.cohort AS period, CAST(count(*) AS BIGINT) AS n_keys "
        "FROM p JOIN c USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"), check_exact=True)
    # the hot key contributed exactly two pair rows (cohort 1, periods 0 and 2)
    assert got[(got.cohort == 1) & (got.period == 2)]["n_keys"].iloc[0] == 1


def test_transition_counts_matches_duckdb(ray_session):
    """Hot key whose chain crosses many bucket boundaries + ts ties
    broken by event_id: exact parity with the SQL lead() window."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import transition_counts

    W = 100  # tiny bucket so chains cross boundaries constantly
    rng = np.random.default_rng(11)
    labels = np.array(["a", "b", "c"])
    rows = []
    eid = 0
    # hot user 1: 3000 events spread over 30 buckets
    for i in range(3000):
        rows.append((1, i, eid, labels[rng.integers(3)])); eid += 1
    # user 2: ts TIES (all same ts) -> order decided purely by event_id
    for i in range(10):
        rows.append((2, 500, eid, labels[i % 3])); eid += 1
    # user 3: single event -> no transitions
    rows.append((3, 7, eid, "a")); eid += 1
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    got = (
        transition_counts(rd.from_arrow(ev).repartition(6), bucket_us=W)
        .to_pandas()
        .sort_values(["prev_type", "next_type"])
        .reset_index(drop=True)
    )
    got["n"] = got["n"].astype("int64")
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH s AS (SELECT user_id, event_type, lead(event_type) OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
        "SELECT event_type AS prev_type, nxt AS next_type, CAST(count(*) AS BIGINT) AS n "
        "FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got["n"].sum() == 2999 + 9  # per-key (len-1) totals


def test_path_topk_matches_duckdb(ray_session):
    """Top-k earliest-5 journeys: hot key (its path is just its first 5
    events regardless of history size), ts ties broken by event_id,
    short keys (< n_steps events) keep their shorter path, and the
    result is block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import path_topk

    rng = np.random.default_rng(17)
    labels = np.array(["view", "click", "buy"])
    rows = []
    eid = 0
    # 200 normal users, 6-12 events each
    for u in range(200):
        for i in range(int(rng.integers(6, 13))):
            rows.append((u, int(rng.integers(0, 10_000)), eid, labels[rng.integers(3)])); eid += 1
    # hot user 9000: 5000 events — only the first 5 matter
    for i in range(5000):
        rows.append((9000, i, eid, labels[i % 3])); eid += 1
    # user 9001: ts all tied -> order decided by event_id alone
    for i in range(7):
        rows.append((9001, 42, eid, labels[(i * 2) % 3])); eid += 1
    # user 9002: fewer than n_steps events -> short path
    rows.append((9002, 1, eid, "buy")); eid += 1
    rows.append((9002, 2, eid, "view")); eid += 1
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH r AS (SELECT user_id, event_type, row_number() OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
        "p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path "
        " FROM r WHERE rn <= 5 GROUP BY user_id) "
        "SELECT path, CAST(count(*) AS BIGINT) AS n_keys FROM p GROUP BY path "
        "ORDER BY n_keys DESC, path LIMIT 20"
    ).df()
    for parts in (3, 11):
        got = (
            path_topk(rd.from_arrow(ev).repartition(parts), n_steps=5, k=20, num_buckets=8)
            .to_pandas()
            .reset_index(drop=True)
        )
        got["n_keys"] = got["n_keys"].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_tfidf_top_terms_matches_duckdb(ray_session):
    """Integer-exact tf-idf keyword extraction: randomized zipf-ish docs,
    repeated words (tf > 1), k larger than some docs' vocab, block-split
    invariant, hash-exact vs the SQL replica."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.df import tfidf_top_terms

    rng = np.random.default_rng(29)
    words = np.array([f"w{i}" for i in range(40)])
    texts, ids = [], []
    for d in range(300):
        n = int(rng.integers(1, 30))
        # zipf-ish pick so common words get high df and high tf
        picks = words[np.minimum(rng.zipf(1.6, n) - 1, 39)]
        texts.append(" ".join(picks))
        ids.append(d)
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "u AS (SELECT doc_id, unnest(w) AS word FROM t), "
        "tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM u GROUP BY 1, 2), "
        "df AS (SELECT word, count(DISTINCT doc_id) AS df FROM u GROUP BY 1), "
        "n AS (SELECT count(*) AS n FROM documents), "
        "s AS (SELECT tf.doc_id, tf.word, tf.tf, "
        " tf.tf * ((1000 * (SELECT n FROM n)) // df.df) AS score_milli "
        " FROM tf JOIN df USING (word)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        " ORDER BY score_milli DESC, word) AS rn FROM s) "
        "SELECT doc_id, word, tf, CAST(score_milli AS BIGINT) AS score_milli "
        "FROM r WHERE rn <= 3 ORDER BY doc_id, word"
    ).df()
    for parts in (1, 7):
        got = (
            tfidf_top_terms(rd.from_arrow(docs).repartition(parts), k=3)
            .to_pandas()
            .sort_values(["doc_id", "word"])
            .reset_index(drop=True)
        )
        for c in ("tf", "score_milli"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_weighted_median_matches_duckdb(ray_session):
    """Exact lower weighted median: hot key (one group owns 80% of rows),
    .5-cent values (half-away-from-zero rounding parity), weight ties at
    the exact half-total boundary, block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import weighted_median_per_group

    rng = np.random.default_rng(31)
    n = 4000
    g = np.where(rng.random(n) < 0.8, "hot", rng.choice(["a", "b"], n))
    # prices with .005 endings so rounding mode matters
    price = np.round(rng.uniform(1, 100, n), 2) + rng.choice([0.0, 0.005], n)
    qty = rng.integers(1, 50, n).astype("float64")
    t = pa.table(
        {
            "l_returnflag": pa.array(g),
            "l_extendedprice": pa.array(price),
            "l_quantity": pa.array(qty),
        }
    )
    con = duckdb.connect()
    con.register("lineitem", t)
    want = con.execute(
        "WITH w AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
        " CAST(l_quantity AS BIGINT) AS wt FROM lineitem), "
        "c AS (SELECT l_returnflag, v, sum(wt) AS wv FROM w GROUP BY 1, 2), "
        "cum AS (SELECT l_returnflag, v, "
        " sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
        " sum(wv) OVER (PARTITION BY l_returnflag) AS tot FROM c) "
        "SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian_scaled, "
        "CAST(min(tot) AS BIGINT) AS total_weight "
        "FROM cum WHERE 2 * cw >= tot GROUP BY l_returnflag ORDER BY l_returnflag"
    ).df()
    for parts in (1, 9):
        got = (
            weighted_median_per_group(
                rd.from_arrow(t).repartition(parts),
                key="l_returnflag",
                value="l_extendedprice",
                weight="l_quantity",
            )
            .to_pandas()
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        for c in ("wmedian_scaled", "total_weight"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_weighted_median_rejects_fractional_weight(ray_session):
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import weighted_median_per_group

    t = pa.table(
        {
            "k": pa.array(["a", "a"]),
            "v": pa.array([1.0, 2.0]),
            "w": pa.array([1.5, 2.0]),  # fractional weight must fail loudly
        }
    )
    with pytest.raises(Exception):
        weighted_median_per_group(
            rd.from_arrow(t), key="k", value="v", weight="w"
        ).take_all()


def test_conversion_latency_matches_duckdb(ray_session):
    """Last-view-before-purchase across bucket boundaries: hot user whose
    view/purchase chain spans many tiny buckets, purchases with NO prior
    view (unconverted), view and purchase tied on ts (event_id decides),
    block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import conversion_latency

    W = 1000  # 1 ms buckets -> constant boundary crossings
    rng = np.random.default_rng(41)
    labels = np.array(["view", "purchase", "click"])
    rows = []
    eid = 0
    # hot user: 4000 mixed events over a wide span
    for i in range(4000):
        rows.append((1, int(rng.integers(0, 500_000)), eid, labels[rng.integers(3)])); eid += 1
    # user 2: purchase BEFORE any view, then view, then purchase
    rows.append((2, 100, eid, "purchase")); eid += 1
    rows.append((2, 200, eid, "view")); eid += 1
    rows.append((2, 5_000_700, eid, "purchase")); eid += 1
    # user 3: view and purchase at the SAME ts — event_id order decides
    rows.append((3, 777, eid, "view")); eid += 1
    rows.append((3, 777, eid, "purchase")); eid += 1  # view first -> lat 0
    rows.append((4, 888, eid, "purchase")); eid += 1
    rows.append((4, 888, eid, "view")); eid += 1  # purchase first -> no view
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH s AS (SELECT user_id, ts, event_id, event_type, "
        " max(CASE WHEN event_type = 'view' THEN ts END) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id "
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv "
        " FROM events WHERE event_type IN ('view', 'purchase')), "
        "l AS (SELECT CASE WHEN lv IS NULL THEN -1 "
        " ELSE (epoch_us(ts) - epoch_us(lv)) // 1000000 END AS lat_s "
        " FROM s WHERE event_type = 'purchase') "
        "SELECT CAST(count(*) AS BIGINT) AS n_to, "
        "CAST(count(*) FILTER (lat_s >= 0) AS BIGINT) AS n_converted, "
        "CAST(quantile_disc(lat_s, 0.5) FILTER (lat_s >= 0) AS BIGINT) AS p50_lat_s, "
        "CAST(quantile_disc(lat_s, 0.9) FILTER (lat_s >= 0) AS BIGINT) AS p90_lat_s "
        "FROM l"
    ).df()
    for parts in (2, 13):
        got = (
            conversion_latency(rd.from_arrow(ev).repartition(parts), bucket_us=W)
            .to_pandas()
            .reset_index(drop=True)
        )
        for c in got.columns:
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_rate_change_matches_duckdb(ray_session):
    """Lag-over-non-empty-buckets semantics (gaps skip to the previous
    EXISTING bucket), single-bucket keys drop out, block-split
    invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import rate_change

    rng = np.random.default_rng(43)
    W = 1000
    rows = []
    # key a: buckets 0, 1, 5 (gap) with varying volume
    for b, cnt in ((0, 10), (1, 25), (5, 4)):
        for _ in range(cnt):
            rows.append(("a", b * W + int(rng.integers(W))))
    # key b: one bucket only -> no output rows
    for _ in range(7):
        rows.append(("b", 3 * W + int(rng.integers(W))))
    ev = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows]),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH c AS (SELECT event_type, "
        " CAST(epoch_us(ts) // 1000 AS BIGINT) AS bucket, "
        " CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "l AS (SELECT event_type, bucket, n, "
        " lag(n) OVER (PARTITION BY event_type ORDER BY bucket) AS prev_n FROM c) "
        "SELECT event_type, bucket, n, CAST(prev_n AS BIGINT) AS prev_n, "
        "CAST((1000 * n) // prev_n AS BIGINT) AS ratio_milli "
        "FROM l WHERE prev_n IS NOT NULL ORDER BY event_type, bucket"
    ).df()
    for parts in (1, 6):
        got = (
            rate_change(rd.from_arrow(ev).repartition(parts), bucket_us=W)
            .to_pandas()
            .sort_values(["event_type", "bucket"])
            .reset_index(drop=True)
        )
        for c in ("bucket", "n", "prev_n", "ratio_milli"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_longest_streak_matches_duckdb(ray_session):
    """Gaps-and-islands: multi-island keys, single-day keys, a hot key
    active every day, duplicate events within a day (distinct-day
    semantics), block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import longest_streak

    W = 1000
    rng = np.random.default_rng(47)
    rows = []
    # key 1: islands {0,1,2}, {5}, {8,9} -> longest 3, n_active 6
    for d in (0, 1, 2, 5, 8, 9):
        for _ in range(int(rng.integers(1, 4))):  # dup events same day
            rows.append((1, d * W + int(rng.integers(W))))
    # key 2: single day
    rows.append((2, 7 * W + 3))
    # key 3 (hot): every day 0..99, many events each
    for d in range(100):
        for _ in range(5):
            rows.append((3, d * W + int(rng.integers(W))))
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH d AS (SELECT DISTINCT user_id, "
        " CAST(epoch_us(ts) // 1000 AS BIGINT) AS day FROM events), "
        "i AS (SELECT user_id, day, day - dense_rank() OVER "
        " (PARTITION BY user_id ORDER BY day) AS island FROM d), "
        "s AS (SELECT user_id, island, count(*) AS run FROM i GROUP BY 1, 2) "
        "SELECT user_id, CAST(sum(run) AS BIGINT) AS n_active, "
        "CAST(max(run) AS BIGINT) AS longest_streak FROM s GROUP BY user_id "
        "ORDER BY user_id"
    ).df()
    for parts in (1, 8):
        got = (
            longest_streak(rd.from_arrow(ev).repartition(parts), bucket_us=W)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        for c in ("n_active", "longest_streak"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert want.loc[want.user_id == 3, "longest_streak"].iloc[0] == 100


def test_revenue_by_nation_matches_duckdb(ray_session):
    """Star-join rollup at sf0.001: exact integer revenue
    (price-cents x discount-percent products summed as int64)."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as mod

    sf = "/root/testdata/sf0.001"
    got = (
        mod.q_revenue_by_nation(sf)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    got["revenue_e4"] = got["revenue_e4"].astype("int64")
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(
        mod.oracle_sql()["revenue_by_nation"] + " ORDER BY n_name"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_profile_columns_matches_duckdb(ray_session):
    """DESCRIBE report: nulls, exact distinct, native-typed min/max
    (negative ints whose string form would mis-sort lexicographically,
    empty-string values vs null sentinels), block-split invariant, loud
    rejection of float columns."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.profile import profile_columns

    rng = np.random.default_rng(53)
    n = 5000
    ids = rng.integers(-1_000_000, 1_000_000, n)  # negatives: "-9" < "10" numeric, not lexicographic
    ids_arr = pa.array(
        [None if rng.random() < 0.05 else int(v) for v in ids], pa.int64()
    )
    labels = pa.array(
        [
            None if rng.random() < 0.1 else ("" if rng.random() < 0.1 else f"t{rng.integers(5)}")
            for _ in range(n)
        ],
        pa.string(),
    )
    t = pa.table({"k": ids_arr, "lab": labels, "f": pa.array(np.ones(n))})
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT 'k' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
        " CAST(count(*) - count(k) AS BIGINT) AS n_null, "
        " CAST(count(DISTINCT k) AS BIGINT) AS n_distinct, "
        " CAST(min(k) AS VARCHAR) AS min_str, CAST(max(k) AS VARCHAR) AS max_str FROM t "
        "UNION ALL SELECT 'lab', CAST(count(*) AS BIGINT), "
        " CAST(count(*) - count(lab) AS BIGINT), CAST(count(DISTINCT lab) AS BIGINT), "
        " min(lab), max(lab) FROM t ORDER BY col_name"
    ).df()
    for parts in (1, 7):
        got = (
            profile_columns(rd.from_arrow(t).repartition(parts), ["k", "lab"])
            .to_pandas()
            .sort_values("col_name")
            .reset_index(drop=True)
        )
        for c in ("n_rows", "n_null", "n_distinct"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)
    with pytest.raises(TypeError):
        profile_columns(rd.from_arrow(t), ["f"])


def test_rolling_distinct_matches_duckdb(ray_session):
    """Trailing-window distinct: gaps in the calendar (windows anchor
    only at ACTIVE buckets), users spanning multiple buckets counted
    once per window, hot user everywhere, block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import rolling_distinct

    W = 1000
    rng = np.random.default_rng(59)
    rows = []
    # sparse calendar: buckets 0,1,2, 10, 12, 13 active
    for d in (0, 1, 2, 10, 12, 13):
        for u in rng.integers(0, 40, 30):
            rows.append((int(u), d * W + int(rng.integers(W))))
    # hot user 999 active in every bucket
    for d in (0, 1, 2, 10, 12, 13):
        rows.append((999, d * W + 5))
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH p AS (SELECT DISTINCT user_id, "
        " CAST(epoch_us(ts) // 1000 AS BIGINT) AS d FROM events), "
        "days AS (SELECT DISTINCT d FROM p) "
        "SELECT days.d AS bucket, CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_distinct "
        "FROM days JOIN p ON p.d BETWEEN days.d - 2 AND days.d "
        "GROUP BY days.d ORDER BY days.d"
    ).df()
    for parts in (1, 6):
        got = (
            rolling_distinct(
                rd.from_arrow(ev).repartition(parts), bucket_us=W, window_buckets=3
            )
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        for c in ("bucket", "n_distinct"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_state_durations_matches_duckdb(ray_session):
    """lead()-window dwell attribution: hot key crossing many tiny
    buckets (boundary intervals dominate), same-ts ties ordered by
    event_id, zero-duration intervals counted, single-event keys
    contribute nothing, block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import state_durations

    W = 500
    rng = np.random.default_rng(61)
    labels = np.array(["a", "b", "c"])
    rows = []
    eid = 0
    for i in range(3000):  # hot user spans ~240 buckets
        rows.append((1, int(rng.integers(0, 120_000)), eid, labels[rng.integers(3)])); eid += 1
    for i in range(6):  # ties: same ts, order by event_id
        rows.append((2, 777, eid, labels[i % 3])); eid += 1
    rows.append((3, 9, eid, "a")); eid += 1  # single event: no interval
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH s AS (SELECT user_id, event_type, ts, lead(ts) OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS nts FROM events) "
        "SELECT event_type, "
        "CAST(sum(epoch_us(nts) - epoch_us(ts)) AS BIGINT) AS total_us, "
        "CAST(count(*) AS BIGINT) AS n_intervals "
        "FROM s WHERE nts IS NOT NULL GROUP BY event_type ORDER BY event_type"
    ).df()
    for parts in (2, 9):
        got = (
            state_durations(rd.from_arrow(ev).repartition(parts), bucket_us=W)
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        for c in ("total_us", "n_intervals"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert want["n_intervals"].sum() == 2999 + 5


def test_gap_quantiles_matches_duckdb(ray_session):
    """Inter-arrival quantiles: hot key across bucket boundaries,
    same-ts ties (zero gaps), block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import gap_quantiles

    W = 500
    rng = np.random.default_rng(67)
    labels = np.array(["a", "b"])
    rows = []
    eid = 0
    for i in range(2500):
        rows.append((1, int(rng.integers(0, 80_000)), eid, labels[rng.integers(2)])); eid += 1
    for u in range(2, 50):
        for i in range(int(rng.integers(2, 8))):
            rows.append((u, int(rng.integers(0, 80_000)), eid, labels[rng.integers(2)])); eid += 1
    for i in range(4):  # ties -> zero gaps
        rows.append((99, 555, eid, "a")); eid += 1
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH s AS (SELECT user_id, event_type, ts, lead(ts) OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS nts FROM events), "
        "g AS (SELECT event_type, (epoch_us(nts) - epoch_us(ts)) // 7 AS gap "
        " FROM s WHERE nts IS NOT NULL) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals, "
        "CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap, "
        "CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap "
        "FROM g GROUP BY event_type ORDER BY event_type"
    ).df()
    for parts in (2, 8):
        got = (
            gap_quantiles(
                rd.from_arrow(ev).repartition(parts), bucket_us=W, gap_unit_us=7
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        for c in ("n_intervals", "p50_gap", "p90_gap"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_final_session_ops_randomized_parity(ray_session, seed):
    """Randomized-input parity sweep for the three order-sensitive
    final-session operators (conversion latency, journey mining, gap
    quantiles): random event logs with duplicate timestamps and random
    bucket widths — every quantity must match DuckDB exactly."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import (
        conversion_latency,
        gap_quantiles,
        path_topk,
    )

    rng = np.random.default_rng(seed)
    n = 3000
    users = rng.integers(0, 50, n)
    ts = rng.integers(0, 50_000, n)  # dense -> many exact ties
    labels = np.array(["view", "purchase", "click"])[rng.integers(0, 3, n)]
    ev = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(rng.permutation(n).astype("int64")),
            "event_type": pa.array(labels),
        }
    )
    W = int(rng.integers(100, 5000))
    con = duckdb.connect()
    con.register("events", ev)
    ds = rd.from_arrow(ev).repartition(int(rng.integers(2, 10)))

    got = conversion_latency(ds, bucket_us=W).to_pandas()
    want = con.execute(
        "WITH s AS (SELECT user_id, ts, event_id, event_type, "
        " max(CASE WHEN event_type = 'view' THEN ts END) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id "
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv "
        " FROM events WHERE event_type IN ('view', 'purchase')), "
        "l AS (SELECT CASE WHEN lv IS NULL THEN -1 "
        " ELSE (epoch_us(ts) - epoch_us(lv)) // 1000000 END AS lat_s "
        " FROM s WHERE event_type = 'purchase') "
        "SELECT CAST(count(*) AS BIGINT) AS n_to, "
        "CAST(count(*) FILTER (lat_s >= 0) AS BIGINT) AS n_converted, "
        "CAST(quantile_disc(lat_s, 0.5) FILTER (lat_s >= 0) AS BIGINT) AS p50_lat_s, "
        "CAST(quantile_disc(lat_s, 0.9) FILTER (lat_s >= 0) AS BIGINT) AS p90_lat_s FROM l"
    ).df()
    for c in got.columns:
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_exact=True)

    k = int(rng.integers(3, 8))
    got = path_topk(ds, n_steps=k, k=15, num_buckets=16).to_pandas()
    want = con.execute(
        "WITH r AS (SELECT user_id, event_type, row_number() OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), "
        f"p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path "
        f" FROM r WHERE rn <= {k} GROUP BY user_id) "
        "SELECT path, CAST(count(*) AS BIGINT) AS n_keys FROM p GROUP BY path "
        "ORDER BY n_keys DESC, path LIMIT 15"
    ).df()
    got["n_keys"] = got["n_keys"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_exact=True)

    unit = int(rng.integers(3, 50))
    got = (
        gap_quantiles(ds, bucket_us=W, gap_unit_us=unit)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = con.execute(
        "WITH s AS (SELECT user_id, event_type, ts, lead(ts) OVER "
        " (PARTITION BY user_id ORDER BY ts, event_id) AS nts FROM events), "
        f"g AS (SELECT event_type, (epoch_us(nts) - epoch_us(ts)) // {unit} AS gap "
        " FROM s WHERE nts IS NOT NULL) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals, "
        "CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap, "
        "CAST(quantile_disc(gap, 0.9) AS BIGINT) AS p90_gap "
        "FROM g GROUP BY event_type ORDER BY event_type"
    ).df()
    for c in ("n_intervals", "p50_gap", "p90_gap"):
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_weighted_quantiles_matches_duckdb(ray_session):
    """Rational-q weighted quantiles (p25/p75): exact boundary behavior
    at den*cum == num*tot, skewed weights, block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.quantiles import weighted_quantiles_per_group

    rng = np.random.default_rng(71)
    n = 3000
    g = rng.choice(["x", "y"], n)
    price = np.round(rng.uniform(1, 50, n), 2)
    qty = rng.integers(1, 20, n).astype("float64")
    # force an exact den*cum == num*tot boundary: one group with weights 1,1,1,1
    g = np.concatenate((g, ["z"] * 4))
    price = np.concatenate((price, [1.0, 2.0, 3.0, 4.0]))
    qty = np.concatenate((qty, [1.0, 1.0, 1.0, 1.0]))
    t = pa.table(
        {
            "l_returnflag": pa.array(g),
            "l_extendedprice": pa.array(price),
            "l_quantity": pa.array(qty),
        }
    )
    con = duckdb.connect()
    con.register("lineitem", t)
    want = con.execute(
        "WITH w AS (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
        " CAST(l_quantity AS BIGINT) AS wt FROM lineitem), "
        "c AS (SELECT l_returnflag, v, sum(wt) AS wv FROM w GROUP BY 1, 2), "
        "cum AS (SELECT l_returnflag, v, "
        " sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
        " sum(wv) OVER (PARTITION BY l_returnflag) AS tot FROM c) "
        "SELECT l_returnflag, CAST(min(tot) AS BIGINT) AS total_weight, "
        "CAST(min(CASE WHEN 4 * cw >= tot THEN v END) AS BIGINT) AS p25_cents, "
        "CAST(min(CASE WHEN 4 * cw >= 3 * tot THEN v END) AS BIGINT) AS p75_cents "
        "FROM cum GROUP BY l_returnflag ORDER BY l_returnflag"
    ).df()
    for parts in (1, 8):
        got = (
            weighted_quantiles_per_group(
                rd.from_arrow(t).repartition(parts),
                {"p25_cents": (1, 4), "p75_cents": (3, 4)},
                key="l_returnflag",
                value="l_extendedprice",
                weight="l_quantity",
            )
            .to_pandas()
            .sort_values("l_returnflag")
            .reset_index(drop=True)[["l_returnflag", "total_weight", "p25_cents", "p75_cents"]]
        )
        for c in ("total_weight", "p25_cents", "p75_cents"):
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)
    # boundary: group z weights 1,1,1,1 -> p25 = value 1 (4*1 >= 4)
    assert want.loc[want.l_returnflag == "z", "p25_cents"].iloc[0] == 100


def test_activity_summary_matches_duckdb(ray_session):
    """Lifetime report: hot key, single-event keys, integer-exact
    events-per-active-day, block-split invariant."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.windows import activity_summary

    W = 1000
    rng = np.random.default_rng(73)
    rows = [(1, d * W + int(rng.integers(W))) for d in range(50) for _ in range(7)]
    rows += [(2, 3 * W + 1)]
    rows += [(u, int(rng.integers(0, 20 * W))) for u in range(3, 80) for _ in range(int(rng.integers(1, 9)))]
    ev = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = con.execute(
        "WITH p AS (SELECT user_id, CAST(epoch_us(ts) // 1000 AS BIGINT) AS d FROM events), "
        "s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        " CAST(count(DISTINCT d) AS BIGINT) AS n_active, "
        " min(d) AS first_bucket, max(d) AS last_bucket FROM p GROUP BY user_id) "
        "SELECT user_id, n_events, n_active, first_bucket, last_bucket, "
        "CAST((1000 * n_events) // n_active AS BIGINT) AS events_per_active_milli "
        "FROM s ORDER BY user_id"
    ).df()
    for parts in (1, 9):
        got = (
            activity_summary(rd.from_arrow(ev).repartition(parts), bucket_us=W)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        for c in want.columns[1:]:
            got[c] = got[c].astype("int64")
        pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_asof_tolerance_matches_duckdb(ray_session):
    """tolerance_us: matches farther than the window become NULL while
    match SELECTION is unchanged (a nearer-but-out-of-window match is
    NOT replaced by an older in-window one... there is none older);
    boundary distance == tolerance stays matched; forward direction."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from parquetjs_ray.functions.joins import asof_join

    left = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "t": pa.array([100, 150, 300, 50], pa.timestamp("us")),
            "lid": pa.array([10, 11, 12, 13], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "t": pa.array([90, 140, 500], pa.timestamp("us")),
            "rid": pa.array([70, 71, 72], pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    # backward, tolerance 10us: lid10 (t100, match t90 dist10 -> keep),
    # lid11 (t150, match t140 dist10 -> keep), lid12 (t300, match t140
    # dist160 -> NULL), lid13 (t50, no match -> NULL)
    got = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", left_on="t", right_on="t",
            left_cols=["lid"], right_cols=["rid"],
            tiebreak="rid", tolerance_us=10,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = con.execute(
        "WITH m AS (SELECT l.lid, l.k, epoch_us(l.t) AS t_us, "
        "(SELECT epoch_us(r.t) FROM r WHERE r.k = l.k AND r.t <= l.t "
        " ORDER BY r.t DESC, r.rid DESC LIMIT 1) AS mt, "
        "(SELECT r.rid FROM r WHERE r.k = l.k AND r.t <= l.t "
        " ORDER BY r.t DESC, r.rid DESC LIMIT 1) AS rid FROM l) "
        "SELECT lid, k, t_us, CASE WHEN mt IS NOT NULL AND t_us - mt <= 10 "
        "THEN rid END AS rid FROM m ORDER BY lid"
    ).df()
    got = got.rename(columns={"t_us": "t_us"})[["lid", "k", "t_us", "rid"]]
    pd.testing.assert_frame_equal(
        got.astype({"lid": "int64", "k": "int64", "t_us": "int64"}),
        want.astype({"lid": "int64", "k": "int64", "t_us": "int64"}),
        check_exact=True,
    )
    assert got["rid"].isna().tolist() == [False, False, True, True]
    # forward: lid13 (k=2, t50 -> r t500 dist450): kept at tolerance 450
    # (boundary == tolerance), voided at 449; lid12 (k=1, t300) has no
    # forward match at all either way
    for tol, matched in ((450, True), (449, False)):
        got_f = (
            asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                by="k", left_on="t", right_on="t",
                left_cols=["lid"], right_cols=["rid"],
                tiebreak="rid", direction="forward", tolerance_us=tol,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert got_f.loc[got_f.lid == 13, "rid"].notna().iloc[0] == matched
        assert got_f.loc[got_f.lid == 12, "rid"].isna().iloc[0]
    with pytest.raises(ValueError):
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", left_on="t", right_on="t",
            left_cols=["lid"], right_cols=["rid"], tolerance_us=-1,
        )


def test_orphan_audit_and_join_cardinality_with_planted_orphans(ray_session, tmp_path):
    """Planted referential violations + skewed key multiplicities: the
    audit counts exactly the orphan rows and the cardinality estimator
    equals the true join size."""
    import duckdb

    import __ray_entry__ as mod

    rng = np.random.default_rng(79)
    # orders: keys 0..99; lineitem: 1-6 lines per key, plus 37 orphan rows
    ok = np.arange(100, dtype=np.int64)
    li_keys = np.repeat(ok, rng.integers(1, 7, 100))
    li_keys = np.concatenate((li_keys, np.full(37, 10_000, np.int64)))
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"l_orderkey": li_keys,
                  "l_quantity": np.ones(len(li_keys))}), str(tmp_path / "lineitem.parquet")
    )
    pq.write_table(
        pa.table({"o_orderkey": ok, "o_custkey": ok % 13}), str(tmp_path / "orders.parquet")
    )
    pq.write_table(
        pa.table({"c_custkey": np.arange(10, dtype=np.int64)}),  # custkeys 10..12 orphaned
        str(tmp_path / "customer.parquet"),
    )
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    got = (
        mod.q_orphan_audit(str(tmp_path))
        .to_pandas()
        .sort_values("relation")
        .reset_index(drop=True)
    )
    want = con.execute(
        mod.oracle_sql()["orphan_audit"] + " ORDER BY relation"
    ).df()
    import pandas as pd

    for c in ("n_rows", "n_orphans"):
        got[c] = got[c].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert got.loc[got.relation == "lineitem->orders", "n_orphans"].iloc[0] == 37

    gotc = mod.q_join_cardinality(str(tmp_path)).to_pandas()
    wantc = con.execute(mod.oracle_sql()["join_cardinality"]).df()
    assert int(gotc["join_rows"].iloc[0]) == int(wantc["join_rows"].iloc[0])
    assert int(gotc["matched_keys"].iloc[0]) == 100


def test_top_with_ties_boundary(ray_session, tmp_path):
    """WITH TIES semantics: counts engineered so a tie straddles the
    k=20 boundary — the rank() <= 20 oracle and the threshold filter
    must agree and return MORE than 20 rows."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as mod

    # 5 words x 10 occurrences, 30 words x 3 occurrences (ties straddle
    # position 20), 40 words x 1
    words = (
        [f"hi{i}" for i in range(5) for _ in range(10)]
        + [f"mid{i}" for i in range(30) for _ in range(3)]
        + [f"lo{i}" for i in range(40)]
    )
    rng = np.random.default_rng(83)
    rng.shuffle(words)
    texts = [" ".join(words[i::7]) for i in range(7)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(7), pa.int64()), "text": pa.array(texts),
                  "lang": pa.array(["en"] * 7), "source": pa.array(["s"] * 7),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(tmp_path / "documents.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    got = (
        mod.q_top_words_with_ties(str(tmp_path))
        .to_pandas()
        .sort_values(["word"])
        .reset_index(drop=True)
    )
    got["n"] = got["n"].astype("int64")
    want = con.execute(
        mod.oracle_sql()["top_words_with_ties"] + " ORDER BY word"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    assert len(got) == 35  # 5 hi + all 30 tied mids survive


def test_table_changes_demo_counts(ray_session):
    """The CDC demo query is deterministic: 5 updates emit 5 deletes +
    5 inserts, 3 pure inserts add 3 more -> (delete, 5), (insert, 8);
    rerunning converges to the same feed (idempotent rebuild)."""
    import __ray_entry__ as mod

    for _ in range(2):
        rows = {
            r["_change_type"]: r["n_rows"]
            for r in mod.q_table_changes_demo("/root/testdata/sf0.001").take_all()
        }
        assert rows == {"delete": 5, "insert": 8}, rows


# ───────────────────── TPC-H-shape queries (session 6) ─────────────────────


def _tpch_synth(tmp_path, seed=101, n_orders=120, n_cust=40):
    """Synthetic TPC-H-ish star with planted boundary cases: shipdates
    exactly AT the Q1/Q6 cutoffs, discounts exactly at the 0.05/0.07
    band edges, quantity exactly 24 (Q6 excludes it), customers outside
    the segment, orders with zero lineitems, and revenue ties."""
    import datetime as dt

    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    ok = np.arange(n_orders, dtype=np.int64)
    ck = np.arange(n_cust, dtype=np.int64)
    seg = np.where(ck % 3 == 0, "BUILDING", "MACHINERY")
    pq.write_table(
        pa.table(
            {
                "c_custkey": ck,
                "c_mktsegment": pa.array(seg.tolist()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    base = dt.datetime(1998, 1, 1)
    odate = [base + dt.timedelta(days=int(d)) for d in rng.integers(-400, 200, n_orders)]
    # order 0..2 planted exactly AT the Q3 cutoff (excluded: < is strict)
    for i in range(3):
        odate[i] = dt.datetime(1998, 3, 15)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": ok,
                "o_custkey": pa.array((ok % n_cust).astype("int64")),
                "o_orderstatus": pa.array(["F" if i % 2 else "O" for i in ok]),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(10, 400000, n_orders), 2)
                ),
                "o_orderdate": pa.array(odate, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    # ~4 lines per order, but orders 0..9 get none (semi-join must drop
    # them) — keys drawn from 10..n_orders
    nli = 4 * (n_orders - 10)
    lok = np.repeat(np.arange(10, n_orders, dtype=np.int64), 4)
    disc = rng.choice([0.0, 0.04, 0.05, 0.06, 0.07, 0.08, 0.1], nli)
    qty = rng.integers(1, 51, nli).astype("float64")
    qty[:5] = 24.0  # Q6 band edge: quantity exactly 24 is EXCLUDED
    sdate = [base + dt.timedelta(days=int(d)) for d in rng.integers(-300, 400, nli)]
    sdate[0] = dt.datetime(1998, 9, 2)  # Q1 cutoff: <= keeps it
    sdate[1] = dt.datetime(1998, 1, 1)  # Q6 lower edge: >= keeps it
    sdate[2] = dt.datetime(1999, 1, 1)  # Q6 upper edge: < drops it
    sdate[3] = dt.datetime(1998, 3, 15)  # Q3 edge: > drops it
    price = np.round(rng.uniform(900, 105000, nli), 2)
    price[:8] = 1000.005  # round-half boundary: e2 must be 100001 both sides
    pq.write_table(
        pa.table(
            {
                "l_orderkey": lok,
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(price),
                "l_discount": pa.array(disc),
                "l_tax": pa.array(rng.choice([0.0, 0.02, 0.08], nli)),
                "l_returnflag": pa.array(
                    rng.choice(["R", "A", "N"], nli).tolist()
                ),
                "l_linestatus": pa.array(rng.choice(["O", "F"], nli).tolist()),
                "l_shipdate": pa.array(sdate, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def _oracle_con(tmp_path, tables=("customer", "orders", "lineitem")):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con


def _assert_query_matches(mod, name, fn, tmp_path, order_by):
    import pandas as pd

    con = _oracle_con(tmp_path)
    got = fn(str(tmp_path)).to_pandas()
    got = got.sort_values(order_by).reset_index(drop=True)[sorted(got.columns)]
    want = con.execute(mod.oracle_sql()[name]).df()
    want = want.sort_values(order_by).reset_index(drop=True)[sorted(want.columns)]
    for c in want.columns:
        if str(want[c].dtype).startswith(("int", "datetime")):
            got[c] = got[c].astype(want[c].dtype)
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    return got


def test_pricing_summary_boundary_dates_and_rounding(ray_session, tmp_path):
    import __ray_entry__ as mod

    _tpch_synth(tmp_path)
    got = _assert_query_matches(
        mod,
        "pricing_summary_lineitem",
        mod.q_pricing_summary_lineitem,
        tmp_path,
        ["l_returnflag", "l_linestatus"],
    )
    assert len(got) == 6  # 3 flags x 2 statuses all present


def test_shipping_priority_top10_deterministic(ray_session, tmp_path):
    import __ray_entry__ as mod

    _tpch_synth(tmp_path)
    got = _assert_query_matches(
        mod, "shipping_priority", mod.q_shipping_priority, tmp_path,
        ["revenue_e4", "l_orderkey"],
    )
    assert len(got) <= 10
    # rerun: byte-stable (deterministic top-k tiebreak on orderkey)
    again = mod.q_shipping_priority(str(tmp_path)).to_pandas()
    assert sorted(again["l_orderkey"]) == sorted(got["l_orderkey"])


def test_forecast_revenue_band_edges(ray_session, tmp_path):
    import __ray_entry__ as mod

    _tpch_synth(tmp_path)
    got = _assert_query_matches(
        mod, "forecast_revenue", mod.q_forecast_revenue, tmp_path, ["revenue_e4"]
    )
    assert len(got) == 1 and int(got["revenue_e4"].iloc[0]) > 0


def test_orders_any_returned_bucketed_bloom_path(ray_session, tmp_path):
    """Orders 0..9 have NO lineitems and must not survive the forced
    bucketed+bloom semi-join; counts match the IN-subquery oracle."""
    import __ray_entry__ as mod

    _tpch_synth(tmp_path)
    got = _assert_query_matches(
        mod, "orders_any_returned", mod.q_orders_any_returned, tmp_path,
        ["o_orderstatus"],
    )
    con = _oracle_con(tmp_path)
    n_surv = con.execute(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem WHERE l_returnflag='R'"
    ).fetchone()[0]
    assert int(got["n_orders"].sum()) == n_surv
