"""Distributed graph analytics over edge-list Datasets.

Triangle counting via the standard degree-ordered wedge-check (the
MapReduce formulation of Suri & Vassilvitskii's "Counting Triangles and
the Curse of the Last Reducer", WWW'11 — public knowledge): orient every
edge from the lower-(degree, id) endpoint to the higher, generate wedges
only from out-neighbor lists (bounded by ~sqrt(2m) under this
orientation), and close them against the oriented edge set. Every
exchange is edge- or wedge-sized; the input corpus is touched once to
build the edge list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _distinct_edges(
    edges: rd.Dataset, u_col: str, v_col: str, *, min_count: int = 1
) -> rd.Dataset:
    """Canonical distinct undirected edge set ``(__lo, __hi)`` from a raw
    edge list (duplicates/both orientations collapse, self-loops drop,
    multiplicity < ``min_count`` filtered), MATERIALIZED for reuse."""
    from ray.data.aggregate import Sum

    def canon(b: pa.Table) -> pa.Table:
        u = b[u_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        v = b[v_col].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        keep = lo != hi
        t = pa.table(
            {
                "__lo": pa.array(lo[keep]),
                "__hi": pa.array(hi[keep]),
                "__c": pa.array(np.ones(int(keep.sum()), np.int64)),
            }
        )
        # combiner: one row per edge per batch before the shuffle
        g = t.group_by(["__lo", "__hi"]).aggregate([("__c", "sum")])
        return g.rename_columns(["__lo", "__hi", "__c"])

    eset = edges.map_batches(canon, batch_format="pyarrow").groupby(
        ["__lo", "__hi"]
    ).aggregate(Sum("__c", alias_name="__w"))
    if min_count > 1:
        import pyarrow.compute as pc

        def thresh(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b["__w"], pa.scalar(min_count)))

        eset = eset.map_batches(thresh, batch_format="pyarrow")
    return eset.select_columns(["__lo", "__hi"]).materialize()


def triangle_count(
    edges: rd.Dataset,
    u_col: str,
    v_col: str,
    *,
    min_count: int = 1,
    num_buckets: int = 64,
    max_out_degree: int = 65536,
) -> pa.Table:
    """Exact triangle count of the undirected graph given as an edge
    list (duplicates and both orientations welcome; self-loops dropped).
    ``min_count`` keeps only edges whose multiplicity in the input is at
    least that (strong ties). Returns ONE row:
    ``(n_nodes, n_edges, n_triangles)``.

    Plan (each exchange bounded by edges/wedges, never the corpus):

    1. canonicalize ``(lo, hi)`` + per-batch count combiner → one
       ``groupby(lo, hi)`` Sum → the distinct weighted edge set,
       MATERIALIZED once and reused by three consumers;
    2. endpoint unpivot + combiner → ``groupby(node)`` Sum = degrees;
       a Ray task folds them into the (degree, id)-order rank map —
       broadcast once (bounded by #nodes, same contract as the ANN
       centroid/lookup broadcasts; asserts #nodes < 2^31 so a ranked
       edge packs into ONE int64 ``src<<31|dst``);
    3. orient each edge low-rank → high-rank, pack; ``groupby(src)``
       cogroups out-neighbor lists (≤ ~sqrt(2m) long under degree
       orientation; ``max_out_degree`` raises loudly past the cap) and
       emits wedge candidates vectorized via one ``np.triu_indices``
       template per list length;
    4. candidates and oriented edges cogroup by ``hash(packed) %
       num_buckets``; each bucket counts membership with one sorted
       ``np.isin`` — per-bucket partial sums are the only rows that
       reach the driver.
    """
    import ray
    from ray.data.aggregate import Sum

    eset = _distinct_edges(edges, u_col, v_col, min_count=min_count)
    n_edges = eset.count()
    if n_edges == 0:
        return pa.table(
            {
                "n_nodes": pa.array([0], pa.int64()),
                "n_edges": pa.array([0], pa.int64()),
                "n_triangles": pa.array([0], pa.int64()),
            }
        )

    def endpoints(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["__lo"].combine_chunks().to_numpy(zero_copy_only=False),
                b["__hi"].combine_chunks().to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"__n": pa.array(uniq), "__d": pa.array(cnt.astype(np.int64))})

    deg = eset.map_batches(endpoints, batch_format="pyarrow").groupby("__n").aggregate(
        Sum("__d", alias_name="__deg")
    )

    @ray.remote(num_cpus=1)
    def _rank_map(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        full = pa.concat_tables(tabs)
        nodes = full["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        degs = full["__deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(nodes) >= 1 << 31:
            raise ValueError("triangle_count supports < 2^31 distinct nodes")
        order = np.lexsort((nodes, degs))  # total order: (degree, id)
        rank = np.empty(len(nodes), np.int64)
        rank[order] = np.arange(len(nodes), dtype=np.int64)
        by_id = np.argsort(nodes)
        return nodes[by_id], rank[by_id]  # lookup arrays

    rank_ref = _rank_map.remote(list(deg.to_arrow_refs()))

    def _ranks(ref, xs: np.ndarray) -> np.ndarray:
        nodes_by_id, rank_by_id = ray.get(ref)
        return rank_by_id[np.searchsorted(nodes_by_id, xs)]

    def orient(b: pa.Table) -> pa.Table:
        lo = b["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = b["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
        rl, rh = _ranks(rank_ref, lo), _ranks(rank_ref, hi)
        src, dst = np.minimum(rl, rh), np.maximum(rl, rh)
        return pa.table(
            {"__src": pa.array(src), "__e": pa.array((src << 31) | dst)}
        )

    oriented = eset.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pa.Table) -> pa.Table:
        e = g["__e"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = np.sort(e & ((1 << 31) - 1))
        k = len(dst)
        if k > max_out_degree:
            raise ValueError(
                f"out-degree {k} exceeds max_out_degree={max_out_degree}"
            )
        if k < 2:
            return pa.table({"__e": pa.array([], pa.int64())})
        ti, tj = np.triu_indices(k, 1)
        return pa.table({"__e": pa.array((dst[ti] << 31) | dst[tj])})

    cand = oriented.groupby("__src").map_groups(wedges, batch_format="pyarrow")

    MIX = np.int64(-7046029254386353131)

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            e = b["__e"].combine_chunks().to_numpy(zero_copy_only=False)
            bucket = np.abs((e * MIX) % np.int64(num_buckets))
            return pa.table(
                {
                    "__mb": pa.array(bucket),
                    "__e": pa.array(e),
                    "__side": pa.array(np.full(len(e), side, np.int8)),
                }
            )

        return f

    tagged = oriented.select_columns(["__e"]).map_batches(
        tag(0), batch_format="pyarrow"
    ).union(cand.map_batches(tag(1), batch_format="pyarrow"))

    def close(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        e = g["__e"].combine_chunks().to_numpy(zero_copy_only=False)
        matched = int(np.isin(e[side == 1], e[side == 0]).sum())
        return pa.table({"__tri": pa.array([matched], pa.int64())})

    partials = tagged.groupby("__mb").map_groups(close, batch_format="pyarrow")
    n_tri = int(partials.sum("__tri") or 0)
    nodes_by_id, _ = ray.get(rank_ref)
    return pa.table(
        {
            "n_nodes": pa.array([len(nodes_by_id)], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


def pagerank_topk(
    edges: rd.Dataset,
    u_col: str,
    v_col: str,
    *,
    k: int = 20,
    iterations: int = 4,
    min_count: int = 1,
    scale: int = 10**12,
    max_degree: int = 65536,
) -> pa.Table:
    """Top-k nodes by EXACT fixed-point PageRank (damping 0.85) on the
    undirected graph given as an edge list — iterative distributed graph
    analytics with the repo's exact-integer discipline: scores live in
    ``scale`` units and every step is integer arithmetic
    (``s₀ = scale//n``; ``s_{t+1}(v) = (15·scale)//(100·n) +
    (85·Σ_{u∼v} s_t(u)//deg(u)) // 100``), so the result is
    deterministic, order-independent, and an unrolled SQL HUGEINT oracle
    reproduces it bit for bit — no float sum-order anywhere.

    Plan: the distinct edge set (one exchange) is doubled to directed
    form and MATERIALIZED once; each iteration is one edge-sized
    contribution shuffle (per-batch ``groupby(dst)`` combiner → global
    Sum) folded into the node-score vector by a Ray task and re-broadcast
    (node-vector bound, the documented broadcast contract shared with
    the rank/centroid lookups). ``max_degree`` (default 2^16) guards the
    int64 headroom of the incoming sum: ``85·deg·scale < 2^63`` —
    louder-than-overflow, like every bound in this package.

    Output: ``(node, score)`` — score the exact integer as a decimal
    string (the SQL side sums in HUGEINT) — top-k by (score desc, node).
    """
    import ray
    from ray.data.aggregate import Sum

    eset = _distinct_edges(edges, u_col, v_col, min_count=min_count)

    def double(b: pa.Table) -> pa.Table:
        lo = b["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = b["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__u": pa.array(np.concatenate([lo, hi])),
                "__v": pa.array(np.concatenate([hi, lo])),
            }
        )

    directed = eset.map_batches(double, batch_format="pyarrow").materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        u = b["__u"].combine_chunks().to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table({"__n": pa.array(uniq), "__d": pa.array(cnt.astype(np.int64))})

    deg = directed.map_batches(deg_partial, batch_format="pyarrow").groupby(
        "__n"
    ).aggregate(Sum("__d", alias_name="__deg"))

    @ray.remote(num_cpus=1)
    def _deg_map(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return np.array([], np.int64), np.array([], np.int64)
        full = pa.concat_tables(tabs)
        nodes = full["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        degs = full["__deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(nodes)
        nodes, degs = nodes[order], degs[order]
        if len(degs) and 85 * int(degs.max()) * scale >= 1 << 63:
            raise ValueError(
                f"max degree {degs.max()} exceeds the int64-safe bound at scale={scale}"
            )
        return nodes, degs

    # the degree/rank vectors stay in the object store: tasks read them
    # by ref (ray.put once per object, never closure-shipped per task)
    deg_map_ref = _deg_map.remote(list(deg.to_arrow_refs()))
    nodes_by_id, deg_by_id = ray.get(deg_map_ref)
    n = len(nodes_by_id)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "score": pa.array([], pa.string())}
        )
    base = (15 * scale) // (100 * n)
    scores = np.full(n, scale // n, np.int64)

    for _ in range(iterations):
        score_ref = ray.put(scores)

        def contrib(b: pa.Table, _sref=score_ref, _dref=deg_map_ref) -> pa.Table:
            s = ray.get(_sref)
            nodes, degs = ray.get(_dref)
            u = b["__u"].combine_chunks().to_numpy(zero_copy_only=False)
            v = b["__v"].combine_chunks().to_numpy(zero_copy_only=False)
            ui = np.searchsorted(nodes, u)
            c = s[ui] // degs[ui]
            t = pa.table({"__v": pa.array(v), "__c": pa.array(c)})
            g = t.group_by("__v").aggregate([("__c", "sum")])
            return g.rename_columns(["__v", "__c"])

        inc = directed.map_batches(contrib, batch_format="pyarrow").groupby(
            "__v"
        ).aggregate(Sum("__c", alias_name="__inc"))

        # each key lands in exactly ONE aggregated block, so applying
        # (85·x)//100 per fold row is per-node-TOTAL (floor of a sum
        # would differ from summed floors otherwise)
        @ray.remote(num_cpus=1)
        def _fold(block_refs: list, _dref=deg_map_ref, _base=base):
            nodes, _ = ray.get(_dref)
            new = np.full(len(nodes), _base, np.int64)
            for r in block_refs:
                t = ray.get(r)
                if not t.num_rows:
                    continue
                v = t["__v"].to_numpy(zero_copy_only=False).astype(np.int64)
                c = t["__inc"].to_numpy(zero_copy_only=False).astype(np.int64)
                vi = np.searchsorted(nodes, v)
                new[vi] += (85 * c) // 100
            return new

        scores = ray.get(_fold.remote(list(inc.to_arrow_refs())))

    top = np.lexsort((nodes_by_id, -scores))[:k]
    return pa.table(
        {
            "node": pa.array(nodes_by_id[top]),
            "score": pa.array([str(int(s)) for s in scores[top]], pa.string()),
        }
    )


def k_core(
    edges: rd.Dataset,
    u_col: str,
    v_col: str,
    *,
    k: int,
    min_count: int = 1,
    max_rounds: int = 1000,
) -> pa.Table:
    """The k-core of the undirected graph (maximal subgraph where every
    node keeps degree ≥ k): distributed iterative peeling — each round
    one edge-sized filter pass against the broadcast live-node set + one
    endpoint-count shuffle; nodes under k drop, repeat to fixpoint. The
    peeled edge set is re-MATERIALIZED each round so later rounds scan
    only surviving edges (the peeling sequence is monotone). Rounds =
    peeling depth (data-dependent; ``max_rounds`` raises loudly rather
    than run unbounded — a path graph peels O(n) rounds at k=2).

    No SQL oracle exists (an unbounded fixpoint is not expressible as a
    fixed query); the pytest referee is a pure-Python peeler. Output:
    ``(node, core_deg)`` for k-core members, core_deg their degree
    INSIDE the core — deterministic regardless of partitioning.
    """
    import ray
    from ray.data.aggregate import Sum

    cur = _distinct_edges(edges, u_col, v_col, min_count=min_count)

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["__lo"].combine_chunks().to_numpy(zero_copy_only=False),
                b["__hi"].combine_chunks().to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(nodes, return_counts=True)
        return pa.table({"__n": pa.array(uniq), "__d": pa.array(cnt.astype(np.int64))})

    @ray.remote(num_cpus=1)
    def _survivors(block_refs: list):
        tabs = [t for t in (ray.get(r) for r in block_refs) if t.num_rows]
        if not tabs:
            return np.array([], np.int64), np.array([], np.int64), True
        full = pa.concat_tables(tabs)
        nodes = full["__n"].to_numpy(zero_copy_only=False).astype(np.int64)
        degs = full["__d"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = degs >= k
        order = np.argsort(nodes[keep])
        return nodes[keep][order], degs[keep][order], bool(keep.all())

    for _ in range(max_rounds):
        deg = cur.map_batches(deg_partial, batch_format="pyarrow").groupby(
            "__n"
        ).aggregate(Sum("__d", alias_name="__d"))
        live_nodes, live_degs, done = ray.get(
            _survivors.remote(list(deg.to_arrow_refs()))
        )
        if done or len(live_nodes) == 0:
            return pa.table(
                {
                    "node": pa.array(live_nodes),
                    "core_deg": pa.array(live_degs),
                }
            )
        live_ref = ray.put(live_nodes)

        def peel(b: pa.Table, _ref=live_ref) -> pa.Table:
            live = ray.get(_ref)
            lo = b["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
            hi = b["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
            il = np.searchsorted(live, lo)
            ih = np.searchsorted(live, hi)
            ok = (
                (il < len(live)) & (ih < len(live))
                & (live[np.minimum(il, max(len(live) - 1, 0))] == lo)
                & (live[np.minimum(ih, max(len(live) - 1, 0))] == hi)
            )
            return b.filter(pa.array(ok))

        cur = cur.map_batches(peel, batch_format="pyarrow").materialize()
    raise ValueError(f"k_core did not converge within max_rounds={max_rounds}")


def bfs_hops(
    edges: rd.Dataset,
    u_col: str,
    v_col: str,
    *,
    seed: int | None = None,
    max_hops: int = 6,
    min_count: int = 1,
) -> pa.Table:
    """Exact BFS hop distances from ``seed`` (default: the smallest node
    id in the graph) over the undirected edge list, out to ``max_hops``
    — distributed frontier expansion: each round filters the doubled
    edge set against the broadcast frontier (one edge-sized pass + one
    distinct-candidate exchange) and stops early when the frontier
    empties. Distances are integers, so the result is deterministic and
    an UNROLLED cumulative-reach-set SQL oracle reproduces it exactly.

    Output: ``(node, hops)`` for every node reached within ``max_hops``
    (the seed itself at 0), regardless of partitioning.
    """
    import ray
    from ray.data.aggregate import Count

    eset = _distinct_edges(edges, u_col, v_col, min_count=min_count)

    def double(b: pa.Table) -> pa.Table:
        lo = b["__lo"].combine_chunks().to_numpy(zero_copy_only=False)
        hi = b["__hi"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__u": pa.array(np.concatenate([lo, hi])),
                "__v": pa.array(np.concatenate([hi, lo])),
            }
        )

    directed = eset.map_batches(double, batch_format="pyarrow").materialize()
    if directed.count() == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
        )
    if seed is None:
        seed = int(directed.min("__u"))

    reached = {int(seed): 0}
    frontier = np.array([seed], np.int64)
    for hop in range(1, max_hops + 1):
        f_ref = ray.put(np.sort(frontier))

        def expand(b: pa.Table, _ref=f_ref) -> pa.Table:
            f = ray.get(_ref)
            u = b["__u"].combine_chunks().to_numpy(zero_copy_only=False)
            i = np.searchsorted(f, u)
            ok = (i < len(f)) & (f[np.minimum(i, max(len(f) - 1, 0))] == u)
            v = b["__v"].combine_chunks().to_numpy(zero_copy_only=False)[ok]
            return pa.table({"__v": pa.array(np.unique(v))})

        cand = directed.map_batches(expand, batch_format="pyarrow").groupby(
            "__v"
        ).aggregate(Count(alias_name="__c"))

        @ray.remote(num_cpus=1)
        def _new_nodes(block_refs: list):
            out = []
            for r in block_refs:
                t = ray.get(r)
                if t.num_rows:
                    out.append(
                        t["__v"].to_numpy(zero_copy_only=False).astype(np.int64)
                    )
            return np.concatenate(out) if out else np.array([], np.int64)

        vs = ray.get(_new_nodes.remote(list(cand.to_arrow_refs())))
        frontier = np.array([v for v in vs.tolist() if v not in reached], np.int64)
        for v in frontier.tolist():
            reached[v] = hop
        if not len(frontier):
            break

    nodes = np.array(sorted(reached), np.int64)
    return pa.table(
        {
            "node": pa.array(nodes),
            "hops": pa.array([reached[int(x)] for x in nodes], pa.int64()),
        }
    )
