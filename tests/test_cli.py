"""End-to-end CLI surface test: every subcommand drives a real Ray
session in its own subprocess (the CLI owns its session — the library
never calls ray.init), chained into one table-lifecycle narrative:
encode → info → upsert → history → delete → changes → restore →
verify → vacuum."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str) -> dict | list:
    p = subprocess.run(
        [sys.executable, "-m", "parquetjs_ray", *args],
        capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert p.returncode == 0, (args, p.stderr[-2000:])
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cli_table_lifecycle(tmp_path):
    from parquetjs_ray.sources.synth import generate_shard

    indir = tmp_path / "in"
    indir.mkdir()
    t = generate_shard(0, 400)
    pq.write_table(t, str(indir / "s0.parquet"))
    up = t.slice(0, 3).set_column(
        t.schema.get_field_index("source"), "source", pa.array(["patched"] * 3)
    )
    pq.write_table(up, str(tmp_path / "up.parquet"))
    art = str(tmp_path / "art")

    rep = run_cli("encode", str(indir), art, "--target-rows", "100", "--profile", "balanced")
    assert rep["rows"] == 400 and rep["ratio"] < 0.5

    info = run_cli("info", art)
    assert info["row_count"] == 400 and info["mode"] == "files"

    rep = run_cli("upsert", art, str(tmp_path / "up.parquet"))
    assert rep["rows_updated"] == 3 and rep["rows_inserted"] == 0

    hist = run_cli("history", art)
    assert [h["version"] for h in hist] == list(range(1, len(hist) + 1))
    assert hist[-1]["rows"] == 400

    rep = run_cli("delete", art, "--where", '[["source", "==", "patched"]]')
    assert rep["rows_deleted"] == 3

    # v1 → latest: the 3 originals were replaced (v2) and the
    # replacements deleted (v3) → net feed is 3 deletes of the originals
    feed_dir = str(tmp_path / "feed")
    run_cli("changes", art, "1", feed_dir)
    feed = pq.read_table(feed_dir)
    assert feed.num_rows == 3
    assert set(feed["_change_type"].to_pylist()) == {"delete"}

    rep = run_cli("restore", art, "1")
    assert rep["rows"] == 400

    v = run_cli("verify", str(indir), art)
    assert v["equal"] is True

    rep = run_cli("vacuum", art)
    assert rep["snapshots_kept"]

    opt = str(tmp_path / "opt")
    rep = run_cli("optimize", art, opt, "--by", "n_tok", "--target-rows", "100")
    assert rep["rows"] == 400
    v = run_cli("verify", str(indir), opt)
    assert v["equal"] is True  # reclustered artifact holds the same rows

    stats = run_cli("stats", art)
    assert set(stats) == {"doc_id", "tokens", "n_tok", "source"}
    assert stats["source"]["ratio"] < 0.05  # dict-encoded low-cardinality column
    assert sum(stats["tokens"]["codecs"].values()) > 0


def test_cli_shards_roundtrip(tmp_path):
    """corpus -> packed training shards via the CLI, then decode and
    check the shard stream covers every window exactly once."""
    import numpy as np

    rng = np.random.default_rng(13)
    words = ["w%d" % i for i in range(30)]
    texts = [" ".join(rng.choice(words, size=int(k)).tolist()) for k in rng.integers(2, 40, size=200)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts),
            "source": pa.array(["s%d" % (i % 2) for i in range(200)]),
        }
    )
    indir = tmp_path / "docs"
    indir.mkdir()
    pq.write_table(t, str(indir / "d.parquet"))
    art = str(tmp_path / "shards")
    rep = run_cli("shards", str(indir), art, "--capacity", "256", "--vocab-size", "25",
                  "--target-rows", "32")
    n_tokens_in = sum(len(x.split(" ")) for x in texts)
    assert rep["n_tokens"] == n_tokens_in  # packing preserves every token
    dest = str(tmp_path / "decoded")
    run_cli("decode", art, dest)
    back = pq.read_table(dest)
    assert back.num_rows == rep["rows"]
    sid = back["shard_id"].to_pylist()
    assert len(set(sid)) == len(sid)  # one row per (source, window)
    toks = back["tokens"].combine_chunks()
    assert int(len(toks.values)) == n_tokens_in
    lens = np.diff(np.asarray(toks.offsets))
    win_of = np.array([int(s.split("/")[1]) for s in sid])
    # every non-final window of a source holds >= capacity tokens minus
    # the straddling doc rule's remainder; the total per source matches
    for src in ("s0", "s1"):
        m = np.array([s.split("/")[0] == src for s in sid])
        want = sum(len(texts[i].split(" ")) for i in range(200) if i % 2 == int(src[1]))
        assert int(lens[m].sum()) == want
        assert sorted(win_of[m].tolist()) == list(range(int(m.sum())))  # contiguous windows
