"""Training-loader surface: stream fixed-token-budget batches from an
encoded artifact.

The consume side of the corpus→shards flow: a trainer wants "give me
successive batches of ≤ B tokens" without ever materializing the
corpus. :func:`iter_token_batches` drives ``decode_dataset(...)`` —
projection/predicate pushdown, zone/Bloom pruning and the streaming
executor's backpressure all apply — and re-chunks the decoded stream by
cumulative token count with one vectorized ``searchsorted`` per Arrow
batch. Memory high-water mark is one decoded block plus one carry
slice; nothing corpus-sized exists anywhere.

Deterministic: Ray Data's ``iter_batches`` yields blocks in dataset
order, and decode units are listed in manifest order, so the same
artifact + arguments produce the same batch boundaries run after run —
a preempted trainer can skip ``n`` batches and resume byte-identically.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

__all__ = ["iter_token_batches"]


def iter_token_batches(
    out_dir: str,
    batch_tokens: int,
    *,
    tokens_col: str = "tokens",
    columns: list[str] | None = None,
    where: list[tuple] | None = None,
    version: int | None = None,
) -> Iterator[pa.Table]:
    """Yield ``pa.Table`` batches whose total ``tokens_col`` element
    count is ≤ ``batch_tokens`` (greedy in stream order; a single row
    longer than the budget is yielded alone rather than split, so every
    row appears exactly once). ``columns``/``where``/``version`` pass
    through to :func:`~parquetjs_ray.pipelines.encode.decode_dataset`
    — prune at the read, not after."""
    from .encode import decode_dataset

    if batch_tokens <= 0:
        raise ValueError("batch_tokens must be positive")
    if columns is not None and tokens_col not in columns:
        columns = list(columns) + [tokens_col]

    # Ray's streaming executor reorders completed blocks by default
    # (preserve_order=False); deterministic batch boundaries need the
    # manifest order. Pin it on THIS dataset's captured DataContext only
    # (each Dataset deep-copies the context at creation) — the
    # process-global context is never touched, so concurrent Ray Data
    # jobs and abandoned iterators see no side effect.
    ds = decode_dataset(out_dir, columns=columns, where=where, version=version)
    ds.context.execution_options.preserve_order = True

    carry: pa.Table | None = None
    filled = 0  # tokens already in `carry`

    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = pa.Table.from_batches([batch]) if isinstance(batch, pa.RecordBatch) else batch
        while t.num_rows:
            toks = t[tokens_col].combine_chunks()
            lens = np.diff(np.asarray(toks.offsets).astype(np.int64))
            cum = filled + np.cumsum(lens)
            n_fit = int(np.searchsorted(cum, batch_tokens, side="right"))
            if n_fit == 0:
                # nothing fits: flush the carry, then the oversized head
                if carry is not None:
                    yield carry
                    carry, filled = None, 0
                    continue  # retry the same rows against an empty budget
                yield t.slice(0, 1)  # single row longer than the budget
                t = t.slice(1)
                continue
            head = t.slice(0, n_fit)
            carry = head if carry is None else pa.concat_tables([carry, head])
            filled = int(cum[n_fit - 1])
            t = t.slice(n_fit)
            if t.num_rows:  # budget hit inside this block: emit and reset
                yield carry
                carry, filled = None, 0
    if carry is not None and carry.num_rows:
        yield carry
