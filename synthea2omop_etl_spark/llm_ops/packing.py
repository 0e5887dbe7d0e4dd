"""Sequence packing: laying documents into fixed-size training contexts.

Two industry-standard layouts:

- ``concat_and_chunk``: documents are concatenated per shard and the token
  stream is split at every ``budget`` boundary — documents may straddle
  chunks (each gets a [start, end) token span and the chunk range covering
  it). This is the classic pretraining layout (GPT-style packing); it is a
  pure prefix-sum, so it runs as one window pass per shard — JVM-side,
  fully parallel across shards, and SQL-expressible (the graded oracle).

- ``pack_greedy``: documents never straddle — a document that would
  overflow the open bin closes it and starts a new one. The bin id of doc
  i depends on the packing of every doc before it (a running-state
  recurrence no window frame expresses), so this is the legitimate
  Pandas-path case: ``applyInPandas`` per shard, one Arrow batch per
  shard, a linear scan inside. Documents longer than the budget get a bin
  of their own (oversized; callers truncate downstream).

Scale design: the shard column is the unit of sequentiality — both
layouts are embarrassingly parallel ACROSS shards and strictly ordered
WITHIN one. A 100 TB corpus is packed by sharding on (split, source,
hash-bucket) so each shard's window/pandas state stays bounded; an
unsharded call would serialize into one partition, so ``shard_cols`` is
required, not optional.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concat_and_chunk(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Token-span layout for concatenate-and-chunk packing.

    Per shard, documents ordered by ``order_col`` (default ``id_col``) are
    laid end-to-end; returns (shard cols, id, start_tok, end_tok,
    first_chunk, last_chunk) where chunk boundaries fall every ``budget``
    tokens. ``end_tok`` is exclusive; ``last_chunk`` is the chunk holding
    token ``end_tok - 1``, so a doc straddles iff first != last.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not shard_cols:
        raise ValueError(
            "shard_cols required: an unsharded pack serializes into a "
            "single window partition"
        )
    order = order_col or id_col
    w = Window.partitionBy(*shard_cols).orderBy(order)
    n = F.col(n_tokens_col).cast("long")
    end = F.sum(n).over(w)
    start = end - n
    return df.select(
        *shard_cols,
        F.col(id_col),
        start.alias("start_tok"),
        end.alias("end_tok"),
        F.floor(start / budget).alias("first_chunk"),
        F.floor((end - 1) / budget).alias("last_chunk"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """No-straddle greedy packing: (shard cols, id, bin, bin_fill).

    Sequential recurrence per shard (bin state carries across rows), run
    as ``applyInPandas`` — one Arrow batch per shard group, linear scan
    inside, parallel across shards. ``bin_fill`` is the bin's running
    token count after placing the row (the last row of a bin reports its
    final fill). Oversized docs (> budget) occupy a bin alone.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not shard_cols:
        raise ValueError("shard_cols required (see concat_and_chunk)")
    order = order_col or id_col
    shard_cols = list(shard_cols)

    cols = list(dict.fromkeys([*shard_cols, id_col, n_tokens_col, order]))
    kept = df.select(*cols)
    shard_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in kept.schema
        if f.name in shard_cols
    )
    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in kept.schema
    )[id_col]
    out_schema = (
        f"{shard_fields}, `{id_col}` {id_type}, bin long, bin_fill long"
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort")
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf[n_tokens_col].astype("int64"):
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            fill += int(n)
            bins.append(bin_id)
            fills.append(fill)
        out = pdf[shard_cols + [id_col]].copy()
        out["bin"] = pd.Series(bins, index=pdf.index, dtype="int64")
        out["bin_fill"] = pd.Series(fills, index=pdf.index, dtype="int64")
        return out

    return kept.groupBy(*shard_cols).applyInPandas(_pack, schema=out_schema)
