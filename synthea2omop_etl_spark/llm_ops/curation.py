"""Dataset-curation operators for training-data pipelines: deterministic
splits, token-window chunking, PII scrubbing.

All three are pure column expressions (JVM-side, no Python), and all
hashing is md5-derived (hashing.py) so every operator carries an exact
DuckDB oracle.

Scale notes:
- ``split_assign`` is stateless per-row — no shuffle, no RNG state, and
  membership is stable under reprocessing/backfill (the property that makes
  hash-splits the standard over random splits for 100 TB corpora).
- ``chunk_tokens`` fans one doc into ~len/stride rows map-side; the token
  array is let-bound (dedup.bind_once) so the tokenizing split runs once
  per row, not once per chunk (see bind_once on CollapseProject
  re-inlining).
- ``pii_scrub`` is regexp_replace chains — whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.hashing import duck_h64, h64
from synthea2omop_etl_spark.llm_ops.text import tokens

#: (name, cumulative-percent) — train/val/test 80/10/10.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 80),
    ("val", 90),
    ("test", 100),
)


def split_assign(
    key: Column | str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> Column:
    """Deterministic dataset split from a stable key: bucket = h64(key) mod
    100, assigned to the first split whose cumulative percent exceeds it."""
    bucket = h64(key) % 100
    expr = None
    for name, cum in splits[:-1]:
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    return expr.otherwise(last) if expr is not None else F.lit(last)


def duck_split_assign(
    key_expr: str, splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS
) -> str:
    """DuckDB SQL computing exactly ``split_assign``."""
    bucket = f"({duck_h64(key_expr)} % 100)"
    whens = " ".join(
        f"WHEN {bucket} < {cum} THEN '{name}'" for name, cum in splits[:-1]
    )
    return f"CASE {whens} ELSE '{splits[-1][0]}' END"


def chunk_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Overlapping token-window chunks — the standard context-length prep
    for training corpora. Output: (id, chunk_idx, chunk_text, n_tokens);
    docs shorter than the window yield one truncated chunk, empty docs
    yield none. Chunk count per doc: ceil((len - window)/stride) + 1.
    """
    from synthea2omop_etl_spark.llm_ops.dedup import bind_once

    def chunk_structs(tk):
        # Everything derives from the let-bound token array ``tk`` —
        # evaluated once per row (bind_once), not once per chunk as the
        # aliased-projection form did after CollapseProject inlining.
        n = F.greatest(
            F.lit(1),
            (F.ceil((F.size(tk) - window) / F.lit(float(stride))) + 1).cast(
                "int"
            ),
        )
        per_chunk = lambda i: F.struct(  # noqa: E731
            F.array_join(F.slice(tk, i * stride + 1, window), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(window), F.size(tk) - i * stride)
            .cast("int")
            .alias("n_tokens"),
        )
        return F.when(F.size(tk) <= 0, F.array().cast(
            "array<struct<chunk_text:string,n_tokens:int>>"
        )).otherwise(F.transform(F.sequence(F.lit(0), n - 1), per_chunk))

    return (
        df.select(
            F.col(id_col).alias("doc"),
            F.posexplode(
                bind_once(tokens(F.col(text_col)), chunk_structs)
            ).alias("chunk_idx", "c"),
        )
        .select(
            "doc",
            "chunk_idx",
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic corpus-mixing downsample: keep each doc with its
    source's target rate, decided by a stable hash of the doc id — the
    "data mixture" step of a training pipeline (e.g. keep 100% of books,
    30% of web crawl).

    Stateless per-row, no shuffle, no RNG state; membership is stable
    under reprocessing/backfill exactly like split_assign. Rates are
    compared against h64(id) mod 10000, so the realized rate converges to
    the target with the usual hash-uniformity guarantees.
    """
    bucket = h64(F.col(id_col).cast("string")) % 10000
    rate = None
    for src, r in rates.items():
        cond = F.col(source_col) == src
        # round, not int(): int(0.3*10000) truncates to 2999 and biases
        # every binary-inexact rate one bucket low
        thresh = F.lit(round(r * 10000))
        rate = (
            F.when(cond, thresh) if rate is None else rate.when(cond, thresh)
        )
    rate = (
        rate.otherwise(F.lit(round(default_rate * 10000)))
        if rate is not None
        else F.lit(round(default_rate * 10000))
    )
    return df.where(bucket < rate)


def duck_mixture_filter(
    source_expr: str,
    id_expr: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> str:
    """DuckDB WHERE-clause mirroring ``mixture_sample`` exactly."""
    bucket = f"({duck_h64(f'CAST({id_expr} AS VARCHAR)')} % 10000)"
    whens = " ".join(
        f"WHEN {source_expr} = '{src}' THEN {round(r * 10000)}"
        for src, r in rates.items()
    )
    return f"{bucket} < (CASE {whens} ELSE {round(default_rate * 10000)} END)"


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
LONG_NUM_RE = r"[0-9]{6,}"


def pii_scrub(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Redact emails and long digit runs; report per-doc redaction counts
    and the scrubbed-text digest (so tests/oracles compare content without
    hauling full text around). Patterns use RE2-safe syntax (no
    backreferences) so Spark (Java regex) and DuckDB (RE2) agree."""
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        LONG_NUM_RE,
        "<NUM>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col(text_col), F.lit(LONG_NUM_RE)).alias("n_longnums"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


def shuffle_positions(
    df: DataFrame, id_col: str, seed: str = "s0"
) -> DataFrame:
    """Deterministic global shuffle order for training-data delivery.

    Pretraining consumes the corpus in a shuffled order; at 100 TB that
    order must be (a) reproducible from a seed, (b) computed without a
    single-task global sort. Position = global rank of the seeded hash
    h64(id || '#' || seed): repartitionByRange on the hash gives each
    partition a contiguous hash interval, and the two-pass rank
    (operators/idmap.py:assign_global_rank) turns that into an exact
    1-based shuffle position — one range exchange, no bottleneck task.
    A different seed is a completely different permutation; the same
    seed replays bit-identically (epoch reshuffles = seed per epoch).

    Output: (id_col, shuffle_pos). Write the corpus sorted by
    shuffle_pos (repartitionByRange + sortWithinPartitions on it) for
    sequential-read delivery.
    """
    from synthea2omop_etl_spark.llm_ops.hashing import h64
    from synthea2omop_etl_spark.operators.idmap import assign_global_rank

    keyed = df.select(
        F.col(id_col),
        h64(F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))).alias(
            "__h"
        ),
    )
    return assign_global_rank(
        keyed, ["__h", id_col], rank_col="shuffle_pos"
    ).select(id_col, "shuffle_pos")


def budgeted_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget corpus mixture: take each source's documents in
    deterministic id order until that source's TOKEN budget is spent.

    ``corpus_mixture`` mixes by document fractions; real pretraining
    mixtures are specified in tokens ("30B code, 10B papers, ..."), so
    the cut must run on a per-source running token sum. One window per
    source partition (ROWS UNBOUNDED PRECEDING prefix sum — partitioned,
    never global), then a codegen'd filter: a doc survives while the
    cumulative count THROUGH it fits the budget. Sources absent from
    ``budgets`` are excluded (budget 0). Integer arithmetic end-to-end —
    bit-identical across engines by construction.

    Output: (id_col, source_col, n_tokens, cum_tokens) for survivors.
    """
    from pyspark.sql.window import Window

    from synthea2omop_etl_spark.llm_ops.text import token_count

    budget_expr = F.lit(0)
    for src, b in sorted(budgets.items()):
        budget_expr = F.when(
            F.col(source_col) == src, F.lit(int(b))
        ).otherwise(budget_expr)
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).alias("n_tokens"),
        budget_expr.alias("__budget"),
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= F.col("__budget"))
        .drop("__budget")
    )


def leakage_safe_split(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
):
    """Train/val/test assignment that near-duplicates can NEVER straddle.

    Hash-splitting on the document id leaks: two near-duplicate documents
    hash independently, so one lands in train and its twin in test — the
    classic eval-contamination path a per-doc split can't see. Here the
    split key is the near-dup CLUSTER's canonical id (MinHash/LSH pairs →
    connected components), so every member of a cluster shares a split by
    construction; singletons key on their own id, preserving the plain
    hash-split distribution for the (vast) non-duplicated majority.

    Output: input columns + ``split_group`` (the canonical id) +
    ``split``. Plan shape: the LSH candidate join over signatures, the
    O(diameter) component rounds over the (tiny relative to the corpus)
    pair graph, then ONE left join back. The cluster map is NOT
    force-broadcast: it is sized by docs-with-a-near-dup, which on a
    heavily-duplicated 100 TB corpus can be billions of rows — a forced
    broadcast would OOM instead of degrading. AQE picks broadcast when
    the map is actually small (the common case) and falls back to a
    shuffled join when it isn't; the corpus itself is never shuffled
    beyond the signature build either way.
    """
    from synthea2omop_etl_spark.llm_ops.cluster import dedup_clusters
    from synthea2omop_etl_spark.llm_ops.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(
        docs, text_col, id_col,
        num_hashes=num_hashes, bands=bands,
        jaccard_threshold=jaccard_threshold, shingle_n=shingle_n,
    )
    clusters = dedup_clusters(pairs)  # (doc, canonical_id) — paired docs only
    joined = docs.join(
        clusters, docs[id_col] == clusters["doc"], "left"
    ).drop("doc")
    canonical = F.coalesce(F.col("canonical_id"), F.col(id_col))
    return joined.select(
        *[F.col(c) for c in docs.columns],
        canonical.alias("split_group"),
        split_assign(canonical.cast("string"), splits).alias("split"),
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str],
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows per
    group, inclusion probability proportional to weight (Efraimidis-
    Spirakis A-Res, Inf.Proc.Lett. 2006): key = u^(1/w) with u uniform
    in (0,1], keep the k largest keys.

    Replaces the nondeterministic ``rand()`` with the engine's md5/mod-P
    uniform (u = (hmod(id|salt)+1)/P), so the sample is reproducible
    across runs AND engines — the same contract as ``dataset_shuffle``.
    Keys are rounded to 12dp before ranking (pow may differ in the last
    ulp across engines); ties break on id. Rows with weight <= 0 are
    dropped (they have zero inclusion probability by definition).

    ``group_cols`` must be non-empty: selection is a rank-k window per
    group (one keyed shuffle, skew bounded by group size). A global
    sample would be a single-partition sort at 100 TB — callers wanting
    one sample over everything add a constant column and accept that, or
    use per-shard sampling + a driver-side merge of k·shards candidates.

    Output: group_cols + (id, weight, sample_rank), sample_rank 1..k by
    descending key.
    """
    if not group_cols:
        raise ValueError(
            "weighted_sample requires group_cols — a global rank-k would "
            "single-partition sort at scale; add a constant group or "
            "sample per shard and merge the k*shards candidates"
        )
    from pyspark.sql import Window

    from synthea2omop_etl_spark.llm_ops.hashing import P, hmod

    u = (
        hmod(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}")))
        + F.lit(1)
    ) / F.lit(float(P))
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__skey").desc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col) > 0)
        .select(*group_cols, id_col, weight_col, key.alias("__skey"))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .drop("__skey")
    )


def duck_weighted_sample(
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str],
    salt: str = "ws",
) -> str:
    """DuckDB twin of :func:`weighted_sample` (same key, same rounding,
    same tie-break)."""
    from synthea2omop_etl_spark.llm_ops.hashing import P, duck_hmod

    hashed = duck_hmod(f"CAST({id_col} AS VARCHAR) || '|{salt}'")
    u = f"(({hashed} + 1) / {float(P)!r})"
    g = ", ".join(group_cols)
    return f"""
    SELECT {g}, {id_col}, {weight_col}, sample_rank FROM (
      SELECT {g}, {id_col}, {weight_col},
             ROW_NUMBER() OVER (
               PARTITION BY {g}
               ORDER BY ROUND(pow({u}, 1.0 / {weight_col}), 12) DESC,
                        {id_col} ASC) AS sample_rank
      FROM {table} WHERE {weight_col} > 0)
    WHERE sample_rank <= {k}
    """


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """Cross-corpus boilerplate removal (the RefinedWeb/CCNet line-level
    dedup): a LINE that appears in ``min_docs`` or more DISTINCT documents
    is boilerplate (navigation chrome, cookie banners, license footers)
    and is removed from EVERY document; order of the surviving lines is
    preserved. The intra-document twin is
    :func:`synthea2omop_etl_spark.llm_ops.text.dedup_paragraphs`.

    Output: ``id_col`` + ``out_col`` (documents whose every line was
    boilerplate keep a row with the empty string — the caller's length
    gate drops them, same as the quality pipeline).

    Plan shape (holds at 100 TB): posexplode lines → ONE map-side-
    combinable countDistinct per line → the (small, filtered) frequent
    set anti-joins the exploded lines — AQE picks broadcast when it fits,
    a shuffled anti when a pathological corpus makes it huge — → ONE
    groupBy per doc re-assembles via sort_array over (pos, line) structs.
    Two keyed shuffles total, both over line-sized rows; nothing is ever
    collected to the driver.
    """
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    lines = spread_if_narrow(df, id_col).select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.col(text_col), sep)).alias(
            "__pos", "__line"
        ),
    )
    frequent = (
        lines.where(F.trim("__line") != "")
        .groupBy("__line")
        .agg(F.countDistinct("__doc").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__line")
    )
    kept = lines.join(frequent, "__line", "left_anti")
    rebuilt = kept.groupBy("__doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line"))
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias(out_col)
    )
    return (
        df.select(F.col(id_col))
        .join(rebuilt, df[id_col] == rebuilt["__doc"], "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        )
    )


def temperature_mixture_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
    token_budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture weights — the published multi-source
    sampling rule (mT5 §3.1 / XLM-R: sample source s with probability
    ∝ (n_s/N)^α, α<1 upweighting low-resource sources). Completes the
    mixing family: ``mixture_sample`` applies given per-source
    fractions, ``budgeted_mixture`` fills given token budgets — this
    op COMPUTES the weights those consume.

    Output per source: ``(source, n_docs, n_tokens, raw_share,
    weight, target_tokens)`` — raw_share = n_tokens/N and weight =
    share^α / Σ share^α, both floor-half-up 4dp; ``target_tokens`` =
    floor(weight × token_budget) when a budget is given (NULL
    otherwise). Rows ordered by source for determinism.

    Scale: ONE map-side-combinable aggregate over the corpus (the
    token count), then all math happens on the n_sources-row frame
    with the total attached as a broadcast 1-row aggregate.
    """
    from synthea2omop_etl_spark.llm_ops.text import _round4, token_count

    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").alias("__N"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias(
            "__Z"
        ),
    )
    # weight = n^α / Σ n^α — algebraically equal to share^α / Σ share^α
    # (the N^α factor cancels) but with ONE pow per source instead of a
    # divide-then-pow, so both engines run the identical IEEE sequence.
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__Z")
    out = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        _round4(F.col("n_tokens") / F.col("__N")).alias("raw_share"),
        _round4(w).alias("weight"),
        (
            F.floor(w * F.lit(token_budget)).cast("long")
            if token_budget is not None
            else F.lit(None).cast("long")
        ).alias("target_tokens"),
    )
    return out.orderBy("source")


def temperature_budgeted_mixture(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    token_budget: int = 1_000_000_000,
) -> DataFrame:
    """Temperature weights → per-source token budgets → document
    selection, composed end-to-end (r11 — r10 computed the weights and
    filled budgets as separate ops; nothing drove one from the other).

    The α-allocation (``temperature_mixture_weights``: target_s =
    floor(n_s^α / Σ n^α × budget)) becomes each source's token budget,
    and documents are taken in deterministic id order until the
    cumulative token count THROUGH the next doc would exceed it — the
    same prefix-sum cut as ``budgeted_mixture``, but with the budget
    JOINED from the weights frame (broadcast, n_sources rows) instead
    of a driver-side literal CASE: no collect, the composition is one
    lazy plan. The output feeds ``deliver_corpus`` directly.

    Output: (id_col, source_col, n_tokens, cum_tokens, target_tokens)
    for selected docs. Integer cut arithmetic — only the per-source
    target computation touches floats, with the same one-pow-per-source
    IEEE sequence as the weights op, so the composition hash-grades.
    """
    from pyspark.sql.window import Window

    from synthea2omop_etl_spark.llm_ops.text import token_count

    targets = temperature_mixture_weights(
        docs, source_col, text_col, alpha, token_budget
    ).select("source", "target_tokens")
    w = (
        Window.partitionBy(source_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        F.col(id_col),
        F.col(source_col),
        token_count(text_col).alias("n_tokens"),
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .join(
            F.broadcast(targets.withColumnRenamed("source", source_col)),
            source_col,
        )
        .where(F.col("cum_tokens") <= F.col("target_tokens"))
    )
