"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the 100 TB story):

- **exact**: hash-groupBy on md5(text) — one shuffle on a 32-byte key, fully
  parallel, AQE handles skew from giant duplicate clusters.
- **minhash_lsh**: signatures are computed per-row with array lambda
  expressions (no shuffle, no Python); candidate generation shuffles on
  (band_id, band_hash) — the classic band-bucket join — so cost scales with
  the number of colliding docs, never n².
- **simhash**: per-row signature; near-dup = equal signature buckets (or
  small Hamming distance via rotations).
- **ngram_jaccard**: exact verification, bucketed by a blocking key to bound
  the pair count; used standalone on small buckets or as the verify stage
  after LSH.
- **embedding cosine**: blocked pairwise; the ANN module (similarity.py) is
  the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.hashing import (
    P,
    h64,
    hmod,
    minhash_params,
    perm,
    poly2,
)
from synthea2omop_etl_spark.llm_ops.text import tokens


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Cluster by md5(text): (text_hash, n_docs, canonical_id=min id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (empty if < n tokens)."""
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per permutation i, min over mod-P shingle hashes
    of ``(a_i * s + b_i) mod P`` (universal hashing, hashing.py).

    Pure expression tree (array_min over transform) — evaluated row-local;
    integer multiply-add per element, zero shuffle. Reproducible in DuckDB
    (the oracle embeds the same (a_i, b_i) constants).
    """
    def min_over(a: int, b: int) -> Column:
        return F.array_min(F.transform(shingles, lambda s: perm(s, a, b)))

    return F.array(*[min_over(a, b) for a, b in minhash_params(num_hashes)])


def _hashed_shingles(col: Column) -> Column:
    """Shingle strings → mod-P int64 hashes, computed once.

    All downstream MinHash permutations and the Jaccard verify then operate
    on longs — integer arithmetic and equality are far cheaper than repeated
    string hashing/comparison, and collisions (~2⁻³¹ per pair) are
    negligible for set-overlap estimation at realistic shingle-set sizes.
    """
    return F.transform(col, lambda s: hmod(s))


def token_hashes(col: Column | str) -> Column:
    """Tokens → mod-P int64 hashes (one md5 per token)."""
    return F.transform(tokens(col), lambda t: hmod(t))


def shingle_hashes_from(toks_h: Column, n: int = 3) -> Column:
    """Combine n consecutive token hashes into shingle hashes with a
    polynomial rolling hash mod P.

    CAUTION (measured 6× at sf0.1): this references ``toks_h`` ~n+2 times
    (slices + sizes), and a projection inlines every reference — so
    ``toks_h`` MUST be an already-materialized column (compute it with
    token_hashes in a SEPARATE select), never the raw transform expression.
    Also: an element_at(toks_h, i) formulation is O(len²) per row —
    slice+zip_with keeps it linear.
    """
    k = F.size(toks_h) - F.lit(n - 1)
    out = F.slice(toks_h, 1, k)
    for j in range(1, n):
        out = F.zip_with(out, F.slice(toks_h, j + 1, k), poly2)
    return F.when(k <= 0, F.array().cast("array<long>")).otherwise(out)


def word_shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """n-gram shingles directly as mod-P int64 hashes (array<long>).

    Single-expression convenience form: fine for tests/small inputs, but
    hot paths should use token_hashes + shingle_hashes_from across TWO
    projections — this form re-evaluates the per-token md5 transform once
    per reference (see shingle_hashes_from's caution).
    """
    return shingle_hashes_from(token_hashes(col), n)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.7,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified by exact shingle Jaccard.

    signature → split into ``bands`` bands of r=num_hashes/bands rows →
    bucket-join on (band_idx, poly-digest(band)) → distinct candidate pairs →
    exact Jaccard verify ≥ threshold.

    Output: (id_a, id_b, jaccard) with id_a < id_b. LSH affects recall only;
    every emitted pair is exactly verified. Defaults r=2, b=8: candidate
    probability 1-(1-j²)⁸ ≈ 0.90 at j=0.5, ≈ 1.0 at j≥0.7 — and half the
    hashing cost of the classic 32-hash setup.

    The signature/shingle stage is cached: it feeds both sides of the
    band self-join and the verify stage (4 consumers; recomputing the
    shingling dominates otherwise). At 100 TB persist it to parquet
    instead — same DAG shape.
    """
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands

    # The hashing map-work is CPU-bound: if the source arrived in fewer
    # partitions than cores (one big parquet file locally; a handful of
    # giant files at scale), spread it before hashing — the text shuffle is
    # tiny next to the per-token md5 work it parallelizes.
    narrow = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__text"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < max(2, par // 2):
        narrow = narrow.repartition(par, "doc")
    # Two projections on purpose: token_hashes materializes once, then the
    # shingle combine references the materialized array — fusing them into
    # one select re-evaluates the md5 transform per reference (6× slower).
    toks = narrow.select(
        "doc",
        token_hashes(F.col("__text")).alias("__th"),
    )
    base = (
        toks.select(
            "doc", shingle_hashes_from(F.col("__th"), shingle_n).alias("sh")
        )
        .where(F.size("sh") > 0)
        .cache()
    )
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    def band_digest(b: int) -> Column:
        out = F.col("sig")[b * r]
        for j in range(1, r):
            out = poly2(out, F.col("sig")[b * r + j])
        return out

    band_entries = sig.select(
        "doc",
        F.posexplode(
            F.array(*[band_digest(b) for b in range(bands)])
        ).alias("band_idx", "band_hash"),
    )

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )

    sh = base.select(
        F.col("doc"), F.array_distinct("sh").alias("shd")
    )
    verified = (
        cands.join(sh.withColumnsRenamed({"doc": "id_a", "shd": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"doc": "id_b", "shd": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """SimHash over word tokens: sign of per-bit vote sums of h64(token)
    (md5-derived, hashing.py — bit-for-bit reproducible in DuckDB).

    Implemented as an exploded token→bit-vote aggregation (shuffles once on
    the doc id — at 100 TB this is a map-side-combinable sum, cheap).
    Output: (id, simhash) where equal simhash ⇒ near-duplicate bucket.
    """
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", h64("t"))
    votes = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = votes.select(
        "doc",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
                for i in range(bits)
            ],
            start=F.lit(0),
        ).cast("long").alias("simhash"),
    )
    return sig


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    blocking_cols: list[str],
    threshold: float = 0.9,
    n: int = 1,
) -> DataFrame:
    """Exact token/shingle-set Jaccard over pairs within blocking buckets.

    Pair count is bounded by the largest bucket squared — callers pick
    blocking keys (language, source, length band, or an LSH band) so buckets
    stay small at scale.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    # Hashed shingle sets: intersect/union over int64 is ~3× cheaper than
    # over strings in interpreted HOF/array expressions; Jaccard over hashed
    # sets equals Jaccard over the sets themselves (collisions ~2⁻³¹ pair).
    if n == 1:
        base = df.select(
            F.col(id_col).alias("doc"),
            *blocking_cols,
            F.array_distinct(_hashed_shingles(tokens(F.col(text_col)))).alias(
                "toks"
            ),
        )
    else:
        # two projections — see minhash_lsh_candidates
        base = df.select(
            F.col(id_col).alias("doc"),
            *blocking_cols,
            token_hashes(F.col(text_col)).alias("__th"),
        ).select(
            "doc",
            *blocking_cols,
            F.array_distinct(shingle_hashes_from(F.col("__th"), n)).alias(
                "toks"
            ),
        )
    base = base.where(F.size("toks") > 0)
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.doc") < F.col("b.doc")
    for c in blocking_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.toks", "b.toks"))
                / F.size(F.array_union("a.toks", "b.toks")),
                4,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def _cosine(va: Column, vb: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (na * nb)


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    blocking_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine(vec_a, vec_b) ≥ threshold, optionally blocked.

    Math in double (cast up from float) for cross-engine reproducibility.
    Exact pairwise within blocks; use similarity.srp_bucketed_topk as the
    approximate scale path.
    """
    base = df.select(
        F.col(id_col).alias("doc"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *( [F.col(blocking_col).alias("blk")] if blocking_col else [] ),
    )
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.doc") < F.col("b.doc")
    if blocking_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 4).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
