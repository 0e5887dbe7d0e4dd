"""Greedy coverage-based data selection — pick the k documents that
jointly cover the most vocabulary.

The classic submodular-maximization recipe for training-data selection
(facility-location/max-coverage: each new document is scored by the
NOVEL tokens it adds given everything already selected; the greedy
choice is within (1-1/e) of optimal — Nemhauser et al. 1978). Used to
build small high-coverage corpora, dedupe-aware eval sets, and seed
mixtures.

Spark-first shape: k driver-paced rounds (greedy is inherently
sequential — each score depends on the previous pick), each round ONE
aggregation over the remaining (doc, token) rows:
- the exploded token table is computed once and localCheckpoint-ed;
- per round, tokens already covered are removed with a broadcast
  anti-join (the covered set grows by at most |tokens(winner)| per
  round and stays driver-invisible — only the 1-row argmax is
  collected);
- the remaining rows shrink monotonically: rows of covered tokens are
  DROPPED from the working set after each round (the lazy-greedy
  shrink), so later rounds scan less, not more.

Scale story at 100 TB: each round is one combinable groupBy(doc) over
the uncovered token rows + a 1-row TakeOrdered — k passes total, the
textbook cost of exact greedy; the covered-token side is bounded by the
selected docs' vocabulary, broadcastable by construction for realistic
k. Determinism: ties break on doc id, so the selection is reproducible
and SQL-expressible (the DuckDB oracle unrolls the same k rounds).

COST NOTE (applies equally to kcenter_select): exact greedy bills
k × (one corpus scan). At 100 TB that is the right trade only for
small k (eval sets, seed mixtures — tens to low hundreds). For k in
the thousands, switch strategy rather than pay k scans: lazy-greedy
with stale bounds, stochastic-greedy (Mirzasoleiman 2015: one
subsample scan per round), or coreset-then-greedy (select on a
cheap-pass sketch, refine exactly). The k-round loop here is the
EXACT baseline those approximations are judged against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.text import _round4, tokens
from synthea2omop_etl_spark.operators.lineage import cut_lineage


def greedy_coverage_select(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    shingle_n: int = 1,
) -> DataFrame:
    """The k greedily-selected docs: (step, doc_id, gain) where ``gain``
    is the count of first-covered units, step 1-based in selection
    order. Ties break toward the smaller doc id; docs with zero novel
    units are never selected (the output may be shorter than k).

    ``shingle_n`` picks the coverage unit: 1 = distinct tokens; n >= 2 =
    hashed word n-gram shingles (the dedup family's md5/mod-P shingles —
    on a small-vocabulary corpus token coverage saturates after one doc,
    shingle coverage is the meaningful objective)."""
    if shingle_n <= 1:
        unit = F.array_distinct(tokens(F.col(text_col)))
    else:
        from synthea2omop_etl_spark.llm_ops.dedup import word_shingle_hashes

        unit = F.array_distinct(
            word_shingle_hashes(F.col(text_col), shingle_n)
        )
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    toks = (
        spread_if_narrow(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            F.explode(unit).alias("tok"),
        )
        # LAZY (r12, guide §1/§2.4): round 1's argmax is the action that
        # materializes the token table; later rounds read the cache.
        .transform(cut_lineage)
    )
    picks: list[tuple[int, object, int]] = []
    for step in range(1, k + 1):
        # The working set is the ONE checkpointed token table minus the
        # accumulated covered vocabulary (selected docs' units — small by
        # construction, broadcastable). The covered set is a plain filter
        # of the checkpointed table to the picked doc ids (r12): tok
        # membership in ⋃ picked docs' units is exactly the union of the
        # per-round novel sets the previous form accumulated — every tok
        # of a picked doc was either novel at its pick or covered by an
        # earlier pick — so the anti-join semantics are identical, and the
        # per-round union + localCheckpoint job is gone (the broadcast
        # build reads the cache). The earlier form localCheckpoint'ed the
        # shrunken CORPUS-sized set every round: k full materializations,
        # the round-9 sf1 cost of this query — and a non-starter at 100 TB,
        # where the anti-join against k docs' vocabulary is nearly free.
        covered = (
            toks.where(
                F.col("doc").isin([p[1] for p in picks])
            ).select("tok")
            if picks
            else None
        )
        remaining = (
            toks
            if covered is None
            else toks.join(F.broadcast(covered), "tok", "left_anti")
        )
        top = (
            remaining.groupBy("doc")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("doc").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["gain"] == 0:
            break
        winner, gain = top[0]["doc"], top[0]["gain"]
        picks.append((step, winner, gain))
    spark = df.sparkSession
    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        picks, f"step INT, doc_id {id_type}, gain BIGINT"
    )


def duck_greedy_coverage_select(
    table: str,
    text_col: str,
    id_col: str,
    k: int = 5,
    shingle_n: int = 1,
) -> str:
    """DuckDB twin of :func:`greedy_coverage_select`: the same k greedy
    rounds unrolled into chained CTEs (r1..rk), each an argmax over the
    units not covered by earlier winners."""
    if shingle_n <= 1:
        parts = [
            f"""WITH __toks AS (
      SELECT {id_col} AS doc,
             unnest(list_distinct(regexp_split_to_array(trim({text_col}),
                                                        '\\s+'))) AS tok
      FROM {table} WHERE len(trim({text_col})) > 0
    )"""
        ]
    else:
        from synthea2omop_etl_spark.llm_ops.oracles import shingle_cte

        # shingle_cte mirrors dedup.word_shingle_hashes over `documents`
        # (the graded corpus table) — (doc, shd array) per doc.
        parts = [
            "WITH " + shingle_cte("TRUE", shingle_n, "cvsh").lstrip(),
            """__toks AS (
      SELECT doc, unnest(shd) AS tok FROM cvsh
    )""",
        ]
    prev_cov = None
    selects = []
    for step in range(1, k + 1):
        not_cov = (
            f"AND tok NOT IN (SELECT tok FROM {prev_cov})" if prev_cov else ""
        )
        parts.append(
            f"""r{step} AS (
      SELECT doc, CAST(COUNT(*) AS BIGINT) AS gain
      FROM __toks WHERE 1=1 {not_cov}
      GROUP BY doc ORDER BY gain DESC, doc ASC LIMIT 1
    )"""
        )
        cov = f"c{step}"
        prev_sql = f"SELECT tok FROM {prev_cov} UNION " if prev_cov else ""
        parts.append(
            f"""{cov} AS (
      {prev_sql}SELECT tok FROM __toks WHERE doc = (SELECT doc FROM r{step})
    )"""
        )
        prev_cov = cov
        selects.append(
            f"SELECT {step} AS step, doc AS doc_id, gain FROM r{step}"
            " WHERE gain > 0"
        )
    body = ",\n".join(parts)
    union = "\nUNION ALL\n".join(selects)
    return f"{body}\n{union}\nORDER BY step"


def hashed_ngram_buckets(
    text_col: str, buckets: int = 1024
) -> "F.Column":
    """Per-document array of hashed uni+bigram feature buckets — the DSIR
    feature map (Xie et al. 2023 use hashed n-grams into a fixed bucket
    space so the feature LM is a bounded count table at any corpus size).

    Buckets derive from the md5-based cross-engine hash family
    (llm_ops/hashing.py): unigram = hmod(token) % buckets, bigram =
    poly2(hmod(w1), hmod(w2)) % buckets — both reproducible in DuckDB.
    bind_once fences the tokenization: the array is referenced four
    times, and CollapseProject would otherwise re-tokenize per reference.
    """
    from synthea2omop_etl_spark.llm_ops.dedup import bind_once
    from synthea2omop_etl_spark.llm_ops.hashing import hmod, poly2
    from synthea2omop_etl_spark.llm_ops.text import tokens

    def body(arr: F.Column) -> F.Column:
        n1 = F.greatest(F.size(arr) - 1, F.lit(0))
        uni = F.transform(arr, lambda t: hmod(t) % buckets)
        bi = F.zip_with(
            F.slice(arr, 1, n1),
            F.slice(arr, 2, n1),
            lambda a, b: poly2(hmod(a), hmod(b)) % buckets,
        )
        return F.concat(uni, bi)

    return bind_once(tokens(text_col), body)


def dsir_logratio(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    importance weights: score every raw document by how much more likely
    its hashed-n-gram features are under the TARGET distribution than
    under the RAW distribution.

    Per-bucket feature LMs with add-alpha smoothing:

        lr(f) = ln((c_t(f)+α)/(N_t+αB)) − ln((c_r(f)+α)/(N_r+αB))

    and the document score is the MEAN feature log-ratio (length-
    normalized, same convention as llm_ops/lm_score.py), rounded to 4
    decimals. Docs with no features (0 tokens) score NULL.

    Spark-first shape: two map-side-combinable bucket counts (target,
    raw), totals enter as broadcast 1-row aggregates, the ≤``buckets``-row
    log-ratio table broadcasts into ONE equi-join against the exploded
    features, and one per-doc aggregate finishes. At 100 TB the count
    tables stay ≤ B rows by construction — the whole model is
    broadcast-sized no matter the corpus.
    """
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    # feats_raw feeds two consumers (bucket counts + per-doc scoring
    # join) so the feature explode computes twice. Measured dead end
    # (r12): a lazy localCheckpoint of the exploded frame benched
    # neutral-to-slower at sf0.1 AND sf1 across 4 alternating sessions —
    # storing the token-scale feature rows costs what recomputing them
    # does. Left as the recompute plan deliberately.
    feats_raw = spread_if_narrow(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket"),
    )
    feats_t = spread_if_narrow(target, id_col).select(
        F.explode(hashed_ngram_buckets(text_col, buckets)).alias("bucket")
    )
    ct = feats_t.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    cr = feats_raw.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    nt = ct.agg(F.sum("ct").alias("nt"))
    nr = cr.agg(F.sum("cr").alias("nr"))
    ratios = (
        cr.join(ct, "bucket", "full_outer")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
                    / (F.col("nt") + F.lit(alpha * buckets))
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(alpha))
                    / (F.col("nr") + F.lit(alpha * buckets))
                )
            ).alias("lr"),
        )
    )
    per_doc = (
        feats_raw.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            _round4(F.avg("lr")).alias("dsir_logratio"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            "dsir_logratio",
        )
    )


def kcenter_select(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> DataFrame:
    """Farthest-point (k-center greedy) diversity selection over an
    embedding column — the geometric coreset builder (Gonzalez 1985;
    2-approximation to the k-center optimum). Complements
    :func:`greedy_coverage_select` (token novelty) with embedding-space
    spread: the classic recipe for diverse eval sets, seed mixtures, and
    active-learning batches.

    Deterministic: the seed is the lowest id; each round picks the point
    whose min-distance to the selected set (squared L2, floor-half-up
    4dp) is LARGEST, ties on lowest id. Output: ``(sel_rank, id_col,
    d_min)`` — sel_rank 0 is the seed (d_min NULL), 1..k-1 the picks with
    their selection-time distance.

    Spark-first shape: greedy is inherently sequential, so the loop is
    k−1 driver-paced rounds, each ONE corpus scan — the ≤k selected
    centers ride along as a broadcast array-of-structs (the
    operators/clustering.py kmeans pattern), min-distance is a pure
    column expression, and the argmax is a 1-row TakeOrdered. State is
    k rows; nothing corpus-sized is cached or checkpointed.
    """
    from synthea2omop_etl_spark.llm_ops.similarity import _as_double, _sqdist
    from synthea2omop_etl_spark.llm_ops.text import _round4
    from synthea2omop_etl_spark.operators.skew import spread_if_narrow

    spread = spread_if_narrow(emb, id_col)
    e = spread.select(
        F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
    )
    if spread is not emb:
        # the gate repartitioned (narrow = small input): materialize ONCE
        # so the k-1 per-round actions don't re-run the shuffle. Wide
        # inputs skip both the shuffle and the checkpoint — each round
        # scans the source columnar, the intended 100 TB shape.
        e = e.transform(cut_lineage)
    centers = (
        e.orderBy("vid")
        .limit(1)
        .select(
            F.lit(0).alias("sel_rank"),
            "vid",
            F.lit(None).cast("double").alias("d_min"),
            "v",
        )
        .transform(cut_lineage)
    )
    for rank in range(1, k):
        cs = centers.agg(
            F.collect_list(F.struct("vid", "v")).alias("cs")
        )
        # ONE broadcast per round (r12, guide §2.4): the same broadcast
        # centers array drives both the min-distance expression and the
        # not-yet-selected filter (exists over cs.vid — semantically the
        # left_anti join on vid it replaces, without a second broadcast
        # exchange per round). Checkpoints are LAZY: the winner's take(1)
        # is the round's ONE materializing action (guide §1/§2.4).
        scored = e.crossJoin(F.broadcast(cs)).select(
            "vid",
            "v",
            _round4(
                F.array_min(
                    F.transform(F.col("cs"), lambda c: _sqdist(F.col("v"), c["v"]))
                )
            ).alias("d"),
            F.exists(
                F.col("cs"), lambda c: c["vid"] == F.col("vid")
            ).alias("__is_center"),
        )
        winner = (
            scored.where(~F.col("__is_center"))
            .orderBy(F.col("d").desc(), F.col("vid").asc())
            .limit(1)
            .select(
                F.lit(rank).alias("sel_rank"),
                "vid",
                F.col("d").alias("d_min"),
                "v",
            )
            .transform(cut_lineage)
        )
        if not winner.take(1):  # fewer distinct points than k
            break
        centers = centers.unionByName(winner)
    return centers.select(
        "sel_rank", F.col("vid").alias(id_col), "d_min"
    )
