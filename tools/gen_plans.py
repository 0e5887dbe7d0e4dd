#!/usr/bin/env python
"""Regenerate PLANS.md from the SHIPPED operators.

Every plan block is `.explain("formatted")` output of the exact DataFrame
the graded registry builds (synthea2omop_etl_spark.queries.QUERIES) at
sf0.001 — so the documented plans are, by construction, the audited ones.
Run after any operator change:

    python tools/gen_plans.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

# (query name, commentary) — commentary says what to CHECK in the plan,
# i.e. the properties that make it the plan we'd ship at 100 TB.
SECTIONS: list[tuple[str, str]] = [
    (
        "pricing_summary",
        "Full-scan aggregate. What to check: `PushedFilters` carries the "
        "shipdate predicate into the parquet reader; `ReadSchema` lists "
        "only the 6 needed columns of 11; `partial_sum/partial_avg` before "
        "the Exchange = map-side combine, so the shuffle moves one row per "
        "(group × task), not per input row.",
    ),
    (
        "revenue_by_nation",
        "Three-hop dimension join. All three joins are `BroadcastHashJoin` "
        "— the orders fact table is scanned once and never shuffled for "
        "the joins; the only Exchange is the final tiny group-by on "
        "(r_name, n_name). At 1000 executors this plan reads 100 TB of "
        "facts with zero fact shuffle.",
    ),
    (
        "dedup_minhash",
        "MinHash+LSH with md5/mod-P cross-engine hashing. What to check: "
        "the cache-fill projection contains exactly ONE `md5` transform — "
        "token-hash, shingle-combine, and the fused single-pass signature "
        "(one `aggregate`, accumulator = running vector of k mins) are "
        "nested let-bindings (llm_ops/dedup.bind_once), so no optimizer "
        "rewrite can re-inline them. `InMemoryTableScan` marks the cached "
        "packed struct feeding all four consumers (band a/b sides + "
        "verify). The only shuffles are the band-bucket self-join Exchange "
        "on (band_idx, band_hash) — cost proportional to colliding docs, "
        "never n² — and the verify joins keyed by doc id.",
    ),
    (
        "ann_topk",
        "Exact brute-force cosine top-k, TWO-stage. What to check: the "
        "query side is a `BroadcastExchange` (one corpus scan, no fact "
        "shuffle for scoring); stage 1 is a HashAggregate on (query_id, "
        "SPARK_PARTITION_ID()) whose sorted-slice keeps each partition's "
        "local top-k, so the shuffle spreads over P×|queries| groups; the "
        "final Window ranks only the ~P×k survivors per query. A "
        "single-stage window would hash the whole scored corpus for one "
        "query into ONE partition — the skew this plan exists to avoid.",
    ),
    (
        "asof_signup_value",
        "As-of join (latest event at or before each signup): union the "
        "tagged streams, one shuffle on the join key, last_value over the "
        "interleaved ordering — the Flink/kdb as-of shape without a "
        "per-row lookup join.",
    ),
    (
        "achilles_weighted_rollup",
        "Drug-era-style strength-weighted rollup (Achilles catalog shape): "
        "facts `BroadcastHashJoin` the strength/price dimension, partial "
        "aggregation before the single Exchange on the rollup key. The "
        "fact table never shuffles for the join.",
    ),
    (
        "doc_chunks",
        "Token-window chunking. What to check: ZERO Exchange operators — "
        "the per-doc fan-out (Generate/posexplode) is entirely map-side, "
        "and the token array is let-bound so the tokenizer runs once per "
        "row, not once per chunk.",
    ),
    (
        "hll_registers",
        "HyperLogLog register table. What to check: ONE Exchange (group × "
        "bucket) preceded by `partial_max` — reducer input is bounded by "
        "groups × 256 registers regardless of input rows; rho is integer "
        "`length(bin())` arithmetic inside whole-stage codegen (no libm, "
        "no UDF). This is the 100 TB distinct-count path: state is "
        "mergeable, so the same plan serves batch, streaming "
        "(streaming/sketches.py), and partial re-aggregation.",
    ),
    (
        "bloom_prune_lineitem",
        "Bloom-filter semi-join prune. What to check: the fact spine is k "
        "`BroadcastHashJoin ... LeftSemi` probes over the cached bit "
        "table (`InMemoryTableScan` × k) with NO Exchange until the final "
        "tiny aggregate — the lineitem scan is filtered map-side; an "
        "explode+groupBy formulation would have shuffled k × the fact "
        "rows. False positives pass deterministically (superset "
        "semantics), so the downstream exact join runs on a pruned input.",
    ),
    (
        "cms_user_counts",
        "Count-Min sketch estimates. What to check: the sketch build is "
        "one map-side-combinable count over d×w cells; estimation joins "
        "the sketch `BroadcastExchange`-side into the probe set (no "
        "SortMergeJoin), then a min-over-depths aggregate on the small "
        "item set. Sketch size is fixed (d×w), independent of input rows.",
    ),
    (
        "corpus_curation",
        "The composed curation pipeline. What to check: the quality and "
        "language gate predicates fuse into the filter over the documents "
        "scan inside the cache-fill plan of the gated layer "
        "(`InMemoryTableScan`), which BOTH downstream consumers — the "
        "MinHash packed-signature build and the survivor anti-join — read, "
        "so the gates and the md5 dedup window evaluate once; the band "
        "join's Exchange inputs are the gated survivors, not raw "
        "documents; split assignment is a map-side projection. At 100 TB "
        "the cached layer becomes a parquet materialization "
        "(persist_path contract).",
    ),
    (
        "gapfill_hourly",
        "Time-bucket gap-fill + LOCF. What to check: the bucket spectrum "
        "is `Generate explode(sequence(...))` — generated distributed, "
        "never a driver loop; the fill join is group-local; LOCF is ONE "
        "Window pass (`last ignorenulls`, unbounded-preceding frame) over "
        "the same partitioning, so AQE can reuse the exchange.",
    ),
    (
        "fuzzy_name_pairs",
        "Blocked fuzzy record linkage. What to check: the levenshtein "
        "verify joins DISTINCT names per block (the `HashAggregate` "
        "pair feeding the first join) — quadratic only in a block's "
        "distinct names, not its rows, so exact copies cost linear "
        "expansion instead of squared verify (10x replication was 100x "
        "work in the row-level formulation; measured 2.7x vs 52.9x on "
        "the 10x scale set). No `CartesianProduct`, no "
        "`BroadcastNestedLoopJoin`; every join is an equi-join on "
        "(block) or (block, name). The expansion joins' output is the "
        "answer itself — irreducible.",
    ),
    (
        "snapshot_diff_orders",
        "CDC snapshot diff. What to check: the mod-key snapshot "
        "predicates push into BOTH parquet scans; `ReadSchema` is the "
        "2-column key+compare projection; one `SortMergeJoin FullOuter` "
        "on the key — the minimum for a key-aligned diff. Over layers "
        "written with write_bucketed the exchanges vanish entirely "
        "(test_bucketed_join_no_shuffle pins that shape).",
    ),
    (
        "price_histogram",
        "Equi-width histogram. What to check: `partial_count` before a "
        "single Exchange — at most n_buckets rows per task cross the "
        "wire; the clamped floor bucket arithmetic is codegen'd into the "
        "scan's projection. The cheapest possible distribution shape: no "
        "rank, no sort, one tiny shuffle.",
    ),
    (
        "inverted_index",
        "Inverted-index build. What to check: tokenize+explode is "
        "map-side (`Generate explode`); the only data shuffle is the "
        "token-keyed aggregate; the corpus-size scalar arrives via "
        "`BroadcastExchange` (no second shuffle, no cartesian). The "
        "min_df/max_df fences are the Zipf-skew control — stopword "
        "posting lists die before they concentrate on one reducer.",
    ),
    (
        "sequence_packing",
        "Concat-and-chunk packing. What to check: ONE Window pass "
        "(prefix sum) partitioned by the shard column — the shard is the "
        "unit of sequentiality, so the plan is parallel across shards "
        "and has no unpartitioned window; chunk ids are codegen'd floor "
        "arithmetic on the running sum. The greedy no-straddle variant "
        "is the deliberate Pandas path (`FlatMapGroupsInPandas` per "
        "shard) — a running-state recurrence no window frame expresses.",
    ),
    (
        "attribution_events",
        "Stream-stream join batch twin (click→purchase within 4 h). What "
        "to check: ONE equi-join keyed on user_id with the time-range "
        "predicate as the join's non-equi condition — never a "
        "BroadcastNestedLoopJoin over time. In streaming mode this same "
        "shape becomes the state-store join: state hash-partitioned by "
        "user_id, eviction bound = watermark + horizon, so per-key state "
        "is O(events within the horizon window), not O(stream).",
    ),
    (
        "lm_doc_score",
        "Bigram-LM scoring (train + score in one plan). What to check: "
        "bigram extraction is slice+arrays_zip+explode (codegen, no "
        "posexplode/sort); the two count tables arrive as "
        "BroadcastHashJoins at this SF (AQE decides — at 100 TB they "
        "shard and the joins shuffle on w1/w2, same plan class); the "
        "per-doc aggregate partial-combines map-side. No Python "
        "anywhere: log/round are JVM expressions.",
    ),
    (
        "ann_pq",
        "Product-quantization ADC top-k. What to check: the codebook and "
        "the per-query lookup table enter every join as "
        "`BroadcastExchange` (m×ksub and q×m×ksub rows); the encode side "
        "is `partial_min` over (vector, subspace) before its Exchange — "
        "the argmin combines map-side; the ADC sum is `partial_sum` "
        "keyed (query, neighbor). The corpus shuffles only on its own "
        "code layout, never against the queries. At 100 TB the codes "
        "layer is materialized once (m bytes/vector vs dim floats) and "
        "every query batch reuses it.",
    ),
    (
        "ewma_prices",
        "Bounded-window fold. What to check: ONE Exchange+Sort on "
        "(o_custkey; o_orderdate, o_orderkey) — the same sort any "
        "windowed aggregate needs; `collect_list` over a ROWS frame "
        "bounds per-row state to 10 values (no whole-partition "
        "buffering); the recurrence itself is an `aggregate` lambda in "
        "the projection — whole-stage codegen, no second pass.",
    ),
    (
        "leakage_safe_split",
        "LSH pairs → connected components → broadcast join-back. What to "
        "check: the signature build reuses the minhash one-md5-pass "
        "projection; component label rounds run over the PAIR graph "
        "(tiny relative to the corpus) with `localCheckpoint` truncating "
        "lineage per round; the final assignment is one "
        "`BroadcastHashJoin` of clusters onto the corpus — the corpus "
        "itself is never shuffled for the split.",
    ),
    (
        "bootstrap_ci_orders",
        "Poisson-bootstrap CI. What to check: `partial_average`/"
        "`partial_sum` under the (group, replicate) HashAggregate sit "
        "BELOW the Exchange — each task ships (groups × R) running sums, "
        "not R× its input rows; the inverse-CDF ladder is a CASE chain "
        "inside whole-stage codegen (no UDF); the point-estimate branch "
        "joins the tiny CI table, never the other way.",
    ),
    (
        "part_pair_lift",
        "Frequent-pair mining (r10: map-side combinations strategy). "
        "What to check: the fenced (basket, item) layer is an "
        "`InMemoryTableScan` feeding its consumers (basket arrays, item "
        "counts, basket total) — uncached, each branch re-derived it; "
        "ONE Exchange moves the layer to the basket key, then the "
        "C(k,2) pair explode (Generate over the sorted item array) runs "
        "map-side straight into the pair partial aggregate — no "
        "self-join, one fewer corpus exchange than the previous plan; "
        "lift denominators arrive by broadcast.",
    ),
    (
        "tpch_q9",
        "TPC-H Q9 — the suite's heaviest fact join (lineitem × part × "
        "supplier × orders × nation). What to check: the LIKE-filtered "
        "part projection and nation are `BroadcastHashJoin` sides; the "
        "lineitem⋈orders join keys on the order key, so at 100 TB both "
        "big tables shuffle ONCE on the same key (or not at all when the "
        "lake is bucketed by orderkey — cli run --bucket-by); the rollup "
        "is partial_sum before its Exchange. `ReadSchema` on lineitem "
        "lists only the 5 needed columns.",
    ),
    (
        "tpch_q21",
        "TPC-H Q21 — EXISTS + NOT EXISTS against sibling rows of the same "
        "order. What to check: both correlated subqueries are decorrelated "
        "into ONE per-order aggregate — since r13 a distinct-(order, "
        "supplier) pre-aggregate with a max R-flag (NO Expand node: the "
        "double countDistinct planned as a x2 row multiplier on the full "
        "lineitem scan) — instead of two lineitem self-joins; the nation "
        "filter reduces supplier to a broadcast side; final top-20 is "
        "`TakeOrderedAndProject` (no global sort materialization).",
    ),
    (
        "logreg_status_year",
        "Fixed-iteration Newton logistic fit (final round shown; rounds "
        "1-2 are identical driver-paced aggregates). What to check: ONE "
        "HashAggregate pair (partial_sum before the Exchange = map-side "
        "combine of the five sufficient statistics); the sigmoid and the "
        "2x2 solve are pure codegen expressions — no EvalPython, no "
        "per-row state; the shuffle moves 5 doubles per task.",
    ),
    (
        "achilles_dq_orphans",
        "x07 invalid-FK data-quality count. What to check: the anti-join "
        "is `BroadcastHashJoin ... LeftAnti` (dim-sized build side — at "
        "scale AQE flips to shuffled-anti only when the person set "
        "outgrows the broadcast threshold); aggregating the possibly-"
        "empty filter still emits the 0-count row (no special casing).",
    ),
    (
        "achilles_age_first_dist",
        "103/104 age-at-first-event distribution by stratum. What to "
        "check: per-entity min-date is one partial-aggregated keyed "
        "shuffle of orders; the customer dim joins Broadcast; the five "
        "quantiles ride ONE `percentile(..., array(...))` aggregate — a "
        "single sort buffer per stratum, not five.",
    ),
    (
        "achilles_small_cell",
        "smallCellCount censoring. What to check: the count filter is "
        "applied AFTER the final aggregate (a HAVING — `Filter` above "
        "`HashAggregate`), so surviving counts are full-data counts; the "
        "nation dim joins Broadcast; one keyed shuffle total.",
    ),
    (
        "achilles_death_gap_dist",
        "511-515 death-proximity distribution. What to check: TWO keyed "
        "max-date aggregates (each partial-aggregated before its "
        "Exchange), the death slice joins Broadcast onto the per-entity "
        "lasts, and the five quantiles ride ONE `percentile(..., "
        "array(...))` aggregate — at 100 TB each fact table pays exactly "
        "one keyed shuffle and the deaths side stays dim-sized.",
    ),
    (
        "achilles_domain_mask",
        "2004 domain-presence bitmask. What to check: each domain slice "
        "reduces to a DISTINCT entity set (partial_first/HashAggregate "
        "before the union) so the mask aggregate's shuffle carries "
        "entity-sized inputs only — fact tables are never shuffled "
        "against each other; the bit weights are literals folded into "
        "the union branches.",
    ),
    (
        "bpe_merges",
        "BPE merge-rule learning (8 rounds). What to check: the corpus is "
        "touched ONCE (the word-frequency partial_count before the first "
        "Exchange); every later stage reads the localCheckpoint'ed "
        "vocabulary-sized symbol table (Scan ExistingRDD), so per-round "
        "cost is independent of corpus scale; the winning pair enters the "
        "merge step via BroadcastExchange of a 1-row aggregate — no "
        "driver-side constants in the plan.",
    ),
    (
        "bpe_segment",
        "BPE tokenizer application. What to check: the learned word → "
        "subwords map joins in via BroadcastHashJoin (vocabulary-sized by "
        "construction), the corpus side is ONE posexplode scan, and the "
        "per-doc reassembly aggregates (i, seg) structs whose buffer is "
        "bounded by document length — train-on-vocab, encode-at-corpus-"
        "scale.",
    ),
    (
        "dsir_weights",
        "DSIR importance weights. What to check: the exploded uni+bigram "
        "features reduce through partial_count bucket aggregates (the "
        "model is ≤1024 rows at ANY corpus size), totals enter as "
        "BroadcastExchange 1-row aggregates, and the ratio table joins "
        "back via BroadcastHashJoin — the corpus-sized feature stream is "
        "never shuffled for the model join.",
    ),
    (
        "source_overlap",
        "Cross-source shingle-Jaccard matrix. What to check: the corpus "
        "reduces to DISTINCT (source, shingle) rows — partial_first/"
        "HashAggregate BEFORE the self-join — so the pairing never sees "
        "raw documents; the shingle equi-join fans out only across the "
        "sources containing each shingle; the n_sources-row size table "
        "re-enters via BroadcastHashJoin.",
    ),
    (
        "kcenter_diverse",
        "Farthest-point coreset (7 driver-paced rounds). What to check: "
        "each round is ONE scan of the embeddings relation with the "
        "selected centers riding along as a BroadcastExchange of a 1-row "
        "collect_list aggregate (the kmeans pattern); the winner is a "
        "1-row TakeOrderedAndProject; the left-anti against the ≤k center "
        "ids broadcasts. Nothing corpus-sized persists between rounds.",
    ),
    (
        "span_corruption",
        "T5 span-corruption prep. What to check: ONE Generate "
        "(posexplode) feeds doc-partitioned Window nodes (lag + running "
        "sums — state bounded by document length); the mask decision is "
        "conv(md5)-mod arithmetic inside codegen, no Python and no "
        "rand(); the corrupted/target reassemblies are two combinable "
        "collect_list aggregates over the union branches.",
    ),
    (
        "funnel_steps",
        "Strict-order funnel. What to check: each stage is a user-keyed "
        "equi-join (AQE broadcasts the shrinking survivor side) plus a "
        "partial_min combinable aggregate; the only cross join is the "
        "broadcast 1-row base count; no CartesianProduct anywhere.",
    ),
    (
        "ngram_repetition",
        "Gopher n-gram repetition fractions. What to check: all three "
        "n-gram arrays (n=2,3,4) come from ONE tokenization fenced by "
        "bind_once (count md5-free scans: a re-inlined tokenizer would "
        "triple the regex work), the (doc,n,gram) count partial-aggregates "
        "before its Exchange — the only corpus-sized shuffle — and (r13) "
        "the (doc,n) rollup sums ride an unbounded-frame window on the "
        "SAME (id, n) partitioning as the top-gram rank: one pass over "
        "the count table, no second derivation of it and no join-back.",
    ),
    (
        "dedup_phash",
        "Perceptual-hash near-dup (r10). What to check: signature build "
        "is pure column algebra inside WholeStageCodegen (transform/"
        "aggregate over a bounded 64-element grid — no Python, no "
        "Generate until the 4-band posexplode); candidates come from a "
        "(band, word) equi-join (SortMerge/ShuffledHash — never "
        "CartesianProduct or BroadcastNestedLoop); the Hamming verify "
        "(zip_with + bit_count) is a post-join projection.",
    ),
    (
        "dedup_semantic",
        "SemDeDup cluster-fenced embedding dedup (r10). What to check: "
        "the ONLY nested-loop is the bounded ×n_clusters broadcast "
        "centroid assignment (BroadcastNestedLoopJoin over an 8-row "
        "side); the pair join is an equi-join on the cluster id, so "
        "pair cost is per-cluster, never corpus²; per-vector norms are "
        "projected before the join so per-pair work is the dot product "
        "only.",
    ),
    (
        "unigram_lm",
        "Unigram-LM trainer round (r10). What to check: the corpus is "
        "touched once (word-frequency aggregate); candidate edges join "
        "the piece model via `BroadcastHashJoin` (the model is "
        "model-sized by construction); the Viterbi DP and backtrack are "
        "single-row array folds (no per-position shuffle, no Python); "
        "loop state is localCheckpoint'ed so round N never re-derives "
        "round N-1.",
    ),
    (
        "dedup_perceptual",
        "Combined aHash∧dHash perceptual admission (r11). What to check: "
        "ONE parquet scan feeds both signature computations (the fused "
        "perceptual_signatures projection — no second scan, no id "
        "join); the candidate join is a shuffled equi-join on "
        "(slot, word) after the concatenated-band posexplode — no "
        "CartesianProduct anywhere; both Hamming verifies are per-row "
        "zip_with/bit_count folds after the join, not a second "
        "exchange.",
    ),
    (
        "multimodal_codec",
        "RLE codec round-trip (r11; fused r13). What to check: the chain "
        "is scan → round-robin exchange (spread_if_narrow: single-row-"
        "group file would pin the Python kernel to one core) → exactly "
        "ONE MapInPandas running encode+decode back to back — payload "
        "bytes cross the JVM↔Arrow boundary once instead of twice, no "
        "driver collection, no shuffle after the spread.",
    ),
    (
        "temperature_delivery",
        "Temperature mixture composed into delivery (r11). What to "
        "check: the corpus is aggregated ONCE into the n_sources-row "
        "weights frame (map-side partial_sum before the exchange); the "
        "α-targets come back via BroadcastHashJoin (model-sized, no "
        "shuffle); the per-source prefix-sum Window is partitioned by "
        "source (never a global single-partition window); the final "
        "accounting aggregate is again map-side combinable.",
    ),
    (
        "achilles_persons_year_gender",
        "Achilles 504 two-stratum persons count (r10). What to check: "
        "the distinct-entity reduction (HashAggregate on entity, year, "
        "segment) runs BEFORE the stratum count, so the final aggregate "
        "is map-side combinable over entity-sized rows; the "
        "orders-customer join is AQE-planned (broadcast at this SF).",
    ),
    (
        "ann_ivfpq",
        "IVF-PQ residual ADC (r12). What to check: exactly TWO "
        "BroadcastNestedLoopJoins, both bounded ×n_lists centroid "
        "fan-outs (corpus assignment + query probing — the residual "
        "frame is lazily checkpointed, so the assignment is computed "
        "once, not once per consumer branch); codebook and per-query "
        "tables come back as BroadcastHashJoins (model-sized); the ADC "
        "sum is a map-side-combinable HashAggregate on (query, "
        "neighbor); no CartesianProduct, no Python.",
    ),
    (
        "perceptual_batch_admission",
        "Batch twin of the streaming perceptual greedy (r12). What to "
        "check: the corpus-scale work is the capped banded pair join "
        "(groupBy bucket sizes + left_semi fence + (band, word) "
        "equi-join — all shuffled equi-joins, no cartesian); the ONLY "
        "Python node is one FlatMapGroupsInPandas, the per-component "
        "sequential greedy over component-sized frames; admission "
        "flags return via a left join on doc id, so unpaired docs "
        "never touch Python.",
    ),
]

NOTES = """\
## Scale-design notes (rounds 2-3)

### Cross-engine hashing (llm_ops/hashing.py)

All output-visible hashing (MinHash signatures, SimHash bits, LSH band
buckets, dataset splits) is md5-derived int64 with mod-P (P = 2^31-1)
integer mixing, because the correctness gate hash-compares against DuckDB
and `xxhash64` is Spark-only. Design constraints that shaped it:

- every product stays < 2^62 (operands reduced mod P first), so there is
  no int64 overflow in either engine — DuckDB raises on overflow, Spark
  silently wraps; both failure modes are designed out rather than handled;
- MinHash permutations are classical universal hashes (a·t + b) mod P with
  constants from a seeded PRNG both the plan builder and the oracle
  generator call — agreement by construction;
- ordered combining (n-gram shingles, band digests) is a Rabin-Karp
  polynomial mod P.

Bought with it: five formerly rows-only components
(minhash/simhash/srp/ivf/clusters) carry exact DuckDB oracles. The round-2
cost (~1.7× on the hash stage) was recovered in round 3 by fixing the
re-inlining below — `dedup_minhash` now benches FASTER than the round-1
xxhash64 version.

### Interpreted-HOF re-inlining and `bind_once` (the round-3 perf lesson)

Spark evaluates lambda higher-order functions interpreted, and Catalyst's
CollapseProject INLINES an aliased expression into every reference site
when it merges projections. The round-2 belief that "compute the hash
array in its own select, slice it in the next" protects against this is
WRONG: counting `md5` occurrences in the executed plan showed the token
transform re-inlined 8× per row through the projection boundary.

The robust idiom is a let-binding in the expression tree itself —
`element_at(transform(array(bound), x -> body(x)), 1)`
(llm_ops/dedup.bind_once): a lambda variable is a materialized runtime
value, so `body` can reference it any number of times and `bound`
evaluates exactly once, surviving every optimizer rewrite. Used by the
MinHash pack (hash → shingle → fused signature: one md5 in the whole
fill plan), `word_shingle_hashes`, `ngram_jaccard_pairs`, and
`chunk_tokens` (tokenizer once per row, not once per chunk).

### Dense IDs without a driver round-trip (operators/idmap.py)

The `partitioned` strategy (range-repartition → per-partition row_number +
offset) previously prefix-summed the partition counts on the driver via an
EAGER collect() at plan-build time — every domain transform paid its whole
upstream pipeline twice (once for the count job, once for the real write).
The prefix sum is now a one-task window over the per-partition count
summary (one row per partition), fully lazy: both branches consume the
same range-shuffle Exchange and the upstream executes once. Measured ~1.7×
on the end-to-end ETL bench.

### ETL throughput scales super-linearly on this hardware

Synthetic Synthea ETL (benchgen: 9 source tables including immunizations
+ provider/organization dims → full 11-table OMOP output, all written):

| patients | source rows | steady time | rows/s |
|---|---|---|---|
| 50k  | ~950k  | ~10.4 s | ~91k  |
| 200k | ~3.8M  | ~22 s   | ~170k |

Per-row cost FALLS 2.4× at 4× the data — the pipeline is dominated by
fixed per-job/stage costs (driver scheduling, codegen, small-dim maps),
not per-row work, which is exactly the profile that keeps scaling on a
real cluster where those fixed costs amortize over 1000 executors.

### Percentiles at 100 TB

Exact `percentile()` materializes every group's values (sort-based agg) —
correct and oracle-exact, but memory-heavy when one group holds billions
of rows. The scale mode is `percentile_approx` (Greenwald-Khanna sketch,
O(accuracy) memory, map-side combinable; rank error ≤ n/accuracy). Both
modes are graded: `price_percentiles` (exact vs quantile_cont) and
`price_percentiles_approx` (sketch vs quantile_disc — with accuracy ≥
group size the sketch degenerates to exact discrete percentiles, so even
the approximate OPERATOR carries an exact oracle).

### Curation fan-out (doc_chunks)

Token-window chunking fans each doc into ~len/stride rows entirely
map-side: one scan, zero exchanges (asserted in test_plan_quality).
At 100 TB this is the shape that matters — chunking must not shuffle the
corpus; downstream consumers repartition the (smaller) chunk rows as
their joins require.
"""


def main() -> None:
    from synthea2omop_etl_spark.queries import QUERIES
    from synthea2omop_etl_spark.session import get_spark

    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — annotated physical plans for the headline queries",
        "",
        "Generated by `tools/gen_plans.py` from `.explain(\"formatted\")` of",
        "the shipped graded registry at sf0.001 (plan shape is",
        "scale-invariant; AQE re-plans sizes at runtime). These are the",
        "plans we *want* at 100 TB, enforced by tests/test_plan_quality.py.",
        "",
    ]
    for name, commentary in SECTIONS:
        df = QUERIES[name].spark(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", commentary, "", "```", plan.rstrip(), "```", ""]
    out.append(NOTES)
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print("PLANS.md regenerated:", len(SECTIONS), "plan sections")


if __name__ == "__main__":
    main()
