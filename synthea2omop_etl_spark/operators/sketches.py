"""Distributed sketch operators: HyperLogLog, Bloom filter, Count-Min.

The reference engine has no sketch surface (exact COUNT DISTINCT via
Postgres, `query_achilles_results.sh:118`), but at 100 TB exact distincts
and exact membership checks are shuffle-bound; these sketches are the
standard scale path:

- **HyperLogLog registers**: one ``groupBy(bucket).agg(max(rho))`` —
  map-side combinable, fixed-size state per group (m registers), no
  per-value shuffle. Estimate is a driver-free second aggregate.
- **Bloom-filter prune**: build k·|keys| bit positions from the *small*
  side, broadcast, and semi-join the big side on position membership —
  the 100 TB fact table never shuffles. Superset semantics (false
  positives, never false negatives) are deterministic by construction
  here, so the operator is hash-gradeable cross-engine.
- **Count-Min**: d×w integer cells, map-side combinable; point estimates
  are mins over d cells. Overestimates only.

Every hash is md5-derived mod-P (llm_ops/hashing.py) so DuckDB oracles
compute bit-identical buckets/positions — the sketches are graded
first-class, not rows-only.

Determinism note: rho (leading-zero rank) is computed with integer string
arithmetic — ``length(bin(x))`` — in BOTH engines, never ``log2`` (whose
libm rounding could differ at powers of two).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea2omop_etl_spark.llm_ops.hashing import P, duck_hmod, hmod

# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

#: register count (m). 256 registers → ~6.5% standard error.
HLL_M = 256
#: bits of hash budget left after the bucket split: floor(log2(P / m)).
HLL_W = 23


def _rho(rest: Column) -> Column:
    """Leading-zero rank of ``rest`` within a ``HLL_W``-bit budget.

    ``bitlen = length(bin(rest))`` is exact integer arithmetic;
    rho = W - bitlen + 1, with the all-zeros value mapping to W + 1.
    """
    return F.when(rest == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(rest))
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """HyperLogLog register table: (group..., bucket, max_rho).

    One shuffle on (group, bucket); partial max is map-side combined, so
    executor→reducer traffic is bounded by groups × m regardless of row
    count — the property that makes HLL the 100 TB distinct-count path.
    """
    h = hmod(F.col(value_col).cast("string"))
    bucket = (h % HLL_M).alias("bucket")
    rest = F.floor(h / HLL_M)
    return (
        df.select(*group_cols, bucket, _rho(rest).alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def duck_hll_registers(
    table: str, group_cols: list[str], value_expr: str
) -> str:
    """DuckDB SQL computing exactly ``hll_registers`` (for oracles)."""
    h = duck_hmod(f"CAST({value_expr} AS VARCHAR)")
    g = ", ".join(group_cols)
    g_pfx = f"{g}, " if g else ""
    return f"""
    SELECT {g_pfx}bucket, CAST(MAX(rho) AS INTEGER) AS max_rho
    FROM (
      SELECT {g_pfx}({h} % {HLL_M}) AS bucket,
             CASE WHEN ({h} // {HLL_M}) = 0 THEN {HLL_W + 1}
                  ELSE {HLL_W + 1} - CAST(length(bin({h} // {HLL_M})) AS INTEGER)
             END AS rho
      FROM {table}
    ) t
    GROUP BY {g_pfx}bucket
    """


#: HLL bias-correction constant for m = 256.
_ALPHA_256 = 0.7213 / (1 + 1.079 / HLL_M)


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Distinct-count estimates from a register table.

    Missing buckets count as rho = 0 (2^-0 = 1 each). Small-range
    correction (linear counting) applies when E < 2.5·m and empty
    registers exist — the regime where raw HLL is biased high.
    """
    m = HLL_M
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
        F.count("*").alias("present"),
    )
    zeros = F.lit(m) - F.col("present")
    raw = F.lit(_ALPHA_256 * m * m) / (F.col("present_sum") + zeros)
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when(F.col("present") == 0, F.lit(0.0)).otherwise(
        # ungrouped aggregate over EMPTY registers still emits one row
        # (count=0, sum=null) — that row means "no values seen": 0
        F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), small).otherwise(raw)
    )
    return agg.select(
        *group_cols, F.round(est).cast("long").alias("approx_distinct")
    )


def hll_error_bound() -> float:
    """Expected relative standard error for the configured m."""
    return 1.04 / math.sqrt(HLL_M)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(value: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a value (salted md5 mod-P mod m)."""
    return F.array(
        *[
            hmod(F.concat(value.cast("string"), F.lit(f"|{i}"))) % m_bits
            for i in range(1, k + 1)
        ]
    )


#: most-recent cached bit table (bounded at ONE entry) — same idiom as
#: llm_ops.dedup._swap_packed_cache: each bloom_build releases its
#: predecessor's cache, so repeated builds in one session keep storage flat.
_BITS_CACHE: list[DataFrame] = []


def _swap_bits_cache(bits: DataFrame) -> DataFrame:
    while _BITS_CACHE:
        try:
            _BITS_CACHE.pop().unpersist()
        except Exception:
            pass
    _BITS_CACHE.append(bits)
    return bits.cache()


def bloom_build(
    keys: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 3
) -> DataFrame:
    """Distinct set bit positions for the key set — the broadcast side.

    Size is ≤ min(m_bits, k·|keys|) longs; for a 10⁷-key build side that
    is a few MB — broadcastable where the raw key set might not be.

    The bit table is cached (bounded one-entry swap): ``bloom_prune``
    probes it once per salt, and without the cache each broadcast arm
    would re-scan the key source and re-run the dedup shuffle (Catalyst
    does not reuse alias-renamed broadcast subtrees). At 100 TB, persist
    this layer to parquet instead and read it back.
    """
    bits = keys.select(
        F.explode(_bloom_positions(F.col(col), m_bits, k)).alias("pos")
    ).distinct()
    return _swap_bits_cache(bits)


def bloom_prune(
    df: DataFrame,
    col: str,
    bits: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Keep rows whose key *may* be in the set (all k positions set).

    k sequential broadcast LEFT SEMI joins, one per salted position — the
    fact side is filtered map-side against the broadcast bit table and is
    NEVER shuffled (an explode+groupBy formulation would shuffle k× the
    fact rows to re-assemble the all-positions-match vote; this shape
    keeps the conjunction as a chain of hash-probe filters instead).
    False-positive rows pass — callers follow with an exact join on the
    survivors when exactness matters, which is the point: the expensive
    exact join now runs on a pruned input.
    """
    value = F.col(col).cast("string")
    out = df
    for i in range(1, k + 1):
        pos_i = hmod(F.concat(value, F.lit(f"|{i}"))) % m_bits
        arm = bits.withColumnRenamed("pos", f"__bloom_p{i}")
        out = out.join(
            F.broadcast(arm), pos_i == F.col(f"__bloom_p{i}"), "left_semi"
        )
    return out


def duck_bloom_bits(keys_sql: str, col: str, m_bits: int, k: int) -> str:
    """DuckDB CTE body: distinct bit positions of the key set."""
    arms = " UNION ALL ".join(
        f"SELECT ({duck_hmod(f'CAST({col} AS VARCHAR) || ' + repr('|' + str(i)))} % {m_bits}) AS pos FROM ({keys_sql}) s{i}"
        for i in range(1, k + 1)
    )
    return f"SELECT DISTINCT pos FROM ({arms}) u"


def duck_bloom_member(col: str, m_bits: int, k: int, bits_cte: str) -> str:
    """DuckDB boolean expression: all k positions of ``col`` are set."""
    conds = " AND ".join(
        f"({duck_hmod(f'CAST({col} AS VARCHAR) || ' + repr('|' + str(i)))} % {m_bits}) IN (SELECT pos FROM {bits_cte})"
        for i in range(1, k + 1)
    )
    return f"({conds})"


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 13  # 8192


def _cms_pos(value: Column, depth: int, width: int) -> Column:
    return hmod(F.concat(value.cast("string"), F.lit(f"#{depth}"))) % width


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min sketch table: (depth, pos, cnt). d×w cells total.

    Built with one explode + one map-side-combinable count — at any
    scale the reducer state is ≤ depth·width cells.
    """
    w = weight if weight is not None else F.lit(1).cast("long")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_pos(F.col(col), j, width).alias("pos"),
                    )
                    for j in range(1, depth + 1)
                ]
            )
        ).alias("cell"),
        w.alias("w"),
    )
    return (
        rows.select("cell.depth", "cell.pos", "w")
        .groupBy("depth", "pos")
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates (min over depths) for each item. Overestimates only.

    The sketch is small (≤ d·w rows) → broadcast to the item side.
    """
    probes = items.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_pos(F.col(col), j, width).alias("pos"),
                    )
                    for j in range(1, depth + 1)
                ]
            )
        ).alias("cell"),
    ).select(col, "cell.depth", "cell.pos")
    return (
        probes.join(F.broadcast(sketch), ["depth", "pos"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_count"))
    )


def duck_cms(
    table: str,
    col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB SQL: per-item CMS estimates over ``table.col`` (oracle)."""
    arms = " UNION ALL ".join(
        f"SELECT {j} AS depth, "
        f"({duck_hmod(f'CAST({col} AS VARCHAR) || ' + repr('#' + str(j)))} % {width}) AS pos, "
        f"{col} FROM {table}"
        for j in range(1, depth + 1)
    )
    return f"""
    WITH cells AS ({arms}),
    sketch AS (
      SELECT depth, pos, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY depth, pos
    ),
    probes AS (
      SELECT DISTINCT {col}, depth, pos FROM cells
    )
    SELECT p.{col}, MIN(s.cnt) AS est_count
    FROM probes p JOIN sketch s USING (depth, pos)
    GROUP BY p.{col}
    """
