"""Beyond-reference operators for large-scale training-data pipelines.

All hot paths are built-in Catalyst expressions (array/lambda functions,
md5-derived int64 hashing: hashing.py) — no row-at-a-time Python. Pandas UDFs appear only in the
multimodal decode stubs where a Python library would genuinely be required.
"""

from synthea2omop_etl_spark.llm_ops.dedup import (  # noqa: F401
    embedding_near_duplicates,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from synthea2omop_etl_spark.llm_ops.similarity import (  # noqa: F401
    brute_force_topk,
    srp_bucketed_topk,
)
from synthea2omop_etl_spark.llm_ops.text import (  # noqa: F401
    doc_fingerprint,
    lang_id_guess,
    quality_score,
    token_count,
    tokens,
)
