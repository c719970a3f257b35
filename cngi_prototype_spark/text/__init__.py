"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (SURVEY.md §7.1 step 7): language ID, quality
scoring, token counting, document fingerprinting — all pure column
expressions (JVM-side, codegen) with DuckDB SQL twins for the oracle
gate. At 100 TB these run at scan speed; no UDF, no shuffle.
"""

from cngi_prototype_spark.text.analysis import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
