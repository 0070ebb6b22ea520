"""Column-function library (JVM-side expressions + DuckDB SQL twins)."""

from .text import (  # noqa: F401
    SQL,
    fingerprint,
    lang_id_en,
    norm_ws,
    occurrence_count,
    quality_score,
    token_count,
)
