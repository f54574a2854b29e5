"""Reusable Column-expression helpers (all JVM-side, codegen-friendly)."""

from llm_training_data_pipeline_spark.functions.text import (  # noqa: F401
    alpha_count,
    char_shingles,
    digit_count,
    nonspace_count,
    strip_ws,
    whitespace_tokens,
    word_count,
)
from llm_training_data_pipeline_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
)
