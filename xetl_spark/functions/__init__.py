"""Column-builder function library — the engine's scalar/vector helper
surface (README layout contract).

Everything here returns Catalyst ``Column`` expressions (JVM-side,
codegen-friendly) and is usable in any select/filter/agg or SQL via
``spark.udf.register``-free composition. Families:

- text: tokens, token_count, char_count, punct_ratio,
  unique_token_ratio, stopword_ratio, quality_score, language_id,
  fingerprint, rolling_hash_fingerprint
- vector: dot, norm, cosine_sim (higher-order array expressions over
  array<float|double> embedding columns)
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from xetl_spark.operators.text import (  # noqa: F401
    char_count,
    fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    rolling_hash_fingerprint,
    stopword_ratio,
    token_count,
    tokens,
    unique_token_ratio,
)


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (use for small/medium vectors;
    bulk similarity goes through operators.similarity's BLAS path)."""
    av, bv = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column | str) -> Column:
    av = as_double_array(a)
    return F.sqrt(F.aggregate(av, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
