"""The engine's function surface — one import point for users.

The reference's scalar surface is "any pure function inside a
transducer step" (SURVEY §2.8); here the equivalents are Catalyst
expression builders, re-exported by family alongside the engine's own
text/similarity/dedup expression helpers. ``pyspark.sql.functions`` is
re-exported as ``F`` so user pipelines need exactly one import.
"""

from pyspark.sql import functions as F  # noqa: F401  (re-export)

from kafka_streams_clojure_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    norm,
)
from kafka_streams_clojure_spark.operators.text import (  # noqa: F401
    char_count,
    distinct_ratio,
    fingerprint,
    lang_id,
    lang_scores,
    mean_token_len,
    quality_score,
    shingles,
    stopword_ratio,
    token_count,
    tokens,
    tokens_regex,
)
from kafka_streams_clojure_spark.queries._util import davg, dsum  # noqa: F401

__all__ = [
    "F",
    "cosine",
    "dot",
    "norm",
    "tokens",
    "tokens_regex",
    "token_count",
    "char_count",
    "mean_token_len",
    "distinct_ratio",
    "stopword_ratio",
    "lang_scores",
    "lang_id",
    "quality_score",
    "fingerprint",
    "shingles",
    "dsum",
    "davg",
]
