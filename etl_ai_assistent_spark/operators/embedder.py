"""G4 — the embedding operator (reference embedder_service.py:4-9).

The reference calls an external Ollama model per text (one HTTP call per
chunk — the anti-pattern SURVEY.md §4 flags). The engine's default is a
deterministic feature-hash embedding: tokenize -> md5-bucket -> TF vector
-> L2 normalize. Seeded by nothing, network-free, reproducible — the
property the verified pipeline needs (SURVEY.md §7 hard-parts 3/5). An
external-model client can implement the same ``embed(text) ->
array<float>`` contract behind pluggable_embedder().

Two equivalent implementations (tested equal):

- ``hash_embed_expr``    pure built-in column expression — JVM-side,
  whole-stage codegen, and mirrorable in DuckDB SQL for the oracle gate.
- ``hash_embed_pandas``  Arrow-batched pandas UDF (numpy bincount) — the
  shape an external model plugs into (SCALAR batching per partition);
  also the faster path at very high token counts.

Both are narrow per-row transforms: embedding 100 TB never shuffles.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as TX

DEFAULT_DIM = 64  # testdata embedding dim; reference uses 1024


def token_bucket_expr(tok: Column, dim: int) -> Column:
    """md5-based token bucket, reproducible across engines:
    int(md5(tok)[:8], 16) % dim. DuckDB twin:
    CAST(('0x' || substr(md5(tok),1,8)) AS BIGINT) % dim."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % dim


def hash_embed_expr(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """ARRAY<DOUBLE> L2-normalized hashed-TF embedding, built-ins only."""
    toks = TX.tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    buckets = F.transform(toks, lambda t: token_bucket_expr(t, dim))
    tf = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(buckets, lambda x: x == b.cast("bigint"))).cast(
            "double"
        ),
    )
    norm = F.sqrt(F.aggregate(tf, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(
        norm > 0, F.transform(tf, lambda x: x / norm)
    ).otherwise(tf)


def _bucket(token: str, dim: int) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % dim


def embed_text(text: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Driver-side single-text twin of hash_embed_expr (for tests and
    ad-hoc query vectors)."""
    toks = (text or "").lower().split()
    tf = np.zeros(dim, dtype=np.float64)
    if toks:
        np.add.at(tf, [_bucket(t, dim) for t in toks], 1.0)
    n = np.sqrt((tf * tf).sum())
    return tf / n if n > 0 else tf


def hash_embed_pandas(text: Column | str, dim: int = DEFAULT_DIM) -> Column:
    """Same embedding as an Arrow-batched pandas UDF."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(s: pd.Series) -> pd.Series:
        return s.map(lambda t: embed_text(t, dim).tolist())

    return _embed(F.col(text) if isinstance(text, str) else text)
