"""Vector-math column functions — pure built-in Spark SQL expressions.

Everything here stays JVM-side; no Python UDFs in the hot path. NOTE:
higher-order functions (zip_with/aggregate/transform lambdas) evaluate
INTERPRETED on the JVM — they are not whole-stage-codegen'd — and
Catalyst's CollapseProject will re-inline a staged expensive input into
every lambda use site. When a dot/norm feeds many expressions (LSH
signing, minhash), persist() the staged column as a barrier (see
operators/dedup.minhash_bands, operators/similarity.srp_bands); where
profiling shows the interpreter itself is the bottleneck, the
Arrow-batched pandas-UDF twin (operators/embedder.hash_embed_pandas) is
the faster path. All arithmetic is done in DOUBLE regardless of the storage
type (embeddings are stored ARRAY<FLOAT>; float->double widening is exact)
and folds left-to-right, which makes results bit-reproducible and lets the
DuckDB oracle (list_transform + list_reduce, same order, same doubles)
hash-match without tolerance.

Reference semantics covered:
- cosine top-k retrieval math (reference scripts/test.out.py:14-19,
  distance=COSINE per qdrant_service.py:21)
- pad/truncate to fixed dim (embedder_service.py:4-9)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return v.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then left-to-right fold — deterministic order.

    Compiles to ZipWith + ArrayAggregate (interpreted JVM expressions —
    see the module docstring), no shuffle, no UDF.
    """
    prod = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(v: Column | str) -> Column:
    return F.sqrt(dot(v, v))


def l2_normalize(v: Column | str) -> Column:
    """v / ||v||; null-safe for zero vectors (returns nulls, which a
    cosine against them propagates — callers filter on score anyway)."""
    n = norm(v)
    return F.transform(as_double(v), lambda x: x / n)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in [-1, 1]. At write time we L2-normalize stored
    embeddings so cosine degrades to a plain dot product (SURVEY.md §4
    physical-design note); this general form is for ad-hoc inputs."""
    return dot(a, b) / (norm(a) * norm(b))


def pad_truncate(v: Column | str, dim: int) -> Column:
    """P11 (embedder_service.py:6-9): pad with 0.0 to `dim` or truncate.

    Spark arrays are 1-indexed in slice().
    """
    v = F.col(v) if isinstance(v, str) else v
    padded = F.concat(
        v, F.array_repeat(F.lit(0.0).cast("float"), dim - F.size(v))
    )
    return F.when(F.size(v) < dim, padded).otherwise(F.slice(v, 1, dim))
