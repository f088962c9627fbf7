"""Operator-level tests for the text-ETL rewrites: chunker invariants,
sectionizer/caption-pairing semantics on handcrafted block fixtures
(the SURVEY.md §7 hard-part-1 edge cases), and embedder implementation
agreement."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_ai_assistent_spark.operators.caption_pairing import (
    pair_captions_pandas,
    pair_captions_window,
)
from etl_ai_assistent_spark.operators.chunker import (
    fixed_chunks,
    recursive_chunks,
    split_text_recursive,
)
from etl_ai_assistent_spark.operators.embedder import (
    embed_text,
    hash_embed_expr,
    hash_embed_pandas,
)
from etl_ai_assistent_spark.operators.sectionizer import sectionize

# --- chunker ---------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "",
        "short",
        "word " * 500,
        "para one.\n\npara two is rather longer. " * 40,
        "x" * 2500,  # no separators at all -> hard char split
        "a\nb\nc" + " d" * 800,
    ],
)
def test_recursive_chunker_invariants(text):
    size, overlap = 700, 200
    chunks = split_text_recursive(text, size, overlap)
    joined_src = " ".join((text or "").split())
    for c in chunks:
        assert 0 < len(c) <= size
    # coverage: every chunk's content appears; combined tokens cover source
    if text.strip():
        assert chunks, "non-empty text must produce chunks"
        src_tokens = joined_src.split()
        out_tokens = [t for c in chunks for t in c.split()]
        if all(len(t) <= size for t in src_tokens):
            # oversized tokens get hard character-split, so coverage only
            # holds when every token fits a chunk
            assert set(src_tokens) <= set(out_tokens)
        # overlap: consecutive chunks share a suffix/prefix (when split on
        # spaces, the tail of chunk i re-appears at the head of chunk i+1)
        for a, b in zip(chunks, chunks[1:]):
            if " " in a and " " in b:
                assert b.split()[0] in a.split(), (a[-50:], b[:50])


def test_recursive_chunker_spark_matches_local(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(50)
    got = (
        docs.select("doc_id", recursive_chunks("text", 200, 50).alias("chunks"))
        .collect()
    )
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for row in got:
        assert row["chunks"] == split_text_recursive(src[row["doc_id"]], 200, 50)


def test_fixed_chunks_empty_text(spark):
    df = spark.createDataFrame([("",), ("abc",)], ["t"])
    out = df.select(fixed_chunks("t", 10, 2).alias("c")).collect()
    assert out[0]["c"] == []
    assert out[1]["c"] == ["abc"]


# --- sectionizer (G1 edge cases from FIXTURES.md doc_blocks) -----------------

BLOCKS = [
    # doc 1: text before any heading is dropped; two sections
    (1, 1, "preamble text", False),
    (1, 2, "Heading A", True),
    (1, 3, "body a1", False),
    (1, 4, "   ", False),  # whitespace-only dropped
    (1, 5, "body a2", False),
    (1, 6, "Heading B", True),
    (1, 7, "body b1", False),
    # doc 2: heading with no body -> section dropped
    (2, 1, "Heading C", True),
    (2, 2, "Heading D", True),
    (2, 3, "body d1", False),
]


def test_sectionizer_semantics(spark):
    blocks = spark.createDataFrame(
        BLOCKS, "doc_id long, block_idx int, text string, is_heading boolean"
    )
    out = {
        (r["doc_id"], r["title"]): (r["body"], r["n_paras"])
        for r in sectionize(blocks).collect()
    }
    assert out == {
        (1, "Heading A"): ("body a1 body a2", 2),
        (1, "Heading B"): ("body b1", 1),
        (2, "Heading D"): ("body d1", 1),
    }


# --- caption pairing (G2 edge cases) -----------------------------------------

CAP_BLOCKS = [
    # (doc, idx, text, is_caption, is_asset)
    (1, 1, "Table 1: first", True, False),
    (1, 2, "asset after caption", False, True),   # consumes caption 1
    (1, 3, "orphan asset", False, True),          # caption already consumed
    (1, 4, "Figure 2: overwritten", True, False),
    (1, 5, "Figure 3: winner", True, False),      # second caption wins
    (1, 6, "asset after two captions", False, True),
    (1, 7, "Table 4: dangling caption", True, False),  # no asset follows
    (2, 1, "asset with no caption ever", False, True),
]


def _pairs(df):
    return {
        (r["doc_id"], r["asset_block_idx"]): (
            r["caption_block_idx"],
            r["caption_text"],
        )
        for r in df.collect()
    }


EXPECTED_PAIRS = {
    (1, 2): (1, "Table 1: first"),
    (1, 3): (None, None),
    (1, 6): (5, "Figure 3: winner"),
    (2, 1): (None, None),
}


def test_caption_pairing_window_semantics(spark):
    blocks = spark.createDataFrame(
        CAP_BLOCKS,
        "doc_id long, block_idx int, text string, is_caption boolean, is_asset boolean",
    )
    assert _pairs(pair_captions_window(blocks)) == EXPECTED_PAIRS


def test_caption_pairing_pandas_agrees_with_window(spark):
    blocks = spark.createDataFrame(
        CAP_BLOCKS,
        "doc_id long, block_idx int, text string, is_caption boolean, is_asset boolean",
    )
    assert _pairs(pair_captions_pandas(blocks)) == EXPECTED_PAIRS


# --- embedder ------------------------------------------------------------------

def test_hash_embed_expr_matches_pandas_and_local(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(40)
    both = docs.select(
        "doc_id",
        "text",
        hash_embed_expr("text", 32).alias("e_expr"),
        hash_embed_pandas("text", 32).alias("e_pandas"),
    ).collect()
    for r in both:
        assert r["e_expr"] == pytest.approx(r["e_pandas"], abs=1e-12)
        assert r["e_expr"] == pytest.approx(
            embed_text(r["text"], 32).tolist(), abs=1e-12
        )
        norm = sum(x * x for x in r["e_expr"])
        assert norm == pytest.approx(1.0, abs=1e-9)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


if HAVE_HYPOTHESIS:

    @settings(max_examples=200, deadline=None)
    @given(
        text=st.text(alphabet="ab .\n", max_size=2000),
        size=st.integers(min_value=20, max_value=400),
    )
    def test_recursive_chunker_properties(text, size):
        """Property-based invariants (SURVEY.md §7 hard-part 2): for any
        text and chunk size, every chunk fits; non-whitespace text always
        chunks; every source token whose length fits appears in some
        chunk; chunks are deterministic."""
        overlap = size // 3
        chunks = split_text_recursive(text, size, overlap)
        assert chunks == split_text_recursive(text, size, overlap)
        for c in chunks:
            assert 0 < len(c) <= size
        if text.strip():
            assert chunks
            src_tokens = set(t for t in text.split() if len(t) <= size)
            out_tokens = set(t for c in chunks for t in c.split())
            missing = {
                t
                for t in src_tokens
                if t not in out_tokens
                and not any(t in piece for piece in out_tokens)
            }
            assert not missing, missing
        else:
            assert chunks == []
