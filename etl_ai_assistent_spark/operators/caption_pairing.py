"""G2 — caption→asset pairing (reference extract_assets,
docx_parser.py:166-197).

Reference semantics (imperative state machine):
- remember the most recent caption; a later caption overwrites an
  unconsumed one (docx_parser.py:178-181);
- the next asset block consumes the remembered caption, which is then
  cleared (docx_parser.py:183-196) — so ONE asset per caption;
- an asset with no pending caption gets no caption (falls back to a
  default name downstream); a caption never followed by an asset is
  dropped.

Two implementations:

- ``pair_captions_window`` — declarative twin: for every asset, take the
  last preceding caption (last ignorenulls over block order), then keep
  only the FIRST asset per caption (row_number). Equivalent to the state
  machine for the above cases; one window pass partitioned by doc, no
  cross-doc shuffle. The oracle-checkable scale path.
- ``pair_captions_pandas`` — applyInPandas per document running the
  literal sequential algorithm; docs are KB-sized so per-doc pandas is
  safe at any corpus scale (SURVEY.md §7 hard-part 1). Ground truth for
  tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pair_captions_window(
    blocks: DataFrame,
    *,
    doc_col: str = "doc_id",
    order_col: str = "block_idx",
) -> DataFrame:
    """blocks(doc, order, text, is_caption BOOLEAN, is_asset BOOLEAN) ->
    (doc, asset_block_idx, caption_block_idx, caption_text); assets with
    no preceding caption keep nulls."""
    w = (
        Window.partitionBy(doc_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cap = F.when(
        F.col("is_caption"),
        F.struct(F.col(order_col).alias("i"), F.col("text").alias("t")),
    )
    with_cap = blocks.withColumn(
        "__cap", F.last(cap, ignorenulls=True).over(w)
    )
    assets = with_cap.filter(F.col("is_asset"))
    # clear-after-match: only the first asset after a caption consumes it
    w_first = Window.partitionBy(doc_col, F.col("__cap.i")).orderBy(order_col)
    return (
        assets.withColumn("__rn", F.row_number().over(w_first))
        .withColumn(
            "__use", F.col("__cap").isNotNull() & (F.col("__rn") == 1)
        )
        .select(
            F.col(doc_col),
            F.col(order_col).alias("asset_block_idx"),
            F.when(F.col("__use"), F.col("__cap.i")).alias("caption_block_idx"),
            F.when(F.col("__use"), F.col("__cap.t")).alias("caption_text"),
        )
    )


def pair_captions_pandas(
    blocks: DataFrame,
    *,
    doc_col: str = "doc_id",
    order_col: str = "block_idx",
) -> DataFrame:
    """Literal sequential state machine, one pandas group per document."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        out = []
        pending: tuple[int, str] | None = None
        for row in pdf.itertuples(index=False):
            d = row._asdict()
            if d["is_caption"]:
                pending = (d[order_col], d["text"])  # later caption overwrites
            elif d["is_asset"]:
                out.append(
                    {
                        doc_col: d[doc_col],
                        "asset_block_idx": d[order_col],
                        "caption_block_idx": pending[0] if pending else None,
                        "caption_text": pending[1] if pending else None,
                    }
                )
                pending = None  # consumed
        return pd.DataFrame(
            out,
            columns=[doc_col, "asset_block_idx", "caption_block_idx", "caption_text"],
        )

    schema = (
        f"{doc_col} long, asset_block_idx int, "
        "caption_block_idx int, caption_text string"
    )
    return blocks.groupBy(doc_col).applyInPandas(run, schema=schema)
