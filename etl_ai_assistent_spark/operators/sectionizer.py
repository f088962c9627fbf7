"""G1 — the sectionizer (reference iter_sections, docx_parser.py:54-86).

The reference walks paragraphs sequentially: a heading starts a new
section, following non-headings accumulate under it, text before the
first heading is dropped, and the section text is the space-joined body.

Spark form is the classic fill-forward-and-group recipe (SURVEY.md §2.4
G1): a running sum of the heading flag over (doc, block order) assigns a
section id in one window pass, then one groupBy builds each section. Both
the window and the aggregation partition by the document key, so
sectionizing N documents is a single hash exchange on doc — no cross-doc
traffic at any scale.

Determinism: body order is restored with array_sort over (block_idx,
text) structs, never relying on collect_list order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sectionize(
    blocks: DataFrame,
    *,
    doc_col: str = "doc_id",
    order_col: str = "block_idx",
    text_col: str = "text",
    is_heading: Column | str = "is_heading",
) -> DataFrame:
    """blocks(doc, order, text, is_heading-ish) -> one row per section:
    (doc, sec_id, title, body, n_paras).

    Mirrors reference semantics: pre-heading text dropped
    (docx_parser.py:82-83), whitespace-only body paragraphs dropped
    (docx_parser.py:68-70), body = space-joined texts in order
    (docx_parser.py:47), sections with no body paragraphs dropped.
    """
    flag = (
        F.col(is_heading).cast("int")
        if isinstance(is_heading, str)
        else is_heading.cast("int")
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = blocks.withColumn("__h", flag).withColumn(
        "sec_id", F.sum("__h").over(w)
    )
    body_ok = (F.col("__h") == 0) & (F.length(F.trim(F.col(text_col))) > 0)
    return (
        staged.filter(F.col("sec_id") > 0)
        .groupBy(doc_col, "sec_id")
        .agg(
            F.max(F.when(F.col("__h") == 1, F.col(text_col))).alias("title"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                body_ok,
                                F.struct(
                                    F.col(order_col).alias("i"),
                                    F.col(text_col).alias("t"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
            ).alias("body"),
            F.sum(body_ok.cast("int")).alias("n_paras"),
        )
        .filter(F.col("n_paras") > 0)
    )
