"""Source robustness: the S5 JSON dataset reader must degrade
predictably on imperfect input (missing fields -> NULLs, extra fields
ignored) — schema-on-read at the ingest boundary, never a crash."""

from __future__ import annotations

import json

from etl_ai_assistent_spark import io


def test_json_dataset_missing_and_extra_fields(spark, tmp_path):
    rows = [
        {  # complete
            "question": "q1",
            "answer": "a1",
            "ground_truth": "g1",
            "contexts": ["c1", "c2"],
        },
        {"question": "q2", "answer": "a2"},  # missing fields -> NULL
        {  # extra field ignored by the explicit schema
            "question": "q3",
            "answer": "a3",
            "ground_truth": "g3",
            "contexts": [],
            "unexpected": {"nested": 1},
        },
    ]
    path = str(tmp_path / "qa.json")
    with open(path, "w") as f:
        json.dump(rows, f)
    df = io.read_json_dataset(spark, path)
    got = {r["question"]: r for r in df.collect()}
    assert set(got) == {"q1", "q2", "q3"}
    assert got["q1"]["contexts"] == ["c1", "c2"]
    assert got["q2"]["ground_truth"] is None and got["q2"]["contexts"] is None
    assert got["q3"]["contexts"] == []
    assert df.columns == ["question", "answer", "ground_truth", "contexts"]
