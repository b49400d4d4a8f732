"""M3/M4 — mention spans and sliding windows (exact values)."""

import pyarrow as pa

from wsid_ray.stages.mentions import MentionDetector
from wsid_ray.stages.tokenize import tokenize_batch


def _turns(texts):
    n = len(texts)
    return tokenize_batch(pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    }))


def test_window_excludes_target_and_respects_bounds():
    det = MentionDetector(window_size=2, gazetteer=("python",))
    out = det(_turns(["aaa bbb python ccc ddd eee"]))
    rows = out.to_pylist()
    assert len(rows) == 1
    m = rows[0]
    assert m["term"] == "python"
    assert m["span_start"] == 2 and m["span_end"] == 3
    assert m["win_tokens"] == ["aaa", "bbb", "ccc", "ddd"]


def test_window_at_turn_edges():
    det = MentionDetector(window_size=3, gazetteer=("python",))
    out = det(_turns(["python aaa", "aaa python"]))
    wins = [r["win_tokens"] for r in out.to_pylist()]
    assert wins == [["aaa"], ["aaa"]]


def test_multiple_mentions_one_turn():
    det = MentionDetector(window_size=1, gazetteer=("python", "jaguar"))
    out = det(_turns(["python aaa jaguar"]))
    rows = sorted(out.to_pylist(), key=lambda r: r["span_start"])
    assert [(r["term"], r["span_start"]) for r in rows] == [
        ("python", 0), ("jaguar", 2)]
    assert rows[0]["win_tokens"] == ["aaa"]
    assert rows[1]["win_tokens"] == ["aaa"]


def test_no_mentions_empty_table_schema_stable():
    det = MentionDetector(window_size=2, gazetteer=("python",))
    out = det(_turns(["nothing here at all"]))
    assert out.num_rows == 0
    assert "win_tokens" in out.schema.names
