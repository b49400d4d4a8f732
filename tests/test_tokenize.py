"""M1/M2 unit tests — exact-value tokenisation (reference cooc fixture style,
SURVEY.md §5.1)."""

import pyarrow as pa
import pyarrow.compute as pc

from wsid_ray.stages.tokenize import tokenize_batch, tokenize_column
from wsid_ray.util import filter_list_array, stable_hash64, stable_hash_strings


def _batch(texts, convs=None, turns=None):
    n = len(texts)
    return pa.table({
        "conv_id": pa.array(convs or [f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(turns or list(range(n)), type=pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(texts),
        "tool": pa.array([""] * n),
        "ts": pa.array([0] * n, type=pa.timestamp("us")),
    })


def test_tokenize_exact():
    out = tokenize_column(pa.array([
        "The Jaguar, ran (fast) to the savanna!",
        "a to of in",
        "",
        "under_score stays x9 ab abc",
    ]))
    assert out.to_pylist() == [
        ["jaguar", "ran", "fast", "savanna"],
        [],
        [],
        ["under_score", "stays", "abc"],
    ]


def test_tokenize_batch_appends_columns_text_untouched():
    texts = ["Hello WORLD threeword", "second Turn here"]
    b = _batch(texts)
    out = tokenize_batch(b)
    assert out.column("text").to_pylist() == texts  # byte-identical
    assert out.column("tokens").to_pylist() == [
        ["hello", "world", "threeword"], ["second", "turn", "here"]]
    uids = out.column("turn_uid").to_pylist()
    assert len(set(uids)) == 2


def test_turn_uid_deterministic():
    b = _batch(["one two three"], convs=["convA"], turns=[7])
    u1 = tokenize_batch(b).column("turn_uid").to_pylist()[0]
    u2 = tokenize_batch(b).column("turn_uid").to_pylist()[0]
    assert u1 == u2
    assert u1 == ((stable_hash64("convA") & 0x7FF_FFFF_FFFF) << 20) | 7


def test_stable_hash_strings_matches_scalar():
    vals = ["a", "b", "a", "c"]
    hs = stable_hash_strings(vals)
    assert hs[0] == hs[2] == stable_hash64("a")
    assert hs[1] == stable_hash64("b")


def test_filter_list_array():
    la = pa.array([["a", "bb", "ccc"], [], ["dd", "e"]])
    flat_len = pc.utf8_length(la.flatten())
    mask = pc.greater_equal(flat_len, 2)
    out = filter_list_array(la, mask)
    assert out.to_pylist() == [["bb", "ccc"], [], ["dd"]]
