"""Pluggable model interface (VERDICT r03 item 7): a custom callable /
import-string model swaps into the langid and embedding stages without
touching stage code; the builtin fakes stay the default."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from wsid_ray.models import resolve_model


def test_resolve_model_forms():
    assert resolve_model(None) is None
    fn = lambda texts: texts  # noqa: E731
    assert resolve_model(fn) is fn
    import math
    assert resolve_model("math:sqrt") is math.sqrt
    # factory form: trailing () invokes once at resolve time
    got = resolve_model("collections:OrderedDict()")
    from collections import OrderedDict
    assert isinstance(got, OrderedDict)
    with pytest.raises(ValueError):
        resolve_model("no-colon")
    with pytest.raises(TypeError):
        resolve_model(123)


def _docs():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["alpha beta", "gamma", "delta epsilon zeta"],
                         type=pa.string()),
    }))


def test_custom_langid_model_swaps_in():
    from wsid_ray.stages.textstats import langid_documents

    def model(texts):
        return (["xx"] * len(texts), [0.25] * len(texts))

    out = langid_documents(_docs(), model=model).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]
    assert set(out["lang_pred"]) == {"xx"}
    assert set(out["lang_score"]) == {0.25}
    # default path still the builtin heuristic (no 'xx' label)
    base = langid_documents(_docs()).to_pandas()
    assert "xx" not in set(base["lang_pred"])


def test_custom_embedding_model_swaps_in():
    from wsid_ray.stages.embed import embed_documents

    def model(texts):
        # deterministic toy model: [n_chars, n_words, 0, 0]
        return np.array([[len(t), len(t.split()), 0.0, 0.0]
                         for t in texts])

    out = {r["vec_id"]: r["embedding"]
           for r in embed_documents(_docs(), dim=4,
                                    model=model).take_all()}
    assert out[1] == [10.0, 2.0, 0.0, 0.0]
    assert out[3] == [18.0, 3.0, 0.0, 0.0]
    # shape contract enforced
    bad = embed_documents(_docs(), dim=7, model=model)
    with pytest.raises(Exception, match="expected"):
        bad.take_all()
