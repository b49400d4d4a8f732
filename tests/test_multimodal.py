"""Multimodal binary-column plumbing (stubbed codecs, real Ray stages)."""

import numpy as np
import pytest

from wsid_ray.stages.multimodal import (FakeCodec, FrameSampler, ImageResizer,
                                        MediaFeaturizer, featurize,
                                        media_dataset, synth_media_table)


def test_fake_codec_rejects_real_media():
    with pytest.raises(NotImplementedError):
        FakeCodec().decode(b"\x89PNG\r\n\x1a\n....")


def test_synth_deterministic():
    a = synth_media_table(10)
    b = synth_media_table(10)
    assert a.equals(b)


def test_featurize_actor_pool():
    ds = media_dataset(n=60, blocks=2)
    out = featurize(ds, concurrency=(1, 2)).to_pandas()
    assert len(out) == 60
    assert set(out["kind"]) == {"image", "audio", "video"}
    assert (out["n_bytes"] > 0).all()
    # deterministic content hashes
    out2 = featurize(media_dataset(n=60, blocks=2),
                     concurrency=(1, 2)).to_pandas()
    m1 = dict(zip(out["media_id"], out["content_hash"]))
    m2 = dict(zip(out2["media_id"], out2["content_hash"]))
    assert m1 == m2


def test_image_resize():
    t = synth_media_table(9)
    out = ImageResizer(out_w=8, out_h=8)(t)
    df = out.to_pandas()
    imgs = df[df["kind"] == "image"]
    assert (imgs["resized"]).all()
    assert (imgs["width"] == 8).all() and (imgs["height"] == 8).all()
    for p in imgs["payload"]:
        assert len(FakeCodec().decode(p)) == 64
    others = df[df["kind"] != "image"]
    assert (~others["resized"]).all()


def test_frame_sampler_explodes():
    t = synth_media_table(9)
    out = FrameSampler(every_k=2)(t).to_pandas()
    vids = t.to_pandas()
    vids = vids[vids["kind"] == "video"]
    expect = int(sum((nf + 1) // 2 for nf in vids["n_frames"]))
    assert len(out) == expect
    assert (out["frame_idx"] % 2 == 0).all()
    w, h = 16, 16
    for p in out["payload"].head(3):
        assert len(FakeCodec().decode(p)) == w * h


def test_fake_embedder_shape_and_determinism():
    """Batched-inference actor-pool stage: stable dims, deterministic
    vectors, duplicate texts embed identically."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from wsid_ray.stages.embed import embed_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta gamma", ""]),
    }))
    out = {r["vec_id"]: r["embedding"]
           for r in embed_documents(docs, dim=16).take_all()}
    assert set(out) == {0, 1, 2}
    assert all(len(v) == 16 for v in out.values())
    assert out[0] == out[1]              # identical text -> identical vector
    assert sum(out[2]) == 0.0            # token-less doc -> zero vector
    assert sum(out[0]) == 3.0            # occurrence-weighted histogram


def test_codec_capability_dispatch():
    """get_codec routes to the real codec class when the capability is
    present and falls back to FakeCodec when it is not."""
    from wsid_ray.stages.multimodal import (CODEC_CAPABILITIES, AvVideoCodec,
                                            FakeCodec, PilImageCodec,
                                            SoundfileAudioCodec, get_codec)
    # this container has no codec libraries -> probe must be empty and the
    # default dispatch must be the declared stub
    assert CODEC_CAPABILITIES == {}
    assert isinstance(get_codec("image"), FakeCodec)
    # injected capabilities select the real implementations per kind
    caps = {"image": "pil", "audio": "soundfile", "video": "av"}
    assert isinstance(get_codec("image", caps), PilImageCodec)
    assert isinstance(get_codec("audio", caps), SoundfileAudioCodec)
    assert isinstance(get_codec("video", caps), AvVideoCodec)
    assert isinstance(get_codec("unknown", caps), FakeCodec)


def test_real_codecs_pass_synthetic_payloads_through():
    """Synthetic payloads decode identically under every codec, so
    pipelines behave the same with or without the libraries installed."""
    import numpy as np

    from wsid_ray.stages.multimodal import (AvVideoCodec, FakeCodec,
                                            PilImageCodec,
                                            SoundfileAudioCodec,
                                            synth_media_table)
    t = synth_media_table(6)
    payload = t["payload"][0].as_py()
    want = FakeCodec().decode(payload)
    for codec in (PilImageCodec(), SoundfileAudioCodec(), AvVideoCodec()):
        assert (codec.decode(payload) == want).all()
    assert isinstance(want, np.ndarray)
