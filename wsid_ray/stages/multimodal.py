"""Multimodal columns — image/audio/video as opaque binary columns with
typed metadata (task spec: "treat image/audio/video as opaque binary
columns ... implement decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages").

Decode is PLUGGABLE via capability detection (``get_codec``): when
Pillow / soundfile / PyAV are importable, their real codecs are selected
per kind; otherwise the clearly marked ``FakeCodec`` stub takes over,
which decodes only this module's own deterministic synthetic payloads
(header + seeded bytes) and raises ``NotImplementedError`` for real
media.  This container ships none of the codec libraries, so the real
paths are exercised only through the dispatch tests; everything around
them — the Arrow schema (binary + metadata columns), the actor-pool
stage shape (decoder constructed once per actor in ``__init__``),
small-batch sizing for large payloads, and the
feature/resize/frame-sample output layout — is the real 100 TB plumbing
and is tested.

Schema:
    media(media_id:int64, kind:string, payload:binary,
          width:int32, height:int32, sample_rate:int32, n_frames:int32)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])

_MAGIC = b"WSIDFAKE"


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        w, h, sr, nf = 0, 0, 0, 0
        if kind == "image":
            w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
            body = rng.randint(0, 256, w * h, dtype=np.int64).astype(np.uint8)
        elif kind == "audio":
            sr = 16000
            nf = int(rng.randint(100, 1000))
            body = rng.randint(0, 256, nf * 2, dtype=np.int64).astype(np.uint8)
        else:
            w, h, nf = 16, 16, int(rng.randint(4, 12))
            body = rng.randint(0, 256, w * h * nf,
                               dtype=np.int64).astype(np.uint8)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(_MAGIC + bytes(body))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(sr)
        rows["n_frames"].append(nf)
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "kind": pa.array(rows["kind"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.binary()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
        "sample_rate": pa.array(rows["sample_rate"], type=pa.int32()),
        "n_frames": pa.array(rows["n_frames"], type=pa.int32()),
    })


class FakeCodec:
    """STUB decoder (fallback). Only this module's synthetic payloads
    decode; real media raises.  Selected by ``get_codec`` when the kind's
    codec library is absent (as in this container)."""

    def decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(_MAGIC):
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; FakeCodec only decodes synth_media "
                "payloads")
        return np.frombuffer(payload, dtype=np.uint8,
                             offset=len(_MAGIC))


def _synth_or(payload: bytes, real_decode) -> np.ndarray:
    """Synthetic payloads decode identically under every codec (so tests
    and fixtures behave the same with or without libraries); anything
    else goes to the real decoder."""
    if payload.startswith(_MAGIC):
        return np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC))
    return real_decode(payload)


class PilImageCodec:
    """Real image decode via Pillow (selected when importable)."""

    def decode(self, payload: bytes) -> np.ndarray:
        def real(p: bytes) -> np.ndarray:
            import io

            from PIL import Image
            img = Image.open(io.BytesIO(p))
            return np.asarray(img, dtype=np.uint8).ravel()
        return _synth_or(payload, real)


class SoundfileAudioCodec:
    """Real audio decode via soundfile (selected when importable)."""

    def decode(self, payload: bytes) -> np.ndarray:
        def real(p: bytes) -> np.ndarray:
            import io

            import soundfile as sf
            data, _sr = sf.read(io.BytesIO(p), dtype="int16")
            return np.asarray(data, dtype=np.int16).view(np.uint8)
        return _synth_or(payload, real)


class AvVideoCodec:
    """Real video frame decode via PyAV (selected when importable)."""

    def decode(self, payload: bytes) -> np.ndarray:
        def real(p: bytes) -> np.ndarray:
            import io

            import av
            frames = []
            with av.open(io.BytesIO(p)) as container:
                for frame in container.decode(video=0):
                    frames.append(frame.to_ndarray(format="gray"))
            return np.concatenate([f.ravel() for f in frames]).astype(
                np.uint8) if frames else np.zeros(0, dtype=np.uint8)
        return _synth_or(payload, real)


def _detect_codecs() -> dict[str, str]:
    """Importability probe, once per process — which kinds have a real
    decoder available in this environment."""
    caps: dict[str, str] = {}
    try:
        import PIL.Image  # noqa: F401
        caps["image"] = "pil"
    except ImportError:
        pass
    try:
        import soundfile  # noqa: F401
        caps["audio"] = "soundfile"
    except ImportError:
        pass
    try:
        import av  # noqa: F401
        caps["video"] = "av"
    except ImportError:
        pass
    return caps


CODEC_CAPABILITIES = _detect_codecs()

_REAL_CODECS = {"pil": PilImageCodec, "soundfile": SoundfileAudioCodec,
                "av": AvVideoCodec}


def get_codec(kind: str, capabilities: dict[str, str] | None = None):
    """Capability dispatch: the kind's real codec when its library is
    importable, FakeCodec otherwise.  ``capabilities`` is injectable for
    tests; defaults to the import-probe result."""
    caps = CODEC_CAPABILITIES if capabilities is None else capabilities
    impl = caps.get(kind)
    cls = _REAL_CODECS.get(impl) if impl else None
    return cls() if cls is not None else FakeCodec()


class MediaFeaturizer:
    """Actor-pool stage: decode + per-item feature extraction.

    State (once per actor, ray_guide.md L109-131): the codec.  Batches are
    kept SMALL (caller passes batch_size<=64) because payloads are large —
    batch bytes x pool concurrency must fit the worker heap.
    Output: (media_id, kind, n_bytes, mean_val, content_hash).
    """

    def __init__(self):
        # per-kind capability dispatch (real codec when importable,
        # FakeCodec fallback) — built once per actor/process
        self.codecs = {k: get_codec(k)
                       for k in ("image", "audio", "video")}

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"].to_pylist()
        kinds = t["kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        n_bytes, means, hashes = [], [], []
        for kind, p in zip(kinds, payloads):
            arr = self.codecs[kind].decode(p)
            n_bytes.append(len(arr))
            means.append(round(float(arr.mean()) if len(arr) else 0.0, 6))
            hashes.append(hashlib.blake2b(arr.tobytes(),
                                          digest_size=8).hexdigest())
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "n_bytes": pa.array(n_bytes, type=pa.int64()),
            "mean_val": pa.array(means, type=pa.float64()),
            "content_hash": pa.array(hashes, type=pa.string()),
        })


class ImageResizer:
    """Actor-pool stage: nearest-neighbour resize of decoded image bytes
    to (out_w, out_h); passes non-images through untouched with
    resized=False."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.codec = get_codec("image")
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payload, resized = [], []
        for kind, payload, w, h in zip(t["kind"].to_pylist(),
                                       t["payload"].to_pylist(),
                                       t["width"].to_pylist(),
                                       t["height"].to_pylist()):
            if kind != "image" or not w or not h:
                out_payload.append(payload)
                resized.append(False)
                continue
            img = self.codec.decode(payload).reshape(h, w)
            yi = (np.arange(self.out_h) * h // self.out_h)
            xi = (np.arange(self.out_w) * w // self.out_w)
            small = img[np.ix_(yi, xi)]
            out_payload.append(_MAGIC + small.tobytes())
            resized.append(True)
        t = t.set_column(t.schema.get_field_index("payload"), "payload",
                         pa.array(out_payload, type=pa.binary()))
        t = t.set_column(t.schema.get_field_index("width"), "width",
                         pa.array([self.out_w if r else w for r, w in
                                   zip(resized, t["width"].to_pylist())],
                                  type=pa.int32()))
        t = t.set_column(t.schema.get_field_index("height"), "height",
                         pa.array([self.out_h if r else h for r, h in
                                   zip(resized, t["height"].to_pylist())],
                                  type=pa.int32()))
        return t.append_column("resized", pa.array(resized, type=pa.bool_()))


class FrameSampler:
    """Actor-pool stage: every-k-th frame from video payloads, exploded to
    one row per sampled frame (flat-map shaped map_batches)."""

    def __init__(self, every_k: int = 2):
        self.codec = get_codec("video")
        self.every_k = every_k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, payloads = [], [], []
        for mid, kind, payload, w, h, nf in zip(
                t["media_id"].to_pylist(), t["kind"].to_pylist(),
                t["payload"].to_pylist(), t["width"].to_pylist(),
                t["height"].to_pylist(), t["n_frames"].to_pylist()):
            if kind != "video":
                continue
            vid = self.codec.decode(payload).reshape(nf, h, w)
            for f in range(0, nf, self.every_k):
                ids.append(mid)
                frames.append(f)
                payloads.append(_MAGIC + vid[f].tobytes())
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frames, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        })


def media_dataset(n: int = 300, seed: int = 42,
                  blocks: int = 4) -> rd.Dataset:
    return rd.from_arrow(synth_media_table(n, seed)).repartition(blocks)


def featurize(media: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    return media.map_batches(MediaFeaturizer, batch_format="pyarrow",
                             batch_size=64,  # large binary payloads
                             concurrency=concurrency, num_cpus=1)
