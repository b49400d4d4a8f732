"""Multimodal binary columns: builtin real-format codecs (Netpbm/BMP/
WAV/Y4M, pure numpy+stdlib), capability dispatch, and the Ray stages."""

import numpy as np
import pytest

from wsid_ray.stages.multimodal import (BuiltinAudioCodec, BuiltinImageCodec,
                                        BuiltinVideoCodec, FakeCodec,
                                        FrameSampler, ImageResizer,
                                        MediaFeaturizer, decode_bmp24,
                                        decode_netpbm, decode_wav, decode_y4m,
                                        encode_bmp24, encode_pgm, encode_ppm,
                                        encode_wav_pcm16, encode_y4m,
                                        featurize, media_dataset,
                                        synth_media_table)


def test_fake_codec_rejects_real_media():
    with pytest.raises(NotImplementedError):
        FakeCodec().decode(b"\x89PNG\r\n\x1a\n....")


# ---------------------------------------------------------------------------
# builtin format roundtrips (real public formats, no libraries)
# ---------------------------------------------------------------------------

def test_pgm_roundtrip_and_comment_header():
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    assert (decode_netpbm(encode_pgm(img)) == img.ravel()).all()
    # spec allows comments + arbitrary whitespace inside the header
    weird = b"P5 # comment\n# another\n 7\t5 #w h\n255\n" + img.tobytes()
    assert (decode_netpbm(weird) == img.ravel()).all()


def test_ppm_roundtrip():
    img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    assert (decode_netpbm(encode_ppm(img)) == img.ravel()).all()


def test_bmp24_roundtrip_padding():
    # w=3 -> 9-byte rows padded to 12: exercises stride logic
    img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_bmp24(encode_bmp24(img)) == img.ravel()).all()
    with pytest.raises(NotImplementedError):
        # 8-bit BMP header (bitcount at offset 28 set to 8)
        bad = bytearray(encode_bmp24(img))
        bad[28] = 8
        decode_bmp24(bytes(bad))


def test_wav_roundtrip():
    samples = (np.arange(100) * 257 - 12000).astype("<i2")
    payload = encode_wav_pcm16(samples, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out = decode_wav(payload)
    assert (out.view("<i2") == samples).all()


def test_y4m_roundtrip():
    frames = np.arange(4 * 6 * 8, dtype=np.uint8).reshape(4, 6, 8)
    payload = encode_y4m(frames)
    assert payload[:9] == b"YUV4MPEG2"
    assert (decode_y4m(payload) == frames.ravel()).all()


def test_png_roundtrip_grey_and_rgb():
    from wsid_ray.stages.multimodal import decode_png, encode_png
    grey = np.arange(35, dtype=np.uint8).reshape(5, 7)
    assert (decode_png(encode_png(grey)) == grey.ravel()).all()
    rgb = (np.arange(36, dtype=np.uint8) * 7 % 256).reshape(3, 4,
                                                            3).astype(np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb.ravel()).all()
    # dispatches through the builtin image codec
    assert (BuiltinImageCodec().decode(encode_png(grey))
            == grey.ravel()).all()


def test_png_filter_reconstruction_all_types():
    """Hand-filter scanlines with each of sub/up/average/Paeth and check
    the decoder reconstructs the original raster."""
    import struct
    import zlib

    from wsid_ray.stages.multimodal import decode_png
    rng = np.random.RandomState(3)
    h, w, ch = 5, 6, 3
    img = rng.randint(0, 256, (h, w * ch)).astype(np.int64)

    def paeth(a, b, c):
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

    raw = b""
    prev = np.zeros(w * ch, dtype=np.int64)
    for y, f in zip(range(h), (0, 1, 2, 3, 4)):
        line = img[y]
        filt = np.empty(w * ch, dtype=np.int64)
        for i in range(w * ch):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                    4: paeth(a, b, c)}[f]
            filt[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + filt.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0,
                                            0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert (decode_png(payload) == img.ravel().astype(np.uint8)).all()


def test_png_palette_expands_to_rgb():
    import struct
    import zlib

    from wsid_ray.stages.multimodal import decode_png
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])   # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0,
                                            0, 0))
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert decode_png(payload).tolist() == [
        255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0]


def test_builtin_codecs_reject_compressed():
    # progressive JPEG (SOF2) stays library-tier; baseline decodes (r5)
    import struct
    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    with pytest.raises(NotImplementedError):
        BuiltinImageCodec().decode(sof2)
    with pytest.raises(NotImplementedError):
        BuiltinImageCodec().decode(b"RIFFxxxxWEBPVP8 ....")  # WebP
    with pytest.raises(NotImplementedError):
        BuiltinAudioCodec().decode(b"fLaC....")
    with pytest.raises(NotImplementedError):
        BuiltinVideoCodec().decode(b"\x00\x00\x00 ftypmp42....")
    with pytest.raises(NotImplementedError):
        # y4m with chroma needs PyAV
        BuiltinVideoCodec().decode(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n\0\0\0\0")


def test_synth_deterministic_and_format_invariant():
    from wsid_ray.stages.multimodal import _synth_media_rows
    a = synth_media_table(10)
    b = synth_media_table(10)
    assert a.equals(b)
    # decoded bytes == the row's declared expected decode: identical to
    # the raw body for lossless containers, the encoder reconstruction
    # for the (lossy) JPEG rows
    n = 18
    rows = list(_synth_media_rows(n))
    fake = synth_media_table(n, fmt="fake")
    for i, r in enumerate(rows):
        dec = {"image": BuiltinImageCodec, "audio": BuiltinAudioCodec,
               "video": BuiltinVideoCodec}[r["kind"]]()
        got = dec.decode(r["payload"])
        assert got.tobytes() == r["expected"]
        is_jpeg = r["payload"][:2] == b"\xff\xd8"
        body = FakeCodec().decode(fake["payload"][i].as_py())
        if not is_jpeg:
            assert (got == body).all()
        else:   # lossy but close: mean abs err under the q75 tables
            import numpy as np
            assert len(got) == len(body)
            assert np.mean(np.abs(got.astype(int)
                                  - body.astype(int))) < 80
    assert any(r["payload"][:2] == b"\xff\xd8" for r in rows)


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
        assert p[:2] == b"P5"                  # real container out
        assert len(decode_netpbm(p)) == 64
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
        assert p[:2] == b"P5"                  # frames come out as PGM
        assert len(decode_netpbm(p)) == w * h


def test_fake_embedder_shape_and_determinism():
    """Batched-inference actor-pool stage: stable dims, deterministic
    vectors, duplicate texts embed identically."""
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
    """get_codec: library codec when the capability says so, builtin
    real-format codec otherwise, FakeCodec for unknown kinds."""
    from wsid_ray.stages.multimodal import (CODEC_CAPABILITIES, AvVideoCodec,
                                            PilImageCodec,
                                            SoundfileAudioCodec, get_codec)
    # this container ships no codec libraries -> every kind probes builtin
    assert CODEC_CAPABILITIES == {"image": "builtin", "audio": "builtin",
                                  "video": "builtin"}
    assert isinstance(get_codec("image"), BuiltinImageCodec)
    assert isinstance(get_codec("audio"), BuiltinAudioCodec)
    assert isinstance(get_codec("video"), BuiltinVideoCodec)
    # injected capabilities select the library implementations per kind
    caps = {"image": "pil", "audio": "soundfile", "video": "av"}
    assert isinstance(get_codec("image", caps), PilImageCodec)
    assert isinstance(get_codec("audio", caps), SoundfileAudioCodec)
    assert isinstance(get_codec("video", caps), AvVideoCodec)
    assert isinstance(get_codec("unknown", caps), FakeCodec)
    # explicitly emptied capabilities fall through to the stub
    assert isinstance(get_codec("image", {}), FakeCodec)


def test_real_codecs_pass_synthetic_payloads_through():
    """Legacy _MAGIC payloads decode identically under every codec tier,
    so pipelines behave the same with or without the libraries."""
    from wsid_ray.stages.multimodal import (AvVideoCodec, PilImageCodec,
                                            SoundfileAudioCodec)
    t = synth_media_table(6, fmt="fake")
    payload = t["payload"][0].as_py()
    want = FakeCodec().decode(payload)
    for codec in (PilImageCodec(), SoundfileAudioCodec(), AvVideoCodec(),
                  BuiltinImageCodec(), BuiltinAudioCodec(),
                  BuiltinVideoCodec()):
        assert (codec.decode(payload) == want).all()
    assert isinstance(want, np.ndarray)


# ---------------------------------------------------------------------------
# GIF (LZW) builtin codec
# ---------------------------------------------------------------------------

def _lzw_encode_real(indices, min_size):
    """A REAL GIF-LZW compressor (dictionary growth, width bumps) so the
    decoder's table-growth and KwKwK paths get exercised — the module's
    test encoder intentionally emits only literal codes."""
    clear, end = 1 << min_size, (1 << min_size) + 1
    codes = [clear]
    table = {bytes((i,)): i for i in range(clear)}
    nxt = end + 1
    width = min_size + 1
    run = b""
    widths = []          # width AT EMISSION time, for the packer
    for v in indices:
        cand = run + bytes((int(v),))
        if cand in table:
            run = cand
            continue
        codes.append(table[run])
        widths.append(width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        run = bytes((int(v),))
    if run:
        codes.append(table[run])
        widths.append(width)
    codes.append(end)
    widths.append(width)
    widths = [min_size + 1] + widths   # the leading CLEAR
    acc = nbits = 0
    out = bytearray()
    for c, wd in zip(codes, widths):
        acc |= c << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_roundtrip_trivial_encoder():
    import numpy as np

    from wsid_ray.stages.multimodal import decode_gif, encode_gif
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 6, (11, 13)).astype(np.uint8)
    pal = rng.randint(0, 256, (6, 3)).astype(np.uint8)
    got = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(got, pal[idx.ravel()].ravel())


def test_gif_decode_real_lzw_stream():
    """Hand-built GIF with a REAL LZW stream (repetitive data → long
    dictionary entries, width growth) decodes exactly."""
    import struct

    import numpy as np

    from wsid_ray.stages.multimodal import decode_gif
    w, h = 32, 8
    idx = np.tile(np.array([0, 0, 1, 1, 2, 2, 3, 3], np.uint8), w * h // 8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    min_size = 2
    data = _lzw_encode_real(idx.tolist(), min_size)
    gct = np.zeros((4, 3), np.uint8)
    gct[:4] = pal
    buf = bytearray(b"GIF89a")
    buf += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)
    buf += gct.tobytes()
    # a graphic-control extension the decoder must skip
    buf += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    buf.append(min_size)
    for i in range(0, len(data), 255):
        block = data[i:i + 255]
        buf.append(len(block))
        buf += block
    buf += b"\x00\x3b"
    got = decode_gif(bytes(buf))
    assert np.array_equal(got, pal[idx].ravel())


def test_builtin_codec_routes_gif():
    import numpy as np

    from wsid_ray.stages.multimodal import (BuiltinImageCodec,
                                            decode_gif, encode_gif)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    pal = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    payload = encode_gif(idx, pal)
    got = BuiltinImageCodec().decode(payload)
    assert np.array_equal(got, decode_gif(payload))
