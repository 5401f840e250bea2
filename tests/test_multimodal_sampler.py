"""Multimodal stub-stage plumbing + sampler + converter coverage."""

import numpy as np
import pandas as pd
import pytest


def _media_df(n=30, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "media_id": range(n),
        "image": [rng.bytes(rng.integers(200, 4000)) for _ in range(n)],
        "mime": ["image/jpeg"] * n,
    })


def test_image_feature_extractor_deterministic():
    import pyarrow as pa

    from rayssj.multimodal import ImageFeatureExtractor

    df = _media_df()
    batch = pa.Table.from_pandas(df, preserve_index=False)
    ex = ImageFeatureExtractor(col="image", dim=16)
    out1 = ex(batch)
    out2 = ImageFeatureExtractor(col="image", dim=16)(batch)
    assert out1["image_feat"].to_pylist() == out2["image_feat"].to_pylist()
    assert len(out1["image_feat"].to_pylist()[0]) == 16
    assert out1["image_width"].to_pylist()[0] >= 1


def test_media_pipeline_dataset():
    import ray.data as rd

    from rayssj.multimodal import media_pipeline

    ds = rd.from_pandas(_media_df())
    out = media_pipeline(ds, image_col="image", batch_size=8).to_pandas()
    assert {"image_feat", "image_width", "image_height", "image_small"} <= set(out.columns)
    assert all(len(b) == 1024 for b in out["image_small"])


def test_frame_sampler():
    import pyarrow as pa

    from rayssj.multimodal import FrameSampler

    batch = pa.table({"video": [b"x" * 10_000, b"", None]})
    out = FrameSampler(col="video", k=4)(batch)
    frames = out["video_frames"].to_pylist()
    assert len(frames[0]) == 4 and all(len(f) == 256 for f in frames[0])
    assert frames[1] == [] and frames[2] == []


def test_real_video_decoder_clearly_stubbed():
    from rayssj.multimodal import FrameSampler

    with pytest.raises(NotImplementedError):
        FrameSampler(decoder="real")  # no stdlib video codec; PyAV absent


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal bottom-up uncompressed 24-bit BMP encoder."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    off = 14 + 40
    header = (b"BM" + (off + len(pix)).to_bytes(4, "little") + b"\0\0\0\0"
              + off.to_bytes(4, "little"))
    info = ((40).to_bytes(4, "little") + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little") + b"\0" * 24)
    return header + info + pix


def _wav_bytes(x: np.ndarray, sr: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_real_image_decode_ppm_bmp():
    import pyarrow as pa

    from rayssj.multimodal import ImageFeatureExtractor, _decode_bmp, _decode_ppm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert np.array_equal(_decode_ppm(_ppm_bytes(img)), img)
    assert np.array_equal(_decode_bmp(_bmp_bytes(img)), img)

    solid = np.full((20, 30, 3), 200, dtype=np.uint8)
    batch = pa.table({"image": [_ppm_bytes(img), _bmp_bytes(solid), None]})
    out = ImageFeatureExtractor(col="image", dim=16, decoder="real")(batch)
    assert out["image_width"].to_pylist() == [13, 30, 0]
    assert out["image_height"].to_pylist() == [9, 20, 0]
    feats = out["image_feat"].to_pylist()
    # solid 200-gray image: every grid cell is exactly 200/255*2-1
    assert feats[1] == pytest.approx([200 / 255 * 2 - 1] * 16, abs=1e-6)
    assert feats[2] == [0.0] * 16


def test_png_roundtrip_all_filters_and_color_types():
    """Built-in PNG codec (VERDICT r04 next #3): encode→decode must be
    identity for every scanline filter (None/Sub/Up/Average/Paeth, plus
    per-row cycling) across RGB, grayscale and paletted color types,
    including 1×1 and non-square rasters and mod-256 wraparound content."""
    from rayssj.multimodal import _decode_png, encode_png

    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (3, 7), (23, 5), (16, 16)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        gray = np.repeat(img[..., :1], 3, axis=2)
        pal = (rng.integers(0, 6, (h, w, 1), dtype=np.uint8) * 40).repeat(
            3, axis=2)
        for ft in [0, 1, 2, 3, 4, "cycle", None]:
            assert np.array_equal(_decode_png(encode_png(img, 2, ft)), img)
            assert np.array_equal(_decode_png(encode_png(gray, 0, ft)), gray)
            assert np.array_equal(_decode_png(encode_png(pal, 3, ft)), pal)
    # gradient with wraparound (exercises mod-256 prefix sums)
    row = ((200 + np.arange(300)) % 256).astype(np.uint8)
    grad = np.repeat(np.tile(row, (9, 1))[..., None], 3, axis=2)
    for ft in [1, 3, 4, "cycle"]:
        assert np.array_equal(_decode_png(encode_png(grad, 2, ft)), grad)


def test_png_capability_error_and_dispatch():
    """16-bit PNGs are outside the built-in envelope: _decode_image must
    fall through toward Pillow (raising the install hint when absent), while
    8-bit PNGs decode built-in via the signature dispatch. Palette overflow
    in the encoder must raise."""
    import zlib

    from rayssj.multimodal import _decode_image, encode_png

    img = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
    assert np.array_equal(_decode_image(encode_png(img)), img)

    # corrupt bit depth to 16 (re-sign the IHDR CRC so only depth changes)
    buf = bytearray(encode_png(img))
    ihdr = bytes(buf[16:29])
    ihdr16 = ihdr[:8] + bytes([16]) + ihdr[9:]
    buf[16:29] = ihdr16
    buf[29:33] = zlib.crc32(b"IHDR" + ihdr16).to_bytes(4, "big")
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(ValueError, match="install Pillow"):
            _decode_image(bytes(buf))

    rng = np.random.default_rng(1)
    many = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="palette"):
        encode_png(many, color_type=3)


def test_png_feature_extractor_stage():
    """PNG payloads through the actor-pool feature stage: decoded dims and
    the uniform-gray feature must come from the real raster."""
    import pyarrow as pa

    from rayssj.multimodal import ImageFeatureExtractor, encode_png

    solid = np.full((10, 21, 3), 120, dtype=np.uint8)
    batch = pa.table({"image": [encode_png(solid, 2, "cycle"),
                                encode_png(solid, 3, 4), None]})
    out = ImageFeatureExtractor(col="image", dim=16, decoder="real")(batch)
    assert out["image_width"].to_pylist() == [21, 21, 0]
    assert out["image_height"].to_pylist() == [10, 10, 0]
    feats = out["image_feat"].to_pylist()
    assert feats[0] == pytest.approx([120 / 255 * 2 - 1] * 16, abs=1e-6)
    assert feats[0] == feats[1]


def test_real_audio_decode_wav():
    import pyarrow as pa

    from rayssj.multimodal import AudioFeatureExtractor

    sr, dur, freq = 8000, 0.5, 1000.0
    t = np.arange(int(sr * dur)) / sr
    wav = _wav_bytes(0.8 * np.sin(2 * np.pi * freq * t), sr)
    batch = pa.table({"audio": [wav, None]})
    out = AudioFeatureExtractor(col="audio", dim=32, decoder="real")(batch)
    assert out["audio_sample_rate"].to_pylist() == [sr, 0]
    assert out["audio_duration_s"].to_pylist()[0] == pytest.approx(dur, abs=1e-6)
    feats = np.array(out["audio_feat"].to_pylist()[0])
    # 1 kHz sine at 4 kHz Nyquist, 32 bands → energy peaks in band 8
    assert abs(int(np.argmax(feats)) - 8) <= 1


def test_real_image_resizer_roundtrip():
    import pyarrow as pa

    from rayssj.multimodal import ImageResizer, _decode_ppm

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    batch = pa.table({"image": [_bmp_bytes(img), None]})
    out = ImageResizer(col="image", decoder="real", target_wh=(8, 6))(batch)
    small = out["image_small"].to_pylist()
    assert small[1] is None
    dec = _decode_ppm(small[0])
    assert dec.shape == (6, 8, 3)
    # nearest-neighbor: corner pixels survive exactly
    assert np.array_equal(dec[0, 0], img[0, 0])
    assert np.array_equal(dec[-1, -1], img[-1, -1])


def test_jpeg_roundtrip_and_exactness():
    """Built-in baseline JPEG codec: solid colors with the uniform-8 quant
    table round-trip BIT-EXACTLY (the oracle-query configuration); smooth
    and noisy content stays within small quantization error at high quality;
    grayscale and YCbCr 4:4:4 modes both decode."""
    from rayssj.multimodal import _decode_jpeg, encode_jpeg

    q8 = np.full(64, 8)
    for c in (0, 7, 37, 128, 200, 255):
        img = np.full((12, 21, 3), c, dtype=np.uint8)
        assert np.array_equal(_decode_jpeg(encode_jpeg(img, quant_table=q8)),
                              img)
        assert np.array_equal(
            _decode_jpeg(encode_jpeg(img, quant_table=q8, grayscale=True)),
            img)
    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, 64)
    grad = np.clip(np.add.outer(np.zeros(40), x)[..., None]
                   + rng.normal(0, 2, (40, 64, 1)), 0, 255
                   ).astype(np.uint8).repeat(3, axis=2)
    out = _decode_jpeg(encode_jpeg(grad, quality=90))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.mean() < 3 and err.max() < 40
    color = np.zeros((9, 15, 3), np.uint8)
    color[..., 0], color[..., 1], color[..., 2] = 200, 50, 120
    out = _decode_jpeg(encode_jpeg(color, quant_table=q8))
    assert np.abs(out.astype(int) - color.astype(int)).max() <= 2


def test_jpeg_chroma_subsampling():
    """4:2:0 / 4:2:2 encodes exercise the decoder's generic MCU sampling
    loop (the layout real-world JPEGs use): smooth content within
    quantization+subsampling bounds, solid colors bit-exact at q=8."""
    from rayssj.multimodal import _decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 50)
    y = np.linspace(0, 200, 37)
    base = np.add.outer(y, x) / 2
    img = np.stack([base, base[::-1], np.full_like(base, 80)],
                   axis=2).astype(np.uint8)
    for ss in [(2, 2), (2, 1), (1, 2)]:
        out = _decode_jpeg(encode_jpeg(img, quality=92, subsampling=ss))
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() < 3 and err.max() < 25, (ss, err.max())
    solid = np.full((13, 22, 3), 129, np.uint8)
    out = _decode_jpeg(encode_jpeg(solid, quant_table=np.full(64, 8),
                                   subsampling=(2, 2)))
    assert np.array_equal(out, solid)


def test_jpeg_capability_and_dispatch():
    """Progressive JPEGs (SOF2) raise toward Pillow; 8-bit baseline decodes
    built-in via the FFD8 signature dispatch."""
    from rayssj.multimodal import _decode_image, encode_jpeg

    img = np.full((8, 10, 3), 99, dtype=np.uint8)
    buf = encode_jpeg(img, quant_table=np.full(64, 8))
    assert np.array_equal(_decode_image(buf), img)

    # flip the SOF0 marker (FFC0) to SOF2 (FFC2): progressive
    prog = bytearray(buf)
    i = prog.find(b"\xFF\xC0")
    prog[i + 1] = 0xC2
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(ValueError, match="install Pillow"):
            _decode_image(bytes(prog))


def test_real_image_resizer_png_output():
    """out_format='png': decode (PNG in) → resize → PNG re-encode round-trips
    through the built-in codec with exact nearest-neighbor corners."""
    import pyarrow as pa

    from rayssj.multimodal import ImageResizer, _decode_png, encode_png

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    batch = pa.table({"image": [encode_png(img, 2, "cycle"), None]})
    out = ImageResizer(col="image", decoder="real", target_wh=(10, 5),
                       out_format="png")(batch)
    small = out["image_small"].to_pylist()
    assert small[1] is None
    dec = _decode_png(small[0])
    assert dec.shape == (5, 10, 3)
    assert np.array_equal(dec[0, 0], img[0, 0])
    assert np.array_equal(dec[-1, -1], img[-1, -1])


def test_audio_feature_extractor():
    import pyarrow as pa

    from rayssj.multimodal import AudioFeatureExtractor

    batch = pa.table({"audio": [b"\x01\x02" * 16_000, b"", None]})
    out = AudioFeatureExtractor(col="audio", dim=8)(batch)
    feats = out["audio_feat"].to_pylist()
    assert len(feats[0]) == 8
    assert out["audio_duration_s"].to_pylist()[0] == 1.0  # 32k bytes @16kHz
    assert out["audio_sample_rate"].to_pylist() == [16_000] * 3
    # deterministic: same payload → same features
    out2 = AudioFeatureExtractor(col="audio", dim=8)(batch)
    assert out2["audio_feat"].to_pylist() == feats


def test_sample_pairs():
    from rayssj.sampler import sample_pairs
    from rayssj.tokenizers import WhitespaceTokenizer

    from .test_joins import make_tables

    A, B = make_tables(seed=61, with_edge_cases=False)
    out = sample_pairs(A, B, "ID", "ID", "name", "name",
                       WhitespaceTokenizer(), sample_size=10, y_param=4,
                       seed=3).to_pandas()
    # every sampled r gets at most y/2 top + y/2 random l-candidates
    per_r = out.groupby("r_ID").size()
    assert (per_r <= 4).all()
    assert out["l_ID"].isin(set(A["ID"])).all()
    assert out["r_ID"].isin(set(B["ID"])).all()


def test_sample_pairs_deterministic():
    """Same seed → identical output across calls (priorities are stable
    hashes, not Python's per-process-salted hash())."""
    from rayssj.sampler import sample_pairs
    from rayssj.tokenizers import WhitespaceTokenizer

    from .test_joins import make_tables

    A, B = make_tables(seed=61, with_edge_cases=False)
    kw = dict(sample_size=10, y_param=4, seed=3)
    out1 = sample_pairs(A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), **kw).to_pandas()
    out2 = sample_pairs(A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), **kw).to_pandas()
    pd.testing.assert_frame_equal(out1, out2)
    # random fill never duplicates a top pick for the same r
    assert not out1.duplicated().any()


def test_sample_pairs_topk_only():
    """fill=False returns exactly the deterministic top-overlap half: a
    subset of the filled output, at most y/2 rows per r, no randomness."""
    from rayssj.sampler import sample_pairs
    from rayssj.tokenizers import WhitespaceTokenizer

    from .test_joins import make_tables

    A, B = make_tables(seed=61, with_edge_cases=False)
    kw = dict(sample_size=10, y_param=4, seed=3)
    full = sample_pairs(A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), **kw).to_pandas()
    top = sample_pairs(A, B, "ID", "ID", "name", "name",
                       WhitespaceTokenizer(), **kw, fill=False).to_pandas()
    assert (top.groupby("r_ID").size() <= 2).all()  # y/2
    full_set = set(map(tuple, full.itertuples(index=False)))
    assert set(map(tuple, top.itertuples(index=False))) <= full_set
    top2 = sample_pairs(A, B, "ID", "ID", "name", "name",
                        WhitespaceTokenizer(), **kw, fill=False).to_pandas()
    pd.testing.assert_frame_equal(top, top2)


def test_overlap_filter_rejects_unblockable_comp_op():
    from rayssj.filters import OverlapFilter
    from rayssj.tokenizers import WhitespaceTokenizer

    for op in ("<", "<=", "!="):
        with pytest.raises(AssertionError):
            OverlapFilter(WhitespaceTokenizer(), overlap_size=2, comp_op=op)
    OverlapFilter(WhitespaceTokenizer(), overlap_size=2, comp_op=">")


def test_converters():
    import pandas as pd

    from rayssj.converter import dataframe_column_to_str, series_to_str

    df = pd.DataFrame({"a": [1, 2, None], "b": [1.0, 2.5, None],
                       "c": ["x", "y", None]})
    s = series_to_str(df["a"])
    assert s.iloc[0] in ("1", "1.0")  # ints (nullable promotes to float)
    sb = series_to_str(df["b"])
    assert sb.iloc[0] == "1" and sb.iloc[1] == "2.5"
    assert pd.isna(sb.iloc[2])
    out = dataframe_column_to_str(df, "b")
    assert out["b"].iloc[1] == "2.5"
    col = dataframe_column_to_str(df, "b", return_col=True)
    assert col.iloc[0] == "1"
    with pytest.raises(AssertionError):
        dataframe_column_to_str(df, "zz")


def test_dataset_column_to_str():
    import ray.data as rd

    from rayssj.converter import dataset_column_to_str

    ds = rd.from_items([{"k": 1, "v": 3.0}, {"k": 2, "v": 4.5}])
    out = dataset_column_to_str(ds, "v").to_pandas()
    assert list(out["v"]) == ["3", "4.5"]
