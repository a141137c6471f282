"""Real multimodal codecs (pure-numpy BMP / PCM-WAV) + actor stages."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cdx_toolkit_ray.stages.multimodal import (
    BmpDecoder, ImageResizer, WavStats, decode_bmp, decode_wav,
    encode_bmp, encode_wav, real_media_table, resize_nearest)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_bmp_roundtrip_with_padding():
    rng = np.random.RandomState(1)
    for w, h in [(20, 13), (7, 5), (4, 1), (33, 2)]:
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), (w, h)


def test_wav_roundtrip():
    rng = np.random.RandomState(2)
    s = rng.randint(-32768, 32768, 777).astype(np.int16)
    rate, s2 = decode_wav(encode_wav(s, 22050))
    assert rate == 22050 and (s2 == s).all()


def test_resize_nearest_known_map():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    r = resize_nearest(px, 4, 4)
    assert (r == px[::2][:, ::2]).all()
    up = resize_nearest(px, 16, 16)
    assert up.shape == (16, 16, 3)
    # upsample replicates: every source pixel appears exactly 4x
    assert (up[::2][:, ::2] == px).all() and (up[1::2][:, 1::2] == px).all()


def test_bmp_decoder_stage_matches_numpy():
    t = real_media_table(32, 42)
    img = t.filter(pa.compute.equal(t["media_type"], "image"))
    got = ray.data.from_arrow(img).map_batches(
        BmpDecoder, batch_format="pyarrow", batch_size=8,
        concurrency=2).to_pandas().set_index("media_id")
    for mid, p in zip(img["media_id"].to_pylist(),
                      img["payload"].to_pylist()):
        px = decode_bmp(p)
        assert got.loc[mid, "width"] == px.shape[1]
        assert got.loc[mid, "height"] == px.shape[0]
        assert got.loc[mid, "px_sum"] == px.sum(dtype=np.int64)
        lum = px.sum(axis=2, dtype=np.int64) // 3
        want = np.bincount((lum >> 4).ravel(), minlength=16)
        assert (np.array(got.loc[mid, "lum_hist"]) == want).all()


def test_image_resizer_stage_roundtrip():
    t = real_media_table(16, 42)
    img = t.filter(pa.compute.equal(t["media_type"], "image"))
    out = ray.data.from_arrow(img).map_batches(
        ImageResizer, fn_constructor_kwargs={"out_w": 8, "out_h": 6},
        batch_format="pyarrow", batch_size=8, concurrency=2).to_pandas()
    src = {m: p for m, p in zip(img["media_id"].to_pylist(),
                                img["payload"].to_pylist())}
    for _, r in out.iterrows():
        px = decode_bmp(r.payload)
        assert px.shape == (6, 8, 3)
        want = resize_nearest(decode_bmp(src[r.media_id]), 8, 6)
        assert (px == want).all()


def test_wav_stats_stage_matches_numpy():
    t = real_media_table(32, 42)
    aud = t.filter(pa.compute.equal(t["media_type"], "audio"))
    got = ray.data.from_arrow(aud).map_batches(
        WavStats, batch_format="pyarrow", batch_size=8, concurrency=2) \
        .to_pandas().set_index("media_id")
    for mid, p in zip(aud["media_id"].to_pylist(),
                      aud["payload"].to_pylist()):
        rate, s = decode_wav(p)
        a = np.abs(s.astype(np.int64))
        assert got.loc[mid, "sample_rate"] == rate
        assert got.loc[mid, "n_samples"] == len(s)
        assert got.loc[mid, "sum_abs"] == a.sum()
        assert got.loc[mid, "peak"] == a.max()


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")


def test_sniff_batch_magic_bytes():
    from cdx_toolkit_ray.stages.multimodal import (encode_bmp,
                                                   encode_wav,
                                                   sniff_batch)

    bmp = encode_bmp(np.zeros((2, 4, 3), np.uint8))
    wav = encode_wav(np.zeros(4, np.int16), 8000)
    batch = pa.table({
        "payload": pa.array([
            bmp, wav, b"<html><body>x</body></html>",
            b"  \r\n\t<!DOCTYPE html>", b"\x00\x01garbage", b"",
            b"RIFFxxxxAVI ",          # RIFF but not WAVE
        ], pa.binary()),
    })
    got = sniff_batch(batch)["sniffed_type"].to_pylist()
    assert got == ["image/bmp", "audio/wav", "text/html", "text/html",
                   "application/octet-stream",
                   "application/octet-stream",
                   "application/octet-stream"]


def test_sniff_batch_sliced_nulls_and_buffer_offsets():
    """The vectorized prefix gather must honor array slices (nonzero
    offset into shared buffers) and nulls — the regression for the old
    per-row as_py() path."""
    from cdx_toolkit_ray.stages.multimodal import sniff_batch

    payloads = [b"BM" + b"\x00" * 50, None, b"<html>", b"",
                b"RIFF1234WAVEdata", b"xxxBM"]
    batch = pa.table({"payload": pa.array(payloads, pa.binary())})
    sliced = batch.slice(1, 4)         # nonzero offset window
    got = sniff_batch(sliced)["sniffed_type"].to_pylist()
    assert got == ["application/octet-stream", "text/html",
                   "application/octet-stream", "audio/wav"]
    full = sniff_batch(batch)["sniffed_type"].to_pylist()
    assert full == ["image/bmp", "application/octet-stream",
                    "text/html", "application/octet-stream",
                    "audio/wav", "application/octet-stream"]


def _scalar_unfilter(scanlines, w, h, bpp):
    import numpy as np

    out = [[0] * (w * bpp) for _ in range(h)]
    for y, (f, line) in enumerate(scanlines):
        for i in range(w * bpp):
            a = out[y][i - bpp] if i >= bpp else 0
            b = out[y - 1][i] if y else 0
            c = out[y - 1][i - bpp] if (y and i >= bpp) else 0
            x = line[i]
            if f == 0:
                r = x
            elif f == 1:
                r = (x + a) % 256
            elif f == 2:
                r = (x + b) % 256
            elif f == 3:
                r = (x + (a + b) // 2) % 256
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else \
                    (b if pb <= pc_ else c)
                r = (x + pred) % 256
            out[y][i] = r
    import numpy as np
    return np.array(out, np.uint8)


def _build_png(scanlines, w, h, color):
    import struct
    import zlib

    from cdx_toolkit_ray.stages.multimodal import _PNG_SIG, _png_chunk

    raw = b"".join(bytes([f]) + bytes(s) for f, s in scanlines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_png_roundtrip_gray_and_rgb():
    import numpy as np

    from cdx_toolkit_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(0)
    for shape in [(8, 8), (10, 13), (1, 1), (5, 7, 3), (16, 3, 3)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        assert (decode_png(encode_png(px)) == px).all()


def test_png_all_filters_match_scalar_reference():
    import numpy as np

    from cdx_toolkit_ray.stages.multimodal import decode_png

    rng = np.random.default_rng(1)
    for bpp, color in [(1, 0), (3, 2)]:
        w, h = 6, 10
        lines = [(y % 5, list(rng.integers(0, 256, w * bpp)))
                 for y in range(h)]
        got = decode_png(_build_png(lines, w, h, color)) \
            .reshape(h, w * bpp)
        assert (got == _scalar_unfilter(lines, w, h, bpp)).all()


def test_png_rejects_garbage():
    import struct
    import zlib

    import numpy as np
    import pytest

    from cdx_toolkit_ray.stages.multimodal import (_PNG_SIG, _png_chunk,
                                                   decode_png,
                                                   encode_png)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"BM123456")
    good = encode_png(np.zeros((4, 4), np.uint8))
    bad = bytearray(good)
    bad[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # 16-bit depth unsupported -> clear error
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    png16 = (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(b"\0" * 36))
             + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(png16)


def test_sniff_detects_png():
    import numpy as np
    import pyarrow as pa

    from cdx_toolkit_ray.stages.multimodal import (encode_png,
                                                   sniff_batch)

    png = encode_png(np.zeros((3, 3), np.uint8))
    t = pa.table({"payload": pa.array(
        [png, b"BM1234567890", b"  <html>", b"\x89PNGxxxx"],
        pa.binary())})
    got = sniff_batch(t)["sniffed_type"].to_pylist()
    assert got == ["image/png", "image/bmp", "text/html",
                   "application/octet-stream"]


def test_media_decoder_png_path(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cdx_toolkit_ray.stages.multimodal import (MediaDecoder,
                                                   encode_png)

    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, (6, 9)).astype(np.uint8)
    rgb = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    ds = ray.data.from_arrow(pa.table({
        "payload": pa.array([encode_png(gray), encode_png(rgb)],
                            pa.binary())}))
    out = ds.map_batches(MediaDecoder,
                         fn_constructor_kwargs={"decoder": "png"},
                         batch_format="pyarrow", batch_size=2,
                         concurrency=1).to_pandas()
    assert list(out.width) == [9, 5] and list(out.height) == [6, 4]
    # histogram matches a direct computation for the gray image
    want = np.bincount((gray.astype(np.int64) >> 4).ravel(),
                       minlength=16).astype(np.float32)
    want /= want.sum()
    assert np.allclose(np.array(out.features[0]), want)
