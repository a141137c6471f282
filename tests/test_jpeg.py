"""Baseline JPEG codec (stages/jpeg.py, VERDICT r4 item 6): exactness
on quantization-safe images, bounded loss on smooth ones, restart
markers, chroma subsampling, the progressive boundary, and routing
through sniff_batch + MediaDecoder."""

import numpy as np
import pyarrow as pa
import pytest

from cdx_toolkit_ray.stages.jpeg import (_A, QUANT_LUM, ZIGZAG,
                                         decode_jpeg, encode_jpeg)


def test_dct_basis_is_orthonormal():
    """A @ A.T == I — the IDCT exactly inverts the FDCT in floats."""
    np.testing.assert_allclose(_A @ _A.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: start of the scan and the last entry
    assert ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[63] == 63


def test_constant_tiles_roundtrip_exactly():
    """DC = 16k is an exact multiple of the Annex K luminance step 16,
    all AC zero -> the lossy pipeline is exact by construction."""
    assert QUANT_LUM[0] == 16
    for (h, w) in [(8, 8), (16, 24), (24, 8), (16, 16)]:
        ty, tx = h // 8, w // 8
        vals = (128 + 2 * (np.arange(ty * tx) % 64 - 32)).reshape(ty, tx)
        px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(px))
        assert dec.shape == (h, w) and dec.dtype == np.uint8
        np.testing.assert_array_equal(dec, px)


def test_restart_markers_roundtrip():
    """DRI/RSTn: predictors reset every N MCUs; constant tiles stay
    exact through the resync path, any interval."""
    vals = (128 + 2 * (np.arange(12) % 64 - 32)).reshape(3, 4)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    for ri in (1, 2, 5):
        blob = encode_jpeg(px, restart_interval=ri)
        assert b"\xff\xdd" in blob          # DRI present
        np.testing.assert_array_equal(decode_jpeg(blob), px)


def test_smooth_gray_bounded_loss_and_odd_dims():
    y, x = np.mgrid[0:29, 0:35]
    px = np.clip(np.round(128 + 60 * np.sin(y / 5) + 50 * np.cos(x / 7)),
                 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(px))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 12


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_rgb_roundtrip_and_subsampling(sub):
    # constant color: chroma planes constant -> subsampling lossless
    px = np.full((20, 30, 3), 0, np.uint8)
    px[..., 0], px[..., 1], px[..., 2] = 142, 88, 61
    dec = decode_jpeg(encode_jpeg(px, subsample=sub))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 3
    # smooth gradients: bounded loss, odd dims
    y, x = np.mgrid[0:13, 0:17]
    g = np.stack([128 + 40 * np.sin(y / 4), 128 + 40 * np.sin(x / 4),
                  128 + 40 * np.sin((x + y) / 4)], axis=2)
    g = np.clip(np.round(g), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, subsample=sub))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 48


def test_unsupported_sof_modes_raise_loudly():
    px = np.full((8, 8), 130, np.uint8)
    blob = bytearray(encode_jpeg(px))
    i = blob.find(b"\xff\xc0")
    for sof, name in [(0xC9, "arithmetic"), (0xC3, "lossless"),
                      (0xCA, "progressive arithmetic")]:
        b2 = bytearray(blob)
        b2[i + 1] = sof
        with pytest.raises(NotImplementedError, match=name):
            decode_jpeg(bytes(b2))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_progressive_parity_with_baseline():
    """SOF2 spectral-selection + successive-approximation files decode
    to EXACTLY the baseline decode of the same pixels (both halves
    reconstruct the identical Annex-K-quantized coefficient grid) —
    one assertion covers DC/AC first passes, EOB runs, ZRL-in-refine
    correction partitioning and the scan-ladder bookkeeping."""
    from cdx_toolkit_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(5)
    for shape in [(8, 8), (16, 16), (13, 17), (9, 40)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        blob = encode_jpeg_progressive(px)
        assert b"\xff\xc2" in blob           # really SOF2
        np.testing.assert_array_equal(decode_jpeg(blob),
                                      decode_jpeg(encode_jpeg(px)))
    for sub in ("444", "422", "420"):
        px = rng.randint(0, 256, (13, 19, 3)).astype(np.uint8)
        np.testing.assert_array_equal(
            decode_jpeg(encode_jpeg_progressive(px, subsample=sub)),
            decode_jpeg(encode_jpeg(px, subsample=sub)))
    # smooth content: long zero runs exercise EOBn > 1
    y, x = np.mgrid[0:48, 0:56]
    sm = np.clip(np.round(128 + 60 * np.sin(y / 6)
                          + 50 * np.cos(x / 9)), 0, 255) \
        .astype(np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(sm)),
        decode_jpeg(encode_jpeg(sm)))


def test_progressive_constant_tiles_exact_and_custom_script():
    from cdx_toolkit_ray.stages.jpeg import encode_jpeg_progressive

    vals = (128 + 2 * (np.arange(12) % 64 - 32)).reshape(3, 4)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(px)), px)
    # spectral-selection-only script (no successive approximation)
    script = [([0], 0, 0, 0, 0), ([0], 1, 9, 0, 0),
              ([0], 10, 63, 0, 0)]
    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(g, scans=script)),
        decode_jpeg(encode_jpeg(g)))


def test_sniff_routes_jpeg(ray_session):
    from cdx_toolkit_ray.stages.multimodal import sniff_batch

    jpg = encode_jpeg(np.full((8, 8), 99, np.uint8))
    batch = pa.table({"payload": pa.array(
        [jpg, b"BM123456", b"<html>", None], pa.binary())})
    out = sniff_batch(batch)
    assert out["sniffed_type"].to_pylist() == [
        "image/jpeg", "image/bmp", "text/html",
        "application/octet-stream"]


def test_media_decoder_jpeg_path(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.multimodal import MediaDecoder

    vals = (128 + 2 * (np.arange(4) % 64 - 32)).reshape(2, 2)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    rows = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([encode_jpeg(px)], pa.binary()),
    })
    out = ray.data.from_arrow(rows).map_batches(
        MediaDecoder, fn_constructor_kwargs={"decoder": "jpeg"},
        batch_format="pyarrow", batch_size=8, concurrency=1) \
        .take_all()
    assert out[0]["width"] == 16 and out[0]["height"] == 16
    # exact image -> histogram is the exact pixel histogram
    lum = px.astype(np.int64)
    want = np.bincount((lum >> 4).ravel(), minlength=16).astype(float)
    want /= want.sum()
    np.testing.assert_allclose(out[0]["features"], want, atol=1e-6)


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), np.float32))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(np.zeros((8, 8), np.uint8), subsample="411")
    with pytest.raises(ValueError, match="gray or"):
        encode_jpeg(np.zeros((8, 8, 2), np.uint8))
    with pytest.raises(ValueError, match="empty"):
        encode_jpeg(np.zeros((0, 8), np.uint8))


def test_gray_with_2x2_sampling_factors_decodes_correctly():
    """T.81 A.2.2: an Ns=1 scan is NON-interleaved (MCU = one data
    unit, row-major component-grid order) regardless of declared
    sampling factors — cjpeg-style grayscale files keep the source's
    2x2 Y factors (round-5 review: the MCU walk scrambled them)."""
    for shape in ((32, 32), (24, 40), (13, 17), (8, 8)):
        px = ((np.arange(shape[0])[:, None] * 7
               + np.arange(shape[1])[None, :] * 13) % 251) \
            .astype(np.uint8)
        blob = bytearray(encode_jpeg(px))
        i = blob.find(b"\xff\xc0")
        # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) cid(1) -> the
        # sampling byte is at i+2(marker)+2(len)+1+2+2+1+1
        samp_off = i + 11
        assert blob[samp_off] == 0x11
        blob[samp_off] = 0x22
        dec = decode_jpeg(bytes(blob))
        ref = decode_jpeg(encode_jpeg(px))
        np.testing.assert_array_equal(dec, ref)


def test_fill_bytes_and_tem_markers_are_skipped():
    px = np.full((8, 8), 130, np.uint8)
    blob = encode_jpeg(px)
    i = blob.find(b"\xff\xdb")
    # legal padding: extra 0xFF fill bytes + a standalone TEM marker
    padded = blob[:i] + b"\xff" + b"\xff\x01" + blob[i:]
    np.testing.assert_array_equal(decode_jpeg(padded),
                                  decode_jpeg(blob))


def test_truncated_restart_stream_raises_valueerror():
    vals = (128 + 2 * (np.arange(8) % 64 - 32)).reshape(2, 4)
    px = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    blob = encode_jpeg(px, restart_interval=1)
    # cut inside the entropy stream, right around a restart boundary
    rst = blob.find(b"\xff\xd0")
    assert rst > 0
    with pytest.raises(ValueError):
        decode_jpeg(blob[:rst])


from hypothesis import given, settings
from hypothesis import strategies as hst


@given(seed=hst.integers(0, 10_000),
       h=hst.integers(1, 40), w=hst.integers(1, 40),
       color=hst.booleans(),
       sub=hst.sampled_from(["444", "422", "420"]))
@settings(max_examples=40, deadline=None)
def test_progressive_parity_property(seed, h, w, color, sub):
    """Any geometry/content/subsampling: progressive bytes decode to
    exactly the baseline decode (shared coefficient grid)."""
    from cdx_toolkit_ray.stages.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if color else (h, w)
    px = rng.randint(0, 256, shape).astype(np.uint8)
    kw = {"subsample": sub} if color else {}
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg_progressive(px, **kw)),
        decode_jpeg(encode_jpeg(px, **kw)))


def test_progressive_scan_script_validation():
    """Review finding: a broken successive-approximation ladder must
    fail loudly at encode time, not silently produce wrong pixels."""
    from cdx_toolkit_ray.stages.jpeg import encode_jpeg_progressive

    px = np.full((8, 8), 130, np.uint8)
    with pytest.raises(ValueError, match="ladder"):
        encode_jpeg_progressive(px, scans=[
            ([0], 0, 0, 0, 2), ([0], 0, 0, 2, 0), ([0], 1, 63, 0, 0)])
    with pytest.raises(ValueError, match="component 5"):
        encode_jpeg_progressive(px, scans=[([5], 0, 0, 0, 0)])
    with pytest.raises(ValueError, match="before its DC"):
        encode_jpeg_progressive(px, scans=[([0], 1, 63, 0, 0)])
    with pytest.raises(ValueError, match="twice"):
        encode_jpeg_progressive(px, scans=[
            ([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
            ([0], 1, 63, 0, 0)])
    with pytest.raises(ValueError, match="exactly one"):
        encode_jpeg_progressive(
            np.full((8, 8, 3), 9, np.uint8),
            scans=[([0, 1, 2], 0, 0, 0, 0), ([0, 1], 1, 63, 0, 0)])


def test_truncated_sos_header_raises_valueerror():
    from cdx_toolkit_ray.stages.jpeg import encode_jpeg_progressive

    px = np.full((8, 8), 130, np.uint8)
    blob = bytearray(encode_jpeg_progressive(px))
    i = blob.find(b"\xff\xda")
    # corrupt Ns upward so the header claims more components than the
    # segment length holds
    blob[i + 4] = 3
    with pytest.raises(ValueError, match="SOS"):
        from cdx_toolkit_ray.stages.jpeg import decode_jpeg as dj
        dj(bytes(blob))
