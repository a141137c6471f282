"""GIF codec (stages/gif.py): LZW round trips, interlacing,
transparency/disposal compositing, malformed-file strictness, and
routing through sniff_batch + MediaDecoder."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from cdx_toolkit_ray.stages.gif import (_lzw_decode, _lzw_encode,
                                        _subblocks, decode_gif,
                                        encode_gif)


def test_lzw_kernel_roundtrip_and_kwkwk():
    rng = np.random.RandomState(3)
    for mcs in (2, 4, 8):
        for n in (1, 7, 300, 5000):
            idx = rng.randint(0, 1 << mcs, n).astype(np.uint8)
            got = _lzw_decode(_lzw_encode(idx, mcs), mcs, n)
            np.testing.assert_array_equal(got, idx)
    # the KwKwK case: long constant runs make code N reference itself
    run = np.zeros(4000, np.uint8)
    np.testing.assert_array_equal(
        _lzw_decode(_lzw_encode(run, 2), 2, 4000), run)


def test_single_frame_roundtrip_palettes_and_dims():
    rng = np.random.RandomState(7)
    for k in (2, 3, 16, 256):
        pal = rng.randint(0, 256, (k, 3)).astype(np.uint8)
        for (h, w) in [(1, 1), (5, 9), (33, 7)]:
            fr = rng.randint(0, k, (h, w)).astype(np.uint8)
            frames, delays = decode_gif(encode_gif(fr, pal))
            assert frames.shape == (1, h, w, 3)
            np.testing.assert_array_equal(frames[0], pal[fr])


def test_animation_composites_and_delays():
    rng = np.random.RandomState(1)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    anim = rng.randint(0, 8, (4, 10, 12)).astype(np.uint8)
    frames, delays = decode_gif(
        encode_gif(anim, pal, delays_cs=[1, 2, 3, 4]))
    assert delays == [1, 2, 3, 4]
    for i in range(4):
        np.testing.assert_array_equal(frames[i], pal[anim[i]])


def test_transparency_shows_previous_frame():
    pal = np.array([[10, 10, 10], [0, 0, 0], [200, 5, 5]], np.uint8)
    f0 = np.zeros((4, 4), np.uint8)
    f1 = np.full((4, 4), 2, np.uint8)
    f1[1:3, 1:3] = 1                       # transparent hole
    frames, _ = decode_gif(
        encode_gif(np.stack([f0, f1]), pal, transparent=1))
    np.testing.assert_array_equal(frames[1][1:3, 1:3],
                                  np.full((2, 2, 3), 10, np.uint8))
    np.testing.assert_array_equal(frames[1][0, 0], [200, 5, 5])


def _patch_gce(blob: bytes, frame: int, disposal: int) -> bytes:
    """Set the disposal method of the frame-th GCE in an encoded
    stream (the encoder always writes disposal 1)."""
    out = bytearray(blob)
    seen = -1
    i = 0
    while i < len(out) - 1:
        if out[i] == 0x21 and out[i + 1] == 0xF9:
            seen += 1
            if seen == frame:
                flags = out[i + 3]
                out[i + 3] = (flags & ~0x1C) | (disposal << 2)
                return bytes(out)
            i += 8
        else:
            i += 1
    raise AssertionError("GCE %d not found" % frame)


def test_disposal_restore_background_and_previous():
    pal = np.array([[7, 7, 7], [50, 60, 70], [200, 5, 5],
                    [0, 0, 0]], np.uint8)
    f0 = np.full((3, 3), 1, np.uint8)
    f1 = np.full((3, 3), 2, np.uint8)
    f2t = np.full((3, 3), 3, np.uint8)      # fully transparent frame 2
    blob = encode_gif(np.stack([f0, f1, f2t]), pal, transparent=3,
                      background=0)
    # disposal 2 on frame 1: before frame 2 the canvas resets to the
    # background fill, so the transparent frame 2 shows background
    b2 = _patch_gce(blob, 1, 2)
    frames, _ = decode_gif(b2)
    np.testing.assert_array_equal(frames[1],
                                  np.full((3, 3, 3), [200, 5, 5]))
    np.testing.assert_array_equal(frames[2],
                                  np.full((3, 3, 3), 7))
    # disposal 3 on frame 1: canvas restores to frame 0's content
    b3 = _patch_gce(blob, 1, 3)
    frames, _ = decode_gif(b3)
    np.testing.assert_array_equal(frames[2],
                                  np.full((3, 3, 3), [50, 60, 70]))


def test_interlaced_frame_decodes_to_row_order():
    """Build an interlaced stream by permuting rows into GIF's
    4-pass order and setting the interlace flag — decode must undo
    it exactly."""
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    for h in (1, 2, 5, 8, 13):
        fr = rng.randint(0, 16, (h, 6)).astype(np.uint8)
        order = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for r in range(start, h, step)]
        permuted = fr[order]
        blob = bytearray(encode_gif(permuted, pal))
        i = blob.index(0x2C)
        assert blob[i + 9] & 0x40 == 0
        blob[i + 9] |= 0x40                # set interlace flag
        frames, _ = decode_gif(bytes(blob))
        np.testing.assert_array_equal(frames[0], pal[fr])


def test_malformed_gifs_raise():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    blob = encode_gif(np.zeros((4, 4), np.uint8), pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + blob[6:])
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(blob[:20])
    # frame rectangle outside the logical screen
    bad = bytearray(blob)
    i = bad.index(0x2C)
    bad[i + 1:i + 3] = struct.pack("<H", 100)
    with pytest.raises(ValueError, match="outside"):
        decode_gif(bytes(bad))
    with pytest.raises(ValueError, match="no image"):
        decode_gif(blob[:13] + bytes(pal.ravel()) + b"\x00" * 0
                   + b"\x3b")
    # encoder validation
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.full((2, 2), 5, np.uint8), pal)


def test_sniff_and_media_decoder_gif(ray_session):
    import ray.data

    from cdx_toolkit_ray.stages.multimodal import (MediaDecoder,
                                                   sniff_batch)

    pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    gif = encode_gif(np.eye(8, dtype=np.uint8), pal)
    batch = pa.table({"payload": pa.array(
        [gif, b"GIF89a junk", b"GIF00a no", b"<p>"], pa.binary())})
    out = sniff_batch(batch)
    assert out["sniffed_type"].to_pylist()[0] == "image/gif"
    assert out["sniffed_type"].to_pylist()[1] == "image/gif"
    assert out["sniffed_type"].to_pylist()[2] == \
        "application/octet-stream"

    rows = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([gif], pa.binary()),
    })
    got = ray.data.from_arrow(rows).map_batches(
        MediaDecoder, fn_constructor_kwargs={"decoder": "gif"},
        batch_format="pyarrow", batch_size=8, concurrency=1) \
        .take_all()
    assert got[0]["width"] == 8 and got[0]["height"] == 8


def test_subblock_framing_over_255_bytes():
    data = bytes(range(256)) * 3
    blocks = _subblocks(data)
    # re-join: length-prefixed chunks, zero terminator
    joined = bytearray()
    p = 0
    while True:
        ln = blocks[p]
        p += 1
        if ln == 0:
            break
        joined += blocks[p:p + ln]
        p += ln
    assert bytes(joined) == data and p == len(blocks)


def test_decompression_bomb_guards():
    """A ~KB crafted file cannot force multi-GB allocations (review
    finding): logical-screen, frame-count and output-byte caps all
    raise ValueError naming the knob."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    blob = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
    big = bytearray(blob)
    big[6:10] = struct.pack("<HH", 60000, 60000)
    with pytest.raises(ValueError, match="max_pixels"):
        decode_gif(bytes(big))
    # many tiny frames: repeat the image block
    i = blob.index(0x2C)
    img = bytes(blob[i:-1])
    many = bytes(blob[:i]) + img * 50 + b"\x3b"
    with pytest.raises(ValueError, match="max_frames"):
        decode_gif(many, max_frames=10)
    with pytest.raises(ValueError, match="max_output_bytes"):
        decode_gif(many, max_output_bytes=400)
    # known-good inputs pass with raised limits
    frames, _ = decode_gif(many)
    assert frames.shape[0] == 50


def test_invalid_lzw_code_size_rejected():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    blob = bytearray(encode_gif(np.zeros((4, 4), np.uint8), pal))
    i = blob.index(0x2C)
    assert blob[i + 10] == 2            # encoder's mcs for 1-bit pal
    blob[i + 10] = 9                    # spec max is 8
    with pytest.raises(ValueError, match="code size"):
        decode_gif(bytes(blob))


def test_encoder_delay_and_transparent_validation():
    pal = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    fr = np.zeros((2, 2), np.uint8)
    with pytest.raises(ValueError, match="65535"):
        encode_gif(fr, pal, delays_cs=[70000])
    with pytest.raises(ValueError, match="65535"):
        encode_gif(fr, pal, delays_cs=[-1])
    with pytest.raises(ValueError, match="transparent"):
        encode_gif(fr, pal, transparent=5)
