"""GIF codec (GIF87a/89a), pure numpy + python.

The third real image codec next to PNG and JPEG (stages/multimodal,
stages/jpeg): GIF is the web's animation/icon workhorse, and its
multi-frame structure is what makes ``FrameSampler``-style video
plumbing REAL — frames decode from an actual container instead of a
fake fixed-size slice model. Everything here is from the public
GIF89a specification: logical screen descriptor, global/local color
tables, image descriptors, interlacing, Graphic Control Extensions
(delay, transparency, disposal) and variable-width LSB-first LZW.

Scope:

* DECODE: 87a and 89a, global + local palettes, interlaced frames,
  transparency, disposal methods 0/1 (leave), 2 (restore to
  background) and 3 (restore to previous); frames composite onto the
  logical screen exactly like a browser draws them. Returns
  ``(frames, delays_cs)`` with frames an (n, h, w, 3) uint8 array.
* ENCODE: GIF89a writer (global palette, per-frame GCE with delay,
  optional transparency index, non-interlaced) — the fixture half
  for round-trip tests; LZW with code-table resets per spec.
* Plain-text and application extensions are skipped; a frame deeper
  than 8-bit palettes cannot exist in GIF. Malformed files raise
  ``ValueError`` naming the defect.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif"]

_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (variable code width, LSB-first packing — GIF appendix F)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, npixels: int
                ) -> np.ndarray:
    """LZW-decompress one image's sub-block-joined byte stream into
    exactly ``npixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(npixels, np.uint8)
    n_out = 0
    # dictionary as (prefix_code, suffix_byte); roots are implicit
    prefix = np.full(4096, -1, np.int32)
    suffix = np.zeros(4096, np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    buf = np.empty(4096, np.uint8)   # expansion scratch (max chain)

    def expand(code: int) -> bytes:
        i = 4096
        c = code
        while c >= clear:
            i -= 1
            buf[i] = suffix[c]
            c = prefix[c]
        i -= 1
        buf[i] = c
        return buf[i:]

    while n_out < npixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW starts with a non-root code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            seq = expand(code)
        elif code == next_code:
            # the KwKwK case: previous string + its first byte
            p = expand(prev)
            seq = np.concatenate([p, p[:1]])
        else:
            raise ValueError("LZW code out of range")
        take = min(len(seq), npixels - n_out)
        out[n_out:n_out + take] = seq[:take]
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = seq[0]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != npixels:
        raise ValueError("LZW stream ended %d pixels early"
                         % (npixels - n_out))
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """LZW-compress palette indices (the writer half): emits CLEAR,
    string codes with a dict reset at 4096, and EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prev = -1
    for v in indices.tolist():
        key = (prev, v)
        if prev < 0:
            prev = v
            continue
        if key in table:
            prev = table[key]
            continue
        put(prev, width)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = v
    if prev >= 0:
        put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode_gif(frames: np.ndarray, palette: np.ndarray, *,
               delays_cs=None, transparent: int | None = None,
               background: int = 0) -> bytes:
    """(n, h, w) palette-index frames + (k, 3) palette -> animated
    GIF89a bytes (global color table, one GCE + image per frame,
    non-interlaced). ``delays_cs``: per-frame delay in centiseconds
    (default 10). Deterministic: same inputs, same bytes."""
    frames = np.asarray(frames)
    if frames.ndim == 2:
        frames = frames[None]
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError("frames must be uint8 (n, h, w) indices")
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or not len(palette):
        raise ValueError("palette must be (k, 3) uint8")
    if int(frames.max(initial=0)) >= len(palette):
        raise ValueError("frame index outside the palette")
    n, h, w = frames.shape
    if delays_cs is None:
        delays_cs = [10] * n
    if len(delays_cs) != n:
        raise ValueError("need one delay per frame")
    if any(not 0 <= int(x) <= 0xFFFF for x in delays_cs):
        raise ValueError("delays_cs values must fit 0..65535")
    if transparent is not None and \
            not 0 <= transparent < len(palette):
        raise ValueError("transparent index outside the palette")
    # palette size rounds up to a power of two >= 2
    depth = max(1, int(len(palette) - 1).bit_length())
    ncolors = 1 << depth
    table = np.zeros((ncolors, 3), np.uint8)
    table[:len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1) << 4 | (depth - 1),
                  background, 0])
    out += table.tobytes()
    mcs = max(2, depth)
    for fi in range(n):
        flags = 0x04                       # disposal 1: draw on top
        if transparent is not None:
            flags |= 0x01
        out += b"\x21\xf9\x04" + bytes([flags]) \
            + struct.pack("<H", int(delays_cs[fi])) \
            + bytes([transparent or 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(frames[fi].ravel(), mcs))
    out += b"\x3b"                          # trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_gif(payload: bytes, *, max_pixels: int = 1 << 24,
               max_frames: int = 4096,
               max_output_bytes: int = 1 << 28):
    """GIF bytes -> ``(frames, delays_cs)``: frames is an
    (n, h, w, 3) uint8 array of the COMPOSITED logical screen after
    each image (transparency and disposal methods applied the way a
    browser renders), delays the per-frame GCE delay in
    centiseconds (0 where absent).

    Decompression-bomb guards (review finding — a ~5 KB file can
    declare a 65535x65535 screen with thousands of 1x1 frames): the
    logical screen is capped at ``max_pixels``, the animation at
    ``max_frames``, and the total decoded output at
    ``max_output_bytes``; each raises ValueError naming the knob, so
    untrusted payloads routed by ``sniff_batch`` cannot OOM a
    worker. Raise the limits explicitly for known-good inputs."""
    d = payload
    if d[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(d) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", d[6:10])
    if h * w > max_pixels:
        raise ValueError(
            "logical screen %dx%d exceeds max_pixels=%d (raise the "
            "limit for known-good inputs)" % (w, h, max_pixels))
    flags, bg, _ar = d[10], d[11], d[12]
    pos = 13
    gct = None
    if flags & 0x80:
        k = 2 << (flags & 0x07)
        gct = np.frombuffer(d[pos:pos + 3 * k], np.uint8)
        if len(gct) != 3 * k:
            raise ValueError("truncated global color table")
        gct = gct.reshape(k, 3)
        pos += 3 * k

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames = []
    delays = []
    delay = 0
    transparent = None
    disposal = 0

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(d):
                raise ValueError("truncated extension")
            ln = d[p]
            p += 1
            if ln == 0:
                return p
            p += ln

    while pos < len(d):
        b = d[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            break
        if b == 0x21:                       # extension
            if pos >= len(d):
                raise ValueError("truncated extension introducer")
            label = d[pos]
            pos += 1
            if label == 0xF9:               # GCE
                if pos + 6 > len(d):
                    raise ValueError("truncated GCE")
                ln = d[pos]
                if ln != 4:
                    raise ValueError("bad GCE length %d" % ln)
                gflags = d[pos + 1]
                (delay,) = struct.unpack("<H", d[pos + 2:pos + 4])
                transparent = d[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 5
                if d[pos] != 0:
                    raise ValueError("GCE missing terminator")
                pos += 1
            else:                           # comment/app/plain text
                pos = skip_subblocks(pos)
            continue
        if b != 0x2C:
            raise ValueError("unknown GIF block 0x%02X" % b)
        # image descriptor
        if pos + 9 > len(d):
            raise ValueError("truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", d[pos:pos + 8])
        iflags = d[pos + 8]
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ValueError("frame rectangle outside logical screen")
        pal = gct
        if iflags & 0x80:                   # local color table
            k = 2 << (iflags & 0x07)
            pal = np.frombuffer(d[pos:pos + 3 * k], np.uint8)
            if len(pal) != 3 * k:
                raise ValueError("truncated local color table")
            pal = pal.reshape(k, 3)
            pos += 3 * k
        if pal is None:
            raise ValueError("frame without any color table")
        if pos >= len(d):
            raise ValueError("truncated image data")
        mcs = d[pos]
        pos += 1
        # spec max is 8 (palettes cap at 256 colors); 9-11 would also
        # let invalid >=256 root codes wrap the uint8 index buffers
        # silently (review finding)
        if not 2 <= mcs <= 8:
            raise ValueError("bad LZW minimum code size %d" % mcs)
        chunks = []
        while True:
            if pos >= len(d):
                raise ValueError("truncated image data")
            ln = d[pos]
            pos += 1
            if ln == 0:
                break
            chunks.append(d[pos:pos + ln])
            pos += ln
        idx = _lzw_decode(b"".join(chunks), mcs, fw * fh)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        grid = idx.reshape(fh, fw)
        if iflags & 0x40:                   # interlaced row order
            de = np.empty_like(grid)
            src = 0
            for start, step in _GIF_INTERLACE:
                rows = range(start, fh, step)
                for r in rows:
                    de[r] = grid[src]
                    src += 1
            grid = de

        if len(frames) >= max_frames:
            raise ValueError(
                "animation exceeds max_frames=%d (raise the limit "
                "for known-good inputs)" % max_frames)
        if (len(frames) + 1) * h * w * 3 > max_output_bytes:
            raise ValueError(
                "decoded frames exceed max_output_bytes=%d (raise "
                "the limit for known-good inputs)" % max_output_bytes)
        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = pal[grid]
        if transparent is not None:
            opaque = grid != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:                   # restore to background
            canvas[fy:fy + fh, fx:fx + fw] = bg_fill
        elif disposal == 3:                 # restore to previous
            canvas = before
        delay = 0
        transparent = None
        disposal = 0

    if not frames:
        raise ValueError("GIF holds no image")
    return np.stack(frames), delays
