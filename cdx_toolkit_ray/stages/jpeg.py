"""JPEG codec (ITU T.81, baseline SOF0 + progressive SOF2), pure
numpy + python.

Closes the "pil slot" boundary in stages/multimodal.py (VERDICT r4
item 6): JPEG is the dominant photographic format of the web, so a
100-TB multimodal pipeline cannot route around it. Everything here is
built from the public spec (ITU-T T.81 / ISO 10918-1): marker segment
framing, Annex K quantization + Huffman tables, zigzag coefficient
order, level-shifted 2-D DCT, byte stuffing, restart markers, JFIF
YCbCr <-> RGB (BT.601 full-range) with 4:4:4 / 4:2:2 / 4:2:0 chroma
sampling.

Scope and boundaries, documented loudly:

* DECODE: baseline sequential (SOF0/1) AND progressive (SOF2,
  Huffman — spectral selection + successive approximation, the
  multi-scan coefficient accumulator with EOB runs and correction
  bits per T.81 G.2) — 8-bit samples, 1 or 3 components, DRI/RSTn
  restart intervals. Arithmetic coding, 12-bit, lossless and
  hierarchical modes raise ``NotImplementedError`` with the marker
  name (the remaining documented boundary).
* ENCODE: baseline SOF0 with the Annex K tables, and progressive
  SOF2 via ``encode_jpeg_progressive`` (libjpeg-style scan ladder;
  AC scans use a flat self-describing Huffman table because Annex K
  defines no EOBn codes) — gray or RGB, 4:4:4 / 4:2:2 / 4:2:0 —
  the fixture/writer half that lets every decode path be
  round-trip tested without external libraries.
* Entropy (de)coding walks bits in Python per block — the honest
  baseline; dequantization and the IDCT are one vectorized einsum
  over ALL blocks of a component. Run it in the actor pool like
  BmpDecoder (``MediaDecoder(decoder="jpeg")``); JPEG is lossy, so
  round trips are approximate except where quantization divides
  exactly (the closed-form oracle uses constant 8x8 tiles whose DC
  is a multiple of the quant step — exact by construction).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "encode_jpeg_progressive",
           "decode_jpeg"]

# ---------------------------------------------------------------------------
# Spec constants (ITU T.81 Annex K)
# ---------------------------------------------------------------------------

#: zigzag scan: zigzag index -> natural (row-major) index
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    np.int64)

QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], np.int64)

QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], np.int64)

#: (bits-per-length[1..16], symbol values) — Annex K.3
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
    0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
    0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
    0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
    0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
    0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
    0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
    0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
    0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
    0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
    0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
    0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
    0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
    0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
    0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
    0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
    0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
    0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])

#: AC table for the PROGRESSIVE writer: the Annex K baseline AC
#: tables define no EOBn symbols (baseline never emits them), so
#: progressive scans use this flat canonical table — every (run,
#: size<=10) symbol, ZRL, and EOBn for n<=14, all at code length 8
#: (176 codes: Kraft 176/256 < 1, all-ones code unused — valid per
#: C.2, just not entropy-optimal; the table ships in the DHT so any
#: decoder reads it).
AC_PROG = ([0] * 7 + [176] + [0] * 8,
           sorted([(r << 4) | s for r in range(16)
                   for s in range(1, 11)]
                  + [0xF0] + [r << 4 for r in range(15)]))

#: 2-D DCT basis matrix: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
#: FDCT(block) = A @ block @ A.T, IDCT(coef) = A.T @ coef @ A
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)], np.float64)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (code, length)} per T.81 C.2 — the
    canonical code assignment both halves share."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Canonical Huffman decoding state (T.81 F.2.2.3): per code
    length the smallest/largest code and the value-table offset."""

    def __init__(self, bits, values):
        self.values = list(values)
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.values[self.valptr[length]
                                   + code - self.mincode[length]]
        raise ValueError("invalid Huffman code in entropy stream")


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at
    any non-stuffing marker (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        if self.bit == 0:
            if self.pos >= len(d):
                raise ValueError("entropy stream truncated")
            if d[self.pos] == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt != 0x00:
                    raise ValueError(
                        "marker 0xFF%02X inside entropy data"
                        % (nxt if nxt is not None else 0))
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Byte-align and return the 2-byte marker at the cursor."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.data[self.pos] == 0xFF else 1
        if self.pos + 1 >= len(self.data):
            raise ValueError(
                "entropy stream truncated at a marker boundary "
                "(byte %d)" % self.pos)
        if self.data[self.pos] != 0xFF:
            raise ValueError("expected a marker at byte %d" % self.pos)
        return self.data[self.pos:self.pos + 2]


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1: low-order ``size`` bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # 1-pad to byte boundary

    def marker(self, b: int) -> None:
        """Byte-align and append a raw marker (no stuffing)."""
        self.align()
        self.out += bytes([0xFF, b])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _category(v: int) -> int:
    """Magnitude category (bit size) of a DC diff / AC value."""
    return int(abs(v)).bit_length()


def _fdct_quant(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Level-shifted FDCT + quantization of every 8x8 block of a
    padded plane -> (by, bx, 64) zigzag-ordered int coefficients,
    vectorized over all blocks with one einsum."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .astype(np.float64) - 128.0)
    coef = np.einsum("ux,byxz,vz->byuv", _A, blocks, _A)
    q = np.round(coef / quant.reshape(8, 8)).astype(np.int64)
    # zigzag gather: zz[k] = natural[ZIGZAG[k]]
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """One zigzag coefficient vector -> entropy bits; returns the new
    DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    nz = np.flatnonzero(zz[1:])
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]        # ZRL: 16 zeros
            w.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]            # EOB
        w.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate a plane up to (mh, mw)."""
    h, w = plane.shape
    return np.pad(plane, ((0, mh - h), (0, mw - w)), mode="edge")


def _prepare_components(pixels: np.ndarray, subsample: str):
    """Shared writer front half: validate, color-transform,
    subsample, pad and FDCT+quantize every component. Returns
    ``(h, w, samp, qids, coefs, mcux, mcuy)`` with ``coefs[i]`` the
    (by, bx, 64) zigzag coefficient grid of component ``i``."""
    if pixels.dtype != np.uint8:
        raise ValueError("pixels must be uint8")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("expected (h, w) gray or (h, w, 3) rgb")
    h, w = pixels.shape[:2]
    if not h or not w:
        raise ValueError("empty image")

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            sub = []
            for p in (cb, cr):
                pp = _pad_to(p, ph, pw)
                sub.append(np.round(
                    pp.reshape(ph // 2, 2, pw // 2, 2)
                    .mean(axis=(1, 3))))
            planes = [y, sub[0], sub[1]]
        elif subsample == "422":
            # horizontal-only chroma halving (the other common web
            # layout; the decoder's generic 1..2 factor path covers it)
            samp = [(2, 1), (1, 1), (1, 1)]
            pw = (w + 1) // 2 * 2
            sub = []
            for p in (cb, cr):
                pp = _pad_to(p, h, pw)
                sub.append(np.round(
                    pp.reshape(h, pw // 2, 2).mean(axis=2)))
            planes = [y, sub[0], sub[1]]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [y, cb, cr]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    quants = [QUANT_LUM, QUANT_CHROM]
    coefs = []
    for p, (sh, sv), qid in zip(planes, samp, qids):
        coefs.append(_fdct_quant(
            _pad_to(p, mcuy * sv * 8, mcux * sh * 8), quants[qid]))
    return h, w, samp, qids, coefs, mcux, mcuy


def _write_headers(h, w, samp, qids, hids, *, sof_marker: bytes,
                   restart_interval: int = 0,
                   ac_defs=(AC_LUM, AC_CHROM),
                   ac_ids=None) -> bytearray:
    """SOI .. SOS-exclusive header segments shared by the baseline
    and progressive writers (JFIF APP0, DQT, optional DRI, SOF,
    all DHTs up front — legal per B.2.4.2, tables just need to
    precede first use)."""
    quants = [QUANT_LUM, QUANT_CHROM]
    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) \
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0
    for qid in sorted(set(qids)):
        zzq = quants[qid][ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) \
            + bytes([qid]) + zzq.tobytes()
    ncomp = len(samp)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff" + sof_marker \
        + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, ((sh, sv), qid) in enumerate(zip(samp, qids)):
        out += bytes([ci + 1, (sh << 4) | sv, qid])
    for cls, tabs, tids in ((0, (DC_LUM, DC_CHROM), sorted(set(hids))),
                            (1, ac_defs,
                             sorted(set(hids)) if ac_ids is None
                             else list(ac_ids))):
        for tid in tids:
            bits, vals = tabs[tid]
            out += b"\xff\xc4" \
                + struct.pack(">H", 19 + len(vals)) \
                + bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return out


def encode_jpeg(pixels: np.ndarray, *, subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """8-bit grayscale (h, w) or RGB (h, w, 3) -> baseline JPEG bytes
    (SOF0, Annex K quantization + Huffman tables, JFIF APP0 header).
    ``subsample``: ``"444"`` (no chroma subsampling), ``"422"``
    (horizontal halving) or ``"420"`` (2x2 averaging) — the layouts
    that dominate real web JPEGs. ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every N MCUs (predictors reset —
    exercises the decoder's resync path). Deterministic: same
    pixels, same bytes."""
    h, w, samp, qids, coefs, mcux, mcuy = \
        _prepare_components(pixels, subsample)
    gray = len(samp) == 1
    dc_tabs = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHROM)]
    ac_tabs = [_huff_codes(*AC_LUM), _huff_codes(*AC_CHROM)]
    hids = [0] + ([1, 1] if not gray else [])

    bw = _BitWriter()
    preds = [0] * len(samp)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.marker(0xD0 + (mcu_count // restart_interval - 1) % 8)
                preds = [0] * len(samp)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], dc_tabs[hids[ci]],
                            ac_tabs[hids[ci]])
    entropy = bw.flush()

    out = _write_headers(h, w, samp, qids, hids, sof_marker=b"\xc0",
                         restart_interval=restart_interval)
    ncomp = len(samp)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, (hids[ci] << 4) | hids[ci]])
    out += b"\x00\x3f\x00"                            # Ss, Se, Ah/Al
    out += entropy
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_UNSUPPORTED_SOF = {0xC3: "SOF3 (lossless)", 0xC5: "SOF5 (differential)",
                    0xC6: "SOF6 (differential progressive)",
                    0xC7: "SOF7 (differential lossless)",
                    0xC9: "SOF9 (arithmetic)",
                    0xCA: "SOF10 (progressive arithmetic)",
                    0xCB: "SOF11 (lossless arithmetic)",
                    0xCD: "SOF13", 0xCE: "SOF14", 0xCF: "SOF15"}


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 pixels: (h, w) for 1-component
    (grayscale) files, (h, w, 3) RGB for 3-component YCbCr (JFIF
    BT.601 full-range conversion, nearest-neighbor chroma
    upsampling). Handles baseline sequential (SOF0/1) and
    progressive (SOF2 Huffman) files — progressive scans accumulate
    into the coefficient grid and IDCT runs once at EOI. Strict on
    structure (markers, table ids, sampling factors 1..2, component
    count) and loud on the remaining boundaries: arithmetic /
    lossless / 12-bit / hierarchical files raise
    ``NotImplementedError`` naming the mode."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_dec: dict[int, _HuffDecoder] = {}
    ac_dec: dict[int, _HuffDecoder] = {}
    sof = None
    restart_interval = 0
    progressive = False
    scans: list = []
    while True:
        if pos + 2 > len(d):
            if progressive and scans:
                break          # data ends after the last scan
            raise ValueError("truncated JPEG (no SOS)")
        if d[pos] != 0xFF:
            raise ValueError("expected marker at byte %d" % pos)
        # fill bytes: any number of 0xFF may precede a marker
        # (T.81 B.1.1.2)
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        marker = d[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone (no length segment)
            pos += 2
            continue
        if marker == 0xD9:          # EOI is standalone too
            if progressive and scans:
                break
            raise ValueError("EOI before SOS (no image data)")
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG (no SOS)")
        if marker in _UNSUPPORTED_SOF:
            raise NotImplementedError(
                "JPEG %s is not supported by this baseline decoder"
                % _UNSUPPORTED_SOF[marker])
        (seglen,) = struct.unpack(">H", d[pos + 2:pos + 4])
        body = d[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment 0xFF%02X" % marker)
        if marker == 0xDB:                              # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq == 0:
                    tab = np.frombuffer(body[bp:bp + 64],
                                        np.uint8).astype(np.int64)
                    bp += 64
                else:
                    tab = np.frombuffer(body[bp:bp + 128],
                                        ">u2").astype(np.int64)
                    bp += 128
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = tab                      # de-zigzag
                qt[tq] = nat
        elif marker == 0xC4:                            # DHT
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1:bp + 17])
                nvals = sum(bits)
                vals = list(body[bp + 17:bp + 17 + nvals])
                (dc_dec if cls == 0 else ac_dec)[tid] = \
                    _HuffDecoder(bits, vals)
                bp += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):              # SOF0/1/2
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(
                    "%d-bit JPEG samples (baseline is 8-bit)" % prec)
            if nc not in (1, 3):
                raise ValueError("unsupported component count %d" % nc)
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci:9 + 3 * ci]
                sh, sv = sf >> 4, sf & 0x0F
                if not (1 <= sh <= 2 and 1 <= sv <= 2):
                    raise ValueError(
                        "sampling factors %dx%d out of the 1..2 "
                        "range this decoder handles" % (sh, sv))
                comps.append({"id": cid, "h": sh, "v": sv, "tq": tq})
            sof = (h, w, comps)
        elif marker == 0xDD:                            # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                            # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            scan = []
            for si in range(ns):
                cs, tabs = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seglen
            if not progressive:
                return _decode_scan(d, pos, sof, scan, qt, dc_dec,
                                    ac_dec, restart_interval)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            scans.append((scan, ss, se, ahal >> 4, ahal & 0x0F, pos,
                          dict(dc_dec), dict(ac_dec),
                          restart_interval))
            pos = _entropy_end(d, pos)
            continue
        # APPn / COM / anything else: skip
        pos = pos + 2 + seglen
    return _decode_progressive(d, sof, scans, qt)


def _decode_scan(d, pos, sof, scan, qt, dc_dec, ac_dec,
                 restart_interval) -> np.ndarray:
    h, w, comps = sof
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan names unknown component %d" % cs)
        order.append((by_id[cs], td, ta))
    if len(order) != len(comps):
        raise NotImplementedError(
            "non-interleaved multi-scan JPEG (baseline interleaved "
            "scans only)")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(d, pos)
    preds = [0] * len(comps)
    mcu_count = 0

    def check_restart():
        m = reader.align_to_marker()
        if not (m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7):
            raise ValueError(
                "expected RST marker at MCU %d" % mcu_count)
        reader.pos += 2
        reader.bit = 0
        for ci in range(len(preds)):
            preds[ci] = 0

    def decode_block(ci, td, ta):
        if td not in dc_dec or ta not in ac_dec:
            raise ValueError("scan references missing Huffman table")
        zz = np.zeros(64, np.int64)
        t = dc_dec[td].decode(reader)
        diff = _extend(reader.receive(t), t)
        preds[ci] += diff
        zz[0] = preds[ci]
        k = 1
        while k < 64:
            rs = ac_dec[ta].decode(reader)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16          # ZRL
                    continue
                break                # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(reader.receive(s), s)
            k += 1
        return zz

    if len(comps) == 1:
        # Ns=1 scan is NON-interleaved per T.81 A.2.2: the MCU is one
        # data unit and blocks walk the component's own grid row-major
        # — a grayscale file declaring 2x2 factors (cjpeg keeps the
        # source's Y factors) lays out exactly like a 1x1 one
        # (round-5 review finding: the MCU walk silently scrambled it)
        ci, td, ta = order[0]
        c = comps[ci]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        bw_, bh_ = -(-cw // 8), -(-ch // 8)
        coefs = [np.zeros((bh_, bw_, 64), np.int64)]
        for by in range(bh_):
            for bx in range(bw_):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    check_restart()
                coefs[0][by, bx] = decode_block(ci, td, ta)
                mcu_count += 1
    else:
        coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                          np.int64) for c in comps]
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count \
                        and mcu_count % restart_interval == 0:
                    check_restart()
                for ci, td, ta in order:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs[ci][my * c["v"] + by,
                                      mx * c["h"] + bx] = \
                                decode_block(ci, td, ta)
                mcu_count += 1

    return _assemble(h, w, comps, coefs, qt)


def _assemble(h, w, comps, coefs, qt) -> np.ndarray:
    """Per-component (by, bx, 64) zigzag coefficient grids ->
    dequant + vectorized IDCT -> crop/upsample -> gray or BT.601 RGB.
    Shared by the baseline and progressive decode paths."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c, coef in zip(comps, coefs):
        if c["tq"] not in qt:
            raise ValueError("component references missing quant "
                             "table %d" % c["tq"])
        nat = np.zeros(coef.shape, np.float64)
        nat[:, :, ZIGZAG] = coef                      # de-zigzag
        nat = nat.reshape(coef.shape[0], coef.shape[1], 8, 8)
        nat *= qt[c["tq"]].reshape(1, 1, 8, 8)
        px = np.einsum("xu,byuv,vz->byxz", _A.T, nat, _A) + 128.0
        bh, bw_ = coef.shape[0], coef.shape[1]
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        # crop to the component's true size, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive mode (SOF2, Huffman): spectral selection + successive
# approximation — multi-scan coefficient accumulation per T.81 G.1/G.2.
# ---------------------------------------------------------------------------

def _entropy_end(d: bytes, pos: int) -> int:
    """First byte offset of the next true marker after an entropy
    segment (stuffed 0x00, RSTn and fill 0xFF bytes all belong to
    the entropy stream)."""
    while True:
        nxt = d.find(b"\xff", pos)
        if nxt < 0 or nxt + 1 >= len(d):
            return len(d)
        m = d[nxt + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = nxt + 2
            continue
        if m == 0xFF:                  # fill byte
            pos = nxt + 1
            continue
        return nxt


def _decode_progressive(d, sof, scans, qt) -> np.ndarray:
    """Accumulate every scan's contribution into per-component
    coefficient grids, then dequant + IDCT once — the multi-scan
    twin of ``_decode_scan``."""
    if sof is None:
        raise ValueError("SOS before SOF")
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coefs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
             for c in comps]
    for scan, ss, se, ah, al, pos, dc_dec, ac_dec, dri in scans:
        _prog_scan(d, pos, sof, scan, ss, se, ah, al, dc_dec, ac_dec,
                   dri, coefs, mcux, mcuy)
    return _assemble(h, w, comps, coefs, qt)


def _prog_scan(d, pos, sof, scan, ss, se, ah, al, dc_dec, ac_dec,
               dri, coefs, mcux, mcuy) -> None:
    h, w, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    order = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan names unknown component %d" % cs)
        order.append((by_id[cs], td, ta))
    reader = _BitReader(d, pos)
    state = {"eobrun": 0, "preds": [0] * len(comps), "units": 0}

    def check_restart():
        m = reader.align_to_marker()
        if not (m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7):
            raise ValueError("expected RST marker in progressive "
                             "scan at unit %d" % state["units"])
        reader.pos += 2
        reader.bit = 0
        state["eobrun"] = 0
        state["preds"] = [0] * len(comps)

    def maybe_restart():
        if dri and state["units"] and state["units"] % dri == 0:
            check_restart()
        state["units"] += 1

    if ss == 0:                                       # DC scan
        if se != 0:
            raise ValueError("DC scan with Se != 0")

        def dc_block(ci, td, by, bx):
            if ah == 0:
                if td not in dc_dec:
                    raise ValueError("scan references missing "
                                     "Huffman table")
                t = dc_dec[td].decode(reader)
                diff = _extend(reader.receive(t), t)
                state["preds"][ci] += diff
                coefs[ci][by, bx, 0] = state["preds"][ci] << al
            else:                                     # refinement
                if reader.read_bit():
                    coefs[ci][by, bx, 0] |= 1 << al

        if len(order) > 1:                            # interleaved
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci, td, _ta in order:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(ci, td, my * c["v"] + by,
                                         mx * c["h"] + bx)
        else:                                         # non-interleaved
            ci, td, _ta = order[0]
            c = comps[ci]
            bh_ = -(-(-(-h * c["v"] // vmax)) // 8)
            bw_ = -(-(-(-w * c["h"] // hmax)) // 8)
            for by in range(bh_):
                for bx in range(bw_):
                    maybe_restart()
                    dc_block(ci, td, by, bx)
        return

    # AC scan: exactly one component, non-interleaved (T.81 B.2.3)
    if len(order) != 1:
        raise ValueError("progressive AC scan with %d components"
                         % len(order))
    ci, _td, ta = order[0]
    if ta not in ac_dec:
        raise ValueError("scan references missing Huffman table")
    ac = ac_dec[ta]
    c = comps[ci]
    bh_ = -(-(-(-h * c["v"] // vmax)) // 8)
    bw_ = -(-(-(-w * c["h"] // hmax)) // 8)
    grid = coefs[ci]
    p1, m1 = 1 << al, -1 << al

    for by in range(bh_):
        for bx in range(bw_):
            maybe_restart()
            zz = grid[by, bx]
            if ah == 0:                               # first pass
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = ac.decode(reader)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16                   # ZRL
                            continue
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break                         # EOB
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    zz[k] = _extend(reader.receive(s), s) << al
                    k += 1
                continue
            # refinement pass (T.81 G.2 / the libjpeg-documented
            # correction-bit protocol)
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = ac.decode(reader)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s:
                        if s != 1:
                            raise ValueError(
                                "refinement magnitude > 1")
                        val = p1 if reader.read_bit() else m1
                    elif r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and \
                                    not (zz[k] & p1):
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if r == 0:
                                if val:
                                    zz[k] = val
                                break
                            r -= 1
                        k += 1
                    k += 1
            if state["eobrun"] > 0:
                # correction bits over the rest of the band (every
                # block of the EOB run carries them)
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and not (zz[k] & p1):
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                state["eobrun"] -= 1


def _default_progressive_script(ncomp: int):
    """The libjpeg-style spectral-selection + successive-approximation
    scan ladder (DC first at Al=1, split/full AC bands at reduced
    precision, then refinement scans down to bit 0)."""
    if ncomp == 1:
        return [([0], 0, 0, 0, 1),
                ([0], 1, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0)]
    return [([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0)]


def _validate_scan_script(scans, ncomp: int) -> None:
    """Reject scan scripts that would encode without error but decode
    to WRONG pixels (round-5 review finding): every coefficient
    position must be first-coded with Ah=0 exactly once and refined
    strictly one bit at a time (Ah == previous Al, Al == Ah - 1),
    DC must precede a component's AC scans, component indices must
    exist, AC scans name exactly one component."""
    cur = [[None] * 64 for _ in range(ncomp)]
    for si, (comp_idx, ss, se, ah, al) in enumerate(scans):
        for ci in comp_idx:
            if not 0 <= ci < ncomp:
                raise ValueError(
                    "scan %d names component %d of %d"
                    % (si, ci, ncomp))
        if not (0 <= ss <= se <= 63) or ah < 0 or al < 0:
            raise ValueError("scan %d has invalid Ss/Se/Ah/Al" % si)
        if ss == 0 and se != 0:
            raise ValueError(
                "scan %d mixes DC and AC (DC scans need Se=0)" % si)
        if ss > 0 and len(comp_idx) != 1:
            raise ValueError(
                "scan %d: progressive AC scans name exactly one "
                "component" % si)
        for ci in comp_idx:
            if ss > 0 and cur[ci][0] is None:
                raise ValueError(
                    "scan %d codes AC of component %d before its DC "
                    "scan" % (si, ci))
            for k in range(ss, se + 1):
                prev = cur[ci][k]
                if ah == 0:
                    if prev is not None:
                        raise ValueError(
                            "scan %d first-codes component %d "
                            "coefficient %d twice" % (si, ci, k))
                else:
                    if prev is None or ah != prev or al != ah - 1:
                        raise ValueError(
                            "scan %d breaks the successive-"
                            "approximation ladder at component %d "
                            "coefficient %d (need Ah == previous Al "
                            "and Al == Ah - 1)" % (si, ci, k))
                cur[ci][k] = al


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero
    (T.81 G.1.2.2 — DC uses an arithmetic shift instead)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _EobState:
    """Encoder-side EOB-run accumulator for refinement scans: the run
    length plus the correction bits buffered across its blocks,
    flushed together right after the EOBn symbol (the protocol the
    decoder's run-block correction reads rely on)."""

    def __init__(self, bw: "_BitWriter", ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.run = 0
        self.bits: list[int] = []

    def emit(self) -> None:
        if self.run:
            nbits = self.run.bit_length() - 1
            code, ln = self.ac[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.run - (1 << nbits), nbits)
            self.run = 0
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []


def _enc_ac_first(bw, grid, bh_, bw2, ac_codes, ss, se, al,
                  eob: "_EobState") -> None:
    for by in range(bh_):
        for bx in range(bw2):
            zz = grid[by, bx]
            vals = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
            last = -1
            for i, v in enumerate(vals):
                if v:
                    last = i
            if last < 0:
                eob.run += 1
                if eob.run == 0x7FFF:
                    eob.emit()
                continue
            eob.emit()
            r = 0
            for i in range(last + 1):
                v = vals[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                s = _category(v)
                code, ln = ac_codes[(r << 4) | s]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if last < se - ss:
                eob.run += 1
                if eob.run == 0x7FFF:
                    eob.emit()


def _enc_ac_refine(bw, grid, bh_, bw2, ac_codes, ss, se, al,
                   eob: "_EobState") -> None:
    for by in range(bh_):
        for bx in range(bw2):
            zz = grid[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob_k = -1
            for i, t in enumerate(absv):
                if t == 1:
                    eob_k = i
            r = 0
            pend: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                # ZRLs flush BEFORE any nonzero position — including
                # correction-only ones — so correction bits partition
                # around the ZRL exactly where the decoder's 16-zero
                # walk stops (the libjpeg refine-loop ordering; a
                # t==1-only flush desyncs when an already-significant
                # coefficient sits between the 16th zero and the next
                # newly-significant one)
                while r > 15 and i <= eob_k:
                    eob.emit()
                    code, ln = ac_codes[0xF0]
                    bw.write(code, ln)
                    r -= 16
                    for b in pend:
                        bw.write(b, 1)
                    pend = []
                if t > 1:
                    pend.append(t & 1)
                    continue
                # newly significant (t == 1)
                eob.emit()
                code, ln = ac_codes[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                for b in pend:
                    bw.write(b, 1)
                pend = []
                r = 0
            if r > 0 or pend:
                eob.run += 1
                eob.bits.extend(pend)
                if eob.run == 0x7FFF:
                    eob.emit()


def encode_jpeg_progressive(pixels: np.ndarray, *,
                            subsample: str = "444",
                            scans=None) -> bytes:
    """Progressive (SOF2) writer: spectral selection + successive
    approximation over the SAME Annex-K-quantized coefficients as the
    baseline writer, so ``decode_jpeg`` of the progressive bytes is
    EXACTLY equal to the baseline decode of the same pixels (both
    reconstruct the identical coefficient grid — the parity the tests
    assert). ``scans`` overrides the default libjpeg-style ladder
    with ``(component_indices, Ss, Se, Ah, Al)`` tuples."""
    h, w, samp, qids, coefs, mcux, mcuy = \
        _prepare_components(pixels, subsample)
    ncomp = len(samp)
    hids = [0] + ([1, 1] if ncomp > 1 else [])
    if scans is None:
        scans = _default_progressive_script(ncomp)
    _validate_scan_script(scans, ncomp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    def true_grid(ci):
        sh, sv = samp[ci]
        return (-(-(-(-h * sv // vmax)) // 8),
                -(-(-(-w * sh // hmax)) // 8))

    dc_tabs = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHROM)]
    # ONE shared AC table (id 0) for every component: AC_PROG covers
    # all symbols, so the chroma copy would be byte-identical
    ac_prog = _huff_codes(*AC_PROG)
    out = _write_headers(h, w, samp, qids, hids, sof_marker=b"\xc2",
                         ac_defs=(AC_PROG, AC_PROG), ac_ids=(0,))

    for comp_idx, ss, se, ah, al, in scans:
        bw = _BitWriter()
        if ss == 0:
            if se != 0:
                raise ValueError("DC scan with Se != 0")
            preds = {ci: 0 for ci in comp_idx}

            def dc_one(ci, by, bx):
                dc = int(coefs[ci][by, bx, 0])
                if ah == 0:
                    v = dc >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = _category(diff)
                    code, ln = dc_tabs[hids[ci]][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << s) - 1, s)
                else:
                    bw.write((dc >> al) & 1, 1)

            if len(comp_idx) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in comp_idx:
                            sh, sv = samp[ci]
                            for by in range(sv):
                                for bx in range(sh):
                                    dc_one(ci, my * sv + by,
                                           mx * sh + bx)
            else:
                ci = comp_idx[0]
                bh_, bw2 = true_grid(ci)
                for by in range(bh_):
                    for bx in range(bw2):
                        dc_one(ci, by, bx)
        else:
            if len(comp_idx) != 1:
                raise ValueError(
                    "progressive AC scan must name one component")
            ci = comp_idx[0]
            bh_, bw2 = true_grid(ci)
            eob = _EobState(bw, ac_prog)
            if ah == 0:
                _enc_ac_first(bw, coefs[ci], bh_, bw2,
                              ac_prog, ss, se, al, eob)
            else:
                _enc_ac_refine(bw, coefs[ci], bh_, bw2,
                               ac_prog, ss, se, al, eob)
            eob.emit()
        ns = len(comp_idx)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idx:
            out += bytes([ci + 1, (hids[ci] << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
