"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample operators are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested, while
the codec itself is STUBBED (no image/audio libraries in this
container):

* ``decoder="fake"``  — deterministic pure-python stand-in (byte
  histogram features, size parsing from a fake header) used by tests
* ``decoder="pil"`` / ``"ffmpeg"`` — raise NotImplementedError at
  actor construction with a clear message

Large-payload guidance baked in: use small ``batch_size`` (payloads x
batch x concurrency must fit worker heap) and keep the column in Arrow
(``batch_format='pyarrow'``) — binary does not survive pandas round
trips unscathed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.binary()),
    ("media_type", pa.string()),      # 'image' | 'audio' | 'video'
    ("meta", pa.string()),            # JSON metadata
])


def fake_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows: payload = 8-byte header
    (width, height big-endian uint32) + pseudo-random body."""
    rng = np.random.RandomState(seed)
    ids, payloads, types = [], [], []
    for i in range(n):
        w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
        body = rng.bytes(w * h % 512 + 16)
        payloads.append(w.to_bytes(4, "big") + h.to_bytes(4, "big") + body)
        ids.append(i)
        types.append(["image", "audio", "video"][i % 3])
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
        "meta": pa.array(["{}"] * n, pa.string()),
    }, schema=MEDIA_SCHEMA)


def fake_media_parquet(n: int = 256, seed: int = 42) -> str:
    """Write :func:`fake_media_table` to a deterministic /tmp path and
    return it — the shared input for the media catalog queries and
    their DuckDB oracles (which parse the same payload headers via
    ``hex(payload)``)."""
    import os

    import pyarrow.parquet as pq

    path = "/tmp/cdxray_media_n%d_s%d.parquet" % (n, seed)
    if not os.path.exists(path):
        tmp = path + ".tmp-%d" % os.getpid()
        pq.write_table(fake_media_table(n, seed), tmp)
        os.replace(tmp, path)
    return path


class MediaDecoder:
    """Actor-pool stage: payload -> decoded features.

    Use as ``ds.map_batches(MediaDecoder, fn_constructor_kwargs=
    {"decoder": "fake"}, batch_format="pyarrow", batch_size=32,
    concurrency=N)`` — small batches because payloads are wide.
    """

    def __init__(self, decoder: str = "fake"):
        if decoder == "fake":
            self._decode = self._decode_fake
        elif decoder in ("pil", "ffmpeg"):
            raise NotImplementedError(
                "decoder %r needs an image/audio library not present in "
                "this environment; plug the real codec in here — the "
                "pipeline plumbing (schema, batching, actor pool) is "
                "already wired" % decoder)
        else:
            raise ValueError("unknown decoder " + decoder)

    @staticmethod
    def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
        w = int.from_bytes(payload[0:4], "big")
        h = int.from_bytes(payload[4:8], "big")
        body = np.frombuffer(payload[8:], dtype=np.uint8)
        hist = np.bincount(body >> 4, minlength=16).astype(np.float32)
        hist /= max(1.0, hist.sum())
        return w, h, hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        ws = np.zeros(n, np.int32)
        hs = np.zeros(n, np.int32)
        feats = np.zeros((n, 16), np.float32)
        for i, p in enumerate(payloads):
            if p is None or len(p) < 8:
                continue
            ws[i], hs[i], feats[i] = self._decode(p)
        batch = batch.append_column("width", pa.array(ws, pa.int32()))
        batch = batch.append_column("height", pa.array(hs, pa.int32()))
        batch = batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), 16))
        return batch


class FrameSampler:
    """Actor-pool stage: sample every ``stride``-th 'frame' (fixed-size
    slice) of a video payload — the frame-sample plumbing with a fake
    frame model (frame = 64-byte slice)."""

    def __init__(self, stride: int = 4, frame_bytes: int = 64):
        self.stride = stride
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        counts = np.zeros(len(payloads), np.int32)
        samples = np.empty(len(payloads), dtype=object)
        for i, p in enumerate(payloads):
            if p is None:
                samples[i] = b""
                continue
            frames = [p[j:j + self.frame_bytes]
                      for j in range(8, len(p), self.frame_bytes)]
            picked = frames[::self.stride]
            counts[i] = len(picked)
            samples[i] = b"".join(picked)
        batch = batch.append_column("n_frames_sampled",
                                    pa.array(counts, pa.int32()))
        batch = batch.append_column("sampled_frames",
                                    pa.array(samples, pa.binary()))
        return batch
