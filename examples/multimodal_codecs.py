#!/usr/bin/env python
"""Multimodal decode over a mixed-media binary column with the REAL
pure-numpy codecs: sniff each payload's magic bytes, route image rows
through the actor-pool decoders (PNG incl. packed sub-8-bit depths,
JPEG baseline AND progressive, animated GIF), and report per-format
geometry and luminance features — the plumbing a 100-TB image-bearing crawl
pipeline runs, minus only the exotic formats (video, arithmetic-coded
JPEG) that stay loud NotImplementedError boundaries.

    python examples/multimodal_codecs.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pyarrow as pa
import ray
import ray.data


def build_media_table(n: int = 48) -> pa.Table:
    """Deterministic mixed corpus: BMP, packed PNG, baseline JPEG,
    progressive JPEG, WAV, animated GIF and HTML rows interleaved."""
    from cdx_toolkit_ray.stages.gif import encode_gif
    from cdx_toolkit_ray.stages.jpeg import (encode_jpeg,
                                             encode_jpeg_progressive)
    from cdx_toolkit_ray.stages.multimodal import encode_bmp, encode_wav
    from cdx_toolkit_ray.stages.multimodal import encode_png

    rng = np.random.RandomState(42)
    rows = []
    for i in range(n):
        kind = i % 7
        if kind == 0:
            px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
            rows.append(encode_bmp(px))
        elif kind == 1:
            d = (1, 2, 4)[i % 3]
            px = rng.randint(0, 1 << d, (12, 20)).astype(np.uint8)
            rows.append(encode_png(px, depth=d))
        elif kind == 2:
            px = rng.randint(0, 256, (24, 16)).astype(np.uint8)
            rows.append(encode_jpeg(px))
        elif kind == 3:
            px = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
            rows.append(encode_jpeg_progressive(px, subsample="420"))
        elif kind == 4:
            samples = rng.randint(-2000, 2000, 256).astype(np.int16)
            rows.append(encode_wav(samples, 16000))
        elif kind == 5:
            pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
            anim = rng.randint(0, 8, (3, 10, 14)).astype(np.uint8)
            rows.append(encode_gif(anim, pal, delays_cs=[4, 4, 4]))
        else:
            rows.append(b"<html><body>not media</body></html>")
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "payload": pa.array(rows, pa.binary()),
    })


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cdx_toolkit_ray.stages.multimodal import MediaDecoder, sniff_batch

    ds = ray.data.from_arrow(build_media_table())
    ds = ds.map_batches(sniff_batch, batch_format="pyarrow",
                        batch_size=None)

    # route by sniffed type — servers lie about Content-Type, the
    # magic bytes do not
    import pyarrow.compute as pc

    for mime, decoder in [("image/png", "png"), ("image/jpeg", "jpeg"),
                          ("image/gif", "gif")]:
        sub = ds.map_batches(
            lambda b, m=mime: b.filter(pc.equal(b["sniffed_type"], m)),
            batch_format="pyarrow", batch_size=None)
        out = sub.map_batches(
            MediaDecoder, fn_constructor_kwargs={"decoder": decoder},
            batch_format="pyarrow", batch_size=16, concurrency=2)
        rows = out.take_all()
        dims = sorted({(r["width"], r["height"]) for r in rows})
        print("%-11s %2d payloads decoded, dims %s"
              % (mime, len(rows), dims))

    counts = {}
    for r in ds.select_columns(["sniffed_type"]).take_all():
        counts[r["sniffed_type"]] = counts.get(r["sniffed_type"], 0) + 1
    print("sniffed:", dict(sorted(counts.items())))
    ray.shutdown()


if __name__ == "__main__":
    main()
