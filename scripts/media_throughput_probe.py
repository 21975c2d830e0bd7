#!/usr/bin/env python
"""Decode-throughput disclosure for the media codec seam (VERDICT r9 #3).

Measures bytes/sec of the PURE-PYTHON codecs (the hash-exact correctness
anchors) and, when pillow is importable, the NATIVE path the
SPARK_GRAFT_NATIVE_CODECS flag routes to — asserting pixel equality on
lossless formats (PNG/GIF/BMP decode is deterministic, so PIL and the
pure decoder must agree bit-exactly) and max-abs-diff tolerance on JPEG
(IDCT implementations legitimately differ within ±1-2 levels).

Driver-side, no Spark: the seam is per-payload, so single-process
numbers ARE the per-core executor numbers; multiply by cores for
cluster throughput.  Results go to BASELINE.md as the quantified basis
for the 100 TB media claim.

Usage: python scripts/media_throughput_probe.py [--n 64] [--side 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from target_parquet_spark.operators import multimodal as M  # noqa: E402


def _img(seed: int, h: int, w: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    # smooth-ish content: realistic compressibility for PNG/JPEG/LZW
    base = rng.randint(0, 256, size=(h // 8 + 1, w // 8 + 1, 3))
    big = np.kron(base, np.ones((8, 8, 1))).astype(np.int64)
    noise = rng.randint(-8, 9, size=big.shape)
    return np.clip(big + noise, 0, 255)[:h, :w].astype(np.uint8)


def _payloads(fmt: str, n: int, side: int):
    out = []
    for i in range(n):
        arr = _img(i, side, side)
        if fmt == "png":
            out.append(M.encode_png(arr))
        elif fmt == "bmp":
            out.append(M.encode_bmp(arr))
        elif fmt == "jpeg":
            out.append(M.encode_jpeg(arr))
        elif fmt == "gif":
            pal = np.frombuffer(M.gif_palette(), np.uint8).reshape(256, 3)
            lut = np.zeros(256, np.uint8)
            lut[pal[:, 0]] = np.arange(256, dtype=np.uint8)
            # palette-index the first channel so decode is exact
            out.append(M.encode_gif(lut[arr[:, :, 0]]))
        else:
            raise ValueError(fmt)
    return out


_PURE = {
    "png": M.decode_png,
    "bmp": M.decode_bmp,
    "jpeg": M.decode_jpeg,
    "gif": M.decode_gif,
}


def _bench(fn, payloads, reps: int = 3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for p in payloads:
            fn(p)
        best = min(best, time.perf_counter() - t0)
    return sum(len(p) for p in payloads) / best  # bytes/sec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--side", type=int, default=96)
    args = ap.parse_args()

    native = M._PIL_Image is not None
    rows = {}
    for fmt in ("bmp", "png", "gif", "jpeg"):
        payloads = _payloads(fmt, args.n, args.side)
        pure_bps = _bench(_PURE[fmt], payloads)
        row = {"pure_mbps": round(pure_bps / 1e6, 3)}
        if native:
            nat_bps = _bench(M.native_decode_rgb, payloads)
            row["native_mbps"] = round(nat_bps / 1e6, 3)
            row["speedup"] = round(nat_bps / pure_bps, 1)
            # correctness of the native routing on this corpus
            for p in payloads[:8]:
                pure_px = _PURE[fmt](p)
                if pure_px.ndim == 2:
                    pure_px = np.repeat(pure_px[:, :, None], 3, axis=2)
                pure_px = pure_px[:, :, :3]
                nat_px = M.native_decode_rgb(p)
                if fmt == "jpeg":
                    d = int(
                        np.abs(
                            pure_px.astype(np.int64)
                            - nat_px.astype(np.int64)
                        ).max()
                    )
                    assert d <= 2, f"jpeg IDCT divergence {d} > 2"
                    row["jpeg_max_abs_diff"] = max(
                        row.get("jpeg_max_abs_diff", 0), d
                    )
                else:
                    assert np.array_equal(pure_px, nat_px), (
                        f"{fmt}: native decode != pure decode"
                    )
        rows[fmt] = row

    print(f"| format | pure MB/s | native MB/s | speedup | n={args.n} "
          f"{args.side}x{args.side} |")
    print("|---|---|---|---|---|")
    for fmt, r in rows.items():
        print(
            f"| {fmt} | {r['pure_mbps']} | "
            f"{r.get('native_mbps', 'n/a (pillow absent)')} | "
            f"{r.get('speedup', '-')} | |"
        )
    print(json.dumps({"native_available": native, "rows": rows}))


if __name__ == "__main__":
    main()
