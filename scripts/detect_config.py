#!/usr/bin/env python
"""Environment / problem-size detection — the reference's scripts/setup/detect_gpu_config.sh
analog (max matrix size from VRAM x safety factor).

Prints the device inventory and the largest stencil grid that fits per mode.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def max_grid(hbm_bytes: float, itemsize: int, words_per_point: float,
             safety: float = 0.85) -> int:
    # words_per_point: persistent arrays per grid point (planes + CG vectors)
    import math

    g = math.isqrt(int(hbm_bytes * safety / (words_per_point * itemsize)))
    return g - g % 128  # lane-aligned


def main() -> int:
    from tpusparse.bench import sysinfo

    info = sysinfo.get_system_info()
    print(f"device:      {info['device_kind']} x{info['num_devices']} "
          f"({info['num_processes']} process(es))")
    print(f"jax:         {info['jax_version']} (backend={info['backend']}, "
          f"x64={info['x64_enabled']})")
    print(f"peak HBM:    {info['peak_hbm_gbs']} GB/s per chip")
    hbm = info.get("hbm_bytes_limit") or 16e9
    print(f"HBM budget:  {hbm / 1e9:.1f} GB per chip")
    n = info["num_devices"]
    # f32-words/pt, CALIBRATED on a 16 GB v5e: persistent state (planes + x,r,p,Ap, b
    # in-graph) plus ~1-2 words of loop transients.  Measured anchors: values OOMs at
    # 20480² (→10), bf16c fits 20480² (→7.5), const fits 23040² and OOMs at 25600² (→6).
    for name, wpp in (("stencil5 CG (values)", 10), ("stencil5-bf16c CG", 7.5),
                      ("stencil5-const CG", 6), ("SpMV only (values)", 7)):
        g1 = max_grid(hbm, 4, wpp)
        gn = max_grid(hbm * n, 4, wpp)
        print(f"max grid f32 {name:22s}: {g1:>7,} single chip | {gn:>7,} on {n} chips")
    # f64 on TPU (XLA-emulated): values-carrying OOMs already at 10240² (measured 19.6 GB
    # — planes + hi/lo-split temps); the values-free const-xla path fits 10240².  One
    # measured fit anchor only, so report the anchor, not an extrapolated max.
    print("f64 CG (stencil5-const-xla)        :  10,240 fits (measured); values-carrying"
          " f64 OOMs at 10,240 (19.6 GB)")
    from tpusparse import native

    print(f"native io:   {'built' if native.available() else 'numpy fallback'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
