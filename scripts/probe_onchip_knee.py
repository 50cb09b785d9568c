#!/usr/bin/env python
"""Measure and record the on-chip residency knee (bench.probes.measure_onchip_knee).

Writes docs/results/onchip_knee_<kind>.json — the artifact calibrating
``metrics.ON_CHIP_KNEE_BYTES`` and the ``working_set_below_onchip_knee`` flag that
small-grid SpMV artifacts carry: below the knee a chained-apply timing divides an HBM
byte model by a time the data never paid HBM for, so its "bandwidth" is an on-chip
figure.  The reference never needed this disclosure (A100 L2 is 40 MB and its smallest
published operand is 6 GB); on a 16 GB v5e the parity-test grids (2048², 2560²) fit
on-chip and the flag is load-bearing."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpusparse.bench import probes, sysinfo  # noqa: E402
from tpusparse.bench.metrics import ON_CHIP_KNEE_BYTES, chip_peaks  # noqa: E402
from tpusparse.dist import enable_compilation_cache  # noqa: E402


def main():
    enable_compilation_cache()
    info = sysinfo.get_system_info()
    r = probes.measure_onchip_knee()
    r.update(
        device=info,
        nominal_hbm_gbs=chip_peaks(info["device_kind"])[0],
        knee_bytes_assumed_by_metrics=ON_CHIP_KNEE_BYTES,
    )
    kind = info["device_kind"].lower().replace(" ", "_")
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "results",
                       f"onchip_knee_{kind}.json")
    with open(out, "w") as f:
        json.dump(r, f, indent=2)
    for p in r["points"]:
        print(f"{p['footprint_mib']:>5} MiB : {p['copy_chain_gbs']:8.1f} GB/s")
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
