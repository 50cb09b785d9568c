"""Device/system provenance for benchmark exports.

Parity with the reference's gpu_detection.cu: cudaGetDeviceProperties + driver/runtime versions
(:76-108), /proc/cpuinfo CPU model (:9-33), sysconf RAM (:35-39).  The nvidia-smi popen fields
(temperature, power, PCIe — :41-74) have no TPU analog here; jax/libtpu versions and device
attributes play the provenance role instead.
"""

from __future__ import annotations

import os
import platform
from typing import Any, Dict


def _cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def _ram_gb() -> float:
    try:
        page = os.sysconf("SC_PAGE_SIZE")
        pages = os.sysconf("SC_PHYS_PAGES")
        return page * pages / 1e9
    except (ValueError, OSError):
        return 0.0


def get_system_info() -> Dict[str, Any]:
    import jax

    dev = jax.devices()[0]
    info: Dict[str, Any] = {
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "platform": dev.platform,
        "num_devices": jax.device_count(),
        "num_local_devices": jax.local_device_count(),
        "num_processes": jax.process_count(),
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "x64_enabled": bool(jax.config.jax_enable_x64),
        "cpu_model": _cpu_model(),
        "ram_gb": round(_ram_gb(), 1),
        "hostname": platform.node(),
        "python": platform.python_version(),
    }
    try:
        import jaxlib

        info["jaxlib_version"] = jaxlib.__version__
    except Exception:
        pass
    try:
        import libtpu

        info["libtpu_version"] = getattr(libtpu, "__version__", "present")
    except Exception:
        info["libtpu_version"] = None
    try:
        stats = dev.memory_stats()
        if stats:
            info["hbm_bytes_limit"] = stats.get("bytes_limit")
    except Exception:
        pass
    from .metrics import chip_peaks

    peak_bw, peak_flops = chip_peaks(info["device_kind"])
    info["peak_hbm_gbs"] = peak_bw
    info["peak_f32_gflops"] = peak_flops
    return info
