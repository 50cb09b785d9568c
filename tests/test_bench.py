"""Benchmark harness: stats engine protocol, metrics models, exporters."""

import json

import pytest

from tpusparse import generate, ops
from tpusparse.bench import export, metrics, stats, sysinfo


class TestStats:
    def test_outlier_removal_two_sigma(self):
        times = [10.0] * 9 + [100.0]  # the 100 is way past 2σ
        s = stats.compute_stats(times)
        assert s.outliers_removed == 1
        assert s.valid_runs == 9
        assert s.median_ms == 10.0
        assert s.max_ms == 10.0

    def test_median_run_index_points_into_original_list(self):
        times = [5.0, 3.0, 9.0, 4.0, 100.0]
        s = stats.compute_stats(times)
        # 100 is dropped; median of {5,3,9,4} = 4.5 → closest is 4.0 or 5.0
        assert s.times_ms[s.median_run_index] in (4.0, 5.0)

    def test_min_runs_enforced(self):
        with pytest.raises(ValueError):
            stats.compute_stats([1.0, 2.0])

    def test_degenerate_all_identical(self):
        s = stats.compute_stats([7.0] * 10)
        assert s.outliers_removed == 0
        assert s.std_ms == 0.0

    def test_benchmark_with_stats_runs_warmup(self):
        calls = []
        def run():
            calls.append(1)
            return 1.0
        s = stats.benchmark_with_stats(run, num_runs=10, warmup=5)
        assert len(calls) == 15
        assert s.total_runs == 10

    def test_solver_stats_median_payload(self):
        seq = iter([(9.0, "a"), (1.0, "b"), (5.0, "c"), (4.0, "d"), (6.0, "e")])
        s, payload = stats.benchmark_solver_with_stats(
            lambda: next(seq), num_runs=5, warmup=0
        )
        assert payload == "c"  # 5.0 is the median of {9,1,5,4,6}


class TestMetrics:
    def test_stencil5_byte_model(self):
        # 7 words/point: 5 coefficients + x + y (48 B/row in f64, the reference's model)
        assert metrics.bytes_stencil5(100, 8) == 5600
        assert metrics.bytes_stencil5_const(100, 8) == 1600

    def test_csr_byte_model_matches_reference_shape(self):
        # nnz*(8+4) + (rows+1)*4 + 2*rows*8 for f64 (spmv_metrics.cu:76-95)
        assert metrics.bytes_csr(10, 4, itemsize=8) == 10 * 12 + 5 * 4 + 2 * 4 * 8

    def test_roofline_fraction_and_bound(self):
        st = generate.make_stencil5(8)
        op = ops.get_operator("stencil5", st)
        m = metrics.calculate_spmv_metrics(
            op, 1.0, dtype_itemsize=4, device_kind="TPU v5 lite", mode="stencil5"
        )
        assert 0 < m.roofline_fraction < 1e-3  # 1 ms for a tiny matrix ⇒ tiny fraction
        assert m.bound == "memory-bound"
        assert m.gflops == pytest.approx(2 * op.nnz / 1e6)  # 1 ms ⇒ 2·nnz·1e3 FLOP/s

    def test_chip_peaks_known_kinds(self):
        assert metrics.chip_peaks("TPU v5 lite")[0] == 819.0
        assert metrics.chip_peaks("TPU v5p something")[0] == 2765.0
        assert metrics.chip_peaks("unknown chip")[0] == 819.0

    def test_cg_gflops(self):
        assert metrics.cg_gflops(1000, 10, 2.0) == pytest.approx(2 * 1000 * 10 / 2e-3 / 1e9)


class TestExport:
    def _result(self):
        st = generate.make_stencil5(8)
        op = ops.get_operator("stencil5", st)
        bench = stats.compute_stats([1.0, 1.1, 0.9, 1.05])
        m = metrics.calculate_spmv_metrics(
            op, bench.median_ms, dtype_itemsize=8, device_kind="cpu", mode="stencil5"
        )
        info = sysinfo.get_system_info()
        return export.spmv_result_dict(
            mode="stencil5", matrix_name="t", op=op, metrics=m, stats=bench,
            sysinfo=info, sum_y=1.0, norm2_y=2.0,
        )

    def test_json_roundtrip(self, tmp_path):
        p = str(tmp_path / "r.json")
        export.write_json(p, self._result())
        with open(p) as f:
            r = json.load(f)
        assert r["benchmark"]["validation"]["sum_y"] == 1.0
        assert r["benchmark"]["matrix"]["grid_size"] == 8
        assert "device_kind" in r["device"]

    def test_csv_append_header_once(self, tmp_path):
        p = str(tmp_path / "r.csv")
        export.append_csv(p, self._result())
        export.append_csv(p, self._result())
        lines = open(p).read().strip().splitlines()
        assert len(lines) == 3  # one header + two rows
        assert lines[0].startswith("timestamp")

    def test_human_print_sections(self, capsys):
        export.print_human_spmv(self._result())
        out = capsys.readouterr().out
        assert "=== SpMV Performance Metrics ===" in out
        assert "=== Output Checksum ===" in out
        assert "Sum(y)" in out


def test_sysinfo_fields():
    info = sysinfo.get_system_info()
    for key in ("device_kind", "jax_version", "num_devices", "peak_hbm_gbs", "backend"):
        assert key in info
    import jax

    expected = 8 if jax.default_backend() == "cpu" else jax.device_count()
    assert info["num_devices"] == expected  # 8-virtual CPU mesh; real count on hardware


class TestKernelTimeProtocol:
    """Pin the chained-launch kernel-timing protocol (ops.DeviceOperator.kernel_time_ms):
    every headline bandwidth number is derived from it, so its semantics — chain-of-k time
    ≈ k × single-apply, adaptive chain shortening never nonsensical — are regression-gated
    here with a deterministic fake operator (sleep-based run_device)."""

    @staticmethod
    def _fake_op(apply_seconds):
        import time

        import jax.numpy as jnp

        from tpusparse.ops import DeviceOperator

        def run_device(x):
            time.sleep(apply_seconds)
            return x

        return DeviceOperator(
            name="fake", num_rows=64, num_cols=64, nnz=64, field_shape=(8, 8),
            run_device=run_device, run_device_dot=lambda x: (x, jnp.vdot(x, x)),
            _buffers={"dtype": jnp.float32},
        )

    def test_chain_of_k_matches_k_times_single(self):
        per_apply_ms = 10.0
        op = self._fake_op(per_apply_ms / 1e3)
        measured = op.kernel_time_ms(chain=5, reps=2)
        # chain-of-5 wall time / 5 must recover the per-apply cost (generous bounds for
        # scheduler noise; the lower bound is hard — sleep cannot be measured short)
        assert measured >= 0.9 * per_apply_ms, measured
        assert measured <= 3.0 * per_apply_ms, measured

    def test_adaptive_chain_shortening_stays_sane(self):
        # A slow operator (120 ms/apply) forces the adaptive shortening path
        # (chain scaled to keep a rep under ~1 s) — the result must still be the
        # per-apply time, never a nonsensical total or zero.
        per_apply_ms = 120.0
        op = self._fake_op(per_apply_ms / 1e3)
        measured = op.kernel_time_ms(chain=20, reps=3)
        assert measured >= 0.9 * per_apply_ms, measured
        assert measured <= 2.0 * per_apply_ms, measured

    def test_real_operator_positive_and_finite(self):
        import math

        st = generate.make_stencil5(16)
        op = ops.get_operator("stencil5-xla", st)
        t = op.kernel_time_ms(chain=4, reps=2)
        assert math.isfinite(t) and t > 0.0
