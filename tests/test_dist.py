"""dist/profiling helpers on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tpusparse import dist
from tpusparse.bench import profiling


def test_make_band_mesh_all_devices():
    mesh = dist.make_band_mesh()
    assert mesh.axis_names == ("x",)
    assert mesh.devices.size == jax.device_count()


def test_make_band_mesh_subset():
    n = min(4, jax.device_count())
    mesh = dist.make_band_mesh(n)
    assert mesh.devices.size == n


def test_describe_mesh():
    n = min(2, jax.device_count())
    d = dist.describe_mesh(dist.make_band_mesh(n))
    assert d["axes"] == {"x": n}
    assert d["num_devices"] == n
    assert d["num_processes"] == 1


def test_local_band_rows_partition_math():
    # reference partition: n/P each, last absorbs remainder (:262-268); ours spreads the
    # remainder forward — verify full coverage and monotonicity either way
    g, p = 23, 4
    ranges = [dist.local_band_rows(g, p, i) for i in range(p)]
    assert ranges[0][0] == 0 and ranges[-1][1] == g
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 == b0
        assert a1 > a0


def test_is_multihost_false_in_tests():
    assert not dist.is_multihost()


def test_profiling_scope_inside_jit():
    @jax.jit
    def f(x):
        with profiling.scope(profiling.PHASE_SPMV):
            return x * 2.0

    np.testing.assert_allclose(np.asarray(f(jnp.ones(4))), 2.0)


def test_capture_trace_writes_logdir(tmp_path):
    logdir = str(tmp_path / "tr")
    out = profiling.profiled_run(lambda: jnp.sum(jnp.ones((64, 64))), logdir=logdir)
    assert float(out) == 64 * 64
    import os

    assert os.path.isdir(logdir) and os.listdir(logdir)
