"""Driver entry points: forward-step tracing + multi-device dry runs."""

import sys

import jax
import pytest

sys.path.insert(0, '/root/repo')


def test_entry_traces():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)      # traces the full fused step
    assert isinstance(out, tuple)


@pytest.mark.parametrize('n', [2, 8])
def test_dryrun_multichip(n):
    from dumphfdl_tpu.parallel.sharding import dryrun_multichip
    dryrun_multichip(n)


def test_mesh_shapes():
    from dumphfdl_tpu.parallel.sharding import make_mesh
    m = make_mesh(jax.devices()[:8])
    assert m.shape['time'] * m.shape['chan'] == 8
    m1 = make_mesh(jax.devices()[:1])
    assert m1.shape['time'] == 1 and m1.shape['chan'] == 1
