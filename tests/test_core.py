"""core/ substrate: collectives wrappers, dtype policy, multihost helpers,
and the mesh utilities' less-traveled paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dalm_tpu.core import comms
from dalm_tpu.core.dtypes import DEFAULT_POLICY, FP32_POLICY, parse_dtype
from dalm_tpu.core.mesh import MeshConfig, make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=4, model=2))


def test_comms_psum_pmean_allgather(mesh):
    def f(x):
        return (
            comms.psum(x.sum(), "data"),
            comms.pmean(x.sum(), "data"),
            comms.all_gather(x, "data", axis=0),
        )

    mapped = jax.shard_map(
        f, mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(), P(), P(None, None)),
        check_vma=False,
    )
    x = np.arange(16, dtype=np.float32).reshape(8, 2)
    s, m, g = jax.jit(mapped)(x)
    np.testing.assert_allclose(float(s), x.sum())
    np.testing.assert_allclose(float(m), x.sum() / 4)
    np.testing.assert_allclose(np.asarray(g), x)


def test_comms_ppermute_ring(mesh):
    def f(x):
        return comms.ppermute_ring(x, "data", shift=1)

    mapped = jax.shard_map(
        f, mesh=mesh, in_specs=P("data", None), out_specs=P("data", None),
        check_vma=False,
    )
    x = np.arange(8, dtype=np.float32).reshape(8, 1)
    out = np.asarray(jax.jit(mapped)(x))
    # shard i's rows moved to shard (i+1) % 4 (2 rows per shard)
    expected = np.roll(x.reshape(4, 2, 1), 1, axis=0).reshape(8, 1)
    np.testing.assert_allclose(out, expected)


def test_global_batch_size(mesh):
    assert comms.global_batch_size(3, mesh) == 12
    assert comms.global_batch_size(2) == 2 * jax.device_count()


def test_dtype_policy_casts():
    tree = {"w": jnp.ones((2, 2), jnp.float32), "i": jnp.ones((2,), jnp.int32)}
    c = DEFAULT_POLICY.cast_to_compute(tree)
    assert c["w"].dtype == jnp.bfloat16
    assert c["i"].dtype == jnp.int32  # non-float untouched
    o = DEFAULT_POLICY.cast_to_output(c)
    assert o["w"].dtype == jnp.float32
    assert FP32_POLICY.compute_dtype == jnp.float32


def test_parse_dtype():
    assert parse_dtype("bf16") == jnp.bfloat16
    assert parse_dtype("float32") == jnp.float32
    with pytest.raises(ValueError, match="unknown dtype"):
        parse_dtype("int7")


def test_multihost_single_host_identity():
    from dalm_tpu.core import multihost

    multihost.initialize_distributed()  # no-op single host, idempotent
    multihost.initialize_distributed()
    assert multihost.is_main_process()
    sl = multihost.host_batch_slice(32)
    assert (sl.start, sl.stop) == (0, 32)


def test_mesh_rejects_bad_shape():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(MeshConfig(data=3, model=5))
