"""Native C++ (XLA FFI custom call) backend vs the jnp compute paths.

Closes the oracle chain from the other direction: the C++ code implements
the reference CUDA kernels' exact algorithms (direct-difference distances,
insertion-sort kNN, scalar approxmatch), so agreement with the jnp paths
validates both against the reference's native semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native backend unavailable (no g++?)")


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(2, 48, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
    return a, b


def test_native_knnquery(clouds):
    from pdgn_tpu.ops import knn

    a, b = clouds
    idx, d2 = native.knnquery_cpu(a, b, 6)
    idx_j, d2_j = knn(a, b, 6, return_dist=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_j))
    # direct-difference vs expansion formula: small absolute slack
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2_j), atol=1e-4)


def test_native_nndistance(clouds):
    from pdgn_tpu.losses.chamfer import dist_chamfer

    a, b = clouds
    dl_n, dr_n = native.nndistance_cpu(a, b)   # (b,n): min over y; (b,m)
    dl_j, dr_j = dist_chamfer(a, b)            # (b,m): min over a; (b,n)
    np.testing.assert_allclose(np.asarray(dl_n), np.asarray(dr_j), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dr_n), np.asarray(dl_j), atol=1e-4)


def test_native_approxmatch(clouds):
    from pdgn_tpu.losses.emd import match_cost

    a, _ = clouds
    b = a[:, ::-1, :] + 0.05
    c_n = np.asarray(native.approxmatch_cpu(a, b))
    c_j = np.asarray(match_cost(a, b))
    np.testing.assert_allclose(c_n, c_j, rtol=2e-4)


def test_native_fps(clouds):
    from pdgn_tpu.ops import furthest_point_sample

    a, _ = clouds
    np.testing.assert_array_equal(
        np.asarray(native.fps_cpu(a, 12)),
        np.asarray(furthest_point_sample(a, 12)),
    )
