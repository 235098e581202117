import numpy as np
import pytest

import jax.numpy as jnp

from whisper_nemo_tpu.ops.ctc import _viterbi_forward_states
from whisper_nemo_tpu.ops.viterbi_pallas import viterbi_forward_pallas


def _random_case(t, n, v=8, seed=0):
    rng = np.random.default_rng(seed)
    em = np.log(rng.dirichlet(np.ones(v), size=t).astype(np.float32))
    labels = rng.integers(1, v, size=n).astype(np.int32)
    ll = 2 * n + 1
    state_labels = np.zeros((ll,), np.int32)
    state_labels[1::2] = labels
    allow_skip = np.zeros((ll,), bool)
    for s in range(3, ll, 2):
        allow_skip[s] = labels[(s - 1) // 2] != labels[(s - 3) // 2]
    e_states = em[:, state_labels]
    return e_states, allow_skip


@pytest.mark.parametrize("t,n", [(40, 5), (300, 20), (513, 70)])
def test_pallas_viterbi_matches_scan(t, n):
    e_states, allow_skip = _random_case(t, n, seed=t + n)
    a_ref, bp_ref = _viterbi_forward_states(
        jnp.asarray(e_states), jnp.asarray(allow_skip)
    )
    a_pal, bp_pal = viterbi_forward_pallas(
        jnp.asarray(e_states), jnp.asarray(allow_skip), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(a_pal), np.asarray(a_ref), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(bp_pal), np.asarray(bp_ref))
