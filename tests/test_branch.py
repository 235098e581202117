import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_nemo_tpu.parallel.branch import asr_and_diarization, run_branches


def test_run_branches_disjoint_devices(cpu_devices):
    seen = {}

    def branch_a(devices):
        seen["a"] = devices
        x = jax.device_put(jnp.ones((4, 4)), devices[0])
        return float(jnp.sum(x))

    def branch_b(devices):
        seen["b"] = devices
        x = jax.device_put(jnp.ones((2, 2)) * 2, devices[0])
        return float(jnp.sum(x))

    a, b = run_branches([branch_a, branch_b], fractions=[0.75, 0.25])
    assert a == 16.0
    assert b == 8.0
    assert len(seen["a"]) == 6 and len(seen["b"]) == 2
    assert not (set(seen["a"]) & set(seen["b"]))


def test_branch_error_surfaces_at_join(cpu_devices):
    def good(devices):
        return 1

    def bad(devices):
        raise ValueError("diarizer exploded")

    with pytest.raises(RuntimeError, match="branch 1 failed"):
        run_branches([good, bad])


def test_asr_and_diarization_split(cpu_devices):
    asr, diar = asr_and_diarization(
        lambda d: ("asr", len(d)), lambda d: ("diar", len(d))
    )
    assert asr == ("asr", 6)
    assert diar == ("diar", 2)


def test_single_device_sharing():
    devices = jax.devices()[:1]
    a, b = run_branches(
        [lambda d: len(d), lambda d: len(d)], devices=devices
    )
    assert a == b == 1
