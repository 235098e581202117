"""Test configuration: force JAX onto an 8-device virtual CPU platform.

Tests must run without TPU hardware; multi-chip sharding is exercised on
a virtual 8-device CPU mesh (SURVEY §4's implication: emulate the core
group split without a pod). The axon sitecustomize registers a TPU
backend eagerly, so the platform override must happen via jax.config
before any backend query, not via environment variables alone.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# production-scale fallback models (MMS-300M aligner etc.) are too slow
# for CPU unit tests; components select compact dims under this flag
os.environ["WNT_TEST_SMALL_MODELS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXTURE_OPUS = REPO_ROOT / "tests" / "assets" / "test.opus"


@pytest.fixture(scope="session")
def fixture_opus() -> pathlib.Path:
    if not FIXTURE_OPUS.exists():
        pytest.skip("reference opus fixture not available")
    from whisper_nemo_tpu.audio.decode import native_decoder_available

    if not native_decoder_available():
        pytest.skip(
            "native audio decoder unavailable (no libav toolchain); "
            "compressed-format tests need it"
        )
    return FIXTURE_OPUS


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert len(devices) == 8, devices
    return devices


@pytest.fixture(autouse=True, scope="module")
def _bound_process_memory_maps():
    """Keep the process under the kernel's vm.max_map_count (65530).

    XLA CPU leaves mapped code pages per compiled executable; across
    the full ~450-test suite the map count crosses the cap near the
    tail and the NEXT compile segfaults inside
    ``backend_compile_and_load`` (reproduced twice at ~95%, different
    tests each time — positional, not test-specific; ~13k maps at 15%
    of the suite). Dropping the jit caches when the count gets high
    bounds it; a module only pays recompiles when the cap is near.
    """
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        n = 0
    if n > 40_000:
        import gc

        jax.clear_caches()
        gc.collect()
    yield
