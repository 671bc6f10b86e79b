"""Test harness: run everything on CPU with 8 fake XLA devices so mesh/pjit
code paths are exercised without a TPU pod (SURVEY.md §4 — the standard
JAX mechanism for testing multi-device code)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # env may pre-set a TPU platform (axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the env var read at import; the config update
# (applied before backend initialization) reliably selects CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from zerospeech_tts_tpu.config import AudioConfig, Hps  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_state():
    """Drop compiled executables between modules.

    The full suite compiles several hundred XLA CPU programs in one
    process; past ~145 tests the next compile segfaults inside LLVM
    (reproduced twice at the same test, passes in isolation — cumulative
    compiler state, not a code bug). Releasing the jit caches after each
    module keeps the live-executable count bounded; cross-module program
    reuse is rare so the recompile cost is small."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def audio_cfg() -> AudioConfig:
    return AudioConfig()


@pytest.fixture(scope="session")
def tiny_hps() -> Hps:
    """Small geometry for fast CPU tests."""
    return Hps(
        speaker_norm=False,  # tests build raw h5s without stats groups
        batch_size=4,
        seg_len=32,
        n_feat=64,
        emb_size=32,
        spk_emb_size=8,
        n_speakers=4,
        bank_size=4,
        bank_channels=8,
        conv_channels=16,
        n_critic=1,
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
