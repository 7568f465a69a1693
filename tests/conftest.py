"""Test config: CPU backend with a virtual 8-device mesh.

Mirrors the SURVEY §4 recommendation: golden-fixture tests run on the
CPU jit path so CI needs no TPU; multi-device sharding tests use
xla_force_host_platform_device_count.
"""

import os

# Opt-in real-TPU tier: RAPIDNET_TPU_TESTS=1 python -m pytest -m tpu
# leaves the session's TPU platform pinned so the @pytest.mark.tpu
# suite (tests/test_tpu_compile.py) COMPILES the Pallas kernels on the
# real chip (VERDICT r3: interpret-mode-only coverage would let a
# Mosaic layout/VMEM regression pass CI).
TPU_TIER = os.environ.get("RAPIDNET_TPU_TESTS") == "1"

if not TPU_TIER:
    # Force the CPU backend for tests even when the session targets a
    # TPU.  The machine's sitecustomize registers the axon TPU plugin
    # and pins the platform programmatically, so the env var alone is
    # not enough — the jax.config update below is what actually wins.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: compiles kernels on the real TPU (opt-in: "
        "RAPIDNET_TPU_TESTS=1 pytest -m tpu)")

import numpy as np
import pytest

REFERENCE_FIXTURES = "/root/reference/src/test/testDataFiles"
REFERENCE_DATA = "/root/reference/src/dataFiles"


def fixture_path(name: str) -> str:
    return os.path.join(REFERENCE_FIXTURES, name)


requires_reference = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_FIXTURES),
    reason="reference fixture files not available")


@pytest.fixture(scope="session")
def ref_problem():
    """The 3-tank / K=6 / N=24 golden test problem of the reference."""
    if not os.path.isdir(REFERENCE_FIXTURES):
        pytest.skip("reference fixtures not available")
    from rapidnet_tpu.model.config import SmpcConfig
    from rapidnet_tpu.model.network import DwnNetwork
    from rapidnet_tpu.model.scenario_tree import ScenarioTree
    from rapidnet_tpu.model.forecaster import JsonForecaster

    config = SmpcConfig.from_json(fixture_path("controllerConfig.json"))
    network = DwnNetwork.from_json(fixture_path("network.json"))
    tree = ScenarioTree.from_json(fixture_path("scenarioTree.json"))
    forecaster = JsonForecaster(fixture_path("forecastor.json"))
    return dict(config=config, network=network, tree=tree,
                forecaster=forecaster)


@pytest.fixture(scope="session")
def ref_engine(ref_problem):
    from rapidnet_tpu.engine.engine import Engine
    eng = Engine(ref_problem["network"], ref_problem["tree"],
                 ref_problem["config"])
    eng.factor_step()
    return eng
