"""Test configuration.

Multi-chip logic is tested on a virtual 8-device CPU mesh — the TPU-native
analog of "test multi-node without a cluster" (SURVEY.md §4). These env vars
must be set before jax initializes its backends, hence the module-level
placement ahead of any jax import.
"""
import os

# NOTE: this image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (real TPU), so env vars alone are too late here — the
# config update below is what actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent XLA compilation cache, shared by the in-process suite AND every
# CLI/distributed subprocess the mesh tests launch (children inherit the env
# var). The mesh bucket's wall time is dominated by re-compiling the same
# tiny models across subprocess launches (VERDICT r4 weak #5); identical HLO
# now compiles once per suite run and once across runs.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Suite split (VERDICT r2 #9): `pytest -m fast` is the quick numerics/unit
# suite (< ~5 min); `pytest -m mesh` the mesh/integration/CLI-subprocess
# suite. Both together = the full suite. Modules here get the mesh marker;
# everything else is fast.
#
# Within mesh, the heaviest end-to-end launches additionally carry `slow`
# (VERDICT r4 weak #5): `-m "mesh and not slow"` is the CI-style iteration
# tier; the full suite (no -m) still runs everything, so there is zero
# coverage loss — `slow` only exists so a developer loop doesn't pay for
# 2-process distributed runs and multi-epoch CLI trainings on every edit.
MESH_MODULES = {
    "test_train_cli",        # subprocess trainer runs
    "test_tools_cli",        # subprocess tool runs
    "test_multiprocess",     # 2-process jax.distributed
    "test_relation_dp",      # sharded grad-parity runs
    "test_parallel",         # 8-device mesh equality suites
    "test_train",            # dryrun_multichip + DP train steps
    "test_end2end",          # full stage cascade
    "test_streaming",        # streaming engine over real segmenter
    "test_checkpoint_io",    # orbax round-trips of full train state
    "test_full_model_parity",  # full-model torch-replica parity
    "test_convert_full",     # full converted-tree forward
    "test_rel_full_protocol",  # protocol oracle over full pipeline
    "test_packed_cache",     # subprocess pack+train runs, trainer steps
}

# Heaviest individual tests (each >90 s even with a warm compilation cache:
# fresh 2-process jax.distributed launches, multi-epoch CLI trainings, the
# 8-device dryrun). Matched on the parametrization-stripped test name.
SLOW_TESTS = {
    "test_two_process_stage2",
    "test_two_process_end2end_eval",
    "test_train_cli_steps",
    "test_train_cli_auto_resume_continues_epochs",
    "test_train_cli_packed",
    "test_uint8_trainer_step_matches_float_path",
    "test_dryrun_multichip_cpu_mesh",
    "test_dp_grad_parity_with_sequential",
    "test_dp_partial_queue_flush",
    "test_rel_capacity_study_cli",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "mesh: mesh/integration tests (CPU-mesh heavy, "
        "subprocesses); deselect with -m fast for the quick suite")
    config.addinivalue_line(
        "markers", "fast: quick numerics/unit tests (< ~5 min total)")
    config.addinivalue_line(
        "markers", "slow: heaviest mesh launches (2-process distributed, "
        "multi-epoch CLI trainings); -m 'mesh and not slow' for iteration")


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker(pytest.mark.mesh if name in MESH_MODULES
                        else pytest.mark.fast)
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
