import os
import sys

# Tests run on the CPU backend in float64 against C++ golden vectors; an
# 8-device virtual mesh exercises the sharding layer without real chips.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


class Goldens:
    def __init__(self, path):
        self.path = path
        self.shapes = {}
        self.scalars = {}
        with open(os.path.join(path, "manifest.txt")) as f:
            for line in f:
                parts = line.split()
                if parts[0] == "scalar":
                    self.scalars[parts[1]] = int(parts[2])
                else:
                    self.shapes[parts[0]] = tuple(int(p) for p in parts[1:])

    def __getitem__(self, name):
        data = np.fromfile(os.path.join(self.path, name + ".f64"))
        return data.reshape(self.shapes[name])

    def scalar(self, name):
        return self.scalars[name]


@pytest.fixture(scope="session")
def gold():
    return Goldens(GOLDEN_DIR)


@pytest.fixture(autouse=True, scope="module")
def _reclaim_process_resources():
    """Long single-process suite runs deterministically segfault inside
    an XLA compile around the ~100th test (LLVM/XLA native crash in
    backend_compile_and_load on a render-worker thread; reproduced at
    the same test across three runs, never standalone).  Reclaiming
    per-module keeps the process below whatever native resource the
    compiler exhausts: stop leaked streaming workers (tests that don't
    close() pin 5 daemon threads + their synthesizer each) and drop
    compiled-executable caches."""
    yield
    import gc

    from world_tpu.models.realtime import _live_workers
    for w in list(_live_workers):
        w.shutdown()
    gc.collect()
    jax.clear_caches()
