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
