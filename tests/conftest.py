"""Test configuration.

Tests run on CPU with 8 virtual devices (so sharded/multi-chip code paths
execute without a pod) and with x64 enabled (so the scoring engine can be
validated in f64 against the reference's double-precision arithmetic).
These env vars must be set before jax is imported anywhere.
"""

import os
import subprocess
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# NB: the JAX_PLATFORMS / JAX_ENABLE_X64 env vars are ignored by this jax
# build (the axon TPU plugin would otherwise claim the default backend and
# every host<->device transfer would cross the chip tunnel) — use config
# flags, which do work.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
REF_BIN_DIR = REPO / ".cache" / "refbin"


@pytest.fixture(scope="session")
def ref_bins():
    """Compile the reference ISSL binaries once (parity oracle)."""
    if not REFERENCE.exists():
        pytest.skip("reference repository not available")
    REF_BIN_DIR.mkdir(parents=True, exist_ok=True)
    bins = {}
    for name in ("isslCreateIndex", "isslScoreOfftargets"):
        out = REF_BIN_DIR / name
        if not out.exists():
            subprocess.run(
                [
                    "g++", "-O3", "-std=c++11", "-fopenmp", "-mpopcnt",
                    f"-I{REFERENCE}/src/ISSL/include",
                    "-o", str(out),
                    str(REFERENCE / "src" / "ISSL" / f"{name}.cpp"),
                ],
                check=True,
                capture_output=True,
            )
        bins[name] = str(out)
    return bins


@pytest.fixture()
def rng():
    return np.random.default_rng(20260816)


def random_genome(rng, n, n_frac=0.0, lower_frac=0.0):
    """Random ACGT string with optional N and lowercase contamination."""
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = bases[rng.integers(0, 4, size=n)]
    if n_frac:
        mask = rng.random(n) < n_frac
        seq[mask] = ord("N")
    if lower_frac:
        mask = rng.random(n) < lower_frac
        seq[mask] = np.frombuffer(
            bytes([seq[i] for i in np.flatnonzero(mask)]).lower(), dtype=np.uint8
        )
    return seq.tobytes().decode("ascii")


@pytest.fixture()
def make_genome(rng):
    return lambda n, **kw: random_genome(rng, n, **kw)
