"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4). Here every
test runs against 8 virtual XLA CPU devices so mesh sharding, collectives,
and the distributed index are exercised without TPU hardware — set up
before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment may pre-register a hardware backend (sitecustomize) and
# pin jax_platforms; the config update is the authoritative override.
jax.config.update("jax_platforms", "cpu")

# CPU XLA's default matmul precision is bf16-like; force fp32 so numeric
# parity tests are deterministic. (On TPU the models pick their own
# precision via dtype policy.)
jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def toy_csv(tmp_path_factory):
    """Tiny Question/Abstract/Answer CSV in the reference toy-data schema."""
    import csv

    path = tmp_path_factory.mktemp("data") / "toy.csv"
    rows = [
        ("What is photosynthesis", "Process where plants convert light into energy.", "Energy conversion"),
        ("Who wrote Romeo and Juliet", "Famous play written by William Shakespeare.", "William Shakespeare"),
        ("Capital of France", "Paris is the capital and largest city of France.", "Paris"),
        ("Speed of light", "Light travels at about 300000 km per second in vacuum.", "300000 km/s"),
        ("Chemical symbol of gold", "Gold is a chemical element with symbol Au.", "Au"),
        ("Largest planet", "Jupiter is the largest planet in the solar system.", "Jupiter"),
        ("Author of 1984", "The dystopian novel 1984 was written by George Orwell.", "George Orwell"),
        ("Boiling point of water", "Water boils at 100 degrees Celsius at sea level.", "100 C"),
        ("Smallest prime", "The smallest prime number is two.", "2"),
        ("Currency of Japan", "The yen is the official currency of Japan.", "Yen"),
        ("Human chromosomes", "Humans have 46 chromosomes in 23 pairs.", "46"),
        ("Red planet", "Mars is often called the red planet.", "Mars"),
        ("Deepest ocean", "The Pacific Ocean contains the Mariana Trench, the deepest point.", "Pacific"),
        ("Inventor of telephone", "Alexander Graham Bell is credited with inventing the telephone.", "Bell"),
        ("Longest river", "The Nile is often considered the longest river on Earth.", "Nile"),
        ("Hardest natural substance", "Diamond is the hardest known natural material.", "Diamond"),
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Question", "Abstract", "Answer"])
        w.writerows(rows)
    return str(path)
