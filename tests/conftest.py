"""Test configuration.

JAX tests run on CPU with 8 virtual devices so the multi-chip sharding path
is exercised without TPU hardware (the environment variables must be set
before JAX is first imported anywhere).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    # The environment's sitecustomize pins jax_platforms to the TPU tunnel;
    # override it so tests run on the 8-device virtual CPU mesh.
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")

CORPUS_FILES = [
    "html",
    "urls.10K",
    "fireworks.jpeg",
    "paper-100k.pdf",
    "html_x_4",
    "alice29.txt",
    "asyoulik.txt",
    "lcet10.txt",
    "plrabn12.txt",
    "geo.protodata",
    "kppkn.gtb",
]


def corpus_path(name: str) -> str:
    return os.path.join(DATA_DIR, name)


def load_corpus(name: str) -> bytes:
    with open(corpus_path(name), "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def golden_text() -> bytes:
    return load_corpus("Mark.Twain-Tom.Sawyer.txt")


@pytest.fixture(scope="session")
def golden_rawsnappy() -> bytes:
    return load_corpus("Mark.Twain-Tom.Sawyer.txt.rawsnappy")
