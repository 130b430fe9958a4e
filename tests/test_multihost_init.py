"""`parallel.multihost.initialize` handshake behavior (subprocess tests).

Round-3 regression: the helper used to query ``jax.process_count()``
before ``jax.distributed.initialize()``, which initialized the local
backend and made the handshake raise — and the error was swallowed, so
every process silently degraded to single-process mode. These tests run
the helper in fresh interpreters (JAX state is process-global) and
assert the three contracts: env-configured multi-process runs really
connect, unconfigured runs stay local, and a mis-configured run raises
instead of degrading.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_worker(script: str, env_extra: dict, timeout: float = 120.0):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=REPO,
    )
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", script],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


_ENV_WORKER = """
import jax
from snappy_tpu.parallel import multihost
multihost.initialize()            # pure env-var configuration
assert jax.process_count() == 2, jax.process_count()
multihost.initialize()            # idempotent after handshake
assert jax.process_count() == 2
print("OK", jax.process_index())
"""


def test_initialize_from_env_two_processes():
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(
            _run_worker(
                _ENV_WORKER,
                {
                    "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                    "JAX_NUM_PROCESSES": "2",
                    "JAX_PROCESS_ID": str(pid),
                },
            )
        )
    outs = [p.communicate(timeout=180) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err
    assert sorted(o.split()[-1] for o, _ in outs) == ["0", "1"]


def test_initialize_unconfigured_is_local_noop():
    p = _run_worker(
        """
import jax
from snappy_tpu.parallel import multihost
multihost.initialize()
assert not jax.distributed.is_initialized()
assert jax.process_count() == 1
import jax.numpy as jnp
assert int(jnp.arange(4).sum()) == 6   # backend still healthy
print("OK")
""",
        {},
    )
    out, err = p.communicate(timeout=120)
    assert p.returncode == 0, err
    assert "OK" in out


def test_initialize_after_backend_touch_raises_not_degrades():
    # Touching the backend first makes the handshake impossible; the
    # helper must surface that, not silently run single-process.
    p = _run_worker(
        """
import jax
jax.devices()                     # initializes the local backend
from snappy_tpu.parallel import multihost
try:
    multihost.initialize(
        coordinator_address="localhost:1",  # nothing listening
        num_processes=2,
        process_id=0,
    )
except RuntimeError:
    print("RAISED")
else:
    print("SILENT")
""",
        {},
    )
    out, err = p.communicate(timeout=120)
    assert p.returncode == 0, err
    assert "RAISED" in out, (out, err)
