"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU).

The interpret pass is the correctness gate for the kernels in
``snappy_tpu.ops.pallas`` (the reference's analogous practice is keeping
debug assertions in its unsafe cores, SURVEY.md §5 race-detection
mapping).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from snappy_tpu.format.crc32c import crc32c  # noqa: E402


def test_pallas_crc32c_interpret_matches_oracle():
    from jax.experimental.pallas import tpu as pltpu

    from snappy_tpu.ops.pallas.crc32c import crc32c_blocks_pallas

    rng = np.random.default_rng(3)
    b, s = 8, 4096
    rows = np.zeros((b, s), np.uint8)
    lens = np.zeros(b, np.int32)
    for i in range(b):
        n = int(rng.integers(0, s + 1))
        rows[i, :n] = rng.integers(0, 256, n, dtype=np.uint8)
        lens[i] = n
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(crc32c_blocks_pallas(rows, lens))
    want = np.array([crc32c(rows[i, : lens[i]].tobytes()) for i in range(b)], np.uint32)
    np.testing.assert_array_equal(got, want)
