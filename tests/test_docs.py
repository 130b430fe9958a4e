"""Doc-test analog: README code blocks and examples are executed.

The reference compiles its README examples as doctests
(``src/lib.rs:87-88``, ``doc_comment::doctest!``); here every fenced
python block in README.md runs under pytest, and each ``examples/*.py``
script is driven end-to-end on tiny inputs — failures in docs break the
suite.
"""

import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme_blocks():
    with open(os.path.join(ROOT, "README.md")) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_readme_has_python_blocks():
    assert len(_readme_blocks()) >= 1


@pytest.mark.parametrize("idx", range(len(_readme_blocks())))
def test_readme_block_executes(idx):
    code = _readme_blocks()[idx]
    exec(compile(code, f"README.md[block {idx}]", "exec"), {"__name__": "__readme__"})


def _run_example(name: str, stdin: bytes, argv=(), extra_env=None) -> bytes:
    env = dict(os.environ, PYTHONPATH=ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", name), *argv],
        input=stdin,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        timeout=120,
        check=True,
    )
    return proc.stdout


def test_example_compress_decompress_pipe():
    data = b"the quick brown fox jumps over the lazy dog " * 200
    comp = _run_example("compress.py", data)
    assert comp[:10] == b"\xff\x06\x00\x00sNaPpY"
    out = _run_example("decompress.py", comp)
    assert out == data


def test_example_tpu_pipeline():
    out = _run_example(
        "tpu_pipeline.py",
        b"",
        extra_env={
            "SNAPPY_TPU_FORCE_CPU": "1",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PIPELINE_SHARD_BYTES": str(256 * 1024),
        },
    ).decode()
    assert "pipeline ok" in out
    assert "step 1: loss" in out


def test_example_compress_escaped():
    out = _run_example("compress_escaped.py", b"", argv=["abcabcabcabcabcabcabc"])
    lines = out.decode().splitlines()
    # Escaped printable dump of the frame bytes (stream identifier
    # visible), then the roundtripped input.
    assert "sNaPpY" in lines[0]
    assert lines[1] == "abcabcabcabcabcabcabc"
