"""szip CLI parity tests (reference ``szip/main.rs`` behavior)."""

import io
import os
import subprocess
import sys

import pytest

from conftest import load_corpus
from snappy_tpu.cli import szip


def run_cli(args):
    return szip.main(args)


def test_compress_decompress_file(tmp_path):
    data = load_corpus("html")
    p = tmp_path / "file.txt"
    p.write_bytes(data)
    os.utime(p, (1_000_000, 2_000_000))

    assert run_cli([str(p)]) == 0
    sz = tmp_path / "file.txt.sz"
    assert sz.exists()
    assert not p.exists(), "input should be deleted without -k"
    st = os.stat(sz)
    assert (st.st_atime, st.st_mtime) == (1_000_000, 2_000_000)

    assert run_cli(["-d", str(sz)]) == 0
    assert p.read_bytes() == data
    assert not sz.exists()


def test_keep_flag(tmp_path):
    p = tmp_path / "keepme.bin"
    p.write_bytes(b"keep me around")
    run_cli(["-k", str(p)])
    assert p.exists() and (tmp_path / "keepme.bin.sz").exists()


def test_force_flag(tmp_path, capsys):
    p = tmp_path / "f.bin"
    p.write_bytes(b"data data data")
    (tmp_path / "f.bin.sz").write_bytes(b"existing")
    run_cli(["-k", str(p)])
    assert "already exists" in capsys.readouterr().err
    run_cli(["-k", "-f", str(p)])
    assert (tmp_path / "f.bin.sz").read_bytes() != b"existing"


def test_raw_mode(tmp_path):
    from snappy_tpu import raw

    data = load_corpus("alice29.txt")[:30000]
    p = tmp_path / "raw.bin"
    p.write_bytes(data)
    run_cli(["-r", "-k", str(p)])
    comp = (tmp_path / "raw.bin.sz").read_bytes()
    assert comp == raw.Encoder().compress_vec(data)
    os.remove(p)
    run_cli(["-r", "-d", str(tmp_path / "raw.bin.sz")])
    assert p.read_bytes() == data


def test_extension_rules(tmp_path, capsys):
    p = tmp_path / "x.sz"
    p.write_bytes(b"zz")
    run_cli([str(p)])  # compressing a .sz file is skipped
    assert "skipping compressed file" in capsys.readouterr().err
    q = tmp_path / "y.bin"
    q.write_bytes(b"zz")
    run_cli(["-d", "-k", str(q)])  # decompressing non-.sz is skipped
    assert "skipping uncompressed file" in capsys.readouterr().err


def test_per_file_errors_dont_abort(tmp_path, capsys):
    good = tmp_path / "good.bin"
    good.write_bytes(b"fine content here")
    missing = tmp_path / "missing.bin"
    run_cli([str(missing), str(good)])
    assert (tmp_path / "good.bin.sz").exists()
    assert "missing.bin" in capsys.readouterr().err


def test_stdin_stdout_pipe():
    data = load_corpus("asyoulik.txt")[:50000]
    script = (
        "import sys; sys.path.insert(0, '.'); "
        "from snappy_tpu.cli.szip import main; main(sys.argv[1:])"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    comp = subprocess.run(
        [sys.executable, "-c", script],
        input=data,
        capture_output=True,
        cwd=repo,
        check=True,
    ).stdout
    out = subprocess.run(
        [sys.executable, "-c", script, "-d"],
        input=comp,
        capture_output=True,
        cwd=repo,
        check=True,
    ).stdout
    assert out == data


def test_directory_is_error(tmp_path, capsys):
    d = tmp_path / "subdir"
    d.mkdir()
    run_cli([str(d)])
    assert "is a directory" in capsys.readouterr().err


def test_resume_after_truncation(tmp_path):
    from conftest import load_corpus

    data = load_corpus("lcet10.txt")
    src = tmp_path / "f.txt"
    src.write_bytes(data)
    run_cli(["-k", str(src)])
    sz = tmp_path / "f.txt.sz"
    full = sz.stat().st_size
    # Interrupt mid-chunk, then resume; result must decode to the input.
    with open(sz, "r+b") as f:
        f.truncate(full * 2 // 3 + 7)
    run_cli(["-k", "--resume", str(src)])
    src.unlink()
    run_cli(["-d", str(sz)])
    assert src.read_bytes() == data


def test_scan_stream_prefix_properties():
    import io

    from conftest import load_corpus
    from snappy_tpu import write as wmod
    from snappy_tpu.frame import scan_stream_prefix

    data = load_corpus("asyoulik.txt")
    buf = io.BytesIO()
    enc = wmod.FrameEncoder(buf)
    enc.write(data)
    enc.flush()
    stream = buf.getvalue()
    # A complete stream scans fully and covers the whole source.
    assert scan_stream_prefix(stream) == (len(stream), len(data))
    # Any truncation scans to a chunk boundary covering <= the source.
    for cut in (0, 1, 9, 10, len(stream) // 2, len(stream) - 1):
        sbytes, source = scan_stream_prefix(stream[:cut])
        assert sbytes <= cut and source <= len(data)
        # The scanned prefix must itself be a fully valid stream prefix.
        assert scan_stream_prefix(stream[:sbytes]) == (sbytes, source)


def test_szip_stdin_pipe_streams_bounded():
    # Piped stdin must take the bounded streaming path (a FIFO fstats as
    # size 0, which means "unknown", not "small"): correctness check that
    # the pipe path still roundtrips (regression: review r2).
    script = (
        "import sys; sys.path.insert(0, '.'); "
        "from snappy_tpu.cli.szip import main; main(sys.argv[1:])"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.urandom(200_000) + b"abc" * 50_000
    comp = subprocess.run(
        [sys.executable, "-c", script],
        input=data, capture_output=True, cwd=repo, check=True,
    ).stdout
    out = subprocess.run(
        [sys.executable, "-c", script, "-d"],
        input=comp, capture_output=True, cwd=repo, check=True,
    ).stdout
    assert out == data
