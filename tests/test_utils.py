"""Profiling utilities tests."""

import io


def test_timer_spans():
    from snappy_tpu.utils.profiling import Timer

    t = Timer()
    with t.span("a"):
        pass
    with t.span("b"):
        pass
    with t.span("a"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "ms" in rep
    assert t.spans["a"] >= 0 and t.spans["b"] >= 0


def test_timed_reports_throughput():
    from snappy_tpu.utils.profiling import timed

    out = io.StringIO()
    with timed("op", nbytes=10_000_000, out=out):
        pass
    s = out.getvalue()
    assert "op:" in s and "GB/s" in s
    out = io.StringIO()
    with timed("nothroughput", out=out):
        pass
    assert "GB/s" not in out.getvalue()
