"""The central Config dataclass (snappy_tpu/config.py).

Contract: one documented dataclass holds every routing knob and cap;
precedence is env var > programmatic set_config/configure > defaults
(SURVEY.md §5 "constants + one small config").
"""

import pytest

from snappy_tpu import config as C


def test_defaults_match_documented_caps():
    cfg = C.Config()
    assert cfg.engine == "auto"
    assert cfg.pallas_decode is None and cfg.pallas_encode is None
    assert cfg.pallas_flat and not cfg.pallas_records
    assert cfg.pallas_max_dpad == 1 << 20
    assert cfg.replay_max_body == 1 << 17
    assert cfg.decode_rows_per_launch == 512
    assert cfg.blocks_per_launch == 2048


def test_env_overrides_beat_programmatic(monkeypatch):
    with C.configure(pallas_flat=False, threads=4):
        assert C.get_config().pallas_flat is False
        assert C.get_config().threads == 4
        monkeypatch.setenv("SNAPPY_TPU_PALLAS_FLAT", "1")
        monkeypatch.setenv("SNAPPY_TPU_THREADS", "2")
        assert C.get_config().pallas_flat is True
        assert C.get_config().threads == 2
    # context restored
    assert C.get_config().pallas_flat is True  # env still set
    monkeypatch.delenv("SNAPPY_TPU_PALLAS_FLAT")
    monkeypatch.delenv("SNAPPY_TPU_THREADS")
    assert C.get_config() == C.Config()


def test_env_knob_semantics(monkeypatch):
    # Historical on/off semantics: '' and '0' are off, anything else on.
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "")
    assert C.get_config().pallas_decode is False
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_DECODE", "1")
    assert C.get_config().pallas_decode is True
    # records/compose are strict '1'
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_RECORDS", "yes")
    assert C.get_config().pallas_records is False
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_RECORDS", "1")
    assert C.get_config().pallas_records is True
    # malformed threads value is ignored, not fatal
    monkeypatch.setenv("SNAPPY_TPU_THREADS", "not-a-number")
    assert C.get_config().threads == 0
    # fastpath tri-state
    monkeypatch.setenv("SNAPPY_TPU_PALLAS_FASTPATH", "compose")
    assert C.get_config().pallas_fastpath == "compose"


def test_configure_rejects_unknown_fields():
    with pytest.raises(TypeError):
        with C.configure(nonsense=True):
            pass


def test_set_config_full_object_and_overrides():
    saved = C.set_config(C.Config())
    try:
        C.set_config(decode_rows_per_launch=128)
        assert C.get_config().decode_rows_per_launch == 128
        with pytest.raises(TypeError):
            C.set_config(C.Config(), threads=1)
    finally:
        C.set_config(saved)


def test_engine_knob_via_config():
    from snappy_tpu.engine import get_engine

    with C.configure(engine="reference"):
        assert get_engine("auto").name == "reference"
    # explicit argument still wins over the config default
    with C.configure(engine="reference"):
        assert get_engine("native").name == "native"


def test_decode_routing_respects_config():
    # pallas_decode=True with pallas_flat=False pins the replay kernel
    # (interpret mode off-TPU); output must stay oracle-exact.
    from snappy_tpu.format import reference as ref
    from snappy_tpu.format.varint import write_varu64
    from snappy_tpu.ops.api import decompress_streams

    data = (b"the quick brown fox " * 40)[:700]
    body = ref.compress(data)[len(write_varu64(len(data))):]
    with C.configure(pallas_decode=True, pallas_flat=False):
        outs, errs, _ = decompress_streams([body], [len(data)])
    assert outs[0] == data and int(errs[0]) == 0
