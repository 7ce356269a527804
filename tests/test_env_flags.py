"""Strict env-flag parsing (utils/env.py) — the shared parser behind
every SAMT_* knob (ADVICE r4: loose parsing silently flipped features
on typos like SAMT_WL_DECODER=flase)."""
import pytest

from synergize_motion_appearance_tpu.utils.env import (
    env_flag, env_flag_default)


def test_unset_is_none(monkeypatch):
    monkeypatch.delenv("SAMT_TEST_FLAG", raising=False)
    assert env_flag("SAMT_TEST_FLAG") is None
    assert env_flag_default("SAMT_TEST_FLAG", True) is True
    assert env_flag_default("SAMT_TEST_FLAG", False) is False


@pytest.mark.parametrize("raw,expect", [
    ("1", True), ("true", True), ("YES", True), ("On", True),
    ("0", False), ("false", False), ("No", False), ("OFF", False),
    ("", False), ("  true ", True),
])
def test_strict_values(monkeypatch, raw, expect):
    monkeypatch.setenv("SAMT_TEST_FLAG", raw)
    assert env_flag("SAMT_TEST_FLAG") is expect
    assert env_flag_default("SAMT_TEST_FLAG", not expect) is expect


@pytest.mark.parametrize("raw", ["flase", "2", "y", "enable", "None"])
def test_typos_raise(monkeypatch, raw):
    monkeypatch.setenv("SAMT_TEST_FLAG", raw)
    with pytest.raises(ValueError, match="SAMT_TEST_FLAG"):
        env_flag("SAMT_TEST_FLAG")
    with pytest.raises(ValueError):
        env_flag_default("SAMT_TEST_FLAG", True)
