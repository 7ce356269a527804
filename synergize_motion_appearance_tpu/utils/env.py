"""Strict environment-flag parsing shared by every SAMT_* knob.

One parser, one semantics: a flag is either unset (None), strictly true
({1,true,yes,on}), or strictly false ({0,false,no,off,""}); anything else
raises so a typo like SAMT_WL_DECODER=flase fails loudly instead of
silently flipping a feature (loose any-non-"0" parsing did exactly that —
see ADVICE r2/r4).
"""
from __future__ import annotations

import os
from typing import Optional

_ENV_TRUE = ("1", "true", "yes", "on")
_ENV_FALSE = ("0", "false", "no", "off", "")


def env_flag(name: str) -> Optional[bool]:
    """Tri-state env flag: None when unset, else a strictly parsed bool."""
    raw = os.environ.get(name)
    if raw is None:
        return None
    v = raw.strip().lower()
    if v in _ENV_TRUE:
        return True
    if v in _ENV_FALSE:
        return False
    raise ValueError(
        f"{name}={raw!r}: expected one of {_ENV_TRUE + _ENV_FALSE}")


def env_flag_default(name: str, default: bool) -> bool:
    """`env_flag` with a default for unset — for always-boolean knobs."""
    v = env_flag(name)
    return default if v is None else v
