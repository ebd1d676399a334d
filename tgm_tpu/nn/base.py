"""Encoder protocol.

Parity: reference ``EncoderModule`` protocol (/root/reference/tgm/nn/base.py:7-12):
a callable taking a batch with a ``requires`` attribute declaring which
hook-produced batch attributes it consumes (checked by
``HookManager.validate_requirement``).
"""

from __future__ import annotations

from typing import Any, Protocol, Set, runtime_checkable


@runtime_checkable
class EncoderModule(Protocol):
    requires: Set[str]

    def __call__(self, batch: Any, *args: Any, **kwargs: Any) -> Any: ...
