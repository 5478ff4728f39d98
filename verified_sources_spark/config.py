"""Layered config / secrets resolution — the engine's analogue of
``dlt.secrets.value`` / ``dlt.config`` injection (reference
sources/chess/__init__.py:150-167 demos a credential resolved from
secrets providers rather than passed inline; every reference connector
README relies on the same layering).

Resolution order (first hit wins), matching the reference's provider
chain:

1. explicit ``values`` passed to the resolver (code wins),
2. environment variables — ``sources.chess.api_key`` →
   ``SOURCES__CHESS__API_KEY`` (the double-underscore section convention),
3. config files (TOML via stdlib ``tomllib``), searched in order.

``Secret`` wraps sensitive values so they never leak into logs/repr;
``require`` raises ``MissingConfig`` with the full provider trail so a
missing key says where it was looked for.
"""

from __future__ import annotations

import os
from typing import Any

_MISSING = object()


class MissingConfig(KeyError):
    """No provider had the key — message lists everything consulted."""


class Secret(str):
    """A string that masks itself in repr/str formatting contexts that
    would end up in logs. Use ``str(secret)`` is still the real value
    (it IS the value — masking is only for repr)."""

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "Secret('***')"


def _env_key(path: str) -> str:
    return path.replace(".", "__").upper()


def _dig(mapping: dict, path: str):
    cur: Any = mapping
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return _MISSING
        cur = cur[part]
    return cur


class ConfigResolver:
    def __init__(
        self,
        values: dict | None = None,
        env: dict[str, str] | None = None,
        files: list[str] | None = None,
    ):
        self.values = values or {}
        self.env = os.environ if env is None else env
        self._file_data: list[tuple[str, dict]] = []
        for f in files or []:
            if os.path.exists(f):
                import tomllib

                with open(f, "rb") as fh:
                    self._file_data.append((f, tomllib.load(fh)))

    def get(self, path: str, default: Any = None, secret: bool = False) -> Any:
        """Resolve ``section.sub.key``; ``secret=True`` wraps string hits
        in ``Secret`` so they don't leak through repr."""
        hit = _dig(self.values, path)
        if hit is _MISSING:
            env_val = self.env.get(_env_key(path))
            hit = _MISSING if env_val is None else env_val
        if hit is _MISSING:
            for _, data in self._file_data:
                hit = _dig(data, path)
                if hit is not _MISSING:
                    break
        if hit is _MISSING:
            return default
        if secret and isinstance(hit, str):
            return Secret(hit)
        return hit

    def require(self, path: str, secret: bool = False) -> Any:
        got = self.get(path, default=_MISSING, secret=secret)
        if got is _MISSING:
            providers = ["explicit values", f"env:{_env_key(path)}"] + [
                f"file:{f}" for f, _ in self._file_data
            ]
            raise MissingConfig(
                f"{path!r} not found in any provider ({', '.join(providers)})"
            )
        return got
