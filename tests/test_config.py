"""Config/secrets resolution layering (config.py — the dlt.secrets/config
analogue, reference sources/chess/__init__.py:150-167)."""

from __future__ import annotations

import pytest

from verified_sources_spark.config import ConfigResolver, MissingConfig, Secret


def test_precedence_explicit_env_file(tmp_path):
    f = tmp_path / "secrets.toml"
    f.write_text('[sources.chess]\napi_key = "from-file"\nurl = "file-url"\n')
    r = ConfigResolver(
        values={"sources": {"chess": {"api_key": "from-code"}}},
        env={"SOURCES__CHESS__API_KEY": "from-env", "SOURCES__CHESS__TOKEN": "env-tok"},
        files=[str(f)],
    )
    assert r.get("sources.chess.api_key") == "from-code"  # code beats env+file
    assert r.get("sources.chess.token") == "env-tok"      # env beats file
    assert r.get("sources.chess.url") == "file-url"       # file as fallback
    assert r.get("sources.chess.nope", default=7) == 7


def test_require_raises_with_provider_trail(tmp_path):
    r = ConfigResolver(env={}, files=[str(tmp_path / "missing.toml")])
    with pytest.raises(MissingConfig, match="SOURCES__X__KEY"):
        r.require("sources.x.key")


def test_secret_masks_repr():
    r = ConfigResolver(values={"db": {"password": "hunter2"}}, env={})
    s = r.get("db.password", secret=True)
    assert isinstance(s, Secret) and s == "hunter2"
    assert "hunter2" not in repr(s)
    assert "hunter2" not in repr([s])  # containers repr their items
