"""SettingsManager: typed registry rejects unknown keys (the reference's
template-typed SettingsManager.h:13-90 behavior)."""

import json

import pytest

from basicrenderer_tpu.utils.settings import (SettingsManager,
                                              make_default_settings)


def test_set_unknown_key_raises():
    s = make_default_settings()
    with pytest.raises(KeyError, match="unknown setting"):
        s.set("textureDownscale", 2)   # the historical typo


def test_set_registered_key_works():
    s = make_default_settings()
    s.set("exposure", 2.0)
    assert s.get("exposure") == 2.0


def test_structural_generation_bumps():
    s = make_default_settings()
    g0 = s.generation
    s.set("enableGTAO", True)
    assert s.generation == g0 + 1
    s.set("exposure", 3.0)       # value-only: no bump
    assert s.generation == g0 + 1


def test_load_json_skips_unknown_keys(tmp_path):
    s = make_default_settings()
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"exposure": 4.0, "staleKeyFromOldBuild": 1}))
    s.load_json(str(p))          # must not raise, must not register
    assert s.get("exposure") == 4.0
    assert not s.registered("staleKeyFromOldBuild")


def test_save_load_roundtrip(tmp_path):
    s = make_default_settings()
    s.set("exposure", 1.5)
    p = str(tmp_path / "cfg.json")
    s.save_json(p)
    s2 = make_default_settings()
    s2.load_json(p)
    assert s2.get("exposure") == 1.5
