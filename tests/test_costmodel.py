"""Cost-model constants: file plumbing + chooser sensitivity.

VERDICT r3 item 3: the chooser's pricing constants were frozen v5e
calibration; they are now data (ops/costmodel.py) resolved from an env
path / cache file with the v5e numbers as fallback, and a perturbed
constants file must actually change the chooser's pick."""

import json

import numpy as np
import pytest

from tpu_pattern_matching.ops.costmodel import (
    DEFAULT_PATH,
    ENV_VAR,
    CostConstants,
    get_cost_constants,
)


def _pats(n=400, seed=11):
    rng = np.random.RandomState(seed)
    return [
        bytes(rng.randint(0, 256, size=12).astype(np.uint8))
        for _ in range(n)
    ]


def test_roundtrip_and_resolution(tmp_path, monkeypatch):
    cc = CostConstants(
        probe_ns_per_unit=0.5, refine_ns_per_slot=9.0,
        refine_fixed_ns_per_byte=0.25, verify_ns_per_cand=123.0,
        source="test",
    )
    p = tmp_path / "cc.json"
    cc.save(str(p))
    assert CostConstants.load(str(p)) == cc
    monkeypatch.setenv(ENV_VAR, str(p))
    assert get_cost_constants() == cc
    # a missing env path falls back to defaults
    monkeypatch.setenv(ENV_VAR, str(tmp_path / "nope.json"))
    assert get_cost_constants().source == "v5e-r3-default"


def test_broken_file_falls_back_loudly(tmp_path, monkeypatch, capsys):
    p = tmp_path / "cc.json"
    p.write_text(json.dumps({"probe_ns_per_unit": -1.0}))
    monkeypatch.setenv(ENV_VAR, str(p))
    cc = get_cost_constants()
    assert cc.source == "v5e-r3-default"
    assert "WARNING" in capsys.readouterr().err
    p.write_text(json.dumps({"not_a_field": 1.0}))
    assert get_cost_constants().source == "v5e-r3-default"


def test_perturbed_constants_change_pick(tmp_path, monkeypatch):
    from tpu_pattern_matching.ops.bloom import BloomFilterTable

    monkeypatch.delenv(ENV_VAR, raising=False)
    monkeypatch.setenv(ENV_VAR, str(tmp_path / "absent.json"))
    pats = _pats()
    cfg0 = BloomFilterTable.build(pats).cfg

    # make the probe astronomically expensive relative to verify: the
    # refined objective then minimizes probe cost alone and the pick
    # must move to a smaller/cheaper filter config
    CostConstants(
        probe_ns_per_unit=1e6,
        refine_ns_per_slot=1e-6,
        refine_fixed_ns_per_byte=1e-9,
        verify_ns_per_cand=1e-6,
        source="perturbed",
    ).save(str(tmp_path / "cc.json"))
    monkeypatch.setenv(ENV_VAR, str(tmp_path / "cc.json"))
    cfg1 = BloomFilterTable.build(pats).cfg
    assert cfg1 != cfg0, (cfg0, cfg1)


def test_default_path_is_user_cache():
    assert DEFAULT_PATH.endswith("cost_constants.json")
    assert ".cache" in DEFAULT_PATH
