"""Config file/CLI override surface (SURVEY §5 config row)."""

import json

import pytest

from ray_tracing_octrees_tpu.config import (
    DEFAULT_CONFIG,
    EngineConfig,
    apply_overrides,
    config_from_dict,
    load_config,
)


def test_defaults_capture_reference_constants():
    c = DEFAULT_CONFIG
    assert c.sphere_dim == 256 and c.voxel_size == 10.0
    assert c.raytrace.max_traversal_steps == 512
    assert c.raymarch.max_steps == 800
    assert c.dc.qef.regularization == pytest.approx(0.3)


def test_config_from_dict_nested():
    c = config_from_dict({"voxel_size": 5, "dc": {"qef": {"relaxation": 0.5}}})
    assert c.voxel_size == 5.0
    assert c.dc.qef.relaxation == 0.5
    # untouched siblings keep defaults
    assert c.dc.qef.regularization == pytest.approx(0.3)
    assert c.raymarch.max_steps == 800


def test_config_from_dict_rejects_unknown_key():
    with pytest.raises(KeyError):
        config_from_dict({"not_a_knob": 1})


def test_load_config_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"width": 640, "raytrace": {"frame_interval": 3}}))
    c = load_config(str(p))
    assert c.width == 640 and c.raytrace.frame_interval == 3


def test_apply_overrides_dotted_paths():
    c = apply_overrides(
        DEFAULT_CONFIG,
        ["dc.qef.relaxation=0.5", "raymarch.max_steps=400",
         "use_buildings=false", "raytrace.light_dir=1,0,0"],
    )
    assert c.dc.qef.relaxation == 0.5
    assert c.raymarch.max_steps == 400
    assert c.use_buildings is False
    assert c.raytrace.light_dir == (1.0, 0.0, 0.0)
    assert isinstance(c, EngineConfig)


def test_apply_overrides_bad_path():
    with pytest.raises(KeyError):
        apply_overrides(DEFAULT_CONFIG, ["dc.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(DEFAULT_CONFIG, ["dc.qef.relaxation"])


def test_bench_cli_parses():
    # --set on the bench CLI goes through config_from_args
    import argparse

    from ray_tracing_octrees_tpu.config import add_config_args, config_from_args

    p = argparse.ArgumentParser()
    add_config_args(p)
    args = p.parse_args(["--set", "voxel_size=2.5"])
    assert config_from_args(args).voxel_size == 2.5
