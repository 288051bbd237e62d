"""Config tests (mirrors cpp/tests/test_config.cpp)."""

import dataclasses
import pathlib

import pytest

from deplex_tpu import Config

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


def test_defaults_match_reference():
    """Defaults from config.h:51-81."""
    c = Config()
    assert c.patch_size == 10
    assert c.histogram_bins_per_coord == 20
    assert c.min_cos_angle_merge == pytest.approx(0.90)
    assert c.max_merge_dist == pytest.approx(500.0)
    assert c.min_region_growing_candidate_size == 5
    assert c.min_region_growing_cells_activated == 4
    assert c.min_region_planarity_score == pytest.approx(0.55)
    assert c.depth_sigma_coeff == pytest.approx(1.425e-6)
    assert c.depth_sigma_margin == pytest.approx(10.0)
    assert c.min_pts_per_cell == 3
    assert c.depth_discontinuity_threshold == pytest.approx(160.0)
    assert c.max_number_depth_discontinuity == 1
    assert c.ransac_refinement is False
    assert c.ransac_max_iterations == 1000
    assert c.ransac_threshold == pytest.approx(1.0)
    assert c.ransac_inliers_ratio == pytest.approx(0.9)


def test_invalid_path_raises():
    """test_config.cpp:24."""
    with pytest.raises(RuntimeError):
        Config.from_ini("/nonexistent/path.ini")


def test_ini_parses_tum():
    c = Config.from_ini(str(DATA / "configs" / "TUM_fr3_long_val.ini"))
    assert c.patch_size == 10


def test_ini_parses_icl():
    c = Config.from_ini(str(DATA / "configs" / "ICL_living_room.ini"))
    assert c.patch_size == 4
    assert c.min_cos_angle_merge == pytest.approx(0.93)


def test_missing_keys_fall_back_to_defaults(tmp_path):
    """Commented-out keys keep defaults (test_config.cpp:26-29)."""
    ini = tmp_path / "missing.ini"
    ini.write_text("# patchSize=99\n# all commented out\n")
    assert Config.from_ini(str(ini)) == Config()


def test_unknown_keys_warn_and_ignore(tmp_path, capsys):
    """Unknown key -> stderr warning, value ignored (config.cpp:77)."""
    ini = tmp_path / "unknown.ini"
    ini.write_text("doRefinement=1\npatchSize=7\n")
    c = Config.from_ini(str(ini))
    assert c.patch_size == 7
    assert "Unknown parameter name: doRefinement" in capsys.readouterr().err


def test_from_dict_accepts_both_key_styles():
    c = Config.from_dict({"patchSize": 8, "min_cos_angle_merge": 0.95})
    assert c.patch_size == 8
    assert c.min_cos_angle_merge == pytest.approx(0.95)


def test_negative_patch_size_raises():
    with pytest.raises(ValueError):
        Config(patch_size=-1)


def test_config_is_hashable_static_arg():
    assert hash(Config()) == hash(Config())
    assert Config() == dataclasses.replace(Config())
