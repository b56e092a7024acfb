"""All shipped YAML configs must load and validate (the reference shipped
configs that crash at runtime — SURVEY appendix; we gate ours in CI)."""

import pathlib

import pytest

from mri_inr_tpu.configuration import load_test_configuration, load_train_configuration

CONFIG_DIR = pathlib.Path(__file__).resolve().parent.parent / "configs"
TRAIN_CONFIGS = sorted(
    p for p in CONFIG_DIR.rglob("*.yaml") if p.name.startswith(("train", "smoke"))
)
TEST_CONFIGS = sorted(p for p in CONFIG_DIR.rglob("test*.yaml"))


@pytest.mark.parametrize("path", TRAIN_CONFIGS, ids=lambda p: p.stem)
def test_train_config_loads(path):
    cfg = load_train_configuration(path)
    assert cfg.training.criterion in ("mse", "edge", "perceptual")
    assert cfg.model.activation in ("sine", "morlet")


@pytest.mark.parametrize("path", TEST_CONFIGS, ids=lambda p: p.stem)
def test_test_config_loads(path):
    cfg = load_test_configuration(path)
    assert cfg.data.batch_patches > 0


def test_config_lists_nonempty():
    assert len(TRAIN_CONFIGS) >= 8
    assert len(TEST_CONFIGS) >= 1
