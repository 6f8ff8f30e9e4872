"""Model/diffusion factory — API parity with reference
``util/model_util.py:16-23`` (``create_model_and_diffusion(datatype)``).

Returns the flax SceneDiffusionModel and the diffusion Schedule built from
the canonical hyper-parameters (steps=1000, cosine, predict x_start,
FIXED_SMALL, lambda_cat=0.1).
"""

from __future__ import annotations

from typing import Tuple

from lsdm_tpu import config as cfg_lib
from lsdm_tpu.config import DiffusionConfig
from lsdm_tpu.diffusion import Schedule, make_schedule, spaced_schedule
from lsdm_tpu.models.sdm import SceneDiffusionModel


def create_model_and_diffusion(
    datatype: str = "proxd",
    diffusion_cfg: DiffusionConfig = DiffusionConfig(),
    **model_overrides,
) -> Tuple[SceneDiffusionModel, Schedule]:
    model_cfg = (
        cfg_lib.sdm_proxd() if datatype == "proxd" else cfg_lib.sdm_humanise()
    )
    if model_overrides:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, **model_overrides)
    model = SceneDiffusionModel(model_cfg)
    if diffusion_cfg.timestep_respacing:
        schedule = spaced_schedule(
            diffusion_cfg.noise_schedule, diffusion_cfg.steps,
            diffusion_cfg.timestep_respacing,
        )
    else:
        schedule = make_schedule(diffusion_cfg.noise_schedule, diffusion_cfg.steps)
    return model, schedule


def load_yaml_config(path: str) -> dict:
    """YAML config loader for the ATISS family (reference
    ``atiss/scripts/training_utils.py:22-25``)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
