"""Misc helpers: device info, parameter counting, training-time estimation
(reference utils/utils.py:13-153)."""

from __future__ import annotations

import logging
from typing import Dict

import jax

logger = logging.getLogger(__name__)


def device_info() -> Dict:
    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "devices": [str(d) for d in devices],
        "process_count": jax.process_count(),
    }


def log_device_info() -> None:
    info = device_info()
    logger.info(
        "JAX backend %s: %d device(s) — %s",
        info["backend"], info["device_count"], ", ".join(info["devices"][:8]),
    )


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def format_model_size(n_params: int) -> str:
    """Human-readable parameter count (reference utils.py model-size format)."""
    if n_params >= 1e9:
        return f"{n_params / 1e9:.2f}B"
    if n_params >= 1e6:
        return f"{n_params / 1e6:.2f}M"
    if n_params >= 1e3:
        return f"{n_params / 1e3:.1f}K"
    return str(n_params)


def estimate_training_time(
    steps_per_epoch: int, num_epochs: int, measured_step_s: float
) -> Dict[str, float]:
    """Wall-clock estimate from a measured step time
    (reference utils.py training-time estimation)."""
    total_steps = steps_per_epoch * num_epochs
    total_s = total_steps * measured_step_s
    return {
        "total_steps": total_steps,
        "total_hours": total_s / 3600.0,
        "per_epoch_minutes": steps_per_epoch * measured_step_s / 60.0,
    }
