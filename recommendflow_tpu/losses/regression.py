"""Regression losses (parity: backend/lossess/regression_loss.py:5-7)."""
from __future__ import annotations

import jax.numpy as jnp


def mean_relative_percentage_error(y_true, y_pred):
    return jnp.mean(jnp.abs((y_true - y_pred) / jnp.maximum(jnp.abs(y_true), 1e-7)))


def mean_squared_error(y_true, y_pred):
    return jnp.mean((y_true - y_pred) ** 2)


def mean_absolute_error(y_true, y_pred):
    return jnp.mean(jnp.abs(y_true - y_pred))
