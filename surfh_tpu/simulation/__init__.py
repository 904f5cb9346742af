"""Simulated ground truth and synthetic problem generation."""

from .data import get_simulation_data, synthetic_orion
from .synthetic import make_model, make_setup

__all__ = ["get_simulation_data", "make_model", "make_setup", "synthetic_orion"]
