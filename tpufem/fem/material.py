"""Isotropic linear-elastic material.

Reference deck: *MATERIAL/*ELASTIC with (E, nu) defaults E=69e9 Pa, nu=0.33
(AL6061-T6; fem.py:150-215, scripts/generate_fem_dataset.py:43-47, app.py:32-34).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Material:
    E: float = 69e9  # Young's modulus [Pa]
    nu: float = 0.33  # Poisson ratio
    yield_mpa: float = 276.0  # AL6061-T6 yield, used by the app's safety factor
    rho: float = 2700.0  # density [kg/m^3] (AL6061), used by modal analysis


def lame_params(mat: Material) -> tuple[float, float]:
    """(lambda, mu) Lame parameters."""
    lam = mat.E * mat.nu / ((1.0 + mat.nu) * (1.0 - 2.0 * mat.nu))
    mu = mat.E / (2.0 * (1.0 + mat.nu))
    return lam, mu
