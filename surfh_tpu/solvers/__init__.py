"""Criteria and solvers: on-device CG / MM memory-gradient, quadratic MRS
criteria, Huber-prior MM, and the closed-form block-Fourier inverse."""

from .cg import SolverResult, lcg, mmmg
from .criterion import (
    DifferenceOperatorJoint,
    QuadCriterion_MRS,
    QuadCriterion_MRS_2D,
    dtd_separated,
)
from .expsol import Inv_Regul_Fusion_Model, QuadCriterion3, Regul_Fusion_Model
from .huber import lmm_reconstruction, mmmg_huber, vox_reconstruction

__all__ = [
    "DifferenceOperatorJoint",
    "Inv_Regul_Fusion_Model",
    "QuadCriterion3",
    "QuadCriterion_MRS",
    "QuadCriterion_MRS_2D",
    "Regul_Fusion_Model",
    "SolverResult",
    "dtd_separated",
    "lcg",
    "lmm_reconstruction",
    "mmmg",
    "mmmg_huber",
    "vox_reconstruction",
]
