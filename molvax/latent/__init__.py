from .interpolate import interpolate, lerp, slerp
from .optimize import OptimizeResult, optimize_from_smiles, optimize_z
from .sample import (
    fit_aggregate_posterior,
    generate,
    reconstruct,
    sample_aggregate,
    sample_prior,
)

__all__ = [
    "interpolate",
    "lerp",
    "slerp",
    "OptimizeResult",
    "optimize_from_smiles",
    "optimize_z",
    "fit_aggregate_posterior",
    "generate",
    "reconstruct",
    "sample_aggregate",
    "sample_prior",
]
