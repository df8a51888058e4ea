from .interpolate import interpolate, lerp, slerp
from .optimize import OptimizeResult, optimize_from_smiles, optimize_z
from .sample import generate, reconstruct, sample_prior

__all__ = [
    "interpolate",
    "lerp",
    "slerp",
    "OptimizeResult",
    "optimize_from_smiles",
    "optimize_z",
    "generate",
    "reconstruct",
    "sample_prior",
]
