"""molvax: a TPU-native molecular VAE framework (JAX / XLA / Pallas / GSPMD).

A ground-up rebuild of the capabilities of aclyde11/molecular-VAE (ChemVAE
lineage) designed TPU-first: uint8 SMILES codes on the host, jit-fused
on-device one-hot + conv encoder, `lax.scan` stacked-GRU decoder with fused
Pallas kernels on the hot path, GSPMD data parallelism over ICI, orbax
checkpointing, and latent-space workloads (prior sampling, interpolation,
gradient property optimization) as single device programs.

See SURVEY.md for the reference blueprint and parity citations.
"""

__version__ = "0.1.0"

from . import config, data
from .config import Config, ModelConfig, PRESETS, get_preset

__all__ = ["Config", "ModelConfig", "PRESETS", "get_preset", "config", "data"]
