from .vae import (
    VAEOutput,
    decode,
    encode,
    forward,
    init_vae_params,
    param_count,
    reparameterize,
)

__all__ = [
    "VAEOutput",
    "decode",
    "encode",
    "forward",
    "init_vae_params",
    "param_count",
    "reparameterize",
]
