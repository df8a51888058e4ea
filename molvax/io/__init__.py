from . import checkpoint, torch_compat

__all__ = ["checkpoint", "torch_compat"]
