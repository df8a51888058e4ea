"""PyTorch <-> molvax weight conversion (parity twin support).

Purpose (SURVEY.md section 4.2, 7 stage 3): golden parity tests pin molvax
numerics against a PyTorch twin of the reference model
(bench/torch_twin/model.py). The converter maps a torch ``state_dict`` into
the molvax params pytree (and back), so if/when the real reference weights
become readable the exact checkpoints drop in (SURVEY.md provenance header).

Layout mapping:
  torch Linear  weight (out, in)       -> molvax 'w' (in, out) [transpose]
  torch Conv1d  weight (out, in, k)    -> molvax 'w' (out, in, k) [as-is, OIH]
  torch GRU     weight_ih_l{i} (3H,in) -> gru[i]['w_ih'] (in, 3H) [transpose]
                gate order r|z|n along 3H is shared by both.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]


def _t(x) -> jnp.ndarray:
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def from_torch_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Params:
    """Map a torch_twin (or reference) state_dict to molvax params.

    Expected torch module names (bench/torch_twin/model.py, mirroring the
    reference's MolecularVAE): conv_1..conv_N, linear_0, linear_1 (mu),
    linear_2 (logvar), linear_3, gru, linear_4, prop_hidden/prop_out.
    """
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}

    def lin(name):
        return {"w": _t(sd[f"{name}.weight"].T), "b": _t(sd[f"{name}.bias"])}

    convs = []
    i = 1
    while f"conv_{i}.weight" in sd:
        convs.append({"w": _t(sd[f"conv_{i}.weight"]), "b": _t(sd[f"conv_{i}.bias"])})
        i += 1

    gru_layers = []
    li = 0
    while f"gru.weight_ih_l{li}" in sd:
        gru_layers.append(
            {
                "w_ih": _t(sd[f"gru.weight_ih_l{li}"].T),
                "w_hh": _t(sd[f"gru.weight_hh_l{li}"].T),
                "b_ih": _t(sd[f"gru.bias_ih_l{li}"]),
                "b_hh": _t(sd[f"gru.bias_hh_l{li}"]),
            }
        )
        li += 1

    params: Params = {
        "encoder": {
            "convs": convs,
            "linear_0": lin("linear_0"),
            "linear_mu": lin("linear_1"),
            "linear_logvar": lin("linear_2"),
        },
        "decoder": {
            "linear_3": lin("linear_3"),
            "gru": gru_layers,
            "linear_out": lin("linear_4"),
        },
    }
    if "prop_hidden.weight" in sd and cfg.n_properties > 0:
        params["property_head"] = {
            "hidden": lin("prop_hidden"),
            "out": lin("prop_out"),
        }
    # learned start token (beyond-reference, learned_start=True presets):
    # reference state_dicts won't carry it, but a molvax->torch->molvax
    # round-trip must not silently drop a trained parameter (review
    # finding round 3)
    if "start_token" in sd:
        params["decoder"]["start_token"] = _t(sd["start_token"])
    elif cfg.learned_start:
        params["decoder"]["start_token"] = jnp.zeros(
            (cfg.charset_size,), jnp.float32
        )
    return params


def to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse mapping (numpy arrays; load with torch.from_numpy)."""
    out: Dict[str, np.ndarray] = {}

    def lin(name, p):
        out[f"{name}.weight"] = np.asarray(p["w"]).T.copy()
        out[f"{name}.bias"] = np.asarray(p["b"]).copy()

    enc = params["encoder"]
    for i, c in enumerate(enc["convs"], start=1):
        out[f"conv_{i}.weight"] = np.asarray(c["w"]).copy()
        out[f"conv_{i}.bias"] = np.asarray(c["b"]).copy()
    lin("linear_0", enc["linear_0"])
    lin("linear_1", enc["linear_mu"])
    lin("linear_2", enc["linear_logvar"])

    dec = params["decoder"]
    lin("linear_3", dec["linear_3"])
    for li, layer in enumerate(dec["gru"]):
        out[f"gru.weight_ih_l{li}"] = np.asarray(layer["w_ih"]).T.copy()
        out[f"gru.weight_hh_l{li}"] = np.asarray(layer["w_hh"]).T.copy()
        out[f"gru.bias_ih_l{li}"] = np.asarray(layer["b_ih"]).copy()
        out[f"gru.bias_hh_l{li}"] = np.asarray(layer["b_hh"]).copy()
    lin("linear_4", dec["linear_out"])

    if "property_head" in params:
        lin("prop_hidden", params["property_head"]["hidden"])
        lin("prop_out", params["property_head"]["out"])
    if params["decoder"].get("start_token") is not None:
        out["start_token"] = np.asarray(params["decoder"]["start_token"]).copy()
    return out
