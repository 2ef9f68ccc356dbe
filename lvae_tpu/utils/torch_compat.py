"""Import reference PyTorch checkpoints into lvae_tpu params.

A reference user has trained artefacts saved with ``torch.save`` (LVAE.py:351,
VAE.py:386): a ConvVAE/SimpleVAE ``state_dict``. This module maps those onto
the flax parameter pytree so they can resume/evaluate here without retraining.

Layout conversions (torch → flax):
  Conv2d            weight [O, I, kH, kW] → kernel [kH, kW, I, O]
  ConvTranspose2d   weight [I, O, kH, kW] → kernel [kH, kW, I, O], spatially
                    flipped (torch's transposed conv correlates with the
                    flipped kernel relative to lax.conv_transpose)
  Linear            weight [O, I] → kernel [I, O]
  images            NCHW → NHWC handled by the models themselves.

The FC layer after the conv stack consumes the flattened feature map, whose
memory order differs between NCHW (C,H,W) and NHWC (H,W,C) — the fc1 kernel's
input axis is permuted accordingly.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_LINEARS = ["fc1", "fc21", "fc211", "fc221", "fc3", "fc31", "fc4"]


def _t(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.float32)


def convvae_params_from_torch(state_dict: Dict, latent_dim: int) -> dict:
    """Reference ConvVAE state_dict (VAE.py:44-77) → flax params pytree."""
    p: Dict[str, dict] = {}
    for name in ("conv1", "conv2"):
        w = _t(state_dict[f"{name}.weight"])  # [O, I, kH, kW]
        p[name] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _t(state_dict[f"{name}.bias"]),
        }
    for name in ("deconv1", "deconv2"):
        w = _t(state_dict[f"{name}.weight"])  # [I, O, kH, kW]
        p[name] = {
            "kernel": w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy(),
            "bias": _t(state_dict[f"{name}.bias"]),
        }
    for name in _LINEARS:
        w = _t(state_dict[f"{name}.weight"])  # [O, I]
        p[name] = {"kernel": w.T.copy(), "bias": _t(state_dict[f"{name}.bias"])}

    # fc1 input: torch flattens (C=32, H=9, W=9); flax flattens (H, W, C=32)
    k = p["fc1"]["kernel"]  # [2592, 300] in torch C-H-W order
    k = k.reshape(32, 9, 9, -1).transpose(1, 2, 0, 3).reshape(32 * 9 * 9, -1)
    p["fc1"]["kernel"] = k.copy()
    # fc4 output feeds the deconv stack: torch reshapes to (C=32, 9, 9),
    # flax reshapes to (9, 9, C=32) — permute the output axis
    k = p["fc4"]["kernel"]  # [in, 2592] producing C-H-W order
    k = k.reshape(-1, 32, 9, 9).transpose(0, 2, 3, 1).reshape(k.shape[0], 32 * 9 * 9)
    p["fc4"]["kernel"] = k.copy()
    b = p["fc4"]["bias"].reshape(32, 9, 9).transpose(1, 2, 0).reshape(-1)
    p["fc4"]["bias"] = b.copy()

    p["raw_log_vy"] = _t(state_dict["_log_vy"])
    return {"params": p}


def simplevae_params_from_torch(state_dict: Dict) -> dict:
    """Reference SimpleVAE state_dict (VAE.py:191-202) → flax params pytree."""
    p: Dict[str, dict] = {}
    for name in _LINEARS:
        w = _t(state_dict[f"{name}.weight"])
        p[name] = {"kernel": w.T.copy(), "bias": _t(state_dict[f"{name}.bias"])}
    p["raw_log_vy"] = _t(state_dict["_log_vy"])
    return {"params": p}


def load_torch_vae_checkpoint(path: str, type_nnet: str, latent_dim: int) -> dict:
    """Load a reference ``.pth`` VAE checkpoint into flax params."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    if type_nnet == "conv":
        return convvae_params_from_torch(state_dict, latent_dim)
    return simplevae_params_from_torch(state_dict)


# ------------------------------------------------------------------ export
# The inverse mappings: hand a trained lvae_tpu VAE back to a reference
# user as a torch ``state_dict`` (.pth) loadable by VAE.py:44-273.


def convvae_params_to_torch(params: dict) -> Dict[str, np.ndarray]:
    """flax ConvVAE params pytree → reference ConvVAE state_dict arrays."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    for name in ("conv1", "conv2"):
        k = np.asarray(p[name]["kernel"])  # [kH, kW, I, O]
        sd[f"{name}.weight"] = k.transpose(3, 2, 0, 1).copy()
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"]).copy()
    for name in ("deconv1", "deconv2"):
        k = np.asarray(p[name]["kernel"])  # [kH, kW, I, O] (flipped)
        sd[f"{name}.weight"] = k[::-1, ::-1].transpose(2, 3, 0, 1).copy()
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"]).copy()
    for name in _LINEARS:
        sd[f"{name}.weight"] = np.asarray(p[name]["kernel"]).T.copy()
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"]).copy()
    # undo the NHWC flatten-order permutations (see import above)
    w = sd["fc1.weight"]  # [300, 2592] currently in H-W-C input order
    w = w.reshape(-1, 9, 9, 32).transpose(0, 3, 1, 2).reshape(w.shape[0], 2592)
    sd["fc1.weight"] = w.copy()
    w = sd["fc4.weight"]  # [2592, in] rows in H-W-C order
    w = w.reshape(9, 9, 32, -1).transpose(2, 0, 1, 3).reshape(2592, -1)
    sd["fc4.weight"] = w.copy()
    b = sd["fc4.bias"].reshape(9, 9, 32).transpose(2, 0, 1).reshape(-1)
    sd["fc4.bias"] = b.copy()
    sd["_log_vy"] = np.asarray(p["raw_log_vy"]).copy()
    return sd


def simplevae_params_to_torch(params: dict) -> Dict[str, np.ndarray]:
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    for name in _LINEARS:
        sd[f"{name}.weight"] = np.asarray(p[name]["kernel"]).T.copy()
        sd[f"{name}.bias"] = np.asarray(p[name]["bias"]).copy()
    sd["_log_vy"] = np.asarray(p["raw_log_vy"]).copy()
    return sd


def save_torch_vae_checkpoint(path: str, params: dict, type_nnet: str) -> str:
    """Write a reference-loadable ``.pth`` VAE checkpoint."""
    import torch

    arrays = (
        convvae_params_to_torch(params)
        if type_nnet == "conv"
        else simplevae_params_to_torch(params)
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in arrays.items()}
    torch.save(sd, path)
    return path
