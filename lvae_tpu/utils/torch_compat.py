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


# --------------------------------------------------------------------------
# GP-state export/import in the reference's resume format (LVAE.py:214-234,
# 353-370): gp_model.pth (GPyTorch ExactGPModel state_dict), zt_list.pth
# [L, M, Q], m.pth [L, M, 1], H.pth [L, M, M].
# --------------------------------------------------------------------------

_GPY_MIN = 1e-8  # GaussianLikelihood GreaterThan(1e-8) bound (LVAE.py:184)


def _inv_softplus(y: np.ndarray) -> np.ndarray:
    """softplus⁻¹ in f64 (GPyTorch's Positive constraint inverse)."""
    y = np.asarray(y, np.float64)
    return np.where(y > 30.0, y, np.log(np.expm1(np.clip(y, 1e-300, 30.0))))


def _softplus(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return np.where(x > 30.0, x, np.log1p(np.exp(np.minimum(x, 30.0))))


def _component_key_paths(
    cat_kernel=(), bin_kernel=(), sqexp_kernel=(), cat_int_kernel=(),
    bin_int_kernel=(), covariate_missing_val=(), id_covariate=0,
):
    """Flattened GPyTorch key paths per additive component, k0 comps then k1.

    Mirrors generate_kernel_batched's nesting (kernel_gen.py:199-310) and the
    ``covar_module0 + covar_module1`` flattening of LVAE.py:195-196 (GPyTorch
    ``AdditiveKernel.__add__`` concatenates sub-kernel lists). Each entry:
    ``(lengthscale_subpath_or_None)`` — the relative path under
    ``covar_module.kernels.{i}.`` where the RBF raw_lengthscale lives;
    ScaleKernel's raw_outputscale always sits at the component root. The
    order of entries MATCHES ops.kernels.split_kernel_spec's component order
    (both mirror the reference builder's append order), so entry c maps to
    raw_scale[:, c] of the corresponding KernelParams.
    """
    missing = [d["covariate"] for d in covariate_missing_val]

    def masked(col):
        return col in missing

    k0, k1 = [], []
    for idx in cat_kernel:
        # Cat (no params) or Cat*Bin via __mul__ (still no params)
        (k1 if idx == id_covariate else k0).append(None)
    for idx in sqexp_kernel:
        if masked(idx):
            # Rbf*Bin via __mul__ → ProductKernel([rbf, bin])
            k0.append("base_kernel.kernels.0.raw_lengthscale")
        else:
            k0.append("base_kernel.raw_lengthscale")
    for _ in bin_kernel:
        k0.append(None)
    for d in cat_int_kernel:
        # explicit ProductKernel(masked_kernel1=cat-ish, masked_kernel2=rbf-ish)
        sub = (
            "base_kernel.kernels.1.kernels.0.raw_lengthscale"
            if masked(d["cont_covariate"])
            else "base_kernel.kernels.1.raw_lengthscale"
        )
        (k1 if d["cat_covariate"] == id_covariate else k0).append(sub)
    for d in bin_int_kernel:
        sub = (
            "base_kernel.kernels.1.kernels.0.raw_lengthscale"
            if masked(d["cont_covariate"])
            else "base_kernel.kernels.1.raw_lengthscale"
        )
        k0.append(sub)
    return k0, k1


def save_reference_gp_state(
    dirpath: str,
    gp,  # train.state.GPParams (kp0, kp1, raw_noise)
    zt: np.ndarray,  # [M, Q] shared inducing points (LVAE.py:199-204 layout)
    m: np.ndarray,  # [L, M, 1]
    H: np.ndarray,  # [L, M, M] (PSD)
    latent_dim: int,
    constrain_scales: bool = False,
    **spec_kwargs,  # cat_kernel, ..., covariate_missing_val, id_covariate
) -> str:
    """Write the reference's four GP resume files (LVAE.py:353-370).

    Makes migration bidirectional: a GP trained here loads back through
    ``gp_model.load_state_dict`` + ``zt_list/m/H`` torch.loads at
    LVAE.py:214-234. Raw parameters are re-expressed in GPyTorch's
    constraint space (softplus Positive for outputscale/lengthscale,
    GreaterThan(1e-8) for the likelihood noise) from this framework's
    log-space raws (ops.kernels.constrain semantics).
    """
    import os

    import torch

    from lvae_tpu.ops import kernels as kx

    os.makedirs(dirpath, exist_ok=True)
    paths0, paths1 = _component_key_paths(**spec_kwargs)

    sd = {}
    if constrain_scales:
        noise = np.ones((latent_dim,), np.float64)  # LVAE.py:186-188
    else:
        noise = np.asarray(kx.constrain(gp.raw_noise), np.float64)
    sd["likelihood.noise_covar.raw_noise"] = torch.tensor(
        _inv_softplus(noise - _GPY_MIN).reshape(latent_dim, 1)
    )

    def emit(kp, paths, offset):
        scale = np.asarray(kx.constrain(kp.raw_scale), np.float64)  # [L, C]
        ls = np.asarray(kx.constrain(kp.raw_lengthscale), np.float64)
        for c, sub in enumerate(paths):
            i = offset + c
            sd[f"covar_module.kernels.{i}.raw_outputscale"] = torch.tensor(
                _inv_softplus(scale[:, c])
            )
            if sub is not None:
                sd[f"covar_module.kernels.{i}.{sub}"] = torch.tensor(
                    _inv_softplus(ls[:, c]).reshape(latent_dim, 1, 1)
                )

    emit(gp.kp0, paths0, 0)
    emit(gp.kp1, paths1, len(paths0))

    torch.save(sd, os.path.join(dirpath, "gp_model.pth"))
    zt64 = np.asarray(zt, np.float64)
    torch.save(
        torch.tensor(np.broadcast_to(zt64, (latent_dim,) + zt64.shape).copy()),
        os.path.join(dirpath, "zt_list.pth"),
    )
    torch.save(torch.tensor(np.asarray(m, np.float64)), os.path.join(dirpath, "m.pth"))
    torch.save(torch.tensor(np.asarray(H, np.float64)), os.path.join(dirpath, "H.pth"))
    return dirpath


def load_reference_gp_state(dirpath: str, latent_dim: int, **spec_kwargs):
    """Read the reference's GP resume files back into lvae_tpu arrays.

    Returns ``(kp0_raw, kp1_raw, noise [L], zt [M, Q], m, H)`` where the
    kernel params are this framework's log-space raws (feed into
    ``GPParams``). Inverse of :func:`save_reference_gp_state`; also accepts
    genuine reference checkpoints written by LVAE.py:353-370 as long as the
    spec kwargs match the training config.
    """
    import os

    import numpy as _np
    import torch

    from lvae_tpu.ops import kernels as kx

    sd = torch.load(os.path.join(dirpath, "gp_model.pth"), map_location="cpu")
    sd = {k: _np.asarray(v.detach().cpu(), _np.float64) for k, v in sd.items()}
    paths0, paths1 = _component_key_paths(**spec_kwargs)

    noise = _softplus(sd["likelihood.noise_covar.raw_noise"]).reshape(latent_dim)
    noise = noise + _GPY_MIN

    def absorb(paths, offset):
        scale = _np.zeros((latent_dim, len(paths)), _np.float64)
        ls = _np.full(
            (latent_dim, len(paths)),
            float(kx.DEFAULT_LENGTHSCALE),
            _np.float64,
        )
        for c, sub in enumerate(paths):
            i = offset + c
            scale[:, c] = _softplus(
                sd[f"covar_module.kernels.{i}.raw_outputscale"]
            ).reshape(latent_dim)
            if sub is not None:
                ls[:, c] = _softplus(
                    sd[f"covar_module.kernels.{i}.{sub}"]
                ).reshape(latent_dim)
        return kx.KernelParams(
            raw_scale=_np.asarray(kx.unconstrain(scale)),
            raw_lengthscale=_np.asarray(kx.unconstrain(ls)),
        )

    kp0 = absorb(paths0, 0)
    kp1 = absorb(paths1, len(paths0))

    zt_list = _np.asarray(
        torch.load(os.path.join(dirpath, "zt_list.pth"), map_location="cpu"),
        _np.float64,
    )
    zt = zt_list[0]
    m = _np.asarray(torch.load(os.path.join(dirpath, "m.pth"), map_location="cpu"), _np.float64)
    H = _np.asarray(torch.load(os.path.join(dirpath, "H.pth"), map_location="cpu"), _np.float64)
    return kp0, kp1, noise, zt, m, H
