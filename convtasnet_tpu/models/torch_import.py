"""Import reference PyTorch checkpoints into this framework.

The reference serializes a self-describing "package" dict via ``torch.save``
(hyperparams + ``state_dict`` + optimizer state, ``src/conv_tasnet.py:78-94``).
This module converts such packages — or a bare reference-layout
``state_dict`` — into our channels-last parameter pytree, so existing
trained models (e.g. the 15.5 dB wsj0-2mix model) can be validated and
served on TPU without retraining.

Layout mapping (torch [out, in, kW] conv weights / [1, C, 1] norm affines →
channels-last matmul weights / [C] vectors):

===========================================  =================================
reference tensor                             ours
===========================================  =================================
encoder.conv1d_U.weight        [N, 1, L]     encoder/w                [L, N]
decoder.basis_signals.weight   [L, N]        decoder/w                [N, L]
separator.network.0.{gamma,beta} [1,N,1]     separator/input_norm     [N]
separator.network.1.weight     [B, N, 1]     separator/bottleneck     [N, B]
separator.network.2.<r>.<x>.net.0.weight     block_r<r>_x<x>/conv1x1  [B, H]
  .net.1.weight (PReLU, [1])                 .../prelu1               ()
  .net.2.{gamma,beta|weight,bias,...}        .../norm1
  .net.3.net.0.weight          [H, 1, P]     .../dwconv               [P, H]
  .net.3.net.<k>.weight (PReLU)              .../prelu2
  .net.3.net.<k+1>.*                         .../norm2
  .net.3.net.<k+2>.weight      [B, H, 1]     .../pwconv               [H, B]
separator.network.3.weight     [C*N, B, 1]   separator/mask_conv      [B, C*N]
===========================================  =================================

(<k> = 2 for non-causal, 3 for causal — the causal stack interposes a Chomp
module, ``src/conv_tasnet.py:264-269``.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from convtasnet_tpu.config import ConvTasNetConfig


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy().astype(np.float32)
    except AttributeError:
        return np.asarray(t, np.float32)


def _norm_params(sd: Dict[str, Any], prefix: str, norm_type: str):
    """-> (params_dict, batch_stats_or_None) for one norm layer."""
    if norm_type in ("gLN", "cLN"):
        return (
            {
                "gamma": _np(sd[prefix + ".gamma"]).reshape(-1),
                "beta": _np(sd[prefix + ".beta"]).reshape(-1),
            },
            None,
        )
    # BatchNorm1d
    return (
        {
            "gamma": _np(sd[prefix + ".weight"]).reshape(-1),
            "beta": _np(sd[prefix + ".bias"]).reshape(-1),
        },
        {
            "mean": _np(sd[prefix + ".running_mean"]).reshape(-1),
            "var": _np(sd[prefix + ".running_var"]).reshape(-1),
        },
    )


def convert_state_dict(
    sd: Dict[str, Any], cfg: ConvTasNetConfig
) -> Dict[str, Any]:
    """Reference-layout torch ``state_dict`` -> flax variables dict."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    params["encoder"] = {
        "w": _np(sd["encoder.conv1d_U.weight"])[:, 0, :].T  # [N,1,L] -> [L,N]
    }
    params["decoder"] = {"w": _np(sd["decoder.basis_signals.weight"]).T}

    sep: Dict[str, Any] = {}
    sep_stats: Dict[str, Any] = {}
    in_norm, in_stats = _norm_params(sd, "separator.network.0", "cLN")
    sep["input_norm"] = in_norm
    sep["bottleneck"] = _np(sd["separator.network.1.weight"])[:, :, 0].T
    sep["mask_conv"] = _np(sd["separator.network.3.weight"])[:, :, 0].T

    # dsconv inner indices: depthwise at 0, then [chomp,] prelu, norm, pointwise
    k = 3 if cfg.causal else 2
    for r in range(cfg.num_repeats):
        for x in range(cfg.num_blocks):
            t = f"separator.network.2.{r}.{x}.net"
            name = f"block_r{r}_x{x}"
            norm1, stats1 = _norm_params(sd, f"{t}.2", cfg.norm_type)
            norm2, stats2 = _norm_params(sd, f"{t}.3.net.{k}", cfg.norm_type)
            blk = {
                "conv1x1": _np(sd[f"{t}.0.weight"])[:, :, 0].T,      # [H,B,1]->[B,H]
                "prelu1": _np(sd[f"{t}.1.weight"]).reshape(()),
                "norm1": norm1,
                "dwconv": _np(sd[f"{t}.3.net.0.weight"])[:, 0, :].T,  # [H,1,P]->[P,H]
                "prelu2": _np(sd[f"{t}.3.net.{k - 1}.weight"]).reshape(()),
                "norm2": norm2,
                "pwconv": _np(sd[f"{t}.3.net.{k + 1}.weight"])[:, :, 0].T,  # [B,H,1]->[H,B]
            }
            sep[name] = blk
            if stats1 is not None:
                sep_stats[name] = {"norm1": stats1, "norm2": stats2}
    params["separator"] = sep

    variables: Dict[str, Any] = {"params": params}
    if cfg.norm_type == "BN":
        batch_stats["separator"] = sep_stats
        variables["batch_stats"] = batch_stats
    return variables


def load_torch_package(path: str) -> Tuple[ConvTasNetConfig, Dict[str, Any]]:
    """Load a reference ``torch.save`` package -> (config, flax variables).

    Hyperparameter keys follow ``ConvTasNet.serialize``
    (``src/conv_tasnet.py:80-85``).
    """
    import torch

    package = torch.load(path, map_location="cpu", weights_only=False)
    cfg = ConvTasNetConfig(
        n_filters=int(package["N"]),
        kernel_size=int(package["L"]),
        bottleneck=int(package["B"]),
        hidden=int(package["H"]),
        conv_kernel=int(package["P"]),
        num_blocks=int(package["X"]),
        num_repeats=int(package["R"]),
        num_speakers=int(package["C"]),
        norm_type=str(package["norm_type"]),
        causal=bool(package["causal"]),
        mask_nonlinear=str(package["mask_nonlinear"]),
    )
    return cfg, convert_state_dict(package["state_dict"], cfg)


def import_to_checkpoint(torch_path: str, out_path: str) -> ConvTasNetConfig:
    """One-shot: torch package -> native framework checkpoint file."""
    from convtasnet_tpu.train.checkpoint import save_checkpoint

    cfg, variables = load_torch_package(torch_path)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    save_checkpoint(out_path, state, cfg, epoch=0,
                    extra={"imported_from": torch_path})
    return cfg


def export_state_dict(variables: Dict[str, Any], cfg: ConvTasNetConfig):
    """Flax variables -> reference-layout torch ``state_dict`` (the inverse
    of ``convert_state_dict``), so models trained here can be loaded by
    reference-compatible PyTorch tooling."""
    if getattr(cfg, "separator", "tcn") != "tcn":
        raise ValueError(
            "torch export targets the reference TCN layout; the dual-path "
            "separator has no reference-side equivalent to export to")
    import torch

    params = variables["params"]
    stats = variables.get("batch_stats", {}).get("separator", {})

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))

    sd = {
        "encoder.conv1d_U.weight": t(params["encoder"]["w"].T[:, None, :]),
        "decoder.basis_signals.weight": t(params["decoder"]["w"].T),
    }
    sep = params["separator"]
    sd["separator.network.0.gamma"] = t(
        sep["input_norm"]["gamma"].reshape(1, -1, 1))
    sd["separator.network.0.beta"] = t(
        sep["input_norm"]["beta"].reshape(1, -1, 1))
    sd["separator.network.1.weight"] = t(sep["bottleneck"].T[:, :, None])
    sd["separator.network.3.weight"] = t(sep["mask_conv"].T[:, :, None])

    def norm_entries(prefix, prm, st):
        if cfg.norm_type in ("gLN", "cLN"):
            sd[prefix + ".gamma"] = t(prm["gamma"].reshape(1, -1, 1))
            sd[prefix + ".beta"] = t(prm["beta"].reshape(1, -1, 1))
        else:
            sd[prefix + ".weight"] = t(prm["gamma"])
            sd[prefix + ".bias"] = t(prm["beta"])
            sd[prefix + ".running_mean"] = t(st["mean"])
            sd[prefix + ".running_var"] = t(st["var"])
            sd[prefix + ".num_batches_tracked"] = torch.tensor(0)

    k = 3 if cfg.causal else 2
    for r in range(cfg.num_repeats):
        for x in range(cfg.num_blocks):
            name = f"block_r{r}_x{x}"
            blk = sep[name]
            st = stats.get(name, {})
            tpre = f"separator.network.2.{r}.{x}.net"
            sd[f"{tpre}.0.weight"] = t(blk["conv1x1"].T[:, :, None])
            sd[f"{tpre}.1.weight"] = t(np.reshape(blk["prelu1"], (1,)))
            norm_entries(f"{tpre}.2", blk["norm1"], st.get("norm1"))
            sd[f"{tpre}.3.net.0.weight"] = t(blk["dwconv"].T[:, None, :])
            sd[f"{tpre}.3.net.{k - 1}.weight"] = t(
                np.reshape(blk["prelu2"], (1,)))
            norm_entries(f"{tpre}.3.net.{k}", blk["norm2"], st.get("norm2"))
            sd[f"{tpre}.3.net.{k + 1}.weight"] = t(blk["pwconv"].T[:, :, None])
    return sd


def export_to_torch(ckpt_path: str, out_path: str) -> None:
    """Native checkpoint -> reference-style ``torch.save`` package
    (hyperparam keys per ``ConvTasNet.serialize``, ``src/conv_tasnet.py:80-85``)."""
    import torch

    from convtasnet_tpu.train.checkpoint import load_checkpoint

    state_dict, meta = load_checkpoint(ckpt_path)
    cfg = ConvTasNetConfig.from_dict(meta["model"])
    variables = {"params": state_dict["params"]}
    if state_dict.get("batch_stats"):
        variables["batch_stats"] = state_dict["batch_stats"]
    package = {
        "N": cfg.n_filters, "L": cfg.kernel_size, "B": cfg.bottleneck,
        "H": cfg.hidden, "P": cfg.conv_kernel, "X": cfg.num_blocks,
        "R": cfg.num_repeats, "C": cfg.num_speakers,
        "norm_type": cfg.norm_type, "causal": cfg.causal,
        "mask_nonlinear": cfg.mask_nonlinear,
        "state_dict": export_state_dict(variables, cfg),
        "optim_dict": {}, "epoch": meta.get("epoch", 0),
    }
    torch.save(package, out_path)
