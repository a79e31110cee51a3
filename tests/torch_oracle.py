"""Independent PyTorch oracle of the Conv-TasNet architecture.

A clean-room *functional* torch implementation of the published architecture
(Luo & Mesgarani, arXiv:1809.07454; knobs per SURVEY §2 rows 1-8), used to
validate (a) the JAX model's numerics end-to-end and (b) the reference
checkpoint importer. Parameters live in a flat dict whose keys follow the
reference ``state_dict`` naming convention (see
``convtasnet_tpu/models/torch_import.py``) so a state dict built here is
interchangeable with one from a real reference checkpoint.
"""

from itertools import product

import torch
import torch.nn.functional as F

EPS = 1e-8


def make_state_dict(cfg, seed=0):
    """Random reference-layout state_dict for the given ConvTasNetConfig."""
    g = torch.Generator().manual_seed(seed)
    N, L, B, H, P = (cfg.n_filters, cfg.kernel_size, cfg.bottleneck,
                     cfg.hidden, cfg.conv_kernel)
    X, R, C = cfg.num_blocks, cfg.num_repeats, cfg.num_speakers

    def rand(*shape):
        # fan-scaled so activations stay O(1) at any width (otherwise the
        # 32-block residual chain amplifies fp noise beyond any tolerance)
        fan = shape[1] * (shape[2] if len(shape) > 2 else 1) if len(shape) > 1 else 1
        return torch.randn(*shape, generator=g) / max(fan, 1) ** 0.5

    def norm_entries(prefix, ch):
        if cfg.norm_type in ("gLN", "cLN"):
            return {f"{prefix}.gamma": rand(1, ch, 1),
                    f"{prefix}.beta": rand(1, ch, 1)}
        return {f"{prefix}.weight": 1.0 + 0.1 * rand(ch),
                f"{prefix}.bias": 0.1 * rand(ch),
                f"{prefix}.running_mean": 0.1 * rand(ch),
                f"{prefix}.running_var": (1.0 + 0.1 * rand(ch)).abs()}

    sd = {
        "encoder.conv1d_U.weight": rand(N, 1, L),
        "decoder.basis_signals.weight": rand(L, N),
        "separator.network.1.weight": rand(B, N, 1),
        "separator.network.3.weight": rand(C * N, B, 1),
    }
    sd.update({"separator.network.0.gamma": rand(1, N, 1),
               "separator.network.0.beta": rand(1, N, 1)})
    k = 3 if cfg.causal else 2
    for r, x in product(range(R), range(X)):
        t = f"separator.network.2.{r}.{x}.net"
        sd[f"{t}.0.weight"] = rand(H, B, 1)
        sd[f"{t}.1.weight"] = torch.tensor([0.25]) + 0.05 * rand(1)
        sd.update(norm_entries(f"{t}.2", H))
        sd[f"{t}.3.net.0.weight"] = rand(H, 1, P)
        sd[f"{t}.3.net.{k - 1}.weight"] = torch.tensor([0.25]) + 0.05 * rand(1)
        sd.update(norm_entries(f"{t}.3.net.{k}", H))
        sd[f"{t}.3.net.{k + 1}.weight"] = rand(B, H, 1)
    return sd


def _norm(sd, prefix, y, norm_type):
    """y: [M, C, K] channels-first."""
    if norm_type == "cLN":
        mean = y.mean(dim=1, keepdim=True)
        var = y.var(dim=1, keepdim=True, unbiased=False)
        return sd[prefix + ".gamma"] * (y - mean) / (var + EPS).sqrt() \
            + sd[prefix + ".beta"]
    if norm_type == "gLN":
        mean = y.mean(dim=(1, 2), keepdim=True)
        var = ((y - mean) ** 2).mean(dim=(1, 2), keepdim=True)
        return sd[prefix + ".gamma"] * (y - mean) / (var + EPS).sqrt() \
            + sd[prefix + ".beta"]
    # BN (eval mode: running stats)
    return F.batch_norm(y, sd[prefix + ".running_mean"],
                        sd[prefix + ".running_var"], sd[prefix + ".weight"],
                        sd[prefix + ".bias"], training=False)


def forward(sd, cfg, mixture):
    """mixture: [M, T] float tensor -> est_source [M, C, T]."""
    N, L, B, H, P = (cfg.n_filters, cfg.kernel_size, cfg.bottleneck,
                     cfg.hidden, cfg.conv_kernel)
    X, R, C = cfg.num_blocks, cfg.num_repeats, cfg.num_speakers
    k = 3 if cfg.causal else 2

    with torch.no_grad():
        # encoder
        w_enc = F.relu(F.conv1d(mixture.unsqueeze(1),
                                sd["encoder.conv1d_U.weight"], stride=L // 2))
        M, _, K = w_enc.shape

        # separator
        y = _norm(sd, "separator.network.0", w_enc, "cLN")
        y = F.conv1d(y, sd["separator.network.1.weight"])
        for r, x in product(range(R), range(X)):
            t = f"separator.network.2.{r}.{x}.net"
            d = 2 ** x
            pad = (P - 1) * d if cfg.causal else (P - 1) * d // 2
            res = y
            h = F.conv1d(y, sd[f"{t}.0.weight"])
            h = F.prelu(h, sd[f"{t}.1.weight"])
            h = _norm(sd, f"{t}.2", h, cfg.norm_type)
            h = F.conv1d(h, sd[f"{t}.3.net.0.weight"], padding=pad,
                         dilation=d, groups=H)
            if cfg.causal:
                h = h[:, :, :-pad]
            h = F.prelu(h, sd[f"{t}.3.net.{k - 1}.weight"])
            h = _norm(sd, f"{t}.3.net.{k}", h, cfg.norm_type)
            h = F.conv1d(h, sd[f"{t}.3.net.{k + 1}.weight"])
            y = res + h
        score = F.conv1d(y, sd["separator.network.3.weight"]).view(M, C, N, K)
        mask = (F.softmax(score, dim=1) if cfg.mask_nonlinear == "softmax"
                else F.relu(score))

        # decoder: mask, basis matmul, overlap-add via fold
        src_w = w_enc.unsqueeze(1) * mask                      # [M, C, N, K]
        frames = torch.einsum("mcnk,ln->mclk", src_w,
                              sd["decoder.basis_signals.weight"])  # [M,C,L,K]
        hop = L // 2
        T_out = (K - 1) * hop + L
        out = F.fold(frames.reshape(M * C, L, K), (1, T_out), (1, L),
                     stride=(1, hop)).reshape(M, C, T_out)
        T = mixture.shape[-1]
        if T_out < T:
            out = F.pad(out, (0, T - T_out))
        return out
