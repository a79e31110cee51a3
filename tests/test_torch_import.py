"""Checkpoint-importer + full-model numerical parity tests.

A reference-layout torch state_dict (built by the independent oracle in
``torch_oracle.py``) is imported into the JAX model and the two forward
passes must agree to float tolerance — covering every norm type, causal
mode, and mask nonlinearity. This is the parity gate for serving reference
checkpoints on TPU (SURVEY §7 step 7)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from convtasnet_tpu.config import ConvTasNetConfig
from convtasnet_tpu.models.conv_tasnet import ConvTasNet
from convtasnet_tpu.models.torch_import import (
    convert_state_dict,
    import_to_checkpoint,
    load_torch_package,
)
from tests.torch_oracle import forward as torch_forward, make_state_dict

SMALL = dict(n_filters=24, kernel_size=10, bottleneck=16, hidden=32,
             conv_kernel=3, num_blocks=3, num_repeats=2, num_speakers=2)


def _parity(cfg, seed=0, T=4000, atol=2e-4):
    sd = make_state_dict(cfg, seed=seed)
    variables = convert_state_dict(sd, cfg)
    mix = torch.randn(2, T, generator=torch.Generator().manual_seed(seed + 1))
    want = torch_forward(sd, cfg, mix).numpy()
    model = ConvTasNet(cfg)
    got = np.asarray(model.apply(variables, jnp.asarray(mix.numpy()), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


@pytest.mark.parametrize("norm_type", ["gLN", "cLN", "BN"])
def test_forward_parity_norms(norm_type):
    _parity(ConvTasNetConfig(**SMALL, norm_type=norm_type))


def test_forward_parity_causal():
    _parity(ConvTasNetConfig(**SMALL, norm_type="cLN", causal=True))


def test_forward_parity_softmax_c3():
    _parity(ConvTasNetConfig(**{**SMALL, "num_speakers": 3},
                             mask_nonlinear="softmax"))


def test_forward_parity_paper_config():
    """Full-size paper config (N=256 L=20 B=256 H=512 X=8 R=4): the shapes
    that the 15.5 dB reference checkpoint would carry."""
    cfg = ConvTasNetConfig()
    _parity(cfg, T=8000, atol=5e-4)


def test_torch_package_roundtrip(tmp_path):
    """A reference-style torch.save package imports end-to-end: config is
    reconstructed from hyperparams, converted checkpoint loads for
    inference, outputs match the oracle."""
    cfg = ConvTasNetConfig(**SMALL)
    sd = make_state_dict(cfg, seed=3)
    package = {
        "N": cfg.n_filters, "L": cfg.kernel_size, "B": cfg.bottleneck,
        "H": cfg.hidden, "P": cfg.conv_kernel, "X": cfg.num_blocks,
        "R": cfg.num_repeats, "C": cfg.num_speakers,
        "norm_type": cfg.norm_type, "causal": cfg.causal,
        "mask_nonlinear": cfg.mask_nonlinear,
        "state_dict": sd, "optim_dict": {}, "epoch": 42,
    }
    tp = str(tmp_path / "ref.pth.tar")
    torch.save(package, tp)

    cfg2, variables = load_torch_package(tp)
    assert cfg2 == cfg
    mix = torch.randn(1, 4000, generator=torch.Generator().manual_seed(7))
    want = torch_forward(sd, cfg, mix).numpy()
    model = ConvTasNet(cfg2)
    got = np.asarray(model.apply(variables, jnp.asarray(mix.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    # conversion to a native checkpoint file
    from convtasnet_tpu.train.checkpoint import load_params_for_inference

    cp = str(tmp_path / "imported.ckpt")
    import_to_checkpoint(tp, cp)
    cfg3, variables3 = load_params_for_inference(cp)
    assert cfg3 == cfg
    got3 = np.asarray(ConvTasNet(cfg3).apply(variables3, jnp.asarray(mix.numpy())))
    np.testing.assert_allclose(got3, want, rtol=1e-3, atol=2e-4)


def test_export_roundtrip(tmp_path):
    """export -> import round trip preserves every weight, and the exported
    state_dict drives the torch oracle to the same output as our model."""
    from convtasnet_tpu.models.torch_import import export_state_dict
    import jax
    from convtasnet_tpu.models.conv_tasnet import init_params

    cfg = ConvTasNetConfig(**SMALL)
    variables = init_params(cfg, jax.random.PRNGKey(5), example_len=4000)
    sd = export_state_dict(variables, cfg)
    mix = torch.randn(1, 4000, generator=torch.Generator().manual_seed(6))
    want = np.asarray(ConvTasNet(cfg).apply(variables, jnp.asarray(mix.numpy())))
    got = torch_forward(sd, cfg, mix).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)
    # and back through the importer
    variables2 = convert_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(variables2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_import_roundtrip_paper_config(tmp_path):
    """Full paper-config (8.7M-param) round trip through the reference
    package format: native ckpt -> export-torch -> import-torch -> bitwise
    weight equality and identical forward outputs."""
    import jax

    from convtasnet_tpu.config import SolverConfig
    from convtasnet_tpu.models.conv_tasnet import init_params
    from convtasnet_tpu.models.torch_import import export_to_torch
    from convtasnet_tpu.train.checkpoint import (
        load_params_for_inference,
        save_checkpoint,
    )
    from convtasnet_tpu.train.train_step import create_train_state

    cfg = ConvTasNetConfig()  # N=256 L=20 B=256 H=512 P=3 X=8 R=4 C=2 gLN
    state, _ = create_train_state(cfg, SolverConfig(lr=1e-3),
                                  jax.random.PRNGKey(11), 8000)
    native = str(tmp_path / "native.ckpt")
    save_checkpoint(native, state, cfg, epoch=7)

    ref_pkg = str(tmp_path / "ref_style.pth.tar")
    export_to_torch(native, ref_pkg)
    # the package opens with plain torch, reference-style keys present
    pkg = torch.load(ref_pkg, map_location="cpu", weights_only=False)
    assert (pkg["N"], pkg["L"], pkg["B"], pkg["H"]) == (256, 20, 256, 512)
    assert any(k.startswith("encoder.") for k in pkg["state_dict"])

    back = str(tmp_path / "reimported.ckpt")
    import_to_checkpoint(ref_pkg, back)
    cfg2, variables2 = load_params_for_inference(back)
    assert cfg2 == cfg

    orig = jax.tree_util.tree_leaves({"params": jax.device_get(state.params)})
    got = jax.tree_util.tree_leaves(
        {"params": variables2["params"]})
    assert len(orig) == len(got)
    for a, b in zip(orig, got):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    mix = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 8000)), jnp.float32)
    model = ConvTasNet(cfg)
    out_a = np.asarray(model.apply({"params": state.params}, mix))
    out_b = np.asarray(model.apply(variables2, mix))
    np.testing.assert_array_equal(out_a, out_b)
