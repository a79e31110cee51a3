"""Inference stack tests: native BSS-Eval sanity, evaluate/separate
end-to-end on a trained tiny model."""

import os

import numpy as np
import pytest

from convtasnet_tpu.infer.bss_eval import bss_eval_sources


def test_bss_eval_perfect_estimate():
    rng = np.random.default_rng(0)
    refs = rng.standard_normal((2, 4000))
    sdr, sir, sar, perm = bss_eval_sources(refs, refs.copy())
    assert np.all(sdr > 100)
    np.testing.assert_array_equal(perm, [0, 1])


def test_bss_eval_detects_permutation():
    rng = np.random.default_rng(1)
    refs = rng.standard_normal((2, 4000))
    ests = refs[::-1].copy()
    sdr, _, _, perm = bss_eval_sources(refs, ests)
    assert np.all(sdr > 100)
    np.testing.assert_array_equal(perm, [1, 0])


def test_bss_eval_known_snr():
    rng = np.random.default_rng(2)
    refs = rng.standard_normal((2, 8000))
    noise = rng.standard_normal((2, 8000))
    snr_db = 10.0
    scale = 10 ** (-snr_db / 20)
    ests = refs + scale * noise * (np.std(refs, axis=1, keepdims=True)
                                   / np.std(noise, axis=1, keepdims=True))
    sdr, _, _, _ = bss_eval_sources(refs, ests)
    # projection absorbs a bit of noise; allow a few dB of slack
    assert np.all(np.abs(sdr - snr_db) < 3.0), sdr


def test_bss_eval_filter_invariance():
    """A short FIR-filtered reference is still 'target' (512-tap allowance)."""
    rng = np.random.default_rng(3)
    refs = rng.standard_normal((2, 6000))
    h = np.array([0.8, 0.15, -0.05])
    ests = np.stack([np.convolve(r, h)[: refs.shape[1]] for r in refs])
    sdr, _, _, _ = bss_eval_sources(refs, ests)
    assert np.all(sdr > 40), sdr


def _correlated_case(rng, C, T, rho=0.6):
    """C sources sharing a common component (correlated refs — the case
    where the Gram off-diagonal blocks and the Toeplitz solve matter)."""
    common = rng.standard_normal(T)
    refs = np.stack([rho * common + (1 - rho) * rng.standard_normal(T)
                     for _ in range(C)])
    h = rng.standard_normal(9) * np.array([1, .5, .3, .2, .1, .1, .05, .05, .02])
    ests = np.stack([
        np.convolve(refs[(i + 1) % C] * 0.3 + refs[i], h)[:T]
        + 0.05 * rng.standard_normal(T)
        for i in range(C)])
    return refs, ests


@pytest.mark.parametrize("C,T,flen", [(2, 1500, 128), (3, 1200, 96)])
def test_bss_eval_matches_direct_oracle(C, T, flen):
    """The FFT/Toeplitz solver matches the explicit design-matrix + lstsq
    oracle (Vincent et al. 2006 transcription) to < 0.01 dB on correlated,
    filtered, noisy cases — the anchor the round-2 review asked for."""
    from tests.bss_oracle import bss_eval_sources_direct

    rng = np.random.default_rng(7 + C)
    refs, ests = _correlated_case(rng, C, T)
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, flen=flen)
    sdr_o, sir_o, sar_o, perm_o = bss_eval_sources_direct(refs, ests, flen=flen)
    np.testing.assert_array_equal(perm, perm_o)
    np.testing.assert_allclose(sdr, sdr_o, atol=0.01)
    np.testing.assert_allclose(sir, sir_o, atol=0.01)
    np.testing.assert_allclose(sar, sar_o, atol=0.01)


def test_bss_eval_matches_direct_oracle_full_flen():
    """One C=2 case at the production 512-tap filter length."""
    from tests.bss_oracle import bss_eval_sources_direct

    rng = np.random.default_rng(11)
    refs, ests = _correlated_case(rng, 2, 2500)
    sdr, _, _, perm = bss_eval_sources(refs, ests)  # flen=512 default
    sdr_o, _, _, perm_o = bss_eval_sources_direct(refs, ests, flen=512)
    np.testing.assert_array_equal(perm, perm_o)
    np.testing.assert_allclose(sdr, sdr_o, atol=0.01)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    """Train a tiny model for a few epochs on separable sine mixtures."""
    from tests.test_data import _write_corpus
    from convtasnet_tpu.config import (
        ConvTasNetConfig, DataConfig, SolverConfig, TrainConfig)
    from convtasnet_tpu.data.manifest import build_manifests
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.data.loader import BatchLoader
    from convtasnet_tpu.train.solver import Solver

    tmp = tmp_path_factory.mktemp("infer_e2e")
    root = _write_corpus(str(tmp), [16000] * 8, split="tr", seed=0)
    _write_corpus(str(tmp), [16000] * 2, split="cv", seed=1)
    _write_corpus(str(tmp), [16000] * 2, split="tt", seed=2)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, 8000, splits=("tr", "cv", "tt"))

    tiny = ConvTasNetConfig(
        n_filters=32, kernel_size=16, bottleneck=16, hidden=32, conv_kernel=3,
        num_blocks=3, num_repeats=2, num_speakers=2)
    cfg = TrainConfig(
        model=tiny,
        data=DataConfig(segment=1.0, batch_size=4),
        solver=SolverConfig(epochs=60, lr=2e-3, save_folder=str(tmp / "exp"),
                            print_freq=1000))
    tr = BatchLoader(SeparationDataset(os.path.join(jd, "tr"), 4, 8000, 1.0),
                     shuffle=True)
    cv = BatchLoader(SeparationDataset(os.path.join(jd, "cv"), 1, 8000, -1.0,
                                       cv_maxlen=8.0), pad_to_multiple=8000)
    Solver(cfg, tr, cv).train()
    return {"root": root, "jd": jd,
            "ckpt": os.path.join(str(tmp / "exp"), "final.ckpt"),
            "tmp": str(tmp)}


def test_evaluate_end_to_end(trained_model):
    from convtasnet_tpu.infer.evaluate import evaluate

    res = evaluate(trained_model["ckpt"], os.path.join(trained_model["jd"], "tt"),
                   sample_rate=8000, verbose=False)
    assert np.isfinite(res["si_snri"])
    # sines are trivially separable: even a briefly-trained model must improve
    assert res["si_snri"] > 0.0, res


def test_evaluate_with_sdr(trained_model):
    from convtasnet_tpu.infer.evaluate import evaluate

    res = evaluate(trained_model["ckpt"], os.path.join(trained_model["jd"], "tt"),
                   sample_rate=8000, cal_sdr=True, max_batches=1, verbose=False)
    assert np.isfinite(res["sdri"])


def test_separate_end_to_end(trained_model):
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.data.audio_io import read_wav

    out_dir = os.path.join(trained_model["tmp"], "separated")
    n = separate(trained_model["ckpt"], out_dir,
                 mix_dir=os.path.join(trained_model["root"], "tt", "mix"),
                 sample_rate=8000)
    assert n == 2
    wavs = sorted(os.listdir(out_dir))
    stems = [w for w in wavs if "_s" in w]
    assert len(stems) == 4  # 2 utts x 2 speakers
    x, sr = read_wav(os.path.join(out_dir, stems[0]))
    assert sr == 8000 and x.shape[0] == 16000


def test_separate_streaming_end_to_end(tmp_path):
    """Streaming separation through the public API on a causal model."""
    import jax
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.models.conv_tasnet import init_params
    from convtasnet_tpu.train.checkpoint import save_checkpoint
    from convtasnet_tpu.infer.separate import separate
    from convtasnet_tpu.data.audio_io import read_wav, write_wav

    cfg = ConvTasNetConfig(
        n_filters=16, kernel_size=8, bottleneck=12, hidden=24, conv_kernel=3,
        num_blocks=2, num_repeats=1, num_speakers=2, norm_type="cLN",
        causal=True)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=8000)
    state = {"params": variables["params"], "batch_stats": {}}
    ckpt = str(tmp_path / "causal.ckpt")
    save_checkpoint(ckpt, state, cfg, epoch=0)

    mix_dir = tmp_path / "mix"
    os.makedirs(mix_dir)
    rng = np.random.default_rng(0)
    write_wav(str(mix_dir / "utt.wav"),
              0.3 * rng.standard_normal(9000).astype(np.float32), 8000)
    out_dir = str(tmp_path / "out")
    n = separate(ckpt, out_dir, mix_dir=str(mix_dir), streaming=True,
                 chunk_seconds=0.25)
    assert n == 1
    y, sr = read_wav(os.path.join(out_dir, "utt_s1.wav"))
    assert sr == 8000 and y.shape[0] == 9000


def test_loader_propagates_worker_errors(tmp_path):
    from convtasnet_tpu.data.loader import BatchLoader

    class BoomDataset:
        def __len__(self):
            return 2

        def load_batch(self, i, pad_to_multiple=1):
            raise RuntimeError("decode failure")

    loader = BatchLoader(BoomDataset())
    with pytest.raises(RuntimeError, match="decode failure"):
        list(loader)


def test_separate_use_pallas_override(trained_model):
    """Explicit use_pallas=True routes separate through the fused kernels
    (interpret mode on CPU) and produces the same audio as the XLA path
    (the CPU default)."""
    from convtasnet_tpu.data.audio_io import read_wav
    from convtasnet_tpu.infer.separate import separate

    mix_dir = os.path.join(trained_model["root"], "tt", "mix")
    out_xla = os.path.join(trained_model["tmp"], "sep_xla")
    out_fused = os.path.join(trained_model["tmp"], "sep_fused")
    assert separate(trained_model["ckpt"], out_xla, mix_dir=mix_dir,
                    sample_rate=8000) == 2
    assert separate(trained_model["ckpt"], out_fused, mix_dir=mix_dir,
                    sample_rate=8000, use_pallas=True) == 2
    for name in sorted(os.listdir(out_xla)):
        a, _ = read_wav(os.path.join(out_xla, name))
        b, _ = read_wav(os.path.join(out_fused, name))
        np.testing.assert_allclose(a, b, atol=2e-4)
