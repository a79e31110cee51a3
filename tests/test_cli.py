"""CLI tests: full recipe pipeline (preprocess -> train -> evaluate ->
separate) through the command surface on a synthetic corpus."""

import json
import os

import numpy as np

from convtasnet_tpu.cli import main
from tests.test_data import _write_corpus


def test_full_recipe_pipeline(tmp_path, capsys):
    root = str(tmp_path / "data")
    _write_corpus(root, [16000] * 6, split="tr", seed=0)
    _write_corpus(root, [16000] * 2, split="cv", seed=1)
    _write_corpus(root, [16000] * 2, split="tt", seed=2)
    work = str(tmp_path / "work")

    rc = main([
        "recipe", "--data-dir", root, "--work-dir", work,
        "--N", "16", "--L", "8", "--B", "12", "--H", "24", "--X", "2",
        "--R", "2", "--segment", "1.0", "--batch-size", "3",
        "--epochs", "2", "--print-freq", "100",
        "--compute-dtype", "float32",
    ])
    assert rc == 0
    # stage 1: manifests
    assert os.path.exists(os.path.join(work, "json", "tr", "mix.json"))
    # stage 2: config + checkpoint in auto-named exp dir
    ckpts = []
    for r, _, files in os.walk(os.path.join(work, "exp")):
        ckpts += [os.path.join(r, f) for f in files if f == "final.ckpt"]
    assert len(ckpts) == 1
    assert "_N16_L8_" in ckpts[0]  # exp dir encodes the config
    # stage 4: separated wavs
    sep = os.listdir(os.path.join(work, "separate"))
    assert sum(1 for f in sep if "_s1" in f) == 2


def test_preprocess_command(tmp_path):
    root = str(tmp_path / "data")
    _write_corpus(root, [8000, 12000], split="tr", seed=0)
    out = str(tmp_path / "json")
    rc = main(["preprocess", "--data-dir", root, "--out-dir", out])
    assert rc == 0
    with open(os.path.join(out, "tr", "s2.json")) as f:
        assert len(json.load(f)) == 2


def test_prepare_command(tmp_path):
    from convtasnet_tpu.data.audio_io import write_wav
    from convtasnet_tpu.tools.mixture import make_pair_list, write_pair_list

    src = tmp_path / "src"
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        write_wav(str(src / f"{name}.wav"),
                  0.2 * rng.standard_normal(16000), 8000)
    rows = make_pair_list({"a": [str(src / "a.wav")],
                           "b": [str(src / "b.wav")]}, 2, seed=0)
    pl = str(tmp_path / "pairs.txt")
    write_pair_list(rows, pl)
    out = str(tmp_path / "corpus" / "tr")
    rc = main(["prepare", "--pair-list", pl, "--out-dir", out])
    assert rc == 0
    assert len(os.listdir(os.path.join(out, "mix"))) >= 1


def test_plot_history(tmp_path):
    import json
    from convtasnet_tpu.utils.plot import plot_history

    hist = tmp_path / "history.jsonl"
    with open(hist, "w") as f:
        for e in range(3):
            f.write(json.dumps({"kind": "iter", "epoch": e, "iter": 0,
                                "loss": 5.0 - e}) + "\n")
            f.write(json.dumps({"kind": "epoch", "epoch": e, "split": "train",
                                "loss": 5.0 - e, "seconds": 1.0}) + "\n")
            f.write(json.dumps({"kind": "epoch", "epoch": e, "split": "valid",
                                "loss": 5.5 - e, "seconds": 1.0}) + "\n")
    out = plot_history(str(hist), per_iter=True)
    assert os.path.exists(out) and out.endswith("loss.png")
    assert os.path.getsize(out) > 1000


def test_plot_follow_rerenders_on_change(tmp_path):
    """--follow: the PNG is re-rendered when history.jsonl grows and left
    alone when it doesn't (the serverless live-monitor, visdom equivalent)."""
    import json
    from convtasnet_tpu.utils.plot import follow

    hist = tmp_path / "history.jsonl"
    rec = {"kind": "epoch", "epoch": 0, "split": "train",
           "loss": 3.0, "seconds": 1.0}
    with open(hist, "w") as f:
        f.write(json.dumps(rec) + "\n")
    out = follow(str(hist), out_path=str(tmp_path / "live.png"),
                 interval=0.01, max_iterations=1)
    assert os.path.exists(out)
    first = os.path.getsize(out)

    with open(hist, "a") as f:
        for e in range(1, 6):
            f.write(json.dumps({**rec, "epoch": e, "loss": 3.0 - e / 2})
                    + "\n")
    out2 = follow(str(hist), out_path=str(tmp_path / "live.png"),
                  interval=0.01, max_iterations=1)
    assert out2 == out
    assert os.path.getsize(out) > 0 and os.path.getsize(out) != first


def test_16khz_config(tmp_path):
    """16 kHz pipeline (WSJ-MIX-Hindi-style): manifests + a train batch +
    model forward at sr=16000."""
    import jax
    from convtasnet_tpu.config import ConvTasNetConfig
    from convtasnet_tpu.data.manifest import build_manifests
    from convtasnet_tpu.data.dataset import SeparationDataset
    from convtasnet_tpu.models.conv_tasnet import ConvTasNet, init_params
    from tests.test_data import _write_corpus

    root = str(tmp_path / "d")
    # reuse the corpus writer at 16k by generating at SR then re-labelling:
    rng = np.random.default_rng(0)
    for part in ("mix", "s1", "s2"):
        os.makedirs(os.path.join(root, "tr", part), exist_ok=True)
    from convtasnet_tpu.data.audio_io import write_wav
    for i in range(2):
        s1 = 0.3 * rng.standard_normal(32000).astype(np.float32)
        s2 = 0.3 * rng.standard_normal(32000).astype(np.float32)
        for part, sig in (("mix", s1 + s2), ("s1", s1), ("s2", s2)):
            write_wav(os.path.join(root, "tr", part, f"u{i}.wav"), sig, 16000)
    jd = os.path.join(root, "json")
    build_manifests(root, jd, 16000, splits=("tr",))
    ds = SeparationDataset(os.path.join(jd, "tr"), 2, 16000, segment=1.0)
    b = ds.load_batch(0)
    assert b.mixture.shape[1] == 16000  # 1 s at 16 kHz
    cfg = ConvTasNetConfig(n_filters=16, kernel_size=8, bottleneck=12,
                           hidden=24, conv_kernel=3, num_blocks=2,
                           num_repeats=1, num_speakers=2, sample_rate=16000)
    variables = init_params(cfg, jax.random.PRNGKey(0), example_len=16000)
    out = ConvTasNet(cfg).apply(variables, b.mixture)
    assert out.shape == (2, 2, 16000)


def test_profiler_context(tmp_path):
    from convtasnet_tpu.utils.metrics import StepTimer, profile
    import jax.numpy as jnp

    with profile(str(tmp_path / "trace"), enabled=True):
        _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert os.path.isdir(tmp_path / "trace")
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.tick()
    assert t.mean >= 0


def test_recipe_standalone_stage3(tmp_path, capsys):
    """`recipe --stage 3` on a previous run's work dir must find the trained
    checkpoint (it lives in an auto-named subdir) instead of failing."""
    root = str(tmp_path / "data")
    _write_corpus(root, [16000] * 4, split="tr", seed=0)
    _write_corpus(root, [16000] * 2, split="cv", seed=1)
    _write_corpus(root, [16000] * 2, split="tt", seed=2)
    work = str(tmp_path / "work")
    common = [
        "--data-dir", root, "--work-dir", work,
        "--N", "16", "--L", "8", "--B", "12", "--H", "24", "--X", "2",
        "--R", "2", "--segment", "1.0", "--batch-size", "2",
        "--epochs", "1", "--print-freq", "100",
        "--compute-dtype", "float32",
    ]
    assert main(["recipe", *common, "--stop-stage", "2"]) == 0
    capsys.readouterr()
    # fresh invocation: evaluate only, against the prior run's checkpoint
    assert main(["recipe", *common, "--stage", "3", "--stop-stage", "3"]) == 0
    out = capsys.readouterr().out
    assert "si_snri" in out or "loss" in out


def test_recipe_stage3_without_checkpoint_errors(tmp_path, capsys):
    root = str(tmp_path / "data")
    _write_corpus(root, [16000] * 2, split="tt", seed=2)
    work = str(tmp_path / "work")
    os.makedirs(os.path.join(work, "exp"), exist_ok=True)
    rc = main([
        "recipe", "--data-dir", root, "--work-dir", work,
        "--stage", "3", "--stop-stage", "3",
    ])
    assert rc == 1
    assert "no final.ckpt" in capsys.readouterr().err
