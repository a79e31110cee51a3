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
