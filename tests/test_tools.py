"""Mixture-generation tool tests: P.56 active level invariants, pairing
lists, and the end-to-end corpus generator."""

import os

import numpy as np
import pytest

from convtasnet_tpu.data.audio_io import read_wav, write_wav
from convtasnet_tpu.tools.activlev import active_level, normalize_active
from convtasnet_tpu.tools.mixture import (
    create_mixtures,
    make_pair_list,
    read_pair_list,
    write_pair_list,
)

SR = 8000


def _speechlike(duration, fs, active_frac=0.5, seed=0):
    """Bursty signal: active speech-band noise separated by silence."""
    rng = np.random.default_rng(seed)
    T = int(duration * fs)
    x = np.zeros(T)
    burst = int(0.25 * fs)
    t = 0
    while t + burst <= T:
        if rng.uniform() < active_frac:
            x[t:t + burst] = rng.standard_normal(burst)
        t += burst
    return x


def test_active_level_ignores_silence():
    """Appending silence must not change the *active* level (the whole point
    of P.56 vs long-term RMS)."""
    x = _speechlike(4.0, SR, active_frac=1.0)
    lev1, act1 = active_level(x, SR)
    padded = np.concatenate([x, np.zeros(4 * SR)])
    lev2, act2 = active_level(padded, SR)
    assert abs(10 * np.log10(lev2 / lev1)) < 1.0, (lev1, lev2)
    assert act2 < act1 + 0.05


def test_active_level_tracks_power():
    x = 0.25 * _speechlike(4.0, SR, active_frac=1.0, seed=1)
    lev, act = active_level(x, SR, highpass=False)
    # fully-active white noise: active level ~ long-term power (0.0625)
    assert abs(10 * np.log10(lev / 0.0625)) < 1.5
    assert act > 0.8


def test_normalize_active_unit_level():
    x = 0.1 * _speechlike(3.0, SR, active_frac=0.6, seed=2)
    y, lev = normalize_active(x, SR)
    lev2, _ = active_level(y, SR)
    assert abs(10 * np.log10(lev2)) < 1.0  # ~0 dB after normalization


def test_pair_list_roundtrip(tmp_path):
    files = {f"spk{i}": [f"/data/spk{i}/utt{j}.wav" for j in range(3)]
             for i in range(4)}
    rows = make_pair_list(files, 10, seed=0)
    assert len(rows) == 10
    for r in rows:
        spk = [p.split("/")[2] for p in r.paths]
        assert spk[0] != spk[1]  # different speakers
        assert abs(r.snrs[0] + r.snrs[1]) < 1e-6  # symmetric +/- SNR
        assert 0.01 <= abs(r.snrs[0]) <= 2.5
    p = str(tmp_path / "mix_2_spk_tr.txt")
    write_pair_list(rows, p)
    back = read_pair_list(p)
    assert [r.paths for r in back] == [r.paths for r in rows]
    np.testing.assert_allclose([r.snrs for r in back], [r.snrs for r in rows])


@pytest.mark.parametrize("mode", ["min", "max"])
def test_create_mixtures_end_to_end(tmp_path, mode):
    # source corpus: two "speakers" with different-length utterances
    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    rng = np.random.default_rng(0)
    lens = {"a": 3 * SR, "b": 2 * SR}
    for name, n in lens.items():
        x = 0.2 * _speechlike(n / SR, SR, active_frac=1.0,
                              seed=ord(name))
        write_wav(str(src_dir / f"{name}.wav"), x, SR)
    rows = make_pair_list(
        {"a": [str(src_dir / "a.wav")], "b": [str(src_dir / "b.wav")]},
        1, seed=1)
    out = str(tmp_path / "out" / "tr")
    names = create_mixtures(rows, out, SR, mode=mode)
    assert len(names) == 1
    mix, _ = read_wav(os.path.join(out, "mix", names[0] + ".wav"))
    s1, _ = read_wav(os.path.join(out, "s1", names[0] + ".wav"))
    s2, _ = read_wav(os.path.join(out, "s2", names[0] + ".wav"))
    want_len = (2 if mode == "min" else 3) * SR
    assert len(mix) == len(s1) == len(s2) == want_len
    # mix == s1 + s2 (up to PCM16 quantization)
    np.testing.assert_allclose(mix, s1 + s2, atol=3.0 / 32768)
    # peak scaled to 0.9
    peak = max(np.abs(mix).max(), np.abs(s1).max(), np.abs(s2).max())
    assert 0.85 < peak <= 0.91
    # scaling factors recorded
    z = np.load(os.path.join(out, "scaling.npz"))
    assert list(z["names"]) == names


def test_create_mixtures_three_speakers(tmp_path):
    src_dir = tmp_path / "src"
    os.makedirs(src_dir)
    rng = np.random.default_rng(3)
    paths = []
    for name in ("a", "b", "c"):
        p = str(src_dir / f"{name}.wav")
        write_wav(p, 0.2 * _speechlike(2.0, SR, active_frac=1.0,
                                       seed=ord(name)), SR)
        paths.append(p)
    from convtasnet_tpu.tools.mixture import MixRow
    rows = [MixRow(tuple(paths), (1.0, -1.0, 0.5))]
    out = str(tmp_path / "out" / "tr")
    names = create_mixtures(rows, out, SR, mode="min")
    for part in ("s1", "s2", "s3", "mix"):
        assert os.path.exists(os.path.join(out, part, names[0] + ".wav"))
    mix, _ = read_wav(os.path.join(out, "mix", names[0] + ".wav"))
    total = sum(read_wav(os.path.join(out, f"s{c+1}", names[0] + ".wav"))[0]
                for c in range(3))
    np.testing.assert_allclose(mix, total, atol=4.0 / 32768)


# ---- P.56 active-level oracle -------------------------------------------
# Hand-computable signals with known active levels: a correct P.56 meter
# reports the level over ACTIVE speech; a naive RMS meter reports the
# long-term level and fails the duty-cycle cases. (The reference vendors
# voicebox activlev.m for this, tools/matlab-code/activlev.m:71-78.)

BURST_PERIOD = 3.0  # s; gaps must dwarf the 0.2 s P.56 hangover


def _speech_burst(fs, dur, duty, seed=0, f0=300.0):
    """duty-cycled modulated tone bursts: unit power while active."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * fs)) / fs
    x = np.sqrt(2.0) * np.sin(2 * np.pi * f0 * t)
    x *= 1.0 + 0.3 * np.sin(2 * np.pi * 2.3 * t)  # syllabic modulation
    period = int(BURST_PERIOD * fs)
    gate = (np.arange(len(t)) % period) < int(duty * period)
    return x * gate, gate


def _expected_active(burst_power, duty):
    """P.56 counts the 0.2 s hangover after each burst as active."""
    on = duty * BURST_PERIOD
    return burst_power * on / (on + 0.2)


def test_p56_duty_cycle_measures_active_level_not_long_term():
    from convtasnet_tpu.tools.activlev import active_level

    fs = 8000
    x, gate = _speech_burst(fs, 12.0, duty=0.5)
    burst_power = float(np.mean(x[gate] ** 2))
    lev, act = active_level(x, fs, highpass=False)
    # the meter must report ~the burst power (hangover-corrected), not the
    # 3 dB lower long-term level
    assert abs(10 * np.log10(lev / _expected_active(burst_power, 0.5))) < 0.8
    assert 0.4 < act < 0.75  # ~50% active (hangover inflates it slightly)
    # a 25% duty cycle: same active level, lower activity
    x2, gate2 = _speech_burst(fs, 12.0, duty=0.25)
    burst2 = float(np.mean(x2[gate2] ** 2))
    lev2, act2 = active_level(x2, fs, highpass=False)
    assert abs(10 * np.log10(lev2 / _expected_active(burst2, 0.25))) < 1.0
    assert act2 < act


def test_p56_continuous_signal_activity_near_one():
    from convtasnet_tpu.tools.activlev import active_level

    fs = 8000
    t = np.arange(4 * fs) / fs
    x = np.sqrt(2.0) * np.sin(2 * np.pi * 440 * t)
    lev, act = active_level(x, fs, highpass=False)
    assert abs(10 * np.log10(lev / 1.0)) < 0.5  # unit-power tone
    assert act > 0.9


def test_p56_scale_invariance_and_silence_padding():
    from convtasnet_tpu.tools.activlev import active_level

    fs = 8000
    x, _ = _speech_burst(fs, 6.0, duty=0.6, seed=1)
    lev, act = active_level(x, fs)
    lev_scaled, _ = active_level(7.5 * x, fs)
    np.testing.assert_allclose(lev_scaled, 7.5 ** 2 * lev, rtol=1e-3)
    # appending silence must not move the active level (but halves activity)
    padded = np.concatenate([x, np.zeros_like(x)])
    lev_p, act_p = active_level(padded, fs)
    assert abs(10 * np.log10(lev_p / lev)) < 0.5
    assert act_p < 0.65 * act + 0.05


def test_p56_measurement_band_excludes_out_of_band_energy():
    """At 16 kHz the P.56 band is 200-5500 Hz: a strong 7 kHz tone added on
    top of in-band speech must barely move the measured level."""
    from convtasnet_tpu.tools.activlev import active_level

    fs = 16000
    x, _ = _speech_burst(fs, 6.0, duty=0.5, f0=500.0)
    t = np.arange(len(x)) / fs
    noise = 2.0 * np.sin(2 * np.pi * 7000 * t)  # 6 dB above the speech
    lev, _ = active_level(x, fs)
    lev_noisy, _ = active_level(x + noise, fs)
    assert abs(10 * np.log10(lev_noisy / lev)) < 1.0


def test_create_mixtures_multi_variants(tmp_path):
    """One pass emits all four (rate, mode) trees with consistent content
    (parity: create_wav_2speakers.m writes 8k&16k x min&max + scaling)."""
    from convtasnet_tpu.data.audio_io import read_wav, write_wav
    from convtasnet_tpu.tools.mixture import MixRow, create_mixtures_multi

    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    os.makedirs(src)
    lens = [20000, 26000]
    for i, n in enumerate(lens):
        t = np.arange(n) / 16000
        x = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t)
        write_wav(str(src / f"u{i}.wav"), x.astype(np.float32), 16000)
    rows = [MixRow((str(src / "u0.wav"), str(src / "u1.wav")), (1.0, -1.0))]
    out = str(tmp_path / "out")
    names = create_mixtures_multi(rows, out)
    assert len(names) == 1
    for rate, rdir in ((8000, "wav8k"), (16000, "wav16k")):
        for mode in ("min", "max"):
            d = os.path.join(out, rdir, mode)
            mix, sr = read_wav(os.path.join(d, "mix", names[0] + ".wav"))
            s1, _ = read_wav(os.path.join(d, "s1", names[0] + ".wav"))
            s2, _ = read_wav(os.path.join(d, "s2", names[0] + ".wav"))
            assert sr == rate
            expected = (min(lens) if mode == "min" else max(lens))
            assert len(mix) == expected * rate // 16000
            # mixture is the sum of the written sources
            np.testing.assert_allclose(mix, s1 + s2, atol=3e-4)
            # peak rescale to 0.9
            peak = max(np.abs(mix).max(), np.abs(s1).max(), np.abs(s2).max())
            np.testing.assert_allclose(peak, 0.9, atol=2e-3)
            assert os.path.exists(os.path.join(d, "scaling.npz"))
    # 'max' tree zero-pads the short source
    s1max, _ = read_wav(os.path.join(out, "wav8k", "max", "s1",
                                     names[0] + ".wav"))
    assert np.allclose(s1max[-(26000 - 20000) // 2:], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# One-command WSJ0 stage 0 (tools/wsj0.py)
# ---------------------------------------------------------------------------

def _write_sphere(path, x_int16, sr=8000):
    """Shorten-compressed NIST SPHERE file (the WSJ0 .wv1 format)."""
    from convtasnet_tpu.data import shorten as sh

    payload = sh.encode(x_int16, ftype=sh.TYPE_S16HL)
    header = (
        "NIST_1A\n   1024\n"
        f"sample_count -i {len(x_int16)}\n"
        f"sample_rate -i {sr}\n"
        "channel_count -i 1\n"
        "sample_n_bytes -i 2\n"
        "sample_byte_format -s2 10\n"
        "sample_coding -s24 pcm,embedded-shorten-v2\n"
        "end_head\n"
    ).encode()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header + b" " * (1024 - len(header)))
        f.write(payload)


def _fake_wsj0_disc(root, sr=8000):
    """Two-speaker sphere tree in the disc layout data_prepare.sh walks."""
    rng = np.random.default_rng(3)
    utts = {}
    for set_, spk, utt in [
        ("si_tr_s", "011", "011c0201"), ("si_tr_s", "012", "012c0202"),
        ("si_dt_05", "013", "013c0203"), ("si_dt_05", "014", "014c0204"),
    ]:
        t = np.arange(2 * sr) / sr
        f0 = rng.uniform(200, 900)
        x = (6000 * np.sin(2 * np.pi * f0 * t)
             + rng.normal(0, 150, t.size)).astype(np.int16)
        _write_sphere(os.path.join(root, "disc1", "wsj0", set_, spk,
                                   utt + ".wv1"), x, sr)
        utts[(set_, spk)] = f"wsj0/{set_}/{spk}/{utt}.wv1"
    return utts


def test_prepare_wsj0_stage0_end_to_end(tmp_path):
    """Raw sphere disc tree + MERL-style lists -> decoded wav tree + full
    mixture trees, no sph2pipe/MATLAB (data_prepare.sh:13-37 +
    create_wav_2speakers.m:33-188 in one call)."""
    from convtasnet_tpu.tools.wsj0 import prepare_wsj0

    root = str(tmp_path / "discs")
    utts = _fake_wsj0_disc(root)
    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "mix_2_spk_tr.txt").write_text(
        f"{utts[('si_tr_s', '011')]} 1.5 {utts[('si_tr_s', '012')]} -1.5\n")
    (lists / "mix_2_spk_cv.txt").write_text(
        f"{utts[('si_dt_05', '013')]} 0.7 {utts[('si_dt_05', '014')]} -0.7\n")

    out = str(tmp_path / "data")
    summary = prepare_wsj0(root, str(lists), out, sample_rates=(8000,),
                           modes=("min", "max"), splits=("tr", "cv"),
                           verbose=False)
    assert summary == {"tr": 1, "cv": 1}
    # decoded wav tree preserves <set>/<spk>/<utt>
    assert os.path.exists(os.path.join(
        out, "wsj0-wav", "si_tr_s", "011", "011c0201.wav"))
    # MATLAB-layout mixture trees with scaling files
    for mode in ("min", "max"):
        for split, part in [("tr", "mix"), ("tr", "s1"), ("cv", "s2")]:
            d = os.path.join(out, "wav8k", mode, split, part)
            assert len(os.listdir(d)) == 1, d
        assert os.path.exists(os.path.join(out, "wav8k", mode, "tr",
                                           "scaling.npz"))
    # mixture is the sum of its sources (exact by construction)
    d = os.path.join(out, "wav8k", "min", "tr")
    name = os.listdir(os.path.join(d, "mix"))[0]
    mix, _ = read_wav(os.path.join(d, "mix", name))
    s1, _ = read_wav(os.path.join(d, "s1", name))
    s2, _ = read_wav(os.path.join(d, "s2", name))
    np.testing.assert_allclose(mix, s1 + s2, atol=2e-4)
    assert 0.85 < np.max(np.abs(mix)) <= 0.91  # 0.9-peak rescale


def test_prepare_wsj0_missing_source_fails_clearly(tmp_path):
    from convtasnet_tpu.tools.wsj0 import prepare_wsj0

    root = str(tmp_path / "discs")
    _fake_wsj0_disc(root)
    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "mix_2_spk_tr.txt").write_text(
        "wsj0/si_tr_s/999/nonexistent.wv1 1.0 "
        "wsj0/si_tr_s/011/011c0201.wv1 -1.0\n")
    with pytest.raises(FileNotFoundError, match="not found"):
        prepare_wsj0(root, str(lists), str(tmp_path / "o"),
                     sample_rates=(8000,), modes=("min",), splits=("tr",),
                     verbose=False)
