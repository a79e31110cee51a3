"""Config round-trips: dict/JSON serialization, checkpoint-metadata parity,
exp-dir naming."""

from convtasnet_tpu.config import (
    ConvTasNetConfig, DataConfig, MeshConfig, SolverConfig, TrainConfig,
    exp_name)


def test_full_roundtrip_json():
    cfg = TrainConfig(
        model=ConvTasNetConfig(n_filters=128, causal=True, norm_type="cLN",
                               compute_dtype="bfloat16", use_pallas=True),
        data=DataConfig(segment=2.0, batch_size=8, max_hours=1.5),
        solver=SolverConfig(epochs=7, lr=5e-4, optimizer="sgd", momentum=0.9),
        mesh=MeshConfig(data_axis=4, model_axis=2))
    back = TrainConfig.from_json(cfg.to_json())
    assert back == cfg


def test_from_dict_ignores_unknown_keys():
    cfg = ConvTasNetConfig.from_dict(
        {"n_filters": 64, "future_knob": 123})
    assert cfg.n_filters == 64


def test_exp_name_encodes_hyperparams():
    cfg = TrainConfig(model=ConvTasNetConfig(n_filters=64, num_repeats=3))
    name = exp_name(cfg)
    assert "_N64_" in name and "_R3_" in name and "gLN" in name


def test_receptive_field():
    cfg = ConvTasNetConfig()  # P=3, X=8, R=4
    # per repeat: sum 2*2^x for x<8 = 2*(2^8-1) = 510; 4 repeats + 1
    assert cfg.receptive_field() == 1 + 4 * 510
    assert cfg.stride == 10
