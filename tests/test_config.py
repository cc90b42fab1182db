"""Config-system tests.

Ports the behavioral contracts of the reference suite
(/root/reference/tests/test_config.py): defaults, validation ranges,
model-dim auto-derivation, YAML round-trip, run-dir creation, LayerConfig.
"""

from pathlib import Path

import pytest
import yaml
from pydantic import ValidationError

from whisper_sae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    LayerConfig,
    MeshConfig,
    SAEConfig,
    TrainingConfig,
    WandbConfig,
    WhisperConfig,
)


class TestWhisperConfig:
    def test_defaults(self):
        cfg = WhisperConfig()
        assert cfg.model_name == "openai/whisper-tiny"
        assert cfg.hidden_dim == 384
        assert cfg.num_encoder_layers == 4
        assert cfg.num_decoder_layers == 4

    @pytest.mark.parametrize(
        "name,dims",
        [
            ("openai/whisper-tiny", (384, 4, 4)),
            ("openai/whisper-base", (512, 6, 6)),
            ("openai/whisper-small", (768, 12, 12)),
            ("openai/whisper-medium", (1024, 24, 24)),
            ("openai/whisper-large", (1280, 32, 32)),
            ("openai/whisper-large-v2", (1280, 32, 32)),
            ("openai/whisper-large-v3", (1280, 32, 32)),
        ],
    )
    def test_dims_derived_from_model_name(self, name, dims):
        cfg = WhisperConfig(model_name=name)
        assert (cfg.hidden_dim, cfg.num_encoder_layers, cfg.num_decoder_layers) == dims

    def test_unknown_model_keeps_explicit_dims(self):
        cfg = WhisperConfig(model_name="custom/whisper", hidden_dim=512)
        assert cfg.hidden_dim == 512


class TestSAEConfig:
    def test_defaults(self):
        cfg = SAEConfig()
        assert cfg.expansion_factor == 8
        assert cfg.activation == "topk"
        assert cfg.k == 32
        assert cfg.normalize_decoder is True
        assert cfg.dead_feature_threshold == 10_000
        assert cfg.dead_feature_resample is True

    @pytest.mark.parametrize("bad", [2, 3, 33, 64, 0])
    def test_expansion_factor_range(self, bad):
        with pytest.raises(ValidationError):
            SAEConfig(expansion_factor=bad)

    @pytest.mark.parametrize("good", [4, 8, 16, 32])
    def test_expansion_factor_valid(self, good):
        assert SAEConfig(expansion_factor=good).expansion_factor == good

    def test_k_minimum(self):
        with pytest.raises(ValidationError):
            SAEConfig(k=0)
        assert SAEConfig(k=1).k == 1

    def test_activation_literal(self):
        for act in ("topk", "relu", "gelu"):
            assert SAEConfig(activation=act).activation == act
        with pytest.raises(ValidationError):
            SAEConfig(activation="sigmoid")

    def test_get_hidden_dim(self):
        assert SAEConfig(expansion_factor=8).get_hidden_dim(384) == 3072
        assert SAEConfig(expansion_factor=4).get_hidden_dim(512) == 2048


class TestTrainingConfig:
    def test_defaults(self):
        cfg = TrainingConfig()
        assert cfg.batch_size == 128
        assert cfg.learning_rate == 1e-4
        assert cfg.weight_decay == 0.0
        assert cfg.epochs == 50
        assert cfg.warmup_steps == 1000
        assert cfg.gradient_clip == 1.0
        assert cfg.use_amp is True
        assert cfg.checkpoint_every == 10
        assert cfg.seed == 42
        assert cfg.num_workers == 4

    def test_matmul_precision(self):
        assert TrainingConfig().matmul_precision == "default"
        for p in ("default", "high", "highest"):
            assert TrainingConfig(matmul_precision=p).matmul_precision == p
        with pytest.raises(ValidationError):
            TrainingConfig(matmul_precision="bf16")

    def test_validation(self):
        with pytest.raises(ValidationError):
            TrainingConfig(batch_size=0)
        with pytest.raises(ValidationError):
            TrainingConfig(learning_rate=0.0)
        with pytest.raises(ValidationError):
            TrainingConfig(weight_decay=-1.0)
        with pytest.raises(ValidationError):
            TrainingConfig(epochs=0)
        with pytest.raises(ValidationError):
            TrainingConfig(gradient_clip=0.0)


class TestDataConfig:
    def test_defaults(self):
        cfg = DataConfig()
        assert cfg.dataset_name == "librispeech_asr"
        assert cfg.dataset_subset == "clean"
        assert cfg.dataset_split == "train.100"
        assert cfg.max_samples == 100_000
        assert cfg.cache_dir == Path("cache")
        assert cfg.streaming is True


class TestWandbConfig:
    def test_defaults(self):
        cfg = WandbConfig()
        assert cfg.enabled is True
        assert cfg.project == "whisper-sae"
        assert cfg.entity is None
        assert cfg.tags == []
        assert cfg.log_every == 100


class TestMeshConfig:
    def test_defaults(self):
        cfg = MeshConfig()
        assert cfg.data == -1
        assert cfg.model == 1
        assert cfg.dtype == "bfloat16"

    def test_model_axis_min(self):
        with pytest.raises(ValidationError):
            MeshConfig(model=0)


class TestExperimentConfig:
    def test_defaults(self):
        cfg = ExperimentConfig()
        assert cfg.encoder_layers == [0, 1, 2, 3]
        assert cfg.decoder_layers == [0, 1, 2, 3]
        assert cfg.output_dir == Path("outputs")
        assert cfg.experiment_name == "default"

    def test_yaml_round_trip(self, tmp_path):
        cfg = ExperimentConfig(
            experiment_name="rt",
            encoder_layers=[0, 2],
            decoder_layers=[],
        )
        cfg.sae.k = 16
        path = tmp_path / "cfg.yaml"
        cfg.to_yaml(path)
        loaded = ExperimentConfig.from_yaml(path)
        assert loaded.experiment_name == "rt"
        assert loaded.encoder_layers == [0, 2]
        assert loaded.decoder_layers == []
        assert loaded.sae.k == 16
        assert loaded.model_dump(mode="json") == cfg.model_dump(mode="json")

    def test_from_yaml_partial(self, tmp_path):
        # Reference YAML configs carry no `mesh` section — they must parse.
        path = tmp_path / "cfg.yaml"
        path.write_text(
            yaml.dump(
                {
                    "sae": {"expansion_factor": 4, "k": 8},
                    "training": {"epochs": 3},
                    "experiment_name": "partial",
                }
            )
        )
        cfg = ExperimentConfig.from_yaml(path)
        assert cfg.sae.expansion_factor == 4
        assert cfg.sae.k == 8
        assert cfg.training.epochs == 3
        assert cfg.whisper.model_name == "openai/whisper-tiny"
        assert cfg.mesh.model == 1

    def test_loads_reference_style_yaml(self, tmp_path):
        # Exact shape of the reference's shipped tiny_test.yaml.
        path = tmp_path / "tiny_test.yaml"
        path.write_text(
            yaml.dump(
                {
                    "whisper": {"model_name": "openai/whisper-tiny"},
                    "sae": {
                        "expansion_factor": 8,
                        "activation": "topk",
                        "k": 32,
                        "normalize_decoder": True,
                        "dead_feature_threshold": 1000,
                        "dead_feature_resample": True,
                    },
                    "training": {
                        "batch_size": 64,
                        "learning_rate": 0.0001,
                        "weight_decay": 0.0,
                        "epochs": 3,
                        "warmup_steps": 100,
                        "gradient_clip": 1.0,
                        "use_amp": True,
                        "checkpoint_every": 2,
                        "seed": 42,
                        "num_workers": 2,
                    },
                    "data": {
                        "dataset_name": "librispeech_asr",
                        "dataset_subset": "clean",
                        "dataset_split": "validation",
                        "max_samples": 500,
                        "cache_dir": "cache",
                        "streaming": True,
                    },
                    "wandb": {"enabled": False, "project": "whisper-sae", "tags": ["test"]},
                    "encoder_layers": [0],
                    "decoder_layers": [],
                    "output_dir": "outputs",
                    "experiment_name": "test_run",
                }
            )
        )
        cfg = ExperimentConfig.from_yaml(path)
        assert cfg.training.batch_size == 64
        assert cfg.data.max_samples == 500
        assert cfg.encoder_layers == [0]

    def test_get_run_dir_creates(self, tmp_path):
        cfg = ExperimentConfig(output_dir=tmp_path / "out", experiment_name="exp1")
        run_dir = cfg.get_run_dir()
        assert run_dir == tmp_path / "out" / "exp1"
        assert run_dir.is_dir()


class TestLayerConfig:
    def test_name(self):
        lc = LayerConfig(component="encoder", layer_idx=2, input_dim=384)
        assert lc.name == "encoder_layer2"
        lc = LayerConfig(component="decoder", layer_idx=0, input_dim=384)
        assert lc.name == "decoder_layer0"

    def test_hidden_dim(self):
        lc = LayerConfig(
            component="encoder",
            layer_idx=0,
            input_dim=384,
            sae_config=SAEConfig(expansion_factor=8),
        )
        assert lc.hidden_dim == 3072

    def test_component_validation(self):
        with pytest.raises(ValidationError):
            LayerConfig(component="middle", layer_idx=0, input_dim=384)
        with pytest.raises(ValidationError):
            LayerConfig(component="encoder", layer_idx=-1, input_dim=384)
