"""CLI surface tests: flag parsing plus one end-to-end subprocess smoke
run of scripts/train.py on the synthetic config (mirrors the role of the
reference's scripts/train.py usage paths)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from train import parse_layer_arg  # noqa: E402


class TestLayerArg:
    def test_encoder(self):
        assert parse_layer_arg("encoder:0") == ("encoder", 0)

    def test_decoder(self):
        assert parse_layer_arg("decoder:2") == ("decoder", 2)

    def test_bad_component(self):
        with pytest.raises(ValueError):
            parse_layer_arg("middle:0")

    def test_bad_format(self):
        with pytest.raises(ValueError):
            parse_layer_arg("encoder-0")


@pytest.mark.slow
class TestEndToEnd:
    def test_synthetic_pipeline(self, tmp_path):
        cfg = yaml.safe_load((REPO / "configs" / "synthetic_test.yaml").read_text())
        cfg["data"]["max_samples"] = 4
        cfg["training"]["epochs"] = 1
        cfg["training"]["batch_size"] = 1024
        cfg["training"]["checkpoint_every"] = 1
        cfg_path = tmp_path / "cfg.yaml"
        cfg_path.write_text(yaml.dump(cfg))

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.run(
            [
                sys.executable,
                str(REPO / "scripts" / "train.py"),
                "--config", str(cfg_path),
                "--device", "cpu",
                "--no-wandb",
                "--random-whisper",
            ],
            cwd=tmp_path,
            env=env,
            capture_output=True,
            text=True,
            timeout=560,  # remote-compile latency varies with load on this image
        )
        assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

        run_dir = tmp_path / "outputs" / "synthetic_run_encoder_layer0"
        assert (run_dir / "sae_final.npz").exists()
        assert (run_dir / "sae_final.pt").exists()
        assert (run_dir / "final.npz").exists()
        assert (run_dir / "metrics.json").exists()
        metrics = json.loads((run_dir / "metrics.json").read_text())
        assert len(metrics) == 6  # 4 clips * 1500 tokens / 1024 batch
        assert metrics[0]["l0"] == pytest.approx(32, abs=0.5)
        # extraction artifacts
        feats = tmp_path / "cache" / "features"
        assert (feats / "whisper-tiny_encoder_layer0_meta.json").exists()
