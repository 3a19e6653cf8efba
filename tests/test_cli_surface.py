"""Argparse-level CLI smoke: train genie -> generate -> play -> eval.

The subcommand *functions* are covered elsewhere (trainer integration,
serve/eval unit tests); this pins the `cli.main(argv)` wiring itself --
flag names, defaults, checkpoint plumbing between subcommands -- the way
a user actually drives the framework (reference entry-point equivalents:
root `tokenizer.py`/`genie.py` LightningCLI, `genie.py:13-16`).
"""
import json
import os

import numpy as np
import pytest
import yaml

from open_genie_tpu import cli

TOK_ENC = [
    ["spacetime_downsample", {
        "in_channels": 3, "kernel_size": 3, "out_channels": 8,
        "time_factor": 1, "space_factor": 4,
    }],
    ["causal-conv3d", {"in_channels": 8, "out_channels": 4, "kernel_size": 1}],
]
TOK_DEC = [
    ["causal-conv3d", {"in_channels": 4, "out_channels": 8, "kernel_size": 3}],
    ["depth2spacetime_upsample", {
        "in_channels": 8, "out_channels": 3, "kernel_size": 3,
        "time_factor": 1, "space_factor": 4,
    }],
]


@pytest.fixture(scope="module")
def genie_yaml(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_surface")
    cfg = {
        "model": {
            "tokenizer": {
                "enc_desc": TOK_ENC, "dec_desc": TOK_DEC, "d_codebook": 4,
            },
            "latent_action": {
                "enc_desc": [["space-time_attn", {
                    "n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8,
                }]],
                "dec_desc": [["space-time_attn", {
                    "n_rep": 1, "n_embd": 8, "n_head": 1, "d_head": 8,
                    "has_ext": True, "time_attn_kw": {"key_dim": 2},
                }]],
                "d_codebook": 2, "n_embd": 8, "inp_shape": [16, 16],
            },
            "dynamics": {
                "desc": [["space-time_attn", {
                    "n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8,
                }]],
                "embed_dim": 16,
            },
        },
        "data": {
            "source": "synthetic", "num_frames": 4, "batch_size": 2,
            "height": 16, "width": 16, "num_videos": 4, "num_workers": 1,
        },
        "trainer": {
            "max_steps": 1, "precision": "32", "log_every_n_steps": 1,
            "ckpt_dir": str(tmp / "ckpt"), "ckpt_every_n_steps": 1,
            "log_dir": str(tmp / "logs"), "n_data": 1,
        },
    }
    path = tmp / "genie.yaml"
    path.write_text(yaml.safe_dump(cfg))
    # Train once here so every test in the module (incl. the staged
    # pipeline) can run standalone -- no inter-test ordering dependency.
    cli.main(["train", "genie", "--config", str(path)])
    return str(path), str(tmp)


def test_cli_train_generate_play_eval(genie_yaml, capsys):
    config, tmp = genie_yaml
    ckpt = os.path.join(tmp, "ckpt")
    assert os.path.isdir(ckpt) and os.listdir(ckpt), "no checkpoint written"

    out_mp4 = os.path.join(tmp, "rollout.mp4")
    cli.main([
        "generate", "--config", config, "--ckpt", ckpt,
        "--frames", "2", "--steps-per-frame", "2", "--size", "16",
        "--out", out_mp4,
    ])
    assert os.path.getsize(out_mp4) > 0

    sess_mp4 = os.path.join(tmp, "session.mp4")
    cli.main([
        "play", "--config", config, "--ckpt", ckpt,
        "--actions", "0,1,0", "--max-frames", "2", "--steps-per-frame", "2",
        "--size", "16", "--no-stream", "--out", sess_mp4,
    ])
    assert os.path.getsize(sess_mp4) > 0

    capsys.readouterr()  # drop train/generate/play chatter
    cli.main([
        "eval", "genie", "--config", config, "--ckpt", ckpt,
        "--max-batches", "1",
    ])
    report_line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    report = json.loads(report_line)
    assert np.isfinite(report["loss"])


def test_cli_staged_pipeline(genie_yaml, capsys):
    """tokenize-data -> train dynamics -> eval dynamics, argparse-level."""
    config, tmp = genie_yaml
    ckpt = os.path.join(tmp, "ckpt")
    tokens = os.path.join(tmp, "tokens")

    cli.main([
        "tokenize-data", "--config", config, "--ckpt", ckpt,
        "--out", tokens, "--limit", "2",
    ])
    assert os.listdir(tokens), "no token shards written"

    dyn_cfg = {
        "model": {
            "dynamics": {
                "desc": [["space-time_attn", {
                    "n_rep": 1, "n_embd": 16, "n_head": 2, "d_head": 8,
                }]],
                "embed_dim": 16,
            },
            "tok_vocab": 16,  # 2^d_codebook of the genie tokenizer
            "act_vocab": 4,   # 2^d_codebook of the latent-action model
        },
        "data": {"source": "tokens", "root": tokens, "batch_size": 1,
                 "num_workers": 1},
        "trainer": {
            "max_steps": 1, "precision": "32", "log_every_n_steps": 1,
            "ckpt_dir": os.path.join(tmp, "dyn_ckpt"),
            "ckpt_every_n_steps": 1,
            "log_dir": os.path.join(tmp, "dyn_logs"), "n_data": 1,
        },
    }
    dyn_yaml = os.path.join(tmp, "dynamics.yaml")
    with open(dyn_yaml, "w") as f:
        yaml.safe_dump(dyn_cfg, f)
    cli.main(["train", "dynamics", "--config", dyn_yaml])
    assert os.listdir(dyn_cfg["trainer"]["ckpt_dir"])

    capsys.readouterr()
    cli.main([
        "eval", "dynamics", "--config", dyn_yaml,
        "--ckpt", dyn_cfg["trainer"]["ckpt_dir"], "--max-batches", "1",
        "--split", "train",
    ])
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    assert np.isfinite(json.loads(line)["loss"])
