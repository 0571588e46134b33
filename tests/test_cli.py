"""CLI surface tests (arg parsing; yaml config translation)."""

import argparse

from aphrodite_tpu.engine.args import EngineArgs
from aphrodite_tpu.endpoints import cli


def test_engine_args_cli_types():
    parser = argparse.ArgumentParser()
    parser.add_argument("model")
    EngineArgs.add_cli_args(parser)
    args = parser.parse_args([
        "/m", "--block-size", "32", "--hbm-utilization", "0.8",
        "--enable-prefix-caching", "--max-num-seqs", "64",
        "--kv-cache-dtype", "fp8", "--num-scheduler-steps", "8",
    ])
    ea = EngineArgs.from_cli_args(args)
    ea.model = args.model
    assert ea.block_size == 32
    assert abs(ea.hbm_utilization - 0.8) < 1e-9
    assert ea.enable_prefix_caching is True
    assert ea.max_num_seqs == 64
    assert ea.kv_cache_dtype == "fp8"
    assert ea.num_scheduler_steps == 8


def test_cli_run_parser_has_subcommands():
    import pytest

    for argv in (["run"], []):
        with pytest.raises(SystemExit):
            cli.main(argv)  # missing model / missing subcommand


def test_yaml_config_translation(tmp_path, monkeypatch):
    import yaml

    cfg = {"model": "/some/model", "block_size": 32,
           "enable_prefix_caching": True, "max_num_seqs": 16}
    path = tmp_path / "config.yaml"
    path.write_text(yaml.safe_dump(cfg))

    captured = {}

    def fake_run(args):
        captured.update(vars(args))

    monkeypatch.setattr(cli, "_run", fake_run)
    cli.main(["yaml", str(path)])
    assert captured["model"] == "/some/model"
    assert captured["block_size"] == 32
    assert captured["enable_prefix_caching"] is True
    assert captured["max_num_seqs"] == 16
