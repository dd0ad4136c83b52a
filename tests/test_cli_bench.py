"""cli.bench flag coverage: chained-throughput mode and the int8 guard.

The heavy TPU measurements themselves (int8 serving path, geometry
sweep) are real-chip-only and recorded in BASELINE.md; these tests pin
the CLI plumbing (arg parsing, config wiring, JSON contract) on CPU.
"""
import json

import pytest

from istvt_tpu.cli import bench as cli_bench


def test_chained_forward_emits_json(capsys):
    cli_bench.main(["-mn", "istvt", "-bs", "1", "-is", "72", "-sl", "3",
                    "--depth", "1", "--iters", "2", "--chained",
                    "--dtype", "float32"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "forward_chained"
    assert out["model"] == "istvt"
    assert out["input_size"] == 72
    assert out["quantize"] == "none"
    assert out["items_per_sec"] > 0


def test_quantize_requires_tpu_istvt_forward():
    # CPU platform in tests: the q8 kernels never engage off-TPU, so the
    # flag must refuse loudly instead of silently measuring float.
    with pytest.raises(SystemExit):
        cli_bench.main(["-mn", "istvt", "--quantize", "int8",
                        "--depth", "1", "-is", "72"])
    with pytest.raises(SystemExit):
        cli_bench.main(["-mn", "mesonet4", "--quantize", "int8"])
