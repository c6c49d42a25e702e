"""CLI surface smoke tests: every `wast3d_tpu.cli.*` entry point must
import and answer `--help` (argparse wiring, flag bitrot)."""

import pkgutil
import subprocess
import sys

import pytest

import wast3d_tpu.cli as cli_pkg

MODULES = [m.name for m in pkgutil.iter_modules(cli_pkg.__path__)]


@pytest.mark.parametrize("mod", MODULES)
def test_cli_help(mod):
    proc = subprocess.run(
        [sys.executable, "-m", f"wast3d_tpu.cli.{mod}", "--help"],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": ":".join(sys.path)},
    )
    assert proc.returncode == 0, (mod, proc.stderr[-800:])
    assert "usage" in proc.stdout.lower(), mod


def test_module_list_nonempty():
    assert len(MODULES) >= 10, MODULES
