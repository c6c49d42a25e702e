"""CLI: metrics over rendered sets.

`python -m wast3d_tpu.cli.metrics -m <model_path> [...]`
Equivalent of `/root/reference/metrics.py:95-103`."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    parser = argparse.ArgumentParser(description="wast3d_tpu metrics")
    parser.add_argument("--model_paths", "-m", nargs="+", type=str, required=True)
    parser.add_argument("--split", type=str, default="test")
    args = parser.parse_args()

    from wast3d_tpu.eval.metrics import evaluate

    results = evaluate(args.model_paths, split=args.split)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
