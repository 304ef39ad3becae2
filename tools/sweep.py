#!/usr/bin/env python
"""Hyperparameter sweep driver.

Counterpart of the reference's ``test_hyperparameter.sh`` (which sed-edited
config.ini and retrained per value), done properly: takes a base config, a
parameter grid, and runs one training session per combination into its own
checkpoint/metrics directory.

Usage:
    python tools/sweep.py --config config.ini --max_steps 200 \
        --set acoustic_network_params.signal_processing=mfcc,fbank \
        --set training.batch_normalization=True,False
"""

from __future__ import annotations

import argparse
import configparser
import itertools
import os
import subprocess
import sys


def parse_grid(specs):
    """["section.key=v1,v2", ...] -> list of (section, key, [values])."""
    grid = []
    for spec in specs:
        target, _, values = spec.partition("=")
        section, _, key = target.partition(".")
        if not values or not key:
            raise SystemExit(f"Bad --set spec: {spec!r} "
                             "(want section.key=v1,v2)")
        grid.append((section, key, values.split(",")))
    return grid


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="config.ini")
    parser.add_argument("--set", action="append", default=[],
                        help="section.key=value1,value2 (repeatable)")
    parser.add_argument("--out", default="sweep_runs",
                        help="Directory for per-run configs/checkpoints")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_epoch", type=int, default=1)
    parser.add_argument("--dry_run", action="store_true")
    args = parser.parse_args()

    grid = parse_grid(args.set)
    if not grid:
        raise SystemExit("Provide at least one --set section.key=v1,v2")

    combos = list(itertools.product(*(values for _, _, values in grid)))
    os.makedirs(args.out, exist_ok=True)
    results = []
    for combo in combos:
        name = "_".join(
            f"{key}-{value}" for (_, key, _), value in zip(grid, combo)
        ).replace("/", "-")
        run_dir = os.path.join(args.out, name)
        os.makedirs(run_dir, exist_ok=True)

        cp = configparser.ConfigParser()
        cp.read(args.config)
        for (section, key, _), value in zip(grid, combo):
            if not cp.has_section(section):
                cp.add_section(section)
            cp.set(section, key, value)
        cp.set("general", "checkpoint_dir", os.path.join(run_dir, "ckpt"))
        run_config = os.path.join(run_dir, "config.ini")
        with open(run_config, "w") as fh:
            cp.write(fh)

        cmd = [sys.executable, "stt.py", "--train_acoustic",
               "--config", run_config, "--max_epoch", str(args.max_epoch),
               "--tb_name", name]
        if args.max_steps:
            cmd += ["--max_steps", str(args.max_steps)]
        print(f"[sweep] {name}: {' '.join(cmd)}")
        if args.dry_run:
            continue
        proc = subprocess.run(cmd)
        results.append((name, proc.returncode))

    for name, rc in results:
        print(f"[sweep] {name}: exit {rc}")
    return 1 if any(rc for _, rc in results) else 0


if __name__ == "__main__":
    sys.exit(main())
