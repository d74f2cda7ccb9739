"""CLI: tabulate metrics over dumped frames of multiple methods.

Parity target: ``src/scripts/compute_metrics.py``.

Run: ``python -m freesplat_tpu.scripts.compute_metrics \
    ours=outputs/test baseline=outputs/baseline``
"""
from __future__ import annotations

import sys

from ..evaluation.metric_computer import (
    MethodCfg,
    MetricComputerCfg,
    run_metric_computer,
)


def main(argv: list[str] | None = None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    methods = []
    for arg in argv:
        name, _, path = arg.partition("=")
        if not path:
            raise SystemExit(f"expected name=path, got '{arg}'")
        methods.append(MethodCfg(name=name, key="", path=path))
    if not methods:
        raise SystemExit("usage: compute_metrics name=path [name=path ...]")
    run_metric_computer(MetricComputerCfg(methods=tuple(methods)))


if __name__ == "__main__":
    main()
