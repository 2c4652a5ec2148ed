"""Cascaded flag parsing, replicating the reference's CLI protocol.

The reference parses flags in three stages, each consuming its own flags
with ``argparse.parse_known_args`` and handing the remainder on
(reference train.py:36,48,55): CLI script -> dataloader -> model, then
warns about leftovers and dumps the merged namespace to
``arguments.json`` (reference train.py:75-78).

``ArgChain`` packages that protocol so every CLI in this framework does
it identically, and so plugins (models/loaders) declare their flags with
the same names as the reference (e.g. ``--edsr_conv_features``,
``--num_blocks``, ``--data_input_path``).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Sequence, Tuple


class ArgChain:
    """Three-stage partial argument parsing with a merged namespace."""

    def __init__(self, argv: Sequence[str] | None = None):
        import sys

        self._remaining: List[str] = list(sys.argv[1:] if argv is None else argv)
        self._merged: Dict[str, Any] = {}

    @property
    def remaining(self) -> List[str]:
        return list(self._remaining)

    def parse(self, parser: argparse.ArgumentParser) -> argparse.Namespace:
        """Consume this parser's flags from the remaining argv."""
        ns, rest = parser.parse_known_args(self._remaining)
        self._remaining = rest
        self._merged.update(vars(ns))
        return ns

    def warn_leftovers(self) -> None:
        if self._remaining:
            print("WARNING: found unhandled arguments: %s" % (self._remaining,))

    @property
    def merged(self) -> Dict[str, Any]:
        return dict(self._merged)


def parse_known(parser: argparse.ArgumentParser, args: Sequence[str]) -> Tuple[argparse.Namespace, List[str]]:
    """Plugin-side helper: `parse_args(args) -> (namespace, remaining)`.

    Mirrors the contract of the reference's ``BaseModel.parse_args`` /
    ``BaseLoader.parse_args`` (reference models/base.py:11-20).
    """
    ns, remaining = parser.parse_known_args(args=list(args))
    return ns, remaining


def dump_arguments_json(path: str, *namespaces: argparse.Namespace) -> None:
    """Persist the merged run config, like reference train.py:75-78."""
    merged: Dict[str, Any] = {}
    for ns in namespaces:
        if ns is not None:
            merged.update(vars(ns))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(json.dumps(merged, sort_keys=True, indent=2, default=str))


def parse_scale_list(scales: str) -> List[int]:
    """'2,3,4' -> [2, 3, 4] (reference train.py:44)."""
    return [int(x) for x in scales.split(",")]
