"""Undefined-name lint (vendored — no pyflakes on this box).

Flags any `ast.Name` *load* whose identifier is never bound anywhere in
the same module (imports, assignments, defs, args, comprehension/loop
targets, walrus, except/with aliases, global decls). This is a coarse
module-level check — it will not catch a name bound only in one function
and used in another — but it deterministically catches the class of bug
that shipped in round 4 (cli/train_schedule.py calling
`pipelined_upscale` with no import anywhere in the module), with zero
false positives over this tree.

Usage:
    python -m tools.name_check [paths...]   # default: larvanet_tpu tools
Exit code 1 if any undefined name is found.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

_IMPLICIT = {
    "__file__", "__name__", "__doc__", "__builtins__", "__spec__",
    "__package__", "__loader__", "__debug__", "__class__", "__path__",
}


def _bound_names(tree: ast.AST) -> set[str] | None:
    """All identifiers bound anywhere in the module. None => star import
    present (module unanalyzable at this granularity)."""
    bound: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Store, ast.Del)):
            bound.add(node.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.arg):
            bound.add(node.arg)
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                if alias.name == "*":
                    return None
                bound.add((alias.asname or alias.name).split(".")[0])
        elif isinstance(node, (ast.Global, ast.Nonlocal)):
            bound.update(node.names)
        elif isinstance(node, ast.ExceptHandler) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchAs) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchStar) and node.name:
            bound.add(node.name)
        elif isinstance(node, ast.MatchMapping) and node.rest:
            bound.add(node.rest)
    return bound


def check_file(path: Path) -> list[tuple[int, str]]:
    """Return [(lineno, name)] for names loaded but never bound."""
    tree = ast.parse(path.read_text(), filename=str(path))
    bound = _bound_names(tree)
    if bound is None:  # star import — skip
        return []
    known = bound | set(dir(builtins)) | _IMPLICIT
    problems = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            if node.id not in known:
                problems.append((node.lineno, node.id))
    return sorted(set(problems))


def check_tree(paths) -> list[str]:
    msgs = []
    for root in paths:
        root = Path(root)
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            try:
                for lineno, name in check_file(f):
                    msgs.append("%s:%d: undefined name '%s'" % (f, lineno, name))
            except SyntaxError as e:
                msgs.append("%s: syntax error: %s" % (f, e))
    return msgs


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    paths = argv or ["larvanet_tpu", "tools"]
    msgs = check_tree(paths)
    for m in msgs:
        print(m)
    print("name_check: %d problem(s) in %s" % (len(msgs), paths))
    return 1 if msgs else 0


if __name__ == "__main__":
    raise SystemExit(main())
