"""Undefined-name lint (tools/name_check.py) — the guard that would have
caught round 4's shipped NameError (cli/train_schedule.py:171 calling
pipelined_upscale with no import)."""

import textwrap

from tools.name_check import check_file, check_tree


def test_catches_unimported_call(tmp_path):
    f = tmp_path / "bad.py"
    f.write_text(textwrap.dedent("""\
        import os

        def run(model, items, scale):
            for x in pipelined_upscale(model, items, scale):
                print(os.getpid(), x)
    """))
    probs = check_file(f)
    assert probs == [(4, "pipelined_upscale")]


def test_no_false_positives_on_common_binders(tmp_path):
    f = tmp_path / "ok.py"
    f.write_text(textwrap.dedent("""\
        from os import path as p
        import sys

        CONST = 1

        class C:
            attr = CONST

        def g(a, *args, k=2, **kw):
            global CONST
            with open(p.join("x")) as fh:
                data = [line for line in fh if line]
            try:
                pass
            except ValueError as e:
                print(e, sys.argv, a, args, k, kw, data)
            if (n := len(data)) > 0:
                return n
            for i, v in enumerate(data):
                yield i, v
    """))
    assert check_file(f) == []


def test_star_import_skipped(tmp_path):
    f = tmp_path / "star.py"
    f.write_text("from os.path import *\nx = join('a', 'b')\n")
    assert check_file(f) == []


def test_repo_tree_is_clean():
    assert check_tree(["larvanet_tpu", "tools"]) == []
