"""Checkpoint discovery / auto-resume.

The reference's recovery story is manual: rerun with --restore_path and
--global_step (SURVEY.md §5). Here `--restore_path latest` resolves to
the newest checkpoint in the train dir, and the restored global_step /
total_volume / optimizer / scheduler state ride inside the checkpoint,
so resume needs no extra flags.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional


def find_latest(train_path: str) -> Optional[str]:
    """Newest *.ckpt by (step number, mtime)."""
    candidates = glob.glob(os.path.join(train_path, "*.ckpt"))
    if not candidates:
        return None

    def key(path):
        m = re.search(r"(\d+)", os.path.basename(path))
        return (int(m.group(1)) if m else -1, os.path.getmtime(path))

    return max(candidates, key=key)


def resolve_restore_path(restore_path: Optional[str], train_path: Optional[str]) -> Optional[str]:
    """'latest' -> newest checkpoint in train_path; otherwise passthrough."""
    if restore_path == "latest":
        if not train_path:
            raise ValueError("--restore_path latest requires --train_path")
        latest = find_latest(train_path)
        if latest is None:
            print("no checkpoint found in %s; starting fresh" % (train_path,))
            return None
        print("auto-resume from %s" % (latest,))
        return latest
    return restore_path
