"""Checkpoint discovery / auto-resume + async (non-blocking) saves.

The reference's recovery story is manual: rerun with --restore_path and
--global_step (SURVEY.md §5). Here `--restore_path latest` resolves to
the newest checkpoint in the train dir, and the restored global_step /
total_volume / optimizer / scheduler state ride inside the checkpoint,
so resume needs no extra flags.

AsyncCheckpointWriter makes `model.save` non-blocking: on this
environment device->host transfers run at ~200 KB/s through the TPU
tunnel (CLAUDE.md), so a synchronous save of even a 1 M-param model
stalls the train loop for tens of seconds. The writer snapshots state
to fresh device buffers (safe against the train step's buffer donation),
starts the D2H transfers asynchronously, and serializes + writes on a
background thread with an atomic tmp+rename.
"""

from __future__ import annotations

import glob
import os
import queue
import re
import threading
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


class AsyncCheckpointWriter:
    """Background checkpoint serialization + IO.

    submit(state, path): snapshot `state` (a pytree that
    flax.serialization can msgpack once leaves are numpy) and return
    immediately; the write happens on a worker thread. Device-array
    leaves are copied to FRESH device buffers first — the train step
    donates its params/opt_state buffers, so reading the originals
    after the next step would fail — and their host transfers are
    started asynchronously so the worker's np.asarray mostly just
    completes them.

    wait(): block until all submitted checkpoints are on disk (call at
    end of training, or before restoring a just-saved file). Errors in
    the worker are re-raised here and on the next submit.

    At most `max_pending` snapshots may be in flight; further submits
    block, bounding memory.
    """

    def __init__(self, max_pending: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._done = threading.Event()
        self._error: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._worker.start()

    def _run(self):
        import numpy as np
        from flax import serialization

        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            state, path = item
            try:
                def to_host(leaf):
                    if hasattr(leaf, "__array__") and not isinstance(leaf, (str, bytes)):
                        return np.asarray(leaf)  # completes the async D2H
                    return leaf
                import jax

                payload = serialization.msgpack_serialize(
                    jax.tree_util.tree_map(to_host, state))
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, path)  # atomic: no torn checkpoints
            except BaseException as e:  # surfaced via wait()/submit()
                self._error = e
            finally:
                self._q.task_done()

    def _check_error(self):
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, state, path: str) -> None:
        import jax
        import jax.numpy as jnp

        self._check_error()

        def snapshot(leaf):
            if isinstance(leaf, jax.Array):
                c = jnp.copy(leaf)  # fresh buffer: immune to donation
                try:
                    c.copy_to_host_async()
                except Exception:
                    pass
                return c
            return leaf

        state = jax.tree_util.tree_map(snapshot, state)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._q.put((state, path))

    def wait(self) -> None:
        self._q.join()
        self._check_error()

    def close(self) -> None:
        self.wait()
        self._q.put(None)
        self._worker.join()


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
