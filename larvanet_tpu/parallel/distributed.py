"""Multi-host initialization.

Single-host multi-chip needs nothing: `jax.devices()` sees the whole
slice and GSPMD collectives ride ICI. Across hosts (multi-slice or
pod-scale), call `init_distributed()` once per process before any mesh
construction; cross-host collectives then ride DCN transparently — the
training step, shardings, and CLIs are unchanged (SURVEY.md §2.5's
"collective comms backend": there is no custom transport layer, by
design).

Typical launch (GCE TPU pods set the env vars automatically):

    COORDINATOR=host0:9999 NUM_PROCESSES=4 PROCESS_ID=$i \
        python -m larvanet_tpu.cli.train --distributed ...
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or environment.

    Returns True if distributed mode was initialized; False when running
    single-process (no coordinator configured) — callers need no branch,
    the mesh code is identical either way.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR")
    if coordinator_address is None:
        # On cloud TPU pods jax.distributed.initialize() can auto-detect;
        # try it only when the env names MULTIPLE workers, and tolerate
        # late calls / single-worker tunnels (must not break local runs).
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len(hosts.split(",")) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
                return True
            except RuntimeError as exc:
                print("init_distributed: auto-init unavailable (%s); continuing single-process" % (exc,))
        return False

    # NOTE: `x or env[...]` would be wrong here — process_id=0 (the
    # primary!) is falsy and would fall through to the environment
    # (bug caught by tests/test_distributed.py).
    kwargs = {"coordinator_address": coordinator_address}
    if num_processes is None and os.environ.get("NUM_PROCESSES"):
        num_processes = os.environ["NUM_PROCESSES"]
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is None and os.environ.get("PROCESS_ID"):
        process_id = os.environ["PROCESS_ID"]
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
