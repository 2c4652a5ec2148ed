"""Dispatch-ahead evaluation: overlap each frame's device->host pull
(and the next frame's host PNG decode) with device compute.

The offline eval loops (reference validate.py:83-123, get_sr.py:62-97,
test.py:118-170) serialize [load -> forward -> pull -> score] per image,
so the device idles during every transfer and decode. JAX dispatch is
asynchronous: `SRModel.upscale_device` returns as soon as the forward is
enqueued, so dispatching frame i+1 BEFORE pulling frame i overlaps
transfer with compute — the same pipeline cli/serve.py runs under load
(--pipeline_depth), reused for the batch CLIs. `depth` bounds
dispatched-but-unpulled outputs (HBM backpressure).

Exactness: nothing about the forward changes — outputs are pulled in
order and are byte-identical to the serial loop's.
"""
import collections
import time

import numpy as np


def pipelined_upscale(model, items, scale, *, uint8=True, depth=2, chw=True,
                      dispatch=None):
    """Run `model`'s routed forward over `items` with dispatch-ahead.

    items: iterable of (payload, input_image_chw). The payload rides
    along untouched (truth image, filename, ...). Yields
    (payload, output, seconds) in input order — output is CHW when
    `chw` (the get_sr/PNG-writer contract) else HWC (the metrics
    contract) — where `seconds` is the wall-clock between consecutive
    completions; under overlap the honest per-frame cost (their sum is
    the loop's wall time, matching the serial loop's duration
    semantics).

    depth <= 1 degenerates to the serial loop (dispatch, pull, yield).

    dispatch: optional `f(input_list) -> device NHWC batch` overriding
    the default `model.upscale_device` — lets variant forwards (e.g.
    TreeNet's per-branch graphs, validate_tree.py) reuse the pipeline.
    """
    depth = max(1, int(depth))
    if dispatch is None:
        dispatch = lambda imgs: model.upscale_device(imgs, scale, uint8=uint8)
    pending = collections.deque()
    t_last = time.perf_counter()

    def pull():
        nonlocal t_last
        payload, dev = pending.popleft()
        out = np.asarray(dev)  # blocks on compute + D2H of THIS frame
        if out.ndim == 4:
            out = out[0]
        if chw:
            out = out.transpose(2, 0, 1)
        now = time.perf_counter()
        dt, t_last = now - t_last, now
        return payload, out, dt

    for payload, img in items:
        pending.append((payload, dispatch([img])))
        if len(pending) >= depth:
            yield pull()
    while pending:
        yield pull()
