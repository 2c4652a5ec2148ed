"""Self-contained serving artifacts via jax.export (StableHLO).

The reference deploys by shipping the model zoo's Python code plus a
`.pth` (reference models/base.py:61-66); this is the TPU-native
production alternative: ONE file holding the LOWERED serving graph —
whatever the fast-path routing selected (width-packed trunk, collapsed
tail, int8 W8A8; ops/fastpath.py) — with the trained weights baked in
as StableHLO constants. A server loads it with `load_artifact` and runs
it without the model zoo, flag parsing, checkpoint restore, or
graph-build code, and the artifact pins the exact serving numerics of
export time (an int8 artifact carries its calibration inside the
graph). Because the payload is the portable jax.export format, the same
file replays on any machine with compatible jax/XLA for the recorded
platforms.

File format (little-endian):
    magic  b"LVTAOT1\\n"
    u32    header length
    bytes  UTF-8 JSON header {model, scale, input_shape, dtype,
           platforms, path_desc, framework}
    bytes  jax.export serialized payload

CLI: `python -m larvanet_tpu.cli.export --stablehlo out.lvt ...`
(cli/export.py); round-trip equality is pinned by tests/test_aot.py.
"""

from __future__ import annotations

import json
import struct
from typing import Optional, Tuple

import numpy as np

_MAGIC = b"LVTAOT1\n"


def export_serving(model, input_shape, dtype="float32",
                   packed_trunk: bool = True, collapsed_tail: bool = True,
                   int8_trunk: bool = False, calib=None,
                   platforms: Optional[Tuple[str, ...]] = None):
    """Lower the model's serving forward for one input shape.

    input_shape: (N, H, W, 3) NHWC — static (jax.export requires
    concrete shapes; export one artifact per serving tile geometry, or
    several shapes as several artifacts). Weights are closed over, so
    the export captures model.params as constants.

    Returns (jax.export.Exported, header dict).
    """
    import jax
    import jax.numpy as jnp

    from larvanet_tpu.ops.fastpath import build_fast_forward

    if len(input_shape) != 4 or input_shape[-1] != 3:
        raise ValueError("input_shape must be NHWC with 3 channels, got %r"
                         % (input_shape,))
    comp_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    fwd, desc = build_fast_forward(
        model, comp_dtype, packed_trunk=packed_trunk,
        collapsed_tail=collapsed_tail, int8_trunk=int8_trunk, calib=calib)
    if fwd is None:
        module = model.module
        fwd = lambda params, x: module.apply({"params": params}, x)  # noqa: E731
        desc = "plain module graph"
    params = model.params

    def serve(x):
        return fwd(params, x).astype(jnp.float32)

    spec = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exported = jax.export.export(jax.jit(serve), **kwargs)(spec)
    header = {
        "model": getattr(model, "registry_name", "") or "",
        "scale": int(model.scale),
        "input_shape": list(input_shape),
        "dtype": dtype,
        "platforms": list(exported.platforms),
        "path_desc": desc,
        "framework": "larvanet_tpu",
    }
    return exported, header


def save_artifact(path: str, exported, header: dict) -> None:
    payload = exported.serialize()
    head = json.dumps(header, sort_keys=True).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(head)))
        f.write(head)
        f.write(payload)


class ArtifactModel:
    """Duck-typed stand-in for an SRModel's forward surface, backed by a
    serving artifact: `fwd_runtime(batch NHWC)` (chunks/zero-pads the
    batch dim to the exported N) and `upscale(input_list, scale)` (the
    reference's CHW float32 host contract). Lets cli/validate.py run the
    challenge protocol against THE DEPLOYED FILE — the artifact is what
    production serves, so it is what should be validated. Spatial dims
    must match the exported geometry (direct) or come from the tiler
    (tile size = exported H=W); sub-geometry inputs raise (spatial
    zero-padding would not be exact for these models)."""

    def __init__(self, path: str):
        import jax

        serve, header = load_artifact(path)
        self._serve = jax.jit(serve)
        self.header = header
        self.registry_name = header.get("model", "artifact")
        self.scale = int(header["scale"])
        n, h, w, _ = header["input_shape"]
        self.batch, self.height, self.width = int(n), int(h), int(w)

    def fwd_runtime(self, batch) -> np.ndarray:
        batch = np.asarray(batch, np.float32)
        if batch.shape[1:3] != (self.height, self.width):
            raise ValueError(
                "artifact was exported for %dx%d inputs, got %dx%d — larger "
                "frames should run --tile_forward at the exported size; "
                "frames smaller than the exported geometry need a smaller "
                "artifact (spatial zero-padding would not be exact for "
                "these models)"
                % (self.height, self.width, batch.shape[1], batch.shape[2]))
        n = self.batch
        outs = []
        for i in range(0, len(batch), n):
            chunk = batch[i:i + n]
            if len(chunk) < n:
                pad = np.zeros((n - len(chunk),) + chunk.shape[1:], np.float32)
                outs.append(np.asarray(self._serve(
                    np.concatenate([chunk, pad])))[: len(chunk)])
            else:
                outs.append(np.asarray(self._serve(chunk)))
        return np.concatenate(outs)

    def upscale(self, input_list, scale=None):
        if scale is not None and int(scale) != self.scale:
            raise ValueError("artifact is x%d, requested x%s"
                             % (self.scale, scale))
        batch = np.stack([np.asarray(im, np.float32).transpose(1, 2, 0)
                          for im in input_list])
        out = self.fwd_runtime(batch)
        return [o.transpose(2, 0, 1) for o in out]


def load_artifact(path: str):
    """Returns (callable, header). The callable takes one NHWC float32
    array of exactly the exported shape and returns the SR output; it is
    jit-compatible (wrap in jax.jit for repeated serving)."""
    import jax

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError("%s is not a larvanet_tpu serving artifact "
                             "(bad magic %r)" % (path, magic))
        (hlen,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hlen).decode("utf-8"))
        exported = jax.export.deserialize(bytearray(f.read()))

    want = tuple(header["input_shape"])

    def serve(x):
        x = np.asarray(x) if not hasattr(x, "shape") else x
        if tuple(x.shape) != want:
            raise ValueError(
                "artifact was exported for input shape %r, got %r — export "
                "one artifact per serving geometry (or tile to the exported "
                "shape)" % (want, tuple(x.shape)))
        return exported.call(x)

    return serve, header
