"""StableHLO serving artifacts (utils/aot.py + cli/export.py --stablehlo):
one file = lowered fast-path graph + baked weights, loadable and
runnable without the model zoo. Pins bit-equality with the live serving
forward (exact and int8 paths), the header contract, and the error
paths (wrong shape, bad magic)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from larvanet_tpu.core.registry import get_model
from larvanet_tpu.utils import aot


def _edsr(training=False):
    model = get_model("edsr")
    model.parse_args(["--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
    model.prepare(is_training=training, scales=[4])
    return model


def _batch(rng, shape=(1, 16, 16, 3)):
    return np.asarray(rng.uniform(0, 255, size=shape), np.float32)


def test_exact_artifact_round_trip(tmp_path):
    from larvanet_tpu.ops.fastpath import build_fast_forward

    model = _edsr()
    rng = np.random.default_rng(0)
    x = _batch(rng)

    exported, header = aot.export_serving(model, x.shape)
    path = str(tmp_path / "edsr.lvt")
    aot.save_artifact(path, exported, header)

    serve, header2 = aot.load_artifact(path)
    assert header2 == header
    assert header2["model"] == "edsr"
    assert header2["scale"] == 4
    assert "packed" in header2["path_desc"]

    # bitwise-equal to the JITTED live forward (same lowering); the
    # eager forward differs by float reassociation only
    live_fwd, _ = build_fast_forward(model, jnp.float32)
    live = np.asarray(jax.jit(
        lambda p, v: live_fwd(p, v).astype(jnp.float32))(model.params, x))
    got = np.asarray(serve(x))
    np.testing.assert_array_equal(got, live)


def test_artifact_runs_without_model_state(tmp_path):
    """The loaded artifact must not depend on the live model object."""
    model = _edsr()
    x = _batch(np.random.default_rng(1))
    exported, header = aot.export_serving(model, x.shape)
    path = str(tmp_path / "a.lvt")
    aot.save_artifact(path, exported, header)
    ref = np.asarray(exported.call(x))
    del model, exported

    serve, _ = aot.load_artifact(path)
    np.testing.assert_array_equal(np.asarray(serve(x)), ref)
    # and it composes under jit
    np.testing.assert_allclose(np.asarray(jax.jit(serve)(x)), ref, atol=1e-5)


def test_int8_artifact_matches_live_int8(tmp_path):
    from larvanet_tpu.ops.fastpath import build_fast_forward

    model = _edsr()
    rng = np.random.default_rng(2)
    x = _batch(rng)
    calib = _batch(rng, (2, 16, 16, 3))

    exported, header = aot.export_serving(model, x.shape, int8_trunk=True,
                                          calib=calib)
    assert "int8" in header["path_desc"]
    path = str(tmp_path / "edsr_int8.lvt")
    aot.save_artifact(path, exported, header)
    serve, _ = aot.load_artifact(path)

    live_fwd, _ = build_fast_forward(model, jnp.float32, int8_trunk=True,
                                     calib=calib)
    live = np.asarray(live_fwd(model.params, x), np.float32)
    np.testing.assert_allclose(np.asarray(serve(x)), live, atol=1e-4)


def test_wrong_shape_raises(tmp_path):
    model = _edsr()
    exported, header = aot.export_serving(model, (1, 16, 16, 3))
    path = str(tmp_path / "a.lvt")
    aot.save_artifact(path, exported, header)
    serve, _ = aot.load_artifact(path)
    with pytest.raises(ValueError, match="exported for input shape"):
        serve(np.zeros((1, 16, 18, 3), np.float32))


def test_bad_magic_raises(tmp_path):
    path = str(tmp_path / "junk.lvt")
    with open(path, "wb") as f:
        f.write(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="bad magic"):
        aot.load_artifact(path)


def test_export_cli_stablehlo(tmp_path):
    """End-to-end through the CLI: save a checkpoint, export an artifact,
    reload, compare with the live upscale path."""
    from larvanet_tpu.cli import export as export_cli

    model = _edsr(training=True)
    model.global_step = 7
    ckpt = model.save(str(tmp_path))

    art = str(tmp_path / "serve.lvt")
    export_cli.main([
        "--model", "edsr", "--restore_path", ckpt, "--stablehlo", art,
        "--export_batch", "1", "--export_height", "16", "--export_width", "16",
        "--edsr_res_blocks", "2", "--edsr_conv_features", "8",
    ])
    assert os.path.exists(art)
    serve, header = aot.load_artifact(art)
    assert header["input_shape"] == [1, 16, 16, 3]

    x = _batch(np.random.default_rng(3))
    from larvanet_tpu.ops.fastpath import build_fast_forward

    live_fwd, _ = build_fast_forward(model, jnp.float32)
    live = np.asarray(jax.jit(
        lambda p, v: live_fwd(p, v).astype(jnp.float32))(model.params, x))
    np.testing.assert_array_equal(np.asarray(serve(x)), live)


def test_validate_artifact_matches_checkpoint_validate(tmp_path):
    """cli/validate --artifact: the challenge protocol against the
    deployed file gives the same PSNR as validating the checkpoint."""
    from larvanet_tpu.cli import export as export_cli
    from larvanet_tpu.cli import validate as validate_cli
    from larvanet_tpu.data.io import save_image_hwc

    rng = np.random.default_rng(7)
    for i in range(2):
        hr = np.asarray(rng.uniform(0, 255, (64, 64, 3)), np.float32)
        save_image_hwc(hr, str(tmp_path / "HR" / ("%04d.png" % i)))
        save_image_hwc(hr[::4, ::4], str(tmp_path / "LR/X4" / ("%04dx4.png" % i)))

    model = _edsr(training=True)
    model.global_step = 1
    ckpt = model.save(str(tmp_path))
    art = str(tmp_path / "serve.lvt")
    export_cli.main([
        "--model", "edsr", "--restore_path", ckpt, "--stablehlo", art,
        "--export_batch", "1", "--export_height", "16", "--export_width", "16",
        "--edsr_res_blocks", "2", "--edsr_conv_features", "8"])

    data = ["--dataloader", "div2k_val_loader", "--scales", "4",
            "--data_input_path", str(tmp_path / "LR"),
            "--data_truth_path", str(tmp_path / "HR")]
    ref = validate_cli.main(data + [
        "--model", "edsr", "--restore_path", ckpt,
        "--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
    got = validate_cli.main(data + ["--artifact", art])
    assert abs(ref[4] - got[4]) < 1e-4, (ref, got)

    # guarded flags refuse clearly
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="chop_forward"):
        validate_cli.main(data + ["--artifact", art, "--chop_forward"])


def test_bf16_export_dtype(tmp_path):
    """--export_dtype bf16 lowers the throughput configuration: output
    close to (but not bitwise) the f32 artifact."""
    from larvanet_tpu.cli import export as export_cli

    model = _edsr(training=True)
    model.global_step = 1
    ckpt = model.save(str(tmp_path))
    outs = {}
    for d in ("f32", "bf16"):
        path = str(tmp_path / ("%s.lvt" % d))
        export_cli.main(["--model", "edsr", "--restore_path", ckpt,
                         "--stablehlo", path, "--export_batch", "1",
                         "--export_height", "16", "--export_width", "16",
                         "--export_dtype", d,
                         "--edsr_res_blocks", "2", "--edsr_conv_features", "8"])
        serve, header = aot.load_artifact(path)
        assert header["dtype"] == ("bfloat16" if d == "bf16" else "float32")
        x = _batch(np.random.default_rng(11))
        outs[d] = np.asarray(serve(x))
    diff = float(np.max(np.abs(outs["f32"] - outs["bf16"])))
    assert 0 < diff < 2.0, diff  # bf16 rounding, not garbage
