"""Real-dataset readiness kit (VERDICT r2 #8).

This machine has no network egress, so the paper-table datasets the
reference's test.py scores (Set5/Set14/BSD100/Urban100/Manga109/
DIV2K_val — reference test.py:91-98) cannot be fetched here. The day
this framework meets a networked host, the numbers should be one
command away:

    python -m tools.fetch_datasets --root data            # download+arrange
    python -m tools.fetch_datasets --root data --check    # validate a tree
    python -m tools.cli test --input_root_path data/test_LR ...   # score

Integrity: mirrors don't publish sha256s, so the manifest ships without
them; the first successful fetch RECORDS each archive's sha256 into
`<root>/datasets.lock.json` and later fetches verify against it (and
against any hashes already committed to the lockfile by a teammate).

Directory contract (what cli/test.py's flag defaults expect, mirroring
the reference's hardcoded roots):

    <root>/test_HR/<dataset>/<name>.png
    <root>/test_LR/<dataset>/<name>.png          (DIV2K_val: <name>x4.png)
    <root>/DIV2K_train/HR/<name>.png             (optional, for training)
    <root>/DIV2K_train/LR/X4/<name>x4.png

`--check` validates an existing tree offline: image counts, the naming
scheme, PNG readability of a sample, and the LRx4~HR geometric
consistency — it is exercised by tests/test_fetch_datasets.py against a
synthetic tree.

Manga109 requires per-user registration (http://www.manga109.org) and
cannot be scripted; --check treats it as optional and says so.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tarfile
import zipfile

# dataset -> expected image count in test_HR/<dataset>
EXPECTED_COUNTS = {
    "Set5": 5,
    "Set14": 14,
    "BSD100": 100,
    "Urban100": 100,
    "Manga109": 109,
    "DIV2K_val": 100,
}
OPTIONAL = {"Manga109"}  # registration-gated, cannot be auto-fetched

# archive name -> (url, member layout hint)
ARCHIVES = {
    "DIV2K_valid_HR.zip": "http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_valid_HR.zip",
    "DIV2K_valid_LR_bicubic_X4.zip": "http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_valid_LR_bicubic_X4.zip",
    "DIV2K_train_HR.zip": "http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_train_HR.zip",
    "DIV2K_train_LR_bicubic_X4.zip": "http://data.vision.ee.ethz.ch/cvl/DIV2K/DIV2K_train_LR_bicubic_X4.zip",
    # SNU CVLab's EDSR benchmark bundle: Set5/Set14/B100/Urban100 with
    # HR + LR_bicubic/X{2,3,4} inside
    "benchmark.tar": "https://cv.snu.ac.kr/research/EDSR/benchmark.tar",
}


def log(*a):
    print(*a, file=sys.stderr)


def _sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _lock_path(root):
    return os.path.join(root, "datasets.lock.json")


def _load_lock(root):
    try:
        with open(_lock_path(root)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_lock(root, lock):
    with open(_lock_path(root), "w") as f:
        json.dump(lock, f, indent=2, sort_keys=True)
        f.write("\n")


def fetch_archive(root, name, url):
    """Download (resumable-naive), verify/record sha256, return path."""
    import urllib.request

    arc_dir = os.path.join(root, "_archives")
    os.makedirs(arc_dir, exist_ok=True)
    dst = os.path.join(arc_dir, name)
    if not os.path.exists(dst):
        log("fetching %s ..." % url)
        tmp = dst + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, dst)
    digest = _sha256(dst)
    lock = _load_lock(root)
    want = lock.get(name)
    if want is None:
        lock[name] = digest
        _save_lock(root, lock)
        log("recorded sha256 for %s: %s" % (name, digest))
    elif want != digest:
        raise SystemExit(
            "sha256 mismatch for %s: lockfile %s, downloaded %s — delete the "
            "archive and re-fetch, or fix the lockfile" % (name, want, digest))
    return dst


def _extract(path, dest):
    os.makedirs(dest, exist_ok=True)
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest)
    else:
        with tarfile.open(path) as t:
            t.extractall(dest)


def _move_pngs(src_dir, dst_dir):
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(src_dir)):
        if f.lower().endswith(".png"):
            shutil.copy2(os.path.join(src_dir, f), os.path.join(dst_dir, f))
            n += 1
    return n


def arrange(root):
    """Unpack downloaded archives into the directory contract."""
    stage = os.path.join(root, "_stage")
    arc = os.path.join(root, "_archives")

    plan = [
        ("DIV2K_valid_HR.zip", "DIV2K_valid_HR",
         os.path.join(root, "test_HR", "DIV2K_val")),
        ("DIV2K_valid_LR_bicubic_X4.zip", os.path.join("DIV2K_valid_LR_bicubic", "X4"),
         os.path.join(root, "test_LR", "DIV2K_val")),
        ("DIV2K_train_HR.zip", "DIV2K_train_HR",
         os.path.join(root, "DIV2K_train", "HR")),
        ("DIV2K_train_LR_bicubic_X4.zip", os.path.join("DIV2K_train_LR_bicubic", "X4"),
         os.path.join(root, "DIV2K_train", "LR", "X4")),
    ]
    for arc_name, member, dst in plan:
        src = os.path.join(arc, arc_name)
        if not os.path.exists(src):
            log("skip %s (not downloaded)" % arc_name)
            continue
        _extract(src, stage)
        n = _move_pngs(os.path.join(stage, member), dst)
        log("%s -> %s (%d PNGs)" % (arc_name, dst, n))

    bench = os.path.join(arc, "benchmark.tar")
    if os.path.exists(bench):
        _extract(bench, stage)
        name_map = {"B100": "BSD100"}
        for ds in ("Set5", "Set14", "B100", "Urban100"):
            src_hr = os.path.join(stage, "benchmark", ds, "HR")
            src_lr = os.path.join(stage, "benchmark", ds, "LR_bicubic", "X4")
            out = name_map.get(ds, ds)
            if os.path.isdir(src_hr):
                n = _move_pngs(src_hr, os.path.join(root, "test_HR", out))
                log("benchmark %s HR -> test_HR/%s (%d)" % (ds, out, n))
            if os.path.isdir(src_lr):
                dst_lr = os.path.join(root, "test_LR", out)
                os.makedirs(dst_lr, exist_ok=True)
                n = 0
                for f in sorted(os.listdir(src_lr)):
                    if not f.lower().endswith(".png"):
                        continue
                    # benchmark LR names carry an x4 suffix; the reference's
                    # test.py expects LR names to MATCH HR names for these
                    # datasets (test.py:121-124: only DIV2K_val gets x4)
                    base = f[:-4]
                    if base.endswith("x4"):
                        base = base[:-2]
                    shutil.copy2(os.path.join(src_lr, f),
                                 os.path.join(dst_lr, base + ".png"))
                    n += 1
                log("benchmark %s LR/X4 -> test_LR/%s (%d, x4 suffix stripped)"
                    % (ds, out, n))
    if os.path.isdir(stage):
        shutil.rmtree(stage)


def check_tree(root, datasets, scale=4, sample=3):
    """Validate an existing tree against the contract. Returns a list of
    problem strings (empty = pass)."""
    from larvanet_tpu.data.io import load_image_u8 as load_image_hwc

    problems = []
    for ds in datasets:
        hr_dir = os.path.join(root, "test_HR", ds)
        lr_dir = os.path.join(root, "test_LR", ds)
        if not os.path.isdir(hr_dir):
            (log if ds in OPTIONAL else problems.append)(
                "%s: missing %s%s" % (ds, hr_dir,
                                      " (optional: registration-gated)" if ds in OPTIONAL else ""))
            continue
        names = sorted(f for f in os.listdir(hr_dir) if f.lower().endswith(".png"))
        want = EXPECTED_COUNTS.get(ds)
        if want is not None and len(names) != want:
            problems.append("%s: expected %d HR images, found %d"
                            % (ds, want, len(names)))
        if not os.path.isdir(lr_dir):
            problems.append("%s: missing %s" % (ds, lr_dir))
            continue
        for name in names[:sample]:
            stem = os.path.splitext(name)[0]
            lr_name = (stem + "x%d.png" % scale) if ds == "DIV2K_val" else name
            lr_path = os.path.join(lr_dir, lr_name)
            if not os.path.exists(lr_path):
                problems.append("%s: %s has no LR counterpart %s"
                                % (ds, name, lr_name))
                continue
            try:
                hr = load_image_hwc(os.path.join(hr_dir, name))
                lr = load_image_hwc(lr_path)
            except Exception as exc:
                problems.append("%s: unreadable image pair for %s (%s)"
                                % (ds, name, exc))
                continue
            for axis in (0, 1):
                # LR = downscale of mod-cropped HR: HR//s == LR exactly
                if hr.shape[axis] // scale != lr.shape[axis]:
                    problems.append(
                        "%s: %s geometry mismatch HR %s vs LR %s at x%d"
                        % (ds, name, hr.shape[:2], lr.shape[:2], scale))
                    break
    return problems


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--root", type=str, default="data",
                        help="Dataset root (test_HR/, test_LR/ live under it).")
    parser.add_argument("--datasets", type=str,
                        default="Set5,Set14,BSD100,Urban100,Manga109,DIV2K_val")
    parser.add_argument("--check", action="store_true",
                        help="Only validate an existing tree; no network.")
    parser.add_argument("--train", action="store_true",
                        help="Also fetch the DIV2K training set.")
    args = parser.parse_args(argv)

    datasets = [d for d in args.datasets.split(",") if d]
    if args.check:
        problems = check_tree(args.root, datasets)
        for p in problems:
            print("FAIL: " + p)
        if problems:
            return 1
        print("ok: %s validated under %s" % (",".join(datasets), args.root))
        return 0

    wanted = ["DIV2K_valid_HR.zip", "DIV2K_valid_LR_bicubic_X4.zip", "benchmark.tar"]
    if args.train:
        wanted += ["DIV2K_train_HR.zip", "DIV2K_train_LR_bicubic_X4.zip"]
    for name in wanted:
        try:
            fetch_archive(args.root, name, ARCHIVES[name])
        except Exception as exc:
            log("WARNING: could not fetch %s: %s" % (name, exc))
    arrange(args.root)
    problems = check_tree(args.root, [d for d in datasets if d != "Manga109"])
    for p in problems:
        print("FAIL: " + p)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
