"""Flag-surface parity audit: every `--flag` any reference script,
model, or dataloader declares (regex over add_argument calls in
/root/reference) must appear somewhere in larvanet_tpu's CLI surface,
so migrated command lines never hit unknown-flag warnings for flags the
reference accepted. Catches drift when new reference-side flags are
mapped incompletely (found one for real: the tensor loader's
--train_input_path/--train_truth_path aliases)."""

import pathlib
import re

import pytest

REF = pathlib.Path("/root/reference")


@pytest.mark.skipif(not REF.exists(), reason="reference mount not available")
def test_every_reference_flag_is_accepted_here():
    flag_re = re.compile(r"add_argument\(\s*['\"](--[A-Za-z0-9_]+)['\"]")
    ref_flags = {}
    for sub in ("", "models", "dataloaders"):
        for py in sorted((REF / sub).glob("*.py")):
            names = flag_re.findall(py.read_text(errors="ignore"))
            if names:
                ref_flags[str(py.relative_to(REF))] = sorted(set(names))
    assert sum(len(v) for v in ref_flags.values()) > 300  # audit is real

    ours = pathlib.Path(__file__).resolve().parents[1] / "larvanet_tpu"
    our_src = "\n".join(p.read_text() for p in ours.rglob("*.py"))
    missing = {
        f: [n for n in names
            if '"%s"' % n not in our_src and "'%s'" % n not in our_src]
        for f, names in ref_flags.items()
    }
    missing = {f: m for f, m in missing.items() if m}
    assert not missing, "reference flags with no counterpart here: %r" % missing
