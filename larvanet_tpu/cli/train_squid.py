"""train_squid (reference train_squid.py): loop calling
model.train_step_squid.

The reference version is dead code — no model in the zoo defines
train_step_squid (SURVEY.md §2.1), so running it crashes with an
AttributeError on the first step. Kept for CLI-surface parity with a
clear error up front instead of a crash mid-loop; any model gaining a
`train_step_squid` method will run through the same volume-driven loop
as train_larva.
"""

from __future__ import annotations

import sys

from larvanet_tpu.cli import train_larva
from larvanet_tpu.core import registry


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    orig_get_model = registry.get_model

    def patched(name):
        model = orig_get_model(name)
        if not hasattr(model, "train_step_squid"):
            raise AttributeError(
                "model %r does not define train_step_squid (this CLI is dead "
                "code in the reference too — no model implements it)" % (name,)
            )
        model.train_step_larva = model.train_step_squid
        return model

    registry.get_model = patched
    try:
        train_larva.main(argv)
    finally:
        registry.get_model = orig_get_model


if __name__ == "__main__":
    main()
