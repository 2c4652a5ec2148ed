"""Model zoo. Importing this package registers every model under its
reference CLI name (--model=<name>), replacing the reference's
importlib-by-filename plugin loading (reference train.py:53-54)."""

import larvanet_tpu.models.edsr  # noqa: F401
import larvanet_tpu.models.larvanet  # noqa: F401

# Families added as they land:
for _mod in ("msrr", "mamnet", "ebrn", "imdn", "hrsr", "rego", "treenet"):
    try:
        __import__("larvanet_tpu.models.%s" % _mod)
    except ImportError:
        pass
del _mod
